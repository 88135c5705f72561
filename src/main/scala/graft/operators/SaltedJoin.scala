package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (fact) side's key with a
  * deterministic shard id, replicate the other side across all shards,
  * join on (key, salt). A hot key that would pin one reducer is spread
  * over `salt` tasks; results are identical to the plain join.
  *
  * This is the manual fallback for skew beyond what AQE's skew-join
  * splitting handles (AQE needs map-output statistics to spot the skew;
  * salting works even when one key dominates a single huge file).
  */
object SaltedJoin {

  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      salt: Int): DataFrame = {
    // Deterministic per-row shard: hash of the whole fact row — avoids
    // rand() (nondeterministic under task retry, which can duplicate or
    // drop rows on recompute).
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    salted.join(replicated,
      salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted lineitem⋈orders aggregated per priority — the oracle is the
    // PLAIN join, proving the salted plan is result-identical.
    "q44_salted_join" -> ((s, d) => {
      join(lineitem(s, d), orders(s, d), "l_orderkey", "o_orderkey", salt = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // JOIN-KEY SKEW AUDIT — the planning report you run BEFORE shuffling
    // 100 TB on a key: for each candidate join key, how concentrated is
    // it? ONE scan (each row explodes to 3 slim (key column, value)
    // pairs; partial aggregation collapses them map-side), then a
    // key-column-sized rollup: distinct keys, hottest key and its row
    // count, its corpus share in integer parts-per-million, and the salt
    // factor [[join]] would need to spread that key across 32-partition
    // shuffles (ceil of share × 32 — the "how many tasks should this one
    // key occupy" number). All-integer arithmetic → exact replay.
    // The hottest key ties break to the smallest key value, so the
    // report is deterministic on any data.
    "q154_skew_audit" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
      val pairs = lineitem(s, d).select(
        explode(array(cols.map(c =>
          struct(lit(c).as("keycol"), col(c).as("key"))): _*)).as("kv"))
        .select(col("kv.keycol"), col("kv.key"))
      val counts = pairs.groupBy(col("keycol"), col("key"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("keycol"))
        .orderBy(col("cnt").desc, col("key"))
      counts
        .withColumn("rk", row_number().over(w))
        .groupBy(col("keycol"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(when(col("rk") === 1, col("key"))).as("hot_key"),
          max(when(col("rk") === 1, col("cnt"))).as("hot_cnt"))
        .select(col("keycol"), col("n_keys"), col("n_rows"),
          col("hot_key"), col("hot_cnt"),
          expr("(hot_cnt * 1000000) div n_rows").as("share_ppm"),
          expr("(hot_cnt * 32 + n_rows - 1) div n_rows").as("rec_salt"))
        .orderBy(col("keycol"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q154_skew_audit" ->
      """WITH pairs AS (
           SELECT 'l_orderkey' AS keycol, l_orderkey AS key FROM lineitem
           UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
           UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
         counts AS (
           SELECT keycol, key, count(*) AS cnt FROM pairs GROUP BY 1, 2),
         ranked AS (
           SELECT keycol, key, cnt,
             row_number() OVER (PARTITION BY keycol
               ORDER BY cnt DESC, key) AS rk
           FROM counts),
         roll AS (
           SELECT keycol, count(*) AS n_keys, sum(cnt) AS n_rows,
             max(CASE WHEN rk = 1 THEN key END) AS hot_key,
             max(CASE WHEN rk = 1 THEN cnt END) AS hot_cnt
           FROM ranked GROUP BY keycol)
         SELECT keycol, n_keys, CAST(n_rows AS BIGINT) AS n_rows, hot_key,
           hot_cnt, (hot_cnt * 1000000) // CAST(n_rows AS BIGINT) AS share_ppm,
           (hot_cnt * 32 + CAST(n_rows AS BIGINT) - 1)
             // CAST(n_rows AS BIGINT) AS rec_salt
         FROM roll ORDER BY keycol"""
  )
}
