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
    })
  )

  val oracles: Map[String, String] = Map(
    "q44_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
