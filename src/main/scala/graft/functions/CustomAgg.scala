package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF via `Aggregator[IN, BUF, OUT]` — the engine's
  * user-defined aggregate surface (the reference's reducef is a whole-group
  * fold; an Aggregator is the Spark-native incremental+mergeable form that
  * partial-aggregates map-side and merges across partitions).
  */
object CustomAgg {

  /** Geometric mean, accumulated as (Σ ln x, n) — mergeable, so Spark can
    * partial-aggregate before the shuffle. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Buffer of [[KmvDistinct]]: the ≤ K smallest DISTINCT md5 hex keys
    * seen so far, sorted ascending (fixed-width lowercase hex sorts
    * numerically). */
  case class KmvB(mins: Array[String])

  /** Bounded k-minimum-values distinct sketch as a mergeable Aggregator
    * — the streaming-capable form of the batch KMV (q110/q112): the
    * buffer is the ≤ 64 smallest distinct hash keys, reduce/merge keep
    * that invariant with O(K) work, and finish applies the IDENTICAL
    * estimator arithmetic as the batch path (hex→long over the first 15
    * digits, division order preserved, half-up 4-dp round). KMV of a
    * SET is order-independent, so partial aggregation, shuffle order,
    * and state-store checkpointing between micro-batches all produce
    * the same answer — which is why a streaming run can share an exact
    * batch oracle. State per group is K×32 chars ≈ 2 KB, bounded at any
    * stream length. */
  object KmvDistinct extends Aggregator[String, KmvB, Double] {
    val K = 64
    def zero: KmvB = KmvB(Array.empty)
    // null-safe: a null input hash (md5 of a null key) contributes
    // nothing, matching what count(DISTINCT ...) semantics would do —
    // without the guard, insert's (m :+ null).sorted NPEs (round-9
    // advisor finding).
    def reduce(b: KmvB, h: String): KmvB = if (h == null) b else insert(b, h)
    def merge(a: KmvB, b: KmvB): KmvB = b.mins.foldLeft(a)(insert)
    def finish(b: KmvB): Double =
      if (b.mins.length < K) b.mins.length.toDouble
      else {
        val kth = b.mins(K - 1)
        var v = 0L
        var i = 0
        while (i < 15) { v = v * 16 + Character.digit(kth.charAt(i), 16); i += 1 }
        java.math.BigDecimal
          .valueOf((K - 1).toDouble / (v / 1152921504606846976.0))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    private def insert(b: KmvB, h: String): KmvB = {
      val m = b.mins
      // fast path: full sketch and h can't displace anything (≥ the kth
      // min covers duplicates of it too)
      if (m.length == K && h >= m(K - 1)) b
      else if (m.contains(h)) b
      else {
        val nb = (m :+ h).sorted
        KmvB(if (nb.length > K) nb.take(K) else nb)
      }
    }
    def bufferEncoder: Encoder[KmvB] = Encoders.product[KmvB]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Geometric mean of extended price per return flag through the custom
    // Aggregator; oracle = exp(avg(ln x)). Σ ln x is order-sensitive in
    // the last bits → round to 4.
    "q50_custom_udaf" -> ((s, d) => {
      val geo = udaf(GeoMean)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(geo(col("l_extendedprice")), 4).as("geo_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // The same Aggregator registered BY NAME for SQL (spark.udf.register
    // accepts a udaf directly — public API, no bridge needed), completing
    // the by-name surface across all extension tiers: scalar expression
    // (q71), UDTF (q90), and now UDAF. Same plan as q50 (map-side partial
    // agg, merge across partitions), different front door.
    "q98_sql_udaf" -> ((s, d) => {
      s.udf.register("geomean", udaf(GeoMean))
      lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, round(geomean(l_extendedprice), 4) AS geo_price,
           count(*) AS n_rows
           FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // Correlated scalar subqueries (Catalyst de-correlates to joins):
    // per-customer order count and max total price.
    "q49_scalar_subquery" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_custkey,
           (SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey) AS n_orders,
           (SELECT round(max(o_totalprice), 2) FROM orders_v
            WHERE o_custkey = c_custkey) AS max_total
           FROM customer_v ORDER BY c_custkey""")
    }),

    // Regexp extraction + predicates over the documents source tag.
    "q51_regex_extract" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("source"), "(\\d+)", 1).cast("int").as("src_num"),
          col("text").contains("spark").cast("int").as("mentions_spark"),
          col("text").rlike("^the ").cast("int").as("starts_the"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q50_custom_udaf" ->
      """SELECT l_returnflag,
         round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q98_sql_udaf" ->
      """SELECT l_returnflag,
         round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q49_scalar_subquery" ->
      """SELECT c_custkey,
         (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
         (SELECT round(max(o_totalprice), 2) FROM orders
          WHERE o_custkey = c_custkey) AS max_total
         FROM customer ORDER BY c_custkey""",
    "q51_regex_extract" ->
      """SELECT doc_id,
         CAST(regexp_extract(source, '(\d+)', 1) AS INT) AS src_num,
         CAST(contains(text, 'spark') AS INT) AS mentions_spark,
         CAST(regexp_matches(text, '^the ') AS INT) AS starts_the
         FROM documents ORDER BY doc_id"""
  )
}
