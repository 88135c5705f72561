package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-pipeline operators beyond similarity search: per-cluster
  * centroids (the feature-aggregation shape every embedding pipeline
  * needs) and sketch-based approximate distinct counts.
  */
object Embeddings {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-label centroid, dimension-wise: posexplode → (label, dim) avg.
    // Shuffles (label, dim, partial sums) — 64×n_labels keys, never the
    // vectors themselves; partial aggregation makes the map side emit one
    // row per (label, dim) per partition.
    "q41_centroids" -> ((s, d) => {
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("avg_val"))
        .orderBy(col("label"), col("pos"))
    }),

    // Approximate distinct via HyperLogLog++ next to the exact count —
    // the sketch every 100 TB pipeline uses when exact distinct would
    // shuffle the full key set. DuckDB's sketch differs numerically, so
    // the oracle checks the exact count hash-exactly and the approx value
    // as an IN-QUERY error-bound assertion (rsd=0.02 → |err| well under
    // 5%): the boolean is deterministic-by-contract and hashable.
    "q43_approx_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders"))
            <= col("exact_orders") * 0.05).as("approx_within_5pct"))
        .orderBy(col("l_returnflag"))
    })
  )

  /** Max-abs int8 quantization of the embedding column — the standard
    * pre-ANN compression (scale = max|x|, q_i = floor(x_i·127/scale)).
    * Map-side only; the oracle compares per-vector integer aggregates of
    * the quantized values (sum/min/max), which pin every element through
    * the deterministic floor. */
  val quantizeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_embedding_quantize" -> ((s, d) => {
      val mx = array_max(transform(col("embedding"), v => abs(v.cast("double"))))
      val quant = transform(col("embedding"),
        v => when(col("scale") > 0,
          floor(v.cast("double") * 127.0 / col("scale")).cast("long"))
          .otherwise(lit(0L)))
      embeddings(s, d)
        .select(col("vec_id"), col("embedding"), mx.as("scale"))
        .select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
          quant.as("q"))
        .select(col("vec_id"), col("scale_r"),
          aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
          array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"))
        .orderBy(col("vec_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q63_embedding_quantize" ->
      """WITH t AS (
           SELECT vec_id, embedding::DOUBLE[] AS e,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
           FROM embeddings),
         q AS (
           SELECT vec_id, round(scale, 6) AS scale_r,
             list_transform(e, x -> CASE WHEN scale > 0
               THEN CAST(floor(x * 127.0 / scale) AS BIGINT) ELSE 0 END) AS qv
           FROM t)
         SELECT vec_id, scale_r,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           list_min(qv) AS q_min, list_max(qv) AS q_max
         FROM q ORDER BY vec_id""",
    "q41_centroids" ->
      """SELECT label, i AS pos,
         round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS avg_val
         FROM embeddings, range(64) t(i)
         GROUP BY label, i ORDER BY label, pos""",
    "q43_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS exact_orders,
         TRUE AS approx_within_5pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
