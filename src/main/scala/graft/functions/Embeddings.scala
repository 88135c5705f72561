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

  val oracles: Map[String, String] = Map(
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
