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
    // shuffle the full key set. No oracle (DuckDB's approx sketch differs);
    // RelationalSpec bounds the relative error instead.
    "q43_approx_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q41_centroids" ->
      """SELECT label, i AS pos,
         round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS avg_val
         FROM embeddings, range(64) t(i)
         GROUP BY label, i ORDER BY label, pos"""
  )
}
