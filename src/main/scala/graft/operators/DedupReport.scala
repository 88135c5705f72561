package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MODALITY-BRIDGING dedup report — the rollup a curation team actually
  * reads. The engine carries three independent near-dup survivor lists,
  * one per modality: lexical MinHash clusters (q76), shared-content CDC
  * chunk clusters (q119), and embedding-space clusters (q122). Each
  * catches families the others can't (whole-doc lexical overlap vs
  * partial copy-paste spans vs paraphrase proximity), so the per-doc
  * VERDICT — kept by all three, or dropped by exactly which — is the
  * actionable output: `kept_all` is the conservative training corpus,
  * and a doc kept by two modalities but dropped by one localizes WHY it
  * was near-duplicate.
  *
  * Composition, not recomputation: the three keep-lists are the
  * existing operators invoked as-is (q76/q122 share their cached
  * cluster labels with their own gate runs), joined back to the corpus
  * with three hash-keyed left joins — keep-lists are corpus-sized at
  * most, flags are booleans, nothing new shuffles beyond the joins.
  * The oracle composes the three siblings' published oracle texts
  * verbatim as nested CTEs, so this query can never drift from the
  * operators it reports on.
  */
object DedupReport {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_dedup_verdicts" -> ((s, d) => {
      def keepFlag(df: DataFrame, idCol: String, flag: String): DataFrame =
        df.select(col(idCol).as("doc_id")).withColumn(flag, lit(true))
      val mh = keepFlag(graft.functions.Dedup.queries("q76_dedup_keep")(s, d),
        "doc_id", "kept_minhash")
      val cdc = keepFlag(graft.functions.TextQueries.queries("q119_cdc_dedup_keep")(s, d),
        "doc_id", "kept_cdc")
      val em = keepFlag(graft.functions.Similarity.queries("q122_embedding_dedup_keep")(s, d),
        "vec_id", "kept_embedding")
      documents(s, d).select(col("doc_id"))
        .join(mh, Seq("doc_id"), "left")
        .join(cdc, Seq("doc_id"), "left")
        .join(em, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("kept_minhash"), lit(false)).as("kept_minhash"),
          coalesce(col("kept_cdc"), lit(false)).as("kept_cdc"),
          coalesce(col("kept_embedding"), lit(false)).as("kept_embedding"))
        .withColumn("kept_all",
          col("kept_minhash") && col("kept_cdc") && col("kept_embedding"))
        .orderBy(col("doc_id"))
    })
  )

  /** The three siblings' oracles, composed verbatim (each is a complete
    * SELECT, legal as a nested-WITH CTE body in DuckDB). */
  lazy val oracles: Map[String, String] = Map(
    "q132_dedup_verdicts" ->
      s"""WITH mh_keep AS (
           ${graft.functions.Dedup.oracles("q76_dedup_keep")}),
         cdc_keep AS (
           ${graft.functions.TextQueries.oracles("q119_cdc_dedup_keep")}),
         emb_keep AS (
           ${graft.functions.Similarity.oracles("q122_embedding_dedup_keep")})
         SELECT d.doc_id,
           mh.doc_id IS NOT NULL AS kept_minhash,
           cd.doc_id IS NOT NULL AS kept_cdc,
           em.vec_id IS NOT NULL AS kept_embedding,
           (mh.doc_id IS NOT NULL AND cd.doc_id IS NOT NULL
             AND em.vec_id IS NOT NULL) AS kept_all
         FROM documents d
         LEFT JOIN mh_keep mh ON mh.doc_id = d.doc_id
         LEFT JOIN cdc_keep cd ON cd.doc_id = d.doc_id
         LEFT JOIN emb_keep em ON em.vec_id = d.doc_id
         ORDER BY d.doc_id"""
  )
}
