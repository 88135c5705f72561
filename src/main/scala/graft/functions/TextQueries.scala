package graft.functions

import graft.Tables._
import graft.apps.RefApps
import graft.core.MapReduceJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: word count and
  * inverted index (the reference's two real queries — src/mrapps/wc.go and
  * src/mrapps/indexer.go — re-expressed over table rows), token statistics,
  * quality scoring, marker-based language ID, and MD5 fingerprinting.
  *
  * All are declarative exploded-token plans: `explode(split(...))` stays in
  * whole-stage codegen and partial-aggregates map-side, so at 100 TB the
  * shuffle carries (token, partial-count) rows, not raw text.
  */
object TextQueries {

  /** Tokens column: Unicode-letter runs, case-sensitive, empties dropped —
    * the reference tokenizer contract (src/mrapps/wc.go:22-26). */
  private def tokens = filter(split(col("text"), "[^\\p{L}]+"), x => x =!= "")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The reference's wc app as a declarative plan (src/mrapps/wc.go:21-44).
    "q19_wordcount" -> ((s, d) => {
      RefApps.wordCountDF(documents(s, d), "text")
        .withColumnRenamed("count", "n")
        .orderBy(col("word"))
    }),

    // The reference's indexer app (src/mrapps/indexer.go:20-39): per-doc
    // distinct words, then per-word count + sorted doc list.
    "q20_inverted_index" -> ((s, d) => {
      RefApps.invertedIndexDF(documents(s, d), "text", "doc_id")
        .orderBy(col("word"))
    }),

    // Same word count but THROUGH the MapReduce façade (engine path:
    // flatMap mapf → repartition → sortWithinPartitions → run-group →
    // reducef), proving the parity engine inside the correctness gate.
    // Values are strings, as in the reference (mr/worker.go:145).
    "q21_mr_wordcount" -> ((s, d) => {
      import s.implicits._
      val rows = documents(s, d)
        .select(col("doc_id").cast("string"), col("text"))
        .as[(String, String)]
      MapReduceJob.runOnRows(s, rows, RefApps.WordCount, numReduce = 10)
        .toDF("key", "value")
        .orderBy(col("key"))
    }),

    // Token statistics per document: counts + mean token length.
    "q22_token_stats" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), explode(tokens).as("tok"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          round(avg(length(col("tok"))), 6).as("avg_token_len"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length, whitespace ratio, stopword ratio — the
    // standard cheap pre-training quality heuristics.
    "q23_quality_score" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), col("text"), explode(tokens).as("tok"))
        .groupBy(col("doc_id"))
        .agg(
          first(length(col("text"))).as("n_chars_actual"),
          count(lit(1)).as("n_tokens"),
          round(avg(when(col("tok").isin(stopwords: _*), 1.0).otherwise(0.0)), 6)
            .as("stopword_ratio"),
          round(first(
            lit(1.0) - length(regexp_replace(col("text"), " ", ""))
              / length(col("text")).cast("double")), 6).as("space_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Marker-word language ID (deterministic heuristic; the fixture text is
    // synthetic word salad, so this checks plumbing + the CASE cascade, not
    // linguistics). A char-n-gram profile variant is the non-oracle path.
    "q24_lang_markers" -> ((s, d) => {
      val t = concat(lit(" "), col("text"), lit(" "))
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(t.contains(" der ") || t.contains(" und ") || t.contains(" das "), "de")
            .when(t.contains(" le ") || t.contains(" la ") || t.contains(" et "), "fr")
            .when(t.contains(" el ") || t.contains(" los ") || t.contains(" es "), "es")
            .when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
            .otherwise("en").as("predicted"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprinting: MD5 content hash + per-fingerprint duplicate
    // count via a window (md5 agrees byte-for-byte with the oracle's).
    "q25_fingerprint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q19_wordcount" ->
      """SELECT word, count(*) AS n FROM (
           SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word
           FROM documents) t
         WHERE word <> '' GROUP BY word ORDER BY word""",
    "q20_inverted_index" ->
      """SELECT word, count(*) AS n_docs,
         string_agg(doc, ',' ORDER BY doc) AS docs
         FROM (
           SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc,
             unnest(string_split_regex(text, '[^\p{L}]+')) AS word
           FROM documents) t
         WHERE word <> '' GROUP BY word ORDER BY word""",
    "q21_mr_wordcount" ->
      """SELECT word AS key, CAST(count(*) AS VARCHAR) AS value FROM (
           SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word
           FROM documents) t
         WHERE word <> '' GROUP BY word ORDER BY key""",
    "q22_token_stats" ->
      """SELECT doc_id, count(*) AS n_tokens,
         count(DISTINCT tok) AS n_distinct,
         round(avg(length(tok)), 6) AS avg_token_len
         FROM (
           SELECT doc_id, unnest(string_split_regex(text, '[^\p{L}]+')) AS tok
           FROM documents) t
         WHERE tok <> '' GROUP BY doc_id ORDER BY doc_id""",
    "q23_quality_score" ->
      """SELECT t.doc_id, any_value(length(d.text)) AS n_chars_actual,
         count(*) AS n_tokens,
         round(avg(CASE WHEN tok IN ('the','a','of','and','to','in','is','on')
           THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio,
         round(any_value(1.0 - length(replace(d.text, ' ', ''))
           / CAST(length(d.text) AS DOUBLE)), 6) AS space_ratio
         FROM (
           SELECT doc_id, unnest(string_split_regex(text, '[^\p{L}]+')) AS tok
           FROM documents) t
         JOIN documents d ON t.doc_id = d.doc_id
         WHERE tok <> '' GROUP BY t.doc_id ORDER BY t.doc_id""",
    "q24_lang_markers" ->
      """SELECT doc_id, lang,
         CASE
           WHEN contains(pt, ' der ') OR contains(pt, ' und ') OR contains(pt, ' das ') THEN 'de'
           WHEN contains(pt, ' le ') OR contains(pt, ' la ') OR contains(pt, ' et ') THEN 'fr'
           WHEN contains(pt, ' el ') OR contains(pt, ' los ') OR contains(pt, ' es ') THEN 'es'
           WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
           ELSE 'en' END AS predicted
         FROM (SELECT doc_id, lang, text, ' ' || text || ' ' AS pt FROM documents) t
         ORDER BY doc_id""",
    "q25_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
         count(*) OVER (PARTITION BY md5(text)) AS dup_count
         FROM documents ORDER BY doc_id"""
  )
}
