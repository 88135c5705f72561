package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the standard fit+predict
  * shape: learn per-language trigram profiles from labeled data (one
  * aggregation pass), broadcast the tiny model, classify map-side.
  *
  * At 100 TB the profile fit aggregates (lang, trigram) counts — partial
  * aggregation keeps the shuffle at vocabulary size — and prediction is a
  * broadcast map lookup inside one codegen-free typed pass (per-record
  * string chopping is exactly the imperative tier, like MinHash
  * signatures). The fixture text is synthetic word salad, so measured
  * accuracy is a plumbing check, not linguistics.
  */
object LangId {

  /** Distinct char trigrams of a lowercased text (plain Scala — per-record
    * imperative loop, same tier as Dedup.shingleSet). */
  def trigrams(text: String): Set[String] = {
    val t = text.toLowerCase.replaceAll("[^\\p{L} ]", " ")
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).view.map(i => t.substring(i, i + 3))
      .filterNot(_.forall(_ == ' ')).toSet
  }

  /** Top-k most frequent trigrams per language (the "profile"). */
  def fitProfiles(s: SparkSession, d: String, k: Int = 100): Map[String, Set[String]] = {
    import s.implicits._
    documents(s, d).select(col("lang"), col("text")).as[(String, String)]
      .flatMap { case (lang, text) => trigrams(text).iterator.map(tg => (lang, tg)) }
      .groupBy(col("_1").as("lang"), col("_2").as("tg"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("tg"))))
      .filter(col("rk") <= k)
      .select(col("lang"), col("tg"))
      .as[(String, String)]
      .collect()
      .groupBy(_._1)
      .map { case (lang, arr) => lang -> arr.map(_._2).toSet }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fit trigram profiles, classify every document by profile overlap
    // (deterministic argmax, lexicographic tiebreak). Rows-only driver
    // check; TextAnalysisSpec asserts determinism + output shape.
    "q42_lang_ngram" -> ((s, d) => {
      import s.implicits._
      val profiles = fitProfiles(s, d)
      val bc = s.sparkContext.broadcast(profiles)
      documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, lang, text) =>
          val tg = trigrams(text)
          val scored = bc.value.toSeq.map { case (l, prof) =>
            val overlap = if (tg.isEmpty) 0.0
              else tg.count(prof.contains).toDouble / tg.size
            (l, overlap)
          }.sortBy { case (l, sc) => (-sc, l) }
          (id, lang, scored.head._1, math.rint(scored.head._2 * 1e6) / 1e6)
        }
        .toDF("doc_id", "lang", "predicted", "score")
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
