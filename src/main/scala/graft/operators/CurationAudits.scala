package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave: corpus-growth and serving-governance audits — the
  * reports a data team reads BEFORE committing a crawl batch to the
  * training mix, plus the shard-placement stability check a serving
  * layer runs before resizing.
  *
  * - q186 n-gram novelty curve: how much genuinely NEW content each
  *   successive ingestion batch contributes (Baevski/olmo-style corpus
  *   datasheet material; diminishing novelty is the signal to stop
  *   crawling a source).
  * - q187 rendezvous-hash shard rebalance: highest-random-weight
  *   (Thaler & Ravishankar 1998) document→shard assignment at 8 and 9
  *   shards; HRW moves ONLY the ~1/9 of keys that land on the new
  *   shard, vs mod-N hashing which moves (N-1)/N of everything.
  * - q188 leakage-safe split: the q140 content-hash fold assignment
  *   hardened against NEAR-duplicate leakage — a train doc whose
  *   near-dup cluster (verified MinHash pairs, j ≥ 0.8) contains any
  *   eval doc is quarantined, so no eval document has a paraphrase in
  *   the training fold (the Lee et al. 2022 eval-contamination rule).
  *
  * Scale shapes: q186 shuffles 16-char gram keys only (text never
  * leaves the map side) and every post-rollup relation is ≤ 50 batch
  * rows; q187 is one map pass + one 8-row rollup — the 9 md5s per doc
  * are whole-stage-codegen'd, nothing but (shard_old, shard_new) pairs
  * reach the exchange; q188 broadcasts the tainted-cluster list (eval
  * near-dup clusters ≪ corpus) against the slim (doc_id, fold) relation.
  */
object CurationAudits {

  /** Deterministic ingestion batch of a doc: 50 equal-width id ranges.
    * Width derives from max(doc_id) so the batch COUNT is fixed at any
    * corpus size — the cumulative pass downstream is a triangular join
    * over ≤ 50 rows, never a corpus-sized window. */
  private val NBatches = 50

  /** Rendezvous (HRW) owner of a doc among `n` shards: the shard whose
    * md5(doc_id ":" shard) is lexicographically largest. Pure map-side
    * column — `greatest` over n (hash, shard) structs stays inside
    * whole-stage codegen; ties (impossible for distinct md5 inputs, but
    * defined anyway) break toward the larger shard id, which the oracle
    * mirrors with ORDER BY h DESC, s DESC. */
  private[graft] def hrwOwner(nShards: Int): Column =
    greatest((0 until nShards).map(i =>
      struct(md5(concat(col("doc_id").cast("string"), lit(":" + i))).as("h"),
        lit(i).as("s"))): _*).getField("s")

  /** q140's content-hash fold rule (membership a pure function of TEXT —
    * byte-identical re-crawls land in the same fold by construction). */
  private def fold: Column = {
    val h4 = conv(substring(md5(col("text")), 1, 4), 16, 10)
      .cast("long") % 10
    when(h4 < 8, "train").when(h4 === 8, "val").otherwise("test")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // N-GRAM NOVELTY CURVE — per ingestion batch (50 equal doc_id
    // ranges): distinct trigrams seen, trigrams appearing for the FIRST
    // time anywhere in the corpus, and the cumulative gram vocabulary.
    // A flattening curve says the source is exhausted. Plan shape: the
    // shared shingle relation (one persisted scan, q27's cache) explodes
    // to (gram, batch) rows — grams are the only thing shuffled; the
    // first-seen rollup keys on gram; everything after (new-per-batch,
    // seen-per-batch, cumulative triangular join) is ≤ NBatches rows.
    "q186_ngram_novelty" -> ((s, d) => {
      val w = documents(s, d)
        .agg(expr(s"(max(doc_id) + $NBatches) div $NBatches").as("w"))
      val g = graft.functions.Dedup.sharedShingles(s, d)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
        .crossJoin(broadcast(w))
        .select(col("s"), expr("doc_id div w").as("batch"))
      val firstSeen = g.groupBy(col("s")).agg(min(col("batch")).as("fb"))
      val newPer = firstSeen.groupBy(col("fb").as("batch"))
        .agg(count(lit(1)).as("new_grams"))
      val seenPer = g.groupBy(col("batch"))
        .agg(countDistinct(col("s")).as("grams_seen"))
      val spine = documents(s, d).crossJoin(broadcast(w))
        .groupBy(expr("doc_id div w").as("batch"))
        .agg(count(lit(1)).as("n_docs"))
      val cum = spine.alias("b")
        .join(newPer.alias("n"), col("n.batch") <= col("b.batch"), "left_outer")
        .groupBy(col("b.batch").as("batch"))
        .agg(coalesce(sum(col("n.new_grams")), lit(0L)).as("cum_grams"))
      spine.join(seenPer, Seq("batch"), "left_outer")
        .join(newPer, Seq("batch"), "left_outer")
        .join(cum, Seq("batch"))
        .select(col("batch"), col("n_docs"),
          coalesce(col("grams_seen"), lit(0L)).as("grams_seen"),
          coalesce(col("new_grams"), lit(0L)).as("new_grams"),
          col("cum_grams"),
          when(coalesce(col("grams_seen"), lit(0L)) === 0, lit(0.0))
            .otherwise(round(coalesce(col("new_grams"), lit(0L)) /
              col("grams_seen").cast("double"), 6)).as("novelty_rate"))
        .orderBy(col("batch"))
    }),

    // RENDEZVOUS-HASH SHARD REBALANCE AUDIT — assign every doc to its
    // HRW owner among 8 shards and again among 9, and report per OLD
    // shard how many docs move. HRW's guarantee (the reason consistent
    // placement uses it): a doc moves ONLY if the new shard wins its
    // argmax, so ~1/9 of each shard relocates and nothing shuffles
    // between surviving shards. One codegen map pass, one 8-row rollup.
    "q187_rendezvous_shards" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), hrwOwner(8).cast("long").as("shard_old"),
          hrwOwner(9).cast("long").as("shard_new"))
        .groupBy(col("shard_old"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("shard_new") =!= col("shard_old")).cast("long"))
            .as("n_moved"))
        .select(col("shard_old"), col("n_docs"), col("n_moved"),
          round(col("n_moved") / col("n_docs").cast("double"), 6)
            .as("moved_frac"))
        .orderBy(col("shard_old"))
    }),

    // LEAKAGE-SAFE SPLIT — q140's fold assignment plus the
    // near-duplicate quarantine: a TRAIN doc whose verified near-dup
    // cluster (MinHash j ≥ 0.8, q27's pair graph → q72's components)
    // contains any val/test doc is reassigned to 'quarantine' (dropped
    // from training), so no eval doc has a paraphrase across the fold
    // boundary. Exact duplicates can never straddle folds to begin with
    // (fold is a function of the text hash) — the quarantine closes the
    // NEAR-dup gap. Plan shape: folds are map-side; cluster labels are
    // the cached component relation (bounded by docs-in-pairs); the
    // tainted-cluster list broadcasts.
    "q188_leakage_safe_split" -> ((s, d) => {
      val folds = documents(s, d).select(col("doc_id"), fold.as("fold"))
      val labels = graft.functions.Dedup.nearDupLabels(s, d)
      val tainted = labels.join(folds.filter(col("fold") =!= "train"), "doc_id")
        .select(col("cluster_id")).distinct()
        .withColumn("tainted", lit(true))
      folds.join(labels, Seq("doc_id"), "left_outer")
        .join(broadcast(tainted), Seq("cluster_id"), "left_outer")
        .select(col("doc_id"),
          when(col("fold") === "train" &&
            coalesce(col("tainted"), lit(false)), "quarantine")
            .otherwise(col("fold")).as("fold"))
        .orderBy(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map(
    "q186_ngram_novelty" ->
      """WITH w AS (SELECT (max(doc_id) + 50) // 50 AS w FROM documents),
         t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '[^\p{L}]+'), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, s FROM (
             SELECT doc_id, unnest(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS s
             FROM t WHERE len(toks) >= 3)),
         g AS (SELECT s, doc_id // (SELECT w FROM w) AS batch FROM sh),
         fs AS (SELECT s, min(batch) AS fb FROM g GROUP BY s),
         np AS (SELECT fb AS batch, count(*) AS new_grams FROM fs GROUP BY fb),
         sp AS (SELECT batch, count(DISTINCT s) AS grams_seen FROM g GROUP BY batch),
         dp AS (SELECT doc_id // (SELECT w FROM w) AS batch, count(*) AS n_docs
                FROM documents GROUP BY 1)
         SELECT dp.batch, dp.n_docs,
           coalesce(sp.grams_seen, 0) AS grams_seen,
           coalesce(np.new_grams, 0) AS new_grams,
           CAST(sum(coalesce(np.new_grams, 0))
             OVER (ORDER BY dp.batch) AS BIGINT) AS cum_grams,
           CASE WHEN coalesce(sp.grams_seen, 0) = 0 THEN 0.0
             ELSE round(coalesce(np.new_grams, 0) * 1.0 / sp.grams_seen, 6)
           END AS novelty_rate
         FROM dp
         LEFT JOIN sp ON dp.batch = sp.batch
         LEFT JOIN np ON dp.batch = np.batch
         ORDER BY dp.batch""",

    "q187_rendezvous_shards" ->
      """WITH h AS (
           SELECT doc_id, r.i AS s,
             md5(doc_id::VARCHAR || ':' || r.i::VARCHAR) AS h
           FROM documents, range(9) r(i)),
         o8 AS (
           SELECT doc_id, s AS shard_old FROM (
             SELECT doc_id, s, row_number()
               OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rk
             FROM h WHERE s < 8) WHERE rk = 1),
         o9 AS (
           SELECT doc_id, s AS shard_new FROM (
             SELECT doc_id, s, row_number()
               OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rk
             FROM h) WHERE rk = 1)
         SELECT shard_old, count(*) AS n_docs,
           count(*) FILTER (WHERE shard_new <> shard_old) AS n_moved,
           round(count(*) FILTER (WHERE shard_new <> shard_old) * 1.0
             / count(*), 6) AS moved_frac
         FROM o8 JOIN o9 USING (doc_id)
         GROUP BY shard_old ORDER BY shard_old""",

    // the q76-oracle component labels (recursive transitive closure over
    // the exact-Jaccard ≥ 0.8 pair graph) + the q140 fold rule, then the
    // quarantine CASE
    "q188_leakage_safe_split" ->
      s"""WITH RECURSIVE ${graft.functions.Dedup.shingleCtes},
         pairs AS (
           SELECT doc_a, doc_b
           FROM common
           JOIN sizes sa ON doc_a = sa.doc_id
           JOIN sizes sb ON doc_b = sb.doc_id
           WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
         edges AS (
           SELECT doc_a AS s, doc_b AS e FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs),
         reach(src, node) AS (
           SELECT s, s FROM (SELECT DISTINCT s FROM edges)
           UNION
           SELECT r.src, g.e FROM reach r JOIN edges g ON r.node = g.s),
         labels AS (
           SELECT src AS doc_id, min(node) AS cluster_id
           FROM reach GROUP BY src),
         folds AS (
           SELECT doc_id,
             CASE WHEN h4 < 8 THEN 'train' WHEN h4 = 8 THEN 'val'
               ELSE 'test' END AS fold
           FROM (
             SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT,
                 [strpos('0123456789abcdef', c)::BIGINT - 1
                  for c in string_split(substr(md5(text), 1, 4), '')]),
                 (a, x) -> a * 16 + x) % 10 AS h4
             FROM documents)),
         tainted AS (
           SELECT DISTINCT l.cluster_id
           FROM labels l JOIN folds f USING (doc_id)
           WHERE f.fold <> 'train')
         SELECT f.doc_id,
           CASE WHEN f.fold = 'train' AND l.cluster_id IN
             (SELECT cluster_id FROM tainted) THEN 'quarantine'
             ELSE f.fold END AS fold
         FROM folds f LEFT JOIN labels l USING (doc_id)
         ORDER BY f.doc_id""")
}
