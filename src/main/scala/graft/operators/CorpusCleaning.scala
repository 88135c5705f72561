package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth wave of training-data pipeline operators: PII redaction, an
  * end-to-end C4/Gopher-style cleaning pipeline (length + quality +
  * language + dedup filters composed into one keep/drop verdict), a
  * behavioral funnel (ordered event-sequence match), and PMI-scored
  * bigram collocations.
  *
  * All are declarative single-pass plans: per-doc work happens map-side
  * inside whole-stage codegen, shuffles carry (key, partial-aggregate)
  * rows sized to the vocabulary or the user population — never raw text.
  */
object CorpusCleaning {

  /** Unicode-letter tokens, case-sensitive, empties dropped — the shared
    * reference tokenizer contract (src/mrapps/wc.go:22-26). */
  private def tokens = filter(split(col("text"), "[^\\p{L}]+"), x => x =!= "")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  // Unambiguous regexes (no backtracking-dependent alternatives) so Java's
  // engine and DuckDB's RE2 find byte-identical matches.
  private val emailRe = "[A-Za-z0-9]+@[A-Za-z0-9]+\\.com"
  private val phoneRe = "555-[0-9]{4}"

  /** Deterministic crawl-shaped URL per document (the fixture carries no
    * URL column, so q184/q185 synthesize one): logical page =
    * doc_id div 80, variant spelling = (doc_id div 20) % 4 — under the
    * fixture's source striping (source = doc_id % 20) each page sees
    * four docs of the SAME source in four URL forms: https+www+trailing
    * slash, http with utm/ref tracking params, uppercase host with
    * /index.html, and a genuine ?b=2&a=1 parameter page that
    * canonicalization must NOT merge into the other three. */
  private[graft] def syntheticUrl: org.apache.spark.sql.Column = {
    val page = expr("doc_id div 80").cast("string")
    val v = expr("(doc_id div 20) % 4")
    when(v === 0, concat(lit("https://www."), col("source"),
        lit(".example.com/docs/d"), page, lit("/")))
      .when(v === 1, concat(lit("http://"), col("source"),
        lit(".example.com/docs/d"), page, lit("?utm_source=feed&ref=rss")))
      .when(v === 2, concat(lit("HTTPS://"),
        upper(concat(col("source"), lit(".example.com"))),
        lit("/docs/d"), page, lit("/index.html")))
      .otherwise(concat(lit("https://"), col("source"),
        lit(".example.com/docs/d"), page, lit("?b=2&a=1")))
  }

  /** Registered domain of a URL: lowercased host, leading `www.`
    * stripped — the q185 quota key. */
  private[graft] def urlDomain(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    lower(regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://([^/?]+)", 1), "^www\\.", ""))

  /** Canonical URL — the C4/CCNet normalization chain, all map-side:
    * lowercase host minus `www.`, path minus default documents
    * (`/index.html`) and the trailing slash, query minus tracking params
    * (`utm_*`, `ref`, `fbclid`, `gclid`) with the survivors sorted so
    * parameter ORDER never splits a page. Scheme is dropped entirely
    * (http ≡ https for identity purposes). Every regex is
    * alternation-unambiguous so Java regex and DuckDB's RE2 match
    * byte-identically. */
  private[graft] def canonicalUrl(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?]+([^?]*)", 1),
      "(/index\\.html|/)$", "")
    val q = array_join(array_sort(filter(
      split(regexp_extract(url, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|ref|fbclid|gclid)="))), "&")
    concat(urlDomain(url), path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** THE per-doc cleaning verdict — q79's C4/Gopher-style rule chain
    * (exact-dup canonical, length floor, stopword-ratio quality floor,
    * language-ID agreement), factored out so the rollup (q79) and the
    * end-to-end curation run (q136) apply ONE rule set that cannot
    * drift (the cdcBoundaryPositions precedent). Emits one slim row per
    * doc: (doc_id, source, n_tokens, h6, reason) — h6 is q125's 24-bit
    * content hash, computed here because md5(text) is already on the
    * dup-canonical path. One corpus scan, one hash exchange (the md5
    * window). */
  private[graft] def cleanVerdict(s: SparkSession, d: String): DataFrame = {
    val pt = concat(lit(" "), col("text"), lit(" "))
    val predicted =
      when(pt.contains(" der ") || pt.contains(" und ") || pt.contains(" das "), "de")
        .when(pt.contains(" le ") || pt.contains(" la ") || pt.contains(" et "), "fr")
        .when(pt.contains(" el ") || pt.contains(" los ") || pt.contains(" es "), "es")
        .when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
        .otherwise("en")
    val stats = documents(s, d).select(
      col("doc_id"), col("source"), col("lang"),
      size(tokens).as("n_tokens"),
      size(filter(tokens, x => x.isin(stopwords: _*))).as("n_stop"),
      predicted.as("predicted"),
      conv(substring(md5(col("text")), 1, 6), 16, 10).cast("long").as("h6"),
      min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))
        .as("canonical"))
    val reason = when(col("doc_id") =!= col("canonical"), "dup")
      .when(col("n_tokens") < 20, "too_short")
      .when(col("n_stop") / col("n_tokens").cast("double") < 0.02, "low_quality")
      .when(col("predicted") =!= col("lang"), "lang_mismatch")
      .otherwise("keep")
    stats.select(col("doc_id"), col("source"), col("n_tokens"), col("h6"),
      reason.as("reason"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII redaction — the scrub pass every training corpus runs before
    // the tokenizer. The fixture text is letters-only, so deterministic
    // synthetic PII (emails/phones derived from doc_id, with varying
    // multiplicity) is appended first; the query then counts and redacts
    // it. Pure map-side row-at-a-time work: no shuffle at any corpus
    // size, and the regex stays in whole-stage codegen.
    "q78_pii_redact" -> ((s, d) => {
      val withPii = documents(s, d).select(col("doc_id"),
        concat(
          col("text"),
          expr("repeat(concat(' user', doc_id, '@mail', doc_id % 7, '.com')," +
            " CAST(doc_id % 3 AS INT))"),
          expr("repeat(concat(' call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))," +
            " CAST(doc_id % 2 AS INT))")).as("text"))
      withPii.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end cleaning pipeline (the C4/Gopher recipe as ONE plan):
    // exact-dup removal (content-hash canonical, window min — zero dups
    // in this fixture, the stage still runs), length floor, stopword-
    // density floor, and marker-language consistency, composed into a
    // first-match drop reason per doc, then aggregated per source. Per-doc
    // stats are map-side (token array ops); the only shuffles are the
    // fingerprint window and the final (source, reason) aggregation —
    // both carry slim rows, never text. The verdict CASE mirrors the
    // oracle clause-for-clause so the split is engine-exact.
    "q79_clean_pipeline" -> ((s, d) =>
      cleanVerdict(s, d)
        .groupBy(col("source"), col("reason"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("reason"))),

    // Ordered-sequence funnel: users who viewed, then clicked strictly
    // after their first view, then purchased strictly after that first
    // qualifying click. ONE scan and ONE exchange: the three dependent
    // per-user milestones are chained window minimums over the same
    // user_id partitioning (t1 = first view; t2 = first click after t1;
    // t3 = first purchase after t2), so Catalyst plans a single shuffle
    // feeding three window passes, then a metadata-sized distinct-user
    // aggregation. (A per-stage join formulation reads the corpus 6×;
    // this reads it once — the difference between 1× and 6× of 100 TB.)
    "q80_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val staged = events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2"), col("ts"))).over(w))
      val perUser = staged.groupBy(col("user_id"))
        .agg(max(col("t1").isNotNull).as("s1"),
          max(col("t2").isNotNull).as("s2"),
          max(col("t3").isNotNull).as("s3"))
      perUser.agg(
        sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n3"))
        .select(explode(array(
          struct(lit("1_view").as("step"), col("n1").as("n_users")),
          struct(lit("2_click").as("step"), col("n2").as("n_users")),
          struct(lit("3_purchase").as("step"), col("n3").as("n_users")))).as("r"))
        .select(col("r.step"), col("r.n_users"))
        .orderBy(col("step"))
    }),

    // Overlapping token-window chunking (RAG / long-context prep): each
    // doc splits into windows of 32 tokens with stride 24 (8-token
    // overlap); the tail keeps any remainder ≥ 8 tokens. One typed map
    // pass per doc — map-only at any corpus size, chunk ids are local
    // (doc_id, chunk_id) so no coordination. The chunk text is rebuilt
    // with single spaces (tokenizer-normalized), which the oracle
    // replays via list slicing.
    "q91_token_chunking" -> ((s, d) => {
      import s.implicits._
      val win = 32
      val stride = 24
      documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val t = graft.functions.TokenizeUdtf.SplitRe.split(text).filter(_.nonEmpty)
          val starts = 0 until math.max(t.length, 1) by stride
          starts.iterator.zipWithIndex
            .map { case (st, ci) =>
              val chunk = t.slice(st, st + win)
              (id, ci.toLong, chunk.length.toLong, chunk.mkString(" "))
            }
            .filter { case (_, ci, n, _) => ci == 0 || n >= 8 }
        }
        .toDF("doc_id", "chunk_id", "n_tokens", "chunk_text")
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Length-bucketed batching (inference/training serving prep): docs
    // grouped into 16-token-wide length buckets; per bucket the padded
    // cost is n_docs × bucket ceiling, and the padding overhead is the
    // gap to the true token sum — the metric that justifies bucketing
    // over naive batching. Map-side bucket assignment, one
    // vocabulary-of-buckets-sized aggregation.
    "q92_length_buckets" -> ((s, d) => {
      val n = size(tokens)
      documents(s, d)
        .select(ceil(n / lit(16.0)).cast("long").as("bucket"), n.as("n_tokens"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          (col("bucket") * 16 * count(lit(1)) - sum(col("n_tokens")))
            .as("padding_tokens"))
        .orderBy(col("bucket"))
    }),

    // Event-transition matrix (first-order Markov counts): each user's
    // event stream ordered by time, paired with its successor via a lead
    // window, aggregated to (from, to) transition counts. One exchange
    // on user_id for the window, then a vocabulary-sized (|event types|²)
    // aggregation — the standard path-analysis primitive at any scale.
    "q83_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Deterministic train/val/test split: the first hex digit of the
    // content hash buckets every doc 12/2/2 sixteenths — any worker
    // decides membership locally (no RNG state, no seed coordination,
    // reproducible across engines and runs; same rationale as q61), and
    // re-running on a grown corpus never reassigns an existing doc.
    "q85_train_split" -> ((s, d) => {
      val h = substring(md5(col("text")), 1, 1)
      val split = when(h.isin("c", "d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train")
      documents(s, d)
        .groupBy(col("lang"), split.as("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("split"))
    }),

    // Data-mixture quota sampling: each language capped at an exact
    // per-lang quota (en 100, others 50), members chosen by content-hash
    // rank — deterministic, engine-independent, and stable under corpus
    // growth ONLY for docs whose hash rank stays under the cap (the
    // standard mixture-rebalancing step before training). Skew-safe plan:
    // a bare per-lang rank window sorts each language in ONE task — on a
    // real corpus where `en` is 80%+ of rows that's a single-task sort of
    // most of the data. Instead the heap operator (TopKPerGroupExec) cuts
    // each language to the max quota in one O(n log k) streaming pass
    // (same single exchange), and only the ≤(quota × |langs|) survivors
    // see a rank window — which reuses the heap's partitioning, so the
    // whole query is still exactly one exchange. The survivor rank equals
    // the full-corpus rank (the heap keeps a PREFIX of the per-lang
    // ordering), so results are bit-identical to the window-only form
    // the oracle replays. When an approximate quota suffices, prefer the
    // rankless hash thresholds of q61/q85.
    "q95_quota_sample" -> ((s, d) => {
      val quota = when(col("lang") === "en", 100).otherwise(50)
      val withKey = documents(s, d)
        .select(col("lang"), col("doc_id"), md5(col("text")).as("hkey"))
      val top = graft.plans.TopKPerGroup.topK(withKey,
        Seq("lang"), Seq("hkey" -> true, "doc_id" -> true), k = 100)
      val w = Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
      top.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= quota)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // CANONICAL-URL DEDUP KEEP-LIST — the C4/CCNet pre-step (Raffel et
    // al. 2020 §2.1; Wenzek et al. 2020 §3: URL-level dedup precedes
    // content dedup because it is free): the same logical page arrives
    // under scheme/case/www/tracking-param/trailing-slash variants, and
    // canonicalization collapses them BEFORE any text is touched. The
    // fixture has no URL column, so [[syntheticUrl]] derives a
    // deterministic crawl-shaped URL per doc (four variant forms per
    // logical page — https+www+slash, http+utm/ref params,
    // uppercase-host+index.html, and a genuine ?b=2&a=1 param page that
    // canonicalization must NOT merge); [[canonicalUrl]] is the real
    // operator: lowercase host, strip www., drop default documents and
    // the trailing slash, remove tracking params (utm_*/ref/fbclid/
    // gclid), sort what remains. Everything is map-side string work in
    // codegen; the ONLY shuffle is the canonical-keyed rollup — linear,
    // hash-keyed, no pairwise path, the same shape as q26's exact dedup.
    "q184_url_canonical_dedup" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), col("source"), syntheticUrl.as("url"))
        .select(col("doc_id"), col("source"),
          canonicalUrl(col("url")).as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_variants"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("canonical_url"))
    }),

    // PER-DOMAIN QUOTA — the companion governance cap (C4 keeps ≤ a
    // fixed share per domain so one mega-site cannot dominate the mix;
    // CCNet buckets by domain for the same reason): at most 30 docs per
    // registered domain, selected by the deterministic md5(doc_id) coin
    // (q61's hash-sampling discipline — uniform, replayable, no RNG
    // state). Same skew-safe plan as q95: the TopKPerGroup heap cuts
    // every domain to its quota in one streaming pass — a mega-domain
    // with 10^9 pages never single-task-sorts — and the rank window only
    // numbers the ≤30 survivors on the heap's own partitioning; the
    // 20-row domain totals broadcast back in.
    "q185_domain_quota" -> ((s, d) => {
      val rel = documents(s, d)
        .select(col("doc_id"), syntheticUrl.as("url"))
        .select(col("doc_id"), urlDomain(col("url")).as("domain"),
          md5(col("doc_id").cast("string")).as("hkey"))
      val totals = rel.groupBy(col("domain")).agg(count(lit(1)).as("n_total"))
      val top = graft.plans.TopKPerGroup.topK(rel,
        Seq("domain"), Seq("hkey" -> true, "doc_id" -> true), k = 30)
      val w = Window.partitionBy(col("domain")).orderBy(col("hkey"), col("doc_id"))
      top.withColumn("rk", row_number().over(w))
        .join(broadcast(totals), "domain")
        .select(col("domain"), col("rk"), col("doc_id"), col("n_total"))
        .orderBy(col("domain"), col("rk"))
    }),

    // PMI-scored bigram collocations over the corpus, from ONE corpus
    // pass: every token occurrence emits exactly one (w, successor) pair
    // (successor null for a doc's last token) in a typed map pass (same
    // measured rationale as q75: Catalyst HOFs are interpreted), partial-
    // aggregated into a VOCABULARY-sized pair relation — and unigram
    // counts, totals, and the PMI joins all derive from that relation,
    // never rescanning the text. AQE's stage reuse collapses the shared
    // subtree to one physical shuffle. Ordering uses the ROUNDED score so
    // the top-20 cutoff can't straddle an ulp between engines.
    "q81_bigram_pmi" -> ((s, d) => {
      import s.implicits._
      val pairs = documents(s, d).select(col("text")).as[String]
        .flatMap { text =>
          val t = graft.functions.TokenizeUdtf.SplitRe.split(text).filter(_.nonEmpty)
          t.indices.iterator.map { i =>
            (t(i), if (i + 1 < t.length) t(i + 1) else null)
          }
        }
        .toDF("w1", "w2")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      val uni = pairs.groupBy(col("w1").as("w")).agg(sum(col("n_pair")).as("cnt"))
      val bi = pairs.filter(col("w2").isNotNull)
      val totals = uni.agg(sum(col("cnt")).cast("double").as("t_total"))
        .crossJoin(bi.agg(sum(col("n_pair")).cast("double").as("b_total")))
      bi.join(uni.select(col("w").as("w1"), col("cnt").as("ca")), "w1")
        .join(uni.select(col("w").as("w2"), col("cnt").as("cb")), "w2")
        .crossJoin(totals)
        .filter(col("n_pair") >= 5)
        .select(col("w1"), col("w2"), col("n_pair"),
          round(log((col("n_pair") / col("b_total")) /
            ((col("ca") / col("t_total")) * (col("cb") / col("t_total")))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // THE CORPUS DATASHEET — the per-(source, language) summary table a
    // dataset release publishes (Gebru et al., "Datasheets for
    // Datasets") and a curation team reads before training: volume
    // (docs, reference-tokenizer tokens), exact-duplicate exposure
    // (docs whose full content hash recurs ANYWHERE in the corpus — the
    // cross-source leakage number q79's per-source funnel cannot show),
    // short-doc counts (q79's length floor), and mean document length.
    // One corpus scan; the only corpus-sized exchange is the md5 window
    // (4 slim columns — text never shuffles; the q79 verdict's exact
    // cost), then a sources×languages rollup. avg() divides an
    // integer-exact sum, so both engines produce the identical double.
    "q144_corpus_datasheet" -> ((s, d) => {
      val nTok = size(filter(split(col("text"), "[^\\p{L}]+"), x => x =!= ""))
      documents(s, d)
        .select(col("source"), col("lang"), nTok.as("n_toks"),
          count(lit(1)).over(Window.partitionBy(md5(col("text"))))
            .as("n_same"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("n_toks").cast("long")).as("n_tokens"),
          sum(when(col("n_toks") < 20, 1L).otherwise(0L)).as("n_short"),
          round(avg(col("n_toks")), 4).as("avg_doc_tokens"))
        .orderBy(col("source"), col("lang"))
    }),

    // LEARNED QUALITY CLASSIFIER INFERENCE — the fastText/CCNet stage
    // the rule chain (q79) approximates by hand: a logistic-regression
    // quality model, trained OFFLINE against the rule verdict as
    // teacher (scripts/train_quality.py over the sf0.1 fixture — the
    // engine never trains) and FROZEN as a weight literal, scores every
    // doc map-side. This is exactly how a learned gate runs at 100 TB:
    // weights live in the closure (no broadcast, no join, no shuffle —
    // the only exchange is the final orderBy), features are six
    // deterministic per-doc statistics inside whole-stage codegen, and
    // the decision is one dot product per document. The emitted score
    // is the LOGIT (rounded, exact IEEE arithmetic both engines replay
    // bit-identically); sigmoid is monotone, so keep ⇔ logit ≥ 0 and
    // the gate never evaluates exp — an exp()-based probability could
    // diverge in the last ulp between Java's and DuckDB's libm and is
    // deliberately not part of the contract (q192's sqrt-chain
    // rationale). 96.6% teacher agreement at training time; the spec
    // pins agreement ≥ 0.9 on held-out sf0.001 plus known-good/bad
    // probes.
    "q208_quality_classifier" -> ((s, d) =>
      qualityLogit(s, d)
        .select(col("doc_id"), col("source"), col("score"),
          (col("score") >= graft.Thresholds.QualityLogitKeepMin)
            .cast("int").as("keep"))
        .orderBy(col("doc_id"))),

    // WITHIN-DOCUMENT REPETITION FILTER — the Gopher repetition gate
    // (Rae et al. 2021, "Scaling Language Models", Table A1): a doc
    // dominated by one repeated n-gram, or whose long n-grams keep
    // recurring, is boilerplate/template spam and poisons pre-training.
    // Two signals per doc over the shared tokenizer contract:
    // top_bigram_frac (occurrences of the modal bigram / bigram slots)
    // and dup_5gram_frac (5-gram slots occupied by a repeat). keep ⇔
    // top-bigram ≤ 0.05 (fixture-calibrated — word-salad p75 ≈ 0.047,
    // so both classes are populated) AND dup-5-gram ≤ 0.15 (Gopher's
    // own threshold; identically 0 on the salad fixture, so the spec
    // pins that leg on crafted repetitive text instead). Plan shape:
    // repetition is a PER-DOC property, so unlike the corpus-keyed gram
    // rollups (q186/q203) nothing leaves the map side — one typed pass
    // per document ([[repetitionStatsOf]]: modal bigram count via a
    // per-doc hash map, distinct 5-grams via a hash set, state bounded
    // by one doc); at 100 TB the only exchange is the final orderBy.
    // The gate compares the ROUNDED fractions, so the oracle's
    // relational replay (GROUP BY recount — modal gram count ≡ modal
    // hash-map maximum) cannot straddle an ulp.
    "q210_repetition_filter" -> ((s, d) =>
      repetitionStatsOf(documents(s, d)).orderBy(col("doc_id"))),

    // BEST-OF-CLUSTER CANONICAL SELECTION — the refinement of naive
    // near-dup dedup that production corpora actually run: instead of
    // keeping an arbitrary member (min doc_id) of each near-duplicate
    // cluster, keep the HIGHEST-QUALITY member by the learned
    // classifier's logit (q208), tiebroken by doc_id. Composes two
    // existing relations: the verified MinHash cluster labels (q27's
    // pair graph → q72's components, cached) and the map-side quality
    // score. Every doc gets cluster_id = coalesce(label, doc_id) — its
    // own singleton when unclustered — so ONE window partitioned by
    // cluster_id ranks everything; the largest window partition is the
    // largest near-dup cluster, never the corpus, and the shuffle is
    // one hash exchange on cluster_id. keep ⇔ rank 1 on (score DESC,
    // doc_id ASC) over the ROUNDED logit — the oracle replays the
    // identical order.
    "q212_cluster_best_keeper" -> ((s, d) => {
      val labels = graft.functions.Dedup.nearDupLabels(s, d)
      val j = qualityLogit(s, d).select(col("doc_id"), col("score"))
        .join(labels, Seq("doc_id"), "left_outer")
        .withColumn("cluster_id",
          coalesce(col("cluster_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("score").desc, col("doc_id"))
      j.withColumn("rk", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .select(col("doc_id"), col("cluster_id"), col("n_members"),
          col("score"), (col("rk") === 1).cast("int").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // TEMPLATE-PREFIX DETECTION — the boilerplate signal C4's line-level
    // dedup and Gopher's repetition gate both miss: many DISTINCT
    // documents opening with the same token stub ("sign in to continue",
    // "terms of service") mark a template family worth stripping or
    // down-weighting, and near-dup MinHash won't cluster them because
    // the bodies differ. Prefix length is fixture-calibrated at 2 tokens
    // (word salad repeats nothing longer; a crawl corpus would use
    // 8–32); the detector shape is length-independent. Plan: the prefix
    // is one map-side array slice, the rollup shuffles (prefix, partial
    // agg) rows only, the 1-row total broadcasts, and the deterministic
    // (n_docs DESC, prefix) cut runs as TakeOrderedAndProject — a heap,
    // never a global sort, so the output stays ≤100 rows at any corpus
    // size.
    // LEARNED-GATE CALIBRATION AUDIT — the table a quality-classifier
    // deployment is tuned on: for each candidate logit threshold, the
    // corpus keep share and the agreement with the RULE verdict (q79's
    // chain — the teacher q208's weights were trained against). This is
    // how the gate's operating point moves from the default logit-0 to
    // a corpus-size-vs-precision trade (CCNet keeps roughly its best
    // third), measured instead of guessed. Plan: the logit pass is
    // map-side codegen, the rule verdict pays its one md5-window
    // exchange, the doc_id join is hash-keyed and slim, the 5-row
    // threshold grid broadcasts, output is grid-sized.
    "q230_gate_calibration" -> ((s, d) => {
      import s.implicits._
      val perDoc = qualityLogit(s, d).select(col("doc_id"), col("score"))
        .join(cleanVerdict(s, d).select(col("doc_id"),
          (col("reason") === "keep").as("rule_keep")), "doc_id")
      val grid = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).toDF("threshold")
      perDoc.crossJoin(broadcast(grid))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= col("threshold"), 1L).otherwise(0L))
            .as("n_keep"),
          sum(when((col("score") >= col("threshold")) === col("rule_keep"),
            1L).otherwise(0L)).as("n_agree"))
        .select(col("threshold"), col("n_keep"),
          round(col("n_keep") / col("n_docs").cast("double"), 6)
            .as("keep_share"),
          round(col("n_agree") / col("n_docs").cast("double"), 6)
            .as("agreement"))
        .orderBy(col("threshold"))
    }),

    "q213_template_prefixes" -> ((s, d) => {
      val p = graft.Thresholds.TemplatePrefixTokens
      val base = documents(s, d)
        .select(col("doc_id"), col("source"), tokens.as("toks"))
        .filter(size(col("toks")) >= p)
        .select(col("doc_id"), col("source"),
          array_join(slice(col("toks"), 1, p), " ").as("prefix"))
      val total = base.agg(count(lit(1)).cast("double").as("n_total"))
      base.groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("example_doc"))
        .filter(col("n_docs") >= 3)
        .crossJoin(broadcast(total))
        .select(col("prefix"), col("n_docs"), col("n_sources"),
          round(col("n_docs") / col("n_total"), 6).as("share"),
          col("example_doc"))
        .orderBy(col("n_docs").desc, col("prefix")).limit(100)
    })
  )

  /** q210's per-doc repetition statistics over an arbitrary
    * documents-shaped relation — (doc_id, n_tokens, top_bigram_frac,
    * dup_5gram_frac, keep) for docs of ≥5 tokens; shared with the
    * streaming admission path (q219), which treats shorter docs as
    * rep-gate-vacuous. One TYPED map pass per document (the q75/q114
    * rationale: Catalyst array HOFs are interpreted CodegenFallbacks —
    * the first cut of this operator sorted gram arrays through
    * aggregate() lambdas and cost 2.5× this form — 2.27 s → 0.89 s
    * measured at sf0.1): modal bigram count
    * via one open hash map, distinct 5-grams via one hash set, both
    * sized by the doc and discarded with it. Still map-only at any
    * corpus size; counts are integers, so the fractions and the gate
    * are bit-identical to the relational oracle. */
  private[graft] def repetitionStatsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val counted = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val t = graft.functions.TokenizeUdtf.SplitRe.split(text)
            .filter(_.nonEmpty)
          if (t.length < 5) Iterator.empty
          else {
            val (n, mx, nd) = repCounts(t)
            Iterator.single((id, n.toLong, mx.toLong, nd.toLong))
          }
        }
      }
      .toDF("doc_id", "n_tokens", "mx", "nd")
    val topBi = round(col("mx") /
      (col("n_tokens") - 1).cast("double"), 6)
    val dup5 = round((col("n_tokens") - 4 - col("nd")) /
      (col("n_tokens") - 4).cast("double"), 6)
    counted.select(col("doc_id"), col("n_tokens"),
      topBi.as("top_bigram_frac"), dup5.as("dup_5gram_frac"),
      (topBi <= graft.Thresholds.RepTopBigramMax &&
        dup5 <= graft.Thresholds.RepDup5gramMax).cast("int").as("keep"))
  }

  /** q210's per-doc fold kernel over a pre-split token array:
    * (n_tokens, modal-bigram count, distinct-5-gram count). Shared by
    * [[repetitionStatsOf]] and the end-to-end pipeline's combined pass
    * (CurationPipeline) so the repetition arithmetic cannot drift
    * between the standalone gate and the composed run. */
  private[graft] def repCounts(t: Array[String]): (Int, Int, Int) = {
    val n = t.length
    val bi = new java.util.HashMap[String, Integer](n * 2)
    var mx = 0
    var i = 0
    while (i < n - 1) {
      val c = bi.merge(t(i) + " " + t(i + 1), 1,
        (a, b) => Integer.valueOf(a.intValue + b.intValue))
      if (c > mx) mx = c
      i += 1
    }
    val g5 = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n - 4) {
      g5.add(t(i) + " " + t(i + 1) + " " + t(i + 2) + " " +
        t(i + 3) + " " + t(i + 4))
      i += 1
    }
    (n, mx, g5.size)
  }

  /** The q210 gate predicate as DuckDB SQL over (modal-count, n-token,
    * distinct-5-gram-count) expressions — thresholds interpolated from
    * [[graft.Thresholds]] so the engine and every oracle that replays
    * the gate move together. */
  private[graft] def repGateSql(top: String, n: String, nd: String): String =
    s"round($top * 1.0 / ($n - 1), 6) <= " +
      s"${graft.Thresholds.RepTopBigramMax} AND " +
      s"round(($n - 4 - $nd) * 1.0 / ($n - 4), 6) <= " +
      s"${graft.Thresholds.RepDup5gramMax}"

  /** q208's scoring pass, shared with q212: the frozen-weights logistic
    * logit per document — (doc_id, source, score), all map-side, one
    * codegen dot product per row. */
  private[graft] def qualityLogit(s: SparkSession, d: String): DataFrame =
    qualityLogitOf(documents(s, d))

  /** The same scoring pass over an arbitrary documents-shaped relation
    * (doc_id, source, lang, text) — the form the STREAMING admission
    * path (q219) applies per micro-batch. */
  private[graft] def qualityLogitOf(docs: DataFrame): DataFrame = {
    val pt = concat(lit(" "), col("text"), lit(" "))
    val predicted =
      when(pt.contains(" der ") || pt.contains(" und ")
        || pt.contains(" das "), "de")
        .when(pt.contains(" le ") || pt.contains(" la ")
          || pt.contains(" et "), "fr")
        .when(pt.contains(" el ") || pt.contains(" los ")
          || pt.contains(" es "), "es")
        .when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
        .otherwise("en")
    val base = docs.select(col("doc_id"), col("source"),
      col("lang"), col("text"),
      size(tokens).as("n_tokens"),
      size(filter(tokens, x => x.isin(stopwords: _*))).as("n_stop"),
      length(regexp_replace(col("text"), "[^\\p{L}]", "")).as("n_letters"),
      predicted.as("predicted"))
    val nt1 = greatest(col("n_tokens"), lit(1)).cast("double")
    val feat = base.select(col("doc_id"), col("source"),
      round(least(col("n_tokens"), lit(200)) / lit(200.0), 6).as("x1"),
      round(col("n_stop") / nt1, 6).as("x2"),
      when(col("predicted") === col("lang"), 1.0).otherwise(0.0).as("x3"),
      round(lit(1.0) - length(regexp_replace(col("text"), " ", ""))
        / length(col("text")).cast("double"), 6).as("x4"),
      round(col("n_letters") / (lit(10.0) * nt1), 6).as("x5"))
    feat.select(col("doc_id"), col("source"),
      round(
        lit(Qw(0)) + lit(Qw(1)) * col("x1") + lit(Qw(2)) * col("x2") +
          lit(Qw(3)) * col("x3") + lit(Qw(4)) * col("x4") +
          lit(Qw(5)) * col("x5"), 6).as("score"))
  }

  /** q208's frozen logistic-regression weights — bias, then x1..x5
    * (length, stopword density, language agreement, space ratio, mean
    * token length; exact formulas in scripts/train_quality.py, which
    * regenerates this literal deterministically from the sf0.1
    * fixture). */
  private[graft] val Qw: Array[Double] = Array(
    -10.477025486327573, 15.587616694192102, 7.674218655701867,
    11.116499005843007, -0.545156708473783, -5.812091316255362)

  /** The q208 scoring chain as named DuckDB CTEs (`qbase`/`qfeat`/
    * `qscore` — q-prefixed so they compose beside [[graft.functions
    * .Dedup.shingleCtes]] without collisions), shared by the q208 and
    * q212 oracles so the score formula cannot drift between them.
    * `qscore` carries (doc_id, source, score). */
  private[graft] lazy val qualityScoreCtes: String = {
    val w = Qw.map(_.toString)
    s"""qbase AS (
           SELECT doc_id, source, lang, text,
             len(list_filter(string_split_regex(text, '[^\\p{L}]+'),
               x -> x <> '')) AS n_tokens,
             len(list_filter(string_split_regex(text, '[^\\p{L}]+'),
               x -> x IN ('the','a','of','and','to','in','is','on')))
               AS n_stop,
             length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS n_letters,
             ' ' || text || ' ' AS pt
           FROM documents),
         qfeat AS (
           SELECT doc_id, source,
             round(least(n_tokens, 200) / 200.0, 6) AS x1,
             round(n_stop / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS x2,
             CASE WHEN (CASE
                 WHEN contains(pt, ' der ') OR contains(pt, ' und ')
                   OR contains(pt, ' das ') THEN 'de'
                 WHEN contains(pt, ' le ') OR contains(pt, ' la ')
                   OR contains(pt, ' et ') THEN 'fr'
                 WHEN contains(pt, ' el ') OR contains(pt, ' los ')
                   OR contains(pt, ' es ') THEN 'es'
                 WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                 ELSE 'en' END) = lang THEN 1.0 ELSE 0.0 END AS x3,
             round(1.0 - length(replace(text, ' ', ''))
               / CAST(length(text) AS DOUBLE), 6) AS x4,
             round(n_letters / (10.0 * greatest(n_tokens, 1)), 6) AS x5
           FROM qbase),
         qscore AS (
           SELECT doc_id, source,
             round(${w(0)} + ${w(1)} * x1 + ${w(2)} * x2 + ${w(3)} * x3
               + ${w(4)} * x4 + ${w(5)} * x5, 6) AS score
           FROM qfeat)"""
  }

  /** The q79 stats/verdict CTE block, shared verbatim with q136's
    * oracle (PipelineOps) so the sibling oracles cannot drift — the CDC
    * fragment precedent. `verdict` carries (doc_id, source, n_tokens,
    * h6, reason); h6 replays q125's 24-bit content hash. */
  private[graft] val cleanVerdictCtes: String =
    """stats AS (
           SELECT doc_id, source, lang,
             len(list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x <> '')) AS n_tokens,
             len(list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x IN ('the','a','of','and','to','in','is','on'))) AS n_stop,
             CASE
               WHEN contains(' '||text||' ', ' der ') OR contains(' '||text||' ', ' und ')
                 OR contains(' '||text||' ', ' das ') THEN 'de'
               WHEN contains(' '||text||' ', ' le ') OR contains(' '||text||' ', ' la ')
                 OR contains(' '||text||' ', ' et ') THEN 'fr'
               WHEN contains(' '||text||' ', ' el ') OR contains(' '||text||' ', ' los ')
                 OR contains(' '||text||' ', ' es ') THEN 'es'
               WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
               ELSE 'en' END AS predicted,
             list_reduce(list_prepend(0::BIGINT,
               [strpos('0123456789abcdef', c)::BIGINT - 1
                for c in string_split(substr(md5(text), 1, 6), '')]),
               (a, x) -> a * 16 + x) AS h6,
             min(doc_id) OVER (PARTITION BY md5(text)) AS canonical
           FROM documents),
         verdict AS (
           SELECT doc_id, source, n_tokens, h6,
             CASE WHEN doc_id <> canonical THEN 'dup'
                  WHEN n_tokens < 20 THEN 'too_short'
                  WHEN n_stop * 1.0 / n_tokens < 0.02 THEN 'low_quality'
                  WHEN predicted <> lang THEN 'lang_mismatch'
                  ELSE 'keep' END AS reason
           FROM stats)"""

  /** The q184/q185 URL synth + canonicalization as DuckDB SQL — kept as
    * named fragments so both oracles read the one definition (the
    * cdcBoundaryPositions no-drift precedent). */
  private[graft] val UrlSynthSql = """
    CASE (doc_id // 20) % 4
      WHEN 0 THEN 'https://www.' || source || '.example.com/docs/d'
        || (doc_id // 80) || '/'
      WHEN 1 THEN 'http://' || source || '.example.com/docs/d'
        || (doc_id // 80) || '?utm_source=feed&ref=rss'
      WHEN 2 THEN 'HTTPS://' || upper(source || '.example.com')
        || '/docs/d' || (doc_id // 80) || '/index.html'
      ELSE 'https://' || source || '.example.com/docs/d'
        || (doc_id // 80) || '?b=2&a=1'
    END"""
  private val UrlDomainSql = """
    lower(regexp_replace(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1),
      '^www\.', ''))"""
  private val UrlQuerySql = """array_to_string(list_sort(list_filter(
    string_split(regexp_extract(url, '\?(.*)$', 1), '&'),
    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)='))),
    '&')"""
  private[graft] val UrlCanonSql = s"""
    $UrlDomainSql
    || regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?]+([^?]*)', 1),
         '(/index\\.html|/)$$', '')
    || CASE WHEN $UrlQuerySql <> '' THEN '?' || $UrlQuerySql ELSE '' END"""

  val oracles: Map[String, String] = Map(
    "q184_url_canonical_dedup" ->
      s"""WITH u AS (SELECT doc_id, source, $UrlSynthSql AS url
             FROM documents),
         c AS (SELECT doc_id, source, $UrlCanonSql AS canonical_url FROM u)
         SELECT canonical_url, min(doc_id) AS keeper,
           count(*) AS n_variants, count(DISTINCT source) AS n_sources
         FROM c GROUP BY canonical_url ORDER BY canonical_url""",
    "q185_domain_quota" ->
      s"""WITH u AS (SELECT doc_id, $UrlSynthSql AS url FROM documents),
         c AS (SELECT doc_id, $UrlDomainSql AS domain FROM u),
         t AS (SELECT domain, count(*) AS n_total FROM c GROUP BY domain),
         r AS (SELECT domain, doc_id,
             row_number() OVER (PARTITION BY domain
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
           FROM c)
         SELECT r.domain, r.rk, r.doc_id, t.n_total
         FROM r JOIN t USING (domain) WHERE rk <= 30
         ORDER BY domain, rk""",
    "q78_pii_redact" ->
      """WITH pii AS (
           SELECT doc_id,
             text
               || repeat(' user' || doc_id || '@mail' || (doc_id % 7) || '.com',
                    CAST(doc_id % 3 AS INT))
               || repeat(' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    CAST(doc_id % 2 AS INT)) AS text
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9]+@[A-Za-z0-9]+\.com')) AS n_emails,
           len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
           regexp_replace(regexp_replace(text, '[A-Za-z0-9]+@[A-Za-z0-9]+\.com',
             '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g') AS clean_text
         FROM pii ORDER BY doc_id""",
    "q79_clean_pipeline" ->
      s"""WITH $cleanVerdictCtes
         SELECT source, reason, count(*) AS n_docs
         FROM verdict GROUP BY source, reason ORDER BY source, reason""",
    "q80_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t1
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.t2
           GROUP BY e.user_id)
         SELECT '1_view' AS step, count(*) AS n_users FROM v
         UNION ALL SELECT '2_click', count(*) FROM c
         UNION ALL SELECT '3_purchase', count(*) FROM p
         ORDER BY step""",
    "q95_quota_sample" ->
      """SELECT lang, rk, doc_id FROM (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(text), doc_id) AS rk
           FROM documents)
         WHERE rk <= CASE WHEN lang = 'en' THEN 100 ELSE 50 END
         ORDER BY lang, rk""",
    "q91_token_chunking" ->
      """WITH toks AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x <> '') AS t
           FROM documents),
         chunks AS (
           SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(greatest(len(t), 1) / 24.0) AS BIGINT)),
               ci -> {'ci': ci, 'c': t[ci*24+1 : ci*24+32]})) AS g
           FROM toks)
         SELECT doc_id, g.ci AS chunk_id, len(g.c) AS n_tokens,
           array_to_string(g.c, ' ') AS chunk_text
         FROM chunks
         WHERE g.ci = 0 OR len(g.c) >= 8
         ORDER BY doc_id, chunk_id""",
    "q92_length_buckets" ->
      """WITH t AS (
           SELECT CAST(ceil(len(list_filter(
               string_split_regex(text, '[^\p{L}]+'), x -> x <> '')) / 16.0)
             AS BIGINT) AS bucket,
             len(list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x <> '')) AS n_tokens
           FROM documents)
         SELECT bucket, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(bucket * 16 * count(*) - sum(n_tokens) AS BIGINT)
             AS padding_tokens
         FROM t GROUP BY bucket ORDER BY bucket""",
    "q83_transition_matrix" ->
      """SELECT event_type AS from_type, next_type AS to_type,
         count(*) AS n_transitions
         FROM (
           SELECT event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         WHERE next_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY from_type, to_type""",
    "q85_train_split" ->
      """SELECT lang,
         CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
              WHEN substr(md5(text), 1, 1) IN ('e', 'f') THEN 'test'
              ELSE 'train' END AS split,
         count(*) AS n_docs
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    "q81_bigram_pmi" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(text, '[^\p{L}]+'),
             x -> x <> '') AS t
           FROM documents),
         uni AS (
           SELECT w, count(*) AS cnt FROM (SELECT unnest(t) AS w FROM toks)
           GROUP BY w),
         bi AS (
           SELECT g[1] AS w1, g[2] AS w2, count(*) AS n_pair FROM (
             SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
               i -> t[i:i+1])) AS g
             FROM toks)
           GROUP BY 1, 2),
         tot AS (
           SELECT (SELECT sum(cnt) * 1.0 FROM uni) AS t_total,
                  (SELECT sum(n_pair) * 1.0 FROM bi) AS b_total)
         SELECT w1, w2, n_pair,
           round(ln((n_pair / b_total) /
             ((a.cnt / t_total) * (b.cnt / t_total))), 6) AS pmi
         FROM bi
         JOIN uni a ON bi.w1 = a.w
         JOIN uni b ON bi.w2 = b.w
         CROSS JOIN tot
         WHERE n_pair >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 20""",

    // same corpus-wide md5 window, same tokenizer, same integer-exact
    // avg (sum of integer token counts divides exactly in double)
    "q144_corpus_datasheet" ->
      """WITH s AS (
           SELECT source, lang,
             len(list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x <> '')) AS n_toks,
             count(*) OVER (PARTITION BY md5(text)) AS n_same
           FROM documents)
         SELECT source, lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           round(avg(n_toks), 4) AS avg_doc_tokens
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    // q208 replay: the same six features (same 6-dec rounding), the
    // same frozen weights (shortest-roundtrip doubles parse back
    // bit-identically), the same left-associated dot product — and no
    // exp anywhere, so the score arithmetic is exact IEEE on both
    // engines.
    "q208_quality_classifier" ->
      s"""WITH $qualityScoreCtes
         SELECT doc_id, source, score,
           CAST(score >= ${graft.Thresholds.QualityLogitKeepMin} AS INT)
             AS keep
         FROM qscore ORDER BY doc_id""",

    // the q188 recursive-reach cluster labels + the q208 score fragment,
    // composed: one window replays the (score DESC, doc_id) argmax
    "q212_cluster_best_keeper" ->
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
         $qualityScoreCtes,
         j AS (
           SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
             q.score
           FROM qscore q LEFT JOIN labels l USING (doc_id)),
         r AS (
           SELECT j.*,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY score DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY cluster_id) AS n_members
           FROM j)
         SELECT doc_id, cluster_id, n_members, score,
           CAST(rk = 1 AS INT) AS keep
         FROM r ORDER BY doc_id""",

    // both shared fragments composed (their CTE name sets are disjoint);
    // the grid is cast to DOUBLE so the threshold column's type matches
    // Spark's (a bare -2.0 literal list would be DECIMAL in DuckDB)
    "q230_gate_calibration" ->
      s"""WITH $qualityScoreCtes,
         $cleanVerdictCtes,
         g AS (SELECT unnest(CAST([-2.0, -1.0, 0.0, 1.0, 2.0]
           AS DOUBLE[])) AS threshold),
         pd AS (
           SELECT q.doc_id, q.score, (v.reason = 'keep') AS rule_keep
           FROM qscore q JOIN verdict v ON q.doc_id = v.doc_id)
         SELECT threshold,
           CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
             AS BIGINT) AS n_keep,
           round(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS keep_share,
           round(sum(CASE WHEN (score >= threshold) = rule_keep
             THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS agreement
         FROM pd CROSS JOIN g GROUP BY threshold ORDER BY threshold""",

    "q213_template_prefixes" ->
      s"""WITH t AS (
           SELECT doc_id, source,
             list_filter(string_split_regex(text, '[^\\p{L}]+'),
               x -> x <> '') AS toks
           FROM documents),
         p AS (
           SELECT doc_id, source,
             array_to_string(toks[1:${graft.Thresholds.TemplatePrefixTokens}],
               ' ') AS prefix
           FROM t WHERE len(toks) >= ${graft.Thresholds.TemplatePrefixTokens}),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM p),
         g AS (
           SELECT prefix, count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             min(doc_id) AS example_doc
           FROM p GROUP BY prefix)
         SELECT prefix, n_docs, n_sources,
           round(n_docs / n_total, 6) AS share, example_doc
         FROM g CROSS JOIN tot WHERE n_docs >= 3
         ORDER BY n_docs DESC, prefix LIMIT 100""",

    // Relational replay of the run-fold: modal sorted-run length ≡ modal
    // GROUP BY count, distinct runs ≡ COUNT(DISTINCT gram).
    "q210_repetition_filter" ->
      ("""WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '[^\p{L}]+'),
               x -> x <> '') AS toks
           FROM documents),
         n AS (SELECT doc_id, len(toks) AS n_tokens FROM t
               WHERE len(toks) >= 5),
         bi AS (
           SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
             i -> toks[i+1] || ' ' || toks[i+2])) AS g
           FROM t WHERE len(toks) >= 5),
         g5 AS (
           SELECT doc_id, unnest(list_transform(range(len(toks) - 4),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
               || ' ' || toks[i+4] || ' ' || toks[i+5])) AS g
           FROM t WHERE len(toks) >= 5),
         bs AS (SELECT doc_id, max(c) AS top FROM
           (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2)
           GROUP BY 1),
         fs AS (SELECT doc_id, count(DISTINCT g) AS nd FROM g5 GROUP BY 1)
         SELECT n.doc_id, n.n_tokens,
           round(bs.top * 1.0 / (n.n_tokens - 1), 6) AS top_bigram_frac,
           round((n.n_tokens - 4 - fs.nd) * 1.0 / (n.n_tokens - 4), 6)
             AS dup_5gram_frac,
           CAST(""" +
        repGateSql("bs.top", "n.n_tokens", "fs.nd") + """ AS INT) AS keep
         FROM n JOIN bs USING (doc_id) JOIN fs USING (doc_id)
         ORDER BY n.doc_id""")
  )
}
