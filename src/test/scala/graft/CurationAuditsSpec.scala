package graft

import graft.operators.CurationAudits
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-11 corpus-growth/governance audits
  * (value-exactness is the DuckDB oracle's job; these pin the invariants
  * the oracle can't express).
  */
class CurationAuditsSpec extends TestSpark {

  test("q186 novelty: first batch is all-new, cumulative is exact and monotone") {
    val r = CurationAudits.queries("q186_ngram_novelty")(spark, sf0001)
      .collect().sortBy(_.getLong(0))
    assert(r.length <= 50, s"batch count ${r.length} must stay bounded at 50")
    val first = r.head
    // every gram in the first non-empty batch is seen for the first time
    assert(first.getLong(2) == first.getLong(3),
      "batch 0 grams_seen must equal new_grams")
    assert(first.getDouble(5) == 1.0, "batch 0 novelty_rate must be 1.0")
    // cumulative = running sum of new_grams, monotone nondecreasing
    var cum = 0L
    r.foreach { row =>
      cum += row.getLong(3)
      assert(row.getLong(4) == cum, s"cum_grams drifted at batch ${row.getLong(0)}")
      assert(row.getLong(3) <= row.getLong(2),
        "new_grams cannot exceed grams_seen")
    }
    // total new grams over all batches == the corpus's distinct trigrams
    val totalGrams = functions.Dedup.sharedShingles(spark, sf0001)
      .select(explode(col("shingles")).as("s")).select(col("s")).distinct().count()
    assert(cum == totalGrams,
      s"sum(new_grams)=$cum must equal the distinct corpus gram count $totalGrams")
    // the batch spine partitions the corpus
    assert(r.map(_.getLong(1)).sum == Tables.documents(spark, sf0001).count())
  }

  test("q187 rendezvous: movers land ONLY on the new shard, ~1/9 move") {
    val r = CurationAudits.queries("q187_rendezvous_shards")(spark, sf0001)
      .collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(r.map(_.getLong(1)).sum == nDocs, "per-shard counts must partition the corpus")
    assert(r.map(_.getLong(0)).sorted.sameElements(0L until 8L),
      "all 8 old shards must appear")
    // THE rendezvous invariant: a doc's owner changes iff the NEW shard
    // wins its argmax — so every mover's new owner is shard 8, and
    // non-movers keep their exact old owner (recomputed independently).
    val owners = Tables.documents(spark, sf0001)
      .select(CurationAudits.hrwOwner(8).as("o8"),
        CurationAudits.hrwOwner(9).as("o9"))
      .collect()
    owners.foreach { row =>
      val (o8, o9) = (row.getInt(0), row.getInt(1))
      assert(o9 == o8 || o9 == 8,
        s"HRW violation: owner moved $o8 -> $o9 without the new shard winning")
    }
    val moved = r.map(_.getLong(2)).sum.toDouble / nDocs
    assert(moved > 0.03 && moved < 0.25,
      s"moved fraction $moved implausibly far from the theoretical 1/9")
  }

  test("q188 leakage-safe split: quarantine is exactly the tainted-cluster train docs") {
    val folds = CurationAudits.queries("q188_leakage_safe_split")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(folds.size == Tables.documents(spark, sf0001).count().toInt)
    // recompute the raw q140 fold rule and the near-dup cluster labels
    val h4 = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 10
    val rawFold = when(h4 < 8, "train").when(h4 === 8, "val").otherwise("test")
    val raw = Tables.documents(spark, sf0001)
      .select(col("doc_id"), rawFold.as("fold"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = functions.Dedup.nearDupLabels(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tainted = labels.collect {
      case (doc, cl) if raw(doc) != "train" => cl
    }.toSet
    folds.foreach { case (doc, fold) =>
      val expected =
        if (raw(doc) == "train" && labels.get(doc).exists(tainted)) "quarantine"
        else raw(doc)
      assert(fold == expected,
        s"doc $doc: fold $fold, expected $expected (raw ${raw(doc)})")
    }
    // eval folds are never touched
    assert(folds.forall { case (doc, f) =>
      raw(doc) == "train" || f == raw(doc) })
  }

  test("q192 weighted sample: per-source top-10, weights actually bias selection") {
    val df = CurationAudits.queries("q192_weighted_sample")(spark, sf0001)
    val r = df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup "),
      "q192's per-source cut must run through the heap operator")
    val bySource = r.groupBy(_.getString(0))
    val corpusPerSource = Tables.documents(spark, sf0001)
      .groupBy(col("source")).count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(bySource.keySet == corpusPerSource.keySet,
      "every source must be sampled")
    bySource.foreach { case (src, rows) =>
      val k = math.min(10L, corpusPerSource(src))
      assert(rows.length == k, s"$src: ${rows.length} rows, expected $k")
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to k),
        s"$src: ranks not contiguous")
      assert(rows.map(_.getLong(2)).distinct.length == rows.length,
        s"$src: duplicate doc sampled")
      // priorities are non-increasing in rank
      val pr = rows.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(pr.zip(pr.tail).forall { case (a, b) => a >= b },
        s"$src: priorities not sorted")
    }
    // A-ES selects proportionally to weight: the sampled docs' mean
    // weight must exceed the corpus mean (deterministic on the fixture)
    val sampledMeanW = r.map(_.getLong(3)).sum.toDouble / r.length
    val corpusMeanW = Tables.documents(spark, sf0001)
      .select(avg(when(col("n_chars") >= 400, 4L)
        .when(col("n_chars") >= 250, 2L).otherwise(1L)))
      .collect()(0).getDouble(0)
    assert(sampledMeanW > corpusMeanW,
      s"weighting did not bias the sample: $sampledMeanW <= $corpusMeanW")
  }

  test("q191 entity resolution: every corrupted probe resolves at distance 1") {
    val r = CurationAudits.queries("q191_entity_resolution")(spark, sf0001)
      .collect()
    val nProbes = Tables.customer(spark, sf0001)
      .filter(col("c_custkey") % 7 === 0).count()
    assert(r.length == nProbes,
      s"every probe must resolve: ${r.length} of $nProbes")
    r.foreach { row =>
      val (probe, matched, dist) =
        (row.getLong(0), row.getLong(1), row.getLong(2))
      val source = probe - 10000000L
      assert(dist == 1L, s"probe $probe resolved at distance $dist")
      // the true source is always a candidate, so the (dist, custkey)
      // argmin can only return the source or a smaller-keyed ambiguity
      assert(matched <= source, s"probe $probe matched $matched > source")
      if (row.getLong(3) == 1L)
        assert(matched == source,
          s"unambiguous probe $probe must resolve to its source, got $matched")
    }
    // ambiguity exists in the fixture (digit-run deletions) — the
    // n_candidates column does real work
    assert(r.exists(_.getLong(3) > 1L), "expected some ambiguous probes")
  }

  test("q199 streaming heavy hitters: MG compaction, bounds, exactly-once") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("q199spec").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    val (storeDir, cp) = (s"$root/store", s"$root/cp")
    def addFile(name: String, texts: String*): Unit = {
      val staged = s"$root/stage_$name"
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, s"$name.parquet").toPath)
      ()
    }
    Seq.empty[(String, Long, Long)].toDF("tok", "cnt", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").parquet(storeDir)
    def runOnce(): Unit = {
      val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
      val q = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          CurationAudits.heavyHittersBatch(spark, batch, id, storeDir,
            cap = 64)
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def state(): (Map[String, Long], Long, Long) = {
      val all = spark.read.parquet(storeDir)
        .select(col("tok"), col("cnt"), col("batch_id").cast("long"))
        .collect()
      val latest = all.map(_.getLong(2)).max
      val fin = all.filter(_.getLong(2) == latest)
      (fin.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1))
        .toMap,
        fin.filter(_.isNullAt(0)).map(_.getLong(1)).max, latest)
    }
    // batch 0: 'hot' ×5 plus 70 letter-pair singletons → 71 counters,
    // δ = the 65th largest = 1 → every singleton compacts away, hot → 4
    val singles = (0 until 70).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}").toSeq
    addFile("a", ("hot " * 5) + singles.mkString(" "))
    runOnce()
    val (s0, d0, _) = state()
    assert(s0 == Map("hot" -> 4L), s"post-compaction store wrong: $s0")
    assert(d0 == 1L, s"delta budget wrong: $d0")
    // every true count obeys lb ≤ true ≤ lb + Σδ (absent: true ≤ Σδ)
    assert(5L >= s0("hot") && 5L <= s0("hot") + d0)
    singles.foreach(t => assert(1L <= d0, s"absent $t exceeds budget"))
    // batch 1: small vocabulary — merge without compaction, budget keeps
    addFile("b", "hot hot warm warm cold")
    runOnce()
    val (s1, d1, v1) = state()
    assert(s1 == Map("hot" -> 6L, "warm" -> 2L, "cold" -> 1L), s"$s1")
    assert(d1 == 1L)
    assert(7L >= s1("hot") && 7L <= s1("hot") + d1, "hot bound")
    // restart with no new input: the store version does not advance
    runOnce()
    val (s2, d2, v2) = state()
    assert(s2 == s1 && d2 == d1 && v2 == v1, "restart mutated the store")
  }

  test("q190 streaming novelty: sequential batches, exactly-once under restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    // 6-token letter-only texts -> 4 distinct trigrams each; overlap is
    // controlled per-file so expected new/seen counts are hand-checkable
    def doc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))
    val a = Seq("alpha", "bravo", "china", "delta", "echoo", "foxtr")
    val b = Seq("golfy", "hotel", "india", "julie", "kiloo", "limaa")
    val root = java.nio.file.Files.createTempDirectory("q190spec").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    val (storeDir, sinkDir, cp) = (s"$root/store", s"$root/sink", s"$root/cp")
    import spark.implicits._
    def addFile(name: String, rows: (Long, String)*): Unit = {
      val staged = s"$root/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, s"$name.parquet").toPath)
      ()
    }
    // empty seed tables, then the q190 body over a checkpointed stream
    val schema = Seq(doc(0L, a)).toDF("doc_id", "text").schema
    Seq.empty[(String, Long)].toDF("gh", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").parquet(storeDir)
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("n_docs", "grams_seen", "new_grams", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").parquet(sinkDir)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$in/*.parquet")
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          CurationAudits.noveltyBatch(spark, batch, id, storeDir, sinkDir)
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(): Map[Long, (Long, Long, Long)] =
      spark.read.parquet(sinkDir)
        .select(col("batch_id").cast("long"), col("n_docs"),
          col("grams_seen"), col("new_grams")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    // batch 0: two docs — doc 1 all-new (4 grams), doc 2 duplicates it
    addFile("a", doc(1L, a), doc(2L, a))
    runOnce()
    assert(sink() == Map(0L -> ((2L, 4L, 4L))), s"batch 0 wrong: ${sink()}")
    // batch 1: doc 3 repeats corpus a (0 new), doc 4 is disjoint b
    addFile("b", doc(3L, a), doc(4L, b))
    runOnce()
    assert(sink() == Map(0L -> ((2L, 4L, 4L)), 1L -> ((2L, 8L, 4L))),
      s"batch 1 wrong: ${sink()}")
    // restart with no new input: nothing recounted, nothing duplicated
    runOnce()
    assert(sink() == Map(0L -> ((2L, 4L, 4L)), 1L -> ((2L, 8L, 4L))))
    // the store holds each gram exactly once, in its first-seen batch
    val store = spark.read.parquet(storeDir)
      .select(col("gh"), col("batch_id").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(store.length == 8, s"store must hold 8 distinct grams: ${store.length}")
    assert(store.map(_._1).distinct.length == 8, "duplicate gram keys in the store")
    assert(store.count(_._2 == 0L) == 4 && store.count(_._2 == 1L) == 4)
  }

  test("q189 vocab coverage: monotone to full coverage, exact bucket arithmetic") {
    val rows = graft.functions.TextQueries.queries("q189_vocab_coverage")(
      spark, sf0001).collect().sortBy(_.getLong(0))
    val vocab = rows.map(_.getLong(2)).sum
    var cumV = 0L; var prevCov = 0.0
    rows.foreach { row =>
      cumV += row.getLong(2)
      assert(row.getLong(3) == cumV, s"cum_vocab drifted at rb ${row.getLong(0)}")
      val cov = row.getDouble(5)
      assert(cov >= prevCov, "coverage must be monotone nondecreasing")
      prevCov = cov
      // cutoff = min(2^(rb+1)-1, vocab)
      val rb = row.getLong(0)
      assert(row.getLong(1) == math.min((1L << (rb + 1)) - 1, vocab))
      assert(math.abs(row.getDouble(5) + row.getDouble(6) - 1.0) < 1e-9,
        "coverage + oov_rate must sum to 1")
    }
    assert(rows.last.getDouble(5) == 1.0 && rows.last.getDouble(6) == 0.0,
      "the last bucket must reach full coverage")
    assert(rows.last.getLong(3) == vocab)
    // bucket rb holds ranks [2^rb, 2^(rb+1)-1]: bucket populations are
    // exactly min(vocab, 2^(rb+1)-1) - 2^rb + 1 for a gap-free rank
    rows.foreach { row =>
      val rb = row.getLong(0)
      val expect = math.min(vocab, (1L << (rb + 1)) - 1) - (1L << rb) + 1
      assert(row.getLong(2) == expect,
        s"bucket $rb population ${row.getLong(2)} != $expect — the distributed rank has gaps")
    }
  }

  test("q219 stream quality admit: stats recount the batch gates, sink is exactly-once, rerun idempotent") {
    import graft.operators.{CorpusCleaning, CurationAudits}
    def run() = CurationAudits.queries("q219_stream_quality_admit")(
      spark, sf0001).collect().head
    val r = run()
    // exactly-once: the re-read sink count IS the admitted count
    assert(r.getAs[Long]("n_sink_docs") == r.getAs[Long]("n_admitted"), s"$r")
    // batch-side recount of both gates over the same src0 slice
    val src0 = Tables.documents(spark, sf0001)
      .filter(col("source") === "src0")
    val q = CorpusCleaning.qualityLogitOf(src0).collect()
      .map(x => x.getAs[Long]("doc_id") -> (x.getAs[Double]("score") >= 0))
      .toMap
    val rep = CorpusCleaning.repetitionStatsOf(src0).collect()
      .map(x => x.getAs[Long]("doc_id") -> (x.getAs[Int]("keep") == 1))
      .toMap
    val ids = src0.select(col("doc_id")).collect().map(_.getLong(0))
    assert(r.getAs[Long]("n_seen") == ids.length, s"$r")
    val admitted = ids.count(id => q(id) && rep.getOrElse(id, true))
    assert(r.getAs[Long]("n_admitted") == admitted, s"$r admitted")
    assert(r.getAs[Long]("n_quality_rejects") == ids.count(!q(_)), s"$r")
    assert(r.getAs[Long]("n_repetition_rejects") ==
      ids.count(id => !rep.getOrElse(id, true)), s"$r")
    // both verdict classes exist on the fixture (the gate discriminates)
    assert(admitted > 0 && admitted < ids.length, s"degenerate: $r")
    // a rerun resets its sinks and reproduces the identical row
    assert(run() == r, "rerun is not idempotent")
  }

  test("q243 DSIR: on-domain candidates dominate the selection, off-domain fills the tail, deterministic") {
    import spark.implicits._
    // target (src0) and srcA docs draw bigrams from ONE vocabulary
    // cycle, srcB from a disjoint one: under the two hashed-bigram
    // multinomials every srcA doc's importance weight sits ~0 (its
    // buckets have the SAME relative frequency in target and raw)
    // while every srcB doc's is deeply negative (its buckets are
    // unseen in the target, Laplace floor only) — a gap orders above
    // the Gumbel noise, so the top |srcA| ranks must be exactly srcA.
    val aVocab = Vector("kernel", "tensor", "gradient", "matrix",
      "vector", "scalar", "epoch", "layer")
    val bVocab = Vector("recipe", "butter", "flour", "sugar",
      "oven", "dough", "yeast", "spice")
    def textOf(v: Vector[String], seed: Int): String =
      (0 until 40).map(i => v((i * 7 + seed) % v.length)).mkString(" ")
    val docs = ((0 until 10).map(i =>
        (1000L + i, "src0", "en", textOf(aVocab, i))) ++
      (0 until 40).map(i =>
        (2000L + i, "srcA", "en", textOf(aVocab, i + 3))) ++
      (0 until 40).map(i =>
        (3000L + i, "srcB", "en", textOf(bVocab, i))))
      .toDF("doc_id", "source", "lang", "text")

    val r = CurationAudits.dsirSelect(spark, docs).collect()
    assert(r.length == CurationAudits.DsirK)
    // the target slice is never a candidate
    assert(r.forall(_.getString(2) != "src0"))
    val (a, b) = r.partition(_.getString(2) == "srcA")
    assert(a.length == 40 && b.length == CurationAudits.DsirK - 40,
      r.map(_.getString(2)).mkString(","))
    // every srcA rank precedes every srcB rank
    assert(a.map(_.getLong(0)).max < b.map(_.getLong(0)).min)
    // and the weight gap itself is the domain signal, not noise
    assert(a.map(_.getLong(5)).min > b.map(_.getLong(5)).max)
    // deterministic end to end: a second run is row-identical
    val r2 = CurationAudits.dsirSelect(spark, docs).collect()
    assert(r.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }
}
