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
}
