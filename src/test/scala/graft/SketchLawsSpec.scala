package graft

import graft.functions.CustomAgg.{KmvB, KmvDistinct, QsB, QuantileSketch}
import graft.functions.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side algebraic laws for the round's pure helpers — the
  * properties Spark's execution model silently RELIES on but never
  * checks: a mergeable Aggregator must be commutative/associative and
  * partition-split-invariant (partial aggregation + streaming state
  * reorder merges arbitrarily), and the CDC chunker must reconstruct
  * its input exactly (chunk hashes stand in for content). Seeded
  * random inputs keep every trial reproducible. No SparkSession —
  * these are the pure kernels.
  */
class SketchLawsSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def randHashes(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(md5hex("tok" + rnd.nextInt(n)))
  }

  private def reduceAll(hs: Seq[String]): KmvB =
    hs.foldLeft(KmvDistinct.zero)(KmvDistinct.reduce)

  test("KMV merge is commutative and associative (the shuffle-order contract)") {
    for (seed <- 1L to 5L) {
      val hs = randHashes(seed, 300)
      val (x, y, z) = (reduceAll(hs.take(100)), reduceAll(hs.slice(100, 200)),
        reduceAll(hs.drop(200)))
      assert(KmvDistinct.merge(x, y).mins.toSeq
        == KmvDistinct.merge(y, x).mins.toSeq, s"seed=$seed not commutative")
      assert(KmvDistinct.merge(KmvDistinct.merge(x, y), z).mins.toSeq
        == KmvDistinct.merge(x, KmvDistinct.merge(y, z)).mins.toSeq,
        s"seed=$seed not associative")
    }
  }

  test("KMV is partition-split invariant (the partial-aggregation contract)") {
    for (seed <- 6L to 10L) {
      val rnd = new scala.util.Random(seed)
      val hs = randHashes(seed, 400)
      val whole = reduceAll(hs)
      // random split into 1..8 partitions, merged in random order —
      // exactly what partial agg + streaming micro-batches do
      val parts = hs.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(8))).values.toSeq
      val merged = rnd.shuffle(parts.map(reduceAll))
        .foldLeft(KmvDistinct.zero)(KmvDistinct.merge)
      assert(merged.mins.toSeq == whole.mins.toSeq, s"seed=$seed split-variant")
      assert(KmvDistinct.finish(merged) == KmvDistinct.finish(whole))
    }
  }

  test("KMV finish is exact under k and a sane estimate over k") {
    val small = reduceAll(randHashes(11L, 500).distinct.take(40))
    assert(KmvDistinct.finish(small) == small.mins.length.toDouble,
      "under k the sketch must report the exact distinct count")
    for (seed <- 12L to 14L) {
      val hs = (0 until 2000).map(i => md5hex(s"u$seed-$i"))
      val est = KmvDistinct.finish(reduceAll(hs))
      assert(math.abs(est - 2000) / 2000.0 < 0.5,
        s"seed=$seed estimate $est vs 2000 outside the k=64 band")
    }
  }

  private def qsReduceAll(xs: Seq[(String, Double)]): QsB =
    xs.foldLeft(QuantileSketch.zero)(QuantileSketch.reduce)

  private def randPairs(seed: Long, n: Int): Seq[(String, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (md5hex(s"row$seed-$i"), rnd.nextDouble() * 1000))
  }

  test("QuantileSketch merge laws and partition-split invariance") {
    for (seed <- 21L to 25L) {
      val xs = randPairs(seed, 700)
      val (x, y, z) = (qsReduceAll(xs.take(250)),
        qsReduceAll(xs.slice(250, 500)), qsReduceAll(xs.drop(500)))
      assert(QuantileSketch.merge(x, y).keys.toSeq
        == QuantileSketch.merge(y, x).keys.toSeq, s"seed=$seed not commutative")
      assert(QuantileSketch.merge(QuantileSketch.merge(x, y), z).keys.toSeq
        == QuantileSketch.merge(x, QuantileSketch.merge(y, z)).keys.toSeq,
        s"seed=$seed not associative")
      val rnd = new scala.util.Random(seed)
      val parts = xs.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(8))).values.toSeq
      val merged = rnd.shuffle(parts.map(qsReduceAll))
        .foldLeft(QuantileSketch.zero)(QuantileSketch.merge)
      val whole = qsReduceAll(xs)
      assert(merged.keys.toSeq == whole.keys.toSeq
        && merged.vals.toSeq == whole.vals.toSeq, s"seed=$seed split-variant")
      assert(QuantileSketch.finish(merged) == QuantileSketch.finish(whole))
    }
  }

  test("QuantileSketch keeps exactly the bottom-K keys, exact under K, near-exact over K") {
    val xs = randPairs(31L, 3000)
    val b = qsReduceAll(xs)
    assert(b.keys.toSeq == xs.map(_._1).sorted.take(QuantileSketch.K),
      "sample must be the K smallest distinct hash keys")
    // under K the sketch IS the group: its p50 equals the true median pick
    val small = xs.take(41)
    val fb = QuantileSketch.finish(qsReduceAll(small))
    val ordered = small.sortBy(t => (t._2, t._1)).map(_._2)
    assert(fb.sample_n == 41 && fb.p50 == ordered((40 * 50) / 100),
      "under K the positional pick must be exact")
    // over K the estimate tracks the truth (uniform values: p90 ≈ 900)
    val fB = QuantileSketch.finish(b)
    assert(math.abs(fB.p90 - 900.0) < 100.0,
      s"p90 estimate ${fB.p90} implausible for uniform [0,1000)")
    // duplicate row keys collapse (set semantics — task-retry idempotence)
    val dup = qsReduceAll(xs ++ xs.take(100))
    assert(dup.keys.toSeq == b.keys.toSeq, "duplicate keys must not displace")
  }

  test("CDC chunks reconstruct the text and agree with the boundary rule") {
    val rnd = new scala.util.Random(99L)
    val alphabets = Seq("abcdefgh ", "xy z\t\nqrstuv", "αβγδε ζη", "a")
    val texts = Seq("", "short", " \n\t", "x" * 7, "y" * 8) ++
      (0 until 30).map { i =>
        val a = alphabets(i % alphabets.length)
        (0 until rnd.nextInt(400)).map(_ => a(rnd.nextInt(a.length))).mkString
      }
    texts.foreach { t =>
      val chunks = TextQueries.cdcChunks(t)
      assert(chunks.mkString == t, s"chunks must concatenate back (len=${t.length})")
      assert(chunks.nonEmpty, "always at least one chunk")
      val cuts = TextQueries.cdcBoundaryPositions(t.codePoints.toArray)
        .count(_ > 1)
      assert(chunks.length == cuts + 1,
        s"cut rule drifted: ${chunks.length} chunks vs $cuts p>1 boundaries")
    }
  }
}
