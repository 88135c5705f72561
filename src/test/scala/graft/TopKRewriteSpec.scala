package graft

import graft.plans.TopKRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule must (a) fire on the window-top-k idiom — any key
  * count, any direction / null-ordering combination, (b) not fire when
  * its preconditions fail, and (c) preserve results — including null,
  * NaN, and binary-key grouping — exactly.
  *
  * All rewrite-enabled plans run on a CHILD session (`newSession`) so the
  * suite's shared session keeps pristine experimental hooks — other
  * suites assert un-rewritten window plan shapes.
  */
class TopKRewriteSpec extends TestSpark {

  private lazy val rw: SparkSession = {
    val s2 = spark.newSession()
    TopKRewrite.enable(s2)
    s2
  }

  // plan-string check sees through AdaptiveSparkPlanExec's wrapper
  // (SparkPlan.nodeName strips the Exec suffix: "TopKPerGroup ")
  private def hasHeapExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("TopKPerGroup ")

  private def windowTopK(k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(rw, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  test("rewrite fires: window plan becomes TopKPerGroupExec, no WindowExec") {
    val df = windowTopK(3)
    assert(hasHeapExec(df), "rule did not fire on the canonical idiom")
    // neither WindowExec nor the WindowGroupLimit pre-limit survive
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "a Window node survived the rewrite")
  }

  test("enabling the rewrite in a child session leaves the parent session alone") {
    rw // force the child session + enable
    assert(!spark.experimental.extraOptimizations
      .contains(graft.plans.TopKWindowRewrite),
      "suite session's experimental hooks were polluted")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!hasHeapExec(df), "parent session rewrote without enable()")
  }

  test("rewritten result is identical to the window formulation") {
    val rewritten = windowTopK(3)
    assert(hasHeapExec(rewritten))
    // un-rewritten twin: keep the rank column in the output (precondition
    // fails, window plan stays), then drop it after collection
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(rw, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    assert(!hasHeapExec(viaWindow), "rank-returning query must keep the window")
    val a = rewritten.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity)
    val b = viaWindow.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity)
    assert(a.sameElements(b))
  }

  test("rewrite preserves default null ordering (DESC NULLS LAST / ASC NULLS FIRST)") {
    import rw.implicits._
    val data = Seq[(Long, java.lang.Double, Long)](
      (1L, 5.0, 10L), (1L, null, 11L), (1L, 7.0, 12L), (1L, 6.0, 13L),
      (2L, null, 20L), (2L, null, 21L), (2L, 1.0, 22L))
      .toDF("g", "s", "t")
    def topk(df: DataFrame) = {
      val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("t"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    }
    val rewritten = topk(data).select(col("g"), col("s"), col("t"))
    assert(hasHeapExec(rewritten), "rule did not fire on the null fixture")
    val viaWindow = topk(data).select(col("g"), col("s"), col("t"), col("rk"))
      .drop("rk")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), Option(r.get(1)).map(_.toString).getOrElse("null"), r.getLong(2))
    assert(rewritten.collect().map(key).sorted.sameElements(
      viaWindow.collect().map(key).sorted))
    // group 2 has one non-null: null-score row fills the remaining slot
    val g2 = rewritten.filter(col("g") === 2).collect()
    assert(g2.length == 2 && g2.exists(_.isNullAt(1)))
  }

  test("rewrite preserves Spark's NaN ordering (NaN sorts largest)") {
    import rw.implicits._
    val data = Seq[(Long, Double, Long)](
      (1L, 5.0, 10L), (1L, Double.NaN, 11L), (1L, 7.0, 12L),
      (2L, Double.NaN, 20L), (2L, Double.NaN, 21L), (2L, 1.0, 22L))
      .toDF("g", "s", "t")
    def topk(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("t"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    }
    val rewritten = topk(data).select(col("g"), col("t"))
    assert(hasHeapExec(rewritten), "rule did not fire on the NaN fixture")
    val viaWindow = topk(data).select(col("g"), col("t"), col("rk")).drop("rk")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(rewritten.collect().map(key).sorted
      .sameElements(viaWindow.collect().map(key).sorted))
    // NaN ranks ABOVE 7.0: group 1 keeps the NaN row and 7.0
    val g1 = rewritten.filter(col("g") === 1).collect().map(key).toSet
    assert(g1 == Set((1L, 11L), (1L, 12L)), s"group 1 kept $g1")
  }

  /** Window twin vs rewritten twin over `orders` with an arbitrary window
    * spec; asserts the rewrite fired and the kept row sets are identical. */
  private def checkParity(w: org.apache.spark.sql.expressions.WindowSpec,
      outCols: Seq[String], k: Int = 3): Unit = {
    def topk(keepRank: Boolean): DataFrame = {
      val base = Tables.orders(rw, sf0001)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      val cols = outCols.map(col) ++ (if (keepRank) Seq(col("rk")) else Nil)
      base.select(cols: _*)
    }
    val rewritten = topk(keepRank = false)
    assert(hasHeapExec(rewritten), "rule did not fire")
    // the twin RETURNS the rank (precondition fails → window stays);
    // drop it after collection, not in the plan
    val viaWindow = topk(keepRank = true)
    assert(!hasHeapExec(viaWindow))
    def key(cols: Int)(r: org.apache.spark.sql.Row): String =
      r.toSeq.take(cols).map(String.valueOf).mkString("|")
    assert(rewritten.collect().map(key(outCols.length)).sorted.sameElements(
      viaWindow.collect().map(key(outCols.length)).sorted))
  }

  test("1-key ORDER BY (no tiebreak) fires — the most common user shape") {
    // o_totalprice is ~unique in the fixture so the kept set is stable
    checkParity(
      Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc),
      Seq("o_custkey", "o_orderkey", "o_totalprice"))
  }

  test("3-key ORDER BY and multi-key PARTITION BY fire") {
    checkParity(
      Window.partitionBy(col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderdate").desc, col("o_totalprice"), col("o_orderkey")),
      Seq("o_custkey", "o_orderstatus", "o_orderkey"))
  }

  test("ascending score and non-default null ordering fire (RowOrdering is general)") {
    checkParity(
      Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey")),
      Seq("o_custkey", "o_orderkey"))
    checkParity(
      Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_first, col("o_orderkey")),
      Seq("o_custkey", "o_orderkey"))
  }

  test("binary partition key groups by VALUE, not JVM identity") {
    // round-5 advisor finding: an eval()-keyed map would give Array[Byte]
    // identity equality — every row its own group, rank filter a no-op.
    // UnsafeProjection keys must reproduce the window's grouping exactly.
    import rw.implicits._
    val data = Seq(
      ("aa", 1.0, 1L), ("aa", 2.0, 2L), ("aa", 3.0, 3L),
      ("bb", 4.0, 4L), ("bb", 5.0, 5L))
      .toDF("gs", "s", "t")
      .select(encode(col("gs"), "UTF-8").as("g"), col("s"), col("t"))
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("t"))
    val rewritten = data.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).select(col("g"), col("t"))
    assert(hasHeapExec(rewritten), "rule did not fire on a binary group key")
    val got = rewritten.collect()
      .map(r => (new String(r.getAs[Array[Byte]](0), "UTF-8"), r.getLong(1)))
      .sorted
    assert(got.toSeq == Seq(("aa", 2L), ("aa", 3L), ("bb", 4L), ("bb", 5L)),
      s"binary-key grouping broke: ${got.mkString(",")}")
  }

  test("rewrite declines: rank returned, double partition key") {
    // (map partition keys never reach the rule: the analyzer rejects
    // non-orderable window partition specs outright)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ranked = Tables.orders(rw, sf0001)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"))
    assert(!hasHeapExec(ranked), "rank-returning query must keep the window")
    // double keys: NormalizeFloatingNumbers hasn't necessarily run — decline
    val wd = Window.partitionBy(col("o_totalprice"))
      .orderBy(col("o_orderkey").desc)
    val viaDouble = Tables.orders(rw, sf0001)
      .withColumn("rk", row_number().over(wd)).filter(col("rk") <= 1)
      .select(col("o_orderkey"))
    assert(!hasHeapExec(viaDouble), "must not fire for a double partition key")
    // huge k: the heap has no spill path — keep the window's sort
    val big = Tables.orders(rw, sf0001)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 50000)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!hasHeapExec(big), "must not fire for k beyond the heap-memory cap")
  }

  test("randomized parity: heap equals window for random data, orderings, and k") {
    // Seeded trials (PropertyParitySpec's idiom): random groups, scores
    // with nulls/NaN/heavy ties, unique tiebreaks, random k, and all four
    // direction × null-placement combos — the rewritten plan must keep
    // exactly the window's row set every time.
    import rw.implicits._
    (1L to 8L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(200)
      val rows: Seq[(Long, java.lang.Double, Long)] = Seq.fill(n)((
        rnd.nextInt(8).toLong,
        rnd.nextInt(6) match {
          case 0 => null: java.lang.Double
          case 1 => java.lang.Double.valueOf(Double.NaN)
          case _ => java.lang.Double.valueOf(rnd.nextInt(10).toDouble) // ties
        },
        rnd.nextLong()))
      val df = rows.toDF("g", "s", "t")
      val k = 1 + rnd.nextInt(5)
      val sCol = (rnd.nextBoolean(), rnd.nextBoolean()) match {
        case (true, true) => col("s").asc_nulls_last
        case (true, false) => col("s").asc
        case (false, true) => col("s").desc_nulls_first
        case (false, false) => col("s").desc
      }
      val w = Window.partitionBy(col("g")).orderBy(sCol, col("t"))
      val base = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      val rewritten = base.select(col("g"), col("s"), col("t"))
      assert(hasHeapExec(rewritten), s"seed=$seed: rule did not fire")
      val viaWindow = base.select(col("g"), col("s"), col("t"), col("rk"))
      assert(!hasHeapExec(viaWindow))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), String.valueOf(r.get(1)), r.getLong(2))
      val a = rewritten.collect().map(key).sorted
      val b = viaWindow.collect().map(key).sorted
      assert(a.sameElements(b), s"seed=$seed k=$k order=$sCol")
    }
  }

  test("GraftExtensions wires the rule at session construction") {
    // getOrCreate would hand back the suite's session and silently skip
    // withExtensions — clear the default/active slots so the builder
    // constructs a genuinely NEW session (same SparkContext) with the
    // extensions injected, then restore the suite session.
    val suiteSession = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(s2 ne suiteSession, "builder returned the suite session")
      // the fresh session's experimental hooks are empty — the rewrite
      // can only fire through the injected extensions
      assert(!s2.experimental.extraOptimizations
        .contains(graft.plans.TopKWindowRewrite))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables.orders(s2, sf0001)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"))
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup "),
        "extensions-built session did not rewrite")
    } finally {
      SparkSession.setDefaultSession(suiteSession)
      SparkSession.setActiveSession(suiteSession)
    }
  }
}
