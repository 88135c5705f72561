package graft

import graft.plans.TopKRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule must (a) fire on the canonical window-top-k idiom,
  * (b) not fire when its preconditions fail, and (c) preserve results —
  * including null ordering — exactly.
  */
class TopKRewriteSpec extends TestSpark {

  // plan-string check sees through AdaptiveSparkPlanExec's wrapper
  // (SparkPlan.nodeName strips the Exec suffix: "TopKPerGroup ")
  private def hasHeapExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("TopKPerGroup ")

  private def windowTopK(k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  test("rewrite fires: window plan becomes TopKPerGroupExec, no WindowExec") {
    TopKRewrite.enable(spark)
    val df = windowTopK(3)
    assert(hasHeapExec(df), "rule did not fire on the canonical idiom")
    // neither WindowExec nor the WindowGroupLimit pre-limit survive
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "a Window node survived the rewrite")
  }

  test("rewritten result is identical to the window formulation") {
    TopKRewrite.enable(spark)
    val rewritten = windowTopK(3)
    assert(hasHeapExec(rewritten))
    // un-rewritten twin: keep the rank column in the output (precondition
    // fails, window plan stays), then drop it after collection
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    assert(!hasHeapExec(viaWindow), "rank-returning query must keep the window")
    val a = rewritten.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity)
    val b = viaWindow.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity)
    assert(a.sameElements(b))
  }

  test("rewrite preserves default null ordering (DESC NULLS LAST / ASC NULLS FIRST)") {
    TopKRewrite.enable(spark)
    import spark.implicits._
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
    TopKRewrite.enable(spark)
    import spark.implicits._
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

  test("rewrite declines: ascending score, non-default nulls, rank returned") {
    TopKRewrite.enable(spark)
    val w1 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey"))
    val asc = Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w1)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!hasHeapExec(asc), "must not fire for ascending score")
    val w2 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc_nulls_first, col("o_orderkey"))
    val nf = Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!hasHeapExec(nf), "must not fire for non-default null ordering")
  }

  test("GraftExtensions wires the rule at session construction") {
    import org.apache.spark.sql.SparkSession
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
