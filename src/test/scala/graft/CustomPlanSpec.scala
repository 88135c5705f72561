package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

/** The custom TopKPerGroup operator must (a) produce exactly the window
  * formulation's rows, (b) appear in the physical plan as its own exec
  * node behind one hash exchange on the group key.
  */
class CustomPlanSpec extends TestSpark {

  test("custom top-k operator matches the window formulation") {
    val custom = TopKPerGroup(Tables.orders(spark, sf0001),
      "o_custkey", "o_totalprice", "o_orderkey", 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom == windowed)
    assert(custom.nonEmpty)
  }

  test("plans as TopKPerGroupExec behind a single hash exchange") {
    val df = TopKPerGroup(Tables.orders(spark, sf0001),
      "o_custkey", "o_totalprice", "o_orderkey", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("TopKPerGroup "), plan.take(2000))
    assert(plan.contains("hashpartitioning(o_custkey"), plan.take(2000))
    // no sort: that's the point of the operator
    assert(!plan.contains("Sort ["), plan.take(2000))
  }

  test("partial pre-cut runs below the exchange (map-side combine for top-k)") {
    // top-k is algebraic: the planner stacks a partial TopKPerGroupExec
    // under the exchange so the shuffle carries ≤ k rows per (group ×
    // input partition) — assert partial → Exchange → final layering.
    val df = TopKPerGroup(Tables.orders(spark, sf0001),
      "o_custkey", "o_totalprice", "o_orderkey", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "TopKPerGroup ".r.findAllIn(plan).length
    assert(n == 2, s"expected partial + final TopKPerGroup nodes, got $n:\n${plan.take(2000)}")
    val iFinal = plan.indexOf("TopKPerGroup ")
    val iExch = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("TopKPerGroup ", iFinal + 1)
    assert(iFinal < iExch && iExch < iPartial,
      s"pre-cut not below the exchange (final@$iFinal exch@$iExch partial@$iPartial):\n${plan.take(2000)}")
  }

  test("works for k larger than every group (returns all rows)") {
    // 10000 is the cap of the heap's no-spill contract — still far above
    // any per-customer order count at this SF, so every row survives
    val all = TopKPerGroup(Tables.orders(spark, sf0001),
      "o_custkey", "o_totalprice", "o_orderkey", 10000)
    assert(all.count() == Tables.orders(spark, sf0001).count())
  }

  test("topK rejects group keys whose UnsafeRow bytes don't define value equality") {
    // double keys: -0.0 vs 0.0 and NaN bit patterns would silently split
    // one logical group — the explicit API must fail fast with the same
    // groupable() contract the rewrite rule checks (round-6 advisor)
    val withDouble = Tables.orders(spark, sf0001)
      .withColumn("dkey", col("o_totalprice").cast("double"))
    val ex = intercept[IllegalArgumentException] {
      graft.plans.TopKPerGroup.topK(withDouble, Seq("dkey"),
        Seq("o_orderkey" -> true), 3)
    }
    assert(ex.getMessage.contains("UnsafeRow bytes"), ex.getMessage)
    // and k outside the no-spill contract is declined, not attempted
    val exK = intercept[IllegalArgumentException] {
      graft.plans.TopKPerGroup.topK(Tables.orders(spark, sf0001),
        Seq("o_custkey"), Seq("o_orderkey" -> true), 10001)
    }
    assert(exK.getMessage.contains("no-spill"), exK.getMessage)
  }

  test("string group keys are copied safely out of reused row buffers") {
    val top = TopKPerGroup(Tables.orders(spark, sf0001),
      "o_orderstatus", "o_totalprice", "o_orderkey", 2)
      .select(col("o_orderstatus"), col("o_orderkey")).collect()
    val statuses = top.map(_.getString(0)).toSet
    assert(statuses == Set("F", "O", "P") && top.length == 6)
  }
}
