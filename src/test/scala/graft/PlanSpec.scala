package graft

import graft.operators.RelationalQueries

/** Plan-shape assertions — the scale story is part of correctness here:
  * filters must reach the parquet scan, dimension joins must broadcast,
  * top-k must not globally sort.
  */
class PlanSpec extends TestSpark {

  private def planOf(name: String): String =
    RelationalQueries.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q02 pushes filters into the parquet scan") {
    val plan = planOf("q02_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_discount") && plan.contains("l_quantity"))
    // column pruning: the scan must not read unused columns like l_comment
    // equivalents; ReadSchema should list only the 4 needed columns.
    val read = plan.split("ReadSchema:")(1).takeWhile(_ != '\n')
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"scan reads more columns than needed: $read")
  }

  test("q04 star join broadcasts all dimensions") {
    val plan = planOf("q04_join_star")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the only shuffle join allowed is lineitem⋈orders (fact-fact);
    // customer/nation/region must never shuffle-join.
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size
    assert(shuffleJoins <= 1, s"expected <=1 shuffle join, plan:\n${plan.take(3000)}")
  }

  test("q12 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q12_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q01 aggregates partially before the shuffle") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final HashAggregate")
  }

  test("whole-stage codegen covers the hot paths") {
    // AQE shows isFinalPlan=false pre-execution with no codegen spans —
    // execute first, then inspect the final plan.
    val df = RelationalQueries.queries("q01_pricing_summary")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators print with a `*(codegenStageId)` prefix
    assert(plan.contains("*(1)"), plan.take(3000))
    // and the whole scan→filter→partial-agg pipeline is one codegen stage
    assert(plan.contains("*(1) HashAggregate"), plan.take(3000))
  }
}
