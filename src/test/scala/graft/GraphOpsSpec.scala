package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Pins for the iterative integer-PageRank dataflow (q152): the algebra
  * the scaled-integer design guarantees (exact mass accounting — FP
  * PageRank can only assert approximate conservation) and the structural
  * ordering PageRank exists to compute. */
class GraphOpsSpec extends TestSpark {

  test("q152 conserves the integer mass budget and covers every trading party") {
    val rows = GraphOps.queries("q152_pagerank")(spark, sf0001).collect()
    val mass = rows.map(_.getAs[Long]("pr")).sum
    // each truncating division loses < 1 unit; with n base terms and one
    // term per directed edge per iteration the loss is far below 0.01%
    assert(mass <= GraphOps.Mass, s"mass $mass exceeds the budget")
    assert(mass > GraphOps.Mass / 10000L * 9999L, s"mass $mass leaked > 0.01%")
    assert(rows.forall(_.getAs[Long]("pr") > 0), "every node keeps rank > 0")
    val parties = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001)
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .agg(countDistinct(col("o_custkey")) + countDistinct(col("l_suppkey")))
      .collect()(0).getLong(0)
    assert(rows.length == parties, s"${rows.length} nodes vs $parties parties")
  }

  test("pagerank orders a star's hub above its leaves and ties a symmetric cycle") {
    import spark.implicits._
    def sym(es: Seq[(Long, Long)]) =
      (es ++ es.map(e => (e._2, e._1))).toDF("src", "dst")
    // star: hub 0 — leaves 1..4; the hub absorbs every leaf's full rank
    val star = GraphOps.pagerank(spark, sym((1L to 4L).map(i => (0L, i))))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert((1L to 4L).forall(l => star(0L) > star(l)), s"hub must lead: $star")
    assert(star(1L) == star(2L) && star(2L) == star(3L) && star(3L) == star(4L),
      "symmetric leaves must tie exactly (integer determinism)")
    // 3-cycle: perfect symmetry → bit-identical thirds
    val cyc = GraphOps.pagerank(spark, sym(Seq((0L, 1L), (1L, 2L), (2L, 0L))))
      .collect().map(_.getAs[Long]("pr"))
    assert(cyc.distinct.length == 1, s"cycle ranks must tie: ${cyc.toSeq}")
  }
}
