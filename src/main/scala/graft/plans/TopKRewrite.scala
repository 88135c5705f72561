package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer-rule extension tier: auto-rewrite of the window-rank top-k
  * idiom into the heap-based [[TopKPerGroupExec]].
  *
  * The pattern `row_number() OVER (PARTITION BY g... ORDER BY s...) <= k`
  * (with the rank column then dropped) is the single most common top-k
  * formulation users write — and it full-sorts every group. Spark's own
  * InferWindowGroupLimit bounds each group to k rows pre-sort but still
  * sorts; the heap operator replaces sort + rank + filter with one
  * O(n log k) pass and no sort buffer. This rule makes the better plan
  * automatic instead of an opt-in API ([[TopKPerGroup.topK]]), completing
  * the engine's Catalyst extension story: codegen'd `Expression`s (VecDot,
  * Fnv1a), a `LogicalPlan`+`SparkStrategy`+`SparkPlan` operator
  * (TopKPerGroup), and now a `Rule[LogicalPlan]` — injectable either at
  * runtime ([[TopKRewrite.enable]], via `spark.experimental`) or at
  * session construction ([[GraftExtensions]], via
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Rewrite preconditions (all checked structurally):
  *  - single row_number window expression; any number of partition and
  *    ORDER BY expressions (the heap executes the window's own SortOrder
  *    list through Spark's RowOrdering, so every direction / null-ordering
  *    combination is faithful);
  *  - partition and order expressions deterministic (the heap evaluates
  *    order expressions per comparison, not once per row);
  *  - partition key types hashable by value: no MapType anywhere (map
  *    equality is not byte equality), and no float/double anywhere —
  *    NormalizeFloatingNumbers (-0.0/NaN canonicalization) runs AFTER the
  *    extension-injected optimizer rules, so an un-normalized double key
  *    could split a group across unequal key bytes. Declining keeps the
  *    window plan — correct, just unrewritten;
  *  - the rank attribute is dropped by the projection above the filter
  *    (a query that RETURNS the rank needs the window);
  *  - the filter is a sargable rank bound (<=k, <k+1, =1) on the rank.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  /** Partition-key types whose UnsafeRow bytes define value equality —
    * shared with [[TopKPerGroup.topK]], which enforces the same contract
    * on its explicit API instead of silently splitting groups. */
  private[plans] def groupable(dt: DataType): Boolean = dt match {
    case _: MapType | FloatType | DoubleType => false
    case s: StructType => s.fields.forall(f => groupable(f.dataType))
    case a: ArrayType => groupable(a.elementType)
    case _ => true
  }

  private def limitOf(cond: Expression, rk: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rk) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rk) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rk) && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rk) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rk) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)),
          partSpec, orderSpec, winChild, _)))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          partSpec.forall(g => g.deterministic && groupable(g.dataType)) &&
          orderSpec.forall(_.child.deterministic) &&
          projList.forall(!_.references.contains(al.toAttribute)) =>
      limitOf(cond, al.toAttribute) match {
        // k cap: the heap holds O(k × groups) rows with no spill path —
        // past ~10k the window's spillable sort is the safer plan, so
        // decline instead of trading spillability for heap pressure
        case Some(k) if k >= 1 && k <= 10000 =>
          // Spark's InferWindowGroupLimit may already have inserted a
          // per-group pre-limit below the window; the heap subsumes it.
          val child = winChild match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          // strip sameOrderExpressions: only the (child, direction, nulls)
          // triple matters to the heap's comparator
          val order = orderSpec.map(so =>
            SortOrder(so.child, so.direction, so.nullOrdering, Seq.empty))
          Project(projList, TopKPerGroupNode(partSpec, order, k, child))
        case _ => p
      }
  }
}

/** Session-construction-time injection of the graft Catalyst extensions —
  * the production wiring (`--conf spark.sql.extensions=graft.plans.GraftExtensions`).
  * [[TopKRewrite.enable]] is the runtime equivalent for sessions the
  * library does not construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TopKWindowRewrite)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

object TopKRewrite {
  import org.apache.spark.sql.functions._

  /** Idempotently inject the rewrite rule + planning strategy into an
    * existing session through the public `spark.experimental` hooks. */
  def enable(s: SparkSession): Unit = {
    if (!s.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ TopKPerGroupStrategy
    if (!s.experimental.extraOptimizations.contains(TopKWindowRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ TopKWindowRewrite
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The USER-WRITTEN window formulation (q07/q45's semantics), executed
    // with the rewrite enabled: the optimizer swaps in TopKPerGroupExec
    // (TopKRewriteSpec asserts the plan), and the result stays identical
    // to the window's — which is exactly what the oracle replays.
    // Runs against a CHILD session (newSession: shared context/catalog,
    // per-session experimental hooks) so enabling the rewrite here never
    // leaks into the caller's session and silently re-plans its other
    // window queries (round-5 advisor finding).
    "q86_topk_rewrite" -> ((s, d) => {
      val s2 = s.newSession()
      enable(s2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      graft.Tables.orders(s2, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }))

  val oracles: Map[String, String] = Map(
    "q86_topk_rewrite" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")
}
