package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BindReferences, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator extension tier (SURVEY §7.1 path (c)): per-group top-k
  * as a first-class physical operator — custom `LogicalPlan` node, a
  * `SparkStrategy` planning it, and a `SparkPlan` executing it, wired in
  * through the public `spark.experimental.extraStrategies` hook.
  *
  * Why an operator instead of window+filter (q07's plan): row_number
  * requires a FULL sort of every group; this operator keeps one bounded
  * k-heap per group while streaming the partition — O(n log k) with O(k ×
  * groups) memory, no sort buffer, no rank column. At 100 TB that's the
  * difference between sort-spilling every group and a single pass.
  * `requiredChildDistribution` declares clustering on the group keys, so
  * EnsureRequirements inserts exactly one hash exchange — the same shuffle
  * the window would need, minus the sort — and the planner stacks a
  * PARTIAL pre-cut under that exchange (see [[TopKPerGroupStrategy]]), so
  * the shuffle carries at most k rows per (group, upstream partition).
  *
  * Memory contract: each task holds O(k × distinct groups in its input)
  * rows on the JVM heap (no spill path — unlike the sort a window uses).
  * That is exactly the regime where the heap wins; when k is huge a sort
  * is the right plan anyway, so [[TopKWindowRewrite]] declines k > 10000
  * rather than trade the window's spillability for heap pressure.
  *
  * Generality: grouping is any Seq of expressions and the ranking is any
  * Seq of `SortOrder` (direction + null ordering respected exactly).
  * Rows are compared with Spark's own `RowOrdering` — the identical
  * comparator a sort-based window would use, including NaN-largest and
  * null-placement semantics — and group keys are `UnsafeProjection`
  * rows COPIED on first sight, so binary / struct / array keys get
  * value-based equality instead of the JVM identity equality (and row-
  * buffer reuse corruption) a raw `eval()`-keyed map would suffer.
  */
case class TopKPerGroupNode(
    groups: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(groups.nonEmpty && order.nonEmpty && k >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      // two-level plan, like partial → final aggregation: top-k per group
      // is ALGEBRAIC (a row outside its map-partition's per-group top-k
      // can never be in the global top-k), so a PARTIAL pre-cut runs
      // before the exchange and the shuffle carries ≤ k rows per (group ×
      // input partition) instead of every row — the map-side-combine win
      // a window top-k can never have, and at 100 TB usually the
      // difference between shuffling gigabytes and shuffling the answer.
      TopKPerGroupExec(g, o, k,
        TopKPerGroupExec(g, o, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groups: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the partial pre-cut runs on whatever partitioning the child has (its
  // whole point is to run BEFORE the exchange); only the final cut needs
  // group clustering
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groups) :: Nil

  // row-preserving per-partition operator: the child's (post-exchange)
  // partitioning survives, so a downstream group-keyed operator (e.g. the
  // bounded rank window q95 layers on top) reuses this exchange instead
  // of inserting a second one
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundGroups = groups.map(BindReferences.bindReference(_, child.output))
    val boundOrder = order.map(so =>
      so.copy(child = BindReferences.bindReference(so.child, child.output)))
    val kk = k
    child.execute().mapPartitions { it =>
      // key projection per partition (UnsafeProjection is not thread-safe)
      val keyProj = UnsafeProjection.create(boundGroups)
      // Spark's own sort comparator for exactly these SortOrders — the
      // same ordering (NaN largest, per-order null placement) the window's
      // SortExec would use, so a rewrite substitution is bit-faithful.
      val ord = RowOrdering.create(boundOrder, Nil)
      // worst-first heap per group: under `ord`, smaller = earlier in sort
      // order = better rank; PriorityQueue dequeues its maximum, so the
      // head is the worst kept row — the one to evict.
      implicit val worstFirst: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => ord.compare(a, b)
      val heaps =
        new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        // lookup with the projection's reused buffer (UnsafeRow equality
        // is value-based); copy the key only when inserting a new group
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        // emit best-first within each group
        out ++= h.dequeueAll.reverseIterator
      }
      out.iterator
    }
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q07's semantics through the custom operator — the oracle is the
    // window formulation, proving plan-level equivalence.
    "q45_topk_custom_plan" -> ((s, d) => {
      TopKPerGroup(graft.Tables.orders(s, d),
        "o_custkey", "o_totalprice", "o_orderkey", 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }))

  val oracles: Map[String, String] = Map(
    "q45_topk_custom_plan" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")

  /** Top-k rows per group by `score` descending, `tie` ascending — the
    * common "best k per key" shape, kept as the concise entry point. */
  def apply(df: DataFrame, group: String, score: String, tie: String, k: Int)
      : DataFrame =
    topK(df, Seq(group), Seq(score -> false, tie -> true), k)

  /** General form: top-k rows per `groups` under the given ordering
    * (`(column, ascending)` pairs, Spark-default null placement).
    * Injects the planning strategy into the session on first use.
    * Columns are given by name and resolved against the child's analyzed
    * output here — Column-API expressions arrive as lazy ColumnNode
    * wrappers that the analyzer won't resolve inside a foreign node. */
  def topK(df: DataFrame, groups: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val child = GraftBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(",")}"))
    // same contracts TopKWindowRewrite checks structurally before
    // rewriting, enforced here because the explicit API skips the rule:
    // group keys are compared as raw UnsafeRow bytes, so float/double
    // (-0.0 vs 0.0, NaN bit patterns) and map layouts would silently
    // split one logical group — fail fast instead; and the heap holds
    // O(k × groups) rows with NO spill path, so past k=10000 the
    // window's spillable sort is the safer plan.
    require(k >= 1 && k <= 10000,
      s"k=$k outside the heap's no-spill contract [1, 10000] — use the " +
        "window top-k formulation for larger k")
    groups.foreach { g =>
      val dt = attr(g).dataType
      require(TopKWindowRewrite.groupable(dt),
        s"group column $g: ${dt.simpleString} keys are compared as raw " +
          "UnsafeRow bytes (float/double -0.0/NaN bit patterns and map " +
          "layouts split logical groups) — cast or normalize the key first")
    }
    GraftBridge.ofRows(spark,
      TopKPerGroupNode(
        groups.map(attr),
        order.map { case (name, asc) =>
          SortOrder(attr(name), if (asc) Ascending else Descending)
        },
        k,
        child))
  }
}
