package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
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
  * `requiredChildDistribution` declares clustering on the group key, so
  * EnsureRequirements inserts exactly one hash exchange — the same shuffle
  * the window would need, minus the sort.
  */
case class TopKPerGroupNode(
    group: Expression,
    score: Expression, // double, descending (higher = better)
    tie: Expression, // long, ascending tiebreak
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, s, t, k, child) =>
      TopKPerGroupExec(g, s, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    group: Expression,
    score: Expression,
    tie: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(group)) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundGroup = BindReferences.bindReference(group, child.output)
    val boundScore = BindReferences.bindReference(score, child.output)
    val boundTie = BindReferences.bindReference(tie, child.output)
    val kk = k
    child.execute().mapPartitions { it =>
      // Ordering contract = (score DESC NULLS LAST, tie ASC NULLS FIRST) —
      // Spark's default null placement for those directions, so the
      // TopKWindowRewrite rule can substitute this operator for a
      // default-ordered row_number window on NULLABLE columns too.
      case class Entry(sNull: Boolean, s: Double, tNull: Boolean, t: Long,
          row: InternalRow)
      // Spark's nan-safe double ordering: NaN compares larger than any
      // non-NaN (and equal to itself), ±0.0 compare equal — a plain
      // `!=`/`>` comparison would make NaN incomparable to everything,
      // corrupting the heap and diverging from row_number's order.
      def cmpScore(x: Double, y: Double): Int =
        if (x.isNaN && y.isNaN) 0
        else if (x.isNaN) 1
        else if (y.isNaN) -1
        else if (x < y) -1
        else if (x > y) 1
        else 0
      def better(a: Entry, b: Entry): Boolean =
        if (a.sNull != b.sNull) !a.sNull // non-null score wins (NULLS LAST)
        else if (!a.sNull && cmpScore(a.s, b.s) != 0)
          cmpScore(a.s, b.s) > 0 // higher score wins (NaN counts highest)
        else if (a.tNull != b.tNull) a.tNull // null tie first (NULLS FIRST)
        else a.t < b.t // lower tie wins
      // worst-first heap per group: PQ dequeues its max, and "better"
      // compares as smaller, so head is the row to evict
      implicit val worstFirst: Ordering[Entry] = (x: Entry, y: Entry) =>
        if (better(x, y)) -1 else if (better(y, x)) 1 else 0
      def entry(row: InternalRow): Entry = {
        val sv = boundScore.eval(row)
        val tv = boundTie.eval(row)
        Entry(sv == null,
          if (sv == null) 0.0 else sv.asInstanceOf[Number].doubleValue(),
          tv == null,
          if (tv == null) 0L else tv.asInstanceOf[Number].longValue(),
          null)
      }
      val heaps = new java.util.HashMap[Any, scala.collection.mutable.PriorityQueue[Entry]]()
      it.foreach { row =>
        val g = boundGroup.eval(row)
        val e = entry(row)
        var heap = heaps.get(g)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[Entry]
          // group keys from eval may be mutable (UTF8String backed by the
          // row buffer) — copy via toString-stable clone when needed
          heaps.put(g match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
            case other => other
          }, heap)
        }
        if (heap.size < kk) heap.enqueue(e.copy(row = row.copy()))
        else if (better(e, heap.head)) {
          heap.dequeue(); heap.enqueue(e.copy(row = row.copy()))
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        // emit best-first within each group
        val drained: Seq[Entry] = h.dequeueAll.toSeq
        out ++= drained.reverse.map(_.row)
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

  /** Top-k rows per group by `score` descending, `tie` ascending.
    * Injects the planning strategy into the session on first use.
    * Columns are given by name and resolved against the child's analyzed
    * output here — Column-API expressions arrive as lazy ColumnNode
    * wrappers that the analyzer won't resolve inside a foreign node. */
  def apply(df: DataFrame, group: String, score: String, tie: String, k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val child = GraftBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(",")}"))
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{DoubleType, LongType}
    GraftBridge.ofRows(spark,
      TopKPerGroupNode(
        attr(group),
        Cast(attr(score), DoubleType),
        Cast(attr(tie), LongType),
        k,
        child))
  }
}
