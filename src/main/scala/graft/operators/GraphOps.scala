package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph dataflow — the Pregel-shaped workload class the engine
  * had not yet demonstrated beyond connected components (q72). PageRank
  * (Brin & Page 1998) over the customer↔supplier trade graph derived from
  * orders ⋈ lineitem: who are the structurally central parties in the
  * purchase network?
  *
  * The reference engine's only iterative surface is running one MapReduce
  * job after another by hand (`main/mrsequential.go` once per pass);
  * Spark-first, an iteration is a join + partial-aggregated groupBy, and
  * the driver only loops — data never leaves the cluster.
  *
  * Determinism contract: the entire computation is SCALED-INTEGER
  * (mass = 10^12 split in Long arithmetic, truncating `div`). FP PageRank
  * sums contributions in shuffle order, so the low bits differ run-to-run
  * and engine-to-engine; integer addition is exact and order-free, so the
  * DuckDB oracle (the same ten iterations unrolled as chained CTEs)
  * replays every rank BIT-EXACTLY at any scale — the same trick as the
  * q125 hash-rate arithmetic.
  *
  * Scale shape: edges and degrees are computed once and persisted; each
  * iteration is ONE shuffle (groupBy dst of the contribution messages —
  * map-side partial sums first), which is the minimum any message-passing
  * round costs. Lineage is truncated with checkpoints every few rounds
  * exactly as [[graft.functions.Dedup.connectedComponents]] does, so the
  * plan stays constant-size no matter the iteration count. No per-node
  * driver state: the only driver-side values are the two scalars n (node
  * count) and the fixed iteration count.
  */
object GraphOps {

  /** Total PageRank mass, in integer units: ranks are parts-per-10^12. */
  val Mass = 1000000000000L
  val Damp = 85 // ×/100 — the canonical 0.85 damping, in integer percent
  val Iters = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the bipartite customer↔supplier graph (an edge per
    // distinct trading pair; symmetrized, so every node has degree ≥ 1
    // and there are no dangling nodes to redistribute). Node encoding
    // 2·custkey / 2·suppkey+1 keeps the two key spaces disjoint in one
    // Long column. Ten damped iterations; output = every node's final
    // integer rank, decoded to (kind, key).
    "q152_pagerank" -> ((s, d) => {
      val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
          "o_orderkey")
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
      pagerank(s, edges)
        .select(when(pmod(col("node"), lit(2)) === 0, lit("cust"))
          .otherwise(lit("supp")).as("kind"),
          expr("node div 2").as("key"), col("pr"))
        .orderBy(col("kind"), col("key"))
    })
  )

  /** Ten damped integer-PageRank iterations over a SYMMETRIZED edge
    * relation (src, dst) — every node must appear as a src (true of any
    * symmetrized graph), so there are no dangling nodes. Returns
    * (node, pr) with Σpr ≤ [[Mass]] (each truncating division loses
    * < 1 unit). */
  private[graft] def pagerank(s: SparkSession, edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    // (src, dst, deg(src)) — the per-iteration join input, built once.
    val adj = edges.join(deg.select(col("node").as("src"), col("deg")), "src")
      .persist()
    // n is a 1-row aggregate pulled to the driver because the DRIVER
    // loops: base rank and the initial mass split are loop constants,
    // not data (q29-count precedent; cheap metadata-scale action).
    val n = deg.count()
    val base = (100L - Damp) * Mass / (100L * n)
    def truncate(df: DataFrame): DataFrame =
      if (s.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    var pr = deg.select(col("node"), lit(Mass / n).as("pr"))
    for (i <- 1 to Iters) {
      val msgs = adj.join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"),
          expr(s"($Damp * pr) div (100 * deg)").as("m"))
      val nxt = deg.select(col("node"))
        .join(msgs.groupBy(col("node")).agg(sum(col("m")).as("acc")),
          Seq("node"), "left_outer")
        .select(col("node"), (lit(base) + coalesce(col("acc"), lit(0L))).as("pr"))
      // truncate lineage every 4 rounds (and on the last: an eager
      // checkpoint, so the result is materialized and the adj cache can
      // be dropped with no recompute): keeps the analyzed tree
      // constant-size over any iteration count without paying a
      // materialization per round
      pr = if (i % 4 == 0 || i == Iters) truncate(nxt) else nxt
    }
    adj.unpersist()
    pr
  }

  /** The identical ten iterations unrolled as chained CTEs (recursive
    * CTEs with aggregation in the recursive member are not portable);
    * every arithmetic step is the same integer op the Spark side runs,
    * so ranks match bit-exactly. */
  val oracles: Map[String, String] = Map(
    "q152_pagerank" -> {
      val head =
        s"""WITH pairs AS (
           SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS (SELECT c AS src, p AS dst FROM pairs
                   UNION ALL SELECT p, c FROM pairs),
         deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         nn AS (SELECT count(*) AS n FROM deg),
         p0 AS (SELECT node, $Mass // n AS pr FROM deg, nn)"""
      val steps = (1 to Iters).map { k =>
        s"""p$k AS (SELECT d.node,
           CAST((${100 - Damp} * $Mass) // (100 * nn.n)
                + COALESCE(s.acc, 0) AS BIGINT) AS pr
           FROM deg d CROSS JOIN nn LEFT JOIN (
             SELECT e.dst AS node, SUM(($Damp * p.pr) // (100 * g.deg)) AS acc
             FROM edges e JOIN p${k - 1} p ON p.node = e.src
                          JOIN deg g ON g.node = e.src
             GROUP BY e.dst) s ON s.node = d.node)"""
      }
      (Seq(head) ++ steps).mkString(",\n") +
        s"""
         SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
                node // 2 AS key, pr
         FROM p$Iters ORDER BY kind, key"""
    }
  )
}
