package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r18 optimization scratch harness (dev-side only): hand-built variants
  * of the expensive kernels, timed head-to-head in one JVM so the plan
  * change is the only variable. Not part of the library runtime. */
object OptScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = if (args.nonEmpty) args(0) else "all"

    def time(label: String, reps: Int = 3)(mk: => DataFrame): Unit = {
      val rs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      println(f"[scratch] $label runs=${rs.map(r => f"$r%.2f").mkString(",")} min=${rs.min}%.2f")
    }

    // ---- q152 pagerank variants -------------------------------------
    def pagerankVariant(edges: DataFrame, mode: String): DataFrame = {
      val Mass = 1000000000000L; val Damp = 85; val Iters = 10
      val s = spark
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")).persist()
      val adj = edges.join(deg.select(col("node").as("src"), col("deg")), "src")
        .repartition(col("src")).persist()
      val n = deg.count()
      val base = (100L - Damp) * Mass / (100L * n)
      var pr = deg.select(col("node"), lit(Mass / n).as("pr"))
      for (i <- 1 to Iters) {
        val prs = pr.select(col("node").as("src"), col("pr"))
        val rhs = mode match {
          case "smj" => prs
          case "shj" => prs.hint("shuffle_hash")
          case "bcast" => broadcast(prs)
        }
        val msgs = adj.join(rhs, "src")
          .select(col("dst").as("node"),
            expr(s"($Damp * pr) div (100 * deg)").as("m"))
        val nxt = msgs.groupBy(col("node")).agg(sum(col("m")).as("acc"))
          .select(col("node"), (lit(base) + col("acc")).as("pr"))
        pr = if (i % 8 == 0 || i == Iters) nxt.localCheckpoint() else nxt
      }
      val out = pr.localCheckpoint()
      adj.unpersist(); deg.unpersist()
      out
    }
    def tradeEdges: DataFrame = {
      val s = spark; val d = sfDir
      val pairs = graft.Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")), "o_orderkey")
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
        .distinct()
      pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
    }
    if (which == "all" || which == "q152") {
      time("q152_edges_only")(tradeEdges.localCheckpoint())
      time("q152_smj")(pagerankVariant(tradeEdges, "smj"))
      time("q152_shj")(pagerankVariant(tradeEdges, "shj"))
      time("q152_bcast")(pagerankVariant(tradeEdges, "bcast"))
      // plan of one iteration under each mode
      val e = tradeEdges.localCheckpoint()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")).persist()
      val adj = e.join(deg.select(col("node").as("src"), col("deg")), "src")
        .repartition(col("src")).persist()
      adj.count()
      val pr0 = deg.select(col("node"), lit(1L).as("pr"))
      for (m <- Seq("smj", "shj", "bcast")) {
        val rhs = m match {
          case "smj" => pr0.select(col("node").as("src"), col("pr"))
          case "shj" => pr0.select(col("node").as("src"), col("pr")).hint("shuffle_hash")
          case "bcast" => broadcast(pr0.select(col("node").as("src"), col("pr")))
        }
        val it = adj.join(rhs, "src")
          .select(col("dst").as("node"), expr("(85 * pr) div (100 * deg)").as("m"))
          .groupBy(col("node")).agg(sum(col("m")).as("acc"))
        it.write.format("noop").mode("overwrite").save()
        val p = it.queryExecution.executedPlan.toString
        val joins = p.linesIterator.filter(l => l.contains("Join")).take(3).mkString(" | ")
        println(s"[scratch] q152 iter join ($m): $joins")
      }
      adj.unpersist(); deg.unpersist()
    }

    // ---- q167 zorder variants ---------------------------------------
    if (which == "all" || which == "q167") {
      val s = spark; val d = sfDir
      def mk(v: String): DataFrame = {
        val base = graft.Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 65536L).as("p"),
          (col("l_suppkey") % 65536L).as("sk")).persist()
        val withZ = base.withColumn("z",
          graft.operators.StorageOps.mortonCode(col("p"), col("sk"), 16))
        val n = base.agg(count(lit(1)).as("__n"))
        def fileOf(df: DataFrame, coarse: Column, fine: Seq[Column]): DataFrame = {
          val withC = df.withColumn("__c", coarse)
          val offs = withC.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
            .select(col("__c"), coalesce(sum(col("__cnt")).over(
              Window.orderBy(col("__c"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
              .as("__off"))
          withC.join(broadcast(offs), "__c").crossJoin(broadcast(n))
            .select(col("p"), col("sk"),
              expr("((__off + " +
                "row_number() OVER (PARTITION BY __c ORDER BY " +
                fine.map(_.toString).mkString(", ") + ") - 1) * 64) div __n")
                .as("file_id"))
        }
        val zf = fileOf(withZ, expr("z div 16384"),
          Seq(col("z"), col("l_orderkey"), col("l_linenumber")))
          .withColumn("layout", lit("zorder"))
        val pf = fileOf(base, col("p"),
          Seq(col("sk"), col("l_orderkey"), col("l_linenumber")))
          .withColumn("layout", lit("partsort"))
        val out = v match {
          case "full" =>
            zf.unionByName(pf)
              .groupBy(col("layout"), col("file_id"))
              .agg(count(lit(1)).as("n_rows"),
                min(col("p")).as("p_min"), max(col("p")).as("p_max"),
                min(col("sk")).as("sk_min"), max(col("sk")).as("sk_max"))
              .orderBy(col("layout"), col("file_id"))
              .localCheckpoint()
          case "zonly" => zf.localCheckpoint()
          case "ponly" => pf.localCheckpoint()
          case "baseonly" => base.localCheckpoint()
        }
        base.unpersist()
        out
      }
      time("q167_baseonly")(mk("baseonly"))
      time("q167_zonly")(mk("zonly"))
      time("q167_ponly")(mk("ponly"))
      time("q167_full")(mk("full"))
    }

    // ---- q167 morton isolation --------------------------------------
    if (which == "all" || which == "q167b") {
      val s = spark; val d = sfDir
      def base = graft.Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 65536L).as("p"),
        (col("l_suppkey") % 65536L).as("sk"))
      val mort = graft.operators.StorageOps.mortonCode(col("p"), col("sk"), 16)
      time("q167b_morton_expr_only")(
        base.withColumn("z", mort).agg(sum(col("z"))))
      def fileOf(df: DataFrame, coarse: Column, fine: Seq[Column]): DataFrame = {
        val n = df.agg(count(lit(1)).as("__n"))
        val withC = df.withColumn("__c", coarse)
        val offs = withC.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
          .select(col("__c"), coalesce(sum(col("__cnt")).over(
            Window.orderBy(col("__c"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("__off"))
        withC.join(broadcast(offs), "__c").crossJoin(broadcast(n))
          .select(col("p"), col("sk"),
            expr("((__off + " +
              "row_number() OVER (PARTITION BY __c ORDER BY " +
              fine.map(_.toString).mkString(", ") + ") - 1) * 64) div __n")
              .as("file_id"))
      }
      time("q167b_z_inline")({
        val b = base.persist()
        val out = fileOf(b.withColumn("z", mort), expr("z div 16384"),
          Seq(col("z"), col("l_orderkey"), col("l_linenumber")))
          .localCheckpoint()
        b.unpersist(); out
      })
      time("q167b_z_precomputed")({
        val b = base.withColumn("z", mort).persist()
        b.count()
        val out = fileOf(b, expr("z div 16384"),
          Seq(col("z"), col("l_orderkey"), col("l_linenumber")))
          .localCheckpoint()
        b.unpersist(); out
      })
      // offs-only: is the tiny-group rollup + 1-partition window the cost?
      time("q167b_z_offs_only")({
        val b = base.withColumn("z", mort).withColumn("__c", expr("z div 16384"))
        b.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
          .select(col("__c"), coalesce(sum(col("__cnt")).over(
            Window.orderBy(col("__c"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("__off"))
      })
    }

    spark.stop()
  }
}
