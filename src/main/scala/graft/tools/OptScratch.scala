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

    // ---- q175 edge-derivation variants (r19) --------------------------
    if (which == "q175v") {
      val s = spark; val d = sfDir
      def op: DataFrame = graft.Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
        .dropDuplicates()
      // A (r18): canonical-pair distinct -> symmetrize -> repartition(dst)
      def edgesA: DataFrame = {
        val o = op
        val e0 = o.alias("x")
          .join(o.alias("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        e0.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("dst"))
      }
      // B (r19): ordered-pair self-join -> repartition(dst) -> dedupe in place
      def edgesB: DataFrame = {
        val o = op
        o.alias("x")
          .join(o.alias("y"), col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
          .select(col("x.p").as("src"), col("y.p").as("dst"))
          .repartition(col("dst"))
          .dropDuplicates()
      }
      def lp(edges: DataFrame): DataFrame = {
        val e = edges.localCheckpoint()
        val labels = graft.operators.GraphOps.labelPropagation(s, e, 4)
        val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
        labels.join(sizes, "lbl")
          .select(col("node").as("p_partkey"), col("lbl").as("community"),
            col("community_size"))
          .orderBy(col("p_partkey"))
      }
      for ((nm, mk) <- Seq("A_ckpt" -> (() => edgesA.localCheckpoint()),
          "B_ckpt" -> (() => edgesB.localCheckpoint()),
          "B_persist" -> (() => { val e = edgesB.persist(); e.count(); e }))) {
        val e = mk()
        println(s"[scratch] q175v edges$nm partitioning: " +
          e.queryExecution.executedPlan.outputPartitioning)
        val l0 = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("lbl"))
        val round = graft.operators.GraphOps.lpRound(e, l0, small = true)
        val p = round.queryExecution.executedPlan.toString
        val ex = "Exchange hashpartitioning".r.findAllIn(p).size
        println(s"[scratch] q175v round($nm) exchanges=$ex")
        e.unpersist()
      }
      // full-query A/B at the adopted boundary: persisted-B vs ckpt-A
      def lpPersist(edges0: DataFrame): DataFrame = {
        val e = edges0.persist()
        val labels = graft.operators.GraphOps.labelPropagation(s, e, 4)
        e.unpersist()
        val sizes = labels.groupBy(col("lbl"))
          .agg(count(lit(1)).as("community_size"))
        labels.join(sizes, "lbl")
          .select(col("node").as("p_partkey"), col("lbl").as("community"),
            col("community_size"))
          .orderBy(col("p_partkey"))
      }
      time("q175v_full_B_persist")(lpPersist(edgesB))
      time("q175v_edgesA_only")(edgesA.localCheckpoint())
      time("q175v_edgesB_only")(edgesB.localCheckpoint())
      time("q175v_full_A")(lp(edgesA))
      time("q175v_full_B")(lp(edgesB))
      val a = edgesA.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = edgesB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[scratch] q175v edge sets equal: ${a == b} (${a.size} edges)")
    }

    // ---- q248 warm-path job census ------------------------------------
    // Bench min-of-3 semantics: NO unpersist between runs (the base
    // graph stays cached — the warm form the bench min prices), with a
    // per-run job/stage/task census.
    if (which == "q248j") {
      val q = "q248_knn_delta_admit"
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val stageNames = new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.atomic.AtomicInteger]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val key = sc.stageInfo.name.take(60) +
            s" [${sc.stageInfo.numTasks}t]"
          stageNames.computeIfAbsent(key,
            _ => new java.util.concurrent.atomic.AtomicInteger(0))
            .incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      for (rep <- 1 to 4) {
        jobs.set(0); stages.set(0); tasks.set(0); stageNames.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[scratch] q248j run$rep $t%.2f s: ${jobs.get} jobs, " +
          s"${stages.get} stages, ${tasks.get} tasks")
        if (rep == 3) {
          import scala.jdk.CollectionConverters._
          stageNames.asScala.toSeq.sortBy(-_._2.get).take(20).foreach {
            case (n, c) => println(s"[scratch]   stage ×${c.get}: $n")
          }
        }
      }
      spark.sparkContext.removeSparkListener(listener)
    }

    // ---- q207 KMV-leg variants ---------------------------------------
    if (which == "q207v") {
      val s = spark; val d = sfDir
      val K = 256
      def profile(tbl: String, df: DataFrame, cols: Seq[String],
          closure: Boolean): DataFrame = {
        val basicAggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nul"),
            min(col(c)).cast("string").as(s"${c}__min"),
            max(col(c)).cast("string").as(s"${c}__max"))
        }
        val one = df.agg(basicAggs.head, basicAggs.tail: _*)
        val basic = one.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col("n_rows"),
            col(s"${c}__nul").as("n_null"), col(s"${c}__min").as("min_val"),
            col(s"${c}__max").as("max_val"))): _*)).as("kv"))
          .select(col("kv.*"))
        val hashes = df.select(explode(array(cols.map(c =>
          struct(lit(c).as("g"), md5(col(c).cast("string")).as("h"))): _*))
          .as("kv"))
          .select(col("kv.g"), col("kv.h")).filter(col("h").isNotNull)
        val cand =
          if (closure) graft.functions.TextQueries.kmvPartitionMins(hashes, K)
            .distinct()
          else hashes.select(col("g").as("lang"), col("h")).dropDuplicates()
        val est = graft.plans.TopKPerGroup
          .topK(cand, Seq("lang"), Seq("h" -> true), K)
          .groupBy(col("lang").as("col_name"))
          .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
        val kUsed = coalesce(col("k_used"), lit(0L))
        val estv = when(kUsed < K, kUsed.cast("double"))
          .otherwise(round(lit((K - 1).toDouble) /
            (conv(substring(col("kth_hash"), 1, 15), 16, 10).cast("long")
              .cast("double") / lit(1.152921504606846976e18)), 4))
        basic.join(est, Seq("col_name"), "left_outer")
          .select(lit(tbl).as("tbl"), col("col_name"), col("n_rows"),
            col("n_null"), col("min_val"), col("max_val"),
            kUsed.as("k_used"), estv.as("est_ndv"))
      }
      def q207like(closure: Boolean): DataFrame =
        profile("lineitem", graft.Tables.lineitem(s, d),
          Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_returnflag", "l_linestatus"), closure)
          .unionByName(profile("orders", graft.Tables.orders(s, d),
            Seq("o_orderkey", "o_custkey", "o_orderstatus",
              "o_orderpriority"), closure))
          .unionByName(profile("documents", graft.Tables.documents(s, d),
            Seq("doc_id", "lang", "source", "n_chars"), closure))
          .unionByName(profile("events", graft.Tables.events(s, d),
            Seq("event_id", "user_id", "event_type"), closure))
          .orderBy(col("tbl"), col("col_name"))
      time("q207v_closure")(q207like(closure = true))
      time("q207v_dedupe_topk")(q207like(closure = false))
      // equality check
      val a = q207like(true).collect().map(_.toString).sorted
      val b = q207like(false).collect().map(_.toString).sorted
      println(s"[scratch] q207v equal: ${a.sameElements(b)} (${a.length} rows)")
    }

    // ---- store lifecycle stage timing --------------------------------
    if (which == "q133s") {
      val s = spark; val d = sfDir
      import graft.operators.SignatureStore._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      for (rep <- 1 to 2) {
        val dir = graft.Tables.scratchDir(s, s"scr133_$rep")
        val gen2 = graft.Tables.scratchDir(s, s"scr133g2_$rep")
        val docs = graft.Tables.documents(s, d)
        val corpus = docs.filter(!(col("source") <=> "src0"))
        val deltaA = docs.filter(col("source") === "src0" && col("doc_id") % 40 === 0)
        val deltaB = docs.filter(col("source") === "src0" && col("doc_id") % 40 =!= 0)
        t(s"q133s.build rep$rep") { build(s, corpus, dir) }
        val pairsA = graft.PersistTracker.tracked("sigstore",
          admit(s, deltaA, dir, beforeBatch = 0L))
        t(s"q133s.admitA+append rep$rep") {
          append(s, survivors(deltaA, pairsA), dir, 0L) }
        t(s"q133s.compact rep$rep") { compact(s, dir, gen2, throughBatch = 0L) }
        t(s"q133s.admitB rep$rep") {
          admit(s, deltaB, gen2, beforeBatch = 0L)
            .orderBy(col("doc_a"), col("doc_b"))
            .write.format("noop").mode("overwrite").save() }
        releaseAllCaches()
      }
      // file counts of the store dirs for one run
      val dir = new java.io.File(graft.Tables.scratchDir(s, "scr133_2"))
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles).map(_.map(countFiles).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      println(s"[scratch] q133s store files gen1: ${countFiles(dir)}")
    }
    if (which == "q238s") {
      val s = spark; val d = sfDir
      import graft.operators.CurationPipeline._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      import s.implicits._
      for (rep <- 1 to 3) {
        val dir = graft.Tables.scratchDir(s, s"scr238_$rep")
        val nTok = size(filter(split(col("text"), "[^\\p{L}]+"), x => x =!= ""))
        val keeps = t(s"q238s.provenance rep$rep") {
          provenance(s, d).filter(col("verdict") === "keep").select(col("doc_id")) }
        val docs = graft.Tables.documents(s, d).join(keeps, "doc_id")
        val mult = graft.functions.TextQueries.epochMultipliersOf(
          graft.functions.TextQueries.targetMixWeightsOf(docs))
        val epochs = Seq(1L, 2L, 3L).toDF("epoch")
        val packed = t(s"q238s.pack-plan rep$rep") { packMultiEpoch(
          multiEpochBaseOf(docs, mult, epochs, nShards = 8), budget = 512L) }
        t(s"q238s.write rep$rep") {
          packed.write.mode("overwrite").partitionBy("epoch", "shard").parquet(dir) }
        val reread = s.read.parquet(dir)
        t(s"q238s.reread-count rep$rep") { reread.count() }
        def countFiles(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles).map(_.map(countFiles).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        println(s"[scratch] q238s files: ${countFiles(new java.io.File(dir))}")
      }
    }

    spark.stop()
  }

  private def releaseAllCaches(): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.Dedup.releaseCaches(spark)
    graft.functions.Similarity.releaseCaches(spark)
    graft.functions.KnnDescent.releaseCaches(spark)
    graft.functions.TextQueries.releaseCaches(spark)
    graft.operators.Multimodal.releaseCaches(spark)
    graft.operators.SignatureStore.releaseCaches(spark)
    graft.operators.PipelineOps.releaseCaches(spark)
    graft.operators.CurationPipeline.releaseCaches(spark)
    graft.operators.CurationAudits.releaseCaches(spark)
    graft.functions.Embeddings.releaseCaches(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
  }
}
