package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 optimization probe (dev-side tooling, not library runtime):
  * for each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
  * local[$SPARK_GRAFT_CPUS], time min-of-3 noop-sink runs exactly like
  * Bench (module caches released between queries, never between a
  * query's three runs) and/or dump `.explain("formatted")` to
  * plans/r18/<query>_<tag>.txt so plan claims in OPTIMIZATION_r18.md
  * are checkable without running Spark.
  *
  * Usage: runMain graft.tools.OptProbe [time|plan|both] q166,q167,...
  * Env: GRAFT_PLAN_TAG=before|after (plan file suffix, default before).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "both"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("GRAFT_PLAN_TAG", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val resolved = names.flatMap { sub =>
      val hit = graft.SparkEntry.queries.keys.toSeq.sorted.filter(_.contains(sub))
      if (hit.isEmpty) System.err.println(s"[opt] no query matches '$sub'")
      hit
    }.distinct

    def releaseAll(): Unit = {
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

    // one warmup pass at sf0.001 so timings measure the plan, not JIT
    val warmDir = "/root/testdata/sf0.001"
    if (mode != "plan" && new java.io.File(warmDir).isDirectory) {
      resolved.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      releaseAll()
    }

    val planDir = new java.io.File(
      sys.env.getOrElse("GRAFT_REPO_ROOT", "."), "plans/r18")
    planDir.mkdirs()

    resolved.foreach { n =>
      if (mode == "plan" || mode == "both") {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(
          new java.io.File(planDir, s"${n}_$tag.txt"))
        try w.println(txt) finally w.close()
        val exch = "Exchange".r.findAllIn(txt).size
        System.err.println(s"[opt] $n plan -> ${n}_$tag.txt " +
          s"(${txt.linesIterator.size} lines, $exch Exchange refs)")
        releaseAll()
      }
      if (mode == "time" || mode == "both") {
        spark.sparkContext.setJobDescription(s"opt: $n")
        val rs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try graft.SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[opt] $n FAILED: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        spark.sparkContext.setJobDescription(null)
        releaseAll()
        println(f"[opt] $n runs=${rs.map(r => f"$r%.2f").mkString("[", ",", "]")} min=${rs.min}%.2f")
      }
    }
    spark.stop()
  }
}
