package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic for the r17 warm-run regression: run q240/q231
  * twice, print whether the second execution's physical plan reads the
  * persisted graph (InMemoryTableScan) or re-derives the descent chain,
  * and time both runs. Dev-side tooling — NOT part of the library
  * runtime. */
object KnndPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- Seq("q231_knn_descent", "q240_sampled_knn_audit")) {
      val t1 = run(name); val t2 = run(name)
      println(f"[probe] $name run1 $t1%.2f s run2 $t2%.2f s")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(plan).size
      val parquets = "Scan parquet".r.findAllIn(plan).size
      println(s"[probe] $name plan: $scans InMemoryTableScans, " +
        s"$parquets parquet scans, ${plan.linesIterator.size} plan lines")
      if (scans == 0) println(plan.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
