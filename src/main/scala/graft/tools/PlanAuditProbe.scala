package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: formatted plans + exchange census for the round-5 queries,
  * to audit shuffle count and what each exchange carries. */
object PlanAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q79_clean_pipeline", "q80_funnel", "q81_bigram_pmi",
        "q83_transition_matrix", "q85_train_split")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val nExchange = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nSort = "\\bSort \\[".r.findAllIn(plan).length
      val textInExchange = plan.linesIterator
        .filter(_.contains("Exchange")).exists(_.contains("text"))
      println(s"=== $n: exchanges=$nExchange sorts=$nSort textInExchange=$textInExchange")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Scan parquet")).mkString("\n"))
    }
    spark.stop()
  }
}
