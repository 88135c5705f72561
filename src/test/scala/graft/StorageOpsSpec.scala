package graft

import graft.operators.StorageOps
import org.apache.spark.sql.functions._

/** Plan-shape and contract checks for the storage-layout operators. */
class StorageOpsSpec extends TestSpark {

  test("partitioned sink: read of one partition is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_test").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the pruned plan"))
    assert(scan.partitionFilters.nonEmpty,
      "partition filter did not reach the scan — pruning inactive")
    // the pruned scan must see exactly the one partition's files
    val prunedFiles = scan.selectedPartitions.totalNumberOfFiles
    val allFiles = spark.read.parquet(dir).queryExecution.executedPlan
      .collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.selectedPartitions.totalNumberOfFiles
    assert(prunedFiles < allFiles,
      s"pruned scan reads $prunedFiles of $allFiles files — nothing pruned")
  }

  test("partitioned sink rollup equals the unpartitioned aggregation") {
    val viaSink = StorageOps.queries("q84_partitioned_sink")(spark, sf0001)
    val direct = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("day"))
    assert(viaSink.collect().sameElements(direct.collect()))
  }

  test("transition matrix: totals equal rows minus one per active user") {
    val m = graft.operators.CorpusCleaning
      .queries("q83_transition_matrix")(spark, sf0001)
    val nTransitions = m.agg(sum(col("n_transitions"))).collect()(0).getLong(0)
    val e = Tables.events(spark, sf0001)
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(nTransitions == expected,
      s"transition total $nTransitions != events - users = $expected")
  }

  test("train split: partitions the corpus, deterministic, near 12/2/2") {
    val q = graft.operators.CorpusCleaning.queries("q85_train_split")
    val r1 = q(spark, sf0001).collect()
    assert(r1.sameElements(q(spark, sf0001).collect()))
    val bySplit = r1.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = bySplit.values.sum
    assert(total == Tables.documents(spark, sf0001).count())
    val trainRate = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainRate > 0.6 && trainRate < 0.9, s"train rate $trainRate far from 12/16")
    assert(bySplit.contains("val") && bySplit.contains("test"))
  }
}
