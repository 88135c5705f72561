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

  test("q150 schema evolution: generations differ on disk, mergeSchema reconciles, old rows NULL in the new column") {
    val res = graft.operators.StorageOps
      .queries("q150_schema_evolution")(spark, sf0001)
    res.collect() // materialize the two generations
    val dir = Tables.scratchDir(spark,
      "q150_evo_sink_" + Tables.datasetTag(sf0001))
    // the footers genuinely differ per generation — this is what a
    // non-merging read can silently lose
    val g0 = spark.read.parquet(s"$dir/batch_id=0").schema.fieldNames.toSet
    val g1 = spark.read.parquet(s"$dir/batch_id=1").schema.fieldNames.toSet
    assert(!g0.contains("score") && g1.contains("score"),
      s"generation schemas unexpected: g0=$g0 g1=$g1")
    // merged view: one table, old rows NULL in the evolved column
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.contains("score"))
    import org.apache.spark.sql.functions.col
    assert(merged.filter(col("batch_id") === 0 && col("score").isNotNull)
      .count() == 0L, "pre-evolution rows must be NULL in the new column")
    assert(merged.filter(col("batch_id") === 1 && col("score").isNull)
      .count() == 0L, "evolved rows must all carry the new column")
  }

  test("PartitionRewrite.erase: randomized erasure removes exactly the named ids, touches only their partitions") {
    import spark.implicits._
    // the shared erasure protocol behind SignatureStore.forget and
    // AnnIndexStore.vacuum, exercised over random stores and erase sets:
    // survivors exact, unaffected partition files byte-untouched,
    // wholly-erased partition directories gone
    (1L to 4L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val table = java.nio.file.Files
        .createTempDirectory(s"graft_prw$seed").toString + "/t"
      val rows = (0 until 200).map { i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(3).toLong)
      }
      rows.toDF("id", "a", "b").write.partitionBy("a", "b").parquet(table)
      val erase = rows.map(_._1).filter(_ => rnd.nextDouble() < 0.2).toSet
      val affected = rows.filter(r => erase(r._1)).map(r => (r._2, r._3)).toSet
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      def untouchedSnapshot(): Map[String, Long] =
        walk(new java.io.File(table))
          .filterNot(f => affected.exists { case (a, b) =>
            f.getPath.contains(s"a=$a/b=$b") })
          .map(f => f.getPath -> f.lastModified).toMap
      val before = untouchedSnapshot()

      graft.operators.PartitionRewrite.erase(spark, table, Seq("a", "b"),
        erase.toSeq.toDF("id"), "id")

      val left = spark.read.parquet(table)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(left == rows.map(_._1).toSet -- erase,
        s"seed $seed: survivor set wrong")
      assert(untouchedSnapshot() == before,
        s"seed $seed: an unaffected partition was rewritten")
      val leftParts = rows.filterNot(r => erase(r._1))
        .map(r => (r._2, r._3)).toSet
      (affected -- leftParts).foreach { case (a, b) =>
        assert(!new java.io.File(s"$table/a=$a/b=$b").exists,
          s"seed $seed: wholly-erased partition dir a=$a/b=$b remains")
      }
    }
  }

  test("q180 compaction plan matches a driver-side sorted-fill replay") {
    val rows = StorageOps.queries("q180_compaction_plan")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, groups) =>
      val inOrder = groups.sortBy(_.getAs[String]("lang"))
      var cum = 0L
      inOrder.foreach { g =>
        assert(g.getAs[Long]("out_file") == cum / 65536L,
          s"${g.getAs[String]("source")}/${g.getAs[String]("lang")}: " +
            s"file ${g.getAs[Long]("out_file")} vs replay ${cum / 65536L}")
        cum += g.getAs[Long]("bytes")
      }
      // sorted fill: file ids never decrease within a source
      val fs = inOrder.map(_.getAs[Long]("out_file"))
      assert(fs.zip(fs.tail).forall { case (a, b) => a <= b })
    }
    // bytes recount against the corpus for one group
    val r0 = rows.minBy(r =>
      (r.getAs[String]("source"), r.getAs[String]("lang")))
    val direct = Tables.documents(spark, sf0001)
      .filter(col("source") === r0.getAs[String]("source") &&
        col("lang") === r0.getAs[String]("lang"))
      .agg(sum(col("n_chars"))).first().getLong(0)
    assert(r0.getAs[Long]("bytes") == direct)
  }

  test("q209 export shards: roundtrip equality, packing property, one-exchange plan") {
    // run the sink (writes the shard dirs + returns the manifest)
    val manifest = StorageOps.queries("q209_export_shards")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("shard"))
    val nCorpus = Tables.documents(spark, sf0001).count()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == nCorpus,
      "every doc must land in exactly one shard")
    assert(manifest.map(_.getAs[Long]("shard")).toSet.subsetOf((0L until 8L).toSet))
    // write → read roundtrip: the files on disk reproduce the derivation
    val dir = graft.Tables.scratchDir(spark,
      "q209_shards_" + graft.Tables.datasetTag(sf0001))
    val reread = spark.read.parquet(dir)
      .select(col("shard").cast("long"), col("doc_id"), col("source"),
        col("n_tok").cast("long"), col("seq_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val derived = StorageOps.exportPacked(spark, sf0001, 8, 512L)
      .select(col("shard"), col("doc_id"), col("source"),
        col("n_tok").cast("long"), col("seq_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(reread == derived, "written shards must equal the derivation")
    // greedy-packing invariant per shard: replay the cumsum in the
    // content-hash order and check every seq_id
    val order = StorageOps.exportPacked(spark, sf0001, 8, 512L)
      .join(Tables.documents(spark, sf0001).select(col("doc_id"),
        md5(col("text")).as("h")), "doc_id")
      .collect().groupBy(_.getAs[Long]("shard"))
    order.foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(r => (r.getAs[String]("h"), r.getAs[Long]("doc_id")))
        .foreach { r =>
          assert(r.getAs[Long]("seq_id") == cum / 512L, s"$r")
          cum += r.getAs[Int]("n_tok")
        }
    }
    // the export itself must shuffle exactly once (the shard window);
    // the partitioned write adds no exchange
    val plan = StorageOps.exportPacked(spark, sf0001, 8, 512L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"export plan must have exactly one exchange:\n$plan")
  }
}
