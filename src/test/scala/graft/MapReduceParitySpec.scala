package graft

import graft.apps.RefApps
import graft.core.{MapReduceJob, SequentialOracle}

/** Golden-diff parity against the sequential oracle, the direct analogue
  * of the reference's test harness (src/main/test-mr.sh:66-129: run
  * mrsequential, run distributed, compare sorted outputs).
  * Inputs are the reference's own eight Project Gutenberg fixtures.
  */
class MapReduceParitySpec extends TestSpark {

  private val pgGlob = "/root/reference/src/main/pg-*.txt"
  private lazy val pgFiles = {
    val dir = new java.io.File("/root/reference/src/main")
    dir.listFiles().filter(_.getName.matches("pg-.*\\.txt")).map(_.getPath).sorted.toSeq
  }

  /** Sorted "key value" lines — what test-mr.sh compares after
    * `sort mr-out* | grep .` (src/main/test-mr.sh:90). */
  private def sortedLines(kvs: Seq[graft.core.KeyValue]): Seq[String] =
    kvs.map(kv => s"${kv.key} ${kv.value}").sorted

  private def distributed(app: graft.core.MRApp): Seq[graft.core.KeyValue] =
    MapReduceJob.run(spark, pgGlob, app, numReduce = 10).collect().toSeq

  test("pg fixtures are present") {
    assert(pgFiles.size == 8, s"expected 8 pg files, found ${pgFiles.size}")
  }

  test("wc: distributed output matches sequential oracle (test-mr.sh wc test)") {
    val oracle = SequentialOracle.runOnFiles(RefApps.WordCount, pgFiles)
    val dist = distributed(RefApps.WordCount)
    assert(sortedLines(dist) == sortedLines(oracle))
    // regression anchor: letter-run tokens on the 8 pg books (more than
    // FIXTURES.md's 608,645 `wc -w` whitespace words — "don't" is 2 tokens)
    assert(oracle.map(_.value.toLong).sum == 623948L)
  }

  test("indexer: distributed output matches sequential oracle (test-mr.sh indexer test)") {
    // file_name differs between paths (file:// URI vs plain path) — the
    // reference compares on basename-stable fixtures; normalize to basename
    // via an app wrapper so both paths emit identical doc names.
    object IndexerByBasename extends graft.core.MRApp {
      def map(f: String, c: String): Seq[graft.core.KeyValue] =
        RefApps.Indexer.map(f.substring(f.lastIndexOf('/') + 1), c)
      def reduce(k: String, vs: Seq[String]): String = RefApps.Indexer.reduce(k, vs)
    }
    val oracle = SequentialOracle.runOnFiles(IndexerByBasename, pgFiles)
    val dist = distributed(IndexerByBasename)
    assert(sortedLines(dist) == sortedLines(oracle))
  }

  test("per-file count (early_exit data shape): one count per input file") {
    object PerFileByBasename extends graft.core.MRApp {
      def map(f: String, c: String): Seq[graft.core.KeyValue] =
        RefApps.PerFileCount.map(f.substring(f.lastIndexOf('/') + 1), c)
      def reduce(k: String, vs: Seq[String]): String = RefApps.PerFileCount.reduce(k, vs)
    }
    val dist = distributed(PerFileByBasename)
    assert(dist.size == 8 && dist.forall(_.value == "1"))
  }

  test("crash-shape app: matches oracle (nocrash golden twin semantics)") {
    object CrashByBasename extends graft.core.MRApp {
      def map(f: String, c: String): Seq[graft.core.KeyValue] =
        RefApps.CrashShape.map(f.substring(f.lastIndexOf('/') + 1), c)
      def reduce(k: String, vs: Seq[String]): String = RefApps.CrashShape.reduce(k, vs)
    }
    val oracle = SequentialOracle.runOnFiles(CrashByBasename, pgFiles)
    val dist = distributed(CrashByBasename)
    assert(sortedLines(dist) == sortedLines(oracle))
  }

  test("ten-keys app (rtiming shape): every key counted M times") {
    val dist = distributed(RefApps.TenKeys)
    assert(dist.map(_.key).sorted == ('a' to 'j').map(_.toString))
    assert(dist.forall(_.value == "8")) // 8 input files
  }

  test("wc DataFrame twin agrees with MRApp path on the same corpus") {
    import spark.implicits._
    val docs = spark.read.option("wholetext", true).text(pgGlob)
      .select(org.apache.spark.sql.functions.col("value").as("text"))
    val dfCounts = RefApps.wordCountDF(docs, "text")
      .as[(String, Long)].collect().toMap
    val oracle = SequentialOracle.runOnFiles(RefApps.WordCount, pgFiles)
      .map(kv => kv.key -> kv.value.toLong).toMap
    assert(dfCounts == oracle)
  }

  test("text sink: written part files sorted-compare to the oracle (test-mr.sh:90)") {
    // The reference's harness compares ACTUAL output files after
    // `sort mr-out* | grep .` (reference: src/main/test-mr.sh:90) — do the
    // same at file level: run distributed, writeText, read the part files
    // back as plain text, and sorted-diff against the sequential oracle.
    val outDir = java.nio.file.Files.createTempDirectory("graft_mrout").toString
    try {
      val result = MapReduceJob.run(spark, pgGlob, RefApps.WordCount, numReduce = 10)
      MapReduceJob.writeText(result, outDir)
      val partFiles = new java.io.File(outDir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      assert(partFiles.nonEmpty, s"no part files written to $outDir")
      val written = partFiles.flatMap { f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      }.toSeq.sorted
      val oracle = sortedLines(SequentialOracle.runOnFiles(RefApps.WordCount, pgFiles))
      assert(written == oracle, {
        val diff = written.diff(oracle) ++ oracle.diff(written)
        s"file-level output differs from oracle; first diffs: ${diff.take(5)}"
      })
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    }
  }

  test("values order within a key is reducer-sorted, not shuffle-dependent") {
    // CrashShape.reduce sorts its values (as the reference's order-sensitive
    // reducers do — indexer.go:37, crash.go:50); two runs must agree.
    val r1 = distributed(RefApps.CrashShape)
    val r2 = distributed(RefApps.CrashShape)
    assert(sortedLines(r1) == sortedLines(r2))
  }
}
