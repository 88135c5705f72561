package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.SparkSession

/** Dev-only profiler for the MinHash pipeline stages (not part of the
  * driver contract). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("docShingles count")(Dedup.docShingles(spark, d).count())
    time("signatures count")(Dedup.minhashSignatures(spark, d).count())
    time("signatures count (2nd)")(Dedup.minhashSignatures(spark, d).count())
    time("candidates count")(Dedup.minhashCandidates(spark, d).count())
    time("full q27")(Dedup.queries("q27_dedup_minhash")(spark, d).count())
    spark.stop()
  }
}
