package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: pairwise SimHash Hamming distances for given doc ids —
  * used to calibrate q28's candidate threshold. Not part of the library
  * runtime. Usage: runMain graft.tools.SimhashProbe <sfDir> <id1,id2,...> */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ids = args(1).split(",").map(_.toLong)
    val sigs = graft.functions.Dedup.simhashSigs(spark, args(0))
      .filter(col("doc_id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- ids; b <- ids if a < b) {
      val h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      val bands = (0 until 4).count(j =>
        ((sigs(a) >>> (j * 16)) & 0xFFFFL) == ((sigs(b) >>> (j * 16)) & 0xFFFFL))
      println(s"pair ($a,$b): hamming=$h sharedBands=$bands")
    }
    spark.stop()
  }
}
