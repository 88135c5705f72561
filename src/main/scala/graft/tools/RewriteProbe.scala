package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: print the optimized plan of the window-top-k idiom to see
  * the exact node structure TopKWindowRewrite must match. */
object RewriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKRewrite.enable(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== PHYSICAL ===")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
