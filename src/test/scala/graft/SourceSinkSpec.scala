package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format coverage: every built-in columnar/text format the
  * engine exposes must roundtrip values losslessly (the reference's only
  * sink is flat text, mr/worker.go:131-152 — covered by the MapReduce
  * parity suite; these cover the lakehouse formats). Avro is not bundled
  * in this Spark distribution (no spark-avro module jar) and is
  * deliberately out of scope.
  */
class SourceSinkSpec extends TestSpark {

  private def roundtrip(df: DataFrame, format: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_rt_$format").toString
    df.write.mode("overwrite").options(opts).format(format).save(dir)
    val r = spark.read.options(opts).schema(df.schema).format(format).load(dir)
    r
  }

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.mkString("|")).sorted

  test("orders roundtrips losslessly through csv, json, and orc") {
    val o = Tables.orders(spark, sf0001)
    val expected = sortedRows(o)
    for (fmt <- Seq("csv", "json", "orc")) {
      val opts = if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String]
      val back = roundtrip(o, fmt, opts)
      assert(back.schema == o.schema, s"$fmt schema drift")
      assert(sortedRows(back).sameElements(expected), s"$fmt value drift")
    }
  }

  test("documents text column with regex-hostile content survives csv quoting") {
    // CSV is the adversarial format for free text (delimiters, quotes,
    // newlines). Append hostile characters and require exact roundtrip.
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        concat(col("text"), lit(" tricky,\"quoted\" | EOL")).as("text"))
    val back = roundtrip(docs, "csv",
      Map("header" -> "true", "multiLine" -> "true", "escape" -> "\""))
    assert(sortedRows(back).sameElements(sortedRows(docs)))
  }

  test("compressed sinks roundtrip (gzip json, snappy orc)") {
    val o = Tables.orders(spark, sf0001).limit(500)
    val expected = sortedRows(o)
    assert(sortedRows(roundtrip(o, "json", Map("compression" -> "gzip")))
      .sameElements(expected))
    assert(sortedRows(roundtrip(o, "orc", Map("compression" -> "snappy")))
      .sameElements(expected))
  }
}
