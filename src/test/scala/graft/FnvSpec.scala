package graft

import graft.functions.Fnv1a
import org.apache.spark.sql.functions.col

/** The custom codegen'd FNV-1a expression must match the published FNV-1a
  * 32-bit test vectors (masked by 0x7fffffff as the reference does —
  * src/mr/worker.go:26-30) and agree between interpreted and codegen paths.
  */
class FnvSpec extends TestSpark {

  // Published FNV-1a 32-bit vectors, sign-bit-masked.
  private val vectors = Seq(
    "" -> (0x811c9dc5 & 0x7fffffff),
    "a" -> (0xe40c292c & 0x7fffffff),
    "foobar" -> (0xbf9cf968 & 0x7fffffff))

  test("scala implementation matches FNV-1a test vectors") {
    vectors.foreach { case (s, expected) =>
      assert(Fnv1a.hash(s.getBytes("UTF-8")) == expected, s"fnv1a($s)")
    }
  }

  test("catalyst expression (codegen path) matches the scala implementation") {
    import spark.implicits._
    val words = Seq("", "a", "foobar", "hello", "wörld", "部分").toDF("w")
    val rows = words.select(col("w"), Fnv1a.fnv1a(col("w")).as("h")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == Fnv1a.hash(r.getString(0).getBytes("UTF-8")))
    }
  }

  test("bucket routing: fnv1a(key) % 10 spreads the wc keyspace") {
    import spark.implicits._
    val buckets = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), "[^\\p{L}]+")).as("w"))
      .filter(col("w") =!= "")
      .select((Fnv1a.fnv1a(col("w")) % 10).as("b"))
      .distinct().as[Int].collect().toSet
    assert(buckets.size >= 8, s"fnv buckets unexpectedly skewed: $buckets")
  }
}
