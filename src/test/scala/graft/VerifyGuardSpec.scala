package graft

import org.apache.spark.sql.functions._

/** The correctness gate's output-schema contract: the driver's pandas
  * canonicalization sorts RAW cell values, so any top-level array / map /
  * struct column crashes it ("unhashable type: numpy.ndarray" — round-6
  * q104). [[Verify.nonSortable]] is the guard that fails such a query
  * loudly inside Verify before the driver can trip on it.
  */
class VerifyGuardSpec extends TestSpark {

  test("nonSortable flags array, map and struct columns, names types") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
      .select(col("id"), col("s"),
        array(lit(1), lit(2)).as("arr"),
        map(lit("k"), lit(1)).as("m"),
        struct(lit(1).as("x")).as("st"))
    val bad = Verify.nonSortable(df.schema)
    assert(bad.size == 3, bad.mkString("; "))
    assert(bad.exists(_.startsWith("arr: array<")))
    assert(bad.exists(_.startsWith("m: map<")))
    assert(bad.exists(_.startsWith("st: struct<")))
  }

  test("nonSortable passes scalar-only schemas, including serialized arrays") {
    import spark.implicits._
    // the q104 fix shape: concat_ws-serialized arrays are plain strings
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
      .select(col("id"), concat_ws(",", col("xs")).as("xs"),
        lit(1.5).as("d"), lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).as("ts"))
    assert(Verify.nonSortable(df.schema).isEmpty)
  }

  test("every inventory query's FINAL projection is statically scalar where cheap to check") {
    // Full execution of the inventory belongs to the driver gate; here we
    // spot-pin the queries that exercise map/array semantics in-engine
    // (the family that regressed in round 6) plus every round-7 addition
    // — their analyzed schemas must be scalar-only without running a job.
    for (name <- Seq("q104_map_funcs", "q109_map_transform")) {
      val df = graft.operators.ExtendedQueries.queries(name)(spark, sf0001)
      assert(Verify.nonSortable(df.schema).isEmpty,
        s"$name emits driver-unsortable columns: ${Verify.nonSortable(df.schema)}")
    }
    for (name <- Seq("q110_kmv_distinct", "q112_kmv_per_lang",
        "q113_bpe_token_count", "q114_rolling_fingerprint")) {
      val df = graft.functions.TextQueries.queries(name)(spark, sf0001)
      assert(Verify.nonSortable(df.schema).isEmpty,
        s"$name emits driver-unsortable columns: ${Verify.nonSortable(df.schema)}")
    }
  }
}
