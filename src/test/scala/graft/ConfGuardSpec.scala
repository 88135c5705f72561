package graft

class ConfGuardSpec extends TestSpark {

  test("withShufflePartitions sets, runs, and restores — even on throw") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val seen = ConfGuard.withShufflePartitions(spark, 3) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(seen == "3")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
    intercept[RuntimeException] {
      ConfGuard.withShufflePartitions(spark, 3) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "the override must restore on the exception path")
  }

  test("mutation is refused while parallel-phase queries are in flight") {
    // the round-16 advisory's race, made loud: a conf-mutating query
    // that escapes Verify's serial phase must fail at the mutation site
    // (its own sentinel row) instead of silently re-planning neighbors
    ConfGuard.enterParallel()
    try {
      val e = intercept[IllegalArgumentException] {
        ConfGuard.withShufflePartitions(spark, 8) {
          fail("the body must never run under an active parallel phase")
        }
      }
      assert(e.getMessage.contains("SERIAL phase"),
        s"guard message must route the author to the fix: ${e.getMessage}")
    } finally ConfGuard.exitParallel()
    // and once the parallel phase drains, the same mutation proceeds
    val ok = ConfGuard.withShufflePartitions(spark, 8) { 42 }
    assert(ok == 42)
  }
}
