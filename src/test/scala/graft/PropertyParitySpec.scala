package graft

import graft.core.{KeyValue, MRApp, MapReduceJob, SequentialOracle}

/** Randomized parity (SURVEY.md §5.3.3): for random corpora and
  * order-insensitive reducers, the distributed engine must equal the
  * sequential oracle — the generalization of test-mr.sh's golden diff.
  * Seeded generation keeps every trial reproducible.
  */
class PropertyParitySpec extends TestSpark {

  private def randomCorpus(seed: Long): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until 6).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
      (s"doc$i", words.mkString(" "))
    }
  }

  import PropertyParitySpec.apps

  test("distributed == oracle for random corpora across reducer shapes") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val docs = randomCorpus(seed)
      val input = spark.createDataset(docs)
      apps.foreach { app =>
        val dist = MapReduceJob.runOnRows(spark, input, app, numReduce = 5)
          .collect().map(kv => kv.key -> kv.value).sorted.toSeq
        val oracle = SequentialOracle.run(app, docs)
          .map(kv => kv.key -> kv.value).sorted
        assert(dist == oracle, s"seed=$seed app=${app.name}")
      }
    }
  }
}

/** Top-level (no $outer capture — the spec class isn't serializable). */
object PropertyParitySpec {
  // Order-insensitive reducers (reference reducers sort their values when
  // order matters — indexer.go:37, crash.go:50):
  case class GenApp(name: String, reducef: (String, Seq[String]) => String)
      extends MRApp {
    def map(file: String, contents: String): Seq[KeyValue] =
      contents.split(" ").toIndexedSeq.filter(_.nonEmpty).map(w => KeyValue(w, file))
    def reduce(key: String, values: Seq[String]): String = reducef(key, values)
  }

  val apps: Seq[GenApp] = Seq(
    GenApp("count", (_, vs) => vs.length.toString),
    GenApp("sorted-join", (_, vs) => vs.sorted.mkString(",")),
    GenApp("distinct-count", (_, vs) => vs.distinct.length.toString),
    GenApp("min-max", (_, vs) => s"${vs.min}/${vs.max}"))
}
