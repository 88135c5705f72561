package graft

import graft.apps.RefApps
import graft.core.MapReduceJob
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import java.util.concurrent.atomic.AtomicInteger

/** Behavioral analogs of the reference's probe apps (SURVEY.md §2.2
  * A4-A6), asserted via SparkListener instead of marker files:
  *  - jobcount (mrapps/jobcount.go): no duplicate task execution when
  *    nothing fails — every task runs exactly once;
  *  - mtiming/rtiming (mrapps/mtiming.go, rtiming.go): ≥2 tasks actually
  *    run concurrently on a multi-core master.
  */
class BehavioralSpec extends TestSpark {

  private class ProbeListener extends SparkListener {
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    val live = new AtomicInteger(0)
    @volatile var maxLive = 0
    override def onTaskStart(t: SparkListenerTaskStart): Unit = {
      val n = live.incrementAndGet()
      maxLive = math.max(maxLive, n)
      attempts
        .computeIfAbsent(s"${t.stageId}-${t.taskInfo.index}", _ => new AtomicInteger)
        .incrementAndGet()
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { live.decrementAndGet(); () }
  }

  /** The listener bus delivers asynchronously (and its waitUntilEmpty is
    * private[spark]) — poll until the task-start/end counts go quiet. */
  private def waitForListener(probe: ProbeListener): Unit = {
    var last = -1
    var stable = 0
    while (stable < 3) {
      val now = probe.attempts.size() * 1000 + probe.live.get()
      if (now == last) stable += 1 else { stable = 0; last = now }
      Thread.sleep(200)
    }
  }

  test("no duplicate task execution without failures (jobcount analog)") {
    val probe = new ProbeListener
    spark.sparkContext.addSparkListener(probe)
    try {
      MapReduceJob.run(spark, "/root/reference/src/main/pg-*.txt",
        RefApps.WordCount, numReduce = 10).collect()
      waitForListener(probe)
      val dupes = probe.attempts.entrySet().toArray.collect {
        case e: java.util.Map.Entry[_, _]
          if e.getValue.asInstanceOf[AtomicInteger].get() > 1 => e.getKey
      }
      assert(dupes.isEmpty, s"tasks executed more than once: ${dupes.mkString(",")}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("tasks run concurrently on local[4] (mtiming/rtiming analog)") {
    val probe = new ProbeListener
    spark.sparkContext.addSparkListener(probe)
    try {
      MapReduceJob.run(spark, "/root/reference/src/main/pg-*.txt",
        RefApps.WordCount, numReduce = 10).collect()
      waitForListener(probe)
      assert(probe.maxLive >= 2,
        s"expected >=2 concurrent tasks, saw max ${probe.maxLive}")
    } finally spark.sparkContext.removeSparkListener(probe)
  }

  test("job completes under an injected task failure (crash-recovery analog)") {
    // The reference's crash test (test-mr.sh:271-317): closures die,
    // engine must still produce the golden output. The session runs
    // local[4,2] (maxTaskFailures=2), so one injected crash per job is
    // retried — the Spark equivalent of the coordinator's 10 s
    // watchdog-requeue (reference: src/mr/coordinator.go:114-141).
    BehavioralSpec.crashOnce.set(true)
    import spark.implicits._
    val input = spark.createDataset(Seq(("f1", "a b c"), ("f2", "b c d")))
    object FlakyApp extends graft.core.MRApp {
      def map(f: String, c: String): Seq[graft.core.KeyValue] = {
        if (BehavioralSpec.crashOnce.compareAndSet(true, false))
          throw new RuntimeException("injected crash (reference crash.go analog)")
        c.split(" ").toIndexedSeq.map(w => graft.core.KeyValue(w, "1"))
      }
      def reduce(k: String, vs: Seq[String]): String = vs.length.toString
    }
    val out = MapReduceJob.runOnRows(spark, input, FlakyApp, 4)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(out == Map("a" -> "1", "b" -> "2", "c" -> "2", "d" -> "1"))
  }
}

object BehavioralSpec {
  val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
}
