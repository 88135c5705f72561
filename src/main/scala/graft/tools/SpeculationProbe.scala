package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Straggler/speculation exercise (SURVEY §2.1 E12; the reference's
  * early_exit/mtiming straggler probes put a multi-second sleep in one
  * task — reference: src/mrapps/early_exit.go:32-40). `spark.speculation`
  * is a SparkContext-startup config, so this runs as its own JVM (spawned
  * by BehavioralSpec) rather than inside the shared test session.
  *
  * Asserts that with one deliberately slow task among fast ones the
  * speculation scheduler actually SUBMITS a speculative attempt
  * (SparkListenerSpeculativeTaskSubmitted). In single-executor local mode
  * the duplicate attempt may not be schedulable on a distinct host, so
  * submission — the scheduler decision — is the portable signal; any
  * speculative task starts are reported too.
  *
  * Exits 0 on success, 1 on failure; prints one parseable line.
  */
object SpeculationProbe {
  def main(args: Array[String]): Unit = {
    // Speculation is disabled outright in local[N] mode (TaskSchedulerImpl
    // only starts the speculation thread on a cluster), so run a REAL
    // 2-executor standalone mini-cluster: local-cluster spawns in-process
    // Master/Workers that fork actual executor JVMs via SPARK_HOME, and
    // the speculative copy can land on the other executor.
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-speculation-probe")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "50ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.memory", "1g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val submitted = new AtomicInteger(0)
    val speculativeStarts = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onSpeculativeTaskSubmitted(
          e: SparkListenerSpeculativeTaskSubmitted): Unit = {
        submitted.incrementAndGet(); ()
      }
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        if (t.taskInfo.speculative) speculativeStarts.incrementAndGet(); ()
      }
    })
    // 8 tasks: seven finish in ~0.2 s, one straggles 8 s — the reference's
    // early_exit sleep shape. The result must be correct regardless of
    // whether the original or a speculative copy commits.
    val sum = spark.sparkContext.parallelize(1 to 8, 8).map { i =>
      Thread.sleep(if (i == 1) 8000 else 200)
      i
    }.sum()
    Thread.sleep(1000) // listener bus drain
    val ok = submitted.get() >= 1 && sum == 36.0
    println(s"SPECULATION_PROBE submitted=${submitted.get()} " +
      s"speculativeStarts=${speculativeStarts.get()} sum=$sum " +
      (if (ok) "PASS" else "FAIL"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
