package graft

import org.apache.spark.sql.SparkSession

/** The ONE gate for temporary session-conf mutation (round-16 advisory):
  * a handful of stream-driving builders shrink
  * `spark.sql.shuffle.partitions` around a foreachBatch drive (32-way
  * state-store shuffles cost more in per-batch task overhead than they
  * save on these micro-batch volumes) and restore it after. That
  * mutate→drive→restore window is ONLY safe when nothing else is
  * planning queries on the same session — a concurrently planned batch
  * query would silently pick up the streaming partition count.
  *
  * Verify's parallel drive used to guarantee that by NAME ("stream" in
  * the query name, plus a hand-list) — a convention a future
  * conf-mutating query could silently bypass. This helper enforces it
  * at the mutation site instead: every shuffle-partition override in
  * the library routes through [[withShufflePartitions]], which
  *  (a) serializes all mutators behind one JVM-global lock, and
  *  (b) REFUSES (fails loudly — in Verify that surfaces as the query's
  *      own sentinel failure, not a silent neighbor corruption) when
  *      any parallel-phase query is in flight, i.e. when the caller
  *      escaped the serial phase.
  * Harnesses that fan out query execution bracket each parallel task
  * with [[enterParallel]]/[[exitParallel]]; single-threaded callers
  * (Bench, tests, tools) never see the guard fire.
  */
object ConfGuard {

  private val parallelInFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Bracket a query run that executes CONCURRENTLY with others on the
    * same session (Verify's parallel phase). */
  def enterParallel(): Unit = { parallelInFlight.incrementAndGet(); () }
  def exitParallel(): Unit = { parallelInFlight.decrementAndGet(); () }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`,
    * restoring the previous value after — the only sanctioned way to
    * mutate session conf mid-query. Throws if any parallel-phase query
    * is in flight (see object doc). */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T =
    synchronized {
      val inFlight = parallelInFlight.get()
      require(inFlight == 0,
        s"session-conf mutation (shuffle.partitions -> $n) attempted while " +
          s"$inFlight parallel-phase quer(ies) are in flight — a " +
          "conf-mutating query must run in the drive's SERIAL phase " +
          "(name it '*stream*' or add it to Verify's serialNames)")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }
}
