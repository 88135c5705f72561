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
  * (Bench, tests, tools) never see the guard fire. The guard is
  * BIDIRECTIONAL (round-17 advisory): [[withShufflePartitions]]
  * refuses while parallel queries are in flight, and [[enterParallel]]
  * refuses while a mutation window is open — previously the second
  * direction rested on harness phase ordering alone.
  *
  * THREADING CONTRACT: the JVM-global monitor is held across the whole
  * guarded body — including `q.awaitTermination()` in the stream
  * drives. A guarded body must therefore NEVER re-enter ConfGuard from
  * a DIFFERENT thread it blocks on (in particular: a foreachBatch
  * callback runs on a streaming thread — if it routed through a
  * guarded helper it would block on the monitor the driving thread
  * holds while that thread awaits the stream: deadlock). Re-entry on
  * the SAME thread is safe (the monitor is reentrant). All current
  * foreachBatch bodies call unguarded helpers; keep it that way.
  */
object ConfGuard {

  private val parallelInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val mutationsInFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Bracket a query run that executes CONCURRENTLY with others on the
    * same session (Verify's parallel phase). Throws if a session-conf
    * mutation window is currently open — a parallel-phase query
    * starting mid-mutation would silently plan with the mutated conf
    * (round-17 advisory: the reverse direction of the
    * [[withShufflePartitions]] guard). */
  def enterParallel(): Unit = {
    val muts = mutationsInFlight.get()
    require(muts == 0,
      s"parallel-phase query entered while $muts session-conf mutation " +
        "window(s) are open — the serial (stream) phase must fully drain " +
        "before the parallel phase starts")
    parallelInFlight.incrementAndGet()
    ()
  }
  def exitParallel(): Unit = { parallelInFlight.decrementAndGet(); () }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`,
    * restoring the previous value after — the only sanctioned way to
    * mutate session conf mid-query. Throws if any parallel-phase query
    * is in flight (see object doc; and see the THREADING CONTRACT —
    * never re-enter from a thread the body blocks on). */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T =
    synchronized {
      val inFlight = parallelInFlight.get()
      require(inFlight == 0,
        s"session-conf mutation (shuffle.partitions -> $n) attempted while " +
          s"$inFlight parallel-phase quer(ies) are in flight — a " +
          "conf-mutating query must run in the drive's SERIAL phase " +
          "(name it '*stream*' or add it to Verify's serialNames)")
      mutationsInFlight.incrementAndGet()
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body
      finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        mutationsInFlight.decrementAndGet()
      }
    }
}
