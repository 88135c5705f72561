package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted-relation tracker shared by the operator
  * modules (Dedup / TextQueries / Multimodal / SignatureStore): persists
  * a relation MEMORY_AND_DISK, remembers ONE entry per distinct
  * canonicalized plan per (module, session) — Spark's CacheManager
  * dedupes equivalent plans, but without the plan-keyed dedupe here,
  * repeated invocations in a long-lived session (Bench min-of-3, full
  * Verify sweeps) would grow the tracking list without bound and pin
  * plan objects (round-9 advisor finding, generalized from Dedup to
  * every module in round 10) — and unpersists them all at [[release]]
  * (test/app teardown, or between corpus versions). Modules keep their
  * own namespace so one module's release cannot drop another's live
  * relations.
  */
private[graft] object PersistTracker {

  // one entry per distinct canonicalized plan per (module, session),
  // REFCOUNTED (round-17 advisory): a drop() racing a concurrent
  // tracked() of the identical plan (q240's audit relation vs
  // buildAuto's — same canonical plan, registered from different
  // threads in Verify's parallel phase) used to dedupe the later
  // tracked() against the entry drop() was about to remove, leaving
  // the surviving consumer's relation silently uncached AND untracked.
  // With a per-plan refcount held under the same lock, the late
  // tracked() bumps the count and drop() only unpersists at zero.
  private final class Entry(val df: DataFrame) { var refs: Int = 1 }
  private val cache = scala.collection.mutable.Map
    .empty[(String, String), scala.collection.mutable.LinkedHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Entry]]

  def tracked(module: String, df: DataFrame): DataFrame =
    trackedOwned(module, df)._1

  /** Like [[tracked]], but also reports whether THIS call created the
    * plan's FIRST live registration. `false` means an equivalent plan
    * is already tracked — an outer caller persisted it first and still
    * owns its lifetime (q240 registers the exact-audit relation around
    * its own aggregates; buildAuto's identical audit must not drop it
    * out from under them). Either way this call holds one reference;
    * a caller that got `true` may [[drop]] when done. */
  def trackedOwned(module: String, df: DataFrame): (DataFrame, Boolean) = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = org.apache.spark.sql.graftbridge.GraftBridge
      .logicalPlan(p).canonicalized
    val key = (module, Tables.sessionKey(df.sparkSession))
    val owned = cache.synchronized {
      val entries = cache.getOrElseUpdate(key,
        scala.collection.mutable.LinkedHashMap.empty)
      entries.get(canon) match {
        case Some(e) => e.refs += 1; false
        case None => entries(canon) = new Entry(p); true
      }
    }
    (p, owned)
  }

  /** Unpersist `module`'s tracked relations for this session
    * unconditionally (test/app teardown, or between corpus versions).
    * Only call once no outstanding DataFrame still references them. */
  def release(module: String, s: SparkSession): Unit = {
    val key = (module, Tables.sessionKey(s))
    val dropped = cache.synchronized { cache.remove(key) }
    dropped.foreach(_.values.foreach(_.df.unpersist()))
    ()
  }

  /** Release ONE reference to a tracked relation (it is no longer
    * needed by this caller — e.g. a build stage superseded by a later
    * stage). The relation unpersists and its plan is forgotten only
    * when the LAST reference drops — a concurrent consumer that
    * [[tracked]] the same plan keeps it alive (round-17 advisory). A
    * fully dropped plan re-persists and re-registers cleanly on a
    * later re-track. Dropping an untracked relation just unpersists it
    * (idempotent, harmless). */
  def drop(module: String, df: DataFrame): Unit = {
    val canon = org.apache.spark.sql.graftbridge.GraftBridge
      .logicalPlan(df).canonicalized
    val key = (module, Tables.sessionKey(df.sparkSession))
    val unpersistNow = cache.synchronized {
      cache.get(key) match {
        case None => true
        case Some(entries) => entries.get(canon) match {
          case None => true
          case Some(e) =>
            e.refs -= 1
            if (e.refs <= 0) { entries.remove(canon); true } else false
        }
      }
    }
    if (unpersistNow) df.unpersist()
    ()
  }

  /** Persist-state dump of `module`'s tracked relations (round-16
    * verdict task #1 forensics): one entry per tracked DataFrame with
    * its cached RDD id, current storage level, and live block count —
    * the signature of the stripped-blocks-but-live-handle state is
    * `level=None cached_parts=0/N` on a relation a consumer is about to
    * reuse. JSON-array string, safe to embed in bench artifacts. */
  def forensic(module: String, s: SparkSession): String = {
    val dfs = cache.synchronized {
      cache.get((module, Tables.sessionKey(s)))
        .map(_.values.map(_.df).toList).getOrElse(Nil)
    }
    dfs.map { df =>
      "\"" + org.apache.spark.sql.graftbridge.GraftBridge.cacheForensic(df) + "\""
    }.mkString("[", ",", "]")
  }
}
