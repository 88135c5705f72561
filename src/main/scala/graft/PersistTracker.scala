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

  private val cache = scala.collection.mutable.Map
    .empty[(String, String), scala.collection.mutable.ListBuffer[DataFrame]]
  private val seenPlans = scala.collection.mutable.Map
    .empty[(String, String), scala.collection.mutable.HashSet[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]

  def tracked(module: String, df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = org.apache.spark.sql.graftbridge.GraftBridge
      .logicalPlan(p).canonicalized
    val key = (module, Tables.sessionKey(df.sparkSession))
    cache.synchronized {
      if (seenPlans.getOrElseUpdate(key,
          scala.collection.mutable.HashSet.empty).add(canon))
        cache.getOrElseUpdate(key,
          scala.collection.mutable.ListBuffer.empty) += p
    }
    p
  }

  /** Unpersist `module`'s tracked relations for this session. Only call
    * once no outstanding DataFrame still references them. */
  def release(module: String, s: SparkSession): Unit = cache.synchronized {
    val key = (module, Tables.sessionKey(s))
    cache.remove(key).foreach(_.foreach(_.unpersist()))
    seenPlans.remove(key)
    ()
  }
}
