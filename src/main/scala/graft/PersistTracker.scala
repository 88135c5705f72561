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

  def tracked(module: String, df: DataFrame): DataFrame =
    trackedOwned(module, df)._1

  /** Like [[tracked]], but also reports whether THIS call registered the
    * plan. `false` means an equivalent plan is already tracked — an
    * outer caller persisted it first and still owns its lifetime, so an
    * early [[drop]] by this caller would yank a relation the owner is
    * about to consume (q240 registers the exact-audit relation around
    * its own aggregates; buildAuto's identical audit must not drop it
    * out from under them). */
  def trackedOwned(module: String, df: DataFrame): (DataFrame, Boolean) = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = org.apache.spark.sql.graftbridge.GraftBridge
      .logicalPlan(p).canonicalized
    val key = (module, Tables.sessionKey(df.sparkSession))
    val owned = cache.synchronized {
      val fresh = seenPlans.getOrElseUpdate(key,
        scala.collection.mutable.HashSet.empty).add(canon)
      if (fresh)
        cache.getOrElseUpdate(key,
          scala.collection.mutable.ListBuffer.empty) += p
      fresh
    }
    (p, owned)
  }

  /** Unpersist `module`'s tracked relations for this session. Only call
    * once no outstanding DataFrame still references them. */
  def release(module: String, s: SparkSession): Unit = cache.synchronized {
    val key = (module, Tables.sessionKey(s))
    cache.remove(key).foreach(_.foreach(_.unpersist()))
    seenPlans.remove(key)
    ()
  }

  /** Unpersist ONE tracked relation early (it is no longer needed this
    * session — e.g. a build stage superseded by a later stage) and
    * forget its plan, so a later re-track of the same plan re-persists
    * and re-registers cleanly instead of hitting the seen-plan dedupe
    * with a dead CacheManager entry (that combination is untracked: the
    * blanket [[release]] would never unpersist the re-persisted copy).
    * Unpersisting the same plan twice is harmless — `unpersist` is
    * idempotent. */
  def drop(module: String, df: DataFrame): Unit = {
    val canon = org.apache.spark.sql.graftbridge.GraftBridge
      .logicalPlan(df).canonicalized
    val key = (module, Tables.sessionKey(df.sparkSession))
    cache.synchronized {
      seenPlans.get(key).foreach(_.remove(canon))
      cache.get(key).foreach(_.filterInPlace { d =>
        org.apache.spark.sql.graftbridge.GraftBridge
          .logicalPlan(d).canonicalized != canon
      })
    }
    df.unpersist()
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
      cache.get((module, Tables.sessionKey(s))).map(_.toList).getOrElse(Nil)
    }
    dfs.map { df =>
      "\"" + org.apache.spark.sql.graftbridge.GraftBridge.cacheForensic(df) + "\""
    }.mkString("[", ",", "]")
  }
}
