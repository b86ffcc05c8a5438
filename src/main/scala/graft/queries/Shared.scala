package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in shared materialization of expensive battery intermediates.
  *
  * Several battery queries are independent consumers of the same
  * expensive-but-small intermediate tables (`lshPairDists` feeds the
  * graph family, `probeScores` feeds the probe trio). A single `Verify`
  * or benchmark run that executes many of them recomputes the shared
  * prefix once per consumer. With sharing enabled, the FIRST consumer
  * eagerly `localCheckpoint`s the intermediate — RDD blocks, which
  * survive `spark.catalog.clearCache()` (the per-query cache hygiene
  * `Verify` applies) — and later consumers reuse the materialized rows.
  *
  * Disabled by default so every query stays a self-contained
  * `(SparkSession, dir) => DataFrame` (specs, ad-hoc use, and plan
  * audits see the full plan). Only intermediates whose VALUES are
  * deterministic may be registered here — all battery intermediates are
  * (the oracle contract demands it) — so enabling the cache can never
  * change a result, only skip recomputation; `SharedIntermediatesSpec`
  * pins hash-equality of a cached vs uncached run.
  *
  * Scale note: this is a session-local optimization for many-query
  * batches over one corpus snapshot. The 100 TB analog is writing the
  * intermediate to a table and reading it back per consumer — same
  * decision, durable medium; the `Bm25IndexTables`/`VectorIndex`
  * modules are that path for the retrieval intermediates.
  */
object Shared {

  // Persist-hygiene contract for the battery at large: builders may
  // `persist()` PLAN-SCOPED intermediates (frames the returned lazy plan
  // still references — unpersisting those before returning would disable
  // the cache exactly when it pays); every battery harness (`Verify`,
  // `Bench`, `QueryProfile`) calls `spark.catalog.clearCache()` after
  // consuming each query, so plan-scoped blocks never accumulate across
  // a run. CONSTRUCTION-SCOPED persists (consumed only by driver actions
  // while building the result, e.g. `qBoruvkaMst`) unpersist before
  // returning.
  @volatile private var on = false
  // weakly keyed by the SESSION OBJECT itself: no identity-hash reuse
  // can alias a stale checkpoint into a new session, and a collected
  // session's entries vanish with it
  private val cache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()
  // persistent-RDD ids created by this object's localCheckpoints (plus
  // any plan-scoped persists made while building them): the allow-list
  // `PersistGuard.sweep` exempts from per-query cleanup. Ids are never
  // reused by Spark, so a stale entry can't mask a later leak.
  private val allowed = new java.util.WeakHashMap[SparkSession,
    scala.collection.mutable.Set[Int]]()

  def enable(): Unit = on = true

  def disable(): Unit = {
    on = false
    // dropping the id allow-list too: any still-persisted checkpoint
    // block is then swept (unpersisted) by the next PersistGuard pass
    cache.synchronized { cache.clear(); allowed.clear() }
  }

  def enabled: Boolean = on

  /** Persistent-RDD ids registered for `s` by this cache. */
  def allowedRddIds(s: SparkSession): Set[Int] = cache.synchronized {
    Option(allowed.get(s)).map(_.toSet).getOrElse(Set.empty)
  }

  /** Return `build`, or (when enabled) a per-(session, dir) eagerly
    * checkpointed materialization of it, computed at most once.
    */
  def apply(name: String, s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    if (!on) build
    else {
      val per = cache.synchronized {
        var m = cache.get(s)
        if (m == null) {
          m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
          cache.put(s, m)
        }
        m
      }
      per.getOrElseUpdate((dir, name), {
        val sc = s.sparkContext
        val pre = sc.getPersistentRDDs.keySet
        val df = build.localCheckpoint(true)
        val post = sc.getPersistentRDDs.keySet
        cache.synchronized {
          var ids = allowed.get(s)
          if (ids == null) { ids = scala.collection.mutable.Set.empty[Int]; allowed.put(s, ids) }
          (post -- pre).foreach(ids += _)
        }
        df
      })
    }
}
