package graft.queries

import org.apache.spark.sql.SparkSession

/** Machine check for the persist-hygiene contract documented on
  * [[Shared]]: after a battery harness consumes a query and calls
  * `spark.catalog.clearCache()`, the only storage blocks still alive
  * must be (a) `Shared`'s registered checkpoints or (b) the query's own
  * `localCheckpoint` blocks (iterative plans — distributed connected
  * components, label propagation — MUST checkpoint per round to bound
  * plan growth, and the returned frame references the final checkpoint,
  * so they cannot unpersist it before returning).
  *
  * `sweep` unpersists class (b) — bounded, per-query cleanup that keeps
  * a long-running caller's footprint flat (the 100 TB analog: a
  * many-query service over one session) — and REPORTS anything else:
  * a raw `rdd.persist()` that bypasses the catalog survives
  * `clearCache` forever and is a genuine leak. Verify, Bench, and
  * QueryProfile fail hard on a non-empty report, so a future query
  * that leaks a cached block turns the battery red
  * (`PersistLeakGuardSpec`).
  */
object PersistGuard {

  /** Sweep after `clearCache()`: unpersist query-scoped checkpoint
    * blocks, return descriptions of genuine leaks (empty = clean).
    */
  def sweep(s: SparkSession): Seq[String] = {
    val sharedIds = Shared.allowedRddIds(s)
    val leaked = Seq.newBuilder[String]
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!sharedIds.contains(id)) {
        // isCheckpointed is true for MATERIALIZED local checkpoints too
        // (all battery checkpoints are eager) — the public API needed here
        if (rdd.isCheckpointed)
          rdd.unpersist(blocking = false)
        else
          leaked += s"RDD $id [${rdd.name}] storage=${rdd.getStorageLevel.description}"
      }
    }
    leaked.result()
  }

  /** `sweep` + hard failure, the harness-facing form. */
  def assertClean(s: SparkSession, context: String): Unit = {
    val leaks = sweep(s)
    if (leaks.nonEmpty)
      throw new IllegalStateException(
        s"persist leak after $context (blocks surviving clearCache that are " +
          s"neither Shared checkpoints nor local checkpoints): ${leaks.mkString("; ")}")
  }
}
