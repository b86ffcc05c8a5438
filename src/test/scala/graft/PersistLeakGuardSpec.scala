package graft

import graft.queries.{PersistGuard, Shared}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The persist-hygiene machine check (VERDICT r3 #4): after a battery
  * query is consumed and the catalog cache cleared, nothing survives
  * beyond Shared's registered checkpoints — query-scoped checkpoint
  * blocks are swept, and a genuinely leaked block turns the harness red.
  */
class PersistLeakGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("representative battery queries leave no blocks behind the guard") {
    // plan-persist users, an iterative localCheckpoint user, and a
    // Shared consumer — the three hygiene classes on the battery
    for (q <- Seq("q_spearman", "q_dedup_clusters", "q_embed_neardup")) {
      SparkEntry.queries(q)(spark, sfDir).count()
      spark.catalog.clearCache()
      PersistGuard.assertClean(spark, s"spec query $q")
      assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(Shared.allowedRddIds(spark)), s"$q left non-Shared blocks")
    }
  }

  test("Shared checkpoints survive the sweep; disable() releases them") {
    Shared.enable()
    try {
      import spark.implicits._
      val df = Shared("guard-spec", spark, "guard-dir") {
        Seq(1, 2, 3).toDF("x")
      }
      assert(df.count() == 3)
      spark.catalog.clearCache()
      PersistGuard.assertClean(spark, "shared checkpoint")
      assert(Shared.allowedRddIds(spark).nonEmpty)
      assert(Shared.allowedRddIds(spark)
        .exists(spark.sparkContext.getPersistentRDDs.contains),
        "the Shared checkpoint must survive the sweep")
    } finally Shared.disable()
    // after disable the allow-list is gone; the next sweep unpersists
    // the now-unregistered checkpoint blocks
    PersistGuard.assertClean(spark, "post-disable")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("a raw rdd.persist() bypassing the catalog turns the guard red") {
    val leak = spark.sparkContext.range(0, 1000).setName("deliberate-leak")
    leak.persist(StorageLevel.MEMORY_ONLY)
    leak.count()
    spark.catalog.clearCache() // does NOT drop RDD-level persists
    try {
      val e = intercept[IllegalStateException](
        PersistGuard.assertClean(spark, "leaky query"))
      assert(e.getMessage.contains("deliberate-leak"))
    } finally leak.unpersist(blocking = true)
    PersistGuard.assertClean(spark, "after cleanup")
  }
}
