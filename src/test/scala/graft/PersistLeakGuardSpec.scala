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

  test("scoped bracket: a library caller leaks nothing, no harness needed") {
    // the VERDICT r4 "what's wrong #2" scenario: a non-harness caller
    // invokes the query map directly — no clearCache, no assertClean —
    // and must end with ZERO residual cached blocks
    import spark.implicits._
    // a pre-existing caller-owned cache the bracket must NOT touch
    val own = Seq(1, 2, 3).toDF("x").persist()
    own.count()
    try {
      // a plan-persist user and an iterative localCheckpoint user
      for (q <- Seq("q_common_substring", "q_dedup_clusters")) {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val n = PersistGuard.scoped(spark) { s =>
          SparkEntry.queries(q)(s, sfDir).count()
        }
        assert(n >= 0)
        val after = spark.sparkContext.getPersistentRDDs.keySet
        assert((after -- before).isEmpty,
          s"$q left residual blocks via the scoped bracket: ${after -- before}")
      }
      assert(spark.sparkContext.getPersistentRDDs.keySet
        .exists(_ => true), "the caller's own cache must survive")
      assert(own.storageLevel.useMemory, "caller cache was unpersisted")
    } finally own.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "zero residual cached blocks after the caller releases its own")
  }

  test("scoped bracket releases blocks even when the body throws") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException](PersistGuard.scoped(spark) { s =>
      val df = SparkEntry.queries("q_common_substring")(s, sfDir)
      df.count()
      throw new RuntimeException("caller failure mid-consumption")
    })
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, "failure path must still release")
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
