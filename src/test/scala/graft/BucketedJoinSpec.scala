package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Substantiates the SURVEY's bucketing claim with a real co-located
  * join: two tables bucketed on the join key by the same bucket count
  * must sort-merge-join with NO Exchange on either side — the shape
  * that turns a repeated 100 TB fact-fact join from two full shuffles
  * into zero. Also pins that the bucketed join returns exactly the
  * plain join's rows.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def withSmjOnly[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketed tables join with zero exchanges and identical rows") {
    val docs = queries.Tables.t(spark, dir, "documents")
    val left = docs.select(col("doc_id"), col("n_chars"))
    val right = docs.select(col("doc_id"), col("lang"))

    val base = Files.createTempDirectory("graft_bucketed").toString
    Seq("bj_left" -> left, "bj_right" -> right).foreach { case (name, df) =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.option("path", s"$base/$name")
        .bucketBy(8, "doc_id").sortBy("doc_id").format("parquet")
        .saveAsTable(name)
    }
    try withSmjOnly {
      val joined = spark.table("bj_left").join(spark.table("bj_right"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(3000)}")
      // bucket pruning metadata reaches the scan
      assert(plan.contains("SelectedBucketsCount"), plan.take(3000))

      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = left.join(right, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want, "bucketed join rows == plain join rows")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }

  test("single-key lookup on a bucketed table prunes to one bucket") {
    val docs = queries.Tables.t(spark, dir, "documents")
    val base = Files.createTempDirectory("graft_bucket_prune").toString
    spark.sql("DROP TABLE IF EXISTS bj_prune")
    docs.select(col("doc_id"), col("n_chars"))
      .write.option("path", s"$base/bj_prune")
      .bucketBy(8, "doc_id").format("parquet").saveAsTable("bj_prune")
    // without a join/agg consuming the bucketing, the planner auto-falls
    // back to a plain scan ("Bucketed: false (disabled by query
    // planner)") — pin the bucketed scan on so the bucket filter applies
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try {
      val q = spark.table("bj_prune").filter(col("doc_id") === 7L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected 1-of-8 bucket prune:\n${plan.take(3000)}")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))
    } finally {
      spark.conf.set(k, prev)
      spark.sql("DROP TABLE IF EXISTS bj_prune")
    }
  }
}
