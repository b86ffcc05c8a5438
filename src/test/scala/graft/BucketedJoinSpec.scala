package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join contract of [[graft.sources.Bucketing]]: writing
  * both join sides bucketed by the key makes the join EXCHANGE-FREE —
  * the shuffle is paid once at write time, not per join. The spec pins
  * (1) zero Exchange operators in the bucketed join's plan where the
  * plain join of the same data plans two, and (2) row parity between
  * the two forms.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def withNoAqeNoBroadcast[T](f: => T): T = {
    // AQE re-plans mid-query and broadcast elides the shuffle for tiny
    // sides — both would mask what this spec measures. Restore after.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("bucketed-by-key tables join with zero Exchange; plain join shuffles") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val left = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val right = docs.select(col("doc_id"), col("source"))
    Bucketing.writeBucketed(left, "bk_left", "doc_id", 8)
    Bucketing.writeBucketed(right, "bk_right", "doc_id", 8)
    try {
      withNoAqeNoBroadcast {
        val bucketed = Bucketing.bucketedJoin(spark, "bk_left", "bk_right", "doc_id")
        val bPlan = bucketed.queryExecution.executedPlan.toString
        assert(!bPlan.contains("Exchange"),
          s"bucketed join planned a shuffle:\n$bPlan")
        assert(bPlan.contains("SortMergeJoin"), bPlan)
        assert(bPlan.contains("SelectedBucketsCount"), bPlan)

        val plain = left.join(right, "doc_id")
        val pPlan = plain.queryExecution.executedPlan.toString
        assert(pPlan.contains("Exchange"),
          "control: the unbucketed join should shuffle under these confs")

        // row parity: bucketing must be invisible in the result
        assert(bucketed.count() === plain.count())
        val mism = bucketed.exceptAll(plain).count() +
          plain.exceptAll(bucketed).count()
        assert(mism === 0, "bucketed join result differs from plain join")
      }
    } finally {
      Bucketing.drop(spark, "bk_left")
      Bucketing.drop(spark, "bk_right")
    }
  }

  test("bucketed aggregation on the bucket key is also exchange-free") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Bucketing.writeBucketed(
      docs.select(col("doc_id"), col("n_chars")), "bk_agg", "doc_id", 8)
    try {
      withNoAqeNoBroadcast {
        val agg = spark.table("bk_agg").groupBy("doc_id")
          .agg(sum("n_chars").as("c"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"group-by on the bucket key planned a shuffle:\n$plan")
        assert(agg.count() === docs.select("doc_id").distinct().count())
      }
    } finally Bucketing.drop(spark, "bk_agg")
  }
}
