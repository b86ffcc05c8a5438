package graft

import graft.retrieval.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the ranking window: the unpartitioned `withRank` window is
  * structurally bounded (VERDICT r1 nit — an unbounded caller would have
  * silently single-tasked the whole input).
  */
class RetrievalGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withRank plans a distributed top-k cap before the single-task window") {
    // a FILE scan: row count unknown at plan time, so the optimizer must
    // KEEP the cap (on known-size inputs like range() it proves the limit
    // redundant and elides it — also correct)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("double").as("score"))
    val ranked = Retrieval.withRank(df, "doc_id", "score")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject cap in:\n${plan.take(2000)}")

    // ranks are 0-based, deterministic ties on (score desc, id asc)
    val small = spark.range(0, 1000).select(
      col("id").as("doc_id"), (col("id") % 97).cast("double").as("score"))
    val rows = Retrieval.withRank(small.toDF(), "doc_id", "score")
      .orderBy("rank").collect()
    assert(rows.map(_.getInt(2)).toSeq == (0 until 1000))
    val top = rows.take(3).map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top == Seq((96L, 96.0), (193L, 96.0), (290L, 96.0)))
  }

  test("inputs beyond MaxRankedRows are capped, not single-task-sorted") {
    val n = Retrieval.MaxRankedRows + 5000
    val df = spark.range(0, n.toLong).select(
      col("id").as("doc_id"), col("id").cast("double").as("score"))
    val ranked = Retrieval.withRank(df.toDF(), "doc_id", "score")
    assert(ranked.count() == Retrieval.MaxRankedRows)
    // the top-scored rows survive the cap
    val maxRank0 = ranked.filter(col("rank") === 0).select("doc_id").as[Long].head()
    assert(maxRank0 == n.toLong - 1)
  }
}
