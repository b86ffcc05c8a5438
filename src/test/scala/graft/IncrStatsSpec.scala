package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeability proof for the incremental stats maintenance plan
  * (`q_incr_stats`): the merged history⊕delta aggregate must equal a
  * full single-pass recompute over the union — that equality is the
  * entire license to never re-scan history at 100 TB, so it is asserted
  * directly rather than assumed from associativity.
  */
class IncrStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("history⊕delta merge equals full recompute") {
    val merged = SparkEntry.queries("q_incr_stats")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val full = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("sum_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(merged == full,
      s"merge≠recompute: onlyMerged=${(merged -- full).take(3)} " +
        s"onlyFull=${(full -- merged).take(3)}")
  }

  test("the merge is a key join over two pre-aggregated sides, not a window") {
    val p = SparkEntry.queries("q_incr_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    // both sides reach the join aggregated: partial_count markers present
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(2000))
  }
}
