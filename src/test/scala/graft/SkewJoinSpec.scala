package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substantiates the SURVEY's skew-handling claim: AQE's runtime
  * skew-join split must actually fire on a hot-key join (one key holding
  * ~90% of the left side), splitting the oversized shuffle partition
  * into parallel sub-reads — the mechanism that keeps a 100 TB join from
  * serializing on its heaviest key — and the split join must return
  * exactly the rows the plain join returns.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val aqeConfs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](confs: Seq[(String, String)])(f: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's shuffle partition and preserves the join result") {
    import spark.implicits._
    // 90% of the left side lands on key 0; right side is uniform
    val left = spark.range(0, 200000)
      .select((when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 97))
        .as("k"), col("id").as("lv"))
    val right = spark.range(0, 97).select(col("id").as("k"), (col("id") * 2).as("rv"))

    def totals(rows: Array[org.apache.spark.sql.Row]): (Long, Long, Long) =
      (rows.length.toLong,
        rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)

    val plain = totals(left.join(right, "k").collect())

    withConfs(aqeConfs) {
      val j = left.join(right, "k")
      val got = totals(j.collect())
      // the SAME DataFrame was executed, so its adaptive plan is final
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.take(3000)}")
      assert(got == plain, "skew-split join totals == plain join totals")
    }
  }
}
