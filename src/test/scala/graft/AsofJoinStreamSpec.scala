package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static as-of enrichment: a STREAM of purchases joined as-of
  * against a STATIC views table through the broadcast physical form —
  * the streaming side passes through unshuffled (exactly the stream-static
  * broadcast-join shape Structured Streaming already blesses), each
  * micro-batch binary-searching the broadcast dimension. Output must equal
  * the batch run over the same rows.
  */
class AsofJoinStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming purchases enrich against static views; equals batch") {
    import spark.implicits._
    val views = Seq((1L, 10L, 100L), (1L, 50L, 101L), (2L, 20L, 102L))
      .toDF("v_uid", "v_ts", "vid")
    val purchases = Seq((1L, 60L, 1L), (1L, 30L, 2L), (2L, 5L, 3L), (3L, 40L, 4L))

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val streamDf = input.toDF().toDF("uid", "ts", "pid")
    val enriched = AsofJoin.asof(streamDf, views,
      Seq("uid"), Seq("v_uid"), "ts", "v_ts", broadcastRight = true)

    val q = enriched.writeStream.format("memory")
      .queryName("asof_stream_out").outputMode("append").start()
    try {
      input.addData(purchases.take(2))
      q.processAllAvailable()
      input.addData(purchases.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("asof_stream_out")
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    val batch = AsofJoin.asof(
        purchases.toDF("uid", "ts", "pid"), views,
        Seq("uid"), Seq("v_uid"), "ts", "v_ts", broadcastRight = true)
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got == batch)
    assert(got == Set((1L, Some(101L)), (2L, Some(100L)), (3L, None), (4L, None)))
  }
}
