package graft

import graft.streaming.{Sessionize, WindowedStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Watermark + windowed aggregation: append-mode streaming output must
  * equal the batch run of the SAME function over the same events for
  * every finalized window, and events later than the watermark bound
  * must be dropped without disturbing already-emitted windows.
  */
class WindowedStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, minute: Long, typ: String, value: Double) =
    Sessionize.Event(id, new Timestamp(minute * 60000L), id % 7, typ, value)

  // three hours of events, two types, deterministic values
  private def base: Seq[Sessionize.Event] =
    (0 until 90).map { i =>
      ev(i.toLong, i * 2L, if (i % 3 == 0) "click" else "view", (i % 11) * 0.5)
    }

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
      r.getString(2), r.getLong(3), r.getDouble(4))).toSet

  test("append-mode stream equals the batch run for finalized windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = WindowedStats.windowed(input.toDS(), delay = "10 minutes")
      .writeStream.format("memory").queryName("ws_eq")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(base)
      q.processAllAvailable()
      // sentinel far in the future advances the watermark past every
      // base window so append mode finalizes and emits them
      input.addData(Seq(ev(9999L, 60L * 24 * 2, "view", 0.0)))
      q.processAllAvailable()

      val streamed = collectRows(spark.table("ws_eq"))
      val batch = collectRows(
        WindowedStats.windowed(spark.createDataset(base), delay = "10 minutes"))
      assert(streamed == batch,
        "finalized streaming windows == batch windows over the same events")
      assert(batch.map(_._3) == Set("click", "view") && batch.size >= 6)
    } finally q.stop()
  }

  test("events older than the watermark are dropped; emitted windows stay put") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = WindowedStats.windowed(input.toDS(), delay = "10 minutes")
      .writeStream.format("memory").queryName("ws_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(base)
      q.processAllAvailable()
      input.addData(Seq(ev(9999L, 60L * 24 * 2, "view", 0.0)))
      q.processAllAvailable()
      val afterFlush = collectRows(spark.table("ws_late"))

      // a straggler 2 days behind the watermark: must be dropped
      input.addData(Seq(ev(10000L, 30L, "click", 99.0)))
      q.processAllAvailable()
      assert(collectRows(spark.table("ws_late")) == afterFlush,
        "late event neither re-emits nor alters a finalized window")
    } finally q.stop()
  }

  test("sliding windows emit one row per covering window") {
    import spark.implicits._
    // batch mode: a single event at minute 90 with 1h windows sliding by
    // 30min is covered by exactly two windows
    val rows = WindowedStats.windowed(
      spark.createDataset(Seq(ev(1L, 90L, "click", 1.0))),
      slide = Some("30 minutes"))
    assert(rows.count() == 2)
  }
}
