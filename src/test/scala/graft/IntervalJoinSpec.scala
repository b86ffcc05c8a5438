package graft

import graft.streaming.{IntervalJoin, Sessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Stream-stream interval join: the streaming run (watermarked both
  * sides, time-bounded predicate) must emit exactly the batch run's
  * (click, view) pairs over the same events, and view rows older than
  * the watermark bound must be dropped from state, not joined.
  */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // NOTE: all event times sit above minute 100, not at epoch 0 — Spark's
  // late-row filter drops stream-stream join input at or below the
  // current watermark, and the INITIAL watermark is epoch 0, so an event
  // at exactly minute 0 would be discarded before it could join.
  private def ev(id: Long, minute: Long, typ: String) =
    Sessionize.Event(id, new Timestamp((100L + minute) * 60000L), id % 5, typ, 1.0)

  // interleaved clicks and views across 2 hours, 5 users; views both
  // inside and outside the 10-minute lookback of each click
  private def clicks: Seq[Sessionize.Event] =
    (0 until 24).map(i => ev(1000L + i, i * 5L + 3, "click"))
  private def views: Seq[Sessionize.Event] =
    (0 until 120).map(i => ev(2000L + i, i.toLong, "view"))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streaming interval join equals the batch join over the same events") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val cIn = MemoryStream[Sessionize.Event]
    val vIn = MemoryStream[Sessionize.Event]
    val q = IntervalJoin.attribute(cIn.toDS(), vIn.toDS())
      .writeStream.format("memory").queryName("ij_eq")
      .outputMode(OutputMode.Append).start()
    try {
      // feed in two slices to exercise cross-batch buffering
      cIn.addData(clicks.take(10)); vIn.addData(views.take(60))
      q.processAllAvailable()
      cIn.addData(clicks.drop(10)); vIn.addData(views.drop(60))
      q.processAllAvailable()

      val streamed = collectPairs(spark.table("ij_eq"))
      val batch = collectPairs(IntervalJoin.attribute(
        spark.createDataset(clicks), spark.createDataset(views)))
      assert(batch.nonEmpty, "batch join must produce pairs")
      assert(streamed == batch, "stream pairs == batch pairs")
    } finally q.stop()
  }

  test("late views beyond the watermark are not joined to later clicks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val cIn = MemoryStream[Sessionize.Event]
    val vIn = MemoryStream[Sessionize.Event]
    val q = IntervalJoin.attribute(cIn.toDS(), vIn.toDS(),
      lookbackSec = 600L, delay = "10 minutes")
      .writeStream.format("memory").queryName("ij_late")
      .outputMode(OutputMode.Append).start()
    try {
      // advance both watermarks far past minute 0
      cIn.addData(Seq(ev(1L, 500L, "click")))
      vIn.addData(Seq(ev(2L, 500L, "view")))
      q.processAllAvailable()
      // a view at minute 1 is now far behind the watermark; a click at
      // minute 2 would match it were the view not dropped as too late
      vIn.addData(Seq(ev(3L, 1L, "view")))
      cIn.addData(Seq(ev(4L, 2L, "click")))
      q.processAllAvailable()
      val pairs = collectPairs(spark.table("ij_late"))
      assert(!pairs.contains((4L, 3L)),
        s"late view must be dropped by the watermark, got $pairs")
    } finally q.stop()
  }
}
