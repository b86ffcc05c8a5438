package graft

import graft.streaming.{Sessionize, SessionWindows}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Native session_window under Structured Streaming: append-mode output
  * must equal the batch run of the SAME function for every finalized
  * session (the claim the batch query `q_session_window`'s scaladoc
  * makes), sessions must merge across out-of-order arrivals inside the
  * lateness bound, and stragglers behind the watermark must be dropped
  * without disturbing emitted sessions.
  */
class SessionWindowStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, minute: Long, user: Long, value: Double) =
    Sessionize.Event(id, new Timestamp(minute * 60000L), user, "view", value)

  // two users, three sessions each: bursts at 0-20, 60-80, 150-160 min
  // (gaps of 40 and 70 min both exceed the 30-min session gap)
  private def base: Seq[Sessionize.Event] =
    for {
      u <- 0L to 1L
      (burst, i) <- Seq(0L, 60L, 150L).zipWithIndex
      k <- 0L until 5L
    } yield ev(u * 100 + i * 10 + k, burst + k * 5 + u, u, (k % 3) * 0.25)

  private def collectRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getTimestamp(1),
      r.getTimestamp(2), r.getLong(3), r.getLong(4))).toSet

  test("append-mode stream equals the batch run for finalized sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    // lateness bound must cover the cross-batch reorder span below (the
    // watermark advances to max-seen − delay after batch 1, and heads of
    // the earliest burst arrive a full 160 min behind that max)
    val q = SessionWindows.sessions(input.toDS(), delay = "3 hours")
      .writeStream.format("memory").queryName("sw_eq")
      .outputMode(OutputMode.Append).start()
    try {
      // feed out of order ACROSS batches but within the lateness bound:
      // the tail of each burst arrives first, the head second — the
      // session store must merge the two half-sessions per key
      val (tail, head) = base.partition(_.event_id % 5 >= 2)
      input.addData(tail)
      q.processAllAvailable()
      input.addData(head)
      q.processAllAvailable()
      input.addData(Seq(ev(9999L, 60L * 24 * 2, 5L, 0.0))) // watermark flush
      q.processAllAvailable()

      val streamed = collectRows(spark.table("sw_eq"))
      val batch = collectRows(
          SessionWindows.sessions(spark.createDataset(base), delay = "3 hours"))
        .filter(_._1 != 5L)
      val streamedBase = streamed.filter(_._1 != 5L)
      assert(streamedBase == batch,
        s"stream/batch session mismatch:\nonly-stream=${streamedBase -- batch}\nonly-batch=${batch -- streamedBase}")
      // 2 users × 3 bursts, each merged into ONE session of 5 events
      assert(batch.size == 6 && batch.forall(_._4 == 5L))
    } finally q.stop()
  }

  test("stragglers behind the watermark are dropped; emitted sessions stay put") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = SessionWindows.sessions(input.toDS())
      .writeStream.format("memory").queryName("sw_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(base)
      q.processAllAvailable()
      input.addData(Seq(ev(9999L, 60L * 24 * 2, 5L, 0.0)))
      q.processAllAvailable()
      val afterFlush = collectRows(spark.table("sw_late"))

      // 2 days behind the watermark: would have extended user 0's first
      // session — must be dropped, not emitted as a new one-event session
      input.addData(Seq(ev(10000L, 10L, 0L, 9.0)))
      q.processAllAvailable()
      assert(collectRows(spark.table("sw_late")) == afterFlush,
        "late event neither re-emits nor alters a finalized session")
    } finally q.stop()
  }
}
