package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming sessionization: watermark + event-time state
  * timeouts over a MemoryStream, plus agreement with the batch twin
  * (q_sessionize window plan) on closed sessions.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)
  private def ev(id: Long, min: Long, uid: Long, v: Double = 1.0): Event =
    Event(id, ts(min), uid, "click", v)

  test("gap closes a session; timeout flushes the last one") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 minutes"), gapSec = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode(OutputMode.Append())
      .start()
    try {
      // session A: minutes 0..20; then a 2h gap; session B at minute 140
      input.addData(ev(1, 0, 7), ev(2, 10, 7, 2.0), ev(3, 20, 7))
      q.processAllAvailable()
      input.addData(ev(4, 140, 7, 5.0)) // crosses the gap → closes A
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7)
      assert(closed.head.n_events == 3 && closed.head.total_value == 4.0)
      assert(closed.head.session_start == ts(0) && closed.head.session_end == ts(20))

      // advance the watermark far past B's last+gap → timeout flushes B
      input.addData(ev(5, 400, 99))
      q.processAllAvailable()
      input.addData(ev(6, 500, 99))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[Session].collect()
      assert(all.exists(s => s.user_id == 7 && s.n_events == 1 &&
        s.total_value == 5.0))
    } finally q.stop()
  }

  test("out-of-order events within a batch fold in event-time order") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(
        input.toDS().withWatermark("ts", "10 minutes"), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(2, 25, 3), ev(1, 5, 3), ev(3, 15, 3))
      q.processAllAvailable()
      input.addData(ev(4, 300, 3)) // closes the session
      q.processAllAvailable()
      val closed = spark.table("sess_ooo").as[Session].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 3)
      assert(closed.head.session_start == ts(5) && closed.head.session_end == ts(25))
    } finally q.stop()
  }
}
