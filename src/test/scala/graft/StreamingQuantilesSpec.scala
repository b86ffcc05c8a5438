package graft

import graft.streaming.{Sessionize, StreamingQuantiles}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The streaming histogram sketch must (a) emit, per finalized window,
  * exactly the histogram the batch run of the same function computes,
  * and (b) yield quantile estimates within one bucket width of the
  * exact per-window quantiles recomputed in memory.
  */
class StreamingQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Lo = 0.0; private val Hi = 8.0; private val B = 16

  private def ev(id: Long, minute: Long, value: Double) =
    Sessionize.Event(id, new Timestamp(minute * 60000L), id % 7, "e", value)

  // two hours, skewed deterministic values incl. out-of-domain outliers
  private def base: Seq[Sessionize.Event] =
    (0 until 120).map { i =>
      val v = if (i % 17 == 0) 11.5 else ((i * i) % 29) * 0.25
      ev(i.toLong, i.toLong, v)
    }

  private def histRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
      r.getInt(2), r.getLong(3))).toSet

  test("append-mode streaming histogram equals the batch histogram per " +
    "finalized window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val q = StreamingQuantiles.histogram(input.toDS(), Lo, Hi, B)
      .writeStream.format("memory").queryName("sq_hist")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(base)
      q.processAllAvailable()
      input.addData(Seq(ev(9999L, 60L * 24, 1.0))) // watermark sentinel
      q.processAllAvailable()
      val streamed = histRows(spark.table("sq_hist"))
      val batch = histRows(
        StreamingQuantiles.histogram(spark.createDataset(base), Lo, Hi, B))
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("quantile extraction from the sketch is within one bucket width of " +
    "the exact per-window quantiles") {
    import spark.implicits._
    val hist = StreamingQuantiles.histogram(spark.createDataset(base), Lo, Hi, B)
    val out = StreamingQuantiles.quantiles(hist, Lo, Hi, B).collect()
    assert(out.nonEmpty)
    val width = (Hi - Lo) / B
    // exact per-window quantiles, with the sketch's clamp applied
    val byWindow = base.groupBy(e => e.ts.getTime / 3600000L)
    out.foreach { r =>
      val wkey = r.getTimestamp(0).getTime / 3600000L
      val vals = byWindow(wkey).map(e => math.min(math.max(e.value, Lo),
        Hi - width / 2)).sorted
      val q = r.getAs[Long]("q")
      val rank = ((q * vals.length + 99) / 100).toInt
      val exact = vals(rank - 1)
      assert(r.getAs[Long]("n") === vals.length.toLong)
      assert(math.abs(r.getAs[Double]("est") - exact) <= width + 1e-9,
        s"window $wkey q$q: est ${r.getAs[Double]("est")} vs exact $exact")
    }
  }
}
