package graft

import graft.model.Turn
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Watermark-bounded streaming exact dedup: duplicates within the
  * horizon collapse to one survivor (within and across micro-batches),
  * distinct contents all pass, and state is provably EVICTED — a copy
  * arriving beyond the watermark bound is re-admitted instead of being
  * matched against unbounded state.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def turn(conv: String, idx: Int, minute: Long, text: String) =
    Turn(conv, idx, "user", text, "", new Timestamp(minute * 60000L))

  test("duplicates collapse within the horizon; distinct texts pass; state evicts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingDedup.dedupByContent(input.toDS(), delay = "30 minutes")
      .writeStream.format("memory").queryName("sd")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: in-batch duplicate + distinct text
      input.addData(Seq(
        turn("c1", 0, 0, "same payload"),
        turn("c2", 0, 1, "same payload"),
        turn("c3", 0, 2, "another payload")))
      q.processAllAvailable()
      // batch 2 (still inside the horizon): cross-batch duplicate dropped
      input.addData(Seq(turn("c4", 0, 5, "same payload")))
      q.processAllAvailable()
      val mid = spark.table("sd").as[Turn].collect()
      assert(mid.map(_.text).sorted.toSeq == Seq("another payload", "same payload"),
        s"one survivor per content within the horizon: ${mid.toSeq}")
      // WITHIN one micro-batch the engine picks an arbitrary survivor
      // (documented dropDuplicatesWithinWatermark semantics); across
      // batches the earlier batch's survivor holds (c4 was dropped)
      assert(Set("c1", "c2").contains(
        mid.find(_.text == "same payload").get.conv_id))

      // advance the watermark far past the horizon, then replay the text:
      // its state must have been evicted → re-admitted
      input.addData(Seq(turn("adv", 0, 60 * 24, "watermark advancer")))
      q.processAllAvailable()
      input.addData(Seq(turn("c9", 0, 60 * 24 + 1, "same payload")))
      q.processAllAvailable()
      val fin = spark.table("sd").as[Turn].collect()
      assert(fin.count(_.text == "same payload") == 2,
        "bounded state: a copy beyond the horizon is re-admitted")
    } finally q.stop()
  }

  test("batch mode: deterministic first-wins per content hash") {
    import spark.implicits._
    val rows = Seq(
      turn("b2", 0, 3, "dup"), turn("b1", 0, 1, "dup"),
      turn("b3", 0, 2, "solo"))
    val out = StreamingDedup.dedupByContent(spark.createDataset(rows)).collect()
    assert(out.length == 2)
    assert(out.find(_.text == "dup").get.conv_id == "b1",
      "earliest ts wins regardless of input order")
  }
}
