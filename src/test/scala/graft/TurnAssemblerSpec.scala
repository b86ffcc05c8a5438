package graft

import graft.fixtures.TranscriptGen
import graft.model.Turn
import graft.streaming.TurnAssembler
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** transformWithState turn reassembly: contiguous-prefix release across
  * micro-batches, gap holdback, duplicate drops, multi-conversation
  * isolation, and agreement with the batch sort on gap-free input.
  */
class TurnAssemblerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def turn(conv: String, idx: Int): Turn =
    Turn(conv, idx, "user", s"text $conv#$idx", null,
      new Timestamp(1700000000000L + idx * 1000L))

  private def run(name: String)(feed: (MemoryStream[Turn],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[Turn] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    // transformWithState requires the RocksDB state store; the provider
    // is captured at query START, so scoping the conf here leaves other
    // suites' streams on the default store
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try TurnAssembler.assemble(input.toDS()).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append())
        .start()
      finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    try feed(input, q) finally q.stop()
    spark.table(name).as[Turn].collect().toSeq
  }

  test("contiguous prefix releases immediately; a gap holds back the rest") {
    val out = run("ta_gap") { (input, q) =>
      input.addData(turn("c1", 0), turn("c1", 2), turn("c1", 3))
      q.processAllAvailable()
      // only idx 0 is contiguous so far
      assert(spark.table("ta_gap").count() == 1)
      input.addData(turn("c1", 1)) // fills the gap → releases 1, 2, 3
      q.processAllAvailable()
    }
    assert(out.map(_.turn_idx).sorted == Seq(0, 1, 2, 3))
    // released exactly once, in order of index per conversation
    assert(out.map(_.turn_idx).distinct.size == 4)
  }

  test("duplicate deliveries of released or buffered turns are dropped") {
    val out = run("ta_dup") { (input, q) =>
      input.addData(turn("c1", 0), turn("c1", 1))
      q.processAllAvailable()
      input.addData(turn("c1", 0), turn("c1", 1), turn("c1", 2), turn("c1", 2))
      q.processAllAvailable()
    }
    assert(out.map(_.turn_idx).sorted == Seq(0, 1, 2))
  }

  test("conversations are isolated; interleaved streams release independently") {
    val out = run("ta_multi") { (input, q) =>
      input.addData(turn("a", 1), turn("b", 0))
      q.processAllAvailable()
      assert(spark.table("ta_multi").count() == 1) // only b#0
      input.addData(turn("a", 0), turn("b", 1))
      q.processAllAvailable()
    }
    assert(out.count(_.conv_id == "a") == 2 && out.count(_.conv_id == "b") == 2)
  }

  test("a negative turn_idx fails the stream loudly, not silently") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try TurnAssembler.assemble(input.toDS()).writeStream
        .format("memory").queryName("ta_neg").outputMode(OutputMode.Append())
        .start()
      finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    try {
      input.addData(turn("c1", -1))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).exists(c => c.getMessage != null &&
          c.getMessage.contains("negative turn_idx")), ex.getMessage)
    } finally q.stop()
  }

  test("assemble composes with streaming extraction in one DAG") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // shuffled input WITH duplicate deliveries: the assembler dedups and
    // orders; extraction downstream sees each turn exactly once
    val turns = (0 until 2).flatMap(i => TranscriptGen.conversation(31L, i.toLong))
    val feed = new scala.util.Random(3).shuffle(turns ++ turns.take(5))

    val input = MemoryStream[Turn]
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try graft.streaming.StreamingExtraction
        .extracted(TurnAssembler.assemble(input.toDS()))
        .writeStream.format("memory").queryName("ta_extract")
        .outputMode(OutputMode.Append()).start()
      finally prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    try {
      feed.grouped(9).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("ta_extract")
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val want = graft.streaming.StreamingExtraction
      .extracted(spark.createDataset(turns))
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == want,
      "assembled-stream extraction == direct batch extraction, exactly once")
  }

  test("gap-free shuffled input reassembles to the batch sort order") {
    import spark.implicits._
    val turns = (0 until 3).flatMap(i => TranscriptGen.conversation(29L, i.toLong))
    val shuffled = new scala.util.Random(5).shuffle(turns)
    val out = run("ta_batch") { (input, q) =>
      shuffled.grouped(7).foreach { g => input.addData(g); q.processAllAvailable() }
    }
    val want = turns.sortBy(t => (t.conv_id, t.turn_idx))
    assert(out.sortBy(t => (t.conv_id, t.turn_idx)) == want,
      "assembled output == batch-sorted input, row for row")
    // and within the APPEND ORDER of the sink, each conversation's turns
    // are already ascending — the operator's ordering contract
    out.groupBy(_.conv_id).foreach { case (_, ts) =>
      // memory sink preserves per-batch arrival order; indices must be
      // globally ascending per conversation across batches
      assert(ts.map(_.turn_idx) == ts.map(_.turn_idx).sorted)
    }
  }
}
