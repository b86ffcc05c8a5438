package graft

import graft.fixtures.TranscriptGen
import graft.model.Turn
import graft.pipeline.ExtractionPipeline
import graft.streaming.StreamingExtraction
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming twin of the extraction pipeline: identical per-turn output
  * as batch, exactly-once resume from the checkpoint, and bucket-layout
  * agreement between the row-level `bucketOf` and the SQL expression.
  */
class StreamingExtractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def turns(convs: Range): Seq[Turn] =
    convs.flatMap(i => TranscriptGen.conversation(42L, i.toLong))

  test("streamed extraction rows equal the batch extraction of the same turns") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = Files.createTempDirectory("sx-eq").toString
    val input = MemoryStream[Turn]
    val data = turns(0 until 6)
    input.addData(data) // before start: AvailableNow drains what exists at start
    val q = StreamingExtraction.writer(
      StreamingExtraction.extracted(input.toDS(), nBuckets = 8),
      s"$base/out", s"$base/ckpt").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("conv_id", "turn_idx", "kind", "text", "skip_reason", "bucket")
    val batch = StreamingExtraction.extracted(spark.createDataset(data), nBuckets = 8)
      .select("conv_id", "turn_idx", "kind", "text", "skip_reason", "bucket")
    assert(streamed.count() == data.size)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("checkpoint resume: restart processes only new data, no duplicates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = Files.createTempDirectory("sx-resume").toString
    val input = MemoryStream[Turn]
    def start() = StreamingExtraction.writer(
      StreamingExtraction.extracted(input.toDS(), nBuckets = 8),
      s"$base/out", s"$base/ckpt").start()

    val first = turns(0 until 4)
    input.addData(first)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(s"$base/out").count()
    assert(afterFirst == first.size, "first run must commit the first batch")

    val more = turns(4 until 7)
    input.addData(more)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == (first.size + more.size))
    assert(out.groupBy("conv_id", "turn_idx").count()
      .filter(col("count") > 1).isEmpty, "restart must not re-emit committed rows")
  }

  test("row-level bucketOf matches the SQL xxhash64 bucket expression") {
    import spark.implicits._
    val sample = turns(0 until 8)
    val viaSql = spark.createDataset(sample)
      .select(col("conv_id"),
        pmod(xxhash64(col("conv_id"), lit(0)), lit(8)).cast("int").as("b"))
      .distinct().as[(String, Int)].collect().toMap
    sample.map(_.conv_id).distinct.foreach { cid =>
      assert(ExtractionPipeline.bucketOf(cid, 0, 8) == viaSql(cid),
        s"bucket mismatch for $cid")
    }
  }
}
