package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, TableIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Snapshot time travel over the Iceberg-emulated tables: every wave
  * commit retains its manifest, and reading a table "as of" an old
  * snapshot reproduces exactly the buckets committed then — via a
  * partition-pruned scan.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("each wave commit is a readable snapshot; old snapshots reproduce exactly") {
    import spark.implicits._
    val out = Files.createTempDirectory("tt").toString
    val turns = spark.createDataset(
      (0 until 8).flatMap(i => TranscriptGen.conversation(17L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 8, waves = 4, resume = false))

    val snaps = TableIO.snapshots(out)
    assert(snaps.size >= 2, s"multi-wave run must retain multiple snapshots: $snaps")
    assert(snaps == snaps.sorted)

    // the latest snapshot is the full table
    val full = spark.read.parquet(ExtractionPipeline.extractedDir(out))
    val latest = ExtractionPipeline.tableAt(spark, out, "extracted", snaps.last)
    assert(latest.count() == full.count())

    // an early snapshot holds exactly its manifest's buckets — strictly
    // fewer rows, and row-identical to filtering the full table manually
    val early = snaps.head
    val m = TableIO.readAt(out, early)
    assert(m.completed.nonEmpty && m.completed.size < 8)
    val asOf = ExtractionPipeline.tableAt(spark, out, "extracted", early)
      .select("conv_id", "turn_idx", "bucket")
    val manual = full
      .filter(col("bucket").isin(m.completed.keys.toSeq.map(Integer.valueOf): _*))
      .select("conv_id", "turn_idx", "bucket")
    assert(asOf.count() > 0 && asOf.count() < full.count())
    assert(asOf.except(manual).isEmpty && manual.except(asOf).isEmpty)

    // chunks table travels too, consistent with its extracted snapshot
    val chunksAsOf = ExtractionPipeline.tableAt(spark, out, "chunks", early)
    val chunkBuckets = chunksAsOf.select("bucket").distinct()
      .as[Int].collect().toSet
    assert(chunkBuckets.subsetOf(m.completed.keySet))

    // unknown snapshot and unknown table degrade loudly/safely
    assert(ExtractionPipeline.tableAt(spark, out, "extracted", 999L).count() == 0)
    intercept[IllegalArgumentException] {
      ExtractionPipeline.tableAt(spark, out, "nope", snaps.last)
    }
  }

  test("a fresh (resume=false) run clears prior snapshot history") {
    import spark.implicits._
    val out = Files.createTempDirectory("tt-clear").toString
    val turns = spark.createDataset(
      (0 until 4).flatMap(i => TranscriptGen.conversation(17L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 2, resume = false))
    val first = TableIO.snapshots(out)
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 2, resume = false))
    val second = TableIO.snapshots(out)
    assert(second.nonEmpty && second.max <= first.max,
      "restart from scratch must not accumulate stale history")
  }
}
