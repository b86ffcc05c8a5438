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

  test("tableChanges reads exactly the increment between two snapshots") {
    import spark.implicits._
    val out = Files.createTempDirectory("tt-inc").toString
    val turns = spark.createDataset(
      (0 until 8).flatMap(i => TranscriptGen.conversation(19L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 8, waves = 4, resume = false))
    val snaps = TableIO.snapshots(out)
    assert(snaps.size >= 2)
    val (s1, s2) = (snaps.head, snaps.last)

    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Int, Int)] =
      df.select("conv_id", "turn_idx", "bucket")
        .as[(String, Int, Int)].collect().toSet

    // delta(s1 → s2) == tableAt(s2) − tableAt(s1), row-for-row
    val delta = ExtractionPipeline.tableChanges(spark, out, "extracted", s1, s2)
    val want = rows(ExtractionPipeline.tableAt(spark, out, "extracted", s2)) --
      rows(ExtractionPipeline.tableAt(spark, out, "extracted", s1))
    assert(rows(delta) == want && want.nonEmpty)

    // from-the-beginning delta is the whole snapshot; empty delta at s==s
    assert(rows(ExtractionPipeline.tableChanges(spark, out, "extracted", 0L, s1)) ==
      rows(ExtractionPipeline.tableAt(spark, out, "extracted", s1)))
    assert(ExtractionPipeline.tableChanges(spark, out, "extracted", s2, s2).count() == 0)

    // the increment scan is partition-pruned to the new buckets only
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    delta.collect()
    val scan = scans(delta.queryExecution.executedPlan).head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"bucket must be a partition filter, got: ${scan.partitionFilters}")

    // a non-ancestor 'from' is rejected loudly (append-only contract)
    intercept[IllegalArgumentException] {
      ExtractionPipeline.tableChanges(spark, out, "extracted", 999L, s2)
    }

    // a TORN snapshot file (the commit crash window) must fail the delta
    // loudly — tableAt may degrade to empty, but "delta since a manifest
    // we cannot read" silently becoming "everything" would be data
    // re-processing at 100 TB scale
    val torn = java.nio.file.Paths.get(out, s"manifest-v$s1.json")
    java.nio.file.Files.write(torn, Array[Byte]('{', 'x'))
    intercept[IllegalArgumentException] {
      ExtractionPipeline.tableChanges(spark, out, "extracted", s1, s2)
    }
    assert(TableIO.readAtStrict(out, s1).isEmpty, "strict read reports the tear")
  }

  test("expireSnapshots bounds metadata: deletes only old manifests, never data") {
    import spark.implicits._
    val out = Files.createTempDirectory("ttexp").toString
    val turns = spark.createDataset(
      (0 until 8).flatMap(i => TranscriptGen.conversation(23L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 8, waves = 4, resume = false))
    val ext = ExtractionPipeline.extractedDir(out)
    val snaps = TableIO.snapshots(out)
    assert(snaps.size >= 3, s"need history to expire: $snaps")
    val before = spark.read.parquet(ext).count()

    val expired = TableIO.expireSnapshots(out, keepLast = 2)
    assert(expired == snaps.dropRight(2))
    assert(TableIO.snapshots(out) == snaps.takeRight(2))
    // the live table and the retained snapshots are untouched
    assert(spark.read.parquet(ext).count() == before)
    assert(TableIO.read(out).snapshotId == snaps.last)
    val kept = ExtractionPipeline.tableAt(spark, out, "extracted", snaps.last)
    assert(kept.count() == before)
    // an expired id degrades exactly like an absent snapshot
    assert(ExtractionPipeline.tableAt(spark, out, "extracted", snaps.head).count() == 0)
    assert(TableIO.readAtStrict(out, snaps.head).isEmpty)
    // expiring everything but one still leaves the newest readable
    TableIO.expireSnapshots(out, keepLast = 1)
    assert(TableIO.snapshots(out) == Seq(snaps.last))
    intercept[IllegalArgumentException](TableIO.expireSnapshots(out, 0))
  }
}
