package graft

import graft.fixtures.TranscriptGen
import graft.model.Turn
import graft.streaming.StreamingCorpusBuild
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Continuous corpus building: micro-batches gate, dedup against
  * HISTORY (O(1) Bloom state + exact verification), decontaminate, and
  * pack with globally consistent offsets; replays are exactly-once.
  */
class StreamingCorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def turnsOf(seed: Long, convs: Range): Seq[Turn] =
    convs.flatMap(i => TranscriptGen.conversation(seed, i.toLong))

  private def evalSet(fromText: String) = {
    import spark.implicits._
    Seq(fromText).toDF("text")
      .withColumn("tks", filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .filter(size(col("tks")) >= 3)
      .select(explode(expr("transform(sequence(0, size(tks)-3)," +
        " i -> hash(tks[i], tks[i+1], tks[i+2]))")).as("g"))
  }

  test("cross-batch history dedup, offset continuity, exactly-once replay") {
    import spark.implicits._
    val buildDir = Files.createTempDirectory("scb").toString
    val b1 = turnsOf(31L, 0 until 4)
    // batch 2: fresh convs PLUS re-sends of batch-1 texts under new ids —
    // only the HISTORY dedup can catch these
    val resend = b1.take(5).zipWithIndex.map { case (t, i) =>
      t.copy(conv_id = s"resend-$i", turn_idx = 0)
    }
    val b2 = turnsOf(31L, 4 until 8) ++ resend
    val bait = b1.map(_.text).filter(_.length > 80).head
    val eval0 = evalSet(bait)

    StreamingCorpusBuild.processBatch(spark, spark.createDataset(b1), 0L, buildDir, eval0)
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(b2), 1L, buildDir, eval0)

    val shards = spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir))
    val kept = shards.select("conv_id", "turn_idx", "text", "n_toks", "off", "batch_id")
      .collect()
    // history dedup: none of the re-sent texts survive batch 2
    val batch1Texts = shards.filter(col("batch_id") === 0)
      .select("text").as[String].collect().toSet
    val batch2 = kept.filter(_.getAs[Number]("batch_id").longValue == 1L)
    assert(batch2.nonEmpty)
    assert(!batch2.exists(r => batch1Texts(r.getAs[String]("text"))),
      "re-sent batch-1 texts must be deduped against history")
    // decontamination: the bait text appears nowhere
    assert(!kept.exists(_.getAs[String]("text") == bait))
    // offset continuity: batch 2 starts exactly at batch 1's token total
    val b1Tokens = shards.filter(col("batch_id") === 0)
      .agg(sum("n_toks")).head().getLong(0)
    val b2MinOff = batch2.map(_.getAs[Long]("off")).min
    assert(b2MinOff == b1Tokens,
      s"batch-2 offsets must start at the committed cursor ($b1Tokens), got $b2MinOff")
    // offsets are a gapless token layout within each batch
    val offs = kept.sortBy(_.getAs[Long]("off"))
    offs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("off") + a.getAs[Long]("n_toks") == b.getAs[Long]("off"))
      case _ =>
    }

    // exactly-once: replaying a committed batch changes nothing
    val before = shards.count()
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(b2), 1L, buildDir, eval0)
    assert(spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir)).count() == before)

    // crash recovery: an UNcommitted batch id with leftover partial data
    // is scrubbed and redone, not doubled
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(
      turnsOf(31L, 8 until 10)), 2L, buildDir, eval0)
    val afterB2 = spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir)).count()
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      buildDir, "_history", "state", "v2.json")) // simulate crash pre-commit
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(
      turnsOf(31L, 8 until 10)), 2L, buildDir, eval0)
    assert(spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir)).count() == afterB2,
      "scrub-and-redo must not double rows")
  }

  test("the streaming build keeps the same text set as the batch build") {
    import spark.implicits._
    val buildDir = Files.createTempDirectory("scb2").toString
    val all = turnsOf(37L, 0 until 6)
    val (b1, b2) = all.splitAt(all.size / 2)
    val eval0 = Seq.empty[Long].toDF("g")
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(b1), 0L, buildDir, eval0)
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(b2), 1L, buildDir, eval0)
    val streamed = spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir))
      .select("text").as[String].collect().toSet

    val outDir = Files.createTempDirectory("scb2b").toString
    graft.pipeline.ExtractionPipeline.run(spark, spark.createDataset(all),
      graft.pipeline.ExtractionPipeline.Config(outDir, nBuckets = 4, waves = 1,
        resume = false))
    val batchBuild = Files.createTempDirectory("scb2c").toString
    graft.pipeline.CorpusBuild.run(spark, outDir, batchBuild, eval0, holdoutPct = 0)
    val batched = spark.read.parquet(
      graft.pipeline.CorpusBuild.shardsDir(batchBuild))
      .select("text").as[String].collect().toSet

    assert(streamed == batched,
      "stream and batch curation must keep the same distinct texts")
  }

  test("hostile state files degrade to the last parseable committed state") {
    import spark.implicits._
    val buildDir = Files.createTempDirectory("scb4").toString
    val eval0 = Seq.empty[Long].toDF("g")
    StreamingCorpusBuild.processBatch(spark, spark.createDataset(
      turnsOf(43L, 0 until 2)), 0L, buildDir, eval0)
    val good = StreamingCorpusBuild.lastState(buildDir)
    assert(good.batchId == 0L && good.cursor > 0L)
    // a torn/corrupted NEWER state file must not win over the intact one
    val sd = java.nio.file.Paths.get(buildDir, "_history", "state")
    java.nio.file.Files.write(sd.resolve("v1.json"), Array[Byte]('{', 'x'))
    val st = StreamingCorpusBuild.lastState(buildDir)
    assert(st.batchId == 0L && st.cursor == good.cursor,
      "torn v1 must fall back to committed v0")
    // all-garbage history degrades to the empty state, never throws
    java.nio.file.Files.write(sd.resolve("v0.json"), Array[Byte](0, 1, 2))
    val empty = StreamingCorpusBuild.lastState(buildDir)
    assert(empty.batchId == -1L && empty.cursor == 0L)
  }

  test("writer wires the funnel through foreachBatch exactly once") {
    import spark.implicits._
    val buildDir = Files.createTempDirectory("scb3").toString
    val checkpoint = Files.createTempDirectory("scb3cp").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    input.addData(turnsOf(41L, 0 until 3): _*)
    val q = StreamingCorpusBuild.writer(input.toDS(), buildDir, checkpoint,
      Seq.empty[Long].toDF("g")).start()
    q.awaitTermination()
    val n = spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir)).count()
    assert(n > 0)
    // AvailableNow restart with no new data: nothing re-processed
    val q2 = StreamingCorpusBuild.writer(input.toDS(), buildDir, checkpoint,
      Seq.empty[Long].toDF("g")).start()
    q2.awaitTermination()
    assert(spark.read.parquet(StreamingCorpusBuild.shardsDir(buildDir)).count() == n)
  }
}
