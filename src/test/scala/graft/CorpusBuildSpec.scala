package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{CorpusBuild, ExtractionPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end corpus build: the curation funnel (gate → dedup →
  * decontaminate → split → pack → shard write) composed as one job over
  * the extraction pipeline's own outputs, with exact row accounting.
  */
class CorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val outDir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("cb").toString
    val good = (0 until 10).flatMap(i => TranscriptGen.conversation(11L, i.toLong))
    // clone one conversation's texts under a new id — exact-dup bait
    val base = good.filter(_.conv_id == good.head.conv_id)
    val dups = base.map(t => t.copy(conv_id = "conv-clone"))
    ExtractionPipeline.run(spark, spark.createDataset(good ++ dups),
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
    out
  }

  private def evalSet(fromText: String) = {
    import spark.implicits._
    Seq(fromText).toDF("text")
      .withColumn("tks", filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .filter(size(col("tks")) >= 3)
      .select(explode(expr("transform(sequence(0, size(tks)-3)," +
        " i -> hash(tks[i], tks[i+1], tks[i+2]))")).as("g"))
  }

  test("the funnel accounts for every input row and writes packed shards") {
    // contaminate with a real extracted text so the anti-join has hits
    val bait = spark.read.parquet(ExtractionPipeline.extractedDir(outDir))
      .filter(col("skip_reason") === "" && length(col("text")) > 50)
      .orderBy("conv_id", "turn_idx")
      .select("text").head().getString(0)
    val buildDir = Files.createTempDirectory("cbout").toString
    val r = CorpusBuild.run(spark, outDir, buildDir, evalSet(bait))

    assert(r.accounted, s"row accounting must partition the input exactly: $r")
    assert(r.input > 0 && r.kept > 0 && r.tokens > 0 && r.windows > 0)
    assert(r.dupDropped > 0, s"the cloned conversation must be deduped: $r")
    assert(r.contaminated > 0, s"the bait text must be decontaminated: $r")
    assert(r.windows == (r.tokens + CorpusBuild.WindowTokens - 1) / CorpusBuild.WindowTokens)

    // shards: window-contiguous, never negative, token-complete
    val shards = spark.read.parquet(CorpusBuild.shardsDir(buildDir))
    assert(shards.count() == r.kept)
    assert(shards.agg(sum("n_toks")).head().getLong(0) == r.tokens)
    assert(shards.filter(col("off") < 0 || col("window_id") < 0).count() == 0)
    // offsets are unique starts: no two rows share (off)
    assert(shards.select("off").distinct().count() == r.kept)

    // determinism: a rebuild reproduces the same report
    val buildDir2 = Files.createTempDirectory("cbout2").toString
    val r2 = CorpusBuild.run(spark, outDir, buildDir2, evalSet(bait))
    assert(r2 == r, "corpus build must be deterministic")
  }

  test("an empty eval set contaminates nothing") {
    import spark.implicits._
    val buildDir = Files.createTempDirectory("cbout3").toString
    val r = CorpusBuild.run(spark, outDir, buildDir,
      Seq.empty[Long].toDF("g"))
    assert(r.contaminated == 0 && r.accounted)
  }
}
