package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{Catalog, ExtractionPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Documents catalog over the pipeline's own outputs (reference
  * `app/models/document.py` + list endpoint `document_service.py:486-521`).
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pipelineOut(): String = {
    import spark.implicits._
    val turns = TranscriptGen.transcripts(spark, nConvs = 25, numPartitions = 3)
    val out = Files.createTempDirectory("catalog").toString
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 8, waves = 1, resume = false))
    out
  }

  test("catalog rows carry real per-document metadata") {
    import spark.implicits._
    val out = pipelineOut()
    val n = Catalog.build(spark, out)
    assert(n == 25, "one catalog row per conversation")

    val cat = spark.read.parquet(Catalog.catalogDir(out))
    val ex = spark.read.parquet(ExtractionPipeline.extractedDir(out))
    val chunks = spark.read.parquet(ExtractionPipeline.chunksDir(out))

    // totals reconcile against the source tables
    assert(cat.agg(sum("num_turns")).as[Long].head() == ex.count())
    assert(cat.agg(sum("num_chunks")).as[Long].head() == chunks.count())
    assert(cat.agg(sum("file_size")).as[Long].head() ==
      ex.agg(sum("bytes_parsed")).as[Long].head())
    // num_pages = max turn_idx + 1 per conv
    val pages = ex.groupBy("conv_id").agg((max("turn_idx") + 1).as("p"))
    assert(cat.select("conv_id", "num_pages")
      .except(pages.select(col("conv_id"), col("p").as("num_pages"))).count() == 0)
    // tags carry the payload kind mix
    val allTags = cat.select(explode(col("tags")).as("t"))
      .distinct().as[String].collect().toSet
    assert(allTags.subsetOf(Set("plain", "html", "pdf", "pdf_file")))
    assert(allTags.contains("plain"))
  }

  test("list paginates newest-first with a stable tie-break; get is a point lookup") {
    val out = pipelineOut()
    Catalog.build(spark, out)
    val page1 = Catalog.list(spark, out, skip = 0, limit = 10).collect()
    val page2 = Catalog.list(spark, out, skip = 10, limit = 10).collect()
    assert(page1.length == 10 && page2.length == 10)
    val all = Catalog.list(spark, out, skip = 0, limit = 25).collect()
    assert((page1 ++ page2).map(_.getString(0)).toSeq ==
      all.take(20).map(_.getString(0)).toSeq, "pagination is a stable window")
    val someId = all.head.getString(0)
    val got = Catalog.get(spark, out, someId).collect()
    assert(got.length == 1 && got.head.getString(0) == someId)

    // nonexistent id → empty result (the API's 404 analog)
    assert(Catalog.get(spark, out, "no-such-conv").isEmpty)

    // P27 invalid-pagination analog: negative skip / non-positive or
    // over-MaxPageSize limit rejected eagerly with the reference's bounds
    for (badSkip <- Seq(-1, -100))
      assertThrows[IllegalArgumentException](
        Catalog.list(spark, out, skip = badSkip, limit = 10))
    for (badLimit <- Seq(-5, 0, Catalog.MaxPageSize + 1, 1000))
      assertThrows[IllegalArgumentException](
        Catalog.list(spark, out, skip = 0, limit = badLimit))
  }

  test("delete removes catalog rows by anti-join") {
    import spark.implicits._
    val out = pipelineOut()
    Catalog.build(spark, out)
    // materialize ids (delete swaps the files the lazy plan would re-read)
    val victimIds = spark.read.parquet(Catalog.catalogDir(out))
      .select("conv_id").orderBy("conv_id").limit(2)
      .as[String].collect().toSeq
    val victim = victimIds.toDF("conv_id")
    Catalog.delete(spark, out, victim)
    val left = spark.read.parquet(Catalog.catalogDir(out))
    assert(left.count() == 23)
    assert(left.join(victim, Seq("conv_id")).count() == 0)
  }
}
