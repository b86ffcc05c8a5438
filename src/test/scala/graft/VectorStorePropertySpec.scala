package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.Bm25IndexTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ports of the reference's vector-store property suite
  * (`tests/test_vector_store_properties.py`) onto the pipeline's own
  * STORING tables:
  *
  *  - P14 storage round-trip: what EMBEDDING computes is exactly what a
  *    reader gets back, keyed and complete;
  *  - P15 reprocessing idempotence: re-running ingestion over the same
  *    chunk output replaces rather than duplicates;
  *  - P29 transactional consistency: cascade delete removes every trace
  *    of the deleted document, leaves every OTHER document byte-identical
  *    (deletion isolation), keeps the index pair consistent, and is a
  *    no-op for unknown ids.
  */
class VectorStorePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Extract + ingest a small corpus; returns the outDir. */
  private def ingested(nConvs: Int): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("vstore").toString
    val turns = spark.createDataset(
      (0 until nConvs).flatMap(i => TranscriptGen.conversation(7L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
    Ingestion.run(spark, out)
    out
  }

  test("P14: embedding storage round-trip — stored vector == recomputed vector per chunk") {
    val out = ingested(6)
    import spark.implicits._
    val chunks = spark.read.parquet(ExtractionPipeline.chunksDir(out))
      .select(col("conv_id"), col("turn_idx"), col("chunk_index"), col("content"))
    val emb = spark.read.parquet(Ingestion.embeddingsDir(out))
      .select(col("conv_id"), col("turn_idx"), col("chunk_index"), col("embedding"))
    val joined = chunks.join(emb, Seq("conv_id", "turn_idx", "chunk_index"))
      .select(col("content"), col("embedding")).as[(String, Array[Float])]
    assert(joined.count() == chunks.count(), "every chunk has exactly one stored vector")
    val mismatches = joined.mapPartitions(_.map { case (content, stored) =>
      val fresh = Ingestion.hashedEmbedding(content)
      if (fresh.toSeq == stored.toSeq) 0L else 1L
    }).reduce(_ + _)
    assert(mismatches == 0, "stored embeddings equal a fresh recompute")
  }

  test("P15: reprocessing idempotence — second ingestion run replaces, never duplicates") {
    val out = ingested(6)
    val firstEmb = spark.read.parquet(Ingestion.embeddingsDir(out))
      .orderBy("conv_id", "turn_idx", "chunk_index")
      .collect().toSeq
    val firstLens = spark.read
      .parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(out))).count()

    val n2 = Ingestion.run(spark, out) // reprocess the same chunk output
    val secondEmb = spark.read.parquet(Ingestion.embeddingsDir(out))
      .orderBy("conv_id", "turn_idx", "chunk_index")
      .collect().toSeq
    assert(n2 == firstEmb.size, "row count unchanged by reprocessing")
    assert(secondEmb == firstEmb, "embeddings table identical after reprocessing")
    assert(spark.read.parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(out)))
      .count() == firstLens, "index doclens unchanged by reprocessing")
    val (ok, msg) = Bm25IndexTables.validate(spark, Ingestion.indexDir(out), "chunk_id")
    assert(ok, msg)
  }

  test("P29: cascade delete is isolated, complete, and consistent") {
    val out = ingested(8)
    import spark.implicits._
    val convs = spark.read.parquet(Ingestion.embeddingsDir(out))
      .select("conv_id").distinct().as[String].collect().sorted.toSeq
    assert(convs.size >= 2)
    val doomed = convs.head
    val survivorsBefore = spark.read.parquet(Ingestion.embeddingsDir(out))
      .filter(col("conv_id") =!= doomed)
      .orderBy("conv_id", "turn_idx", "chunk_index").collect().toSeq
    val postingsBefore = spark.read
      .parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(out)))
      .filter(!col("chunk_id").startsWith(doomed + ":"))
      .orderBy("chunk_id", "term").collect().toSeq

    Ingestion.delete(spark, out, Seq(doomed))

    // completeness: no trace of the deleted conv in any STORING table
    assert(spark.read.parquet(Ingestion.embeddingsDir(out))
      .filter(col("conv_id") === doomed).count() == 0)
    assert(spark.read.parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(out)))
      .filter(col("chunk_id").startsWith(doomed + ":")).count() == 0)
    assert(spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(out)))
      .filter(col("chunk_id").startsWith(doomed + ":")).count() == 0)

    // isolation: every surviving row is byte-identical
    val survivorsAfter = spark.read.parquet(Ingestion.embeddingsDir(out))
      .orderBy("conv_id", "turn_idx", "chunk_index").collect().toSeq
    assert(survivorsAfter == survivorsBefore, "other documents untouched by delete")
    val postingsAfter = spark.read
      .parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(out)))
      .orderBy("chunk_id", "term").collect().toSeq
    assert(postingsAfter == postingsBefore, "other documents' postings untouched")

    // consistency: the postings/doclens pair still validates, and scoring
    // still works against the shrunken index
    val (ok, msg) = Bm25IndexTables.validate(spark, Ingestion.indexDir(out), "chunk_id")
    assert(ok, msg)
    val someTok = spark.read
      .parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(out)))
      .groupBy("term").count().orderBy(desc("count")).select("term").first().getString(0)
    assert(Bm25IndexTables.score(spark, Ingestion.indexDir(out), someTok, "chunk_id")
      .count() > 0)

    // no-op: deleting an unknown id changes nothing
    val before = spark.read.parquet(Ingestion.embeddingsDir(out)).count()
    Ingestion.delete(spark, out, Seq("no-such-conv"))
    assert(spark.read.parquet(Ingestion.embeddingsDir(out)).count() == before)
    val (ok2, msg2) = Bm25IndexTables.validate(spark, Ingestion.indexDir(out), "chunk_id")
    assert(ok2, msg2)
  }
}
