package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.Bm25IndexTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end ingestion lifecycle over the pipeline's own outputs:
  * extract → chunk → EMBED → STORE (vector table + BM25 index), the
  * reference's full upload path (`document_service.py:173-355`).
  */
class IngestionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def extractTo(out: String): Unit = {
    import spark.implicits._
    val turns = spark.createDataset(
      (0 until 30).flatMap(i => TranscriptGen.conversation(42L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
  }

  test("hashed embedding is deterministic, L2-normalized, token-order independent") {
    val a = Ingestion.hashedEmbedding("spark shuffles the big table")
    val b = Ingestion.hashedEmbedding("spark shuffles the big table")
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val c = Ingestion.hashedEmbedding("table big the shuffles spark")
    assert(a.toSeq == c.toSeq, "bag-of-words embedding ignores order")
    assert(Ingestion.hashedEmbedding("").forall(_ == 0f))
  }

  test("embed + index stages populate real tables over the chunk output") {
    val out = Files.createTempDirectory("ingest").toString
    extractTo(out)
    val nEmb = Ingestion.run(spark, out)

    val chunks = spark.read.parquet(ExtractionPipeline.chunksDir(out))
    val emb = spark.read.parquet(Ingestion.embeddingsDir(out))
    assert(nEmb == chunks.count(), "one embedding per chunk")
    assert(emb.select("conv_id", "turn_idx", "chunk_index").distinct().count() == nEmb)
    // all non-empty chunks produce unit vectors
    val norms = emb.select(expr(
      "abs(aggregate(embedding, 0D, (acc, x) -> acc + x * x) - 1.0) < 1e-5 AS unit"))
    assert(norms.filter(!col("unit")).count() == 0)

    val (ok, msg) = Bm25IndexTables.validate(spark, Ingestion.indexDir(out), "chunk_id")
    assert(ok, msg)
    // a token known to exist in the corpus scores hits against the index
    val someTok = spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(out)))
      .groupBy("term").count().orderBy(desc("count"))
      .select("term").first().getString(0)
    val hits = Bm25IndexTables.score(spark, Ingestion.indexDir(out), someTok, "chunk_id")
    assert(hits.count() > 0)
  }
}
