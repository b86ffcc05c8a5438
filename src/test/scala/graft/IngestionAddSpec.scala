package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.Bm25IndexTables
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Incremental ingestion — the reference's per-upload lifecycle
  * (`document_service.py:173-355`) — must be CONTENT-equivalent to a
  * batch rebuild: a store built from corpus A then `Ingestion.add`-ed
  * corpus B carries exactly the embeddings and BM25 index rows of one
  * build over A ∪ B, and the extended index still validates and scores.
  */
class IngestionAddSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NBuckets = 4

  private def extractConvs(range: Range): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("ingadd").toString
    val turns = spark.createDataset(
      range.flatMap(i => TranscriptGen.conversation(7L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = NBuckets, waves = 1, resume = false))
    out
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("add-ing new conversations equals a batch build over the union") {
    import spark.implicits._

    // store over A (convs 0-5), staging pipeline output for B (convs 6-9)
    val storeA = extractConvs(0 until 6)
    Ingestion.run(spark, storeA)
    val stagingB = extractConvs(6 until 10)
    val added = Ingestion.add(spark, storeA, stagingB)
    assert(added > 0, "staging corpus produced chunks")

    // reference batch store over A ∪ B
    val storeAll = extractConvs(0 until 10)
    Ingestion.run(spark, storeAll)

    // embeddings content identical (vectors compared through their values)
    def embRows(out: String): Seq[(String, Int, Int, Seq[Float])] =
      spark.read.parquet(Ingestion.embeddingsDir(out))
        .select("conv_id", "turn_idx", "chunk_index", "embedding")
        .as[(String, Int, Int, Seq[Float])].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(embRows(storeA) == embRows(storeAll),
      "incremental embeddings == batch embeddings")

    // index contents identical
    assert(
      sortedRows(spark.read.parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(storeA)))) ==
      sortedRows(spark.read.parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(storeAll)))))
    assert(
      sortedRows(spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(storeA)))) ==
      sortedRows(spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(storeAll)))))

    // the extended index still validates, and scoring reaches B's chunks
    val (ok, msg) = Bm25IndexTables.validate(spark, Ingestion.indexDir(storeA), "chunk_id")
    assert(ok, msg)
    val bChunk = spark.read
      .parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(storeA)))
      .filter(org.apache.spark.sql.functions.col("chunk_id").startsWith("conv-000006:"))
    assert(bChunk.count() > 0, "added conversations are in the index")
  }

  test("add is additive only — pre-existing rows are untouched") {
    import org.apache.spark.sql.functions._
    val store = extractConvs(0 until 5)
    Ingestion.run(spark, store)
    val before = sortedRows(
      spark.read.parquet(Ingestion.embeddingsDir(store))).toSet
    val staging = extractConvs(5 until 8)
    Ingestion.add(spark, store, staging)
    val after = sortedRows(spark.read.parquet(Ingestion.embeddingsDir(store))).toSet
    assert(before.subsetOf(after), "existing embeddings survive the add byte-identically")
    val newConvs = spark.read.parquet(Ingestion.embeddingsDir(store))
      .select("conv_id").distinct()
      .filter(col("conv_id") >= "conv-000005").count()
    assert(newConvs == 3)
  }
}
