package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.{Bm25IndexTables, QueryPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Full lifecycle closed loop: ingest a corpus with our own pipeline,
  * then answer queries against the ingested store with the reference's
  * hybrid funnel semantics.
  */
class QueryPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val outDir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("qp").toString
    val turns = spark.createDataset(
      (0 until 40).flatMap(i => TranscriptGen.conversation(42L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
    Ingestion.run(spark, out)
    out
  }

  test("hybrid query over the ingested store returns ranked, contentful hits") {
    // pick a query from words that actually occur in the corpus
    val q = spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(outDir)))
      .groupBy("term").count().orderBy(desc("count"))
      .select("term").limit(3).collect().map(_.getString(0)).mkString(" ")
    val hits = QueryPipeline.query(spark, outDir, q, topK = 10).collect()

    assert(hits.nonEmpty && hits.length <= 10)
    val scores = hits.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "descending rrf")
    assert(hits.forall(_.getAs[String]("content").nonEmpty))
    // exact-keyword recall (reference hybrid property P7): at least one
    // hit's content contains a query term
    val terms = q.split(" ")
    assert(hits.exists(h => terms.exists(h.getAs[String]("content").toLowerCase.contains)))
  }

  test("query is deterministic across runs") {
    val q = "the table of content"
    val a = QueryPipeline.query(spark, outDir, q).collect().map(_.getAs[String]("chunk_id"))
    val b = QueryPipeline.query(spark, outDir, q).collect().map(_.getAs[String]("chunk_id"))
    assert(a.sameElements(b))
  }

  test("multi-variation lifecycle: expansion, dedup, rerank, re-fusion") {
    val q = "tool output table"
    val expansions = Seq("assistant explains structure", "code block content")
    val hits = QueryPipeline.queryExpanded(spark, outDir, q, expansions).collect()

    assert(hits.nonEmpty && hits.length <= QueryPipeline.FinalTopK)
    assert(hits.map(_.getAs[String]("chunk_id")).distinct.length == hits.length,
      "dedup across variations leaves no duplicate chunk")
    val scores = hits.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(hits.forall(_.getAs[String]("content").nonEmpty))

    // deterministic across runs (reference ties are dict-order; ours are fixed)
    val again = QueryPipeline.queryExpanded(spark, outDir, q, expansions)
      .collect().map(_.getAs[String]("chunk_id"))
    assert(again.sameElements(hits.map(_.getAs[String]("chunk_id"))))

    // single-variation run (no expansions) also works and is bounded
    val solo = QueryPipeline.queryExpanded(spark, outDir, q).collect()
    assert(solo.nonEmpty && solo.length <= QueryPipeline.FinalTopK)

    // a distinctive expansion can only widen the candidate pool: every
    // solo hit's chunk stays retrievable (recall never shrinks to zero)
    assert(solo.map(_.getAs[Double]("rrf_score")).forall(_ > 0))
  }
}
