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

  test("keyword-miss query degrades to vector-only ranking (source fallback)") {
    import spark.implicits._
    // the reference's hybrid search still answers when one source comes
    // back empty (hybrid_search.py fallback paths): a query whose tokens
    // never occur in the corpus zeroes every BM25 score (filtered by the
    // score>0 gate), so the fused ranking must equal the pure vector
    // ranking — weighted RRF over one non-empty list
    val q = "zzxqv qqwzk vbnmx"
    val post = spark.read.parquet(
      Bm25IndexTables.postingsDir(Ingestion.indexDir(outDir)))
    assert(post.filter(col("term").isin(q.split(" ").toSeq: _*)).count() == 0,
      "fixture: query terms must miss the corpus")
    val hits = QueryPipeline.query(spark, outDir, q, topK = 10)
      .select("chunk_id").as[String].collect().toSeq
    assert(hits.nonEmpty, "vector side alone must still answer")

    val qv = Ingestion.hashedEmbedding(q)
    val want = spark.read.parquet(Ingestion.embeddingsDir(outDir))
      .select(concat_ws(":", col("conv_id"), col("turn_idx"), col("chunk_index"))
        .as("chunk_id"),
        graft.retrieval.VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    assert(hits.sorted == want.sorted,
      "fused == pure-vector top-k when the keyword list is empty")
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

  test("P27: out-of-range top_k is rejected eagerly, before any plan is built") {
    // query.py:10 — top_k in [1, 20]; the API returns 422 on violation
    Seq(0, -1, 21, 1000).foreach { k =>
      val e = intercept[IllegalArgumentException](
        QueryPipeline.query(spark, outDir, "x", topK = k))
      assert(e.getMessage.contains("top_k"))
      intercept[IllegalArgumentException](
        QueryPipeline.queryExpanded(spark, outDir, "x", topK = k))
    }
  }

  test("P18: context string numbers every hit in fused order with page metadata") {
    val q = spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(outDir)))
      .groupBy("term").count().orderBy(desc("count"))
      .select("term").limit(2).collect().map(_.getString(0)).mkString(" ")
    val results = QueryPipeline.query(spark, outDir, q, topK = 5)
    val hits = results.collect()
    val ctx = QueryPipeline.contextString(results)
      .collect().head.getAs[String]("context")
    // one [Source i] block per hit, numbered 1..n in fused order
    (1 to hits.length).foreach(i => assert(ctx.contains(s"[Source $i] (Page "),
      s"missing source $i in:\n${ctx.take(400)}"))
    assert(!ctx.contains(s"[Source ${hits.length + 1}]"))
    // each hit's content appears, and block i carries hit i's content
    val blocks = ctx.split("\n\n")
    assert(blocks.length == hits.length)
    hits.zip(blocks).foreach { case (h, b) =>
      assert(b.contains(h.getAs[String]("content")))
      assert(b.contains(s"(Page ${h.getAs[Int]("turn_idx")},"))
    }
  }

  test("P19: source citations carry per-hit metadata; excluded when not requested") {
    val q = spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(outDir)))
      .groupBy("term").count().orderBy(desc("count"))
      .select("term").limit(2).collect().map(_.getString(0)).mkString(" ")
    val results = QueryPipeline.query(spark, outDir, q, topK = 5)
    val n = results.count()
    val srcs = QueryPipeline.sources(results).collect()
    assert(srcs.length == n, "one citation per hit")
    srcs.foreach { s =>
      assert(s.getAs[String]("doc_id").nonEmpty)
      assert(s.getAs[String]("filename") == s.getAs[String]("doc_id"),
        "filename falls back to the document id (query_service.py:482)")
      assert(s.getAs[Int]("page") >= 0)
      assert(s.getAs[String]("chunk_content").nonEmpty)
      assert(s.getAs[String]("modality") == "text")
      assert(s.getAs[Double]("relevance_score") > 0)
    }
    val off = QueryPipeline.sources(results, includeSources = false)
    assert(off.count() == 0, "include_sources=false returns no citations")
    assert(off.columns.toSeq == srcs.headOption.map(_ => off.columns.toSeq)
      .getOrElse(off.columns.toSeq)) // schema preserved either way
    assert(off.columns.sameElements(Array(
      "doc_id", "filename", "page", "chunk_content", "modality", "relevance_score")))
  }
}
