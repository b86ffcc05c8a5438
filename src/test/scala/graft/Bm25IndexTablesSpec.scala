package graft

import graft.retrieval.{Bm25IndexTables, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Reference BM25 index-maintenance properties P31-P33
  * (rafalpronko/pdf-parser `tests/retrieval/test_bm25_index.py:47-123`):
  * index updates on add, cleanup on delete, persistence round-trip —
  * against the table-backed index.
  */
class Bm25IndexTablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def tmp() = Files.createTempDirectory("bm25idx").toString

  test("P33: persisted scores equal in-memory scores (round-trip)") {
    val docs = corpus(
      1 -> "spark shuffle partition spark",
      2 -> "window function ranking",
      3 -> "spark table scan filter join",
      4 -> "completely unrelated words here")
    val dir = tmp()
    Bm25IndexTables.build(docs, "doc_id", "text", dir)
    val fromIndex = Bm25IndexTables.score(spark, dir, "spark join", "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val inMem = Retrieval.bm25Scores(docs, "doc_id", "text", "spark join")
      .orderBy("doc_id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(fromIndex.toSeq == inMem.toSeq)
    assert(Bm25IndexTables.validate(spark, dir, "doc_id") == (true, "ok"))
  }

  test("P31: add updates the index incrementally") {
    val dir = tmp()
    Bm25IndexTables.build(corpus(1 -> "alpha beta gamma"), "doc_id", "text", dir)
    Bm25IndexTables.add(corpus(2 -> "alpha delta epsilon"), "doc_id", "text", dir)
    val scored = Bm25IndexTables.score(spark, dir, "alpha", "doc_id")
    assert(scored.count() == 2)
    // incremental result == full rebuild result
    val rebuilt = tmp()
    Bm25IndexTables.build(
      corpus(1 -> "alpha beta gamma", 2 -> "alpha delta epsilon"),
      "doc_id", "text", rebuilt)
    val a = scored.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Bm25IndexTables.score(spark, rebuilt, "alpha", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(Bm25IndexTables.validate(spark, dir, "doc_id") == (true, "ok"))
  }

  test("P32: delete cascades and leaves a valid index") {
    import spark.implicits._
    val dir = tmp()
    Bm25IndexTables.build(corpus(
      1 -> "keep these words", 2 -> "drop those words", 3 -> "keep more content"),
      "doc_id", "text", dir)
    Bm25IndexTables.delete(spark, Seq(2).toDF("doc_id"), "doc_id", dir)
    val post = spark.read.parquet(Bm25IndexTables.postingsDir(dir))
    assert(post.filter(col("doc_id") === 2).count() == 0)
    assert(spark.read.parquet(Bm25IndexTables.doclensDir(dir))
      .filter(col("doc_id") === 2).count() == 0)
    assert(Bm25IndexTables.validate(spark, dir, "doc_id") == (true, "ok"))
    // remaining docs still searchable
    assert(Bm25IndexTables.score(spark, dir, "keep", "doc_id").count() == 2)
  }

  test("validate detects a corrupted index") {
    import spark.implicits._
    val dir = tmp()
    Bm25IndexTables.build(corpus(1 -> "aa bb cc"), "doc_id", "text", dir)
    // corrupt: append a postings row for a doc with no doclens entry
    Seq((99, 3, "zz", 1L)).toDF("doc_id", "dl", "term", "tf")
      .write.mode("append").parquet(Bm25IndexTables.postingsDir(dir))
    val (ok, msg) = Bm25IndexTables.validate(spark, dir, "doc_id")
    assert(!ok && msg.contains("missing"))
  }
}
