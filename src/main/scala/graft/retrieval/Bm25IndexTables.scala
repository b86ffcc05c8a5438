package graft.retrieval

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The BM25 keyword index persisted as TABLES — the Spark-native
  * re-expression of the reference's JSON-blob index (rafalpronko/
  * pdf-parser `app/retrieval/bm25_index.py:238-315`: parallel arrays
  * `doc_ids/texts/tokenized_corpus` + k1/b params, full rebuild per
  * add/remove at `bm25_index.py:140-141,168-171`).
  *
  * Ours keeps the relational factorization instead:
  *   - `postings(doc_id, term, tf, dl)` — the inverted index
  *   - `doclens(doc_id, dl)` — row per doc incl. zero-token docs
  *     (they count toward N/avgdl in rank_bm25)
  * Derived stats (N, avgdl, df, idf) are recomputed by aggregation at
  * query time from the postings — they're one cheap pass, always
  * consistent, and never serialized stale (the reference's "corruption
  * detector" at `bm25_index.py:376-409` exists precisely because its
  * parallel arrays CAN drift; tables can't).
  *
  * Maintenance is incremental at partition granularity instead of the
  * reference's full O(corpus) rebuild:
  *   - add: append the new docs' postings/doclens
  *   - delete: anti-join rewrite (the S10 cascade-delete shape)
  *
  * Snapshot discipline: both tables live under a VERSION directory
  * (`v<N>/postings`, `v<N>/doclens`) and a single `current` pointer file
  * is atomically swapped per commit — one flip covers both tables, so a
  * reader never sees postings and doclens from different rewrites and a
  * crash mid-rewrite leaves the old version intact (the same
  * manifest-swap discipline [[graft.pipeline.TableIO]] uses). The
  * previous version is retained for in-flight readers; older ones are
  * garbage-collected.
  */
object Bm25IndexTables {

  import graft.pipeline.VersionedDir

  def postingsDir(indexDir: String): String =
    VersionedDir.tableDir(indexDir, "postings")
  def doclensDir(indexDir: String): String =
    VersionedDir.tableDir(indexDir, "doclens")

  private def flip(indexDir: String, v: Long): Unit = VersionedDir.flip(indexDir, v)
  private def gc(indexDir: String, v: Long): Unit = VersionedDir.gc(indexDir, v)

  /** Build (overwrite) the index tables from a corpus: write a fresh
    * version directory, then flip the pointer once.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit = {
    val v = VersionedDir.nextVersion(indexDir)
    val toks = Retrieval.tokenized(docs, idCol, textCol)
    toks.select(col(idCol), col("dl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/doclens")
    toks.select(col(idCol), col("dl"), explode(col("tokens")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/postings")
    flip(indexDir, v)
    gc(indexDir, v)
  }

  /** Append new documents (incremental add; caller guarantees new ids). */
  def add(docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit = {
    val toks = Retrieval.tokenized(docs, idCol, textCol)
    toks.select(col(idCol), col("dl"))
      .write.mode(SaveMode.Append).parquet(doclensDir(indexDir))
    toks.select(col(idCol), col("dl"), explode(col("tokens")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .write.mode(SaveMode.Append).parquet(postingsDir(indexDir))
  }

  /** Cascade delete: anti-join rewrite of both tables (S10 shape) into a
    * NEW version directory, committed by one pointer flip — readers see
    * either the old pair or the new pair, never a mix or a missing table.
    */
  def delete(spark: SparkSession, ids: DataFrame, idCol: String, indexDir: String): Unit = {
    val v = VersionedDir.nextVersion(indexDir)
    spark.read.parquet(postingsDir(indexDir))
      .join(broadcast(ids), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/postings")
    spark.read.parquet(doclensDir(indexDir))
      .join(broadcast(ids), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/doclens")
    flip(indexDir, v)
    gc(indexDir, v)
  }

  /** File compaction: incremental [[add]]s append a few small files per
    * batch; after many batches the listing/open overhead dominates scan
    * time. Rewrite both tables into a new version at a bounded partition
    * count and flip — contents unchanged, atomic like every other
    * version swap.
    */
  def compact(spark: SparkSession, indexDir: String, targetPartitions: Int = 8): Unit = {
    val v = VersionedDir.nextVersion(indexDir)
    spark.read.parquet(postingsDir(indexDir))
      .repartition(targetPartitions)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/postings")
    spark.read.parquet(doclensDir(indexDir))
      .repartition(math.max(1, targetPartitions / 2))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/v$v/doclens")
    flip(indexDir, v)
    gc(indexDir, v)
  }

  /** Score one query against the persisted index — the shared scoring
    * tail ([[Retrieval.bm25ScoresFromIndex]]) over the stored postings,
    * with N/avgdl from the doclens table (which keeps zero-token docs,
    * exactly like [[Retrieval.corpusStats]] over a live corpus).
    */
  def score(spark: SparkSession, indexDir: String, query: String,
      idCol: String, k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    val post = spark.read.parquet(postingsDir(indexDir))
    if (graft.text.Tokenizer.tokenize(query).isEmpty)
      return post.select(col(idCol)).limit(0).withColumn("score", lit(0.0))
    val stats = spark.read.parquet(doclensDir(indexDir))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    Retrieval.bm25ScoresFromIndex(post, stats, idCol, Seq(0 -> query), k1, b)
      .drop("v")
  }

  /** The reference's index invariants (`bm25_index.py:376-409`), as
    * relational assertions. Returns (ok, message).
    */
  def validate(spark: SparkSession, indexDir: String, idCol: String): (Boolean, String) = {
    val post = spark.read.parquet(postingsDir(indexDir))
    val lens = spark.read.parquet(doclensDir(indexDir))
    // docs with postings must exist in doclens
    val orphans = post.select(idCol).distinct()
      .join(lens.select(idCol), Seq(idCol), "left_anti").count()
    if (orphans > 0) return (false, s"$orphans posting docs missing doclens")
    // tf sums must equal dl for docs with postings
    val badLen = post.groupBy(idCol).agg(sum("tf").as("tfsum"), first("dl").as("dl"))
      .filter(col("tfsum") =!= col("dl")).count()
    if (badLen > 0) return (false, s"$badLen docs where sum(tf) != dl")
    // duplicate doclens rows
    val dups = lens.groupBy(idCol).count().filter(col("count") > 1).count()
    if (dups > 0) return (false, s"$dups duplicate doclens ids")
    (true, "ok")
  }
}
