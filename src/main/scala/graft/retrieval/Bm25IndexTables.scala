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

  /** Score one query against the persisted index (same math as
    * [[Retrieval.bm25Scores]], reading tables instead of re-tokenizing).
    */
  def score(spark: SparkSession, indexDir: String, query: String,
      idCol: String, k1: Double = Retrieval.DefaultK1,
      b: Double = Retrieval.DefaultB): DataFrame = {
    val post = spark.read.parquet(postingsDir(indexDir))
    val lens = spark.read.parquet(doclensDir(indexDir))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfTable = post.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_raw",
        log(col("n_docs") - col("df") + lit(0.5)) - log(col("df") + lit(0.5)))
    val idfStats = dfTable.agg(avg(col("idf_raw")).as("avg_idf"))
    val idf = dfTable.crossJoin(broadcast(idfStats))
      .withColumn("idf",
        when(col("idf_raw") < 0, lit(Retrieval.Epsilon) * col("avg_idf"))
          .otherwise(col("idf_raw")))
      .select(col("term"), col("idf"))
    val qTerms = graft.text.Tokenizer.tokenize(query)
      .groupBy(identity).map { case (t, os) => (t, os.size) }.toSeq
    if (qTerms.isEmpty)
      return post.select(col(idCol)).limit(0).withColumn("score", lit(0.0))
    val qDf = spark.createDataFrame(qTerms).toDF("term", "qn")
    post
      .join(broadcast(qDf), "term")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        col("qn") * col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(idCol)
      .agg(sum(col("contrib")).as("score"))
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
