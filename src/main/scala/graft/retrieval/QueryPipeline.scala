package graft.retrieval

import graft.pipeline.{ExtractionPipeline, Ingestion}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's query lifecycle (`app/services/query_service.py:
  * 149-358`, SURVEY.md §3.2) executed against the tables OUR ingestion
  * pipeline wrote — embed the question with the same pluggable embedder,
  * score both retrieval sources, fuse, dedup, and attach content:
  *
  *   question → embed (hashed-feature stand-in, same fn as ingestion)
  *     → vector top-2k over the `embeddings` table (cosine = dot on unit
  *       vectors; the query vector is a broadcast literal — one narrow
  *       scan, no shuffle on the big side)
  *     ∥ BM25 top-2k over the postings/doclens index tables
  *     → weighted RRF (0.7/0.3, k = 60, `hybrid_search.py:198-202`)
  *     → deterministic tie-break (score desc, chunk_id asc — SURVEY §7.3)
  *     → top-k cut → broadcast join back to chunk content (J6/J3).
  */
object QueryPipeline {

  val PerSourceFetch = 40 // 2 × retrieval_k per source (hybrid_search.py:67-68)

  /** chunk_id used across the ingested tables. */
  private def chunkId = concat_ws(":",
    col("conv_id"), col("turn_idx"), col("chunk_index"))

  def query(spark: SparkSession, outDir: String, question: String,
      topK: Int = 10, dim: Int = Ingestion.DefaultDim,
      nprobe: Int = VectorIndex.DefaultNprobe): DataFrame = {
    val qv = Ingestion.hashedEmbedding(question, dim)

    // vector source: when the store carries an IVF index
    // ([[VectorIndex]]), probe it — a partition-pruned scan of nprobe
    // cells instead of the full embeddings table (the 100 TB plan);
    // otherwise brute-force the dot product against the unit-normalized
    // embeddings (exact baseline). Scores are bit-identical between the
    // two paths (shared dotColumn fold), only the candidate set differs.
    val vecScores = {
      val base =
        if (VectorIndex.exists(VectorIndex.indexRoot(outDir)))
          VectorIndex.probe(spark, VectorIndex.indexRoot(outDir), qv, nprobe)
        else
          spark.read.parquet(Ingestion.embeddingsDir(outDir))
            .select(chunkId.as("chunk_id"),
              VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      base.orderBy(desc("score"), col("chunk_id")).limit(PerSourceFetch)
    }

    // keyword source: BM25 over the index tables
    val kwScores = Bm25IndexTables
      .score(spark, Ingestion.indexDir(outDir), question, "chunk_id")
      .filter(col("score") > 0) // bm25_index.py:200-204
      .orderBy(desc("score"), col("chunk_id"))
      .limit(PerSourceFetch)

    // weighted RRF fusion + deterministic tie-break + cut
    val fused = Retrieval.rrfFuse(
        Seq(vecScores -> Retrieval.VectorWeight, kwScores -> Retrieval.KeywordWeight),
        "chunk_id", "score")
      .orderBy(desc("rrf_score"), col("chunk_id"))
      .limit(topK)

    // attach content (J6) — the fused side is ≤ topK rows, broadcast it
    val chunks = spark.read.parquet(ExtractionPipeline.chunksDir(outDir))
      .select(chunkId.as("chunk_id"), col("conv_id"), col("turn_idx"),
        col("chunk_index"), col("content"))
    chunks.join(broadcast(fused), "chunk_id")
      .orderBy(desc("rrf_score"), col("chunk_id"))
  }
}
