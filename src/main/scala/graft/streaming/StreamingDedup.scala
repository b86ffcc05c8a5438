package graft.streaming

import graft.model.Turn
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Exact-duplicate suppression over a turn/document stream, keyed on the
  * content hash, with WATERMARK-BOUNDED state — the streaming twin of
  * the batch `q_dedup_exact` (hash-groupBy) for continuous training-data
  * ingestion.
  *
  * Scale note: plain streaming `dropDuplicates` must keep EVERY key seen
  * in the state store forever — unbounded growth on an unbounded corpus
  * stream. `dropDuplicatesWithinWatermark` evicts hash state once the
  * watermark passes it: duplicates arriving within `delay` of each other
  * collapse to the first; a copy arriving LATER than the watermark bound
  * is re-admitted (bounded-state semantics, stated rather than hidden —
  * cross-horizon dedup belongs to the batch compaction pass, which runs
  * `q_dedup_exact` over the full store).
  */
object StreamingDedup {

  /** One survivor per content hash within the watermark horizon. Across
    * micro-batches the earlier batch's survivor holds; WITHIN one batch
    * the engine's survivor choice is arbitrary (dropDuplicatesWithin
    * Watermark semantics). The batch-mode path is deterministic
    * first-wins by (ts, conv_id, turn_idx).
    */
  def dedupByContent(turns: Dataset[Turn], delay: String = "1 hour"): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    val deduped =
      if (turns.isStreaming)
        turns.withWatermark("ts", delay)
          .withColumn("content_hash", md5(col("text")))
          .dropDuplicatesWithinWatermark("content_hash")
      else
        // batch: deterministic first-wins (dropDuplicates-after-orderBy
        // makes no survivor guarantee; the window does)
        graft.retrieval.Retrieval.firstWinsDedup(
          turns.withColumn("content_hash", md5(col("text"))),
          "content_hash", col("ts").asc, col("conv_id").asc, col("turn_idx").asc)
    deduped.drop("content_hash").as[Turn]
  }
}
