package graft.streaming

import graft.extract.Extractor
import graft.model.{ExtractedTurn, Turn}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Structured-Streaming twin of the batch `ExtractionPipeline`: turns
  * arriving on a stream are extracted with the SAME per-turn function
  * (identical output as the batch job on identical input — the goldens
  * hold for both), written append-only with an exactly-once checkpoint.
  *
  * The reference has no streaming (SURVEY.md §2.9); this is part of the
  * beyond-the-reference surface for continuous transcript ingestion:
  *
  * {{{
  * spark.readStream.schema(turnSchema).parquet(landingDir).as[Turn]
  *   |> StreamingExtraction.extracted
  *   |> StreamingExtraction.writer(_, outDir, checkpointDir)
  *   |> (_.start())
  * }}}
  *
  * Scale/ops notes:
  *  - extraction is a stateless per-row map — no watermark or state store
  *    needed; Spark scales it with input partitions exactly like batch;
  *  - the checkpoint gives resume-without-reprocessing across restarts
  *    (the streaming analog of the batch manifest in [[graft.pipeline.TableIO]]);
  *  - `bucket` is carried as the output partition column so downstream
  *    consumers see the same layout as the batch pipeline's tables;
  *  - ordering: a stream has no global order, so the per-turn invariant
  *    is keyed by (conv_id, turn_idx) — each turn's extraction is
  *    independent and deterministic, which is what makes the streaming
  *    and batch outputs row-identical.
  */
object StreamingExtraction {

  /** Stateless per-turn extraction, usable on a streaming or batch
    * Dataset alike (no action, no shuffle).
    */
  def extracted(turns: Dataset[Turn], nBuckets: Int = 64): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    turns.mapPartitions { it =>
      it.map { t =>
        val ex = Extractor.extract(t.text)
        // same layout as the batch job's unsalted buckets (salt 0; the
        // skew pre-pass needs a batch aggregate and does not apply to a
        // row-at-a-time stream)
        val bucket = graft.pipeline.ExtractionPipeline.bucketOf(t.conv_id, 0, nBuckets)
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, t.tool, t.ts, ex.kind, ex.text,
          ex.spans.map(_.start).toArray, ex.spans.map(_.end).toArray,
          ex.spans.map(_.label).toArray, ex.blockLens.toArray,
          ex.bytesParsed, ex.skipReason, bucket)
      }
    }
  }

  /** Append-only parquet sink with exactly-once checkpointing. Caller
    * invokes `.start()` (and optionally overrides the trigger).
    */
  def writer(ds: Dataset[ExtractedTurn], outDir: String,
      checkpointDir: String): DataStreamWriter[ExtractedTurn] =
    ds.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("bucket")
      .trigger(Trigger.AvailableNow())
}
