package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregation over the `events` stream —
  * the canonical `readStream → withWatermark → groupBy(window(...))`
  * shape the engine's streaming surface was missing next to the custom
  * state of [[Sessionize]]. The reference has no streaming (SURVEY.md
  * §2.9); this is beyond-reference training-data plumbing: per-window
  * per-type event counts/volumes with bounded state.
  *
  * The SAME function runs on a batch Dataset (Spark ignores the
  * watermark there) — the streaming counterpart of the hourly
  * aggregation `q_events_window` oracle-checks (that query groups via
  * `date_trunc`-formatted strings, a different expression tree; what
  * the spec pins here is stream-vs-batch agreement OF THIS FUNCTION,
  * per finalized window).
  *
  * Scale notes: the watermark bounds the state store to the open windows
  * only (append mode emits each window once, when the watermark passes
  * its end, and drops later stragglers); the aggregation itself is the
  * standard partial-agg hash shuffle keyed by (window, event_type).
  */
object WindowedStats {

  /** Tumbling (or, with `slide`, sliding) event-time windows of per-type
    * counts and value totals. Call on a stream AFTER planning the source
    * with event-time column `ts`; `delay` is the lateness bound.
    */
  def windowed(events: Dataset[Sessionize.Event], size: String = "1 hour",
      slide: Option[String] = None, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(
        slide.fold(window(col("ts"), size))(s => window(col("ts"), size, s)),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
}
