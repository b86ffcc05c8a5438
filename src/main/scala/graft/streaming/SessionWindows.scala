package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Native `session_window` gap sessionization — the streaming twin of
  * the batch query `q_session_window` (RelationalQueries) and the
  * built-in counterpart of the hand-rolled state in [[Sessionize]].
  *
  * Three gap-sessionization surfaces now coexist, deliberately:
  * `q_sessionize` (lag + running break sum — the pure-SQL form any
  * engine can run), [[Sessionize]] (`flatMapGroupsWithState` — custom
  * state for semantics the built-ins can't express), and this one
  * (`session_window` — Spark's native merging session windows, the
  * form that runs IDENTICALLY in batch and under Structured Streaming
  * with watermark-driven state eviction; this spec-pinned equality is
  * the claim).
  *
  * Semantics: a session is the transitive merge of [ts, ts+gap)
  * windows, so two events belong together iff consecutive gaps are
  * strictly < `gap`; `session_end` = last ts + gap. Values quantize to
  * integer millis before the sum so per-session totals are
  * order-immune BIGINTs (same discipline as the oracle-checked batch
  * query).
  *
  * Scale notes: the merge is keyed on user_id — one linear shuffle;
  * under streaming the state store holds only OPEN sessions (append
  * mode emits a session once the watermark passes its close and drops
  * later stragglers); per-key state is bounded by the open session's
  * event count, never history.
  */
object SessionWindows {

  /** Per-user gap sessions with event counts and milli-quantized value
    * totals. Runs on a batch Dataset (watermark ignored) or a stream
    * (append mode emits finalized sessions only).
    */
  def sessions(events: Dataset[Sessionize.Event], gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000 + 0.5).cast("long")).as("total_v"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("total_v"))
}
