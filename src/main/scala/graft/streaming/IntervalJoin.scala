package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — click→view attribution:
  * each click joins the SAME user's views inside a bounded lookback
  * window ending at the click. The one Structured Streaming join shape
  * the surface was missing next to [[WindowedStats]] (windowed agg) and
  * [[Sessionize]] (custom state); the reference has no streaming at all
  * (SURVEY.md §2.9), so this is beyond-reference plumbing for the
  * training-data event tables.
  *
  * Both sides carry a watermark and the join predicate carries the time
  * bound, which is exactly what Structured Streaming needs to bound the
  * join state: a buffered view row is evictable once the watermark
  * passes `view_ts + lookback`, a click row once it passes `click_ts`.
  * Without the time bound the state store grows with the whole history —
  * the streaming analog of an unbounded shuffle.
  *
  * The SAME function runs on batch Datasets (the watermark is ignored
  * there) — `IntervalJoinSpec` pins stream==batch row equality, and the
  * battery's `q_interval_join` oracle-checks the batch form against a
  * DuckDB range join. At batch scale the plan is a user_id equi-join
  * (hash/SMJ keyed on user) with the time predicate as a post-join
  * filter — per-user event lists are bounded, so no quadratic blowup.
  */
object IntervalJoin {

  /** Inner interval join: (click, view) pairs with matching user and
    * `click_ts - lookback < view_ts <= click_ts`.
    */
  def attribute(clicks: Dataset[Sessionize.Event],
      views: Dataset[Sessionize.Event],
      lookbackSec: Long = 600L, delay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", delay)
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    c.join(v,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") > col("click_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
      .select("click_id", "user_id", "click_ts", "view_id", "view_ts")
  }
}
