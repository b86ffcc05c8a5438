package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming quantile sketch over event-time windows — the streaming
  * twin of the battery's `q_hist_quantiles`: a FIXED-DOMAIN equi-width
  * histogram per watermarked window. Fixed bucket edges (not data-driven
  * min/max) are the streaming-correct choice: a two-pass domain scan
  * doesn't exist on an unbounded stream, and fixed edges keep the state
  * MERGEABLE — per-(window, bucket) counts are algebraic sums, so the
  * state store holds ≤ open_windows·B longs and append mode emits each
  * window's histogram exactly once when the watermark passes its end.
  *
  * Quantile extraction ([[quantiles]]) is a batch post-step on the tiny
  * emitted histogram (the standard lambda shape: sketch in the stream,
  * query the sketch at rest). Estimates carry the one-bucket-width error
  * bound; values outside [lo, hi) clamp to the edge buckets, preserving
  * rank semantics at the boundary.
  */
object StreamingQuantiles {

  /** Per-(window, bucket) counts of `value` over tumbling event-time
    * windows. Runs identically on a batch Dataset (watermark ignored).
    */
  def histogram(events: Dataset[Sessionize.Event], lo: Double, hi: Double,
      buckets: Int = 32, size: String = "1 hour",
      delay: String = "10 minutes"): DataFrame = {
    require(hi > lo && buckets > 0)
    val width = (hi - lo) / buckets
    events
      .withWatermark("ts", delay)
      .withColumn("b", least(lit(buckets - 1), greatest(lit(0),
        floor((col("value") - lit(lo)) / lit(width)).cast("int"))))
      .groupBy(window(col("ts"), size), col("b"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("b"), col("n"))
  }

  /** Quantile estimates (bucket upper edges) from an emitted histogram:
    * for each q (percent), the first bucket whose cumulative count
    * reaches ceil(q·N/100). Runs on the bounded histogram table.
    */
  def quantiles(hist: DataFrame, lo: Double, hi: Double, buckets: Int = 32,
      qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val width = (hi - lo) / buckets
    val w = Window.partitionBy("window_start", "window_end").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("window_start", "window_end")
    val cum = hist
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(tot))
    val qdf = cum.sparkSession.range(1).select(explode(
      expr("array(" + qs.map(q => s"${q}L").mkString(",") + ")")).as("q"))
    cum.join(broadcast(qdf), col("cum") >= expr("(q * total + 99) div 100"))
      .groupBy("window_start", "window_end", "q", "total")
      .agg(min("b").as("qb"))
      .withColumn("est", lit(lo) + (col("qb") + 1) * lit(width))
      .select(col("window_start"), col("window_end"), col("q"),
        col("total").as("n"), col("qb"), col("est"))
      .orderBy("window_start", "q")
  }
}
