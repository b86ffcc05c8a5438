package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Stream-stream backward as-of join — the streaming twin of the batch
  * [[graft.plans.AsofJoin]] operator: each purchase event attaches the
  * latest prior-or-equal view of the same user, tolerating out-of-order
  * arrival on BOTH sides up to the watermark delay.
  *
  * Why not a plain stream-stream join: Structured Streaming's interval
  * join ([[IntervalJoin]]) emits EVERY view in the window; "the latest
  * prior view" is an argmax per purchase, which needs custom state. The
  * canonical shape is one merged, user-keyed stream through
  * `flatMapGroupsWithState` with event-time timeouts.
  *
  * Correctness under reordering: a purchase can only be finalized once
  * the watermark passes its event time — any view that could still
  * arrive has `view_ts > watermark >= purchase_ts` and therefore cannot
  * be a match. Until then the purchase is buffered.
  *
  * State is BOUNDED: buffered purchases live only until the watermark
  * passes them (≤ the watermark delay's worth of events per user), and
  * of the views at-or-before the watermark only the single latest is
  * retained (any future purchase has a later event time, so the newer
  * view always wins) — O(out-of-orderness) + O(1) per user, never the
  * history.
  */
object AsofStream {

  final case class Enriched(
      user_id: Long, purchase_id: Long, purchase_ts: Timestamp,
      view_id: Option[Long], view_ts: Option[Timestamp])

  final case class AsofState(pending: Vector[(Long, Long)], // (id, ts) purchases
      views: Vector[(Long, Long)]) // (id, ts) views

  implicit private val stateEnc: Encoder[AsofState] = Encoders.product[AsofState]
  implicit private val outEnc: Encoder[Enriched] = Encoders.product[Enriched]

  /** State update: buffer both sides, finalize purchases at-or-before the
    * watermark against the latest matching view, evict dominated views.
    */
  def updateState(
      uid: Long,
      events: Iterator[Sessionize.Event],
      state: GroupState[AsofState]): Iterator[Enriched] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(AsofState(Vector.empty, Vector.empty))

    var pending = prev.pending
    var views = prev.views
    events.foreach { e =>
      val rec = (e.event_id, e.ts.getTime)
      if (e.event_type == "purchase") pending = pending :+ rec
      else views = views :+ rec
    }

    // finalize: every buffered purchase at-or-before the watermark — all
    // views that could precede it have arrived. Deterministic order and
    // deterministic tie-break (latest ts, then largest id).
    val (ready, still) = pending.partition(_._2 <= wm)
    val out = ready.sortBy(p => (p._2, p._1)).map { case (pid, pts) =>
      val m = views.filter(_._2 <= pts)
      val best = if (m.isEmpty) None else Some(m.maxBy(v => (v._2, v._1)))
      Enriched(uid, pid, new Timestamp(pts),
        best.map(_._1), best.map(v => new Timestamp(v._2)))
    }

    // evict: among views at-or-before the watermark only the latest can
    // ever match again (any future purchase is later than the watermark);
    // views beyond it stay buffered for purchases still in flight
    val (settled, ahead) = views.partition(_._2 <= wm)
    val baseline =
      if (settled.isEmpty) Vector.empty
      else Vector(settled.maxBy(v => (v._2, v._1)))
    val next = AsofState(still, baseline ++ ahead)

    if (next.pending.isEmpty && next.views.isEmpty) state.remove()
    else {
      state.update(next)
      // flush buffered purchases when the watermark passes the earliest —
      // even if no further events arrive for this user
      if (next.pending.nonEmpty)
        state.setTimeoutTimestamp(next.pending.map(_._2).min)
    }
    out.iterator
  }

  /** Streaming enrichment; call on a MERGED purchase+view event stream
    * after `.withWatermark("ts", ...)`.
    */
  def enrich(events: Dataset[Sessionize.Event]): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateState)
  }
}
