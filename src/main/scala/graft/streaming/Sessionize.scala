package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Gap-based sessionization of the `events` stream, both as the
  * Structured Streaming stateful operator (this file) and as a batch
  * window plan (`TrainingDataQueries.q_sessionize` — same semantics,
  * oracle-checked in DuckDB).
  *
  * The reference has no streaming (SURVEY.md §2.9 — its only "state" is
  * TTL caches and a status enum); this operator is part of the
  * beyond-the-reference training-data surface: `readStream → watermark →
  * groupByKey(user).flatMapGroupsWithState → sessions`, the canonical
  * Spark shape for custom session state.
  *
  * Semantics (shared with the batch twin):
  *  - a session = consecutive events of one user with inter-event gap
  *    ≤ `gapSec` (default 1800 s);
  *  - a closed session emits (user, start, end, n_events, total_value);
  *  - in streaming, a session closes when a later event arrives past the
  *    gap, or on event-time timeout once the watermark passes
  *    last + gap.
  */
object Sessionize {

  val DefaultGapSec = 1800L

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val outEnc: Encoder[Session] = Encoders.product[Session]

  private def toSession(uid: Long, s: SessionState): Session =
    Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)

  /** The state-update function. Events within one trigger batch arrive
    * unordered — they are sorted by event time before folding.
    */
  def updateState(gapSec: Long)(
      uid: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val gapMs = gapSec * 1000L
    val closed = Vector.newBuilder[Session]

    if (events.isEmpty && state.hasTimedOut) {
      state.getOption.foreach(s => closed += toSession(uid, s))
      state.remove()
      return closed.result().iterator
    }

    var cur = state.getOption
    events.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last > gapMs =>
          closed += toSession(uid, s)
          cur = Some(SessionState(t, t, 1, e.value))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
            s.total + e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        // close via timeout when the watermark passes last + gap
        state.setTimeoutTimestamp(s.last + gapMs)
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Streaming sessionizer; call after `.withWatermark("ts", ...)`. */
  def sessions(events: Dataset[Event], gapSec: Long = DefaultGapSec): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateState(gapSec))
  }
}
