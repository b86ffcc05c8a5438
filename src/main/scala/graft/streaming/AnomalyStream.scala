package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online z-score anomaly detection over the events stream — the
  * streaming twin of `q_anomaly_zscore` (RelationalQueries).
  *
  * Per event type, the moment sums (n, Σv, Σv²) accumulate in keyed
  * state as INTEGER millis (the batch query's quantization — exact and
  * order-immune, so restarts and replays cannot perturb them); each
  * micro-batch folds its events into the state FIRST and then judges
  * every event against the updated moments, i.e. "all data seen up to
  * and including this event's micro-batch". With the whole input in one
  * batch that is exactly the batch query's μ+3σ gate — the spec pins
  * the equality — and across batches it is the standard online
  * (prequential-style) detector whose sensitivity tightens as history
  * accumulates.
  *
  * Scale shape: state is THREE LONGS per event type (O(|types|) total,
  * not O(history)); each batch costs one pass over its own rows. The
  * `minPrior` guard keeps the detector quiet until a type has enough
  * history for σ to mean anything (n below it emits nothing — matching
  * how a fresh type behaves in production).
  */
object AnomalyStream {

  final case class Ev(event_id: Long, event_type: String, v: Long)

  final case class Moments(n: Long, s1: Long, s2: Long)

  final case class Flag(
      event_id: Long, event_type: String, v: Long, n_seen: Long, z: Double)

  implicit private val stateEnc: Encoder[Moments] = Encoders.product[Moments]
  implicit private val outEnc: Encoder[Flag] = Encoders.product[Flag]

  val DefaultMinPrior = 30L
  val DefaultZ = 3.0

  /** State fold + flagging for one event type and one micro-batch. */
  def updateState(minPrior: Long, zThresh: Double)(
      key: String,
      events: Iterator[Ev],
      state: GroupState[Moments]): Iterator[Flag] = {
    val evs = events.toVector
    val prior = state.getOption.getOrElse(Moments(0L, 0L, 0L))
    val next = evs.foldLeft(prior) { (m, e) =>
      Moments(m.n + 1, m.s1 + e.v, m.s2 + e.v * e.v)
    }
    state.update(next)
    if (next.n < minPrior) Iterator.empty
    else {
      // same expression shape as the batch query: casts exact,
      // div/sqrt correctly rounded
      val n = next.n.toDouble
      val mu = next.s1.toDouble / n
      val sigma = math.sqrt((next.s2.toDouble - next.s1.toDouble * next.s1.toDouble / n) / n)
      if (sigma == 0.0) Iterator.empty
      else evs.iterator
        .filter(e => e.v.toDouble > mu + zThresh * sigma)
        .map(e => Flag(e.event_id, key, e.v, next.n, (e.v.toDouble - mu) / sigma))
    }
  }

  /** Streaming detector over (event_id, event_type, v-millis) rows. */
  def flags(
      events: Dataset[Ev],
      minPrior: Long = DefaultMinPrior,
      zThresh: Double = DefaultZ): Dataset[Flag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateState(minPrior, zThresh))
  }
}
