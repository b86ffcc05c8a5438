package graft.streaming

import graft.model.Turn
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Ordered turn reassembly as a streaming operator: turns of one
  * conversation arrive out of order (retries, parallel producers,
  * shuffled landing files), and downstream extraction wants them in
  * `turn_idx` order without waiting for whole conversations — the
  * north rule's "stable turn ordering" contract moved INTO the stream.
  *
  * Emits, per conversation, the longest CONTIGUOUS prefix seen so far:
  * a turn is released the moment every lower `turn_idx` has been
  * released, so ordered input flows through with no latency and a gap
  * holds back only the turns behind it. Duplicate deliveries of an
  * already-released or already-buffered index are dropped (at-least-
  * once upstream → exactly-once release).
  *
  * Built on the Spark 4 `transformWithState` API (arbitrary state v2,
  * RocksDB-backed — requires
  * `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`) with two typed state variables
  * per conversation:
  *   - `nextIdx: ValueState[Int]` — the next index to release;
  *   - `buffered: MapState[Int, Turn]` — out-of-order turns ahead of
  *     the gap, keyed by index (point lookups/deletes, no full-list
  *     rewrite per row — the reason MapState beats ListState here).
  * State is O(out-of-orderness) per conversation, not O(history): a
  * released turn leaves the store immediately. For abandoned
  * conversations pass a TTL, which bounds state by wall-clock age
  * (`TTLConfig` is per-state-variable; TTL requires
  * `TimeMode.ProcessingTime`). TTL semantics are WHOLESALE abandonment:
  * pick a TTL far above the worst-case out-of-orderness window, so only
  * conversations idle that long age out (the frontier is rewritten on
  * every batch that touches the key, keeping it at least as fresh as
  * the buffers; a buffered turn expiring while the conversation stays
  * active would otherwise leave its gap unfillable).
  *
  * Contract: `turn_idx` is 0-based and contiguous per conversation
  * (the `input_hint` schema). Negative indices are rejected loudly; a
  * conversation whose indices start above 0 buffers until its 0 arrives
  * — by design, since a missing prefix is indistinguishable from an
  * out-of-order one.
  *
  * The batch twin of this operator is a plain
  * `sortWithinPartitions(conv_id, turn_idx)` after the bucket
  * repartition ([[graft.pipeline.ExtractionPipeline]]) — the spec pins
  * stream == batch on gap-free input.
  */
object TurnAssembler {

  class Processor(ttl: TTLConfig) extends StatefulProcessor[String, Turn, Turn] {
    @transient private var nextIdx: ValueState[Int] = _
    @transient private var buffered: MapState[Int, Turn] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nextIdx = getHandle.getValueState[Int]("nextIdx", Encoders.scalaInt, ttl)
      buffered = getHandle.getMapState[Int, Turn](
        "buffered", Encoders.scalaInt, Encoders.product[Turn], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[Turn],
        timerValues: TimerValues): Iterator[Turn] = {
      val released = if (nextIdx.exists()) nextIdx.get() else 0
      rows.foreach { t =>
        // the contract is 0-based contiguous turn_idx (input_hint int32
        // from 0) — a negative index would silently disappear behind the
        // frontier, so reject it loudly
        if (t.turn_idx < 0) throw new IllegalArgumentException(
          s"TurnAssembler: negative turn_idx ${t.turn_idx} for conversation $key")
        // drop duplicates of released or buffered indices
        if (t.turn_idx >= released && !buffered.containsKey(t.turn_idx))
          buffered.updateValue(t.turn_idx, t)
      }
      // release the contiguous run from the gap frontier
      val out = Vector.newBuilder[Turn]
      var n = released
      while (buffered.containsKey(n)) {
        out += buffered.getValue(n)
        buffered.removeKey(n)
        n += 1
      }
      // write the frontier EVERY batch, not only on release: a TTL'd
      // ValueState renews on write, so an active conversation stuck
      // behind a gap keeps its frontier alive as long as turns keep
      // arriving — otherwise the frontier could expire while buffers
      // live, resetting to 0 and re-emitting released turns
      nextIdx.update(n)
      out.result().iterator
    }
  }

  /** Streaming assembler; append-mode, per-conversation state. */
  def assemble(turns: Dataset[Turn], ttl: TTLConfig = TTLConfig.NONE,
      timeMode: TimeMode = TimeMode.None()): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .transformWithState(new Processor(ttl), timeMode, OutputMode.Append())
  }
}
