package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** True Structured Streaming form of q166's event-time disorder audit
  * (`operators/StreamSemantics`): the per-feed high-water mark and
  * straggler totals maintained incrementally in `transformWithState` —
  * O(1) state per feed (hwm, n, n_late, max_lag), where the batch form
  * needs its two-phase block decomposition precisely because it has no
  * maintained hwm to lean on. This is the op a consumer would actually
  * run against the live wire to TUNE its watermark before the batch
  * audit ever sees the data.
  *
  * Scope mirrors what maintained state can express exactly: counts, the
  * hwm, and the worst lag. The rank-based p95 is deliberately NOT
  * maintained — an exact running quantile needs the full lag multiset
  * (unbounded state); the batch q166 owns that number. Convergence
  * (StreamingSpec): totals after the final microbatch equal batch q166's
  * `(n_events, n_late, max_lag_ms)` on the same fixture, fed in
  * arrival (event_id) order — the same order the batch form's block
  * prefix reconstructs.
  */
object DisorderStream {

  case class WireEvent(eventId: Long, ts: Timestamp, eventType: String)
  case class FeedDisorder(eventType: String, nEvents: Long, nLate: Long,
      maxLagUs: Long, hwmUs: Long)
  case class DisorderState(hwmUs: Long, nEvents: Long, nLate: Long, maxLagUs: Long)

  private implicit val eventEnc: Encoder[WireEvent] = Encoders.product[WireEvent]
  private implicit val outEnc: Encoder[FeedDisorder] = Encoders.product[FeedDisorder]
  private implicit val stateEnc: Encoder[DisorderState] = Encoders.product[DisorderState]
  private implicit val keyEnc: Encoder[String] = Encoders.STRING

  /** Matches batch q166's `unix_micros(ts)` exactly. */
  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  class DisorderProcessor extends StatefulProcessor[String, WireEvent, FeedDisorder] {
    @transient private var st: ValueState[DisorderState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DisorderState]("disorder",
        Encoders.product[DisorderState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[WireEvent],
        timers: TimerValues): Iterator[FeedDisorder] = {
      var s = if (st.exists()) st.get()
        else DisorderState(hwmUs = -1L, nEvents = 0L, nLate = 0L, maxLagUs = 0L)
      // arrival order within the batch is the ingest sequence (event_id)
      // — the exact order batch q166's block prefix reconstructs
      rows.toSeq.sortBy(_.eventId).foreach { e =>
        val us = micros(e.ts)
        val lag = if (s.hwmUs > us) s.hwmUs - us else 0L
        s = DisorderState(
          hwmUs = math.max(s.hwmUs, us),
          nEvents = s.nEvents + 1,
          nLate = s.nLate + (if (lag > 0) 1 else 0),
          maxLagUs = math.max(s.maxLagUs, lag))
      }
      st.update(s)
      Iterator.single(FeedDisorder(key, s.nEvents, s.nLate, s.maxLagUs, s.hwmUs))
    }
  }

  /** One summary row per feed per microbatch (running totals); the last
    * row per feed is the converged audit. TimeMode.None: the hwm IS the
    * clock; nothing here is watermark-evicted. */
  def disorder(ds: Dataset[WireEvent]): Dataset[FeedDisorder] =
    ds.groupByKey(_.eventType)
      .transformWithState(new DisorderProcessor, TimeMode.None(), OutputMode.Append())
}
