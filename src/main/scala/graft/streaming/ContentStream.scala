package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** True Structured Streaming forms of the reference's stateful semantics
  * (SURVEY.md §2A A10–A12, A17; §2B B25–B30). The batch twins in
  * `graft.contentops.ContentOps` are the DuckDB-oracle-checked versions;
  * StreamingSpec proves each streaming form converges to its batch twin on
  * the same fixture fed through MemoryStream in multiple microbatches.
  *
  * 100 TB notes: state is keyed on the composite document key, so state
  * distribution = shuffle partitioning on that key; the production config
  * swaps the default in-memory state store for RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`) since latest-state
  * over all documents is unbounded; per-shard arrival order maps to
  * per-partition order, and both stateful ops fold their per-batch group
  * in (event-time, seq) order so cross-shard interleaving cannot corrupt
  * state (the user-guide.md:125-139 gotcha).
  */
object ContentStream {

  /** `seq` is the wire contract's per-shard ordering key: a FIXED-WIDTH
    * decimal STRING (Kinesis sequence numbers overflow BIGINT; fixed width
    * makes lexicographic order numeric order — see graft.streaming
    * .WireSource). Every (date, seq) comparison below is therefore
    * (Long, String). */
  case class EnvelopeRow(seq: String, operation: String, date: Timestamp, id: String,
      branch: String, published: Boolean, created: Boolean, headline: String, wordCount: Int)

  case class DocKey(id: String, branch: String, published: Boolean)
  case class DocState(lastSeq: String, lastDate: Timestamp, operation: String,
      headline: String, wordCount: Int)
  case class StateChange(id: String, branch: String, published: Boolean, lastSeq: String,
      lastDate: Timestamp, headline: String, wordCount: Int, deleted: Boolean)

  case class PubKey(id: String, branch: String)
  case class PubState(exists: Boolean, lastSeq: String, lastDateMs: Long)
  case class PubEvent(id: String, branch: String, event: String, seq: String, date: Timestamp)

  private implicit val docKeyEnc: Encoder[DocKey] = Encoders.product[DocKey]
  private implicit val docStateEnc: Encoder[DocState] = Encoders.product[DocState]
  private implicit val changeEnc: Encoder[StateChange] = Encoders.product[StateChange]
  private implicit val pubKeyEnc: Encoder[PubKey] = Encoders.product[PubKey]
  private implicit val pubStateEnc: Encoder[PubState] = Encoders.product[PubState]
  private implicit val pubEventEnc: Encoder[PubEvent] = Encoders.product[PubEvent]

  /** A10/A11 streaming: latest-state materialization with delete
    * tombstones on Spark 4's transformWithState API (StatefulProcessor
    * lifecycle: explicit ValueState handle + TTL hook), keyed on the
    * composite document key. Emits the key's current state once per
    * microbatch that touches it (update semantics — the "synchronize a
    * foreign CMS" feed, user-guide.md:3). Rows fold in event-time order
    * on top of prior state; a full-state record only wins if strictly
    * newer (replacement semantics, user-guide.md:17,72).
    *
    * transformWithState requires the RocksDB state store provider —
    * exactly the production config SCALE.md prescribes for unbounded
    * latest-state. (This op was born on flatMapGroupsWithState and
    * migrated; the legacy-API pattern stays exercised by
    * [[publishTransitions]], which documents the contrast.)
    *
    * `ttl` is the retention policy for per-key state (the reference is
    * silent on it, so it is an explicit deployment decision): NONE keeps
    * every key forever — correct only while the key universe is bounded;
    * at corpus scale pass a processing-time TTL (e.g. 90 days) so keys
    * that stopped updating fall out of the store, bounding state size at
    * (active keys × state row) instead of (all keys ever). A record for an
    * expired key re-creates state from scratch, which for latest-state
    * semantics means a very-late stale record can resurrect as current —
    * the documented trade (StreamingSpec pins the behavior). */
  class LatestStateProcessor(ttl: TTLConfig)
      extends StatefulProcessor[DocKey, EnvelopeRow, StateChange] {
    @transient private var state: ValueState[DocState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DocState]("docState", docStateEnc, ttl)

    override def handleInputRows(key: DocKey, rows: Iterator[EnvelopeRow],
        timers: TimerValues): Iterator[StateChange] = {
      var cur = if (state.exists()) Option(state.get()) else None
      rows.toSeq.sortBy(e => (e.date.getTime, e.seq)).foreach { e =>
        val isNewer = cur.forall(c =>
          Ordering[(Long, String)].gt((e.date.getTime, e.seq), (c.lastDate.getTime, c.lastSeq)))
        if (isNewer)
          cur = Some(DocState(e.seq, e.date, e.operation, e.headline, e.wordCount))
      }
      cur match {
        case Some(c) =>
          state.update(c)
          Iterator.single(StateChange(key.id, key.branch, key.published,
            c.lastSeq, c.lastDate, c.headline, c.wordCount,
            deleted = c.operation.startsWith("delete")))
        case None => Iterator.empty
      }
    }
  }

  def latestState(ds: Dataset[EnvelopeRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[StateChange] = {
    // state TTL is a processing-time feature: a non-NONE ttl needs the
    // ProcessingTime time mode, NONE runs without a clock at all
    val timeMode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(e => DocKey(e.id, e.branch, e.published))
      .transformWithState(new LatestStateProcessor(ttl), timeMode, OutputMode.Update())
  }

  /** A12 streaming: publish/unpublish transition detection — keyed on
    * (id, branch), tracking existence of the published=true copy
    * (user-guide.md:141-143; note the key differs from latestState's,
    * the documented conflation trap). */
  def publishTransitions(ds: Dataset[EnvelopeRow]): Dataset[PubEvent] =
    ds.filter(_.published)
      .groupByKey(e => PubKey(e.id, e.branch))
      .flatMapGroupsWithState[PubState, PubEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: PubKey, rows: Iterator[EnvelopeRow], state: GroupState[PubState]) =>
          var st = state.getOption.getOrElse(PubState(exists = false, "", Long.MinValue))
          val out = Vector.newBuilder[PubEvent]
          rows.toSeq.sortBy(e => (e.date.getTime, e.seq)).foreach { e =>
            val newer = Ordering[(Long, String)].gt((e.date.getTime, e.seq), (st.lastDateMs, st.lastSeq))
            if (newer) {
              val isInsert = e.operation.startsWith("insert")
              if (isInsert && !st.exists)
                out += PubEvent(key.id, key.branch, "publish", e.seq, e.date)
              else if (!isInsert && st.exists)
                out += PubEvent(key.id, key.branch, "unpublish", e.seq, e.date)
              st = PubState(exists = isInsert, e.seq, e.date.getTime)
            }
          }
          state.update(st)
          out.result().iterator
      }

  /** A17 streaming: windowed publish analytics — watermarked hourly
    * tumbling counts of publish-proxy events by content type
    * (user-guide.md:3,145). */
  def publishAnalytics(envelope: DataFrame): DataFrame =
    envelope
      .filter(col("published") && col("created") && col("operation").startsWith("insert"))
      .withWatermark("date", "1 hour")
      .groupBy(window(col("date"), "1 hour").getField("start").as("hour"),
        split(col("operation"), "-").getItem(1).as("ctype"))
      .agg(count(lit(1)).as("n_published"))

  /** B28: streaming dedup on the composite key + seq within the watermark. */
  def dedupStream(envelope: DataFrame): DataFrame =
    envelope
      .withWatermark("date", "1 hour")
      .dropDuplicatesWithinWatermark("id", "branch", "published", "seq")
}
