package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming twin of the q130 graph-centrality family (SURVEY B89): the
  * user-journey edge list kept current from the live event stream, so
  * the rank computation (StreamSemantics.rankFromEdges — SHARED with
  * batch q130) can re-run at any time on maintained counts instead of
  * rescanning the event log.
  *
  * Two stages, both already-proven shapes:
  *  - [[transitions]] extracts (src → dst) hops with
  *    flatMapGroupsWithState keyed on user, holding only each user's
  *    LAST event (the A12 publish-transition pattern, ContentStream):
  *    state is one row per user, constant per key, no timeline buffer.
  *  - [[maintain]] folds per-batch hop counts into the maintained
  *    (src, dst, ew) table via the foreachBatch merge sink (the
  *    StatsStream write-then-swap parquet stand-in for a Delta/Iceberg
  *    MERGE). Counts are associative sums, so micro-batch application
  *    order cannot change the result.
  *
  * Precondition (same in-order contract as the A12/A16 sequencing ops):
  * each user's events arrive in event-time order across micro-batches;
  * WITHIN a batch any order is fine ([[transitions]] sorts each user's
  * slice by the total (ts, event_id) order before chaining with state).
  *
  * 100 TB shape: per-user state is one (ts, event_id, type) triple; the
  * maintained table is |event_type|²-bounded metadata; each micro-batch
  * shuffles only its own hops. StreamingSpec proves the chain end to
  * end: maintained edges == batch lead() edges EXACTLY, and
  * rankFromEdges over them == batch q130.
  */
object EdgeStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
  case class LastEv(tsMillis: Long, tsNanos: Int, event_id: Long, event_type: String)
  case class Hop(src: String, dst: String)

  /** Per-user transition extraction; state = the user's last event. */
  def transitions(events: Dataset[Ev]): Dataset[Hop] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Hop](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Ev], state: GroupState[LastEv]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Hop]
          sorted.foreach { e =>
            last.foreach(l => out += Hop(l.event_type, e.event_type))
            last = Some(LastEv(e.ts.getTime, e.ts.getNanos, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Maintain the (src, dst, ew) edge-count table from a hop stream. */
  def maintain(hops: DataFrame, table: String): StreamingQuery =
    hops.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val delta = batch.groupBy("src", "dst").agg(count(lit(1)).as("ew"))
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else delta.limit(0)
        val merged = current.unionByName(delta)
          .groupBy("src", "dst").agg(sum("ew").as("ew"))
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val dir = new java.io.File(table)
        if (dir.exists) org.apache.commons.io.FileUtils.deleteDirectory(dir)
        new java.io.File(tmp).renameTo(dir)
        ()
      }
      // append: the only mode fMGWS(Append) upstream admits — correct
      // here anyway, since each hop is emitted exactly once
      .outputMode("append").start()
}
