package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the adaptive salt planner (q138 / SURVEY B97): the
  * per-key count table the plan derives from is maintained incrementally
  * from the event stream, so the skew plan stays current WITHOUT ever
  * rescanning history — the property that matters when the aggregation
  * being protected runs hourly over an unbounded feed.
  *
  * Split of responsibilities, mirroring StatsStream:
  *  - [[mergeCounts]] is the maintenance operator: fold a micro-batch's
  *    per-key partial counts into the maintained `(user_id, freq)` table.
  *    Counts are sums of non-negative contributions, so the merge is
  *    associative and per-batch application order cannot matter.
  *  - [[maintain]] applies it per micro-batch through foreachBatch (the
  *    same write-then-swap parquet sink as StatsStream — standing in for
  *    a transactional MERGE target in production).
  *  - The plan itself is NOT reimplemented: run
  *    `ScaleOps.saltPlanFromCounts(maintained table)` — the very function
  *    batch q138 executes — so stream ≡ batch holds by construction, and
  *    StreamingSpec asserts the full-corpus convergence exactly.
  *
  * 100 TB shape: the maintained table is |keys|-grain (narrow: id +
  * long); each micro-batch shuffles only its own partial counts. The
  * derived plan stays hot-key-grain — metadata — and can be re-emitted
  * after every merge for the next scheduled aggregation to broadcast.
  */
object SaltStream {

  /** Fold per-key delta counts into the maintained count table. */
  def mergeCounts(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy("user_id").agg(sum("freq").as("freq"))

  /** Maintain `(user_id, freq)` at `table` from a raw event stream.
    * Batch-level idempotency caveat as StatsStream: a replayed batch
    * re-merges its rows — pair with an idempotent table format in
    * production. */
  def maintain(events: DataFrame, table: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val delta = batch.groupBy("user_id").agg(count(lit(1)).as("freq"))
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else delta.limit(0)
        val merged = mergeCounts(current, delta)
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        GridSwap.swap(tmp, table)
        ()
      }
      .outputMode("update").start()
}
