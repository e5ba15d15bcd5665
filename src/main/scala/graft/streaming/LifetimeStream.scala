package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the churn hazard table (q147 / SURVEY B107): the
  * `(user_id, f, l)` first/last-day table the hazard derives from is
  * maintained incrementally from the event feed — min/max are
  * associative and idempotent-per-value, so per-batch merge order cannot
  * matter and the maintained table equals the batch aggregation exactly
  * once the same events have flowed through.
  *
  * Mirrors SaltStream/StatsStream: [[mergeLifetimes]] is the maintenance
  * operator, [[maintain]] the foreachBatch write-then-swap sink, and the
  * hazard itself is NOT reimplemented — run
  * `StreamSemantics.hazardFromLifetimes(maintained table)`, the very
  * function batch q147 executes, so stream ≡ batch by construction
  * (asserted exactly in StreamingSpec).
  *
  * 100 TB shape: the maintained table is user-grain (three longs); each
  * micro-batch shuffles only its own per-user partials. The hazard
  * re-derivation after each merge runs at user + duration-grid grain —
  * both ≪ the event stream the batch form would have to rescan.
  */
object LifetimeStream {

  /** Fold a micro-batch's per-user (f, l) partials into the table. */
  def mergeLifetimes(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy("user_id").agg(min("f").as("f"), max("l").as("l"))

  /** Maintain `(user_id, f, l)` at `table` from a raw `(user_id, day)`
    * stream. Batch-level idempotency: min/max re-merge safely even if a
    * batch replays (unlike additive counts — no transactional sink
    * needed for correctness here). */
  def maintain(events: DataFrame, table: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val delta = batch.groupBy("user_id").agg(min("day").as("f"), max("day").as("l"))
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else delta.limit(0)
        val merged = mergeLifetimes(current, delta)
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        GridSwap.swap(tmp, table)
        ()
      }
      .outputMode("update").start()
}
