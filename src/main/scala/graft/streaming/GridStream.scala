package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the (event_type, day, n) feed-day grid —
  * ONE maintained table feeding TWO batch consumers: q151's freshness
  * audit (`ScaleOps.freshnessFromGrid`) and q157's leaderboard churn
  * (`StreamSemantics.churnFromGrid`). Both derivations are pure
  * functions of the grid, so maintaining the grid once keeps BOTH
  * reports current without either rescanning history — the maintained-
  * aggregate family's first shared-substrate member (additive-count
  * state class, as SaltStream).
  *
  * 100 TB shape: the grid is |feeds|·|days| — calendar-bounded metadata
  * however many events arrive; each micro-batch shuffles only its own
  * (feed, day) partial counts; re-deriving both reports after a merge
  * costs window passes over the grid alone.
  */
object GridStream {

  /** Fold a micro-batch's per-(feed, day) partial counts into the grid. */
  def mergeGrid(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy("event_type", "day").agg(sum("n").as("n"))

  /** Maintain the grid at `table` from a raw (event_type, day) stream.
    * Additive-count state: pair with an idempotent table format in
    * production (the StatsStream caveat). */
  def maintain(events: DataFrame, table: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val delta = batch.groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else delta.limit(0)
        val merged = mergeGrid(current, delta)
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        GridSwap.swap(tmp, table)
        ()
      }
      .outputMode("update").start()
}
