package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of q238's bucketed interval-overlap join
  * (`operators/RelationalCore.scala` — incident blast-radius) — and the
  * reason the grid decomposition matters beyond batch: a raw interval
  * overlap is NOT an equi-join, so Structured Streaming cannot
  * hash-partition or plan it at all (stream-static joins need a key).
  * Exploding each arriving span to its covering 30-min buckets turns
  * the match into a plain stream-static EQUI-join on the bucket — the
  * exact predicate filters in-bucket, exactly as in batch — so the
  * whole candidate path runs AS A STREAM, not as a per-batch rescan.
  *
  * Dedup discipline: a pair that co-occupies two grid cells duplicates
  * WITHIN one micro-batch only (a span's exploded rows all travel in
  * its batch), so batch-local `distinct` is complete; epoch-overwrite
  * ([[DeltaLogSink.epochOverwrite]]) absorbs foreachBatch retries. The
  * read view re-aggregates the pair log into q238's per-day report — a
  * pure function of the log, each pair in exactly one epoch.
  *
  * 100 TB shape: the static incident grid broadcasts (incident windows
  * are metadata-sized next to the span stream); each micro-batch's work
  * is ∝ its own spans × their bucket fan-out (≤ ⌈len/30min⌉ + 1).
  */
object GridJoinStream {
  val BucketUs: Long = 1800000000L

  /** Static side: incident windows `(inc_id, is_, ie)` exploded to
    * their covering buckets. */
  def incidentGrid(incidents: DataFrame): DataFrame =
    incidents.withColumn("bkt",
      explode(expr(s"sequence(is_ div $BucketUs, (ie - 1) div $BucketUs)")))

  /** The streaming transform: spans `(span_id, ss, se)` → exact overlap
    * pairs via the bucket equi-join. Usable on a batch frame too — the
    * convergence spec runs the SAME function both ways. */
  def overlapPairs(spans: DataFrame, staticGrid: DataFrame): DataFrame =
    spans.withColumn("bkt",
        explode(expr(s"sequence(ss div $BucketUs, (se - 1) div $BucketUs)")))
      .join(broadcast(staticGrid), Seq("bkt"))
      .filter(col("ss") < col("ie") && col("is_") < col("se"))
      .select(col("inc_id"), col("span_id"), col("is_"),
        (least(col("se"), col("ie")) - greatest(col("ss"), col("is_")))
          .as("ov_us"))

  def maintain(spans: DataFrame, staticGrid: DataFrame, table: String): StreamingQuery =
    overlapPairs(spans, staticGrid).writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        DeltaLogSink.epochOverwrite(table)(b.distinct(), id)
      }
      .start()

  /** q238's per-day report from the pair log (pure function of it). */
  def dailyView(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)
      .groupBy("inc_id", "is_")
      .agg(count(lit(1)).as("n_spans"), sum("ov_us").as("ov_us"))
      .groupBy(expr("CAST(to_date(timestamp_micros(is_)) AS STRING)").as("day"))
      .agg(count(lit(1)).as("n_incidents"), sum("n_spans").as("spans_total"),
        sum(expr("ov_us div 1000000")).as("overlap_seconds"),
        max("n_spans").as("max_spans_per_incident"))
}
