package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the incremental-aggregate-maintenance family
  * (q120 / SURVEY B79): per-source corpus statistics kept current by
  * folding SIGNED delta contribution rows into a maintained stats
  * table, never rescanning the old corpus.
  *
  * [[mergeDelta]] is the maintenance operator itself, shared by both
  * forms: batch q120 IS mergeDelta(old snapshot's aggregates, snapshot
  * diff) — so the driver's oracle hash-match (the oracle recomputes
  * directly from the new snapshot) proves THIS operator equals a full
  * recompute — and [[maintain]] is the production sink that applies the
  * same operator per micro-batch through foreachBatch (the r5 MERGE
  * upsert sink, SourceSinkSpec, pointed at stats instead of state).
  * StreamingSpec proves the chain: seed the table with the old
  * snapshot's aggregates, stream the delta rows in micro-batches, and
  * the final table equals batch q120 exactly (integer-exact stats, so
  * equality is exact, not approximate).
  *
  * Precondition (same as any IVM scheme): the delta feed is consistent
  * with the seeded snapshot — a remove/change row only arrives for a
  * doc whose contribution is already in the table. Under that
  * contract a source whose docs are all removed nets EXACTLY to zero
  * (removals are negations of prior contributions), so the
  * `n_docs > 0` drop in [[mergeDelta]] never discards partial sums.
  *
  * 100 TB shape: the maintained table is (sources × 3 longs) —
  * metadata-sized — while each micro-batch's work is one partial
  * aggregation of the (tiny) delta plus a union with the current
  * table. The write-then-swap parquet sink here stands in for the
  * transactional table (Delta/Iceberg MERGE) a cluster deployment
  * would target; the merge arithmetic is identical.
  */
object StatsStream {

  /** One signed delta contribution: `dn` = ±1 doc (0 for changed),
    * `did` = signed doc-id mass, `dchk` = signed content-checksum mass. */
  case class DeltaRow(source: String, dn: Long, did: Long, dchk: Long)

  /** Fold signed delta contributions into the maintained per-source
    * stats `(source, n_docs, id_sum, content_checksum)`. Associative in
    * the delta argument (sums of signed contributions), which is what
    * makes per-micro-batch application order-insensitive. */
  def mergeDelta(current: DataFrame, delta: DataFrame): DataFrame =
    current
      .select(col("source"), col("n_docs").as("dn"), col("id_sum").as("did"),
        col("content_checksum").as("dchk"))
      .unionByName(delta.select("source", "dn", "did", "dchk"))
      .groupBy("source")
      .agg(sum("dn").as("n_docs"), sum("did").as("id_sum"),
        sum("dchk").as("content_checksum"))
      .filter(col("n_docs") > 0)

  /** Maintain the stats table at `table` (parquet, write-then-swap)
    * from a stream of [[DeltaRow]]s. Idempotent only at the batch
    * level Spark already guarantees (a replayed batch re-merges the
    * same rows — pair with an idempotent table format in production;
    * see the transactional-batch-id test in SourceSinkSpec). */
  def maintain(deltas: DataFrame, table: String): StreamingQuery =
    deltas.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else batch.select(col("source"), col("dn").as("n_docs"),
            col("did").as("id_sum"), col("dchk").as("content_checksum")).limit(0)
        val merged = mergeDelta(current, batch.toDF())
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        GridSwap.swap(tmp, table)
        ()
      }
      .outputMode("update").start()
}
