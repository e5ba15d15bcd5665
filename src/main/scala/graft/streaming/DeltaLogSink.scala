package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The shared sink discipline of the streaming twins — the three
  * idempotency patterns the 16 maintained operators had each hand-rolled
  * (r11 verdict task 5), factored once so the contract is written (and
  * tested, DeltaLogSinkSpec) in exactly one place:
  *
  *  1. [[epochOverwrite]] — write each micro-batch into its own
  *     `batch=<id>` partition with `overwrite`. A foreachBatch RETRY of
  *     an epoch (same batchId, state store rolled back to the same
  *     version, deterministic replan) rewrites the identical partition
  *     instead of double-appending. One action per batch: no pre-write
  *     emptiness probe, because overwriting an epoch partition with an
  *     empty (or identical) delta is harmless — the probe the twins used
  *     to run re-executed the whole transformWithState plan (state-store
  *     load + commit) a second time per batch (ADVICE r11).
  *  2. [[appendIfNonEmpty]] — plain `append` for logs whose READ VIEW is
  *     an idempotent reduce (min-merge): a replayed epoch emits zero
  *     delta rows and must append zero files (StreamingSpec pins that).
  *     The emptiness probe is taken on a PERSISTED delta so the stateful
  *     plan still executes once; `isEmpty` on the cached plan is a
  *     limit-1 probe, not a second state pass.
  *  3. Read views — [[latestEpochView]] (each key's newest epoch row
  *     wins, tombstones dropped: the epoch-overwrite log's companion)
  *     and [[minMergeView]] (associative/commutative/idempotent
  *     min-reduce: the append log's companion, where duplicate appends
  *     reduce away).
  *
  * Production swaps the log+view for a transactional MERGE table; the
  * contract — retries rewrite, replays add nothing, the view is a pure
  * function of the log — is identical, which is what the twins' stream ≡
  * batch convergence specs actually rely on. */
object DeltaLogSink {

  /** Pattern 1: per-epoch partition overwrite (idempotent under retry). */
  def epochOverwrite[T](table: String)(delta: Dataset[T], batchId: Long): Unit = {
    delta.write.mode("overwrite").parquet(s"$table/batch=$batchId")
    ()
  }

  /** Pattern 2: append, suppressing empty batches, with the delta
    * persisted so the probe and the write share ONE execution of the
    * upstream (stateful) plan. */
  def appendIfNonEmpty[T](table: String)(delta: Dataset[T], batchId: Long): Unit = {
    delta.persist()
    try {
      if (!delta.isEmpty) delta.write.mode("append").parquet(table)
    } finally {
      delta.unpersist()
    }
    ()
  }

  /** Read view for [[epochOverwrite]] logs: per `key`, the row from the
    * highest `batch=` partition wins; rows whose `retractCol` is true
    * (tombstones) are dropped. `payload` lists the carried columns. */
  def latestEpochView(spark: SparkSession, table: String, key: String,
      payload: Seq[String], retractCol: Option[String] = None): DataFrame = {
    val fields = (payload ++ retractCol).mkString(", ")
    val v = spark.read.parquet(table)
      .groupBy(key)
      .agg(expr(s"max_by(struct($fields), batch)").as("v"))
    val live = retractCol.fold(v)(rc => v.filter(!col(s"v.$rc")))
    live.select(col(key) +: payload.map(c => col(s"v.$c").as(c)): _*)
  }

  /** Read view for [[appendIfNonEmpty]] logs: min-reduce of `valueCol`
    * per `key` — idempotent, so a duplicated append (crash between write
    * and commit) is absorbed. */
  def minMergeView(spark: SparkSession, table: String, key: String,
      valueCol: String): DataFrame =
    spark.read.parquet(table)
      .groupBy(key).agg(min(valueCol).as(valueCol))
}
