package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the incremental-ingest dedup index (q144 / SURVEY
  * B104): the distinct-fingerprint index the batch operator probes is
  * maintained incrementally from the live document stream — the exact
  * production posture q144's scaladoc prescribes ("this index is
  * maintained incrementally per ingest"), now executable: per-batch cost
  * is ∝ batch + touched index keys, never ∝ corpus.
  *
  * Split of responsibilities, mirroring BloomStream:
  *  - [[mergeIndex]] folds a micro-batch's (fp, first_doc) partials into
  *    the maintained index with `min` — associative, commutative AND
  *    IDEMPOTENT (min(a,a) = a), so like BloomStream's OR words an
  *    at-least-once replay leaves the index bit-identical (StreamingSpec
  *    replays a chunk and asserts equality). A count column would break
  *    that property, so the index deliberately carries only the
  *    canonical-survivor id.
  *  - [[maintain]] applies it per micro-batch through foreachBatch (the
  *    write-then-swap parquet sink standing in for a transactional MERGE
  *    target, as the sibling twins document).
  *  - The fingerprint definition is NOT reimplemented: each batch rides
  *    `Dedup.fpIndexFrom` — q40/q144's exact fingerprint — so the
  *    maintained index is the one batch q144 derives, by construction.
  *
  * Unlike the metadata-grain twins (grids, words, loads), this table is
  * fingerprint-grain — it grows with the corpus's DISTINCT contents.
  * That is inherent to exact dedup (the index IS the state); production
  * parks it in a keyed store (the q52 latest-state topology) and prunes
  * probes with q79's bloom front.
  */
object IndexStream {

  /** Fold per-batch (fp, first_doc) partials into the maintained index. */
  def mergeIndex(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy("fp")
      .agg(min("first_doc").as("first_doc"))

  /** Maintain the `(fp, first_doc)` index at `table` from a document
    * stream carrying `doc_id` and `text`. */
  def maintain(docs: DataFrame, table: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val delta = graft.operators.Dedup.fpIndexFrom(batch.toDF())
        val current =
          if (new java.io.File(table).exists) spark.read.parquet(table)
          else delta.limit(0)
        val merged = mergeIndex(current, delta)
        val tmp = table + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val dir = new java.io.File(table)
        if (dir.exists) org.apache.commons.io.FileUtils.deleteDirectory(dir)
        new java.io.File(tmp).renameTo(dir)
        ()
      }
      .outputMode("update").start()
}
