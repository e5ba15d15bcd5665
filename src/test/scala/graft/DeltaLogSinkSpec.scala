package graft

import java.nio.file.Files

import graft.streaming.DeltaLogSink
import org.apache.spark.sql.functions._

/** The streaming twins' shared sink discipline, tested ONCE (r11 verdict
  * task 5): epoch-partition overwrite is retry-idempotent, append
  * suppresses empty batches behind a single persisted execution, and the
  * two read views (latest-epoch, min-merge) absorb exactly the anomalies
  * their write mode can produce. The twins' own StreamingSpec cases then
  * only need to assert stream ≡ batch convergence — the sink contract
  * lives here. */
class DeltaLogSinkSpec extends SparkSpec {

  private def files(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
  }

  test("epochOverwrite: a retried epoch rewrites its partition, view unchanged") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_dls_epoch").toString + "/log"
    val e0 = Seq((1L, "a", 10L, false), (2L, "b", 20L, false))
      .toDF("k", "seg", "n", "retract").as[(Long, String, Long, Boolean)]
    val e1 = Seq((1L, "a", 11L, false), (3L, "c", 30L, false))
      .toDF("k", "seg", "n", "retract").as[(Long, String, Long, Boolean)]
    DeltaLogSink.epochOverwrite(table)(e0, 0L)
    DeltaLogSink.epochOverwrite(table)(e1, 1L)
    def view() = DeltaLogSink
      .latestEpochView(spark, table, "k", Seq("seg", "n"), Some("retract"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val before = view()
    assert(before === Set((1L, "a", 11L), (2L, "b", 20L), (3L, "c", 30L)))
    // foreachBatch retry: same epoch, same content — the partition is
    // REWRITTEN, not double-appended, so the view is unchanged
    DeltaLogSink.epochOverwrite(table)(e1, 1L)
    assert(view() === before)
    // tombstone in a later epoch retracts the key from the view
    val e2 = Seq((2L, "b", 0L, true)).toDF("k", "seg", "n", "retract")
      .as[(Long, String, Long, Boolean)]
    DeltaLogSink.epochOverwrite(table)(e2, 2L)
    assert(view() === Set((1L, "a", 11L), (3L, "c", 30L)))
  }

  test("epochOverwrite: an EMPTY epoch is harmless (no pre-write probe needed)") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_dls_empty").toString + "/log"
    val e0 = Seq((1L, "a", 10L, false)).toDF("k", "seg", "n", "retract")
      .as[(Long, String, Long, Boolean)]
    DeltaLogSink.epochOverwrite(table)(e0, 0L)
    val empty = e0.filter(_ => false)
    DeltaLogSink.epochOverwrite(table)(empty, 1L)
    val got = DeltaLogSink
      .latestEpochView(spark, table, "k", Seq("seg", "n"), Some("retract"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "a", 10L)))
  }

  test("appendIfNonEmpty: empty batches append no files; duplicate appends reduce away in minMergeView") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_dls_append").toString + "/log"
    val d0 = Seq(("fp1", 100L), ("fp2", 200L)).toDF("fp", "first_doc")
      .as[(String, Long)]
    DeltaLogSink.appendIfNonEmpty(table)(d0, 0L)
    val after0 = files(table)
    assert(after0.nonEmpty)
    // a replayed batch that emits nothing must leave the log untouched
    DeltaLogSink.appendIfNonEmpty(table)(d0.filter(_ => false), 1L)
    assert(files(table) === after0, "empty batch appended files")
    // a crash-duplicated append (same delta twice) is absorbed by the
    // idempotent min-reduce read view
    DeltaLogSink.appendIfNonEmpty(table)(d0, 2L)
    val got = DeltaLogSink.minMergeView(spark, table, "fp", "first_doc")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("fp1", 100L), ("fp2", 200L)))
  }
}
