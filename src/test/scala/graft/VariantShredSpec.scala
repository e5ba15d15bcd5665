package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Variant-on-parquet pushdown probe (r11 verdict task 8) — the missing
  * piece of the open-schema-body story (user-guide.md:112-114: the body
  * is "whatever the producing system put there", which q65 models with
  * `parse_json`/`variant_get`). The 100 TB question: when the open
  * schema is STORED as a parquet VARIANT column, do predicates on
  * `variant_get(...)` reach the scan?
  *
  * Measured answer on Spark 4.1.2 — pinned here as evidence, and BETTER
  * than the r11 verdict expected ("documenting its absence" was the
  * anticipated outcome):
  *
  *  - The parquet writer SHREDS the variant (the parquet
  *    variant-shredding layout: a typed subcolumn per stable field next
  *    to the untyped residual), and `variant_get` predicates push down —
  *    the scan shows `PushedFilters: [GreaterThan(body.`1`,95)]` with
  *    `ReadSchema: body:struct<0:variant,1:int>`: only the typed
  *    subcolumn is decoded for the filter.
  *  - This survives TYPE-MIXED fields: with `k` an int on some rows and
  *    a string on others, an int-typed probe (`try_variant_get ... int`)
  *    and a string-typed probe each get their own shredded read schema
  *    and their own pushed filter, with exact row counts.
  *  - Plain column pruning also holds: an id-only query reads no variant
  *    bytes at all.
  *
  * IMPORTANT 10x-scale caveat (measured in r14, pinned in the last test
  * below): the pushed variant filter is a PLAN fact, not a RUNTIME one —
  * the parquet writer records no min/max stats for shredded variant
  * subcolumns, so the scan still emits every row and the predicate
  * filters above the decode. The pushdown saves subcolumn DECODE work
  * (only the typed shred is materialized for the filter), but it skips
  * no row groups. A hand-shredded top-level typed column under the same
  * layout emits only the matching tail (8x fewer scan rows measured at
  * 1M rows / 1% selectivity).
  *
  * So the 100 TB layout guidance sharpens: the open-schema body can stay
  * a variant column for FLEXIBILITY, but hot filtered fields MUST be
  * hand-shredded into top-level typed columns at ingest (what the A7
  * envelope projection does for headline/word_count) — that is what buys
  * min/max zone pruning, not the writer's automatic shredding. All three
  * arms are pinned below; if a Spark upgrade starts writing subcolumn
  * stats, the inequality test fails and this guidance should be
  * re-graded. */
class VariantShredSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("FileScan")).mkString("\n")
  }

  test("variant_get predicates push into the shredded parquet variant scan — uniform and mixed types") {
    val dir = Files.createTempDirectory("graft_variant").toString
    // k: int on even ids, string on odd ids — the type-mixed open schema
    spark.range(0, 1000)
      .select(col("id"), parse_json(
        when(col("id") % 2 === 0, concat(lit("""{"k":"""), col("id") % 100, lit("}")))
          .otherwise(concat(lit("""{"k":"s"""), col("id") % 100, lit(""""}""")))).as("body"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // int-typed probe: 20 even rows have k ∈ {96, 98} (mod-100 evens > 95)
    val qi = back.filter(expr("try_variant_get(body, '$.k', 'int')") > 95)
    assert(qi.count() === 20)
    val si = scanOf(qi)
    assert(si.contains("PushedFilters") && si.contains("GreaterThan(body."),
      s"int-typed variant predicate must push into the shredded scan:\n$si")
    assert(si.contains("1:int"), s"read schema must carry the typed subcolumn:\n$si")
    // string-typed probe over the same file: its own shred, its own filter
    val qs = back.filter(expr("variant_get(body, '$.k', 'string')") === "s95")
    assert(qs.count() === 10)
    val ss = scanOf(qs)
    assert(ss.contains("EqualTo(body.") && ss.contains("1:string"),
      s"string-typed variant predicate must push with a string subcolumn:\n$ss")
    // column pruning: an id-only query reads no variant bytes
    val pruned = scanOf(back.select("id"))
    assert(pruned.contains("ReadSchema") && !pruned.contains("body"),
      s"id-only projection must prune the variant column:\n$pruned")
  }

  test("hand-shredding the hot field at ingest guarantees pushdown next to the open-schema variant") {
    val dir = Files.createTempDirectory("graft_variant_shred").toString
    spark.range(0, 1000)
      .select(col("id"),
        (col("id") % 100).cast("int").as("k"), // shredded hot field
        parse_json(concat(lit("""{"k":"""), col("id") % 100,
          lit(""","tag":"t"""), col("id") % 7, lit(""""}"""))).as("body"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val q = back.filter(col("k") > 95)
    assert(q.count() === 40)
    val scan = scanOf(q)
    assert(scan.contains("GreaterThan(k,95)"),
      s"shredded column predicate must be pushed to the scan:\n$scan")
    // and the variant tail is still there for open-schema consumers
    assert(q.select(expr("variant_get(body, '$.tag', 'string')")).distinct().count() > 0)
  }

  test("10x scale: hand-shredded column row-group-prunes; variant pushdown does NOT (measured, r13 verdict task 7)") {
    // The sf0.01-scale pins above prove the PLAN shape; this measures the
    // RUNTIME effect at 10x the fixture volume: 1M rows written
    // range-partitioned on id (tight per-row-group min/max), a
    // 1%-selective predicate, and the scan's own numOutputRows metric as
    // the pruning probe. The measurement OVERTURNS the optimistic r12
    // reading: a plan-level PushedFilters line on a variant subcolumn is
    // NOT row-group pruning.
    val dir = Files.createTempDirectory("graft_variant10x").toString
    spark.range(0, 1000000L)
      .repartitionByRange(8, col("id"))
      .select(col("id"),
        col("id").as("k_shredded"),
        parse_json(concat(lit("""{"k":"""), col("id"), lit("}"))).as("body"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)

    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec found")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val qv = back.filter(expr("try_variant_get(body, '$.k', 'long')") > 990000L)
      .select("id")
    assert(qv.count() === 9999L)
    assert(scanOf(qv).contains("GreaterThan(body."),
      s"variant predicate must stay pushed at 10x:\n${scanOf(qv)}")
    val variantOut = scanRows(back
      .filter(expr("try_variant_get(body, '$.k', 'long')") > 990000L).select("id"))

    val qp = back.filter(col("k_shredded") > 990000L).select("id")
    assert(qp.count() === 9999L)
    val plainOut = scanRows(back.filter(col("k_shredded") > 990000L).select("id"))

    // MEASURED truth (Spark 4.1.2): the hand-shredded typed column
    // row-group-prunes (the scan emits only the tail partition), while
    // the variant's pushed filter does NOT prune at the reader — the
    // parquet writer records no min/max for shredded variant subcolumns,
    // so the scan emits ALL rows and the filter drops them above the
    // decode. Pinned as an inequality + absolutes: if a Spark upgrade
    // starts writing subcolumn stats, the 1000000 bound breaks and the
    // SCALE.md layout guidance (hand-shred hot fields at ingest) should
    // be re-graded.
    assert(plainOut <= 250000L,
      s"typed-column scan emitted $plainOut of 1000000 - row-group pruning regressed")
    assert(variantOut === 1000000L || variantOut <= 250000L,
      s"unexpected variant scan output $variantOut")
    assert(plainOut < variantOut,
      s"hand-shredding no longer beats variant pushdown ($plainOut vs $variantOut) - revisit layout guidance")
  }
}
