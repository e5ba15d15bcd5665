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
  * So at 100 TB the open-schema body can stay a variant column without
  * giving up scan-level pruning on hot fields — though hand-shredding
  * the hottest fields into top-level typed columns at ingest (what the
  * A7 envelope projection does for headline/word_count) remains the
  * belt-and-braces layout: it guarantees pushdown independent of the
  * writer's shredding decisions and gives min/max zone stats the variant
  * residual lacks. Both arms are pinned below; if a Spark upgrade ever
  * changes the shredding behavior, the first test fails and the layout
  * guidance should be revisited. */
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
}
