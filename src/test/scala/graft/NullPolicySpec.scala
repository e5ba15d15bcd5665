package graft

import graft.functions._
import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._

/** Pins the documented null-element policy of every custom kernel (ADVICE
  * r3): MinHashSig/SimHash32 SKIP null tokens, WordShingles/WordBigrams
  * DROP them, HyperplaneBucket/SnapGrid treat a null slot as 0, and the
  * dot/norm kernels skip null slots. The policies matter because the
  * higher-order-lambda equivalents would null-poison the whole result the
  * first time a nullable array reaches a kernel. */
class NullPolicySpec extends SparkSpec {

  private def one(c: Column): Any =
    spark.range(1).select(c.as("v")).head.get(0)

  private def strArr(xs: Option[String]*): Column =
    array(xs.map(x => x.map(lit(_)).getOrElse(lit(null)).cast("string")): _*)

  private def dblArr(xs: Option[Double]*): Column =
    array(xs.map(x => x.map(lit(_)).getOrElse(lit(null)).cast("double")): _*)

  test("minhash_sig and simhash32 skip null tokens") {
    def mh(c: Column) = GraftColumn(MinHashSig(GraftColumn.expr(c), 8))
    def sh(c: Column) = GraftColumn(SimHash32(GraftColumn.expr(c)))
    val withNull = strArr(Some("alpha"), None, Some("beta"))
    val without = strArr(Some("alpha"), Some("beta"))
    assert(one(mh(withNull)) === one(mh(without)))
    assert(one(sh(withNull)) === one(sh(without)))
  }

  test("word_shingles and word_bigrams drop null tokens") {
    def shingle(c: Column) = GraftColumn(WordShingles(GraftColumn.expr(c), 5))
    def bigram(c: Column) = GraftColumn(WordBigrams(GraftColumn.expr(c)))
    val withNull = strArr(Some("a"), None, Some("b"), Some("c"), Some("d"), Some("e"))
    val without = strArr(Some("a"), Some("b"), Some("c"), Some("d"), Some("e"))
    assert(one(shingle(withNull)) === one(shingle(without)))
    assert(one(bigram(withNull)) === one(bigram(without)))
  }

  test("deflate_len propagates a null input (no length for no document)") {
    def dl(c: Column) = GraftColumn(DeflateLen(GraftColumn.expr(c)))
    assert(one(dl(lit(null).cast("string"))) === null)
    assert(one(dl(lit(""))).asInstanceOf[Long] > 0L,
      "empty string still has a deflate header — only NULL maps to NULL")
  }

  test("hyperplane_bucket and snap_grid treat a null slot as 0") {
    val hp = Seq(Seq(3L, -2L), Seq(-1L, 5L))
    def bucket(c: Column) = GraftColumn(HyperplaneBucket(GraftColumn.expr(c), hp))
    assert(one(bucket(dblArr(Some(0.5), None))) === one(bucket(dblArr(Some(0.5), Some(0.0)))))
    val snapped = one(GraftColumn(SnapGrid(
      GraftColumn.expr(dblArr(Some(1.5), None)), 1000L)))
    assert(snapped.asInstanceOf[scala.collection.Seq[Long]].toSeq === Seq(1500L, 0L))
  }

  test("dot and norm kernels skip null slots") {
    def dd(a: Column, b: Column) = GraftColumn(DoubleDot(GraftColumn.expr(a), GraftColumn.expr(b)))
    def dn(a: Column) = GraftColumn(DoubleNormSq(GraftColumn.expr(a)))
    assert(one(dd(dblArr(Some(2.0), None), dblArr(Some(3.0), Some(4.0)))) === 6.0)
    assert(one(dn(dblArr(Some(3.0), None, Some(4.0)))) === 25.0)
  }

  test("a null ARRAY (not a null element) null-propagates through every kernel") {
    val nullStrArr = lit(null).cast("array<string>")
    val nullDblArr = lit(null).cast("array<double>")
    assert(one(GraftColumn(MinHashSig(GraftColumn.expr(nullStrArr), 8))) === null)
    assert(one(GraftColumn(SimHash32(GraftColumn.expr(nullStrArr)))) === null)
    assert(one(GraftColumn(WordShingles(GraftColumn.expr(nullStrArr), 5))) === null)
    assert(one(GraftColumn(SnapGrid(GraftColumn.expr(nullDblArr), 1000L))) === null)
    assert(one(GraftColumn(DoubleNormSq(GraftColumn.expr(nullDblArr)))) === null)
  }

  // ---- Null-KEY join-back sweep (VERDICT r8 task 8). The q108 bug class:
  // a group key that can be NULL diverges across engines when it reaches a
  // join-back (null != null drops the group) or an ORDER/rank (Spark sorts
  // NULLS FIRST ascending, DuckDB NULLS LAST). The three keyed join-backs
  // over text-derived keys are q97 (corpus-frequency), q106 (vocab probe),
  // and q135 (template join). A NULL text is the one way those keys go
  // null; these specs plant it and pin the cross-engine-identical outcome.

  private def plantDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nulldoc").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q97/q106 token join-backs: a null-text doc vanishes identically on both engines") {
    // Spark: split(NULL)=NULL, explode(NULL) emits nothing. DuckDB:
    // string_split(NULL)=NULL, unnest(NULL) emits nothing. So a null-text
    // doc must be ABSENT from q97's per-doc output and contribute nothing
    // to q106's per-source sums — and a source consisting only of
    // null-text docs must vanish from q106 entirely. The join keys
    // themselves (tok) can never be null: split emits empty strings, not
    // nulls, so no null key ever reaches the inner/left joins.
    val dir = plantDocs(Seq(
      (0L, "a b a", "en", "srcA", 5L),
      (1L, null, "en", "srcA", 0L),
      (2L, "b c", "en", "srcB", 3L),
      (3L, null, "en", "srcNullOnly", 0L)))
    val q97 = operators.TextAnalysis.queries("q97_token_freq_score")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("sum_tf"), r.getAs[Double]("freq_score"))).toSeq
    // freq over surviving toks: a->2, b->2, c->1
    assert(q97 === Seq((0L, 3L, 6L, 2.0), (2L, 2L, 3L, 1.5)),
      "null-text docs 1 and 3 must drop out of the frequency join-back")
    val q106 = operators.TextAnalysis.queries("q106_oov_rate")(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("sum_tok"),
        r.getAs[Long]("sum_oov"), r.getAs[Long]("n_docs_high_oov"))).toSeq
    assert(q106 === Seq(("srcA", 3L, 0L, 0L), ("srcB", 2L, 0L, 0L)),
      "srcNullOnly must vanish; null-text docs contribute no tokens")
  }

  test("q135 template join-back: a null-pfx group tying the modal count cannot steal rank 1") {
    // The divergence the guard kills: two null-text docs give the NULL
    // prefix group c=2, tying the real template "hdr x" (c=2). Ranked by
    // (c DESC, pfx ASC), Spark puts NULLS FIRST -> null group wins rank 1
    // (template = NULL, nothing strips); DuckDB puts NULLS LAST -> "hdr x"
    // wins (docs strip). With the pfx IS NOT NULL guard on BOTH engines,
    // the real template wins everywhere and null-text docs pass through
    // with NULL clean_text, stripped=0.
    val dir = plantDocs(Seq(
      (0L, "hdr x market up", "en", "srcA", 15L),
      (2L, "hdr x rain", "en", "srcA", 10L),
      (4L, null, "en", "srcA", 0L),
      (6L, null, "en", "srcA", 0L)))
    val rows = operators.TextAnalysis.queries("q135_template_strip")(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 2L, 4L, 6L))
    assert(byId(0L).getAs[Long]("stripped") === 1L &&
      byId(0L).getAs[String]("clean_text") === "market up",
      "real template must win rank 1 over the tying null-pfx group")
    assert(byId(2L).getAs[Long]("stripped") === 1L &&
      byId(2L).getAs[String]("clean_text") === "rain")
    for (id <- Seq(4L, 6L)) {
      val r = byId(id)
      assert(r.getAs[Long]("stripped") === 0L, s"doc $id: null text never strips")
      assert(r.isNullAt(r.fieldIndex("clean_text")), s"doc $id: clean_text stays NULL")
      assert(r.isNullAt(r.fieldIndex("n_removed")), s"doc $id: length(NULL) is NULL on both engines")
    }
  }

  test("cdc_bounds / cdc_bounds_bytes / char_pair_counts: null in, null out; short/empty in, empty out") {
    def cb(c: Column) = GraftColumn(CdcBoundaries(GraftColumn.expr(c)))
    def cbb(c: Column) = GraftColumn(CdcBoundariesBytes(GraftColumn.expr(c), 13))
    def cpc(c: Column) = GraftColumn(CharPairCounts(GraftColumn.expr(c)))
    // null propagates (nullSafeEval), never throws or fabricates chunks
    assert(one(cb(lit(null).cast("string"))) === null)
    assert(one(cbb(lit(null).cast("binary"))) === null)
    assert(one(cpc(lit(null).cast("string"))) === null)
    // below the 8-byte window: no boundary, not an error
    assert(one(cb(lit("short"))).asInstanceOf[scala.collection.Seq[Int]].isEmpty)
    assert(one(cbb(lit("short").cast("binary"))).asInstanceOf[scala.collection.Seq[Int]].isEmpty)
    // single char has no pair; pairs touching a space are excluded
    assert(one(cpc(lit("x"))).asInstanceOf[scala.collection.Seq[Any]].isEmpty)
    assert(one(cpc(lit("a b"))).asInstanceOf[scala.collection.Seq[Any]].isEmpty,
      "both pairs straddle the space — none may be counted")
  }

  test("gm_raster_stats: null in, null out; malformed header → null, never throws") {
    def grs(c: Column) = GraftColumn(graft.functions.GmRasterStats(GraftColumn.expr(c)))
    // null propagates (nullSafeEval)
    assert(one(grs(lit(null).cast("binary"))) === null)
    // wrong magic and truncated headers are A19 skips, not exceptions
    assert(one(grs(lit("XYabcdefgh").cast("binary"))) === null)
    assert(one(grs(lit("GM").cast("binary"))) === null)
    // a minimal valid asset decodes (the detailed pixel contract lives in
    // MultimodalSpec's materialized-raster re-derivation)
    val ok = one(grs(lit(Array[Byte]('G'.toByte, 'M'.toByte, 0, 1, 0, 1, 0, 7))))
    assert(ok !== null)
  }

  test("hilbert_index: null-intolerant, interpreted==codegen reference, adjacency invariant") {
    def hi(x: Column, y: Column) = GraftColumn(HilbertIndex(GraftColumn.expr(x), GraftColumn.expr(y)))
    assert(one(hi(lit(null).cast("long"), lit(3L))) === null)
    assert(one(hi(lit(3L), lit(null).cast("long"))) === null)
    // corner anchors of the order-8 curve: (0,0) is position 0; the
    // curve ends at (255, 0) = position 65535 (U-orientation)
    assert(one(hi(lit(0L), lit(0L))) === 0L)
    assert(one(hi(lit(255L), lit(0L))) === 65535L)
    // the defining property vs the z-curve: consecutive Hilbert
    // positions are GRID-ADJACENT (|dx|+|dy| = 1) — checked for every
    // consecutive pair over the full 65536-cell traversal, via the
    // codegen path (one distinct-count over the inverse mapping)
    val cells = spark.range(256L * 256L).toDF("i")
      .select((col("i") % 256).as("x"), (col("i") / 256).cast("long").as("y"))
      .select(col("x"), col("y"), hi(col("x"), col("y")).as("d"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("d")
    val bad = cells
      .select(col("x"), col("y"), col("d"),
        lag("x", 1).over(w).as("px"), lag("y", 1).over(w).as("py"))
      .filter(col("px").isNotNull &&
        abs(col("x") - col("px")) + abs(col("y") - col("py")) =!= 1)
      .count()
    assert(bad === 0L, "Hilbert traversal must never jump")
    // and the index is a bijection on the grid
    assert(cells.select("d").distinct().count() === 65536L)
  }
}
