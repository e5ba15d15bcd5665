package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic RASTER DECODE of the synthetic "GM" media format plus
  * one-pass pixel statistics — the expression that closes the media
  * family's last stub (r11 verdict task 1): q59 proved the header round
  * trip and q179/q227 fingerprinted payload BYTES, but nothing ever
  * materialized pixel VALUES. This does: header = magic "GM" | width u16
  * BE | height u16 BE | fmt u8 (7 bytes), then the decode rule maps the
  * payload onto a width×height row-major raster by periodic tiling —
  * pixel(y, x) = payload[(y·width + x) mod payloadLen] — the synthetic
  * stand-in for a codec's IDCT/predict step: every one of the w·h pixels
  * is visited, exactly like a real decoder, and the statistics are
  * aggregated over the FULL raster in the same pass (a real decode
  * fleet's decode-then-reduce, fused):
  *
  *  - luma_sum   — Σ pixel (mean luma = luma_sum / n_px)
  *  - row_edge_sum — Σ |pixel(y,x) − pixel(y,x−1)| over x ≥ 1
  *    (horizontal gradient energy; n_px − height adjacencies)
  *  - col_edge_sum — Σ |pixel(y,x) − pixel(y−1,x)| over y ≥ 1
  *    (vertical gradient energy; n_px − width adjacencies)
  *  - min_px / max_px — pixel range
  *
  * Both gradients are genuinely 2-D (the row one excludes row-wrap
  * adjacencies; the column one reaches back a full stride), so the
  * statistics depend on the raster GEOMETRY, not just the byte stream —
  * MultimodalSpec re-derives them from a naively materialized
  * Array[Array[Int]] raster pixel-for-pixel, and q228's DuckDB oracle
  * recomputes them positionally (pixel i = payload byte i mod plen) with
  * pure integer arithmetic, so the whole decode is hash-checkable.
  *
  * All-integer, one virtual call per row inside whole-stage codegen, no
  * per-pixel allocation (the raster is never buffered — stats fold in
  * the tiling loop; the stride-back read recomputes the periodic index
  * instead of keeping a row buffer). Cost is O(n_px) per row — the decode
  * IS the work, as with any codec — so the 100 TB posture is the one the
  * Multimodal scaladoc pins: push metadata predicates (width/fmt) down
  * BEFORE this expression touches bytes, and decode once per asset, not
  * per query. Returns null on a malformed header (shorter than 8 bytes
  * or wrong magic), the log-and-skip tolerance the A19 path uses. */
case class GmRasterStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = GmRasterStats.Schema
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "gm_raster_stats"

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 8 || b(0) != 'G' || b(1) != 'M') return null
    val w = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    val h = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
    val fmt = b(6) & 0xff
    val plen = b.length - 7
    val n = w.toLong * h
    var luma = 0L; var rowE = 0L; var colE = 0L
    var mn = 255; var mx = 0
    var prev = 0
    var im = 0   // i mod plen, tracked incrementally
    var imw = 0  // (i − w) mod plen, live once i ≥ w
    var x = 0
    var i = 0L
    while (i < n) {
      val p = b(7 + im) & 0xff
      luma += p
      if (p < mn) mn = p
      if (p > mx) mx = p
      if (x > 0) rowE += math.abs(p - prev)
      if (i >= w) { colE += math.abs(p - (b(7 + imw) & 0xff)) }
      prev = p
      im += 1; if (im == plen) im = 0
      if (i >= w) { imw += 1; if (imw == plen) imw = 0 }
      x += 1; if (x == w) x = 0
      i += 1
    }
    InternalRow(w, h, fmt, n, luma, rowE, colE, mn, mx)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gmRasterStats", this, classOf[GmRasterStats].getName)
    val result = ctx.freshName("rasterStats")
    nullSafeCodeGen(ctx, ev, c =>
      s"""InternalRow $result = $ref.compute($c);
         |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GmRasterStats =
    copy(child = newChild)
}

object GmRasterStats {
  val Schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fmt", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("luma_sum", LongType, nullable = false),
    StructField("row_edge_sum", LongType, nullable = false),
    StructField("col_edge_sum", LongType, nullable = false),
    StructField("min_px", IntegerType, nullable = false),
    StructField("max_px", IntegerType, nullable = false)))
}
