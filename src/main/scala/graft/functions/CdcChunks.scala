package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Rabin-style rolling hash) of a string
  * — the storage-dedup primitive behind q220: unlike fixed-size or
  * token-count chunking (q100/q98), a content-defined boundary survives
  * insertions and deletions EARLIER in the document, so two near-identical
  * docs still share most chunk fingerprints (the rsync/LBFS/restic
  * property; fixed-grid chunks lose alignment after one edit).
  *
  * Returns the sorted 1-indexed END positions p of every chunk boundary:
  * positions p ≥ W where the rolling polynomial hash of the last W=8 bytes
  *   H(p) = Σ_{k=0..7} byte(p−k) · 31^k        (exact BIGINT, no mod)
  * satisfies H(p) % 61 == 0 — expected chunk length ≈ 61 bytes. The DuckDB
  * oracle recomputes the SAME polynomial per position as an 8-term
  * ascii()·31^k sum, so boundaries are integer-identical on both engines;
  * this expression computes it in one O(len) rolling pass
  * (H(p+1) = 31·(H(p) − 31⁷·byte(p−7)) + byte(p+1)), one virtual call per
  * row inside whole-stage codegen.
  *
  * Byte-based on the UTF-8 encoding; for the ASCII corpus contract (spec-
  * pinned) this equals the oracle's per-character ascii() arithmetic.
  * Production CDC adds min/max chunk-size clamps (FastCDC); the unclamped
  * form keeps the boundary rule stateless so both engines can derive it
  * independently. */
case class CdcBoundaries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "cdc_bounds"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < 8) return new GenericArrayData(Array.empty[Int])
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    // H(8) = Σ_{k=0..7} byte(8−k) · 31^k  (1-indexed byte(p) = bytes(p−1))
    var h = 0L
    var k = 0
    while (k < 8) { h += (bytes(7 - k) & 0xffL) * CdcBoundaries.Pow31(k); k += 1 }
    if (h % 61 == 0) buf += 8
    var p = 8
    while (p < n) {
      h = 31L * (h - CdcBoundaries.Pow31(7) * (bytes(p - 8) & 0xffL)) + (bytes(p) & 0xffL)
      p += 1
      if (h % 61 == 0) buf += p
    }
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBounds", this, classOf[CdcBoundaries].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** 31^0 .. 31^7 — largest term 31^7·255 ≈ 7.0e12, and the transient
    * 31·H(p) ≤ 2.3e14: exact in a signed 64-bit long with 4 orders of
    * headroom, so no mod-reduction is ever needed (mod-free is what lets
    * the oracle recompute H as a plain SQL sum). */
  val Pow31: Array[Long] = Array.iterate(1L, 8)(_ * 31L)
}

/** [[CdcBoundaries]] over RAW BYTES (BinaryType) with a configurable
  * boundary modulus — the media-column variant (q227): a binary payload
  * has no character structure, but the same last-8-byte polynomial over
  * unsigned byte values gives content-defined chunk ends; `mod` sets the
  * expected chunk length (media payloads are tens of bytes, so the text
  * variant's 61 would leave most files single-chunk). Same exact-BIGINT
  * contract: the oracle recomputes H per position from the hex rendering
  * (byte p = ('0x' || substr(hexstr, 2p−1, 2))::BIGINT). */
case class CdcBoundariesBytes(child: Expression, mod: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(mod > 1, "mod must exceed 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(BinaryType)
  override def prettyName: String = "cdc_bounds_bytes"

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n < 8) return new GenericArrayData(Array.empty[Int])
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var k = 0
    while (k < 8) { h += (bytes(7 - k) & 0xffL) * CdcBoundaries.Pow31(k); k += 1 }
    if (h % mod == 0) buf += 8
    var p = 8
    while (p < n) {
      h = 31L * (h - CdcBoundaries.Pow31(7) * (bytes(p - 8) & 0xffL)) + (bytes(p) & 0xffL)
      p += 1
      if (h % mod == 0) buf += p
    }
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBoundsBytes", this, classOf[CdcBoundariesBytes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesBytes =
    copy(child = newChild)
}
