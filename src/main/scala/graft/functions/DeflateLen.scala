package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen DEFLATE-compressed length of a string — the compression-ratio
  * quality signal (a repetitive/boilerplate document compresses far
  * better than diverse prose; the ratio is the cheapest whole-document
  * redundancy detector, complementing q99's top-bigram rule which only
  * sees one n-gram). Row-local: one Deflater and one fixed-size drain
  * buffer allocated per evaluation (the GzipDecode pattern — zlib native
  * state cannot be shared across rows safely), and only the LENGTH is
  * returned; the compressed bytes are never materialized as a column.
  *
  * Determinism: for a fixed input, level, and strategy, java.util.zip's
  * zlib produces a fixed byte stream on a given JVM — the spec pins the
  * expression against a direct java.util.zip reference computation, and
  * the q123 report derives only integer sums/flags from it. There is no
  * DuckDB oracle (DuckDB 1.0 ships no deflate function), so the driver
  * gate records rows-only — but `tools/check.py` recomputes the ENTIRE
  * q123 result independently with CPython's zlib (zlib.compress(b, 6)
  * is the same zlib format/level as Deflater(6, nowrap=false)) and
  * compares exactly, so the query IS content-checked cross-engine; a
  * zlib library-version skew between JVM and CPython is the one thing
  * that could break that compare without an engine bug (noted in
  * check.py next to the compare).
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_len"

  def compute(s: UTF8String): Long = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(s.getBytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateLen", this, classOf[DeflateLen].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
