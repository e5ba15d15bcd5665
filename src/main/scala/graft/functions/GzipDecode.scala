package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen gzip→UTF-8 decode of a BinaryType column — the reference's
  * record decode (`zlib.decompress(data, 15+32)` then UTF-8,
  * /root/reference/docs/user-guide.md:28; GZIPInputStream auto-detects the
  * header like wbits 15+32). Returns null on malformed input, matching the
  * reference's log-and-skip error tolerance (:36-39): the downstream
  * `isNotNull` filter is the skip.
  *
  * SURVEY.md §4 flagged the UDF version as a Catalyst black box; this
  * expression keeps the decode inside whole-stage codegen (null-tracking
  * handled by nullSafeCodeGen, one virtual call per row). */
case class GzipDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_decode"

  def compute(bytes: Array[Byte]): UTF8String =
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      UTF8String.fromBytes(out.toByteArray)
    } catch { case _: java.io.IOException => null }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gzipDecode", this, classOf[GzipDecode].getName)
    val result = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, c =>
      s"""UTF8String $result = $ref.compute($c);
         |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): GzipDecode =
    copy(child = newChild)
}
