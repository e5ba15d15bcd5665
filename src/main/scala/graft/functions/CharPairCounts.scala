package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local adjacent-character-pair histogram — the q132 BPE-statistic
  * kernel. The relational formulation (`transform(sequence(...), i ->
  * substring(text, i, 2))` + explode) allocates one 2-char UTF8String per
  * POSITION (len−1 per row) and pushes corpus-character-count rows into
  * the exchange; the r11 sf1 smoke measured that allocation as the
  * query's whole cost (explode-bound, 12–14 s at 150 M chars). This
  * expression counts pairs in ONE pass over the UTF-8 bytes with a
  * thread-local 65536-slot table (pair = hi-byte·256+lo-byte) and emits
  * `array<struct<pair: string, n: long>>` — one entry per DISTINCT pair
  * in the document (≤ a few hundred), so the downstream explode is
  * distinct-pair-grain and the shuffle carries pre-counted rows.
  * Pairs containing a space are excluded (a pair straddling words is not
  * a mergeable BPE symbol — same rule as the relational form's filter).
  *
  * Byte-based on the UTF-8 encoding; equal to the oracle's per-position
  * character substr for the ASCII corpus contract (the CdcBoundaries
  * precedent; spec-pinned). Entries are emitted in ascending pair-code
  * order — deterministic, though consumers aggregate and never depend on
  * array order. */
case class CharPairCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pair", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "char_pair_counts"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = CharPairCounts.tlCounts.get()
    var touchedN = 0
    val touched = CharPairCounts.tlTouched.get()
    var p = 0
    while (p < n - 1) {
      val b1 = bytes(p) & 0xff
      val b2 = bytes(p + 1) & 0xff
      if (b1 != 0x20 && b2 != 0x20) {
        val key = (b1 << 8) | b2
        if (counts(key) == 0L) { touched(touchedN) = key; touchedN += 1 }
        counts(key) += 1L
      }
      p += 1
    }
    java.util.Arrays.sort(touched, 0, touchedN)
    val out = new Array[Any](touchedN)
    var i = 0
    while (i < touchedN) {
      val key = touched(i)
      out(i) = InternalRow(
        UTF8String.fromBytes(Array(((key >> 8) & 0xff).toByte, (key & 0xff).toByte)),
        counts(key))
      counts(key) = 0L // reset for the next row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairCounts", this, classOf[CharPairCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairCounts =
    copy(child = newChild)
}

object CharPairCounts {
  /** 65536-slot count table + touched-key scratch, per thread: zeroed by
    * construction, restored to zero after every row (only touched slots
    * are reset), so no per-row allocation or full clears ever happen. */
  private val tlCounts = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](65536)
  }
  private val tlTouched = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](65536)
  }
}
