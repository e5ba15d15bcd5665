package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Row-local Hilbert-curve index of a (x, y) cell on the 256×256 grid —
  * the locality-preserving alternative to q85's bit-interleave z-key:
  * consecutive Hilbert positions are always GRID-ADJACENT (the curve
  * never jumps), where the z-curve teleports across the grid every time
  * a high bit flips, so equal-size Hilbert file ranges have tighter
  * per-file min/max spans on BOTH dimensions — which is exactly what
  * zone-map pruning prices (q259 measures the difference on the same
  * workload q85/q134 use).
  *
  * The classic iterative xy→d transform (Hamilton's algorithm as given
  * in Wikipedia's "Hilbert curve" pseudocode): 8 rounds of quadrant
  * accumulation + rotation, all Long arithmetic, generated INLINE into
  * whole-stage codegen (no virtual call per row). Inputs outside
  * [0, 255] are taken mod 256 (callers pass bucketed keys already).
  * Null-intolerant: any null input → null output (BinaryExpression
  * default, pinned in NullPolicySpec). The oracle twin unrolls the same
  * 8 rounds as chained CTE column rewrites — integer-identical. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)
  override def prettyName: String = "hilbert_index"

  def compute(xIn: Long, yIn: Long): Long = {
    var x = ((xIn % 256) + 256) % 256
    var y = ((yIn % 256) + 256) % 256
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = ((($xc) % 256) + 256) % 256;
         |long $y = ((($yc) % 256) + 256) % 256;
         |long $d = 0L;
         |for (long $s = 128L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
