package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators (SURVEY.md §2B B32).
  *
  * Round 2 computed dot products and norms with `aggregate`/`zip_with`
  * higher-order lambdas — interpreted, not codegen'd, ~15 µs per element —
  * and q48/q49 additionally re-derived the grid-snapped integer vector via
  * `transform(...)` in three separate lineages (VERDICT r2 "What's wrong"
  * #3: most of q48's 6.8 s). These expressions do the same arithmetic in
  * tight JVM loops, one virtual call per row, inside whole-stage codegen.
  *
  * Determinism contract (graft oracle rules):
  *  - [[SnapGrid]] reproduces `CAST(round(CAST(x AS DOUBLE) * scale) AS
  *    BIGINT)` exactly (round half away from zero, like Spark's `round` and
  *    DuckDB's `round`); integer outputs are safe join/group keys.
  *  - [[LongDot]]/[[LongNormSq]] are exact integer sums (order-immune).
  *  - [[DoubleDot]]/[[DoubleNormSq]] fold in element order with the same
  *    `a + x*y` / `a + x*x` operation sequence as Spark's `aggregate()` and
  *    DuckDB's `list_aggregate('sum')`, so the IEEE result is bit-identical
  *    to the lambda formulation they replace.
  */
case class SnapGrid(child: Expression, scale: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def prettyName: String = "snap_grid"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null slots snap to 0 (same policy as HyperplaneBucket)
      out(i) = if (arr.isNullAt(i)) 0L
        else HashOps.roundHalfAway(arr.getDouble(i) * scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("snapGrid", this, classOf[SnapGrid].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SnapGrid =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ over two long arrays (length = min of the two). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def prettyName: String = "long_dot"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longDot", this, classOf[LongDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

/** Σ xᵢ² over a long array. */
case class LongNormSq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(LongType))
  override def prettyName: String = "long_norm_sq"

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val x = a.getLong(i); acc += x * x }
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longNormSq", this, classOf[LongNormSq].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LongNormSq =
    copy(child = newChild)
}

/** Sequential-order double dot product: acc = acc + aᵢ·bᵢ, i ascending —
  * bit-identical to `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
  * (s,x) -> s+x)` and DuckDB's list_aggregate('sum') over the same list.
  * Null slots contribute nothing (the lambda form would null-poison; the
  * engine's vectors are containsNull=false so the branch never fires). */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def prettyName: String = "double_dot"

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("doubleDot", this, classOf[DoubleDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleDot =
    copy(left = l, right = r)
}

/** Sequential-order Σ xᵢ² over a double array (see [[DoubleDot]] contract). */
case class DoubleNormSq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def prettyName: String = "double_norm_sq"

  def compute(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val x = a.getDouble(i); acc += x * x }
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("doubleNormSq", this, classOf[DoubleNormSq].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DoubleNormSq =
    copy(child = newChild)
}
