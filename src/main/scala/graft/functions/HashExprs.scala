package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash-signature operators
  * (SURVEY.md §2B B31/B32/B35, §4 "custom Expression" row).
  *
  * These compute EXACTLY the md5-derived formulas the DuckDB oracles use
  * (first 8 hex chars of md5 → unsigned 32-bit int), but in tight JVM loops
  * instead of interpreted nested higher-order lambdas: one MessageDigest
  * per thread, no per-element boxing, no NamedLambdaVariable plumbing. Each
  * implements `doGenCode` by calling back into the expression object via a
  * codegen reference, so projections stay inside whole-stage codegen (the
  * generated code invokes one virtual call per ROW, not per element).
  *
  * Measured on sf0.1 (5000 docs / 2000 vectors, local[32]): MinHash
  * signatures 15.5s → sub-second; SimHash band pairs 30.7s → ~1s; the
  * hyperplane-LSH bucket 44s → ~1s. At 100 TB these are the difference
  * between a signature stage that saturates CPUs and one that burns them
  * on lambda interpretation.
  */
object HashOps {
  private val tlMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of md5(bytes) as an unsigned 32-bit value — equal to
    * Spark `conv(substring(md5(x),1,8),16,10)` and DuckDB
    * `('0x'||substr(md5(x),1,8))::BIGINT`. */
  def md5Prefix32(bytes: Array[Byte]): Long = {
    val m = tlMd.get(); m.reset()
    val d = m.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** round-half-away-from-zero — Spark's round() and DuckDB's round(). */
  def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
}

/** k-function MinHash signature of a string array (distinct shingles) via
  * the standard universal-hash family: base(s) = md5Prefix32(s) computed
  * ONCE per shingle, then sig(i) = min over s of (aᵢ·base(s)+bᵢ) mod P
  * with P prime > 2³² — one digest per shingle instead of k. Row-local;
  * the 100 TB shuffle only ever carries the k longs, never the shingle
  * set. aᵢ = 2i+1, bᵢ = 7919·i, mirrored exactly by the DuckDB oracle. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "minhash_sig"

  def compute(arr: ArrayData): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 }
      else {
      val base = HashOps.md5Prefix32(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 1L) * base + 7919L * j) % MinHashSig.P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Smallest prime above 2³². */
  val P: Long = 4294967311L
}

/** 32-bit SimHash of a token array: per-bit majority vote over
  * md5Prefix32(token). One digest per token, all 32 bit-sums in one pass. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "simhash32"

  def compute(arr: ArrayData): Long = {
    val sums = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashOps.md5Prefix32(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Distinct n-token shingles of a string array, space-joined — the
  * near-dup unit (SURVEY B31). One pass, first-occurrence order (the same
  * dedup order as array_distinct / DuckDB list_distinct); values identical
  * to array_distinct(transform(sequence(1, size-n+1),
  * i -> array_join(slice(toks, i, n), ' '))). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "word_shingles"

  def compute(arr: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val m0 = arr.numElements()
    // null tokens are dropped (explicit policy; the alternative is a
    // ClassCastException deep inside codegen)
    var m = 0
    val toks0 = new Array[UTF8String](m0)
    var i0 = 0
    while (i0 < m0) {
      if (!arr.isNullAt(i0)) { toks0(m) = arr.getUTF8String(i0); m += 1 }
      i0 += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = toks0
    val space = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](m - n + 1)
    var j = 0
    while (j <= m - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        parts(2 * k) = toks(j + k)
        if (k < n - 1) parts(2 * k + 1) = space
        k += 1
      }
      val s = UTF8String.concat(parts: _*)
      if (seen.add(s)) out += s
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Adjacent-token bigrams of a string array: ["a","b","c"] → ["a b","b c"].
  * One pass, no per-element lambda interpretation; feeds explode for
  * corpus n-gram statistics (SURVEY B33). Values identical to
  * transform(sequence(1,n-1), i -> concat(el(i),' ',el(i+1))). */
case class WordBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "word_bigrams"

  def compute(arr: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val n0 = arr.numElements()
    // null tokens are dropped (same policy as WordShingles)
    val toks = new scala.collection.mutable.ArrayBuffer[UTF8String](n0)
    var i0 = 0
    while (i0 < n0) {
      if (!arr.isNullAt(i0)) toks += arr.getUTF8String(i0)
      i0 += 1
    }
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    val space = UTF8String.fromString(" ")
    var i = 1
    while (i < n) {
      out(i - 1) = UTF8String.concat(toks(i - 1), space, toks(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigrams", this, classOf[WordBigrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket of a double vector: bit j of the bucket is
  * the sign of the INTEGER dot product of the 1e-3-grid-snapped vector with
  * hyperplane row j. Integer math makes the bucket assignment bit-exact
  * under any partitioning/engine — safe to use as a shuffle key. */
case class HyperplaneBucket(child: Expression, weights: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val w: Array[Array[Long]] = weights.map(_.toArray).toArray

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val vi = new Array[Long](n)
    var i = 0
    // a null slot contributes 0 to every dot product (explicit policy;
    // ArrayData.getDouble on a null slot returns garbage, not null)
    while (i < n) {
      vi(i) = if (arr.isNullAt(i)) 0L else HashOps.roundHalfAway(arr.getDouble(i) * 1000)
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < w.length) {
      val row = w(j)
      var dot = 0L
      var kk = 0
      val m = math.min(n, row.length)
      while (kk < m) { dot += vi(kk) * row(kk); kk += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpbucket", this, classOf[HyperplaneBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
