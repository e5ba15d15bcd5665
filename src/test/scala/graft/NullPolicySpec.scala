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
}
