package graft.functions

import org.apache.spark.sql.{GraftColumn, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft custom expressions, so
  * `spark.sql("SELECT simhash32(tokens) ...")` works alongside the
  * DataFrame API (SURVEY.md §2B B35).
  *
  * Two wirings:
  *  - production: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (SparkSessionExtensions.injectFunction at session build);
  *  - ad hoc: `GraftFunctions.register(spark)` on a live session (the
  *    driver harness builds plain sessions).
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftFunctions.type].getName, null, name, usage, "")

  /** Arity-checked single-argument builder: wrong arg counts surface as an
    * AnalysisException at resolution, not a ClassCastException in codegen
    * (silently computing with dropped args is worse than either). */
  private def unary(name: String)(build: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(e) => build(e)
    case args =>
      throw GraftColumn.analysisError(
        s"$name expects exactly 1 argument, got ${args.length}")
  }

  private def binary(name: String)(
      build: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => build(a, b)
    case args =>
      throw GraftColumn.analysisError(
        s"$name expects exactly 2 arguments, got ${args.length}")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("gzip_decode"),
      info("gzip_decode", "gzip_decode(binary) - gunzip + UTF-8 decode, null on malformed input"),
      unary("gzip_decode")(GzipDecode)),
    (FunctionIdentifier("deflate_len"),
      info("deflate_len", "deflate_len(string) - DEFLATE-compressed byte length (level 6), the compression-ratio quality signal"),
      unary("deflate_len")(DeflateLen)),
    (FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(array<string>) - 32-bit SimHash of a token array"),
      unary("simhash32")(SimHash32)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>[, k]) - k-function MinHash signature (default k=8)"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => MinHashSig(e, 8)
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) if k > 0 =>
          MinHashSig(e, k)
        case _ =>
          throw GraftColumn.analysisError(
            "minhash_sig expects (array<string>) or (array<string>, positive int literal k)")
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(array<string>, n) - distinct n-word shingles (null tokens dropped)"),
      (args: Seq[Expression]) => args match {
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) if n > 0 =>
          WordShingles(e, n)
        case _ =>
          throw GraftColumn.analysisError(
            "word_shingles expects (array<string>, positive int literal n)")
      }),
    (FunctionIdentifier("word_bigrams"),
      info("word_bigrams", "word_bigrams(array<string>) - adjacent word pairs (null tokens dropped)"),
      unary("word_bigrams")(WordBigrams)),
    (FunctionIdentifier("cdc_bounds"),
      info("cdc_bounds", "cdc_bounds(string) - content-defined chunk end positions (rolling-hash, 1-indexed)"),
      unary("cdc_bounds")(CdcBoundaries)),
    (FunctionIdentifier("char_pair_counts"),
      info("char_pair_counts", "char_pair_counts(string) - distinct adjacent char pairs with counts (space-pairs excluded)"),
      unary("char_pair_counts")(CharPairCounts)),
    (FunctionIdentifier("snap_grid"),
      info("snap_grid", "snap_grid(array<double>, scale) - round(x*scale) per element as BIGINT (half away from zero)"),
      (args: Seq[Expression]) => args match {
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) if k > 0 =>
          SnapGrid(e, k.toLong)
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Long, _)) if k > 0 =>
          SnapGrid(e, k)
        case _ =>
          throw GraftColumn.analysisError(
            "snap_grid expects (array<double>, positive integer literal scale)")
      }),
    (FunctionIdentifier("long_dot"),
      info("long_dot", "long_dot(array<bigint>, array<bigint>) - exact integer dot product"),
      binary("long_dot")(LongDot)),
    (FunctionIdentifier("long_norm_sq"),
      info("long_norm_sq", "long_norm_sq(array<bigint>) - exact integer sum of squares"),
      unary("long_norm_sq")(LongNormSq)),
    (FunctionIdentifier("double_dot"),
      info("double_dot", "double_dot(array<double>, array<double>) - element-order dot product (bit-identical to aggregate(zip_with(...)))"),
      binary("double_dot")(DoubleDot)),
    (FunctionIdentifier("double_norm_sq"),
      info("double_norm_sq", "double_norm_sq(array<double>) - element-order sum of squares"),
      unary("double_norm_sq")(DoubleNormSq)),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(string, string) - Jaro-Winkler similarity in [0,1] (boost threshold 0.7, prefix cap 4). Operates on UTF-8 BYTES: multi-byte characters count per byte, so non-ASCII scores diverge from char-based implementations"),
      binary("jaro_winkler")(JaroWinkler)))

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      GraftColumn.registerFunction(spark, ident, inf, builder)
    }
}

/** `spark.sql.extensions` entry point: the SQL functions, the vector
  * optimizer rule ([[graft.plans.VecRules]]), and the per-group top-k
  * planner strategy ([[graft.plans.GroupTopKStrategy]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (ident, inf, builder) =>
      ext.injectFunction((ident, inf, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.VecRules)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
  }
}
