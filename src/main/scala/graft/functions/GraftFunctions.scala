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

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("gzip_decode"),
      info("gzip_decode", "gzip_decode(binary) - gunzip + UTF-8 decode, null on malformed input"),
      (args: Seq[Expression]) => GzipDecode(args.head)),
    (FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(array<string>) - 32-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>) - 8-function MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head, 8)))

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      GraftColumn.registerFunction(spark, ident, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (ident, inf, builder) =>
      ext.injectFunction((ident, inf, builder))
    }
}
