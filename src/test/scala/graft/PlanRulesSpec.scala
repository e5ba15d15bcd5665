package graft

import graft.functions.{DoubleDot, DoubleNormSq, GraftFunctions, LongDot, SnapGrid}
import graft.plans.VecRules
import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._

/** The custom Catalyst optimizer rule surface: [[VecRules]] rewrites a
  * self dot product to the unary squared-norm kernel, registered on the
  * session like any extension rule. Tests run over the parquet-backed
  * embeddings relation — a literal relation would be constant-folded to a
  * LocalRelation before the rewrite is observable. */
class PlanRulesSpec extends SparkSpec {

  private def dd(a: Column, b: Column) =
    GraftColumn(DoubleDot(GraftColumn.expr(a), GraftColumn.expr(b)))
  private def dnorm(a: Column) =
    GraftColumn(DoubleNormSq(GraftColumn.expr(a)))
  private def ldot(a: Column, b: Column) =
    GraftColumn(LongDot(GraftColumn.expr(a), GraftColumn.expr(b)))
  private def snap(a: Column) =
    GraftColumn(SnapGrid(GraftColumn.expr(a), 1000L))

  private def vecs = Tables.embeddings(spark, sf)
    .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))

  test("double_dot(x, x) optimizes to double_norm_sq(x) with identical values") {
    VecRules.install(spark)
    import spark.implicits._
    val df = vecs.select(col("vec_id"), dd(col("vd"), col("vd")).as("d")).orderBy("vec_id")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("double_norm_sq"), s"rule did not fire:\n${opt.take(800)}")
    assert(!opt.contains("double_dot"), s"double_dot survived:\n${opt.take(800)}")
    val viaNorm = vecs.select(col("vec_id"), dnorm(col("vd")).as("d")).orderBy("vec_id")
      .select("d").as[Double].collect()
    val got = df.select("d").as[Double].collect()
    assert(got.length > 0)
    assert(got.zip(viaNorm).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) })
  }

  test("long_dot(x, x) optimizes to long_norm_sq(x); distinct args do not collapse") {
    VecRules.install(spark)
    val df = vecs.select(
      ldot(snap(col("vd")), snap(col("vd"))).as("self"),
      ldot(snap(col("vd")), snap(reverse(col("vd")))).as("cross"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("long_norm_sq"), s"self dot not rewritten:\n${opt.take(800)}")
    assert(opt.contains("long_dot"), s"cross dot wrongly rewritten:\n${opt.take(800)}")
    assert(df.count() > 0)
  }

  test("the spark.sql.extensions entry point carries functions and the rule") {
    // GraftExtensions is exercised structurally: applying it to a fresh
    // SparkSessionExtensions must register every SQL function and inject
    // the optimizer rule without touching the live session.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // the live-session paths for the same artifacts:
    GraftFunctions.register(spark)
    VecRules.install(spark)
    VecRules.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations.count(_ == VecRules) === 1)
    assert(spark.sql("SELECT double_norm_sq(array(3.0D, 4.0D))").head.getDouble(0) === 25.0)
  }
}
