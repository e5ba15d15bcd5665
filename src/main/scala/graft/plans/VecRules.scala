package graft.plans

import graft.functions.{DoubleDot, DoubleNormSq, LongDot, LongNormSq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule for the graft vector kernels: a self dot
  * product is a squared norm, so `double_dot(x, x)` / `long_dot(x, x)`
  * rewrite to the unary `*_norm_sq(x)` kernel — one array traversal
  * instead of two array reads per row, and one fewer child in codegen.
  *
  * The rewrite is exact, not approximate: both kernels fold in element
  * order with the same skip-null-slot policy, so `dot(x, x)` and
  * `norm_sq(x)` produce bit-identical IEEE doubles (PlanRulesSpec proves
  * value equality; the null policies are pinned by NullPolicySpec).
  * Guarded on determinism: for a nondeterministic child, the two
  * arguments of `dot` are two evaluations and must not collapse.
  *
  * Wiring: production sessions get it from [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`); live sessions via [[VecRules.install]]
  * (`spark.experimental.extraOptimizations` — the supported post-build
  * hook for optimizer rules).
  */
object VecRules extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DoubleDot(a, b) if a.deterministic && a.semanticEquals(b) => DoubleNormSq(a)
      case LongDot(a, b) if a.deterministic && a.semanticEquals(b) => LongNormSq(a)
    }

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VecRules))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRules
}
