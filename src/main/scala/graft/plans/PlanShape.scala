package graft.plans

import org.apache.spark.sql.DataFrame

/** Normalized physical-plan SKELETON — the structural lines (exchanges,
  * joins, scans, windows, sorts, top-k) of `executedPlan` with the
  * run-varying noise stripped, so two plans can be diffed as text across
  * JVMs and rounds.
  *
  * This is the artifact the per-round SCALE.md plan audits read (via
  * [[graft.Explain]]) and the artifact `PlanShapeSpec` pins as golden
  * files: a regression that adds an Exchange, flips a BroadcastHashJoin
  * to SortMergeJoin, or widens a parquet scan's column list shows up as
  * a one-line text diff instead of a bench delta three rounds later
  * (the q70/q71 double-scan class was caught by eye in r12; this makes
  * the catch mechanical).
  *
  * Stripped noise classes: expression ids (`#123`), plan/exchange ids,
  * whole-stage-codegen stage numbers (`*(3)`), absolute input paths,
  * and trailing partition counts (test JVMs plan with 8 shuffle
  * partitions, the bench with 32 — counts are config, not shape).
  */
object PlanShape {
  private val structural = Seq(
    "Exchange", "Join", "Scan parquet", "Window", "Sort ", "TakeOrdered",
    "Expand", "Generate", "Union", "CartesianProduct", "LocalLimit",
    "GlobalLimit")

  /** One normalized line per structural operator, outermost first. */
  def skeleton(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => structural.exists(l.contains))
      .map(normalize)
      .mkString("\n")

  def normalize(line: String): String =
    line
      .replaceAll("#\\d+L?", "")                 // expression ids
      .replaceAll("\\[plan_id=\\d+\\]", "")      // AQE plan ids
      .replaceAll("\\[id=#?\\d+\\]", "")         // exchange ids
      .replaceAll("\\*\\(\\d+\\)", "*")          // codegen stage numbers
      .replaceAll("file:[^\\]\\s,]*", "<path>")  // absolute locations
      .replaceAll("/(?:root|tmp)[^\\]\\s,]*", "<path>")
      .replaceAll(", \\d+\\)", ", N)")           // partition counts
      .replaceAll("\\s+$", "")
      .take(200)
}
