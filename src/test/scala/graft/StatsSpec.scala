package graft

import org.apache.spark.sql.functions._

/** The CBO-statistics planning pillar, demonstrated (r11 verdict task 2).
  * SURVEY §4 delegates join planning to Catalyst "when stats collected" —
  * DppSpec pins dynamic pruning and BucketingSpec pins co-located joins,
  * but nothing exercised the third pillar: `ANALYZE TABLE` statistics
  * actually CHANGING a plan. This suite collects table + column stats on
  * catalog tables and pins two stats-driven effects:
  *
  *  1. rowCount/sizeInBytes from ANALYZE flow into `plan.stats`
  *     (a 100 TB planner's inputs exist and are exact), and
  *  2. with CBO on, COLUMN stats (min/max) let FilterEstimation shrink a
  *     filtered dimension below the broadcast threshold, flipping a
  *     SortMergeJoin into a BroadcastHashJoin — the same query, the same
  *     configs, before vs after one `ANALYZE ... FOR COLUMNS` run.
  *
  * That flip is exactly the decision that matters at 100 TB: a dim table
  * whose FILE size is over the broadcast bar but whose filtered slice is
  * tiny only broadcasts if the planner can estimate the filter — and only
  * statistics make that estimate (the file-size fallback cannot see
  * predicate selectivity). AQE can rescue it at runtime from actual sizes,
  * but one shuffle stage too late; stats fix the INITIAL plan. */
class StatsSpec extends SparkSpec {

  private val dim = "graft_stats_dim"
  private val fact = "graft_stats_fact"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joinPlan(): String = {
    // dim's FILTERED slice is 1000 of 200k keys: tiny if the planner can
    // see the selectivity, 'the whole file' if it can't
    val d = spark.table(dim).filter(col("k") < 1000)
    spark.table(fact).join(d, "k")
      .groupBy("k").agg(sum("v").as("sv"))
      .queryExecution.executedPlan.toString
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    // the pad column makes the dim's FILE size comfortably exceed the
    // test's 256 KiB broadcast threshold (md5 text compresses poorly)
    spark.range(0, 200000)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("pad"))
      .write.mode("overwrite").saveAsTable(dim)
    spark.range(0, 50000)
      .select((col("id") % 200000).as("k"), col("id").as("v"))
      .write.mode("overwrite").saveAsTable(fact)
  }

  override def afterAll(): Unit = {
    try {
      spark.sql(s"DROP TABLE IF EXISTS $dim")
      spark.sql(s"DROP TABLE IF EXISTS $fact")
    } finally super.afterAll()
  }

  test("ANALYZE TABLE statistics are collected and exact in plan.stats") {
    spark.sql(s"ANALYZE TABLE $fact COMPUTE STATISTICS")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = spark.table(fact).queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(50000)),
        s"ANALYZE rowCount must reach the plan: $st")
      assert(st.sizeInBytes > 0)
    }
  }

  test("column stats flip the filtered-dim join from SMJ to broadcast — same query, stats on vs off") {
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString,
      // AQE off so the STATIC decision is what we read (AQE would rescue
      // the bad plan at runtime — one shuffle too late; see scaladoc)
      "spark.sql.adaptive.enabled" -> "false") {
      // drop any stats a prior run left, then pin the no-stats plan
      spark.sql(s"DROP TABLE IF EXISTS $dim")
      spark.range(0, 200000)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("pad"))
        .write.mode("overwrite").saveAsTable(dim)
      val before = joinPlan()
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without stats the 7 MB dim file must NOT broadcast:\n${before.take(1200)}")

      spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS FOR COLUMNS k")
      val after = joinPlan()
      assert(after.contains("BroadcastHashJoin"),
        s"with min/max column stats the 0.5%-selective dim slice must broadcast:\n${after.take(1200)}")
    }
  }
}
