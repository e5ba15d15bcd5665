package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series diagnostics & operational-control operators over the
  * `events` stream table (SURVEY.md §2B B278–B280) — the layer an SRE or
  * capacity planner runs ON TOP of the per-day aggregates the engine
  * already produces: autocorrelation structure (q317), statistical
  * process control (q318), and cohort lifetime-value accumulation (q319).
  *
  * Family placement: q117 fits a trend, q125 profiles day-of-week,
  * q206/q305 find changepoints, q232 backtests a seasonal forecast —
  * this pack adds the DIAGNOSTIC (which lags carry signal at all: ACF),
  * the ALARM (is today's error rate inside its binomial control band:
  * p-chart), and the VALUE readout (how much a signup cohort is worth
  * by week k: LTV).
  *
  * Scale posture (100 TB), shared across the pack: every query's
  * corpus-scale work is ONE partial-aggregated shuffle onto a bounded
  * grid (type×day ≤ ~150 cells, day ≤ ~30 cells, cohort×week ≤ ~25
  * cells, user×week for q319 — the randomization-unit grain every
  * experiment query already pays); all series arithmetic (lags,
  * cumulative sums, control limits) happens on that grid. Exact
  * integer/DECIMAL(38) staging end to end — no float ever crosses an
  * engine boundary.
  */
object SeriesOps extends QueryPack {
  import Tables._

  // q317: AUTOCORRELATION FUNCTION (lags 1–7) — the diagnostic the trend
  // family (q117 slope, q125 dow, q232 MASE, q301 Mann–Kendall) relies
  // on but never states: WHICH lags of the daily series carry linear
  // signal. Per event type over the (type, day) count grid, the
  // sample ACF r_k = Σ_{t>k}(y_t−ȳ)(y_{t−k}−ȳ) / Σ_t(y_t−ȳ)² is made
  // integer-exact by scaling deviations by n (d_t = n·y_t − S; the n²
  // factors cancel in the ratio), staged DECIMAL(38). Sign is carried
  // SEPARATELY (the q302 convention) so no negative value ever meets a
  // truncating division, and the Bartlett ±2/√n significance band is
  // tested by cross-multiplication on the already-truncated milli value
  // (acf² · n ≥ 4·10⁶) — identical truncation in both engines, no sqrt.
  // 100 TB shape: one (type, day) partial-agg shuffle; the lag products
  // are 7 window lags + a stack on the ≤ types×31-cell grid.
  private def q317(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val wl = Window.partitionBy("event_type").orderBy("day")
    val dev = daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("sy", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - sy"))
    val lagged = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"l$k", lag("dd", k).over(wl))
    }
    val den = dev.groupBy("event_type")
      .agg(max("n").as("n_days"), sum(expr("dd * dd")).as("den"))
    val prods = lagged.select(col("event_type"), col("dd"),
      expr("stack(7, " + (1 to 7).map(k => s"$k, l$k").mkString(", ") +
        ") AS (lag, dl)"))
      .filter(col("dl").isNotNull)
      .groupBy("event_type", "lag")
      .agg(sum(expr("dd * dl")).as("num"))
    prods.join(den, "event_type")
      .withColumn("acf_sign", expr("CAST(sign(num) AS BIGINT)"))
      .withColumn("acf_milli", expr(
        "CASE WHEN den > 0 THEN CAST(abs(num) * 1000 div den AS BIGINT) ELSE 0L END"))
      .withColumn("significant", expr(
        "CAST(acf_milli * acf_milli * n_days >= 4000000 AS BIGINT)"))
      .select(col("event_type"), expr("CAST(lag AS BIGINT)").as("lag"),
        col("n_days"), col("acf_sign"), col("acf_milli"), col("significant"))
      .orderBy("event_type", "lag")
  }

  private val q317Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, day,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) * y
      |     - sum(y) OVER (PARTITION BY event_type) AS dd,
      |   count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |lg AS (SELECT event_type, dd, n,
      |   lag(dd, 1) OVER w AS l1, lag(dd, 2) OVER w AS l2,
      |   lag(dd, 3) OVER w AS l3, lag(dd, 4) OVER w AS l4,
      |   lag(dd, 5) OVER w AS l5, lag(dd, 6) OVER w AS l6,
      |   lag(dd, 7) OVER w AS l7
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |den AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   sum(dd * dd) AS den FROM lg GROUP BY 1),
      |long AS (
      |  SELECT event_type, k.lag AS lag, dd * CASE k.lag
      |    WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3 WHEN 4 THEN l4
      |    WHEN 5 THEN l5 WHEN 6 THEN l6 WHEN 7 THEN l7 END AS p
      |  FROM lg CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k),
      |num AS (SELECT event_type, lag, sum(p) AS num FROM long
      |  WHERE p IS NOT NULL GROUP BY 1, 2)
      |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag, d.n_days,
      | CAST(sign(n.num) AS BIGINT) AS acf_sign,
      | CASE WHEN d.den > 0 THEN CAST(abs(n.num) * 1000 // d.den AS BIGINT)
      |   ELSE 0 END AS acf_milli,
      | CAST((CASE WHEN d.den > 0 THEN CAST(abs(n.num) * 1000 // d.den AS BIGINT)
      |   ELSE 0 END) * (CASE WHEN d.den > 0
      |     THEN CAST(abs(n.num) * 1000 // d.den AS BIGINT) ELSE 0 END)
      |   * d.n_days >= 4000000 AS BIGINT) AS significant
      |FROM num n JOIN den d USING (event_type)
      |ORDER BY event_type, lag""".stripMargin

  // q318: p-CHART (BINOMIAL PROCESS CONTROL) — the alarm the anomaly
  // family stops short of: q113 z-scores a rolling mean, q206 CUSUM
  // detects a sustained shift, but an on-call rotation pages on the
  // SHEWHART rule — is today's error RATE outside the ±3σ binomial
  // band around the pooled rate, with σ² = p̄(1−p̄)/n_d shrinking on
  // high-volume days (a fixed-threshold alarm either misses low-volume
  // drift or pages on noise; the p-chart scales the band per day).
  // Exact integer form in ppm: day is out-of-band iff
  // (rate_ppm − pooled_ppm)² · n_d > 9 · pooled_ppm · (10⁶ − pooled_ppm)
  // — cross-multiplied, no sqrt, truncation identical in both engines.
  // 100 TB shape: ONE day-grain partial-agg shuffle (counts + error
  // counts in the same pass); the pooled row is a broadcast crossJoin.
  /** The (day, n_events, n_errors) control grid — the partial the
    * streaming twin ([[graft.streaming.ControlStream]]) maintains by
    * associative sum-merge; factored so stream ≡ batch by construction. */
  private[graft] def dailyControlFrom(ev: DataFrame): DataFrame =
    ev.withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))

  /** q318's closing pass: the p-chart report as a pure function of the
    * maintained daily grid. */
  private[graft] def pchartFromDaily(daily: DataFrame): DataFrame = {
    val pooled = daily.agg(sum("n_events").as("tot_n"), sum("n_errors").as("tot_x"))
      .withColumn("pooled_ppm", expr("tot_x * 1000000 div tot_n"))
      .select("pooled_ppm")
    daily.crossJoin(broadcast(pooled))
      .withColumn("rate_ppm", expr("n_errors * 1000000 div n_events"))
      .withColumn("delta_sign", expr("CAST(sign(rate_ppm - pooled_ppm) AS BIGINT)"))
      .withColumn("oob", expr(
        """CAST(CAST(rate_ppm - pooled_ppm AS DECIMAL(38,0))
          |  * (rate_ppm - pooled_ppm) * n_events
          |  > CAST(9 AS DECIMAL(38,0)) * pooled_ppm * (1000000 - pooled_ppm)
          |  AS BIGINT)""".stripMargin))
      .select("day", "n_events", "n_errors", "rate_ppm", "pooled_ppm",
        "delta_sign", "oob")
      .orderBy("day")
  }

  private def q318(s: SparkSession, d: String): DataFrame =
    pchartFromDaily(dailyControlFrom(events(s, d)))

  private val q318Sql =
    """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS n_events,
      |   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
      |  FROM events GROUP BY 1),
      |pooled AS (SELECT sum(n_errors) * 1000000 // sum(n_events) AS pooled_ppm
      |  FROM daily)
      |SELECT day, CAST(n_events AS BIGINT) AS n_events,
      | CAST(n_errors AS BIGINT) AS n_errors,
      | CAST(n_errors * 1000000 // n_events AS BIGINT) AS rate_ppm,
      | CAST(pooled_ppm AS BIGINT) AS pooled_ppm,
      | CAST(sign(n_errors * 1000000 // n_events - pooled_ppm) AS BIGINT) AS delta_sign,
      | CAST(CAST(n_errors * 1000000 // n_events - pooled_ppm AS HUGEINT)
      |   * (n_errors * 1000000 // n_events - pooled_ppm) * n_events
      |   > CAST(9 AS HUGEINT) * pooled_ppm * (1000000 - pooled_ppm)
      |   AS BIGINT) AS oob
      |FROM daily CROSS JOIN pooled ORDER BY day""".stripMargin

  // q319: COHORT LTV ACCUMULATION — the VALUE counterpart of q87's
  // retention matrix: retention says a cohort still shows up in week k;
  // LTV says what it has SPENT by week k (cumulative purchase cents per
  // signup-week cohort), the readout growth teams set payback windows
  // by. Cohort = the user's first-activity week (week 0 = the week of
  // 2024-01-01, day index 19723); a (cohort, offset) cell exists
  // wherever any cohort user had ANY event that week (same cell
  // construction in both engines — no dense-grid scaffold needed), and
  // purchase cents accumulate over offsets via one bounded window.
  // 100 TB shape: ONE (user, week) partial-agg shuffle (the experiment
  // family's randomization-unit grain), first-week via a per-user
  // window on that ≤ users×5 frame, then a ≤ 5×5-cell grid; per-user
  // LTV is an integer division on the grid.
  private def q319(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .withColumn("week", expr("(unix_micros(ts) div 86400000000 - 19723) div 7"))
      .groupBy("user_id", "week")
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("pv"))
    val wu = Window.partitionBy("user_id")
    val cells = uw
      .withColumn("cohort_week", min("week").over(wu))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"), sum("pv").as("week_cents"))
    val sizes = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val wc = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), "cohort_week")
      .withColumn("cum_cents", sum("week_cents").over(wc))
      .withColumn("ltv_cents", expr("cum_cents div n_users"))
      .select("cohort_week", "week_offset", "n_users", "n_active",
        "week_cents", "cum_cents", "ltv_cents")
      .orderBy("cohort_week", "week_offset")
  }

  private val q319Sql =
    """WITH uw AS (SELECT user_id,
      |   (epoch_us(ts) // 86400000000 - 19723) // 7 AS week,
      |   sum(CASE WHEN event_type = 'purchase'
      |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS pv
      |  FROM events GROUP BY 1, 2),
      |fw AS (SELECT user_id, week, pv,
      |   min(week) OVER (PARTITION BY user_id) AS cohort_week
      |  FROM uw),
      |cells AS (SELECT cohort_week, week - cohort_week AS week_offset,
      |   count(DISTINCT user_id) AS n_active, sum(pv) AS week_cents
      |  FROM fw GROUP BY 1, 2),
      |sizes AS (SELECT cohort_week, count(*) AS n_users FROM
      |   (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
      |  GROUP BY 1),
      |cum AS (SELECT c.cohort_week, c.week_offset, s.n_users, c.n_active,
      |   c.week_cents,
      |   sum(c.week_cents) OVER (PARTITION BY c.cohort_week
      |     ORDER BY c.week_offset
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      |  FROM cells c JOIN sizes s USING (cohort_week))
      |SELECT cohort_week, week_offset, CAST(n_users AS BIGINT) AS n_users,
      | CAST(n_active AS BIGINT) AS n_active,
      | CAST(week_cents AS BIGINT) AS week_cents,
      | CAST(cum_cents AS BIGINT) AS cum_cents,
      | CAST(cum_cents // n_users AS BIGINT) AS ltv_cents
      |FROM cum ORDER BY cohort_week, week_offset""".stripMargin

  // q332: SEASONALITY STRENGTH (ANOVA R² OF THE DOW PROFILE) — closes
  // the loop the seasonal family leaves open: q125 detects that the
  // day-of-week mix DRIFTED, q232 backtests whether last-week-same-day
  // predicts, q317 shows the lag-7 spike — but a capacity planner needs
  // ONE number for "how much of the daily variance does the weekly
  // profile explain": the between-dow share of total variance,
  // SSB/SST ∈ [0, 1] (the one-way-ANOVA η²). Staging per the q327
  // rule: dow and global means in milli (bounded quotients), SSB and
  // SST rebuilt as DECIMAL(38) sums of squared milli deviations, ONE
  // final bounded division. Peak dow reported under a total order
  // (mean DESC, dow). 100 TB: one (type, day) partial-agg shuffle; the
  // dow collapse, mean join-back, and ratio are all ≤ types×31 grid.
  private def q332(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", expr("day % 7"))
    graft.Caches.persist(daily)
    val glob = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
      .withColumn("m_milli", expr(
        "CAST(CAST(s AS DECIMAL(38,0)) * 1000 div n AS BIGINT)"))
      .select("event_type", "n", "m_milli")
    val dow = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("ng"), sum("y").as("sg"))
      .withColumn("mg_milli", expr(
        "CAST(CAST(sg AS DECIMAL(38,0)) * 1000 div ng AS BIGINT)"))
    val ssb = dow.join(broadcast(glob), "event_type")
      .groupBy("event_type")
      .agg(sum(expr(
        "CAST(ng AS DECIMAL(38,0)) * (mg_milli - m_milli) * (mg_milli - m_milli)"))
        .as("ssb"))
    val sst = daily.join(broadcast(glob), "event_type")
      .groupBy("event_type")
      .agg(sum(expr(
        "CAST(y * 1000 - m_milli AS DECIMAL(38,0)) * (y * 1000 - m_milli)"))
        .as("sst"))
    val peak = dow
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("mg_milli"), col("dow"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("dow").as("peak_dow"),
        col("mg_milli").as("peak_mean_milli"))
    glob.join(ssb, "event_type").join(sst, "event_type").join(peak, "event_type")
      .select(col("event_type"), col("n").as("n_days"),
        expr("CASE WHEN sst > 0 THEN CAST(ssb * 1000 div sst AS BIGINT) ELSE 0L END")
          .as("strength_milli"),
        col("peak_dow"), col("peak_mean_milli"))
      .orderBy("event_type")
  }

  private val q332Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dd AS (SELECT *, day % 7 AS dow FROM daily),
      |gl AS (SELECT event_type, count(*) AS n,
      |   CAST(CAST(sum(y) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS m_milli
      |  FROM dd GROUP BY 1),
      |dw AS (SELECT event_type, dow, count(*) AS ng,
      |   CAST(CAST(sum(y) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS mg_milli
      |  FROM dd GROUP BY 1, 2),
      |sb AS (SELECT event_type,
      |   sum(CAST(ng AS HUGEINT) * (mg_milli - m_milli) * (mg_milli - m_milli))
      |     AS ssb
      |  FROM dw JOIN gl USING (event_type) GROUP BY 1),
      |st AS (SELECT event_type,
      |   sum(CAST(y * 1000 - m_milli AS HUGEINT) * (y * 1000 - m_milli)) AS sst
      |  FROM dd JOIN gl USING (event_type) GROUP BY 1),
      |pk AS (SELECT event_type, dow AS peak_dow, mg_milli AS peak_mean_milli
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |     ORDER BY mg_milli DESC, dow) AS rn FROM dw) WHERE rn = 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      | CASE WHEN sst > 0 THEN CAST(ssb * 1000 // sst AS BIGINT)
      |  ELSE 0 END AS strength_milli,
      | CAST(peak_dow AS BIGINT) AS peak_dow, peak_mean_milli
      |FROM gl JOIN sb USING (event_type) JOIN st USING (event_type)
      | JOIN pk USING (event_type)
      |ORDER BY event_type""".stripMargin

  // q333: OVERDISPERSION (VARIANCE-TO-MEAN) AUDIT — the assumption gate
  // under every count-based alarm in the pack: the p-chart's binomial
  // band (q318) and any Poisson-flavored rate monitor are only
  // calibrated when daily counts are NOT overdispersed; real event
  // streams usually are (bursts, bots — q230's regularity audit is the
  // per-user view), which widens true variance and makes a nominal 3σ
  // band page constantly. VMR = s²/ȳ collapses to ONE exact division:
  // Σ(n·y − S)² · 1000 div (n·(n−1)·S) — the n² in the numerator and
  // the n·ȳ = S in the denominator cancel without ever forming either
  // mean. Flag at the declared 1.5× (1500 milli). 100 TB: the same
  // (type, day) grid as q317/q332; two grid passes, one division.
  private def q333(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - s"))
      .groupBy("event_type")
      .agg(max("n").as("n_days"), max("s").as("s"),
        sum(expr("dd * dd")).as("sd2"))
      .withColumn("mean_milli", expr(
        "CAST(CAST(s AS DECIMAL(38,0)) * 1000 div n_days AS BIGINT)"))
      .withColumn("vmr_milli", expr(
        """CASE WHEN n_days > 1 AND s > 0 THEN
          | CAST(sd2 * 1000 div (CAST(n_days AS DECIMAL(38,0)) * (n_days - 1) * s)
          |   AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_days"), col("mean_milli"),
        col("vmr_milli"),
        expr("CAST(vmr_milli > 1500 AS BIGINT)").as("overdispersed"))
      .orderBy("event_type")
  }

  private val q333Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, y,
      |   count(*) OVER (PARTITION BY event_type) AS n,
      |   sum(y) OVER (PARTITION BY event_type) AS s
      |  FROM daily),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   CAST(max(s) AS BIGINT) AS s,
      |   sum((CAST(n AS HUGEINT) * y - s) * (CAST(n AS HUGEINT) * y - s)) AS sd2
      |  FROM dev GROUP BY 1)
      |SELECT event_type, n_days,
      | CAST(CAST(s AS HUGEINT) * 1000 // n_days AS BIGINT) AS mean_milli,
      | CASE WHEN n_days > 1 AND s > 0 THEN
      |  CAST(sd2 * 1000 // (CAST(n_days AS HUGEINT) * (n_days - 1) * s) AS BIGINT)
      | ELSE 0 END AS vmr_milli,
      | CAST((CASE WHEN n_days > 1 AND s > 0 THEN
      |  CAST(sd2 * 1000 // (CAST(n_days AS HUGEINT) * (n_days - 1) * s) AS BIGINT)
      | ELSE 0 END) > 1500 AS BIGINT) AS overdispersed
      |FROM ag ORDER BY event_type""".stripMargin

  // q335: CROSS-CORRELATION (LEAD–LAG) BETWEEN TWO OPERATIONAL SERIES —
  // q317's BIVARIATE sibling, and the question an incident review
  // actually asks: do error spikes LEAD purchase dips, and by how many
  // days? Sample CCF r_k between the daily error-count and daily
  // purchase-count series at lags −3..+3 (negative lag = errors lead),
  // n-scaled deviations exactly as q317, the ratio staged as the q302
  // two-step squared form (sign carried separately, r² =
  // (|num|·1000 div denE)·|num| div denP — never num², which is
  // corpus⁴-sized and would blow DECIMAL(38); C-S bounds the result by
  // 1000). ONE day-grain shuffle with both conditional counts in the
  // same pass; lags are 7 window columns + a stack on the ≤31-row grid.
  private def q335(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("day")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wl = Window.orderBy("day")
    // single-series global window over the ≤31-row day grid — bounded by
    // the calendar, the q318 pooled-row posture (stated, not accidental)
    val dev = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("se", sum("e").over(w))
      .withColumn("sp", sum("p").over(w))
      .withColumn("de", expr("CAST(n AS DECIMAL(38,0)) * e - se"))
      .withColumn("dp", expr("CAST(n AS DECIMAL(38,0)) * p - sp"))
    val lagged = (-3 to 3).foldLeft(dev) { (df, k) =>
      val c = if (k >= 0) lag("dp", k).over(wl) else lead("dp", -k).over(wl)
      df.withColumn(s"l${k + 3}", c)
    }
    val den = dev.agg(max("n").as("n_days"),
      sum(expr("de * de")).as("dene"), sum(expr("dp * dp")).as("denp"))
    lagged.select(col("de"),
      expr("stack(7, " + (-3 to 3).map(k => s"$k, l${k + 3}").mkString(", ") +
        ") AS (lag, dl)"))
      .filter(col("dl").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(expr("de * dl")).as("num"))
      .crossJoin(broadcast(den))
      .withColumn("ccf_sign", expr("CAST(sign(num) AS BIGINT)"))
      .withColumn("ccf2_permille", expr(
        """CASE WHEN dene > 0 AND denp > 0 THEN
          | CAST(CAST(abs(num) * 1000 div dene AS DECIMAL(38,0))
          |   * abs(num) div denp AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(expr("CAST(lag AS BIGINT)").as("lag"), col("n_pairs"),
        col("n_days"), col("ccf_sign"), col("ccf2_permille"))
      .orderBy("lag")
  }

  private val q335Sql =
    """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e,
      |   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      |  FROM events GROUP BY 1),
      |dev AS (SELECT day,
      |   CAST(count(*) OVER () AS HUGEINT) * e - sum(e) OVER () AS de,
      |   CAST(count(*) OVER () AS HUGEINT) * p - sum(p) OVER () AS dp,
      |   count(*) OVER () AS n
      |  FROM daily),
      |lg AS (SELECT de, n,
      |   lead(dp, 3) OVER w AS l0, lead(dp, 2) OVER w AS l1,
      |   lead(dp, 1) OVER w AS l2, dp AS l3,
      |   lag(dp, 1) OVER w AS l4, lag(dp, 2) OVER w AS l5,
      |   lag(dp, 3) OVER w AS l6
      |  FROM dev WINDOW w AS (ORDER BY day)),
      |den AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
      |   sum(de * de) AS dene, sum(dp * dp) AS denp FROM dev),
      |long AS (SELECT k.lag AS lag, de * CASE k.lag
      |    WHEN -3 THEN l0 WHEN -2 THEN l1 WHEN -1 THEN l2 WHEN 0 THEN l3
      |    WHEN 1 THEN l4 WHEN 2 THEN l5 WHEN 3 THEN l6 END AS pr
      |  FROM lg CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) k),
      |num AS (SELECT lag, count(*) AS n_pairs, sum(pr) AS num FROM long
      |  WHERE pr IS NOT NULL GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, n_days,
      | CAST(sign(num) AS BIGINT) AS ccf_sign,
      | CASE WHEN dene > 0 AND denp > 0 THEN
      |  CAST((abs(num) * 1000 // dene) * abs(num) // denp AS BIGINT)
      | ELSE 0 END AS ccf2_permille
      |FROM num CROSS JOIN den ORDER BY lag""".stripMargin

  // q336: PARTIAL AUTOCORRELATION AT LAG 2 (AR-ORDER EVIDENCE) — the
  // model-selection companion q317 stops short of: a large r₂ alone
  // does not justify an AR(2) alarm model, because AR(1) propagation
  // alone makes r₂ ≈ r₁²; the Durbin–Levinson φ₂₂ = (r₂ − r₁²)/(1 − r₁²)
  // isolates the GENUINE second-order memory. Staging: r₁, r₂ are first
  // truncated to the SAME signed-milli values q317 reports (bounded, so
  // the rational identity runs on ≤10⁶-sized integers — den² on raw
  // deviation sums would be corpus⁴-sized, the q335 lesson), then one
  // cross-multiplied division with the sign carried separately.
  // Same (type, day) grid pass as q317.
  private def q336(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val wl = Window.partitionBy("event_type").orderBy("day")
    val dev = daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("sy", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - sy"))
      .withColumn("l1", lag("dd", 1).over(wl))
      .withColumn("l2", lag("dd", 2).over(wl))
    dev.groupBy("event_type")
      .agg(max("n").as("n_days"),
        sum(expr("dd * dd")).as("den"),
        sum(expr("CASE WHEN l1 IS NOT NULL THEN dd * l1 ELSE CAST(0 AS DECIMAL(38,0)) END")).as("a"),
        sum(expr("CASE WHEN l2 IS NOT NULL THEN dd * l2 ELSE CAST(0 AS DECIMAL(38,0)) END")).as("b"))
      .withColumn("r1_milli", expr(
        "CASE WHEN den > 0 THEN CAST(a * 1000 div den AS BIGINT) ELSE 0L END"))
      .withColumn("r2_milli", expr(
        "CASE WHEN den > 0 THEN CAST(b * 1000 div den AS BIGINT) ELSE 0L END"))
      .withColumn("pnum", expr("r2_milli * 1000 - r1_milli * r1_milli"))
      .withColumn("pden", expr("1000000 - r1_milli * r1_milli"))
      .withColumn("pacf2_sign", expr("CAST(sign(pnum) AS BIGINT)"))
      .withColumn("pacf2_milli", expr(
        "CASE WHEN pden > 0 THEN abs(pnum) * 1000 div pden ELSE 0L END"))
      .select(col("event_type"), col("n_days"), col("r1_milli"), col("r2_milli"),
        col("pacf2_sign"), col("pacf2_milli"))
      .orderBy("event_type")
  }

  private val q336Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, day,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) * y
      |     - sum(y) OVER (PARTITION BY event_type) AS dd,
      |   count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |lg AS (SELECT event_type, dd, n,
      |   lag(dd, 1) OVER w AS l1, lag(dd, 2) OVER w AS l2
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   sum(dd * dd) AS den,
      |   sum(CASE WHEN l1 IS NOT NULL THEN dd * l1 ELSE 0 END) AS a,
      |   sum(CASE WHEN l2 IS NOT NULL THEN dd * l2 ELSE 0 END) AS b
      |  FROM lg GROUP BY 1),
      |r AS (SELECT event_type, n_days,
      |   CASE WHEN den > 0 THEN CAST(a * 1000 // den AS BIGINT) ELSE 0 END AS r1_milli,
      |   CASE WHEN den > 0 THEN CAST(b * 1000 // den AS BIGINT) ELSE 0 END AS r2_milli
      |  FROM ag),
      |p AS (SELECT *, r2_milli * 1000 - r1_milli * r1_milli AS pnum,
      |   1000000 - r1_milli * r1_milli AS pden FROM r)
      |SELECT event_type, n_days, r1_milli, r2_milli,
      | CAST(sign(pnum) AS BIGINT) AS pacf2_sign,
      | CASE WHEN pden > 0 THEN CAST(abs(pnum) * 1000 // pden AS BIGINT)
      |  ELSE 0 END AS pacf2_milli
      |FROM p ORDER BY event_type""".stripMargin

  // q337: LJUNG–BOX PORTMANTEAU TEST — the JOINT significance readout
  // q317 stops short of: the ACF prints seven per-lag Bartlett verdicts,
  // but seven marginal tests at α=.05 false-alarm ~30% of the time on
  // pure noise (the q278 multiplicity lesson applied to lags); the
  // Ljung–Box Q = n(n+2)·Σ_{k≤m} r_k²/(n−k) tests "ANY linear memory in
  // the first m lags" as ONE χ²_m decision. Staging: r_k is first
  // truncated to the SAME milli magnitude q317 reports (|num|·1000 div
  // den — bounded ≤1000, so r² and every later product are tiny
  // integers; raw num² would be corpus⁴-sized, the q335/q336 DECIMAL
  // ceiling rule), per-lag term r_milli² div (n−k) truncated then
  // n(n+2)-scaled, div 1000 back to milli. The χ²_m .05 critical is a
  // declared 7-rung milli ladder (m = lags with a computable product,
  // i.e. min(7, n−1) — rung selected by CASE, identically in DuckDB).
  // 100 TB shape: identical to q317 — one (type, day) partial-agg
  // shuffle; everything after runs on the ≤types×31-cell grid.
  private def q337(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val wl = Window.partitionBy("event_type").orderBy("day")
    val dev = daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("sy", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - sy"))
    val lagged = (1 to 7).foldLeft(dev) { (df, k) =>
      df.withColumn(s"l$k", lag("dd", k).over(wl))
    }
    val perLag = lagged.select(col("event_type"), col("n"), col("dd"),
      expr("stack(7, " + (1 to 7).map(k => s"$k, l$k").mkString(", ") +
        ") AS (lag, dl)"))
      .filter(col("dl").isNotNull)
      .groupBy("event_type", "lag")
      .agg(max("n").as("n_days"), sum(expr("dd * dl")).as("num"))
    val den = dev.groupBy("event_type").agg(sum(expr("dd * dd")).as("den"))
    perLag.join(den, "event_type")
      .withColumn("r_milli", expr(
        "CASE WHEN den > 0 THEN CAST(abs(num) * 1000 div den AS BIGINT) ELSE 0L END"))
      .withColumn("term", expr("r_milli * r_milli div (n_days - lag)"))
      .groupBy("event_type")
      .agg(max("n_days").as("n_days"), count(lit(1)).as("m_lags"),
        sum("term").as("tsum"))
      .withColumn("q_lb_milli", expr("n_days * (n_days + 2) * tsum div 1000"))
      .withColumn("crit_milli", expr(
        """CASE m_lags WHEN 1 THEN 3841L WHEN 2 THEN 5991L WHEN 3 THEN 7815L
          | WHEN 4 THEN 9488L WHEN 5 THEN 11070L WHEN 6 THEN 12592L
          | ELSE 14067L END""".stripMargin))
      .withColumn("reject", expr("CAST(q_lb_milli >= crit_milli AS BIGINT)"))
      .select(col("event_type"), col("n_days"), col("m_lags"),
        col("q_lb_milli"), col("crit_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q337Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, day,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) * y
      |     - sum(y) OVER (PARTITION BY event_type) AS dd,
      |   count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |lg AS (SELECT event_type, n, dd,
      |   lag(dd, 1) OVER w AS l1, lag(dd, 2) OVER w AS l2,
      |   lag(dd, 3) OVER w AS l3, lag(dd, 4) OVER w AS l4,
      |   lag(dd, 5) OVER w AS l5, lag(dd, 6) OVER w AS l6,
      |   lag(dd, 7) OVER w AS l7
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |long AS (SELECT event_type, k.lag AS lag, n, dd * CASE k.lag
      |    WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3 WHEN 4 THEN l4
      |    WHEN 5 THEN l5 WHEN 6 THEN l6 WHEN 7 THEN l7 END AS p
      |  FROM lg CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) k),
      |num AS (SELECT event_type, lag, CAST(max(n) AS BIGINT) AS n_days,
      |   sum(p) AS num FROM long WHERE p IS NOT NULL GROUP BY 1, 2),
      |dn AS (SELECT event_type, sum(dd * dd) AS den FROM dev GROUP BY 1),
      |r AS (SELECT event_type, n_days, lag,
      |   CASE WHEN den > 0 THEN CAST(abs(num) * 1000 // den AS BIGINT)
      |    ELSE 0 END AS r_milli
      |  FROM num JOIN dn USING (event_type)),
      |ag AS (SELECT event_type, max(n_days) AS n_days,
      |   CAST(count(*) AS BIGINT) AS m_lags,
      |   CAST(sum(r_milli * r_milli // (n_days - lag)) AS BIGINT) AS tsum
      |  FROM r GROUP BY 1)
      |SELECT event_type, n_days, m_lags,
      | CAST(n_days * (n_days + 2) * tsum // 1000 AS BIGINT) AS q_lb_milli,
      | CAST(CASE m_lags WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
      |  WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
      |  ELSE 14067 END AS BIGINT) AS crit_milli,
      | CAST(n_days * (n_days + 2) * tsum // 1000 >=
      |  CASE m_lags WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
      |   WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
      |   ELSE 14067 END AS BIGINT) AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q338: WALD–WOLFOWITZ RUNS TEST — the randomness gate under every
  // i.i.d.-assuming alarm in the pack (q318's band and q333's VMR both
  // presume daily counts fluctuate independently; a series can pass both
  // while slowly OSCILLATING — too few runs — or saw-toothing from a
  // batch/interactive alternation — too many runs). Days are marked
  // above/not-above the per-type LOWER-MEDIAN daily count (the exact
  // order statistic via the q331 cumulative idiom — never a float
  // percentile), R = number of maximal same-mark runs; under H0,
  // E[R] = 1 + 2n₁n₂/n and Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)), so the
  // n-scaled gap dnum = n·R − n − 2n₁n₂ gives the EXACT rational
  // z² = dnum²(n−1)/(2n₁n₂(2n₁n₂−n)) — one cross-multiplied milli
  // division, gap sign carried separately (negative = clustered/
  // oscillating, positive = alternating). Everything after the one
  // (type, day) partial-agg shuffle runs on the bounded grid.
  private def q338(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val wr = Window.partitionBy("event_type").orderBy("y", "day")
    val wl = Window.partitionBy("event_type").orderBy("day")
    val marked = daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("rn", row_number().over(wr))
      .withColumn("med", min(when(expr("rn * 2 >= n"), col("y"))).over(wt))
      .withColumn("s", expr("CAST(y > med AS BIGINT)"))
      .withColumn("prev", lag("s", 1).over(wl))
      .withColumn("brk", expr(
        "CASE WHEN prev IS NULL OR s <> prev THEN 1L ELSE 0L END"))
    marked.groupBy("event_type")
      .agg(max("n").as("n_days"), sum("s").as("n_above"),
        sum("brk").as("runs"), max("med").as("median_y"))
      .withColumn("n2", expr("n_days - n_above"))
      .withColumn("dnum", expr("n_days * runs - n_days - 2 * n_above * n2"))
      .withColumn("vden", expr(
        "2 * n_above * n2 * (2 * n_above * n2 - n_days)"))
      .withColumn("gap_sign", expr("CAST(sign(dnum) AS BIGINT)"))
      .withColumn("z2_milli", expr(
        """CASE WHEN vden > 0 AND n_days > 1 THEN
          | dnum * dnum * (n_days - 1) * 1000 div vden ELSE 0L
          |END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_days"), col("median_y"),
        col("n_above"), col("runs"), col("gap_sign"), col("z2_milli"),
        col("reject"))
      .orderBy("event_type")
  }

  private val q338Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |mk AS (SELECT event_type, day, y,
      |   count(*) OVER (PARTITION BY event_type) AS n,
      |   row_number() OVER (PARTITION BY event_type ORDER BY y, day) AS rn
      |  FROM daily),
      |md AS (SELECT event_type,
      |   min(CASE WHEN rn * 2 >= n THEN y END) AS med FROM mk GROUP BY 1),
      |sg AS (SELECT mk.event_type, day, n,
      |   CAST(y > med AS BIGINT) AS s, med
      |  FROM mk JOIN md ON mk.event_type = md.event_type),
      |br AS (SELECT event_type, n, s, med,
      |   CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
      |     IS DISTINCT FROM s THEN 1 ELSE 0 END AS brk
      |  FROM sg),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   CAST(sum(s) AS BIGINT) AS n_above, CAST(sum(brk) AS BIGINT) AS runs,
      |   max(med) AS median_y
      |  FROM br GROUP BY 1),
      |st AS (SELECT *, n_days - n_above AS n2,
      |   n_days * runs - n_days - 2 * n_above * (n_days - n_above) AS dnum,
      |   2 * n_above * (n_days - n_above)
      |    * (2 * n_above * (n_days - n_above) - n_days) AS vden
      |  FROM ag)
      |SELECT event_type, n_days, median_y, n_above, runs,
      | CAST(sign(dnum) AS BIGINT) AS gap_sign,
      | CASE WHEN vden > 0 AND n_days > 1 THEN
      |  dnum * dnum * (n_days - 1) * 1000 // vden ELSE 0
      | END AS z2_milli,
      | CAST((CASE WHEN vden > 0 AND n_days > 1 THEN
      |  dnum * dnum * (n_days - 1) * 1000 // vden ELSE 0
      | END) >= 3841 AS BIGINT) AS reject
      |FROM st ORDER BY event_type""".stripMargin

  // q339: PAGE–HINKLEY DRIFT DETECTOR — the SEQUENTIAL mean-shift
  // monitor between q206 (CUSUM against a FIXED reference rate) and
  // q305 (offline localization): Page–Hinkley needs no reference — it
  // tracks the gap between the cumulative deviation-from-RUNNING-mean
  // and its running minimum, so it self-calibrates as the baseline
  // drifts and alarms only on a SUSTAINED upward break (Page 1954; the
  // standard streaming-drift detector in the MOA/river literature).
  // Series = the GLOBAL daily error rate in ppm (rate, not count — the
  // q318 lesson: a count threshold is corpus-scale-dependent, a rate
  // band is scale-free), δ = 1000 ppm slack, λ = 25000 ppm alarm —
  // both declared. Every step is truncating-integer and mirrored:
  // x_t = e·10⁶ div n, mean_t = Σx div t, term = x − mean − δ,
  // PH_t = cum(term) − runmin(cum(term)). One day-grain partial-agg
  // shuffle; windows on the ≤31-row global day grid (the q318/q335
  // stated single-series posture).
  /** The (day, n, e) global daily grid q339 closes over — maintained
    * incrementally by [[graft.streaming.PhStream]] via associative sum
    * merge (the ControlStream/EwmaStream twin family). */
  private[graft] def dailyErrorFrom(ev: DataFrame): DataFrame =
    ev.withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))

  /** q339's closing pass as a pure function of the maintained grid (the
    * streaming twin runs the IDENTICAL statistic). */
  private[graft] def phFromDaily(daily: DataFrame): DataFrame = {
    val wl = Window.orderBy("day")
    val wc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("rate_ppm", expr("e * 1000000 div n"))
      .withColumn("t", row_number().over(wl))
      .withColumn("xsum", sum("rate_ppm").over(wc))
      .withColumn("mean_ppm", expr("xsum div t"))
      .withColumn("term", expr("rate_ppm - mean_ppm - 1000"))
      .withColumn("ph_cum", sum("term").over(wc))
      .withColumn("ph_min", min("ph_cum").over(wc))
      .withColumn("ph_gap", expr("ph_cum - ph_min"))
      .withColumn("alarm", expr("CAST(ph_gap > 25000 AS BIGINT)"))
      .select(col("day"), col("n"), col("rate_ppm"), col("mean_ppm"),
        col("ph_gap"), col("alarm"))
      .orderBy("day")
  }

  private def q339(s: SparkSession, d: String): DataFrame =
    phFromDaily(dailyErrorFrom(events(s, d)))

  private val q339Sql =
    """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS n,
      |   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
      |  FROM events GROUP BY 1),
      |st AS (SELECT day, n, CAST(e * 1000000 // n AS BIGINT) AS rate_ppm,
      |   row_number() OVER (ORDER BY day) AS t,
      |   CAST(sum(e * 1000000 // n) OVER (ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS xsum
      |  FROM daily),
      |tm AS (SELECT day, n, rate_ppm, CAST(xsum // t AS BIGINT) AS mean_ppm,
      |   rate_ppm - xsum // t - 1000 AS term FROM st),
      |ph AS (SELECT day, n, rate_ppm, mean_ppm,
      |   sum(term) OVER (ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_cum
      |  FROM tm),
      |gp AS (SELECT day, n, rate_ppm, mean_ppm,
      |   CAST(ph_cum - min(ph_cum) OVER (ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS ph_gap
      |  FROM ph)
      |SELECT day, n, rate_ppm, mean_ppm, ph_gap,
      | CAST(ph_gap > 25000 AS BIGINT) AS alarm
      |FROM gp ORDER BY day""".stripMargin

  // q343: EWMA CONTROL CHART — the SMALL-SUSTAINED-SHIFT member of the
  // control family (q318's Shewhart p-chart catches big single-day
  // excursions but is provably weak on small persistent drifts; the
  // exponentially weighted chart z_t = λx_t + (1−λ)z_{t−1} accumulates
  // them, Roberts 1959 / Lucas–Saccucci 1990). λ = 1/4 (dyadic, so the
  // recursion is one exact truncating step: z = (x + 3z_prev) div 4, no
  // rational blowup), monitored series = each type's DAILY SHARE of
  // total events in ppm (share, not count — the q339 scale-free-band
  // lesson), center μ and plug-in s² from the series' own moments at
  // the q327 mean grain. The time-varying band factor
  // 1 − (1−λ)^{2t} = 1 − (9/16)^t is maintained in the SAME fold
  // (g_t = 9·g_{t−1} div 16 ppm), and the ±3σ test is fully
  // cross-multiplied: oob ⇔ (z−μ)²·7·10⁶ > 9·s²·(10⁶−g_t)
  // (λ/(2−λ) = 1/7). Engine twins of the RECURSION itself: Spark runs
  // it as an `aggregate` higher-order fold over the per-type sorted day
  // array (grid-resident, ≤31 elements — never row data), DuckDB as a
  // recursive CTE — step-identical truncation, hash-equal output.
  /** The (event_type, day, c) count grid q343 closes over — maintained
    * incrementally by [[graft.streaming.EwmaStream]] via associative sum
    * merge (the ControlStream/CusumStream twin family). */
  private[graft] def typeDailyFrom(ev: DataFrame): DataFrame =
    ev.withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))

  /** q343's closing pass as a pure function of the maintained grid, so
    * the streaming twin runs the IDENTICAL statistic (stream ≡ batch by
    * construction). */
  private[graft] def ewmaFromDaily(daily: DataFrame): DataFrame = {
    val grid = daily
      .withColumn("tc", sum("c").over(Window.partitionBy("day")))
      .withColumn("x", expr("c * 1000000 div tc"))
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(expr("x * x")).as("sxx"),
        sort_array(collect_list(struct(col("day"), col("x")))).as("arr"))
      .withColumn("mu", expr("sx div n"))
      .withColumn("s2", expr(
        "CASE WHEN n > 1 THEN (sxx - n * mu * mu) div (n - 1) ELSE 0L END"))
      .withColumn("steps", expr(
        """aggregate(arr,
          |  named_struct('z', mu, 'g', 1000000L,
          |    'out', CAST(array() AS
          |      array<struct<day: bigint, x: bigint, z: bigint, g: bigint>>)),
          |  (acc, e) -> named_struct(
          |    'z', (e.x + 3 * acc.z) div 4,
          |    'g', 9 * acc.g div 16,
          |    'out', concat(acc.out, array(named_struct(
          |      'day', e.day, 'x', e.x,
          |      'z', (e.x + 3 * acc.z) div 4,
          |      'g', 9 * acc.g div 16)))),
          |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"), col("mu"), col("s2"),
        explode(col("steps")).as("st"))
      .select(col("event_type"), col("st.day").as("day"),
        col("st.x").as("x_ppm"), col("st.z").as("z_ppm"),
        col("st.g").as("g_ppm"), col("mu").as("mu_ppm"), col("s2"))
      .withColumn("oob", expr(
        """CAST(CAST(z_ppm - mu_ppm AS DECIMAL(38,0)) * (z_ppm - mu_ppm)
          | * 7000000 > CAST(9 AS DECIMAL(38,0)) * s2 * (1000000 - g_ppm)
          | AS BIGINT)""".stripMargin))
      .select(col("event_type"), col("day"), col("x_ppm"), col("z_ppm"),
        col("g_ppm"), col("oob"))
      .orderBy("event_type", "day")
  }

  private def q343(s: SparkSession, d: String): DataFrame =
    ewmaFromDaily(typeDailyFrom(events(s, d)))

  private val q343Sql =
    """WITH RECURSIVE daily AS (SELECT event_type,
      |   epoch_us(ts) // 86400000000 AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT event_type, day,
      |   CAST(c * 1000000 // sum(c) OVER (PARTITION BY day) AS BIGINT) AS x,
      |   row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |  FROM daily),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM grid GROUP BY 1),
      |ms AS (SELECT event_type, n, sx // n AS mu,
      |   CASE WHEN n > 1
      |    THEN (sxx - n * (sx // n) * (sx // n)) // (n - 1) ELSE 0
      |   END AS s2
      |  FROM st),
      |ew AS (
      | SELECT g.event_type, g.day, g.t, g.x, m.mu, m.s2,
      |   CAST((g.x + 3 * m.mu) // 4 AS BIGINT) AS z,
      |   CAST(9 * 1000000 // 16 AS BIGINT) AS gg
      |  FROM grid g JOIN ms m USING (event_type) WHERE g.t = 1
      | UNION ALL
      | SELECT g.event_type, g.day, g.t, g.x, e.mu, e.s2,
      |   CAST((g.x + 3 * e.z) // 4 AS BIGINT), CAST(9 * e.gg // 16 AS BIGINT)
      |  FROM ew e JOIN grid g
      |   ON g.event_type = e.event_type AND g.t = e.t + 1)
      |SELECT event_type, day, x AS x_ppm, z AS z_ppm, gg AS g_ppm,
      | CAST(CAST(z - mu AS HUGEINT) * (z - mu) * 7000000
      |   > CAST(9 AS HUGEINT) * s2 * (1000000 - gg) AS BIGINT) AS oob
      |FROM ew ORDER BY event_type, day""".stripMargin

  // q347: GRUBBS MAXIMUM-OUTLIER TEST — the SINGLE-POINT decision the
  // band family leaves open (q318/q343 flag every excursion relative to
  // a band; q113 z-scores a rolling window): given the WHOLE series, is
  // its most extreme day a statistical outlier at α=.05 — the max
  // statistic has its own null distribution (Grubbs 1950), so "worst
  // day at 3σ" under-rejects on short series and over-rejects on long
  // ones. G² = max((y−ȳ)²)/s² is exact via n-scaled deviations:
  // G²·1000 = max(dd²)·(n−1)·1000 div Σdd² (the n² cancels), argmax day
  // under the (dd² DESC, day) total order. Critical values are the
  // published α=.05 two-sided table declared as a 5-rung milli ladder
  // on the n-grid 10/15/20/25/30+ (G²: 5244/6497/7339/7964/8456) —
  // between rungs the next-LOWER n's critical applies (conservative
  // toward rejection is avoided; declared, mirrored). Same one
  // (type, day) shuffle as the rest of the pack.
  private def q347(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val dev = daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("sy", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - sy"))
      .withColumn("dd2", expr("dd * dd"))
      .withColumn("mx", max("dd2").over(wt))
    dev.groupBy("event_type")
      .agg(max("n").as("n_days"), sum("dd2").as("sdd2"), max("dd2").as("mx2"),
        min(when(col("dd2") === col("mx"), col("day"))).as("peak_day"),
        max(when(col("dd2") === col("mx"),
          expr("CAST(sign(dd) AS BIGINT)"))).as("peak_sign"))
      .withColumn("g2_milli", expr(
        """CASE WHEN sdd2 > 0 AND n_days > 1 THEN
          | CAST(mx2 * (n_days - 1) * 1000 div sdd2 AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("crit_milli", expr(
        """CASE WHEN n_days >= 30 THEN 8456L WHEN n_days >= 25 THEN 7964L
          | WHEN n_days >= 20 THEN 7339L WHEN n_days >= 15 THEN 6497L
          | ELSE 5244L END""".stripMargin))
      .withColumn("outlier", expr("CAST(g2_milli >= crit_milli AS BIGINT)"))
      .select(col("event_type"), col("n_days"), col("peak_day"),
        col("peak_sign"), col("g2_milli"), col("crit_milli"), col("outlier"))
      .orderBy("event_type")
  }

  private val q347Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |dev AS (SELECT event_type, day,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) * y
      |     - sum(y) OVER (PARTITION BY event_type) AS dd,
      |   count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |d2 AS (SELECT event_type, day, dd, dd * dd AS dd2, n,
      |   max(dd * dd) OVER (PARTITION BY event_type) AS mx
      |  FROM dev),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   sum(dd2) AS sdd2, max(dd2) AS mx2,
      |   min(CASE WHEN dd2 = mx THEN day END) AS peak_day,
      |   CAST(max(CASE WHEN dd2 = mx THEN sign(dd) END) AS BIGINT)
      |     AS peak_sign
      |  FROM d2 GROUP BY 1),
      |g AS (SELECT *, CASE WHEN sdd2 > 0 AND n_days > 1 THEN
      |   CAST(mx2 * (n_days - 1) * 1000 // sdd2 AS BIGINT) ELSE 0
      |  END AS g2_milli,
      |  CASE WHEN n_days >= 30 THEN 8456 WHEN n_days >= 25 THEN 7964
      |   WHEN n_days >= 20 THEN 7339 WHEN n_days >= 15 THEN 6497
      |   ELSE 5244 END AS crit_milli
      |  FROM ag)
      |SELECT event_type, n_days, peak_day, peak_sign, g2_milli, crit_milli,
      | CAST(g2_milli >= crit_milli AS BIGINT) AS outlier
      |FROM g ORDER BY event_type""".stripMargin

  // q348: HOLT LINEAR-TREND SMOOTHING BACKTEST — the TRENDED-series
  // forecaster between q343's level-only EWMA and q232's seasonal
  // naive: double exponential smoothing (Holt 1957) carries a level AND
  // a trend state, so a steadily growing share is tracked instead of
  // lagged. Dyadic α = β = 1/4 keeps both updates one exact truncating
  // step (l = (x + 3(l'+b')) div 4; b = ((l−l') + 3b') div 4 — signed
  // div, the verified trunc-toward-zero convention). Deliverable is the
  // BACKTEST: one-step-ahead |x − (l'+b')| MAE from day 3 on, priced
  // against the naive x_{t−1} forecast on the SAME eval days —
  // holt_wins is the go/no-go for fitting anything fancier. Series =
  // the q343 daily type-share ppm. The fold carries only scalars
  // (t, l, b, prevx, error sums), so the Spark side is one `aggregate`
  // over the sorted grid array and the DuckDB twin one recursive CTE —
  // step-identical truncation, one row per type out.
  private def q348(s: SparkSession, d: String): DataFrame =
    holtFromDaily(typeDailyFrom(events(s, d)))

  /** q348's closing pass as a pure function of the maintained
    * (event_type, day, c) grid — the ewmaFromDaily convention, so the
    * streaming twin (graft.streaming.HoltStream) runs the IDENTICAL
    * statistic and stream ≡ batch holds by construction. */
  private[graft] def holtFromDaily(daily: DataFrame): DataFrame = {
    val grid = daily
      .withColumn("tc", sum("c").over(Window.partitionBy("day")))
      .withColumn("x", expr("c * 1000000 div tc"))
    grid.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("arr"))
      .withColumn("fin", expr(
        """aggregate(arr,
          |  named_struct('t', 0L, 'l', 0L, 'b', 0L, 'px', 0L,
          |    'sh', 0L, 'sn', 0L, 'ne', 0L),
          |  (acc, e) -> CASE
          |   WHEN acc.t = 0L THEN named_struct('t', 1L, 'l', e.x, 'b', 0L,
          |     'px', e.x, 'sh', 0L, 'sn', 0L, 'ne', 0L)
          |   WHEN acc.t = 1L THEN named_struct('t', 2L, 'l', e.x,
          |     'b', e.x - acc.l, 'px', e.x, 'sh', 0L, 'sn', 0L, 'ne', 0L)
          |   ELSE named_struct('t', acc.t + 1L,
          |     'l', (e.x + 3 * (acc.l + acc.b)) div 4,
          |     'b', (((e.x + 3 * (acc.l + acc.b)) div 4 - acc.l)
          |           + 3 * acc.b) div 4,
          |     'px', e.x,
          |     'sh', acc.sh + abs(e.x - (acc.l + acc.b)),
          |     'sn', acc.sn + abs(e.x - acc.px),
          |     'ne', acc.ne + 1L)
          |  END,
          |  acc -> acc)""".stripMargin))
      .select(col("event_type"), col("fin.t").as("n_days"),
        col("fin.ne").as("n_eval"),
        expr("CASE WHEN fin.ne > 0 THEN fin.sh div fin.ne ELSE 0L END")
          .as("holt_mae_ppm"),
        expr("CASE WHEN fin.ne > 0 THEN fin.sn div fin.ne ELSE 0L END")
          .as("naive_mae_ppm"))
      .withColumn("holt_wins", expr(
        "CAST(holt_mae_ppm < naive_mae_ppm AS BIGINT)"))
      .orderBy("event_type")
  }

  private val q348Sql =
    """WITH RECURSIVE daily AS (SELECT event_type,
      |   epoch_us(ts) // 86400000000 AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT event_type, day,
      |   CAST(c * 1000000 // sum(c) OVER (PARTITION BY day) AS BIGINT) AS x,
      |   row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |  FROM daily),
      |hw AS (
      | SELECT event_type, t, x AS l, CAST(0 AS BIGINT) AS b, x AS px,
      |   CAST(0 AS BIGINT) AS sh, CAST(0 AS BIGINT) AS sn,
      |   CAST(0 AS BIGINT) AS ne
      |  FROM grid WHERE t = 1
      | UNION ALL
      | SELECT g.event_type, g.t,
      |   CASE WHEN g.t = 2 THEN g.x
      |    ELSE (g.x + 3 * (h.l + h.b)) // 4 END,
      |   CASE WHEN g.t = 2 THEN g.x - h.l
      |    ELSE (((g.x + 3 * (h.l + h.b)) // 4 - h.l) + 3 * h.b) // 4 END,
      |   g.x,
      |   CASE WHEN g.t = 2 THEN h.sh
      |    ELSE h.sh + abs(g.x - (h.l + h.b)) END,
      |   CASE WHEN g.t = 2 THEN h.sn ELSE h.sn + abs(g.x - h.px) END,
      |   CASE WHEN g.t = 2 THEN h.ne ELSE h.ne + 1 END
      |  FROM hw h JOIN grid g
      |   ON g.event_type = h.event_type AND g.t = h.t + 1),
      |fin AS (SELECT event_type, max(t) AS tmax FROM hw GROUP BY 1),
      |lastrow AS (SELECT h.* FROM hw h JOIN fin f
      |  ON h.event_type = f.event_type AND h.t = f.tmax)
      |SELECT event_type, CAST(t AS BIGINT) AS n_days,
      | CAST(ne AS BIGINT) AS n_eval,
      | CASE WHEN ne > 0 THEN CAST(sh // ne AS BIGINT) ELSE 0 END
      |   AS holt_mae_ppm,
      | CASE WHEN ne > 0 THEN CAST(sn // ne AS BIGINT) ELSE 0 END
      |   AS naive_mae_ppm,
      | CAST((CASE WHEN ne > 0 THEN sh // ne ELSE 0 END)
      |   < (CASE WHEN ne > 0 THEN sn // ne ELSE 0 END) AS BIGINT)
      |  AS holt_wins
      |FROM lastrow ORDER BY event_type""".stripMargin

  // q350: KENDALL τ-b BETWEEN TWO OPERATIONAL SERIES — the RANK member
  // of the bivariate family (q335 CCF is Pearson-linear; q302 Spearman
  // ranks ONE variable against another at doc grain): concordant-vs-
  // discordant day pairs are outlier-immune and detect any MONOTONE
  // error↔purchase coupling, with the tie-corrected τ-b denominator
  // √((n₀−t_e)(n₀−t_p)). Exact: the pair grain is the DAY-PAIR grid
  // (≤ C(31,2) = 465 rows — a constant of the calendar, never the
  // corpus), C−D = Σ sign(Δe)·sign(Δp); τ² via the q302 two-step
  // staged square with the sign separate, C–S-bounded ≤ 1000.
  // One day-grain shuffle; the pair self-join is grid-local.
  private def q350(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("day")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val pairs = daily.alias("a").join(daily.alias("b"),
        col("a.day") < col("b.day"))
      .select(expr("CAST(sign(b.e - a.e) AS BIGINT)").as("se"),
        expr("CAST(sign(b.p - a.p) AS BIGINT)").as("sp"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      sum(expr("se * sp")).as("cd"),
      sum(expr("CAST(se = 0 AS BIGINT)")).as("t_e"),
      sum(expr("CAST(sp = 0 AS BIGINT)")).as("t_p"))
      .withColumn("den_e", expr("n_pairs - t_e"))
      .withColumn("den_p", expr("n_pairs - t_p"))
      .withColumn("tau_sign", expr("CAST(sign(cd) AS BIGINT)"))
      .withColumn("tau2_milli", expr(
        """CASE WHEN den_e > 0 AND den_p > 0 THEN
          | CAST(CAST(abs(cd) * 1000 div den_e AS DECIMAL(38,0))
          |   * abs(cd) div den_p AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("n_pairs"), col("cd"), col("t_e"), col("t_p"),
        col("tau_sign"), col("tau2_milli"))
  }

  private val q350Sql =
    """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e,
      |   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      |  FROM events GROUP BY 1),
      |pr AS (SELECT CAST(sign(b.e - a.e) AS BIGINT) AS se,
      |   CAST(sign(b.p - a.p) AS BIGINT) AS sp
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |   CAST(sum(se * sp) AS BIGINT) AS cd,
      |   CAST(sum(CASE WHEN se = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_e,
      |   CAST(sum(CASE WHEN sp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_p
      |  FROM pr)
      |SELECT n_pairs, cd, t_e, t_p,
      | CAST(sign(cd) AS BIGINT) AS tau_sign,
      | CASE WHEN n_pairs - t_e > 0 AND n_pairs - t_p > 0 THEN
      |  CAST((abs(cd) * 1000 // (n_pairs - t_e)) * abs(cd)
      |    // (n_pairs - t_p) AS BIGINT)
      | ELSE 0 END AS tau2_milli
      |FROM ag""".stripMargin

  // q371: DURBIN–WATSON FIRST-ORDER AUTOCORRELATION — the classical
  // residual diagnostic the series pack quotes everywhere but never
  // computes (q317's ACF describes the raw series; q337's Ljung–Box
  // tests MANY lags jointly; DW is the single-number lag-1 verdict every
  // regression-residual audit reports first, Durbin & Watson 1950):
  // DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t² on the mean-residuals of the
  // daily count series. Integer-exact by the q333 scaling trick: with
  // e_t = y_t − S/n, both sums scale by n² — n(e_t − e_{t−1}) =
  // n(y_t − y_{t−1}) and n·e_t = n·y_t − S — so
  // dw_milli = 1000·n²·Σ(Δy)² div Σ(n·y − S)², no mean materialized.
  // DW ≈ 2 ⟺ no lag-1 autocorrelation; the declared read-out bands
  // (< 1.5 positive, > 2.5 negative) stand in for the dL/dU tables,
  // which depend on regressor counts this mean-only model doesn't have
  // (stated, not hidden). DECLARED CONVENTION (r16 ADVICE): the lag-1
  // window runs over the OBSERVED (type, day) grid — a day with zero
  // events is absent, so rows across a gap are treated as consecutive
  // in the Δ numerator (standard "observation order" DW, and exactly
  // what the mirrored oracle computes). On the dense test series every
  // day is present and the two readings coincide; on gappy organic
  // data this measures successive-observation autocorrelation, not
  // calendar-lag-1 — gate d2 on day − lag(day) = 1 if the calendar
  // reading is wanted. 100 TB: the same one (type, day) partial-agg
  // shuffle as q317/q332/q333; the lag window and both sums live on the
  // bounded day grid.
  private def q371(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wt = Window.partitionBy("event_type")
    val wlag = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s", sum("y").over(wt))
      .withColumn("ylag", lag("y", 1).over(wlag))
      .withColumn("e2", expr(
        "(CAST(n AS DECIMAL(38,0)) * y - s) * (CAST(n AS DECIMAL(38,0)) * y - s)"))
      .withColumn("d2", expr(
        """CASE WHEN ylag IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE
          | CAST(n AS DECIMAL(38,0)) * n * (y - ylag) * (y - ylag) END"""
          .stripMargin))
      .groupBy("event_type")
      .agg(max("n").as("n_days"), sum("d2").as("num"), sum("e2").as("den"))
      .withColumn("dw_milli", expr(
        "CASE WHEN den > 0 THEN CAST(num * 1000 div den AS BIGINT) ELSE 2000L END"))
      .withColumn("autocorr", expr(
        """CASE WHEN dw_milli < 1500 THEN 'positive'
          | WHEN dw_milli > 2500 THEN 'negative' ELSE 'none' END""".stripMargin))
      .select(col("event_type"), col("n_days"), col("dw_milli"), col("autocorr"),
        expr("CAST(dw_milli < 1500 OR dw_milli > 2500 AS BIGINT)").as("flagged"))
      .orderBy("event_type")
  }

  private val q371Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |st AS (SELECT *, count(*) OVER (PARTITION BY event_type) AS n,
      |   sum(y) OVER (PARTITION BY event_type) AS s,
      |   lag(y) OVER (PARTITION BY event_type ORDER BY day) AS ylag
      |  FROM daily),
      |terms AS (SELECT event_type, n,
      |   (CAST(n AS HUGEINT) * y - s) * (CAST(n AS HUGEINT) * y - s) AS e2,
      |   CASE WHEN ylag IS NULL THEN CAST(0 AS HUGEINT) ELSE
      |    CAST(n AS HUGEINT) * n * (y - ylag) * (y - ylag) END AS d2
      |  FROM st),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
      |   sum(d2) AS num, sum(e2) AS den FROM terms GROUP BY 1),
      |dw AS (SELECT event_type, n_days,
      |   CASE WHEN den > 0 THEN CAST(num * 1000 // den AS BIGINT)
      |    ELSE 2000 END AS dw_milli
      |  FROM ag)
      |SELECT event_type, n_days, dw_milli,
      | CASE WHEN dw_milli < 1500 THEN 'positive'
      |  WHEN dw_milli > 2500 THEN 'negative' ELSE 'none' END AS autocorr,
      | CAST(dw_milli < 1500 OR dw_milli > 2500 AS BIGINT) AS flagged
      |FROM dw ORDER BY event_type""".stripMargin

  // q373: CLASSICAL ADDITIVE SEASONAL DECOMPOSITION (dow indices from a
  // centered-MA detrend) — the DECOMPOSITION the seasonal family reads
  // off but never produces: q125 detects dow-mix drift, q332 scores the
  // raw-series dow share, q232 backtests seasonal-naive — none separates
  // TREND from SEASON, so a series that grows 5%/week reads as "weekly
  // seasonality" in all of them. The classical method (Macaulay 1931,
  // the decompose() default in every stats package): trend = centered
  // 7-term moving average, seasonal index s_dow = mean of the detrended
  // values per dow, strength = the between-dow variance share OF THE
  // DETRENDED series (q332's η² after trend removal — the honest
  // seasonality number on trending data). Integer staging: the MA is
  // kept ×7 (t7 = Σ_{t−3..t+3} y, interior days only — exactly 7 terms),
  // detrended d_t = 7·y_t − t7 stays integer, seas_milli = Σd·1000 div
  // (7·cnt) de-scales once, and the strength reuses the q332
  // milli-deviation staging on d_t. 100 TB: one (type, day) partial-agg
  // shuffle; the MA window, dow collapse, and variance shares all live
  // on the bounded day grid.
  private def q373(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("y"))
    val wma = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val detr = daily
      .withColumn("t7", sum("y").over(wma))
      .withColumn("w7", count(lit(1)).over(wma))
      .filter(col("w7") === 7)
      .withColumn("dt", expr("7 * y - t7"))
      .withColumn("dow", expr("day % 7"))
    graft.Caches.persist(detr)
    val glob = detr.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("dt").as("sd"))
      .withColumn("m_milli", expr(
        "CAST(CAST(sd AS DECIMAL(38,0)) * 1000 div n AS BIGINT)"))
    val dow = detr.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_obs"), sum("dt").as("sg"))
      .withColumn("mg_milli", expr(
        "CAST(CAST(sg AS DECIMAL(38,0)) * 1000 div n_obs AS BIGINT)"))
      .withColumn("seas_milli", expr(
        "CAST(CAST(sg AS DECIMAL(38,0)) * 1000 div (7 * n_obs) AS BIGINT)"))
    val ssb = dow.join(broadcast(glob), "event_type")
      .groupBy("event_type")
      .agg(sum(expr(
        "CAST(n_obs AS DECIMAL(38,0)) * (mg_milli - m_milli) * (mg_milli - m_milli)"))
        .as("ssb"))
    val sst = detr.join(broadcast(glob), "event_type")
      .groupBy("event_type")
      .agg(sum(expr(
        "CAST(dt * 1000 - m_milli AS DECIMAL(38,0)) * (dt * 1000 - m_milli)"))
        .as("sst"))
    val strength = ssb.join(sst, "event_type")
      .withColumn("strength_milli", expr(
        "CASE WHEN sst > 0 THEN CAST(ssb * 1000 div sst AS BIGINT) ELSE 0L END"))
      .select("event_type", "strength_milli")
    dow.join(broadcast(strength), "event_type")
      .select(col("event_type"), col("dow"), col("n_obs"), col("seas_milli"),
        col("strength_milli"))
      .orderBy("event_type", "dow")
  }

  private val q373Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS y FROM events GROUP BY 1, 2),
      |ma AS (SELECT *,
      |   sum(y) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
      |   count(*) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w7
      |  FROM daily),
      |detr AS (SELECT event_type, day % 7 AS dow, 7 * y - t7 AS dt
      |  FROM ma WHERE w7 = 7),
      |gl AS (SELECT event_type, count(*) AS n,
      |   CAST(CAST(sum(dt) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS m_milli
      |  FROM detr GROUP BY 1),
      |dw AS (SELECT event_type, dow, count(*) AS n_obs,
      |   CAST(CAST(sum(dt) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS mg_milli,
      |   CAST(CAST(sum(dt) AS HUGEINT) * 1000 // (7 * count(*)) AS BIGINT) AS seas_milli
      |  FROM detr GROUP BY 1, 2),
      |sb AS (SELECT event_type,
      |   sum(CAST(n_obs AS HUGEINT) * (mg_milli - m_milli) * (mg_milli - m_milli)) AS ssb
      |  FROM dw JOIN gl USING (event_type) GROUP BY 1),
      |st AS (SELECT event_type,
      |   sum(CAST(dt * 1000 - m_milli AS HUGEINT) * (dt * 1000 - m_milli)) AS sst
      |  FROM detr JOIN gl USING (event_type) GROUP BY 1),
      |sg AS (SELECT event_type,
      |   CASE WHEN sst > 0 THEN CAST(ssb * 1000 // sst AS BIGINT)
      |    ELSE 0 END AS strength_milli
      |  FROM sb JOIN st USING (event_type))
      |SELECT event_type, CAST(dow AS BIGINT) AS dow,
      | CAST(n_obs AS BIGINT) AS n_obs, seas_milli, strength_milli
      |FROM dw JOIN sg USING (event_type)
      |ORDER BY event_type, dow""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q371_durbin_watson" -> (q371 _),
    "q373_seasonal_decomposition" -> (q373 _),
    "q317_acf_diagnostic" -> (q317 _),
    "q318_pchart_control" -> (q318 _),
    "q319_cohort_ltv" -> (q319 _),
    "q332_seasonality_strength" -> (q332 _),
    "q333_overdispersion" -> (q333 _),
    "q335_ccf_leadlag" -> (q335 _),
    "q336_pacf2" -> (q336 _),
    "q337_ljung_box" -> (q337 _),
    "q338_runs_test" -> (q338 _),
    "q339_page_hinkley" -> (q339 _),
    "q343_ewma_chart" -> (q343 _),
    "q347_grubbs_outlier" -> (q347 _),
    "q348_holt_backtest" -> (q348 _),
    "q350_kendall_tau" -> (q350 _))

  override val oracles: Map[String, String] = Map(
    "q371_durbin_watson" -> q371Sql,
    "q373_seasonal_decomposition" -> q373Sql,
    "q317_acf_diagnostic" -> q317Sql,
    "q318_pchart_control" -> q318Sql,
    "q319_cohort_ltv" -> q319Sql,
    "q332_seasonality_strength" -> q332Sql,
    "q333_overdispersion" -> q333Sql,
    "q335_ccf_leadlag" -> q335Sql,
    "q336_pacf2" -> q336Sql,
    "q337_ljung_box" -> q337Sql,
    "q338_runs_test" -> q338Sql,
    "q339_page_hinkley" -> q339Sql,
    "q343_ewma_chart" -> q343Sql,
    "q347_grubbs_outlier" -> q347Sql,
    "q348_holt_backtest" -> q348Sql,
    "q350_kendall_tau" -> q350Sql)
}
