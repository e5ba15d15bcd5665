package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXPERIMENTATION statistics operators: the readouts an A/B platform runs
  * over the event stream beyond the repo's existing per-test gates (q191
  * two-proportion, q231 cross-multiplied z, q217 KS, q267 SPRT, q278
  * BH-FDR). This pack adds the VARIANCE side of the discipline — CUPED
  * covariate adjustment (q279), the rank-based Mann–Whitney U alternative
  * when means are the wrong functional (q280), delta-method vs block-
  * jackknife agreement for RATIO metrics (q281) — and the stratification
  * audit (q282 Simpson reversal) that tells an experimenter whether the
  * aggregate read even has the right SIGN.
  *
  * Shared conventions (see `/root/reference/docs/user-guide.md:106` for
  * the reference's own priority-arm framing; all math here is original):
  * the randomization unit is `user_id`, assigned to arms by the repo's
  * engine-portable md5 bucket (`Tables.hashBucket(user_id, 2)`), and every
  * statistic is exact fixed-point integer — staged `div` chains with both
  * engines truncating toward zero identically — so the oracle compare is
  * a hash match, not a float tolerance.
  */
object ExperimentOps extends QueryPack {
  import Tables._

  /** DuckDB twin of `Tables.hashBucket(user_id, m)`. */
  private def duckArm(m: Int) =
    s"('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % $m"

  // q279: CUPED VARIANCE REDUCTION — the industry-standard pre-experiment
  // covariate adjustment (Deng et al., WSDM'13 "Improving the Sensitivity
  // of Online Controlled Experiments", public): for each user the metric
  // Y (value in the post window, hour-of-day >= 12) is adjusted by the
  // SAME user's pre-window activity X (hod < 12) via
  // theta = Cov(X,Y)/Var(X); Var(Y - theta X) = Var(Y)(1 - rho^2), so the
  // experiment needs (1 - rho^2)x the sample for the same power — at
  // 100 TB of events that multiplier is bought with ONE extra user-grain
  // aggregation. Everything exact: Sxx/Sxy/Syy as n*S2 - S*S in
  // DECIMAL(38), theta in micro via staged signed div (both engines
  // truncate toward zero — verified), rho^2 in permille via the
  // theta-staged product theta_milli*Sxy (same sign as Sxy, so the
  // product is nonnegative by construction and magnitude-safe at sf1
  // where a direct Sxy^2*1000 would overflow DECIMAL(38)).
  // Shape: one shuffle to (event_type, user) grain with conditional
  // sums fused map-side, then two tiny collapses (per-type moments,
  // per-arm means) and a broadcast join of the 5-row moments table.
  private def q279(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("hod") < 12, col("v")).otherwise(0L)).as("x"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
    val mom = ug.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("cxx", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("cxy", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("cyy", expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("theta_micro", expr(
        "CASE WHEN cxx > 0 THEN CAST(cxy * 1000000 div cxx AS BIGINT) ELSE 0L END"))
      .withColumn("theta_milli", expr(
        "CASE WHEN cxx > 0 THEN CAST(cxy * 1000 div cxx AS BIGINT) ELSE 0L END"))
      .withColumn("rho2_permille", expr(
        "CASE WHEN cxx > 0 AND cyy > 0 THEN " +
          "CAST(CAST(theta_milli AS DECIMAL(38,0)) * cxy div cyy AS BIGINT) ELSE 0L END"))
      .withColumn("xbar_pool_milli", expr("CAST(sx AS DECIMAL(38,0)) * 1000 div n"))
    val arms = ug.groupBy("event_type", "arm")
      .agg(count(lit(1)).as("n_users"), sum("x").as("sxa"), sum("y").as("sya"))
    arms.join(broadcast(mom.select("event_type", "n", "theta_micro",
        "rho2_permille", "xbar_pool_milli")), Seq("event_type"))
      .withColumn("mean_y_micro",
        expr("CAST(CAST(sya AS DECIMAL(38,0)) * 1000000 div n_users AS BIGINT)"))
      .withColumn("dx_milli",
        expr("CAST(sxa AS DECIMAL(38,0)) * 1000 div n_users - xbar_pool_milli"))
      .withColumn("mean_yadj_micro", expr(
        "CAST(mean_y_micro - CAST(theta_micro AS DECIMAL(38,0)) * dx_milli div 1000 AS BIGINT)"))
      .select(col("event_type"), col("arm"), col("n_users"),
        col("theta_micro"), col("rho2_permille"),
        col("mean_y_micro"), col("mean_yadj_micro"))
      .orderBy("event_type", "arm")
  }

  private val q279Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |       THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |       THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |mom AS (SELECT event_type, count(*) AS n,
       |   CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |   sum(CAST(x AS HUGEINT) * x) AS sxx,
       |   sum(CAST(x AS HUGEINT) * y) AS sxy,
       |   sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM ug GROUP BY 1),
       |cov AS (SELECT *, n * sxx - sx * sx AS cxx, n * sxy - sx * sy AS cxy,
       |   n * syy - sy * sy AS cyy FROM mom),
       |th AS (SELECT *,
       |   CASE WHEN cxx > 0 THEN CAST(cxy * 1000000 // cxx AS BIGINT) ELSE 0 END AS theta_micro,
       |   CASE WHEN cxx > 0 THEN CAST(cxy * 1000 // cxx AS BIGINT) ELSE 0 END AS theta_milli,
       |   sx * 1000 // n AS xbar_pool_milli
       |  FROM cov),
       |th2 AS (SELECT *, CASE WHEN cxx > 0 AND cyy > 0
       |   THEN CAST(CAST(theta_milli AS HUGEINT) * cxy // cyy AS BIGINT)
       |   ELSE 0 END AS rho2_permille FROM th),
       |arms AS (SELECT event_type, arm, count(*) AS n_users,
       |   CAST(sum(x) AS HUGEINT) AS sxa, CAST(sum(y) AS HUGEINT) AS sya
       |  FROM ug GROUP BY 1, 2)
       |SELECT a.event_type, a.arm, a.n_users, t.theta_micro, t.rho2_permille,
       | CAST(a.sya * 1000000 // a.n_users AS BIGINT) AS mean_y_micro,
       | CAST(a.sya * 1000000 // a.n_users
       |   - CAST(t.theta_micro AS HUGEINT)
       |     * (a.sxa * 1000 // a.n_users - t.xbar_pool_milli) // 1000 AS BIGINT)
       |   AS mean_yadj_micro
       |FROM arms a JOIN th2 t ON a.event_type = t.event_type
       |ORDER BY a.event_type, a.arm""".stripMargin

  // q280: MANN–WHITNEY U GATE — the rank-based two-sample test the mean
  // gates (q191/q231) cannot replace when the metric is heavy-tailed
  // (revenue-like `value` is): U compares ENTIRE distributions and is
  // outlier-immune. The 100 TB shape is the whole point: ranks need a
  // global sort, but the U statistic only needs the rank SUM, and that
  // collapses to VALUE grain — group by (event_type, v_centi), count per
  // arm, one cumulative window over the bounded distinct-value domain
  // (doubled midranks 2*cum + cnt + 1 keep tie-averaged ranks integer),
  // then a per-type collapse. Data never ranks row-by-row; the window
  // runs over <= |value domain| rows per type. Tie correction is exact:
  // Var(U) = nA*nB*(n^3 - n - sum(t^3 - t)) / (12n(n-1)), folded into
  // z2_milli by cross-multiplication (DECIMAL(38) holds it through sf1).
  private def q280(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    vg.withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("mr2", expr("2 * cum + cnt + 1"))
      .groupBy("event_type")
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * mr2")).as("r2a"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("ties"))
      .withColumn("u2_a", expr("CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("z2_milli", expr(
        """CASE WHEN n_a > 0 AND n_b > 0
          |  AND CAST(n AS DECIMAL(38,0)) * n * n - n - ties > 0 THEN
          | CAST((CAST(u2_a AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
          |   * (CAST(u2_a AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
          |   * 3000 * n * (n - 1)
          |   div (CAST(n_a AS DECIMAL(38,0)) * n_b
          |        * (CAST(n AS DECIMAL(38,0)) * n * n - n - ties)) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        expr("CAST(ties AS BIGINT)").as("ties"), col("z2_milli"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q280Sql =
    s"""WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM events GROUP BY 1, 2),
       |cm AS (SELECT *, ca + cb AS cnt,
       |   COALESCE(sum(ca + cb) OVER (PARTITION BY event_type ORDER BY v
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM vg),
       |ag AS (SELECT event_type,
       |   CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
       |   sum(CAST(ca AS HUGEINT) * (2 * cum + cnt + 1)) AS r2a,
       |   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
       |  FROM cm GROUP BY 1),
       |st AS (SELECT *, CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
       |   n_a + n_b AS n FROM ag)
       |SELECT event_type, n_a, n_b, u2_a, CAST(ties AS BIGINT) AS ties,
       | CASE WHEN n_a > 0 AND n_b > 0
       |   AND CAST(n AS HUGEINT) * n * n - n - ties > 0 THEN
       |  CAST((CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
       |    * (CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
       |    * 3000 * n * (n - 1)
       |    // (CAST(n_a AS HUGEINT) * n_b
       |       * (CAST(n AS HUGEINT) * n * n - n - ties)) AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST(CASE WHEN n_a > 0 AND n_b > 0
       |   AND CAST(n AS HUGEINT) * n * n - n - ties > 0 THEN
       |  CAST((CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
       |    * (CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
       |    * 3000 * n * (n - 1)
       |    // (CAST(n_a AS HUGEINT) * n_b
       |       * (CAST(n AS HUGEINT) * n * n - n - ties)) AS BIGINT)
       | ELSE 0 END >= 3841 AS BIGINT) AS reject
       |FROM st ORDER BY event_type""".stripMargin

  // q281: RATIO-METRIC VARIANCE, DELTA METHOD vs BLOCK JACKKNIFE — ratio
  // metrics (value per event, with USERS as the randomization unit) make
  // naive SE formulas wrong: Var(sum Y / sum M) needs either the
  // linearization Var = sum((y_i - R m_i)^2) * n/((n-1) SM^2) (delta
  // method) or a resampling estimate. The 32-block delete-one jackknife
  // is the resampling form that PARALLELIZES: block sums are one
  // partial-aggregated pass, and each leave-one-out ratio is algebra on
  // the 32-row block table — no resampled data pass, the q264 bootstrap's
  // cheap cousin. The deliverable is their AGREEMENT (jk/delta permille):
  // a large gap flags intra-user correlation the delta form missed.
  // Exact integers throughout: residuals e_i = 1000*y_i - r_milli*m_i
  // against the staged fixed-point ratio, jackknife around the full-
  // sample r_milli. Shape: one user-grain shuffle, a broadcast 5-row
  // join back for residuals, a 32-row-per-type block collapse.
  private def q281(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum("v").as("y"), count(lit(1)).as("m"))
      .withColumn("blk", hashBucket(col("user_id"), 32))
    val tot = ug.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("y").as("sy"), sum("m").as("sm"))
      .withColumn("r_micro", expr("CAST(CAST(sy AS DECIMAL(38,0)) * 1000000 div sm AS BIGINT)"))
      .withColumn("r_milli", expr("CAST(CAST(sy AS DECIMAL(38,0)) * 1000 div sm AS BIGINT)"))
    val delta = ug.join(broadcast(tot), Seq("event_type"))
      .withColumn("e", expr("1000 * y - r_milli * m"))
      .groupBy("event_type")
      .agg(sum(expr("CAST(e AS DECIMAL(38,0)) * e")).as("see"),
        first("n_users").as("n_users"), first("sy").as("sy"),
        first("sm").as("sm"), first("r_micro").as("r_micro"),
        first("r_milli").as("r_milli"))
      .withColumn("vd_milli2", expr(
        "CAST(see * n_users div ((n_users - 1) * CAST(sm AS DECIMAL(38,0)) * sm) AS BIGINT)"))
    val jack = ug.groupBy("event_type", "blk")
      .agg(sum("y").as("yb"), sum("m").as("mb"))
      .join(broadcast(tot.select("event_type", "sy", "sm", "r_milli")), Seq("event_type"))
      .withColumn("rb_milli", expr(
        "CAST(CAST(sy - yb AS DECIMAL(38,0)) * 1000 div (sm - mb) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("CAST(rb_milli - r_milli AS DECIMAL(38,0)) * (rb_milli - r_milli)"))
          .as("sq"))
      .withColumn("vj_milli2", expr("CAST((n_blocks - 1) * sq div n_blocks AS BIGINT)"))
    delta.join(jack.select("event_type", "n_blocks", "vj_milli2"), Seq("event_type"))
      .select(col("event_type"), col("n_users"), col("n_blocks"), col("r_micro"),
        col("vd_milli2"), col("vj_milli2"),
        expr("CASE WHEN vd_milli2 > 0 THEN CAST(CAST(vj_milli2 AS DECIMAL(38,0)) * 1000 div vd_milli2 AS BIGINT) ELSE 0L END")
          .as("jk_vs_delta_permille"),
        expr("CAST(floor(sqrt(CAST(vd_milli2 AS DOUBLE))) AS BIGINT)").as("se_delta_milli"),
        expr("CAST(floor(sqrt(CAST(vj_milli2 AS DOUBLE))) AS BIGINT)").as("se_jack_milli"))
      .orderBy("event_type")
  }

  private val q281Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y,
       |   count(*) AS m, ${duckArm(32)} AS blk
       |  FROM events GROUP BY 1, 2),
       |tot AS (SELECT event_type, count(*) AS n_users,
       |   CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(m) AS HUGEINT) AS sm
       |  FROM ug GROUP BY 1),
       |tr AS (SELECT *, CAST(sy * 1000000 // sm AS BIGINT) AS r_micro,
       |   CAST(sy * 1000 // sm AS BIGINT) AS r_milli FROM tot),
       |de AS (SELECT u.event_type,
       |   sum(CAST(1000 * u.y - t.r_milli * u.m AS HUGEINT)
       |     * (1000 * u.y - t.r_milli * u.m)) AS see
       |  FROM ug u JOIN tr t ON u.event_type = t.event_type GROUP BY 1),
       |dd AS (SELECT t.event_type, t.n_users, t.r_micro, t.r_milli, t.sm,
       |   CAST(d.see * t.n_users // ((t.n_users - 1) * t.sm * t.sm) AS BIGINT) AS vd_milli2
       |  FROM tr t JOIN de d ON t.event_type = d.event_type),
       |bl AS (SELECT event_type, blk, CAST(sum(y) AS HUGEINT) AS yb,
       |   CAST(sum(m) AS HUGEINT) AS mb FROM ug GROUP BY 1, 2),
       |rb AS (SELECT b.event_type,
       |   CAST((t.sy - b.yb) * 1000 // (t.sm - b.mb) AS BIGINT) AS rb_milli, t.r_milli
       |  FROM bl b JOIN tr t ON b.event_type = t.event_type),
       |jk AS (SELECT event_type, count(*) AS n_blocks,
       |   CAST((count(*) - 1) * sum(CAST(rb_milli - r_milli AS HUGEINT)
       |     * (rb_milli - r_milli)) // count(*) AS BIGINT) AS vj_milli2
       |  FROM rb GROUP BY 1)
       |SELECT d.event_type, d.n_users, j.n_blocks, d.r_micro, d.vd_milli2, j.vj_milli2,
       | CASE WHEN d.vd_milli2 > 0
       |   THEN CAST(CAST(j.vj_milli2 AS HUGEINT) * 1000 // d.vd_milli2 AS BIGINT)
       |   ELSE 0 END AS jk_vs_delta_permille,
       | CAST(floor(sqrt(CAST(d.vd_milli2 AS DOUBLE))) AS BIGINT) AS se_delta_milli,
       | CAST(floor(sqrt(CAST(j.vj_milli2 AS DOUBLE))) AS BIGINT) AS se_jack_milli
       |FROM dd d JOIN jk j ON d.event_type = j.event_type
       |ORDER BY d.event_type""".stripMargin

  // q282: SIMPSON'S-PARADOX REVERSAL AUDIT — before any arm comparison
  // ships, check whether the AGGREGATE sign survives stratification:
  // a success-rate gap can invert inside every stratum when arms are
  // imbalanced across strata (Simpson). Strata here are the four 6-hour
  // day-parts; success = round(value) >= 100. All sign logic is exact
  // cross-multiplication (xA*nB - xB*nA, never a rate materialized), the
  // per-stratum verdict weights by stratum size, and the deliverable per
  // event_type is the aggregate sign, how many strata (and how much
  // event mass) disagree with it, and the reversal flag. Shape: one
  // (type, stratum, arm) partial-agg collapse — 40 cells per type — then
  // pure algebra; the 100 TB cost is the single scan.
  private def q282(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("stratum", expr("CAST((unix_micros(ts) div 3600000000) % 24 div 6 AS BIGINT)"))
      .withColumn("succ", expr("IF(CAST(round(value) AS BIGINT) >= 100, 1L, 0L)"))
      .groupBy("event_type", "stratum")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("xb"))
    val agg = cells.groupBy("event_type")
      .agg(sum("na").as("ta"), sum("xa").as("sa"),
        sum("nb").as("tb"), sum("xb").as("sb"))
      .withColumn("agg_sign", expr(
        "CAST(sign(CAST(sa AS DECIMAL(38,0)) * tb - CAST(sb AS DECIMAL(38,0)) * ta) AS BIGINT)"))
    cells.join(broadcast(agg), Seq("event_type"))
      .withColumn("s_sign", expr(
        "CASE WHEN na > 0 AND nb > 0 THEN CAST(sign(CAST(xa AS DECIMAL(38,0)) * nb - CAST(xb AS DECIMAL(38,0)) * na) AS BIGINT) ELSE 0L END"))
      .withColumn("rev", expr(
        "IF(s_sign != 0 AND agg_sign != 0 AND s_sign = -agg_sign, 1L, 0L)"))
      .groupBy("event_type")
      .agg(first("agg_sign").as("agg_sign"),
        count(lit(1)).as("n_strata"),
        sum("rev").as("n_reversed"),
        sum(expr("rev * (na + nb)")).as("rev_mass"),
        sum(expr("na + nb")).as("mass"))
      .withColumn("rev_mass_permille",
        expr("CAST(rev_mass * 1000 div mass AS BIGINT)"))
      .withColumn("simpson_flag", expr("CAST(rev_mass_permille > 500 AS BIGINT)"))
      .select("event_type", "agg_sign", "n_strata", "n_reversed",
        "rev_mass_permille", "simpson_flag")
      .orderBy("event_type")
  }

  private val q282Sql =
    s"""WITH cells AS (SELECT event_type,
       |   (epoch_us(ts) // 3600000000) % 24 // 6 AS stratum,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xa,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xb
       |  FROM events GROUP BY 1, 2),
       |ag AS (SELECT event_type, CAST(sum(na) AS HUGEINT) AS ta,
       |   CAST(sum(xa) AS HUGEINT) AS sa, CAST(sum(nb) AS HUGEINT) AS tb,
       |   CAST(sum(xb) AS HUGEINT) AS sb FROM cells GROUP BY 1),
       |sg AS (SELECT event_type, ta, tb,
       |   CAST(sign(sa * tb - sb * ta) AS BIGINT) AS agg_sign FROM ag),
       |j AS (SELECT c.event_type, s.agg_sign, c.na, c.nb,
       |   CASE WHEN c.na > 0 AND c.nb > 0
       |     THEN CAST(sign(CAST(c.xa AS HUGEINT) * c.nb - CAST(c.xb AS HUGEINT) * c.na) AS BIGINT)
       |     ELSE 0 END AS s_sign
       |  FROM cells c JOIN sg s ON c.event_type = s.event_type)
       |SELECT event_type, any_value(agg_sign) AS agg_sign, count(*) AS n_strata,
       | CAST(sum(CASE WHEN s_sign != 0 AND agg_sign != 0 AND s_sign = -agg_sign
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
       | CAST(sum(CASE WHEN s_sign != 0 AND agg_sign != 0 AND s_sign = -agg_sign
       |   THEN na + nb ELSE 0 END) * 1000 // sum(na + nb) AS BIGINT) AS rev_mass_permille,
       | CAST(sum(CASE WHEN s_sign != 0 AND agg_sign != 0 AND s_sign = -agg_sign
       |   THEN na + nb ELSE 0 END) * 1000 // sum(na + nb) > 500 AS BIGINT) AS simpson_flag
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  // q291: 1-D WASSERSTEIN (EARTH-MOVER) DRIFT — the MAGNITUDE-aware
  // member of the drift family: q217's KS statistic is the largest CDF
  // gap (insensitive to how much mass moved how far) and q248's PSI is
  // bin-ratio-based (blind to ordering — swapping two distant bins reads
  // the same as swapping neighbors); W₁ = ∫|F_A − F_B| is EXACTLY the
  // cost of moving the distribution, in the metric's own units, which is
  // what a "did the value distribution shift and by how many dollars"
  // monitor wants. Windows are the day halves (hod < 12 vs ≥ 12) per
  // event_type; values quantize to a declared 64-bin grid (width 800
  // centi = 8 units) and W₁ is the exact integer sum of
  // |cumA·nB − cumB·nA| over the DENSE grid (a type×64 scaffold — empty
  // bins still carry the CDF gap across them; the q278 grid-completion
  // idiom), cross-multiplied so no rate is ever materialized. Shape: one
  // (type, bin) collapse, a broadcast 64-row scaffold, one ≤64-row
  // window per type.
  private def q291(s: SparkSession, d: String): DataFrame = {
    val binned = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("bin", expr(
        "least(CAST(63 AS BIGINT), CAST(round(value * 100) AS BIGINT) div 800)"))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("ca"),
        sum(when(col("hod") >= 12, 1L).otherwise(0L)).as("cb"))
    val types = binned.select("event_type").distinct()
    val grid = types
      .crossJoin(broadcast(types.sparkSession.range(0, 64).select(col("id").as("bin"))))
      .join(binned, Seq("event_type", "bin"), "left")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy("event_type")
    grid
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("na", sum("ca").over(wp))
      .withColumn("nb", sum("cb").over(wp))
      .groupBy("event_type")
      .agg(first("na").as("n_a"), first("nb").as("n_b"),
        sum(expr(
          "abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na)"))
          .as("gap"))
      .withColumn("w1_milli", expr(
        "CAST(gap * 8000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .select("event_type", "n_a", "n_b", "w1_milli")
      .orderBy("event_type")
  }

  private val q291Sql =
    """WITH binned AS (SELECT event_type,
      |   least(63, CAST(round(value * 100) AS BIGINT) // 800) AS bin,
      |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT t.event_type, g.bin,
      |   COALESCE(b.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb
      |  FROM (SELECT DISTINCT event_type FROM binned) t
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bin) g
      |  LEFT JOIN binned b ON b.event_type = t.event_type AND b.bin = g.bin),
      |cm AS (SELECT event_type, bin, ca, cb,
      |   sum(ca) OVER (PARTITION BY event_type ORDER BY bin
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |   sum(cb) OVER (PARTITION BY event_type ORDER BY bin
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |   sum(ca) OVER (PARTITION BY event_type) AS na,
      |   sum(cb) OVER (PARTITION BY event_type) AS nb
      |  FROM grid)
      |SELECT event_type, CAST(any_value(na) AS BIGINT) AS n_a,
      | CAST(any_value(nb) AS BIGINT) AS n_b,
      | CAST(sum(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
      |   * 8000 // (CAST(any_value(na) AS HUGEINT) * any_value(nb)) AS BIGINT)
      |   AS w1_milli
      |FROM cm GROUP BY event_type ORDER BY event_type""".stripMargin

  // q292: PROBABILISTIC-SCORE CALIBRATION AUDIT — accuracy (q286's
  // confusion matrix) says nothing about whether a score of 0.8 MEANS
  // 80%: a training-data pipeline that thresholds or importance-weights
  // by model scores (q128's DSIR weights, q153's similarity calibration)
  // needs the scores CALIBRATED. The standard readout: 10 reliability
  // bins over the clamped probe score, Expected Calibration Error
  // (sum_b n_b·|mean_p − mean_y| / N — exactly Σ|sum_p_micro − 1e6·sum_y|
  // per bin, integer by construction) and the Brier score (mean squared
  // probability error, micro² units). Reuses q286's closed-form model
  // verbatim — the audit runs on the SAME eval scores the confusion
  // matrix graded, one extra collapse to the 10-bin grid.
  private def q292(s: SparkSession, d: String): DataFrame = {
    val feat = ProbeModel.features(s, d)
    val m = ProbeModel.weights(feat)
    val scored = feat.filter(col("bkt") >= 80)
      .crossJoin(broadcast(m))
      .withColumn("p_micro", expr(
        "greatest(0L, least(1000000L, w0_micro + w1_micro * x1 + w2_micro * x2))"))
      .withColumn("bin", expr("least(9L, p_micro div 100000)"))
    val bins = scored.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("y").as("sum_y"),
        sum("p_micro").as("sum_p_micro"),
        sum(expr("CAST(p_micro - 1000000 * y AS DECIMAL(38,0)) " +
          "* (p_micro - 1000000 * y)")).as("sq"))
    val w = Window.partitionBy(pmod(col("bin"), lit(1L)))
    bins
      .withColumn("n_total", sum("n_docs").over(w))
      .withColumn("ece_micro", expr(
        "CAST(sum(abs(sum_p_micro - 1000000 * sum_y)) OVER () div n_total AS BIGINT)"))
      .withColumn("brier_micro2", expr(
        "CAST(sum(sq) OVER () div n_total AS BIGINT)"))
      .select(col("bin"), col("n_docs"),
        expr("sum_y * 1000 div n_docs").as("mean_y_permille"),
        expr("sum_p_micro div (n_docs * 1000)").as("mean_p_permille"),
        expr("CAST(abs(sum_p_micro - 1000000 * sum_y) div n_docs AS BIGINT)").as("gap_micro"),
        col("ece_micro"), col("brier_micro2"))
      .orderBy("bin")
  }

  private val q292Sql =
    s"""WITH ${ProbeModel.duckFeatAndWeights},
      |sc AS (SELECT f.y,
      |   greatest(0, least(1000000, w.w0_micro + w.w1_micro * f.x1 + w.w2_micro * f.x2))
      |     AS p_micro
      |  FROM feat f CROSS JOIN wt w WHERE f.bkt >= 80),
      |bn AS (SELECT least(9, p_micro // 100000) AS bin, count(*) AS n_docs,
      |   CAST(sum(y) AS BIGINT) AS sum_y, CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
      |   sum(CAST(p_micro - 1000000 * y AS HUGEINT) * (p_micro - 1000000 * y)) AS sq
      |  FROM sc GROUP BY 1),
      |tot AS (SELECT sum(n_docs) AS n_total,
      |   sum(abs(sum_p_micro - 1000000 * sum_y)) AS gaps,
      |   CAST(sum(sq) AS HUGEINT) AS sqs FROM bn)
      |SELECT CAST(b.bin AS BIGINT) AS bin, b.n_docs,
      | b.sum_y * 1000 // b.n_docs AS mean_y_permille,
      | b.sum_p_micro // (b.n_docs * 1000) AS mean_p_permille,
      | CAST(abs(b.sum_p_micro - 1000000 * b.sum_y) // b.n_docs AS BIGINT) AS gap_micro,
      | CAST(t.gaps // t.n_total AS BIGINT) AS ece_micro,
      | CAST(t.sqs // t.n_total AS BIGINT) AS brier_micro2
      |FROM bn b CROSS JOIN tot t ORDER BY b.bin""".stripMargin

  // q293: O'BRIEN–FLEMING GROUP-SEQUENTIAL GATE — the INTERIM-ANALYSIS
  // discipline between q231's single fixed-horizon test and q267's
  // per-observation SPRT: real platforms peek at fixed LOOKS (here 5
  // equal information fractions by arrival order), and peeking at the
  // naive 1.96 boundary five times inflates false positives ~3×. The
  // O'Brien–Fleming spending shape z_k = z_K·√(K/k) makes early looks
  // near-impossible and the final look close to nominal — the declared
  // ladder (z²-milli literals 20812/10407/6938/5203/4162, authoring-time
  // constants injected identically into both engines, the q278
  // technique) IS the operator's contract. Cumulative per-look counts
  // come from one (type, look) collapse + a ≤5-row running window; the
  // z² is q231's cross-multiplied algebra, never a materialized rate.
  // Deliverable per (type, look): the boundary comparison both ways,
  // plus each type's first OBF and first naive crossing.
  private def q293(s: SparkSession, d: String): DataFrame = {
    val ladder = "array(20812L, 10407L, 6938L, 5203L, 4162L)"
    val maxId = events(s, d).agg(max("event_id").as("mx"))
    val cells = events(s, d)
      .crossJoin(broadcast(maxId))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("succ", expr("IF(CAST(round(value) AS BIGINT) >= 100, 1L, 0L)"))
      .withColumn("look", expr("least(4L, event_id * 5 div (mx + 1)) + 1"))
      .groupBy("event_type", "look")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("xb"))
    val w = Window.partitionBy("event_type").orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val looks = cells
      .withColumn("cna", sum("na").over(w)).withColumn("cxa", sum("xa").over(w))
      .withColumn("cnb", sum("nb").over(w)).withColumn("cxb", sum("xb").over(w))
      .withColumn("z2_milli", expr(
        """CASE WHEN cna > 0 AND cnb > 0 AND (cxa + cxb) > 0
          |  AND (cxa + cxb) < (cna + cnb) THEN
          | CAST((CAST(cxa AS DECIMAL(38,0)) * cnb - CAST(cxb AS DECIMAL(38,0)) * cna)
          |   * (CAST(cxa AS DECIMAL(38,0)) * cnb - CAST(cxb AS DECIMAL(38,0)) * cna)
          |   * (cna + cnb) * 1000
          |   div (CAST(cxa + cxb AS DECIMAL(38,0)) * (cna + cnb - cxa - cxb) * cna * cnb)
          |  AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("obf_t_milli", expr(s"element_at($ladder, CAST(look AS INT))"))
      .withColumn("obf_reject", expr("CAST(z2_milli >= obf_t_milli AS BIGINT)"))
      .withColumn("naive_reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
    val wt = Window.partitionBy("event_type")
    looks
      .withColumn("first_obf_look", min(expr("IF(obf_reject = 1, look, 99L)")).over(wt))
      .withColumn("first_naive_look", min(expr("IF(naive_reject = 1, look, 99L)")).over(wt))
      .select(col("event_type"), col("look"), expr("cna + cnb").as("n_cum"),
        col("z2_milli"), col("obf_t_milli"), col("obf_reject"), col("naive_reject"),
        col("first_obf_look"), col("first_naive_look"))
      .orderBy("event_type", "look")
  }

  private val q293Sql =
    s"""WITH mx AS (SELECT max(event_id) AS mx FROM events),
       |cells AS (SELECT event_type,
       |   least(4, event_id * 5 // (mx.mx + 1)) + 1 AS look,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xa,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xb
       |  FROM events, mx GROUP BY 1, 2),
       |cm AS (SELECT event_type, look,
       |   sum(na) OVER pw AS cna, sum(xa) OVER pw AS cxa,
       |   sum(nb) OVER pw AS cnb, sum(xb) OVER pw AS cxb
       |  FROM cells
       |  WINDOW pw AS (PARTITION BY event_type ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |z AS (SELECT event_type, look, cna + cnb AS n_cum,
       |   CASE WHEN cna > 0 AND cnb > 0 AND cxa + cxb > 0
       |     AND cxa + cxb < cna + cnb THEN
       |    CAST((CAST(cxa AS HUGEINT) * cnb - CAST(cxb AS HUGEINT) * cna)
       |      * (CAST(cxa AS HUGEINT) * cnb - CAST(cxb AS HUGEINT) * cna)
       |      * (cna + cnb) * 1000
       |      // (CAST(cxa + cxb AS HUGEINT) * (cna + cnb - cxa - cxb) * cna * cnb)
       |     AS BIGINT)
       |   ELSE 0 END AS z2_milli,
       |   ([20812, 10407, 6938, 5203, 4162])[CAST(look AS INT)] AS obf_t_milli
       |  FROM cm),
       |f AS (SELECT *, CAST(z2_milli >= obf_t_milli AS BIGINT) AS obf_reject,
       |   CAST(z2_milli >= 3841 AS BIGINT) AS naive_reject FROM z)
       |SELECT event_type, look, CAST(n_cum AS BIGINT) AS n_cum, z2_milli,
       | CAST(obf_t_milli AS BIGINT) AS obf_t_milli, obf_reject, naive_reject,
       | min(CASE WHEN obf_reject = 1 THEN look ELSE 99 END)
       |   OVER (PARTITION BY event_type) AS first_obf_look,
       | min(CASE WHEN naive_reject = 1 THEN look ELSE 99 END)
       |   OVER (PARTITION BY event_type) AS first_naive_look
       |FROM f ORDER BY event_type, look""".stripMargin

  // q297: QUANTILE TREATMENT EFFECT — the experiment read when the MEAN
  // is the wrong functional (q279/q281 adjust and bound means; heavy
  // tails make them noise): the median difference between arms, each
  // side carrying q277's distribution-free order-statistic CI (ranks
  // n/2 ∓ 0.98√n cover the true median at ~95% for ANY distribution),
  // significance = the two bands are disjoint. The scale shape is the
  // q280 trick one level up: order statistics need a sort, but the
  // SELECTION collapses to VALUE grain — group by (type, arm, v_centi),
  // one cumulative window over the bounded distinct-value domain, and
  // each target rank k picks the unique row with prev < k ≤ cum. The
  // exact integer sqrt reuses q277's floor(sqrt(double)) + two-step
  // correction (IEEE sqrt is correctly rounded; the correction makes the
  // result exact regardless). Rows never sort; the window runs over
  // ≤ |value domain| rows per (type, arm).
  private def q297(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "arm", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type", "arm").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vg.withColumn("cum", sum("cnt").over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val tot = vg.groupBy("event_type", "arm").agg(sum("cnt").as("n"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("s1", expr("s0 + IF((s0 + 1) * (s0 + 1) <= n, 1L, 0L)"))
      .withColumn("sqn", expr("s1 - IF(s1 * s1 > n, 1L, 0L)"))
      .select(col("event_type"), col("arm"), col("n"), explode(expr(
        """array(
          |  struct('lo' AS kind, (n div 2) - (980 * sqn div 1000) AS k),
          |  struct('med' AS kind, (n + 1) div 2 AS k),
          |  struct('hi' AS kind, (n div 2) + 1 + (980 * sqn div 1000) AS k))"""
          .stripMargin)).as("t"))
      .select(col("event_type"), col("arm"), col("n"), col("t.kind").as("kind"),
        expr("greatest(least(t.k, n), 1L)").as("k"))
    val picked = tot.join(cum, Seq("event_type", "arm"))
      .filter(col("prev") < col("k") && col("k") <= col("cum"))
      .select("event_type", "arm", "kind", "n", "v")
    picked.groupBy("event_type")
      .agg(max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 0 && col("kind") === "med", col("v"))).as("med_a_centi"),
        max(when(col("arm") === 0 && col("kind") === "lo", col("v"))).as("lo_a_centi"),
        max(when(col("arm") === 0 && col("kind") === "hi", col("v"))).as("hi_a_centi"),
        max(when(col("arm") === 1 && col("kind") === "med", col("v"))).as("med_b_centi"),
        max(when(col("arm") === 1 && col("kind") === "lo", col("v"))).as("lo_b_centi"),
        max(when(col("arm") === 1 && col("kind") === "hi", col("v"))).as("hi_b_centi"))
      .withColumn("qte_centi", expr("med_b_centi - med_a_centi"))
      .withColumn("sig", expr(
        "CAST(lo_b_centi > hi_a_centi OR lo_a_centi > hi_b_centi AS BIGINT)"))
      .orderBy("event_type")
  }

  private val q297Sql =
    s"""WITH vg AS (SELECT event_type, ${duckArm(2)} AS arm,
       |   CAST(round(value * 100) AS BIGINT) AS v, count(*) AS cnt
       |  FROM events GROUP BY 1, 2, 3),
       |cm AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type, arm ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vg),
       |cp AS (SELECT *, cum - cnt AS prev FROM cm),
       |tt AS (SELECT event_type, arm, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM vg GROUP BY 1, 2),
       |sq AS (SELECT *, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM tt),
       |s1t AS (SELECT *, s0 + CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN 1 ELSE 0 END AS s1
       |  FROM sq),
       |sn AS (SELECT event_type, arm, n,
       |   s1 - CASE WHEN s1 * s1 > n THEN 1 ELSE 0 END AS sqn FROM s1t),
       |tg AS (SELECT event_type, arm, n, kind,
       |   greatest(least(CASE kind
       |     WHEN 'lo' THEN (n // 2) - (980 * sqn // 1000)
       |     WHEN 'med' THEN (n + 1) // 2
       |     ELSE (n // 2) + 1 + (980 * sqn // 1000) END, n), 1) AS k
       |  FROM sn CROSS JOIN (SELECT unnest(['lo', 'med', 'hi']) AS kind)),
       |pk AS (SELECT t.event_type, t.arm, t.kind, t.n, c.v
       |  FROM tg t JOIN cp c ON t.event_type = c.event_type AND t.arm = c.arm
       |  WHERE c.prev < t.k AND t.k <= c.cum)
       |SELECT event_type,
       | CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
       | CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
       | CAST(max(CASE WHEN arm = 0 AND kind = 'med' THEN v END) AS BIGINT) AS med_a_centi,
       | CAST(max(CASE WHEN arm = 0 AND kind = 'lo' THEN v END) AS BIGINT) AS lo_a_centi,
       | CAST(max(CASE WHEN arm = 0 AND kind = 'hi' THEN v END) AS BIGINT) AS hi_a_centi,
       | CAST(max(CASE WHEN arm = 1 AND kind = 'med' THEN v END) AS BIGINT) AS med_b_centi,
       | CAST(max(CASE WHEN arm = 1 AND kind = 'lo' THEN v END) AS BIGINT) AS lo_b_centi,
       | CAST(max(CASE WHEN arm = 1 AND kind = 'hi' THEN v END) AS BIGINT) AS hi_b_centi,
       | CAST(max(CASE WHEN arm = 1 AND kind = 'med' THEN v END)
       |   - max(CASE WHEN arm = 0 AND kind = 'med' THEN v END) AS BIGINT) AS qte_centi,
       | CAST(max(CASE WHEN arm = 1 AND kind = 'lo' THEN v END)
       |     > max(CASE WHEN arm = 0 AND kind = 'hi' THEN v END)
       |   OR max(CASE WHEN arm = 0 AND kind = 'lo' THEN v END)
       |     > max(CASE WHEN arm = 1 AND kind = 'hi' THEN v END) AS BIGINT) AS sig
       |FROM pk GROUP BY event_type ORDER BY event_type""".stripMargin

  // q300: MINIMUM-DETECTABLE-EFFECT CALCULATOR — the question asked
  // BEFORE q231/q293/q297 ever run: at this traffic, what rate change
  // CAN the test even see? Two-proportion MDE at α = .05 two-sided /
  // power .8: (z_.975 + z_.8)·√(2p(1−p)/n_arm) with the z-sum declared
  // as the authoring-time constant 2802 milli (1.960 + 0.842 — the q278
  // ladder convention). n_arm = n_h/2 under the 50/50 split, so the
  // variance term is 4·p_micro·(1e6 − p_micro)/n_h exact micro² (the
  // textbook 2p(1−p)/n takes the PER-ARM size); the square root is
  // q277's floor(sqrt(double)) + two-step correction (exact for any
  // BIGINT; the argument is < 2^53 by construction), and each type is
  // priced at 1×/2×/4× the observed horizon next to its OBSERVED arm
  // gap — "powered" = the gap the data already shows clears the MDE.
  // One collapse + 15-row algebra.
  private def q300(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("succ", expr("IF(CAST(round(value) AS BIGINT) >= 100, 1L, 0L)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("succ").as("x"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("xb"))
      .withColumn("p_micro", expr("x * 1000000 div n"))
      .withColumn("gap_micro", expr(
        "abs(xa * 1000000 div na - xb * 1000000 div nb)"))
    base.select(col("event_type"), col("p_micro"), col("gap_micro"), col("n"),
        explode(expr("array(1L, 2L, 4L)")).as("horizon"))
      .withColumn("n_h", expr("n * horizon"))
      .withColumn("v", expr("4 * p_micro * (1000000 - p_micro) div n_h"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT)"))
      .withColumn("s1", expr("s0 + IF((s0 + 1) * (s0 + 1) <= v, 1L, 0L)"))
      .withColumn("sq", expr("s1 - IF(s1 * s1 > v, 1L, 0L)"))
      .withColumn("mde_micro", expr("2802 * sq div 1000"))
      .withColumn("powered", expr("CAST(gap_micro >= mde_micro AS BIGINT)"))
      .select("event_type", "horizon", "n_h", "p_micro", "mde_micro",
        "gap_micro", "powered")
      .orderBy("event_type", "horizon")
  }

  private val q300Sql =
    s"""WITH base AS (SELECT event_type, count(*) AS n,
       |   CAST(sum(CASE WHEN CAST(round(value) AS BIGINT) >= 100
       |     THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xa,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1
       |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS xb
       |  FROM events GROUP BY 1),
       |pg AS (SELECT event_type, n, x * 1000000 // n AS p_micro,
       |   abs(xa * 1000000 // na - xb * 1000000 // nb) AS gap_micro FROM base),
       |hz AS (SELECT p.*, h.horizon, p.n * h.horizon AS n_h
       |  FROM pg p CROSS JOIN (SELECT unnest([1, 2, 4]) AS horizon) h),
       |vv AS (SELECT *, 4 * p_micro * (1000000 - p_micro) // n_h AS v FROM hz),
       |sq AS (SELECT *, CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS s0 FROM vv),
       |s1t AS (SELECT *, s0 + CASE WHEN (s0 + 1) * (s0 + 1) <= v THEN 1 ELSE 0 END AS s1
       |  FROM sq),
       |sn AS (SELECT *, s1 - CASE WHEN s1 * s1 > v THEN 1 ELSE 0 END AS sqv FROM s1t)
       |SELECT event_type, CAST(horizon AS BIGINT) AS horizon,
       | CAST(n_h AS BIGINT) AS n_h, CAST(p_micro AS BIGINT) AS p_micro,
       | CAST(2802 * sqv // 1000 AS BIGINT) AS mde_micro,
       | CAST(gap_micro AS BIGINT) AS gap_micro,
       | CAST(gap_micro >= 2802 * sqv // 1000 AS BIGINT) AS powered
       |FROM sn ORDER BY event_type, horizon""".stripMargin

  // q301: MANN–KENDALL TREND TEST — the SIGNIFICANCE companion q245's
  // Theil–Sen slope ships without (a robust slope with no p-value is a
  // number, not a decision): S = Σ_{i<j} sign(x_j − x_i) over the
  // day-grain series, tie-corrected Var(S) = [n(n−1)(2n+5) −
  // Σt(t−1)(2t+5)]/18, continuity-corrected z² = (|S|−1)²/Var — all
  // exact integers by cross-multiplication. The scale fact: the pair
  // "join" runs at GRID grain (≤ ~30 day cells per type after the one
  // partial-agg collapse) — pair count is a constant of the calendar,
  // not the corpus; the data pass is one scan.
  private def q301(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val pairs = daily.as("a").join(daily.as("b"),
        expr("a.event_type = b.event_type AND a.day < b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("CAST(sign(b.x - a.x) AS BIGINT)").as("sgn"))
      .groupBy("event_type").agg(sum("sgn").as("s_stat"))
    val ties = daily.groupBy("event_type", "x")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_distinct"), sum("t").as("n_days"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    pairs.join(ties, Seq("event_type"))
      .withColumn("var18", expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .withColumn("z2_milli", expr(
        """CASE WHEN var18 > 0 AND abs(s_stat) > 1 THEN
          | CAST((abs(s_stat) - 1) * (abs(s_stat) - 1) * 18 * 1000 div var18 AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        col("tie_term"), col("z2_milli"),
        expr("CAST(sign(s_stat) AS BIGINT)").as("trend"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q301Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS x FROM events GROUP BY 1, 2),
      |pairs AS (SELECT a.event_type, CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s_stat
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |ties AS (SELECT event_type, count(*) AS n_distinct,
      |   CAST(sum(t) AS BIGINT) AS n_days,
      |   CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, x, count(*) AS t FROM daily GROUP BY 1, 2)
      |  GROUP BY 1),
      |j AS (SELECT p.event_type, t.n_days, p.s_stat, t.tie_term,
      |   t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var18
      |  FROM pairs p JOIN ties t ON p.event_type = t.event_type)
      |SELECT event_type, n_days, s_stat, tie_term,
      | CASE WHEN var18 > 0 AND abs(s_stat) > 1 THEN
      |  CAST((abs(s_stat) - 1) * (abs(s_stat) - 1) * 18 * 1000 // var18 AS BIGINT)
      | ELSE 0 END AS z2_milli,
      | CAST(sign(s_stat) AS BIGINT) AS trend,
      | CAST(CASE WHEN var18 > 0 AND abs(s_stat) > 1 THEN
      |  (abs(s_stat) - 1) * (abs(s_stat) - 1) * 18 * 1000 // var18
      | ELSE 0 END >= 3841 AS BIGINT) AS reject
      |FROM j ORDER BY event_type""".stripMargin

  // q303: DIFFERENCE-IN-DIFFERENCES — the panel estimator for when
  // randomization is imperfect: arm-level differences absorb any static
  // between-arm gap, and within-user pre/post differencing absorbs each
  // user's own level, leaving DiD = (ȲB,post − ȲB,pre) − (ȲA,post −
  // ȲA,pre). The unit of variance is the USER's d = post − pre (the
  // q279 user-grain fold reused), so SE² = var_A(d)/n_A + var_B(d)/n_B
  // with exact integer moments; z² by cross-multiplication — the
  // two-sample t on user deltas, never a rate materialized. Shape: one
  // (type, user) shuffle, one 10-cell collapse, pure algebra.
  private def q303(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("hod") < 12, col("v")).otherwise(0L)).as("x"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("dd", expr("y - x"))
    ug.groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("dd")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 0,
          expr("CAST(dd AS DECIMAL(38,0)) * dd")).otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("saa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("dd")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 1,
          expr("CAST(dd AS DECIMAL(38,0)) * dd")).otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sbb"))
      .withColumn("did_micro", expr(
        "CAST(CAST(sb AS DECIMAL(38,0)) * 1000000 div n_b " +
          "- CAST(sa AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)"))
      // var(d)·n·(n−1) kept as the exact integer caa = n·Σd² − (Σd)²
      .withColumn("caa", expr("n_a * saa - CAST(sa AS DECIMAL(38,0)) * sa"))
      .withColumn("cbb", expr("n_b * sbb - CAST(sb AS DECIMAL(38,0)) * sb"))
      // SE²·1e12 = 1e12·(caa/(nA²(nA−1)) + cbb/(nB²(nB−1))), staged
      .withColumn("se2_micro2", expr(
        "CAST(caa * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_a * (n_a - 1)) " +
          "+ cbb * 1000000 div (CAST(n_b AS DECIMAL(38,0)) * n_b * (n_b - 1)) AS BIGINT) * 1000000"))
      .withColumn("z2_milli", expr(
        """CASE WHEN se2_micro2 > 0 THEN
          | CAST(CAST(did_micro AS DECIMAL(38,0)) * did_micro * 1000 div se2_micro2 AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_a"), col("n_b"), col("did_micro"),
        col("z2_milli"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q303Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |       THEN CAST(round(value) AS BIGINT) ELSE 0 END)
       |     - sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |       THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS dd,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |ag AS (SELECT event_type,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |   CAST(sum(CASE WHEN arm = 0 THEN dd ELSE 0 END) AS HUGEINT) AS sa,
       |   sum(CASE WHEN arm = 0 THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS saa,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |   CAST(sum(CASE WHEN arm = 1 THEN dd ELSE 0 END) AS HUGEINT) AS sb,
       |   sum(CASE WHEN arm = 1 THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS sbb
       |  FROM ug GROUP BY 1),
       |st AS (SELECT *,
       |   CAST(sb * 1000000 // n_b - sa * 1000000 // n_a AS BIGINT) AS did_micro,
       |   n_a * saa - sa * sa AS caa, n_b * sbb - sb * sb AS cbb FROM ag),
       |se AS (SELECT *,
       |   CAST(caa * 1000000 // (CAST(n_a AS HUGEINT) * n_a * (n_a - 1))
       |     + cbb * 1000000 // (CAST(n_b AS HUGEINT) * n_b * (n_b - 1)) AS BIGINT)
       |     * 1000000 AS se2_micro2
       |  FROM st)
       |SELECT event_type, n_a, n_b, did_micro,
       | CASE WHEN se2_micro2 > 0 THEN
       |  CAST(CAST(did_micro AS HUGEINT) * did_micro * 1000 // se2_micro2 AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST(CASE WHEN se2_micro2 > 0 THEN
       |  CAST(CAST(did_micro AS HUGEINT) * did_micro * 1000 // se2_micro2 AS BIGINT)
       | ELSE 0 END >= 3841 AS BIGINT) AS reject
       |FROM se ORDER BY event_type""".stripMargin

  // q304: A/A FALSE-POSITIVE CALIBRATION — the meta-test every
  // experimentation platform runs before trusting any of its gates: on
  // 20 DIFFERENT null splits of the SAME data (seeded md5 arms — no
  // true effect by construction), the q231 z-test must reject ~5% of
  // the time at α = .05; a platform rejecting 20% has a broken
  // randomizer or a dependence its variance formula missed (exactly
  // what q281's jackknife-vs-delta gap prices). Seeds explode row-local
  // (×20 map work, the shuffle still carries only (type, seed) cells —
  // partial-agg'd); the per-split z² is q231's cross-multiplied
  // algebra. Deliverable per type: rejections out of 20 and the
  // false-positive permille.
  private def q304(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .withColumn("succ", expr("IF(CAST(round(value) AS BIGINT) >= 100, 1L, 0L)"))
      .select(col("event_type"), col("user_id"), col("succ"),
        explode(expr("sequence(0L, 19L)")).as("seed"))
      .withColumn("arm", hashBucket(
        concat(col("user_id").cast("string"), lit(":"), col("seed").cast("string")), 2))
      .groupBy("event_type", "seed")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("succ")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("succ")).otherwise(0L)).as("xb"))
      .withColumn("z2_milli", expr(
        """CASE WHEN na > 0 AND nb > 0 AND (xa + xb) > 0 AND (xa + xb) < (na + nb) THEN
          | CAST((CAST(xa AS DECIMAL(38,0)) * nb - CAST(xb AS DECIMAL(38,0)) * na)
          |   * (CAST(xa AS DECIMAL(38,0)) * nb - CAST(xb AS DECIMAL(38,0)) * na)
          |   * (na + nb) * 1000
          |   div (CAST(xa + xb AS DECIMAL(38,0)) * (na + nb - xa - xb) * na * nb)
          |  AS BIGINT)
          |ELSE 0L END""".stripMargin))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_splits"),
        sum(expr("IF(z2_milli >= 3841, 1L, 0L)")).as("n_reject"),
        max("z2_milli").as("max_z2_milli"))
      .withColumn("fp_permille", expr("n_reject * 1000 div n_splits"))
      .orderBy("event_type")
  }

  private val q304Sql =
    """WITH seeded AS (SELECT event_type, user_id,
      |   CASE WHEN CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END AS succ,
      |   unnest(range(0, 20)) AS seed
      |  FROM events),
      |armed AS (SELECT event_type, seed, succ,
      |   ('0x' || substr(md5(user_id::VARCHAR || ':' || seed::VARCHAR), 1, 8))::BIGINT % 2
      |     AS arm
      |  FROM seeded),
      |cells AS (SELECT event_type, seed,
      |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |   CAST(sum(CASE WHEN arm = 0 THEN succ ELSE 0 END) AS BIGINT) AS xa,
      |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |   CAST(sum(CASE WHEN arm = 1 THEN succ ELSE 0 END) AS BIGINT) AS xb
      |  FROM armed GROUP BY 1, 2),
      |z AS (SELECT event_type, seed,
      |   CASE WHEN na > 0 AND nb > 0 AND xa + xb > 0 AND xa + xb < na + nb THEN
      |    CAST((CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na)
      |      * (CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na)
      |      * (na + nb) * 1000
      |      // (CAST(xa + xb AS HUGEINT) * (na + nb - xa - xb) * na * nb) AS BIGINT)
      |   ELSE 0 END AS z2_milli
      |  FROM cells)
      |SELECT event_type, count(*) AS n_splits,
      | CAST(sum(CASE WHEN z2_milli >= 3841 THEN 1 ELSE 0 END) AS BIGINT) AS n_reject,
      | CAST(max(z2_milli) AS BIGINT) AS max_z2_milli,
      | CAST(sum(CASE WHEN z2_milli >= 3841 THEN 1 ELSE 0 END) * 1000
      |   // count(*) AS BIGINT) AS fp_permille
      |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin

  // q305: BINARY-SEGMENTATION CHANGEPOINT LOCALIZATION — q206's CUSUM
  // answers "did the level shift"; binary segmentation answers WHERE,
  // hierarchically: the split t maximizing the between-segment contrast
  // T(t) = (n·L_t − t·S)²/(t(n−t)) (L = prefix sum — the scaled
  // mean-difference statistic, exact integer), then the same argmax
  // recursed once inside each half — the classic top-down multi-
  // changepoint recipe, two levels deep. Everything runs on the
  // day-grain grid (≤ ~30 cells/type after one collapse): the level-1
  // argmax is a window over the ranked grid, the per-type (t₁, L_t₁)
  // scalars broadcast back, and the level-2 scores are row-local algebra
  // on the SAME ranked rows — three bounded windows total, ties broken
  // toward the earliest day. Segments of size < 2 yield no split (0).
  private def q305(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    val wo = Window.partitionBy("event_type").orderBy("day")
    val ranked = daily
      .withColumn("t", row_number().over(wo).cast("long"))
      .withColumn("l", sum("x").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("s", sum("x").over(Window.partitionBy("event_type")))
    val sc1 = ranked.filter(col("t") < col("n"))
      // staged through DECIMAL(38,0): (n·l − t·s)² wraps Long once
      // l ~ 1e9 events/type; DuckDB's window sums are HUGEINT already
      .withColumn("score", expr(
        "CAST(CAST(n * l - t * s AS DECIMAL(38,0)) * (n * l - t * s) div (t * (n - t)) AS BIGINT)"))
    val pick1 = sc1.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("score"), col("t"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("t").as("t1"), col("l").as("l1"),
        col("day").as("split1_day"), col("score").as("score1"))
    val lv2 = ranked.join(broadcast(pick1), Seq("event_type"))
      .withColumn("seg", expr("IF(t <= t1, 'L', 'R')"))
      .withColumn("u", expr("IF(t <= t1, t, t - t1)"))
      .withColumn("m", expr("IF(t <= t1, t1, n - t1)"))
      .withColumn("ls", expr("IF(t <= t1, l, l - l1)"))
      .withColumn("ss", expr("IF(t <= t1, l1, s - l1)"))
      .filter(col("u") < col("m"))
      .withColumn("score2", expr(
        "CAST(CAST(m * ls - u * ss AS DECIMAL(38,0)) * (m * ls - u * ss) div (u * (m - u)) AS BIGINT)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type", "seg").orderBy(desc("score2"), col("t"))))
      .filter(col("rk") === 1)
      .groupBy("event_type")
      .agg(max(when(col("seg") === "L", col("day"))).as("split_left_day"),
        max(when(col("seg") === "L", col("score2"))).as("score_left"),
        max(when(col("seg") === "R", col("day"))).as("split_right_day"),
        max(when(col("seg") === "R", col("score2"))).as("score_right"))
    pick1.join(lv2, Seq("event_type"), "left")
      .select(col("event_type"), col("split1_day"), col("score1"),
        coalesce(col("split_left_day"), lit(0L)).as("split_left_day"),
        coalesce(col("score_left"), lit(0L)).as("score_left"),
        coalesce(col("split_right_day"), lit(0L)).as("split_right_day"),
        coalesce(col("score_right"), lit(0L)).as("score_right"))
      .orderBy("event_type")
  }

  private val q305Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS x FROM events GROUP BY 1, 2),
      |ranked AS (SELECT event_type, day, x,
      |   CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
      |   sum(x) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l,
      |   count(*) OVER (PARTITION BY event_type) AS n,
      |   sum(x) OVER (PARTITION BY event_type) AS s
      |  FROM daily),
      |sc1 AS (SELECT *, (n * l - t * s) * (n * l - t * s) // (t * (n - t)) AS score
      |  FROM ranked WHERE t < n),
      |p1 AS (SELECT event_type, t AS t1, l AS l1, day AS split1_day,
      |   CAST(score AS BIGINT) AS score1
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |     ORDER BY score DESC, t) AS rk FROM sc1) WHERE rk = 1),
      |lv2 AS (SELECT r.event_type,
      |   CASE WHEN r.t <= p.t1 THEN 'L' ELSE 'R' END AS seg, r.day, r.t,
      |   CASE WHEN r.t <= p.t1 THEN r.t ELSE r.t - p.t1 END AS u,
      |   CASE WHEN r.t <= p.t1 THEN p.t1 ELSE r.n - p.t1 END AS m,
      |   CASE WHEN r.t <= p.t1 THEN r.l ELSE r.l - p.l1 END AS ls,
      |   CASE WHEN r.t <= p.t1 THEN p.l1 ELSE r.s - p.l1 END AS ss
      |  FROM ranked r JOIN p1 p ON r.event_type = p.event_type),
      |sc2 AS (SELECT *, (m * ls - u * ss) * (m * ls - u * ss) // (u * (m - u)) AS score2
      |  FROM lv2 WHERE u < m),
      |p2 AS (SELECT event_type, seg, day, CAST(score2 AS BIGINT) AS score2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, seg
      |     ORDER BY score2 DESC, t) AS rk FROM sc2) WHERE rk = 1),
      |ag AS (SELECT event_type,
      |   max(CASE WHEN seg = 'L' THEN day END) AS split_left_day,
      |   max(CASE WHEN seg = 'L' THEN score2 END) AS score_left,
      |   max(CASE WHEN seg = 'R' THEN day END) AS split_right_day,
      |   max(CASE WHEN seg = 'R' THEN score2 END) AS score_right
      |  FROM p2 GROUP BY 1)
      |SELECT p.event_type, CAST(p.split1_day AS BIGINT) AS split1_day, p.score1,
      | CAST(COALESCE(a.split_left_day, 0) AS BIGINT) AS split_left_day,
      | CAST(COALESCE(a.score_left, 0) AS BIGINT) AS score_left,
      | CAST(COALESCE(a.split_right_day, 0) AS BIGINT) AS split_right_day,
      | CAST(COALESCE(a.score_right, 0) AS BIGINT) AS score_right
      |FROM p1 p LEFT JOIN ag a ON p.event_type = a.event_type
      |ORDER BY p.event_type""".stripMargin

  // q306: SAMPLE-RATIO-MISMATCH GUARDRAIL — the single most-run check in
  // industry experimentation (Fabijan et al., KDD'19 "Diagnosing Sample
  // Ratio Mismatch", public): before ANY metric is read, the arm sizes
  // themselves are tested against the designed 50/50 split — a χ²₁ =
  // (n_A − n_B)²/(n_A + n_B) that fails means the assignment or logging
  // pipeline is dropping users asymmetrically and every downstream
  // number is invalid. Run at BOTH grains that can silently diverge:
  // user grain (the randomization unit) and event grain (where logging
  // loss actually bites), each exact integer, flagged at the
  // platform-conventional strict α = .001 (χ²₁ = 10.828 → 10828 milli,
  // declared) so a true SRM trips but benign hash imbalance does not.
  private def q306(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("arm", hashBucket(col("user_id"), 2))
    val users = ev.select("event_type", "user_id", "arm").distinct()
      .groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ua"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("ub"))
    val evts = ev.groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ea"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("eb"))
    users.join(evts, Seq("event_type"))
      .withColumn("srm_user_milli", expr(
        "(ua - ub) * (ua - ub) * 1000 div (ua + ub)"))
      .withColumn("srm_event_milli", expr(
        "(ea - eb) * (ea - eb) * 1000 div (ea + eb)"))
      .select(col("event_type"), col("ua"), col("ub"), col("ea"), col("eb"),
        col("srm_user_milli"), col("srm_event_milli"),
        expr("CAST(srm_user_milli >= 10828 OR srm_event_milli >= 10828 AS BIGINT)")
          .as("srm_flag"))
      .orderBy("event_type")
  }

  private val q306Sql =
    s"""WITH ev AS (SELECT event_type, user_id, ${duckArm(2)} AS arm FROM events),
       |users AS (SELECT event_type,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ua,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ub
       |  FROM (SELECT DISTINCT event_type, user_id, arm FROM ev) GROUP BY 1),
       |evts AS (SELECT event_type,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ea,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS eb
       |  FROM ev GROUP BY 1)
       |SELECT u.event_type, u.ua, u.ub, e.ea, e.eb,
       | (u.ua - u.ub) * (u.ua - u.ub) * 1000 // (u.ua + u.ub) AS srm_user_milli,
       | (e.ea - e.eb) * (e.ea - e.eb) * 1000 // (e.ea + e.eb) AS srm_event_milli,
       | CAST((u.ua - u.ub) * (u.ua - u.ub) * 1000 // (u.ua + u.ub) >= 10828
       |   OR (e.ea - e.eb) * (e.ea - e.eb) * 1000 // (e.ea + e.eb) >= 10828 AS BIGINT)
       |   AS srm_flag
       |FROM users u JOIN evts e ON u.event_type = e.event_type
       |ORDER BY u.event_type""".stripMargin

  // q307: POST-STRATIFIED VARIANCE REDUCTION — CUPED's categorical
  // sibling (the r13 verdict's named gap): when the pre-period covariate
  // is a TIER, not a number, the adjustment is post-stratification
  // (Miratrix et al., JRSS-B 2013, public): estimate the arm gap inside
  // each stratum, recombine with POOLED stratum weights w_h = n_h/n, and
  // the variance Σ w_h²(varA_h/nA_h + varB_h/nB_h) drops by the
  // between-strata share of Var(Y) — same power win as CUPED, no slope
  // estimation, robust to non-linear covariate-metric relationships.
  // Strata here are pre-period ACTIVITY TIERS (morning event count:
  // 0, 1–2, 3–5, 6+ — the hod<12/hod>=12 pre/post convention of
  // q279/q303); a stratum contributes only when BOTH arms have >= 2
  // users in it (the estimator's own degrees-of-freedom requirement,
  // mirrored in the oracle). The deliverable is vr_permille =
  // SE²_strat/SE²_plain over the SAME contributing population — the
  // number an experimenter quotes as "stratification bought X%".
  // Everything exact integer: per-stratum gaps and variance terms
  // staged through DECIMAL(38) micro fixed-point, single truncating
  // division at each stage, identical in both engines. Shape: one
  // (type, user) shuffle, a (type, tier) collapse of <= 4 cells/type,
  // then per-type algebra — the 100 TB cost is one user-grain pass.
  private def q307(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("tier", expr(
        "CASE WHEN pre_n <= 0 THEN 0L WHEN pre_n <= 2 THEN 1L WHEN pre_n <= 5 THEN 2L ELSE 3L END"))
    val dec0 = expr("CAST(0 AS DECIMAL(38,0))")
    val cells = ug.groupBy("event_type", "tier")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 0, expr("CAST(y AS DECIMAL(38,0)) * y")).otherwise(dec0)).as("saa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 1, expr("CAST(y AS DECIMAL(38,0)) * y")).otherwise(dec0)).as("sbb"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("n_h", col("n_a") + col("n_b"))
      .withColumn("gap", expr(
        "CAST(CAST(sb AS DECIMAL(38,0)) * 1000000 div n_b - CAST(sa AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)"))
      .withColumn("u_h", expr(
        """CAST((n_a * saa - CAST(sa AS DECIMAL(38,0)) * sa) * 1000000
          | div (CAST(n_a AS DECIMAL(38,0)) * n_a * (n_a - 1))
          | + (n_b * sbb - CAST(sb AS DECIMAL(38,0)) * sb) * 1000000
          | div (CAST(n_b AS DECIMAL(38,0)) * n_b * (n_b - 1)) AS BIGINT)""".stripMargin))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_strata"), sum("n_h").as("n_users"),
        sum("n_a").as("na"), sum("sa").as("sta"), sum("saa").as("staa"),
        sum("n_b").as("nb"), sum("sb").as("stb"), sum("sbb").as("stbb"),
        sum(expr("CAST(n_h AS DECIMAL(38,0)) * gap")).as("wgap"),
        sum(expr("CAST(n_h AS DECIMAL(38,0)) * n_h * u_h")).as("wu"))
      .withColumn("diff_micro", expr("CAST(wgap div n_users AS BIGINT)"))
      .withColumn("se2_strat_micro2", expr(
        "CAST(wu div (CAST(n_users AS DECIMAL(38,0)) * n_users) AS BIGINT) * 1000000"))
      .withColumn("se2_plain_micro2", expr(
        """CAST((na * staa - CAST(sta AS DECIMAL(38,0)) * sta) * 1000000
          | div (CAST(na AS DECIMAL(38,0)) * na * (na - 1))
          | + (nb * stbb - CAST(stb AS DECIMAL(38,0)) * stb) * 1000000
          | div (CAST(nb AS DECIMAL(38,0)) * nb * (nb - 1)) AS BIGINT) * 1000000""".stripMargin))
      .withColumn("z2_milli", expr(
        """CASE WHEN se2_strat_micro2 > 0 THEN
          | CAST(CAST(diff_micro AS DECIMAL(38,0)) * diff_micro * 1000 div se2_strat_micro2 AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("vr_permille", expr(
        """CASE WHEN se2_plain_micro2 > 0 THEN
          | CAST(CAST(se2_strat_micro2 AS DECIMAL(38,0)) * 1000 div se2_plain_micro2 AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_strata"), col("n_users"),
        col("diff_micro"), col("se2_strat_micro2"), col("se2_plain_micro2"),
        col("z2_milli"), expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"),
        col("vr_permille"))
      .orderBy("event_type")
  }

  private val q307Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |tg AS (SELECT *, CASE WHEN pre_n <= 0 THEN 0 WHEN pre_n <= 2 THEN 1
       |   WHEN pre_n <= 5 THEN 2 ELSE 3 END AS tier FROM ug),
       |cells AS (SELECT event_type, tier,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
       |   sum(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS saa,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb,
       |   sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS sbb
       |  FROM tg GROUP BY 1, 2
       |  HAVING sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 1
       |     AND sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 1),
       |cg AS (SELECT *, n_a + n_b AS n_h,
       |   CAST(sb * 1000000 // n_b - sa * 1000000 // n_a AS BIGINT) AS gap,
       |   CAST((n_a * saa - sa * sa) * 1000000
       |     // (CAST(n_a AS HUGEINT) * n_a * (n_a - 1))
       |     + (n_b * sbb - sb * sb) * 1000000
       |     // (CAST(n_b AS HUGEINT) * n_b * (n_b - 1)) AS BIGINT) AS u_h
       |  FROM cells),
       |ag AS (SELECT event_type, count(*) AS n_strata,
       |   CAST(sum(n_h) AS BIGINT) AS n_users,
       |   CAST(sum(n_a) AS BIGINT) AS na, CAST(sum(sa) AS HUGEINT) AS sta,
       |   sum(saa) AS staa,
       |   CAST(sum(n_b) AS BIGINT) AS nb, CAST(sum(sb) AS HUGEINT) AS stb,
       |   sum(sbb) AS stbb,
       |   sum(CAST(n_h AS HUGEINT) * gap) AS wgap,
       |   sum(CAST(n_h AS HUGEINT) * n_h * u_h) AS wu
       |  FROM cg GROUP BY 1),
       |fin AS (SELECT *,
       |   CAST(wgap // n_users AS BIGINT) AS diff_micro,
       |   CAST(wu // (CAST(n_users AS HUGEINT) * n_users) AS BIGINT) * 1000000
       |     AS se2_strat_micro2,
       |   CAST((na * staa - sta * sta) * 1000000
       |     // (CAST(na AS HUGEINT) * na * (na - 1))
       |     + (nb * stbb - stb * stb) * 1000000
       |     // (CAST(nb AS HUGEINT) * nb * (nb - 1)) AS BIGINT) * 1000000
       |     AS se2_plain_micro2
       |  FROM ag)
       |SELECT event_type, CAST(n_strata AS BIGINT) AS n_strata, n_users,
       | diff_micro, CAST(se2_strat_micro2 AS BIGINT) AS se2_strat_micro2,
       | CAST(se2_plain_micro2 AS BIGINT) AS se2_plain_micro2,
       | CASE WHEN se2_strat_micro2 > 0 THEN
       |  CAST(CAST(diff_micro AS HUGEINT) * diff_micro * 1000
       |    // se2_strat_micro2 AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST(CASE WHEN se2_strat_micro2 > 0 THEN
       |  CAST(CAST(diff_micro AS HUGEINT) * diff_micro * 1000
       |    // se2_strat_micro2 AS BIGINT)
       | ELSE 0 END >= 3841 AS BIGINT) AS reject,
       | CASE WHEN se2_plain_micro2 > 0 THEN
       |  CAST(CAST(se2_strat_micro2 AS HUGEINT) * 1000
       |    // se2_plain_micro2 AS BIGINT)
       | ELSE 0 END AS vr_permille
       |FROM fin ORDER BY event_type""".stripMargin

  // q308: NELSON–AALEN CUMULATIVE HAZARD — the survival/churn readout
  // (time-to-last-activity) in its prefix-SUM form: H(t) = Σ_{s<=t}
  // d_s/n_s (Nelson 1972, Aalen 1978 — textbook-public), which unlike
  // the Kaplan–Meier PRODUCT is exactly computable in staged integer
  // arithmetic with one window (S(t) = exp(−H(t)) is the consumer's
  // one-liner). A user's spell is [first event day, last event day];
  // exits within 2 days of the per-type horizon are CENSORED (still
  // active), contributing exposure but no death. The 100 TB shape is the
  // whole point: at-risk counts come from a DIFFERENCE ARRAY on the day
  // grid (+1 at entry day, −1 after exit day, prefix-summed), so the
  // data pass is ONE user-grain collapse — never a user × day explode —
  // and every window runs on the ≤ ~30-cell calendar grid.
  private def q308(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(min("day").as("e"), max("day").as("x"))
    val dm = ug.groupBy("event_type").agg(max("x").as("dmax"))
    val f = ug.join(broadcast(dm), Seq("event_type"))
      .withColumn("cens", expr("CAST(x >= dmax - 2 AS BIGINT)"))
    val ent = f.groupBy(col("event_type"), col("e").as("day"))
      .agg(count(lit(1)).as("ent"))
    val ext = f.groupBy(col("event_type"), col("x").as("day"))
      .agg(count(lit(1)).as("ext"), sum(expr("1 - cens")).as("deaths"),
        sum("cens").as("censored"))
    val grid = ent.join(ext, Seq("event_type", "day"), "full_outer")
      .na.fill(0L, Seq("ent", "ext", "deaths", "censored"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("n_risk",
        sum("ent").over(wCum) - coalesce(sum("ext").over(wPrev), lit(0L)))
      .withColumn("h_term_micro",
        expr("IF(n_risk > 0, deaths * 1000000 div n_risk, 0L)"))
      .withColumn("h_cum_micro", sum("h_term_micro").over(wCum))
      .select(col("event_type"), col("day"), col("n_risk"), col("deaths"),
        col("censored"), col("h_cum_micro"))
      .orderBy("event_type", "day")
  }

  private val q308Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   min(epoch_us(ts) // 86400000000) AS e,
      |   max(epoch_us(ts) // 86400000000) AS x
      |  FROM events GROUP BY 1, 2),
      |dm AS (SELECT event_type, max(x) AS dmax FROM ug GROUP BY 1),
      |f AS (SELECT u.*, CASE WHEN u.x >= d.dmax - 2 THEN 1 ELSE 0 END AS cens
      |  FROM ug u JOIN dm d ON u.event_type = d.event_type),
      |ent AS (SELECT event_type, e AS day, count(*) AS ent FROM f GROUP BY 1, 2),
      |ext AS (SELECT event_type, x AS day, count(*) AS ext,
      |   CAST(sum(1 - cens) AS BIGINT) AS deaths,
      |   CAST(sum(cens) AS BIGINT) AS censored
      |  FROM f GROUP BY 1, 2),
      |grid AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
      |   coalesce(a.day, b.day) AS day, coalesce(a.ent, 0) AS ent,
      |   coalesce(b.ext, 0) AS ext, coalesce(b.deaths, 0) AS deaths,
      |   coalesce(b.censored, 0) AS censored
      |  FROM ent a FULL OUTER JOIN ext b
      |    ON a.event_type = b.event_type AND a.day = b.day),
      |rk AS (SELECT *,
      |   sum(ent) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   - coalesce(sum(ext) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM grid),
      |ht AS (SELECT *, CASE WHEN n_risk > 0
      |   THEN deaths * 1000000 // n_risk ELSE 0 END AS h_term_micro FROM rk)
      |SELECT event_type, CAST(day AS BIGINT) AS day,
      | CAST(n_risk AS BIGINT) AS n_risk, deaths, censored,
      | CAST(sum(h_term_micro) OVER (PARTITION BY event_type ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |   AS h_cum_micro
      |FROM ht ORDER BY event_type, day""".stripMargin

  // q309: TWO-ARM LOG-RANK TEST — survival's hypothesis test (Mantel
  // 1966, textbook-public), THE A/B readout when the metric is
  // time-to-churn rather than a mean: at each day t the observed arm-A
  // deaths d_At are compared to the hypergeometric expectation
  // d_t·n_At/n_t under "no arm effect", with variance
  // d_t·n_At·n_Bt·(n_t−d_t)/(n_t²(n_t−1)); z² = (O−E)²/V summed over
  // the grid. Reuses q308's difference-array at-risk machinery PER ARM
  // — still one user-grain collapse, still a ≤ ~30-cell grid, every
  // term exact staged integer (milli for E, micro for V, single
  // truncating division each — both engines identical).
  private def q309(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(min("day").as("e"), max("day").as("x"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
    val dm = ug.groupBy("event_type").agg(max("x").as("dmax"))
    val f = ug.join(broadcast(dm), Seq("event_type"))
      .withColumn("cens", expr("CAST(x >= dmax - 2 AS BIGINT)"))
    val ent = f.groupBy(col("event_type"), col("e").as("day"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ent_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("ent_b"))
    val ext = f.groupBy(col("event_type"), col("x").as("day"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ext_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("ext_b"),
        sum(when(col("arm") === 0, expr("1 - cens")).otherwise(0L)).as("d_a"),
        sum(when(col("arm") === 1, expr("1 - cens")).otherwise(0L)).as("d_b"))
    val grid = ent.join(ext, Seq("event_type", "day"), "full_outer")
      .na.fill(0L, Seq("ent_a", "ent_b", "ext_a", "ext_b", "d_a", "d_b"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("n_a",
        sum("ent_a").over(wCum) - coalesce(sum("ext_a").over(wPrev), lit(0L)))
      .withColumn("n_b",
        sum("ent_b").over(wCum) - coalesce(sum("ext_b").over(wPrev), lit(0L)))
      .withColumn("d_t", col("d_a") + col("d_b"))
      .withColumn("n_t", col("n_a") + col("n_b"))
      .withColumn("e_term_milli",
        expr("IF(n_t > 0, d_t * n_a * 1000 div n_t, 0L)"))
      .withColumn("v_term_micro", expr(
        """IF(n_t > 1,
          | CAST(CAST(d_t AS DECIMAL(38,0)) * n_a * n_b * (n_t - d_t) * 1000000
          |   div (CAST(n_t AS DECIMAL(38,0)) * n_t * (n_t - 1)) AS BIGINT), 0L)""".stripMargin))
      .groupBy("event_type")
      .agg(sum("d_a").as("o_a"), sum("d_b").as("o_b"),
        sum("e_term_milli").as("e_a_milli"),
        sum("v_term_micro").as("v_micro"))
      .withColumn("diff_milli", expr("o_a * 1000 - e_a_milli"))
      .withColumn("z2_milli", expr(
        """CASE WHEN v_micro > 0 THEN
          | CAST(CAST(diff_milli AS DECIMAL(38,0)) * diff_milli * 1000 div v_micro AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("o_a"), col("o_b"), col("e_a_milli"),
        col("v_micro"), col("diff_milli"), col("z2_milli"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q309Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   min(epoch_us(ts) // 86400000000) AS e,
       |   max(epoch_us(ts) // 86400000000) AS x,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |dm AS (SELECT event_type, max(x) AS dmax FROM ug GROUP BY 1),
       |f AS (SELECT u.*, CASE WHEN u.x >= d.dmax - 2 THEN 1 ELSE 0 END AS cens
       |  FROM ug u JOIN dm d ON u.event_type = d.event_type),
       |ent AS (SELECT event_type, e AS day,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ent_a,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ent_b
       |  FROM f GROUP BY 1, 2),
       |ext AS (SELECT event_type, x AS day,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ext_a,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ext_b,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 - cens ELSE 0 END) AS BIGINT) AS d_a,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 - cens ELSE 0 END) AS BIGINT) AS d_b
       |  FROM f GROUP BY 1, 2),
       |grid AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
       |   coalesce(a.day, b.day) AS day,
       |   coalesce(a.ent_a, 0) AS ent_a, coalesce(a.ent_b, 0) AS ent_b,
       |   coalesce(b.ext_a, 0) AS ext_a, coalesce(b.ext_b, 0) AS ext_b,
       |   coalesce(b.d_a, 0) AS d_a, coalesce(b.d_b, 0) AS d_b
       |  FROM ent a FULL OUTER JOIN ext b
       |    ON a.event_type = b.event_type AND a.day = b.day),
       |rk AS (SELECT *,
       |   sum(ent_a) OVER (PARTITION BY event_type ORDER BY day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |   - coalesce(sum(ext_a) OVER (PARTITION BY event_type ORDER BY day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_a,
       |   sum(ent_b) OVER (PARTITION BY event_type ORDER BY day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |   - coalesce(sum(ext_b) OVER (PARTITION BY event_type ORDER BY day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_b
       |  FROM grid),
       |tm AS (SELECT *, d_a + d_b AS d_t, n_a + n_b AS n_t FROM rk),
       |terms AS (SELECT *,
       |   CASE WHEN n_t > 0 THEN d_t * n_a * 1000 // n_t ELSE 0 END AS e_term_milli,
       |   CASE WHEN n_t > 1 THEN
       |    CAST(CAST(d_t AS HUGEINT) * n_a * n_b * (n_t - d_t) * 1000000
       |      // (CAST(n_t AS HUGEINT) * n_t * (n_t - 1)) AS BIGINT)
       |   ELSE 0 END AS v_term_micro
       |  FROM tm),
       |ag AS (SELECT event_type,
       |   CAST(sum(d_a) AS BIGINT) AS o_a, CAST(sum(d_b) AS BIGINT) AS o_b,
       |   CAST(sum(e_term_milli) AS BIGINT) AS e_a_milli,
       |   CAST(sum(v_term_micro) AS BIGINT) AS v_micro
       |  FROM terms GROUP BY 1)
       |SELECT event_type, o_a, o_b, e_a_milli, v_micro,
       | o_a * 1000 - e_a_milli AS diff_milli,
       | CASE WHEN v_micro > 0 THEN
       |  CAST(CAST(o_a * 1000 - e_a_milli AS HUGEINT) * (o_a * 1000 - e_a_milli)
       |    * 1000 // v_micro AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST(CASE WHEN v_micro > 0 THEN
       |  CAST(CAST(o_a * 1000 - e_a_milli AS HUGEINT) * (o_a * 1000 - e_a_milli)
       |    * 1000 // v_micro AS BIGINT)
       | ELSE 0 END >= 3841 AS BIGINT) AS reject
       |FROM ag ORDER BY event_type""".stripMargin

  // q310: USER-JOURNEY TRANSITION MATRIX — the first-order Markov view of
  // the event stream (the product-analytics staple the funnel q156 and
  // retention q87 stop short of): P(next = j | current = i) estimated
  // from every adjacent event pair within a user's stream, ordered by
  // (ts, event_id) (event_id breaks timestamp ties — total order, the
  // q21/q67 lesson). The 100 TB shape: ONE window partitioned by
  // user_id (the natural key — per-user streams are bounded, no global
  // sort anywhere), pair counts partial-agg'd onto the |types|² ≤ 25-cell
  // grid, row-normalization as a grid-local window. p_permille rows sum
  // to ≤ 1000 per source type (truncation-only deficit — spec-pinned).
  private def q310(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    val wf = Window.partitionBy("from_type")
    pairs
      .withColumn("from_total", sum("n_pairs").over(wf))
      .withColumn("p_permille", expr("n_pairs * 1000 div from_total"))
      .select(col("from_type"), col("to_type"), col("n_pairs"),
        col("from_total"), col("p_permille"))
      .orderBy("from_type", "to_type")
  }

  private val q310Sql =
    """WITH pairs AS (SELECT event_type AS from_type,
      |   lead(event_type, 1) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (SELECT from_type, to_type, count(*) AS n_pairs
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, CAST(n_pairs AS BIGINT) AS n_pairs,
      | CAST(sum(n_pairs) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
      | CAST(n_pairs * 1000 // sum(n_pairs) OVER (PARTITION BY from_type)
      |   AS BIGINT) AS p_permille
      |FROM cnt ORDER BY from_type, to_type""".stripMargin

  // q311: MARKOV STATIONARY DISTRIBUTION vs EMPIRICAL MIX — is the
  // journey process at equilibrium? Five fixed power-iteration rounds of
  // v ← vP on q310's ≤25-cell matrix, all at METADATA grain (the q241
  // power-iteration discipline: the corpus pass is the one pair count,
  // the iteration is grid algebra): v in micro, P as the exact rational
  // n_pairs/from_total (cross-multiplied per step — no pre-truncated
  // permille compounding), one truncating division per (round, cell).
  // Deliverable per type: stationary_micro vs the empirical event mix
  // and the equilibrium gap — a large gap means the current traffic mix
  // still reflects entry-point skew, not the process's long-run behavior
  // (what a capacity planner should provision for).
  private def q311(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    graft.Caches.persist(pairs)
    val wf = Window.partitionBy("from_type")
    val p = pairs.withColumn("from_total", sum("n_pairs").over(wf))
    val types = p.select(col("from_type").as("t")).distinct()
    val nTypes = types.count()
    // v0 = uniform micro; each step v'_j = Σ_i v_i · n_ij / total_i,
    // staged as (v_i · n_ij) div total_i per cell then summed (exact
    // integers in, one truncation per cell, identical in DuckDB)
    var v = types.select(col("t"), lit(1000000L / nTypes).as("v_micro"))
    for (_ <- 1 to 5) {
      v = v.join(p, v("t") === p("from_type"))
        .groupBy(col("to_type").as("t"))
        .agg(sum(expr("CAST(v_micro AS DECIMAL(38,0)) * n_pairs div from_total"))
          .as("vm"))
        .select(col("t"), expr("CAST(vm AS BIGINT)").as("v_micro"))
    }
    val emp = events(s, d).groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("total", sum("n_events").over(Window.partitionBy()))
      .withColumn("empirical_micro", expr("n_events * 1000000 div total"))
      .select(col("t"), col("n_events"), col("empirical_micro"))
    v.join(emp, Seq("t"))
      .select(col("t").as("event_type"), col("v_micro").as("stationary_micro"),
        col("empirical_micro"),
        expr("abs(v_micro - empirical_micro)").as("gap_micro"))
      .orderBy("event_type")
  }

  private val q311Sql =
    """WITH pairs AS (SELECT event_type AS from_type,
      |   lead(event_type, 1) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (SELECT from_type, to_type, count(*) AS n_pairs
      |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |p AS (SELECT *, sum(n_pairs) OVER (PARTITION BY from_type) AS from_total
      |  FROM cnt),
      |ty AS (SELECT DISTINCT from_type AS t FROM cnt),
      |v0 AS (SELECT t, 1000000 // (SELECT count(*) FROM ty) AS v_micro FROM ty),
      |v1 AS (SELECT p.to_type AS t,
      |   CAST(sum(CAST(v.v_micro AS HUGEINT) * p.n_pairs // p.from_total) AS BIGINT) AS v_micro
      |  FROM v0 v JOIN p ON v.t = p.from_type GROUP BY 1),
      |v2 AS (SELECT p.to_type AS t,
      |   CAST(sum(CAST(v.v_micro AS HUGEINT) * p.n_pairs // p.from_total) AS BIGINT) AS v_micro
      |  FROM v1 v JOIN p ON v.t = p.from_type GROUP BY 1),
      |v3 AS (SELECT p.to_type AS t,
      |   CAST(sum(CAST(v.v_micro AS HUGEINT) * p.n_pairs // p.from_total) AS BIGINT) AS v_micro
      |  FROM v2 v JOIN p ON v.t = p.from_type GROUP BY 1),
      |v4 AS (SELECT p.to_type AS t,
      |   CAST(sum(CAST(v.v_micro AS HUGEINT) * p.n_pairs // p.from_total) AS BIGINT) AS v_micro
      |  FROM v3 v JOIN p ON v.t = p.from_type GROUP BY 1),
      |v5 AS (SELECT p.to_type AS t,
      |   CAST(sum(CAST(v.v_micro AS HUGEINT) * p.n_pairs // p.from_total) AS BIGINT) AS v_micro
      |  FROM v4 v JOIN p ON v.t = p.from_type GROUP BY 1),
      |emp AS (SELECT event_type AS t, count(*) AS n_events,
      |   CAST(count(*) * 1000000 // (SELECT count(*) FROM events) AS BIGINT)
      |     AS empirical_micro
      |  FROM events GROUP BY 1)
      |SELECT e.t AS event_type, v.v_micro AS stationary_micro,
      | e.empirical_micro, abs(v.v_micro - e.empirical_micro) AS gap_micro
      |FROM v5 v JOIN emp e ON v.t = e.t ORDER BY event_type""".stripMargin

  // q312: CONVERSION ATTRIBUTION, FIRST-TOUCH vs LAST-TOUCH — the
  // q310 journey machinery pointed at the question marketing actually
  // asks: when a user converts (event_type = 'purchase'), which
  // event type gets the credit? First-touch credits the user's entry
  // point (first event in the (ts, event_id)-ordered stream), last-touch
  // credits the immediately preceding event ('none' when the conversion
  // opens the stream). The two models' per-channel shares bracket every
  // heuristic in between; a large first-vs-last gap for a channel is the
  // signature of an opener (discovery) vs a closer (intent). Shape: the
  // SAME single user-partitioned window as q310 (lag + running first —
  // no second shuffle), conversions filtered AFTER tagging, two ≤6-cell
  // channel collapses full-outer-merged. Shares in permille of total
  // conversions, staged integer.
  private def q312(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val conv = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("first_type", first("event_type").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("event_type") === "purchase")
      .withColumn("last_touch", coalesce(col("prev_type"), lit("none")))
    graft.Caches.persist(conv)
    val ft = conv.groupBy(col("first_type").as("channel"))
      .agg(count(lit(1)).as("n_first"))
    val lt = conv.groupBy(col("last_touch").as("channel"))
      .agg(count(lit(1)).as("n_last"))
    val tot = Window.partitionBy()
    ft.join(lt, Seq("channel"), "full_outer")
      .na.fill(0L, Seq("n_first", "n_last"))
      .withColumn("n_conv", sum("n_first").over(tot))
      .withColumn("first_permille", expr("n_first * 1000 div n_conv"))
      .withColumn("last_permille", expr("n_last * 1000 div n_conv"))
      .select(col("channel"), col("n_first"), col("n_last"), col("n_conv"),
        col("first_permille"), col("last_permille"),
        expr("n_last - n_first").as("closer_minus_opener"))
      .orderBy("channel")
  }

  private val q312Sql =
    """WITH tagged AS (SELECT event_type,
      |   lag(event_type, 1) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id) AS prev_type,
      |   first_value(event_type) OVER (PARTITION BY user_id
      |     ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
      |  FROM events),
      |conv AS (SELECT first_type, coalesce(prev_type, 'none') AS last_touch
      |  FROM tagged WHERE event_type = 'purchase'),
      |ft AS (SELECT first_type AS channel, count(*) AS n_first FROM conv GROUP BY 1),
      |lt AS (SELECT last_touch AS channel, count(*) AS n_last FROM conv GROUP BY 1),
      |m AS (SELECT coalesce(f.channel, l.channel) AS channel,
      |   coalesce(f.n_first, 0) AS n_first, coalesce(l.n_last, 0) AS n_last
      |  FROM ft f FULL OUTER JOIN lt l ON f.channel = l.channel),
      |t AS (SELECT *, sum(n_first) OVER () AS n_conv FROM m)
      |SELECT channel, CAST(n_first AS BIGINT) AS n_first,
      | CAST(n_last AS BIGINT) AS n_last, CAST(n_conv AS BIGINT) AS n_conv,
      | CAST(n_first * 1000 // n_conv AS BIGINT) AS first_permille,
      | CAST(n_last * 1000 // n_conv AS BIGINT) AS last_permille,
      | CAST(n_last - n_first AS BIGINT) AS closer_minus_opener
      |FROM t ORDER BY channel""".stripMargin

  // q313: UPLIFT BY TARGETING-SCORE DECILE + QINI CURVE — the question
  // AFTER an A/B wins: WHO should get the treatment? Users are ranked by
  // a pre-period targeting score (morning activity, the q307 covariate)
  // under the total order (score DESC, user_id), cut into rank deciles
  // decile = (ordinal−1)·10 div n + 1 (the formula is mirrored verbatim
  // in the oracle — a global ntile would be a single-partition sort, so
  // the rank comes from the two-phase denseOrdinal: per-score-bucket
  // row_number + broadcast bucket offsets, no global window anywhere).
  // Per-decile uplift is the arm gap in conversion (value-sum >= 100,
  // the q300 proxy); the Qini running total Q(k) = convB_cum −
  // convA_cum·nB_cum/nA_cum (Radcliffe's standard increment, public)
  // prices "treat the top k deciles" — monotone-then-flat validates the
  // score as a targeting policy. All staged integer (uplift permille,
  // Qini milli); the only corpus pass is the user-grain collapse —
  // the curve lives on a 10-row grid.
  private def q313(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("score"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("conv", expr("IF(y >= 100, 1L, 0L)"))
    val tot = ug.agg(count(lit(1)).as("n_users"))
    val ranked = ScaleOps.denseOrdinal(ug, expr("-score"), Seq(col("user_id")))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("(ordinal - 1) * 10 div n_users + 1"))
    val cells = ranked.groupBy("decile")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x_b"))
    val wc = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("uplift_permille", expr(
        "IF(n_a > 0 AND n_b > 0, x_b * 1000 div n_b - x_a * 1000 div n_a, 0L)"))
      .withColumn("na_cum", sum("n_a").over(wc))
      .withColumn("xa_cum", sum("x_a").over(wc))
      .withColumn("nb_cum", sum("n_b").over(wc))
      .withColumn("xb_cum", sum("x_b").over(wc))
      .withColumn("qini_milli", expr(
        """IF(na_cum > 0,
          | CAST((CAST(xb_cum AS DECIMAL(38,0)) * na_cum - CAST(xa_cum AS DECIMAL(38,0)) * nb_cum)
          |   * 1000 div na_cum AS BIGINT), 0L)""".stripMargin))
      .select(col("decile"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("uplift_permille"), col("qini_milli"))
      .orderBy("decile")
  }

  private val q313Sql =
    s"""WITH ug AS (SELECT user_id,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS BIGINT) AS score,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1),
       |dg AS (SELECT *, CASE WHEN y >= 100 THEN 1 ELSE 0 END AS conv,
       |   (CAST(row_number() OVER (ORDER BY score DESC, user_id) AS BIGINT) - 1)
       |     * 10 // (SELECT count(*) FROM ug) + 1 AS decile
       |  FROM ug),
       |cells AS (SELECT decile,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |   CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |   CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
       |  FROM dg GROUP BY 1),
       |cum AS (SELECT *,
       |   CASE WHEN n_a > 0 AND n_b > 0
       |     THEN x_b * 1000 // n_b - x_a * 1000 // n_a ELSE 0 END AS uplift_permille,
       |   sum(n_a) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
       |     AND CURRENT ROW) AS na_cum,
       |   sum(x_a) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
       |     AND CURRENT ROW) AS xa_cum,
       |   sum(n_b) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
       |     AND CURRENT ROW) AS nb_cum,
       |   sum(x_b) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
       |     AND CURRENT ROW) AS xb_cum
       |  FROM cells)
       |SELECT decile, n_a, x_a, n_b, x_b,
       | CAST(uplift_permille AS BIGINT) AS uplift_permille,
       | CASE WHEN na_cum > 0 THEN
       |  CAST((CAST(xb_cum AS HUGEINT) * na_cum
       |    - CAST(xa_cum AS HUGEINT) * nb_cum) * 1000 // na_cum AS BIGINT)
       | ELSE 0 END AS qini_milli
       |FROM cum ORDER BY decile""".stripMargin

  // q314: COX PROPORTIONAL-HAZARDS SCORE TEST (β = 0) — does a CONTINUOUS
  // covariate move the churn hazard? The log-rank (q309) compares two
  // arms; the Cox score test at β = 0 (Cox 1972, textbook-public) is its
  // covariate generalization and needs NO iteration when only the test
  // is wanted: U = Σ_deaths (z_i − z̄_risk(t)), V = Σ_t d_t·(n_t−d_t)/
  // (n_t−1) · Var_z(risk(t)), z² = U²/V ~ χ²₁. The covariate here is the
  // user's morning activity count (the q307/q313 score). Everything
  // rides q308's difference-array discipline, widened to MOMENTS: the
  // day grid carries (count, Σz, Σz²) in/out arrays, so the at-risk
  // mean and variance of z at every death day come from prefix sums —
  // one user-grain collapse, no user×day explode, exact staged integer
  // (U in milli, per-day V terms in milli via one DECIMAL(38)
  // cross-multiplied division each).
  private def q314(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(min("day").as("e"), max("day").as("x"),
        sum(when(col("hod") < 12, 1L).otherwise(0L)).as("z"))
    val dm = ug.groupBy("event_type").agg(max("x").as("dmax"))
    val f = ug.join(broadcast(dm), Seq("event_type"))
      .withColumn("cens", expr("CAST(x >= dmax - 2 AS BIGINT)"))
    val ent = f.groupBy(col("event_type"), col("e").as("day"))
      .agg(count(lit(1)).as("c_in"), sum("z").as("z_in"),
        sum(expr("z * z")).as("zz_in"))
    val ext = f.groupBy(col("event_type"), col("x").as("day"))
      .agg(count(lit(1)).as("c_out"), sum("z").as("z_out"),
        sum(expr("z * z")).as("zz_out"),
        sum(expr("1 - cens")).as("d"),
        sum(expr("IF(cens = 0, z, 0L)")).as("dz"))
    val grid = ent.join(ext, Seq("event_type", "day"), "full_outer")
      .na.fill(0L, Seq("c_in", "z_in", "zz_in", "c_out", "z_out", "zz_out", "d", "dz"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    def risk(in: String, out: String) =
      sum(in).over(wCum) - coalesce(sum(out).over(wPrev), lit(0L))
    grid
      .withColumn("n_t", risk("c_in", "c_out"))
      .withColumn("sz_t", risk("z_in", "z_out"))
      .withColumn("szz_t", risk("zz_in", "zz_out"))
      .withColumn("u_term_milli", expr(
        "IF(n_t > 0 AND d > 0, dz * 1000 - d * sz_t * 1000 div n_t, 0L)"))
      .withColumn("v_term_milli", expr(
        """IF(n_t > 1 AND d > 0,
          | CAST(CAST(d AS DECIMAL(38,0)) * (n_t - d)
          |   * (CAST(n_t AS DECIMAL(38,0)) * szz_t - CAST(sz_t AS DECIMAL(38,0)) * sz_t)
          |   * 1000 div (CAST(n_t - 1 AS DECIMAL(38,0)) * n_t * n_t) AS BIGINT), 0L)""".stripMargin))
      .groupBy("event_type")
      .agg(sum("d").as("deaths"), sum("dz").as("deaths_z"),
        sum("u_term_milli").as("u_milli"), sum("v_term_milli").as("v_milli"))
      .withColumn("z2_milli", expr(
        """CASE WHEN v_milli > 0 THEN
          | CAST(CAST(u_milli AS DECIMAL(38,0)) * u_milli div v_milli AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("deaths"), col("deaths_z"),
        col("u_milli"), col("v_milli"), col("z2_milli"),
        expr("CAST(sign(u_milli) AS BIGINT)").as("direction"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q314Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   min(epoch_us(ts) // 86400000000) AS e,
      |   max(epoch_us(ts) // 86400000000) AS x,
      |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS BIGINT) AS z
      |  FROM events GROUP BY 1, 2),
      |dm AS (SELECT event_type, max(x) AS dmax FROM ug GROUP BY 1),
      |f AS (SELECT u.*, CASE WHEN u.x >= d.dmax - 2 THEN 1 ELSE 0 END AS cens
      |  FROM ug u JOIN dm d ON u.event_type = d.event_type),
      |ent AS (SELECT event_type, e AS day, count(*) AS c_in,
      |   CAST(sum(z) AS BIGINT) AS z_in, CAST(sum(z * z) AS BIGINT) AS zz_in
      |  FROM f GROUP BY 1, 2),
      |ext AS (SELECT event_type, x AS day, count(*) AS c_out,
      |   CAST(sum(z) AS BIGINT) AS z_out, CAST(sum(z * z) AS BIGINT) AS zz_out,
      |   CAST(sum(1 - cens) AS BIGINT) AS d,
      |   CAST(sum(CASE WHEN cens = 0 THEN z ELSE 0 END) AS BIGINT) AS dz
      |  FROM f GROUP BY 1, 2),
      |grid AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
      |   coalesce(a.day, b.day) AS day,
      |   coalesce(a.c_in, 0) AS c_in, coalesce(a.z_in, 0) AS z_in,
      |   coalesce(a.zz_in, 0) AS zz_in,
      |   coalesce(b.c_out, 0) AS c_out, coalesce(b.z_out, 0) AS z_out,
      |   coalesce(b.zz_out, 0) AS zz_out,
      |   coalesce(b.d, 0) AS d, coalesce(b.dz, 0) AS dz
      |  FROM ent a FULL OUTER JOIN ext b
      |    ON a.event_type = b.event_type AND a.day = b.day),
      |rk AS (SELECT *,
      |   sum(c_in) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   - coalesce(sum(c_out) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_t,
      |   sum(z_in) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   - coalesce(sum(z_out) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sz_t,
      |   sum(zz_in) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   - coalesce(sum(zz_out) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS szz_t
      |  FROM grid),
      |terms AS (SELECT *,
      |   CASE WHEN n_t > 0 AND d > 0
      |     THEN dz * 1000 - d * sz_t * 1000 // n_t ELSE 0 END AS u_term_milli,
      |   CASE WHEN n_t > 1 AND d > 0 THEN
      |    CAST(CAST(d AS HUGEINT) * (n_t - d)
      |      * (CAST(n_t AS HUGEINT) * szz_t - CAST(sz_t AS HUGEINT) * sz_t)
      |      * 1000 // (CAST(n_t - 1 AS HUGEINT) * n_t * n_t) AS BIGINT)
      |   ELSE 0 END AS v_term_milli
      |  FROM rk),
      |ag AS (SELECT event_type, CAST(sum(d) AS BIGINT) AS deaths,
      |   CAST(sum(dz) AS BIGINT) AS deaths_z,
      |   CAST(sum(u_term_milli) AS BIGINT) AS u_milli,
      |   CAST(sum(v_term_milli) AS BIGINT) AS v_milli
      |  FROM terms GROUP BY 1)
      |SELECT event_type, deaths, deaths_z, u_milli, v_milli,
      | CASE WHEN v_milli > 0 THEN
      |  CAST(CAST(u_milli AS HUGEINT) * u_milli // v_milli AS BIGINT)
      | ELSE 0 END AS z2_milli,
      | CAST(sign(u_milli) AS BIGINT) AS direction,
      | CAST(CASE WHEN v_milli > 0 THEN
      |  CAST(CAST(u_milli AS HUGEINT) * u_milli // v_milli AS BIGINT)
      | ELSE 0 END >= 3841 AS BIGINT) AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q315: RFM SEGMENTATION — the classic customer-value grid (Recency /
  // Frequency / Monetary, direct-marketing canon): per user R = days
  // from last event to the horizon, F = event count, M = value sum;
  // each dimension scored 1–3 by FIXED, data-derived tercile thresholds
  // (exact order statistics at ceil(n/3)/ceil(2n/3), selected through
  // the two-phase denseOrdinal — no global window ever touches the
  // user-grain frame; the oracle states the same thresholds in its
  // equivalent cumulative-window form). Deliverable: the 27-cell
  // segment grid with user counts, total monetary mass, and each
  // segment's monetary share — the "champions vs at-risk" readout.
  // One user-grain collapse + three broadcast threshold joins; the
  // grid is metadata.
  private def q315(s: SparkSession, d: String): DataFrame = {
    // r18 restructure (opt guide §1.2, §2.4): persist the USER-GRAIN
    // COLLAPSE itself, not its crossJoin against the horizon row.
    // Before, `horizon` derived from the UNPERSISTED ug, so its
    // broadcast re-scanned events and re-paid the user-grain shuffle;
    // worse, each threshold frame crossJoined a SECOND broadcast of
    // `horizon.select(n_users)` (a different plan than the full-horizon
    // broadcast — no exchange reuse), putting THREE redundant
    // events-scan+collapse executions in the plan. Now events is
    // scanned once (the ug cache build); horizon is a 1-row agg over
    // the cache; base derives lazily from the cache; and the threshold
    // frames read n_users off base's own rows (the oracle's
    // any_value(n_users) form, stated in q315Sql all along) instead of
    // re-broadcasting the horizon.
    val ug = graft.Caches.persist(events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("v", expr("CAST(round(value) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(max("day").as("last_day"), count(lit(1)).as("f"), sum("v").as("m")))
    val horizon = ug.agg(max("last_day").as("h"), count(lit(1)).as("n_users"))
    val base = ug.crossJoin(broadcast(horizon))
      .withColumn("r", col("h") - col("last_day"))
    // tercile thresholds = exact order statistics: t1 is the dim value of
    // the ceil(n/3)-th user under (dim ASC, user_id), t2 at ceil(2n/3) —
    // equivalently the first value whose cumulative count crosses n/3
    // (the oracle's window form). Selection is the two-phase denseOrdinal
    // with a COARSE 1024-granule bucket key, so no global window touches
    // the user-grain frame even though M's distinct domain is user-grain
    // at corpus scale (R and F are calendar/count-bounded anyway). R is
    // scored on recency ASC (small R = more recent = better), inverted
    // to the conventional 3-is-best at the end.
    // R (calendar days) and F (per-user event count) have BOUNDED
    // distinct domains, so their thresholds come from a tiny value-grain
    // cumulative (the oracle's form verbatim); only M — whose distinct
    // domain is user-grain at corpus scale — pays the two-phase
    // denseOrdinal ranking. Both selections pick the identical order
    // statistic (first value whose cumulative count reaches ceil(n/3)).
    def thresholds(dim: String, bounded: Boolean): DataFrame = {
      val th =
        if (bounded) {
          val wv = Window.orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          base.groupBy(col(dim).as("val"))
            .agg(count(lit(1)).as("c"), max("n_users").as("n_users"))
            .withColumn("cum", sum("c").over(wv))
            .agg(min(when(expr("cum * 3 >= n_users"), col("val"))).as(s"${dim}t1"),
              min(when(expr("cum * 3 >= 2 * n_users"), col("val"))).as(s"${dim}t2"))
        } else {
          ScaleOps.denseOrdinal(
            base.select(col("user_id"), col(dim), col("n_users")),
            expr(s"$dim div 1024"), Seq(col(dim), col("user_id")))
            .filter(expr("ordinal = (n_users + 2) div 3 OR ordinal = (2 * n_users + 2) div 3"))
            .agg(min(when(expr("ordinal = (n_users + 2) div 3"), col(dim))).as(s"${dim}t1"),
              min(when(expr("ordinal = (2 * n_users + 2) div 3"), col(dim))).as(s"${dim}t2"))
        }
      broadcast(th)
    }
    // all three 1-row threshold frames broadcast into ONE scoring pass
    // over the cached base — no user_id join anywhere (a three-way
    // user-grain join form and this one measured within box noise of
    // each other at sf0.1; this form's plan carries no user-grain
    // exchange beyond the base collapse, which is the shape that
    // matters at 1000x)
    val seg = base
      .crossJoin(thresholds("r", bounded = true))
      .crossJoin(thresholds("f", bounded = true))
      .crossJoin(thresholds("m", bounded = false))
      .withColumn("r_score", expr(
        "4 - CASE WHEN r <= rt1 THEN 1L WHEN r <= rt2 THEN 2L ELSE 3L END"))
      .withColumn("f_score", expr(
        "CASE WHEN f <= ft1 THEN 1L WHEN f <= ft2 THEN 2L ELSE 3L END"))
      .withColumn("m_score", expr(
        "CASE WHEN m <= mt1 THEN 1L WHEN m <= mt2 THEN 2L ELSE 3L END"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users_seg"), sum("m").as("m_total"))
    val tot = seg.agg(sum("m_total").as("m_all"))
    seg.crossJoin(broadcast(tot))
      .withColumn("m_share_permille", expr(
        "IF(m_all > 0, m_total * 1000 div m_all, 0L)"))
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("n_users_seg"), col("m_total"), col("m_share_permille"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val q315Sql =
    """WITH ug AS (SELECT user_id,
      |   max(epoch_us(ts) // 86400000000) AS last_day,
      |   count(*) AS f,
      |   CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS m
      |  FROM events GROUP BY 1),
      |hz AS (SELECT max(last_day) AS h, count(*) AS n_users FROM ug),
      |base AS (SELECT u.*, z.h - u.last_day AS r, z.n_users
      |  FROM ug u CROSS JOIN hz z),
      |rth AS (SELECT min(CASE WHEN cum * 3 >= n_users THEN val END) AS t1,
      |   min(CASE WHEN cum * 3 >= 2 * n_users THEN val END) AS t2 FROM (
      |   SELECT r AS val, any_value(n_users) AS n_users,
      |    sum(count(*)) OVER (ORDER BY r
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |   FROM base GROUP BY r)),
      |fth AS (SELECT min(CASE WHEN cum * 3 >= n_users THEN val END) AS t1,
      |   min(CASE WHEN cum * 3 >= 2 * n_users THEN val END) AS t2 FROM (
      |   SELECT f AS val, any_value(n_users) AS n_users,
      |    sum(count(*)) OVER (ORDER BY f
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |   FROM base GROUP BY f)),
      |mth AS (SELECT min(CASE WHEN cum * 3 >= n_users THEN val END) AS t1,
      |   min(CASE WHEN cum * 3 >= 2 * n_users THEN val END) AS t2 FROM (
      |   SELECT m AS val, any_value(n_users) AS n_users,
      |    sum(count(*)) OVER (ORDER BY m
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |   FROM base GROUP BY m)),
      |sc AS (SELECT b.user_id, b.m,
      |   4 - (CASE WHEN b.r <= r1.t1 THEN 1 WHEN b.r <= r1.t2 THEN 2 ELSE 3 END) AS r_score,
      |   CASE WHEN b.f <= f1.t1 THEN 1 WHEN b.f <= f1.t2 THEN 2 ELSE 3 END AS f_score,
      |   CASE WHEN b.m <= m1.t1 THEN 1 WHEN b.m <= m1.t2 THEN 2 ELSE 3 END AS m_score
      |  FROM base b CROSS JOIN rth r1 CROSS JOIN fth f1 CROSS JOIN mth m1),
      |seg AS (SELECT r_score, f_score, m_score, count(*) AS n_users_seg,
      |   CAST(sum(m) AS BIGINT) AS m_total
      |  FROM sc GROUP BY 1, 2, 3),
      |tt AS (SELECT sum(m_total) AS m_all FROM seg)
      |SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      | CAST(m_score AS BIGINT) AS m_score,
      | CAST(n_users_seg AS BIGINT) AS n_users_seg, m_total,
      | CAST(CASE WHEN m_all > 0 THEN m_total * 1000 // m_all ELSE 0 END AS BIGINT)
      |   AS m_share_permille
      |FROM seg CROSS JOIN tt ORDER BY r_score, f_score, m_score""".stripMargin

  // q316: TWO-SAMPLE CRAMÉR–VON MISES — the QUADRATIC-weight member of
  // the distribution-distance triad (q217 KS takes the supremum gap,
  // q291 W1 the L1 area; CvM integrates the SQUARED gap, so it is the
  // most sensitive of the three to broad mid-distribution shifts and
  // the least to a single extreme quantile). Same comparison frame as
  // q291 (morning vs afternoon values per event_type) for family
  // coherence. Anderson's two-sample form collapses EXACTLY to the
  // value grain: T = Σ_v (a_v + b_v)·(A_v·n₂ − B_v·n₁)² /
  // (n₁·n₂·(n₁+n₂)²) with A/B the cumulative counts — one bounded
  // cumulative window over the centi-value domain, one DECIMAL(38)
  // division per type, reject at the asymptotic .05 critical value
  // 0.461 (461 milli, declared).
  private def q316(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("a"),
        sum(when(col("hod") >= 12, 1L).otherwise(0L)).as("b"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("event_type")
    vg.withColumn("ca", sum("a").over(w))
      .withColumn("cb", sum("b").over(w))
      .withColumn("na", sum("a").over(wt))
      .withColumn("nb", sum("b").over(wt))
      .withColumn("dd", expr(
        "CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na"))
      .groupBy("event_type")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        sum(expr("CAST(a + b AS DECIMAL(38,0)) * dd * dd")).as("num"))
      .withColumn("t_milli", expr(
        """CASE WHEN n_a > 0 AND n_b > 0 THEN
          | CAST(num * 1000 div (CAST(n_a AS DECIMAL(38,0)) * n_b
          |   * (n_a + n_b) * (n_a + n_b)) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("n_a"), col("n_b"), col("t_milli"),
        expr("CAST(t_milli >= 461 AS BIGINT)").as("reject"))
      .orderBy("event_type")
  }

  private val q316Sql =
    """WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
      |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     THEN 1 ELSE 0 END) AS BIGINT) AS b
      |  FROM events GROUP BY 1, 2),
      |cm AS (SELECT *,
      |   sum(a) OVER (PARTITION BY event_type ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |   sum(b) OVER (PARTITION BY event_type ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
      |   sum(a) OVER (PARTITION BY event_type) AS na,
      |   sum(b) OVER (PARTITION BY event_type) AS nb
      |  FROM vg),
      |ag AS (SELECT event_type,
      |   CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
      |   sum(CAST(a + b AS HUGEINT)
      |     * (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
      |     * (CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS num
      |  FROM cm GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      | CASE WHEN n_a > 0 AND n_b > 0 THEN
      |  CAST(num * 1000 // (CAST(n_a AS HUGEINT) * n_b
      |    * (n_a + n_b) * (n_a + n_b)) AS BIGINT)
      | ELSE 0 END AS t_milli,
      | CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
      |  CAST(num * 1000 // (CAST(n_a AS HUGEINT) * n_b
      |    * (n_a + n_b) * (n_a + n_b)) AS BIGINT)
      | ELSE 0 END >= 461 AS BIGINT) AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q329: COVARIATE BALANCE AUDIT (STANDARDIZED MEAN DIFFERENCE) — the
  // pre-analysis check the rest of the A/B stack assumes and never
  // verifies: q306 SRM tests arm SIZES; this tests whether the arms are
  // comparable on PRE-treatment covariates, via the standardized mean
  // difference |SMD| = |x̄_A − x̄_B| / √((s²_A + s²_B)/2), gated at the
  // epidemiology-conventional 0.1 (Austin 2009) — squared and
  // cross-multiplied: smd²_milli < 10. Three user-grain covariates per
  // event type (morning events, total events, active days — the q307
  // tier features), unpivoted with stack so one collapse feeds all
  // three. Staging discipline (the q327 rule): means in milli and
  // variances in raw units each come from ONE bounded-quotient
  // division; the ratio is one DECIMAL(38) cross-multiplication. 100 TB
  // shape: ONE (type, user) partial-agg collapse; moments on the
  // ≤ types×2-arm grid; stack is grid-local.
  private def q329(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c2"),
        countDistinct("day").as("c3"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
    val arms = ug.groupBy("event_type", "arm")
      .agg(count(lit(1)).as("n"),
        sum("c1").as("sx1"), sum(expr("CAST(c1 AS DECIMAL(38,0)) * c1")).as("sxx1"),
        sum("c2").as("sx2"), sum(expr("CAST(c2 AS DECIMAL(38,0)) * c2")).as("sxx2"),
        sum("c3").as("sx3"), sum(expr("CAST(c3 AS DECIMAL(38,0)) * c3")).as("sxx3"))
    def mv(i: Int): (String, String) = (
      s"CAST(CAST(sx$i AS DECIMAL(38,0)) * 1000 div n AS BIGINT)",
      s"""CASE WHEN n > 1 THEN
         | CAST((n * sxx$i - CAST(sx$i AS DECIMAL(38,0)) * sx$i)
         |   div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)
         |ELSE 0L END""".stripMargin)
    val long = arms.select(
      col("event_type"), col("arm"), col("n"),
      expr(s"stack(3, 'morning_events', ${mv(1)._1}, ${mv(1)._2}," +
        s" 'total_events', ${mv(2)._1}, ${mv(2)._2}," +
        s" 'active_days', ${mv(3)._1}, ${mv(3)._2}) AS (covariate, m_milli, v_raw)"))
    val a0 = long.filter(col("arm") === 0)
      .select(col("event_type"), col("covariate"), col("n").as("n_a"),
        col("m_milli").as("ma"), col("v_raw").as("va"))
    val a1 = long.filter(col("arm") === 1)
      .select(col("event_type"), col("covariate"), col("n").as("n_b"),
        col("m_milli").as("mb"), col("v_raw").as("vb"))
    a0.join(a1, Seq("event_type", "covariate"))
      .withColumn("smd_sign", expr("CAST(sign(ma - mb) AS BIGINT)"))
      .withColumn("smd2_milli", expr(
        """CASE WHEN va + vb > 0 THEN
          | CAST(CAST(ma - mb AS DECIMAL(38,0)) * (ma - mb) * 2
          |   div (CAST(va + vb AS DECIMAL(38,0)) * 1000000) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("covariate"), col("n_a"), col("n_b"),
        col("smd_sign"), col("smd2_milli"),
        expr("CAST(smd2_milli < 10 AS BIGINT)").as("balanced"))
      .orderBy("event_type", "covariate")
  }

  private val q329Sql = {
    def mv(i: Int) = (
      s"CAST(CAST(sx$i AS HUGEINT) * 1000 // n AS BIGINT)",
      s"CASE WHEN n > 1 THEN CAST((n * sxx$i - CAST(sx$i AS HUGEINT) * sx$i)" +
        s" // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) ELSE 0 END")
    s"""WITH ug AS (SELECT event_type, user_id,
       |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS c1,
       |   count(*) AS c2,
       |   count(DISTINCT epoch_us(ts) // 86400000000) AS c3,
       |   ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS arm
       |  FROM events GROUP BY 1, 2),
       |arms AS (SELECT event_type, arm, count(*) AS n,
       |   sum(c1) AS sx1, sum(CAST(c1 AS HUGEINT) * c1) AS sxx1,
       |   sum(c2) AS sx2, sum(CAST(c2 AS HUGEINT) * c2) AS sxx2,
       |   sum(c3) AS sx3, sum(CAST(c3 AS HUGEINT) * c3) AS sxx3
       |  FROM ug GROUP BY 1, 2),
       |long AS (
       |  SELECT event_type, arm, n, 'morning_events' AS covariate,
       |    ${mv(1)._1} AS m_milli, ${mv(1)._2} AS v_raw FROM arms
       |  UNION ALL
       |  SELECT event_type, arm, n, 'total_events',
       |    ${mv(2)._1}, ${mv(2)._2} FROM arms
       |  UNION ALL
       |  SELECT event_type, arm, n, 'active_days',
       |    ${mv(3)._1}, ${mv(3)._2} FROM arms),
       |j AS (SELECT a.event_type, a.covariate,
       |   a.n AS n_a, b.n AS n_b, a.m_milli AS ma, b.m_milli AS mb,
       |   a.v_raw AS va, b.v_raw AS vb
       |  FROM long a JOIN long b
       |   ON a.event_type = b.event_type AND a.covariate = b.covariate
       |    AND a.arm = 0 AND b.arm = 1)
       |SELECT event_type, covariate,
       | CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | CAST(sign(ma - mb) AS BIGINT) AS smd_sign,
       | CASE WHEN va + vb > 0 THEN
       |  CAST(CAST(ma - mb AS HUGEINT) * (ma - mb) * 2
       |    // (CAST(va + vb AS HUGEINT) * 1000000) AS BIGINT)
       | ELSE 0 END AS smd2_milli,
       | CAST((CASE WHEN va + vb > 0 THEN
       |  CAST(CAST(ma - mb AS HUGEINT) * (ma - mb) * 2
       |    // (CAST(va + vb AS HUGEINT) * 1000000) AS BIGINT)
       | ELSE 0 END) < 10 AS BIGINT) AS balanced
       |FROM j ORDER BY event_type, covariate""".stripMargin
  }

  // q340: KRUSKAL–WALLIS k-SAMPLE RANK TEST — the k-group member of the
  // rank family (q280 Mann–Whitney is 2-sample; ANOVA-style mean tests
  // are outlier-fragile on the heavy-tailed `value`): does the value
  // DISTRIBUTION differ across the five event types AT ALL, as one
  // χ²_{k−1} decision. Same 100 TB shape as q280 — ranks collapse to
  // VALUE grain (pooled doubled midranks 2·cum + cnt + 1 via one
  // cumulative window over the bounded centi-value domain), groups meet
  // the rank grid through a value-grain broadcast join, never a row-level
  // sort. Staging (the q327 quotient rule): the group rank-sum D_i is
  // divided to its bounded mean m2_i = D_i div n_i FIRST, and
  // Σ R_i²/n_i is rebuilt as Σ n_i·m2_i²/4 (raw D_i² is corpus⁴-sized);
  // tie correction 1 − Σ(t³−t)/(n³−n) exact in milli (the q280
  // DECIMAL(38) posture — n³ holds through sf1 and beyond to ~10¹² rows).
  private def q340(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "v")
      .agg(count(lit(1)).as("c"))
    val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    // value-grain grid (≤ |centi domain| rows) — the stated bounded-domain
    // single-partition window posture of q280
    val vals = vg.groupBy("v").agg(sum("c").as("cnt"))
      .withColumn("cum", coalesce(sum("cnt").over(wv), lit(0L)))
      .withColumn("mr2", expr("2 * cum + cnt + 1"))
    val grp = vg.join(broadcast(vals.select("v", "mr2")), "v")
      .groupBy("event_type")
      .agg(sum("c").as("n_i"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * mr2")).as("d_i"))
      .withColumn("m2_i", expr("d_i div n_i"))
    val ties = vals.agg(
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("ties"))
    grp.agg(count(lit(1)).as("k_groups"), sum("n_i").as("n"),
      sum(expr("CAST(n_i AS DECIMAL(38,0)) * m2_i * m2_i")).as("ssum"))
      .crossJoin(broadcast(ties))
      .withColumn("h_milli", expr(
        """3000 * ssum div (CAST(n AS DECIMAL(38,0)) * (n + 1))
          | - 3000 * (n + 1)""".stripMargin))
      .withColumn("corr_milli", expr(
        """CASE WHEN n > 1 THEN
          | 1000 - ties * 1000 div (CAST(n AS DECIMAL(38,0)) * n * n - n)
          |ELSE 0L END""".stripMargin))
      .withColumn("h_adj_milli", expr(
        "CASE WHEN corr_milli > 0 THEN h_milli * 1000 div corr_milli ELSE 0L END"))
      .withColumn("crit_milli", expr(
        """CASE k_groups - 1 WHEN 1 THEN 3841L WHEN 2 THEN 5991L
          | WHEN 3 THEN 7815L WHEN 4 THEN 9488L WHEN 5 THEN 11070L
          | WHEN 6 THEN 12592L ELSE 14067L END""".stripMargin))
      .withColumn("reject", expr("CAST(h_adj_milli >= crit_milli AS BIGINT)"))
      .select(col("n"), col("k_groups"), col("h_milli"), col("corr_milli"),
        col("h_adj_milli"), col("crit_milli"), col("reject"))
  }

  private val q340Sql =
    """WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
      |   count(*) AS c FROM events GROUP BY 1, 2),
      |vals AS (SELECT v, sum(c) AS cnt FROM vg GROUP BY 1),
      |mrk AS (SELECT v, cnt,
      |   2 * COALESCE(sum(cnt) OVER (ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS mr2
      |  FROM vals),
      |grp AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_i,
      |   sum(CAST(c AS HUGEINT) * mr2) AS d_i
      |  FROM vg JOIN mrk USING (v) GROUP BY 1),
      |g2 AS (SELECT event_type, n_i, d_i // n_i AS m2_i FROM grp),
      |tt AS (SELECT sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
      |  FROM vals),
      |ag AS (SELECT count(*) AS k_groups, CAST(sum(n_i) AS BIGINT) AS n,
      |   sum(CAST(n_i AS HUGEINT) * m2_i * m2_i) AS ssum FROM g2),
      |h AS (SELECT k_groups, n, ties,
      |   CAST(3000 * ssum // (CAST(n AS HUGEINT) * (n + 1))
      |     - 3000 * (n + 1) AS BIGINT) AS h_milli,
      |   CASE WHEN n > 1 THEN CAST(1000 - ties * 1000
      |     // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT) ELSE 0
      |   END AS corr_milli
      |  FROM ag CROSS JOIN tt),
      |h2 AS (SELECT *, CASE WHEN corr_milli > 0
      |   THEN h_milli * 1000 // corr_milli ELSE 0 END AS h_adj_milli,
      |   CASE k_groups - 1 WHEN 1 THEN 3841 WHEN 2 THEN 5991
      |    WHEN 3 THEN 7815 WHEN 4 THEN 9488 WHEN 5 THEN 11070
      |    WHEN 6 THEN 12592 ELSE 14067 END AS crit_milli
      |  FROM h)
      |SELECT n, CAST(k_groups AS BIGINT) AS k_groups, h_milli, corr_milli,
      | h_adj_milli, crit_milli,
      | CAST(h_adj_milli >= crit_milli AS BIGINT) AS reject
      |FROM h2""".stripMargin

  // q341: BROWN–FORSYTHE VARIANCE-EQUALITY TEST — the assumption gate
  // under every pooled-variance readout (q231's z, q303's DiD, q307's
  // strata all pool across groups; none checks the groups' SPREADS are
  // even comparable): one-way ANOVA F on the absolute deviations from
  // each group's MEDIAN (Brown & Forsythe 1974 — the median variant is
  // the robust one; Levene's mean variant inherits the outliers the test
  // is about). Medians are exact lower-median order statistics on the
  // bounded centi-value grid (the q331 cumulative idiom, windowed so the
  // grid is built ONCE — no second scan), z = |v − med| is grid-local,
  // and the F numerator/denominator are rebuilt at the q327 mean grain:
  // mz_i = Sz_i div n_i (bounded by the value domain), SSW_i = Szz_i −
  // n_i·mz_i² (nonnegative: truncation only lowers the subtrahend),
  // SSB_i = n_i·(mz_i − mz_pool)², one cross-multiplied milli division.
  // F(k−1, ∞) .05 criticals declared as a milli ladder (χ²_df/df).
  private def q341(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "v")
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("event_type")
    val grp = vg
      .withColumn("cum", sum("c").over(wc))
      .withColumn("nw", sum("c").over(wt))
      .withColumn("med", min(when(expr("cum * 2 >= nw"), col("v"))).over(wt))
      .withColumn("z", expr("abs(v - med)"))
      .groupBy("event_type")
      .agg(sum("c").as("n_i"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * z")).as("sz"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * z * z")).as("szz"))
      .withColumn("mz_i", expr("sz div n_i"))
      .withColumn("ssw_i", expr("szz - CAST(n_i AS DECIMAL(38,0)) * mz_i * mz_i"))
    val tot = grp.agg(sum("n_i").as("n"), sum("sz").as("szt"),
      count(lit(1)).as("k_groups"))
      .withColumn("mz_pool", expr("szt div n"))
    grp.crossJoin(broadcast(tot))
      .groupBy("n", "k_groups", "mz_pool")
      .agg(sum("ssw_i").as("ssw"),
        sum(expr("CAST(n_i AS DECIMAL(38,0)) * (mz_i - mz_pool) * (mz_i - mz_pool)"))
          .as("ssb"),
        max("mz_i").as("mad_max_centi"), min("mz_i").as("mad_min_centi"))
      .withColumn("f_milli", expr(
        """CASE WHEN ssw > 0 AND n > k_groups AND k_groups > 1 THEN
          | CAST(ssb * (n - k_groups) * 1000
          |   div (ssw * (k_groups - 1)) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("crit_milli", expr(
        """CASE k_groups - 1 WHEN 1 THEN 3841L WHEN 2 THEN 2996L
          | WHEN 3 THEN 2605L WHEN 4 THEN 2372L WHEN 5 THEN 2214L
          | WHEN 6 THEN 2099L ELSE 2010L END""".stripMargin))
      .withColumn("reject", expr("CAST(f_milli >= crit_milli AS BIGINT)"))
      .select(col("n"), col("k_groups"), col("mad_min_centi"),
        col("mad_max_centi"), col("f_milli"), col("crit_milli"), col("reject"))
  }

  private val q341Sql =
    """WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
      |   count(*) AS c FROM events GROUP BY 1, 2),
      |md AS (SELECT event_type, v, c,
      |   sum(c) OVER (PARTITION BY event_type ORDER BY v
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   sum(c) OVER (PARTITION BY event_type) AS nw
      |  FROM vg),
      |mz AS (SELECT event_type, v, c,
      |   min(CASE WHEN cum * 2 >= nw THEN v END)
      |     OVER (PARTITION BY event_type) AS med
      |  FROM md),
      |grp AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_i,
      |   sum(CAST(c AS HUGEINT) * abs(v - med)) AS sz,
      |   sum(CAST(c AS HUGEINT) * abs(v - med) * abs(v - med)) AS szz
      |  FROM mz GROUP BY 1),
      |g2 AS (SELECT event_type, n_i, sz // n_i AS mz_i,
      |   szz - CAST(n_i AS HUGEINT) * (sz // n_i) * (sz // n_i) AS ssw_i
      |  FROM grp),
      |tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, count(*) AS k_groups,
      |   sum(sz) // sum(n_i) AS mz_pool
      |  FROM grp),
      |ag AS (SELECT n, k_groups, mz_pool, sum(ssw_i) AS ssw,
      |   sum(CAST(n_i AS HUGEINT) * (mz_i - mz_pool) * (mz_i - mz_pool)) AS ssb,
      |   max(mz_i) AS mad_max_centi, min(mz_i) AS mad_min_centi
      |  FROM g2 CROSS JOIN tot GROUP BY 1, 2, 3),
      |f AS (SELECT *, CASE WHEN ssw > 0 AND n > k_groups AND k_groups > 1
      |   THEN CAST(ssb * (n - k_groups) * 1000
      |     // (ssw * (k_groups - 1)) AS BIGINT) ELSE 0 END AS f_milli,
      |   CASE k_groups - 1 WHEN 1 THEN 3841 WHEN 2 THEN 2996
      |    WHEN 3 THEN 2605 WHEN 4 THEN 2372 WHEN 5 THEN 2214
      |    WHEN 6 THEN 2099 ELSE 2010 END AS crit_milli
      |  FROM ag)
      |SELECT n, CAST(k_groups AS BIGINT) AS k_groups,
      | CAST(mad_min_centi AS BIGINT) AS mad_min_centi,
      | CAST(mad_max_centi AS BIGINT) AS mad_max_centi,
      | f_milli, crit_milli,
      | CAST(f_milli >= crit_milli AS BIGINT) AS reject
      |FROM f""".stripMargin

  // q342: McNEMAR PAIRED-PROPORTION TEST — the WITHIN-USER member of the
  // proportion family (q191/q231 compare two INDEPENDENT arms; here each
  // user is their own control): did a user's engagement with a given
  // event type CHANGE between the pre and post windows (hod < 12 vs
  // ≥ 12, the q279/q303 convention)? Only the DISCORDANT users carry
  // information — b (pre only) vs c (post only) — and the
  // continuity-corrected χ²₁ = (|b−c|−1)²/(b+c) is exact integer in one
  // milli division. Concordant cells are reported for the denominator
  // read. ONE (type, user) partial-agg collapse is the only corpus-scale
  // shuffle (users absent from a type form the uninformative (0,0) cell
  // and never materialize — the difference-array discipline of q308).
  private def q342(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(max(when(col("hod") < 12, 1L).otherwise(0L)).as("pre"),
        max(when(col("hod") >= 12, 1L).otherwise(0L)).as("post"))
      .groupBy("event_type")
      .agg(sum(expr("CAST(pre = 1 AND post = 1 AS BIGINT)")).as("n_both"),
        sum(expr("CAST(pre = 1 AND post = 0 AS BIGINT)")).as("b_pre_only"),
        sum(expr("CAST(pre = 0 AND post = 1 AS BIGINT)")).as("c_post_only"))
      .withColumn("z2_milli", expr(
        """CASE WHEN b_pre_only + c_post_only > 0 THEN
          | (abs(b_pre_only - c_post_only) - 1)
          |  * (abs(b_pre_only - c_post_only) - 1) * 1000
          |  div (b_pre_only + c_post_only)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_both"), col("b_pre_only"),
        col("c_post_only"), col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q342Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS pre,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     THEN 1 ELSE 0 END) AS post
      |  FROM events GROUP BY 1, 2),
      |ag AS (SELECT event_type,
      |   CAST(sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
      |     AS BIGINT) AS n_both,
      |   CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
      |     AS BIGINT) AS b_pre_only,
      |   CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
      |     AS BIGINT) AS c_post_only
      |  FROM ug GROUP BY 1)
      |SELECT event_type, n_both, b_pre_only, c_post_only,
      | CASE WHEN b_pre_only + c_post_only > 0 THEN
      |  (abs(b_pre_only - c_post_only) - 1)
      |   * (abs(b_pre_only - c_post_only) - 1) * 1000
      |   // (b_pre_only + c_post_only) ELSE 0 END AS z2_milli,
      | CAST((CASE WHEN b_pre_only + c_post_only > 0 THEN
      |  (abs(b_pre_only - c_post_only) - 1)
      |   * (abs(b_pre_only - c_post_only) - 1) * 1000
      |   // (b_pre_only + c_post_only) ELSE 0 END) >= 3841 AS BIGINT)
      |  AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q346: COCHRAN–MANTEL–HAENSZEL STRATIFIED 2×2 TEST — the BINARY-
  // outcome member of the stratification family (q307 post-stratifies a
  // CONTINUOUS metric's variance; q282 detects Simpson reversal but
  // renders no verdict; CMH is the decision: is there an arm effect on
  // CONVERSION after pooling out the strata that q282 shows can flip the
  // sign). Frame: per event type, outcome = the user produced a POST-
  // window event of that type (hod ≥ 12), strata = q307's exact
  // pre-period activity tiers (0 / 1–2 / 3–5 / 6+ morning events), arms
  // = the platform md5 bucket. Per stratum the hypergeometric
  // E_h = n1·m1/T in exact micro; Var_h = m1·(n1/T)(n2/T)(m0/(T−1))
  // staged as a product of BOUNDED milli ratios (the q327 rule — the
  // raw 4-way product is corpus⁴-sized); the units make the final
  // division self-milli: z²·1000 = (Σ(a·10⁶−E_micro))² div Σ(v·10⁹).
  // ONE (type,user) collapse; everything after lives on the ≤4-cell
  // stratum grid.
  private def q346(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        max(when(col("hod") >= 12, 1L).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("tier", expr(
        "CASE WHEN pre_n <= 0 THEN 0L WHEN pre_n <= 2 THEN 1L WHEN pre_n <= 5 THEN 2L ELSE 3L END"))
    val cells = ug.groupBy("event_type", "tier")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("a"),
        sum("y").as("m1"))
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("m0", expr("t - m1"))
      .filter(col("t") > 1)
      .withColumn("e_micro", expr(
        "CAST(CAST(n1 AS DECIMAL(38,0)) * m1 * 1000000 div t AS BIGINT)"))
      .withColumn("v9", expr(
        """CAST(m1 AS DECIMAL(38,0)) * (n1 * 1000 div t)
          | * (n2 * 1000 div t) * (m0 * 1000 div (t - 1))""".stripMargin))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_strata"), sum("a").as("conv_a"),
        sum("m1").as("conv_total"),
        sum(expr("a * 1000000 - e_micro")).as("dnum_micro"),
        sum("v9").as("v9sum"))
      .withColumn("z2_milli", expr(
        """CASE WHEN v9sum > 0 THEN
          | CAST(CAST(dnum_micro AS DECIMAL(38,0)) * dnum_micro div v9sum
          |   AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_strata"), col("conv_a"),
        col("conv_total"), col("dnum_micro"), col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q346Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS pre_n,
       |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN 1 ELSE 0 END) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |tg AS (SELECT event_type,
       |   CASE WHEN pre_n <= 0 THEN 0 WHEN pre_n <= 2 THEN 1
       |    WHEN pre_n <= 5 THEN 2 ELSE 3 END AS tier,
       |   arm, y FROM ug),
       |cells AS (SELECT event_type, tier,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS a,
       |   CAST(sum(y) AS BIGINT) AS m1
       |  FROM tg GROUP BY 1, 2),
       |st AS (SELECT event_type, tier, n1, n2, a, m1,
       |   n1 + n2 AS t, n1 + n2 - m1 AS m0 FROM cells
       |  WHERE n1 + n2 > 1),
       |ev AS (SELECT event_type, a,  m1,
       |   CAST(CAST(n1 AS HUGEINT) * m1 * 1000000 // t AS BIGINT) AS e_micro,
       |   CAST(m1 AS HUGEINT) * (n1 * 1000 // t)
       |    * (n2 * 1000 // t) * (m0 * 1000 // (t - 1)) AS v9
       |  FROM st),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_strata,
       |   CAST(sum(a) AS BIGINT) AS conv_a,
       |   CAST(sum(m1) AS BIGINT) AS conv_total,
       |   CAST(sum(a * 1000000 - e_micro) AS BIGINT) AS dnum_micro,
       |   sum(v9) AS v9sum
       |  FROM ev GROUP BY 1)
       |SELECT event_type, n_strata, conv_a, conv_total, dnum_micro,
       | CASE WHEN v9sum > 0 THEN
       |  CAST(CAST(dnum_micro AS HUGEINT) * dnum_micro // v9sum AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST((CASE WHEN v9sum > 0 THEN
       |  CAST(CAST(dnum_micro AS HUGEINT) * dnum_micro // v9sum AS BIGINT)
       | ELSE 0 END) >= 3841 AS BIGINT) AS reject
       |FROM ag ORDER BY event_type""".stripMargin

  // q349: EXPOSURE-ADJUSTED RATE-RATIO TEST (conditional binomial) — the
  // EVENT-RATE member of the arm-comparison family: q231 compares
  // USER-grain proportions and q306 tests arm SIZES, but an ops question
  // ("does arm B throw errors at a higher rate per event?") conditions
  // on EXPOSURE — arms see different event volumes, so raw counts
  // mislead exactly when SRM is present. Conditional on the type's total
  // K, the arm-A count is Binomial(K, w) with w = expA/(expA+expB) the
  // arm-A exposure share; exact ppm staging: z²·1000 =
  // (a·10⁶ − K·w_ppm)²·1000 div (K·w_ppm·(10⁶−w_ppm)) — the 10¹²
  // factors cancel by construction (numerator and variance both ride
  // micro²), DECIMAL(38) through sf1 and beyond (the q280 posture).
  // ONE (type, arm) partial-agg grid; exposures are grid-local sums.
  private def q349(s: SparkSession, d: String): DataFrame = {
    val grid = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .groupBy("event_type", "arm")
      .agg(count(lit(1)).as("c"))
    val expo = grid.groupBy("arm").agg(sum("c").as("exp"))
      .agg(sum(when(col("arm") === 0, col("exp")).otherwise(0L)).as("exp_a"),
        sum("exp").as("exp_all"))
      .withColumn("w_ppm", expr("exp_a * 1000000 div exp_all"))
    grid.groupBy("event_type")
      .agg(sum("c").as("k_events"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("a_arm0"))
      .crossJoin(broadcast(expo))
      .withColumn("dnum", expr(
        "CAST(a_arm0 AS DECIMAL(38,0)) * 1000000 - CAST(k_events AS DECIMAL(38,0)) * w_ppm"))
      .withColumn("gap_sign", expr("CAST(sign(dnum) AS BIGINT)"))
      .withColumn("z2_milli", expr(
        """CASE WHEN k_events > 0 AND w_ppm > 0 AND w_ppm < 1000000 THEN
          | CAST(dnum * dnum * 1000
          |   div (CAST(k_events AS DECIMAL(38,0)) * w_ppm
          |        * (1000000 - w_ppm)) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("k_events"), col("a_arm0"),
        col("w_ppm"), col("gap_sign"), col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q349Sql =
    s"""WITH grid AS (SELECT event_type, ${duckArm(2)} AS arm, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |ex AS (SELECT
       |   CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS exp_a,
       |   CAST(sum(c) AS BIGINT) AS exp_all
       |  FROM grid),
       |w AS (SELECT exp_a, exp_all, exp_a * 1000000 // exp_all AS w_ppm
       |  FROM ex),
       |tg AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS k_events,
       |   CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS a_arm0
       |  FROM grid GROUP BY 1),
       |st AS (SELECT event_type, k_events, a_arm0, w_ppm,
       |   CAST(a_arm0 AS HUGEINT) * 1000000
       |     - CAST(k_events AS HUGEINT) * w_ppm AS dnum
       |  FROM tg CROSS JOIN w)
       |SELECT event_type, k_events, a_arm0, w_ppm,
       | CAST(sign(dnum) AS BIGINT) AS gap_sign,
       | CASE WHEN k_events > 0 AND w_ppm > 0 AND w_ppm < 1000000 THEN
       |  CAST(dnum * dnum * 1000
       |    // (CAST(k_events AS HUGEINT) * w_ppm * (1000000 - w_ppm))
       |   AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST((CASE WHEN k_events > 0 AND w_ppm > 0 AND w_ppm < 1000000 THEN
       |  CAST(dnum * dnum * 1000
       |    // (CAST(k_events AS HUGEINT) * w_ppm * (1000000 - w_ppm))
       |   AS BIGINT)
       | ELSE 0 END) >= 3841 AS BIGINT) AS reject
       |FROM st ORDER BY event_type""".stripMargin

  // q351: STANDARDIZED EFFECT SIZE (Cohen's d / Hedges' g) — the number
  // the verdict family never states: q231/q280/q346 answer IS there an
  // arm effect; a launch review asks HOW BIG in units a reader can
  // carry across metrics. d² = gap²/s²_pool with the pooled variance
  // ((nA−1)s²A+(nB−1)s²B)/(n−2), user-grain value sums per arm, means
  // and variances at the q327 truncated-mean grain (SSW nonneg by the
  // q341 argument); Hedges' small-sample correction J = 1 − 3/(4df−1)
  // applied as a squared milli factor. The SQUARE is reported with the
  // gap sign separate (the q302 convention — no sqrt crosses an engine
  // boundary), classed on the declared Cohen ladder d=.2/.5/.8 ⇒
  // d²_milli 40/250/640. ONE (type,user) collapse, 2-cell arm grid.
  private def q351(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum("v").as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
    val dec0 = expr("CAST(0 AS DECIMAL(38,0))")
    ug.groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 0, expr("CAST(y AS DECIMAL(38,0)) * y"))
          .otherwise(dec0)).as("saa"),
        sum(when(col("arm") === 1, expr("CAST(y AS DECIMAL(38,0)) * y"))
          .otherwise(dec0)).as("sbb"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("ma", expr("sa div n_a"))
      .withColumn("mb", expr("sb div n_b"))
      .withColumn("ssa", expr("saa - CAST(n_a AS DECIMAL(38,0)) * ma * ma"))
      .withColumn("ssb", expr("sbb - CAST(n_b AS DECIMAL(38,0)) * mb * mb"))
      .withColumn("s2_pool", expr("(ssa + ssb) div (n_a + n_b - 2)"))
      .withColumn("gap_sign", expr("CAST(sign(mb - ma) AS BIGINT)"))
      .withColumn("d2_milli", expr(
        """CASE WHEN s2_pool > 0 THEN
          | CAST((mb - ma) * (mb - ma) * 1000 div s2_pool AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("j_milli", expr("1000 - 3000 div (4 * (n_a + n_b - 2) - 1)"))
      .withColumn("g2_milli", expr(
        "d2_milli * j_milli * j_milli div 1000000"))
      .withColumn("magnitude", expr(
        """CASE WHEN g2_milli >= 640 THEN 'large'
          | WHEN g2_milli >= 250 THEN 'medium'
          | WHEN g2_milli >= 40 THEN 'small'
          | ELSE 'negligible' END""".stripMargin))
      .select(col("event_type"), col("n_a"), col("n_b"), col("gap_sign"),
        col("d2_milli"), col("g2_milli"), col("magnitude"))
      .orderBy("event_type")
  }

  private val q351Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |ag AS (SELECT event_type,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
       |   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb,
       |   sum(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS saa,
       |   sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS sbb
       |  FROM ug GROUP BY 1),
       |f AS (SELECT * FROM ag WHERE n_a > 1 AND n_b > 1),
       |m AS (SELECT event_type, n_a, n_b,
       |   sa // n_a AS ma, sb // n_b AS mb,
       |   saa - CAST(n_a AS HUGEINT) * (sa // n_a) * (sa // n_a) AS ssa,
       |   sbb - CAST(n_b AS HUGEINT) * (sb // n_b) * (sb // n_b) AS ssb
       |  FROM f),
       |s2 AS (SELECT *, (ssa + ssb) // (n_a + n_b - 2) AS s2_pool FROM m),
       |dd AS (SELECT event_type, n_a, n_b,
       |   CAST(sign(mb - ma) AS BIGINT) AS gap_sign,
       |   CASE WHEN s2_pool > 0 THEN
       |    CAST((mb - ma) * (mb - ma) * 1000 // s2_pool AS BIGINT)
       |   ELSE 0 END AS d2_milli,
       |   1000 - 3000 // (4 * (n_a + n_b - 2) - 1) AS j_milli
       |  FROM s2),
       |g AS (SELECT *, d2_milli * j_milli * j_milli // 1000000 AS g2_milli
       |  FROM dd)
       |SELECT event_type, n_a, n_b, gap_sign, d2_milli, g2_milli,
       | CASE WHEN g2_milli >= 640 THEN 'large'
       |  WHEN g2_milli >= 250 THEN 'medium'
       |  WHEN g2_milli >= 40 THEN 'small'
       |  ELSE 'negligible' END AS magnitude
       |FROM g ORDER BY event_type""".stripMargin

  // q353: TUKEY HSD POST-HOC PAIRWISE COMPARISONS — the step AFTER an
  // omnibus rejection (q340 says "SOME type differs"; a catalog owner
  // needs WHICH PAIRS, and running C(5,2) naive t-tests re-opens the
  // q278 multiplicity hole the omnibus closed): the studentized-range
  // HSD tests every pair at a family-wise α=.05 with the Tukey–Kramer
  // unequal-n form gap² ≥ q²·s²(nᵢ+nⱼ)/(2nᵢnⱼ). Exact staging: group
  // means at milli-centi grain, MS_within from centi-grain truncated
  // means (nonneg by the q341 argument), the test fully cross-multiplied
  // (gap_mc²·2nᵢnⱼ ≥ q²₁₀₆·s²·(nᵢ+nⱼ)); q²(k,∞)·10⁶ declared as a
  // k-ladder (published studentized-range table). ONE (type, value)
  // collapse (the q341 grid) → C(k,2) ≤ 10 pair rows, all grid-local.
  private def q353(s: SparkSession, d: String): DataFrame = {
    val grp = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_i"), sum("v").as("s_i"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("szz"))
      .withColumn("m_c", expr("s_i div n_i"))
      .withColumn("ssw_i", expr("szz - CAST(n_i AS DECIMAL(38,0)) * m_c * m_c"))
      .withColumn("m_mc", expr("CAST(s_i AS DECIMAL(38,0)) * 1000 div n_i"))
    val tot = grp.agg(sum("n_i").as("n"), count(lit(1)).as("k_groups"),
      sum("ssw_i").as("ssw"))
      .withColumn("s2_c", expr(
        "CASE WHEN n > k_groups THEN CAST(ssw div (n - k_groups) AS BIGINT) ELSE 0L END"))
      .withColumn("q2_e6", expr(
        """CASE k_groups WHEN 2 THEN 7684000L WHEN 3 THEN 10983000L
          | WHEN 4 THEN 13199000L WHEN 5 THEN 14884000L
          | WHEN 6 THEN 16241000L ELSE 17389000L END""".stripMargin))
    val g = grp.select(col("event_type"), col("n_i"), col("m_mc"))
    g.alias("a").join(g.alias("b"),
        col("a.event_type") < col("b.event_type"))
      .crossJoin(broadcast(tot))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.n_i").as("n_a"), col("b.n_i").as("n_b"),
        expr("CAST(sign(CAST(b.m_mc AS DECIMAL(38,0)) - a.m_mc) AS BIGINT)")
          .as("gap_sign"),
        expr("CAST(abs(CAST(b.m_mc AS DECIMAL(38,0)) - a.m_mc) AS BIGINT)")
          .as("gap_mc"),
        expr(
          """CAST((CAST(b.m_mc AS DECIMAL(38,0)) - a.m_mc)
            | * (CAST(b.m_mc AS DECIMAL(38,0)) - a.m_mc)
            | * 2 * a.n_i * b.n_i
            | >= CAST(q2_e6 AS DECIMAL(38,0)) * s2_c * (a.n_i + b.n_i)
            | AS BIGINT)""".stripMargin).as("significant"))
      .orderBy("type_a", "type_b")
  }

  private val q353Sql =
    """WITH grp AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
      |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s_i,
      |   sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |       * CAST(round(value * 100) AS BIGINT)) AS szz
      |  FROM events GROUP BY 1),
      |g2 AS (SELECT event_type, n_i,
      |   szz - CAST(n_i AS HUGEINT) * (s_i // n_i) * (s_i // n_i) AS ssw_i,
      |   s_i * 1000 // n_i AS m_mc
      |  FROM grp),
      |tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, count(*) AS k_groups,
      |   sum(ssw_i) AS ssw FROM g2),
      |t2 AS (SELECT *, CASE WHEN n > k_groups
      |   THEN CAST(ssw // (n - k_groups) AS BIGINT) ELSE 0 END AS s2_c,
      |   CASE k_groups WHEN 2 THEN 7684000 WHEN 3 THEN 10983000
      |    WHEN 4 THEN 13199000 WHEN 5 THEN 14884000
      |    WHEN 6 THEN 16241000 ELSE 17389000 END AS q2_e6
      |  FROM tot)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      | a.n_i AS n_a, b.n_i AS n_b,
      | CAST(sign(b.m_mc - a.m_mc) AS BIGINT) AS gap_sign,
      | CAST(abs(b.m_mc - a.m_mc) AS BIGINT) AS gap_mc,
      | CAST((b.m_mc - a.m_mc) * (b.m_mc - a.m_mc) * 2 * a.n_i * b.n_i
      |   >= CAST(q2_e6 AS HUGEINT) * s2_c * (a.n_i + b.n_i) AS BIGINT)
      |  AS significant
      |FROM g2 a JOIN g2 b ON a.event_type < b.event_type CROSS JOIN t2
      |ORDER BY type_a, type_b""".stripMargin

  // q354: SEEDED RE-RANDOMIZATION TEST — the DISTRIBUTION-FREE p-value
  // the parametric gates assume away (q231/q351 leas on normal/pooled-
  // variance approximations; a permutation-style reference needs no
  // model): the observed arm gap is ranked against 20 md5-seeded
  // re-randomizations of the SAME users (the q304 machinery pointed at
  // INFERENCE instead of calibration — each seed is a valid null
  // assignment by construction, so p = #{T²_seed ≥ T²_obs}/20 at 50‰
  // granularity). Statistic = squared user-mean gap in micro, exactly
  // staged per split; seeds explode ROW-LOCALLY (×21 map work, the
  // shuffle carries only (type, seed) cells). ONE (type,user) collapse
  // then the seeded grid.
  private def q354(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum("v").as("y"))
    // seed -1 = the REAL platform assignment; 0..19 = null re-draws
    val seeded = ug
      .select(col("event_type"), col("user_id"), col("y"),
        explode(expr("sequence(-1L, 19L)")).as("seed"))
      .withColumn("arm", when(col("seed") === -1L,
        hashBucket(col("user_id"), 2))
        .otherwise(hashBucket(
          concat(col("user_id").cast("string"), lit(":"),
            col("seed").cast("string")), 2)))
      .groupBy("event_type", "seed")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sb"))
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("t_micro", expr(
        """CAST(sa AS DECIMAL(38,0)) * 1000000 div na
          | - CAST(sb AS DECIMAL(38,0)) * 1000000 div nb""".stripMargin))
      .withColumn("t2", expr(
        "CAST(t_micro AS DECIMAL(38,0)) * t_micro"))
    val obs = seeded.filter(col("seed") === -1L)
      .select(col("event_type"), col("t2").as("t2_obs"),
        col("t_micro").as("t_obs_micro"))
    seeded.filter(col("seed") >= 0L)
      .join(broadcast(obs), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_perm"),
        sum(expr("IF(t2 >= t2_obs, 1L, 0L)")).as("n_ge"),
        max(expr("CAST(t_obs_micro AS BIGINT)")).as("t_obs_micro"))
      .withColumn("p_permille", expr("n_ge * 1000 div n_perm"))
      .withColumn("reject", expr("CAST(p_permille < 50 AS BIGINT)"))
      .select(col("event_type"), col("t_obs_micro"), col("n_perm"),
        col("n_ge"), col("p_permille"), col("reject"))
      .orderBy("event_type")
  }

  private val q354Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |seeded AS (SELECT event_type, user_id, y, seed,
       |   CASE WHEN seed = -1 THEN ${duckArm(2)}
       |    ELSE ('0x' || substr(md5(user_id::VARCHAR || ':' || seed::VARCHAR),
       |      1, 8))::BIGINT % 2 END AS arm
       |  FROM ug CROSS JOIN (SELECT unnest(range(-1, 20)) AS seed)),
       |cells AS (SELECT event_type, seed,
       |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
       |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb
       |  FROM seeded GROUP BY 1, 2),
       |ts AS (SELECT event_type, seed,
       |   sa * 1000000 // na - sb * 1000000 // nb AS t_micro
       |  FROM cells WHERE na > 0 AND nb > 0),
       |t2 AS (SELECT event_type, seed, t_micro,
       |   CAST(t_micro AS HUGEINT) * t_micro AS t2 FROM ts),
       |obs AS (SELECT event_type, t2 AS t2_obs, t_micro AS t_obs_micro
       |  FROM t2 WHERE seed = -1),
       |ag AS (SELECT p.event_type, CAST(count(*) AS BIGINT) AS n_perm,
       |   CAST(sum(CASE WHEN p.t2 >= o.t2_obs THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_ge,
       |   CAST(max(o.t_obs_micro) AS BIGINT) AS t_obs_micro
       |  FROM t2 p JOIN obs o ON p.event_type = o.event_type
       |  WHERE p.seed >= 0 GROUP BY 1)
       |SELECT event_type, t_obs_micro, n_perm, n_ge,
       | n_ge * 1000 // n_perm AS p_permille,
       | CAST(n_ge * 1000 // n_perm < 50 AS BIGINT) AS reject
       |FROM ag ORDER BY event_type""".stripMargin

  // q355: DISPERSION-CORRECTED RATE TEST (quasi-Poisson) — the
  // composition the control pack sets up and nothing executes: q333
  // MEASURES daily overdispersion (VMR > 1), q349 runs the event-rate
  // gate ASSUMING independent events — on bursty traffic (every real
  // stream) the naive z² is inflated by exactly the dispersion factor
  // φ (Wedderburn 1974 quasi-likelihood: Var = φ·μ, so z²_corr =
  // z²/φ̂). φ̂ = the q333 VMR of the type's own daily series, floored
  // at 1000 milli (underdispersion never tightens the gate — declared
  // conservative); the deliverable is the naive-vs-corrected verdict
  // pair — how many "significant" rates survive the burstiness they
  // were measured under. Same two grids as its parents; one broadcast
  // join between them.
  private def q355(s: SparkSession, d: String): DataFrame = {
    val grid = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy("event_type", "day", "arm")
      .agg(count(lit(1)).as("c"))
    val expo = grid.groupBy("arm").agg(sum("c").as("exp"))
      .agg(sum(when(col("arm") === 0, col("exp")).otherwise(0L)).as("exp_a"),
        sum("exp").as("exp_all"))
      .withColumn("w_ppm", expr("exp_a * 1000000 div exp_all"))
    val naive = grid.groupBy("event_type")
      .agg(sum("c").as("k_events"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("a_arm0"))
      .crossJoin(broadcast(expo))
      .withColumn("dnum", expr(
        "CAST(a_arm0 AS DECIMAL(38,0)) * 1000000 - CAST(k_events AS DECIMAL(38,0)) * w_ppm"))
      .withColumn("z2_naive", expr(
        """CASE WHEN k_events > 0 AND w_ppm > 0 AND w_ppm < 1000000 THEN
          | CAST(dnum * dnum * 1000
          |   div (CAST(k_events AS DECIMAL(38,0)) * w_ppm
          |        * (1000000 - w_ppm)) AS BIGINT)
          |ELSE 0L END""".stripMargin))
    val wt = Window.partitionBy("event_type")
    val vmr = grid.groupBy("event_type", "day").agg(sum("c").as("y"))
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("sy", sum("y").over(wt))
      .withColumn("dd", expr("CAST(n AS DECIMAL(38,0)) * y - sy"))
      .groupBy("event_type")
      .agg(max("n").as("n_days"), max("sy").as("s"),
        sum(expr("dd * dd")).as("sd2"))
      .withColumn("vmr_milli", expr(
        """CASE WHEN n_days > 1 AND s > 0 THEN
          | CAST(sd2 * 1000 div (CAST(n_days AS DECIMAL(38,0)) * (n_days - 1) * s)
          |  AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select(col("event_type"), col("vmr_milli"))
    naive.join(broadcast(vmr), "event_type")
      .withColumn("phi_milli", expr(
        "CASE WHEN vmr_milli > 1000 THEN vmr_milli ELSE 1000L END"))
      .withColumn("z2_corr", expr("z2_naive * 1000 div phi_milli"))
      .select(col("event_type"), col("k_events"), col("z2_naive"),
        col("vmr_milli"), col("phi_milli"), col("z2_corr"),
        expr("CAST(z2_naive >= 3841 AS BIGINT)").as("reject_naive"),
        expr("CAST(z2_corr >= 3841 AS BIGINT)").as("reject_corr"))
      .orderBy("event_type")
  }

  private val q355Sql =
    s"""WITH grid AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |   ${duckArm(2)} AS arm, count(*) AS c
       |  FROM events GROUP BY 1, 2, 3),
       |ex AS (SELECT
       |   CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS exp_a,
       |   CAST(sum(c) AS BIGINT) AS exp_all FROM grid),
       |w AS (SELECT exp_a * 1000000 // exp_all AS w_ppm FROM ex),
       |tg AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS k_events,
       |   CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS a_arm0
       |  FROM grid GROUP BY 1),
       |nv AS (SELECT event_type, k_events,
       |   CASE WHEN k_events > 0 AND w_ppm > 0 AND w_ppm < 1000000 THEN
       |    CAST((CAST(a_arm0 AS HUGEINT) * 1000000
       |        - CAST(k_events AS HUGEINT) * w_ppm)
       |      * (CAST(a_arm0 AS HUGEINT) * 1000000
       |        - CAST(k_events AS HUGEINT) * w_ppm) * 1000
       |      // (CAST(k_events AS HUGEINT) * w_ppm * (1000000 - w_ppm))
       |     AS BIGINT)
       |   ELSE 0 END AS z2_naive
       |  FROM tg CROSS JOIN w),
       |daily AS (SELECT event_type, day, sum(c) AS y FROM grid GROUP BY 1, 2),
       |dev AS (SELECT event_type,
       |   CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) * y
       |     - sum(y) OVER (PARTITION BY event_type) AS dd,
       |   count(*) OVER (PARTITION BY event_type) AS n,
       |   sum(y) OVER (PARTITION BY event_type) AS s
       |  FROM daily),
       |vm AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
       |   CAST(max(s) AS BIGINT) AS s, sum(dd * dd) AS sd2
       |  FROM dev GROUP BY 1),
       |vr AS (SELECT event_type,
       |   CASE WHEN n_days > 1 AND s > 0 THEN
       |    CAST(sd2 * 1000 // (CAST(n_days AS HUGEINT) * (n_days - 1) * s)
       |     AS BIGINT)
       |   ELSE 0 END AS vmr_milli
       |  FROM vm),
       |j AS (SELECT nv.event_type, k_events, z2_naive, vmr_milli,
       |   CASE WHEN vmr_milli > 1000 THEN vmr_milli ELSE 1000 END AS phi_milli
       |  FROM nv JOIN vr ON nv.event_type = vr.event_type)
       |SELECT event_type, k_events, z2_naive, vmr_milli, phi_milli,
       | z2_naive * 1000 // phi_milli AS z2_corr,
       | CAST(z2_naive >= 3841 AS BIGINT) AS reject_naive,
       | CAST(z2_naive * 1000 // phi_milli >= 3841 AS BIGINT) AS reject_corr
       |FROM j ORDER BY event_type""".stripMargin

  // q356: KAPLAN–MEIER PRODUCT-LIMIT + RMST — the estimator q308
  // deliberately deferred: B269 chose Nelson–Aalen because H(t) is a
  // SUM (exactly computable in one window) while KM's S(t) is a
  // PRODUCT. The q343/q348 fold pattern closes that gap: the survival
  // curve is one truncating step per grid day (s ← s·(n−d) div n in
  // ppm, Spark `aggregate` over the sorted day grid / DuckDB recursive
  // CTE, step-identical). Deliverables per type: final S, MEDIAN
  // survival day (first S ≤ 500000 — the number a churn review quotes),
  // and the RESTRICTED MEAN SURVIVAL TIME (area under the step curve in
  // ppm·days — the estimand modern survival practice prefers to hazard
  // ratios when proportionality is doubtful). Same spell frame and
  // difference-array risk sets as q308; everything past the user-grain
  // collapse is grid-local.
  private def q356(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(min("day").as("e"), max("day").as("x"))
    val dm = ug.groupBy("event_type").agg(max("x").as("dmax"))
    val f = ug.join(broadcast(dm), Seq("event_type"))
      .withColumn("cens", expr("CAST(x >= dmax - 2 AS BIGINT)"))
    val ent = f.groupBy(col("event_type"), col("e").as("day"))
      .agg(count(lit(1)).as("ent"))
    val ext = f.groupBy(col("event_type"), col("x").as("day"))
      .agg(count(lit(1)).as("ext"), sum(expr("1 - cens")).as("deaths"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val grid = ent.join(ext, Seq("event_type", "day"), "full_outer")
      .na.fill(0L, Seq("ent", "ext", "deaths"))
      .withColumn("n_risk",
        sum("ent").over(wCum) - coalesce(sum("ext").over(wPrev), lit(0L)))
    grid.groupBy("event_type")
      .agg(sum("ent").as("n_users"), sum("deaths").as("n_deaths"),
        sort_array(collect_list(struct(col("day"), col("n_risk"),
          col("deaths")))).as("arr"))
      .withColumn("fin", expr(
        """aggregate(arr,
          |  named_struct('pd', -1L, 's', 1000000L, 'rmst', 0L, 'med', -1L),
          |  (acc, e) -> named_struct(
          |    'pd', e.day,
          |    's', CASE WHEN e.n_risk > 0
          |      THEN acc.s * (e.n_risk - e.deaths) div e.n_risk
          |      ELSE acc.s END,
          |    'rmst', acc.rmst + CASE WHEN acc.pd >= 0L
          |      THEN acc.s * (e.day - acc.pd) ELSE 0L END,
          |    'med', CASE WHEN acc.med >= 0L THEN acc.med
          |      WHEN (CASE WHEN e.n_risk > 0
          |        THEN acc.s * (e.n_risk - e.deaths) div e.n_risk
          |        ELSE acc.s END) <= 500000L THEN e.day
          |      ELSE -1L END),
          |  acc -> acc)""".stripMargin))
      .select(col("event_type"), col("n_users"), col("n_deaths"),
        col("fin.s").as("s_final_ppm"),
        col("fin.rmst").as("rmst_ppm_days"),
        col("fin.med").as("median_day"))
      .orderBy("event_type")
  }

  private val q356Sql =
    """WITH RECURSIVE ug AS (SELECT event_type, user_id,
      |   min(epoch_us(ts) // 86400000000) AS e,
      |   max(epoch_us(ts) // 86400000000) AS x
      |  FROM events GROUP BY 1, 2),
      |dm AS (SELECT event_type, max(x) AS dmax FROM ug GROUP BY 1),
      |f AS (SELECT u.*, CASE WHEN u.x >= d.dmax - 2 THEN 1 ELSE 0 END AS cens
      |  FROM ug u JOIN dm d ON u.event_type = d.event_type),
      |ent AS (SELECT event_type, e AS day, count(*) AS ent FROM f GROUP BY 1, 2),
      |ext AS (SELECT event_type, x AS day, count(*) AS ext,
      |   CAST(sum(1 - cens) AS BIGINT) AS deaths FROM f GROUP BY 1, 2),
      |grid AS (SELECT event_type, day,
      |   coalesce(ent, 0) AS ent, coalesce(ext, 0) AS ext,
      |   coalesce(deaths, 0) AS deaths
      |  FROM ent FULL OUTER JOIN ext USING (event_type, day)),
      |rk AS (SELECT event_type, day, ent, deaths,
      |   CAST(sum(ent) OVER (PARTITION BY event_type ORDER BY day
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - coalesce(sum(ext) OVER (PARTITION BY event_type ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS n_risk,
      |   row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      |  FROM grid),
      |km AS (
      | SELECT event_type, t, day AS pd,
      |   CASE WHEN n_risk > 0
      |    THEN 1000000 * (n_risk - deaths) // n_risk ELSE 1000000 END AS s,
      |   CAST(0 AS BIGINT) AS rmst,
      |   CASE WHEN n_risk > 0
      |     AND 1000000 * (n_risk - deaths) // n_risk <= 500000
      |    THEN day ELSE -1 END AS med
      |  FROM rk WHERE t = 1
      | UNION ALL
      | SELECT g.event_type, g.t, g.day,
      |   CASE WHEN g.n_risk > 0
      |    THEN k.s * (g.n_risk - g.deaths) // g.n_risk ELSE k.s END,
      |   k.rmst + k.s * (g.day - k.pd),
      |   CASE WHEN k.med >= 0 THEN k.med
      |    WHEN (CASE WHEN g.n_risk > 0
      |      THEN k.s * (g.n_risk - g.deaths) // g.n_risk ELSE k.s END)
      |      <= 500000 THEN g.day
      |    ELSE -1 END
      |  FROM km k JOIN rk g
      |   ON g.event_type = k.event_type AND g.t = k.t + 1),
      |fin AS (SELECT event_type, max(t) AS tmax FROM km GROUP BY 1),
      |lastrow AS (SELECT k.* FROM km k JOIN fin f2
      |  ON k.event_type = f2.event_type AND k.t = f2.tmax),
      |us AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |   CAST(sum(1 - cens) AS BIGINT) AS n_deaths FROM f GROUP BY 1)
      |SELECT event_type, n_users, n_deaths,
      | CAST(s AS BIGINT) AS s_final_ppm,
      | CAST(rmst AS BIGINT) AS rmst_ppm_days,
      | CAST(med AS BIGINT) AS median_day
      |FROM lastrow JOIN us USING (event_type) ORDER BY event_type""".stripMargin

  // q357: PAIRED SIGN TEST — the CONTINUOUS-metric sibling of q342's
  // McNemar (binary engagement) and the assumption-free floor under
  // q279's CUPED (which models the pre/post relationship): did each
  // user's value SUM move up or down between the windows, with only the
  // SIGNS consumed — median-shift inference immune to any marginal
  // distribution. Ties (no change) are dropped, the standard treatment;
  // continuity-corrected χ²₁ = (|n⁺−n⁻|−1)²/(n⁺+n⁻) exact in one milli
  // division. ONE (type,user) collapse.
  private def q357(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, col("v")).otherwise(0L)).as("pre"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("post"))
      .groupBy("event_type")
      .agg(sum(expr("CAST(post > pre AS BIGINT)")).as("n_up"),
        sum(expr("CAST(post < pre AS BIGINT)")).as("n_down"),
        sum(expr("CAST(post = pre AS BIGINT)")).as("n_tied"))
      .withColumn("z2_milli", expr(
        """CASE WHEN n_up + n_down > 0 THEN
          | (abs(n_up - n_down) - 1) * (abs(n_up - n_down) - 1) * 1000
          |  div (n_up + n_down)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_up"), col("n_down"), col("n_tied"),
        col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q357Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS pre,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS post
      |  FROM events GROUP BY 1, 2),
      |ag AS (SELECT event_type,
      |   CAST(sum(CASE WHEN post > pre THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
      |   CAST(sum(CASE WHEN post < pre THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
      |   CAST(sum(CASE WHEN post = pre THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      |  FROM ug GROUP BY 1)
      |SELECT event_type, n_up, n_down, n_tied,
      | CASE WHEN n_up + n_down > 0 THEN
      |  (abs(n_up - n_down) - 1) * (abs(n_up - n_down) - 1) * 1000
      |   // (n_up + n_down) ELSE 0 END AS z2_milli,
      | CAST((CASE WHEN n_up + n_down > 0 THEN
      |  (abs(n_up - n_down) - 1) * (abs(n_up - n_down) - 1) * 1000
      |   // (n_up + n_down) ELSE 0 END) >= 3841 AS BIGINT) AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q358: MURPHY DECOMPOSITION OF THE BRIER SCORE — q292 prints ECE and
  // Brier; this explains WHERE the Brier comes from (Murphy 1973):
  // Brier = RELIABILITY − RESOLUTION + UNCERTAINTY over the same 10
  // reliability bins — REL prices miscalibration (fixable by
  // recalibration, q153's job), RES prices the model's actual
  // discrimination (not fixable post hoc), UNC is the base rate's
  // entropy floor. Exact micro² staging at bin grain: bin means
  // truncated (q327), each term one bounded division, the identity
  // holding up to declared truncation (spec-asserted within the ulp
  // budget). Reuses ProbeModel's closed-form scores verbatim — one
  // extra collapse on q292's own bin grid.
  private def q358(s: SparkSession, d: String): DataFrame = {
    val feat = ProbeModel.features(s, d)
    val m = ProbeModel.weights(feat)
    val scored = feat.filter(col("bkt") >= 80)
      .crossJoin(broadcast(m))
      .withColumn("p_micro", expr(
        "greatest(0L, least(1000000L, w0_micro + w1_micro * x1 + w2_micro * x2))"))
      .withColumn("bin", expr("least(9L, p_micro div 100000)"))
    val bins = scored.groupBy("bin")
      .agg(count(lit(1)).as("n_b"), sum("y").as("sy"),
        sum("p_micro").as("sp"))
      .withColumn("pbar", expr("sp div n_b"))
      .withColumn("ybar_micro", expr("sy * 1000000 div n_b"))
    val tot = bins.agg(sum("n_b").as("n"), sum("sy").as("sy_all"))
      .withColumn("ybar_all", expr("sy_all * 1000000 div n"))
    bins.crossJoin(broadcast(tot))
      .withColumn("rel_num", expr(
        "CAST(n_b AS DECIMAL(38,0)) * (pbar - ybar_micro) * (pbar - ybar_micro)"))
      .withColumn("res_num", expr(
        "CAST(n_b AS DECIMAL(38,0)) * (ybar_micro - ybar_all) * (ybar_micro - ybar_all)"))
      .groupBy("n", "ybar_all")
      .agg(count(lit(1)).as("n_bins"), sum("rel_num").as("reln"),
        sum("res_num").as("resn"))
      .withColumn("reliability_micro2", expr("CAST(reln div n AS BIGINT)"))
      .withColumn("resolution_micro2", expr("CAST(resn div n AS BIGINT)"))
      .withColumn("uncertainty_micro2", expr(
        "CAST(CAST(ybar_all AS DECIMAL(38,0)) * (1000000 - ybar_all) AS BIGINT)"))
      .withColumn("brier_decomp_micro2", expr(
        "reliability_micro2 - resolution_micro2 + uncertainty_micro2"))
      .select(col("n"), col("n_bins"), col("ybar_all"),
        col("reliability_micro2"), col("resolution_micro2"),
        col("uncertainty_micro2"), col("brier_decomp_micro2"))
  }

  private val q358Sql = s"WITH ${ProbeModel.duckFeatAndWeights}" +
    """,
      |scored AS (SELECT greatest(0, least(1000000,
      |    w.w0_micro + w.w1_micro * f.x1 + w.w2_micro * f.x2)) AS p_micro, f.y
      |  FROM feat f CROSS JOIN wt w WHERE f.bkt >= 80),
      |bins AS (SELECT least(9, p_micro // 100000) AS bin,
      |   CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS sy,
      |   CAST(sum(p_micro) AS HUGEINT) AS sp
      |  FROM scored GROUP BY 1),
      |b2 AS (SELECT bin, n_b, sy, CAST(sp // n_b AS BIGINT) AS pbar,
      |   sy * 1000000 // n_b AS ybar_micro FROM bins),
      |tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
      |   CAST(sum(sy) * 1000000 // sum(n_b) AS BIGINT) AS ybar_all
      |  FROM b2),
      |ag AS (SELECT n, ybar_all, CAST(count(*) AS BIGINT) AS n_bins,
      |   sum(CAST(n_b AS HUGEINT) * (pbar - ybar_micro) * (pbar - ybar_micro))
      |     AS reln,
      |   sum(CAST(n_b AS HUGEINT) * (ybar_micro - ybar_all)
      |       * (ybar_micro - ybar_all)) AS resn
      |  FROM b2 CROSS JOIN tot GROUP BY 1, 2)
      |SELECT n, n_bins, ybar_all,
      | CAST(reln // n AS BIGINT) AS reliability_micro2,
      | CAST(resn // n AS BIGINT) AS resolution_micro2,
      | CAST(CAST(ybar_all AS HUGEINT) * (1000000 - ybar_all)
      |   AS BIGINT) AS uncertainty_micro2,
      | CAST(reln // n AS BIGINT) - CAST(resn // n AS BIGINT)
      |  + CAST(CAST(ybar_all AS HUGEINT) * (1000000 - ybar_all)
      |     AS BIGINT) AS brier_decomp_micro2
      |FROM ag""".stripMargin

  // q359: COCHRAN'S Q TEST — McNemar's k-treatment generalization
  // (q342 compares TWO within-user conditions; the operational question
  // is usually k-way: does a user's engagement with a type differ
  // across the FOUR day-parts — the q282 night/morning/afternoon/
  // evening axis): Q = (k−1)(k·ΣC_j² − N²)/(k·N − ΣR_i²) ~ χ²_{k−1}
  // over per-user binary engagement rows — EXACT integers throughout
  // (all-zero users are provably invariant and never materialize, the
  // q342 discipline). One (type,user) collapse carrying 4 flags; column
  // sums and the R² term partial-aggregate onto the type grid.
  private def q359(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("part", expr("(unix_micros(ts) div 3600000000) % 24 div 6"))
      .groupBy("event_type", "user_id")
      .agg(max(when(col("part") === 0, 1L).otherwise(0L)).as("y0"),
        (1 to 3).map(p =>
          max(when(col("part") === p, 1L).otherwise(0L)).as(s"y$p")): _*)
      .withColumn("r_i", expr("y0 + y1 + y2 + y3"))
    ug.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("y0").as("c0"), sum("y1").as("c1"),
        sum("y2").as("c2"), sum("y3").as("c3"),
        sum("r_i").as("nn"), sum(expr("r_i * r_i")).as("r2"))
      .withColumn("qden", expr("4 * nn - r2"))
      .withColumn("q_milli", expr(
        """CASE WHEN qden > 0 THEN
          | CAST(CAST(3 AS DECIMAL(38,0))
          |   * (4 * (CAST(c0 AS DECIMAL(38,0)) * c0 + CAST(c1 AS DECIMAL(38,0)) * c1
          |      + CAST(c2 AS DECIMAL(38,0)) * c2 + CAST(c3 AS DECIMAL(38,0)) * c3)
          |      - CAST(nn AS DECIMAL(38,0)) * nn) * 1000
          |   div (CAST(4 AS DECIMAL(38,0)) * nn - r2) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(q_milli >= 7815 AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("c0"), col("c1"),
        col("c2"), col("c3"), col("q_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q359Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = 0
      |     THEN 1 ELSE 0 END) AS y0,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = 1
      |     THEN 1 ELSE 0 END) AS y1,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = 2
      |     THEN 1 ELSE 0 END) AS y2,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = 3
      |     THEN 1 ELSE 0 END) AS y3
      |  FROM events GROUP BY 1, 2),
      |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |   CAST(sum(y0) AS BIGINT) AS c0, CAST(sum(y1) AS BIGINT) AS c1,
      |   CAST(sum(y2) AS BIGINT) AS c2, CAST(sum(y3) AS BIGINT) AS c3,
      |   CAST(sum(y0 + y1 + y2 + y3) AS BIGINT) AS nn,
      |   CAST(sum((y0 + y1 + y2 + y3) * (y0 + y1 + y2 + y3)) AS BIGINT) AS r2
      |  FROM ug GROUP BY 1)
      |SELECT event_type, n_users, c0, c1, c2, c3,
      | CASE WHEN 4 * nn - r2 > 0 THEN
      |  CAST(CAST(3 AS HUGEINT)
      |    * (4 * (CAST(c0 AS HUGEINT) * c0 + CAST(c1 AS HUGEINT) * c1
      |       + CAST(c2 AS HUGEINT) * c2 + CAST(c3 AS HUGEINT) * c3)
      |       - CAST(nn AS HUGEINT) * nn) * 1000
      |    // (CAST(4 AS HUGEINT) * nn - r2) AS BIGINT)
      | ELSE 0 END AS q_milli,
      | CAST((CASE WHEN 4 * nn - r2 > 0 THEN
      |  CAST(CAST(3 AS HUGEINT)
      |    * (4 * (CAST(c0 AS HUGEINT) * c0 + CAST(c1 AS HUGEINT) * c1
      |       + CAST(c2 AS HUGEINT) * c2 + CAST(c3 AS HUGEINT) * c3)
      |       - CAST(nn AS HUGEINT) * nn) * 1000
      |    // (CAST(4 AS HUGEINT) * nn - r2) AS BIGINT)
      | ELSE 0 END) >= 7815 AS BIGINT) AS reject
      |FROM ag ORDER BY event_type""".stripMargin

  // q360: FRIEDMAN RANK TEST — Cochran's Q for CONTINUOUS outcomes
  // (q359 needs binary engagement; the value question — does SPEND per
  // day-part differ within users — wants ranks): each user row-locally
  // midranks their own 4 day-part value sums (doubled midranks
  // d = 2·#less + #equal + 1 keep ties integer — computed by 4×4
  // comparisons, NO sort, NO shuffle beyond the user collapse), and the
  // tie-general statistic χ² = (k−1)·Σ_j(D_j − n(k+1))² /
  // ΣΣ(d_ij − (k+1))² is exact on the doubled scale (the scale factors
  // cancel between numerator and denominator). Block grain = user, so
  // the only corpus-scale shuffle is the same (type,user) collapse the
  // paired family already pays; the k=4 unpivot is row-local stack work.
  private def q360(s: SparkSession, d: String): DataFrame = {
    val parts = (0 to 3)
    val ug = events(s, d)
      .withColumn("part", expr("(unix_micros(ts) div 3600000000) % 24 div 6"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("part") === 0, col("v")).otherwise(0L)).as("v0"),
        (1 to 3).map(p =>
          sum(when(col("part") === p, col("v")).otherwise(0L)).as(s"v$p")): _*)
    val ranked = parts.foldLeft(ug) { (df, p) =>
      val less = parts.map(q => s"CAST(v$q < v$p AS BIGINT)").mkString(" + ")
      val eq = parts.map(q => s"CAST(v$q = v$p AS BIGINT)").mkString(" + ")
      // doubled midrank 2r = 2·#less + #eq(incl self) + 1 — sums to
      // k(k+1) = 20 per user (spec-pinned conservation)
      df.withColumn(s"d$p", expr(s"2 * ($less) + ($eq) + 1"))
    }
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("d0").as("dd0"), sum("d1").as("dd1"),
        sum("d2").as("dd2"), sum("d3").as("dd3"),
        sum(expr("(d0 - 5) * (d0 - 5) + (d1 - 5) * (d1 - 5)" +
          " + (d2 - 5) * (d2 - 5) + (d3 - 5) * (d3 - 5)")).as("ss"))
      .withColumn("chi2_milli", expr(
        """CASE WHEN ss > 0 THEN
          | CAST(CAST(3 AS DECIMAL(38,0))
          |   * ((CAST(dd0 AS DECIMAL(38,0)) - 5 * n_users) * (dd0 - 5 * n_users)
          |    + (CAST(dd1 AS DECIMAL(38,0)) - 5 * n_users) * (dd1 - 5 * n_users)
          |    + (CAST(dd2 AS DECIMAL(38,0)) - 5 * n_users) * (dd2 - 5 * n_users)
          |    + (CAST(dd3 AS DECIMAL(38,0)) - 5 * n_users) * (dd3 - 5 * n_users))
          |   * 1000 div ss AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(chi2_milli >= 7815 AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("dd0"), col("dd1"),
        col("dd2"), col("dd3"), col("chi2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q360Sql = {
    val parts = (0 to 3)
    val vdefs = parts.map(p =>
      s"""sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = $p
         |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS v$p"""
        .stripMargin).mkString(",\n   ")
    val ddefs = parts.map { p =>
      val less = parts.map(q => s"CASE WHEN v$q < v$p THEN 1 ELSE 0 END").mkString(" + ")
      val eq = parts.map(q => s"CASE WHEN v$q = v$p THEN 1 ELSE 0 END").mkString(" + ")
      s"2 * ($less) + ($eq) + 1 AS d$p"
    }.mkString(",\n   ")
    s"""WITH ug AS (SELECT event_type, user_id,
       |   $vdefs
       |  FROM events GROUP BY 1, 2),
       |rk AS (SELECT event_type,
       |   $ddefs
       |  FROM ug),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
       |   CAST(sum(d0) AS BIGINT) AS dd0, CAST(sum(d1) AS BIGINT) AS dd1,
       |   CAST(sum(d2) AS BIGINT) AS dd2, CAST(sum(d3) AS BIGINT) AS dd3,
       |   CAST(sum((d0 - 5) * (d0 - 5) + (d1 - 5) * (d1 - 5)
       |      + (d2 - 5) * (d2 - 5) + (d3 - 5) * (d3 - 5)) AS BIGINT) AS ss
       |  FROM rk GROUP BY 1)
       |SELECT event_type, n_users, dd0, dd1, dd2, dd3,
       | CASE WHEN ss > 0 THEN
       |  CAST(CAST(3 AS HUGEINT)
       |    * ((CAST(dd0 AS HUGEINT) - 5 * n_users) * (dd0 - 5 * n_users)
       |     + (CAST(dd1 AS HUGEINT) - 5 * n_users) * (dd1 - 5 * n_users)
       |     + (CAST(dd2 AS HUGEINT) - 5 * n_users) * (dd2 - 5 * n_users)
       |     + (CAST(dd3 AS HUGEINT) - 5 * n_users) * (dd3 - 5 * n_users))
       |    * 1000 // ss AS BIGINT)
       | ELSE 0 END AS chi2_milli,
       | CAST((CASE WHEN ss > 0 THEN
       |  CAST(CAST(3 AS HUGEINT)
       |    * ((CAST(dd0 AS HUGEINT) - 5 * n_users) * (dd0 - 5 * n_users)
       |     + (CAST(dd1 AS HUGEINT) - 5 * n_users) * (dd1 - 5 * n_users)
       |     + (CAST(dd2 AS HUGEINT) - 5 * n_users) * (dd2 - 5 * n_users)
       |     + (CAST(dd3 AS HUGEINT) - 5 * n_users) * (dd3 - 5 * n_users))
       |    * 1000 // ss AS BIGINT)
       | ELSE 0 END) >= 7815 AS BIGINT) AS reject
       |FROM ag ORDER BY event_type""".stripMargin
  }

  // q361: MANTEL–HAENSZEL POOLED ODDS RATIO — q346 renders the
  // stratified VERDICT; a decision meeting also wants the pooled EFFECT
  // and whether pooling MOVED it (the Simpson check q282 makes, now
  // with the estimator attached): OR_MH = Σ_h(a_h·d_h/T_h) /
  // Σ_h(b_h·c_h/T_h) — each stratum contributes micro-staged exact
  // terms, one milli division at the close — reported next to the CRUDE
  // (unstratified) OR; a crude/MH gap ≥ the declared 100-milli band is
  // the confounding flag. Same strata, outcome, and (type,user)
  // collapse as q346.
  private def q361(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        max(when(col("hod") >= 12, 1L).otherwise(0L)).as("y"))
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("tier", expr(
        "CASE WHEN pre_n <= 0 THEN 0L WHEN pre_n <= 2 THEN 1L WHEN pre_n <= 5 THEN 2L ELSE 3L END"))
    val cells = ug.groupBy("event_type", "tier")
      .agg(sum(expr("CAST(arm = 0 AND y = 1 AS BIGINT)")).as("a"),
        sum(expr("CAST(arm = 0 AND y = 0 AS BIGINT)")).as("b"),
        sum(expr("CAST(arm = 1 AND y = 1 AS BIGINT)")).as("c"),
        sum(expr("CAST(arm = 1 AND y = 0 AS BIGINT)")).as("dd"))
      .withColumn("t", expr("a + b + c + dd"))
      .filter(col("t") > 0)
      .withColumn("num_micro", expr(
        "CAST(a AS DECIMAL(38,0)) * dd * 1000000 div t"))
      .withColumn("den_micro", expr(
        "CAST(b AS DECIMAL(38,0)) * c * 1000000 div t"))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_strata"),
        sum("a").as("aa"), sum("b").as("bb"),
        sum("c").as("cc"), sum("dd").as("dd"),
        sum("num_micro").as("numm"), sum("den_micro").as("denm"))
      .withColumn("or_mh_milli", expr(
        """CASE WHEN denm > 0 THEN
          | CAST(CAST(numm AS DECIMAL(38,0)) * 1000 div denm AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("or_crude_milli", expr(
        """CASE WHEN bb > 0 AND cc > 0 THEN
          | CAST(CAST(aa AS DECIMAL(38,0)) * dd * 1000
          |   div (CAST(bb AS DECIMAL(38,0)) * cc) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("confounded", expr(
        "CAST(abs(or_crude_milli - or_mh_milli) >= 100 AS BIGINT)"))
      .select(col("event_type"), col("n_strata"), col("or_crude_milli"),
        col("or_mh_milli"), col("confounded"))
      .orderBy("event_type")
  }

  private val q361Sql =
    s"""WITH ug AS (SELECT event_type, user_id,
       |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS pre_n,
       |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN 1 ELSE 0 END) AS y,
       |   ${duckArm(2)} AS arm
       |  FROM events GROUP BY 1, 2),
       |tg AS (SELECT event_type,
       |   CASE WHEN pre_n <= 0 THEN 0 WHEN pre_n <= 2 THEN 1
       |    WHEN pre_n <= 5 THEN 2 ELSE 3 END AS tier, arm, y FROM ug),
       |cells AS (SELECT event_type, tier,
       |   CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |   CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |   CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |   CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
       |  FROM tg GROUP BY 1, 2),
       |st AS (SELECT event_type, a, b, c, dd, a + b + c + dd AS t
       |  FROM cells WHERE a + b + c + dd > 0),
       |mi AS (SELECT event_type, a, b, c, dd,
       |   CAST(a AS HUGEINT) * dd * 1000000 // t AS num_micro,
       |   CAST(b AS HUGEINT) * c * 1000000 // t AS den_micro
       |  FROM st),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_strata,
       |   CAST(sum(a) AS BIGINT) AS aa, CAST(sum(b) AS BIGINT) AS bb,
       |   CAST(sum(c) AS BIGINT) AS cc, CAST(sum(dd) AS BIGINT) AS d2,
       |   sum(num_micro) AS numm, sum(den_micro) AS denm
       |  FROM mi GROUP BY 1),
       |orx AS (SELECT event_type, n_strata,
       |   CASE WHEN bb > 0 AND cc > 0 THEN
       |    CAST(CAST(aa AS HUGEINT) * d2 * 1000
       |      // (CAST(bb AS HUGEINT) * cc) AS BIGINT)
       |   ELSE 0 END AS or_crude_milli,
       |   CASE WHEN denm > 0 THEN
       |    CAST(CAST(numm AS HUGEINT) * 1000 // denm AS BIGINT)
       |   ELSE 0 END AS or_mh_milli
       |  FROM ag)
       |SELECT event_type, n_strata, or_crude_milli, or_mh_milli,
       | CAST(abs(or_crude_milli - or_mh_milli) >= 100 AS BIGINT) AS confounded
       |FROM orx ORDER BY event_type""".stripMargin

  // q363: PAGE'S L TREND TEST — the ORDERED-alternative companion of
  // q360 (Friedman asks "do the day-parts differ AT ALL"; the capacity
  // planner's hypothesis is ORDERED — engagement rises through the day
  // night<morning<afternoon<evening — and Page's L is strictly more
  // powerful against exactly that ordering, Page 1963): L = Σ_j j·R_j
  // on q360's row-local doubled midranks (L2 = Σ j·D_j, E[L2] = n·k(k+1)²/2
  // = 50n at k=4, no-tie Var[L2] = 4n·k²(k+1)(k²−1)/144 = 100n/3);
  // z²·1000 = (L2−50n)²·3·1000 div (100n), DECLARED no-tie variance —
  // anti-conservative under heavy ties, so this is the ordered SCREEN
  // and q360 stays the omnibus verdict (stated, mirrored). Trend sign
  // carried separately. Same single (type,user) collapse as q360.
  private def q363(s: SparkSession, d: String): DataFrame = {
    val parts = (0 to 3)
    val ug = events(s, d)
      .withColumn("part", expr("(unix_micros(ts) div 3600000000) % 24 div 6"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("part") === 0, col("v")).otherwise(0L)).as("v0"),
        (1 to 3).map(p =>
          sum(when(col("part") === p, col("v")).otherwise(0L)).as(s"v$p")): _*)
    val ranked = parts.foldLeft(ug) { (df, p) =>
      val less = parts.map(q => s"CAST(v$q < v$p AS BIGINT)").mkString(" + ")
      val eq = parts.map(q => s"CAST(v$q = v$p AS BIGINT)").mkString(" + ")
      df.withColumn(s"d$p", expr(s"2 * ($less) + ($eq) + 1"))
    }
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(expr("1 * d0 + 2 * d1 + 3 * d2 + 4 * d3")).as("l2"))
      .withColumn("dev", expr("l2 - 50 * n_users"))
      .withColumn("trend_sign", expr("CAST(sign(dev) AS BIGINT)"))
      .withColumn("z2_milli", expr(
        """CASE WHEN n_users > 0 THEN
          | CAST(CAST(dev AS DECIMAL(38,0)) * dev * 3 * 1000
          |   div (CAST(100 AS DECIMAL(38,0)) * n_users) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("l2"),
        col("trend_sign"), col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q363Sql = {
    val parts = (0 to 3)
    val vdefs = parts.map(p =>
      s"""sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = $p
         |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS v$p"""
        .stripMargin).mkString(",\n   ")
    val ddefs = parts.map { p =>
      val less = parts.map(q => s"CASE WHEN v$q < v$p THEN 1 ELSE 0 END").mkString(" + ")
      val eq = parts.map(q => s"CASE WHEN v$q = v$p THEN 1 ELSE 0 END").mkString(" + ")
      s"2 * ($less) + ($eq) + 1 AS d$p"
    }.mkString(",\n   ")
    s"""WITH ug AS (SELECT event_type, user_id,
       |   $vdefs
       |  FROM events GROUP BY 1, 2),
       |rk AS (SELECT event_type,
       |   $ddefs
       |  FROM ug),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
       |   CAST(sum(1 * d0 + 2 * d1 + 3 * d2 + 4 * d3) AS BIGINT) AS l2
       |  FROM rk GROUP BY 1),
       |st AS (SELECT *, l2 - 50 * n_users AS dev FROM ag)
       |SELECT event_type, n_users, l2,
       | CAST(sign(dev) AS BIGINT) AS trend_sign,
       | CASE WHEN n_users > 0 THEN
       |  CAST(CAST(dev AS HUGEINT) * dev * 3 * 1000
       |    // (CAST(100 AS HUGEINT) * n_users) AS BIGINT)
       | ELSE 0 END AS z2_milli,
       | CAST((CASE WHEN n_users > 0 THEN
       |  CAST(CAST(dev AS HUGEINT) * dev * 3 * 1000
       |    // (CAST(100 AS HUGEINT) * n_users) AS BIGINT)
       | ELSE 0 END) >= 3841 AS BIGINT) AS reject
       |FROM st ORDER BY event_type""".stripMargin
  }

  // q364: KENDALL'S W COEFFICIENT OF CONCORDANCE — the EFFECT-SIZE
  // companion of q360 (the q351/q352 significance-vs-size lesson, rank
  // edition): Friedman's χ² says whether users agree on a day-part
  // ordering AT ALL; W = χ²/(n(k−1)) ∈ [0,1] says HOW STRONGLY they
  // agree, invariant to n — the number a reviewer can carry across
  // cohorts. Computed from the SAME row-local doubled-midrank machinery
  // as q360 (tie-general form), one extra milli division; classed on
  // the conventional weak/moderate/strong ladder W = .1/.3/.5. Same
  // single (type,user) collapse.
  private def q364(s: SparkSession, d: String): DataFrame = {
    val parts = (0 to 3)
    val ug = events(s, d)
      .withColumn("part", expr("(unix_micros(ts) div 3600000000) % 24 div 6"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("part") === 0, col("v")).otherwise(0L)).as("v0"),
        (1 to 3).map(p =>
          sum(when(col("part") === p, col("v")).otherwise(0L)).as(s"v$p")): _*)
    val ranked = parts.foldLeft(ug) { (df, p) =>
      val less = parts.map(q => s"CAST(v$q < v$p AS BIGINT)").mkString(" + ")
      val eq = parts.map(q => s"CAST(v$q = v$p AS BIGINT)").mkString(" + ")
      df.withColumn(s"d$p", expr(s"2 * ($less) + ($eq) + 1"))
    }
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("d0").as("dd0"), sum("d1").as("dd1"),
        sum("d2").as("dd2"), sum("d3").as("dd3"),
        sum(expr("(d0 - 5) * (d0 - 5) + (d1 - 5) * (d1 - 5)" +
          " + (d2 - 5) * (d2 - 5) + (d3 - 5) * (d3 - 5)")).as("ss"))
      .withColumn("chi2_milli", expr(
        """CASE WHEN ss > 0 THEN
          | CAST(CAST(3 AS DECIMAL(38,0))
          |   * ((CAST(dd0 AS DECIMAL(38,0)) - 5 * n_users) * (dd0 - 5 * n_users)
          |    + (CAST(dd1 AS DECIMAL(38,0)) - 5 * n_users) * (dd1 - 5 * n_users)
          |    + (CAST(dd2 AS DECIMAL(38,0)) - 5 * n_users) * (dd2 - 5 * n_users)
          |    + (CAST(dd3 AS DECIMAL(38,0)) - 5 * n_users) * (dd3 - 5 * n_users))
          |   * 1000 div ss AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("w_milli", expr(
        "CASE WHEN n_users > 0 THEN chi2_milli div (3 * n_users) ELSE 0L END"))
      .withColumn("agreement", expr(
        """CASE WHEN w_milli >= 500 THEN 'strong'
          | WHEN w_milli >= 300 THEN 'moderate'
          | WHEN w_milli >= 100 THEN 'weak'
          | ELSE 'negligible' END""".stripMargin))
      .select(col("event_type"), col("n_users"), col("chi2_milli"),
        col("w_milli"), col("agreement"))
      .orderBy("event_type")
  }

  private val q364Sql = {
    val parts = (0 to 3)
    val vdefs = parts.map(p =>
      s"""sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 // 6 = $p
         |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS v$p"""
        .stripMargin).mkString(",\n   ")
    val ddefs = parts.map { p =>
      val less = parts.map(q => s"CASE WHEN v$q < v$p THEN 1 ELSE 0 END").mkString(" + ")
      val eq = parts.map(q => s"CASE WHEN v$q = v$p THEN 1 ELSE 0 END").mkString(" + ")
      s"2 * ($less) + ($eq) + 1 AS d$p"
    }.mkString(",\n   ")
    s"""WITH ug AS (SELECT event_type, user_id,
       |   $vdefs
       |  FROM events GROUP BY 1, 2),
       |rk AS (SELECT event_type,
       |   $ddefs
       |  FROM ug),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
       |   CAST(sum(d0) AS BIGINT) AS dd0, CAST(sum(d1) AS BIGINT) AS dd1,
       |   CAST(sum(d2) AS BIGINT) AS dd2, CAST(sum(d3) AS BIGINT) AS dd3,
       |   CAST(sum((d0 - 5) * (d0 - 5) + (d1 - 5) * (d1 - 5)
       |      + (d2 - 5) * (d2 - 5) + (d3 - 5) * (d3 - 5)) AS BIGINT) AS ss
       |  FROM rk GROUP BY 1),
       |ch AS (SELECT event_type, n_users,
       |   CASE WHEN ss > 0 THEN
       |    CAST(CAST(3 AS HUGEINT)
       |      * ((CAST(dd0 AS HUGEINT) - 5 * n_users) * (dd0 - 5 * n_users)
       |       + (CAST(dd1 AS HUGEINT) - 5 * n_users) * (dd1 - 5 * n_users)
       |       + (CAST(dd2 AS HUGEINT) - 5 * n_users) * (dd2 - 5 * n_users)
       |       + (CAST(dd3 AS HUGEINT) - 5 * n_users) * (dd3 - 5 * n_users))
       |      * 1000 // ss AS BIGINT)
       |   ELSE 0 END AS chi2_milli
       |  FROM ag)
       |SELECT event_type, n_users, chi2_milli,
       | CASE WHEN n_users > 0 THEN chi2_milli // (3 * n_users)
       |  ELSE 0 END AS w_milli,
       | CASE WHEN (CASE WHEN n_users > 0 THEN chi2_milli // (3 * n_users)
       |   ELSE 0 END) >= 500 THEN 'strong'
       |  WHEN (CASE WHEN n_users > 0 THEN chi2_milli // (3 * n_users)
       |   ELSE 0 END) >= 300 THEN 'moderate'
       |  WHEN (CASE WHEN n_users > 0 THEN chi2_milli // (3 * n_users)
       |   ELSE 0 END) >= 100 THEN 'weak'
       |  ELSE 'negligible' END AS agreement
       |FROM ch ORDER BY event_type""".stripMargin
  }

  // q366: WILCOXON SIGNED-RANK TEST — the MAGNITUDE-aware upgrade of the
  // q357 sign test on the same (type, user) pre/post pairing: the sign
  // test throws away HOW MUCH each user moved; Wilcoxon ranks |d| across
  // users and asks whether the big moves side with one direction
  // (Wilcoxon 1945). Scale posture: d is a PER-USER pre/post sum, so
  // distinct |d| grows with user cardinality — the per-type cumulative
  // window here runs at USER grain after the one (type, user) collapse
  // (same posture as q357/q363), NOT on q280's bounded centi-value grid
  // (event values are rounded, but user SUMS are not re-bounded). Nonzero
  // diffs group to |d| grain, pooled doubled midranks 2·cum + cnt + 1
  // via one cumulative window per type, W2 = Σ_{d>0} cp·mr2
  // (doubled positive rank-sum). Exact integers: dnum = W2 − n(n+1)/2 =
  // 2(W⁺ − E[W⁺]); 4·Var = (2n(n+1)(2n+1) − Σ(t³−t))/12, so
  // z²·1000 = dnum²·12000 div (2n(n+1)(2n+1) − ties) — DECIMAL(38)
  // through sf1 and beyond (dnum² ~ n⁴).
  private def q366(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, col("v")).otherwise(0L)).as("pre"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("post"))
      .withColumn("diff", expr("post - pre"))
      .filter(col("diff") =!= 0L)
      .withColumn("a", expr("abs(diff)"))
    val ag = ug.groupBy("event_type", "a")
      .agg(sum(expr("CAST(diff > 0 AS BIGINT)")).as("cp"),
        count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("a")
      .rowsBetween(Window.unboundedPreceding, -1)
    ag.withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("mr2", expr("2 * cum + cnt + 1"))
      .groupBy("event_type")
      .agg(sum("cnt").as("n_pairs"),
        sum(expr("CAST(cp AS DECIMAL(38,0)) * mr2")).as("w2_pos"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("ties"))
      .withColumn("dnum", expr(
        "w2_pos - CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1) div 2"))
      .withColumn("vden", expr(
        """2 * CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1)
          | * (2 * n_pairs + 1) - ties""".stripMargin))
      .withColumn("gap_sign", expr("CAST(sign(dnum) AS BIGINT)"))
      .withColumn("z2_milli", expr(
        """CASE WHEN vden > 0 THEN
          | CAST(dnum * dnum * 12000 div vden AS BIGINT) ELSE 0L END"""
          .stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n_pairs"),
        expr("CAST(w2_pos AS BIGINT)").as("w2_pos"),
        expr("CAST(ties AS BIGINT)").as("ties"), col("gap_sign"),
        col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q366Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS pre,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS post
      |  FROM events GROUP BY 1, 2),
      |nz AS (SELECT event_type, post - pre AS diff, abs(post - pre) AS a
      |  FROM ug WHERE post <> pre),
      |ag AS (SELECT event_type, a,
      |   CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
      |   CAST(count(*) AS BIGINT) AS cnt
      |  FROM nz GROUP BY 1, 2),
      |mr AS (SELECT *, COALESCE(sum(cnt) OVER (PARTITION BY event_type
      |    ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS cum FROM ag),
      |g AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_pairs,
      |   sum(CAST(cp AS HUGEINT) * (2 * cum + cnt + 1)) AS w2_pos,
      |   sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
      |  FROM mr GROUP BY 1),
      |st AS (SELECT *,
      |   w2_pos - CAST(n_pairs AS HUGEINT) * (n_pairs + 1) // 2 AS dnum,
      |   2 * CAST(n_pairs AS HUGEINT) * (n_pairs + 1) * (2 * n_pairs + 1)
      |     - ties AS vden
      |  FROM g)
      |SELECT event_type, n_pairs, CAST(w2_pos AS BIGINT) AS w2_pos,
      | CAST(ties AS BIGINT) AS ties,
      | CAST(sign(dnum) AS BIGINT) AS gap_sign,
      | CASE WHEN vden > 0 THEN CAST(dnum * dnum * 12000 // vden AS BIGINT)
      |  ELSE 0 END AS z2_milli,
      | CAST((CASE WHEN vden > 0 THEN
      |   CAST(dnum * dnum * 12000 // vden AS BIGINT) ELSE 0 END)
      |  >= 3841 AS BIGINT) AS reject
      |FROM st ORDER BY event_type""".stripMargin

  // q367: CLIFF'S DELTA EFFECT SIZE — the rank family's q311 (the
  // significance-vs-size lesson, ordinal edition): q280's z² says WHETHER
  // the arms' value distributions differ; δ = P(a>b) − P(a<b) ∈ [−1,1]
  // says HOW MUCH, invariant to n — the effect size to carry across
  // corpora (Cliff 1993; |δ| ladder .147/.33/.474 per Romano et al.
  // 2006). Exact on the q280 value grid: gt = Σ_v ca_v·cumb(<v) and
  // lt = Σ_v ca_v·(n_b − cumb − cb_v) via ONE cumulative window per arm
  // over the bounded centi-value domain; t_ab = Σ ca_v·cb_v. Identity
  // u2_a = 2·gt + t_ab ties it to q280's doubled U (spec-pinned).
  private def q367(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("arm", hashBucket(col("user_id"), 2))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    vg.withColumn("cumb", coalesce(sum("cb").over(w), lit(0L)))
      .withColumn("nb", sum("cb").over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(sum("ca").as("n_a"), max("nb").as("n_b"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * cumb")).as("gt"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * (nb - cumb - cb)")).as("lt"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("t_ab"))
      .withColumn("cd", expr("gt - lt"))
      .withColumn("delta_sign", expr("CAST(sign(cd) AS BIGINT)"))
      .withColumn("delta_milli", expr(
        """CASE WHEN n_a > 0 AND n_b > 0 THEN
          | CAST(abs(cd) * 1000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)
          |   AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("magnitude", expr(
        """CASE WHEN delta_milli >= 474 THEN 'large'
          | WHEN delta_milli >= 330 THEN 'medium'
          | WHEN delta_milli >= 147 THEN 'small'
          | ELSE 'negligible' END""".stripMargin))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("CAST(gt AS BIGINT)").as("gt"),
        expr("CAST(lt AS BIGINT)").as("lt"),
        expr("CAST(t_ab AS BIGINT)").as("t_ab"), col("delta_sign"),
        col("delta_milli"), col("magnitude"))
      .orderBy("event_type")
  }

  private val q367Sql =
    s"""WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |   CAST(sum(CASE WHEN ${duckArm(2)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM events GROUP BY 1, 2),
       |cm AS (SELECT *, COALESCE(sum(cb) OVER (PARTITION BY event_type
       |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS cumb,
       |   sum(cb) OVER (PARTITION BY event_type) AS nb
       |  FROM vg),
       |g AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_a,
       |   CAST(max(nb) AS BIGINT) AS n_b,
       |   sum(CAST(ca AS HUGEINT) * cumb) AS gt,
       |   sum(CAST(ca AS HUGEINT) * (nb - cumb - cb)) AS lt,
       |   sum(CAST(ca AS HUGEINT) * cb) AS t_ab
       |  FROM cm GROUP BY 1),
       |st AS (SELECT *, gt - lt AS cd FROM g),
       |dm AS (SELECT *, CASE WHEN n_a > 0 AND n_b > 0 THEN
       |   CAST(abs(cd) * 1000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
       |  ELSE 0 END AS delta_milli FROM st)
       |SELECT event_type, n_a, n_b, CAST(gt AS BIGINT) AS gt,
       | CAST(lt AS BIGINT) AS lt, CAST(t_ab AS BIGINT) AS t_ab,
       | CAST(sign(cd) AS BIGINT) AS delta_sign, delta_milli,
       | CASE WHEN delta_milli >= 474 THEN 'large'
       |  WHEN delta_milli >= 330 THEN 'medium'
       |  WHEN delta_milli >= 147 THEN 'small'
       |  ELSE 'negligible' END AS magnitude
       |FROM dm ORDER BY event_type""".stripMargin

  // q368: JONCKHEERE–TERPSTRA ORDERED k-SAMPLE TEST — the BETWEEN-users
  // companion of q363 (Page's L orders WITHIN-user day-part ranks; JT
  // asks the between-subjects version): does post-window spend RISE with
  // the q307 pre-activity tier (0 < 1–2 < 3–5 < 6+ morning events)?
  // Tiers are genuinely ORDINAL, so JT (Jonckheere 1954, Terpstra 1952)
  // beats q340's unordered H against exactly this alternative. Doubled
  // integers: per type, the (tier, w)-grain counts pivot to c0..c3 on
  // the shared value grid, one cumulative window yields cum0..cum3, and
  // JT2 = Σ_{i<j} (2·Σ_w cj_w·cumi_w + Σ_w ci_w·cj_w) (ties
  // half-counted); E2 = (N² − Σn_i²)/2 exact; DECLARED no-tie variance
  // (the q363 posture — anti-conservative under heavy ties, stated):
  // Var2 = (N²(2N+3) − Σn_i²(2n_i+3))/18, so z²·1000 = dnum²·18000 div
  // vden. One (type, user) collapse; the (tier, w) pivot then groups by
  // w = a per-user post-window SUM, so the grid is USER-scale (distinct
  // sums grow with user cardinality — q357/q363's posture), not q280's
  // bounded centi-value grid; the per-type cumulative window runs at
  // that user grain.
  private def q368(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("hod") >= 12, col("v")).otherwise(0L)).as("w"))
      .withColumn("tier", expr(
        "CASE WHEN pre_n <= 0 THEN 0L WHEN pre_n <= 2 THEN 1L WHEN pre_n <= 5 THEN 2L ELSE 3L END"))
    val tierCols = (0 to 3).map(k =>
      sum(when(col("tier") === k, 1L).otherwise(0L)).as(s"c$k"))
    val grid = ug.groupBy("event_type", "w")
      .agg(tierCols.head, tierCols.tail: _*)
    val win = Window.partitionBy("event_type").orderBy("w")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cums = (0 to 3).foldLeft(grid) { (df, k) =>
      df.withColumn(s"cum$k", coalesce(sum(s"c$k").over(win), lit(0L)))
    }
    val pairs = for { i <- 0 to 3; j <- 0 to 3 if i < j } yield (i, j)
    val jt2 = pairs.map { case (i, j) =>
      expr(s"2 * CAST(c$j AS DECIMAL(38,0)) * cum$i") +
        expr(s"CAST(c$i AS DECIMAL(38,0)) * c$j")
    }.reduce(_ + _)
    cums.groupBy("event_type")
      .agg(sum(jt2).as("jt2"),
        (0 to 3).map(k => sum(col(s"c$k")).as(s"n$k")): _*)
      .withColumn("n", expr("n0 + n1 + n2 + n3"))
      .withColumn("sn2", expr((0 to 3).map(k =>
        s"CAST(n$k AS DECIMAL(38,0)) * n$k").mkString(" + ")))
      .withColumn("e2", expr(
        "(CAST(n AS DECIMAL(38,0)) * n - sn2) div 2"))
      .withColumn("dnum", expr("jt2 - e2"))
      .withColumn("vden", expr(
        "CAST(n AS DECIMAL(38,0)) * n * (2 * n + 3) - (" +
          (0 to 3).map(k =>
            s"CAST(n$k AS DECIMAL(38,0)) * n$k * (2 * n$k + 3)")
            .mkString(" + ") + ")"))
      .withColumn("trend_sign", expr("CAST(sign(dnum) AS BIGINT)"))
      .withColumn("z2_milli", expr(
        """CASE WHEN vden > 0 THEN
          | CAST(dnum * dnum * 18000 div vden AS BIGINT) ELSE 0L END"""
          .stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n"),
        expr("CAST(jt2 AS BIGINT)").as("jt2"),
        expr("CAST(e2 AS BIGINT)").as("e2"), col("trend_sign"),
        col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q368Sql = {
    val cs = (0 to 3).map(k =>
      s"CAST(sum(CASE WHEN tier = $k THEN 1 ELSE 0 END) AS BIGINT) AS c$k")
      .mkString(",\n      |   ")
    val cums = (0 to 3).map(k =>
      s"COALESCE(sum(c$k) OVER (PARTITION BY event_type ORDER BY w " +
        s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum$k")
      .mkString(",\n      |   ")
    val jt2 = (for { i <- 0 to 3; j <- 0 to 3 if i < j } yield
      s"2 * CAST(c$j AS HUGEINT) * cum$i + CAST(c$i AS HUGEINT) * c$j")
      .mkString(" + ")
    val sn2 = (0 to 3).map(k => s"CAST(n$k AS HUGEINT) * n$k").mkString(" + ")
    val vd = (0 to 3).map(k =>
      s"CAST(n$k AS HUGEINT) * n$k * (2 * n$k + 3)").mkString(" + ")
    s"""WITH ug AS (SELECT event_type, user_id,
       |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS pre_n,
       |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS w
       |  FROM events GROUP BY 1, 2),
       |tg AS (SELECT event_type, w, CASE WHEN pre_n <= 0 THEN 0
       |   WHEN pre_n <= 2 THEN 1 WHEN pre_n <= 5 THEN 2 ELSE 3 END AS tier
       |  FROM ug),
       |grid AS (SELECT event_type, w,
       |   $cs
       |  FROM tg GROUP BY 1, 2),
       |cm AS (SELECT *,
       |   $cums
       |  FROM grid),
       |g AS (SELECT event_type, sum($jt2) AS jt2,
       |   CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
       |   CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3
       |  FROM cm GROUP BY 1),
       |st AS (SELECT *, n0 + n1 + n2 + n3 AS n FROM g),
       |s2 AS (SELECT *,
       |   (CAST(n AS HUGEINT) * n - ($sn2)) // 2 AS e2,
       |   CAST(n AS HUGEINT) * n * (2 * n + 3) - ($vd) AS vden
       |  FROM st),
       |s3 AS (SELECT *, jt2 - e2 AS dnum FROM s2)
       |SELECT event_type, n, CAST(jt2 AS BIGINT) AS jt2,
       | CAST(e2 AS BIGINT) AS e2,
       | CAST(sign(dnum) AS BIGINT) AS trend_sign,
       | CASE WHEN vden > 0 THEN
       |  CAST(dnum * dnum * 18000 // vden AS BIGINT) ELSE 0 END AS z2_milli,
       | CAST((CASE WHEN vden > 0 THEN
       |   CAST(dnum * dnum * 18000 // vden AS BIGINT) ELSE 0 END)
       |  >= 3841 AS BIGINT) AS reject
       |FROM s3 ORDER BY event_type""".stripMargin
  }

  // q369: MOOD'S MEDIAN TEST — the robust-location k-sample screen the
  // rank family still lacks: q340's Kruskal–Wallis uses the FULL rank
  // information (efficient, but any distribution-shape difference moves
  // H), while Mood's test (Mood 1950; scipy.stats.median_test) asks the
  // narrower question a segment report actually states — "do the groups
  // sit on the same MEDIAN?" — by reducing every value to above/not-above
  // the POOLED median and testing the 2×k count table with the q209/q352
  // χ² machinery. Exact integers: the pooled LOWER median is the smallest
  // grid value with 2·cum_incl ≥ N (the q88/q277 lower-median rule);
  // at-median values count 'not above' (scipy ties='below'); NO
  // continuity correction (stated — scipy correction=False), per-cell
  // contributions dev²·1000 div (N·n_i·margin) by cross-multiplication.
  // 100 TB: one (type, value) partial-agg collapse (the q280/q340 grid);
  // the median probe, the 2×k table, and the χ² fold are grid-local.
  private def q369(s: SparkSession, d: String): DataFrame = {
    val vg = events(s, d)
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "v")
      .agg(count(lit(1)).as("c"))
    graft.Caches.persist(vg)
    val wv = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vals = vg.groupBy("v").agg(sum("c").as("cnt"))
      .withColumn("cumi", sum("cnt").over(wv))
      .withColumn("n", sum("cnt").over(Window.partitionBy(lit(1))))
    val med = vals.filter(expr("2 * cumi >= n"))
      .agg(min("v").as("med"), max("n").as("n"))
    val grp = vg.crossJoin(broadcast(med))
      .groupBy("event_type")
      .agg(sum("c").as("n_i"),
        sum(expr("CASE WHEN v > med THEN c ELSE 0L END")).as("a_i"),
        max("med").as("med"), max("n").as("n"))
    val tot = grp.agg(sum("a_i").as("aa"))
    grp.crossJoin(broadcast(tot))
      .withColumn("b_i", expr("n_i - a_i"))
      .withColumn("bb", expr("n - aa"))
      .withColumn("contrib", expr(
        """CASE WHEN aa > 0 AND bb > 0 THEN
          | CAST((CAST(a_i AS DECIMAL(38,0)) * n - CAST(n_i AS DECIMAL(38,0)) * aa)
          |   * (CAST(a_i AS DECIMAL(38,0)) * n - CAST(n_i AS DECIMAL(38,0)) * aa)
          |   * 1000 div (CAST(n AS DECIMAL(38,0)) * n_i * aa) AS BIGINT)
          | + CAST((CAST(b_i AS DECIMAL(38,0)) * n - CAST(n_i AS DECIMAL(38,0)) * bb)
          |   * (CAST(b_i AS DECIMAL(38,0)) * n - CAST(n_i AS DECIMAL(38,0)) * bb)
          |   * 1000 div (CAST(n AS DECIMAL(38,0)) * n_i * bb) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .groupBy(lit(1).as("g"))
      .agg(max("n").as("n"), count(lit(1)).as("k_groups"),
        max("med").as("med_centi"), max("aa").as("n_above"),
        sum("contrib").as("chi2_milli"))
      .withColumn("crit_milli", expr(
        """CASE k_groups - 1 WHEN 1 THEN 3841L WHEN 2 THEN 5991L
          | WHEN 3 THEN 7815L WHEN 4 THEN 9488L WHEN 5 THEN 11070L
          | WHEN 6 THEN 12592L ELSE 14067L END""".stripMargin))
      .withColumn("reject", expr("CAST(chi2_milli >= crit_milli AS BIGINT)"))
      .select("n", "k_groups", "med_centi", "n_above", "chi2_milli",
        "crit_milli", "reject")
  }

  private val q369Sql =
    """WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
      |   CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |vals AS (SELECT v, sum(c) AS cnt FROM vg GROUP BY 1),
      |cm AS (SELECT v, sum(cnt) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumi,
      |   sum(cnt) OVER () AS n FROM vals),
      |med AS (SELECT min(v) AS med, max(n) AS n FROM cm WHERE 2 * cumi >= n),
      |grp AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_i,
      |   CAST(sum(CASE WHEN v > med THEN c ELSE 0 END) AS BIGINT) AS a_i,
      |   max(med) AS med, CAST(max(n) AS BIGINT) AS n
      |  FROM vg CROSS JOIN med GROUP BY 1),
      |tot AS (SELECT CAST(sum(a_i) AS BIGINT) AS aa FROM grp),
      |cc AS (SELECT g.*, t.aa, g.n_i - g.a_i AS b_i, g.n - t.aa AS bb
      |  FROM grp g CROSS JOIN tot t),
      |ct AS (SELECT n, med, aa,
      |   CASE WHEN aa > 0 AND bb > 0 THEN
      |    CAST((CAST(a_i AS HUGEINT) * n - CAST(n_i AS HUGEINT) * aa)
      |      * (CAST(a_i AS HUGEINT) * n - CAST(n_i AS HUGEINT) * aa)
      |      * 1000 // (CAST(n AS HUGEINT) * n_i * aa) AS BIGINT)
      |    + CAST((CAST(b_i AS HUGEINT) * n - CAST(n_i AS HUGEINT) * bb)
      |      * (CAST(b_i AS HUGEINT) * n - CAST(n_i AS HUGEINT) * bb)
      |      * 1000 // (CAST(n AS HUGEINT) * n_i * bb) AS BIGINT)
      |   ELSE 0 END AS contrib
      |  FROM cc),
      |ag AS (SELECT CAST(max(n) AS BIGINT) AS n,
      |   CAST(count(*) AS BIGINT) AS k_groups,
      |   CAST(max(med) AS BIGINT) AS med_centi,
      |   CAST(max(aa) AS BIGINT) AS n_above,
      |   CAST(sum(contrib) AS BIGINT) AS chi2_milli FROM ct),
      |cr AS (SELECT *, CASE k_groups - 1 WHEN 1 THEN 3841 WHEN 2 THEN 5991
      |   WHEN 3 THEN 7815 WHEN 4 THEN 9488 WHEN 5 THEN 11070
      |   WHEN 6 THEN 12592 ELSE 14067 END AS crit_milli FROM ag)
      |SELECT n, k_groups, med_centi, n_above, chi2_milli,
      | CAST(crit_milli AS BIGINT) AS crit_milli,
      | CAST(chi2_milli >= crit_milli AS BIGINT) AS reject
      |FROM cr""".stripMargin

  // q370: COCHRAN–ARMITAGE TREND TEST — the BINARY-outcome member of the
  // ordered-alternative family (q368's JT orders a CONTINUOUS response
  // across tiers; q231's two-proportion gate is unordered two-group):
  // does the post-window CONVERSION RATE rise monotonically with the
  // q307/q368 pre-activity tier — the dose-response question, tested
  // with the linear-in-scores statistic that is strictly more powerful
  // than the omnibus χ²₃ against exactly that alternative (Cochran 1954,
  // Armitage 1955). Integer staging: with tier weights w=0..3,
  // dnum = N·Σwx − A·Σwn and z² = N·dnum² / (A(N−A)(N·Σw²n − (Σwn)²));
  // staged SQUARE-FIRST (r16 ADVICE) as q1 = dnum²·1000 div (A(N−A)),
  // then z2_milli = q1·N div vcore — dnum²·1000 ≲ 9N⁴·10³ stays inside
  // DECIMAL(38)/HUGEINT at sf10 user counts (N ~ 10⁷ → ~10³²), and
  // because the only pre-division quantity floored is already the
  // ·1000-scaled ratio, the total floor error in z2_milli is ≤ ~1 milli
  // (the earlier |dnum|-first staging amplified q1's floor error by
  // |dnum|·N/vcore, which near the 3841 threshold could flip `reject`).
  // Not exact to the rational value — exact to the milli grid. One
  // (type, user) collapse; the tier pivot and the fold are ≤ types×4
  // cells.
  private def q370(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        max(when(col("hod") >= 12 && expr("CAST(round(value) AS BIGINT) >= 100"),
          1L).otherwise(0L)).as("conv"))
      .withColumn("tier", expr(
        "CASE WHEN pre_n <= 0 THEN 0L WHEN pre_n <= 2 THEN 1L WHEN pre_n <= 5 THEN 2L ELSE 3L END"))
    ug.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("conv").as("a"),
        sum(expr("tier * conv")).as("swx"),
        sum("tier").as("swn"),
        sum(expr("tier * tier")).as("sw2n"))
      .withColumn("dnum", expr(
        "CAST(n AS DECIMAL(38,0)) * swx - CAST(a AS DECIMAL(38,0)) * swn"))
      .withColumn("vcore", expr(
        "CAST(n AS DECIMAL(38,0)) * sw2n - CAST(swn AS DECIMAL(38,0)) * swn"))
      .withColumn("trend_sign", expr("CAST(sign(dnum) AS BIGINT)"))
      .withColumn("q1", expr(
        """CASE WHEN a > 0 AND a < n THEN
          | dnum * dnum * 1000 div (CAST(a AS DECIMAL(38,0)) * (n - a))
          |ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
      .withColumn("z2_milli", expr(
        """CASE WHEN vcore > 0 THEN
          | CAST(q1 * n div vcore AS BIGINT) ELSE 0L END"""
          .stripMargin))
      .withColumn("reject", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select(col("event_type"), col("n"), col("a").as("n_conv"),
        expr("CAST(swx AS BIGINT)").as("swx"),
        expr("CAST(swn AS BIGINT)").as("swn"), col("trend_sign"),
        col("z2_milli"), col("reject"))
      .orderBy("event_type")
  }

  private val q370Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS pre_n,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1, 2),
      |tg AS (SELECT event_type, conv, CASE WHEN pre_n <= 0 THEN 0
      |   WHEN pre_n <= 2 THEN 1 WHEN pre_n <= 5 THEN 2 ELSE 3 END AS tier
      |  FROM ug),
      |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |   CAST(sum(conv) AS BIGINT) AS a,
      |   CAST(sum(tier * conv) AS BIGINT) AS swx,
      |   CAST(sum(tier) AS BIGINT) AS swn,
      |   CAST(sum(tier * tier) AS BIGINT) AS sw2n
      |  FROM tg GROUP BY 1),
      |st AS (SELECT *,
      |   CAST(n AS HUGEINT) * swx - CAST(a AS HUGEINT) * swn AS dnum,
      |   CAST(n AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn AS vcore
      |  FROM ag),
      |qq AS (SELECT *, CASE WHEN a > 0 AND a < n THEN
      |   dnum * dnum * 1000 // (CAST(a AS HUGEINT) * (n - a))
      |  ELSE CAST(0 AS HUGEINT) END AS q1 FROM st)
      |SELECT event_type, n, a AS n_conv, swx, swn,
      | CAST(sign(dnum) AS BIGINT) AS trend_sign,
      | CASE WHEN vcore > 0 THEN
      |  CAST(q1 * n // vcore AS BIGINT) ELSE 0 END AS z2_milli,
      | CAST((CASE WHEN vcore > 0 THEN
      |   CAST(q1 * n // vcore AS BIGINT) ELSE 0 END)
      |  >= 3841 AS BIGINT) AS reject
      |FROM qq ORDER BY event_type""".stripMargin

  // q372: ISOTONIC CALIBRATION (PAVA via the max–min identity) — the
  // REPAIR step the calibration family stops short of: q292 measures
  // per-bin calibration error and q358 decomposes the Brier score, but
  // when the propensity curve is non-monotone the standard fix every
  // scoring pipeline applies is isotonic regression (Barlow et al. 1972)
  // — the least-squares MONOTONE fit of conversion rate on the score
  // bin. Distributed form: PAVA is sequential, but on the bounded bin
  // grid the closed-form max–min identity iso(i) = max_{j≤i} min_{k≥i}
  // avg(j..k) (Ayer et al. 1955) turns it into pure relational algebra —
  // prefix sums give every interval average from ONE cumulative window,
  // the (j,k) interval frame is ≤ B(B+1)/2 rows per type (B = 10 bins),
  // and two nested grid aggregations produce the fit. Interval averages
  // are compared on the truncated micro grid (both engines truncate
  // identically, and weighted averages of conversion rates are
  // nonnegative, so truncation is order-stable). pooled=1 marks bins the
  // fit moved — a monotone profile returns iso == raw everywhere. The
  // flag compares iso and raw AFTER micro-grid truncation (r16 ADVICE):
  // a bin PAVA moved by less than 1e-6 can floor to pooled=0 (a
  // sub-micro false-negative window); the flag is exact on the micro
  // grid only because floor commutes with the max–min identity — max
  // and min of floors equal the floor of max/min — not because the
  // rational fit was compared. Compare the winning interval's sums
  // cross-multiplied against n_conv/n_users if an exact rational flag
  // is ever needed. 100 TB:
  // one (type, user) collapse, then everything lives on the ≤ 10-bin
  // grid; the interval frame is a constant of the grid, not the corpus.
  private def q372(s: SparkSession, d: String): DataFrame = {
    val ug = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("pre_n"),
        max(when(col("hod") >= 12 && expr("CAST(round(value) AS BIGINT) >= 100"),
          1L).otherwise(0L)).as("conv"))
      .withColumn("bin", least(col("pre_n"), lit(9L)))
    val bins = ug.groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
    graft.Caches.persist(bins)
    val wc = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cn", sum("n_users").over(wc))
      .withColumn("cx", sum("n_conv").over(wc))
    val l = cum.select(col("event_type"), col("bin").as("j"),
      col("n_users").as("nj"), col("n_conv").as("xj"),
      col("cn").as("cnj"), col("cx").as("cxj"))
    val r = cum.select(col("event_type"), col("bin").as("k"),
      col("cn").as("cnk"), col("cx").as("cxk"))
    val pairs = l.join(r, Seq("event_type")).filter(col("j") <= col("k"))
      .withColumn("avg_micro", expr(
        """CAST((cxk - cxj + xj) * CAST(1000000 AS DECIMAL(38,0))
          | div (cnk - cnj + nj) AS BIGINT)""".stripMargin))
      .select("event_type", "j", "k", "avg_micro")
    val iso = bins.select(col("event_type"), col("bin").as("i"))
      .join(pairs, Seq("event_type"))
      .filter(col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("event_type", "i", "j").agg(min("avg_micro").as("mn"))
      .groupBy("event_type", "i").agg(max("mn").as("iso_micro"))
    bins.as("b").join(iso.as("o"),
        expr("b.event_type = o.event_type AND b.bin = o.i"))
      .withColumn("raw_micro", expr(
        "CAST(b.n_conv * CAST(1000000 AS DECIMAL(38,0)) div b.n_users AS BIGINT)"))
      .select(col("b.event_type").as("event_type"), col("b.bin").as("bin"),
        col("b.n_users").as("n_users"), col("b.n_conv").as("n_conv"),
        col("raw_micro"), col("o.iso_micro").as("iso_micro"),
        expr("CAST(iso_micro != raw_micro AS BIGINT)").as("pooled"))
      .orderBy("event_type", "bin")
  }

  private val q372Sql =
    """WITH ug AS (SELECT event_type, user_id,
      |   sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
      |     THEN 1 ELSE 0 END) AS pre_n,
      |   max(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
      |     AND CAST(round(value) AS BIGINT) >= 100 THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1, 2),
      |bins AS (SELECT event_type, least(pre_n, 9) AS bin,
      |   CAST(count(*) AS BIGINT) AS n_users,
      |   CAST(sum(conv) AS BIGINT) AS n_conv
      |  FROM ug GROUP BY 1, 2),
      |cum AS (SELECT *,
      |   sum(n_users) OVER (PARTITION BY event_type ORDER BY bin
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |   sum(n_conv) OVER (PARTITION BY event_type ORDER BY bin
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx
      |  FROM bins),
      |pairs AS (SELECT l.event_type, l.bin AS j, r.bin AS k,
      |   CAST((r.cx - l.cx + l.n_conv) * CAST(1000000 AS HUGEINT)
      |     // (r.cn - l.cn + l.n_users) AS BIGINT) AS avg_micro
      |  FROM cum l JOIN cum r ON l.event_type = r.event_type AND l.bin <= r.bin),
      |inner_min AS (SELECT b.event_type, b.bin AS i, p.j,
      |   min(p.avg_micro) AS mn
      |  FROM bins b JOIN pairs p ON p.event_type = b.event_type
      |   AND p.j <= b.bin AND b.bin <= p.k
      |  GROUP BY 1, 2, 3),
      |iso AS (SELECT event_type, i, CAST(max(mn) AS BIGINT) AS iso_micro
      |  FROM inner_min GROUP BY 1, 2)
      |SELECT b.event_type, CAST(b.bin AS BIGINT) AS bin, b.n_users, b.n_conv,
      | CAST(b.n_conv * CAST(1000000 AS HUGEINT) // b.n_users AS BIGINT) AS raw_micro,
      | i.iso_micro,
      | CAST(i.iso_micro != CAST(b.n_conv * CAST(1000000 AS HUGEINT)
      |   // b.n_users AS BIGINT) AS BIGINT) AS pooled
      |FROM bins b JOIN iso i ON i.event_type = b.event_type AND i.i = b.bin
      |ORDER BY b.event_type, b.bin""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q369_mood_median" -> (q369 _),
    "q370_cochran_armitage" -> (q370 _),
    "q372_isotonic_calibration" -> (q372 _),
    "q366_wilcoxon_signed_rank" -> (q366 _),
    "q367_cliffs_delta" -> (q367 _),
    "q368_jonckheere_terpstra" -> (q368 _),
    "q329_smd_balance" -> (q329 _),
    "q279_cuped_adjustment" -> (q279 _),
    "q280_mann_whitney" -> (q280 _),
    "q281_ratio_variance" -> (q281 _),
    "q282_simpson_audit" -> (q282 _),
    "q291_wasserstein_drift" -> (q291 _),
    "q292_calibration_audit" -> (q292 _),
    "q293_obrien_fleming" -> (q293 _),
    "q297_quantile_effect" -> (q297 _),
    "q300_mde_calculator" -> (q300 _),
    "q301_mann_kendall" -> (q301 _),
    "q303_did_estimator" -> (q303 _),
    "q304_aa_calibration" -> (q304 _),
    "q305_binseg_changepoints" -> (q305 _),
    "q306_srm_guardrail" -> (q306 _),
    "q307_post_stratification" -> (q307 _),
    "q308_nelson_aalen" -> (q308 _),
    "q309_logrank_test" -> (q309 _),
    "q310_transition_matrix" -> (q310 _),
    "q311_markov_stationary" -> (q311 _),
    "q312_attribution" -> (q312 _),
    "q313_uplift_qini" -> (q313 _),
    "q314_cox_score_test" -> (q314 _),
    "q315_rfm_segments" -> (q315 _),
    "q316_cramer_von_mises" -> (q316 _),
    "q340_kruskal_wallis" -> (q340 _),
    "q346_cmh_test" -> (q346 _),
    "q349_rate_ratio" -> (q349 _),
    "q351_effect_size" -> (q351 _),
    "q353_tukey_hsd" -> (q353 _),
    "q354_rerandomization" -> (q354 _),
    "q355_quasi_poisson" -> (q355 _),
    "q356_kaplan_meier" -> (q356 _),
    "q357_sign_test" -> (q357 _),
    "q358_brier_decomposition" -> (q358 _),
    "q359_cochran_q" -> (q359 _),
    "q360_friedman" -> (q360 _),
    "q361_mh_odds_ratio" -> (q361 _),
    "q363_page_trend" -> (q363 _),
    "q364_kendall_w" -> (q364 _),
    "q341_brown_forsythe" -> (q341 _),
    "q342_mcnemar" -> (q342 _))

  override val oracles: Map[String, String] = Map(
    "q369_mood_median" -> q369Sql,
    "q370_cochran_armitage" -> q370Sql,
    "q372_isotonic_calibration" -> q372Sql,
    "q366_wilcoxon_signed_rank" -> q366Sql,
    "q367_cliffs_delta" -> q367Sql,
    "q368_jonckheere_terpstra" -> q368Sql,
    "q329_smd_balance" -> q329Sql,
    "q279_cuped_adjustment" -> q279Sql,
    "q280_mann_whitney" -> q280Sql,
    "q281_ratio_variance" -> q281Sql,
    "q282_simpson_audit" -> q282Sql,
    "q291_wasserstein_drift" -> q291Sql,
    "q292_calibration_audit" -> q292Sql,
    "q293_obrien_fleming" -> q293Sql,
    "q297_quantile_effect" -> q297Sql,
    "q300_mde_calculator" -> q300Sql,
    "q301_mann_kendall" -> q301Sql,
    "q303_did_estimator" -> q303Sql,
    "q304_aa_calibration" -> q304Sql,
    "q305_binseg_changepoints" -> q305Sql,
    "q306_srm_guardrail" -> q306Sql,
    "q307_post_stratification" -> q307Sql,
    "q308_nelson_aalen" -> q308Sql,
    "q309_logrank_test" -> q309Sql,
    "q310_transition_matrix" -> q310Sql,
    "q311_markov_stationary" -> q311Sql,
    "q312_attribution" -> q312Sql,
    "q313_uplift_qini" -> q313Sql,
    "q314_cox_score_test" -> q314Sql,
    "q315_rfm_segments" -> q315Sql,
    "q316_cramer_von_mises" -> q316Sql,
    "q340_kruskal_wallis" -> q340Sql,
    "q346_cmh_test" -> q346Sql,
    "q349_rate_ratio" -> q349Sql,
    "q351_effect_size" -> q351Sql,
    "q353_tukey_hsd" -> q353Sql,
    "q354_rerandomization" -> q354Sql,
    "q355_quasi_poisson" -> q355Sql,
    "q356_kaplan_meier" -> q356Sql,
    "q357_sign_test" -> q357Sql,
    "q358_brier_decomposition" -> q358Sql,
    "q359_cochran_q" -> q359Sql,
    "q360_friedman" -> q360Sql,
    "q361_mh_odds_ratio" -> q361Sql,
    "q363_page_trend" -> q363Sql,
    "q364_kendall_w" -> q364Sql,
    "q341_brown_forsythe" -> q341Sql,
    "q342_mcnemar" -> q342Sql)
}
