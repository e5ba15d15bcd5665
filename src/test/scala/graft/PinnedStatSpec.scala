package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.operators.{AuditOps, CurationOps, ExperimentOps, ScaleOps, SeriesOps}

/** Textbook-pinned fixtures for the statistical gates (r14 ADVICE item 3).
  *
  * The brute-force mirror specs re-derive expected values with the SAME
  * integer staging as the implementation, so a shared-formula error (the
  * q340 750-vs-3000 factor, the q338 extra n-divisor — both found by the
  * r14 advisor, both invisible to the DuckDB oracle because the SQL twin
  * mirrors the bug) passes the suite AND the oracle sweep. This suite
  * breaks that loop: each fixture is a tiny hand-built events table whose
  * statistic has a KNOWN closed-form / scipy-verified value, asserted as
  * a literal — no staging shared with the implementation.
  *
  *  - q340 on A={1..3}, B={4..6}: scipy.stats.kruskal -> H = 3.8571429,
  *    so h_milli = 3857 exactly under the documented truncating staging
  *    (3000*348 div 42 - 21000), no ties -> corr_milli = 1000, df=1
  *    crit 3.841 -> reject = 1.
  *  - q338 on daily counts [1×5, 3×5]: n=10, n1=n2=5, R=2 runs;
  *    E[R] = 6, Var[R] = 2·25·40/(100·9) = 20/9, z = (2-6)/√(20/9)
  *    -> z² = 7.2 exactly (Wald–Wolfowitz 1940 closed form), so
  *    z2_milli = 7200, clustered sign -1, reject = 1.
  */
class PinnedStatSpec extends SparkSpec {

  /** Write a tiny events fixture (driver schema: event_id, ts, user_id,
    * event_type, value, props) and return its table dir. Rows carry
    * explicit (user_id, ts-micros) so hour-of-day windows and md5 arm
    * buckets are controllable. */
  private def eventsRaw(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("graft-pinned").toString
    val s = spark
    import s.implicits._
    val df: DataFrame = rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .selectExpr("event_id", "timestamp_micros(us) AS ts",
        "user_id", "event_type", "value", "'{}' AS props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Day-grain shorthand: ts = day·86400e6 + event_id µs, user = id. */
  private def eventsFixture(rows: Seq[(Long, Long, String, Double)]): String =
    eventsRaw(rows.map { case (id, day, t, v) =>
      (id, day * 86400000000L + id, id, t, v)
    })

  test("q340 pinned: kruskal({1,2,3},{4,5,6}) H=3.857, rejects at df=1") {
    val rows = Seq(1, 2, 3).map(v => (v.toLong, 0L, "a", v / 100.0)) ++
      Seq(4, 5, 6).map(v => (v.toLong, 0L, "b", v / 100.0))
    val g = ExperimentOps.queries("q340_kruskal_wallis")(spark, eventsFixture(rows))
      .collect()
    assert(g.length === 1)
    val r = g.head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("h_milli") === 3857L)      // scipy: 3.8571429
    assert(r.getAs[Long]("corr_milli") === 1000L)   // no ties
    assert(r.getAs[Long]("h_adj_milli") === 3857L)
    assert(r.getAs[Long]("crit_milli") === 3841L)   // chi2(1, .95)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q340 pinned: identical groups give H<=0, no rejection") {
    // both groups share {1,2,3}: every rank sum is tied-midrank equal, so
    // the true H = 0; truncating staging may land epsilon below
    val rows = Seq(1, 2, 3).map(v => (v.toLong, 0L, "a", v / 100.0)) ++
      Seq(1, 2, 3).map(v => (v.toLong + 3, 0L, "b", v / 100.0))
    val r = ExperimentOps.queries("q340_kruskal_wallis")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("h_milli") <= 0L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q338 pinned: 10-day two-block series has R=2, z²=7.2, clustered") {
    // five days of 1 event, five days of 3 events -> marks FFFFFTTTTT
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day < 5) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val g = SeriesOps.queries("q338_runs_test")(spark, eventsFixture(rows))
      .collect()
    assert(g.length === 1)
    val r = g.head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("median_y") === 1L)  // lower median of {1×5,3×5}
    assert(r.getAs[Long]("n_above") === 5L)
    assert(r.getAs[Long]("runs") === 2L)
    assert(r.getAs[Long]("gap_sign") === -1L) // too few runs = clustered
    assert(r.getAs[Long]("z2_milli") === 7200L) // closed form z² = 7.2
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q280 pinned: mannwhitneyu({1,2,3},{4,5,6}) z²=3.857, doubled U=0") {
    // md5("1"/"3"/"6") land in arm 0, md5("2"/"4"/"5") in arm 1
    // (precomputed); arm0 takes values 1..3, arm1 takes 4..6 ->
    // U_arm0 = 0, mu = 4.5, Var = 9·7/12 = 5.25, z² = 4.5²/5.25 = 3.857
    // (scipy.stats.mannwhitneyu: U=0, and the normal-approx z matches
    // the q340 H for k=2 by the rank-test identity).
    val rows = Seq((1L, 0.01), (3L, 0.02), (6L, 0.03),
      (2L, 0.04), (4L, 0.05), (5L, 0.06)).zipWithIndex.map {
      case ((u, v), i) => (i + 1L, i * 1000L, u, "a", v)
    }
    val r = graft.operators.ExperimentOps.queries("q280_mann_whitney")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("u2_a") === 0L)       // doubled U_A, all A below B
    assert(r.getAs[Long]("ties") === 0L)
    assert(r.getAs[Long]("z2_milli") === 3857L) // z² = 27/7
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q347 pinned: Grubbs on {1×9, 11}: G²=8.1 vs table crit 5.244 at n=10") {
    // mean 2, s² = 10, G = (11-2)/√10 -> G² = 8.1; Grubbs' published
    // two-sided α=.05 critical at n=10 is G = 2.290 -> G² ≈ 5.244
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day == 9) 11 else 1
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = graft.operators.SeriesOps.queries("q347_grubbs_outlier")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("peak_day") === 9L)
    assert(r.getAs[Long]("peak_sign") === 1L)
    assert(r.getAs[Long]("g2_milli") === 8100L)
    assert(r.getAs[Long]("crit_milli") === 5244L)
    assert(r.getAs[Long]("outlier") === 1L)
  }

  test("q350 pinned: kendalltau(e=(1,2,3), p=(3,1,2)) = -1/3") {
    // daily error counts rise 1,2,3; purchase counts 3,1,2 ->
    // C-D = -1 over 3 pairs, no ties: tau = -1/3 (scipy.stats
    // .kendalltau -> -0.3333), tau² staged as (333)·1 div 3 = 111
    var id = 0L
    val rows = Seq((0L, 1, 3), (1L, 2, 1), (2L, 3, 2)).flatMap {
      case (day, e, p) =>
        val errs = (0 until e).map { _ => id += 1; (id, day, "error", 1.0) }
        val purs = (0 until p).map { _ => id += 1; (id, day, "purchase", 1.0) }
        errs ++ purs
    }
    val r = graft.operators.SeriesOps.queries("q350_kendall_tau")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Long]("cd") === -1L)
    assert(r.getAs[Long]("t_e") === 0L)
    assert(r.getAs[Long]("t_p") === 0L)
    assert(r.getAs[Long]("tau_sign") === -1L)
    assert(r.getAs[Long]("tau2_milli") === 111L)
  }

  test("q342 pinned: McNemar b=1,c=9 -> corrected χ² = 4.9, rejects") {
    // textbook continuity-corrected χ²₁ = (|1-9|-1)²/10 = 4.9; two
    // concordant both-window users only feed n_both
    val am = 6L * 3600000000L   // 06:00, pre window (hod < 12)
    val pm = 18L * 3600000000L  // 18:00, post window
    var id = 0L
    def ev(u: Long, us: Long) = { id += 1; (id, us, u, "a", 1.0) }
    val rows =
      Seq(ev(101L, am)) ++                            // b: pre-only
        (1 to 9).map(u => ev(200L + u, pm)) ++        // c: post-only ×9
        Seq(ev(301L, am), ev(301L, pm),               // both
          ev(302L, am), ev(302L, pm))
    val r = graft.operators.ExperimentOps.queries("q342_mcnemar")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n_both") === 2L)
    assert(r.getAs[Long]("b_pre_only") === 1L)
    assert(r.getAs[Long]("c_post_only") === 9L)
    assert(r.getAs[Long]("z2_milli") === 4900L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q357 pinned: sign test 1 up / 9 down / 2 tied -> corrected χ² = 4.9") {
    // continuity-corrected χ²₁ = (|1-9|-1)²/10 = 4.9; ties excluded
    val am = 6L * 3600000000L
    val pm = 18L * 3600000000L
    var id = 0L
    def ev(u: Long, us: Long, v: Double) = { id += 1; (id, us, u, "a", v) }
    val rows =
      Seq(ev(1L, am, 0.01), ev(1L, pm, 0.02)) ++                 // up
        (1 to 9).flatMap(u =>
          Seq(ev(100L + u, am, 0.02), ev(100L + u, pm, 0.01))) ++ // down ×9
        Seq(ev(201L, am, 0.01), ev(201L, pm, 0.01),               // tied ×2
          ev(202L, am, 0.03), ev(202L, pm, 0.03))
    val r = graft.operators.ExperimentOps.queries("q357_sign_test")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n_up") === 1L)
    assert(r.getAs[Long]("n_down") === 9L)
    assert(r.getAs[Long]("n_tied") === 2L)
    assert(r.getAs[Long]("z2_milli") === 4900L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q337 pinned: Ljung-Box on 9-day alternation: Q = 41.979, rejects at m=7") {
    // y = 3,1,3,1,3,1,3,1,3: dd = 9y-19 ∈ {8,-10}, den = 720; per-lag
    // staged terms 98568/85140/73926/59187/49284/33285/24642 sum to
    // 424032, Q·1000 = 9·11·424032 div 1000 = 41979 — matching the
    // textbook Q = n(n+2)Σr²ₖ/(n−k) ≈ 41.97 for r₁ = −0.889 etc.;
    // χ²₇ crit 14.067 -> strong rejection (real linear memory)
    var id = 0L
    val rows = (0 until 9).flatMap { day =>
      val y = if (day % 2 == 0) 3 else 1
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = graft.operators.SeriesOps.queries("q337_ljung_box")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("n_days") === 9L)
    assert(r.getAs[Long]("m_lags") === 7L)
    assert(r.getAs[Long]("q_lb_milli") === 41979L)
    assert(r.getAs[Long]("crit_milli") === 14067L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q366 pinned: Wilcoxon on d={+1..+5,-6}: W+=15, z²=0.890") {
    // |d| ranks 1..6, positives take 1..5 -> W+ = 15 (doubled 30),
    // E = 10.5, Var = 6·7·13/24 = 22.75 -> z = 4.5/√22.75, z² = 0.8901
    // (textbook no-tie case); staged: 81·12000 div 1092 = 890
    val am = 6L * 3600000000L
    val pm = 18L * 3600000000L
    var id = 0L
    def ev(u: Long, us: Long, v: Double) = { id += 1; (id, us, u, "a", v) }
    val rows = (1 to 5).map(k => ev(k.toLong, pm, k / 100.0)) ++
      Seq(ev(6L, am, 0.06))
    val r = graft.operators.ExperimentOps.queries("q366_wilcoxon_signed_rank")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("w2_pos") === 30L)
    assert(r.getAs[Long]("ties") === 0L)
    assert(r.getAs[Long]("gap_sign") === 1L)
    assert(r.getAs[Long]("z2_milli") === 890L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q367 pinned: arms {1,2,3} vs {4,5,6} give delta = -1 (large)") {
    // every A value below every B value: gt=0, lt=9 -> δ = -1 exactly
    val rows = Seq((1L, 0.01), (3L, 0.02), (6L, 0.03),
      (2L, 0.04), (4L, 0.05), (5L, 0.06)).zipWithIndex.map {
      case ((u, v), i) => (i + 1L, i * 1000L, u, "a", v)
    }
    val r = graft.operators.ExperimentOps.queries("q367_cliffs_delta")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("gt") === 0L)
    assert(r.getAs[Long]("lt") === 9L)
    assert(r.getAs[Long]("t_ab") === 0L)
    assert(r.getAs[Long]("delta_sign") === -1L)
    assert(r.getAs[Long]("delta_milli") === 1000L)
    assert(r.getAs[String]("magnitude") === "large")
  }

  test("q368 pinned: tiers {1,2}<{3,4}<{5,6}: JT=12, z²=5.684, rejects") {
    // U_01 = U_02 = U_12 = 4 -> JT = 12 (doubled 24); E = 6, Var =
    // (540-84)/72 = 6.333 -> z = 6/2.517, z² = 5.6842 (textbook
    // Jonckheere no-tie case); staged: 144·18000 div 456 = 5684
    val am = 6L * 3600000000L
    val pm = 18L * 3600000000L
    var id = 0L
    def ev(u: Long, us: Long, v: Double) = { id += 1; (id, us, u, "a", v) }
    val rows =
      Seq(ev(1L, pm, 0.01), ev(2L, pm, 0.02)) ++            // tier 0
        Seq(ev(3L, am, 0.0), ev(3L, pm, 0.03),              // tier 1 (1 am)
          ev(4L, am, 0.0), ev(4L, pm, 0.04)) ++
        (1 to 3).flatMap(_ => Seq(ev(5L, am, 0.0))) ++      // tier 2 (3 am)
        Seq(ev(5L, pm, 0.05)) ++
        (1 to 3).flatMap(_ => Seq(ev(6L, am, 0.0))) ++
        Seq(ev(6L, pm, 0.06))
    val r = graft.operators.ExperimentOps.queries("q368_jonckheere_terpstra")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("jt2") === 24L)
    assert(r.getAs[Long]("e2") === 12L)
    assert(r.getAs[Long]("trend_sign") === 1L)
    assert(r.getAs[Long]("z2_milli") === 5684L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q359 pinned: Cochran's Q on the 4×4 flag table = 6.0") {
    // users' day-part flags: (1111),(1100),(1000),(1110) -> C=(4,3,2,1),
    // N=10, ΣC²=30, ΣR²=30: Q = 3(4·30−100)/(4·10−30) = 6.0 exactly
    var id = 0L
    def ev(u: Long, hour: Long) = {
      id += 1; (id, hour * 3600000000L, u, "a", 0.01)
    }
    val rows = Seq(ev(1L, 3L), ev(1L, 9L), ev(1L, 15L), ev(1L, 21L),
      ev(2L, 3L), ev(2L, 9L),
      ev(3L, 3L),
      ev(4L, 3L), ev(4L, 9L), ev(4L, 15L))
    val r = graft.operators.ExperimentOps.queries("q359_cochran_q")(
      spark, eventsRaw(rows)).collect().head
    assert(r.getAs[Long]("n_users") === 4L)
    assert((r.getAs[Long]("c0"), r.getAs[Long]("c1"),
      r.getAs[Long]("c2"), r.getAs[Long]("c3")) === ((4L, 3L, 2L, 1L)))
    assert(r.getAs[Long]("q_milli") === 6000L)
    assert(r.getAs[Long]("reject") === 0L) // 6.0 < χ²₃ 7.815
  }

  test("q360/q363/q364 pinned: 3 users in perfect part order -> χ²=9, z²=9, W=1") {
    // every user spends more each later day-part: Friedman χ² =
    // 12/(nk(k+1))ΣR² − 3n(k+1) = 9.0 (rejects at χ²₃ 7.815); Page's
    // L = 90 with E=75, Var=25 -> z² = 9.0; Kendall's W = χ²/(n(k−1)) = 1
    var id = 0L
    val rows = for { u <- 1L to 3L; p <- 0 to 3 } yield {
      id += 1; (id, (p * 6 + 3).toLong * 3600000000L, u, "a", (p + 1) / 100.0)
    }
    val fx = eventsFixtureDir(rows)
    val f = graft.operators.ExperimentOps.queries("q360_friedman")(
      spark, fx).collect().head
    assert(f.getAs[Long]("n_users") === 3L)
    assert((f.getAs[Long]("dd0"), f.getAs[Long]("dd1"),
      f.getAs[Long]("dd2"), f.getAs[Long]("dd3")) === ((6L, 12L, 18L, 24L)))
    assert(f.getAs[Long]("chi2_milli") === 9000L)
    assert(f.getAs[Long]("reject") === 1L)
    val l = graft.operators.ExperimentOps.queries("q363_page_trend")(
      spark, fx).collect().head
    assert(l.getAs[Long]("l2") === 180L)
    assert(l.getAs[Long]("trend_sign") === 1L)
    assert(l.getAs[Long]("z2_milli") === 9000L)
    assert(l.getAs[Long]("reject") === 1L)
    val w = graft.operators.ExperimentOps.queries("q364_kendall_w")(
      spark, fx).collect().head
    assert(w.getAs[Long]("chi2_milli") === 9000L)
    assert(w.getAs[Long]("w_milli") === 1000L)
    assert(w.getAs[String]("agreement") === "strong")
  }

  /** eventsRaw for an already-built Seq (shared across several queries). */
  private def eventsFixtureDir(rows: Seq[(Long, Long, Long, String, Double)]): String =
    eventsRaw(rows)

  test("q338 pinned: perfectly alternating series rejects with positive sign") {
    // counts 1,3,1,3,... -> 10 runs of length 1; z = (10-6)/√(20/9),
    // z² = 16·9/20 = 7.2 -> alternating rejection, sign +1
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day % 2 == 0) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = SeriesOps.queries("q338_runs_test")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("runs") === 10L)
    assert(r.getAs[Long]("gap_sign") === 1L)
    assert(r.getAs[Long]("z2_milli") === 7200L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  // ---- r16 additions: the k-sample/post-hoc, stratified-2x2, and
  // survival packs (r15 verdict task 5). Every fixture is chosen so the
  // documented integer staging is EXACT (all divisions land integral),
  // making the asserted literal equal the closed-form/scipy value with
  // at most one final documented floor.

  test("q341 pinned: scipy levene(center='median') W = 2.057 on 5+5, no rejection") {
    // A = {0,5,10,15,20}, B = {0,10,20,30,40} centi (odd n -> the grid
    // lower median IS the true median: 10 and 20). z_A = {10,5,0,5,10}
    // (mean 6), z_B = {20,10,0,10,20} (mean 12), grand mean 9:
    // SSB = 5*9+5*9 = 90, SSW = 70+280 = 350, W = (8/1)*(90/350)
    // = 2.0571429 (scipy.stats.levene center='median') -> 2057 milli.
    val rows = Seq(0, 5, 10, 15, 20).map(v => (v.toLong + 1, 0L, "a", v / 100.0)) ++
      Seq(0, 10, 20, 30, 40).map(v => (v.toLong + 100, 0L, "b", v / 100.0))
    val r = ExperimentOps.queries("q341_brown_forsythe")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("mad_min_centi") === 6L)
    assert(r.getAs[Long]("mad_max_centi") === 12L)
    assert(r.getAs[Long]("f_milli") === 2057L)   // scipy: 2.0571429
    assert(r.getAs[Long]("crit_milli") === 3841L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q341 pinned: 5x spread gap gives W = 8.249, rejects") {
    // B scaled x5: z_B = {100,50,0,50,100} (mean 60); grand mean
    // (30+300)/10 = 33, SSB = 5*729+5*729 = 7290, SSW = 70+7000 = 7070,
    // W = 8*7290/7070 = 8.2489392 (scipy levene center='median').
    val rows = Seq(0, 5, 10, 15, 20).map(v => (v.toLong + 1, 0L, "a", v / 100.0)) ++
      Seq(0, 50, 100, 150, 200).map(v => (v.toLong + 100, 0L, "b", v / 100.0))
    val r = ExperimentOps.queries("q341_brown_forsythe")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("f_milli") === 8248L)   // scipy: 8.2489392
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q353 pinned: Tukey-Kramer q_obs = 8.98 > q(2,inf) = 2.772, significant") {
    // A = {0,0,4,4} (mean 2, SS 16), B = {10,12,14,16} (mean 13, SS 20):
    // MSW = 36/6 = 6 exactly, SE = sqrt(6/2*(1/4+1/4)) = sqrt(1.5),
    // q_obs = 11/1.22474 = 8.981 > 2.772 (studentized range, k=2, inf df).
    val rows = Seq(0, 0, 4, 4).zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, 0L, "a", v / 100.0)
    } ++ Seq(10, 12, 14, 16).zipWithIndex.map { case (v, i) =>
      (i.toLong + 100, 0L, "b", v / 100.0)
    }
    val r = ExperimentOps.queries("q353_tukey_hsd")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[String]("type_a") === "a")
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Long]("gap_sign") === 1L)
    assert(r.getAs[Long]("gap_mc") === 11000L)   // mean gap 11 centi
    assert(r.getAs[Long]("significant") === 1L)
  }

  test("q353 pinned: q_obs = 2.0 < 2.772, not significant") {
    // A = {0,0,4,4} (mean 2, SS 16), B = {2,4,4,6} (mean 4, SS 8):
    // MSW = 24/6 = 4, SE = sqrt(4/2*(1/2)) = 1, q_obs = 2/1 = 2 < 2.772.
    val rows = Seq(0, 0, 4, 4).zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, 0L, "a", v / 100.0)
    } ++ Seq(2, 4, 4, 6).zipWithIndex.map { case (v, i) =>
      (i.toLong + 100, 0L, "b", v / 100.0)
    }
    val r = ExperimentOps.queries("q353_tukey_hsd")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("gap_mc") === 2000L)
    assert(r.getAs[Long]("significant") === 0L)
  }

  /** The shared stratified-2x2 fixture for q346/q361. md5 arm buckets
    * (hashBucket(user_id, 2), engine-portable) pinned by direct md5
    * computation: arm0 = {1,3,6,9,10,13,16,17,18,20,21,22},
    * arm1 = {2,4,5,7,8,11,12,14,15,19,24,26}. Stratum tier1 (pre_n=1):
    * arm0 = 8 users (7 convert), arm1 = 8 users (3 convert) -> a=7,
    * m1=10, m0=6, T=16. Stratum tier2 (pre_n=3): arm0 = 4 users
    * (1 converts), arm1 = 4 users (0 convert) -> a=1, m1=1, m0=7, T=8.
    * Chosen so every staged ratio is exact: E1 = 8*10/16 = 5,
    * V1 = 8*8*10*6/(256*15) = 1.0; E2 = 4*1/8 = 0.5,
    * V2 = 4*4*1*7/(64*7) = 0.25. */
  private def stratified2x2Fixture(): String = {
    val am = 6L * 3600000000L
    val pm = 18L * 3600000000L
    var id = 0L
    def ev(u: Long, us: Long) = { id += 1; (id, us, u, "a", 1.0) }
    def user(u: Long, mornings: Int, converts: Boolean) =
      (1 to mornings).map(h => ev(u, am + h * 60000000L)) ++
        (if (converts) Seq(ev(u, pm)) else Seq.empty)
    val rows =
      Seq(1L, 3L, 6L, 9L, 10L, 13L, 16L).flatMap(user(_, 1, converts = true)) ++
        user(17L, 1, converts = false) ++
        Seq(2L, 4L, 5L).flatMap(user(_, 1, converts = true)) ++
        Seq(7L, 8L, 11L, 12L, 14L).flatMap(user(_, 1, converts = false)) ++
        user(18L, 3, converts = true) ++
        Seq(20L, 21L, 22L).flatMap(user(_, 3, converts = false)) ++
        Seq(15L, 19L, 24L, 26L).flatMap(user(_, 3, converts = false))
    eventsRaw(rows)
  }

  test("q346 pinned: CMH over two exact strata = 5.000, rejects") {
    // CMH chi2 (no continuity correction) = (sum(a-E))^2 / sum(V)
    //   = ((7-5)+(1-0.5))^2 / (1.0+0.25) = 2.5^2/1.25 = 5.0 exactly
    // (statsmodels StratifiedTable.test_null_odds(correction=False)).
    val r = ExperimentOps.queries("q346_cmh_test")(spark, stratified2x2Fixture())
      .collect().head
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("conv_a") === 8L)
    assert(r.getAs[Long]("conv_total") === 11L)
    assert(r.getAs[Long]("dnum_micro") === 2500000L)
    assert(r.getAs[Long]("z2_milli") === 5000L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q361 pinned: MH pooled OR = 14.333 vs crude OR = 6.000, confounded") {
    // OR_MH = (7*5/16 + 1*4/8) / (1*3/16 + 3*0/8) = 2.6875/0.1875
    //       = 14.3333 (statsmodels StratifiedTable.oddsratio_pooled);
    // crude = (8*9)/(4*3) = 6.0; gap 8333 milli >= 100 -> confounded.
    val r = ExperimentOps.queries("q361_mh_odds_ratio")(spark, stratified2x2Fixture())
      .collect().head
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("or_crude_milli") === 6000L)
    assert(r.getAs[Long]("or_mh_milli") === 14333L)
    assert(r.getAs[Long]("confounded") === 1L)
  }

  /** Shared survival fixture for q356/q308: 8 users all entering day 0,
    * exits x = {2, 4, 4, 6, 8, 10, 10, 10}; dmax = 10 so x >= 8 is
    * censored -> deaths at days 2 (1), 4 (2), 6 (1). Every KM step is
    * exact in ppm: S = 1 -> 7/8 -> 5/8 -> 1/2. */
  private def survivalFixture(): String = {
    var id = 0L
    def ev(u: Long, day: Long) = { id += 1; (id, day * 86400000000L + id, u, "a", 1.0) }
    val exits = Seq(1L -> 2L, 2L -> 4L, 3L -> 4L, 4L -> 6L,
      5L -> 8L, 6L -> 10L, 7L -> 10L, 8L -> 10L)
    eventsRaw(exits.flatMap { case (u, x) => Seq(ev(u, 0L), ev(u, x)) })
  }

  test("q356 pinned: KM S = {7/8, 5/8, 1/2}, median day 6, RMST(10) = 7.0") {
    // lifelines KaplanMeierFitter on these spells: S(2) = 0.875,
    // S(4) = 0.625, S(6) = 0.5 (all exact in ppm), median = 6 (first
    // S <= 0.5), RMST over [0,10] = 2 + 1.75 + 1.25 + 1 + 1 = 7.0.
    val r = ExperimentOps.queries("q356_kaplan_meier")(spark, survivalFixture())
      .collect().head
    assert(r.getAs[Long]("n_users") === 8L)
    assert(r.getAs[Long]("n_deaths") === 4L)
    assert(r.getAs[Long]("s_final_ppm") === 500000L)
    assert(r.getAs[Long]("rmst_ppm_days") === 7000000L)
    assert(r.getAs[Long]("median_day") === 6L)
  }

  test("q308 pinned: Nelson-Aalen H = 1/8, +2/7, +1/5 = 0.610714 cumulative") {
    // H(2) = 0.125, H(4) = 1/8+2/7 = 23/56 = 0.4107143, H(6) =
    // 0.6107143 (closed form); risk sets 8,8,7,5,4,3 from the
    // difference array; 1 censored exit at day 8, 3 at day 10.
    val rows = ExperimentOps.queries("q308_nelson_aalen")(spark, survivalFixture())
      .collect()
    assert(rows.length === 6)
    val byDay = rows.map(r => r.getAs[Long]("day") ->
      (r.getAs[Long]("n_risk"), r.getAs[Long]("deaths"),
        r.getAs[Long]("censored"), r.getAs[Long]("h_cum_micro"))).toMap
    assert(byDay(0L) === ((8L, 0L, 0L, 0L)))
    assert(byDay(2L) === ((8L, 1L, 0L, 125000L)))
    assert(byDay(4L) === ((7L, 2L, 0L, 410714L)))   // 23/56 = 0.41071428
    assert(byDay(6L) === ((5L, 1L, 0L, 610714L)))
    assert(byDay(8L) === ((4L, 0L, 1L, 610714L)))
    assert(byDay(10L) === ((3L, 0L, 3L, 610714L)))
  }

  test("q309 pinned: one-death log-rank z2 = 2/3 and 1/4 on exact risk sets") {
    // Type 'a': arms 6/4 at risk, one arm-A death at day 1:
    //   E = 0.6, V = 6*4/100 = 0.24, z2 = 0.4^2/0.24 = 2/3 -> 666 milli
    //   (floor). Type 'b': arms 4/16, one arm-B death: E = 0.2,
    //   V = 4*16/400 = 0.16, z2 = 0.2^2/0.16 = 0.25 exactly.
    // Arm buckets pinned by direct md5: arm0 ⊇ {1,3,6,9,10,13,16,17,
    // 18,20}, arm1 ⊇ {2,4,5,7,8,11,12,14,15,19,24,26,29,30,33,34}.
    var id = 0L
    def ev(t: String, u: Long, day: Long) =
      { id += 1; (id, day * 86400000000L + id, u, t, 1.0) }
    def spell(t: String, u: Long, x: Long) = Seq(ev(t, u, 0L), ev(t, u, x))
    val aArm0 = Seq(1L, 3L, 6L, 9L, 10L, 13L)
    val aArm1 = Seq(2L, 4L, 5L, 7L)
    val bArm0 = Seq(16L, 17L, 18L, 20L)
    val bArm1 = Seq(2L, 4L, 5L, 7L, 8L, 11L, 12L, 14L,
      15L, 19L, 24L, 26L, 29L, 30L, 33L, 34L)
    val rows =
      spell("a", 1L, 1L) ++                                  // arm-A death
        (aArm0.drop(1) ++ aArm1).flatMap(spell("a", _, 10L)) ++
        spell("b", 2L, 1L) ++                                // arm-B death
        (bArm0 ++ bArm1.filterNot(_ == 2L)).flatMap(spell("b", _, 10L))
    val out = ExperimentOps.queries("q309_logrank_test")(spark, eventsRaw(rows))
      .collect()
    assert(out.length === 2)
    val a = out.find(_.getAs[String]("event_type") == "a").get
    assert(a.getAs[Long]("o_a") === 1L)
    assert(a.getAs[Long]("o_b") === 0L)
    assert(a.getAs[Long]("e_a_milli") === 600L)
    assert(a.getAs[Long]("v_micro") === 240000L)
    assert(a.getAs[Long]("diff_milli") === 400L)
    assert(a.getAs[Long]("z2_milli") === 666L)    // 2/3, floored milli
    assert(a.getAs[Long]("reject") === 0L)
    val b = out.find(_.getAs[String]("event_type") == "b").get
    assert(b.getAs[Long]("o_a") === 0L)
    assert(b.getAs[Long]("e_a_milli") === 200L)
    assert(b.getAs[Long]("v_micro") === 160000L)
    assert(b.getAs[Long]("diff_milli") === -200L)
    assert(b.getAs[Long]("z2_milli") === 250L)    // 1/4 exactly
    assert(b.getAs[Long]("reject") === 0L)
  }

  test("q358 pinned: Murphy terms REL=0.003, RES=0.075, UNC=0.25, Brier=0.178") {
    // Controlled documents make the probe EXACT end to end. Train docs
    // (md5 bkt < 80: ids 0-5) sit on three feature points — (x1=0,
    // x2=20, y=0)x2, (10, 30, 1)x2, (0, 30, 1)x2 — which an OLS plane
    // fits with zero residual: y = -2 + 0*x1 + 0.1*x2, so w0 = -2e6,
    // w1 = 0, w2 = 1e5 micro exactly. Test docs (bkt >= 80) then score
    // p = 0.1*x2 - 2: four at p=0.5 (2 en), four at p=0.8 (3 en), two
    // at p=0.1 (0 en). Murphy (1973) by hand: ybar_all = 0.5,
    // REL = (2*0.1^2 + 0 + 4*0.05^2)/10 = 0.003, RES = (2*0.5^2 + 0 +
    // 4*0.25^2)/10 = 0.075, UNC = 0.25, Brier = 0.178 — cross-checked
    // directly: mean((p-y)^2) = (4*0.25 + 0.76 + 0.02)/10 = 0.178.
    val dir = Files.createTempDirectory("graft-pinned-docs").toString
    val s = spark
    import s.implicits._
    // texts chosen for exact integer features: x1 = 10*#{a,the} div n_tok,
    // x2 = 10*sum(len) div n_tok
    val t20 = "xx yy"                       // x1=0,  x2=20
    val t30s = "the the"                    // x1=10, x2=30
    val t30 = "xxx yyy"                     // x1=0,  x2=30
    val t25 = "xx yyy"                      // x2=25 -> p=0.5 (bin 5)
    val t28 = "xxx yyy zzz www vv"          // x2=28 -> p=0.8 (bin 8)
    val t21 = "aa bb cc dd ee ff gg hh ii jjj" // x2=21 -> p=0.1 (bin 1)
    val docs = Seq(
      (0L, t20, "es"), (1L, t20, "es"),
      (2L, t30s, "en"), (3L, t30s, "en"),
      (4L, t30, "en"), (5L, t30, "en"),
      (8L, t25, "en"), (16L, t25, "en"), (19L, t25, "es"), (20L, t25, "es"),
      (21L, t28, "en"), (25L, t28, "en"), (26L, t28, "en"), (27L, t28, "es"),
      (28L, t21, "es"), (30L, t21, "es"))
    docs.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src0' AS source",
        "length(text) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ExperimentOps.queries("q358_brier_decomposition")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_bins") === 3L)
    assert(r.getAs[Long]("ybar_all") === 500000L)
    assert(r.getAs[Long]("reliability_micro2") === 3000000000L)
    assert(r.getAs[Long]("resolution_micro2") === 75000000000L)
    assert(r.getAs[Long]("uncertainty_micro2") === 250000000000L)
    assert(r.getAs[Long]("brier_decomp_micro2") === 178000000000L)
  }

  // ---- r16 additions, batch 2: trend/effect-size/drift/richness pins
  // (r15 verdict task 5 continued). Same discipline: fixtures chosen so
  // every staged division lands integral and the asserted literal equals
  // the closed-form textbook value.

  /** Minimal documents fixture (driver schema: doc_id, text, lang,
    * source, n_chars) — n_chars is set EXPLICITLY, not derived, so
    * length-distribution pins control the value grid directly. */
  private def documentsFixture(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft-pinned-docs").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q301 pinned: strictly rising 5-day series has S=10, z²=4.86") {
    // counts 1..5 -> all C(5,2)=10 pairs ascend: S = 10, no ties, so
    // Var(S) = 5*4*15/18 = 50/3 and the continuity-corrected
    // z² = (10-1)²/(50/3) = 81*18/300 = 4.86 (Mann 1945 / Kendall's S).
    var id = 0L
    val rows = (0 until 5).flatMap { day =>
      (0 to day).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = ExperimentOps.queries("q301_mann_kendall")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("s_stat") === 10L)
    assert(r.getAs[Long]("tie_term") === 0L)
    assert(r.getAs[Long]("z2_milli") === 4860L)
    assert(r.getAs[Long]("trend") === 1L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q301 pinned: constant series has S=0, all days one tie group") {
    // counts 2,2,2 -> S = 0, one tie group t=3: tie_term = 3*2*11 = 66,
    // var18 = 3*2*11 - 66 = 0 -> z² = 0, no trend call
    var id = 0L
    val rows = (0 until 3).flatMap { day =>
      (0 until 2).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = ExperimentOps.queries("q301_mann_kendall")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("s_stat") === 0L)
    assert(r.getAs[Long]("tie_term") === 66L)
    assert(r.getAs[Long]("z2_milli") === 0L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q351 pinned: arms {1,2,3} vs {4,5,6} give d²=9, Hedges g²=5.76") {
    // arm0 users (md5: 1,3,6) take 1.00/2.00/3.00; arm1 (2,4,5) take
    // 4.00/5.00/6.00 centi. Means 200 vs 500, each SS = 20000, pooled
    // s² = 40000/4 = 10000 -> d = 300/100 = 3 exactly (d² = 9). Hedges
    // J = 1 - 3/(4*4-1) = 0.8 -> g = 2.4, g² = 5.76 (Hedges 1981).
    val rows = Seq((1L, 1.0), (3L, 2.0), (6L, 3.0),
      (2L, 4.0), (4L, 5.0), (5L, 6.0)).zipWithIndex.map {
      case ((u, v), i) => (i + 1L, i * 1000L, u, "a", v)
    }
    val r = ExperimentOps.queries("q351_effect_size")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("gap_sign") === 1L)
    assert(r.getAs[Long]("d2_milli") === 9000L)   // Cohen's d = 3.0
    assert(r.getAs[Long]("g2_milli") === 5760L)   // Hedges' g = 2.4
    assert(r.getAs[String]("magnitude") === "large")
  }

  test("q303 pinned: user deltas {1,2,3} vs {5,6,7} give DiD=4, z²=24") {
    // post-only events (hod 13) so each user's d = its value: arm0 users
    // (1,3,6) move 1/2/3, arm1 (2,4,5) move 5/6/7. DiD = 6-2 = 4; both
    // arm variances = 1, SE² = 1/3+1/3 = 2/3, z² = 16/(2/3) = 24 (the
    // two-sample t on user deltas, closed form).
    val rows = Seq((1L, 1.0), (3L, 2.0), (6L, 3.0),
      (2L, 5.0), (4L, 6.0), (5L, 7.0)).zipWithIndex.map {
      case ((u, v), i) => (i + 1L, 13L * 3600000000L + i, u, "a", v)
    }
    val r = ExperimentOps.queries("q303_did_estimator")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("did_micro") === 4000000L)
    assert(r.getAs[Long]("z2_milli") === 24000L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q352 pinned: perfectly associated 2x2 gives χ²=n and V²=1") {
    // 2 (en,s1) + 2 (fr,s2) docs: every cell's |dev| = n -> χ² = n = 4
    // (4e6 micro), V² = χ²/(n*min(r-1,c-1)) = 1 (Cramér 1946).
    val fx = documentsFixture(Seq(
      (1L, "x", "en", "s1", 10L), (2L, "x", "en", "s1", 10L),
      (3L, "x", "fr", "s2", 10L), (4L, "x", "fr", "s2", 10L)))
    val r = graft.operators.AuditOps.queries("q352_cramers_v")(spark, fx)
      .collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_rows") === 2L)
    assert(r.getAs[Long]("n_cols") === 2L)
    assert(r.getAs[Long]("chi2_micro") === 4000000L)
    assert(r.getAs[Long]("v2_milli") === 1000L)
    assert(r.getAs[String]("strength") === "strong")
  }

  test("q352 pinned: independent 2x2 gives χ²=0 and V²=0") {
    val fx = documentsFixture(Seq(
      (1L, "x", "en", "s1", 10L), (2L, "x", "en", "s2", 10L),
      (3L, "x", "fr", "s1", 10L), (4L, "x", "fr", "s2", 10L)))
    val r = graft.operators.AuditOps.queries("q352_cramers_v")(spark, fx)
      .collect().head
    assert(r.getAs[Long]("chi2_micro") === 0L)
    assert(r.getAs[Long]("v2_milli") === 0L)
    assert(r.getAs[String]("strength") === "negligible")
  }

  test("q217 pinned: disjoint length supports give KS=1, at the split point") {
    // source A lengths {1,2,3,4}, B {11,12,13,14}: at v=4 F_A=1, F_B=0
    // -> sup|F_A - F_rest| = 1 (ks_ppm = 1e6) for BOTH sides, achieved
    // first at v=4 (the smallest arg-max under the declared tie rule).
    val fx = documentsFixture(
      (1 to 4).map(i => (i.toLong, "x", "en", "A", i.toLong)) ++
        (1 to 4).map(i => (i + 4L, "x", "en", "B", i + 10L)))
    val rs = graft.operators.AuditOps.queries("q217_ks_drift")(spark, fx)
      .collect()
    assert(rs.length === 2)
    for (r <- rs) {
      assert(r.getAs[Long]("n_s") === 4L)
      assert(r.getAs[Long]("n_rest") === 4L)
      assert(r.getAs[Long]("ks_ppm") === 1000000L)
      assert(r.getAs[Long]("ks_at") === 4L)
    }
  }

  test("q217 pinned: identical length distributions give KS=0") {
    val fx = documentsFixture(Seq(
      (1L, "x", "en", "A", 5L), (2L, "x", "en", "A", 6L),
      (3L, "x", "en", "B", 5L), (4L, "x", "en", "B", 6L)))
    val rs = graft.operators.AuditOps.queries("q217_ks_drift")(spark, fx)
      .collect()
    for (r <- rs) {
      assert(r.getAs[Long]("ks_ppm") === 0L)
      assert(r.getAs[Long]("ks_at") === 5L)
    }
  }

  test("q328 pinned: identical halves give JSD=0; disjoint give JSD=1 bit") {
    // type a: both day-halves sit on value 1.00 -> JSD = 0 exactly.
    // type b: AM on 1.00, PM on 2.00 (disjoint) -> JSD = 1 bit, and the
    // bit-length log2 staging is EXACT here because l2m(2x)-l2m(x)=1000
    // identically (doubling adds one bit, remainder quotient unchanged),
    // so jsd_milli = 1000 with no approximation error.
    val rows = Seq(
      (1L, 3600000000L + 1, 1L, "a", 1.0), (2L, 3600000000L + 2, 2L, "a", 1.0),
      (3L, 13L * 3600000000L + 3, 3L, "a", 1.0), (4L, 13L * 3600000000L + 4, 4L, "a", 1.0),
      (5L, 3600000000L + 5, 5L, "b", 1.0), (6L, 3600000000L + 6, 6L, "b", 1.0),
      (7L, 13L * 3600000000L + 7, 7L, "b", 2.0), (8L, 13L * 3600000000L + 8, 8L, "b", 2.0))
    val rs = graft.operators.AuditOps.queries("q328_jsd_drift")(spark, eventsRaw(rows))
      .collect()
    assert(rs.length === 2)
    val a = rs.find(_.getAs[String]("event_type") == "a").get
    assert(a.getAs[Long]("jsd_milli") === 0L)
    assert(a.getAs[Long]("drifted") === 0L)
    val b = rs.find(_.getAs[String]("event_type") == "b").get
    assert(b.getAs[Long]("jsd_milli") === 1000L)
    assert(b.getAs[Long]("drifted") === 1L)
  }

  test("q302 pinned: perfect monotone ranks give ρ²=1 with the right sign") {
    // srcP: (n_chars, mean-token-len) rise together -> ρ = +1; srcN:
    // n_chars reversed -> ρ = -1. Texts "a"/"bb"/"ccc" make y = 10/20/30
    // exactly (sum(len)*10 div n_tok).
    val fx = documentsFixture(Seq(
      (1L, "a", "en", "srcN", 30L), (2L, "bb", "en", "srcN", 20L),
      (3L, "ccc", "en", "srcN", 10L),
      (4L, "a", "en", "srcP", 10L), (5L, "bb", "en", "srcP", 20L),
      (6L, "ccc", "en", "srcP", 30L)))
    val rs = graft.operators.LmOps.queries("q302_spearman_rank")(spark, fx)
      .collect()
    assert(rs.length === 2)
    val n = rs.find(_.getAs[String]("source") == "srcN").get
    assert(n.getAs[Long]("rho_sign") === -1L)
    assert(n.getAs[Long]("rho2_permille") === 1000L)
    val p = rs.find(_.getAs[String]("source") == "srcP").get
    assert(p.getAs[Long]("rho_sign") === 1L)
    assert(p.getAs[Long]("rho2_permille") === 1000L)
  }

  test("q332 pinned: exact weekly profile explains all variance (η²=1)") {
    // 14 days, dow 0 carries 8 events, dows 1-6 carry 1: within-dow
    // variance is zero, so SSB = SST = 84e6 milli² and η² = 1 exactly;
    // peak dow 0 with mean 8.000.
    var id = 0L
    val rows = (0 until 14).flatMap { day =>
      val y = if (day % 7 == 0) 8 else 1
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = SeriesOps.queries("q332_seasonality_strength")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("n_days") === 14L)
    assert(r.getAs[Long]("strength_milli") === 1000L)
    assert(r.getAs[Long]("peak_dow") === 0L)
    assert(r.getAs[Long]("peak_mean_milli") === 8000L)
  }

  test("q333 pinned: VMR exact on two-day counts (1.0 and 4.5)") {
    // type a: counts {1,3} -> mean 2, s² = 2, VMR = 1.0 (Poisson-like);
    // type b: counts {1,7} -> mean 4, s² = 18, VMR = 4.5 (overdispersed)
    var id = 0L
    def burst(day: Long, t: String, k: Int) =
      (0 until k).map { _ => id += 1; (id, day, t, 1.0) }
    val rows = burst(0, "a", 1) ++ burst(1, "a", 3) ++
      burst(0, "b", 1) ++ burst(1, "b", 7)
    val rs = SeriesOps.queries("q333_overdispersion")(spark, eventsFixture(rows))
      .collect()
    val a = rs.find(_.getAs[String]("event_type") == "a").get
    assert(a.getAs[Long]("mean_milli") === 2000L)
    assert(a.getAs[Long]("vmr_milli") === 1000L)
    assert(a.getAs[Long]("overdispersed") === 0L)
    val b = rs.find(_.getAs[String]("event_type") == "b").get
    assert(b.getAs[Long]("mean_milli") === 4000L)
    assert(b.getAs[Long]("vmr_milli") === 4500L)
    assert(b.getAs[Long]("overdispersed") === 1L)
  }

  test("q362 pinned: Chao1 on {a:2,b:2,c:1,d:1,e:1} = 6, coverage 4/7") {
    // S_obs=5, f1=3, f2=2 -> Chao1 = 5 + 3*2/(2*3) = 6 exactly
    // (Chao 1984 bias-corrected form); Good's coverage = 1 - 3/7.
    val fx = documentsFixture(Seq((1L, "a a b b c d e", "en", "s", 13L)))
    val r = graft.operators.TextAnalysis.queries("q362_chao1_richness")(spark, fx)
      .collect().head
    assert(r.getAs[Long]("s_obs") === 5L)
    assert(r.getAs[Long]("n_tokens") === 7L)
    assert(r.getAs[Long]("f1") === 3L)
    assert(r.getAs[Long]("f2") === 2L)
    assert(r.getAs[Long]("chao1_milli") === 6000L)
    assert(r.getAs[Long]("unseen_milli") === 1000L)
    assert(r.getAs[Long]("coverage_permille") === 572L)
  }

  // ---- r16 additions, batch 3: pins for the round's NEW operators
  // (q369-q373) — the closed-form fixture ships in the same commit as
  // the operator, so no staging error can outlive its first sweep.

  test("q369 pinned: scipy median_test({1,2,3},{4,5,6}) χ²=6, rejects") {
    // pooled lower median = 3.00 (2·cum >= 6 first at v=300); above:
    // A-group 0, B-group 3 -> 2x2 table [[0,3],[3,0]], χ² (no
    // continuity correction, ties='below') = N(ad-bc)²/(r1r2c1c2) = 6.
    val rows = Seq(1, 2, 3).map(v => (v.toLong, 0L, "a", v.toDouble)) ++
      Seq(4, 5, 6).map(v => (v.toLong, 0L, "b", v.toDouble))
    val r = ExperimentOps.queries("q369_mood_median")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("med_centi") === 300L)
    assert(r.getAs[Long]("n_above") === 3L)
    assert(r.getAs[Long]("chi2_milli") === 6000L)
    assert(r.getAs[Long]("crit_milli") === 3841L)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q370 pinned: conversions 1/4 vs 3/4 across two tiers give z²=2.0") {
    // tier0 (no pre events): 4 users, 1 converts; tier1 (one pre event):
    // 4 users, 3 convert. With w={0,1} Cochran-Armitage reduces to the
    // pooled two-proportion z²: (0.75-0.25)²/(0.5·0.5·(1/4+1/4)) = 2.0
    // exactly — and the staged q1 path is divisible throughout.
    val h = 3600000000L
    var id = 0L
    def ev(us: Long, u: Long, v: Double) = { id += 1; (id, us + id, u, "a", v) }
    val rows = Seq(
      ev(13 * h, 1, 150.0), ev(13 * h, 2, 50.0), ev(13 * h, 3, 50.0),
      ev(13 * h, 4, 50.0),
      ev(h, 5, 1.0), ev(13 * h, 5, 150.0),
      ev(h, 6, 1.0), ev(13 * h, 6, 150.0),
      ev(h, 7, 1.0), ev(13 * h, 7, 150.0),
      ev(h, 8, 1.0), ev(13 * h, 8, 50.0))
    val r = ExperimentOps.queries("q370_cochran_armitage")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("n_conv") === 4L)
    assert(r.getAs[Long]("swx") === 3L)
    assert(r.getAs[Long]("swn") === 4L)
    assert(r.getAs[Long]("trend_sign") === 1L)
    assert(r.getAs[Long]("z2_milli") === 2000L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q371 pinned: monotone counts give DW=0.6, alternating give DW=3.0") {
    // type m: y={1,2,3,4}, residuals {-1.5,-.5,.5,1.5}: Σdiff²=3, Σe²=5
    // -> DW = 0.6 (positive autocorr); type alt: y={1,3,1,3}: diffs ±2,
    // Σdiff²=12, Σe²=4 -> DW = 3.0 (negative autocorr). Both exact under
    // the n-scaled staging (n²·Σ(Δy)² / Σ(n·y-S)²).
    var id = 0L
    def burst(day: Long, t: String, k: Int) =
      (0 until k).map { _ => id += 1; (id, day, t, 1.0) }
    val rows = (0 until 4).flatMap(d => burst(d.toLong, "m", d + 1)) ++
      (0 until 4).flatMap(d => burst(d.toLong, "alt", if (d % 2 == 0) 1 else 3))
    val rs = SeriesOps.queries("q371_durbin_watson")(spark, eventsFixture(rows))
      .collect()
    val m = rs.find(_.getAs[String]("event_type") == "m").get
    assert(m.getAs[Long]("dw_milli") === 600L)
    assert(m.getAs[String]("autocorr") === "positive")
    assert(m.getAs[Long]("flagged") === 1L)
    val alt = rs.find(_.getAs[String]("event_type") == "alt").get
    assert(alt.getAs[Long]("dw_milli") === 3000L)
    assert(alt.getAs[String]("autocorr") === "negative")
    assert(alt.getAs[Long]("flagged") === 1L)
  }

  test("q372 pinned: violating bins pool to the PAVA average, monotone stay") {
    // type v: bin rates 5/10 then 2/10 violate monotonicity -> PAVA
    // pools both to 7/20 = 350000 micro (the max-min identity by hand:
    // iso(0) = min(500000, 350000) = 350000; iso(1) = max(350000,
    // 200000) = 350000). type m: 1/10 then 5/10 is already monotone ->
    // iso == raw at both bins, pooled = 0.
    val h = 3600000000L
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double)]()
    def user(u: Long, t: String, pre: Int, conv: Boolean): Unit = {
      (0 until pre).foreach { _ => id += 1; rows += ((id, h + id, u, t, 1.0)) }
      id += 1; rows += ((id, 13 * h + id, u, t, if (conv) 150.0 else 50.0))
    }
    (1 to 10).foreach(i => user(100 + i, "m", 0, i <= 1))
    (1 to 10).foreach(i => user(110 + i, "m", 1, i <= 5))
    (1 to 10).foreach(i => user(200 + i, "v", 0, i <= 5))
    (1 to 10).foreach(i => user(210 + i, "v", 1, i <= 2))
    val rs = ExperimentOps.queries("q372_isotonic_calibration")(
      spark, eventsRaw(rows.toSeq)).collect()
    assert(rs.length === 4)
    def row(t: String, b: Long) = rs.find(r =>
      r.getAs[String]("event_type") == t && r.getAs[Long]("bin") == b).get
    assert(row("m", 0L).getAs[Long]("raw_micro") === 100000L)
    assert(row("m", 0L).getAs[Long]("iso_micro") === 100000L)
    assert(row("m", 0L).getAs[Long]("pooled") === 0L)
    assert(row("m", 1L).getAs[Long]("iso_micro") === 500000L)
    assert(row("v", 0L).getAs[Long]("raw_micro") === 500000L)
    assert(row("v", 0L).getAs[Long]("iso_micro") === 350000L)
    assert(row("v", 0L).getAs[Long]("pooled") === 1L)
    assert(row("v", 1L).getAs[Long]("raw_micro") === 200000L)
    assert(row("v", 1L).getAs[Long]("iso_micro") === 350000L)
    assert(row("v", 1L).getAs[Long]("pooled") === 1L)
  }

  test("q349/q355 pinned: 8/2 vs 2/8 arm split gives z²=3.6; φ divides it") {
    // Two types, 10 events each; arm0 users (md5: 1,3), arm1 (2,4).
    // Global exposure is balanced by construction (arm0 total 10 = arm1
    // total 10 -> w = 0.5 exactly), so per type the conditional-binomial
    // z² = (a - K/2)²/(K/4) = 9/2.5 = 3.6 for both a=8 and a=2.
    // Days split the types differently: type y packs 1/9 into two days
    // (VMR = 128·1000/(2·1·10) = 6.4 -> φ=6.4, z²_corr = 3600000//6400
    // = 562); type x spreads 5/5 (VMR 0 -> φ floored at 1, z²_corr
    // = z²_naive).
    var id = 0L
    def ev(day: Long, u: Long, t: String) = { id += 1; (id, day, u, t) }
    val y = Seq(ev(0, 1, "y")) ++                       // day0: 1 arm0
      (1 to 7).map(_ => ev(1, if (id % 2 == 0) 1L else 3L, "y")) ++ // day1: 7 arm0
      Seq(ev(1, 2, "y"), ev(1, 4, "y"))                 // day1: 2 arm1
    val x = Seq(ev(0, 1, "x"), ev(1, 3, "x")) ++        // 2 arm0
      (1 to 4).map(_ => ev(0, if (id % 2 == 0) 2L else 4L, "x")) ++
      (1 to 4).map(_ => ev(1, if (id % 2 == 0) 2L else 4L, "x"))
    val rows = (y ++ x).map { case (i, d, u, t) =>
      (i, d * 86400000000L + i, u, t, 1.0)
    }
    val fx = eventsRaw(rows)
    val r349 = ExperimentOps.queries("q349_rate_ratio")(spark, fx).collect()
    for (r <- r349) {
      assert(r.getAs[Long]("k_events") === 10L)
      assert(r.getAs[Long]("w_ppm") === 500000L)
      assert(r.getAs[Long]("z2_milli") === 3600L)   // (8-5)²/2.5 exactly
      assert(r.getAs[Long]("reject") === 0L)
    }
    assert(r349.map(_.getAs[Long]("gap_sign")).sorted.toSeq === Seq(-1L, 1L))
    val r355 = ExperimentOps.queries("q355_quasi_poisson")(spark, fx).collect()
    val ry = r355.find(_.getAs[String]("event_type") == "y").get
    assert(ry.getAs[Long]("z2_naive") === 3600L)
    assert(ry.getAs[Long]("vmr_milli") === 6400L)   // daily {1,9}: s²/ȳ=6.4
    assert(ry.getAs[Long]("phi_milli") === 6400L)
    assert(ry.getAs[Long]("z2_corr") === 562L)      // 3600000 // 6400
    val rx = r355.find(_.getAs[String]("event_type") == "x").get
    assert(rx.getAs[Long]("vmr_milli") === 0L)      // daily {5,5}: flat
    assert(rx.getAs[Long]("phi_milli") === 1000L)   // floored at 1
    assert(rx.getAs[Long]("z2_corr") === 3600L)
  }

  test("q317 pinned: alternating series has ACF r_k = (-1)^k (n-k)/n") {
    // y = 1,3,1,3,... over 10 days: the sample ACF of a pure alternation
    // is exactly (-1)^k (n-k)/n, so acf_milli = (10-k)*100 with sign
    // (-1)^k; Bartlett band: acf²·n >= 4e6 holds for lags 1-3 only.
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day % 2 == 0) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val rs = SeriesOps.queries("q317_acf_diagnostic")(spark, eventsFixture(rows))
      .collect()
    assert(rs.length === 7)
    for (r <- rs) {
      val k = r.getAs[Long]("lag")
      assert(r.getAs[Long]("acf_milli") === (10 - k) * 100)
      assert(r.getAs[Long]("acf_sign") === (if (k % 2 == 0) 1L else -1L))
      assert(r.getAs[Long]("significant") === (if (k <= 3) 1L else 0L))
    }
  }

  test("q339 pinned: three quiet days then a 50% error rate alarms") {
    // rates 0,0,0,500000,500000 ppm; running means 0,0,0,125000,200000;
    // terms -1000,-1000,-1000,374000,299000; PH gap 0,0,0,374000,673000
    // -> alarm exactly on days 4-5 (Page 1954 / Hinkley 1971 by hand).
    var id = 0L
    val rows = (0 until 5).flatMap { day =>
      val errs = if (day >= 3) 5 else 0
      (0 until errs).map { _ =>
        id += 1; (id, day.toLong, "error", 1.0)
      } ++ (0 until (10 - errs)).map { _ =>
        id += 1; (id, day.toLong, "ok", 1.0)
      }
    }
    val rs = SeriesOps.queries("q339_page_hinkley")(spark, eventsFixture(rows))
      .collect()
    assert(rs.length === 5)
    assert(rs.map(_.getAs[Long]("ph_gap")).toSeq ===
      Seq(0L, 0L, 0L, 374000L, 673000L))
    assert(rs.map(_.getAs[Long]("alarm")).toSeq === Seq(0L, 0L, 0L, 1L, 1L))
    assert(rs.map(_.getAs[Long]("mean_ppm")).toSeq ===
      Seq(0L, 0L, 0L, 125000L, 200000L))
  }

  test("q343 pinned: EWMA recursion and band factor follow the exact fold") {
    // type a shares 750000x3 then 250000 (b mirrors): mu = 625000, and
    // the dyadic fold z = (x+3z')div4 gives 656250, 679687, 697265,
    // 585448 — day 1 separates (x+3z')/4 from any other convex weight
    // ((x+z')/2 would read 687500). Band factor g = 9g'/16 from 1e6:
    // 562500, 316406, 177978, 100112. All days in-band (s² is the
    // series' own spread; 3σ of it is far wider than the EWMA path).
    var id = 0L
    def burst(day: Long, t: String, k: Int) =
      (0 until k).map { _ => id += 1; (id, day, t, 1.0) }
    val rows = (0 until 3).flatMap(d =>
      burst(d.toLong, "a", 3) ++ burst(d.toLong, "b", 1)) ++
      (burst(3, "a", 1) ++ burst(3, "b", 3))
    val rs = SeriesOps.queries("q343_ewma_chart")(spark, eventsFixture(rows))
      .collect().filter(_.getAs[String]("event_type") == "a")
    assert(rs.map(_.getAs[Long]("z_ppm")).toSeq ===
      Seq(656250L, 679687L, 697265L, 585448L))
    assert(rs.map(_.getAs[Long]("g_ppm")).toSeq ===
      Seq(562500L, 316406L, 177978L, 100112L))
    assert(rs.forall(_.getAs[Long]("oob") == 0L))
  }

  test("q334 pinned: equal docs give Theil 0; two-doc case is exactly additive") {
    // Equal corpus (all ratios 1) -> every Theil term is log(1) = 0, so
    // T_total = T_between = T_within = 0 and shares equal frequencies.
    val eq = documentsFixture(Seq(
      (1L, "x", "en", "A", 10L), (2L, "x", "en", "A", 10L),
      (3L, "x", "en", "B", 10L), (4L, "x", "en", "B", 10L)))
    for (r <- graft.operators.LmOps.queries("q334_theil_decomposition")(spark, eq)
        .collect()) {
      assert(r.getAs[Long]("t_total_milli") === 0L)
      assert(r.getAs[Long]("t_between_milli") === 0L)
      assert(r.getAs[Long]("t_within_milli") === 0L)
      assert(r.getAs[Long]("t_g_milli") === 0L)
      assert(r.getAs[Long]("share_ppm") === 500000L)
      assert(r.getAs[Long]("freq_ppm") === 500000L)
    }
    // One doc per source, masses 3:1 -> within = 0 by construction, so
    // Theil's decomposition (1967) forces T_total = T_between EXACTLY —
    // hand-traced through the staged fixed-point log2: 142 milli-bits
    // both (the identity is the pin; the 142 pins the shared staging).
    val uneq = documentsFixture(Seq(
      (1L, "x", "en", "A", 3L), (2L, "x", "en", "B", 1L)))
    val rs = graft.operators.LmOps.queries("q334_theil_decomposition")(spark, uneq)
      .collect()
    for (r <- rs) {
      assert(r.getAs[Long]("t_within_milli") === 0L)
      assert(r.getAs[Long]("t_total_milli") === 142L)
      assert(r.getAs[Long]("t_between_milli") === 142L)
    }
    val a = rs.find(_.getAs[String]("source") == "A").get
    assert(a.getAs[Long]("share_ppm") === 750000L)
    assert(a.getAs[Long]("freq_ppm") === 500000L)
  }

  test("q268 pinned: Chapman on precomputed captures; dependent arm collapses") {
    // ids 1-10, md5-precomputed: c1 = {2,3,7,8,9,10} (n1=6), c2 = {1,3}
    // (n2=2), overlap m = {3}; Chapman (n1+1)(n2+1)/(m+1) - 1 =
    // 7*3//2 - 1 = 9 (err 100 milli of n_true=10). The dependent
    // recapture (same salt, nested band) = {2,9,10}, all inside c1, so
    // the estimator collapses toward n1: 7*4//4 - 1 = 6 (err 400) —
    // the named failure mode, visible side by side.
    val fx = documentsFixture(
      (1 to 10).map(i => (i.toLong, "x", "en", "S", 10L)))
    val r = graft.operators.AuditOps.queries("q268_capture_recapture")(spark, fx)
      .collect().head
    assert(r.getAs[Long]("n_true") === 10L)
    assert(r.getAs[Long]("n1") === 6L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Long]("m") === 1L)
    assert(r.getAs[Long]("chapman_est") === 9L)
    assert(r.getAs[Long]("chapman_err_milli") === 100L)
    assert(r.getAs[Long]("dep_est") === 6L)
    assert(r.getAs[Long]("dep_err_milli") === 400L)
  }

  test("q269 pinned: Good-Turing on {a:2,b:2,c:1,d:1,e:1}: P0=3/7, r*(1)=4/3") {
    // spectrum S1=3, S2=2, N=7: Turing missing mass = S1/N = 3/7
    // (428 milli), smoothed count r*(1) = 2*S2/S1 = 4/3 (1333 milli);
    // S3=0 -> r*(2)=0, and the S(r)=0 rungs report NULL, not a discount.
    val fx = documentsFixture(Seq((1L, "a a b b c d e", "en", "s", 13L)))
    val r = graft.operators.TextAnalysis.queries("q269_good_turing")(spark, fx)
      .collect().head
    assert(r.getAs[Long]("n_tokens") === 7L)
    assert(r.getAs[Long]("n_types") === 5L)
    assert(r.getAs[Long]("s1") === 3L)
    assert(r.getAs[Long]("s2") === 2L)
    assert(r.getAs[Long]("p0_milli") === 428L)
    assert(r.getAs[Long]("rstar1_milli") === 1333L)
    assert(r.getAs[Long]("rstar2_milli") === 0L)
    assert(r.isNullAt(r.fieldIndex("rstar3_milli")))
    assert(r.isNullAt(r.fieldIndex("rstar4_milli")))
  }

  test("q212 pinned: Wilson lower bound demotes 2/2 below 90/100") {
    // The operator's own motivating example, by hand at z=2: the 2/2
    // source has lb = (1 + 1 - 2*sqrt(1/4))/3 = 1/3 = 0.333333; the
    // 90/100 source has lb = (0.92 - 2*sqrt(0.001))/1.04 = 0.823802.
    // Naive rate ranks T first (1000 vs 900 milli); the bound flips it.
    val big = (1 to 60).map(i => s"w$i").mkString(" ")   // 60 distinct toks
    val fx = documentsFixture(
      Seq((1L, big, "en", "T", 10L), (2L, big, "en", "T", 10L)) ++
        (1 to 90).map(i => (100L + i, big, "en", "B", 10L)) ++
        (1 to 10).map(i => (200L + i, "x", "en", "B", 10L)))
    val rs = graft.operators.CurationOps.queries("q212_wilson_gate")(spark, fx)
      .collect()
    val t = rs.find(_.getAs[String]("source") == "T").get
    assert(t.getAs[Long]("rate_milli") === 1000L)
    assert(t.getAs[Double]("wilson_lb") === 0.333333)
    assert(t.getAs[Long]("naive_rank") === 1L)
    assert(t.getAs[Long]("lb_rank") === 2L)
    val b = rs.find(_.getAs[String]("source") == "B").get
    assert(b.getAs[Long]("rate_milli") === 900L)
    assert(b.getAs[Double]("wilson_lb") === 0.823802)
    assert(b.getAs[Long]("naive_rank") === 2L)
    assert(b.getAs[Long]("lb_rank") === 1L)
  }

  test("q336 pinned: alternation has r1=-0.9, r2=0.8, but φ22 ≈ -0.053") {
    // The textbook AR-order lesson on the q317 fixture: a pure
    // alternation's large r2 = 0.8 is just r1² propagation (0.81), so
    // Durbin-Levinson φ22 = (r2 - r1²)/(1 - r1²) = -0.01/0.19 = -0.0526
    // — no genuine second-order memory. Staged: -10000/190000 -> 52.
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day % 2 == 0) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = SeriesOps.queries("q336_pacf2")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("r1_milli") === -900L)
    assert(r.getAs[Long]("r2_milli") === 800L)
    assert(r.getAs[Long]("pacf2_sign") === -1L)
    assert(r.getAs[Long]("pacf2_milli") === 52L)
  }

  test("q306 pinned: user- and event-SRM decouple; 11-vs-0 users flags") {
    // type a: arms hold 2 users each (srm_user = 0) but arm0 users fire
    // 5 events to arm1's 1 (srm_event = 64*1000//12 = 5333 — under the
    // 10828 milli = χ²(1,.001) page bar). type b: 11 arm0 users, none in
    // arm1 -> srm_user = 121*1000//11 = 11000 >= 10828 -> flag.
    var id = 0L
    def ev(u: Long, t: String, k: Int) =
      (0 until k).map { _ => id += 1; (id, 0L, u, t, 1.0) }
    val armZeros = Seq(1L, 3L, 6L, 9L, 10L, 13L, 16L, 17L, 18L, 20L, 21L)
    val rows = ev(1, "a", 5) ++ ev(3, "a", 5) ++ ev(2, "a", 1) ++ ev(4, "a", 1) ++
      armZeros.flatMap(u => ev(u, "b", 1))
    val rs = ExperimentOps.queries("q306_srm_guardrail")(
      spark, eventsRaw(rows.map { case (i, d, u, t, v) => (i, d + i, u, t, v) }))
      .collect()
    val a = rs.find(_.getAs[String]("event_type") == "a").get
    assert(a.getAs[Long]("ua") === 2L)
    assert(a.getAs[Long]("ub") === 2L)
    assert(a.getAs[Long]("srm_user_milli") === 0L)
    assert(a.getAs[Long]("ea") === 10L)
    assert(a.getAs[Long]("eb") === 2L)
    assert(a.getAs[Long]("srm_event_milli") === 5333L)
    assert(a.getAs[Long]("srm_flag") === 0L)
    val b = rs.find(_.getAs[String]("event_type") == "b").get
    assert(b.getAs[Long]("srm_user_milli") === 11000L)
    assert(b.getAs[Long]("srm_flag") === 1L)
  }

  test("q291 pinned: moving all mass 16 units costs W1 = 16.000 exactly") {
    // AM events at value 0 (bin 0), PM at 16.0 (bin 2): the CDF gap is
    // full over two 8-unit bins, so W1 = 16 units (16000 milli) — the
    // earth-mover identity by hand. Identical halves read 0.
    val h = 3600000000L
    val rows = Seq(
      (1L, h + 1, 1L, "mv", 0.0), (2L, h + 2, 2L, "mv", 0.0),
      (3L, 13 * h + 3, 3L, "mv", 16.0), (4L, 13 * h + 4, 4L, "mv", 16.0),
      (5L, h + 5, 5L, "same", 16.0), (6L, 13 * h + 6, 6L, "same", 16.0))
    val rs = ExperimentOps.queries("q291_wasserstein_drift")(spark, eventsRaw(rows))
      .collect()
    val mv = rs.find(_.getAs[String]("event_type") == "mv").get
    assert(mv.getAs[Long]("n_a") === 2L)
    assert(mv.getAs[Long]("n_b") === 2L)
    assert(mv.getAs[Long]("w1_milli") === 16000L)
    val same = rs.find(_.getAs[String]("event_type") == "same").get
    assert(same.getAs[Long]("w1_milli") === 0L)
  }

  test("q316 pinned: scipy cramervonmises_2samp({1,2},{3,4}) T=0.375") {
    // Complete separation at n=m=2: Anderson's rank form gives
    // U = 2*0 + 2*8 = 16, T = U/(nmN) - (4nm-1)/(6N) = 1 - 0.625
    // = 0.375 — and the value-grain staging reads 24*1000//64 = 375
    // exactly. Below the asymptotic 461 bar (tiny n), so no rejection;
    // identical halves read 0.
    val h = 3600000000L
    val rows = Seq(
      (1L, h + 1, 1L, "sep", 1.0), (2L, h + 2, 2L, "sep", 2.0),
      (3L, 13 * h + 3, 3L, "sep", 3.0), (4L, 13 * h + 4, 4L, "sep", 4.0),
      (5L, h + 5, 5L, "same", 2.0), (6L, 13 * h + 6, 6L, "same", 2.0))
    val rs = ExperimentOps.queries("q316_cramer_von_mises")(spark, eventsRaw(rows))
      .collect()
    val sep = rs.find(_.getAs[String]("event_type") == "sep").get
    assert(sep.getAs[Long]("n_a") === 2L)
    assert(sep.getAs[Long]("n_b") === 2L)
    assert(sep.getAs[Long]("t_milli") === 375L)
    assert(sep.getAs[Long]("reject") === 0L)
    val same = rs.find(_.getAs[String]("event_type") == "same").get
    assert(same.getAs[Long]("t_milli") === 0L)
  }

  test("q279 pinned: y = 2x exactly gives theta=2, rho²=1, equal adjusted means") {
    // arm0 users (1,3,6) have (x,y) = (1,2),(2,4),(3,6); arm1 (2,4,5)
    // have (4,8),(5,10),(6,12). Deng et al.'s theta = Cov/Var = 2
    // exactly (cxy/cxx = 210/105), rho² = 1 — and with ALL variance
    // explained, CUPED adjusts both arms' means to the SAME pooled 7.0
    // (7e6 micro): the estimator's defining identity, by hand.
    val h = 3600000000L
    var id = 0L
    def pair(u: Long, x: Double, y: Double) = {
      id += 1; val pre = (id, h + id, u, "a", x)
      id += 1; val post = (id, 13 * h + id, u, "a", y)
      Seq(pre, post)
    }
    val rows = pair(1, 1, 2) ++ pair(3, 2, 4) ++ pair(6, 3, 6) ++
      pair(2, 4, 8) ++ pair(4, 5, 10) ++ pair(5, 6, 12)
    val rs = ExperimentOps.queries("q279_cuped_adjustment")(spark, eventsRaw(rows))
      .collect()
    assert(rs.length === 2)
    for (r <- rs) {
      assert(r.getAs[Long]("theta_micro") === 2000000L)
      assert(r.getAs[Long]("rho2_permille") === 1000L)
      assert(r.getAs[Long]("mean_yadj_micro") === 7000000L)
    }
    assert(rs.map(_.getAs[Long]("mean_y_micro")).sorted.toSeq ===
      Seq(4000000L, 10000000L))
  }

  test("q282 pinned: kidney-stone table reverses in both strata, flags") {
    // Classic Simpson construction on the day-part strata: S0 arm A 2/2
    // vs B 8/10 (A better), S1 A 3/10 vs B 1/4 (A better), aggregate
    // A 5/12 vs B 9/14 (B better) -> both strata disagree with the
    // aggregate sign, 100% of event mass reversed, flag = 1. Control
    // type: one stratum, A 1/1 vs B 0/1 -> no reversal.
    val h = 3600000000L
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double)]()
    def ev(hod: Long, u: Long, t: String, succ: Boolean, k: Int): Unit =
      (0 until k).foreach { _ =>
        id += 1; rows += ((id, hod * h + id, u, t, if (succ) 150.0 else 50.0))
      }
    // type "rev": user 1 = arm0 (A), user 2 = arm1 (B)
    ev(1, 1, "rev", succ = true, 2)                      // S0 A: 2/2
    ev(1, 2, "rev", succ = true, 8); ev(1, 2, "rev", succ = false, 2)  // S0 B: 8/10
    ev(7, 1, "rev", succ = true, 3); ev(7, 1, "rev", succ = false, 7)  // S1 A: 3/10
    ev(7, 2, "rev", succ = true, 1); ev(7, 2, "rev", succ = false, 3)  // S1 B: 1/4
    // type "ok": A 1/1 vs B 0/1 in one stratum
    ev(1, 1, "ok", succ = true, 1); ev(1, 2, "ok", succ = false, 1)
    val rs = ExperimentOps.queries("q282_simpson_audit")(spark, eventsRaw(rows.toSeq))
      .collect()
    val rev = rs.find(_.getAs[String]("event_type") == "rev").get
    assert(rev.getAs[Long]("agg_sign") === -1L)
    assert(rev.getAs[Long]("n_strata") === 2L)
    assert(rev.getAs[Long]("n_reversed") === 2L)
    assert(rev.getAs[Long]("rev_mass_permille") === 1000L)
    assert(rev.getAs[Long]("simpson_flag") === 1L)
    val okT = rs.find(_.getAs[String]("event_type") == "ok").get
    assert(okT.getAs[Long]("agg_sign") === 1L)
    assert(okT.getAs[Long]("n_reversed") === 0L)
    assert(okT.getAs[Long]("simpson_flag") === 0L)
  }

  test("q297 pinned: arms {1..9} vs {11..19} give QTE=10.00, disjoint bands") {
    // n=9 per arm -> isqrt(9)=3, order-statistic ranks lo/med/hi =
    // 2/5/7 (n/2 -+ 0.98*sqrt(n), the q277 distribution-free CI): arm0
    // band [2.00, 7.00] around median 5.00, arm1 [12.00, 17.00] around
    // 15.00 -> QTE = +10.00, bands disjoint -> significant.
    var id = 0L
    val a0 = Seq(1L, 3L, 6L)
    val a1 = Seq(2L, 4L, 5L)
    val rows = (1 to 9).map { i =>
      id += 1; (id, id, a0((i - 1) % 3), "q", i.toDouble)
    } ++ (11 to 19).map { i =>
      id += 1; (id, id, a1((i - 1) % 3), "q", i.toDouble)
    }
    val r = ExperimentOps.queries("q297_quantile_effect")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n_a") === 9L)
    assert(r.getAs[Long]("n_b") === 9L)
    assert(r.getAs[Long]("lo_a_centi") === 200L)
    assert(r.getAs[Long]("med_a_centi") === 500L)
    assert(r.getAs[Long]("hi_a_centi") === 700L)
    assert(r.getAs[Long]("med_b_centi") === 1500L)
    assert(r.getAs[Long]("qte_centi") === 1000L)
    assert(r.getAs[Long]("sig") === 1L)
  }

  test("q206 pinned: a clean level step peaks the CUSUM at the step day") {
    // daily sums 1000,1000,3000,3000 milli: |n*C_k - k*S| reads
    // 4000, 8000, 4000, 0 — the classic tent peaking exactly at the
    // last pre-step day (k=2), splitting 2 days/2000 before vs
    // 2 days/6000 after.
    val rows = Seq((1L, 0L, "a", 1.0), (2L, 1L, "a", 1.0),
      (3L, 2L, "a", 3.0), (4L, 3L, "a", 3.0))
    val r = graft.operators.ScaleOps.queries("q206_cusum_changepoint")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("change_day") === 1L)
    assert(r.getAs[Long]("days_before") === 2L)
    assert(r.getAs[Long]("sum_before") === 2000L)
    assert(r.getAs[Long]("days_after") === 2L)
    assert(r.getAs[Long]("sum_after") === 6000L)
    assert(r.getAs[Long]("peak_stat") === 8000L)
  }

  test("q335 pinned: anti-phase alternation gives CCF ρ(k) = ±(8-k)/8") {
    // errors = 3,1,3,1,... and purchases = 1,3,1,3,... over 8 days:
    // deviations are exact negatives, so the cross-correlation is
    // closed-form ρ(k) = (-1)^(k+1) (8-|k|)/8 — ρ² permille 1000 at
    // lag 0 (sign -1), 765/562/390 at |lag| 1/2/3 with alternating
    // signs (the (7/8)², (6/8)², (5/8)² ladder).
    var id = 0L
    def burst(day: Long, t: String, k: Int) =
      (0 until k).map { _ => id += 1; (id, day, t, 1.0) }
    val rows = (0 until 8).flatMap { d =>
      burst(d.toLong, "error", if (d % 2 == 0) 3 else 1) ++
        burst(d.toLong, "purchase", if (d % 2 == 0) 1 else 3)
    }
    val rs = SeriesOps.queries("q335_ccf_leadlag")(
      spark, eventsFixture(rows)).collect()
    assert(rs.length === 7)
    for (r <- rs) {
      val k = r.getAs[Long]("lag")
      val expect = math.abs(k) match {
        case 0 => 1000L; case 1 => 765L; case 2 => 562L; case _ => 390L
      }
      assert(r.getAs[Long]("ccf2_permille") === expect)
      assert(r.getAs[Long]("ccf_sign") ===
        (if (math.abs(k) % 2 == 0) -1L else 1L))
      assert(r.getAs[Long]("n_pairs") === 8L - math.abs(k))
    }
  }

  test("q373 pinned: pure 8/1 weekly pattern decomposes to +6/-1, strength 1") {
    // 21 days, dow0 = 8 events, others 1: every interior 7-day MA sums
    // to 14 (exactly one dow0 in any 7-day window), so detrended d =
    // 7y-14: dow0 +42 (=+6 after the /7 de-scale), others -7 (=-1);
    // within-dow variance is zero -> strength = 1000.
    var id = 0L
    val rows = (0 until 21).flatMap { day =>
      val y = if (day % 7 == 0) 8 else 1
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val rs = SeriesOps.queries("q373_seasonal_decomposition")(
      spark, eventsFixture(rows)).collect()
    assert(rs.length === 7)
    for (r <- rs) {
      val dow = r.getAs[Long]("dow")
      assert(r.getAs[Long]("seas_milli") === (if (dow == 0) 6000L else -1000L))
      assert(r.getAs[Long]("strength_milli") === 1000L)
      assert(r.getAs[Long]("n_obs") === (if (dow == 3) 3L else 2L))
    }
  }

  /** Documents fixture for the curation-pack statistics (driver schema:
    * doc_id, text, lang, source, n_chars). */
  private def docsFixture(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-pinned-docs").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- r16 verdict task 3: the remaining closed-form statistics ----

  test("q281 pinned: delta and jackknife agree exactly on 5 singleton blocks") {
    // users 1..5 land in md5 blocks {24,13,30,25,31} (precomputed) — five
    // DISTINCT blocks, so the 32-block jackknife degenerates to textbook
    // delete-one-user. One event each, y = {6,8,10,12,14}, m = 1:
    // R = 50/5 = 10 (r_micro 10_000_000), residuals e = 1000y - 10000m =
    // {-4000,-2000,0,2000,4000} -> see = 4e7, delta Var = see*n/((n-1)SM^2)
    // = 4e7*5/100 = 2_000_000 exactly. Leave-one-out ratios 250*(50-y) =
    // {11000,10500,10000,9500,9000}, sq = 2_500_000, jack Var =
    // (5-1)*sq/5 = 2_000_000 exactly — agreement permille 1000, and both
    // SEs floor(sqrt(2e6)) = 1414 (the delta-method linearization equals
    // the delete-one jackknife on a linear statistic; Efron 1982).
    val rows = Seq(6.0, 8.0, 10.0, 12.0, 14.0).zipWithIndex.map {
      case (v, i) => (i + 1L, i * 1000L, i + 1L, "a", v)
    }
    val r = ExperimentOps.queries("q281_ratio_variance")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n_users") === 5L)
    assert(r.getAs[Long]("n_blocks") === 5L)
    assert(r.getAs[Long]("r_micro") === 10000000L)
    assert(r.getAs[Long]("vd_milli2") === 2000000L)
    assert(r.getAs[Long]("vj_milli2") === 2000000L)
    assert(r.getAs[Long]("jk_vs_delta_permille") === 1000L)
    assert(r.getAs[Long]("se_delta_milli") === 1414L)
    assert(r.getAs[Long]("se_jack_milli") === 1414L)
  }

  test("q293 pinned: perfect separation gives z²=n; OBF first rejects at look 3, naive at 1") {
    // 20 events, ids 1..20 -> looks of 4 (mx=20: least(4, 5id div 21)+1).
    // Each look: 2 successes from arm-0 user 1 (value 150) and 2 failures
    // from arm-1 user 2 (value 50). Under perfect separation the pooled
    // two-proportion chi2 equals N exactly (algebra: (cna*cnb)^2*N /
    // (cna*cnb*cna*cnb) = N), so z2_milli = 4000k at look k. Against the
    // declared OBF ladder 20812/10407/6938/5203/4162 the FIRST crossing is
    // look 3 (12000 >= 6938; looks 1-2 fail: 4000 < 20812, 8000 < 10407)
    // while the naive 3841 bar is crossed at look 1 (4000 >= 3841) — the
    // textbook "OBF makes early peeks near-impossible" shape.
    val rows = (0 until 20).map { i =>
      val (u, v) = if (i % 4 < 2) (1L, 150.0) else (2L, 50.0)
      (i + 1L, i * 1000L, u, "a", v)
    }
    val rs = ExperimentOps.queries("q293_obrien_fleming")(spark, eventsRaw(rows))
      .collect()
    assert(rs.length === 5)
    val ladder = Seq(20812L, 10407L, 6938L, 5203L, 4162L)
    for ((r, i) <- rs.zipWithIndex) {
      val k = i + 1
      assert(r.getAs[Long]("look") === k.toLong)
      assert(r.getAs[Long]("n_cum") === 4L * k)
      assert(r.getAs[Long]("z2_milli") === 4000L * k)
      assert(r.getAs[Long]("obf_t_milli") === ladder(i))
      assert(r.getAs[Long]("obf_reject") === (if (k >= 3) 1L else 0L))
      assert(r.getAs[Long]("naive_reject") === 1L)
      assert(r.getAs[Long]("first_obf_look") === 3L)
      assert(r.getAs[Long]("first_naive_look") === 1L)
    }
  }

  test("q305 pinned: three-shift series splits at t=4, then t=2 and t=6") {
    // daily counts [1,1,3,3,9,9,15,15]: level-1 contrast T(t) =
    // (8L_t - 24t... (nL-tS)^2/(t(n-t)) maximizes at t=4 with the EXACT
    // value 25600/16 = 1600 (S=56: (64-224)^2/16). Left half [1,1,3,3]
    // splits at u=2: (8-16)^2/4 = 16 exact (day 1); right half
    // [9,9,15,15] at u=2: (72-96)^2/4 = 144 exact (day 5) — the three
    // planted changepoints recovered in hierarchical order.
    var id = 0L
    val xs = Seq(1, 1, 3, 3, 9, 9, 15, 15)
    val rows = xs.zipWithIndex.flatMap { case (y, day) =>
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = ExperimentOps.queries("q305_binseg_changepoints")(
      spark, eventsFixture(rows)).collect().head
    assert(r.getAs[Long]("split1_day") === 3L)
    assert(r.getAs[Long]("score1") === 1600L)
    assert(r.getAs[Long]("split_left_day") === 1L)
    assert(r.getAs[Long]("score_left") === 16L)
    assert(r.getAs[Long]("split_right_day") === 5L)
    assert(r.getAs[Long]("score_right") === 144L)
  }

  test("q314 pinned: Cox score on 4 users, 2 deaths: U=-0.833, V=2.805") {
    // Users (entry 0, covariate z = morning-event count): u1 dies day 2
    // with z=2, u2 dies day 4 with z=0, u3 (z=1) and u4 (z=3) exit day
    // 10 censored (dmax-2 = 8). Cox score at beta=0 (Cox 1972):
    //   day 2: risk {u1..u4}, zbar = 6/4  -> U1 = 2 - 1.5   = +0.5
    //          V1 = (1*3/3)*Var{2,0,1,3} = 14/4 - 9/4 = 1.25
    //   day 4: risk {u2,u3,u4}, zbar = 4/3 -> U2 = 0 - 4/3  = -1.333
    //          V2 = (1*2/2)*Var{0,1,3}   = 10/3 - 16/9 = 14/9 = 1.5556
    // U = -0.8333, V = 2.8056, z2 = U^2/V = 0.2475. Staged milli floors:
    // u_milli = 500 - 1333 = -833, v_milli = 1250 + 1555 = 2805,
    // z2_milli = 693889 div 2805 = 247; direction -1, no rejection.
    val h = 3600000000L
    val day = 86400000000L
    var id = 0L
    def ev(d: Long, hod: Long, u: Long) = {
      id += 1; (id, d * day + hod * h + id, u, "a", 1.0)
    }
    val rows = Seq(
      ev(0, 1, 1), ev(2, 1, 1),             // u1: e=0, x=2,  z=2 (death)
      ev(0, 13, 2), ev(4, 13, 2),           // u2: e=0, x=4,  z=0 (death)
      ev(0, 1, 3), ev(10, 13, 3),           // u3: e=0, x=10, z=1 (cens)
      ev(0, 1, 4), ev(0, 2, 4), ev(10, 3, 4)) // u4: e=0, x=10, z=3 (cens)
    val r = ExperimentOps.queries("q314_cox_score_test")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("deaths") === 2L)
    assert(r.getAs[Long]("deaths_z") === 2L)
    assert(r.getAs[Long]("u_milli") === -833L)
    assert(r.getAs[Long]("v_milli") === 2805L)
    assert(r.getAs[Long]("z2_milli") === 247L)
    assert(r.getAs[Long]("direction") === -1L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q231 pinned: 2/2 vs 0/2 converters give chi2=4.0; degenerate X gives NULL") {
    // Users 1..4; parity cohorts {2,4} vs {1,3}. Type 'hit': both even
    // users fire 20x (converters), odd users 1x -> 2x2 table
    // (2/2, 0/2): chi2 = N(ad-bc)^2/(row*col products) = 4*16/16 = 4.0
    // (scipy chi2_contingency, correction=False) -> z2_milli = 4000,
    // significant (4000 >= 3841). Type 'none' (X=0) and type 'all'
    // (X=N) are the no-variance branches: NULL verdict, not 0 or a
    // divide-by-zero.
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double)]()
    var id = 0L
    def add(u: Long, t: String, k: Int): Unit =
      (0 until k).foreach { _ => id += 1; rows += ((id, id * 1000L, u, t, 1.0)) }
    Seq(2L, 4L).foreach(u => add(u, "hit", 20)); Seq(1L, 3L).foreach(u => add(u, "hit", 1))
    (1L to 4L).foreach(u => add(u, "none", 1))
    (1L to 4L).foreach(u => add(u, "all", 20))
    val rs = AuditOps.queries("q231_ab_proportion_gate")(spark, eventsRaw(rows.toSeq))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val hit = rs("hit")
    assert(hit.getAs[Long]("n1") === 2L && hit.getAs[Long]("x1") === 2L)
    assert(hit.getAs[Long]("n2") === 2L && hit.getAs[Long]("x2") === 0L)
    assert(hit.getAs[Long]("z2_milli") === 4000L)
    assert(hit.getAs[Long]("significant") === 1L)
    for (t <- Seq("none", "all")) {
      assert(rs(t).isNullAt(rs(t).fieldIndex("z2_milli")), s"$t z2 not NULL")
      assert(rs(t).isNullAt(rs(t).fieldIndex("significant")), s"$t sig not NULL")
    }
  }

  test("q349 pinned edge: all exposure in one arm yields w=0, z²=0, no verdict") {
    // users 2,4,5 are all md5-arm-1 (precomputed): exp_a = 0 -> w_ppm = 0
    // -> the conditional binomial has no variance; the guard must return
    // z2 = 0 / gap_sign 0 rather than divide by w(1-w) = 0.
    val rows = Seq(2L, 4L, 5L).zipWithIndex.map { case (u, i) =>
      (i + 1L, i * 1000L, u, "a", 1.0)
    }
    val r = ExperimentOps.queries("q349_rate_ratio")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("k_events") === 3L)
    assert(r.getAs[Long]("a_arm0") === 0L)
    assert(r.getAs[Long]("w_ppm") === 0L)
    assert(r.getAs[Long]("gap_sign") === 0L)
    assert(r.getAs[Long]("z2_milli") === 0L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q245 pinned: one corrupted day moves LSQ 9x, Theil-Sen not at all") {
    // daily counts [10,12,14,16,100]: all 6 clean pairs have slope
    // exactly 2/day (2000 milli); the 4 pairs touching day 4 read
    // 22500/29333/43000/84000. n_pairs = 10, lower median rank
    // (10+1) div 2 = 5 -> theil_milli = 2000 (scipy.stats.theilslopes
    // slope = 2.0). Least squares: num = 5*488-10*152 = 920, den = 50
    // -> slope 18.4 exactly (lsq_milli 18400) — the breakdown-point
    // demonstration, divergence -16400.
    var id = 0L
    val rows = Seq(10, 12, 14, 16, 100).zipWithIndex.flatMap { case (y, day) =>
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = ScaleOps.queries("q245_theil_sen_trend")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Long]("theil_milli") === 2000L)
    assert(r.getAs[Long]("lsq_milli") === 18400L)
    assert(r.getAs[Long]("divergence_milli") === -16400L)
  }

  test("q264 pinned: Poisson(1) ladder is floor(F(k-1)*2^24); 4-event draws match hashlib") {
    // (a) The operator's nine weight thresholds are EXACTLY
    // floor(CDF_Poisson(1)(k-1) * 2^24), re-derived here from the e^-1
    // series in BigDecimal — independent of the operator's literals.
    val mc = new java.math.MathContext(50)
    val one = java.math.BigDecimal.ONE
    def fact(k: Int) = new java.math.BigDecimal(
      (1 to k).foldLeft(java.math.BigInteger.ONE)((a, i) =>
        a.multiply(java.math.BigInteger.valueOf(i))))
    val em1 = (0 to 45).map(k => one.divide(fact(k), mc)
      .multiply(new java.math.BigDecimal(if (k % 2 == 0) 1 else -1)))
      .reduce(_.add(_)).round(mc)
    val scale = new java.math.BigDecimal(1L << 24)
    val ladder = (1 to 9).map { k =>
      val cdf = (0 until k).map(j => em1.divide(fact(j), mc)).reduce(_.add(_))
      cdf.multiply(scale).toBigInteger.longValueExact
    }
    assert(ladder === Seq(6171992L, 12343985L, 15429982L, 16458647L,
      16715813L, 16767247L, 16775819L, 16777044L, 16777197L))
    // (b) Behavioral draw pin: 4 events (vm 0/1000/2000/3000). hashlib
    // replay of md5("{id}_{r}")[:6] through the ladder gives 31 nonempty
    // replicas (one drops all four rows — the wsum>0 guard), ests sorted
    // with replica tiebreak: 2nd smallest 666, 2nd largest 3000.
    val rows = Seq(0.0, 1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i + 1L, i * 1000L, i + 1L, "a", v)
    }
    val r = ScaleOps.queries("q264_poisson_bootstrap")(spark, eventsRaw(rows))
      .collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("mean_milli") === 1500L)
    assert(r.getAs[Long]("boot_lo_milli") === 666L)
    assert(r.getAs[Long]("boot_hi_milli") === 3000L)
    assert(r.getAs[Long]("ci_width_milli") === 2334L)
  }

  test("q267 pinned: Wald weights/boundary re-derived; crossings at days 13/45") {
    // The declared milli-bit constants are the rounded Wald quantities
    // for H1 p=250permille vs H0 p=200permille, alpha=beta=0.05:
    def mlog2(x: Double) = math.round(1000.0 * math.log(x) / math.log(2.0))
    assert(mlog2(0.250 / 0.200) === 322L)   // per-success weight
    assert(mlog2(0.750 / 0.800) === -93L)   // per-failure weight
    assert(mlog2(0.95 / 0.05) === 4248L)    // log2(19) boundary
    // Crossing days follow by pure counting: one success/day crosses
    // +4248 when (d+1)*322 >= 4248 -> day 13; one failure/day crosses
    // -4248 when (d+1)*93 >= 4248 -> day 45; 1 succ + 2 fail = +136/day
    // never crosses in 10 days (1360).
    var id = 0L
    def daily(t: String, days: Int, succ: Int, fail: Int) =
      (0 until days).flatMap { d =>
        (0 until succ).map { _ => id += 1; (id, d.toLong, t, 150.0) } ++
          (0 until fail).map { _ => id += 1; (id, d.toLong, t, 50.0) }
      }
    val rows = daily("up", 15, 1, 0) ++ daily("down", 50, 0, 1) ++
      daily("mix", 10, 1, 2)
    val rs = AuditOps.queries("q267_sprt_monitor")(spark, eventsFixture(rows))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rs("up").getAs[String]("decision") === "accept_h1")
    assert(rs("up").getAs[Long]("decision_day") === 13L)
    assert(rs("up").getAs[Long]("final_llr_milli") === 15L * 322)
    assert(rs("down").getAs[String]("decision") === "accept_h0")
    assert(rs("down").getAs[Long]("decision_day") === 45L)
    assert(rs("down").getAs[Long]("final_llr_milli") === -50L * 93)
    assert(rs("mix").getAs[String]("decision") === "continue")
    assert(rs("mix").isNullAt(rs("mix").fieldIndex("decision_day")))
    assert(rs("mix").getAs[Long]("final_llr_milli") === 1360L)
  }

  test("q270 pinned: two perfect clusters give rho=1, DEFF=3, ESS=2 (Kish)") {
    // Two sources, three docs each, token counts {2,2,2} and {6,6,6}:
    // zero within-cluster variance -> rho = 1 exactly, m0 = 3 (equal
    // clusters), DEFF = 1 + (3-1)*1 = 3 (Kish 1965), ESS = 6/3 = 2.
    // Milli staging is exact throughout: SSB = 24000 (milli), SSW = 0,
    // MSB = 24000, MSW = 0, m0_milli = 3000, deff_milli = 3000,
    // ess_milli = 2000.
    val rows = Seq(
      (1L, "sa", "a b"), (2L, "sa", "c d"), (3L, "sa", "e f"),
      (4L, "sb", "a b c d e f"), (5L, "sb", "g h i j k l"),
      (6L, "sb", "m n o p q r"))
    val r = CurationOps.queries("q270_design_effect")(spark, docsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("m0_milli") === 3000L)
    assert(r.getAs[Long]("msb_m") === 24000L)
    assert(r.getAs[Long]("msw_m") === 0L)
    assert(r.getAs[Long]("rho_milli") === 1000L)
    assert(r.getAs[Long]("deff_milli") === 3000L)
    assert(r.getAs[Long]("ess_milli") === 2000L)
  }
}
