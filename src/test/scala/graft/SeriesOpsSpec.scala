package graft

import graft.operators.SeriesOps

/** Semantic claims of the round-15 time-series/control operators (output
  * equality vs DuckDB is the oracle gate's job):
  *
  *  - q317's ACF is re-derived by brute force from the raw events in
  *    BigInt (scaled-deviation form, identical truncation) and must
  *    match exactly; |r_k| <= 1 by Cauchy-Schwarz so acf_milli <= 1000;
  *  - q318's pooled rate and every day's out-of-band flag are re-derived
  *    in BigInt (cross-multiplied 3-sigma binomial band);
  *  - q319 conserves purchase cents (sum of week_cents over the matrix
  *    equals the corpus total), cum_cents is the running sum of
  *    week_cents within each cohort, and ltv_cents = cum div n_users.
  */
class SeriesOpsSpec extends SparkSpec {

  private def dailyByType(): Map[(String, Long), Long] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.length.toLong }

  test("q317: brute BigInt ACF matches; acf_milli bounded by 1000") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q317_acf_diagnostic")(spark, sf).collect()
    assert(got.nonEmpty)
    val byType = daily.groupBy(_._1._1)
    got.foreach { r =>
      val (t, lag) = (r.getAs[String]("event_type"), r.getAs[Long]("lag"))
      val series = byType(t).toSeq.sortBy(_._1._2).map(_._2)
      val n = BigInt(series.length)
      val s = series.map(BigInt(_)).sum
      val dd = series.map(y => n * y - s)
      val den = dd.map(x => x * x).sum
      val num = (lag.toInt until dd.length).map(i => dd(i) * dd(i - lag.toInt)).sum
      val expMilli = if (den > 0) (num.abs * 1000 / den).toLong else 0L
      assert(r.getAs[Long]("n_days") === series.length.toLong)
      assert(r.getAs[Long]("acf_sign") === num.signum.toLong, s"sign at ($t,$lag)")
      assert(r.getAs[Long]("acf_milli") === expMilli, s"acf at ($t,$lag)")
      assert(expMilli <= 1000L, s"Cauchy-Schwarz bound broken at ($t,$lag)")
      val sig = if (expMilli * expMilli * series.length >= 4000000L) 1L else 0L
      assert(r.getAs[Long]("significant") === sig, s"band at ($t,$lag)")
    }
  }

  test("q318: brute BigInt pooled rate and 3-sigma band flags match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day",
        "CAST(event_type = 'error' AS LONG) AS e")
      .collect()
    val byDay = rows.groupBy(_.getLong(0)).map { case (d, rs) =>
      d -> (rs.length.toLong, rs.map(_.getLong(1)).sum)
    }
    val totN = byDay.values.map(_._1).sum
    val totX = byDay.values.map(_._2).sum
    val pooled = totX * 1000000L / totN
    val got = SeriesOps.queries("q318_pchart_control")(spark, sf).collect()
    assert(got.length === byDay.size)
    got.foreach { r =>
      val (n, x) = byDay(r.getAs[Long]("day"))
      val rate = x * 1000000L / n
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("rate_ppm") === rate)
      assert(r.getAs[Long]("pooled_ppm") === pooled)
      val dlt = BigInt(rate - pooled)
      val oob = if (dlt * dlt * n > BigInt(9) * pooled * (1000000L - pooled)) 1L else 0L
      assert(r.getAs[Long]("oob") === oob, s"band flag on day ${r.getAs[Long]("day")}")
      assert(r.getAs[Long]("delta_sign") === (rate - pooled).signum.toLong)
    }
  }

  test("q319: cents conserved, cum is the running sum, ltv = cum div users") {
    val totalPurchaseCents = Tables.events(spark, sf)
      .selectExpr("sum(CASE WHEN event_type = 'purchase' " +
        "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS c")
      .collect()(0).getLong(0)
    val got = SeriesOps.queries("q319_cohort_ltv")(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getAs[Long]("week_cents")).sum === totalPurchaseCents)
    got.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("week_offset"))
      var run = 0L
      ordered.foreach { r =>
        run += r.getAs[Long]("week_cents")
        assert(r.getAs[Long]("cum_cents") === run)
        assert(r.getAs[Long]("ltv_cents") === run / r.getAs[Long]("n_users"))
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_users"))
      }
    }
  }

  test("q332: brute ANOVA eta-squared and peak dow match") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q332_seasonality_strength")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val cells = daily.filter(_._1._1 == t).toSeq.map { case ((_, d), y) => (d, y) }
      val n = cells.length.toLong
      val s = cells.map(_._2).sum
      val m = BigInt(s) * 1000 / n
      val byDow = cells.groupBy(_._1 % 7)
      val ssb = byDow.values.map { g2 =>
        val mg = BigInt(g2.map(_._2).sum) * 1000 / g2.length
        BigInt(g2.length) * (mg - m) * (mg - m)
      }.sum
      val sst = cells.map { case (_, y) =>
        (BigInt(y) * 1000 - m) * (BigInt(y) * 1000 - m) }.sum
      val strength = if (sst > 0) (ssb * 1000 / sst).toLong else 0L
      assert(g.getAs[Long]("n_days") === n)
      assert(g.getAs[Long]("strength_milli") === strength, s"eta2 at $t")
      assert(strength >= 0L && strength <= 1000L)
      val (pd, pm) = byDow.map { case (dw, g2) =>
        (dw, (BigInt(g2.map(_._2).sum) * 1000 / g2.length).toLong)
      }.toSeq.sortBy { case (dw, mg) => (-mg, dw) }.head
      assert(g.getAs[Long]("peak_dow") === pd)
      assert(g.getAs[Long]("peak_mean_milli") === pm)
    }
  }

  test("q333: brute variance-to-mean ratio matches") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q333_overdispersion")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val ys = daily.filter(_._1._1 == t).values.toSeq
      val n = BigInt(ys.length)
      val s = ys.map(BigInt(_)).sum
      val sd2 = ys.map(y => (n * y - s) * (n * y - s)).sum
      val vmr = if (n > 1 && s > 0) (sd2 * 1000 / (n * (n - 1) * s)).toLong else 0L
      assert(g.getAs[Long]("mean_milli") === (s * 1000 / n).toLong)
      assert(g.getAs[Long]("vmr_milli") === vmr, s"vmr at $t")
      assert(g.getAs[Long]("overdispersed") === (if (vmr > 1500) 1L else 0L))
    }
  }

  test("q335: brute bivariate CCF matches at every lag; C-S bound holds") {
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day",
        "CAST(event_type = 'error' AS LONG) AS e",
        "CAST(event_type = 'purchase' AS LONG) AS p").collect()
    val byDay = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      (rs.map(_.getLong(1)).sum, rs.map(_.getLong(2)).sum)
    }
    val n = BigInt(byDay.length)
    val (se, sp) = (byDay.map(c => BigInt(c._1)).sum, byDay.map(c => BigInt(c._2)).sum)
    val de = byDay.map(c => n * c._1 - se)
    val dp = byDay.map(c => n * c._2 - sp)
    val dene = de.map(x => x * x).sum
    val denp = dp.map(x => x * x).sum
    val got = SeriesOps.queries("q335_ccf_leadlag")(spark, sf).collect()
    assert(got.length === 7)
    got.foreach { g =>
      val k = g.getAs[Long]("lag").toInt
      val pairs = de.indices.flatMap { i =>
        val j = i - k
        if (j >= 0 && j < dp.length) Some(de(i) * dp(j)) else None
      }
      val num = pairs.sum
      assert(g.getAs[Long]("n_pairs") === pairs.length.toLong)
      assert(g.getAs[Long]("ccf_sign") === num.signum.toLong)
      val r2 = if (dene > 0 && denp > 0)
        (num.abs * 1000 / dene * num.abs / denp).toLong else 0L
      assert(g.getAs[Long]("ccf2_permille") === r2, s"ccf2 at lag $k")
      assert(r2 <= 1000L)
    }
  }

  test("q336: Durbin-Levinson phi22 re-derives from the truncated r1/r2") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q336_pacf2")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val ys = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2).map(_._2)
      val n = BigInt(ys.length)
      val s = ys.map(BigInt(_)).sum
      val dd = ys.map(y => n * y - s)
      val den = dd.map(x => x * x).sum
      def rk(k: Int): Long = {
        val num = (k until dd.length).map(i => dd(i) * dd(i - k)).sum
        if (den > 0) (num * 1000 / den).toLong else 0L
      }
      val (r1, r2) = (rk(1), rk(2))
      assert(g.getAs[Long]("r1_milli") === r1)
      assert(g.getAs[Long]("r2_milli") === r2)
      val pnum = r2 * 1000L - r1 * r1
      val pden = 1000000L - r1 * r1
      assert(g.getAs[Long]("pacf2_sign") === pnum.signum.toLong)
      assert(g.getAs[Long]("pacf2_milli") ===
        (if (pden > 0) pnum.abs * 1000L / pden else 0L))
    }
  }

  test("q337: brute Ljung-Box Q from truncated per-lag ACF matches") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q337_ljung_box")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val ys = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2).map(_._2)
      val n = BigInt(ys.length)
      val s = ys.map(BigInt(_)).sum
      val dd = ys.map(y => n * y - s)
      val den = dd.map(x => x * x).sum
      val lags = (1 to 7).filter(_ < ys.length)
      val tsum = lags.map { k =>
        val num = (k until dd.length).map(i => dd(i) * dd(i - k)).sum
        val rMilli = if (den > 0) (num.abs * 1000 / den).toLong else 0L
        rMilli * rMilli / (ys.length - k)
      }.sum
      val q = ys.length.toLong * (ys.length + 2) * tsum / 1000
      val crit = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L, 14067L)(
        math.min(lags.length, 7) - 1)
      assert(g.getAs[Long]("n_days") === ys.length.toLong)
      assert(g.getAs[Long]("m_lags") === lags.length.toLong)
      assert(g.getAs[Long]("q_lb_milli") === q, s"Q at $t")
      assert(g.getAs[Long]("crit_milli") === crit)
      assert(g.getAs[Long]("reject") === (if (q >= crit) 1L else 0L))
    }
  }

  test("q338: brute runs count, lower median, and z2 match") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q338_runs_test")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val ys = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2).map(_._2)
      val n = ys.length.toLong
      val med = ys.sorted.apply(((n + 1) / 2 - 1).toInt) // lower median
      val marks = ys.map(_ > med)
      val runs = 1L + marks.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      val n1 = marks.count(identity).toLong
      val n2 = n - n1
      val dnum = n * runs - n - 2 * n1 * n2
      val vden = 2 * n1 * n2 * (2 * n1 * n2 - n)
      val z2 = if (vden > 0 && n > 1) dnum * dnum * (n - 1) * 1000 / vden else 0L
      assert(g.getAs[Long]("median_y") === med, s"median at $t")
      assert(g.getAs[Long]("n_above") === n1)
      assert(g.getAs[Long]("runs") === runs, s"runs at $t")
      assert(g.getAs[Long]("gap_sign") === dnum.signum.toLong)
      assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
      assert(g.getAs[Long]("reject") === (if (z2 >= 3841) 1L else 0L))
    }
  }

  test("q339: brute Page-Hinkley walk matches; gap nonneg; planted drift alarms") {
    val rows = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day",
        "CAST(event_type = 'error' AS LONG) AS e")
      .collect()
    val byDay = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
      case (d, rs) => (d, rs.length.toLong, rs.map(_.getLong(1)).sum)
    }
    val got = SeriesOps.queries("q339_page_hinkley")(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(got.length === byDay.length)
    var xsum = 0L; var cum = 0L; var runMin = Long.MaxValue
    byDay.zip(got).zipWithIndex.foreach { case (((d, nd, e), g), i) =>
      val rate = e * 1000000L / nd
      xsum += rate
      val mean = xsum / (i + 1)
      cum += rate - mean - 1000L
      runMin = math.min(runMin, cum)
      val gap = cum - runMin
      assert(g.getAs[Long]("day") === d)
      assert(g.getAs[Long]("rate_ppm") === rate, s"rate at day $d")
      assert(g.getAs[Long]("mean_ppm") === mean)
      assert(g.getAs[Long]("ph_gap") === gap, s"gap at day $d")
      assert(gap >= 0L)
      assert(g.getAs[Long]("alarm") === (if (gap > 25000) 1L else 0L))
    }
    // a planted sustained rate break must trip the detector: 20 quiet
    // days at ~5% error then 10 days at ~40% (well past delta+lambda)
    val quiet = (1 to 20).flatMap(d => (1 to 100).map(i =>
      (d.toLong, if (i <= 5) "error" else "view")))
    val drift = (21 to 30).flatMap(d => (1 to 100).map(i =>
      (d.toLong, if (i <= 40) "error" else "view")))
    import spark.implicits._
    val planted = (quiet ++ drift).toDF("day", "event_type")
      .selectExpr("timestamp_micros(day * 86400000000) AS ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("q339").toString
    planted.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val alarms = SeriesOps.queries("q339_page_hinkley")(spark, dir)
      .filter("alarm = 1").collect()
    assert(alarms.nonEmpty, "planted 35-point sustained drift must alarm")
    assert(alarms.map(_.getAs[Long]("day")).min >= 21L,
      "no alarm during the quiet regime")
  }

  test("q343: brute EWMA fold with step-identical truncation matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val dayTotals = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byType = rows.groupBy(_._1)
    val got = SeriesOps.queries("q343_ewma_chart")(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(got.nonEmpty)
    byType.foreach { case (t, es) =>
      val series = es.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, g) =>
        (d, g.length.toLong * 1000000L / dayTotals(d))
      }
      val n = series.length.toLong
      val sx = series.map(_._2).sum
      val sxx = series.map(v => v._2 * v._2).sum
      val mu = sx / n
      val s2 = if (n > 1) (sxx - n * mu * mu) / (n - 1) else 0L
      var z = mu; var g = 1000000L
      val exp = series.map { case (d, x) =>
        z = (x + 3 * z) / 4
        g = 9 * g / 16
        val oob = BigInt(z - mu) * (z - mu) * 7000000 >
          BigInt(9) * s2 * (1000000L - g)
        (d, x, z, g, if (oob) 1L else 0L)
      }
      val gr = got(t).sortBy(_.getAs[Long]("day"))
      assert(gr.length === exp.length, s"rows for $t")
      gr.zip(exp).foreach { case (r, (d, x, ze, ge, oob)) =>
        assert(r.getAs[Long]("day") === d)
        assert(r.getAs[Long]("x_ppm") === x, s"x at ($t,$d)")
        assert(r.getAs[Long]("z_ppm") === ze, s"z at ($t,$d)")
        assert(r.getAs[Long]("g_ppm") === ge, s"g at ($t,$d)")
        assert(r.getAs[Long]("oob") === oob, s"oob at ($t,$d)")
      }
    }
  }

  test("q347: brute Grubbs max statistic, peak day, and ladder verdict match") {
    val daily = dailyByType()
    val got = SeriesOps.queries("q347_grubbs_outlier")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val series = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2)
      val n = BigInt(series.length)
      val s = series.map(e => BigInt(e._2)).sum
      val dd = series.map { case ((_, day), y) => (day, n * y - s) }
      val sdd2 = dd.map(e => e._2 * e._2).sum
      val mx2 = dd.map(e => e._2 * e._2).max
      val peakDay = dd.filter(e => e._2 * e._2 == mx2).map(_._1).min
      val peakSign = dd.filter(e => e._2 * e._2 == mx2).map(_._2.signum).max
      val g2 = if (sdd2 > 0 && n > 1) (mx2 * (n - 1) * 1000 / sdd2).toLong else 0L
      val crit = if (n >= 30) 8456L else if (n >= 25) 7964L
        else if (n >= 20) 7339L else if (n >= 15) 6497L else 5244L
      assert(g.getAs[Long]("peak_day") === peakDay, s"peak at $t")
      assert(g.getAs[Long]("peak_sign") === peakSign.toLong)
      assert(g.getAs[Long]("g2_milli") === g2, s"G2 at $t")
      assert(g.getAs[Long]("crit_milli") === crit)
      assert(g.getAs[Long]("outlier") === (if (g2 >= crit) 1L else 0L))
    }
  }

  test("q348: brute Holt fold with step-identical truncation matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val dayTotals = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = SeriesOps.queries("q348_holt_backtest")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val xs = rows.filter(_._1 == t).groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (d, es) => es.length.toLong * 1000000L / dayTotals(d) }
      var (l, b, px) = (0L, 0L, 0L)
      var (sh, sn, ne) = (0L, 0L, 0L)
      xs.zipWithIndex.foreach { case (x, i) =>
        if (i == 0) { l = x; b = 0; px = x }
        else if (i == 1) { b = x - l; l = x; px = x }
        else {
          sh += math.abs(x - (l + b)); sn += math.abs(x - px); ne += 1
          val nl = (x + 3 * (l + b)) / 4
          b = ((nl - l) + 3 * b) / 4; l = nl; px = x
        }
      }
      assert(g.getAs[Long]("n_days") === xs.length.toLong)
      assert(g.getAs[Long]("n_eval") === ne, s"eval count at $t")
      assert(g.getAs[Long]("holt_mae_ppm") === (if (ne > 0) sh / ne else 0L),
        s"holt mae at $t")
      assert(g.getAs[Long]("naive_mae_ppm") === (if (ne > 0) sn / ne else 0L))
      assert(g.getAs[Long]("holt_wins") ===
        (if ((if (ne > 0) sh / ne else 0L) < (if (ne > 0) sn / ne else 0L)) 1L
         else 0L))
    }
  }

  test("q350: brute day-pair Kendall tau-b matches; C-S bound holds") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val days = rows.map(_._2).distinct.sorted
    val series = days.map { d =>
      (rows.count(r => r._2 == d && r._1 == "error").toLong,
        rows.count(r => r._2 == d && r._1 == "purchase").toLong)
    }
    var (cd, te, tp, np) = (0L, 0L, 0L, 0L)
    for (i <- series.indices; j <- (i + 1) until series.length) {
      val se = (series(j)._1 - series(i)._1).signum
      val sp = (series(j)._2 - series(i)._2).signum
      cd += se * sp; np += 1
      if (se == 0) te += 1
      if (sp == 0) tp += 1
    }
    val (de, dp) = (np - te, np - tp)
    val tau2 = if (de > 0 && dp > 0)
      (math.abs(cd) * 1000 / de) * math.abs(cd) / dp else 0L
    val g = SeriesOps.queries("q350_kendall_tau")(spark, sf).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("n_pairs") === np)
    assert(g.head.getAs[Long]("cd") === cd)
    assert(g.head.getAs[Long]("t_e") === te)
    assert(g.head.getAs[Long]("t_p") === tp)
    assert(g.head.getAs[Long]("tau_sign") === cd.signum.toLong)
    assert(g.head.getAs[Long]("tau2_milli") === tau2)
    assert(tau2 <= 1000L, "tau-b bounded by 1")
  }
}
