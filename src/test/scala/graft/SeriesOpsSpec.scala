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
}
