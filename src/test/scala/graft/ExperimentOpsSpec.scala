package graft

import graft.operators.ExperimentOps
import org.apache.spark.sql.functions._

/** Semantic claims of the round-13 experimentation operators (output
  * equality vs DuckDB is the oracle gate's job):
  *
  *  - q279's rho2 is a valid squared correlation (0..1000 permille), its
  *    theta carries the covariance sign, and the CUPED identity holds:
  *    the user-weighted average of the adjusted arm means equals the
  *    pooled unadjusted mean (adjustment is mean-preserving by
  *    construction, up to the staged fixed-point floors);
  *  - q280's doubled U statistic is re-derived here by brute-force
  *    midranking of the collected values for one event_type — the
  *    value-grain window form must equal the textbook row-grain form
  *    exactly, ties included — and U is range-valid (0 <= U2 <= 2nAnB);
  *  - q281's delete-one-block ratios are re-derived from block sums and
  *    must reproduce vj_milli2 exactly; block accounting is conserved
  *    (sum of deleted masses = (B-1) * total);
  *  - q282's signs live in {-1,0,1}, strata are bounded by the four
  *    day-parts, and reversal mass can never exceed the whole.
  */
class ExperimentOpsSpec extends SparkSpec {

  private def mdBucket(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 100
  }

  private def arm(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = h.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("q279: rho2 in range, theta sign = covariance sign, CUPED is mean-preserving") {
    val rows = ExperimentOps.queries("q279_cuped_adjustment")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho2 = r.getAs[Long]("rho2_permille")
      assert(rho2 >= 0L && rho2 <= 1000L, s"rho2 out of range: $r")
    }
    // mean preservation: sum_arm n_arm * (mean_y - mean_yadj) =
    // -theta * sum_arm n_arm * dx = 0 since dx is centered; allow the
    // staged integer floors (each mean floored once, theta*dx floored
    // once) => tolerance of a few micro-units per user.
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val n = rs.map(_.getAs[Long]("n_users")).sum
      val rawSum = rs.map(r => r.getAs[Long]("n_users") * r.getAs[Long]("mean_y_micro")).sum
      val adjSum = rs.map(r => r.getAs[Long]("n_users") * r.getAs[Long]("mean_yadj_micro")).sum
      assert(math.abs(rawSum - adjSum) <= 3L * n * 1000L,
        s"CUPED not mean-preserving: raw=$rawSum adj=$adjSum n=$n")
    }
  }

  test("q280: value-grain doubled U equals brute-force midrank U; range valid") {
    val got = ExperimentOps.queries("q280_mann_whitney")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      val (na, nb, u2) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("u2_a"))
      assert(u2 >= 0L && u2 <= 2L * na * nb, s"U2 out of range: $r")
    }
    // brute-force one event_type: textbook midranks over every row
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (arm(r.getLong(0)), r.getLong(1)))
    val sorted = raw.map(_._2).sorted
    // midrank2(v) = 2 * (#smaller) + (#equal) + 1  (doubled average rank)
    val smaller = sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2).min.toLong, xs.length.toLong)
    }
    val r2a = raw.filter(_._1 == 0L).map { case (_, v) =>
      val (below, eq) = smaller(v); 2L * below + eq + 1L
    }.sum
    val nA = raw.count(_._1 == 0L).toLong
    val bruteU2 = r2a - nA * (nA + 1L)
    assert(got("click").getAs[Long]("u2_a") == bruteU2,
      s"U2 mismatch: got ${got("click").getAs[Long]("u2_a")} brute $bruteU2")
    // z² re-derivation from the brute midranks: with u2 = 2U,
    // z² = (u2 − nA·nB)²·3·n·(n−1) / (4·... ) folded as
    // z2_milli = (u2 − nA·nB)²·3000·n·(n−1) div (nA·nB·(n³ − n − T)),
    // T = Σ(t³ − t). Exact BigInt, same single truncating division as
    // both engines — must match to the milli.
    val nB = raw.length.toLong - nA
    val n = nA + nB
    val ties = raw.groupBy(_._2).map { case (_, xs) =>
      val t = BigInt(xs.length); t * t * t - t
    }.sum
    val diff = BigInt(bruteU2) - BigInt(nA) * nB
    val denom = BigInt(nA) * nB * (BigInt(n) * n * n - n - ties)
    val bruteZ2 = if (nA > 0 && nB > 0 && denom > 0)
      (diff * diff * 3000 * n * (n - 1) / denom).toLong else 0L
    assert(got("click").getAs[Long]("z2_milli") == bruteZ2,
      s"z2 mismatch: got ${got("click").getAs[Long]("z2_milli")} brute $bruteZ2")
  }

  test("q281: jackknife variance reproduced from block sums; SEs consistent") {
    val got = ExperimentOps.queries("q281_ratio_variance")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (vd, vj) = (r.getAs[Long]("vd_milli2"), r.getAs[Long]("vj_milli2"))
      assert(vd >= 0L && vj >= 0L)
      val sed = r.getAs[Long]("se_delta_milli")
      assert(sed * sed <= vd && (sed + 1) * (sed + 1) > vd, s"floor-sqrt broken: $r")
    }
    // brute re-derivation for one event_type from raw rows
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = rows.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._2).sum, xs.length.toLong)
    }.toSeq
    val (sy, sm) = (perUser.map(_._2).sum, perUser.map(_._3).sum)
    val rMilli = sy * 1000L / sm
    val blocks = perUser.groupBy { case (u, _, _) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 32
    }.toSeq.map { case (_, xs) => (xs.map(_._2).sum, xs.map(_._3).sum) }
    val rb = blocks.map { case (yb, mb) => (sy - yb) * 1000L / (sm - mb) }
    val b = rb.length.toLong
    val vjBrute = (b - 1L) * rb.map(x => (x - rMilli) * (x - rMilli)).sum / b
    val gotClick = got.find(_.getAs[String]("event_type") == "click").get
    assert(gotClick.getAs[Long]("vj_milli2") == vjBrute,
      s"vj mismatch: got ${gotClick.getAs[Long]("vj_milli2")} brute $vjBrute")
  }

  test("q291: W1 re-derived from raw rows over the dense bin grid") {
    val got = ExperimentOps.queries("q291_wasserstein_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("w1_milli"))).toMap
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("least(CAST(63 AS BIGINT), CAST(round(value * 100) AS BIGINT) div 800)").as("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ca = new Array[Long](64); val cb = new Array[Long](64)
    raw.foreach { case (hod, bin) =>
      if (hod < 12) ca(bin.toInt) += 1 else cb(bin.toInt) += 1
    }
    val (na, nb) = (ca.sum, cb.sum)
    var (cuma, cumb, gap) = (0L, 0L, BigInt(0))
    (0 until 64).foreach { b =>
      cuma += ca(b); cumb += cb(b)
      gap += (BigInt(cuma) * nb - BigInt(cumb) * na).abs
    }
    val brute = (na, nb, (gap * 8000 / (BigInt(na) * nb)).toLong)
    assert(got("click") == brute, s"W1 mismatch: got ${got("click")} brute $brute")
  }

  test("q292: reliability rows valid; ECE constant; full brute re-derivation") {
    val rows = ExperimentOps.queries("q292_calibration_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val eces = rows.map(_.getAs[Long]("ece_micro")).distinct
    assert(eces.length == 1 && eces.head >= 0L && eces.head <= 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("bin") >= 0L && r.getAs[Long]("bin") <= 9L)
      assert(r.getAs[Long]("mean_y_permille") >= 0L && r.getAs[Long]("mean_y_permille") <= 1000L)
      assert(r.getAs[Long]("mean_p_permille") >= 0L && r.getAs[Long]("mean_p_permille") <= 1000L)
      assert(r.getAs[Long]("brier_micro2") >= 0L && r.getAs[Long]("brier_micro2") <= 1000000000000L)
    }
    // brute: same features, BigInt Cramer, clamp, bin, ECE
    val feats = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        (r.getLong(0),
          w.count(tk => tk == "a" || tk == "the").toLong * 10L / w.length,
          w.map(_.length.toLong).sum * 10L / w.length,
          if (r.getString(2) == "en") 1L else 0L)
      }
    val tr = feats.filter(f => mdBucket(f._1) < 80)
    val n = BigInt(tr.length)
    val s1 = tr.map(f => BigInt(f._2)).sum; val s2 = tr.map(f => BigInt(f._3)).sum
    val s11 = tr.map(f => BigInt(f._2) * f._2).sum
    val s12 = tr.map(f => BigInt(f._2) * f._3).sum
    val s22 = tr.map(f => BigInt(f._3) * f._3).sum
    val sy = tr.map(f => BigInt(f._4)).sum
    val sy1 = tr.map(f => BigInt(f._4) * f._2).sum
    val sy2 = tr.map(f => BigInt(f._4) * f._3).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val w0 = (sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)) * 1000000 / det
    val w1 = (n * (sy1 * s22 - sy2 * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)) * 1000000 / det
    val w2 = (n * (s11 * sy2 - s12 * sy1) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)) * 1000000 / det
    val ev = feats.filter(f => mdBucket(f._1) >= 80).map { f =>
      val p = (w0 + w1 * f._2 + w2 * f._3).max(BigInt(0)).min(BigInt(1000000))
      (p.toLong.min(999999L) / 100000L, p.toLong, f._4)
    }
    val gaps = ev.groupBy(_._1).values
      .map(xs => (BigInt(xs.map(_._2).sum) - BigInt(1000000) * xs.map(_._3).sum).abs).sum
    val bruteEce = (gaps / ev.length).toLong
    assert(eces.head == bruteEce, s"ECE: got ${eces.head} brute $bruteEce")
  }

  test("q293: ladder as declared; first crossings re-derived; final look = full-sample z2") {
    val rows = ExperimentOps.queries("q293_obrien_fleming")(spark, sf).collect()
    assert(rows.length % 5 == 0)
    val ladder = Seq(20812L, 10407L, 6938L, 5203L, 4162L)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byLook = rs.sortBy(_.getAs[Long]("look"))
      assert(byLook.map(_.getAs[Long]("obf_t_milli")).toSeq == ladder)
      val firstObf = byLook.collectFirst {
        case r if r.getAs[Long]("obf_reject") == 1L => r.getAs[Long]("look")
      }.getOrElse(99L)
      assert(byLook.forall(_.getAs[Long]("first_obf_look") == firstObf))
      // cumulative n is monotone and ends at the type's full count
      val ns = byLook.map(_.getAs[Long]("n_cum"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    }
    // final-look z2 equals the full-sample cross-multiplied z2 (brute)
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (arm(r.getLong(0)), if (r.getLong(1) >= 100L) 1L else 0L))
    val (na, xa) = (raw.count(_._1 == 0L).toLong, raw.filter(_._1 == 0L).map(_._2).sum)
    val (nb, xb) = (raw.count(_._1 == 1L).toLong, raw.filter(_._1 == 1L).map(_._2).sum)
    val d = BigInt(xa) * nb - BigInt(xb) * na
    val brute = (d * d * (na + nb) * 1000 /
      (BigInt(xa + xb) * (na + nb - xa - xb) * na * nb)).toLong
    val gotFinal = rows.find(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Long]("look") == 5L).get.getAs[Long]("z2_milli")
    assert(gotFinal == brute, s"final z2: got $gotFinal brute $brute")
  }

  test("q297: medians re-derived by brute sort; bands contain the median") {
    val rows = ExperimentOps.queries("q297_quantile_effect")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lo_a_centi") <= r.getAs[Long]("med_a_centi") &&
        r.getAs[Long]("med_a_centi") <= r.getAs[Long]("hi_a_centi"))
      assert(r.getAs[Long]("lo_b_centi") <= r.getAs[Long]("med_b_centi") &&
        r.getAs[Long]("med_b_centi") <= r.getAs[Long]("hi_b_centi"))
      assert(r.getAs[Long]("qte_centi") ==
        r.getAs[Long]("med_b_centi") - r.getAs[Long]("med_a_centi"))
    }
    // brute medians for one type from raw rows
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (arm(r.getLong(0)), r.getLong(1)))
    def med(vs: Seq[Long]): Long = {
      val s = vs.sorted; s(((s.length + 1) / 2 - 1).toInt)
    }
    val gotClick = rows.find(_.getAs[String]("event_type") == "click").get
    assert(gotClick.getAs[Long]("med_a_centi") == med(raw.filter(_._1 == 0L).map(_._2)))
    assert(gotClick.getAs[Long]("med_b_centi") == med(raw.filter(_._1 == 1L).map(_._2)))
  }

  test("q300: MDE shrinks with horizon; sqrt exact; powered flag consistent") {
    val rows = ExperimentOps.queries("q300_mde_calculator")(spark, sf).collect()
    assert(rows.length % 3 == 0)
    rows.foreach { r =>
      assert((r.getAs[Long]("powered") == 1L) ==
        (r.getAs[Long]("gap_micro") >= r.getAs[Long]("mde_micro")))
      // recompute v, take the exact integer sqrt, re-derive the MDE
      val p = r.getAs[Long]("p_micro"); val nh = r.getAs[Long]("n_h")
      // per-arm size is n_h/2 under the 50/50 split: 2p(1−p)/(n_h/2)
      val v = 4L * p * (1000000L - p) / nh
      val sq = {
        var s = math.floor(math.sqrt(v.toDouble)).toLong
        if ((s + 1) * (s + 1) <= v) s += 1
        if (s * s > v) s -= 1
        s
      }
      assert(r.getAs[Long]("mde_micro") == 2802L * sq / 1000L, s"MDE drift: $r v=$v sq=$sq")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byH = rs.sortBy(_.getAs[Long]("horizon")).map(_.getAs[Long]("mde_micro"))
      assert(byH.zip(byH.tail).forall { case (a, b) => b <= a },
        s"MDE must shrink with horizon: ${byH.toSeq}")
    }
  }

  test("q301: S and tie-corrected variance re-derived from the daily series") {
    val rows = ExperimentOps.queries("q301_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"))
      assert(math.abs(s) <= n * (n - 1) / 2, s"S out of range: $r")
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("trend")))
    }
    val xs = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    var s = 0L
    for (i <- xs.indices; j <- i + 1 until xs.length)
      s += java.lang.Long.signum(xs(j) - xs(i))
    val n = xs.length.toLong
    val tieTerm = xs.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
    val bruteZ2 = if (var18 > 0 && math.abs(s) > 1)
      (math.abs(s) - 1) * (math.abs(s) - 1) * 18L * 1000L / var18 else 0L
    val got = rows.find(_.getAs[String]("event_type") == "click").get
    assert(got.getAs[Long]("s_stat") == s, s"S: got ${got.getAs[Long]("s_stat")} brute $s")
    assert(got.getAs[Long]("z2_milli") == bruteZ2)
  }

  test("q303: DiD re-derived from user deltas; reject consistent") {
    val rows = ExperimentOps.queries("q303_did_estimator")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getAs[Long]("reject") == 1L) == (r.getAs[Long]("z2_milli") >= 3841L))
    }
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perUser = raw.groupBy(_._1).toSeq.map { case (u, xs) =>
      val d = xs.filter(_._2 >= 12).map(_._3).sum - xs.filter(_._2 < 12).map(_._3).sum
      (arm(u), BigInt(d))
    }
    val a = perUser.filter(_._1 == 0L).map(_._2); val b = perUser.filter(_._1 == 1L).map(_._2)
    val did = b.sum * 1000000 / b.length - a.sum * 1000000 / a.length
    val got = rows.find(_.getAs[String]("event_type") == "click").get
    assert(BigInt(got.getAs[Long]("did_micro")) == did,
      s"DiD: got ${got.getAs[Long]("did_micro")} brute $did")
  }

  test("q304: 20 null splits per type; FP rate plausibly calibrated") {
    val rows = ExperimentOps.queries("q304_aa_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_splits") == 20L)
      assert(r.getAs[Long]("fp_permille") == r.getAs[Long]("n_reject") * 1000L / 20L)
      // under the null, >6/20 rejections at alpha=.05 has P < 2e-4 —
      // a failure here means the seeded splits are not independent nulls
      assert(r.getAs[Long]("n_reject") <= 6L, s"A/A badly miscalibrated: $r")
    }
  }

  test("q305: both-level splits re-derived by brute binary segmentation") {
    val rows = ExperimentOps.queries("q305_binseg_changepoints")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val xs = daily.map(_._2); val n = xs.length.toLong; val tot = xs.sum
    def best(lo: Int, hi: Int): Option[(Int, Long)] = { // [lo, hi) 0-based
      val m = (hi - lo).toLong
      if (m < 2) return None
      val sSeg = xs.slice(lo, hi).sum
      var (bi, bs) = (-1, -1L); var cum = 0L
      for (i <- lo until hi - 1) {
        cum += xs(i)
        val u = (i - lo + 1).toLong
        val sc = (m * cum - u * sSeg) * (m * cum - u * sSeg) / (u * (m - u))
        if (sc > bs) { bs = sc; bi = i }
      }
      Some((bi, bs))
    }
    val Some((i1, s1)) = best(0, xs.length)
    val got = rows.find(_.getAs[String]("event_type") == "click").get
    assert(got.getAs[Long]("split1_day") == daily(i1)._1 &&
      got.getAs[Long]("score1") == s1, s"level-1: got $got brute ${(daily(i1)._1, s1)}")
    val left = best(0, i1 + 1).map { case (i, s) => (daily(i)._1, s) }.getOrElse((0L, 0L))
    val right = best(i1 + 1, xs.length).map { case (i, s) => (daily(i)._1, s) }.getOrElse((0L, 0L))
    assert((got.getAs[Long]("split_left_day"), got.getAs[Long]("score_left")) == left)
    assert((got.getAs[Long]("split_right_day"), got.getAs[Long]("score_right")) == right)
  }

  test("q306: SRM chi-square re-derived; flag consistent; no false SRM on the fixture") {
    val rows = ExperimentOps.queries("q306_srm_guardrail")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ua, ub) = (r.getAs[Long]("ua"), r.getAs[Long]("ub"))
      assert(r.getAs[Long]("srm_user_milli") == (ua - ub) * (ua - ub) * 1000L / (ua + ub))
      val (ea, eb) = (r.getAs[Long]("ea"), r.getAs[Long]("eb"))
      assert(r.getAs[Long]("srm_event_milli") == (ea - eb) * (ea - eb) * 1000L / (ea + eb))
      assert((r.getAs[Long]("srm_flag") == 1L) ==
        (r.getAs[Long]("srm_user_milli") >= 10828L ||
          r.getAs[Long]("srm_event_milli") >= 10828L))
      // the md5 split of an un-tampered fixture must NOT trip the guardrail
      assert(r.getAs[Long]("srm_flag") == 0L, s"false SRM on clean fixture: $r")
    }
  }

  test("q307: post-stratified diff and SE re-derived from raw rows; vr consistent") {
    val got = ExperimentOps.queries("q307_post_stratification")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      assert(r.getAs[Long]("n_strata") >= 1L && r.getAs[Long]("n_strata") <= 4L)
      assert((r.getAs[Long]("reject") == 1L) == (r.getAs[Long]("z2_milli") >= 3841L))
      // vr is the exact staged ratio of the two reported SE²s
      val (ss, sp) = (r.getAs[Long]("se2_strat_micro2"), r.getAs[Long]("se2_plain_micro2"))
      if (sp > 0)
        assert(r.getAs[Long]("vr_permille") ==
          (BigInt(ss) * 1000 / BigInt(sp)).toLong, s"vr drift: $r")
    }
    // brute re-derivation for one event_type with the same staged BigInt
    // arithmetic: user fold -> tier cells -> both-arms>=2 filter ->
    // weighted recombination
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = raw.groupBy(_._1).map { case (u, xs) =>
      val pre = xs.count(_._2 < 12).toLong
      val y = xs.filter(_._2 >= 12).map(_._3).sum
      val tier = if (pre <= 0) 0L else if (pre <= 2) 1L else if (pre <= 5) 2L else 3L
      (arm(u), tier, y)
    }.toSeq
    val cells = users.groupBy(_._2).toSeq.map { case (_, xs) =>
      val a = xs.filter(_._1 == 0L).map(_._3)
      val b = xs.filter(_._1 == 1L).map(_._3)
      (a.length.toLong, a.map(BigInt(_)).sum, a.map(v => BigInt(v) * v).sum,
        b.length.toLong, b.map(BigInt(_)).sum, b.map(v => BigInt(v) * v).sum)
    }.filter(c => c._1 > 1 && c._4 > 1)
    val n = cells.map(c => c._1 + c._4).sum
    val wgap = cells.map { case (na, sa, _, nb, sb, _) =>
      BigInt(na + nb) * (sb * 1000000 / nb - sa * 1000000 / na)
    }.sum
    val wu = cells.map { case (na, sa, saa, nb, sb, sbb) =>
      val ua = (na * saa - sa * sa) * 1000000 / (BigInt(na) * na * (na - 1))
      val ub = (nb * sbb - sb * sb) * 1000000 / (BigInt(nb) * nb * (nb - 1))
      BigInt(na + nb) * (na + nb) * (ua + ub)
    }.sum
    val r = got("click")
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Long]("diff_micro") == (wgap / n).toLong,
      s"diff mismatch: got ${r.getAs[Long]("diff_micro")} brute ${wgap / n}")
    assert(r.getAs[Long]("se2_strat_micro2") ==
      (wu / (BigInt(n) * n)).toLong * 1000000L,
      s"se2 mismatch: got ${r.getAs[Long]("se2_strat_micro2")} brute ${(wu / (BigInt(n) * n)).toLong * 1000000L}")
  }

  test("q308: at-risk, deaths, and cumulative hazard re-derived by brute spell-walking") {
    val got = ExperimentOps.queries("q308_nelson_aalen")(spark, sf).collect()
      .filter(_.getAs[String]("event_type") == "click")
      .sortBy(_.getAs[Long]("day"))
    assert(got.nonEmpty)
    // invariants on the full output
    ExperimentOps.queries("q308_nelson_aalen")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("deaths") + r.getAs[Long]("censored"),
        s"risk set smaller than its own exits: $r")
    }
    val hc = got.map(_.getAs[Long]("h_cum_micro"))
    assert(hc.zip(hc.tail).forall { case (a, b) => b >= a }, "hazard must be nondecreasing")
    // brute: user spells for one type, difference-array at-risk, staged hazard
    val spells = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      // .toSeq BEFORE the map: mapping a Map to (min,max) tuples collapses
      // users with identical spells (the r13 Map-tuple trap, third sighting)
      .groupBy(_._1).toSeq.map { case (_, xs) => (xs.map(_._2).min, xs.map(_._2).max) }
    val dmax = spells.map(_._2).max
    val days = got.map(_.getAs[Long]("day"))
    var h = 0L
    days.zipWithIndex.foreach { case (t, i) =>
      val nRisk = spells.count { case (e, x) => e <= t && x >= t }.toLong
      val deaths = spells.count { case (_, x) => x == t && x < dmax - 2 }.toLong
      val cens = spells.count { case (_, x) => x == t && x >= dmax - 2 }.toLong
      assert(got(i).getAs[Long]("n_risk") == nRisk, s"n_risk day $t")
      assert(got(i).getAs[Long]("deaths") == deaths, s"deaths day $t")
      assert(got(i).getAs[Long]("censored") == cens, s"censored day $t")
      h += (if (nRisk > 0) deaths * 1000000L / nRisk else 0L)
      assert(got(i).getAs[Long]("h_cum_micro") == h, s"hazard day $t")
    }
  }

  test("q309: log-rank O/E/V re-derived; O conserved against the censoring split") {
    val got = ExperimentOps.queries("q309_logrank_test")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      assert((r.getAs[Long]("reject") == 1L) == (r.getAs[Long]("z2_milli") >= 3841L))
      assert(r.getAs[Long]("v_micro") >= 0L)
    }
    // brute for one event_type with the exact staged arithmetic
    val spells = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (u, xs) =>
        (arm(u), xs.map(_._2).min, xs.map(_._2).max)
      }
    val dmax = spells.map(_._3).max
    val days = spells.flatMap(s => Seq(s._2, s._3)).distinct.sorted
    var (oa, ob, eaM, vU) = (0L, 0L, 0L, BigInt(0))
    days.foreach { t =>
      val nA = spells.count { case (a, e, x) => a == 0L && e <= t && x >= t }.toLong
      val nB = spells.count { case (a, e, x) => a == 1L && e <= t && x >= t }.toLong
      val dA = spells.count { case (a, _, x) => a == 0L && x == t && x < dmax - 2 }.toLong
      val dB = spells.count { case (a, _, x) => a == 1L && x == t && x < dmax - 2 }.toLong
      val (dT, nT) = (dA + dB, nA + nB)
      oa += dA; ob += dB
      if (nT > 0) eaM += dT * nA * 1000L / nT
      if (nT > 1) vU += BigInt(dT) * nA * nB * (nT - dT) * 1000000 / (BigInt(nT) * nT * (nT - 1))
    }
    val r = got("click")
    assert(r.getAs[Long]("o_a") == oa && r.getAs[Long]("o_b") == ob,
      s"observed deaths: got (${r.getAs[Long]("o_a")}, ${r.getAs[Long]("o_b")}) brute ($oa, $ob)")
    assert(r.getAs[Long]("e_a_milli") == eaM, s"E: got ${r.getAs[Long]("e_a_milli")} brute $eaM")
    assert(r.getAs[Long]("v_micro") == vU.toLong, s"V: got ${r.getAs[Long]("v_micro")} brute $vU")
    val diff = BigInt(oa) * 1000 - eaM
    val z2 = if (vU > 0) (diff * diff * 1000 / vU).toLong else 0L
    assert(r.getAs[Long]("z2_milli") == z2, s"z2: got ${r.getAs[Long]("z2_milli")} brute $z2")
  }

  test("q310: transition counts re-derived by brute per-user walks; rows normalize") {
    val got = ExperimentOps.queries("q310_transition_matrix")(spark, sf).collect()
    assert(got.nonEmpty)
    // row normalization: each from_type's p_permille sums to 1000 minus
    // only the per-cell truncation deficit (< 1 permille per cell)
    got.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val psum = rs.map(_.getAs[Long]("p_permille")).sum
      assert(psum <= 1000L && psum >= 1000L - rs.length,
        s"row $ft normalizes to $psum over ${rs.length} cells")
      val tot = rs.map(_.getAs[Long]("from_total")).distinct
      assert(tot.length == 1 && tot.head == rs.map(_.getAs[Long]("n_pairs")).sum)
    }
    // brute: walk every user's (ts, event_id)-ordered stream
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsl"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.tail).foreach { pr =>
        brute(pr) = brute.getOrElse(pr, 0L) + 1L
      }
    }
    val gotMap = got.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
      r.getAs[Long]("n_pairs")).toMap
    assert(gotMap == brute.toMap,
      s"pair counts diverge: only-engine=${gotMap.keySet -- brute.keySet} only-brute=${brute.keySet -- gotMap.keySet}")
  }

  test("q311: stationary vector re-derived by 5 staged BigInt iterations; mass conserved") {
    val got = ExperimentOps.queries("q311_markov_stationary")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      assert(r.getAs[Long]("gap_micro") ==
        math.abs(r.getAs[Long]("stationary_micro") - r.getAs[Long]("empirical_micro")))
    }
    // truncation-only mass loss: Σv stays within 6 micro per type per round
    val mass = got.values.map(_.getAs[Long]("stationary_micro")).sum
    assert(mass <= 1000000L && mass >= 1000000L - 6L * 5L * got.size,
      s"stationary mass drifted: $mass")
    // brute: same pair counts, same staged arithmetic
    val pairs = ExperimentOps.queries("q310_transition_matrix")(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("from_total")))
    val types = pairs.map(_._1).distinct.sorted
    var v: Map[String, BigInt] = types.map(_ -> BigInt(1000000L / types.length)).toMap
    for (_ <- 1 to 5) {
      val nv = scala.collection.mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      pairs.foreach { case (f, t, n, tot) =>
        nv(t) = nv(t) + v(f) * n / tot
      }
      v = types.map(t => t -> nv(t)).toMap
    }
    types.foreach { t =>
      assert(got(t).getAs[Long]("stationary_micro") == v(t).toLong,
        s"stationary($t): got ${got(t).getAs[Long]("stationary_micro")} brute ${v(t)}")
    }
  }

  test("q312: attribution re-derived by brute walks; both models conserve conversions") {
    val got = ExperimentOps.queries("q312_attribution")(spark, sf).collect()
    assert(got.nonEmpty)
    val nConv = got.head.getAs[Long]("n_conv")
    assert(got.map(_.getAs[Long]("n_first")).sum == nConv)
    assert(got.map(_.getAs[Long]("n_last")).sum == nConv)
    assert(got.map(_.getAs[Long]("first_permille")).sum <= 1000L)
    got.foreach { r =>
      assert(r.getAs[Long]("closer_minus_opener") ==
        r.getAs[Long]("n_last") - r.getAs[Long]("n_first"))
    }
    // brute per-user walk
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsl"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val first = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val last = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zipWithIndex.filter(_._1 == "purchase").foreach { case (_, i) =>
        first(ordered.head) += 1L
        last(if (i == 0) "none" else ordered(i - 1)) += 1L
      }
    }
    got.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(r.getAs[Long]("n_first") == first(c), s"first($c)")
      assert(r.getAs[Long]("n_last") == last(c), s"last($c)")
    }
  }

  test("q313: deciles, uplift, and Qini re-derived by brute ranking") {
    val got = ExperimentOps.queries("q313_uplift_qini")(spark, sf).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(got.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    // near-equal rank deciles: sizes differ by at most 1
    val sizes = got.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
    assert(sizes.max - sizes.min <= 1L, s"uneven deciles: ${sizes.toSeq}")
    // brute: user fold, total order (score DESC, user_id), same formulas
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      val score = xs.count(_._2 < 12).toLong
      val y = xs.filter(_._2 >= 12).map(_._3).sum
      (u, score, if (y >= 100) 1L else 0L, arm(u))
    }.sortBy { case (u, sc, _, _) => (-sc, u) }
    val n = users.length.toLong
    val cells = users.zipWithIndex.groupBy { case (_, i) =>
      i.toLong * 10L / n + 1L
    }.toSeq.map { case (dec, xs) =>
      val a = xs.map(_._1).filter(_._4 == 0L)
      val b = xs.map(_._1).filter(_._4 == 1L)
      (dec, a.length.toLong, a.map(_._3).sum, b.length.toLong, b.map(_._3).sum)
    }.sortBy(_._1)
    var (naC, xaC, nbC, xbC) = (0L, 0L, 0L, 0L)
    cells.zip(got).foreach { case ((dec, na, xa, nb, xb), r) =>
      assert(r.getAs[Long]("decile") == dec)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("x_a") == xa &&
        r.getAs[Long]("n_b") == nb && r.getAs[Long]("x_b") == xb,
        s"cells($dec): got $r brute ($na,$xa,$nb,$xb)")
      val uplift = if (na > 0 && nb > 0) xb * 1000 / nb - xa * 1000 / na else 0L
      assert(r.getAs[Long]("uplift_permille") == uplift)
      naC += na; xaC += xa; nbC += nb; xbC += xb
      val qini = if (naC > 0) ((BigInt(xbC) * naC - BigInt(xaC) * nbC) * 1000 / naC).toLong else 0L
      assert(r.getAs[Long]("qini_milli") == qini,
        s"qini($dec): got ${r.getAs[Long]("qini_milli")} brute $qini")
    }
  }

  test("q314: Cox score U/V re-derived by brute moment day-walk") {
    val got = ExperimentOps.queries("q314_cox_score_test")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      assert(r.getAs[Long]("v_milli") >= 0L)
      assert((r.getAs[Long]("reject") == 1L) == (r.getAs[Long]("z2_milli") >= 3841L))
    }
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val spells = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.map(_._2).min, xs.map(_._2).max, xs.count(_._3 < 12).toLong)
    }
    val dmax = spells.map(_._2).max
    val days = spells.flatMap(sp => Seq(sp._1, sp._2)).distinct.sorted
    var (uM, vM) = (0L, BigInt(0))
    days.foreach { t =>
      val risk = spells.filter { case (e, x, _) => e <= t && x >= t }
      val deaths = spells.filter { case (_, x, _) => x == t && x < dmax - 2 }
      val (n, sz, szz) = (risk.length.toLong, risk.map(_._3).sum,
        risk.map(sp => sp._3 * sp._3).sum)
      val (dd, dz) = (deaths.length.toLong, deaths.map(_._3).sum)
      if (n > 0 && dd > 0) uM += dz * 1000L - dd * sz * 1000L / n
      if (n > 1 && dd > 0)
        vM += BigInt(dd) * (n - dd) * (BigInt(n) * szz - BigInt(sz) * sz) * 1000 /
          (BigInt(n - 1) * n * n)
    }
    val r = got("click")
    assert(r.getAs[Long]("u_milli") == uM, s"U: got ${r.getAs[Long]("u_milli")} brute $uM")
    assert(r.getAs[Long]("v_milli") == vM.toLong, s"V: got ${r.getAs[Long]("v_milli")} brute $vM")
    val z2 = if (vM > 0) (BigInt(uM) * uM / vM).toLong else 0L
    assert(r.getAs[Long]("z2_milli") == z2)
  }

  test("q315: RFM thresholds and segments re-derived by brute order statistics") {
    val got = ExperimentOps.queries("q315_rfm_segments")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1L && v <= 3L, s"$c out of range: $r")
      }
    }
    assert(got.map(_.getAs[Long]("m_share_permille")).sum <= 1000L)
    // brute from raw rows
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      (u, xs.map(_._2).max, xs.length.toLong, xs.map(_._3).sum)
    }
    val h = users.map(_._2).max
    val withR = users.map { case (u, last, f, m) => (u, h - last, f, m) }
    val n = withR.length
    def terciles(vals: Seq[Long]): (Long, Long) = {
      val sorted = vals.sorted
      (sorted((n + 2) / 3 - 1), sorted((2 * n + 2) / 3 - 1))
    }
    val (rt1, rt2) = terciles(withR.map(_._2))
    val (ft1, ft2) = terciles(withR.map(_._3))
    val (mt1, mt2) = terciles(withR.map(_._4))
    def sc(v: Long, t1: Long, t2: Long): Long =
      if (v <= t1) 1L else if (v <= t2) 2L else 3L
    val brute = withR.groupBy { case (_, r, f, m) =>
      (4L - sc(r, rt1, rt2), sc(f, ft1, ft2), sc(m, mt1, mt2))
    }.map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._4).sum) }
    assert(got.map(_.getAs[Long]("n_users_seg")).sum == n.toLong)
    got.foreach { r =>
      val k = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))
      val (bn, bm) = brute(k)
      assert(r.getAs[Long]("n_users_seg") == bn && r.getAs[Long]("m_total") == bm,
        s"segment $k: got $r brute ($bn, $bm)")
    }
    assert(got.length == brute.size)
  }

  test("q316: CvM re-derived from raw rows at value grain") {
    val got = ExperimentOps.queries("q316_cramer_von_mises")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    got.values.foreach { r =>
      assert(r.getAs[Long]("t_milli") >= 0L)
      assert((r.getAs[Long]("reject") == 1L) == (r.getAs[Long]("t_milli") >= 461L))
    }
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byV = raw.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, xs) =>
      (v, xs.count(_._1 < 12).toLong, xs.count(_._1 >= 12).toLong)
    }
    val (na, nb) = (byV.map(_._2).sum, byV.map(_._3).sum)
    var (ca, cb, num) = (0L, 0L, BigInt(0))
    byV.foreach { case (_, a, b) =>
      ca += a; cb += b
      val d = BigInt(ca) * nb - BigInt(cb) * na
      num += BigInt(a + b) * d * d
    }
    val t = if (na > 0 && nb > 0)
      (num * 1000 / (BigInt(na) * nb * (na + nb) * (na + nb))).toLong else 0L
    val r = got("click")
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("t_milli") == t,
      s"CvM: got ${r.getAs[Long]("t_milli")} brute $t")
  }

  test("q282: signs bounded, strata bounded by the 4 day-parts, mass conserved") {
    val rows = ExperimentOps.queries("q282_simpson_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("agg_sign")))
      assert(r.getAs[Long]("n_strata") >= 1L && r.getAs[Long]("n_strata") <= 4L)
      assert(r.getAs[Long]("n_reversed") <= r.getAs[Long]("n_strata"))
      val p = r.getAs[Long]("rev_mass_permille")
      assert(p >= 0L && p <= 1000L)
      assert((r.getAs[Long]("simpson_flag") == 1L) == (p > 500L))
    }
  }

  test("q329: brute SMD re-derivation from user-grain covariates matches") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS LONG) AS am",
        "unix_micros(ts) div 86400000000 AS day").collect()
    val ug = ev.groupBy(r => (r.getString(0), r.getLong(1))).map { case ((t, u), xs) =>
      (t, arm(u), xs.map(_.getLong(2)).sum, xs.length.toLong,
        xs.map(_.getLong(3)).distinct.length.toLong)
    }.toSeq
    def mv(xs: Seq[Long]): (Long, Long) = {
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      ((sx * 1000 / n).toLong,
        if (n > 1) ((n * sxx - sx * sx) / (n * (n - 1))).toLong else 0L)
    }
    val got = ExperimentOps.queries("q329_smd_balance")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val cov = g.getAs[String]("covariate")
      def pick(r: (String, Long, Long, Long, Long)): Long = cov match {
        case "morning_events" => r._3
        case "total_events" => r._4
        case "active_days" => r._5
      }
      val a = ug.filter(r => r._1 == t && r._2 == 0L).map(pick)
      val b = ug.filter(r => r._1 == t && r._2 == 1L).map(pick)
      val (ma, va) = mv(a); val (mb, vb) = mv(b)
      assert(g.getAs[Long]("n_a") === a.length.toLong)
      assert(g.getAs[Long]("n_b") === b.length.toLong)
      assert(g.getAs[Long]("smd_sign") === (ma - mb).signum.toLong)
      val smd2 = if (va + vb > 0)
        (BigInt(ma - mb) * (ma - mb) * 2 / (BigInt(va + vb) * 1000000)).toLong
      else 0L
      assert(g.getAs[Long]("smd2_milli") === smd2, s"smd2 at ($t,$cov)")
      assert(g.getAs[Long]("balanced") === (if (smd2 < 10) 1L else 0L))
    }
  }

  test("q340: brute pooled-midrank Kruskal-Wallis H matches with identical staging") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // pooled doubled midranks at value grain
    val byV = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    val mr2 = {
      var cum = 0L
      sortedV.map { v =>
        val c = byV(v); val m = 2 * cum + c + 1; cum += c; v -> m
      }.toMap
    }
    val groups = rows.groupBy(_._1)
    val n = rows.length.toLong
    val ssum = groups.values.map { g =>
      val ni = g.length.toLong
      val di = g.map(r => BigInt(mr2(r._2))).sum
      val m2i = (di / ni).toLong
      BigInt(ni) * m2i * m2i
    }.sum
    val ties = sortedV.map { v => val t = BigInt(byV(v)); t * t * t - t }.sum
    val h = (BigInt(3000) * ssum / (BigInt(n) * (n + 1))).toLong - 3000 * (n + 1)
    val corr = 1000L - (ties * 1000 / (BigInt(n) * n * n - n)).toLong
    val hAdj = if (corr > 0) h * 1000 / corr else 0L
    val g = ExperimentOps.queries("q340_kruskal_wallis")(spark, sf).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("n") === n)
    assert(g.head.getAs[Long]("k_groups") === groups.size.toLong)
    assert(g.head.getAs[Long]("h_milli") === h)
    assert(g.head.getAs[Long]("corr_milli") === corr)
    assert(g.head.getAs[Long]("h_adj_milli") === hAdj)
    val crit = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L, 14067L)(
      math.min(groups.size - 1, 7) - 1)
    assert(g.head.getAs[Long]("crit_milli") === crit)
    assert(g.head.getAs[Long]("reject") === (if (hAdj >= crit) 1L else 0L))
  }

  test("q341: brute Brown-Forsythe F from group-median deviations matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1)
    val stats = groups.map { case (t, g) =>
      val vs = g.map(_._2).sorted
      val med = vs(((vs.length + 1) / 2 - 1))
      val zs = g.map(r => math.abs(r._2 - med))
      val ni = g.length.toLong
      val sz = zs.map(BigInt(_)).sum
      val szz = zs.map(z => BigInt(z) * z).sum
      val mz = (sz / ni).toLong
      val ssw = szz - BigInt(ni) * mz * mz
      (t, ni, mz, ssw)
    }.toSeq
    val n = stats.map(_._2).sum
    val k = stats.length.toLong
    val szTot = rows.groupBy(_._1).map { case (t, g) =>
      val vs = g.map(_._2).sorted
      val med = vs(((vs.length + 1) / 2 - 1))
      g.map(r => BigInt(math.abs(r._2 - med))).sum
    }.sum
    val mzPool = (szTot / n).toLong
    val ssw = stats.map(_._4).sum
    val ssb = stats.map { case (_, ni, mz, _) =>
      BigInt(ni) * (mz - mzPool) * (mz - mzPool)
    }.sum
    val f = if (ssw > 0 && n > k && k > 1)
      (ssb * (n - k) * 1000 / (ssw * (k - 1))).toLong else 0L
    val g = ExperimentOps.queries("q341_brown_forsythe")(spark, sf).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("n") === n)
    assert(g.head.getAs[Long]("k_groups") === k)
    assert(g.head.getAs[Long]("mad_min_centi") === stats.map(_._3).min)
    assert(g.head.getAs[Long]("mad_max_centi") === stats.map(_._3).max)
    assert(g.head.getAs[Long]("f_milli") === f, "F statistic")
    assert(stats.forall(_._4 >= 0), "SSW_i nonnegative under truncated mean")
  }

  test("q342: brute paired discordant cells and McNemar chi2 match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS BIGINT) AS pre")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q342_mcnemar")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val byUser = rows.filter(_._1 == t).groupBy(_._2)
      val cells = byUser.values.map { es =>
        (es.exists(_._3 == 1L), es.exists(_._3 == 0L))
      }
      val both = cells.count(c => c._1 && c._2).toLong
      val b = cells.count(c => c._1 && !c._2).toLong
      val c = cells.count(c => !c._1 && c._2).toLong
      val z2 = if (b + c > 0)
        (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000 / (b + c)
      else 0L
      assert(g.getAs[Long]("n_both") === both, s"both at $t")
      assert(g.getAs[Long]("b_pre_only") === b)
      assert(g.getAs[Long]("c_post_only") === c)
      assert(g.getAs[Long]("z2_milli") === z2)
      assert(g.getAs[Long]("reject") === (if (z2 >= 3841) 1L else 0L))
    }
  }

  test("q346: brute stratified CMH cells, staged E/V, and z2 match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS BIGINT) AS pre")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q346_cmh_test")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).map { case (u, es) =>
        val preN = es.count(_._3 == 1L).toLong
        val y = if (es.exists(_._3 == 0L)) 1L else 0L
        val tier = if (preN <= 0) 0L else if (preN <= 2) 1L
          else if (preN <= 5) 2L else 3L
        (u, mdBucket(u) % 2, tier, y) // 2 | 100, so %100 then %2 = %2
      }
      val strata = users.groupBy(_._3).filter(_._2.size > 1)
      var (dnum, v9sum, convA, convTot, nStrata) =
        (0L, BigInt(0), 0L, 0L, 0L)
      strata.foreach { case (_, us) =>
        val n1 = us.count(_._2 == 0L).toLong
        val n2 = us.count(_._2 == 1L).toLong
        val tt = n1 + n2
        val a = us.filter(_._2 == 0L).map(_._4).sum
        val m1 = us.map(_._4).sum
        val m0 = tt - m1
        val e = (BigInt(n1) * m1 * 1000000 / tt).toLong
        val v9 = BigInt(m1) * (n1 * 1000 / tt) * (n2 * 1000 / tt) *
          (m0 * 1000 / (tt - 1))
        dnum += a * 1000000L - e; v9sum += v9
        convA += a; convTot += m1; nStrata += 1
      }
      val z2 = if (v9sum > 0) (BigInt(dnum) * dnum / v9sum).toLong else 0L
      assert(g.getAs[Long]("n_strata") === nStrata, s"strata at $t")
      assert(g.getAs[Long]("conv_a") === convA)
      assert(g.getAs[Long]("conv_total") === convTot)
      assert(g.getAs[Long]("dnum_micro") === dnum, s"dnum at $t")
      assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
      assert(g.getAs[Long]("reject") === (if (z2 >= 3841) 1L else 0L))
    }
  }

  test("q349: brute exposure-share conditional binomial z2 matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id").collect()
      .map(r => (r.getString(0), mdBucket(r.getLong(1)) % 2))
    val expA = rows.count(_._2 == 0L).toLong
    val expAll = rows.length.toLong
    val w = expA * 1000000L / expAll
    val got = ExperimentOps.queries("q349_rate_ratio")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val k = rows.count(_._1 == t).toLong
      val a = rows.count(r => r._1 == t && r._2 == 0L).toLong
      val dnum = BigInt(a) * 1000000 - BigInt(k) * w
      val z2 = if (k > 0 && w > 0 && w < 1000000)
        (dnum * dnum * 1000 / (BigInt(k) * w * (1000000 - w))).toLong else 0L
      assert(g.getAs[Long]("k_events") === k)
      assert(g.getAs[Long]("a_arm0") === a)
      assert(g.getAs[Long]("w_ppm") === w)
      assert(g.getAs[Long]("gap_sign") === dnum.signum.toLong)
      assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
    }
  }

  test("q351: brute pooled-variance effect size with Hedges correction matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q351_effect_size")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (u, es) =>
        (mdBucket(u) % 2, es.map(_._3).sum)
      }
      val (ua, ub) = (users.filter(_._1 == 0L), users.filter(_._1 == 1L))
      val (na, nb) = (ua.length.toLong, ub.length.toLong)
      assert(na > 1 && nb > 1)
      def stats(us: Seq[(Long, Long)], n: Long) = {
        val s = us.map(e => BigInt(e._2)).sum
        val ss = us.map(e => BigInt(e._2) * e._2).sum
        val m = (s / n).toLong
        (m, ss - BigInt(n) * m * m)
      }
      val (ma, ssa) = stats(ua, na); val (mb, ssb) = stats(ub, nb)
      val s2 = ((ssa + ssb) / (na + nb - 2)).toLong
      val d2 = if (s2 > 0)
        (BigInt(mb - ma) * (mb - ma) * 1000 / s2).toLong else 0L
      val j = 1000L - 3000L / (4 * (na + nb - 2) - 1)
      val g2 = d2 * j * j / 1000000L
      assert(g.getAs[Long]("n_a") === na)
      assert(g.getAs[Long]("n_b") === nb)
      assert(g.getAs[Long]("gap_sign") === (mb - ma).signum.toLong)
      assert(g.getAs[Long]("d2_milli") === d2, s"d2 at $t")
      assert(g.getAs[Long]("g2_milli") === g2, s"g2 at $t")
      assert(g2 <= d2, "Hedges correction shrinks toward zero")
    }
  }

  test("q353: brute Tukey-Kramer pairwise HSD verdicts match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val grp = rows.groupBy(_._1).map { case (t, es) =>
      val n = es.length.toLong
      val s = es.map(e => BigInt(e._2)).sum
      val szz = es.map(e => BigInt(e._2) * e._2).sum
      val mc = (s / n).toLong
      (t, n, (s * 1000 / n), szz - BigInt(n) * mc * mc)
    }.toSeq.sortBy(_._1)
    val n = grp.map(_._2).sum
    val k = grp.length.toLong
    val s2 = (grp.map(_._4).sum / (n - k)).toLong
    val q2e6 = Map(2L -> 7684000L, 3L -> 10983000L, 4L -> 13199000L,
      5L -> 14884000L, 6L -> 16241000L).getOrElse(k, 17389000L)
    val got = ExperimentOps.queries("q353_tukey_hsd")(spark, sf).collect()
    assert(got.length === (k * (k - 1) / 2).toInt)
    got.foreach { g =>
      val a = grp.find(_._1 == g.getAs[String]("type_a")).get
      val b = grp.find(_._1 == g.getAs[String]("type_b")).get
      val gap = b._3 - a._3
      val sig = gap * gap * 2 * a._2 * b._2 >=
        BigInt(q2e6) * s2 * (a._2 + b._2)
      assert(g.getAs[Long]("n_a") === a._2)
      assert(g.getAs[Long]("gap_sign") === gap.signum.toLong)
      assert(g.getAs[Long]("gap_mc") === gap.abs.toLong)
      assert(g.getAs[Long]("significant") === (if (sig) 1L else 0L),
        s"HSD at ${a._1}/${b._1}")
    }
  }

  test("q354: the real split ranks among its own re-randomizations; p granular at 50") {
    val got = ExperimentOps.queries("q354_rerandomization")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      assert(g.getAs[Long]("n_perm") === 20L, s"perm count at $t")
      val nGe = g.getAs[Long]("n_ge")
      assert(nGe >= 0L && nGe <= 20L)
      assert(g.getAs[Long]("p_permille") === nGe * 1000 / 20, s"p at $t")
      assert(g.getAs[Long]("reject") ===
        (if (nGe * 1000 / 20 < 50) 1L else 0L))
    }
    // on a null platform split (md5 arms carry no effect), rejection at
    // p<.05 across 5 types should be rare; require not-all-rejected
    assert(got.count(_.getAs[Long]("reject") == 1L) < got.length)
  }

  test("q355: corrected z2 is the naive z2 deflated by the floored VMR") {
    val naive = ExperimentOps.queries("q349_rate_ratio")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("z2_milli")).toMap
    val vmr = graft.operators.SeriesOps.queries("q333_overdispersion")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("vmr_milli")).toMap
    val got = ExperimentOps.queries("q355_quasi_poisson")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      assert(g.getAs[Long]("z2_naive") === naive(t), s"naive at $t")
      assert(g.getAs[Long]("vmr_milli") === vmr(t), s"vmr at $t")
      val phi = math.max(vmr(t), 1000L)
      assert(g.getAs[Long]("phi_milli") === phi)
      assert(g.getAs[Long]("z2_corr") === naive(t) * 1000 / phi)
      assert(g.getAs[Long]("z2_corr") <= g.getAs[Long]("z2_naive"),
        "correction never inflates")
    }
  }

  test("q356: brute KM fold re-derives S, RMST, and median survival") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q356_kaplan_meier")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val spells = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (_, es) =>
        (es.map(_._3).min, es.map(_._3).max)
      }
      val dmax = spells.map(_._2).max
      val f = spells.map { case (e, x) => (e, x, x >= dmax - 2) }
      val days = (f.map(_._1) ++ f.map(_._2)).distinct.sorted
      var (s, rmst, med, pd) = (1000000L, 0L, -1L, -1L)
      days.foreach { d =>
        val nRisk = f.count(u => u._1 <= d && u._2 >= d).toLong
        val deaths = f.count(u => u._2 == d && !u._3).toLong
        if (pd >= 0) rmst += s * (d - pd)
        if (nRisk > 0) s = s * (nRisk - deaths) / nRisk
        if (med < 0 && s <= 500000L) med = d
        pd = d
      }
      assert(g.getAs[Long]("n_users") === f.length.toLong)
      assert(g.getAs[Long]("n_deaths") === f.count(!_._3).toLong)
      assert(g.getAs[Long]("s_final_ppm") === s, s"S at $t")
      assert(g.getAs[Long]("rmst_ppm_days") === rmst, s"RMST at $t")
      assert(g.getAs[Long]("median_day") === med, s"median at $t")
      assert(s >= 0L && s <= 1000000L)
    }
  }

  test("q357: brute paired sign counts and chi2 match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS BIGINT) AS pre",
        "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = ExperimentOps.queries("q357_sign_test")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (_, es) =>
        (es.filter(_._3 == 1L).map(_._4).sum, es.filter(_._3 == 0L).map(_._4).sum)
      }
      val up = users.count(u => u._2 > u._1).toLong
      val dn = users.count(u => u._2 < u._1).toLong
      val ti = users.count(u => u._2 == u._1).toLong
      val z2 = if (up + dn > 0)
        (math.abs(up - dn) - 1) * (math.abs(up - dn) - 1) * 1000 / (up + dn)
      else 0L
      assert(g.getAs[Long]("n_up") === up, s"up at $t")
      assert(g.getAs[Long]("n_down") === dn)
      assert(g.getAs[Long]("n_tied") === ti)
      assert(g.getAs[Long]("z2_milli") === z2)
    }
  }

  test("q358: Murphy terms are nonneg and the decomposition tracks q292's Brier") {
    val g = ExperimentOps.queries("q358_brier_decomposition")(spark, sf).collect()
    assert(g.length === 1)
    val rel = g.head.getAs[Long]("reliability_micro2")
    val res = g.head.getAs[Long]("resolution_micro2")
    val unc = g.head.getAs[Long]("uncertainty_micro2")
    assert(rel >= 0L && res >= 0L && unc >= 0L && unc <= 250000000000L)
    assert(g.head.getAs[Long]("brier_decomp_micro2") === rel - res + unc)
    // the binned decomposition must reconstruct the exact q292 Brier up
    // to within-bin variance of p (bounded by the 100000-micro bin width
    // squared) plus truncation ulps
    val q292 = ExperimentOps.queries("q292_calibration_audit")(spark, sf)
      .collect()
    assert(q292.nonEmpty)
    val brier = q292.head.getAs[Long]("brier_micro2") // suite-total on every row
    val gap = math.abs(brier - (rel - res + unc))
    assert(gap <= 2500000000L + 3L,
      s"decomposition drifted from Brier by $gap") // (1e5)^2/4 bin bound
  }

  private def partOf(hodExpr: String): String = hodExpr // doc shim

  test("q359: brute Cochran's Q over day-part engagement rows matches") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "(unix_micros(ts) div 3600000000) % 24 div 6 AS part")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q359_cochran_q")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (_, es) =>
        (0 to 3).map(p => if (es.exists(_._3 == p)) 1L else 0L)
      }
      val cs = (0 to 3).map(p => users.map(_(p)).sum)
      val nn = cs.sum
      val r2 = users.map(u => { val r = u.sum; r * r }).sum
      val qden = 4 * nn - r2
      val q = if (qden > 0)
        (BigInt(3) * (4 * cs.map(c => BigInt(c) * c).sum - BigInt(nn) * nn)
          * 1000 / qden).toLong
      else 0L
      assert(g.getAs[Long]("n_users") === users.length.toLong)
      (0 to 3).foreach(p => assert(g.getAs[Long](s"c$p") === cs(p)))
      assert(g.getAs[Long]("q_milli") === q, s"Q at $t")
      assert(g.getAs[Long]("reject") === (if (q >= 7815) 1L else 0L))
    }
  }

  test("q360: brute row-local doubled midranks and tie-general Friedman match") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "(unix_micros(ts) div 3600000000) % 24 div 6 AS part",
        "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = ExperimentOps.queries("q360_friedman")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (_, es) =>
        val vs = (0 to 3).map(p => es.filter(_._3 == p).map(_._4).sum)
        vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1)
      }
      val n = users.length.toLong
      val dds = (0 to 3).map(p => users.map(_(p)).sum)
      val ss = users.map(u => u.map(d => (d - 5) * (d - 5)).sum).sum
      val chi2 = if (ss > 0)
        (BigInt(3) * dds.map(d => BigInt(d - 5 * n) * (d - 5 * n)).sum
          * 1000 / ss).toLong
      else 0L
      // every user's doubled midranks sum to k(k+1) = 20
      assert(dds.sum === 20 * n, s"rank conservation at $t")
      assert(g.getAs[Long]("n_users") === n)
      (0 to 3).foreach(p => assert(g.getAs[Long](s"dd$p") === dds(p)))
      assert(g.getAs[Long]("chi2_milli") === chi2, s"chi2 at $t")
    }
  }

  test("q361: brute MH pooled odds ratio and crude OR match; confound flag consistent") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS BIGINT) AS pre")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ExperimentOps.queries("q361_mh_odds_ratio")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (u, es) =>
        val preN = es.count(_._3 == 1L).toLong
        val tier = if (preN <= 0) 0L else if (preN <= 2) 1L
          else if (preN <= 5) 2L else 3L
        (tier, mdBucket(u) % 2, if (es.exists(_._3 == 0L)) 1L else 0L)
      }
      var (numm, denm) = (BigInt(0), BigInt(0))
      var (aa, bb, cc, dd) = (0L, 0L, 0L, 0L)
      users.groupBy(_._1).values.foreach { us =>
        val a = us.count(u => u._2 == 0L && u._3 == 1L).toLong
        val b = us.count(u => u._2 == 0L && u._3 == 0L).toLong
        val c = us.count(u => u._2 == 1L && u._3 == 1L).toLong
        val d = us.count(u => u._2 == 1L && u._3 == 0L).toLong
        val tt = a + b + c + d
        if (tt > 0) {
          numm += BigInt(a) * d * 1000000 / tt
          denm += BigInt(b) * c * 1000000 / tt
          aa += a; bb += b; cc += c; dd += d
        }
      }
      val orMh = if (denm > 0) (numm * 1000 / denm).toLong else 0L
      val orCrude = if (bb > 0 && cc > 0)
        (BigInt(aa) * dd * 1000 / (BigInt(bb) * cc)).toLong else 0L
      assert(g.getAs[Long]("or_mh_milli") === orMh, s"MH at $t")
      assert(g.getAs[Long]("or_crude_milli") === orCrude, s"crude at $t")
      assert(g.getAs[Long]("confounded") ===
        (if (math.abs(orCrude - orMh) >= 100) 1L else 0L))
    }
  }

  test("q363: brute Page L on doubled midranks matches; null mean exact") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id",
        "(unix_micros(ts) div 3600000000) % 24 div 6 AS part",
        "CAST(round(value * 100) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = ExperimentOps.queries("q363_page_trend")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val users = rows.filter(_._1 == t).groupBy(_._2).toSeq.map { case (_, es) =>
        val vs = (0 to 3).map(p => es.filter(_._3 == p).map(_._4).sum)
        vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1)
      }
      val n = users.length.toLong
      val l2 = users.map(u => u.zipWithIndex.map { case (d, j) => (j + 1) * d }.sum).sum
      val dev = l2 - 50 * n
      val z2 = if (n > 0) (BigInt(dev) * dev * 3 * 1000 / (BigInt(100) * n)).toLong else 0L
      assert(g.getAs[Long]("n_users") === n)
      assert(g.getAs[Long]("l2") === l2, s"L2 at $t")
      assert(g.getAs[Long]("trend_sign") === dev.signum.toLong)
      assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
    }
  }

  test("q364: Kendall's W is q360's chi2 rescaled by n(k-1); bounded by 1") {
    val fr = ExperimentOps.queries("q360_friedman")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("chi2_milli"))).toMap
    val got = ExperimentOps.queries("q364_kendall_w")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val (n, chi2) = fr(t)
      assert(g.getAs[Long]("n_users") === n)
      assert(g.getAs[Long]("chi2_milli") === chi2, s"chi2 identity at $t")
      val w = if (n > 0) chi2 / (3 * n) else 0L
      assert(g.getAs[Long]("w_milli") === w, s"W at $t")
      assert(w >= 0L && w <= 1000L, "W in [0,1]")
      val cls = if (w >= 500) "strong" else if (w >= 300) "moderate"
        else if (w >= 100) "weak" else "negligible"
      assert(g.getAs[String]("agreement") === cls)
    }
  }
  test("q366: brute signed-rank W2/ties/z2 from collected pre/post match") {
    val got = ExperimentOps.queries("q366_wilcoxon_signed_rank")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.nonEmpty)
    val ug = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .toSeq // before map: a Map of (t, diff) Tuple2s would DEDUP pairs
      .map { case ((t, _), rs) =>
        val pre = rs.filter(_.getLong(2) < 12).map(_.getLong(3)).sum
        val post = rs.filter(_.getLong(2) >= 12).map(_.getLong(3)).sum
        (t, post - pre)
      }
    ug.groupBy(_._1).foreach { case (t, rows) =>
      val d = rows.map(_._2).filter(_ != 0L)
      if (d.nonEmpty && got.contains(t)) {
        val byA = d.map(math.abs).groupBy(identity).view
          .mapValues(_.length.toLong).toMap
        // doubled midrank of |d| = 2*(#smaller) + (#equal) + 1
        def mr2(a: Long): Long =
          2 * byA.filter(_._1 < a).values.sum + byA(a) + 1
        val w2 = d.filter(_ > 0).map(x => BigInt(mr2(math.abs(x)))).sum
        val n = d.length.toLong
        val ties = byA.values.map(c => BigInt(c) * c * c - c).sum
        val dnum = w2 - BigInt(n) * (n + 1) / 2
        val vden = 2 * BigInt(n) * (n + 1) * (2 * n + 1) - ties
        val z2 = if (vden > 0) (dnum * dnum * 12000 / vden).toLong else 0L
        val g = got(t)
        assert(g.getAs[Long]("n_pairs") === n, s"n at $t")
        assert(g.getAs[Long]("w2_pos") === w2.toLong, s"w2 at $t")
        assert(g.getAs[Long]("ties") === ties.toLong)
        assert(g.getAs[Long]("gap_sign") === dnum.signum.toLong)
        assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
        assert(g.getAs[Long]("reject") === (if (z2 >= 3841) 1L else 0L))
      }
    }
  }

  test("q367: brute pairwise delta matches; u2_a identity ties it to q280") {
    val got = ExperimentOps.queries("q367_cliffs_delta")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val u280 = ExperimentOps.queries("q280_mann_whitney")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("u2_a")).toMap
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), arm(r.getLong(1)), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (t, rows) =>
      val as = rows.filter(_._2 == 0L).map(_._3)
      val bs = rows.filter(_._2 == 1L).map(_._3)
      // brute double loop over the collected arms (sf0.001 grain)
      var gt = BigInt(0); var lt = BigInt(0); var tie = BigInt(0)
      as.foreach { a => bs.foreach { b =>
        if (a > b) gt += 1 else if (a < b) lt += 1 else tie += 1
      } }
      val g = got(t)
      assert(g.getAs[Long]("gt") === gt.toLong, s"gt at $t")
      assert(g.getAs[Long]("lt") === lt.toLong, s"lt at $t")
      assert(g.getAs[Long]("t_ab") === tie.toLong, s"t_ab at $t")
      // doubled-U identity: q280's u2_a = 2*gt + t_ab
      assert(u280(t) === (2 * gt + tie).toLong, s"u2 identity at $t")
      val cd = gt - lt
      val nab = BigInt(as.length) * bs.length
      val dm = if (nab > 0) (cd.abs * 1000 / nab).toLong else 0L
      assert(g.getAs[Long]("delta_sign") === cd.signum.toLong)
      assert(g.getAs[Long]("delta_milli") === dm, s"delta at $t")
      assert(dm <= 1000L)
    }
  }

  test("q368: brute ordered-pair JT over tiers matches; null mean exact") {
    val got = ExperimentOps.queries("q368_jonckheere_terpstra")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val ug = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case ((t, _), rs) =>
        val preN = rs.count(_.getLong(2) < 12).toLong
        val w = rs.filter(_.getLong(2) >= 12).map(_.getLong(3)).sum
        val tier = if (preN <= 0) 0 else if (preN <= 2) 1
          else if (preN <= 5) 2 else 3
        (t, tier, w)
      }.toSeq
    ug.groupBy(_._1).foreach { case (t, rows) =>
      val g = got(t)
      var jt2 = BigInt(0)
      for ((_, ti, wi) <- rows; (_, tj, wj) <- rows if ti < tj)
        jt2 += (if (wi < wj) 2 else if (wi == wj) 1 else 0)
      val ns = (0 to 3).map(k => rows.count(_._2 == k).toLong)
      val n = ns.sum
      val e2 = (BigInt(n) * n - ns.map(x => BigInt(x) * x).sum) / 2
      val vden = BigInt(n) * n * (2 * n + 3) -
        ns.map(x => BigInt(x) * x * (2 * x + 3)).sum
      val dnum = jt2 - e2
      val z2 = if (vden > 0) (dnum * dnum * 18000 / vden).toLong else 0L
      assert(g.getAs[Long]("n") === n, s"n at $t")
      assert(g.getAs[Long]("jt2") === jt2.toLong, s"jt2 at $t")
      assert(g.getAs[Long]("e2") === e2.toLong, s"e2 at $t")
      assert(g.getAs[Long]("trend_sign") === dnum.signum.toLong)
      assert(g.getAs[Long]("z2_milli") === z2, s"z2 at $t")
      assert(g.getAs[Long]("reject") === (if (z2 >= 3841) 1L else 0L))
    }
  }
}
