package graft

import graft.operators.LmOps
import org.apache.spark.sql.functions._

/** Semantic claims of the round-13 LM / corpus-shape operators (output
  * equality vs DuckDB is the oracle gate's job):
  *
  *  - q283 is re-derived END-TO-END here in plain Scala collections —
  *    train counts, stupid-backoff scoring (all three branches), banding,
  *    the (source, band) rollup — and must match row-for-row; the
  *    decoration guarantees the backoff and cap branches actually fire;
  *  - q284's Gini is re-derived for one source from raw doc sizes and is
  *    range-valid ([0, 1000)); top-decile mass is a valid Lorenz point
  *    (>= its uniform share);
  *  - q285's slope is negative on Zipf-ish text, rho2 is a valid squared
  *    correlation, and the fit is re-derived from collected counts;
  *  - q286's confusion matrix is conserved (tp+fp+fn+tn = n_eval) and the
  *    weights are re-derived by an independent BigInt Cramer solve.
  */
class LmOpsSpec extends SparkSpec {

  private def l2m(x: Long): Long = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << k
    1000L * k + (x - p) * 1000L / p
  }

  private def bucket(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 100
  }

  test("q283: full plain-Scala re-derivation matches, all three branches fire") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val train = docs.filter(d => bucket(d._1) < 80)
    val eval = docs.filter(d => bucket(d._1) >= 80)
    assert(train.nonEmpty && eval.nonEmpty)
    val ttoks = train.flatMap(_._2.split(" ", -1))
    val uni = ttoks.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val t = ttoks.length.toLong
    val tbg = train.flatMap { case (_, txt, _) =>
      val w = txt.split(" ", -1); w.init.zip(w.tail).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (g, xs) => (g, xs.length.toLong) }
    var sawSeen, sawBackoff, sawCap = false
    val brute = eval.map { case (_, txt, src) =>
      val w = (txt + " qq table").split(" ", -1)
      val nlls = w.init.zip(w.tail).map { case (a, b) =>
        tbg.get(s"$a $b") match {
          case Some(cb) => sawSeen = true; l2m(uni(a)) - l2m(cb)
          case None => uni.get(b) match {
            case Some(c2) => sawBackoff = true; l2m(t) - l2m(c2) + 1322L
            case None => sawCap = true; 20000L
          }
        }
      }
      val mean = nlls.sum / nlls.length
      (src, mean / 2000L, mean)
    }.groupBy(x => (x._1, x._2)).toSeq.map { case ((src, band), xs) =>
      (src, band, xs.length.toLong, xs.map(_._3).sum)
    }.sortBy(x => (x._1, x._2))
    val got = LmOps.queries("q283_bigram_lm")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("band"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_mean_milli"))).toSeq
    assert(sawSeen && sawBackoff && sawCap,
      s"branch coverage: seen=$sawSeen backoff=$sawBackoff cap=$sawCap")
    assert(got == brute, s"q283 mismatch:\ngot   $got\nbrute $brute")
  }

  test("q284: Gini re-derived for one source; Lorenz point valid") {
    val rows = LmOps.queries("q284_gini_concentration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_permille")
      assert(g >= 0L && g < 1000L, s"gini out of range: $r")
      // the largest 10% of docs carry at least floor(n/10)/n of the mass
      val td = r.getAs[Long]("top_decile_permille")
      val n = r.getAs[Long]("n_docs")
      assert(td >= (n / 10L) * 1000L / n - 1L && td <= 1000L, s"lorenz invalid: $r")
    }
    val src = rows.head.getAs[String]("source")
    val xs = Tables.documents(spark, sf).filter(col("source") === src)
      .select("n_chars", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(x => (x._1, x._2)).map(_._1)
    val n = xs.length.toLong
    val sx = xs.sum
    val swx = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val brute = (2L * swx - (n + 1L) * sx) * 1000L / (n * sx)
    assert(rows.head.getAs[Long]("gini_permille") == brute)
  }

  test("q285: negative Zipf slope, valid rho2, OLS re-derived") {
    val r = LmOps.queries("q285_zipf_slope")(spark, sf).collect().head
    val (k, slope, r2) = (r.getAs[Long]("k_tokens"),
      r.getAs[Long]("slope_milli"), r.getAs[Long]("r2_permille"))
    assert(slope < 0L, s"zipf slope should be negative: $r")
    assert(r2 >= 0L && r2 <= 1000L)
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .sortBy(x => (-x._2, x._1)).take(100)
    assert(k == counts.length.toLong)
    val xy = counts.zipWithIndex.map { case ((_, c), i) => (l2m(i + 1L), l2m(c)) }
    val nn = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._1)).sum; val sy = xy.map(p => BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * p._1).sum
    val sxy = xy.map(p => BigInt(p._1) * p._2).sum
    val bruteSlope = (nn * sxy - sx * sy) * 1000 / (nn * sxx - sx * sx)
    assert(BigInt(slope) == bruteSlope, s"slope: got $slope brute $bruteSlope")
  }

  test("q294: r2s re-derived by BigInt moments; encodings exact rationals") {
    val rows = LmOps.queries("q294_loo_encoding")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("r2_naive_permille") >= 0L &&
        r.getAs[Long]("r2_naive_permille") <= 1000L)
      assert(r.getAs[Long]("r2_loo_permille") >= 0L &&
        r.getAs[Long]("r2_loo_permille") <= 1000L)
      assert(r.getAs[Long]("naive_enc_micro") ==
        r.getAs[Long]("sy") * 1000000L / r.getAs[Long]("n"))
    }
    // brute r2_naive from raw docs
    val docs = Tables.documents(spark, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), if (r.getString(1) == "en") 1L else 0L))
    val cat = docs.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum)
    }
    val enc = docs.map { case (s, y) =>
      val (_, n, sy) = cat.find(_._1 == s).get
      (BigInt(sy) * 1000000 / n, BigInt(y))
    }
    val nn = BigInt(enc.length)
    val sa = enc.map(_._1).sum; val syy = enc.map(_._2).sum
    val saa = enc.map(e => e._1 * e._1).sum
    val say = enc.map(e => e._1 * e._2).sum
    val cxx = nn * saa - sa * sa; val cxy = nn * say - sa * syy
    val cyy = nn * syy - syy * syy
    val brute = if (cxx > 0 && cyy > 0) ((cxy * 1000 / cxx) * cxy / cyy).toLong else 0L
    assert(rows.head.getAs[Long]("r2_naive_permille") == brute,
      s"r2_naive: got ${rows.head.getAs[Long]("r2_naive_permille")} brute $brute")
  }

  test("q295: Hill estimator re-derived from the top-11 order statistics") {
    val rows = LmOps.queries("q295_hill_tail")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_top") == 11L)
      assert(r.getAs[Long]("h2_milli") >= 0L)
      if (r.getAs[Long]("h2_milli") > 0L) assert(r.getAs[Long]("alpha_milli") > 0L)
    }
    val src = rows.head.getAs[String]("source")
    val xs = Tables.documents(spark, sf).filter(col("source") === src)
      .select("n_chars", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (x, id) => (-x, id) }.take(11).map(_._1)
    val h2 = (xs.take(10).map(l2m).sum - 10L * l2m(xs(10))) / 10L
    assert(rows.head.getAs[Long]("h2_milli") == h2,
      s"h2: got ${rows.head.getAs[Long]("h2_milli")} brute $h2")
    assert(rows.head.getAs[Long]("x_thresh") == xs(10))
  }

  test("q296: shrinkage pulls toward the pool, never past it; M re-derived") {
    val rows = LmOps.queries("q296_eb_shrinkage")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, shrunk, pbar) = (r.getAs[Long]("raw_micro"),
        r.getAs[Long]("shrunk_micro"), r.getAs[Long]("pbar_micro"))
      // shrunk lies between the raw rate and the pooled mean (within the
      // one-micro floor of each staged division)
      assert(shrunk >= math.min(raw, pbar) - 1L && shrunk <= math.max(raw, pbar) + 1L,
        s"shrinkage overshot: $r")
    }
    // brute M from the per-source rates
    val cat = Tables.documents(spark, sf).select("source", "lang").collect()
      .map(r => (r.getString(0), if (r.getString(1) == "en") 1L else 0L))
      .groupBy(_._1).toSeq.map { case (_, xs) => (xs.length.toLong, xs.map(_._2).sum) }
    val ps = cat.map { case (n, x) => BigInt(x) * 1000000 / n }
    val k = BigInt(ps.length)
    val (sn, sx) = (cat.map(_._1).sum, cat.map(_._2).sum)
    val pbar = BigInt(sx) * 1000000 / sn
    val varr = (k * ps.map(p => p * p).sum - ps.sum * ps.sum) / (k * (k - 1))
    val m = if (varr > 0) (pbar * (BigInt(1000000) - pbar) / varr * 1000 - 1000).max(BigInt(0))
      else BigInt(0)
    assert(rows.head.getAs[Long]("m_milli") == m.toLong,
      s"M: got ${rows.head.getAs[Long]("m_milli")} brute $m")
  }

  /** Recompute the probe's per-doc (x1, x2, y) features and the BigInt
    * Cramer weights in plain Scala — shared by the q286/q298/q299 brutes. */
  private def bruteProbe(): (Array[(Long, Long, Long, Long)], BigInt, BigInt, BigInt) = {
    val feats = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        (r.getLong(0),
          w.count(tk => tk == "a" || tk == "the").toLong * 10L / w.length,
          w.map(_.length.toLong).sum * 10L / w.length,
          if (r.getString(2) == "en") 1L else 0L)
      }
    val tr = feats.filter(f => bucket(f._1) < 80)
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
    (feats, w0, w1, w2)
  }

  test("q298: AUC equals brute pairwise P(score_pos > score_neg) with half-ties") {
    val r = LmOps.queries("q298_probe_auc")(spark, sf).collect().head
    val (auc, gini) = (r.getAs[Long]("auc_micro"), r.getAs[Long]("gini_micro"))
    assert(auc >= 0L && auc <= 1000000L && gini == 2 * auc - 1000000L)
    val (feats, w0, w1, w2) = bruteProbe()
    val ev = feats.filter(f => bucket(f._1) >= 80).map { f =>
      val p = (w0 + w1 * f._2 + w2 * f._3).max(BigInt(0)).min(BigInt(1000000))
      (p, f._4)
    }
    val pos = ev.filter(_._2 == 1L).map(_._1); val neg = ev.filter(_._2 == 0L).map(_._1)
    // doubled pair score: 2 per win, 1 per tie => AUC = score / (2 nP nN)
    val score2 = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val brute = (BigInt(score2) * 1000000 / (2 * BigInt(pos.length) * neg.length)).toLong
    assert(auc == brute, s"AUC: got $auc brute $brute")
  }

  test("q299: kappa re-derived for probe_vs_truth; cells conserved") {
    val rows = LmOps.queries("q299_cohen_kappa")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") + r.getAs[Long]("b") + r.getAs[Long]("c") +
        r.getAs[Long]("d") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("kappa_milli") <= 1000L)
    }
    val (feats, w0, w1, w2) = bruteProbe()
    val ev = feats.filter(f => bucket(f._1) >= 80).map { f =>
      val pred = if (w0 + w1 * f._2 + w2 * f._3 >= 500000) 1L else 0L
      (pred, f._4)
    }
    val n = BigInt(ev.length)
    val a = BigInt(ev.count(e => e._1 == 1L && e._2 == 1L))
    val b = BigInt(ev.count(e => e._1 == 1L && e._2 == 0L))
    val c = BigInt(ev.count(e => e._1 == 0L && e._2 == 1L))
    val d = BigInt(ev.count(e => e._1 == 0L && e._2 == 0L))
    val e0 = (a + b) * (a + c) + (c + d) * (b + d)
    val brute = ((n * (a + d) - e0) * 1000 / (n * n - e0)).toLong
    val got = rows.find(_.getAs[String]("pair") == "probe_vs_truth").get
    assert(got.getAs[Long]("kappa_milli") == brute,
      s"kappa: got ${got.getAs[Long]("kappa_milli")} brute $brute")
  }

  test("q302: rho2 re-derived via doubled midranks; bounds hold") {
    val rows = LmOps.queries("q302_spearman_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho2 = r.getAs[Long]("rho2_permille")
      assert(rho2 >= 0L && rho2 <= 1000L, s"rho2 out of range: $r")
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("rho_sign")))
    }
    val src = rows.head.getAs[String]("source")
    val xy = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("n_chars"),
        expr("CAST(aggregate(split(text, ' '), 0L, (acc, t) -> acc + length(t)) AS BIGINT) " +
          "* 10 div CAST(size(split(text, ' ')) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mr2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.indexWhere(_ == v).toLong
        val t = sorted.count(_ == v).toLong
        // doubled midrank = 2*rank_min + t - 1, rank_min = below + 1
        v -> (2L * (below + 1L) + t - 1L)
      }.toMap
    }
    val mx = mr2(xy.map(_._1)); val my = mr2(xy.map(_._2))
    val rk = xy.map { case (x, y) => (BigInt(mx(x)), BigInt(my(y))) }
    val n = BigInt(rk.length)
    val sx = rk.map(_._1).sum; val sy = rk.map(_._2).sum
    val sxx = rk.map(p => p._1 * p._1).sum
    val sxy = rk.map(p => p._1 * p._2).sum
    val syy = rk.map(p => p._2 * p._2).sum
    val cxx = n * sxx - sx * sx; val cxy = n * sxy - sx * sy; val cyy = n * syy - sy * sy
    val brute = if (cxx > 0 && cyy > 0) ((cxy * 1000 / cxx) * cxy / cyy).toLong else 0L
    assert(rows.head.getAs[Long]("rho2_permille") == brute,
      s"rho2: got ${rows.head.getAs[Long]("rho2_permille")} brute $brute")
  }

  test("q286: confusion conserved; weights re-derived by BigInt Cramer") {
    val rows = LmOps.queries("q286_linear_probe")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn")
      assert(s == r.getAs[Long]("n_eval"), s"confusion not conserved: $r")
      val acc = r.getAs[Long]("acc_permille")
      assert(acc >= 0L && acc <= 1000L)
    }
    // independent solve: features recomputed in plain Scala, Cramer in BigInt
    val feats = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map { r =>
        val (id, txt, lang) = (r.getLong(0), r.getString(1), r.getString(2))
        val w = txt.split(" ", -1)
        val x1 = w.count(tk => tk == "a" || tk == "the").toLong * 10L / w.length
        val x2 = w.map(_.length.toLong).sum * 10L / w.length
        (id, x1, x2, if (lang == "en") 1L else 0L)
      }.filter(f => bucket(f._1) < 80)
    val n = BigInt(feats.length)
    val s1 = feats.map(f => BigInt(f._2)).sum; val s2 = feats.map(f => BigInt(f._3)).sum
    val s11 = feats.map(f => BigInt(f._2) * f._2).sum
    val s12 = feats.map(f => BigInt(f._2) * f._3).sum
    val s22 = feats.map(f => BigInt(f._3) * f._3).sum
    val sy = feats.map(f => BigInt(f._4)).sum
    val sy1 = feats.map(f => BigInt(f._4) * f._2).sum
    val sy2 = feats.map(f => BigInt(f._4) * f._3).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det1 = n * (sy1 * s22 - sy2 * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    assert(det != 0)
    val w1 = det1 * 1000000 / det
    assert(BigInt(rows.head.getAs[Long]("w1_micro")) == w1,
      s"w1: got ${rows.head.getAs[Long]("w1_micro")} brute $w1")
  }

  test("q326: selection bands are coherent and every eval doc is accounted for") {
    val got = LmOps.queries("q326_moore_lewis")(spark, sf).collect()
    assert(got.nonEmpty)
    val nEval = graft.Tables.documents(spark, sf)
      .filter(graft.Tables.pctBucket(org.apache.spark.sql.functions.col("doc_id")) >= 80)
      .count()
    assert(got.map(_.getAs[Long]("n_docs")).sum === nEval)
    got.foreach { r =>
      val (band, n, sel) = (r.getAs[Long]("band"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_selected"))
      assert(band >= 0L && band <= 20L)
      assert(sel >= 0L && sel <= n)
      // Moore-Lewis selection = gap <= 0; bands below the shifted origin
      // are entirely selected, bands above it entirely rejected, and
      // only the origin band (gap in [0, 2000)) may mix.
      if (band <= 9L) assert(sel === n, s"band $band must be all-selected")
      if (band >= 11L) assert(sel === 0L, s"band $band must be none-selected")
    }
  }

  test("q334: brute fixed-point Theil matches; decomposition approximately additive") {
    def l2m(x: Long): Long = {
      require(x > 0, s"l2m($x)")
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << (bl - 1)
      1000L * (bl - 1) + (x - p) * 1000L / p
    }
    val L6 = l2m(1000000L)
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).filter(_._2 > 0)
    val n = docs.length.toLong
    val xx = docs.map(_._2).sum
    val byG = docs.groupBy(_._1)
    def theil(rows: Array[(String, Long)], total: Long, cnt: Long): Long = {
      val s = rows.map { case (_, x) =>
        val r = (BigInt(x) * 1000000 * cnt / total).toLong
        BigInt(x) * (if (r > 0) l2m(r) - L6 else 0L)
      }.sum
      (s / total).max(BigInt(0)).toLong
    }
    val tTot = theil(docs, xx, n)
    val perG = byG.view.mapValues(g => theil(g, g.map(_._2).sum, g.length.toLong)).toMap
    val shares = byG.view.mapValues { g =>
      ((BigInt(g.map(_._2).sum) * 1000000 / xx).toLong,
        (BigInt(g.length) * 1000000 / n).toLong)
    }.toMap
    val tB = (shares.values.map { case (sp, fp) =>
      if (sp > 0 && fp > 0) BigInt(sp) * (l2m(sp) - l2m(fp)) else BigInt(0)
    }.sum / 1000000).max(BigInt(0)).toLong
    val tW = (shares.map { case (g, (sp, _)) => BigInt(sp) * perG(g) }.sum / 1000000).toLong
    val got = LmOps.queries("q334_theil_decomposition")(spark, sf).collect()
    assert(got.length === byG.size)
    got.foreach { r =>
      val g = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") === byG(g).length.toLong)
      assert(r.getAs[Long]("share_ppm") === shares(g)._1)
      assert(r.getAs[Long]("freq_ppm") === shares(g)._2)
      assert(r.getAs[Long]("t_g_milli") === perG(g), s"t_g at $g")
      assert(r.getAs[Long]("t_total_milli") === tTot)
      assert(r.getAs[Long]("t_between_milli") === tB)
      assert(r.getAs[Long]("t_within_milli") === tW)
    }
    // Theil's additivity, up to the staged truncations: the fixed-point
    // pieces must reassemble the total within a few milli-bits.
    assert(math.abs(tTot - (tB + tW)) <= 25L,
      s"decomposition drifted: total=$tTot between=$tB within=$tW")
  }
}
