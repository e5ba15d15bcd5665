package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** The CurationOps pack's SEMANTIC claims (output equality is the oracle
  * gate's job): hash-derived sampling must be reproducible under any
  * partitioning — that determinism is the operators' reason to exist —
  * and the gate/truncation reports must partition and bound the corpus.
  */
class CurationOpsSpec extends SparkSpec {

  test("q90/q91: sample membership is invariant under repartitioning and re-runs") {
    // rand()-based sampling fails exactly this: same code, different rows
    // per run / per partitioning. The md5-bucket form must not.
    for (q <- Seq("q90_stratified_sample", "q91_fixed_group_sample")) {
      val a = CurationOps.queries(q)(spark, sf).collect()
      val b = CurationOps.queries(q)(spark, sf).collect() // fresh lineage
      assert(a.toSeq === b.toSeq, s"$q changed between identical runs")
    }
    // q91 under a hostile partitioning: rank within source must not
    // depend on where rows physically live
    val picked = CurationOps.queries("q91_fixed_group_sample")(spark, sf)
    val reshuffled = Tables.documents(spark, sf).repartition(7, col("n_chars"))
      .withColumn("pick", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("pick") <= 5)
      .select(col("source"), col("pick"), col("doc_id"), col("n_chars"))
    assert(picked.exceptAll(reshuffled).count() === 0)
    assert(reshuffled.exceptAll(picked).count() === 0)
  }

  test("q91 plan: rank-limit pushes below the exchange (WindowGroupLimit partial)") {
    // the scale claim: map tasks forward at most k rows per group, so the
    // window's shuffle carries O(k·groups·tasks) rows, never the corpus
    val p = CurationOps.queries("q91_fixed_group_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing from q91 plan")
    assert(p.indexOf("Partial") > 0 &&
      p.indexOf("Exchange hashpartitioning") < p.indexOf("Partial"),
      "no partial WindowGroupLimit below the exchange:\n" + p.take(1500))
  }

  test("q91 returns exactly k rows per source with dense pick ranks") {
    val rows = CurationOps.queries("q91_fixed_group_sample")(spark, sf).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, picks) =>
      assert(picks.length === 5, s"$src returned ${picks.length} rows, not k=5")
      assert(picks.map(_.getAs[Int]("pick")).sorted.toSeq === Seq(1, 2, 3, 4, 5),
        s"$src pick ranks are not dense 1..5")
    }
  }

  test("q92 reasons partition the corpus: counts and id-checksums total exactly") {
    val report = CurationOps.queries("q92_filter_reasons")(spark, sf)
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val idSum = docs.agg(sum("doc_id")).head().getLong(0)
    val agg = report.agg(sum("n_docs"), sum("id_checksum")).head()
    assert(agg.getLong(0) === total, "reason counts do not sum to the corpus")
    assert(agg.getLong(1) === idSum, "a doc is missing or double-counted across reasons")
    // the gate is non-degenerate on the fixture: all three verdicts occur
    val reasons = report.select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons === Set("kept", "too_short", "low_diversity"))
  }

  test("q93 truncation accounting is internally consistent") {
    val rows = CurationOps.queries("q93_token_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nTrunc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_truncated"))
      val (before, after) = (r.getAs[Long]("tok_before"), r.getAs[Long]("tok_after"))
      assert(after <= before, s"truncation grew tokens: $r")
      assert(after <= nDocs * 64, s"kept tokens exceed the per-doc budget: $r")
      assert(nTrunc <= nDocs, r.toString)
      // every truncated doc keeps EXACTLY the budget, so the loss formula
      // is exact: after = before - (lost) and untruncated docs lose 0
      if (nTrunc == 0) assert(after === before, s"untouched stratum lost tokens: $r")
      else assert(after < before, s"truncated stratum lost nothing: $r")
    }
  }

  test("q183 effective sources: hand-computed inverse Simpson per stratum and overall") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-effsrc").toString
    // en = {a:3, b:1} → n=4, Σc²=10 → 16000/10 = 1600 milli (1.6
    // effective sources — the dominance of a discounts b); fr = {c:2} →
    // exactly 1000; '*' = {a:3, b:1, c:2} → 36000/14 = 2571.
    val rows =
      (1 to 3).map(i => (i.toLong, s"d$i", "en", "a", 2L)) ++
        Seq((4L, "d4", "en", "b", 2L)) ++
        (5 to 6).map(i => (i.toLong, s"d$i", "fr", "c", 2L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q183_effective_sources")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("eff_sources_milli"),
        r.getAs[Long]("dominance_permille"))).toSeq
    assert(got === Seq(
      ("*", 6L, 3L, 2571L, 500L),
      ("en", 4L, 2L, 1600L, 750L),
      ("fr", 2L, 1L, 1000L, 1000L)))
  }

  test("q186 padding curve matches the hand-computed waste of three schemes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pad").toString
    // token lengths 5, 8, 130 (Σ 143):
    //   global : mx 130      → Σpad 390, waste 247·1000 div 390 = 633
    //   pow2   : 8, 8, 256   → Σpad 272, waste 129·1000 div 272 = 474
    //     (8 is ALREADY a power of two — 1 << len(bin(7)) = 8 must not
    //      round it up to 16; 130 must round to 256, not clamp at 128)
    //   mult128: 128,128,256 → Σpad 512, waste 369·1000 div 512 = 720
    val rows = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" "), "en", "s1", 20L),
      (2L, (1 to 8).map(i => s"t$i").mkString(" "), "en", "s1", 30L),
      (3L, (1 to 130).map(i => s"t$i").mkString(" "), "en", "s1", 600L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q186_padding_curve")(spark, dir).collect()
      .map(r => (r.getAs[String]("scheme"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_len"), r.getAs[Long]("sum_padded"),
        r.getAs[Long]("waste_permille"))).toSeq
    assert(got === Seq(
      ("global", 3L, 143L, 390L, 633L),
      ("mult128", 3L, 143L, 512L, 720L),
      ("pow2", 3L, 143L, 272L, 474L)))
  }

  test("q188 footrule re-derives exactly from a driver-side md5 sort over sf0.001") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    def ranks(tag: String): Map[Long, Long] =
      ids.sortBy(id => (md5hex(s"$tag:$id"), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
    val (r0, r1, r2) =
      (ids.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap,
        ranks("1"), ranks("2"))
    val n = ids.length.toLong
    val d01 = ids.map(id => math.abs(r0(id) - r1(id))).sum
    val d12 = ids.map(id => math.abs(r1(id) - r2(id))).sum
    val want = Seq(
      ("corpus_vs_e1", n, d01, d01 * 3000 / (n * n - 1)),
      ("e1_vs_e2", n, d12, d12 * 3000 / (n * n - 1)))
    val got = CurationOps.queries("q188_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"),
        r.getAs[Long]("footrule"), r.getAs[Long]("norm_milli"))).toSeq
    assert(got === want)
    // a healthy shuffle sits near the (n²−1)/3 expectation; a sorted one
    // would read ~0 — the audit must not confuse the two
    assert(got.forall { case (_, _, _, nm) => nm > 500 && nm < 1500 })
  }

  test("q189 frontier keeps non-dominated docs and both members of an exact tie") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pareto").toString
    // (len, q): d4 (2, 500) frontier (nothing shorter);
    // d1 (4, 1000) frontier; d5 (4, 1000) its exact tie — BOTH kept;
    // d3 (6, 1000) dominated by d1 (shorter, equal q);
    // d2 (6, 833) dominated by d1 on both axes
    val rows = Seq(
      (1L, "a b c d", "en", "s1", 7L),
      (2L, "a b c d e e", "en", "s1", 11L),
      (3L, "a b c d e f", "en", "s1", 11L),
      (4L, "x x", "en", "s1", 3L),
      (5L, "p q r s", "en", "s1", 7L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q189_pareto_frontier")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("len"),
        r.getAs[Long]("q"))).toSeq
    assert(got === Seq((4L, 2L, 500L), (1L, 4L, 1000L), (5L, 4L, 1000L)))
  }

  test("q189 re-derives exactly from the brute-force dominance scan over sf0.001") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        expr("size(array_distinct(toks)) * 1000L div size(toks)").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = docs.filter { case (_, li, qi) =>
      !docs.exists { case (_, lj, qj) =>
        lj <= li && qj >= qi && (lj < li || qj > qi) }
    }.map { case (id, l, q) => (id, l, q) }.sortBy(t => (t._2, t._1)).toSeq
    val got = CurationOps.queries("q189_pareto_frontier")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("len"),
        r.getAs[Long]("q"))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q202 apportions exactly B with the leftover going to the largest remainder") {
    import spark.implicits._
    // counts 3/2/2, C=7: floors 428571/285714/285714 (Σ=999999),
    // remainders 3/2/2 → the single leftover token goes to srcA
    val dir = java.nio.file.Files.createTempDirectory("graft-apportion").toString
    Seq((0L, "a1 a2 a3", "en", "srcA", 0L), (1L, "b1 b2", "en", "srcB", 0L),
        (2L, "c1 c2", "en", "srcC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q202_budget_apportionment")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("floor_alloc"), r.getAs[Long]("remainder"),
        r.getAs[Long]("extra"), r.getAs[Long]("alloc"))).toSeq
    assert(got === Seq(
      ("srcA", 3L, 428571L, 3L, 1L, 428572L),
      ("srcB", 2L, 285714L, 2L, 0L, 285714L),
      ("srcC", 2L, 285714L, 2L, 0L, 285714L)))
    // the method's defining invariant, on real data too: Σ alloc = B
    val sfSum = CurationOps.queries("q202_budget_apportionment")(spark, sf)
      .agg(sum("alloc")).head().getLong(0)
    assert(sfSum === 1000000L)
  }

  test("q212: the 2/2 source outranks 90/100 naively and loses under the Wilson bound") {
    import spark.implicits._
    def doc(id: Long, src: String, nDistinct: Int) =
      (id, (1 to nDistinct).map(j => s"${src}w${id}x$j").mkString(" "), "en", src, 0L)
    val rows = Seq(doc(1, "tiny", 60), doc(2, "tiny", 60)) ++
      (1 to 90).map(i => doc(100L + i, "big", 60)) ++
      (1 to 10).map(i => doc(200L + i, "big", 5))
    val dir = java.nio.file.Files.createTempDirectory("graft-wilson").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def lb(n: Long, k: Long): Double = {
      val p = k.toDouble / n
      val v = BigDecimal((p + 2.0 / n - 2.0 * math.sqrt(p * (1.0 - p) / n
        + 1.0 / (n.toDouble * n))) / (1.0 + 4.0 / n))
      v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = CurationOps.queries("q212_wilson_gate")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n"), r.getAs[Long]("k"),
        r.getAs[Long]("rate_milli"), r.getAs[Double]("wilson_lb"),
        r.getAs[Long]("naive_rank"), r.getAs[Long]("lb_rank"))).toMap
    assert(got("tiny") === ((2L, 2L, 1000L, lb(2, 2), 1L, 2L)))
    assert(got("big") === ((100L, 90L, 900L, lb(100, 90), 2L, 1L)))
  }

  test("q216: α=1 is proportional (1.0 epochs everywhere), α=¼ flattens toward the tail") {
    import spark.implicits._
    // masses 16 and 256: fourth roots are EXACT doubles (2.0, 4.0), so the
    // planted expectations are hand-computable integers end to end
    val dir = java.nio.file.Files.createTempDirectory("graft-tmix").toString
    Seq((1L, "t", "en", "small", 16L), (2L, "t", "en", "large", 256L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q216_temperature_mix")(spark, dir).collect()
      .map(r => (r.getAs[Long]("alpha"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("w_milli"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("epochs_milli")))).toMap
    // α=¼: w = {2000, 4000}; small gets ⅓ share but holds 16/272 of mass
    assert(got((250L, "small")) === ((2000L, 333333L, 5666L)))
    assert(got((250L, "large")) === ((4000L, 666666L, 708L)))
    // α=1: share ≡ mass share ⇒ exactly 1.0 epochs for every source
    assert(got((1000L, "small")) === ((16000L, 58823L, 1000L)))
    assert(got((1000L, "large")) === ((256000L, 941176L, 1000L)))
    // monotone flattening: the small source's share rises as α falls
    val shares = Seq(250L, 500L, 750L, 1000L).map(a => got((a, "small"))._2)
    assert(shares === shares.sorted.reverse)
  }

  test("q266: both allocations sum to exactly the 1000-unit budget; Neyman's total variance never exceeds proportional") {
    val rows = CurationOps.queries("q266_neyman_allocation")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("alloc_neyman")).sum === 1000L)
    assert(rows.map(_.getAs[Long]("alloc_prop")).sum === 1000L)
    // Neyman minimizes the stratified-mean variance; the integerized
    // (largest-remainder) allocation inherits it up to rounding, and on
    // this fixture the gap must not invert
    assert(rows.map(_.getAs[Long]("vc_neyman")).sum
      <= rows.map(_.getAs[Long]("vc_prop")).sum)
  }

  test("q273: three fit rounds pin the lang margins (last-fitted dimension) to truth within per-cell truncation") {
    val rows = CurationOps.queries("q273_raking")(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, cells) =>
      val raked = cells.map(_.getAs[Long]("raked_milli")).sum
      val truth = cells.map(_.getAs[Long]("n_true")).sum * 1000L
      // each cell's proportional fit truncates < 1 milli, so the margin
      // can undershoot by at most the lang's cell count
      assert(truth - raked >= 0 && truth - raked <= cells.length.toLong,
        s"lang $lang margin off by ${truth - raked} milli over ${cells.length} cells")
    }
  }
}
