package graft

import graft.operators.{AuditOps, StreamSemantics, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic claims of the round-7 audit / pipeline operators (output
  * equality vs DuckDB is the oracle gate's job):
  *
  *  - q105 must detect and REDACT a planted email while leaving a clean
  *    doc untouched — and on the fixture, its per-source PII counts must
  *    equal an independent re-derivation of the decoration rule;
  *  - q110's audit must find EXACTLY the planted violation counts, each
  *    re-derived here from the raw tables and the corruption moduli;
  *  - q111's digit/punct mass must equal the decoration arithmetic
  *    (9 digits per %3 doc, 7 puncts per %7 doc) on a digit-free corpus;
  *  - q112 is a valid Jaccard: identical sources score 1e6 ppm, disjoint
  *    pairs don't appear, inter ≤ min(|A|,|B|) ≤ union on the fixture;
  *  - q106's OOV accounting is conserved (oov ≤ tokens, totals cover the
  *    corpus) and a planted all-rare doc is flagged while an all-common
  *    one is not;
  *  - q107's posting heads are the SMALLEST doc ids (not arbitrary), df
  *    dominates the head length, and the head is bounded before the
  *    exchange (WindowGroupLimit partial — the unbounded collect_list
  *    alternative has no such bound);
  *  - q108 equals the built-in mixed distinct aggregate while planning
  *    WITHOUT Expand (the built-in form's plan HAS Expand — proving the
  *    claim is about the rewrite, not the data);
  *  - q109 fills exactly the planted nulls that have a preceding
  *    observation, never backfills a leading null, and carries the
  *    correct last value forward.
  */
class AuditOpsSpec extends SparkSpec {

  private def plantedDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q105 -----------------------------------------------------------

  test("q105: planted email is detected and redacted; clean doc untouched") {
    // ids chosen OFF the decoration moduli (1 % 3 != 0, 1 % 7 != 2) so the
    // only PII is what the test plants in the text itself
    val dir = plantedDocs(Seq(
      (1L, "reach me at bob@mail.com for details", "en", "srcA", 0L),
      (8L, "nothing sensitive in this document at all", "en", "srcB", 0L)))
    val got = AuditOps.queries("q105_pii_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("srcA").getAs[Long]("n_emails") === 1L)
    assert(got("srcA").getAs[Long]("docs_with_pii") === 1L)
    // "bob@mail.com" (12 chars) -> "<EMAIL>" (7): redacted length shrinks by 5
    assert(got("srcA").getAs[Long]("red_chars") ===
      "reach me at bob@mail.com for details".length - 5L)
    assert(got("srcB").getAs[Long]("docs_with_pii") === 0L)
    assert(got("srcB").getAs[Long]("red_chars") ===
      "nothing sensitive in this document at all".length.toLong)
  }

  test("q105 fixture: docs_with_pii equals the decoration rule re-derived") {
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 7 === 2)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = AuditOps.queries("q105_pii_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("docs_with_pii")).toMap
    got.foreach { case (src, n) => assert(n === expected.getOrElse(src, 0L), src) }
  }

  // ---- q110 -----------------------------------------------------------

  test("q110: audit finds exactly the planted violation counts") {
    val o = Tables.orders(spark, sf)
    val nDupKeys = o.filter(col("o_orderkey") % 500 === 7).count()
    // rows duplicated by the re-appended slice count twice in row-level checks
    def batchRows(cond: org.apache.spark.sql.Column): Long =
      o.filter(cond).count() +
        o.filter(cond && col("o_orderkey") % 500 === 7).count()
    val nStatus = batchRows(col("o_orderkey") % 97 === 0)
    val nFk = batchRows(col("o_orderkey") % 89 === 0) // +1e6 exceeds every custkey
    val li = Tables.lineitem(spark, sf)
    val nQty = li.filter(col("l_orderkey") % 101 === 0).count()
    val nPrice = li.filter(col("l_orderkey") % 103 === 0).count()
    val maxCust = Tables.customer(spark, sf).agg(max("c_custkey")).head.getLong(0)
    assert(maxCust < 1000000L, "corruption offset must exceed the custkey domain")
    val got = AuditOps.queries("q110_constraint_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("constraint_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(got("orderkey_unique") === nDupKeys)
    assert(got("status_domain") === nStatus)
    assert(got("custkey_fk") === nFk)
    assert(got("quantity_range") === nQty)
    assert(got("price_positive") === nPrice)
    assert(got.values.sum > 0, "planted corruption produced no violations")
  }

  test("q110 on empty tables reports zero violations, never null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("orders", "lineitem", "customer").foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val rows = AuditOps.queries("q110_constraint_audit")(spark, dir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_violations")), s"null count: $r")
      assert(r.getAs[Long]("n_violations") === 0L, r.toString)
    }
  }

  // ---- q111 -----------------------------------------------------------

  test("q111 fixture: digit/punct mass equals the decoration arithmetic") {
    // base text has no digits and no punctuation, so ALL counted chars
    // come from the decoration: ' 1234 987 55' = 9 digits, ' !!! ?? ..' = 7
    val docs = Tables.documents(spark, sf)
    val nDigitDocs = docs.filter(col("doc_id") % 3 === 0).count()
    val nPunctDocs = docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1).count()
    val rows = AuditOps.queries("q111_charclass_profile")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("sum_digits")).sum === 9L * nDigitDocs)
    assert(rows.map(_.getAs[Long]("sum_punct")).sum === 7L * nPunctDocs)
    rows.foreach(r => assert(r.getAs[Long]("n_symbol_heavy") >= 0))
  }

  // ---- q112 -----------------------------------------------------------

  test("q112: identical sources score 1e6 ppm; disjoint pairs are absent") {
    val dir = plantedDocs(Seq(
      (1L, "a b c d e", "en", "srcX", 0L),
      (2L, "a b c d e", "en", "srcY", 0L),
      (3L, "z1 z2 z3 z4 z5", "en", "srcZ", 0L)))
    val rows = AuditOps.queries("q112_source_overlap")(spark, dir).collect()
    assert(rows.length === 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[String]("src_a") === "srcX" && r.getAs[String]("src_b") === "srcY")
    assert(r.getAs[Long]("inter") === 3L && r.getAs[Long]("uni") === 3L)
    assert(r.getAs[Long]("jac_ppm") === 1000000L)
  }

  test("q112 fixture: inter <= min(|A|,|B|) <= union, pairs canonically ordered") {
    val rows = AuditOps.queries("q112_source_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (i, u) = (r.getAs[Long]("inter"), r.getAs[Long]("uni"))
      assert(i > 0 && i <= u, r.toString)
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"), r.toString)
      assert(r.getAs[Long]("jac_ppm") === i * 1000000L / u, r.toString)
    }
  }

  test("q112 regime bound: 64 sources sharing a trigram pass, 65 fail loudly") {
    import spark.implicits._
    def docs(n: Int) = (1 to n)
      .map(i => (i.toLong, "shared tri gram", f"src$i%03d"))
      .toDF("doc_id", "text", "source")
    // at the bound: C(64,2) = 2016 pairs, all inter=1 — runs fine
    assert(AuditOps.overlapMatrix(docs(AuditOps.MaxOverlapSources))
      .count() === 20L) // limit(20) of the 2016 pairs
    // one past the bound: the in-plan assert_true must throw, not fan out
    val e = intercept[Exception] {
      AuditOps.overlapMatrix(docs(AuditOps.MaxOverlapSources + 1)).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("out of its regime")), e.toString)
  }

  test("q121 decimal form: drift stays exact where the Long cross-products overflow") {
    import spark.implicits._
    // counts ~4e9 with N = Σ ~ 1.6e10: nsb·N ~ 6.4e19 > Long.MaxValue
    // (9.2e18), so the Long plan CANNOT compute this grid (ANSI mode
    // raises; legacy mode would silently wrap) — the DECIMAL(38,0) form
    // must agree with a BigInt reference computed outside Spark.
    val grid = Seq(
      ("a", 0L, 4000000000L), ("a", 1L, 1000000000L),
      ("b", 0L, 3000000000L), ("b", 1L, 8000000000L))
    val got = graft.operators.AuditOps
      .driftFromGrid(grid.toDF("source", "bin", "nsb"), decimalExact = true)
      .collect()
      .map(r => r.getAs[String]("source") ->
        BigInt(r.getAs[java.math.BigDecimal]("l1_cross").toBigIntegerExact))
      .toMap
    val n = BigInt(grid.map(_._3).sum)
    val ns = grid.groupBy(_._1).view.mapValues(g => BigInt(g.map(_._3).sum)).toMap
    val nb = grid.groupBy(_._2).view.mapValues(g => BigInt(g.map(_._3).sum)).toMap
    val want = grid.groupBy(_._1).view.mapValues(g =>
      g.map { case (s, b, c) => (BigInt(c) * n - nb(b) * ns(s)).abs }.sum).toMap
    assert(want.values.exists(_ > BigInt(Long.MaxValue)),
      "fixture must actually exceed Long range or the test proves nothing")
    assert(got === want.toMap)
  }

  // ---- q106 -----------------------------------------------------------

  test("q106: an all-rare doc is flagged high-OOV, an all-common one is not") {
    // 16 distinct tokens needed so the top-15 vocab can't cover everything:
    // "common" fills the corpus (in vocab); the rare doc's tokens each
    // appear once and lose the frequency race
    val common = Seq.fill(40)("common").mkString(" ")
    val rare = (1 to 40).map(i => s"rare$i").mkString(" ")
    val dir = plantedDocs(Seq(
      (1L, common, "en", "srcC", 0L),
      (2L, rare, "en", "srcR", 0L)))
    val got = TextAnalysis.queries("q106_oov_rate")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("srcC").getAs[Long]("n_docs_high_oov") === 0L)
    assert(got("srcC").getAs[Long]("sum_oov") === 0L)
    assert(got("srcR").getAs[Long]("n_docs_high_oov") === 1L)
    // 40 rare tokens, at most 14 fit in the vocab beside "common"
    assert(got("srcR").getAs[Long]("sum_oov") === 26L)
  }

  test("q106 fixture: OOV accounting is conserved") {
    val rows = TextAnalysis.queries("q106_oov_rate")(spark, sf).collect()
    val totalTok = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tok")).sum === totalTok)
    rows.foreach(r =>
      assert(r.getAs[Long]("sum_oov") <= r.getAs[Long]("sum_tok"), r.toString))
  }

  // ---- q107 -----------------------------------------------------------

  test("q107: posting heads are the smallest doc ids and bounded pre-exchange") {
    val rows = TextAnalysis.queries("q107_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
    rows.take(3).foreach { r =>
      val tok = r.getAs[String]("tok")
      val expected = docs
        .filter(array_contains(split(col("text"), " "), tok))
        .orderBy("doc_id").limit(5)
        .collect().map(_.getAs[Long]("doc_id")).mkString(",")
      assert(r.getAs[String]("head") === expected, s"head of '$tok'")
      assert(r.getAs[Long]("df") >= r.getAs[String]("head").split(",").length.toLong)
    }
    val plan = TextAnalysis.queries("q107_inverted_index")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "posting-head bound must push below the exchange:\n" + plan.take(1500))
  }

  // ---- q108 -----------------------------------------------------------

  test("q108 equals the built-in multi-distinct aggregate; only the built-in Expands") {
    val manual = StreamSemantics.queries("q108_twostage_distinct")(spark, sf)
    val builtin = Tables.events(spark, sf)
      .withColumn("vm", floor(col("value") * 1000).cast("long"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        countDistinct("props").as("n_props"), sum("vm").as("value_milli"))
      .orderBy("event_type")
    assert(manual.collect().map(_.toString).toSeq ===
      builtin.collect().map(_.toString).toSeq)
    val manualPlan = manual.queryExecution.executedPlan.toString
    val builtinPlan = builtin.queryExecution.executedPlan.toString
    assert(!manualPlan.contains("Expand"), "two-stage form must not Expand")
    assert(builtinPlan.contains("Expand"),
      "claim is vacuous: built-in multi-distinct no longer Expands")
  }

  test("q108 matches SQL distinct/sum null semantics on a null-bearing input") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-null").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = java.util.Arrays.asList(
      Row(1L, t, 7L, "a", 1.0, "p"),
      Row(2L, t, null, "a", 2.0, null), // null keys: counted by sum, not by distincts
      Row(3L, t, 7L, "a", 3.0, "q"))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q108_twostage_distinct")(spark, dir).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_users") === 1L, "null user must not count")
    assert(got.head.getAs[Long]("n_props") === 2L, "null props must not count")
    assert(got.head.getAs[Long]("value_milli") === 6000L, "sum covers ALL rows")
  }

  test("q195 attribution: equal split, floor remainder, windowed-out and untouched purchases in the -1 row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    def t(day: Int, hour: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // user 1: clicks day 1 and day 2, purchase day 3 → 2 touches, 500
    // milli each, gaps 2 and 1 days. user 2: three clicks same hour,
    // purchase next day → 3 touches at gap 1, 333 each (999 total —
    // floor remainder dropped). user 3: click 8 days before purchase →
    // outside the 7-day window. user 4: purchase, never clicked.
    val rows = Seq(
      (1L, t(1, 10), 1L, "click"), (2L, t(2, 10), 1L, "click"),
      (3L, t(3, 10), 1L, "purchase"),
      (4L, t(5, 8), 2L, "click"), (5L, t(5, 8), 2L, "click"),
      (6L, t(5, 8), 2L, "click"), (7L, t(6, 8), 2L, "purchase"),
      (8L, t(1, 0), 3L, "click"), (9L, t(9, 0), 3L, "purchase"),
      (10L, t(4, 0), 4L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q195_attribution_lag")(spark, dir).collect()
      .map(r => (r.getAs[Long]("gap_days"), r.getAs[Long]("n_touches"),
        r.getAs[Long]("credit_milli"), r.getAs[Long]("n_purchases"))).toSeq
    assert(got === Seq(
      (-1L, 0L, 0L, 2L),
      (1L, 4L, 1499L, 2L),
      (2L, 1L, 500L, 1L)))
  }

  // ---- q109 -----------------------------------------------------------

  test("q109: fills planted nulls forward, never backfills a leading null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ff").toString
    // user 100: leading null (id 3), then 5.0 (id 1), then null (id 6)
    // filled with 5.0; user 200: single non-null, nothing to fill
    Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 100L, "view", 9.9, ""),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 100L, "view", 5.0, ""),
      (6L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 100L, "view", 7.7, ""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 200L, "click", 2.5, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q109_forward_fill")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // view: id 3 -> null with no predecessor (unfilled), id 6 -> filled w/ 5.0
    assert(got("view").getAs[Long]("n_filled") === 1L)
    assert(got("view").getAs[Long]("n_unfilled") === 1L)
    // checksum: filled values are 5.0 (id 1's own) + 5.0 (carried to id 6)
    assert(got("view").getAs[Long]("checksum_milli") === 10000L)
    assert(got("click").getAs[Long]("n_filled") === 0L)
    assert(got("click").getAs[Long]("checksum_milli") === 2500L)
  }

  // ---- q113 -----------------------------------------------------------

  private def plantedEvents(rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    rows.map { case (id, ts, u, t, v, p) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q229: a run crossing the id-block boundary chain-merges into ONE run") {
    // The stitch's merge path, exercised deliberately: q229 windows
    // within id-blocks of 4096, so a type run spanning ids 4090..4100
    // appears as two intra-block runs (..4095 | 4096..) that the
    // bounded-grid chain merge must reunite by id-contiguity. Fixture:
    // that 11-id 'click' run, flanked by 'view' singletons (4089, 4101)
    // that pin the run's true extent, plus a 'view' pair far away.
    val rows =
      Seq((4089L, "view"), (4101L, "view"), (5000L, "view"), (5001L, "view")) ++
        (4090L to 4100L).map(i => (i, "click"))
    val dir = plantedEvents(rows.map { case (id, t) =>
      (id, "2024-01-01 00:00:00", 1L, t, 1.0, "")
    })
    val got = graft.operators.StreamSemantics.queries("q229_arrival_runs")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"))).toSeq
    // click: one merged 11-event run (NOT two of 6+5); view: 4089 and
    // 4101 are separate singletons, 5000/5001 one contiguous pair → 3 runs
    assert(got === Seq(("click", 11L, 1L, 11L), ("view", 4L, 3L, 2L)),
      s"cross-block run must merge: $got")
  }

  test("q231: planted cohort conversions reproduce the hand-computed z² exactly") {
    // 4 users per cohort; 'click' converts 3/4 (even users 0,2,4) vs 1/4
    // (user 1): Δ = (3·4 − 1·4)/(16), X = 4, N = 8 → z² = (3·4−1·4)²·8 /
    // (4·4·4·4) = 64·8/256 = 2.0 → 2000 milli, not significant.
    // 'view' converts nobody ≥ 20 times → x1 = x2 = 0 → degenerate NULL.
    def burst(user: Long, t: String, n: Int, base: Int) =
      (0 until n).map(k => ((user * 10000 + base + k),
        f"2024-01-01 ${(base / 60) % 24}%02d:${base % 60}%02d:00", user, t, 1.0, ""))
    val converters = Seq(0L, 2L, 4L, 1L) // even cohort: 3; odd cohort: 1
    val rows = converters.flatMap(u => burst(u, "click", 20, 100)) ++
      Seq(3L, 5L, 6L, 7L).flatMap(u => burst(u, "click", 5, 100)) ++ // under bar
      (0L to 7L).flatMap(u => burst(u, "view", 3, 500))              // nobody converts
    val got = graft.operators.AuditOps.queries("q231_ab_proportion_gate")(
      spark, plantedEvents(rows.map { case (id, ts, u, t, v, p) => (id, ts, u, t, v, p) }))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("x1"), r.getAs[Long]("n2"),
          r.getAs[Long]("x2"),
          if (r.isNullAt(r.fieldIndex("z2_milli"))) None else Some(r.getAs[Long]("z2_milli"))))
      .toMap
    assert(got("click") === ((4L, 3L, 4L, 1L, Some(2000L))))
    assert(got("view") === ((4L, 0L, 4L, 0L, None)), "zero-variance metric must report NULL")
  }

  test("q113: a spike after a constant run is flagged; the run itself never is") {
    // user 1: 24 constant observations then one 100x spike. σ of a
    // constant frame is 0, so the spike trips (x−μ)² > 4σ² while every
    // constant row has lhs = 0 (not > 0). First 10 rows are unscored.
    val rows = (1 to 24).map { i =>
      (i.toLong, f"2024-01-01 00:${i}%02d:00", 1L, "view", 1.0, "")
    } :+ (25L, "2024-01-01 00:25:00", 1L, "view", 100.0, "")
    val got = graft.operators.ScaleOps.queries("q113_rolling_anomaly")(
      spark, plantedEvents(rows)).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_scored") === 15L) // rows 11..25 have frames >= 10
    assert(r.getAs[Long]("n_anomalies") === 1L)
    assert(r.getAs[Long]("id_checksum") === 25L)
  }

  test("q113 fixture: scored-count equals the per-user frame arithmetic") {
    val perUser = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("c")).collect().map(_.getAs[Long]("c"))
    val expectedScored = perUser.map(c => math.max(0L, c - 10L)).sum
    val rows = graft.operators.ScaleOps.queries("q113_rolling_anomaly")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_scored")).sum === expectedScored)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n_scored"), r.toString))
  }

  // ---- q114 -----------------------------------------------------------

  test("q114: a user counts in every window within 7 days, and only once") {
    // user 1 purchases twice on day 0 (counts once); user 2 on day 3.
    // Window ending day 3 sees both; no window exists for absent days.
    val dir = plantedEvents(Seq(
      (1L, "2024-01-01 08:00:00", 1L, "purchase", 1.0, ""),
      (2L, "2024-01-01 09:00:00", 1L, "purchase", 1.0, ""),
      (3L, "2024-01-04 08:00:00", 2L, "purchase", 1.0, ""),
      (4L, "2024-01-02 08:00:00", 3L, "view", 1.0, ""))) // non-purchase: ignored
    val got = StreamSemantics.queries("q114_rolling_actives")(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_active")).toMap
    val day0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(got === Map(day0 -> 1L, (day0 + 3) -> 2L))
  }

  test("q114 fixture: trailing count dominates the single-day count") {
    val singleDay = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"),
        col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("n1"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n1")).toMap
    val rows = StreamSemantics.queries("q114_rolling_actives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, n) = (r.getAs[Long]("day"), r.getAs[Long]("n_active"))
      assert(n >= singleDay(d), s"day $d: trailing $n < single-day ${singleDay(d)}")
    }
  }

  // ---- q115 -----------------------------------------------------------

  test("q115: duplicates elect the min-id survivor; the gate drops short docs") {
    // three copies of one 40-token passing text (ids 5,9,14 — min 5
    // survives), one unique passing text, one too-short doc (gated out)
    val passing = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val dir = plantedDocs(Seq(
      (5L, passing, "en", "srcA", 0L),
      (9L, passing, "en", "srcA", 0L),
      (14L, passing, "en", "srcB", 0L),
      (20L, other, "en", "srcB", 0L),
      (25L, "too short", "en", "srcC", 0L)))
    val rows = graft.operators.CurationOps.queries("q115_pipeline_e2e")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 2L, rows.mkString("; "))
    assert(rows.map(_.getAs[Long]("id_checksum")).sum === 5L + 20L)
    // both survivors hit the 64-token budget cap at their full 40 tokens
    assert(rows.map(_.getAs[Long]("tok_budgeted")).sum === 80L)
    assert(!rows.exists(_.getAs[String]("source") == "srcC"))
  }

  test("q115 fixture: survivors equal gate-passing distinct fingerprints") {
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("nd", size(array_distinct(col("toks"))))
      .filter(col("n_tok") >= 40 && col("nd") * 10 >= col("n_tok") * 4)
    val expected = docs.select(md5(col("text"))).distinct().count()
    val rows = graft.operators.CurationOps.queries("q115_pipeline_e2e")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === expected)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  // ---- q116 -----------------------------------------------------------

  test("q116: a planted mislabel is the only confused vector") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    // label 0 clusters at +e1, label 1 at -e1; vec 99 carries label 0 but
    // sits at -e1 → its nearest centroid is label 1 (even with its own
    // contribution pulling centroid 0 slightly negative)
    def vec(sign: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) sign else 0.01f)
    val rows = (1L to 4L).map(i => (i, vec(1.0f), 0)) ++
      (11L to 14L).map(i => (i, vec(-1.0f), 1)) :+ ((99L, vec(-1.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.queries("q116_label_confusion")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(got(0).getAs[Long]("n_vecs") === 5L)
    assert(got(0).getAs[Long]("n_confused") === 1L)
    assert(got(0).getAs[Long]("id_checksum") === 99L)
    assert(got(1).getAs[Long]("n_confused") === 0L)
  }

  test("q116 fixture: confusion accounting is conserved") {
    val rows = graft.operators.Similarity.queries("q116_label_confusion")(spark, sf)
      .collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total,
      "zero-norm-free fixture: every vector is assigned and audited")
    rows.foreach(r =>
      assert(r.getAs[Long]("n_confused") <= r.getAs[Long]("n_vecs"), r.toString))
  }

  // ---- q119 -----------------------------------------------------------

  test("q119: events resolve to the version valid AT their timestamp") {
    // user 5: bronze only; user 6 (%3=0, %2=0): bronze -> silver (Jan 11)
    // -> gold (Jan 21). One event per phase plus the exact-boundary case.
    val dir = plantedEvents(Seq(
      (1L, "2024-01-25 00:00:00", 5L, "only_bronze", 1.0, ""),
      (2L, "2024-01-05 00:00:00", 6L, "early", 1.0, ""),
      (3L, "2024-01-15 00:00:00", 6L, "mid", 1.0, ""),
      (4L, "2024-01-25 00:00:00", 6L, "late", 1.0, ""),
      (5L, "2024-01-11 00:00:00", 6L, "boundary", 1.0, "")))
    val got = graft.operators.RelationalCore.queries("q119_pit_lookup")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[String]("tier")).toMap
    assert(got === Map("only_bronze" -> "bronze", "early" -> "bronze",
      "mid" -> "silver", "late" -> "gold",
      "boundary" -> "silver"), "exact-vfrom event must take the NEW version")
  }

  test("q119 fixture: every event resolves to exactly one tier") {
    val rows = graft.operators.RelationalCore.queries("q119_pit_lookup")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
    assert(rows.map(_.getAs[String]("tier")).toSet.subsetOf(
      Set("bronze", "silver", "gold")))
  }

  // ---- q120 -----------------------------------------------------------

  test("q120: delta-maintained stats equal a direct recompute over the new snapshot") {
    val maintained = graft.operators.CurationOps
      .queries("q120_incremental_stats")(spark, sf)
    val direct = Tables.documents(spark, sf)
      .filter(col("doc_id") % 11 =!= 0)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("content_checksum"))
    assert(maintained.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(maintained).count() === 0)
    // the fixture's moduli make every delta status occur, so the
    // equality is not vacuous: there are adds, removes, AND edits
    val docs = Tables.documents(spark, sf)
    assert(docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0).count() > 0, "adds")
    assert(docs.filter(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0).count() > 0, "removes")
    assert(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 =!= 0
      && col("doc_id") % 11 =!= 0).count() > 0, "edits")
  }

  // ---- q121 -----------------------------------------------------------

  test("q121: a source matching the corpus distribution scores zero drift") {
    // srcA and srcB have IDENTICAL length distributions (one 100-char,
    // one 250-char doc each) so both match the corpus exactly -> 0;
    // srcC is all-short -> positive drift
    val dir = plantedDocs(Seq(
      (1L, "t", "en", "srcA", 100L), (2L, "t", "en", "srcA", 250L),
      (3L, "t", "en", "srcB", 100L), (4L, "t", "en", "srcB", 250L),
      (5L, "t", "en", "srcC", 100L), (6L, "t", "en", "srcC", 100L)))
    val got = AuditOps.queries("q121_stratum_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("l1_cross")).toMap
    assert(got("srcA") === got("srcB"))
    assert(got("srcC") > got("srcA"))
    // srcA: bins {1:1, 2:1}; corpus bins {1:4, 2:2}, N=6, ns=2:
    // |1*6-4*2| + |1*6-2*2| = 2 + 2 = 4
    assert(got("srcA") === 4L)
  }

  // ---- q122 -----------------------------------------------------------

  test("q122: the forecast equals the real join's size, bucket by bucket") {
    val forecast = AuditOps.queries("q122_join_forecast")(spark, sf).collect()
      .map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("join_rows")).toMap
    val actual = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select((conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 16).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("n")).toMap
    assert(forecast === actual,
      "forecast must be exact, not an estimate — it is computed from exact per-key counts")
  }

  // ---- q123 -----------------------------------------------------------

  test("q123: DeflateLen matches java.util.zip byte-for-byte; flag separates planted docs") {
    import org.apache.spark.sql.GraftColumn
    import graft.functions.DeflateLen
    // reference computation, independent of the Expression code path
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(6, false)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192); var t = 0L
        while (!d.finished()) t += d.deflate(buf)
        t
      } finally d.end()
    }
    val texts = Tables.documents(spark, sf).select("text").limit(20)
      .collect().map(_.getString(0))
    val got = Tables.documents(spark, sf).limit(20)
      .select(GraftColumn(DeflateLen(GraftColumn.expr(col("text")))).as("c"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === texts.map(ref).toSeq, "Expression diverges from java.util.zip")

    val boiler = Seq.fill(60)("spam").mkString(" ")
    // high-entropy tokens: md5 hex of the index — ~50-60% deflate ratio,
    // safely above the 1/3 flag threshold
    val md = java.security.MessageDigest.getInstance("MD5")
    val diverse = (1 to 60).map { i =>
      md.digest(i.toString.getBytes).map("%02x".format(_)).mkString.take(12)
    }.mkString(" ")
    val dir = plantedDocs(Seq(
      (1L, boiler, "en", "srcB", boiler.length.toLong),
      (2L, diverse, "en", "srcD", diverse.length.toLong)))
    val rows = AuditOps.queries("q123_compression_ratio")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("srcB").getAs[Long]("n_high_redundancy") === 1L, "boilerplate must flag")
    assert(rows("srcD").getAs[Long]("n_high_redundancy") === 0L, "diverse must not flag")
    rows.values.foreach(r =>
      assert(r.getAs[Long]("sum_deflated") < r.getAs[Long]("sum_raw"),
        "deflate should compress these inputs"))
  }

  test("q123 is SQL-callable via the registered deflate_len function") {
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT deflate_len('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS c").head().getLong(0)
    assert(n > 0 && n < 32, "32 identical bytes must deflate below input size")
  }

  // ---- plan shapes ----------------------------------------------------

  test("q115 plan: the whole pipeline fuses into one corpus scan") {
    val plan = graft.operators.CurationOps.queries("q115_pipeline_e2e")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"pipeline should scan documents once, found $scans:\n" +
      plan.take(1200))
  }

  test("q112 plan: pair generation is join-free (only the two stats joins remain)") {
    val plan = AuditOps.queries("q112_source_overlap")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "pair path regressed to a self-join:\n" +
      plan.take(1200))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj === 2, s"expected exactly the na/nb stat joins, found $bhj")
  }

  // ---- q117 -----------------------------------------------------------

  test("q117: a perfectly linear series recovers its exact slope") {
    // value rises 1.0 per hour -> 1000 milli / 3600 s * 86400 = exactly
    // 24000 milli per day; OLS on noiseless data is exact
    val rows = (0 until 48).map { h =>
      (h.toLong, f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:00:00", 1L, "view",
        100.0 + h, "")
    }
    val got = graft.operators.ScaleOps.queries("q117_trend_slope")(
      spark, plantedEvents(rows)).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n") === 48L)
    assert(got.head.getAs[Double]("slope_milli_per_day") === 24000.0)
  }

  test("q117: a single-instant group reports NULL slope, not a crash or Inf") {
    val rows = Seq(
      (1L, "2024-01-02 12:00:00", 1L, "burst", 5.0, ""),
      (2L, "2024-01-02 12:00:00", 2L, "burst", 9.0, ""))
    val got = graft.operators.ScaleOps.queries("q117_trend_slope")(
      spark, plantedEvents(rows)).collect()
    assert(got.length === 1)
    assert(got.head.isNullAt(got.head.fieldIndex("slope_milli_per_day")),
      "undefined slope must be NULL")
  }

  test("q172: planted linear and anti-linear feeds recover corr ±1; same-day dow is NULL") {
    // feed pos: value = hour → r(value, hour) = +1; feed neg: value =
    // 10 − hour → −1. Everything on ONE calendar day: dow has zero
    // variance, so corr_value_dow must be NULL, not NaN or a crash.
    val rows =
      (1 to 5).map { h =>
        (h.toLong, f"2024-01-01 $h%02d:00:00", 1L, "pos", h.toDouble, "") } ++
      (1 to 5).map { h =>
        ((100 + h).toLong, f"2024-01-01 $h%02d:00:00", 1L, "neg", 10.0 - h, "") }
    val got = graft.operators.ScaleOps.queries("q172_correlation_audit")(
      spark, plantedEvents(rows)).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("corr_value_hour"),
          r.isNullAt(r.fieldIndex("corr_value_dow"))))).toMap
    assert(got("pos") === ((5L, 1.0, true)))
    assert(got("neg") === ((5L, -1.0, true)))
  }

  test("q172 fixture: correlations are bounded, n covers all events") {
    val rows = graft.operators.ScaleOps.queries("q172_correlation_audit")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
    for (r <- rows; c <- Seq("corr_value_hour", "corr_value_dow")
         if !r.isNullAt(r.fieldIndex(c))) {
      val v = r.getAs[Double](c)
      assert(!v.isNaN && v.abs <= 1.0, r.toString)
    }
  }

  test("q117 fixture: slopes are finite and groups cover all events") {
    val rows = graft.operators.ScaleOps.queries("q117_trend_slope")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("slope_milli_per_day")
      assert(!s.isNaN && !s.isInfinite, r.toString)
    }
  }

  // ---- q118 -----------------------------------------------------------

  test("q118: daily-sketch union estimates exactly like one direct sketch") {
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, hll_union_agg}
    val ev = Tables.events(spark, sf)
    val viaDays = ev
      .withColumn("day", floor(unix_timestamp(col("ts")) / 86400).cast("long"))
      .groupBy("event_type", "day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val a = viaDays.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b, "HLL union of partials must be transparent to the estimate")
    // the 5% bound moved OUT of q118's hashed columns (r7 ADVICE: its
    // oracle had to hardcode TRUE) — the spec asserts it tightly here,
    // against exact distincts computed independently of the query
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty)
    a.foreach { case (et, est) =>
      assert(math.abs(est - exact(et)) <= 0.05 * exact(et),
        s"HLL off by >5% for $et: est=$est exact=${exact(et)}")
    }
    // and the query still runs end-to-end with the deterministic columns
    val rows = graft.operators.ScaleOps.queries("q118_hll_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("exact_users") === exact(r.getAs[String]("event_type"))))
  }

  test("q109 fixture: fill accounting is conserved") {
    val rows = StreamSemantics.queries("q109_forward_fill")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    val planted = Tables.events(spark, sf).filter(col("event_id") % 3 === 0).count()
    val filled = rows.map(_.getAs[Long]("n_filled")).sum
    val unfilled = rows.map(_.getAs[Long]("n_unfilled")).sum
    assert(filled + unfilled === planted,
      s"every planted null is either filled or honestly unfilled ($total events)")
  }

  /** Driver-side q146 edge stats from raw key vectors. */
  private def edgeStatsOf(name: String, fks: Seq[Long], nDim: Long, pks: Set[Long])
      : (String, Long, Long, Long, Long, Long, Long) = {
    val grp = fks.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val orphans = grp.collect { case (k, c) if !pks.contains(k) => c }.sum
    (name, fks.length.toLong, grp.size.toLong, nDim, orphans,
      grp.values.max, fks.length.toLong * 1000 / grp.size)
  }

  test("q146 join stats: planted schema with a known orphan and fanouts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-joinstats").toString
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("region", Seq(0L).toDF("r_regionkey"))
    write("nation", Seq((0L, 0L), (1L, 0L)).toDF("n_nationkey", "n_regionkey"))
    // customer 7 points at nation 9 — a planted orphan edge
    write("customer", Seq((1L, 0L), (7L, 9L)).toDF("c_custkey", "c_nationkey"))
    write("supplier", Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey"))
    write("part", Seq(1L.->(0L)).toDF("p_partkey", "pad"))
    write("orders", Seq((1L, 1L), (2L, 1L), (3L, 7L)).toDF("o_orderkey", "o_custkey"))
    write("lineitem", Seq((1L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"))
    val got = AuditOps.queries("q146_join_stats")(spark, dir).collect()
      .map(r => (r.getAs[String]("edge"), r.getAs[Long]("n_fact"), r.getAs[Long]("fk_ndv"),
        r.getAs[Long]("n_dim"), r.getAs[Long]("n_orphans"), r.getAs[Long]("max_fanout"),
        r.getAs[Long]("avg_fanout_milli"))).toSeq
    val want = Seq(
      ("customer.nation", 2L, 2L, 2L, 1L, 1L, 1000L),  // custkey 7 → nation 9 orphaned
      ("lineitem.orders", 4L, 3L, 3L, 0L, 2L, 1333L),
      ("lineitem.part", 4L, 1L, 1L, 0L, 4L, 4000L),
      ("lineitem.supplier", 4L, 1L, 1L, 0L, 4L, 4000L),
      ("nation.region", 2L, 1L, 1L, 0L, 2L, 2000L),
      ("orders.customer", 3L, 2L, 2L, 0L, 2L, 1500L),
      ("supplier.nation", 1L, 1L, 2L, 0L, 1L, 1000L))
    assert(got === want)
  }

  test("q146 join stats re-derive exactly; the fixture graph has no orphans") {
    def keys(table: String, colName: String): Seq[Long] =
      Tables.table(spark, sf, table).select(colName).collect()
        .map(_.get(0).asInstanceOf[Number].longValue).toSeq
    val want = AuditOps.JoinEdges.map { case (name, f, fk, dm, pk) =>
      val pks = keys(dm, pk)
      edgeStatsOf(name, keys(f, fk), pks.length.toLong, pks.toSet)
    }.sortBy(_._1)
    val got = AuditOps.queries("q146_join_stats")(spark, sf).collect()
      .map(r => (r.getAs[String]("edge"), r.getAs[Long]("n_fact"), r.getAs[Long]("fk_ndv"),
        r.getAs[Long]("n_dim"), r.getAs[Long]("n_orphans"), r.getAs[Long]("max_fanout"),
        r.getAs[Long]("avg_fanout_milli"))).toSeq
    assert(got === want)
    assert(got.forall(_._5 == 0L), "generated fixture must be referentially intact")
  }

  /** Driver-side q147: hazard table from (user → day list). */
  private def hazardOf(byUser: Map[Long, Seq[Long]]): Seq[(Long, Long, Long, Long, Long)] = {
    val last = byUser.values.flatten.max
    val users = byUser.values.map(ds => (ds.max - ds.min, (last - ds.max) < 7)).toSeq
    val md = users.map(_._1).max
    (0L to md).scanRight((0L, 0L, 0L)) { case (d, (risk, _, _)) =>
      val ch = users.count(u => !u._2 && u._1 == d).toLong
      val ce = users.count(u => u._2 && u._1 == d).toLong
      (risk + ch + ce, ch, ce)
    }.init.zipWithIndex.map { case ((risk, ch, ce), d) =>
      (d.toLong, risk, ch, ce, ch * 10000 / risk)
    }
  }

  test("q147 churn hazard: planted lifetimes with censoring; at-risk conservation holds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hazard").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime + day * 86400000L)
    // A: days 0–5, churned at 5; B: 0–16, censored (4 days from edge);
    // C: single event on day 20 (the corpus last day), censored at 0;
    // D: 2–4, churned at 2
    val byUser = Map(1L -> Seq(0L, 5L), 2L -> Seq(0L, 10L, 16L), 3L -> Seq(20L), 4L -> Seq(2L, 3L, 4L))
    val rows = byUser.toSeq.flatMap { case (u, ds) =>
      ds.map(dd => (u * 100 + dd, ts(dd.toInt), u, "view", 0.0, "")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q147_churn_hazard")(spark, dir).collect()
      .map(r => (r.getAs[Long]("duration"), r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_churned"),
        r.getAs[Long]("n_censored"), r.getAs[Long]("hazard_bp"))).toSeq
    assert(got === hazardOf(byUser))
    assert(got.head._2 === 4L, "every user is at risk at duration 0")
    assert(got.map(x => x._3 + x._4).sum === 4L, "each user resolves exactly once")
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 <= a._2, "at-risk population must be non-increasing")
      case _ =>
    }
  }

  test("q147 churn hazard re-derives exactly at fixture scale") {
    val byUser = Tables.events(spark, sf).select("user_id", "ts").collect()
      .map(r => r.getAs[Long]("user_id") ->
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSeq }
    val got = StreamSemantics.queries("q147_churn_hazard")(spark, sf).collect()
      .map(r => (r.getAs[Long]("duration"), r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_churned"),
        r.getAs[Long]("n_censored"), r.getAs[Long]("hazard_bp"))).toSeq
    assert(got === hazardOf(byUser))
  }

  test("q148 k-anonymity: planted quasi-identifier classes land at the right k rungs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon").toString
    // class (srcA,en,band0): 1 doc — below every k; class (srcB,en,band0):
    // 6 docs — below k=10,20 only; class (srcC,en,band1): 25 docs — safe
    val docs = Seq((0L, "t", "en", "srcA", 10L)) ++
      (1L to 6L).map(i => (i, "t", "en", "srcB", 20L)) ++
      (7L to 31L).map(i => (i, "t", "en", "srcC", 150L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AuditOps.queries("q148_k_anonymity")(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_classes_below"),
        r.getAs[Long]("n_docs_at_risk"), r.getAs[Long]("risk_bp"))).toSeq
    assert(got === Seq(
      (2L, 1L, 1L, 1L * 10000 / 32),
      (5L, 1L, 1L, 1L * 10000 / 32),
      (10L, 2L, 7L, 7L * 10000 / 32),
      (20L, 2L, 7L, 7L * 10000 / 32)))
  }

  test("q148 k-anonymity re-derives exactly at fixture scale") {
    val cls = Tables.documents(spark, sf).select("source", "lang", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"), r.getAs[Long]("n_chars") / 100))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val n = cls.sum
    val want = Seq(2L, 5L, 10L, 20L).map { k =>
      val below = cls.filter(_ < k)
      (k, below.length.toLong, below.sum, below.sum * 10000 / n)
    }
    val got = AuditOps.queries("q148_k_anonymity")(spark, sf).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_classes_below"),
        r.getAs[Long]("n_docs_at_risk"), r.getAs[Long]("risk_bp"))).toSeq
    assert(got === want)
  }

  test("q160 reconciliation: planted drifts land in their exact buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-recon").toString
    // order 1 reconciles exactly; 2 drifts 5c; 3 drifts 50c; 4 drifts 5d.
    // line values chosen with zero discount/tax so cents are exact.
    Seq((1L, 10.00, 0.0, 0.0), (1L, 5.50, 0.0, 0.0),
      (2L, 20.00, 0.0, 0.0), (3L, 30.00, 0.0, 0.0), (4L, 40.00, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 15.50), (2L, 20.05), (3L, 30.50), (4L, 45.00))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = AuditOps.queries("q160_reconciliation")(spark, dir).collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("max_diff_cents")))
    assert(got.toSeq === Seq(
      ("a_exact", 1L, 0L), ("b_within_10c", 1L, 5L),
      ("c_within_1d", 1L, 50L), ("d_over_1d", 1L, 500L)))
  }

  test("q160 reconciliation re-derives exactly at fixture scale") {
    def cents(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val derived = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax").collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        cents(r.getAs[Double]("l_extendedprice") * (1 - r.getAs[Double]("l_discount")) *
          (1 + r.getAs[Double]("l_tax")) * 100))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val diffs = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice").collect()
      .flatMap { r =>
        derived.get(r.getAs[Long]("o_orderkey"))
          .map(d => math.abs(cents(r.getAs[Double]("o_totalprice") * 100) - d))
      }
    val want = diffs.groupBy { d =>
      if (d == 0) "a_exact" else if (d <= 10) "b_within_10c"
      else if (d <= 100) "c_within_1d" else "d_over_1d"
    }.toSeq.sortBy(_._1).map { case (b, xs) => (b, xs.length.toLong, xs.max) }
    val got = AuditOps.queries("q160_reconciliation")(spark, sf).collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("max_diff_cents"))).toSeq
    assert(got === want)
  }

  test("q157 rank churn: a planted overtake swaps ranks; new entrants count their full rank") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-churn").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime + day * 86400000L)
    // day0: a×3 (rank1), b×1 (rank2); day1: b×5 (rank1), a×2 (rank2) —
    // the overtake gives both |delta| 1; c debuts day1 ×1 (rank3,
    // prev_rank 0 → delta 3)
    val sizes = Seq(("a", 0, 3), ("b", 0, 1), ("b", 1, 5), ("a", 1, 2), ("c", 1, 1))
    val rows = sizes.flatMap { case (et, day, n) =>
      (0 until n).map(i => (day * 1000L + et.hashCode.abs % 100 * 10 + i, ts(day), 1L, et, 0.0, "")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d0 = 19723L
    val got = StreamSemantics.queries("q157_rank_churn")(spark, dir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("rank"), r.getAs[Long]("prev_rank"), r.getAs[Long]("rank_delta")))
    assert(got.toSeq === Seq(
      (d0, "a", 3L, 1L, 0L, 1L), (d0, "b", 1L, 2L, 0L, 2L),
      (d0 + 1, "b", 5L, 1L, 2L, 1L), (d0 + 1, "a", 2L, 2L, 1L, 1L),
      (d0 + 1, "c", 1L, 3L, 0L, 3L)))
  }

  test("q157 rank churn re-derives exactly at fixture scale") {
    val grid = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L),
        r.getAs[String]("event_type")))
      .groupBy(identity).map { case ((day, et), xs) => (day, et, xs.length.toLong) }.toSeq
    val ranked = grid.groupBy(_._1).toSeq.flatMap { case (day, xs) =>
      xs.sortBy(x => (-x._3, x._2)).zipWithIndex
        .map { case ((_, et, n), i) => (day, et, n, i + 1L) }
    }
    val byType = ranked.groupBy(_._2)
    val want = ranked.map { case (day, et, n, rank) =>
      val prev = byType(et).find(_._1 == day - 1).map(_._4).getOrElse(0L)
      (day, et, n, rank, prev, math.abs(rank - prev))
    }.sortBy(x => (x._1, x._4))
    val got = StreamSemantics.queries("q157_rank_churn")(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("rank"), r.getAs[Long]("prev_rank"), r.getAs[Long]("rank_delta"))).toSeq
    assert(got === want)
  }

  test("q158 decayed engagement re-derives exactly; decay strictly discounts old mass") {
    val ev = Tables.events(spark, sf).select("user_id", "value", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L)))
    val ref = ev.map(_._3).max
    val perUser = ev.groupBy(_._1).map { case (u, xs) =>
      val score = xs.map { case (_, v, day) =>
        math.floor(v * 1000).toLong / (1L << math.min((ref - day) / 7, 62L)) }.sum
      (u, xs.length.toLong, score)
    }.toSeq
    val want = perUser.sortBy { case (u, _, s) => (-s, u) }.take(20)
    val got = StreamSemantics.queries("q158_decayed_engagement")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("score_milli"))).toSeq
    assert(got === want)
    // decay is real: the decayed score never exceeds the undecayed sum
    val raw = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(x => math.floor(x._2 * 1000).toLong).sum }
    got.foreach { case (u, _, s) => assert(s <= raw(u), s"user $u decayed above raw mass") }
  }

  test("q158 shift clamp: events older than 64 weeks weigh 0 instead of wrapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-decay-old").toString
    // user 1: one fresh event (weight = full 5000 milli) and one 1204-day-old
    // event whose unclamped shift exponent is 172 — Java would wrap it to
    // 172 mod 64 = 44 and the old event would regain weight 5000/2^44 ≈ 0
    // here but catastrophically non-zero for larger values; user 2: a
    // 441-day event at the exact shift-63 edge that unclamped yields a
    // NEGATIVE Long divisor. Both must contribute exactly 0.
    val ref = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val dayMs = 86400000L
    val rows = Seq(
      (1L, ref, 1L, "view", 5.0, ""),
      (2L, new java.sql.Timestamp(ref.getTime - 1204 * dayMs), 1L, "view", 5.0, ""),
      (3L, new java.sql.Timestamp(ref.getTime - 441 * dayMs), 2L, "view", 9.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q158_decayed_engagement")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("score_milli"))).toSeq
    assert(got === Seq((1L, 2L, 5000L), (2L, 1L, 0L)))
  }

  /** Driver-side q152 balance row from class counts, BigInt arithmetic. */
  private def balanceOf(name: String, counts: Seq[Long]): (String, Long, Long, Long, Long) = {
    val n = counts.sum
    val sq = counts.map(c => BigInt(c) * c).sum
    val nn = BigInt(n) * n
    (name, n, counts.length.toLong, counts.max * 10000 / n, ((nn - sq) * 1000000 / nn).toLong)
  }

  test("q152 class balance: planted distributions; a constant column scores zero Gini") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-balance").toString
    // documents: lang en×3/de×1, source A×2/B×1/C×1; embeddings: label all
    // 'only' — a degenerate column must report majority 10000, gini 0
    Seq((0L, "t", "en", "srcA", 1L), (1L, "t", "en", "srcA", 1L),
      (2L, "t", "en", "srcB", 1L), (3L, "t", "de", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Array.fill(64)(1f), "only"), (1L, Array.fill(64)(2f), "only"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = AuditOps.queries("q152_class_balance")(spark, dir).collect()
      .map(r => (r.getAs[String]("column_name"), r.getAs[Long]("n"), r.getAs[Long]("k_classes"),
        r.getAs[Long]("majority_bp"), r.getAs[Long]("gini_micro"))).toSeq
    assert(got === Seq(
      balanceOf("documents.lang", Seq(3L, 1L)),
      balanceOf("documents.source", Seq(2L, 1L, 1L)),
      balanceOf("embeddings.label", Seq(2L))))
    assert(got.last === (("embeddings.label", 2L, 1L, 10000L, 0L)),
      "a single-class column must report zero impurity")
  }

  test("q152 class balance re-derives exactly over every audited column") {
    val want = AuditOps.BalanceColumns.map { case (tbl, c) =>
      val counts = Tables.table(spark, sf, tbl).select(c).collect()
        .filter(!_.isNullAt(0)).map(_.get(0).toString)
        .groupBy(identity).values.map(_.length.toLong).toSeq
      balanceOf(s"$tbl.$c", counts)
    }.sortBy(_._1)
    val got = AuditOps.queries("q152_class_balance")(spark, sf).collect()
      .map(r => (r.getAs[String]("column_name"), r.getAs[Long]("n"), r.getAs[Long]("k_classes"),
        r.getAs[Long]("majority_bp"), r.getAs[Long]("gini_micro"))).toSeq
    assert(got === want)
  }

  /** Driver-side q149 stats from (det, dep) string pairs. */
  private def fdStatsOf(name: String, pairs: Seq[(String, String)])
      : (String, Long, Long, Long, Long) = {
    val perA = pairs.groupBy(_._1).values.toSeq.map { xs =>
      (xs.length.toLong, xs.groupBy(_._2).values.map(_.length).max.toLong) }
    val (rows, smb) = (perA.map(_._1).sum, perA.map(_._2).sum)
    (name, rows, perA.size.toLong, rows - smb, smb * 10000 / rows)
  }

  test("q149 fd audit: a planted violation is counted; an exact FD reports zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fd").toString
    // documents: lang→source violated (en maps to 2 sources); source→lang
    // holds exactly
    Seq((0L, "t", "en", "srcA", 1L), (1L, "t", "en", "srcA", 1L),
      (2L, "t", "en", "srcB", 1L), (3L, "t", "de", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 0.0, ""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "click", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((1L, 5L, "O"), (2L, 5L, "O"), (3L, 6L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = AuditOps.queries("q149_fd_audit")(spark, dir).collect()
      .map(r => (r.getAs[String]("candidate"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_violations"), r.getAs[Long]("support_bp"))).toSeq
    assert(got === Seq(
      ("documents.lang->source", 4L, 2L, 1L, 7500L),
      ("documents.source->lang", 4L, 3L, 0L, 10000L),
      ("events.user_id->event_type", 2L, 1L, 1L, 5000L),
      ("orders.o_custkey->o_orderstatus", 3L, 2L, 0L, 10000L)))
  }

  test("q149 fd audit re-derives exactly over every candidate at fixture scale") {
    val want = AuditOps.FdCandidates.map { case (tbl, det, dep) =>
      val pairs = Tables.table(spark, sf, tbl).select(det, dep).collect()
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => (r.get(0).toString, r.get(1).toString)).toSeq
      fdStatsOf(s"$tbl.$det->$dep", pairs)
    }.sortBy(_._1)
    val got = AuditOps.queries("q149_fd_audit")(spark, sf).collect()
      .map(r => (r.getAs[String]("candidate"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_violations"), r.getAs[Long]("support_bp"))).toSeq
    assert(got === want)
  }

  test("q141 benford: planted digit mix yields BigInt-exact chi2, absent digits surface as 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-benford").toString
    // digits: 1 → 4 rows, 2 → 2 rows, 9 → 3 rows, all others absent (N=9)
    val prices = Seq(1000.0, 150.5, 19999.99, 123.45, 2000.0, 25.0, 900.0, 950.5, 9999.0)
    prices.toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val want = (1L to 9L).map { dg =>
      val o = prices.count(p => math.floor(p).toLong.toString.head.asDigit.toLong == dg)
      val e = AuditOps.BenfordPpm(dg.toInt - 1)
      val n = prices.length.toLong
      val dev = BigInt(o) * 1000000 - BigInt(n) * e
      (dg, o.toLong, o * 1000000L / n, e, (dev * dev / (BigInt(n) * e)).toLong)
    }
    val got = AuditOps.queries("q141_benford_audit")(spark, dir).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("e_ppm"), r.getAs[Long]("chi2_micro"))).toSeq
    assert(got === want)
    assert(got.count(_._2 == 0L) === 6, "six absent digits must still appear with n_obs=0")
  }

  test("q141 benford DECIMAL(38) path is exact where Long dev² would overflow") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-benford-big").toString
    // 20k rows, every first digit = 9: the absent-digit deviations reach
    // dev = 20000·301030 ≈ 6.0e9, dev² ≈ 3.6e19 > Long.MaxValue — a Long
    // formulation would wrap; the in-plan DECIMAL(38,0) must not
    val n = 20000
    (0 until n).map(i => 9000.0 + (i % 10)).toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val devOne = BigInt(n) * AuditOps.BenfordPpm.head
    assert(!(devOne * devOne).isValidLong, "fixture must actually exceed Long range")
    val want = (1L to 9L).map { dg =>
      val o = if (dg == 9L) n.toLong else 0L
      val e = AuditOps.BenfordPpm(dg.toInt - 1)
      val dev = BigInt(o) * 1000000 - BigInt(n) * e
      (dg, o, o * 1000000L / n, e, (dev * dev / (BigInt(n) * e)).toLong)
    }
    val got = AuditOps.queries("q141_benford_audit")(spark, dir).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("e_ppm"), r.getAs[Long]("chi2_micro"))).toSeq
    assert(got === want)
  }

  test("q141 benford: rows that cannot land on the 1..9 grid are excluded from N") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-benford-dom").toString
    // 0.5 floors to digit 0 and -3.0 would CAST-error on DuckDB; both are
    // out of the filter's domain, so N must count only the four >= 1 rows —
    // an unfiltered form would report N=6 while the grid sums to 4,
    // silently inflating every chi-square deviation.
    val prices = Seq(0.5, -3.0, 1000.0, 2000.0, 150.0, 9999.0)
    prices.toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val kept = prices.filter(_ >= 1)
    val n = kept.length.toLong
    val want = (1L to 9L).map { dg =>
      val o = kept.count(p => math.floor(p).toLong.toString.head.asDigit.toLong == dg).toLong
      val e = AuditOps.BenfordPpm(dg.toInt - 1)
      val dev = BigInt(o) * 1000000 - BigInt(n) * e
      (dg, o, o * 1000000L / n, e, (dev * dev / (BigInt(n) * e)).toLong)
    }
    val got = AuditOps.queries("q141_benford_audit")(spark, dir).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("e_ppm"), r.getAs[Long]("chi2_micro"))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === n, "grid mass must equal the counted N")
  }

  test("q141 benford re-derives exactly at fixture scale") {
    val prices = Tables.lineitem(spark, sf).select("l_extendedprice").collect()
      .map(_.getDouble(0))
    val n = prices.length.toLong
    val counts = prices.groupBy(p => math.floor(p).toLong.toString.head.asDigit.toLong)
      .map { case (dg, xs) => dg -> xs.length.toLong }
    val want = (1L to 9L).map { dg =>
      val o = counts.getOrElse(dg, 0L)
      val e = AuditOps.BenfordPpm(dg.toInt - 1)
      val dev = BigInt(o) * 1000000 - BigInt(n) * e
      (dg, o, o * 1000000L / n, e, (dev * dev / (BigInt(n) * e)).toLong)
    }
    val got = AuditOps.queries("q141_benford_audit")(spark, sf).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n_obs"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("e_ppm"), r.getAs[Long]("chi2_micro"))).toSeq
    assert(got === want)
  }

  // ---- q166 -----------------------------------------------------------

  private def secTs(s: Long) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + s * 1000L)

  test("q166 disorder audit: planted stragglers, incl. one behind a block-boundary hwm") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-disorder").toString
    // feed f (arrival = id order): event times 100,200,150,300,50,400 s →
    // lags 0,0,50,0,250,0 s; p95 of {50,250} picks rank 2 = 250 s.
    // feed g spans the 8192-id block boundary: id 8193's high-water mark
    // (1000 s, set by id 8190 in the PREVIOUS block) must flow through
    // the block-grid prefix — lag 50 s would be invisible to a
    // block-local hwm.
    val f = Seq(1L -> 100L, 2L -> 200L, 3L -> 150L, 4L -> 300L, 5L -> 50L, 6L -> 400L)
      .map { case (id, sec) => (id, secTs(sec), 1L, "f", 0.0, "") }
    val g = Seq(8190L -> 1000L, 8191L -> 900L, 8193L -> 950L)
      .map { case (id, sec) => (id, secTs(sec), 1L, "g", 0.0, "") }
    (f ++ g).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q166_disorder_audit")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_late"), r.getAs[Long]("late_ppm"),
        r.getAs[Long]("max_lag_ms"), r.getAs[Long]("p95_lag_ms"))).toSeq
    assert(got === Seq(
      ("f", 6L, 2L, 333333L, 250000L, 250000L),
      ("g", 3L, 2L, 666666L, 100000L, 100000L)))
  }

  test("q170 watermark tradeoff: planted lags drop only below the 1-minute delay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wmtrade").toString
    // same shape as the q166 plant: feed f lags {50s, 250s}, feed g lags
    // {100s, 50s} — only the >60s stragglers drop at delay 1 min; every
    // candidate ≥5 min admits everything
    val f = Seq(1L -> 100L, 2L -> 200L, 3L -> 150L, 4L -> 300L, 5L -> 50L, 6L -> 400L)
      .map { case (id, sec) => (id, secTs(sec), 1L, "f", 0.0, "") }
    val g = Seq(8190L -> 1000L, 8191L -> 900L, 8193L -> 950L)
      .map { case (id, sec) => (id, secTs(sec), 1L, "g", 0.0, "") }
    (f ++ g).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q170_watermark_tradeoff")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("delay_min"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("dropped_ppm"))).toSeq
    assert(got === Seq(
      ("f", 1L, 1L, 166666L), ("f", 5L, 0L, 0L), ("f", 15L, 0L, 0L), ("f", 60L, 0L, 0L),
      ("g", 1L, 1L, 333333L), ("g", 5L, 0L, 0L), ("g", 15L, 0L, 0L), ("g", 60L, 0L, 0L)))
  }

  test("q170 watermark tradeoff re-derives from the q166 lag definition") {
    val evs = Tables.events(spark, sf).select("event_type", "event_id", "ts").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
    val want = evs.groupBy(_._1).toSeq.flatMap { case (ft, xs) =>
      val seq = xs.sortBy(_._2)
      var hwm = -1L
      val lags = seq.map { case (_, _, us) =>
        val l = if (hwm > us) hwm - us else 0L
        hwm = math.max(hwm, us)
        l
      }
      Seq(1L, 5L, 15L, 60L).map { m =>
        val nd = lags.count(_ > m * 60L * 1000000L).toLong
        (ft, m, nd, nd * 1000000L / seq.length)
      }
    }.sortBy(x => (x._1, x._2))
    val got = StreamSemantics.queries("q170_watermark_tradeoff")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("delay_min"),
        r.getAs[Long]("n_dropped"), r.getAs[Long]("dropped_ppm"))).toSeq
    assert(got === want)
  }

  // ---- q167 -----------------------------------------------------------

  test("q167 schema drift: planted extra-key and null-props events surface as drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // feed a: 3 conforming {"k"}, one producer shipping an extra key, one
    // null props; the modal schema must be "k", and the rank-2 alternate
    // resolves the 1-vs-1 tie between "(none)" and "extra,k"
    // lexicographically ('(' < 'e') identically on both engines. feed b:
    // ALL props null → must read as 100% conforming to '(none)'.
    val rows = Seq(
      (1L, t, 1L, "a", 0.0, """{"k": 1}"""),
      (2L, t, 1L, "a", 0.0, """{"k": 2}"""),
      (3L, t, 1L, "a", 0.0, """{"k": 3}"""),
      (4L, t, 1L, "a", 0.0, """{"extra": 9, "k": 4}"""),
      (5L, t, 1L, "a", 0.0, null.asInstanceOf[String]),
      (6L, t, 1L, "b", 0.0, null.asInstanceOf[String]),
      (7L, t, 1L, "b", 0.0, null.asInstanceOf[String]))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.queries("q167_schema_drift")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[String]("modal_schema"), r.getAs[Long]("n_drift"),
        r.getAs[Long]("drift_ppm"), r.getAs[String]("alt_schema"),
        r.getAs[Long]("n_alt"))).toSeq
    assert(got === Seq(
      ("a", 5L, "k", 2L, 400000L, "(none)", 1L),
      ("b", 2L, "(none)", 0L, 0L, "", 0L)))
  }

  test("q167 on the fixture: every feed conforms to the uniform {k} schema") {
    val byType = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    val rows = AuditOps.queries("q167_schema_drift")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet === byType.keySet)
    rows.foreach { r =>
      assert(r.getAs[String]("modal_schema") === "k", r.toString)
      assert(r.getAs[Long]("n_drift") === 0L, r.toString)
      assert(r.getAs[String]("alt_schema") === "", r.toString)
      assert(r.getAs[Long]("n_events") === byType(r.getAs[String]("event_type")))
    }
  }

  // ---- q168 -----------------------------------------------------------

  test("q168 session calibration: planted gaps produce the hand-computed curve") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sesscal").toString
    // user 1: gaps 4m, 20m, 50m, 130m; user 2: one event (no gaps).
    // sessions(t) = n_users + gaps>t → 5,4,3,3 across the grid.
    val offs = Seq(0L, 4L, 24L, 74L, 204L)
    val rows = offs.zipWithIndex.map { case (m, i) =>
      ((i + 1).toLong, secTs(m * 60L), 1L, "view", 0.0, "") } :+
      (99L, secTs(0L), 2L, "view", 0.0, "")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q168_session_calibration")(spark, dir).collect()
      .map(r => (r.getAs[Long]("threshold_min"), r.getAs[Long]("n_gaps_over"),
        r.getAs[Long]("n_sessions"), r.getAs[Long]("sessions_per_user_milli"))).toSeq
    assert(got === Seq(
      (5L, 3L, 5L, 2500L), (30L, 2L, 4L, 2000L),
      (60L, 1L, 3L, 1500L), (120L, 1L, 3L, 1500L)))
  }

  test("q168 session calibration re-derives exactly from a driver-side gap pass") {
    val evs = Tables.events(spark, sf).select("user_id", "event_id", "ts").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
    val gaps = evs.groupBy(_._1).values.flatMap { xs =>
      xs.sortBy(x => (x._3, x._2)).sliding(2).collect {
        case Array(a, b) => b._3 - a._3
      }
    }.toSeq
    val nUsers = evs.map(_._1).distinct.length.toLong
    val want = Seq(5L, 30L, 60L, 120L).map { m =>
      val over = gaps.count(_ > m * 60L * 1000000L).toLong
      (m, over, nUsers + over, (nUsers + over) * 1000L / nUsers)
    }
    val got = StreamSemantics.queries("q168_session_calibration")(spark, sf).collect()
      .map(r => (r.getAs[Long]("threshold_min"), r.getAs[Long]("n_gaps_over"),
        r.getAs[Long]("n_sessions"), r.getAs[Long]("sessions_per_user_milli"))).toSeq
    assert(got === want)
  }

  test("q166 disorder audit re-derives exactly from a driver-side running-max pass") {
    val evs = Tables.events(spark, sf).select("event_type", "event_id", "ts").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
    val want = evs.groupBy(_._1).toSeq.map { case (ft, xs) =>
      val seq = xs.sortBy(_._2)
      var hwm = -1L
      val lags = seq.map { case (_, _, us) =>
        val l = if (hwm > us) hwm - us else 0L
        hwm = math.max(hwm, us)
        l
      }
      val late = lags.filter(_ > 0).sorted
      val n = seq.length.toLong
      val nLate = late.length.toLong
      val p95 = if (nLate == 0) 0L else late(((nLate * 95 + 99) / 100 - 1).toInt)
      (ft, n, nLate, nLate * 1000000L / n,
        (if (lags.isEmpty) 0L else lags.max) / 1000L, p95 / 1000L)
    }.sortBy(_._1)
    val got = StreamSemantics.queries("q166_disorder_audit")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_late"), r.getAs[Long]("late_ppm"),
        r.getAs[Long]("max_lag_ms"), r.getAs[Long]("p95_lag_ms"))).toSeq
    assert(got === want)
  }

  test("q182 modality coverage: planted gap and orphan are both reported") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-modcov").toString
    // docs 1–3 in s1; embeddings exist for 2, 3, and the orphan 9 →
    // s1 covers 2/3 (666‰) and exactly one orphan vector is counted.
    Seq((1L, "t1", "en", "s1", 2L), (2L, "t2", "en", "s1", 2L), (3L, "t3", "en", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((2L, Array(1.0f), 0), (3L, Array(1.0f), 0), (9L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = AuditOps.queries("q182_modality_coverage")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_embedded"), r.getAs[Long]("coverage_permille"),
        r.getAs[Long]("n_orphan_vecs"))).toSeq
    assert(got === Seq(("s1", 3L, 2L, 666L, 1L)))
  }

  test("q206 CUSUM locates a planted level shift at the exact split day") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // type x: 1.0/day for days 0-2, 5.0/day for days 3-5 → CUSUM stat
    // |6·Cₖ − k·18000| peaks at k=3 (36000), change_day = 2; type y is
    // flat → every split stat is 0, argmax tie falls to the FIRST day
    def ev(id: Long, day: Long, tp: String, v: Double) =
      Row(id, new java.sql.Timestamp(day * 86400000L), 1L, tp, v, "p")
    val rows = java.util.Arrays.asList(
      ev(1, 0, "x", 1.0), ev(2, 1, "x", 1.0), ev(3, 2, "x", 1.0),
      ev(4, 3, "x", 5.0), ev(5, 4, "x", 5.0), ev(6, 5, "x", 5.0),
      ev(7, 0, "y", 2.0), ev(8, 1, "y", 2.0), ev(9, 2, "y", 2.0))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.ScaleOps.queries("q206_cusum_changepoint")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("change_day"), r.getAs[Long]("days_before"),
        r.getAs[Long]("sum_before"), r.getAs[Long]("days_after"),
        r.getAs[Long]("sum_after"), r.getAs[Long]("peak_stat"))).toSeq
    assert(got === Seq(
      ("x", 6L, 2L, 3L, 3000L, 3L, 15000L, 36000L),
      ("y", 3L, 0L, 1L, 2000L, 2L, 4000L, 0L)))
  }

  test("q207 burstiness: periodic reads 0, clustered reads above Poisson's 1000") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-burst").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Long, tp: String) =
      Row(id, new java.sql.Timestamp(sec * 1000L), 1L, tp, 1.0, "p")
    // p: gaps 10,10,10 → CoV² = 0; b: gaps 0,0,30 → n·Q/S² − 1 =
    // 3·900/900 − 1 = 2 → 2000 milli, zero_permille 666
    val rows = java.util.Arrays.asList(
      ev(1, 0, "p"), ev(2, 10, "p"), ev(3, 20, "p"), ev(4, 30, "p"),
      ev(5, 0, "b"), ev(6, 0, "b"), ev(7, 0, "b"), ev(8, 30, "b"))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q207_arrival_burstiness")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("sum_gap_s"), r.getAs[Long]("mean_gap_s"),
        r.getAs[Long]("max_gap_s"), r.getAs[Long]("zero_permille"),
        r.getAs[Long]("burstiness_milli"))).toSeq
    assert(got === Seq(
      ("b", 3L, 30L, 10L, 30L, 666L, 2000L),
      ("p", 3L, 30L, 10L, 10L, 0L, 0L)))
  }

  test("q207 block decomposition equals the naive per-type window gap multiset on sf") {
    val evs = Tables.events(spark, sf).select("event_type", "ts", "event_id").collect()
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[String]("event_type"),
          ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, r.getAs[Long]("event_id"))
      }
    val want = evs.groupBy(_._1).toSeq.map { case (tp, xs) =>
      val us = xs.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = us.zip(us.tail).map { case (a, b) => (b - a) / 1000000L }
      val (n, s) = (gaps.length.toLong, gaps.sum)
      val q = gaps.map(g => BigInt(g) * g).sum
      val burst =
        if (s > 0) ((BigInt(n) * q * 1000) / (BigInt(s) * s)).toLong - 1000L else -1L
      (tp, n, s, s / n, gaps.max, gaps.count(_ == 0L) * 1000L / n, burst)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = StreamSemantics.queries("q207_arrival_burstiness")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("sum_gap_s"), r.getAs[Long]("mean_gap_s"),
        r.getAs[Long]("max_gap_s"), r.getAs[Long]("zero_permille"),
        if (r.isNullAt(6)) -1L else r.getAs[Long]("burstiness_milli"))).toSeq
    assert(got === want)
  }

  test("q208 TWA weights by hold time, diverging from the observation mean") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-twa").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Long, tp: String, v: Double) =
      Row(id, new java.sql.Timestamp(sec * 1000L), 1L, tp, v, "p")
    // x day 0: 1.0 holds 6h, then 5.0 holds 18h → TWA 4000 vs mean 3000;
    // y day 0: single 2.0 at noon → holds 12h, coverage 500‰
    val rows = java.util.Arrays.asList(
      ev(1, 0, "x", 1.0), ev(2, 21600, "x", 5.0),
      ev(3, 43200, "y", 2.0))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q208_time_weighted_avg")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("n_events"), r.getAs[Long]("twa_milli"),
        r.getAs[Long]("mean_milli"), r.getAs[Long]("coverage_permille"))).toSeq
    assert(got === Seq(
      ("x", 0L, 2L, 4000L, 3000L, 1000L),
      ("y", 0L, 1L, 2000L, 2000L, 500L)))
  }

  test("q208 block-stitched durations equal the naive per-day window on sf") {
    val evs = Tables.events(spark, sf).select("event_type", "ts", "event_id", "value")
      .collect().map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[String]("event_type"),
          ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L,
          r.getAs[Long]("event_id"), Math.round(r.getAs[Double]("value") * 1000))
      }
    val want = evs.groupBy(e => (e._1, e._2 / 86400000000L)).toSeq
      .map { case ((tp, day), xs) =>
        val o = xs.sortBy(e => (e._2, e._3))
        val durs = o.zip(o.tail.map(_._2) :+ ((day + 1) * 86400000000L))
          .map { case (e, nus) => (e._4, nus - e._2) }
        val wsum = durs.map { case (vm, du) => BigInt(vm) * du }.sum
        val dsum = durs.map(_._2).sum
        (tp, day, o.length.toLong, (wsum / dsum).toLong,
          o.map(_._4).sum / o.length, dsum * 1000L / 86400000000L)
      }.sortBy(t => (t._1, t._2))
    val got = StreamSemantics.queries("q208_time_weighted_avg")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("n_events"), r.getAs[Long]("twa_milli"),
        r.getAs[Long]("mean_milli"), r.getAs[Long]("coverage_permille"))).toSeq
    assert(got === want)
  }

  test("q215 merges overlapping spans, splits on gaps, and touching spans start a new island") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Long, u: Long) =
      Row(id, new java.sql.Timestamp(sec * 1000L), u, "x", 1.0, "p")
    // u1: 0s + 300s overlap into one island [0,900s); 1200s opens a second
    //     → active 1500s vs naive 1800s → overlap 166‰
    // u2: 0s and exactly 600s TOUCH (half-open) → two islands, zero overlap
    // u3: singleton
    val rows = java.util.Arrays.asList(
      ev(1, 0, 1), ev(2, 300, 1), ev(3, 1200, 1),
      ev(4, 0, 2), ev(5, 600, 2),
      ev(6, 50, 3))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.StreamSemantics.queries("q215_active_spans")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("islands"), r.getAs[Long]("active_us"),
        r.getAs[Long]("naive_us"), r.getAs[Long]("overlap_pct_milli"))).toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 1500000000L, 1800000000L, 166L),
      (2L, 2L, 2L, 1200000000L, 1200000000L, 0L),
      (3L, 1L, 1L, 600000000L, 600000000L, 0L)))
  }

  test("q215 union lengths equal a naive interval-merge re-derivation on sf") {
    val h = 600000000L
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_id")
      .collect().map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L)
      }
    val want = evs.groupBy(_._1).toSeq.map { case (u, xs) =>
      val starts = xs.map(_._2).sorted
      val (islands, active, _) = starts.foldLeft((0L, 0L, Long.MinValue)) {
        case ((n, act, end), us) =>
          if (us >= end) (n + 1, act + h, us + h)
          else (n, act + (us + h - end), us + h)
      }
      (u, xs.length.toLong, islands, active, xs.length * h)
    }.sortBy(_._1)
    val got = graft.operators.StreamSemantics.queries("q215_active_spans")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("islands"), r.getAs[Long]("active_us"),
        r.getAs[Long]("naive_us"))).toSeq
    assert(got === want)
  }

  test("q217 KS: shifted length distributions gap at 500000 ppm, identical ones at 0") {
    import spark.implicits._
    def dir(rows: Seq[(String, Long)]): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-ks").toString
      rows.zipWithIndex.map { case ((src, len), i) => (i.toLong, "t", "en", src, len) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    // A = {1,2,3,4}, B = {3,4,5,6}: max CDF gap is ½ first reached at v=2
    val shifted = dir(Seq("A" -> 1L, "A" -> 2L, "A" -> 3L, "A" -> 4L,
      "B" -> 3L, "B" -> 4L, "B" -> 5L, "B" -> 6L))
    val got = AuditOps.queries("q217_ks_drift")(spark, shifted).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_s"),
        r.getAs[Long]("n_rest"), r.getAs[Long]("ks_ppm"), r.getAs[Long]("ks_at")))).toMap
    assert(got("A") === ((4L, 4L, 500000L, 2L)))
    assert(got("B") === ((4L, 4L, 500000L, 2L)))
    // identical distributions: zero gap everywhere, argmax tie rule → min v
    val same = dir(Seq("C" -> 1L, "C" -> 2L, "D" -> 1L, "D" -> 2L))
    val got2 = AuditOps.queries("q217_ks_drift")(spark, same).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("ks_ppm"),
        r.getAs[Long]("ks_at")))).toMap
    assert(got2("C") === ((0L, 1L)))
    assert(got2("D") === ((0L, 1L)))
  }

  private def chiDir(rows: Seq[(String, String, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chi").toString
    rows.zipWithIndex.flatMap { case ((lang, src, n), i) =>
      (0 until n).map(j => (i * 1000L + j, s"w$i$j a b c d", lang, src, 0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q209 independence reads 0 on a balanced grid, N·10⁶ on perfect association") {
    import graft.operators.AuditOps
    def collect(dir: String) = AuditOps.queries("q209_independence_audit")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("observed"), r.getAs[Long]("expected_milli"),
        r.getAs[Long]("contrib_micro"))).toSeq
    // perfectly balanced 2×2 → every dev = 0, total 0
    val indep = collect(chiDir(Seq(
      ("en", "s1", 2), ("en", "s2", 2), ("de", "s1", 2), ("de", "s2", 2))))
    assert(indep.forall(_._5 === 0L))
    assert(indep.find(c => c._1 == "*" && c._2 == "*").get._3 === 8L)
    // perfect association → X² = N: zero cells MUST contribute (r·c/N
    // each) or the statistic halves — the full-grid design claim
    val dep = collect(chiDir(Seq(("en", "s1", 4), ("de", "s2", 4))))
    val cells = dep.filterNot(c => c._1 == "*")
    assert(cells.length === 4)
    assert(cells.count(_._3 === 0L) === 2)
    assert(cells.forall(_._5 === 2000000L))
    assert(dep.find(c => c._1 == "*").get._5 === 8000000L)
  }

  test("q210 lerp/exact/locf/nocb/none modes fire on planted brackets") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-lerp").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Long, u: Long, tp: String, v: Double) =
      Row(id, new java.sql.Timestamp(sec * 1000L), u, tp, v, "p")
    val rows = java.util.Arrays.asList(
      // u1: purchases (0s, 1.0) and (100s, 3.0); click at 25s → lerp
      // 1000·75 + 3000·25 over 100 = 1500; click at 0s → exact 1000
      ev(1, 0, 1, "purchase", 1.0), ev(2, 100, 1, "purchase", 3.0),
      ev(3, 25, 1, "click", 0.0), ev(4, 0, 1, "click", 0.0),
      // u2: click before its only purchase → nocb
      ev(5, 5, 2, "click", 0.0), ev(6, 10, 2, "purchase", 2.0),
      // u3: click after its only purchase → locf
      ev(7, 10, 3, "purchase", 4.0), ev(8, 20, 3, "click", 0.0),
      // u4: no purchases at all → none
      ev(9, 7, 4, "click", 0.0))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.RelationalCore.queries("q210_interp_join")(spark, dir)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("mode"),
        if (r.isNullAt(3)) -1L else r.getAs[Long]("value_milli"))).toSeq
    assert(got === Seq(
      (3L, "lerp", 1500L), (4L, "exact", 1000L), (5L, "nocb", 2000L),
      (8L, "locf", 4000L), (9L, "none", -1L)))
  }

  test("q219 unaligned peak window catches the boundary-straddling burst q28 splits") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-burstw").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ev(id: Long, sec: Long, u: Long) =
      Row(id, new java.sql.Timestamp(sec * 1000L), u, "x", 1.0, "p")
    // u1: 5-event burst straddles the hour-0/hour-1 boundary (3000..3900s).
    //     Aligned hourly buckets see 3 + 2; the event-anchored sliding hour
    //     starting at 3000s sees all 5 — the operator's reason to exist.
    // u2: events 2h apart → every sliding hour holds exactly 1.
    val rows = java.util.Arrays.asList(
      ev(1, 3000, 1), ev(2, 3300, 1), ev(3, 3540, 1), ev(4, 3660, 1), ev(5, 3900, 1),
      ev(6, 0, 2), ev(7, 7200, 2), ev(8, 14400, 2))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.StreamSemantics.queries("q219_burst_windows")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("burst"), r.getAs[Long]("at_us"),
        r.getAs[Long]("over_mean_milli"))).toSeq
    assert(got === Seq(
      (1L, 5L, 5L, 3000000000L, 1000L),
      (2L, 3L, 1L, 0L, 333L)))
    // the aligned-bucket max on u1 is provably lower: 3 < 5
    val aligned = Seq(3000L, 3300L, 3540L, 3660L, 3900L).groupBy(_ / 3600).values
      .map(_.size).max
    assert(aligned === 3 && aligned < 5)
  }

  test("q219 burst equals the naive event-anchored window max on sf") {
    val h = 3600000000L
    val evs = Tables.events(spark, sf).select("user_id", "ts")
      .collect().map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L)
      }
    val want = evs.groupBy(_._1).toSeq.map { case (u, xs) =>
      val us = xs.map(_._2).sorted
      val cnts = us.map(s => us.count(t => t >= s && t < s + h).toLong)
      val burst = cnts.max
      val at = us.zip(cnts).collectFirst { case (s, c) if c == burst => s }.get
      (u, us.length.toLong, burst, at, burst * 1000 / us.length)
    }.sortBy(_._1)
    val got = graft.operators.StreamSemantics.queries("q219_burst_windows")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("burst"), r.getAs[Long]("at_us"),
        r.getAs[Long]("over_mean_milli"))).toSeq
    assert(got === want)
  }

  test("q224 winsorized aggregate equals a driver-side order-statistic re-derivation") {
    val rows = Tables.customer(spark, sf).select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        graft.functions.HashOps.roundHalfAway(r.getAs[Double]("c_acctbal") * 100)))
    val want = rows.groupBy(_._1).map { case (seg, xs0) =>
      val xs = xs0.map(_._2).sorted
      val n = xs.length
      val lo = xs(((n * 5 + 99) / 100 - 1).toInt)
      val hi = xs(((n * 95 + 99) / 100 - 1).toInt)
      (seg, n.toLong, lo, hi, xs.sum,
        xs.map(v => math.max(lo, math.min(hi, v))).sum,
        xs.count(_ < lo).toLong, xs.count(_ > hi).toLong)
    }.toSeq.sortBy(_._1)
    val got = AuditOps.queries("q224_winsorized_agg")(spark, sf).collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("n"), r.getAs[Long]("lo_cents"),
        r.getAs[Long]("hi_cents"), r.getAs[Long]("sum_cents"), r.getAs[Long]("wsum_cents"),
        r.getAs[Long]("n_lo_clip"), r.getAs[Long]("n_hi_clip"))).toSeq
    assert(got === want)
    // clipping must actually fire somewhere, or the fixture proves nothing
    assert(got.exists(t => t._7 > 0 || t._8 > 0))
  }

  test("q225 mutual-NN is a one-to-one matching and equals brute-force mutual argmax") {
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
      .filter { case (_, _, v) => v.map(x => x * x).sum > 0 }
    val as = vecs.filter(v => v._2 <= 4 && v._1 % 10 == 0)
    val bs = vecs.filter(_._2 >= 5)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0; while (i < a.length) { d += a(i) * b(i); i += 1 }
      r6(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val scored = for ((aid, _, av) <- as; (bid, _, bv) <- bs) yield (aid, bid, cos(av, bv))
    val bestA = scored.groupBy(_._1).map { case (aid, xs) =>
      val s = xs.sortBy(t => (-t._3, t._2)); (aid, (s.head._2, s.head._3,
        if (s.length > 1) s(1)._3 else -1.0))
    }
    val bestB = scored.groupBy(_._2).map { case (bid, xs) =>
      val s = xs.sortBy(t => (-t._3, t._1)); (bid, s.head._1)
    }
    val want = bestA.toSeq.collect {
      case (aid, (bid, c, c2)) if bestB(bid) == aid =>
        (aid, bid, c, java.math.BigDecimal.valueOf((c - c2) * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    }.sortBy(_._1)
    val got = graft.operators.Similarity.queries("q225_mutual_nn")(spark, sf).collect()
      .map(r => (r.getAs[Long]("aid"), r.getAs[Long]("bid"),
        r.getAs[Double]("cosine"), r.getAs[Long]("margin_micro"))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // a mutual best-match set is a partial MATCHING: no id on either side twice
    assert(got.map(_._1).distinct.size === got.size)
    assert(got.map(_._2).distinct.size === got.size)
  }

  test("q226 maintained join-view equals direct recompute; fixture exercises adds, deletes, moves") {
    val o = Tables.orders(spark, sf)
    // all three delta kinds must be non-empty or the maintenance proof is vacuous
    assert(o.filter("o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0").count() > 0, "no added orders")
    assert(o.filter("o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0").count() > 0, "no removed orders")
    assert(Tables.customer(spark, sf).filter("c_custkey % 13 = 0").count() > 0, "no moved customers")
    // direct recompute of γ(A_new ⋈ B_new) — entirely in Spark, independent
    // of the DuckDB oracle, so this pins maintenance ≡ recompute even if
    // both SQL texts drifted together
    val bNew = Tables.customer(spark, sf).select(col("c_custkey"),
      when(col("c_custkey") % 13 === 0, lit("MOVED")).otherwise(col("c_mktsegment")).as("seg"))
    val direct = o.filter("o_orderkey % 11 <> 0")
      .select(col("o_custkey"), expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .join(bNew, col("o_custkey") === col("c_custkey"))
      .groupBy("seg")
      .agg(countDistinct("o_custkey").as("n_custkeys"), count(lit(1)).as("n_orders"),
        sum("cents").as("sum_cents"))
      .orderBy("seg")
    def tup(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[String]("seg"), r.getAs[Long]("n_custkeys"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("sum_cents"))).toSeq
    val got = tup(graft.operators.CurationOps.queries("q226_join_view_maintenance")(spark, sf))
    assert(got === tup(direct))
    assert(got.exists(_._1 == "MOVED"))
  }

  test("q265: the diverged leaf set equals an independent per-leaf digest diff, and the root flags the divergence") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.AuditOps.queries("q265_merkle_diff")(spark, sf).collect()
    assert(rows.exists(_.getAs[Long]("level") == 0L), "root must diverge when any leaf does")
    val gotLeaves = rows.filter(_.getAs[Long]("level") == 3L)
      .map(_.getAs[Long]("node_id")).toSet
    // independent derivation: diff the two replicas' leaf digests directly
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val repl = base.filter(expr("doc_id % 151 != 40"))
      .withColumn("text", expr("IF(doc_id % 97 = 13, concat(text, 'X'), text)"))
    val a = graft.operators.AuditOps.merkleLeaves(base).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.operators.AuditOps.merkleLeaves(repl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (a.keySet ++ b.keySet)
      .filter(l => a.getOrElse(l, 0L) != b.getOrElse(l, 0L))
    assert(gotLeaves === want)
    assert(want.nonEmpty, "fixture planted no divergence")
  }

  test("q276: realized mean |noise| per rung tracks the Laplace expectation b = 1e6/eps within a 3x band") {
    val rows = graft.operators.AuditOps.queries("q276_dp_release")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("eps_milli")).foreach { case (eps, rs) =>
      val meanAbs = rs.map(_.getAs[Long]("abs_err_milli")).sum / rs.length
      val expected = 1000000L / eps
      assert(meanAbs >= expected / 3 && meanAbs <= expected * 3,
        s"eps=$eps: mean |noise| $meanAbs vs expected $expected")
    }
  }

  test("q324: brute noisy channel reproduces margins; debias identity; mass conserved") {
    def b(k: String, m: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % m
    }
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rep = ev.map { case (id, t) =>
      (t, if (b(id.toString, 4) < 3) t else types(b(s"$id:alt", 5).toInt))
    }
    val trueN = rep.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val obsN = rep.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = ev.length.toLong
    val got = AuditOps.queries("q324_rr_ldp_debias")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("true_n")).sum === n)
    assert(got.map(_.getAs[Long]("observed_n")).sum === n)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("true_n") === trueN.getOrElse(t, 0L))
      assert(r.getAs[Long]("observed_n") === obsN.getOrElse(t, 0L))
      val d = math.max(20L * obsN.getOrElse(t, 0L) - n, 0L) / 15L
      assert(r.getAs[Long]("debiased_n") === d)
      assert(r.getAs[Long]("err_permille") ===
        (d - trueN.getOrElse(t, 0L)).abs * 1000L / math.max(trueN.getOrElse(t, 0L), 1L))
    }
  }

  test("q328: brute fixed-point JSD matches; bounded in [0, 1000]") {
    def l2m(x: Long): Long = {
      require(x > 0)
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << (bl - 1)
      1000L * (bl - 1) + (x - p) * 1000L / p
    }
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type",
        "CAST((unix_micros(ts) div 3600000000) % 24 < 12 AS LONG) AS am",
        "CAST(round(value * 100) AS BIGINT) AS v").collect()
    val got = AuditOps.queries("q328_jsd_drift")(spark, sf).collect()
    got.foreach { g =>
      val t = g.getAs[String]("event_type")
      val rs = rows.filter(_.getString(0) == t)
      val byV = rs.groupBy(_.getLong(2)).view.mapValues { xs =>
        (xs.count(_.getLong(1) == 1L).toLong, xs.count(_.getLong(1) == 0L).toLong)
      }
      val na = byV.values.map(_._1).sum
      val nb = byV.values.map(_._2).sum
      var num = 0L
      byV.values.foreach { case (a, b) =>
        val ap = if (na > 0) a * 1000000L / na else 0L
        val bp = if (nb > 0) b * 1000000L / nb else 0L
        if (ap > 0) num += ap * (l2m(2 * ap) - l2m(ap + bp))
        if (bp > 0) num += bp * (l2m(2 * bp) - l2m(ap + bp))
      }
      val jsd = math.max(num / 2000000L, 0L)
      assert(g.getAs[Long]("n_a") === na)
      assert(g.getAs[Long]("n_b") === nb)
      assert(g.getAs[Long]("jsd_milli") === jsd, s"jsd at $t")
      assert(jsd >= 0L && jsd <= 1000L)
      assert(g.getAs[Long]("drifted") === (if (jsd >= 100) 1L else 0L))
    }
  }

  test("q352: brute full-grid chi2 and Cramer's V rescale match") {
    val rows = Tables.documents(spark, sf)
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val langs = rows.map(_._1).distinct.sorted
    val sources = rows.map(_._2).distinct.sorted
    val chi2 = (for (l <- langs; s <- sources) yield {
      val o = rows.count(r => r == (l, s)).toLong
      val r0 = rows.count(_._1 == l).toLong
      val c0 = rows.count(_._2 == s).toLong
      val dev = BigInt(n) * o - BigInt(r0) * c0
      (dev * dev * 1000000 / (BigInt(n) * r0 * c0)).toLong
    }).sum
    val dfMin = math.min(langs.length, sources.length).toLong - 1
    val v2 = if (dfMin > 0 && n > 0) chi2 / (n * dfMin * 1000) else 0L
    val g = graft.operators.AuditOps.queries("q352_cramers_v")(spark, sf).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("n") === n)
    assert(g.head.getAs[Long]("n_rows") === langs.length.toLong)
    assert(g.head.getAs[Long]("n_cols") === sources.length.toLong)
    assert(g.head.getAs[Long]("chi2_micro") === chi2, "chi2")
    assert(g.head.getAs[Long]("v2_milli") === v2, "V2")
    assert(v2 <= 1000L, "V bounded by 1")
  }
}
