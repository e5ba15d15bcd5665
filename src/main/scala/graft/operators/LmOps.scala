package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical LANGUAGE-MODEL / corpus-shape operators: the scoring and
  * fitting passes a training-data pipeline runs between cleaning and
  * packing. q283 is the conditional (context-aware) upgrade of q223's
  * unigram surprisal — an actual backoff bigram LM trained on a split and
  * scored on held-out docs, the CCNet/Gopher perplexity-filter shape;
  * q284 prices source CONCENTRATION (Gini/Lorenz over document mass);
  * q285 fits the Zipf rank-frequency law q203's spectrum only assumes;
  * q286 closes the quality-scoring family with a TRAINED linear probe
  * (closed-form normal equations — no iteration, one moments pass).
  *
  * Everything stays exact-integer (the SCALE.md rule): logs via the
  * shared `FixedPoint.log2milli` bit-length idiom, regressions via
  * Cramer determinants in DECIMAL(38)/HUGEINT, divisions staged so both
  * engines truncate identically.
  */
object LmOps extends QueryPack {
  import Tables._

  /** Spark-side exact fixed-point log2 (must stay verbatim-parallel to
    * [[FixedPoint.log2milli]] and [[dl2m]]). */
  private def sl2m(x: String): String =
    s"(1000 * (length(bin($x)) - 1) + (($x - shiftleft(CAST(1 AS BIGINT), " +
      s"length(bin($x)) - 1)) * 1000) div shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1))"

  /** DuckDB twin of [[sl2m]]. */
  private def dl2m(x: String): String =
    s"(1000 * (length(bin($x)) - 1) + (($x - (CAST(1 AS BIGINT) << " +
      s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"

  private val duckTrain =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80"
  private val duckEval =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 >= 80"

  // q283: STUPID-BACKOFF BIGRAM LM SCORING — the trained, SPLIT-honest
  // perplexity filter (Brants et al. 2007 "Large Language Models in
  // Machine Translation", public; the CCNet pipeline's filtering stage):
  // q223 scores tokens by a corpus prior and q176 by raw bigram support,
  // but a real LM filter (a) trains on one split and scores ANOTHER
  // (otherwise every doc looks familiar to itself) and (b) scores
  // CONDITIONALLY — P(w2|w1) = C(w1w2)/C(w1), backing off to
  // 0.4·C(w2)/T when the context was never seen, with a fixed 20-bit cap
  // for fully-unseen words. All in exact milli-bits: log2(C/C') =
  // log2milli(C) − log2milli(C'), backoff penalty −log2(0.4) = 1322
  // milli, so the hashed columns never hold a float log. Eval docs are
  // decorated with ' qq table' (deterministic in both engines) so all
  // three branches — seen bigram, backed-off, capped — are exercised on
  // the driver's clean fixture. Shape at 100 TB: count tables partial-agg
  // map-side on ngram keys; scoring is three ngram-keyed joins (the q97
  // join-back shape) + a doc-grain collapse to a (source, band) grid —
  // no window, no self-join, and the unigram total is a 1-row broadcast.
  private def q283(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).withColumn("bkt", pctBucket(col("doc_id")))
    val trainToks = base.filter(col("bkt") < 80)
      .select(explode(split(col("text"), " ")).as("tok"))
    val uni = trainToks.groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = trainToks.agg(count(lit(1)).as("t"))
    val trainBg = base.filter(col("bkt") < 80)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val evalBg = base.filter(col("bkt") >= 80)
      .withColumn("toks", split(concat(col("text"), lit(" qq table")), " "))
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"))
        .as("bg"))
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .withColumn("w2", expr("split(bg, ' ')[1]"))
    evalBg
      .join(trainBg, Seq("bg"), "left")
      .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("cu", "cu1"),
        Seq("w1"), "left")
      .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("cu", "cu2"),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("nll_milli", expr(
        s"""CASE WHEN cb IS NOT NULL THEN ${sl2m("cu1")} - ${sl2m("cb")}
           |WHEN cu2 IS NOT NULL THEN ${sl2m("t")} - ${sl2m("cu2")} + 1322
           |ELSE 20000L END""".stripMargin))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bg"), sum("nll_milli").as("snll"))
      .withColumn("mean_nll_milli", expr("snll div n_bg"))
      .withColumn("band", expr("mean_nll_milli div 2000"))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"), sum("mean_nll_milli").as("sum_mean_milli"))
      .orderBy("source", "band")
  }

  private val q283Sql =
    s"""WITH tr AS (SELECT doc_id, text FROM documents WHERE $duckTrain),
       |ttoks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM tr),
       |uni AS (SELECT tok, count(*) AS cu FROM ttoks GROUP BY tok),
       |tot AS (SELECT count(*) AS t FROM ttoks),
       |tbg AS (SELECT bg, count(*) AS cb FROM (
       |   SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
       |     i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
       |   FROM tr WHERE len(string_split(text, ' ')) >= 2) GROUP BY bg),
       |ev AS (SELECT doc_id, source, text || ' qq table' AS t2 FROM documents
       |  WHERE $duckEval),
       |ebg AS (SELECT doc_id, source,
       |   unnest(list_transform(range(1, len(string_split(t2, ' '))),
       |     i -> string_split(t2, ' ')[i] || ' ' || string_split(t2, ' ')[i+1])) AS bg
       |  FROM ev),
       |sp AS (SELECT doc_id, source, bg,
       |   string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2 FROM ebg),
       |sc AS (SELECT e.doc_id, e.source,
       |   CASE WHEN b.cb IS NOT NULL THEN ${dl2m("u1.cu")} - ${dl2m("b.cb")}
       |     WHEN u2.cu IS NOT NULL THEN ${dl2m("tot.t")} - ${dl2m("u2.cu")} + 1322
       |     ELSE 20000 END AS nll_milli
       |  FROM sp e
       |  LEFT JOIN tbg b ON e.bg = b.bg
       |  LEFT JOIN uni u1 ON e.w1 = u1.tok
       |  LEFT JOIN uni u2 ON e.w2 = u2.tok
       |  CROSS JOIN tot),
       |pd AS (SELECT doc_id, source, count(*) AS n_bg,
       |   CAST(sum(nll_milli) AS BIGINT) AS snll FROM sc GROUP BY 1, 2),
       |bd AS (SELECT source, snll // n_bg AS mean_nll_milli,
       |   (snll // n_bg) // 2000 AS band FROM pd)
       |SELECT source, band, count(*) AS n_docs,
       | CAST(sum(mean_nll_milli) AS BIGINT) AS sum_mean_milli
       |FROM bd GROUP BY 1, 2 ORDER BY source, band""".stripMargin

  // q284: GINI / LORENZ SOURCE-CONCENTRATION AUDIT — q233 scores the
  // PARTITION-KEY distribution by entropy and q183 prices effective
  // source count; neither answers the mix-auditor's question "how
  // unequal is document MASS inside each source" in the standard
  // economics form. Gini from the sorted-rank identity
  // G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) (x ascending, exact permille),
  // plus the top-decile Lorenz point (mass share of the largest 10% of
  // docs). Ranking is per-source (row_number windows partitioned by
  // source — parallel across the corpus; ties on n_chars broken by
  // doc_id, which cannot change G because equal x contribute the same
  // Σi·x under any tie order). One shuffle to source partitions, then
  // per-source windows and a 20-row collapse.
  private def q284(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    documents(s, d)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sx"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * n_chars")).as("swx"),
        sum(when(col("i") > col("n") - expr("n div 10"), col("n_chars"))
          .otherwise(0L)).as("top_mass"))
      .withColumn("gini_permille", expr(
        "CAST((2 * swx - (n_docs + 1) * CAST(sx AS DECIMAL(38,0))) * 1000 " +
          "div (n_docs * CAST(sx AS DECIMAL(38,0))) AS BIGINT)"))
      .withColumn("top_decile_permille",
        expr("CAST(CAST(top_mass AS DECIMAL(38,0)) * 1000 div sx AS BIGINT)"))
      .select("source", "n_docs", "gini_permille", "top_decile_permille")
      .orderBy("source")
  }

  private val q284Sql =
    """WITH r AS (SELECT source, n_chars,
      |   row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i,
      |   count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |g AS (SELECT source, count(*) AS n_docs, sum(n_chars) AS sx,
      |   sum(CAST(i AS HUGEINT) * n_chars) AS swx,
      |   sum(CASE WHEN i > n - n // 10 THEN n_chars ELSE 0 END) AS top_mass
      |  FROM r GROUP BY 1)
      |SELECT source, n_docs,
      | CAST((2 * swx - (n_docs + 1) * CAST(sx AS HUGEINT)) * 1000
      |   // (n_docs * CAST(sx AS HUGEINT)) AS BIGINT) AS gini_permille,
      | CAST(CAST(top_mass AS HUGEINT) * 1000 // sx AS BIGINT) AS top_decile_permille
      |FROM g ORDER BY source""".stripMargin

  // q285: ZIPF RANK-FREQUENCY FIT — q203's spectrum audit reports the
  // frequency CLASSES; this FITS the law those classes assume: OLS of
  // log2(count) on log2(rank) over the top-100 tokens, slope (the Zipf
  // exponent, ~ -1 for natural text) and rho^2 as the goodness gate that
  // tells CMS sizing / hot-key economics whether the power-law model is
  // even valid on THIS corpus. Logs are the shared bit-length fixed
  // point; the fit is exact integer OLS (centered cross moments in
  // DECIMAL(38), the rho^2 product staged through slope_milli exactly as
  // q279). Shape: token counts partial-agg map-side, a top-100
  // TakeOrderedAndProject (never a global sort of the vocab), then a
  // 100-row single-partition window for ranks — driver-scale algebra.
  private def q285(s: SparkSession, d: String): DataFrame = {
    val top = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(100)
    top
      .withColumn("r", row_number().over(
        Window.partitionBy(pmod(length(col("tok")), lit(1)))
          .orderBy(desc("c"), col("tok"))).cast("long"))
      .withColumn("x", expr(sl2m("r")))
      .withColumn("y", expr(sl2m("c")))
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("k_tokens"), sum("x").as("sx2"), sum("y").as("sy2"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("cxx", expr("k_tokens * sxx - CAST(sx2 AS DECIMAL(38,0)) * sx2"))
      .withColumn("cxy", expr("k_tokens * sxy - CAST(sx2 AS DECIMAL(38,0)) * sy2"))
      .withColumn("cyy", expr("k_tokens * syy - CAST(sy2 AS DECIMAL(38,0)) * sy2"))
      .withColumn("slope_milli", expr(
        "CASE WHEN cxx > 0 THEN CAST(cxy * 1000 div cxx AS BIGINT) ELSE 0L END"))
      .withColumn("r2_permille", expr(
        "CASE WHEN cxx > 0 AND cyy > 0 THEN " +
          "CAST(CAST(slope_milli AS DECIMAL(38,0)) * cxy div cyy AS BIGINT) ELSE 0L END"))
      .withColumn("intercept_milli", expr(
        "CAST((CAST(sy2 AS DECIMAL(38,0)) * 1000 - CAST(slope_milli AS DECIMAL(38,0)) * sx2) " +
          "div (1000 * k_tokens) AS BIGINT)"))
      .select("k_tokens", "slope_milli", "r2_permille", "intercept_milli")
  }

  private val q285Sql = {
    val x = dl2m("r"); val y = dl2m("c")
    s"""WITH cf AS (SELECT tok, count(*) AS c FROM
       |   (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok ORDER BY c DESC, tok LIMIT 100),
       |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM cf),
       |xy AS (SELECT $x AS x, $y AS y FROM rk),
       |mo AS (SELECT count(*) AS k_tokens,
       |   CAST(sum(x) AS HUGEINT) AS sx2, CAST(sum(y) AS HUGEINT) AS sy2,
       |   sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy,
       |   sum(CAST(y AS HUGEINT) * y) AS syy FROM xy),
       |cc AS (SELECT *, k_tokens * sxx - sx2 * sx2 AS cxx,
       |   k_tokens * sxy - sx2 * sy2 AS cxy, k_tokens * syy - sy2 * sy2 AS cyy
       |  FROM mo),
       |sl AS (SELECT *, CASE WHEN cxx > 0
       |   THEN CAST(cxy * 1000 // cxx AS BIGINT) ELSE 0 END AS slope_milli FROM cc)
       |SELECT k_tokens, slope_milli,
       | CASE WHEN cxx > 0 AND cyy > 0
       |   THEN CAST(CAST(slope_milli AS HUGEINT) * cxy // cyy AS BIGINT)
       |   ELSE 0 END AS r2_permille,
       | CAST((sy2 * 1000 - CAST(slope_milli AS HUGEINT) * sx2)
       |   // (1000 * k_tokens) AS BIGINT) AS intercept_milli
       |FROM sl""".stripMargin
  }

  // q286: TRAINED LINEAR-PROBE QUALITY CLASSIFIER — the quality family's
  // missing LEARNED member (q36/q102 are hand-weighted heuristics, q223
  // a corpus prior): fit is-English from two layout features (stopword
  // ratio, mean token length) by ORDINARY LEAST SQUARES on the train
  // split, solved in CLOSED FORM via Cramer's rule on the 3x3 normal
  // equations — the one regression that needs NO iteration, so the whole
  // train step is a single moments aggregation (nine integer sums) and
  // the model is three exact rationals. Deci-scaled features keep every
  // Cramer determinant under DECIMAL(38)/HUGEINT at any corpus size
  // (det ~ (Σx²)³). Scoring is a broadcast of the 1-row model; the
  // report is the eval-split confusion matrix per source. The linear
  // probability model thresholded at 1/2 is deliberately the simplest
  // decision rule whose train AND inference are both exactly hashable —
  // the probe methodology, not a production classifier claim.
  private def q286(s: SparkSession, d: String): DataFrame = {
    val feat = ProbeModel.features(s, d)
    feat.filter(col("bkt") >= 80)
      .crossJoin(broadcast(ProbeModel.weights(feat)))
      .withColumn("yhat_micro", expr("w0_micro + w1_micro * x1 + w2_micro * x2"))
      .withColumn("pred", expr("IF(yhat_micro >= 500000, 1L, 0L)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_eval"),
        sum(expr("IF(pred = 1 AND y = 1, 1L, 0L)")).as("tp"),
        sum(expr("IF(pred = 1 AND y = 0, 1L, 0L)")).as("fp"),
        sum(expr("IF(pred = 0 AND y = 1, 1L, 0L)")).as("fn"),
        sum(expr("IF(pred = 0 AND y = 0, 1L, 0L)")).as("tn"),
        first("w1_micro").as("w1_micro"), first("w2_micro").as("w2_micro"))
      .withColumn("acc_permille", expr("(tp + tn) * 1000 div n_eval"))
      .select("source", "n_eval", "tp", "fp", "fn", "tn", "acc_permille",
        "w1_micro", "w2_micro")
      .orderBy("source")
  }

  private val q286Sql =
    s"""WITH ${ProbeModel.duckFeatAndWeights},
       |ev AS (SELECT f.source, f.y,
       |   CASE WHEN w.w0_micro + w.w1_micro * f.x1 + w.w2_micro * f.x2 >= 500000
       |     THEN 1 ELSE 0 END AS pred,
       |   w.w1_micro, w.w2_micro
       |  FROM feat f CROSS JOIN wt w WHERE f.bkt >= 80)
       |SELECT source, count(*) AS n_eval,
       | CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       | CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       | CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       | CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       | CAST((sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
       |   + sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)) * 1000
       |   // count(*) AS BIGINT) AS acc_permille,
       | any_value(w1_micro) AS w1_micro, any_value(w2_micro) AS w2_micro
       |FROM ev GROUP BY source ORDER BY source""".stripMargin

  // q294: LEAVE-ONE-OUT TARGET ENCODING + LEAKAGE DELTA — target
  // encoding (replace a category by its label mean) is the classic
  // high-cardinality featurizer, and its classic BUG: the naive encoding
  // includes each row's OWN label, so the feature "predicts" the label
  // by construction and the model overfits silently. The LOO form
  // (sum_y − y_i)/(n − 1) removes self-leakage with the SAME one
  // aggregation + broadcast join-back (no second pass). The deliverable
  // is the leakage priced: squared correlation of encoding vs label for
  // both forms (exact integer moments; ρ² staged through the q279
  // slope-product trick) — naive minus LOO IS the self-leakage, visible
  // even on a fixture where sources barely differ. Per-source rows carry
  // the encodings; the corpus-level ρ²s ride along as constants.
  private def q294(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("y", expr("IF(lang = 'en', 1L, 0L)"))
    val cat = docs.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val enc = docs.join(broadcast(cat), Seq("source"))
      .withColumn("naive_micro", expr("CAST(sy AS DECIMAL(38,0)) * 1000000 div n"))
      .withColumn("loo_micro", expr("CAST(sy - y AS DECIMAL(38,0)) * 1000000 div (n - 1)"))
    def rho2(xcol: String) = {
      // ρ²(x, y) staged exactly as q279: (Cxy·1000 div Cxx)·Cxy div Cyy
      s"""CASE WHEN cxx_$xcol > 0 AND cyy > 0 THEN
         | CAST(CAST(cxy_$xcol * 1000 div cxx_$xcol AS DECIMAL(38,0))
         |   * cxy_$xcol div cyy AS BIGINT)
         |ELSE 0L END""".stripMargin
    }
    val mom = enc.agg(count(lit(1)).as("nn"),
        sum("naive_micro").as("sa"), sum("loo_micro").as("sl"), sum("y").as("syy"),
        sum(expr("CAST(naive_micro AS DECIMAL(38,0)) * naive_micro")).as("saa"),
        sum(expr("CAST(loo_micro AS DECIMAL(38,0)) * loo_micro")).as("sll"),
        sum(expr("CAST(naive_micro AS DECIMAL(38,0)) * y")).as("say"),
        sum(expr("CAST(loo_micro AS DECIMAL(38,0)) * y")).as("sly"))
      .withColumn("cxx_naive", expr("nn * saa - CAST(sa AS DECIMAL(38,0)) * sa"))
      .withColumn("cxy_naive", expr("nn * say - CAST(sa AS DECIMAL(38,0)) * syy"))
      .withColumn("cxx_loo", expr("nn * sll - CAST(sl AS DECIMAL(38,0)) * sl"))
      .withColumn("cxy_loo", expr("nn * sly - CAST(sl AS DECIMAL(38,0)) * syy"))
      .withColumn("cyy", expr("nn * CAST(syy AS DECIMAL(38,0)) - CAST(syy AS DECIMAL(38,0)) * syy"))
      .withColumn("r2_naive_permille", expr(rho2("naive")))
      .withColumn("r2_loo_permille", expr(rho2("loo")))
      .select(col("r2_naive_permille"), col("r2_loo_permille"),
        expr("r2_naive_permille - r2_loo_permille").as("leak_delta_permille"))
    cat.crossJoin(broadcast(mom))
      .select(col("source"), col("n"), col("sy"),
        expr("CAST(CAST(sy AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").as("naive_enc_micro"),
        col("r2_naive_permille"), col("r2_loo_permille"), col("leak_delta_permille"))
      .orderBy("source")
  }

  private val q294Sql =
    """WITH docs AS (SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |cat AS (SELECT source, count(*) AS n, CAST(sum(y) AS HUGEINT) AS sy
      |  FROM docs GROUP BY 1),
      |enc AS (SELECT d.y, c.sy * 1000000 // c.n AS naive_micro,
      |   (c.sy - d.y) * 1000000 // (c.n - 1) AS loo_micro
      |  FROM docs d JOIN cat c ON d.source = c.source),
      |mom AS (SELECT count(*) AS nn,
      |   sum(naive_micro) AS sa, sum(loo_micro) AS sl, CAST(sum(y) AS HUGEINT) AS syy,
      |   sum(naive_micro * naive_micro) AS saa, sum(loo_micro * loo_micro) AS sll,
      |   sum(naive_micro * y) AS say, sum(loo_micro * y) AS sly
      |  FROM enc),
      |cc AS (SELECT nn * saa - sa * sa AS cxx_naive, nn * say - sa * syy AS cxy_naive,
      |   nn * sll - sl * sl AS cxx_loo, nn * sly - sl * syy AS cxy_loo,
      |   nn * syy - syy * syy AS cyy FROM mom),
      |r2 AS (SELECT
      |   CASE WHEN cxx_naive > 0 AND cyy > 0 THEN
      |    CAST(CAST(cxy_naive * 1000 // cxx_naive AS HUGEINT) * cxy_naive // cyy AS BIGINT)
      |   ELSE 0 END AS r2_naive_permille,
      |   CASE WHEN cxx_loo > 0 AND cyy > 0 THEN
      |    CAST(CAST(cxy_loo * 1000 // cxx_loo AS HUGEINT) * cxy_loo // cyy AS BIGINT)
      |   ELSE 0 END AS r2_loo_permille
      |  FROM cc)
      |SELECT c.source, c.n, CAST(c.sy AS BIGINT) AS sy,
      | CAST(c.sy * 1000000 // c.n AS BIGINT) AS naive_enc_micro,
      | r.r2_naive_permille, r.r2_loo_permille,
      | r.r2_naive_permille - r.r2_loo_permille AS leak_delta_permille
      |FROM cat c CROSS JOIN r2 r ORDER BY c.source""".stripMargin

  // q295: HILL TAIL-INDEX ESTIMATOR — q285 fits the Zipf slope over the
  // HEAD (top-100 ranks); the Hill estimator is the tail counterpart,
  // the MLE of the Pareto exponent from the top-k ORDER STATISTICS:
  // H = (1/k)·Σ ln(x_(i)/x_(k+1)), α̂ = 1/H. A source whose document
  // sizes have α < 2 has infinite-variance tails — partition planners
  // (q138 salting, q247 batch balancing) need to know BEFORE sizing by
  // mean·count. Logs are the shared bit-length fixed point; the
  // ln2-rescale and the 1/H inversion are staged integer divisions.
  // Per-source top-(k+1) via ranked windows (parallel across sources),
  // 20-row collapse.
  private def q295(s: SparkSession, d: String): DataFrame = {
    val k = 10
    val w = Window.partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
    documents(s, d)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k + 1)
      .withColumn("lx", expr(sl2m("n_chars")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_top"),
        sum(when(col("r") <= k, col("lx")).otherwise(0L)).as("sum_top_l2m"),
        max(when(col("r") === k + 1, col("lx")).otherwise(0L)).as("thresh_l2m"),
        max(when(col("r") === k + 1, col("n_chars")).otherwise(0L)).as("x_thresh"))
      .withColumn("h2_milli", expr(s"(sum_top_l2m - $k * thresh_l2m) div $k"))
      .withColumn("h_nat_milli", expr("h2_milli * 693147 div 1000000"))
      .withColumn("alpha_milli", expr(
        "CASE WHEN h_nat_milli > 0 THEN 1000000 div h_nat_milli ELSE 0L END"))
      .select("source", "n_top", "x_thresh", "h2_milli", "alpha_milli")
      .orderBy("source")
  }

  private val q295Sql = {
    val lx = dl2m("n_chars")
    s"""WITH r AS (SELECT source, n_chars, $lx AS lx,
       |   row_number() OVER (PARTITION BY source
       |     ORDER BY n_chars DESC, doc_id) AS r
       |  FROM documents),
       |t AS (SELECT source, count(*) AS n_top,
       |   CAST(sum(CASE WHEN r <= 10 THEN lx ELSE 0 END) AS BIGINT) AS sum_top_l2m,
       |   CAST(max(CASE WHEN r = 11 THEN lx ELSE 0 END) AS BIGINT) AS thresh_l2m,
       |   CAST(max(CASE WHEN r = 11 THEN n_chars ELSE 0 END) AS BIGINT) AS x_thresh
       |  FROM r WHERE r <= 11 GROUP BY 1),
       |h AS (SELECT *, (sum_top_l2m - 10 * thresh_l2m) // 10 AS h2_milli FROM t),
       |h2 AS (SELECT *, h2_milli * 693147 // 1000000 AS h_nat_milli FROM h)
       |SELECT source, n_top, x_thresh, h2_milli,
       | CASE WHEN h_nat_milli > 0 THEN 1000000 // h_nat_milli ELSE 0 END AS alpha_milli
       |FROM h2 ORDER BY source""".stripMargin
  }

  // q296: EMPIRICAL-BAYES RATE SHRINKAGE — the small-strata estimation
  // fix every per-source rate report (q102 quality, q152 balance, q212
  // Wilson ranking) quietly needs: a source with 25 docs and 60% English
  // is NOT believably 60% when the corpus runs 43% — the beta-binomial
  // prior fitted ACROSS sources by method of moments pulls each rate
  // toward the pooled mean with strength M (the prior's pseudo-count),
  // M = p̄(1−p̄)/Var_between − 1. Everything is the repo's exact
  // fixed-point: p̄ and per-source rates in micro (floored), the
  // between-source variance from integer moments, M in milli, and the
  // shrunken rate (x·1e3 + M·p̄)/(n·1e3 + M) as one staged division —
  // Wilson (q212) bounds ONE source's uncertainty, this BORROWS strength
  // across sources, and the report carries both raw and shrunk so the
  // pull is auditable. One doc-grain collapse + 20-row algebra.
  private def q296(s: SparkSession, d: String): DataFrame = {
    val cat = documents(s, d)
      .withColumn("y", expr("IF(lang = 'en', 1L, 0L)"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("y").as("x"))
      .withColumn("p_micro", expr("x * 1000000 div n"))
    val prior = cat.agg(count(lit(1)).as("k"), sum("n").as("sn"), sum("x").as("sx"),
        sum(expr("CAST(p_micro AS DECIMAL(38,0)) * p_micro")).as("spp"),
        sum("p_micro").as("sp"))
      .withColumn("pbar_micro", expr("CAST(sx AS DECIMAL(38,0)) * 1000000 div sn"))
      // between-source variance of the per-source rates, micro^2
      .withColumn("var_micro2", expr(
        "(k * spp - CAST(sp AS DECIMAL(38,0)) * sp) div (k * (k - 1))"))
      // M = pbar(1-pbar)/var - 1, in milli pseudo-docs (floored, >= 0)
      .withColumn("m_milli", expr(
        """CASE WHEN var_micro2 > 0 THEN
          | greatest(0L, CAST(CAST(pbar_micro AS DECIMAL(38,0))
          |   * (1000000 - pbar_micro) div var_micro2 * 1000 - 1000 AS BIGINT))
          |ELSE 0L END""".stripMargin))
      .select("pbar_micro", "var_micro2", "m_milli")
    cat.crossJoin(broadcast(prior))
      .withColumn("shrunk_micro", expr(
        "CAST((CAST(x AS DECIMAL(38,0)) * 1000000000 + CAST(m_milli AS DECIMAL(38,0)) * pbar_micro) " +
          "div (n * 1000 + m_milli) AS BIGINT)"))
      .select(col("source"), col("n"), col("x"),
        expr("CAST(p_micro AS BIGINT)").as("raw_micro"), col("shrunk_micro"),
        expr("CAST(pbar_micro AS BIGINT)").as("pbar_micro"), col("m_milli"))
      .orderBy("source")
  }

  private val q296Sql =
    """WITH cat AS (SELECT source, count(*) AS n,
      |   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM documents GROUP BY 1),
      |p AS (SELECT *, CAST(x AS HUGEINT) * 1000000 // n AS p_micro FROM cat),
      |pr AS (SELECT count(*) AS k, CAST(sum(n) AS HUGEINT) AS sn,
      |   CAST(sum(x) AS HUGEINT) AS sx, sum(CAST(p_micro AS HUGEINT) * p_micro) AS spp,
      |   CAST(sum(p_micro) AS HUGEINT) AS sp FROM p),
      |pb AS (SELECT *, sx * 1000000 // sn AS pbar_micro,
      |   (k * spp - sp * sp) // (k * (k - 1)) AS var_micro2 FROM pr),
      |mm AS (SELECT pbar_micro, var_micro2,
      |   CASE WHEN var_micro2 > 0 THEN
      |    greatest(0, CAST(pbar_micro * (1000000 - pbar_micro) // var_micro2
      |      * 1000 - 1000 AS BIGINT))
      |   ELSE 0 END AS m_milli
      |  FROM pb)
      |SELECT c.source, c.n, c.x, CAST(c.p_micro AS BIGINT) AS raw_micro,
      | CAST((CAST(c.x AS HUGEINT) * 1000000000 + CAST(m.m_milli AS HUGEINT) * m.pbar_micro)
      |   // (c.n * 1000 + m.m_milli) AS BIGINT) AS shrunk_micro,
      | CAST(m.pbar_micro AS BIGINT) AS pbar_micro, m.m_milli
      |FROM p c CROSS JOIN mm m ORDER BY c.source""".stripMargin

  // q298: PROBE ROC-AUC — the third leg of the classifier-eval triad
  // (q286 accuracy at one threshold, q292 calibration of the scores;
  // this: DISCRIMINATION across ALL thresholds). The scale fact that
  // makes it exact and cheap: AUC is the Mann–Whitney U of the scores
  // (AUC = U/(nP·nN)) — so the q280 value-grain midrank machinery
  // computes it with one (score)-grain collapse and one bounded window,
  // never ranking rows, ties handled exactly by doubled midranks. Gini
  // coefficient of discrimination = 2·AUC − 1 rides along.
  private def q298(s: SparkSession, d: String): DataFrame = {
    val feat = ProbeModel.features(s, d)
    val scored = feat.filter(col("bkt") >= 80)
      .crossJoin(broadcast(ProbeModel.weights(feat)))
      .withColumn("p", expr(
        "greatest(0L, least(1000000L, w0_micro + w1_micro * x1 + w2_micro * x2))"))
    val vg = scored.groupBy("p")
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("cp"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("cn"))
      .withColumn("cnt", col("cp") + col("cn"))
    val w = Window.partitionBy(pmod(col("p"), lit(1L))).orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    vg.withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("mr2", expr("2 * cum + cnt + 1"))
      .groupBy(lit(1).as("g"))
      .agg(sum("cp").as("n_pos"), sum("cn").as("n_neg"),
        sum(expr("CAST(cp AS DECIMAL(38,0)) * mr2")).as("r2p"))
      .withColumn("u2", expr(
        "CAST(r2p - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS BIGINT)"))
      .withColumn("auc_micro", expr(
        "CAST(CAST(u2 AS DECIMAL(38,0)) * 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
      .withColumn("gini_micro", expr("2 * auc_micro - 1000000"))
      .select("n_pos", "n_neg", "auc_micro", "gini_micro")
  }

  private val q298Sql =
    s"""WITH ${ProbeModel.duckFeatAndWeights},
       |sc AS (SELECT f.y,
       |   greatest(0, least(1000000, w.w0_micro + w.w1_micro * f.x1 + w.w2_micro * f.x2))
       |     AS p
       |  FROM feat f CROSS JOIN wt w WHERE f.bkt >= 80),
       |vg AS (SELECT p,
       |   CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |   CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn
       |  FROM sc GROUP BY 1),
       |cm AS (SELECT *, cp + cn AS cnt,
       |   COALESCE(sum(cp + cn) OVER (ORDER BY p
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM vg),
       |ag AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos, CAST(sum(cn) AS BIGINT) AS n_neg,
       |   sum(CAST(cp AS HUGEINT) * (2 * cum + cnt + 1)) AS r2p FROM cm),
       |u AS (SELECT *, CAST(r2p - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS u2
       |  FROM ag)
       |SELECT n_pos, n_neg,
       | CAST(CAST(u2 AS HUGEINT) * 1000000 // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
       |   AS auc_micro,
       | 2 * CAST(CAST(u2 AS HUGEINT) * 1000000 // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
       |   - 1000000 AS gini_micro
       |FROM u""".stripMargin

  // q299: COHEN'S KAPPA INTER-RATER AGREEMENT — when TWO labelers
  // disagree (here: the zero-train stopword heuristic x1 ≥ 2 vs the
  // trained probe, and each vs truth), raw agreement over-credits chance:
  // two raters that both say "English" 80% of the time agree 68% by
  // luck alone. κ = (p_o − p_e)/(1 − p_e) corrects by the marginals —
  // exact by cross-multiplication: κ_milli = (n(a+d) − E)·1000/(n² − E),
  // E = (a+b)(a+c)+(c+d)(b+d), no probability ever materialized. One
  // pass builds all three pairings' confusion cells; the report is a
  // 3-row grid. The pipeline read: κ(heuristic, probe) high says the
  // cheap rater can pre-filter for the expensive one.
  private def q299(s: SparkSession, d: String): DataFrame = {
    val feat = ProbeModel.features(s, d)
    val scored = feat.filter(col("bkt") >= 80)
      .crossJoin(broadcast(ProbeModel.weights(feat)))
      .withColumn("h", expr("IF(x1 >= 2, 1L, 0L)"))
      .withColumn("b", expr(
        "IF(w0_micro + w1_micro * x1 + w2_micro * x2 >= 500000, 1L, 0L)"))
    val pairs = scored.select(explode(expr(
      """array(
        | named_struct('pair', 'heuristic_vs_probe', 'r1', h, 'r2', b),
        | named_struct('pair', 'heuristic_vs_truth', 'r1', h, 'r2', y),
        | named_struct('pair', 'probe_vs_truth', 'r1', b, 'r2', y))""".stripMargin))
      .as("t"))
      .select(col("t.pair").as("pair"), col("t.r1").as("r1"), col("t.r2").as("r2"))
    pairs.groupBy("pair")
      .agg(count(lit(1)).as("n"),
        sum(expr("IF(r1 = 1 AND r2 = 1, 1L, 0L)")).as("a"),
        sum(expr("IF(r1 = 1 AND r2 = 0, 1L, 0L)")).as("b"),
        sum(expr("IF(r1 = 0 AND r2 = 1, 1L, 0L)")).as("c"),
        sum(expr("IF(r1 = 0 AND r2 = 0, 1L, 0L)")).as("d"))
      .withColumn("e", expr(
        "CAST(a + b AS DECIMAL(38,0)) * (a + c) + CAST(c + d AS DECIMAL(38,0)) * (b + d)"))
      .withColumn("po_milli", expr("(a + d) * 1000 div n"))
      .withColumn("kappa_milli", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * n - e != 0 THEN
          | CAST((n * CAST(a + d AS DECIMAL(38,0)) - e) * 1000
          |   div (CAST(n AS DECIMAL(38,0)) * n - e) AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select("pair", "n", "a", "b", "c", "d", "po_milli", "kappa_milli")
      .orderBy("pair")
  }

  private val q299Sql =
    s"""WITH ${ProbeModel.duckFeatAndWeights},
       |sc AS (SELECT f.y, CASE WHEN f.x1 >= 2 THEN 1 ELSE 0 END AS h,
       |   CASE WHEN w.w0_micro + w.w1_micro * f.x1 + w.w2_micro * f.x2 >= 500000
       |     THEN 1 ELSE 0 END AS b
       |  FROM feat f CROSS JOIN wt w WHERE f.bkt >= 80),
       |pairs AS (
       |  SELECT 'heuristic_vs_probe' AS pair, h AS r1, b AS r2 FROM sc
       |  UNION ALL SELECT 'heuristic_vs_truth', h, y FROM sc
       |  UNION ALL SELECT 'probe_vs_truth', b, y FROM sc),
       |cells AS (SELECT pair, count(*) AS n,
       |   CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |   CAST(sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |   CAST(sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |   CAST(sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM pairs GROUP BY 1),
       |k AS (SELECT *, CAST(a + b AS HUGEINT) * (a + c)
       |   + CAST(c + d AS HUGEINT) * (b + d) AS e FROM cells)
       |SELECT pair, n, a, b, c, d,
       | (a + d) * 1000 // n AS po_milli,
       | CASE WHEN CAST(n AS HUGEINT) * n - e != 0 THEN
       |  CAST((n * CAST(a + d AS HUGEINT) - e) * 1000
       |    // (CAST(n AS HUGEINT) * n - e) AS BIGINT)
       | ELSE 0 END AS kappa_milli
       |FROM k ORDER BY pair""".stripMargin

  // q302: SPEARMAN RANK CORRELATION — the monotone-association member of
  // the correlation family (q172 is Pearson on raw values: linear only;
  // q261 RBO compares top-k LISTS): does document size track verbosity
  // (mean token length) per source, in a form outliers cannot bend?
  // ρ_s = Pearson on midranks; doubled midranks 2·rank_min + t − 1 keep
  // tie averages integer (the q280 convention), the per-source ranking
  // windows parallelize across sources, ρ² lands via the q279 staged
  // product, and the sign is carried separately so the report is
  // (sign, ρ²) — never a float. Shape: two rank windows per source
  // partition + one moments collapse.
  private def q302(s: SparkSession, d: String): DataFrame = {
    val feat = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("x", col("n_chars"))
      .withColumn("y", expr(
        "CAST(aggregate(toks, 0L, (acc, t) -> acc + length(t)) AS BIGINT) * 10 " +
          "div CAST(size(toks) AS BIGINT)"))
      .select("source", "doc_id", "x", "y")
    val ranked = feat
      .withColumn("rx2", expr("2 * rank() OVER (PARTITION BY source ORDER BY x) " +
        "+ count(1) OVER (PARTITION BY source, x) - 1"))
      .withColumn("ry2", expr("2 * rank() OVER (PARTITION BY source ORDER BY y) " +
        "+ count(1) OVER (PARTITION BY source, y) - 1"))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("rx2").as("sx"), sum("ry2").as("sy"),
        sum(expr("CAST(rx2 AS DECIMAL(38,0)) * rx2")).as("sxx"),
        sum(expr("CAST(rx2 AS DECIMAL(38,0)) * ry2")).as("sxy"),
        sum(expr("CAST(ry2 AS DECIMAL(38,0)) * ry2")).as("syy"))
      .withColumn("cxx", expr("n_docs * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("cxy", expr("n_docs * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("cyy", expr("n_docs * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("rho_sign", expr("CAST(sign(cxy) AS BIGINT)"))
      .withColumn("rho2_permille", expr(
        """CASE WHEN cxx > 0 AND cyy > 0 THEN
          | CAST(CAST(cxy * 1000 div cxx AS DECIMAL(38,0)) * cxy div cyy AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .select("source", "n_docs", "rho_sign", "rho2_permille")
      .orderBy("source")
  }

  private val q302Sql =
    """WITH feat AS (SELECT source, n_chars AS x,
      |   list_sum(list_transform(string_split(text, ' '), t -> length(t))) * 10
      |     // len(string_split(text, ' ')) AS y
      |  FROM documents),
      |rk AS (SELECT source,
      |   2 * rank() OVER (PARTITION BY source ORDER BY x)
      |     + count(*) OVER (PARTITION BY source, x) - 1 AS rx2,
      |   2 * rank() OVER (PARTITION BY source ORDER BY y)
      |     + count(*) OVER (PARTITION BY source, y) - 1 AS ry2
      |  FROM feat),
      |mo AS (SELECT source, count(*) AS n_docs,
      |   CAST(sum(rx2) AS HUGEINT) AS sx, CAST(sum(ry2) AS HUGEINT) AS sy,
      |   sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
      |   sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy,
      |   sum(CAST(ry2 AS HUGEINT) * ry2) AS syy
      |  FROM rk GROUP BY 1),
      |cc AS (SELECT source, n_docs,
      |   n_docs * sxx - sx * sx AS cxx, n_docs * sxy - sx * sy AS cxy,
      |   n_docs * syy - sy * sy AS cyy FROM mo)
      |SELECT source, n_docs, CAST(sign(cxy) AS BIGINT) AS rho_sign,
      | CASE WHEN cxx > 0 AND cyy > 0 THEN
      |  CAST(CAST(cxy * 1000 // cxx AS HUGEINT) * cxy // cyy AS BIGINT)
      | ELSE 0 END AS rho2_permille
      |FROM cc ORDER BY source""".stripMargin

  // q326: MOORE–LEWIS CONTRASTIVE DATA SELECTION — the canonical
  // "pick data that looks like my domain" operator (Moore & Lewis, ACL
  // 2010: select by the CROSS-ENTROPY DIFFERENCE between an in-domain
  // LM and a general LM; the ancestor of every modern domain-upsampling
  // recipe). q283 scores held-out docs under ONE LM; this trains TWO
  // bigram stupid-backoff LMs on the same 80% split — in-domain =
  // English training docs, out-domain = the rest — and ranks every
  // held-out doc by gap = nll_in − nll_out (negative ⇒ reads like the
  // domain ⇒ select). The gap is banded on a SHIFTED axis
  // ((gap + 20000) div 2000, gap ∈ [−20000, 20000] since each
  // per-bigram nll is clamped to [0, 20000]) so the truncating division
  // never sees a negative operand — the cross-engine seam. Exact
  // integers throughout: the shared bit-length log2 (sl2m/dl2m), the
  // q283 backoff penalty 1322 milli = −1000·log2(0.4), OOV floor 20000.
  // 100 TB shape: the two LMs are token-grain Zipf-small count tables
  // (the q283 posture, built twice); the eval explode happens ONCE and
  // feeds both scorers; everything after is doc-grain then a ≤
  // langs×21-cell band grid.
  private def q326(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).withColumn("bkt", pctBucket(col("doc_id")))
    val evalBg = graft.Caches.persist(base.filter(col("bkt") >= 80)
      .withColumn("toks", split(concat(col("text"), lit(" qq table")), " "))
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"))
        .as("bg"))
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .withColumn("w2", expr("split(bg, ' ')[1]")))
    def nllPerDoc(inDomain: Boolean, out: String): DataFrame = {
      val cond = if (inDomain) col("lang") === "en" else col("lang") =!= "en"
      val tr = base.filter(col("bkt") < 80 && cond)
      val toks = tr.select(explode(split(col("text"), " ")).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
      val tot = toks.agg(count(lit(1)).as("t"))
      val bg = tr.withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"))
          .as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cb"))
      evalBg
        .join(bg, Seq("bg"), "left")
        .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("cu", "cu1"),
          Seq("w1"), "left")
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("cu", "cu2"),
          Seq("w2"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("nll_milli", expr(
          s"""CASE WHEN cb IS NOT NULL THEN ${sl2m("cu1")} - ${sl2m("cb")}
             |WHEN cu2 IS NOT NULL THEN ${sl2m("t")} - ${sl2m("cu2")} + 1322
             |ELSE 20000L END""".stripMargin))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_bg"), sum("nll_milli").as("snll"))
        .select(col("doc_id"), col("lang"), expr("snll div n_bg").as(out))
    }
    nllPerDoc(inDomain = true, "nll_in")
      .join(nllPerDoc(inDomain = false, "nll_out"), Seq("doc_id", "lang"))
      .withColumn("gap_milli", col("nll_in") - col("nll_out"))
      // band on a winsorized, SHIFTED axis: |gap| is clamped to 20000
      // first (at corpus scale the backoff path's sl2m(t) term can
      // exceed the OOV floor, so the raw gap is not magnitude-bounded),
      // then shifted nonnegative so the truncating division never sees
      // a negative operand — the cross-engine seam. Bands ∈ [0, 20].
      .withColumn("band", expr(
        "(greatest(least(gap_milli, 20000L), -20000L) + 20000) div 2000"))
      .groupBy("lang", "band")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(gap_milli <= 0 AS BIGINT)")).as("n_selected"),
        sum("gap_milli").as("sum_gap_milli"))
      .orderBy("lang", "band")
  }

  private def mlNllCte(p: String, langCond: String): String =
    s"""${p}tr AS (SELECT doc_id, text FROM documents WHERE $duckTrain
       |  AND $langCond),
       |${p}toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM ${p}tr),
       |${p}uni AS (SELECT tok, count(*) AS cu FROM ${p}toks GROUP BY tok),
       |${p}tot AS (SELECT count(*) AS t FROM ${p}toks),
       |${p}bg AS (SELECT bg, count(*) AS cb FROM (
       |   SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
       |     i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
       |   FROM ${p}tr WHERE len(string_split(text, ' ')) >= 2) GROUP BY bg),
       |${p}sc AS (SELECT e.doc_id, e.lang,
       |   CASE WHEN b.cb IS NOT NULL THEN ${dl2m("u1.cu")} - ${dl2m("b.cb")}
       |    WHEN u2.cu IS NOT NULL THEN ${dl2m("t.t")} - ${dl2m("u2.cu")} + 1322
       |    ELSE 20000 END AS nll_milli
       |  FROM ebg e LEFT JOIN ${p}bg b USING (bg)
       |   LEFT JOIN ${p}uni u1 ON u1.tok = e.w1
       |   LEFT JOIN ${p}uni u2 ON u2.tok = e.w2
       |   CROSS JOIN ${p}tot t),
       |${p}doc AS (SELECT doc_id, lang, sum(nll_milli) // count(*) AS nll
       |  FROM ${p}sc GROUP BY 1, 2)""".stripMargin

  private val q326Sql =
    s"""WITH ev AS (SELECT doc_id, lang, text || ' qq table' AS t2 FROM documents
       |  WHERE $duckEval),
       |ebg AS (SELECT doc_id, lang, bg,
       |   string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
       |  FROM (SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(string_split(t2, ' '))),
       |      i -> string_split(t2, ' ')[i] || ' ' || string_split(t2, ' ')[i+1])) AS bg
       |   FROM ev)),
       |${mlNllCte("in_", "lang = 'en'")},
       |${mlNllCte("out_", "lang <> 'en'")},
       |g AS (SELECT i.lang, i.nll - o.nll AS gap_milli
       |  FROM in_doc i JOIN out_doc o USING (doc_id, lang))
       |SELECT lang,
       | CAST((greatest(least(gap_milli, 20000), -20000) + 20000) // 2000
       |   AS BIGINT) AS band,
       | count(*) AS n_docs,
       | CAST(sum(CASE WHEN gap_milli <= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_selected,
       | CAST(sum(gap_milli) AS BIGINT) AS sum_gap_milli
       |FROM g GROUP BY 1, 2 ORDER BY lang, band""".stripMargin

  // q334: THEIL INDEX + BETWEEN/WITHIN DECOMPOSITION — what q284's
  // Gini/Lorenz cannot do: Theil's entropy-based inequality is EXACTLY
  // ADDITIVE across a partition (T = T_between + T_within, Theil 1967),
  // so the one number splits into "sources are unequal to each other"
  // vs "docs are unequal inside their source" — the curation decision
  // (rebalance the MIX vs cap outlier DOCS) hangs on which term
  // dominates. Computed in log2 milli-bits (declared unit; natural-log
  // Theil is this × ln2). Staging: every log argument is a RATIO in ppm
  // (the q328 rule — x·10⁶·n div X is a bounded LONG after one
  // DECIMAL(38) cross-multiplied division; no corpus-sized value ever
  // meets bin()), the log of the 10⁶ origin is the same fixed-point
  // expression applied to the literal, weighted sums stage DECIMAL(38)
  // and divide ONCE by the mass, and every term that is nonnegative by
  // Gibbs' inequality is clamped at 0 to absorb the ±0.086-bit
  // interpolation ulp. Zero-length docs carry no mass and are excluded
  // (mirrored). 100 TB shape: ONE doc-grain pass with two broadcast
  // joins (group stats ≤ sources, global stats 1 row); the
  // decomposition itself is group-grid arithmetic.
  private def q334(s: SparkSession, d: String): DataFrame = {
    val l6 = sl2m("1000000")
    val docs = documents(s, d).select(col("source"), col("n_chars").as("x"))
      .filter(col("x") > 0)
    val gstats = docs.groupBy("source")
      .agg(count(lit(1)).as("ng"), sum("x").as("xg"))
    graft.Caches.persist(gstats)
    val tot = gstats.agg(sum("ng").as("n"), sum("xg").as("xx"))
    val contrib = docs
      .join(broadcast(gstats), "source")
      .crossJoin(broadcast(tot))
      .withColumn("r", expr(
        "CAST(CAST(x AS DECIMAL(38,0)) * 1000000 * n div xx AS BIGINT)"))
      .withColumn("rg", expr(
        "CAST(CAST(x AS DECIMAL(38,0)) * 1000000 * ng div xg AS BIGINT)"))
      .withColumn("cg", expr(
        s"CAST(x AS DECIMAL(38,0)) * (CASE WHEN r > 0 THEN ${sl2m("r")} - $l6 ELSE 0L END)"))
      .withColumn("cw", expr(
        s"CAST(x AS DECIMAL(38,0)) * (CASE WHEN rg > 0 THEN ${sl2m("rg")} - $l6 ELSE 0L END)"))
    val perGroup = contrib.groupBy("source")
      .agg(max("ng").as("n_docs"), max("xg").as("xg"), sum("cw").as("scw"))
      .withColumn("t_g_milli", expr(
        "greatest(CAST(scw div xg AS BIGINT), 0L)"))
    val tTotal = contrib.agg(sum("cg").as("scg"), max("xx").as("xx"))
      .withColumn("t_total_milli", expr(
        "greatest(CAST(scg div xx AS BIGINT), 0L)"))
      .select("t_total_milli")
    val shares = perGroup.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr(
        "CAST(CAST(xg AS DECIMAL(38,0)) * 1000000 div xx AS BIGINT)"))
      .withColumn("freq_ppm", expr(
        "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
    graft.Caches.persist(shares)
    val between = shares.agg(sum(expr(
      s"""CASE WHEN share_ppm > 0 AND freq_ppm > 0
         | THEN share_ppm * (${sl2m("share_ppm")} - ${sl2m("freq_ppm")})
         | ELSE 0L END""".stripMargin)).as("sb"))
      .withColumn("t_between_milli", expr("greatest(sb div 1000000, 0L)"))
      .select("t_between_milli")
    val within = shares.agg(sum(expr(
      "share_ppm * t_g_milli")).as("sw"))
      .withColumn("t_within_milli", expr("sw div 1000000"))
      .select("t_within_milli")
    shares
      .crossJoin(broadcast(tTotal))
      .crossJoin(broadcast(between))
      .crossJoin(broadcast(within))
      .select(col("source"), col("n_docs"), col("share_ppm"), col("freq_ppm"),
        col("t_g_milli"), col("t_total_milli"), col("t_between_milli"),
        col("t_within_milli"))
      .orderBy("source")
  }

  private val q334Sql = {
    val l6 = dl2m("1000000")
    s"""WITH docs AS (SELECT source, n_chars AS x FROM documents WHERE n_chars > 0),
       |gs AS (SELECT source, count(*) AS ng, sum(x) AS xg FROM docs GROUP BY 1),
       |tot AS (SELECT sum(ng) AS n, sum(xg) AS xx FROM gs),
       |ct AS (SELECT d.source, d.x, gs.ng, gs.xg, tot.n, tot.xx,
       |   CAST(CAST(d.x AS HUGEINT) * 1000000 * tot.n // tot.xx AS BIGINT) AS r,
       |   CAST(CAST(d.x AS HUGEINT) * 1000000 * gs.ng // gs.xg AS BIGINT) AS rg
       |  FROM docs d JOIN gs USING (source) CROSS JOIN tot),
       |cb AS (SELECT *,
       |   CAST(x AS HUGEINT) * (CASE WHEN r > 0 THEN ${dl2m("r")} - $l6 ELSE 0 END) AS cg,
       |   CAST(x AS HUGEINT) * (CASE WHEN rg > 0 THEN ${dl2m("rg")} - $l6 ELSE 0 END) AS cw
       |  FROM ct),
       |pg AS (SELECT source, max(ng) AS n_docs, max(xg) AS xg,
       |   greatest(CAST(sum(cw) // max(xg) AS BIGINT), 0) AS t_g_milli
       |  FROM cb GROUP BY 1),
       |tt AS (SELECT greatest(CAST(sum(cg) // max(xx) AS BIGINT), 0)
       |   AS t_total_milli FROM cb),
       |sh AS (SELECT pg.source, pg.n_docs, pg.t_g_milli,
       |   CAST(CAST(pg.xg AS HUGEINT) * 1000000 // tot.xx AS BIGINT) AS share_ppm,
       |   CAST(CAST(pg.n_docs AS HUGEINT) * 1000000 // tot.n AS BIGINT) AS freq_ppm
       |  FROM pg CROSS JOIN tot),
       |bt AS (SELECT greatest(sum(CASE WHEN share_ppm > 0 AND freq_ppm > 0
       |   THEN share_ppm * (${dl2m("share_ppm")} - ${dl2m("freq_ppm")})
       |   ELSE 0 END) // 1000000, 0) AS t_between_milli FROM sh),
       |wt AS (SELECT sum(share_ppm * t_g_milli) // 1000000 AS t_within_milli
       |  FROM sh)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, share_ppm, freq_ppm,
       | t_g_milli, t_total_milli,
       | CAST(t_between_milli AS BIGINT) AS t_between_milli,
       | CAST(t_within_milli AS BIGINT) AS t_within_milli
       |FROM sh CROSS JOIN tt CROSS JOIN bt CROSS JOIN wt
       |ORDER BY source""".stripMargin
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q334_theil_decomposition" -> (q334 _),
    "q326_moore_lewis" -> (q326 _),
    "q283_bigram_lm" -> (q283 _),
    "q284_gini_concentration" -> (q284 _),
    "q285_zipf_slope" -> (q285 _),
    "q286_linear_probe" -> (q286 _),
    "q294_loo_encoding" -> (q294 _),
    "q295_hill_tail" -> (q295 _),
    "q296_eb_shrinkage" -> (q296 _),
    "q298_probe_auc" -> (q298 _),
    "q299_cohen_kappa" -> (q299 _),
    "q302_spearman_rank" -> (q302 _))

  override val oracles: Map[String, String] = Map(
    "q334_theil_decomposition" -> q334Sql,
    "q326_moore_lewis" -> q326Sql,
    "q283_bigram_lm" -> q283Sql,
    "q284_gini_concentration" -> q284Sql,
    "q285_zipf_slope" -> q285Sql,
    "q286_linear_probe" -> q286Sql,
    "q294_loo_encoding" -> q294Sql,
    "q295_hill_tail" -> q295Sql,
    "q296_eb_shrinkage" -> q296Sql,
    "q298_probe_auc" -> q298Sql,
    "q299_cohen_kappa" -> q299Sql,
    "q302_spearman_rank" -> q302Sql)
}
