package graft.operators

import graft.{Caches, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus / dataset AUDIT operators: the checks a pipeline runs over a
  * candidate corpus or staged batch BEFORE it is allowed downstream —
  * PII exposure (q105), integrity constraints on a staged ingest batch
  * (q110), character-class composition (q111), and cross-source content
  * overlap (q112). These complement [[CurationOps]] (which selects and
  * shapes) and [[TextAnalysis]] (which scores): an audit's output is a
  * verdict report, not a transformed corpus.
  *
  * The fixture text is clean lowercase prose (the driver's
  * `documents.parquet` tables), so rules that need signal
  * decorate the input DETERMINISTICALLY from `doc_id` (the q104
  * snapshot-derivation precedent) — both engines derive the identical
  * decorated corpus, so every audit path is exercised and hash-checked.
  * Decoration moduli are coprime to 20 on purpose: `source` is
  * `src(doc_id % 20)`, so a `% 4` or `% 5` rule would degenerate to
  * all-or-nothing per source and the per-source report would stop
  * discriminating.
  */
object AuditOps extends QueryPack {
  import Tables._

  // q105: PII DETECTION + REDACTION audit. At 100 TB this is the
  // compliance gate: count PII spans per stratum and prove the redacted
  // corpus is what ships. Detection and redaction are ROW-LOCAL regexes
  // fused into the scan's codegen stage (regexp_extract_all /
  // regexp_replace are both codegen'd) — zero shuffle until the 20-row
  // per-source report. The redacted-length checksum pins the REDACTED
  // text (not just match counts) into the oracle hash, so an engine that
  // "detected" but mis-redacted would fail the compare. Regexes stay in
  // the character-class subset shared by Java regex and RE2 — no
  // lookahead/backrefs — so both engines match identical spans.
  private val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{4}"

  private def q105(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("t2", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now")))
          .when(col("doc_id") % 7 === 2, lit(" call 555-0199 today"))
          .otherwise(lit(""))))
      .withColumn("n_email", size(regexp_extract_all(col("t2"), lit(EmailRe), lit(0))))
      .withColumn("n_phone", size(regexp_extract_all(col("t2"), lit(PhoneRe), lit(0))))
      .withColumn("red_len", length(
        regexp_replace(regexp_replace(col("t2"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_phone") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"),
        sum("n_email").as("n_emails"),
        sum("n_phone").as("n_phones"),
        sum("red_len").as("red_chars"))
      .orderBy("source")

  private val q105Sql =
    s"""WITH dec AS (SELECT source, doc_id,
       |  text || CASE WHEN doc_id % 3 = 0
       |                 THEN ' contact user' || doc_id || '@example.com now'
       |               WHEN doc_id % 7 = 2 THEN ' call 555-0199 today'
       |               ELSE '' END AS t2
       | FROM documents),
       |det AS (SELECT source,
       |  len(regexp_extract_all(t2, '$EmailRe')) AS n_email,
       |  len(regexp_extract_all(t2, '$PhoneRe')) AS n_phone,
       |  length(regexp_replace(regexp_replace(t2, '$EmailRe', '<EMAIL>', 'g'),
       |         '$PhoneRe', '<PHONE>', 'g')) AS red_len
       | FROM dec)
       |SELECT source, count(*) AS n_docs,
       | CAST(sum(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS docs_with_pii,
       | CAST(sum(n_email) AS BIGINT) AS n_emails,
       | CAST(sum(n_phone) AS BIGINT) AS n_phones,
       | CAST(sum(red_len) AS BIGINT) AS red_chars
       |FROM det GROUP BY source ORDER BY source""".stripMargin

  // q110: CONSTRAINT AUDIT of a staged ingest batch — the Deequ-style
  // data-quality gate: uniqueness, referential integrity, range, and
  // domain checks, each reported as a (constraint, violation-count) row.
  // The fixture is clean, so the "staged batch" plants one violation
  // class per rule deterministically (dup keys via a re-appended slice,
  // broken FKs via an offset, etc.) — the audit must find EXACTLY the
  // planted counts. Scan discipline at 100 TB: ONE materialization per
  // fact table, not one per rule — the uniqueness groupBy on the key
  // carries the domain-check sum as a second aggregate (per-key sums
  // re-sum to the row-level count), and the two lineitem rules are two
  // conditional sums in a single aggregate, unpivoted to report rows
  // with stack(). Only the FK rule needs its own pass, because it is a
  // JOIN (anti-join against the dim; broadcast or bloom-prune the dim
  // key set — the q79 pattern — when it is small). The staged batch is
  // PERSISTED: its lineage is referenced by both the key-check and the
  // FK branch, and the union-of-slice construction would otherwise
  // re-scan orders once per reference (the unpersisted plan showed 4
  // orders scans). The report is metadata-sized at any corpus size.
  private def q110(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 97 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 89 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")))
    val batch = Caches.persist(
      o.unionAll(o.filter(col("o_orderkey") % 500 === 7)))
    val orderChecks = batch
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("c"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("bad_status"))
      // coalesce: on an EMPTY staged batch these sums are NULL while the
      // oracle's count(*) forms give 0 — the audit must report zero
      // violations, not null (the q95/q78 empty-input precedent)
      .agg(coalesce(sum(when(col("c") > 1, 1L).otherwise(0L)), lit(0L)).as("uk"),
        coalesce(sum("bad_status"), lit(0L)).as("sd"))
      .selectExpr("stack(2, 'orderkey_unique', uk, 'status_domain', sd)" +
        " AS (constraint_name, n_violations)")
    val fkCheck = batch
      .join(customer(s, d), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("custkey_fk").as("constraint_name"), col("n_violations"))
    val liChecks = lineitem(s, d)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 101 === 0, -col("l_quantity"))
          .otherwise(col("l_quantity")))
      .withColumn("l_extendedprice",
        when(col("l_orderkey") % 103 === 0, lit(0.0))
          .otherwise(col("l_extendedprice")))
      .agg(coalesce(sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)), lit(0L)).as("qr"),
        coalesce(sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)), lit(0L))
          .as("pp"))
      .selectExpr("stack(2, 'quantity_range', qr, 'price_positive', pp)" +
        " AS (constraint_name, n_violations)")
    orderChecks.unionAll(fkCheck).unionAll(liChecks)
      .orderBy("constraint_name")
  }

  private val q110Sql =
    """WITH o AS (SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 89 = 0 THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
      |  CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
      | FROM orders),
      |batch AS (SELECT * FROM o UNION ALL SELECT * FROM o WHERE o_orderkey % 500 = 7),
      |li AS (SELECT l_orderkey,
      |  CASE WHEN l_orderkey % 101 = 0 THEN -l_quantity ELSE l_quantity END AS l_quantity,
      |  CASE WHEN l_orderkey % 103 = 0 THEN 0.0 ELSE l_extendedprice END AS l_extendedprice
      | FROM lineitem)
      |SELECT 'orderkey_unique' AS constraint_name, CAST(count(*) AS BIGINT) AS n_violations
      | FROM (SELECT o_orderkey FROM batch GROUP BY o_orderkey HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'custkey_fk', CAST(count(*) AS BIGINT) FROM batch b
      | WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = b.o_custkey)
      |UNION ALL
      |SELECT 'quantity_range', CAST(count(*) AS BIGINT) FROM li
      | WHERE l_quantity < 1 OR l_quantity > 50
      |UNION ALL
      |SELECT 'status_domain', CAST(count(*) AS BIGINT) FROM batch
      | WHERE o_orderstatus NOT IN ('O', 'F', 'P')
      |UNION ALL
      |SELECT 'price_positive', CAST(count(*) AS BIGINT) FROM li
      | WHERE l_extendedprice <= 0
      |ORDER BY constraint_name""".stripMargin

  // q111: CHARACTER-CLASS composition profile — the cheap structural
  // quality signal (Gopher's symbol-to-word family): digit and
  // punctuation mass per stratum plus a symbol-heavy flag. Counting is
  // length(regexp_replace(·, keep-class-complement, '')) — row-local,
  // codegen, identical span semantics in both engines. The flag test is
  // INTEGER cross-multiplication ((digits+punct)·20 > chars ⟺ ratio
  // > 5%), the q92 precedent: no float division near the decision
  // boundary, so the flag can never flip between engines on rounding.
  private def q111(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("t2", concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" 1234 987 55"))
          .when(col("doc_id") % 7 === 1, lit(" !!! ?? .."))
          .otherwise(lit(""))))
      .withColumn("n", length(col("t2")))
      .withColumn("n_digit", length(regexp_replace(col("t2"), "[^0-9]", "")))
      .withColumn("n_punct", length(regexp_replace(col("t2"), "[^!?.,;:]", "")))
      .groupBy("source")
      .agg(sum("n").as("sum_chars"),
        sum("n_digit").as("sum_digits"),
        sum("n_punct").as("sum_punct"),
        sum(when((col("n_digit") + col("n_punct")) * 20 > col("n"), 1L)
          .otherwise(0L)).as("n_symbol_heavy"))
      .orderBy("source")

  private val q111Sql =
    """WITH dec AS (SELECT source,
      |  text || CASE WHEN doc_id % 3 = 0 THEN ' 1234 987 55'
      |               WHEN doc_id % 7 = 1 THEN ' !!! ?? ..'
      |               ELSE '' END AS t2
      | FROM documents),
      |m AS (SELECT source, length(t2) AS n,
      |  length(regexp_replace(t2, '[^0-9]', '', 'g')) AS n_digit,
      |  length(regexp_replace(t2, '[^!?.,;:]', '', 'g')) AS n_punct
      | FROM dec)
      |SELECT source, CAST(sum(n) AS BIGINT) AS sum_chars,
      | CAST(sum(n_digit) AS BIGINT) AS sum_digits,
      | CAST(sum(n_punct) AS BIGINT) AS sum_punct,
      | CAST(sum(CASE WHEN (n_digit + n_punct) * 20 > n THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_symbol_heavy
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  // q112: CROSS-SOURCE OVERLAP matrix — dataset-overlap auditing (is
  // crawl B a re-crawl of crawl A? does a benchmark source leak into a
  // training source?) as exact Jaccard over each source's DISTINCT token
  // trigrams. The pair counts need NO JOIN at all: group by trigram,
  // collect the (≤ #sources, post-distinct) source set, and emit the
  // C(s, 2) ordered pairs ROW-LOCALLY from the sorted array — the
  // aggregation buffer and the fan-out are both bounded by the SOURCE
  // COUNT by construction (the one place collect_set is safe — contrast
  // q107, where the per-token doc list is unbounded and must be
  // window-limited instead). A trigram-keyed self-join computes the same
  // thing with a second shuffle and a stats-dependent build side; this
  // form is one shuffle on the trigram + a pairs-table aggregation.
  // Trigram extraction is a row-local generator (sequence + slice, the
  // q100 shape). Jaccard is reported in INTEGER parts-per-million via
  // inclusion-exclusion (inter·1e6 div union) — engine-exact.
  //
  // REGIME BOUND (executable, not prose): the row-local form is only
  // safe while the source count stays small — C(s,2) pairs per trigram
  // and an s-element aggregation buffer are both quadratic-in-s costs
  // that the plan pays PER TRIGRAM. [[MaxOverlapSources]] (64 → ≤ 2016
  // pairs/trigram, a few KB) is asserted IN the plan via assert_true at
  // the one point the bound matters: a 65th source sharing any trigram
  // fails the query loudly (AuditOpsSpec pins both sides of the
  // boundary) instead of silently degrading into a fan-out. Past the
  // bound, the right plan is the trigram-keyed pair-JOIN (second
  // shuffle, stats-dependent build side) — not a bigger cap.
  private def q112(s: SparkSession, d: String): DataFrame =
    overlapMatrix(documents(s, d))

  private[graft] val MaxOverlapSources = 64

  private[graft] def overlapMatrix(docs: DataFrame): DataFrame = {
    val tri = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 2, 1)," +
          " p -> array_join(slice(toks, p, 3), ' '))")).as("g"))
    // ONE shuffle on the trigram key: collect_set dedups (source, g)
    // inside the aggregation buffer (map-side partial included), so the
    // r9 plan's separate `.distinct()` pre-shuffle of every exploded
    // trigram row was pure overhead — and the per-source distinct-gram
    // counts fall out of the SETS (explode of the bounded source arrays
    // at gram grain, ≪ the raw trigram volume) instead of a second pass
    // over the corpus-scale frame. Persisting the gram-grain sets (not
    // the exploded rows) is also the smaller cache by ~the duplication
    // factor.
    val sets = Caches.persist(tri.groupBy("g")
      .agg(sort_array(collect_set(col("source"))).as("ss0")))
    val per = sets.select(explode(col("ss0")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
    sets
      // the guard rides the column the generator explodes, so pruning can
      // never drop it. CASE/raise_error, NOT if(isnull(assert_true(…)),
      // ss0, ss0): identical branches let SimplifyConditionals fold the
      // whole conditional — assert included — out of the plan (observed
      // on Spark 4.1; the boundary spec caught it).
      .withColumn("ss", expr(
        s"CASE WHEN size(ss0) <= $MaxOverlapSources THEN ss0 " +
          s"ELSE raise_error('q112: more than $MaxOverlapSources sources " +
          "share a trigram; the row-local C(s,2) pair generator is out of " +
          "its regime - use a trigram-keyed pair join') END"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(ss, (a, i) -> transform(" +
          "slice(ss, i + 2, size(ss) - i - 1)," +
          " b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(per.withColumnRenamed("source", "src_a").withColumnRenamed("n", "na")), "src_a")
      .join(broadcast(per.withColumnRenamed("source", "src_b").withColumnRenamed("n", "nb")), "src_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .select(col("src_a"), col("src_b"), col("inter"), col("uni"),
        expr("inter * 1000000 DIV uni").as("jac_ppm"))
      .orderBy(desc("inter"), col("src_a"), col("src_b"))
      .limit(20)
  }

  private val q112Sql =
    """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |tri AS (SELECT DISTINCT source,
      |  unnest(list_transform(range(1, len(toks) - 1),
      |    p -> array_to_string(toks[p:p+2], ' '))) AS g
      | FROM t),
      |per AS (SELECT source, count(*) AS n FROM tri GROUP BY source),
      |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      | FROM tri a JOIN tri b ON a.g = b.g AND a.source < b.source
      | GROUP BY 1, 2)
      |SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
      | CAST(pa.n + pb.n - inter AS BIGINT) AS uni,
      | CAST(inter * 1000000 // (pa.n + pb.n - inter) AS BIGINT) AS jac_ppm
      |FROM i JOIN per pa ON pa.source = src_a JOIN per pb ON pb.source = src_b
      |ORDER BY inter DESC, src_a, src_b LIMIT 20""".stripMargin

  // q121: STRATUM DRIFT SCORE — how far each source's document-length
  // distribution sits from the corpus-wide distribution, as a
  // cross-multiplied integer L1 divergence: Σ_bins |n_sb·N − n_b·N_s|
  // (the float form Σ|n_sb/N_s − n_b/N| scaled by N·N_s — rank-identical,
  // hash-exact; the q92/q111 boundary-exact family extended to whole
  // distributions). An extraction change upstream shows up here as one
  // stratum drifting before any absolute-quality rule fires. Cost shape:
  // one (source × bin) aggregate over the corpus — everything after is
  // arithmetic on the ≤ sources×10 summary grid with the 10-row corpus
  // histogram broadcast. At 100 TB row counts push the cross-products
  // past Long range — the same plan runs with the counts cast
  // DECIMAL(38,0), and that claim is EXECUTABLE, not prose: q121 is
  // driftFromGrid(decimalExact = false), and AuditOpsSpec runs
  // driftFromGrid(decimalExact = true) over a planted grid whose
  // cross-products exceed Long.MaxValue, asserting equality with a
  // BigInt reference computed outside Spark (the r7 verdict's "overflow
  // that silently wraps is the one class the sf0.01 oracle cannot see").
  private def q121(s: SparkSession, d: String): DataFrame =
    driftFromGrid(
      documents(s, d)
        .select(col("source"), least(expr("n_chars DIV 100"), lit(9L)).as("bin"))
        .groupBy("source", "bin").agg(count(lit(1)).as("nsb")),
      decimalExact = false)

  /** The drift arithmetic over a pre-aggregated (source, bin, nsb) grid.
    * `decimalExact = true` is the 100 TB form: counts ride DECIMAL(38,0)
    * so the nsb·N / nb·ns cross-products stay exact past Long range —
    * same plan shape, wider integers. */
  private[graft] def driftFromGrid(grid: DataFrame, decimalExact: Boolean): DataFrame = {
    val sb = Caches.persist(
      if (decimalExact)
        grid.select(col("source"), col("bin"),
          col("nsb").cast("decimal(38,0)").as("nsb"))
      else grid)
    val st = sb.groupBy("source").agg(sum("nsb").as("ns"))
    val cb = sb.groupBy("bin").agg(sum("nsb").as("nb"))
    val tot = sb.agg(sum("nsb").as("n"))
    st.crossJoin(broadcast(cb))
      .join(sb, Seq("source", "bin"), "left")
      .withColumn("nsb", coalesce(col("nsb"),
        if (decimalExact) lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)") else lit(0L)))
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(min("ns").as("n_docs"),
        sum(abs(col("nsb") * col("n") - col("nb") * col("ns"))).as("l1_cross"))
      .orderBy("source")
  }

  private val q121Sql =
    """WITH b AS (SELECT source, least(n_chars // 100, 9) AS bin FROM documents),
      |sb AS (SELECT source, bin, count(*) AS nsb FROM b GROUP BY 1, 2),
      |st AS (SELECT source, sum(nsb) AS ns FROM sb GROUP BY 1),
      |cb AS (SELECT bin, sum(nsb) AS nb FROM sb GROUP BY 1),
      |tot AS (SELECT sum(nsb) AS n FROM sb),
      |grid AS (SELECT st.source, st.ns, cb.bin, cb.nb, coalesce(sb.nsb, 0) AS nsb
      | FROM st CROSS JOIN cb LEFT JOIN sb ON sb.source = st.source AND sb.bin = cb.bin)
      |SELECT source, CAST(min(ns) AS BIGINT) AS n_docs,
      | CAST(sum(abs(nsb * (SELECT n FROM tot) - nb * ns)) AS BIGINT) AS l1_cross
      |FROM grid GROUP BY source ORDER BY source""".stripMargin

  // q122: EXACT JOIN-SIZE FORECAST — predict a fact⋈fact join's output
  // and its per-reducer skew BEFORE running it: per-key row counts on
  // both sides (partial-agg'd — the only passes over the fact tables),
  // joined at KEY grain (≪ fact grain), Σ cl·co per shuffle bucket. The
  // bucket is an md5-prefix hash (the engine-portable pctBucket family,
  // NOT engine hash(), which would never match across engines), standing
  // in for the shuffle partitioner: a bucket whose forecast dwarfs the
  // others is the skewed reducer you salt (q64) or split (AQE) before
  // paying for the real join. The forecast output is bucket-count-sized
  // — metadata — at any corpus size.
  private def q122(s: SparkSession, d: String): DataFrame = {
    def bkt(c: org.apache.spark.sql.Column) =
      (conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 16).as("bkt")
    val l = lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cl"))
      .select(bkt(col("l_orderkey")), col("l_orderkey"), col("cl"))
    val o = orders(s, d).groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("co"))
      .select(col("o_orderkey"), col("co"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("bkt")
      .agg(count(lit(1)).as("n_keys"), sum(col("cl") * col("co")).as("join_rows"))
      .orderBy("bkt")
  }

  private val q122Sql =
    """WITH lc AS (SELECT l_orderkey, count(*) AS cl FROM lineitem GROUP BY 1),
      |l AS (SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT % 16
      |    AS bkt, l_orderkey, cl FROM lc),
      |o AS (SELECT o_orderkey, count(*) AS co FROM orders GROUP BY 1)
      |SELECT l.bkt, count(*) AS n_keys, CAST(sum(cl * co) AS BIGINT) AS join_rows
      |FROM l JOIN o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // q123: COMPRESSION-RATIO quality signal — DEFLATE length over raw
  // length per document (graft.functions.DeflateLen, row-local codegen),
  // the whole-document redundancy detector: boilerplate and template
  // spam compress dramatically better than diverse prose, catching
  // repetition patterns q99's single top-bigram rule cannot see. The
  // flag is integer cross-multiplication (deflated·3 < raw ⟺ ratio
  // < 1/3 — pure repetition lands near 5%, diverse text well above
  // 40%, so the threshold sits in the empty middle of the
  // distribution). DuckDB 1.0 has no deflate function, so the oracle
  // (r16 VERDICT task 6) rides a PRECOMPUTED fixture: fixtures/
  // deflate_lens.parquet maps md5(text) → CPython-zlib compressed
  // length for every distinct document text in the three testdata SFs
  // (content-addressed, so any of them hash-checks; java.util.zip and
  // CPython link the same zlib at the same level, making this a real
  // cross-engine check, not an echo of the JVM's own answer). The
  // oracle INNER-joins on md5(text): a text absent from the fixture
  // (e.g. the perturbed sf1/sf10 replica corpora, which keep the
  // python-zlib recomputation path in tools/check*.py) drops rows and
  // fails LOUDLY rather than passing on NULLs. AuditOpsSpec pins the
  // expression byte-for-byte against a direct java.util.zip reference
  // and the flag against planted boilerplate/diverse docs.
  private def q123(s: SparkSession, d: String): DataFrame = {
    val dl = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.GraftColumn(
        graft.functions.DeflateLen(org.apache.spark.sql.GraftColumn.expr(c)))
    documents(s, d)
      .withColumn("raw", length(col("text")).cast("long"))
      .withColumn("comp", dl(col("text")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("raw").as("sum_raw"),
        sum("comp").as("sum_deflated"),
        sum(when(col("comp") * 3 < col("raw"), 1L).otherwise(0L))
          .as("n_high_redundancy"))
      .orderBy("source")
  }

  private val q123Sql =
    """WITH f AS (SELECT text_md5, deflate_len
      |  FROM read_parquet('/root/repo/fixtures/deflate_lens.parquet')),
      |d AS (SELECT d.source, len(d.text) AS raw, f.deflate_len AS comp
      |  FROM documents d JOIN f ON md5(d.text) = f.text_md5)
      |SELECT source, count(*) AS n_docs,
      | CAST(sum(raw) AS BIGINT) AS sum_raw,
      | CAST(sum(comp) AS BIGINT) AS sum_deflated,
      | CAST(sum(CASE WHEN comp * 3 < raw THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_high_redundancy
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** q141's expected first-digit shares, round(log10(1+1/d)·1e6): the
    * Benford distribution as exact integer constants (they sum to exactly
    * 1e6), shared with the oracle so neither engine ever evaluates a log. */
  private[graft] val BenfordPpm =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  // q141: BENFORD FIRST-DIGIT AUDIT — numeric forensics for an ingested
  // metric column: organically-generated monetary amounts follow Benford's
  // law, and a stratum that deviates hard (synthetic padding, truncated
  // feeds, unit mix-ups) shows up as chi-square mass on specific digits
  // before any domain rule fires. Rows are restricted to price >= 1 so
  // every counted row can land on the 1..9 digit grid (a 0-digit or
  // negative row would inflate N while vanishing from the grid, and a
  // negative price CASTs to NULL on Spark but errors on DuckDB); the
  // digit is then row-local string-head arithmetic on floor(price) —
  // identical doubles → identical digits in both engines; observed
  // counts are one partial-agg'd pass; the 9-row digit grid left-joins
  // the counts (absent digits MUST surface as 0, not vanish) and the
  // 1-row total rides the broadcast crossJoin idiom. chi-square in micro
  // units, cross-multiplied to integers: dev = o·1e6 − N·e_ppm,
  // contribution = dev² div (N·e_ppm). Every multiplication is lifted to
  // DECIMAL(38,0) BEFORE it happens (the q121/q133 overflow idiom —
  // HUGEINT on the DuckDB side): n·e_ppm alone wraps Long at n ≳ 3e13
  // rows, so lifting only the product would be a silent-wrap gamble; the
  // quotient returns to BIGINT. Output is 9 rows at any corpus size.
  private def q141(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).filter(col("l_extendedprice") >= 1).withColumn("digit",
      expr("CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"))
    val obs = li.groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = li.agg(count(lit(1)).as("n"))
    s.range(1, 10).toDF("digit")
      .join(obs, Seq("digit"), "left").na.fill(0L, Seq("n_obs"))
      .withColumn("e_ppm", element_at(array(BenfordPpm.map(lit): _*), col("digit").cast("int")))
      .crossJoin(broadcast(tot))
      .withColumn("obs_ppm", expr("(n_obs * 1000000) div n"))
      .withColumn("dev",
        expr("CAST(n_obs AS DECIMAL(38,0)) * 1000000 - CAST(n AS DECIMAL(38,0)) * e_ppm"))
      .withColumn("chi2_micro",
        expr("CAST((dev * dev) div (CAST(n AS DECIMAL(38,0)) * e_ppm) AS BIGINT)"))
      .select("digit", "n_obs", "obs_ppm", "e_ppm", "chi2_micro")
      .orderBy("digit")
  }

  private val q141Sql = {
    val values = BenfordPpm.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
    s"""WITH li AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem WHERE l_extendedprice >= 1),
      |o AS (SELECT digit, count(*) AS n_obs FROM li GROUP BY 1),
      |t AS (SELECT count(*) AS n FROM li),
      |e AS (SELECT * FROM (VALUES $values) AS v(digit, e_ppm)),
      |g AS (SELECT CAST(e.digit AS BIGINT) AS digit, coalesce(n_obs, 0) AS n_obs,
      |   CAST(e_ppm AS BIGINT) AS e_ppm, n
      |  FROM e LEFT JOIN o ON e.digit = o.digit CROSS JOIN t)
      |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
      | (n_obs * 1000000) // n AS obs_ppm, e_ppm,
      | CAST(((n_obs::HUGEINT * 1000000 - n::HUGEINT * e_ppm)
      |     * (n_obs::HUGEINT * 1000000 - n::HUGEINT * e_ppm))
      |   // (n::HUGEINT * e_ppm) AS BIGINT) AS chi2_micro
      |FROM g ORDER BY digit""".stripMargin
  }

  /** q146's edge list: (edge name, fact table, fk column, dim table, pk
    * column) for every FK edge in the TPC-H-ish schema. Shared with the
    * oracle generator so the catalogs cannot drift. */
  private[graft] val JoinEdges = Seq(
    ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))

  // q146: JOIN-GRAPH STATISTICS CATALOG — the per-edge numbers a
  // cost-based optimizer (or a human planning a 100 TB join) needs
  // BEFORE running anything: fact rows, FK NDV, dim rows, orphaned fact
  // rows (FK values with no dim match — q110 plants and detects
  // violations on one edge; this catalogs the honest state of every
  // edge), max fanout (the skew ceiling q138 would salt), and avg fanout
  // in milli units (integer div). Each edge costs ONE partial-agg'd
  // group-count of the fact's FK (the |keys|-grain frame every other
  // stat derives from) plus a left-anti probe of the dim's key set;
  // the 7-row catalog is metadata at any scale. Non-null FK contract:
  // null FKs are excluded on both sides (count(DISTINCT) semantics).
  private def q146(s: SparkSession, d: String): DataFrame = {
    def stats(name: String, fact: DataFrame, fk: String, dim: DataFrame, pk: String) = {
      val grp = fact.filter(col(fk).isNotNull)
        .groupBy(col(fk)).agg(count(lit(1)).as("c"))
      val grpC = Caches.persist(grp)
      val orphans = grpC.join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
        .agg(coalesce(sum("c"), lit(0L)).as("n_orphans"))
      grpC.agg(sum("c").as("n_fact"), count(lit(1)).as("fk_ndv"),
          max("c").as("max_fanout"))
        .crossJoin(orphans)
        .crossJoin(dim.agg(count(lit(1)).as("n_dim")))
        .select(lit(name).as("edge"), col("n_fact"), col("fk_ndv"), col("n_dim"),
          col("n_orphans"), col("max_fanout"),
          expr("(n_fact * 1000) div fk_ndv").as("avg_fanout_milli"))
    }
    JoinEdges.map { case (name, f, fk, dm, pk) =>
      stats(name, Tables.table(s, d, f), fk, Tables.table(s, d, dm), pk)
    }.reduce(_ unionByName _).orderBy("edge")
  }

  private val q146Sql = JoinEdges.map { case (name, f, fk, dm, pk) =>
    s"""SELECT '$name' AS edge, count(*) AS n_fact,
       | count(DISTINCT $fk) AS fk_ndv,
       | (SELECT count(*) FROM $dm) AS n_dim,
       | (SELECT count(*) FROM $f WHERE $fk IS NOT NULL
       |   AND $fk NOT IN (SELECT $pk FROM $dm WHERE $pk IS NOT NULL)) AS n_orphans,
       | (SELECT max(c) FROM (SELECT count(*) AS c FROM $f WHERE $fk IS NOT NULL GROUP BY $fk)) AS max_fanout,
       | count(*) * 1000 // count(DISTINCT $fk) AS avg_fanout_milli
       |FROM $f WHERE $fk IS NOT NULL""".stripMargin
  }.mkString("\nUNION ALL\n") + "\nORDER BY edge"

  // q148: K-ANONYMITY AUDIT — re-identification risk, the privacy audit
  // q105 (PII detection) does not cover: even with direct identifiers
  // scrubbed, a document whose quasi-identifier tuple (source, lang,
  // 100-char length band) is shared by fewer than k corpus documents is
  // linkable. One grouped count produces the equivalence classes (class
  // grain ≪ corpus — bounded by |sources|·|langs|·bands); the ×4
  // explode over the k ladder and the threshold sums run at that
  // metadata grain, with the corpus total on the broadcast crossJoin.
  // All-integer output: class counts, at-risk docs, risk in bp.
  private def q148(s: SparkSession, d: String): DataFrame = {
    val ks = Seq(2L, 5L, 10L, 20L)
    val cls = Caches.persist(documents(s, d)
      .groupBy(col("source"), col("lang"), expr("n_chars div 100").as("len_band"))
      .agg(count(lit(1)).as("c")))
    cls.crossJoin(broadcast(cls.agg(sum("c").as("n"))))
      .select(explode(array(ks.map(lit): _*)).as("k"), col("c"), col("n"))
      .groupBy("k")
      .agg(sum(when(col("c") < col("k"), 1L).otherwise(0L)).as("n_classes_below"),
        sum(when(col("c") < col("k"), col("c")).otherwise(0L)).as("n_docs_at_risk"),
        min("n").as("n"))
      .withColumn("risk_bp", expr("(n_docs_at_risk * 10000) div n"))
      .select("k", "n_classes_below", "n_docs_at_risk", "risk_bp")
      .orderBy("k")
  }

  private val q148Sql =
    """WITH cls AS (SELECT source, lang, n_chars // 100 AS len_band, count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cls),
      |x AS (SELECT k, c, n
      |  FROM cls CROSS JOIN t CROSS JOIN (SELECT unnest([2, 5, 10, 20]) AS k) kk)
      |SELECT CAST(k AS BIGINT) AS k,
      | CAST(sum(CASE WHEN c < k THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_below,
      | CAST(sum(CASE WHEN c < k THEN c ELSE 0 END) AS BIGINT) AS n_docs_at_risk,
      | (CAST(sum(CASE WHEN c < k THEN c ELSE 0 END) AS BIGINT) * 10000) // min(n) AS risk_bp
      |FROM x GROUP BY 1 ORDER BY k""".stripMargin

  /** q149's candidate list: (table, determinant, dependent). Shared with
    * the oracle generator. */
  private[graft] val FdCandidates = Seq(
    ("documents", "lang", "source"),
    ("documents", "source", "lang"),
    ("events", "user_id", "event_type"),
    ("orders", "o_custkey", "o_orderstatus"))

  // q149: FUNCTIONAL-DEPENDENCY AUDIT — relational profiling beyond
  // q81's single-column stats: for each candidate A → B, how many rows
  // would have to change for the dependency to hold exactly
  // (n_violations = Σ_a (n_a − max_b n_ab), the standard g3-style error),
  // plus its support in bp. Discovered FDs drive normalization,
  // partitioning-key, and dictionary-encoding decisions at 100 TB. Each
  // candidate costs one (A,B) grouped count (map-side combined — the
  // shuffle carries pair-key counts, not rows) followed by arithmetic at
  // A grain; the catalog is |candidates| rows. Determinant/dependent
  // render through CAST(... AS STRING) so mixed column types share one
  // code path in both engines; null keys are excluded (count(DISTINCT)
  // semantics, the q146 contract).
  private def q149(s: SparkSession, d: String): DataFrame = {
    def stats(tbl: String, det: String, dep: String) = {
      val pairs = Tables.table(s, d, tbl)
        .filter(col(det).isNotNull && col(dep).isNotNull)
        .groupBy(col(det).cast("string").as("a"), col(dep).cast("string").as("b"))
        .agg(count(lit(1)).as("c"))
      pairs.groupBy("a").agg(sum("c").as("na"), max("c").as("mb"))
        .agg(sum("na").as("n_rows"), count(lit(1)).as("n_keys"),
          sum(col("na") - col("mb")).as("n_violations"), sum("mb").as("smb"))
        .select(lit(s"$tbl.$det->$dep").as("candidate"), col("n_rows"), col("n_keys"),
          col("n_violations"), expr("(smb * 10000) div n_rows").as("support_bp"))
    }
    FdCandidates.map { case (t, a, b) => stats(t, a, b) }
      .reduce(_ unionByName _).orderBy("candidate")
  }

  private val q149Sql = FdCandidates.map { case (tbl, det, dep) =>
    s"""SELECT '$tbl.$det->$dep' AS candidate, CAST(sum(na) AS BIGINT) AS n_rows,
       | count(*) AS n_keys, CAST(sum(na - mb) AS BIGINT) AS n_violations,
       | (CAST(sum(mb) AS BIGINT) * 10000) // CAST(sum(na) AS BIGINT) AS support_bp
       |FROM (SELECT a, sum(c) AS na, max(c) AS mb FROM
       |  (SELECT CAST($det AS VARCHAR) AS a, CAST($dep AS VARCHAR) AS b, count(*) AS c
       |   FROM $tbl WHERE $det IS NOT NULL AND $dep IS NOT NULL GROUP BY 1, 2)
       | GROUP BY a)""".stripMargin
  }.mkString("\nUNION ALL\n") + "\nORDER BY candidate"

  /** q152's audited (table, column) list, shared with the oracle. */
  private[graft] val BalanceColumns = Seq(
    ("documents", "lang"), ("documents", "source"), ("embeddings", "label"))

  // q152: CLASS-BALANCE AUDIT — the dataset-card number for every
  // categorical column that downstream sampling or stratification keys
  // on: class count, majority share, and Gini impurity (the log-free
  // balance measure — entropy would put a transcendental in the hash
  // path; Gini is pure integer arithmetic). gini_micro =
  // (N² − Σc²)·1e6 div N², cross-multiplied exactly: at production row
  // counts both N² and c² blow past Long, so the squares ride
  // DECIMAL(38,0) in-plan (q141's idiom; HUGEINT in DuckDB) and only
  // the final micro-quotient returns to BIGINT. One grouped count per
  // column — class grain — then single-row arithmetic; the catalog is
  // |columns| rows at any scale.
  private def q152(s: SparkSession, d: String): DataFrame = {
    def balance(tbl: String, c: String) = {
      val cls = Tables.table(s, d, tbl).filter(col(c).isNotNull)
        .groupBy(col(c).cast("string")).agg(count(lit(1)).as("cnt"))
      cls.agg(sum("cnt").as("n"), count(lit(1)).as("k_classes"), max("cnt").as("maxc"),
          sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("sq"))
        .select(lit(s"$tbl.$c").as("column_name"), col("n"), col("k_classes"),
          expr("(maxc * 10000) div n").as("majority_bp"),
          expr("CAST(((CAST(n AS DECIMAL(38,0)) * n - sq) * 1000000)" +
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("gini_micro"))
    }
    BalanceColumns.map { case (t, c) => balance(t, c) }
      .reduce(_ unionByName _).orderBy("column_name")
  }

  private val q152Sql = BalanceColumns.map { case (tbl, c) =>
    s"""SELECT '$tbl.$c' AS column_name, CAST(sum(cnt) AS BIGINT) AS n,
       | count(*) AS k_classes,
       | (max(cnt) * 10000) // CAST(sum(cnt) AS BIGINT) AS majority_bp,
       | CAST(((sum(cnt)::HUGEINT * sum(cnt) - sum(cnt::HUGEINT * cnt)) * 1000000)
       |   // (sum(cnt)::HUGEINT * sum(cnt)) AS BIGINT) AS gini_micro
       |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt
       |      FROM $tbl WHERE $c IS NOT NULL GROUP BY 1)""".stripMargin
  }.mkString("\nUNION ALL\n") + "\nORDER BY column_name"

  // q160: FINANCIAL RECONCILIATION AUDIT — value-level consistency
  // where q110/q146 stop at key-level: does each order's stored total
  // equal the sum of its line values (price·(1−disc)·(1+tax))? Floats
  // never enter an aggregation: each ROW's value is rounded to integer
  // cents first (identical per-row doubles → identical cents in both
  // engines), so the per-order sum is an order-insensitive integer —
  // a double sum here would hash-diverge with partial-agg order. The
  // report is a 4-bucket histogram of |stored − derived| in cents plus
  // the worst offender, so per-line-vs-per-total rounding drift lands
  // in the small buckets by construction instead of being hidden by a
  // tolerance. One lineitem aggregation + one order-grain join.
  private def q160(s: SparkSession, d: String): DataFrame = {
    val lines = Tables.table(s, d, "lineitem")
      .withColumn("cents", expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)"))
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum("cents").as("derived_cents"))
    Tables.table(s, d, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("stored_cents"))
      .join(lines, "o_orderkey")
      .withColumn("diff", abs(col("stored_cents") - col("derived_cents")))
      .withColumn("bucket",
        when(col("diff") === 0L, "a_exact")
          .when(col("diff") <= 10L, "b_within_10c")
          .when(col("diff") <= 100L, "c_within_1d")
          .otherwise("d_over_1d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), max("diff").as("max_diff_cents"))
      .orderBy("bucket")
  }

  private val q160Sql =
    """WITH l AS (SELECT l_orderkey AS o_orderkey,
      |   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS derived_cents
      |  FROM lineitem GROUP BY 1),
      |j AS (SELECT o.o_orderkey,
      |   abs(CAST(round(o_totalprice * 100) AS BIGINT) - derived_cents) AS diff
      |  FROM orders o JOIN l USING (o_orderkey)),
      |b AS (SELECT CASE WHEN diff = 0 THEN 'a_exact'
      |   WHEN diff <= 10 THEN 'b_within_10c'
      |   WHEN diff <= 100 THEN 'c_within_1d'
      |   ELSE 'd_over_1d' END AS bucket, diff FROM j)
      |SELECT bucket, count(*) AS n_orders, max(diff) AS max_diff_cents
      |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin

  // q167: SCHEMA-DRIFT AUDIT over the open-schema props column — the
  // producer-contract check every feed consumer eventually writes: per
  // feed, the MODAL key-set is the de-facto schema, and every event
  // whose key-set differs is drift (new producer version, truncated
  // payload, malformed JSON — all surface here before they surface as
  // nulls downstream). Key-sets canonicalize as sorted comma-joined
  // strings (json_object_keys ≡ json_keys, sorted identically);
  // null/unparseable props become the '(none)' bucket rather than
  // silently vanishing — an all-null feed MUST read as 100% conforming
  // to '(none)', not as empty. One partial-agg'd collapse to the
  // (feed, keyset) histogram (Zipf-small: producers ship few versions);
  // the modal/alternate picks are windows over that METADATA frame.
  private def q167(s: SparkSession, d: String): DataFrame = {
    val ks = events(s, d)
      .select(col("event_type"),
        coalesce(array_join(array_sort(json_object_keys(col("props"))), ","),
          lit("(none)")).as("keyset"))
    val hist = ks.groupBy("event_type", "keyset").agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy("event_type").orderBy(desc("n"), col("keyset"))
    val ranked = hist.withColumn("r", row_number().over(wr))
    val modal = ranked.filter(col("r") === 1)
      .select(col("event_type"), col("keyset").as("modal_schema"), col("n").as("n_modal"))
    val alt = ranked.filter(col("r") === 2)
      .select(col("event_type"), col("keyset").as("alt_schema"), col("n").as("n_alt"))
    val tot = hist.groupBy("event_type").agg(sum("n").as("n_events"))
    tot.join(modal, "event_type").join(alt, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"), col("modal_schema"),
        (col("n_events") - col("n_modal")).as("n_drift"),
        expr("(n_events - n_modal) * 1000000 div n_events").as("drift_ppm"),
        coalesce(col("alt_schema"), lit("")).as("alt_schema"),
        coalesce(col("n_alt"), lit(0L)).as("n_alt"))
      .orderBy("event_type")
  }

  private val q167Sql =
    """WITH ks AS (SELECT event_type,
      |   coalesce(array_to_string(list_sort(json_keys(props)), ','), '(none)') AS keyset
      |  FROM events),
      |h AS (SELECT event_type, keyset, count(*) AS n FROM ks GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |   ORDER BY n DESC, keyset) AS r FROM h),
      |m AS (SELECT event_type, keyset AS modal_schema, n AS n_modal FROM r WHERE r = 1),
      |a AS (SELECT event_type, keyset AS alt_schema, n AS n_alt FROM r WHERE r = 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events FROM h GROUP BY 1)
      |SELECT t.event_type, t.n_events, m.modal_schema,
      | CAST(t.n_events - m.n_modal AS BIGINT) AS n_drift,
      | CAST((t.n_events - m.n_modal) * 1000000 // t.n_events AS BIGINT) AS drift_ppm,
      | coalesce(a.alt_schema, '') AS alt_schema,
      | CAST(coalesce(a.n_alt, 0) AS BIGINT) AS n_alt
      |FROM t JOIN m USING (event_type) LEFT JOIN a USING (event_type)
      |ORDER BY event_type""".stripMargin

  // q182: MODALITY-COVERAGE AUDIT — the referential-integrity gate
  // between the text corpus and its embedding index, the one cross-table
  // check an ANN build must pass before q46/q49/q129 mean anything: a
  // document without an embedding is silently unretrievable, and an
  // embedding without a document is an orphan that can only surface as a
  // dangling search hit. Full outer join on the shared id space, then a
  // per-source coverage report (documents grain) — the q110 constraint
  // family extended ACROSS modalities. Both sides are id-projected
  // before the join, so the shuffle carries ids and a source tag, never
  // text or vectors; at 100 TB this is the cheapest join in the system,
  // and the one that gates every expensive one downstream.
  private def q182(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val vecs = Tables.embeddings(s, d).select(col("vec_id").as("doc_id"))
      .withColumn("has_vec", lit(1L))
    val joined = docs.withColumn("has_doc", lit(1L))
      .join(vecs, Seq("doc_id"), "full_outer")
    val perSource = joined.filter(col("has_doc").isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("has_vec"), lit(0L))).as("n_embedded"))
      .select(col("source"), col("n_docs"), col("n_embedded"),
        expr("n_embedded * 1000 div n_docs").as("coverage_permille"))
    val orphans = joined.filter(col("has_doc").isNull)
      .agg(count(lit(1)).as("n_orphan_vecs"))
    perSource.crossJoin(broadcast(orphans)).orderBy("source")
  }

  private val q182Sql =
    """WITH d AS (SELECT doc_id, source FROM documents),
      |v AS (SELECT vec_id AS doc_id, 1 AS has_vec FROM embeddings),
      |j AS (SELECT d.doc_id AS did, d.source, v.has_vec, v.doc_id AS vid
      |  FROM d FULL OUTER JOIN v ON d.doc_id = v.doc_id),
      |ps AS (SELECT source, count(*) AS n_docs,
      |   CAST(sum(coalesce(has_vec, 0)) AS BIGINT) AS n_embedded
      |  FROM j WHERE did IS NOT NULL GROUP BY source),
      |o AS (SELECT count(*) AS n_orphan_vecs FROM j WHERE did IS NULL)
      |SELECT source, n_docs, n_embedded,
      | n_embedded * 1000 // n_docs AS coverage_permille,
      | CAST(n_orphan_vecs AS BIGINT) AS n_orphan_vecs
      |FROM ps CROSS JOIN o ORDER BY source""".stripMargin

  // q209: CATEGORICAL INDEPENDENCE AUDIT — the stratification-validity
  // check the sampling/mixing family silently assumes: q90 stratifies by
  // source, q101/q137 reweight by source, q121 compares value strata —
  // all of it is clean only if the OTHER categorical dims are
  // independent of source (if lang ⊥ source fails, reweighting sources
  // silently reweights languages too). The chi-square contingency test
  // in its cross-multiplied integer form (the q141 Benford discipline
  // applied to a 2-D grid): per (lang, source) cell, dev = N·o − r·c and
  // contrib_micro = dev²·10⁶ div (N·r·c) on DECIMAL(38) — a
  // deterministic integer statistic both engines compute identically,
  // with expected_milli alongside so the reader sees the direction; the
  // '*' total row carries the summed statistic (consumers divide by
  // N·min(rows−1, cols−1) for Cramér's V). One corpus-scale shuffle
  // (the cell counts, partial-agg'd); marginals/devs live on the bounded
  // lang×source grid with 1-row N broadcast.
  private def q209(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy("lang", "source").agg(count(lit(1)).as("o0"))
    val rowT = cells.groupBy("lang").agg(sum("o0").as("r"))
    val colT = cells.groupBy("source").agg(sum("o0").as("c"))
    val n = cells.agg(sum("o0").as("n"))
    // the FULL marginal cross-grid, not just observed cells: a zero cell
    // under perfect association carries contribution r·c/N — dropping it
    // (as a bare groupBy would) understates the statistic exactly where
    // dependence is strongest. Bounded: |langs| × |sources|.
    val cc = broadcast(rowT).crossJoin(broadcast(colT))
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o0"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("dev",
        expr("CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c"))
      .withColumn("contrib_micro",
        expr("CAST((dev * dev * 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"))
      .withColumn("expected_milli",
        expr("CAST((CAST(r AS DECIMAL(38,0)) * c * 1000) div n AS BIGINT)"))
    val cellRows = cc.select(col("lang"), col("source"), col("o").as("observed"),
      col("expected_milli"), col("contrib_micro"))
    val total = cc.agg(max("n").as("nn"), sum("contrib_micro").as("chi"))
      .select(lit("*").as("lang"), lit("*").as("source"), col("nn").as("observed"),
        (col("nn") * 1000L).as("expected_milli"), col("chi").as("contrib_micro"))
    cellRows.unionByName(total).orderBy("lang", "source")
  }

  private val q209Sql =
    """WITH cells AS (SELECT lang, source, count(*) AS o0 FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, sum(o0) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT source, sum(o0) AS c FROM cells GROUP BY 1),
      |nn AS (SELECT sum(o0) AS n FROM cells),
      |cc AS (SELECT g.lang, g.source, coalesce(cells.o0, 0) AS o, r, c, n,
      |   n::HUGEINT * coalesce(cells.o0, 0) - r::HUGEINT * c AS dev
      |  FROM (SELECT lang, r, source, c FROM rt CROSS JOIN ct) g
      |  LEFT JOIN cells USING (lang, source) CROSS JOIN nn),
      |x AS (SELECT lang, source, CAST(o AS BIGINT) AS observed,
      |   CAST((r::HUGEINT * c * 1000) // n AS BIGINT) AS expected_milli,
      |   CAST((dev * dev * 1000000) // (n::HUGEINT * r * c) AS BIGINT) AS contrib_micro
      |  FROM cc)
      |SELECT * FROM (
      | SELECT lang, source, observed, expected_milli, contrib_micro FROM x
      | UNION ALL
      | SELECT '*', '*', CAST(n AS BIGINT), CAST(n * 1000 AS BIGINT),
      |  (SELECT CAST(sum(contrib_micro) AS BIGINT) FROM x) FROM nn)
      |ORDER BY lang, source""".stripMargin

  // q352: CRAMÉR'S V EFFECT SIZE — the NUMBER q209's verdict is missing:
  // at corpus n, the independence χ² rejects on associations too small
  // to act on (every χ² gate in the repo shares this blind spot — the
  // q351 significance-vs-size lesson applied to CATEGORICAL data).
  // V² = χ²/(n·min(r−1, c−1)) rescales the statistic to [0,1]
  // regardless of n and table shape; classed on the declared
  // Cohen-convention ladder V = .1/.3/.5 ⇒ V²_milli 10/90/250.
  // Same full marginal cross-grid as q209 (zero cells carry their
  // r·c/N contribution), χ² in exact micro, ONE milli division at the
  // close; everything past the (lang, source) collapse is grid-local.
  private def q352(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy("lang", "source").agg(count(lit(1)).as("o0"))
    val rowT = cells.groupBy("lang").agg(sum("o0").as("r"))
    val colT = cells.groupBy("source").agg(sum("o0").as("c"))
    val n = cells.agg(sum("o0").as("n"))
    val dims = rowT.agg(count(lit(1)).as("n_rows"))
      .crossJoin(colT.agg(count(lit(1)).as("n_cols")))
    val chi = broadcast(rowT).crossJoin(broadcast(colT))
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o0"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("dev",
        expr("CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c"))
      .withColumn("contrib_micro",
        expr("CAST((dev * dev * 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"))
      .agg(max("n").as("n"), sum("contrib_micro").as("chi2_micro"))
    chi.crossJoin(broadcast(dims))
      .withColumn("df_min", expr(
        "CASE WHEN n_rows < n_cols THEN n_rows - 1 ELSE n_cols - 1 END"))
      .withColumn("v2_milli", expr(
        """CASE WHEN df_min > 0 AND n > 0 THEN
          | chi2_micro div (n * df_min * 1000)
          |ELSE 0L END""".stripMargin))
      .withColumn("strength", expr(
        """CASE WHEN v2_milli >= 250 THEN 'strong'
          | WHEN v2_milli >= 90 THEN 'moderate'
          | WHEN v2_milli >= 10 THEN 'weak'
          | ELSE 'negligible' END""".stripMargin))
      .select(col("n"), col("n_rows"), col("n_cols"),
        expr("CAST(chi2_micro AS BIGINT)").as("chi2_micro"),
        col("v2_milli"), col("strength"))
  }

  private val q352Sql =
    """WITH cells AS (SELECT lang, source, count(*) AS o0 FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, sum(o0) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT source, sum(o0) AS c FROM cells GROUP BY 1),
      |nn AS (SELECT sum(o0) AS n FROM cells),
      |dims AS (SELECT (SELECT count(*) FROM rt) AS n_rows,
      |   (SELECT count(*) FROM ct) AS n_cols),
      |cc AS (SELECT coalesce(cells.o0, 0) AS o, r, c, n,
      |   n::HUGEINT * coalesce(cells.o0, 0) - r::HUGEINT * c AS dev
      |  FROM (SELECT lang, r, source, c FROM rt CROSS JOIN ct) g
      |  LEFT JOIN cells USING (lang, source) CROSS JOIN nn),
      |x AS (SELECT CAST(max(n) AS BIGINT) AS n,
      |   CAST(sum(CAST((dev * dev * 1000000) // (n::HUGEINT * r * c)
      |     AS BIGINT)) AS BIGINT) AS chi2_micro
      |  FROM cc),
      |v AS (SELECT n, CAST(n_rows AS BIGINT) AS n_rows,
      |   CAST(n_cols AS BIGINT) AS n_cols, chi2_micro,
      |   CASE WHEN n_rows < n_cols THEN n_rows - 1 ELSE n_cols - 1 END AS df_min
      |  FROM x CROSS JOIN dims),
      |v2 AS (SELECT *, CASE WHEN df_min > 0 AND n > 0 THEN
      |   chi2_micro // (n * df_min * 1000) ELSE 0 END AS v2_milli FROM v)
      |SELECT n, n_rows, n_cols, chi2_micro, CAST(v2_milli AS BIGINT) AS v2_milli,
      | CASE WHEN v2_milli >= 250 THEN 'strong'
      |  WHEN v2_milli >= 90 THEN 'moderate'
      |  WHEN v2_milli >= 10 THEN 'weak'
      |  ELSE 'negligible' END AS strength
      |FROM v2""".stripMargin

  // q217: KOLMOGOROV–SMIRNOV DRIFT AUDIT (each source vs rest-of-corpus)
  // — the DISTRIBUTION-shape complement of the moment-based drift family:
  // q121 compares histogram masses on fixed bins, q125 compares means,
  // q209 tests categorical independence; none of them sees a source whose
  // doc-length distribution has the same mean but a different SHAPE
  // (bimodal boilerplate + stubs vs uniform prose). The two-sample KS
  // statistic — max CDF gap sup|F_s − F_rest| — is the standard
  // nonparametric answer, and it is integer-EXACT here: the gap at
  // every distinct length v is |cum_s·n_rest − cum_rest·n_s| in the
  // q209 cross-multiplied DECIMAL(38) form (doubles would order-drift),
  // ks_ppm = max·10⁶ div (n_s·n_rest). Corpus-scale work is ONE
  // partial-agg'd (source, length) count shuffle; the CDF windows, the
  // full grid (sources × distinct lengths — zero-count cells MUST exist
  // or a source's CDF would skip steps exactly where it lacks mass),
  // and the argmax all live on the bounded grid. ks_at = the smallest
  // length achieving the max (the oracle-stable argmax tie rule).
  private def q217(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy("source", "n_chars")
      .agg(count(lit(1)).as("c"))
    graft.Caches.persist(cells) // bounded: sources × distinct lengths
    val values = cells.select(col("n_chars")).distinct()
    val srcN = cells.groupBy("source").agg(sum("c").as("n_s"))
    val grid = srcN.crossJoin(values)
      .join(cells, Seq("source", "n_chars"), "left")
      .na.fill(0L, Seq("c"))
    val perV = cells.groupBy("n_chars").agg(sum("c").as("tc"))
    val wCdf = Window.partitionBy("source").orderBy("n_chars")
    val scored = grid.join(perV, Seq("n_chars"))
      .withColumn("cum_s", sum("c").over(wCdf))
      .withColumn("cum_t", sum("tc").over(wCdf))
      .withColumn("n", max("cum_t").over(Window.partitionBy("source")))
      .withColumn("gap", expr(
        """abs(CAST(cum_s AS DECIMAL(38,0)) * (n - n_s)
          |    - CAST(cum_t - cum_s AS DECIMAL(38,0)) * n_s)""".stripMargin))
    scored
      .withColumn("max_gap", max("gap").over(Window.partitionBy("source")))
      .filter(col("gap") === col("max_gap"))
      .groupBy("source")
      .agg(max("n_s").as("n_s"), max(expr("n - n_s")).as("n_rest"),
        min("n_chars").as("ks_at"),
        max(expr("""CAST(max_gap * 1000000
                   |     div (CAST(n_s AS DECIMAL(38,0)) * (n - n_s)) AS BIGINT)"""
          .stripMargin)).as("ks_ppm"))
      .select("source", "n_s", "n_rest", "ks_ppm", "ks_at")
      .orderBy("source")
  }

  private val q217Sql =
    """WITH cells AS (SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
      |v AS (SELECT DISTINCT n_chars FROM cells),
      |sn AS (SELECT source, sum(c) AS n_s FROM cells GROUP BY 1),
      |tv AS (SELECT n_chars, sum(c) AS tc FROM cells GROUP BY 1),
      |g AS (SELECT sn.source, sn.n_s, v.n_chars, coalesce(cells.c, 0) AS c, tv.tc
      |  FROM sn CROSS JOIN v
      |  LEFT JOIN cells ON cells.source = sn.source AND cells.n_chars = v.n_chars
      |  JOIN tv ON tv.n_chars = v.n_chars),
      |cdf AS (SELECT *,
      |   sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum_s,
      |   sum(tc) OVER (PARTITION BY source ORDER BY n_chars) AS cum_t FROM g),
      |sc AS (SELECT *, max(cum_t) OVER (PARTITION BY source) AS n,
      |   abs(cum_s::HUGEINT * (max(cum_t) OVER (PARTITION BY source) - n_s)
      |       - (cum_t - cum_s)::HUGEINT * n_s) AS gap FROM cdf),
      |mx AS (SELECT *, max(gap) OVER (PARTITION BY source) AS max_gap FROM sc)
      |SELECT source, CAST(max(n_s) AS BIGINT) AS n_s,
      | CAST(max(n - n_s) AS BIGINT) AS n_rest,
      | CAST(max(max_gap * 1000000 // (n_s::HUGEINT * (n - n_s))) AS BIGINT) AS ks_ppm,
      | CAST(min(n_chars) AS BIGINT) AS ks_at
      |FROM mx WHERE gap = max_gap GROUP BY source ORDER BY source""".stripMargin

  // q224: WINSORIZED ROBUST AGGREGATE — the PREPROCESSING member of the
  // robust-stats family: q88 (median/MAD) DETECTS outliers and q217
  // scores shape drift, but a feature pipeline must also AGGREGATE
  // through contaminated values without letting one fat-finger balance
  // drag the segment mean — the standard fix is winsorization (clamp to
  // the [p05, p95] order statistics, then aggregate). Everything is
  // integer-exact: balances land on a cent grid (round(x·100) — both
  // engines' round is half-away-from-zero, and the ·100 product is the
  // same IEEE double on both), the cutoffs are true k-th ORDER STATISTICS
  // (k = ⌈0.05n⌉/⌈0.95n⌉; the k-th smallest is well-defined no matter how
  // row_number breaks ties among equal values), and the output carries
  // exact integer sums — no integer division whose negative-operand
  // rounding could differ across engines (balances go negative). Shape:
  // one rank window per segment (per-key sort — inherent to exact order
  // statistics, the q14 note; at 100 TB sub-key the partition or take
  // q76's sketch when approximate cutoffs suffice), a 5-row broadcast of
  // the cutoffs, and one partial-agg'd rollup of the clamped values.
  private def q224(s: SparkSession, d: String): DataFrame = {
    val cents = customer(s, d).select(col("c_mktsegment").as("seg"),
      expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
    val ranked = cents
      .withColumn("rn", row_number().over(Window.partitionBy("seg").orderBy("cents")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("seg")))
    val cuts = ranked.groupBy("seg")
      .agg(max(when(col("rn") === expr("(n * 5 + 99) div 100"), col("cents"))).as("lo_cents"),
        max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("cents"))).as("hi_cents"))
    cents.join(broadcast(cuts), "seg")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        max("lo_cents").as("lo_cents"), max("hi_cents").as("hi_cents"),
        sum("cents").as("sum_cents"),
        sum(expr("least(greatest(cents, lo_cents), hi_cents)")).as("wsum_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("n_lo_clip"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("n_hi_clip"))
      .orderBy("seg")
  }

  private val q224Sql =
    """WITH c AS (SELECT c_mktsegment AS seg,
      |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      |r AS (SELECT seg, cents,
      |   row_number() OVER (PARTITION BY seg ORDER BY cents) AS rn,
      |   count(*) OVER (PARTITION BY seg) AS n FROM c),
      |k AS (SELECT seg,
      |   max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo_cents,
      |   max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi_cents
      |  FROM r GROUP BY seg)
      |SELECT c.seg, count(*) AS n,
      | max(lo_cents) AS lo_cents, max(hi_cents) AS hi_cents,
      | CAST(sum(cents) AS BIGINT) AS sum_cents,
      | CAST(sum(least(greatest(cents, lo_cents), hi_cents)) AS BIGINT) AS wsum_cents,
      | CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_clip,
      | CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_clip
      |FROM c JOIN k USING (seg) GROUP BY c.seg ORDER BY seg""".stripMargin

  // q234: L-DIVERSITY AUDIT — the attribute-disclosure half of the
  // privacy pair (q148 measures RE-IDENTIFICATION: how many docs sit in
  // quasi-identifier classes smaller than k; this measures what a
  // linker LEARNS once linked): a class can be k-anonymous yet still
  // disclose, if every member shares the same sensitive value — the
  // classic l-diversity gap. QI here = (source, 100-char length band)
  // with `lang` as the sensitive attribute (deliberately DROPPED from
  // q148's QI triple: the audit asks whether source+shape alone pin the
  // language). Per l ∈ {2, 3, 5}: classes whose distinct-lang count is
  // below l, docs in them, risk in bp — and the ENTROPY-l variant
  // alongside (classes whose lang-distribution entropy, exact
  // fixed-point milli-bits via the shared FixedPoint.log2milli, is
  // below 1000·log2 l), which also catches the 99%-one-lang class that
  // distinct-counting calls diverse. Shape: one (source, band, lang)
  // grouped count — class×lang grain, bounded metadata — then class
  // rollup and a ×3 ladder explode at that grain; corpus total on a
  // broadcast crossJoin (the q148 topology).
  private def q234(s: SparkSession, d: String): DataFrame = {
    import FixedPoint.log2milli
    val ls = Seq(2L, 3L, 5L)
    // the entropy bar lives on the SAME fixed-point log2 scale as
    // h_milli (floor + linear intra-octave interpolation), so the
    // comparison is scale-consistent: log2milli(2)=1000, (3)=1500,
    // (5)=2250 — not the true 1000·log2 l, deliberately
    val log2l = Map(2L -> 1000L, 3L -> 1500L, 5L -> 2250L)
    val cell = documents(s, d)
      .groupBy(col("source"), expr("n_chars div 100").as("len_band"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("clog", log2milli("c"))
    val cls = cell.groupBy("source", "len_band")
      .agg(sum("c").as("n"), count(lit(1)).as("ld"), sum(expr("c * clog")).as("sum_clog"))
      .withColumn("h_milli", log2milli("n") - expr("sum_clog div n"))
    graft.Caches.persist(cls)
    cls.crossJoin(broadcast(cls.agg(sum("n").as("total"))))
      .select(explode(array(ls.map(l =>
        struct(lit(l).as("l"), lit(log2l(l)).as("hbar"))): _*)).as("lb"),
        col("n"), col("ld"), col("h_milli"), col("total"))
      .select(col("lb.l").as("l"), col("lb.hbar").as("hbar"),
        col("n"), col("ld"), col("h_milli"), col("total"))
      .groupBy("l")
      .agg(sum(when(col("ld") < col("l"), 1L).otherwise(0L)).as("classes_below_l"),
        sum(when(col("ld") < col("l"), col("n")).otherwise(0L)).as("docs_below_l"),
        sum(when(col("h_milli") < col("hbar"), 1L).otherwise(0L)).as("classes_below_hl"),
        sum(when(col("h_milli") < col("hbar"), col("n")).otherwise(0L)).as("docs_below_hl"),
        min("total").as("total"))
      .withColumn("risk_bp", expr("docs_below_l * 10000 div total"))
      .withColumn("entropy_risk_bp", expr("docs_below_hl * 10000 div total"))
      .select("l", "classes_below_l", "docs_below_l", "risk_bp",
        "classes_below_hl", "docs_below_hl", "entropy_risk_bp")
      .orderBy("l")
  }

  private val q234Sql =
    """WITH cell AS (SELECT source, n_chars // 100 AS len_band, lang, count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |cl AS (SELECT *,
      |   1000 * (length(bin(c)) - 1)
      |   + (c - (CAST(1 AS BIGINT) << (length(bin(c)) - 1))) * 1000
      |     // (CAST(1 AS BIGINT) << (length(bin(c)) - 1)) AS clog
      |  FROM cell),
      |cls AS (SELECT source, len_band, CAST(sum(c) AS BIGINT) AS n,
      |   count(*) AS ld, CAST(sum(c * clog) AS BIGINT) AS sum_clog
      |  FROM cl GROUP BY 1, 2),
      |ch AS (SELECT *,
      |   1000 * (length(bin(n)) - 1)
      |   + (n - (CAST(1 AS BIGINT) << (length(bin(n)) - 1))) * 1000
      |     // (CAST(1 AS BIGINT) << (length(bin(n)) - 1))
      |   - sum_clog // n AS h_milli
      |  FROM cls),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cls),
      |x AS (SELECT l, hbar, n, ld, h_milli, total FROM ch CROSS JOIN t
      |  CROSS JOIN (SELECT unnest([2, 3, 5]) AS l,
      |              unnest([1000, 1500, 2250]) AS hbar) ll)
      |SELECT CAST(l AS BIGINT) AS l,
      | CAST(sum(CASE WHEN ld < l THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_l,
      | CAST(sum(CASE WHEN ld < l THEN n ELSE 0 END) AS BIGINT) AS docs_below_l,
      | CAST(sum(CASE WHEN ld < l THEN n ELSE 0 END) * 10000 // min(total) AS BIGINT) AS risk_bp,
      | CAST(sum(CASE WHEN h_milli < hbar THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_hl,
      | CAST(sum(CASE WHEN h_milli < hbar THEN n ELSE 0 END) AS BIGINT) AS docs_below_hl,
      | CAST(sum(CASE WHEN h_milli < hbar THEN n ELSE 0 END) * 10000 // min(total) AS BIGINT) AS entropy_risk_bp
      |FROM x GROUP BY 1 ORDER BY l""".stripMargin

  // q231: TWO-PROPORTION EXPERIMENT GATE — the A/B COMPARISON member of
  // the rate family: q212's Wilson bound ranks ONE-sample rates safely;
  // an experiment readout compares TWO cohorts, and the standard gate is
  // the two-proportion z-test (equivalently the 2×2 χ² with one degree
  // of freedom). Cohorts are the reproducible user split (user_id
  // parity — the q74 split discipline at its simplest); each event_type
  // is read as a HEAVY-USAGE conversion metric at the USER grain (a user
  // converts on a type iff they fired it >= 20 times — user grain is the
  // correct experiment unit, event-grain counting would double-count
  // heavy users; the >= 20 bar keeps the metric non-degenerate on a
  // corpus where every user touches every type at least once, which
  // would otherwise leave zero variance and no verdict). The statistic
  // is EXACT integer: z² = Δ²·N·n1·n2 / (X·(N−X)·n1·n2-denominator)
  // algebra cross-multiplied so no proportion is ever materialized —
  // z2_milli = 1000·(x1·n2 − x2·n1)²·N div (X·(N−X)·n1·n2) in
  // DECIMAL(38) (the q141/q207 overflow idiom: at 1e9 users the squared
  // cross term is ~1e36 — inside 128-bit, far outside BIGINT);
  // significant = 1 ⇔ z2_milli ≥ 3841 (χ²₁ at 95%; integer 0/1 so the
  // hash types are engine-stable). Degenerate metrics (X = 0 or X = N)
  // report NULL — no variance, no verdict. Shape: one (user, type)
  // partial-agg'd count collapse, one user-grain parity tag, then the
  // whole test runs on the bounded type×cohort grid.
  private def q231(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select(col("user_id")).distinct()
      .withColumn("cohort", expr("CAST(user_id % 2 AS INT)"))
    // heavy-usage conversion at user grain (≥ 20 events of the type),
    // already cohort-tagged; the partial-agg'd count collapse is the only
    // corpus-scale shuffle
    val conv = events(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_ev")).filter(col("n_ev") >= 20)
      .withColumn("cohort", expr("CAST(user_id % 2 AS INT)"))
    val grid = conv.groupBy("event_type", "cohort")
      .agg(count(lit(1)).as("x"))
    val totals = users.groupBy("cohort").agg(count(lit(1)).as("n"))
    // full type×cohort frame (bounded): a cohort with ZERO converters for
    // a type must contribute x = 0, not vanish from the test
    val frame = events(s, d).select("event_type").distinct().crossJoin(totals)
    val wide = frame
      .join(grid, Seq("event_type", "cohort"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .groupBy("event_type")
      .agg(sum(when(col("cohort") === 0, col("n"))).as("n1"),
        sum(when(col("cohort") === 0, col("x"))).as("x1"),
        sum(when(col("cohort") === 1, col("n"))).as("n2"),
        sum(when(col("cohort") === 1, col("x"))).as("x2"))
    wide
      .withColumn("z2_milli", expr(
        """CASE WHEN (x1 + x2) > 0 AND (x1 + x2) < (n1 + n2) THEN
          | CAST((CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1)
          |   * (CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1)
          |   * (n1 + n2) * 1000
          |   div (CAST(x1 + x2 AS DECIMAL(38,0)) * (n1 + n2 - x1 - x2) * n1 * n2)
          |  AS BIGINT)
          |END""".stripMargin))
      .withColumn("significant", expr("CAST(z2_milli >= 3841 AS BIGINT)"))
      .select("event_type", "n1", "x1", "n2", "x2", "z2_milli", "significant")
      .orderBy("event_type")
  }

  private val q231Sql =
    """WITH users AS (SELECT DISTINCT user_id, CAST(user_id % 2 AS INT) AS cohort
      |  FROM events),
      |conv AS (SELECT user_id, CAST(user_id % 2 AS INT) AS cohort, event_type
      |  FROM events GROUP BY 1, 2, 3 HAVING count(*) >= 20),
      |grid AS (SELECT event_type, cohort, count(*) AS x FROM conv GROUP BY 1, 2),
      |tot AS (SELECT cohort, count(*) AS n FROM users GROUP BY 1),
      |frame AS (SELECT t.event_type, c.cohort, c.n
      |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN tot c),
      |wide AS (SELECT f.event_type,
      |   CAST(sum(CASE WHEN f.cohort = 0 THEN f.n END) AS BIGINT) AS n1,
      |   CAST(sum(CASE WHEN f.cohort = 0 THEN coalesce(g.x, 0) END) AS BIGINT) AS x1,
      |   CAST(sum(CASE WHEN f.cohort = 1 THEN f.n END) AS BIGINT) AS n2,
      |   CAST(sum(CASE WHEN f.cohort = 1 THEN coalesce(g.x, 0) END) AS BIGINT) AS x2
      |  FROM frame f LEFT JOIN grid g USING (event_type, cohort)
      |  GROUP BY f.event_type)
      |SELECT event_type, n1, x1, n2, x2,
      | CASE WHEN (x1 + x2) > 0 AND (x1 + x2) < (n1 + n2) THEN
      |  CAST((x1::HUGEINT * n2 - x2::HUGEINT * n1)
      |    * (x1::HUGEINT * n2 - x2::HUGEINT * n1)
      |    * (n1 + n2) * 1000
      |    // (CAST(x1 + x2 AS HUGEINT) * (n1 + n2 - x1 - x2) * n1 * n2)
      |   AS BIGINT)
      | END AS z2_milli,
      | CASE WHEN (x1 + x2) > 0 AND (x1 + x2) < (n1 + n2) THEN
      |  CAST((x1::HUGEINT * n2 - x2::HUGEINT * n1)
      |    * (x1::HUGEINT * n2 - x2::HUGEINT * n1)
      |    * (n1 + n2) * 1000
      |    // (CAST(x1 + x2 AS HUGEINT) * (n1 + n2 - x1 - x2) * n1 * n2) >= 3841 AS BIGINT)
      | END AS significant
      |FROM wide ORDER BY event_type""".stripMargin

  // q248: POPULATION STABILITY INDEX (PSI) DRIFT AUDIT — the drift
  // family's BANDED industry metric (q217's KS answers "did it move?"
  // with a sup-norm test; q121 scores strata against a baseline; PSI is
  // the score risk teams actually threshold, with standard decision
  // bands): per source vs rest-of-corpus over the doc-length OCTAVE
  // histogram (length(bin(n_chars)) — ≤ ~14 buckets whatever the corpus
  // size, the bounded-domain discipline every drift audit here shares).
  // PSI = Σ_k (p_k − q_k)·log(p_k/q_k), computed here in EXACT integer
  // milli-BITS (log2, not ln — documented; the standard 0.10/0.25 nat
  // thresholds convert to 144/361 milli-bits): with add-one smoothing
  // over the GLOBAL bucket domain (both sides see the same K buckets, so
  // zero-count buckets contribute finitely), a = c+1, b = (g−c)+1,
  // A = n+K, B = (N−n)+K, each bucket contributes
  // (aB − bA)·(log2milli(aB) − log2milli(bA)) div (A·B) — the factor and
  // the log share sign, so every term is ≥ 0 exactly as PSI requires.
  // Fixed-point bounds: aB ≤ N² and the summand ≤ N²·log2milli(N²), so
  // BIGINT holds to N ≈ 4e8 docs per audit scope; beyond that the audit
  // runs per-partition-date anyway (the scope a drift monitor wants).
  // Shape at 100 TB: ONE (source, octave) groupBy collapses the corpus
  // to a ≤ 20×14 grid; the rest-of-corpus side is the broadcast global
  // octave rollup minus own counts — no second scan, no self-join.
  /** q248's bounded (source, length-octave, count) cell grid — also the
    * state [[graft.streaming.DriftStream]] maintains incrementally (sum
    * of counts: associative + commutative, so batch order cannot change
    * the converged grid). */
  private[graft] def octaveCellsFrom(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), length(bin(col("n_chars"))).cast("long").as("oct"))
      .agg(count(lit(1)).as("c"))

  private def q248(s: SparkSession, d: String): DataFrame = {
    val cell = octaveCellsFrom(documents(s, d))
    Caches.persist(cell)
    psiFromCells(cell)
  }

  /** q248's closing pass over a (source, oct, c) cell grid — shared with
    * the streaming twin so stream ≡ batch holds by construction. */
  private[graft] def psiFromCells(cell: DataFrame): DataFrame = {
    import FixedPoint.log2milli
    val octs = cell.groupBy("oct").agg(sum("c").as("g"))
    val srcs = cell.groupBy("source").agg(sum("c").as("n"))
    val tot = octs.agg(sum("g").as("total"), count(lit(1)).as("k"))
    srcs.crossJoin(broadcast(octs)).crossJoin(broadcast(tot))
      .join(cell, Seq("source", "oct"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .withColumn("num", expr("(c0 + 1) * ((total - n) + k)"))
      .withColumn("den", expr("((g - c0) + 1) * (n + k)"))
      .withColumn("term",
        (col("num") - col("den")) * (log2milli("num") - log2milli("den")))
      .groupBy("source")
      .agg(min("n").as("n_docs"), min("k").as("n_buckets"),
        expr("sum(term) div (min(n + k) * min((total - n) + k))").as("psi_milli"))
      .withColumn("band", expr(
        "CASE WHEN psi_milli < 144 THEN '1_stable' " +
          "WHEN psi_milli < 361 THEN '2_moderate' ELSE '3_shifted' END"))
      .select("source", "n_docs", "n_buckets", "psi_milli", "band")
      .orderBy("source")
  }

  private val q248Sql =
    """WITH cell AS (SELECT source, CAST(length(bin(n_chars)) AS BIGINT) AS oct,
      |   count(*) AS c FROM documents GROUP BY 1, 2),
      |octs AS (SELECT oct, CAST(sum(c) AS BIGINT) AS g FROM cell GROUP BY 1),
      |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS total, count(*) AS k FROM octs),
      |grid AS (SELECT s.source, o.oct, s.n, o.g, t.total, t.k,
      |   COALESCE(c.c, 0) AS c0
      |  FROM srcs s CROSS JOIN octs o CROSS JOIN tot t
      |  LEFT JOIN cell c ON c.source = s.source AND c.oct = o.oct),
      |lg AS (SELECT source, n, k, total,
      |   (c0 + 1) * ((total - n) + k) AS num,
      |   ((g - c0) + 1) * (n + k) AS den
      |  FROM grid),
      |t2 AS (SELECT source, n, k, total,
      |   (num - den) * (
      |     (1000 * (length(bin(num)) - 1)
      |      + (num - (CAST(1 AS BIGINT) << (length(bin(num)) - 1))) * 1000
      |        // (CAST(1 AS BIGINT) << (length(bin(num)) - 1)))
      |   - (1000 * (length(bin(den)) - 1)
      |      + (den - (CAST(1 AS BIGINT) << (length(bin(den)) - 1))) * 1000
      |        // (CAST(1 AS BIGINT) << (length(bin(den)) - 1)))) AS term
      |  FROM lg)
      |SELECT source, min(n) AS n_docs, CAST(min(k) AS BIGINT) AS n_buckets,
      | CAST(sum(term) AS BIGINT) // (min(n + k) * min((total - n) + k)) AS psi_milli,
      | CASE WHEN CAST(sum(term) AS BIGINT) // (min(n + k) * min((total - n) + k)) < 144
      |   THEN '1_stable'
      |  WHEN CAST(sum(term) AS BIGINT) // (min(n + k) * min((total - n) + k)) < 361
      |   THEN '2_moderate' ELSE '3_shifted' END AS band
      |FROM t2 GROUP BY source ORDER BY source""".stripMargin

  // q249: T-CLOSENESS AUDIT — completes the disclosure triad the privacy
  // family now walks in order (q148 k-anonymity: CAN you be linked;
  // q234 l-diversity: does the linked class have >1 sensitive value;
  // this: is the class's sensitive DISTRIBUTION close to the corpus's —
  // the attack l-diversity misses is skew: a class that is 98% one lang
  // in a 50/50 corpus discloses even with 2 distinct values present).
  // Li/Li/Venkatasubramanian's t-closeness with the categorical ground
  // distance (equal-distance EMD = total-variation = ½·Σ|p_v − q_v|),
  // exact in integer milli over the common denominator n·N:
  // emd_milli = 1000·Σ_v |cnt_v·N − g_v·n| div (2·n·N) — the absolute
  // sum includes langs ABSENT from the class (their term is g_v·n: a
  // class missing a common lang is itself a leak). Same QI as q234
  // ((source, 100-char band)) so the triad reads as one ladder over one
  // linkage model. Report: per t ∈ {100, 200, 350} milli, classes/docs
  // whose EMD exceeds t + risk in bp + the corpus max EMD.
  // Shape at 100 TB: one (class, lang) groupBy → bounded grid; global
  // lang rollup broadcast; the t-ladder explodes at class grain only.
  private def q249(s: SparkSession, d: String): DataFrame = {
    val ts = Seq(100L, 200L, 350L)
    val cell = documents(s, d)
      .groupBy(col("source"), expr("n_chars div 100").as("len_band"), col("lang"))
      .agg(count(lit(1)).as("c"))
    Caches.persist(cell)
    val langs = cell.groupBy("lang").agg(sum("c").as("g"))
    val cls = cell.groupBy("source", "len_band").agg(sum("c").as("n"))
    val tot = langs.agg(sum("g").as("total"))
    val emd = cls.crossJoin(broadcast(langs)).crossJoin(broadcast(tot))
      .join(cell, Seq("source", "len_band", "lang"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .groupBy("source", "len_band")
      .agg(min("n").as("n"), min("total").as("total"),
        expr("sum(abs(c0 * total - g * n))").as("l1_num"))
      .withColumn("emd_milli", expr("l1_num * 1000 div (2 * n * total)"))
    emd.select(explode(array(ts.map(lit): _*)).as("t"),
        col("n"), col("emd_milli"), col("total"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("emd_milli") > col("t"), 1L).otherwise(0L)).as("classes_above_t"),
        sum(when(col("emd_milli") > col("t"), col("n")).otherwise(0L)).as("docs_above_t"),
        max("emd_milli").as("max_emd_milli"), min("total").as("total"))
      .withColumn("risk_bp", expr("docs_above_t * 10000 div total"))
      .select("t", "n_classes", "classes_above_t", "docs_above_t", "risk_bp",
        "max_emd_milli")
      .orderBy("t")
  }

  private val q249Sql =
    """WITH cell AS (SELECT source, n_chars // 100 AS len_band, lang, count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |langs AS (SELECT lang, CAST(sum(c) AS BIGINT) AS g FROM cell GROUP BY 1),
      |cls AS (SELECT source, len_band, CAST(sum(c) AS BIGINT) AS n
      |  FROM cell GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS total FROM langs),
      |emd AS (SELECT cl.source, cl.len_band, min(cl.n) AS n, min(t.total) AS total,
      |   CAST(sum(abs(COALESCE(c.c, 0) * t.total - l.g * cl.n)) AS BIGINT) AS l1_num
      |  FROM cls cl CROSS JOIN langs l CROSS JOIN tot t
      |  LEFT JOIN cell c ON c.source = cl.source AND c.len_band = cl.len_band
      |    AND c.lang = l.lang
      |  GROUP BY 1, 2),
      |em AS (SELECT *, l1_num * 1000 // (2 * n * total) AS emd_milli FROM emd)
      |SELECT t, count(*) AS n_classes,
      | CAST(sum(CASE WHEN emd_milli > t THEN 1 ELSE 0 END) AS BIGINT) AS classes_above_t,
      | CAST(sum(CASE WHEN emd_milli > t THEN n ELSE 0 END) AS BIGINT) AS docs_above_t,
      | CAST(sum(CASE WHEN emd_milli > t THEN n ELSE 0 END) AS BIGINT) * 10000
      |   // min(total) AS risk_bp,
      | max(emd_milli) AS max_emd_milli
      |FROM em CROSS JOIN (SELECT unnest([CAST(100 AS BIGINT), 200, 350]) AS t) tt
      |GROUP BY t ORDER BY t""".stripMargin

  // q265: MERKLE PARTITION DIFF — the replica-reconciliation primitive
  // behind anti-entropy in every large replicated store (Dynamo/
  // Cassandra repair, DynamoDB global tables): two 100 TB replicas of a
  // corpus cannot be diffed row-by-row across a WAN, but a hash TREE
  // localizes any divergence in log(fanout) round trips exchanging only
  // node digests. Per side, each row folds into its partition's leaf
  // digest via XOR of a 40-bit row hash — XOR because it is commutative
  // (scan order free), incrementally maintainable (insert and delete are
  // the SAME operation — xor the row hash in), and overflow-free where an
  // ANSI-mode additive checksum is not; the 64 leaf digests then roll up
  // a fanout-4 tree (levels 3→0) entirely on the ≤ 64-row digest grid.
  // The replica here is the corpus with two planted fault classes — a
  // row LOST in flight (doc_id % 151 = 40) and a row silently CORRUPTED
  // (doc_id % 97 = 13, one appended byte) — and the output is exactly
  // what a repair protocol walks: the diverged nodes per level, root
  // down, ending at the leaves a row-level repair would then fetch. At
  // 100 TB: row hashing and the leaf fold are scan-local per side (one
  // partial-agg'd groupBy to 64 rows), levels are grid arithmetic, and
  // the cross-replica exchange is 64 digests, not the corpus.
  /** q265's leaf-digest fold, shared with the MerkleStream twin: 40-bit
    * row hash (10 hex chars — the q260 overflow-bound convention) XORed
    * per `doc_id % 64` leaf. XOR makes the digest scan-order free AND
    * incrementally maintainable: folding the same row in twice cancels
    * it, so insert and delete are one operation. */
  private[graft] def merkleLeaves(rows: DataFrame): DataFrame =
    rows.withColumn("leaf", expr("doc_id % 64"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 10), 16, 10) AS BIGINT)"))
      .groupBy("leaf").agg(expr("bit_xor(h)").as("hl"))

  private def q265(s: SparkSession, d: String): DataFrame = {
    def leaves(divergent: Boolean) = {
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val t = if (!divergent) base
        else base.filter(expr("doc_id % 151 != 40"))
          .withColumn("text", expr("IF(doc_id % 97 = 13, concat(text, 'X'), text)"))
      merkleLeaves(t)
    }
    def levels(lv: DataFrame) = (0 to 3).map { l =>
      val dv = Seq(64L, 16L, 4L, 1L)(l)
      lv.groupBy(expr(s"leaf div $dv").as("node_id"))
        .agg(expr("bit_xor(hl)").as("h")).withColumn("level", lit(l.toLong))
    }.reduce(_ unionByName _)
    val a = levels(leaves(divergent = false)).withColumnRenamed("h", "h_a")
    val b = levels(leaves(divergent = true)).withColumnRenamed("h", "h_b")
    a.join(b, Seq("level", "node_id"), "full_outer")
      .withColumn("h_a", coalesce(col("h_a"), lit(0L)))
      .withColumn("h_b", coalesce(col("h_b"), lit(0L)))
      .filter(col("h_a") =!= col("h_b"))
      .select("level", "node_id", "h_a", "h_b")
      .orderBy("level", "node_id")
  }

  private val q265Sql =
    """WITH a0 AS (SELECT doc_id % 64 AS leaf,
      |   ('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 10))::BIGINT AS h
      |  FROM documents),
      |b0 AS (SELECT doc_id % 64 AS leaf,
      |   ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
      |     CASE WHEN doc_id % 97 = 13 THEN text || 'X' ELSE text END), 1, 10))::BIGINT AS h
      |  FROM documents WHERE doc_id % 151 != 40),
      |la AS (SELECT leaf, bit_xor(h) AS hl FROM a0 GROUP BY 1),
      |lb AS (SELECT leaf, bit_xor(h) AS hl FROM b0 GROUP BY 1),
      |dv AS (SELECT * FROM (VALUES (0, 64), (1, 16), (2, 4), (3, 1)) AS t(level, dv)),
      |na AS (SELECT CAST(level AS BIGINT) AS level, leaf // dv AS node_id,
      |   bit_xor(hl) AS h_a FROM la CROSS JOIN dv GROUP BY 1, 2),
      |nb AS (SELECT CAST(level AS BIGINT) AS level, leaf // dv AS node_id,
      |   bit_xor(hl) AS h_b FROM lb CROSS JOIN dv GROUP BY 1, 2)
      |SELECT level, node_id, COALESCE(h_a, 0) AS h_a, COALESCE(h_b, 0) AS h_b
      |FROM na FULL JOIN nb USING (level, node_id)
      |WHERE COALESCE(h_a, 0) != COALESCE(h_b, 0)
      |ORDER BY level, node_id""".stripMargin

  // q267: SPRT SEQUENTIAL EXPERIMENT MONITOR — the SEQUENTIAL member of
  // the experiment family: q231 is a fixed-horizon test (one verdict
  // after ALL data — peeking at it daily inflates false positives
  // catastrophically), while Wald's Sequential Probability Ratio Test is
  // the design built FOR daily peeking: after each day the cumulative
  // log-likelihood ratio between H1 (p = 250‰) and H0 (p = 200‰) moves
  // by ws per success and wf per failure, and the experiment STOPS the
  // first day the ratio crosses either Wald boundary ±log2((1−β)/α)
  // (α = β = 0.05 → ±4248 milli-bits) — on average far earlier than any
  // fixed horizon with the same error rates. The per-observation weights
  // log2(p1/p0) = 322 and log2((1−p1)/(1−p0)) = −93 milli-bits and the
  // boundaries are PRECOMPUTED literals injected identically into both
  // engines (the q261 convention: a runtime float log would diverge in
  // the last digit). An observation is an event, success = value ≥ 100
  // (vm ≥ 100000). Shape at 100 TB: one (type, day) partial-agg'd
  // collapse is the only corpus-scale shuffle; the running LLR, the
  // first-crossing scan, and the verdict all run on the bounded
  // type × day grid with q206's window discipline.
  /** q267's per-(type, day) trial grid — the associative sum-merge state
    * the SprtStream twin maintains incrementally. */
  private[graft] def sprtDailyFrom(eventsDf: DataFrame): DataFrame =
    eventsDf
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .withColumn("succ", expr("IF(CAST(round(value * 1000) AS BIGINT) >= 100000, 1L, 0L)"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_d"), sum("succ").as("x_d"))

  /** q267's closing pass over the bounded daily grid — run verbatim by
    * the streaming twin against its maintained grid, so stream ≡ batch
    * holds by construction. */
  private[graft] def sprtFromDaily(grid: DataFrame): DataFrame = {
    val (ws, wf, bnd) = (322L, -93L, 4248L)
    val daily = grid
      .withColumn("llr_d", expr(s"x_d * $ws + (n_d - x_d) * ($wf)"))
      .withColumn("cum", sum("llr_d").over(
        Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("days"),
        min(when(col("cum") >= bnd, col("day"))).as("d_h1"),
        min(when(col("cum") <= -bnd, col("day"))).as("d_h0"),
        max(when(col("cum") >= bnd, lit(1L)).otherwise(lit(0L))).as("hit_h1"),
        max(when(col("cum") <= -bnd, lit(1L)).otherwise(lit(0L))).as("hit_h0"),
        expr("max_by(cum, day)").as("final_llr_milli"))
      .withColumn("decision", expr(
        """CASE
          | WHEN hit_h1 = 1 AND (hit_h0 = 0 OR d_h1 <= d_h0) THEN 'accept_h1'
          | WHEN hit_h0 = 1 THEN 'accept_h0'
          | ELSE 'continue' END""".stripMargin))
      .withColumn("decision_day", expr(
        """CASE
          | WHEN hit_h1 = 1 AND (hit_h0 = 0 OR d_h1 <= d_h0) THEN d_h1
          | WHEN hit_h0 = 1 THEN d_h0
          |END""".stripMargin))
      .select("event_type", "days", "decision", "decision_day", "final_llr_milli")
      .orderBy("event_type")
  }

  private def q267(s: SparkSession, d: String): DataFrame =
    sprtFromDaily(sprtDailyFrom(events(s, d)))

  private val q267Sql =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |   count(*) AS n_d,
      |   sum(CASE WHEN CAST(round(value * 1000) AS BIGINT) >= 100000 THEN 1 ELSE 0 END) AS x_d
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT event_type, day, n_d, x_d,
      |   sum(x_d * 322 + (n_d - x_d) * (-93))
      |     OVER (PARTITION BY event_type ORDER BY day) AS cum
      |  FROM daily),
      |g AS (SELECT event_type, count(*) AS days,
      |   min(CASE WHEN cum >= 4248 THEN day END) AS d_h1,
      |   min(CASE WHEN cum <= -4248 THEN day END) AS d_h0,
      |   max(CASE WHEN cum >= 4248 THEN 1 ELSE 0 END) AS hit_h1,
      |   max(CASE WHEN cum <= -4248 THEN 1 ELSE 0 END) AS hit_h0,
      |   CAST(max_by(cum, day) AS BIGINT) AS final_llr_milli
      |  FROM c GROUP BY 1)
      |SELECT event_type, days,
      | CASE WHEN hit_h1 = 1 AND (hit_h0 = 0 OR d_h1 <= d_h0) THEN 'accept_h1'
      |  WHEN hit_h0 = 1 THEN 'accept_h0' ELSE 'continue' END AS decision,
      | CASE WHEN hit_h1 = 1 AND (hit_h0 = 0 OR d_h1 <= d_h0) THEN d_h1
      |  WHEN hit_h0 = 1 THEN d_h0 END AS decision_day,
      | final_llr_milli
      |FROM g ORDER BY event_type""".stripMargin

  // q268: CAPTURE–RECAPTURE COVERAGE ESTIMATE (Chapman) — the estimator
  // for the size of a universe you cannot enumerate: how many documents
  // does a source REALLY have, when all you can afford (or reach — a
  // crawl frontier, a partner's firehose) is two independent samples?
  // Lincoln–Petersen ecology: capture n1, recapture n2, overlap m ⇒
  // N̂ ≈ n1·n2/m; Chapman's (n1+1)(n2+1)/(m+1) − 1 form is the
  // small-sample-unbiased variant and is PURE INTEGER. Both captures
  // here are deterministic hash samples with DIFFERENT salts (md5 hex
  // prefix bands — the q74/q262 convention), which makes them provably
  // independent, and the estimate per source is compared against the
  // enumerable truth. The third arm is the trap the method is named for:
  // a DEPENDENT recapture (same salt, nested band — "recrawl the same
  // frontier") makes m = n2 and the estimator collapse to n1, silently
  // reporting capture-1's size as the universe — visible side by side.
  // At 100 TB the real use inverts the demo: truth is unreachable, the
  // two salted captures are cheap row-local filters, and only counts
  // cross the exchange (one partial-agg'd groupBy).
  private def q268(s: SparkSession, d: String): DataFrame = {
    def cap(salt: String, hexes: String) =
      expr(s"substring(md5(concat(CAST(doc_id AS STRING), '$salt')), 1, 1) IN ($hexes)")
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .withColumn("c1", cap("c1", "'0','1','2','3','4','5'"))
      .withColumn("c2", cap("c2", "'0','1','2','3'"))
      .withColumn("c2dep", cap("c1", "'0','1','2','3'"))
      .groupBy("source").agg(
        count(lit(1)).as("n_true"),
        sum(when(col("c1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("c2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("c1") && col("c2"), 1L).otherwise(0L)).as("m"),
        sum(when(col("c2dep"), 1L).otherwise(0L)).as("n2d"),
        sum(when(col("c1") && col("c2dep"), 1L).otherwise(0L)).as("md"))
      .withColumn("chapman_est", expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1"))
      .withColumn("chapman_err_milli", expr("abs(chapman_est - n_true) * 1000 div n_true"))
      .withColumn("dep_est", expr("(n1 + 1) * (n2d + 1) div (md + 1) - 1"))
      .withColumn("dep_err_milli", expr("abs(dep_est - n_true) * 1000 div n_true"))
      .select(col("source"), col("n_true"), col("n1"), col("n2"), col("m"),
        col("chapman_est"), col("chapman_err_milli"),
        col("dep_est"), col("dep_err_milli"))
      .orderBy("source")
  }

  private val q268Sql =
    """WITH t AS (SELECT source,
      |   substr(md5(doc_id::VARCHAR || 'c1'), 1, 1) IN ('0','1','2','3','4','5') AS c1,
      |   substr(md5(doc_id::VARCHAR || 'c2'), 1, 1) IN ('0','1','2','3') AS c2,
      |   substr(md5(doc_id::VARCHAR || 'c1'), 1, 1) IN ('0','1','2','3') AS c2dep
      |  FROM documents),
      |g AS (SELECT source, count(*) AS n_true,
      |   CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |   CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS m,
      |   CAST(sum(CASE WHEN c2dep THEN 1 ELSE 0 END) AS BIGINT) AS n2d,
      |   CAST(sum(CASE WHEN c1 AND c2dep THEN 1 ELSE 0 END) AS BIGINT) AS md
      |  FROM t GROUP BY 1)
      |SELECT source, n_true, n1, n2, m,
      | (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman_est,
      | abs((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 1000 // n_true AS chapman_err_milli,
      | (n1 + 1) * (n2d + 1) // (md + 1) - 1 AS dep_est,
      | abs((n1 + 1) * (n2d + 1) // (md + 1) - 1 - n_true) * 1000 // n_true AS dep_err_milli
      |FROM g ORDER BY source""".stripMargin

  // q276: DP NOISY-COUNT RELEASE AUDIT — completes the disclosure stack
  // (q148 k-anonymity, q234 l-diversity, q249 t-closeness audit WHAT may
  // be released; this audits HOW a count is released): the Laplace
  // mechanism at sensitivity 1 adds b = 1/ε noise, and the engineering
  // decision is the ε rung — which this query prices by releasing every
  // per-source count at three rungs and reporting the realized |error|
  // beside the mechanism's expected |error| (= b, exactly 10⁶/ε_milli).
  // The noise is drawn through the EXACT integer Laplace inverse CDF:
  // hash-uniform u (24-bit, the q264 convention), tail distance
  // v = |2u − 2²⁴|, ln(1 − 2|u−½|) = (log2milli(2²⁴−v) − log2milli(2²⁴))
  // · 693147 ppm via the shared FixedPoint — no float log, both engines
  // draw the identical noise and the oracle hash-checks the draw. THE
  // CAVEAT IS THE POINT OF THE SCALADOC: hash-seeded noise is
  // deterministic and therefore NOT private — this operator audits the
  // mechanism's utility calibration (the ε ladder a data-release review
  // actually argues about); production swaps the hash for a CSPRNG and
  // nothing else changes. Shape: one count collapse, then the whole
  // mechanism runs on the sources × 3 grid.
  private def q276(s: SparkSession, d: String): DataFrame = {
    import FixedPoint.log2milli
    val counts = Tables.documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n"))
    val rungs = Seq(100L, 500L, 1000L)
    counts
      .crossJoin(broadcast(
        counts.sparkSession.range(0, 1).select(
          explode(lit(rungs.toArray)).as("eps_milli"))))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat(source, ':', CAST(eps_milli AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .withColumn("v", expr("abs(2 * u - 16777216)"))
      .withColumn("lnt", expr("16777216 - v"))
      // ln(1−2|u−½|) ≤ 0: keep the divide's numerator NON-NEGATIVE and
      // negate after (the B205 truncate-vs-floor seam)
      .withColumn("l2t", log2milli("lnt"))
      .withColumn("ln_milli", expr("-((24000 - l2t) * 693147 div 1000000)"))
      .withColumn("noise_milli", expr(
        "IF(u >= 8388608, 1L, -1L) * ((-ln_milli) * 1000 div eps_milli)"))
      .withColumn("released_milli", expr("n * 1000 + noise_milli"))
      .withColumn("abs_err_milli", expr("abs(noise_milli)"))
      .withColumn("expected_abs_err_milli", expr("1000000 div eps_milli"))
      .select(col("source"), col("eps_milli"), col("n"), col("noise_milli"),
        col("released_milli"), col("abs_err_milli"), col("expected_abs_err_milli"))
      .orderBy("source", "eps_milli")
  }

  private val q276Sql = {
    def l2m(x: String): String =
      s"(1000 * (length(bin($x)) - 1) + ($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))" +
        s" * 1000 // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |g AS (SELECT source, n, eps_milli,
       |   ('0x' || substr(md5(source || ':' || eps_milli::VARCHAR), 1, 6))::BIGINT AS u
       |  FROM c CROSS JOIN (SELECT unnest([CAST(100 AS BIGINT), 500, 1000]) AS eps_milli) e),
       |v AS (SELECT *, abs(2 * u - 16777216) AS v FROM g),
       |l AS (SELECT *, -CAST((24000 - ${l2m("(16777216 - v)")}) * 693147 // 1000000 AS BIGINT) AS ln_milli
       |  FROM v),
       |nz AS (SELECT *, (CASE WHEN u >= 8388608 THEN 1 ELSE -1 END)
       |    * ((-ln_milli) * 1000 // eps_milli) AS noise_milli
       |  FROM l)
       |SELECT source, eps_milli, n, CAST(noise_milli AS BIGINT) AS noise_milli,
       | CAST(n * 1000 + noise_milli AS BIGINT) AS released_milli,
       | CAST(abs(noise_milli) AS BIGINT) AS abs_err_milli,
       | 1000000 // eps_milli AS expected_abs_err_milli
       |FROM nz ORDER BY source, eps_milli""".stripMargin
  }

  // q278: BENJAMINI–HOCHBERG FDR GATE — the multiple-testing control the
  // repo's test family (q191/q231 proportions, q209 χ², q217 KS, q248
  // PSI, q267 SPRT) runs WITHOUT: a monitoring deployment evaluates the
  // whole (event_type × hour-of-day) grid every day, and at α = 0.05
  // per cell the naive gate hands back 6 false alarms per 120 quiet
  // cells BY DESIGN — alert fatigue is a multiple-testing bug. BH(α)
  // fixes the FALSE DISCOVERY RATE instead: sort the m tests by
  // significance, find the largest k with p₍ₖ₎ ≤ kα/m, reject exactly
  // ranks 1..k. Everything is exact integer: each cell's two-proportion
  // z² (cell vs its own type's complement — q231's DECIMAL(38)
  // cross-multiplied algebra, zero proportions materialized), and the
  // p₍ₖ₎ ≤ kα/m comparisons pre-inverted into a 120-literal χ²₁
  // quantile ladder (T_k in milli, z² ≥ T_k ⇔ p ≤ kα/m — computed once
  // at authoring time, injected identically into both engines; rung 120
  // is 3841 = the uncorrected threshold, the ladder's built-in sanity
  // check). The test FAMILY is the declared 5×24 grid — m is fixed by
  // design, absent cells enter with n = 0 and z² = 0 — so the ladder is
  // a constant, not data. Both verdicts are reported per cell; the gap
  // between naive and BH rejections IS the operator's deliverable.
  // Shape: one (type, hour) partial-agg'd collapse; ranking, ladder
  // lookup, and the k* scan all run on the 120-cell grid (q77 pmod
  // single-partition idiom).
  private def q278(s: SparkSession, d: String): DataFrame = {
    val ladder = Seq(12456, 11165, 10415, 9885, 9475, 9141, 8859, 8615,
      8401, 8210, 8037, 7879, 7735, 7601, 7477, 7361, 7252, 7149, 7052,
      6960, 6873, 6790, 6711, 6635, 6562, 6492, 6425, 6361, 6299, 6239,
      6180, 6124, 6070, 6017, 5966, 5916, 5868, 5821, 5776, 5731, 5688,
      5646, 5604, 5564, 5525, 5486, 5449, 5412, 5376, 5341, 5306, 5272,
      5239, 5207, 5175, 5144, 5113, 5083, 5053, 5024, 4995, 4967, 4939,
      4912, 4885, 4859, 4833, 4808, 4783, 4758, 4733, 4709, 4686, 4662,
      4639, 4616, 4594, 4572, 4550, 4529, 4507, 4486, 4466, 4445, 4425,
      4405, 4385, 4366, 4347, 4328, 4309, 4290, 4272, 4254, 4236, 4218,
      4200, 4183, 4166, 4149, 4132, 4115, 4099, 4082, 4066, 4050, 4034,
      4019, 4003, 3988, 3972, 3957, 3942, 3928, 3913, 3898, 3884, 3870,
      3855, 3841)
    val arr = ladder.mkString("array(", "L, ", "L)")
    val ev = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("succ", expr("IF(CAST(round(value * 1000) AS BIGINT) >= 100000, 1L, 0L)"))
    val cells = ev.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n1"), sum("succ").as("x1"))
    val types = ev.groupBy("event_type")
      .agg(count(lit(1)).as("nt"), sum("succ").as("xt"))
    val grid = types
      .crossJoin(broadcast(
        types.sparkSession.range(0, 24).select(col("id").as("hod"))))
      .join(cells, Seq("event_type", "hod"), "left")
      .withColumn("n1", coalesce(col("n1"), lit(0L)))
      .withColumn("x1", coalesce(col("x1"), lit(0L)))
      .withColumn("n2", expr("nt - n1")).withColumn("x2", expr("xt - x1"))
      .withColumn("z2_milli", expr(
        """CASE WHEN n1 > 0 AND n2 > 0 AND (x1 + x2) > 0 AND (x1 + x2) < (n1 + n2) THEN
          | CAST((CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1)
          |   * (CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1)
          |   * (n1 + n2) * 1000
          |   div (CAST(x1 + x2 AS DECIMAL(38,0)) * (n1 + n2 - x1 - x2) * n1 * n2)
          |  AS BIGINT)
          |ELSE 0L END""".stripMargin))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(pmod(col("hod"), lit(1L)))
          .orderBy(desc("z2_milli"), col("event_type"), col("hod"))))
      .withColumn("bh_t_milli", expr(s"element_at($arr, CAST(rnk AS INT))"))
      .withColumn("ok", expr("IF(z2_milli >= bh_t_milli, rnk, 0L)"))
    grid
      .withColumn("kstar", max("ok").over(
        Window.partitionBy(pmod(col("hod"), lit(1L)))))
      .select(col("event_type"), col("hod"), col("n1"), col("x1"),
        col("z2_milli"), col("rnk"), col("bh_t_milli"),
        expr("CAST(rnk <= kstar AS BIGINT)").as("bh_reject"),
        expr("CAST(z2_milli >= 3841 AS BIGINT)").as("naive_reject"))
      .orderBy("event_type", "hod")
  }

  private val q278Sql = {
    val ladder = Seq(12456, 11165, 10415, 9885, 9475, 9141, 8859, 8615,
      8401, 8210, 8037, 7879, 7735, 7601, 7477, 7361, 7252, 7149, 7052,
      6960, 6873, 6790, 6711, 6635, 6562, 6492, 6425, 6361, 6299, 6239,
      6180, 6124, 6070, 6017, 5966, 5916, 5868, 5821, 5776, 5731, 5688,
      5646, 5604, 5564, 5525, 5486, 5449, 5412, 5376, 5341, 5306, 5272,
      5239, 5207, 5175, 5144, 5113, 5083, 5053, 5024, 4995, 4967, 4939,
      4912, 4885, 4859, 4833, 4808, 4783, 4758, 4733, 4709, 4686, 4662,
      4639, 4616, 4594, 4572, 4550, 4529, 4507, 4486, 4466, 4445, 4425,
      4405, 4385, 4366, 4347, 4328, 4309, 4290, 4272, 4254, 4236, 4218,
      4200, 4183, 4166, 4149, 4132, 4115, 4099, 4082, 4066, 4050, 4034,
      4019, 4003, 3988, 3972, 3957, 3942, 3928, 3913, 3898, 3884, 3870,
      3855, 3841)
    val arr = ladder.mkString("[", ", ", "]")
    s"""WITH ev AS (SELECT event_type,
       |   (epoch_us(ts) // 3600000000) % 24 AS hod,
       |   CASE WHEN CAST(round(value * 1000) AS BIGINT) >= 100000 THEN 1 ELSE 0 END AS succ
       |  FROM events),
       |cells AS (SELECT event_type, hod, count(*) AS n1,
       |   CAST(sum(succ) AS BIGINT) AS x1 FROM ev GROUP BY 1, 2),
       |types AS (SELECT event_type, count(*) AS nt,
       |   CAST(sum(succ) AS BIGINT) AS xt FROM ev GROUP BY 1),
       |grid AS (SELECT t.event_type, h.hod, t.nt, t.xt,
       |   COALESCE(c.n1, 0) AS n1, COALESCE(c.x1, 0) AS x1
       |  FROM types t CROSS JOIN (SELECT unnest(range(0, 24)) AS hod) h
       |  LEFT JOIN cells c ON c.event_type = t.event_type AND c.hod = h.hod),
       |z AS (SELECT event_type, hod, n1, x1, nt - n1 AS n2, xt - x1 AS x2,
       |   CASE WHEN n1 > 0 AND nt - n1 > 0 AND xt > 0 AND xt < nt THEN
       |    CAST((CAST(x1 AS HUGEINT) * (nt - n1) - CAST(xt - x1 AS HUGEINT) * n1)
       |      * (CAST(x1 AS HUGEINT) * (nt - n1) - CAST(xt - x1 AS HUGEINT) * n1)
       |      * nt * 1000
       |      // (CAST(xt AS HUGEINT) * (nt - xt) * n1 * (nt - n1)) AS BIGINT)
       |   ELSE 0 END AS z2_milli
       |  FROM grid),
       |r AS (SELECT *, row_number() OVER (ORDER BY z2_milli DESC, event_type, hod) AS rnk
       |  FROM z),
       |l AS (SELECT *, ($arr)[CAST(rnk AS INT)] AS bh_t_milli FROM r),
       |k AS (SELECT *, max(CASE WHEN z2_milli >= bh_t_milli THEN rnk ELSE 0 END)
       |    OVER () AS kstar FROM l)
       |SELECT event_type, hod, n1, x1, z2_milli,
       | CAST(rnk AS BIGINT) AS rnk, CAST(bh_t_milli AS BIGINT) AS bh_t_milli,
       | CAST(rnk <= kstar AS BIGINT) AS bh_reject,
       | CAST(z2_milli >= 3841 AS BIGINT) AS naive_reject
       |FROM k ORDER BY event_type, hod""".stripMargin
  }

  // q324: RANDOMIZED-RESPONSE (LOCAL DP) FREQUENCY DEBIASING — the
  // LOCAL-model counterpart of q276's central-DP release: q276 adds
  // noise to the AGGREGATE; here every event reports a possibly-lying
  // category (Warner 1965 / the RAPPOR-family mechanism: report the
  // truth w.p. p = 3/4, else a uniform draw over the k = 5 types), and
  // the collector — who never sees a trustworthy row — must DEBIAS the
  // observed histogram: E[c_i] = p·t_i + N(1−p)/k, so
  // t̂_i = (k·c_i·… ) = (20·c_i − N) div 15, clamped at 0 (counts are
  // nonnegative; the clamp also keeps the truncating division off
  // negative operands — the cross-engine seam). The "randomness" is the
  // md5 row hash (the q90 reproducible-membership primitive), so both
  // engines see the SAME noisy channel and the audit can compare t̂ to
  // the true t it would never have in production. The privacy price is
  // declared, not computed: ε = ln((p + (1−p)/k)/((1−p)/k)) = ln 16 =
  // 2772 milli. 100 TB shape: ONE (true, reported) partial-agg shuffle
  // onto the ≤ k² grid; margins and debiasing are grid arithmetic.
  private def q324(s: SparkSession, d: String): DataFrame = {
    val types = "array('click', 'error', 'purchase', 'signup', 'view')"
    val g = events(s, d)
      .withColumn("rep", expr(
        s"""CASE WHEN ${duckLessMd5("event_id", 4)} < 3 THEN event_type
           |ELSE element_at($types, CAST(${duckLessMd5("event_id || ':alt'", 5)} AS INT) + 1)
           |END""".stripMargin))
      .groupBy(col("event_type").as("t"), col("rep")).agg(count(lit(1)).as("n"))
    graft.Caches.persist(g)
    val tn = g.groupBy(col("t").as("event_type")).agg(sum("n").as("true_n"))
    val on = g.groupBy(col("rep").as("event_type")).agg(sum("n").as("observed_n"))
    val tot = g.agg(sum("n").as("nn"))
    tn.join(on, Seq("event_type"), "full_outer")
      .na.fill(0L, Seq("true_n", "observed_n"))
      .crossJoin(broadcast(tot))
      .withColumn("debiased_n", expr(
        "greatest(20 * observed_n - nn, 0L) div 15"))
      .withColumn("err_permille", expr(
        "abs(debiased_n - true_n) * 1000 div greatest(true_n, 1L)"))
      .select(col("event_type"), col("true_n"), col("observed_n"),
        col("debiased_n"), col("err_permille"),
        lit(2772L).as("epsilon_milli"))
      .orderBy("event_type")
  }

  // Spark-side md5 bucket with the exact DuckDB hex-prefix semantics
  // (Tables.hashBucket inlined as SQL text so the CASE stays one expr).
  private def duckLessMd5(k: String, m: Int): String =
    s"conv(substring(md5(CAST($k AS STRING)), 1, 8), 16, 10) % $m"

  private val q324Sql =
    """WITH g AS (SELECT event_type AS t,
      |   CASE WHEN ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % 4 < 3
      |     THEN event_type
      |     ELSE (['click', 'error', 'purchase', 'signup', 'view'])[
      |       (('0x' || substr(md5(event_id::VARCHAR || ':alt'), 1, 8))::BIGINT % 5)
      |         + 1]
      |   END AS rep, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |tn AS (SELECT t AS event_type, sum(n) AS true_n FROM g GROUP BY 1),
      |onn AS (SELECT rep AS event_type, sum(n) AS observed_n FROM g GROUP BY 1),
      |tot AS (SELECT sum(n) AS nn FROM g),
      |m AS (SELECT coalesce(tn.event_type, onn.event_type) AS event_type,
      |   coalesce(true_n, 0) AS true_n, coalesce(observed_n, 0) AS observed_n
      |  FROM tn FULL OUTER JOIN onn USING (event_type)),
      |db AS (SELECT *, greatest(20 * observed_n - nn, 0) // 15 AS debiased_n
      |  FROM m CROSS JOIN tot)
      |SELECT event_type, CAST(true_n AS BIGINT) AS true_n,
      | CAST(observed_n AS BIGINT) AS observed_n,
      | CAST(debiased_n AS BIGINT) AS debiased_n,
      | CAST(abs(debiased_n - true_n) * 1000 // greatest(true_n, 1) AS BIGINT)
      |   AS err_permille,
      | CAST(2772 AS BIGINT) AS epsilon_milli
      |FROM db ORDER BY event_type""".stripMargin

  // q328: JENSEN–SHANNON DRIFT — the INFORMATION-THEORETIC member of the
  // distribution-distance family (q217 KS = supremum, q291 W1 = L1
  // area, q316 CvM = squared-gap integral, q248 PSI = practitioner's
  // log-ratio sum): JSD = ½KL(p‖m) + ½KL(q‖m) with m the midpoint —
  // symmetric, bounded in [0, 1] bit, and FINITE even where one side
  // has mass the other lacks (the case that blows PSI/KL up and forces
  // q248's epsilon floors). Same morning/afternoon frame as q291/q316.
  // Exact staging: counts → ppm (one truncating division per side —
  // masses below 1 ppm deliberately vanish, identically in both
  // engines), then every log is the shared bit-length fixed-point
  // log2milli on SMALL integers (≤ 2·10⁶ — the q327 lesson applied to
  // log arguments: normalize FIRST so no corpus-sized value ever meets
  // bin()), per-value terms ap·(L(2ap) − L(ap+bp)) summed and divided
  // once. Final clamp at 0: the ±0.086-bit log interpolation error can
  // leave −ε when the true JSD ≈ 0. 100 TB: one (type, centi-value)
  // partial-agg shuffle; everything after is value-grid arithmetic.
  private def q328(s: SparkSession, d: String): DataFrame = {
    def l2m(x: String): String =
      s"(1000 * (length(bin($x)) - 1) + (($x - shiftleft(CAST(1 AS BIGINT), " +
        s"length(bin($x)) - 1)) * 1000) div shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1))"
    val vg = events(s, d)
      .withColumn("hod", expr("(unix_micros(ts) div 3600000000) % 24"))
      .withColumn("v", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type", "v")
      .agg(sum(when(col("hod") < 12, 1L).otherwise(0L)).as("a"),
        sum(when(col("hod") >= 12, 1L).otherwise(0L)).as("b"))
    val wt = Window.partitionBy("event_type")
    vg.withColumn("na", sum("a").over(wt))
      .withColumn("nb", sum("b").over(wt))
      .withColumn("ap", expr("CASE WHEN na > 0 THEN CAST(CAST(a AS DECIMAL(38,0)) * 1000000 div na AS BIGINT) ELSE 0L END"))
      .withColumn("bp", expr("CASE WHEN nb > 0 THEN CAST(CAST(b AS DECIMAL(38,0)) * 1000000 div nb AS BIGINT) ELSE 0L END"))
      .withColumn("ta", expr(
        s"CASE WHEN ap > 0 THEN ap * (${l2m("2 * ap")} - ${l2m("ap + bp")}) ELSE 0L END"))
      .withColumn("tb", expr(
        s"CASE WHEN bp > 0 THEN bp * (${l2m("2 * bp")} - ${l2m("ap + bp")}) ELSE 0L END"))
      .groupBy("event_type")
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        sum(expr("ta + tb")).as("num"))
      .withColumn("jsd_milli", expr("greatest(num div 2000000, 0L)"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("jsd_milli"),
        expr("CAST(jsd_milli >= 100 AS BIGINT)").as("drifted"))
      .orderBy("event_type")
  }

  private val q328Sql = {
    def dl(x: String): String =
      s"(1000 * (length(bin($x)) - 1) + (($x - (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"
    s"""WITH vg AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
       |     THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |   CAST(sum(CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
       |     THEN 1 ELSE 0 END) AS BIGINT) AS b
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT *,
       |   sum(a) OVER (PARTITION BY event_type) AS na,
       |   sum(b) OVER (PARTITION BY event_type) AS nb
       |  FROM vg),
       |pp AS (SELECT event_type, na, nb,
       |   CASE WHEN na > 0 THEN CAST(CAST(a AS HUGEINT) * 1000000 // na AS BIGINT) ELSE 0 END AS ap,
       |   CASE WHEN nb > 0 THEN CAST(CAST(b AS HUGEINT) * 1000000 // nb AS BIGINT) ELSE 0 END AS bp
       |  FROM t),
       |tm AS (SELECT event_type, na, nb,
       |   CASE WHEN ap > 0 THEN ap * (${dl("2 * ap")} - ${dl("ap + bp")})
       |    ELSE 0 END AS ta,
       |   CASE WHEN bp > 0 THEN bp * (${dl("2 * bp")} - ${dl("ap + bp")})
       |    ELSE 0 END AS tb
       |  FROM pp),
       |ag AS (SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
       |   CAST(max(nb) AS BIGINT) AS n_b,
       |   greatest(sum(ta + tb) // 2000000, 0) AS jsd_milli
       |  FROM tm GROUP BY 1)
       |SELECT event_type, n_a, n_b, CAST(jsd_milli AS BIGINT) AS jsd_milli,
       | CAST(jsd_milli >= 100 AS BIGINT) AS drifted
       |FROM ag ORDER BY event_type""".stripMargin
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q328_jsd_drift" -> (q328 _),
    "q324_rr_ldp_debias" -> (q324 _),
    "q278_bh_fdr_gate" -> (q278 _),
    "q276_dp_release" -> (q276 _),
    "q268_capture_recapture" -> (q268 _),
    "q267_sprt_monitor" -> (q267 _),
    "q265_merkle_diff" -> (q265 _),
    "q249_t_closeness" -> (q249 _),
    "q248_psi_drift" -> (q248 _),
    "q234_l_diversity" -> (q234 _),
    "q231_ab_proportion_gate" -> (q231 _),
    "q224_winsorized_agg" -> (q224 _),
    "q217_ks_drift" -> (q217 _),
    "q209_independence_audit" -> (q209 _),
    "q352_cramers_v" -> (q352 _),
    "q182_modality_coverage" -> (q182 _),
    "q167_schema_drift" -> (q167 _),
    "q160_reconciliation" -> (q160 _),
    "q152_class_balance" -> (q152 _),
    "q148_k_anonymity" -> (q148 _),
    "q149_fd_audit" -> (q149 _),
    "q146_join_stats" -> (q146 _),
    "q141_benford_audit" -> (q141 _),
    "q123_compression_ratio" -> (q123 _),
    "q121_stratum_drift" -> (q121 _),
    "q122_join_forecast" -> (q122 _),
    "q105_pii_audit" -> (q105 _),
    "q110_constraint_audit" -> (q110 _),
    "q111_charclass_profile" -> (q111 _),
    "q112_source_overlap" -> (q112 _))

  override val oracles: Map[String, String] = Map(
    "q123_compression_ratio" -> q123Sql,
    "q328_jsd_drift" -> q328Sql,
    "q324_rr_ldp_debias" -> q324Sql,
    "q278_bh_fdr_gate" -> q278Sql,
    "q276_dp_release" -> q276Sql,
    "q268_capture_recapture" -> q268Sql,
    "q267_sprt_monitor" -> q267Sql,
    "q265_merkle_diff" -> q265Sql,
    "q249_t_closeness" -> q249Sql,
    "q248_psi_drift" -> q248Sql,
    "q234_l_diversity" -> q234Sql,
    "q231_ab_proportion_gate" -> q231Sql,
    "q224_winsorized_agg" -> q224Sql,
    "q217_ks_drift" -> q217Sql,
    "q209_independence_audit" -> q209Sql,
    "q352_cramers_v" -> q352Sql,
    "q182_modality_coverage" -> q182Sql,
    "q167_schema_drift" -> q167Sql,
    "q160_reconciliation" -> q160Sql,
    "q152_class_balance" -> q152Sql,
    "q148_k_anonymity" -> q148Sql,
    "q149_fd_audit" -> q149Sql,
    "q146_join_stats" -> q146Sql,
    "q141_benford_audit" -> q141Sql,
    "q121_stratum_drift" -> q121Sql,
    "q122_join_forecast" -> q122Sql,
    "q105_pii_audit" -> q105Sql,
    "q110_constraint_audit" -> q110Sql,
    "q111_charclass_profile" -> q111Sql,
    "q112_source_overlap" -> q112Sql)
}
