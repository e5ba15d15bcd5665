package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.WordBigrams
import org.apache.spark.sql.{DataFrame, GraftColumn, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a large-scale training-data pipeline
  * (SURVEY.md §2B B33 + the driver mandate: language-ID, quality scoring,
  * token counting, document fingerprinting) over the `documents` table.
  *
  * Every metric here is a PER-ROW projection built from codegen'd built-ins
  * (`split`, higher-order `filter`/`transform`, `md5`) — no UDFs, no
  * shuffle except the final deterministic ORDER BY (and the global
  * aggregation in q38). At 100 TB these queries scan, compute row-local,
  * and write back out: embarrassingly parallel, whole-stage-codegen'd,
  * column-pruned to `(doc_id, text)`.
  */
object TextAnalysis extends QueryPack {
  import Tables._

  /** documents + a `toks` column. Texts are lowercase `[a-z ]`, single-
    * spaced (verified against the corpus), so whitespace tokenization is
    * exact and matches DuckDB's `string_split` one-to-one. */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    documents(s, d).withColumn("toks", split(col("text"), " "))

  // q34: token counting + lexical-diversity stats (type-token ratio).
  private def q34(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4).as("ttr"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(col("toks")), 4)
          .as("avg_token_len"))
      .orderBy("doc_id")

  private val q34Sql =
    """SELECT doc_id, lang, source,
      | len(string_split(text,' ')) AS n_tokens,
      | len(list_distinct(string_split(text,' '))) AS n_distinct,
      | round(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')), 4) AS ttr,
      | round(CAST(length(replace(text,' ','')) AS DOUBLE) / len(string_split(text,' ')), 4) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // q35: language-ID by marker-token scoring — the n-gram-heuristic shape:
  // score each document against three marker sets, argmax wins. The corpus
  // vocabulary is synthetic, so the "languages" are dialects of the corpus;
  // the classifier structure (marker hit-rate → argmax with deterministic
  // tiebreak) is the real operator. Argmax compares raw hit COUNTS (same
  // denominator) so the decision is integer-exact on both engines.
  private def q35(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .withColumn("ca", size(expr("filter(toks, t -> t IN ('the','a','key','order'))")))
      .withColumn("cb", size(expr("filter(toks, t -> t IN ('data','table','row','scan'))")))
      .withColumn("cc", size(expr("filter(toks, t -> t IN ('join','merge','sort','agg'))")))
      .select(col("doc_id"), col("ca"), col("cb"), col("cc"),
        round(col("ca").cast("double") / size(col("toks")), 4).as("score_a"),
        round(col("cb").cast("double") / size(col("toks")), 4).as("score_b"),
        round(col("cc").cast("double") / size(col("toks")), 4).as("score_c"),
        when(col("ca") >= col("cb") && col("ca") >= col("cc"), "dialect_a")
          .when(col("cb") >= col("cc"), "dialect_b")
          .otherwise("dialect_c").as("pred"))
      .orderBy("doc_id")

  private val q35Sql =
    """SELECT doc_id, ca, cb, cc,
      | round(CAST(ca AS DOUBLE)/nt, 4) AS score_a,
      | round(CAST(cb AS DOUBLE)/nt, 4) AS score_b,
      | round(CAST(cc AS DOUBLE)/nt, 4) AS score_c,
      | CASE WHEN ca >= cb AND ca >= cc THEN 'dialect_a'
      |      WHEN cb >= cc THEN 'dialect_b' ELSE 'dialect_c' END AS pred
      |FROM (SELECT doc_id, len(string_split(text,' ')) AS nt,
      |       len(list_filter(string_split(text,' '), t -> t IN ('the','a','key','order'))) AS ca,
      |       len(list_filter(string_split(text,' '), t -> t IN ('data','table','row','scan'))) AS cb,
      |       len(list_filter(string_split(text,' '), t -> t IN ('join','merge','sort','agg'))) AS cc
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // q36: document quality scoring — lexical diversity, stopword load,
  // short-token load, length prior, folded into one [0,1] score. The
  // composite is computed in EXACT INTEGER basis points (round-half-up via
  // integer division on the raw counts), so no engine's float evaluation
  // order can perturb the score: quality_bp =
  //   round(4000·nd/nt) + round(3000·(nt−cstop)/nt)
  //   + min(round(2000·ch/(6·nt)), 2000) + min(round(1000·nt/80), 1000).
  private def q36(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("cstop", size(expr("filter(toks, t -> t IN ('the','a'))")).cast("long"))
      .withColumn("cshort", size(expr("filter(toks, t -> length(t) <= 3)")).cast("long"))
      .withColumn("ch", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("bp", expr(
        """ (8000*nd + nt) div (2*nt)
          | + (6000*(nt - cstop) + nt) div (2*nt)
          | + least((4000*ch + 6*nt) div (12*nt), CAST(2000 AS BIGINT))
          | + least((2000*nt + 80) div 160, CAST(1000 AS BIGINT))""".stripMargin))
      .select(col("doc_id"),
        col("nt").cast("int").as("n_tokens"),
        round(col("cstop").cast("double") / col("nt"), 4).as("stop_ratio"),
        round(col("cshort").cast("double") / col("nt"), 4).as("short_ratio"),
        round(lit(1.0) - col("nd").cast("double") / col("nt"), 4).as("repetition"),
        (col("bp").cast("double") / 10000).as("quality"),
        when(col("bp") >= 8000, "high")
          .when(col("bp") >= 6500, "medium")
          .otherwise("low").as("band"))
      .orderBy("doc_id")

  private val q36Sql =
    """SELECT doc_id, CAST(nt AS INT) AS n_tokens,
      | round(CAST(cstop AS DOUBLE)/nt, 4) AS stop_ratio,
      | round(CAST(cshort AS DOUBLE)/nt, 4) AS short_ratio,
      | round(1.0 - CAST(nd AS DOUBLE)/nt, 4) AS repetition,
      | CAST(bp AS DOUBLE)/10000 AS quality,
      | CASE WHEN bp >= 8000 THEN 'high' WHEN bp >= 6500 THEN 'medium' ELSE 'low' END AS band
      |FROM (SELECT *,
      |   (8000*nd + nt) // (2*nt)
      | + (6000*(nt - cstop) + nt) // (2*nt)
      | + least((4000*ch + 6*nt) // (12*nt), 2000)
      | + least((2000*nt + 80) // 160, 1000) AS bp
      |FROM (SELECT doc_id,
      |       CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
      |       CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS nd,
      |       CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS BIGINT) AS cstop,
      |       CAST(len(list_filter(string_split(text,' '), t -> length(t) <= 3)) AS BIGINT) AS cshort,
      |       CAST(length(replace(text,' ','')) AS BIGINT) AS ch
      |      FROM documents))
      |ORDER BY doc_id""".stripMargin

  // q37: document fingerprinting — full-text md5, an order-insensitive
  // bag-of-words fingerprint (sorted tokens), and a 60-bit integer
  // fingerprint for compact join keys (15 hex digits so it always fits a
  // signed BIGINT on both engines).
  private def q37(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .select(col("doc_id"),
        md5(col("text")).as("md5_full"),
        md5(array_join(array_sort(col("toks")), " ")).as("bag_fp"),
        expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("fp60"))
      .orderBy("doc_id")

  private val q37Sql =
    """SELECT doc_id, md5(text) AS md5_full,
      | md5(array_to_string(list_sort(string_split(text,' ')), ' ')) AS bag_fp,
      | ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp60
      |FROM documents ORDER BY doc_id""".stripMargin

  // q38: corpus-level bigram frequency, top 20. Per-row bigram expansion
  // (no join), partial-agg'd count, then a global top-k — the only shuffle
  // carries (bigram, partial count) pairs.
  private def q38(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .filter(size(col("toks")) >= 2)
      .select(explode(GraftColumn(WordBigrams(GraftColumn.expr(col("toks")))))
        .as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bigram"))
      .limit(20)

  private val q38Sql =
    """SELECT bigram, count(*) AS n FROM (
      | SELECT unnest(list_transform(range(1, len(string_split(text,' '))),
      |   i -> string_split(text,' ')[CAST(i AS INT)] || ' ' || string_split(text,' ')[CAST(i AS INT)+1])) AS bigram
      | FROM documents WHERE len(string_split(text,' ')) >= 2)
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // q39: TF-IDF top terms per document (B33). Term and document
  // frequencies are exact integer aggregations (order-proof); the single
  // (tf)·ln(N/df) double expression is written identically on both
  // engines; ranking ties (identical tf/df combos are common in a small
  // vocabulary) break on the term string.
  private def q39(s: SparkSession, d: String): DataFrame = {
    val tok = tokenized(s, d)
      .select(col("doc_id"), size(col("toks")).as("n"), explode(col("toks")).as("term"))
    val tf = tok.groupBy("doc_id", "n", "term").agg(count(lit(1)).as("cnt"))
    val df_ = tok.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf_raw"), col("term"))
    // no broadcast() hint on df_: one row per DISTINCT TERM — an unbounded
    // vocabulary at corpus scale; AQE decides from the measured size. The
    // one-row nDocs global aggregate below stays an explicit broadcast.
    tf.join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_raw",
        (col("cnt").cast("double") / col("n")) * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), round(col("tfidf_raw"), 6).as("tfidf"))
      .orderBy("doc_id", "rn")
  }

  private val q39Sql =
    """WITH tok AS (SELECT doc_id, len(string_split(text,' ')) AS n,
      |        unnest(string_split(text,' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, n, term, count(*) AS cnt FROM tok GROUP BY 1,2,3),
      |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
      |nd AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, rn, term, round(tfidf_raw, 6) AS tfidf FROM (
      | SELECT doc_id, term,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, term) AS rn, tfidf_raw
      | FROM (SELECT tf.doc_id, tf.term,
      |        (CAST(cnt AS DOUBLE) / n) * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf_raw
      |       FROM tf JOIN df USING (term) CROSS JOIN nd))
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // q74: deterministic stratified train/validation/test split — the
  // assignment every training-data pipeline needs to be REPRODUCIBLE and
  // join-free: an md5-derived bucket of the document id (not a random()
  // that changes per run, not a row_number that changes under
  // repartitioning) thresholds into 80/10/10, summarized per source for
  // the balance report. The split column is a row-local projection, so at
  // 100 TB assignment costs one codegen pass and the only shuffle is the
  // small (source, split) summary aggregation; downstream consumers
  // filter on the same expression and the filter pushes to the scan.
  private def q74(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("h", Tables.docIdPctBucket)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "validation").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("source", "split")

  private val q74Sql =
    """SELECT source, split, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars, round(avg(n_chars),4) AS avg_chars
      |FROM (SELECT source, n_chars,
      |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'validation' ELSE 'test' END AS split
      | FROM (SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS h
      |       FROM documents))
      |GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  // q75: DECONTAMINATION — the check every train/eval split needs: an
  // eval-side document whose content fingerprint (q40's 8-token-prefix
  // md5) also appears in the train split is leaked, and its eval metrics
  // are meaningless. One equi-join on the 32-char fingerprint between the
  // (small) eval side and the train side — at 100 TB that is a plain
  // hash-shuffle join on a high-cardinality key (or a broadcast of the
  // eval side, which is ~20% of the corpus; AQE decides), nothing
  // quadratic. Emits each contaminated eval doc with its lowest-id train
  // witness.
  private def q75(s: SparkSession, d: String): DataFrame = {
    val withSplit = documents(s, d)
      .withColumn("h", Tables.docIdPctBucket)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "validation").otherwise("test"))
      .withColumn("fp", md5(array_join(slice(split(col("text"), " "), 1, 8), " ")))
    val train = withSplit.filter(col("split") === "train")
      .select(col("fp"), col("doc_id").as("train_doc"))
    val eval_ = withSplit.filter(col("split") =!= "train")
      .select(col("fp"), col("doc_id").as("eval_doc"), col("split"))
    eval_.join(train, "fp")
      .groupBy("split", "eval_doc")
      .agg(min("train_doc").as("train_witness"), count(lit(1)).as("n_collisions"))
      .orderBy("split", "eval_doc")
  }

  private val q75Sql =
    """WITH ws AS (SELECT doc_id,
      |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS fp,
      |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'validation' ELSE 'test' END AS split
      | FROM (SELECT *, ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS h
      |       FROM documents))
      |SELECT e.split AS split, e.doc_id AS eval_doc, min(t.doc_id) AS train_witness,
      | count(*) AS n_collisions
      |FROM ws e JOIN ws t ON e.fp = t.fp AND t.split = 'train' AND e.split <> 'train'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q82: per-source quota gate — the corpus-mixing step after quality
  // scoring: a blocklist of bad sources is removed with an ANTI-JOIN
  // (the production shape: the blocklist is a maintained table, not a
  // literal predicate), then each surviving source keeps only its top-20
  // documents by the q36 integer quality score (doc_id tiebreak), which
  // caps any one source's contribution to the training mix. Window is
  // per-source (the natural partition key) — never global; the integer
  // basis-point score makes rank order engine-exact. At 100 TB this is
  // one broadcast anti-join + one hash shuffle on `source`.
  private def q82(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blocklist = Seq("src3", "src7").toDF("source")
    val scored = tokenized(s, d)
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("cstop", size(expr("filter(toks, t -> t IN ('the','a'))")).cast("long"))
      .withColumn("ch", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("bp", expr(
        """ (8000*nd + nt) div (2*nt)
          | + (6000*(nt - cstop) + nt) div (2*nt)
          | + least((4000*ch + 6*nt) div (12*nt), CAST(2000 AS BIGINT))
          | + least((2000*nt + 80) div 160, CAST(1000 AS BIGINT))""".stripMargin))
    val w = Window.partitionBy("source").orderBy(desc("bp"), col("doc_id"))
    scored
      .join(broadcast(blocklist), Seq("source"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 20)
      .select(col("source"), col("rank"), col("doc_id"),
        (col("bp").cast("double") / 10000).as("quality"))
      .orderBy("source", "rank")
  }

  private val q82Sql =
    """SELECT source, rank, doc_id, CAST(bp AS DOUBLE)/10000 AS quality FROM (
      | SELECT source, doc_id, bp,
      |  row_number() OVER (PARTITION BY source ORDER BY bp DESC, doc_id) AS rank
      | FROM (SELECT source, doc_id,
      |    (8000*nd + nt) // (2*nt)
      |  + (6000*(nt - cstop) + nt) // (2*nt)
      |  + least((4000*ch + 6*nt) // (12*nt), 2000)
      |  + least((2000*nt + 80) // 160, 1000) AS bp
  FROM (SELECT source, doc_id,
      |     len(string_split(text,' ')) AS nt,
      |     len(list_distinct(string_split(text,' '))) AS nd,
      |     len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS cstop,
      |     length(replace(text,' ','')) AS ch
      |   FROM documents
      |   -- NULL-source rows survive, matching the anti-join (a bare NOT IN
      |   -- would evaluate to NULL and silently drop them)
      |   WHERE source IS NULL OR source NOT IN ('src3', 'src7'))))
      |WHERE rank <= 20 ORDER BY source, rank""".stripMargin

  // q84: BM25-family lexical retrieval — the keyword-search complement to
  // the vector ANN family (q46–q49): score every document against a term
  // set with the BM25 tf saturation (k1=1.2, b=0.75), global top-10. The
  // idf uses the RAW odds core (N-df+0.5)/(df+0.5) WITHOUT the log. To be
  // precise about what that buys and costs: per TERM the odds core is a
  // monotone transform of BM25's log idf, but the SUMMED multi-term score
  // weights rare terms more heavily than log-idf BM25 would, so the
  // ranking is BM25-adjacent, not BM25-identical — the deployment variant
  // swaps ln(core) in. The odds core is chosen here because it keeps the
  // score a fixed-shape rational expression over integers, bit-identical
  // across engines (ln() implementations are not cross-engine
  // reproducible, so a log score could never be oracle-hashed). Corpus
  // stats (N, Σlen, per-term df) come from ONE auxiliary aggregate row
  // broadcast back; tf is row-local; the global top-10 plans as
  // TakeOrderedAndProject. At 100 TB the stats row is a metadata-sized
  // side input and the scan stays embarrassingly parallel.
  private def q84(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("key", "table", "row")
    val toks = tokenized(s, d).withColumn("nt", size(col("toks")).cast("double"))
    val statAggs = Seq(count(lit(1)).cast("double").as("nn"),
      sum(size(col("toks"))).cast("double").as("sumnt")) ++
      terms.map(t => count(when(array_contains(col("toks"), t), 1))
        .cast("double").as(s"df_$t"))
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)
    val scored = toks.crossJoin(broadcast(stats))
    val score = terms.map { t =>
      val tf = expr(s"CAST(size(filter(toks, x -> x = '$t')) AS DOUBLE)")
      val idf = (col("nn") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5))
      idf * ((tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("nt") / (col("sumnt") / col("nn")))))
    }.reduce(_ + _)
    scored.select(col("doc_id"), round(score, 4).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(10)
  }

  private val q84Sql = {
    val terms = Seq("key", "table", "row")
    val dfCols = terms.map(t =>
      s"CAST(count(*) FILTER (list_contains(toks, '$t')) AS DOUBLE) AS df_$t").mkString(",\n   ")
    val scoreSum = terms.map { t =>
      s"""((nn - df_$t + 0.5) / (df_$t + 0.5)) *
         |   ((CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * 2.2) /
         |    (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) +
         |     1.2 * (0.25 + 0.75 * nt / (sumnt / nn))))""".stripMargin
    }.mkString("\n  + ")
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks,
       |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS nn,
       |   CAST(sum(len(toks)) AS DOUBLE) AS sumnt,
       |   $dfCols
       | FROM tk)
       |SELECT doc_id, round(
       |  $scoreSum, 4) AS bm25
       |FROM tk CROSS JOIN st
       |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
  }

  // q97: corpus-frequency quality prior — the "common-token" score real
  // pipelines use alongside intra-doc heuristics (q36): a document whose
  // tokens are globally rare is disproportionately OCR noise, boilerplate
  // code, or non-language; one whose mean global token frequency is high
  // reads like the corpus. Two stages: the corpus vocabulary aggregate
  // (one token-keyed shuffle with map-side partial counts — Zipfian, so
  // the distinct-token frame is tiny relative to the corpus), then a
  // token→frequency join back and a per-doc aggregate. At 100 TB the
  // frequency table is broadcast (top-K tokens cover the mass; the tail
  // defaults to frequency 1 — a documented truncation, not a silent one);
  // the hash-join form here is the oracle-exact twin. Integer sums make
  // the score engine-exact: sum_tf/n_tok is one correctly-rounded IEEE
  // division of exact integers, then round(…,4) (q74 precedent).
  private def q97(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    toks.join(freq, "tok")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"), sum("tf").as("sum_tf"))
      .withColumn("freq_score",
        round(col("sum_tf").cast("double") / col("n_tok"), 4))
      .select("doc_id", "source", "n_tok", "sum_tf", "freq_score")
      .orderBy("doc_id")
  }

  private val q97Sql =
    """WITH toks AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok)
      |SELECT t.doc_id, t.source, count(*) AS n_tok,
      | CAST(sum(f.tf) AS BIGINT) AS sum_tf,
      | round(CAST(sum(f.tf) AS DOUBLE)/count(*), 4) AS freq_score
      |FROM toks t JOIN freq f ON t.tok = f.tok
      |GROUP BY t.doc_id, t.source ORDER BY doc_id""".stripMargin

  // q176: BIGRAM FAMILIARITY AUDIT — the context-level complement to
  // q97's unigram corpus prior, and the integer-exact stand-in for the
  // LM-perplexity bucketing CCNet-style pipelines run: a document whose
  // word PAIRS are mostly unseen elsewhere in the corpus is either novel
  // text (keep) or noise (q36/q99 decide which); a document whose
  // bigrams are all corpus-common is boilerplate-adjacent. Per doc:
  // bigram count, rare-bigram count (corpus support <= 2, i.e. at most
  // one occurrence outside this position), familiarity permille, and
  // mean corpus support in millis — every column an integer sum or an
  // integer division of exact longs, so no transcendental (a real
  // perplexity's log) ever lands in a hashed column (the SCALE.md rule).
  // Shape at 100 TB: bigrams expand row-local (q99's transform), the
  // corpus count partial-aggregates map-side on the bigram key, and the
  // join-back is bigram-keyed — the exact q97 token join-back shape one
  // level up; no window, no self-join. Docs with <2 tokens have no
  // bigram and are excluded by construction in BOTH engines.
  private def q176(s: SparkSession, d: String): DataFrame = {
    val bgs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))")).as("bg"))
    val corpus = bgs.groupBy("bg").agg(count(lit(1)).as("cbg"))
    bgs.join(corpus, "bg")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bg"),
        sum(when(col("cbg") <= 2, 1L).otherwise(0L)).as("n_rare"),
        sum("cbg").as("sum_support"))
      .select(col("doc_id"), col("source"), col("n_bg"), col("n_rare"),
        expr("(n_bg - n_rare) * 1000 div n_bg").as("familiar_permille"),
        expr("sum_support * 1000 div n_bg").as("avg_support_milli"))
      .orderBy("doc_id")
  }

  private val q176Sql =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bgs AS (SELECT doc_id, source,
      |  unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
      | FROM t),
      |corpus AS (SELECT bg, count(*) AS cbg FROM bgs GROUP BY bg),
      |per AS (SELECT doc_id, source, count(*) AS n_bg,
      |  sum(CASE WHEN cbg <= 2 THEN 1 ELSE 0 END) AS n_rare,
      |  sum(cbg) AS sum_support
      | FROM bgs JOIN corpus USING (bg) GROUP BY 1, 2)
      |SELECT doc_id, source, n_bg, CAST(n_rare AS BIGINT) AS n_rare,
      | CAST((n_bg - n_rare) * 1000 // n_bg AS BIGINT) AS familiar_permille,
      | CAST(sum_support * 1000 // n_bg AS BIGINT) AS avg_support_milli
      |FROM per ORDER BY doc_id""".stripMargin

  // q99: REPETITION quality rule — the Gopher/MassiveText "fraction of
  // tokens in the most common n-gram" filter (Rae et al. 2021 §A1.1),
  // complementing q36's length/diversity heuristics and q97's corpus
  // prior: a doc whose single top BIGRAM covers ≥20% of its bigram
  // positions is degenerate boilerplate ("click here click here …") even
  // when its token-level diversity looks acceptable. The flag is
  // integer-exact (top_c * 5 >= n_bg — no float ratio is ever hashed).
  // Shape at scale: bigrams explode row-local, the (doc, bigram) count
  // partial-aggregates map-side, and the per-doc max/sum is a second
  // partial agg — two narrow shuffles, both keyed finer than or equal to
  // doc_id, no window, no join. Docs with <2 tokens have no bigram and
  // are excluded in BOTH engines by construction.
  private def q99(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))")).as("bg"))
      .groupBy("doc_id", "source", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source")
      .agg(max("c").as("top_c"), sum("c").as("n_bg"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("top_c") * 5 >= col("n_bg"), 1L).otherwise(0L)).as("n_flagged"),
        sum("top_c").as("sum_top"),
        sum("n_bg").as("sum_bg"))
      .orderBy("source")

  private val q99Sql =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT doc_id, source,
      |  unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
      | FROM t),
      |pc AS (SELECT doc_id, source, bg, count(*) AS c FROM bg GROUP BY 1, 2, 3),
      |pd AS (SELECT doc_id, source, max(c) AS top_c, sum(c) AS n_bg FROM pc GROUP BY 1, 2)
      |SELECT source, count(*) AS n_docs,
      | CAST(sum(CASE WHEN top_c * 5 >= n_bg THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      | CAST(sum(top_c) AS BIGINT) AS sum_top,
      | CAST(sum(n_bg) AS BIGINT) AS sum_bg
      |FROM pd GROUP BY source ORDER BY source""".stripMargin

  // q102: QUALITY ENSEMBLE via decile blending — production filters
  // combine signals, and averaging raw heterogeneous scores is scale-
  // broken (units differ, outliers dominate). The standard fix is rank
  // normalization: bucket each signal into corpus deciles and blend the
  // bucket indices. A partitionless percent_rank window would be the
  // naive form — one task holding the corpus (the q77 anti-pattern).
  // Instead: ONE aggregate pass computes 9 exact decile boundaries per
  // signal (a broadcast-class driver row, the q95 precedent incl. its
  // round-4 float parity and empty-table guard), then bucket assignment
  // is a ROW-LOCAL boundary count — the whole corpus is scored in a
  // single codegen pass with no shuffle beyond the per-source summary.
  // Signals: doc length (n_tok) and vocabulary size (n_dis), both
  // integer; the blend and the low/high tail flags stay integer-exact.
  private def q102(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_dis"))
    val aggs = Q102Deciles.flatMap(p => Seq(
      round(expr(s"percentile(n_tok, 0.$p)"), 4).as(s"t$p"),
      round(expr(s"percentile(n_dis, 0.$p)"), 4).as(s"d$p")))
    val bRow = docs.agg(aggs.head, aggs.tail: _*).head()
    val (tb, db) =
      if (bRow.isNullAt(0)) (Seq.fill(9)(0.0), Seq.fill(9)(0.0))
      else (Seq.range(0, 18, 2).map(bRow.getDouble), Seq.range(1, 18, 2).map(bRow.getDouble))
    def bucket(c: String, bs: Seq[Double]) =
      bs.foldLeft(lit(0L))((acc, b) => acc + when(col(c) > lit(b), 1L).otherwise(0L))
    docs
      .withColumn("dlen", bucket("n_tok", tb))
      .withColumn("ddiv", bucket("n_dis", db))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("dlen").as("sum_dlen"),
        sum("ddiv").as("sum_ddiv"),
        sum(when(col("dlen") + col("ddiv") <= 3, 1L).otherwise(0L)).as("n_low"),
        sum(when(col("dlen") + col("ddiv") >= 15, 1L).otherwise(0L)).as("n_high"))
      .orderBy("source")
  }

  private val Q102Deciles = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9)

  private val q102Sql = {
    val bounds = Q102Deciles.map(p =>
      s"round(quantile_cont(n_tok, 0.$p),4) AS t$p, round(quantile_cont(n_dis, 0.$p),4) AS d$p")
      .mkString(",\n ")
    val dlen = Q102Deciles.map(p => s"(CASE WHEN n_tok > t$p THEN 1 ELSE 0 END)").mkString(" + ")
    val ddiv = Q102Deciles.map(p => s"(CASE WHEN n_dis > d$p THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH m AS (SELECT doc_id, source,
       | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis
       | FROM documents),
       |b AS (SELECT
       | $bounds FROM m),
       |sc AS (SELECT source, $dlen AS dlen, $ddiv AS ddiv FROM m, b)
       |SELECT source, count(*) AS n_docs,
       | CAST(sum(dlen) AS BIGINT) AS sum_dlen,
       | CAST(sum(ddiv) AS BIGINT) AS sum_ddiv,
       | CAST(sum(CASE WHEN dlen + ddiv <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       | CAST(sum(CASE WHEN dlen + ddiv >= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
       |FROM sc GROUP BY source ORDER BY source""".stripMargin
  }

  // q103: COLLOCATION MINING (phrase detection) — top bigrams by LIFT,
  // the corpus-statistics complement to q38's raw bigram counts: a pair
  // that co-occurs far above what its parts' frequencies predict is a
  // phrase worth protecting from tokenizer splits ("new york", "machine
  // learning"). PMI's log is not cross-engine hashable, so the score is
  // the rank-equivalent integer lift: c(a,b)·N·1000 div (c(a)·c(b)).
  // Shape at scale: unigram and bigram counts partial-aggregate map-side;
  // the vocabulary is Zipf-small, so BOTH unigram joins broadcast (hinted
  // and AQE-confirmed); N arrives as a broadcast one-row cross join, not
  // a driver collect; the top-20 is TakeOrderedAndProject with a total
  // (lift, a, b) order. The cbg ≥ 5 support floor is standard phrase-
  // mining practice AND the candidate bound. 64-bit overflow headroom:
  // cbg·N·1000 needs cbg·N < 9.2e15 — fine to ~10⁷ bigram occurrences at
  // this fixture's vocab; at 100 TB the same plan runs on DECIMAL(38).
  private def q103(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).withColumn("toks", split(col("text"), " "))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum("c1").as("n"))
    val bgr = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> named_struct('a', toks[i-1], 'b', toks[i]))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cbg"))
      .filter(col("cbg") >= 5)
    bgr
      .join(broadcast(uni.withColumnRenamed("tok", "a").withColumnRenamed("c1", "ca")), "a")
      .join(broadcast(uni.withColumnRenamed("tok", "b").withColumnRenamed("c1", "cb")), "b")
      .crossJoin(broadcast(tot))
      .withColumn("lift", expr("CAST((cbg * n * 1000) DIV (ca * cb) AS BIGINT)"))
      .select("a", "b", "cbg", "lift")
      .orderBy(desc("lift"), col("a"), col("b"))
      .limit(20)
  }

  private val q103Sql =
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |uni AS (SELECT unnest(toks) AS tok FROM t),
      |u AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY tok),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM u),
      |bg AS (SELECT unnest(list_transform(range(1, len(toks)), i ->
      |         struct_pack(a := toks[i], b := toks[i+1]))) AS p
      |       FROM t WHERE len(toks) >= 2),
      |bgc AS (SELECT p.a AS a, p.b AS b, count(*) AS cbg FROM bg GROUP BY 1, 2
      |        HAVING count(*) >= 5)
      |SELECT bgc.a, bgc.b, bgc.cbg,
      | CAST((bgc.cbg * tot.n * 1000) // (ua.c1 * ub.c1) AS BIGINT) AS lift
      |FROM bgc JOIN u ua ON bgc.a = ua.tok JOIN u ub ON bgc.b = ub.tok, tot
      |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin

  // q106: VOCABULARY-COVERAGE (OOV) filter — the tokenizer-fit audit: a
  // corpus whose documents are mostly out-of-vocabulary for the target
  // tokenizer trains badly (every OOV token shatters into bytes). Vocab =
  // global top-15 tokens by (count desc, token) — a TakeOrderedAndProject
  // (bounded top-k, NO global window) over the token counts, then
  // BROADCAST to the per-token membership probe: at 100 TB the corpus-
  // side explode never shuffles for the probe, only the (doc, source)
  // rollups do. The high-OOV flag is integer cross-multiplication
  // (oov·2 > n_tok ⟺ rate > 50%), the q92/q111 boundary-exact precedent.
  // In production the vocab arrives as the tokenizer's merge table — the
  // plan is identical: small-side broadcast, corpus-side scan-local.
  private def q106(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(15)
      .select(col("tok"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .groupBy("source")
      .agg(sum("n_tok").as("sum_tok"), sum("n_oov").as("sum_oov"),
        sum(when(col("n_oov") * 2 > col("n_tok"), 1L).otherwise(0L))
          .as("n_docs_high_oov"))
      .orderBy("source")
  }

  private val q106Sql =
    """WITH toks AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      |             FROM documents),
      |vocab AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM toks GROUP BY tok)
      |          ORDER BY c DESC, tok LIMIT 15),
      |perdoc AS (SELECT t.doc_id, t.source, count(*) AS n_tok,
      |  sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
      | FROM toks t LEFT JOIN vocab v USING (tok) GROUP BY t.doc_id, t.source)
      |SELECT source, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      | CAST(sum(n_oov) AS BIGINT) AS sum_oov,
      | CAST(sum(CASE WHEN n_oov * 2 > n_tok THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_docs_high_oov
      |FROM perdoc GROUP BY source ORDER BY source""".stripMargin

  // q107: INVERTED-INDEX construction — the retrieval-side artifact (q84
  // scores with corpus stats; this MATERIALIZES the index): per token,
  // document frequency plus the head of the posting list. The naive form
  // (collect_list of every doc per token) is unbounded — a stopword's
  // posting at 100 TB is billions of ids in one aggregation buffer.
  // Instead the head is bounded BEFORE aggregation: row_number over
  // (partition by token order by doc_id) ≤ 5 plans as WindowGroupLimit
  // (Partial) — every map task forwards at most 5 rows per token (the
  // q91 shape) — and only then does the ≤5-element collect_list run. df
  // comes from a separate full count (partial-agg'd, no list), joined
  // back on the token. Output: top-30 tokens by (df desc, token), a
  // TakeOrderedAndProject. Posting ids render as a canonical
  // comma-joined NUMERIC-ordered string so both engines hash identically.
  private def q107(s: SparkSession, d: String): DataFrame = {
    val post = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val dfreq = post.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("tok").orderBy("doc_id")
    val heads = post.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .groupBy("tok").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("tok"),
        expr("array_join(transform(ids, x -> CAST(x AS STRING)), ',')").as("head"))
    dfreq.join(heads, "tok")
      .select(col("tok"), col("df"), col("head"))
      .orderBy(desc("df"), col("tok"))
      .limit(30)
  }

  private val q107Sql =
    """WITH post AS (SELECT DISTINCT tok, doc_id FROM
      |   (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |df AS (SELECT tok, count(*) AS df FROM post GROUP BY tok),
      |heads AS (SELECT tok, string_agg(doc_id, ',' ORDER BY doc_id) AS head
      | FROM (SELECT tok, doc_id,
      |         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS r FROM post)
      | WHERE r <= 5 GROUP BY tok)
      |SELECT df.tok, CAST(df.df AS BIGINT) AS df, heads.head
      |FROM df JOIN heads USING (tok) ORDER BY df.df DESC, df.tok LIMIT 30""".stripMargin

  // q132: BPE MERGE CANDIDATES — the first round of byte-pair-encoding
  // tokenizer induction, distributed: count every adjacent character
  // pair in the corpus (within-word only — a pair straddling a space is
  // not a mergeable symbol), rank by frequency. This is exactly the
  // statistic a BPE trainer maximizes at each merge step; running ONE
  // round as a relational op is the honest distributed decomposition
  // (the full trainer loops driver-side over metadata-sized pair
  // tables, re-counting after each merge — each round IS this query).
  // Shape: pair extraction is a row-local transform+explode (no join),
  // the count shuffles on the pair key (Zipf-small domain), top-32
  // plans as TakeOrderedAndProject. df = distinct-doc spread separates
  // corpus-wide pairs from single-doc boilerplate. Spark's sequence()
  // is DESCENDING when start > stop, so the length≥2 filter is load-
  // bearing (DuckDB's range() is empty there — the filter keeps the
  // two engines' row sets identical by construction).
  // Kernel note (r11 sf1 smoke): the relational form (transform+explode
  // of per-position substrings, then count+countDistinct) is ALLOCATION-
  // bound — one 2-char UTF8String per corpus position into the exchange,
  // 12–14 s at 150 M chars — and a two-scan split that removed its
  // Expand measured 30% SLOWER (the Expand was never the cost). The
  // char_pair_counts codegen kernel (graft.functions.CharPairCounts)
  // counts pairs row-locally in one byte pass, so the explode is
  // DISTINCT-pair grain (≤ a few hundred rows/doc, pre-counted): n is a
  // sum of local counts, df a plain row count — no Expand, no
  // per-position allocation. Measured 12.3 s → 0.71 s at sf1
  // (1.9 s → 0.46 s at sf0.1), min-of-3 standalone.
  private def q132(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(length(col("text")) >= 2)
      .select(explode(GraftColumn(graft.functions.CharPairCounts(
        GraftColumn.expr(col("text"))))).as("pc"))
      .select(col("pc.pair").as("pair"), col("pc.n").as("cnt"))
      .groupBy("pair")
      .agg(sum("cnt").as("n"), count(lit(1)).as("df"))
      .orderBy(desc("n"), col("pair"))
      .limit(32)

  private val q132Sql =
    """WITH p AS (SELECT doc_id, substr(text, CAST(k AS INT), 2) AS pair
      | FROM documents CROSS JOIN LATERAL unnest(range(1, length(text))) AS t(k)
      | WHERE length(text) >= 2)
      |SELECT pair, count(*) AS n, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |FROM p WHERE NOT contains(pair, ' ')
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 32""".stripMargin

  // q135: TEMPLATE (boilerplate-prefix) REMOVAL — the CCNet/RefinedWeb
  // line-dedup family adapted to this corpus's newline-free texts: docs
  // scraped from one source often open with the same site header, and a
  // training pipeline strips the shared prefix rather than dropping the
  // whole document. Per source, the modal leading 2-token prefix is the
  // template candidate; when >= 2 docs of the source share it, every doc
  // opening with it is rewritten without it. The per-(source,prefix)
  // histogram is Zipf-small (bounded by docs-per-source), the modal pick
  // is a window over that METADATA-sized frame (never over data rows),
  // and the template table — at most one row per source — broadcasts
  // back, so the corpus itself is touched by exactly one codegen'd
  // map-side pass: scan → prefix compare → substring rewrite. Null-safe
  // by construction: sources with no qualifying template fall out of the
  // left join as mpfx=NULL and the when() keeps their text verbatim.
  // Ties on the modal count break lexicographically (ORDER BY c DESC,
  // pfx) — deterministic in both engines.
  private def q135(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("pfx", expr("array_join(slice(split(text, ' '), 1, 2), ' ')"))
    val wm = Window.partitionBy("source").orderBy(desc("c"), col("pfx"))
    // NULL-text docs have a NULL pfx: they must not enter template
    // candidacy — a doc with no text defines no template, and a nullable
    // ordering key would also break cross-engine rank parity (Spark
    // sorts NULLS FIRST ascending, DuckDB NULLS LAST: a null-pfx group
    // tying for rank 1 would win on one engine and lose on the other).
    // The oracle carries the identical `pfx IS NOT NULL` guard.
    val tmpl = docs.filter(col("pfx").isNotNull)
      .groupBy("source", "pfx").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wm))
      .filter(col("r") === 1 && col("c") >= 2)
      .select(col("source"), col("pfx").as("mpfx"))
    docs.join(broadcast(tmpl), Seq("source"), "left")
      .withColumn("clean_text",
        when(col("pfx") === col("mpfx"), expr("substring(text, length(mpfx) + 2)"))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"),
        when(col("pfx") === col("mpfx"), 1L).otherwise(0L).as("stripped"),
        (length(col("text")) - length(col("clean_text"))).cast("long").as("n_removed"),
        col("clean_text"))
      .orderBy("doc_id")
  }

  private val q135Sql =
    """WITH p AS (SELECT doc_id, source, text,
      |  array_to_string(list_slice(string_split(text,' '), 1, 2), ' ') AS pfx
      | FROM documents),
      |c AS (SELECT source, pfx, count(*) AS c FROM p
      |      WHERE pfx IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT source, pfx AS mpfx FROM (
      |   SELECT source, pfx, c,
      |     row_number() OVER (PARTITION BY source ORDER BY c DESC, pfx) AS r FROM c)
      |  WHERE r = 1 AND c >= 2),
      |j AS (SELECT p.*, m.mpfx,
      |  CASE WHEN p.pfx = m.mpfx THEN substr(p.text, length(m.mpfx) + 2)
      |       ELSE p.text END AS clean_text
      | FROM p LEFT JOIN m USING (source))
      |SELECT doc_id, source,
      | CAST(CASE WHEN pfx = mpfx THEN 1 ELSE 0 END AS BIGINT) AS stripped,
      | CAST(length(text) - length(clean_text) AS BIGINT) AS n_removed,
      | clean_text
      |FROM j ORDER BY doc_id""".stripMargin

  // q136: VOCABULARY-GROWTH AUDIT (Heaps' law) — how fast does the
  // corpus's type count grow as documents accumulate? The curve drives
  // two pipeline decisions: tokenizer vocab sizing (q132's consumer) and
  // "is more of this source still adding new language?" acquisition
  // calls. The naive form — distinct-count per cumulative prefix — is a
  // quadratic re-scan; the one-scan decomposition used here is exact:
  // a token contributes to the cumulative vocabulary of decile b iff its
  // FIRST occurrence (min decile over its instances) is <= b, so
  // new-vocab-per-decile is a count over the per-token min frame, and
  // the cumulative curve is a running sum over the 10-row decile grid
  // (single-partition BY CHOICE via the q77 non-foldable pmod key — the
  // window never sees data rows). Deciles come from doc_id against the
  // max-id broadcast-class scalar (q78 precedent), integer div, so
  // membership is reproducible on any partitioning.
  private def q136(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val withB = docs.withColumn("decile",
      expr(s"least(9L, (doc_id * 10) div ${maxId + 1}L)"))
    val toks = withB.select(col("decile"),
      explode(split(col("text"), " ")).as("tok"))
    val perB = toks.groupBy("decile").agg(count(lit(1)).as("n_tokens"))
    val docsB = withB.groupBy("decile").agg(count(lit(1)).as("n_docs"))
    val newV = toks.groupBy("tok").agg(min("decile").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_vocab"))
    val w = Window.partitionBy(pmod(col("decile"), lit(1L))).orderBy("decile")
    docsB.join(perB, "decile").join(newV, Seq("decile"), "left")
      .na.fill(0L, Seq("new_vocab"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("cum_vocab", sum("new_vocab").over(w))
      .select("decile", "n_docs", "n_tokens", "new_vocab", "cum_tokens", "cum_vocab")
      .orderBy("decile")
  }

  private val q136Sql =
    """WITH db AS (SELECT doc_id, text,
      |  least(9, (doc_id * 10) // ((SELECT max(doc_id) FROM documents) + 1)) AS decile
      | FROM documents),
      |tk AS (SELECT decile, unnest(string_split(text, ' ')) AS tok FROM db),
      |pb AS (SELECT decile, count(*) AS n_tokens FROM tk GROUP BY decile),
      |dc AS (SELECT decile, count(*) AS n_docs FROM db GROUP BY decile),
      |nv AS (SELECT decile, count(*) AS new_vocab FROM (
      |   SELECT tok, min(decile) AS decile FROM tk GROUP BY tok) GROUP BY decile)
      |SELECT dc.decile AS decile, n_docs, n_tokens,
      | coalesce(new_vocab, 0) AS new_vocab,
      | CAST(sum(n_tokens) OVER (ORDER BY dc.decile) AS BIGINT) AS cum_tokens,
      | CAST(sum(coalesce(new_vocab, 0)) OVER (ORDER BY dc.decile) AS BIGINT) AS cum_vocab
      |FROM dc JOIN pb USING (decile) LEFT JOIN nv USING (decile)
      |ORDER BY decile""".stripMargin

  // q191: VOCAB-SIZE COVERAGE CURVE — the tokenizer-sizing knob, in the
  // q168/q186 one-pass-curve family: what fraction of corpus TOKEN MASS
  // does a top-V vocabulary cover, for V ∈ {4, 16, 64, 256}? (q106
  // scores a FIXED external vocab; q136 tracks arrival order; q132 picks
  // BPE merges — this prices the size itself.) The trick that keeps it
  // off the token-rank sort: coverage only depends on each frequency
  // CLASS, not on which tokens within a class make the cut (every member
  // has the same count — a tie at the V boundary contributes exactly
  // (V − tokens_above) · cnt whatever the tie-break). So: token counts
  // (one partial-agg'd shuffle), collapse to the (cnt, n_tokens, mass)
  // class grid — Zipf-small, the bounded-metadata regime — exclusive
  // running token count over the descending grid (single-partition BY
  // CHOICE, q78's stated-bound idiom), then the V-grid explode and
  // conditional sums. No global rank, no top-V materialization, exact
  // integers end to end.
  private def q191(s: SparkSession, d: String): DataFrame = {
    val classes = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .groupBy("cnt").agg(count(lit(1)).as("n_toks"))
      .withColumn("mass", col("cnt") * col("n_toks"))
    graft.Caches.persist(classes)
    val w = Window.partitionBy(pmod(col("cnt"), lit(1L))).orderBy(desc("cnt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = classes.withColumn("cum_toks", coalesce(sum("n_toks").over(w), lit(0L)))
    val total = classes.agg(sum("mass").as("total_tokens"))
    g.select(col("cnt"), col("n_toks"), col("mass"), col("cum_toks"),
        explode(array(lit(4L), lit(16L), lit(64L), lit(256L))).as("vocab_size"))
      .groupBy("vocab_size")
      .agg(sum(when(col("cum_toks") + col("n_toks") <= col("vocab_size"), col("mass"))
        .when(col("cum_toks") < col("vocab_size"),
          (col("vocab_size") - col("cum_toks")) * col("cnt"))
        .otherwise(0L)).as("covered"))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("covered"), col("total_tokens"),
        expr("covered * 1000 div total_tokens").as("coverage_permille"))
      .orderBy("vocab_size")
  }

  private val q191Sql =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
      |c AS (SELECT cnt, count(*) AS n_toks, cnt * count(*) AS mass FROM f GROUP BY cnt),
      |g AS (SELECT cnt, n_toks, mass, coalesce(sum(n_toks) OVER (ORDER BY cnt DESC
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_toks FROM c),
      |tot AS (SELECT sum(mass) AS total_tokens FROM c),
      |v AS (SELECT unnest([4, 16, 64, 256]) AS vocab_size),
      |cov AS (SELECT vocab_size,
      |  sum(CASE WHEN cum_toks + n_toks <= vocab_size THEN mass
      |      WHEN cum_toks < vocab_size THEN (vocab_size - cum_toks) * cnt
      |      ELSE 0 END) AS covered
      | FROM g CROSS JOIN v GROUP BY vocab_size)
      |SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
      | CAST(covered AS BIGINT) AS covered,
      | CAST(total_tokens AS BIGINT) AS total_tokens,
      | CAST(covered * 1000 // total_tokens AS BIGINT) AS coverage_permille
      |FROM cov CROSS JOIN tot ORDER BY vocab_size""".stripMargin

  // q203: FREQUENCY-SPECTRUM AUDIT — the corpus's Zipf profile as exact
  // integers, completing the frequency family's corpus-level view (q136
  // tracks vocab growth over ARRIVAL, q191 prices vocab SIZE, q97/q176
  // score DOCS by frequency; this profiles the DISTRIBUTION itself):
  // token types and token mass per frequency DOUBLING class (class =
  // bit-length of the corpus count, the q165 length(bin(…)) no-float-
  // log2 idiom), hapax mass in class 1, head mass in the top classes. A
  // power-law corpus shows near-constant mass per class; a bot-inflated
  // or template-heavy corpus bulges in the head — the one-line check
  // that the Zipf assumption behind q77's CMS sizing, q97's rarity
  // scores, and the capBuckets hot-key economics actually holds on THIS
  // corpus. Plan: one token-count shuffle (partial-agg'd), collapse to
  // the Zipf-small class grid (≤ ~40 classes), 1-row total broadcast
  // closes the shares.
  private def q203(s: SparkSession, d: String): DataFrame = {
    val freq = tokenized(s, d)
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val classes = freq
      .groupBy(length(expr("bin(cnt)")).cast("long").as("freq_class"))
      .agg(count(lit(1)).as("n_types"), sum("cnt").as("mass"),
        min("cnt").as("min_freq"), max("cnt").as("max_freq"))
    classes.crossJoin(broadcast(classes.agg(sum("mass").as("total_mass"))))
      .select(col("freq_class"), col("n_types"), col("mass"),
        col("min_freq"), col("max_freq"),
        expr("mass * 1000 div total_mass").as("mass_permille"))
      .orderBy("freq_class")
  }

  private val q203Sql =
    """WITH f AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM f GROUP BY 1),
      |cl AS (SELECT length(bin(cnt)) AS freq_class, count(*) AS n_types,
      |   sum(cnt) AS mass, min(cnt) AS min_freq, max(cnt) AS max_freq
      |  FROM c GROUP BY 1),
      |t AS (SELECT sum(mass) AS total_mass FROM cl)
      |SELECT CAST(freq_class AS BIGINT) AS freq_class,
      | CAST(n_types AS BIGINT) AS n_types, CAST(mass AS BIGINT) AS mass,
      | CAST(min_freq AS BIGINT) AS min_freq, CAST(max_freq AS BIGINT) AS max_freq,
      | CAST(mass * 1000 // total_mass AS BIGINT) AS mass_permille
      |FROM cl CROSS JOIN t ORDER BY freq_class""".stripMargin

  // q223: FIXED-POINT UNIGRAM SURPRISAL (add-one-smoothed LM cross-
  // entropy, in milli-bits per token) — the calibrated member of the
  // frequency-prior family. q97's mean corpus frequency is unitless and
  // dominated by a doc's MOST frequent token (arithmetic mean of tf);
  // q176 buckets bigram support but stays corpus-relative. A CCNet-class
  // quality filter wants bits/token under a corpus LM: log-scale, so a
  // rare token contributes proportionally, and comparable across corpora
  // of different sizes. The repo rule (SCALE.md) bans float log/exp from
  // hashed columns, so the log2 here is EXACT FIXED-POINT: per token,
  // q = (N + V) div (cnt + 1) — the integer reciprocal of the smoothed
  // probability — then surprisal_milli = 1000·⌊log2 q⌋ + linear intra-
  // octave interpolation ((q − 2^k)·1000 div 2^k), where ⌊log2 q⌋ =
  // len(bin(q)) − 1 on both engines. Max interpolation error vs true
  // log2 is 0.086 bits (at q = 2^k·e/2), constant and direction-stable,
  // so ranking/banding behavior matches the float filter while every
  // hashed value is integer-exact. Per-doc score = Σ surprisal div n_tok.
  // Shape at 100 TB: one Zipf-small token groupBy for counts, two scalar
  // aggregates broadcast (N, V), token-keyed join-back (q97's shape),
  // one doc groupBy — no window, no self-join; the scored-token relation
  // is vocabulary-sized, not corpus-sized.
  private def q223(s: SparkSession, d: String): DataFrame = {
    // r17 fanout: toks is consumed twice (vocabulary count + join-back)
    // and never persisted; the single-task scan serialized both explodes
    val toks = Tables.fanout(documents(s, d), col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
    val tot = toks.agg(count(lit(1)).as("n"), countDistinct("tok").as("v"))
    val scored = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("q", expr("(n + v) div (cnt + 1)"))
      .withColumn("k", (length(bin(col("q"))) - 1).cast("long"))
      .withColumn("s_milli", expr(
        "1000 * k + ((q - shiftleft(CAST(1 AS BIGINT), k)) * 1000) div shiftleft(CAST(1 AS BIGINT), k)"))
      .select("tok", "s_milli")
    toks.join(scored, "tok")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"), sum("s_milli").as("sum_milli"))
      .withColumn("bpt_milli", expr("sum_milli div n_tok"))
      .withColumn("band", expr("bpt_milli div 1000"))
      .select("doc_id", "source", "n_tok", "bpt_milli", "band")
      .orderBy("doc_id")
  }

  private val q223Sql =
    """WITH toks AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS tok
      |  FROM documents),
      |tot AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM toks),
      |cf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |sc AS (SELECT tok, q, CAST(length(bin(q)) - 1 AS BIGINT) AS k FROM
      |  (SELECT tok, (tot.n + tot.v) // (cnt + 1) AS q FROM cf, tot)),
      |sm AS (SELECT tok,
      |   1000 * k + ((q - (CAST(1 AS BIGINT) << k)) * 1000) // (CAST(1 AS BIGINT) << k) AS s_milli
      |  FROM sc),
      |d AS (SELECT t.doc_id, t.source, count(*) AS n_tok,
      |   CAST(sum(s.s_milli) AS BIGINT) AS sum_milli
      |  FROM toks t JOIN sm s USING (tok) GROUP BY 1, 2)
      |SELECT doc_id, source, n_tok,
      | sum_milli // n_tok AS bpt_milli,
      | (sum_milli // n_tok) // 1000 AS band
      |FROM d ORDER BY doc_id""".stripMargin

  // q239: TRIGRAM-INDEXED SUBSTRING SEARCH — the retrieval family's
  // SUBSTRING member (q107 inverts at word grain, q84 ranks by word
  // match; neither can answer "which docs contain this character
  // string" without reading every byte). The pg_trgm / code-search
  // design, distributed: docs post their DISTINCT character trigrams
  // (27-letter alphabet → ≤ 19.7k possible keys, a bounded metadata
  // domain no matter the corpus size); a needle's candidates are the
  // docs containing its 2 RAREST trigrams (rarest-first is the
  // selectivity trick that keeps posting fan-in off the hot keys), met
  // through a BROADCAST join (the rare set is ≤ 2 rows/needle); the
  // exact `contains` confirm runs only on candidates. Needles are
  // self-derived (top-2 corpus tokens of length ≥ 5 + top-2 adjacent
  // word bigrams as PHRASES — deterministic in both engines), so the
  // fixture never goes stale; the phrase needles are the ones whose
  // space-spanning trigrams match across unrelated word boundaries, so
  // their candidate sets measurably exceed their matches (precision
  // ~350‰ at sf0.01) and the confirm step is exercised for real, while
  // the word needles land exact. The trigram set is
  // distinct-grain BEFORE the explode (array_distinct row-local — the
  // q132 allocation lesson), so the exchange carries ≤ a few hundred
  // rows/doc. The superset invariant (text ⊇ needle ⇒ text ⊇ its
  // trigrams) makes the index candidate set lossless by construction;
  // the oracle computes `matched` by the NAIVE full-corpus contains
  // scan, so the hash match proves the index path loses no doc. At
  // 100 TB: the naive arm reads every byte; the index arm reads
  // posting lists + candidate docs — the output's precision_milli is
  // exactly the read-amplification a search tier saves.
  private def q239(s: SparkSession, d: String): DataFrame = {
    // r17 note: a Tables.fanout here (whole query AND needles-only) was
    // MEASURED AND REVERTED — the trigram posting is persisted (warm
    // path reads the cache) and the needle aggregates partial-agg to a
    // tiny map before their exchange, so the fanout exchange was pure
    // overhead (needles-only: 1.56 → 2.04 s; whole query: 2.8 → 6.4 s).
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val wtop = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 5)
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("tok")).limit(2)
      .select(col("tok").as("needle"))
    val btop = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(GraftColumn(WordBigrams(GraftColumn.expr(col("toks")))))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("bigram")).limit(2)
      .select(col("bigram").as("needle"))
    val needles = wtop.unionByName(btop)
    val post = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")))
        .as("tg"))
    // the posting explode is the query's dominant cost and is consumed
    // twice (df aggregation + candidate join) — materialize it once
    // (spill-safe MEMORY_AND_DISK via the registry; measured standalone
    // A/B at sf0.1: 4.06 → 1.13 s, r14)
    graft.Caches.persist(post)
    val tgDf = post.groupBy("tg").agg(count(lit(1)).as("df"))
    val ntg = needles.select(col("needle"), explode(array_distinct(expr(
      "transform(sequence(1, length(needle) - 2), i -> substring(needle, i, 3))")))
      .as("tg"))
    val wr = Window.partitionBy("needle").orderBy(col("df"), col("tg"))
    val rare = ntg.join(tgDf, "tg")
      .withColumn("r", row_number().over(wr)).filter(col("r") <= 2)
      .select("needle", "tg")
    val req = rare.groupBy("needle").agg(count(lit(1)).as("need"))
    val cand = post.join(broadcast(rare), "tg")
      .groupBy("needle", "doc_id").agg(count(lit(1)).as("hit"))
      .join(broadcast(req), "needle")
      .filter(col("hit") === col("need"))
      .select("needle", "doc_id")
    val confirmed = cand.join(docs, "doc_id")
      .filter(expr("contains(text, needle)"))
      .groupBy("needle").agg(count(lit(1)).as("n_matched"))
    cand.groupBy("needle").agg(count(lit(1)).as("n_candidates"))
      .join(confirmed, "needle")
      .withColumn("precision_milli", expr("n_matched * 1000 div n_candidates"))
      .select("needle", "n_candidates", "n_matched", "precision_milli")
      .orderBy("needle")
  }

  private val q239Sql =
    """WITH wtop AS (SELECT tok AS needle FROM (
      |   SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) >= 5 GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 2),
      |btop AS (SELECT bigram AS needle FROM (
      |   SELECT unnest(list_transform(range(1, len(string_split(text,' '))),
      |     i -> string_split(text,' ')[CAST(i AS INT)] || ' ' ||
      |          string_split(text,' ')[CAST(i AS INT)+1])) AS bigram
      |   FROM documents WHERE len(string_split(text,' ')) >= 2)
      |  GROUP BY bigram ORDER BY count(*) DESC, bigram LIMIT 2),
      |needles AS (FROM wtop UNION ALL FROM btop),
      |post AS (SELECT DISTINCT doc_id, tg FROM (
      |   SELECT doc_id, unnest(list_transform(range(1, len(text) - 1),
      |     i -> substr(text, CAST(i AS INT), 3))) AS tg
      |   FROM documents WHERE len(text) >= 3)),
      |tdf AS (SELECT tg, count(*) AS df FROM post GROUP BY tg),
      |ntg AS (SELECT DISTINCT needle, tg FROM (
      |   SELECT needle, unnest(list_transform(range(1, len(needle) - 1),
      |     i -> substr(needle, CAST(i AS INT), 3))) AS tg
      |   FROM needles)),
      |rare AS (SELECT needle, tg FROM (
      |   SELECT needle, tg, row_number() OVER (PARTITION BY needle
      |     ORDER BY df, tg) AS r FROM ntg JOIN tdf USING (tg)) WHERE r <= 2),
      |req AS (SELECT needle, count(*) AS need FROM rare GROUP BY needle),
      |cand AS (SELECT cc.needle, cc.doc_id FROM (
      |   SELECT needle, doc_id, count(*) AS hit FROM post JOIN rare USING (tg)
      |   GROUP BY 1, 2) cc JOIN req USING (needle) WHERE hit = need),
      |cn AS (SELECT needle, count(*) AS n_candidates FROM cand GROUP BY needle),
      |naive AS (SELECT needle, count(*) AS n_matched
      |  FROM needles, documents WHERE contains(text, needle) GROUP BY needle)
      |SELECT needle, CAST(n_candidates AS BIGINT) AS n_candidates,
      | CAST(n_matched AS BIGINT) AS n_matched,
      | CAST(n_matched * 1000 // n_candidates AS BIGINT) AS precision_milli
      |FROM cn JOIN naive USING (needle) ORDER BY needle""".stripMargin

  // q243: POSTING-LIST DELTA-COMPRESSION ADVISOR — prices the storage
  // of q107's inverted index (q165 advises encodings for relational
  // columns; an index's dominant cost is its posting lists, and the
  // universal layout is delta-gaps + a log-sized varint — this reports,
  // per token, exactly the bits/posting that layout pays): consecutive-
  // posting gaps, their exact fixed-point log2 (FixedPoint.log2milli ≈
  // varint bits), and bits_per_gap_milli vs the 64-bit raw id baseline.
  // SCALE mechanism (the row's point): a naive per-token lag window
  // sorts posting lists that are CORPUS-sized for hot tokens (Zipf —
  // the stop-word list IS the corpus); the q229 stitch applies — the
  // 4096-id block grid bounds every window (within-block lag), and
  // block-straddling gaps come from the (tok, block) min/max METADATA
  // grain (lag over occupied blocks — consecutive occupied blocks give
  // exactly the straddling posting pair, empty blocks skip for free).
  // The oracle computes the SAME gaps with the naive single window per
  // token, so the hash match proves the stitch loses and invents
  // nothing. Top-30 tokens by df (TakeOrderedAndProject).
  private def q243(s: SparkSession, d: String): DataFrame = {
    import FixedPoint.log2milli
    val post = graft.Caches.persist(documents(s, d)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
      .withColumn("blk", expr("doc_id div 4096")))
    val wb = Window.partitionBy("tok", "blk").orderBy("doc_id")
    val within = post.withColumn("prev", lag("doc_id", 1).over(wb))
      .filter(col("prev").isNotNull)
      .select(col("tok"), (col("doc_id") - col("prev")).as("gap"))
    val edges = post.groupBy("tok", "blk")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
    val we = Window.partitionBy("tok").orderBy("blk")
    val cross = edges.withColumn("pmx", lag("mx", 1).over(we))
      .filter(col("pmx").isNotNull)
      .select(col("tok"), (col("mn") - col("pmx")).as("gap"))
    val dfreq = post.groupBy("tok").agg(count(lit(1)).as("df"))
    within.unionByName(cross)
      .withColumn("glog", log2milli("gap"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("span"),
        sum("glog").as("sum_glog"))
      .join(dfreq, "tok")
      .withColumn("bits_per_gap_milli", expr("sum_glog div n_gaps"))
      .select("tok", "df", "n_gaps", "span", "bits_per_gap_milli")
      .orderBy(desc("df"), col("tok"))
      .limit(30)
  }

  private val q243Sql =
    """WITH post AS (SELECT DISTINCT doc_id, tok FROM (
      |   SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |g AS (SELECT tok,
      |   doc_id - lag(doc_id) OVER (PARTITION BY tok ORDER BY doc_id) AS gap
      |  FROM post),
      |gg AS (SELECT tok, gap,
      |   1000 * (length(bin(gap)) - 1) +
      |   ((gap - (CAST(1 AS BIGINT) << (length(bin(gap)) - 1))) * 1000)
      |     // (CAST(1 AS BIGINT) << (length(bin(gap)) - 1)) AS glog
      |  FROM g WHERE gap IS NOT NULL),
      |d AS (SELECT tok, count(*) AS df FROM post GROUP BY tok),
      |a AS (SELECT tok, count(*) AS n_gaps, CAST(sum(gap) AS BIGINT) AS span,
      |   CAST(sum(glog) AS BIGINT) AS sum_glog
      |  FROM gg GROUP BY tok)
      |SELECT tok, df, n_gaps, span, sum_glog // n_gaps AS bits_per_gap_milli
      |FROM a JOIN d USING (tok) ORDER BY df DESC, tok LIMIT 30""".stripMargin

  // q258: TOKEN–SOURCE MUTUAL INFORMATION — the feature-selection lens
  // the independence family stops short of: q209 answers "are lang and
  // source dependent AT ALL" (one χ² verdict per grid); this ranks WHICH
  // tokens carry source information — the shortcut/contamination
  // detector a curator runs before training a source classifier is even
  // thinkable (a token with high MI against source is a template
  // artifact, a boilerplate leak, or genuine domain signal; all three
  // need eyes). Pointwise term log2(p(s,t)/(p(s)p(t))) cross-multiplied
  // to integers — log2milli(c_st·N) − log2milli(r_s·c_t) via the shared
  // FixedPoint — and the per-token MI is reported as its EXACT
  // NUMERATOR Σ_s c_st·Δlog2milli (units milli-bits·N): dividing by N
  // would truncate a possibly-(interpolation-)negative sum differently
  // on the two engines (the B205 sign trap), and the rank order is
  // identical either way. Top-20 by MI with each token's dominant
  // source and its share alongside. Shape at 100 TB: ONE (source,
  // token) groupBy → Zipf-bounded grid; marginals broadcast; everything
  // after the first partial-agg shuffle is metadata-sized.
  private def q258(s: SparkSession, d: String): DataFrame = {
    import FixedPoint.log2milli
    val cell = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    graft.Caches.persist(cell)
    val srcs = cell.groupBy("source").agg(sum("c").as("r"))
    val toks = cell.groupBy("tok").agg(sum("c").as("ct"))
    val tot = cell.agg(sum("c").as("n"))
    cell.join(broadcast(srcs), "source").join(toks, "tok")
      .crossJoin(broadcast(tot))
      .withColumn("num", expr("c * n"))
      .withColumn("den", expr("r * ct"))
      .withColumn("term", col("c") * (log2milli("num") - log2milli("den")))
      .groupBy("tok")
      .agg(min("ct").as("n_occ"), sum("term").as("mi_num"),
        // deterministic argmax: zero-padded count ++ source compares the
        // same as (c, source) lexicographically on BOTH engines
        expr("max_by(source, concat(lpad(CAST(c AS STRING), 12, '0'), source))")
          .as("top_source"),
        expr("max(c) * 1000 div min(ct)").as("top_share_milli"))
      .orderBy(desc("mi_num"), col("tok")).limit(20)
      .select("tok", "n_occ", "mi_num", "top_source", "top_share_milli")
  }

  private val q258Sql =
    """WITH cell AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |cc AS (SELECT source, tok, count(*) AS c FROM cell GROUP BY 1, 2),
      |sr AS (SELECT source, CAST(sum(c) AS BIGINT) AS r FROM cc GROUP BY 1),
      |tk AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM cc GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cc),
      |g AS (SELECT cc.source, cc.tok, cc.c, sr.r, tk.ct, t.n,
      |   cc.c * t.n AS num, sr.r * tk.ct AS den
      |  FROM cc JOIN sr USING (source) JOIN tk USING (tok) CROSS JOIN t),
      |lg AS (SELECT source, tok, c, ct,
      |   c * ((1000 * (length(bin(num)) - 1)
      |     + (num - (CAST(1 AS BIGINT) << (length(bin(num)) - 1))) * 1000
      |       // (CAST(1 AS BIGINT) << (length(bin(num)) - 1)))
      |   - (1000 * (length(bin(den)) - 1)
      |     + (den - (CAST(1 AS BIGINT) << (length(bin(den)) - 1))) * 1000
      |       // (CAST(1 AS BIGINT) << (length(bin(den)) - 1)))) AS term
      |  FROM g)
      |SELECT tok, min(ct) AS n_occ, CAST(sum(term) AS BIGINT) AS mi_num,
      | arg_max(source, lpad(CAST(c AS VARCHAR), 12, '0') || source) AS top_source,
      | CAST(max(c) AS BIGINT) * 1000 // min(ct) AS top_share_milli
      |FROM lg GROUP BY tok ORDER BY mi_num DESC, tok LIMIT 20""".stripMargin

  // q269: GOOD–TURING MISSING MASS — the question the frequency family
  // measures around but never answers: how much probability mass does
  // this corpus NOT cover? q136 fits Heaps' growth, q203 profiles the
  // frequency spectrum, q97 prices seen tokens — Good–Turing turns the
  // spectrum's leading edge into the two numbers a crawl/curation loop
  // acts on: P(next token is UNSEEN) = S₁/N (Turing's missing-mass
  // estimate — the singleton fraction; a source still near its unseen
  // frontier deserves more crawl budget) and the smoothed low counts
  // r* = (r+1)·S(r+1)/S(r) (what a count of r is actually WORTH — the
  // discount LM smoothing applies; r* ≪ r at the low end is the
  // signature of a heavy unseen tail). All integer milli over the
  // (source, count) spectrum: one Zipf-bounded (source, token) collapse
  // is the corpus-scale shuffle, the spectrum and every estimate live on
  // a ≤ sources × counts grid. S(r) = 0 rungs report NULL (no evidence,
  // no estimate) rather than fabricating a discount.
  private def q269(s: SparkSession, d: String): DataFrame = {
    val spec = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source", "c").agg(count(lit(1)).as("s_c"))
    def sAt(r: Int) = sum(when(col("c") === r, col("s_c")).otherwise(0L)).as(s"s$r")
    spec.groupBy("source")
      .agg(sum(expr("c * s_c")).as("n_tokens"), sum("s_c").as("n_types"),
        sAt(1), sAt(2), sAt(3), sAt(4), sAt(5))
      .withColumn("p0_milli", expr("s1 * 1000 div n_tokens"))
      .withColumn("rstar1_milli", expr("CASE WHEN s1 > 0 THEN 2 * s2 * 1000 div s1 END"))
      .withColumn("rstar2_milli", expr("CASE WHEN s2 > 0 THEN 3 * s3 * 1000 div s2 END"))
      .withColumn("rstar3_milli", expr("CASE WHEN s3 > 0 THEN 4 * s4 * 1000 div s3 END"))
      .withColumn("rstar4_milli", expr("CASE WHEN s4 > 0 THEN 5 * s5 * 1000 div s4 END"))
      .orderBy("source")
  }

  private val q269Sql =
    """WITH cnt AS (SELECT source, tok, count(*) AS c FROM (
      |   SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) u
      |  GROUP BY 1, 2),
      |spec AS (SELECT source, c, count(*) AS s_c FROM cnt GROUP BY 1, 2),
      |g AS (SELECT source,
      |   CAST(sum(c * s_c) AS BIGINT) AS n_tokens,
      |   CAST(sum(s_c) AS BIGINT) AS n_types,
      |   CAST(sum(CASE WHEN c = 1 THEN s_c ELSE 0 END) AS BIGINT) AS s1,
      |   CAST(sum(CASE WHEN c = 2 THEN s_c ELSE 0 END) AS BIGINT) AS s2,
      |   CAST(sum(CASE WHEN c = 3 THEN s_c ELSE 0 END) AS BIGINT) AS s3,
      |   CAST(sum(CASE WHEN c = 4 THEN s_c ELSE 0 END) AS BIGINT) AS s4,
      |   CAST(sum(CASE WHEN c = 5 THEN s_c ELSE 0 END) AS BIGINT) AS s5
      |  FROM spec GROUP BY 1)
      |SELECT source, n_tokens, n_types, s1, s2, s3, s4, s5,
      | s1 * 1000 // n_tokens AS p0_milli,
      | CASE WHEN s1 > 0 THEN 2 * s2 * 1000 // s1 END AS rstar1_milli,
      | CASE WHEN s2 > 0 THEN 3 * s3 * 1000 // s2 END AS rstar2_milli,
      | CASE WHEN s3 > 0 THEN 4 * s4 * 1000 // s3 END AS rstar3_milli,
      | CASE WHEN s4 > 0 THEN 5 * s5 * 1000 // s4 END AS rstar4_milli
      |FROM g ORDER BY source""".stripMargin

  // q345: OKAPI BM25 WITH TRUE LOG-IDF — the "deployment variant" that
  // q84's scaladoc explicitly deferred: q84 ships the odds CORE
  // (N−df+½)/(df+½) unlogged because float ln() is not cross-engine
  // reproducible, accepting a rare-term overweight in multi-term sums.
  // This query closes that gap with the repo's fixed-point log2
  // (FixedPoint.log2milli — integer bit-length + linear interpolation,
  // hash-identical in both engines), so the SUMMED score now has BM25's
  // actual log-idf term weighting. The Lucene-variant IDF
  // log((N+1)/(df+½)) keeps every weight nonnegative where classic
  // BM25 goes negative on >half-corpus terms. Declared query =
  // {dup, vector, hash} (mixed document frequencies), k1 = 1.2,
  // b = 0.75. Exact fixed point end to end: IDF via the shared
  // bit-length log2milli on the ×2-cleared rationals (2N+2, 2df+1 —
  // integers, no float log), the tf saturation term cleared of both
  // rationals by ×10·S (S = corpus token count): tfn = 22·tf·S /
  // (10·tf·S + 3·S + 9·dl·N) — denominators stay DECIMAL(38)-safe at
  // any corpus size because dl/avgdl rides as dl·N/S, never a
  // truncated average-doc-length. 100 TB shape: terms filter BEFORE
  // the tf collapse (the scan prunes to query-term postings), corpus
  // constants are one broadcast row, top-10 is a TakeOrdered under the
  // (score DESC, doc_id) total order — no global sort.
  private def q345(s: SparkSession, d: String): DataFrame = {
    val qTerms = Seq("dup", "vector", "hash")
    val tok = tokenized(s, d)
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
    val hits = tok.filter(col("term").isInCollection(qTerms))
    val tf = hits.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df_ = hits.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val consts = documents(s, d)
      .select(size(split(col("text"), " ")).as("dl0"))
      .agg(count(lit(1)).as("n_docs"), sum("dl0").as("s_tok"))
    val idf = df_.crossJoin(broadcast(consts))
      .withColumn("idf_milli",
        FixedPoint.log2milli("(2 * n_docs + 2)") -
          FixedPoint.log2milli("(2 * df + 1)"))
    tf.join(broadcast(idf), "term")
      .withColumn("score_term_milli", expr(
        """CAST(idf_milli * (CAST(22 AS DECIMAL(38,0)) * tf * s_tok)
          | div (CAST(10 AS DECIMAL(38,0)) * tf * s_tok + 3 * s_tok
          |      + CAST(9 AS DECIMAL(38,0)) * dl * n_docs) AS BIGINT)"""
          .stripMargin))
      .groupBy("doc_id", "dl")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum("score_term_milli").as("score_milli"))
      .select(col("doc_id"), expr("CAST(dl AS BIGINT)").as("dl"),
        col("n_terms_hit"), col("score_milli"))
      .orderBy(desc("score_milli"), col("doc_id"))
      .limit(10)
  }

  private val q345Sql =
    """WITH tok AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |   unnest(string_split(text, ' ')) AS term FROM documents),
      |hits AS (SELECT * FROM tok WHERE term IN ('dup', 'vector', 'hash')),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM hits
      |  GROUP BY 1, 2, 3),
      |df AS (SELECT term, count(*) AS df FROM
      |  (SELECT DISTINCT doc_id, term FROM hits) GROUP BY 1),
      |cst AS (SELECT count(*) AS n_docs,
      |   sum(len(string_split(text, ' '))) AS s_tok FROM documents),
      |idf AS (SELECT term, df, n_docs, s_tok,
      |   (1000 * (length(bin(2 * n_docs + 2)) - 1)
      |    + ((2 * n_docs + 2)
      |       - (CAST(1 AS BIGINT) << (length(bin(2 * n_docs + 2)) - 1))) * 1000
      |      // (CAST(1 AS BIGINT) << (length(bin(2 * n_docs + 2)) - 1)))
      |   - (1000 * (length(bin(2 * df + 1)) - 1)
      |    + ((2 * df + 1)
      |       - (CAST(1 AS BIGINT) << (length(bin(2 * df + 1)) - 1))) * 1000
      |      // (CAST(1 AS BIGINT) << (length(bin(2 * df + 1)) - 1)))
      |   AS idf_milli
      |  FROM df CROSS JOIN cst),
      |sc AS (SELECT doc_id, dl,
      |   CAST(idf_milli * (CAST(22 AS HUGEINT) * tf * s_tok)
      |     // (CAST(10 AS HUGEINT) * tf * s_tok + 3 * s_tok
      |         + CAST(9 AS HUGEINT) * dl * n_docs) AS BIGINT)
      |     AS score_term_milli
      |  FROM tf JOIN idf USING (term))
      |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
      | CAST(count(*) AS BIGINT) AS n_terms_hit,
      | CAST(sum(score_term_milli) AS BIGINT) AS score_milli
      |FROM sc GROUP BY 1, 2
      |ORDER BY score_milli DESC, doc_id LIMIT 10""".stripMargin

  // q362: CHAO1 VOCABULARY-RICHNESS ESTIMATOR — the question q136
  // (vocab growth) and q269 (Good–Turing mass) circle but never answer:
  // how many word types does the POPULATION hold that this corpus
  // sample hasn't seen yet — the budgeting number for "how much more
  // data until the vocabulary saturates". Chao1's bias-corrected form
  // Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1)) needs only the singleton/doubleton
  // counts the frequency spectrum (q203) already materializes, is
  // defined even at f₂ = 0, and is a hard LOWER bound on the true
  // richness (Chao 1984). Reported with Good's sample coverage
  // Ĉ = 1 − f₁/N — the complementary "what mass of future tokens will
  // be novel" read (the q269 machinery's headline constant). One
  // token-grain collapse to the Zipf-bounded vocab grid; everything
  // after is a 1-row fold.
  private def q362(s: SparkSession, d: String): DataFrame = {
    val freq = tokenized(s, d)
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    freq.agg(count(lit(1)).as("s_obs"),
      sum("cnt").as("n_tokens"),
      sum(expr("CAST(cnt = 1 AS BIGINT)")).as("f1"),
      sum(expr("CAST(cnt = 2 AS BIGINT)")).as("f2"))
      .withColumn("chao1_milli", expr(
        "s_obs * 1000 + f1 * (f1 - 1) * 1000 div (2 * (f2 + 1))"))
      .withColumn("unseen_milli", expr("chao1_milli - s_obs * 1000"))
      .withColumn("coverage_permille", expr(
        "CASE WHEN n_tokens > 0 THEN 1000 - f1 * 1000 div n_tokens ELSE 0L END"))
      .select(col("s_obs"), col("n_tokens"), col("f1"), col("f2"),
        col("chao1_milli"), col("unseen_milli"), col("coverage_permille"))
  }

  private val q362Sql =
    """WITH f AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM f GROUP BY 1),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS s_obs,
      |   CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |   CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM c)
      |SELECT s_obs, n_tokens, f1, f2,
      | s_obs * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1)) AS chao1_milli,
      | f1 * (f1 - 1) * 1000 // (2 * (f2 + 1)) AS unseen_milli,
      | CASE WHEN n_tokens > 0 THEN 1000 - f1 * 1000 // n_tokens
      |  ELSE 0 END AS coverage_permille
      |FROM ag""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q345_bm25" -> (q345 _),
    "q362_chao1_richness" -> (q362 _),
    "q269_good_turing" -> (q269 _),
    "q258_token_source_mi" -> (q258 _),
    "q243_posting_compression" -> (q243 _),
    "q239_trigram_search" -> (q239 _),
    "q223_unigram_surprisal" -> (q223 _),
    "q203_frequency_spectrum" -> (q203 _),
    "q191_vocab_coverage" -> (q191 _),
    "q176_bigram_familiarity" -> (q176 _),
    "q135_template_strip" -> (q135 _),
    "q136_vocab_growth" -> (q136 _),
    "q132_bpe_merge_pairs" -> (q132 _),
    "q106_oov_rate" -> (q106 _),
    "q107_inverted_index" -> (q107 _),
    "q102_quality_ensemble" -> (q102 _),
    "q103_collocations" -> (q103 _),
    "q99_repetition_score" -> (q99 _),
    "q97_token_freq_score" -> (q97 _),
    "q84_bm25_topk" -> (q84 _),
    "q82_source_quota" -> (q82 _),
    "q75_decontamination" -> (q75 _),
    "q74_split_stratified" -> (q74 _),
    "q39_tfidf_topterms" -> (q39 _),
    "q34_token_stats" -> (q34 _),
    "q35_langid_heuristic" -> (q35 _),
    "q36_quality_score" -> (q36 _),
    "q37_fingerprint" -> (q37 _),
    "q38_bigram_topk" -> (q38 _))

  override val oracles: Map[String, String] = Map(
    "q345_bm25" -> q345Sql,
    "q362_chao1_richness" -> q362Sql,
    "q269_good_turing" -> q269Sql,
    "q258_token_source_mi" -> q258Sql,
    "q243_posting_compression" -> q243Sql,
    "q239_trigram_search" -> q239Sql,
    "q223_unigram_surprisal" -> q223Sql,
    "q203_frequency_spectrum" -> q203Sql,
    "q191_vocab_coverage" -> q191Sql,
    "q176_bigram_familiarity" -> q176Sql,
    "q135_template_strip" -> q135Sql,
    "q136_vocab_growth" -> q136Sql,
    "q132_bpe_merge_pairs" -> q132Sql,
    "q106_oov_rate" -> q106Sql,
    "q107_inverted_index" -> q107Sql,
    "q102_quality_ensemble" -> q102Sql,
    "q103_collocations" -> q103Sql,
    "q99_repetition_score" -> q99Sql,
    "q97_token_freq_score" -> q97Sql,
    "q84_bm25_topk" -> q84Sql,
    "q82_source_quota" -> q82Sql,
    "q75_decontamination" -> q75Sql,
    "q74_split_stratified" -> q74Sql,
    "q39_tfidf_topterms" -> q39Sql,
    "q34_token_stats" -> q34Sql,
    "q35_langid_heuristic" -> q35Sql,
    "q36_quality_score" -> q36Sql,
    "q37_fingerprint" -> q37Sql,
    "q38_bigram_topk" -> q38Sql)
}
