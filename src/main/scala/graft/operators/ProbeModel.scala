package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared closed-form linear probe behind the classifier-eval family
  * (q286 confusion, q292 calibration, q298 ROC-AUC, q299 kappa): ONE
  * definition of the feature extraction and the Cramer-solved normal
  * equations, so the four consumers grade the SAME model — a drift
  * between their copies would silently decalibrate accuracy vs
  * calibration vs discrimination against each other (the FixedPoint
  * factoring precedent). Expressions are verbatim what q286 shipped with;
  * each consumer's DuckDB oracle carries the identical SQL block.
  */
private[operators] object ProbeModel {
  import Tables._

  /** doc-grain features: bkt (split bucket), x1 = stopword ratio (deci),
    * x2 = mean token length (deci), y = is-English label. */
  def features(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("bkt", pctBucket(col("doc_id")))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("x1", expr(
        "CAST(size(filter(toks, t -> t = 'a' OR t = 'the')) AS BIGINT) * 10 div n_tok"))
      .withColumn("x2", expr(
        "CAST(aggregate(toks, 0L, (acc, t) -> acc + length(t)) AS BIGINT) * 10 div n_tok"))
      .withColumn("y", expr("IF(lang = 'en', 1L, 0L)"))

  /** 1-row (w0_micro, w1_micro, w2_micro) OLS weights from the train
    * split (bkt < 80) via exact Cramer determinants. */
  def weights(feat: DataFrame): DataFrame =
    feat.filter(col("bkt") < 80)
      .agg(count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(expr("CAST(x1 AS DECIMAL(38,0)) * x1")).as("s11"),
        sum(expr("CAST(x1 AS DECIMAL(38,0)) * x2")).as("s12"),
        sum(expr("CAST(x2 AS DECIMAL(38,0)) * x2")).as("s22"),
        sum("y").as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * x1")).as("sy1"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * x2")).as("sy2"))
      .withColumn("det", expr(
        "n * (s11 * s22 - s12 * s12) - s1 * (CAST(s1 AS DECIMAL(38,0)) * s22 - s12 * s2) " +
          "+ s2 * (CAST(s1 AS DECIMAL(38,0)) * s12 - s11 * s2)"))
      .withColumn("w0_micro", expr(
        "CASE WHEN det != 0 THEN CAST((sy * (s11 * s22 - s12 * s12) " +
          "- s1 * (CAST(sy1 AS DECIMAL(38,0)) * s22 - s12 * sy2) " +
          "+ s2 * (CAST(sy1 AS DECIMAL(38,0)) * s12 - s11 * sy2)) * 1000000 div det AS BIGINT) ELSE 0L END"))
      .withColumn("w1_micro", expr(
        "CASE WHEN det != 0 THEN CAST((n * (CAST(sy1 AS DECIMAL(38,0)) * s22 - sy2 * s12) " +
          "- sy * (CAST(s1 AS DECIMAL(38,0)) * s22 - s12 * s2) " +
          "+ s2 * (CAST(s1 AS DECIMAL(38,0)) * sy2 - sy1 * s2)) * 1000000 div det AS BIGINT) ELSE 0L END"))
      .withColumn("w2_micro", expr(
        "CASE WHEN det != 0 THEN CAST((n * (CAST(s11 AS DECIMAL(38,0)) * sy2 - s12 * sy1) " +
          "- s1 * (CAST(s1 AS DECIMAL(38,0)) * sy2 - sy1 * s2) " +
          "+ sy * (CAST(s1 AS DECIMAL(38,0)) * s12 - s11 * s2)) * 1000000 div det AS BIGINT) ELSE 0L END"))
      .select("w0_micro", "w1_micro", "w2_micro")

  /** The matching DuckDB CTE block: `feat` (doc-grain features) and `wt`
    * (the 1-row weights). Consumers append their own scoring CTEs. */
  val duckFeatAndWeights: String =
    """feat AS (SELECT doc_id, source, lang,
      |   ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bkt,
      |   len(list_filter(string_split(text, ' '), t -> t = 'a' OR t = 'the'))
      |     * 10 // len(string_split(text, ' ')) AS x1,
      |   list_sum(list_transform(string_split(text, ' '), t -> length(t)))
      |     * 10 // len(string_split(text, ' ')) AS x2,
      |   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT count(*) AS n,
      |   CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |   sum(CAST(x1 AS HUGEINT) * x1) AS s11, sum(CAST(x1 AS HUGEINT) * x2) AS s12,
      |   sum(CAST(x2 AS HUGEINT) * x2) AS s22, CAST(sum(y) AS HUGEINT) AS sy,
      |   sum(CAST(y AS HUGEINT) * x1) AS sy1, sum(CAST(y AS HUGEINT) * x2) AS sy2
      |  FROM feat WHERE bkt < 80),
      |dt AS (SELECT *,
      |   n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s12 - s11 * s2) AS det FROM m),
      |wt AS (SELECT
      |   CASE WHEN det != 0 THEN CAST((sy * (s11 * s22 - s12 * s12)
      |     - s1 * (sy1 * s22 - s12 * sy2) + s2 * (sy1 * s12 - s11 * sy2))
      |     * 1000000 // det AS BIGINT) ELSE 0 END AS w0_micro,
      |   CASE WHEN det != 0 THEN CAST((n * (sy1 * s22 - sy2 * s12)
      |     - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * sy2 - sy1 * s2))
      |     * 1000000 // det AS BIGINT) ELSE 0 END AS w1_micro,
      |   CASE WHEN det != 0 THEN CAST((n * (s11 * sy2 - s12 * sy1)
      |     - s1 * (s1 * sy2 - sy1 * s2) + sy * (s1 * s12 - s11 * s2))
      |     * 1000000 // det AS BIGINT) ELSE 0 END AS w2_micro
      |  FROM dt)""".stripMargin
}
