package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryPack]]: each pack contributes named query builders
  * `(SparkSession, sfDir) => DataFrame` and (where ANSI-SQL-expressible) a
  * DuckDB oracle with IDENTICAL output column names and a total ORDER BY.
  */
object SparkEntry {
  private[graft] val packs: Seq[QueryPack] = Seq(
    operators.RelationalCore,
    operators.StreamSemantics,
    operators.TextAnalysis,
    operators.Dedup,
    operators.Similarity,
    operators.ScaleOps,
    operators.CurationOps,
    operators.AuditOps,
    operators.ExperimentOps,
    operators.SeriesOps,
    operators.MarketOps,
    operators.LmOps,
    operators.WebOps,
    operators.CustomSurface,
    contentops.ContentOps,
    multimodal.Multimodal)

  /** Flagship query: the reference's headline use case — real-time
    * analytics on publishing changes (user-guide.md:3) over the full wire
    * ingest path. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q57_publish_analytics")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
