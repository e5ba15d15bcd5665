package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the other half of the pruning story next
  * to static pruning (SourceSinkSpec) and bucketing (BucketingSpec): when
  * a fact table is PARTITIONED on a join key and the dim side carries a
  * selective filter, Catalyst injects the dim side's key set into the
  * fact scan as a runtime partition filter, so the fact table only reads
  * the partitions the join can match. At 100 TB this is the difference
  * between scanning the whole fact table and scanning the 2 of N
  * partitions a filtered dimension selects — no operator code required,
  * but the layout must be partitioned on the join key for Catalyst to
  * have anything to prune. */
class DppSpec extends SparkSpec {

  test("a filtered dim join against a partitioned fact scan plans a dynamic pruning filter") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim: one row per event type, filter keeps 2 of 5. The dim must be a
    // real source (not a literal LocalRelation): constant folding would
    // collapse an in-memory Seq's Filter node, and the PartitionPruning
    // rule only fires when the dim side still HAS a selective predicate.
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("click", 1L), ("view", 2L), ("purchase", 3L), ("signup", 4L),
      ("error", 5L)).toDF("event_type", "type_rank")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("type_rank") <= 2), Seq("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan carries no dynamic pruning filter:\n${plan.take(1500)}")

    // pruning must not change results: equal to the statically-filtered join
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
