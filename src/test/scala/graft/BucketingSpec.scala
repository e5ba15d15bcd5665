package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The co-located join half of the 100 TB story (SCALE.md "bucketing for
  * co-located joins"): writing both fact tables bucketed on the join key
  * removes the join-side exchanges entirely — the scan's bucket layout
  * satisfies the join's distribution requirement, so at scale the
  * orders⋈lineitem shuffle (the single largest data movement in the
  * relational suite) disappears for every query that joins on the
  * pre-bucketed key. */
class BucketingSpec extends SparkSpec {

  test("fact-fact join on bucketed tables plans with no join-side exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    // force a sort-merge join so the assertion is about bucketing, not a
    // small-scale broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val bucketed = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = bucketed.queryExecution.executedPlan.toString
      val joinShuffles =
        "Exchange hashpartitioning\\([ol]_orderkey".r.findAllIn(plan).length
      assert(joinShuffles === 0, s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "join unexpectedly broadcast — assertion would be vacuous")

      // identical results to the plain (shuffling) join
      val plain = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(bucketed.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(bucketed).count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
