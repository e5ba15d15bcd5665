package graft

import graft.operators.RelationalCore
import org.apache.spark.sql.functions._

class RelationalCoreSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    RelationalCore.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0 || name == "q05_anti_join", s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle") {
    assert(RelationalCore.oracles.keySet == RelationalCore.queries.keySet)
  }

  test("q01 groups are the full returnflag × linestatus domain") {
    val rows = RelationalCore.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getString(0)).toSet === Set("A", "N", "R"))
  }

  test("q14 ranking is deterministic: rn unique within group, rank <= rn") {
    val df = RelationalCore.queries("q14_window_rank")(spark, sf)
    val bad = df.groupBy("l_returnflag", "rn").count().filter(col("count") > 1).count()
    assert(bad === 0)
    assert(df.filter(col("rk") > col("rn")).count() === 0)
  }

  test("q16 emits exactly top-3 per priority") {
    val df = RelationalCore.queries("q16_topk_per_group")(spark, sf)
    assert(df.count() === 15) // 5 priorities × 3
    val monotone = df.groupBy("o_orderpriority")
      .agg((min("o_totalprice") === last("o_totalprice")).as("ok"))
    assert(monotone.count() === 5)
  }

  test("q18 dedup keeps exactly one row per (user_id, event_type)") {
    val df = RelationalCore.queries("q18_dedup_exact")(spark, sf)
    assert(df.groupBy("user_id", "event_type").count().filter(col("count") > 1).count() === 0)
  }

  test("q25 only keeps orders strictly above their customer average") {
    val df = RelationalCore.queries("q25_scalar_subquery")(spark, sf)
    val viol = df.filter(col("o_totalprice") * col("cnt") <= col("cust_total") - lit(0.01)).count()
    assert(viol === 0)
  }

  test("q08 as-of: last_purchase_ts never exceeds the click ts") {
    val df = RelationalCore.queries("q08_asof_join")(spark, sf)
    assert(df.filter(col("last_purchase_ts") > col("ts")).count() === 0)
  }
}
