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

  test("q331: brute delay order statistics and breach rates match") {
    val rows = Tables.lineitem(spark, sf).selectExpr("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, sf).selectExpr("o_orderkey", "o_orderdate",
        "o_orderpriority"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_orderpriority",
        "datediff(to_date(l_shipdate), to_date(o_orderdate)) AS delay")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    val got = graft.operators.RelationalCore.queries("q331_sla_latency")(spark, sf)
      .collect()
    assert(got.length === rows.map(_._1).distinct.length)
    got.foreach { g =>
      val ds = rows.filter(_._1 == g.getAs[String]("o_orderpriority"))
        .map(_._2).sorted
      val n = ds.length
      def pct(mult: Long, thr: Long): Long =
        ds(ds.indices.find(i => (i + 1).toLong * mult >= thr * n).get)
      assert(g.getAs[Long]("n_items") === n.toLong)
      assert(g.getAs[Long]("p50_days") === pct(2, 1))
      assert(g.getAs[Long]("p90_days") === pct(10, 9))
      assert(g.getAs[Long]("breach_permille") === ds.count(_ > 90).toLong * 1000 / n)
    }
  }
}
