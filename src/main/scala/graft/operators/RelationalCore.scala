package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core (SURVEY.md §2B rows B1–B24): scans, filter/project with
  * the full predicate surface, every join flavor, hash aggregation incl.
  * distinct aggregates / rollup / cube, exact percentiles, sort/limit/top-k,
  * set operations, and the scalar function families (string, datetime, math,
  * array, map/json).
  *
  * Scale notes (100 TB):
  *  - dimension sides (`region nation supplier customer part`) are explicitly
  *    `broadcast()` so no fact-table shuffle happens for dim joins;
  *  - aggregations are plain `groupBy().agg()` — Catalyst plans
  *    partial (map-side) + final aggregation automatically, so the shuffle
  *    carries pre-combined state, not raw rows;
  *  - every query ends in a total `ORDER BY` purely for the driver's
  *    hash-compare determinism (`SURVEY.md §7.4`); at production scale the
  *    final sort would be dropped or replaced by `sortWithinPartitions`.
  */
object RelationalCore extends QueryPack {
  import Tables._

  // q01: TPC-H Q1-shaped pricing summary — scan + filter pushdown + multi-agg.
  private def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      | round(avg(l_quantity),4) AS avg_qty,
      | round(avg(l_extendedprice),4) AS avg_price,
      | round(avg(l_discount),6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q02: predicate surface — BETWEEN, IN, LIKE, CASE WHEN, boolean algebra.
  private def q02(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_size").between(10, 20) &&
        (col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") || col("p_name").like("%widget%")))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        when(col("p_size") < 13, "small")
          .when(col("p_size") < 17, "medium")
          .otherwise("large").as("size_class"))
      .orderBy("p_partkey")

  private val q02Sql =
    """SELECT p_partkey, p_name, p_brand, p_size,
      | CASE WHEN p_size < 13 THEN 'small' WHEN p_size < 17 THEN 'medium' ELSE 'large' END AS size_class
      |FROM part
      |WHERE p_size BETWEEN 10 AND 20
      |  AND (p_brand IN ('Brand#1','Brand#2','Brand#3') OR p_name LIKE '%widget%')
      |ORDER BY p_partkey""".stripMargin

  // q03: three-way equi-join (TPC-H Q3 shape). customer is a dim → broadcast;
  // orders⋈lineitem is the fact-fact shuffle join on the natural key.
  private def q03(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // q04: left-semi join (EXISTS).
  private def q04(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val l = lineitem(s, d).filter(col("l_quantity") > 45)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private val q04Sql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin

  // q05: left-anti join (NOT EXISTS) — customers with no orders.
  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // q06: left-outer join with null-tolerant aggregation.
  private def q06(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spend"))
      .orderBy("c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
      | round(coalesce(sum(o_totalprice),0),2) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // q07: theta/band join — equi component (nation) plus a range predicate.
  // Catalyst plans the equi part as the join key and the band as a filter.
  private def q07(s: SparkSession, d: String): DataFrame = {
    val su = supplier(s, d)
    val c = customer(s, d)
    su.join(c, su("s_nationkey") === c("c_nationkey") &&
        abs(su("s_acctbal") - c("c_acctbal")) < lit(500.0))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(abs(col("s_acctbal") - col("c_acctbal"))), 4).as("avg_gap"))
      .orderBy("s_nationkey")
  }

  private val q07Sql =
    """SELECT s_nationkey, count(*) AS n_pairs, round(avg(abs(s_acctbal-c_acctbal)),4) AS avg_gap
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND abs(s_acctbal-c_acctbal) < 500.0
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // q08: as-of join, shuffle-free formulation. For each 'click' event, the
  // most recent 'purchase' by the same user at or before it. Implemented as
  // the union trick: tag both sides, one window pass per user — a single
  // shuffle on user_id instead of a range join, which is the formulation
  // that survives 100 TB (no O(n·m) pair blow-up, no broadcast-NL join).
  private def q08(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), lit(null).cast("timestamp").as("p_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"), col("ts").as("p_ts"))
    // p_ts nulls-last so a purchase at the exact same ts sorts before the
    // click row — frame then includes it, matching the oracle's `<=`.
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("p_ts").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
      .orderBy("event_id")
  }

  private val q08Sql =
    """SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
      | (SELECT CAST(max(p.ts) AS TIMESTAMP) FROM events p
      |   WHERE p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts <= c.ts) AS last_purchase_ts
      |FROM events c WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin

  // q210: BRACKETING INTERPOLATION JOIN — the temporal-join family's
  // third member: q08 aligns a sparse signal BACKWARD (as-of/LOCF),
  // q109 fills a grid forward; this aligns it BOTH ways and
  // interpolates — for each click, the user's purchase-value signal
  // LINEARLY interpolated at the click instant from the bracketing
  // purchases (the feature-engineering standard for aligning sparse
  // measurements onto event timestamps). Same scale shape as q08, run
  // twice in one shuffle: the union trick with TWO window passes over
  // the same user_id partitioning (ascending for the predecessor,
  // descending for the successor — one exchange, two in-partition
  // sorts; never a range join, never a pair blow-up). The lerp is the
  // cross-multiplied form (v1·(t2−t) + v2·(t−t1)) div (t2−t1) on
  // DECIMAL(38): every term non-negative, so truncating div agrees
  // across engines — no (v2−v1)-sign trap. Degenerate brackets are
  // explicit modes, not silent nulls: 'exact' (a purchase AT the click
  // instant — the div-by-zero case, served first), 'locf'/'nocb' (only
  // one side exists), 'none'. Ties at one instant break on event_id
  // (max for the backward arm, min for the forward — oracle-mirrored).
  private def q210(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("vm", expr("CAST(round(value * 1000) AS BIGINT)"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"),
        lit(null).cast("long").as("p_us"), lit(null).cast("long").as("p_vm"),
        lit(null).cast("long").as("p_eid"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("us"),
        col("us").as("p_us"), col("vm").as("p_vm"), col("event_id").as("p_eid"))
    val wb = Window.partitionBy("user_id")
      .orderBy(col("us"), col("p_us").asc_nulls_last, col("p_eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("p_us").desc_nulls_last, col("p_eid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pstruct = expr("CASE WHEN p_us IS NOT NULL THEN struct(p_us, p_vm) END")
    clicks.unionByName(purchases)
      .withColumn("prev", last(pstruct, ignoreNulls = true).over(wb))
      .withColumn("nxt", last(pstruct, ignoreNulls = true).over(wf))
      .filter(col("event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("us"),
        col("prev.p_us").as("t1"), col("prev.p_vm").as("v1"),
        col("nxt.p_us").as("t2"), col("nxt.p_vm").as("v2"))
      .withColumn("mode",
        when(col("t1").isNotNull && col("t2").isNotNull && col("t1") === col("t2"), "exact")
          .when(col("t1").isNotNull && col("t2").isNotNull, "lerp")
          .when(col("t1").isNotNull, "locf")
          .when(col("t2").isNotNull, "nocb")
          .otherwise("none"))
      .withColumn("value_milli",
        when(col("mode") === "exact", col("v1"))
          .when(col("mode") === "lerp", expr(
            "CAST((CAST(v1 AS DECIMAL(38,0)) * (t2 - us) + CAST(v2 AS DECIMAL(38,0)) * (us - t1)) div (t2 - t1) AS BIGINT)"))
          .when(col("mode") === "locf", col("v1"))
          .when(col("mode") === "nocb", col("v2")))
      .select("event_id", "user_id", "mode", "value_milli")
      .orderBy("event_id")
  }

  private val q210Sql =
    """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type = 'click'),
      |p AS (SELECT event_id, user_id, epoch_us(ts) AS us,
      |   CAST(round(value * 1000) AS BIGINT) AS vm
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT c.event_id, c.user_id, c.us,
      |  (SELECT p.us FROM p WHERE p.user_id = c.user_id AND p.us <= c.us
      |    ORDER BY p.us DESC, p.event_id DESC LIMIT 1) AS t1,
      |  (SELECT p.vm FROM p WHERE p.user_id = c.user_id AND p.us <= c.us
      |    ORDER BY p.us DESC, p.event_id DESC LIMIT 1) AS v1,
      |  (SELECT p.us FROM p WHERE p.user_id = c.user_id AND p.us >= c.us
      |    ORDER BY p.us ASC, p.event_id ASC LIMIT 1) AS t2,
      |  (SELECT p.vm FROM p WHERE p.user_id = c.user_id AND p.us >= c.us
      |    ORDER BY p.us ASC, p.event_id ASC LIMIT 1) AS v2
      | FROM c)
      |SELECT event_id, user_id,
      | CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 = t2 THEN 'exact'
      |      WHEN t1 IS NOT NULL AND t2 IS NOT NULL THEN 'lerp'
      |      WHEN t1 IS NOT NULL THEN 'locf'
      |      WHEN t2 IS NOT NULL THEN 'nocb' ELSE 'none' END AS mode,
      | CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 = t2 THEN v1
      |      WHEN t1 IS NOT NULL AND t2 IS NOT NULL
      |        THEN CAST((v1::HUGEINT * (t2 - us) + v2::HUGEINT * (us - t1)) // (t2 - t1) AS BIGINT)
      |      WHEN t1 IS NOT NULL THEN v1
      |      WHEN t2 IS NOT NULL THEN v2 END AS value_milli
      |FROM j ORDER BY event_id""".stripMargin

  // q09: cross join (tiny × tiny only — anything else is a design bug).
  private def q09(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  private val q09Sql =
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"

  // q10: distinct aggregates (planned as expand + two-phase agg).
  private def q10(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        round(sum_distinct(col("l_quantity")), 2).as("sum_dist_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q10Sql =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      | count(DISTINCT l_partkey) AS n_part,
      | round(sum(DISTINCT l_quantity),2) AS sum_dist_qty, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q11: ROLLUP. Group cols wrapped in coalesce(·,'ALL') so the subtotal rows
  // are hash-stable without depending on NULL-ordering conventions.
  // `total` is summed as exact per-row CENTS, then divided back: a raw
  // double sum at sf1 magnitude (~2e11 over 1.5M rows) accumulates
  // engine-order-dependent error past the checker's 1e-9 — the r14 sf1
  // sweep caught exactly that. Identical integers divided by the same
  // 100.0 give bit-identical doubles in both engines at any scale.
  private def q11(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE)").as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  private val q11Sql =
    """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
      | count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // q12: CUBE over event dimensions.
  private def q12(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .cube(col("event_type"), date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("wk"), lit("1970-01-01").cast("timestamp")).as("wk"),
        col("n"), col("sum_value"))
      .orderBy("event_type", "wk")

  private val q12Sql =
    """SELECT coalesce(event_type,'ALL') AS event_type,
      | coalesce(wk, TIMESTAMP '1970-01-01') AS wk,
      | count(*) AS n, round(sum(value),2) AS sum_value
      |FROM (SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk, value FROM events)
      |GROUP BY CUBE (event_type, wk)
      |ORDER BY event_type, wk""".stripMargin

  // q69: explicit GROUPING SETS (B11's third form next to ROLLUP/CUBE) —
  // the set list ((status, priority), (priority), ()) is one neither
  // rollup nor cube produces, through the DataFrame-API groupingSets
  // surface. Same coalesce trick as q11 for NULL-ordering immunity.
  private def q69(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      // same exact-cents staging as q11 (sf1 float-sum seam)
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE)").as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  private val q69Sql =
    """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
      | count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // q70: TPC-H Q20 shape — a two-level nested subquery: an IN-subquery
  // over a derived per-(supplier, part) aggregate whose filter is a
  // CORRELATED scalar-aggregate subquery (supplier ships >15% of a
  // part's total volume, for parts matching a name predicate). Catalyst
  // decorrelates both levels (RewriteCorrelatedScalarSubquery +
  // RewritePredicateSubquery → aggregate + joins; PlanSpec asserts no
  // residual subquery expression survives optimization). DECIMAL sums and
  // the cross-multiplied threshold (q*20 > total*3) keep the boundary
  // comparison engine-exact — a double sum could flip a borderline row
  // between engines.
  // The correlated total is computed OVER THE DERIVED AGGREGATE sp, not by
  // re-scanning lineitem: a part's total volume = the sum of its per-
  // supplier sums (restricted to the same part filter), so the rewrite is
  // value-identical. sp is MATERIALIZED (persist) before the SQL runs:
  // Spark inlines a twice-referenced CTE into two subtrees, and the
  // decorrelation rewrite reshapes the inner copy (an extra semi-join
  // level) so ReuseExchange's canonical-plan match never fires — the r5
  // plan scanned lineitem TWICE and ran the (suppkey, partkey) aggregate
  // twice (measured: 6 FileScans, 0 ReusedExchange). With the persisted
  // view, both decorrelated consumers read the same InMemoryRelation:
  // one fact scan, one shuffle, one aggregate, at any scale (the cached
  // relation is the per-(supplier, part) aggregate — orders of magnitude
  // smaller than the fact table, MEMORY_AND_DISK so an over-large dim
  // spills instead of OOMing). The subquery is still a correlated scalar
  // aggregate (PlanSpec asserts decorrelation + single-scan reuse).
  private def q70(s: SparkSession, d: String): DataFrame = {
    supplier(s, d).createOrReplaceTempView("v_supplier")
    val sp = lineitem(s, d)
      .join(part(s, d).filter(col("p_name").contains("e")).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
    graft.Caches.persist(sp)
    sp.createOrReplaceTempView("v_sp")
    s.sql(
      """SELECT s_suppkey, s_name FROM v_supplier
        |WHERE s_suppkey IN (
        | SELECT sp.l_suppkey FROM v_sp sp
        | WHERE sp.q * 20 > (SELECT sum(sp2.q) * 3 FROM v_sp sp2
        |                    WHERE sp2.l_partkey = sp.l_partkey))
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val q70Sql =
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%e%')
      |  GROUP BY l_suppkey, l_partkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      | SELECT sp.l_suppkey FROM sp
      | WHERE sp.q * 20 > (SELECT sum(sp2.q) * 3 FROM sp sp2
      |                    WHERE sp2.l_partkey = sp.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  // q71: TPC-H Q2 shape — min-cost supplier per part via a correlated
  // scalar EQUALITY subquery (cost = the part's minimum cost across all
  // suppliers), the other classic decorrelation pattern: the correlated
  // min folds into a per-part aggregate joined back on (partkey, cost).
  // DECIMAL min is engine-exact; ties (two suppliers at the min price)
  // keep both rows on both engines, so no tiebreak is needed.
  // Like q70, the shared per-(part, supplier) min is MATERIALIZED once:
  // the r5 form computed the join side from lineitem and the correlated
  // min from a SECOND lineitem scan (measured: 4 FileScans). The
  // correlated subquery now takes min-of-mins over the persisted pc —
  // value-identical (min over per-(part, supp) minima = the per-part
  // minimum), and both decorrelated consumers read one InMemoryRelation.
  private def q71(s: SparkSession, d: String): DataFrame = {
    supplier(s, d).createOrReplaceTempView("v_supplier")
    part(s, d).createOrReplaceTempView("v_part")
    val pc = lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("cost"))
    graft.Caches.persist(pc)
    pc.createOrReplaceTempView("v_pc")
    s.sql(
      """SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, CAST(pc.cost AS DOUBLE) AS cost
        |FROM v_part p
        |JOIN v_pc pc ON p.p_partkey = pc.l_partkey
        |JOIN v_supplier s ON s.s_suppkey = pc.l_suppkey
        |WHERE p.p_size <= 3
        |  AND pc.cost = (SELECT min(pc2.cost) FROM v_pc pc2
        |                 WHERE pc2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin)
  }

  private val q71Sql =
    """SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, CAST(pc.cost AS DOUBLE) AS cost
      |FROM part p
      |JOIN (SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      |      FROM lineitem GROUP BY l_partkey, l_suppkey) pc
      |  ON p.p_partkey = pc.l_partkey
      |JOIN supplier s ON s.s_suppkey = pc.l_suppkey
      |WHERE p.p_size <= 3
      |  AND pc.cost = (SELECT min(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
      |                 FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin

  // q13: exact percentiles (linear interpolation — matches quantile_cont).
  private def q13(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy("l_returnflag")

  private val q13Sql =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
      | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
      | round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
      | round(quantile_cont(l_extendedprice, 0.99),4) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q14: ranking window functions with a total tiebreak (determinism).
  private def q14(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(w).as("rn"),
        rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity")).as("rk"),
        dense_rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity")).as("drk"),
        ntile(4).over(w).as("quartile"))
      .filter(col("rn") <= 100)
      .orderBy("l_returnflag", "rn")
  }

  private val q14Sql =
    """SELECT * FROM (
      | SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
      |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rk,
      |  dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drk,
      |  ntile(4) OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS quartile
      | FROM lineitem) WHERE rn <= 100
      |ORDER BY l_returnflag, rn""".stripMargin

  // q15: analytic window functions + frames: running sum, moving average,
  // lag/lead — per customer in order-date order.
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
        round(avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).as("moving_avg3"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead("o_totalprice", 1).over(w), 2).as("next_price"),
        round(first("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("first_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | round(sum(o_totalprice) OVER w_cum,2) AS running_total,
      | round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),4) AS moving_avg3,
      | round(lag(o_totalprice, 1) OVER w_ord,2) AS prev_price,
      | round(lead(o_totalprice, 1) OVER w_ord,2) AS next_price,
      | round(first_value(o_totalprice) OVER w_cum,2) AS first_price
      |FROM orders
      |WINDOW w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // q16: per-group top-k (row_number ≤ k) — the scalable top-k idiom.
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")
  }

  private val q16Sql =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      | SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  // q17: set operations — UNION / INTERSECT / EXCEPT (distinct semantics).
  private def q17(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val highValue = o.filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
    highValue.intersect(urgent).union(highValue.except(open)).distinct().orderBy("k")
  }

  private val q17Sql =
    """SELECT DISTINCT k FROM (
      | SELECT k FROM (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
      |                INTERSECT
      |                SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
      | UNION
      | SELECT k FROM (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
      |                EXCEPT
      |                SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
      |) ORDER BY k""".stripMargin

  // q18: exact dedup, deterministic form — keep earliest row per key with a
  // total tiebreak (the oracle-safe version of dropDuplicates, SURVEY B18).
  private def q18(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  private val q18Sql =
    """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
      | SELECT user_id, event_type, event_id, ts,
      |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      | FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // q19: string function family.
  private def q19(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat_ws("/", col("p_brand"), col("p_type")).as("cat"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        levenshtein(col("p_name"), lit("green widget")).as("lev"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"))
      .orderBy("p_partkey")

  private val q19Sql =
    """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up, length(p_name) AS len,
      | substring(p_name, 1, 5) AS sub, concat_ws('/', p_brand, p_type) AS cat,
      | string_split(p_name, ' ')[1] AS first_word,
      | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
      | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
      | levenshtein(p_name, 'green widget') AS lev,
      | trim('  ' || p_type || ' ') AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin

  // q20: datetime function family. Spark weekday() is 0=Monday; +1 aligns
  // with DuckDB isodow (1=Monday..7=Sunday).
  private def q20(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate")).as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  private val q20Sql =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      | dayofmonth(o_orderdate) AS dom, isodow(o_orderdate) AS isodow,
      | date_trunc('month', o_orderdate) AS month_start,
      | o_orderdate + INTERVAL 30 DAY AS due_date,
      | datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
      | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // q21: math function family (rounded for float determinism).
  private def q21(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        round(abs(col("l_extendedprice") - lit(30000)), 2).as("abs_dev"),
        ceil(col("l_quantity")).as("qceil"),
        floor(col("l_quantity")).as("qfloor"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(pow(col("l_tax") + 1, 2), 6).as("tax_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))
      // the driver's lineitem has DUPLICATE (l_orderkey, l_linenumber)
      // pairs, so l_orderkey alone is not a total order — ties land in
      // engine-dependent positions (caught by the r14 sf1 sweep, where
      // 10x the rows meant 10x the ties). Order by every output column:
      // any rows still tied are bytewise identical.
      .orderBy("l_orderkey", "abs_dev", "ln_price", "exp_disc", "tax_sq",
        "qceil", "qfloor")

  private val q21Sql =
    """SELECT l_orderkey, round(abs(l_extendedprice - 30000),2) AS abs_dev,
      | CAST(ceil(l_quantity) AS BIGINT) AS qceil, CAST(floor(l_quantity) AS BIGINT) AS qfloor,
      | round(ln(l_extendedprice),6) AS ln_price, round(exp(l_discount),6) AS exp_disc,
      | round(pow(l_tax + 1, 2),6) AS tax_sq, round(sqrt(l_extendedprice),6) AS sqrt_price,
      | l_orderkey % 7 AS key_mod7
      |FROM lineitem WHERE l_linenumber = 1
      |ORDER BY l_orderkey, abs_dev, ln_price, exp_disc, tax_sq, qceil, qfloor""".stripMargin

  // q22: array / higher-order function family over the 64-d embeddings.
  // aggregate() folds sequentially → deterministic double sum on both sides.
  private def q22(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        round(expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 6).as("sum_e"),
        round(expr("aggregate(slice(embedding, 1, 8), CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 6).as("sumsq8"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
        round(array_max(col("embedding")).cast("double"), 6).as("emax"),
        round(array_min(col("embedding")).cast("double"), 6).as("emin"))
      .orderBy("vec_id")

  private val q22Sql =
    """SELECT vec_id, len(embedding) AS dim,
      | round(CAST(embedding[1] AS DOUBLE),6) AS e1,
      | round(list_aggregate(embedding::DOUBLE[], 'sum'),6) AS sum_e,
      | round(list_aggregate(list_transform(embedding[1:8]::DOUBLE[], x -> x*x), 'sum'),6) AS sumsq8,
      | len(list_filter(embedding, x -> x > 0)) AS n_pos,
      | round(CAST(list_max(embedding) AS DOUBLE),6) AS emax,
      | round(CAST(list_min(embedding) AS DOUBLE),6) AS emin
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // q23: JSON extraction over the events `props` column.
  private def q23(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("k"), 4).as("avg_k"), max("k").as("max_k"))
      .orderBy("event_type")

  private val q23Sql =
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k),4) AS avg_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // q24: global top-k — planned as TakeOrderedAndProject (no full sort at scale).
  private def q24(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(20)

  private val q24Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // q25: decorrelated scalar subquery — orders above their customer's average,
  // expressed as agg + broadcast-join (what Catalyst decorrelates to anyway).
  // DECIMAL arithmetic keeps the comparison exact: a float avg is sensitive
  // to summation order, which differs between Spark's partial aggregation and
  // the single-threaded oracle; `price*cnt > sum` avoids division entirely.
  private def q25(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).withColumn("tp_dec", col("o_totalprice").cast("decimal(18,2)"))
    val perCust = o.groupBy(col("o_custkey").as("k"))
      .agg(sum("tp_dec").as("sum_dec"), count(lit(1)).as("cnt"))
    // no broadcast() hint: perCust is one row PER CUSTOMER — unbounded at
    // 100 TB; AQE broadcasts it when (and only when) its measured size fits
    o.join(perCust, o("o_custkey") === perCust("k"))
      .filter(col("tp_dec") * col("cnt") > col("sum_dec"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("sum_dec").cast("double").as("cust_total"), col("cnt"))
      .orderBy("o_orderkey")
  }

  private val q25Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      | CAST(sum_dec AS DOUBLE) AS cust_total, cnt
      |FROM orders JOIN (
      |  SELECT o_custkey AS k, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_dec, count(*) AS cnt
      |  FROM orders GROUP BY 1) ON o_custkey = k
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt > sum_dec
      |ORDER BY o_orderkey""".stripMargin

  // q33: map function family (SURVEY B23): construct a map, interrogate it
  // (size/keys/values/element_at), plus from_json into MapType over the
  // events props JSON — scalar outputs only (array outputs don't
  // hash-compare across engines' dataframe bridges).
  private def q33(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("m", map(lit("et"), col("event_type"), lit("uid"), col("user_id").cast("string")))
      .withColumn("pm", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select(col("event_id"),
        size(col("m")).as("n_entries"),
        element_at(col("m"), "et").as("et_val"),
        element_at(col("m"), "uid").as("uid_val"),
        array_join(map_keys(col("m")), ",").as("keys_csv"),
        array_join(map_values(col("m")), ",").as("vals_csv"),
        element_at(col("pm"), "k").as("k_val"))
      .orderBy("event_id")

  private val q33Sql =
    """SELECT event_id, CAST(cardinality(m) AS INT) AS n_entries,
      | m['et'][1] AS et_val, m['uid'][1] AS uid_val,
      | array_to_string(map_keys(m), ',') AS keys_csv,
      | array_to_string(map_values(m), ',') AS vals_csv,
      | (props::JSON->>'k')::BIGINT AS k_val
      |FROM (SELECT event_id, props,
      |        MAP {'et': event_type, 'uid': user_id::VARCHAR} AS m
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  // q66: SQL-text entry path + LATERAL correlated subquery — per region,
  // the top-2 nations by customer count. Runs through spark.sql() over
  // temp views (the engine's second user-facing surface next to the
  // DataFrame DSL).
  private def q66(s: SparkSession, d: String): DataFrame = {
    region(s, d).createOrReplaceTempView("v_region")
    nation(s, d).createOrReplaceTempView("v_nation")
    customer(s, d).createOrReplaceTempView("v_customer")
    s.sql(
      """SELECT r.r_name, t.n_name, t.n_customers
        |FROM v_region r,
        | LATERAL (
        |  SELECT n.n_name, count(c.c_custkey) AS n_customers
        |  FROM v_nation n LEFT JOIN v_customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_customers DESC, n_name
        |  LIMIT 2) t
        |ORDER BY r.r_name, t.n_customers DESC, t.n_name""".stripMargin)
  }

  private val q66Sql =
    """SELECT r.r_name, t.n_name, t.n_customers
      |FROM region r,
      | LATERAL (
      |  SELECT n.n_name, count(c.c_custkey) AS n_customers
      |  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_customers DESC, n_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.n_customers DESC, t.n_name""".stripMargin

  // q67: correlated scalar-aggregate subquery in WHERE (TPC-H Q17 shape) —
  // Catalyst decorrelates to an aggregate + join
  // (RewriteCorrelatedScalarSubquery, SURVEY §4). DECIMAL avg keeps the
  // threshold comparison engine-exact. l_quantity appears in the ORDER BY
  // because (l_orderkey, l_linenumber, l_partkey) is NOT unique in the
  // synthetic lineitem (sf1-sweep finding) — with it, the order is total
  // on every output column.
  private def q67(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        |FROM v_lineitem o
        |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 25 <
        |  (SELECT sum(CAST(l_quantity AS DECIMAL(18,4))) FROM v_lineitem i
        |   WHERE i.l_partkey = o.l_partkey)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin)
  }

  private val q67Sql =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
      |FROM lineitem o
      |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 25 <
      |  (SELECT sum(CAST(l_quantity AS DECIMAL(18,4))) FROM lineitem i
      |   WHERE i.l_partkey = o.l_partkey)
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin

  // q68: string function family, second half (B19): reverse/repeat/pad,
  // ascii/translate, left/right/split_part/instr.
  private def q68(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        reverse(col("p_name")).as("rev"),
        expr("repeat(p_brand, 2)").as("rep2"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        rpad(col("p_brand"), 12, ".").as("brand_pad"),
        ascii(substring(col("p_name"), 1, 1)).as("first_ascii"),
        translate(col("p_name"), "aeiou", "AEIOU").as("upvowel"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_type, 4)").as("r4"),
        expr("split_part(p_type, ' ', 1)").as("type_head"),
        instr(col("p_name"), "e").as("first_e"))
      .orderBy("p_partkey")

  private val q68Sql =
    """SELECT p_partkey, reverse(p_name) AS rev, repeat(p_brand, 2) AS rep2,
      | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
      | rpad(p_brand, 12, '.') AS brand_pad,
      | ascii(substring(p_name, 1, 1)) AS first_ascii,
      | translate(p_name, 'aeiou', 'AEIOU') AS upvowel,
      | left(p_name, 4) AS l4, right(p_type, 4) AS r4,
      | split_part(p_type, ' ', 1) AS type_head,
      | CAST(instr(p_name, 'e') AS INT) AS first_e
      |FROM part ORDER BY p_partkey""".stripMargin

  // q119: POINT-IN-TIME (SCD2) DIMENSION LOOKUP — the warehouse join q08
  // and q80 each cover half of: q80 BUILDS validity intervals, this
  // PROBES them ("which tier was this user on when the event fired").
  // The naive form is a range join (e.ts BETWEEN vfrom AND vto) — a
  // pair blow-up Spark plans as BroadcastNestedLoop when stats are
  // wrong; the scale-safe form is q08's union trick: union version-start
  // rows with event rows, one hash shuffle on the entity key, and LOCF
  // the version attribute over the (ts, kind) order — version rows sort
  // BEFORE events at the same instant, so an event at exactly vfrom gets
  // the new version (the oracle's `<=`). One shuffle, per-key frames, no
  // interval predicate anywhere. The version table derives
  // deterministically from the user universe (bronze at epoch, silver
  // from Jan 11 for user%3=0, gold from Jan 21 for user%2=0) — a
  // stand-in for the q80-built changelog, constructed identically in the
  // oracle.
  private def q119(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .withColumn("vm", floor(col("value") * 1000).cast("long"))
    val u = e.select("user_id").distinct()
    def version(cond: org.apache.spark.sql.Column, from: String, tier: String) =
      u.filter(cond).select(col("user_id"),
        to_timestamp(lit(from)).as("ts"), lit(tier).as("tier"))
    val versions = version(lit(true), "2024-01-01 00:00:00", "bronze")
      .unionAll(version(col("user_id") % 3 === 0, "2024-01-11 00:00:00", "silver"))
      .unionAll(version(col("user_id") % 2 === 0, "2024-01-21 00:00:00", "gold"))
    val mixed = versions
      .select(col("user_id"), col("ts"), lit(0).as("kind"), col("tier"),
        lit(null).cast("string").as("event_type"), lit(null).cast("long").as("vm"))
      .unionByName(e.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("string").as("tier"), col("event_type"), col("vm")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .withColumn("cur_tier", last(col("tier"), ignoreNulls = true).over(w))
      // cur_tier IS NOT NULL = the oracle's inner-join-on-vfrom<=ts
      // semantics: an event timestamped BEFORE the entity's first version
      // has no point-in-time match and is dropped, not reported as a NULL
      // tier group. Without this filter the LOCF form only agreed with
      // the oracle because the fixture's ts domain starts after the
      // 2024-01-01 bronze epoch (r7 ADVICE) — now parity holds for any
      // ts domain.
      .filter(col("kind") === 1 && col("cur_tier").isNotNull)
      .groupBy(col("event_type"), col("cur_tier").as("tier"))
      .agg(count(lit(1)).as("n"), sum("vm").as("value_milli"))
      .orderBy("event_type", "tier")
  }

  private val q119Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (
      | SELECT user_id, TIMESTAMP '2024-01-01 00:00:00' AS vfrom, 'bronze' AS tier FROM u
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-11 00:00:00', 'silver'
      |   FROM u WHERE user_id % 3 = 0
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-21 00:00:00', 'gold'
      |   FROM u WHERE user_id % 2 = 0),
      |sel AS (SELECT e.event_id, e.event_type, e.user_id,
      |  CAST(floor(e.value * 1000) AS BIGINT) AS vm, max(v.vfrom) AS vfrom
      | FROM events e JOIN v ON v.user_id = e.user_id AND v.vfrom <= e.ts
      | GROUP BY 1, 2, 3, 4)
      |SELECT s.event_type, v.tier, count(*) AS n,
      | CAST(sum(s.vm) AS BIGINT) AS value_milli
      |FROM sel s JOIN v ON v.user_id = s.user_id AND v.vfrom = s.vfrom
      |GROUP BY 1, 2 ORDER BY event_type, tier""".stripMargin

  // q238: BUCKETED INTERVAL-OVERLAP JOIN — the two-relation member of
  // the interval family (q215 unions ONE relation's intervals; q07's
  // band join is a value-distance theta join; this joins two interval
  // SETS on overlap: s.start < i.end AND i.start < s.end — incident
  // blast-radius, reservation conflicts, ad-delivery attribution).
  // Fixture: user activity spans [ts, ts+10min) from view/click events
  // × incident windows [ts, ts+30min) from error events; per day:
  // incidents, overlapping spans, exact overlap seconds, worst incident.
  // SCALE MECHANISM (the point of the row): a raw interval theta join
  // is O(n·m) and unshardable; the standard escape is the GRID join —
  // every interval explodes to the fixed 30-min time buckets it covers
  // (≤ 2 each here; bounded by ⌈len/bucket⌉ + 1 in general), candidates
  // meet through a plain EQUI-join on the bucket (hash-shuffleable,
  // AQE-skew-splittable), the exact predicate filters inside the
  // bucket, and a distinct at (incident-time, span-time) grain removes
  // the double-count when a pair co-occupies two buckets. The oracle
  // runs the naive theta join directly — the hash match proves the grid
  // decomposition loses and invents nothing. All-integer (µs epochs,
  // least/greatest overlap arithmetic).
  //
  // SECOND SCALE LAYER (r16, found by the sf10 smoke): both interval
  // lengths are fixed, so an interval is a pure function of its start
  // timestamp — identical timestamps produce IDENTICAL intervals, and
  // the whole query's output is day-grain aggregates. The pair frame
  // therefore collapses to DISTINCT-TIMESTAMP grain with multiplicities
  // (the q280 value-grain discipline applied to a join): spans carry
  // m_s = #events at that start, incidents m_i, every per-incident
  // aggregate is m_s-weighted and every day aggregate m_i-weighted —
  // algebraically identical output (same-timestamp incidents have
  // identical overlap sets; the oracle hash proves it at every SF). On
  // a hot-timestamp corpus this is the difference between a pair frame
  // quadratic in per-bucket density and one quadratic only in DISTINCT
  // timestamps per bucket: the time-densified sf10 replica (100 copies
  // of every timestamp) spilled >78 G of shuffle in the row-grain form
  // and runs in seconds in this form — on organic data the collapse
  // costs one partial-agg and changes nothing else.
  private def q238(s: SparkSession, d: String): DataFrame = {
    val B = 1800000000L // 30-min grid
    val ev = events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("us"))
    val spans = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("us").as("ss")).agg(count(lit(1)).as("ms"))
      .withColumn("se", col("ss") + 600000000L)
      .withColumn("bkt", explode(expr(s"sequence(ss div $B, (se - 1) div $B)")))
    val inc = ev.filter(col("event_type") === "error")
      .groupBy(col("us").as("is_")).agg(count(lit(1)).as("mi"))
      .withColumn("ie", col("is_") + 1800000000L)
      .withColumn("bkt", explode(expr(s"sequence(is_ div $B, (ie - 1) div $B)")))
    val pairs = spans.join(inc, Seq("bkt"))
      .filter(col("ss") < col("ie") && col("is_") < col("se"))
      .select(col("is_"), col("mi"), col("ss"), col("ms"),
        (least(col("se"), col("ie")) - greatest(col("ss"), col("is_")))
          .as("ov_us"))
      .distinct() // a pair co-occupying two grid cells counts once
    pairs.groupBy("is_", "mi")
      .agg(sum("ms").as("n_spans"), sum(expr("ms * ov_us")).as("ov_us"))
      .groupBy(expr("CAST(to_date(timestamp_micros(is_)) AS STRING)").as("day"))
      .agg(sum("mi").as("n_incidents"),
        sum(expr("mi * n_spans")).as("spans_total"),
        sum(expr("mi * (ov_us div 1000000)")).as("overlap_seconds"),
        max("n_spans").as("max_spans_per_incident"))
      .orderBy("day")
  }

  private val q238Sql =
    """WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
      |sp AS (SELECT event_id AS span_id, us AS ss, us + 600000000 AS se
      |  FROM ev WHERE event_type IN ('view', 'click')),
      |inc AS (SELECT event_id AS inc_id, us AS i_s, us + 1800000000 AS ie
      |  FROM ev WHERE event_type = 'error'),
      |pairs AS (SELECT inc_id, span_id, i_s,
      |   least(se, ie) - greatest(ss, i_s) AS ov_us
      |  FROM sp JOIN inc ON ss < ie AND i_s < se),
      |per_inc AS (SELECT inc_id, i_s, count(*) AS n_spans,
      |   CAST(sum(ov_us) AS BIGINT) AS ov_us
      |  FROM pairs GROUP BY 1, 2)
      |SELECT CAST(CAST(make_timestamp(i_s) AS DATE) AS VARCHAR) AS day,
      | count(*) AS n_incidents, CAST(sum(n_spans) AS BIGINT) AS spans_total,
      | CAST(sum(ov_us // 1000000) AS BIGINT) AS overlap_seconds,
      | CAST(max(n_spans) AS BIGINT) AS max_spans_per_incident
      |FROM per_inc GROUP BY 1 ORDER BY day""".stripMargin

  // q242: PER-GROUP TOP-K VIA THE CUSTOM PHYSICAL OPERATOR — the
  // whole-operator extension path exercised end to end (logical
  // `GroupTopKNode` → `GroupTopKStrategy` → two `GroupTopKExec` passes,
  // `graft/plans/GroupTopK.scala`): top-2 orders per customer by price.
  // The declarative form (q14/q16's window + rn ≤ k) SORTS every
  // customer's orders; the operator keeps a bounded heap per group,
  // prunes map-side BEFORE the exchange (topk∘topk = topk), and ships
  // at most partitions·groups·k rows through the shuffle. The oracle IS
  // the window form, so the hash match proves partial∘final pruning ≡
  // windowed top-k row for row (the ordering is total — price desc,
  // orderkey asc — which is what makes the kept set unique). PlanSpec
  // pins the physical shape: two GroupTopKExec nodes, one exchange
  // between them, no Sort below the presentation orderBy.
  private def q242(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    graft.plans.GroupTopK(o, Seq(col("o_custkey")),
        Seq(col("cents").desc, col("o_orderkey").asc), 2)
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q242Sql =
    """SELECT o_custkey, o_orderkey, cents FROM (
      | SELECT o_custkey, o_orderkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn
      | FROM orders)
      |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin

  // q252: TEMPORAL-ALIGN JOIN (SCD2 × SCD2) — the missing third member
  // of the versioned-dimension family: q80 BUILDS one dim's validity
  // intervals, q119 PROBES one dim with point events; this joins TWO
  // version tables into the piecewise segments where both are valid
  // ("which (tier, plan) combination was each user on, and for how
  // long" — the effective-dating join every bitemporal warehouse runs).
  // The scale shape is the reason it is NOT a q238 grid problem: both
  // sides carry the ENTITY KEY, so the align is a plain equi-join on
  // user_id (hash-shuffleable, co-partitionable with both dims) whose
  // per-key fan-out is bounded by the per-entity version counts — the
  // overlap predicate max(f1,f2) < min(t1,t2) filters INSIDE the key
  // group, intersected bounds compute the segment. Versions derive
  // deterministically from the user universe (q119's tier scheme + a
  // second plan scheme with DIFFERENT change dates, so segments break on
  // both dims' boundaries), vto = lead(vfrom) capped at the Feb-1
  // horizon; all-integer epoch-second arithmetic in the report.
  private def q252(s: SparkSession, d: String): DataFrame = {
    val horizon = "2024-02-01 00:00:00"
    val u = events(s, d).select("user_id").distinct()
    def dim(rows: Seq[(org.apache.spark.sql.Column, String, String)], attr: String) = {
      val v = rows.map { case (cond, from, value) =>
        u.filter(cond).select(col("user_id"),
          unix_timestamp(to_timestamp(lit(from))).as("vf"), lit(value).as(attr))
      }.reduce(_ unionAll _)
      v.withColumn("vt", coalesce(
        lead(col("vf"), 1).over(Window.partitionBy("user_id").orderBy("vf")),
        unix_timestamp(to_timestamp(lit(horizon)))))
    }
    val tiers = dim(Seq(
      (lit(true), "2024-01-01 00:00:00", "bronze"),
      (col("user_id") % 3 === 0, "2024-01-11 00:00:00", "silver"),
      (col("user_id") % 2 === 0, "2024-01-21 00:00:00", "gold")), "tier")
    val plans = dim(Seq(
      (lit(true), "2024-01-01 00:00:00", "free"),
      (col("user_id") % 5 < 2, "2024-01-08 00:00:00", "trial"),
      (col("user_id") % 4 === 0, "2024-01-16 00:00:00", "paid")), "plan")
    tiers.alias("a").join(plans.alias("b"), Seq("user_id"))
      .filter(greatest(col("a.vf"), col("b.vf")) < least(col("a.vt"), col("b.vt")))
      .select(col("user_id"), col("tier"), col("plan"),
        (least(col("a.vt"), col("b.vt")) - greatest(col("a.vf"), col("b.vf")))
          .as("dur_s"))
      .groupBy("tier", "plan")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_segments"),
        sum("dur_s").as("total_seconds"), max("dur_s").as("max_segment_seconds"))
      .orderBy("tier", "plan")
  }

  private val q252Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |tv AS (
      | SELECT user_id, TIMESTAMP '2024-01-01 00:00:00' AS vfrom, 'bronze' AS tier FROM u
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-11 00:00:00', 'silver'
      |   FROM u WHERE user_id % 3 = 0
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-21 00:00:00', 'gold'
      |   FROM u WHERE user_id % 2 = 0),
      |pv AS (
      | SELECT user_id, TIMESTAMP '2024-01-01 00:00:00' AS vfrom, 'free' AS plan FROM u
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-08 00:00:00', 'trial'
      |   FROM u WHERE user_id % 5 < 2
      | UNION ALL SELECT user_id, TIMESTAMP '2024-01-16 00:00:00', 'paid'
      |   FROM u WHERE user_id % 4 = 0),
      |t2 AS (SELECT user_id, tier, epoch(vfrom)::BIGINT AS vf,
      |   epoch(COALESCE(lead(vfrom) OVER (PARTITION BY user_id ORDER BY vfrom),
      |     TIMESTAMP '2024-02-01 00:00:00'))::BIGINT AS vt FROM tv),
      |p2 AS (SELECT user_id, plan, epoch(vfrom)::BIGINT AS vf,
      |   epoch(COALESCE(lead(vfrom) OVER (PARTITION BY user_id ORDER BY vfrom),
      |     TIMESTAMP '2024-02-01 00:00:00'))::BIGINT AS vt FROM pv),
      |seg AS (SELECT a.user_id, tier, plan,
      |   least(a.vt, b.vt) - greatest(a.vf, b.vf) AS dur_s
      |  FROM t2 a JOIN p2 b ON a.user_id = b.user_id
      |  WHERE greatest(a.vf, b.vf) < least(a.vt, b.vt))
      |SELECT tier, plan, count(DISTINCT user_id) AS n_users,
      | count(*) AS n_segments, CAST(sum(dur_s) AS BIGINT) AS total_seconds,
      | CAST(max(dur_s) AS BIGINT) AS max_segment_seconds
      |FROM seg GROUP BY 1, 2 ORDER BY tier, plan""".stripMargin

  // q331: FULFILLMENT-LATENCY SLA AUDIT — the order-lifecycle readout
  // the relational core was missing: per order priority, the ship-delay
  // distribution (days between o_orderdate and l_shipdate) summarized
  // as exact p50/p90 plus a declared 90-day SLA breach rate. The
  // percentile trick is the value-grain cumulative (q316/q291 family):
  // ship delays live on a BOUNDED day domain (TPC-H ships within ~122
  // days; any real fulfillment domain is similarly bounded), so exact
  // order statistics come from one cumulative window over the
  // (priority, delay) grid — never a percentile over item-grain rows.
  // p50 = first delay whose cumulative count reaches ⌈n/2⌉ (cum·2 ≥ n),
  // p90 at cum·10 ≥ 9n — integer cross-multiplied, no interpolation
  // (declared: lower order statistic). 100 TB shape: the lineitem ⋈
  // orders join is co-partitioned on the order key; ONE (priority,
  // delay) partial-agg shuffle; everything after is grid-local.
  private def q331(s: SparkSession, d: String): DataFrame = {
    val delays = lineitem(s, d).select("l_orderkey", "l_shipdate")
      .join(orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay", datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy(col("o_orderpriority"), col("delay"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("o_orderpriority").orderBy("delay")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("o_orderpriority")
    delays
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(wt))
      .groupBy("o_orderpriority")
      .agg(max("n").as("n_items"),
        min(when(expr("cum * 2 >= n"), col("delay"))).as("p50_days"),
        min(when(expr("cum * 10 >= 9 * n"), col("delay"))).as("p90_days"),
        sum(when(col("delay") > 90, col("c")).otherwise(0L)).as("n_breach"))
      .select(col("o_orderpriority"), col("n_items"),
        expr("CAST(p50_days AS BIGINT)").as("p50_days"),
        expr("CAST(p90_days AS BIGINT)").as("p90_days"),
        expr("n_breach * 1000 div n_items").as("breach_permille"))
      .orderBy("o_orderpriority")
  }

  private val q331Sql =
    """WITH dl AS (SELECT o_orderpriority,
      |   date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |     AS delay, count(*) AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |cm AS (SELECT *,
      |   sum(c) OVER (PARTITION BY o_orderpriority ORDER BY delay
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   sum(c) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM dl)
      |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_items,
      | CAST(min(CASE WHEN cum * 2 >= n THEN delay END) AS BIGINT) AS p50_days,
      | CAST(min(CASE WHEN cum * 10 >= 9 * n THEN delay END) AS BIGINT) AS p90_days,
      | CAST(sum(CASE WHEN delay > 90 THEN c ELSE 0 END) * 1000 // max(n)
      |   AS BIGINT) AS breach_permille
      |FROM cm GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q331_sla_latency" -> (q331 _),
    "q252_temporal_align" -> (q252 _),
    "q242_group_topk_exec" -> (q242 _),
    "q238_interval_overlap_join" -> (q238 _),
    "q119_pit_lookup" -> (q119 _),
    "q68_string_funcs2" -> (q68 _),
    "q66_sql_lateral" -> (q66 _),
    "q67_correlated_agg" -> (q67 _),
    "q33_map_funcs" -> (q33 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_predicates" -> (q02 _),
    "q03_join_topn_revenue" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q05_anti_join" -> (q05 _),
    "q06_outer_join_agg" -> (q06 _),
    "q07_band_join" -> (q07 _),
    "q08_asof_join" -> (q08 _),
    "q210_interp_join" -> (q210 _),
    "q09_cross_join" -> (q09 _),
    "q10_distinct_agg" -> (q10 _),
    "q11_rollup" -> (q11 _),
    "q69_grouping_sets" -> (q69 _),
    "q70_nested_in_correlated" -> (q70 _),
    "q71_correlated_min_equality" -> (q71 _),
    "q12_cube" -> (q12 _),
    "q13_percentiles" -> (q13 _),
    "q14_window_rank" -> (q14 _),
    "q15_window_frames" -> (q15 _),
    "q16_topk_per_group" -> (q16 _),
    "q17_set_ops" -> (q17 _),
    "q18_dedup_exact" -> (q18 _),
    "q19_string_funcs" -> (q19 _),
    "q20_datetime_funcs" -> (q20 _),
    "q21_math_funcs" -> (q21 _),
    "q22_array_funcs" -> (q22 _),
    "q23_json_funcs" -> (q23 _),
    "q24_global_topk" -> (q24 _),
    "q25_scalar_subquery" -> (q25 _))

  override val oracles: Map[String, String] = Map(
    "q331_sla_latency" -> q331Sql,
    "q252_temporal_align" -> q252Sql,
    "q242_group_topk_exec" -> q242Sql,
    "q238_interval_overlap_join" -> q238Sql,
    "q119_pit_lookup" -> q119Sql,
    "q68_string_funcs2" -> q68Sql,
    "q66_sql_lateral" -> q66Sql,
    "q67_correlated_agg" -> q67Sql,
    "q33_map_funcs" -> q33Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_predicates" -> q02Sql,
    "q03_join_topn_revenue" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_outer_join_agg" -> q06Sql,
    "q07_band_join" -> q07Sql,
    "q08_asof_join" -> q08Sql,
    "q210_interp_join" -> q210Sql,
    "q09_cross_join" -> q09Sql,
    "q10_distinct_agg" -> q10Sql,
    "q11_rollup" -> q11Sql,
    "q69_grouping_sets" -> q69Sql,
    "q70_nested_in_correlated" -> q70Sql,
    "q71_correlated_min_equality" -> q71Sql,
    "q12_cube" -> q12Sql,
    "q13_percentiles" -> q13Sql,
    "q14_window_rank" -> q14Sql,
    "q15_window_frames" -> q15Sql,
    "q16_topk_per_group" -> q16Sql,
    "q17_set_ops" -> q17Sql,
    "q18_dedup_exact" -> q18Sql,
    "q19_string_funcs" -> q19Sql,
    "q20_datetime_funcs" -> q20Sql,
    "q21_math_funcs" -> q21Sql,
    "q22_array_funcs" -> q22Sql,
    "q23_json_funcs" -> q23Sql,
    "q24_global_topk" -> q24Sql,
    "q25_scalar_subquery" -> q25Sql)
}
