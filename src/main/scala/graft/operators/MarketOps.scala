package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Market/merchandising analytics over the TPC-H-ish star schema
  * (SURVEY.md §2B B281–B283): directed association rules (q320),
  * item–item neighborhood similarity for recommendation (q321), and
  * ABC/Pareto inventory classification (q322).
  *
  * Family placement: q185 mines SYMMETRIC frequent part-pairs by lift
  * (the Agrawal–Srikant candidate step); q320 turns co-occurrence into
  * DIRECTED rules with confidence — the actionable "put B next to A"
  * readout — at the brand grain where the item domain is bounded;
  * q321 moves from the basket grain to the CUSTOMER grain (who bought
  * both, across all their orders — neighborhood collaborative
  * filtering); q322 ranks the catalog by revenue and cuts the classic
  * 80/95 Pareto classes.
  *
  * Scale posture (100 TB): the item axis here is `p_brand` (a bounded
  * categorical domain, ≤ 25 values at any SF) so every pair grid is
  * ≤ |brands|² cells and every basket/customer emits ≤ |brands| rows —
  * the general-item form of q320/q321 is exactly q185's capped
  * machinery (Guards.capBuckets + apriori prune) and is deliberately
  * not duplicated here. q322's global cumulative-share rank never runs
  * a global window: it is the two-phase (bucketed) prefix-sum, the
  * q187/q315 denseOrdinal discipline extended from counts to sums.
  */
object MarketOps extends QueryPack {
  import Tables._

  // q320: ASSOCIATION RULES (confidence + lift, directed) — market
  // basket's decision-grade output: q185 reports that {A,B} co-occurs;
  // a merchandiser acts on A→B ("of the baskets with A, how many have
  // B" = confidence), which is asymmetric — conf(A→B) ≠ conf(B→A) when
  // supports differ. Baskets are orders, items are part brands (the
  // bounded categorical axis); both directions come from one self-join
  // with a ≠ predicate. Exact integers: confidence_permille =
  // n_both·1000 div n_ante, lift_milli = n_both·N·1000 div
  // (n_ante·n_cons), support floor 3 declared. 100 TB: the
  // (order, brand) distinct frame shuffles once on the order key;
  // baskets are ≤ |brands| wide by construction so the self-join emits
  // ≤ |brands|² rows per basket worst-case and partial-aggregates onto
  // the ≤ 25×24 rule grid; part is a broadcast dim.
  private def q320(s: SparkSession, d: String): DataFrame = {
    val bb = lineitem(s, d).select("l_orderkey", "l_partkey")
      .join(broadcast(part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    graft.Caches.persist(bb)
    val n = bb.agg(countDistinct("l_orderkey").as("n_orders"))
    val singles = bb.groupBy("p_brand").agg(count(lit(1)).as("n1"))
    val pairs = bb.alias("x").join(bb.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.p_brand") =!= col("y.p_brand"))
      .groupBy(col("x.p_brand").as("antecedent"), col("y.p_brand").as("consequent"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3)
    pairs
      .join(broadcast(singles.withColumnRenamed("p_brand", "antecedent")
        .withColumnRenamed("n1", "n_ante")), Seq("antecedent"))
      .join(broadcast(singles.withColumnRenamed("p_brand", "consequent")
        .withColumnRenamed("n1", "n_cons")), Seq("consequent"))
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"), col("n_cons"),
        expr("support * 1000 div n_ante").as("confidence_permille"),
        expr("CAST(CAST(support AS DECIMAL(38,0)) * n_orders * 1000" +
          " div (CAST(n_ante AS DECIMAL(38,0)) * n_cons) AS BIGINT)").as("lift_milli"))
      .orderBy(col("confidence_permille").desc, col("antecedent"), col("consequent"))
      .limit(30)
  }

  private val q320Sql =
    """WITH bb AS (SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM bb),
      |s AS (SELECT p_brand, count(*) AS n1 FROM bb GROUP BY 1),
      |p AS (SELECT x.p_brand AS antecedent, y.p_brand AS consequent,
      |   count(*) AS support
      |  FROM bb x JOIN bb y ON x.l_orderkey = y.l_orderkey
      |    AND x.p_brand <> y.p_brand
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT antecedent, consequent, support,
      | CAST(sa.n1 AS BIGINT) AS n_ante, CAST(sc.n1 AS BIGINT) AS n_cons,
      | CAST(support * 1000 // sa.n1 AS BIGINT) AS confidence_permille,
      | CAST(CAST(support AS HUGEINT) * n_orders * 1000
      |   // (CAST(sa.n1 AS HUGEINT) * sc.n1) AS BIGINT) AS lift_milli
      |FROM p JOIN s sa ON antecedent = sa.p_brand
      | JOIN s sc ON consequent = sc.p_brand CROSS JOIN n
      |ORDER BY confidence_permille DESC, antecedent, consequent
      |LIMIT 30""".stripMargin

  // q321: ITEM–ITEM NEIGHBORHOOD SIMILARITY (collaborative filtering) —
  // the "customers who bought X also bought Y" primitive (Sarwar et al.
  // 2001, the serving-side workhorse before learned embeddings; q72's
  // embedding-cosine is the learned sibling). Grain deliberately
  // differs from q320: the co-occurrence unit is the CUSTOMER's whole
  // purchase history, not one basket — a brand pair can be similar
  // because customers return for both months apart. Exact integers:
  // cosine²_milli = n_ij²·1000 div (n_i·n_j) (squared cosine keeps the
  // ratio rational — the q302 sign-free trick; cosine is nonneg here),
  // jaccard_permille = n_ij·1000 div (n_i + n_j − n_ij). 100 TB: one
  // (customer, brand) distinct collapse (fact–fact join on the order
  // key is co-partitioned), per-customer item lists bounded by the
  // brand domain, pair counts partial-agg onto the ≤ 25×24/2 grid.
  private def q321(s: SparkSession, d: String): DataFrame = {
    val ub = lineitem(s, d).select("l_orderkey", "l_partkey")
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey"), col("p_brand")).distinct()
    graft.Caches.persist(ub)
    val singles = ub.groupBy("p_brand").agg(count(lit(1)).as("n1"))
    ub.alias("x").join(ub.alias("y"),
        col("x.o_custkey") === col("y.o_custkey") &&
          col("x.p_brand") < col("y.p_brand"))
      .groupBy(col("x.p_brand").as("brand_a"), col("y.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(singles.withColumnRenamed("p_brand", "brand_a")
        .withColumnRenamed("n1", "n_a")), Seq("brand_a"))
      .join(broadcast(singles.withColumnRenamed("p_brand", "brand_b")
        .withColumnRenamed("n1", "n_b")), Seq("brand_b"))
      .select(col("brand_a"), col("brand_b"), col("n_both"),
        col("n_a"), col("n_b"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * n_both * 1000" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("cos2_milli"),
        expr("n_both * 1000 div (n_a + n_b - n_both)").as("jaccard_permille"))
      .orderBy(col("cos2_milli").desc, col("brand_a"), col("brand_b"))
      .limit(20)
  }

  private val q321Sql =
    """WITH ub AS (SELECT DISTINCT o_custkey, p_brand
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |   JOIN part ON l_partkey = p_partkey),
      |s AS (SELECT p_brand, count(*) AS n1 FROM ub GROUP BY 1),
      |p AS (SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
      |   count(*) AS n_both
      |  FROM ub x JOIN ub y ON x.o_custkey = y.o_custkey
      |    AND x.p_brand < y.p_brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_both,
      | CAST(sa.n1 AS BIGINT) AS n_a, CAST(sb.n1 AS BIGINT) AS n_b,
      | CAST(CAST(n_both AS HUGEINT) * n_both * 1000
      |   // (CAST(sa.n1 AS HUGEINT) * sb.n1) AS BIGINT) AS cos2_milli,
      | CAST(n_both * 1000 // (sa.n1 + sb.n1 - n_both) AS BIGINT) AS jaccard_permille
      |FROM p JOIN s sa ON brand_a = sa.p_brand
      | JOIN s sb ON brand_b = sb.p_brand
      |ORDER BY cos2_milli DESC, brand_a, brand_b
      |LIMIT 20""".stripMargin

  // q322: ABC (PARETO) INVENTORY CLASSIFICATION — the operations canon:
  // rank the catalog by revenue, cut at 80% / 95% cumulative share,
  // and manage the A parts tightly (they are few and carry the value —
  // q284's Gini/Lorenz measures the same concentration; this OPERATES
  // on it). The global cumulative-share rank is the two-phase prefix
  // sum, never a global window: phase 1 collapses parts to a bounded
  // grid of revenue GRANULES (cents div 2²⁰, descending via negated
  // bucket key) whose per-bucket sums prefix-sum on the grid; phase 2
  // is a within-bucket running sum under (cents DESC, partkey) plus the
  // broadcast bucket offset. Boundary rule declared: a part belongs to
  // A while its INCLUSIVE cumulative share is ≤ 800‰ (then B ≤ 950‰,
  // else C) — the straddling part falls to the next class, identically
  // in both engines via DECIMAL(38)/HUGEINT cross-multiplication.
  private def q322(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy("l_partkey")
      .agg(sum(expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("cents"))
    val bkt = rev.withColumn("bkt", expr("-(cents div 1048576)"))
    val offs = bkt.groupBy("bkt")
      .agg(sum("cents").as("bs"), count(lit(1)).as("bn"))
      .withColumn("coff", coalesce(sum("bs").over(
        Window.partitionBy(pmod(crc32(col("bkt").cast("string")), lit(1L)))
          .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "coff")
    val tot = rev.agg(sum("cents").as("t_cents"), count(lit(1)).as("t_parts"))
    val wIn = Window.partitionBy("bkt")
      .orderBy(col("cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bkt.join(broadcast(offs), "bkt")
      .withColumn("run_cents", col("coff") + sum("cents").over(wIn))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class", expr(
        """CASE WHEN CAST(run_cents AS DECIMAL(38,0)) * 1000
          |       <= CAST(t_cents AS DECIMAL(38,0)) * 800 THEN 'A'
          |     WHEN CAST(run_cents AS DECIMAL(38,0)) * 1000
          |       <= CAST(t_cents AS DECIMAL(38,0)) * 950 THEN 'B'
          |     ELSE 'C' END""".stripMargin))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("revenue_cents"),
        max("t_cents").as("tc"), max("t_parts").as("tp"))
      .select(col("abc_class"), col("n_parts"),
        expr("n_parts * 1000 div tp").as("parts_permille"),
        col("revenue_cents"),
        expr("CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000" +
          " div tc AS BIGINT)").as("revenue_permille"))
      .orderBy("abc_class")
  }

  private val q322Sql =
    """WITH rev AS (SELECT l_partkey,
      |   sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
      |     AS cents
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT sum(cents) AS t_cents, count(*) AS t_parts FROM rev),
      |r AS (SELECT l_partkey, cents,
      |   sum(cents) OVER (ORDER BY cents DESC, l_partkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents
      |  FROM rev),
      |c AS (SELECT cents,
      |   CASE WHEN CAST(run_cents AS HUGEINT) * 1000
      |          <= CAST(t_cents AS HUGEINT) * 800 THEN 'A'
      |        WHEN CAST(run_cents AS HUGEINT) * 1000
      |          <= CAST(t_cents AS HUGEINT) * 950 THEN 'B'
      |        ELSE 'C' END AS abc_class,
      |   t_cents, t_parts
      |  FROM r CROSS JOIN t)
      |SELECT abc_class, count(*) AS n_parts,
      | CAST(count(*) * 1000 // max(t_parts) AS BIGINT) AS parts_permille,
      | CAST(sum(cents) AS BIGINT) AS revenue_cents,
      | CAST(CAST(sum(cents) AS HUGEINT) * 1000 // max(t_cents) AS BIGINT)
      |   AS revenue_permille
      |FROM c GROUP BY abc_class ORDER BY abc_class""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q320_association_rules" -> (q320 _),
    "q321_item_similarity" -> (q321 _),
    "q322_abc_classes" -> (q322 _))

  override val oracles: Map[String, String] = Map(
    "q320_association_rules" -> q320Sql,
    "q321_item_similarity" -> q321Sql,
    "q322_abc_classes" -> q322Sql)
}
