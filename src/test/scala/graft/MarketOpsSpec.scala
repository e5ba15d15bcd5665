package graft

import graft.operators.MarketOps

/** Semantic claims of the round-15 market-analytics operators (output
  * equality vs DuckDB is the oracle gate's job):
  *
  *  - q320's directed rules are re-derived by brute force from the raw
  *    (order, brand) baskets — support, confidence, and lift of every
  *    reported rule match exactly, and the report IS the brute top-30
  *    under (confidence DESC, antecedent, consequent);
  *  - q321's cos² is bounded by 1000 (Cauchy–Schwarz on sets), jaccard
  *    by 1000, and both are re-derived from brute customer×brand sets;
  *  - q322 conserves revenue across classes, classes partition the
  *    catalog, and the class cut points match a brute descending sort.
  */
class MarketOpsSpec extends SparkSpec {

  test("q320: brute rules match; report is the exact top-30") {
    val bb = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .join(Tables.part(spark, sf).select("p_partkey", "p_brand"),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .select("l_orderkey", "p_brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byOrder = bb.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val n1 = bb.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val both = scala.collection.mutable.Map.empty[(String, String), Long]
    byOrder.values.foreach { brands =>
      for (a <- brands; b <- brands if a != b)
        both((a, b)) = both.getOrElse((a, b), 0L) + 1L
    }
    val rules = both.toSeq.filter(_._2 >= 3L).map { case ((a, b), s) =>
      val conf = s * 1000L / n1(a)
      val lift = (BigInt(s) * nOrders * 1000 / (BigInt(n1(a)) * n1(b))).toLong
      (a, b, s, n1(a), n1(b), conf, lift)
    }.sortBy(t => (-t._6, t._1, t._2)).take(30)
    val got = MarketOps.queries("q320_association_rules")(spark, sf).collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent"),
        r.getAs[Long]("support"), r.getAs[Long]("n_ante"), r.getAs[Long]("n_cons"),
        r.getAs[Long]("confidence_permille"), r.getAs[Long]("lift_milli")))
    assert(got.toSeq === rules)
  }

  test("q321: cos2/jaccard bounded and re-derived from brute customer sets") {
    val got = MarketOps.queries("q321_item_similarity")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nb, na, n2) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("cos2_milli") ===
        (BigInt(nb) * nb * 1000 / (BigInt(na) * n2)).toLong)
      assert(r.getAs[Long]("cos2_milli") <= 1000L, "Cauchy-Schwarz broken")
      assert(r.getAs[Long]("jaccard_permille") === nb * 1000L / (na + n2 - nb))
      assert(r.getAs[Long]("jaccard_permille") <= 1000L)
      assert(nb <= math.min(na, n2))
    }
  }

  test("q322: classes partition the catalog and match a brute Pareto cut") {
    val rev = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    val total = rev.values.sum
    val sorted = rev.toSeq.sortBy { case (k, c) => (-c, k) }
    var run = 0L
    val cls = sorted.map { case (_, c) =>
      run += c
      if (BigInt(run) * 1000 <= BigInt(total) * 800) "A"
      else if (BigInt(run) * 1000 <= BigInt(total) * 950) "B" else "C"
    }
    val expByClass = cls.zip(sorted.map(_._2)).groupBy(_._1)
      .view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val got = MarketOps.queries("q322_abc_classes")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("revenue_cents")).sum === total)
    assert(got.map(_.getAs[Long]("n_parts")).sum === rev.size.toLong)
    got.foreach { r =>
      val (n, c) = expByClass(r.getAs[String]("abc_class"))
      assert(r.getAs[Long]("n_parts") === n)
      assert(r.getAs[Long]("revenue_cents") === c)
      assert(r.getAs[Long]("revenue_permille") ===
        (BigInt(c) * 1000 / total).toLong)
    }
  }
}
