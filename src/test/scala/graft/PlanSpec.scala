package graft

/** Plan-shape regression guard (SCALE.md): the physical plans that make
  * these operators viable at 100 TB are asserted, not assumed. Spark is
  * pinned at 4.1.2, so plan strings are stable. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filters reach the parquet scan and aggregation is two-phase") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "filter not pushed")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert(p.contains("ReadSchema: struct<l_quantity:double"), "columns not pruned")
  }

  test("q03: dimension joins broadcast; top-n plans as TakeOrderedAndProject") {
    val p = planOf("q03_join_topn_revenue")
    assert(p.contains("BroadcastHashJoin"), "dim join did not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort not fused to top-k")
  }

  test("q26: latest-state is partial max_by aggregation, not a window sort") {
    val p = planOf("q26_latest_state")
    assert(p.contains("partial_max_by"), "latest-state lost map-side pre-reduction")
    assert(!p.contains("Window"), "latest-state regressed to a window sort")
  }

  test("LSH candidate joins never degenerate to cartesian products") {
    for (q <- Seq("q43_minhash_lsh", "q45_simhash_neardup", "q47_ann_lsh", "q49_ann_ivf")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q46: the query side broadcasts; the base side is never shuffled before scoring") {
    val p = planOf("q46_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side not broadcast")
  }

  test("q24: global top-k avoids a full sort") {
    assert(planOf("q24_global_topk").contains("TakeOrderedAndProject"))
  }

  test("custom expressions appear in plans (not black-box UDF calls)") {
    assert(planOf("q44_simhash").contains("simhash32"))
    assert(planOf("q42_minhash_signatures").contains("minhash_sig"))
    assert(!planOf("q50_envelope_parse").toLowerCase.contains("batchevalpython"))
  }
}
