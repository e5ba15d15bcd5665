package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.operators.{ExperimentOps, SeriesOps}

/** Textbook-pinned fixtures for the statistical gates (r14 ADVICE item 3).
  *
  * The brute-force mirror specs re-derive expected values with the SAME
  * integer staging as the implementation, so a shared-formula error (the
  * q340 750-vs-3000 factor, the q338 extra n-divisor — both found by the
  * r14 advisor, both invisible to the DuckDB oracle because the SQL twin
  * mirrors the bug) passes the suite AND the oracle sweep. This suite
  * breaks that loop: each fixture is a tiny hand-built events table whose
  * statistic has a KNOWN closed-form / scipy-verified value, asserted as
  * a literal — no staging shared with the implementation.
  *
  *  - q340 on A={1..3}, B={4..6}: scipy.stats.kruskal -> H = 3.8571429,
  *    so h_milli = 3857 exactly under the documented truncating staging
  *    (3000*348 div 42 - 21000), no ties -> corr_milli = 1000, df=1
  *    crit 3.841 -> reject = 1.
  *  - q338 on daily counts [1×5, 3×5]: n=10, n1=n2=5, R=2 runs;
  *    E[R] = 6, Var[R] = 2·25·40/(100·9) = 20/9, z = (2-6)/√(20/9)
  *    -> z² = 7.2 exactly (Wald–Wolfowitz 1940 closed form), so
  *    z2_milli = 7200, clustered sign -1, reject = 1.
  */
class PinnedStatSpec extends SparkSpec {

  /** Write a tiny events fixture (driver schema: event_id, ts, user_id,
    * event_type, value, props) and return its table dir. */
  private def eventsFixture(rows: Seq[(Long, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("graft-pinned").toString
    val s = spark
    import s.implicits._
    val df: DataFrame = rows.toDF("event_id", "day", "event_type", "value")
      .selectExpr(
        "event_id",
        "timestamp_micros(day * 86400000000 + event_id) AS ts",
        "event_id AS user_id", "event_type", "value", "'{}' AS props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q340 pinned: kruskal({1,2,3},{4,5,6}) H=3.857, rejects at df=1") {
    val rows = Seq(1, 2, 3).map(v => (v.toLong, 0L, "a", v / 100.0)) ++
      Seq(4, 5, 6).map(v => (v.toLong, 0L, "b", v / 100.0))
    val g = ExperimentOps.queries("q340_kruskal_wallis")(spark, eventsFixture(rows))
      .collect()
    assert(g.length === 1)
    val r = g.head
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("h_milli") === 3857L)      // scipy: 3.8571429
    assert(r.getAs[Long]("corr_milli") === 1000L)   // no ties
    assert(r.getAs[Long]("h_adj_milli") === 3857L)
    assert(r.getAs[Long]("crit_milli") === 3841L)   // chi2(1, .95)
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q340 pinned: identical groups give H<=0, no rejection") {
    // both groups share {1,2,3}: every rank sum is tied-midrank equal, so
    // the true H = 0; truncating staging may land epsilon below
    val rows = Seq(1, 2, 3).map(v => (v.toLong, 0L, "a", v / 100.0)) ++
      Seq(1, 2, 3).map(v => (v.toLong + 3, 0L, "b", v / 100.0))
    val r = ExperimentOps.queries("q340_kruskal_wallis")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("h_milli") <= 0L)
    assert(r.getAs[Long]("reject") === 0L)
  }

  test("q338 pinned: 10-day two-block series has R=2, z²=7.2, clustered") {
    // five days of 1 event, five days of 3 events -> marks FFFFFTTTTT
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day < 5) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val g = SeriesOps.queries("q338_runs_test")(spark, eventsFixture(rows))
      .collect()
    assert(g.length === 1)
    val r = g.head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("median_y") === 1L)  // lower median of {1×5,3×5}
    assert(r.getAs[Long]("n_above") === 5L)
    assert(r.getAs[Long]("runs") === 2L)
    assert(r.getAs[Long]("gap_sign") === -1L) // too few runs = clustered
    assert(r.getAs[Long]("z2_milli") === 7200L) // closed form z² = 7.2
    assert(r.getAs[Long]("reject") === 1L)
  }

  test("q338 pinned: perfectly alternating series rejects with positive sign") {
    // counts 1,3,1,3,... -> 10 runs of length 1; z = (10-6)/√(20/9),
    // z² = 16·9/20 = 7.2 -> alternating rejection, sign +1
    var id = 0L
    val rows = (0 until 10).flatMap { day =>
      val y = if (day % 2 == 0) 1 else 3
      (0 until y).map { _ => id += 1; (id, day.toLong, "a", 1.0) }
    }
    val r = SeriesOps.queries("q338_runs_test")(spark, eventsFixture(rows))
      .collect().head
    assert(r.getAs[Long]("runs") === 10L)
    assert(r.getAs[Long]("gap_sign") === 1L)
    assert(r.getAs[Long]("z2_milli") === 7200L)
    assert(r.getAs[Long]("reject") === 1L)
  }
}
