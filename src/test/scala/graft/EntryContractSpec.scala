package graft

import org.apache.spark.sql.SparkSession

/** The driver contract itself: SparkEntry must expose every pack without
  * silent loss, every oracle must reference a declared query, and the
  * flagship entry must run on a bare session (the driver builds its own
  * with none of our configs — the entry path reads no parquet, so it
  * cannot trip the nanos-timestamp legacy flag). */
class EntryContractSpec extends SparkSpec {

  // the REAL pack list — a copy here would go stale the round a pack is
  // added and fail this suite for the wrong reason (it did, round 7)
  private val packs: Seq[QueryPack] = SparkEntry.packs

  test("no query name collides across packs (Map merge would silently drop one)") {
    val perPack = packs.map(_.queries.size).sum
    assert(SparkEntry.queries.size === perPack,
      "duplicate query names across packs")
  }

  test("every oracle references a declared query; names are q-prefixed and unique") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("entry() returns rows and needs no session-specific configuration") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The q219 failure class (r10): a query that fails ANALYSIS vanishes from
  // CORRECTNESS silently and only surfaces as a bench error. Analyzing every
  // plan is cheap (no execution) and names the broken query immediately.
  test("every declared query analyzes on sf0.001 (no AnalysisException at registration)") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, sf).queryExecution.analyzed; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"unanalyzable queries: ${broken.mkString("; ")}")
  }

  // Pin the exact no-oracle set: a forgotten oracle registration (q219's
  // second r10 bug) must fail by name, not pass as an implicit weaker check.
  // Since r16 task 6 the set is EMPTY: q123 (DEFLATE, no DuckDB function)
  // gained a fixture-backed oracle (fixtures/deflate_lens.parquet maps
  // md5(text) → CPython-zlib length; the oracle inner-joins on it), so
  // every declared query now has a DuckDB-checkable twin.
  test("every query has an oracle except the pinned DuckDB-inexpressible set") {
    val allowedNoOracle = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === allowedNoOracle,
      s"queries without oracle: ${missing.mkString(", ")} (allowed: ${allowedNoOracle.mkString(", ")})")
  }

  test("every oracle SQL is JSON-safe through Verify's escaper (no control chars survive)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r'),
        "unexpected control character in oracle SQL")
    }
  }
}
