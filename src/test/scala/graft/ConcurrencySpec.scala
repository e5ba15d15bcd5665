package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Multi-session concurrency smoke (r13 verdict task 5): three threads,
  * each with its own `spark.newSession()`, run DISJOINT query slices
  * concurrently; every result must equal the serial run on the parent
  * session. The slices are chosen to hit exactly the shared mutable
  * surfaces a multi-tenant embedding reaches first:
  *
  *  - q70/q71 materialize temp views (`createOrReplaceTempView`) —
  *    session-scoped by Spark contract, so two sessions running both
  *    concurrently must not clobber each other's `v_supplier`;
  *  - q52 reaches the ContentOps envelope memo, a WeakHashMap keyed BY
  *    SESSION — each session must build (and cache) its own envelope;
  *  - q242 installs the GroupTopK strategy into the session's
  *    experimental methods — install must be idempotent per session and
  *    independent across sessions;
  *  - q73/q41 register persisted relations in the GLOBAL Caches
  *    registry, and every thread calls `Caches.release()` after each
  *    query exactly as Verify does — the documented contract is that a
  *    concurrent release costs the other thread its shared cache (it
  *    recomputes), never its correctness.
  *
  * Runs at sf0.001 — the point is interleaving, not volume.
  */
class ConcurrencySpec extends SparkSpec {

  private val slices: Seq[Seq[String]] = Seq(
    Seq("q70_nested_in_correlated", "q52_latest_state", "q03_join_topn_revenue"),
    Seq("q71_correlated_min_equality", "q242_group_topk_exec", "q14_window_rank"),
    Seq("q73_dedup_clusters", "q41_jaccard_pairs", "q01_pricing_summary"))

  /** Canonical comparable form: every row rendered and sorted. */
  private def run(s: org.apache.spark.sql.SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(s, sf).collect().map(_.toString).sorted.toSeq

  test("three sessions, disjoint slices, concurrent release: all results equal serial") {
    // serial floor on the parent session
    val want: Map[String, Seq[String]] = slices.flatten.map { n =>
      val r = n -> run(spark, n)
      Caches.release(); spark.catalog.clearCache()
      r
    }.toMap

    val pool = Executors.newFixedThreadPool(slices.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = slices.map { slice =>
        Future {
          val session = spark.newSession()
          // two rounds per thread so every query also runs AFTER some other
          // thread's release has evicted whatever cache it was sharing
          (1 to 2).flatMap { round =>
            slice.map { n =>
              val r = (n, round) -> run(session, n)
              Caches.release()
              r
            }
          }
        }
      }
      val got = Await.result(Future.sequence(futures), Duration("600s")).flatten
      got.foreach { case ((name, round), res) =>
        assert(res == want(name),
          s"$name (round $round) diverged under concurrency: " +
            s"got ${res.size} rows, want ${want(name).size}")
      }
    } finally {
      pool.shutdown()
      Caches.release()
      spark.catalog.clearCache()
    }
  }
}
