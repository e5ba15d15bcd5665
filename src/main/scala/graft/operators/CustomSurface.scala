package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDAF surface (SURVEY.md §2B B35): a typed `Aggregator` computing
  * per-group top-k as a bounded accumulator — the scalable alternative to
  * sort-then-filter when k ≪ group size: each partition keeps at most k
  * entries, the shuffle carries k rows per group per partition, and merge
  * is k-way. Result explodes back to scalar rows so the DuckDB oracle
  * (plain window row_number) can hash-match it.
  */
object CustomSurface extends QueryPack {
  import Tables._

  case class OrderRow(o_orderpriority: String, o_orderkey: Long, o_totalprice: Double)
  case class Entry(price: Double, key: Long)

  /** Top-3 orders by (price desc, key asc) as a typed Aggregator. The
    * buffer is always sorted and bounded at k, so reduce/merge are O(k). */
  object Top3Agg extends Aggregator[OrderRow, Seq[Entry], Seq[Entry]] {
    private val k = 3
    private val ord: Ordering[Entry] = Ordering.by(e => (-e.price, e.key))
    override def zero: Seq[Entry] = Nil
    override def reduce(b: Seq[Entry], r: OrderRow): Seq[Entry] =
      ((Entry(r.o_totalprice, r.o_orderkey) +: b).sorted(ord)).take(k)
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      (a ++ b).sorted(ord).take(k)
    override def finish(b: Seq[Entry]): Seq[Entry] = b
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  // q61: per-priority top-3 orders via the Aggregator, exploded to rows.
  private def q61(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .as[OrderRow]
      .groupByKey(_.o_orderpriority)
      .agg(Top3Agg.toColumn.name("top"))
      .toDF("o_orderpriority", "top")
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rn"),
        col("e.key").as("o_orderkey"),
        col("e.price").as("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  private val q61Sql =
    """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
      | SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** Misra–Gries frequency summary as a typed Aggregator — the
    * DETERMINISTIC heavy-hitter kernel beside q77's probabilistic CMS:
    * k counters, `reduce` does the classic decrement-all on overflow,
    * `merge` is the Agarwal et al. (Mergeable Summaries, PODS'12) rule —
    * sum counters, subtract the (k+1)-th largest, keep positives — which
    * preserves the guarantee est(x) ∈ [true − N/(k+1), true] under ANY
    * merge tree, i.e. under Spark's nondeterministic partial-agg order.
    * The summary CONTENT is therefore order-dependent (never hashed);
    * the guarantee is not (q256 hashes exactly that). */
  class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      if (b.contains(x) || b.size < k) b.updated(x, b.getOrElse(x, 0L) + 1L)
      else b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = (a.keySet ++ b.keySet).iterator
        .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  // q256: MISRA–GRIES GUARANTEED HEAVY HITTERS — the deterministic
  // counterpart of q77 (CMS overestimates with probabilistic bounds; MG
  // NEVER overestimates and its error bound N/(k+1) is a certainty, so
  // a "no key above 20% of traffic" SLO can be CERTIFIED from k = 4
  // counters per partition, merged without re-scanning — the partial-
  // aggregable shape that costs one scan at 100 TB). The fixture's text
  // is deliberately uniform (no natural heavy hitter anywhere), so the
  // key stream is derived deterministically from event_id's LOWEST SET
  // BIT (the AuditOps decoration precedent): key 2^b carries ~2^-(b+1)
  // of the stream — geometric skew both engines reproduce exactly.
  // What hashes is the GUARANTEE, not the merge-order-dependent summary
  // (the q32 discipline): every key with true share > 1/(k+1) must be
  // present, and its estimate must sit in [true − N/(k+1), true] — plus
  // the exact counts and shares of exactly those keys.
  private def q256(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 4
    val keyed = events(s, d)
      .select(expr("CAST((event_id & -event_id) AS STRING)").as("key"))
    graft.Caches.persist(keyed)
    val summary = keyed.as[String].groupByKey(_ => 0)
      .agg(new MisraGriesAgg(k).toColumn.name("mg")).toDF("g", "mg")
      .select(col("mg"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("cnt"))
    val tot = exact.agg(sum("cnt").as("n"))
    exact.crossJoin(broadcast(tot))
      .filter(expr("cnt * (4 + 1) > n"))
      .crossJoin(broadcast(summary))
      .withColumn("est", coalesce(expr("mg[key]"), lit(0L)))
      .select(col("key"), col("cnt").as("exact_cnt"),
        expr("cnt * 10000 div n").as("share_bp"),
        expr("mg[key] IS NOT NULL").as("present"),
        expr("est <= cnt AND cnt - est <= n div (4 + 1)").as("within_err"))
      .orderBy("key")
  }

  private val q256Sql =
    """WITH e AS (SELECT CAST(event_id & -event_id AS VARCHAR) AS key FROM events),
      |x AS (SELECT key, count(*) AS cnt FROM e GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM x)
      |SELECT key, cnt AS exact_cnt, cnt * 10000 // n AS share_bp,
      | TRUE AS present, TRUE AS within_err
      |FROM x CROSS JOIN t WHERE cnt * 5 > n ORDER BY key""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q256_misra_gries" -> (q256 _),
    "q61_topk_udaf" -> (q61 _))

  override val oracles: Map[String, String] = Map(
    "q256_misra_gries" -> q256Sql,
    "q61_topk_udaf" -> q61Sql)
}
