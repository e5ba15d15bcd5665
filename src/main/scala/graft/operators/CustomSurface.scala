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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_topk_udaf" -> (q61 _))

  override val oracles: Map[String, String] = Map(
    "q61_topk_udaf" -> q61Sql)
}
