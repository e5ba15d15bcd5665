package graft.streaming

import graft.contentops.Fixture
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A1: the stream-source abstraction. The engine's pipelines consume a
  * DataFrame of raw wire records `(shard int, seq long, payload binary)`;
  * where that frame comes from is a deployment concern behind this trait
  * (/root/reference/docs/user-guide.md:13 — per-shard sequential records).
  *
  * Local (zero-egress, no Kinesis connector jar ships in /opt/spark/jars):
  * [[FixtureWireSource]] serves the deterministic fixture as a batch frame,
  * and StreamingSpec drives the stateful operators through MemoryStream.
  *
  * Production: the open-source `spark-sql-kinesis-connector` provides the
  * DSv2 streaming source; per-shard record order surfaces as per-partition
  * order, KCL-style lease/checkpointing is replaced by the query's
  * checkpoint location:
  *
  * {{{
  * spark.readStream
  *   .format("aws-kinesis")
  *   .option("kinesis.streamName", stream)
  *   .option("kinesis.region", region)
  *   .option("kinesis.consumerType", "GetRecords")
  *   .option("kinesis.startingposition", "TRIM_HORIZON")
  *   .load()                         // → (data binary, partitionKey, sequenceNumber, ...)
  *   .selectExpr("cast(partitionKey as int) shard",
  *               "cast(sequenceNumber as long) seq", "data as payload")
  * }}}
  *
  * Downstream of this trait everything is identical: gzip_decode →
  * indirection resolve (per-partition HTTP client in production — the
  * broadcast object store here) → from_json → keyed operators. At 100 TB
  * the resolve stage is the only network-bound operator; it runs
  * mapPartitions with a pooled client so connection setup amortizes per
  * partition, mirroring the reference's per-shard consumer loop.
  */
trait WireSource {
  def wireRecords(spark: SparkSession): DataFrame
}

/** The deterministic local stand-in (same rows the oracle VALUES encode). */
object FixtureWireSource extends WireSource {
  override def wireRecords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(Fixture.wireRecords).toDF()
  }
}

/** Production Kinesis wiring for the open-source Spark Kinesis DSv2
  * connector (`spark-sql-kinesis-connector`, format "aws-kinesis") — the
  * reference's per-shard consumer (user-guide.md:13) as a Structured
  * Streaming source. Compiled, unit-tested code (WireSourceSpec); only
  * `reader(...).load()` needs the connector jar + network, so nothing here
  * executes in the zero-egress test environment. */
final case class KinesisSourceConfig(
    streamName: String,
    region: String,
    consumerType: String = "GetRecords", // polling; "SubscribeToShard" = EFO push
    startingPosition: String = "TRIM_HORIZON", // LATEST | TRIM_HORIZON | AT_TIMESTAMP
    endpointUrl: Option[String] = None,
    consumerName: Option[String] = None, // required for EFO
    maxFetchRecordsPerShard: Option[Long] = None,
    maxFetchTimePerShardSec: Option[Int] = None) {
  require(streamName.nonEmpty, "streamName must be non-empty")
  require(region.nonEmpty, "region must be non-empty")
  require(Set("GetRecords", "SubscribeToShard")(consumerType),
    s"unknown consumerType $consumerType")
  require(consumerType != "SubscribeToShard" || consumerName.exists(_.nonEmpty),
    "EFO (SubscribeToShard) requires a consumerName")
}

object KinesisWireSource {
  val Format = "aws-kinesis"

  /** The connector option map — the scaladoc example as tested code. */
  def options(c: KinesisSourceConfig): Map[String, String] =
    Map(
      "kinesis.streamName" -> c.streamName,
      "kinesis.region" -> c.region,
      "kinesis.consumerType" -> c.consumerType,
      "kinesis.startingposition" -> c.startingPosition) ++
      c.endpointUrl.map("kinesis.endpointUrl" -> _) ++
      c.consumerName.map("kinesis.consumerName" -> _) ++
      c.maxFetchRecordsPerShard.map("kinesis.maxFetchRecordsPerShard" -> _.toString) ++
      c.maxFetchTimePerShardSec.map(s => "kinesis.maxFetchTimeInMsPerShard" -> (s * 1000L).toString)

  /** readStream wiring; `.load()` is the caller's (deployment-time) step. */
  def reader(spark: SparkSession, c: KinesisSourceConfig) =
    spark.readStream.format(Format).options(options(c))

  /** Connector output schema (data binary, partitionKey string,
    * sequenceNumber string, ...) → the engine's wire schema
    * (shard int, seq long, payload binary). Pure column mapping — works on
    * the streaming frame and on any batch stand-in with the same columns. */
  def toWireRecords(df: DataFrame): DataFrame =
    df.selectExpr(
      "CAST(partitionKey AS INT) AS shard",
      "CAST(sequenceNumber AS BIGINT) AS seq",
      "data AS payload")
}
