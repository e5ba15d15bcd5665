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
