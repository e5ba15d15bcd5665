package graft

import graft.streaming.GridJoinStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The q238 grid join, streamed ([[GridJoinStream]]): the same
  * `overlapPairs` function run (a) as a stream-static join over spans
  * arriving in micro-batches and (b) as one batch frame must produce
  * identical per-day reports — including a span that co-occupies two
  * grid cells with its incident (the double-count the batch-local
  * distinct removes). */
class GridJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private val B = GridJoinStream.BucketUs
  // Two incidents on one day: incident 100 at bucket 2; incident 200
  // starting mid-bucket 4 so a long span can straddle cells 4 and 5.
  private val incidents = Seq(
    (100L, 2 * B, 2 * B + B),
    (200L, 4 * B + B / 2, 4 * B + B / 2 + B)
  ).toDF("inc_id", "is_", "ie")

  // Spans: 1 overlaps incident 100; 2 misses everything (bucket 0);
  // 3 covers buckets 4 AND 5, overlapping incident 200 in both cells
  // (the dedup case); 4 overlaps incident 200 from bucket 5 only.
  private val spanRows = Seq(
    (1L, 2 * B + B / 4, 2 * B + B / 2),
    (2L, 0L, B / 2),
    (3L, 4 * B + B / 2, 5 * B + B / 2),
    (4L, 5 * B, 5 * B + B / 4)
  )

  test("stream over micro-batches ≡ one-shot batch, straddling pair counted once") {
    val grid = GridJoinStream.incidentGrid(incidents)
    val table = java.nio.file.Files.createTempDirectory("graft_gridjoin").toString

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val spans = ms.toDF().toDF("span_id", "ss", "se")
    val q = GridJoinStream.maintain(spans, grid, table)
    ms.addData(spanRows.take(2): _*)
    q.processAllAvailable()
    ms.addData(spanRows.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = GridJoinStream.dailyView(spark, table)
      .orderBy("day").collect().toSeq
    val batch = GridJoinStream
      .overlapPairs(spanRows.toDF("span_id", "ss", "se"), grid).distinct()
      .groupBy("inc_id", "is_")
      .agg(count(lit(1)).as("n_spans"), sum("ov_us").as("ov_us"))
      .groupBy(expr("CAST(to_date(timestamp_micros(is_)) AS STRING)").as("day"))
      .agg(count(lit(1)).as("n_incidents"), sum("n_spans").as("spans_total"),
        sum(expr("ov_us div 1000000")).as("overlap_seconds"),
        max("n_spans").as("max_spans_per_incident"))
      .orderBy("day").collect().toSeq
    assert(streamed === batch)

    // The planted shape: 2 incidents hit, 3 overlapping (inc, span)
    // pairs — span 3's two-cell co-occupancy collapsed to one pair.
    assert(streamed.map(_.getLong(2)).sum === 3L)
    assert(spark.read.parquet(table).select("inc_id", "span_id").distinct().count() === 3L)
  }
}
