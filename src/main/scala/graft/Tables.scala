package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver's read-only parquet test tables
  * (`/root/repo/TESTDATA.md:13-15`). One parquet file per table under the
  * scale-factor dir passed to every query builder.
  *
  * At 100 TB these would be partitioned/bucketed table paths behind a real
  * catalog; the single-file layout here is the driver's harness contract.
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes filters
  * and prunes columns into the parquet reader.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as three parquet physical types across
    * testdata generations; this loader normalizes all of them to
    * session-local TimestampType so every downstream query (incl. the
    * `unix_micros` sites, which reject TIMESTAMP_NTZ) sees one type:
    *  - TIMESTAMP(NANOS): unreadable natively; sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` and this converts
    *    ns→µs with integer division (double division would lose
    *    precision on ~1.7e18 ns epochs);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as TIMESTAMP_NTZ;
    *    cast to TimestampType — exact under the UTC session timezone
    *    every graft session pins, and the same value DuckDB's
    *    `epoch_us` sees on the naive column;
    *  - TIMESTAMP(MICROS, UTC): already TimestampType, pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Scale-adaptive fan-out for a HEAVY row-local stage that directly
    * follows a scan (opt guide §2.2/§2.5: derive partitioning from the
    * runtime, never a constant). The driver's single-file, single-row-
    * group parquet tables plan as ONE scan task, so an expensive map
    * stage (per-row hashing, shingling, signature computation, explode
    * amplification) runs on one core no matter how many the session has.
    * When the plan's scan parallelism is below the session's default
    * parallelism, redistribute by `key` (hash exchange — unlike a
    * round-robin `repartition(n)`, no sort-before-repartition pass and
    * deterministic row placement under task retry, SPARK-38388) before
    * the heavy stage; when the input already carries enough splits
    * (any real multi-file/multi-row-group table — the 100 TB case) this
    * is the IDENTITY and no exchange is added. Apply only where the map
    * work dominates the exchanged bytes; every current call site is
    * integer-exact downstream, so row order cannot perturb results.
    */
  def fanout(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // streaming frames (the *Stream twins share batch operator bodies)
    // can't be partition-counted via .rdd and already arrive micro-batch
    // partitioned — pass through untouched
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }

  /** md5-derived percent bucket of an id column, ∈ [0, 100) — the
    * reproducible-membership primitive behind the q74/q75 train/eval
    * splits, the q90 sampler, and the q96 cluster-keyed split. ONE
    * definition on purpose: its DuckDB twin
    * `('0x' || substr(md5(x::VARCHAR), 1, 8))::BIGINT % 100` appears
    * verbatim in each oracle, and a drift between the Scala sites would
    * silently de-correlate splits from samples. Byte-level parity contract:
    * `functions.HashOps.md5Prefix32`. */
  def pctBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hashBucket(c, 100)

  /** The same md5-prefix universal hash over an arbitrary modulus — the
    * engine-portable stand-in for a partitioner's `hash(k) % P` (q236's
    * occupancy planner sweeps P with it; Spark's own Murmur3 hash has no
    * DuckDB twin, and the md5 prefix is uniform enough that occupancy
    * under it prices occupancy under any decent hash). */
  def hashBucket(c: org.apache.spark.sql.Column, m: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % m
  }

  /** [[pctBucket]] of `doc_id` — the common case. */
  val docIdPctBucket: org.apache.spark.sql.Column = pctBucket(col("doc_id"))
}

/** A named family of driver-checkable queries: every key in `queries` that
  * also appears in `oracles` gets a DuckDB hash-match at sf0.01
  * (`/root/repo/src/main/scala/graft/Verify.scala:18-39`); keys without an
  * oracle get the driver's weaker rows-only check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
