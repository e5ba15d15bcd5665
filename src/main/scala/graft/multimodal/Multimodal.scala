package graft.multimodal

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column support (driver mandate: image/audio/video as opaque
  * binary columns with typed metadata; decode / feature-extract /
  * frame-sample as partition-local operators).
  *
  * The binary payloads here are deterministic fakes built FROM the
  * `documents` table (a "GM" header encoding width/height/format followed
  * by an md5-derived byte payload), because no image/audio codec ships in
  * this container — but the pipeline over them is real end-to-end: a
  * BinaryType column flowing through parquet-compatible plans, header
  * fields decoded back out of the bytes with codegen'd built-ins (q59,
  * oracle-checked), a full RASTER DECODE to pixel values with fused
  * pixel statistics ([[graft.functions.GmRasterStats]], q228 — every
  * width×height pixel materialized and oracle-checked positionally), and
  * partition-local decode/feature/frame-sample operators with
  * per-partition decoder initialization (`mapPartitions` — the Scala
  * analogue of `mapInPandas` batch processing; swapping the synthetic
  * decode rule for libjpeg is a one-function change).
  *
  * 100 TB: binaries stay opaque until the last possible operator; metadata
  * predicates (width/format) push down BEFORE any decode touches bytes;
  * decode cost is per-partition-initialized, never per-row-initialized.
  */
object Multimodal extends QueryPack {
  import Tables._

  /** documents + a fake media binary column. Header layout (8 bytes):
    * magic "GM" | width u16 BE | height u16 BE | fmt u8; then payload =
    * md5(doc_id) repeated (1 + doc_id % 4) times. Built entirely from
    * codegen'd built-ins (hex-string assembly → unhex). */
  def withMedia(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"))
      .withColumn("width", (lit(64) + (col("doc_id") * 7) % 448).cast("int"))
      .withColumn("height", (lit(64) + (col("doc_id") * 13) % 448).cast("int"))
      .withColumn("fmt", (col("doc_id") % 2).cast("int"))
      .withColumn("hexstr", concat(
        lit("474d"),
        lpad(lower(hex(col("width"))), 4, "0"),
        lpad(lower(hex(col("height"))), 4, "0"),
        lpad(lower(hex(col("fmt"))), 2, "0"),
        expr("repeat(md5(CAST(doc_id AS STRING)), 1 + CAST(doc_id % 4 AS INT))")))
      .withColumn("media", unhex(col("hexstr")))

  // q59: metadata decode FROM the binary column — header fields sliced and
  // parsed out of the bytes (substring/hex/conv on BinaryType), proving the
  // opaque-binary round trip against an oracle that never materializes
  // Spark's bytes.
  private def q59(s: SparkSession, d: String): DataFrame =
    withMedia(s, d)
      .select(col("doc_id"),
        expr("CAST(conv(hex(substring(media, 3, 2)), 16, 10) AS INT)").as("dec_width"),
        expr("CAST(conv(hex(substring(media, 5, 2)), 16, 10) AS INT)").as("dec_height"),
        expr("CAST(conv(hex(substring(media, 7, 1)), 16, 10) AS INT)").as("dec_fmt"),
        length(col("media")).as("n_bytes"),
        md5(col("hexstr")).as("content_md5"))
      .orderBy("doc_id")

  private val q59Sql =
    """SELECT doc_id,
      | ('0x' || substr(hexstr, 5, 4))::INT AS dec_width,
      | ('0x' || substr(hexstr, 9, 4))::INT AS dec_height,
      | ('0x' || substr(hexstr, 13, 2))::INT AS dec_fmt,
      | CAST(octet_length(from_hex(hexstr)) AS INT) AS n_bytes,
      | md5(hexstr) AS content_md5
      |FROM (SELECT doc_id,
      |  '474d' || lpad(lower(hex(64 + (doc_id*7) % 448)), 4, '0')
      |         || lpad(lower(hex(64 + (doc_id*13) % 448)), 4, '0')
      |         || lpad(lower(hex(doc_id % 2)), 2, '0')
      |         || repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS hexstr
      | FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---- partition-local operators (spec-tested; no SQL oracle) ----

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, fmt: Int,
      payloadBytes: Int, meanByte: Double, decoder: String)

  /** Decode + feature-extract with PER-PARTITION decoder initialization —
    * the batch shape a real image decoder needs (expensive codec init
    * amortized across the partition, like `mapInPandas` batches). The
    * feature here is a payload-byte histogram mean (a real third-party
    * codec would replace the loop body); the full raster decode to pixel
    * values lives in [[graft.functions.GmRasterStats]] (q228), which is
    * the codegen path — this method demonstrates the typed
    * `Dataset`/`mapPartitions` host shape for decoders that live outside
    * Catalyst. */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real pipeline: val codec = HeavyDecoder.open()  — once per partition
      val decoderId = s"stub-decoder-${java.util.UUID.nameUUIDFromBytes("graft".getBytes)}"
      rows.map { r =>
        val b = r.media
        require(b.length >= 8 && b(0) == 'G' && b(1) == 'M', "bad media header")
        val width = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
        val height = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
        val fmt = b(6) & 0xff
        val payload = b.drop(7)
        val mean = if (payload.isEmpty) 0.0
          else payload.map(_ & 0xff).sum.toDouble / payload.length
        MediaFeatures(r.doc_id, width, height, fmt, payload.length,
          math.rint(mean * 100) / 100, decoderId)
      }
    }
  }

  /** Frame sampling for "video" payloads: treat the payload as 16-byte
    * frames, keep every k-th frame's md5. Row-local, emits one row per
    * kept frame — the explode-shaped operator a frame pipeline needs. */
  def sampleFrames(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
        posexplode(expr("transform(sequence(1, CAST((length(media)-7) DIV 16 AS INT))," +
          " i -> md5(hex(substring(media, 8 + (i-1)*16, 16))))"))
          .as(Seq("frame_idx", "frame_md5")))
      .filter(col("frame_idx") % k === 0)

  // q60: frame sampling with an oracle — every 2nd 16-byte frame of each
  // payload, fingerprinted. Spark reads frames out of the BINARY column
  // (substring on bytes → hex); the oracle slices the hex string, so a
  // match proves the byte-level frame arithmetic.
  private def q60(s: SparkSession, d: String): DataFrame =
    sampleFrames(withMedia(s, d), 2)
      .orderBy("doc_id", "frame_idx")

  private val q60Sql =
    """SELECT doc_id, CAST(i AS INT) AS frame_idx,
      | md5(upper(substr(hexstr, 15 + 32*CAST(i AS INT), 32))) AS frame_md5
      |FROM (SELECT doc_id,
      |  '474d' || lpad(lower(hex(64 + (doc_id*7) % 448)), 4, '0')
      |         || lpad(lower(hex(64 + (doc_id*13) % 448)), 4, '0')
      |         || lpad(lower(hex(doc_id % 2)), 2, '0')
      |         || repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS hexstr
      | FROM documents)
      |CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ii
      |WHERE i < (length(hexstr) - 14) // 32 AND i % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  // q179: PERCEPTUAL-HASH BUCKET AUDIT — the B31 dedup family extended
  // to the multimodal column: an average-hash (aHash) over the payload
  // bytes — 8 interleaved byte groups, bit g set iff group g's mean
  // exceeds the payload mean, compared as exact integer cross-products
  // (gsum·n > total·gcnt — no float division ever computed) — and the
  // bucket-occupancy report that prices it as an LSH key: docs per hash,
  // candidate pairs per bucket (the exact q43-band economics, media
  // edition). The hash runs at payload-BYTE grain — which under q228's
  // tiling decode rule IS the pixel stream (byte-grain aHash = pixel-
  // grain aHash up to tiling); the audit mechanics — row-local integer
  // fingerprint, one |buckets|-key aggregation, candidate counts —
  // are the real thing a media-dedup pipeline runs at 100 TB, where
  // phash equality is the bucket join key exactly as q43 bands are for
  // text. Interleaved (i % 8) grouping, not contiguous blocks, so
  // variable-length payloads still populate every group.
  private def q179(s: SparkSession, d: String): DataFrame = {
    val base = withMedia(s, d)
      .withColumn("ph", expr("substring(hexstr, 15)"))
      .withColumn("nb", (length(col("ph")) / 2).cast("long"))
      .withColumn("bytes", expr(
        "transform(sequence(0, CAST(nb - 1 AS INT)), i -> CAST(conv(substring(ph, 1 + 2*i, 2), 16, 10) AS BIGINT))"))
      .withColumn("ts", expr("aggregate(bytes, 0L, (a, x) -> a + x)"))
    val withSums = (0 until 8).foldLeft(base) { (df, g) =>
      df.withColumn(s"gs$g", expr(
        s"aggregate(transform(sequence(0, CAST(nb - 1 AS INT)), i -> IF(i % 8 = $g, bytes[i], 0L)), 0L, (a, x) -> a + x)"))
        .withColumn(s"gc$g", expr(s"(nb + 7 - $g) div 8"))
    }
    val phash = (0 until 8).map(g =>
      when(col(s"gs$g") * col("nb") > col("ts") * col(s"gc$g"), lit(1L << g))
        .otherwise(0L)).reduce(_ + _)
    withSums.withColumn("phash", phash)
      .groupBy("phash")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_pairs", expr("n_docs * (n_docs - 1) div 2"))
      .orderBy(desc("n_docs"), col("phash"))
      .limit(20)
  }

  private val q179Sql = {
    val gsums = (0 until 8).map(g =>
      s"list_aggregate(list_transform(range(0, nb), i -> CASE WHEN i % 8 = $g" +
        s" THEN bytes[CAST(i + 1 AS INT)] ELSE 0 END), 'sum') AS gs$g," +
        s" (nb + 7 - $g) // 8 AS gc$g").mkString(", ")
    val bits = (0 until 8).map(g =>
      s"CASE WHEN gs$g * nb > ts * gc$g THEN ${1L << g} ELSE 0 END").mkString(" + ")
    s"""WITH m AS (SELECT doc_id,
      |  repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS ph
      | FROM documents),
      |b AS (SELECT doc_id, CAST(len(ph) // 2 AS BIGINT) AS nb,
      |  list_transform(range(0, len(ph) // 2),
      |    i -> ('0x' || substr(ph, CAST(1 + 2*i AS INT), 2))::BIGINT) AS bytes
      | FROM m),
      |t AS (SELECT doc_id, nb, bytes, list_aggregate(bytes, 'sum') AS ts FROM b),
      |g AS (SELECT doc_id, nb, ts, $gsums FROM t),
      |p AS (SELECT doc_id, CAST($bits AS BIGINT) AS phash FROM g)
      |SELECT phash, count(*) AS n_docs,
      | count(*) * (count(*) - 1) // 2 AS n_pairs
      |FROM p GROUP BY phash ORDER BY n_docs DESC, phash LIMIT 20""".stripMargin
  }

  // q214: MEDIA BATCH-SHAPE AUDIT — q186 priced padding for token
  // batches; this is the media edition, the number behind "bucket images
  // by aspect/resolution before batching" (the NaViT/aspect-bucketing
  // practice): a decode/training batch pads every image to the batch's max
  // dims, so one panoramic image in a mixed batch wastes most of the
  // tensor. Two schemes priced from ONE bounded bucket grid: 'global'
  // (every item padded to the corpus max dims — the naive single-shape
  // batcher) vs 'bucketed' (padded to its (fmt, 64px-granule) bucket's
  // max). bucketed ≤ global PER BUCKET by construction (bucket maxima
  // are ≤ the global maxima) — the invariant the spec asserts, with
  // exact pixel integers. Plan: one scan collapses to the bounded
  // (fmt, wb, hb) grid (partial-agg'd); both schemes derive from grid
  // rows only. At 100 TB the grid IS the batching plan a decode fleet
  // consumes; bytes never move.
  private def q214(s: SparkSession, d: String): DataFrame = {
    val buckets = withMedia(s, d)
      .groupBy(col("fmt"), expr("width div 64").as("wb"), expr("height div 64").as("hb"))
      .agg(count(lit(1)).as("n"), max("width").as("mw"), max("height").as("mh"),
        sum(expr("CAST(width AS BIGINT) * height")).as("px"))
    val bucketed = buckets
      .agg(sum("n").as("n_items"), sum("px").as("actual_px"),
        sum(expr("n * CAST(mw AS BIGINT) * mh")).as("padded_px"))
      .select(lit("bucketed").as("scheme"), col("n_items"), col("actual_px"),
        col("padded_px"))
    val global = buckets
      .agg(sum("n").as("n_items"), sum("px").as("actual_px"),
        max("mw").as("gw"), max("mh").as("gh"))
      .select(lit("global").as("scheme"), col("n_items"), col("actual_px"),
        (col("n_items") * col("gw").cast("long") * col("gh")).as("padded_px"))
    bucketed.unionByName(global)
      .withColumn("waste_permille",
        expr("(padded_px - actual_px) * 1000 div padded_px"))
      .orderBy("scheme")
  }

  private val q214Sql =
    """WITH m AS (SELECT doc_id % 2 AS fmt,
      |   64 + (doc_id*7) % 448 AS width, 64 + (doc_id*13) % 448 AS height
      |  FROM documents),
      |b AS (SELECT fmt, width // 64 AS wb, height // 64 AS hb, count(*) AS n,
      |   max(width) AS mw, max(height) AS mh,
      |   sum(CAST(width AS BIGINT) * height) AS px
      |  FROM m GROUP BY 1, 2, 3),
      |u AS (
      | SELECT 'bucketed' AS scheme, sum(n) AS n_items, sum(px) AS actual_px,
      |  sum(n * CAST(mw AS BIGINT) * mh) AS padded_px FROM b
      | UNION ALL
      | SELECT 'global', sum(n), sum(px),
      |  sum(n) * CAST(max(mw) AS BIGINT) * max(mh) FROM b)
      |SELECT scheme, CAST(n_items AS BIGINT) AS n_items,
      | CAST(actual_px AS BIGINT) AS actual_px,
      | CAST(padded_px AS BIGINT) AS padded_px,
      | CAST((padded_px - actual_px) * 1000 // padded_px AS BIGINT) AS waste_permille
      |FROM u ORDER BY scheme""".stripMargin

  // q227: BINARY CHUNK-STORE DEDUP over the media column — B180's CDC
  // primitive at byte grain, where it was born (rsync/restic dedup raw
  // files, not words): q179 buckets whole assets by perceptual hash,
  // but a chunk store dedups SUB-file ranges — re-encoded variants,
  // shared headers, repeated frames — that whole-file identity misses.
  // Boundary rule: the rolling 8-byte polynomial ≡ 0 mod 13 (media
  // payloads are 16–64 B, so the text variant's 61 would leave almost
  // everything single-chunk), via the codegen CdcBoundariesBytes — the
  // oracle recomputes H per position from the SAME hex rendering that
  // defines the bytes, so boundaries are integer-identical. Fingerprints
  // are md5 over the chunk's (lowercased) hex — equal to the oracle's
  // substr of the generating hexstr. The synthetic payload (md5(doc_id)
  // repeated 1–4×) is 16-byte PERIODIC, so the boundary pattern repeats
  // with the payload and interior chunks of repeated blocks dedup —
  // exactly the repeated-content structure (shared headers, repeated
  // frames) a real media store exploits. Per fmt: chunk counts, bytes,
  // distinct bytes, savings permille. Shape: row-local boundaries +
  // chunk-grain explode, fp-keyed and fmt-keyed partial-agg shuffles,
  // media bytes never leave their scan.
  /** q227's chunk frame with its manifest key kept: one row per
    * (doc_id, fmt, fp, clen) CDC chunk of the media column. Shared by
    * q227 (store dedup economics) and q274 (mark-and-sweep GC); persisted
    * because both read it more than once. */
  private def mediaChunksByDoc(s: SparkSession, d: String): DataFrame = {
    val ch = withMedia(s, d)
      .withColumn("bnd", org.apache.spark.sql.GraftColumn(
        graft.functions.CdcBoundariesBytes(
          org.apache.spark.sql.GraftColumn.expr(col("media")), 13)))
      .withColumn("len", length(col("media")))
      .withColumn("ends", expr("array_distinct(concat(bnd, array(len)))"))
      .withColumn("chunks", expr(
        """transform(ends, (e, i) -> struct(
          |  md5(lower(hex(substring(media, CASE WHEN i = 0 THEN 1 ELSE ends[i-1] + 1 END,
          |      e - (CASE WHEN i = 0 THEN 0 ELSE ends[i-1] END))))) AS fp,
          |  CAST(e - (CASE WHEN i = 0 THEN 0 ELSE ends[i-1] END) AS BIGINT) AS clen))"""
          .stripMargin))
      .select(col("doc_id"), col("fmt"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("fmt"), col("c.fp").as("fp"), col("c.clen").as("clen"))
    graft.Caches.persist(ch)
  }

  private def q227(s: SparkSession, d: String): DataFrame = {
    val ch = mediaChunksByDoc(s, d)
    val tot = ch.groupBy("fmt")
      .agg(count(lit(1)).as("n_chunks"), sum("clen").as("bytes"))
    val uniq = ch.groupBy("fmt", "fp").agg(min("clen").as("clen"))
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_uniq"), sum("clen").as("uniq_bytes"))
    tot.join(uniq, "fmt")
      .withColumn("savings_milli", expr("(bytes - uniq_bytes) * 1000 div bytes"))
      .select("fmt", "n_chunks", "bytes", "n_uniq", "uniq_bytes", "savings_milli")
      .orderBy("fmt")
  }

  /** Shared oracle CTE chain ending in `chunks(doc_id, fmt, fp, clen)` —
    * the DuckDB twin of [[mediaChunksByDoc]], used by q227 and q274. */
  private val chunkSqlCte =
    """WITH m AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS fmt,
      |  '474d' || lpad(lower(hex(64 + (doc_id*7) % 448)), 4, '0')
      |         || lpad(lower(hex(64 + (doc_id*13) % 448)), 4, '0')
      |         || lpad(lower(hex(doc_id % 2)), 2, '0')
      |         || repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS hexstr
      | FROM documents),
      |b AS (SELECT doc_id, fmt, hexstr,
      |   CAST(length(hexstr) // 2 AS INT) AS len FROM m),
      |pos AS (SELECT doc_id, CAST(p AS INT) AS p, hexstr
      |  FROM b CROSS JOIN LATERAL unnest(range(8, len + 1)) t(p)),
      |hh AS (SELECT doc_id, p,
      |   ('0x' || substr(hexstr, 2*p-1,  2))::BIGINT
      | + ('0x' || substr(hexstr, 2*p-3,  2))::BIGINT * 31
      | + ('0x' || substr(hexstr, 2*p-5,  2))::BIGINT * 961
      | + ('0x' || substr(hexstr, 2*p-7,  2))::BIGINT * 29791
      | + ('0x' || substr(hexstr, 2*p-9,  2))::BIGINT * 923521
      | + ('0x' || substr(hexstr, 2*p-11, 2))::BIGINT * 28629151
      | + ('0x' || substr(hexstr, 2*p-13, 2))::BIGINT * 887503681
      | + ('0x' || substr(hexstr, 2*p-15, 2))::BIGINT * 27512614111 AS h
      |  FROM pos),
      |ends AS (SELECT doc_id, p FROM hh WHERE h % 13 = 0
      |  UNION SELECT doc_id, len FROM b),
      |ch0 AS (SELECT doc_id, p AS e,
      |   coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS st
      |  FROM ends),
      |chunks AS (SELECT b.doc_id, b.fmt,
      |   md5(substr(b.hexstr, 2*c.st - 1, 2*(c.e - c.st + 1))) AS fp,
      |   CAST(c.e - c.st + 1 AS BIGINT) AS clen
      |  FROM ch0 c JOIN b USING (doc_id))""".stripMargin

  private val q227Sql = chunkSqlCte +
    """,
      |tot AS (SELECT fmt, count(*) AS n_chunks, CAST(sum(clen) AS BIGINT) AS bytes
      |  FROM chunks GROUP BY fmt),
      |u0 AS (SELECT fmt, fp, min(clen) AS clen FROM chunks GROUP BY 1, 2),
      |u AS (SELECT fmt, count(*) AS n_uniq, CAST(sum(clen) AS BIGINT) AS uniq_bytes
      |  FROM u0 GROUP BY fmt)
      |SELECT fmt, n_chunks, bytes, n_uniq, uniq_bytes,
      | (bytes - uniq_bytes) * 1000 // bytes AS savings_milli
      |FROM tot JOIN u USING (fmt) ORDER BY fmt""".stripMargin

  // q228: DECODED PIXEL STATISTICS — the query that retires "pixel decode
  // is the documented stub" (r11 verdict task 1): graft.functions
  // .GmRasterStats DECODES each asset's full width×height raster
  // (periodic payload tiling — see its scaladoc) and folds mean-luma and
  // 2-D gradient energy in the same pass; this query buckets assets by
  // (fmt, mean-luma band) and prices the per-band edge energy in exact
  // integer milli-units — the decode-then-reduce report a media-quality
  // gate runs (flat/noisy-asset triage by luma + gradient). The oracle
  // re-derives every pixel POSITIONALLY (pixel i = payload byte i mod
  // plen, one row per pixel) from the same hex rendering, so a hash
  // match proves the raster decode pixel-for-pixel — the q227 technique,
  // extended from chunk bytes to decoded rasters. Shape: decode is
  // row-local inside codegen (no pixel ever shuffles); the only exchange
  // carries one 9-field stats row per asset into a bounded (fmt, band)
  // aggregate. Edge denominators are exact adjacency counts: a w×h
  // raster has n_px − h horizontal and n_px − w vertical neighbor pairs.
  private def q228(s: SparkSession, d: String): DataFrame =
    withMedia(s, d)
      // decode cost is O(pixels) — ~100× the bytes the scan reads — so a
      // single-file scan partition would serialize the whole decode on
      // one core (measured: 1 task for 4·10⁸ pixels at sf0.1). Spread
      // assets across cores BEFORE the expensive operator: the shuffled
      // rows are tiny (64 B payloads), the decode is the work. The
      // partition count is EXPLICIT — a bare repartition(col) lets AQE
      // coalesce by byte size, and 50k rows of headers look like one
      // 5 MB partition to AQE while hiding 4·10⁹ pixels of CPU behind
      // them (measured 13.6 s → 1.8 s at the sf1 smoke). At 100 TB a
      // real asset store splits across many files and this repartition
      // becomes a safety net, same posture as the mapInPandas
      // batch-shape guidance: partition by COMPUTE, not bytes.
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), org.apache.spark.sql.GraftColumn(
        graft.functions.GmRasterStats(
          org.apache.spark.sql.GraftColumn.expr(col("media")))).as("r"))
      .select(col("r.fmt").as("fmt"),
        expr("(r.luma_sum div r.n_px) div 16").as("luma_band"),
        col("r.n_px").as("n_px"), col("r.luma_sum").as("luma_sum"),
        col("r.row_edge_sum").as("res"), col("r.col_edge_sum").as("ces"),
        col("r.height").as("h"), col("r.width").as("w"),
        col("r.min_px").as("mnp"), col("r.max_px").as("mxp"))
      .groupBy("fmt", "luma_band")
      .agg(count(lit(1)).as("n_docs"), sum("n_px").as("px"),
        expr("sum(res) * 1000 div (sum(n_px) - sum(h))").as("row_edge_milli"),
        expr("sum(ces) * 1000 div (sum(n_px) - sum(w))").as("col_edge_milli"),
        min("mnp").as("min_px"), max("mxp").as("max_px"))
      .orderBy("fmt", "luma_band")

  private val q228Sql =
    """WITH m AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS fmt,
      |  CAST(64 + (doc_id*7) % 448 AS BIGINT) AS w,
      |  CAST(64 + (doc_id*13) % 448 AS BIGINT) AS h,
      |  repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS ph
      | FROM documents),
      |b AS (SELECT doc_id, fmt, w, h, ph,
      |  CAST(len(ph) // 2 AS BIGINT) AS plen, w * h AS n_px FROM m),
      |px AS (SELECT doc_id, fmt, w, h, n_px, plen, ph,
      |  unnest(range(0, n_px)) AS i FROM b),
      |v AS (SELECT doc_id, fmt, w, h, n_px,
      |  ('0x' || substr(ph, CAST(2*(i % plen)+1 AS INT), 2))::BIGINT AS p,
      |  CASE WHEN i % w = 0 THEN 0 ELSE
      |    abs(('0x' || substr(ph, CAST(2*(i % plen)+1 AS INT), 2))::BIGINT
      |      - ('0x' || substr(ph, CAST(2*((i-1) % plen)+1 AS INT), 2))::BIGINT) END AS dr,
      |  CASE WHEN i < w THEN 0 ELSE
      |    abs(('0x' || substr(ph, CAST(2*(i % plen)+1 AS INT), 2))::BIGINT
      |      - ('0x' || substr(ph, CAST(2*((i-w) % plen)+1 AS INT), 2))::BIGINT) END AS dc
      |  FROM px),
      |s AS (SELECT doc_id, fmt, max(w) AS w, max(h) AS h, max(n_px) AS n_px,
      |  sum(p) AS luma_sum, sum(dr) AS res, sum(dc) AS ces,
      |  min(p) AS mnp, max(p) AS mxp
      | FROM v GROUP BY doc_id, fmt)
      |SELECT fmt, CAST((luma_sum // n_px) // 16 AS BIGINT) AS luma_band,
      | count(*) AS n_docs, CAST(sum(n_px) AS BIGINT) AS px,
      | CAST(sum(res) * 1000 // (sum(n_px) - sum(h)) AS BIGINT) AS row_edge_milli,
      | CAST(sum(ces) * 1000 // (sum(n_px) - sum(w)) AS BIGINT) AS col_edge_milli,
      | CAST(min(mnp) AS INT) AS min_px, CAST(max(mxp) AS INT) AS max_px
      |FROM s GROUP BY fmt, luma_band ORDER BY fmt, luma_band""".stripMargin

  // q244: MEDIA BYTE-ENTROPY AUDIT — the media family's compressibility
  // and corruption lens (q123/DeflateLen prices text redundancy by
  // actually deflating; raw media needs the cheaper signal a store can
  // afford per asset): per-asset Shannon entropy of the PAYLOAD byte
  // distribution in exact fixed-point milli-bits (the q230 idiom:
  // H = log2 n − Σ c·log2 c / n over the ≤ 256-value byte histogram,
  // FixedPoint.log2milli, zero transcendentals in hashed columns).
  // Near-8000 milli = encrypted/already-compressed/random (don't
  // re-compress, can't dedup); low = structured/flat (compresses,
  // q227's chunk store will bite); a sudden per-format shift = corrupt
  // or mis-tagged batch. Grain discipline: the histogram is (asset,
  // byte)-grain — ≤ 256 rows per asset whatever the asset size — then
  // everything rolls to (fmt, 250-milli band), a bounded report. Bytes
  // never leave their scan: the explode carries byte VALUES, the
  // exchange carries histogram counts. Oracle re-derives every byte
  // positionally from the same hex rendering (the q227/q228 technique).
  private def q244(s: SparkSession, d: String): DataFrame = {
    import graft.operators.FixedPoint.log2milli
    val bytes = withMedia(s, d)
      .select(col("doc_id"), (col("doc_id") % 2).cast("int").as("fmt"),
        col("media"), length(col("media")).as("len"))
      .select(col("doc_id"), col("fmt"), explode(expr(
        "transform(sequence(8, len)," +
          " p -> CAST(conv(hex(substring(media, p, 1)), 16, 10) AS BIGINT))"))
        .as("bv"))
    val hist = bytes.groupBy("doc_id", "fmt", "bv").agg(count(lit(1)).as("c"))
      .withColumn("clog", log2milli("c"))
    val ent = hist.groupBy("doc_id", "fmt")
      .agg(sum("c").as("n"), sum(expr("c * clog")).as("sum_clog"))
      .withColumn("h_milli", log2milli("n") - expr("sum_clog div n"))
    ent.groupBy(col("fmt"), expr("h_milli div 250").as("band"))
      .agg(count(lit(1)).as("n_assets"), min("h_milli").as("min_h"),
        max("h_milli").as("max_h"), sum("n").as("bytes"))
      .orderBy("fmt", "band")
  }

  private val q244Sql = {
    def lg(x: String) =
      s"1000 * (length(bin($x)) - 1) + (($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1))"
    s"""WITH m AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS fmt,
       |  '474d' || lpad(lower(hex(64 + (doc_id*7) % 448)), 4, '0')
       |         || lpad(lower(hex(64 + (doc_id*13) % 448)), 4, '0')
       |         || lpad(lower(hex(doc_id % 2)), 2, '0')
       |         || repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS hexstr
       | FROM documents),
       |b AS (SELECT doc_id, fmt, hexstr,
       |   CAST(length(hexstr) // 2 AS INT) AS len FROM m),
       |pos AS (SELECT doc_id, fmt,
       |   ('0x' || substr(hexstr, 2*CAST(p AS INT)-1, 2))::BIGINT AS bv
       |  FROM b CROSS JOIN LATERAL unnest(range(8, len + 1)) t(p)),
       |c AS (SELECT doc_id, fmt, bv, count(*) AS c FROM pos GROUP BY 1, 2, 3),
       |cl AS (SELECT doc_id, fmt, c, ${lg("c")} AS clog FROM c),
       |e AS (SELECT doc_id, fmt, CAST(sum(c) AS BIGINT) AS n,
       |   CAST(sum(c * clog) AS BIGINT) AS sum_clog FROM cl GROUP BY 1, 2),
       |h AS (SELECT fmt, ${lg("n")} - sum_clog // n AS h_milli, n FROM e)
       |SELECT fmt, h_milli // 250 AS band, count(*) AS n_assets,
       | CAST(min(h_milli) AS BIGINT) AS min_h, CAST(max(h_milli) AS BIGINT) AS max_h,
       | CAST(sum(n) AS BIGINT) AS bytes
       |FROM h GROUP BY 1, 2 ORDER BY fmt, band""".stripMargin
  }

  // q247: DECODE-BATCH BALANCING (LPT snake) — turns q214's batch-shape
  // ECONOMICS into a batch ASSIGNMENT a decode fleet can execute: a
  // fleet of B workers pays the max per-batch pixel sum, so balanced
  // batches are wall-clock; this compares the naive contiguous-id split
  // (what a directory listing gives you) against the snake draft over
  // the pixel-sorted order (rank r → position r mod 2B, reflected —
  // the deterministic, relational form of LPT greedy: heaviest assets
  // spread first, each batch alternates picking early/late). Both
  // assignments are pure rank arithmetic — no sequential state, no
  // driver loop — and the report is per (fmt, strategy): batches,
  // max/min batch pixels, imbalance_milli = max·B·1000 div total (the
  // wall-clock multiplier vs perfect balance). Asset-grain ranks: at
  // 100 TB the q187 denseOrdinal two-phase form replaces the plain
  // window (assets ≪ bytes; the note, not the fixture's problem).
  private def q247(s: SparkSession, d: String): DataFrame = {
    val B = 8
    val assets = withMedia(s, d)
      .select(col("doc_id"), (col("doc_id") % 2).cast("int").as("fmt"),
        (col("width").cast("long") * col("height")).as("px"))
    val wLpt = Window.partitionBy("fmt").orderBy(desc("px"), col("doc_id"))
    val wSeq = Window.partitionBy("fmt").orderBy("doc_id")
    val assigned = assets
      .withColumn("r", row_number().over(wLpt) - 1)
      .withColumn("pos", expr(s"r % ${2 * B}"))
      .withColumn("lpt_b", expr(s"CASE WHEN pos < $B THEN pos ELSE ${2 * B - 1} - pos END"))
      .withColumn("rs", row_number().over(wSeq) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("fmt")))
      .withColumn("seq_b", expr(s"rs * $B div n"))
    def report(strategy: String, batchCol: String) =
      assigned.groupBy(col("fmt"), col(batchCol).as("b"))
        .agg(sum("px").as("bpx"))
        .groupBy("fmt")
        .agg(count(lit(1)).as("n_batches"), sum("bpx").as("total_px"),
          max("bpx").as("max_px"), min("bpx").as("min_px"))
        .withColumn("strategy", lit(strategy))
        .withColumn("imbalance_milli", expr("max_px * n_batches * 1000 div total_px"))
    report("1_naive_contiguous", "seq_b")
      .unionByName(report("2_lpt_snake", "lpt_b"))
      .select("fmt", "strategy", "n_batches", "total_px", "max_px", "min_px",
        "imbalance_milli")
      .orderBy("fmt", "strategy")
  }

  private val q247Sql = {
    val B = 8
    s"""WITH a AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS fmt,
       |   CAST((64 + (doc_id*7) % 448) * (64 + (doc_id*13) % 448) AS BIGINT) AS px
       |  FROM documents),
       |r AS (SELECT fmt, px,
       |   row_number() OVER (PARTITION BY fmt ORDER BY px DESC, doc_id) - 1 AS r,
       |   row_number() OVER (PARTITION BY fmt ORDER BY doc_id) - 1 AS rs,
       |   count(*) OVER (PARTITION BY fmt) AS n
       |  FROM a),
       |asg AS (SELECT fmt, px,
       |   CASE WHEN r % ${2 * B} < $B THEN r % ${2 * B}
       |        ELSE ${2 * B - 1} - r % ${2 * B} END AS lpt_b,
       |   rs * $B // n AS seq_b
       |  FROM r),
       |rep AS (
       | SELECT fmt, '1_naive_contiguous' AS strategy, seq_b AS b, sum(px) AS bpx
       |  FROM asg GROUP BY 1, 3
       | UNION ALL
       | SELECT fmt, '2_lpt_snake', lpt_b, sum(px) FROM asg GROUP BY 1, 3)
       |SELECT fmt, strategy, count(*) AS n_batches,
       | CAST(sum(bpx) AS BIGINT) AS total_px, CAST(max(bpx) AS BIGINT) AS max_px,
       | CAST(min(bpx) AS BIGINT) AS min_px,
       | CAST(max(bpx) * count(*) * 1000 // sum(bpx) AS BIGINT) AS imbalance_milli
       |FROM rep GROUP BY 1, 2 ORDER BY fmt, strategy""".stripMargin
  }

  // q253: CHUNK-STORE MANIFEST ROUND-TRIP AUDIT — the integrity half
  // q227 leaves open: dedup savings mean nothing if the store cannot
  // give the bytes BACK. The content-addressed contract is replayed
  // end-to-end IN the engine: manifest = each asset's ordered chunk-fp
  // list; store = one canonical content per fp (global across formats —
  // content addressing dedups cross-format by design); reconstruction =
  // manifest ⋈ store on fp, chunks re-concatenated in manifest order
  // (sort_array over (seq, content) structs — deterministic, no
  // collect_list order dependence); verdict = the reconstructed hex
  // EQUALS the original rendering, per asset, rolled to a per-format
  // match report beside the store's global size. A store that dropped a
  // chunk, cross-linked a collision, or lost manifest order fails the
  // hash. Fixture assets are bytes-small so the full asset re-concat is
  // cheap; at 100 TB the same audit runs without materializing assets:
  // per-chunk content equality at the fp grain + a per-asset Merkle over
  // the ordered fp list — both already present here as subexpressions.
  private def q253(s: SparkSession, d: String): DataFrame = {
    val ch = withMedia(s, d)
      .withColumn("bnd", org.apache.spark.sql.GraftColumn(
        graft.functions.CdcBoundariesBytes(
          org.apache.spark.sql.GraftColumn.expr(col("media")), 13)))
      .withColumn("len", length(col("media")))
      .withColumn("ends", expr("array_distinct(concat(bnd, array(len)))"))
      .withColumn("chunks", expr(
        """transform(ends, (e, i) -> struct(
          |  CAST(CASE WHEN i = 0 THEN 0 ELSE ends[i-1] END AS LONG) AS seq,
          |  lower(hex(substring(media, CASE WHEN i = 0 THEN 1 ELSE ends[i-1] + 1 END,
          |      e - (CASE WHEN i = 0 THEN 0 ELSE ends[i-1] END)))) AS chex))"""
          .stripMargin))
      .select(col("doc_id"), col("fmt"), col("hexstr"),
        explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("fmt"), col("hexstr"),
        col("c.seq").as("seq"), col("c.chex").as("chex"),
        md5(col("c.chex")).as("fp"),
        (length(col("c.chex")) / 2).cast("long").as("clen"))
    graft.Caches.persist(ch)
    val store = ch.groupBy("fp").agg(min("chex").as("content"), min("clen").as("clen"))
    val storeStats = store.agg(count(lit(1)).as("store_chunks"),
      sum("clen").as("store_bytes"))
    val recon = ch.select("doc_id", "fmt", "hexstr", "seq", "fp")
      .join(store.select(col("fp"), col("content")), "fp")
      .groupBy("doc_id", "fmt", "hexstr")
      .agg(count(lit(1)).as("n_chunks"),
        concat_ws("", expr("transform(sort_array(collect_list(struct(seq, content))), x -> x.content)"))
          .as("recon"))
    recon.groupBy("fmt")
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("recon") === col("hexstr"), 1L).otherwise(0L)).as("n_match"),
        sum("n_chunks").as("manifest_chunks"))
      .withColumn("n_mismatch", expr("n_assets - n_match"))
      .crossJoin(broadcast(storeStats))
      .select("fmt", "n_assets", "n_match", "n_mismatch", "manifest_chunks",
        "store_chunks", "store_bytes")
      .orderBy("fmt")
  }

  private val q253Sql =
    """WITH m AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS fmt,
      |  '474d' || lpad(lower(hex(64 + (doc_id*7) % 448)), 4, '0')
      |         || lpad(lower(hex(64 + (doc_id*13) % 448)), 4, '0')
      |         || lpad(lower(hex(doc_id % 2)), 2, '0')
      |         || repeat(md5(doc_id::VARCHAR), CAST(1 + doc_id % 4 AS INT)) AS hexstr
      | FROM documents),
      |b AS (SELECT doc_id, fmt, hexstr,
      |   CAST(length(hexstr) // 2 AS INT) AS len FROM m),
      |pos AS (SELECT doc_id, CAST(p AS INT) AS p, hexstr
      |  FROM b CROSS JOIN LATERAL unnest(range(8, len + 1)) t(p)),
      |hh AS (SELECT doc_id, p,
      |   ('0x' || substr(hexstr, 2*p-1,  2))::BIGINT
      | + ('0x' || substr(hexstr, 2*p-3,  2))::BIGINT * 31
      | + ('0x' || substr(hexstr, 2*p-5,  2))::BIGINT * 961
      | + ('0x' || substr(hexstr, 2*p-7,  2))::BIGINT * 29791
      | + ('0x' || substr(hexstr, 2*p-9,  2))::BIGINT * 923521
      | + ('0x' || substr(hexstr, 2*p-11, 2))::BIGINT * 28629151
      | + ('0x' || substr(hexstr, 2*p-13, 2))::BIGINT * 887503681
      | + ('0x' || substr(hexstr, 2*p-15, 2))::BIGINT * 27512614111 AS h
      |  FROM pos),
      |ends AS (SELECT doc_id, p FROM hh WHERE h % 13 = 0
      |  UNION SELECT doc_id, len FROM b),
      |ch0 AS (SELECT doc_id, p AS e,
      |   coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS st
      |  FROM ends),
      |chunks AS (SELECT b.doc_id, b.fmt, b.hexstr, c.st,
      |   substr(b.hexstr, 2*c.st - 1, 2*(c.e - c.st + 1)) AS chex,
      |   md5(substr(b.hexstr, 2*c.st - 1, 2*(c.e - c.st + 1))) AS fp,
      |   CAST(c.e - c.st + 1 AS BIGINT) AS clen
      |  FROM ch0 c JOIN b USING (doc_id)),
      |store AS (SELECT fp, min(chex) AS content, min(clen) AS clen
      |  FROM chunks GROUP BY fp),
      |ss AS (SELECT count(*) AS store_chunks, CAST(sum(clen) AS BIGINT) AS store_bytes
      |  FROM store),
      |recon AS (SELECT c.doc_id, c.fmt, c.hexstr, count(*) AS n_chunks,
      |   string_agg(s.content, '' ORDER BY c.st) AS recon
      |  FROM chunks c JOIN store s USING (fp)
      |  GROUP BY 1, 2, 3)
      |SELECT fmt, count(*) AS n_assets,
      | CAST(sum(CASE WHEN recon = hexstr THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      | CAST(sum(CASE WHEN recon = hexstr THEN 0 ELSE 1 END) AS BIGINT) AS n_mismatch,
      | CAST(sum(n_chunks) AS BIGINT) AS manifest_chunks,
      | min(store_chunks) AS store_chunks, CAST(min(store_bytes) AS BIGINT) AS store_bytes
      |FROM recon CROSS JOIN ss GROUP BY fmt ORDER BY fmt""".stripMargin

  // q274: CHUNK-STORE GARBAGE COLLECTION — the lifecycle half the
  // chunk-store family leaves open: q227 builds the content-addressed
  // store, q253 proves the manifests reconstruct, but a store that
  // accepts DELETIONS accumulates orphans — chunks no live manifest
  // references — and reclaiming them is the mark-and-sweep every
  // content-addressed system (restic prune, git gc) runs. Deletions are
  // simulated deterministically (doc_id % 13 = 5 retires the asset); the
  // MARK set is the distinct (fmt, fp) referenced by surviving
  // manifests, the SWEEP is one anti-join of the store inventory against
  // it, and the report prices the reclaim per format (orphan chunks,
  // orphan bytes, reclaim permille). The sweep never touches chunk
  // CONTENT — fingerprints and lengths only — which is what makes GC
  // affordable at 100 TB: shuffles carry (fmt, fp) keys, the store's
  // bytes stay where they are until the delete list arrives.
  private def q274(s: SparkSession, d: String): DataFrame = {
    val ch = mediaChunksByDoc(s, d)
    val store = ch.groupBy("fmt", "fp").agg(min("clen").as("clen"))
    val live = ch.filter(expr("doc_id % 13 != 5")).select("fmt", "fp").distinct()
    val orphan = store.join(live, Seq("fmt", "fp"), "left_anti")
    val inv = store.groupBy("fmt")
      .agg(count(lit(1)).as("n_fps"), sum("clen").as("store_bytes"))
    val orp = orphan.groupBy("fmt")
      .agg(count(lit(1)).as("n_orphans"), sum("clen").as("orphan_bytes"))
    inv.join(orp, Seq("fmt"), "left")
      .withColumn("n_orphans", coalesce(col("n_orphans"), lit(0L)))
      .withColumn("orphan_bytes", coalesce(col("orphan_bytes"), lit(0L)))
      .withColumn("reclaim_milli", expr("orphan_bytes * 1000 div store_bytes"))
      .select(col("fmt"), col("n_fps"), col("store_bytes"),
        col("n_orphans"), col("orphan_bytes"), col("reclaim_milli"))
      .orderBy("fmt")
  }

  private val q274Sql = chunkSqlCte +
    """,
      |store AS (SELECT fmt, fp, min(clen) AS clen FROM chunks GROUP BY 1, 2),
      |live AS (SELECT DISTINCT fmt, fp FROM chunks WHERE doc_id % 13 != 5),
      |orphan AS (SELECT s.fmt, s.fp, s.clen FROM store s
      |  LEFT JOIN live l ON s.fmt = l.fmt AND s.fp = l.fp
      |  WHERE l.fp IS NULL),
      |inv AS (SELECT fmt, count(*) AS n_fps, CAST(sum(clen) AS BIGINT) AS store_bytes
      |  FROM store GROUP BY 1),
      |orp AS (SELECT fmt, count(*) AS n_orphans, CAST(sum(clen) AS BIGINT) AS orphan_bytes
      |  FROM orphan GROUP BY 1)
      |SELECT fmt, n_fps, store_bytes,
      | COALESCE(n_orphans, 0) AS n_orphans,
      | COALESCE(orphan_bytes, 0) AS orphan_bytes,
      | COALESCE(orphan_bytes, 0) * 1000 // store_bytes AS reclaim_milli
      |FROM inv LEFT JOIN orp USING (fmt) ORDER BY fmt""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q274_chunk_gc" -> (q274 _),
    "q253_manifest_roundtrip" -> (q253 _),
    "q247_decode_batch_balance" -> (q247 _),
    "q244_media_byte_entropy" -> (q244 _),
    "q228_media_pixel_stats" -> (q228 _),
    "q227_media_cdc_store" -> (q227 _),
    "q214_media_batch_shapes" -> (q214 _),
    "q179_media_phash_buckets" -> (q179 _),
    "q59_media_metadata" -> (q59 _),
    "q60_frame_sample" -> (q60 _))

  override val oracles: Map[String, String] = Map(
    "q274_chunk_gc" -> q274Sql,
    "q253_manifest_roundtrip" -> q253Sql,
    "q247_decode_batch_balance" -> q247Sql,
    "q244_media_byte_entropy" -> q244Sql,
    "q228_media_pixel_stats" -> q228Sql,
    "q227_media_cdc_store" -> q227Sql,
    "q214_media_batch_shapes" -> q214Sql,
    "q179_media_phash_buckets" -> q179Sql,
    "q59_media_metadata" -> q59Sql,
    "q60_frame_sample" -> q60Sql)
}
