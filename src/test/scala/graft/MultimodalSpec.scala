package graft

import graft.functions.GzipDecode
import graft.contentops.Fixture
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, MediaFeatures}
import org.apache.spark.sql.{GraftColumn, Row}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing + the codegen gzip expression. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media binary header round-trips: encoded dims equal decoded dims") {
    val df = Multimodal.withMedia(spark, sf)
      .select(col("doc_id"), col("width"), col("height"), col("fmt"), col("media"))
      .as[(Long, Int, Int, Int, Array[Byte])]
    val feats = Multimodal.decodeFeatures(
      df.map(r => MediaRow(r._1, r._5))).collect().map(f => f.doc_id -> f).toMap
    df.collect().foreach { case (id, w, h, fmt, _) =>
      val f = feats(id)
      assert((f.width, f.height, f.fmt) === ((w, h, fmt)), s"doc $id header mismatch")
      assert(f.payloadBytes === 16 * (1 + id % 4),
        s"doc $id payload: ${f.payloadBytes}") // 16 md5 bytes × reps after the 7-byte header
    }
  }

  test("decodeFeatures initializes the decoder per partition, not per row") {
    val ds = Multimodal.withMedia(spark, sf)
      .select(col("doc_id"), col("media")).as[MediaRow]
    val decoders = Multimodal.decodeFeatures(ds).select("decoder").distinct().count()
    assert(decoders === 1) // deterministic stub id — same everywhere
  }

  test("frame sampling keeps every k-th 16-byte frame") {
    val df = Multimodal.withMedia(spark, sf).limit(50)
    val frames = Multimodal.sampleFrames(df, 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(frames.select("frame_md5").distinct().count() > 0)
  }

  test("metadata predicates prune before any byte-touching operator") {
    // the filter on width compiles to a plan where the binary column is
    // only projected for surviving rows — sanity: counts agree with
    // arithmetic prediction, no decode involved.
    val wide = Multimodal.withMedia(spark, sf).filter(col("width") > 400).count()
    val expect = spark.range(0, 500).filter((lit(64) + (col("id") * 7) % 448) > 400).count()
    assert(wide === expect)
  }

  test("GzipDecode: round-trips UTF-8, null on malformed bytes, matches UDF semantics") {
    val payload = """{"k":"héllo 中"}"""
    val rows = Seq(
      (1L, Fixture.gzip(payload.getBytes("UTF-8"))),
      (2L, Array[Byte](1, 2, 3))) // not gzip → null, record skipped (A19)
      .toDF("id", "bytes")
    val out = rows.select(col("id"),
      GraftColumn(GzipDecode(GraftColumn.expr(col("bytes")))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === payload)
    assert(out(2L) === null)
  }

  test("q179 phash buckets re-derive exactly from a driver-side integer aHash") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val phashes = ids.map { id =>
      val ph = md5hex(id.toString) * (1 + (id % 4).toInt)
      val bytes = ph.grouped(2).map(Integer.parseInt(_, 16).toLong).toArray
      val n = bytes.length.toLong
      val ts = bytes.sum
      (0 until 8).map { g =>
        val gs = bytes.indices.collect { case i if i % 8 == g => bytes(i) }.sum
        val gc = (n + 7 - g) / 8
        if (gs * n > ts * gc) 1L << g else 0L
      }.sum
    }
    val want = phashes.groupBy(identity).toSeq
      .map { case (h, xs) =>
        (h, xs.length.toLong, xs.length.toLong * (xs.length - 1) / 2)
      }
      .sortBy { case (h, n, _) => (-n, h) }.take(20)
    val got = Multimodal.queries("q179_media_phash_buckets")(spark, sf).collect()
      .map(r => (r.getAs[Long]("phash"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pairs"))).toSeq
    assert(got === want)
    // the audit's premise: pseudo-random payloads spread over many
    // buckets — a degenerate all-one-bucket index would be useless
    assert(got.map(_._1).distinct.size === got.size)
  }

  test("q214 batch-shape audit re-derives exactly; bucketed padding never exceeds global") {
    val dims = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (id % 2, 64 + (id * 7) % 448, 64 + (id * 13) % 448))
    val buckets = dims.groupBy { case (f, w, h) => (f, w / 64, h / 64) }
      .map { case (_, xs) =>
        (xs.size.toLong, xs.map(_._2).max, xs.map(_._3).max,
          xs.map { case (_, w, h) => w * h }.sum)
      }.toSeq
    val nItems = buckets.map(_._1).sum
    val actual = buckets.map(_._4).sum
    val padB = buckets.map { case (n, mw, mh, _) => n * mw * mh }.sum
    val padG = nItems * buckets.map(_._2).max * buckets.map(_._3).max
    val want = Seq(
      ("bucketed", nItems, actual, padB, (padB - actual) * 1000 / padB),
      ("global", nItems, actual, padG, (padG - actual) * 1000 / padG))
    val got = Multimodal.queries("q214_media_batch_shapes")(spark, sf).collect()
      .map(r => (r.getAs[String]("scheme"), r.getAs[Long]("n_items"),
        r.getAs[Long]("actual_px"), r.getAs[Long]("padded_px"),
        r.getAs[Long]("waste_permille"))).toSeq
    assert(got === want)
    // the bucketing claim itself: per-bucket maxima ≤ global maxima ⇒
    // bucketed padding ≤ global padding, strictly less on mixed shapes
    assert(padB <= padG)
  }

  test("q227 chunks tile every media file exactly and the periodic payload actually dedups") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.queries("q227_media_cdc_store")(spark, sf).collect()
      .map(r => (r.getAs[Int]("fmt"), r.getAs[Long]("n_chunks"), r.getAs[Long]("bytes"),
        r.getAs[Long]("n_uniq"), r.getAs[Long]("uniq_bytes"),
        r.getAs[Long]("savings_milli"))).toSeq.sortBy(_._1)
    // conservation: chunking is a PARTITION of each file — per-fmt chunk
    // bytes must equal per-fmt media bytes exactly (no gap, no overlap)
    val want = Multimodal.withMedia(spark, sf)
      .groupBy(col("fmt")).agg(sum(length(col("media"))).as("b")).collect()
      .map(r => r.getAs[Int]("fmt") -> r.getAs[Long]("b")).toMap
    got.foreach { case (fmt, nC, bytes, nU, uB, sav) =>
      assert(bytes === want(fmt), s"fmt $fmt chunk bytes must tile the files")
      assert(nU <= nC && uB <= bytes)
      assert(sav === (bytes - uB) * 1000 / bytes)
    }
    // the 16-byte-periodic payload must produce real sub-file dedup:
    // repeated blocks share interior chunks, so savings are non-zero
    assert(got.forall(_._6 > 0), "periodic payloads must dedup at chunk grain")
  }

  test("GmRasterStats: fused stats equal a naively materialized pixel raster, pixel-for-pixel") {
    // The decode contract (r11 verdict task 1): the expression never
    // buffers the raster, so this re-derivation BUILDS it — an actual
    // Array[Array[Int]] per asset, filled by the same tiling rule — and
    // recomputes every statistic with straight 2-D loops. Equality over
    // all 500 sf0.001 assets (72 MB of pixels) proves the one-pass fold
    // IS the raster semantics, not an approximation of it.
    val rows = Multimodal.withMedia(spark, sf)
      .select(col("doc_id"), GraftColumn(graft.functions.GmRasterStats(
        GraftColumn.expr(col("media")))).as("r"), col("media"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { row =>
      val r = row.getAs[Row]("r")
      val b = row.getAs[Array[Byte]]("media")
      val (w, h) = (((b(2) & 0xff) << 8) | (b(3) & 0xff), ((b(4) & 0xff) << 8) | (b(5) & 0xff))
      val payload = b.drop(7).map(_ & 0xff)
      val raster = Array.tabulate(h, w)((y, x) =>
        payload(((y.toLong * w + x) % payload.length).toInt))
      var luma = 0L; var rowE = 0L; var colE = 0L; var mn = 255; var mx = 0
      for (y <- 0 until h; x <- 0 until w) {
        val p = raster(y)(x)
        luma += p; mn = math.min(mn, p); mx = math.max(mx, p)
        if (x > 0) rowE += math.abs(p - raster(y)(x - 1))
        if (y > 0) colE += math.abs(p - raster(y - 1)(x))
      }
      val got = (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Long]("n_px"),
        r.getAs[Long]("luma_sum"), r.getAs[Long]("row_edge_sum"),
        r.getAs[Long]("col_edge_sum"), r.getAs[Int]("min_px"), r.getAs[Int]("max_px"))
      assert(got === ((w, h, w.toLong * h, luma, rowE, colE, mn, mx)),
        s"doc ${row.getLong(0)}: fused stats diverge from the materialized raster")
    }
  }

  test("GmRasterStats: malformed header decodes to null (A19 skip), not an exception") {
    val rows = Seq(
      (1L, "GM".getBytes ++ Array[Byte](0, 64, 0, 64, 1, 42)), // valid, 1-byte payload
      (2L, "XY".getBytes ++ Array[Byte](0, 64, 0, 64, 1, 42)), // wrong magic
      (3L, "GM".getBytes ++ Array[Byte](0, 64))                // truncated
    ).toDF("id", "media")
    val out = rows.select(col("id"), GraftColumn(graft.functions.GmRasterStats(
        GraftColumn.expr(col("media")))).as("r"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true))
    // the 1-byte payload tiles a constant raster: zero gradient everywhere
    val one = rows.filter(col("id") === 1L)
      .select(GraftColumn(graft.functions.GmRasterStats(
        GraftColumn.expr(col("media")))).as("r"))
      .select("r.luma_sum", "r.row_edge_sum", "r.col_edge_sum").head()
    assert(one.getLong(0) === 42L * 64 * 64 && one.getLong(1) === 0L && one.getLong(2) === 0L)
  }
}
