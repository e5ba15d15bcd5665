package graft

import graft.operators.{CurationOps, Dedup, ScaleOps, Similarity, StreamSemantics, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic invariants for the stream-semantics batch forms and the
  * LLM-data-pipeline operators (dedup / similarity / text analysis),
  * complementing the driver's DuckDB hash oracle. */
class PipelineOpsSpec extends SparkSpec {

  test("every pack query runs on sf0.001; oracles reference declared queries only") {
    // ALL packs via SparkEntry — the tiny fixture is where empty-group /
    // missing-key edge cases live, so every query must survive it, not
    // just the four packs this spec happens to focus on
    SparkEntry.packs.foreach { p =>
      assert(p.oracles.keySet.subsetOf(p.queries.keySet))
      p.queries.foreach { case (name, fn) =>
        assert(fn(spark, sf).count() >= 0, s"$name failed to run")
      }
    }
  }

  test("q26 latest-state emits exactly one row per user, at the max event time") {
    val df = StreamSemantics.queries("q26_latest_state")(spark, sf).cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() === users)
    val maxTs = Tables.events(spark, sf).groupBy("user_id").agg(max("ts").as("m"))
    assert(df.join(maxTs, "user_id").filter(col("ts") =!= col("m")).count() === 0)
  }

  test("q27 sessions partition each user's events; 30-min gap never occurs inside a session") {
    val df = StreamSemantics.queries("q27_sessionization")(spark, sf)
    val total = df.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    // a session's span ÷ (events-1) can exceed the gap only if... no:
    // within-session adjacent gaps are <= 30min, so span <= (n-1)*30min.
    val bad = df.filter(col("n_events") > 1 &&
      unix_micros(col("t_end")) - unix_micros(col("t_start")) >
        (col("n_events") - 1) * lit(1800L * 1000000L)).count()
    assert(bad === 0)
  }

  test("built-in session_window agrees with the manual gap sessionization (q27)") {
    val sw = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
    val manual = StreamSemantics.queries("q27_sessionization")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(sw.exceptAll(manual).count() === 0)
    assert(manual.exceptAll(sw).count() === 0)
  }

  test("q29 sliding windows double-count each event exactly twice") {
    val slid = StreamSemantics.queries("q29_sliding_window")(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(slid === 2 * Tables.events(spark, sf).count())
  }

  test("q32 HLL estimate lands within 5% of exact distinct") {
    val rows = StreamSemantics.queries("q32_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Boolean]("within_5pct"),
        s"HLL off by >5% for ${r.getAs[String]("event_type")}")
    }
  }

  test("q36 quality is bounded [0,1] and bands agree with the score") {
    val df = TextAnalysis.queries("q36_quality_score")(spark, sf).cache()
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
    assert(df.filter(col("band") === "high" && col("quality") < 0.8).count() === 0)
    assert(df.filter(col("band") === "low" && col("quality") >= 0.65).count() === 0)
  }

  test("q37 fingerprints: md5 differs from bag fingerprint only via token order") {
    val df = TextAnalysis.queries("q37_fingerprint")(spark, sf).cache()
    // bag_fp collisions can only merge docs with identical sorted tokens;
    // full-md5 is injective on this corpus (all texts distinct).
    assert(df.select("md5_full").distinct().count() === df.count())
  }

  test("q41 exact Jaccard finds the planted near-duplicates, q43 LSH recalls them") {
    val exact = Dedup.queries("q41_jaccard_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dup pairs")
    val lsh = Dedup.queries("q43_minhash_lsh")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH threshold (0.4) is looser than exact (0.5): every exact pair is a
    // candidate unless all 4 bands miss — allow <= 20% misses.
    val recalled = exact.count(lsh.contains)
    assert(recalled.toDouble / exact.size >= 0.8, s"LSH recall $recalled/${exact.size}")
  }

  test("q96 cluster-keyed split: zero near-dup pairs straddle; doc-keyed split straddles") {
    // the leakage-prevention claim, end-to-end: every q41 near-dup pair
    // must land in ONE split under the cluster-keyed assignment
    val splits = Dedup.clusterSplits(spark, sf).select("doc_id", "split").cache()
    val pairs = Dedup.queries("q41_jaccard_pairs")(spark, sf).select("a", "b").cache()
    assert(pairs.count() > 0, "corpus should contain near-dup pairs")
    def straddles(assign: org.apache.spark.sql.DataFrame): Long =
      pairs
        .join(assign.select(col("doc_id").as("a"), col("split").as("sa")), "a")
        .join(assign.select(col("doc_id").as("b"), col("split").as("sb")), "b")
        .filter(col("sa") =!= col("sb")).count()
    assert(straddles(splits) === 0, "a near-dup pair straddles the cluster-keyed split")
    // contrast: the q74 doc-keyed assignment hashes pair members
    // independently, so on this corpus at least one pair leaks — which is
    // exactly why the cluster-keyed form exists
    val docKeyed = Tables.documents(spark, sf)
      .withColumn("h", Tables.docIdPctBucket)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "validation").otherwise("test"))
      .select("doc_id", "split")
    assert(straddles(docKeyed) > 0,
      "doc-keyed split did not straddle any pair — the contrast is vacuous on this corpus")
  }

  test("q97 frequency score is a true corpus prior: bounds hold and rare text scores lower") {
    val scored = TextAnalysis.queries("q97_token_freq_score")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(scored.count() === docs.count(), "every document must be scored")
    // each token's global frequency is >= 1 and <= the corpus token count,
    // so n_tok <= sum_tf <= n_tok * totalTokens
    val totalTokens = scored.agg(sum("n_tok")).head().getLong(0)
    val bad = scored.filter(col("sum_tf") < col("n_tok") ||
      col("sum_tf") > col("n_tok") * totalTokens).count()
    assert(bad === 0, "a frequency sum escaped its arithmetic bounds")
    // a doc of globally-unique tokens would score exactly 1.0; the real
    // corpus reuses its vocabulary heavily, so every score must exceed it
    assert(scored.filter(col("freq_score") <= 1.0).count() === 0,
      "corpus docs scored like unique-token noise")
  }

  test("q44 simhash is a 32-bit value; near-identical docs have small hamming distance") {
    val sh = Dedup.queries("q44_simhash")(spark, sf).cache()
    assert(sh.filter(col("simhash") < 0 || col("simhash") > (1L << 32) - 1).count() === 0)
    val byDoc = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.queries("q41_jaccard_pairs")(spark, sf)
      .filter(col("jaccard") >= 0.7).select("a", "b").collect()
    exact.foreach { r =>
      val h = java.lang.Long.bitCount(byDoc(r.getLong(0)) ^ byDoc(r.getLong(1)))
      assert(h <= 12, s"high-Jaccard pair ${r.getLong(0)},${r.getLong(1)} hamming $h")
    }
  }

  test("q46 brute-force top-k: 5 ranked neighbors per query, cosine in [-1,1], descending") {
    val df = Similarity.queries("q46_cosine_topk")(spark, sf).cache()
    val perQ = df.groupBy("qid").agg(count(lit(1)).as("n"), max("rn").as("mr"))
    assert(perQ.filter(col("n") =!= 5 || col("mr") =!= 5).count() === 0)
    assert(df.filter(col("cosine") < -1 || col("cosine") > 1).count() === 0)
    val nonMono = df.withColumn("prev", lag("cosine", 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy("rn")))
      .filter(col("prev") < col("cosine")).count()
    assert(nonMono === 0)
  }

  test("q47 LSH ANN never beats brute force: its top-1 <= exact top-1 per query") {
    val bf = Similarity.queries("q46_cosine_topk")(spark, sf)
      .filter(col("rn") === 1).select(col("qid"), col("cosine").as("best"))
    val ann = Similarity.queries("q47_ann_lsh")(spark, sf)
      .filter(col("rn") === 1).select(col("qid"), col("cosine").as("approx"))
    assert(ann.join(bf, "qid").filter(col("approx") > col("best")).count() === 0)
  }

  test("q48 label-centroid cosine is bounded and covers every vector") {
    val df = Similarity.queries("q48_label_centroid")(spark, sf).cache()
    assert(df.count() === Tables.embeddings(spark, sf).count())
    assert(df.filter(col("cos_centroid") < -1 || col("cos_centroid") > 1).count() === 0)
  }
  test("q124 conversion latency: counts and max re-derive exactly; quartiles ordered") {
    val r = StreamSemantics.queries("q124_conversion_latency")(spark, sf).head()
    // independent re-derivation at per-user grain from the raw events
    val gaps = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .groupBy(_.getAs[Long]("user_id")).flatMap { case (_, rows) =>
        def first(t: String) = rows.filter(_.getAs[String]("event_type") == t)
          .map(_.getAs[java.sql.Timestamp]("ts")).sortBy(x => (x.getTime, x.getNanos)).headOption
        def micros(t: java.sql.Timestamp) =
          t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        // floor of the DIFFERENCE, as the query's div computes — not a
        // per-timestamp floor, which disagrees when fractional parts differ
        for (v <- first("view"); b <- first("purchase") if !b.before(v))
          yield (micros(b) - micros(v)) / 1000000L
      }.toSeq
    assert(r.getAs[Long]("n_converted") === gaps.size.toLong)
    assert(r.getAs[Long]("max_s") === gaps.max)
    val (p25, p50, p75) = (r.getAs[Double]("p25_s"), r.getAs[Double]("p50_s"), r.getAs[Double]("p75_s"))
    assert(p25 <= p50 && p50 <= p75 && p75 <= gaps.max.toDouble)
    assert(gaps.min.toDouble <= p25)
  }

  test("q125 dow drift: L1 re-derives exactly from (type, dow) counts; bounds hold") {
    val rows = StreamSemantics.queries("q125_dow_seasonality")(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.events(spark, sf)
      .select(col("event_type"),
        ((floor(unix_timestamp(col("ts")) / 86400).cast("long") + 4) % 7).as("dow"))
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")))
      .view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val nt = r.getAs[Long]("n_events")
      val want = (0L to 6L).map(d => math.abs(7L * counts.getOrElse((et, d), 0L) - nt)).sum
      assert(r.getAs[Long]("dow_l1x7") === want, et)
      assert(want >= 0L && want <= 12L * nt, s"$et outside [0, 12*n] bound")
    }
  }

  test("q126 k-means: planted well-separated anchors yield pure clusters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-km").toString
    // seeds are vec_id < 8; make each seed an anchor on its own axis and
    // park 3 satellites a tiny step away — after 2 Lloyd iterations every
    // satellite must sit in its anchor's cluster
    def anchor(j: Int, bump: Int): Array[Float] =
      Array.tabulate(64)(i =>
        if (i == j) 0.3f else if (bump >= 0 && i == bump) 0.02f else 0.0f)
    val rows =
      (0 until 8).map(j => (j.toLong, anchor(j, -1), j)) ++
        (for { j <- 0 until 8; t <- 0 until 3 }
          yield ((100 + 10 * j + t).toLong, anchor(j, 8 + j), j))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q126_kmeans_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(got.size === 32)
    (0 until 8).foreach { j =>
      assert(got(j.toLong) === j.toLong, s"seed $j left its own cluster")
      (0 until 3).foreach(t =>
        assert(got((100 + 10 * j + t).toLong) === j.toLong, s"satellite of $j strayed"))
    }
  }

  test("q126 k-means assignment re-derives exactly from a driver-side integer Lloyd run") {
    import graft.functions.HashOps.roundHalfAway
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .filter(_.getSeq[Float](1).exists(_ != 0.0f)) // vecBase's zero-norm exclusion
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(x => roundHalfAway(x.toDouble * 1000000L))
        r.getAs[Long]("vec_id") -> v
      }.sortBy(_._1)
    def dist2(u: Array[Long], c: Array[Long]): Long =
      u.indices.map { k => val d = u(k) - c(k); d * d }.sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      vecs.map { case (id, u) =>
        val (cid, d2) = cents.map { case (c, cv) => (c, dist2(u, cv)) }
          .minBy { case (c, d) => (d, c) }
        id -> (cid, d2)
      }.toMap
    val seeds = vecs.filter(_._1 < 8).map { case (id, v) => (id, v) }.toSeq
    val a1 = assign(seeds)
    val c1 = a1.groupBy(_._2._1).toSeq.map { case (cid, members) =>
      val vs = members.keys.toSeq.sorted.map(id => vecs.find(_._1 == id).get._2)
      cid -> Array.tabulate(64)(k => vs.map(_(k)).sum / vs.size) // Long div: trunc toward 0, = Spark `div`
    }
    val a2 = assign(c1)
    val got = Similarity.queries("q126_kmeans_clusters")(spark, sf).collect()
    assert(got.length === vecs.length)
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert((r.getAs[Long]("cluster"), r.getAs[Long]("dist2")) === a2(id), s"vec $id")
    }
  }

  test("q127 semdedup: planted near-twins are dropped, their lowest-id anchor kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sdd").toString
    // same anchor geometry as the q126 planted fixture: satellites differ
    // from their anchor by one tiny off-axis bump, so cos(anchor, sat) ≈ 1
    // (≥ 2/5) while cross-cluster cosines are ≈ 0 (< 2/5). Keep-lowest-id
    // ⇒ each anchor (id j < 8) survives; every satellite is dropped.
    def anchor(j: Int, bump: Int): Array[Float] =
      Array.tabulate(64)(i =>
        if (i == j) 0.3f else if (bump >= 0 && i == bump) 0.02f else 0.0f)
    val rows =
      (0 until 8).map(j => (j.toLong, anchor(j, -1), j)) ++
        (for { j <- 0 until 8; t <- 0 until 3 }
          yield ((100 + 10 * j + t).toLong, anchor(j, 8 + j), j))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q127_semdedup_prune")(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("kept")).toMap
    assert(got.size === 32)
    (0 until 8).foreach { j =>
      assert(got(j.toLong) === 1L, s"anchor $j should be kept")
      (0 until 3).foreach(t =>
        assert(got((100 + 10 * j + t).toLong) === 0L, s"satellite of $j should drop"))
    }
  }

  test("q127 semdedup kept set re-derives exactly from the driver-side rule (BigInt)") {
    import graft.functions.HashOps.roundHalfAway
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .filter(_.getSeq[Float](1).exists(_ != 0.0f))
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(x => roundHalfAway(x.toDouble * 1000000L))
        r.getAs[Long]("vec_id") -> v
      }.sortBy(_._1)
    // re-run the 2-iteration integer Lloyd (proven ≡ engine in the q126
    // spec above), then apply the keep-lowest-id cosine ≥ 2/5 rule with
    // BigInt cross-multiplication — no precision shortcut anywhere.
    def dist2(u: Array[Long], c: Array[Long]): Long =
      u.indices.map { k => val d = u(k) - c(k); d * d }.sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, Long] =
      vecs.map { case (id, u) =>
        id -> cents.map { case (c, cv) => (c, dist2(u, cv)) }
          .minBy { case (c, d) => (d, c) }._1
      }.toMap
    val a1 = assign(vecs.filter(_._1 < 8).toSeq)
    val c1 = a1.groupBy(_._2).toSeq.map { case (cid, members) =>
      val vs = members.keys.toSeq.sorted.map(id => vecs.find(_._1 == id).get._2)
      cid -> Array.tabulate(64)(k => vs.map(_(k)).sum / vs.size)
    }
    val a2 = assign(c1)
    def dot(u: Array[Long], v: Array[Long]): Long =
      u.indices.map(k => u(k) * v(k)).sum
    val byId = vecs.toMap
    val dropped = (for {
      (b, ub) <- vecs
      (a, ua) <- vecs if a < b && a2(a) == a2(b)
      d = dot(ua, ub)
      if d > 0 &&
        BigInt(d) * BigInt(d) * 25 >= BigInt(dot(ua, ua)) * BigInt(dot(ub, ub)) * 4
    } yield b).toSet
    val got = Similarity.queries("q127_semdedup_prune")(spark, sf).collect()
    assert(got.length === vecs.length)
    assert(byId.size === vecs.length) // ids unique; byId safe
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val wantKept = if (dropped(id)) 0L else 1L
      assert(r.getAs[Long]("kept") === wantKept, s"vec $id")
      assert(r.getAs[Long]("cluster") === a2(id), s"vec $id cluster")
    }
  }

  test("q128 dsir: docs made of target-domain tokens outrank off-domain docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    // 'good' appears only in en (target) docs → λ = (21·1e6)//21 = 1e6;
    // 'bad' appears only in de docs → λ = 1e6//21 = 47619. Every en doc
    // must outscore every de doc; scores are exactly 4λ.
    val rows =
      (0 until 5).map(i => (i.toLong, "good good good good", "en", s"src$i", 19L)) ++
        (5 until 10).map(i => (i.toLong, "bad bad bad bad", "de", s"src$i", 15L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q128_dsir_weights")(spark, dir).collect()
    assert(got.length === 10)
    val scores = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_score")).toMap
    (0 until 5).foreach(i => assert(scores(i.toLong) === 4L * 1000000L, s"en doc $i"))
    (5 until 10).foreach(i => assert(scores(i.toLong) === 4L * 47619L, s"de doc $i"))
    // ranked: the five en docs occupy the first five rows, in doc_id order
    assert(got.take(5).map(_.getAs[Long]("doc_id")).toSeq === (0L until 5L).toSeq)
  }

  test("q128 dsir scores re-derive exactly from a driver-side hashed-unigram run") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").split(" ", -1)))
    def bkt(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024L
    }
    val all = docs.flatMap { case (id, lang, ts) => ts.map(t => (id, lang, bkt(t))) }
    val lw = all.groupBy(_._3).map { case (b, xs) =>
      val c = xs.length.toLong
      val t = xs.count(_._2 == "en").toLong
      b -> ((t + 1L) * 1000000L) / (c + 1L)
    }
    val want = all.groupBy(_._1).map { case (id, xs) =>
      (id, xs.length.toLong, xs.map(x => lw(x._3)).sum)
    }.toSeq.sortBy { case (id, _, sc) => (-sc, id) }.take(20)
    val got = CurationOps.queries("q128_dsir_weights")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dsir_score"))).toSeq
    assert(got === want)
  }

  test("q129 sq-ann: well-separated anchors survive 8-bit quantization with recall 5/5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    // probe is vec_id 0 (anchor on axis 0); its 5 nearest are satellites
    // 301..305 (anchor + tiny distinct bumps; ids NOT ≡ 0 mod 100, so the
    // probe set is exactly {0}), everything else sits on other axes.
    // Separation ≫ quantization step ⇒ quantized and exact top-5 must
    // agree exactly.
    def v(axis: Int, bump: Int, mag: Float): Array[Float] =
      Array.tabulate(64)(i =>
        if (i == axis) 0.4f else if (bump >= 0 && i == bump) mag else 0.0f)
    val rows =
      Seq((0L, v(0, -1, 0f), 0)) ++
        (0 until 5).map(t => ((301 + t).toLong, v(0, 10 + t, 0.02f), 0)) ++
        (1 until 8).map(j => ((200 + j).toLong, v(j, -1, 0f), j))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q129_sq_ann_recall")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("qid") === 0L)
    assert(r.getAs[Long]("n_hits") === 5L)
    val wantSum = (301L to 305L).sum
    assert(r.getAs[Long]("exact_ids_sum") === wantSum)
    assert(r.getAs[Long]("quant_ids_sum") === wantSum)
  }

  test("q129 sq-ann recall re-derives exactly from a driver-side quantization run") {
    import graft.functions.HashOps.roundHalfAway
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .filter(_.getSeq[Float](1).exists(_ != 0.0f))
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(x => roundHalfAway(x.toDouble * 1000000L))
        r.getAs[Long]("vec_id") -> v
      }.sortBy(_._1)
    val mn = Array.tabulate(64)(k => vecs.map(_._2(k)).min)
    val rng = Array.tabulate(64)(k => math.max(vecs.map(_._2(k)).max - mn(k), 1L))
    val codes = vecs.map { case (id, u) =>
      id -> Array.tabulate(64)(k => ((u(k) - mn(k)) * 255L) / rng(k))
    }.toMap
    val byId = vecs.toMap
    def d2(u: Array[Long], v: Array[Long]): Long =
      u.indices.map { k => val d = u(k) - v(k); d * d }.sum
    def top5(qid: Long, f: Long => Array[Long]): Seq[Long] =
      vecs.map(_._1).filter(_ != qid)
        .sortBy(id => (d2(f(qid), f(id)), id)).take(5)
    val want = vecs.map(_._1).filter(_ % 100 == 0).map { qid =>
      val te = top5(qid, byId)
      val tq = top5(qid, codes)
      (qid, te.toSet.intersect(tq.toSet).size.toLong, te.sum, tq.sum)
    }
    val got = Similarity.queries("q129_sq_ann_recall")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("exact_ids_sum"), r.getAs[Long]("quant_ids_sum"))).toSeq
    assert(got === want)
  }

  test("q164 matryoshka: a tail-dim impostor fools the truncated arm, recall drops to 4/5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    // probe 0 = anchor on axis 0; true neighbors 301..305 bump dims
    // 10..14 (inside the 16-dim prefix) → near in BOTH arms. Impostor
    // 401 matches the probe's first 16 dims EXACTLY but carries a large
    // tail component (dim 40) → truncated distance 0 (rank 1 in the
    // prefix arm) while the exact arm ranks it out of the top-5. The
    // audit must report the 4-of-5 overlap, not paper over it.
    def v(axis: Int, bump: Int, mag: Float): Array[Float] =
      Array.tabulate(64)(i =>
        if (i == axis) 0.4f else if (bump >= 0 && i == bump) mag else 0.0f)
    val rows =
      Seq((0L, v(0, -1, 0f), 0), (401L, v(0, 40, 0.3f), 0)) ++
        (0 until 5).map(t => ((301 + t).toLong, v(0, 10 + t, 0.02f), 0)) ++
        (1 until 8).map(j => ((200 + j).toLong, v(j, -1, 0f), j))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q164_matryoshka_recall")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("qid") === 0L)
    assert(r.getAs[Long]("n_hits") === 4L)
    assert(r.getAs[Long]("exact_ids_sum") === (301L to 305L).sum)
    // truncated top-5: impostor 401 + the first four tied true neighbors
    assert(r.getAs[Long]("trunc_ids_sum") === 401L + (301L to 304L).sum)
  }

  test("q164 matryoshka recall re-derives exactly from a driver-side prefix-dim run") {
    import graft.functions.HashOps.roundHalfAway
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .filter(_.getSeq[Float](1).exists(_ != 0.0f))
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(x => roundHalfAway(x.toDouble * 1000000L))
        r.getAs[Long]("vec_id") -> v
      }.sortBy(_._1)
    val byId = vecs.toMap
    def d2(u: Array[Long], v: Array[Long]): Long =
      u.indices.map { k => val d = u(k) - v(k); d * d }.sum
    def top5(qid: Long, f: Long => Array[Long]): Seq[Long] =
      vecs.map(_._1).filter(_ != qid)
        .sortBy(id => (d2(f(qid), f(id)), id)).take(5)
    val want = vecs.map(_._1).filter(_ % 100 == 0).map { qid =>
      val te = top5(qid, byId)
      val tt = top5(qid, id => byId(id).take(16))
      (qid, te.toSet.intersect(tt.toSet).size.toLong, te.sum, tt.sum)
    }
    val got = Similarity.queries("q164_matryoshka_recall")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("exact_ids_sum"), r.getAs[Long]("trunc_ids_sum"))).toSeq
    assert(got === want)
  }

  /** The q130 integer PageRank, driver-side: same scaled-integer formulas,
    * same truncating division, over an explicit edge list. */
  private def pagerankRef(trans: Seq[(String, String)]): Map[String, Long] = {
    val nodes = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val n = nodes.size.toLong
    val ew = trans.groupBy(identity).map { case (e, xs) => e -> xs.size.toLong }
    val wout = ew.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    val p = ew.map { case ((s, t), w) => (s, t) -> (w * 1000000L) / wout(s) }
    def iter(r: Map[String, Long]): Map[String, Long] = {
      val contrib = p.toSeq.map { case ((s, t), pv) => t -> (r(s) * pv) / 1000000L }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      nodes.map { v =>
        v -> ((15L * (1000000000000L / n)) / 100L +
          (85L * contrib.getOrElse(v, 0L)) / 100L)
      }.toMap
    }
    val r0 = nodes.map(_ -> 1000000000000L / n).toMap
    iter(iter(r0))
  }

  test("q130 pagerank: planted A<->B chain with a C leak ranks A > B > C") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pr").toString
    // one user: A B A B A C → edges A→B ×2, B→A ×2, A→C ×1. All of B's
    // mass returns to A, only 2/3 of A's goes to B, C only leaks.
    val seq = Seq("A", "B", "A", "B", "A", "C")
    val rows = seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), 1L, t, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q130_journey_pagerank")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("rank")).toMap
    val want = pagerankRef(Seq("A" -> "B", "A" -> "B", "B" -> "A", "B" -> "A", "A" -> "C"))
    assert(got === want)
    assert(got("A") > got("B") && got("B") > got("C"))
  }

  test("q130 pagerank re-derives exactly from a driver-side integer power iteration") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val want = pagerankRef(trans.toSeq)
    val got = StreamSemantics.queries("q130_journey_pagerank")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("rank")).toMap
    assert(got === want)
  }

  test("q131 rrf: a doc leading both arms fuses first; rrf re-derives from the ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    // doc 5 dominates the lexical arm (only doc with all three query
    // terms, repeated) AND the semantic arm (vec 5 parallel to the vec-0
    // probe); everything else is filler / orthogonal axes.
    val docs = Seq(
      (0L, "filler alpha beta", "en", "src0", 17L),
      (1L, "filler gamma delta", "en", "src1", 18L),
      (2L, "key filler", "en", "src2", 10L),
      (3L, "table filler", "en", "src3", 12L),
      (4L, "row filler", "en", "src4", 10L),
      (5L, "key table row key table row", "en", "src5", 27L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def axis(j: Int): Array[Float] = Array.tabulate(64)(i => if (i == j) 0.3f else 0f)
    val vecs = Seq((0L, axis(0), 0), (1L, axis(10), 1), (2L, axis(11), 2),
      (3L, axis(12), 3), (4L, axis(13), 4), (5L, axis(0), 5))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q131_rrf_fusion")(spark, dir).collect()
    assert(got.nonEmpty)
    val head = got.head
    assert(head.getAs[Long]("doc_id") === 5L)
    assert(head.getAs[Long]("lex_rank") === 1L)
    assert(head.getAs[Long]("sem_rank") === 1L)
    // rrf is pure integer arithmetic over the two ranks — recheck each row
    got.foreach { r =>
      val (lr, sr) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))
      val want = (if (lr > 0) 1000000000000L / (60 + lr) else 0L) +
        (if (sr > 0) 1000000000000L / (60 + sr) else 0L)
      assert(r.getAs[Long]("rrf") === want, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // fused order is total: (rrf desc, doc_id)
    val key = got.map(r => (-r.getAs[Long]("rrf"), r.getAs[Long]("doc_id"))).toSeq
    assert(key === key.sorted)
  }

  test("q133 systematic resample: planted weights yield hand-computed copy counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rs").toString
    // all-en corpus ⇒ every bucket's λ = 1e6, so w(doc) = n_tokens·1e6.
    // Tokens 6,2,2,2 ⇒ cum grid (×1e6): 6, 8, 10, 12; n = 100 copies ⇒
    // copies = 50, 16, 17, 17 (⌊C_i·100/12⌋ differences), summing to 100.
    val docs = Seq(
      (0L, "a b c d e f", "en", "src0", 11L),
      (1L, "g h", "en", "src1", 3L),
      (2L, "i j", "en", "src2", 3L),
      (3L, "k l", "en", "src3", 3L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q133_dsir_resample")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Long]("n_copies")))
    assert(got.toSeq === Seq((0L, 6000000L, 50L), (1L, 2000000L, 16L),
      (2L, 2000000L, 17L), (3L, 2000000L, 17L)))
  }

  test("q133 resample re-derives exactly driver-side; copies conserve to exactly 100") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").split(" ", -1)))
    def bkt(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024L
    }
    val all = docs.flatMap { case (id, lang, ts) => ts.map(t => (id, lang, bkt(t))) }
    val lw = all.groupBy(_._3).map { case (b, xs) =>
      b -> ((xs.count(_._2 == "en").toLong + 1L) * 1000000L) / (xs.length.toLong + 1L)
    }
    val wById = all.groupBy(_._1).map { case (id, xs) => id -> xs.map(x => lw(x._3)).sum }
    val ordered = wById.toSeq.sortBy(_._1)
    val total = ordered.map(_._2).sum
    var ce = 0L
    val want = ordered.flatMap { case (id, w) =>
      val copies = ((ce + w) * 100L) / total - (ce * 100L) / total
      ce += w
      if (copies >= 1) Some((id, w, copies)) else None
    }
    assert(want.map(_._3).sum === 100L, "systematic resampling must emit exactly n copies")
    val got = CurationOps.queries("q133_dsir_resample")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("w"), r.getAs[Long]("n_copies"))).toSeq
    assert(got === want)
    assert(got.map(_._3).sum === 100L)
  }

  test("q128/q133 λ-weight formula survives the DECIMAL(38) cast the 100 TB note promises") {
    // the SCALE.md claim: past ~1e12 target tokens per bucket, the 1e6
    // scaling outgrows Long and the same formula runs with DECIMAL(38)
    // sums. Execute it: counts near the overflow edge, Spark DECIMAL vs
    // BigInt reference. (tcnt+1)*1e6 at tcnt = 4e12 ≈ 4e18 — representable
    // in Long but one order from wrapping; DECIMAL must agree exactly there
    // AND at 1e13 where Long multiplication would already have wrapped.
    import spark.implicits._
    val rows = Seq((0L, 4000000000000L, 9000000000000L),
      (1L, 9999999999999L, 12345678901234L),
      (2L, 7L, 9L))
    val got = rows.toDF("bkt", "tcnt", "ccnt")
      .withColumn("lw",
        expr("CAST((CAST(tcnt AS DECIMAL(38,0)) + 1) * 1000000 AS DECIMAL(38,0)) div (ccnt + 1)"))
      .collect().map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("lw")).toMap
    rows.foreach { case (b, t, c) =>
      val want = ((BigInt(t) + 1) * 1000000 / (BigInt(c) + 1)).toLong
      assert(got(b) === want, s"bucket $b")
    }
  }

  test("q132 bpe pairs: planted corpus yields hand-counted merge candidates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // "abab" → ab×2, ba×1; "abc" → ab, bc; "x y" → no within-word pair;
    // "z" → filtered by length. Expected counts: ab=3(df2), ba=1, bc=1.
    val docs = Seq(
      (0L, "abab", "en", "src0", 4L),
      (1L, "abc", "en", "src1", 3L),
      (2L, "x y", "en", "src2", 3L),
      (3L, "z", "en", "src3", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("q132_bpe_merge_pairs")(spark, dir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"), r.getAs[Long]("df")))
    assert(got.toSeq === Seq(("ab", 3L, 2L), ("ba", 1L, 1L), ("bc", 1L, 1L)))
  }

  test("q132 bpe pairs re-derive exactly from a driver-side sliding-window count") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val pairs = texts.flatMap { case (id, t) =>
      if (t.length < 2) Seq.empty
      else t.toSeq.sliding(2).map(s => (id, s.mkString)).toSeq
    }.filter(!_._2.contains(" "))
    val want = pairs.groupBy(_._2).map { case (p, xs) =>
      (p, xs.length.toLong, xs.map(_._1).distinct.length.toLong)
    }.toSeq.sortBy { case (p, n, _) => (-n, p) }.take(32)
    val got = TextAnalysis.queries("q132_bpe_merge_pairs")(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"), r.getAs[Long]("df"))).toSeq
    assert(got === want)
  }

  test("q134 zone-map audit re-derives exactly; z-order out-skips arrival in both dims") {
    // exact re-derivation at BOTH scale factors; the strict layout
    // inequality is asserted at sf0.01, where the key domains are fully
    // populated (at sf0.001 the narrow user domain lets arrival files
    // tie z-order on u — both still re-derive exactly there)
    def auditAt(dir: String): Map[(String, String), Long] = {
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "value").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[Double]("value")))
      val rows = ev.map { case (id, u, v) =>
        val ux = ((u % 256) + 256) % 256
        val vb = math.floor(math.abs(v)).toLong % 256
        val zkey = (0 until 8).map(i =>
          (((ux >> i) & 1L) << (2 * i)) + (((vb >> i) & 1L) << (2 * i + 1))).sum
        (id, ux, vb, zkey)
      }
      val mid = rows.map(_._1).max
      val wa = mid / 16 + 1
      def zones(fileOf: ((Long, Long, Long, Long)) => Long) =
        rows.groupBy(fileOf).map { case (_, xs) =>
          (xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).min, xs.map(_._3).max)
        }.toSeq
      val preds = (0 until 16).map(p => (p * 16L, p * 16L + 15L))
      def audit(zs: Seq[(Long, Long, Long, Long)], useU: Boolean): (Long, Long, Long) = {
        val skips = (for {
          (umin, umax, vmin, vmax) <- zs
          (lo, hi) <- preds
          (mn, mx) = if (useU) (umin, umax) else (vmin, vmax)
        } yield if (mx < lo || mn > hi) 1L else 0L)
        val n = skips.size.toLong
        (n, skips.sum, skips.sum * 100 / n)
      }
      val za = zones(t => t._1 / wa)
      val zz = zones(t => t._4 / 4096)
      val want = Seq(
        ("arrival", "u", audit(za, useU = true)), ("arrival", "v", audit(za, useU = false)),
        ("zorder", "u", audit(zz, useU = true)), ("zorder", "v", audit(zz, useU = false)))
        .map { case (l, dim, (n, s, p)) => (l, dim, n, s, p) }
      val got = ScaleOps.queries("q134_zonemap_audit")(spark, dir).collect()
        .map(r => (r.getAs[String]("layout"), r.getAs[String]("dim"),
          r.getAs[Long]("n_cells"), r.getAs[Long]("n_skipped"),
          r.getAs[Long]("skip_pct"))).toSeq
      assert(got === want, s"re-derivation mismatch at $dir")
      got.map(r => (r._1, r._2) -> r._5).toMap
    }
    auditAt(sf)
    val pct = auditAt("/root/testdata/sf0.01")
    assert(pct(("zorder", "u")) > pct(("arrival", "u")),
      "z-order must out-skip arrival on u")
    assert(pct(("zorder", "v")) > pct(("arrival", "v")),
      "z-order must out-skip arrival on v")
  }

  test("q131 rrf on the sf fixture: ranks in [0,20], rrf arithmetic exact, ≤10 rows") {
    val got = Similarity.queries("q131_rrf_fusion")(spark, sf).collect()
    assert(got.length <= 10 && got.nonEmpty)
    got.foreach { r =>
      val (lr, sr) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))
      assert(lr >= 0 && lr <= 20 && sr >= 0 && sr <= 20)
      assert(lr > 0 || sr > 0)
      val want = (if (lr > 0) 1000000000000L / (60 + lr) else 0L) +
        (if (sr > 0) 1000000000000L / (60 + sr) else 0L)
      assert(r.getAs[Long]("rrf") === want)
    }
  }

  test("q135 template strip: planted boilerplate prefix removed, clean sources untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tmpl").toString
    // srcA: 3 of 4 docs open with the template "breaking news" (doc 6 IS
    // the bare template — strips to empty); srcB: all prefixes unique →
    // modal count 1 < 2 → nothing stripped.
    val docs = Seq(
      (0L, "breaking news market up today", "en", "srcA", 28L),
      (2L, "breaking news rain expected", "en", "srcA", 27L),
      (4L, "local note nothing happened", "en", "srcA", 27L),
      (6L, "breaking news", "en", "srcA", 13L),
      (1L, "alpha beta gamma", "en", "srcB", 16L),
      (3L, "delta epsilon zeta", "en", "srcB", 18L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("q135_template_strip")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stripped"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))
    assert(got.toSeq === Seq(
      (0L, 1L, 14L, "market up today"),
      (1L, 0L, 0L, "alpha beta gamma"),
      (2L, 1L, 14L, "rain expected"),
      (3L, 0L, 0L, "delta epsilon zeta"),
      (4L, 0L, 0L, "local note nothing happened"),
      (6L, 1L, 13L, "")))
  }

  test("q135 template strip re-derives exactly from a driver-side modal-prefix pass") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    def pfx(t: String) = t.split(" ", -1).take(2).mkString(" ")
    val modal: Map[String, Option[String]] = docs.groupBy(_._2).map { case (s, xs) =>
      val hist = xs.groupBy(x => pfx(x._3)).map { case (p, ys) => (p, ys.length) }
      val (bp, bc) = hist.toSeq.minBy { case (p, c) => (-c, p) }
      s -> (if (bc >= 2) Some(bp) else None)
    }
    val want = docs.sortBy(_._1).map { case (id, s, t) =>
      val hit = modal(s).contains(pfx(t))
      val clean = if (hit) t.drop(modal(s).get.length + 1) else t
      (id, if (hit) 1L else 0L, (t.length - clean.length).toLong, clean)
    }.toSeq
    val got = TextAnalysis.queries("q135_template_strip")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stripped"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toSeq
    assert(got === want)
  }

  test("q136 vocab growth re-derives exactly; curve conserves totals and is monotone") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val maxId = docs.map(_._1).max
    def decile(id: Long) = math.min(9L, id * 10 / (maxId + 1))
    val toks = docs.flatMap { case (id, t) => t.split(" ", -1).map(decile(id) -> _) }
    val nDocs = docs.groupBy(x => decile(x._1)).map { case (b, xs) => b -> xs.length.toLong }
    val nToks = toks.groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val newV = toks.groupBy(_._2).map { case (_, xs) => xs.map(_._1).min }
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val bs = nDocs.keys.toSeq.sorted
    var (ct, cv) = (0L, 0L)
    val want = bs.map { b =>
      ct += nToks(b); cv += newV.getOrElse(b, 0L)
      (b, nDocs(b), nToks(b), newV.getOrElse(b, 0L), ct, cv)
    }
    val got = TextAnalysis.queries("q136_vocab_growth")(spark, sf).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("new_vocab"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("cum_vocab"))).toSeq
    assert(got === want)
    assert(got.last._5 === toks.length.toLong, "cum_tokens must end at the corpus token count")
    assert(got.last._6 === toks.map(_._2).distinct.length.toLong,
      "cum_vocab must end at the corpus type count")
  }

  test("q137 mix schedule: planted two-source corpus interleaves by stride keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mix").toString
    // srcA: 4 docs → keys 250000/500000/750000/1000000; srcB: 2 docs →
    // 500000/1000000. Order by (k, source, doc_id).
    val docs = Seq(
      (0L, "t", "en", "srcA", 1L), (2L, "t", "en", "srcA", 1L),
      (4L, "t", "en", "srcA", 1L), (6L, "t", "en", "srcA", 1L),
      (1L, "t", "en", "srcB", 1L), (3L, "t", "en", "srcB", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q137_mix_schedule")(spark, dir).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("k")))
    assert(got.toSeq === Seq(
      (1L, 0L, "srcA", 250000L),
      (2L, 2L, "srcA", 500000L),
      (3L, 1L, "srcB", 500000L),
      (4L, 4L, "srcA", 750000L),
      (5L, 6L, "srcA", 1000000L),
      (6L, 3L, "srcB", 1000000L)))
  }

  /** Driver-side replica of the q46/q153/q154 probe-pair frame:
    * (qid, qlabel, vec_id, label, cosine) with vecBase's zero-norm filter,
    * element-order folds, and Spark's HALF_UP 6-digit round. */
  private def probePairs(dir: String): Seq[(Long, String, Long, String, Double)] = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getAs[Long]("vec_id"), String.valueOf(r.getAs[Any]("label")),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
      .map { case (id, lb, v) => (id, lb, v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))) }
      .filter(_._4 > 0d)
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    for {
      (qid, ql, qv, qn) <- vecs.toSeq if qid % 100 == 0
      (id, lb, v, nr) <- vecs if id != qid
    } yield (qid, ql, id, lb,
      round6(qv.zip(v).foldLeft(0.0)((a, p) => a + p._1 * p._2) / (qn * nr)))
  }

  test("q153 score calibration: planted separable labels produce the expected curve") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-calib").toString
    def vec(x: Double, y: Double) = Array.tabulate(64)(i =>
      if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0f)
    // probe 0 (label a) against: a near-twin (a), an orthogonal (b), an
    // antipode (a), and a mid-angle (b) — buckets 10, 0, −10, and ~7
    val rows = Seq(
      (0L, vec(1, 0), "a"), (1L, vec(1, 0), "a"), (2L, vec(0, 1), "b"),
      (3L, vec(-1, 0), "a"), (4L, vec(0.75, 0.661437), "b"))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = probePairs(dir)
    val want = pairs.groupBy(p => math.floor(p._5 * 10).toLong).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        val same = xs.count(p => p._2 == p._4).toLong
        (b, xs.length.toLong, same, same * 10000 / xs.length)
      }
    val got = Similarity.queries("q153_score_calibration")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_same_label"), r.getAs[Long]("precision_bp"))).toSeq
    assert(got === want)
    assert(got.map(_._1).contains(10L) && got.map(_._1).contains(-10L),
      "identical and antipodal pairs must land in the extreme buckets")
  }

  test("q153 score calibration re-derives exactly at fixture scale; curve rises with cosine") {
    val pairs = probePairs(sf)
    val want = pairs.groupBy(p => math.floor(p._5 * 10).toLong).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        val same = xs.count(p => p._2 == p._4).toLong
        (b, xs.length.toLong, same, same * 10000 / xs.length)
      }
    val got = Similarity.queries("q153_score_calibration")(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_same_label"), r.getAs[Long]("precision_bp"))).toSeq
    assert(got === want)
  }

  test("q154 hubness re-derives exactly; hub counts never exceed the probe count") {
    val pairs = probePairs(sf)
    val top5 = pairs.groupBy(_._1).values.toSeq.flatMap { xs =>
      xs.sortBy(p => (-p._5, p._3)).take(5)
    }
    val nProbes = pairs.map(_._1).distinct.length.toLong
    val want = top5.groupBy(p => (p._3, p._4)).toSeq
      .map { case ((id, lb), xs) => (id, lb, xs.length.toLong) }
      .sortBy { case (id, _, c) => (-c, id) }.take(20)
    val got = Similarity.queries("q154_hubness_audit")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), String.valueOf(r.getAs[Any]("label")),
        r.getAs[Long]("hub_count"))).toSeq
    assert(got === want)
    got.foreach { case (id, _, c) =>
      assert(c <= nProbes, s"vector $id in more top-5 lists than there are probes") }
  }

  test("q155 weighted percentiles: a giant doc carries the mass where row-median would not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wpct").toString
    // lengths 10/10/100: the ROW median is 10, but 100 of the 120 chars
    // live in the giant doc, so every mass percentile ≥ 25% sits at 100
    Seq((0L, "t", "en", "srcA", 10L), (1L, "t", "en", "srcA", 10L),
      (2L, "t", "en", "srcA", 100L),
      (3L, "t", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q155_weighted_percentiles")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("wp25_chars"),
        r.getAs[Long]("wp50_chars"), r.getAs[Long]("wp75_chars")))
    assert(got.toSeq === Seq(("srcA", 100L, 100L, 100L), ("srcB", 7L, 7L, 7L)))
  }

  test("q155 weighted percentiles re-derive exactly and are ordered") {
    val bySrc = Tables.documents(spark, sf).select("source", "n_chars").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_chars"))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted.toSeq }
    val want = bySrc.toSeq.sortBy(_._1).map { case (src, lens) =>
      val total = lens.sum
      def wp(num: Long, den: Long): Long = {
        var cum = 0L
        lens.find { l => cum += l; cum * den >= total * num }.get
      }
      (src, wp(1, 4), wp(1, 2), wp(3, 4))
    }
    val got = CurationOps.queries("q155_weighted_percentiles")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("wp25_chars"),
        r.getAs[Long]("wp50_chars"), r.getAs[Long]("wp75_chars"))).toSeq
    assert(got === want)
    got.foreach { case (s, a, b, c) =>
      assert(a <= b && b <= c, s"percentiles out of order for $s") }
  }

  test("q156 timed funnel: planted SLA hits, late hops, and same-second strictness") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfunnel").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(off: Long) = new java.sql.Timestamp(t0 + off * 1000)
    // u1: full timely chain; u2: click 4000s after view (late); u3: no
    // view at all; u4: purchase 3700s after its timely click (late);
    // u5: view and click in the SAME second (strict window excludes it)
    val rows = Seq(
      (1L, 10L, "view", 0L), (2L, 10L, "click", 1800L), (3L, 10L, "purchase", 5000L),
      (4L, 20L, "view", 0L), (5L, 20L, "click", 4000L), (6L, 20L, "purchase", 4500L),
      (7L, 30L, "click", 0L), (8L, 30L, "purchase", 10L),
      (9L, 40L, "view", 0L), (10L, 40L, "click", 100L), (11L, 40L, "purchase", 3800L),
      (12L, 50L, "view", 0L), (13L, 50L, "click", 0L), (14L, 50L, "purchase", 10L))
      .map { case (id, u, et, off) => (id, ts(off), u, et, 0.0, "") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StreamSemantics.queries("q156_timed_funnel")(spark, dir).head()
    assert((r.getAs[Long]("n_view_users"), r.getAs[Long]("n_timely_click_users"),
      r.getAs[Long]("n_timely_purchase_users")) === ((4L, 2L, 1L)))
  }

  test("q156 timed funnel re-derives exactly and stages are monotone") {
    val ev = Tables.events(spark, sf).select("user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 1000L)))
    val byUser = ev.groupBy(_._1)
    def timely(secs: Seq[Long], at: Long) = secs.exists(s => s >= at - 3600 && s <= at - 1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { xs =>
      val views = xs.filter(_._2 == "view").map(_._3).toSeq
      val tclicks = xs.filter(_._2 == "click").map(_._3).filter(timely(views, _)).toSeq
      if (views.nonEmpty) nv += 1
      if (tclicks.nonEmpty) nc += 1
      if (xs.filter(_._2 == "purchase").map(_._3).exists(timely(tclicks, _))) np += 1
    }
    val r = StreamSemantics.queries("q156_timed_funnel")(spark, sf).head()
    val got = (r.getAs[Long]("n_view_users"), r.getAs[Long]("n_timely_click_users"),
      r.getAs[Long]("n_timely_purchase_users"))
    assert(got === ((nv, nc, np)))
    assert(got._1 >= got._2 && got._2 >= got._3, "funnel stages must be monotone")
  }

  test("q159 diverse top-k: returns one champion per label where plain top-3 is one cluster") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-diverse").toString
    def vec(x: Double, y: Double) = Array.tabulate(64)(i =>
      if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0f)
    // three near-copies of the probe all carry label a — the plain top-3
    // would be (a, a, a); the diversified head must surface b and c
    val rows = Seq(
      (0L, vec(1, 0), "a"),
      (1L, vec(1, 0.01), "a"), (2L, vec(1, 0.02), "a"), (3L, vec(1, 0.03), "a"),
      (4L, vec(0.7, 0.7), "b"), (5L, vec(0.2, 0.9), "c"))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q159_diverse_topk")(spark, dir).collect()
      .map(r => (r.getAs[Long]("div_rank"), r.getAs[Long]("vec_id"), r.getAs[String]("label")))
    assert(got.map(_._3).toSeq === Seq("a", "b", "c"), s"diversity broken: ${got.toSeq}")
    assert(got.head._2 === 1L, "label a's champion must be its highest-cosine member")
  }

  test("q159 diverse top-k re-derives exactly from the champion-per-label rule") {
    val pairs = probePairs(sf)
    val want = pairs.groupBy(_._1).toSeq.flatMap { case (qid, xs) =>
      val champs = xs.groupBy(_._4).values.map(_.minBy(p => (-p._5, p._3))).toSeq
      champs.sortBy(p => (-p._5, p._3)).take(3).zipWithIndex
        .map { case (p, i) => (qid, i + 1L, p._3, p._4, p._5) }
    }.sortBy(x => (x._1, x._2))
    val got = Similarity.queries("q159_diverse_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("div_rank"), r.getAs[Long]("vec_id"),
        String.valueOf(r.getAs[Any]("label")), r.getAs[Double]("cosine"))).toSeq
    assert(got === want)
    // the constraint is real: labels within one probe's head never repeat
    got.groupBy(_._1).values.foreach { xs =>
      assert(xs.map(_._4).distinct.length === xs.length, "duplicate label in diversified head") }
  }

  test("q142 journey paths: planted journeys count paths and distinct users by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 100: view→click→purchase→signup; user 200: view→click→purchase
    Seq(
      (1L, t(0), 100L, "view", 0.0, ""), (2L, t(1), 100L, "click", 0.0, ""),
      (3L, t(2), 100L, "purchase", 0.0, ""), (4L, t(3), 100L, "signup", 0.0, ""),
      (5L, t(0), 200L, "view", 0.0, ""), (6L, t(1), 200L, "click", 0.0, ""),
      (7L, t(2), 200L, "purchase", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamSemantics.queries("q142_journey_paths")(spark, dir).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"), r.getAs[String]("s3"),
        r.getAs[Long]("n_paths"), r.getAs[Long]("n_users")))
    assert(got.toSeq === Seq(
      ("view", "click", "purchase", 2L, 2L),
      ("click", "purchase", "signup", 1L, 1L)))
  }

  test("q142 journey paths re-derive exactly from a driver-side sliding-window count") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      xs.sortBy(x => (x._2.getTime, x._2.getNanos, x._3)).map(_._4)
        .sliding(3).filter(_.length == 3)
        .map(w => (u, (w(0), w(1), w(2))))
    }
    val want = paths.groupBy(_._2).map { case (p, xs) =>
      (p._1, p._2, p._3, xs.length.toLong, xs.map(_._1).distinct.length.toLong)
    }.toSeq.sortBy { case (a, b, c, n, _) => (-n, a, b, c) }.take(32)
    val got = StreamSemantics.queries("q142_journey_paths")(spark, sf).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"), r.getAs[String]("s3"),
        r.getAs[Long]("n_paths"), r.getAs[Long]("n_users"))).toSeq
    assert(got === want)
  }

  test("q143 quantile normalization: mapping is monotone, midpoint-valued, and count-preserving") {
    val rows = CurationOps.queries("q143_quantile_norm")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("src_decile"), r.getAs[Double]("norm_chars")))
    assert(rows.length.toLong === Tables.documents(spark, sf).count(),
      "normalization must keep every document")
    val mids = rows.map(_._5).distinct.sorted
    assert(mids.length <= 10, "norm values must come from the 10 corpus midpoints")
    rows.foreach { case (_, _, _, dec, _) => assert(dec >= 0L && dec <= 9L) }
    // within a source, a longer doc can never land in a LOWER decile, and
    // the midpoint lookup preserves that order
    rows.groupBy(_._2).values.foreach { xs =>
      xs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 <= b._4, s"decile not monotone in n_chars: $a -> $b")
          assert(a._5 <= b._5, s"norm value not monotone: $a -> $b")
        case _ =>
      }
    }
    // batch-effect correction actually happened: every source's docs now
    // span the SAME value scale (the corpus midpoints), so per-source mean
    // norm values sit inside the corpus midpoint range
    rows.groupBy(_._2).values.foreach { xs =>
      val m = xs.map(_._5).sum / xs.length
      assert(m >= mids.head && m <= mids.last)
    }
  }

  test("q137 mix schedule re-derives exactly from a driver-side stride computation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
    val bySrc = docs.groupBy(_._2)
    val keyed = bySrc.toSeq.flatMap { case (s, xs) =>
      val n = xs.length.toLong
      xs.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        (((i + 1L) * 1000000L) / n, s, id, i + 1L)
      }
    }
    val want = keyed.sortBy { case (k, s, id, _) => (k, s, id) }.take(50).zipWithIndex
      .map { case ((k, s, id, r), i) => (i + 1L, id, s, r, k) }
    val got = CurationOps.queries("q137_mix_schedule")(spark, sf).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("r"), r.getAs[Long]("k"))).toSeq
    assert(got === want)
    assert(got.map(_._1) === (1L to got.length.toLong))
  }

  test("q174 nprobe curve: a neighbor living in the rank-2 cell caps recall@1 at 4/5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    // Label-0 cluster on axis 0 (probe 0 + four tight neighbors 101–104);
    // label-1 cluster on axis 1. The stray 299 leans axis-1 (so its cell
    // is 1) but keeps cos 0.6 with the probe — its 5th exact neighbor.
    // The probe's cell ranking is (0, 1), so nprobe=1 finds only the four
    // in-cell neighbors (recall 800‰) and nprobe>=2 recovers all five —
    // the curve the query exists to surface.
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    val rows = Seq(
      (0L, v(0 -> 1.0f), 0),
      (101L, v(0 -> 1.0f, 10 -> 0.01f), 0),
      (102L, v(0 -> 1.0f, 11 -> 0.01f), 0),
      (103L, v(0 -> 1.0f, 12 -> 0.01f), 0),
      (104L, v(0 -> 1.0f, 13 -> 0.01f), 0),
      (201L, v(1 -> 1.0f), 1),
      (202L, v(1 -> 1.0f, 20 -> 0.01f), 1),
      (203L, v(1 -> 1.0f, 21 -> 0.01f), 1),
      (299L, v(0 -> 0.6f, 1 -> 0.8f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q174_ivf_nprobe_curve")(spark, dir).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_found"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("recall_permille"))).toSeq
    assert(got === Seq((1L, 4L, 5L, 800L), (2L, 5L, 5L, 1000L),
      (4L, 5L, 5L, 1000L), (8L, 5L, 5L, 1000L)))
  }

  test("q174 nprobe curve is monotone on the fixture and saturates at the cell count") {
    val got = Similarity.queries("q174_ivf_nprobe_curve")(spark, sf).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_found"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("recall_permille"))).toSeq
      .sortBy(_._1)
    assert(got.map(_._1) === Seq(1L, 2L, 4L, 8L))
    // recall can only grow with probes, and every arm shares one exact set
    assert(got.sliding(2).forall { case Seq(a, b) => a._2 <= b._2; case _ => true })
    assert(got.map(_._3).distinct.size === 1)
    got.foreach { case (_, found, exact, permille) =>
      assert(found <= exact && permille === found * 1000L / exact)
    }
    // 8 probes >= the 10-cell grid's useful depth on sf0.001: by then the
    // curve must have found strictly more than the nprobe=1 arm unless
    // nprobe=1 is already perfect
    val (first, last) = (got.head, got.last)
    assert(last._2 >= first._2)
  }

  test("q180 retrieval eval: planted 3-relevant-of-10 yields 1000/600/300 precision") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-receval").toString
    // probe 0 (label 0) on axis 0; 101–103 share its label at cos≈0.99995
    // (top-3 by construction); 201–207 carry label 1 at cos<0.7. Top-10 =
    // all ten: precision@1 = 1/1, @5 = 3/5, @10 = 3/10; every hit@k = 1.
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    val rows = Seq(
      (0L, v(0 -> 1.0f), 0),
      (101L, v(0 -> 1.0f, 10 -> 0.01f), 0),
      (102L, v(0 -> 1.0f, 11 -> 0.01f), 0),
      (103L, v(0 -> 1.0f, 12 -> 0.01f), 0)) ++
      (0 until 7).map(j => ((201 + j).toLong, v(0 -> (0.9f - 0.1f * j), 1 -> 1.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q180_retrieval_eval")(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_probes"),
        r.getAs[Long]("n_hit_probes"), r.getAs[Long]("hit_rate_permille"),
        r.getAs[Long]("n_relevant_retrieved"), r.getAs[Long]("precision_permille"))).toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 1000L, 1L, 1000L),
      (5L, 1L, 1L, 1000L, 3L, 600L),
      (10L, 1L, 1L, 1000L, 3L, 300L)))
  }

  test("q180 retrieval eval is k-monotone on the fixture") {
    val got = Similarity.queries("q180_retrieval_eval")(spark, sf).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_hit_probes"),
        r.getAs[Long]("n_relevant_retrieved"))).toSeq.sortBy(_._1)
    assert(got.map(_._1) === Seq(1L, 5L, 10L))
    // widening k can only add hit probes and retrieved relevants
    assert(got.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 && a._3 <= b._3
      case _ => true })
  }

  test("q194 embedding gate counts every planted defect class exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gate").toString
    // 7 vectors: three exact dups of [1,2] (one dup group, 3 members),
    // one zero vector (clean, its own unique grid key), one NaN, one
    // +Inf, one 3-dim row against the modal 2 dims
    val rows = Seq(
      (1L, Array(1f, 2f), 0), (2L, Array(1f, 2f), 0), (3L, Array(1f, 2f), 0),
      (4L, Array(0f, 0f), 0),
      (5L, Array(Float.NaN, 1f), 0),
      (6L, Array(Float.PositiveInfinity, 1f), 0),
      (7L, Array(1f, 2f, 3f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q194_embedding_gate")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_vecs") === 7L)
    assert(r.getAs[Long]("modal_dims") === 2L)
    assert(r.getAs[Long]("n_dim_mismatch") === 1L)
    assert(r.getAs[Long]("n_with_nan") === 1L)
    assert(r.getAs[Long]("n_with_inf") === 1L)
    assert(r.getAs[Long]("n_zero_vectors") === 1L)
    assert(r.getAs[Long]("n_dup_vectors") === 3L)
    assert(r.getAs[Long]("n_dup_groups") === 1L)
  }

  test("q190 triplet mining: hard negative may violate the margin, semi-hard stays below the positive, or is NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trip").toString
    // anchors are vec_id % 100 == 0. Cosines against anchor 0 = [1,0]:
    //   vec 1 [4,3] same label        → 0.8      (positive)
    //   vec 100 [1,0] label 40        → 1.0      (hardest negative, margin −0.2)
    //   vec 2 [3,1] label 20          → 0.948683 (≥ pos_cos: NOT semi-hard)
    //   vec 4 [1,1] label 30          → 0.707107 (semi-hard winner)
    //   vec 3 [3,4] label 20          → 0.6
    // anchor 100: positive vec 101 [1,9] → 0.110432; every cross-label
    // cosine exceeds it → semi-hard is NULL, neg = vec 0 at cos 1.0.
    val rows = Seq(
      (0L, Array(1f, 0f), 10), (1L, Array(4f, 3f), 10),
      (2L, Array(3f, 1f), 20), (3L, Array(3f, 4f), 20),
      (4L, Array(1f, 1f), 30),
      (100L, Array(1f, 0f), 40), (101L, Array(1f, 9f), 40))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q190_triplet_mining")(spark, dir).collect()
    assert(got.length === 2)
    def d(x: Double, y: Double) = math.abs(x - y) < 1e-9
    val a0 = got(0)
    assert(a0.getAs[Long]("qid") === 0L && a0.getAs[Long]("pos_id") === 1L)
    assert(d(a0.getAs[Double]("pos_cos"), 0.8))
    assert(a0.getAs[Long]("neg_id") === 100L && d(a0.getAs[Double]("neg_cos"), 1.0))
    assert(d(a0.getAs[Double]("margin"), -0.2))
    assert(a0.getAs[Long]("semi_id") === 4L && d(a0.getAs[Double]("semi_cos"), 0.707107))
    val a1 = got(1)
    assert(a1.getAs[Long]("qid") === 100L && a1.getAs[Long]("pos_id") === 101L)
    assert(d(a1.getAs[Double]("pos_cos"), 0.110432))
    assert(a1.getAs[Long]("neg_id") === 0L && d(a1.getAs[Double]("neg_cos"), 1.0))
    assert(d(a1.getAs[Double]("margin"), -0.889568))
    assert(a1.isNullAt(a1.fieldIndex("semi_id")) && a1.isNullAt(a1.fieldIndex("semi_cos")))
  }

  test("q201 separates scale drift (cos 1) from rotation (cos 0) with exact geometry") {
    import spark.implicits._
    def bkt(id: Long) = graft.functions.HashOps.md5Prefix32(id.toString.getBytes) % 100
    val epochA = (0L to 500L).filter(bkt(_) < 50)
    val epochB = (0L to 500L).filter(bkt(_) >= 50)
    def axis(j: Int, v: Float): Array[Float] = Array.tabulate(64)(i => if (i == j) v else 0f)
    // label 0: epoch-a at 1·e0, epoch-b at 2·e0 → drift 1.0, cos 1.0
    // (pure scale shift); label 1: epoch-a at e0, epoch-b at e1 → drift
    // √2 ≈ 1.414214, cos 0.0 (pure rotation). Two vectors per cell so the
    // per-cell mean is exercised, not just a single-row passthrough.
    val rows =
      epochA.take(2).map(id => (id, axis(0, 1f), 0)) ++
        epochB.take(2).map(id => (id, axis(0, 2f), 0)) ++
        epochA.slice(2, 4).map(id => (id, axis(0, 1f), 1)) ++
        epochB.slice(2, 4).map(id => (id, axis(1, 1f), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q201_centroid_drift")(spark, dir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("centroid_drift"), r.getAs[Double]("centroid_cos"))).toSeq
    assert(got === Seq((0, 2L, 2L, 1.0, 1.0), (1, 2L, 2L, 1.414214, 0.0)))
  }

  test("q204 PQ assignment/reconstruction/ADC ranking re-derive exactly") {
    import spark.implicits._
    def vec(entries: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); entries.foreach { case (i, v) => a(i) = v }; a
    }
    // codes live on their subspace axes (dim 16j); satellites mix and
    // perturb them so assignment, tie-break (all-zero subspaces tie to
    // code 0), reconstruction, and ADC-vs-exact rank divergence all fire
    val rows: Seq[(Long, Array[Float], Int)] = Seq(
      (0L, vec(0 -> 0.3f), 0), (1L, vec(16 -> 0.3f), 0),
      (2L, vec(32 -> 0.3f), 1), (3L, vec(48 -> 0.3f), 1),
      (10L, vec(0 -> 0.3f, 16 -> 0.3f), 0),
      (11L, vec(16 -> 0.3f, 17 -> 0.05f), 0),
      (12L, vec(0 -> 0.25f), 1),
      (13L, vec(0 -> 0.2f, 32 -> 0.1f), 1),
      // 14 sits exact-close to the probes but its subspace-0 energy is
      // nearer the zero codes than c0 → recon collapses to 0⃗, pushing it
      // out of the PQ top-5 while 15 (recon → c0 exactly) crowds in: the
      // divergence the audit exists to measure
      (14L, vec(0 -> 0.12f, 2 -> 0.12f), 1),
      (15L, vec(0 -> 0.24f), 0),
      (100L, vec(0 -> 0.3f, 1 -> 0.02f), 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    rows.map(r => (r._1, r._2, r._3)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // independent driver-side PQ
    val grid: Map[Long, Array[Long]] = rows
      .map { case (id, v, _) => id -> v.map(x => Math.round(x.toDouble * 1e6)) }.toMap
    val cb = (0L to 3L).map(grid)
    def sub(a: Array[Long], j: Int): Array[Long] = a.slice(16 * j, 16 * j + 16)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recon: Map[Long, Array[Long]] = grid.map { case (id, u) =>
      id -> (0 until 4).flatMap { j =>
        val dists = cb.map(c => l2(sub(u, j), sub(c, j)))
        sub(cb(dists.indexOf(dists.min)), j)
      }.toArray
    }
    val want = grid.keys.filter(_ % 100 == 0).toSeq.sorted.map { qid =>
      val qv = grid(qid)
      val others = grid.keys.filter(_ != qid).toSeq
      val eTop = others.sortBy(id => (l2(qv, grid(id)), id)).take(5)
      val pTop = others.sortBy(id => (l2(qv, recon(id)), id)).take(5)
      (qid, eTop.toSet.intersect(pTop.toSet).size.toLong, eTop.sum, pTop.sum)
    }
    val got = Similarity.queries("q204_pq_recall")(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("exact_ids_sum"), r.getAs[Long]("pq_ids_sum"))).toSeq
    assert(got === want)
    // the planted geometry must actually diverge somewhere, or the test
    // proves nothing about the approximation arm
    assert(want.exists { case (_, hits, es, ps) => hits < 5L || es != ps })
  }

  test("q254 k-center: radius curve non-increasing, centers distinct, greedy invariant") {
    // the Gonzalez contract: each added center can only SHRINK (or hold)
    // the cover radius, every center is a distinct point, and round 2's
    // center is exactly the farthest point from round 1's seed (the
    // greedy choice, re-derived here brute-force from the same grid).
    val rows = Similarity.queries("q254_kcenter_coreset")(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("center_id"),
        r.getAs[Long]("radius_sq"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 6L))
    assert(rows.map(_._2).distinct.length === 6, "centers must be distinct points")
    rows.sliding(2).foreach { case Array((_, _, r1), (_, _, r2)) =>
      assert(r2 <= r1, s"radius must be non-increasing: $r1 -> $r2")
    }
    // brute-force the first greedy step on the same 1e-6 integer grid
    val vi = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .filter(expr("aggregate(transform(vd, x -> x*x), 0D, (a, x) -> a + x) > 0"))
      .select(col("vec_id"),
        expr("transform(vd, x -> CAST(round(x * 1000000) AS BIGINT))").as("vi"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getSeq[Long](1).toArray))
    val seed = vi.minBy(_._1)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val far = vi.map { case (id, v) => (d2(v, seed._2), id) }
      .sortBy { case (d, id) => (-d, id) }.head
    assert(rows(0)._2 === seed._1)
    assert(rows(1)._2 === far._2, "round-2 center must be the farthest point from the seed")
    assert(rows(0)._3 === far._1, "round-1 radius must be that farthest distance")
  }

  test("MisraGries guarantee survives any merge tree (partition-count sweep)") {
    // the q256 contract: the summary CONTENT may vary with Spark's
    // partial-agg merge order, but for EVERY partitioning the guaranteed
    // key (share > 1/(k+1)) must be present with est in
    // [true - N/(k+1), true]. Planted: a=60, b=25, c=10, d=5 (N=100,
    // k=2, threshold 33.3 -> guaranteed {a}).
    import spark.implicits._
    val data = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(5)("d")
    val agg = new graft.operators.CustomSurface.MisraGriesAgg(2)
    for (p <- Seq(1, 2, 7, 32)) {
      val mg = data.toDS().repartition(p).groupByKey(_ => 0)
        .agg(agg.toColumn.name("mg")).collect().head._2
      assert(mg.contains("a"), s"guaranteed key missing at p=$p: $mg")
      val est = mg("a")
      assert(est <= 60L && 60L - est <= 100L / 3L,
        s"estimate $est outside [true - N/(k+1), true] at p=$p")
      mg.foreach { case (t, e) =>
        val truth = Map("a" -> 60L, "b" -> 25L, "c" -> 10L, "d" -> 5L)(t)
        assert(e <= truth, s"MG must never overestimate: $t=$e > $truth")
      }
    }
  }

  test("q327: CH index re-derives from the q126 assignment's sufficient stats") {
    val a = Similarity.queries("q126_kmeans_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ui",
        "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (s, v) -> s + v) AS n2")
      .collect().filter(_.getAs[Double]("n2") > 0d)
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Long]]("ui").toArray)
    val byCl = vecs.groupBy { case (id, _) => a(id) }
    // per-vector mean grain, exactly the query's staging: the division
    // happens at the bounded mean, totals are rebuilt as n_j * mean.
    def meanOf(rows: Array[(Long, Array[Long])]): Long = {
      val nj = BigInt(rows.length)
      val qj = rows.map(r => r._2.map(x => BigInt(x) * x).sum).sum
      val s2 = (0 until 64).map(k => {
        val s = rows.map(r => BigInt(r._2(k))).sum; s * s
      }).sum
      ((nj * qj - s2) * 1000 / (nj * nj)).toLong
    }
    val perCl = byCl.view.mapValues(meanOf).toMap
    val wTot = byCl.map { case (c, rows) => BigInt(rows.length) * perCl(c) }.sum
    val n = vecs.length.toLong
    val k = perCl.size.toLong
    val tTot = BigInt(n) * meanOf(vecs)
    val b = (tTot - wTot).max(BigInt(0))
    val bw = if (wTot > 0) (b * 1000 / wTot).toLong else 0L
    val ch = if (k > 1) bw * (n - k) / (k - 1) else 0L
    val got = graft.operators.Similarity.queries("q327_calinski_harabasz")(spark, sf).collect()
    assert(got.length === k.toInt)
    got.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      assert(r.getAs[Long]("n_vecs") === byCl(cl).length.toLong)
      assert(r.getAs[Long]("w_mean_milli") === perCl(cl))
      assert(r.getAs[Long]("n_total") === n)
      assert(r.getAs[Long]("bw_ratio_milli") === bw)
      assert(r.getAs[Long]("ch_milli") === ch)
    }
  }
}
