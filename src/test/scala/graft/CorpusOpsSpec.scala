package graft

import graft.operators.{CurationOps, Dedup, TextAnalysis}
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.functions._

/** Semantic claims of the corpus-quality operators added in round 7
  * (output equality vs DuckDB is the oracle gate's job):
  *
  *  - q98 passage dedup must detect a passage SHARED ACROSS docs while
  *    ignoring each doc's unique surroundings — the property that
  *    distinguishes it from whole-doc Jaccard (q41), which scores the
  *    planted pair below any useful threshold;
  *  - q99's repetition flag must fire on a degenerate boilerplate doc and
  *    stay quiet on a diverse one of the same length;
  *  - q100's chunks must tile every document exactly: fixed stride,
  *    full-width interior chunks, a final chunk that ends on the last
  *    token — and the generator must run before any exchange;
  *  - q101's weights are a valid downsampling plan: ≤1 everywhere, =1
  *    exactly for underrepresented sources, shares summing to 1.
  */
class CorpusOpsSpec extends SparkSpec {

  /** Writes a planted corpus to a temp sf-dir so the real query builders
    * (which read `<dir>/documents.parquet`) run unmodified on it. */
  private def plantedDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q98: a planted cross-doc passage is found; unique docs report zero") {
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    // docs 0 and 1 embed the same 8-token passage in different unique
    // contexts; doc 2 shares nothing. Exactly ONE positional shingle per
    // embedding doc (the full-passage window) is corpus-duplicated.
    val dir = plantedDir(Seq(
      (0L, s"alpha beta $passage gamma delta", "en", "srcA", 0L),
      (1L, s"one two three $passage four", "en", "srcB", 0L),
      (2L, "ten unique words here share nothing with any other doc", "en", "srcC", 0L)))
    val got = Dedup.queries("q98_passage_dedup")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_dup"),
          r.getAs[Long]("n_pos"), r.getAs[Long]("n_dup_pos"))).toMap
    // 12 tokens → 5 shingle positions; 10 tokens → 3
    assert(got("srcA") === ((1L, 1L, 5L, 1L)))
    assert(got("srcB") === ((1L, 1L, 5L, 1L)))
    assert(got("srcC") === ((1L, 0L, 3L, 0L)))
  }

  test("q163: planted shared passages are masked out, overlap unioned, full-passage doc empties") {
    val p = (1 to 8).map(i => s"p$i").mkString(" ")
    val q9 = (1 to 9).map(i => s"q$i").mkString(" ")
    // docs 0/1/5 share the 8-token p-passage (doc 5 IS the passage —
    // masks to empty); docs 3/4 share a 9-token q-passage, which yields
    // TWO overlapping duplicated 8-gram windows each — the masked
    // positions must be their UNION (9 tokens), not 16; doc 2 is unique.
    val dir = plantedDir(Seq(
      (0L, s"alpha beta $p gamma delta", "en", "srcA", 0L),
      (1L, s"one two three $p four", "en", "srcB", 0L),
      (2L, "ten unique words here share nothing with any other doc", "en", "srcC", 0L),
      (3L, s"x1 $q9 y1", "en", "srcD", 0L),
      (4L, s"z1 z2 $q9", "en", "srcD", 0L),
      (5L, p, "en", "srcE", 0L)))
    val got = operators.Dedup.queries("q163_span_mask")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("n_masked"), r.getAs[Long]("n_dup_spans"),
        r.getAs[String]("masked_text"))).toSeq
    assert(got === Seq(
      (0L, 12L, 8L, 1L, "alpha beta gamma delta"),
      (1L, 12L, 8L, 1L, "one two three four"),
      (2L, 10L, 0L, 0L, "ten unique words here share nothing with any other doc"),
      (3L, 11L, 9L, 2L, "x1 y1"),
      (4L, 11L, 9L, 2L, "z1 z2"),
      (5L, 8L, 8L, 1L, "")))
  }

  test("q163 span mask re-derives exactly from a driver-side exact-substring pass") {
    val toks = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1)))
    val grams = toks.flatMap { case (id, _, ts) =>
      if (ts.length >= 8)
        (0 to ts.length - 8).map(i => (id, i + 1, ts.slice(i, i + 8).mkString(" ")))
      else Seq.empty
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.length >= 2).keySet
    val spans = grams.filter(g => dup(g._3)).groupBy(_._1)
      .map { case (id, gs) => id -> gs.map(_._2).toSet }
    val want = toks.sortBy(_._1).map { case (id, src, ts) =>
      val st = spans.getOrElse(id, Set.empty[Int])
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !st.exists(s => s <= i + 1 && i + 1 <= s + 7) => t
      }
      (id, src, ts.length.toLong, (ts.length - kept.length).toLong,
        st.size.toLong, kept.mkString(" "))
    }.toSeq
    val got = operators.Dedup.queries("q163_span_mask")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_dup_spans"), r.getAs[String]("masked_text"))).toSeq
    assert(got === want)
  }

  test("q98 on the fixture: totals cover the corpus and coverage is bounded") {
    val rows = Dedup.queries("q98_passage_dedup")(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_pos") <= r.getAs[Long]("n_pos"), r.toString)
      assert(r.getAs[Long]("n_docs_dup") <= r.getAs[Long]("n_docs"), r.toString)
    }
  }

  test("q99: boilerplate repetition is flagged, a diverse doc of equal length is not") {
    // 10 tokens each: the alternating doc's top bigram ("spam ham") covers
    // 5 of 9 bigram positions (55% ≥ 20% → flagged); the diverse doc's
    // top bigram covers 1 of 9 (11% < 20% → kept).
    val dir = plantedDir(Seq(
      (0L, Seq.fill(5)("spam ham").mkString(" "), "en", "srcRep", 0L),
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "srcDiv", 0L)))
    val got = TextAnalysis.queries("q99_repetition_score")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_flagged"), r.getAs[Long]("sum_top"), r.getAs[Long]("sum_bg"))).toMap
    assert(got("srcRep") === ((1L, 5L, 9L)))
    assert(got("srcDiv") === ((0L, 1L, 9L)))
  }

  test("q100 chunks tile every doc: stride-aligned starts, exact widths, full coverage") {
    val w = 64L; val st = 48L
    val chunks = CurationOps.queries("q100_chunk_windows")(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet === nTok.keySet, "a doc produced no chunks")
    chunks.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong)
        val start = r.getAs[Long]("t_start")
        assert(start === 1L + st * i, s"doc $doc chunk $i start $start")
        assert(r.getAs[Long]("n_tok") === math.min(w, n - start + 1),
          s"doc $doc chunk $i width")
      }
      val last = sorted.last
      assert(last.getAs[Long]("t_start") + last.getAs[Long]("n_tok") - 1 === n,
        s"doc $doc: final chunk does not end on the last token")
      assert(sorted.length === ((n - 1) / st + 1), s"doc $doc chunk count")
    }
  }

  test("q100 plan: chunk generation happens before any exchange (row-local)") {
    val p = CurationOps.queries("q100_chunk_windows")(spark, sf)
      .queryExecution.executedPlan.toString
    val gen = p.indexOf("Generate")
    val ex = p.indexOf("Exchange")
    assert(gen >= 0, "no Generate in q100 plan:\n" + p.take(1500))
    // plans print top-down: the generator must sit BELOW (after) the
    // sort's exchange-less subtree — i.e. any Exchange present belongs to
    // the final orderBy and appears ABOVE the Generate node
    assert(ex < 0 || ex < gen, "an exchange feeds the generator:\n" + p.take(1500))
  }

  test("q102: decile blending sends a planted extreme doc to each tail") {
    // 10 docs, lengths 10..100 tokens, all tokens distinct within a doc
    // so both signals agree: the longest doc clears all 9 boundaries of
    // both metrics (blend 18 → n_high), the shortest clears none
    // (blend 0 → n_low), and nothing in between reaches either tail.
    val dir = plantedDir((1 to 10).map { k =>
      (k.toLong, (1 to k * 10).map(i => s"w${k}_$i").mkString(" "), "en", s"src$k", 0L)
    })
    val got = TextAnalysis.queries("q102_quality_ensemble")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("sum_dlen"), r.getAs[Long]("sum_ddiv"),
          r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))).toMap
    assert(got("src10") === ((9L, 9L, 0L, 1L)), "longest doc not in the top decile of both")
    assert(got("src1") === ((0L, 0L, 1L, 0L)), "shortest doc not in the bottom decile of both")
    // interpolated boundaries put docs k=1,2 (blend 0,2) in the ≤3 tail
    // and k=9,10 (blend 16,18) in the ≥15 tail — exactly two per side
    assert(got.values.map(_._3).sum === 2L && got.values.map(_._4).sum === 2L)
  }

  test("q103: a planted always-adjacent rare pair tops the collocation list") {
    // 'zz qq' co-occurs 5 times and its parts appear NOWHERE else →
    // lift = 5·N·1000/25 = 200·N, orders of magnitude above any filler
    // pair (filler lift ≈ 1000). Fillers provide volume so the support
    // floor (cbg ≥ 5) keeps the planted pair and the corpus stays mixed.
    val filler = (1 to 40).map(i => s"f${i % 4}").mkString(" ")
    val dir = plantedDir((1 to 5).map { k =>
      (k.toLong, s"$filler zz qq $filler", "en", s"src$k", 0L)
    })
    val top = TextAnalysis.queries("q103_collocations")(spark, dir).collect()
    assert(top.nonEmpty)
    val first = top.head
    assert((first.getAs[String]("a"), first.getAs[String]("b")) === (("zz", "qq")),
      s"planted phrase not ranked first: ${top.take(3).mkString(", ")}")
    assert(first.getAs[Long]("cbg") === 5L)
    // lifts are non-increasing (the ORDER BY is the contract)
    val lifts = top.map(_.getAs[Long]("lift")).toSeq
    assert(lifts === lifts.sorted.reverse, "lift ordering violated")
  }

  test("q104 statuses match an independent re-derivation of the snapshot rules") {
    val rules = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = rules.flatMap { case (id, text) =>
      val inOld = id % 7 != 0
      val inNew = id % 11 != 0
      val changed = id % 5 == 0 && text.reverse != text
      (inOld, inNew) match {
        case (false, true) => Some("added" -> id)
        case (true, false) => Some("removed" -> id)
        case (true, true) => Some((if (changed) "changed" else "unchanged") -> id)
        case _ => None
      }
    }.groupBy(_._1).map { case (st, xs) => st -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val got = CurationOps.queries("q104_corpus_delta")(spark, sf).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("id_checksum")))).toMap
    assert(got === expected)
    assert(got.keySet === Set("added", "removed", "changed", "unchanged"),
      "a status is missing from the fixture-derived snapshots")
  }

  test("q101 is a valid downsampling plan: weights in (0,1], =1 iff underrepresented") {
    val rows = CurationOps.queries("q101_domain_mix")(spark, sf).collect()
    val totTok = rows.map(_.getAs[Long]("tok")).sum
    val nSrc = rows.length.toLong
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val (tok, wgt) = (r.getAs[Long]("tok"), r.getAs[Double]("weight"))
      assert(wgt > 0.0 && wgt <= 1.0, r.toString)
      if (tok * nSrc <= totTok) assert(wgt === 1.0, s"underrepresented source downsampled: $r")
      else assert(wgt < 1.0, s"overrepresented source not downsampled: $r")
    }
    // the reweighted mix is never larger than the original corpus
    val after = rows.map(r => r.getAs[Long]("tok") * r.getAs[Double]("weight")).sum
    assert(after <= totTok.toDouble)
  }

  /** The q74/q90 split assignment, driver-side: md5 pct-bucket of the id. */
  private def splitOf(id: Long): String = {
    val h = graft.functions.HashOps.md5Prefix32(id.toString.getBytes) % 100
    if (h < 80) "train" else if (h < 90) "validation" else "test"
  }

  test("q139 split leakage: a planted cross-split near-dup trio is listed, same-split pairs are not") {
    // find real ids whose md5 buckets land in train / train / test, so
    // the planted trio crosses the split boundary deterministically
    val trainIds = (0L to 500L).filter(splitOf(_) == "train")
    val testId = (0L to 500L).find(splitOf(_) == "test").get
    val (ta1, ta2) = (trainIds(0), trainIds(1))
    val base = (1 to 11).map(i => s"c$i").mkString(" ")
    // three near-dups: 12 tokens, identical except the last → 8 shingles
    // each, 7 common → jaccard 7/9 = 0.7778 ≥ 0.5 for every pair
    val dir = plantedDir(Seq(
      (ta1, s"$base alpha", "en", "srcA", 0L),
      (ta2, s"$base gamma", "en", "srcA", 0L),
      (testId, s"$base beta", "en", "srcB", 0L),
      (999999L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "srcC", 0L)))
    val got = Dedup.queries("q139_split_leakage")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard"),
        r.getAs[String]("split_a"), r.getAs[String]("split_b")))
    // crossing pairs only: (train, test) twice; the train-train pair
    // (ta1, ta2) must be absent
    val want = Seq(ta1 -> testId, ta2 -> testId)
      .map { case (x, y) => if (x < y) (x, y, 0.7778, "train", "test")
                            else (y, x, 0.7778, "test", "train") }
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq === want)
  }

  test("q139 equals crossing-filtered q41; the cluster-keyed split (q96) leaks zero pairs") {
    val pairs = Dedup.queries("q41_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard")))
    val want = pairs.filter { case (a, b, _) => splitOf(a) != splitOf(b) }
      .map { case (a, b, j) => (a, b, j, splitOf(a), splitOf(b)) }.toSeq
    val got = Dedup.queries("q139_split_leakage")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard"),
        r.getAs[String]("split_a"), r.getAs[String]("split_b"))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture should exhibit doc-keyed leakage (it does at sf0.01+)")
    // q96's promise, measured: every ≥0.5 pair is an edge of one q73
    // component, so a CLUSTER-keyed split can never separate it
    val cluster = Dedup.queries("q73_dedup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    pairs.foreach { case (a, b, _) =>
      assert(cluster(a) === cluster(b), s"pair ($a,$b) spans clusters — q96 premise broken")
    }
  }

  /** q40/q144's content fingerprint, driver-side. */
  private def fpOf(text: String): String = {
    val head = text.split(" ", -1).take(8).mkString(" ")
    java.security.MessageDigest.getInstance("MD5")
      .digest(head.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  test("q144 incremental dedup: planted batch classifies corpus-dup, batch-dup, and new") {
    def bkt(id: Long) = graft.functions.HashOps.md5Prefix32(id.toString.getBytes) % 100
    val corpusIds = (0L to 500L).filter(bkt(_) < 90)
    val incIds = (0L to 500L).filter(bkt(_) >= 90)
    val (c1, c2) = (corpusIds(0), corpusIds(1))
    val Seq(iA, iB, iC, iD) = incIds.take(4).sorted.toSeq
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")  // 8 tokens = the whole fp
    val dir = plantedDir(Seq(
      (c1, s"$shared tail one", "en", "srcA", 0L),         // corpus doc, fp = shared
      (c2, (1 to 9).map(i => s"c$i").mkString(" "), "en", "srcA", 0L),
      (iC, s"$shared other tail", "en", "srcB", 0L),       // incoming, fp hits corpus
      (iA, (1 to 8).map(i => s"b$i").mkString(" "), "en", "srcB", 0L),  // batch pair, kept
      (iB, (1 to 8).map(i => s"b$i").mkString(" ") + " x", "en", "srcB", 0L), // batch dup
      (iD, (1 to 8).map(i => s"u$i").mkString(" "), "en", "srcB", 0L))) // unique → new
    val got = Dedup.queries("q144_incremental_dedup")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === Map(iC -> "dup_vs_corpus", iA -> "new",
      iB -> "dup_in_batch", iD -> "new"))
    assert(!got.contains(c1) && !got.contains(c2), "corpus docs must not be re-emitted")
  }

  test("q144 incremental dedup re-derives exactly from driver-side fp + bucket logic") {
    def bkt(id: Long) = graft.functions.HashOps.md5Prefix32(id.toString.getBytes) % 100
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> fpOf(r.getAs[String]("text")))
    val corpusFps = docs.collect { case (id, fp) if bkt(id) < 90 => fp }.toSet
    val incoming = docs.filter { case (id, _) => bkt(id) >= 90 }.sortBy(_._1)
    val firstOf = incoming.groupBy(_._2).map { case (fp, xs) => fp -> xs.map(_._1).min }
    val want = incoming.map { case (id, fp) =>
      val status =
        if (corpusFps.contains(fp)) "dup_vs_corpus"
        else if (firstOf(fp) != id) "dup_in_batch"
        else "new"
      (id, fp, status)
    }.toSeq
    val got = Dedup.queries("q144_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"), r.getAs[String]("status"))).toSeq
    assert(got === want)
  }

  test("q145 dedup savings: planted cluster keeps the smallest-ID doc's chars, not the smallest chars") {
    val base = (1 to 11).map(i => s"c$i").mkString(" ")
    // cluster {10,20,30}: canonical is doc 10 (smallest id) whose n_chars
    // (70) is NOT the cluster minimum (50) — pins arg_min-by-id semantics;
    // doc 40 is a singleton (size-1 cluster, zero savings)
    val dir = plantedDir(Seq(
      (10L, s"$base alpha", "en", "srcA", 70L),
      (20L, s"$base beta", "en", "srcA", 50L),
      (30L, s"$base gamma", "en", "srcA", 90L),
      (40L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "srcB", 33L)))
    val got = Dedup.queries("q145_dedup_savings")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs_dropped"), r.getAs[Long]("chars_saved")))
    assert(got.toSeq === Seq(
      (1L, 1L, 0L, 0L),
      (3L, 1L, 2L, (70L + 50L + 90L) - 70L)))
  }

  test("q145 dedup savings re-derives exactly from q73 labels + n_chars") {
    val chars = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val byCluster = Dedup.queries("q73_dedup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("doc_id"))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sorted }
    val perCluster = byCluster.values.map { ids =>
      (ids.length.toLong, ids.map(chars).sum - chars(ids.min))
    }
    val want = perCluster.groupBy(_._1).toSeq.sortBy(_._1).map { case (sz, xs) =>
      (sz, xs.size.toLong, (sz - 1) * xs.size, xs.map(_._2).sum)
    }
    val got = Dedup.queries("q145_dedup_savings")(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs_dropped"), r.getAs[Long]("chars_saved"))).toSeq
    assert(got === want)
  }

  test("q140 minhash calibration re-derives exactly from a BigInt driver-side pipeline") {
    // full independent re-derivation: shingle sets → 60-bit bucket hashes
    // → capped pairs (2 ≤ freq ≤ MaxBucket) → exact jaccard bp → 8-slot
    // signatures → agreement estimate → error histogram. Long arithmetic
    // throughout; any drift in cap constant, hash prefix width, or the
    // universal-hash family breaks equality here.
    val P = graft.functions.MinHashSig.P
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .filter(_._2.split(" ", -1).length >= 5)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val shingles: Map[Long, Array[String]] = docs.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(5).map(_.mkString(" ")).toArray.distinct
    }.toMap
    val exploded = shingles.toSeq.flatMap { case (id, sh) =>
      sh.map(s => (id, sh.length.toLong, java.lang.Long.parseLong(md5hex(s).take(15), 16)))
    }
    val freq = exploded.groupBy(_._3).map { case (s, xs) => s -> xs.length }
    val kept = exploded.filter(e => { val f = freq(e._3); f >= 2 && f <= Dedup.MaxBucket })
    val common = kept.groupBy(_._3).values.toSeq.flatMap { g =>
      for (x <- g; y <- g if x._1 < y._1) yield ((x._1, y._1, x._2, y._2), 1L)
    }.groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
    def sig(id: Long): Array[Long] = {
      val bases = shingles(id).map(s =>
        java.lang.Long.parseLong(md5hex(s).take(8), 16))
      Array.tabulate(8)(i => bases.map(h => ((2L * i + 1L) * h + 7919L * i) % P).min)
    }
    val errs = common.toSeq.map { case ((a, b, na, nb), c) =>
      val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } * 1250L
      val exact = c * 10000L / (na + nb - c)
      math.abs(est - exact)
    }
    val want = errs.groupBy(_ / 1000L).toSeq.sortBy(_._1)
      .map { case (bk, es) => (bk, es.length.toLong, es.sum, es.max) }
    val got = Dedup.queries("q140_minhash_calibration")(spark, sf).collect()
      .map(r => (r.getAs[Long]("err_bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("sum_err_bp"), r.getAs[Long]("max_err_bp"))).toSeq
    assert(got === want)
    // the calibration claim itself: estimates concentrate — the modal
    // bucket must be the lowest-error one
    assert(got.maxBy(_._2)._1 === got.map(_._1).min)
  }

  test("q176 bigram familiarity: hand-computed corpus supports, rares, and permilles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bgfam").toString
    // corpus bigram counts: "a b"×3 (common), "b a"/"b c"/"x y" ×1 (rare
    // at support<=2). d1 repeats "a b" so 2 of its 3 bigrams are familiar;
    // d3 is all-rare → familiarity 0 — the novel-vs-boilerplate split the
    // scaladoc claims.
    val rows = Seq(
      (1L, "a b a b", "en", "s1", 7L),
      (2L, "a b c", "en", "s1", 5L),
      (3L, "x y", "en", "s2", 3L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("q176_bigram_familiarity")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_bg"), r.getAs[Long]("n_rare"),
        r.getAs[Long]("familiar_permille"), r.getAs[Long]("avg_support_milli"))).toSeq
    assert(got === Seq(
      (1L, "s1", 3L, 1L, 666L, 2333L),
      (2L, "s1", 2L, 1L, 500L, 2000L),
      (3L, "s2", 1L, 1L, 0L, 1000L)))
  }

  test("q178 self-repetition: a period-8 looping doc is flagged, a diverse one is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-selfrep").toString
    // doc 1 loops an 8-token clause 3×: 17 gram positions but only 8
    // distinct grams (position i's gram is determined by i mod 8) — the
    // residue-1 gram lands at positions 1/9/17 (multiplicity 3), every
    // other residue twice → 9 repeated positions, 9*5 >= 17 → flagged.
    // doc 2 is 24 distinct tokens: zero repeats, not flagged.
    val loop = Seq.fill(3)(Seq("a", "b", "c", "d", "e", "f", "g", "h"))
      .flatten.mkString(" ")
    val diverse = (1 to 24).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, loop, "en", "s1", 47L), (2L, diverse, "en", "s1", 80L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("q178_self_repetition")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_flagged"), r.getAs[Long]("sum_pos"),
        r.getAs[Long]("sum_repeats"), r.getAs[Long]("max_multiplicity"))).toSeq
    assert(got === Seq(("s1", 2L, 1L, 34L, 9L, 3L)))
  }

  test("q181 cohesion: identical docs collide in all 4 bands at cohesion 1000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cohesion").toString
    // docs 1 and 2 are verbatim copies → identical shingle sets →
    // identical signatures → they share all 4 band buckets and every
    // out-of-band component is unanimous; doc 3 shares nothing and its
    // singleton buckets are filtered by the n_docs >= 2 gate.
    val dup = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val rows = Seq((1L, dup, "en", "s1", 60L), (2L, dup, "en", "s1", 60L),
      (3L, other, "en", "s1", 60L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.queries("q181_lsh_cohesion")(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unanimous_oob"),
        r.getAs[Long]("cohesion_permille"))).toSeq
    assert(got.length === 4)
    assert(got.forall(_ === ((2L, 6L, 1000L))))
  }

  test("q181 cohesion re-derives exactly from a driver-side MinHash recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sigs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getAs[String]("text").split(" ", -1)
        if (toks.length < 5) None else {
          val sh = toks.sliding(5).map(_.mkString(" ")).toSeq.distinct
          val hv = sh.map(s => java.lang.Long.parseLong(md5hex(s).take(8), 16))
          Some((0 until 8).map(i =>
            hv.map(h => ((2 * i + 1) * h + 7919L * i) % 4294967311L).min))
        }
      }
    val buckets = sigs.flatMap { sig =>
      (0 until 4).map(b => (s"$b:${sig(2 * b)}:${sig(2 * b + 1)}", b, sig))
    }
    val want = buckets.groupBy(x => (x._1, x._2)).toSeq
      .filter(_._2.length >= 2)
      .map { case ((bucket, band), xs) =>
        val unan = (0 until 8).count { i =>
          i != 2 * band && i != 2 * band + 1 &&
            xs.map(_._3(i)).distinct.size == 1
        }.toLong
        (bucket, xs.length.toLong, unan, unan * 1000L / 6L)
      }
      .sortBy { case (bucket, n, _, _) => (-n, bucket) }.take(20)
    val got = Dedup.queries("q181_lsh_cohesion")(spark, sf).collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_unanimous_oob"), r.getAs[Long]("cohesion_permille"))).toSeq
    assert(got === want)
  }

  test("q176 re-derives exactly from a driver-side bigram count over the fixture") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1).toSeq))
    val bgs = docs.map { case (id, s, toks) =>
      (id, s, toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
    }.filter(_._3.nonEmpty)
    val corpus = bgs.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val want = bgs.map { case (id, s, bs) =>
      val n = bs.size.toLong
      val rare = bs.count(corpus(_) <= 2L).toLong
      val sup = bs.map(corpus).sum
      (id, s, n, rare, (n - rare) * 1000L / n, sup * 1000L / n)
    }.sortBy(_._1)
    val got = TextAnalysis.queries("q176_bigram_familiarity")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_bg"), r.getAs[Long]("n_rare"),
        r.getAs[Long]("familiar_permille"), r.getAs[Long]("avg_support_milli"))).toSeq
    assert(got === want)
  }

  test("q184 symmetric-delete: one-substitution and identical heads pair, two-substitution heads never do") {
    // heads: doc1 = doc3 (identical → diff_pos -1), doc2 differs from
    // both at position 2 only (→ two diff_pos-2 pairs), doc4 differs
    // from every other head at ≥2 positions → shares no deletion
    // variant with anyone, by the SymSpell guarantee
    val dir = plantedDir(Seq(
      (1L, "alpha beta gamma delta tail1 tail2", "en", "s1", 30L),
      (2L, "alpha beta OTHER delta tail3 tail4", "en", "s1", 30L),
      (3L, "alpha beta gamma delta tail5 tail6", "en", "s1", 30L),
      (4L, "alpha WHO gamma WHAT tail7 tail8", "en", "s1", 30L)))
    val got = Dedup.queries("q184_symmetric_delete")(spark, dir).collect()
      .map(r => (r.getAs[Long]("diff_pos"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(got === Seq((-1L, 1L, 2L), (2L, 2L, 3L)))
  }

  test("q191 coverage curve: partial frequency class at the V boundary contributes (V - above) * cnt") {
    // frequencies: a×4, b×3, c..h ×1 → classes (4,1,4) (3,1,3) (1,6,6);
    // total 13 tokens, vocab 8. V=4 → full classes 4+3, partial
    // (4-2)·1 = 2 → 9 covered, 9·1000 div 13 = 692; V≥16 → everything.
    val dir = plantedDir(Seq(
      (1L, "a a a a b b", "en", "s1", 11L),
      (2L, "b c d e", "en", "s1", 7L),
      (3L, "f g h", "en", "s1", 5L)))
    val got = TextAnalysis.queries("q191_vocab_coverage")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("coverage_permille"))).toSeq
    assert(got === Seq(
      (4L, 9L, 13L, 692L),
      (16L, 13L, 13L, 1000L),
      (64L, 13L, 13L, 1000L),
      (256L, 13L, 13L, 1000L)))
  }

  test("q196 containment finds the embedded doc that q41's symmetric Jaccard misses") {
    // doc 1 (12 tokens → 8 five-shingles) is fully embedded at the head
    // of doc 2 (32 tokens → 28 shingles): containment(1→2) = 1000‰ but
    // jaccard = 8/28 ≈ 0.286 — under q41's 0.5 bar. The two queries
    // must partition the pair space: q196 reports exactly what q41
    // does not.
    val a = (1 to 12).map(i => s"t$i").mkString(" ")
    val b = ((1 to 12).map(i => s"t$i") ++ (1 to 20).map(i => s"u$i")).mkString(" ")
    val c = (1 to 12).map(i => s"z$i").mkString(" ")
    val dir = plantedDir(Seq(
      (1L, a, "en", "s1", 50L), (2L, b, "en", "s1", 130L), (3L, c, "en", "s1", 50L)))
    val got = Dedup.queries("q196_containment_pairs")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("cont_a"),
        r.getAs[Long]("cont_b"), r.getAs[String]("direction"))).toSeq
    assert(got === Seq((1L, 2L, 1000L, 285L, "a_in_b")))
    assert(Dedup.queries("q41_jaccard_pairs")(spark, dir).count() === 0L)
  }

  test("q184 re-derives exactly from brute-force head Hamming over sf0.001") {
    // the blocking scheme must be a pure execution strategy: same pairs
    // as the O(n²) driver-side Hamming scan it replaces (no bucket at
    // sf0.001 approaches the hot-key cap, so the cap never fires)
    val heads = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"), expr("slice(toks, 1, 4)").as("head")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1)))
    val pairs = for {
      (a, ha) <- heads; (b, hb) <- heads if a < b
      diffs = (0 until 4).filter(i => ha(i) != hb(i))
      if diffs.size <= 1
    } yield (a, b, if (diffs.isEmpty) -1L else diffs.head.toLong)
    val want = pairs.groupBy(_._3).map { case (dp, xs) =>
      (dp, xs.size.toLong, xs.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = Dedup.queries("q184_symmetric_delete")(spark, sf).collect()
      .map(r => (r.getAs[Long]("diff_pos"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(got === want)
  }

  test("q197 catches mosaic leakage that q75 and q139 both miss; clean eval docs stay out") {
    def bkt(id: Long) = graft.functions.HashOps.md5Prefix32(id.toString.getBytes) % 100
    val trainIds = (0L to 500L).filter(bkt(_) < 80)
    val valIds = (0L to 500L).filter(id => bkt(id) >= 80 && bkt(id) < 90)
    val testIds = (0L to 500L).filter(bkt(_) >= 90)
    val (tA, tB) = (trainIds(0), trainIds(1))
    val (evMosaic, evClean) = (valIds(0), testIds(0))
    val wordsA = (1 to 9).map(i => s"a$i").mkString(" ")   // 9 toks → 5 shingles
    val wordsB = (1 to 9).map(i => s"b$i").mkString(" ")
    val dir = plantedDir(Seq(
      (tA, wordsA, "en", "srcA", 0L),
      (tB, wordsB, "en", "srcB", 0L),
      // mosaic: 9 words of trainA + 9 of trainB → 14 shingles, of which
      // 5 are trainA's, 5 trainB's, and 4 span the seam (matched in
      // NEITHER train doc). Jaccard vs either train doc = 5/14+... well
      // below 0.5 (q139 blind), and the 8-token fp differs (q75 blind).
      (evMosaic, s"$wordsA $wordsB", "en", "srcE", 0L),
      (evClean, (1 to 9).map(i => s"c$i").mkString(" "), "en", "srcE", 0L)))
    val got = Dedup.queries("q197_gram_decontamination")(spark, dir).collect()
      .map(r => r.getAs[Long]("eval_doc") -> (r.getAs[String]("split"),
        r.getAs[Long]("nsh"), r.getAs[Long]("matched"), r.getAs[Long]("permille"))).toMap
    assert(got === Map(evMosaic -> (("validation", 14L, 10L, 714L))))
    // the family-partition premise: the pairwise arm really is blind here
    assert(Dedup.queries("q139_split_leakage")(spark, dir).count() === 0L)
  }

  test("q199 peel curve: whiskers and star leaves fall in round 1, the triangle is the 2-core") {
    // dup graph by construction: A-B-C identical (triangle), D-E identical
    // (whisker pair), F~G and F~H but G!~H (star) — 9-word docs, last/first
    // word substitutions give F-G and F-H jaccard 4/6 ≥ 0.5 while G-H is
    // 3/7 < 0.5. Peel: round 1 keeps {A,B,C,F} (deg≥2) but F's edges die
    // with its leaves → e1 = triangle; round 2 drops F; fixpoint (3,3).
    val tri = (1 to 9).map(i => s"t$i").mkString(" ")
    val duo = (1 to 9).map(i => s"d$i").mkString(" ")
    val f = (1 to 9).map(i => s"f$i")
    val dir = plantedDir(Seq(
      (0L, tri, "en", "s", 0L), (1L, tri, "en", "s", 0L), (2L, tri, "en", "s", 0L),
      (3L, duo, "en", "s", 0L), (4L, duo, "en", "s", 0L),
      (5L, f.mkString(" "), "en", "s", 0L),
      (6L, (f.init :+ "gX").mkString(" "), "en", "s", 0L),
      (7L, ("hX" +: f.tail).mkString(" "), "en", "s", 0L)))
    val got = Dedup.queries("q199_kcore_peel")(spark, dir).collect()
      .map(r => (r.getAs[Long]("peel_round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"))).toSeq
    val want = (1L to 8L).map(r => if (r == 1L) (1L, 4L, 3L) else (r, 3L, 3L))
    assert(got === want)
  }

  test("q200 band-grid curve re-derives exactly; coarser bands catch strict subsets") {
    val P = graft.functions.MinHashSig.P
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val shingles: Map[Long, Array[String]] = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .filter(_._2.split(" ", -1).length >= 5)
      .map { case (id, t) =>
        id -> t.split(" ", -1).sliding(5).map(_.mkString(" ")).toArray.distinct
      }.toMap
    val exploded = shingles.toSeq.flatMap { case (id, sh) =>
      sh.map(s => (id, sh.length.toLong, java.lang.Long.parseLong(md5hex(s).take(15), 16)))
    }
    val freq = exploded.groupBy(_._3).map { case (s, xs) => s -> xs.length }
    val kept = exploded.filter(e => { val f = freq(e._3); f >= 2 && f <= Dedup.MaxBucket })
    val pairs = kept.groupBy(_._3).values.toSeq.flatMap { g =>
      for (x <- g; y <- g if x._1 < y._1) yield ((x._1, y._1, x._2, y._2), 1L)
    }.groupBy(_._1).toSeq.map { case ((a, b, na, nb), xs) =>
      val c = xs.map(_._2).sum
      val j = BigDecimal(c.toDouble / (na + nb - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, j)
    }
    def sig(id: Long): Array[Long] = {
      val bases = shingles(id).map(s => java.lang.Long.parseLong(md5hex(s).take(8), 16))
      Array.tabulate(8)(i => bases.map(h => ((2L * i + 1L) * h + 7919L * i) % P).min)
    }
    val flags = pairs.map { case (a, b, j) =>
      val (sa, sb) = (sig(a), sig(b))
      val b8 = (0 until 8).exists(i => sa(i) == sb(i))
      val b4 = (0 until 4).exists(bb => sa(2 * bb) == sb(2 * bb) && sa(2 * bb + 1) == sb(2 * bb + 1))
      val b2 = (0 until 2).exists(bb => (0 until 4).forall(i => sa(4 * bb + i) == sb(4 * bb + i)))
      // structural monotonicity: a full 4-row band match implies both its
      // 2-row halves match, which imply their slots match
      assert(!b2 || b4); assert(!b4 || b8)
      (j, Map("b8r1" -> b8, "b4r2" -> b4, "b2r4" -> b2))
    }
    val want = Seq("b2r4", "b4r2", "b8r1").map { cfg =>
      val caught = flags.count(_._2(cfg)).toLong
      val good = flags.count(_._1 >= 0.5).toLong
      val goodCaught = flags.count(f => f._2(cfg) && f._1 >= 0.5).toLong
      val lowj = flags.count(f => f._2(cfg) && f._1 < 0.3).toLong
      (cfg, flags.size.toLong, caught, good, goodCaught, lowj,
        if (good > 0) goodCaught * 1000L / good else -1L)
    }
    val got = Dedup.queries("q200_band_grid")(spark, sf).collect()
      .map(r => (r.getAs[String]("config"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_caught"), r.getAs[Long]("n_good"),
        r.getAs[Long]("n_good_caught"), r.getAs[Long]("n_lowj_caught"),
        if (r.isNullAt(6)) -1L else r.getAs[Long]("recall_permille"))).toSeq
    assert(got === want)
  }

  test("q203 spectrum classes are bit-length doubling buckets with exact mass shares") {
    // counts x=4 y=2 z=1 → classes 3/2/1 (bit lengths), mass 4/2/1 of 7
    val dir = plantedDir(Seq((0L, "x x x x y y z", "en", "s", 0L)))
    val got = TextAnalysis.queries("q203_frequency_spectrum")(spark, dir).collect()
      .map(r => (r.getAs[Long]("freq_class"), r.getAs[Long]("n_types"),
        r.getAs[Long]("mass"), r.getAs[Long]("min_freq"), r.getAs[Long]("max_freq"),
        r.getAs[Long]("mass_permille"))).toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 1L, 1L, 142L),
      (2L, 1L, 2L, 2L, 2L, 285L),
      (3L, 1L, 4L, 4L, 4L, 571L)))
  }

  test("q205 elects the richest member, not the min id; ties fall to the lowest id") {
    val base = (1 to 9).map(i => s"t$i").mkString(" ")
    val dup = (1 to 9).map(i => s"d$i").mkString(" ")
    // cluster {5,6}: doc 6 embeds doc 5's text plus 3 extra tokens →
    // J = 5/8 ≥ 0.5, doc 6 is richer (nd 12 vs 9) → elected despite the
    // higher id (q73's min-id canonical would keep 5). cluster {7,8}:
    // identical → richness tie → lowest id 7. doc 9 is a singleton (no row).
    val dir = plantedDir(Seq(
      (5L, base, "en", "s", 0L),
      (6L, s"$base b1 b2 b3", "en", "s", 0L),
      (7L, dup, "en", "s", 0L), (8L, dup, "en", "s", 0L),
      (9L, (1 to 9).map(i => s"u$i").mkString(" "), "en", "s", 0L)))
    val got = Dedup.queries("q205_canonical_election")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
        r.getAs[Long]("keep_doc"), r.getAs[Long]("keep_q"),
        r.getAs[Long]("dropped_tokens"))).toSeq
    assert(got === Seq((5L, 2L, 6L, 12L, 9L), (7L, 2L, 7L, 9L, 9L)))
  }

  test("q220 CDC boundaries re-synchronize after a head edit; fixed-grid chunking does not") {
    import org.apache.spark.sql.functions._
    // doc 2 = doc 1 with 9 bytes INSERTED at the front. Content-defined
    // boundaries depend only on the local 8-byte window, so every
    // boundary of doc 1 past the edit reappears in doc 2 shifted by +9,
    // and the two docs share the identical chunk fingerprints between
    // re-sync and EOF — the property that justifies CDC over the
    // token-grid chunkers (q98/q100), for which a head edit shifts every
    // grid cell and kills all alignment.
    val body = (1 to 60).map(i => s"w$i").mkString(" ")
    val dir = plantedDir(Seq(
      (1L, body, "en", "s1", 0L),
      (2L, s"prefix9x $body", "en", "s2", 0L)))
    val bnd = Tables.documents(spark, dir)
      .select(col("doc_id"), GraftColumn(graft.functions.CdcBoundaries(
        GraftColumn.expr(col("text")))).as("b"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](1)).toMap
    // brute-force re-derivation of doc 1's boundaries (the oracle's
    // 8-term polynomial, computed independently of the expression)
    val bytes = body.getBytes("UTF-8").map(_ & 0xff)
    val brute = (8 to bytes.length).filter { p =>
      (0 until 8).map(k => bytes(p - 1 - k).toLong *
        graft.functions.CdcBoundaries.Pow31(k)).sum % 61 == 0
    }
    assert(bnd(1L) === brute, "expression must equal the per-position polynomial")
    assert(brute.nonEmpty, "fixture must actually produce boundaries")
    // every boundary of doc 1 reappears in doc 2 shifted by the 9-byte
    // insertion ONCE the window clears the edit (p > 8 past the insert)
    val shifted = bnd(1L).filter(_ > 8).map(_ + 9)
    assert(shifted.forall(bnd(2L).contains), "boundaries must survive the head edit")
    // and the shared chunks are visible in the savings report: both
    // sources hold identical post-resync chunks, so a cross-source run
    // of the chunk store would dedup them — here each source is unique
    // internally (savings 0), pinning the per-source grain
    val rep = Dedup.queries("q220_cdc_chunks")(spark, dir).collect()
    assert(rep.map(_.getAs[Long]("savings_milli")).forall(_ == 0L))
    // cross-source chunk overlap (what a global chunk store sees):
    val fps = Tables.documents(spark, dir)
      .withColumn("bnd", GraftColumn(graft.functions.CdcBoundaries(
        GraftColumn.expr(col("text")))))
      .withColumn("len", length(col("text")))
      .withColumn("ends", expr("array_distinct(concat(bnd, array(len)))"))
      .withColumn("fp", expr(
        """transform(ends, (e, i) -> md5(substring(text,
          |  CASE WHEN i = 0 THEN 1 ELSE ends[i-1] + 1 END,
          |  e - (CASE WHEN i = 0 THEN 0 ELSE ends[i-1] END))))""".stripMargin))
      .select(col("doc_id"), explode(col("fp")).as("fp"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("fp")).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "post-resync chunks must be fingerprint-identical across the edit")
  }

  test("cdcChunks is byte-domain: a non-ASCII document still tiles exactly") {
    // ADVICE r11: the earlier form derived boundaries over UTF-8 BYTES
    // but sliced with character-based substring, so any multi-byte
    // character silently broke tiling. Chunking now lives entirely in
    // the byte domain (cast to binary); this pins conservation and
    // fingerprint identity on a fixture where chars ≠ bytes.
    val text = ("héllo wörld — ünïcode 文書のチャンク分割テスト Ω≈ø " * 6).trim
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > text.length, "fixture must be genuinely multi-byte")
    val dir = plantedDir(Seq((1L, text, "xx", "s1", 0L)))
    val chunks = Dedup.cdcChunks(Tables.documents(spark, dir)).collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("clen")))
    assert(chunks.map(_._2).sum === bytes.length.toLong,
      "chunks must tile the UTF-8 byte length exactly")
    // independent re-derivation from raw bytes: boundary polynomial,
    // slices, md5 — the expression and the slicing must agree byte-wise
    val ub = bytes.map(_ & 0xff)
    val bnd = (8 to ub.length).filter { p =>
      (0 until 8).map(k => ub(p - 1 - k).toLong *
        graft.functions.CdcBoundaries.Pow31(k)).sum % 61 == 0
    }
    val ends = (bnd :+ ub.length).distinct.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = ends.zip(0 +: ends.dropRight(1)).map { case (e, s) =>
      val fp = md.digest(bytes.slice(s, e))
        .map("%02x".format(_)).mkString
      (fp, (e - s).toLong)
    }
    assert(chunks.sortBy(_._1).toSeq === want.sortBy(_._1),
      "byte-domain chunk fingerprints must match the raw-byte re-derivation")
  }

  test("q221 prefix-filter join is a superset of capped q41 and agrees pair-for-pair") {
    // the exactness contract: the cap in q41 can only LOSE pairs, never
    // change a surviving pair's score — so q41 ⊆ q221 with identical
    // (common, jaccard) on the intersection, at real-corpus scale.
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Double]("jaccard"))).toMap
    val exact = asMap(Dedup.queries("q221_prefix_filter_join")(spark, sf))
    val capped = asMap(Dedup.queries("q41_jaccard_pairs")(spark, sf))
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (k, v) => assert(exact(k) === v) }
    assert(exact.nonEmpty)
  }

  test("q222 separates a dup triangle from a dup chain") {
    // trio {1,2,3}: identical docs → 3 mutual J=1 edges → one triangle,
    // cc = 1000‰ at deg 2. pair {10,11}: a 30-word run shared between
    // otherwise-distinct docs (J = 26/46 ≈ 0.565, over the bar) → one
    // edge, NO triangle: the census must score triangle-less components
    // at zero — a q73 component glued by borderline pairs is a
    // transitivity-violating merge and this is the query that says so.
    val tri = (1 to 20).map(i => s"t$i").mkString(" ")
    val mid = (11 to 40).map(i => s"m$i")
    val docG = ((1 to 10).map(i => s"g$i") ++ mid).mkString(" ")
    val dir = plantedDir(Seq(
      (1L, tri, "en", "s", 0L), (2L, tri, "en", "s", 0L), (3L, tri, "en", "s", 0L),
      (10L, docG, "en", "s", 0L), (11L, (mid ++ (41 to 50).map(i => s"e$i")).mkString(" "), "en", "s", 0L)))
    // edges: {1,2},{1,3},{2,3} (triangle) and {10,11} via the shared
    // 30-word mid-run; fixture sanity first — the chain pair must clear
    // q41's bar so the census actually sees the edge
    val edges = Dedup.queries("q41_jaccard_pairs")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(edges === Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    val got = Dedup.queries("q222_triangle_census")(spark, dir).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"),
        r.getAs[Long]("n_tri"), r.getAs[Long]("cc_milli"))).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 1000L), (2L, 2L, 1L, 1000L), (3L, 2L, 1L, 1000L),
      (10L, 1L, 0L, 0L), (11L, 1L, 0L, 0L)))
  }

  test("q132's char_pair_counts kernel equals the per-position relational derivation") {
    // the codegen kernel must be a pure execution strategy: same (pair,
    // n, df) table as the transform+explode+countDistinct formulation it
    // replaced, over the real corpus (uncapped — compared before top-32)
    val docs = Tables.documents(spark, sf).filter(length(col("text")) >= 2)
    val relational = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("pair"))
      .filter(!col("pair").contains(" "))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
    val kernel = docs
      .select(explode(GraftColumn(graft.functions.CharPairCounts(
        GraftColumn.expr(col("text"))))).as("pc"))
      .groupBy(col("pc.pair").as("pair"))
      .agg(sum("pc.n").as("n"), count(lit(1)).as("df"))
    def tup(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"), r.getAs[Long]("df")))
      .toSeq.sortBy(_._1)
    val (a, b) = (tup(relational), tup(kernel))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q251 SNM finds adjacent-key twins and misses head-edited twins (the stated contract)") {
    // SNM's contract is two-sided: a near-dup pair whose sort keys agree
    // lands in the window (found); a pair whose difference is IN the key
    // prefix is separated by > w ranks and is the documented single-pass
    // miss. Pair (1,2): same 26-char head token, one tail token differs
    // → adjacent keys, jaccard 29/31 ≈ 935‰, must be reported. Pair
    // (3,4): identical except the head token 'a'*26 vs 'z'*26 — same
    // true jaccard, but ten filler docs sort between them (gap 13 > w=8)
    // → must NOT be reported, although a hash blocker (q41) would pair
    // them. Fillers share no tokens, so nothing else qualifies.
    val shared12 = (1 to 28).map(i => s"alpha$i").mkString(" ")
    val shared34 = (1 to 28).map(i => s"beta$i").mkString(" ")
    val fillers = "cdefghijkl".zipWithIndex.map { case (c, i) =>
      (10L + i, (c.toString * 26) + " " + (1 to 10).map(j => s"f$c$j").mkString(" "),
        "en", "s", 0L)
    }
    val dir = plantedDir(Seq(
      (1L, ("m" * 26) + " " + shared12 + " tailx", "en", "s", 0L),
      (2L, ("m" * 26) + " " + shared12 + " taily", "en", "s", 0L),
      (3L, ("a" * 26) + " " + shared34 + " tailq", "en", "s", 0L),
      (4L, ("z" * 26) + " " + shared34 + " tailq", "en", "s", 0L)) ++ fillers)
    val pairs = Dedup.queries("q251_sorted_neighborhood")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((1L, 2L)), "adjacent-key twin pair must be found")
    assert(!pairs.contains((3L, 4L)), "head-edited twins separated by > w ranks " +
      "must be the documented miss (single-pass SNM key-start blindness)")
    assert(pairs === Set((1L, 2L)), s"only the planted adjacent pair qualifies: $pairs")
    // the miss is a WINDOW effect, not a similarity one: (3,4)'s true
    // jaccard clears the 500‰ bar by direct computation
    import spark.implicits._
    val j34 = Seq(1).toDF("x").select(
      expr(s"size(array_intersect(split('${("a" * 26)} $shared34 tailq', ' '), " +
        s"split('${("z" * 26)} $shared34 tailq', ' '))) * 1000 div " +
        s"size(array_union(split('${("a" * 26)} $shared34 tailq', ' '), " +
        s"split('${("z" * 26)} $shared34 tailq', ' ')))").as("j"))
      .head().getLong(0)
    assert(j34 >= 500L, s"planted miss pair must truly be a near-dup (got $j34)")
  }

  test("q223 fixed-point surprisal matches hand arithmetic and ranks rare above common") {
    // corpus: "a a a a" + "b" → N=5, V=2. token a: q=(5+2)//(4+1)=1 →
    // 0 milli-bits; token b: q=7//2=3 → k=1, interp (3-2)*1000//2=500 →
    // 1500 milli-bits. The all-common doc scores 0; the rare doc 1500.
    val dir = plantedDir(Seq(
      (1L, "a a a a", "en", "s", 0L), (2L, "b", "en", "s", 0L)))
    val got = TextAnalysis.queries("q223_unigram_surprisal")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("bpt_milli"), r.getAs[Long]("band"))).toSeq
    assert(got === Seq((1L, 4L, 0L, 0L), (2L, 1L, 1500L, 1L)))
  }

  test("q325: brute assortativity over the q41 edge set matches exactly") {
    val edges = Dedup.queries("q41_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val sym = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n2 = BigInt(sym.length)
    val sx = sym.map(e => BigInt(deg(e._1))).sum
    val sy = sym.map(e => BigInt(deg(e._2))).sum
    val sxx = sym.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    val sxy = sym.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    val syy = sym.map(e => BigInt(deg(e._2)) * deg(e._2)).sum
    val (cxy, cxx, cyy) = (n2 * sxy - sx * sy, n2 * sxx - sx * sx, n2 * syy - sy * sy)
    val r2 = if (cxx > 0 && cyy > 0) ((cxy.abs * 1000 / cxx) * cxy.abs / cyy).toLong else 0L
    val got = graft.operators.Dedup.queries("q325_assortativity")(spark, sf).collect()
    assert(got.length === 1)
    val g = got(0)
    assert(g.getAs[Long]("n_nodes") === deg.size.toLong)
    assert(g.getAs[Long]("n_edges") === edges.length.toLong)
    assert(g.getAs[Long]("avg_deg_milli") === (n2 * 1000 / deg.size).toLong)
    assert(g.getAs[Long]("r_sign") === cxy.signum.toLong)
    assert(g.getAs[Long]("r2_permille") === r2)
    assert(r2 <= 1000L, "Cauchy-Schwarz bound broken")
  }

  test("q344: brute union-find modularity over the q41 edge set matches") {
    val edges = Dedup.queries("q41_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sym = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dc = deg.toSeq.groupBy { case (node, _) => find(node) }
      .view.mapValues(_.map(_._2).sum).toMap
    val m = edges.length.toLong
    val sd2 = dc.values.map(d => BigInt(d) * d).sum
    val qMilli = if (m > 0) 1000L - (sd2 * 1000 / (BigInt(4) * m * m)).toLong else 0L
    val topShare = if (m > 0) dc.values.max * 1000 / (2 * m) else 0L
    val got = Dedup.queries("q344_modularity")(spark, sf).collect()
    assert(got.length === 1)
    val g = got(0)
    assert(g.getAs[Long]("n_edges") === m)
    assert(g.getAs[Long]("n_components") === dc.size.toLong)
    assert(g.getAs[Long]("q_milli") === qMilli, "modularity")
    assert(g.getAs[Long]("top_share_permille") === topShare)
    assert(qMilli <= 1000L && qMilli >= 0L, "Q in [0,1000] for a CC partition")
  }

  test("q345: brute fixed-point BM25 matches; top-10 is the true top-10") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1).split(" ", -1).toSeq))
    val qTerms = Seq("dup", "vector", "hash")
    val nDocs = docs.length.toLong
    val sTok = docs.map(_._2.length.toLong).sum
    def log2milli(x: Long): Long = {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(x) // length(bin(x))
      val p = 1L << (bl - 1)
      1000L * (bl - 1) + (x - p) * 1000 / p
    }
    val df = qTerms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val idf = qTerms.map(t =>
      t -> (log2milli(2 * nDocs + 2) - log2milli(2 * df(t) + 1))).toMap
    val scores = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val terms = qTerms.map(t => t -> toks.count(_ == t).toLong)
        .filter(_._2 > 0)
      if (terms.isEmpty) None
      else Some((id, dl, terms.length.toLong, terms.map { case (t, tf) =>
        (BigInt(idf(t)) * (BigInt(22) * tf * sTok) /
          (BigInt(10) * tf * sTok + BigInt(3) * sTok + BigInt(9) * dl * nDocs))
          .toLong
      }.sum))
    }
    val expTop = scores.sortBy { case (id, _, _, sc) => (-sc, id) }.take(10)
    val got = TextAnalysis.queries("q345_bm25")(spark, sf).collect()
    assert(got.length === expTop.length)
    got.zip(expTop).foreach { case (g, (id, dl, nt, sc)) =>
      assert(g.getAs[Long]("doc_id") === id, "top-10 order")
      assert(g.getAs[Long]("dl") === dl)
      assert(g.getAs[Long]("n_terms_hit") === nt)
      assert(g.getAs[Long]("score_milli") === sc, s"score at doc $id")
    }
    assert(expTop.forall(_._4 >= 0), "Lucene-variant IDF keeps scores nonneg")
  }

  test("q362: brute Chao1 richness and Good coverage match; lower-bound holds") {
    val toks = Tables.documents(spark, sf)
      .selectExpr("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sObs = freq.size.toLong
    val n = toks.length.toLong
    val f1 = freq.values.count(_ == 1L).toLong
    val f2 = freq.values.count(_ == 2L).toLong
    val chao1 = sObs * 1000 + f1 * (f1 - 1) * 1000 / (2 * (f2 + 1))
    val cov = if (n > 0) 1000 - f1 * 1000 / n else 0L
    val g = TextAnalysis.queries("q362_chao1_richness")(spark, sf).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("s_obs") === sObs)
    assert(g.head.getAs[Long]("n_tokens") === n)
    assert(g.head.getAs[Long]("f1") === f1)
    assert(g.head.getAs[Long]("f2") === f2)
    assert(g.head.getAs[Long]("chao1_milli") === chao1)
    assert(g.head.getAs[Long]("coverage_permille") === cov)
    assert(chao1 >= sObs * 1000, "Chao1 is a lower bound ABOVE S_obs")
  }
}
