package graft

import graft.functions.JaroWinkler
import graft.operators.WebOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Semantic claims of the round-13 web-corpus operators (output equality
  * vs DuckDB is the oracle gate's job):
  *
  *  - the JaroWinkler expression reproduces the published golden vectors
  *    (Winkler's MARTHA/MARHTA etc.), is symmetric, bounded in [0,1],
  *    applies the boost ONLY above 0.7, and returns 0 on empty input —
  *    the exact contract pinned against DuckDB's native function;
  *  - q290's linkage report: the true origin wins top-1 for most dirty
  *    variants (the blocking key guarantees it is in-block), counters
  *    are conserved;
  *  - q287: two planted URLs that alias (differing only in stripped
  *    dimensions: case, www., :443, utm/fbclid, fragment) collapse to
  *    ONE canonical form; a URL differing in a KEPT param does not;
  *  - q288: planted hosts hit the intended rules — a 2-label rule blocks
  *    through two subdomain labels, the deepest rule wins on multi-match,
  *    and co.uk registered domains take three labels;
  *  - q289 equals a plain-Scala BFS re-derivation from the collected edge
  *    list (level parity and counts), not just row sanity.
  */
class WebOpsSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler: golden vectors, symmetry, bounds, boost threshold") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    // jaro 0.7333 > 0.7 but common prefix 0: boost is a no-op
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
    // jaro 0.4444 < 0.7 with prefix 1: boost must NOT apply
    assert(math.abs(jw("axxxxx", "ayyyyy") - 0.4444444444444444) < 1e-12)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches
    assert(jw("abcd", "abcd") == 1.0)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    for ((a, b) <- Seq(("jellyfish", "smellyfish"), ("small ring", "smal ring"),
        ("red widget", "rde widget"))) {
      assert(jw(a, b) == jw(b, a), s"not symmetric on ($a, $b)")
      assert(jw(a, b) >= 0.0 && jw(a, b) <= 1.0)
    }
  }

  test("JaroWinkler: byte-based non-ASCII contract (documented divergence)") {
    // The expression walks UTF-8 BYTES (see JaroWinkler scaladoc + the
    // jaro_winkler registration info string): a 2-byte character like
    // 'é' counts as two units, so identical non-ASCII strings still
    // score 1.0 but mixed ASCII/accented pairs diverge from char-based
    // engines. Pin the byte semantics so a silent switch to code-point
    // matching shows up here.
    assert(jw("café", "café") == 1.0)           // identical bytes: exact 1
    // "café" = 5 bytes (c,a,f,0xC3,0xA9) vs "cafe" = 4 bytes: the 0xC3/0xA9
    // bytes are unmatched -> byte-based jaro = (3/5 + 3/4 + 3/3)/3 = 0.7833,
    // boosted by prefix 3 -> 0.8483; char-based JW would give 0.8833/0.9417.
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
    assert(jw("café", "cafe") == jw("cafe", "café")) // symmetric under bytes
    // bounds hold for arbitrary multi-byte input
    for ((a, b) <- Seq(("日本語", "日本誤"), ("żółć", "zolc"), ("ÄÖÜ", "AOU"))) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"out of bounds on ($a, $b): $v")
      assert(v == jw(b, a), s"not symmetric on ($a, $b)")
    }
  }

  test("q290: true origin dominates top-1; counters conserved") {
    val rows = WebOps.queries("q290_jw_linkage")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("kind")).sorted.toSeq == Seq("del", "sub", "swap"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_names")
      assert(r.getAs[Long]("n_top1_correct") <= n)
      // single-char typos on multi-word names: JW keeps the true match
      // clearly separable — require a strong majority, not a data fluke
      assert(r.getAs[Long]("n_top1_correct") * 3 >= n * 2,
        s"true origin should win top-1 for >= 2/3 of names: $r")
      assert(r.getAs[Long]("n_pairs") >= n)
      assert(r.getAs[Long]("sum_true_jw_micro") <= n * 1000000L)
    }
  }

  private def plantedDocs(ids: Seq[Long]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-web").toString
    ids.map(i => (i, "text body", "en", s"src${i % 20}", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q287: stripped-dimension aliases collapse; kept params do not") {
    // doc 1 vs 301: same host (%20), path (%50), id (%25), ref (%3), both
    // odd (param order), differ ONLY in fbclid (%7: 1 vs 0) -> one canon.
    // doc 61: same source class but different path/id -> distinct canon.
    val dir = plantedDocs(Seq(1L, 301L, 61L))
    val got = WebOps.queries("q287_url_canonical")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_raw_distinct"),
          r.getAs[Long]("n_canon_distinct"))).toMap
    assert(got("src1") == ((3L, 3L, 2L)), s"got $got")
  }

  test("q288: suffix rules fire at the right depths; co.uk takes 3 labels") {
    // doc 7  -> a.b.dom7.com   : blocked by 2-label rule through 2 sublabels
    // doc 72 -> a.b.dom12.co.uk: matches dom12.co.uk AND the 5-label
    //           carve-out -> deep (max depth 5); reg domain dom12.co.uk
    // doc 6  -> cdn.dom6.com   : exact 3-label rule -> deep
    // doc 8  -> dom8.co.uk     : unblocked, reg domain takes 3 labels
    val dir = plantedDocs(Seq(7L, 72L, 6L, 8L))
    val got = WebOps.queries("q288_domain_blocklist")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_blocked"), r.getAs[Long]("n_deep_blocked"),
          r.getAs[Long]("n_reg_domains"))).toMap
    assert(got("src7") == ((1L, 0L, 1L)), s"src7: $got")   // parent-rule block, depth 2
    assert(got("src12") == ((1L, 1L, 1L)), s"src12: $got") // multi-match, deepest 5
    assert(got("src6") == ((1L, 1L, 1L)), s"src6: $got")   // exact cdn rule, depth 3
    assert(got("src8") == ((0L, 0L, 1L)), s"src8: $got")   // unblocked
  }

  test("q289: equals a plain-Scala level-synchronous BFS") {
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._2).map { case (k, v) => (k, v.map(_._1).toSet) }
    val byPart = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val p0 = edges.map(_._1).filter(_ % 100 == 0).toSet
    val s1 = p0.flatMap(p => byPart.getOrElse(p, Set.empty[Long]))
    val p2 = s1.flatMap(sp => bySupp.getOrElse(sp, Set.empty[Long])) -- p0
    val s3 = p2.flatMap(p => byPart.getOrElse(p, Set.empty[Long])) -- s1
    val p4 = s3.flatMap(sp => bySupp.getOrElse(sp, Set.empty[Long])) -- p0 -- p2
    val brute = Seq(("p", 0L, p0.size.toLong), ("s", 1L, s1.size.toLong),
      ("p", 2L, p2.size.toLong), ("s", 3L, s3.size.toLong),
      ("p", 4L, p4.size.toLong)).filter(_._3 > 0).sortBy(x => (x._1, x._2))
    val got = WebOps.queries("q289_khop_reach")(spark, sf).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("dist"),
        r.getAs[Long]("n_nodes"))).toSeq.sortBy(x => (x._1, x._2))
    assert(got == brute, s"BFS mismatch:\ngot   $got\nbrute $brute")
  }

  test("q330: brute integer HITS (4 max-normalized half-steps) matches") {
    val e = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val mx = raw.values.max
      raw.view.mapValues(v => v * 1000L / mx).toMap
    }
    val h1 = norm(e.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    val a1 = norm(e.groupBy(_._1).view.mapValues(_.map(x => h1(x._2)).sum).toMap)
    val h2 = norm(e.groupBy(_._2).view.mapValues(_.map(x => a1(x._1)).sum).toMap)
    val a2 = norm(e.groupBy(_._1).view.mapValues(_.map(x => h2(x._2)).sum).toMap)
    def top(m: Map[Long, Long]): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = graft.operators.WebOps.queries("q330_hits_scores")(spark, sf).collect()
    assert(got.length === 20)
    val gotA = got.filter(_.getAs[String]("kind") == "authority")
      .map(r => (r.getAs[Long]("node_id"), r.getAs[Long]("score"))).toSeq
    val gotH = got.filter(_.getAs[String]("kind") == "hub")
      .map(r => (r.getAs[Long]("node_id"), r.getAs[Long]("score"))).toSeq
    assert(gotA === top(a2))
    assert(gotH === top(h2))
    // max-normalization contract: each side's argmax sits at exactly 1000
    assert(gotA.head._2 === 1000L)
    assert(gotH.head._2 === 1000L)
  }
}
