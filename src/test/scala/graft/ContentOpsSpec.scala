package graft

import graft.contentops.{ContentOps, Fixture, HttpResolver}
import org.apache.spark.sql.functions._

/** The reference's normative test material (SURVEY.md §5): the golden
  * draft/published interleaving (user-guide.md:125-139), forced S3-path
  * coverage (:17), proxy publish rules (:145), and the error-skip path
  * (:36-39), asserted over the wire fixture. */
class ContentOpsSpec extends SparkSpec {

  test("wire round-trip: gunzip(gzip(x)) == x") {
    val x = "payload é中".getBytes("UTF-8")
    assert(Fixture.gunzip(Fixture.gzip(x)).sameElements(x))
  }

  test("fixture forces both payload paths and a broken-URL loss") {
    assert(Fixture.ops.exists(o => Fixture.isIndirect(o.seq)))
    assert(Fixture.ops.exists(o => !Fixture.isIndirect(o.seq)))
    assert(Fixture.ops.count(Fixture.isLost) >= 3)
    // loss is only possible on the indirected path: every broken seq must
    // itself be indirect, or `expected` would desync from pipeline output.
    assert(Fixture.ops.filter(o => Fixture.isBroken(o.seq))
      .forall(o => Fixture.isIndirect(o.seq)),
      "a broken-URL seq is not S3-indirected — moduli out of sync")
  }

  test("ingest: broken fetches and non-content-operation records are skipped, rest survive") {
    val env = ContentOps.envelope(spark).cache()
    assert(env.count() === Fixture.expected.size)
    // the alien "ping" record must not appear
    assert(env.filter(col("seq") === Fixture.AlienSeq).count() === 0)
    // every surviving seq is exactly the expected set
    val got = env.select("seq").collect().map(_.getString(0)).toSet
    assert(got === Fixture.expected.map(o => Fixture.seqStr(o.seq)).toSet)
  }

  test("mapPartitions resolver (production shape) is row-identical to the projection path") {
    val viaMp = ContentOps.resolveViaMapPartitions(spark)
      .filter(col("raw").isNotNull)
    // surviving seqs = expected ops + the alien record (type-filtered later)
    val got = viaMp.select("seq").collect().map(_.getString(0)).toSet
    assert(got === (Fixture.expected.map(o => Fixture.seqStr(o.seq)).toSet + Fixture.AlienSeq))
    // inline and indirected records both resolve to the exact envelope JSON
    val rawBySeq = viaMp.filter(col("seq") =!= Fixture.AlienSeq).collect()
      .map(r => r.getAs[String]("seq") -> r.getAs[String]("raw")).toMap
    Fixture.expected.foreach { o =>
      assert(rawBySeq(Fixture.seqStr(o.seq)) === Fixture.envelopeJson(o), s"seq ${o.seq}")
    }
  }

  test("real-HTTP resolver against an in-JVM fixture server is row-identical; 404/timeout/corrupt skip") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import spark.implicits._
    // An actual HTTP server (JDK built-in, loopback, ephemeral port)
    // serving the SAME gzipped objects the broadcast store holds — the
    // closest a zero-egress sandbox gets to the reference's pre-signed-S3
    // fetch (user-guide.md:32-44), network stack included.
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def ctx(path: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = try f(ex) finally ex.close()
      })
    ctx("/objects/") { ex =>
      Fixture.objectStore.get("https://fixture-store" + ex.getRequestURI.getPath) match {
        case Some(b) =>
          ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1L)
      }
    }
    ctx("/missing/") { ex => ex.sendResponseHeaders(404, -1L) }
    ctx("/slow/") { ex =>
      Thread.sleep(3000L)
      ex.sendResponseHeaders(200, -1L)
    }
    ctx("/corrupt/") { ex => // 200 but NOT gzip: decode must skip, not throw
      val b = "definitely not gzip".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length.toLong); ex.getResponseBody.write(b)
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // Same wire fixture, pre-signed URLs re-pointed at the local server
      // (plain http ⇒ widen the branch predicate for the test only).
      val rewritten = ContentOps.decodedPayloads(spark).map { case (sh, sq, p) =>
        (sh, sq,
          if (p != null && p.startsWith("https://fixture-store"))
            p.replace("https://fixture-store", base)
          else p)
      }
      val viaHttp = HttpResolver.resolve(rewritten, isUrl = _.startsWith("http"))
      val got = viaHttp.filter(col("raw").isNotNull).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      val want = ContentOps.resolveViaMapPartitions(spark).filter(col("raw").isNotNull)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      assert(got === want, "HTTP path must be row-identical to the broadcast stand-in")
      // failure tolerance: 404, read-timeout, corrupt body, connection
      // refused — each resolves to null (skip); inline payloads pass through
      val hard = Seq(
        (0, "t404", s"$base/missing/1"),
        (0, "tslow", s"$base/slow/1"),
        (0, "tgarb", s"$base/corrupt/1"),
        (0, "tconn", "http://127.0.0.1:9/unreachable"),
        (1, "tinln", """{"inline":true}"""))
      val out = HttpResolver.resolve(spark.createDataset(hard),
          timeoutMs = 300L, isUrl = _.startsWith("http"))
        .collect().map(r => r.getString(1) -> Option(r.getString(2))).toMap
      assert(out("t404").isEmpty && out("tslow").isEmpty &&
        out("tgarb").isEmpty && out("tconn").isEmpty)
      assert(out("tinln").contains("""{"inline":true}"""))
    } finally server.stop(0)
  }

  test("golden sequence: two independent latest-state rows, never a publish cycle") {
    val latest = ContentOps.queries("q52_latest_state")(spark, sf)
      .filter(col("id") === "ABC").collect()
    assert(latest.length === 2, "draft and published copies are distinct entities")
    val bySeq = latest.map(r => r.getAs[Boolean]("published") -> r.getAs[String]("last_seq")).toMap
    assert(bySeq(false) === Fixture.seqStr(3)) // draft updated at seq 0, then 3
    assert(bySeq(true) === Fixture.seqStr(4))  // published updated at seq 1, 2, then 4
    // the naive mis-reading would emit publish/unpublish flaps for ABC;
    // the transition detector emits exactly ONE publish and no unpublish.
    val trans = ContentOps.queries("q54_publish_transitions")(spark, sf)
      .filter(col("id") === "ABC").collect()
    assert(trans.map(_.getAs[String]("event")).toSeq === Seq("publish"))
  }

  test("proxy rules: XYZ publish then unpublish (user-guide.md:145)") {
    val ev = ContentOps.queries("q53_publish_proxy")(spark, sf)
      .filter(col("id") === "XYZ").orderBy("seq").collect()
    assert(ev.map(_.getAs[String]("event")).toSeq === Seq("publish", "unpublish"))
  }

  test("created flag: true exactly on first insert per composite key") {
    val env = ContentOps.envelope(spark)
    val firstInserts = env.filter(col("operation").startsWith("insert"))
      .groupBy("id", "branch", "published").agg(min("seq").as("first_seq"))
    val wrong = env.join(firstInserts, Seq("id", "branch", "published"))
      .filter(col("operation").startsWith("insert"))
      .filter((col("seq") === col("first_seq")) =!= col("created"))
      // keys whose very first insert was lost to a broken URL, or that were
      // deleted and re-inserted, legitimately diverge from this proxy check
      .filter(!col("id").isin(
        Fixture.ops.filter(o => Fixture.isLost(o) ||
          o.operation.startsWith("delete")).map(_.id).distinct: _*))
    assert(wrong.count() === 0)
  }

  test("observe(): ingest drop metrics surface without a second scan (A19 observability)") {
    import graft.functions.GzipDecode
    import org.apache.spark.sql.GraftColumn
    // the reference prints-and-continues on failed fetches; the engine's
    // equivalent telemetry is an observe() on the ingest frame — metrics
    // ride the same pass, no extra action.
    val store = spark.sparkContext.broadcast(Fixture.objectStore)
    val resolve = org.apache.spark.sql.functions.udf((p: String) =>
      if (p == null) null
      else if (p.startsWith("https"))
        store.value.get(p).map(b => new String(Fixture.gunzip(b), java.nio.charset.StandardCharsets.UTF_8)).orNull
      else p)
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation("ingest")
    val observed = spark.createDataset(Fixture.wireRecords).toDF()
      .withColumn("raw", resolve(GraftColumn(GzipDecode(GraftColumn.expr(col("payload"))))))
      .observe(obs,
        count(lit(1)).as("n_records"),
        count(when(col("raw").isNull, 1)).as("n_dropped"))
      .filter(col("raw").isNotNull)
    observed.count()
    val metrics = obs.get
    assert(metrics("n_records") === Fixture.wireRecords.size.toLong)
    assert(metrics("n_dropped") === Fixture.ops.count(Fixture.isLost).toLong)
  }

  test("tombstones: deleted keys are absent from latest-state") {
    val env = ContentOps.envelope(spark)
    val latest = ContentOps.queries("q52_latest_state")(spark, sf)
    // keys whose newest op is a delete must not appear
    val lastOps = env.groupBy("id", "branch", "published")
      .agg(max_by(col("operation"), struct(col("date"), col("seq"))).as("last_op"))
    val deleted = lastOps.filter(col("last_op").startsWith("delete"))
      .select("id", "branch", "published")
    assert(latest.join(deleted, Seq("id", "branch", "published"), "left_semi").count() === 0)
    assert(latest.count() + deleted.count() ===
      env.select("id", "branch", "published").distinct().count())
  }
}
