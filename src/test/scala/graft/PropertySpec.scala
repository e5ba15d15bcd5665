package graft

import java.sql.Timestamp

import graft.functions.GraftFunctions
import graft.streaming.ContentStream.EnvelopeRow
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5): latest-state is a fold that is
  * invariant under arrival-order shuffling (per-shard order ≠ per-key
  * order, user-guide.md:13,125-139), and the SQL-registered custom
  * functions agree with their DataFrame forms. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genOp: Gen[(String, String, Boolean, Int, String)] = for {
    id <- Gen.oneOf("A", "B", "C")
    branch <- Gen.oneOf("default", "v2")
    published <- Gen.oneOf(true, false)
    dateOff <- Gen.choose(0, 10000)
    verb <- Gen.frequency(4 -> "insert", 1 -> "delete")
  } yield (id, branch, published, dateOff, verb)

  private def latestStateOf(rows: Seq[EnvelopeRow]): Set[(String, String, Boolean, String)] = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
      .groupBy("id", "branch", "published")
      .agg(max_by(struct(col("seq"), col("operation")), struct(col("date"), col("seq"))).as("last"))
      .filter(!col("last.operation").startsWith("delete"))
      .select("id", "branch", "published", "last.seq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3))).toSet
  }

  test("latest-state is invariant under arrival-order permutation") {
    check(Prop.forAll(Gen.listOfN(40, genOp), Gen.long) { (ops, seed) =>
      val rows = ops.zipWithIndex.map { case ((id, br, pub, off, verb), i) =>
        EnvelopeRow(f"$i%06d", s"$verb-story", new Timestamp(1700000000000L + off * 1000L),
          id, br, pub, created = false, s"h$i", 100)
      }
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      latestStateOf(rows) == latestStateOf(shuffled)
    }, 10)
  }

  test("latest-state folds incrementally: fold(a ++ b) == fold(fold(a) updates ++ b) keys") {
    check(Prop.forAll(Gen.listOfN(30, genOp), Gen.listOfN(30, genOp)) { (a, b) =>
      val mk = (ops: Seq[(String, String, Boolean, Int, String)], base: Int) =>
        ops.zipWithIndex.map { case ((id, br, pub, off, verb), i) =>
          EnvelopeRow(f"${base + i}%06d", s"$verb-story",
            new Timestamp(1700000000000L + off * 1000L), id, br, pub,
            created = false, s"h${base + i}", 100)
        }
      val all = mk(a, 0) ++ mk(b, 1000)
      // batch over everything == batch over everything in two chunks unioned
      latestStateOf(all) == latestStateOf(mk(a, 0) ++ mk(b, 1000))
    }, 5)
  }

  test("SQL-registered functions equal their DataFrame forms") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox", "lazy dog the the").toDF("text")
    df.createOrReplaceTempView("prop_texts")
    val viaSql = spark.sql(
      """SELECT simhash32(split(text, ' ')) AS sh,
        |       minhash_sig(split(text, ' '))[0] AS mh0 FROM prop_texts ORDER BY sh""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = df.select(
        org.apache.spark.sql.GraftColumn(graft.functions.SimHash32(
          org.apache.spark.sql.GraftColumn.expr(split(col("text"), " ")))).as("sh"),
        element_at(org.apache.spark.sql.GraftColumn(graft.functions.MinHashSig(
          org.apache.spark.sql.GraftColumn.expr(split(col("text"), " ")), 8)), 1).as("mh0"))
      .orderBy("sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
  }

  test("vector kernels are bit-identical to their higher-order-lambda forms") {
    GraftFunctions.register(spark)
    val genVec = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      import spark.implicits._
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      df.createOrReplaceTempView("prop_vec")
      val row = spark.sql(
        """SELECT double_dot(a, b) AS d1,
          |  aggregate(zip_with(a, b, (x, y) -> x*y), CAST(0 AS DOUBLE), (s, x) -> s + x) AS d2,
          |  double_norm_sq(a) AS n1,
          |  aggregate(a, CAST(0 AS DOUBLE), (s, x) -> s + x*x) AS n2,
          |  snap_grid(a, 1000000) AS g1,
          |  transform(a, x -> CAST(round(x * 1000000) AS BIGINT)) AS g2,
          |  long_dot(snap_grid(a, 1000), snap_grid(b, 1000)) AS l1,
          |  aggregate(zip_with(snap_grid(a, 1000), snap_grid(b, 1000), (x, y) -> x*y),
          |            CAST(0 AS BIGINT), (s, x) -> s + x) AS l2,
          |  long_norm_sq(snap_grid(a, 1000)) AS q1,
          |  aggregate(snap_grid(a, 1000), CAST(0 AS BIGINT), (s, x) -> s + x*x) AS q2
          |FROM prop_vec""".stripMargin).head()
      // bit-identical doubles: compare raw bits, not approximate equality
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)) &&
      java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(3)) &&
      row.getSeq[Long](4) == row.getSeq[Long](5) &&
      row.getLong(6) == row.getLong(7) &&
      row.getLong(8) == row.getLong(9)
    }, 20)
  }

  test("vector kernel SQL builders reject wrong arity at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Tuple1(Array(1.0, 2.0))).toDF("a").createOrReplaceTempView("prop_vec_arity")
    for (bad <- Seq("double_dot(a)", "long_norm_sq(a, a)", "snap_grid(a)")) {
      val e = intercept[Exception](spark.sql(s"SELECT $bad FROM prop_vec_arity").collect())
      assert(e.getMessage.contains("expects"), s"$bad: ${e.getMessage}")
    }
  }

  test("word_shingles and word_bigrams work through the SQL surface") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a b c d e f").toDF("text").createOrReplaceTempView("prop_shingle")
    val row = spark.sql(
      """SELECT size(word_shingles(split(text, ' '), 5)) AS n5,
        |       word_bigrams(split(text, ' '))[0] AS bg0 FROM prop_shingle""".stripMargin).head()
    assert(row.getInt(0) === 2) // "a b c d e", "b c d e f"
    assert(row.getString(1) === "a b")
    val e = intercept[Exception](
      spark.sql("SELECT word_shingles(split(text, ' ')) FROM prop_shingle").collect())
    assert(e.getMessage.contains("expects"))
  }

  test("gzip_decode via SQL round-trips and null-propagates") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(graft.contentops.Fixture.gzip("round trip ok".getBytes("UTF-8")))
      .toDF("b").createOrReplaceTempView("prop_gz")
    assert(spark.sql("SELECT gzip_decode(b) FROM prop_gz").head.getString(0) === "round trip ok")
  }
}
