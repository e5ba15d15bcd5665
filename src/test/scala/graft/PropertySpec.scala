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

  private def latestStateOf(rows: Seq[EnvelopeRow]): Set[(String, String, Boolean, Long)] = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
      .groupBy("id", "branch", "published")
      .agg(max_by(struct(col("seq"), col("operation")), struct(col("date"), col("seq"))).as("last"))
      .filter(!col("last.operation").startsWith("delete"))
      .select("id", "branch", "published", "last.seq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getLong(3))).toSet
  }

  test("latest-state is invariant under arrival-order permutation") {
    check(Prop.forAll(Gen.listOfN(40, genOp), Gen.long) { (ops, seed) =>
      val rows = ops.zipWithIndex.map { case ((id, br, pub, off, verb), i) =>
        EnvelopeRow(i.toLong, s"$verb-story", new Timestamp(1700000000000L + off * 1000L),
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
          EnvelopeRow((base + i).toLong, s"$verb-story",
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

  test("gzip_decode via SQL round-trips and null-propagates") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(graft.contentops.Fixture.gzip("round trip ok".getBytes("UTF-8")))
      .toDF("b").createOrReplaceTempView("prop_gz")
    assert(spark.sql("SELECT gzip_decode(b) FROM prop_gz").head.getString(0) === "round trip ok")
  }
}
