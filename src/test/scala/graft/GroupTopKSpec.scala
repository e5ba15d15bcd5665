package graft

import graft.plans.{GroupTopK, GroupTopKStrategy}
import org.apache.spark.sql.functions._

/** The custom per-group top-k physical operator
  * (`graft/plans/GroupTopK.scala`): result equality against the window
  * form on crafted fixtures (ties at the boundary, groups smaller than
  * k), and the install contract. The sf-data hash match vs the window
  * oracle is q242's; these pin the edges a uniform corpus never hits. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g", "id").collect().toSeq

  test("equals the window form, including boundary ties broken by the total order") {
    // group 1: a three-way tie at v=5 straddling the k=2 boundary — the
    // id tiebreak decides which two survive; group 2: strictly ordered.
    val df = Seq((1L, 10L, 5L), (1L, 11L, 5L), (1L, 12L, 5L), (1L, 13L, 1L),
      (2L, 20L, 9L), (2L, 21L, 8L), (2L, 22L, 7L))
      .toDF("g", "id", "v")
    val got = GroupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 2)
    assert(sortedRows(got) === sortedRows(windowForm(df, 2)))
    assert(got.filter(col("g") === 1).select("id").as[Long].collect().sorted
      === Array(10L, 11L))
  }

  test("groups smaller than k emit all their rows; k = 1 keeps the single best") {
    val df = Seq((1L, 1L, 3L), (2L, 2L, 4L), (2L, 3L, 6L), (2L, 4L, 5L))
      .toDF("g", "id", "v")
    val all = GroupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 10)
    assert(all.count() === 4)
    val best = GroupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 1)
    assert(sortedRows(best) === sortedRows(windowForm(df, 1)))
  }

  test("survives a shuffled, multi-partition child (partial pass prunes per partition)") {
    val df = spark.range(0, 10000).repartition(8)
      .select((col("id") % 97).as("g"), col("id"), (col("id") * 31 % 1009).as("v"))
    val got = GroupTopK(df, Seq(col("g")), Seq(col("v").desc, col("id").asc), 3)
    assert(sortedRows(got) === sortedRows(windowForm(df, 3)))
  }

  test("install is idempotent and k must be positive") {
    GroupTopK.install(spark)
    GroupTopK.install(spark)
    assert(spark.experimental.extraStrategies.count(_ == GroupTopKStrategy) === 1)
    intercept[IllegalArgumentException] {
      GroupTopK(Seq((1L, 1L, 1L)).toDF("g", "id", "v"),
        Seq(col("g")), Seq(col("v").desc), 0)
    }
  }
}
