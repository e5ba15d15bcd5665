package graft

import graft.operators.Dedup
import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._

/** Interop with the Spark ML LSH surface (SURVEY B31 named
  * `org.apache.spark.ml.feature.MinHashLSH` as the library path): the
  * ml-pipeline MinHashLSH over the same shingle sets must recall the
  * exact-Jaccard near-dup pairs, like our native LSH (q43) does. */
class MlInteropSpec extends SparkSpec {

  test("ml MinHashLSH approxSimilarityJoin recalls the exact near-dup pairs") {
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .withColumn("sh", org.apache.spark.sql.GraftColumn(
        graft.functions.WordShingles(
          org.apache.spark.sql.GraftColumn.expr(col("toks")), 5)))
      .select("doc_id", "sh")
    val cv = new CountVectorizer().setInputCol("sh").setOutputCol("features")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs).select("doc_id", "features")
    val lsh = new MinHashLSH().setNumHashTables(8).setInputCol("features")
      .setOutputCol("hashes").setSeed(42L).fit(vecs)
    val mlPairs = lsh.approxSimilarityJoin(vecs, vecs, 0.6, "jaccardDist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.queries("q41_jaccard_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recalled = exact.count(mlPairs.contains)
    assert(recalled.toDouble / exact.size >= 0.8,
      s"ml LSH recall $recalled/${exact.size}")
  }
}
