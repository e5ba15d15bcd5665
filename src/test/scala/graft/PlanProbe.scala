package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: dump q70/q71 physical plans to inspect exchange reuse. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("planprobe").getOrCreate()
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("q70_nested_in_correlated", "q71_correlated_min_equality")) {
      val df = operators.RelationalCore.queries(name)(spark, d)
      df.count() // force AQE to finalize the plan
      val p = df.queryExecution.executedPlan.toString
      println(s"PROBE $name ReusedExchange=${"ReusedExchange".r.findAllIn(p).length}" +
        s" Exchange=${"Exchange ".r.findAllIn(p).length}" +
        s" lineitemScans=${"FileScan parquet".r.findAllIn(p).length}")
      println(s"=====FULL $name=====")
      println(p)
    }
    spark.stop()
  }
}
