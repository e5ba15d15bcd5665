package graft

import org.apache.spark.sql.SparkSession

/** Dev timing tool (sibling of [[Explain]]): run one or more registered
  * queries (comma-separated in args(0); optional sfDir in args(1)) with
  * one warm-up then min-of-3, printing seconds per query — the same
  * min-of-n convention Bench reports, without paying the whole suite to
  * A/B one rewrite.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    for (q <- args(0).split(",")) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Caches.release(); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val best = (1 to 3).map(_ => once()).min
      println(f"[time] $q%-28s $best%.3f s (min of 3, sf=$sfDir)")
    }
    spark.stop()
  }
}
