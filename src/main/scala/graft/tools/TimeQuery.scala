package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch timer: run named SparkEntry queries N times each and print
  * per-run wall seconds (not part of the surface; Bench is the measured
  * contract). Usage: runMain graft.tools.TimeQuery <sfDir> q50_ivf_probe ...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      println(f"[time] $name%-28s #$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
