package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q111 distinct-count IVM phases (not part of
  * the surface): times each silver commit and each incremental advance
  * separately, so commit I/O and the sketch-fold compute are
  * attributable. Mirrors q111GoldDistinctIvm's history exactly.
  */
object ProfileDistinct {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
          ()
        }
      })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val m0 = taskMs.get()
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f"  jobs=${jobs.get() - j0}%3d taskTime=${(taskMs.get() - m0) / 1e3}%.1f s")
      r
    }
    val orders = graft.io.Tables.read(spark, dir, "orders")
    val nation = graft.io.Tables.read(spark, dir, "nation")
    def silverOrders(version: Int): DataFrame = {
      val keep = version match {
        case 1 => pmod(col("o_orderkey"), lit(7)) =!= 0
        case 2 => lit(true)
        case _ => pmod(col("o_orderkey"), lit(11)) =!= 0
      }
      orders.filter(keep).select(
        col("o_orderkey").as("id"),
        col("o_custkey").as("customer_id"),
        pmod(col("o_custkey"), lit(25L)).as("address_id"),
        to_date(col("o_orderdate")).as("created_on"),
        year(col("o_orderdate")).as("year"),
        lit("2024-01-01 00:00:00").cast("timestamp")
          .as("silver_ingestion_time"))
    }
    def silverAddresses(version: Int): DataFrame = {
      val base = lower(col("n_name"))
      val city = if (version >= 2)
        when(pmod(col("n_nationkey"), lit(6)) === 0, concat(base, lit("_x")))
          .otherwise(base)
      else base
      nation.select(
        col("n_nationkey").cast("long").as("id"),
        city.as("city"),
        lit("2023-12-01 00:00:00").cast("timestamp").as("created_on"),
        lit("2024-01-01 00:00:00").cast("timestamp")
          .as("silver_ingestion_time"))
    }
    for (pass <- 1 to 3) {
      println(s"=== pass $pass")
      val whP = java.nio.file.Files.createTempDirectory("golddist_prof")
      graft.io.FsUtil.deleteRecursively(whP)
      val wh = new graft.pipeline.Warehouse(whP.toString)
      val inc = new graft.gold.GoldIncremental(spark, wh)
      for (v <- 1 to 3) {
        time(s"silver orders v$v") {
          wh.silverByName("orders").overwrite(silverOrders(v)) }
        if (v <= 2) time(s"silver addresses v$v") {
          wh.silverByName("addresses").overwrite(silverAddresses(v)) }
        time(s"advance v$v") { inc.customerReachByCity() }
      }
      time("read gold") {
        wh.gold("customer_reach_by_city").read(spark).count() }
      val goldDir = java.nio.file.Paths.get(
        wh.gold("customer_reach_by_city").currentPath)
      val w = java.nio.file.Files.walk(goldDir)
      val nf = try w.filter(p =>
        p.getFileName.toString.endsWith(".parquet")).count()
      finally w.close()
      println(s"[prof] gold parquet files: $nf")
      graft.io.FsUtil.deleteRecursively(whP)
    }
    spark.stop()
  }
}
