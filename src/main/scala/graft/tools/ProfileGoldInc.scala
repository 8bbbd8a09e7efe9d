package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q103 five-table IVM phases (not part of the
  * surface): times each silver commit and each incremental advance
  * separately, so commit I/O and maintenance compute are attributable.
  */
object ProfileGoldInc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val orders = graft.io.Tables.read(spark, dir, "orders")
    val nation = graft.io.Tables.read(spark, dir, "nation")
    // the WORKLOAD is single-sourced with q103 (queries.GoldIncFixture)
    // so the profiler can never silently bracket a different history
    import graft.queries.GoldIncFixture._
    def silverOrders(version: Int): DataFrame =
      graft.queries.GoldIncFixture.silverOrders(orders, version)
    def silverAddresses(version: Int): DataFrame =
      graft.queries.GoldIncFixture.silverAddresses(nation, version)
    // mode: "feeds" mirrors q103's write-side change capture (the
    // production path); "diff" forces the legacy after-the-fact snapshot
    // diff, so the two runs bracket the CDF cost collapse for BASELINE.md
    val useFeeds = !args.contains("diff")
    val orderFeeds = Map(2 -> orderFeed(orders, 2), 3 -> orderFeed(orders, 3))
    val addrFeed2 = addressFeed2(nation)
    println(s"[prof] mode = ${if (useFeeds) "write-side feeds" else "legacy diff"}")
    for (pass <- 1 to 3) {
      val whP = java.nio.file.Paths.get(s"/tmp/prof_goldinc_$pass")
      graft.io.FsUtil.deleteRecursively(whP)
      val wh = new graft.pipeline.Warehouse(whP.toString)
      val inc = new graft.gold.GoldIncremental(spark, wh)
      println(s"[prof] ---- pass $pass ----")
      for (v <- 1 to 3) {
        time(s"v$v commit orders")(
          if (useFeeds && v >= 2) wh.silverByName("orders")
            .overwriteWithChanges(silverOrders(v), orderFeeds(v))
          else wh.silverByName("orders").overwrite(silverOrders(v)))
        if (v <= 2) time(s"v$v commit addresses")(
          if (useFeeds && v == 2) wh.silverByName("addresses")
            .overwriteWithChanges(silverAddresses(2), addrFeed2)
          else wh.silverByName("addresses").overwrite(silverAddresses(v)))
        time(s"v$v advance")(inc.ordersByCityYearMonth())
      }
      time("final read")(
        wh.gold("orders_by_city_year_month").read(spark).count())
    }
    spark.stop()
  }
}
