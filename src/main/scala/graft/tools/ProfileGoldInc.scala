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
    def silverOrders(version: Int): DataFrame = {
      val keep = version match {
        case 1 => pmod(col("o_orderkey"), lit(7)) =!= 0
        case 2 => lit(true)
        case _ => pmod(col("o_orderkey"), lit(11)) =!= 0
      }
      val shift = if (version >= 2)
        when(pmod(col("o_orderkey"), lit(5)) === 0, 2).otherwise(0)
      else lit(0)
      orders.filter(keep).select(
        col("o_orderkey").as("id"),
        col("o_custkey").as("customer_id"),
        pmod(col("o_custkey"), lit(25L)).as("address_id"),
        to_date(col("o_orderdate")).as("created_on"),
        when(pmod(col("o_orderkey"), lit(4)) =!= 0,
          date_add(to_date(col("o_orderdate")),
            (pmod(col("o_orderkey"), lit(30)) + shift).cast("int")))
          .as("delivered_on"),
        year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"),
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
    // mode: "feeds" mirrors q103's write-side change capture (the
    // production path); "diff" forces the legacy after-the-fact snapshot
    // diff, so the two runs bracket the CDF cost collapse for BASELINE.md
    val useFeeds = !args.contains("diff")
    def ins(d: DataFrame) = d.withColumn("_change_type", lit("insert"))
    def del(d: DataFrame) = d.withColumn("_change_type", lit("delete"))
    val orderFeeds = Map(
      2 -> ins(silverOrders(2).filter(pmod(col("id"), lit(7)) === 0))
        .unionByName(del(silverOrders(1).filter(
          pmod(col("id"), lit(5)) === 0 && pmod(col("id"), lit(4)) =!= 0)))
        .unionByName(ins(silverOrders(2).filter(
          pmod(col("id"), lit(7)) =!= 0 &&
            pmod(col("id"), lit(5)) === 0 && pmod(col("id"), lit(4)) =!= 0))),
      3 -> del(silverOrders(2).filter(pmod(col("id"), lit(11)) === 0)))
    val addrFeed2 = del(silverAddresses(1)
        .filter(pmod(col("id"), lit(6)) === 0))
      .unionByName(ins(silverAddresses(2)
        .filter(pmod(col("id"), lit(6)) === 0)))
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
