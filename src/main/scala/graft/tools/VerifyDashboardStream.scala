package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gold.{Dashboard, GoldBuilds}
import graft.pipeline.Warehouse

/** VERIFY_DASH, STREAMING edition (round-14 verdict item 3): the 8
  * reference dashboard queries executed over gold tables maintained by
  * the STREAMING mirror ([[graft.streaming.GoldIncStream]]) across a
  * replayed, out-of-order silver-orders intake at sf1, hash-compared to
  * the same queries over a one-shot batch rebuild of the final state —
  * promoting GoldIncrementalSpec's spec-tier proof to the VERIFY
  * protocol tier. The intake deliberately violates arrival order
  * (newest months first), replays previously-delivered rows inside
  * fresh-bearing batches, carries an in-batch duplicate, and includes
  * one PURE-REPLAY batch that must produce ZERO version churn on the
  * silver table and every gold table. Writes a VERIFY-style JSON.
  * Usage:
  *   runMain graft.tools.VerifyDashboardStream [sfDir] [outPath]
  * (defaults data/sf1 — generate with ScaleUp first — and
  * VERIFY_DASH_STREAM_sf1.json).
  */
object VerifyDashboardStream {

  /** Silver orders row for the MemoryStream leg — field order matches
    * [[graft.queries.GoldIncFixture.silverOrders]] post-tieFree
    * (created_on is a timestamp there).
    */
  final case class OrdRow(id: Long, customer_id: Long, address_id: Long,
      created_on: java.sql.Timestamp,
      delivered_on: Option[java.sql.Date], year: Int, month: Int,
      silver_ingestion_time: java.sql.Timestamp)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val outPath = args.drop(1).headOption
      .getOrElse("VERIFY_DASH_STREAM_sf1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GoldIncFixture._
    val orders = graft.io.Tables.read(spark, dir, "orders")
    val nation = graft.io.Tables.read(spark, dir, "nation")
    val customer = graft.io.Tables.read(spark, dir, "customer")

    // same tie-free transform as VerifyDashboardIvm (see the design
    // note there): created_on offset by id in MICROSECONDS so the
    // latest-order rank is strict at every tier
    def tieFree(df: DataFrame): DataFrame = df.withColumn("created_on",
      timestamp_add("MICROSECOND", col("id"),
        col("created_on").cast("timestamp")))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dashstream] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // final state: ALL orders (the stream intake is insert-only — the
    // v2 fixture snapshot holds every key); the streamed arm starts
    // from the %3≠0 two-thirds and receives the %3=0 tail as batches
    val finalOrders = tieFree(silverOrders(orders, 2))
    val seedOrders = finalOrders.filter(pmod(col("id"), lit(3)) =!= 0)
    val tail = finalOrders.filter(pmod(col("id"), lit(3)) === 0)

    val root = Paths.get("/tmp/graft_dashstream")
    graft.io.FsUtil.deleteRecursively(root)
    val whInc = new Warehouse(s"$root/inc")
    time("seed silver (dims + 2/3 orders)") {
      whInc.silverByName("customers").overwrite(silverCustomers(customer, 2))
      whInc.silverByName("addresses").overwrite(silverAddresses(nation, 2))
      whInc.silverByName("orders").overwrite(seedOrders)
    }

    // collect the streamed tail ONCE, ordered newest-month-first so
    // arrival order violates event order end-to-end
    import spark.implicits._
    val tailRows = time("collect streamed tail") {
      tail.select(col("id"), col("customer_id"), col("address_id"),
        col("created_on"), col("delivered_on"), col("year"), col("month"),
        col("silver_ingestion_time"))
        .as[OrdRow].collect().sortBy(r => (-r.year, -r.month, r.id))
    }
    println(s"[dashstream] tail rows: ${tailRows.length}")
    val third = tailRows.length / 3
    val b1 = tailRows.slice(0, third)
    val b2 = tailRows.slice(third, 2 * third)
    val b3 = tailRows.slice(2 * third, tailRows.length)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[OrdRow]
    val stream = in.toDF().select(col("id"), col("customer_id"),
      col("address_id"), col("created_on"), col("delivered_on"),
      col("year"), col("month"), col("silver_ingestion_time"))
    val q = graft.streaming.GoldIncStream.ordersIntakeStream(stream, whInc)
    var replayChurnFree = false
    try {
      time("batch 1 (newest months first)") {
        in.addData(b1.toSeq)
        q.processAllAvailable()
      }
      time("batch 2 (+replays of b1 + in-batch dup)") {
        // replay a slice of batch 1 inside a fresh-bearing batch, and
        // duplicate one row in-batch
        in.addData(b2.toSeq ++ b1.take(b1.length / 10) ++ b2.take(1))
        q.processAllAvailable()
      }
      val silver = whInc.silverByName("orders")
      val sv = silver.version
      val goldNames = Seq("customer_breakdown", "customer_status_by_city",
        "orders_by_customer_week", "orders_by_city_year_month",
        "orders_type_delivery_time")
      val gvs = goldNames.map(n => whInc.gold(n).version)
      time("batch 3 (PURE REPLAY — zero churn)") {
        in.addData(b1.take(1000).toSeq)
        q.processAllAvailable()
      }
      replayChurnFree = silver.version == sv &&
        goldNames.map(n => whInc.gold(n).version) == gvs
      println(s"[dashstream] pure-replay zero version churn: " +
        s"$replayChurnFree (silver $sv -> ${silver.version})")
      time("batch 4 (rest of the tail)") {
        in.addData(b3.toSeq ++ b2.take(500))
        q.processAllAvailable()
      }
    } finally q.stop()

    // batch arm: the final snapshot, one full rebuild
    val whBat = new Warehouse(s"$root/batch")
    time("batch rebuild") {
      whBat.silverByName("customers").overwrite(silverCustomers(customer, 2))
      whBat.silverByName("addresses").overwrite(silverAddresses(nation, 2))
      whBat.silverByName("orders").overwrite(finalOrders)
      new GoldBuilds(spark, whBat).buildAll()
    }

    def queriesOf(d: Dashboard): Seq[(String, DataFrame)] = Seq(
      "d1_top_vip_cities" -> d.topVipCities,
      "d2_total_customers" -> d.totalCustomers,
      "d3_breakdown_share" -> d.customerBreakdownShare,
      "d4_orders_in_week" -> d.ordersInWeek(1995, 10),
      "d5_low_volume_affiliates" -> d.lowVolumeAffiliates(1995, 10),
      "d6_city_delivery_profile" -> d.cityDeliveryProfile("germany"),
      "d7_city_averages" -> d.cityAverages(byYear = true),
      "d8_late_order_share" -> d.lateOrderShare())

    val dInc = new Dashboard(spark, whInc)
    val dBat = new Dashboard(spark, whBat)
    val results = queriesOf(dInc).zip(queriesOf(dBat)).map {
      case ((name, qi), (_, qb)) =>
        val (hi, ri) = VerifyDashboardIvm.canonicalHash(qi)
        val (hb, rb) = VerifyDashboardIvm.canonicalHash(qb)
        val ok = hi == hb && ri == rb
        println(f"[dashstream] $name%-26s rows=$ri%6d " +
          (if (ok) "HASH-MATCH" else s"MISMATCH inc=$hi/$ri batch=$hb/$rb"))
        (name, ok, ri)
    }
    val pass = results.count(_._2)
    val body = results.map { case (n, ok, r) =>
      s"""    "$n": {"hash_match": $ok, "rows": $r}"""
    }.mkString(",\n")
    Files.writeString(Paths.get(outPath),
      s"""{
  "_what": "dashboard-over-STREAM-maintained == dashboard-over-rebuilt (round-14 verdict item 3): the 8 reference dashboard queries over gold tables maintained by GoldIncStream across a replayed, out-of-order, in-batch-duplicated silver-orders intake (newest months first; one pure-replay batch proving zero version churn) vs the same queries over a one-shot GoldBuilds rebuild of the final state — canonical hash equality.",
  "_tier": "$dir",
  "_protocol": "runMain graft.tools.VerifyDashboardStream $dir",
  "replay_zero_version_churn": $replayChurnFree,
  "queries": {
$body
  },
  "pass": $pass,
  "total": ${results.size}
}
""")
    println(s"[dashstream] $pass/${results.size} hash-match, " +
      s"replay_zero_version_churn=$replayChurnFree -> $outPath")
    graft.io.FsUtil.deleteRecursively(root)
    spark.stop()
    if (pass != results.size || !replayChurnFree) sys.exit(1)
  }
}
