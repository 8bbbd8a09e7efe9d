package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.ParquetTable
import graft.merge.MergeOps
import graft.pipeline.Warehouse

/** E3 (SURVEY.md §3): the five gold table builds. Each build reads silver,
  * aggregates, checks the sum-of-counts invariant against its source
  * (A4/A5), then upserts into the gold table on the grain keys (S9 —
  * whenMatchedUpdate + whenNotMatchedInsert, e.g. reference
  * Gold-Customer-Status-By-City.py:74-81) and re-checks against the stored
  * table.
  */
// no clock parameter on purpose: the reference gold tables carry no
// ingestion timestamp (every Gold/*.py drops silver_ingestion_time and
// stamps nothing), so there is nothing for an injected clock to feed
final class GoldBuilds(spark: SparkSession, warehouse: Warehouse) {

  // S5: same authenticate-before-first-read preamble as the pipelines
  warehouse.auth.authenticate(spark)

  private def silver(entity: String): DataFrame =
    warehouse.silverByName(entity).read(spark)

  private def customers = silver("customers")
    .withColumnRenamed("id", "customer_id")
    .withColumnRenamed("created_on", "customer_created_on")
    .drop("silver_ingestion_time")
  private def orders = silver("orders")
    .withColumnRenamed("id", "order_id")
    .withColumnRenamed("created_on", "order_created_on")
    .drop("silver_ingestion_time")
  private def addresses = silver("addresses")
    .withColumnRenamed("id", "address_id")
    .withColumnRenamed("created_on", "address_created_on")
    .drop("silver_ingestion_time")

  private def sumOf(df: DataFrame, c: String): Long =
    df.agg(coalesce(sum(col(c)), lit(0L))).head.getLong(0)

  /** S9 upsert + invariant re-check; returns the stored gold table. */
  private def publish(name: String, update: DataFrame, grain: Seq[String],
      countCol: String, expected: Long): ParquetTable = {
    val t = warehouse.gold(name)
    // each build is a full recompute, so vanished grains must be deleted —
    // a plain upsert would keep stale rows and poison the sum invariant on
    // the next incremental run
    t.writeMerged(spark, update)(
      MergeOps.upsert(_, _, grain, deleteUnmatched = true))
    val stored = sumOf(t.read(spark), countCol)
    require(stored == expected,
      s"gold_$name invariant: stored sum $stored != source count $expected")
    t
  }

  /** Gold-Customer-Status-By-City.py: latest order per customer (W4 rank,
    * ties kept) → left joins to addresses → count by (city, status).
    * NOTE the reference invariant compares against silver customer count —
    * rank ties would break it, exactly as they would break the reference.
    */
  def customerStatusByCity(): ParquetTable = {
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("order_created_on").desc)
    val latest = orders
      .withColumn("customer_order_rank", rank().over(w))
      .filter(col("customer_order_rank") === 1)
      .drop("customer_order_rank")
    val joined = customers
      .join(latest.select("customer_id", "address_id"), Seq("customer_id"), "left")
      .join(addresses, Seq("address_id"), "left")
    val gold = joined.select("city", "status").groupBy("city", "status")
      .agg(count(lit(1)).as("customer_count"))
    publish("customer_status_by_city", gold, Seq("city", "status"),
      "customer_count", silver("customers").count())
  }

  /** Gold-Customer-Breakdown.py:29: count by (type, status). */
  def customerBreakdown(): ParquetTable = {
    val gold = customers.select("type", "status").groupBy("type", "status")
      .agg(count(lit(1)).as("customer_count"))
    publish("customer_breakdown", gold, Seq("type", "status"),
      "customer_count", silver("customers").count())
  }

  /** Gold-Orders-By-Customer-Week.py: ISO week + customer type grain. */
  def ordersByCustomerWeek(): ParquetTable = {
    val withWeek = orders.withColumn("week", weekofyear(col("order_created_on")))
    val joined = withWeek
      .join(customers.select("customer_id", "type", "status"),
        Seq("customer_id"), "left")
      .withColumnRenamed("type", "customer_type")
      .withColumnRenamed("status", "customer_status")
    val gold = joined.select("customer_id", "order_id", "year", "week", "customer_type")
      .groupBy("customer_id", "year", "week", "customer_type")
      .agg(count(col("order_id")).as("order_count"))
    publish("orders_by_customer_week", gold,
      Seq("customer_id", "year", "week", "customer_type"),
      "order_count", silver("orders").count())
  }

  /** Gold-Orders-By-City.py: delivery time (datediff) by city/year/month. */
  def ordersByCityYearMonth(): ParquetTable = {
    val withDelivery = orders.withColumn("delivery_time",
      datediff(col("delivered_on"), col("order_created_on")))
    val joined = withDelivery.join(addresses, Seq("address_id"), "left")
    val gold = joined.groupBy("city", "year", "month").agg(
      count(col("order_id")).as("order_count"),
      avg(col("delivery_time")).as("avg_delivery_time"))
    publish("orders_by_city_year_month", gold, Seq("city", "year", "month"),
      "order_count", silver("orders").count())
  }

  /** Gold-Orders-Type-Delivery-Time.py: count by (type, delivery_time,
    * year, month).
    */
  def ordersTypeDeliveryTime(): ParquetTable = {
    val withDelivery = orders.withColumn("delivery_time",
      datediff(col("delivered_on"), col("order_created_on")))
    val joined = withDelivery
      .join(customers.select("customer_id", "type"), Seq("customer_id"), "left")
    val gold = joined.select("type", "year", "month", "delivery_time", "order_id")
      .groupBy("type", "delivery_time", "year", "month")
      .agg(count(col("order_id")).as("order_count"))
    publish("orders_type_delivery_time", gold,
      Seq("type", "delivery_time", "year", "month"),
      "order_count", silver("orders").count())
  }

  def buildAll(): Unit = {
    customerStatusByCity(); customerBreakdown(); ordersByCustomerWeek()
    ordersByCityYearMonth(); ordersTypeDeliveryTime()
  }
}

/** The 8 dashboard queries (reference Seed-Store-Dashboard.py:22-123) over
  * the gold tables, as DataFrame programs.
  */
final class Dashboard(spark: SparkSession, warehouse: Warehouse) {

  // S5: same authenticate-before-first-read preamble as the pipelines
  warehouse.auth.authenticate(spark)

  private def gold(name: String): DataFrame = warehouse.gold(name).read(spark)

  /** D1 (:22-28): top-5 cities by VIP customers. */
  def topVipCities: DataFrame =
    gold("customer_status_by_city").filter(col("status") === "VIP")
      // the reference (Seed-Store-Dashboard.py:24-28) orders by count
      // alone, leaving the top-5 cut arbitrary under ties; the city
      // tiebreak picks ONE of the reference's valid outcomes
      // deterministically so results are stable run to run
      .orderBy(col("customer_count").desc, col("city")).limit(5)

  /** D2 (:37-38): grand total customers. */
  def totalCustomers: DataFrame =
    gold("customer_breakdown").agg(sum(col("customer_count")).as("total_customers"))

  /** D3 (:43-48): breakdown with relative frequency within type (W5). */
  def customerBreakdownShare: DataFrame =
    gold("customer_breakdown").select(col("type"), col("status"), col("customer_count"),
      round(col("customer_count") /
        sum(col("customer_count")).over(Window.partitionBy(col("type"))) * 100, 2)
        .as("relative_frequency_by_type_status"))

  /** D4 (:57-60): orders in a given ISO week. */
  def ordersInWeek(yearValue: Int, weekValue: Int): DataFrame =
    gold("orders_by_customer_week")
      .filter(col("year") === yearValue && col("week") === weekValue)

  /** D5 (:64-67): affiliate customers with < 5 orders that week. */
  def lowVolumeAffiliates(yearValue: Int, weekValue: Int): DataFrame =
    ordersInWeek(yearValue, weekValue)
      .filter(col("order_count") < 5 && col("customer_type") === "affiliate")

  /** D6 (:75-80): per-city monthly order rate + weighted average delivery
    * time (A8 — weight by order_count).
    */
  def cityDeliveryProfile(city: String): DataFrame =
    gold("orders_by_city_year_month").filter(col("city") === city).agg(
      avg(col("order_count")).as("avg_orders_month"),
      (sum(col("avg_delivery_time") * col("order_count")) / sum(col("order_count")))
        .as("average_delivery_time"))

  /** D7 (:84-96): averages by city (and by city/year). */
  def cityAverages(byYear: Boolean = false): DataFrame = {
    val keys = if (byYear) Seq(col("city"), col("year")) else Seq(col("city"))
    gold("orders_by_city_year_month").groupBy(keys: _*).agg(
      round(avg(col("order_count")), 2).as("avg_order_count"),
      round(avg(col("avg_delivery_time")), 2).as("avg_delivery_time"))
      .orderBy(keys: _*)
  }

  /** D8 (:104-123): late-order share by type via two CTE aggregates joined
    * (J5).
    */
  def lateOrderShare(thresholdDays: Int = 7): DataFrame = {
    val base = gold("orders_type_delivery_time")
    val total = base.groupBy(col("type"))
      .agg(sum(col("order_count")).as("total_orders"))
    val late = base.filter(col("delivery_time") > thresholdDays)
      .groupBy(col("type")).agg(sum(col("order_count")).as("late_orders"))
    // INNER join on purpose: a type with zero late orders drops out of the
    // result entirely (no late_share=0 row) — replicating the reference
    // dashboard verbatim (Seed-Store-Dashboard.py:118-123 joins the two
    // CTEs with a plain JOIN)
    total.join(late, Seq("type"), "inner")
      .select(col("type").as("order_type"), col("total_orders"), col("late_orders"),
        (col("late_orders") / col("total_orders")).as("late_share"))
  }
}
