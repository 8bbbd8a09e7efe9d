package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.merge.MergeOps
import graft.validate.Validators

/** SURVEY.md §2 operator inventory expressed over the driver testdata
  * (entity→analog mapping in FIXTURES.md §B). Each query has a matching
  * DuckDB oracle in [[Oracles]]; column names and types are aligned on both
  * sides (the driver hash-compares values after sorting columns by name).
  *
  * Numeric-parity rules used throughout (so Spark and DuckDB hash-match):
  *   - money sums → integer cents: `sum(cast(round(x*100, 0) as long))` —
  *     per-row double ops are IEEE-deterministic, the sum is exact;
  *   - averages → `round(sum/count, 4)`: one exact division, then round;
  *   - year/month/week/datediff → cast to INT on the DuckDB side (Spark
  *     emits IntegerType, DuckDB BIGINT by default).
  */
object ReferenceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  /** A1–A3 analog (reference Gold-Orders-By-City.py:38,
    * Gold-Customer-Breakdown.py:29): grouped multi-aggregate over the fact
    * table. Partial aggregation (map-side combine) + single shuffle on the
    * 2-column group key; scales linearly.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("order_count"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"),
        round(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"))

  /** O1 + J1/J2 flagship (reference Seed-Store-Dashboard.py:22-28): top-5
    * "cities" (nations) by BUILDING-segment customers. Dimension joins are
    * broadcast-eligible (nation: 25 rows, region: 5); top-k compiles to
    * TakeOrderedAndProject — no global sort.
    */
  def q02TopSegmentNations(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region")
    customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("customer_count"))
      .orderBy(col("customer_count").desc, col("n_name"))
      .limit(5)
  }

  /** W4 (reference Gold-Customer-Status-By-City.py:32-33): latest order per
    * customer via rank()=1 — `rank` (not row_number) keeps date ties, as the
    * reference does. One window shuffle on o_custkey.
    */
  /** Latest-order-per-customer window, SINGLE-SOURCED for q03 and q04 so
    * the tie policy (rank, not row_number — date ties kept, as the
    * reference does) cannot drift between them.
    */
  private def latestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc)
    t(s, dir, "orders")
      .withColumn("__rnk", rank().over(w))
      .filter(col("__rnk") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
  }

  def q03LatestOrderPerCustomer(s: SparkSession, dir: String): DataFrame =
    latestOrderPerCustomer(s, dir)

  /** E3 gold_customer_status_by_city analog (reference
    * Gold-Customer-Status-By-City.py:25-48): latest-order window → two left
    * joins → grouped count. count("o_orderkey") is null-skipping (A2), so
    * customers without orders count in customer_count but not
    * with_order_count.
    */
  def q04CustomerCityStatus(s: SparkSession, dir: String): DataFrame = {
    val latest = latestOrderPerCustomer(s, dir)
      .select(col("o_custkey"), col("o_orderkey"))
    t(s, dir, "customer")
      .join(latest, col("c_custkey") === col("o_custkey"), "left")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("customer_count"),
        count(col("o_orderkey")).as("with_order_count"))
  }

  /** gold_orders_by_customer_week analog (reference
    * Gold-Orders-By-Customer-Week.py:30-38): ISO week bucketing.
    */
  def q05OrdersByCustomerWeek(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .withColumn("order_week", weekofyear(col("o_orderdate")))
      .groupBy(col("o_custkey"), col("order_year"), col("order_week"))
      .agg(count(col("o_orderkey")).as("order_count"))

  /** gold_orders_by_city / gold_orders_type_delivery_time analog (reference
    * Gold-Orders-By-City.py:30-38): fact-fact join + datediff + grouped
    * count/avg. The orders side is ~15× smaller than lineitem — broadcast at
    * test SF, shuffle-hash at 100 TB (AQE decides).
    */
  def q06DeliveryByPriorityMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delivery_days",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum(col("delivery_days")).cast("double") / count(lit(1)), 4)
          .as("avg_delivery_days"))

  /** W5 analog (reference Seed-Store-Dashboard.py:43-48): relative frequency
    * via an unordered analytic window — share of each segment within its
    * nation.
    */
  def q07SegmentShareByNation(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("segment_count"))
    counts.withColumn("share_pct",
      round(col("segment_count") * lit(100.0) /
        sum(col("segment_count")).over(Window.partitionBy(col("c_nationkey"))), 4))
  }

  /** S6 (reference Bronze-Ingestion-Orders.py:51-58): insert-only MERGE —
    * re-ingesting the full source into a partial target must restore exactly
    * the source (idempotent append), keyed here on o_orderkey.
    */
  def q08MergeInsertIfAbsent(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val target = orders.filter(col("o_orderstatus") === "F")
    MergeOps.insertIfAbsent(target, orders, Seq("o_orderkey"))
  }

  /** J7 as left-semi (reference check_ingestion_status rewritten,
    * CommonFunctions.py:203-241): customers having at least one order.
    */
  def q09CustomersWithOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")

  /** J6 as left-anti (reference validate_relationship rewritten,
    * CommonFunctions.py:174-198): customers with no order in 1998 — the
    * anti-join side is filtered first so the result is non-empty.
    */
  def q10CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(year(col("o_orderdate")) === 1998),
        col("c_custkey") === col("o_custkey"), "left_anti")

  /** V5 (reference identify_duplicates, CommonFunctions.py:249-313) over the
    * events table keyed by (user_id, event_type): summary of the duplicate
    * policy — both branches exercised by deriving ingestion status from the
    * event type.
    */
  def q11DuplicatePolicySummary(s: SparkSession, dir: String): DataFrame = {
    val seeded = Validators.initDiagnostics(t(s, dir, "events"))
      .withColumn("silver_ingestion_status",
        when(col("event_type").isin("click", "view"), "ingested")
          .otherwise("not_ingested"))
    val validated = Validators.finalizeValid(
      Validators.identifyDuplicates(seeded, Seq("user_id", "event_type"), "ts"))
    validated
      .groupBy(col("validation_status"), col("is_duplicate"))
      .agg(count(lit(1)).as("n"))
  }

  /** V2 chain (reference validate_column, CommonFunctions.py:123-169) over
    * events: numeric check then accepted-values check, preserving the
    * invalid_columns wrap quirk; summarized by final status + first
    * diagnostic element.
    */
  def q12ValidateColumnSummary(s: SparkSession, dir: String): DataFrame = {
    val seeded = Validators.initDiagnostics(t(s, dir, "events"))
    val v1 = Validators.validateColumn(seeded, "value", "numeric")
    val v2 = Validators.validateColumn(v1, "event_type", "string",
      acceptedValues = Seq("click", "view", "purchase"))
    Validators.finalizeValid(v2)
      .groupBy(col("validation_status"),
        when(size(col("invalid_columns")) > 0, element_at(col("invalid_columns"), 1))
          .as("first_invalid"))
      .agg(count(lit(1)).as("n"))
  }

  /** A1 + P4 (reference Gold-Customer-Breakdown.py:29 with the
    * when/otherwise derivation of V6): breakdown over a derived status
    * dimension.
    */
  def q13CustomerValueBreakdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"),
        when(col("c_acctbal") < 0, "delinquent").otherwise("regular")
          .as("acct_status"))
      .agg(count(lit(1)).as("customer_count"))

  /** D4/D5 analog (reference Seed-Store-Dashboard.py:57-67): partition-
    * pruning-style filter on (year, week) then per-customer order counts
    * rolled up into a profile.
    */
  def q14WeekOrderProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1997 &&
        weekofyear(col("o_orderdate")) === 10)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("active_customers"),
        sum(col("cnt")).as("total_orders"),
        round(sum(col("cnt")).cast("double") / count(lit(1)), 4)
          .as("avg_orders_per_customer"))

  /** D6 / A8 (reference Seed-Store-Dashboard.py:75-80): weighted average
    * over a pre-aggregated monthly CTE — weight avg_delivery by order_count.
    */
  def q15WeightedAvgDelivery(s: SparkSession, dir: String): DataFrame = {
    val monthly = q06DeliveryByPriorityMonth(s, dir)
    monthly.groupBy(col("o_orderpriority")).agg(
      sum(col("order_count")).as("order_count"),
      round(sum(col("avg_delivery_days") * col("order_count")) /
        sum(col("order_count")), 2).as("weighted_avg_delivery_days"))
  }

  /** D8 / J5 (reference Seed-Store-Dashboard.py:104-123): two CTE
    * aggregates joined — late-shipment share by priority.
    */
  def q16LateShareByPriority(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delivery_days",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
    val total = joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("total_lineitems"))
    val late = joined.filter(col("delivery_days") > 60)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_lineitems"))
    total.join(late, Seq("o_orderpriority"), "inner")
      .select(col("o_orderpriority"), col("total_lineitems"), col("late_lineitems"),
        round(col("late_lineitems").cast("double") / col("total_lineitems"), 4)
          .as("late_share"))
  }

  /** V1 as an oracle-checked query (reference CommonFunctions.py:77-117):
    * clean a deliberately dirtied concatenation; the DuckDB oracle emulates
    * initcap via list_transform.
    */
  def q17CleanStrings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(col("p_partkey"),
      graft.clean.Strings.cleanString(
        concat(col("p_name"), lit("\t "), col("p_brand"), lit("##"), col("p_type")))
        .as("cleaned"))

  /** Tumbling-window aggregation over the event stream (batch form of the
    * streaming module; SURVEY.md §2.11 extension). `ts` arrives as ns-since-
    * epoch (nanosAsLong) — integer DIV to µs keeps full precision.
    */
  def q18EventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ets", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("events"), col("value_cents"))

  /** E3 step 9 (reference Seed-Store-Dashboard.py): the SQL entry path —
    * text through the Spark SQL parser with GROUP BY ordinal (A9) and an
    * unpartitioned analytic window (W5), exactly how the dashboard issues
    * queries. Doubles are forced with CAST (a bare `100.0` literal is
    * DECIMAL in both engines, with different division rounding).
    */
  def q19SqlDashboard(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority,
                count(*) AS order_count,
                round(CAST(count(*) AS DOUBLE) * 100 / SUM(count(*)) OVER (), 2) AS pct
         FROM orders_v GROUP BY 1""")
  }

  /** A4 grand totals (reference Gold-Customer-Breakdown.py:33 global sum)
    * extended with distinct aggregates — count-distinct runs as the
    * expand+two-phase aggregate at scale, no driver collect.
    */
  def q29GlobalTotals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("lineitems"),
      countDistinct(col("l_orderkey")).as("distinct_orders"),
      countDistinct(col("l_partkey"), col("l_suppkey")).as("distinct_part_supp"),
      sum(col("l_quantity")).as("total_qty"),
      sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long")).as("revenue_cents"))

  /** TPC-H Q5-shape: six-table join (two broadcast dims, three shuffle
    * joins Catalyst is free to reorder) + filter + grouped sum. The widest
    * plan in the suite — exercises join reordering and AQE.
    */
  def q30RegionalRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && year(col("o_orderdate")) === 1997)
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("lineitems"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))

  /** TPC-H Q18-shape: grouped HAVING filter joined back to the fact tables
    * (aggregate → filter → join — the "large orders" pattern).
    */
  def q31BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
  }

  /** Exact percentiles (sort-based distributed percentile — beyond the
    * reference's aggregate surface; matches DuckDB quantile_cont's linear
    * interpolation bit-for-bit at round-4).
    */
  def q36Quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"))

  /** Sketch-based approximate aggregates (HLL++ count-distinct, quantile
    * sketch) — the constant-memory forms of q29/q36 for 100 TB cardinality
    * work. Engine-specific sketches → rows-only check; AccuracySpec bounds
    * them against the exact answers.
    */
  def q37ApproxStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5)").as("approx_p50_price"))

  /** Semi-structured extraction: pull a typed value out of the JSON props
    * column and aggregate on it — the ubiquitous event-payload pattern
    * (get_json_object is codegen'd path extraction, no full JSON parse).
    */
  def q38JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // try_cast, matching the oracle's TRY_CAST: under ANSI a plain cast
      // would CRASH the query on a non-integral $.k instead of nulling it
      // — and the driver regenerates testdata between rounds
      .withColumn("k",
        get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("with_k"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_top_segment_nations" -> (q02TopSegmentNations _),
    "q03_latest_order_per_customer" -> (q03LatestOrderPerCustomer _),
    "q04_customer_city_status" -> (q04CustomerCityStatus _),
    "q05_orders_by_customer_week" -> (q05OrdersByCustomerWeek _),
    "q06_delivery_by_priority_month" -> (q06DeliveryByPriorityMonth _),
    "q07_segment_share_by_nation" -> (q07SegmentShareByNation _),
    "q08_merge_insert_if_absent" -> (q08MergeInsertIfAbsent _),
    "q09_customers_with_orders" -> (q09CustomersWithOrders _),
    "q10_customers_without_orders" -> (q10CustomersWithoutOrders _),
    "q11_duplicate_policy_summary" -> (q11DuplicatePolicySummary _),
    "q12_validate_column_summary" -> (q12ValidateColumnSummary _),
    "q13_customer_value_breakdown" -> (q13CustomerValueBreakdown _),
    "q14_week_order_profile" -> (q14WeekOrderProfile _),
    "q15_weighted_avg_delivery" -> (q15WeightedAvgDelivery _),
    "q16_late_share_by_priority" -> (q16LateShareByPriority _),
    "q17_clean_strings" -> (q17CleanStrings _),
    "q18_events_hourly" -> (q18EventsHourly _),
    "q19_sql_dashboard" -> (q19SqlDashboard _),
    "q29_global_totals" -> (q29GlobalTotals _),
    "q30_regional_revenue" -> (q30RegionalRevenue _),
    "q31_big_orders" -> (q31BigOrders _),
    "q36_quantiles" -> (q36Quantiles _),
    "q37_approx_stats" -> (q37ApproxStats _),
    "q38_json_extract" -> (q38JsonExtract _),
  )
}

/** DuckDB oracle SQL for every [[ReferenceQueries]] entry. Column names and
  * types are matched to the Spark output (casts where DuckDB's defaults
  * differ: year/week/month/datediff → INT, sums of ints → BIGINT).
  */
object Oracles {

  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         count(*) AS order_count,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
         round(sum(l_quantity) / count(*), 4) AS avg_qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q02_top_segment_nations" ->
      """SELECT n_name, count(*) AS customer_count
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY n_name
         ORDER BY customer_count DESC, n_name
         LIMIT 5""",

    "q03_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rnk
           FROM orders) WHERE rnk = 1""",

    "q04_customer_city_status" ->
      """WITH latest AS (
           SELECT o_custkey, o_orderkey FROM (
             SELECT o_custkey, o_orderkey,
                    rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rnk
             FROM orders) WHERE rnk = 1)
         SELECT n_name, c_mktsegment,
                count(*) AS customer_count,
                count(o_orderkey) AS with_order_count
         FROM customer
         LEFT JOIN latest ON c_custkey = o_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_mktsegment""",

    "q05_orders_by_customer_week" ->
      """SELECT o_custkey,
                CAST(year(o_orderdate) AS INTEGER) AS order_year,
                CAST(weekofyear(o_orderdate) AS INTEGER) AS order_week,
                count(o_orderkey) AS order_count
         FROM orders GROUP BY 1, 2, 3""",

    "q06_delivery_by_priority_month" ->
      """SELECT o_orderpriority,
                CAST(year(o_orderdate) AS INTEGER) AS order_year,
                CAST(month(o_orderdate) AS INTEGER) AS order_month,
                count(*) AS order_count,
                round(CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE) / count(*), 4) AS avg_delivery_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2, 3""",

    "q07_segment_share_by_nation" ->
      """SELECT c_nationkey, c_mktsegment,
                count(*) AS segment_count,
                round(CAST(count(*) AS DOUBLE) * 100.0 /
                      sum(count(*)) OVER (PARTITION BY c_nationkey), 4) AS share_pct
         FROM customer GROUP BY c_nationkey, c_mktsegment""",

    "q08_merge_insert_if_absent" ->
      """SELECT * FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT * FROM orders
         WHERE o_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')""",

    "q09_customers_with_orders" ->
      """SELECT * FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",

    "q10_customers_without_orders" ->
      """SELECT * FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND year(o.o_orderdate) = 1998)""",

    "q11_duplicate_policy_summary" ->
      """WITH d AS (
           SELECT CASE WHEN event_type IN ('click','view')
                       THEN 'ingested' ELSE 'not_ingested' END AS st,
                  row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS rn,
                  count(*) OVER (PARTITION BY user_id, event_type) AS cnt
           FROM events),
         flagged AS (
           SELECT CASE WHEN (st = 'not_ingested' AND cnt > 1)
                         OR (st = 'ingested' AND cnt > 1 AND rn > 1)
                       THEN 'invalid' ELSE 'valid' END AS validation_status,
                  ((st = 'not_ingested' AND cnt > 1)
                   OR (st = 'ingested' AND cnt > 1 AND rn > 1)) AS is_duplicate
           FROM d)
         SELECT validation_status, is_duplicate, count(*) AS n
         FROM flagged GROUP BY 1, 2""",

    "q13_customer_value_breakdown" ->
      """SELECT c_mktsegment,
                CASE WHEN c_acctbal < 0 THEN 'delinquent' ELSE 'regular' END AS acct_status,
                count(*) AS customer_count
         FROM customer GROUP BY 1, 2""",

    "q14_week_order_profile" ->
      """WITH per_cust AS (
           SELECT o_custkey, count(*) AS cnt FROM orders
           WHERE year(o_orderdate) = 1997 AND weekofyear(o_orderdate) = 10
           GROUP BY o_custkey)
         SELECT count(*) AS active_customers,
                CAST(sum(cnt) AS BIGINT) AS total_orders,
                round(CAST(sum(cnt) AS DOUBLE) / count(*), 4) AS avg_orders_per_customer
         FROM per_cust""",

    "q15_weighted_avg_delivery" ->
      """WITH monthly AS (
           SELECT o_orderpriority,
                  count(*) AS order_count,
                  round(CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE) / count(*), 4) AS avg_delivery_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_orderpriority, year(o_orderdate), month(o_orderdate))
         SELECT o_orderpriority,
                CAST(sum(order_count) AS BIGINT) AS order_count,
                round(sum(avg_delivery_days * order_count) / sum(order_count), 2) AS weighted_avg_delivery_days
         FROM monthly GROUP BY o_orderpriority""",

    "q16_late_share_by_priority" ->
      """WITH joined AS (
           SELECT o_orderpriority,
                  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delivery_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         total AS (
           SELECT o_orderpriority, count(*) AS total_lineitems
           FROM joined GROUP BY 1),
         late AS (
           SELECT o_orderpriority, count(*) AS late_lineitems
           FROM joined WHERE delivery_days > 60 GROUP BY 1)
         SELECT o_orderpriority, total_lineitems, late_lineitems,
                round(CAST(late_lineitems AS DOUBLE) / total_lineitems, 4) AS late_share
         FROM total JOIN late USING (o_orderpriority)""",

    "q17_clean_strings" ->
      s"""SELECT p_partkey,
                trim(regexp_replace(
                  array_to_string(list_transform(
                    string_split(
                      regexp_replace(
                        regexp_replace(p_name || chr(9) || ' ' || p_brand || '##' || p_type,
                                       chr(9), ' ', 'g'),
                        '[^a-zA-Z ]', ' ', 'g'), ' '),
                    w -> CASE WHEN len(w) = 0 THEN w
                              ELSE upper(w[1]) || lower(w[2:]) END), ' '),
                  '${graft.northstar.TextAnalysis.WsClass}+', ' ', 'g'))
                  AS cleaned
         FROM part""",

    "q18_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
                event_type,
                count(*) AS events,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2""",

    "q38_json_extract" ->
      """SELECT event_type,
                count(k) AS with_k,
                CAST(sum(k) AS BIGINT) AS k_sum,
                CAST(min(k) AS BIGINT) AS k_min,
                CAST(max(k) AS BIGINT) AS k_max
         FROM (SELECT event_type,
                      TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type""",

    "q36_quantiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
                round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
         FROM lineitem GROUP BY l_returnflag""",

    "q30_regional_revenue" ->
      """SELECT n_name, count(*) AS lineitems,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA' AND year(o_orderdate) = 1997
         GROUP BY n_name""",

    "q31_big_orders" ->
      """WITH big AS (
           SELECT l_orderkey, sum(l_quantity) AS total_qty
           FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey""",

    "q29_global_totals" ->
      """SELECT count(*) AS lineitems,
                count(DISTINCT l_orderkey) AS distinct_orders,
                count(DISTINCT (l_partkey, l_suppkey)) AS distinct_part_supp,
                sum(l_quantity) AS total_qty,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem""",

    "q19_sql_dashboard" ->
      """SELECT o_orderpriority,
                count(*) AS order_count,
                round(CAST(count(*) AS DOUBLE) * 100 / SUM(count(*)) OVER (), 2) AS pct
         FROM orders GROUP BY 1""",

    "q12_validate_column_summary" ->
      """WITH s1 AS (
           SELECT event_type,
                  CASE WHEN try_cast(value AS BIGINT) IS NULL THEN 'invalid' ELSE '' END AS st1,
                  CASE WHEN try_cast(value AS BIGINT) IS NULL THEN 'value' ELSE NULL END AS ic1
           FROM events),
         s2 AS (
           SELECT CASE WHEN event_type NOT IN ('click','view','purchase')
                       THEN 'invalid' ELSE st1 END AS st2,
                  CASE WHEN event_type NOT IN ('click','view','purchase')
                       THEN 'event_type' || CASE WHEN ic1 IS NULL THEN '' ELSE ', ' || ic1 END
                       ELSE ic1 END AS first_invalid
           FROM s1)
         SELECT CASE WHEN st2 = '' THEN 'valid' ELSE st2 END AS validation_status,
                first_invalid, count(*) AS n
         FROM s2 GROUP BY 1, 2""",
  )
}
