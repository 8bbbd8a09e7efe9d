package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{GoldBuilds, GoldIncremental}
import graft.pipeline.Warehouse

/** Round-8 verdict item 3: the CDF-driven maintenance loop wired to the
  * FIVE real reference gold tables. Law: after every silver commit mix
  * (inserts, updates, deletes, group-emptying deletes, dimension moves),
  * the incrementally maintained gold tables equal a FULL batch rebuild
  * (GoldBuilds) run over the same silver state — including the derivable
  * `avg_delivery_time` (maintained as sum/count components). Plus the
  * replay no-op and crash-window (missing sidecar → safe full rebuild)
  * laws.
  */
class GoldIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private def d(s: String) = Date.valueOf(s)

  /** A silver orders row in ordersDf column order, for MemoryStream. */
  type OrdRow = (Long, Timestamp, Option[Long], Date, Option[Date],
    Long, Int, Int, Timestamp)

  /** An orders CDC event: the row image + `_op`, for MemoryStream. */
  type CdcRow = (Long, Timestamp, Option[Long], Date, Option[Date],
    Long, Int, Int, Timestamp, String)

  private def customersDf(rows: (Long, String, String, String)*) =
    rows.toSeq.map { case (id, t, st, created) =>
      (id, t, st, ts(created), created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"))
    }.toDF("id", "type", "status", "created_on", "year", "month",
      "silver_ingestion_time")

  private def addressesDf(rows: (Long, String)*) =
    rows.toSeq.map { case (id, city) =>
      (ts("2023-12-01"), city, "st", "Us", id, s"line $id",
        ts("2024-01-01"))
    }.toDF("created_on", "city", "state", "country", "id", "address_line",
      "silver_ingestion_time")

  /** (order_id, customer_id, address_id, created_on, delivered_on?) */
  private def ordersDf(rows: (Long, Long, java.lang.Long, String,
      Option[String])*) =
    rows.toSeq.map { case (id, cust, addr, created, delivered) =>
      (cust, ts(created), addr, d(created),
        delivered.map(d).orNull, id, created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"))
    }.toDF("customer_id", "created_on", "address_id", "delivery_date",
      "delivered_on", "id", "year", "month", "silver_ingestion_time")

  private def writeSilver(wh: Warehouse, customers: DataFrame,
      orders: DataFrame, addresses: DataFrame): Unit = {
    wh.silverByName("customers").overwrite(customers)
    wh.silverByName("orders").overwrite(orders)
    wh.silverByName("addresses").overwrite(addresses)
  }

  private val GoldNames = Seq("customer_breakdown", "customer_status_by_city",
    "orders_by_customer_week", "orders_by_city_year_month",
    "orders_type_delivery_time")

  /** Compare the incrementally maintained tables against the batch
    * rebuild, on the reference columns (the maintenance components
    * `delivery_time_n`/`delivery_time_sum` are implementation state).
    */
  private def assertMatchesBatch(inc: Warehouse, batch: Warehouse): Unit =
    GoldNames.foreach { name =>
      val ref = batch.gold(name).read(spark)
      val got = inc.gold(name).read(spark).select(ref.columns.head,
        ref.columns.tail: _*)
      assert(TestSpark.rows(got) == TestSpark.rows(ref),
        s"gold_$name: incremental != batch rebuild")
    }

  test("incremental maintenance of the five reference gold tables " +
      "equals the batch rebuild across an insert/update/delete commit " +
      "mix, absorbs replays, and survives the crash window") {
    val root = java.nio.file.Files.createTempDirectory("graft_goldinc")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")

    // ---- v1: initial silver state ----
    val cust1 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"),
      (3L, "affiliate", "VIP", "2023-07-01"))
    val addr1 = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val ord1 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", Some("2024-01-15")), // delivery 5
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")), // latest cust 1
      (102L, 2L, 12L, "2024-01-05", None), // null delivered_on (null avg)
      (103L, 2L, null, "2024-01-20", Some("2024-01-29"))) // null address
    writeSilver(wh, cust1, ord1, addr1)
    writeSilver(whB, cust1, ord1, addr1)

    val inc = new GoldIncremental(spark, wh)
    inc.advanceAll() // first call = the one full build
    new GoldBuilds(spark, whB).buildAll()
    assertMatchesBatch(wh, whB)

    // ---- v2: a commit mix touching every source ----
    // customers: type change (2), delete (3, customer-less → its city-
    // NULL group must shrink), insert (4, no orders)
    val cust2 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "affiliate", "VIP", "2023-06-01"),
      (4L, "individual", "regular", "2023-08-01"))
    // addresses: city move paris→lyon (relocates cust 1's latest city
    // and order 101's monthly group)
    val addr2 = addressesDf((10L, "berlin"), (11L, "lyon"), (12L, "rome"))
    // orders: delete 100, backfill 102's delivered_on, insert 104
    // (becomes cust 2's latest, moving it to berlin)
    val ord2 = ordersDf(
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (102L, 2L, 12L, "2024-01-05", Some("2024-01-25")), // delivery 20
      (104L, 2L, 10L, "2024-03-01", Some("2024-03-20"))) // delivery 19
    writeSilver(wh, cust2, ord2, addr2)
    inc.advanceAll() // CDF fold, never a full re-aggregate
    writeSilver(whB, cust2, ord2, addr2)
    new GoldBuilds(spark, whB).buildAll()
    assertMatchesBatch(wh, whB)

    // replay: advancing again with no new silver commit is a no-op
    // (version AND content unchanged)
    val versions = GoldNames.map(n => wh.gold(n).version)
    inc.advanceAll()
    assert(GoldNames.map(n => wh.gold(n).version) == versions,
      "replayed advance must not rewrite any gold table")

    // ---- v3: single-source commit (only orders change) ----
    val ord3 = ordersDf(
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (102L, 2L, 12L, "2024-01-05", Some("2024-01-25")),
      (104L, 2L, 10L, "2024-03-01", Some("2024-03-20")),
      (105L, 4L, 12L, "2024-03-05", Some("2024-03-06"))) // first order
    wh.silverByName("orders").overwrite(ord3)
    inc.advanceAll()
    whB.silverByName("orders").overwrite(ord3)
    new GoldBuilds(spark, whB).buildAll()
    assertMatchesBatch(wh, whB)

    // ---- crash window: gold overwritten, sidecar write lost ----
    // the live gold version has no marker → next advance must fall back
    // to the safe full rebuild (never double-apply), then re-record
    val g = wh.gold("customer_breakdown")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(g.currentPath, "_cdf_applied_sources"))
    assert(inc.appliedVersions(g).isEmpty)
    inc.customerBreakdown()
    assert(inc.appliedVersions(g).nonEmpty, "sidecar must be restored")
    assertMatchesBatch(wh, whB)
  }

  test("write-side change feeds drive the five-table maintenance to the " +
      "identical result: feed-committed silver (verify mode ON) ≡ batch " +
      "rebuild across the same commit mix") {
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_goldfeed")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")
    // the exact net multiset delta, computed independently of the engine
    // (exceptAll both ways); verify mode cross-checks it a second way
    def feedFor(old: DataFrame, nw: DataFrame): DataFrame =
      nw.exceptAll(old).withColumn("_change_type", lit("insert"))
        .unionByName(old.exceptAll(nw).withColumn("_change_type",
          lit("delete")))
    val cust1 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"),
      (3L, "affiliate", "VIP", "2023-07-01"))
    val addr1 = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val ord1 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", Some("2024-01-15")),
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (102L, 2L, 12L, "2024-01-05", None),
      (103L, 2L, null, "2024-01-20", Some("2024-01-29")))
    val cust2 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "affiliate", "VIP", "2023-06-01"),
      (4L, "individual", "regular", "2023-08-01"))
    val addr2 = addressesDf((10L, "berlin"), (11L, "lyon"), (12L, "rome"))
    val ord2 = ordersDf(
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (102L, 2L, 12L, "2024-01-05", Some("2024-01-25")),
      (104L, 2L, 10L, "2024-03-01", Some("2024-03-20")))
    spark.conf.set("graft.cdf.verifyDeclaredChanges", "true")
    try {
      writeSilver(wh, cust1, ord1, addr1)
      val inc = new GoldIncremental(spark, wh)
      inc.advanceAll()
      wh.silverByName("customers").overwriteWithChanges(cust2,
        feedFor(cust1, cust2))
      wh.silverByName("orders").overwriteWithChanges(ord2,
        feedFor(ord1, ord2))
      wh.silverByName("addresses").overwriteWithChanges(addr2,
        feedFor(addr1, addr2))
      inc.advanceAll()
    } finally spark.conf.unset("graft.cdf.verifyDeclaredChanges")
    writeSilver(whB, cust2, ord2, addr2)
    new GoldBuilds(spark, whB).buildAll()
    assertMatchesBatch(wh, whB)

    // the dashboard seam (round-12 verdict item 8, spec tier — the sf1
    // census is tools/VerifyDashboardIvm): all 8 reference dashboard
    // queries over the MAINTAINED gold tables equal the same queries
    // over the batch REBUILD. Catches what table-level parity alone
    // can't: a maintained table whose extra state columns or column
    // order break the downstream reader.
    val dInc = new graft.gold.Dashboard(spark, wh)
    val dBat = new graft.gold.Dashboard(spark, whB)
    def dashboards(d: graft.gold.Dashboard) = Seq(
      "topVipCities" -> d.topVipCities,
      "totalCustomers" -> d.totalCustomers,
      "customerBreakdownShare" -> d.customerBreakdownShare,
      "ordersInWeek" -> d.ordersInWeek(2024, 6),
      "lowVolumeAffiliates" -> d.lowVolumeAffiliates(2024, 6),
      "cityDeliveryProfile" -> d.cityDeliveryProfile("berlin"),
      "cityAverages" -> d.cityAverages(byYear = true),
      "lateOrderShare" -> d.lateOrderShare())
    dashboards(dInc).zip(dashboards(dBat)).foreach {
      case ((name, qi), (_, qb)) =>
        assert(TestSpark.rows(qi) == TestSpark.rows(qb),
          s"dashboard $name: over-maintained != over-rebuilt")
    }
    // the parameterized queries must actually see rows (a wrong week
    // constant would green-wash D4/D5 on two empty frames) — BOTH of
    // them: D5 can go empty independently of D4's week filter
    assert(dInc.ordersInWeek(2024, 6).count() > 0)
    assert(dInc.lowVolumeAffiliates(2024, 6).count() > 0)
  }

  test("advanceMinMax: insert-only commits fold extrema with ZERO " +
      "rescans; deletes/updates rescan ONLY the groups that lost rows; " +
      "fold + rescan equals the rebuild incl. NULL-skip and " +
      "emptied-group semantics") {
    import graft.gold.GoldMaintenance
    import graft.io.ParquetTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_minmax")
    val src = new ParquetTable(s"$tmp/src")
    val gold = new ParquetTable(s"$tmp/gold")
    def parity(current: org.apache.spark.sql.DataFrame): Unit =
      assert(TestSpark.rows(gold.read(spark)
          .select("grp", "n_rows", "value_sum", "value_min", "value_max")) ==
        TestSpark.rows(GoldMaintenance.aggregateMinMax(
          current, Seq("grp"), col("v"))),
        "maintained extrema must equal the batch rebuild")

    val v1 = Seq((1L, "a", Some(10L)), (2L, "a", Some(5L)),
      (3L, "b", None: Option[Long])).toDF("id", "grp", "v")
    src.overwrite(v1)
    val (_, r1) = GoldMaintenance.advanceMinMax(spark, src, gold,
      Seq("grp"), col("v"))
    assert(r1 == 0) // first call is the full build, no rescan concept
    parity(v1)
    // all-NULL group reads NULL extrema (min/max skip NULLs)
    assert(gold.read(spark).filter(col("grp") === "b").head
      .isNullAt(3))

    // insert-only commit: extrema fold via least/greatest, NO rescan
    val v2 = v1.unionByName(Seq((4L, "a", Some(2L)), (5L, "b", Some(7L)),
      (6L, "c", None: Option[Long])).toDF("id", "grp", "v"))
    src.overwrite(v2)
    val (_, r2) = GoldMaintenance.advanceMinMax(spark, src, gold,
      Seq("grp"), col("v"))
    assert(r2 == 0, "an insert-only commit must not rescan any group")
    parity(v2)
    assert(gold.read(spark).filter(col("grp") === "a").head
      .getLong(3) == 2L, "folded min must see the inserted 2")

    // deletes + an update: group a loses its min (4), group c empties,
    // group b's update rides as delete+insert — exactly THREE groups
    // carry deletes, and only those rescan
    val v3 = Seq((1L, "a", Some(10L)), (2L, "a", Some(5L)),
      (3L, "b", Some(42L))).toDF("id", "grp", "v")
    src.overwrite(v3)
    val (_, r3) = GoldMaintenance.advanceMinMax(spark, src, gold,
      Seq("grp"), col("v"))
    assert(r3 == 3, s"groups a, b, c carry deletes; rescanned $r3")
    parity(v3)
    val a = gold.read(spark).filter(col("grp") === "a").head
    assert(a.getLong(3) == 5L && a.getLong(4) == 10L,
      "rescan must recover the post-delete min/max")
    assert(gold.read(spark).filter(col("grp") === "c").count() == 0,
      "an emptied group must be dropped")

    // replay no-op: same source version, nothing rewritten
    val gv = gold.version
    GoldMaintenance.advanceMinMax(spark, src, gold, Seq("grp"), col("v"))
    assert(gold.version == gv)
  }

  test("distinct-count measure kind (customer_reach_by_city): HLL fold " +
      "equals the batch rebuild across insert-only (union, no rescan), " +
      "pair-loss (rescan recovers the dropped contributor), and " +
      "group-emptying commits — exact at coupon-regime cardinalities") {
    val root = java.nio.file.Files.createTempDirectory("graft_goldreach")
    val wh = new Warehouse(s"$root/inc")
    val inc = new GoldIncremental(spark, wh)
    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))

    def expect(ord: DataFrame): Seq[Seq[Any]] =
      TestSpark.rows(ord.select(col("id"), col("customer_id"),
          col("address_id"), col("year"))
        .join(addr.select(col("id").as("address_id"), col("city")),
          Seq("address_id"), "left")
        .groupBy(col("city"), col("year"))
        .agg(count(lit(1)).as("order_count"),
          count_distinct(col("customer_id")).as("distinct_customers")))

    def got(): Seq[Seq[Any]] = TestSpark.rows(
      wh.gold("customer_reach_by_city").read(spark)
        .select("city", "year", "order_count", "distinct_customers"))
    def check(ord: DataFrame, label: String): Unit =
      assert(got() == expect(ord), s"$label: incremental != rebuild")

    // v1: two customers in berlin, one in paris → full build
    val ord1 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", None), (101L, 2L, 10L, "2024-01-12",
        None), (102L, 2L, 11L, "2024-02-01", None))
    writeSilver(wh, cust, ord1, addr)
    inc.customerReachByCity()
    check(ord1, "v1 full build")

    // v2: INSERT-ONLY — a repeat customer (no distinct change) and a
    // new customer in an existing group, plus a brand-new group; the
    // union fold must land exactly (no pair lost → no rescan)
    val ord2 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", None), (101L, 2L, 10L, "2024-01-12",
        None), (102L, 2L, 11L, "2024-02-01", None),
      (103L, 2L, 10L, "2024-03-01", None), // repeat cust 2 in berlin
      (104L, 3L, 10L, "2024-03-02", None), // NEW cust 3 in berlin
      (105L, 3L, 12L, "2024-03-03", None)) // new group rome
    wh.silverByName("orders").overwrite(ord2)
    inc.customerReachByCity()
    check(ord2, "v2 insert-only union fold")

    // v3: PAIR LOSS — delete order 104 (cust 3's ONLY berlin order:
    // berlin's distinct set must shrink, which no union can express →
    // rescan), delete 103 (cust 2 keeps berlin via 101 — pair
    // survives), and empty rome entirely
    val ord3 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", None), (101L, 2L, 10L, "2024-01-12",
        None), (102L, 2L, 11L, "2024-02-01", None))
    wh.silverByName("orders").overwrite(ord3)
    inc.customerReachByCity()
    check(ord3, "v3 pair-loss rescan")
    assert(TestSpark.rows(wh.gold("customer_reach_by_city").read(spark)
        .filter(col("city") === "rome")).isEmpty,
      "emptied group must be dropped")

    // replay no-op
    val v = wh.gold("customer_reach_by_city").version
    inc.customerReachByCity()
    assert(wh.gold("customer_reach_by_city").version == v)
  }

  test("property: distinct-measure maintenance equals the batch rebuild " +
      "across a random insert/update/delete commit sequence (seeded) — " +
      "every advance, not just the scripted three") {
    val rnd = new scala.util.Random(4242L)
    val root = java.nio.file.Files.createTempDirectory("graft_goldprop")
    val wh = new Warehouse(s"$root/inc")
    val inc = new GoldIncremental(spark, wh)
    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val addrIds = Seq[java.lang.Long](10L, 11L, 12L, null)
    val dates = Seq("2024-01-10", "2024-06-15", "2025-03-02")
    // state: order_id -> (customer_id, address_id, created_on)
    var state = Map[Long, (Long, java.lang.Long, String)]()
    var nextId = 100L
    def toDf() = ordersDf(state.toSeq.sortBy(_._1).map {
      case (id, (c, a, d)) => (id, c, a, d, None: Option[String])
    }: _*)
    def expect(): Seq[Seq[Any]] =
      TestSpark.rows(toDf().select(col("id"), col("customer_id"),
          col("address_id"), col("year"))
        .join(addr.select(col("id").as("address_id"), col("city")),
          Seq("address_id"), "left")
        .groupBy(col("city"), col("year"))
        .agg(count(lit(1)).as("order_count"),
          count_distinct(col("customer_id")).as("distinct_customers")))
    for (step <- 1 to 6) {
      // inserts: a few new orders over a SMALL customer pool so groups
      // share contributors (the duplicate-pair case union must absorb)
      for (_ <- 0 until (2 + rnd.nextInt(4))) {
        state += nextId -> (1L + rnd.nextInt(6),
          addrIds(rnd.nextInt(addrIds.size)), dates(rnd.nextInt(3)))
        nextId += 1
      }
      // updates: move a random order's customer or address (pair loss +
      // gain in one commit)
      state.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.25)
        .foreach { id =>
          val (c, a, d) = state(id)
          state += id -> (if (rnd.nextBoolean()) (1L + rnd.nextInt(6), a, d)
                          else (c, addrIds(rnd.nextInt(addrIds.size)), d))
        }
      // deletes: drop a random slice (pair loss; sometimes empties a
      // group entirely)
      state = state.filter(_ => rnd.nextDouble() > 0.15)
      wh.silverByName("orders").overwrite(toDf())
      if (step == 1) wh.silverByName("addresses").overwrite(addr)
      inc.customerReachByCity()
      val got = TestSpark.rows(
        wh.gold("customer_reach_by_city").read(spark)
          .select("city", "year", "order_count", "distinct_customers"))
      assert(got == expect(),
        s"step $step: incremental distinct fold != batch rebuild " +
          s"(${state.size} live orders)")
    }
  }

  test("streaming silver-orders intake drives the five gold tables to " +
      "the batch rebuild, absorbing replayed and duplicate batches " +
      "(GoldIncStream mirror)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_goldstream")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")

    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"))
    val ord0 = ordersDf((100L, 1L, 10L, "2024-01-10", Some("2024-01-15")))
    writeSilver(wh, cust, ord0, addr)

    // stream rows in the silver orders schema (ordersDf column order)
    def row(id: Long, cu: Long, ad: java.lang.Long, created: String,
        delivered: Option[String]): OrdRow =
      (cu, ts(created), Option(ad).map(_.longValue), d(created),
        delivered.map(d), id, created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"))
    def rebuiltLike(rows: OrdRow*): DataFrame = ordersDf(rows.map { r =>
      (r._6, r._1, r._3.map(java.lang.Long.valueOf).orNull,
        r._2.toString.take(10), r._5.map(_.toString))
    }: _*)

    val in = MemoryStream[OrdRow]
    val stream = in.toDF().toDF("customer_id", "created_on", "address_id",
      "delivery_date", "delivered_on", "id", "year", "month",
      "silver_ingestion_time")
    val q = graft.streaming.GoldIncStream.ordersIntakeStream(stream, wh,
      expectedIds = 1024)
    try {
      val b1 = Seq(
        row(101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
        row(102L, 2L, 11L, "2024-01-05", None))
      // batch 1 replays the seeded order 100 and carries an in-batch dup
      in.addData(b1 ++ Seq(row(100L, 1L, 10L, "2024-01-10",
        Some("2024-01-15")), b1.head))
      q.processAllAvailable()
      writeSilver(whB, cust, rebuiltLike(
        row(100L, 1L, 10L, "2024-01-10", Some("2024-01-15")) +: b1: _*),
        addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // a pure-replay batch commits no silver version, advances no gold
      val silver = wh.silverByName("orders")
      val sv = silver.version
      val gvs = GoldNames.map(n => wh.gold(n).version)
      in.addData(b1)
      q.processAllAvailable()
      assert(silver.version == sv,
        "an all-replay batch must not create a silver version")
      assert(GoldNames.map(n => wh.gold(n).version) == gvs,
        "an all-replay batch must not rewrite any gold table")

      // a later batch advances incrementally to the new rebuild
      val b3 = Seq(row(103L, 2L, 10L, "2024-03-01", Some("2024-03-20")))
      in.addData(b3 ++ b1.take(1))
      q.processAllAvailable()
      writeSilver(whB, cust, rebuiltLike(
        (row(100L, 1L, 10L, "2024-01-10", Some("2024-01-15")) +: b1) ++
          b3: _*), addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // DASHBOARD parity over the STREAM-maintained gold (the
      // VERIFY_DASH protocol, streaming edition): after the replayed +
      // out-of-order intake above (batch 1 mixes Feb-before-Jan rows, a
      // replay of the seeded order and an in-batch dup; batch 3 lands
      // after a zero-churn pure-replay trigger), all 8 reference
      // dashboard queries over the stream-maintained tables equal the
      // same queries over the batch rebuild — the end-to-end reader
      // seam table-level parity alone cannot pin
      val dInc = new graft.gold.Dashboard(spark, wh)
      val dBat = new graft.gold.Dashboard(spark, whB)
      def dashboards(d: graft.gold.Dashboard) = Seq(
        "topVipCities" -> d.topVipCities,
        "totalCustomers" -> d.totalCustomers,
        "customerBreakdownShare" -> d.customerBreakdownShare,
        "ordersInWeek" -> d.ordersInWeek(2024, 6),
        "lowVolumeAffiliates" -> d.lowVolumeAffiliates(2024, 6),
        "cityDeliveryProfile" -> d.cityDeliveryProfile("berlin"),
        "cityAverages" -> d.cityAverages(byYear = true),
        "lateOrderShare" -> d.lateOrderShare())
      dashboards(dInc).zip(dashboards(dBat)).foreach {
        case ((name, qi), (_, qb)) =>
          assert(TestSpark.rows(qi) == TestSpark.rows(qb),
            s"dashboard $name: over-streamed-gold != over-rebuilt")
      }
      // the parameterized queries must see rows — vacuous-empty frames
      // would green-wash the week-keyed pair
      assert(dInc.ordersInWeek(2024, 6).count() > 0)
      assert(dInc.lowVolumeAffiliates(2024, 6).count() > 0)
    } finally q.stop()
  }

  test("extended streaming mirror: the HLL distinct fold and the " +
      "percentile histogram advance with the five tables, absorbing " +
      "replayed and out-of-order batches with zero version churn on " +
      "pure replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.gold.GoldMaintenance
    import graft.streaming.GoldIncStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_goldext")
    val wh = new Warehouse(s"$root/inc")
    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"))
    val ord0 = ordersDf((100L, 1L, 10L, "2024-01-10", Some("2024-01-15")))
    writeSilver(wh, cust, ord0, addr)
    def row(id: Long, cu: Long, ad: java.lang.Long, created: String,
        delivered: Option[String]): OrdRow =
      (cu, ts(created), Option(ad).map(_.longValue), d(created),
        delivered.map(d), id, created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"))
    def rebuiltLike(rows: OrdRow*): DataFrame = ordersDf(rows.map { r =>
      (r._6, r._1, r._3.map(java.lang.Long.valueOf).orNull,
        r._2.toString.take(10), r._5.map(_.toString))
    }: _*)
    // batch expectation, built FRESH per step (full first-build path)
    var step = 0
    def assertExtendedMatches(rows: OrdRow*): Unit = {
      step += 1
      val whB = new Warehouse(s"$root/batch$step")
      writeSilver(whB, cust, rebuiltLike(rows: _*), addr)
      val reachB = new GoldIncremental(spark, whB).customerReachByCity()
        .read(spark).select("city", "year", "order_count",
          "distinct_customers")
      val reachI = wh.gold("customer_reach_by_city").read(spark)
        .select("city", "year", "order_count", "distinct_customers")
      assert(TestSpark.rows(reachI) == TestSpark.rows(reachB),
        s"step $step: streamed distinct fold != batch rebuild")
      val pctB = GoldMaintenance.aggregatePercentile(
        whB.silverByName("orders").read(spark),
        Seq("year", "month"),
        datediff(col("delivered_on"), col("created_on")),
        GoldIncStream.DeliveryPercentiles)
        .select("year", "month", "n_rows", "value_sum", "p50", "p95")
      val pctI = wh.gold(GoldIncStream.DeliveryPercentileGold).read(spark)
        .select("year", "month", "n_rows", "value_sum", "p50", "p95")
      assert(TestSpark.rows(pctI) == TestSpark.rows(pctB),
        s"step $step: streamed percentile fold != batch rebuild")
    }
    val in = MemoryStream[OrdRow]
    val stream = in.toDF().toDF("customer_id", "created_on", "address_id",
      "delivery_date", "delivered_on", "id", "year", "month",
      "silver_ingestion_time")
    val q = GoldIncStream.ordersIntakeStream(stream, wh,
      expectedIds = 1024, extendedMeasures = true)
    try {
      val seed = row(100L, 1L, 10L, "2024-01-10", Some("2024-01-15"))
      val b1 = Seq(
        row(101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
        row(102L, 2L, 11L, "2024-01-05", None)) // NULL delivery time
      in.addData(b1 ++ Seq(seed, b1.head)) // replay + in-batch dup
      q.processAllAvailable()
      assertExtendedMatches(seed +: b1: _*)
      // pure replay: NO version churn on either extended gold
      val rv = wh.gold("customer_reach_by_city").version
      val pv = wh.gold(GoldIncStream.DeliveryPercentileGold).version
      in.addData(b1)
      q.processAllAvailable()
      assert(wh.gold("customer_reach_by_city").version == rv &&
        wh.gold(GoldIncStream.DeliveryPercentileGold).version == pv,
        "an all-replay batch must not rewrite the extended golds")
      // out-of-order: an OLDER order lands after newer ones, plus replay
      val b3 = Seq(row(103L, 2L, 10L, "2023-11-20", Some("2023-12-24")))
      in.addData(b3 ++ b1.take(1))
      q.processAllAvailable()
      assertExtendedMatches((seed +: b1) ++ b3: _*)
    } finally q.stop()
  }

  test("the maintained avg_delivery_time is the derivable sum/count — " +
      "null delivered_on rows stay outside the average, all-null groups " +
      "read NULL (batch avg semantics)") {
    val root = java.nio.file.Files.createTempDirectory("graft_goldavg")
    val wh = new Warehouse(s"$root/w")
    writeSilver(wh,
      customersDf((1L, "affiliate", "regular", "2023-05-01")),
      ordersDf(
        (200L, 1L, 10L, "2024-04-01", None),
        (201L, 1L, 10L, "2024-04-02", None)), // berlin/2024-04: all NULL
      addressesDf((10L, "berlin")))
    val inc = new GoldIncremental(spark, wh)
    inc.ordersByCityYearMonth()
    val row0 = wh.gold("orders_by_city_year_month").read(spark)
      .filter(col("city") === "berlin").head
    assert(row0.getAs[Long]("order_count") == 2L)
    assert(row0.isNullAt(row0.fieldIndex("avg_delivery_time")),
      "an all-null delivery group must read NULL, not 0")
    // backfill one delivered_on → avg over the ONE non-null value
    wh.silverByName("orders").overwrite(ordersDf(
      (200L, 1L, 10L, "2024-04-01", Some("2024-04-08")), // delivery 7
      (201L, 1L, 10L, "2024-04-02", None)))
    inc.ordersByCityYearMonth()
    val row1 = wh.gold("orders_by_city_year_month").read(spark)
      .filter(col("city") === "berlin").head
    assert(row1.getAs[Long]("order_count") == 2L)
    assert(row1.getAs[Double]("avg_delivery_time") == 7.0)
  }

  test("CDC streaming intake (upserts + deletes) drives the gold tables " +
      "to the batch rebuild; replayed events and semantic no-ops " +
      "produce zero version churn") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_goldcdc")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")

    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val ord0 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", Some("2024-01-15")),
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")))
    writeSilver(wh, cust, ord0, addr)

    // CDC event = the silver orders row image + _op (CdcRow, class-level
    // so the tuple encoder derives)
    def ev(op: String, id: Long, cu: Long, ad: java.lang.Long,
        created: String, delivered: Option[String]): CdcRow =
      (cu, ts(created), Option(ad).map(_.longValue), d(created),
        delivered.map(d), id, created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"), op)
    def rebuiltLike(rows: CdcRow*): DataFrame = ordersDf(rows.map { r =>
      (r._6, r._1, r._3.map(java.lang.Long.valueOf).orNull,
        r._2.toString.take(10), r._5.map(_.toString))
    }: _*)

    val in = MemoryStream[CdcRow]
    val stream = in.toDF().toDF("customer_id", "created_on", "address_id",
      "delivery_date", "delivered_on", "id", "year", "month",
      "silver_ingestion_time", "_op")
    val q = graft.streaming.GoldIncStream.ordersCdcStream(stream, wh)
    try {
      // batch 1: a true CDC mix — insert 102, UPDATE 101 (address move),
      // DELETE 100
      val b1 = Seq(
        ev("upsert", 102L, 2L, 12L, "2024-01-05", None),
        ev("upsert", 101L, 1L, 10L, "2024-02-10", Some("2024-02-12")),
        ev("delete", 100L, 1L, 10L, "2024-01-10", Some("2024-01-15")))
      in.addData(b1)
      q.processAllAvailable()
      val fin1 = Seq(
        ev("x", 101L, 1L, 10L, "2024-02-10", Some("2024-02-12")),
        ev("x", 102L, 2L, 12L, "2024-01-05", None))
      writeSilver(whB, cust, rebuiltLike(fin1: _*), addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // batch 2: PURE REPLAY of the same events — re-upserting an
      // identical image and re-deleting an absent id are semantic
      // no-ops, so NO silver commit and NO gold advance may happen
      val silver = wh.silverByName("orders")
      val sv = silver.version
      val gvs = GoldNames.map(n => wh.gold(n).version)
      in.addData(b1)
      q.processAllAvailable()
      assert(silver.version == sv,
        "a replayed CDC batch must not create a silver version")
      assert(GoldNames.map(n => wh.gold(n).version) == gvs,
        "a replayed CDC batch must not rewrite any gold table")

      // batch 3: conflicting in-batch images resolve deterministically
      // (greatest tuple — here the delivered image) and a delete+upsert
      // of one id in one batch nets to the upserted image
      val b3 = Seq(
        ev("upsert", 104L, 2L, 11L, "2024-03-01", None),
        ev("upsert", 104L, 2L, 11L, "2024-03-01", Some("2024-03-09")),
        ev("delete", 102L, 2L, 12L, "2024-01-05", None),
        ev("upsert", 102L, 2L, 10L, "2024-01-06", Some("2024-01-16")))
      in.addData(b3)
      q.processAllAvailable()
      val fin3 = Seq(
        ev("x", 101L, 1L, 10L, "2024-02-10", Some("2024-02-12")),
        ev("x", 102L, 2L, 10L, "2024-01-06", Some("2024-01-16")),
        ev("x", 104L, 2L, 11L, "2024-03-01", Some("2024-03-09")))
      writeSilver(whB, cust, rebuiltLike(fin3: _*), addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // the written feeds are exact deltas: CDF across the CDC commits
      // nets 100 out and 102/104's final images in (multiset semantics)
      val cdf = silver.changesBetween(spark, sv, silver.version)
      val byType = cdf.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType.getOrElse("delete", 0L) > 0L &&
        byType.getOrElse("insert", 0L) > 0L,
        s"CDC feeds must carry both sides of the net change: $byType")
    } finally q.stop()
  }

  /** rel-path → inode map of every data file under a version dir —
    * the hard-link census: a COW commit must carry every untouched
    * partition's files as LINKS to the base version's inodes (same
    * inode), never copies (new inode) and never rewrites.
    */
  private def inodeCensus(verDir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(verDir)
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.getAttribute(p, "unix:ino")
            .asInstanceOf[Long])
        .toMap
    } finally walk.close()
  }

  test("CDC stream over PARTITIONED silver commits copy-on-write: a " +
      "trigger rewrites only touched year/month leaves, hard-links " +
      "every untouched partition's files (inode census), keeps " +
      "stream == batch parity, and pure replays stay zero-churn") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_goldcow")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")

    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val ord0 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", Some("2024-01-15")),
      (102L, 2L, 12L, "2024-01-05", None),
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (110L, 2L, 11L, "2024-03-03", Some("2024-03-11")))
    // silver orders seeded PARTITIONED — the deployment shape the COW
    // stream path exists for; dims stay flat (they are joined, not
    // CDC-maintained here)
    wh.silverByName("customers").overwrite(cust)
    wh.silverByName("addresses").overwrite(addr)
    val silverPart = wh.table("silver_orders", Seq("year", "month"))
    silverPart.overwrite(ord0)

    def ev(op: String, id: Long, cu: Long, ad: java.lang.Long,
        created: String, delivered: Option[String]): CdcRow =
      (cu, ts(created), Option(ad).map(_.longValue), d(created),
        delivered.map(d), id, created.take(4).toInt,
        created.slice(5, 7).toInt, ts("2024-01-01"), op)
    def rebuiltLike(rows: CdcRow*): DataFrame = ordersDf(rows.map { r =>
      (r._6, r._1, r._3.map(java.lang.Long.valueOf).orNull,
        r._2.toString.take(10), r._5.map(_.toString))
    }: _*)

    val in = MemoryStream[CdcRow]
    val stream = in.toDF().toDF("customer_id", "created_on", "address_id",
      "delivery_date", "delivered_on", "id", "year", "month",
      "silver_ingestion_time", "_op")
    val q = graft.streaming.GoldIncStream.ordersCdcStream(stream, wh)
    try {
      val censusV1 = inodeCensus(silverPart.currentPath)
      // batch 1 touches ONLY 2024-02 (update 101's delivery) and
      // 2024-03 (delete 110); 2024-01 must ride as hard links
      val b1 = Seq(
        ev("upsert", 101L, 1L, 10L, "2024-02-10", Some("2024-02-20")),
        ev("delete", 110L, 2L, 11L, "2024-03-03", Some("2024-03-11")))
      in.addData(b1)
      q.processAllAvailable()

      assert(silverPart.version == 2,
        "a fresh-bearing CDC batch must commit exactly one version")
      val rec = graft.io.VersionLog.readRecord(silverPart.path, 2)
      assert(rec.exists(r => r.kind == "replace" && r.feed.nonEmpty),
        s"the CDC commit must be a feed-carrying REPLACE (copy-on-" +
          s"write), not a snapshot overwrite — got ${rec.map(_.kind)}")
      val censusV2 = inodeCensus(silverPart.currentPath)
      val untouchedV1 = censusV1.filter(_._1.startsWith("year=2024/month=1/"))
      assert(untouchedV1.nonEmpty, "fixture must have an untouched leaf")
      untouchedV1.foreach { case (rel, ino) =>
        assert(censusV2.get(rel).contains(ino),
          s"untouched partition file $rel must ride into the new " +
            "version as a HARD LINK (same inode), not a rewrite")
      }
      assert(!censusV2.keys.exists(r => r.startsWith("year=2024/month=3/") &&
          censusV1.contains(r)),
        "the delete-emptied 2024-03 leaf must not carry stale files")

      // parity with the batch rebuild of the final state
      val fin1 = Seq(
        ev("x", 100L, 1L, 10L, "2024-01-10", Some("2024-01-15")),
        ev("x", 102L, 2L, 12L, "2024-01-05", None),
        ev("x", 101L, 1L, 10L, "2024-02-10", Some("2024-02-20")))
      writeSilver(whB, cust, rebuiltLike(fin1: _*), addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // pure replay: identical re-upsert + re-delete of an absent key
      // == empty exact feed == NO commit on silver or any gold table
      val gvs = GoldNames.map(n => wh.gold(n).version)
      in.addData(b1)
      q.processAllAvailable()
      assert(silverPart.version == 2,
        "a pure-replay CDC batch must not commit on the COW path")
      assert(GoldNames.map(n => wh.gold(n).version) == gvs,
        "a pure-replay CDC batch must not rewrite any gold table")
    } finally q.stop()
  }

  test("mixed-entity CDC stream (orders + customers + addresses in one " +
      "feed) drives the gold tables to the batch rebuild; unknown " +
      "_entity and _op values refuse loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_goldmix")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")

    val cust0 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"),
      (3L, "affiliate", "VIP", "2023-07-01"))
    val addr0 = addressesDf((10L, "berlin"), (11L, "paris"), (12L, "rome"))
    val ord0 = ordersDf(
      (100L, 1L, 10L, "2024-01-10", Some("2024-01-15")),
      (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
      (102L, 2L, 12L, "2024-01-05", None))
    // every silver table seeded PARTITIONED in its deployment layout
    wh.table("silver_customers", Seq("year", "month")).overwrite(cust0)
    wh.table("silver_addresses", Seq("city")).overwrite(addr0)
    wh.table("silver_orders", Seq("year", "month")).overwrite(ord0)

    // producer side: the canonical payload rendering (micro-precision
    // timestamp contract) the intake decodes against the committed
    // silver schema
    def payloads(df: DataFrame, entity: String,
        op: String): Seq[(String, String, String)] =
      df.select(graft.streaming.GoldIncStream.cdcPayload(df).as("p"))
        .collect().map(r => (entity, op, r.getString(0))).toSeq

    val in = MemoryStream[(String, String, String)]
    val stream = in.toDF().toDF("_entity", "_op", "_payload")
    val q = graft.streaming.GoldIncStream.mixedCdcStream(stream, wh)
    try {
      // one mixed batch: customer 2 status flip, address 11 city RENAME
      // (a partition MOVE on the city-partitioned silver), order 102
      // delivered + order 103 inserted + order 100 deleted
      val b1 =
        payloads(customersDf((2L, "individual", "regular", "2023-06-01")),
          "customers", "upsert") ++
        payloads(addressesDf((11L, "lyon")), "addresses", "upsert") ++
        payloads(ordersDf(
          (102L, 2L, 12L, "2024-01-05", Some("2024-01-25")),
          (103L, 2L, 10L, "2024-02-15", Some("2024-02-18"))),
          "orders", "upsert") ++
        payloads(ordersDf(
          (100L, 1L, 10L, "2024-01-10", Some("2024-01-15"))),
          "orders", "delete")
      in.addData(b1)
      q.processAllAvailable()

      val cust1 = customersDf((1L, "affiliate", "regular", "2023-05-01"),
        (2L, "individual", "regular", "2023-06-01"),
        (3L, "affiliate", "VIP", "2023-07-01"))
      val addr1 = addressesDf((10L, "berlin"), (11L, "lyon"), (12L, "rome"))
      val ord1 = ordersDf(
        (101L, 1L, 11L, "2024-02-10", Some("2024-02-12")),
        (102L, 2L, 12L, "2024-01-05", Some("2024-01-25")),
        (103L, 2L, 10L, "2024-02-15", Some("2024-02-18")))
      writeSilver(whB, cust1, ord1, addr1)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)

      // the address rename moved the row out of city=paris: the new
      // addresses version must not retain a paris leaf
      val addrT = wh.table("silver_addresses", Seq("city"))
      assert(!inodeCensus(addrT.currentPath).keys
          .exists(_.startsWith("city=paris/")),
        "a city rename must drop the emptied origin partition")

      // replay of the whole mixed batch: zero churn everywhere
      val vers = Seq("customers", "addresses", "orders")
        .map(n => wh.silverByName(n).version)
      val gvs = GoldNames.map(n => wh.gold(n).version)
      in.addData(b1)
      q.processAllAvailable()
      assert(Seq("customers", "addresses", "orders")
          .map(n => wh.silverByName(n).version) == vers,
        "a replayed mixed batch must not commit on any silver table")
      assert(GoldNames.map(n => wh.gold(n).version) == gvs,
        "a replayed mixed batch must not rewrite any gold table")
    } finally q.stop()

    // unknown _entity refuses loudly (no silent drop)
    val inBad = MemoryStream[(String, String, String)]
    val qBad = graft.streaming.GoldIncStream.mixedCdcStream(
      inBad.toDF().toDF("_entity", "_op", "_payload"), wh)
    try {
      inBad.addData(Seq(("order_details", "upsert", "{}")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qBad.processAllAvailable()
      }
      assert(e.getMessage.contains("unknown _entity") ||
        Option(e.getCause).exists(_.getMessage.contains("unknown _entity")))
    } finally qBad.stop()

    // an UNDECODABLE payload refuses loudly too: PERMISSIVE from_json
    // would otherwise decode it to a NULL struct whose all-NULL image
    // merges under NULL keys (null-safe equality) — silent corruption
    val inPay = MemoryStream[(String, String, String)]
    val qPay = graft.streaming.GoldIncStream.mixedCdcStream(
      inPay.toDF().toDF("_entity", "_op", "_payload"), wh)
    try {
      inPay.addData(Seq(("orders", "upsert", "not json at all")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qPay.processAllAvailable()
      }
      assert(e.getMessage.contains("undecodable _payload") ||
        Option(e.getCause).exists(_.getMessage.contains(
          "undecodable _payload")),
        s"got: ${e.getMessage.take(300)}")
    } finally qPay.stop()

    // unknown _op refuses loudly too — 'update' from a real CDC source
    // must never be silently dropped
    val inOp = MemoryStream[CdcRow]
    val qOp = graft.streaming.GoldIncStream.ordersCdcStream(
      inOp.toDF().toDF("customer_id", "created_on", "address_id",
        "delivery_date", "delivered_on", "id", "year", "month",
        "silver_ingestion_time", "_op"), wh)
    try {
      inOp.addData(Seq((1L, ts("2024-01-10"), Some(10L), d("2024-01-10"),
        None, 104L, 2024, 1, ts("2024-01-01"), "update")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qOp.processAllAvailable()
      }
      assert(e.getMessage.contains("unsupported _op") ||
        Option(e.getCause).exists(_.getMessage.contains("unsupported _op")))
    } finally qOp.stop()
  }

  test("a DECOUPLED gold follower driven by the silver table's own " +
      "change stream (graft-table source) reaches the batch rebuild, " +
      "resumes after a restart at exactly the stopped version, and an " +
      "idle table fires no trigger and churns no gold version") {
    val root = java.nio.file.Files.createTempDirectory("graft_goldfollow")
    val wh = new Warehouse(s"$root/inc")
    val whB = new Warehouse(s"$root/batch")
    val cust = customersDf((1L, "affiliate", "regular", "2023-05-01"),
      (2L, "individual", "VIP", "2023-06-01"))
    val addr = addressesDf((10L, "berlin"), (11L, "paris"))
    writeSilver(wh, cust,
      ordersDf((100L, 1L, 10L, "2024-01-10", Some("2024-01-15"))), addr)
    val ckpt = s"$root/ck"

    def rebuildAndCompare(): Unit = {
      writeSilver(whB, cust,
        wh.silverByName("orders").read(spark), addr)
      new GoldBuilds(spark, whB).buildAll()
      assertMatchesBatch(wh, whB)
    }

    // follower session one: builds gold from the seeded silver
    val q1 = graft.streaming.GoldIncStream.goldFollowStream(spark, wh,
      checkpoint = Some(ckpt))
    try q1.processAllAvailable() finally q1.stop()
    rebuildAndCompare()

    // silver advances WHILE THE FOLLOWER IS DOWN: an append commit and
    // a keyed CDC commit (update + delete)
    val silver = wh.silverByName("orders")
    silver.appendVersion(ordersDf(
      (101L, 2L, 11L, "2024-02-01", None),
      (102L, 1L, 11L, "2024-02-05", Some("2024-02-09"))))
    graft.merge.MergeOps.applyCdc(spark, silver,
      ordersDf((101L, 2L, 11L, "2024-02-01", Some("2024-02-20"))),
      Some(Seq(100L).toDF("id")), Seq("id"), skipEmptyFeed = false)

    // follower session two (same checkpoint): catches up exactly
    val q2 = graft.streaming.GoldIncStream.goldFollowStream(spark, wh,
      checkpoint = Some(ckpt))
    try {
      q2.processAllAvailable()
      rebuildAndCompare()
      // idle: no new silver version -> no trigger -> zero gold churn
      val gvs = GoldNames.map(n => wh.gold(n).version)
      q2.processAllAvailable()
      assert(GoldNames.map(n => wh.gold(n).version) == gvs,
        "an idle follower must not rewrite any gold table")
    } finally q2.stop()
  }
}
