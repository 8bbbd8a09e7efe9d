package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{GoldMaintenance, QuantileHist}

/** The percentile measure kind (q116): deterministic log-bucketed
  * histograms — bucket/representative laws, type-1 rank semantics, and
  * the signed-foldable maintenance loop (fold ≡ rebuild EXACTLY, even
  * for deletes — no rescan path exists, unlike min/max).
  */
class QuantileHistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference bucket arithmetic, independently in plain Scala. */
  private def refBucket(v: Long): Int = {
    require(v >= 0)
    if (v < 16) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - 4 + 1) * 16 + ((v >> (e - 4)) - 16)).toInt
    }
  }
  private def refRep(b: Int): Long =
    if (b < 16) b.toLong else (16L + b % 16) << (b / 16 - 1)

  test("bucketOf/representative laws: engine matches the independent " +
      "reference on edge-heavy values; rep is the bucket's lower bound " +
      "within the 2^-4 relative width; small values are exact") {
    val edges = (0L to 300L) ++
      (4 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq(999L, 1000L, 123456789L, Long.MaxValue / 2, Long.MaxValue)
    val df = edges.distinct.sorted.toDF("v")
      .withColumn("b", QuantileHist.bucketOf(col("v")))
      .withColumn("rep", QuantileHist.representative(col("b")))
    val rows = df.collect()
    rows.foreach { r =>
      val (v, b, rep) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(b == refBucket(v), s"bucket($v): engine $b vs ref ${refBucket(v)}")
      assert(rep == refRep(b), s"rep($b): engine $rep vs ref ${refRep(b)}")
      assert(rep <= v, s"rep must be the lower bound: $rep > $v")
      if (v < 16) assert(rep == v, s"small values are exact: $v -> $rep")
      else assert((v - rep).toDouble / v <= 1.0 / 16 + 1e-15,
        s"relative width bound: v=$v rep=$rep")
    }
    // buckets are monotone in v (percentiles depend on this total order)
    val bs = rows.map(_.getInt(1))
    assert(bs.zip(bs.tail).forall { case (a, c) => a <= c })
    // NULL-safe, negative fails loudly
    assert(Seq(Option.empty[Long]).toDF("v")
      .select(QuantileHist.bucketOf(col("v"))).head.isNullAt(0))
    val neg = intercept[Exception](Seq(-1L).toDF("v")
      .select(QuantileHist.bucketOf(col("v"))).collect())
    assert(neg.getMessage.contains("non-negative"))
  }

  test("percentile: type-1 (ceil rank) semantics, exact on sub-16 " +
      "values; integer-rational ranks do not flip on exact multiples") {
    // values < 16 bucketize exactly, so the histogram percentile IS the
    // exact type-1 quantile — compare against a hand computation
    val vals = Seq(1L, 2L, 2L, 3L, 5L, 8L, 8L, 8L, 13L, 15L)
    val df = vals.toDF("v").withColumn("grp", lit("g"))
    val agg = GoldMaintenance.aggregatePercentile(df, Seq("grp"), col("v"),
      Seq(("p50", 50, 100), ("p95", 95, 100), ("p20", 20, 100)))
    val row = agg.select("n_rows", "value_sum", "p50", "p95", "p20").head
    def ref(p: Int) = { // type-1: smallest v with rank >= ceil(p*n/100)
      val sorted = vals.sorted
      val r = (p * sorted.length + 99) / 100
      sorted(r - 1)
    }
    assert(row.getLong(0) == 10 && row.getLong(1) == vals.sum)
    assert(row.getLong(2) == ref(50), s"p50: ${row.getLong(2)} vs ${ref(50)}")
    assert(row.getLong(3) == ref(95))
    assert(row.getLong(4) == ref(20))
    // p50 of exactly 10 values: rank ceil(5.0)=5 → the 5th (=5), the
    // exact-multiple case a double ceil(0.5*10)=5.000000001 would flip
    assert(row.getLong(2) == 5L)
  }

  test("the histogram algebra is SQL-callable: qhist_bucket/rep/" +
      "percentile reproduce the Column API") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT qhist_bucket(1000L) AS b, qhist_rep(qhist_bucket(1000L)) AS rep,
         qhist_percentile(array(struct(3 AS b, 4L AS n),
                                struct(20 AS b, 6L AS n)), 50, 100) AS p50""")
      .head
    assert(r.getInt(0) == refBucket(1000L))
    assert(r.getLong(1) == refRep(refBucket(1000L)))
    // rank ceil(0.5*10)=5 falls in bucket 20 → its representative
    assert(r.getLong(2) == refRep(20))
  }

  test("advancePercentile: fold equals the batch rebuild EXACTLY across " +
      "insert/update/delete commits — including the histogram, NULL " +
      "groups, emptied groups; replay is a no-op; deletes need no rescan") {
    import graft.io.ParquetTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_qhist")
    val src = new ParquetTable(s"$tmp/src")
    val gold = new ParquetTable(s"$tmp/gold")
    val ps = Seq(("p50", 50, 100), ("p95", 95, 100))
    def parity(current: org.apache.spark.sql.DataFrame): Unit = {
      val cols = Seq("grp", "n_rows", "value_sum", "value_hist", "p50", "p95")
      assert(TestSpark.rows(gold.read(spark).select(cols.head, cols.tail: _*))
          == TestSpark.rows(GoldMaintenance.aggregatePercentile(
            current, Seq("grp"), col("v"), ps).select(cols.head,
            cols.tail: _*)),
        "maintained percentiles must equal the batch rebuild bit-exactly")
    }
    val v1 = Seq((1L, "a", Some(10L)), (2L, "a", Some(500L)),
      (3L, "a", Some(501L)), (4L, "b", None: Option[Long]),
      (5L, "c", Some(7L))).toDF("id", "grp", "v")
    src.overwrite(v1)
    GoldMaintenance.advancePercentile(spark, src, gold, Seq("grp"),
      col("v"), ps)
    parity(v1)
    // all-NULL group: NULL percentiles, empty hist, n_rows counted
    val b = gold.read(spark).filter(col("grp") === "b").head()
    assert(b.getAs[Long]("n_rows") == 1 && b.isNullAt(b.fieldIndex("p50")))
    // v2: insert into a (shifts p95), update c (delete+insert through the
    // CDF), new group d
    val v2 = Seq((1L, "a", Some(10L)), (2L, "a", Some(500L)),
      (3L, "a", Some(501L)), (4L, "b", None: Option[Long]),
      (5L, "c", Some(9000L)), (6L, "a", Some(100000L)),
      (7L, "d", Some(3L))).toDF("id", "grp", "v")
    src.overwrite(v2)
    GoldMaintenance.advancePercentile(spark, src, gold, Seq("grp"),
      col("v"), ps)
    parity(v2)
    // replay: no new source version → no gold rewrite
    val ver = gold.version
    GoldMaintenance.advancePercentile(spark, src, gold, Seq("grp"),
      col("v"), ps)
    assert(gold.version == ver)
    // v3: mass delete — group d empties (must drop), group a loses its
    // max (histogram subtracts exactly; NO rescan path exists to be
    // wrong); b's NULL row survives
    val v3 = Seq((1L, "a", Some(10L)), (2L, "a", Some(500L)),
      (4L, "b", None: Option[Long]), (5L, "c", Some(9000L)))
      .toDF("id", "grp", "v")
    src.overwrite(v3)
    GoldMaintenance.advancePercentile(spark, src, gold, Seq("grp"),
      col("v"), ps)
    parity(v3)
    assert(gold.read(spark).filter(col("grp") === "d").isEmpty,
      "emptied groups must drop")
  }
}
