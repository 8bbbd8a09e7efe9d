package graft

import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates stay within their documented error bounds of the
  * exact answers (q37 has no cross-engine oracle — sketches are
  * engine-specific — so the accuracy contract is pinned here instead).
  */
class AccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% and approx_percentile within 2% of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.io.Tables.read(spark, dir, "lineitem")
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("orders"),
      expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q37_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    approx.foreach { case (flag, (aOrders, aP50)) =>
      val (eOrders, eP50) = exact(flag)
      assert(math.abs(aOrders - eOrders).toDouble / eOrders < 0.05,
        s"$flag: approx orders $aOrders vs $eOrders")
      assert(math.abs(aP50 - eP50) / eP50 < 0.02,
        s"$flag: approx p50 $aP50 vs $eP50")
    }
  }
}
