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

  test("HLL sketch rollup: daily-partial union is lossless and tracks " +
      "exact distincts (q86)") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("q86_sketch_rollup")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val events = graft.io.Tables.read(spark, dir, "events")
    // union of per-day sketches must estimate EXACTLY like one direct
    // sketch over all events — equal-config HLL union is lossless, which
    // is what lets a persisted sketch table answer any slice rescan-free
    val direct = events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == direct, s"union must be lossless: $est vs $direct")
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / math.max(n, 1L) <= 0.02,
        s"$k: estimate ${est(k)} vs exact $n")
    }
  }

  test("count-min sketch never undercounts and overcounts within eps*N") {
    import org.apache.spark.sql.functions._
    import graft.functions.CmsFunctions
    import graft.northstar.TextAnalysis
    val eps = 0.0005
    val toks = graft.io.Tables.read(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val bytes = CmsFunctions.serialize(
      toks.stat.countMinSketch("tok", eps, 0.99, 42))
    val n = toks.count()
    // audit EVERY distinct token, not just the heavy hitters
    val audited = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .select(col("tok"), col("exact"),
        CmsFunctions.cms_estimate(col("tok"), bytes).as("est"))
      .collect()
    assert(audited.nonEmpty)
    audited.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
    // ε·N bound holds w.p. ≥ 1−δ per key; allow a 1% violator tail (δ)
    val bound = eps * n
    val violators = audited.count(r => (r.getLong(2) - r.getLong(1)) > bound)
    assert(violators <= math.max(1, audited.length / 100),
      s"$violators of ${audited.length} tokens exceed the eps*N=$bound overcount")
    // q76 surfaces the same numbers for the top-20 with exact ranks
    val q76 = SparkEntry.queries("q76_heavy_hitters")(spark, dir).collect()
    assert(q76.length == 20)
    assert(q76.forall(r => r.getAs[Long]("overcount") >= 0L))
  }

  test("q116 percentile gates: the bucketized report is a lower bound " +
      "of the exact type-1 percentile within the 2^-4 bucket width") {
    val gates = graft.tools.Accuracy.q116Gates(spark, dir)
    assert(gates.nonEmpty && gates.forall(_.pass),
      gates.map(g => s"${g.metric}=${g.value} ${g.op} ${g.bound}")
        .mkString("; "))
  }
}
