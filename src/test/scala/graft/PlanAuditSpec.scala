package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** The plan-shape audit's gates must actually catch regressions: a seeded
  * stray BroadcastNestedLoopJoin (the accidental scale-killer) flips
  * `bnlj_unexpected`, while the reviewed allowlisted sites do not.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def nonEquiJoin(s: SparkSession, d: String): DataFrame = {
    val nation = s.read.parquet(s"$d/nation.parquet")
    val region = s.read.parquet(s"$d/region.parquet")
    // non-equi condition → Spark must plan a BroadcastNestedLoopJoin
    nation.join(broadcast(region),
      nation("n_regionkey") < region("r_regionkey"))
  }

  test("a seeded stray BNLJ flips bnlj_unexpected; clean queries do not") {
    val clean = Map[String, (SparkSession, String) => DataFrame](
      "qx_clean_agg" -> ((s, d) =>
        s.read.parquet(s"$d/nation.parquet").groupBy("n_regionkey").count()))
    val seeded = clean + ("qx_stray_bnlj" -> (nonEquiJoin _))

    val cleanShapes = PlanAudit.audit(spark, dir, clean)
    assert(!PlanAudit.bnljUnexpected(cleanShapes))

    val seededShapes = PlanAudit.audit(spark, dir, seeded)
    val stray = seededShapes.toMap.apply("qx_stray_bnlj")
    assert(stray.err.isEmpty && stray.bnlj >= 1,
      s"the seeded non-equi join must plan a BNLJ: $stray")
    assert(PlanAudit.bnljUnexpected(seededShapes),
      "an un-allowlisted BNLJ must flip the gate")
    // the broadcast side's estimated size is recorded for diffing
    assert(stray.bnljBcastBytes.nonEmpty &&
      stray.bnljBcastBytes.flatten.forall(_ > 0))
  }

  test("an allowlisted query's reviewed BNLJ passes; an EXTRA one would not") {
    // an allowlisted name with its one expected BNLJ → gate stays green
    val one = Map[String, (SparkSession, String) => DataFrame](
      "q26_knn_brute" -> (nonEquiJoin _))
    assert(!PlanAudit.bnljUnexpected(PlanAudit.audit(spark, dir, one)))
    // same plan under a name allowed zero → gate flips (count is per query)
    val zero = Map[String, (SparkSession, String) => DataFrame](
      "q01_pricing_summary" -> (nonEquiJoin _))
    assert(PlanAudit.bnljUnexpected(PlanAudit.audit(spark, dir, zero)))
  }

  test("shuffle volume estimates are emitted per exchange") {
    val q = Map[String, (SparkSession, String) => DataFrame](
      "qx_shuffle" -> ((s, d) =>
        s.read.parquet(s"$d/orders.parquet")
          .groupBy("o_custkey").agg(sum("o_totalprice"))))
    val shape = PlanAudit.audit(spark, dir, q).toMap.apply("qx_shuffle")
    assert(shape.err.isEmpty && shape.shuffles >= 1)
    assert(shape.shuffleBytes.nonEmpty,
      s"each exchange must carry a size estimate: $shape")
    assert(shape.shuffleBytes.forall(_.exists(_ > 0)))
    assert(!shape.unreliableStats,
      s"a parquet-backed aggregate has real stats: $shape")
    // audit failures are recorded, not fatal
    val bad = Map[String, (SparkSession, String) => DataFrame](
      "qx_boom" -> ((s, d) => s.read.parquet(s"$d/does_not_exist.parquet")))
    val boom = PlanAudit.audit(spark, dir, bad).toMap.apply("qx_boom")
    assert(boom.err.isDefined)
  }

  test("a default-stat leaf taints the volume estimate: null + " +
      "unreliable_stats, never an astronomical number") {
    // an RDD-backed frame has NO statistics — its leaf reports the
    // spark.sql.defaultSizeInBytes guess, and a join's propagated
    // product becomes the 1e54-"bytes" garbage r6 committed. The audit
    // must censor it, not publish it.
    val q = Map[String, (SparkSession, String) => DataFrame](
      "qx_tainted" -> { (s, d) =>
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))
        def statless = s.createDataFrame(
          s.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
          schema)
        statless.join(statless.withColumnRenamed("id", "id2"),
            col("id") === col("id2"))
          .groupBy("id").count()
      })
    val shape = PlanAudit.audit(spark, dir, q).toMap.apply("qx_tainted")
    assert(shape.err.isEmpty && shape.shuffles >= 1)
    assert(shape.unreliableStats, s"default-stat inputs must taint: $shape")
    assert(shape.shuffleBytes.exists(_.isEmpty),
      s"tainted estimates must be censored to null: $shape")
    assert(shape.shuffleBytes.flatten
      .forall(_ < graft.tools.PlanAudit.EstimateCeiling),
      s"no surviving estimate may be astronomical: $shape")
  }

  test("measured shuffle writes merge from a bench detail record") {
    val tmp = java.nio.file.Files.createTempFile("graft_bd", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"detail":{"q01_pricing_summary":{"best":0.1,"first":0.2,""" +
        """"runs":[0.1],"steal":[0.0],"shuffle_write_bytes":12345,""" +
        """"shuffle_read_bytes":23456,"spill_bytes":0},""" +
        """"q93_supplier_rank":{"best":2.0,"first":8.0,"runs":[2.0],""" +
        """"steal":[0.0],"shuffle_write_bytes":34567890,""" +
        """"shuffle_read_bytes":3,"spill_bytes":0}}}""")
    val m = PlanAudit.measuredShuffleWrites(tmp.toString)
    assert(m === Map("q01_pricing_summary" -> 12345L,
      "q93_supplier_rank" -> 34567890L))
    assert(PlanAudit.measuredShuffleWrites("/nonexistent/x.json").isEmpty)
  }

  test("measured-truth censor: an estimate >100x the measured bytes is " +
      "nulled and the query marked unreliable (the q110 shape)") {
    def shape(est: Seq[Option[BigInt]]) = PlanAudit.Shape(
      shuffles = est.length, broadcasts = 0, scans = 1, cartesian = false,
      bnlj = 0, bnljBcastBytes = Nil, shuffleBytes = est,
      shuffleRows = est.map(_ => BigInt(-1)), unreliableStats = false,
      err = None)
    // q110's shape: a 26 GB plan-side estimate against 1.5 MB measured
    val garbage = shape(Seq(Some(BigInt("27979679779")), Some(BigInt(1000))))
    val honest = shape(Seq(Some(BigInt(1400000))))
    val out = PlanAudit.censorAgainstMeasured(
      Seq("qx" -> garbage, "qy" -> honest),
      Map("qx" -> 1500000L, "qy" -> 1500000L)).toMap
    assert(out("qx").unreliableStats, "the implausible estimate must taint")
    assert(out("qx").shuffleBytes === Seq(None, Some(BigInt(1000))),
      "only the implausible exchange is nulled; honest ones survive")
    assert(!out("qy").unreliableStats && out("qy").shuffleBytes ===
      honest.shuffleBytes, "plausible estimates pass through untouched")
    // near-zero measurements use the 1 MiB floor, not a zero bound
    val small = shape(Seq(Some(BigInt(50 << 20))))
    val flo = PlanAudit.censorAgainstMeasured(
      Seq("qz" -> small), Map("qz" -> 0L)).toMap
    assert(!flo("qz").unreliableStats,
      "50 MB against a 100 MiB floored bound must not taint")
    // queries without a measured record are untouched (no truth to
    // censor against)
    val un = PlanAudit.censorAgainstMeasured(
      Seq("qx" -> garbage), Map.empty).toMap
    assert(!un("qx").unreliableStats)
  }
}
