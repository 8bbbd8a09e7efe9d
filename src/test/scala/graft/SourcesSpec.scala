package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.VectorOps
import graft.sources.TextSources

/** Schema-enforced CSV/JSONL ingestion with DLQ routing + vector ops. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("CSV reader routes malformed rows to the DLQ split, keeps the rest") {
    val dir = Files.createTempDirectory("graft_csv_spec")
    Files.writeString(dir.resolve("data.csv"),
      """id,name,score
        |1,"alpha, quoted",1.5
        |not-a-long,beta,2.5
        |3,gamma,oops
        |4,delta,4.0
        |""".stripMargin)
    val (clean, corrupt) = TextSources.split(
      TextSources.readCsv(spark, dir.toString, schema))
    assert(clean.count() == 2)
    assert(corrupt.count() == 2)
    // quoted comma survives; corrupt rows keep their raw text for repair
    assert(clean.filter($"id" === 1L).head.getString(1) == "alpha, quoted")
    val raw = corrupt.select(TextSources.CorruptCol).collect().map(_.getString(0))
    assert(raw.exists(_.startsWith("not-a-long")) && raw.exists(_.endsWith("oops")))
  }

  test("JSONL reader routes malformed lines to the DLQ split") {
    val dir = Files.createTempDirectory("graft_jsonl_spec")
    Files.writeString(dir.resolve("data.json"),
      """{"id":1,"name":"alpha","score":1.5}
        |{"id":2,"name":"beta"
        |{"id":3,"name":"gamma","score":3.0}
        |""".stripMargin)
    val (clean, corrupt) = TextSources.split(
      TextSources.readJsonl(spark, dir.toString, schema))
    assert(clean.count() == 2)
    assert(corrupt.count() == 1)
    // missing field is NULL (schema-tolerant), not corrupt
    assert(clean.filter($"id" === 1L).head.isNullAt(2) == false)
  }

  test("ORC round-trip preserves rows exactly and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc_spec").toString
    val src = Seq((1L, "a", 10.5), (2L, "b", -3.0), (3L, "c", 0.0),
      (4L, "d", 7.25)).toDF("id", "name", "score")
    src.coalesce(1).write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(TestSpark.rows(back) == TestSpark.rows(src))
    // the predicate must reach the ORC reader (PushedFilters), not run as
    // a post-scan Filter only — at 100 TB that's stripe-level skipping
    val plan = back.filter($"score" > 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(score), GreaterThan(score,0.0)]"),
      s"ORC scan must carry the pushed predicate:\n$plan")
  }

  test("int8 quantization round-trip error is bounded by scale/2 per component") {
    val df = Seq(Tuple1(Seq(0.9, -0.4, 0.05, 0.0)), Tuple1(Seq(0.0, 0.0, 0.0, 0.0)))
      .toDF("v")
      .withColumn("scale", VectorOps.quantScale(VectorOps.maxAbs($"v")))
    val got = df.select(
      VectorOps.maxQuantError($"v", $"scale").as("err"), $"scale").collect()
    got.foreach { r =>
      assert(r.getDouble(0) <= 0.5 / r.getDouble(1) + 1e-12)
    }
    // codes are genuine int8 range and dequantize back within the bound
    val codes = df.select(VectorOps.quantizeInt8($"v", $"scale").as("c"))
      .head.getSeq[Int](0)
    assert(codes.forall(c => c >= -127 && c <= 127))
  }

  test("l2Normalize produces unit vectors and keeps zero vectors zero") {
    val df = Seq(Tuple1(Seq(3.0, 4.0)), Tuple1(Seq(0.0, 0.0))).toDF("v")
      .withColumn("n", VectorOps.l2Norm($"v"))
      .withColumn("u", VectorOps.l2Normalize($"v", $"n"))
    val norms = df.select(VectorOps.l2Norm($"u")).collect().map(_.getDouble(0))
    assert(math.abs(norms(0) - 1.0) < 1e-12 && norms(1) == 0.0)
  }
}
