package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.io.Tables
import graft.northstar.Similarity

/** Native Catalyst expression: correctness, HOF-equivalence, SQL path. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim matches the HOF fold bit-for-bit on real embeddings") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(100)
      .select(Similarity.toDoubleVec(col("embedding")).as("v"))
    val pairs = emb.withColumn("id", monotonically_increasing_id())
      .crossJoin(emb.withColumnRenamed("v", "w").limit(5))
    val diff = pairs.select(
      (GraftFunctions.cosine_sim(col("v"), col("w")) -
        Similarity.cosine(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0)
    assert(diff == 0.0)
  }

  test("dot_product matches the HOF fold bit-for-bit, incl. NULL poisoning") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
      .select(Similarity.toDoubleVec(col("embedding")).as("v"))
    val pairs = emb.crossJoin(emb.withColumnRenamed("v", "w").limit(5))
    val diff = pairs.select(
      (GraftFunctions.dot_product(col("v"), col("w")) -
        Similarity.dot(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0)
    assert(diff == 0.0)
    // HOF parity on the edges: NULL element poisons, length mismatch → NULL
    val edge = Seq(
      (Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))),
      (Seq(Option(1.0), Option(2.0)), Seq(Option(2.0))))
      .toDF("a", "b")
    val got = edge.select(GraftFunctions.dot_product($"a", $"b").as("n"),
      Similarity.dot($"a", $"b").as("h")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("cosine_sim handles zero vectors and known values") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(0.0, 0.0), Seq(1.0, 1.0), 0.0))
      .toDF("a", "b", "expected")
    val got = df.select(GraftFunctions.cosine_sim($"a", $"b").as("c"), $"expected")
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine_sim returns NULL on mismatched dimensions (like the HOF fold)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val native = df.select(GraftFunctions.cosine_sim($"a", $"b")).head
    assert(native.isNullAt(0))
    val hof = df.select(Similarity.cosine($"a", $"b")).head
    assert(hof.isNullAt(0))
  }

  test("cosine_sim treats NULL elements as 0.0 in both eval paths") {
    val df = Seq((Seq(Option(3.0), Option.empty[Double]), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b")
    // (3,null)·(3,4) with null→0: dot=9, |a|=3, |b|=5 → 0.6
    val viaCodegen = df.select(GraftFunctions.cosine_sim($"a", $"b")).head.getDouble(0)
    assert(viaCodegen == 0.6)
  }

  test("cosine_sim casts float arrays and registers for SQL") {
    GraftFunctions.register(spark)
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
                           CAST(b.embedding AS ARRAY<DOUBLE>)) AS c
         FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id = 0""").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
