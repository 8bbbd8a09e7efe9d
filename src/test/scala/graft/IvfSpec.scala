package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.{IvfIndex, Similarity}

/** IVF ANN: deterministic build, and recall@5 against the brute-force
  * baseline on the real embeddings.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("IVF search recall@5 vs brute force is high with nprobe=half the cells") {
    val emb = Tables.read(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)

    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = index.search(queries, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 too low: $recall")
    // every returned neighbor must be a real corpus vector, ranked within k
    assert(approx.forall(_._2 >= 0))
  }

  test("IVF build is deterministic for a fixed seed") {
    val emb = Tables.read(spark, dir, "embeddings").limit(200)
    val a = IvfIndex.build(emb, "vec_id", "embedding", 4).assigned
      .select("neighbor_id", "cell")
    val b = IvfIndex.build(emb, "vec_id", "embedding", 4).assigned
      .select("neighbor_id", "cell")
    assert(TestSpark.rows(a) == TestSpark.rows(b))
  }
}
