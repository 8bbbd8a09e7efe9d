package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashFunctions.minhash_signature
import graft.northstar.TextAnalysis

/** Pins the native [[graft.functions.MinHashSignature]] expression
  * bit-equal to the explode + groupBy + per-permutation
  * `min(xxhash64(lit(seed_i), g))` formulation it replaced, so the hash
  * scheme can never drift from what rounds 1–2 verified against the exact
  * pair-set oracles.
  */
class MinhashParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def legacySignatures(numPerm: Int) = {
    val docs = graft.io.Tables.read(spark, dir, "documents")
    val sets = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.shingleHashes(col("text"), 3)).as("__shingles"))
    val seeds = (0 until numPerm).map(i => i * 2654435761L.toInt + 1)
    val mins = seeds.zipWithIndex.map { case (s, i) =>
      min(xxhash64(lit(s), col("__g"))).as(s"__m$i")
    }
    sets.select(col("doc_id"), explode(col("__shingles")).as("__g"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerm).map(i => col(s"__m$i")): _*).as("__sig"))
  }

  test("native signature is bit-identical to the exploded aggregate form") {
    val docs = graft.io.Tables.read(spark, dir, "documents")
    val native = graft.northstar.Dedup
      .minhashSignatures(docs, "doc_id", "text", 16, 3)
    assert(TestSpark.rows(native) == TestSpark.rows(legacySignatures(16)))
  }

  test("signature is invariant under array_distinct on the shingles") {
    val docs = graft.io.Tables.read(spark, dir, "documents").limit(50)
    val dup = docs.select(col("doc_id"),
      TextAnalysis.shingleHashes(col("text"), 3).as("__sh"))
    val viaRaw = dup.select(col("doc_id"),
      minhash_signature(col("__sh"), 8).as("sig"))
    val viaDistinct = dup.select(col("doc_id"),
      minhash_signature(array_distinct(col("__sh")), 8).as("sig"))
    assert(TestSpark.rows(viaRaw) == TestSpark.rows(viaDistinct))
  }

  test("empty shingle array yields NULL; NULL input yields NULL") {
    import spark.implicits._
    val df = Seq((1, Some(Seq(42L, 7L))), (2, Some(Seq.empty[Long])), (3, None))
      .toDF("id", "sh")
      .select(col("id"), minhash_signature(col("sh"), 4).as("sig"))
    val got = df.collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got(1) != null && got(1).length == 4)
    assert(got(2) == null)
    assert(got(3) == null)
  }

  test("interpreted eval matches codegen output") {
    import spark.implicits._
    // force both paths through a literal round-trip: collect codegen result,
    // recompute via the util directly
    val sh = Seq(3L, 99L, -5L, 3L)
    val viaPlan = Seq(Tuple1(sh)).toDF("sh")
      .select(minhash_signature(col("sh"), 6).as("sig"))
      .collect()(0).getSeq[Long](0)
    val direct = graft.functions.MinHashUtil.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sh.toArray), 6)
      .toLongArray().toSeq
    assert(viaPlan == direct)
  }
}
