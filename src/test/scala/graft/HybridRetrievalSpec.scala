package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.HybridRetrieval

/** RRF fusion laws: hand-computed micro-unit contributions, the
  * agreement boost, single-arm documents with NULL other-arm rank, the
  * deterministic tie-break, the k cut, and the floor-of-double-division
  * == integer-quotient exactness claim the scaladoc makes.
  */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The reference contribution: pure integer division. */
  private def c(rank: Int): Long = 1000000L / (60L + rank)

  private def sparse(rows: (Int, Long, Int)*) =
    rows.toSeq.toDF("query_id", "doc_id", "sparse_rank")
  private def dense(rows: (Int, Long, Int)*) =
    rows.toSeq.toDF("query_id", "doc_id", "dense_rank")

  test("fused scores are the exact micro-unit sum: both-arm docs add " +
      "both contributions, single-arm docs one, ranks re-assigned by " +
      "(score desc, doc_id)") {
    val out = HybridRetrieval.fuse(
      sparse((1, 10L, 1), (1, 11L, 2), (1, 12L, 3)),
      dense((1, 11L, 1), (1, 13L, 2)), k = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Int]), r.getInt(5)))
    // doc 11 is in BOTH arms: c(2)+c(1) = 16129+16393 = 32522 — the
    // agreement boost puts it above doc 10's single c(1)
    assert(out.toSeq == Seq(
      (11L, c(2) + c(1), Some(2), Some(1), 1),
      (10L, c(1), Some(1), None, 2),
      (13L, c(2), None, Some(2), 3),
      (12L, c(3), Some(3), None, 4)))
  }

  test("equal fused scores break ties by doc_id; the k cut keeps " +
      "exactly k per query, per query independently") {
    // q1: docs 5 and 3 both have only sparse rank 1 vs rank 1 — make
    // them tie exactly via identical single contributions
    val out = HybridRetrieval.fuse(
      sparse((1, 5L, 1), (2, 9L, 1), (2, 8L, 2)),
      dense((1, 3L, 1), (2, 7L, 1)), k = 2)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(5)))
    // q1: both docs score c(1); doc 3 < doc 5 wins the tie
    // q2: doc 9 and doc 7 tie at c(1) (doc 7 wins), doc 8 at c(2) is
    // cut by k=2
    assert(out.toSeq == Seq((1, 3L, 1), (1, 5L, 2), (2, 7L, 1), (2, 9L, 2)))
  }

  test("contribution() equals the integer quotient for every rank a " +
      "retrieval list can carry (the floor-of-double-division claim)") {
    val ranks = (1 to 100000).toDF("r")
    val bad = ranks.select(
      HybridRetrieval.contribution(col("r")).as("got"),
      (lit(1000000L) - pmod(lit(1000000L), col("r") + 60L))
        .divide(col("r") + 60L).cast("long").as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0L)
  }

  test("fuse rejects k < 1 loudly") {
    intercept[IllegalArgumentException] {
      HybridRetrieval.fuse(sparse((1, 1L, 1)), dense((1, 2L, 1)), k = 0)
    }
  }

  test("q108 end-to-end: every query returns <= k rows, rrf_micro is " +
      "consistent with the carried arm ranks, and both arms contribute " +
      "rows to the fused lists") {
    val out = graft.queries.NorthStarQueries
      .q108HybridRrf(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getInt(0))
    assert(perQuery.values.forall(_.length <= 10))
    out.foreach { r: Row =>
      val want =
        Option(r.get(3)).map(x => c(x.asInstanceOf[Int])).getOrElse(0L) +
          Option(r.get(4)).map(x => c(x.asInstanceOf[Int])).getOrElse(0L)
      assert(r.getLong(2) == want, s"rrf_micro mismatch on $r")
    }
    // the synthetic embeddings are uncorrelated with the text, so a
    // both-arms hit is not guaranteed at any tier (the agreement boost
    // is pinned by the unit tests above); what the corpus MUST show is
    // both retrievers live in the fused output
    assert(out.exists(r => !r.isNullAt(3)), "sparse arm contributed nothing")
    assert(out.exists(r => !r.isNullAt(4)), "dense arm contributed nothing")
  }

  test("q108 follows the cache-ownership discipline: one surviving " +
      "cached relation (the returned fused frame), the BM25 arm released") {
    import org.apache.spark.sql.GraftBridge
    spark.catalog.clearCache()
    val result = graft.queries.NorthStarQueries
      .q108HybridRrf(spark, "/root/testdata/sf0.001")
    result.collect()
    assert(!GraftBridge.cacheIsEmpty(spark),
      "the returned relation is the one documented surviving cache")
    result.unpersist(blocking = true)
    assert(GraftBridge.cacheIsEmpty(spark),
      "the BM25 arm's cache may not outlive the call once the returned " +
        "relation is released")
  }
}
