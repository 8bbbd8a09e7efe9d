package graft

import org.apache.spark.sql.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.Bm25

/** BM25 retrieval: hand-computed scores on a tiny corpus, the zero-df
  * guard, tie-breaking, and the cache-ownership discipline the Dedup
  * operators follow (one documented surviving relation).
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // dl: d1=3, d2=2, d3=4; N=3, avgdl=3.0
  private def docs = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "c c c b"))
    .toDF("doc_id", "text")

  /** Independent reference: the same rational-idf micro-unit formula in
    * plain Scala.
    */
  private def micro(tf: Long, df: Long, dl: Long, n: Double,
      avgdl: Double): Long =
    if (tf == 0) 0L
    else math.round(((n - df + 0.5) / (df + 0.5) + 1.0) *
      (tf.toDouble * 2.2) /
      (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)) *
      1000000.0)

  test("scores match an independently-coded reference; zero-df terms " +
    "contribute nothing; unmatched docs are dropped") {
    spark.catalog.clearCache()
    val out = Bm25.topK(docs, "doc_id", "text",
      Seq(1 -> Seq("a"), 2 -> Seq("a", "zz"), 3 -> Seq("b", "c")), k = 10)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    val (n, avgdl) = (3.0, 3.0)
    // df: a→2, b→2, c→2; zz→0
    val a1 = micro(2, 2, 3, n, avgdl) // doc1 tf(a)=2
    val a2 = micro(1, 2, 2, n, avgdl) // doc2 tf(a)=1
    assert(out((1, 1L))._1 == a1)
    assert(out((1, 2L))._1 == a2)
    assert(!out.contains((1, 3L)), "doc3 has no 'a'")
    // query 2 adds only a zero-df term — identical scores to query 1
    assert(out((2, 1L))._1 == a1 && out((2, 2L))._1 == a2)
    assert(!out.contains((2, 3L)))
    // query 3: doc3 matches b AND c
    assert(out((3, 3L))._1 ==
      micro(1, 2, 4, n, avgdl) + micro(3, 2, 4, n, avgdl))
    assert(out((3, 1L))._1 == micro(1, 2, 3, n, avgdl))
    assert(out((3, 2L))._1 == micro(1, 2, 2, n, avgdl))
    spark.catalog.clearCache()
  }

  test("ranking is dense per query, ordered by (score desc, doc_id)") {
    spark.catalog.clearCache()
    // two docs with IDENTICAL content tie exactly — doc_id must break it
    val tied = Seq((1L, "a b"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val rows = Bm25.topK(tied, "doc_id", "text", Seq(1 -> Seq("a", "b")), 2)
      .orderBy("rank").collect()
    assert(rows.map(_.getInt(3)).toSeq == Seq(1, 2), "k=2 truncates")
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L),
      "equal scores break ties by doc_id")
    assert(rows(0).getLong(2) == rows(1).getLong(2))
    spark.catalog.clearCache()
  }

  test("topK releases the corpus-sized stats cache (one surviving relation)") {
    spark.catalog.clearCache()
    val result = Bm25.topK(docs, "doc_id", "text", Seq(1 -> Seq("a")), 5)
    result.collect()
    assert(!GraftBridge.cacheIsEmpty(spark),
      "the returned relation is the one documented surviving cache")
    result.unpersist(blocking = true)
    assert(GraftBridge.cacheIsEmpty(spark),
      "the per-doc stats relation must not outlive the call")
  }

  test("rejects malformed inputs loudly") {
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq(1 -> Seq("a")), 0)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq(1 -> Seq("A bad term")), 5)
    }
  }
}
