package graft

import org.apache.spark.sql.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.Dedup

/** Cache-ownership discipline of the Dedup entry points (round-8 verdict
  * item 1): each pair-finding operator materializes its result, releases
  * its corpus-sized intermediates before returning, and leaves exactly
  * ONE cached relation — the returned pair frame — which the caller
  * releases. An embedding application can therefore invoke these in a
  * loop without accreting corpus-sized cache entries.
  */
class DedupCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "entirely different content with no overlap at all"),
    (4L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  /** Run `op`, drain its result, release the one documented surviving
    * relation, and assert the cache manager holds nothing else.
    */
  private def assertOneSurvivingCache(
      op: => org.apache.spark.sql.DataFrame): Unit = {
    spark.catalog.clearCache() // isolate from earlier suites in this JVM
    val result = op
    result.collect()
    assert(!GraftBridge.cacheIsEmpty(spark),
      "the returned relation is the one documented surviving cache")
    result.unpersist(blocking = true)
    assert(GraftBridge.cacheIsEmpty(spark),
      "no corpus-sized intermediate may outlive the call once the " +
        "returned relation is released")
  }

  test("minhashNearDuplicates releases its shingle-set cache") {
    assertOneSurvivingCache(
      Dedup.minhashNearDuplicates(docs, "doc_id", "text"))
  }

  test("crossNearDuplicates releases both corpora's shingle-set caches") {
    assertOneSurvivingCache(
      Dedup.crossNearDuplicates(docs, docs.limit(2), "doc_id", "text"))
  }

  test("simhashNearDuplicates releases its signature cache") {
    assertOneSurvivingCache(
      Dedup.simhashNearDuplicates(docs, "doc_id", "text"))
  }

  test("incrementalNearDuplicates releases the batch's shingle-set cache") {
    val index = Dedup.buildNearDupIndex(docs.limit(2), "doc_id", "text")
    assertOneSurvivingCache(
      Dedup.incrementalNearDuplicates(index,
        Seq((9L, "the quick brown fox jumps over the lazy dog"))
          .toDF("doc_id", "text"),
        "doc_id", "text"))
  }

  test("results are unchanged by the materialize-and-release rework " +
      "(q24-shape sanity: the known near-dup pairs still surface)") {
    spark.catalog.clearCache()
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact duplicates must pair")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "one-word-off near duplicates must pair")
    spark.catalog.clearCache()
  }
}
