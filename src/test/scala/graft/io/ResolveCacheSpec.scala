package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[ParquetTable.resolveCache]] eviction laws: a bounded LRU, not the
  * former clear-on-overflow — hot serving tables stay warm while cold
  * entries rotate out, and eviction is never a correctness event (a
  * miss just re-resolves from the commit log).
  */
class ResolveCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("overflow evicts the eldest entry only; hot entries stay warm") {
    val cache = ParquetTable.resolveCache
    val before = new java.util.HashMap(cache) // restore after the test
    try {
      cache.clear()
      val hot = "/__lru_spec__/hot@1"
      cache.put(hot, None)
      (1 to 520).foreach { i =>
        cache.put(s"/__lru_spec__/cold$i@1", None)
        cache.get(hot) // keep the hot entry recently used
      }
      assert(cache.size() <= 513,
        s"cache must stay bounded, size ${cache.size()}")
      assert(cache.containsKey(hot),
        "a hot entry must survive overflow (LRU, not clear-on-overflow)")
      assert(!cache.containsKey("/__lru_spec__/cold1@1"),
        "the eldest untouched entry must be the one evicted")
    } finally {
      cache.clear(); cache.putAll(before)
    }
  }

  test("eviction is never a correctness event: a read after full " +
      "eviction re-resolves from the commit log") {
    val cache = ParquetTable.resolveCache
    val before = new java.util.HashMap(cache)
    try {
      val dir = Files.createTempDirectory("graft_lru").toString
      val t = new ParquetTable(s"$dir/t")
      import spark.implicits._
      t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val resolved = VersionLog.resolveFiles(s"$dir/t", 1)
      assert(resolved.nonEmpty)
      cache.clear()
      assert(t.read(spark).count() == 2L,
        "a read after full eviction must re-resolve and serve")
      assert(ParquetTable.resolveFilesCached(s"$dir/t", 1) == resolved,
        "re-resolution must reproduce the evicted entry")
    } finally {
      cache.clear(); cache.putAll(before)
    }
  }
}
