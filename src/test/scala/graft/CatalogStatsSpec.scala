package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, ParquetTable}

/** Commit-metadata statistics on catalog registration
  * ([[org.apache.spark.sql.GraftCatalogStats]]): a registered table's
  * logical-plan `sizeInBytes` must be the live version's REAL data
  * footprint — a partitioned catalog table otherwise resolves through a
  * lazy CatalogFileIndex and reports `spark.sql.defaultSizeInBytes`
  * (Long.MaxValue), poisoning every pre-AQE join/broadcast estimate
  * above it (the PLANAUDIT `unreliable_stats` taint on the SQL-path
  * queries).
  */
class CatalogStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataBytes(verDir: String): Long = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(verDir)
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala.filter { p =>
      java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !root.relativize(p).toString.startsWith("_")
    }.map(java.nio.file.Files.size(_)).sum
    finally walk.close()
  }

  private def planSize(sql: String): BigInt =
    spark.sql(sql).queryExecution.optimizedPlan.stats.sizeInBytes

  test("a registered PARTITIONED table's plan size is the live " +
      "version's exact data bytes, never the Long.MaxValue default; " +
      "re-registration after a commit refreshes it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catstats")
    val t = new ParquetTable(s"$dir/t", partitionColumns = Seq("status"))
    t.overwrite(Seq((1L, "O", 10L), (2L, "F", 20L), (3L, "O", 30L))
      .toDF("id", "status", "cents"))
    Catalog.ensureDatabase(spark, "graft_catstats")
    Catalog.registerTable(spark, "graft_catstats", "t", t)

    val expected = dataBytes(t.currentPath)
    assert(expected > 0)
    val got = planSize("SELECT * FROM graft_catstats.t")
    assert(got == BigInt(expected),
      s"catalog-path plan size $got != live data bytes $expected")

    // a commit + re-registration repoints the stats at the new version
    t.appendVersion(Seq((4L, "P", 40L)).toDF("id", "status", "cents"))
    Catalog.registerTable(spark, "graft_catstats", "t", t)
    val expected2 = dataBytes(t.currentPath)
    assert(expected2 > expected, "append must grow the data footprint")
    assert(planSize("SELECT * FROM graft_catstats.t") == BigInt(expected2))
  }

  test("an unpartitioned registered table carries real stats too, and " +
      "the feed dir is excluded from the footprint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_catstats")
    val t = new ParquetTable(s"$dir/u")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // a feed-carrying commit: the _changes parquet must NOT count
    val upd = Seq((1L, "a2"), (2L, "b")).toDF("id", "v")
    val feed = Seq((1L, "a", "delete"), (1L, "a2", "insert"))
      .toDF("id", "v", "_change_type")
    t.overwriteWithChanges(upd, feed)
    Catalog.ensureDatabase(spark, "graft_catstats")
    Catalog.registerTable(spark, "graft_catstats", "u", t)
    val expected = dataBytes(t.currentPath)
    assert(planSize("SELECT * FROM graft_catstats.u") == BigInt(expected))
  }
}
