package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, ParquetTable, VersionLog}

/** SQL UPDATE / DELETE FROM / INSERT INTO on registered tables
  * ([[org.apache.spark.sql.GraftSqlDml]]): versioned commits with exact
  * feeds, copy-on-write on partitioned layouts, semantic no-ops with
  * zero version churn, and the INSERT routing that keeps raw files out
  * of live version dirs.
  */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String, df: DataFrame,
      parts: Seq[String] = Nil): ParquetTable = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqldml")
    val t = new ParquetTable(s"$dir/$name", partitionColumns = parts)
    t.overwrite(df)
    Catalog.ensureDatabase(spark, "graft_dml")
    Catalog.registerTable(spark, "graft_dml", name, t)
    t
  }

  private def rows(name: String): Set[(Long, String, Option[Long])] =
    spark.sql(s"SELECT id, status, cents FROM graft_dml.`$name`")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("UPDATE commits copy-on-write with an EXACT feed; a SET that " +
      "rewrites values onto themselves is a no-op with zero churn; a " +
      "SET on the partition column MOVES rows and drops emptied leaves") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L),
      (4L, "P", 40L)).toDF("id", "status", "cents")
    val t = freshTable("t_upd", seed, parts = Seq("status"))
    val out = spark.sql(
      "UPDATE graft_dml.t_upd SET cents = cents + 5 WHERE status = 'O'")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(rows("t_upd") == Set((1L, "O", Some(15L)), (2L, "O", Some(25L)),
      (3L, "F", Some(30L)), (4L, "P", Some(40L))))
    val rec = VersionLog.readRecord(t.path, 2)
    assert(rec.exists(r => r.kind == "replace" && r.feed.nonEmpty),
      s"UPDATE must commit a feed-carrying COW replace, got " +
        s"${rec.map(_.kind)}")
    // the feed is exactly the changed rows (delete old + insert new)
    val cdf = t.changesBetween(spark, 1, 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cents"),
        r.getAs[String]("_change_type"))).toSet
    assert(cdf == Set((1L, 10L, "delete"), (1L, 15L, "insert"),
      (2L, 20L, "delete"), (2L, 25L, "insert")))

    // self-assignment: values unchanged -> NO commit
    spark.sql("UPDATE graft_dml.t_upd SET cents = cents WHERE id = 3")
      .collect()
    assert(t.version == 2,
      "an UPDATE whose assigned values do not change must commit nothing")
    // NULL WHERE rows are unmatched (three-valued logic)
    spark.sql(
      "UPDATE graft_dml.t_upd SET cents = 0 WHERE cents / 0 > 1 AND false")
      .collect()
    assert(t.version == 2)

    // partition-column SET: rows MOVE, the emptied origin leaf drops
    spark.sql("UPDATE graft_dml.t_upd SET status = 'X' WHERE status = 'P'")
      .collect()
    assert(rows("t_upd").contains((4L, "X", Some(40L))))
    val live = VersionLog.resolveFiles(t.path, t.version).get.map(_.rel)
    assert(!live.exists(_.startsWith("status=P/")),
      "the emptied origin partition must not survive the move")
  }

  test("DELETE FROM commits COW with a delete feed; untouched " +
      "partitions ride as hard links; nothing-matched is zero churn; " +
      "a delete touching every partition (truncate) stays readable") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L),
      (4L, "P", 40L)).toDF("id", "status", "cents")
    val t = freshTable("t_del", seed, parts = Seq("status"))
    def inodes(ver: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(ver)
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString ->
            java.nio.file.Files.getAttribute(p, "unix:ino")
              .asInstanceOf[Long]).toMap
      } finally walk.close()
    }
    val v1 = inodes(t.currentPath)
    spark.sql("DELETE FROM graft_dml.t_del WHERE id = 1").collect()
    assert(rows("t_del") == Set((2L, "O", Some(20L)), (3L, "F", Some(30L)),
      (4L, "P", Some(40L))))
    val v2 = inodes(t.currentPath)
    v1.filter(!_._1.startsWith("status=O/")).foreach { case (rel, ino) =>
      assert(v2.get(rel).contains(ino),
        s"untouched partition file $rel must ride as a hard link")
    }
    val cdf = t.changesBetween(spark, 1, 2).collect()
    assert(cdf.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("_change_type"))).toSet == Set((1L, "delete")))

    spark.sql("DELETE FROM graft_dml.t_del WHERE id = 999").collect()
    assert(t.version == 2, "a DELETE matching nothing must commit nothing")

    // truncate: every live partition touched -> full-snapshot commit,
    // table stays readable (and the feed carries every row)
    spark.sql("DELETE FROM graft_dml.t_del").collect()
    assert(t.version == 3)
    assert(spark.sql("SELECT * FROM graft_dml.t_del").count() == 0L)
    assert(t.changesBetween(spark, 2, 3).count() == 3L)
  }

  test("maintenance verbs: OPTIMIZE compacts as a normal commit, " +
      "VACUUM reclaims non-live dirs while DESCRIBE HISTORY (the _log) " +
      "survives, RETAIN and unregistered targets refuse/fall through") {
    val seed = (1L to 100L).map(i => (i, if (i % 2 == 0) "O" else "F",
      i * 10)).toDF("id", "status", "cents")
    var now = 1000L
    // the SEED commit must carry the injected stamp too — commit stamps
    // are monotonic-adjusted (max(clock, prev+1)), so a real-clock v1
    // would drag every later injected stamp up to prev+1
    val t = graft.io.VersionLog.withClock(() => now) {
      freshTable("t_maint", seed)
    }
    graft.io.VersionLog.withClock(() => now) {
      now = 2000L
      t.appendVersion(Seq((101L, "P", 1010L)).toDF("id", "status", "cents"))
      now = 3000L
      val r = spark.sql(
        "OPTIMIZE graft_dml.t_maint ZORDER BY (id, cents)").collect()
      assert(r.map(_.getLong(0)).toSeq == Seq(3L))
    }
    assert(graft.io.VersionLog.readRecord(t.path, 3)
      .exists(_.kind == "overwrite"),
      "OPTIMIZE must commit a normal overwrite")
    assert(spark.sql("SELECT sum(cents) FROM graft_dml.t_maint")
      .head.getLong(0) == seed.agg(sum(col("cents"))).head.getLong(0) + 1010L,
      "compaction must preserve every row")
    spark.sql("VACUUM graft_dml.t_maint").collect()
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.path, "v_00001")),
      "VACUUM must reclaim the non-live version dir")
    val hist = spark.sql("DESCRIBE HISTORY graft_dml.t_maint")
      .collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(hist == List((1, "overwrite"), (2, "append"), (3, "overwrite")),
      s"history must survive vacuum, got $hist")
    // history timestamps are the injected monotonic stamps for v2/v3
    val ts = spark.sql("DESCRIBE HISTORY graft_dml.t_maint")
      .collect().map(r => r.getAs[java.sql.Timestamp]("timestamp").getTime)
    assert(ts.toList.drop(1) == List(2000L, 3000L))
    val eRet = intercept[UnsupportedOperationException] {
      spark.sql("VACUUM graft_dml.t_maint RETAIN 168 HOURS").collect()
    }
    assert(eRet.getMessage.contains("vacuumKeepingFeeds"))
    // unregistered table: falls through to the stock parse error
    val eUnreg = intercept[Exception] {
      spark.sql("VACUUM some_unregistered_table").collect()
    }
    assert(eUnreg.isInstanceOf[
      org.apache.spark.sql.catalyst.parser.ParseException])
  }

  test("INSERT INTO appends through the versioned commit (no raw files " +
      "in version dirs); (cols) fills unassigned with NULL; BY NAME " +
      "reorders; OVERWRITE replaces the snapshot; refusals are loud") {
    val seed = Seq((1L, "O", 10L)).toDF("id", "status", "cents")
    val t = freshTable("t_ins", seed)
    // positional
    spark.sql(
      "INSERT INTO graft_dml.t_ins SELECT 2L, 'F', 20L").collect()
    assert(t.version == 2, "INSERT must commit a version, not raw files")
    assert(VersionLog.readRecord(t.path, 2).exists(_.kind == "append"))
    // (cols) subset with NULL fill
    spark.sql(
      "INSERT INTO graft_dml.t_ins (id, status) SELECT 3L, 'N'").collect()
    // BY NAME, shuffled order
    spark.sql(
      "INSERT INTO graft_dml.t_ins BY NAME " +
        "SELECT 'P' AS status, 44L AS cents, 4L AS id").collect()
    assert(rows("t_ins") == Set((1L, "O", Some(10L)), (2L, "F", Some(20L)),
      (3L, "N", None), (4L, "P", Some(44L))))
    // the CDF of an append step is the inserted rows
    val cdf = t.changesBetween(spark, 1, 2).collect()
    assert(cdf.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("_change_type"))).toSet == Set((2L, "insert")))
    // OVERWRITE replaces the snapshot
    spark.sql(
      "INSERT OVERWRITE graft_dml.t_ins SELECT 9L, 'Z', 90L").collect()
    assert(rows("t_ins") == Set((9L, "Z", Some(90L))))
    // arity mismatch refuses loudly
    val eAr = intercept[Exception] {
      spark.sql("INSERT INTO graft_dml.t_ins SELECT 1L, 'x'").collect()
    }
    assert(eAr.getMessage.contains("arity"),
      s"got: ${eAr.getMessage.take(200)}")
    // a DUPLICATED name in the column list refuses (it would pass the
    // arity check but silently drop a query column in the byPos map)
    val eDup = intercept[Exception] {
      spark.sql("INSERT INTO graft_dml.t_ins (id, id) SELECT 5L, 6L")
        .collect()
    }
    assert(eDup.getMessage.contains("duplicate column"),
      s"got: ${eDup.getMessage.take(200)}")
  }

  test("maintenance-verb identifiers tokenize backtick-quoted segments: " +
      "a registered name CONTAINING a dot resolves instead of falling " +
      "through to the delegate's parse error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqldml")
    val t = new ParquetTable(s"$dir/dotted",
      partitionColumns = Nil)
    t.overwrite(Seq((1L, "O", 10L)).toDF("id", "status", "cents"))
    t.appendVersion(Seq((2L, "F", 20L)).toDF("id", "status", "cents"))
    // registry-only registration (the spark catalog refuses dots in
    // table names; the maintenance verbs resolve through the graft
    // registry, which is exactly what the tokenizer feeds)
    org.apache.spark.sql.GraftMergeInto.register(spark, "graft_dml",
      "a.b", t)
    val hist = spark.sql("DESCRIBE HISTORY graft_dml.`a.b`").collect()
    assert(hist.length == 2,
      s"DESCRIBE HISTORY on the dotted name must serve both commits, " +
        s"got ${hist.length}")
    val v = spark.sql("VACUUM graft_dml.`a.b`").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(2L),
      "VACUUM on the dotted name must run on the registered table")
  }
}
