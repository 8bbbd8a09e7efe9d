package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.merge.MergeOps

/** S6–S11 — Delta MERGE emulation semantics (SURVEY.md §2.1). */
class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeKeyColumns skips ingestion-time columns (condition_builder golden)") {
    // reference TestCommonFunctions.py:13-19
    val keys = MergeOps.mergeKeyColumns(
      Seq("OrderId", "ItemId", "Quantity", "WindowId", "bronze_ingestion_time"))
    assert(keys == Seq("OrderId", "ItemId", "Quantity", "WindowId"))
  }

  test("insertIfAbsent on full tuple is idempotent re-ingestion") {
    val target = Seq((1, "a", "t0"), (2, "b", "t0")).toDF("id", "v", "bronze_ingestion_time")
    val updates = Seq((1, "a", "t1"), (2, "x", "t1"), (3, "c", "t1"))
      .toDF("id", "v", "bronze_ingestion_time")
    val keys = MergeOps.mergeKeyColumns(target.columns.toSeq)
    val merged = MergeOps.insertIfAbsent(target, updates, keys)
    // (1,a) matches → skipped; (2,x) and (3,c) are new tuples → inserted
    TestSpark.assertSameRows(merged.select("id", "v"), Seq(
      Seq(1, "a"), Seq(2, "b"), Seq(2, "x"), Seq(3, "c")))
    // re-running the same merge changes nothing
    val again = MergeOps.insertIfAbsent(merged, updates, keys)
    assert(again.count() == merged.count())
  }

  test("insertIfAbsent by business key") {
    val target = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val updates = Seq((2, "ignored"), (3, "c")).toDF("id", "v")
    val merged = MergeOps.insertIfAbsent(target, updates, Seq("id"))
    TestSpark.assertSameRows(merged, Seq(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  test("insertIfAbsent merges NULL keys null-safely (idempotent, unlike SQL MERGE)") {
    val target = Seq((Some(1), "a")).toDF("id", "v")
    val updates = Seq((Option.empty[Int], "n")).toDF("id", "v")
    val merged = MergeOps.insertIfAbsent(target, updates, Seq("id"))
    TestSpark.assertSameRows(merged, Seq(Seq(1, "a"), Seq(null, "n")))
    // re-running with the same NULL-keyed update must NOT insert again
    val again = MergeOps.insertIfAbsent(merged, updates, Seq("id"))
    assert(again.count() == 2)
  }

  test("upsert replaces NULL-keyed grains instead of duplicating them") {
    val target = Seq((Option.empty[String], 1L)).toDF("grain", "n")
    val updates = Seq((Option.empty[String], 9L)).toDF("grain", "n")
    val merged = MergeOps.upsert(target, updates, Seq("grain"))
    TestSpark.assertSameRows(merged, Seq(Seq(null, 9L)))
  }

  test("updateMatched rewrites only matched rows and set columns") {
    val target = Seq((1, "a", "s1"), (2, "b", "s2")).toDF("id", "v", "status")
    val updates = Seq((2, "B", "S2"), (9, "z", "zz")).toDF("id", "v", "status")
    val merged = MergeOps.updateMatched(target, updates, Seq("id"), Seq("status"))
    TestSpark.assertSameRows(merged, Seq(
      Seq(1, "a", "s1"), Seq(2, "b", "S2")))
  }

  test("updateMatched can set NULLs from the update side") {
    val target = Seq((1, "a")).toDF("id", "v")
    val updates = Seq((1, Option.empty[String])).toDF("id", "v")
    val merged = MergeOps.updateMatched(target, updates, Seq("id"), Seq("v"))
    TestSpark.assertSameRows(merged, Seq(Seq(1, null)))
  }

  test("upsert with deleteUnmatched drops vanished grains (full-recompute refresh)") {
    val target = Seq(("Phoenix", 1L), ("Tucson", 2L)).toDF("grain", "n")
    val updates = Seq(("Tucson", 3L), ("Mesa", 1L)).toDF("grain", "n")
    val merged = MergeOps.upsert(target, updates, Seq("grain"), deleteUnmatched = true)
    TestSpark.assertSameRows(merged, Seq(Seq("Tucson", 3L), Seq("Mesa", 1L)))
  }

  test("upsert replaces matched grains and inserts new ones (gold refresh)") {
    val target = Seq(("cityA", 10L), ("cityB", 20L)).toDF("grain", "n")
    val updates = Seq(("cityB", 25L), ("cityC", 5L)).toDF("grain", "n")
    val merged = MergeOps.upsert(target, updates, Seq("grain"))
    TestSpark.assertSameRows(merged, Seq(
      Seq("cityA", 10L), Seq("cityB", 25L), Seq("cityC", 5L)))
    // idempotent: same updates again → same table
    val again = MergeOps.upsert(merged, updates, Seq("grain"))
    assert(TestSpark.rows(again) == TestSpark.rows(merged))
  }

  private val d1 = java.sql.Date.valueOf("2020-01-01")
  private val d2 = java.sql.Date.valueOf("2021-01-01")
  private val d3 = java.sql.Date.valueOf("2022-01-01")
  private def eff(d: java.sql.Date) =
    org.apache.spark.sql.functions.lit(d.toString).cast("date")

  test("scdType2: changed attr closes the version, new keys insert, absent keys persist") {
    val init = MergeOps.scdType2Init(
      Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier"),
      Seq("id"), Seq("tier"), eff(d1))
    val merged = MergeOps.scdType2(init,
      Seq((1L, "platinum"), (3L, "bronze")).toDF("id", "tier"),
      Seq("id"), Seq("tier"), eff(d2))
    TestSpark.assertSameRows(merged, Seq(
      Seq(1L, "gold", d1, d2, false),     // closed
      Seq(1L, "platinum", d2, null, true), // reopened
      Seq(2L, "silver", d1, null, true),   // absent from update → untouched
      Seq(3L, "bronze", d2, null, true)))  // brand-new key
  }

  test("scdType2 with an unchanged snapshot is a no-op (no spurious versions)") {
    val snap = Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier")
    val init = MergeOps.scdType2Init(snap, Seq("id"), Seq("tier"), eff(d1))
    val merged = MergeOps.scdType2(init, snap, Seq("id"), Seq("tier"), eff(d2))
    assert(TestSpark.rows(merged) == TestSpark.rows(init))
  }

  test("scdType2 keeps closed history intact across further merges") {
    val init = MergeOps.scdType2Init(
      Seq((1L, "gold")).toDF("id", "tier"), Seq("id"), Seq("tier"), eff(d1))
    val v2 = MergeOps.scdType2(init,
      Seq((1L, "platinum")).toDF("id", "tier"), Seq("id"), Seq("tier"), eff(d2))
    // value flips BACK — must open a third version, not resurrect the first
    val v3 = MergeOps.scdType2(v2,
      Seq((1L, "gold")).toDF("id", "tier"), Seq("id"), Seq("tier"), eff(d3))
    TestSpark.assertSameRows(v3, Seq(
      Seq(1L, "gold", d1, d2, false),
      Seq(1L, "platinum", d2, d3, false),
      Seq(1L, "gold", d3, null, true)))
  }

  test("scdType2 compares keys and attrs null-safely") {
    val init = MergeOps.scdType2Init(
      Seq((Option.empty[Long], Option("x")), (Some(1L), Option.empty[String]))
        .toDF("id", "tier"),
      Seq("id"), Seq("tier"), eff(d1))
    // NULL key gets a changed attr → versioned, not duplicated; NULL attr
    // unchanged → untouched
    val merged = MergeOps.scdType2(init,
      Seq((Option.empty[Long], Option("y")), (Some(1L), Option.empty[String]))
        .toDF("id", "tier"),
      Seq("id"), Seq("tier"), eff(d2))
    TestSpark.assertSameRows(merged, Seq(
      Seq(null, "x", d1, d2, false),
      Seq(null, "y", d2, null, true),
      Seq(1L, null, d1, null, true)))
  }

  test("upsertWithFeed: the feed is EXACTLY the multiset delta — " +
      "identical-row replacements emit nothing, updates pair " +
      "delete+insert, deleteUnmatched emits the deletes; merged ≡ " +
      "upsert()") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, Option.empty[String].orNull, 30))
      .toDF("id", "v", "n")
    val updates = Seq((2L, "B", 20), (3L, Option.empty[String].orNull, 30),
      (4L, "d", 40)).toDF("id", "v", "n")
    for (delUnmatched <- Seq(false, true)) {
      val (merged, feed) = MergeOps.upsertWithFeed(target, updates,
        Seq("id"), delUnmatched)
      // merged matches the plain upsert exactly
      TestSpark.assertSameRows(merged,
        TestSpark.rows(MergeOps.upsert(target, updates, Seq("id"),
          delUnmatched)))
      // feed = the independently computed exact diff (exceptAll both ways)
      val expected = merged.exceptAll(target)
        .withColumn("_change_type", lit("insert"))
        .unionByName(target.exceptAll(merged)
          .withColumn("_change_type", lit("delete")))
      assert(feed.exceptAll(expected).isEmpty &&
        expected.exceptAll(feed).isEmpty,
        s"feed != exact diff (deleteUnmatched=$delUnmatched)")
      // the identical update row (id=3, null v) emits NO feed rows
      assert(feed.filter(col("id") === 3L).isEmpty,
        "identical replacement must not appear in the feed")
    }
  }

  test("upsertInto commits merge + feed atomically; the gold-IVM loop " +
      "consumes the feeds without ever diffing snapshots (verify mode ON)") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.gold.GoldMaintenance
    val root = java.nio.file.Files.createTempDirectory("graft_upsfeed")
    val tbl = new graft.io.ParquetTable(s"$root/t")
    val gold = new graft.io.ParquetTable(s"$root/g")
    spark.conf.set("graft.cdf.verifyDeclaredChanges", "true")
    try {
      MergeOps.upsertInto(spark, tbl,
        Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "grp", "cents"),
        Seq("id"))
      GoldMaintenance.advance(spark, tbl, gold, Seq("grp"), col("cents"))
      // v2: update id=2, insert id=3 — committed through the MERGE path
      MergeOps.upsertInto(spark, tbl,
        Seq((2L, "a", 25L), (3L, "b", 30L)).toDF("id", "grp", "cents"),
        Seq("id"))
      GoldMaintenance.advance(spark, tbl, gold, Seq("grp"), col("cents"))
      TestSpark.assertSameRows(
        gold.read(spark).select("grp", "n_rows", "value_sum"),
        Seq(Seq("a", 2L, 35L), Seq("b", 1L, 30L)))
      // the CDF the advance consumed was feed-served: scan set is only
      // _changes files (no snapshot read)
      val scanned = tbl.changesBetween(spark, 1, 2).inputFiles
      assert(scanned.nonEmpty && scanned.forall(_.contains("/_changes/")),
        s"merge-committed CDF must serve from feeds, scanned " +
          scanned.mkString(", "))
    } finally spark.conf.unset("graft.cdf.verifyDeclaredChanges")
  }

  test("upsertWithFeed refuses a target using the reserved scratch " +
      "names — silent overwrite would corrupt the classification") {
    import spark.implicits._
    val bad = Seq((1L, true)).toDF("id", "__m")
    val upd = Seq((1L, false)).toDF("id", "__m")
    val err = intercept[IllegalArgumentException] {
      MergeOps.upsertWithFeed(bad, upd, Seq("id"))
    }
    assert(err.getMessage.contains("reserved"))
    val bad2 = Seq((1L, "x")).toDF("id", "__u_id")
    assert(intercept[IllegalArgumentException] {
      MergeOps.upsertWithFeed(bad2, bad2, Seq("id"))
    }.getMessage.contains("reserved"))
  }

  test("upsertIntoPartitioned rewrites only touched partitions (untouched " +
      "files stay hard-linked), handles cross-partition moves and emptied " +
      "partitions, and writes the exact feed") {
    import org.apache.spark.sql.functions._
    import graft.io.ParquetTable
    val root = java.nio.file.Files.createTempDirectory("graft_cow").toString
    val tbl = new ParquetTable(s"$root/t", partitionColumns = Seq("bucket"))
    // buckets: a {1,2}, b {3}, c {4} — c will be left untouched, b will
    // be EMPTIED by a cross-partition move
    val v1 = Seq(
      (1L, "r1", "a"), (2L, "r2", "a"),
      (3L, "r3", "b"),
      (4L, "r4", "c")).toDF("id", "v", "bucket")
    MergeOps.upsertIntoPartitioned(spark, tbl, v1, Seq("id"))
    assert(tbl.version == 1)

    def inodesOf(bucket: String): Set[Object] = {
      val dir = java.nio.file.Paths.get(tbl.currentPath, s"bucket=$bucket")
      graft.io.FsUtil.listDir(dir)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => java.nio.file.Files.getAttribute(p, "unix:fileKey"))
        .toSet
    }
    val cBefore = inodesOf("c")

    // batch: update 1 in place, MOVE 3 from b to a (empties b), insert 5
    // into a new bucket d; bucket c untouched
    val batch = Seq(
      (1L, "r1x", "a"),
      (3L, "r3", "a"),
      (5L, "r5", "d")).toDF("id", "v", "bucket")
    MergeOps.upsertIntoPartitioned(spark, tbl, batch, Seq("id"))
    assert(tbl.version == 2)

    val got = tbl.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "r1x", "a"), (2L, "r2", "a"), (3L, "r3", "a"),
      (4L, "r4", "c"), (5L, "r5", "d")),
      s"merged state wrong: $got")
    // the emptied origin partition must be GONE, not stale
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tbl.currentPath, "bucket=b")),
      "a partition emptied by a cross-partition move must be dropped")
    // copy-on-write proof: the untouched partition's files are the SAME
    // inodes (hard links), not rewrites
    assert(inodesOf("c") == cBefore,
      "untouched partitions must ride along as hard links")

    // the written feed is the exact delta (CDF over the replace commit)
    val cdf = tbl.changesBetween(spark, 1, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(cdf == Set(
      (1L, "r1", "a", "delete"), (1L, "r1x", "a", "insert"),
      (3L, "r3", "b", "delete"), (3L, "r3", "a", "insert"),
      (5L, "r5", "d", "insert")),
      s"feed must be the exact delta: $cdf")
    // and the feed actually served the span (a record with feed files
    // exists for the replace commit — no snapshot diff required)
    assert(graft.io.VersionLog.readRecord(s"$root/t", 2)
      .exists(_.feed.nonEmpty),
      "the replace commit must carry its feed in the log record")

    // idempotent replay: same batch again → identical state, and the
    // untouched partition is STILL the original inodes
    MergeOps.upsertIntoPartitioned(spark, tbl, batch, Seq("id"))
    val again = tbl.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(again == got)
    assert(inodesOf("c") == cBefore)
  }
}
