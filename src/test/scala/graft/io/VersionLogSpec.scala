package graft.io

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The commit log + checkpoint manifest ([[VersionLog]]): manifest ≡
  * walk, checkpoint coverage, torn-file safety. In-package so the
  * private[io] resolution API is testable directly; the public-surface
  * laws (CDF off the log, pruned reads, feed-retaining vacuum) live in
  * TablesSpec.
  */
class VersionLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("manifest ≡ walk: resolveFiles matches the version-dir walk " +
      "across overwrite/append/replace chains, through a checkpoint") {
    val dir = Files.createTempDirectory("graft_vlog").toString
    val t = new ParquetTable(s"$dir/t", partitionColumns = Seq("bucket"))
    t.overwrite(Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "v", "bucket"))
    t.appendVersion(Seq((3L, "c", 2L)).toDF("id", "v", "bucket"))
    t.replacePartitions(Seq((9L, "B", 1L)).toDF("id", "v", "bucket"))
    def check(): Unit = {
      val v = t.version
      val resolved = VersionLog.resolveFiles(s"$dir/t", v)
        .map(_.map(_.rel).toSet)
      val walked = VersionLog.walkDataFiles(
        Paths.get(s"$dir/t", f"v_$v%05d")).map(_.rel).toSet
      assert(resolved.contains(walked),
        s"log resolution $resolved must equal the walk $walked at v$v")
    }
    check()
    // drive past the checkpoint cadence and re-verify — the live set
    // must now resolve THROUGH the checkpoint, not a full record chain
    (1 to VersionLog.CheckpointEvery).foreach { i =>
      t.appendVersion(Seq((100L + i, s"x$i", i.toLong % 3))
        .toDF("id", "v", "bucket"))
    }
    val ckpts = graft.io.FsUtil.listDir(Paths.get(s"$dir/t/_log"))
      .map(_.getFileName.toString).filter(_.startsWith("ckpt_"))
    assert(ckpts.nonEmpty, "a checkpoint must exist past the cadence")
    check()
  }

  test("resolveSteps classifies every step of a long mixed span; " +
      "stats ride the records") {
    import org.apache.spark.sql.functions.lit
    val dir = Files.createTempDirectory("graft_vlog").toString
    val t = new ParquetTable(s"$dir/m")
    val v1 = Seq((1L, "a")).toDF("id", "v")
    t.overwriteWithChanges(v1, v1.withColumn("_change_type", lit("insert")))
    t.appendVersion(Seq((2L, "b")).toDF("id", "v"))
    t.overwriteWithChanges(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      Seq((3L, "c", "insert")).toDF("id", "v", "_change_type"))
    val steps = VersionLog.resolveSteps(s"$dir/m", 1, 3)
    assert(steps.isDefined, "every step carries a record")
    val byV = steps.get.map(r => r.v -> r).toMap
    assert(byV(2).kind == "append" && byV(2).adds.nonEmpty &&
      byV(2).feed.isEmpty)
    assert(byV(3).kind == "overwrite" && byV(3).feed.nonEmpty)
    // commit-time footer stats: the append's added file knows its id
    // range and null profile without any footer re-open
    val st = byV(2).adds.head.stats
    assert(st.get("id").exists(s => s.tpe == "long" && s.min == "2" &&
      s.max == "2" && !s.hasNulls), s"id stats captured: $st")
    assert(st.get("v").exists(s => s.tpe == "string" && s.min == "b"),
      s"string stats captured: $st")
  }

  test("torn-log safety: a corrupted record file degrades resolution " +
      "to None while changesBetween stays exact off the walk fallback") {
    import org.apache.spark.sql.functions.lit
    val dir = Files.createTempDirectory("graft_vlog").toString
    val t = new ParquetTable(s"$dir/torn")
    val v1 = Seq((1L, "a")).toDF("id", "v")
    t.overwriteWithChanges(v1, v1.withColumn("_change_type", lit("insert")))
    t.overwriteWithChanges(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Seq((2L, "b", "insert")).toDF("id", "v", "_change_type"))
    // corrupt v2's record (torn write / bit rot)
    Files.writeString(Paths.get(s"$dir/torn/_log/r_00002.txt"),
      "v=2\nkind=")
    assert(VersionLog.resolveSteps(s"$dir/torn", 1, 2).isEmpty,
      "a malformed record must fail resolution, not parse partially")
    assert(VersionLog.resolveFiles(s"$dir/torn", 2).isEmpty)
    // the CDF answer is unchanged — served by the persisted-feed walk
    TestSpark.assertSameRows(t.changesBetween(spark, 1, 2),
      Seq(Seq(2L, "b", "insert")))
    // a corrupted checkpoint likewise degrades, never corrupts
    val t2 = new ParquetTable(s"$dir/ck")
    t2.overwrite(Seq((1L, "x")).toDF("id", "v"))
    (1 to VersionLog.CheckpointEvery).foreach { i =>
      t2.appendVersion(Seq((10L + i, s"y$i")).toDF("id", "v"))
    }
    val ck = graft.io.FsUtil.listDir(Paths.get(s"$dir/ck/_log"))
      .find(_.getFileName.toString.startsWith("ckpt_")).get
    Files.writeString(ck, "ckpt=999\nR1:v=garbage")
    // resolution survives through loose records
    val live = VersionLog.resolveFiles(s"$dir/ck", t2.version)
    val walked = VersionLog.walkDataFiles(
      Paths.get(s"$dir/ck", f"v_${t2.version}%05d")).map(_.rel).toSet
    assert(live.map(_.map(_.rel).toSet).contains(walked))
  }

  test("record compaction: loose records below the second-newest " +
      "checkpoint are reclaimed and resolution stays ≡ walk across " +
      "the compaction horizon, including time travel into it") {
    import org.apache.spark.sql.functions.lit
    val dir = Files.createTempDirectory("graft_vlog").toString
    val p = s"$dir/cmp"
    val t = new ParquetTable(p)
    val v1 = Seq((1L, "a")).toDF("id", "v")
    t.overwriteWithChanges(v1, v1.withColumn("_change_type", lit("insert")))
    // drive past TWO checkpoint cadences so compaction fires
    val target = 2 * VersionLog.CheckpointEvery + 3
    (2 to target).foreach { i =>
      t.appendVersion(Seq((i.toLong, s"x$i")).toDF("id", "v"))
    }
    val names = FsUtil.listDir(Paths.get(s"$p/_log"))
      .map(_.getFileName.toString)
    val ckVs = names.filter(_.startsWith("ckpt_"))
      .map(_.stripPrefix("ckpt_").stripSuffix(".txt").toInt).sorted
    assert(ckVs.size >= 2, s"need two checkpoints, got $ckVs")
    val horizon = ckVs(ckVs.size - 2)
    val looseVs = names.filter(_.startsWith("r_"))
      .map(_.stripPrefix("r_").stripSuffix(".txt").toInt)
    assert(looseVs.forall(_ > horizon),
      s"records ≤ ckpt $horizon must be reclaimed, found " +
        s"${looseVs.filter(_ <= horizon).sorted}")
    assert(looseVs.nonEmpty, "post-horizon records are NOT reclaimed")

    // live resolution ≡ walk
    def filesEqWalk(v: Int): Unit = {
      val resolved = VersionLog.resolveFiles(p, v).map(_.map(_.rel).toSet)
      val walked = VersionLog.walkDataFiles(
        Paths.get(p, f"v_$v%05d")).map(_.rel).toSet
      assert(resolved.contains(walked),
        s"v$v: log $resolved must equal walk $walked")
    }
    filesEqWalk(t.version)
    // time travel INTO the compacted interval (no loose record exists
    // there any more — recordAt must serve it from the covering
    // checkpoint) and ONTO a checkpoint version itself
    filesEqWalk(horizon - 3)
    filesEqWalk(horizon)
    // a step span CROSSING the horizon fully classifies, and the CDF
    // built on it stays exact: inserts of every appended id
    val steps = VersionLog.resolveSteps(p, 1, target)
    assert(steps.isDefined && steps.get.size == target - 1,
      "span across the compaction horizon must classify every step")
    assert(steps.get.forall(_.kind == "append"))
    val cdf = t.changesBetween(spark, 1, target)
    assert(cdf.count() == (target - 1).toLong)
    assert(cdf.filter(org.apache.spark.sql.functions
      .col("_change_type") =!= "insert").count() == 0L)
  }

  test("checkpoint retirement: checkpoints below the retention horizon " +
      "retire, resolution ≡ walk across the retired interval, near-head " +
      "stays log-served, timestamp travel below the horizon refuses") {
    val prevRetain = sys.props.get("graft.log.retainCommits")
    try {
      sys.props("graft.log.retainCommits") = "10"
      val dir = Files.createTempDirectory("graft_vlog").toString
      val p = s"$dir/ret"
      val t = new ParquetTable(p)
      t.overwrite(Seq((1L, "x1")).toDF("id", "v"))
      val target = 3 * VersionLog.CheckpointEvery // 48: ckpts 16, 32, 48
      (2 to target).foreach { i =>
        t.appendVersion(Seq((i.toLong, s"x$i")).toDF("id", "v"))
      }
      // horizon = 48 - 10 = 38: ckpt 16 is retired, 32+48 kept (newest
      // two are always exempt)
      val ckVs = FsUtil.listDir(Paths.get(s"$p/_log"))
        .map(_.getFileName.toString).filter(_.startsWith("ckpt_"))
        .map(_.stripPrefix("ckpt_").stripSuffix(".txt").toInt).sorted
      assert(ckVs == List(2 * VersionLog.CheckpointEvery, target),
        s"expected ckpts {32, 48}, got $ckVs")

      // the retired interval's records are gone from the log: log
      // resolution fails CLEANLY (None, not a wrong answer)...
      assert(VersionLog.resolveFiles(p, 10).isEmpty,
        "a version inside the retired interval must not log-resolve")
      // ...and every public surface falls back to the walk with exact
      // results: time travel INTO the retired interval
      assert(t.readVersion(spark, 10).collect().map(_.getLong(0)).toSet ==
        (1L to 10L).toSet)
      // CDF entirely within and across the retired interval
      val inRet = t.changesBetween(spark, 2, 12)
      assert(inRet.count() == 10L && inRet.filter(
        org.apache.spark.sql.functions.col("_change_type") =!= "insert")
        .count() == 0L)
      val across = t.changesBetween(spark, 1, target)
      assert(across.count() == (target - 1).toLong)
      // near-head resolution still rides the log (retained checkpoints)
      assert(VersionLog.resolveFiles(p, target).nonEmpty,
        "the live version must still log-resolve after retirement")
      assert(VersionLog.resolveSteps(p, target - 5, target).nonEmpty,
        "near-head spans must still log-resolve after retirement")
      // timestamp → version below the horizon refuses (the Delta
      // log-retention bound on TIMESTAMP AS OF), pointing at
      // version-addressed travel instead of guessing
      val tsOld = intercept[IllegalArgumentException] {
        t.versionAtTimestamp(
          VersionLog.timestampOf(p, target).get - 1000000L)
      }
      assert(tsOld.getMessage.contains("version"))
      // a timestamp within the retained stamped range still resolves
      assert(t.versionAtTimestamp(
        VersionLog.timestampOf(p, target).get) == target)
    } finally {
      prevRetain match {
        case Some(v) => sys.props("graft.log.retainCommits") = v
        case None => sys.props.remove("graft.log.retainCommits")
      }
    }
  }

  test("hybrid CDF across the retirement horizon: the log-covered " +
      "suffix is served from records, only the retired prefix walks — " +
      "hybrid ≡ full walk ≡ snapshot patch law on a mixed " +
      "feed/append span") {
    import org.apache.spark.sql.functions.col
    val prevRetain = sys.props.get("graft.log.retainCommits")
    try {
      sys.props("graft.log.retainCommits") = "10"
      val dir = Files.createTempDirectory("graft_vlog").toString
      val p = s"$dir/hyb"
      val t = new ParquetTable(p)
      t.overwrite((1L to 50L).map(i => (i, i * 10)).toDF("id", "v"))
      val target = 3 * VersionLog.CheckpointEvery // 48: ckpt 16 retires
      (2 to target).foreach { i =>
        if (i % 5 == 0) // feed-carrying modify commit (delete+insert)
          graft.merge.MergeOps.upsertInto(spark, t,
            Seq((i.toLong, i * 1000L)).toDF("id", "v"), Seq("id"))
        else t.appendVersion(Seq((1000L + i, i.toLong)).toDF("id", "v"))
      }
      val fromV = 3
      // the hybrid split point must fall strictly INSIDE the span:
      // steps ≤ 16 are retired (ckpt 16 gone, records compacted), the
      // suffix (16, 48] is fully log-served
      val h = VersionLog.resolvableSuffixStart(p, fromV, target)
      assert(h == 2 * VersionLog.CheckpointEvery ||
        (h > fromV && h < target),
        s"split point $h must be inside ($fromV, $target)")
      assert(VersionLog.resolveSteps(p, fromV, target).isEmpty,
        "the full span must NOT log-resolve (else the hybrid path is " +
          "not what this test exercises)")
      assert(VersionLog.resolveSteps(p, h, target).nonEmpty,
        "the suffix must be fully log-served")

      def multiset(rows: Seq[org.apache.spark.sql.Row]): Map[Seq[Any], Long] =
        rows.map(_.toSeq).groupBy(identity).view.mapValues(_.size.toLong)
          .toMap
      val cdf = t.changesBetween(spark, fromV, target).collect().toSeq
      // netting law: no self-cancelling pairs survive
      val byTuple = cdf.groupBy(_.toSeq.dropRight(1))
      assert(byTuple.values.forall(rs =>
          rs.map(_.getString(rs.head.length - 1)).distinct.size == 1),
        "a netted span delta must never emit insert AND delete of the " +
          "same tuple")
      // patch law: from-snapshot + inserts − deletes == to-snapshot
      val fromM = multiset(t.readVersion(spark, fromV).collect().toSeq)
      val toM = multiset(t.readVersion(spark, target).collect().toSeq)
      val patched = cdf.foldLeft(fromM) { (m, r) =>
        val key = r.toSeq.dropRight(1)
        val d = if (r.getString(r.length - 1) == "insert") 1L else -1L
        val n = m.getOrElse(key, 0L) + d
        if (n == 0L) m - key else m.updated(key, n)
      }
      assert(patched == toM,
        "applying the hybrid span delta to the FROM snapshot must " +
          "reproduce the TO snapshot exactly (multiset semantics)")

      // hybrid ≡ walk: rename _log away (the ProfileLog methodology) so
      // every step classifies through the walk paths, and compare
      val logDir = Paths.get(p, "_log")
      val off = Paths.get(p, "_log_off")
      Files.move(logDir, off)
      try {
        val walked = t.changesBetween(spark, fromV, target).collect().toSeq
        assert(multiset(cdf.map(r => org.apache.spark.sql.Row.fromSeq(
            r.toSeq))) == multiset(walked),
          "hybrid resolution must equal the walk-based classification " +
            "row-for-row (multiset)")
      } finally Files.move(off, logDir)
    } finally {
      prevRetain match {
        case Some(v) => sys.props("graft.log.retainCommits") = v
        case None => sys.props.remove("graft.log.retainCommits")
      }
    }
  }
}
