package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, ParquetTable}

/** SQL `MERGE INTO` bridge (round-15 verdict item 5): statements parsed
  * by the stock grammar, rewritten for graft-registered targets, and
  * executed through the [[graft.merge.MergeOps]] machinery — plus the
  * refusal surface (unsupported clause shapes name themselves loudly)
  * and the pass-through contract (unregistered targets keep stock
  * Spark's behavior).
  */
class SqlMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String, df: DataFrame,
      parts: Seq[String] = Nil): ParquetTable = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlmerge")
    val t = new ParquetTable(s"$dir/$name", partitionColumns = parts)
    t.overwrite(df)
    Catalog.ensureDatabase(spark, "graft_ms")
    Catalog.registerTable(spark, "graft_ms", name, t)
    t
  }

  private def rows(name: String): Set[(Long, String, Long)] =
    spark.sql(s"SELECT id, status, cents FROM graft_ms.`$name`")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("UPDATE SET * + INSERT * == keyed upsert; the catalog read is " +
      "repointed; bare (current-database) names resolve") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents")
    freshTable("t_upsert", seed)
    Seq((2L, "F", 25L), (4L, "P", 40L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_updates")
    spark.catalog.setCurrentDatabase("graft_ms")
    try {
      val out = spark.sql(
        """MERGE INTO t_upsert t USING ms_updates s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(2L),
        "MERGE must report the committed version")
    } finally spark.catalog.setCurrentDatabase("default")
    assert(rows("t_upsert") == Set((1L, "O", 10L), (2L, "F", 25L),
      (3L, "F", 30L), (4L, "P", 40L)))
  }

  test("WHEN NOT MATCHED THEN INSERT * alone == insert-if-absent " +
      "(matched rows untouched)") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L)).toDF("id", "status", "cents")
    freshTable("t_ins", seed)
    Seq((2L, "X", 99L), (5L, "P", 50L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_ins")
    spark.sql(
      """MERGE INTO graft_ms.t_ins t USING ms_ins s ON t.id = s.id
         WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(rows("t_ins") == Set((1L, "O", 10L), (2L, "O", 20L),
      (5L, "P", 50L)),
      "matched rows must pass through unmodified; only absent keys insert")
  }

  test("WHEN MATCHED THEN DELETE alone on a PARTITIONED table commits a " +
      "feed-carrying copy-on-write replace") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L),
      (4L, "P", 40L)).toDF("id", "status", "cents")
    val t = freshTable("t_del", seed, parts = Seq("status"))
    Seq(Tuple1(2L), Tuple1(99L)).toDF("id")
      .createOrReplaceTempView("ms_dels")
    spark.sql(
      """MERGE INTO graft_ms.t_del t USING ms_dels s ON t.id = s.id
         WHEN MATCHED THEN DELETE""").collect()
    assert(rows("t_del") == Set((1L, "O", 10L), (3L, "F", 30L),
      (4L, "P", 40L)))
    val rec = graft.io.VersionLog.readRecord(t.path, 2)
    assert(rec.exists(r => r.kind == "replace" && r.feed.nonEmpty),
      s"SQL DELETE on a partitioned target must commit COW, " +
        s"got ${rec.map(_.kind)}")
    // the F and P leaves were untouched — their files must be LINKS
    val cdf = t.changesBetween(spark, 1, 2).collect()
    assert(cdf.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("_change_type"))).toSet == Set((2L, "delete")),
      "the delete feed must be exactly the removed row")
  }

  test("NOT MATCHED BY SOURCE DELETE == full-sync upsert " +
      "(absent grains drop)") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents")
    freshTable("t_sync", seed)
    Seq((2L, "F", 25L), (9L, "P", 90L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_sync")
    spark.sql(
      """MERGE INTO graft_ms.t_sync t USING ms_sync s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *
         WHEN NOT MATCHED BY SOURCE THEN DELETE""").collect()
    assert(rows("t_sync") == Set((2L, "F", 25L), (9L, "P", 90L)))
  }

  test("column-level UPDATE SET c = expr evaluates on the target-source " +
      "join; INSERT (cols) VALUES fills unassigned columns with typed " +
      "NULLs; mixed star/assignment shapes compose") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents")
    freshTable("t_set", seed)
    Seq((2L, "F", 5L), (7L, "P", 70L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_set")
    spark.sql(
      """MERGE INTO graft_ms.t_set t USING ms_set s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET cents = s.cents + t.cents
         WHEN NOT MATCHED THEN INSERT (id, status) VALUES (s.id, 'N')""")
      .collect()
    val got = spark.sql(
      "SELECT id, status, cents FROM graft_ms.t_set").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set((1L, "O", Some(10L)), (2L, "O", Some(25L)),
      (3L, "F", Some(30L)), (7L, "N", None)),
      "SET must see both sides (s.cents + t.cents), unmatched target " +
        "rows pass through, INSERT fills cents with NULL")
    // mixed: star update + assignment insert
    Seq((3L, "P", 99L), (8L, "X", 80L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_set2")
    spark.sql(
      """MERGE INTO graft_ms.t_set t USING ms_set2 s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT (id, status, cents)
           VALUES (s.id, s.status, s.cents * 2)""").collect()
    val got2 = spark.sql(
      "SELECT id, status, cents FROM graft_ms.t_set WHERE id IN (3, 8)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got2 == Set((3L, "P", 99L), (8L, "X", 160L)))
    // assignment-only UPDATE (no insert clause): unmatched source rows
    // contribute nothing
    Seq((1L, "Z", 1000L), (99L, "Z", 1L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_set3")
    spark.sql(
      """MERGE INTO graft_ms.t_set t USING ms_set3 s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET status = s.status""").collect()
    val got3 = spark.sql("SELECT id, status, cents FROM graft_ms.t_set")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got3.contains((1L, "Z", Some(10L))),
      "assignment update must replace ONLY the SET column")
    assert(!got3.exists(_._1 == 99L),
      "an UPDATE-only merge must not insert unmatched source rows")
    // duplicate assignment targets refuse loudly
    val eDup = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_ms.t_set t USING ms_set3 s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET cents = s.cents, cents = 0""")
        .collect()
    }
    assert(eDup.getMessage.contains("duplicate assignment") ||
      eDup.getMessage.toLowerCase.contains("duplicate"),
      s"got: ${eDup.getMessage.take(200)}")
  }

  test("VERSION AS OF / TIMESTAMP AS OF table suffixes resolve on " +
      "registered tables — Delta's SQL time-travel syntax verbatim") {
    var now = 1000L
    val t = graft.io.VersionLog.withClock(() => now) {
      val t0 = freshTable("t_tt",
        Seq((1L, "O", 10L)).toDF("id", "status", "cents")) // v1 @1000
      now = 2000L
      t0.appendVersion(Seq((2L, "F", 20L)).toDF("id", "status", "cents"))
      t0 // v2 @2000
    }
    Catalog.registerTable(spark, "graft_ms", "t_tt", t) // repoint at v2
    def ids(sql: String): Set[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).toSet
    assert(ids("SELECT id FROM graft_ms.t_tt VERSION AS OF 1") == Set(1L))
    assert(ids("SELECT id FROM graft_ms.t_tt VERSION AS OF 2") ==
      Set(1L, 2L))
    // FOR is optional in Spark's grammar; session is UTC, commit stamps
    // are the injected 1000/2000 ms epochs
    assert(ids("SELECT id FROM graft_ms.t_tt FOR TIMESTAMP AS OF " +
      "'1970-01-01 00:00:01.5'") == Set(1L))
    assert(ids("SELECT id FROM graft_ms.t_tt TIMESTAMP AS OF " +
      "'1970-01-01 00:00:02'") == Set(1L, 2L))
    // time travel composes with ordinary SQL (join the two snapshots)
    val n = spark.sql(
      """SELECT count(*) FROM graft_ms.t_tt VERSION AS OF 2 a
         JOIN graft_ms.t_tt VERSION AS OF 1 b ON a.id = b.id""")
      .head.getLong(0)
    assert(n == 1L)
    // refusals stay loud through the SQL surface
    val e = intercept[Exception] {
      spark.sql("SELECT id FROM graft_ms.t_tt TIMESTAMP AS OF " +
        "'1969-12-31 00:00:00'").collect()
    }
    assert(e.getMessage.contains("birth"),
      s"before-birth must refuse with the birth message, got: " +
        e.getMessage.take(200))
  }

  test("conditional UPDATE + conditional DELETE in one statement: " +
      "ordered clauses, first-true wins, unmatched-condition rows pass " +
      "through; COW + exact feed on a partitioned target") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L),
      (4L, "P", 40L), (5L, "P", 50L)).toDF("id", "status", "cents")
    val t = freshTable("t_cond", seed, parts = Seq("status"))
    // op column drives the clause conditions (the CDC/SCD shape)
    Seq((1L, "drop", 0L), (2L, "bump", 7L), (3L, "bump", 9L),
      (4L, "noop", 99L), (9L, "new", 90L))
      .toDF("id", "op", "delta").createOrReplaceTempView("ms_cond")
    spark.sql(
      """MERGE INTO graft_ms.t_cond t USING ms_cond s ON t.id = s.id
         WHEN MATCHED AND s.op = 'drop' THEN DELETE
         WHEN MATCHED AND s.op = 'bump' THEN
           UPDATE SET cents = t.cents + s.delta
         WHEN NOT MATCHED AND s.op = 'new' THEN
           INSERT (id, status, cents) VALUES (s.id, 'N', s.delta)""")
      .collect()
    assert(rows("t_cond") == Set((2L, "O", 27L), (3L, "F", 39L),
      (4L, "P", 40L), (5L, "P", 50L), (9L, "N", 90L)),
      "delete id=1, bump 2/3, pass 4 (no clause matched) and 5 " +
        "(unmatched target) through, insert 9")
    // COW: the commit must be a feed-carrying replace with the exact feed
    val rec = graft.io.VersionLog.readRecord(t.path, 2)
    assert(rec.exists(r => r.kind == "replace" && r.feed.nonEmpty),
      s"conditional MERGE on a partitioned target must commit COW, " +
        s"got ${rec.map(_.kind)}")
    val cdf = t.changesBetween(spark, 1, 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")))
      .toSet
    assert(cdf == Set((1L, "delete"), (2L, "delete"), (2L, "insert"),
      (3L, "delete"), (3L, "insert"), (9L, "insert")),
      s"exact feed: delete 1, update pairs for 2/3, insert 9 — got $cdf")
  }

  test("clause ORDER decides when several conditions hold (first-true " +
      "wins), and the SQL path equals the MergeOps algebra") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 200L)).toDF("id", "status",
      "cents")
    freshTable("t_order", seed)
    Seq((1L, 5L), (2L, 5L)).toDF("id", "delta")
      .createOrReplaceTempView("ms_order")
    // both clauses' conditions hold for id=2 (cents>100 AND delta=5):
    // the FIRST clause must win → delete, not update
    spark.sql(
      """MERGE INTO graft_ms.t_order t USING ms_order s ON t.id = s.id
         WHEN MATCHED AND t.cents > 100 THEN DELETE
         WHEN MATCHED AND s.delta = 5 THEN
           UPDATE SET cents = t.cents + s.delta""").collect()
    assert(rows("t_order") == Set((1L, "O", 15L)),
      "id=2 takes the FIRST matching clause (DELETE); id=1 updates")
  }

  test("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET builds target-side " +
      "images; conditional variant scopes it") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents")
    freshTable("t_nmbs", seed)
    Seq((1L, "O", 11L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_nmbs")
    spark.sql(
      """MERGE INTO graft_ms.t_nmbs t USING ms_nmbs s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED BY SOURCE AND t.status = 'O' THEN
           UPDATE SET status = 'X'""").collect()
    assert(rows("t_nmbs") == Set((1L, "O", 11L), (2L, "X", 20L),
      (3L, "F", 30L)),
      "id=2 (unmatched, status O) flips to X; id=3 fails the condition " +
        "and passes through")
  }

  test("duplicate source ON keys refuse loudly when a clause touches " +
      "existing target rows (SQL MERGE's multiple-matches error)") {
    val seed = Seq((1L, "O", 10L)).toDF("id", "status", "cents")
    freshTable("t_dup", seed)
    Seq((1L, "A", 1L), (1L, "B", 2L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_dup")
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        """MERGE INTO graft_ms.t_dup t USING ms_dup s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
    }
    assert(e.getMessage.contains("multiple rows per ON key"),
      s"got: ${e.getMessage.take(200)}")
    // insert-only keeps Delta's semantics: duplicates are all inserted
    Seq((7L, "A", 1L), (7L, "B", 2L)).toDF("id", "status", "cents")
      .createOrReplaceTempView("ms_dup_ins")
    spark.sql(
      """MERGE INTO graft_ms.t_dup t USING ms_dup_ins s ON t.id = s.id
         WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(rows("t_dup") == Set((1L, "O", 10L), (7L, "A", 1L),
      (7L, "B", 2L)),
      "insert-if-absent must keep BOTH duplicate-keyed source rows")
  }

  test("WITH SCHEMA EVOLUTION appends source-only columns via a " +
      "zero-row hard-link commit; old versions and the CDF read NULL " +
      "for them") {
    val seed = Seq((1L, "O", 10L), (2L, "O", 20L), (3L, "F", 30L))
      .toDF("id", "status", "cents")
    val t = freshTable("t_evo", seed, parts = Seq("status"))
    Seq((2L, "F", 25L, "eu"), (4L, "P", 40L, "us"))
      .toDF("id", "status", "cents", "region")
      .createOrReplaceTempView("ms_evo")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft_ms.t_evo t
         USING ms_evo s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").collect()
    // v2 = the schema-widening append (zero rows added), v3 = the merge
    assert(t.version == 3, s"evolution commit + merge commit, at " +
      s"${t.version}")
    val rec2 = graft.io.VersionLog.readRecord(t.path, 2)
    assert(rec2.exists(_.kind == "append"),
      s"the widening commit must be an append, got ${rec2.map(_.kind)}")
    val got = spark.sql(
      "SELECT id, status, cents, region FROM graft_ms.t_evo").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)))).toSet
    assert(got == Set((1L, "O", 10L, None), (2L, "F", 25L, Some("eu")),
      (3L, "F", 30L, None), (4L, "P", 40L, Some("us"))),
      "pre-evolution rows read NULL region; merged rows carry it")
    // CDF across the evolution horizon: v1 content read at the evolved
    // schema serves NULL for the new column (the read-side law), and
    // the merge feed carries the evolved schema
    val v1 = t.readVersion(spark, 1)
    assert(!v1.columns.contains("region"),
      "the v1 snapshot keeps its committed (pre-evolution) schema")
    val feed = t.changesBetween(spark, 2, 3)
    assert(feed.columns.contains("region"),
      "the merge feed must carry the evolved schema")
    val insRegions = feed.filter($"_change_type" === "insert")
      .select("id", "region").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(insRegions == Set((2L, Some("eu")), (4L, Some("us"))))
  }

  test("ON-side validation: both operands on one side, or an unknown " +
      "qualifier, refuse loudly") {
    val seed = Seq((1L, "O", 10L)).toDF("id", "status", "cents")
    freshTable("t_sides", seed)
    seed.createOrReplaceTempView("ms_sides")
    val e1 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO graft_ms.t_sides t USING ms_sides s ON t.id = t.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
    }
    assert(e1.getMessage.contains("both operands"),
      s"got: ${e1.getMessage.take(200)}")
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO graft_ms.t_sides t USING ms_sides s ON t.id = x.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
    }
    assert(e2.getMessage.contains("names neither"),
      s"got: ${e2.getMessage.take(200)}")
  }

  test("unsupported shapes refuse loudly, naming the clause; " +
      "unregistered targets pass through to stock Spark") {
    val seed = Seq((1L, "O", 10L)).toDF("id", "status", "cents")
    freshTable("t_refuse", seed)
    seed.createOrReplaceTempView("ms_src")
    // a NMBS SET reading a source/unknown qualifier has no row to read
    // from — must fail loudly (Spark's standard unresolved error)
    val e1 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_ms.t_refuse t USING ms_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cents = q.cents""")
        .collect()
    }
    assert(e1.getMessage.contains("not supported") ||
      e1.getMessage.contains("UNRESOLVED") ||
      e1.getMessage.toLowerCase.contains("cannot resolve"),
      s"a NMBS SET reading a non-target qualifier must fail loudly, " +
        s"got: ${e1.getMessage.take(200)}")
    // differently-named key equality
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO graft_ms.t_refuse t USING ms_src s ON t.id = s.cents
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
    }
    assert(e2.getMessage.contains("differently-named"))
    // non-conjunctive ON
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO graft_ms.t_refuse t USING ms_src s
           ON t.id = s.id OR t.cents = s.cents
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
    }
    assert(e3.getMessage.contains("ON clause term"))
    // an UNREGISTERED target keeps stock Spark's analysis error (the
    // rewrite must not capture tables it does not own)
    val e4 = intercept[Exception] {
      spark.sql(
        """MERGE INTO some_unregistered_tbl t USING ms_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *""").collect()
    }
    assert(e4.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e4.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
