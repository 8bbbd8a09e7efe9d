package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ParquetTable

/** SQL DDL on graft tables ([[org.apache.spark.sql.GraftSqlDdl]]):
  * CREATE / CTAS / REPLACE / DROP drivable purely from `spark.sql`,
  * IF NOT EXISTS idempotence (S2's create-if-absent as SQL), history
  * surviving REPLACE, DROP leaving external data unless PURGE, and the
  * loud refusals for constructs the versioned layout cannot honor.
  */
class SqlDdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_sqlddl").toString

  test("CREATE TABLE … USING graft PARTITIONED BY: SQL-only loop — " +
      "create empty, INSERT, MERGE, read; IF NOT EXISTS is idempotent " +
      "and a plain re-CREATE refuses") {
    val loc = s"${freshDir()}/t"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    val v = spark.sql("CREATE TABLE graft_ddl.t_loop (id BIGINT, " +
      s"status STRING, cents BIGINT) USING graft PARTITIONED BY (status) " +
      s"LOCATION '$loc'").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(1L))
    // empty but readable through the catalog
    assert(spark.table("graft_ddl.t_loop").count() == 0)

    spark.sql("INSERT INTO graft_ddl.t_loop (id, status, cents) " +
      "VALUES (1, 'O', 10), (2, 'F', 20)").collect()
    assert(spark.sql("SELECT count(*) FROM graft_ddl.t_loop")
      .head().getLong(0) == 2)

    // IF NOT EXISTS over the existing layout: adopt, keep data
    spark.sql("CREATE TABLE IF NOT EXISTS graft_ddl.t_loop (id BIGINT, " +
      s"status STRING, cents BIGINT) USING graft PARTITIONED BY (status) " +
      s"LOCATION '$loc'").collect()
    assert(spark.table("graft_ddl.t_loop").count() == 2)

    // plain re-CREATE refuses loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_ddl.t_loop (id BIGINT, " +
        s"status STRING, cents BIGINT) USING graft LOCATION '$loc'")
        .collect()
    }
    assert(e.getMessage.contains("already exists"))

    // incompatible declared schema refuses the adopt
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE IF NOT EXISTS graft_ddl.t_loop " +
        s"(id BIGINT, wrong STRING) USING graft LOCATION '$loc'").collect()
    }
    assert(e2.getMessage.contains("incompatible"))
  }

  test("CTAS creates the first version from the query; MERGE INTO and " +
      "time travel work on it; REPLACE commits a new version with " +
      "history surviving") {
    val loc = s"${freshDir()}/c"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    spark.sql("CREATE TABLE graft_ddl.t_ctas USING graft " +
      s"PARTITIONED BY (status) LOCATION '$loc' AS " +
      "SELECT * FROM VALUES (1L, 'O', 10L), (2L, 'F', 20L) " +
      "AS v(id, status, cents)").collect()
    assert(spark.table("graft_ddl.t_ctas").count() == 2)

    spark.sql("MERGE INTO graft_ddl.t_ctas t USING (SELECT 2L AS id, " +
      "'F' AS status, 25L AS cents UNION ALL SELECT 3L, 'O', 30L) s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *").collect()
    assert(spark.sql("SELECT sum(cents) FROM graft_ddl.t_ctas")
      .head().getLong(0) == 65L)

    // REPLACE: new version, old versions still reachable
    spark.sql("REPLACE TABLE graft_ddl.t_ctas USING graft " +
      s"LOCATION '$loc' AS SELECT 9L AS id, 'X' AS status, 99L AS cents")
      .collect()
    assert(spark.table("graft_ddl.t_ctas").count() == 1)
    val t = new ParquetTable(loc)
    assert(t.version == 3)
    assert(t.readVersion(spark, 2).count() == 3,
      "pre-REPLACE versions must survive (REPLACE is one more commit)")

    // REPLACE on a missing table refuses; CREATE OR REPLACE creates
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE graft_ddl.t_nope (id BIGINT) USING graft " +
        s"LOCATION '${freshDir()}/n'").collect()
    }
    assert(e.getMessage.contains("CREATE OR REPLACE"))
    spark.sql("CREATE OR REPLACE TABLE graft_ddl.t_cor USING graft " +
      s"LOCATION '${freshDir()}/cor' AS SELECT 1L AS id").collect()
    assert(spark.table("graft_ddl.t_cor").count() == 1)
  }

  test("DROP TABLE unregisters but leaves the versioned data " +
      "(external semantics); a later CREATE IF NOT EXISTS re-adopts it; " +
      "DROP … PURGE deletes the table root") {
    val loc = s"${freshDir()}/d"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    spark.sql("CREATE TABLE graft_ddl.t_drop USING graft " +
      s"LOCATION '$loc' AS SELECT 1L AS id, 'a' AS v").collect()
    spark.sql("DROP TABLE graft_ddl.t_drop").collect()
    assert(!spark.catalog.tableExists("graft_ddl.t_drop"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(loc)),
      "DROP must not delete external data")
    // DML on the dropped name no longer routes to graft
    intercept[Exception] {
      spark.sql("UPDATE graft_ddl.t_drop SET v = 'b'").collect()
    }

    // re-adopt
    spark.sql("CREATE TABLE IF NOT EXISTS graft_ddl.t_drop " +
      s"(id BIGINT, v STRING) USING graft LOCATION '$loc'").collect()
    assert(spark.table("graft_ddl.t_drop").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))

    spark.sql("DROP TABLE graft_ddl.t_drop PURGE").collect()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(loc)),
      "PURGE must delete the table root")
  }

  test("loud refusals: non-identity partition transform, NOT NULL, " +
      "TBLPROPERTIES, column DEFAULT; non-graft providers pass through " +
      "untouched") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refuse("CREATE TABLE graft_ddl.r1 (id BIGINT, ts TIMESTAMP) " +
      s"USING graft PARTITIONED BY (bucket(4, id)) " +
      s"LOCATION '${freshDir()}/r1'", "partition transform")
    refuse("CREATE TABLE graft_ddl.r2 (id BIGINT NOT NULL) USING graft " +
      s"LOCATION '${freshDir()}/r2'", "NOT NULL")
    refuse("CREATE TABLE graft_ddl.r3 (id BIGINT) USING graft " +
      s"TBLPROPERTIES ('k'='v') LOCATION '${freshDir()}/r3'",
      "TBLPROPERTIES")
    refuse("CREATE TABLE graft_ddl.r4 (id BIGINT DEFAULT 7) USING graft " +
      s"LOCATION '${freshDir()}/r4'", "DEFAULT")

    // a parquet-provider CREATE goes through stock Spark: no graft
    // layout (no _current pointer) appears at the location
    val ploc = s"${freshDir()}/plain"
    spark.sql(s"CREATE TABLE graft_ddl.plain (id BIGINT) USING parquet " +
      s"LOCATION '$ploc'")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(ploc, "_current")))
    spark.sql("DROP TABLE graft_ddl.plain")
  }

  test("RESTORE TABLE TO VERSION/TIMESTAMP AS OF via SQL: rollback is " +
      "one more commit with history intact; SHALLOW CLONE creates a " +
      "zero-copy registered table that diverges independently; DEEP " +
      "CLONE refuses loudly") {
    val loc = s"${freshDir()}/r"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    graft.io.VersionLog.withClock(() => 1000L) {
      spark.sql("CREATE TABLE graft_ddl.t_restore USING graft " +
        s"LOCATION '$loc' AS SELECT 1L AS id, 10L AS cents").collect()
    }
    graft.io.VersionLog.withClock(() => 2000L) {
      spark.sql("UPDATE graft_ddl.t_restore SET cents = 99").collect()
    }
    // version rollback: one more commit, content = v1, history intact
    val rv = spark.sql(
      "RESTORE TABLE graft_ddl.t_restore TO VERSION AS OF 1").collect()
    assert(rv.map(_.getLong(0)).toSeq == Seq(3L))
    assert(spark.sql("SELECT cents FROM graft_ddl.t_restore")
      .head().getLong(0) == 10L)
    assert(spark.sql("DESCRIBE HISTORY graft_ddl.t_restore").count() == 3)

    // timestamp rollback (UTC literal): back to the post-UPDATE state
    val rt = spark.sql("RESTORE TABLE graft_ddl.t_restore TO TIMESTAMP " +
      "AS OF '1970-01-01 00:00:02'").collect()
    assert(rt.map(_.getLong(0)).toSeq == Seq(4L))
    assert(spark.sql("SELECT cents FROM graft_ddl.t_restore")
      .head().getLong(0) == 99L)

    // shallow clone: registered, equal content, independent divergence
    val cloc = s"${freshDir()}/c"
    val cv = spark.sql("CREATE TABLE graft_ddl.t_clone SHALLOW CLONE " +
      s"graft_ddl.t_restore LOCATION '$cloc'").collect()
    assert(cv.map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT cents FROM graft_ddl.t_clone")
      .head().getLong(0) == 99L)
    spark.sql("UPDATE graft_ddl.t_clone SET cents = 7").collect()
    assert(spark.sql("SELECT cents FROM graft_ddl.t_clone")
      .head().getLong(0) == 7L)
    assert(spark.sql("SELECT cents FROM graft_ddl.t_restore")
      .head().getLong(0) == 99L,
      "the source must not see the clone's writes")
    // occupied destination without IF NOT EXISTS refuses; with it, adopts
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_ddl.t_clone2 SHALLOW CLONE " +
        s"graft_ddl.t_restore LOCATION '$cloc'").collect()
    }
    assert(e.getMessage.contains("already exists"))
    spark.sql("CREATE TABLE IF NOT EXISTS graft_ddl.t_clone2 SHALLOW " +
      s"CLONE graft_ddl.t_restore LOCATION '$cloc'").collect()
    assert(spark.sql("SELECT cents FROM graft_ddl.t_clone2")
      .head().getLong(0) == 7L)

    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_ddl.t_deep DEEP CLONE " +
        "graft_ddl.t_restore").collect()
    }
    assert(e2.getMessage.contains("SHALLOW CLONE"))

    // unregistered source: falls through to the delegate's parse error,
    // never a half-parsed graft action
    intercept[Exception] {
      spark.sql("RESTORE TABLE graft_ddl.no_such TO VERSION AS OF 1")
        .collect()
    }
  }

  test("ALTER TABLE ADD COLUMNS is one zero-row widening commit (old " +
      "versions read NULL, CDF unaffected); TRUNCATE empties through " +
      "the versioned DELETE with an exact feed; other ALTERs and " +
      "TRUNCATE PARTITION refuse loudly") {
    val loc = s"${freshDir()}/a"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    spark.sql("CREATE TABLE graft_ddl.t_alter USING graft " +
      s"LOCATION '$loc' AS SELECT 1L AS id, 10L AS cents").collect()
    val av = spark.sql("ALTER TABLE graft_ddl.t_alter ADD COLUMNS " +
      "(note STRING, score DOUBLE)").collect()
    assert(av.map(_.getLong(0)).toSeq == Seq(2L))
    val t = new ParquetTable(loc)
    // the widening is an append commit (hard links, no data rewrite)
    assert(graft.io.VersionLog.readRecord(loc, 2).exists(_.kind == "append"))
    // live reads NULL for the new columns; v1 still reads (as NULL too)
    val live = spark.table("graft_ddl.t_alter").collect()
    assert(live.length == 1 && live.head.isNullAt(2) && live.head.isNullAt(3))
    assert(t.readVersion(spark, 1).columns.toSeq == Seq("id", "cents"))
    // the widened column is writable
    spark.sql("INSERT INTO graft_ddl.t_alter (id, cents, note) " +
      "VALUES (2, 20, 'x')").collect()
    assert(spark.sql("SELECT count(note) FROM graft_ddl.t_alter")
      .head().getLong(0) == 1)

    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refuse("ALTER TABLE graft_ddl.t_alter ADD COLUMNS (id BIGINT)",
      "already exists")
    refuse("ALTER TABLE graft_ddl.t_alter ADD COLUMNS (nn STRING NOT NULL)",
      "NOT NULL")
    refuse("ALTER TABLE graft_ddl.t_alter RENAME COLUMN note TO memo",
      "not supported")

    // TRUNCATE: versioned empty commit + all-delete feed, table readable
    val vBefore = t.version
    spark.sql("TRUNCATE TABLE graft_ddl.t_alter").collect()
    assert(spark.table("graft_ddl.t_alter").count() == 0)
    val cdf = t.changesBetween(spark, vBefore, t.version)
    assert(cdf.filter(cdf("_change_type") === "delete").count() == 2)
    refuse("TRUNCATE TABLE graft_ddl.t_alter PARTITION (id = 1)",
      "DELETE FROM")
    // truncating the already-empty table is a semantic no-op
    val vEmpty = t.version
    spark.sql("TRUNCATE TABLE graft_ddl.t_alter").collect()
    assert(t.version == vEmpty, "truncate of empty must commit nothing")
  }

  test("CREATE TABLE without LOCATION lands at the session catalog's " +
      "standard path and a bare (current-database) name resolves") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl2")
    val prev = spark.catalog.currentDatabase
    try {
      spark.catalog.setCurrentDatabase("graft_ddl2")
      spark.sql("CREATE TABLE t_default (id BIGINT) USING graft").collect()
      spark.sql("INSERT INTO t_default VALUES (42)").collect()
      assert(spark.table("t_default").head().getLong(0) == 42L)
      spark.sql("DROP TABLE t_default PURGE").collect()
    } finally spark.catalog.setCurrentDatabase(prev)
  }
}
