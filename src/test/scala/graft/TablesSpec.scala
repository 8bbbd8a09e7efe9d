package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ParquetTable

/** S2/S3 — versioned parquet table (Delta-semantics emulation). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("createIfNotExists writes once, overwrite bumps the version") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    val t = new ParquetTable(s"$dir/t1")
    assert(!t.exists)
    t.createIfNotExists(Seq((1, "a")).toDF("id", "v"))
    assert(t.exists)
    // second create is a no-op
    t.createIfNotExists(Seq((99, "zz")).toDF("id", "v"))
    TestSpark.assertSameRows(t.read(spark), Seq(Seq(1, "a")))
    // overwrite replaces content; old version dir remains for in-flight readers
    t.overwrite(Seq((2, "b")).toDF("id", "v"))
    TestSpark.assertSameRows(t.read(spark), Seq(Seq(2, "b")))
  }

  test("partitioned write keeps partition columns readable") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    val t = new ParquetTable(s"$dir/t2", partitionColumns = Seq("year"))
    t.overwrite(Seq((1, 2023), (2, 2024)).toDF("id", "year"))
    TestSpark.assertSameRows(t.read(spark).select("id", "year"),
      Seq(Seq(1, 2023), Seq(2, 2024)))
  }
}
