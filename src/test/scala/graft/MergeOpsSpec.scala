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
}
