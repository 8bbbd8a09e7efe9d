package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.FuzzyJoin

/** PassJoin blocked fuzzy matching: lossless vs the naive cross product,
  * and the plan is a hash join (never BroadcastNestedLoopJoin).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: DataFrame, key: String, name: String, k: Int): DataFrame = {
    val a = df.select(col(key).as("key_a"), col(name).as("name_a"))
    val b = df.select(col(key).as("key_b"), col(name).as("name_b"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= k)
      .select(col("key_a"), col("key_b"), col("edit_dist"))
  }

  test("blocked pairs equal the naive cross product on suppliers") {
    val sup = Tables.read(spark, "/root/testdata/sf0.001", "supplier")
      .select(col("s_suppkey"), col("s_name"))
    val blocked = FuzzyJoin.editDistancePairs(sup, "s_suppkey", "s_name", 2)
    val expected = naive(sup, "s_suppkey", "s_name", 2)
    assert(TestSpark.rows(blocked) == TestSpark.rows(expected))
    assert(blocked.count() > 0, "fixture must exercise at least one pair")
  }

  test("blocked pairs are lossless on adversarial edit positions") {
    // edits at prefix/middle/suffix, insertions, deletions, short strings,
    // length drift beyond k, NULL name
    val rows = Seq(
      1L -> "supplier alpha", 2L -> "Xupplier alpha", // prefix substitution
      3L -> "supplier aXpha",                         // middle substitution
      4L -> "supplier alphX",                         // suffix substitution
      5L -> "suppliXr alphX",                         // two edits, different segments
      6L -> "XuXplier alpha",                         // two edits, same segment
      7L -> "upplier alpha",                          // deletion at front
      8L -> "supplier alphaZZ",                       // two insertions at end
      9L -> "supplier alphaZZZ",                      // three edits from 1 — excluded
      10L -> "ab", 11L -> "ba", 12L -> "a", 13L -> "", // shorter than parts
      14L -> null)
      .toDF("id", "nm")
    val blocked = FuzzyJoin.editDistancePairs(rows, "id", "nm", 2)
    val expected = naive(rows, "id", "nm", 2)
    assert(TestSpark.rows(blocked) == TestSpark.rows(expected))
    // sanity: the hard cases actually matched
    val pairs = blocked.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((1L, 6L)) &&
      pairs.contains((1L, 7L)) && pairs.contains((1L, 8L)))
    assert(!pairs.contains((1L, 9L)))
  }

  test("plan is an equi hash join, not a nested loop") {
    val sup = Tables.read(spark, "/root/testdata/sf0.001", "supplier")
      .select(col("s_suppkey"), col("s_name"))
    val plan = FuzzyJoin.editDistancePairs(sup, "s_suppkey", "s_name", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocked fuzzy join must not plan a nested loop:\n$plan")
  }
}
