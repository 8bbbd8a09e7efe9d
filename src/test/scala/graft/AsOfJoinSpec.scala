package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics on a hand-built fixture. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, 100L, 5L),   // before any right row → no match
      (2L, 100L, 15L),  // matches t=10
      (3L, 100L, 20L),  // equal time counts (<=) → t=20
      (4L, 100L, 99L),  // latest → t=20
      (5L, 200L, 50L))  // other key, no right rows → no match
      .toDF("event_id", "key", "t")
    val right = Seq(
      (100L, 10L, "a"),
      (100L, 20L, "b"))
      .toDF("key", "rt", "payload")

    val got = AsOfJoin.asOf(left, right, Seq("key"), col("t"), col("rt"),
      Seq("payload"))
      .select("event_id", "payload")
    TestSpark.assertSameRows(got, Seq(
      Seq(1L, null), Seq(2L, "a"), Seq(3L, "b"), Seq(4L, "b"), Seq(5L, null)))
  }

  test("NULL keys never match (equi-join semantics, like native ASOF)") {
    val left = Seq((1L, Option.empty[Long], 50L), (2L, Option(100L), 50L))
      .toDF("event_id", "key", "t")
    val right = Seq((Option.empty[Long], 10L, "nullkey"), (Option(100L), 10L, "real"))
      .toDF("key", "rt", "payload")
    val got = AsOfJoin.asOf(left, right, Seq("key"), col("t"), col("rt"),
      Seq("payload")).select("event_id", "payload")
    TestSpark.assertSameRows(got, Seq(Seq(1L, null), Seq(2L, "real")))
  }
}
