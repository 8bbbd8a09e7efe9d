package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Binned range join vs the naive cross-join-and-filter reference:
  * identical pair sets across bin widths, boundary semantics (hi
  * exclusive), negative-axis values (floor division, not truncation),
  * and empty intervals.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // points straddling zero so truncating division (rounds toward zero)
  // would misbin; intervals narrower than, equal to, and wider than any
  // tested bin width, plus adjacent intervals sharing a boundary
  private lazy val points = Seq(-13L, -7L, -1L, 0L, 1L, 6L, 7L, 8L, 20L, 34L)
    .zipWithIndex.map { case (p, i) => (i.toLong, p) }
    .toDF("point_id", "p")
  private lazy val intervals = Seq(
    (0L, -10L, -5L),  // negative axis
    (1L, -2L, 2L),    // straddles zero
    (2L, 0L, 7L),     // [0, 7): excludes the point at 7
    (3L, 7L, 14L),    // adjacent: picks up exactly 7 and 8
    (4L, 5L, 40L),    // much wider than the bin
    (5L, 30L, 30L),   // empty (hi == lo) → matches nothing
    (6L, 25L, 20L))   // inverted (hi < lo) → matches nothing
    .toDF("iv_id", "lo", "hi")

  private def naivePairs: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("point_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned join equals the naive cross join across bin widths") {
    val expected = naivePairs
    assert(expected.nonEmpty && !expected.exists(_._2 >= 5L),
      s"fixture sanity: $expected")
    for (bw <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", bw)
        .select("point_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binWidth=$bw: $got != $expected")
    }
  }

  test("hi is exclusive and lo inclusive on exact boundaries") {
    val got = RangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", 7L)
      .filter(col("p") === 7L).select("iv_id").collect()
      .map(_.getLong(0)).toSet
    // 7 ∈ [7, 14) and [5, 40), but NOT [0, 7)
    assert(got == Set(3L, 4L), s"boundary membership wrong: $got")
  }

  test("output carries both sides' columns and no internal bin column") {
    val out = RangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", 7L)
    assert(out.columns.toSet ==
      Set("point_id", "p", "iv_id", "lo", "hi"))
  }

  test("rejects a non-positive bin width") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 0L)
    }
    assert(e.getMessage.contains("binWidth"))
  }

  test("binning is exact on epoch-nano magnitudes (integral division, " +
      "no double rounding)") {
    // ~1.7e18 is beyond double's 2^53 mantissa: a floor-div computed via
    // double division can land k ± 1, splitting a point from its
    // covering interval. The ts contract here IS epoch nanos.
    val base = 1704067207179575000L
    val pts = Seq(base - 1L, base, base + 1L, base + 999L, base + 1000L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("point_id", "p")
    val ivs = Seq((0L, base, base + 1000L)).toDF("iv_id", "lo", "hi")
    for (bw <- Seq(1L, 7L, 1000L, 1000000000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bw)
        .select("point_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 3L), s"binWidth=$bw: got $got")
    }
  }

  test("epochDays is midnight-day arithmetic") {
    val d = Seq("1970-01-01 00:00:00", "1970-01-02 00:00:00",
      "1969-12-31 00:00:00", "1995-01-02 00:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
      .select(RangeJoin.epochDays(col("ts")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(d == Seq(0L, 1L, -1L, 9132L), s"epochDays wrong: $d")
  }
}
