package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — every (point, interval) pair with
  * `lo <= point < hi` — for the case the as-of join cannot cover: no
  * equi-key exists at all, and BOTH sides are large.
  *
  * Spark's native plan for a pure inequality join is a
  * BroadcastNestedLoopJoin (or a cartesian product) — the exact
  * scale-killers [[graft.tools.PlanAudit]] gates against. Bin-and-conquer
  * restores an equi-key: bucket the number line into fixed-width bins,
  * replicate each interval into every bin it overlaps (bounded fan-out:
  * ceil(width / binWidth) + 1 rows per interval), hash-join point bins to
  * interval bins, then apply the exact containment predicate to the
  * bin-local candidates. This is the standard interval-binning range-join
  * optimization (as in Spark's own bucketed range-join literature and
  * DuckDB's IEJoin alternative): one shuffle per side on `__bin`, work
  * proportional to true matches per bin instead of |points| × |intervals|.
  *
  * `binWidth` is the scale knob: set it near the TYPICAL interval width.
  * Too small multiplies the interval-side fan-out; too large packs
  * unrelated points into each bin and pushes work into the post-join
  * filter. Skewed bins (a hot day, a hot price band) are ordinary
  * shuffle-join skew — AQE's skew-join split applies, unlike a BNLJ which
  * AQE cannot rescue.
  *
  * Columns are numeric on one axis (cast timestamps to epoch
  * days/seconds first — [[epochDays]] below); `hi` is EXCLUSIVE, matching
  * interval conventions everywhere else in this library. Intervals with
  * `hi <= lo` are empty and match nothing; NULL endpoints or points never
  * match (equi-join + filter semantics).
  */
object RangeJoin {

  /** Exact floor division by a positive constant, entirely in integer
    * space: `a - pmod(a, b)` is an exact multiple of `b` (and pmod is
    * non-negative, so truncating division equals floor even for negative
    * `a`), and the quotient runs through Catalyst's INTEGRAL divide — a
    * long `/` would be DOUBLE division, which silently misbins axes above
    * 2⁵³ (this library's `ts` contract is epoch NANOS, ~1.7e18).
    */
  private def floorDiv(a: Column, b: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftBridge.toColumn(IntegralDivide(
      GraftBridge.toExpression((a - pmod(a, lit(b))).cast("long")),
      GraftBridge.toExpression(lit(b))))
  }

  /** Days since 1970-01-01 as a long — the natural range-join axis for
    * date-grained intervals.
    */
  def epochDays(ts: Column): Column =
    datediff(ts, to_date(lit("1970-01-01"))).cast("long")

  /** Inner join of every point row to every interval row whose
    * `[loCol, hiCol)` contains `pointCol`. Output carries all columns of
    * both inputs (names must not collide, except the join machinery's
    * internal `__bin`).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points
      .withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val iv = intervals
      // empty/NULL intervals match nothing — and sequence() would walk
      // BACKWARDS (step −1) on hi <= lo, fabricating bins
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin", explode(sequence(
        floorDiv(col(loCol), binWidth),
        floorDiv(col(hiCol) - lit(1L), binWidth))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
