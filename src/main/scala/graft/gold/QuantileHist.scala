package graft.gold

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic log-bucketed quantile histograms — the PERCENTILE
  * measure kind for gold IVM (q116), chosen over a GK/KLL sketch on
  * three grounds that matter for incremental maintenance:
  *
  *  1. '''subtractable''': bucket counts are plain longs, so DELETES
  *     fold exactly (vector subtract) — no rescan fallback at all,
  *     where a quantile sketch cannot subtract and every delete-bearing
  *     group would rescan (the [[GoldMaintenance.advanceMinMax]] split);
  *  2. '''deterministic''': a value's bucket is a pure integer function,
  *     so fold ≡ rebuild is EXACT (hash-equal, q97's discipline), where
  *     GK/KLL results depend on insertion/merge order and could only be
  *     gated within an error band;
  *  3. '''oracle-able''': the percentile estimate is a closed-form
  *     function of the exact bucket counts, so DuckDB can replay it and
  *     the q116 gate is a hard hash match, not an accuracy bound.
  *
  * The bucketing is the HdrHistogram scheme (Gil Tene's public design,
  * also the shape of Prometheus native histograms): values below
  * 2^M map to themselves (exact); larger values keep an M-bit mantissa
  * under a log2 exponent. With M = [[MantissaBits]] = 4 the bucket's
  * relative width is ≤ 2^-M = 6.25 %, so any percentile's REPORTED value
  * (the bucket's lower bound) satisfies `rep ≤ true ≤ rep·(1+2^-M)` —
  * the documented value-error bound, while the RANK the report answers
  * for is exact over the bucketized multiset. Bucket count is bounded by
  * construction: ≤ 2^M·(63−M) + 2^M < 1 000 entries even for the full
  * long range, independent of data size — a gold row stays gold-sized.
  *
  * Domain: non-negative longs (latencies, cents, counts). NULLs are
  * skipped, [[GoldMaintenance.aggregateMinMax]]'s min/max convention;
  * negative values fail loudly (a silent clamp would corrupt quietly).
  */
object QuantileHist {

  /** Mantissa bits M: buckets per octave; relative error ≤ 2^-M. */
  val MantissaBits = 4
  private val Base = 1 << MantissaBits // 2^M

  /** The exact integer bucket of a non-negative long value (NULL-safe:
    * NULL in → NULL out; negative → loud error). Pure Column algebra —
    * codegen'd, scan-stage. floor(log2 v) is computed via the double
    * `log2` then SELF-CORRECTED with integer shift comparisons, so a
    * double rounding step near powers of two (or above 2^53) can never
    * change the result.
    */
  def bucketOf(v: Column): Column = {
    val one = lit(1L)
    def shl(n: Column) = call_function("shiftleft", one, n)
    // clamp to 62: the true exponent of any positive long is ≤ 62, but
    // the DOUBLE cast rounds values near 2^62/2^63 upward and a naive
    // correction would then shift by 63 — a signed-long overflow that
    // flips the comparison (caught by the spec's 2^62−1 edge)
    val e0 = least(floor(log2(v.cast("double"))).cast("int"), lit(62))
    val e1 = when(e0 < 62 && shl(e0 + 1) <= v, e0 + 1).otherwise(e0)
    val e = when(shl(e1) > v, e1 - 1).otherwise(e1)
    val sub = call_function("shiftright", v, e - MantissaBits) - Base
    val big = (e - MantissaBits + 1) * Base + sub.cast("int")
    when(v.isNull, lit(null).cast("int"))
      .when(v < 0, raise_error(concat(
        lit("QuantileHist: negative value "), v.cast("string"),
        lit(" — quantile histograms cover non-negative longs only"))))
      .when(v < Base, v.cast("int"))
      .otherwise(big)
  }

  /** The bucket's LOWER BOUND — the deterministic representative every
    * percentile report returns (and the inverse of [[bucketOf]] on
    * bucket lower bounds).
    */
  def representative(b: Column): Column = {
    val g = (b.cast("long") - pmod(b.cast("long"), lit(Base.toLong))) /
      lit(Base.toLong)
    val e = g.cast("int") - 1 + MantissaBits
    val sub = pmod(b.cast("long"), lit(Base.toLong))
    when(b.isNull, lit(null).cast("long"))
      .when(b < Base, b.cast("long"))
      .otherwise(call_function("shiftleft", lit(Base.toLong) + sub,
        e - MantissaBits))
  }

  /** The histogram column type stored in gold tables. */
  val HistType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)

  /** An empty histogram literal (all-NULL groups store this). */
  def emptyHist: Column = array().cast(HistType)

  /** Type-1 (lower) percentile over the bucketized multiset, as a pure
    * codegen'd fold over the SORTED histogram array: the representative
    * of the first bucket whose cumulative count reaches rank
    * `ceil(num/den · N)` where N is the histogram's total count —
    * integer-rational rank arithmetic (the repo-wide discipline; a
    * double `ceil(0.95·N)` flips on exact multiples). NULL (empty
    * histogram) when the group has no non-null values. Exact while
    * `N·num < 2^53` (the long→double division window; a 100 TB group
    * holds ~10^12 rows, three orders inside the bound).
    */
  def percentile(hist: Column, num: Int, den: Int): Column = {
    // fail loudly at PLAN time (bucketOf's discipline): den=0 or a
    // transposed pair would otherwise yield NULL ranks downstream —
    // indistinguishable from a legitimately empty histogram
    require(den >= 1 && num >= 0 && num <= den,
      s"percentile rank must be a rational in [0, 1]: got $num/$den")
    val nn = aggregate(hist, lit(0L), (acc, x) => acc + x.getField("n"))
    val r = {
      val a = nn * num + (den - 1)
      ((a - pmod(a, lit(den.toLong))) / den).cast("long")
    }
    val init = struct(lit(0L).as("cum"), lit(null).cast("long").as("rep"))
    aggregate(hist, init,
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("n")
        when(acc.getField("rep").isNotNull, acc)
          .otherwise(struct(cum.as("cum"),
            when(cum >= r, representative(x.getField("b")))
              .otherwise(lit(null).cast("long")).as("rep")))
      },
      acc => acc.getField("rep"))
  }
}
