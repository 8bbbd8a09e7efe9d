package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping — the
  * Delta `OPTIMIZE ZORDER BY` analog over the versioned parquet layout.
  *
  * A single-column sort gives parquet row-group/file min-max pruning on
  * that column only: every file still spans the FULL range of every other
  * column, so a filter on the second dimension prunes nothing. Interleaving
  * the bits of rank-normalized column values puts rows that are close in
  * EVERY dimension into the same files, so each file covers a small
  * rectangle of the value space and footer stats prune scans filtered on
  * ANY of the z-ordered columns. That is the difference between reading one
  * file and reading all of them at 100 TB, for the price of one rewrite.
  *
  * Mechanics: per-column PERCENTILE cut points come from a one-pass
  * `percentile_approx` sketch in a broadcast 1-row aggregate on the same
  * DAG (no separate driver job); each value's rank is its bin among those
  * cut points via the native binary-search expression
  * ([[graft.functions.RankBin]], codegen'd, O(bits) comparisons/row);
  * ranks are bit-interleaved into a single long with pure Column algebra
  * (codegen'd shifts/masks, no UDF); the rewrite is `repartitionByRange`
  * on the z-value (one range-sampled shuffle) + in-partition sort.
  *
  * Rank binning, NOT min-max scaling, on purpose: min-max bounds collapse
  * under a single outlier (one 1e9 value maps every normal row of that
  * column to rank 0, erasing the multi-dimension skipping the operator
  * exists for) and compress skewed-but-legitimate distributions into few
  * distinct ranks. Percentile bins give every column a near-uniform rank
  * distribution regardless of value distribution — the same reason
  * Delta's OPTIMIZE ZORDER range-partitions per column rather than
  * scaling. ScaleSpec quantifies the footer effect and pins the
  * outlier-robustness case.
  */
object ZOrder {

  /** `df` plus a `__z` Morton code over `cols` (numeric columns; NULLs
    * rank 0). `bits` per column; `bits × cols.size` must fit in a long.
    *
    * Default bits=12 (4096 bins/column), NOT higher: the cut-point plan
    * literal and driver Seq are O(2^bits) PER COLUMN, and file-level
    * skipping saturates once bins ≥ output file count — 4096 bins already
    * over-resolves any realistic compaction target, at ~1/16 the plan
    * bytes of the former bits=16 default.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits * cols.size <= 62,
      s"bits=$bits × ${cols.size} columns exceeds a long's mantissa-safe range")
    // The per-column cut-point literal and percentile sketch are both
    // O(2^bits): bits=20 is ~1M doubles per column — already far past any
    // realistic file count; beyond that the driver Seq + plan literal OOM
    // or hang where coarser bins behave identically for skipping.
    require(bits <= 20,
      s"bits=$bits: the percentile-sketch cut-point set is O(2^bits) " +
        "driver memory and plan size; use <= 20 (file-level skipping " +
        "saturates around 12)")
    val bins = 1L << bits
    // cut points at q = i/bins, i in 1..bins-1; rank = #cutpoints <= value
    // ∈ [0, bins-1]. The sketch accuracy tracks the bin count (its memory
    // is O(accuracy) ints — a few MB at 2^17, merged tree-wise).
    val pcts = typedLit((1L until bins).map(_.toDouble / bins))
    val accuracy = math.min(1 << 17, math.max(10000, 2 * bins)).toInt
    val cutAggs = cols.map(c => percentile_approx(col(c).cast("double"),
      pcts, lit(accuracy)).as(s"__qb_$c"))
    val bounds = df.agg(cutAggs.head, cutAggs.tail: _*)
    val withRanks = df.crossJoin(broadcast(bounds))
    // NULL value (or an all-NULL column, whose sketch is NULL) ranks 0
    val rank: String => Column = c => coalesce(
      graft.functions.RankBinFunctions.rank_bin(col(c), col(s"__qb_$c")),
      lit(0L))
    // interleave: bit b of column j lands at position b * ncols + j
    val n = cols.size
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(rank(c), b).bitwiseAND(lit(1L)), b * n + j))
      }
    }
    withRanks.withColumn("__z", z)
      .drop(cols.map(c => s"__qb_$c"): _*)
  }

  /** Rewrite `df` z-ordered into `targetPartitions` output partitions:
    * one range-sampled shuffle on the z-value, in-partition sort, helper
    * column dropped. The caller writes the result (see
    * `ParquetTable.compactZOrder`).
    */
  def layout(df: DataFrame, cols: Seq[String], targetPartitions: Int,
      bits: Int = 12): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(targetPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
