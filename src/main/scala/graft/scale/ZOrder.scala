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
  * Mechanics: per-column bounds come from a broadcast 1-row aggregate on
  * the same DAG (no separate driver job); values are min-max scaled to
  * `bits`-wide integer ranks; ranks are bit-interleaved into a single long
  * with pure Column algebra (codegen'd shifts/masks, no UDF); the rewrite
  * is `repartitionByRange` on the z-value (one range-sampled shuffle) +
  * in-partition sort. ScaleSpec quantifies the effect on real parquet
  * footers: per-file width on the second dimension collapses versus a
  * linear sort.
  */
object ZOrder {

  /** `df` plus a `__z` Morton code over `cols` (numeric columns; NULLs
    * rank 0). `bits` per column; `bits × cols.size` must fit in a long.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits * cols.size <= 62,
      s"bits=$bits × ${cols.size} columns exceeds a long's mantissa-safe range")
    val bounds = df.agg(
      min(col(cols.head)).cast("double").as(s"__min_${cols.head}"),
      (cols.tail.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))) :+
        max(col(cols.head)).cast("double").as(s"__max_${cols.head}")): _*)
    val maxRank = (1L << bits) - 1
    val withRanks = df.crossJoin(broadcast(bounds))
    val rank: String => Column = c => {
      val lo = col(s"__min_$c")
      val hi = col(s"__max_$c")
      val scaled = floor((col(c).cast("double") - lo) / (hi - lo) * maxRank)
      // degenerate range (hi == lo) and NULLs both rank 0; clamp the
      // hi endpoint (value == hi scales exactly to maxRank)
      coalesce(least(greatest(scaled, lit(0.0)), lit(maxRank.toDouble)), lit(0.0))
        .cast("long")
    }
    // interleave: bit b of column j lands at position b * ncols + j
    val n = cols.size
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(rank(c), b).bitwiseAND(lit(1L)), b * n + j))
      }
    }
    withRanks.withColumn("__z", z)
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Rewrite `df` z-ordered into `targetPartitions` output partitions:
    * one range-sampled shuffle on the z-value, in-partition sort, helper
    * column dropped. The caller writes the result (see
    * `ParquetTable.compactZOrder`).
    */
  def layout(df: DataFrame, cols: Seq[String], targetPartitions: Int,
      bits: Int = 16): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(targetPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
