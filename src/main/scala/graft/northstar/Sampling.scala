package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (BASELINE.json north-star — beyond the reference's surface).
  *
  * Everything keys off a *content-derived* pseudo-random key, never row
  * position: `df.sample()` changes membership whenever partitioning or
  * upstream ordering changes, which silently breaks train/test hygiene on
  * re-runs. A hash of the row's stable id gives the same sample on every
  * run, every cluster size, every file layout.
  *
  * Scale notes: [[bernoulli]] and [[splitLabel]] are map-side only (no
  * shuffle — the filter/label is evaluated inside the scan stage);
  * [[stratifiedTopK]] is one shuffle on the strata columns, and the
  * row_number window never sees more than one stratum.
  */
object Sampling {

  /** Key space modulus (large prime — keys are uniform in [0, Modulus)). */
  val Modulus: Long = 1000000007L

  /** Knuth's multiplicative-hash constant (TAOCP vol. 3 §6.4). */
  val Knuth: Long = 2654435761L

  /** Deterministic pseudo-random key in [0, Modulus) from a bounded integer
    * id, by multiplicative hashing. Plain integer arithmetic so a SQL oracle
    * can replicate it bit-for-bit. The product overflows a long above
    * ~3.4e9 ids (and Spark 4 ANSI mode would throw, not wrap) — for
    * unbounded or non-integer keys use [[hashKey]].
    */
  def modKey(id: Column, seed: Long = 1L): Column =
    pmod(id.cast("long") * lit(Knuth) + lit(seed), lit(Modulus))

  /** Production-scale key: xxhash64 over any columns, folded into
    * [0, Modulus). Not replicable by an external SQL engine (rows-only
    * verification), but safe for arbitrary key types and cardinalities.
    */
  def hashKey(cols: Column*): Column = pmod(xxhash64(cols: _*), lit(Modulus))

  /** Bernoulli sample: keep rows whose key falls below `fraction` of the
    * key space. Deterministic, map-side, and monotone: the `fraction=0.1`
    * sample is a subset of the `fraction=0.2` sample (nested samples — the
    * standard trick for scaling a training subset up without resampling).
    */
  def bernoulli(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction ($fraction) must be in [0, 1]")
    df.filter(key < lit(math.round(Modulus * fraction)))
  }

  /** Mixture resampling: keep each row with a per-source rate (training
    * data mixing — up/down-weight corpora toward a target mixture). Same
    * nested-monotone deterministic key as [[bernoulli]], so raising a
    * source's rate only ADDS documents (never churns the existing subset),
    * and the whole thing is one map-side predicate — no shuffle, no
    * per-source jobs.
    */
  def mixtureSample(df: DataFrame, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double,
      key: Column): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "mixture rates must be in [0, 1]")
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(Modulus * defaultRate))) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(math.round(Modulus * r))).otherwise(acc)
    }
    df.filter(key < threshold)
  }

  /** Exactly `k` rows per stratum, chosen by ascending deterministic key
    * (ties broken by `tieBreak` so the pick is total-ordered). Strata with
    * fewer than `k` rows keep all of them.
    */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], k: Int, key: Column,
      tieBreak: Seq[Column]): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val w = Window.partitionBy(strata.map(col).toIndexedSeq: _*)
      .orderBy((key +: tieBreak).toIndexedSeq: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Weighted split label ("train"/"val"/"test", or any labels) from a
    * deterministic key: contiguous key ranges sized by the weights. Every
    * row gets exactly one label; weights must sum to 1.
    */
  def splitLabel(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty, "at least one split label required")
    require(weights.forall(_._2 >= 0), s"negative weight in $weights")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    val bounds = weights.map(_._1).zip(cum.map(f => math.round(Modulus * f)))
    // the last label is the unconditional fallback so rounding at the top
    // boundary can never leave a row unlabeled
    bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((label, upper), acc) => when(key < upper, lit(label)).otherwise(acc)
    }
  }

  /** Split thresholds as absolute key bounds — exposed so SQL oracles are
    * generated from the SAME rounding as [[splitLabel]], not re-derived.
    */
  def splitBounds(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    weights.map(_._1).zip(cum.map(f => math.round(Modulus * f)))
  }
}
