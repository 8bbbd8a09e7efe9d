package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4 / the 100 TB design notes).
  *
  * AQE's skew-join handling covers sort-merge joins; salting is the manual
  * fallback for the cases AQE can't split (e.g. a hot key whose rows must
  * co-group, broadcast-ineligible dimension sides). The big side scatters
  * each row into one of `saltBuckets` sub-keys; the small side replicates
  * every row across all buckets, so the join key becomes (key, salt) and a
  * hot key's rows spread over `saltBuckets` tasks.
  */
object SkewJoin {

  /** Deterministic scatter: salt derived by hashing the big side's whole
    * row (stable across retries — no RNG).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // join types that preserve unmatched small-side rows would emit
    // saltBuckets null-padded copies of each (the small side is replicated)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves semantics only for inner/left joins, got $joinType")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltBuckets))
        .cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
