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

  /** Positional scatter: salt from the row's position
    * (`monotonically_increasing_id`), NOT a content hash. A content hash
    * sends byte-identical duplicate rows of a hot key — the single most
    * common skew shape (log duplication, default-valued rows) — all to ONE
    * bucket, defeating the operator exactly when it's needed; it also
    * cannot cover map-typed columns (xxhash64 rejects MapType). Position
    * spreads every copy round-robin. The salt VALUE is not stable under a
    * reshuffled upstream, which is benign here: correctness never depends
    * on which bucket a row takes (the small side is replicated into all of
    * them), only the spread does.
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
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
        .cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
