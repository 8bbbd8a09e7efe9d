package graft.northstar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ParquetTable

/** Tombstoned deletes for the persisted ANN indexes — the FAISS
  * `remove_ids` analog ([[IvfIndex.remove]] / [[IvfPqIndex.remove]]),
  * shared by both index layouts so the two cannot drift.
  *
  * Why tombstones and not eager rewrites: a 100 TB corpus sees takedown-
  * and dedup-driven deletes continuously, and each one lands in whatever
  * inverted list holds the vector — eagerly rewriting a multi-GB list
  * per deleted id is the pathological small-write shape. Instead:
  *
  *  - [[add]] (the `remove` path) appends the ids to a tiny versioned
  *    `_tombstones` table under the index root — O(|ids|), no list
  *    touched. The underscore name keeps it invisible to the index
  *    table's own readers, and [[ParquetTable.vacuum]] only collects
  *    `v_*` dirs, so the side table survives index version churn.
  *  - Searches anti-join the (broadcast-sized, bounded by compaction
  *    policy) tombstone set AFTER cell pruning — deleted ids can never
  *    surface, at the cost of one broadcast hash anti-join over the
  *    probed rows only.
  *  - Compaction ([[IvfIndex.compact]] / [[IvfPqIndex.compact]]) folds
  *    the tombstones into the lists physically: only the cells that
  *    actually hold tombstoned ids are rewritten
  *    ([[ParquetTable.replacePartitions]] — every untouched list rides
  *    along as a hard link), then the tombstone table is cleared. The
  *    ordering is crash-safe in the non-resurrecting direction: lists
  *    first, tombstones second — a crash in between leaves tombstones
  *    masking already-deleted rows (the anti-join no-ops; the next
  *    compact clears them), whereas the reverse order could resurface a
  *    deleted vector.
  *
  * Correctness never depends on compaction timing: logical (tombstoned)
  * and physical (compacted) states answer every search identically —
  * the spec pins search-after-delete ≡ fresh-build-on-survivors both
  * before and after compact, and across a cold reload.
  */
private[graft] object AnnDeletes {

  /** Side-table directory under the index root (underscore-prefixed:
    * ignored by the index table's file listing and by vacuum).
    */
  val Dir = "_tombstones"

  /** Session conf bounding the tombstone set (rows): when a
    * [[IvfIndex.remove]]/[[IvfPqIndex.remove]] leaves the side table at
    * or above this count, the remove auto-compacts — so the broadcast
    * [[alive]] ships is BOUNDED IN CODE, not by operator discipline. The
    * default (64 Ki ids ≈ 0.5 MB of longs) keeps the anti-join build
    * side far under any broadcast threshold while letting a takedown
    * burst amortize many deletes per list rewrite. Deployments trading
    * rewrite frequency against broadcast size tune the conf; a manual
    * [[IvfIndex.compact]] on a maintenance window still works as before.
    */
  val ThresholdConf = "graft.ann.autoCompactTombstones"
  val DefaultThreshold = 65536L

  def compactThreshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdConf).map(_.toLong)
      .getOrElse(DefaultThreshold)

  /** True when the tombstone count has reached the auto-compact bound.
    * The count job is O(threshold) by induction — every prior remove
    * compacted at the bound, so the side table never exceeds it by more
    * than one batch of ids.
    */
  def overThreshold(spark: SparkSession, path: String): Boolean =
    read(spark, path).exists(_.count() >= compactThreshold(spark))

  def table(path: String): ParquetTable =
    new ParquetTable(s"$path/$Dir", captureStats = false)

  /** The tombstoned ids (column `neighbor_id`), if any were recorded. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val t = table(path)
    if (t.exists) Some(t.read(spark)) else None
  }

  /** Record `ids` (a one-column frame) as deleted — O(|ids|): one small
    * versioned append, no index list touched. Re-deleting an id is a
    * harmless duplicate (anti-join semantics).
    */
  def add(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val t = table(path)
    val d = ids.toDF("neighbor_id").distinct()
    if (t.exists) t.appendVersion(d) else t.overwrite(d)
    t.vacuum()
    ()
  }

  /** Drop `ids` from the tombstone set (the delete-then-append path:
    * a re-added id must stop masking its NEW row). No-op without a
    * tombstone table.
    */
  def removeIds(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val t = table(path)
    if (t.exists) {
      // COW versioning makes read-while-overwrite safe: the new version
      // is written from the old version's files, then the pointer swaps
      val remaining = t.read(spark)
        .join(ids.toDF("neighbor_id").distinct(), Seq("neighbor_id"),
          "left_anti")
      t.overwrite(remaining)
      t.vacuum()
      ()
    }
  }

  /** Clear every tombstone (post-compaction). Keeps the table existing
    * with zero rows so a concurrent reader never sees a vanished table.
    */
  def clear(spark: SparkSession, path: String): Unit = {
    val t = table(path)
    if (t.exists) {
      t.overwrite(t.read(spark).limit(0))
      t.vacuum()
      ()
    }
  }

  /** Search-side mask: `rows` minus the tombstoned ids. The tombstone
    * side is broadcast so the anti-join never shuffles the probed corpus
    * rows — and the broadcast is genuinely bounded: [[overThreshold]] is
    * checked by every `remove`, which auto-compacts at
    * [[compactThreshold]] rows, so the set here can never exceed the
    * bound by more than one remove batch.
    */
  def alive(rows: DataFrame, tombstones: Option[DataFrame]): DataFrame =
    tombstones.fold(rows)(t =>
      rows.join(broadcast(t.select(col("neighbor_id"))),
        Seq("neighbor_id"), "left_anti"))
}
