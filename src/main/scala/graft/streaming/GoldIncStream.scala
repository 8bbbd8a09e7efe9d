package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.gold.{GoldIncremental, GoldMaintenance}
import graft.pipeline.Warehouse

/** Streaming maintenance of the five reference gold tables — the
  * serving-side composition of the intake and IVM stories: a continuous
  * feed of silver orders rows lands in the silver table through
  * `foreachBatch` (one [[graft.io.ParquetTable.appendVersion]] commit
  * per fresh-bearing batch) and [[GoldIncremental]] advances all five
  * gold tables from the resulting change feed — the SAME affected-anchor
  * fold the batch path runs, so stream and batch cannot diverge in
  * semantics, only in commit cadence.
  *
  * Replay absorption is id-keyed like [[IndexStream]]: a [[ReplayGate]]
  * Bloom filter at the silver table's root gates the anti-join probe
  * (all-fresh batches never read the id column at all; maybe-seen ids
  * probe a range+sketch-restricted pushdown scan, all executor-side —
  * O(batch + FP) rows, no driver-side id array), and the filter persists
  * BEFORE the append commits — the superset contract that makes a crash
  * in the window harmless (stranded false positives, never a
  * double-append).
  *
  * Crash healing: every trigger FIRST runs `advanceAll` — a crash
  * between `silver.appendVersion` and the advance leaves silver ahead of
  * gold, and the replayed batch then gates to ZERO fresh rows, so a
  * fresh-conditional advance would leave gold stale until the next
  * fresh-bearing batch (the PackStream.recover window). The steady-state
  * cost of the unconditional heal is pointer reads: each gold table
  * compares its applied-versions sidecar to the live silver versions and
  * no-ops when they match.
  *
  * Scale: per trigger this is O(batch) intake + O(changes + affected
  * anchors) maintenance — never a full re-aggregate. A deployment
  * wanting coarser gold freshness moves `advanceAll` to its own timer
  * and lets several intake triggers accumulate; the applied-version
  * sidecars make that split safe (each advance folds every version
  * since the last one it applied).
  */
object GoldIncStream {

  /** The percentile gold the EXTENDED mirror maintains (delivery-time
    * distribution per order month) — named here so stream and spec
    * derive the same columns; the p-list is q116's.
    */
  val DeliveryPercentileGold = "orders_delivery_percentiles"
  val DeliveryPercentiles: Seq[(String, Int, Int)] =
    Seq(("p50", 50, 100), ("p95", 95, 100))

  /** Advance every maintained gold table to the silver tables' live
    * versions — the five reference tables always; with
    * `extendedMeasures` also the two non-additive measure kinds:
    * the HLL distinct fold ([[GoldIncremental.customerReachByCity]],
    * q111's machinery) and the signed-foldable percentile histogram
    * ([[GoldMaintenance.advancePercentile]], q116's) over the silver
    * orders commit stream. All three families share the same
    * applied-version sidecar discipline, so a replayed trigger
    * no-ops with ZERO version churn on every table.
    */
  private def advanceGold(s: org.apache.spark.sql.SparkSession,
      warehouse: Warehouse, extendedMeasures: Boolean): Unit = {
    val inc = new GoldIncremental(s, warehouse)
    inc.advanceAll()
    if (extendedMeasures) {
      inc.customerReachByCity()
      GoldMaintenance.advancePercentile(s,
        warehouse.silverByName("orders"),
        warehouse.gold(DeliveryPercentileGold),
        keys = Seq("year", "month"),
        value = datediff(col("delivered_on"), col("created_on")),
        ps = DeliveryPercentiles)
    }
  }

  /** Maintain the warehouse's five gold tables from a stream of silver
    * orders rows (silver schema, `id`-keyed). The silver tables must
    * already exist — customers/addresses as dimensions, orders seeded
    * with at least its schema-bearing initial commit. With
    * `extendedMeasures`, the distinct (HLL) and percentile measure
    * kinds ride the same trigger — see [[advanceGold]].
    */
  def ordersIntakeStream(orders: DataFrame, warehouse: Warehouse,
      expectedIds: Long = 4L * 1024 * 1024,
      expectedBatch: Long = ReplayGate.DefaultProbeBatch,
      extendedMeasures: Boolean = false): StreamingQuery =
    orders.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        // self-heal the appendVersion→advance crash window BEFORE gating:
        // versions unmoved → sidecar compares only, no jobs
        advanceGold(s, warehouse, extendedMeasures)
        val silver = warehouse.silverByName("orders")
        val bloomPath = java.nio.file.Paths.get(silver.path,
          ReplayGate.BloomFile)
        val bloom = ReplayGate.loadOrSeed(bloomPath,
          () => Some(silver.read(s).select(col("id"))), "id", expectedIds)
        val incoming = batch.toDF().distinct() // in-batch re-sends
        val sketch = ReplayGate.probeSketch(incoming, "id", expectedBatch)
        val fresh = ReplayGate.freshRows(incoming, "id", Some(bloom),
            Some(sketch), () => silver.read(s).select(col("id")))
          .persist()
        try {
          val n = fresh.count()
          if (n > 0) {
            // filter BEFORE the silver commit — the superset contract
            ReplayGate.commitToFilter(bloomPath, bloom, fresh, "id", n,
              expectedIds, () => Some(silver.read(s).select(col("id"))))
            silver.appendVersion(fresh)
            advanceGold(s, warehouse, extendedMeasures)
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()

  /** CDC intake: maintain the gold tables from a stream of orders
    * CHANGE events, not just inserts — rows in the silver orders schema
    * plus a string `_op` column (`upsert` | `delete`). Each trigger
    * applies the batch as one keyed merge (deletes anti-joined out,
    * upserts through [[graft.merge.MergeOps.upsertWithFeed]] — the S9
    * machinery, so the written `_changes/` feed is the EXACT delta) and
    * commits via `overwriteWithChanges`; the gold IVM then advances
    * O(changes) off the feed like every other write path.
    *
    * Replay absorption is SEMANTIC here, not id-gated: re-upserting an
    * identical row image and re-deleting an absent id both produce an
    * EMPTY exact feed, and an empty feed skips the commit entirely —
    * a pure-replay trigger leaves silver AND every gold table at their
    * versions (the same zero-churn contract as the insert-only intake,
    * reached through merge exactness instead of a Bloom gate).
    * Conflicting upsert images for one id within one batch resolve
    * deterministically to the greatest full-row tuple (a CDC source
    * with an ordering column should collapse to the latest image
    * upstream — arrival order inside a shuffled batch is not a
    * sequence).
    *
    * Scale trade, recorded: the merge REWRITES the silver snapshot per
    * fresh-bearing trigger (O(|snapshot| + |batch|) — the cost of
    * full-tuple merge on plain parquet; Delta's MERGE pays the same on
    * touched files). The feed keeps every DOWNSTREAM consumer
    * O(changes); a deployment where the rewrite dominates batches the
    * CDC stream into coarser triggers.
    */
  def ordersCdcStream(cdc: DataFrame, warehouse: Warehouse,
      extendedMeasures: Boolean = false): StreamingQuery =
    cdc.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        // self-heal the commit→advance crash window first (see
        // ordersIntakeStream): versions unmoved → sidecar reads only
        advanceGold(s, warehouse, extendedMeasures)
        val silver = warehouse.silverByName("orders")
        val b = batch.toDF().distinct() // exact re-sends collapse
        val dataCols = b.columns.filter(_ != "_op").toIndexedSeq
        val ups0 = b.filter(col("_op") === "upsert").drop("_op")
        // deterministic single image per id (greatest full tuple wins)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(struct(dataCols.map(col): _*).desc)
        val ups = ups0
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val delIds = b.filter(col("_op") === "delete")
          .select(col("id")).distinct()
        val current = silver.read(s)
        val afterDel = current.join(delIds, Seq("id"), "left_anti")
        val delFeed = current.join(delIds, Seq("id"), "left_semi")
          .withColumn("_change_type", lit("delete"))
        val (merged, upsFeed) =
          graft.merge.MergeOps.upsertWithFeed(afterDel, ups, Seq("id"))
        val feed = delFeed.unionByName(upsFeed).persist()
        try {
          if (!feed.isEmpty) {
            silver.overwriteWithChanges(merged, feed)
            advanceGold(s, warehouse, extendedMeasures)
          } // empty exact feed == semantic no-op: zero version churn
        } finally {
          feed.unpersist()
          ()
        }
      }
      .start()
}
