package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.gold.GoldIncremental
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
  * probe an isin-restricted pushdown scan — O(batch + FP) rows), and the
  * filter persists BEFORE the append commits — the superset contract
  * that makes a crash in the window harmless (stranded false positives,
  * never a double-append). An all-replay batch commits no silver version
  * and skips the advance entirely (the gold sidecars would no-op anyway:
  * versions unmoved).
  *
  * Scale: per trigger this is O(batch) intake + O(changes + affected
  * anchors) maintenance — never a full re-aggregate. A deployment
  * wanting coarser gold freshness moves `advanceAll` to its own timer
  * and lets several intake triggers accumulate; the applied-version
  * sidecars make that split safe (each advance folds every version
  * since the last one it applied).
  */
object GoldIncStream {

  /** Maintain the warehouse's five gold tables from a stream of silver
    * orders rows (silver schema, `id`-keyed). The silver tables must
    * already exist — customers/addresses as dimensions, orders seeded
    * with at least its schema-bearing initial commit.
    */
  def ordersIntakeStream(orders: DataFrame, warehouse: Warehouse,
      expectedIds: Long = 4L * 1024 * 1024): StreamingQuery =
    orders.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val silver = warehouse.silverByName("orders")
        val bloomPath = java.nio.file.Paths.get(silver.path,
          ReplayGate.BloomFile)
        val bloom = ReplayGate.loadOrSeed(bloomPath,
          () => Some(silver.read(s).select(col("id"))), "id", expectedIds)
        val incoming = batch.toDF().distinct() // in-batch re-sends
        val ids = incoming.select(col("id")).collect().map(_.get(0))
        val fresh = ReplayGate.freshRows(incoming, "id", ids.toIndexedSeq,
            Some(bloom), () => silver.read(s).select(col("id")))
          .persist()
        try {
          if (fresh.count() > 0) {
            val freshIds = fresh.select(col("id")).collect().map(_.get(0))
            // filter BEFORE the silver commit — the superset contract
            ReplayGate.addAndSave(bloomPath, bloom, freshIds.toIndexedSeq)
            silver.appendVersion(fresh)
            new GoldIncremental(s, warehouse).advanceAll()
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()
}
