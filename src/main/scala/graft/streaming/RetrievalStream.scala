package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.ParquetTable
import graft.northstar.Bm25

/** Streaming maintenance of the BM25 retrieval statistics — the
  * serving-side mirror of [[Bm25.topK]]'s batch stage 1: a continuous
  * feed of documents lands its per-doc term statistics
  * ([[Bm25.docTermStats]]: length + each workload term's tf) in a
  * versioned stats table, O(batch) per trigger — each document's stats
  * row depends on that document alone, so a batch's rows are computed
  * batch-locally and appended, never recomputing earlier corpus; the
  * corpus-level quantities (N, avgdl, df) that DO span the corpus are
  * deliberately NOT materialized — [[Bm25.scoreAndRank]] derives them
  * with one aggregate over the stats table at query time, so they can
  * never lag the per-doc rows they summarize.
  *
  * Scoring over the maintained table is therefore IDENTICAL to the
  * batch pipeline by construction: `scoreAndRank(statsTable.read(s),
  * queries, k)` ≡ `Bm25.topK(corpus, ...)` for the corpus ingested so
  * far — StreamingSpec pins the law, replays included.
  *
  * Replay absorption is the [[ReplayGate]] contract (the IndexStream /
  * GoldIncStream shape): a Bloom filter of seen doc ids at the stats
  * table's root gates the anti-join probe (all-fresh batches never read
  * the id column at all), and the filter persists BEFORE the append
  * commits — a crash in the window strands false positives, never
  * double-appends a document's stats. An all-replay batch commits no
  * version.
  *
  * The term workload is FIXED at stream start (the [[Bm25]] contract —
  * stats columns are per-term): widening the workload is a stats-table
  * rebuild (or a backfill through `appendVersion` schema evolution plus
  * a one-off recompute of the new column for old rows), stated here
  * rather than hidden.
  */
object RetrievalStream {

  /** Maintain `statsTable` from a stream of (idCol, textCol) document
    * rows. Bootstraps the table from the first fresh-bearing batch.
    */
  def statsIntakeStream(docs: DataFrame, statsTable: ParquetTable,
      idCol: String, textCol: String, terms: Seq[String],
      expectedIds: Long = 16L * 1024 * 1024,
      expectedBatch: Long = ReplayGate.DefaultProbeBatch): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val bloomPath = java.nio.file.Paths.get(statsTable.path,
          ReplayGate.BloomFile)
        val bloom = ReplayGate.loadOrSeed(bloomPath,
          () => if (statsTable.exists)
            Some(statsTable.read(s).select(col("doc_id")))
          else None,
          "doc_id", expectedIds)
        val incoming = batch.toDF()
          .select(col(idCol).as("doc_id"), col(textCol).as(textCol))
          .dropDuplicates("doc_id") // in-batch re-sends
        val sketch = ReplayGate.probeSketch(incoming, "doc_id", expectedBatch)
        val fresh = ReplayGate.freshRows(incoming, "doc_id", Some(bloom),
            Some(sketch),
            () => statsTable.read(s).select(col("doc_id")))
          .persist()
        try {
          val n = fresh.count()
          if (n > 0) {
            // filter BEFORE the stats commit — the superset contract
            ReplayGate.commitToFilter(bloomPath, bloom, fresh, "doc_id", n,
              expectedIds, () => if (statsTable.exists)
                Some(statsTable.read(s).select(col("doc_id"))) else None)
            val stats = Bm25.docTermStats(fresh, "doc_id", textCol, terms)
            if (statsTable.exists) { statsTable.appendVersion(stats); () }
            else { statsTable.overwrite(stats); () }
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()
}
