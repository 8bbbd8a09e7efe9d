package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.ParquetTable
import graft.northstar.SeqPack

/** Streaming sequence-packing maintenance — the mirror that closes q98's
  * loop: documents stream in, and the packed-corpus table (doc →
  * training-sequence assignment) stays current without ever repacking
  * the whole corpus.
  *
  * Packing is ORDER-SENSITIVE within a bucket (greedy in doc_id order),
  * so it is not insert-monotone: a late-arriving document with a
  * mid-bucket id legitimately REASSIGNS its bucket-mates' sequences.
  * The maintenance grain is therefore the BUCKET — exactly the
  * incremental-recompute granularity [[SeqPack]]'s bucket independence
  * buys: per micro-batch, only the buckets TOUCHED by genuinely-new
  * documents are repacked (a partition-PRUNED read of the doc log), and
  * the packed table commits via
  * [[ParquetTable.replacePartitions]] — the touched partitions are
  * rewritten, every other partition's files ride along as hard links.
  * Per trigger the WRITE work is O(batch + touched-bucket docs), never
  * O(corpus); the one corpus-sized touch is the replay anti-join's
  * column-pruned scan of logged doc ids — at serving scale that probe
  * rides a bloom filter of seen ids (q75's `BloomMightContain` is the
  * kernel), the same caveat [[IndexStream]] documents.
  *
  * Replay/duplicate absorption follows the set-valued contract of the
  * other mirrors: new docs are anti-joined against the LOG (the
  * seen-marker and the packing input are the same table, so they cannot
  * desynchronize); an all-replay batch touches no bucket and commits no
  * version to either table. StreamingSpec proves stream ≡ batch repack
  * across out-of-order and replayed batches.
  */
object PackStream {

  /** Maintain `log` (the accumulated docs, bucket-partitioned) and
    * `packed` (per-doc sequence assignments, bucket-partitioned) from a
    * stream of (doc_id, text) rows. Both tables are created on first
    * data.
    */
  def packingStream(docs: DataFrame, log: ParquetTable, packed: ParquetTable,
      budget: Int, bucketSize: Int): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val incoming = batch.toDF()
          .select(col("doc_id").cast("long").as("doc_id"), col("text"),
            expr(s"CAST(doc_id AS BIGINT) DIV $bucketSize").as("bucket"))
          .dropDuplicates("doc_id") // in-batch re-sends
        val fresh =
          (if (log.exists)
            incoming.join(log.read(s).select("doc_id"), Seq("doc_id"),
              "left_anti")
          else incoming).persist()
        try {
          if (fresh.count() > 0) {
            if (log.exists) log.appendVersion(fresh)
            else log.overwrite(fresh)
            val touched = fresh.select(col("bucket")).distinct()
              .collect().map(_.getLong(0))
            // partition-pruned: only the touched buckets are re-read
            val slice = log.read(s)
              .filter(col("bucket").isin(touched.map(Long.box): _*))
            val repacked = SeqPack
              .packGreedy(slice, "doc_id", "text", budget, bucketSize)
              .toDF()
              .select(col("doc_id"), col("seq"), col("n_tokens"),
                col("bucket")) // partition column last, Spark convention
            if (packed.exists) packed.replacePartitions(repacked)
            else packed.overwrite(repacked)
            ()
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()
}
