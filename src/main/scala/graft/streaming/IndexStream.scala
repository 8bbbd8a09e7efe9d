package graft.streaming

import org.apache.spark.sql.{Dataset, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.northstar.IvfIndex

/** Streaming ANN-index maintenance — the serving-side mirror of the
  * corpus/event streams: a continuous feed of new embedding rows grows a
  * persisted [[IvfIndex]] through `foreachBatch` + [[IvfIndex.append]].
  * The quantizer is train-once (FAISS's `add` contract), so each
  * micro-batch only assigns its vectors to the existing centroids and
  * hard-link-appends the inverted lists — O(batch) per trigger however
  * large the accumulated corpus.
  *
  * Replay/duplicate absorption is SET-VALUED like every other streaming
  * mirror here: a batch anti-joins the already-indexed ids before
  * appending, so Structured Streaming's at-least-once `foreachBatch`
  * redelivery cannot double-insert a vector. (Contract: `idCol` uniquely
  * identifies a vector and re-sends carry identical payloads — the same
  * id-keyed contract as the batch merges.) The ids-only probe of the
  * index is column-pruned to the id column; at serving scale the same
  * check would ride a bloom filter of indexed ids, which q75's
  * `BloomMightContain` already provides the kernel for.
  */
object IndexStream {

  /** Maintain the persisted index at `path` from a stream of
    * (id, vector) rows. The seed index must already exist
    * ([[IvfIndex.build]] + persist on the initial corpus) — centroids are
    * trained once there and never refit here.
    */
  def ivfAppendStream(vectors: DataFrame, idCol: String,
      vecCol: String, path: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val idx = IvfIndex.load(s, path).getOrElse(sys.error(
          s"ivfAppendStream: no persisted index at $path — " +
            "build and persist the seed index first"))
        val known = idx.assigned.select(col("neighbor_id").as(idCol))
        // persisted across the emptiness probe and the append: without it
        // the branch and the append each re-run the anti-join, scanning
        // the full indexed-ids column twice per trigger
        val fresh = batch.toDF().select(col(idCol), col(vecCol))
          .distinct() // in-batch re-sends of the same (id, vector)
          .join(known, Seq(idCol), "left_anti")
          .persist()
        try {
          // an all-replay batch appends nothing — and creates no version
          if (fresh.count() > 0) {
            idx.append(s, path, fresh, idCol, vecCol)
            ()
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()
}
