package graft.streaming

import org.apache.spark.sql.{Dataset, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.northstar.{IvfIndex, IvfPqIndex}

/** Streaming ANN-index maintenance — the serving-side mirror of the
  * corpus/event streams: a continuous feed of new embedding rows grows a
  * persisted [[IvfIndex]] (or the coded [[IvfPqIndex]]) through
  * `foreachBatch` + the index's `append`. The quantizer state is
  * train-once (FAISS's `add` contract), so each micro-batch only assigns
  * its vectors to the existing centroids (and, for IVFADC, residual-
  * encodes with the existing codebooks) and hard-link-appends the
  * inverted lists — O(batch) per trigger however large the accumulated
  * corpus.
  *
  * Replay/duplicate absorption is SET-VALUED like every other streaming
  * mirror here: a batch anti-joins the already-indexed ids before
  * appending, so Structured Streaming's at-least-once `foreachBatch`
  * redelivery cannot double-insert a vector. (Contract: `idCol` uniquely
  * identifies a vector and re-sends carry identical payloads — the same
  * id-keyed contract as the batch merges.) The probe rides a
  * [[ReplayGate]] Bloom filter of indexed ids kept at the index table's
  * root: the common all-fresh batch never touches the indexed-ids column
  * at all, and a replay-bearing batch probes only its maybe-seen ids
  * (range + sketch-restricted scan — O(batch + FP) rows, not O(index)).
  * The filter is updated BEFORE the append commits ([[ReplayGate]]'s
  * superset contract: a crash in between strands harmless false
  * positives, never index-ids missing from the filter, which would
  * re-append on replay); a filter-less pre-gate index seeds the filter
  * from the full id column once.
  */
object IndexStream {

  /** The one replay-gated append choreography both index layouts share
    * (kept single-sourced so a gate change is one edit, not a per-mirror
    * migration): `open` resolves the persisted index per trigger and
    * returns (knownIds reader, append action).
    */
  private def gatedAppendStream(vectors: DataFrame, idCol: String,
      vecCol: String, path: String, expectedIds: Long, expectedBatch: Long,
      open: SparkSession => (() => DataFrame, DataFrame => Unit)):
      StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val s = batch.sparkSession
        val (knownIds, append) = open(s)
        val bloomPath = java.nio.file.Paths.get(path, ReplayGate.BloomFile)
        val bloom = ReplayGate.loadOrSeed(bloomPath, () => Some(knownIds()),
          idCol, expectedIds)
        val incoming = batch.toDF().select(col(idCol), col(vecCol))
          .distinct() // in-batch re-sends of the same (id, vector)
        val sketch = ReplayGate.probeSketch(incoming, idCol, expectedBatch)
        // persisted across the emptiness probe and the append: without it
        // the branch and the append each re-run the (gated) probe
        val fresh = ReplayGate.freshRows(incoming, idCol, Some(bloom),
            Some(sketch), knownIds)
          .persist()
        try {
          // an all-replay batch appends nothing — and creates no version
          val n = fresh.count()
          if (n > 0) {
            // filter BEFORE the index commit — see the superset contract
            ReplayGate.commitToFilter(bloomPath, bloom, fresh, idCol, n,
              expectedIds, () => Some(knownIds()))
            append(fresh)
          }
        } finally {
          fresh.unpersist()
          ()
        }
      }
      .start()

  /** Maintain the persisted index at `path` from a stream of
    * (id, vector) rows. The seed index must already exist
    * ([[IvfIndex.build]] + persist on the initial corpus) — centroids are
    * trained once there and never refit here. `expectedIds` sizes the
    * replay-gate Bloom filter.
    */
  /** The known-id set the replay gate dedupes against: the index's
    * physical rows MINUS the tombstoned ids. A tombstone-masked id must
    * read as UNKNOWN here — a producer re-sending a deleted id is a
    * re-add, and treating it as "already indexed" would drop it and
    * leave it masked forever; letting it through lands it in `append`,
    * whose delete-then-append path compacts first (the documented
    * contract). The Bloom filter still remembering the id is harmless:
    * it only routes the row to this log probe, which now misses.
    */
  private def aliveIds(s: SparkSession, path: String, rows: DataFrame,
      idCol: String): DataFrame =
    graft.northstar.AnnDeletes.alive(rows,
        graft.northstar.AnnDeletes.read(s, path))
      .select(col("neighbor_id").as(idCol))

  def ivfAppendStream(vectors: DataFrame, idCol: String,
      vecCol: String, path: String,
      expectedIds: Long = 4L * 1024 * 1024,
      expectedBatch: Long = ReplayGate.DefaultProbeBatch): StreamingQuery =
    gatedAppendStream(vectors, idCol, vecCol, path, expectedIds,
        expectedBatch, { s =>
      val idx = IvfIndex.load(s, path).getOrElse(sys.error(
        s"ivfAppendStream: no persisted index at $path — " +
          "build and persist the seed index first"))
      (() => aliveIds(s, path, idx.assigned, idCol),
        (fresh: DataFrame) => { idx.append(s, path, fresh, idCol, vecCol); () })
    })

  /** The coded-layout mirror of [[ivfAppendStream]]: maintain a
    * persisted [[IvfPqIndex]] (IVFADC) from a stream of (id, vector)
    * rows via [[IvfPqIndex.append]] — centroids AND residual codebooks
    * are train-once (the seed index fixes them), so each micro-batch
    * only assigns, residual-encodes and hard-link-appends — O(batch)
    * per trigger.
    */
  def ivfPqAppendStream(vectors: DataFrame, idCol: String,
      vecCol: String, path: String,
      expectedIds: Long = 4L * 1024 * 1024,
      expectedBatch: Long = ReplayGate.DefaultProbeBatch): StreamingQuery =
    gatedAppendStream(vectors, idCol, vecCol, path, expectedIds,
        expectedBatch, { s =>
      val idx = IvfPqIndex.load(s, path).getOrElse(sys.error(
        s"ivfPqAppendStream: no persisted index at $path — " +
          "build and persist the seed index first"))
      (() => aliveIds(s, path,
          new graft.io.ParquetTable(path, partitionColumns = Seq("cell"))
            .read(s), idCol),
        (fresh: DataFrame) => { idx.append(s, path, fresh, idCol, vecCol); () })
    })
}
