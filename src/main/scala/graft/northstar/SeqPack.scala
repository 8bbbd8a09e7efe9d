package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the batch-construction stage of LLM
  * training: documents are concatenated back-to-back into fixed
  * token-budget SEQUENCES (context-length rows), so short documents
  * don't waste padding and the trainer sees dense batches (the packing
  * step of GPT-style pretraining pipelines; cf. Raffel et al. 2020 §2.2,
  * Krell et al. 2021 on packed-sequence efficiency).
  *
  * Determinism + distribution: a strictly sequential greedy pack over
  * the whole corpus cannot be parallelized, so the corpus is packed in
  * COARSE BUCKETS (bucket = doc_id DIV bucketSize), each bucket greedily
  * packed independently in doc_id order. That is the standard
  * distributed-packing trade: embarrassingly parallel at any corpus size
  * — ONE shuffle on the bucket key — at the cost of at most one
  * under-filled trailing sequence per bucket vs the global sequential
  * pack. Sequence identity is the (bucket, seq) pair, deterministic
  * across runs, partitionings and cluster sizes.
  *
  * The greedy recurrence (shared verbatim by the q98 DuckDB oracle's
  * recursive CTE): the bucket's first document opens sequence 0 with
  * fill = n; each later document joins the current sequence iff
  * fill + n ≤ budget, else opens the next with fill = n. A document
  * LARGER than the budget thus ends up in a singleton sequence — this
  * operator never splits documents (token-window chunking is q59's job;
  * feed its output here to pack oversized docs too).
  *
  * The per-bucket loop is genuinely sequential state — the sanctioned
  * typed-group imperative slot (`flatMapSortedGroups`, the batch analog
  * of mapGroupsWithState), with everything before it codegen'd Column
  * algebra and everything after a plain rollup.
  */
object SeqPack {

  final case class PackedDoc(bucket: Long, seq: Long, doc_id: Long,
      n_tokens: Int)

  /** Pack `docs` greedily into (bucket, seq) sequences of at most
    * `budget` whitespace tokens ([[TextAnalysis.tokenCount]]), buckets
    * of `bucketSize` consecutive doc ids packed independently.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, bucketSize: Int): Dataset[PackedDoc] = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    require(bucketSize >= 1, s"bucketSize=$bucketSize must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        expr(s"CAST($idCol AS BIGINT) DIV $bucketSize").as("bucket"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .as[(Long, Long, Int)]
      .groupByKey(_._2)
      .flatMapSortedGroups(col("doc_id")) { (bucket, rows) =>
        var started = false
        var seq = 0L
        var fill = 0
        rows.map { case (docId, _, n) =>
          if (!started) { started = true; fill = n }
          else if (fill.toLong + n > budget) { seq += 1; fill = n }
          else fill += n
          PackedDoc(bucket, seq, docId, n)
        }
      }
  }

  /** Per-sequence census — the packing-quality observable a pipeline
    * monitors (fill efficiency, docs per sequence) and what q98
    * hash-checks: every document's sequence assignment is pinned through
    * the first/last ids and exact token fill.
    */
  def sequenceCensus(packed: Dataset[PackedDoc]): DataFrame =
    packed.groupBy(col("bucket"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  final case class PackedGroupDoc(group: String, bucket: Long, seq: Long,
      doc_id: Long, n_tokens: Int)

  /** [[packGreedy]] with an extra GROUP key (e.g. a train/val/test
    * split): sequences never cross groups — a training batch must not
    * mix split material — so each (group, bucket) cell packs
    * independently, same one-shuffle shape with a composite key.
    */
  def packGreedyGrouped(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, bucketSize: Int, groupCol: String): Dataset[PackedGroupDoc] = {
    require(budget >= 1 && bucketSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("doc_id"),
        expr(s"CAST($idCol AS BIGINT) DIV $bucketSize").as("bucket"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .as[(String, Long, Long, Int)]
      .groupByKey(r => (r._1, r._3))
      .flatMapSortedGroups(col("doc_id")) { case ((group, bucket), rows) =>
        var started = false
        var seq = 0L
        var fill = 0
        rows.map { case (_, docId, _, n) =>
          if (!started) { started = true; fill = n }
          else if (fill.toLong + n > budget) { seq += 1; fill = n }
          else fill += n
          PackedGroupDoc(group, bucket, seq, docId, n)
        }
      }
  }
}
