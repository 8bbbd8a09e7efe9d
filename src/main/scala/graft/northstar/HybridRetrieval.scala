package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
  * two retrieval arms — the hybrid sparse+dense stack modern
  * decontamination-by-retrieval and training-example-attribution
  * pipelines run: BM25 ([[Bm25]]) catches lexical overlap that embedding
  * models smooth away, the dense arm catches paraphrases BM25 cannot
  * see, and RRF combines them using ONLY ranks, so the two arms'
  * incomparable score scales never need calibration.
  *
  * Exactness: the classic RRF contribution `1/(K + rank)` is rescaled to
  * integer micro-units `floor(1e6 / (K + rank))` — every contribution
  * and therefore every fused score is an exact BIGINT both engines agree
  * on bit-for-bit (the [[Bm25]] discipline). The floor-of-double-division
  * is provably the integer quotient: the true quotient's distance to the
  * next integer is a multiple of `1/(K + rank)`, which is ~9 orders of
  * magnitude wider than a double ulp at 1e6, so correctly-rounded
  * division can never cross an integer boundary.
  *
  * Scale shape: both inputs are top-k lists — (queries × k) rows, never
  * corpus-sized — so the full-outer fusion join and the per-query re-rank
  * window are candidate-sized exchanges regardless of corpus size. The
  * corpus-sized work lives entirely inside the arms (one shuffle in
  * [[Bm25.topK]]; the dense arm is brute-force cosine as the exact
  * baseline in q108, and the persisted partition-pruned [[IvfIndex]] as
  * the serving-scale arm in q112 — recall and RRF exactness gated in
  * [[graft.tools.Accuracy]]).
  */
object HybridRetrieval {
  /** The RRF smoothing constant; 60 is the value the original paper
    * fixed and every major engine (Elasticsearch, Vespa, Milvus) ships.
    */
  val RrfK = 60
  val Unit = 1000000L

  /** Integer micro-unit RRF contribution of a 1-based rank column; NULL
    * rank (document absent from that arm's list) contributes NULL, which
    * the fusion coalesces to 0.
    */
  def contribution(rank: Column): Column =
    floor(lit(Unit) / (lit(RrfK) + rank.cast("long"))).cast("long")

  /** Fuse two (query_id, doc_id, <arm>_rank) top-k lists. Returns
    * (query_id, doc_id, rrf_micro, sparse_rank, dense_rank, rank) with
    * rank re-assigned per query by (rrf_micro desc, doc_id) and cut at
    * `k`. A document present in both arms sums both contributions —
    * the agreement boost that makes RRF work.
    */
  def fuse(sparse: DataFrame, dense: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val s0 = sparse.select(col("query_id"), col("doc_id"),
      col("sparse_rank"))
    val d0 = dense.select(col("query_id"), col("doc_id"), col("dense_rank"))
    val fused = s0.join(d0, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(contribution(col("sparse_rank")), lit(0L)) +
          coalesce(contribution(col("dense_rank")), lit(0L)))
          .as("rrf_micro"),
        col("sparse_rank"), col("dense_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
