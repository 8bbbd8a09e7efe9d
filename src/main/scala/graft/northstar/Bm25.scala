package graft.northstar

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval (Robertson & Walker 1994; the Okapi weighting) over a
  * whitespace-tokenized corpus, specialized to a FIXED query workload —
  * the batch "retrieve top-k for these probes" shape that benchmark
  * decontamination and training-example attribution pipelines run, not
  * an online search index.
  *
  * Two deliberate exactness choices, following q47's cross-engine
  * discipline:
  *   - the idf is the RATIONAL Robertson–Spärck Jones core
  *     `(N - df + 0.5) / (df + 0.5) + 1` (Lucene's idf argument without
  *     the `ln`): per-term ranking is monotone-identical to the ln
  *     variant, and two engines' `ln` libms are not guaranteed to agree
  *     in the last ulp;
  *   - each per-term weight is rounded to integer MICRO-units before the
  *     cross-term sum, so the aggregate is an exact BIGINT sum — a
  *     double sum would expose the engine's aggregation order (float
  *     addition is not associative) to the hash compare.
  *
  * Scale shape: ONE corpus-wide shuffle (the per-doc conditional-tf
  * aggregate — the query term set rides INSIDE the aggregate
  * expressions, so there is no token×term join and no second corpus
  * scan for document lengths); corpus statistics (N, total length,
  * per-term df) are one aggregate over that relation, broadcast back as
  * a single row. The per-query top-k window shuffles only MATCHED docs
  * on query_id — with a handful of probes that is a candidate-sized
  * exchange, not a corpus-sized one.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75
  // the oracle SQL spells these as literals; computing 1.0 + K1 at
  // runtime could land on a different double than the parsed "2.2"
  val K1Plus1 = 2.2
  val OneMinusB = 0.25

  /** Per-query BM25 top-k. `queries` are (query_id, terms); terms absent
    * from the corpus contribute nothing (tf = 0 everywhere), so a probe
    * may mix known and unknown vocabulary. Returns (query_id, doc_id,
    * score_micro, rank) with score_micro = Σ_t round(1e6 · w_t) and rank
    * dense per query by (score desc, doc_id). Docs matching no term are
    * dropped (score 0). Terms must be lowercase token-safe ([a-z0-9]+):
    * they become column names and SQL literals in the oracle.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    // consumed twice (corpus stats + scoring); released below
    val stats = docTermStats(docs, idCol, textCol,
      queries.flatMap(_._2).distinct.sorted).persist()
    val result = scoreAndRank(stats, queries, k).persist()
    result.count() // materialize, then release the corpus-sized stats NOW
    stats.unpersist(blocking = false)
    result
  }

  /** Stage 1 — the ONE corpus-wide shuffle: per-doc length and every
    * query term's tf from a single conditional aggregate. (Split from
    * [[scoreAndRank]] so the plan-shape audit can census the stages the
    * eager [[topK]] materializes.)
    */
  def docTermStats(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z0-9]+")),
      s"query terms must be nonempty lowercase tokens: $terms")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), TextAnalysis.WsClass + "+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val statAggs = count(lit(1)).as("dl") +: terms.map(t0 =>
      sum(when(col("tok") === t0, 1L).otherwise(0L)).as(tfCol(t0)))
    toks.groupBy(col("doc_id")).agg(statAggs.head, statAggs.tail: _*)
  }

  private def tfCol(t: String) = s"__tf_$t"
  private def dfCol(t: String) = s"__df_$t"

  /** Stage 2 over [[docTermStats]]' output: the 1-row corpus-stats
    * broadcast, per-query micro scoring and the matched-docs-only top-k
    * window.
    */
  def scoreAndRank(stats: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val terms = queries.flatMap(_._2).distinct.sorted
    val corpusAggs = Seq(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("total_len")) ++
      terms.map(t0 => sum(when(col(tfCol(t0)) > 0, 1L).otherwise(0L))
        .cast("double").as(dfCol(t0)))
    val corpus = stats.agg(corpusAggs.head, corpusAggs.tail: _*)
    // N is the count of docs with >= 1 token (empty docs can match no
    // term and would only shift idf by a constant)
    val withC = stats.crossJoin(broadcast(corpus))
      .withColumn("__avgdl", col("total_len") / col("n"))
    // per-term micro weight — the formula's operation order mirrors the
    // oracle SQL text exactly so both engines produce the same double
    def micro(t0: String): Column = {
      val tf = col(tfCol(t0)).cast("double")
      val df = col(dfCol(t0))
      val idf = (col("n") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)
      val denom = tf +
        lit(K1) * (lit(OneMinusB) + lit(B) * col("dl").cast("double") / col("__avgdl"))
      when(col(tfCol(t0)) > 0,
        round(idf * (tf * lit(K1Plus1)) / denom * lit(1000000.0)).cast("long"))
        .otherwise(lit(0L))
    }
    val perQuery = queries.map { case (qid, qterms) =>
      struct(lit(qid).as("query_id"),
        qterms.distinct.map(micro).reduce(_ + _).as("score_micro"))
    }
    val scored = withC
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"),
        col("q.score_micro").as("score_micro"))
      .filter(col("score_micro") > 0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
