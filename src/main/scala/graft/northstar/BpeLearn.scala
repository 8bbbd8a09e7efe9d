package graft.northstar

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING — the tokenizer-training stage of an
  * LLM data pipeline (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"), split along the line
  * every production trainer (subword-nmt, HuggingFace tokenizers,
  * SentencePiece-BPE) splits it:
  *
  *  1. [[pieceCounts]] — the CORPUS-scale pass: pre-tokenize every document
  *     with the GPT-2-style piece regex and count distinct pieces. One scan
  *     + one shuffle with partial aggregation; at 100 TB this is the only
  *     stage that touches the data, and its output is vocabulary-sized
  *     (distinct pieces grow sub-linearly in corpus bytes — Heaps' law),
  *     many orders of magnitude smaller than the corpus.
  *  2. [[learnMerges]] — the BOUNDED pass: the textbook greedy merge loop
  *     over the weighted piece table. Real trainers run this in memory for
  *     the same reason the IVF quantizer fits on a bounded sample
  *     ([[IvfIndex]]): the input is capped (top-V pieces by weight), so the
  *     loop is O(merges × Σ|piece|) independent of corpus size. Iterating
  *     it as Spark jobs would pay a scheduler round-trip per merge for
  *     KB-scale state.
  *
  * Both the pair count and the merge application follow the reference
  * algorithm exactly: adjacent pairs are counted per overlapping
  * occurrence weighted by piece frequency; the best pair is the
  * (max weight, then lexicographically least (left, right)) — a total
  * order, so the learned merge sequence is deterministic; a merge rewrites
  * every piece greedily left-to-right (non-overlapping). Ties and repeats
  * ("aaa" counts (a,a) twice but merges once) match subword-nmt.
  */
object BpeLearn {

  /** One learned merge: at `rank` (1-based), join `left`+`right` (weighted
    * adjacent-pair frequency `weight` at the time of the merge) into
    * `token`.
    */
  final case class Merge(rank: Int, left: String, right: String,
      weight: Long, token: String)

  /** ASCII-only case fold, spelled as a locale-free `translate` on the
    * engine side and a plain character map in any reference
    * implementation. Full Unicode `lower()` is deliberately avoided here:
    * its non-ASCII slow path is JVM-locale-shaped, so an exact-agreement
    * gate against an independent reference could drift on a non-ROOT
    * default locale. Tokenization is unaffected — non-ASCII letters fall
    * into the same `[^a-z0-9…]` piece class in either case.
    */
  private val Uppers = ('A' to 'Z').mkString
  private val Lowers = ('a' to 'z').mkString
  def asciiFold(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(c, Uppers, Lowers)
  def asciiFold(s: String): String = s.map(ch =>
    if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)

  /** The normalized per-document piece array (ASCII-case-folded,
    * whitespace runs dropped) — single-sourced so counting (q88) and
    * tokenization (q92) segment text identically.
    */
  def pieceArray(text: org.apache.spark.sql.Column,
      pattern: String): org.apache.spark.sql.Column =
    filter(regexp_extract_all(asciiFold(text), lit(pattern), lit(0)),
      p => !(p rlike s"^${TextAnalysis.WsClass}+$$"))

  /** Corpus-scale piece vocabulary: `(piece, weight)` for every distinct
    * pre-tokenized piece — same shape as q68's fertility stats. One
    * shuffle on the piece.
    */
  def pieceCounts(docs: DataFrame, textCol: String,
      pattern: String): DataFrame =
    docs
      .select(explode(pieceArray(col(textCol), pattern)).as("piece"))
      .groupBy(col("piece"))
      .agg(count(lit(1)).as("weight"))

  /** The top-V capped vocabulary PLAN off a piece-count frame — the
    * deterministic tiebreak (weight desc, then piece asc in Spark's UTF-8
    * byte order) single-sourced so the q88 batch query, its plan-audit
    * entry, and the streaming mirror can never drift on cap selection.
    */
  def topVocabPlan(pieceCounts: DataFrame, cap: Int): DataFrame =
    pieceCounts.orderBy(col("weight").desc, col("piece").asc).limit(cap)

  /** Collected form of [[topVocabPlan]] — bounded by `cap` by design. */
  def topVocab(pieceCounts: DataFrame, cap: Int): Seq[(String, Long)] =
    topVocabPlan(pieceCounts, cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** The learned merge table as a DataFrame — the one projection every
    * surface (q88, the streaming mirror) emits.
    */
  def mergesToDF(s: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame =
    s.createDataFrame(merges)
      .select(col("rank"), col("left"), col("right"), col("weight"),
        col("token"))

  /** One symbol per Unicode CODE POINT — `String#map` would split
    * supplementary-plane characters (emoji) into lone surrogates, which
    * the engine's UTF-8 row round-trip cannot represent.
    */
  def initialSymbols(piece: String): Array[String] =
    piece.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))

  /** Greedy BPE merge loop over a weighted piece vocabulary. Stops early
    * when no adjacent pair remains (every piece fully merged). Symbols
    * start as single code points; no end-of-word marker (pieces are
    * already word-bounded by the pre-tokenizer, the GPT-2 convention).
    */
  def learnMerges(vocab: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.iterator
        .map { case (p, w) => (initialSymbols(p), w) }
        .toArray
    val out = mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, w) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + w)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), w) =
          counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(rank, l, r, w, l + r)
        words = words.map { case (syms, wt) => (mergePair(syms, l, r), wt) }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Tokenize one piece with a learned merge-rank table — the standard
    * BPE apply loop (subword-nmt/HF): repeatedly merge the LOWEST-RANK
    * adjacent pair present (all its occurrences, greedy left-to-right)
    * until no learned pair remains. Deterministic given the ranks; works
    * on pieces never seen in training (falls through to finer symbols).
    */
  def applyMerges(piece: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms = initialSymbols(piece)
    var exhausted = false
    while (!exhausted && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) exhausted = true
      else syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  /** Apply one merge to a symbol sequence, greedy left-to-right
    * non-overlapping (so (a,a) on "aaa" yields ["aa","a"]).
    */
  def mergePair(syms: Array[String], left: String,
      right: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }
}
