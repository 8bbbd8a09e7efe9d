package graft.northstar

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-language-model tokenizer training and tokenization — the
  * OTHER production tokenizer family next to BPE (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates"; the algorithm SentencePiece ships as
  * `--model_type=unigram`). Split along the same line as [[BpeLearn]]:
  *
  *  1. the CORPUS-scale pass is [[BpeLearn.pieceCounts]] — shared, so
  *     BPE and unigram train from the identical normalized word table
  *     (one scan + one piece shuffle at any corpus size; the output is
  *     vocabulary-sized by Heaps' law);
  *  2. the SEED pass explodes each distinct word into its substrings
  *     (≤ |word|·maxLen candidates per word — word-table-sized, never
  *     corpus-sized) and keeps the heaviest `seedSize` plus every
  *     single-code-point symbol (the coverage floor EM may never prune);
  *  3. the EM loop is DISTRIBUTED where it is data-sized and driver-side
  *     where it is model-sized: each E-step broadcasts the current piece
  *     table and folds per-word forward–backward marginals into
  *     per-piece expected counts with ONE shuffle over the word table
  *     (`flatMap` → groupBy-sum — the corpus is never touched again);
  *     the M-step and the prune ranking run on the collected
  *     vocabulary-sized count table, the same bounded-by-design class as
  *     [[BpeLearn.learnMerges]] and the IVF quantizer fit.
  *
  * '''Integer micro-unit determinism''' (the q47/q107 discipline, applied
  * to EM): distributed float sums are partition-order-dependent, so a
  * naive EM would drift run to run and no exact-agreement gate could
  * hold. Instead every cross-row sum in the pipeline is over LONGs:
  *
  *  - each word's per-piece expected-count contribution is quantized to
  *    micro-units (`round(weight · marginal · 1e6)`) INSIDE the per-word
  *    E-step (a fixed-order, single-threaded double computation over
  *    `StrictMath` — bit-deterministic on any JVM), and only the
  *    quantized longs are shuffled and summed;
  *  - the M-step turns exact long counts into micro-NAT log
  *    probabilities (`floor(1e6 · StrictMath.log(c/total))`);
  *  - Viterbi segmentation scores are micro-nat LONG sums with an
  *    explicit total-order tiebreak (higher score, then longer last
  *    piece).
  *
  * The result: the learned model and every segmentation are bit-exact
  * reproducible across runs, partitionings and machines, and an
  * independently-coded in-memory reference (the Accuracy gate) must
  * agree EXACTLY — approximation lives in the quantization (1e-6
  * relative, far below any tokenizer-quality signal), not in the gate.
  *
  * '''Arithmetic contract''' (part of the model format, like the UTF-8
  * cap order in [[BpeLearn]]): the per-word lattice folds log-sum-exp
  * incrementally in ASCENDING span order with
  * `max + log1p(exp(min - max))`, all transcendentals through
  * `StrictMath`; contributions quantize with `math.round`, the M-step
  * with `floor`. Any reimplementation must follow the same fold order —
  * IEEE doubles make it bit-reproducible, which is what lets the gate
  * demand exact equality instead of a tolerance.
  */
object UnigramLm {

  /** Micro-unit scale shared by counts and log probabilities. */
  val Micro = 1000000L

  /** Log probability assigned to pieces with zero expected count and to
    * out-of-model single characters at tokenize time: e^-69 ≈ 1e-30,
    * effectively "never pick this unless nothing else segments". Finite
    * (not -inf) so Viterbi stays total on unseen input.
    */
  val FloorLogpMicro: Long = -69L * Micro

  /** Strict UTF-8 byte order — the order Spark's string comparisons
    * (and every cap-tiebreak orderBy in this engine) use; diverges from
    * JVM UTF-16 `String` order on supplementary-plane code points.
    */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val (ba, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      if (ba(i) != bb(i)) return (ba(i) & 0xff) < (bb(i) & 0xff)
      i += 1
    }
    ba.length < bb.length
  }

  /** A trained model: piece → micro-nat log probability, plus the max
    * piece length in CODE POINTS (the DP window). Single-code-point
    * pieces cover every symbol seen at seed time.
    */
  final case class Model(logp: Map[String, Long], maxLen: Int) {
    def size: Int = logp.size
  }

  // ---------------------------------------------------------------- seed

  /** All substrings of `word` with 1..maxLen code points, one entry per
    * OCCURRENCE (so "aaa" yields "a" three times — occurrence-weighted
    * seeding, the suffix-array convention SentencePiece uses).
    */
  def substrings(word: String, maxLen: Int): Iterator[String] = {
    val cps = BpeLearn.initialSymbols(word)
    for {
      i <- cps.indices.iterator
      l <- 1 to math.min(maxLen, cps.length - i)
    } yield cps.slice(i, i + l).mkString
  }

  /** The seed-candidate substring weights as a PLAN off the word table:
    * word-table-sized imperative explode (the sanctioned typed slot —
    * the corpus was already folded to distinct words), one shuffle on
    * the substring.
    */
  def seedCandidates(words: DataFrame, maxLen: Int): DataFrame = {
    val s = words.sparkSession
    import s.implicits._
    words.select(col("piece").as[String], col("weight").as[Long])
      .flatMap { case (w, wt) => substrings(w, maxLen).map((_, wt)) }
      .toDF("piece", "weight")
      .groupBy(col("piece"))
      .agg(sum(col("weight")).as("weight"))
  }

  /** Seed model: top `seedSize` substrings by (weight desc, piece asc —
    * the [[BpeLearn.topVocab]] total order) UNIONED with every
    * single-code-point symbol of the word table (the coverage floor:
    * EM never prunes singles, so every training word stays segmentable).
    * Initial probabilities are weight-proportional, micro-nat quantized.
    */
  def seedModel(words: DataFrame, maxLen: Int, seedSize: Int): Model = {
    val cand = seedCandidates(words, maxLen).persist()
    val top =
      try {
        val t = BpeLearn.topVocabPlan(cand, seedSize)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // Spark `length` counts CODE POINTS (UTF8String.numChars), so a
        // single supplementary-plane symbol is length 1 here too
        val singles = cand.filter(length(col("piece")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (t ++ singles).distinct
      } finally { cand.unpersist(); () }
    val total = top.iterator.map(_._2).sum
    val logp = top.iterator.map { case (p, w) =>
      p -> quantLog(w, total)
    }.toMap
    Model(logp, maxLen)
  }

  /** floor(1e6 · ln(num/den)) — the ONE quantization both the engine and
    * any reference implementation apply (StrictMath: bit-identical on
    * every JVM, unlike java.lang.Math's intrinsics).
    */
  def quantLog(num: Long, den: Long): Long =
    if (num <= 0L) FloorLogpMicro
    else math.floor(Micro.toDouble *
      StrictMath.log(num.toDouble / den.toDouble)).toLong

  // ------------------------------------------------------------- E-step

  /** Per-word forward–backward over the segmentation lattice: returns
    * each in-model piece's expected-count contribution in micro-units
    * (`round(weight · P(piece used | word) · 1e6)`), plus the word's
    * log-likelihood contribution under `"" -> weight·logZ` micro-units
    * (keyed by the empty string, which is never a piece — the corpus
    * log-likelihood rides the same shuffle for the monotonicity
    * diagnostic). Fixed iteration order + StrictMath only: the doubles
    * are bit-deterministic, and only quantized longs leave this method.
    * A word containing no segmentable path (impossible while the seed's
    * single-char floor is intact) contributes nothing.
    */
  def expectedCounts(word: String, weight: Long,
      model: Model): Iterator[(String, Long)] = {
    val cps = BpeLearn.initialSymbols(word)
    val n = cps.length
    if (n == 0) return Iterator.empty
    val NegInf = Double.NegativeInfinity
    // piece log-probs per span, nats — BANDED storage (only spans of
    // ≤ maxLen code points exist), so a pathological single-run word
    // costs O(n·maxLen), not an O(n²) matrix that would OOM the E-step
    // on a 100k-char unbroken piece
    val band = Array.fill(n, model.maxLen)(NegInf)
    def lpGet(j: Int, i: Int): Double = band(j)(i - j - 1)
    for (j <- 0 until n; i <- j + 1 to math.min(n, j + model.maxLen)) {
      band(j)(i - j - 1) = model.logp.get(cps.slice(j, i).mkString)
        .fold(NegInf)(_.toDouble / Micro.toDouble)
    }
    def lse(acc: Double, x: Double): Double =
      if (x == NegInf) acc
      else if (acc == NegInf) x
      else if (acc >= x) acc + StrictMath.log1p(StrictMath.exp(x - acc))
      else x + StrictMath.log1p(StrictMath.exp(acc - x))
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    for (i <- 1 to n) {
      var a = NegInf
      var j = math.max(0, i - model.maxLen)
      while (j < i) { // fixed ascending-j fold order
        if (alpha(j) != NegInf && lpGet(j, i) != NegInf)
          a = lse(a, alpha(j) + lpGet(j, i))
        j += 1
      }
      alpha(i) = a
    }
    val z = alpha(n)
    if (z == NegInf) return Iterator.empty
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    for (j <- (n - 1) to 0 by -1) {
      var b = NegInf
      var i = j + 1
      val hi = math.min(n, j + model.maxLen)
      while (i <= hi) {
        if (beta(i) != NegInf && lpGet(j, i) != NegInf)
          b = lse(b, lpGet(j, i) + beta(i))
        i += 1
      }
      beta(j) = b
    }
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    for (j <- 0 until n; i <- j + 1 to math.min(n, j + model.maxLen)) {
      if (lpGet(j, i) != NegInf && alpha(j) != NegInf && beta(i) != NegInf) {
        val marginal = StrictMath.exp(alpha(j) + lpGet(j, i) + beta(i) - z)
        val c = math.round(weight.toDouble * marginal * Micro.toDouble)
        if (c > 0L) out += ((cps.slice(j, i).mkString, c))
      }
    }
    out += (("", math.round(weight.toDouble * z * Micro.toDouble)))
    out.iterator
  }

  /** One distributed E-step over the word table: broadcast model,
    * per-word quantized contributions, ONE shuffle (groupBy-sum of
    * longs — order-independent by construction). Returns (piece →
    * micro-count, corpus log-likelihood in micro-nats).
    */
  def eStep(words: DataFrame, model: Model): (Map[String, Long], Long) = {
    val s = words.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(model)
    val agg = words.select(col("piece").as[String], col("weight").as[Long])
      .flatMap { case (w, wt) => expectedCounts(w, wt, bc.value) }
      .toDF("piece", "c")
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bc.destroy()
    (agg - "", agg.getOrElse("", 0L))
  }

  /** M-step: exact long totals → micro-nat log probs. Pieces the E-step
    * never used keep the floor (prune fodder). Model-sized, driver-side.
    */
  def mStep(model: Model, counts: Map[String, Long]): Model = {
    val total = counts.valuesIterator.sum
    Model(model.logp.map { case (p, _) =>
      p -> quantLog(counts.getOrElse(p, 0L), total)
    }, model.maxLen)
  }

  // -------------------------------------------------------------- prune

  /** Kudo's prune criterion, computed model-side: a multi-code-point
    * piece's loss is its expected count times how much worse its OWN
    * string segments without it (`count · (logp − altViterbi)` — the
    * likelihood the corpus loses if the piece goes). Singles are the
    * irremovable coverage floor. Keeps the `keep` highest-loss multi
    * pieces (tiebreak loss desc, then piece asc — total order over
    * exact-integer-derived values).
    */
  def prune(model: Model, counts: Map[String, Long], keep: Int): Model = {
    val (singles, multi) = model.logp.partition {
      case (p, _) => BpeLearn.initialSymbols(p).length == 1
    }
    if (multi.size <= keep) model
    else {
      val ranked = multi.toSeq.map { case (p, lpM) =>
        // exclusion-aware Viterbi, NOT `model - p`: rebuilding a
        // vocabulary-sized map per candidate would make the prune pass
        // O(V²) in map copies — at SentencePiece's 1M-piece seeds that
        // is the difference between seconds and hours
        val alt = viterbi(p, model, exclude = p)._2
        val loss = counts.getOrElse(p, 0L).toDouble * (lpM - alt).toDouble
        (p, lpM, loss)
      }.sortWith { case ((pa, _, la), (pb, _, lb)) =>
        // UTF-8 byte tiebreak, NOT JVM UTF-16 String order: every other
        // cap tiebreak in the repo (topVocabPlan's orderBy, the seed cap)
        // compares strings as Spark does — UTF-8 bytes — and the two
        // orders diverge on supplementary-plane code points; one ordering
        // discipline keeps any future SQL replay of this ranking exact
        if (la != lb) la > lb else utf8Less(pa, pb)
      }
      Model(singles ++ ranked.take(keep).map(t => t._1 -> t._2),
        model.maxLen)
    }
  }

  // -------------------------------------------------------------- train

  /** Full training loop: seed → (EM ×`emIters` → prune to 75 %) until
    * the multi-piece count fits `targetVocab` − singles, then a final
    * EM to settle probabilities on the surviving vocabulary. Every
    * round's word-table pass is ONE shuffle; rounds are
    * O(log(seed/target) / log(4/3)) — bounded by the seed size, not the
    * corpus.
    */
  def train(words: DataFrame, targetVocab: Int, maxLen: Int,
      seedSize: Int, emIters: Int = 2): Model = {
    var model = seedModel(words, maxLen, seedSize)
    val singles = model.logp.count {
      case (p, _) => BpeLearn.initialSymbols(p).length == 1
    }
    val targetMulti = math.max(0, targetVocab - singles)
    var lastCounts = Map.empty[String, Long]
    def em(): Unit = for (_ <- 1 to emIters) {
      val (counts, _) = eStep(words, model)
      model = mStep(model, counts)
      lastCounts = counts
    }
    em()
    while (model.logp.size - singles > targetMulti) {
      val keep = math.max(targetMulti,
        ((model.logp.size - singles) * 3) / 4)
      model = prune(model, lastCounts, keep)
      em()
    }
    model
  }

  /** The model as the one DataFrame projection every surface emits:
    * (piece, logp_micro), total-ordered for stable output.
    */
  def modelToDF(s: SparkSession, model: Model): DataFrame = {
    import s.implicits._
    model.logp.toSeq.sortBy { case (p, lpM) => (-lpM, p) }
      .toDF("piece", "logp_micro")
  }

  /** Rehydrate a model from its table form. The DP window is the max
    * piece length IN the model — deriving it from the data is always
    * sufficient (no span longer than the longest piece can ever match)
    * and self-consistent across prune/persist cycles.
    */
  def modelFromDF(df: DataFrame): Model = {
    val logp = df.select(col("piece"), col("logp_micro")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxLen = if (logp.isEmpty) 1
      else logp.keysIterator.map(BpeLearn.initialSymbols(_).length).max
    Model(logp, math.max(1, maxLen))
  }

  /** Persist the model as a versioned [[graft.io.ParquetTable]] — the
    * serving artifact a tokenize job loads instead of retraining (the
    * [[IvfIndex.persist]] contract for the tokenizer family: trained at
    * most once per corpus version, consumed by many jobs). The model is
    * vocabulary-sized, so the table is a single tiny file; time travel
    * and atomic swap ride along from the table layout.
    */
  def persist(spark: SparkSession, path: String, model: Model): Unit = {
    new graft.io.ParquetTable(path)
      .overwrite(modelToDF(spark, model).coalesce(1))
    ()
  }

  /** Load a persisted model, or None when no table exists at `path`. */
  def load(spark: SparkSession, path: String): Option[Model] = {
    val t = new graft.io.ParquetTable(path)
    if (!t.exists) None else Some(modelFromDF(t.read(spark)))
  }

  // ----------------------------------------------------------- tokenize

  /** Viterbi segmentation in exact micro-nat LONG arithmetic: dp over
    * code points, transitions are in-model pieces (or a floor-penalty
    * single for out-of-model characters, keeping the DP total on unseen
    * input). Tiebreak on equal score: the LONGER last piece (smaller
    * start index) — an explicit total order shared with any reference.
    * Returns (pieces, score in micro-nats). `exclude` drops ONE piece
    * from consideration without copying the model (the prune pass's
    * alternative-segmentation probe; an excluded single falls back to
    * the floor penalty like any out-of-model character).
    */
  def viterbi(word: String, model: Model,
      exclude: String = null): (Array[String], Long) = {
    val cps = BpeLearn.initialSymbols(word)
    val n = cps.length
    if (n == 0) return (Array.empty, 0L)
    val NoScore = Long.MinValue
    val dp = Array.fill(n + 1)(NoScore); dp(0) = 0L
    val back = Array.fill(n + 1)(-1)
    for (i <- 1 to n) {
      var j = math.max(0, i - model.maxLen)
      while (j < i) {
        if (dp(j) != NoScore) {
          val piece = cps.slice(j, i).mkString
          val lpOpt =
            if (piece == exclude)
              (if (i - j == 1) Some(FloorLogpMicro) else None)
            else if (i - j == 1)
              Some(model.logp.getOrElse(piece, FloorLogpMicro))
            else model.logp.get(piece)
          lpOpt.foreach { lpM =>
            val cand = dp(j) + lpM
            // strict > : among equal scores the SMALLEST j (longest
            // last piece) wins because ascending j is evaluated first
            if (cand > dp(i)) { dp(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
    }
    val pieces = mutable.ArrayBuffer.empty[String]
    var i = n
    while (i > 0) { val j = back(i); pieces += cps.slice(j, i).mkString; i = j }
    (pieces.reverseIterator.toArray, dp(n))
  }
}
