package graft.northstar

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star: language-ID, quality scoring, token counting,
  * fingerprinting — beyond the reference's surface).
  *
  * Everything is pure Column algebra over built-ins (split / HOFs / hash),
  * so it runs partition-local with zero shuffles: at 100 TB these are
  * embarrassingly parallel map stages whose cost is bounded by the parquet
  * scan.
  */
object TextAnalysis {

  /** Shared PII patterns — deliberately conservative, portable between
    * Java regex (Spark codegen) and RE2 (DuckDB oracle): no lookaround, no
    * backreferences.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII scrub: replace emails/phones with typed placeholder tags — the
    * pass every training corpus runs before tokenization. Codegen'd
    * regexp_replace, zero shuffles.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** Occurrences a [[redactPii]] pass would replace, per kind. */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Verbatim word n-grams as STRINGS (space-joined), EMPTY array for docs
    * shorter than n tokens — for consumers that need the literal gram text
    * (inspection, reporting, external-engine parity). NOTE the deliberate
    * short-doc contrast with [[shingleHashes]], which the shingle-dedup
    * family (and `CorpusClean.contaminatedIds`) uses instead: that one
    * emits ONE whole-text shingle for short docs, so full-text matches
    * between short docs still collide. Pick by semantics, not habit.
    * The `when` guard matters: Spark's `sequence(1, 0)` counts DOWN, so
    * the unguarded form would emit phantom grams for short docs.
    */
  def wordNGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fixed-window token chunking with overlap — context-window preparation
    * for training: windows of `chunkSize` tokens starting every `stride`
    * tokens (stride < chunkSize ⇒ overlap), the tail window shorter.
    * Returns array<struct<chunk_start, n_tokens, chunk>>; empty array for
    * token-less docs (sequence-with-step errors on an empty range under
    * ANSI, hence the guard). Map-side only — chunking 100 TB is
    * embarrassingly parallel.
    */
  def chunk(toks: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize ($chunkSize) and stride ($stride) must be >= 1")
    when(size(toks) >= 1,
      transform(sequence(lit(1), size(toks), lit(stride)),
        st => struct(
          st.as("chunk_start"),
          least(lit(chunkSize), size(toks) - st + 1).as("n_tokens"),
          concat_ws(" ", slice(toks, st, lit(chunkSize))).as("chunk"))))
      .otherwise(array().cast(
        "array<struct<chunk_start:int,n_tokens:int,chunk:string>>"))
  }

  /** The whitespace characters of Java-regex `\s`, spelled out. Written
    * as an explicit class because `\s` itself is NOT cross-engine stable:
    * Java includes vertical tab (U+000B), RE2 (DuckDB's engine) does not
    * — a corpus containing a VT would tokenize differently in engine and
    * oracle. Every whitespace regex in this library and every oracle SQL
    * interpolates these constants, so both engines see byte-identical
    * patterns with an explicitly agreed character set.
    */
  val WsChars: String = " \\t\\n\\x0B\\f\\r"

  /** `[ \t\n\x0B\f\r]` — the shared whitespace character class. */
  val WsClass: String = s"[$WsChars]"

  /** Whitespace tokens, empties dropped (splitting yields a leading ""
    * for leading whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(text, WsClass + "+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token-multiset collision statistics in ONE scan-stage pass:
    * `struct(s2 = Σ cᵢ², d = distinct tokens)` where cᵢ are per-token
    * occurrence counts. Powers the Rényi-2 (collision) diversity gate
    * (q74): both outputs are exact integers, so downstream ratios are
    * cross-engine bit-stable — and the equivalent explode+groupBy
    * formulation would shuffle one row per token OCCURRENCE, where this
    * shuffles nothing. Empty/whitespace-only text folds to (0, 0).
    * Runs as the native [[graft.functions.TokenCollisionStats]] compiled
    * pass; [[collisionStatsHof]] is the Column-algebra reference form
    * NorthStarSpec pins it against.
    */
  def collisionStats(text: Column): Column =
    graft.functions.TokenCollisionFunctions.token_collision_stats(text)

  /** Reference formulation of [[collisionStats]]: a run-length fold over
    * the sorted token array via the `aggregate` higher-order function.
    * Semantically identical (modulo the hash-collision caveat documented
    * on the native expression); kept for the bit-parity spec — HOF
    * lambdas run interpreted per token, so the native pass is what ships
    * in the scan stage.
    */
  def collisionStatsHof(text: Column): Column = {
    val sorted = array_sort(tokens(text))
    // fold state: (prev token, current run length, Σ run², distinct runs);
    // "" can never equal a real token (empties are dropped), so the seed
    // prev is safe and the first token always opens a run.
    aggregate(
      sorted,
      struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("s2"),
        lit(0L).as("d")),
      (acc, tok) => {
        val same = tok === acc("p")
        struct(
          tok.as("p"),
          when(same, acc("r") + 1L).otherwise(lit(1L)).as("r"),
          when(same, acc("s2"))
            .otherwise(acc("s2") + acc("r") * acc("r")).as("s2"),
          when(same, acc("d")).otherwise(acc("d") + 1L).as("d"))
      },
      acc => struct((acc("s2") + acc("r") * acc("r")).as("s2"),
        acc("d").as("d")))
  }

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
        length(text))

  /** English-ish stopword list used by the quality score. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Share of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(
        typedLit(Stopwords), lower(t)))) / size(toks))
  }

  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)) / size(toks))
  }

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic scoring — the testdata's `lang` labels are
    * synthetic, so correctness means "same scores every engine", not label
    * recovery.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "value", "fast", "table"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "vector", "agg"),
    "es" -> Seq("el", "la", "y", "los", "que", "stream", "row"),
    "fr" -> Seq("le", "la", "et", "les", "des", "window", "query"),
    "zh" -> Seq("zh", "cn", "hanzi", "merge", "join", "batch", "big"))

  /** Marker-hit count for one profile. */
  def langScore(text: Column, profile: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(profile), lower(t))))

  /** Argmax language by (score, lang) — struct comparison breaks ties by
    * the lexicographically larger language code, mirrored exactly by
    * DuckDB's list_max over structs in the oracle.
    */
  def langId(text: Column): Column = {
    val scored = LangProfiles.map { case (lang, profile) =>
      struct(langScore(text, profile).as("s"), lit(lang).as("l"))
    }
    greatest(scored: _*).getField("l")
  }

  /** Canonical text: lowercased, whitespace runs collapsed to one space,
    * trimmed — the ONE normalization shared by the exact-dedup fingerprint
    * and the winnowing fingerprints (they must never drift apart, or the
    * two dedup families would disagree on what "the same text" means).
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), WsClass + "+", " "))

  /** Canonical-text fingerprint: md5 over [[normalizedText]] — the
    * exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(to_binary(normalizedText(text), lit("utf-8")))

  /** Rolling k-gram hashes (document shingles) — the building block for
    * minhash and containment fingerprints. Delegates to the native
    * [[graft.functions.ShingleHashes]] expression: one compiled pass per
    * row instead of an interpreted HOF lambda per shingle (~17× on the
    * 5k-doc corpus; see that expression's Scaladoc for the equivalence
    * argument).
    */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.ShingleFunctions.shingle_hashes(text, k)

  /** Corpus-model fluency scoring — the shape of CCNet's LM quality
    * filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data", LREC 2020), with the n-gram model
    * trained ON the corpus itself: score every document by the average
    * add-one-smoothed conditional probability of its word bigrams,
    * p(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V). Repetitive documents built
    * from the corpus's common collocations score high; documents full of
    * rare transitions score low — the standard relative-fluency gate
    * before training.
    *
    * Cross-engine determinism: each bigram's probability is an exact
    * rational, materialized as floor((c_bg+1)·10⁹ / (c_w1+V)) in pure
    * integer arithmetic; per-document scores SUM those integers (exact,
    * order-free) and perform one final double division — so engine and
    * oracle agree bit-for-bit, which a float log-prob sum never could
    * (addition order differs between engines).
    *
    * Scale shape: bigram construction is map-side array algebra (no
    * token explode-regroup); the model is two vocabulary-sized aggregates
    * plus a vocabulary-sized join; scoring is one probe join on (w1,w2)
    * and a per-doc aggregate. Docs with fewer than 2 tokens have no
    * bigrams and are excluded by construction.
    */
  def bigramFluency(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("tk"))
    val bg = toks.select(col(idCol),
      explode(when(size(col("tk")) >= 2,
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))
    val bgCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
    val w1Counts = bgCounts.groupBy(col("w1")).agg(sum(col("c_bg")).as("c_w1"))
    val vocab = toks.select(explode(col("tk")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // decimal intermediate: (c_bg + 1) * 1e9 overflows a long once a
    // bigram's corpus count reaches ~9.2e9 — realistic for a stopword
    // bigram at trillion-token scale (negative scores non-ANSI, a job-
    // killing ARITHMETIC_OVERFLOW under ANSI). The quotient itself is
    // ≤ 1e9 so `div`'s long result is safe; the oracle mirrors with
    // HUGEINT.
    val model = bgCounts.join(w1Counts, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        expr("((CAST(c_bg AS DECIMAL(38,0)) + 1) * 1000000000) div (c_w1 + v)")
          .as("term"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term")).cast("double") /
          (count(lit(1)) * lit(1000000000.0)), 6).as("fluency"))
  }

  /** Winnowed fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003 — MOSS): md5 every character k-gram of the normalized text,
    * slide a w-gram window, keep each window's minimum hash. Returns one
    * row per selected window (id, n_grams, fp) — fps repeat across
    * adjacent windows; aggregate with DISTINCT. Guarantee: documents
    * sharing any substring of ≥ w+k-1 characters share a fingerprint.
    * md5 hex strings compare lexicographically the same way in every
    * engine, so window minima are cross-engine exact.
    *
    * Scale shape: the position explode is map-side and linear in corpus
    * characters; the only shuffle is the window's hash partitioning on
    * the doc id, which downstream per-doc aggregation reuses.
    */
  def winnowedFingerprints(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 4,
      w: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1, s"k=$k, w=$w must be positive")
    val grams = docs
      .select(col(idCol), normalizedText(col(textCol)).as("__t"))
      .withColumn("n_grams", (length(col("__t")) - (k - 1)).cast("long"))
      .filter(col("n_grams") >= 1)
      .select(col(idCol), col("n_grams"),
        explode(sequence(lit(1L), col("n_grams"))).as("__i"), col("__t"))
      .select(col(idCol), col("n_grams"), col("__i"),
        md5(expr(s"substr(__t, cast(__i as int), $k)")).as("__h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__i"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("__h")).over(win))
      // full windows only; a doc shorter than w grams still yields its
      // single all-grams window (winnowing's ≥1-fingerprint guarantee)
      .filter(col("__i") <= greatest(col("n_grams") - (w - 1), lit(1L)))
      .select(col(idCol), col("n_grams"), col("fp"))
  }
}
