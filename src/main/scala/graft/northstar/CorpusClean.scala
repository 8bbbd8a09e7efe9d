package graft.northstar

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style corpus cleaning composite (Raffel et al., "Exploring the Limits
  * of Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
  * §2.2 — length / punctuation / stopword heuristics + exact dedup), built
  * entirely from [[TextAnalysis]] signals so the filter thresholds and the
  * dedup key are the same expressions the standalone quality queries use.
  *
  * Scale shape: the quality filter is map-side only (evaluated inside the
  * parquet scan stage, so rejected documents are never shuffled); the exact
  * dedup is ONE shuffle on the md5 fingerprint. At 100 TB the filter
  * typically drops the majority of raw crawl bytes before the only wide
  * stage, which is the whole point of running it first.
  */
object CorpusClean {

  /** Cleaning thresholds. Defaults are tuned to the synthetic `documents`
    * corpus (token counts 10–100, no punctuation); production corpora tune
    * per-source.
    */
  final case class Config(
      minTokens: Int = 20,
      maxTokens: Int = 90,
      maxPunctRatio: Double = 0.3,
      minStopwordRatio: Double = 0.02)

  /** Heuristic quality gate — pure map-side predicate over the text column. */
  def qualityFilter(df: DataFrame, textCol: String, cfg: Config): DataFrame = {
    val text = col(textCol)
    df.filter(
      TextAnalysis.tokenCount(text).between(cfg.minTokens, cfg.maxTokens) &&
        TextAnalysis.punctRatio(text) <= cfg.maxPunctRatio &&
        TextAnalysis.stopwordRatio(text) >= cfg.minStopwordRatio)
  }

  /** Quality filter + exact dedup: one survivor per canonical-text
    * fingerprint, the smallest `idCol` (deterministic canonical choice).
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val w = Window
      .partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    qualityFilter(df, textCol, cfg)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Benchmark decontamination: ids of training documents that share any
    * verbatim word-`n`-gram with the benchmark set — the standard
    * n-gram-overlap decontamination LLM training pipelines run against
    * held-out eval sets. The benchmark gram set is tiny relative to the
    * corpus, so it broadcasts: the training-side explode never shuffles
    * and the semi join cannot fan out on hot grams (a semi join emits each
    * training row at most once).
    */
  def contaminatedIds(training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    // native one-pass shingle hashing (functions.ShingleHashes) — the HOF
    // n-gram build (transform + slice + concat per position) ran its lambda
    // through the interpreter per gram and dominated the query (~4 s at
    // sf0.1; ~1 s with the compiled pass). Matching by 64-bit shingle hash
    // carries the same negligible-collision assumption as the whole shingle
    // dedup family. Docs with fewer than n tokens contribute ONE whole-text
    // shingle (ShingleHashes' short-doc form): two short docs "overlap"
    // only when their full token sequences match verbatim — which IS
    // contamination.
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(array_distinct(TextAnalysis.shingleHashes(col(textCol), n)))
        .as("__g"))
    val bench = grams(benchmark).select(col("__g")).distinct()
    grams(training)
      .join(broadcast(bench), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Bloom-filter benchmark decontamination: the same word-`n`-gram-overlap
    * semantics as [[contaminatedIds]], but the membership test runs against
    * a Bloom filter of the benchmark gram set INSIDE the training-side scan
    * stage ([[graft.functions.BloomMightContain]]) — no explode of the
    * corpus, no join, no shuffle of any kind on the big side. Returns the
    * training rows with a `__contaminated` flag column.
    *
    * Contract: NO false negatives — every document sharing a verbatim
    * n-gram with the benchmark is flagged (a Bloom filter never misses a
    * member). False positives flag extra clean documents at a rate bounded
    * by `gramsPerDoc × fpp`; for decontamination that errs in the safe
    * direction (slightly over-dropping), which is why real pipelines run
    * exactly this trade. `expectedGrams` is a caller-supplied capacity
    * estimate so the build needs no counting pre-pass (an over-estimate
    * only costs bits: ~1.2 MB per million grams at fpp=0.01).
    *
    * The filter build aggregates the (tiny) benchmark side distributed and
    * merges on the driver (`DataFrameStatFunctions.bloomFilter`, a
    * tree-aggregate) — the same small-side/driver split as the IVF
    * quantizer fit; the corpus side never moves.
    */
  def bloomContaminatedFlags(training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      expectedGrams: Long = 1L << 16, fpp: Double = 0.001): DataFrame = {
    import graft.functions.BloomFunctions
    val bloom = benchmark
      .select(explode(array_distinct(
        TextAnalysis.shingleHashes(col(textCol), n))).as("__g"))
      .stat.bloomFilter("__g", expectedGrams, fpp)
    val bytes = BloomFunctions.serialize(bloom)
    // NULL text shingles to NULL → exists() is NULL; coalesce to false so
    // NULL-text rows read as clean, matching contaminatedIds (the exact
    // path), instead of being silently dropped by a !__contaminated filter
    training.withColumn("__contaminated",
      coalesce(
        exists(array_distinct(TextAnalysis.shingleHashes(col(textCol), n)),
          g => BloomFunctions.mightContain(g, bytes)),
        lit(false)))
  }

  /** The full corpus-preparation pipeline in one call — what a training-data
    * job actually runs end to end: quality gate → exact dedup →
    * benchmark decontamination → context-window chunking. Returns one row
    * per chunk (id, chunk_start, n_tokens, chunk). Every stage is the
    * individually-proven operator, composed lazily so Catalyst plans the
    * whole thing as one DAG: the quality predicate stays in the scan stage,
    * dedup is the only wide shuffle, the contaminated-id and benchmark-gram
    * sets broadcast, and chunking is a scan-stage generator.
    */
  def prepareTrainingCorpus(training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, cfg: Config = Config(),
      chunkSize: Int = 32, stride: Int = 24, ngram: Int = 8): DataFrame = {
    val cleaned = clean(training, idCol, textCol, cfg)
    val bad = contaminatedIds(cleaned, benchmark, idCol, textCol, ngram)
    cleaned.join(broadcast(bad), Seq(idCol), "left_anti")
      .select(col(idCol),
        explode(TextAnalysis.chunk(TextAnalysis.tokens(col(textCol)),
          chunkSize, stride)).as("__c"))
      .select(col(idCol), col("__c.chunk_start"), col("__c.n_tokens"),
        col("__c.chunk"))
  }
}
