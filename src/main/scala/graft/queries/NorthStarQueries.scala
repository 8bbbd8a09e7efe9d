package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.northstar.TextAnalysis

/** North-star LLM-data-pipeline operators (BASELINE.json) over the
  * documents/embeddings testdata, with DuckDB oracles where the computation
  * is SQL-expressible (the oracle mirrors the *same* deterministic
  * computation — integer scores, exact divisions, md5).
  */
object NorthStarQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.read(s, dir, n)

  /** Token statistics per language — token counting at corpus scale is a
    * single map + one small shuffle on the lang key.
    */
  def q20TokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
        round(sum(TextAnalysis.tokenCount(col("text")).cast("long")).cast("double") /
          count(lit(1)), 4).as("avg_tokens"),
        sum(col("n_chars")).as("total_chars"))

  /** Per-document quality signals: token count, punctuation ratio, stopword
    * ratio, mean token length (all exact-division doubles).
    */
  def q21DocQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(TextAnalysis.meanTokenLength(col("text")), 6).as("mean_token_len"))

  /** Language-ID prediction matrix: labeled lang × predicted lang counts.
    * The heuristic is deterministic marker-word scoring with struct-max
    * tie-breaking, mirrored by list_max in DuckDB.
    */
  def q22LangIdMatrix(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))

  /** Exact deduplication: canonical doc per md5 fingerprint of the
    * normalized text (hash-groupBy — one shuffle on the fingerprint).
    */
  def q23ExactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("copies"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_token_stats" -> (q20TokenStats _),
    "q21_doc_quality" -> (q21DocQuality _),
    "q22_langid_matrix" -> (q22LangIdMatrix _),
    "q23_exact_dedup" -> (q23ExactDedup _),
  )

  private val tokensSql =
    """list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)"""

  private def langScoreSql(profile: Seq[String]): String =
    s"""len(list_filter($tokensSql, t -> len(t) > 0 AND lower(t) IN (${
      profile.map(w => s"'$w'").mkString(", ")})))"""

  val oracles: Map[String, String] = Map(
    "q20_token_stats" ->
      s"""SELECT lang, count(*) AS docs,
          CAST(sum(len($tokensSql)) AS BIGINT) AS total_tokens,
          round(CAST(sum(len($tokensSql)) AS DOUBLE) / count(*), 4) AS avg_tokens,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY lang""",

    "q21_doc_quality" ->
      s"""SELECT doc_id,
          CAST(len($tokensSql) AS INTEGER) AS n_tokens,
          round(CASE WHEN len(text) = 0 THEN 0.0
                ELSE CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / len(text) END, 6) AS punct_ratio,
          round(CASE WHEN len($tokensSql) = 0 THEN 0.0
                ELSE CAST(len(list_filter($tokensSql, t -> lower(t) IN (${
        TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE) / len($tokensSql) END, 6) AS stopword_ratio,
          round(CASE WHEN len($tokensSql) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform($tokensSql, t -> len(t))) AS DOUBLE) / len($tokensSql) END, 6) AS mean_token_len
          FROM documents""",

    "q22_langid_matrix" ->
      s"""WITH scored AS (
            SELECT lang, list_max([${
        TextAnalysis.LangProfiles.map { case (lang, profile) =>
          s"{'s': ${langScoreSql(profile)}, 'l': '$lang'}"
        }.mkString(", ")}]).l AS predicted_lang
            FROM documents)
          SELECT lang, predicted_lang, count(*) AS n
          FROM scored GROUP BY 1, 2""",

    "q23_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
         CAST(min(doc_id) AS BIGINT) AS canonical_id,
         count(*) AS copies
         FROM documents GROUP BY 1""",
  )
}
