package graft.northstar

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the first stage of every web-scale
  * training pipeline (CCNet / RefinedWeb / Dolma all begin by stripping
  * markup before any quality or dedup pass). Pure codegen'd Column algebra
  * (regexp_replace + literal replace), zero shuffles: at 100 TB this runs
  * inside the scan stage like the rest of [[TextAnalysis]].
  *
  * Patterns are single-sourced here and interpolated into the DuckDB
  * oracle, and deliberately portable between Java regex (Spark) and RE2
  * (DuckDB): inline `(?s)` dotall, lazy `.*?`, no lookaround, whitespace
  * spelled via [[TextAnalysis.WsClass]]. Entity decoding is literal
  * `replace`, `&amp;` decoded LAST (the HTML unescape order — decoding it
  * first would double-decode `&amp;lt;`).
  */
object MarkupExtract {

  /** Element-content blocks dropped wholesale (content is not text), then
    * the generic tag stripper. Order matters: block patterns must run
    * before `TagRe` dismembers their closing tags.
    */
  val ScriptRe = "(?s)<script[^>]*>.*?</script>"
  val StyleRe = "(?s)<style[^>]*>.*?</style>"
  val CommentRe = "(?s)<!--.*?-->"
  val TagRe = "<[^>]*>"

  /** `(entity, decoded)` in decode order — `&amp;` last. */
  val Entities: Seq[(String, String)] =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&")

  /** HTML-escape a text column (synthesis side): `&` first, then the
    * angle brackets — the inverse composition of [[extractText]]'s decode.
    */
  def escapeText(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** Markup stripped, entities decoded, whitespace collapsed + trimmed —
    * the canonical extracted text.
    */
  def extractText(html: Column): Column = {
    val noBlocks = Seq(ScriptRe, StyleRe, CommentRe, TagRe)
      .foldLeft(html)((c, re) => regexp_replace(c, lit(re), lit(" ")))
    val decoded = Entities.foldLeft(noBlocks) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, lit(TextAnalysis.WsClass + "+"), lit(" ")))
  }

  /** The deterministic page template q89 wraps each document in — every
    * markup hazard the extractor must handle: dropped-content blocks
    * (style/script), a comment, attributes with quotes, retained text in
    * three elements, and entity-escaped body text. `Right` names a field
    * ("id" | "source" | "text"), `Left` is literal markup; engine and
    * oracle both render THIS sequence, so the synthesized corpora are
    * byte-identical.
    */
  val PageParts: Seq[Either[String, String]] = Seq(
    Left("<html><head><title>doc "), Right("id"),
    Left("</title><style>p { margin: 0; }</style></head><body data-src=\""),
    Right("source"), Left("\"><h1>"), Right("source"),
    Left("</h1><!-- trail "), Right("id"), Left(" --><p>"), Right("text"),
    Left("</p><script>var id = "), Right("id"),
    Left(";</script></body></html>"))

  /** Render [[PageParts]] as a Column (body text HTML-escaped). */
  def synthesizePage(id: Column, source: Column, text: Column): Column =
    concat(PageParts.map {
      case Left(litStr) => lit(litStr)
      case Right("id") => id.cast("string")
      case Right("source") => source
      case Right(_) => escapeText(text)
    }: _*)

  /** Render [[PageParts]] as DuckDB SQL over column names. */
  def synthesizePageSql(idSql: String, sourceSql: String,
      textSql: String): String = {
    def q(s: String) = s.replace("'", "''")
    val escaped = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(textSql) { case (e, (from, to)) =>
        s"replace($e, '${q(from)}', '${q(to)}')"
      }
    PageParts.map {
      case Left(litStr) => s"'${q(litStr)}'"
      case Right("id") => s"CAST($idSql AS VARCHAR)"
      case Right("source") => sourceSql
      case Right(_) => escaped
    }.mkString("(", " || ", ")")
  }

  /** The same extraction as DuckDB SQL over a column expression, built
    * from the SAME pattern constants so engine and oracle can never
    * drift. RE2's `regexp_replace(..., 'g')` with inline `(?s)` matches
    * the Java semantics for these lookaround-free patterns.
    */
  def extractTextSql(htmlSql: String): String = {
    def q(s: String) = s.replace("'", "''")
    val noBlocks = Seq(ScriptRe, StyleRe, CommentRe, TagRe)
      .foldLeft(htmlSql)((e, re) => s"regexp_replace($e, '${q(re)}', ' ', 'g')")
    val decoded = Entities.foldLeft(noBlocks) { case (e, (from, to)) =>
      s"replace($e, '${q(from)}', '${q(to)}')"
    }
    s"trim(regexp_replace($decoded, '${q(TextAnalysis.WsClass)}+', ' ', 'g'))"
  }
}
