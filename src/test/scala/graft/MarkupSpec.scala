package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.MarkupExtract

/** Markup extraction: handcrafted hazard cases plus the synthesize →
  * extract round-trip law q89 rests on.
  */
class MarkupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(MarkupExtract.extractText(col("h")))
      .collect()(0).getString(0)
  }

  test("drops script/style/comment content wholesale, strips tags, " +
      "decodes entities, collapses whitespace") {
    assert(extract("<p>a</p><script>var x = '<b>not text</b>';</script>" +
      "<p>b</p>") === "a b")
    assert(extract("<style>p { color: red; }</style>ok") === "ok")
    assert(extract("before<!-- <p>hidden</p> -->after") === "before after")
    assert(extract("<a href=\"x\" data-k='v'>link</a>") === "link")
    assert(extract("x &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;") ===
      "x <tag> &amp; \"q\" 's'")
    assert(extract("  a\t\tb\n\nc  ") === "a b c")
  }

  test("&amp; decodes last: &amp;lt; yields literal '&lt;', not '<'") {
    assert(extract("&amp;lt;") === "&lt;")
  }

  test("multiline script blocks and uppercase-free tags handled; " +
      "unclosed angle residue never leaks tag text") {
    assert(extract("<script type=\"module\">\nlet a = 1;\nlet b = 2;\n" +
      "</script>done") === "done")
    assert(extract("<div\nclass=\"x\">multi</div>") === "multi")
  }

  test("escape → synthesize → extract round-trips the body text " +
      "(whitespace-collapsed) for hazardous input") {
    import spark.implicits._
    val nasty = "5 < 6 && \"q\" > 'p' \t twice&nbsp;"
    val df = Seq((7L, "web", nasty)).toDF("doc_id", "source", "text")
    val got = df.select(MarkupExtract.extractText(MarkupExtract
        .synthesizePage(col("doc_id"), col("source"), col("text"))))
      .collect()(0).getString(0)
    assert(got === "doc 7 web 5 < 6 && \"q\" > 'p' twice&nbsp;")
  }

  test("q89 equals a driver-side replay of the same pipeline at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q89_markup_extract")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = graft.io.Tables.read(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
    assert(got.size === docs.length)
    docs.foreach { r =>
      val (id, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
      val collapsed = text
        .replaceAll(graft.northstar.TextAnalysis.WsClass + "+", " ").trim
      val expected = s"doc $id $src $collapsed"
        .replaceAll(graft.northstar.TextAnalysis.WsClass + "+", " ").trim
      assert(got(id) === expected.length.toLong,
        s"doc $id: clean_len ${got(id)} != ${expected.length}")
    }
  }
}
