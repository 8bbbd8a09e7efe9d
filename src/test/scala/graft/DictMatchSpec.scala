package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{AhoCorasick, DictMatchCounts, DictReplace, GraftFunctions}

/** Aho–Corasick dictionary matching against the 1975 paper's own example
  * and the matcher's edge laws: overlapping/nested occurrences, shared
  * prefixes, dictionary entries that are substrings of each other,
  * multi-byte safety of the byte-domain scan, and the codegen'd
  * expression end-to-end.
  */
class DictMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(dict: Seq[String], text: String): Map[String, Long] = {
    val c = AhoCorasick.build(dict).countAll(UTF8String.fromString(text))
    dict.zip(c).toMap
  }

  test("the Aho–Corasick 1975 example: {he, she, his, hers} on 'ushers'") {
    assert(counts(Seq("he", "she", "his", "hers"), "ushers") ===
      Map("he" -> 1L, "she" -> 1L, "his" -> 0L, "hers" -> 1L))
  }

  test("overlapping occurrences all count: 'aa' on 'aaaa' is 3") {
    assert(counts(Seq("aa"), "aaaa") === Map("aa" -> 3L))
  }

  test("nested dictionary entries: {a, aa, aaa} on 'aaa'") {
    assert(counts(Seq("a", "aa", "aaa"), "aaa") ===
      Map("a" -> 3L, "aa" -> 2L, "aaa" -> 1L))
  }

  test("an entry that is a substring of another: both count " +
      "independently ('scan' inside 'scan scan')") {
    assert(counts(Seq("scan", "scan scan"), "scan scan scan") ===
      Map("scan" -> 3L, "scan scan" -> 2L))
  }

  test("shared prefixes resolve through fail links mid-pattern") {
    // after reading "shi" the 'she' branch fails into 'his'
    assert(counts(Seq("she", "his", "is"), "shis") ===
      Map("she" -> 0L, "his" -> 1L, "is" -> 1L))
  }

  test("byte-domain scan is multi-byte safe: an ASCII pattern never " +
      "matches inside a multi-byte character, and multi-byte patterns " +
      "match exactly") {
    // 'ぁ' is E3 81 81 — contains no ASCII byte, so 'a' must count 1
    assert(counts(Seq("a"), "ぁaぁ") === Map("a" -> 1L))
    assert(counts(Seq("ぁa"), "ぁaぁ") === Map("ぁa" -> 1L))
    assert(counts(Seq("héllo"), "héllo héllo") === Map("héllo" -> 2L))
  }

  test("no match at all yields zero counts, not absent entries") {
    assert(counts(Seq("zz", "qq"), "spark") ===
      Map("zz" -> 0L, "qq" -> 0L))
  }

  test("a 5000-entry dictionary builds and matches exactly (deep tries, " +
      "long fail chains — the million-entry memory shape in miniature)") {
    // phrases w0000…w4999 plus nested prefixes of a long run
    val dict = (0 until 5000).map(i => f"w$i%04d") ++
      (1 to 30).map("x" * _)
    val ac = AhoCorasick.build(dict)
    val text = "w0042 w4999 " + ("x" * 40) + " w0042w0042"
    val c = dict.zip(ac.countAll(UTF8String.fromString(text))).toMap
    assert(c("w0042") === 3L)
    assert(c("w4999") === 1L)
    assert(c("w0000") === 0L)
    // "x"*k in "x"*40 occurs 40-k+1 times (overlapping)
    for (k <- 1 to 30) assert(c("x" * k) === (41L - k),
      s"x^$k expected ${41 - k}")
  }

  test("build refuses empty/duplicate dictionaries loudly") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
  }

  test("the expression runs codegen'd end-to-end in a DataFrame and " +
      "NULL text yields NULL counts") {
    val dict = Seq("he", "she", "hers")
    val df = Seq((1L, "ushers she"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val c = GraftBridge.toColumn(
      DictMatchCounts(GraftBridge.toExpression(col("t")), dict))
    // "ushers she": he at ushErs + sHE = 2; she at uSHErs + " she" = 2;
    // hers at usHERS = 1
    val rows = df.select(col("id"), c.as("c")).orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) === Seq(2L, 2L, 1L))
    assert(rows(1).isNullAt(1))
    // and the posexplode consumer shape q115 uses
    val exploded = df.filter(col("t").isNotNull)
      .select(col("id"), posexplode(c).as(Seq("pid", "n")))
      .filter(col("n") > 0).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(exploded === Set((0, 2L), (1, 2L), (2, 1L)))
  }

  // ------------------------------------------------ leftmost-longest replace

  private def rep(dict: Seq[String], text: String, r: String = "<R>") =
    AhoCorasick.build(dict)
      .replaceLeftmostLongest(
        org.apache.spark.unsafe.types.UTF8String.fromString(text),
        r.getBytes("UTF-8")).toString

  test("replaceLeftmostLongest: the overlap laws — leftmost wins over " +
      "longer-but-later, longest wins at the same start, chosen spans " +
      "consume overlapping starts") {
    // leftmost beats longer-but-later: ab@0 wins, bcd is consumed
    assert(rep(Seq("ab", "bcd"), "abcd") === "<R>cd")
    // longest at the same start wins over its own prefix
    assert(rep(Seq("scan", "scan scan"), "scan scan scan") === "<R> <R>")
    // fail-link match: she@1 wins; he/hers start inside it and are consumed
    assert(rep(Seq("he", "she", "hers"), "ushers") === "u<R>rs")
    // self-overlapping phrase: occurrences after a replacement restart
    // AFTER it — "aa" on "aaaa" replaces twice, never three times
    assert(rep(Seq("aa"), "aaaa") === "<R><R>")
    // adjacent, non-overlapping: all replaced
    assert(rep(Seq("ab"), "ababab") === "<R><R><R>")
    // no match: text unchanged; empty replacement deletes
    assert(rep(Seq("zz"), "abc") === "abc")
    assert(rep(Seq("b"), "abc", r = "") === "ac")
  }

  test("replaceLeftmostLongest agrees with an independent greedy " +
      "reference on an adversarial fixture sweep") {
    // plain-String reference: earliest start, longest phrase there
    def ref(dict: Seq[String], text: String, r: String): String = {
      val sb = new StringBuilder
      var c = 0
      while (c < text.length) {
        val starts = dict.flatMap { p =>
          val i = text.indexOf(p, c)
          if (i >= 0) Some((i, p.length)) else None
        }
        if (starts.isEmpty) { sb.append(text.substring(c)); c = text.length }
        else {
          val (s, _) = starts.minBy(_._1)
          val l = starts.filter(_._1 == s).map(_._2).max
          sb.append(text.substring(c, s)).append(r)
          c = s + l
        }
      }
      sb.toString
    }
    val dict = graft.queries.NorthStarQueries.DictPhrases
    val texts = Seq(
      "table table table scan scan scan spark",
      "a a a a scan scan hash join window table table",
      "the line sort column scan query big stream window spark",
      "scanscan scan scana a a", "hash hash join joins", "",
      "sort columnsort column", "value fastvalue fast group value")
    for (t <- texts)
      assert(rep(dict, t) === ref(dict, t, "<R>"), s"text: '$t'")
  }

  test("dict_replace is multi-byte safe and SQL-callable; NULL text " +
      "yields NULL; malformed dictionaries fail at analysis") {
    // multi-byte: the pattern must not match inside a multi-byte char,
    // and replacements splice on char boundaries
    assert(rep(Seq("é"), "café café") === "caf<R> caf<R>")
    assert(rep(Seq("ab"), "aéb ab") === "aéb <R>")
    val df = Seq((1L, "ushers she"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val c = GraftBridge.toColumn(DictReplace(
      GraftBridge.toExpression(col("t")), Seq("he", "she", "hers"), "<R>"))
    val rows = df.select(col("id"), c.as("r")).orderBy("id").collect()
    assert(rows(0).getString(1) === "u<R>rs <R>")
    assert(rows(1).isNullAt(1))
    GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT dict_replace('ushers', array('he','she','hers'), '<R>')")
      .head.getString(0) === "u<R>rs")
    val dup = intercept[Exception](spark.sql(
      "SELECT dict_replace('x', array('a','a'), 'r')").collect())
    assert(dup.getMessage.contains("distinct"))
  }
}
