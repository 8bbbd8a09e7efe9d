package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: a session built with GraftExtensions has
  * cosine_sim available in SQL without manual registration; GraftCatalog
  * makes the testdata drivable from pure SQL.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  test("withExtensions injects cosine_sim into a fresh session") {
    base.sparkContext // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      val r = extended.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(0.5d, 0.0d))").head.getDouble(0)
      assert(r == 1.0)
      val d = extended.sql(
        "SELECT dot_product(array(2.0d, 3.0d), array(4.0d, 5.0d))").head.getDouble(0)
      assert(d == 23.0)
      val sh = extended.sql(
        "SELECT size(shingle_hashes('a b c d', 3))").head.getInt(0)
      assert(sh == 2)
      // the dictionary parameterizes the automaton: array of string
      // LITERALS folds at plan time, counts are per-phrase positional
      val dm = extended.sql(
        "SELECT dict_match_counts('ushers she', array('he','she','hers'))")
        .head.getSeq[Long](0)
      assert(dm == Seq(2L, 2L, 1L))
      val err = intercept[Exception](extended.sql(
        "SELECT dict_match_counts(t, array(t)) FROM (SELECT 'x' AS t)")
        .collect())
      assert(err.getMessage.contains("string literals"),
        s"non-literal dictionary must fail loudly, got: ${err.getMessage}")
      // wrong arity surfaces the signature, not IndexOutOfBounds
      val ar = intercept[Exception](extended.sql(
        "SELECT dict_match_counts('x')").collect())
      assert(ar.getMessage.contains("dict_match_counts(text"),
        s"one-arg call must name the signature, got: ${ar.getMessage}")
      // a null ELEMENT in a folded array literal gets the loud literal
      // error, never a raw NullPointerException
      val ne = intercept[Exception](extended.sql(
        "SELECT dict_match_counts('x', array('a', NULL))").collect())
      assert(ne.getMessage.contains("string literals"),
        s"null dictionary element must fail loudly, got: ${ne.getMessage}")
      // duplicate dictionary entries fail at ANALYSIS time (typed check),
      // not first-eval deep in codegen
      val dup = intercept[Exception](extended.sql(
        "SELECT dict_match_counts('x', array('a', 'a'))").collect())
      assert(dup.getMessage.contains("distinct"),
        s"duplicate dictionary must fail at analysis, got: ${dup.getMessage}")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("GraftCatalog enables pure-SQL querying of the testdata") {
    GraftCatalog.registerAll(base, "/root/testdata/sf0.001")
    val n = base.sql(
      """SELECT count(*) FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey""")
      .head.getLong(0)
    assert(n == 150)
  }

  test("token_collision_stats is SQL-callable after registration") {
    GraftCatalog.registerAll(base, "/root/testdata/sf0.001")
    val r = base.sql(
      "SELECT token_collision_stats('a a a b b c') AS f").head.getStruct(0)
    assert((r.getLong(0), r.getLong(1)) == ((14L, 3L)))
  }

  test("vec_sub is SQL-callable and NULL-intolerant on length mismatch") {
    GraftCatalog.registerAll(base, "/root/testdata/sf0.001")
    val r = base.sql(
      "SELECT vec_sub(array(3.0d, 5.0d), array(1.0d, 1.5d)) AS d")
      .head.getSeq[Double](0)
    assert(r == Seq(2.0, 3.5))
    assert(base.sql(
      "SELECT vec_sub(array(1.0d), array(1.0d, 2.0d)) AS d").head.isNullAt(0))
  }
}
