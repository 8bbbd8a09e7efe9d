package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Strings

/** V1 goldens — reference src/ETL/TestCommonFunctions.py:36-61. */
class StringsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture =
    Seq((1, "  test #   1231phrase 1/2   /"), (2, "   test!!!! 989   "))
      .toDF("id", "string")

  test("default mode strips non-letters and normalizes") {
    val got = Strings.cleanStringInDf(fixture, "string")
    TestSpark.assertSameRows(got,
      Seq(Seq(1, "Test Phrase"), Seq(2, "Test")))
  }

  test("new-column mode keeps the original") {
    val got = Strings.cleanStringInDf(fixture, "string", Some("new_col"))
    TestSpark.assertSameRows(got, Seq(
      Seq(1, "  test #   1231phrase 1/2   /", "Test Phrase"),
      Seq(2, "   test!!!! 989   ", "Test")))
  }

  test("address mode keeps digits and slashes between digits") {
    val got = Strings.cleanStringInDf(fixture, "string", isAddress = true)
    TestSpark.assertSameRows(got,
      Seq(Seq(1, "Test 1231phrase 1/2"), Seq(2, "Test 989")))
  }

  test("idempotence: clean(clean(x)) == clean(x)") {
    val once = Strings.cleanStringInDf(fixture, "string")
    val twice = Strings.cleanStringInDf(once, "string")
    assert(TestSpark.rows(once) == TestSpark.rows(twice))
  }
}
