package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The round-close COVERAGE gate: every `SparkEntry.queries` key must be
  * cited in COVERAGE.md, and the gate must actually FAIL the close on a
  * seeded gap (round 11's q115 got its row only via review — the check
  * is only worth having if a missing row is a hard error, spec-pinned).
  */
class RoundCloseSpec extends AnyFunSuite {
  import graft.tools.RoundClose.coverageRowCheck

  test("the REAL COVERAGE.md cites every live SparkEntry query id") {
    coverageRowCheck() // throws (fails the round close) on any gap
  }

  test("a seeded missing row fails the check loudly, naming the id") {
    val cov = Files.readString(java.nio.file.Paths.get("COVERAGE.md"))
    // drop every citation of one real query id and expect the failure
    val victim = SparkEntry.queries.keys.head.takeWhile(_ != '_')
    val seeded = Files.createTempFile("graft_cov", ".md")
    Files.writeString(seeded,
      cov.linesIterator.filterNot(_.contains(victim)).mkString("\n"))
    val err = intercept[IllegalArgumentException](coverageRowCheck(seeded))
    assert(err.getMessage.contains(victim),
      s"failure must name the missing id, got: ${err.getMessage}")
  }

  test("a gap-note citation does not satisfy the check (negative-marker " +
      "lines are excluded from the match)") {
    val seeded = Files.createTempFile("graft_cov", ".md")
    Files.writeString(seeded,
      "| q998 operator | real row citing q998 |\n" +
        "q999 row still TODO\n")
    // q998 cited on a real row passes; q999 only on a TODO line fails
    coverageRowCheck(seeded, Seq("q998_real"))
    val err = intercept[IllegalArgumentException](
      coverageRowCheck(seeded, Seq("q998_real", "q999_gap")))
    assert(err.getMessage.contains("q999"))
  }
}
