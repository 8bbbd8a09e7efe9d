package graft.tools

import java.nio.file.{Files, Paths}

/** One-invocation round-close artifact runner (round-8 verdict item 3:
  * round 8 committed no ACCURACY_r08, no PLANAUDIT_r08, no TESTTIME row
  * and a stale COVERAGE footer — artifact gaps are how regressions hide,
  * so the round protocol's outputs must be un-skippable). Emits, in
  * order:
  *
  *   1. `PLANAUDIT_r{NN}.json` — the whole-surface plan census, merging
  *      `BENCH_DETAIL.json`'s measured shuffle bytes when present;
  *   2. the regenerated COVERAGE.md Totals footer ([[CoverageFooter]]
  *      with the executed-case count, so the query/oracle/test tallies
  *      can never drift from `SparkEntry`);
  *   3. a TESTTIME.md row for the round's `sbt test` run (idempotent:
  *      re-running the close replaces the round's row, never duplicates);
  *   4. `ACCURACY_r{NN}.json` LAST — [[Accuracy]] exits 1 on any failed
  *      gate, so every other artifact lands regardless and a red gate
  *      still fails the whole close loudly.
  *
  * Usage (the numbers come from the round's `sbt -batch test` output —
  * "Tests: succeeded N" / "Suites: completed S" / measured wall):
  *
  * {{{
  *   sbt -batch "runMain graft.tools.RoundClose <NN> <succeeded> <suites> <wallSec> [note...]"
  * }}}
  *
  * or in one command including the test run: `tools/round_close.sh <NN>
  * [note...]`.
  */
object RoundClose {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: RoundClose <NN> <testsSucceeded> <suites> <wallSec> [note...]")
    val nn = args(0)
    val succeeded = args(1).toInt
    val suites = args(2).toInt
    val wallSec = args(3).toInt
    val note = args.drop(4).mkString(" ")
    // FIRST: a query without a COVERAGE row is the drift this runner
    // exists to prevent (round 9 closed with q109/q110 undocumented) —
    // fail before any artifact is written so the gap cannot be missed
    coverageRowCheck()
    PlanAudit.main(Array(s"PLANAUDIT_r$nn.json", "BENCH_DETAIL.json"))
    CoverageFooter.main(Array(succeeded.toString))
    testtimeRow(nn, succeeded, suites, wallSec, note)
    // Accuracy exits 1 on a failed gate (scaladoc) — a failed close must
    // NOT have consumed the bests accumulator or overwritten the prior
    // baselines, so the roll runs only after every gate passes
    Accuracy.main(Array(s"ACCURACY_r$nn.json"))
    rollBenchPriors()
  }

  /** Every `SparkEntry.queries` key must be cited in COVERAGE.md (by its
    * qNN id — rows and the §-cluster lines both cite that form). A
    * citation on a line that reads as a GAP note ("q113 row still TODO",
    * "q109/q110 were undocumented") must NOT satisfy the check — that is
    * exactly the drift it exists to catch — so negative-marker lines are
    * excluded from the match. Throws with the full missing list.
    */
  private[graft] def coverageRowCheck(
      covPath: java.nio.file.Path = Paths.get("COVERAGE.md"),
      queryKeys: Seq[String] = graft.SparkEntry.queries.keys.toSeq): Unit = {
    // deliberately SHARP markers: broad ones ("missing", "no row")
    // collide with legitimate row prose ("no row-level DLQ", "a
    // survivor missing") and turn the guard into a false alarm
    val negative = Seq("todo", "undocumented")
    val lines = Files.readAllLines(covPath)
    val citable = new StringBuilder
    lines.forEach { l =>
      if (!negative.exists(l.toLowerCase.contains)) {
        citable.append(l).append('\n'); ()
      }
    }
    val cov = citable.toString
    val ids = queryKeys
      .map(_.takeWhile(_ != '_')).distinct.sorted
    val missing = ids.filterNot(id =>
      ("""\b""" + id + """\b""").r.findFirstIn(cov).nonEmpty)
    require(missing.isEmpty,
      s"$covPath cites no row for: ${missing.mkString(", ")} — add " +
        "coverage rows before closing the round")
    println(s"round_close: COVERAGE cites all ${ids.length} query ids")
  }

  /** The round-rollover half of BASELINE.md's regression protocol,
    * previously manual and skipped two rounds running (the detector was
    * still comparing against round-7 bests): the closing round's
    * accumulated steal-clean bests become the NEXT round's prior
    * baseline, the detail record becomes the prior volume census, and
    * the bests accumulator resets so next round folds fresh.
    */
  private def rollBenchPriors(): Unit = {
    val bests = Paths.get("BENCH_BESTS.json")
    val detail = Paths.get("BENCH_DETAIL.json")
    if (Files.exists(bests)) {
      Files.copy(bests, Paths.get("BENCH_BESTS_PRIOR.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.delete(bests)
      println("round_close: rolled BENCH_BESTS.json -> BENCH_BESTS_PRIOR.json")
    } else println("round_close: no BENCH_BESTS.json to roll (no bench ran?)")
    if (Files.exists(detail)) {
      Files.copy(detail, Paths.get("BENCH_DETAIL_PRIOR.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println("round_close: rolled BENCH_DETAIL.json -> BENCH_DETAIL_PRIOR.json")
    }
  }

  private def testtimeRow(nn: String, succeeded: Int, suites: Int,
      wallSec: Int, note: String): Unit = {
    val path = Paths.get("TESTTIME.md")
    val lines = Files.readString(path).split("\n", -1).toVector
    val mins = f"${wallSec / 60.0}%.1f"
    val mode = "8 parallel group JVMs, warm sbt" +
      (if (note.nonEmpty) s", $note" else "")
    val row = s"| ${java.time.LocalDate.now()} (r$nn) | $mode | " +
      s"$succeeded/$succeeded green, $suites suites | **$mins min** " +
      s"($wallSec s) |"
    // idempotent per round: an existing (rNN) row is replaced in place
    val prior = lines.indexWhere(l => l.startsWith("|") &&
      l.contains(s"(r$nn)"))
    val out =
      if (prior >= 0) lines.updated(prior, row)
      else {
        val lastRow = lines.lastIndexWhere(_.startsWith("|"))
        require(lastRow >= 0, "TESTTIME.md has no table to append to")
        (lines.take(lastRow + 1) :+ row) ++ lines.drop(lastRow + 1)
      }
    Files.writeString(path, out.mkString("\n"))
    println(row)
  }
}
