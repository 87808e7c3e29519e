package graft

import org.scalatest.funsuite.AnyFunSuite

/** Board-artifact semantics — pure functions, no Spark session. */
class BenchSpec extends AnyFunSuite {

  private val bestKnown = (1 to 20).map(i => s"q$i" -> 1.0).toMap

  test("a synthetic contended history stamps contended=true; a few genuine regressions do not") {
    // 10 of 20 rows simultaneously >2x best-known and >+0.5s — the r17
    // driver-board shape two same-code sibling boards disproved
    val contendedBoard = (1 to 20).map(i =>
      s"q$i" -> (if (i <= 10) 3.0 else 1.0))
    val r1 = Bench.regressionRows(contendedBoard, Set.empty, Set.empty,
      bestKnown)
    assert(r1.size === 10)
    assert(Bench.contended(r1.size),
      "a board-wide burst must stamp the artifact contended")
    // 3 regressed rows: below the threshold — plausible real plan changes
    val sparseBoard = (1 to 20).map(i =>
      s"q$i" -> (if (i <= 3) 3.0 else 1.0))
    val r2 = Bench.regressionRows(sparseBoard, Set.empty, Set.empty,
      bestKnown)
    assert(r2.size === 3)
    assert(!Bench.contended(r2.size),
      "a few genuine regressions must NOT be dismissed as contention")
  }

  test("regression rows exclude fixture-build and failed rows, and sub-threshold deltas") {
    val board = Seq(
      "built" -> 5.0,   // cold fixture build — disclosed elsewhere
      "failed" -> 5.0,  // fast-fail time, not a serve
      "small" -> 0.9,   // >2x of 0.4 but under the +0.5s absolute floor
      "real" -> 3.0)    // a genuine regression
    val best = Map("built" -> 1.0, "failed" -> 1.0, "small" -> 0.4,
      "real" -> 1.0)
    val rows = Bench.regressionRows(board, Set("built"), Set("failed"), best)
    assert(rows.map(_._1) === Seq("real"))
    assert(rows.head._2 === 3.0 && rows.head._3 === 1.0)
  }
}
