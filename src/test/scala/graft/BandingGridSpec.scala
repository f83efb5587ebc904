package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins the [[Dedup.bandsForRows]] recall contract as executable math —
  * the scaladoc claims "≥ the (8, 8) baseline pointwise on cos ∈
  * [0.85, 1], verified on a 0.001-step grid, zero violations", and until
  * this spec that verification lived offline: a future table edit could
  * have silently broken the pointwise ≥. Two checks:
  *
  *  1. GRID: for every rung (rows, bands) in the table, the S-curve
  *     recall 1 − (1 − p(c)^rows)^bands is ≥ the (8, 8) baseline at
  *     every c in 0.850, 0.851, …, 1.000 (p(c) = 1 − arccos(c)/π, the
  *     sign-random-projection collision probability).
  *  2. DERIVATION: each pinned band count equals the documented
  *     max-over-anchors formula at c ∈ {0.95, 0.85} — so the table stays
  *     the dual-anchor derivation, not a hand-tuned drift of it.
  */
class BandingGridSpec extends AnyFunSuite {

  private def p(c: Double): Double = 1.0 - math.acos(c) / math.Pi
  private def recall(c: Double, rows: Int, bands: Int): Double =
    1.0 - math.pow(1.0 - math.pow(p(c), rows), bands)

  test("every rung's recall >= the (8,8) baseline on the 0.001 grid of " +
      "[0.85, 1.0]") {
    for (((rows, bands), _) <- Dedup.bandsForRows.toSeq.sorted.zipWithIndex) {
      var worst = Double.MaxValue
      var worstC = 0.0
      var i = 850
      while (i <= 1000) {
        val c = i / 1000.0
        val margin = recall(c, rows, bands) - recall(c, 8, 8)
        if (margin < worst) { worst = margin; worstC = c }
        i += 1
      }
      // strict grid check — the contract is >= with no epsilon slack:
      // the derivation's ceil() gives the adaptive curve genuine margin
      // at both anchors, and the at-most-one-crossing argument carries
      // that margin across the interval
      assert(worst >= 0.0,
        f"rung rows=$rows bands=$bands drops below the (8,8) baseline " +
          f"at cos=$worstC%.3f (margin $worst%.2e)")
    }
  }

  test("pinned band counts equal the dual-anchor derivation") {
    val anchors = Seq(0.95, 0.85)
    for ((rows, bands) <- Dedup.bandsForRows.toSeq.sorted) {
      val derived = anchors.map { c =>
        val r8 = recall(c, 8, 8)
        // 1e-9 slack before ceil: at rows=8 the exact ratio is the
        // integer 8 (ln((1−p⁸)⁸)/ln(1−p⁸)), and float round-trip through
        // r8 lands epsilon above it — "bands(8)=8 by construction" in the
        // table's scaladoc is this exact-integer case, not a deviation
        math.ceil(math.log(1.0 - r8) / math.log(1.0 - math.pow(p(c), rows))
          - 1e-9).toInt
      }.max
      assert(derived == bands,
        s"rows=$rows: table pins bands=$bands but the dual-anchor " +
          s"derivation gives $derived — table and scaladoc have drifted")
    }
  }
}
