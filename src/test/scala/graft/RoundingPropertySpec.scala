package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the r14 exact-integer 6-dp rounding rule
  * (c80/c81/d37/d38): `intRound(s, n) = sign(s)·((2·|s| + n) div (2·n))`
  * — the formula both engines evaluate in exact integer arithmetic —
  * must equal decimal half-away-from-zero division (what Spark's
  * `round(x, 6)` means), INCLUDING the exact .5-tie class where Spark's
  * decimal HALF_UP and DuckDB's double-rounding disagree by 1 ulp (the
  * divergence that hash-failed c80's first sf0.01 rehearsal and
  * motivated the rule). Deterministic seeds — failures reproduce. */
class RoundingPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** The Scala mirror of the SQL `(2*s + n) div (2*n)` abs/negate form
    * (operands nonnegative per branch, so `div` = floor = truncate in
    * both engines). */
  private def intRound(s: Long, n: Long): Long = {
    val r = (2 * math.abs(s) + n) / (2 * n)
    if (s >= 0) r else -r
  }

  test("integer half-away-from-zero equals BigDecimal HALF_UP on random and tie inputs") {
    val gen = for {
      s <- Gen.chooseNum(-1000000000000L, 1000000000000L)
      n <- Gen.chooseNum(1L, 1000000L)
    } yield (s, n)
    val adversarial = Seq[(Long, Long)](
      (1L, 2L), (-1L, 2L), (3L, 2L), (-3L, 2L), (5L, 10L), (-5L, 10L),
      (2500000L, 1000000L), (-2500000L, 1000000L), (0L, 1L), (0L, 7L),
      (999999L, 1000000L), (-999999L, 1000000L))
    ((0 until 2000).map(i => sample(gen, 7000L + i)) ++ adversarial)
      .foreach { case (s, n) =>
        val want = java.math.BigDecimal.valueOf(s)
          .divide(java.math.BigDecimal.valueOf(n), 0,
            java.math.RoundingMode.HALF_UP)
          .longValueExact()
        assert(intRound(s, n) == want, s"s=$s n=$n")
      }
  }

  test("the engine-splitting tie class: exact x.5 quotients round away from zero") {
    // sum/n landing on exact halves — n even, s = k·n + n/2 — is where a
    // double-rounding engine can emit x (toward zero) while decimal
    // HALF_UP emits x+1; the integer formula is unambiguous
    Seq(2L, 10L, 128L, 1000000L).foreach { n =>
      (0L to 40L).foreach { k =>
        val s = k * n + n / 2
        assert(intRound(s, n) == k + 1, s"n=$n k=$k")
        assert(intRound(-s, n) == -(k + 1), s"n=$n k=-$k")
      }
    }
  }
}
