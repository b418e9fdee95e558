package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential property pins for [[FwNum]] — the exact numeric
  * coercion behind partition pruning, seek narrowing, bucket routing
  * and record-level filter eval. The independent model is BigDecimal
  * arithmetic: whatever FwNum answers must agree with exact rational
  * comparison, and whatever it declines must be genuinely underivable
  * (fractional, NaN, infinite, or out of Long range).
  */
class FwNumSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Seq.iterate((g.pureApply(Gen.Parameters.default, Seed(42L)),
      Seed(42L).next), n) { case (_, s) =>
      (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1)

  private val genLong: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      (1L << 53) - 1, 1L << 53, (1L << 53) + 1, -(1L << 53)))

  private val genDouble: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e19, 1e19),
    Gen.chooseNum(-1e6, 1e6).map(_ + 0.5),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toDouble),
    Gen.oneOf(0.0, -0.0, 5.7, -5.7, 9.223372036854776e18,
      -9.223372036854776e18, 9.2233720368547748e18,
      Double.MaxValue, Double.MinPositiveValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))

  // scala.math.BigDecimal(double) ROUNDS to the shortest decimal repr
  // (MathContext.DECIMAL64); the independent model needs the double's
  // EXACT binary value
  private def bd(d: Double): BigDecimal =
    BigDecimal(new java.math.BigDecimal(d))

  test("exactLong returns Some only for values that ARE exact longs") {
    samples(genDouble, 2000).foreach { d =>
      FwNum.exactLong(java.lang.Double.valueOf(d)) match {
        case Some(x) =>
          assert(BigDecimal(x) === bd(d),
            s"exactLong($d) = $x is not value-equal")
        case None =>
          val exactlyLong = !d.isNaN && !d.isInfinite &&
            d == Math.rint(d) &&
            bd(d) >= BigDecimal(Long.MinValue) &&
            bd(d) <= BigDecimal(Long.MaxValue)
          assert(!exactlyLong, s"exactLong($d) declined an exact long")
      }
    }
  }

  test("cmpLong agrees with exact BigDecimal comparison for every " +
      "finite constant; NaN orders with nothing; infinities order " +
      "strictly") {
    val ls = samples(genLong, 200)
    val ds = samples(genDouble, 200)
    for (l <- ls; d <- ds) {
      val got = FwNum.cmpLong(l, java.lang.Double.valueOf(d))
      if (d.isNaN) assert(got.isEmpty, s"cmpLong($l, NaN) must decline")
      else {
        val want =
          if (d == Double.PositiveInfinity) -1
          else if (d == Double.NegativeInfinity) 1
          else BigDecimal(l).compare(bd(d))
        assert(got.map(Integer.signum).contains(Integer.signum(want)),
          s"cmpLong($l, $d) = $got, exact sign $want")
      }
    }
  }

  test("arbitrary-precision boxes are exact, never rounded through " +
      "doubleValue: 2^53+1 stays 2^53+1 and fractional/overflow " +
      "declines") {
    val p53p1 = java.math.BigDecimal.valueOf((1L << 53) + 1)
    assert(FwNum.exactLong(p53p1) === Some((1L << 53) + 1),
      "doubleValue would have rounded 9007199254740993 to ...992")
    assert(FwNum.exactLong(new java.math.BigDecimal("5.7")) === None)
    assert(FwNum.exactLong(new java.math.BigDecimal("5.00")) === Some(5L))
    val over = new java.math.BigDecimal(Long.MaxValue).add(
      java.math.BigDecimal.ONE)
    assert(FwNum.exactLong(over) === None)
    assert(FwNum.exactLong(over.toBigInteger) === None)
    assert(FwNum.exactLong(
      java.math.BigInteger.valueOf(Long.MinValue)) === Some(Long.MinValue))
    assert(FwNum.exactLong(BigDecimal((1L << 53) + 1)) ===
      Some((1L << 53) + 1))
    assert(FwNum.exactLong(BigInt(Long.MaxValue)) === Some(Long.MaxValue))
    // ordering: fractional BigDecimal above 2^53 — the double path
    // would round 9007199254740993.5 and misorder against ...993
    val frac = new java.math.BigDecimal("9007199254740993.5")
    assert(FwNum.cmpLong((1L << 53) + 1, frac) === Some(-1))
    assert(FwNum.cmpLong((1L << 53) + 2, frac) === Some(1))
    assert(FwNum.cmpLong(Long.MaxValue, over) === Some(-1))
    assert(FwNum.cmpLong(Long.MaxValue, over.toBigInteger) === Some(-1))
    assert(FwNum.cmpLong(0L, new java.math.BigDecimal("-0.5")) === Some(1))
    assert(FwNum.cmpLong(7L, BigDecimal("7.000")) === Some(0))
    assert(FwNum.cmpLong(-3L, BigInt(-3)) === Some(0))
  }

  test("integral boxes pass through exactly") {
    samples(genLong, 500).foreach { l =>
      assert(FwNum.exactLong(java.lang.Long.valueOf(l)) === Some(l))
      assert(FwNum.cmpLong(l, java.lang.Long.valueOf(l)) === Some(0))
    }
  }
}
