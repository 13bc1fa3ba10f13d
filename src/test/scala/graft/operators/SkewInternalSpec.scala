package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side math of the auto-dedup probe (package-private, so tested
  * from the operators package; no SparkSession needed). */
class SkewInternalSpec extends AnyFunSuite {

  test("estimatedDupFactor: frac=1 is the exact sample mean") {
    assert(Skew.estimatedDupFactor(300, 100, 1.0) == 3.0)
  }

  test("estimatedDupFactor: no observed duplication → 1 regardless of frac") {
    assert(Skew.estimatedDupFactor(10000, 10000, 0.01) == 1.0)
  }

  test("estimatedDupFactor inverts Poisson thinning within a few percent") {
    // True dup c, sampling fraction f → λ = c·f and the expected observed
    // mean is d = λ/(1−e^−λ). Feeding that d back must recover ≈ c.
    for ((c, f) <- Seq((100.0, 0.01), (4.0, 0.1), (50.0, 0.02), (8.0, 0.05))) {
      val lambda = c * f
      val d = lambda / (1.0 - math.exp(-lambda))
      val total = 1000000L
      val distinct = (total / d).toLong
      val est = Skew.estimatedDupFactor(total, distinct, f)
      assert(math.abs(est - c) / c < 0.05, s"c=$c f=$f est=$est")
    }
  }

  test("estimatedDupFactor: extreme duplication saturates high, never NaN") {
    val est = Skew.estimatedDupFactor(1000000, 2, 0.01)
    assert(est > 1000 && !est.isNaN)
  }
}
