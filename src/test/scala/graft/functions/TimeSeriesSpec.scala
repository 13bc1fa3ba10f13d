package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** [[TimeSeries]] closed forms against hand-computed values on tiny
  * series, plus the structural guarantees (complete-case pairs,
  * degenerate-series NULLs, incomplete-block drops). */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def series(xs: Seq[Long]): DataFrame =
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("i", "x")

  test("acf: perfectly alternating series has r = -1 at lag 1 and " +
    "+1 at lag 2 (up to the global-mean estimator's finite-n bias)") {
    // 1,3,1,3,... mean = 2, every deviation ±1: lag-1 products all -1,
    // lag-2 products all +1; denominator n (=8), numerators n-k.
    val r = TimeSeries.acf(series(Seq(1L, 3L, 1L, 3L, 1L, 3L, 1L, 3L)),
      "i", "x", 2).collect().map(row =>
        row.getLong(0) -> row.getDouble(2)).toMap
    assert(r(1L) == -0.875) // -(n-1)/n
    assert(r(2L) == 0.75)   //  (n-2)/n
  }

  test("acf: constant series yields NULL r (zero denominator), " +
    "significant = false") {
    val rows = TimeSeries.acf(series(Seq(5L, 5L, 5L, 5L)), "i", "x", 2)
      .collect()
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.forall(!_.getBoolean(3)))
  }

  test("crossCorrelation: a shifted copy peaks exactly at its shift " +
    "and flags it best") {
    // b_t = a_{t-2} (a leads b by 2): r = 1 at lag +2.
    val a = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L, 6L, 2L)
    val b = a.map(_ + 10L) // affine copy, same correlation
    val af = series(a)
    val bf = b.zipWithIndex.map { case (x, i) => ((i + 2).toLong, x) }
      .toDF("i", "x")
    val rows = TimeSeries.crossCorrelation(af, bf, "i", "x", "x", 3)
      .collect()
    val at2 = rows.find(_.getLong(0) == 2L).get
    assert(at2.getDouble(2) == 1.0 && at2.getBoolean(3))
    assert(rows.count(_.getBoolean(3)) == 1)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (-3L to 3L))
  }

  test("cusum: mean-shift series peaks at the shift point; constant " +
    "series yields NULL cusum and no spurious peak") {
    // 5 lows then 5 highs: |S| maximal at the last low index (idx 4).
    val shifted = TimeSeries.cusum(
      series(Seq(1L, 1L, 1L, 1L, 1L, 9L, 9L, 9L, 9L, 9L)), "i", "x")
      .collect()
    assert(shifted.filter(_.getBoolean(3)).map(_.getLong(0)).toSeq == Seq(4L))
    val flat = TimeSeries.cusum(series(Seq(2L, 2L, 2L)), "i", "x").collect()
    assert(flat.forall(_.isNullAt(2)))
    assert(flat.forall(!_.getBoolean(3)))
  }

  test("cusum is exact under any partitioning of the input") {
    val xs = (1L to 97L).map(i => (i * 37L) % 11L)
    val one = TimeSeries.cusum(series(xs).coalesce(1), "i", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val many = TimeSeries.cusum(series(xs).repartition(7), "i", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(one == many)
  }

  test("haarEnergy: level energies match the hand computation and " +
    "incomplete edge blocks are dropped") {
    // 8 points: level 0 pairs (1,5)(2,6)(3,7)(4,8) → c = -4 each,
    // energy 64; level 1 halves (1,5|2,6),(3,7|4,8): sums 6 vs 8 and
    // 10 vs 12 → c = -1 each, energy 2; level 2: 14 vs 22 → c = -2,
    // energy 4. A 9th point leaves every level's tail incomplete.
    val rows = TimeSeries.haarEnergy(
      series(Seq(1L, 5L, 2L, 6L, 3L, 7L, 4L, 8L, 100L)), "i", "x", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(0L) == ((2L, 4L, 64.0)))
    assert(rows(1L) == ((4L, 2L, 2.0)))
    assert(rows(2L) == ((8L, 1L, 4.0)))
  }

  test("statsTests: two-sided normal p-values match known quantiles " +
    "within the A&S 7.1.26 tolerance") {
    val p = Seq(0.0d, 1.959963985d, 2.575829304d).toDF("z")
      .select(StatsTests.twoSidedP(org.apache.spark.sql.functions.col("z"))
        .as("p")).collect().map(_.getDouble(0))
    assert(math.abs(p(0) - 1.0) < 2e-7)
    assert(math.abs(p(1) - 0.05) < 2e-7)
    assert(math.abs(p(2) - 0.01) < 2e-7)
  }

  test("statsTests: welchZ matches the closed form and guards " +
    "degenerate groups") {
    import org.apache.spark.sql.functions._
    // Group 1: n=4, sum=20, ss=120 (mean 5, var 5); group 0: n=5,
    // sum=10, ss=30 (mean 2, var 2): z = 3/sqrt(5/4+2/5) = 2.3354968…
    val df = Seq((4L, 20L, 120L, 5L, 10L, 30L)).toDF(
      "n1", "s1", "ss1", "n0", "s0", "ss0")
    val z = df.select(StatsTests.welchZ(col("n1"), col("s1"), col("ss1"),
      col("n0"), col("s0"), col("ss0")).as("z")).head.getDouble(0)
    assert(math.abs(z - 3.0d / math.sqrt(5.0 / 4.0 + 2.0 / 5.0)) < 1e-12)
    val degen = Seq((3L, 6L, 12L, 3L, 6L, 12L)).toDF(
      "n1", "s1", "ss1", "n0", "s0", "ss0") // both variances 0
    assert(degen.select(StatsTests.welchZ(col("n1"), col("s1"), col("ss1"),
      col("n0"), col("s0"), col("ss0")).as("z")).head.isNullAt(0))
    // Upstream quantization can push ss/n - m*m NEGATIVE (here exactly
    // -0.25 per group); the guard must test the operand (vs > 0), not
    // sqrt's output, or the DuckDB twin raises on sqrt(negative).
    val neg = Seq((4L, 6L, 8L, 4L, 6L, 8L))
      .toDF("n1", "s1", "ss1", "n0", "s0", "ss0")
    assert(neg.select(StatsTests.welchZ(col("n1"), col("s1"), col("ss1"),
      col("n0"), col("s0"), col("ss0")).as("z")).head.isNullAt(0))
  }
}
