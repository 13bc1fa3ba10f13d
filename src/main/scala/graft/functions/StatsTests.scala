package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared closed forms for the hypothesis-testing queries.
  *
  * The sandbox oracle (DuckDB) has no erf/erfc, so p-values use the
  * Abramowitz & Stegun 7.1.26 rational approximation of erfc — a pure
  * +,*,/,exp,sqrt composition both engines evaluate identically when
  * written in the same operation order (|error| < 1.5e−7, far inside
  * the 6-decimal rounding every query applies). The SQL twin of
  * [[twoSidedP]] lives next to each oracle via `twoSidedPSql`; the two
  * MUST stay structurally identical — the oracle hash-compares rounded
  * output. */
object StatsTests {

  /** Two-sided normal p-value for a z-statistic:
    * p = erfc(|z|/√2) via A&S 7.1.26. Exact enough everywhere
    * (≤1.5e−7 absolute) and monotone in |z|; underflows to 0 for
    * |z| ≳ 38 like the true tail. */
  def twoSidedP(z: Column): Column = {
    val x = abs(z) / sqrt(lit(2.0d))
    val t = lit(1.0d) / (lit(1.0d) + lit(0.3275911d) * x)
    val poly = t * (lit(0.254829592d) + t * (lit(-0.284496736d) +
      t * (lit(1.421413741d) + t * (lit(-1.453152027d) +
        t * lit(1.061405429d)))))
    poly * exp(-(x * x))
  }

  /** The DuckDB-SQL twin of [[twoSidedP]] — interpolate a z expression
    * string; keep the operation order in lockstep with the Column
    * form. */
  def twoSidedPSql(zExpr: String): String = {
    val x = s"(abs($zExpr) / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"($t * (0.254829592 + $t * (-0.284496736 + " +
      s"$t * (1.421413741 + $t * (-1.453152027 + $t * 1.061405429)))))"
    s"($poly * exp(-($x * $x)))"
  }

  /** Welch z-statistic from two groups' exact sufficient statistics
    * (counts and integer micro-unit sums): (m1−m0)/√(v1/n1+v0/n0)
    * with population variances. All four inputs are columns of exact
    * longs; the output is the double closed form in one canonical
    * order. Degenerate groups (n = 0 or both variances 0) yield NULL. */
  def welchZ(n1: Column, s1: Column, ss1: Column,
             n0: Column, s0: Column, ss0: Column): Column = {
    val dn1 = n1.cast("double"); val dn0 = n0.cast("double")
    val m1 = s1.cast("double") / dn1
    val m0 = s0.cast("double") / dn0
    val v1 = ss1.cast("double") / dn1 - m1 * m1
    val v0 = ss0.cast("double") / dn0 - m0 * m0
    // Guard the OPERAND, not the sqrt: a near-constant cohort can round
    // ss/n - m*m to a tiny negative double, and DuckDB's sqrt raises on
    // negatives (Spark would yield NaN). Both twins test vs > 0 first.
    val vs = v1 / dn1 + v0 / dn0
    when(n1 > 0 && n0 > 0 && vs > 0.0d, (m1 - m0) / sqrt(vs))
  }

  /** The DuckDB twin of [[welchZ]] over column-name strings. */
  def welchZSql(n1: String, s1: String, ss1: String,
                n0: String, s0: String, ss0: String): String = {
    val m1 = s"($s1::DOUBLE / $n1::DOUBLE)"
    val m0 = s"($s0::DOUBLE / $n0::DOUBLE)"
    val v1 = s"($ss1::DOUBLE / $n1::DOUBLE - $m1 * $m1)"
    val v0 = s"($ss0::DOUBLE / $n0::DOUBLE - $m0 * $m0)"
    val vs = s"($v1 / $n1::DOUBLE + $v0 / $n0::DOUBLE)"
    s"(CASE WHEN $n1 > 0 AND $n0 > 0 AND $vs > 0.0 " +
      s"THEN ($m1 - $m0) / sqrt($vs) END)"
  }
}
