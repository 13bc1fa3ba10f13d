package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality verification (the Deequ / "expectations" shape):
  * a declared rule set compiles to a SINGLE aggregation over the table,
  * and the one metrics row melts into a (rule, metric, passed) report.
  *
  * Why this shape at 100 TB: every rule is an aggregate expression, so
  * the whole suite costs exactly one partially-aggregated scan — the
  * metrics row that crosses the exchange is as wide as the rule count,
  * never as tall as the data. Running n rules as n queries re-reads the
  * table n times; collecting data to validate driver-side is not a
  * shape at all. Rules whose metric needs a distinct count (uniqueness)
  * use exact count_distinct — Spark plans the expand + two-level
  * aggregate; the approx tier (qa6's HLL) is the documented fallback
  * when a key column's cardinality makes exact too expensive.
  *
  * The pass predicate evaluates on the final metric value (post-agg, a
  * scalar), so thresholds cost nothing. Metrics are DOUBLE; fraction
  * metrics round(…, 6) in the rule definition so the report replays
  * bit-identically in an external engine.
  *
  * Sibling of [[DataQuality]] (the split Deequ itself makes): this
  * suite judges metric FRACTIONS against thresholds — the monitoring
  * currency; DataQuality publishes exact per-rule VIOLATION COUNTS and
  * the cross-relation foreign-key check. Dashboards and tolerances
  * here; hard contracts and row-accountable audits there.
  */
object Expectations {

  /** One rule: a name, an aggregate metric expression (must resolve to a
    * numeric scalar over the whole input), and a pass predicate applied
    * to the computed metric. */
  final case class Expectation(name: String, metric: Column,
                               pass: Column => Column)

  /** Completeness: fraction of non-null values, rounded to 6 places. */
  def completeness(c: Column): Column =
    round(avg(when(c.isNotNull, 1.0d).otherwise(0.0d)), 6)

  /** Uniqueness: distinct / total, rounded to 6 places (1.0 = key). */
  def uniqueness(c: Column): Column =
    round(count_distinct(c).cast("double") / count(lit(1)).cast("double"), 6)

  /** Fraction of rows satisfying an arbitrary predicate. */
  def satisfies(p: Column): Column =
    round(avg(when(p, 1.0d).otherwise(0.0d)), 6)

  /** Uniqueness at the streaming/ultra-high-cardinality tier: exact
    * count_distinct is not a streaming aggregate (and at 100 TB the
    * expand can dominate the suite), so this variant rides the HLL
    * sketch. ±2% default error — pair it with a threshold that has
    * slack, and keep [[uniqueness]] for batch audits. */
  def uniquenessApprox(c: Column): Column =
    round(approx_count_distinct(c).cast("double") /
      count(lit(1)).cast("double"), 6)

  /** Run the suite: one aggregation job, one report row per rule.
    * Output columns: rule STRING, metric DOUBLE, passed BOOLEAN. */
  def run(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val row = df.agg(metricAggs(checks).head, metricAggs(checks).tail: _*)
    row.select(inline(array(reportItems(checks): _*)))
  }

  /** Per-group suite — the data-quality report at the partition/source
    * grain ("which FEED went bad", the q103 philosophy applied to
    * verification): still ONE aggregation job, now grouped, so the
    * exchange carries one metrics row per group and the report is
    * (group, rule, metric, passed). A per-group loop of [[run]] would
    * re-scan the table once per group. */
  def runGrouped(df: DataFrame, groupCol: String,
                 checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val row = df.groupBy(col(groupCol))
      .agg(metricAggs(checks).head, metricAggs(checks).tail: _*)
    row.select(col(groupCol), inline(array(reportItems(checks): _*)))
  }

  /** Functional-dependency audit: does `lhs` determine `rhs`? For each
    * declared FD, one summary row: the number of distinct lhs values,
    * how many of them map to more than one rhs (violations), the worst
    * fan-out, and the verdict.
    *
    * Scale shape: each FD is a two-column scan (projection pushed to
    * the parquet footer) → one (lhs, rhs)-distinct pre-aggregate → one
    * lhs-grouped count — partial-agg-safe hash aggregates the whole
    * way, no window, no join, nothing driver-side. FDs group by
    * DIFFERENT keys, so they are separate two-column scans by nature
    * (not a suite defect — a single pass cannot share a grouping); run
    * the audit per ingest batch, not per query.
    */
  def fdAudit(df: DataFrame,
              fds: Seq[(String, String, String)]): DataFrame = {
    require(fds.nonEmpty, "empty FD list")
    fds.map { case (name, lhs, rhs) =>
      df.select(col(lhs).as("l"), col(rhs).as("r")).distinct()
        .groupBy(col("l")).agg(count(lit(1)).as("fanout"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("fanout") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("fanout")).as("max_fanout"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          col("max_fanout"), (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  private def metricAggs(checks: Seq[Expectation]): Seq[Column] =
    checks.zipWithIndex.map { case (c, i) => c.metric.cast("double").as(s"m$i") }

  private def reportItems(checks: Seq[Expectation]): Seq[Column] =
    checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("rule"), col(s"m$i").as("metric"),
        c.pass(col(s"m$i")).as("passed"))
    }
}
