package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the contract gate a pipeline runs
  * before trusting a batch or publishing a table (the Deequ/dbt-test
  * shape, re-expressed Spark-first): every scalar check compiles to a
  * conditional-count aggregate expression, so an arbitrary number of
  * checks costs ONE scan + ONE single-row aggregate per table; the
  * result melts to a (check, violations, passed) report frame.
  * Uniqueness rides the same aggregate (rows − distinct keys);
  * referential integrity is the one check that genuinely needs a second
  * relation and runs as an anti-join against the parent's key
  * projection.
  *
  * Sibling of [[Expectations]], deliberately split the way Deequ splits
  * constraints from metrics: Expectations publishes THRESHOLD-judged
  * METRIC FRACTIONS (completeness 0.98 ≥ 0.95 → pass — the monitoring
  * currency, with a grouped and an approx-distinct tier), while this
  * suite publishes EXACT VIOLATION COUNTS per typed rule plus the
  * cross-relation [[ForeignKey]] check Expectations' single-aggregate
  * shape cannot express. Use Expectations for dashboards and tolerances,
  * DataQuality for hard contracts and row-accountable audits.
  *
  * Violation counts are exact integers — the report is
  * partition-count- and replay-identical, and each check is trivially
  * replayable as oracle SQL. */
object DataQuality {

  sealed trait Check { def name: String }
  /** `violations` = rows where `cond` holds (the FAILURE predicate). */
  final case class Predicate(name: String, cond: Column) extends Check
  final case class NotNull(colName: String) extends Check {
    def name = s"not_null($colName)"
  }
  final case class InRange(colName: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($colName,$lo,$hi)"
  }
  final case class Accepted(colName: String, values: Seq[String]) extends Check {
    def name = s"accepted($colName)"
  }
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Child rows whose key has no match in `parentKeys` (pass the
    * parent's key projection; it is deduplicated here). */
  final case class ForeignKey(childCols: Seq[String], parentKeys: DataFrame,
                              parentCols: Seq[String]) extends Check {
    def name = s"foreign_key(${childCols.mkString(",")})"
  }

  private def violationExpr(c: Check): Option[Column] = c match {
    case Predicate(_, cond) => Some(sum(when(cond, 1L).otherwise(0L)))
    case NotNull(cn) => Some(sum(when(col(cn).isNull, 1L).otherwise(0L)))
    // STRICT-NULL convention, deliberately diverging from Deequ/dbt
    // (where range/accepted checks pass NULLs and not_null owns them):
    // these are hard CONTRACTS — "every value is in [lo,hi]" — and a
    // NULL does not satisfy that, so it counts as a violation here.
    // Consequence: a nullable column under both NotNull and InRange
    // double-counts its NULLs across the two checks; add NotNull only
    // when you want NULLs reported separately as well. Use
    // [[Expectations]] for the tolerant metric-fraction style.
    case InRange(cn, lo, hi) => Some(sum(when(col(cn).isNull ||
      col(cn) < lo || col(cn) > hi, 1L).otherwise(0L)))
    case Accepted(cn, vs) => Some(sum(when(col(cn).isNull ||
      !col(cn).isin(vs: _*), 1L).otherwise(0L)))
    // Rows with any NULL key component count as violations (a NULL key
    // cannot witness uniqueness), matching the SQL-replay convention
    // `count(*) - count(DISTINCT key)`: the distinct count sees only
    // fully-non-null keys.
    case Unique(cols_) => Some(count(lit(1)) -
      countDistinct(when(cols_.map(col(_).isNotNull).reduce(_ && _),
        struct(cols_.map(col): _*))))
    case _: ForeignKey => None
  }

  /** Run `checks` against `df` → (check, violations, passed), one row
    * per check, deterministic order by check name. All aggregate checks
    * share one scan; each [[ForeignKey]] adds one anti-join job. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val spark = df.sparkSession
    val aggChecks = checks.flatMap(c => violationExpr(c).map(c.name -> _))
    val aggReport: Option[DataFrame] =
      if (aggChecks.isEmpty) None
      else {
        val row = df.agg(aggChecks.head._2.as("c0"),
          aggChecks.tail.zipWithIndex.map { case ((_, e), i) =>
            e.as(s"c${i + 1}") }: _*)
        // melt the single aggregate row to report rows
        Some(row.select(explode(array(aggChecks.zipWithIndex.map {
          case ((n, _), i) => struct(lit(n).as("check"),
            coalesce(col(s"c$i"), lit(0L)).as("violations"))
        }: _*)).as("r")).select(col("r.check"), col("r.violations")))
      }
    val fkReports = checks.collect { case fk: ForeignKey =>
      val parent = fk.parentKeys
        .select(fk.parentCols.zip(fk.childCols).map { case (p, c) =>
          col(p).as(c) }: _*).distinct()
      df.select(fk.childCols.map(col): _*)
        .join(parent, fk.childCols, "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(fk.name).as("check"), col("violations"))
    }
    val all = (aggReport.toSeq ++ fkReports).reduce(_ unionByName _)
    all.withColumn("passed", col("violations") === 0L)
      .orderBy(col("check"))
  }
}
