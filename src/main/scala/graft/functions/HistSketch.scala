package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log₂-histogram percentile sketch — the ADDITIVE summary
  * tier for quantiles, next to the KMV tier for distincts
  * ([[Sketches]]) and the exact/approx percentile pair (qa10/qa14).
  *
  * The problem it solves at 100 TB: `percentile_approx` sketches merge
  * inside ONE job, but cannot be stored in a table and re-merged by SQL
  * later; exact percentiles need the data. A fixed-bin log histogram is
  * the summary that IS just rows: per (group, bin) an integer count.
  * Counts are additive — per-day histograms summed over any date range
  * equal the whole-range histogram EXACTLY (the q114/q122 maintenance
  * property, here for order statistics) — so each partition is scanned
  * once ever and any range percentile query touches only ≤64 bin rows
  * per group-day.
  *
  * Accuracy contract (published, not hidden): quantiles land on bin
  * LOWER bounds (powers of two over the measure's micro-units), so the
  * estimate is within a factor of 2 below the true value — the honest
  * trade for mergeability-as-plain-rows. All arithmetic is integer
  * (ceil-index via div, bin bound via shiftleft), replayable
  * bit-identically by any SQL engine.
  */
object HistSketch {

  /** Per-(group, bin) counts: bin = floor(log₂ vm) for a POSITIVE
    * integer measure vm (use micro-units for fractional values —
    * `round(v * 1e6)::long`). Rows with vm ≤ 0 or NULL are dropped (a
    * log-scale histogram has no bin for them; count them upstream if
    * they matter). Output: (g, b, n). */
  def logHistogram(df: DataFrame, groupCol: String,
                   measure: Column): DataFrame =
    df.select(col(groupCol).as("g"), measure.cast("long").as("vm"))
      .filter(col("vm") > 0)
      .withColumn("b", (length(bin(col("vm"))) - 1).cast("int"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("n"))

  /** Merge histogram rows (g, b, n) — plain additive re-aggregation.
    * Feed it per-day rows with the day dropped from g to roll up. */
  def mergeHistograms(rows: DataFrame): DataFrame =
    rows.groupBy(col("g"), col("b")).agg(sum(col("n")).as("n"))

  /** Percentile estimates from histogram rows alone. For each group and
    * each p = num/den: the target rank is idx = ceil(p·n_total)
    * (integer: (n·num + den − 1) div den), and the estimate is the
    * LOWER bound 2^b of the first bin whose cumulative count reaches
    * idx. Output: (g, p_num, p_den, n_total, est_lo) — est_lo in the
    * measure's own (micro-)units.
    *
    * Scale shape: the window runs over the BIN frame (≤64 rows per
    * group), never the data — the q79 histogram-first discipline. */
  def percentilesFromHistogram(hist: DataFrame,
                               ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val w = Window.partitionBy(col("g")).orderBy(col("b"))
    val cum = hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("n_total",
        sum(col("n")).over(Window.partitionBy(col("g"))))
    val perP = ps.map { case (num, den) =>
      // Integer `div`, not double `/`: the scaladoc promises exact
      // (n·num + den−1) div den, and double division is only exact
      // while n_total·num < 2^53 — silently off-by-one-rank beyond.
      cum.filter(col("cum") >=
          expr(s"(n_total * $num + ${den - 1}) div $den"))
        .groupBy(col("g"))
        .agg(min(col("b")).as("b"), max(col("n_total")).as("n_total"))
        .select(col("g"), lit(num).as("p_num"), lit(den).as("p_den"),
          col("n_total"),
          expr("shiftleft(1L, b)").cast("long").as("est_lo"))
    }
    perP.reduce(_ unionByName _)
  }
}
