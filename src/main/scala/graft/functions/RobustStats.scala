package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust distribution statistics for corpus gating: quantile-boundary
  * feature binning and median/MAD outlier flagging. Both are the
  * length/score-distribution half of a quality pipeline — the rule gates
  * (q50) cut on fixed constants; these cut on the corpus's OWN
  * distribution, so they track drift without retuning.
  *
  * Determinism: exact `percentile` interpolates `(n-1)·p` between sorted
  * values — the same convention as DuckDB/Postgres `quantile_cont`, and
  * exact in doubles for integer inputs at dyadic probabilities — so every
  * boundary, deviation, and flag replays bit-for-bit in an external
  * oracle. At 100 TB the exact per-group sort behind `percentile` is the
  * one non-partial-aggregable step; swap in `approx_percentile` (the
  * qa14 sketch tier, mergeable partials) when boundaries may be
  * approximate.
  */
object RobustStats {

  /** Quantile boundaries of `valueCol` as a ONE-ROW frame
    * (`b1..bn` sorted ascending) — the model side of [[withQuantileBin]],
    * broadcast-sized by construction. */
  def quantileBoundaries(df: DataFrame, valueCol: String,
                         probs: Seq[Double]): DataFrame =
    df.agg(percentile(col(valueCol), typedLit(probs)).as("bs"))
      .select(probs.indices.map(i =>
        element_at(col("bs"), i + 1).as(s"b${i + 1}")): _*)

  /** Equal-frequency discretization: `binCol` = how many of the
    * `probs.length` quantile boundaries the row's value EXCEEDS
    * (0 = bottom bin). The boundaries frame joins as a broadcast
    * single-row cross join — the corpus itself is a narrow map, no
    * shuffle, no collect. */
  def withQuantileBin(df: DataFrame, valueCol: String, probs: Seq[Double],
                      binCol: String = "bin"): DataFrame = {
    val bounds = quantileBoundaries(df, valueCol, probs)
    val bin = probs.indices
      .map(i => when(col(valueCol) > col(s"b${i + 1}"), 1).otherwise(0))
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn(binCol, bin)
      .drop(probs.indices.map(i => s"b${i + 1}"): _*)
  }

  /** Per-group median/MAD outlier flags: a row is an outlier when its
    * absolute deviation from the group median exceeds `nSigmas` robust
    * standard deviations (MAD × 1.4826, the normal-consistency constant).
    * Unlike mean/stddev z-scores, the cut-point itself is immune to the
    * outliers it hunts.
    *
    * Plan: two grouped exact percentiles over the SAME group key (one
    * exchange each; group count ≪ rows, so both stat frames broadcast
    * back to the scan). Output adds `med`, `mad`, `dev`, `is_outlier`. */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  nSigmas: Double = 3.0): DataFrame = {
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(gcols: _*)
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("is_outlier", col("dev") > lit(nSigmas) * lit(1.4826) * col("mad"))
  }

  /** Trailing-median spike detection over an ordered stream: per key, the
    * exact median of the previous `lookback` values (current row
    * EXCLUDED — a spike must never vote on its own baseline), and a flag
    * when the value exceeds `factor` × that baseline. The robust
    * streaming-monitor shape: a spike can't drag a median the way it
    * drags a rolling mean, so consecutive spikes still flag.
    *
    * One window over one (keys) exchange; the frame holds at most
    * `lookback` values per row. The baseline is null for each key's
    * first row (no history → no flag). Exact percentile interpolation
    * over the frame replays externally (`quantile_cont` window). */
  def trailingMedianSpikes(df: DataFrame, valueCol: String,
                           keyCols: Seq[String], orderCols: Seq[Column],
                           lookback: Int = 12, factor: Double = 2.0)
  : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(-lookback.toLong, -1L)
    df.withColumn("baseline", percentile(col(valueCol), lit(0.5)).over(w))
      .withColumn("is_spike",
        col("baseline").isNotNull && col(valueCol) > lit(factor) * col("baseline"))
  }

  /** Per-group [[psiDrift]]: one PSI bin table per group (source feed,
    * domain, shard), each group binned by ITS OWN reference quantiles —
    * a global PSI can read "stable" while one feed of twenty drifted
    * badly, which is exactly the feed an ingest dashboard must name.
    * Same plan with the group key threaded through: one grouped
    * exact-percentile pass on the reference (a #groups-sized frame,
    * broadcast back to both scans — the q85 kernel), per-side
    * (group, bin) partial-agg counts, fractions via a #groups-partition
    * window over the tiny count frame. */
  def psiDriftByGroup(ref: DataFrame, cur: DataFrame, valueCol: String,
                      groupCol: String,
                      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val bounds = ref.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), typedLit(probs)).as("bs"))
      .select(col(groupCol) +: probs.indices.map(i =>
        element_at(col("bs"), i + 1).as(s"b${i + 1}")): _*)
    def binCounts(df: DataFrame, cnt: String): DataFrame = {
      val bin = probs.indices
        .map(i => when(col(valueCol) > col(s"b${i + 1}"), 1).otherwise(0))
        .reduce(_ + _)
      df.join(broadcast(bounds), Seq(groupCol))
        .select(col(groupCol), bin.as("bin"))
        .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as(cnt))
    }
    val joined = binCounts(ref, "ref_n")
      .join(binCounts(cur, "cur_n"), Seq(groupCol, "bin"), "full_outer")
      .select(col(groupCol), col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val rf = col("ref_n").cast("double") / col("ref_total")
    val cf = col("cur_n").cast("double") / col("cur_total")
    joined
      .withColumn("ref_total", sum(col("ref_n")).over(w))
      .withColumn("cur_total", sum(col("cur_n")).over(w))
      .select(col(groupCol), col("bin"), col("ref_n"), col("cur_n"),
        round(rf, 6).as("ref_frac"), round(cf, 6).as("cur_frac"),
        round(when(col("ref_n") > 0 && col("cur_n") > 0,
          (cf - rf) * log(cf / rf)), 6).as("psi"))
  }

  /** Population-stability-index drift between a reference snapshot and a
    * current one: bin BOTH populations by the REFERENCE's quantile
    * boundaries (drift must be measured against the baseline's own
    * geometry — re-binning on the drifted data would hide the drift),
    * then per bin PSI = (cur% − ref%)·ln(cur%/ref%). Σ over bins < 0.1
    * is conventionally "stable", > 0.25 "major shift" — the
    * retrain/investigate trigger for a corpus feed.
    *
    * Plan: one exact-percentile row on the reference (broadcast back to
    * both scans — the q84 kernel), one hash-count per side over ≤
    * `probs.length+1` bins, and a tiny outer join; nothing but the two
    * narrow scans touches the data. Fractions divide exact integer
    * counts; `ln` of that ratio is a single defined double op per bin,
    * so every row replays externally. Bins one side never populates
    * carry NULL psi (the standard undefined case) rather than an
    * infinity that would swamp the sum. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val bounds = quantileBoundaries(ref, valueCol, probs)
    def binCounts(df: DataFrame, cnt: String): DataFrame = {
      val bin = probs.indices
        .map(i => when(col(valueCol) > col(s"b${i + 1}"), 1).otherwise(0))
        .reduce(_ + _)
      df.crossJoin(broadcast(bounds)).select(bin.as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cnt))
    }
    val r = binCounts(ref, "ref_n")
    val c = binCounts(cur, "cur_n")
    val joined = r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // ≤ probs+1 bins — bounded frame, explicit constant partition
    // (see [[BoundedWindow]] on why not an empty spec).
    val w = BoundedWindow.all(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rf = col("ref_n").cast("double") / col("ref_total")
    val cf = col("cur_n").cast("double") / col("cur_total")
    joined
      .withColumn("ref_total", sum(col("ref_n")).over(w))
      .withColumn("cur_total", sum(col("cur_n")).over(w))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(rf, 6).as("ref_frac"), round(cf, 6).as("cur_frac"),
        round(when(col("ref_n") > 0 && col("cur_n") > 0,
          (cf - rf) * log(cf / rf)), 6).as("psi"))
  }
}
