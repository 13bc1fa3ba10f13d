package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series diagnostics over DOMAIN-BOUNDED series frames.
  *
  * Every function here takes a pre-aggregated series `(idx, value)`
  * whose row count is fixed by the calendar, not the data volume — an
  * hourly grain is ≤ 8,784·years rows no matter how many raw events
  * collapsed into each bucket (the aggregation that builds the series
  * is the caller's map-side-combinable groupBy). That is what makes
  * [[BoundedWindow]] the correct plan for the in-series scans below;
  * none of these helpers may be pointed at an event-grain frame.
  *
  * Values must be exact integers SMALL enough that the second-moment
  * accumulations stay inside a signed 64-bit long: every helper here
  * sums x·x (and x·y) as LONG, so the contract is n·max(x)² < 2^63 —
  * counts and whole-unit measures qualify; raw 10^6-scaled micro-units
  * generally do NOT (x ~ 1e12 ⇒ x² ~ 1e24 wraps in Spark while DuckDB
  * silently widens to HUGEINT, so the engines diverge instead of both
  * failing). Scale micro-unit series down to whole units before calling.
  * Doubles appear only in the final closed-form ratios, built with one
  * canonical operation order that an oracle can mirror bit-for-bit.
  */
object TimeSeries {

  /** Correlogram: sample autocorrelation of the series at lags
    * `1..maxLag`, with the ±1.96/√n white-noise significance band.
    *
    * Uses the standard ACF estimator — global mean and global
    * sum-of-squares denominator, pairs `(x_t, x_{t+k})` in the
    * numerator:
    *
    *   r_k = Σ_{t}(x_t−x̄)(x_{t+k}−x̄) / Σ_t (x_t−x̄)²
    *
    * expanded to exact integer pair sums (Σx_t x_{t+k}, head/tail sums)
    * so the only doubles are the final closed form. The lag table is a
    * ≤`maxLag`-row literal broadcast against the series; each lag's
    * pairs come from one `idx+k = idx` equi-join — no window at all.
    *
    * REQUIRES a dense index: `idxCol` must be gap-free at the series'
    * grain (empty calendar buckets materialized as zero rows, the way
    * `hourlyCounts` does) — the equi-join pairs `idx+lag = idx`, so a
    * missing bucket silently drops every pair that spans it and the
    * estimator changes instead of erroring. Rebase sparse series to
    * contiguous positions (the `row_number` trick [[haarEnergy]] uses)
    * or densify them before calling.
    *
    * Output: `(lag, n_pairs, r, significant)` sorted by lag. */
  def acf(series: DataFrame, idxCol: String, valCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val s = series.select(col(idxCol).cast("long").as("i"),
      col(valCol).cast("long").as("x"))
    val stats = s.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val lags = stats.select(
      explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
    val head = s.select(col("i"), col("x"))
    val tail = s.select(col("i").as("j"), col("x").as("y"))
    val pairs = head.crossJoin(broadcast(lags))
      .withColumn("j", col("i") + col("lag"))
      .join(tail, "j")
      .groupBy(col("lag")).agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sh"), sum(col("y")).as("st"),
        sum(col("x") * col("y")).as("sxy"))
    val m = col("sx").cast("double") / col("n").cast("double")
    val den = col("sxx").cast("double") - col("sx").cast("double") * m
    val r = when(den > 0.0d, round((col("sxy").cast("double") -
      m * (col("sh").cast("double") + col("st").cast("double")) +
      col("n_pairs").cast("double") * m * m) / den, 6))
    pairs.crossJoin(broadcast(stats))
      .select(col("lag"), col("n_pairs"), r.as("r"),
        coalesce(abs(r) > lit(1.96) / sqrt(col("n").cast("double")),
          lit(false)).as("significant"))
      .orderBy(col("lag"))
  }

  /** Lagged cross-correlation between two aligned series: Pearson r of
    * `(a_t, b_{t+k})` for `k ∈ [−maxLag, maxLag]`, complete-case per
    * lag (the q156 five-sums form — exact integer sums, one closed
    * form). Positive best lag ⇒ `a` leads `b`. The row whose |r| is
    * the maximum (rounded, lag tie-break toward the smallest lag)
    * carries `best = true`. Same dense-index requirement as [[acf]]:
    * both inputs must materialize empty buckets, or spanned gaps
    * silently drop pairs.
    *
    * Output: `(lag, n_pairs, r, best)` sorted by lag. */
  def crossCorrelation(a: DataFrame, b: DataFrame, idxCol: String,
                       aVal: String, bVal: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val sa = a.select(col(idxCol).cast("long").as("i"),
      col(aVal).cast("long").as("x"))
    val sb = b.select(col(idxCol).cast("long").as("j"),
      col(bVal).cast("long").as("y"))
    val lags = sa.limit(1).select(
      explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong))).as("lag"))
    val sums = sa.crossJoin(broadcast(lags))
      .withColumn("j", col("i") + col("lag"))
      .join(sb, "j")
      .groupBy(col("lag")).agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val n = col("n_pairs").cast("double")
    val cov = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val scored = sums.select(col("lag"), col("n_pairs"),
      when(vx > 0.0d && vy > 0.0d,
        round(cov / sqrt(vx) / sqrt(vy), 6)).as("r"))
    val wAll = BoundedWindow.all(col("lag"))
    val wOrd = BoundedWindow.orderBy(col("lag"),
      abs(col("r")).desc_nulls_last, col("lag").asc)
    scored
      .withColumn("best", row_number().over(wOrd) === 1 &&
        max(abs(col("r"))).over(wAll).isNotNull)
      .orderBy(col("lag"))
  }

  /** Standardized CUSUM drift scan: S_t = Σ_{u≤t}(x_u − x̄)/σ over the
    * series order, with the peak-|S| row flagged (the most likely
    * single changepoint under a mean-shift model; |S| near zero
    * everywhere ⇒ no drift). The prefix sums ride the exact integer
    * running sum (position · mean subtracted in the closed form, never
    * accumulated in floats); σ is the population standard deviation.
    *
    * Output: `(idx, x, cusum, is_peak)` sorted by idx; constant series
    * (σ = 0) yield NULL cusum rows rather than ±∞. */
  def cusum(series: DataFrame, idxCol: String, valCol: String): DataFrame = {
    val s = series.select(col(idxCol).cast("long").as("idx"),
      col(valCol).cast("long").as("x"))
    val stats = s.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val wOrd = BoundedWindow.orderBy(col("idx"), col("idx"))
    val pre = s
      .withColumn("pos", row_number().over(wOrd).cast("long"))
      .withColumn("prefix", sum(col("x")).over(
        BoundedWindow.orderBy(col("idx"), col("idx"))
          .rowsBetween(Long.MinValue, 0)))
      .crossJoin(broadcast(stats))
    val m = col("sx").cast("double") / col("n").cast("double")
    val sd = sqrt(col("sxx").cast("double") / col("n").cast("double") - m * m)
    val scored = pre.select(col("idx"), col("x"),
      when(sd > 0.0d,
        round((col("prefix").cast("double") - col("pos").cast("double") * m)
          / sd, 6)).as("cusum"))
    val wAll = BoundedWindow.all(col("idx"))
    scored
      .withColumn("is_peak",
        coalesce(abs(col("cusum")) === max(abs(col("cusum"))).over(wAll),
          lit(false)))
      .orderBy(col("idx"))
  }

  /** Haar wavelet energy spectrum: for each level k ∈ [0, maxLevel],
    * the series (rebased to contiguous positions in idx order) is cut
    * into blocks of 2^(k+1) consecutive points and each COMPLETE block
    * contributes one detail coefficient c = mean(left half) − mean(right
    * half); the level's energy Σc² and mean |c| localize the series'
    * variation by scale (level 0 = point-to-point noise, higher levels
    * = slow drift). Incomplete edge blocks are dropped, never padded.
    * One explode by ≤(maxLevel+1) rows and one aggregate — halves
    * stay exact integer sums until the final closed form.
    *
    * Output: `(level, block_len, n_coeffs, energy, mean_abs)`. */
  def haarEnergy(series: DataFrame, idxCol: String, valCol: String,
                 maxLevel: Int): DataFrame = {
    require(maxLevel >= 0, "maxLevel must be >= 0")
    val wOrd = BoundedWindow.orderBy(col(idxCol), col(idxCol))
    val positioned = series.select(col(idxCol), col(valCol).cast("long").as("x"))
      .withColumn("pos", (row_number().over(wOrd) - 1).cast("long"))
      .select(explode(sequence(lit(0L), lit(maxLevel.toLong))).as("level"),
        col("pos"), col("x"))
    val blocks = positioned
      .withColumn("halflen", expr("shiftleft(1L, cast(level as int))"))
      .withColumn("block", expr("pos div (halflen * 2)"))
      .withColumn("rhalf", expr("(pos div halflen) % 2 = 1"))
      .groupBy(col("level"), col("halflen"), col("block"))
      .agg(sum(when(!col("rhalf"), col("x"))).as("sl"),
        count(when(!col("rhalf"), lit(1))).as("nl"),
        sum(when(col("rhalf"), col("x"))).as("sr"),
        count(when(col("rhalf"), lit(1))).as("nr"))
      .filter(col("nl") === col("halflen") && col("nr") === col("halflen"))
    // The detail numerator |sl−sr| can reach halflen·max|x|, so d² can
    // reach halflen²·max|x|² — a LONG square would tighten the file's
    // n·max(x)² < 2^63 contract by a halflen² factor at high levels.
    // Squaring in decimal(38,0) widens that contract to: exact while
    // halflen·max|x| < 10^19 and n_coeffs·(halflen·max|x|)² < 10^38
    // (38 decimal digits; under non-ANSI mode an overflow would null
    // `sdd` silently, so callers with |x| near 2^63 at level ≥ 1 are
    // outside the contract, same style as the file's n·max(x)² bound).
    val d = (col("sl") - col("sr")).cast("decimal(38,0)")
    blocks.groupBy(col("level"), col("halflen"))
      .agg(count(lit(1)).as("n_coeffs"),
        sum(d * d).as("sdd"), sum(abs(d)).as("sad"))
      .select(col("level"), (col("halflen") * 2L).as("block_len"),
        col("n_coeffs"),
        round(col("sdd").cast("double") /
          (col("halflen").cast("double") * col("halflen").cast("double")), 6)
          .as("energy"),
        round(col("sad").cast("double") / col("halflen").cast("double") /
          col("n_coeffs").cast("double"), 6).as("mean_abs"))
      .orderBy(col("level"))
  }
}
