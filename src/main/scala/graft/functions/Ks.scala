package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared two-sample Kolmogorov–Smirnov kernel: D = max over the pooled
  * distinct support of |ECDF₁ − ECDF₂|, with ties fully counted — the
  * binning-free "did the distribution move at all" test behind q167
  * (half-vs-half drift), q199 (the per-event-type drilldown), and q260
  * (purchase-vs-click values). One kernel so the three callers cannot
  * drift in CDF construction.
  *
  * Scale shape (the reason this is a kernel and not a window): the
  * caller collapses the raw stream to per-distinct-value EXACT counts
  * (map-side combine), then both running counts come from ONE
  * [[PrefixScan]] two-pass run — exact integer cumulative sums, so
  * bucket re-association cannot change a bit and no single-partition
  * window exists; the totals are derived from the same per-value frame
  * (no second pass over the raw stream) and broadcast. `cache = true`
  * is always passed: PrefixScan traverses its input for the quantile
  * probe, the totals pass, and the local scan, so an uncut lineage
  * re-runs the caller's full upstream aggregate three times.
  */
object Ks {

  /** Ungrouped D. Input: one row per distinct value with exact counts
    * `c1` / `c2` (sample-1 / sample-2 multiplicities at `valueCol`).
    * Output: ONE row (n1, n2, d_stat) with `d_stat` UNROUNDED — callers
    * round once for publication so derived statistics (scaled KS,
    * critical-value compare) use the full-precision max. */
  def twoSampleD(perValue: DataFrame, valueCol: Column): DataFrame = {
    val tots = perValue.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    PrefixScan.scan(perValue, valueCol, Seq(valueCol),
        Seq(PrefixScan.RunSum(col("c1"), "cum1"),
          PrefixScan.RunSum(col("c2"), "cum2")), cache = true)
      .crossJoin(broadcast(tots))
      .withColumn("f1",
        col("cum1").cast("double") / col("n1").cast("double"))
      .withColumn("f2",
        col("cum2").cast("double") / col("n2").cast("double"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("f1") - col("f2"))).as("d_stat"))
  }

  /** Grouped D — one statistic per `groupName` value. Same contract as
    * [[twoSampleD]] but the running counts go through
    * [[PrefixScan.scanGrouped]] (a `partitionBy(group)` window would
    * push each group's whole distinct-value frame through one task).
    * Output: (groupName, n1, n2, d_stat), `d_stat` unrounded. */
  def twoSampleDGrouped(perValue: DataFrame, groupName: String,
                        valueCol: Column): DataFrame = {
    val tots = perValue.groupBy(col(groupName))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    PrefixScan.scanGrouped(perValue, groupName, valueCol, Seq(valueCol),
        Seq(PrefixScan.RunSum(col("c1"), "cum1"),
          PrefixScan.RunSum(col("c2"), "cum2")), cache = true)
      .join(broadcast(tots), Seq(groupName))
      .withColumn("d",
        abs(col("cum1").cast("double") / col("n1").cast("double") -
          col("cum2").cast("double") / col("n2").cast("double")))
      .groupBy(col(groupName))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("d")).as("d_stat"))
  }
}
