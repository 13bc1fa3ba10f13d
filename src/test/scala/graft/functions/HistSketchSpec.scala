package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HistSketchSpec extends SparkSuite {
  import spark.implicits._

  test("logHistogram: bins are floor(log2), non-positive values dropped") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 7L),
      ("g", 8L), ("g", 0L), ("g", -5L)).toDF("g", "v")
    val bins = HistSketch.logHistogram(df, "g", col("v"))
      .collect().map(r => (r.getAs[Int]("b"), r.getAs[Long]("n"))).toMap
    assert(bins === Map(0 -> 1L, 1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("percentiles: ceil-rank rule lands on the documented bin lower bound") {
    // vm = [1, 1, 2, 4, 8, 100], n=6. Bins: b0 n=2, b1 n=1, b2 n=1,
    // b3 n=1, b6 n=1. p50 idx=3 → first cum>=3 is b1 → est 2.
    // p99 idx=6 → b6 → est 64.
    val df = Seq(1L, 1L, 2L, 4L, 8L, 100L).map(("g", _)).toDF("g", "v")
    val hist = HistSketch.logHistogram(df, "g", col("v"))
    val out = HistSketch.percentilesFromHistogram(
        hist, Seq((1, 2), (99, 100)))
      .collect().map(r => (r.getAs[Int]("p_num"), r.getAs[Long]("est_lo")))
      .toMap
    assert(out === Map(1 -> 2L, 99 -> 64L))
  }

  test("merge identity: per-part histograms re-aggregate to the direct one") {
    val vals = (1L to 500L).map(i => (s"d${i % 7}", "g", i * 3 + 1))
      .toDF("day", "g", "v")
    val daily = HistSketch.logHistogram(
      vals.select(concat_ws("|", col("g"), col("day")).as("gd"), col("v")),
      "gd", col("v"))
    val merged = HistSketch.mergeHistograms(
      daily.select(substring_index(col("g"), "|", 1).as("g"), col("b"),
        col("n")))
    val direct = HistSketch.logHistogram(vals, "g", col("v"))
    val m = merged.collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    val d = direct.collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(m === d)
    // And the percentile read-out is value-identical through the merge.
    val ps = Seq((1, 2), (19, 20), (99, 100))
    val pm = HistSketch.percentilesFromHistogram(merged, ps)
      .collect().map(r => (r.getAs[Int]("p_num"), r.getAs[Long]("est_lo")))
      .toSet
    val pd = HistSketch.percentilesFromHistogram(direct, ps)
      .collect().map(r => (r.getAs[Int]("p_num"), r.getAs[Long]("est_lo")))
      .toSet
    assert(pm === pd)
  }

  test("percentiles: estimate brackets the exact value within a factor of 2") {
    val vals = (1L to 1000L).map(i => ("g", i)).toDF("g", "v")
    val hist = HistSketch.logHistogram(vals, "g", col("v"))
    val est = HistSketch.percentilesFromHistogram(hist, Seq((19, 20)))
      .collect().head.getAs[Long]("est_lo")
    // exact p95 = 950; est must be the lower bin bound: 512 <= 950 < 1024.
    assert(est === 512L)
    assert(est <= 950L && 950L < est * 2)
  }
}
