package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[PrefixScan]] must equal the single-partition global window it
  * replaces, row for row, on every scan kind — including adversarial
  * key distributions (all-equal keys, heavy ties, negative keys for
  * descending orders, frames smaller than the bin count). */
class PrefixScanSpec extends SparkSuite {

  import PrefixScan._

  private def randFrame(n: Int, distinctKeys: Int) = {
    import spark.implicits._
    // Deterministic pseudo-random rows spread over all partitions.
    (1 to n).map { i =>
      val k = (i * 2654435761L) % distinctKeys
      val v = (i * 40503L) % 1000L
      (i.toLong, k, v)
    }.toDF("id", "k", "v").repartition(7)
  }

  test("global row_number matches the unpartitioned window (with ties)") {
    val df = randFrame(5000, 40) // heavy ties: 40 distinct keys
    val got = scan(df, col("k"), Seq(col("k"), col("id")),
      Seq(RowNumber("rk")), bins = 8)
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    assert(got.select("id", "rk").except(want.select("id", "rk")).isEmpty)
    assert(want.select("id", "rk").except(got.select("id", "rk")).isEmpty)
  }

  test("running sum matches, descending order via negated bin key") {
    val df = randFrame(3000, 500)
    val got = scan(df, -col("v"), Seq(col("v").desc, col("id").asc),
      Seq(RunSum(col("v"), "cum")), bins = 8)
    val w = Window.orderBy(col("v").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
    assert(got.select("id", "cum").except(want.select("id", "cum")).isEmpty)
    assert(want.select("id", "cum").except(got.select("id", "cum")).isEmpty)
  }

  test("running max matches over arrival order") {
    val df = randFrame(3000, 3000)
    val got = scan(df, col("id"), Seq(col("id")),
      Seq(RunMax(col("v"), "mx")), bins = 8)
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("mx", max(col("v")).over(w))
    assert(got.select("id", "mx").except(want.select("id", "mx")).isEmpty)
    assert(want.select("id", "mx").except(got.select("id", "mx")).isEmpty)
  }

  test("multiple scans in one pass agree with separate windows") {
    val df = randFrame(2000, 100)
    val got = scan(df, col("k"), Seq(col("k"), col("id")),
      Seq(RunSum(col("v"), "cum"), RowNumber("rk"),
        RunMax(col("v"), "mx")), bins = 5)
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .withColumn("mx", max(col("v")).over(w))
    val cols = Seq("id", "cum", "rk", "mx").map(col)
    assert(got.select(cols: _*).except(want.select(cols: _*)).isEmpty)
    assert(want.select(cols: _*).except(got.select(cols: _*)).isEmpty)
  }

  test("degenerate frames: all-equal keys, and fewer rows than bins") {
    import spark.implicits._
    val allEq = Seq.tabulate(100)(i => (i.toLong, 7L)).toDF("id", "k")
      .repartition(5)
    val g1 = scan(allEq, col("k"), Seq(col("k"), col("id")),
      Seq(RowNumber("rk")), bins = 8)
    assert(g1.agg(max(col("rk")), countDistinct(col("rk"))).head ===
      org.apache.spark.sql.Row(100L, 100L))
    val tiny = Seq((1L, 5L), (2L, 3L)).toDF("id", "k")
    val g2 = scan(tiny, col("k"), Seq(col("k")), Seq(RowNumber("rk")),
      bins = 32)
    assert(g2.orderBy("rk").select("id").as[Long].collect()
      .toSeq === Seq(2L, 1L))
  }

  test("scanGrouped: per-group rank and running sum match the " +
    "partitioned window, including single-row and all-tied groups") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      val g = Seq("alpha", "beta", "gamma", "solo", "tied")(i % 5) match {
        case "solo" if i != 5 => "alpha" // keep "solo" a 1-row group
        case x => x
      }
      val v = if (g == "tied") 42L else (i * 40503L) % 1000L
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
    val grouped = PrefixScan.scanGrouped(df, "g", col("v"),
      Seq(col("v"), col("id")),
      Seq(RowNumber("rk"), RunSum(col("v"), "cum"),
        RunMax(col("id"), "mx")), bins = 6)
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(wf))
      .withColumn("mx", max(col("id")).over(wf))
    val cols = Seq("id", "rk", "cum", "mx").map(col)
    assert(grouped.select(cols: _*).except(want.select(cols: _*)).isEmpty)
    assert(want.select(cols: _*).except(grouped.select(cols: _*)).isEmpty)
  }

  test("scanGrouped: a NULL group ranks as its own group, like the " +
    "partitioned window it replaces (no silent row drop)") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 10L), (2L, None, 5L), (3L, None, 7L),
      (4L, Some("a"), 3L), (5L, None, 1L))
      .toDF("id", "g", "v").repartition(3)
    val got = PrefixScan.scanGrouped(df, "g", col("v"),
      Seq(col("v"), col("id")), Seq(RowNumber("rk")), bins = 4)
    assert(got.count() === 5L, "NULL-group rows must survive")
    val nullRanks = got.filter(col("g").isNull)
      .orderBy("rk").select("id").as[Long].collect().toSeq
    assert(nullRanks === Seq(5L, 2L, 3L)) // v order: 1, 5, 7
  }

  test("empty input yields an empty output, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(scan(empty, col("k"), Seq(col("k")),
      Seq(RunSum(col("k"), "c"), RowNumber("r"))).isEmpty)
  }

  private def unpartitionedWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    graft.WindowAudit.unpartitionedWindows(df)

  test("no single-partition WindowExec anywhere in the physical plan") {
    val df = randFrame(1000, 100)
    val got = scan(df, col("k"), Seq(col("k"), col("id")),
      Seq(RowNumber("rk")), bins = 4)
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("bounded grains are sf-invariant (the BoundedWindow / ordered-fold " +
    "safety bound, COVERAGE.md §2.5)") {
    // The grains BoundedWindow and the ordered recurrence folds (q227
    // CUSUM, q244 Holt, q262 Page–Hinkley) run on must be fixed by the
    // DOMAIN: same cardinality at 10× the data, and far under the ~4,096
    // driver-safety bound named in COVERAGE.md. If testdata regeneration
    // ever widened the events window past ~3 calendar months, this is
    // the test that says so before a fold silently collects more.
    def grain(d: String, c: org.apache.spark.sql.Column) =
      graft.Tables.events(spark, sf(d)).select(c).distinct().count()
    val dayCol = expr("ts_ms div 86400000")
    val days1 = grain("sf0.001", dayCol)
    val days10 = grain("sf0.01", dayCol)
    assert(days1 === days10, "calendar-day grain grew with data volume")
    assert(days10 <= 92L, s"daily series $days10 exceeds the documented bound")
    val types1 = grain("sf0.001", col("event_type"))
    val types10 = grain("sf0.01", col("event_type"))
    assert(types1 === types10, "event-type grain grew with data volume")
    assert(types10 * types10 <= 4096L,
      "|types|^2 transition grain exceeds the documented bound")
  }

  test("BoundedWindow survives EliminateWindowPartitions (non-empty spec)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "g").repartition(2)
    val out = df.withColumn("rk",
        row_number().over(BoundedWindow.orderBy(col("v"), col("v"))))
      .withColumn("tot", sum(col("v")).over(BoundedWindow.all(col("g"))))
    assert(unpartitionedWindows(out).isEmpty)
    assert(out.orderBy("rk").select("rk").as[Int].collect().toSeq ===
      Seq(1, 2))
    assert(out.select("tot").as[Long].collect().toSeq === Seq(3L, 3L))
  }
}
