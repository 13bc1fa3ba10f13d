package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) =
    rows.toDF("l_id", "l_start", "l_end")
  private def right(rows: (Long, Long, Long)*) =
    rows.toDF("r_id", "r_start", "r_end")

  test("overlap, touching, and disjoint intervals classify exactly") {
    val l = left((1L, 0L, 100L), (2L, 500L, 600L), (3L, 1000L, 1100L))
    val r = right((10L, 50L, 150L),   // overlaps 1
      (20L, 600L, 700L),              // touches 2 at one instant
      (30L, 2000L, 2100L))            // disjoint from all
    val got = IntervalJoin.overlapJoin(l, r, bucketMs = 100L)
      .select("l_id", "r_id", "ov_start", "ov_end")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getLong(2), x.getLong(3))).toSet
    assert(got === Set((1L, 10L, 50L, 100L), (2L, 20L, 600L, 600L)))
  }

  test("a pair sharing MANY buckets is emitted exactly once (no distinct)") {
    // Both intervals span 50 buckets; the pair must appear once.
    val l = left((1L, 0L, 5000L))
    val r = right((10L, 100L, 4900L))
    val out = IntervalJoin.overlapJoin(l, r, bucketMs = 100L)
      .select("ov_start", "ov_end").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 100L && out.head.getLong(1) === 4900L)
  }

  test("bucketized result equals the naive theta join on a random set") {
    val rng = new scala.util.Random(7)
    val ivs = (1 to 300).map { i =>
      val s = rng.nextInt(10000).toLong
      (i.toLong, s, s + rng.nextInt(500).toLong)
    }
    val l = left(ivs: _*).repartition(5)
    val r = right(ivs.map { case (i, s, e) => (i + 1000L, s, e) }: _*)
      .repartition(3)
    val got = IntervalJoin.overlapJoin(l, r, bucketMs = 700L)
      .select("l_id", "r_id", "ov_start", "ov_end")
    val naive = l.join(r, col("l_start") <= col("r_end") &&
        col("r_start") <= col("l_end"))
      .select(col("l_id"), col("r_id"),
        greatest(col("l_start"), col("r_start")).as("ov_start"),
        least(col("l_end"), col("r_end")).as("ov_end"))
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    assert(got.count() === naive.count(), "duplicate emissions")
  }

  test("the plan is a hash equi-join on the bucket, not a nested loop") {
    val l = left((1L, 0L, 100L), (2L, 500L, 600L)).repartition(2)
    val r = right((10L, 50L, 150L), (20L, 700L, 800L)).repartition(2)
    val q = IntervalJoin.overlapJoin(l, r, bucketMs = 100L)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "range join degraded to a product:\n" + p.take(2000))
  }
}
