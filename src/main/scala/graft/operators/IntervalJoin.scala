package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join, Spark-first: Spark plans a bare
  * `a.start <= b.end AND b.start <= a.end` join as a broadcast
  * nested-loop / cartesian product — the classic range-join
  * degeneration that is quadratic at any scale. The scale-safe form is
  * the BUCKETIZED equi-join every distributed range-join implementation
  * reduces to: explode each interval into the fixed-width time buckets
  * it touches, equi-join on the bucket (a real hash shuffle join),
  * verify the exact overlap predicate post-join, and keep each
  * surviving pair ONLY in the one bucket containing the overlap's
  * start — so a pair spanning many shared buckets is emitted exactly
  * once, without any distinct().
  *
  * Cost model: |rows| × (interval_len / bucketMs + 1) exploded rows.
  * Pick `bucketMs` near the typical interval length — too small
  * explodes long intervals, too large piles unrelated intervals into
  * one bucket (the range-partitioner balance trade, made explicit).
  * A pathological interval (days long against an hour bucket) costs
  * its length in buckets; cap upstream if the source can produce them.
  */
object IntervalJoin {

  /** Pairs of CLOSED intervals [start, end] that overlap (touching
    * endpoints count: ov_start ≤ ov_end). `left` must carry
    * (l_start, l_end), `right` (r_start, r_end), epoch-ms longs; ALL
    * other columns of both sides (ids, payloads — the two sides must
    * not share any other column name) ride through to the output,
    * which appends `ov_start`/`ov_end`. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val shared = left.columns.toSet
      .intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right share column names: ${shared.mkString(", ")}")
    val lb = left.withColumn("__bucket", explode(sequence(
      expr(s"l_start div $bucketMs"), expr(s"l_end div $bucketMs"))))
    val rb = right.withColumn("__bucket", explode(sequence(
      expr(s"r_start div $bucketMs"), expr(s"r_end div $bucketMs"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col("l_start") <= col("r_end") &&
        col("r_start") <= col("l_end"))
      // one emission per pair: the bucket holding the overlap start
      .filter(col("__bucket") ===
        expr(s"greatest(l_start, r_start) div $bucketMs"))
      .drop("__bucket")
      .withColumn("ov_start", greatest(col("l_start"), col("r_start")))
      .withColumn("ov_end", least(col("l_end"), col("r_end")))
  }
}
