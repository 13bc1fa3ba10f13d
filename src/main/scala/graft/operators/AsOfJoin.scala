package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row whose
  * time is ≤ the left row's time, per key — the standard stream-enrichment
  * / SCD-lookup operator (absent from both Spark's and the reference's
  * surface; composed here from built-ins per the custom-operator
  * preference order (a): no custom plan node needed).
  *
  * Implementation is the scalable union-window form, NOT a range join:
  * both sides union into one keyed timeline; a running `last(_, ignoreNulls)`
  * over (key, time) carries the latest right values forward; left rows are
  * then kept. Cost: one shuffle on the key, a sort within partitions —
  * no per-key row blowup when a hot key has many right rows (the
  * equi-join + filter + max_by formulation explodes as |L_k| × |R_k|).
  *
  * Requirements: `leftTs`/`rightTs` are the same orderable type; the right
  * side has at most one row per (key, ts) — pre-dedup with
  * [[Dedup.stagingDedup]] otherwise (ties would make the fill
  * nondeterministic).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val leftOnly = left.columns.filterNot(keys.contains).filterNot(_ == leftTs)
    val rightVals = right.columns.filterNot(keys.contains)
    require(rightVals.nonEmpty, "right side has no value columns")
    require(!leftOnly.exists(rightVals.contains),
      "left/right non-key column names must not collide")
    require(!rightVals.contains(leftTs),
      s"right column '$leftTs' collides with the left time column — rename one side")

    // The right row travels as ONE struct: present-but-null right values
    // stay null (a per-column ignoreNulls fill would skip them and stitch
    // together values from *different* right rows).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__lft"),
        lit(null).cast(rStructType).as("__r")) ++ leftOnly.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__lft"),
        struct(rightVals.map(col): _*).as("__r")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at equal time (__lft asc) so a
    // same-instant right row is visible to the left row (ts ≤ semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__lft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__lft") === 1)
      .withColumnRenamed("__ts", leftTs)
      .select(left.columns.map(col).toIndexedSeq ++
        rightVals.map(c => col(s"__r.$c").as(c)): _*)
  }
}
