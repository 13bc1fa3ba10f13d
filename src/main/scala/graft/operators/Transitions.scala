package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order (Markov) event-transition matrix: for each observed
  * (previous event type → next event type) pair, the count and the
  * row-normalized transition probability — the "what do users do next"
  * table behind funnel design (q107) and anomaly baselines.
  *
  * Scale shape: ONE exchange on the user key for the lag window (the
  * same exchange sessionization q29 and the funnel q107 pay); the
  * result then aggregates to at most |event types|² rows, so the
  * probability normalization window runs over a matrix-sized frame,
  * never over events. A self-join formulation (events ⋈ events on
  * user + adjacent rank) would shuffle the event table twice and
  * build the same pairs the lag produces for free.
  */
object Transitions {

  /** @param orderCols total order within a user (include a unique
    *                  tie-breaker — ties under `lag` are otherwise
    *                  nondeterministic across engines/partitionings).
    * @param userCounts when true, adds `n_users` (distinct users that
    *                  exhibit the transition — q259's support column)
    *                  to the same matrix-grain aggregate; off by
    *                  default so q113's published schema is unchanged. */
  def matrix(events: DataFrame, userCol: String, orderCols: Seq[Column],
             typeCol: String, userCounts: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val grouped = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
    val pairs =
      if (userCounts) grouped.agg(count(lit(1)).as("n"),
        countDistinct(col(userCol)).as("n_users"))
      else grouped.agg(count(lit(1)).as("n"))
    pairs.withColumn("p",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type")))
          .cast("double"), 6))
  }

  /** Last-touch attribution: each conversion event credits the most
    * recent PRECEDING non-conversion event type for the same user (the
    * "channel"), then conversions and value roll up per channel.
    *
    * Shape: the running last-touch is `last(…, ignoreNulls)` over a
    * rows-preceding frame stacked on the SAME user exchange the
    * transition matrix and funnel already use — no self-join of
    * conversions back onto the event stream (the naive build, which
    * shuffles events twice and range-joins). Conversions with no prior
    * touch (a user's first event converts) are reported under the
    * 'none' channel rather than dropped — silent attribution loss is
    * how dashboards lie. */
  def lastTouch(events: DataFrame, userCol: String, orderCols: Seq[Column],
                typeCol: String, valueCol: String,
                convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("channel",
        last(when(col(typeCol) =!= convType, col(typeCol)),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col(valueCol)), 2).as("total_value"))
  }
}
