package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins batch deduplication (ref SURVEY.md §2.5 W1/W2;
  * cdc_util/redshift_sink.py:193-227,474-476).
  *
  * Two physical strategies with identical semantics:
  *
  *  - `latestPerKey` (window): `row_number() OVER (PARTITION BY pk ORDER BY
  *    order DESC) = 1`. Spark 4's `InferWindowGroupLimit` rewrites this to
  *    a `WindowGroupLimit` that filters *before* the shuffle as well as
  *    after, so at 100 TB the shuffle carries ~(#distinct keys) rows, not
  *    the full batch. Faithful to the reference's SQL.
  *
  *  - `latestPerKeyAgg` (aggregate): `groupBy(pk).agg(max_by(struct(*),
  *    orderKey))` — a hash aggregate with partial (map-side) combine; one
  *    row per key leaves each mapper. Preferable when the per-key
  *    duplication factor is high (hot keys) because partial aggregation is
  *    spill-free and avoids the sort `WindowGroupLimit` still does.
  *
  * Both require a *total* order (append a unique tie-breaker like the
  * Canal array position or an event id) for deterministic winners.
  */
object Dedup {

  private final val Seqnum = "seqnum_aws"

  /** W1: keep the latest row per composite key; `order` is descending
    * priority (first = most significant). The rank column is dropped
    * (ref P9, redshift_sink.py:254). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn(Seqnum, row_number().over(w))
      .filter(col(Seqnum) === 1)
      .drop(Seqnum)
  }

  /** Same semantics as `latestPerKey` via partial-aggregating `max_by`.
    * `order` columns must form a total order; they are compared as a
    * struct (lexicographic). */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val orderKey = struct(order: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, orderKey).as("r"))
      .select(col("r.*"))
  }

  /** P8: the delete-only variant feeding `_delete` audit tables
    * (ref redshift_sink.py:213-227): filter to deletes first, then LWW. */
  def latestDeletePerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                         isDelete: Column): DataFrame =
    latestPerKey(df.filter(isDelete), keys, order)

  /** W2: arbitrary-but-deterministic winner per key — the staging-table
    * guard (ref redshift_sink.py:474-476 uses ORDER BY pk, i.e. any
    * winner). We order by `tiebreak` ascending for determinism. */
  def stagingDedup(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak.map(_.asc): _*)
    df.withColumn(Seqnum, row_number().over(w))
      .filter(col(Seqnum) === 1)
      .drop(Seqnum)
  }
}
