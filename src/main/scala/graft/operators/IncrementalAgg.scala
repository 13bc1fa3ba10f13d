package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over a CDC changelog —
  * the natural downstream of the reference's upsert pipeline (a consumer
  * of `cdc_util/redshift_sink.py`'s merged tables who keeps a per-key
  * SUM/COUNT/AVG or MAX dashboard current per micro-batch). The
  * reference itself re-reads the merged table; at 100 TB the aggregate
  * must be maintained from the BATCH (bounded work per trigger), never
  * recomputed from the base.
  *
  * Model: every changelog row normalizes into at most two delta events —
  * a retraction of the before-image (updates, deletes) and an insertion
  * of the after-image (creates, updates) — the classic
  * changelog-retraction currency (Flink's `RowKind.UPDATE_BEFORE` /
  * `UPDATE_AFTER` streams; materialized-view maintenance literature).
  * A group-key change on update falls out for free: the retraction
  * lands on the OLD group, the insertion on the NEW one.
  *
  * Scale shape:
  *  - [[deltas]] is one hash aggregation over the batch (map-side
  *    partial, output ≤ touched groups);
  *  - [[applyDeltas]] is a UNION + re-aggregate, NOT a join — states
  *    and deltas share the (key, cnt, sum) currency, so merging them is
  *    the same partial-agg-safe hash aggregate (and a bucketed state
  *    table co-partitions it for free);
  *  - sums ride exact integer micro-units: the merged state is
  *    bit-identical at any partition count and replay order.
  *
  * MIN/MAX are NOT delta-maintainable under retraction (deleting the
  * current max reveals an unknown runner-up) — [[maintainMax]] does the
  * scale-correct split: groups whose retraction could not have touched
  * the max update incrementally (a `greatest` over inserts), and ONLY
  * groups that lost their max re-aggregate from the base, reached
  * through a semi-join (partition-prunable on a keyed layout).
  */
object IncrementalAgg {

  /** Column names of the delta/state currency. */
  val cntCol = "cnt"
  val sumCol = "sumv"

  /** Normalize a changelog batch to per-group (d_cnt, d_sum) deltas.
    *
    * `log` carries `opCol` ∈ {'c','u','d','r'} (the engine's canonical
    * ops — [[graft.envelope.CdcFormat]] normalizes every wire format to
    * these; 'r' snapshot/read rows contribute insertions like 'c'),
    * before-image key/value expressions (valid on 'u'/'d' rows) and
    * after-image expressions (valid on 'c'/'u' rows). Values must
    * already be exact integers (micro-units) — the whole algebra stays
    * in BIGINT.
    *
    * One narrow union (same scan read twice under one WSCG each, or
    * cached upstream) + one hash aggregate; output is bounded by the
    * number of touched groups, not batch size. */
  def deltas(log: DataFrame, opCol: Column,
             beforeKeys: Seq[Column], afterKeys: Seq[Column],
             beforeVal: Column, afterVal: Column,
             keyNames: Seq[String]): DataFrame = {
    require(beforeKeys.length == keyNames.length &&
      afterKeys.length == keyNames.length,
      "key expression lists must match keyNames")
    val inserts = log.filter(opCol.isin("c", "u", "r"))
      .select(afterKeys.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(lit(1L).as(cntCol), afterVal.cast("long").as(sumCol)): _*)
    val retracts = log.filter(opCol.isin("u", "d"))
      .select(beforeKeys.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(lit(-1L).as(cntCol), (-beforeVal).cast("long").as(sumCol)): _*)
    inserts.unionByName(retracts)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol))
  }

  /** Merge a delta frame into a (key, cnt, sumv) state frame. Union +
    * hash aggregate — no join, so the plan is the same partial-agg
    * shape as the original aggregation and co-partitions with a
    * bucketed state table. Groups whose count reaches zero vanish
    * (fully-retracted groups leave the state, like the base table). */
  def applyDeltas(state: DataFrame, delta: DataFrame,
                  keyNames: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol))
      .filter(col(cntCol) =!= 0L)

  /** Build the initial (key, cnt, sumv) state from a base snapshot. */
  def initialState(base: DataFrame, keyNames: Seq[String],
                   value: Column): DataFrame =
    base.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as(cntCol), sum(value.cast("long")).as(sumCol))

  /** Second-moment column of the moments currency. */
  val sumSqCol = "sumsq"

  /** [[deltas]] extended with the second moment: (d_cnt, d_sum, d_sumsq)
    * with d_sumsq = ±v² — variance/stddev are FULLY delta-maintainable
    * under retraction (unlike MAX), so an incremental dashboard can
    * carry dispersion, not just the mean. Squares ride decimal(38,0):
    * micro-unit values square to ~10¹⁷ and their sums overflow BIGINT
    * at scale. */
  def momentDeltas(log: DataFrame, opCol: Column,
                   beforeKeys: Seq[Column], afterKeys: Seq[Column],
                   beforeVal: Column, afterVal: Column,
                   keyNames: Seq[String]): DataFrame = {
    require(beforeKeys.length == keyNames.length &&
      afterKeys.length == keyNames.length,
      "key expression lists must match keyNames")
    val av = afterVal.cast("long")
    val bv = beforeVal.cast("long")
    val inserts = log.filter(opCol.isin("c", "u", "r"))
      .select(afterKeys.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(lit(1L).as(cntCol), av.as(sumCol),
          (av.cast("decimal(38,0)") * av).as(sumSqCol)): _*)
    val retracts = log.filter(opCol.isin("u", "d"))
      .select(beforeKeys.zip(keyNames).map { case (c, n) => c.as(n) } ++
        Seq(lit(-1L).as(cntCol), (-bv).as(sumCol),
          (-(bv.cast("decimal(38,0)") * bv)).as(sumSqCol)): _*)
    inserts.unionByName(retracts)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol),
        sum(col(sumSqCol)).as(sumSqCol))
  }

  /** Merge a moment-delta frame into a (key, cnt, sumv, sumsq) state —
    * same union + hash-aggregate shape as [[applyDeltas]]. */
  def applyMomentDeltas(state: DataFrame, delta: DataFrame,
                        keyNames: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol),
        sum(col(sumSqCol)).as(sumSqCol))
      .filter(col(cntCol) =!= 0L)

  /** Initial (key, cnt, sumv, sumsq) moments from a base snapshot. */
  def initialMoments(base: DataFrame, keyNames: Seq[String],
                     value: Column): DataFrame = {
    val v = value.cast("long")
    base.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as(cntCol), sum(v).as(sumCol),
        sum(v.cast("decimal(38,0)") * v).as(sumSqCol))
  }

  /** Maintain each group's TOP-K rows (largest (value, id), both ties
    * and identity resolved by `idCol`) through one changelog batch —
    * [[maintainMax]] generalized to the ranking dashboards (top sellers
    * per region) that MAX alone can't serve. The stored set per group is
    * its top-k rows; the per-group floor is the weakest stored (value,
    * id) witness.
    *
    * Split:
    *  - a retraction at-or-above the floor (or into a group holding
    *    fewer than k rows) may change membership — those groups
    *    re-aggregate their top-k from `postBase` via a semi-join
    *    (bounded by hit groups, partition-prunable);
    *  - every other group re-ranks its stored rows ∪ the batch's
    *    inserts — a window over a (k + per-group batch inserts)-bounded
    *    frame, pure delta work.
    * Frames: `state` (keys, idCol, valCol stored rows), `postBase` /
    * `inserts` / `retracts` as in [[maintainMax]] but carrying idCol. */
  def maintainTopK(state: DataFrame, postBase: DataFrame,
                   inserts: DataFrame, retracts: DataFrame,
                   keyNames: Seq[String], k: Int,
                   idCol: String = "id", valCol: String = "value"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keys = keyNames.map(col)
    // (value, id) lexicographic witness — unambiguous after the join:
    // floor carries only keys/__floor/__n, so bare columns bind to the
    // retraction side.
    val witness =
      struct(col(valCol).cast("long").as("v"), col(idCol).cast("long").as("i"))
    val floor = state.groupBy(keys: _*)
      .agg(min(witness).as("__floor"), count(lit(1)).as("__n"))
    // LEFT join: a retraction into a group with NO state row (all its
    // rows created and retracted within this batch) must ALSO hit —
    // otherwise the paired inserts would survive the anti-joins and
    // fabricate a phantom group postBase doesn't have.
    val hit = retracts.join(floor, keyNames, "left")
      .filter(col("__floor").isNull || witness >= col("__floor") ||
        col("__n") < k)
      .select(keys: _*).distinct()
    def topK(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys: _*)
        .orderBy(col(valCol).desc, col(idCol).desc)
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k).drop("__rk")
    }
    val cols = keyNames ++ Seq(idCol, valCol)
    val recomputed = topK(postBase.join(hit, keyNames, "left_semi")
      .select(cols.map(col): _*))
    val untouched = topK(state.select(cols.map(col): _*)
      .join(hit, keyNames, "left_anti")
      .unionByName(inserts.select(cols.map(col): _*)
        .join(hit, keyNames, "left_anti")))
    untouched.unionByName(recomputed)
  }

  /** Maintain a per-group MAX through one changelog batch.
    *
    * `state`: (keys, `mx`). `postBase`: the base table AFTER the batch
    * applied (what the merge sink just wrote — rows (keys, value)).
    * `inserts`: after-images added this batch (keys, value) — 'c' and
    * 'u' rows. `retracts`: before-images removed this batch — 'u' and
    * 'd' rows.
    *
    * Groups where a retracted value ties-or-beats the stored max lost
    * their witness and re-aggregate from `postBase` via a semi-join
    * (bounded by the hit groups; partition-prunes on a keyed layout).
    * Every other group takes `greatest(old max, inserted maxes)` —
    * pure delta work. New groups (no state row) appear through the
    * insert side; fully-deleted groups produce no `postBase` rows and
    * leave the state. */
  def maintainMax(state: DataFrame, postBase: DataFrame,
                  inserts: DataFrame, retracts: DataFrame,
                  keyNames: Seq[String], mxCol: String = "mx"): DataFrame = {
    val keys = keyNames.map(col)
    // A retraction can only dethrone a max it reaches: value >= stored
    // mx. LEFT join: a retraction into a group with NO state row (its
    // rows created and retracted within this batch) also hits, so the
    // group re-aggregates from postBase (to nothing, if nothing
    // survived) instead of the paired inserts fabricating a phantom.
    val hit = retracts.join(state.select(keys :+ col(mxCol): _*),
        keyNames, "left")
      .filter(col(mxCol).isNull || col("value").cast("long") >= col(mxCol))
      .select(keys: _*).distinct()
    val recomputed = postBase.join(hit, keyNames, "left_semi")
      .groupBy(keys: _*).agg(max(col("value").cast("long")).as(mxCol))
    val untouchedState = state.join(hit, keyNames, "left_anti")
      .select(keys :+ col(mxCol): _*)
    val insertMaxes = inserts.join(hit, keyNames, "left_anti")
      .groupBy(keys: _*).agg(max(col("value").cast("long")).as(mxCol))
    untouchedState.unionByName(insertMaxes)
      .groupBy(keys: _*).agg(max(col(mxCol)).as(mxCol))
      .unionByName(recomputed)
  }
}
