package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized equi-JOIN view under CDC
  * deltas on either input — the denormalization companion of
  * [[IncrementalAgg]] (a consumer of the reference's merge pipeline who
  * keeps an orders⋈customer read model current per micro-batch).
  *
  * Relations carry a multiplicity column (`mult`): base rows +1, delta
  * batches encode retractions as −1 and insertions as +1 (an update is
  * the pair) — the Z-relation currency of the incremental-view-
  * maintenance literature (DBSP / differential dataflow; delta rules of
  * Gupta & Mumick). The bilinear join delta is exact:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * with result multiplicity the PRODUCT of the sides' multiplicities,
  * then consolidation (sum mult per row, drop zeros).
  *
  * Scale shape: ΔA/ΔB are micro-batch-sized, so every term joins a
  * BROADCAST delta against a base scan whose other columns prune to the
  * view's payload — per-batch work is O(|Δ| + matched base rows), never
  * a re-join of the bases; consolidation of the view is the same
  * partial-agg-safe hash aggregate as [[IncrementalAgg.applyDeltas]]
  * (and co-partitions with a bucketed view layout). */
object IncrementalJoin {

  val multCol = "mult"

  /** Attach multiplicity +1 to a base relation. */
  def asZRelation(df: DataFrame): DataFrame =
    df.withColumn(multCol, lit(1L))

  /** Sum multiplicities of identical rows, drop annihilated ones. */
  def consolidate(df: DataFrame): DataFrame = {
    val payload = df.columns.filterNot(_ == multCol)
    df.groupBy(payload.map(col): _*)
      .agg(sum(col(multCol)).as(multCol))
      .filter(col(multCol) =!= 0L)
  }

  /** Multiplicity-aware equi-join: payload = key ∪ both payloads,
    * mult = product. `a` and `b` must share ONLY `keyNames` and
    * `mult`. */
  def zJoin(a: DataFrame, b: DataFrame, keyNames: Seq[String]): DataFrame = {
    val bRenamed = b.withColumnRenamed(multCol, "__mult_b")
    val aPayload = a.columns.filterNot(c => keyNames.contains(c) || c == multCol)
    val bPayload = b.columns.filterNot(c => keyNames.contains(c) || c == multCol)
    require(aPayload.intersect(bPayload).isEmpty,
      s"payload collision: ${aPayload.intersect(bPayload).mkString(",")}")
    a.join(bRenamed, keyNames)
      .select(keyNames.map(col) ++ aPayload.map(col) ++ bPayload.map(col) :+
        (col(multCol) * col("__mult_b")).as(multCol): _*)
  }

  /** One maintenance step: fold the batch deltas `dA`/`dB` (Z-relations,
    * ±1 rows) into the materialized view `state` given the PRE-batch
    * bases `aOld`/`bOld` (+1 Z-relations). Either delta may be empty.
    * The three delta terms each broadcast the delta side; the final
    * consolidation is one hash aggregate over state ∪ deltas. */
  def applyJoinDeltas(state: DataFrame, aOld: DataFrame, bOld: DataFrame,
                      dA: DataFrame, dB: DataFrame,
                      keyNames: Seq[String]): DataFrame = {
    val t1 = zJoin(broadcast(dA), bOld, keyNames)
    val t2 = zJoin(aOld, broadcast(dB), keyNames)
    val t3 = zJoin(broadcast(dA), dB, keyNames)
    consolidate(state.unionByName(t1).unionByName(t2).unionByName(t3))
  }
}
