package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew mitigation for the dedup/aggregation path (SURVEY.md §7.5:
  * "salting hot keys"). A CDC topic where one primary key receives a large
  * fraction of a 1M-row batch (a counter row, a hot account) makes the
  * single `PARTITION BY pk` task the straggler. Salting splits each key's
  * rows across `saltBuckets` partial groups, reduces per-group winners,
  * then resolves the true winner per key — correct because
  * last-write-wins is an associative, commutative max.
  *
  * Shuffle profile: stage 1 shuffles on (key, salt) — bounded skew of
  * batch/saltBuckets rows per task; stage 2 shuffles `saltBuckets` rows
  * per key. AQE's skew-join handling covers joins; this covers the
  * window/aggregate path AQE does not rebalance.
  */
object Skew {

  /** Stable bucket id from key columns — one definition for the salting
    * path and the bucketed merge target's layout (re-runs must bucket
    * identically for checkpoint-replay convergence). */
  def keyBucket(keys: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(keys: _*), lit(buckets.toLong)).cast("int")

  /** Deterministic salt from a unique tie-break column. */
  def saltFrom(unique: Column, saltBuckets: Int): Column =
    keyBucket(Seq(unique), saltBuckets)

  /** Two-phase last-write-wins: identical semantics to
    * [[Dedup.latestPerKey]] for any total `order`, straggler-free under
    * per-key skew. `unique` must be a unique column (e.g. the event id —
    * typically the last order component). */
  def saltedLatestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                         unique: Column, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("salt_aws", saltFrom(unique, saltBuckets))
    val partial = Dedup.latestPerKey(salted, keys :+ "salt_aws", order)
    Dedup.latestPerKey(partial.drop("salt_aws"), keys, order)
  }
}
