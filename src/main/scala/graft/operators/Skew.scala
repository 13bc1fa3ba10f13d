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

  /** Sampled strategy chooser backing `dedup_strategy=auto`: picks the LWW
    * physical strategy from the batch's *actual* key distribution instead
    * of a static per-table setting (the distribution shifts over a stream's
    * life — a key is hot during a backfill, cold after).
    *
    * Probe cost: one `count` over the (already cached) routed slice plus
    * one aggregation over a ~`sampleTarget`-row hash sample — the sample
    * shuffle carries only sampled keys. The sample is taken by hashing the
    * full row (`pmod(xxhash64(*), n/sampleTarget) = 0`), so it is
    * row-level (per-key share is preserved in expectation) and
    * deterministic across checkpoint replays — the same batch always
    * probes, and therefore dedups, the same way (T3). All three outcomes
    * produce identical winners regardless, so a sampling misjudgment costs
    * only efficiency, never correctness.
    *
    * Decision rule:
    *  - fewer than `minRows` rows: `window` — skew cannot form a straggler
    *    on a batch this small, and the probe itself would dominate;
    *  - one key holds ≥ `hotKeyShare` of the sample: `salted` — bounded
    *    task size no matter how dominant the key;
    *  - mean rows-per-key ≥ `dupFactor`: `agg` — map-side combine collapses
    *    the duplication before the shuffle;
    *  - otherwise `window` (shuffle already carries ~#keys rows). */
  def chooseStrategy(df: DataFrame, keys: Seq[String],
                     minRows: Long = 100000L, sampleTarget: Long = 10000L,
                     hotKeyShare: Double = 0.05, dupFactor: Double = 4.0): String = {
    val n = df.count()
    if (n < minRows) "window"
    else {
      val everyNth = math.max(1L, n / sampleTarget)
      val sampled = df.filter(
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(everyNth)) === 0)
      val row = sampled.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(sum("c"), max("c"), count(lit(1))).head()
      if (row.isNullAt(0) || row.getLong(0) == 0L) "window"
      else {
        val (total, maxc, distinct) = (row.getLong(0), row.getLong(1), row.getLong(2))
        if (maxc.toDouble / total >= hotKeyShare) "salted"
        else if (total.toDouble / distinct >= dupFactor) "agg"
        else "window"
      }
    }
  }
}
