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
    * Probe cost: one row count (pass `knownCount` when the caller already
    * has one — e.g. from the cached routed slice — to skip the job) plus
    * one aggregation over a ~`sampleTarget`-row Bernoulli sample; the
    * sample shuffle carries only sampled keys. Sampling is per-row
    * `rand(42)` — NOT a content hash: byte-identical redelivered rows
    * would all share one hash and enter the sample all-or-nothing, hiding
    * exactly the hot key the probe exists to find. The seeded sample can
    * differ across checkpoint replays (partition layout dependent); that
    * is safe because every strategy produces identical winners — a
    * different choice on replay changes the plan, never the result.
    *
    * Decision rule:
    *  - fewer than `minRows` rows: `window` — skew cannot form a straggler
    *    on a batch this small, and the probe itself would dominate;
    *  - one key holds ≥ `hotKeyShare` of the sample: `salted` — bounded
    *    task size no matter how dominant the key;
    *  - estimated mean rows-per-key ≥ `dupFactor`: `agg` — map-side
    *    combine collapses the duplication before the shuffle. The raw
    *    sample mean is biased toward 1 (thinning drops most of each key's
    *    rows), so the estimate inverts the Poisson-thinning curve
    *    d = λ/(1−e^−λ) — see [[estimatedDupFactor]];
    *  - otherwise `window` (shuffle already carries ~#keys rows). */
  def chooseStrategy(df: DataFrame, keys: Seq[String],
                     knownCount: Option[Long] = None,
                     minRows: Long = 100000L, sampleTarget: Long = 10000L,
                     hotKeyShare: Double = 0.05, dupFactor: Double = 4.0): String = {
    val n = knownCount.getOrElse(df.count())
    if (n < minRows) "window"
    else {
      val frac = math.min(1.0, sampleTarget.toDouble / n)
      val sampled = if (frac >= 1.0) df else df.filter(rand(42) < frac)
      val row = sampled.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(sum("c"), max("c"), count(lit(1))).head()
      if (row.isNullAt(0) || row.getLong(0) == 0L) "window"
      else {
        val (total, maxc, distinct) = (row.getLong(0), row.getLong(1), row.getLong(2))
        if (maxc.toDouble / total >= hotKeyShare) "salted"
        else if (estimatedDupFactor(total, distinct, frac) >= dupFactor) "agg"
        else "window"
      }
    }
  }

  /** Per-key-column skew advisory — the PLANNING view of what
    * [[chooseStrategy]] decides per batch: for each candidate shuffle
    * key, the exact group-size distribution statistics a partitioning
    * decision needs (how many rows, how many keys, the heaviest key's
    * share, the p99 group size against the mean) and the verdict.
    *
    * Scale shape: one two-phase hash aggregate per column (pruned
    * two-column scan; partials collapse map-side), then ALL statistics
    * — including the exact p99 — aggregate over the #keys-row group
    * table, never the data. `max_share` rounds to 6 so the advisory
    * replays cross-engine. Output per column: (key_col, n_rows, n_keys,
    * max_group, max_share, p99_group, mean_group, advise_salt). */
  def keyProfile(df: DataFrame, keyCols: Seq[String],
                 hotShare: Double = 0.01): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    keyCols.map { k =>
      df.select(col(k).as("k")).groupBy(col("k"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_group"),
          expr("percentile(c, 0.99)").as("p99d"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_group"),
          round(col("max_group").cast("double") /
            col("n_rows").cast("double"), 6).as("max_share"),
          round(col("p99d"), 2).as("p99_group"),
          round(col("n_rows").cast("double") /
            col("n_keys").cast("double"), 2).as("mean_group"))
        .withColumn("advise_salt", col("max_share") > hotShare)
    }.reduce(_ unionByName _)
  }

  /** Corrected mean-duplication estimate from a Bernoulli(frac) row sample.
    * A key duplicated c times contributes Poisson(λ = c·frac) sampled rows,
    * so the observed rows-per-*observed*-key is d = λ/(1−e^−λ), which
    * tends to 1 for small frac no matter how large c is. Inverting d for λ
    * (monotone — bisection) and dividing by frac recovers ĉ. At frac = 1
    * the sample is the batch and d IS the duplication factor. */
  private[operators] def estimatedDupFactor(total: Long, distinct: Long,
                                            frac: Double): Double = {
    val d = total.toDouble / distinct
    if (frac >= 1.0) d
    else if (d <= 1.0 + 1e-9) 1.0 // every observed key seen once: no evidence
    else {
      def f(lambda: Double): Double = lambda / (1.0 - math.exp(-lambda))
      var (lo, hi) = (1e-12, 60.0)
      if (d >= f(hi)) hi / frac
      else {
        var i = 0
        while (i < 80) { val mid = (lo + hi) / 2; if (f(mid) < d) lo = mid else hi = mid; i += 1 }
        ((lo + hi) / 2) / frac
      }
    }
  }
}
