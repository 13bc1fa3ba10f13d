package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition ("data mixture") operators: bound how much any one
  * source/domain contributes to a training corpus. Both selections order
  * each group by the md5 of the document key — a deterministic shuffle
  * that is engine-reproducible and identical across re-runs/backfills
  * (same hash family as [[Splits.splitAssign]]), with the raw key as the
  * total-order tie-break.
  *
  * Scale shape: both are one shuffle on the group key followed by a
  * bounded window. The per-group cap ranks with `row_number ≤ k`, which
  * Spark plans as WindowGroupLimit — every partition keeps at most k rows
  * per group BEFORE the exchange, so a hot domain never materializes its
  * full row set on one task. The token-budget variant needs the true
  * running sum, so its window is a full per-group scan — its guard
  * against a monster group is the upstream cap (compose: cap first,
  * budget second).
  */
object Mixture {

  /** THE deterministic order both selections share: (md5(key), key)
    * within the group. One definition so a hash-family change can never
    * silently diverge the two operators' selections. */
  private def hashWindow(groupCol: String, keyCol: String) =
    Window.partitionBy(col(groupCol))
      .orderBy(TextFunctions.md5Long(col(keyCol).cast("string")), col(keyCol))

  /** Keep at most `k` rows per group, chosen by deterministic hash order —
    * the "cap documents per domain" balancing step. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    require(!df.columns.contains("rank_aws"),
      "input already has a rank_aws column; rename it before capPerGroup")
    df.withColumn("rank_aws", row_number().over(hashWindow(groupCol, keyCol)))
      .filter(col("rank_aws") <= k)
      .drop("rank_aws")
  }

  /** Select the maximal hash-order PREFIX of each group whose running
    * token total stays within `budget` — the "mix N tokens of each
    * source" selection. The cutoff is on the cumulative total: once a
    * document pushes the running sum past the budget, it and every later
    * document in the group are dropped (no best-fit backfill — that
    * would break the prefix-closure property that makes mixtures
    * reproducible and monotone in the budget). A group whose FIRST doc
    * exceeds the budget contributes nothing. Appends `cum_tokens`, the
    * running total through the kept row. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                          tokenCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    require(!df.columns.contains("cum_tokens"),
      "input already has a cum_tokens column; rename it before tokenBudgetPerGroup")
    df.withColumn("cum_tokens",
        sum(tokenCol.cast("long")).over(hashWindow(groupCol, keyCol)))
      .filter(col("cum_tokens") <= budget)
  }

  /** α-temperature source weighting + deterministic Bernoulli subsample
    * (the multilingual-LM mixing rule: sampling weight w_s ∝ mass_s^α
    * with α < 1 flattening the distribution toward low-resource sources;
    * α is fixed at 0.5 here because sqrt is the one fractional power
    * IEEE-754 guarantees correctly rounded, so the weights are
    * bit-reproducible on any engine). Each source's per-document keep
    * rate is chosen so the EXPECTED kept-token total is `budgetTokens`
    * (clamped at 1.0 — a source asked for more than it has keeps
    * everything), and the coin flip is the md5 of the document key, not
    * an RNG: re-runs, backfills, and external replays select the exact
    * same documents.
    *
    * Returns one row per group: (groupCol, n_docs, n_tokens, weight,
    * kept_docs, kept_tokens).
    *
    * Scale shape: one partial-agg pass for the per-source stats (rows
    * out = #sources), a driver-free fold of the weight normalizer over
    * the group-sorted stats array (sum order pinned — FP addition is not
    * associative), then one scan of the corpus with the rate table
    * broadcast back. The corpus is never shuffled; both passes are
    * map-side. */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         tokenCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"token budget must be >= 1, got $budgetTokens")
    // NULL token counts participate as 0, not NULL: a source of all-NULL
    // docs must contribute 0 to the normalizer (sum-of-NULLs = NULL would
    // poison the Z fold and zero every source's selection), and its own
    // weight/rate must come out 0, not NaN.
    val rows = df.select(col(groupCol).as("grp"), col(keyCol).as("key"),
      coalesce(tokenCol.cast("long"), lit(0L)).as("tok"))
    val stats = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
    // Normalizer Z = Σ_s sqrt(tokens_s), folded left-to-right over the
    // group-name-sorted stats so the FP sum has ONE defined order.
    val z = stats
      .agg(collect_list(struct(col("grp"), sqrt(col("n_tokens").cast("double")).as("w"))).as("ws"))
      .select(aggregate(transform(array_sort(col("ws")), x => x.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("z"))
    // Zero-mass groups pin weight AND rate to 0.0 explicitly: the naive
    // budget*0/0 is NaN, and least(1.0, NaN) = 1.0 would keep ALL of a
    // zero-weight source — the opposite of the temperature contract.
    val rated = stats.crossJoin(broadcast(z))
      .withColumn("weight", when(col("n_tokens") > 0,
        sqrt(col("n_tokens").cast("double")) / col("z")).otherwise(lit(0.0)))
      .withColumn("rate", when(col("n_tokens") > 0, least(lit(1.0),
        lit(budgetTokens.toDouble) * col("weight") / col("n_tokens").cast("double")))
        .otherwise(lit(0.0)))
      .select(col("grp"), col("weight"), col("rate"))
    // Uniform-[0,1) coin from the 60-bit md5 prefix: an exact dyadic
    // rational, so the `u < rate` boundary is engine-independent.
    val u = TextFunctions.md5Long(col("key").cast("string")).cast("double") /
      lit(math.pow(2, 60))
    rows.join(broadcast(rated), Seq("grp"))
      .withColumn("u", u)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        round(min(col("weight")), 6).as("weight"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("u") < col("rate"), col("tok")).otherwise(0L)).as("kept_tokens"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis (2006) one-pass scheme: each row draws
    * u ∈ (0, 1] and sorts by the exponential key −ln(u)/w; the k
    * smallest keys ARE a weight-proportional without-replacement sample.
    * The draw is the repo's deterministic-uniform pattern (md5 of the
    * row key, no RNG state), so the sample is re-run- and
    * partitioning-identical and an external engine replays the exact
    * selection.
    *
    * Scale shape: one narrow map computes the key; the per-group top-k
    * is a row_number ≤ k that plans as WindowGroupLimit — each map task
    * keeps its local k best before the exchange. This is the
    * principled quality-weighted subsampling next to the uniform-rate
    * tiers (stratifiedSample) and the hard caps (capPerGroup).
    *
    * Rows with NULL or non-positive weight are excluded (a zero-weight
    * row has selection probability 0; letting it through with key ∞
    * would just burn a slot NaN-ily). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
                             weightCol: Column, k: Int): DataFrame = {
    val u = (TextFunctions.md5Long(col(keyCol).cast("string")) + lit(1L))
      .cast("double") / lit(1152921504606846976.0d) // (0, 1]
    val ekey = -log(u) / weightCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("es_key"), col(keyCol))
    df.filter(weightCol.isNotNull && weightCol.cast("double") > 0.0d)
      .withColumn("es_key", ekey)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
      .withColumn("es_key", round(col("es_key"), 6))
  }

  /** Exact integer water-filling: allocate `budget` units across groups
    * with equal target shares, capped by each group's availability —
    * the fair-mixture budget optimizer ("give every source the same
    * amount, unless it doesn't have that much; redistribute the slack
    * to the rest"). The closed form over the availability-sorted frame:
    * level t = the largest integer with Σ min(avail, t) ≤ budget, every
    * group gets min(avail, t), and the leftover units (< #unsaturated
    * groups) go one each to the first groups IN GROUP ORDER among those
    * with avail > t — every step integer, every tie rule named, so the
    * plan replays in any engine.
    *
    * Scale shape: one window chain over the GROUP frame (sources —
    * dozens at 100 TB), never the data; the corpus only supplies the
    * availability aggregate upstream. Output: (g, avail, alloc),
    * Σ alloc = min(budget, Σ avail). */
  def waterfillAllocate(avail: DataFrame, groupCol: String,
                        availCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val base = avail.select(col(groupCol).as("g"),
      col(availCol).cast("long").as("av"))
    val w = BoundedWindow.orderBy(col("g"), col("av").asc, col("g").asc)
    val idx = base
      .withColumn("i", row_number().over(w))
      .withColumn("cumprev",
        coalesce(sum(col("av")).over(w.rowsBetween(Window.unboundedPreceding,
          -1)), lit(0L)))
      .withColumn("n_total", count(lit(1)).over(BoundedWindow.all(col("g"))))
    // Candidate level at row i: everything below i saturates, the rest
    // split evenly. The level LANDS at the first i where it stays below
    // that row's own availability.
    val cand = idx.withColumn("t",
        floor((lit(budget) - col("cumprev")) /
          (col("n_total") - col("i") + 1)).cast("long"))
      .withColumn("lands", col("t") < col("av") && col("t") >= 0)
    val level = cand.filter(col("lands"))
      .agg(min_by(col("t"), col("i")).as("t0"))
      .select(coalesce(col("t0"), lit(Long.MaxValue)).as("lvl"))
    val leveled = cand.crossJoin(broadcast(level))
      .withColumn("base_alloc", least(col("av"), col("lvl")))
    val used = leveled.agg(sum(col("base_alloc")).as("used"))
    leveled.crossJoin(broadcast(used))
      .withColumn("rem", lit(budget) - col("used"))
      .withColumn("extra_rank", row_number().over(
        Window.partitionBy(col("av") > col("lvl"))
          .orderBy(col("g").asc)))
      .withColumn("alloc", col("base_alloc") +
        when(col("av") > col("lvl") && col("extra_rank") <= col("rem"), 1L)
          .otherwise(0L))
      .select(col("g"), col("av").as("avail"), col("alloc"))
  }
}
