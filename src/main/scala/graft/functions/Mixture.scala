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
}
