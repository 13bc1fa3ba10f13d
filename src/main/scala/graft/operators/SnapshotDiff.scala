package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff for incremental corpus ingest: classify every key across
  * two snapshots as added / removed / changed / unchanged by comparing
  * canonical content fingerprints. The planning primitive behind
  * incremental pipelines — re-embedding, re-tokenizing, or re-deduping
  * only the `added`+`changed` slice turns an O(corpus) daily job into
  * O(delta), which is the difference between feasible and not at 100 TB.
  *
  * Plan: both sides project to (key, 16-byte fingerprint) IN THE SCAN —
  * document text never enters the join — then one full-outer
  * sort-merge/hash join on the key. Each side shuffles once on the key;
  * at scale, bucketing both snapshots by the key makes the join
  * exchange-free.
  */
object SnapshotDiff {

  /** Per-key change row: (key, change ∈ added|removed|changed|unchanged).
    * `added` = in `cur` only, `removed` = in `old` only, `changed` = in
    * both with different canonical text. Keys are assumed unique per
    * snapshot (dedup upstream — q13 — if not). */
  def diff(old: DataFrame, cur: DataFrame, keyCol: String,
           textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) = df.select(
      col(keyCol), TextFunctions.fingerprint(col(textCol)).as(s"fp_$side"))
    fp(old, "old").join(fp(cur, "cur"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("fp_old").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_old") =!= col("fp_cur"), "changed")
          .otherwise("unchanged").as("change"))
  }
}
