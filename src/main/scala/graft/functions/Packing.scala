package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: place documents into
  * fixed token-budget context windows ("packs"). This is the
  * concatenate-and-chunk scheme used by large-scale pretraining pipelines:
  * within a shard, documents are laid end-to-end in a deterministic order
  * and the stream is cut every `budget` tokens — zero padding waste by
  * construction, and a document crossing a cut is flagged (`straddles`)
  * for the loader to mask or re-chunk.
  *
  * Scale design: packing is *per shard* (`shardCol`), never a global sort —
  * a 100 TB corpus packs each shard independently (shuffle keys are shard
  * ids, cumulative sums run inside a shard's window), and shard count is
  * the parallelism knob. A single global cumsum would serialize the corpus
  * through one range-partitioned sort; sharded packing is what the
  * training loader consumes anyway (one shard per data-parallel rank).
  * First-fit-decreasing bin packing is deliberately NOT offered: it is
  * inherently sequential per bin set, saves nothing over concat-chunk when
  * straddling is allowed, and concat-chunk is the scheme used in practice.
  */
object Packing {

  /** Append pack assignment columns to `df`:
    *  - `pack_id`: window index (within the shard) where the document
    *    starts — ⌊start_offset / budget⌋;
    *  - `pack_offset`: token offset of the document inside that window;
    *  - `straddles`: true when the document crosses into the next window.
    * `orderBy` must be a deterministic total order within a shard (e.g.
    * the document id) so packing is stable across replays. Documents with
    * zero/negative token counts occupy no space: they inherit the current
    * cut position and never straddle. */
  def packDocs(df: DataFrame, tokenCol: Column, budget: Long,
               shardCol: Column, orderBy: Seq[Column]): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderBy: _*)
    val cum = sum(greatest(tokenCol, lit(0L))).over(w)
    val start = cum - greatest(tokenCol, lit(0L))
    df.withColumn("pack_id", floor(start / budget))
      .withColumn("pack_offset", start % budget)
      .withColumn("straddles",
        tokenCol > 0 && floor((cum - 1) / budget) > floor(start / budget))
  }
}
