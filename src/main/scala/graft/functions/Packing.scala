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

  /** Sliding-window document chunking (the retrieval/RAG complement of
    * [[packDocs]]): cut each document into token windows of `window`
    * tokens advancing by `stride` (overlap = window − stride). Chunk
    * starts are 0, stride, 2·stride, …; the last start is the smallest
    * multiple of stride covering the tail, so every token lands in ≥1
    * chunk and no degenerate sub-stride tail chunks are emitted. Returns
    * one row per chunk: (doc_id, chunk_id, n_tok, chunk_text).
    *
    * Scale: pure narrow map + generator — no shuffle, no state; the
    * expansion factor is ~window/stride. Deterministic: chunk ids and
    * boundaries are integer arithmetic on token positions. */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    // Null-text docs produce no chunks (size(NULL) would otherwise turn
    // into a phantom chunk under ANSI, or n = -1 under legacy mode).
    val src = df.filter(col(textCol).isNotNull)
    // extra chunks past the first = ceil((n - window) / stride), min 0
    val nExtra = greatest(lit(0),
      floor((n - lit(window) + lit(stride) - lit(1)) / lit(stride)).cast("int"))
    val chunks = transform(sequence(lit(0), nExtra), i =>
      struct(
        concat_ws(" ", slice(toks, i * stride + 1, lit(window))).as("txt"),
        least(lit(window), n - i * stride).cast("long").as("ntok")))
    src.select(col(idCol).as("doc_id"), posexplode(chunks).as(Seq("cid", "c")))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        col("c.ntok").as("n_tok"), col("c.txt").as("chunk_text"))
  }
}
