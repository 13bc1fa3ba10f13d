package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal (the CCNet/C4 cleaning shape:
  * drop spans that repeat across many documents — headers, footers,
  * navigation chrome — keep the rest of each document intact and in
  * order). Documents are cut into fixed-width word blocks; a block
  * occurring in more than `maxDocShare` of all documents is boilerplate
  * and removed wherever it appears; survivors are reassembled in
  * original position order.
  */
object Boilerplate {

  /** Remove corpus-frequent word blocks from every document.
    *
    * Returns one row per document that keeps at least one block:
    * (doc_id, n_kept, clean_text).
    *
    * Scale shape: blocks explode narrowly off the scan; the block
    * document-frequency is a two-phase hash aggregate (distinct
    * (doc, block), then count). The boilerplate dictionary is
    * corpus-size-INDEPENDENT: a block needs ≥ maxDocShare·N occurrences
    * to qualify, so at most (avg blocks per doc)/maxDocShare distinct
    * blocks can exceed the bar — it is always broadcastable, and the
    * removal is a broadcast anti-join (no shuffle of the corpus).
    * Reassembly groups by doc_id and sorts each doc's surviving blocks
    * by position inside the aggregate — per-group memory is one
    * document, never the corpus.
    */
  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
                       blockWords: Int = 2,
                       maxDocShare: Double = 0.04): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    // Null-text docs take no part: they emit no blocks and don't count
    // toward the document-share denominator (under legacy non-ANSI mode
    // size(NULL) = -1 would otherwise yield a DESCENDING sequence and
    // phantom empty blocks).
    val src = df.filter(col(textCol).isNotNull)
    val toks = TextFunctions.tokens(col(textCol))
    // Consecutive non-overlapping blocks of `blockWords` tokens; the last
    // block may be short. sequence upper bound (n-1)/bw = ceil(n/bw)-1,
    // clamped at 0 for safety.
    val blockList = transform(
      sequence(lit(0), greatest(lit(0),
        floor((size(toks) - lit(1)) / lit(blockWords)).cast("int"))),
      i => concat_ws(" ", slice(toks, i * blockWords + 1, lit(blockWords))))
    val blocks = src.select(col(idCol).as("doc_id"),
      posexplode(blockList).as(Seq("pos", "block")))
    // Narrow single-column count — NOT derived from `blocks`, which would
    // re-tokenize and re-explode the corpus a third time just to count it.
    val nDocs = src.agg(countDistinct(col(idCol)).as("n_docs"))
    val boiler = blocks.dropDuplicates("doc_id", "block")
      .groupBy("block").agg(count(lit(1)).as("bdf"))
      .crossJoin(broadcast(nDocs))
      .filter(col("bdf") > col("n_docs") * lit(maxDocShare))
      .select("block")
    blocks.join(broadcast(boiler), Seq("block"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("block")))),
          x => x.getField("block"))).as("clean_text"))
  }
}
