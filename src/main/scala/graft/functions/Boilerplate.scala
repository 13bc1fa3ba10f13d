package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  /** (doc_id, pos, block): consecutive non-overlapping `blockWords`-token
    * blocks of each document; the last block may be short. Null-text docs
    * take no part: they emit no blocks (under legacy non-ANSI mode
    * size(NULL) = -1 would otherwise yield a DESCENDING sequence and
    * phantom empty blocks). sequence upper bound (n-1)/bw = ceil(n/bw)-1,
    * clamped at 0 for safety. ONE definition shared by
    * [[stripBoilerplate]] and [[dedupSpans]] so the two operators' block
    * grids can never silently drift apart. */
  private def blockify(df: DataFrame, textCol: String, idCol: String,
                       blockWords: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val blockList = transform(
      sequence(lit(0), greatest(lit(0),
        floor((size(toks) - lit(1)) / lit(blockWords)).cast("int"))),
      i => concat_ws(" ", slice(toks, i * blockWords + 1, lit(blockWords))))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(blockList).as(Seq("pos", "block")))
  }

  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
                       blockWords: Int = 2,
                       maxDocShare: Double = 0.04): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    val src = df.filter(col(textCol).isNotNull)
    val blocks = blockify(df, textCol, idCol, blockWords)
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

  /** Exact cross-document span dedup with FIRST-occurrence retention (the
    * "deduplicating training data" exact-substring shape at block grain:
    * any block of `blockWords` tokens that already occurred earlier in the
    * corpus — in (doc_id, pos) order — is removed; its first occurrence
    * survives). Complements [[stripBoilerplate]], which removes ALL
    * occurrences of corpus-frequent blocks: here a span occurring twice
    * loses only its second copy, the generic repeated-content case rather
    * than the header/footer case.
    *
    * Returns one row per non-null-text document:
    * (doc_id, n_blocks, n_kept, dedup_text) — docs whose every block is a
    * re-occurrence keep an empty dedup_text rather than vanishing, so the
    * caller can distinguish "fully duplicated" from "absent".
    *
    * Scale shape: exact span dedup fundamentally shuffles block content —
    * the first-occurrence dictionary is corpus-sized (every distinct
    * block), so unlike [[stripBoilerplate]]'s bounded boilerplate set it
    * can never broadcast. The plan keeps that to ONE exchange: both
    * window mins partition by `block` with an empty orderSpec, sharing a
    * single partition-key sort (WindowExec requires child ordering on
    * the partition keys; the second min adds no sort of its own), and
    * first-occurrence marking happens co-partitioned — rows are never
    * joined back. The reassembly group-by is the second and last
    * shuffle, and its per-group state is one document. */
  def dedupSpans(df: DataFrame, textCol: String, idCol: String,
                 blockWords: Int = 3): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    val byBlock = Window.partitionBy(col("block"))
    // First occurrence = lexicographic min of (doc_id, pos), computed as
    // two stacked unordered window mins (min doc, then min pos within
    // that doc) — no struct-ordering dependence, and both windows share
    // one exchange + one partition-key sort.
    val marked = blockify(df, textCol, idCol, blockWords)
      .withColumn("d0", min(col("doc_id")).over(byBlock))
      .withColumn("p0",
        min(when(col("doc_id") === col("d0"), col("pos"))).over(byBlock))
      .withColumn("keep", col("doc_id") === col("d0") && col("pos") === col("p0"))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("block"))))),
          x => x.getField("block"))).as("dedup_text"))
  }
}
