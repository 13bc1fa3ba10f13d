package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the tokenizer-training step of a
  * training-data pipeline, run against the corpus itself (byte-pair
  * encoding in the Sennrich et al. formulation: repeatedly merge the
  * globally most frequent adjacent symbol pair; reference tokenizers are
  * trained with exactly this loop, just single-node).
  *
  * The corpus-scale insight is that BPE statistics live on the WORD
  * FREQUENCY table, not the corpus: one explode+count pass collapses
  * 100 TB of text into a vocabulary-sized (word, freq) DataFrame, and
  * every merge round after that is an aggregation over the vocab only.
  * The corpus is scanned exactly once regardless of the merge count.
  *
  * Each round:
  *  - adjacent symbol pairs of every word, weighted by word frequency,
  *    partially aggregate map-side (pair space is vocabulary-bounded);
  *  - the argmax pair (count desc, pair asc tie-break — deterministic)
  *    comes back to the driver as ONE row per round, the same O(1)
  *    driver traffic as the connected-components convergence checksum;
  *  - the merge applies to the vocab's symbol arrays via a higher-order
  *    fold (leftmost, non-overlapping — standard BPE), and a
  *    localCheckpoint cuts the per-round lineage exactly as the CC loop
  *    does.
  *
  * Not SQL-expressible as one query (the loop carries state between
  * rounds), so this operator is spec-verified rather than
  * DuckDB-oracle-verified: known-merge toy corpora, the leftmost
  * non-overlap property, and re-run determinism.
  */
object Bpe {

  /** The corpus→vocab collapse: (word, freq), one pass, map-side
    * combined. Empty-token artifacts are dropped. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(TextFunctions.tokens(col(textCol)),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One BPE merge applied to a symbol array: adjacent (a, b) becomes
    * "ab", leftmost occurrence first, non-overlapping ("aaa" under
    * (a,a) → [aa, a], never [a, aa]). Pure higher-order fold — the
    * accumulator carries the rebuilt array plus a skip flag for the
    * consumed right symbol. try_element_at: the i+1 lookahead runs off
    * the end on the last element and must yield null, not an ANSI
    * error. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      sequence(lit(1), size(syms)),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) => {
        val cur = element_at(syms, i)
        val nxt = try_element_at(syms, i + lit(1))
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
          .when(cur === lit(a) && nxt === lit(b),
            struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(acc.getField("out"), array(cur)).as("out"),
              lit(false).as("skip")))
      },
      acc => acc.getField("out"))

  /** Train `numMerges` BPE merges over a (word, freq) vocabulary.
    *
    * Returns the learned merges in rank order plus the trained
    * segmentation dictionary (word → symbol array after all merges) —
    * the dict is the artifact a corpus-wide tokenize step broadcast-joins
    * against (words repeat; segmentation is per-distinct-word work).
    * Training stops early when no adjacent pair occurs twice. */
  def trainMerges(vocab: DataFrame, numMerges: Int)
      : (Seq[(String, String)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var syms = vocab.select(col("word"), col("freq").cast("long").as("freq"),
      split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairs = syms
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + lit(1)).as("b")))).as("p"))
        .groupBy(col("p")).agg(sum(col("freq")).as("cnt"))
        // a pair must occur at least twice for merging it to compress
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("p.a").asc, col("p.b").asc)
        .limit(1)
        .collect()
      if (pairs.isEmpty) done = true
      else {
        val p = pairs.head.getStruct(0)
        val (a, b) = (p.getString(0), p.getString(1))
        merges += ((a, b))
        syms = syms.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        round += 1
      }
    }
    (merges.result(), syms)
  }

  /** Tokenize a corpus with a trained segmentation dictionary: each
    * document's words explode with position, broadcast-join the
    * (word → syms) dict — segmentation is per-DISTINCT-word work done
    * once at training, never per occurrence — and the per-word symbol
    * arrays flatten back in word order inside the per-doc aggregate.
    * Out-of-vocabulary words fall back to character symbols (the classic
    * BPE fallback: every learned merge starts from characters, so an
    * unseen word simply gets no merges).
    *
    * Returns (doc_id, n_bpe_tokens, bpe_tokens). */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
               dict: DataFrame): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
      posexplode(filter(TextFunctions.tokens(col(textCol)),
        t => length(t) > 0)).as(Seq("pos", "word")))
    words.join(broadcast(dict.select(col("word"), col("syms"))), Seq("word"), "left")
      .withColumn("syms", coalesce(col("syms"), split(col("word"), "")))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("syms")))),
          x => x.getField("syms"))).as("bpe_tokens"))
      .select(col("doc_id"), size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"),
        col("bpe_tokens"))
  }
}
