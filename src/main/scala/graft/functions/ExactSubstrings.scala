package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection at character grain — the
  * distributed rolling-window form of Lee et al. 2021's suffix-array
  * ExactSubstr dedup (arXiv:2107.06499, "Deduplicating Training Data
  * Makes Language Models Better"): any character window of length `L`
  * that occurs more than once in the corpus marks every occurrence AFTER
  * the first as duplicated text, and overlapping/contiguous duplicated
  * positions merge into maximal spans — the "what to cut" artifact at a
  * finer grain than [[Boilerplate.dedupSpans]]' line-block tier.
  *
  * A suffix array is inherently sequential to build; the L-gram form is
  * the equi-join-friendly equivalent for windows of EXACTLY length L
  * (a duplicated region of length ≥ L is covered by its duplicated
  * L-windows, so merged spans recover it):
  *
  *  1. every position explodes to a 64-bit hash of its L-char window —
  *     the corpus's only blow-up, rows × avg-length, but each carries
  *     (hash, doc, pos) longs only: TEXT NEVER SHUFFLES;
  *  2. one window per hash finds the global first occurrence
  *     ((doc, pos)-min — the canonical copy stays);
  *  3. later occurrences sessionize per doc (the q29 gap-merge shape:
  *     running max of span end, break when a position clears it) into
  *     maximal spans.
  *
  * Hashing is the portable md5 family ([[TextFunctions.md5Long]]) so an
  * external engine can replay every span boundary; collisions only
  * over-mark (a false duplicate window), never miss.
  * Output: (id, span, span_start, span_end, span_len) — 1-based
  * inclusive character offsets, `span` numbered 1.. per doc. */
object ExactSubstrings {

  /** Positions (1-based) of every length-`L` window, hashed. */
  private[functions] def windowHashes(df: DataFrame, textCol: String,
                                      idCol: String, L: Int): DataFrame =
    df.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"),
        explode(sequence(lit(1), length(col(textCol)) - (L - 1))).as("pos"),
        col(textCol))
      .select(col("id"), col("pos"),
        TextFunctions.md5Long(substring_index_window(col(textCol), col("pos"), L))
          .as("h"))

  /** `substring(text, pos, L)` with a column start — named for clarity. */
  private def substring_index_window(text: Column, pos: Column, L: Int): Column =
    text.substr(pos, lit(L))

  /** Marks every post-first occurrence of each window hash and merges
    * overlapping/contiguous marked positions into maximal per-doc spans
    * (the q29 gap-merge shape) — the tail shared by the char- and
    * token-grain variants. Input: (id, pos, h) window hashes with `e`
    * the window's inclusive end position. */
  private def markAndMerge(hashes: DataFrame, winLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("h"))
      .orderBy(col("id").asc, col("pos").asc)
    val dup = hashes
      .withColumn("rn", row_number().over(byHash))
      .filter(col("rn") >= 2)
      .select(col("id"), col("pos"), (col("pos") + (winLen - 1)).as("e"))
    mergeMarks(dup)
  }

  /** Merge marked duplicate windows `(id, pos, e)` into maximal per-doc
    * spans — ONE definition shared by the batch tail above and the
    * streaming twin's per-batch consumer ([[graft.streaming.StreamAggs
    * .streamingTokenSpanMarks]] emits exactly this mark grain), so span
    * boundaries cannot drift between the two paths. */
  private[graft] def mergeMarks(dup: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos").asc)
    val prevEnd = max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("brk",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("span", sum(col("brk")).over(byDoc))
      .groupBy(col("id"), col("span"))
      .agg(min(col("pos")).as("span_start"), max(col("e")).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
  }

  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     L: Int): DataFrame =
    markAndMerge(windowHashes(df, textCol, idCol, L), L)

  /** `(id, pos, h)` token-window hashes — the shared grain of the batch
    * op and its streaming twin; `carry` threads extra column NAMES (the
    * streaming side's event time) through the explode unchanged. */
  private[graft] def tokenWindowHashes(df: DataFrame, textCol: String,
                                       idCol: String, W: Int,
                                       carry: Seq[String] = Nil): DataFrame = {
    val keep = carry.map(col)
    df
      .select(col(idCol).as("id") +:
        TextFunctions.tokens(col(textCol)).as("toks") +: keep: _*)
      .filter(size(col("toks")) >= W)
      .select(col("id") +:
        explode(sequence(lit(1), size(col("toks")) - (W - 1))).as("pos") +:
        col("toks") +: keep: _*)
      .select(col("id") +: col("pos") +:
        TextFunctions.md5Long(
          array_join(slice(col("toks"), col("pos"), lit(W)), " ")).as("h") +:
        keep: _*)
  }

  /** Token-grain twin of [[duplicateSpans]] — Lee et al.'s actual dedup
    * unit is the token, not the character (arXiv:2107.06499 §3 uses
    * 50-token windows over BPE ids): every length-`W` TOKEN window that
    * occurs more than once in the corpus marks its post-first
    * occurrences, merged into maximal removable (doc, tok_start,
    * tok_len) spans. Tokenization is the repo's canonical
    * [[TextFunctions.tokens]] (lowercase, \\s+), so the unit lines up
    * with every other token-grain operator.
    *
    * Scale shape (the q13/q254 discipline): the explode is rows ×
    * tokens but each emitted row is (id, pos, 60-bit hash) LONGS — the
    * token arrays stay inside the scan projection and TEXT NEVER
    * SHUFFLES; the only exchanges are the per-hash first-occurrence
    * window and the per-doc merge. Output: (id, span, tok_start,
    * tok_end, tok_len) — 1-based inclusive token offsets. */
  def duplicateTokenSpans(df: DataFrame, textCol: String, idCol: String,
                          W: Int): DataFrame =
    markAndMerge(tokenWindowHashes(df, textCol, idCol, W), W)
      .withColumnRenamed("span_start", "tok_start")
      .withColumnRenamed("span_end", "tok_end")
      .withColumnRenamed("span_len", "tok_len")
}
