package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-splitting and decontamination operators for training-data
  * pipelines:
  *
  *  - `splitAssign` — deterministic, engine-reproducible train/val/test
  *    assignment from the md5 of a stable key (no RNG state, no shuffle;
  *    re-runs and backfills land every row in the same split);
  *  - `crossSplitContamination` — near-duplicate pairs that straddle a
  *    split boundary (test-set leakage): the standard decontamination
  *    check, reusing the shingle-join Jaccard machinery (never all-pairs);
  *  - `repetitionScore` — intra-document repeated-n-gram ratio (a
  *    Gopher-style repetition filter signal): 1 − distinct/total n-grams.
  *
  * All pure column algebra; the split hash uses md5 (not xxhash) so SQL
  * oracles in other engines can reproduce assignments byte-for-byte.
  */
object Splits {

  /** Split by the first hex digit of md5(key): 0..b → train (12/16),
    * c..d → val (2/16), e..f → test (2/16). */
  def splitAssign(key: Column): Column = {
    val h = substring(md5(key.cast("string")), 1, 1)
    when(h < "c", "train").when(h < "e", "val").otherwise("test")
  }

  /** Documents flagged with their split (adds a `split` column). */
  def withSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split", splitAssign(col(idCol)))

  /** Leakage-safe GROUP split: the split is a function of `groupCol`
    * (domain, source, author…), so every document of a group lands in
    * the same split BY CONSTRUCTION — near-identical documents cluster
    * within domains, and a doc-level hash split scatters those twins
    * across train/eval (the leakage q26 then has to hunt). The price is
    * balance: splits are now sums of group sizes, so verify proportions
    * downstream (and split on the finest group that still blocks
    * leakage). Same md5 algebra as [[splitAssign]] — deterministic, no
    * RNG, no shuffle, externally replayable. */
  def withGroupSplit(df: DataFrame, groupCol: String): DataFrame =
    df.withColumn("split", splitAssign(col(groupCol)))

  /** Near-duplicate pairs (n-gram Jaccard ≥ threshold) whose members fall
    * in different splits — training-set contamination of eval splits.
    * Inherits the default-on shingle-frequency cap
    * ([[DedupFunctions.ShingleCap.Auto]]) — decontamination sweeps run over
    * the full corpus, where the uncapped join is the skew hazard. */
  def crossSplitContamination(df: DataFrame, textCol: String, idCol: String,
                              n: Int, threshold: Double,
                              cap: DedupFunctions.ShingleCap = DedupFunctions.ShingleCap.Auto): DataFrame = {
    val pairs = DedupFunctions.ngramJaccardPairs(df, textCol, idCol, n, threshold, cap)
    pairs
      .withColumn("split_a", splitAssign(col("id_a")))
      .withColumn("split_b", splitAssign(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))
  }

  /** Per-document contamination score against a FIXED evaluation corpus:
    * the fraction of the document's distinct n-gram shingles that occur
    * anywhere in the eval set — the direct "n-gram overlap with the
    * benchmark" metric (GPT-3 appendix C shape), complementing
    * [[crossSplitContamination]]'s pairwise within-corpus sweep.
    *
    * Scale shape: the eval shingle set is benchmark-sized (thousands of
    * docs), so it broadcasts; the 100 TB training corpus is scanned ONCE,
    * its shingles semi-joined against the broadcast set and the hit
    * count aggregated map-side per doc. No corpus self-join, no shuffle
    * of text. Score = n_hit / n_sh (exact integers, one division —
    * engine-reproducible). */
  def contaminationScore(train: DataFrame, eval: DataFrame,
                         textCol: String, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val tr = train.select(col(idCol).as("doc_id"),
        DedupFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val evalShingles = eval
      .select(explode(DedupFunctions.shingles(col(textCol), n)).as("s"))
      .distinct()
    val hits = tr.select(col("doc_id"), explode(col("sh")).as("s"))
      .join(broadcast(evalShingles), Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    tr.select(col("doc_id"), size(col("sh")).as("n_sh"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("score",
        round(col("n_hit").cast("double") / col("n_sh").cast("double"), 6))
  }

  /** Bloom-filter decontamination — the beyond-broadcast tier of
    * [[contaminationScore]]: when the eval shingle set no longer fits a
    * broadcast hash set (benchmarks × paraphrase expansions at corpus
    * scale), it still fits as `bits` bloom BITS. The filter builds as a
    * FIXED-size aggregate (word index → bit_or of masks — at most
    * bits/64 rows regardless of eval size, partial-agg'd map-side like
    * the CMS counters), broadcasts those ≤ bits/64 longs, and each
    * training shingle probes with `hashes` md5 positions. Bloom errors
    * are one-sided: n_hit ≥ the exact semi-join count (false positives
    * only), so the score is a SOUND over-estimate — safe for a
    * contamination GATE, and exactly replayable by any engine with the
    * same md5 family + 64-bit ops.
    *
    * Output: (doc_id, n_sh, n_hit, score) like [[contaminationScore]]. */
  def bloomContamination(train: DataFrame, eval: DataFrame,
                         textCol: String, idCol: String, n: Int,
                         bits: Int = 1008, hashes: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // 63-bit word packing: shifts stay <= 62, so an engine with CHECKED
    // signed shifts (the oracle) computes the identical masks a silent
    // two's-complement engine would — bit 63 is never touched.
    require(bits % 63 == 0 && hashes >= 1, "bits must be 63-aligned")
    def posOf(r: Int, sg: Column): Column =
      pmod(TextFunctions.md5Long(concat(lit(s"$r:"), sg)), lit(bits))
    def wordOf(pos: Column): Column = (pos / 63).cast("int")
    def maskOf(pos: Column): Column =
      call_function("shiftleft", lit(1L), pmod(pos, lit(63)).cast("int"))
    val evalShingles = eval
      .select(explode(DedupFunctions.shingles(col(textCol), n)).as("s"))
      .distinct()
    val bloom = evalShingles
      .select(posexplode(array((0 until hashes).map(r => posOf(r, col("s"))): _*))
        .as(Seq("r", "pos")))
      .select(wordOf(col("pos")).as("word"), maskOf(col("pos")).as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
    val tr = train.select(col(idCol).as("doc_id"),
        DedupFunctions.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val probes = tr.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), col("s"),
        posexplode(array((0 until hashes).map(r => posOf(r, col("s"))): _*))
          .as(Seq("r", "pos")))
      .select(col("doc_id"), col("s"), wordOf(col("pos")).as("word"),
        maskOf(col("pos")).as("mask"))
    val contained = probes
      .join(broadcast(bloom), Seq("word"), "left")
      .withColumn("hit", coalesce(col("bits").bitwiseAND(col("mask")) =!= 0, lit(false)))
      .groupBy(col("doc_id"), col("s"))
      .agg(min(col("hit")).as("contained")) // every hash position must be set
    val hits = contained.filter(col("contained"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    tr.select(col("doc_id"), size(col("sh")).as("n_sh"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("score",
        round(col("n_hit").cast("double") / col("n_sh").cast("double"), 6))
  }

  /** Deterministic stratified sampling: keep a row iff its key's md5
    * bucket (0..99) falls under the stratum's rate. Same engine-
    * reproducible hash family as [[splitAssign]] — no RNG, no seed
    * state, re-runs and backfills keep exactly the same rows, and the
    * filter is a narrow map that pushes to the scan (no shuffle, no
    * per-stratum pass). `rates` maps stratum value → sampling fraction;
    * unlisted strata use `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       rates: Seq[(String, Double)],
                       defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "sampling rates must be within [0, 1]")
    val bucket = pmod(TextFunctions.md5Long(col(keyCol).cast("string")), lit(100))
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((stratum, r), acc) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate * lit(100))
  }

  /** Repeated-n-gram ratio: 0 = all n-grams distinct, → 1 as the document
    * repeats itself. Single narrow map; no shuffle. */
  def repetitionScore(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val total = greatest(size(toks) - (n - 1), lit(0))
    val distinctN = size(DedupFunctions.shingles(text, n))
    when(total > 0,
      round(lit(1.0) - distinctN.cast("double") / total.cast("double"), 6))
      .otherwise(lit(0.0))
  }
}
