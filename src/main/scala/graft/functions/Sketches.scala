package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches and theta-style pair
  * intersection — the FIXED-memory tier of cross-source content
  * accounting.
  *
  * The exact tiers already exist: q21 canonical fingerprints, q93's
  * cross-source duplicate-mass matrix (a full fingerprint equi-join).
  * At 100 TB a per-source distinct count — or a source×source overlap
  * matrix — should not have to shuffle every distinct fingerprint: the
  * KMV summary (Bar-Yossef et al. 2002, and the DataSketches theta
  * family) keeps only the k smallest hash values per group. Everything
  * about the estimate is then a function of ≤ k numbers per group:
  *
  *  - hashes are uniform on [0, 2^60) ([[TextFunctions.md5Long]] — the
  *    repo's portable md5 family, so DuckDB replays every value);
  *  - if a group holds fewer than k distinct hashes the sketch IS the
  *    distinct set (exact count);
  *  - otherwise the k-th smallest hash t estimates density: k-1 values
  *    fell uniformly below t, so distinct ≈ (k-1) / (t / 2^60).
  *
  * Scale shape: the per-group k-smallest runs as a rank window, which
  * Spark rewrites to WindowGroupLimit — every MAP task first trims its
  * own partition to its local k smallest before anything shuffles, so
  * the exchange carries O(partitions × k) rows regardless of corpus
  * size (duplicate copies of a surviving hash value are the only
  * slack). The naive exact count shuffles every distinct key.
  *
  * All arithmetic that reaches an output column is either integer or a
  * single explicitly-ordered double expression mirrored verbatim in the
  * oracle SQL, so estimates are bit-identical cross-engine.
  */
object Sketches {

  /** 2^60 as a double: md5Long values are uniform on [0, 2^60). */
  val HashSpace: Double = 1152921504606846976.0d

  /** The per-group sketch: k smallest distinct hash values of `key`.
    *
    * Output: (g, h) with ≤ k rows per group, h ascending-distinct —
    * exactly the k smallest distinct hash values (`dense_rank ≤ k`; see
    * [[sketchFromHashRows]] for why neither row_number nor rank is
    * correct under duplicate keys). The trailing groupBy collapses
    * duplicate copies and costs nothing — the window already cut the
    * data to the k-smallest neighborhood.
    */
  def kmvSketchRows(df: DataFrame, groupCol: String, keyCol: String,
                    k: Int): DataFrame =
    sketchFromHashRows(df.select(col(groupCol).as("g"),
      TextFunctions.md5Long(col(keyCol)).as("h")), k)

  /** The k-smallest-distinct cut over pre-hashed (g, h) rows. Also the
    * MERGE operator: k-min sets form a semilattice (the k smallest of a
    * union of per-part k-min sets ARE the k smallest of the union), so
    * re-cutting unioned sketch rows — e.g. per-day sketches with the day
    * dropped from g — yields EXACTLY the sketch of the combined data.
    * That identity (not an approximation) is what makes pre-aggregated
    * sketch tables maintainable incrementally at 100 TB: build per
    * partition/day once, merge at query time, never rescan. */
  def sketchFromHashRows(hashRows: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    // dense_rank, NOT rank: duplicate occurrences of one hash value must
    // neither displace genuinely distinct larger minima (row_number would)
    // nor burn rank slots and shrink the sketch below k distinct values
    // (rank skips after ties — with duplicated small hashes that
    // under-fills the sketch and the below-k "exact" branch then reports
    // a wrong exact count). dense_rank ≤ k = the k smallest DISTINCT
    // values, and still rewrites to WindowGroupLimit.
    hashRows.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("g"), col("h")).agg(count(lit(1)).as("dups"))
      .select(col("g"), col("h"))
  }

  /** Estimate from existing sketch rows (g, h) — the query-time half of
    * the pre-aggregated-sketch pattern. `rows` may be a union of
    * partial sketches; the cut re-applies first (see
    * [[sketchFromHashRows]] for why that is exact). */
  def kmvEstimateFromSketch(rows: DataFrame, k: Int): DataFrame =
    estimate(sketchFromHashRows(rows, k), k)

  private def estimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("g"))
      .agg(count(lit(1)).as("kmv_n"), max(col("h")).as("kth"))
      .select(col("g"), col("kmv_n"),
        when(col("kmv_n") < k, col("kmv_n"))
          .otherwise(floor(lit(k - 1) * lit(HashSpace) / col("kth"))
            .cast("long")).as("kmv_est"))

  /** Per-group distinct-count estimate from the KMV sketch.
    *
    * Output: (g, kmv_n, kmv_est) — kmv_n = sketch occupancy (= the exact
    * distinct count when it is < k), kmv_est the estimate as BIGINT via
    * floor((k-1) * 2^60 / t). The double expression is one
    * multiply-then-divide in that fixed order.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame =
    estimate(kmvSketchRows(df, groupCol, keyCol, k), k)

  /** Theta-style pairwise overlap estimate between every pair of groups,
    * from the per-group sketches alone.
    *
    * For a pair (a, b): merge the two sketches, keep the k smallest
    * union hashes (the union's own KMV sketch — θ = its k-th value);
    * within that uniform sample, the fraction present in BOTH sketches
    * estimates the Jaccard similarity, and est_common = floor(ρ ·
    * est_union). When the union sketch is not full the sample is the
    * whole union and every number is exact.
    *
    * Scale shape: sketches are ≤ k rows per group and the group list is
    * the source dimension (dozens at 100 TB), so the pair expansion is a
    * broadcast non-equi join over O(groups·k) rows — corpus size never
    * appears. The exact q93 join stays the audit tier; this is the
    * planning tier you can afford hourly.
    */
  def kmvPairOverlap(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int): DataFrame = {
    val sk = kmvSketchRows(df, groupCol, keyCol, k)
    val groups = sk.select(col("g")).distinct()
    // Tag each sketch row into every pair it belongs to, keeping which
    // side it came from. Both joins broadcast the tiny group list.
    val aRows = sk.join(broadcast(groups.select(col("g").as("g2"))),
        col("g") < col("g2"))
      .select(col("g").as("g1"), col("g2"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b"))
    val bRows = sk.join(broadcast(groups.select(col("g").as("g1"))),
        col("g1") < col("g"))
      .select(col("g1"), col("g").as("g2"), col("h"), lit(0).as("in_a"),
        lit(1).as("in_b"))
    val merged = aRows.union(bRows)
      .groupBy(col("g1"), col("g2"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("g1"), col("g2")).orderBy(col("h"))
    val unionSketch = merged.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    unionSketch.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("ku"), max(col("h")).as("theta"),
        sum(col("in_a") * col("in_b")).as("common_k"))
      .withColumn("est_union",
        when(col("ku") < k, col("ku"))
          .otherwise(floor(lit(k - 1) * lit(HashSpace) / col("theta"))
            .cast("long")))
      .withColumn("est_common",
        floor(col("common_k").cast("double") * col("est_union").cast("double") /
          col("ku").cast("double")).cast("long"))
      .select(col("g1"), col("g2"), col("common_k"), col("est_union"),
        col("est_common"))
  }
}
