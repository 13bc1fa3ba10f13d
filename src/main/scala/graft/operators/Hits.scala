package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) in the repo's
  * exact integer fixed-point algebra (the [[PageRank]] discipline):
  * hub/authority scores are scaled longs, the mutual-reinforcement
  * updates a_j = Σ_{i→j} h_i and h_i = Σ_{i→j} a_j are exact integer
  * sums (order-independent, so partial aggregation cannot change a
  * bit), and the per-iteration L1 normalization back to `scale` is one
  * decimal(38,0) multiply + integral division — every step replays
  * bit-for-bit on any engine running the same algebra, which is what
  * makes the oracle comparison possible where a float L2 norm would
  * drift.
  *
  * Scale shape: per iteration, one equi-join edge×score + one
  * partial-aggregated sum per side, exactly PageRank's motion; the
  * normalizing total is a 1-row broadcast. Overflow contract: per-node
  * raw sums accumulate in decimal(38,0) — the same algebra as the
  * oracle's HUGEINT, so a billion-degree node cannot silently wrap a
  * long under non-ANSI mode — and the normalized products stay in
  * decimal(38,0), good for scale² · maxDegree ≤ 10^38.
  *
  * @param edges directed (src, dst) pairs; duplicates removed here.
  * @return one row per (node, side): side ∈ hub (src nodes) /
  *         authority (dst nodes), score summing to ~`scale` per side
  *         (minus integral-division truncation).
  */
object Hits {

  def scores(edges: DataFrame, iterations: Int = 5,
             scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "HITS needs at least one iteration")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true) // re-read every iteration; cut the lineage once
    var hub = e.select(col("src").as("id")).distinct()
      .withColumn("h", lit(scale))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      // Per-node raw sums in decimal(38,0), mirroring the oracle's
      // HUGEINT: a node whose in-degree · scale crosses 2^63 would
      // otherwise wrap silently under non-ANSI long arithmetic.
      val araw = e.join(hub.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("h").cast("decimal(38,0)")).as("raw"))
      auth = renorm(araw, "a", scale)
      val hraw = e.join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(sum(col("a").cast("decimal(38,0)")).as("raw"))
      hub = renorm(hraw, "h", scale)
    }
    hub.select(col("id"), lit("hub").as("side"), col("h").as("score"))
      .unionByName(auth.select(col("id"), lit("authority").as("side"),
        col("a").as("score")))
  }

  /** L1-renormalize integer `raw` scores to sum ~`scale`: exact integer
    * total (1-row broadcast), decimal(38,0) product, integral div.
    * The raw frame is MATERIALIZED first (one narrow row per node —
    * cheap): it is referenced twice here (total + normalize) and again
    * by the next half-iteration's join, so an uncut lineage would
    * re-run every earlier iteration per reference (~2^iterations). */
  private def renorm(raw0: DataFrame, out: String, scale: Long): DataFrame = {
    val raw = raw0.localCheckpoint(true)
    // The total sums per-NODE raws whose own bound is maxInDegree·scale,
    // but the TOTAL is Σ ≈ |E|·scale — past 2^63 already at ~9.2M edges
    // (sf3 has ~18M), so it must accumulate in decimal, exactly like the
    // oracle's HUGEINT sum. Per-node raws arrive as decimal(38,0) too
    // (summed that way upstream), so the inner cast is a no-op kept for
    // callers that pass long-typed raws.
    raw.crossJoin(broadcast(
        raw.agg(sum(col("raw").cast("decimal(38,0)")).as("tot"))))
      .select(col("id"),
        expr(s"cast((cast(raw as decimal(38,0)) * $scale) div tot as long)")
          .as(out))
  }
}
