package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the web-corpus curation signal
  * (domain authority for crawl prioritization / quality weighting; Page et
  * al. 1999, public literature). Beyond the reference's surface, same
  * family as [[ConnectedComponents]]: graph algebra as iterated DataFrame
  * joins.
  *
  * Arithmetic is **fixed-point integer** (rank mass in `scale`-ths): every
  * step is BIGINT multiply / integer-divide / sum, so results are exactly
  * reproducible across engines and across partition orders — no
  * floating-point accumulation-order sensitivity, which is what lets an
  * external SQL oracle replay the iterations value-for-value (same reason
  * the LWW spine pins integer timestamps).
  *
  * Scale notes: each iteration is one equi-join of the edge list with the
  * current rank vector (both hash-partitioned on node id — AQE reuses the
  * exchange) and one hash aggregate; nothing ever touches the driver but
  * the scalar node count. The edge list is lineage-cut and materialized
  * once up front; ranks are checkpointed every `checkpointEvery` rounds so
  * the plan stays O(1) deep on long runs. Hub skew lands in the aggregate's
  * partial (map-side) sums, not in a window, so no salting is needed.
  */
object PageRank {

  /** (id, rank) after `iterations` damped power-iteration rounds.
    *
    * rank'(v) = scale*(den-num)/den/N  +  num * Σ_{u→v} (rank(u) div deg(u)) div den
    *
    * Dangling-node mass is dropped (the simple variant) — identical on
    * any engine replaying the same algebra.
    *
    * @param edges DataFrame with `src`/`dst` columns (self-loops and
    *              duplicate edges are removed here).
    */
  def ranks(edges: DataFrame, iterations: Int = 5,
            dampingNum: Long = 85, dampingDen: Long = 100,
            scale: Long = 1000000000000L, checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1 && dampingNum > 0 && dampingNum < dampingDen)
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true) // materialize once; every iteration re-reads it
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = nodes.count() // scalar graph size — metadata, not a data motion
    require(n > 0, "PageRank on an empty graph")
    val base = scale / dampingDen * (dampingDen - dampingNum) / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (i <- 1 to iterations) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
      ranks = nodes.join(contrib.groupBy("id").agg(sum(col("c")).as("m")), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampingNum * coalesce(m, 0)) div $dampingDen")).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
