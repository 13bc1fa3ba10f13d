package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that turns
  * near-duplicate *pairs* (MinHash/LSH, SimHash, Jaccard — see
  * [[graft.functions.DedupFunctions]]) into dedup *groups*: at corpus scale
  * a document cluster is rarely a single pair, and "keep one doc per
  * cluster" needs the transitive closure, not the edge list.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * literature). Each round is pure DataFrame algebra:
  *
  *  - large-star: every node points its *larger* neighbors at the minimum
  *    of its neighborhood (including itself);
  *  - small-star: with edges oriented larger→smaller, every node points
  *    its smaller neighbors (and itself) at the neighborhood minimum.
  *
  * Both rounds strictly shrink a monotone potential and converge to star
  * graphs — every node pointing directly at its component's minimum id —
  * in O(log²) rounds on any graph (in practice 2-4 rounds for similarity
  * graphs, whose clusters are near-cliques). Compare: naive label
  * propagation needs diameter rounds and one full join per round on an
  * unreduced edge set.
  *
  * Scale notes: each round shuffles the current edge set once (window min
  * over the node id); the edge set only shrinks (toward one edge per
  * non-root node). A high-degree hub concentrates its neighborhood in one
  * task for one round, after which large-star has dispersed its larger
  * neighbors to the component minimum — self-healing, no salting needed.
  * Lineage is cut with a localCheckpoint per round (an iterative loop
  * would otherwise double the plan each round); the driver holds only the
  * per-round convergence checksum, never edge data.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges`, where
    * `component` is the minimum node id reachable from `id`. Self-loops
    * are ignored; edges are treated as undirected. Nodes absent from
    * `edges` are absent from the output (left-join and coalesce on the
    * caller's side for singleton semantics).
    *
    * Adaptive OPT-IN (r6 advice — the default is the distributed loop):
    * the deduped edge count is known before the loop starts (the
    * convergence checksum), and a near-dup edge set is usually SPARSE —
    * LSH emits pairs, not cliques' worth of rows — so a caller that
    * knows its edge budget can pass `driverMaxEdges > 0` and, when the
    * count fits, the transitive closure runs as driver union-find in one
    * pass: one collect replaces 2-4 checkpointed star rounds (each a
    * shuffle + a checksum job) and returns the identical min-id labeling
    * (property-pinned in DedupMergeSpec). Budget honestly: 2^20 edges ≈
    * 16 MB of long pairs on the wire, but the collected Row array, the
    * union-find HashMap, and the distinct-id materialization cost
    * roughly 4-6× that on the driver heap. `driverMaxEdges = 0` (the
    * default) never collects — safe for library callers on unknown
    * graphs; a 100 TB corpus can emit billions of candidate pairs. */
  def components(edges: DataFrame, src: String = "src", dst: String = "dst",
                 maxIter: Int = 25, driverMaxEdges: Long = 0L): DataFrame = {
    var e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .filter(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var checksum = edgeChecksum(e)
    if (checksum._1 <= driverMaxEdges) return driverComponents(e)
    var converged = checksum._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val next = edgeChecksum(e)
      converged = next == checksum
      checksum = next
      iter += 1
    }
    // A non-converged edge set is NOT a star forest — a node could carry
    // two labels and a dedup built on it would silently over/under-drop.
    // Fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds " +
        s"(${checksum._1} edges remain); raise maxIter")
    // Converged form is a star per component: src = member, dst = root.
    // Roots appear only on the dst side; emit their self-labels too.
    e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
  }

  /** Union-find with path compression over a collected (bounded) edge
    * set; union-by-min keeps every root the component minimum, so the
    * labeling is exactly the star-loop's fixed point. The result comes
    * back as a LocalTableScan — downstream label joins broadcast it. */
  private def driverComponents(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    import spark.implicits._
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => (id, find(id))).toSeq.toDF("id", "component")
  }

  /** Large-star: for each node u, connect every neighbor v > u to
    * m = min(Γ(u) ∪ {u}). Edge set is viewed undirected (both
    * orientations), so every edge survives in some orientation. */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = least(min(col("dst")).over(Window.partitionBy(col("src"))), col("src"))
    und.select(col("dst").as("id"), m.as("m"), col("src").as("u"))
      .filter(col("id") > col("u") && col("id") =!= col("m"))
      .select(col("id").as("src"), col("m").as("dst"))
    // No distinct here: the window min is duplicate-insensitive and
    // small-star dedups the round's output — one exchange saved per round.
  }

  /** Small-star: orient edges larger→smaller; for each node u, connect
    * u and all its smaller neighbors to m = min(Γ⁻(u) ∪ {u}). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val withM = or.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
    withM.select(col("v").as("src"), col("m").as("dst"))
      .union(withM.select(col("u").as("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Order-insensitive fingerprint of the edge set: (count, hash-xor) —
    * xor, not sum, so ANSI mode cannot overflow. Equal checksums across a
    * round ⇒ the round was a no-op ⇒ stars. */
  private def edgeChecksum(e: DataFrame): (Long, Long) = {
    val r = e.select(xxhash64(col("src"), col("dst")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
