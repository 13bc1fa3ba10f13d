package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Static graph analytics over an undirected edge list — the third
  * graph tier next to the iterative ones ([[graft.operators.PageRank]]
  * fixed-point rank, [[graft.operators.ConnectedComponents]]
  * large-star/small-star): triangle counting with degree-ordered
  * orientation and neighborhood-Jaccard node similarity.
  *
  * Why these shapes at 100 TB:
  *
  *  - Naive triangle counting joins the edge list against itself twice
  *    — the middle wedge set is Σ_u deg(u)², which a single hub node
  *    makes quadratic. Degree-ordered orientation (Cohen 2009 / the
  *    MapReduce triangle-counting literature) directs every edge from
  *    its lower-(degree, id) endpoint to the higher one; every node's
  *    OUT-degree is then ≤ O(√m), wedges become Σ_u outdeg(u)² ≤ m^1.5
  *    worst case, and each triangle is generated exactly once (from its
  *    smallest-ordered apex) — no ÷6 correction, no duplicate traffic.
  *  - Neighborhood Jaccard meets candidates through a SHARED-NEIGHBOR
  *    equi-join (the q15 shingle shape transplanted to graphs): only
  *    node pairs with a common neighbor ever materialize, and a hub
  *    valve drops wedge centers whose degree exceeds a cap — a
  *    celebrity node contributes C(deg, 2) candidate pairs and ~zero
  *    signal, exactly like a stopword shingle.
  *
  * All outputs are integers or one explicitly-ordered rounded double,
  * so a SQL engine replays them bit-identically.
  */
object Graphs {

  /** Distinct undirected co-occurrence edges from an (order, item)
    * table: one (a, b) row per item pair sharing a group, a < b.
    *
    * `basketCap` is the skew valve: a group with more than `basketCap`
    * items contributes C(n,2) pairs and — like q120's hot blocks or
    * q15's saturated shingles — a pathological mega-basket must not
    * expand quadratically. Groups over the cap are dropped BEFORE the
    * self-join (one cheap pre-aggregate on the narrow key pair).
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        basketCap: Int = 1000,
                        distinctEdges: Boolean = true): DataFrame = {
    val pairs = df.select(col(groupCol).as("grp"), col(itemCol).as("item"))
      .distinct()
    val keep = pairs.groupBy(col("grp")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= basketCap).select(col("grp"))
    val bounded = pairs.join(keep, "grp")
    val raw = bounded.as("x").join(bounded.as("y"),
        col("x.grp") === col("y.grp") && col("x.item") < col("y.item"))
      .select(col("x.item").as("a"), col("y.item").as("b"))
    // distinctEdges=false skips the dedup shuffle for consumers that
    // re-distinct anyway ([[triangleStats]], [[labelPropagation]],
    // [[kCorePeel]] all start with their own distinct — two back-to-back
    // distincts over the pair expansion is one wasted exchange).
    if (distinctEdges) raw.distinct() else raw
  }

  /** Canonical undirected edge form, ENFORCED at every operator entry
    * (not just documented): a := min endpoint, b := max, self-loops
    * dropped, then distinct. Input containing both (a,b) and (b,a) —
    * or (a,a) — would otherwise survive a bare `distinct()` and
    * double-count degrees, wedges, and triangles. A narrow map before
    * the distinct the operators already pay for — no extra exchange. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node local clustering coefficient (Watts–Strogatz): for every
    * node, the fraction of its neighbor pairs that are themselves
    * connected — LCC_v = 2·tri_v / (deg_v·(deg_v − 1)), NULL for
    * degree < 2 (undefined, not zero). The node-grain refinement of
    * [[triangleStats]]' global clustering.
    *
    * Scale shape: the SAME degree-oriented wedge discipline as
    * [[triangleStats]] (each edge directs low→high (deg, id), so
    * out-lists are O(√m)-bounded and a hub never expands deg² wedges);
    * per-triangle credit flows as 3 narrow increments — two closed-edge
    * endpoint counts straight off the intersection SIZE and one explode
    * of the intersection members — then ONE hash aggregate per node.
    * Output: (id, deg, n_tri, lcc). */
  def localClustering(edges: DataFrame): DataFrame = {
    val e = canonical(edges).localCheckpoint()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
      .localCheckpoint()
    val empty = array().cast("array<bigint>")
    val outAdj = oriented.groupBy(col("src").as("x"))
      .agg(collect_list(col("dst")).as("outs"))
    // Per edge (u, v): the third corners w = out(u) ∩ out(v). Credit u
    // and v with the intersection SIZE (no explode needed) and each w
    // with 1 (one explode, |rows| = n_triangles).
    val inter = oriented
      .join(outAdj.select(col("x").as("src"), col("outs").as("out_u")),
        Seq("src"), "left")
      .join(outAdj.select(col("x").as("dst"), col("outs").as("out_v")),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        array_intersect(coalesce(col("out_u"), empty),
          coalesce(col("out_v"), empty)).as("ws"))
      .filter(size(col("ws")) > 0)
      .localCheckpoint(true)
    val credits = inter.select(col("src").as("id"),
        size(col("ws")).cast("long").as("t"))
      .unionAll(inter.select(col("dst").as("id"),
        size(col("ws")).cast("long").as("t")))
      .unionAll(inter.select(explode(col("ws")).as("id"), lit(1L).as("t")))
    val tri = credits.groupBy(col("id")).agg(sum(col("t")).as("n_tri"))
    deg.select(col("v").as("id"), col("deg"))
      .join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2L,
          round(lit(2.0d) * coalesce(col("n_tri"), lit(0L)).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double"), 6)).as("lcc"))
  }

  /** Global triangle census over distinct undirected edges (a, b), a<b:
    * one row (n_nodes, n_edges, n_wedges, n_triangles, clustering).
    *
    *  - `n_wedges` = Σ_v C(deg v, 2) — open-or-closed length-2 paths,
    *    from the degree table alone (never a join).
    *  - `n_triangles` via the "forward" algorithm (Schank & Wagner
    *    2005) on the degree orientation: each edge directs from its
    *    lower (deg, id) endpoint to the higher, which bounds every
    *    OUT-list to O(√m); a triangle u→v, u→w, v→w is then counted
    *    exactly once at its base edge (u, v) as w ∈ out(u) ∩ out(v).
    *    The per-edge intersection of two O(√m) arrays replaces the
    *    wedge-materializing join — the Σ C(outdeg, 2) intermediate
    *    (35M rows on the sf0.1 co-purchase graph) never exists.
    *  - `clustering` = 3·triangles / wedges (the global clustering
    *    coefficient), rounded to 6.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // localCheckpoint: the distinct edge list feeds the degree table and
    // the orientation — materializing |E| narrow rows once beats
    // re-running the caller's edge derivation (often a self-join +
    // distinct) per consumer (the PageRank edge-list discipline).
    val e = canonical(edges).localCheckpoint()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // Orient: src = smaller (deg, id), dst = larger. Ties in degree break
    // on id, so the order is total and the orientation acyclic.
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
      .localCheckpoint()
    // Out-adjacency arrays: |V| rows, list length ≤ O(√m) BY THE
    // ORIENTATION (in-lists would have no such bound — a hub receives
    // edges from everyone). Joining them onto the edge list is two
    // |V|-row equi-joins; the intersection is a narrow map.
    val empty = array().cast("array<bigint>")
    val outAdj = oriented.groupBy(col("src").as("x"))
      .agg(collect_list(col("dst")).as("outs"))
    val tri = oriented
      .join(outAdj.select(col("x").as("src"), col("outs").as("out_u")),
        Seq("src"), "left")
      .join(outAdj.select(col("x").as("dst"), col("outs").as("out_v")),
        Seq("dst"), "left")
      .select(size(array_intersect(coalesce(col("out_u"), empty),
        coalesce(col("out_v"), empty))).as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
    val base = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
    base.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0d) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double"), 6).as("clustering"))
  }

  /** Fixed-round k-core peeling census: repeatedly remove nodes of
    * degree < k (each removal can drag neighbors below k, so peeling
    * cascades), reporting (round, n_nodes, n_edges) of the surviving
    * induced subgraph after each round. The k-core is the fixed point;
    * a fixed round count keeps the schedule — and the oracle unroll —
    * deterministic (the LPA/PageRank discipline), and the census shows
    * how fast the graph collapses toward it.
    *
    * Per round: one degree aggregate + two semi-join-shaped edge
    * filters, edges localCheckpointed — work is proportional to the
    * surviving edge set, which only shrinks. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    var e = canonical(edges).localCheckpoint()
    val out = (1 to rounds).map { r =>
      val deg = e.select(col("a").as("v"))
        .union(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      e = e.join(keep.select(col("v").as("a")), "a")
        .join(keep.select(col("v").as("b")), "b")
        .select(col("a"), col("b")).localCheckpoint()
      val nodes = e.select(col("a").as("v"))
        .union(e.select(col("b").as("v"))).distinct().count()
      (r, nodes, e.count())
    }
    val spark = edges.sparkSession
    import spark.implicits._
    out.toDF("round", "n_nodes", "n_edges")
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection: every node starts labeled with its own id; each round,
    * every node adopts the most frequent label among its NEIGHBORS,
    * ties to the smallest label — fully deterministic (the asynchronous
    * variant is order-dependent; synchronous + min-tie replays
    * bit-identically in any engine, the same determinism discipline as
    * [[graft.operators.PageRank]]).
    *
    * Per round: one adjacency⋈labels equi-join, one (node, label) count
    * aggregate, one max_by((count, −label)) argmax — all
    * partial-agg-safe; the label vector is localCheckpointed each round
    * (|V| rows) so lineage stays flat. Rounds are fixed (the caller
    * unrolls the same rounds in an oracle); LPA oscillates on bipartite
    * structures, so a fixed-round census, not convergence, is the
    * contract. Output: (v, label) after `rounds` rounds.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val e = canonical(edges).localCheckpoint()
    val adj = e.select(col("a").as("v"), col("b").as("nbr"))
      .union(e.select(col("b").as("v"), col("a").as("nbr")))
      .localCheckpoint()
    var labels = adj.select(col("v")).distinct()
      .select(col("v"), col("v").as("label")).localCheckpoint()
    (1 to rounds).foreach { _ =>
      val counted = adj
        .join(labels.select(col("v").as("nbr"), col("label")), "nbr")
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("cnt"))
      labels = counted.groupBy(col("v"))
        .agg(max_by(col("label"),
          struct(col("cnt"), (-col("label")).as("nl"))).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Neighborhood-Jaccard node similarity: for every node pair with at
    * least `minCommon` shared neighbors (meeting through a
    * shared-neighbor equi-join, never all-pairs), J = |N(a)∩N(b)| /
    * |N(a)∪N(b)| over the hub-capped adjacency. Wedge centers with
    * degree > `hubCap` are dropped before the join (the frequency
    * valve); the SAME capped adjacency feeds the degree table so the
    * Jaccard denominator stays consistent with the numerator.
    *
    * Output: (a, b, common, deg_a, deg_b, jaccard) with a < b, jaccard
    * rounded to 6.
    */
  def neighborJaccard(edges: DataFrame, hubCap: Int = 1000,
                      minCommon: Int = 1): DataFrame = {
    val e = canonical(edges)
    // Symmetric adjacency (center, leaf): center is the shared neighbor.
    val adj = e.select(col("a").as("c"), col("b").as("leaf"))
      .union(e.select(col("b").as("c"), col("a").as("leaf")))
    val keep = adj.groupBy(col("c")).agg(count(lit(1)).as("cd"))
      .filter(col("cd") <= hubCap).select(col("c"))
    val capped = adj.join(keep, "c")
    val deg = capped.select(col("leaf").as("v")).groupBy(col("v"))
      .agg(count(lit(1)).as("deg"))
    val common = capped.as("x").join(capped.as("y"),
        col("x.c") === col("y.c") && col("x.leaf") < col("y.leaf"))
      .groupBy(col("x.leaf").as("a"), col("y.leaf").as("b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    common
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        round(col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")).cast("double"), 6)
          .as("jaccard"))
  }
}
