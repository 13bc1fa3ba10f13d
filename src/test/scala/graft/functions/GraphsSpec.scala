package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSuite {
  import spark.implicits._

  test("triangles: K4 counts 4 triangles, clustering 1.0") {
    // Complete graph on {1,2,3,4}: C(4,3)=4 triangles, wedges=4*C(3,2)=12.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val r = Graphs.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_wedges") === 12L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("clustering") === 1.0d)
  }

  test("triangles: star graph has wedges but zero triangles") {
    val edges = (2L to 6L).map(v => (1L, v)).toDF("a", "b")
    val r = Graphs.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_wedges") === 10L) // C(5,2) at the hub
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Double]("clustering") === 0.0d)
  }

  test("triangles: duplicate edge rows do not inflate the census") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (tri ++ tri ++ tri).toDF("a", "b")
    val r = Graphs.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 1L)
  }

  test("triangles: REVERSED edges and self-loops canonicalize away " +
    "(no double-counted degrees/wedges)") {
    // Same K3 as above but every edge also appears flipped, plus
    // self-loops — the input shape a bare distinct() would NOT dedup.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    val r = Graphs.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_nodes") === 3L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 1L)
  }

  test("k-core/LPA/jaccard: reversed duplicates equal the canonical graph") {
    val canon = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 4L), (4L, 3L), (4L, 4L)).toDF("a", "b")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(sorted(Graphs.kCorePeel(messy, 2, 3)) ===
      sorted(Graphs.kCorePeel(canon, 2, 3)))
    assert(sorted(Graphs.labelPropagation(messy, 3)) ===
      sorted(Graphs.labelPropagation(canon, 3)))
    assert(sorted(Graphs.neighborJaccard(messy)) ===
      sorted(Graphs.neighborJaccard(canon)))
  }

  test("co-occurrence edges: pairs within groups, basket valve drops mega-groups") {
    val items = Seq(("o1", 10L), ("o1", 11L), ("o1", 12L), // C(3,2)=3 edges
      ("o2", 10L), ("o2", 11L), // duplicate pair with o1 — distinct keeps 1
      ("big", 1L), ("big", 2L), ("big", 3L), ("big", 4L)) // over cap 3 → dropped
      .toDF("grp", "item")
    val e = Graphs.coOccurrenceEdges(items, "grp", "item", basketCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("neighbor jaccard: twin nodes sharing all neighbors score 1.0") {
    // 1 and 2 both neighbor {3,4}; no (1,2) edge needed.
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val out = Graphs.neighborJaccard(edges, hubCap = 10, minCommon = 2)
      .collect()
    // Both twin pairs surface: (1,2) via centers {3,4}, (3,4) via {1,2}.
    assert(out.length === 2)
    val r = out.find(r => r.getAs[Long]("a") === 1L).get
    assert(r.getAs[Long]("b") === 2L)
    assert(r.getAs[Long]("common") === 2L)
    assert(r.getAs[Double]("jaccard") === 1.0d)
  }

  test("neighbor jaccard: hub valve removes candidates met only through hubs") {
    // 1 and 2 share only the hub 9 (degree 4 > cap 3) → no candidate pair.
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("a", "b")
    val out = Graphs.neighborJaccard(edges, hubCap = 3, minCommon = 1)
    assert(out.count() === 0L)
  }

  test("k-core peel: pendants peel away, the core is stable; " +
    "over-k peeling empties the graph") {
    // K4 on {1,2,3,4} plus pendant 5-1.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val k3 = Graphs.kCorePeel(edges, k = 3, rounds = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(k3(1) === ((4L, 6L)), "pendant removed, K4 intact")
    assert(k3(2) === ((4L, 6L)), "3-core is the fixed point")
    val k5 = Graphs.kCorePeel(edges, k = 5, rounds = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(k5 === ((0L, 0L)), "no node has degree 5")
  }

  test("label propagation: two cliques with one bridge resolve to two " +
    "communities labeled by their minimum ids") {
    // Clique {1,2,3} and clique {10,11,12}, bridge 3-10.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val out = Graphs.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Within each clique the min-tie majority settles on the clique's
    // smallest id; the bridge endpoints stay with their own cliques
    // (two same-clique neighbors outvote one bridge neighbor).
    assert(out(1L) === out(2L) && out(2L) === out(3L))
    assert(out(10L) === out(11L) && out(11L) === out(12L))
    assert(out(1L) !== out(10L))
  }

  test("label propagation: deterministic under repartitioning") {
    val edges = (1L to 40L).map(i => (i, (i % 20) + 100L)).toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      Graphs.labelPropagation(d, rounds = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(edges.repartition(1)) === run(edges.repartition(7)))
  }

  test("setMinhashPairs: identical sets always collide (recall 1.0); " +
    "disjoint sets never verify; partial overlap below threshold drops") {
    // Sets: 1 ≡ 2 (identical, J=1), 3 shares 2/4-union with 1 (J=0.5),
    // 4 disjoint from everything.
    val rows = (Seq(("s1", "x"), ("s1", "y"), ("s1", "z"),
      ("s2", "x"), ("s2", "y"), ("s2", "z"),
      ("s3", "x"), ("s3", "y"), ("s3", "q"),
      ("s4", "a"), ("s4", "b"))).toDF("id", "m")
    val strict = DedupFunctions.setMinhashPairs(rows, "id", "m",
      numHashes = 16, bands = 4, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(strict === Set(("s1", "s2")),
      "only the identical pair survives threshold 0.9")
    val loose = DedupFunctions.setMinhashPairs(rows, "id", "m",
      numHashes = 16, bands = 16, threshold = 0.4) // 1-row bands: high recall
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(loose(("s1", "s2")) === 1.0d)
    assert(loose.get(("s1", "s3")).contains(0.5d))
    assert(!loose.keySet.exists(p => p._1 == "s4" || p._2 == "s4"),
      "disjoint set never verifies above 0.4")
  }

  test("neighbor jaccard: partial overlap computes the exact fraction") {
    // N(1)={3,4,5}, N(2)={4,5,6}: common 2, union 4 → J=0.5.
    val edges = Seq((1L, 3L), (1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L),
      (2L, 6L)).toDF("a", "b")
    val r = Graphs.neighborJaccard(edges, hubCap = 10, minCommon = 2)
      .filter(col("a") === 1L && col("b") === 2L).collect().head
    assert(r.getAs[Long]("common") === 2L)
    assert(r.getAs[Double]("jaccard") === 0.5d)
  }
}
