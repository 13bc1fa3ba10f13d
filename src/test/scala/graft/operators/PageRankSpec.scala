package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSuite {
  import spark.implicits._

  private def ranksMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("symmetric cycle: every node holds exactly scale/N at every iteration") {
    // 0→1→2→3→0: each node has one in-edge from a node of out-degree 1,
    // so rank'(v) = base + 85%·rank(u) is identical for all v — the
    // uniform vector is the exact fixed point of the integer algebra.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val scale = 1000000000000L
    val got = ranksMap(PageRank.ranks(e, iterations = 7, scale = scale))
    val base = scale / 100 * 15 / 4
    val expected = Iterator.iterate(scale / 4, 8)(r => base + 85 * r / 100).toSeq.last
    assert(got == Map(0L -> expected, 1L -> expected, 2L -> expected, 3L -> expected))
  }

  test("one iteration of a star graph matches the hand-computed algebra") {
    // 1→0, 2→0, 3→0 (N=4). After one round:
    //   rank(0) = base + 85·(3·(init div 1)) div 100 ; leaves get base only.
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val scale = 1000000000000L
    val init = scale / 4
    val base = scale / 100 * 15 / 4
    val got = ranksMap(PageRank.ranks(e, iterations = 1, scale = scale))
    assert(got(0L) == base + 85 * (3 * init) / 100)
    assert(got(1L) == base && got(2L) == base && got(3L) == base)
    // The hub outranks the leaves and total mass is below scale only by
    // the dropped dangling mass of node 0 (documented simple variant).
    assert(got(0L) > got(1L))
  }

  test("self-loops and duplicate edges are ignored") {
    val clean = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val noisy = Seq((0L, 1L), (0L, 1L), (1L, 0L), (1L, 1L), (0L, 0L))
      .toDF("src", "dst")
    assert(ranksMap(PageRank.ranks(clean, iterations = 3)) ==
      ranksMap(PageRank.ranks(noisy, iterations = 3)))
  }

  test("deterministic across shuffle-partition layouts (integer fixed point)") {
    val edges = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12))
    val a = ranksMap(PageRank.ranks(edges.toDF("src", "dst"), iterations = 5))
    val b = ranksMap(PageRank.ranks(
      edges.toDF("src", "dst").repartition(7), iterations = 5))
    assert(a == b)
  }
}
