package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[ParetoFrontier]] against the O(n²) domination definition, with
  * the tie cases that break naive skylines. */
class ParetoFrontierSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force frontier: p survives iff no q dominates it. */
  private def brute(rows: Seq[(Long, Double, Long)]): Set[Long] =
    rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Double, Long)]): Set[Long] =
    ParetoFrontier.frontier(rows.toDF("id", "cost", "gain"), "cost", "gain")
      .collect().map(_.getLong(0)).toSet

  test("matches brute force on a pseudo-random instance") {
    val rows = (1L to 300L).map { i =>
      (i, ((i * 131) % 97).toDouble, (i * 17) % 53)
    }
    assert(run(rows) == brute(rows))
  }

  test("equal-cost ties: only the max gain at a cost survives, and " +
    "duplicate (cost, gain) points all survive") {
    val rows = Seq((1L, 5.0, 10L), (2L, 5.0, 10L), (3L, 5.0, 9L),
      (4L, 4.0, 8L), (5L, 6.0, 11L))
    assert(run(rows) == brute(rows))
    // 3 loses at equal cost to the (5.0, 10) pair; duplicates 1 and 2
    // both stay; 4 stays (nothing cheaper), 5 stays (largest gain).
    assert(run(rows) == Set(1L, 2L, 4L, 5L))
  }

  test("equal-gain across costs: the cheaper point dominates") {
    val rows = Seq((1L, 1.0, 5L), (2L, 2.0, 5L), (3L, 3.0, 6L))
    assert(run(rows) == Set(1L, 3L))
    assert(run(rows) == brute(rows))
  }

  test("NULL criteria rows are dropped, not ranked") {
    val df: DataFrame = Seq((1L, Some(1.0), Some(5L)), (2L, None, Some(9L)),
      (3L, Some(0.5), None)).toDF("id", "cost", "gain")
    val out = ParetoFrontier.frontier(df, "cost", "gain")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("a true tradeoff staircase (gain rises with cost) keeps " +
    "everything; the inverted staircase collapses to the single " +
    "cheap-and-best point") {
    val stairs = (1L to 20L).map(i => (i, i.toDouble, 100L + i))
    assert(run(stairs) == stairs.map(_._1).toSet)
    val inverted = (1L to 20L).map(i => (i, i.toDouble, 100L - i))
    assert(run(inverted) == Set(1L))
  }
}
