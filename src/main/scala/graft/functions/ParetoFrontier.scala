package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) over two numeric criteria — the "no other
  * row is at least as good on both axes and strictly better on one"
  * filter behind price/performance shortlists and multi-objective
  * candidate pruning.
  *
  * Domination (minimize `cost`, maximize `gain`): q dominates p iff
  * q.cost ≤ p.cost ∧ q.gain ≥ p.gain ∧ (q.cost < p.cost ∨ q.gain >
  * p.gain). The naive plan is the all-pairs NOT EXISTS anti-join —
  * O(n²) and dead at scale. This is the sort-based skyline instead:
  *
  *   1. collapse to the cost grain, keeping each cost's max gain
  *      (a row below its own cost's max is dominated at equal cost);
  *   2. running max of gain over costs STRICTLY cheaper — an exclusive
  *      prefix scan, built from [[PrefixScan]]'s inclusive RunMax +
  *      RowNumber by an rn→rn−1 self equi-join on the cost grain (no
  *      unpartitioned window anywhere);
  *   3. a row survives iff gain > that strictly-cheaper prefix max
  *      (ties in gain against a cheaper row lose: the cheaper row
  *      dominates via cost) and gain = its cost's max (ties at equal
  *      cost and equal gain all survive — neither dominates).
  *
  * Cost: two aggregates + the PrefixScan two-pass — every step keyed,
  * nothing all-pairs, nothing single-task. */
object ParetoFrontier {

  /** Filters `df` to its Pareto frontier, minimizing `costCol` and
    * maximizing `gainCol` (negate a column to flip a direction). Rows
    * with NULL in either criterion are dropped — NULL cannot be
    * ordered against the frontier. Adds nothing; returns the input
    * rows (original columns) that survive. */
  def frontier(df: DataFrame, costCol: String, gainCol: String,
               bins: Int = 32): DataFrame = {
    val in = df.filter(col(costCol).isNotNull && col(gainCol).isNotNull)
    val grain = in.groupBy(col(costCol).as("__fc"))
      .agg(max(col(gainCol)).as("__fg"))
    val scanned = PrefixScan.scan(grain, col("__fc"),
      Seq(col("__fc").asc),
      Seq(PrefixScan.RunMax(col("__fg"), "__frm"),
        PrefixScan.RowNumber("__frn")), bins = bins)
    // Exclusive prefix: the inclusive running max of the PREVIOUS cost
    // row (rn−1). The first cost row joins nothing → no cheaper row →
    // survives on the gain==max-at-cost condition alone.
    val prev = scanned.select((col("__frn") + 1L).as("__frn"),
      col("__frm").as("__fprev"))
    val keep = scanned.join(prev, Seq("__frn"), "left")
      .filter(col("__fprev").isNull || col("__fg") > col("__fprev"))
      .select(col("__fc"), col("__fg"))
    in.join(keep,
      col(costCol) === col("__fc") && col(gainCol) === col("__fg"))
      .drop("__fc", "__fg")
  }
}
