package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality: Z-order (Morton) keys.
  *
  * Writing a 100 TB table ordered by ONE column makes min/max file
  * statistics useless for every other column. Interleaving the bits of
  * two (bucketized) dimensions into one Morton key and laying files out
  * along that key gives every file a tight bounding box in BOTH
  * dimensions, so a predicate on either column prunes most files at the
  * scan (the same trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies).
  *
  * Everything here is fixed-space arithmetic — no global sort, no sample
  * pass, no window: the Morton key is a per-row bit shuffle and the file
  * id is the key's top bits (a fixed quad-tree partitioning of the
  * space). At scale the write is `df.repartitionByRange(col("zfile"))`
  * (or a bucketed write on it); locally the assignment itself is what
  * the oracle value-checks.
  */
object Layout {

  /** Morton-interleave two non-negative int columns of `bits` bits each:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order file assignment: bucketize both dimensions to `bits` bits
    * (modulo), Morton-interleave, and take the key's top bits as the file
    * id — `nFiles` must be a power of four ≤ 4^bits so the id is a full
    * quad-tree level and every file covers a square of the bucket grid.
    * Adds `zval` and `zfile`. */
  def zorderAssign(df: DataFrame, x: Column, y: Column,
                   bits: Int, nFiles: Int): DataFrame = {
    val level = (math.log(nFiles) / math.log(4)).round.toInt
    require(1 << (2 * level) == nFiles && level <= bits,
      s"nFiles must be a power of 4 (<= 4^bits), got $nFiles")
    val z = morton(pmod(x, lit(1 << bits)), pmod(y, lit(1 << bits)), bits)
    df.withColumn("zval", z)
      .withColumn("zfile", shiftright(col("zval"), 2 * (bits - level)))
  }

  /** Per-file layout audit: row count and the bounding box of both
    * (bucketized) dimensions — the min/max statistics a reader would
    * prune on. Tight boxes on BOTH columns are the point of Z-order. */
  def zorderFileStats(df: DataFrame, x: Column, y: Column,
                      bits: Int, nFiles: Int): DataFrame = {
    val xb = pmod(x, lit(1 << bits)); val yb = pmod(y, lit(1 << bits))
    zorderAssign(df, x, y, bits, nFiles)
      .select(col("zfile"), xb.as("xb"), yb.as("yb"))
      .groupBy("zfile")
      .agg(count(lit(1)).as("cnt"),
        min("xb").as("min_x"), max("xb").as("max_x"),
        min("yb").as("min_y"), max("yb").as("max_y"))
  }

  /** Hive-style day partitioning for an event table — the OTHER half of
    * physical layout next to Z-order: a `day=…/` directory per epoch
    * day, so a time-ranged read is pruned at PLAN time (the scan's
    * `PartitionFilters` eliminates whole directories before a single
    * row group is opened — at 100 TB the difference between touching
    * one day and listing three years). Within each day, data-column
    * predicates still push down to parquet row groups; the two prunings
    * compose (pinned in PlanSpec). */
  def writeDayPartitioned(df: DataFrame, tsMsCol: Column,
                          path: String): Unit =
    df.withColumn("day", tsMsCol.divide(lit(86400000L)).cast("long"))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  /** Read back a day-partitioned table with a day-range predicate in
    * partition-pruning position. */
  def readDayRange(spark: org.apache.spark.sql.SparkSession, path: String,
                   fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
}
