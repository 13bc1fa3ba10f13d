package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * The `events` table is written with parquet `timestamp[ns]`, which Spark 4
  * refuses to read natively (`PARQUET_TYPE_ILLEGAL`). We read it with the
  * `spark.sql.legacy.parquet.nanosAsLong` conf (nanos arrive as a BIGINT
  * column) and derive:
  *   - `ts_ms`  : epoch milliseconds (exact integer division — `div`, not
  *                double division, which loses precision at 1e18 nanos)
  *   - `ts`     : TimestampType truncated to microseconds
  * Everything downstream orders/emits `ts_ms` so results hash-match a DuckDB
  * oracle that computes `epoch_ms(ts)` on the same parquet.
  */
object Tables {
  private def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    enableNanos(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts as long-nanos replaced by (ts timestamp, ts_ms bigint). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
