package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * The `events` table's `ts` column has shipped in two physical layouts
  * across driver rounds:
  *   - parquet `timestamp[ns]`, which Spark 4 refuses to read natively
  *     (`PARQUET_TYPE_ILLEGAL`); with `spark.sql.legacy.parquet.nanosAsLong`
  *     the nanos arrive as a BIGINT column, and
  *   - parquet `timestamp[us]`, which Spark reads as TIMESTAMP_NTZ.
  * `events()` detects which layout it got from the scanned schema and
  * normalizes to the same two columns either way:
  *   - `ts_ms`  : epoch milliseconds (exact integer arithmetic — `div` on
  *                the nanos path, `unix_millis` on the timestamp path;
  *                session timezone is UTC so NTZ wall-clock == epoch)
  *   - `ts`     : TimestampType at microsecond precision
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

  /** events normalized to (ts timestamp, ts_ms bigint) regardless of the
    * parquet physical type of `ts` (int64-nanos or timestamp[us]/NTZ). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TimestampType or TimestampNTZType
        raw
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ms", unix_millis(col("ts")))
    }
  }

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
