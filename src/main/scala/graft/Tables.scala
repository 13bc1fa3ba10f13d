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
    * parquet physical type of `ts` (int64 epoch counts at any unit, or
    * timestamp[us]/NTZ). The int64 arm infers the unit from one sampled
    * value's magnitude — the driver has already flipped the layout once
    * (nanos → timestamp[us], VERDICT r7 #1) and a future flip to micros
    * or millis must not be silently misread as nanos. Magnitude bands
    * are unambiguous for any epoch between 2001 and 2286 (each unit is
    * 1000× apart); a value outside every band fails loudly here rather
    * than corrupting 26 downstream queries. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val sample = raw.select(col("ts")).filter(col("ts").isNotNull)
          .head(1).headOption.map(_.getLong(0))
          .getOrElse(throw new IllegalStateException(
            s"events.ts in $dir is int64 but has no non-null rows to infer the epoch unit from"))
        // epoch seconds ~1e9, millis ~1e12, micros ~1e15, nanos ~1e18.
        // (toMillisDiv, toMicrosDiv): ts keeps the finest precision a
        // TimestampType can hold (micros — same truncation DuckDB applies
        // to nanos), ts_ms stays exact integer millis.
        val (toMillisDiv, toMicrosDiv): (Long, Long) = sample match {
          case v if v >= 1e16.toLong && v < 1e20.toLong => (1000000L, 1000L) // nanos
          case v if v >= 1e13.toLong => (1000L, 1L) // micros
          case v if v >= 1e10.toLong => (1L, -1L) // millis (multiply to micros)
          case v => throw new IllegalStateException(
            s"events.ts in $dir: int64 value $v matches no epoch unit band " +
              "(expected millis/micros/nanos) — inspect the regenerated testdata")
        }
        val micros =
          if (toMicrosDiv == -1L) expr("ts * 1000") else expr(s"ts div $toMicrosDiv")
        raw
          .withColumn("ts_ms", expr(s"ts div $toMillisDiv"))
          .withColumn("ts", timestamp_micros(micros))
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
