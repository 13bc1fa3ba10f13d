package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[Tables.events]] layout adaptivity: the driver has shipped `ts` as
  * int64-nanos and as timestamp[us] across rounds (VERDICT r7 #1) and
  * may flip again — every plausible layout must normalize to the same
  * (ts timestamp, ts_ms bigint) pair, and an unrecognizable one must
  * fail loudly instead of silently corrupting the events spine. */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  // 2024-01-15T10:30:00.123456Z in epoch micros
  private val baseUs = 1705314600123456L

  private def writeLongTs(dir: String, values: Seq[Long]): String = {
    val d = Files.createTempDirectory(dir).toString
    values.toDF("ts").withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("int64 nanos / micros / millis all normalize to the same (ts, ts_ms)") {
    val expectMs = baseUs / 1000
    for ((name, raw, expectUs) <- Seq(
        ("nanos", baseUs * 1000, baseUs),
        ("micros", baseUs, baseUs),
        ("millis", baseUs / 1000, (baseUs / 1000) * 1000))) {
      val dir = writeLongTs(s"graft-tables-$name", Seq(raw, raw + 2000000L))
      val e = Tables.events(spark, dir)
      assert(e.schema("ts").dataType.typeName == "timestamp", name)
      assert(e.schema("ts_ms").dataType.typeName == "long", name)
      val row = e.orderBy("ts_ms").select(unix_micros(col("ts")), col("ts_ms")).head()
      assert(row.getLong(1) == expectMs, s"$name: ts_ms ${row.getLong(1)} != $expectMs")
      assert(row.getLong(0) == expectUs, s"$name: ts micros ${row.getLong(0)} != $expectUs")
    }
  }

  test("native timestamp layout (the current testdata) matches the int64 arms") {
    val d = Files.createTempDirectory("graft-tables-native").toString
    Seq(java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(baseUs / 1000)))
      .toDF("ts").write.mode("overwrite").parquet(s"$d/events.parquet")
    val e = Tables.events(spark, d)
    assert(e.select(col("ts_ms")).head().getLong(0) == baseUs / 1000)
  }

  test("an int64 outside every epoch-unit band fails loudly, not silently") {
    val dir = writeLongTs("graft-tables-bad", Seq(42L))
    val ex = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(ex.getMessage.contains("no epoch unit band"))
  }
}
