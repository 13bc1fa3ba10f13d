package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.envelope.FlinkDebeziumCdc
import graft.operators.Dedup
import graft.sources.CdcGen

/** Third-decade spine measurement (VERDICT r11 #7): the core CDC path —
  * route → parse → normalize → LWW — is measured at 1M records (sf0.1
  * bench) and 10M (sf1 endurance run); this runs it at 100M in one
  * batch, pinning the third decade the way the streaming-state probe's
  * two decades pin state growth.
  *
  * Method mirrors `Queries.debezium10xBatch` exactly (same key
  * expansion, same envelope synthesizer) but with a parameterized copy
  * count, and the synthesized batch is MATERIALIZED TO PARQUET untimed
  * — at 100M rows the JSON strings (~40 GB raw) exceed any sane
  * executor-memory persist, and a Kafka broker would hold them on disk
  * anyway. The timed section reads the parquet back and runs only the
  * engine: route predicate, from_json, normalize projection, LWW
  * window, noop sink.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "runMain graft.SpineScale
  * /root/repo/scaledata/sf1 100 [reps]" → one JSON line.
  */
object SpineScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(100)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${Launch.cpus}]")
      .config("spark.sql.shuffle.partitions", Launch.cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-spinescale").toString
    try {
      // ---- untimed: synthesize and land the batch (the "broker") ----
      val cp = broadcast(spark.range(copies.toLong).select(col("id").as("copy")))
      // Stride derived from the data so copies' key ranges are exactly
      // disjoint (a fixed stride aliased users across copies — r12
      // review): distinct keys grow by exactly `copies`×.
      val stride = Tables.events(spark, sfDir)
        .agg(max(col("user_id")).cast("long")).head().getLong(0) + 1
      val expanded = Tables.events(spark, sfDir).crossJoin(cp).select(
        (col("event_id") * copies + col("copy")).as("event_id"),
        col("ts"), col("ts_ms"),
        (col("user_id") + col("copy") * stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      CdcGen.debezium(expanded.repartition(
          spark.sparkContext.defaultParallelism * 4), barrier = false)
        .write.mode("overwrite").parquet(s"$tmp/batch")
      val raw = spark.read.parquet(s"$tmp/batch")
      val n = raw.count()

      // ---- timed: the engine only (the q24 body) ----
      val spec = config.TableSpec(db = "cdc_db", table = "t0",
        primaryKey = Seq("id"))
      val lww = Seq(col("ts_ms_aws"), col("idx_aws"), col("event_id"))
      def spine(): DataFrame = {
        val routed = raw.filter(FlinkDebeziumCdc.route(col("value"), spec))
        val norm = FlinkDebeziumCdc.normalize(routed, CdcGen.payloadSchema)
        Dedup.latestPerKey(norm, Seq("id"), lww)
          .select(col("id"), col("event_id"), col("k"), col("val"),
            col("op_aws"))
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spine().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(s"""{"metric":"spine_scale","records":$n,"copies":$copies,""" +
        s""""sf":"$sfDir","secs":$best,"records_per_sec":${(n / best).toLong},""" +
        s""""reps":$reps,"all_secs":[${times.map(t => f"$t%.1f").mkString(",")}]}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(tmp))
      spark.stop()
    }
  }
}
