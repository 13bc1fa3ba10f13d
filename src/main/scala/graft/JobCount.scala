package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Load-invariant measurement probe (optimization guide §1: measure
  * first, and measure something the neighbor load cannot fake): counts
  * SPARK JOBS per named query. The maintained-state queries
  * (q298/q299/q300) are driver-round-trip-bound — dozens of tiny eager
  * jobs per ingest — so their wall time on a noisy shared host swings
  * 2-4x while the job count is exactly reproducible. Used for the r17
  * before/after evidence alongside wall-clock.
  *
  * Run: SPARK_GRAFT_BENCH_ONLY=q298_... sbt "runMain graft.JobCount" */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${Launch.cpus}]")
      .config("spark.sql.shuffle.partitions", Launch.cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.spreadSmallScans", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    })
    try Queries.warmGeneratedInputs(spark, sfDir)
    catch { case _: Throwable => }
    val names = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        Thread.sleep(200); n.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[jobcount] $name jobs=${n.get()} wall=$secs%.1f")
      }
    }
    spark.stop()
  }
}
