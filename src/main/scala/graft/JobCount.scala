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
    // SPARK_GRAFT_JOBCOUNT_TRACE=1: per-callsite histogram of the jobs,
    // so a fusion round knows WHICH eager action still pays round-trips.
    val trace = sys.env.get("SPARK_GRAFT_JOBCOUNT_TRACE").contains("1")
    val sites = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        if (trace) {
          // The result stage's name is the action's short callsite.
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          sites.computeIfAbsent(site, _ => new AtomicLong(0)).incrementAndGet()
        }
        ()
      }
    })
    // NonFatal only (r17 advice): swallowing a fatal warmup error left
    // the generated inputs silently cold, charging input generation to
    // the first measured query — the exact skew this tool exists to
    // avoid. A failed warmup is now loudly flagged.
    try Queries.warmGeneratedInputs(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[jobcount] WARM FAILED (first query will " +
        s"absorb input generation): ${e.getMessage}")
    }
    val names = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        Thread.sleep(200); n.set(0); sites.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[jobcount] $name jobs=${n.get()} wall=$secs%.1f")
        if (trace) {
          import scala.jdk.CollectionConverters._
          sites.asScala.toSeq.sortBy(-_._2.get()).foreach { case (s, c) =>
            println(s"[jobsite] $name ${c.get()} $s")
          }
        }
      }
    }
    spark.stop()
  }
}
