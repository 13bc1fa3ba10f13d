package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput measurement for the maintained cut report (the r13
  * flagship), TWO workload arms over the planted sf corpus against
  * fresh state dirs, each ingest timed end-to-end INCLUDING all state
  * writes and the atomic version commit:
  *
  *  - `append`   — contiguous doc_id ranges in ascending order, the
  *    production ingest shape: owners never change, so every bucket
  *    takes the stable fast path ((owner, new-member) candidates only)
  *    and per-ingest cost must stay ~flat regardless of how hot the
  *    planted cluster's bucket gets.
  *  - `backfill` — interleaved residues, highest first: every ingest
  *    undercuts the hot cluster's owner, re-roots the star, and
  *    legitimately repairs the whole cluster's report rows — per-ingest
  *    cost GROWS with the repaired set, which is the honest price of a
  *    backfill, not overhead (the touched counts in the JSON are the
  *    receipts).
  *
  * Prints ONE JSON line with per-ingest docs/s + touched/changed per
  * arm — the measured twin of SpineScale for the maintenance pipeline.
  *
  * Usage: runMain graft.CutMaintScale [sfDir] [batches]
  */
object CutMaintScale {
  private def d2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    require(batches >= 2, "need at least 2 batches to exercise maintenance")
    val spark = SparkSession.builder()
      .master(s"local[${Launch.cpus}]")
      .config("spark.sql.shuffle.partitions", Launch.cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-cutmaint").toString
    try {
      val corpus = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" " + QueriesExt9.q267Plant)))
            .otherwise(col("text")).as("text"))
        .localCheckpoint(true) // corpus materialization is untimed input
      val maxId = corpus.agg(max("doc_id")).head().getLong(0)

      def runArm(arm: String, batchOf: Int => DataFrame): String = {
        val dir = s"$root/$arm"
        val legs = (0 until batches).map { r =>
          val b = batchOf(r).localCheckpoint(true)
          val n = b.count()
          val t0 = System.nanoTime()
          val out = operators.CutReportMaintenance.ingest(spark, dir, b)
          val byUpd = out.groupBy("upd").count().collect()
            .map(x => x.getString(0) -> x.getLong(1)).toMap
          val secs = (System.nanoTime() - t0) / 1e9
          (n, secs, byUpd.values.sum, byUpd.getOrElse("changed", 0L))
        }
        val totalDocs = legs.map(_._1).sum
        val totalSecs = legs.map(_._2).sum
        val finalRows = operators.CutReportMaintenance.report(spark, dir).count()
        require(finalRows == totalDocs,
          s"$arm report must cover every ingested doc ($finalRows != $totalDocs)")
        val legsJson = legs.map { case (n, s, touched, changed) =>
          // Locale-pinned (r13 review): f"%.2f" uses the default locale,
          // which can emit "0,42" and break the one-line JSON artifact.
          s"""{"docs":$n,"secs":${d2(s)},"docs_per_sec":${(n / s).toLong},""" +
            s""""touched":$touched,"changed":$changed}"""
        }.mkString("[", ",", "]")
        s""""$arm":{"total_docs":$totalDocs,""" +
          s""""total_secs":${math.round(totalSecs * 100) / 100.0},""" +
          s""""docs_per_sec":${(totalDocs / totalSecs).toLong},"ingests":$legsJson}"""
      }

      // Append arm: contiguous ascending id ranges (owner-stable by
      // construction). Backfill arm: interleaved residues, highest
      // residue first (every ingest undercuts owners).
      val stride = maxId / batches + 1
      val appendJson = runArm("append", r =>
        corpus.filter(col("doc_id") >= r * stride &&
          col("doc_id") < (r + 1) * stride))
      val backfillJson = runArm("backfill", r =>
        corpus.filter(col("doc_id") % batches === (batches - 1 - r)))
      println(s"""{"metric":"cut_maint_scale","sf":"$sfDir",""" +
        s""""batches":$batches,$appendJson,$backfillJson}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(root))
      spark.stop()
    }
  }
}
