package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Convergence of the MAINTAINED cut report: interleaved backfill
  * ingests against persistent parquet state must land exactly where the
  * one-shot batch replay lands. */
class CutReportMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def plantedCorpus = Tables.documents(spark, sf("sf0.001"))
    .select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" " + graft.QueriesExt9.q267Plant)))
        .otherwise(col("text")).as("text"))

  test("maintained cut report: three interleaved ingests converge to the batch q292 report, with repairs surfaced") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cutmaint").toString
    try {
      val corpus = plantedCorpus.localCheckpoint(true)
      // Interleaved id splits (%3 = 1, 2, 0): later ingests contain
      // LOWER ids than already-reported docs — the backfill shape that
      // forces exact-keeper undercuts, star-owner changes (incl.
      // rescissions), and substring first-occurrence repairs.
      val outs = Seq(1, 2, 0).map { r =>
        CutReportMaintenance.ingest(spark, dir,
          corpus.filter(col("doc_id") % 3 === r))
      }
      // Every ingest returns rows for at least its own batch.
      outs.zip(Seq(1, 2, 0)).foreach { case (o, r) =>
        val n = corpus.filter(col("doc_id") % 3 === r).count()
        assert(o.filter(col("upd") === "new").count() == n,
          s"ingest %3=$r must report each batch doc exactly once as new")
      }
      // Later ingests must touch EXISTING docs too (the maintained
      // point): batch-2/3 return rows for docs outside their batch.
      val laterTouched = outs.tail.map(
        _.filter(col("upd") =!= "new").count()).sum
      assert(laterTouched > 0, "backfill ingests must revisit base docs")
      val repaired = outs.tail.map(
        _.filter(col("upd") === "changed").count()).sum
      assert(repaired > 0, "backfill ingests must repair some dispositions")
      // Convergence: the stored report equals the one-shot batch replay
      // (q292's algebra over the full corpus), row for row.
      val maintained = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      val batch = graft.QueriesExt11.cutReportOf(corpus)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      assert(maintained.nonEmpty && maintained.size == corpus.count())
      assert(maintained == batch,
        s"maintained report must equal the batch replay; " +
          s"extra=${(maintained -- batch).take(5)} " +
          s"missing=${(batch -- maintained).take(5)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("maintained cut report on a STREAM: foreachBatch ingests converge to the batch replay; a replayed batch is skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cutmaint-s").toString
    try {
      val corpus = plantedCorpus.as[(Long, String)].collect().toSeq
      val mem = MemoryStream[(Long, String)]
      val q = CutReportMaintenance.streamWriter(
          mem.toDF().toDF("doc_id", "text"), dir, "doc_id", "text")
        .option("checkpointLocation", s"$dir/_ckpt")
        .start()
      // Interleaved splits again — the stream carries backfills too.
      Seq(1, 2, 0).foreach { r =>
        mem.addData(corpus.filter(_._1 % 3 == r))
        q.processAllAvailable()
      }
      q.stop()
      val streamed = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      val batch = graft.QueriesExt11.cutReportOf(corpus.toDF("doc_id", "text"))
        .as[(Long, String, Option[Long], Long)].collect().toSet
      assert(streamed == batch,
        s"extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
      // Replay protection: redeliver the first chunk as batchId 0 via a
      // SECOND query (fresh checkpoint, same state dir) — the batch-id
      // marker must skip it, because ingest is not idempotent (without
      // the marker these doc ids would double-enter every index and the
      // report row count below would change).
      val before = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      val mem2 = MemoryStream[(Long, String)]
      val q2 = CutReportMaintenance.streamWriter(
          mem2.toDF().toDF("doc_id", "text"), dir, "doc_id", "text")
        .option("checkpointLocation", s"$dir/_ckpt2")
        .start()
      mem2.addData(corpus.filter(_._1 % 3 == 1)) // batchId 0 <= marker 2
      q2.processAllAvailable()
      q2.stop()
      val after = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      assert(after == before, "a redelivered batchId must be skipped")
      // ...but a genuinely NEW lineage (fresh checkpoint AND fresh
      // streamId) attaching new documents to the same state must NOT be
      // skipped even though its batchIds also restart at 0 — the r13
      // review's silent-data-loss case.
      val mem3 = MemoryStream[(Long, String)]
      val q3 = CutReportMaintenance.streamWriter(
          mem3.toDF().toDF("doc_id", "text"), dir, "doc_id", "text",
          streamId = "second-feed")
        .option("checkpointLocation", s"$dir/_ckpt3")
        .start()
      mem3.addData(Seq((900001L, "a brand new late-arriving document body"),
        (900002L, "another novel document with its own words")))
      q3.processAllAvailable()
      q3.stop()
      assert(CutReportMaintenance.report(spark, dir).count() == before.size + 2,
        "a new lineage's batch 0 must apply, not be mistaken for a replay")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("maintained cut report: compaction mid-stream preserves convergence and drops superseded segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cutmaint-c").toString
    try {
      val corpus = plantedCorpus.localCheckpoint(true)
      CutReportMaintenance.ingest(spark, dir,
        corpus.filter(col("doc_id") % 3 === 1))
      CutReportMaintenance.ingest(spark, dir,
        corpus.filter(col("doc_id") % 3 === 2))
      CutReportMaintenance.compact(spark, dir)
      // Superseded per-ingest segments are gone; one merged segment lives.
      val segDirs = Option(new java.io.File(s"$dir/seg_docs").listFiles())
        .toSeq.flatten.filter(_.isDirectory).map(_.getName).sorted
      assert(segDirs.size == 1, s"expected one compacted segment: $segDirs")
      // A backfill ingest AFTER compaction still repairs and converges.
      val out = CutReportMaintenance.ingest(spark, dir,
        corpus.filter(col("doc_id") % 3 === 0))
      assert(out.filter(col("upd") === "changed").count() > 0)
      val maintained = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      val batch = graft.QueriesExt11.cutReportOf(corpus)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      assert(maintained == batch,
        s"extra=${(maintained -- batch).take(5)} missing=${(batch -- maintained).take(5)}")
      // The built-in audit agrees: a from-scratch replay over the stored
      // corpus finds zero disagreements — and a planted corruption is
      // caught (this is the production safety valve, so prove both
      // directions).
      assert(CutReportMaintenance.verifyAgainstReplay(spark, dir).count() == 0)
      val v = new java.io.File(s"$dir/_version")
      val cur = new String(java.nio.file.Files.readAllBytes(v.toPath), "UTF-8").trim
      val rep = s"$dir/v$cur/report"
      val corrupted = spark.read.parquet(rep)
        .withColumn("cut_tokens",
          when(col("doc_id") === 5, lit(999999L)).otherwise(col("cut_tokens")))
        .localCheckpoint(true)
      corrupted.write.mode("overwrite").parquet(rep)
      assert(CutReportMaintenance.verifyAgainstReplay(spark, dir).count() == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("maintained cut report: single full-corpus ingest equals the batch replay (degenerate base case)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cutmaint1").toString
    try {
      val corpus = plantedCorpus.localCheckpoint(true)
      val out = CutReportMaintenance.ingest(spark, dir, corpus)
      assert(out.filter(col("upd") =!= "new").count() == 0)
      val maintained = CutReportMaintenance.report(spark, dir)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      val batch = graft.QueriesExt11.cutReportOf(corpus)
        .as[(Long, String, Option[Long], Long)].collect().toSet
      assert(maintained == batch)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
