package graft

/** Degenerate-input guards for the QueriesExt10 statistics batch that
  * the sf-testdata oracles cannot exercise (every sf source has >1
  * document, so the q283 n=1 sigma branch never runs there). */
class QueriesExt10Spec extends SparkSuite {

  test("q283: a single-document source degrades to zero weight, not NaN") {
    // r11 review: sigma's /(n-1) made a 1-doc source 0/0 = NaN, which
    // poisoned the weight total and every source's share/alloc.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q283").toString
    Seq(
      (1L, "solo", "one lonely document with some text"),
      (2L, "multi", "short"),
      (3L, "multi", "a noticeably longer document body here"),
      (4L, "multi", "medium length text row")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesExt10.q283NeymanAlloc(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("sigma_len"), r.getAs[Double]("share"),
          r.getAs[Long]("alloc"))).toMap
    val (soloSig, soloShare, _) = rows("solo")
    assert(!soloSig.isNaN && soloSig === 0.0)
    assert(!soloShare.isNaN && soloShare === 0.0)
    val (multiSig, multiShare, _) = rows("multi")
    assert(!multiSig.isNaN && multiSig > 0.0)
    assert(!multiShare.isNaN && multiShare === 1.0)
    // Largest-remainder allocations still sum exactly to the budget.
    assert(rows.values.map(_._3).sum === 1000L)
  }

  test("q283: zero TOTAL weight (all sources single-doc) degrades to zero shares, not NaN") {
    // r12 review: the n=1 guard fixed per-source NaN, but if EVERY
    // source is degenerate the weight total wt = 0 and share = 0/0
    // poisoned the whole result one level up.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q283z").toString
    Seq(
      (1L, "a", "only document of source a"),
      (2L, "b", "only document of source b too")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesExt10.q283NeymanAlloc(spark, dir).collect()
      .map(r => (r.getAs[Double]("sigma_len"), r.getAs[Double]("share"),
        r.getAs[Long]("alloc")))
    assert(rows.length === 2)
    rows.foreach { case (sig, share, _) =>
      assert(!sig.isNaN && sig === 0.0)
      assert(!share.isNaN && share === 0.0)
    }
  }
}
