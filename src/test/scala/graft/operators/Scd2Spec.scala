package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Top-level so Spark's case-class Encoder works (no outer pointer). */
case class Scd2Ev(k: Long, ts: Long, v: String, del: Boolean)

/** SCD type-2 history: batch build vs incremental merge agreement. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private type Ev = Scd2Ev
  private def Ev(k: Long, ts: Long, v: String, del: Boolean): Ev =
    Scd2Ev(k, ts, v, del)

  private def log(evs: Seq[Ev]): DataFrame =
    evs.toDF("k", "ts", "v", "del")

  private def build(evs: Seq[Ev]): DataFrame =
    Scd2.fromChangelog(log(evs), keys = Seq("k"), tsCol = "ts",
      tracked = Seq("v"), isDelete = col("del"))

  private def sortedRows(df: DataFrame): Seq[(Long, String, Long, Option[Long], Boolean)] =
    df.select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq.sorted

  test("fromChangelog: insert/update/delete/re-insert lifecycle") {
    val evs = Seq(
      Ev(1, 10, "a", del = false), // opens a@10
      Ev(1, 20, "a", del = false), // no-change → dropped
      Ev(1, 30, "b", del = false), // closes a@30, opens b@30
      Ev(1, 40, "b", del = true),  // closes b@40
      Ev(1, 50, "c", del = false), // re-insert → opens c@50
      Ev(2, 15, "x", del = false)) // second key, open version
    val got = sortedRows(build(evs))
    assert(got == Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "c", 50L, None, true),
      (2L, "x", 15L, None, true)))
  }

  test("fromChangelog: delete as last event leaves no current version") {
    val evs = Seq(Ev(1, 10, "a", del = false), Ev(1, 20, "a", del = true))
    assert(sortedRows(build(evs)) == Seq((1L, "a", 10L, Some(20L), false)))
  }

  test("fromChangelog: null tracked value is a value (null-safe change detect)") {
    val df = Seq((1L, 10L, Option("a")), (1L, 20L, Option.empty[String]),
        (1L, 30L, Option.empty[String]), (1L, 40L, Option("a")))
      .toDF("k", "ts", "v")
    val got = Scd2.fromChangelog(df, Seq("k"), "ts", Seq("v"))
      .select(col("v"), col("valid_from"), col("valid_to"))
      .as[(Option[String], Long, Option[Long])].collect().toSeq.sortBy(_._2)
    // a@[10,20) → null@[20,40) (the 30 no-change row dropped) → a@[40,∞)
    assert(got == Seq((Some("a"), 10L, Some(20L)), (None, 20L, Some(40L)),
      (Some("a"), 40L, None)))
  }

  test("snapshotAt: version live at T; deleted-before and born-after keys absent") {
    val evs = Seq(
      Ev(1, 10, "a", del = false), Ev(1, 30, "b", del = false), // a@[10,30) b@[30,∞)
      Ev(2, 10, "x", del = false), Ev(2, 20, "x", del = true),  // gone by 25
      Ev(3, 40, "z", del = false))                              // born after 25
    val hist = build(evs)
    def at(t: Long): Seq[(Long, String)] =
      Scd2.snapshotAt(hist, lit(t)).select(col("k"), col("v"))
        .as[(Long, String)].collect().toSeq.sorted
    assert(at(25) == Seq((1L, "a")))
    assert(at(35) == Seq((1L, "b")))
    assert(at(45) == Seq((1L, "b"), (3L, "z")))
    assert(at(5).isEmpty)
  }

  private val emptyHistory: DataFrame =
    build(Seq(Ev(99, 1, "seed", del = false))).filter(col("k") =!= 99)

  /** merge's batch contract: LWW-dedup the raw batch to one row per key. */
  private def dedupBatch(batch: Seq[Ev]): Seq[Ev] =
    batch.groupBy(_.k).values.map(_.maxBy(_.ts)).toSeq

  private def mergeBatch(hist: DataFrame, batch: Seq[Ev]): DataFrame =
    Scd2.merge(hist, log(dedupBatch(batch)), keys = Seq("k"), tsCol = "ts",
      tracked = Seq("v"), isDelete = col("del"))

  test("merge: folding one-event-per-key batches over a changelog equals fromChangelog") {
    val evs = Seq(
      Ev(1, 10, "a", del = false), Ev(2, 10, "p", del = false),
      Ev(1, 20, "b", del = false), Ev(2, 20, "p", del = false),
      Ev(1, 30, "b", del = true), Ev(3, 30, "z", del = false),
      Ev(1, 40, "c", del = false), Ev(2, 40, "q", del = true))
    val whole = sortedRows(build(evs))
    val folded = evs.groupBy(_.ts).toSeq.sortBy(_._1).map(_._2)
      .foldLeft(emptyHistory)((h, b) => mergeBatch(h, b).localCheckpoint(true))
    assert(sortedRows(folded) == whole)
  }

  /** Deterministic Gen sampling (same pattern as PropertiesSpec — the
    * scalatest bridge artifact is not in the offline dep set). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  test("merge: stale out-of-order batch is ignored (no inverted intervals)") {
    // r6 advice: without the ts guard, a late batch closed the open
    // version with valid_to < valid_from. Now a stage row older than the
    // key's open valid_from must change nothing.
    val hist = build(Seq(Ev(1, 30, "b", del = false)))
    val before = sortedRows(hist)
    // late update, late delete, and a late no-change row — all stale
    for (stale <- Seq(Ev(1, 10, "z", del = false), Ev(1, 20, "b", del = true))) {
      val after = sortedRows(mergeBatch(hist, Seq(stale)))
      assert(after == before, s"stale $stale mutated history: $after")
      assert(after.forall { case (_, _, from, to, _) => to.forall(_ >= from) })
    }
    // equal-ts batch is NOT stale (same-ts update closes and reopens)
    val eq = sortedRows(mergeBatch(hist, Seq(Ev(1, 30, "c", del = false))))
    assert(eq.exists { case (_, v, _, _, cur) => v == "c" && cur })
  }

  test("merge fold == fromChangelog of the per-batch-deduped log (property)") {
    // merge's contract drops intra-batch intermediate versions (LWW dedup
    // first — the reference keeps only the last row image per batch,
    // cdc_util/redshift_sink.py:193-211), so the agreement target is
    // fromChangelog of the CONCATENATED DEDUPED batches.
    val evGen = for {
      k <- Gen.choose(1L, 4L)
      v <- Gen.oneOf("a", "b", "c")
      del <- Gen.frequency(4 -> false, 1 -> true)
    } yield (k, v, del)
    val logGen = Gen.listOfN(15, evGen).map(_.zipWithIndex.map {
      case ((k, v, del), i) => Ev(k, (i + 1) * 10L, v, del)
    })
    for (evs <- samples(logGen, 12)) {
      val batches = evs.sortBy(_.ts).grouped(5).toSeq
      val whole = sortedRows(build(batches.flatMap(dedupBatch).sortBy(_.ts)))
      val folded = batches.foldLeft(emptyHistory)(
        (h, b) => mergeBatch(h, b).localCheckpoint(true))
      assert(sortedRows(folded) == whole, s"changelog: $evs")
    }
  }
}
