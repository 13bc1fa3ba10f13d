package graft.operators

import graft.SparkSuite
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import Expectations._

  test("expectations: crafted table reports exact metrics and verdicts") {
    val df = Seq(
      (1L, Option("a"), 10.0),
      (2L, Option("b"), 20.0),
      (3L, None, -5.0),
      (3L, Option("d"), 40.0) // duplicate key
    ).toDF("id", "name", "v")
    val rep = Expectations.run(df, Seq(
      Expectation("name_complete", completeness(col("name")), _ >= 1.0d),
      Expectation("id_unique", uniqueness(col("id")), _ === 1.0d),
      Expectation("v_nonneg", satisfies(col("v") >= 0.0d), _ === 1.0d),
      Expectation("min_v", min(col("v")), _ > 0.0d)
    )).collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("name_complete") === ((0.75d, false)))
    assert(rep("id_unique") === ((0.75d, false)))
    assert(rep("v_nonneg") === ((0.75d, false)))
    assert(rep("min_v") === ((-5.0d, false)))
  }

  test("expectations: all-green suite and single-job shape") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val rep = Expectations.run(df, Seq(
      Expectation("id_unique", uniqueness(col("id")), _ === 1.0d),
      Expectation("s_complete", completeness(col("s")), _ >= 1.0d)))
    val rows = rep.collect()
    assert(rows.forall(_.getBoolean(2)))
    // the whole suite is ONE aggregate: no join/union in the plan
    val plan = rep.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join") &&
      !plan.toLowerCase.contains("union"))
  }

  test("code stats: code-shaped text scores far above prose") {
    val code =
      """def f(x):
        |  if (x == 1 && y) {
        |    return g(x);
        |  }
        |  import os
        |""".stripMargin
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times, it was the worst of times."
    val out = Seq((1L, code), (2L, prose)).toDF("id", "text")
      .select(col("id"), TextFunctions.codeStats(col("text")).as("cs"))
      .select(col("id"), col("cs.code_score"), col("cs.is_code"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(out(1L)._2, s"code sample should flag, scored ${out(1L)._1}")
    assert(!out(2L)._2, s"prose flagged as code, scored ${out(2L)._1}")
    assert(out(1L)._1 > out(2L)._1 * 3)
  }

  test("additive merge: fold order never changes counters; replay " +
    "double-counts (documented non-idempotence)") {
    import graft.operators.MergeOps
    def agg(rows: Seq[(String, Long)]) =
      rows.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v"))
    val b1 = agg(Seq(("a", 1L), ("a", 2L), ("b", 5L)))
    val b2 = agg(Seq(("a", 10L), ("c", 7L)))
    val b3 = agg(Seq(("b", 1L)))
    def fold(bs: Seq[org.apache.spark.sql.DataFrame]) =
      bs.tail.foldLeft(bs.head)(
          MergeOps.additiveMerge(_, _, Seq("k"), Seq("n", "v")))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    val direct = agg(Seq(("a", 1L), ("a", 2L), ("b", 5L), ("a", 10L),
      ("c", 7L), ("b", 1L))).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(fold(Seq(b1, b2, b3)) === direct)
    assert(fold(Seq(b3, b1, b2)) === direct, "fold order must not matter")
    // replay hazard is real and documented: feeding b2 twice double-counts
    val replayed = fold(Seq(b1, b2, b3, b2))
    assert(replayed("c") === ((2L, 14L)))
  }

  test("transitions: hand-built sequences give exact matrix") {
    // user 1: a->b->a ; user 2: a->b
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 30L, 102L, "a"),
      (2L, 10L, 103L, "a"), (2L, 20L, 104L, "b")
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val m = Transitions.matrix(ev, "user_id",
        Seq(col("ts_ms"), col("event_id")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m(("a", "b")) === ((2L, 1.0d))) // a always goes to b
    assert(m(("b", "a")) === ((1L, 1.0d)))
    assert(m.size === 2)
  }

  test("last-touch attribution: conversions credit the preceding " +
    "channel; first-event conversions land in 'none'") {
    val ev = Seq(
      // user 1: view -> purchase(10) -> click -> purchase(5)
      (1L, 10L, 1L, "view", 0.0), (1L, 20L, 2L, "purchase", 10.0),
      (1L, 30L, 3L, "click", 0.0), (1L, 40L, 4L, "purchase", 5.0),
      // user 2: purchase with no prior touch
      (2L, 10L, 5L, "purchase", 7.0),
      // user 3: purchase then purchase — second credits the first's
      // channel? No: prior non-purchase is still none for both
      (3L, 10L, 6L, "purchase", 1.0), (3L, 20L, 7L, "purchase", 2.0)
    ).toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val out = Transitions.lastTouch(ev, "user_id",
        Seq(col("ts_ms"), col("event_id")), "event_type", "value", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("view") === ((1L, 10.0)))
    assert(out("click") === ((1L, 5.0)))
    assert(out("none") === ((3L, 10.0))) // 7 + 1 + 2
  }

  test("transitions: same-timestamp ties break on the unique column") {
    val ev = Seq(
      (1L, 10L, 2L, "x"), (1L, 10L, 1L, "w"), (1L, 20L, 3L, "y"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val m = Transitions.matrix(ev, "user_id",
        Seq(col("ts_ms"), col("event_id")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m === Set(("w", "x"), ("x", "y")))
  }

  test("fd audit: a key-like FD holds, a violated FD names count and fan-out") {
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"),
      (4L, "b", "x"), (5L, "c", "z"),
      // duplicate row — distinct pre-agg must absorb it
      (5L, "c", "z"))
      .toDF("id", "grp", "val")
    val out = Expectations.fdAudit(df, Seq(
        ("id->grp", "id", "grp"), ("grp->val", "grp", "val")))
      .collect().map(r => r.getString(0) -> r).toMap
    val holds = out("id->grp")
    assert(holds.getAs[Long]("n_lhs") === 5L)
    assert(holds.getAs[Long]("n_violating") === 0L)
    assert(holds.getAs[Long]("max_fanout") === 1L)
    assert(holds.getAs[Boolean]("holds"))
    val broken = out("grp->val")
    assert(broken.getAs[Long]("n_lhs") === 3L)
    assert(broken.getAs[Long]("n_violating") === 1L) // only 'a' maps to 2
    assert(broken.getAs[Long]("max_fanout") === 2L)
    assert(!broken.getAs[Boolean]("holds"))
  }

  test("dataset fingerprint shape: XOR row checksum is order- and " +
    "partitioning-independent, and flips on any changed row") {
    import graft.functions.TextFunctions.md5Long
    def checksum(d: org.apache.spark.sql.DataFrame): Long =
      d.select(md5Long(concat_ws("|", col("id"), col("v"))).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)
    val base = (1L to 100L).map(i => (i, s"val$i")).toDF("id", "v")
    assert(checksum(base.repartition(1)) === checksum(base.repartition(13)))
    val changed = (1L to 100L)
      .map(i => (i, if (i == 42L) "oops" else s"val$i")).toDF("id", "v")
    assert(checksum(base) !== checksum(changed))
  }

  test("fd audit: null lhs and rhs values participate like values") {
    val df = Seq((Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("c")))
      .toDF("l", "r")
    val out = Expectations.fdAudit(df, Seq(("l->r", "l", "r")))
      .collect().head
    // lhs 1 maps to {a, NULL} → fan-out 2 and a violation; lhs NULL and 2
    // each map to one value.
    assert(out.getAs[Long]("n_lhs") === 3L)
    assert(out.getAs[Long]("n_violating") === 1L)
    assert(out.getAs[Long]("max_fanout") === 2L)
  }
}
