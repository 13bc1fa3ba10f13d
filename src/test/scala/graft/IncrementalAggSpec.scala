package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance
  * ([[graft.operators.IncrementalAgg]]): the retract/insert delta
  * algebra must reproduce a full recompute for any changelog, including
  * group-key-moving updates and fully-retracted groups; MAX maintenance
  * must agree with recompute while only re-aggregating witness-losing
  * groups. */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  /** rows: (rowId, group, value). */
  private def agg(rows: Seq[(Long, Long, Long)]): DataFrame =
    IncrementalAgg.initialState(
      rows.toDF("k", "g", "v"), Seq("g"), col("v"))

  private def stateMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Build the changelog frame between two base versions keyed by rowId:
    * rows only in `before` delete, only in `after` create, in both with
    * any difference update. */
  private def changelog(before: Seq[(Long, Long, Long)],
                        after: Seq[(Long, Long, Long)]): DataFrame = {
    val b = before.map(r => r._1 -> r).toMap
    val a = after.map(r => r._1 -> r).toMap
    val rows =
      a.keySet.diff(b.keySet).toSeq.map { k =>
        val (_, g, v) = a(k); ("c", k, None: Option[Long], None: Option[Long], Some(g), Some(v))
      } ++
      b.keySet.diff(a.keySet).toSeq.map { k =>
        val (_, g, v) = b(k); ("d", k, Some(g), Some(v), None: Option[Long], None: Option[Long])
      } ++
      b.keySet.intersect(a.keySet).toSeq.filter(k => b(k) != a(k)).map { k =>
        ("u", k, Some(b(k)._2), Some(b(k)._3), Some(a(k)._2), Some(a(k)._3))
      }
    rows.toDF("op", "k", "b_g", "b_v", "a_g", "a_v")
  }

  private def maintained(before: Seq[(Long, Long, Long)],
                         after: Seq[(Long, Long, Long)]): DataFrame = {
    val delta = IncrementalAgg.deltas(changelog(before, after), col("op"),
      Seq(col("b_g")), Seq(col("a_g")), col("b_v"), col("a_v"), Seq("g"))
    IncrementalAgg.applyDeltas(agg(before), delta, Seq("g"))
  }

  test("maintained state equals recompute: inserts, updates, deletes") {
    val before = Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 9L))
    val after = Seq((1L, 10L, 6L), (3L, 20L, 9L), (4L, 20L, 2L)) // u, d, c
    assert(stateMap(maintained(before, after)) === stateMap(agg(after)))
  }

  test("a group-key-moving update retracts from the old group and " +
    "inserts into the new one") {
    val before = Seq((1L, 10L, 5L), (2L, 20L, 7L))
    val after = Seq((1L, 20L, 5L), (2L, 20L, 7L)) // row 1 moves 10 → 20
    val got = stateMap(maintained(before, after))
    assert(got === Map(20L -> (2L, 12L)), got)
  }

  test("a fully-retracted group leaves the state (no zero-count rows)") {
    val before = Seq((1L, 10L, 5L), (2L, 20L, 7L))
    val after = Seq((2L, 20L, 7L))
    val got = stateMap(maintained(before, after))
    assert(!got.contains(10L) && got(20L) === (1L, 7L))
  }

  test("'r' snapshot rows contribute insertions like 'c' (the canonical " +
    "op set is c/u/d/r)") {
    val log = Seq(
      ("r", 1L, None: Option[Long], None: Option[Long], Some(10L), Some(5L)),
      ("r", 2L, None: Option[Long], None: Option[Long], Some(10L), Some(7L)),
      ("c", 3L, None: Option[Long], None: Option[Long], Some(20L), Some(9L)))
      .toDF("op", "k", "b_g", "b_v", "a_g", "a_v")
    val delta = IncrementalAgg.deltas(log, col("op"),
      Seq(col("b_g")), Seq(col("a_g")), col("b_v"), col("a_v"), Seq("g"))
    val got = delta.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(10L -> (2L, 12L), 20L -> (1L, 9L)))
  }

  test("property: maintained ≡ recomputed over random changelogs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val before = (1L to 60L).map(k =>
        (k, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      // mutate ~half: delete a third, update (sometimes group-moving) a
      // third, keep a third; add fresh inserts
      val after = before.flatMap { case (k, g, v) =>
        rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some((k, if (rnd.nextBoolean()) rnd.nextInt(8).toLong else g,
            rnd.nextInt(1000).toLong))
          case _ => Some((k, g, v))
        }
      } ++ (61L to 80L).map(k =>
        (k, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      assert(stateMap(maintained(before, after)) === stateMap(agg(after)))
    }
  }

  private def maxMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def maintainedMax(before: Seq[(Long, Long, Long)],
                            after: Seq[(Long, Long, Long)]): DataFrame = {
    val log = changelog(before, after)
    val state0 = before.toDF("k", "g", "v")
      .groupBy(col("g")).agg(max(col("v")).as("mx"))
    val postBase = after.toDF("k", "g", "v").select(col("g"), col("v").as("value"))
    val inserts = log.filter(col("op").isin("c", "u"))
      .select(col("a_g").as("g"), col("a_v").as("value"))
    val retracts = log.filter(col("op").isin("u", "d"))
      .select(col("b_g").as("g"), col("b_v").as("value"))
    IncrementalAgg.maintainMax(state0, postBase, inserts, retracts, Seq("g"))
  }

  test("max maintenance: delete of the max re-aggregates the runner-up; " +
    "other groups stay incremental") {
    val before = Seq((1L, 10L, 9L), (2L, 10L, 5L), (3L, 20L, 4L))
    val after = Seq((2L, 10L, 5L), (3L, 20L, 4L), (4L, 20L, 6L))
    val got = maxMap(maintainedMax(before, after))
    assert(got === Map(10L -> 5L, 20L -> 6L), got)
  }

  test("same-batch create+delete into a stateless group leaves no " +
    "phantom (max and top-k)") {
    val before = Seq((1L, 10L, 9L))
    // row 2 born into NEW group 20 and deleted in the same batch
    val after = Seq((1L, 10L, 9L))
    val inserts = Seq((20L, 2L, 7L)).toDF("g", "k", "v")
    val retracts = Seq((20L, 2L, 7L)).toDF("g", "k", "v")
    val postBase = after.toDF("k", "g", "v").select(col("g"), col("k"), col("v"))
    val mx = IncrementalAgg.maintainMax(
      before.toDF("k", "g", "v").groupBy("g").agg(max(col("v")).as("mx")),
      postBase.select(col("g"), col("v").as("value")),
      inserts.select(col("g"), col("v").as("value")),
      retracts.select(col("g"), col("v").as("value")), Seq("g"))
    assert(maxMap(mx) === Map(10L -> 9L), "no phantom group 20")
    val tk = IncrementalAgg.maintainTopK(
      before.toDF("k", "g", "v").select(col("g"), col("k"), col("v")),
      postBase, inserts.select(col("g"), col("k"), col("v")),
      retracts.select(col("g"), col("k"), col("v")),
      Seq("g"), k = 3, idCol = "k", valCol = "v")
    assert(!tk.collect().exists(_.getLong(0) == 20L), "no phantom top-k rows")
  }

  test("max maintenance property: ≡ recompute over random changelogs " +
    "(group moves, new and vanished groups)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val before = (1L to 60L).map(k =>
        (k, rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
      val after = before.flatMap { case (k, g, v) =>
        rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some((k, if (rnd.nextBoolean()) rnd.nextInt(6).toLong else g,
            rnd.nextInt(100).toLong))
          case _ => Some((k, g, v))
        }
      } ++ (61L to 75L).map(k =>
        (k, rnd.nextInt(7).toLong, rnd.nextInt(100).toLong))
      val want = after.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
      assert(maxMap(maintainedMax(before, after)) === want)
    }
  }

  test("moments: maintained (cnt, sum, sumsq) state equals recompute " +
    "under retraction — variance is delta-maintainable") {
    val before = (1L to 50L).map(k => (k, k % 4, k * k % 97))
    val after = before.filter(_._1 % 5 != 0)
      .map { case (k, g, v) => if (k % 3 == 0) (k, (g + 1) % 4, v + 7) else (k, g, v) } ++
      Seq((51L, 0L, 13L), (52L, 3L, 2L))
    def moments(rows: Seq[(Long, Long, Long)]) = IncrementalAgg
      .initialMoments(rows.toDF("k", "g", "v"), Seq("g"), col("v"))
    val got = IncrementalAgg.applyMomentDeltas(moments(before),
      IncrementalAgg.momentDeltas(changelog(before, after), col("op"),
        Seq(col("b_g")), Seq(col("a_g")), col("b_v"), col("a_v"), Seq("g")),
      Seq("g"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact())).toMap
    assert(asMap(got) === asMap(moments(after)))
  }

  test("streaming: changelog micro-batches fold the state through " +
    "foreachBatch and land on the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val v0 = (1L to 30L).map(k => (k, k % 4, k * 7 % 50))
    val v1 = v0.filter(_._1 % 6 != 0) ++ Seq((31L, 2L, 99L))
    val v2 = v1.map { case (k, g, v) =>
      if (k % 5 == 0) (k, (g + 2) % 4, v + 3) else (k, g, v) }
    // (op, rowId, b_g, b_v, a_g, a_v) rows of the two batches
    def logRows(b: Seq[(Long, Long, Long)], a: Seq[(Long, Long, Long)])
        : Seq[(String, Long, Option[Long], Option[Long], Option[Long], Option[Long])] =
      changelog(b, a).collect().toSeq.map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
    val stream = MemoryStream[(String, Long, Option[Long], Option[Long],
      Option[Long], Option[Long])]
    @volatile var state = agg(v0).collect().toSeq // small in-test state table
    val q = stream.toDF()
      .toDF("op", "k", "b_g", "b_v", "a_g", "a_v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stateDf = spark.createDataFrame(
          spark.sparkContext.parallelize(state), agg(v0).schema)
        state = IncrementalAgg.applyDeltas(stateDf,
          IncrementalAgg.deltas(batch, col("op"),
            Seq(col("b_g")), Seq(col("a_g")), col("b_v"), col("a_v"),
            Seq("g")), Seq("g")).collect().toSeq
        ()
      }.start()
    try {
      stream.addData(logRows(v0, v1)); q.processAllAvailable()
      stream.addData(logRows(v1, v2)); q.processAllAvailable()
    } finally q.stop()
    val got = state.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === stateMap(agg(v2)))
  }

  private def topKOf(rows: Seq[(Long, Long, Long)], k: Int): Set[(Long, Long, Long)] =
    rows.groupBy(_._2).values.flatMap(
      _.sortBy(r => (-r._3, -r._1)).take(k)).toSet

  private def maintainedTopK(before: Seq[(Long, Long, Long)],
                             after: Seq[(Long, Long, Long)],
                             k: Int): Set[(Long, Long, Long)] = {
    val log = changelog(before, after)
    val state0 = topKOf(before, k).toSeq.toDF("k", "g", "v")
      .select(col("g"), col("k"), col("v"))
    val postBase = after.toDF("k", "g", "v").select(col("g"), col("k"), col("v"))
    val inserts = log.filter(col("op").isin("c", "u"))
      .select(col("a_g").as("g"), col("k"), col("a_v").as("v"))
    val retracts = log.filter(col("op").isin("u", "d"))
      .select(col("b_g").as("g"), col("k"), col("b_v").as("v"))
    IncrementalAgg.maintainTopK(state0, postBase, inserts, retracts,
        Seq("g"), k, idCol = "k", valCol = "v")
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        r.getLong(r.fieldIndex("g")), r.getLong(r.fieldIndex("v")))).toSet
  }

  test("top-k maintenance: a floor-crossing delete refills from the " +
    "base; a below-floor delete stays incremental") {
    val before = Seq((1L, 10L, 90L), (2L, 10L, 80L), (3L, 10L, 70L),
      (4L, 10L, 60L), (5L, 10L, 50L))
    // delete the #2 row (above floor 70) and the #5 row (below floor)
    val after = before.filterNot(r => r._1 == 2L || r._1 == 5L)
    assert(maintainedTopK(before, after, 3) === topKOf(after, 3))
  }

  test("top-k maintenance: an insert cracking the top-k of an untouched " +
    "group re-ranks without reading the base") {
    val before = Seq((1L, 10L, 90L), (2L, 10L, 80L), (3L, 10L, 70L),
      (4L, 10L, 60L))
    val after = before :+ (9L, 10L, 85L)
    assert(maintainedTopK(before, after, 3) === topKOf(after, 3))
  }

  test("top-k maintenance property: ≡ recompute over random changelogs " +
    "(group moves, underfilled/vanished/new groups)") {
    val rnd = new scala.util.Random(23)
    (1 to 5).foreach { _ =>
      val before = (1L to 50L).map(kk =>
        (kk, rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
      val after = before.flatMap { case (kk, g, v) =>
        rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some((kk, if (rnd.nextBoolean()) rnd.nextInt(8).toLong else g,
            rnd.nextInt(100).toLong))
          case _ => Some((kk, g, v))
        }
      } ++ (51L to 60L).map(kk =>
        (kk, rnd.nextInt(9).toLong, rnd.nextInt(100).toLong))
      assert(maintainedTopK(before, after, 3) === topKOf(after, 3))
    }
  }

  test("multi-batch fold: state threads through three changelog batches " +
    "and still equals the final recompute") {
    val v0 = (1L to 40L).map(k => (k, k % 5, k * 3))
    val v1 = v0.filter(_._1 % 4 != 0) ++ Seq((41L, 1L, 999L))
    val v2 = v1.map { case (k, g, v) =>
      if (k % 3 == 0) (k, (g + 1) % 5, v + 1) else (k, g, v) }
    val v3 = v2.filter(_._1 % 7 != 0)
    val folded = Seq(v0 -> v1, v1 -> v2, v2 -> v3)
      .foldLeft(agg(v0)) { case (state, (b, a)) =>
        IncrementalAgg.applyDeltas(state,
          IncrementalAgg.deltas(changelog(b, a), col("op"),
            Seq(col("b_g")), Seq(col("a_g")), col("b_v"), col("a_v"),
            Seq("g")), Seq("g"))
      }
    assert(stateMap(folded) === stateMap(agg(v3)))
  }
}
