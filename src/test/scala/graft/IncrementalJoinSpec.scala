package graft

import graft.operators.IncrementalJoin._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental join-view maintenance
  * ([[graft.operators.IncrementalJoin]]): the bilinear delta rule must
  * reproduce a full re-join for any pair of side deltas, including the
  * cross-term annihilation case (insert against a simultaneously
  * deleted partner). */
class IncrementalJoinSpec extends SparkSuite {
  import spark.implicits._

  /** a: (key, ak, av); b: (key, bv). */
  private def aRel(rows: Seq[(Long, Long, Long)]): DataFrame =
    asZRelation(rows.toDF("g", "ak", "av"))
  private def bRel(rows: Seq[(Long, Long)]): DataFrame =
    asZRelation(rows.toDF("g", "bv"))

  private def viewSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("g")),
      r.getLong(r.fieldIndex("ak")), r.getLong(r.fieldIndex("av")),
      r.getLong(r.fieldIndex("bv")), r.getLong(r.fieldIndex("mult")))).toSet

  /** ±1 changelog between two versions of the A side keyed by ak. */
  private def dAOf(before: Seq[(Long, Long, Long)],
                   after: Seq[(Long, Long, Long)]): DataFrame = {
    val b = before.map(r => r._2 -> r).toMap
    val a = after.map(r => r._2 -> r).toMap
    val rows =
      a.filter { case (k, r) => b.get(k) != Some(r) }.values
        .map { case (g, ak, av) => (g, ak, av, 1L) } ++
      b.filter { case (k, r) => a.get(k) != Some(r) }.values
        .map { case (g, ak, av) => (g, ak, av, -1L) }
    rows.toSeq.toDF("g", "ak", "av", "mult")
  }
  private def dBOf(before: Seq[(Long, Long)],
                   after: Seq[(Long, Long)]): DataFrame = {
    val rows = after.diff(before).map { case (g, bv) => (g, bv, 1L) } ++
      before.diff(after).map { case (g, bv) => (g, bv, -1L) }
    rows.toDF("g", "bv", "mult")
  }

  test("one-sided delta: the maintained view equals the re-join") {
    val a0 = Seq((1L, 100L, 5L), (2L, 200L, 7L))
    val a1 = Seq((1L, 100L, 6L), (2L, 200L, 7L), (1L, 300L, 9L))
    val b0 = Seq((1L, 50L), (2L, 60L))
    val got = applyJoinDeltas(zJoin(aRel(a0), bRel(b0), Seq("g")),
      aRel(a0), bRel(b0), dAOf(a0, a1), dBOf(b0, b0), Seq("g"))
    assert(viewSet(got) === viewSet(zJoin(aRel(a1), bRel(b0), Seq("g"))))
  }

  test("cross-term annihilation: an order inserted for a simultaneously " +
    "deleted partner nets to zero") {
    val a0 = Seq((1L, 100L, 5L))
    val a1 = a0 :+ (2L, 200L, 7L)  // new row for key 2 ...
    val b0 = Seq((1L, 50L), (2L, 60L))
    val b1 = Seq((1L, 50L))        // ... whose partner vanishes same batch
    val got = applyJoinDeltas(zJoin(aRel(a0), bRel(b0), Seq("g")),
      aRel(a0), bRel(b0), dAOf(a0, a1), dBOf(b0, b1), Seq("g"))
    assert(viewSet(got) === viewSet(zJoin(aRel(a1), bRel(b1), Seq("g"))))
    assert(!got.collect().exists(_.getLong(0) == 2L))
  }

  test("property: maintained ≡ re-join over random two-sided changelogs, " +
    "threaded across two batches") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      def mutateA(v: Seq[(Long, Long, Long)]) = v.flatMap { case (g, ak, av) =>
        rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some((rnd.nextInt(6).toLong, ak, rnd.nextInt(50).toLong))
          case _ => Some((g, ak, av))
        }
      } ++ (1 to 5).map(_ => (rnd.nextInt(6).toLong,
        1000L + rnd.nextInt(100000), rnd.nextInt(50).toLong))
      def mutateB(v: Seq[(Long, Long)]) = v.flatMap { case (g, bv) =>
        rnd.nextInt(4) match {
          case 0 => None
          case 1 => Some((g, rnd.nextInt(50).toLong))
          case _ => Some((g, bv))
        }
      }
      val a0 = (1 to 30).map(i => (rnd.nextInt(6).toLong, i.toLong,
        rnd.nextInt(50).toLong))
      val b0 = (0 to 5).map(g => (g.toLong, rnd.nextInt(50).toLong))
      val a1 = mutateA(a0); val b1 = mutateB(b0)
      val a2 = mutateA(a1); val b2 = mutateB(b1)
      val v2 = applyJoinDeltas(
        applyJoinDeltas(zJoin(aRel(a0), bRel(b0), Seq("g")),
          aRel(a0), bRel(b0), dAOf(a0, a1), dBOf(b0, b1), Seq("g")),
        aRel(a1), bRel(b1), dAOf(a1, a2), dBOf(b1, b2), Seq("g"))
      assert(viewSet(v2) === viewSet(zJoin(aRel(a2), bRel(b2), Seq("g"))))
    }
  }

  test("streaming: two-sided tagged delta batches fold the join view " +
    "through foreachBatch onto the re-join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a0 = Seq((1L, 100L, 5L), (2L, 200L, 7L), (3L, 300L, 2L))
    val b0 = Seq((1L, 50L), (2L, 60L), (3L, 70L))
    val a1 = Seq((1L, 100L, 6L), (2L, 200L, 7L), (2L, 400L, 9L))
    val b1 = Seq((1L, 50L), (2L, 61L))
    val a2 = a1 :+ (3L, 500L, 4L)
    val b2 = b1 :+ (3L, 71L)
    // ("A"|"B", g, ak, av, bv, mult) — one stream carries both sides
    def tag(dA: DataFrame, dB: DataFrame): Seq[(String, Long, Long, Long, Long, Long)] =
      dA.collect().toSeq.map(r => ("A", r.getLong(0), r.getLong(1),
        r.getLong(2), 0L, r.getLong(3))) ++
      dB.collect().toSeq.map(r => ("B", r.getLong(0), 0L, 0L,
        r.getLong(1), r.getLong(2)))
    var aCur = a0; var bCur = b0
    @volatile var state = zJoin(aRel(a0), bRel(b0), Seq("g")).collect().toSeq
    val schema = zJoin(aRel(a0), bRel(b0), Seq("g")).schema
    val stream = MemoryStream[(String, Long, Long, Long, Long, Long)]
    val q = stream.toDF().toDF("side", "g", "ak", "av", "bv", "mult")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dA = batch.filter(col("side") === "A")
          .select(col("g"), col("ak"), col("av"), col("mult"))
        val dB = batch.filter(col("side") === "B")
          .select(col("g"), col("bv"), col("mult"))
        val stateDf = spark.createDataFrame(
          spark.sparkContext.parallelize(state), schema)
        state = applyJoinDeltas(stateDf, aRel(aCur), bRel(bCur), dA, dB,
          Seq("g")).collect().toSeq
        // post-batch bases for the NEXT batch's delta terms
        ()
      }.start()
    try {
      stream.addData(tag(dAOf(a0, a1), dBOf(b0, b1)))
      q.processAllAvailable(); aCur = a1; bCur = b1
      stream.addData(tag(dAOf(a1, a2), dBOf(b1, b2)))
      q.processAllAvailable(); aCur = a2; bCur = b2
    } finally q.stop()
    val got = state.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet
    assert(got === viewSet(zJoin(aRel(a2), bRel(b2), Seq("g"))))
  }

  test("Z-relation algebra holds for arbitrary multiplicities, not " +
    "just ±1: products and consolidation agree with bag semantics") {
    // a: key 1 carries row (ak=100,av=5) twice; b: key 1 carries bv=50
    // three times → join view must carry mult 6
    val a = Seq((1L, 100L, 5L, 2L)).toDF("g", "ak", "av", "mult")
    val b = Seq((1L, 50L, 3L)).toDF("g", "bv", "mult")
    val v = zJoin(a, b, Seq("g")).collect()
    assert(v.length === 1 && v.head.getLong(v.head.fieldIndex("mult")) === 6L)
    // consolidation sums duplicates and drops annihilated rows
    val dup = Seq((1L, 100L, 5L, 50L, 4L), (1L, 100L, 5L, 50L, -4L),
      (2L, 200L, 7L, 60L, 2L), (2L, 200L, 7L, 60L, 1L))
      .toDF("g", "ak", "av", "bv", "mult")
    val c = consolidate(dup).collect()
    assert(c.length === 1 && c.head.getLong(0) === 2L &&
      c.head.getLong(c.head.fieldIndex("mult")) === 3L)
  }

  test("zJoin refuses colliding payload column names") {
    val a = asZRelation(Seq((1L, 2L)).toDF("g", "x"))
    val b = asZRelation(Seq((1L, 3L)).toDF("g", "x"))
    intercept[IllegalArgumentException] { zJoin(a, b, Seq("g")) }
  }
}
