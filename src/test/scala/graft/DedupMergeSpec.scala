package graft

import graft.operators.{Dedup, MergeOps, Skew}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W1/W2 dedup semantics + J1–J3 merge algebra properties
  * (SURVEY.md §7.4 risk register: idempotence, delete matrix, ordering). */
class DedupMergeSpec extends SparkSuite {
  import spark.implicits._

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  //              id, ts, idx, v,      op
  private val batch = Seq(
    (1L, 100L, 0, "a", "c"),
    (1L, 200L, 0, "b", "u"), // winner for id=1 (latest ts)
    (2L, 100L, 0, "c", "u"),
    (2L, 100L, 1, "d", "u"), // winner for id=2 (same ts, higher idx — Canal)
    (3L, 300L, 0, "e", "d"), // delete wins for id=3
    (3L, 100L, 0, "f", "c")
  ).toDF("id", "ts_ms_aws", "idx_aws", "v", "op_aws")

  private val order = Seq(col("ts_ms_aws"), col("idx_aws"))

  test("window LWW picks latest ts with idx tie-break") {
    val got = Dedup.latestPerKey(batch, Seq("id"), order)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "d", 3L -> "e"))
  }

  test("max_by aggregate LWW ≡ window LWW") {
    val w = Dedup.latestPerKey(batch, Seq("id"), order)
    val a = Dedup.latestPerKeyAgg(batch, Seq("id"), order)
    assert(sameRows(w, a))
  }

  test("staging dedup is deterministic (lowest tie-break wins)") {
    val got = Dedup.stagingDedup(batch, Seq("id"), Seq(col("ts_ms_aws"), col("idx_aws")))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "c", 3L -> "f"))
  }

  private val target = Seq((1L, "t1"), (3L, "t3"), (9L, "t9")).toDF("id", "v")
  private def stageOf(rows: (Long, String, String)*): DataFrame =
    rows.toDF("id", "v", "op_aws")

  test("merge: upsert replaces, delete removes, unmatched target kept") {
    val stage = stageOf((1L, "new1", "u"), (3L, "gone", "d"), (5L, "new5", "c"))
    val m = MergeOps.merge(target, stage, Seq("id"), col("op_aws") === "d", Seq("op_aws"))
    val got = m.as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new1", 5L -> "new5", 9L -> "t9"))
  }

  test("merge is idempotent: merge(merge(T,B),B) == merge(T,B)") {
    val stage = stageOf((1L, "new1", "u"), (3L, "gone", "d"), (5L, "new5", "c"))
    val once = MergeOps.merge(target, stage, Seq("id"), col("op_aws") === "d", Seq("op_aws"))
    val twice = MergeOps.merge(once, stage, Seq("id"), col("op_aws") === "d", Seq("op_aws"))
    assert(sameRows(once, twice))
  }

  test("skip_delete retains delete rows as upserts") {
    val stage = stageOf((3L, "kept", "d"))
    val m = MergeOps.mergeSkipDelete(target, stage, Seq("id"), Seq("op_aws"))
    val got = m.as[(Long, String)].collect().toMap
    assert(got(3L) == "kept" && got.size == 3)
  }

  test("ts-guard merge refuses stale batches (cross-batch regression guard)") {
    val t = Seq((1L, "cur", 500L), (2L, "cur2", 500L)).toDF("id", "v", "ts")
    val stale = Seq((1L, "old", 100L, "u")).toDF("id", "v", "ts", "op_aws")
    val fresh = Seq((2L, "new2", 900L, "u")).toDF("id", "v", "ts", "op_aws")
    val g1 = MergeOps.mergeWithTsGuard(t, stale, Seq("id"), col("op_aws") === "d", "ts", Seq("op_aws"))
    assert(g1.filter(col("id") === 1L).select("v").as[String].head() == "cur")
    val g2 = MergeOps.mergeWithTsGuard(t, fresh, Seq("id"), col("op_aws") === "d", "ts", Seq("op_aws"))
    assert(g2.filter(col("id") === 2L).select("v").as[String].head() == "new2")
  }

  test("salted LWW ≡ plain LWW (hot-key skew path)") {
    import graft.operators.Skew
    // hot key: 500 events on id=1, a few on others
    val hot = (1 to 500).map(i => (1L, i.toLong, 0, s"h$i", "u")) ++
      Seq((2L, 5L, 0, "x", "u"), (3L, 1L, 0, "y", "d"))
    val df = hot.toDF("id", "ts_ms_aws", "idx_aws", "v", "op_aws")
    val plain = Dedup.latestPerKey(df, Seq("id"), order :+ col("v"))
    val salted = Skew.saltedLatestPerKey(df, Seq("id"), order :+ col("v"),
      unique = col("v"), saltBuckets = 8)
    assert(sameRows(plain, salted))
    assert(salted.filter(col("id") === 1L).select("v").as[String].head() == "h500")
  }

  test("chooseStrategy: hot key → salted, high dup → agg, unique/small → window") {
    import graft.operators.Skew
    val spark2 = spark
    import spark2.implicits._
    // below minRows the probe short-circuits to window regardless of shape
    val small = (1L to 10000L).map(x => (1L, x)).toDF("id", "u")
    assert(Skew.chooseStrategy(small, Seq("id")) == "window")
    // one key takes 30% of 150k rows → salted
    val hot = spark.range(150000).select(
      when(col("id") < 45000, 1L).otherwise(col("id")).as("id"), col("id").as("u"))
    assert(Skew.chooseStrategy(hot, Seq("id")) == "salted")
    // same hot key but BYTE-IDENTICAL rows (Kafka redelivery): row-level
    // sampling must still see it (a content-hash sample would take the
    // whole group or none of it)
    val redelivered = spark.range(150000).select(
      when(col("id") < 45000, 1L).otherwise(col("id")).as("id"),
      when(col("id") < 45000, 0L).otherwise(col("id")).as("u"))
    assert(Skew.chooseStrategy(redelivered, Seq("id")) == "salted")
    // uniform 150× duplication, no key above the hot share → agg
    val dup = spark.range(150000).select((col("id") % 1000).as("id"), col("id").as("u"))
    assert(Skew.chooseStrategy(dup, Seq("id")) == "agg")
    // mostly-unique keys → window
    val uniq = spark.range(150000).select(col("id"), col("id").as("u"))
    assert(Skew.chooseStrategy(uniq, Seq("id")) == "window")
  }

  test("connected components: chains, shared endpoints, disjoint pairs, self-loops") {
    import graft.operators.ConnectedComponents
    // 1-2-3-4 chain (via shared endpoints), a disjoint pair, a self-loop
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (7L, 7L)).toDF("src", "dst")
    val got = ConnectedComponents.components(edges).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
    // empty edge set
    assert(ConnectedComponents.components(edges.filter(col("src") < 0)).isEmpty)
  }

  test("connected components match plain-Scala union-find on a random graph") {
    import graft.operators.ConnectedComponents
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(p => p._1 != p._2)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(id => find(id.toInt))
      .flatMap { case (_, ids) => val m = ids.min; ids.map(_ -> m) }.toSet
    val got = ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // the two tiers must agree exactly: driverMaxEdges = 0 forces the
    // distributed star loop over the same graph
    val distributed = ConnectedComponents.components(edges.toDF("src", "dst"),
      driverMaxEdges = 0L).as[(Long, Long)].collect().toSet
    assert(distributed == expected, "star loop diverged from union-find tier")
  }

  test("as-of join: latest right ≤ left ts, same-instant visible, no-match null") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 10L, "e3"))
      .toDF("k", "lts", "ev")
    val r = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "rx"))
      .toDF("k", "rts", "rv")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "lts", "rts")
      .select("ev", "rv").as[(String, String)].collect().toMap
    assert(got("e0") == null)    // before any right row
    assert(got("e1") == "r10")   // same-instant right row is visible (≤)
    assert(got("e2") == "r15")   // latest ≤ 20
    assert(got("e3") == null)    // key with no right rows at all
  }

  test("as-of join: null right values stay null (no stale stitching)") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 12L, "e")).toDF("k", "lts", "ev")
    val r = Seq((1L, 5L, Some("old"), Some(1)), (1L, 10L, None, Some(2)))
      .toDF("k", "rts", "rv", "rn")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "lts", "rts")
      .select("rv", "rn").as[(Option[String], Option[Int])].head()
    // the ts=10 row wins atomically: rv is its genuine NULL, rn its value —
    // never "old" stitched from the ts=5 row
    assert(got == (None, Some(2)))
  }

  test("merge with composite keys") {
    val t2 = Seq((1L, "a", "x"), (1L, "b", "y")).toDF("k1", "k2", "v")
    val s2 = Seq((1L, "a", "z", "u")).toDF("k1", "k2", "v", "op_aws")
    val m = MergeOps.merge(t2, s2, Seq("k1", "k2"), col("op_aws") === "d", Seq("op_aws"))
    val got = m.select("k1", "k2", "v").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "z"), (1L, "b", "y")))
  }

  test("keyProfile: hot key flagged for salting with exact share; " +
    "uniform key stays quiet") {
    // 1000 rows: key 0 holds 500 (50%), keys 1..500 one each; a second
    // column perfectly uniform at 2 rows per key.
    val df = ((1 to 500).map(_ => 0L) ++ (1L to 500L))
      .zipWithIndex.map { case (hot, i) => (hot, (i % 500).toLong) }
      .toDF("hot", "uni")
    val out = Skew.keyProfile(df, Seq("hot", "uni"), hotShare = 0.01)
      .collect().map(r => r.getString(0) -> r).toMap
    val h = out("hot")
    assert(h.getAs[Long]("n_rows") === 1000L)
    assert(h.getAs[Long]("n_keys") === 501L)
    assert(h.getAs[Long]("max_group") === 500L)
    assert(h.getAs[Double]("max_share") === 0.5d)
    assert(h.getAs[Boolean]("advise_salt"))
    val u = out("uni")
    assert(u.getAs[Long]("n_keys") === 500L)
    assert(u.getAs[Long]("max_group") === 2L)
    assert(u.getAs[Double]("mean_group") === 2.0d)
    assert(!u.getAs[Boolean]("advise_salt") ||
      u.getAs[Double]("max_share") > 0.01) // share 0.002 → quiet
    assert(!u.getAs[Boolean]("advise_salt"))
  }
}
