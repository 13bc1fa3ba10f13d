package graft

import graft.streaming.StreamAggs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Event-time streaming: watermarked windows, sessions, custom state —
  * each driven through MemoryStream micro-batches and cross-checked
  * against the equivalent batch computation. */
class StreamAggsSpec extends SparkSuite {
  import spark.implicits._

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  private val rows = Seq(
    (ts(0), 1L, "click", 1.0), (ts(1), 1L, "click", 2.0),
    (ts(2), 2L, "view", 3.0), (ts(7), 1L, "click", 4.0),
    (ts(62), 2L, "view", 5.0) // next hour
  )

  private def toDf(mem: MemoryStream[(Timestamp, Long, String, Double)]) =
    mem.toDF().toDF("ts", "user_id", "event_type", "value")

  test("tumbling window counts equal the batch groupBy") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    mem.addData(rows)
    val q = StreamAggs.tumbling(toDf(mem), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumb").select("ws", "event_type", "n")
      .as[(Timestamp, String, Long)].collect().toSet
    val expected = rows.toDF("ts", "user_id", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == expected && got.size == 3)
  }

  test("session windows split on the gap") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    mem.addData(rows)
    val q = StreamAggs.sessions(toDf(mem), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess")
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // user 1: events at m0,m1 (one session) and m7 (gap >5m → new session)
    assert(got(1L) == Seq(1L, 2L))
    // user 2: m2 and m62 → two singleton sessions
    assert(got(2L) == Seq(1L, 1L))
  }

  test("watermark drops events later than the bound") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.tumbling(toDf(mem), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    mem.addData(rows)
    q.processAllAvailable()
    // advance the watermark far past hour 0, then send a straggler into hour 0
    mem.addData(Seq((ts(180), 3L, "click", 1.0)))
    q.processAllAvailable()
    mem.addData(Seq((ts(3), 9L, "late", 9.9)))
    q.processAllAvailable()
    q.stop()
    // append mode emits finalized windows only; the straggler's window was
    // already finalized → the late row must not appear
    assert(!spark.table("late").select("event_type").as[String].collect().contains("late"))
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    val mem = MemoryStream[StreamAggs.Ev]
    val q = StreamAggs.runningTotals(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("run").outputMode("update").start()
    mem.addData(StreamAggs.Ev(1L, ts(0), 10.0), StreamAggs.Ev(1L, ts(1), 5.0))
    q.processAllAvailable()
    mem.addData(StreamAggs.Ev(1L, ts(2), 1.0), StreamAggs.Ev(2L, ts(2), 7.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("run").as[StreamAggs.UserRunning].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n)).toMap
    assert(last(1L).n == 3 && last(1L).total == 16.0)
    assert(last(2L).n == 1 && last(2L).total == 7.0)
  }

  test("streaming funnel advances ordered steps across batches, one int of state per user") {
    import StreamAggs.{FunnelEv, FunnelAdvance}
    val mem = MemoryStream[FunnelEv]
    val q = StreamAggs.streamingFunnel(mem.toDS(), Seq("view", "click", "purchase"),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    // batch 1: user 1 reaches view+click (purchase BEFORE view must not count);
    // user 2 clicks without ever viewing — no advance at all
    mem.addData(
      FunnelEv(1L, ts(0), "purchase", 1L), FunnelEv(1L, ts(1), "view", 2L),
      FunnelEv(1L, ts(2), "click", 3L),
      FunnelEv(2L, ts(1), "click", 4L))
    q.processAllAvailable()
    // batch 2: user 1 completes; user 2 starts properly; a repeat view
    // for user 1 must NOT re-advance (state carries across batches)
    mem.addData(
      FunnelEv(1L, ts(3), "view", 5L), FunnelEv(1L, ts(4), "purchase", 6L),
      FunnelEv(2L, ts(5), "view", 7L))
    q.processAllAvailable()
    q.stop()
    val adv = spark.table("funnel").as[FunnelAdvance].collect()
      .groupBy(_.user_id).view.mapValues(_.sortBy(_.step).map(a => (a.step, a.step_name)).toSeq).toMap
    assert(adv(1L) == Seq((1, "view"), (2, "click"), (3, "purchase")))
    assert(adv(2L) == Seq((1, "view")))
    // in-batch ordering is event-time, not arrival: the ts(0) purchase
    // preceded the view so the funnel ends at purchase only via ts(4)
    val purchase = spark.table("funnel").as[FunnelAdvance].collect()
      .find(a => a.user_id == 1L && a.step == 3).get
    assert(purchase.ts == ts(4))
  }

  test("streaming exact dedup drops cross-batch duplicates within the watermark") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingExactDedup(docs, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    // Batch 1: two distinct docs + an in-batch duplicate (same canonical text).
    mem.addData(Seq((ts(0), 1L, "Hello  World"), (ts(1), 2L, "hello world"),
      (ts(2), 3L, "other doc")))
    q.processAllAvailable()
    // Batch 2: cross-batch duplicate of doc 1 + one genuinely new doc.
    mem.addData(Seq((ts(5), 4L, "HELLO WORLD"), (ts(6), 5L, "brand new")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup").select("doc_id").as[Long].collect().toSet
    // One representative of the "hello world" family survives (the first),
    // both cross- and in-batch duplicates are dropped.
    assert(kept.intersect(Set(1L, 2L, 4L)).size == 1)
    assert(kept.contains(3L) && kept.contains(5L))
  }

  test("streaming Misra-Gries: the custom sketch aggregate runs in update mode across batches") {
    import graft.functions.ApproxHeavyHitters
    val mem = MemoryStream[(Long, String)]
    val toks = mem.toDF().toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // Global (complete-mode) sketch aggregation: the TypedImperativeAggregate
    // buffer must survive the streaming state store across micro-batches.
    val q = toks.agg(ApproxHeavyHitters.misraGries(col("token"), 8).as("hh"))
      .writeStream.format("memory").queryName("smg").outputMode("complete").start()
    mem.addData(Seq((1L, "x x x y"), (2L, "x y z w")))
    q.processAllAvailable()
    mem.addData(Seq((3L, "x x y y q")))
    q.processAllAvailable()
    q.stop()
    val ests = spark.table("smg").select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.est").as("est"))
      .as[(String, Long)].collect().toMap
    // 13 tokens total, capacity 8 → error bound floor(13/9) = 1.
    // True counts: x=6, y=4, z=1, w=1, q=1.
    val bound = 13 / 9
    assert(ests.contains("x") && ests.contains("y"),
      s"true heavy hitters must be present: $ests")
    assert(ests("x") <= 6 && ests("x") >= 6 - bound, s"x estimate off: $ests")
    assert(ests("y") <= 4 && ests("y") >= 4 - bound, s"y estimate off: $ests")
  }

  test("streaming count-min probe: fixed-size counters as a streaming aggregate") {
    val mem = MemoryStream[(Long, String)]
    // The CMS counter table is groupBy(r, b).count — a plain streaming
    // aggregation with a FIXED key space (rows × width cells), so state
    // never grows with vocabulary: the streaming-native form of q61's
    // batch sketch build.
    val cells = mem.toDF().toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .select(posexplode(array((0 until 2).map(r =>
        pmod(graft.functions.TextFunctions.md5Long(
          concat(lit(s"$r:"), col("term"))), lit(16))): _*)).as(Seq("r", "b")))
      .groupBy("r", "b").count()
    val q = cells.writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    mem.addData(Seq((1L, "a a b")))
    q.processAllAvailable()
    mem.addData(Seq((2L, "a c")))
    q.processAllAvailable()
    q.stop()
    val counters = spark.table("scms")
      .as[(Int, Long, Long)].collect().map { case (r, b, c) => (r, b) -> c }.toMap
    // probe "a" (true count 3): min over its 2 row-buckets must be ≥ 3
    // (over-count only) and the state is at most 2×16 cells.
    val est = (0 until 2).map { r =>
      val bucket = spark.range(1).select(pmod(graft.functions.TextFunctions.md5Long(
        concat(lit(s"$r:"), lit("a"))), lit(16))).as[Long].head()
      counters.getOrElse((r, bucket), 0L)
    }.min
    assert(est >= 3, s"CMS must never under-count: $est")
    assert(counters.size <= 32, "counter state exceeded the fixed sketch size")
  }

  test("streaming corpus ingest: quality gate + dedup + split/lang/token tagging") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.corpusIngest(docs, "ts", "text", "doc_id",
      watermark = "1 hour", minQuality = 0.3)
      .writeStream.format("memory").queryName("corpus").outputMode("append").start()
    mem.addData(Seq(
      (ts(0), 1L, "the cat of the house and a dog sat in the sun"),
      (ts(1), 2L, "!!!"), // fails the quality gate
      (ts(2), 3L, "the cat of the house and a dog sat in the sun") // duplicate of 1
    ))
    q.processAllAvailable()
    mem.addData(Seq((ts(5), 4L, "el perro de la casa y un gato en el sol")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("corpus")
      .select("doc_id", "split", "lang", "n_tokens")
      .as[(Long, String, String, Int)].collect()
    val ids = rows.map(_._1).toSet
    assert(!ids.contains(2L), "low-quality doc passed the gate")
    assert(ids.intersect(Set(1L, 3L)).size == 1, "duplicate not collapsed")
    assert(ids.contains(4L))
    val byId = rows.map(r => r._1 -> r).toMap
    // md5("4") starts with 'a' < 'c' -> train; pins the boundary logic.
    assert(byId(4L)._2 == "train")
    assert(byId(4L)._3 == "es" && byId(4L)._4 == 11)
  }

  test("streaming corpus ingest: optional Gopher rule gate drops what the soft score passes") {
    val good = (("the quick brown fox jumps over lazy dogs near riverbank " * 4)
      + "with many different other words appearing here once only today").trim
    val shortButClean = "the cat of the house and a dog sat in the sun"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.corpusIngest(docs, "ts", "text", "doc_id",
      watermark = "1 hour", minQuality = 0.3, gopherGate = true)
      .writeStream.format("memory").queryName("corpus_gopher")
      .outputMode("append").start()
    mem.addData(Seq((ts(0), 1L, good), (ts(1), 2L, shortButClean)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("corpus_gopher").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L), s"gopher gate let the 12-word doc through: $ids")
  }

  test("streaming corpus ingest: entropy gate drops repetition spam the soft score passes") {
    val natural = "the cat of the house and a dog sat in the sun"
    val spam = "na na na na na na na na na na na"   // 3 distinct chars, dominant 'a'+' '
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.corpusIngest(docs, "ts", "text", "doc_id",
      watermark = "1 hour", minQuality = 0.0, entropyGate = true)
      .writeStream.format("memory").queryName("corpus_entropy")
      .outputMode("append").start()
    mem.addData(Seq((ts(0), 1L, natural), (ts(1), 2L, spam)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("corpus_entropy").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L), s"entropy gate let the repetition spam through: $ids")
  }

  test("streaming ingest with urlCol: re-crawls of the same canonical URL drop first") {
    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "url", "text")
    val q = StreamAggs.corpusIngest(docs, "ts", "text", "doc_id",
        watermark = "1 hour", minQuality = 0.0, urlCol = Some("url"))
      .writeStream.format("memory").queryName("ingest_url").outputMode("append").start()
    val a = "the cat of the house and a dog sat in the sun"
    val b = "a completely different document body with its own words here"
    mem.addData(Seq((ts(0), 1L, "https://ex.com/p?id=1&utm_source=x", a)))
    q.processAllAvailable()
    // batch 2: same page re-crawled under URL noise (www + default port +
    // fragment) with DIFFERENT text — URL identity must drop it before any
    // content state; a genuinely new URL with duplicate text still hits
    // the content dedup.
    mem.addData(Seq(
      (ts(5), 2L, "HTTPS://WWW.Ex.com:443/p?id=1#frag", b),
      (ts(6), 3L, "https://other.com/q", a),
      (ts(7), 4L, "https://third.com/r", b)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ingest_url").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L),
      s"expected url-dedup to drop 2 and content-dedup to drop 3: $ids")
    // the url column itself passes through un-rewritten
    val urls = spark.table("ingest_url").select("url").as[String].collect().toSet
    assert(urls.contains("https://ex.com/p?id=1&utm_source=x"))
  }

  test("streaming ingest with normalize: messy encodings collapse into one dedup family") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.corpusIngest(docs, "ts", "text", "doc_id",
        watermark = "1 hour", minQuality = 0.0, normalize = true)
      .writeStream.format("memory").queryName("singnorm").outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog and it is fine"
    // batch 1: clean doc; batch 2: the same doc with doubled spaces and a
    // CRLF tail — the normalized form must dedup against batch 1's state.
    mem.addData(Seq((ts(0), 1L, base)))
    q.processAllAvailable()
    mem.addData(Seq((ts(5), 2L, "  " + base.replace(" ", "  ") + " \r\n"),
      (ts(6), 3L, "a completely different document body with its own words here")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("singnorm").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rows.contains(1L) && rows.contains(3L) && !rows.contains(2L),
      s"messy re-encoding must dedup against the clean original: ${rows.keySet}")
    assert(rows(1L) == base, "stored text is the normalized canonical form")
  }

  test("streaming near-dup candidates: cross-batch twin flagged, unrelated docs quiet") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingNearDupCandidates(docs, "ts", "text", "doc_id",
        watermark = "1 hour", stateTtlMs = 3600000L)
      .writeStream.format("memory").queryName("snd").outputMode("append").start()
    mem.addData(Seq(
      (ts(0), 1L, "the quick brown fox jumps over the lazy dog"),
      (ts(1), 2L, "completely different prose about spark streaming pipelines")))
    q.processAllAvailable()
    mem.addData(Seq(
      (ts(5), 3L, "the quick brown fox jumps over the lazy dog"), // twin of 1
      (ts(6), 4L, "unrelated corpus material with entirely novel wording")))
    q.processAllAvailable()
    q.stop()
    val cands = spark.table("snd").select("doc_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(cands == Set((3L, 1L))) // the identical twin, nothing else
  }

  test("streaming near-dup: a NEAR-twin (mutated text) two batches later is flagged") {
    // The cross-batch test above plants an identical twin one batch
    // later; this pins the actually-interesting case — a mutation that
    // shares most but not all shingles (Jaccard 0.8 here), arriving at
    // batch N+2 with an unrelated batch in between, must still collide
    // on a band key held in state since batch N.
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingNearDupCandidates(docs, "ts", "text", "doc_id",
        watermark = "1 hour", stateTtlMs = 3600000L)
      .writeStream.format("memory").queryName("sndnear").outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog and then ran " +
      "away to its home in the woods"
    mem.addData(Seq((ts(0), 1L, base)))
    q.processAllAvailable()
    mem.addData(Seq((ts(3), 2L, "completely unrelated filler prose about " +
      "warehouse ingestion pipelines and parquet compaction strategies")))
    q.processAllAvailable()
    mem.addData(Seq((ts(6), 3L, base.replace("its home", "its den"))))
    q.processAllAvailable()
    q.stop()
    val cands = spark.table("sndnear").select("doc_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(cands == Set((3L, 1L)),
      s"mutated near-twin must flag against its batch-N original: $cands")
  }

  test("streaming near-dup parity vs the batch LSH kernel on the sf0.001 corpus") {
    // Batch-path parity, oracle-checked against q14's kernel
    // (DedupFunctions.minhashLshPairs — q14 runs exactly this) on the
    // same corpus. The two honest set relations that hold by
    // construction (streaming emits a STAR per bucket — later docs pair
    // with the bucket's earliest owner — where batch emits the clique):
    //   (1) pair precision: every streaming candidate that survives the
    //       SAME exact-Jaccard verify is a batch-verified pair (both
    //       docs shared a band bucket, and the verify is identical);
    //   (2) doc recall: every batch-verified pair's LATER doc is
    //       flagged by at least one streaming candidate (its band
    //       collision's bucket was occupied by the time it arrived).
    import graft.functions.DedupFunctions
    val corpus = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batchPairs = DedupFunctions.minhashLshPairs(
        corpus.toSeq.toDF("doc_id", "text"), "text", "doc_id",
        n = 2, numHashes = 32, bands = 16, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty)
    // Stream the corpus in three batches, doc_id-ordered event time.
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingNearDupCandidates(docs, "ts", "text", "doc_id",
        watermark = "24 hours", stateTtlMs = 86400000L)
      .writeStream.format("memory").queryName("sndpar").outputMode("append").start()
    corpus.grouped((corpus.length + 2) / 3).foreach { chunk =>
      mem.addData(chunk.toSeq.map { case (id, text) =>
        (new Timestamp(1704067200000L + id * 1000L), id, text)
      })
      q.processAllAvailable()
    }
    q.stop()
    val streamCands = spark.table("sndpar").select("doc_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    // (1) verify streaming candidates with the identical exact Jaccard.
    val sh = corpus.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), DedupFunctions.shingles(col("text"), 2).as("sh"))
      .as[(Long, Seq[String])].collect().map(r => r._1 -> r._2.toSet).toMap
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (sh(a), sh(b))
      if (sa.isEmpty && sb.isEmpty) 0.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    val streamVerified = streamCands.filter { case (d, o) => jac(d, o) >= 0.05 }
      .map { case (d, o) => (math.min(d, o), math.max(d, o)) }
    assert(streamVerified.nonEmpty)
    assert(streamVerified.subsetOf(batchPairs),
      s"verified streaming pairs must be batch pairs; extras: ${streamVerified -- batchPairs}")
    // (2) every batch pair's later doc carries at least one candidate.
    val flagged = streamCands.map(_._1)
    val laterDocs = batchPairs.map(_._2)
    assert(laterDocs.subsetOf(flagged),
      s"batch-dup docs missed by streaming: ${laterDocs -- flagged}")
  }

  test("streaming substring dedup: a passage copied two batches later is marked and merges to one span") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingTokenSpanMarks(docs, "ts", "text", "doc_id",
        watermark = "1 hour", stateTtlMs = 3600000L, W = 5)
      .writeStream.format("memory").queryName("ssub").outputMode("append").start()
    val passage = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    mem.addData(Seq((ts(0), 1L, s"intro words here $passage")))
    q.processAllAvailable()
    mem.addData(Seq((ts(3), 2L, "totally unrelated filler text with nothing shared at all here")))
    q.processAllAvailable()
    mem.addData(Seq((ts(6), 3L, s"$passage and a different tail of original prose")))
    q.processAllAvailable()
    q.stop()
    val marks = spark.table("ssub").as[(Long, Long, Long)].collect().toSeq
    assert(marks.forall(_._1 == 3L), s"only the copier is marked: $marks")
    // doc 3's tokens 1..8 are the passage; W=5 → duplicated windows at
    // positions 1..4, merging to the single span [1, 8].
    val spans = graft.functions.ExactSubstrings.mergeMarks(
        marks.toDF("id", "pos", "e"))
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((3L, 1L, 8L)), s"one maximal span over the passage: $spans")
  }

  test("streaming substring dedup parity vs the batch operator on the planted sf0.001 corpus") {
    // Exact-parity oracle: with documents arriving in doc_id order, the
    // streaming owner (first arrival per window hash) IS the batch op's
    // global (id, pos)-first occurrence, so stream marks → mergeMarks
    // must equal duplicateTokenSpans verbatim. Corpus = sf0.001 docs
    // with the q267 plant (every 5th doc gets the same 30-token
    // passage appended) so real cross-doc duplicates exist.
    import graft.functions.ExactSubstrings
    val plant = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        if (r.getLong(0) % 5 == 0) r.getString(1) + " " + plant
        else r.getString(1))).sortBy(_._1)
    val batchSpans = ExactSubstrings.duplicateTokenSpans(
        corpus.toSeq.toDF("doc_id", "text"), "text", "doc_id", W = 20)
      .select("id", "span", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batchSpans.nonEmpty)
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingTokenSpanMarks(docs, "ts", "text", "doc_id",
        watermark = "24 hours", stateTtlMs = 86400000L, W = 20)
      .writeStream.format("memory").queryName("ssubpar").outputMode("append").start()
    corpus.grouped((corpus.length + 2) / 3).foreach { chunk =>
      mem.addData(chunk.toSeq.map { case (id, text) =>
        (new Timestamp(1704067200000L + id * 1000L), id, text)
      })
      q.processAllAvailable()
    }
    q.stop()
    val streamSpans = ExactSubstrings.mergeMarks(
        spark.table("ssubpar").toDF("id", "pos", "e"))
      .select("id", "span", "span_start", "span_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamSpans == batchSpans,
      s"stream-merged spans must equal the batch op's; " +
        s"extra=${streamSpans -- batchSpans} missing=${batchSpans -- streamSpans}")
  }

  test("triangle parity: streaming delta-batch marks equal q294's base-index probe plus delta-internal first-occurrence marks") {
    // Closes the q294 ↔ streaming twin triangle (r12 verdict #6): ingest
    // the base split as batch 1 and the delta split as batch 2. The
    // batch-2 marks decompose EXACTLY into (a) q294's algebra — every
    // delta occurrence whose window hash exists in the base index (its
    // owner was installed in batch 1) — plus (b) the delta-internal
    // tail q294's probe deliberately excludes: post-first occurrences
    // of hashes absent from base (ownerless until batch 2). Both sides
    // feed the SHARED ExactSubstrings.mergeMarks, so the assert pins
    // identical maximal spans, not just identical mark sets.
    import graft.functions.ExactSubstrings
    val W = 20
    val plant = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        if (r.getLong(0) % 5 == 0) r.getString(1) + " " + plant
        else r.getString(1))).sortBy(_._1)
    val (delta, base) = corpus.partition(_._1 % 7 == 0)
    val hashesAll = ExactSubstrings.tokenWindowHashes(
      corpus.toSeq.toDF("doc_id", "text"), "text", "doc_id", W)
    val baseIdx = hashesAll.filter(col("id") % 7 =!= 0).select("h").distinct()
    val deltaH = hashesAll.filter(col("id") % 7 === 0)
    val probeMarks = deltaH.join(baseIdx, Seq("h"))
      .select(col("id"), col("pos"))
    val notInBase = deltaH.join(baseIdx, Seq("h"), "left_anti")
    val occ = struct(col("id"), col("pos"))
    val internalMarks = notInBase
      .join(notInBase.groupBy("h").agg(min(occ).as("f")), Seq("h"))
      .filter(occ =!= col("f"))
      .select(col("id"), col("pos"))
    val expected = ExactSubstrings.mergeMarks(
        probeMarks.unionByName(internalMarks)
          .select(col("id"), col("pos"), (col("pos") + (W - 1)).as("e")))
      .select("id", "span", "span_start", "span_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingTokenSpanMarks(docs, "ts", "text", "doc_id",
        watermark = "24 hours", stateTtlMs = 86400000L, W = W)
      .writeStream.format("memory").queryName("ssubtri").outputMode("append").start()
    Seq(base, delta).foreach { chunk =>
      mem.addData(chunk.toSeq.map { case (id, text) =>
        (new Timestamp(1704067200000L + id * 1000L), id, text)
      })
      q.processAllAvailable()
    }
    q.stop()
    // Batch 2 contained only delta docs, so its marks are exactly the
    // %7 ≡ 0 rows (batch-1 marks are base-internal by the same token).
    val streamSpans = ExactSubstrings.mergeMarks(
        spark.table("ssubtri").filter(col("id") % 7 === 0)
          .toDF("id", "pos", "e"))
      .select("id", "span", "span_start", "span_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamSpans.nonEmpty)
    assert(streamSpans == expected,
      s"delta-batch stream spans must equal probe ∪ delta-internal spans; " +
        s"extra=${streamSpans -- expected} missing=${expected -- streamSpans}")
  }

  test("substring hash re-hit after ttl refreshes the owner clock instead of crashing") {
    // Same GroupStateImpl race the near-dup twin pins below: an owner
    // whose timeout was computed from its ORIGINAL event time crashes
    // on setTimeoutTimestamp < watermark when its hash is re-hit after
    // stateTtlMs inside one batch.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val mem = MemoryStream[(Timestamp, Long, String)]
      val docs = mem.toDF().toDF("ts", "doc_id", "text")
      val q = StreamAggs.streamingTokenSpanMarks(docs, "ts", "text", "doc_id",
          watermark = "10 minutes", stateTtlMs = 60000L, W = 5)
        .writeStream.format("memory").queryName("ssubttl").outputMode("append").start()
      val passage = "alpha beta gamma delta epsilon zeta eta theta"
      mem.addData(Seq(
        (ts(0), 1L, passage),
        (ts(15), 2L, "totally unrelated filler text with nothing shared at all here")))
      q.processAllAvailable()
      mem.addData(Seq((ts(6), 3L, passage)))
      q.processAllAvailable()
      q.stop()
      val marked = spark.table("ssubttl").select("id").as[Long].collect().toSet
      assert(marked == Set(3L))
    } finally spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
  }

  test("near-dup bucket re-hit after ttl refreshes the owner clock instead of crashing") {
    // Regression: the owner's timeout was set from its ORIGINAL event time.
    // A bucket re-hit after stateTtlMs then computed a timeout earlier than
    // the current watermark, which GroupStateImpl rejects → query crash.
    // No-data micro-batches would fire the timeout between our two data
    // batches; in production data keeps arriving, so the re-hit races the
    // timeout inside ONE batch — disable them to pin that exact ordering.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val mem = MemoryStream[(Timestamp, Long, String)]
      val docs = mem.toDF().toDF("ts", "doc_id", "text")
      val q = StreamAggs.streamingNearDupCandidates(docs, "ts", "text", "doc_id",
          watermark = "10 minutes", stateTtlMs = 60000L) // ttl ≪ watermark horizon
        .writeStream.format("memory").queryName("sndttl").outputMode("append").start()
      // Batch 1: bucket owner at m0; an unrelated doc at m15 drags the
      // watermark to m5 — past the owner's m0 + 1-minute ttl.
      mem.addData(Seq(
        (ts(0), 1L, "the quick brown fox jumps over the lazy dog"),
        (ts(15), 2L, "completely different prose about spark streaming pipelines")))
      q.processAllAvailable()
      // Batch 2: a twin re-hits the owner's bucket in the same batch where
      // the owner's stale timeout fires (data groups run first). Must emit
      // the candidate, not crash on setTimeoutTimestamp < watermark.
      mem.addData(Seq((ts(6), 3L, "the quick brown fox jumps over the lazy dog")))
      q.processAllAvailable()
      q.stop()
      val cands = spark.table("sndttl").select("doc_id", "dup_of")
        .as[(Long, Long)].collect().toSet
      assert(cands == Set((3L, 1L)))
    } finally spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
  }

  test("narrow curation ops (stratified sample → chunking) run unchanged on a stream") {
    import graft.functions.{Packing, Splits}
    val mem = MemoryStream[(Timestamp, Long, String, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "lang", "text")
    // Both ops are pure narrow maps/generators — the SAME library calls
    // compose on a streaming frame with no watermark or state required.
    val q = Packing.chunkDocs(
        Splits.stratifiedSample(docs, "lang", "doc_id",
          rates = Seq("en" -> 1.0), defaultRate = 0.0),
        "text", "doc_id", window = 3, stride = 2)
      .writeStream.format("memory").queryName("curate").outputMode("append").start()
    mem.addData(Seq(
      (ts(0), 1L, "en", "a b c d e"),
      (ts(1), 2L, "fr", "un deux trois"))) // rate 0 → filtered out
    q.processAllAvailable(); q.stop()
    val got = spark.table("curate")
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._2)
    assert(got.map(_._1).forall(_ == 1L), "fr doc must be sampled out")
    assert(got.map(_._3).toSeq == Seq("a b c", "c d e"))
  }

  test("stream-static ANN serving: streaming query vectors probe the PQ-encoded corpus") {
    import graft.functions.Similarity
    // Static side: the corpus PQ-encoded ONCE (codes only — the serving
    // index); streaming side: query vectors arriving in micro-batches,
    // ADC-scored against the static index via a stream-static join.
    val codebook: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
      Seq(Seq(0.0, 0.0), Seq(-10.0, -10.0)))
    val corpus = Seq(
      (0L, Array(0.1f, -0.1f, 0.2f, 0.1f)),
      (1L, Array(9.8f, 10.1f, -9.9f, -10.2f)),
      (2L, Array(10.0f, 10.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val enc = corpus.select(col("vec_id").as("neighbor_id"),
      Similarity.pqCodes(col("embedding"), codebook).as("codes"))
    val mem = MemoryStream[(Long, Array[Float])]
    val luts = codebook.zipWithIndex.map { case (cents, m) =>
      array(cents.map(cv => Similarity.l2Sq(
        slice(col("embedding"), m * 2 + 1, 2), array(cv.map(lit): _*))): _*).as(s"lut$m")
    }
    val queries = mem.toDF().toDF("query_id", "embedding")
      .select(col("query_id") +: luts: _*)
    val adc = (0 until 2).map(m =>
      element_at(col(s"lut$m"), element_at(col("codes"), m + 1) + 1)).reduce(_ + _)
    val scored = queries.crossJoin(enc).withColumn("adc", adc)
    val q = scored.select("query_id", "neighbor_id", "adc")
      .writeStream.format("memory").queryName("sann").outputMode("append").start()
    mem.addData(Seq((100L, Array(0.0f, 0.0f, 0.0f, 0.0f))))
    q.processAllAvailable()
    mem.addData(Seq((101L, Array(9.9f, 9.9f, -10.0f, -10.0f))))
    q.processAllAvailable()
    q.stop()
    val best = spark.table("sann").as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (qid, rows) => qid -> rows.minBy(r => (r._3, r._2))._2 }
    // origin-query matches the near-origin vector; far query matches its twin
    assert(best(100L) == 0L && best(101L) == 1L, s"wrong neighbors: $best")
  }

  test("stream-stream interval join: clicks match the impression within the window") {
    val imps = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val joined = StreamAggs.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user", "click_id"),
      imps.toDF().toDF("i_ts", "i_user", "imp_id"),
      leftKey = "c_user", rightKey = "i_user",
      leftTs = "c_ts", rightTs = "i_ts",
      leftWatermark = "30 minutes", rightWatermark = "30 minutes",
      within = "10 minutes")
    val q = joined.select("click_id", "imp_id")
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    imps.addData(Seq((ts(0), 1L, "i1"), (ts(3), 2L, "i2"), (ts(40), 1L, "i3")))
    q.processAllAvailable()
    // Click in a LATER batch still matches the stored impression state;
    // user 2's click at ts(20) is outside [ts(10)-10m, ts(10)] — no match.
    clicks.addData(Seq((ts(5), 1L, "c1"), (ts(20), 2L, "c2"), (ts(42), 1L, "c3")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin").as[(String, String)].collect().toSet
    assert(got == Set(("c1", "i1"), ("c3", "i3")))
  }

  test("streaming spikes: cross-batch state matches the batch operator row for row") {
    import graft.functions.RobustStats
    import org.apache.spark.sql.functions.col
    val events = Seq(
      (1L, 0, 10.0), (1L, 1, 12.0), (1L, 2, 11.0), // batch 1
      (1L, 3, 100.0), (1L, 4, 12.0), (2L, 4, 5.0), // batch 2 (spike at t3)
      (2L, 5, 50.0), (1L, 6, 9.0)                  // batch 3 (user-2 spike)
    ).map { case (u, t, v) => StreamAggs.Ev(u, ts(t), v) }
    val mem = MemoryStream[StreamAggs.Ev]
    val q = StreamAggs.streamingSpikes(mem.toDS(), lookback = 12, factor = 2.0,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("spikes").outputMode("update").start()
    events.grouped(3).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("spikes").as[StreamAggs.SpikeOut].collect()
      .map(r => (r.user_id, r.ts.getTime) -> (r.baseline, r.is_spike)).toMap
    val batch = RobustStats.trailingMedianSpikes(
        events.toDF().select(col("user_id"), col("ts"), col("value")),
        "value", Seq("user_id"), Seq(col("ts")), lookback = 12, factor = 2.0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // and the planted spikes are the only flags
    val flagged = streamed.collect { case (k, (_, true)) => k }.toSet
    assert(flagged == Set((1L, ts(3).getTime), (2L, ts(5).getTime)))
  }

  test("streaming PSI: per-window drift matches the batch operator's non-null sum") {
    import graft.functions.RobustStats
    import org.apache.spark.sql.functions.col
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val mem = MemoryStream[(Timestamp, Double)]
    val docs = mem.toDF().toDF("ts", "value")
    val q = StreamAggs.streamingPsi(docs, "ts", "value", ref, "v",
        window = "1 minute", watermark = "0 seconds")
      .writeStream.format("memory").queryName("spsi").outputMode("append").start()
    // window A: the reference distribution itself → PSI must be 0
    mem.addData((1 to 100).map(i => (ts(0), i.toDouble)))
    q.processAllAvailable()
    // window B: total drift — everything lands in the top bin
    mem.addData((1 to 50).map(_ => (ts(60), 1000.0)))
    q.processAllAvailable()
    mem.addData(Seq((ts(180), 50.0))) // drag the watermark past window B
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spsi")
      .select("window_start", "cur_total", "psi")
      .as[(Timestamp, Long, Double)].collect()
      .map(r => r._1.getTime -> ((r._2, r._3))).toMap
    assert(got(ts(0).getTime) == ((100L, 0.0)), s"got $got")
    // batch parity on the drifted slice: sum of the non-null per-bin psi
    val batchPsi = RobustStats.psiDrift(ref,
        (1 to 50).map(_ => 1000.0).toDF("v"), "v")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(col("psi")), 6))
      .as[Double].head()
    assert(got(ts(60).getTime) == ((50L, batchPsi)),
      s"streamed=${got(ts(60).getTime)} batch=$batchPsi")
  }

  test("streaming snapshot diff: cross-batch added/changed/unchanged matches batch diff") {
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamAggs.streamingSnapshotDiff(docs, "ts", "text", "doc_id",
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sdiff").outputMode("update").start()
    // Batch 1: the "old snapshot" — everything is first-sight
    mem.addData(Seq((ts(0), 1L, "alpha"), (ts(0), 2L, "beta"), (ts(0), 3L, "gamma")))
    q.processAllAvailable()
    val b1 = spark.table("sdiff").as[StreamAggs.DiffOut].collect()
      .map(r => r.doc_id -> r.change).toMap
    assert(b1 == Map(1L -> "added", 2L -> "added", 3L -> "added"))
    // Batch 2: the "current snapshot" re-crawl — 2 unchanged (reflowed
    // whitespace canonicalizes away), 3 edited, 4 new
    mem.addData(Seq((ts(5), 2L, "  BETA "), (ts(5), 3L, "gamma EDITED"),
      (ts(5), 4L, "delta")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sdiff").as[StreamAggs.DiffOut].collect()
    val b2 = all.drop(b1.size).map(r => r.doc_id -> r.change).toMap
    assert(b2 == Map(2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // batch-operator parity on the same two snapshots (minus `removed`,
    // which a stream cannot observe)
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val cur = Seq((2L, "  BETA "), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val batch = graft.operators.SnapshotDiff.diff(old, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap.filter(_._2 != "removed")
    assert(b2 == batch, s"streamed=$b2 batch=$batch")
  }

  test("streaming window percentiles: exact while n ≤ accuracy, " +
    "per-window and per-type isolation") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.windowPercentiles(toDf(mem), "60 minutes",
        "10 minutes", Seq(0.5, 0.99), accuracy = 10000)
      .writeStream.format("memory").queryName("spct").outputMode("update")
      .start()
    // hour 0, type a: values 1..100; type b: constant 7; hour 1: 1000s
    val h0a = (1 to 100).map(i => (ts(i % 50), 1L, "a", i.toDouble))
    val h0b = (1 to 10).map(i => (ts(i), 2L, "b", 7.0))
    val h1 = Seq((ts(61), 1L, "a", 1000.0), (ts(62), 1L, "a", 2000.0))
    mem.addData(h0a ++ h0b ++ h1); q.processAllAvailable(); q.stop()
    val out = spark.table("spct").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (n0a, p50a, p99a) = out((ts(0), "a"))
    assert(n0a === 100L && p50a === 50.0 && p99a === 99.0)
    val (n0b, p50b, p99b) = out((ts(0), "b"))
    assert(n0b === 10L && p50b === 7.0 && p99b === 7.0)
    val (n1, p50h1, _) = out((ts(60), "a"))
    assert(n1 === 2L && p50h1 === 1000.0)
  }

  test("streaming histogram percentiles: per-window bin estimates match " +
    "the batch HistSketch rule value-for-value") {
    import graft.functions.HistSketch
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.windowHistPercentiles(toDf(mem), "60 minutes",
        "10 minutes", Seq((1, 2), (19, 20)))
      .writeStream.format("memory").queryName("shist").outputMode("update")
      .start()
    // hour 0 type a: micro-values spread over several log2 bins
    val vals = Seq(0.000001, 0.000002, 0.000004, 0.000008, 0.0001, 0.01)
    val data = vals.zipWithIndex.map { case (v, i) =>
      (ts(i), i.toLong, "a", v) }
    mem.addData(data: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("shist").collect()
      .map(r => (r.getString(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // Batch twin over the same rows.
    val batch = HistSketch.percentilesFromHistogram(
      HistSketch.logHistogram(
        data.map { case (_, _, t, v) =>
          (t, math.round(v * 1000000.0)) }.toDF("g", "vm"),
        "g", col("vm")), Seq((1, 2), (19, 20)))
      .collect().map(r => (r.getString(0), r.getAs[Int]("p_num")) ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("est_lo")))).toMap
    assert(streamed === batch,
      s"streaming $streamed must equal batch $batch")
  }

  test("streaming window trend: exact slope on a crafted linear window; " +
    "per-window and per-type isolation") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.windowTrend(toDf(mem), "60 minutes", 3600000L,
        "10 minutes")
      .writeStream.format("memory").queryName("strend").outputMode("update")
      .start()
    // hour 0 type a: value = 2.0 * minute + 3 (exact line, slope
    // 2/min = 2/60 per sec); type b constant 5 (slope 0).
    // hour 1 type a: value = -1.0 * minute offset + 100.
    val h0a = (0 to 30).map(i => (ts(i), 1L, "a", 2.0 * i + 3.0))
    val h0b = (0 to 10).map(i => (ts(i), 2L, "b", 5.0))
    val h1a = (60 to 90).map(i => (ts(i), 3L, "a", -1.0 * (i - 60) + 100.0))
    mem.addData(h0a ++ h0b ++ h1a); q.processAllAvailable(); q.stop()
    val out = spark.table("strend").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (n0, s0, i0) = out((ts(0), "a"))
    assert(n0 === 31L)
    assert(math.abs(s0 - 2.0 / 60.0) < 1e-6)
    assert(math.abs(i0 - 3.0) < 1e-6)
    val (_, sb, ib) = out((ts(0), "b"))
    assert(sb === 0.0 && ib === 5.0)
    val (_, s1, _) = out((ts(60), "a"))
    assert(math.abs(s1 - (-1.0 / 60.0)) < 1e-6)
  }

  test("streaming PSI drift: identical distribution scores 0/stable; a " +
    "collapsed one scores the hand-computed PSI with open bins counted") {
    import graft.functions.HistSketch
    // Reference: type 'a', bins 20 and 21 with equal mass (values are
    // exact powers-of-two micro-units: 1.048576 → 2^20, 2.097152 → 2^21).
    val lo = 1.048576; val hi = 2.097152
    val refRows = (Seq.fill(4)(lo) ++ Seq.fill(4)(hi))
      .map(v => ("a", math.round(v * 1000000.0)))
      .toDF("g", "vm")
    val ref = HistSketch.logHistogram(refRows, "g", col("vm"))
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.windowPsiDrift(toDf(mem), "60 minutes",
        "10 minutes", ref)
      .writeStream.format("memory").queryName("spsi").outputMode("update")
      .start()
    // hour 0: same 50/50 mix as the reference; hour 1: all mass in the
    // low bin (drift), the high bin goes one-sided.
    mem.addData(
      Seq(ts(0) -> lo, ts(1) -> lo, ts(2) -> hi, ts(3) -> hi,
        ts(60) -> lo, ts(61) -> lo, ts(62) -> lo, ts(63) -> lo)
        .map { case (t, v) => (t, 1L, "a", v) })
    q.processAllAvailable(); q.stop()
    val out = spark.table("spsi").collect()
      .map(r => r.getTimestamp(0) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4), r.getString(5)))).toMap
    // Same mix: every populated bin has cf = rf → psi exactly 0.
    assert(out(ts(0)) === ((4L, 0.0d, 0, "stable")))
    // Collapsed: bin20 term (1.0 − 0.5)·ln(1.0/0.5) = 0.5·ln 2;
    // bin21 is one-sided (cur 0, ref > 0) → excluded, counted open.
    val expected = BigDecimal(0.5d * math.log(2.0d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (n1, psi1, open1, verdict1) = out(ts(60))
    assert(n1 === 4L && open1 === 1 && verdict1 === "shifted")
    assert(psi1 === expected, s"psi $psi1 != $expected")
  }

  test("streaming window trend: degenerate windows (n=1 or one distinct " +
    "ts) publish NULL slope, never NaN") {
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.windowTrend(toDf(mem), "60 minutes", 3600000L,
        "10 minutes")
      .writeStream.format("memory").queryName("strend_degen")
      .outputMode("update").start()
    // type a: a single event; type b: three events on ONE timestamp —
    // both have varx = 0 (no fittable trend).
    mem.addData(Seq((ts(1), 1L, "a", 7.0),
      (ts(2), 2L, "b", 1.0), (ts(2), 3L, "b", 2.0), (ts(2), 4L, "b", 9.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("strend_degen").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4),
        s"degenerate window must publish NULL, got $r")
    }
  }

  test("streaming last-touch: conversions credit across batches; " +
    "rollup matches the batch attribution operator") {
    val mem = MemoryStream[StreamAggs.AttribEv]
    val q = StreamAggs.streamingLastTouch(mem.toDS(), "purchase")
      .writeStream.format("memory").queryName("sattr").outputMode("update")
      .start()
    // batch 1: user 1 views; user 2 purchases untouched
    mem.addData(StreamAggs.AttribEv(1L, ts(0), "view", 0.0),
      StreamAggs.AttribEv(2L, ts(1), "purchase", 7.0))
    q.processAllAvailable()
    // batch 2: user 1 purchases (credits the view from batch 1 — state
    // carried), then clicks, then purchases again (credits click)
    mem.addData(StreamAggs.AttribEv(1L, ts(5), "purchase", 10.0),
      StreamAggs.AttribEv(1L, ts(6), "click", 0.0),
      StreamAggs.AttribEv(1L, ts(7), "purchase", 5.0))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sattr").as[StreamAggs.TouchOut].collect()
      .groupBy(_.channel)
      .map { case (c, v) => c -> ((v.length.toLong,
        BigDecimal(v.map(_.value).sum).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)) }
    // batch operator over the union of both batches
    val ev = Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 1L, 2L, "purchase", 7.0),
      (1L, 5L, 3L, "purchase", 10.0), (1L, 6L, 4L, "click", 0.0),
      (1L, 7L, 5L, "purchase", 5.0)
    ).toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val batch = graft.operators.Transitions.lastTouch(ev, "user_id",
        Seq(col("ts_ms"), col("event_id")), "event_type", "value", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed === batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming expectations: per-window rule metrics match the batch " +
    "suite on the same slice; a bad window flags, a clean one passes") {
    import graft.operators.Expectations
    import Expectations.Expectation
    def rules = Seq(
      Expectation("value_complete", Expectations.completeness(col("value")),
        m => m >= 1.0d),
      Expectation("value_nonneg",
        Expectations.satisfies(col("value") >= 0.0d), m => m === 1.0d))
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = StreamAggs.streamingExpectations(toDf(mem), "ts", "60 minutes",
        "10 minutes", rules)
      .writeStream.format("memory").queryName("sexp").outputMode("update")
      .start()
    // hour 0: clean; hour 1: one negative value
    val h0 = Seq((ts(1), 1L, "a", 1.0), (ts(2), 2L, "a", 2.0))
    val h1 = Seq((ts(61), 1L, "a", 3.0), (ts(62), 2L, "a", -4.0))
    mem.addData(h0 ++ h1); q.processAllAvailable(); q.stop()
    val out = spark.table("sexp").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out((ts(0), "value_nonneg")) === ((1.0d, true)))
    assert(out((ts(60), "value_nonneg")) === ((0.5d, false)))
    // batch parity on the flagged hour's slice
    val slice = h1.toDF("ts", "user_id", "event_type", "value")
    val batch = Expectations.run(slice, rules).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(batch("value_nonneg") === out((ts(60), "value_nonneg")))
    assert(batch("value_complete") === out((ts(60), "value_complete")))
  }

  test("streaming KMV: cross-batch estimates match the batch sketch " +
    "over the union, state stays ≤ k longs") {
    val mem = MemoryStream[(String, String)] // (group, key)
    val hashed = mem.toDF().toDF("g", "key")
      .select(col("g"), graft.functions.TextFunctions.md5Long(col("key")).as("h"))
    val q = StreamAggs.streamingKmv(hashed, 32)
      .writeStream.format("memory").queryName("skmv").outputMode("update")
      .start()
    val batch1 = (1 to 100).map(i => ("a", s"key_$i")) ++
      (1 to 10).map(i => ("b", s"bk_$i"))
    val batch2 = (51 to 200).map(i => ("a", s"key_$i")) // 50% overlap with b1
    mem.addData(batch1); q.processAllAvailable()
    mem.addData(batch2); q.processAllAvailable()
    q.stop()
    // last emission per group = the stream's final estimate
    val fin = spark.table("skmv").as[StreamAggs.KmvOut].collect()
      .groupBy(_.g).map { case (g, v) => g -> v.last }
    // batch tier over the union of both batches must agree exactly
    val batchEst = graft.functions.Sketches.kmvDistinct(
        (batch1 ++ batch2).toDF("g", "key"), "g", "key", 32)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(fin("a").kmv_n === batchEst("a")._1)
    assert(fin("a").kmv_est === batchEst("a")._2)
    assert(fin("b").kmv_n === 10L && fin("b").kmv_est === 10L) // sub-k exact
    assert(batchEst("b") === ((10L, 10L)))
  }

  test("streaming EWMA control chart: levels replay the dyadic batch " +
    "fold bit-for-bit; a planted surge flags, its neighbors don't") {
    import StreamAggs.{EwmaIn, EwmaOut}
    // steady ~100/period with a planted 10x surge at period 8
    val xs = Vector(100L, 104L, 97L, 101L, 99L, 103L, 98L, 102L, 1000L,
      100L, 96L)
    val points = xs.zipWithIndex.map { case (x, i) => EwmaIn("clicks", ts(i), x) }
    val mem = MemoryStream[EwmaIn]
    val q = StreamAggs.streamingEwma(mem.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sewma").outputMode("update").start()
    points.grouped(4).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("sewma").as[EwmaOut].collect()
      .map(r => r.period.getTime -> ((r.x, r.pred_micro, r.flagged))).toMap
    // reference fold with the exact q222 recursion and prefix moments
    var ew = Option.empty[Long]; var n = 0L; var s1 = 0L; var s2 = 0L
    val want = xs.zipWithIndex.map { case (x, i) =>
      val pred = ew
      val sd = if (n >= 2) Some(math.sqrt((n.toDouble * s2 - s1.toDouble * s1) /
        (n.toDouble * (n - 1.0)))) else None
      val flagged = (pred, sd) match {
        case (Some(e), Some(d)) => math.abs(x * 1000000L - e) > 3.0 * d * 1000000.0
        case _ => false
      }
      ew = Some(pred.map(e => (x * 1000000L + 3L * e) >> 2).getOrElse(x * 1000000L))
      n += 1; s1 += x; s2 += x * x
      ts(i).getTime -> ((x, pred, flagged))
    }.toMap
    assert(got === want)
    assert(got.collect { case (k, (_, _, true)) => k } === Seq(ts(8).getTime),
      "only the planted surge flags")
  }
}
