package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations — capabilities beyond the reference's
  * stateless micro-batches (it keeps all state in the warehouse,
  * SURVEY.md §2.9 T5), provided as the natural Structured Streaming layer
  * over the same event stream:
  *
  *  - watermarked tumbling / sliding window aggregates (late data dropped
  *    deterministically after the watermark);
  *  - built-in session windows (gap-based);
  *  - custom per-key running state via `flatMapGroupsWithState` for
  *    whatever the declarative windows can't express.
  *
  * All operate on a frame shaped like the testdata `events` table
  * (ts: timestamp, user_id, event_type, value). State is keyed and
  * watermark-bounded → memory per executor is O(active keys), not O(rows).
  */
object StreamAggs {

  /** Tumbling-window counts/sums per event type. */
  def tumbling(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window aggregation (overlapping windows). */
  def sliding(events: DataFrame, window: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("n"))

  /** Gap-based session windows per user (built-in `session_window`). */
  def sessions(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Windowed PSI drift monitor — the streaming production shape of
    * [[graft.functions.RobustStats.psiDrift]]: the static reference
    * snapshot trains the model ONCE (quantile boundaries + per-bin
    * fractions, a ≤5-row frame collected driver-side — the q82
    * centroid pattern), then each tumbling window of the live feed
    * bins against those FROZEN boundaries and emits one row
    * (window_start, window_end, cur_total, psi) when the watermark
    * closes the window. One streaming aggregation whose state is 4
    * conditional counters per open window; bins the window never
    * populates are skipped (the batch operator's NULL convention), so
    * `psi` is the sum of defined per-bin terms — identical to summing
    * the batch operator's non-null `psi` column over the same slice. */
  def streamingPsi(docs: DataFrame, tsCol: String, valueCol: String,
                   ref: DataFrame, refValueCol: String, window: String,
                   watermark: String,
                   probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val bounds = graft.functions.RobustStats
      .quantileBoundaries(ref, refValueCol, probs).collect().head
    val bs = probs.indices.map(i => bounds.getDouble(i))
    val nBins = probs.length + 1
    val refCounts = ref.select(
        probs.indices.map(i => when(col(refValueCol) > bs(i), 1).otherwise(0))
          .reduce(_ + _).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refTotal = refCounts.values.sum.toDouble
    val bin = probs.indices.map(i => when(col(valueCol) > bs(i), 1).otherwise(0))
      .reduce(_ + _)
    val binCols = (0 until nBins).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"c$b"))
    val agg = docs
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(binCols.head, binCols.tail: _*)
    val total = (0 until nBins).map(b => col(s"c$b")).reduce(_ + _)
    val psi = (0 until nBins).flatMap { b =>
      val rf = refCounts.getOrElse(b, 0L) / refTotal
      if (rf == 0.0) None
      else {
        val cf = col(s"c$b").cast("double") / col("cur_total")
        Some(when(col(s"c$b") > 0, (cf - lit(rf)) * log(cf / lit(rf)))
          .otherwise(lit(0.0)))
      }
    }.reduce(_ + _)
    agg
      .withColumn("cur_total", total)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("cur_total"),
        round(psi, 6).as("psi"))
  }

  /** Streaming exact dedup across micro-batches: state-backed
    * `dropDuplicatesWithinWatermark` on the canonical text fingerprint —
    * the streaming twin of [[graft.functions.DedupFunctions.exactDedup]].
    * A duplicate arriving in ANY later batch within the watermark horizon
    * is dropped; state is bounded by the watermark (keys older than the
    * horizon are evicted), so memory is O(docs per horizon), not O(corpus).
    * For an unbounded-horizon dedup, the batch merge path (key-anti-join
    * against the accumulated target) is the right tool instead — this is
    * the "suppress re-crawls/retries" shape. */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
                          watermark: String): DataFrame =
    docs
      .withColumn("fp_aws", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp_aws")
      .drop("fp_aws")

  /** Streaming training-data ingest: the corpus-side composition of the
    * batch operators — quality gate → cross-batch exact dedup (watermark-
    * bounded state) → deterministic split assignment → language tag →
    * token count. Everything except the dedup state is a narrow map, so
    * the stage parallelizes with the source; downstream writers typically
    * `partitionBy("split")`. */
  def corpusIngest(docs: DataFrame, tsCol: String, textCol: String, idCol: String,
                   watermark: String, minQuality: Double,
                   gopherGate: Boolean = false,
                   normalize: Boolean = false,
                   entropyGate: Boolean = false,
                   urlCol: Option[String] = None): DataFrame = {
    import graft.functions.{CharStatsExpression, Splits, TextFunctions, TextNormalizeExpression, Url}
    // ONE watermark definition up front (redefining a stream's watermark
    // is an error — both dedup states below share this horizon).
    val watermarked = docs.withWatermark(tsCol, watermark)
    // Canonical-URL dedup FIRST when a URL rides with the doc (the crawl
    // order: URL identity is the cheapest dedup tier — one regex map and a
    // watermark-bounded key state, no text processing at all — so re-crawls
    // of the same page never reach the quality gates or the content-hash
    // state downstream).
    val urlDeduped = urlCol match {
      case Some(u) =>
        watermarked.withColumn("canon_url_aws", Url.canonicalize(col(u)))
          .dropDuplicatesWithinWatermark("canon_url_aws")
          .drop("canon_url_aws")
      case None => watermarked
    }
    // Optional canonicalization (the production order: normalize →
    // gate → dedup, so trivially-different encodings collapse before any
    // downstream state) — a codegen'd narrow map like the gates below.
    val canon = if (normalize)
      urlDeduped.withColumn(textCol, TextNormalizeExpression.textNormalize(col(textCol)))
    else urlDeduped
    // Quality gate: the q19 soft score, optionally AND'd with q50's hard
    // Gopher rules — both are per-row column predicates, so the streaming
    // plan stays a stateless narrow filter ahead of the dedup state store.
    val gated = canon
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .transform(d => if (gopherGate)
        d.filter(TextFunctions.gopherRules(col(textCol)).getField("passed")) else d)
      .transform(d => if (entropyGate)
        d.filter(element_at(CharStatsExpression.charStats(col(textCol)), 1) >= lit(3.0) &&
          element_at(CharStatsExpression.charStats(col(textCol)), 2) <= lit(0.25))
        else d)
    // Content-fingerprint dedup (the [[streamingExactDedup]] algebra,
    // inlined against the stream's single watermark definition above).
    val deduped = gated
      .withColumn("fp_aws", TextFunctions.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fp_aws")
      .drop("fp_aws")
    Splits.withSplit(deduped, idCol)
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
  }

  /** Watermarked stream-stream interval join (e.g. clicks to the
    * impression that preceded them within `within`): inner equi-join on
    * `leftKey = rightKey` with the right event time constrained to
    * [left ts − within, left ts]. Both sides carry watermarks and the
    * join condition bounds event time on both sides, so Spark derives a
    * state-eviction horizon for each side — state is O(events per
    * horizon), not O(stream). The two frames are aliased `l`/`r`;
    * output carries every column of both (qualified names collide only
    * if the caller selects ambiguously). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   leftWatermark: String, rightWatermark: String,
                   within: String): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $within") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"))
  }

  /** Row types for the streaming near-dup path. */
  final case class BandRow(band: Int, bh: Long, id: Long, ts: java.sql.Timestamp)
  final case class BandOwner(id: Long, tsMs: Long)
  final case class NearDupCandidate(doc_id: Long, dup_of: Long, band: Int)

  /** Streaming near-duplicate *candidates* across micro-batches — the
    * streaming twin of [[graft.functions.DedupFunctions.minhashLshPairs]]'
    * banding stage. Each document's MinHash signature is cut into `bands`
    * band keys; per band bucket, keyed state remembers the earliest
    * document seen, and any later document hitting the same bucket is
    * emitted as a candidate (doc_id, dup_of, band). Exact verification is
    * the consumer's batch join (candidates ≪ stream), mirroring the batch
    * operator's verify step — LSH recall, exact precision downstream.
    *
    * Scale: state is one (id, ts) per *occupied band bucket*, evicted
    * `stateTtlMs` after the bucket's last event time (the analog of the
    * batch horizon); band keys are uniform by construction, so the state
    * store shards evenly. A doc emits ≤ `bands` candidate rows, deduped
    * per (doc, owner) downstream.
    *
    * Per-doc cost (r12 verdict #4 profile): signatures ride the native
    * [[graft.functions.MinhashSigExpression]] kernel (one byte-hash per
    * shingle; the HOF form re-hashed every shingle once per seed,
    * interpreted), and the per-bucket group fold is single-pass — once a
    * bucket has an owner, the row iterator streams straight through with
    * NO buffering; only the first batch a bucket is ever seen buffers
    * that batch's occupant ids (to pick the (ts, id)-minimum owner
    * deterministically), bounded by one micro-batch's traffic into one
    * band bucket. */
  def streamingNearDupCandidates(docs: DataFrame, tsCol: String, textCol: String,
                                 idCol: String, watermark: String, stateTtlMs: Long,
                                 n: Int = 2, numHashes: Int = 32,
                                 bands: Int = 16): Dataset[NearDupCandidate] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    import docs.sparkSession.implicits._
    import graft.functions.{DedupFunctions, MinhashSigExpression}
    val sig = docs
      .withColumn("sh_aws", DedupFunctions.shingles(col(textCol), n))
      .filter(size(col("sh_aws")) > 0)
      .withColumn("sig_aws",
        MinhashSigExpression.minhashSig(col("sh_aws"), numHashes))
    // Band keys come from the SAME definition as the batch banding stage
    // (DedupFunctions.bandKeyColumns) so streaming and batch buckets can
    // never silently drift apart (and the signature kernel is pinned
    // bit-identical to the batch family by a FunctionsSpec property).
    val banded = sig.select(col(idCol).as("id"), col(tsCol).as("ts"),
        posexplode(array(DedupFunctions.bandKeyColumns(col("sig_aws"), bands, rowsPerBand): _*))
          .as(Seq("band", "bh")))
      .withWatermark("ts", watermark)
      .select(col("band").cast("int").as("band"), col("bh"), col("id"), col("ts"))
      .as[BandRow]
    banded
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BandOwner]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Seq.newBuilder[NearDupCandidate]
            var maxTs = 0L
            val owner: Option[(Long, Long)] = state.getOption match {
              case Some(o) =>
                // Owner fixed in an earlier batch: stream the iterator,
                // no buffering, no sort — every non-owner occurrence is
                // a candidate regardless of in-batch order.
                rows.foreach { r =>
                  val t = r.ts.getTime
                  if (t > maxTs) maxTs = t
                  if (r.id != o.id) out += NearDupCandidate(r.id, o.id, key._1)
                }
                Some((o.id, o.tsMs))
              case None =>
                // First batch this bucket is seen: one pass tracking the
                // (ts, id)-minimum as owner (the deterministic choice a
                // sorted replay would make), buffering only the occupant
                // ids; emission happens once the owner is final.
                var ownId = 0L
                var ownTs = 0L
                var seen = false
                val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
                rows.foreach { r =>
                  val t = r.ts.getTime
                  if (t > maxTs) maxTs = t
                  if (!seen || t < ownTs || (t == ownTs && r.id < ownId)) {
                    seen = true; ownId = r.id; ownTs = t
                  }
                  ids += r.id
                }
                ids.foreach { id =>
                  if (id != ownId) out += NearDupCandidate(id, ownId, key._1)
                }
                if (seen) Some((ownId, 0L)) else None
            }
            owner.foreach { case (ownerId, prevClock) =>
              // Eviction is stateTtlMs after the bucket's LAST event time:
              // refresh the owner's clock to the max event time observed in
              // this batch (keeping the owner id). Without the refresh, a
              // bucket re-hit after ttl would set a timeout earlier than the
              // current watermark — GroupStateImpl rejects that and crashes
              // the query. The watermark clamp covers the remaining race
              // (data groups are processed before timed-out groups, so a
              // batch can deliver to a bucket whose timeout already passed).
              val lastTs = math.max(prevClock, maxTs)
              state.update(BandOwner(ownerId, lastTs))
              state.setTimeoutTimestamp(
                math.max(lastTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
        })
  }

  final case class TokWinRow(h: Long, id: Long, pos: Long,
                             ts: java.sql.Timestamp)
  final case class TokWinOwner(id: Long, pos: Long, tsMs: Long)
  final case class SubstrMark(id: Long, pos: Long, e: Long)

  /** Streaming exact-substring duplicate MARKS across micro-batches —
    * the streaming twin of [[graft.functions.ExactSubstrings
    * .duplicateTokenSpans]] (Lee et al. 2021's token-window dedup, the
    * q267 tier). Window hashes come from the SAME
    * `ExactSubstrings.tokenWindowHashes` definition as the batch op;
    * per hash, keyed state remembers the first occurrence ever seen
    * ((id, pos)-earliest, matching the batch op's global first-
    * occurrence rule when documents arrive in id order), and every
    * other occurrence — later doc OR later position within the same doc
    * — is emitted as a mark `(id, pos, e)`. Feeding a batch's marks
    * through `ExactSubstrings.mergeMarks` yields the identical maximal
    * spans the batch op computes, which is what the parity spec pins.
    *
    * Scale: state is one (id, pos) owner per *distinct window hash* —
    * the same O(corpus token positions) grain the batch op shuffles,
    * living in RocksDB instead of a shuffle, evicted `stateTtlMs` after
    * each hash's last event time (the dedup horizon). A re-observed
    * owner (replayed document) neither emits nor grows state.
    *
    * Group-size note (r12 advice): once a hash has an owner in state,
    * the per-hash group streams through a single-pass fold with NO
    * buffering — a corpus-wide hot window hash (a boilerplate passage
    * present in most docs of one micro-batch) costs memory only in the
    * FIRST batch that hash is ever seen, where its (id, pos) occurrence
    * pairs are buffered to pick the deterministic (id, pos)-minimum
    * owner; from the second batch on, the hot group is O(1) memory on
    * its task regardless of fan-in. */
  def streamingTokenSpanMarks(docs: DataFrame, tsCol: String, textCol: String,
                              idCol: String, watermark: String,
                              stateTtlMs: Long, W: Int = 20)
      : Dataset[SubstrMark] = {
    import docs.sparkSession.implicits._
    import graft.functions.ExactSubstrings
    val hashed = ExactSubstrings.tokenWindowHashes(
        docs.withColumn("__ts", col(tsCol)), textCol, idCol, W,
        carry = Seq("__ts"))
      .withWatermark("__ts", watermark)
      .select(col("h"), col("id").cast("long").as("id"),
        col("pos").cast("long").as("pos"), col("__ts").as("ts"))
      .as[TokWinRow]
    hashed
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[TokWinRow], state: GroupState[TokWinOwner]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Seq.newBuilder[SubstrMark]
            var maxTs = 0L
            val owner: Option[(Long, Long, Long)] = state.getOption match {
              case Some(o) =>
                // Owner fixed in an earlier batch: stream the iterator —
                // every occurrence except an owner re-observation is a
                // mark, in any order; no buffering on hot hashes.
                rows.foreach { r =>
                  val t = r.ts.getTime
                  if (t > maxTs) maxTs = t
                  if (o.id != r.id || o.pos != r.pos)
                    out += SubstrMark(r.id, r.pos, r.pos + (W - 1))
                }
                Some((o.id, o.pos, o.tsMs))
              case None =>
                // First batch this hash is seen: one pass tracking the
                // (id, pos)-minimum — the batch op's exact global
                // first-occurrence rule — buffering only the (id, pos)
                // occurrence pairs until the owner is final.
                var ownId = 0L
                var ownPos = 0L
                var seen = false
                val occ = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
                rows.foreach { r =>
                  val t = r.ts.getTime
                  if (t > maxTs) maxTs = t
                  if (!seen || r.id < ownId || (r.id == ownId && r.pos < ownPos)) {
                    seen = true; ownId = r.id; ownPos = r.pos
                  }
                  occ += ((r.id, r.pos))
                }
                occ.foreach { case (id, pos) =>
                  if (id != ownId || pos != ownPos)
                    out += SubstrMark(id, pos, pos + (W - 1))
                }
                if (seen) Some((ownId, ownPos, 0L)) else None
            }
            owner.foreach { case (ownId, ownPos, prevClock) =>
              // Owner-clock refresh + watermark clamp: the
              // streamingNearDupCandidates TTL discipline (see the
              // comment there for the GroupStateImpl race this avoids).
              val lastTs = math.max(prevClock, maxTs)
              state.update(TokWinOwner(ownId, ownPos, lastTs))
              state.setTimeoutTimestamp(
                math.max(lastTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
        })
  }

  /** Input/row types for the custom-state path. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-user totals emitted every batch —
    * the `flatMapGroupsWithState` escape hatch for semantics the built-in
    * windows can't express (ref SURVEY.md §7.5 shape). With the default
    * ProcessingTime timeout, idle keys are evicted so state stays bounded
    * (note: timeout evaluation keeps the trigger busy — pair it with a
    * ProcessingTime trigger, not continuous processing). */
  def runningTotals(events: Dataset[Ev],
                    idleTimeoutMs: Long = 3600000L,
                    timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    require(timeout == GroupStateTimeout.ProcessingTimeTimeout ||
      timeout == GroupStateTimeout.NoTimeout,
      "runningTotals supports ProcessingTimeTimeout (evicting) or NoTimeout; " +
        "EventTimeTimeout would need a watermark + setTimeoutTimestamp wiring")
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (user: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
            val (n, total) = rows.foldLeft((prev.n, prev.total)) {
              case ((c, t), ev) => (c + 1, t + ev.value)
            }
            val next = UserRunning(user, n, total)
            state.update(next)
            if (evict) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.single(next)
          }
        })
  }

  final case class SpikeOut(user_id: Long, ts: java.sql.Timestamp, value: Double,
                            baseline: Option[Double], is_spike: Boolean)
  final case class SpikeState(window: Array[Double])

  /** Streaming twin of [[graft.functions.RobustStats
    * .trailingMedianSpikes]]: per-key state is a ring of the last
    * `lookback` values; each arriving event scores against the exact
    * interpolated median of that ring BEFORE being appended (a spike
    * never votes on its own baseline), so on in-order arrivals the
    * emitted flags match the batch operator row for row. State is
    * BOUNDED at `lookback` doubles per live key and idle keys evict on
    * the processing-time timeout — the monitor can watch an unbounded
    * key space. Within a batch, rows apply in event-time order. */
  def streamingSpikes(events: Dataset[Ev], lookback: Int = 12,
                      factor: Double = 2.0,
                      idleTimeoutMs: Long = 3600000L,
                      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SpikeOut] = {
    import events.sparkSession.implicits._
    def median(v: Vector[Double]): Double = {
      // the same (n-1)·p interpolation as exact percentile(0.5)
      val s = v.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = idx.toInt
      if (lo + 1 >= s.length) s(lo) else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
    }
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (user: Long, rows: Iterator[Ev], state: GroupState[SpikeState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf = state.getOption.map(_.window.toVector).getOrElse(Vector.empty[Double])
            val out = rows.toVector.sortBy(_.ts.getTime).map { ev =>
              val baseline = if (buf.isEmpty) None else Some(median(buf))
              val spike = baseline.exists(b => ev.value > factor * b)
              buf = (buf :+ ev.value).takeRight(lookback)
              SpikeOut(user, ev.ts, ev.value, baseline, spike)
            }
            state.update(SpikeState(buf.toArray))
            if (evict) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }

  final case class EwmaIn(key: String, period: java.sql.Timestamp, x: Long)
  final case class EwmaOut(key: String, period: java.sql.Timestamp, x: Long,
                           pred_micro: Option[Long], flagged: Boolean)
  final case class EwmaState(ew: Long, n: Long, s1: Long, s2: Long)

  /** Streaming twin of the q222 EWMA control chart: per key the state is
    * FOUR longs — the smoothed level in exact micro-units plus the
    * (n, Σx, Σx²) moment sums the σ threshold reads — updated per
    * period point with the same dyadic λ = 1/4 recursion
    * `e' = (x·10⁶ + 3e) >> 2` the batch query uses, so on in-order
    * arrivals the levels are bit-identical to the batch fold. A point is
    * flagged against the PRE-point prediction and the PRE-point σ (a
    * monitor only knows its past — q222's batch σ sees the whole
    * horizon, which is the one documented divergence); fewer than TWO
    * prior points never flag (σ needs n ≥ 2). Input is the already-windowed per-period
    * count (compose with a watermarked window count upstream); state is
    * O(1) per live key and idle keys evict on the processing-time
    * timeout. Moment sums stay exact while Σx² < 2⁶³ (x ≤ ~10⁶ per
    * period for ~10⁶ periods — far beyond any monitor horizon). */
  def streamingEwma(points: Dataset[EwmaIn],
                    factor: Double = 3.0,
                    idleTimeoutMs: Long = 3600000L,
                    timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[EwmaOut] = {
    import points.sparkSession.implicits._
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (key: String, rows: Iterator[EwmaIn], state: GroupState[EwmaState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption
            val out = rows.toVector.sortBy(_.period.getTime).map { p =>
              val pred = st.map(_.ew)
              val sd = st.filter(_.n >= 2).map { s =>
                val n = s.n.toDouble
                math.sqrt((n * s.s2.toDouble - s.s1.toDouble * s.s1.toDouble) /
                  (n * (n - 1.0)))
              }
              val flagged = (pred, sd) match {
                case (Some(e), Some(d)) =>
                  math.abs(p.x * 1000000L - e).toDouble > factor * d * 1000000.0
                case _ => false
              }
              val ew = pred.map(e => (p.x * 1000000L + 3L * e) >> 2)
                .getOrElse(p.x * 1000000L)
              st = Some(EwmaState(ew,
                st.map(_.n).getOrElse(0L) + 1L,
                st.map(_.s1).getOrElse(0L) + p.x,
                st.map(_.s2).getOrElse(0L) + p.x * p.x))
              EwmaOut(key, p.period, p.x, pred, flagged)
            }
            st.foreach(state.update)
            if (evict) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }

  final case class FunnelEv(user_id: Long, ts: java.sql.Timestamp,
                            event_type: String, event_id: Long)
  final case class FunnelAdvance(user_id: Long, step: Int, step_name: String,
                                 ts: java.sql.Timestamp)
  final case class FunnelState(step: Int)

  /** Streaming twin of the q107 ordered funnel: per-user state is ONE
    * int (the highest step reached), and each micro-batch advances it
    * through `steps` in (ts, event_id) order, emitting an advance row
    * the moment a user reaches a new step — the live form of the batch
    * query's stacked running-max windows, with identical semantics on
    * in-order arrivals (step k counts at the first step-k event
    * at-or-after the step-(k-1) reach). State is bounded at one int per
    * live user and idle users evict on the processing-time timeout, so
    * an unbounded visitor space stays an O(active users) footprint —
    * the property that makes a funnel monitor run forever. */
  def streamingFunnel(events: Dataset[FunnelEv], steps: Seq[String],
                      idleTimeoutMs: Long = 3600000L,
                      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (user: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var step = state.getOption.map(_.step).getOrElse(0)
            val out = Vector.newBuilder[FunnelAdvance]
            rows.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (step < steps.length && e.event_type == steps(step)) {
                step += 1
                out += FunnelAdvance(user, step, steps(step - 1), e.ts)
              }
            }
            state.update(FunnelState(step))
            if (evict) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
        })
  }

  final case class DiffOut(doc_id: Long, change: String)
  final case class FpState(fp: String)

  /** Windowed data-quality monitor — the streaming twin of
    * [[graft.operators.Expectations.run]]: the declared rule set
    * compiles into ONE watermarked tumbling-window aggregate, and each
    * closed window emits a (window start, rule, metric, passed) report
    * row. State per open window is the partial-agg buffer (rule-count
    * doubles), bounded by the watermark.
    *
    * Rules must use streaming-legal aggregates: completeness /
    * satisfies / min / max compose as-is; uniqueness must ride
    * [[graft.operators.Expectations.uniquenessApprox]] (exact
    * count_distinct is not a streaming aggregate — and is the wrong
    * tier at 100 TB anyway). */
  def streamingExpectations(events: DataFrame, tsCol: String,
                            windowLen: String, watermark: String,
                            checks: Seq[graft.operators.Expectations.Expectation])
      : DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("double").as(s"m$i")
    }
    val row = events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val items = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("rule"), col(s"m$i").as("metric"),
        c.pass(col(s"m$i")).as("passed"))
    }
    row.select(col("window.start").as("ws"), inline(array(items: _*)))
  }

  /** Windowed latency/value percentiles — the ops-SLO dashboard agg
    * (p50/p95/p99 per type per window): one watermarked tumbling-window
    * aggregate whose state per open (window, type) group is the
    * percentile_approx sketch buffer (size set by `accuracy`, NOT by
    * the window's row count — the property that makes percentiles
    * streamable at all; the sketch is exact while n ≤ accuracy). */
  def windowPercentiles(events: DataFrame, windowLen: String,
                        watermark: String,
                        percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
                        accuracy: Int = 10000): DataFrame = {
    val pctCols = percentiles.zipWithIndex.map { case (p, i) =>
      element_at(col("pcts"), i + 1)
        .as("p" + math.round(p * 100).toString)
    }
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(percentile_approx(col("value"),
          array(percentiles.map(lit): _*), lit(accuracy)).as("pcts"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("ws") +: col("event_type") +:
        col("n") +: pctCols: _*)
  }

  /** Windowed PSI drift monitor — the STREAMING twin of the batch
    * drift tier (q95 [[graft.functions.RobustStats.psiDrift]] / q103):
    * per (window, type), the population-stability index of the
    * window's value distribution against a fixed REFERENCE histogram,
    * in the mergeable log₂-bin currency ([[graft.functions
    * .HistSketch]]) rather than q95's reference-quantile bins — the
    * binning a stored streaming sketch can actually be compared in
    * (quantile bins would need the reference corpus at watch time;
    * log₂ bins need only the ≤64-row reference table).
    *
    * `ref` is the bounded baseline: (event_type, b, ref_n) rows as
    * [[graft.functions.HistSketch.logHistogram]] emits (g→event_type)
    * over the reference corpus — broadcast, ≤64 rows per type.
    *
    * ONE stateful aggregation (the windowHistPercentiles 64-slot
    * kernel — state independent of row count, append-safe); the PSI
    * read-out is a narrow fold over the slot array zipped with the
    * type's reference array after a broadcast join. Per-bin terms use
    * the q95 rule, named: a bin empty on EITHER side contributes
    * nothing (ln of a zero ratio is undefined; the count of such
    * one-sided bins is published as `open_bins` so silence is visible
    * rather than hidden). Output per (window-start, type): n_window,
    * psi (rounded 6), open_bins, and the conventional verdict
    * (stable < 0.1 ≤ drifting < 0.25 ≤ shifted). */
  def windowPsiDrift(events: DataFrame, windowLen: String,
                     watermark: String, ref: DataFrame): DataFrame = {
    val slotCols = (0 until 64).map(k =>
      sum(when(col("b") === k, 1L).otherwise(0L)).as(s"c$k"))
    val agged = events.withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .filter(col("vm") > 0)
      .withColumn("b", (length(bin(col("vm"))) - 1).cast("int"))
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(slotCols.head, slotCols.tail: _*)
    val bins = array((0 until 64).map(k => col(s"c$k")): _*)
    // Reference slots pivoted to one literal-length array per type —
    // a bounded broadcast frame, missing bins filled with 0.
    val refArr = ref.groupBy(col("g").as("event_type"))
      .agg((0 until 64).map(k =>
        sum(when(col("b") === k, col("n")).otherwise(0L)).as(s"r$k")).head,
        (1 until 64).map(k =>
          sum(when(col("b") === k, col("n")).otherwise(0L)).as(s"r$k")): _*)
      .select(col("event_type"),
        array((0 until 64).map(k => col(s"r$k")): _*).as("refbins"),
        (0 until 64).map(k => col(s"r$k")).reduce(_ + _).as("ref_total"))
    val nTotal = aggregate(bins, lit(0L), (a, x) => a + x)
    val joined = agged
      .select(col("window").getField("start").as("ws"), col("event_type"),
        bins.as("bins"), nTotal.as("n_window"))
      .join(broadcast(refArr), Seq("event_type"))
    // Fold over the zipped (cur, ref) slot pairs: Σ (cf−rf)·ln(cf/rf)
    // over bins populated on BOTH sides; count one-sided bins.
    val pairs = zip_with(col("bins"), col("refbins"),
      (c, r) => struct(c.as("c"), r.as("r")))
    val cf = (x: org.apache.spark.sql.Column) =>
      x.getField("c").cast("double") / col("n_window").cast("double")
    val rf = (x: org.apache.spark.sql.Column) =>
      x.getField("r").cast("double") / col("ref_total").cast("double")
    val psi = aggregate(pairs, lit(0.0d), (acc, x) =>
      acc + when(x.getField("c") > 0 && x.getField("r") > 0,
        (cf(x) - rf(x)) * log(cf(x) / rf(x))).otherwise(lit(0.0d)))
    val openBins = aggregate(pairs, lit(0), (acc, x) =>
      acc + when((x.getField("c") > 0) =!= (x.getField("r") > 0), 1)
        .otherwise(0))
    joined.select(col("ws"), col("event_type"), col("n_window"),
      round(psi, 6).as("psi"), openBins.as("open_bins"),
      when(psi < 0.1d, "stable").when(psi < 0.25d, "drifting")
        .otherwise("shifted").as("verdict"))
  }

  /** Windowed MERGEABLE histogram percentiles — the streaming twin of
    * [[graft.functions.HistSketch]] and the store-and-re-merge
    * alternative to [[windowPercentiles]]: per (window, type), log₂
    * bin counts of the micro-unit measure as ONE tumbling-window
    * aggregate whose state is the ≤64-slot count map — and because the
    * emitted rows ARE the additive sketch, closed windows can be
    * persisted and re-merged over any later range by plain summation
    * (the batch q125 maintenance property, live). Estimates read off
    * the bins with the same ceil-rank / lower-bound rule, so cut-over
    * between the streaming and batch tiers is value-exact. Output per
    * (window-start, type, p): n_total and est_lo micro-units. */
  def windowHistPercentiles(events: DataFrame, windowLen: String,
                            watermark: String,
                            ps: Seq[(Int, Int)] = Seq((1, 2), (19, 20),
                              (99, 100))): DataFrame = {
    // ONE stateful aggregation (append-mode-safe — chained streaming
    // aggs are not): 64 fixed conditional-count slots per (window,
    // type), the SimHash/CMS fixed-state pattern. State size is the
    // slot vector, independent of the window's row count.
    val slotCols = (0 until 64).map(k =>
      sum(when(col("b") === k, 1L).otherwise(0L)).as(s"c$k"))
    val agged = events.withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .filter(col("vm") > 0)
      .withColumn("b", (length(bin(col("vm"))) - 1).cast("int"))
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(slotCols.head, slotCols.tail: _*)
    val bins = array((0 until 64).map(k => col(s"c$k")): _*)
    val pRows = explode(array(ps.map { case (num, den) =>
      struct(lit(num).as("p_num"), lit(den).as("den")) }: _*))
    // Percentile read-out is a narrow projection fold over the 64-slot
    // literal-length array — no second stateful operator.
    val nTotal = aggregate(bins, lit(0L), (a, x) => a + x)
    agged
      .select(col("window").getField("start").as("ws"), col("event_type"),
        bins.as("bins"), nTotal.as("n_total"), pRows.as("p"))
      // Integer `div` (not double `/`): exact ceil-rank at any n_total,
      // matching HistSketch.percentilesFromHistogram's bit-exact
      // replay contract.
      .withColumn("idx",
        expr("(n_total * p.p_num + (p.den - 1)) div p.den"))
      .withColumn("est_b", aggregate(
        zip_with(col("bins"),
          sequence(lit(0), lit(63)), (n, b) => struct(b.as("b"), n.as("n"))),
        struct(lit(0L).as("cum"), lit(-1).as("sel")),
        (acc, x) => struct(
          (acc.getField("cum") + x.getField("n")).as("cum"),
          when(acc.getField("sel") >= 0, acc.getField("sel"))
            .otherwise(when(acc.getField("cum") + x.getField("n") >= col("idx"),
              x.getField("b")).otherwise(lit(-1))).as("sel")))
        .getField("sel"))
      .select(col("ws"), col("event_type"), col("p.p_num").as("p_num"),
        col("n_total"),
        expr("shiftleft(1L, est_b)").cast("long").as("est_lo"))
  }

  /** Windowed OLS value trend — the live twin of the batch q140
    * regression: per (tumbling window, type), the slope of value over
    * time within the window, from the five exact integer sufficient
    * statistics accumulated as ONE append-safe stateful aggregate
    * (state per group = six numbers, independent of row count; the
    * partials are order-independent, so late in-watermark arrivals
    * cannot change the answer a replay would give). x is the
    * millisecond offset within the window (bounded, so x² stays in
    * BIGINT; value folds in exact micro-units); the slope/intercept
    * chain is the same defined double expression as q140.
    *
    * `winMs` must equal `windowLen` in milliseconds — it anchors each
    * event's x to its own window start without referencing the window
    * struct pre-aggregation. Output: (ws, event_type, n,
    * slope_per_sec, intercept). */
  def windowTrend(events: DataFrame, windowLen: String, winMs: Long,
                  watermark: String): DataFrame = {
    require(winMs > 0, "winMs must be positive")
    val prepared = events.withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        (unix_millis(col("ts")) % winMs).cast("long").as("x"),
        round(col("value") * 1000000.0d, 0).cast("long").as("ym"))
    val agged = prepared
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("ym").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("ym")).cast("decimal(38,0)")).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    agged.select(col("window").getField("start").as("ws"), col("event_type"),
      col("n"),
      // Degenerate windows (n=1, or every event on one distinct ts)
      // have varx=0 — no fittable trend. Publish NULL explicitly
      // instead of the NaN a bare division would emit (NaN rows crash
      // strict downstream sinks and poison re-aggregation).
      // slope in value units per SECOND: micro-units/ms × 1000 / 1e6.
      when(varx =!= 0.0d, round(cov / varx / lit(1000.0d), 6))
        .as("slope_per_sec"),
      when(varx =!= 0.0d,
          round((sy - cov / varx * sx) / n / lit(1000000.0d), 6))
        .as("intercept"))
  }

  final case class AttribEv(user_id: Long, ts: java.sql.Timestamp,
                            event_type: String, value: Double)
  final case class TouchOut(user_id: Long, channel: String, value: Double)
  final case class TouchState(channel: String)

  /** Streaming last-touch attribution — the live twin of
    * [[graft.operators.Transitions.lastTouch]]: per-user state is ONE
    * string (the most recent non-conversion event type), each
    * conversion emits (user, credited channel, value) immediately, and
    * the per-channel rollup is a downstream streaming agg of the
    * caller's choice. Conversions before any touch credit 'none',
    * matching the batch operator. Within a micro-batch rows apply in
    * event-time order. */
  def streamingLastTouch(events: Dataset[AttribEv],
                         convType: String): Dataset[TouchOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[AttribEv],
         state: GroupState[TouchState]) => {
          var ch = state.getOption.map(_.channel).orNull
          val out = rows.toVector.sortBy(_.ts.getTime).flatMap { e =>
            if (e.event_type == convType)
              Some(TouchOut(uid, if (ch == null) "none" else ch, e.value))
            else { ch = e.event_type; None }
          }
          if (ch != null) state.update(TouchState(ch))
          out.iterator
        })
  }

  final case class KmvOut(g: String, kmv_n: Long, kmv_est: Long)
  final case class KmvState(mins: Array[Long])

  /** Streaming KMV distinct estimate per group — the live twin of
    * [[graft.functions.Sketches.kmvDistinct]]: per-key state is the k
    * smallest distinct hashes seen so far (≤ k longs, FIXED memory per
    * group forever — the reason a sketch and not an exact distinct set
    * is the shape that survives an unbounded stream). Each micro-batch
    * folds its rows into the k-min set (the same semilattice merge the
    * batch rollup uses) and emits the group's refreshed estimate, with
    * arithmetic identical to the batch tier so a cut-over between the
    * two is value-exact.
    *
    * Input frame: (g STRING, h LONG) — hash upstream with the portable
    * [[graft.functions.TextFunctions.md5Long]] so batch, stream, and an
    * external replay all see the same values. */
  def streamingKmv(rows: DataFrame, k: Int): Dataset[KmvOut] = {
    import rows.sparkSession.implicits._
    rows.select(col("g").cast("string"), col("h").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (g: String, it: Iterator[(String, Long)],
         state: GroupState[KmvState]) => {
          val prev = state.getOption.map(_.mins).getOrElse(Array.empty[Long])
          // fold the batch in: union, distinct, keep the k smallest
          val merged = (prev ++ it.map(_._2)).distinct.sorted.take(k)
          state.update(KmvState(merged))
          val n = merged.length.toLong
          val est =
            if (n < k) n
            else math.floor((k - 1) * graft.functions.Sketches.HashSpace /
              merged.last).toLong
          Iterator.single(KmvOut(g, n, est))
        })
  }

  /** Streaming twin of [[graft.operators.SnapshotDiff]]: per-key state is
    * the last seen canonical fingerprint; each arriving document emits
    * `added` (first sight), `changed` (fingerprint differs) or
    * `unchanged` — the O(delta) gate that lets a live ingest re-embed /
    * re-dedup only what actually moved. `removed` is structurally
    * unobservable in a stream (absence is not an event); deletions ride
    * the CDC delete path or a periodic batch [[graft.operators
    * .SnapshotDiff.diff]] sweep. State is ONE 32-char fingerprint per
    * live key, idle keys evict on the processing-time timeout; within a
    * batch, rows apply in event-time order so a same-batch rewrite
    * emits added then changed, matching replay order. */
  def streamingSnapshotDiff(docs: DataFrame, tsCol: String, textCol: String,
                            idCol: String, idleTimeoutMs: Long = 3600000L,
                            timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[DiffOut] = {
    import docs.sparkSession.implicits._
    val evict = timeout == GroupStateTimeout.ProcessingTimeTimeout
    docs.select(col(idCol).cast("long"), col(tsCol).cast("timestamp"),
        graft.functions.TextFunctions.fingerprint(col(textCol)))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (id: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[FpState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var prev = state.getOption.map(_.fp)
            val out = rows.toVector.sortBy(_._2.getTime).map { case (_, _, fp) =>
              val change = prev match {
                case None => "added"
                case Some(p) if p != fp => "changed"
                case _ => "unchanged"
              }
              prev = Some(fp)
              DiffOut(id, change)
            }
            state.update(FpState(prev.get))
            if (evict) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
        })
  }
}
