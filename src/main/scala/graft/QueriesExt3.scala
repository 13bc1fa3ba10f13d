package graft

import graft.functions.{Sketches, TextFunctions}
import graft.operators.{Expectations, Transitions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries q109+ — sketch-tier accounting, data-quality
  * verification, corpus routing, and event-sequence analytics. Every
  * entry has a DuckDB oracle replay; see COVERAGE.md for the map. */
object QueriesExt3 {

  // ---------------------------------------------------------------- q109
  /** KMV distinct-user sketch per event type (k=64) next to the exact
    * count — the fixed-memory "DAU by sketch" shape: at 100 TB the
    * exact count shuffles every distinct (type, user) pair, while the
    * sketch exchange carries O(map-partitions × k) rows thanks to the
    * WindowGroupLimit rewrite of the rank filter ([[Sketches]]). The
    * published err_pct is the honest accuracy statement (k=64 ⇒ ~12%
    * RSE) — the query reports BOTH tiers the way q63 reports ANN
    * recall. */
  def q109KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val keyed = ev.select(col("event_type"),
      col("user_id").cast("string").as("user_key"))
    val sketch = Sketches.kmvDistinct(keyed, "event_type", "user_key", 64)
    val exact = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("exact_users"))
    exact.join(sketch, exact("event_type") === sketch("g"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        col("kmv_n"), col("kmv_est"),
        round(abs(col("kmv_est") - col("exact_users")).cast("double") /
          col("exact_users").cast("double"), 6).as("err_pct"))
  }
  val q109Sql: String =
    """WITH h AS (SELECT event_type,
      |        ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |      FROM events),
      |rk AS (SELECT event_type, h,
      |         dense_rank() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |       FROM h),
      |sk AS (SELECT DISTINCT event_type, h FROM rk WHERE rk <= 64),
      |ag AS (SELECT event_type, count(*)::BIGINT AS kmv_n, max(h) AS kth
      |       FROM sk GROUP BY 1),
      |es AS (SELECT event_type, kmv_n,
      |         CASE WHEN kmv_n < 64 THEN kmv_n
      |              ELSE floor(63 * 1152921504606846976.0 / kth)::BIGINT
      |         END AS kmv_est
      |       FROM ag),
      |ex AS (SELECT event_type, count(*)::BIGINT AS n_events,
      |              count(DISTINCT user_id)::BIGINT AS exact_users
      |       FROM events GROUP BY 1)
      |SELECT ex.event_type, n_events, exact_users, kmv_n, kmv_est,
      |       round(abs(kmv_est - exact_users)::DOUBLE / exact_users::DOUBLE, 6)
      |         AS err_pct
      |FROM ex JOIN es ON ex.event_type = es.event_type""".stripMargin

  // ---------------------------------------------------------------- q110
  /** Theta-style pairwise content overlap from KMV sketches alone
    * (k=64), against the exact fingerprint-join answer — the planning
    * tier of q93's duplicate-mass matrix. Three synthetic feeds with
    * known containment (doc_id%2, doc_id%3, all) give overlap at three
    * levels; the sketch pair join touches O(feeds·k) rows where the
    * exact tier joins every distinct fingerprint. */
  def q110KmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
    val feeds = d.filter(col("doc_id") % 2 === 0)
      .select(lit("even").as("feed"), col("fp"))
      .unionByName(d.filter(col("doc_id") % 3 === 0)
        .select(lit("third").as("feed"), col("fp")))
      .unionByName(d.select(lit("all").as("feed"), col("fp")))
    val est = Sketches.kmvPairOverlap(feeds, "feed", "fp", 64)
    val fx = feeds.distinct()
    val exact = fx.as("a").join(fx.as("b"),
        col("a.fp") === col("b.fp") && col("a.feed") < col("b.feed"))
      .groupBy(col("a.feed").as("g1"), col("b.feed").as("g2"))
      .agg(count(lit(1)).as("exact_common"))
    est.join(exact,
        est("g1") === exact("g1") && est("g2") === exact("g2"), "left")
      .select(est("g1").as("feed_a"), est("g2").as("feed_b"),
        col("common_k"), col("est_union"), col("est_common"),
        coalesce(col("exact_common"), lit(0L)).as("exact_common"))
  }
  val q110Sql: String =
    """WITH d AS (SELECT doc_id,
      |        md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      |      FROM documents),
      |feeds AS (
      |  SELECT 'even' AS feed, fp FROM d WHERE doc_id % 2 = 0
      |  UNION ALL SELECT 'third', fp FROM d WHERE doc_id % 3 = 0
      |  UNION ALL SELECT 'all', fp FROM d),
      |h AS (SELECT feed, ('0x' || substring(md5(fp), 1, 15))::BIGINT AS h
      |      FROM feeds),
      |rk AS (SELECT feed, h, dense_rank() OVER (PARTITION BY feed ORDER BY h) AS rk
      |       FROM h),
      |sk AS (SELECT DISTINCT feed, h FROM rk WHERE rk <= 64),
      |gs AS (SELECT DISTINCT feed FROM sk),
      |pr AS (SELECT s.feed AS g1, o.feed AS g2, s.h, 1 AS in_a, 0 AS in_b
      |       FROM sk s JOIN gs o ON s.feed < o.feed
      |       UNION ALL
      |       SELECT o.feed, s.feed, s.h, 0, 1
      |       FROM sk s JOIN gs o ON o.feed < s.feed),
      |mg AS (SELECT g1, g2, h, max(in_a) AS in_a, max(in_b) AS in_b
      |       FROM pr GROUP BY 1, 2, 3),
      |un AS (SELECT g1, g2, h, in_a, in_b,
      |         row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rk
      |       FROM mg),
      |ag AS (SELECT g1, g2, count(*)::BIGINT AS ku, max(h) AS theta,
      |         sum(in_a * in_b)::BIGINT AS common_k
      |       FROM un WHERE rk <= 64 GROUP BY 1, 2),
      |es AS (SELECT g1, g2, common_k, ku,
      |         CASE WHEN ku < 64 THEN ku
      |              ELSE floor(63 * 1152921504606846976.0 / theta)::BIGINT
      |         END AS est_union
      |       FROM ag),
      |fx AS (SELECT DISTINCT feed, fp FROM feeds),
      |exact AS (SELECT a.feed AS g1, b.feed AS g2,
      |            count(*)::BIGINT AS exact_common
      |          FROM fx a JOIN fx b ON a.fp = b.fp AND a.feed < b.feed
      |          GROUP BY 1, 2)
      |SELECT es.g1 AS feed_a, es.g2 AS feed_b, common_k, est_union,
      |       floor(common_k::DOUBLE * est_union::DOUBLE / ku::DOUBLE)::BIGINT
      |         AS est_common,
      |       coalesce(exact_common, 0)::BIGINT AS exact_common
      |FROM es LEFT JOIN exact ON es.g1 = exact.g1 AND es.g2 = exact.g2"""
      .stripMargin

  // ---------------------------------------------------------------- q111
  /** One-pass data-quality verification suite over `orders` (the Deequ
    * shape, [[Expectations]]): six declared rules compile to a single
    * partially-aggregated scan; the report is (rule, metric, passed).
    * `totalprice_under_100k` is a genuinely failing rule (TPC-H orders
    * reach ~500k) so the report demonstrates failure surfacing, not
    * just green rows. */
  def q111Expectations(s: SparkSession, dir: String): DataFrame = {
    import Expectations._
    Expectations.run(Tables.orders(s, dir), Seq(
      Expectation("completeness_o_custkey", completeness(col("o_custkey")),
        m => m >= 1.0d),
      Expectation("uniqueness_o_orderkey", uniqueness(col("o_orderkey")),
        m => m === 1.0d),
      Expectation("min_totalprice_positive",
        min(col("o_totalprice")), m => m > 0.0d),
      Expectation("status_in_domain",
        satisfies(col("o_orderstatus").isin("O", "F", "P")), m => m === 1.0d),
      Expectation("priority_pattern",
        satisfies(col("o_orderpriority").rlike("^[1-5]-")), m => m === 1.0d),
      Expectation("totalprice_under_100k",
        satisfies(col("o_totalprice") <= 100000.0d), m => m === 1.0d)))
  }
  val q111Sql: String =
    """WITH m AS (SELECT
      |  round(avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS m0,
      |  round(count(DISTINCT o_orderkey)::DOUBLE / count(*)::DOUBLE, 6) AS m1,
      |  min(o_totalprice)::DOUBLE AS m2,
      |  round(avg(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END), 6) AS m3,
      |  round(avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END), 6) AS m4,
      |  round(avg(CASE WHEN o_totalprice <= 100000.0 THEN 1.0 ELSE 0.0 END), 6) AS m5
      | FROM orders)
      |SELECT 'completeness_o_custkey' AS rule, m0 AS metric, m0 >= 1.0 AS passed FROM m
      |UNION ALL SELECT 'uniqueness_o_orderkey', m1, m1 = 1.0 FROM m
      |UNION ALL SELECT 'min_totalprice_positive', m2, m2 > 0.0 FROM m
      |UNION ALL SELECT 'status_in_domain', m3, m3 = 1.0 FROM m
      |UNION ALL SELECT 'priority_pattern', m4, m4 = 1.0 FROM m
      |UNION ALL SELECT 'totalprice_under_100k', m5, m5 = 1.0 FROM m"""
      .stripMargin

  // ---------------------------------------------------------------- q112
  /** Code-vs-prose routing signals per document
    * ([[TextFunctions.codeStats]]): symbol density, indented-line
    * fraction, keyword-marker hits, and the dyadic-weighted composite —
    * ONE narrow projection, no shuffle, all codegen'd built-ins. */
  def q112CodeDetect(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.codeStats(col("text")).as("cs"))
      .select(col("doc_id"), col("cs.symbol_frac"), col("cs.indent_frac"),
        col("cs.kw_hits"), col("cs.code_score"), col("cs.is_code"))
  val q112Sql: String =
    """WITH raw AS (SELECT doc_id, text,
      |        round((length(text) - length(translate(text, '{}();=<>[]', '')))::DOUBLE
      |              / greatest(length(text), 1)::DOUBLE, 6) AS symbol_frac,
      |        round(len(list_filter(string_split(text, chr(10)),
      |                x -> substr(x, 1, 2) = '  ' OR substr(x, 1, 1) = chr(9)))::DOUBLE
      |              / greatest(len(string_split(text, chr(10))), 1)::DOUBLE, 6)
      |          AS indent_frac,
      |        (CASE WHEN contains(text, 'def ') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, 'return') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, 'import ') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, '#include') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, 'function') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, 'void ') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, '==') THEN 1 ELSE 0 END
      |         + CASE WHEN contains(text, '&&') THEN 1 ELSE 0 END)::INTEGER
      |          AS kw_hits
      |      FROM documents),
      |sc AS (SELECT doc_id, symbol_frac, indent_frac, kw_hits,
      |         round(symbol_frac * 4.0 + indent_frac * 2.0
      |               + least(kw_hits, 4)::DOUBLE * 0.25, 6) AS code_score
      |       FROM raw)
      |SELECT doc_id, symbol_frac, indent_frac, kw_hits, code_score,
      |       code_score >= 0.8 AS is_code
      |FROM sc""".stripMargin

  // ---------------------------------------------------------------- q113
  /** First-order event-transition matrix ([[Transitions.matrix]]): per
    * (prev event type → next event type), the count and row-normalized
    * probability. One user-key exchange for the lag; the probability
    * window runs over the |types|²-row matrix, never over events. */
  def q113Transitions(s: SparkSession, dir: String): DataFrame =
    Transitions.matrix(Tables.events(s, dir), "user_id",
      Seq(col("ts_ms"), col("event_id")), "event_type")
  val q113Sql: String =
    """WITH o AS (SELECT user_id, event_type,
      |        lag(event_type) OVER
      |          (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |          AS prev_type
      |      FROM events),
      |c AS (SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
      |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |       round(n::DOUBLE / (sum(n) OVER (PARTITION BY prev_type))::DOUBLE, 6)
      |         AS p
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- q114
  /** Sketch ROLLUP: per-(type, day) KMV sketches built once, merged at
    * query time by dropping the day and re-cutting — and the merged
    * estimate equals the direct whole-range estimate EXACTLY, because
    * k-min sets form a semilattice ([[Sketches.sketchFromHashRows]]).
    * This is the pre-aggregated-sketch maintenance pattern at 100 TB:
    * each day's partition is scanned once ever; any date-range distinct
    * count then touches only sketch rows (≤ k per (type, day)). The
    * query publishes both chains and the equality as its own check. */
  def q114SketchRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.select(
      concat_ws("|", col("event_type"),
        expr("ts_ms div 86400000")).as("gday"),
      col("user_id").cast("string").as("uk"))
    val dailySketch = Sketches.kmvSketchRows(daily, "gday", "uk", 64)
    val merged = Sketches.kmvEstimateFromSketch(
      dailySketch.select(substring_index(col("g"), "|", 1).as("g"),
        col("h")), 64)
    val direct = Sketches.kmvDistinct(
      ev.select(col("event_type"), col("user_id").cast("string").as("uk")),
      "event_type", "uk", 64)
    direct.join(merged.select(col("g").as("gm"),
        col("kmv_est").as("est_merged")), col("g") === col("gm"))
      .select(col("g").as("event_type"), col("kmv_est").as("est_direct"),
        col("est_merged"),
        (col("kmv_est") === col("est_merged")).as("identical"))
  }
  val q114Sql: String =
    """WITH h AS (SELECT event_type,
      |        epoch_ms(ts) // 86400000 AS day,
      |        ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |      FROM events),
      |drk AS (SELECT event_type, day, h,
      |          dense_rank() OVER (PARTITION BY event_type, day ORDER BY h) AS rk
      |        FROM h),
      |dsk AS (SELECT DISTINCT event_type, day, h FROM drk WHERE rk <= 64),
      |mrk AS (SELECT event_type, h,
      |          dense_rank() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |        FROM dsk),
      |msk AS (SELECT DISTINCT event_type, h FROM mrk WHERE rk <= 64),
      |mag AS (SELECT event_type, count(*)::BIGINT AS n, max(h) AS kth
      |        FROM msk GROUP BY 1),
      |mes AS (SELECT event_type,
      |          CASE WHEN n < 64 THEN n
      |               ELSE floor(63 * 1152921504606846976.0 / kth)::BIGINT
      |          END AS est_merged
      |        FROM mag),
      |rrk AS (SELECT event_type, h,
      |          dense_rank() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |        FROM h),
      |rsk AS (SELECT DISTINCT event_type, h FROM rrk WHERE rk <= 64),
      |rag AS (SELECT event_type, count(*)::BIGINT AS n, max(h) AS kth
      |        FROM rsk GROUP BY 1),
      |res AS (SELECT event_type,
      |          CASE WHEN n < 64 THEN n
      |               ELSE floor(63 * 1152921504606846976.0 / kth)::BIGINT
      |          END AS est_direct
      |        FROM rag)
      |SELECT res.event_type, est_direct, est_merged,
      |       est_direct = est_merged AS identical
      |FROM res JOIN mes ON res.event_type = mes.event_type""".stripMargin

  // ---------------------------------------------------------------- q115
  /** Last-touch purchase attribution ([[Transitions.lastTouch]]): every
    * purchase credits the user's most recent preceding non-purchase
    * event type; conversions and value roll up per channel. One user
    * exchange, no join-back; first-event purchases land in 'none'
    * instead of silently vanishing. */
  def q115Attribution(s: SparkSession, dir: String): DataFrame =
    Transitions.lastTouch(Tables.events(s, dir), "user_id",
      Seq(col("ts_ms"), col("event_id")), "event_type", "value", "purchase")
  val q115Sql: String =
    """WITH t AS (SELECT user_id, event_type, "value",
      |        last_value(CASE WHEN event_type <> 'purchase'
      |                        THEN event_type END IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |          AS channel
      |      FROM events)
      |SELECT coalesce(channel, 'none') AS channel,
      |       count(*)::BIGINT AS n_conversions,
      |       round(sum("value"), 2) AS total_value
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Weighted without-replacement sampling, 5 docs per source,
    * probability ∝ n_chars ([[Mixture.weightedSamplePerGroup]] —
    * Efraimidis–Spirakis exponential keys on the deterministic md5
    * uniform). One narrow map + a WindowGroupLimit top-k per group;
    * re-run- and partitioning-identical, externally replayable. */
  def q116WeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.functions.Mixture.weightedSamplePerGroup(
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars")),
      "source", "doc_id", col("n_chars"), 5)
  val q116Sql: String =
    """WITH t AS (SELECT source, doc_id, n_chars,
      |        -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
      |            / 1152921504606846976.0) / n_chars::DOUBLE AS es_key
      |      FROM documents WHERE n_chars IS NOT NULL AND n_chars::DOUBLE > 0.0),
      |r AS (SELECT source, doc_id, n_chars, es_key,
      |        row_number() OVER (PARTITION BY source ORDER BY es_key, doc_id)
      |          AS rk
      |      FROM t)
      |SELECT source, doc_id, n_chars, round(es_key, 6) AS es_key
      |FROM r WHERE rk <= 5""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Rolling 7-day distinct users per day from MERGED daily KMV
    * sketches — the query the rollup pattern (q114) exists for:
    * trailing-window distinct counts cannot be windowed exactly
    * (distinct doesn't sum), so the exact tier re-scans 7 days of data
    * per day; the sketch tier range-joins ≤ 64 sketch rows per day into
    * each target window and re-cuts. The exact count is published next
    * to the estimate as the eval baseline (the brute-force-ANN
    * convention) — at 100 TB only the sketch tier survives. */
  def q117RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val byDay = ev.select(expr("ts_ms div 86400000").as("day"),
      col("user_id").cast("string").as("uk"))
    val daily = Sketches.kmvSketchRows(byDay, "day", "uk", 64) // (g=day, h)
    val days = byDay.select(col("day").as("d")).distinct()
    val rolled = Sketches.kmvEstimateFromSketch(
      daily.join(broadcast(days), col("d").between(col("g"), col("g") + 6))
        .select(col("d").as("g"), col("h")), 64)
    val exact = byDay.distinct()
      .join(broadcast(days), col("day").between(col("d") - 6, col("d")))
      .groupBy(col("d"))
      .agg(count_distinct(col("uk")).as("exact_users"))
    exact.join(rolled, col("d") === col("g"))
      .select(col("d").as("day"), col("exact_users"),
        col("kmv_est").as("est_users"),
        round(abs(col("kmv_est") - col("exact_users")).cast("double") /
          col("exact_users").cast("double"), 6).as("err_pct"))
  }
  val q117Sql: String =
    """WITH b AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
      |        CAST(user_id AS VARCHAR) AS uk
      |      FROM events),
      |h AS (SELECT day, ('0x' || substring(md5(uk), 1, 15))::BIGINT AS h
      |      FROM b),
      |drk AS (SELECT day, h,
      |          dense_rank() OVER (PARTITION BY day ORDER BY h) AS rk
      |        FROM h),
      |dsk AS (SELECT DISTINCT day, h FROM drk WHERE rk <= 64),
      |days AS (SELECT DISTINCT day AS d FROM b),
      |win AS (SELECT days.d, dsk.h
      |        FROM dsk JOIN days ON days.d BETWEEN dsk.day AND dsk.day + 6),
      |wrk AS (SELECT d, h, dense_rank() OVER (PARTITION BY d ORDER BY h) AS rk
      |        FROM win),
      |wsk AS (SELECT DISTINCT d, h FROM wrk WHERE rk <= 64),
      |wag AS (SELECT d, count(*)::BIGINT AS n, max(h) AS kth
      |        FROM wsk GROUP BY 1),
      |est AS (SELECT d, CASE WHEN n < 64 THEN n
      |                 ELSE floor(63 * 1152921504606846976.0 / kth)::BIGINT
      |            END AS est_users
      |        FROM wag),
      |ex AS (SELECT days.d, count(DISTINCT b.uk)::BIGINT AS exact_users
      |       FROM b JOIN days ON b.day BETWEEN days.d - 6 AND days.d
      |       GROUP BY 1)
      |SELECT ex.d AS day, exact_users, est_users,
      |       round(abs(est_users - exact_users)::DOUBLE / exact_users::DOUBLE, 6)
      |         AS err_pct
      |FROM ex JOIN est ON ex.d = est.d""".stripMargin

  // ---------------------------------------------------------------- q118
  /** Tokenizer fertility per language: chars-per-token and token share —
    * the statistic that decides whether a vocabulary serves each
    * language fairly (high chars/token = the tokenizer fragments that
    * language). Integer sums only (exact at any partitioning); one
    * narrow map + one ≤|langs|-row aggregate; the share window runs
    * over the language frame. */
  def q118CharsPerToken(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir).select(col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
      length(col("text")).cast("long").as("nc"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"),
        sum(col("nc")).as("chars"))
      .withColumn("chars_per_token",
        round(col("chars").cast("double") / col("tokens").cast("double"), 6))
      .withColumn("token_share",
        round(col("tokens").cast("double") /
          sum(col("tokens")).over(graft.functions.BoundedWindow.all(col("lang")))
            .cast("double"), 6))
  }
  val q118Sql: String =
    s"""WITH t AS (SELECT lang, len($toksSqlDocs)::BIGINT AS nt,
       |        length(text)::BIGINT AS nc
       |      FROM documents),
       |g AS (SELECT lang, count(*)::BIGINT AS n_docs,
       |        sum(nt)::BIGINT AS tokens, sum(nc)::BIGINT AS chars
       |      FROM t GROUP BY 1)
       |SELECT lang, n_docs, tokens, chars,
       |       round(chars::DOUBLE / tokens::DOUBLE, 6) AS chars_per_token,
       |       round(tokens::DOUBLE / (sum(tokens) OVER ())::DOUBLE, 6)
       |         AS token_share
       |FROM g""".stripMargin
  private def toksSqlDocs = QueriesExt.toksSql

  // ---------------------------------------------------------------- q119
  /** Image near-dup via perceptual dHash over REAL decoded pixels
    * ([[graft.functions.Multimodal.dhash64]]): every doc pair (2k, 2k+1)
    * renders the SAME seed at two resolutions (18×16 and 36×32
    * block PNGs); the integer-exact 9×8 difference hash is provably
    * rescale-invariant for block-aligned grids, so the twins meet in a
    * HASH EQUI-JOIN — the dedup shape that never compares image pairs
    * all-to-all. The oracle predicts the pair set arithmetically
    * (same-seed ⇔ same hash); the decode itself is real JDK imageio. */
  def q119ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Multimodal
    val d = Tables.documents(s, dir).select(col("doc_id"))
    val cell = when(col("doc_id") % 2 === 0, lit(2)).otherwise(lit(4))
    val hashed = d.select(col("doc_id"),
      Multimodal.dhash64(Multimodal.synthBlockPng(cell, cell,
        expr("doc_id div 2"))).as("dh"))
    hashed.as("a").join(hashed.as("b"),
        col("a.dh") === col("b.dh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }
  val q119Sql: String =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM documents a JOIN documents b
      |  ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id"""
      .stripMargin

  // ---------------------------------------------------------------- q120
  /** Entity resolution (record linkage) over `customer`: every 7th
    * customer gets a planted dirty copy (last name-char corrupted, plus
    * case/punctuation noise that canonicalization must absorb).
    * FIELD-AWARE blocking, the production record-linkage shape: the
    * stable discriminating fields (integer-cents balance + segment)
    * form the blocking key — one hash EQUI-join, with a hot-block
    * valve — and exact levenshtein ≤ 2 verifies only the noisy field
    * (normalized name) within each block. Gram-blocking the whole
    * serialized record (the q75 kernel) is the right tool for
    * UNSTRUCTURED strings but explodes candidates on templated records
    * like these (measured 174 s at sf0.1 vs ~1 s here); structured
    * records should block on structure. The `planted` flag makes
    * precision visible in the result itself. */
  def q120EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val block = concat_ws("|",
      round(col("c_acctbal") * 100).cast("long").cast("string"),
      col("c_mktsegment"))
    def norm(name: org.apache.spark.sql.Column) =
      regexp_replace(lower(name), "[^a-z0-9 ]", "")
    val clean = c.select(col("c_custkey").as("id"),
      norm(col("c_name")).as("nm"), block.as("blk"))
    val dirty = c.filter(col("c_custkey") % 7 === 0)
      .select((col("c_custkey") + 1000000L).as("id"),
        norm(upper(concat(substring(col("c_name"), lit(1),
          length(col("c_name")) - 1), lit("x~")))).as("nm"), block.as("blk"))
    val u = clean.unionByName(dirty)
    // Hot-block valve: a pathological blocking value must not expand
    // n_b² pairs — same role as the q75 gram cap, bounded state.
    val keep = u.groupBy(col("blk")).agg(count(lit(1)).as("f"))
      .filter(col("f") <= 100).select(col("blk"))
    val b = u.join(keep, "blk")
    b.as("a").join(b.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("dist"))
      .filter(col("dist") <= 2)
      .select(col("id_a"), col("id_b"), col("dist"),
        (col("id_b") - col("id_a") === 1000000L).as("planted"))
  }
  val q120Sql: String =
    """WITH c AS (SELECT c_custkey, c_name,
      |        round(c_acctbal * 100)::BIGINT::VARCHAR || '|' || c_mktsegment
      |          AS blk
      |      FROM customer),
      |u AS (SELECT c_custkey AS id,
      |        regexp_replace(lower(c_name), '[^a-z0-9 ]', '', 'g') AS nm, blk
      |      FROM c
      |      UNION ALL
      |      SELECT c_custkey + 1000000,
      |        regexp_replace(lower(
      |          upper(substring(c_name, 1, length(c_name) - 1) || 'x~')),
      |          '[^a-z0-9 ]', '', 'g'),
      |        blk
      |      FROM c WHERE c_custkey % 7 = 0),
      |keep AS (SELECT blk FROM (SELECT blk, count(*) AS f FROM u GROUP BY blk)
      |         WHERE f <= 100),
      |bl AS (SELECT u.* FROM u JOIN keep USING (blk))
      |SELECT a.id AS id_a, b.id AS id_b,
      |       CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist,
      |       b.id - a.id = 1000000 AS planted
      |FROM bl a JOIN bl b ON a.blk = b.blk AND a.id < b.id
      |WHERE levenshtein(a.nm, b.nm) <= 2""".stripMargin

  // ---------------------------------------------------------------- q121
  /** Spearman rank correlation between document length (tokens) and
    * type-token ratio (lexical diversity) — the filter-design
    * meta-analytic ("is my diversity signal just a length proxy?"; TTR
    * falls with length, so ρ comes out strongly negative). Spearman on
    * row_number ranks (doc_id tie-break — deterministic where
    * average-rank tie handling is engine-varied) makes the whole
    * statistic EXACT integer algebra: ρ = 1 − 6·Σd²/(n(n²−1)), one
    * division at the end. Corpus-level ranks run through
    * [[graft.functions.PrefixScan]]'s two-pass partition-prefix rank —
    * an unpartitioned `row_number` window would funnel every document
    * through ONE task at 100 TB; the grouped-percentile path (q103) is
    * the per-feed alternative. */
  def q121Spearman(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PrefixScan
    val m = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("nt"),
        round(size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")), lit(1)).cast("double"), 6).as("ttr"))
    val ranked = PrefixScan.scan(
      PrefixScan.scan(m, col("nt"), Seq(col("nt"), col("doc_id")),
        Seq(PrefixScan.RowNumber("r1")), cache = true),
      col("ttr"), Seq(col("ttr"), col("doc_id")),
      Seq(PrefixScan.RowNumber("r2")), cache = true)
    ranked.agg(count(lit(1)).as("n"),
        sum((col("r1") - col("r2")) * (col("r1") - col("r2"))).as("d2"))
      .select(col("n"),
        round(lit(1.0d) - lit(6.0d) * col("d2").cast("double") /
          (col("n") * (col("n") * col("n") - 1)).cast("double"), 6).as("rho"))
  }
  val q121Sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSqlDocs AS toks FROM documents),
       |m AS (SELECT doc_id, len(toks)::BIGINT AS nt,
       |        round(len(list_distinct(toks))::DOUBLE /
       |              greatest(len(toks), 1)::DOUBLE, 6) AS ttr
       |      FROM t),
       |r AS (SELECT doc_id,
       |        row_number() OVER (ORDER BY nt, doc_id) AS r1,
       |        row_number() OVER (ORDER BY ttr, doc_id) AS r2
       |      FROM m),
       |a AS (SELECT count(*)::BIGINT AS n,
       |        sum((r1 - r2) * (r1 - r2))::BIGINT AS d2 FROM r)
       |SELECT n, round(1.0 - 6.0 * d2::DOUBLE / (n * (n * n - 1))::DOUBLE, 6)
       |         AS rho
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- q122
  /** Incremental aggregate-table maintenance
    * ([[graft.operators.MergeOps.additiveMerge]]): a per-(type, day)
    * count/value rollup maintained across three ingest batches (events
    * split by event_id mod 3) equals the direct whole-table aggregate
    * EXACTLY — counters are counts and integer micro-unit value sums,
    * so the fold is order-independent where double sums would not be.
    * This is the materialized-rollup pattern: history is never
    * rescanned, each batch folds one partial-agg frame in. */
  def q122RollupMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeOps
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("ts_ms div 86400000").as("day"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
      col("event_id"))
    val keys = Seq("event_type", "day")
    val batches = (0 to 2).map(i =>
      ev.filter(col("event_id") % 3 === i)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("vm")))
    val maintained = batches.tail.foldLeft(batches.head)(
      MergeOps.additiveMerge(_, _, keys, Seq("n", "vm")))
    maintained.select(col("event_type"), col("day"), col("n"),
      round(col("vm").cast("double") / 1000000.0d, 2).as("sum_value"))
  }
  val q122Sql: String =
    """SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |       count(*)::BIGINT AS n,
      |       round(sum(round("value" * 1000000.0)::BIGINT)::DOUBLE
      |             / 1000000.0, 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q123
  /** Per-source data-quality report ([[Expectations.runGrouped]]):
    * q111's suite philosophy at the feed grain — which SOURCE violates
    * which rule, in one grouped aggregation (a per-source loop would
    * re-scan the corpus per source). Rules: text completeness, declared
    * n_chars consistency with the actual text length, minimum document
    * length, and a length-sanity ceiling. */
  def q123SourceExpectations(s: SparkSession, dir: String): DataFrame = {
    import Expectations._
    Expectations.runGrouped(Tables.documents(s, dir), "source", Seq(
      Expectation("text_complete", completeness(col("text")),
        m => m >= 1.0d),
      Expectation("n_chars_consistent",
        satisfies(col("n_chars") === length(col("text"))), m => m === 1.0d),
      Expectation("min_len_ge_10", min(length(col("text"))), m => m >= 10.0d),
      Expectation("max_len_under_100k", max(length(col("text"))),
        m => m <= 100000.0d)))
  }
  val q123Sql: String =
    """WITH m AS (SELECT source,
      |  round(avg(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS m0,
      |  round(avg(CASE WHEN n_chars = length(text) THEN 1.0 ELSE 0.0 END), 6) AS m1,
      |  min(length(text))::DOUBLE AS m2,
      |  max(length(text))::DOUBLE AS m3
      | FROM documents GROUP BY source)
      |SELECT source, 'text_complete' AS rule, m0 AS metric, m0 >= 1.0 AS passed FROM m
      |UNION ALL SELECT source, 'n_chars_consistent', m1, m1 = 1.0 FROM m
      |UNION ALL SELECT source, 'min_len_ge_10', m2, m2 >= 10.0 FROM m
      |UNION ALL SELECT source, 'max_len_under_100k', m3, m3 <= 100000.0 FROM m"""
      .stripMargin

  // ------------------------------------------------------------ registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_kmv_distinct" -> (q109KmvDistinct _),
    "q110_kmv_overlap" -> (q110KmvOverlap _),
    "q111_expectations" -> (q111Expectations _),
    "q112_code_detect" -> (q112CodeDetect _),
    "q113_transitions" -> (q113Transitions _),
    "q114_sketch_rollup" -> (q114SketchRollup _),
    "q115_attribution" -> (q115Attribution _),
    "q116_weighted_sample" -> (q116WeightedSample _),
    "q117_rolling_distinct" -> (q117RollingDistinct _),
    "q118_chars_per_token" -> (q118CharsPerToken _),
    "q119_image_near_dup" -> (q119ImageNearDup _),
    "q120_entity_resolution" -> (q120EntityResolution _),
    "q121_spearman" -> (q121Spearman _),
    "q122_rollup_maintain" -> (q122RollupMaintain _),
    "q123_source_expectations" -> (q123SourceExpectations _)
  )

  val oracles: Map[String, String] = Map(
    "q109_kmv_distinct" -> q109Sql,
    "q110_kmv_overlap" -> q110Sql,
    "q111_expectations" -> q111Sql,
    "q112_code_detect" -> q112Sql,
    "q113_transitions" -> q113Sql,
    "q114_sketch_rollup" -> q114Sql,
    "q115_attribution" -> q115Sql,
    "q116_weighted_sample" -> q116Sql,
    "q117_rolling_distinct" -> q117Sql,
    "q118_chars_per_token" -> q118Sql,
    "q119_image_near_dup" -> q119Sql,
    "q120_entity_resolution" -> q120Sql,
    "q121_spearman" -> q121Sql,
    "q122_rollup_maintain" -> q122Sql,
    "q123_source_expectations" -> q123Sql
  )
}
