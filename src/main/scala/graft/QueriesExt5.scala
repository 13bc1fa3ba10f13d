package graft

import graft.functions.{BoundedWindow, PrefixScan, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries q198+ — distributional statistics on the scale-safe
  * prefix-scan machinery ([[graft.functions.PrefixScan]]): every global
  * or per-group ordered scan here runs as the two-pass partition-prefix
  * form, never an unpartitioned (or whole-group single-task) window.
  * Every entry has a DuckDB oracle replay; see COVERAGE.md. */
object QueriesExt5 {

  // ---------------------------------------------------------------- q198
  /** Lorenz curve by user decile: users ranked ascending by purchase
    * value, split into ten equal-count bins, each publishing its value
    * share and the cumulative share — the chart behind q168's Gini and
    * q178's top-N shares (Gini is twice the area above this curve; the
    * deciles are what the dashboard actually draws). Exact: micro-unit
    * integer sums; the global rank is [[PrefixScan]]'s two-pass form;
    * decile = ((rk−1)·10) div n (integer, replayable); the cumulative
    * share divides exact integer cumsums over the 10-row decile frame
    * ([[BoundedWindow]]). */
  def q198LorenzCurve(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("x"))
    val nt = perUser.agg(count(lit(1)).as("n"), sum(col("x")).as("tot"))
    val ranked = PrefixScan.scan(perUser, col("x"),
        Seq(col("x").asc, col("user_id").asc),
        Seq(PrefixScan.RowNumber("rk")), cache = true)
      .crossJoin(broadcast(nt))
      .withColumn("decile", expr("((rk - 1) * 10) div n + 1").cast("int"))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("dx"),
        max(col("tot")).as("tot"))
      .withColumn("cumx", sum(col("dx")).over(
        BoundedWindow.orderBy(col("decile"), col("decile"))
          .rowsBetween(Long.MinValue, 0)))
      .select(col("decile"), col("n_users"),
        round(col("dx").cast("double") / col("tot").cast("double"), 6)
          .as("value_share"),
        round(col("cumx").cast("double") / col("tot").cast("double"), 6)
          .as("cum_share"))
  }
  val q198Sql: String =
    """WITH pu AS (SELECT user_id,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS x
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |r AS (SELECT x,
      |        row_number() OVER (ORDER BY x, user_id) AS rk,
      |        count(*) OVER () AS n, sum(x) OVER () AS tot
      |      FROM pu),
      |d AS (SELECT (((rk - 1) * 10) // n + 1)::INT AS decile, x, tot
      |      FROM r),
      |g AS (SELECT decile, count(*)::BIGINT AS n_users,
      |        sum(x)::BIGINT AS dx, max(tot)::BIGINT AS tot
      |      FROM d GROUP BY 1)
      |SELECT decile, n_users,
      |       round(dx::DOUBLE / tot::DOUBLE, 6) AS value_share,
      |       round((sum(dx) OVER (ORDER BY decile
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
      |         / tot::DOUBLE, 6) AS cum_share
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q199
  /** Per-type two-sample KS drift — q167's binning-free distribution
    * test, run PER EVENT TYPE (the feed-level drilldown: "which event
    * stream moved?"): first vs second half of the period, D = max
    * |ECDF₁ − ECDF₂| at the type's distinct micro-unit values with
    * ties fully counted — the shared [[graft.functions.Ks]] grouped
    * kernel ([[PrefixScan.scanGrouped]] running counts: a
    * `partitionBy(event_type)` window would push each type's whole
    * distinct-value frame through one task; the totals are a
    * ≤|types|-row broadcast). Same α = 0.01 critical constant 1.628 as
    * q167. */
  def q199KsByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val mid = ev.agg(((min(col("ts_ms")) + max(col("ts_ms"))) / 2)
      .cast("long").as("mid"))
    val perValue = ev.crossJoin(broadcast(mid))
      .select(col("event_type"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
        when(col("ts_ms") < col("mid"), 1L).otherwise(0L).as("s1"),
        when(col("ts_ms") >= col("mid"), 1L).otherwise(0L).as("s2"))
      .groupBy(col("event_type"), col("vm"))
      .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
    val crit = round(lit(1.628d) *
      sqrt((col("n1") + col("n2")).cast("double") /
        (col("n1") * col("n2")).cast("double")), 6)
    val ksd = round(col("d_stat"), 6)
    graft.functions.Ks.twoSampleDGrouped(perValue, "event_type", col("vm"))
      .select(col("event_type"), col("n1"), col("n2"), ksd.as("ks_d"),
        crit.as("crit_01"), (ksd > crit).as("shifted"))
  }
  val q199Sql: String =
    """WITH mid AS (SELECT ((min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2)
      |          AS mid FROM events),
      |s AS (SELECT event_type, round("value" * 1000000.0)::BIGINT AS vm,
      |        CASE WHEN epoch_ms(ts) < mid THEN 1 ELSE 0 END AS s1,
      |        CASE WHEN epoch_ms(ts) >= mid THEN 1 ELSE 0 END AS s2
      |      FROM events, mid),
      |pv AS (SELECT event_type, vm, sum(s1)::BIGINT AS c1,
      |         sum(s2)::BIGINT AS c2
      |       FROM s GROUP BY 1, 2),
      |cdf AS (SELECT event_type,
      |          sum(c1) OVER (PARTITION BY event_type ORDER BY vm
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |          sum(c2) OVER (PARTITION BY event_type ORDER BY vm
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
      |          sum(c1) OVER (PARTITION BY event_type) AS n1,
      |          sum(c2) OVER (PARTITION BY event_type) AS n2
      |        FROM pv)
      |SELECT event_type, max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
      |       round(max(abs(cum1::DOUBLE / n1::DOUBLE
      |             - cum2::DOUBLE / n2::DOUBLE)), 6) AS ks_d,
      |       round(1.628 * sqrt((max(n1) + max(n2))::DOUBLE
      |             / (max(n1) * max(n2))::DOUBLE), 6) AS crit_01,
      |       round(max(abs(cum1::DOUBLE / n1::DOUBLE
      |             - cum2::DOUBLE / n2::DOUBLE)), 6)
      |         > round(1.628 * sqrt((max(n1) + max(n2))::DOUBLE
      |               / (max(n1) * max(n2))::DOUBLE), 6) AS shifted
      |FROM cdf GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q200
  /** TOKEN-WEIGHTED quality quartiles per source — the distributional
    * sequel to q195's weighted-mean check: the median the corpus
    * report should quote is the quality of the median TOKEN, not the
    * median document (a feed of many short clean docs and a few long
    * dirty ones has a high doc median and a low token median). Exact
    * integer discipline: per (source, micro-quality) token-weight
    * sums, per-source cumulative weights via
    * [[PrefixScan.scanGrouped]], weighted p = the FIRST quality value
    * whose cumulative weight reaches ⌈p·W⌉ (cumw·den ≥ num·W in
    * integers — no division anywhere until the final read-out). */
  def q200WeightedQuality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
      round(TextFunctions.qualityScore(col("text")) * 1000000.0d, 0)
        .cast("long").as("qm"))
    val w = d.groupBy(col("source"), col("qm"))
      .agg(sum(col("nt")).as("sw"))
    val totw = w.groupBy(col("source")).agg(sum(col("sw")).as("totw"))
    val c = PrefixScan.scanGrouped(w, "source", col("qm"), Seq(col("qm")),
        Seq(PrefixScan.RunSum(col("sw"), "cumw")), cache = true)
      .join(broadcast(totw), Seq("source"))
    c.groupBy(col("source"))
      .agg(max(col("totw")).as("tokens"),
        round(min(when(col("cumw") * 4 >= col("totw"), col("qm")))
          .cast("double") / 1000000.0d, 6).as("wq25"),
        round(min(when(col("cumw") * 2 >= col("totw"), col("qm")))
          .cast("double") / 1000000.0d, 6).as("wq50"),
        round(min(when(col("cumw") * 4 >= col("totw") * 3, col("qm")))
          .cast("double") / 1000000.0d, 6).as("wq75"))
  }
  val q200Sql: String = {
    val anyStop = TextFunctions.stopwords.values.flatten
      .toSeq.distinct.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT source, text, ${QueriesExt.toksSql} AS toks
       |           FROM documents),
       |m AS (SELECT source, len(toks)::BIGINT AS nt,
       |        (length(text) - length(regexp_replace(text, '[[:punct:]]',
       |           '', 'g')))::DOUBLE / greatest(length(text), 1) AS pr,
       |        len(list_intersect(list_distinct(toks), [$anyStop]))::DOUBLE /
       |          greatest(len(toks), 1) AS sr
       |      FROM t),
       |d AS (SELECT source, nt,
       |        round(round(least(nt / 64.0, 1.0) * 0.4 +
       |              (1.0 - least(pr * 4.0, 1.0)) * 0.3 +
       |              least(sr * 4.0, 1.0) * 0.3, 6) * 1000000.0)::BIGINT
       |          AS qm
       |      FROM m),
       |w AS (SELECT source, qm, sum(nt)::BIGINT AS sw FROM d GROUP BY 1, 2),
       |c AS (SELECT source, qm,
       |        sum(sw) OVER (PARTITION BY source ORDER BY qm
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
       |        sum(sw) OVER (PARTITION BY source) AS totw
       |      FROM w)
       |SELECT source, max(totw)::BIGINT AS tokens,
       |       round(min(CASE WHEN cumw * 4 >= totw THEN qm END)::DOUBLE
       |             / 1000000.0, 6) AS wq25,
       |       round(min(CASE WHEN cumw * 2 >= totw THEN qm END)::DOUBLE
       |             / 1000000.0, 6) AS wq50,
       |       round(min(CASE WHEN cumw * 4 >= totw * 3 THEN qm END)::DOUBLE
       |             / 1000000.0, 6) AS wq75
       |FROM c GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q201
  /** Mann–Whitney U (rank-sum) test: do WEEKEND purchases draw from a
    * different value distribution than weekday ones? The
    * non-parametric complement of q192's Welch t (t compares means; U
    * detects any stochastic dominance) with ties handled exactly: at
    * each distinct micro-unit value, every tied observation takes the
    * average rank of the tie span. All sufficient statistics come from
    * per-value counts — 2·avg-rank = 2·(rank before the span) + span
    * + 1, doubled throughout so everything stays integer — and the
    * cumulative count is one [[PrefixScan]] pass over the pooled
    * distinct values; the tie-corrected normal z uses the classic
    * σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1))). Weekend = epoch-day
    * mod 7 ∈ {2, 3} (day 0 = Thu 1970-01-01). */
  def q201MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val perValue = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
        (expr("ts_ms div 86400000") % 7).isin(2, 3).as("wkend"))
      .groupBy(col("vm"))
      .agg(sum(when(!col("wkend"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("wkend"), 1L).otherwise(0L)).as("c2"))
      .withColumn("cnt", col("c1") + col("c2"))
    val scanned = PrefixScan.scan(perValue, col("vm"), Seq(col("vm")),
      Seq(PrefixScan.RunSum(col("cnt"), "cumall")), cache = true)
    val stats = scanned
      // 2·(average rank of this value's tie span) — integer by the ×2.
      .withColumn("ravg2",
        lit(2L) * (col("cumall") - col("cnt")) + col("cnt") + 1L)
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        // decimal BEFORE the products: c1·ravg2 ≤ 2n² and cnt³ overflow
        // a long at ~10⁹-row ties, exactly the 100 TB regime.
        sum(col("c1").cast("decimal(38,0)") * col("ravg2")).as("r1x2"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
          - col("cnt")).as("ties"))
    val n = (col("n1") + col("n2")).cast("double")
    val u1 = col("r1x2").cast("double") / 2.0d -
      col("n1").cast("double") * (col("n1") + 1).cast("double") / 2.0d
    val mu = col("n1").cast("double") * col("n2").cast("double") / 2.0d
    val sig = sqrt(col("n1").cast("double") * col("n2").cast("double") /
      12.0d * ((n + 1.0d) - col("ties").cast("double") /
        (n * (n - 1.0d))))
    val z = round((u1 - mu) / sig, 4)
    stats.select(col("n1"), col("n2"), round(u1, 1).as("u"),
      z.as("z"), (abs(z) > 2.576d).as("significant_01"))
  }
  val q201Sql: String =
    """WITH p AS (SELECT round("value" * 1000000.0)::BIGINT AS vm,
      |        (epoch_ms(ts) // 86400000) % 7 IN (2, 3) AS wkend
      |      FROM events WHERE event_type = 'purchase'),
      |pv AS (SELECT vm,
      |         sum(CASE WHEN wkend THEN 0 ELSE 1 END)::BIGINT AS c1,
      |         sum(CASE WHEN wkend THEN 1 ELSE 0 END)::BIGINT AS c2,
      |         count(*)::BIGINT AS cnt
      |       FROM p GROUP BY 1),
      |c AS (SELECT c1, c2, cnt,
      |        sum(cnt) OVER (ORDER BY vm
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall
      |      FROM pv),
      |a AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
      |        sum(c1::HUGEINT * (2 * (cumall - cnt) + cnt + 1))::HUGEINT
      |          AS r1x2,
      |        sum((cnt::HUGEINT * cnt * cnt - cnt))::HUGEINT AS ties
      |      FROM c)
      |SELECT n1, n2,
      |       round(r1x2::DOUBLE / 2.0 - n1::DOUBLE * (n1 + 1)::DOUBLE / 2.0,
      |         1) AS u,
      |       round((r1x2::DOUBLE / 2.0 - n1::DOUBLE * (n1 + 1)::DOUBLE / 2.0
      |           - n1::DOUBLE * n2::DOUBLE / 2.0)
      |         / sqrt(n1::DOUBLE * n2::DOUBLE / 12.0
      |           * (((n1 + n2)::DOUBLE + 1.0) - ties::DOUBLE
      |             / ((n1 + n2)::DOUBLE * ((n1 + n2)::DOUBLE - 1.0)))), 4)
      |         AS z,
      |       abs(round((r1x2::DOUBLE / 2.0 - n1::DOUBLE * (n1 + 1)::DOUBLE / 2.0
      |           - n1::DOUBLE * n2::DOUBLE / 2.0)
      |         / sqrt(n1::DOUBLE * n2::DOUBLE / 12.0
      |           * (((n1 + n2)::DOUBLE + 1.0) - ties::DOUBLE
      |             / ((n1 + n2)::DOUBLE * ((n1 + n2)::DOUBLE - 1.0)))), 4))
      |         > 2.576 AS significant_01
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- q202
  /** Zipf-law fit of the term-frequency spectrum: ln(count) regressed
    * on ln(rank) over the top-1000 terms — natural language sits near
    * slope −1; a corpus whose slope is far off (template spam, boiler-
    * plate floods, synthetic filler) fails the sniff before any model
    * sees it. Composes the q90 head-cut (distributed TakeOrdered —
    * the vocabulary itself is Heaps-law data-scaled, the top-K is
    * bounded) with the q148 log-log OLS over the bounded frame; r²
    * says how Zipf-like the fit actually is. */
  def q202ZipfFit(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("term").asc).limit(1000)
    val pts = top.withColumn("rk", row_number().over(
        graft.functions.BoundedWindow.orderBy(col("term"),
          col("cnt").desc, col("term").asc)))
      .select(col("rk"), col("cnt"))
    // Deterministic left-to-right fold over the rank-sorted top-K (rk is
    // unique) — q223's r14 hash flake showed the partition-order double
    // sum can flip round(slope, 4) on a .00005 boundary; same latent
    // flake here, same q135/anovaF fold idiom as the fix.
    def fold(f: Column => Column): Column =
      aggregate(array_sort(collect_list(struct(col("rk"), col("cnt")))),
        lit(0.0d), (acc, p) => acc + f(p))
    def px(p: Column): Column = log(p.getField("rk").cast("double"))
    def py(p: Column): Column = log(p.getField("cnt").cast("double"))
    val ss = pts.agg(count(lit(1)).as("n"),
      fold(p => px(p)).as("sx"),
      fold(p => px(p) * px(p)).as("sxx"),
      fold(p => py(p)).as("sy"),
      fold(p => py(p) * py(p)).as("syy"),
      fold(p => px(p) * py(p)).as("sxy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    ss.select(col("n").as("n_terms"),
      round(cov / vx, 4).as("zipf_slope"),
      round(cov * cov / (vx * vy), 4).as("zipf_r2"))
  }
  val q202Sql: String =
    s"""WITH tok AS (SELECT unnest(${QueriesExt.toksSql}) AS term
       |            FROM documents),
       |c AS (SELECT term, count(*)::BIGINT AS cnt FROM tok
       |      WHERE length(term) > 0 GROUP BY 1),
       |top AS (SELECT term, cnt FROM c
       |        ORDER BY cnt DESC, term ASC LIMIT 1000),
       |p AS (SELECT (row_number() OVER (ORDER BY cnt DESC, term ASC))
       |          ::BIGINT AS rk, cnt
       |      FROM top),
       |ag AS (SELECT list_sort(list(struct_pack(rk := rk, cnt := cnt)))
       |         AS a FROM p),
       |ss AS (SELECT len(a)::BIGINT AS n,
       |         list_sum(list_transform(a, p -> ln(p.rk::DOUBLE)))
       |           AS sx,
       |         list_sum(list_transform(a,
       |           p -> ln(p.rk::DOUBLE) * ln(p.rk::DOUBLE))) AS sxx,
       |         list_sum(list_transform(a, p -> ln(p.cnt::DOUBLE)))
       |           AS sy,
       |         list_sum(list_transform(a,
       |           p -> ln(p.cnt::DOUBLE) * ln(p.cnt::DOUBLE))) AS syy,
       |         list_sum(list_transform(a,
       |           p -> ln(p.rk::DOUBLE) * ln(p.cnt::DOUBLE))) AS sxy
       |       FROM ag)
       |SELECT n AS n_terms,
       |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
       |         AS zipf_slope,
       |       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
       |         / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
       |         AS zipf_r2
       |FROM ss""".stripMargin

  // ---------------------------------------------------------------- q203
  /** Mutual information between language and source (nats, plus the
    * sqrt-normalized NMI) — the effect-SIZE companion to q159's chi²
    * verdict: chi² says "lang and source are not independent", MI says
    * HOW MUCH knowing the feed tells you about the language (0 =
    * balanced multilingual feeds, → min(H) = single-language feeds) —
    * the number that decides whether per-feed language thresholds are
    * worth their complexity. All counts integer over the bounded
    * lang×source grid; one defined double chain per cell. */
  def q203LangSourceMi(s: SparkSession, dir: String): DataFrame = {
    val j = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    val l = j.groupBy(col("lang")).agg(sum(col("n")).as("nl"))
    val sc = j.groupBy(col("source")).agg(sum(col("n")).as("ns"))
    val t = j.agg(sum(col("n")).as("nt"))
    // MI/entropy sums fold left-to-right over key-sorted bounded frames
    // ((lang, source) grid, lang margin, source margin) — a partition-
    // order double sum can flip round(·, 6) on a boundary (the q223 r14
    // flake class); same q135/anovaF fold idiom, mirrored in the oracle.
    val mi = j.join(broadcast(l), "lang").join(broadcast(sc), "source")
      .crossJoin(broadcast(t))
      .agg(aggregate(array_sort(collect_list(struct(col("lang"),
          col("source"), col("n"), col("nl"), col("ns"), col("nt")))),
        lit(0.0d), (acc, p) => acc +
          (p.getField("n").cast("double") / p.getField("nt")) *
            log(p.getField("nt").cast("double") * p.getField("n") /
              (p.getField("nl").cast("double") * p.getField("ns"))))
        .as("mi"))
    val hl = l.crossJoin(broadcast(t))
      .agg(aggregate(array_sort(collect_list(struct(col("lang"),
          col("nl"), col("nt")))),
        lit(0.0d), (acc, p) => acc -
          (p.getField("nl").cast("double") / p.getField("nt")) *
            log(p.getField("nl").cast("double") / p.getField("nt")))
        .as("hl"))
    val hs = sc.crossJoin(broadcast(t))
      .agg(aggregate(array_sort(collect_list(struct(col("source"),
          col("ns"), col("nt")))),
        lit(0.0d), (acc, p) => acc -
          (p.getField("ns").cast("double") / p.getField("nt")) *
            log(p.getField("ns").cast("double") / p.getField("nt")))
        .as("hs"))
    t.crossJoin(broadcast(mi)).crossJoin(broadcast(hl))
      .crossJoin(broadcast(hs))
      .select(col("nt").as("n_docs"), round(col("mi"), 6).as("mi_nats"),
        round(col("mi") / sqrt(col("hl") * col("hs")), 6).as("nmi"))
  }
  val q203Sql: String =
    """WITH j AS (SELECT lang, source, count(*)::BIGINT AS n
      |      FROM documents GROUP BY 1, 2),
      |l AS (SELECT lang, sum(n)::BIGINT AS nl FROM j GROUP BY 1),
      |s AS (SELECT source, sum(n)::BIGINT AS ns FROM j GROUP BY 1),
      |t AS (SELECT sum(n)::BIGINT AS nt FROM j),
      |mi AS (SELECT list_sum(list_transform(
      |           list_sort(list(struct_pack(lang := lang, source := source,
      |             n := n, nl := nl, ns := ns, nt := nt))),
      |           p -> (p.n::DOUBLE / p.nt) * ln(p.nt::DOUBLE * p.n
      |             / (p.nl::DOUBLE * p.ns)))) AS mi
      |       FROM j JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t),
      |hl AS (SELECT list_sum(list_transform(
      |           list_sort(list(struct_pack(lang := lang, nl := nl,
      |             nt := nt))),
      |           p -> -(p.nl::DOUBLE / p.nt) * ln(p.nl::DOUBLE / p.nt)))
      |         AS hl
      |       FROM l CROSS JOIN t),
      |hs AS (SELECT list_sum(list_transform(
      |           list_sort(list(struct_pack(source := source, ns := ns,
      |             nt := nt))),
      |           p -> -(p.ns::DOUBLE / p.nt) * ln(p.ns::DOUBLE / p.nt)))
      |         AS hs
      |       FROM s CROSS JOIN t)
      |SELECT t.nt AS n_docs, round(mi.mi, 6) AS mi_nats,
      |       round(mi.mi / sqrt(hl.hl * hs.hs), 6) AS nmi
      |FROM t, mi, hl, hs""".stripMargin

  /** Shared session-interval frame for q204/q205: the q29 gap
    * sessionization (30-min gap, user-partitioned lag+cumsum — one
    * user-key exchange) reduced to closed intervals [start_ms, end_ms]
    * with a per-user-unique session id. */
  private def sessionIntervals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    val prev = lag(col("ts_ms"), 1).over(w)
    val isNew = when(prev.isNull || col("ts_ms") - prev > gapMs, 1L)
      .otherwise(0L)
    Tables.events(s, dir)
      .withColumn("session_id", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"))
  }
  private val sessionSqlCte: String =
    """g AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
      |               OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
      |x AS (SELECT user_id, ts_ms,
      |        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |      FROM g),
      |sess AS (SELECT user_id, session_id, min(ts_ms) AS start_ms,
      |           max(ts_ms) AS end_ms
      |         FROM x GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q204
  /** Peak session concurrency — the capacity number a serving fleet is
    * sized by: the maximum number of user sessions simultaneously open
    * at any instant, plus when it happens. Classic sweep-line made
    * scale-safe: each session contributes (+1 at start, −1 at end)
    * boundary rows, ordered by (t, starts-before-ends) so sessions
    * touching at one instant count as concurrent (rule named); the
    * running sum over the 2·|sessions| boundary stream runs through
    * [[PrefixScan]] — the textbook sweep-line is a single sorted pass,
    * which on Spark means exactly the single-task trap the two-pass
    * form exists for. The max and its first timestamp are
    * tie-order-invariant (only a +1-block end can sit at the max). */
  def q204PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = sessionIntervals(s, dir)
    val bounds = sess.select(col("start_ms").as("t"), lit(1L).as("delta"))
      .unionByName(sess.select(col("end_ms").as("t"), lit(-1L).as("delta")))
    val run = PrefixScan.scan(bounds, col("t"),
      Seq(col("t").asc, col("delta").desc),
      Seq(PrefixScan.RunSum(col("delta"), "run")), cache = true)
    val peak = run.agg(max(col("run")).as("peak"))
    val nSess = sess.agg(count(lit(1)).as("n_sessions"))
    run.crossJoin(broadcast(peak)).filter(col("run") === col("peak"))
      .agg(max(col("peak")).as("peak_concurrency"),
        min(col("t")).as("peak_ts_ms"))
      .crossJoin(broadcast(nSess))
      .select(col("n_sessions"), col("peak_concurrency"), col("peak_ts_ms"))
  }
  val q204Sql: String =
    s"""WITH $sessionSqlCte,
       |b AS (SELECT start_ms AS t, 1 AS delta FROM sess
       |      UNION ALL SELECT end_ms, -1 FROM sess),
       |r AS (SELECT t, sum(delta) OVER (ORDER BY t, delta DESC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |      FROM b),
       |p AS (SELECT max(run) AS peak FROM r)
       |SELECT (SELECT count(*) FROM sess)::BIGINT AS n_sessions,
       |       max(peak)::BIGINT AS peak_concurrency,
       |       min(t)::BIGINT AS peak_ts_ms
       |FROM r, p WHERE run = peak""".stripMargin

  // ---------------------------------------------------------------- q205
  /** Cross-user session-overlap census via the bucketized interval
    * join ([[graft.operators.IntervalJoin]]): how many cross-user
    * session pairs were open simultaneously, and for how long in
    * total/on average — the co-presence statistic behind q191's
    * same-session co-occurrence (there, items within ONE user's
    * session; here, users sharing wall-clock time). A naive
    * `a.start <= b.end AND b.start <= a.end` join is a nested-loop
    * product; the operator reduces it to an hour-bucket hash join with
    * exact post-verification and a one-bucket emission rule (no
    * distinct). Pair identity: user_a < user_b, counted once per
    * overlapping session pair. */
  def q205SessionOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IntervalJoin
    val sess = sessionIntervals(s, dir)
    val l = sess.select(col("user_id").as("l_user"),
      col("start_ms").as("l_start"), col("end_ms").as("l_end"))
    val r = sess.select(col("user_id").as("r_user"),
      col("start_ms").as("r_start"), col("end_ms").as("r_end"))
    IntervalJoin.overlapJoin(l, r, bucketMs = 3600000L)
      .filter(col("l_user") < col("r_user"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ov_end") - col("ov_start")).as("overlap_ms_total"),
        round(avg((col("ov_end") - col("ov_start")).cast("double")), 2)
          .as("overlap_ms_avg"))
  }
  val q205Sql: String =
    s"""WITH $sessionSqlCte
       |SELECT count(*)::BIGINT AS n_pairs,
       |       sum(least(a.end_ms, b.end_ms)
       |           - greatest(a.start_ms, b.start_ms))::BIGINT
       |         AS overlap_ms_total,
       |       round(avg((least(a.end_ms, b.end_ms)
       |           - greatest(a.start_ms, b.start_ms))::DOUBLE), 2)
       |         AS overlap_ms_avg
       |FROM sess a JOIN sess b
       |  ON a.user_id < b.user_id
       | AND a.start_ms <= b.end_ms AND b.start_ms <= a.end_ms""".stripMargin

  // ---------------------------------------------------------------- q206
  /** Kruskal–Wallis H across ALL event types — the k-sample extension
    * of q201's two-sample rank test ("do the five event streams draw
    * their values from one distribution at all?", answered before any
    * pairwise drill-down): H = 12/(N(N+1)) · Σ R_g²/n_g − 3(N+1) over
    * average ranks with exact ties, divided by the tie correction
    * 1 − ΣT/(N³−N). Rank machinery identical to q201: per (vm, type)
    * counts, ONE [[PrefixScan]] cumulative count over the pooled
    * distinct values, 2·avg-rank integer algebra; the per-type rank
    * sums are a ≤|types|-row aggregate. Verdict against the χ²(4)
    * α = 0.01 critical value 13.2767 (embedded literal, df = 5 types
    * − 1). */
  def q206KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val perValue = Tables.events(s, dir)
      .select(round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
        col("event_type"))
      .groupBy(col("vm"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val perV = perValue.groupBy(col("vm")).agg(sum(col("c")).as("cnt"))
    val scanned = PrefixScan.scan(perV, col("vm"), Seq(col("vm")),
        Seq(PrefixScan.RunSum(col("cnt"), "cumall")), cache = true)
      .withColumn("ravg2",
        lit(2L) * (col("cumall") - col("cnt")) + col("cnt") + 1L)
    val ranked = perValue.join(scanned.select(col("vm"), col("ravg2"),
      col("cnt")), Seq("vm"))
    val perType = ranked.groupBy(col("event_type"))
      .agg(sum(col("c")).as("ng"),
        sum(col("c").cast("decimal(38,0)") * col("ravg2")).as("rg2x"))
    val ties = scanned.agg(
      sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
        - col("cnt")).as("tsum"),
      sum(col("cnt")).as("n"))
    val stats = perType.crossJoin(broadcast(ties))
      .groupBy(col("n"), col("tsum"))
      .agg(count(lit(1)).as("k"),
        sum(col("rg2x").cast("double") * col("rg2x").cast("double") /
          (lit(4.0d) * col("ng").cast("double"))).as("sr"))
    val n = col("n").cast("double")
    val h0 = lit(12.0d) / (n * (n + 1.0d)) * col("sr") -
      lit(3.0d) * (n + 1.0d)
    val corr = lit(1.0d) - col("tsum").cast("double") / (n * n * n - n)
    val h = round(h0 / corr, 4)
    stats.select(col("n").as("n_events"), col("k").as("n_groups"),
      h.as("h"), (h > lit(13.2767d)).as("significant_01"))
  }
  val q206Sql: String =
    """WITH pvt AS (SELECT round("value" * 1000000.0)::BIGINT AS vm,
      |         event_type, count(*)::BIGINT AS c
      |       FROM events GROUP BY 1, 2),
      |pv AS (SELECT vm, sum(c)::BIGINT AS cnt FROM pvt GROUP BY 1),
      |sc AS (SELECT vm, cnt,
      |         2 * (sum(cnt) OVER (ORDER BY vm
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - cnt) + cnt + 1 AS ravg2
      |       FROM pv),
      |rk AS (SELECT pvt.event_type, pvt.c, sc.ravg2
      |       FROM pvt JOIN sc ON pvt.vm = sc.vm),
      |pt AS (SELECT event_type, sum(c)::BIGINT AS ng,
      |         sum(c::HUGEINT * ravg2)::HUGEINT AS rg2x
      |       FROM rk GROUP BY 1),
      |ti AS (SELECT sum(cnt::HUGEINT * cnt * cnt - cnt)::HUGEINT AS tsum,
      |         sum(cnt)::BIGINT AS n
      |       FROM sc),
      |ag AS (SELECT n, tsum, count(*)::BIGINT AS k,
      |         sum(rg2x::DOUBLE * rg2x::DOUBLE / (4.0 * ng::DOUBLE)) AS sr
      |       FROM pt CROSS JOIN ti GROUP BY 1, 2)
      |SELECT n AS n_events, k AS n_groups,
      |       round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * sr
      |           - 3.0 * (n::DOUBLE + 1.0))
      |         / (1.0 - tsum::DOUBLE
      |             / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 4)
      |         AS h,
      |       round((12.0 / (n::DOUBLE * (n::DOUBLE + 1.0)) * sr
      |           - 3.0 * (n::DOUBLE + 1.0))
      |         / (1.0 - tsum::DOUBLE
      |             / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 4)
      |         > 13.2767 AS significant_01
      |FROM ag""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_lorenz_curve" -> (q198LorenzCurve _),
    "q199_ks_by_type" -> (q199KsByType _),
    "q200_weighted_quality" -> (q200WeightedQuality _),
    "q201_mann_whitney" -> (q201MannWhitney _),
    "q202_zipf_fit" -> (q202ZipfFit _),
    "q203_lang_source_mi" -> (q203LangSourceMi _),
    "q204_peak_concurrency" -> (q204PeakConcurrency _),
    "q205_session_overlap" -> (q205SessionOverlap _),
    "q206_kruskal_wallis" -> (q206KruskalWallis _)
  )

  val oracles: Map[String, String] = Map(
    "q198_lorenz_curve" -> q198Sql,
    "q199_ks_by_type" -> q199Sql,
    "q200_weighted_quality" -> q200Sql,
    "q201_mann_whitney" -> q201Sql,
    "q202_zipf_fit" -> q202Sql,
    "q203_lang_source_mi" -> q203Sql,
    "q204_peak_concurrency" -> q204Sql,
    "q205_session_overlap" -> q205Sql,
    "q206_kruskal_wallis" -> q206Sql
  )
}
