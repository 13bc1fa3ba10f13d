package graft

import graft.functions.{Ks, PrefixScan, Similarity, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared queries q259+ — behavioral-sequence, distribution-test, and
  * density extensions: event-transition mining, the two-sample
  * Kolmogorov–Smirnov statistic, Benford first-digit audit,
  * Page–Hinkley drift detection, Flesch readability, and grid-density
  * outlier detection over embeddings.
  *
  * Shape discipline (the 100 TB contract, same as [[QueriesExt8]]):
  * windows are always partitioned by a data-scaled key (user), global
  * running totals go through [[PrefixScan]]'s two-pass plan (exact
  * integers only, so bucket re-association cannot change a bit),
  * sequential recurrences run only over CALENDAR-BOUNDED series, and
  * per-row text/vector work stays inside the scan. Sums stay exact
  * integers until one canonical double closed form each DuckDB oracle
  * mirrors bit-for-bit. */
object QueriesExt9 {
  import QueriesExt.{docs, embs}

  // ---------------------------------------------------------------- q259
  /** Sequential pattern mining at the transition grain: for every user's
    * event stream ordered by (ts_ms, event_id), each consecutive pair of
    * event types is one observed transition a→b; the Markov estimate
    * p(b|a) = n(a→b) / Σ_b' n(a→b') is the length-2 PrefixSpan support
    * table behind funnel design and next-event prediction.
    *
    * The 100 TB shape: ONE window partitioned by user_id (each task
    * holds one user's bounded stream, never the corpus), then a
    * |types|²-bounded hash aggregate with map-side combine; the
    * antecedent totals frame is ≤|types| rows and broadcast back.
    * Output: a_type, b_type, n_occ, n_users, p_trans. */
  def q259SeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val pairs = ev
      .withColumn("b_type", lead(col("event_type"), 1).over(w))
      .filter(col("b_type").isNotNull)
    val agg = pairs
      .groupBy(col("event_type").as("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("user_id")).as("n_users"))
    val tot = agg.groupBy(col("a_type")).agg(sum(col("n_occ")).as("a_tot"))
    agg.join(broadcast(tot), Seq("a_type"))
      .select(col("a_type"), col("b_type"), col("n_occ"), col("n_users"),
        round(col("n_occ").cast("double") / col("a_tot").cast("double"), 6)
          .as("p_trans"))
  }
  val q259Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
      |                   event_id FROM events),
      |p AS (SELECT user_id, event_type AS a_type,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts_ms, event_id) AS b_type
      |      FROM ev),
      |a AS (SELECT a_type, b_type, count(*)::BIGINT AS n_occ,
      |        count(DISTINCT user_id)::BIGINT AS n_users
      |      FROM p WHERE b_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT a_type, sum(n_occ)::BIGINT AS a_tot FROM a GROUP BY 1)
      |SELECT a.a_type, b_type, n_occ, n_users,
      |       round(n_occ::DOUBLE / a_tot::DOUBLE, 6) AS p_trans
      |FROM a JOIN t USING (a_type)""".stripMargin

  // ---------------------------------------------------------------- q260
  /** Two-sample Kolmogorov–Smirnov test: is the purchase `value`
    * distribution the same as the click one? D = max over the pooled
    * support of |F̂₁(v) − F̂₂(v)|, plus the scaled statistic
    * √(n₁n₂/(n₁+n₂))·D that the asymptotic p-value tables index.
    *
    * The 100 TB shape: group-by-value collapses the stream to its
    * distinct support WITH exact per-group counts (map-side combine),
    * then the shared [[graft.functions.Ks.twoSampleD]] kernel (the
    * same one behind q167/q199) derives both ECDFs from one cached
    * [[PrefixScan]] two-pass run — exact integer running counts, so
    * bucket re-association cannot change a bit and no single-partition
    * window exists. The final max is a 1-row aggregate.
    * Output: n1, n2, d_stat, ks_stat. */
  def q260KsTest(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy(col("value")).agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c2"))
    Ks.twoSampleD(g, col("value"))
      .select(col("n1"), col("n2"),
        round(col("d_stat"), 6).as("d_stat"),
        round(col("d_stat") * sqrt(col("n1").cast("double") *
          col("n2").cast("double") / (col("n1") + col("n2")).cast("double")),
          6).as("ks_stat"))
  }
  val q260Sql: String =
    """WITH ev AS (SELECT event_type, "value" AS v FROM events
      |            WHERE event_type IN ('purchase', 'click')),
      |g AS (SELECT v,
      |        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
      |          AS g1,
      |        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
      |          AS g2
      |      FROM ev GROUP BY 1),
      |c AS (SELECT v, sum(g1) OVER (ORDER BY v)::BIGINT AS e1,
      |             sum(g2) OVER (ORDER BY v)::BIGINT AS e2 FROM g),
      |n AS (SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |               END)::BIGINT AS n1,
      |             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
      |               END)::BIGINT AS n2 FROM ev),
      |d AS (SELECT max(abs(e1::DOUBLE / n1::DOUBLE
      |               - e2::DOUBLE / n2::DOUBLE)) AS d_stat
      |      FROM c CROSS JOIN n)
      |SELECT n1, n2, round(d_stat, 6) AS d_stat,
      |       round(d_stat * sqrt(n1::DOUBLE * n2::DOUBLE
      |         / (n1 + n2)::DOUBLE), 6) AS ks_stat
      |FROM d CROSS JOIN n""".stripMargin

  // ---------------------------------------------------------------- q261
  /** Benford first-significant-digit audit of event values — the
    * classic fabricated-data screen: observed digit counts vs the
    * Benford expectation log₁₀(1+1/d), with the per-digit χ² distance
    * contribution (obs − n·p)²/(n·p).
    *
    * The 100 TB shape: the first digit d = ⌊v/10^⌊log₁₀v⌋⌋ is a scan
    * projection; everything after is a 9-row hash aggregate and a
    * broadcast of the 1-row total. Both engines call the same libm
    * log10/pow on identical input bits, so the digit decision and the
    * expected shares replay exactly. Output per digit: d, n_obs,
    * p_expected, chi2_part. */
  def q261Benford(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir).filter(col("value") > 0)
      .select(floor(col("value") /
        pow(lit(10.0d), floor(log10(col("value"))))).cast("long").as("d"))
    val obs = d.groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
    val n = d.agg(count(lit(1)).as("n"))
    val p = log(10.0d, lit(1.0d) + lit(1.0d) / col("d").cast("double"))
    val expN = col("n").cast("double") * p
    obs.crossJoin(broadcast(n))
      .select(col("d"), col("n_obs"), round(p, 6).as("p_expected"),
        round((col("n_obs").cast("double") - expN) *
          (col("n_obs").cast("double") - expN) / expN, 6).as("chi2_part"))
  }
  val q261Sql: String =
    """WITH v AS (SELECT floor("value" / pow(10.0, floor(log10("value"))))
      |             ::BIGINT AS d
      |           FROM events WHERE "value" > 0),
      |o AS (SELECT d, count(*)::BIGINT AS n_obs FROM v GROUP BY 1),
      |n AS (SELECT count(*)::BIGINT AS n FROM v)
      |SELECT d, n_obs,
      |       round(log10(1.0 + 1.0 / d::DOUBLE), 6) AS p_expected,
      |       round((n_obs::DOUBLE - n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE))
      |         * (n_obs::DOUBLE - n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE))
      |         / (n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE)), 6) AS chi2_part
      |FROM o CROSS JOIN n""".stripMargin

  // ---------------------------------------------------------------- q262
  /** Page–Hinkley drift detector over the daily event-volume series:
    * m_t = Σ_{i≤t} (x_i − μ_i − δ) with μ_i the running mean, alarm
    * when m_t − min_{i≤t} m_i exceeds λ — the sequential
    * change-detection twin of q227's CUSUM (which tracks a FIXED
    * reference mean; PH adapts the mean as it goes).
    *
    * The 100 TB shape (q244's contract): the raw stream collapses to a
    * CALENDAR-BOUNDED daily series via one map-side-combinable count,
    * and only then does the inherently-sequential recurrence run — ONE
    * ordered `aggregate` fold over the collected day list, δ=5, λ=150.
    * The running mean is exact-integer cumsum/rank so only the m
    * recurrence carries float state, replayed in the same operation
    * order by the oracle's recursive CTE. Output per day: day,
    * n_events, mean_rate, ph_stat, gap, alarm. */
  def q262PageHinkley(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val serie = daily
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("ser"))
    val outT = "array<struct<day:bigint,x:bigint,i:bigint,cs:bigint," +
      "m:double,mmin:double>>"
    val acc0 = struct(lit(0L).as("i"), lit(0L).as("cs"),
      lit(0.0d).as("m"), lit(0.0d).as("mmin"),
      array().cast(outT).as("out"))
    val folded = serie.select(aggregate(col("ser"), acc0, (a, e) => {
      val i = a.getField("i") + 1L
      val cs = a.getField("cs") + e.getField("x")
      val term = e.getField("x").cast("double") -
        cs.cast("double") / i.cast("double") - lit(5.0d)
      val m = a.getField("m") + term
      // m is re-inlined in the min update so the expression TREE
      // matches the oracle's recursive CTE exactly.
      val mmin = when(a.getField("i") === 0L, a.getField("m") + term)
        .otherwise(least(a.getField("mmin"), a.getField("m") + term))
      struct(i.as("i"), cs.as("cs"), m.as("m"), mmin.as("mmin"),
        concat(a.getField("out"), array(struct(
          e.getField("day").as("day"), e.getField("x").as("x"),
          i.as("i"), cs.as("cs"), m.as("m"), mmin.as("mmin")))).as("out"))
    }).getField("out").as("out"))
    folded.select(explode(col("out")).as("r"))
      .select(col("r.day").as("day"), col("r.x").as("n_events"),
        round(col("r.cs").cast("double") / col("r.i").cast("double"), 6)
          .as("mean_rate"),
        round(col("r.m"), 6).as("ph_stat"),
        round(col("r.m") - col("r.mmin"), 6).as("gap"),
        ((col("r.m") - col("r.mmin")) > lit(150.0d)).as("alarm"))
  }
  val q262Sql: String =
    """WITH RECURSIVE d AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |         count(*)::BIGINT AS x FROM events GROUP BY 1),
      |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn,
      |        sum(x) OVER (ORDER BY day
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |          AS cs
      |      FROM d),
      |ph AS (
      |  SELECT rn, day, x, cs,
      |         (x::DOUBLE - cs::DOUBLE / rn::DOUBLE - 5.0) AS m,
      |         (x::DOUBLE - cs::DOUBLE / rn::DOUBLE - 5.0) AS mmin
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.day, r.x, r.cs,
      |         ph.m + (r.x::DOUBLE - r.cs::DOUBLE / r.rn::DOUBLE - 5.0),
      |         least(ph.mmin,
      |           ph.m + (r.x::DOUBLE - r.cs::DOUBLE / r.rn::DOUBLE - 5.0))
      |  FROM ph JOIN r ON r.rn = ph.rn + 1)
      |SELECT day, x AS n_events,
      |       round(cs::DOUBLE / rn::DOUBLE, 6) AS mean_rate,
      |       round(m, 6) AS ph_stat, round(m - mmin, 6) AS gap,
      |       (m - mmin) > 150.0 AS alarm
      |FROM ph""".stripMargin

  // ---------------------------------------------------------------- q263
  /** Flesch readability per source: reading-ease
    * 206.835 − 1.015·(W/S) − 84.6·(Y/W) and Flesch–Kincaid grade
    * 0.39·(W/S) + 11.8·(Y/W) − 15.59 from corpus-total words W,
    * sentences S, and vowel-group syllables Y — the curation gate that
    * catches both telegraphic boilerplate (too few words/sentence) and
    * run-on machine text.
    *
    * The 100 TB shape: all three counts are regexp_count projections
    * inside the scan (the text never shuffles), summed exactly per
    * source with map-side combine; the closed form runs on ≤|sources|
    * rows. Sentences are floored at 1 per document so fragment-only
    * docs cannot zero the denominator. Output: source, n_docs, words,
    * sentences, syllables, flesch, fk_grade. */
  def q263Flesch(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir).select(col("source"),
      regexp_count(lower(col("text")), lit("[a-z]+")).cast("long").as("w"),
      greatest(lit(1L),
        regexp_count(col("text"), lit("[.!?]+")).cast("long")).as("se"),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("sy"))
    val agg = per.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
      sum(col("se")).as("sentences"), sum(col("sy")).as("syllables"))
    val wps = col("words").cast("double") / col("sentences").cast("double")
    val ypw = col("syllables").cast("double") / col("words").cast("double")
    agg.select(col("source"), col("n_docs"), col("words"), col("sentences"),
      col("syllables"),
      round(lit(206.835d) - lit(1.015d) * wps - lit(84.6d) * ypw, 4)
        .as("flesch"),
      round(lit(0.39d) * wps + lit(11.8d) * ypw - lit(15.59d), 4)
        .as("fk_grade"))
  }
  val q263Sql: String =
    """WITH per AS (SELECT source,
      |        len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS w,
      |        greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
      |          AS se,
      |        len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS sy
      |      FROM documents),
      |a AS (SELECT source, count(*)::BIGINT AS n_docs,
      |        sum(w)::BIGINT AS words, sum(se)::BIGINT AS sentences,
      |        sum(sy)::BIGINT AS syllables
      |      FROM per GROUP BY 1)
      |SELECT source, n_docs, words, sentences, syllables,
      |       round(206.835 - 1.015 * (words::DOUBLE / sentences::DOUBLE)
      |         - 84.6 * (syllables::DOUBLE / words::DOUBLE), 4) AS flesch,
      |       round(0.39 * (words::DOUBLE / sentences::DOUBLE)
      |         + 11.8 * (syllables::DOUBLE / words::DOUBLE) - 15.59, 4)
      |           AS fk_grade
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- q264
  /** Grid-density outlier detection over embeddings — the DBSCAN-noise
    * shape without the iterative clustering: project every vector onto
    * two fixed ±1 hyperplanes ([[Similarity.deterministicPlanes]], the
    * q83 JL construction), quantize to 0.5-wide grid cells, and flag
    * points whose cell holds fewer than 3 vectors as density outliers.
    *
    * The 100 TB shape: both projections are scan-local double folds
    * (same left-to-right order as the oracle's list_sum), the cell
    * histogram is ONE map-side-combinable count on a bounded key
    * (occupied cells ≪ rows — the grid extent is data-range-bounded),
    * and the flag comes back via an equi-join on the cell key. No
    * pairwise distances anywhere. Output: vec_id, cx, cy, cell_n,
    * is_outlier. */
  def q264GridOutliers(s: SparkSession, dir: String): DataFrame = {
    val planes = Similarity.deterministicPlanes(2, 64)
    def proj(j: Int) = Similarity.dot(col("v"),
      array(planes(j).map(p => lit(p.toDouble)): _*))
    val cells = embs(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        floor(proj(0) / lit(0.5d)).cast("long").as("cx"),
        floor(proj(1) / lit(0.5d)).cast("long").as("cy"))
    val counts = cells.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("cell_n"))
    cells.join(counts, Seq("cx", "cy"))
      .select(col("vec_id"), col("cx"), col("cy"), col("cell_n"),
        (col("cell_n") < 3L).as("is_outlier"))
  }
  // The ONE plane-j projection definition lives in QueriesExt (its
  // 8-plane set's planes 0..1 ARE deterministicPlanes(2, 64), since
  // deterministicPlanes(j, i) depends only on (j, i)).
  private def gridProjSql(j: Int): String = QueriesExt.projSql("v", j)
  val q264Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id,
       |        floor(${gridProjSql(0)} / 0.5)::BIGINT AS cx,
       |        floor(${gridProjSql(1)} / 0.5)::BIGINT AS cy
       |      FROM e),
       |n AS (SELECT cx, cy, count(*)::BIGINT AS cell_n FROM c GROUP BY 1, 2)
       |SELECT vec_id, cx, cy, cell_n, cell_n < 3 AS is_outlier
       |FROM c JOIN n USING (cx, cy)""".stripMargin

  // ---------------------------------------------------------------- q265
  /** Classifier AUC by the Mann–Whitney rank-sum identity: how well does
    * the plane-0 projection score separate label-0 embeddings from the
    * rest? AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋), with R₊ the sum of the
    * positives' global ranks under (score, vec_id) ascending — the exact
    * relation between AUC and the U statistic, no threshold sweep.
    *
    * The 100 TB shape: the score is a scan-local double fold, the
    * GLOBAL rank comes from [[PrefixScan]]'s two-pass RowNumber (exact
    * integers, no single-partition sort), and the rank-sum is one
    * 1-row aggregate. The vec_id tie-break makes the rank total and
    * both engines' rank assignment identical. Output: n_pos, n_neg,
    * rank_sum, auc. */
  def q265AucRank(s: SparkSession, dir: String): DataFrame = {
    val planes = Similarity.deterministicPlanes(2, 64)
    val score = Similarity.dot(col("v"),
      array(planes(0).map(p => lit(p.toDouble)): _*))
    val scored = embs(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("label"), score.as("s"))
    val ranked = PrefixScan.scan(scored, col("s"),
      Seq(col("s"), col("vec_id")), Seq(PrefixScan.RowNumber("rank")))
    val agg = ranked.agg(
      sum(when(col("label") === 0, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("label") =!= 0, 1L).otherwise(0L)).as("n_neg"),
      sum(when(col("label") === 0, col("rank")).otherwise(0L)).as("rank_sum"))
    agg.select(col("n_pos"), col("n_neg"), col("rank_sum"),
      round((col("rank_sum") - expr("n_pos * (n_pos + 1) div 2"))
        .cast("double") /
        (col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
  }
  val q265Sql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |sc AS (SELECT vec_id, label, ${gridProjSql(0)} AS s FROM e),
       |r AS (SELECT label,
       |        row_number() OVER (ORDER BY s, vec_id)::BIGINT AS rank
       |      FROM sc),
       |a AS (SELECT sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)::BIGINT
       |          AS n_pos,
       |        sum(CASE WHEN label <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
       |        sum(CASE WHEN label = 0 THEN rank ELSE 0 END)::BIGINT
       |          AS rank_sum
       |      FROM r)
       |SELECT n_pos, n_neg, rank_sum,
       |       round((rank_sum - n_pos * (n_pos + 1) // 2)::DOUBLE
       |         / (n_pos * n_neg)::DOUBLE, 6) AS auc
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- q266
  /** Language-ID confusion matrix — the evaluation grain on top of
    * q18's per-document prediction: count every (labeled, detected)
    * cell and normalize by the labeled row total, the per-language
    * recall decomposition that shows WHERE the stopword heuristic
    * leaks (q18 shows only that it does).
    *
    * The 100 TB shape: prediction stays inside the scan (the text
    * never shuffles), the matrix is a |langs|²-bounded map-side
    * combined count, and the row totals are ≤|langs| rows broadcast
    * back. Output: lang, lang_detected, n, frac_of_true. */
  def q266LangConfusion(s: SparkSession, dir: String): DataFrame = {
    val pred = docs(s, dir).select(col("lang"),
      TextFunctions.langId(col("text")).as("lang_detected"))
    val cells = pred.groupBy(col("lang"), col("lang_detected"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    cells.join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("lang_detected"), col("n"),
        round(col("n").cast("double") / col("n_true").cast("double"), 6)
          .as("frac_of_true"))
  }
  val q266Sql: String =
    s"""WITH pred AS (
       |  SELECT lang, ${QueriesExt.langIdSql} AS lang_detected
       |  FROM (SELECT lang, ${QueriesExt.toksSql} AS toks FROM documents)),
       |c AS (SELECT lang, lang_detected, count(*)::BIGINT AS n
       |      FROM pred GROUP BY 1, 2),
       |t AS (SELECT lang, sum(n)::BIGINT AS n_true FROM c GROUP BY 1)
       |SELECT c.lang, lang_detected, n,
       |       round(n::DOUBLE / n_true::DOUBLE, 6) AS frac_of_true
       |FROM c JOIN t USING (lang)""".stripMargin

  // ---------------------------------------------------------------- q267
  /** The 30-token passage planted by q267: appended verbatim to every
    * doc_id ≡ 0 (mod 5), it creates KNOWN cross-doc repeated token
    * spans whose recovery is checkable arithmetically (every planted
    * doc except the global first must emit a span covering exactly the
    * passage's token range) — the plant discipline of q250, applied to
    * substring-level dedup. Lowercase single-space tokens, so both
    * engines' tokenizers pass it through unchanged. */
  private[graft] val q267Plant: String =
    (1 to 30).map(i => f"planted$i%02d").mkString(" ")

  /** Exact SUBSTRING-level dedup (Lee et al. 2021, arXiv:2107.06499):
    * the canonical LLM-corpus dedup tier between q13's whole-doc
    * fingerprint and q14/q15's near-dup — any 20-token window occurring
    * more than once in the corpus marks every occurrence after the
    * first, and marked positions merge into maximal REMOVABLE
    * (doc_id, tok_start, tok_len) spans, the "what to cut" artifact.
    * Runs over the documents corpus with the plant injected (the
    * corpus also carries natural sentence reuse — both kinds of span
    * are recovered and oracle-replayed).
    *
    * The 100 TB shape ([[graft.functions.ExactSubstrings
    * .duplicateTokenSpans]]): only (id, pos, hash) longs ever shuffle
    * — text and token arrays stay inside the scan; the first-occurrence
    * rule is one per-hash window and the span merge one per-doc window.
    * Output: doc_id, span, tok_start, tok_end, tok_len. */
  def q267TokenSpans(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" " + q267Plant)))
        .otherwise(col("text")).as("text"))
    graft.functions.ExactSubstrings
      .duplicateTokenSpans(corpus, "text", "doc_id", W = 20)
      .select(col("id").as("doc_id"), col("span"),
        col("tok_start"), col("tok_end"), col("tok_len"))
  }
  /** q267's span chain over a documents subset — parameterized on the
    * corpus predicate so q295's oracle can replay the SAME chain on the
    * base-only and combined corpora (q267/q292 use `TRUE`). */
  private[graft] def q267SqlFor(whereSql: String): String =
    q267SqlOverCorpus(
      s"""SELECT doc_id,
         |        CASE WHEN doc_id % 5 = 0 THEN text || ' $q267Plant'
         |             ELSE text END AS text
         |      FROM documents WHERE $whereSql""".stripMargin)

  /** The q267 duplicate-token-span chain over an ARBITRARY
    * `(doc_id, text)` corpus query — q300's oracle replays it over a
    * REPLAYED corpus (the unified feed's surviving generations), so
    * the plant/predicate form above is just one instantiation. */
  private[graft] def q267SqlOverCorpus(corpusSql: String): String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH d0 AS ($corpusSql),
       |d AS (SELECT doc_id,
       |        string_split_regex(trim(lower(text)), '\\s+') AS toks
       |      FROM d0),
       |w AS (SELECT doc_id, unnest(range(1, len(toks) - 18)) AS pos, toks
       |      FROM d WHERE len(toks) >= 20),
       |g AS (SELECT doc_id, pos,
       |        ${mid("array_to_string(toks[pos:pos+19], ' ')")} AS h
       |      FROM w),
       |r AS (SELECT doc_id, pos,
       |        ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |      FROM g),
       |dup AS (SELECT doc_id, pos, pos + 19 AS e FROM r WHERE rn >= 2),
       |mx AS (SELECT doc_id, pos, e,
       |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
       |       FROM dup),
       |sp AS (SELECT doc_id, pos, e,
       |         sum(CASE WHEN pe IS NULL OR pos > pe + 1 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS span
       |       FROM mx)
       |SELECT doc_id, span, min(pos) AS tok_start, max(e) AS tok_end,
       |       max(e) - min(pos) + 1 AS tok_len
       |FROM sp GROUP BY 1, 2""".stripMargin
  }
  val q267Sql: String = q267SqlFor("TRUE")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q259_seq_patterns" -> (q259SeqPatterns _),
    "q260_ks_test" -> (q260KsTest _),
    "q261_benford" -> (q261Benford _),
    "q262_page_hinkley" -> (q262PageHinkley _),
    "q263_flesch" -> (q263Flesch _),
    "q264_grid_outliers" -> (q264GridOutliers _),
    "q265_auc_rank" -> (q265AucRank _),
    "q266_lang_confusion" -> (q266LangConfusion _),
    "q267_token_spans" -> (q267TokenSpans _)
  )

  val oracles: Map[String, String] = Map(
    "q259_seq_patterns" -> q259Sql,
    "q260_ks_test" -> q260Sql,
    "q261_benford" -> q261Sql,
    "q262_page_hinkley" -> q262Sql,
    "q263_flesch" -> q263Sql,
    "q264_grid_outliers" -> q264Sql,
    "q265_auc_rank" -> q265Sql,
    "q266_lang_confusion" -> q266Sql,
    "q267_token_spans" -> q267Sql
  )
}
