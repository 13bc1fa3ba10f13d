package graft

import graft.functions.{PrefixScan, TextFunctions}
import graft.operators.Hits
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries q268+ — link-analysis, parametric tests, divergence,
  * and within-document repetition: HITS hubs/authorities, one-way ANOVA,
  * Brown–Forsythe variance homogeneity, per-source Jensen–Shannon
  * divergence, and Gopher-style repetition signals.
  *
  * Shape discipline (the 100 TB contract, same as [[QueriesExt9]]):
  * iterative graph algebra runs in exact scaled-integer fixed point
  * (the PageRank/[[Hits]] trick — integer sums are order-independent,
  * so partial aggregation cannot change a bit); data-scaled double sums
  * integerize per-term to micro-units before aggregation; the only
  * floating-point folds run over DOMAIN-BOUNDED grains (|event types|)
  * in sorted order, replayed by DuckDB's list_sum over the same sorted
  * list. */
object QueriesExt10 {
  import QueriesExt.docs

  // ---------------------------------------------------------------- q268
  /** HITS hubs & authorities over the customer→part purchase bipartite
    * graph (Kleinberg 1999): customers are hubs (they buy authoritative
    * parts), parts are authorities (they are bought by good hubs) — the
    * link-analysis complement of q81's PageRank, and the classic
    * recommendation-seed score.
    *
    * The 100 TB shape ([[Hits.scores]]): per iteration one equi-join +
    * one partial-aggregated exact integer sum per side; the L1
    * renormalization is a 1-row broadcast + decimal(38,0) integral
    * division, so the fixed point replays bit-for-bit in DuckDB's
    * HUGEINT algebra. 3 iterations. Output: id, side, score. */
  def q268Hits(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
    Hits.scores(e, iterations = 3)
  }
  val q268Sql: String = {
    val S = 1000000000000L
    val iters = 3
    val steps = (1 to iters).map { i =>
      val ph = if (i == 1) "h0" else s"h${i - 1}"
      s"""ar$i AS (SELECT dst AS id, sum(s)::HUGEINT AS raw
         |         FROM e JOIN $ph ON e.src = $ph.id GROUP BY 1),
         |a$i AS (SELECT id, (raw * $S // (SELECT sum(raw) FROM ar$i))::HUGEINT
         |          AS s FROM ar$i),
         |hr$i AS (SELECT src AS id, sum(s)::HUGEINT AS raw
         |         FROM e JOIN a$i ON e.dst = a$i.id GROUP BY 1),
         |h$i AS (SELECT id, (raw * $S // (SELECT sum(raw) FROM hr$i))::HUGEINT
         |          AS s FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src, l_partkey AS dst
       |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |h0 AS (SELECT DISTINCT src AS id, $S::HUGEINT AS s FROM e),
       |$steps
       |SELECT id, 'hub' AS side, s::BIGINT AS score FROM h$iters
       |UNION ALL
       |SELECT id, 'authority' AS side, s::BIGINT AS score FROM a$iters"""
      .stripMargin
  }

  // -------------------------------------------------- shared ANOVA kernel
  /** One-way ANOVA F from a per-group sufficient-statistics frame
    * (g, n, sv, qv): n exact counts, sv exact integer value sums, qv
    * exact decimal(38,0) squared sums. The between/within sums of
    * squares need Σ_g sv²/n — a double over a DOMAIN-BOUNDED grain, so
    * it folds over the SORTED group list (deterministic order both
    * engines replay); N, T, ΣQ stay exact integers/decimals until the
    * closed form. Output: k, n, ssb, ssw, f_stat (micro-unit² sums
    * scaled back to value units² by /1e12). */
  private def anovaF(perGroup: DataFrame): DataFrame = {
    val folded = perGroup
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("n")).as("nn"), sum(col("sv")).as("t"),
        sum(col("qv")).as("qq"),
        sort_array(collect_list(struct(col("g"), col("n"), col("sv"))))
          .as("gs"))
      .withColumn("sumsq", aggregate(col("gs"), lit(0.0d), (acc, x) =>
        acc + x.getField("sv").cast("double") * x.getField("sv").cast("double")
          / x.getField("n").cast("double")))
    folded.select(col("k"), col("nn").as("n"),
      ((col("sumsq") - col("t").cast("double") * col("t").cast("double")
        / col("nn").cast("double")) / lit(1.0e12d)).as("ssb0"),
      ((col("qq").cast("double") - col("sumsq")) / lit(1.0e12d)).as("ssw0"))
      .select(col("k"), col("n"),
        round(col("ssb0"), 4).as("ssb"), round(col("ssw0"), 4).as("ssw"),
        round((col("ssb0") / (col("k") - 1L).cast("double")) /
          (col("ssw0") / (col("n") - col("k")).cast("double")), 6)
          .as("f_stat"))
  }

  /** DuckDB replay of [[anovaF]] over a CTE named `g` with columns
    * (g, n, sv, qv) — same sorted-list fold, same operation order. */
  private val anovaFSql: String =
    """f0 AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
      |         sum(sv)::BIGINT AS t, sum(qv)::HUGEINT AS qq,
      |         list_sum(list_transform(
      |           list_sort(list(struct_pack(g := g, n := n, sv := sv))),
      |           x -> x.sv::DOUBLE * x.sv::DOUBLE / x.n::DOUBLE)) AS sumsq
      |       FROM g),
      |f1 AS (SELECT k, nn AS n,
      |         (sumsq - t::DOUBLE * t::DOUBLE / nn::DOUBLE) / 1.0e12 AS ssb0,
      |         (qq::DOUBLE - sumsq) / 1.0e12 AS ssw0
      |       FROM f0)
      |SELECT k, n, round(ssb0, 4) AS ssb, round(ssw0, 4) AS ssw,
      |       round((ssb0 / (k - 1)::DOUBLE) / (ssw0 / (n - k)::DOUBLE), 6)
      |         AS f_stat
      |FROM f1""".stripMargin

  // ---------------------------------------------------------------- q269
  /** One-way ANOVA: do the event types have the same mean value? The
    * parametric complement of q206's Kruskal–Wallis (KW compares rank
    * distributions; F compares means under equal-variance normality).
    * F = [SSB/(k−1)] / [SSW/(N−k)] from exact per-type micro-unit
    * sufficient statistics.
    *
    * The 100 TB shape: ONE map-side-combined aggregate to the
    * |types|-bounded grain (n, Σvm exact longs, Σvm² exact
    * decimal(38,0) — vm² alone can exceed 2^63); the only double sum
    * folds over the ≤|types| sorted groups. Output: k, n, ssb, ssw,
    * f_stat (value units²). */
  def q269AnovaF(s: SparkSession, dir: String): DataFrame =
    anovaF(Tables.events(s, dir)
      .select(col("event_type").as("g"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"),
        sum(col("vm").cast("decimal(38,0)") * col("vm")).as("qv")))
  val q269Sql: String =
    s"""WITH g AS (SELECT event_type AS g, count(*)::BIGINT AS n,
       |             sum(vm)::BIGINT AS sv,
       |             sum(vm::HUGEINT * vm::HUGEINT)::HUGEINT AS qv
       |           FROM (SELECT event_type,
       |                   round("value" * 1000000.0)::BIGINT AS vm
       |                 FROM events)
       |           GROUP BY 1),
       |$anovaFSql""".stripMargin

  // ---------------------------------------------------------------- q270
  /** Per-source Jensen–Shannon divergence from the rest of the corpus —
    * "which source is distributionally unusual", the symmetric
    * bounded-by-ln2 divergence behind mixture design and contamination
    * triage (PSI drifts per bin, MI couples two labels; JS compares a
    * source's whole token distribution against everything else).
    * JS(P‖Q) = ½ΣP·ln(P/M) + ½ΣQ·ln(Q/M), M = (P+Q)/2, P the source's
    * token distribution, Q the rest-of-corpus one.
    *
    * The 100 TB shape: tokens explode ONCE into a (source, token)
    * map-side-combined count; the global per-token frame derives from
    * it (no second text pass) and meets it in an equi-join on the
    * token's 60-bit fingerprint — text never shuffles, only hashed
    * longs. Each token's JS term integerizes to round(term·1e12)
    * micro-nats (both engines compute the identical double from
    * identical integer inputs, THEN round), so the data-scaled sum is
    * exact-integer order-independent. Output per source: source,
    * n_toks, js_nats. */
  def q270JsDivergence(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(col("source"), TextFunctions.md5Long(col("t")).as("th"))
    val bySrc = tok.groupBy(col("source"), col("th"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val glob = bySrc.groupBy(col("th")).agg(sum(col("c")).as("ct"))
    val nSrc = bySrc.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val nTot = glob.agg(sum(col("ct")).as("nt"))
    val joined = bySrc.join(glob, "th")
      .join(broadcast(nSrc), "source").crossJoin(broadcast(nTot))
    val p = col("c").cast("double") / col("ns").cast("double")
    val q = (col("ct") - col("c")).cast("double") /
      (col("nt") - col("ns")).cast("double")
    val m = (p + q) / lit(2.0d)
    // One-sided tokens: the q=0 term contributes only ½p·ln(p/m) (and
    // symmetrically); tokens absent from the source never appear in
    // bySrc, so their ½q·ln(q/m) mass is added from the REST-only
    // frame below.
    val term = when(col("ct") > col("c"),
      lit(0.5d) * p * log(p / m) + lit(0.5d) * q * log(q / m))
      .otherwise(lit(0.5d) * p * log(p / m))
    // Tokens the source never emits: p=0, m=q/2, term = ½q·ln(2) — so
    // the missing mass is ½·ln2·(share of rest tokens absent from the
    // source), computed from counts alone (rest_present = Σ_t∈src
    // (ct−c)). ONE aggregation over the token-grain join computes both
    // sums (the oracle's sm CTE shape) — a second groupBy would re-run
    // the join and the glob aggregate, the exact shared-frame re-compute
    // this repo's perf history warns about.
    joined
      .select(col("source"), col("ns"), col("nt"),
        round(term * lit(1.0e12d), 0).cast("long").as("tm"),
        (col("ct") - col("c")).as("rest_c"))
      .groupBy(col("source"), col("ns"), col("nt"))
      .agg(sum(col("tm")).as("sm"), sum(col("rest_c")).as("rest_present"))
      .select(col("source"), col("ns").as("n_toks"),
        round(col("sm").cast("double") / lit(1.0e12d) +
          lit(0.5d) * log(lit(2.0d)) *
            (lit(1.0d) - col("rest_present").cast("double") /
              (col("nt") - col("ns")).cast("double")), 6).as("js_nats"))
  }
  val q270Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH tok AS (SELECT source, ${mid("t")} AS th
       |             FROM (SELECT source, unnest(string_split_regex(
       |                     trim(lower(text)), '\\s+')) AS t FROM documents)),
       |bysrc AS (SELECT source, th, count(*)::BIGINT AS c
       |          FROM tok GROUP BY 1, 2),
       |gtok AS (SELECT th, sum(c)::BIGINT AS ct FROM bysrc GROUP BY 1),
       |nsrc AS (SELECT source, sum(c)::BIGINT AS ns FROM bysrc GROUP BY 1),
       |ntot AS (SELECT sum(ct)::BIGINT AS nt FROM gtok),
       |j AS (SELECT source, c, ct, ns, nt,
       |        c::DOUBLE / ns::DOUBLE AS p,
       |        (ct - c)::DOUBLE / (nt - ns)::DOUBLE AS q
       |      FROM bysrc JOIN gtok USING (th)
       |      JOIN nsrc USING (source) CROSS JOIN ntot),
       |tm AS (SELECT source,
       |         round((CASE WHEN ct > c THEN
       |             0.5 * p * ln(p / ((p + q) / 2.0))
       |               + 0.5 * q * ln(q / ((p + q) / 2.0))
       |           ELSE 0.5 * p * ln(p / ((p + q) / 2.0)) END)
       |           * 1.0e12)::BIGINT AS tm,
       |         ct - c AS rest_c, ns, nt
       |       FROM j),
       |sm AS (SELECT source, sum(tm)::BIGINT AS sm,
       |         sum(rest_c)::BIGINT AS rest_present,
       |         any_value(ns) AS ns, any_value(nt) AS nt
       |       FROM tm GROUP BY 1)
       |SELECT source, ns AS n_toks,
       |       round(sm::DOUBLE / 1.0e12
       |         + 0.5 * ln(2.0) * (1.0 - rest_present::DOUBLE
       |             / (nt - ns)::DOUBLE), 6) AS js_nats
       |FROM sm""".stripMargin
  }

  // ---------------------------------------------------------------- q271
  /** Within-document repetition signals (Rae et al. 2021 "Gopher"
    * Table A1's duplicate-n-gram family): per document, the fraction of
    * 3-gram occurrences that are within-doc duplicates, and the share
    * of 2-gram occurrences taken by the single most frequent 2-gram —
    * the two screens that catch boilerplate loops and keyword stuffing
    * that q19's global ratios miss.
    *
    * The 100 TB shape: pure scan-local higher-order functions — gram
    * arrays, array_distinct, and a sorted-run-length fold all happen
    * inside the row's projection; NOTHING explodes and nothing
    * shuffles (the output is one row per doc). Output: doc_id, n3,
    * dup3_frac, top2_share, is_repetitive. */
  def q271Repetition(s: SparkSession, dir: String): DataFrame = {
    // Short-doc guard (the DedupFunctions.shingles trap): sequence(1, 0)
    // steps BACKWARDS to [1, 0] and slice(toks, 0, n) throws — a doc
    // with fewer than n tokens must produce an EMPTY gram list, as the
    // oracle's range(1, 1) does.
    def grams(n: Int): Column = expr(
      s"""IF(size(toks) >= $n,
         |   transform(sequence(1, size(toks) - ${n - 1}),
         |     i -> concat_ws(' ', slice(toks, i, $n))),
         |   cast(array() as array<string>))""".stripMargin)
    // Longest run of equal neighbors in the SORTED gram list = the top
    // gram's occurrence count — a left-to-right fold both engines
    // replay in the same order.
    def topCount(gramsCol: Column): Column = {
      val sorted = sort_array(gramsCol)
      aggregate(sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"),
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        }).getField("best")
    }
    docs(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("g3", grams(3)).withColumn("g2", grams(2))
      .select(col("doc_id"),
        size(col("g3")).cast("long").as("n3"),
        // A doc with NO 3-grams is not "fully duplicated": publish 0.0,
        // not the 1 − 0/1 artifact of the guard denominator.
        when(size(col("g3")) > 0,
          lit(1.0d) - size(array_distinct(col("g3"))).cast("double") /
            size(col("g3")).cast("double")).otherwise(lit(0.0d))
          .as("dup3_0"),
        (topCount(col("g2")).cast("double") /
          greatest(size(col("g2")), lit(1)).cast("double")).as("top2_0"))
      .select(col("doc_id"), col("n3"),
        round(col("dup3_0"), 6).as("dup3_frac"),
        round(col("top2_0"), 6).as("top2_share"),
        (col("dup3_0") > 0.18d || col("top2_0") > 0.18d).as("is_repetitive"))
  }
  val q271Sql: String = {
    def gramsSql(n: Int) =
      s"""list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
         |      i -> array_to_string(toks[i:i+${n - 1}], ' '))""".stripMargin
    s"""WITH d AS (SELECT doc_id,
       |             string_split_regex(trim(lower(text)), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, ${gramsSql(3)} AS g3, ${gramsSql(2)} AS g2
       |      FROM d),
       |r AS (SELECT doc_id,
       |        len(g3)::BIGINT AS n3,
       |        CASE WHEN len(g3) > 0 THEN 1.0 - len(list_distinct(g3))::DOUBLE
       |          / len(g3)::DOUBLE ELSE 0.0 END AS dup3_0,
       |        (SELECT max(cnt) FROM (
       |           SELECT count(*) AS cnt FROM unnest(g2) AS u(x) GROUP BY x
       |         ))::DOUBLE / greatest(len(g2), 1)::DOUBLE AS top2_0
       |      FROM g)
       |SELECT doc_id, n3, round(dup3_0, 6) AS dup3_frac,
       |       round(coalesce(top2_0, 0.0), 6) AS top2_share,
       |       (dup3_0 > 0.18 OR coalesce(top2_0, 0.0) > 0.18)
       |         AS is_repetitive
       |FROM r""".stripMargin
  }

  // ---------------------------------------------------------------- q272
  /** Brown–Forsythe variance-homogeneity test: do the event types have
    * the same value SPREAD? Levene's test with the median center (the
    * robust variant): z = |vm − median_type|, then one-way ANOVA F on
    * z by type — the gate before trusting q269's equal-variance
    * assumption.
    *
    * The 100 TB shape: per-type medians come from the per-(type, value)
    * exact-count grain through [[PrefixScan.scanGrouped]] cumulative
    * counts (a partitionBy(type) window would single-task each type's
    * whole distinct-value frame) — the lower median (first value whose
    * cumulative count reaches ⌈n/2⌉) keeps every downstream z exact
    * integer micro-units; the ≤|types|-row median frame broadcasts
    * back, and the F reuses the q269 kernel. Output: k, n, ssb, ssw,
    * f_stat. */
  def q272BrownForsythe(s: SparkSession, dir: String): DataFrame = {
    val vm = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val perValue = vm.groupBy(col("g"), col("vm"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val scanned = PrefixScan.scanGrouped(perValue, "g", col("vm"),
      Seq(col("vm")), Seq(PrefixScan.RunSum(col("c"), "cum")), cache = true)
    val nG = perValue.groupBy(col("g")).agg(sum(col("c")).as("ng"))
    val med = scanned.join(broadcast(nG), "g")
      .filter(col("cum") * 2L >= col("ng") + (col("ng") % 2L))
      .groupBy(col("g")).agg(min(col("vm")).as("med"))
    anovaF(vm.join(broadcast(med), "g")
      .select(col("g"), abs(col("vm") - col("med")).as("z"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("z")).as("sv"),
        sum(col("z").cast("decimal(38,0)") * col("z")).as("qv")))
  }
  val q272Sql: String =
    s"""WITH vm AS (SELECT event_type AS g,
       |              round("value" * 1000000.0)::BIGINT AS vm FROM events),
       |pv AS (SELECT g, vm, count(*)::BIGINT AS c FROM vm GROUP BY 1, 2),
       |sc AS (SELECT g, vm, sum(c) OVER (PARTITION BY g ORDER BY vm)
       |         ::BIGINT AS cum FROM pv),
       |ng AS (SELECT g, sum(c)::BIGINT AS ng FROM pv GROUP BY 1),
       |med AS (SELECT g, min(vm) AS med
       |        FROM sc JOIN ng USING (g)
       |        WHERE cum * 2 >= ng + (ng % 2) GROUP BY 1),
       |g AS (SELECT vm.g AS g, count(*)::BIGINT AS n,
       |        sum(abs(vm - med))::BIGINT AS sv,
       |        sum(abs(vm - med)::HUGEINT * abs(vm - med)::HUGEINT)
       |          ::HUGEINT AS qv
       |      FROM vm JOIN med ON vm.g = med.g GROUP BY 1),
       |$anovaFSql""".stripMargin

  // ---------------------------------------------------------------- q273
  /** James–Stein / empirical-Bayes shrinkage of per-source mean quality
    * (Efron & Morris 1975): a source with few documents gets its mean
    * q19 quality pulled toward the corpus mean in proportion to its
    * sampling noise — the estimator behind trustworthy per-source
    * curation decisions when source sizes are wildly unequal.
    * θ̂_s = m + B·(x̄_s − m), B = max(0, 1 − (k−3)·v̂ / Σ(x̄_s − m)²),
    * v̂ the mean per-source sampling variance s²_s/n_s.
    *
    * The 100 TB shape (the q64 pattern): per-doc quality rounds to
    * exact micro-units in the scan, so the per-source sufficient
    * statistics (n, Σq, Σq² — the last in decimal(38,0)) are one
    * map-side-combined aggregate; everything after runs on the
    * ≤|sources| grain with the only double folds over the SORTED
    * source list. Output: source, n, mean_q, shrink_b, shrunk_q. */
  def q273JamesStein(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir)
      .select(col("source"),
        round(TextFunctions.qualityScore(col("text")) * 1000000.0d, 0)
          .cast("long").as("qm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("qm")).as("sv"),
        sum(col("qm").cast("decimal(38,0)") * col("qm")).as("qv"))
      .localCheckpoint(true)
    val folded = g
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("n")).as("nn"), sum(col("sv")).as("t"),
        sort_array(collect_list(struct(col("source"), col("n"), col("sv"),
          col("qv")))).as("gs"))
      .withColumn("m", col("t").cast("double") / col("nn").cast("double"))
      .withColumn("ssm", aggregate(col("gs"), lit(0.0d), (acc, x) =>
        acc + (x.getField("sv").cast("double") / x.getField("n").cast("double")
          - col("m")) *
          (x.getField("sv").cast("double") / x.getField("n").cast("double")
            - col("m"))))
      // A 1-doc source has no within-variance estimate — its term is
      // 0/0 = NaN and would poison the whole fold; contribute 0 instead
      // (its sampling variance is simply unknown).
      .withColumn("vhat", aggregate(col("gs"), lit(0.0d), (acc, x) => {
        val n = x.getField("n").cast("double")
        val sv = x.getField("sv").cast("double")
        val qv = x.getField("qv").cast("double")
        acc + when(x.getField("n") > 1L,
          ((qv - sv * sv / n) / (n - 1.0d)) / n).otherwise(lit(0.0d))
      }) / col("k").cast("double"))
      // Clamp to [0, 1]: k ≤ 3 sources makes (k−3) ≤ 0 and the raw
      // factor > 1 — an EXPANSION away from the mean, which James–Stein
      // never licenses; 1 = no shrinkage is the honest degenerate case.
      .withColumn("b", least(lit(1.0d), greatest(lit(0.0d),
        lit(1.0d) - (col("k") - 3L).cast("double") * col("vhat") /
          col("ssm"))))
      .select(col("m"), col("b"))
    g.crossJoin(broadcast(folded))
      .select(col("source"), col("n"),
        round(col("sv").cast("double") / col("n").cast("double") / lit(1.0e6d),
          6).as("mean_q"),
        round(col("b"), 6).as("shrink_b"),
        round((col("m") + col("b") *
          (col("sv").cast("double") / col("n").cast("double") - col("m")))
          / lit(1.0e6d), 6).as("shrunk_q"))
  }
  val q273Sql: String = {
    // q19's quality construction via the SHARED fragments (one
    // definition — this oracle cannot drift from q19Sql), micro-unitized.
    s"""WITH t AS (SELECT source, text, ${QueriesExt.toksSql} AS toks
       |           FROM documents),
       |m AS (SELECT source, len(toks) AS n_tokens,
       |        ${QueriesExt.punctRatioSql("text")} AS pr,
       |        ${QueriesExt.stopRatioSql("toks")} AS sr
       |      FROM t),
       |q AS (SELECT source,
       |        round(${QueriesExt.qualityScoreSql("n_tokens", "pr", "sr")}
       |          * 1000000.0)::BIGINT AS qm
       |      FROM m),
       |g AS (SELECT source, count(*)::BIGINT AS n, sum(qm)::BIGINT AS sv,
       |        sum(qm::HUGEINT * qm::HUGEINT)::HUGEINT AS qv
       |      FROM q GROUP BY 1),
       |f0 AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
       |         sum(sv)::BIGINT AS t,
       |         list_sort(list(struct_pack(source := source, n := n,
       |           sv := sv, qv := qv))) AS gs
       |       FROM g),
       |f1 AS (SELECT k, t::DOUBLE / nn::DOUBLE AS m,
       |         list_sum(list_transform(gs, x ->
       |           (x.sv::DOUBLE / x.n::DOUBLE - t::DOUBLE / nn::DOUBLE)
       |           * (x.sv::DOUBLE / x.n::DOUBLE - t::DOUBLE / nn::DOUBLE)))
       |           AS ssm,
       |         list_sum(list_transform(gs, x ->
       |           CASE WHEN x.n > 1 THEN
       |             ((x.qv::DOUBLE - x.sv::DOUBLE * x.sv::DOUBLE / x.n::DOUBLE)
       |               / (x.n::DOUBLE - 1.0)) / x.n::DOUBLE
       |           ELSE 0.0 END)) / k::DOUBLE AS vhat
       |       FROM f0),
       |f2 AS (SELECT m,
       |         least(1.0, greatest(0.0, 1.0 - (k - 3)::DOUBLE * vhat / ssm))
       |           AS b
       |       FROM f1)
       |SELECT source, n,
       |       round(sv::DOUBLE / n::DOUBLE / 1.0e6, 6) AS mean_q,
       |       round(b, 6) AS shrink_b,
       |       round((m + b * (sv::DOUBLE / n::DOUBLE - m)) / 1.0e6, 6)
       |         AS shrunk_q
       |FROM g CROSS JOIN f2""".stripMargin
  }

  // ---------------------------------------------------------------- q274
  /** Calibration diagram + Brier score for the rank-percentile score
    * (the eval-metric complement of q239's isotonic CALIBRATOR and
    * q265's AUC): treating the plane-0 projection's global rank
    * percentile p̂ = rank/N as a predicted probability of label 0, bin
    * into deciles and compare mean p̂ against the observed positive
    * rate, plus the overall Brier score (1/N)Σ(p̂ − y)².
    *
    * The 100 TB shape: the global rank comes from [[PrefixScan]]'s
    * two-pass RowNumber (exact integers, no single-partition sort);
    * the decile key is integer arithmetic, the per-bin frame is
    * 10-row bounded, and the Brier numerator Σrank² − 2NΣ₊rank + N²n₊
    * is EXACT integer algebra with one final division. Output per
    * decile: bin, n_bin, mean_pred, frac_pos, brier (corpus-level,
    * repeated). */
  def q274Calibration(s: SparkSession, dir: String): DataFrame = {
    val planes = graft.functions.Similarity.deterministicPlanes(2, 64)
    val score = graft.functions.Similarity.dot(col("v"),
      array(planes(0).map(p => lit(p.toDouble)): _*))
    val scored = QueriesExt.embs(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"), score.as("s"))
    val ranked = PrefixScan.scan(scored, col("s"),
      Seq(col("s"), col("vec_id")), Seq(PrefixScan.RowNumber("rank")),
      cache = true)
    val tot = ranked.agg(count(lit(1)).as("nn"),
      sum(col("y")).as("npos"),
      sum(col("rank").cast("decimal(38,0)") * col("rank")).as("sr2"),
      sum(when(col("y") === 1L, col("rank")).otherwise(0L)).as("srp"))
    val brier = tot.select(col("nn"), ((col("sr2").cast("double")
      - lit(2.0d) * col("nn").cast("double") * col("srp").cast("double")
      + col("nn").cast("double") * col("nn").cast("double")
        * col("npos").cast("double"))
      / (col("nn").cast("double") * col("nn").cast("double")
        * col("nn").cast("double"))).as("brier0"))
    ranked.crossJoin(broadcast(brier))
      .withColumn("bin", expr("(rank * 10 + nn - 1) div nn"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_bin"),
        round(sum(col("rank")).cast("double") /
          (max(col("nn")).cast("double") * count(lit(1)).cast("double")), 6)
          .as("mean_pred"),
        round(sum(col("y")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("frac_pos"),
        round(max(col("brier0")), 6).as("brier"))
  }
  val q274Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
       |           FROM embeddings),
       |sc AS (SELECT vec_id, y, ${QueriesExt.projSql("v", 0)} AS s FROM e),
       |r AS (SELECT y,
       |        row_number() OVER (ORDER BY s, vec_id)::BIGINT AS rank
       |      FROM sc),
       |t AS (SELECT count(*)::BIGINT AS nn, sum(y)::BIGINT AS npos,
       |        sum(rank::HUGEINT * rank::HUGEINT)::HUGEINT AS sr2,
       |        sum(CASE WHEN y = 1 THEN rank ELSE 0 END)::BIGINT AS srp
       |      FROM r),
       |b AS (SELECT nn, (sr2::DOUBLE - 2.0 * nn::DOUBLE * srp::DOUBLE
       |        + nn::DOUBLE * nn::DOUBLE * npos::DOUBLE)
       |        / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE) AS brier0
       |      FROM t)
       |SELECT (rank * 10 + nn - 1) // nn AS bin, count(*)::BIGINT AS n_bin,
       |       round(sum(rank)::DOUBLE / (max(nn)::DOUBLE * count(*)::DOUBLE),
       |         6) AS mean_pred,
       |       round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) AS frac_pos,
       |       round(max(brier0), 6) AS brier
       |FROM r CROSS JOIN b GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q275
  /** Average precision (the PR-curve area, next to q265's ROC AUC —
    * AP weighs early precision, which is what retrieval and filter
    * tuning actually optimize): rank all embeddings by the plane-0
    * score DESCENDING, AP = (1/n₊) Σ_{k: y_k=1} precision@k, plus the
    * operational precision@100.
    *
    * The 100 TB shape: the descending global rank and the running
    * positive count both come from ONE [[PrefixScan]] two-pass run
    * (exact integers); each positive's precision@k = cum₊/k
    * integerizes to round(1e12·cum₊/k) micro-units (identical double
    * from identical integer inputs, THEN rounded) so the data-scaled
    * sum is order-independent. Output: n, n_pos, ap, p_at_100. */
  def q275AveragePrecision(s: SparkSession, dir: String): DataFrame = {
    val planes = graft.functions.Similarity.deterministicPlanes(2, 64)
    val score = graft.functions.Similarity.dot(col("v"),
      array(planes(0).map(p => lit(p.toDouble)): _*))
    val scored = QueriesExt.embs(s, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"),
        negate(score).as("ns"))
    val ranked = PrefixScan.scan(scored, col("ns"),
      Seq(col("ns"), col("vec_id")),
      Seq(PrefixScan.RowNumber("rank"), PrefixScan.RunSum(col("y"), "cpos")),
      cache = true)
    ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(when(col("y") === 1L,
          round(lit(1.0e12d) * col("cpos").cast("double") /
            col("rank").cast("double"), 0).cast("long"))
          .otherwise(0L)).as("apm"),
        max(when(col("rank") === 100L, col("cpos"))).as("c100"))
      .select(col("n"), col("n_pos"),
        round(col("apm").cast("double") / lit(1.0e12d) /
          col("n_pos").cast("double"), 6).as("ap"),
        round(col("c100").cast("double") / lit(100.0d), 6).as("p_at_100"))
  }
  val q275Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
       |           FROM embeddings),
       |sc AS (SELECT vec_id, y, -(${QueriesExt.projSql("v", 0)}) AS ns
       |       FROM e),
       |r AS (SELECT y,
       |        row_number() OVER (ORDER BY ns, vec_id)::BIGINT AS rank,
       |        sum(y) OVER (ORDER BY ns, vec_id)::BIGINT AS cpos
       |      FROM sc)
       |SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
       |       round(sum(CASE WHEN y = 1 THEN
       |           round(1.0e12 * cpos::DOUBLE / rank::DOUBLE)::BIGINT
       |         ELSE 0 END)::DOUBLE / 1.0e12 / sum(y)::DOUBLE, 6) AS ap,
       |       round(max(CASE WHEN rank = 100 THEN cpos END)::DOUBLE / 100.0,
       |         6) AS p_at_100
       |FROM r""".stripMargin

  // ---------------------------------------------------------------- q276
  /** Contrastive triplet mining — the training-data op behind embedding
    * fine-tuning (anchor, positive, negative): positives are q32's
    * SRP-bucketed cosine near-dup pairs VERBATIM (one definition, the
    * pair plan already verified), negatives are a deterministic
    * hash-pick from the same universe, with the honesty flag `neg_ok`
    * false when the pick collides with the anchor/positive or is
    * itself a known neighbor (flagged, not silently re-picked — the
    * consumer decides).
    *
    * The 100 TB shape: the md5-ordered pick frame is ONE [[PrefixScan]]
    * RowNumber over the universe (exact integers), the pick is an
    * equi-join on rank, and the neighbor check is one more equi-join on
    * the canonical pair key — no random() anywhere, so both engines
    * mine the identical triplets. Output: anchor, positive, sim,
    * negative, neg_ok. */
  def q276Triplets(s: SparkSession, dir: String): DataFrame = {
    val pos = QueriesExt.q32CosineNearDup(s, dir).localCheckpoint(true)
    val universe = QueriesExt.withInjectedNearDups(s, dir)
      .select(col("vec_id"))
    val ranked = PrefixScan.scan(universe,
      TextFunctions.md5Long(col("vec_id").cast("string")),
      Seq(TextFunctions.md5Long(col("vec_id").cast("string")), col("vec_id")),
      Seq(PrefixScan.RowNumber("rk")), cache = true)
      .select(col("rk"), col("vec_id").as("negative"))
    val n = universe.count()
    val picked = pos
      .withColumn("rk", pmod(TextFunctions.md5Long(
        concat(lit("neg|"), col("id_a").cast("string"), lit("|"),
          col("id_b").cast("string"))), lit(n)) + 1L)
      .join(ranked, "rk")
    // Screen BOTH legs against the known-neighbor pair set: a pick
    // that is a near-dup of the anchor OR of the positive is a false
    // negative either way (r11 review: the positive leg was unchecked,
    // so a positive's near-twin could slip through with neg_ok=true).
    val canon = pos.select(least(col("id_a"), col("id_b")).as("pl"),
      greatest(col("id_a"), col("id_b")).as("ph"), lit(true).as("is_nbr"))
      .localCheckpoint(true)
    picked
      .join(canon,
        least(col("id_a"), col("negative")) === col("pl") &&
          greatest(col("id_a"), col("negative")) === col("ph"), "left")
      .withColumnRenamed("is_nbr", "nbr_a")
      .drop("pl", "ph")
      .join(canon,
        least(col("id_b"), col("negative")) === col("pl") &&
          greatest(col("id_b"), col("negative")) === col("ph"), "left")
      .withColumnRenamed("is_nbr", "nbr_b")
      .select(col("id_a").as("anchor"), col("id_b").as("positive"),
        col("sim"), col("negative"),
        (col("negative") =!= col("id_a") && col("negative") =!= col("id_b") &&
          coalesce(col("nbr_a"), lit(false)) === false &&
          coalesce(col("nbr_b"), lit(false)) === false).as("neg_ok"))
  }
  val q276Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH pos AS (${QueriesExt.oracles("q32_cosine_neardup")}),
       |uni AS (SELECT vec_id FROM embeddings
       |        UNION ALL SELECT vec_id + 1000000 FROM embeddings
       |                  WHERE vec_id % 17 = 0),
       |rk AS (SELECT vec_id AS negative,
       |         row_number() OVER (ORDER BY ${mid("vec_id::VARCHAR")},
       |           vec_id)::BIGINT AS rk
       |       FROM uni),
       |n AS (SELECT count(*)::BIGINT AS n FROM uni),
       |pk AS (SELECT id_a, id_b, sim,
       |         (${mid("'neg|' || id_a || '|' || id_b")} % n + n) % n + 1
       |           AS rk
       |       FROM pos CROSS JOIN n),
       |tri AS (SELECT id_a, id_b, sim, negative
       |        FROM pk JOIN rk USING (rk))
       |SELECT id_a AS anchor, id_b AS positive, sim, negative,
       |       (negative <> id_a AND negative <> id_b
       |         AND NOT EXISTS (SELECT 1 FROM pos p
       |           WHERE least(p.id_a, p.id_b) = least(tri.id_a, tri.negative)
       |             AND greatest(p.id_a, p.id_b)
       |               = greatest(tri.id_a, tri.negative))
       |         AND NOT EXISTS (SELECT 1 FROM pos p
       |           WHERE least(p.id_a, p.id_b) = least(tri.id_b, tri.negative)
       |             AND greatest(p.id_a, p.id_b)
       |               = greatest(tri.id_b, tri.negative))) AS neg_ok
       |FROM tri""".stripMargin
  }

  // ---------------------------------------------------------------- q277
  /** Simpson's-paradox detector: does the value-vs-hour-of-day trend
    * REVERSE when stratified by event type? Per-type OLS slope vs the
    * pooled slope from the SAME sufficient statistics — the classic
    * confounding screen before trusting any pooled trend.
    *
    * The 100 TB shape: one map-side-combined aggregate to the
    * |types|-bounded grain carrying exact integer sums (n, Σx, Σx²,
    * Σy, Σxy — the cross term in decimal(38,0)); the pooled stats are
    * the exact integer COLUMN SUMS of the same frame (no second scan),
    * and both slopes are closed forms. Output per type: event_type, n,
    * slope_type, slope_pooled, sign_flip. */
  def q277Simpson(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("x"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("vm")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("vm")).as("sxy"))
      .localCheckpoint(true)
    def slope(n: Column, sx: Column, sxx: Column, sy: Column,
              sxy: Column): Column =
      (n.cast("double") * sxy.cast("double") -
        sx.cast("double") * sy.cast("double")) /
        (n.cast("double") * sxx.cast("double") -
          sx.cast("double") * sx.cast("double")) / lit(1.0e6d)
    val pooled = g.agg(sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
      sum(col("sxx")).as("psxx"), sum(col("sy")).as("psy"),
      sum(col("sxy")).as("psxy"))
      .select(slope(col("pn"), col("psx"), col("psxx"), col("psy"),
        col("psxy")).as("sp"))
    g.crossJoin(broadcast(pooled))
      .select(col("event_type"), col("n"),
        round(slope(col("n"), col("sx"), col("sxx"), col("sy"), col("sxy")),
          6).as("slope_type"),
        round(col("sp"), 6).as("slope_pooled"),
        (slope(col("n"), col("sx"), col("sxx"), col("sy"), col("sxy")) *
          col("sp") < 0.0d).as("sign_flip"))
  }
  val q277Sql: String =
    s"""WITH ev AS (SELECT event_type, hour(ts)::BIGINT AS x,
       |              round("value" * 1000000.0)::BIGINT AS vm FROM events),
       |g AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
       |        sum(x * x)::BIGINT AS sxx, sum(vm)::BIGINT AS sy,
       |        sum(x::HUGEINT * vm::HUGEINT)::HUGEINT AS sxy
       |      FROM ev GROUP BY 1),
       |p AS (SELECT (sum(n)::DOUBLE * sum(sxy)::DOUBLE
       |          - sum(sx)::DOUBLE * sum(sy)::DOUBLE)
       |        / (sum(n)::DOUBLE * sum(sxx)::DOUBLE
       |          - sum(sx)::DOUBLE * sum(sx)::DOUBLE) / 1.0e6 AS sp
       |      FROM g)
       |SELECT event_type, n,
       |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |         / 1.0e6, 6) AS slope_type,
       |       round(sp, 6) AS slope_pooled,
       |       ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |         / 1.0e6 * sp < 0.0) AS sign_flip
       |FROM g CROSS JOIN p""".stripMargin

  // ---------------------------------------------------------------- q278
  /** Offline changepoint detection (binary segmentation, first split):
    * the single day that best splits the daily event-volume series into
    * two constant segments — gain(t) = cum_t²/t + (T−cum_t)²/(n−t) −
    * T²/n, the between-segment sum of squares. The OFFLINE complement
    * of q227's CUSUM and q262's Page–Hinkley (those detect online; this
    * names the most likely break in hindsight).
    *
    * The 100 TB shape (the q262 discipline): the raw stream collapses
    * to the CALENDAR-BOUNDED daily grain first; the cumulative sums run
    * through [[graft.functions.BoundedWindow]] (≤ ~92 rows, a single
    * task is the correct plan and the declared one), gains are exact
    * integer algebra cast once, and the argmax is a ≤92-row top-1.
    * Output: split_day, n_left, n_right, mean_left, mean_right, gain. */
  def q278Changepoint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BoundedWindow
    val daily = Tables.events(s, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = BoundedWindow.orderBy(col("day"), col("day"))
    val cum = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cs", sum(col("x")).over(w))
      .withColumn("nt", count(lit(1)).over(BoundedWindow.all(col("day"))))
      .withColumn("tt", sum(col("x")).over(BoundedWindow.all(col("day"))))
      .filter(col("i") < col("nt"))
    val gains = cum.select(col("day"), col("i"), col("cs"), col("nt"),
      col("tt"),
      (col("cs").cast("double") * col("cs").cast("double") /
        col("i").cast("double") +
        (col("tt") - col("cs")).cast("double") *
          (col("tt") - col("cs")).cast("double") /
          (col("nt") - col("i")).cast("double") -
        col("tt").cast("double") * col("tt").cast("double") /
          col("nt").cast("double")).as("gain0"))
    gains.orderBy(col("gain0").desc, col("day").asc).limit(1)
      .select(col("day").as("split_day"), col("i").as("n_left"),
        (col("nt") - col("i")).as("n_right"),
        round(col("cs").cast("double") / col("i").cast("double"), 6)
          .as("mean_left"),
        round((col("tt") - col("cs")).cast("double") /
          (col("nt") - col("i")).cast("double"), 6).as("mean_right"),
        round(col("gain0"), 4).as("gain"))
  }
  val q278Sql: String =
    """WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x FROM events GROUP BY 1),
      |c AS (SELECT day,
      |        row_number() OVER (ORDER BY day)::BIGINT AS i,
      |        sum(x) OVER (ORDER BY day)::BIGINT AS cs,
      |        count(*) OVER ()::BIGINT AS nt,
      |        sum(x) OVER ()::BIGINT AS tt
      |      FROM daily),
      |g AS (SELECT day, i, cs, nt, tt,
      |        cs::DOUBLE * cs::DOUBLE / i::DOUBLE
      |          + (tt - cs)::DOUBLE * (tt - cs)::DOUBLE / (nt - i)::DOUBLE
      |          - tt::DOUBLE * tt::DOUBLE / nt::DOUBLE AS gain0
      |      FROM c WHERE i < nt)
      |SELECT day AS split_day, i AS n_left, (nt - i) AS n_right,
      |       round(cs::DOUBLE / i::DOUBLE, 6) AS mean_left,
      |       round((tt - cs)::DOUBLE / (nt - i)::DOUBLE, 6) AS mean_right,
      |       round(gain0, 4) AS gain
      |FROM g ORDER BY gain0 DESC, day ASC LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q279
  /** Embedding-space coverage report: how evenly does the corpus fill
    * its projection grid? Shannon entropy of the q264 0.5-grid cell
    * occupancy, the bounding-box coverage fraction, and Pielou
    * evenness H/ln(cells) — the curation dashboard for "is this corpus
    * diverse or ten dense blobs".
    *
    * The 100 TB shape: two literal-plane projections in the scan →
    * integer cell key → ONE map-side-combined cell count; every
    * entropy term integerizes to round(1e12·(−p·ln p)) micro-nats so
    * the data-scaled sum is exact-integer order-independent; bbox and
    * counts are exact integer aggregates. Output: n_vecs, n_cells,
    * bbox_cells, coverage, entropy_nats, evenness. */
  def q279CoverageEntropy(s: SparkSession, dir: String): DataFrame = {
    val planes = graft.functions.Similarity.deterministicPlanes(2, 64)
    def proj(j: Int) = graft.functions.Similarity.dot(col("v"),
      array(planes(j).map(p => lit(p.toDouble)): _*))
    val cells = QueriesExt.embs(s, dir)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(floor(proj(0) / lit(0.5d)).cast("long").as("cx"),
        floor(proj(1) / lit(0.5d)).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum(col("c")).as("nt"))
    cells.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("c"), col("nt"),
        round(lit(-1.0e12d) * (col("c").cast("double") / col("nt").cast("double")) *
          log(col("c").cast("double") / col("nt").cast("double")), 0)
          .cast("long").as("hm"))
      .agg(max(col("nt")).as("n_vecs"), count(lit(1)).as("n_cells"),
        ((max(col("cx")) - min(col("cx")) + 1L) *
          (max(col("cy")) - min(col("cy")) + 1L)).as("bbox_cells"),
        sum(col("hm")).as("hsum"))
      .select(col("n_vecs"), col("n_cells"), col("bbox_cells"),
        round(col("n_cells").cast("double") / col("bbox_cells").cast("double"),
          6).as("coverage"),
        round(col("hsum").cast("double") / lit(1.0e12d), 6).as("entropy_nats"),
        round(col("hsum").cast("double") / lit(1.0e12d) /
          log(col("n_cells").cast("double")), 6).as("evenness"))
  }
  val q279Sql: String =
    s"""WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT floor(${QueriesExt.projSql("v", 0)} / 0.5)::BIGINT AS cx,
       |        floor(${QueriesExt.projSql("v", 1)} / 0.5)::BIGINT AS cy
       |      FROM e),
       |cc AS (SELECT cx, cy, count(*)::BIGINT AS c FROM c GROUP BY 1, 2),
       |t AS (SELECT sum(c)::BIGINT AS nt FROM cc),
       |h AS (SELECT cx, cy, c, nt,
       |        round(-1.0e12 * (c::DOUBLE / nt::DOUBLE)
       |          * ln(c::DOUBLE / nt::DOUBLE))::BIGINT AS hm
       |      FROM cc CROSS JOIN t),
       |a AS (SELECT max(nt)::BIGINT AS n_vecs, count(*)::BIGINT AS n_cells,
       |        ((max(cx) - min(cx) + 1) * (max(cy) - min(cy) + 1))::BIGINT
       |          AS bbox_cells,
       |        sum(hm)::BIGINT AS hsum
       |      FROM h)
       |SELECT n_vecs, n_cells, bbox_cells,
       |       round(n_cells::DOUBLE / bbox_cells::DOUBLE, 6) AS coverage,
       |       round(hsum::DOUBLE / 1.0e12, 6) AS entropy_nats,
       |       round(hsum::DOUBLE / 1.0e12 / ln(n_cells::DOUBLE), 6)
       |         AS evenness
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- q280
  /** SAX symbolization (Lin et al. 2003) of the daily event-volume
    * series: z-normalize, map each day to a 4-letter Gaussian-breakpoint
    * alphabet (±0.6745 are the normal quartiles), and emit each day's
    * 3-day word — the discretization behind motif discovery and cheap
    * subsequence indexing over long series.
    *
    * The 100 TB shape (the q262/q278 discipline): the raw stream
    * collapses to the CALENDAR-BOUNDED daily grain first; mean/std come
    * from exact integer sums (Σx long, Σx² decimal) with one double
    * closed form; the 3-day word is two leads over a [[graft.functions
    * .BoundedWindow]] (≤ ~92 rows). Output: day, n_events, z, sym,
    * word3 (NULL for the final two days — no full word exists). */
  def q280Sax(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BoundedWindow
    val daily = Tables.events(s, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
    val z0 = (col("x").cast("double") -
      col("t").cast("double") / col("n").cast("double")) /
      sqrt((col("q").cast("double") -
        col("t").cast("double") * col("t").cast("double") /
          col("n").cast("double")) / col("n").cast("double"))
    val w = BoundedWindow.orderBy(col("day"), col("day"))
    daily.crossJoin(broadcast(stats))
      .withColumn("z", round(z0, 6))
      .withColumn("sym",
        when(col("z") < -0.6745d, "a").when(col("z") < 0.0d, "b")
          .when(col("z") < 0.6745d, "c").otherwise("d"))
      .withColumn("word3",
        concat(col("sym"), lead(col("sym"), 1).over(w),
          lead(col("sym"), 2).over(w)))
      .select(col("day"), col("x").as("n_events"), col("z"), col("sym"),
        col("word3"))
  }
  val q280Sql: String =
    """WITH daily AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x FROM events GROUP BY 1),
      |st AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS t,
      |         sum(x::HUGEINT * x::HUGEINT)::HUGEINT AS q FROM daily),
      |z AS (SELECT day, x,
      |        round((x::DOUBLE - t::DOUBLE / n::DOUBLE)
      |          / sqrt((q::DOUBLE - t::DOUBLE * t::DOUBLE / n::DOUBLE)
      |              / n::DOUBLE), 6) AS z
      |      FROM daily CROSS JOIN st),
      |sx AS (SELECT day, x, z,
      |         CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
      |              WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
      |       FROM z)
      |SELECT day, x AS n_events, z, sym,
      |       sym || lead(sym, 1) OVER (ORDER BY day)
      |           || lead(sym, 2) OVER (ORDER BY day) AS word3
      |FROM sx""".stripMargin

  // ---------------------------------------------------------------- q281
  /** Join-key skew report — the distributed-ops diagnostic BEFORE a
    * 100 TB join is planned: for each major join key, the hottest key's
    * row share and its multiple of the average key size (the number
    * that says "salt this join" / "expect one straggler task"). Salting
    * and AQE skew-join handle the mitigation; this measures the need.
    *
    * The 100 TB shape: per relation ONE map-side-combined key count and
    * a 1-row (count, max, sum) rollup — nothing else moves; the four
    * 1-row frames union. Output: rel, key, n_rows, n_keys, max_cnt,
    * max_share, skew_factor. */
  def q281SkewReport(s: SparkSession, dir: String): DataFrame = {
    def one(rel: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_cnt"))
        .select(lit(rel).as("rel"), lit(key).as("key"), col("n_rows"),
          col("n_keys"), col("max_cnt"),
          round(col("max_cnt").cast("double") / col("n_rows").cast("double"),
            6).as("max_share"),
          round(col("max_cnt").cast("double") * col("n_keys").cast("double")
            / col("n_rows").cast("double"), 2).as("skew_factor"))
    one("orders", Tables.orders(s, dir), "o_custkey")
      .unionByName(one("lineitem", Tables.lineitem(s, dir), "l_partkey"))
      .unionByName(one("lineitem", Tables.lineitem(s, dir), "l_orderkey"))
      .unionByName(one("events", Tables.events(s, dir), "user_id"))
  }
  val q281Sql: String = {
    def one(rel: String, key: String): String =
      s"""SELECT '$rel' AS rel, '$key' AS key, sum(c)::BIGINT AS n_rows,
         |       count(*)::BIGINT AS n_keys, max(c)::BIGINT AS max_cnt,
         |       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS max_share,
         |       round(max(c)::DOUBLE * count(*)::DOUBLE / sum(c)::DOUBLE, 2)
         |         AS skew_factor
         |FROM (SELECT $key, count(*)::BIGINT AS c FROM $rel GROUP BY 1)"""
        .stripMargin
    Seq(one("orders", "o_custkey"), one("lineitem", "l_partkey"),
      one("lineitem", "l_orderkey"), one("events", "user_id"))
      .mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- q282
  /** Per-node local clustering coefficient over the co-purchase graph
    * ([[graft.functions.Graphs.localClustering]]) — the node-grain
    * refinement of q124's global census: which parts sit in tight
    * cliques (accessory bundles) vs star hubs (staples bought with
    * everything). LCC_v = 2·tri_v/(deg_v(deg_v−1)), NULL for deg < 2.
    *
    * The 100 TB shape: the SHARED persisted co-purchase edge list
    * (q124/q130/q134/...), the same degree-oriented O(√m) wedge bound,
    * per-triangle credit as 3 narrow increments (two off the
    * intersection size, one explode of members), ONE hash aggregate per
    * node. Output: id, deg, n_tri, lcc. */
  def q282LocalClustering(s: SparkSession, dir: String): DataFrame =
    graft.functions.Graphs.localClustering(
      QueriesExt4.coPurchase(s, dir).toDF("a", "b"))
  val q282Sql: String =
    s"""WITH ${QueriesExt4.coPurchaseSqlCte},
       |d AS (SELECT v, count(*)::BIGINT AS deg FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |wd AS (SELECT e.a, e.b, da.deg AS dega, db.deg AS degb
       |       FROM e JOIN d da ON e.a = da.v JOIN d db ON e.b = db.v),
       |o AS (SELECT
       |        CASE WHEN dega < degb OR (dega = degb AND a < b)
       |             THEN a ELSE b END AS src,
       |        CASE WHEN dega < degb OR (dega = degb AND a < b)
       |             THEN b ELSE a END AS dst
       |      FROM wd),
       |adj AS (SELECT src AS x, list(dst) AS outs FROM o GROUP BY 1),
       |iv AS (SELECT o.src, o.dst,
       |         list_intersect(au.outs, av.outs) AS ws
       |       FROM o LEFT JOIN adj au ON o.src = au.x
       |              LEFT JOIN adj av ON o.dst = av.x),
       |ivf AS (SELECT * FROM iv WHERE len(ws) > 0),
       |cr AS (SELECT src AS id, len(ws)::BIGINT AS t FROM ivf
       |       UNION ALL SELECT dst, len(ws)::BIGINT FROM ivf
       |       UNION ALL SELECT unnest(ws), 1::BIGINT FROM ivf),
       |tr AS (SELECT id, sum(t)::BIGINT AS n_tri FROM cr GROUP BY 1)
       |SELECT d.v AS id, deg, coalesce(n_tri, 0)::BIGINT AS n_tri,
       |       CASE WHEN deg >= 2 THEN
       |         round(2.0 * coalesce(n_tri, 0)::DOUBLE
       |           / (deg * (deg - 1))::DOUBLE, 6) END AS lcc
       |FROM d LEFT JOIN tr ON d.v = tr.id""".stripMargin

  // ---------------------------------------------------------------- q283
  /** Neyman allocation (variance-optimal stratified sampling, Neyman
    * 1934): split a fixed sample budget across sources proportional to
    * N_h·σ_h — strata that are big AND internally varied get more
    * budget; uniform strata get less. The sampling-design complement of
    * the water-filling token budget (q-mixture): that caps, this
    * allocates for estimator variance. Integer allocations come from
    * the largest-remainder method so they sum EXACTLY to the budget.
    *
    * The 100 TB shape: per-source (n, Σlen, Σlen²) is one map-side-
    * combined aggregate over exact integers; everything after runs on
    * the ≤|sources| grain (shares, floors, and the remainder ranks via
    * [[graft.functions.BoundedWindow]]). Output: source, n_docs,
    * sigma_len, share, alloc — Σalloc = 1000. */
  def q283NeymanAlloc(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BoundedWindow
    val budget = 1000L
    val g = docs(s, dir)
      .select(col("source"), length(col("text")).cast("long").as("len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("sv"),
        sum(col("len").cast("decimal(38,0)") * col("len")).as("qv"))
    // n=1 guard (the q273 discipline): a single-document source has an
    // undefined sample sigma — /(n-1) would make it 0/0 = NaN, and one
    // NaN poisons the weight total and every source's share/alloc.
    // Degrade it to zero weight instead (mirrored in the oracle).
    val sigma = when(col("n") > 1L,
      sqrt((col("qv").cast("double") -
        col("sv").cast("double") * col("sv").cast("double") /
          col("n").cast("double")) / (col("n") - 1L).cast("double")))
      .otherwise(lit(0.0))
    val weighted = g.select(col("source"), col("n"), sigma.as("sig"),
      (col("n").cast("double") * sigma).as("w"))
    val tot = weighted.agg(sum(col("w")).as("wt"))
    // Shares and floors in doubles (identical expression both engines);
    // the missing remainder goes to the largest fractional parts,
    // source-ascending tie-break — allocations sum exactly to budget.
    // Zero-TOTAL guard (r12 review — one level above the n=1 sigma
    // guard): if every source is single-doc or uniform-length, wt = 0
    // and w/wt would be 0/0 = NaN for every row; degrade every share to
    // zero instead (allocations then fall to the remainder tie-break,
    // identically in both engines).
    val shared = weighted.crossJoin(broadcast(tot))
      .withColumn("share",
        when(col("wt") > 0d, col("w") / col("wt")).otherwise(lit(0.0)))
      .withColumn("base", floor(lit(budget.toDouble) * col("share"))
        .cast("long"))
      .withColumn("frac", lit(budget.toDouble) * col("share") -
        col("base").cast("double"))
    val baseTot = shared.agg(sum(col("base")).as("bt"))
    shared.crossJoin(broadcast(baseTot))
      .withColumn("rk", row_number().over(
        BoundedWindow.orderBy(col("source"), col("frac").desc,
          col("source").asc)).cast("long"))
      .select(col("source"), col("n").as("n_docs"),
        round(col("sig"), 6).as("sigma_len"),
        round(col("share"), 6).as("share"),
        (col("base") + when(col("rk") <= lit(budget) - col("bt"), 1L)
          .otherwise(0L)).as("alloc"))
  }
  val q283Sql: String =
    """WITH g AS (SELECT source, count(*)::BIGINT AS n,
      |             sum(len)::BIGINT AS sv,
      |             sum(len::HUGEINT * len::HUGEINT)::HUGEINT AS qv
      |           FROM (SELECT source, length(text)::BIGINT AS len
      |                 FROM documents) GROUP BY 1),
      |w AS (SELECT source, n,
      |        CASE WHEN n > 1 THEN
      |          sqrt((qv::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE)
      |            / (n - 1)::DOUBLE) ELSE 0.0 END AS sig,
      |        n::DOUBLE * CASE WHEN n > 1 THEN
      |          sqrt((qv::DOUBLE - sv::DOUBLE * sv::DOUBLE
      |            / n::DOUBLE) / (n - 1)::DOUBLE) ELSE 0.0 END AS w
      |      FROM g),
      |t AS (SELECT sum(w) AS wt FROM w),
      |s0 AS (SELECT source, n, sig,
      |         CASE WHEN wt > 0 THEN w / wt ELSE 0.0 END AS share
      |       FROM w CROSS JOIN t),
      |sh AS (SELECT source, n, sig, share,
      |         floor(1000.0 * share)::BIGINT AS base,
      |         1000.0 * share - floor(1000.0 * share) AS frac
      |       FROM s0),
      |bt AS (SELECT sum(base)::BIGINT AS bt FROM sh),
      |r AS (SELECT *, row_number() OVER (ORDER BY frac DESC, source ASC)
      |        ::BIGINT AS rk
      |      FROM sh CROSS JOIN bt)
      |SELECT source, n AS n_docs, round(sig, 6) AS sigma_len,
      |       round(share, 6) AS share,
      |       (base + CASE WHEN rk <= 1000 - bt THEN 1 ELSE 0 END)::BIGINT
      |         AS alloc
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q284
  /** Group k-fold assignment with a leakage witness — the eval-hygiene
    * op behind user-level cross-validation: every event lands in the
    * fold of its USER (hash-assigned, deterministic), so no user's
    * behavior ever spans train and validation. The output publishes the
    * per-fold balance AND the machine-checked witness that leakage is
    * zero by construction.
    *
    * The 100 TB shape: fold = pmod(md5(user), k) inside the scan; one
    * map-side-combined (fold, user)-grain count, then a k-row rollup;
    * `cross_fold_users` counts users with >1 distinct fold — structurally
    * 0, and the oracle re-derives it rather than trusting it. Output per
    * fold: fold, n_users, n_events, event_share, cross_fold_users. */
  def q284GroupKfold(s: SparkSession, dir: String): DataFrame = {
    val k = 5L
    val perUser = Tables.events(s, dir)
      .select(col("user_id"),
        pmod(TextFunctions.md5Long(col("user_id").cast("string")), lit(k))
          .as("fold"))
      .groupBy(col("fold"), col("user_id")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val leak = perUser.groupBy(col("user_id"))
      .agg(countDistinct(col("fold")).as("nf"))
      .agg(sum(when(col("nf") > 1L, 1L).otherwise(0L))
        .as("cross_fold_users"))
    val tot = perUser.agg(sum(col("c")).as("nt"))
    perUser.groupBy(col("fold"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("c")).as("n_events"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(leak))
      .select(col("fold"), col("n_users"), col("n_events"),
        round(col("n_events").cast("double") / col("nt").cast("double"), 6)
          .as("event_share"),
        col("cross_fold_users"))
  }
  val q284Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH pu AS (SELECT ${mid("user_id::VARCHAR")} % 5 AS fold, user_id,
       |              count(*)::BIGINT AS c
       |            FROM events GROUP BY 1, 2),
       |lk AS (SELECT sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END)::BIGINT
       |           AS cross_fold_users
       |       FROM (SELECT user_id, count(DISTINCT fold) AS nf
       |             FROM pu GROUP BY 1)),
       |t AS (SELECT sum(c)::BIGINT AS nt FROM pu)
       |SELECT fold, count(DISTINCT user_id)::BIGINT AS n_users,
       |       sum(c)::BIGINT AS n_events,
       |       round(sum(c)::DOUBLE / max(nt)::DOUBLE, 6) AS event_share,
       |       max(cross_fold_users)::BIGINT AS cross_fold_users
       |FROM pu CROSS JOIN t CROSS JOIN lk
       |GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q285
  /** Cohen's kappa for the language-ID heuristic — chance-corrected
    * agreement between labeled and detected language (the single-number
    * summary of q266's confusion matrix; accuracy alone flatters any
    * classifier on a skewed label mix): κ = (p_o − p_e)/(1 − p_e) with
    * p_e = Σ_l row_l·col_l / N².
    *
    * The 100 TB shape: prediction stays inside the scan, the matrix is
    * a |langs|²-bounded count, and p_o/p_e come from exact integer
    * sums (diag, row·col products) with one closed form. Output: n,
    * p_obs, p_exp, kappa. */
  def q285CohensKappa(s: SparkSession, dir: String): DataFrame = {
    val cells = docs(s, dir)
      .select(col("lang"), TextFunctions.langId(col("text")).as("det"))
      .groupBy(col("lang"), col("det")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val rows = cells.groupBy(col("lang")).agg(sum(col("c")).as("r"))
    val cols = cells.groupBy(col("det")).agg(sum(col("c")).as("cc"))
    val agree = cells.agg(
      sum(when(col("lang") === col("det"), col("c")).otherwise(0L))
        .as("diag"),
      sum(col("c")).as("n"))
    val pe = rows.join(cols, col("lang") === col("det"))
      .agg(sum(col("r").cast("decimal(38,0)") * col("cc")).as("rc"))
    agree.crossJoin(broadcast(pe))
      .select(col("n"),
        round(col("diag").cast("double") / col("n").cast("double"), 6)
          .as("p_obs"),
        round(col("rc").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6)
          .as("p_exp"))
      .select(col("n"), col("p_obs"), col("p_exp"),
        round((col("p_obs") - col("p_exp")) / (lit(1.0d) - col("p_exp")), 6)
          .as("kappa"))
  }
  val q285Sql: String =
    s"""WITH pred AS (
       |  SELECT lang, ${QueriesExt.langIdSql} AS det
       |  FROM (SELECT lang, ${QueriesExt.toksSql} AS toks FROM documents)),
       |cells AS (SELECT lang, det, count(*)::BIGINT AS c
       |          FROM pred GROUP BY 1, 2),
       |ag AS (SELECT sum(CASE WHEN lang = det THEN c ELSE 0 END)::BIGINT
       |           AS diag,
       |         sum(c)::BIGINT AS n FROM cells),
       |r AS (SELECT lang, sum(c)::BIGINT AS r FROM cells GROUP BY 1),
       |cl AS (SELECT det, sum(c)::BIGINT AS cc FROM cells GROUP BY 1),
       |pe AS (SELECT sum(r::HUGEINT * cc::HUGEINT)::HUGEINT AS rc
       |       FROM r JOIN cl ON r.lang = cl.det),
       |p AS (SELECT n, round(diag::DOUBLE / n::DOUBLE, 6) AS p_obs,
       |        round(rc::DOUBLE / (n::DOUBLE * n::DOUBLE), 6) AS p_exp
       |      FROM ag CROSS JOIN pe)
       |SELECT n, p_obs, p_exp,
       |       round((p_obs - p_exp) / (1.0 - p_exp), 6) AS kappa
       |FROM p""".stripMargin

  // ---------------------------------------------------------------- q286
  /** Quantile normalization of per-source document lengths onto the
    * pooled distribution — the batch-effect correction (Bolstad et al.
    * 2003, from microarrays; here: make sources length-comparable before
    * mixing): each doc's within-source rank r maps to the pooled value
    * at the same quantile, gr = ⌈(2r−1)·N / (2·n_s)⌉.
    *
    * The 100 TB shape: within-source ranks via [[PrefixScan
    * .scanGrouped]] (a partitionBy(source) window would single-task
    * each source), the pooled rank→value frame via ONE [[PrefixScan]]
    * RowNumber, the quantile lookup an exact-integer equi-join on gr —
    * no percentile sketch, no single-partition sort. Output: doc_id,
    * source, n_chars, norm_chars. */
  def q286QuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("len"))
      .localCheckpoint(true)
    val ranked = PrefixScan.scanGrouped(d, "source", col("len"),
      Seq(col("len"), col("doc_id")), Seq(PrefixScan.RowNumber("r")))
    val ns = d.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val pooled = PrefixScan.scan(d.select(col("len")), col("len"),
        Seq(col("len")), Seq(PrefixScan.RowNumber("gr")), cache = true)
      .select(col("gr"), col("len").as("norm_chars"))
    val nTot = d.agg(count(lit(1)).as("nt"))
    // (2r-1)·nt in decimal(38,0), not long: past ~2.1e9 docs the long
    // product crosses 2^63 and Spark would wrap silently under non-ANSI
    // mode while DuckDB's BIGINT errors — decimal keeps both engines
    // exact at any corpus size (div on decimals still yields long).
    ranked.join(broadcast(ns), "source").crossJoin(broadcast(nTot))
      .withColumn("gr",
        expr("(cast(2 * r - 1 as decimal(38,0)) * nt + 2 * ns - 1) " +
          "div (2 * ns)"))
      .join(pooled, "gr")
      .select(col("doc_id"), col("source"), col("len").as("n_chars"),
        col("norm_chars"))
  }
  val q286Sql: String =
    """WITH d AS (SELECT doc_id, source, length(text)::BIGINT AS len
      |           FROM documents),
      |rk AS (SELECT doc_id, source, len,
      |         row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
      |           ::BIGINT AS r
      |       FROM d),
      |ns AS (SELECT source, count(*)::BIGINT AS ns FROM d GROUP BY 1),
      |nt AS (SELECT count(*)::BIGINT AS nt FROM d),
      |pl AS (SELECT len AS norm_chars,
      |         row_number() OVER (ORDER BY len)::BIGINT AS gr FROM d),
      |g AS (SELECT doc_id, source, len,
      |        (((2 * r - 1)::HUGEINT * nt + 2 * ns - 1) // (2 * ns))
      |          ::BIGINT AS gr
      |      FROM rk JOIN ns USING (source) CROSS JOIN nt)
      |SELECT doc_id, source, len AS n_chars, norm_chars
      |FROM g JOIN pl USING (gr)""".stripMargin

  // ---------------------------------------------------------------- q287
  /** Degree-distribution power-law fit for the co-purchase graph — the
    * graph-shape twin of q202's token Zipf fit: the Clauset–Shalizi–
    * Newman discrete MLE α̂ = 1 + n / Σ ln(d / (dmin − ½)) over nodes
    * with degree ≥ dmin, with the tail fraction it covers. A scale-free
    * α ≈ 2–3 says hub-and-spoke; a large α says the graph is flat —
    * which salting/skew decisions downstream read directly.
    *
    * The 100 TB shape: degrees are one count off the SHARED persisted
    * edge list; each node's ln term integerizes to micro-units
    * (identical double from identical integers, THEN rounded) so the
    * data-scaled sum is order-independent; the closed form is one row.
    * Output: dmin, n_tail, n_nodes, alpha, tail_frac. */
  def q287DegreePowerLaw(s: SparkSession, dir: String): DataFrame = {
    val dmin = 3L
    val e = QueriesExt4.coPurchase(s, dir).toDF("a", "b")
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val tail = deg.filter(col("d") >= dmin)
      .select(round(lit(1.0e12d) *
        log(col("d").cast("double") / (lit(dmin.toDouble) - 0.5d)), 0)
        .cast("long").as("lm"))
      .agg(count(lit(1)).as("n_tail"), sum(col("lm")).as("slm"))
    val all0 = deg.agg(count(lit(1)).as("n_nodes"))
    tail.crossJoin(broadcast(all0))
      .select(lit(dmin).as("dmin"), col("n_tail"), col("n_nodes"),
        round(lit(1.0d) + col("n_tail").cast("double") /
          (col("slm").cast("double") / lit(1.0e12d)), 6).as("alpha"),
        round(col("n_tail").cast("double") / col("n_nodes").cast("double"),
          6).as("tail_frac"))
  }
  val q287Sql: String =
    s"""WITH ${QueriesExt4.coPurchaseSqlCte},
       |d AS (SELECT v, count(*)::BIGINT AS d FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |t AS (SELECT count(*)::BIGINT AS n_tail,
       |        sum(round(1.0e12 * ln(d::DOUBLE / 2.5))::BIGINT)::BIGINT
       |          AS slm
       |      FROM d WHERE d >= 3),
       |a AS (SELECT count(*)::BIGINT AS n_nodes FROM d)
       |SELECT 3::BIGINT AS dmin, n_tail, n_nodes,
       |       round(1.0 + n_tail::DOUBLE / (slm::DOUBLE / 1.0e12), 6)
       |         AS alpha,
       |       round(n_tail::DOUBLE / n_nodes::DOUBLE, 6) AS tail_frac
       |FROM t CROSS JOIN a""".stripMargin

  // ---------------------------------------------------------------- q288
  /** Approximate average local clustering by one-wedge-per-node probing
    * — the LINEAR-cost sampling tier next to q282's exact Θ(m^1.5)
    * wedge join (SCALE_r11's documented triangle cost law): for every
    * node with degree ≥ 2, probe ONE deterministic wedge (its two
    * md5-smallest neighbors) and check closure against the edge list;
    * the closure rate estimates the Watts–Strogatz average local
    * clustering at O(V + E) total work.
    *
    * The 100 TB shape: neighbor ranking is a WindowGroupLimit-bounded
    * per-node window (partitioned by a data-scaled key), the probe
    * pivot is one hash aggregate, and closure is an equi-join on the
    * canonical pair key — no wedge enumeration anywhere. The md5 probe
    * is fixed, not uniform-random, so both engines probe the identical
    * wedge set. Output: n_probed, n_closed, avg_lcc_est. */
  def q288WedgeProbe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = QueriesExt4.coPurchase(s, dir).toDF("a", "b")
    val nbr = e.select(col("a").as("v"), col("b").as("n"))
      .unionAll(e.select(col("b").as("v"), col("a").as("n")))
      .withColumn("k", TextFunctions.md5Long(
        concat(col("v").cast("string"), lit("|"), col("n").cast("string"))))
    val w = Window.partitionBy(col("v")).orderBy(col("k"), col("n"))
    val probe = nbr.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("v"))
      .agg(max(when(col("rn") === 1, col("n"))).as("n1"),
        max(when(col("rn") === 2, col("n"))).as("n2"))
      .filter(col("n2").isNotNull)
      .select(col("v"), least(col("n1"), col("n2")).as("pa"),
        greatest(col("n1"), col("n2")).as("pb"))
    val closed = probe.join(
        e.select(col("a").as("pa"), col("b").as("pb"),
          lit(1L).as("closed")),
        Seq("pa", "pb"), "left")
    closed.agg(count(lit(1)).as("n_probed"),
        sum(coalesce(col("closed"), lit(0L))).as("n_closed"))
      .select(col("n_probed"), col("n_closed"),
        round(col("n_closed").cast("double") / col("n_probed").cast("double"),
          6).as("avg_lcc_est"))
  }
  val q288Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH ${QueriesExt4.coPurchaseSqlCte},
       |nb AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
       |kk AS (SELECT v, n, ${mid("v || '|' || n")} AS k FROM nb),
       |r AS (SELECT v, n,
       |        row_number() OVER (PARTITION BY v ORDER BY k, n) AS rn
       |      FROM kk),
       |pk AS (SELECT v, max(CASE WHEN rn = 1 THEN n END) AS n1,
       |         max(CASE WHEN rn = 2 THEN n END) AS n2
       |       FROM r WHERE rn <= 2 GROUP BY 1),
       |pp AS (SELECT v, least(n1, n2) AS pa, greatest(n1, n2) AS pb
       |       FROM pk WHERE n2 IS NOT NULL),
       |c AS (SELECT pp.v,
       |        CASE WHEN e.a IS NULL THEN 0 ELSE 1 END AS closed
       |      FROM pp LEFT JOIN e ON pp.pa = e.a AND pp.pb = e.b)
       |SELECT count(*)::BIGINT AS n_probed, sum(closed)::BIGINT AS n_closed,
       |       round(sum(closed)::DOUBLE / count(*)::DOUBLE, 6)
       |         AS avg_lcc_est
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- q289
  /** Source-vocabulary Jaccard matrix — which sources SHARE words (set
    * overlap), the companion to q270's distribution divergence (two
    * sources can share every token yet weight them oppositely): for
    * every source pair, |V_a ∩ V_b| / |V_a ∪ V_b| over distinct token
    * fingerprints.
    *
    * The 100 TB shape: ONE distinct (source, token-hash) frame — text
    * never shuffles, tokens hash in the scan; pair intersections come
    * from a self-equi-join ON THE TOKEN (each token contributes its
    * ≤|sources|² co-occurring pairs — bounded fan-out per token), and
    * union sizes derive from the per-source distinct counts. Output:
    * src_a, src_b, v_a, v_b, shared, jaccard. */
  def q289VocabJaccard(s: SparkSession, dir: String): DataFrame = {
    val vocab = docs(s, dir)
      .select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(col("source"), TextFunctions.md5Long(col("t")).as("th"))
      .distinct()
      .localCheckpoint(true)
    val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val shared = vocab.as("x").join(vocab.as("y"),
        col("x.th") === col("y.th") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("v").as("v_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("v").as("v_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
        col("shared"),
        round(col("shared").cast("double") /
          (col("v_a") + col("v_b") - col("shared")).cast("double"), 6)
          .as("jaccard"))
  }
  val q289Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH voc AS (SELECT DISTINCT source, ${mid("t")} AS th
       |             FROM (SELECT source, unnest(string_split_regex(
       |                     trim(lower(text)), '\\s+')) AS t FROM documents)),
       |sz AS (SELECT source, count(*)::BIGINT AS v FROM voc GROUP BY 1),
       |sh AS (SELECT x.source AS src_a, y.source AS src_b,
       |         count(*)::BIGINT AS shared
       |       FROM voc x JOIN voc y
       |         ON x.th = y.th AND x.source < y.source
       |       GROUP BY 1, 2)
       |SELECT src_a, src_b, a.v AS v_a, b.v AS v_b, shared,
       |       round(shared::DOUBLE / (a.v + b.v - shared)::DOUBLE, 6)
       |         AS jaccard
       |FROM sh JOIN sz a ON sh.src_a = a.source
       |        JOIN sz b ON sh.src_b = b.source""".stripMargin
  }

  // ---------------------------------------------------------------- q290
  /** Information-gain feature ranking: which metadata feature — day of
    * week, hour of day, or value magnitude-bin — says most about the
    * event type? IG(f) = H(type) − H(type | f), the split criterion
    * behind every decision tree and the fastest "is this feature worth
    * logging" answer.
    *
    * The 100 TB shape: each feature is a scan projection onto a
    * DOMAIN-BOUNDED grain (7 days × 24 hours × ~64 log₂ bins ×
    * |types|), so each (feature-value, type) table is a bounded
    * map-side-combined count; every entropy sum folds over the SORTED
    * bounded cell list (both engines replay the same order). Output
    * per feature: feature, n_values, h_type, h_cond, info_gain. */
  def q290InfoGain(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        dayofweek(col("ts")).cast("string").as("dow"),
        hour(col("ts")).cast("string").as("hod"),
        when(col("value") > 0,
          (length(bin(round(col("value") * 1000000.0d, 0).cast("long"))) - 1)
            .cast("string")).otherwise(lit("neg")).as("vbin"))
    def ig(feature: String): DataFrame = {
      val cells = ev.groupBy(col(feature).as("fv"),
          col("event_type").as("ty"))
        .agg(count(lit(1)).as("c")).localCheckpoint(true)
      val folded = cells.agg(sum(col("c")).as("n"),
        sort_array(collect_list(struct(col("fv"), col("ty"), col("c"))))
          .as("cs"))
      val tyTot = cells.groupBy(col("ty")).agg(sum(col("c")).as("tc"))
        .agg(sort_array(collect_list(struct(col("ty"), col("tc"))))
          .as("ts"), count(lit(1)).as("n_types"))
      val fvTot = cells.groupBy(col("fv")).agg(sum(col("c")).as("fc"))
        .agg(sort_array(collect_list(struct(col("fv"), col("fc"))))
          .as("fs"), count(lit(1)).as("n_values"))
      folded.crossJoin(tyTot).crossJoin(fvTot)
        .withColumn("h_type", aggregate(col("ts"), lit(0.0d), (acc, x) =>
          acc - x.getField("tc").cast("double") / col("n").cast("double") *
            log(x.getField("tc").cast("double") / col("n").cast("double"))))
        // H(type|f) = H(type, f) − H(f), both over sorted bounded lists.
        .withColumn("h_joint", aggregate(col("cs"), lit(0.0d), (acc, x) =>
          acc - x.getField("c").cast("double") / col("n").cast("double") *
            log(x.getField("c").cast("double") / col("n").cast("double"))))
        .withColumn("h_f", aggregate(col("fs"), lit(0.0d), (acc, x) =>
          acc - x.getField("fc").cast("double") / col("n").cast("double") *
            log(x.getField("fc").cast("double") / col("n").cast("double"))))
        .select(lit(feature).as("feature"), col("n_values"),
          round(col("h_type"), 6).as("h_type"),
          round(col("h_joint") - col("h_f"), 6).as("h_cond"),
          round(col("h_type") - (col("h_joint") - col("h_f")), 6)
            .as("info_gain"))
    }
    ig("dow").unionByName(ig("hod")).unionByName(ig("vbin"))
  }
  val q290Sql: String = {
        def oneSafe(feature: String, fexpr: String): String =
      s"""SELECT '$feature' AS feature,
         |  (SELECT count(DISTINCT $fexpr)::BIGINT FROM ev) AS n_values,
         |  round(ht, 6) AS h_type, round(hj - hf, 6) AS h_cond,
         |  round(ht - (hj - hf), 6) AS info_gain
         |FROM (
         |  SELECT
         |    (SELECT list_sum(list_transform(
         |       list_sort(list(struct_pack(ty := ty, tc := tc))),
         |       x -> -(x.tc::DOUBLE / n::DOUBLE) * ln(x.tc::DOUBLE / n::DOUBLE)))
         |     FROM (SELECT event_type AS ty, count(*)::BIGINT AS tc FROM ev
         |           GROUP BY 1) CROSS JOIN nn GROUP BY n) AS ht,
         |    (SELECT list_sum(list_transform(
         |       list_sort(list(struct_pack(fv := fv, ty := ty, c := c))),
         |       x -> -(x.c::DOUBLE / n::DOUBLE) * ln(x.c::DOUBLE / n::DOUBLE)))
         |     FROM (SELECT $fexpr AS fv, event_type AS ty,
         |             count(*)::BIGINT AS c FROM ev GROUP BY 1, 2)
         |     CROSS JOIN nn GROUP BY n) AS hj,
         |    (SELECT list_sum(list_transform(
         |       list_sort(list(struct_pack(fv := fv, fc := fc))),
         |       x -> -(x.fc::DOUBLE / n::DOUBLE) * ln(x.fc::DOUBLE / n::DOUBLE)))
         |     FROM (SELECT $fexpr AS fv, count(*)::BIGINT AS fc FROM ev
         |           GROUP BY 1) CROSS JOIN nn GROUP BY n) AS hf)""".stripMargin
    val dow = "dayofweek(ts)::VARCHAR"
    val hod = "hour(ts)::VARCHAR"
    val vbin = "CASE WHEN \"value\" > 0 THEN " +
      "(length(bin(round(\"value\" * 1000000.0)::BIGINT)) - 1)::VARCHAR " +
      "ELSE 'neg' END"
    s"""WITH ev AS (SELECT event_type, ts, "value" FROM events),
       |nn AS (SELECT count(*)::BIGINT AS n FROM ev)
       |${oneSafe("dow", dow)}
       |UNION ALL
       |${oneSafe("hod", hod)}
       |UNION ALL
       |${oneSafe("vbin", vbin)}""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q268_hits" -> (q268Hits _),
    "q269_anova_f" -> (q269AnovaF _),
    "q270_js_divergence" -> (q270JsDivergence _),
    "q271_repetition" -> (q271Repetition _),
    "q272_brown_forsythe" -> (q272BrownForsythe _),
    "q273_james_stein" -> (q273JamesStein _),
    "q274_calibration" -> (q274Calibration _),
    "q275_average_precision" -> (q275AveragePrecision _),
    "q276_triplets" -> (q276Triplets _),
    "q277_simpson" -> (q277Simpson _),
    "q278_changepoint" -> (q278Changepoint _),
    "q279_coverage_entropy" -> (q279CoverageEntropy _),
    "q280_sax" -> (q280Sax _),
    "q281_skew_report" -> (q281SkewReport _),
    "q282_local_clustering" -> (q282LocalClustering _),
    "q283_neyman_alloc" -> (q283NeymanAlloc _),
    "q284_group_kfold" -> (q284GroupKfold _),
    "q285_cohens_kappa" -> (q285CohensKappa _),
    "q286_quantile_norm" -> (q286QuantileNorm _),
    "q287_degree_powerlaw" -> (q287DegreePowerLaw _),
    "q288_wedge_probe" -> (q288WedgeProbe _),
    "q289_vocab_jaccard" -> (q289VocabJaccard _),
    "q290_info_gain" -> (q290InfoGain _)
  )

  val oracles: Map[String, String] = Map(
    "q268_hits" -> q268Sql,
    "q269_anova_f" -> q269Sql,
    "q270_js_divergence" -> q270Sql,
    "q271_repetition" -> q271Sql,
    "q272_brown_forsythe" -> q272Sql,
    "q273_james_stein" -> q273Sql,
    "q274_calibration" -> q274Sql,
    "q275_average_precision" -> q275Sql,
    "q276_triplets" -> q276Sql,
    "q277_simpson" -> q277Sql,
    "q278_changepoint" -> q278Sql,
    "q279_coverage_entropy" -> q279Sql,
    "q280_sax" -> q280Sql,
    "q281_skew_report" -> q281Sql,
    "q282_local_clustering" -> q282Sql,
    "q283_neyman_alloc" -> q283Sql,
    "q284_group_kfold" -> q284Sql,
    "q285_cohens_kappa" -> q285Sql,
    "q286_quantile_norm" -> q286Sql,
    "q287_degree_powerlaw" -> q287Sql,
    "q288_wedge_probe" -> q288Sql,
    "q289_vocab_jaccard" -> q289Sql,
    "q290_info_gain" -> q290Sql
  )
}
