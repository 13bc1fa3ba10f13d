package graft

import graft.functions.{BoundedWindow, ParetoFrontier, StatsTests, TimeSeries}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries q225+ — the time-series / statistical-mining tier:
  * correlogram, lagged cross-correlation, CUSUM changepoint scan,
  * seasonal decomposition, wavelet energy, multiple-testing control,
  * resampling variance, permutation nulls, skyline, item-item
  * collaborative filtering, frequent triples, clustering quality, and
  * the metric correlation matrix.
  *
  * Shape discipline (the 100 TB contract every query here follows):
  * series live on CALENDAR-BOUNDED grains (hour/day buckets of the
  * fixed event window — the raw-event aggregation that builds them is
  * map-side combinable), windows ride [[BoundedWindow]] or per-key
  * partitions only, pair generation is equi-join (never all-pairs),
  * and sums stay exact integers until one canonical double closed
  * form that each DuckDB oracle mirrors bit-for-bit. */
object QueriesExt7 {

  /** Hourly event-count series (all types): the ≤ 24·days calendar
    * grain every pure-series diagnostic here runs on. */
  private def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts_ms div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))

  private val hourlyCte =
    """hr AS (SELECT epoch_ms(ts) // 3600000 AS h, count(*)::BIGINT AS n
      |       FROM events GROUP BY 1)""".stripMargin

  // ---------------------------------------------------------------- q225
  /** Correlogram of hourly traffic ([[TimeSeries.acf]], lags 1–48):
    * the sample ACF with the ±1.96/√n white-noise band — the diagnostic
    * that exposes the diurnal cycle (a lag-24 spike) and how fast
    * memory decays. Pairs per lag come from one `h+lag = h` equi-join
    * against a 48-row broadcast lag table; sums are exact counts; the
    * only window anywhere is none at all. */
  def q225Correlogram(s: SparkSession, dir: String): DataFrame =
    TimeSeries.acf(hourlyCounts(s, dir), "h", "n", maxLag = 48)
  val q225Sql: String = {
    val m = "(sx::DOUBLE / n::DOUBLE)"
    val num = s"(sxy::DOUBLE - $m * (sh::DOUBLE + st2::DOUBLE) " +
      s"+ n_pairs::DOUBLE * $m * $m)"
    val den = s"(sxx::DOUBLE - sx::DOUBLE * $m)"
    s"""WITH $hourlyCte,
       |st AS (SELECT count(*)::BIGINT AS n, sum(n)::BIGINT AS sx,
       |              sum(n * n)::BIGINT AS sxx FROM hr),
       |lg AS (SELECT unnest(range(1, 49)) AS lag),
       |pr AS (SELECT l.lag, count(*)::BIGINT AS n_pairs,
       |              sum(a.n)::BIGINT AS sh, sum(b.n)::BIGINT AS st2,
       |              sum(a.n * b.n)::BIGINT AS sxy
       |       FROM hr a CROSS JOIN lg l JOIN hr b ON b.h = a.h + l.lag
       |       GROUP BY 1)
       |SELECT lag, n_pairs,
       |  CASE WHEN $den > 0.0 THEN round($num / $den, 6) END AS r,
       |  coalesce(abs(CASE WHEN $den > 0.0 THEN round($num / $den, 6) END)
       |             > 1.96 / sqrt(n::DOUBLE), false) AS significant
       |FROM pr, st""".stripMargin
  }

  // ---------------------------------------------------------------- q226
  /** Does browsing lead buying? Lagged cross-correlation between the
    * hourly `view` and `purchase` series ([[TimeSeries
    * .crossCorrelation]], lags −7…+7): Pearson r of (view_t,
    * purchase_{t+k}) per lag, complete-case, with the peak-|r| lag
    * flagged `best` — positive best lag ⇒ views lead purchases by that
    * many hours. Same equi-join shape as the correlogram; the only
    * windows are over the 15-row lag frame. */
  def q226CrossCorrelation(s: SparkSession, dir: String): DataFrame = {
    def series(t: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(expr("ts_ms div 3600000").as("h"))
      .agg(count(lit(1)).as("n"))
    TimeSeries.crossCorrelation(series("view"), series("purchase"),
      "h", "n", "n", maxLag = 7)
  }
  val q226Sql: String = {
    val cov = "(n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
    val vx = "(n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
    val vy = "(n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)"
    s"""WITH va AS (SELECT epoch_ms(ts) // 3600000 AS h, count(*)::BIGINT AS n
       |            FROM events WHERE event_type = 'view' GROUP BY 1),
       |vb AS (SELECT epoch_ms(ts) // 3600000 AS h, count(*)::BIGINT AS n
       |       FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |lg AS (SELECT unnest(range(-7, 8)) AS lag),
       |sm AS (SELECT l.lag, count(*)::BIGINT AS n_pairs,
       |              sum(a.n)::BIGINT AS sx, sum(b.n)::BIGINT AS sy,
       |              sum(a.n * a.n)::BIGINT AS sxx,
       |              sum(b.n * b.n)::BIGINT AS syy,
       |              sum(a.n * b.n)::BIGINT AS sxy
       |       FROM va a CROSS JOIN lg l JOIN vb b ON b.h = a.h + l.lag
       |       GROUP BY 1),
       |sc AS (SELECT lag, n_pairs,
       |         CASE WHEN $vx > 0.0 AND $vy > 0.0
       |           THEN round($cov / sqrt($vx) / sqrt($vy), 6) END AS r
       |       FROM sm)
       |SELECT lag, n_pairs, r,
       |  (ROW_NUMBER() OVER (ORDER BY abs(r) DESC NULLS LAST, lag ASC) = 1
       |   AND max(abs(r)) OVER () IS NOT NULL) AS best
       |FROM sc""".stripMargin
  }

  // ---------------------------------------------------------------- q227
  /** CUSUM changepoint scan over hourly traffic ([[TimeSeries
    * .cusum]]): standardized cumulative deviation from the series
    * mean, peak |S| flagged — the classic "did the level shift, and
    * when" monitor. Prefix sums are exact integers over the bounded
    * hourly frame; position·mean is subtracted in the closed form. */
  def q227CusumChangepoint(s: SparkSession, dir: String): DataFrame =
    TimeSeries.cusum(hourlyCounts(s, dir), "h", "n")
  val q227Sql: String = {
    val m = "(sx::DOUBLE / n::DOUBLE)"
    val sd = s"sqrt(sxx::DOUBLE / n::DOUBLE - $m * $m)"
    s"""WITH $hourlyCte,
       |st AS (SELECT count(*)::BIGINT AS n, sum(n)::BIGINT AS sx,
       |              sum(n * n)::BIGINT AS sxx FROM hr),
       |pr AS (SELECT h, n AS x,
       |         row_number() OVER (ORDER BY h) AS pos,
       |         sum(n) OVER (ORDER BY h
       |           ROWS UNBOUNDED PRECEDING) AS prefix
       |       FROM hr),
       |sc AS (SELECT h AS idx, x,
       |         CASE WHEN $sd > 0.0 THEN
       |           round((prefix::DOUBLE - pos::DOUBLE * $m) / $sd, 6)
       |         END AS cusum
       |       FROM pr, st)
       |SELECT idx, x, cusum,
       |  coalesce(abs(cusum) = max(abs(cusum)) OVER (), false) AS is_peak
       |FROM sc""".stripMargin
  }

  // ---------------------------------------------------------------- q228
  /** Additive seasonal decomposition of daily purchase GMV: trend =
    * centered 7-day moving average (complete windows only), seasonal =
    * day-of-week mean of the detrended series, remainder = what's
    * left — the classical-decomposition core of STL, kept exact by
    * carrying the detrended value as `7·vm − Σ₇vm` in integer
    * micro-units until the final division. One bounded window + one
    * 7-row broadcast join. */
  def q228StlDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("vm"))
    val w7 = BoundedWindow.orderBy(col("day"), col("day")).rowsBetween(-3, 3)
    val detr = daily
      .withColumn("win_n", count(lit(1)).over(w7))
      .withColumn("t7", sum(col("vm")).over(w7))
      .filter(col("win_n") === 7)
      .withColumn("dm", col("vm") * 7L - col("t7")) // 7·micro units, exact
      .withColumn("dow", (col("day") + 4L) % 7L)
    val seasonal = detr.groupBy(col("dow"))
      .agg(sum(col("dm")).as("sdm"), count(lit(1)).as("cdw"))
    detr.join(broadcast(seasonal), "dow")
      .select(col("day"),
        round(col("vm").cast("double") / 1000000.0d, 2).as("gmv"),
        round(col("t7").cast("double") / 7.0d / 1000000.0d, 6).as("trend"),
        col("dow"),
        round(col("sdm").cast("double") / col("cdw").cast("double") /
          7.0d / 1000000.0d, 6).as("seasonal"),
        round((col("dm").cast("double") -
          col("sdm").cast("double") / col("cdw").cast("double")) /
          7.0d / 1000000.0d, 6).as("remainder"))
  }
  val q228Sql: String =
    """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS vm
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |w AS (SELECT day, vm,
      |        count(*) OVER w7 AS win_n, sum(vm) OVER w7 AS t7
      |      FROM d
      |      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
      |                    AND 3 FOLLOWING)),
      |dt AS (SELECT day, vm, t7, vm * 7 - t7 AS dm, (day + 4) % 7 AS dow
      |       FROM w WHERE win_n = 7),
      |sn AS (SELECT dow, sum(dm)::BIGINT AS sdm, count(*)::BIGINT AS cdw
      |       FROM dt GROUP BY 1)
      |SELECT day, round(vm::DOUBLE / 1000000.0, 2) AS gmv,
      |       round(t7::DOUBLE / 7.0 / 1000000.0, 6) AS trend, dt.dow,
      |       round(sdm::DOUBLE / cdw::DOUBLE / 7.0 / 1000000.0, 6)
      |         AS seasonal,
      |       round((dm::DOUBLE - sdm::DOUBLE / cdw::DOUBLE)
      |             / 7.0 / 1000000.0, 6) AS remainder
      |FROM dt JOIN sn ON dt.dow = sn.dow""".stripMargin

  // ---------------------------------------------------------------- q229
  /** Weekend-effect z-tests per nation with Benjamini–Hochberg FDR
    * control (α = 0.1): Welch z on whole-dollar order totals
    * (weekend vs weekday), two-sided p via the shared A&S normal tail
    * ([[StatsTests]]), then the BH step-up over the ≤25-nation frame —
    * the multiple-testing discipline a per-segment screening sweep
    * needs (per-test α would "discover" ~2.5 nations by chance alone).
    * One shuffle join to attach nations, one grouped pass for both
    * cohorts' sufficient statistics, bounded-frame windows for the
    * rank/step-up. Nations with a degenerate cohort (zero spread) are
    * excluded before ranking. */
  def q229BhFdr(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice"), 0).cast("long").as("d"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      .withColumn("we", ((col("day") + 4L) % 7L).isin(0L, 6L))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"))
    val stats = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(when(col("we"), lit(1))).as("n1"),
        sum(when(col("we"), col("d"))).as("s1"),
        sum(when(col("we"), col("d") * col("d"))).as("ss1"),
        count(when(!col("we"), lit(1))).as("n0"),
        sum(when(!col("we"), col("d"))).as("s0"),
        sum(when(!col("we"), col("d") * col("d"))).as("ss0"))
    val z = StatsTests.welchZ(col("n1"), col("s1"), col("ss1"),
      col("n0"), col("s0"), col("ss0"))
    val scored = stats
      .select(col("n_name"), col("n1").as("n_we"), col("n0").as("n_wd"),
        round(z, 4).as("z"), round(StatsTests.twoSidedP(z), 8).as("p"))
      .filter(col("p").isNotNull)
    val wOrd = BoundedWindow.orderBy(col("n_name"),
      col("p").asc, col("n_name").asc)
    val wAll = BoundedWindow.all(col("n_name"))
    scored
      .withColumn("p_rank", row_number().over(wOrd).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll))
      .withColumn("bh_crit", round(col("p_rank").cast("double") * 0.1d /
        col("m_tests").cast("double"), 8))
      .withColumn("kmax", max(when(col("p") <= col("bh_crit"),
        col("p_rank"))).over(wAll))
      .select(col("n_name"), col("n_we"), col("n_wd"), col("z"), col("p"),
        col("p_rank"), col("bh_crit"),
        coalesce(col("p_rank") <= col("kmax"), lit(false)).as("discovered"))
  }
  val q229Sql: String = {
    val z = StatsTests.welchZSql("n1", "s1", "ss1", "n0", "s0", "ss0")
    s"""WITH o AS (SELECT o_custkey, round(o_totalprice)::BIGINT AS d,
       |        ((epoch_ms(o_orderdate) // 86400000 + 4) % 7) IN (0, 6) AS we
       |      FROM orders),
       |st AS (SELECT n_name,
       |         count(CASE WHEN we THEN 1 END)::BIGINT AS n1,
       |         sum(CASE WHEN we THEN d END)::BIGINT AS s1,
       |         sum(CASE WHEN we THEN d * d END)::BIGINT AS ss1,
       |         count(CASE WHEN NOT we THEN 1 END)::BIGINT AS n0,
       |         sum(CASE WHEN NOT we THEN d END)::BIGINT AS s0,
       |         sum(CASE WHEN NOT we THEN d * d END)::BIGINT AS ss0
       |       FROM o JOIN customer ON o_custkey = c_custkey
       |       JOIN nation ON c_nationkey = n_nationkey
       |       GROUP BY 1),
       |sc AS (SELECT n_name, n1 AS n_we, n0 AS n_wd,
       |         round($z, 4) AS z,
       |         round(${StatsTests.twoSidedPSql(z)}, 8) AS p
       |       FROM st),
       |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p ASC, n_name ASC) AS p_rank,
       |         count(*) OVER () AS m_tests
       |       FROM sc WHERE p IS NOT NULL),
       |cr AS (SELECT *,
       |         round(p_rank::DOUBLE * 0.1 / m_tests::DOUBLE, 8) AS bh_crit
       |       FROM rk)
       |SELECT n_name, n_we, n_wd, z, p, p_rank::BIGINT AS p_rank, bh_crit,
       |  coalesce(p_rank <= max(CASE WHEN p <= bh_crit THEN p_rank END)
       |                      OVER (), false) AS discovered
       |FROM cr""".stripMargin
  }

  // ---------------------------------------------------------------- q230
  /** Jackknife standard error of a ratio estimator: revenue-per-order
    * by nation, resampled leave-one-CUSTOMER-out (the cluster is the
    * customer, matching how new data actually arrives). The mean of a
    * ratio has no closed-form variance; the jackknife pseudo-values
    * R₍ᵢ₎ = (S−sᵢ)/(N−nᵢ) need only each cluster's sufficient
    * statistics against the broadcast nation totals — two aggregates
    * and a join, zero resampling passes. Pseudo-values are rounded to
    * whole dollars before the variance sum so every aggregate stays an
    * exact BIGINT (dollar² sums fit ≤2^63 through sf10+; the 50-cent
    * rounding is noise against order totals in the 10⁵ range). */
  def q230JackknifeRatio(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      round(col("o_totalprice") * 1000000.0d, 0).cast("long").as("vm"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val cust = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(col("vm")).as("si"), count(lit(1)).as("ni"))
    val tot = cust.groupBy(col("n_name"))
      .agg(sum(col("si")).as("sn"), sum(col("ni")).as("nn"),
        count(lit(1)).as("m"))
    val r = when(col("nn") - col("ni") > 0L,
      round((col("sn") - col("si")).cast("double") /
        (col("nn") - col("ni")).cast("double") / 1000000.0d, 0)
        .cast("long"))
    val pseudo = cust.join(tot, "n_name")
      .select(col("n_name"), col("sn"), col("nn"), col("m"), r.as("ri"))
    val agg = pseudo.groupBy(col("n_name"))
      .agg(first(col("sn")).as("sn"), first(col("nn")).as("nn"),
        first(col("m")).as("m"), count(col("ri")).as("me"),
        sum(col("ri")).as("sr"), sum(col("ri") * col("ri")).as("srr"))
    val varSum = col("srr").cast("double") -
      col("sr").cast("double") * col("sr").cast("double") /
        col("me").cast("double")
    agg.select(col("n_name"), col("m").as("m_cust"),
      round(col("sn").cast("double") / col("nn").cast("double") /
        1000000.0d, 2).as("ratio"),
      when(col("me") > 1L, round(sqrt(
        (col("me") - 1L).cast("double") / col("me").cast("double") * varSum),
        4)).as("jk_se"))
  }
  val q230Sql: String =
    """WITH o AS (SELECT o_custkey,
      |        round(o_totalprice * 1000000.0)::BIGINT AS vm FROM orders),
      |cu AS (SELECT n_name, c_custkey, sum(vm)::BIGINT AS si,
      |         count(*)::BIGINT AS ni
      |       FROM o JOIN customer ON o_custkey = c_custkey
      |       JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
      |tt AS (SELECT n_name, sum(si)::BIGINT AS sn, sum(ni)::BIGINT AS nn,
      |         count(*)::BIGINT AS m FROM cu GROUP BY 1),
      |ps AS (SELECT cu.n_name, sn, nn, m,
      |         CASE WHEN nn - ni > 0 THEN
      |           round((sn - si)::DOUBLE / (nn - ni)::DOUBLE
      |                 / 1000000.0)::BIGINT END AS ri
      |       FROM cu JOIN tt ON cu.n_name = tt.n_name),
      |ag AS (SELECT n_name, any_value(sn) AS sn, any_value(nn) AS nn,
      |         any_value(m) AS m, count(ri)::BIGINT AS me,
      |         sum(ri)::BIGINT AS sr, sum(ri * ri)::BIGINT AS srr
      |       FROM ps GROUP BY 1)
      |SELECT n_name, m AS m_cust,
      |  round(sn::DOUBLE / nn::DOUBLE / 1000000.0, 2) AS ratio,
      |  CASE WHEN me > 1 THEN round(sqrt((me - 1)::DOUBLE / me::DOUBLE *
      |    (srr::DOUBLE - sr::DOUBLE * sr::DOUBLE / me::DOUBLE)), 4)
      |  END AS jk_se
      |FROM ag""".stripMargin

  // ---------------------------------------------------------------- q231
  /** Permutation test via deterministic pseudo-random relabeling: is
    * the user_id%2 split's spend-per-user difference explainable by
    * chance? The null distribution re-assigns each USER (the
    * randomization cluster) to a side by the portable 60-bit md5 of
    * `user:rep` for 200 replicates — a broadcast crossJoin that
    * amplifies only the user-grain aggregate, never raw events, and
    * collapses straight back to 200 sufficient-statistic rows (one
    * map-side-combinable pass). p = (1 + #{|Δ_perm| ≥ |Δ_obs|}) /
    * (reps + 1), the standard add-one permutation p-value. Both
    * engines replay the identical md5 labels, so the null is
    * bit-reproducible. */
  def q231PermutationTest(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("sm"))
    val diff = (col("s1").cast("double") / col("n1").cast("double") -
      col("s0").cast("double") / col("n0").cast("double")) / 1000000.0d
    val obs = users.withColumn("side", (col("user_id") % 2L) === 1L)
      .agg(sum(when(col("side"), col("sm"))).as("s1"),
        count(when(col("side"), lit(1))).as("n1"),
        sum(when(!col("side"), col("sm"))).as("s0"),
        count(when(!col("side"), lit(1))).as("n0"))
      .select((col("n1") + col("n0")).as("n_users"), diff.as("obs_diff"))
    val reps = obs.select(explode(sequence(lit(1L), lit(200L))).as("rep"))
    val perm = users.crossJoin(broadcast(reps))
      .withColumn("side", graft.functions.TextFunctions.md5Long(
        concat(col("user_id").cast("string"), lit(":"),
          col("rep").cast("string"))) % 2L === 1L)
      .groupBy(col("rep"))
      .agg(sum(when(col("side"), col("sm"))).as("s1"),
        count(when(col("side"), lit(1))).as("n1"),
        sum(when(!col("side"), col("sm"))).as("s0"),
        count(when(!col("side"), lit(1))).as("n0"))
      .select(col("rep"), diff.as("pd"))
    perm.crossJoin(broadcast(obs))
      .agg(first(col("n_users")).as("n_users"),
        round(first(col("obs_diff")), 6).as("obs_diff"),
        count(lit(1)).as("n_reps"),
        count(when(abs(col("pd")) >= abs(col("obs_diff")), lit(1)))
          .as("n_ge"))
      .select(col("n_users"), col("obs_diff"), col("n_reps"), col("n_ge"),
        round((col("n_ge") + 1L).cast("double") /
          (col("n_reps") + 1L).cast("double"), 6).as("p_value"))
  }
  val q231Sql: String = {
    val diff = (s1: String, n1: String, s0: String, n0: String) =>
      s"(($s1::DOUBLE / $n1::DOUBLE - $s0::DOUBLE / $n0::DOUBLE) / 1000000.0)"
    s"""WITH u AS (SELECT user_id,
       |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS sm
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |ob AS (SELECT count(*)::BIGINT AS n_users,
       |         ${diff("sum(CASE WHEN user_id % 2 = 1 THEN sm END)",
                        "count(CASE WHEN user_id % 2 = 1 THEN 1 END)",
                        "sum(CASE WHEN user_id % 2 = 0 THEN sm END)",
                        "count(CASE WHEN user_id % 2 = 0 THEN 1 END)")}
       |           AS obs_diff
       |       FROM u),
       |rp AS (SELECT unnest(range(1, 201)) AS rep),
       |pm AS (SELECT rep,
       |         ${diff("sum(CASE WHEN side THEN sm END)",
                        "count(CASE WHEN side THEN 1 END)",
                        "sum(CASE WHEN NOT side THEN sm END)",
                        "count(CASE WHEN NOT side THEN 1 END)")} AS pd
       |       FROM (SELECT u.sm, rep,
       |               ('0x' || substring(md5(user_id::VARCHAR || ':' ||
       |                 rep::VARCHAR), 1, 15))::BIGINT % 2 = 1 AS side
       |             FROM u CROSS JOIN rp)
       |       GROUP BY 1)
       |SELECT any_value(ob.n_users) AS n_users,
       |  round(any_value(ob.obs_diff), 6) AS obs_diff,
       |  count(*)::BIGINT AS n_reps,
       |  count(CASE WHEN abs(pd) >= abs(ob.obs_diff)
       |        THEN 1 END)::BIGINT AS n_ge,
       |  round((count(CASE WHEN abs(pd) >= abs(ob.obs_diff)
       |               THEN 1 END) + 1)::DOUBLE / (count(*) + 1)::DOUBLE, 6)
       |    AS p_value
       |FROM pm, ob""".stripMargin
  }

  // ---------------------------------------------------------------- q232
  /** Price/size skyline of the parts catalog ([[ParetoFrontier]]):
    * every part for which no other part is at least as cheap AND at
    * least as large with one strict improvement. The engine runs the
    * sort-based frontier (cost-grain collapse + exclusive prefix-max
    * via [[graft.functions.PrefixScan]] — no all-pairs, no
    * unpartitioned window); the oracle states the definition directly
    * as a NOT EXISTS anti-join, which only the tiny sf frame could
    * afford. */
  def q232ParetoFrontier(s: SparkSession, dir: String): DataFrame =
    ParetoFrontier.frontier(
      Tables.part(s, dir).select(col("p_partkey"), col("p_brand"),
        col("p_retailprice"), col("p_size")),
      "p_retailprice", "p_size")
  val q232Sql: String =
    """SELECT p_partkey, p_brand, p_retailprice, p_size FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))"""
      .stripMargin

  // ---------------------------------------------------------------- q233
  /** Item-item collaborative filtering: top-5 "customers also bought"
    * per part by binary cosine (Ochiai) over shared orders —
    * c_ij/√(n_i·n_j), the normalization that keeps bestsellers from
    * swamping every list (contrast q141's lift, which scores the
    * RULE, not the neighbor ranking). Pair counts ride the same
    * capped per-order self-join as the association tier; the ranking
    * window is per-item (keyed, scale-safe); candidates need ≥2
    * shared orders. */
  def q233ItemCf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
      .distinct()
    val keep = p.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= 1000).select(col("g"))
    val pb = p.join(keep, "g").localCheckpoint()
    val pairs = pb.as("x").join(pb.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
    val supp = pb.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val sym = pairs.select(col("a").as("item"), col("b").as("rec"), col("c"))
      .unionByName(pairs.select(col("b").as("item"), col("a").as("rec"),
        col("c")))
    val scored = sym
      .join(supp.select(col("i").as("item"), col("n").as("n_item")), "item")
      .join(supp.select(col("i").as("rec"), col("n").as("n_rec")), "rec")
      .select(col("item"), col("rec"), col("c"),
        round(col("c").cast("double") /
          sqrt(col("n_item").cast("double") * col("n_rec").cast("double")),
          6).as("cosine"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("rec").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
  }
  val q233Sql: String =
    """WITH p AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |           FROM lineitem),
      |sz AS (SELECT g FROM (SELECT g, count(*) AS s FROM p GROUP BY 1)
      |       WHERE s <= 1000),
      |pb AS (SELECT p.* FROM p JOIN sz USING (g)),
      |pr AS (SELECT x.i AS a, y.i AS b, count(*)::BIGINT AS c
      |       FROM pb x JOIN pb y ON x.g = y.g AND x.i < y.i
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |su AS (SELECT i, count(*)::BIGINT AS n FROM pb GROUP BY 1),
      |sy AS (SELECT a AS item, b AS rec, c FROM pr
      |       UNION ALL SELECT b, a, c FROM pr),
      |sc AS (SELECT item, rec, c,
      |         round(c::DOUBLE / sqrt(si.n::DOUBLE * sr.n::DOUBLE), 6)
      |           AS cosine
      |       FROM sy JOIN su si ON sy.item = si.i
      |       JOIN su sr ON sy.rec = sr.i)
      |SELECT item, rec, c, cosine, rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
      |    ORDER BY cosine DESC, rec ASC) AS rank FROM sc)
      |WHERE rank <= 5""".stripMargin

  // ---------------------------------------------------------------- q234
  /** Frequent triple mining (Apriori level 3): BRAND triples sharing ≥2
    * orders, scored by 3-way lift supp·n²/(sa·sb·sc). The item grain is
    * `p_brand` (a 25-value bounded dimension), deliberately NOT the raw
    * part key: part keys scale with SF so a fixed absolute support
    * empties the frontier as the catalog grows (measured: 12 rows at
    * sf0.01, 0 at sf0.1 on the key grain), while the brand triple space
    * is capped at C(25,3) ≈ 2.3k rows at ANY scale — the result stays
    * non-empty, bounded, and oracle-checkable. The Apriori prune comes
    * first — only brands that are themselves frequent (support ≥ 2)
    * enter the cubic expansion — and the per-basket valve caps the
    * blow-up at C(100,3); real baskets hold ≤7 brands, so the triple
    * join stays linear in baskets. Every join runs on the order key
    * (equi), never item×item. */
  def q234AprioriTriples(s: SparkSession, dir: String): DataFrame = {
    val brands = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"))
    val p = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("p_partkey"))
      .join(brands, "p_partkey")
      .select(col("g"), col("p_brand").as("i"))
      .distinct()
    val keep = p.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= 100).select(col("g"))
    val pb = p.join(keep, "g").localCheckpoint()
    val fi = pb.groupBy(col("i")).agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2)
    val fb = pb.join(fi, "i").localCheckpoint()
    val nOrders = pb.select(col("g")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val triples = fb.as("x").join(fb.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .join(fb.as("z"),
        col("y.g") === col("z.g") && col("y.i") < col("z.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"), col("z.i").as("c"))
      .agg(count(lit(1)).as("supp_abc"),
        first(col("x.supp")).as("sa"), first(col("y.supp")).as("sb"),
        first(col("z.supp")).as("sc"))
      .filter(col("supp_abc") >= 2)
    triples.crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("c"), col("supp_abc"),
        round(col("supp_abc").cast("double") * col("n_orders").cast("double")
          * col("n_orders").cast("double") /
          (col("sa").cast("double") * col("sb").cast("double") *
            col("sc").cast("double")), 6).as("lift3"))
  }
  val q234Sql: String =
    """WITH p AS (SELECT DISTINCT l_orderkey AS g, p_brand AS i
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |sz AS (SELECT g FROM (SELECT g, count(*) AS s FROM p GROUP BY 1)
      |       WHERE s <= 100),
      |pb AS (SELECT p.* FROM p JOIN sz USING (g)),
      |fi AS (SELECT i, count(*)::BIGINT AS supp FROM pb GROUP BY 1
      |       HAVING count(*) >= 2),
      |fb AS (SELECT pb.g, pb.i, fi.supp FROM pb JOIN fi USING (i)),
      |no AS (SELECT count(DISTINCT g)::BIGINT AS n_orders FROM pb),
      |tr AS (SELECT x.i AS a, y.i AS b, z.i AS c,
      |         count(*)::BIGINT AS supp_abc,
      |         any_value(x.supp) AS sa, any_value(y.supp) AS sb,
      |         any_value(z.supp) AS sc
      |       FROM fb x JOIN fb y ON x.g = y.g AND x.i < y.i
      |       JOIN fb z ON y.g = z.g AND y.i < z.i
      |       GROUP BY 1, 2, 3 HAVING count(*) >= 2)
      |SELECT a, b, c, supp_abc,
      |  round(supp_abc::DOUBLE * n_orders::DOUBLE * n_orders::DOUBLE /
      |        (sa::DOUBLE * sb::DOUBLE * sc::DOUBLE), 6) AS lift3
      |FROM tr, no""".stripMargin

  // ---------------------------------------------------------------- q235
  /** Simplified silhouette of the q70 k-means model: per cluster, the
    * mean of s = (b−a)/max(a,b) where a = distance to the assigned
    * (nearest) centroid and b = distance to the second-nearest — the
    * centroid-based silhouette that needs one 8-row broadcast against
    * the corpus instead of all-pairs member distances. Assignment
    * replays q70's deterministic rounded-argmin; per-point s is
    * quantized to exact micro-units before the per-cluster mean so the
    * aggregate is partition-order-free. The oracle replays both Lloyd
    * iterations via the shared q70 CTE chain. */
  def q235Silhouette(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = graft.functions.Similarity.kmeansTrain(
      QueriesExt.embs(s, dir), k = 8, iters = 2, dim = 64)
    val cf = s.createDataFrame(cents.zipWithIndex.map {
      case (v, i) => (i, v)
    }).toDF("cid", "cv")
    val d = QueriesExt.embs(s, dir).crossJoin(broadcast(cf))
      .select(col("vec_id"), col("cid"),
        round(graft.functions.Similarity.l2Sq(col("embedding"), col("cv")),
          6).as("d2"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cid").asc)
    val ab = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("vec_id"))
      .agg(min(when(col("rn") === 1, col("cid"))).as("cell"),
        min(when(col("rn") === 1, col("d2"))).as("a2"),
        min(when(col("rn") === 2, col("d2"))).as("b2"))
    val aD = sqrt(col("a2")); val bD = sqrt(col("b2"))
    val sil = when(greatest(aD, bD) > 0.0d,
      (bD - aD) / greatest(aD, bD)).otherwise(0.0d)
    ab.select(col("cell"),
        round(sil * 1000000.0d, 0).cast("long").as("sm"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("sm")).as("ssm"))
      .select(col("cell"), col("n"),
        round(col("ssm").cast("double") / col("n").cast("double") /
          1000000.0d, 6).as("avg_sil"))
  }
  val q235Sql: String = {
    val silCase = "CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0.0 " +
      "THEN (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) " +
      "ELSE 0.0 END"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ds AS (SELECT unnest(range(1, 65)) AS i),
       |c0 AS (SELECT vec_id::INT AS cid, v AS cv FROM e WHERE vec_id < 8),
       |${QueriesExt.kmAssignCte("a1", "c0")},
       |${QueriesExt.kmMeanCte("c1", "a1", "c0")},
       |${QueriesExt.kmAssignCte("a2", "c1")},
       |${QueriesExt.kmMeanCte("c2", "a2", "c1")},
       |d AS (SELECT e.vec_id, c.cid,
       |        round(${QueriesExt.l2SqlOf("e.v", "c.cv")}, 6) AS d2
       |      FROM e, c2 c),
       |r AS (SELECT vec_id, cid, d2, ROW_NUMBER() OVER (
       |        PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
       |ab AS (SELECT vec_id, min(CASE WHEN rn = 1 THEN cid END) AS cell,
       |         min(CASE WHEN rn = 1 THEN d2 END) AS a2,
       |         min(CASE WHEN rn = 2 THEN d2 END) AS b2
       |       FROM r WHERE rn <= 2 GROUP BY 1),
       |sv AS (SELECT cell, round(($silCase) * 1000000.0)::BIGINT AS sm
       |       FROM ab)
       |SELECT cell, count(*)::BIGINT AS n,
       |  round(sum(sm)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6)
       |    AS avg_sil
       |FROM sv GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q236
  /** Correlation matrix of the line-item metrics (quantity, price,
    * discount, tax): all four means, variances, and six pairwise
    * Pearson correlations from ONE map-side-combinable pass over exact
    * integer units (whole dollars / percent points — chosen so every
    * cross-product sum fits a BIGINT through sf10+), melted to the
    * (x, y, r) triangle by a 6-branch select over the single
    * sufficient-statistics row. The canonical "which levers move
    * together" screen, at 100 TB for the cost of one scan. */
  def q236MetricCorr(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("q"),
      round(col("l_extendedprice"), 0).cast("long").as("p"),
      round(col("l_discount") * 100.0d, 0).cast("long").as("d"),
      round(col("l_tax") * 100.0d, 0).cast("long").as("t"))
    val ms = Seq("q", "p", "d", "t")
    val aggs = count(lit(1)).as("n") +:
      (ms.map(x => sum(col(x)).as(s"s_$x")) ++
        (for (i <- ms.indices; j <- i until ms.length)
          yield sum(col(ms(i)) * col(ms(j))).as(s"ss_${ms(i)}${ms(j)}")))
    val stats = li.agg(aggs.head, aggs.tail: _*)
    def r(x: String, y: String) = {
      val n = col("n").cast("double")
      val cov = n * col(s"ss_$x$y").cast("double") -
        col(s"s_$x").cast("double") * col(s"s_$y").cast("double")
      val vx = n * col(s"ss_$x$x").cast("double") -
        col(s"s_$x").cast("double") * col(s"s_$x").cast("double")
      val vy = n * col(s"ss_$y$y").cast("double") -
        col(s"s_$y").cast("double") * col(s"s_$y").cast("double")
      stats.select(lit(x).as("metric_x"), lit(y).as("metric_y"),
        col("n"), round(cov / sqrt(vx) / sqrt(vy), 6).as("r"))
    }
    (for (i <- ms.indices; j <- (i + 1) until ms.length)
      yield r(ms(i), ms(j))).reduce(_ unionByName _)
  }
  val q236Sql: String = {
    def rSql(x: String, y: String): String = {
      val cov = s"(n::DOUBLE * ss_$x$y::DOUBLE - s_$x::DOUBLE * s_$y::DOUBLE)"
      val vx = s"(n::DOUBLE * ss_$x$x::DOUBLE - s_$x::DOUBLE * s_$x::DOUBLE)"
      val vy = s"(n::DOUBLE * ss_$y$y::DOUBLE - s_$y::DOUBLE * s_$y::DOUBLE)"
      s"SELECT '$x' AS metric_x, '$y' AS metric_y, n, " +
        s"round($cov / sqrt($vx) / sqrt($vy), 6) AS r FROM st"
    }
    val ms = Seq("q", "p", "d", "t")
    val pairs = for (i <- ms.indices; j <- (i + 1) until ms.length)
      yield rSql(ms(i), ms(j))
    s"""WITH li AS (SELECT l_quantity::BIGINT AS q,
       |        round(l_extendedprice)::BIGINT AS p,
       |        round(l_discount * 100.0)::BIGINT AS d,
       |        round(l_tax * 100.0)::BIGINT AS t FROM lineitem),
       |st AS (SELECT count(*)::BIGINT AS n,
       |  sum(q)::BIGINT AS s_q, sum(p)::BIGINT AS s_p,
       |  sum(d)::BIGINT AS s_d, sum(t)::BIGINT AS s_t,
       |  sum(q * q)::BIGINT AS ss_qq, sum(q * p)::BIGINT AS ss_qp,
       |  sum(q * d)::BIGINT AS ss_qd, sum(q * t)::BIGINT AS ss_qt,
       |  sum(p * p)::BIGINT AS ss_pp, sum(p * d)::BIGINT AS ss_pd,
       |  sum(p * t)::BIGINT AS ss_pt, sum(d * d)::BIGINT AS ss_dd,
       |  sum(d * t)::BIGINT AS ss_dt, sum(t * t)::BIGINT AS ss_tt
       |  FROM li)
       |${pairs.mkString("", "\nUNION ALL\n", "")}""".stripMargin
  }

  // ---------------------------------------------------------------- q237
  /** Haar wavelet energy spectrum of hourly traffic ([[TimeSeries
    * .haarEnergy]], levels 0–7): how much of the series' variation
    * lives at each dyadic scale (2-hour jitter vs 256-hour drift) —
    * the multi-resolution fingerprint that separates noisy-but-stable
    * feeds from drifting ones. Detail numerators stay exact integers;
    * incomplete edge blocks are dropped. */
  def q237HaarEnergy(s: SparkSession, dir: String): DataFrame =
    TimeSeries.haarEnergy(hourlyCounts(s, dir), "h", "n", maxLevel = 7)
  val q237Sql: String =
    s"""WITH $hourlyCte,
       |po AS (SELECT row_number() OVER (ORDER BY h) - 1 AS pos, n AS x
       |       FROM hr),
       |lv AS (SELECT unnest(range(0, 8)) AS level),
       |bl AS (SELECT level, (1::BIGINT << level) AS halflen,
       |         pos // ((1::BIGINT << level) * 2) AS block,
       |         sum(CASE WHEN (pos // (1::BIGINT << level)) % 2 = 0
       |             THEN x END)::BIGINT AS sl,
       |         count(CASE WHEN (pos // (1::BIGINT << level)) % 2 = 0
       |             THEN 1 END)::BIGINT AS nl,
       |         sum(CASE WHEN (pos // (1::BIGINT << level)) % 2 = 1
       |             THEN x END)::BIGINT AS sr,
       |         count(CASE WHEN (pos // (1::BIGINT << level)) % 2 = 1
       |             THEN 1 END)::BIGINT AS nr
       |       FROM po CROSS JOIN lv GROUP BY 1, 2, 3)
       |SELECT level, halflen * 2 AS block_len, count(*)::BIGINT AS n_coeffs,
       |  round(sum((sl - sr) * (sl - sr))::DOUBLE /
       |        (halflen::DOUBLE * halflen::DOUBLE), 6) AS energy,
       |  round(sum(abs(sl - sr))::DOUBLE / halflen::DOUBLE /
       |        count(*)::DOUBLE, 6) AS mean_abs
       |FROM bl WHERE nl = halflen AND nr = halflen
       |GROUP BY level, halflen""".stripMargin

  // ---------------------------------------------------------------- q238
  /** Markov steady state of user behavior: the stationary distribution
    * of the first-order event-type chain (q113's matrix), by 20 exact
    * integer power-iteration steps, published next to the empirical
    * type mix — "where does behavior settle vs where is it today".
    * The transition matrix is ≤|types|² rows (a DOMAIN-bounded
    * vocabulary, the k-means-centroid collect class), so the iteration
    * runs driver-side on micro-probability longs with truncating
    * division — bit-replayable by the oracle's unrolled 20-step CTE
    * chain, something float power iteration could never be. Transitions
    * into a state with no outgoing edges are dropped on BOTH sides
    * (the chain is restricted to the recurrent prev-state set). */
  def q238MarkovStationary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val edges = ev
      .select(col("user_id"), col("event_type"), col("ts_ms"),
        col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = edges.groupBy(col("prev_type")).agg(sum(col("n")).as("tn"))
    val pm = edges.join(tot, "prev_type")
      .select(col("prev_type"), col("next_type"),
        expr("(n * 1000000) div tn").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = pm.map(_._1).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val mat = Array.ofDim[Long](states.length, states.length)
    pm.foreach { case (a, b, p) =>
      idx.get(b).foreach(j => mat(idx(a))(j) = p)
    }
    var pi = Array.fill(states.length)(1000000L / states.length)
    for (_ <- 0 until 20) {
      val nxt = Array.ofDim[Long](states.length)
      for (j <- states.indices) {
        var acc = 0L
        for (i <- states.indices) acc += pi(i) * mat(i)(j)
        nxt(j) = acc / 1000000L
      }
      pi = nxt
    }
    val piDf = s.createDataFrame(states.toSeq.map(st => (st, pi(idx(st)))))
      .toDF("state", "pim")
    val totEv = ev.agg(count(lit(1)).as("te"))
    val emp = ev.groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(totEv))
    piDf.join(emp, "state")
      .select(col("state"),
        round(col("pim").cast("double") / 1000000.0d, 6).as("pi"),
        round(col("c").cast("double") / col("te").cast("double"), 6)
          .as("emp_share"))
  }
  val q238Sql: String = {
    def step(prev: String, out: String): String =
      s"""$out AS (SELECT pmf.next_type AS st,
         |  (sum($prev.pi * pmf.p) // 1000000)::BIGINT AS pi
         |  FROM $prev JOIN pmf ON $prev.st = pmf.prev_type GROUP BY 1)"""
        .stripMargin
    val chain = (1 to 20).map(i => step(s"p${i - 1}", s"p$i"))
      .mkString(",\n")
    s"""WITH o AS (SELECT user_id, event_type,
       |        lag(event_type) OVER (PARTITION BY user_id
       |          ORDER BY epoch_ms(ts), event_id) AS prev_type
       |      FROM events),
       |c AS (SELECT prev_type, event_type AS next_type,
       |        count(*)::BIGINT AS n
       |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |tt AS (SELECT prev_type, sum(n)::BIGINT AS tn FROM c GROUP BY 1),
       |pm AS (SELECT c.prev_type, c.next_type,
       |         ((n * 1000000) // tn)::BIGINT AS p
       |       FROM c JOIN tt ON c.prev_type = tt.prev_type),
       |pmf AS (SELECT * FROM pm
       |        WHERE next_type IN (SELECT prev_type FROM tt)),
       |p0 AS (SELECT prev_type AS st,
       |         (1000000 // (SELECT count(*) FROM tt))::BIGINT AS pi
       |       FROM tt),
       |$chain,
       |te AS (SELECT count(*)::BIGINT AS te FROM events),
       |em AS (SELECT event_type AS state, count(*)::BIGINT AS c
       |       FROM events GROUP BY 1)
       |SELECT tt.prev_type AS state,
       |  round(coalesce(p20.pi, 0)::DOUBLE / 1000000.0, 6) AS pi,
       |  round(c::DOUBLE / te::DOUBLE, 6) AS emp_share
       |FROM tt LEFT JOIN p20 ON tt.prev_type = p20.st
       |JOIN em ON em.state = tt.prev_type, te""".stripMargin
  }

  // ---------------------------------------------------------------- q239
  /** Isotonic calibration (PAVA by minimax): the best monotone
    * non-decreasing fit of return rate against discount level, via the
    * closed form iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) — no
    * iterative pooling, no order-dependent state. The discount domain
    * is ≤11 bins, so the interval/minimax expansion is a few thousand
    * rows of broadcast joins over ONE aggregated pass of the fact
    * table; interval means are exact integer ratios divided once. The
    * monotone answer to "do deeper discounts really buy fewer
    * returns". */
  def q239IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(s, dir)
      .groupBy(round(col("l_discount") * 100.0d, 0).cast("long").as("d"))
      .agg(count(lit(1)).as("n"),
        count(when(col("l_returnflag") === "R", lit(1))).as("r"))
      .localCheckpoint()
    val iv = b.as("j").join(b.as("k"), col("j.d") <= col("k.d"))
      .join(b.as("m"),
        col("m.d") >= col("j.d") && col("m.d") <= col("k.d"))
      .groupBy(col("j.d").as("dj"), col("k.d").as("dk"))
      .agg(sum(col("m.r")).as("rr"), sum(col("m.n")).as("nn"))
    val mi = iv.join(b.as("i"),
        col("i.d") >= col("dj") && col("i.d") <= col("dk"))
      .groupBy(col("dj"), col("i.d").as("di"))
      .agg(min(col("rr").cast("double") / col("nn").cast("double"))
        .as("m1"))
    val iso = mi.groupBy(col("di").as("d")).agg(max(col("m1")).as("iso"))
    b.join(iso, "d")
      .select(col("d").as("discount_pct"), col("n"),
        round(col("r").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"))
  }
  val q239Sql: String =
    """WITH b AS (SELECT round(l_discount * 100.0)::BIGINT AS d,
      |        count(*)::BIGINT AS n,
      |        count(CASE WHEN l_returnflag = 'R' THEN 1 END)::BIGINT AS r
      |      FROM lineitem GROUP BY 1),
      |iv AS (SELECT j.d AS dj, k.d AS dk, sum(m.r)::BIGINT AS rr,
      |         sum(m.n)::BIGINT AS nn
      |       FROM b j JOIN b k ON j.d <= k.d
      |       JOIN b m ON m.d >= j.d AND m.d <= k.d GROUP BY 1, 2),
      |mi AS (SELECT dj, i.d AS di,
      |         min(rr::DOUBLE / nn::DOUBLE) AS m1
      |       FROM iv JOIN b i ON i.d >= iv.dj AND i.d <= iv.dk
      |       GROUP BY 1, 2),
      |iso AS (SELECT di AS d, max(m1) AS iso FROM mi GROUP BY 1)
      |SELECT b.d AS discount_pct, n,
      |       round(r::DOUBLE / n::DOUBLE, 6) AS raw_rate,
      |       round(iso, 6) AS iso_rate
      |FROM b JOIN iso ON b.d = iso.d""".stripMargin

  // ---------------------------------------------------------------- q240
  /** RFM segmentation: every customer scored 0–4 on Recency (days
    * since last order, inverted so recent = high), Frequency, and
    * Monetary by exact quintile boundaries ([[RobustStats
    * .withQuantileBin]] — one percentile row per axis, broadcast
    * back), rolled up to the segment grain. The classic CRM cut,
    * produced with three boundary models and two aggregates — the
    * customer table is scanned, binned, and re-aggregated without a
    * single data-scaled window or collect. */
  def q240RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey").as("ck"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"),
      round(col("o_totalprice"), 0).cast("long").as("dol"))
    val anchor = o.agg(max(col("day")).as("maxd"))
    val cu = o.groupBy(col("ck"))
      .agg(max(col("day")).as("lastd"), count(lit(1)).as("f"),
        sum(col("dol")).as("m"))
      .crossJoin(broadcast(anchor))
      .withColumn("rdays", col("maxd") - col("lastd"))
    val probs = Seq(0.2, 0.4, 0.6, 0.8)
    val binned = graft.functions.RobustStats.withQuantileBin(
      graft.functions.RobustStats.withQuantileBin(
        graft.functions.RobustStats.withQuantileBin(
          cu, "rdays", probs, "rbin"),
        "f", probs, "fbin"),
      "m", probs, "mbin")
    binned
      .select(((lit(4) - col("rbin")) * 100 + col("fbin") * 10 +
        col("mbin")).as("rfm_code"), col("m"))
      .groupBy(col("rfm_code"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("m")).cast("double") / count(lit(1)).cast("double"),
          2).as("avg_monetary"))
  }
  val q240Sql: String = {
    def bins(v: String, pfx: String): String = Seq(0.2, 0.4, 0.6, 0.8)
      .zipWithIndex.map { case (p, i) =>
        s"quantile_cont($v, $p) AS $pfx${i + 1}"
      }.mkString(", ")
    def score(v: String, pfx: String): String = (1 to 4)
      .map(i => s"(CASE WHEN $v > $pfx$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH o AS (SELECT o_custkey AS ck,
       |        epoch_ms(o_orderdate) // 86400000 AS day,
       |        round(o_totalprice)::BIGINT AS dol FROM orders),
       |an AS (SELECT max(day) AS maxd FROM o),
       |cu AS (SELECT ck, max(day) AS lastd, count(*)::BIGINT AS f,
       |         sum(dol)::BIGINT AS m FROM o GROUP BY 1),
       |cr AS (SELECT ck, maxd - lastd AS rdays, f, m FROM cu, an),
       |qb AS (SELECT ${bins("rdays", "r")}, ${bins("f", "f")},
       |         ${bins("m", "m")} FROM cr),
       |sc AS (SELECT ck, m,
       |         ${score("rdays", "r")} AS rbin,
       |         ${score("f", "f")} AS fbin,
       |         ${score("m", "m")} AS mbin
       |       FROM cr, qb)
       |SELECT (4 - rbin) * 100 + fbin * 10 + mbin AS rfm_code,
       |  count(*)::BIGINT AS n_cust,
       |  round(sum(m)::DOUBLE / count(*)::DOUBLE, 2) AS avg_monetary
       |FROM sc GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q241
  /** Segmented-trend breakpoint sweep: fit two independent least-
    * squares lines to daily purchase GMV — one before, one after each
    * candidate breakpoint — and rank breakpoints by combined SSE (the
    * broken-stick complement of q227's mean-shift CUSUM: CUSUM asks
    * "did the LEVEL jump", this asks "did the SLOPE change, where").
    * Every candidate's two fits come from exact prefix/suffix
    * sufficient statistics (one bounded-window pass; suffix = total −
    * prefix), so the sweep is O(days), not O(days²) refits. Segments
    * need ≥2 points; the min-SSE row is flagged. */
  def q241SegmentedTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(sum(round(col("value"), 0).cast("long")).as("y"))
    val wRun = BoundedWindow.orderBy(col("day"), col("day"))
      .rowsBetween(Long.MinValue, 0)
    val wAll = BoundedWindow.all(col("day"))
    val pre = daily
      .withColumn("pos", count(lit(1)).over(wRun))
      .withColumn("sx", sum(col("day")).over(wRun))
      .withColumn("sy", sum(col("y")).over(wRun))
      .withColumn("sxy", sum(col("day") * col("y")).over(wRun))
      .withColumn("sxx", sum(col("day") * col("day")).over(wRun))
      .withColumn("syy", sum(col("y") * col("y")).over(wRun))
      .withColumn("tn", count(lit(1)).over(wAll))
      .withColumn("tx", sum(col("day")).over(wAll))
      .withColumn("ty", sum(col("y")).over(wAll))
      .withColumn("txy", sum(col("day") * col("y")).over(wAll))
      .withColumn("txx", sum(col("day") * col("day")).over(wAll))
      .withColumn("tyy", sum(col("y") * col("y")).over(wAll))
    def sse(n: Column, sx: Column, sy: Column, sxy: Column, sxx: Column,
            syy: Column): Column = {
      val nd = n.cast("double")
      val syyC = syy.cast("double") - sy.cast("double") * sy.cast("double") / nd
      val sxyC = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nd
      val sxxC = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nd
      syyC - sxyC * sxyC / sxxC
    }
    val sseL = sse(col("pos"), col("sx"), col("sy"), col("sxy"),
      col("sxx"), col("syy"))
    val sseR = sse(col("tn") - col("pos"), col("tx") - col("sx"),
      col("ty") - col("sy"), col("txy") - col("sxy"),
      col("txx") - col("sxx"), col("tyy") - col("syy"))
    val scored = pre
      .filter(col("pos") >= 2 && col("tn") - col("pos") >= 2)
      .select(col("day").as("break_day"), col("pos").as("n_left"),
        (col("tn") - col("pos")).as("n_right"),
        round(sseL, 4).as("sse_left"), round(sseR, 4).as("sse_right"),
        round(sseL + sseR, 4).as("sse_total"))
    scored.withColumn("is_best",
      col("sse_total") === min(col("sse_total"))
        .over(BoundedWindow.all(col("break_day"))))
  }
  val q241Sql: String = {
    def sse(n: String, sx: String, sy: String, sxy: String, sxx: String,
            syy: String): String = {
      val syyC = s"(($syy)::DOUBLE - ($sy)::DOUBLE * ($sy)::DOUBLE / ($n)::DOUBLE)"
      val sxyC = s"(($sxy)::DOUBLE - ($sx)::DOUBLE * ($sy)::DOUBLE / ($n)::DOUBLE)"
      val sxxC = s"(($sxx)::DOUBLE - ($sx)::DOUBLE * ($sx)::DOUBLE / ($n)::DOUBLE)"
      s"($syyC - $sxyC * $sxyC / $sxxC)"
    }
    val l = sse("pos", "sx", "sy", "sxy", "sxx", "syy")
    val r = sse("tn - pos", "tx - sx", "ty - sy", "txy - sxy",
      "txx - sxx", "tyy - syy")
    s"""WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
       |        sum(round("value")::BIGINT)::BIGINT AS y
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |p AS (SELECT day,
       |        count(*) OVER wr AS pos,
       |        sum(day) OVER wr AS sx, sum(y) OVER wr AS sy,
       |        sum(day * y) OVER wr AS sxy,
       |        sum(day * day) OVER wr AS sxx,
       |        sum(y * y) OVER wr AS syy,
       |        count(*) OVER () AS tn,
       |        sum(day) OVER () AS tx, sum(y) OVER () AS ty,
       |        sum(day * y) OVER () AS txy,
       |        sum(day * day) OVER () AS txx,
       |        sum(y * y) OVER () AS tyy
       |      FROM d
       |      WINDOW wr AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
       |sc AS (SELECT day AS break_day, pos::BIGINT AS n_left,
       |         (tn - pos)::BIGINT AS n_right,
       |         round($l, 4) AS sse_left, round($r, 4) AS sse_right,
       |         round($l + $r, 4) AS sse_total
       |       FROM p WHERE pos >= 2 AND tn - pos >= 2)
       |SELECT *, sse_total = min(sse_total) OVER () AS is_best
       |FROM sc""".stripMargin
  }

  // ---------------------------------------------------------------- q242
  /** Diagonal-Mahalanobis embedding outliers: per-dimension mean and
    * variance from ONE pass ([[graft.functions.Similarity
    * .embeddingMoments]], a 64-row bounded model), then every vector's
    * D² = Σᵢ (xᵢ−mᵢ)²/σᵢ² as a left-to-right fold over the broadcast
    * moment arrays — the variance-aware outlier score that catches
    * vectors hiding inside the L2 ball along low-variance axes.
    * Zero-variance dimensions contribute 0 by definition. Top 50 by
    * rounded score (TakeOrdered — no global sort materializes). */
  def q242MahalanobisOutliers(s: SparkSession, dir: String): DataFrame = {
    val mom = graft.functions.Similarity.embeddingMoments(
      QueriesExt.embs(s, dir))
      .select(col("dim"), col("mean"), col("variance"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mLit = array(mom.map(m => lit(m._2)): _*)
    val vLit = array(mom.map(m => lit(m._3)): _*)
    val dev = zip_with(col("embedding").cast("array<double>"), mLit,
      (x, m) => x - m)
    val contrib = zip_with(dev, vLit,
      (d, v) => when(v > 0.0d, d * d / v).otherwise(0.0d))
    val d2 = aggregate(contrib, lit(0.0d), (acc, x) => acc + x)
    QueriesExt.embs(s, dir)
      .select(col("vec_id"), round(d2, 4).as("d2"))
      .orderBy(col("d2").desc, col("vec_id").asc)
      .limit(50)
  }
  val q242Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ds AS (SELECT unnest(range(1, 65))::INT AS i),
       |x AS (SELECT ds.i AS dim, round(e.v[ds.i] * 1000000)::BIGINT AS xi
       |      FROM e, ds),
       |g AS (SELECT dim, count(*)::BIGINT AS n, sum(xi)::DOUBLE AS s1,
       |             sum(xi * xi)::DOUBLE AS s2
       |      FROM x GROUP BY 1),
       |mo AS (SELECT dim,
       |         round((s1::DOUBLE / n) / 1000000.0, 6) AS m,
       |         round(((s2::DOUBLE / n) - (s1::DOUBLE / n) * (s1::DOUBLE / n))
       |               / 1000000000000.0, 6) AS va
       |       FROM g),
       |mv AS (SELECT list(m ORDER BY dim) AS ml,
       |              list(va ORDER BY dim) AS vl FROM mo),
       |sc AS (SELECT vec_id,
       |         round(list_sum(list_transform(list_zip(e.v, mv.ml, mv.vl),
       |           p -> CASE WHEN p[3] > 0.0 THEN (p[1] - p[2]) * (p[1] - p[2])
       |                     / p[3] ELSE 0.0 END)), 4) AS d2
       |       FROM e, mv)
       |SELECT vec_id, d2 FROM sc
       |ORDER BY d2 DESC, vec_id ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q243
  /** Split-conformal prediction interval for the naive weekly
    * forecast: calibrate |residual| of the lag-7 predictor on the
    * first ⅔ of forecastable days, take the 0.9 exact quantile as the
    * interval half-width, and report achieved coverage on the held-out
    * tail — the distribution-free "how wide must the band be"
    * guarantee (finite-sample ≥90% in expectation, no normality
    * assumed). One bounded series, one exact percentile, one
    * aggregate. */
  def q243ConformalInterval(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(sum(round(col("value"), 0).cast("long")).as("y"))
    val wOrd = BoundedWindow.orderBy(col("day"), col("day"))
    val resid = daily
      .withColumn("fc", lag(col("y"), 7).over(wOrd))
      .filter(col("fc").isNotNull)
      .withColumn("ad", abs(col("y") - col("fc")))
      .withColumn("rn", row_number().over(
        BoundedWindow.orderBy(col("day"), col("day"))).cast("long"))
      .withColumn("nf", count(lit(1)).over(BoundedWindow.all(col("day"))))
      .withColumn("cal", col("rn") <= expr("(2 * nf) div 3"))
    val q = resid.filter(col("cal"))
      .agg(percentile(col("ad"), lit(0.9)).as("qa"),
        count(lit(1)).as("n_cal"))
    resid.filter(!col("cal")).crossJoin(broadcast(q))
      .agg(first(col("n_cal")).as("n_cal"), count(lit(1)).as("n_eval"),
        round(first(col("qa")), 2).as("q_alpha"),
        round(count(when(col("ad").cast("double") <= col("qa"), lit(1)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("coverage"))
  }
  val q243Sql: String =
    """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |        sum(round("value")::BIGINT)::BIGINT AS y
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |r AS (SELECT day, y, lag(y, 7) OVER (ORDER BY day) AS fc FROM d),
      |f AS (SELECT day, abs(y - fc) AS ad,
      |        row_number() OVER (ORDER BY day) AS rn,
      |        count(*) OVER () AS nf
      |      FROM r WHERE fc IS NOT NULL),
      |fl AS (SELECT day, ad, rn <= (2 * nf) // 3 AS cal FROM f),
      |q AS (SELECT quantile_cont(ad, 0.9) AS qa, count(*)::BIGINT AS n_cal
      |      FROM fl WHERE cal)
      |SELECT any_value(n_cal) AS n_cal, count(*)::BIGINT AS n_eval,
      |  round(any_value(qa), 2) AS q_alpha,
      |  round(count(CASE WHEN ad::DOUBLE <= qa THEN 1 END)::DOUBLE
      |        / count(*)::DOUBLE, 6) AS coverage
      |FROM fl, q WHERE NOT cal""".stripMargin

  /** Registry for this tier. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q225_correlogram" -> (q225Correlogram _),
    "q226_cross_correlation" -> (q226CrossCorrelation _),
    "q227_cusum_changepoint" -> (q227CusumChangepoint _),
    "q228_stl_decompose" -> (q228StlDecompose _),
    "q229_bh_fdr" -> (q229BhFdr _),
    "q230_jackknife_ratio" -> (q230JackknifeRatio _),
    "q231_permutation_test" -> (q231PermutationTest _),
    "q232_pareto_frontier" -> (q232ParetoFrontier _),
    "q233_item_cf" -> (q233ItemCf _),
    "q234_apriori_triples" -> (q234AprioriTriples _),
    "q235_silhouette" -> (q235Silhouette _),
    "q236_metric_corr" -> (q236MetricCorr _),
    "q237_haar_energy" -> (q237HaarEnergy _),
    "q238_markov_stationary" -> (q238MarkovStationary _),
    "q239_isotonic_calibration" -> (q239IsotonicCalibration _),
    "q240_rfm_segments" -> (q240RfmSegments _),
    "q241_segmented_trend" -> (q241SegmentedTrend _),
    "q242_mahalanobis_outliers" -> (q242MahalanobisOutliers _),
    "q243_conformal_interval" -> (q243ConformalInterval _)
  )

  val oracles: Map[String, String] = Map(
    "q225_correlogram" -> q225Sql,
    "q226_cross_correlation" -> q226Sql,
    "q227_cusum_changepoint" -> q227Sql,
    "q228_stl_decompose" -> q228Sql,
    "q229_bh_fdr" -> q229Sql,
    "q230_jackknife_ratio" -> q230Sql,
    "q231_permutation_test" -> q231Sql,
    "q232_pareto_frontier" -> q232Sql,
    "q233_item_cf" -> q233Sql,
    "q234_apriori_triples" -> q234Sql,
    "q235_silhouette" -> q235Sql,
    "q236_metric_corr" -> q236Sql,
    "q237_haar_energy" -> q237Sql,
    "q238_markov_stationary" -> q238Sql,
    "q239_isotonic_calibration" -> q239Sql,
    "q240_rfm_segments" -> q240Sql,
    "q241_segmented_trend" -> q241Sql,
    "q242_mahalanobis_outliers" -> q242Sql,
    "q243_conformal_interval" -> q243Sql
  )
}
