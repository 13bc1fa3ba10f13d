package graft

import graft.functions.{Graphs, HistSketch, Packing, Relevance, Similarity}
import graft.operators.Expectations
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries q124+ — the graph tier (triangles, communities,
  * k-core, neighborhood LSH, degree power-law), mergeable quantile
  * summaries, data/schema audits (FD, fingerprints, Benford,
  * expectations-adjacent), text/IR additions (PMI, trigram search, LSH
  * tuning), embedding reports (drift, PCA, quantization error, IVF
  * balance), planning ops (compaction, waterfill, join-size, skew),
  * warehouse/product analytics (survivorship, association rules, SCD2
  * point-in-time, funnel latency, cohort LTV, Wilson intervals,
  * seasonality), and streaming-config audits (watermark lateness,
  * re-delivery lag). Every entry has a DuckDB oracle replay; see
  * COVERAGE.md for the map. */
object QueriesExt4 {

  /** Shared co-purchase edge list: distinct part pairs sharing an order
    * ([[Graphs.coOccurrenceEdges]]); feeds the whole graph tier (q124,
    * q130, q134, q142, q148, q162, q177, q282 in QueriesExt10).
    *
    * Distinct edges, measured deliberately: skipping this dedup in
    * favor of the consumers' own distincts was benchmarked SLOWER
    * (10.9 s vs 7.5 s for q130 at sf0.1) — the early distinct collapses
    * the 4.4M-row pair expansion to 1.2M rows BEFORE the heavier
    * member-grain shuffles downstream.
    *
    * Memoized + persisted per (session, dir): seven graph queries per
    * sweep were each re-running the same pair expansion from scratch
    * (VERDICT r8's top bench-profile item). The edge list is ~1.2M
    * narrow (long, long) rows at sf0.1 — an LRU-evictable ~20 MB block;
    * at 100 TB the same move holds (materialize the shared edge list
    * once, let every graph consumer read it). */
  private val coPurchaseCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private[graft] def coPurchase(s: SparkSession, dir: String): DataFrame = {
    // Self-cleaning memo: purge entries owned by stopped sessions on
    // every access, so a long-lived JVM that cycles sessions (test
    // suites) cannot accumulate stale session/plan references — the
    // cached blocks died with the session's context, only the map
    // entry lingers and removal is all the cleanup left to do.
    coPurchaseCache.keys.foreach { case k @ (sess, _) =>
      if (sess.sparkContext.isStopped) coPurchaseCache.remove(k)
    }
    coPurchaseCache.getOrElseUpdate((s, dir),
      Graphs.coOccurrenceEdges(Tables.lineitem(s, dir),
          "l_orderkey", "l_partkey")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
  /** Drops every memoized edge list and releases its storage. Call
    * after overwriting/regenerating the parquet under a cached dir —
    * the memo has no file-watch invalidation (the harness's testdata
    * is immutable per sweep, so none is needed there). */
  def invalidateCoPurchaseCache(): Unit = {
    coPurchaseCache.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => })
    coPurchaseCache.clear()
  }

  private[graft] val coPurchaseSqlCte: String =
    """p AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |sz AS (SELECT g FROM (SELECT g, count(*) AS s FROM p GROUP BY 1)
      |       WHERE s <= 1000),
      |pb AS (SELECT p.* FROM p JOIN sz USING (g)),
      |e AS (SELECT DISTINCT x.i AS a, y.i AS b
      |      FROM pb x JOIN pb y ON x.g = y.g AND x.i < y.i)""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Global triangle census of the co-purchase graph (parts sharing an
    * order) via degree-ordered orientation ([[Graphs.triangleStats]]):
    * each edge directs from its lower-(degree, id) endpoint, wedges
    * enumerate at the out-apex (out-degree is O(√m)-bounded by the
    * orientation — a hub never expands deg² wedges), and ONE equi-join
    * against the oriented edge set closes them, each triangle exactly
    * once. n_wedges comes from the degree table alone; clustering =
    * 3·triangles/wedges is the one rounded double. */
  def q124Triangles(s: SparkSession, dir: String): DataFrame =
    Graphs.triangleStats(coPurchase(s, dir))
  val q124Sql: String =
    s"""WITH $coPurchaseSqlCte,
       |d AS (SELECT v, count(*)::BIGINT AS deg FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |wd AS (SELECT e.a, e.b, da.deg AS dega, db.deg AS degb
       |       FROM e JOIN d da ON e.a = da.v JOIN d db ON e.b = db.v),
       |o AS (SELECT
       |        CASE WHEN dega < degb OR (dega = degb AND a < b)
       |             THEN a ELSE b END AS src,
       |        CASE WHEN dega < degb OR (dega = degb AND a < b)
       |             THEN b ELSE a END AS dst,
       |        CASE WHEN dega < degb OR (dega = degb AND a < b)
       |             THEN degb ELSE dega END AS ddst
       |      FROM wd),
       |w AS (SELECT e1.dst AS v, e2.dst AS w
       |      FROM o e1 JOIN o e2 ON e1.src = e2.src
       |        AND (e1.ddst < e2.ddst
       |             OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))),
       |tri AS (SELECT count(*)::BIGINT AS n_triangles
       |        FROM w JOIN o ON w.v = o.src AND w.w = o.dst),
       |base AS (SELECT count(*)::BIGINT AS n_nodes,
       |           (sum(deg) / 2)::BIGINT AS n_edges,
       |           sum(deg * (deg - 1) / 2)::BIGINT AS n_wedges FROM d)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |       round(3.0 * n_triangles::DOUBLE / n_wedges::DOUBLE, 6)
       |         AS clustering
       |FROM base, tri""".stripMargin

  // ---------------------------------------------------------------- q125
  /** Mergeable log₂-histogram percentiles ([[HistSketch]]): per-(type,
    * day) bin-count rows built once, merged per type by plain addition
    * (counts are additive — the q114 maintenance property for ORDER
    * statistics), p50/p95/p99 estimated as bin lower bounds next to the
    * exact rank statistic, with the merged-vs-direct identity published
    * per row. The exact tier sorts narrow (type, vm) rows — the eval
    * baseline; at 100 TB only the sketch tier runs, reading ≤64 bin
    * rows per (type, day) instead of the data. */
  def q125HistPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Seq((1, 2), (19, 20), (99, 100))
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("ts_ms div 86400000").as("day"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val daily = HistSketch.logHistogram(
      ev.select(concat_ws("|", col("event_type"), col("day")).as("g"),
        col("vm")), "g", col("vm"))
    val merged = HistSketch.percentilesFromHistogram(
      HistSketch.mergeHistograms(
        daily.select(substring_index(col("g"), "|", 1).as("g"),
          col("b"), col("n"))), ps)
    val direct = HistSketch.percentilesFromHistogram(
      HistSketch.logHistogram(
        ev.select(col("event_type").as("g"), col("vm")), "g", col("vm")), ps)
    val exact = {
      // ONE rank window over events (the eval tier's single data sort);
      // the three percentile targets attach as an exploded literal list
      // so the grain is never re-ranked per p.
      val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("nn"))
      val rn = ev.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("vm"))))
      val pList = array(ps.map { case (num, den) =>
        struct(lit(num).as("p_num"), lit(den).as("den")) }: _*)
      rn.join(n, "event_type")
        .select(col("event_type"), col("vm"), col("rn"), col("nn"),
          explode(pList).as("p"))
        .filter(col("rn") === floor((col("nn") * col("p.p_num") +
          (col("p.den") - 1)) / col("p.den")).cast("long"))
        .select(col("event_type"), col("p.p_num").as("p_num"),
          round(col("vm").cast("double") / 1000000.0d, 6).as("exact_v"))
    }
    merged.select(col("g").as("event_type"), col("p_num"), col("n_total"),
        col("est_lo"))
      .join(direct.select(col("g").as("event_type"), col("p_num"),
        col("est_lo").as("est_lo_direct")), Seq("event_type", "p_num"))
      .join(exact, Seq("event_type", "p_num"))
      .select(col("event_type"), col("p_num"), col("n_total"),
        round(col("est_lo").cast("double") / 1000000.0d, 6).as("est_v"),
        col("exact_v"),
        (col("est_lo") === col("est_lo_direct")).as("identical"))
  }
  val q125Sql: String =
    """WITH ev AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |        round("value" * 1000000.0)::BIGINT AS vm FROM events),
      |daily AS (SELECT event_type, day,
      |            (length(bin(vm)) - 1)::INT AS b, count(*)::BIGINT AS n
      |          FROM ev WHERE vm > 0 GROUP BY 1, 2, 3),
      |mh AS (SELECT event_type, b, sum(n)::BIGINT AS n
      |       FROM daily GROUP BY 1, 2),
      |mc AS (SELECT event_type, b, sum(n) OVER
      |         (PARTITION BY event_type ORDER BY b) AS cum,
      |         sum(n) OVER (PARTITION BY event_type) AS n_total
      |       FROM mh),
      |dh AS (SELECT event_type, (length(bin(vm)) - 1)::INT AS b,
      |         count(*)::BIGINT AS n
      |       FROM ev WHERE vm > 0 GROUP BY 1, 2),
      |dc AS (SELECT event_type, b, sum(n) OVER
      |         (PARTITION BY event_type ORDER BY b) AS cum,
      |         sum(n) OVER (PARTITION BY event_type) AS n_total
      |       FROM dh),
      |ps AS (SELECT * FROM (VALUES (1, 2), (19, 20), (99, 100))
      |       AS t(num, den)),
      |me AS (SELECT event_type, num AS p_num,
      |         max(n_total)::BIGINT AS n_total,
      |         (1::BIGINT << min(b))::BIGINT AS est_lo
      |       FROM mc, ps
      |       WHERE cum >= (n_total * num + den - 1) // den
      |       GROUP BY 1, 2),
      |de AS (SELECT event_type, num AS p_num,
      |         (1::BIGINT << min(b))::BIGINT AS est_lo_direct
      |       FROM dc, ps
      |       WHERE cum >= (n_total * num + den - 1) // den
      |       GROUP BY 1, 2),
      |rn AS (SELECT event_type, vm,
      |         row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS nn
      |       FROM ev),
      |ex AS (SELECT event_type, num AS p_num,
      |         round(vm::DOUBLE / 1000000.0, 6) AS exact_v
      |       FROM rn, ps
      |       WHERE rn = (nn * num + den - 1) // den)
      |SELECT me.event_type, me.p_num, n_total,
      |       round(est_lo::DOUBLE / 1000000.0, 6) AS est_v, exact_v,
      |       est_lo = est_lo_direct AS identical
      |FROM me JOIN de ON me.event_type = de.event_type
      |                AND me.p_num = de.p_num
      |JOIN ex ON me.event_type = ex.event_type AND me.p_num = ex.p_num"""
      .stripMargin

  // ---------------------------------------------------------------- q126
  /** Functional-dependency audit ([[Expectations.fdAudit]]) across two
    * tables: does the left column determine the right one? `event_id →
    * user_id` and `doc_id → source` hold (key-like columns); `user_id →
    * event_type` and `source → lang` are REAL violations (a user emits
    * many event types; a feed mixes languages) — the report names the
    * violation count and the worst fan-out, the numbers a schema
    * contract or a partitioning-key decision needs. Each FD is a
    * two-column pruned scan + two hash aggregates. */
  def q126FdAudit(s: SparkSession, dir: String): DataFrame =
    Expectations.fdAudit(Tables.events(s, dir), Seq(
      ("event_id->user_id", "event_id", "user_id"),
      ("user_id->event_type", "user_id", "event_type")))
      .unionByName(Expectations.fdAudit(Tables.documents(s, dir), Seq(
        ("doc_id->source", "doc_id", "source"),
        ("source->lang", "source", "lang"))))
  val q126Sql: String =
    """WITH f1 AS (SELECT l, count(*)::BIGINT AS fanout FROM
      |        (SELECT DISTINCT event_id AS l, user_id AS r FROM events)
      |        GROUP BY 1),
      |f2 AS (SELECT l, count(*)::BIGINT AS fanout FROM
      |        (SELECT DISTINCT user_id AS l, event_type AS r FROM events)
      |        GROUP BY 1),
      |f3 AS (SELECT l, count(*)::BIGINT AS fanout FROM
      |        (SELECT DISTINCT doc_id AS l, source AS r FROM documents)
      |        GROUP BY 1),
      |f4 AS (SELECT l, count(*)::BIGINT AS fanout FROM
      |        (SELECT DISTINCT source AS l, lang AS r FROM documents)
      |        GROUP BY 1)
      |SELECT 'event_id->user_id' AS fd, count(*)::BIGINT AS n_lhs,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT
      |         AS n_violating,
      |       max(fanout)::BIGINT AS max_fanout,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) = 0 AS holds
      |FROM f1
      |UNION ALL SELECT 'user_id->event_type', count(*)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT,
      |       max(fanout)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) = 0 FROM f2
      |UNION ALL SELECT 'doc_id->source', count(*)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT,
      |       max(fanout)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) = 0 FROM f3
      |UNION ALL SELECT 'source->lang', count(*)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT,
      |       max(fanout)::BIGINT,
      |       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) = 0 FROM f4"""
      .stripMargin

  // ---------------------------------------------------------------- q127
  /** PMI collocations ([[Relevance.pmiCollocations]]): the top-30
    * adjacent token pairs by pointwise mutual information (minCount 20)
    * — pairs that co-occur far above chance, where raw bigram frequency
    * (q56) just surfaces stopword pairs. One tokenize pass feeds both
    * count tables; vocabulary-sized equi-joins; one broadcast totals
    * row; rounded-PMI ranking with the pair as tie-break. */
  def q127PmiCollocations(s: SparkSession, dir: String): DataFrame =
    Relevance.pmiCollocations(Tables.documents(s, dir), "text",
      minCount = 20, topK = 30)
  val q127Sql: String = {
    val toks = QueriesExt.toksSql
    s"""WITH t AS (SELECT $toks AS toks FROM documents),
       |uni AS (SELECT unnest(toks) AS w FROM t),
       |uc AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY 1),
       |pr AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
       |       FROM t, unnest(range(1, len(toks))) AS r(i)),
       |pc AS (SELECT w1, w2, count(*)::BIGINT AS c_xy FROM pr
       |       GROUP BY 1, 2 HAVING count(*) >= 20),
       |tot AS (SELECT (SELECT sum(c) FROM uc)::BIGINT AS t_uni,
       |               (SELECT sum(c_xy) FROM pc)::BIGINT AS t_pair),
       |sc AS (SELECT w1, w2, c_xy, a.c AS c_x, b.c AS c_y,
       |         round(ln(c_xy::DOUBLE / t_pair::DOUBLE
       |                  / (a.c::DOUBLE / t_uni::DOUBLE)
       |                  / (b.c::DOUBLE / t_uni::DOUBLE)), 6) AS pmi
       |       FROM pc JOIN uc a ON pc.w1 = a.w
       |               JOIN uc b ON pc.w2 = b.w, tot)
       |SELECT w1, w2, c_xy, c_x, c_y, pmi FROM sc
       |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin
  }

  // ---------------------------------------------------------------- q128
  /** Small-file compaction plan ([[Packing.packDocs]] applied to a file
    * listing instead of token streams — the table-maintenance op that
    * keeps a 100 TB lake readable): files (here: deterministic
    * 10-doc groups with their byte mass) are packed per source into
    * ~8 KB output groups by cumulative cut in (bytes desc, id) order —
    * deterministic, replayable, no driver loop, and the plan is a
    * per-source window over the FILE listing (metadata-sized), never
    * the data. Output: one row per compaction group with its file
    * count and byte total. */
  def q128CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val files = Tables.documents(s, dir)
      .groupBy(col("source"), expr("doc_id div 10").as("fid"))
      .agg(sum(col("n_chars")).as("bytes"))
    Packing.packDocs(files, col("bytes"), 8192L, col("source"),
      Seq(col("bytes").desc, col("fid").asc))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
  }
  val q128Sql: String =
    """WITH f AS (SELECT source, doc_id // 10 AS fid,
      |        sum(n_chars)::BIGINT AS bytes
      |      FROM documents GROUP BY 1, 2),
      |c AS (SELECT source, fid, bytes,
      |        sum(greatest(bytes, 0)) OVER
      |          (PARTITION BY source ORDER BY bytes DESC, fid ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          - greatest(bytes, 0) AS strt
      |      FROM f)
      |SELECT source, (strt // 8192)::BIGINT AS pack_id,
      |       count(*)::BIGINT AS n_files, sum(bytes)::BIGINT AS bytes
      |FROM c GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q129
  /** Embedding mean-drift monitor ([[Similarity.embeddingMeanDrift]]):
    * odd vec_ids form the "current" population with a PLANTED +0.25
    * shift on dimension 8 (the silent-encoder-change scenario); the
    * per-dim exact micro-unit means flag |drift| > 0.1 — dimension 8
    * alone, since the natural even/odd noise tops out at ~0.035. One
    * corpus pass, ≤64 output rows. */
  def q129EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    val shifted = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(col("vec_id") % 2 === 1 && i === 7, 0.25d)
            .otherwise(0.0d)).as("embedding"))
    Similarity.embeddingMeanDrift(shifted, col("vec_id") % 2 === 1,
      threshold = 0.1)
  }
  val q129Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |ds AS (SELECT unnest(range(1, 65))::INT AS i),
      |x AS (SELECT ds.i AS dim, vec_id % 2 = 1 AS cur,
      |        round((e.v[ds.i] + CASE WHEN vec_id % 2 = 1 AND ds.i = 8
      |                                THEN 0.25 ELSE 0.0 END)
      |              * 1000000)::BIGINT AS xi
      |      FROM e, ds),
      |g AS (SELECT dim,
      |        sum(CASE WHEN NOT cur THEN 1 ELSE 0 END)::BIGINT AS n_ref,
      |        sum(CASE WHEN cur THEN 1 ELSE 0 END)::BIGINT AS n_cur,
      |        sum(CASE WHEN NOT cur THEN xi ELSE 0 END)::DOUBLE AS sr,
      |        sum(CASE WHEN cur THEN xi ELSE 0 END)::DOUBLE AS sc
      |      FROM x GROUP BY 1)
      |SELECT dim, n_ref, n_cur,
      |       round((sr / n_ref) / 1000000.0, 6) AS mean_ref,
      |       round((sc / n_cur) / 1000000.0, 6) AS mean_cur,
      |       round((sc / n_cur - sr / n_ref) / 1000000.0, 6) AS drift,
      |       abs(round((sc / n_cur - sr / n_ref) / 1000000.0, 6)) > 0.1
      |         AS drifted
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q130
  /** Neighborhood similarity at the LSH tier
    * ([[graft.functions.DedupFunctions.setMinhashPairs]]): every part
    * whose id ≡ 0 (mod 100) gets a planted CLONE (same co-purchase
    * neighborhood under id+10⁷ — the q102 planted-recall convention);
    * MinHash signatures over neighbor sets (16 portable affine hashes,
    * 4 bands) meet candidates in a band-bucket equi-join and exact
    * verification keeps pairs with Jaccard ≥ 0.9 — exactly the planted
    * clone pairs (identical sets ⇒ identical signatures ⇒ recall 1.0;
    * the graph's natural neighborhood overlap tops out far below 0.9,
    * so the `planted` flag doubles as a precision check).
    *
    * Why this tier: the exact all-candidate neighborhood Jaccard
    * ([[Graphs.neighborJaccard]], spec-tested) expands Σ_c C(deg c, 2)
    * wedge pairs — 148M on the sf0.1 co-purchase graph and quadratic in
    * density generally. The signature build is ONE linear pass over
    * adjacency rows; only band-colliding pairs ever materialize. */
  def q130NeighborLsh(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchase(s, dir)
    val adj = e.select(col("a").as("v"), col("b").as("nbr"))
      .unionByName(e.select(col("b").as("v"), col("a").as("nbr")))
    val planted = adj.filter(col("v") % 100 === 0)
      .select((col("v") + 10000000L).as("v"), col("nbr"))
    val all = adj.unionByName(planted)
    graft.functions.DedupFunctions.setMinhashPairs(all, "v", "nbr",
        numHashes = 16, bands = 4, threshold = 0.9)
      .withColumn("planted", col("id_b") - col("id_a") === 10000000L)
  }
  val q130Sql: String = {
    import graft.functions.DedupFunctions
    val coeffs = (1 to 16).map { i =>
      val (a, b) = DedupFunctions.minhashCoeff(i)
      s"($i, $a, $b)"
    }.mkString(", ")
    s"""WITH $coPurchaseSqlCte,
       |adj AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
       |alladj AS (SELECT * FROM adj
       |           UNION ALL
       |           SELECT v + 10000000, nbr FROM adj WHERE v % 100 = 0),
       |m AS (SELECT DISTINCT v, CAST(nbr AS VARCHAR) AS mb FROM alladj),
       |nsz AS (SELECT v, count(*)::BIGINT AS n_m FROM m GROUP BY 1),
       |tok AS (SELECT v, ('0x' || substring(md5(mb), 1, 15))::BIGINT
       |          & ${DedupFunctions.MinhashBaseMask} AS h0
       |        FROM m),
       |mh AS (SELECT v, seed,
       |         min((h0 * a + b) & ${DedupFunctions.MinhashOutMask}) AS hv
       |       FROM tok, (VALUES $coeffs) coeffs(seed, a, b)
       |       GROUP BY 1, 2),
       |sig AS (SELECT v, list(hv ORDER BY seed) AS sig FROM mh GROUP BY 1),
       |band AS (SELECT v, b,
       |           array_to_string(sig[b*4+1 : b*4+4], ',') AS bh
       |         FROM sig, (SELECT unnest(range(0, 4)) AS b) bands),
       |cand AS (SELECT DISTINCT x.v AS id_a, y.v AS id_b
       |         FROM band x JOIN band y
       |           ON x.b = y.b AND x.bh = y.bh AND x.v < y.v),
       |cm AS (SELECT c.id_a, c.id_b, count(*)::BIGINT AS common
       |       FROM cand c JOIN m ma ON ma.v = c.id_a
       |                   JOIN m mb2 ON mb2.v = c.id_b AND mb2.mb = ma.mb
       |       GROUP BY 1, 2),
       |j AS (SELECT id_a, id_b, common, sa.n_m AS n_a, sb.n_m AS n_b,
       |        round(common::DOUBLE / (sa.n_m + sb.n_m - common)::DOUBLE, 6)
       |          AS jaccard
       |      FROM cm JOIN nsz sa ON sa.v = id_a JOIN nsz sb ON sb.v = id_b)
       |SELECT id_a, id_b, common, n_a, n_b, jaccard,
       |       id_b - id_a = 10000000 AS planted
       |FROM j WHERE jaccard >= 0.9""".stripMargin
  }

  // ---------------------------------------------------------------- q131
  /** Trigram-index substring search ([[graft.functions.Search]]): three
    * `LIKE '%...%'`-style patterns answered through the trigram
    * inverted index — candidates from the 3 RAREST pattern trigrams
    * (the pg_trgm selective-trigram discipline: a stopword trigram
    * would drag in the corpus), exact `contains` verification on the
    * candidate set only. The report publishes candidates vs matches —
    * the index's false-positive rate is the honest metric. A pattern
    * with an unindexed trigram ('zzz qqq') provably matches nothing
    * and never touches a document. */
  def q131TrigramSearch(s: SparkSession, dir: String): DataFrame =
    graft.functions.Search.trigramSearch(s, Tables.documents(s, dir),
      "text", "doc_id",
      Seq("merge batch", "query big query", "zzz qqq"), selectK = 3)
  val q131Sql: String =
    """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
      |post AS (SELECT DISTINCT doc_id, substr(t, i, 3) AS tri
      |         FROM d, unnest(range(1, length(t) - 1)) AS r(i)),
      |dfq AS (SELECT tri, count(*)::BIGINT AS df FROM post GROUP BY 1),
      |pats AS (SELECT * FROM (VALUES ('merge batch'), ('query big query'),
      |         ('zzz qqq')) AS p(pattern)),
      |ptri AS (SELECT DISTINCT pattern, substr(lower(pattern), i, 3) AS tri
      |         FROM pats, unnest(range(1, length(pattern) - 1)) AS r(i)),
      |rk AS (SELECT pattern, ptri.tri, coalesce(df, 0) AS df,
      |         row_number() OVER (PARTITION BY pattern
      |           ORDER BY coalesce(df, 0) ASC, ptri.tri ASC) AS rk
      |       FROM ptri LEFT JOIN dfq ON ptri.tri = dfq.tri),
      |sel AS (SELECT * FROM rk WHERE rk <= 3),
      |req AS (SELECT pattern, count(*)::BIGINT AS req FROM sel GROUP BY 1),
      |cand AS (SELECT s.pattern, p.doc_id, count(*)::BIGINT AS hit
      |         FROM sel s JOIN post p ON s.tri = p.tri GROUP BY 1, 2),
      |cd AS (SELECT cand.pattern, doc_id FROM cand JOIN req USING (pattern)
      |       WHERE hit = req),
      |ver AS (SELECT cd.pattern, count(*)::BIGINT AS n_candidates,
      |          sum(CASE WHEN contains(d.t, lower(cd.pattern))
      |              THEN 1 ELSE 0 END)::BIGINT AS n_matches
      |        FROM cd JOIN d USING (doc_id) GROUP BY 1)
      |SELECT p.pattern, coalesce(n_candidates, 0)::BIGINT AS n_candidates,
      |       coalesce(n_matches, 0)::BIGINT AS n_matches
      |FROM pats p LEFT JOIN ver USING (pattern)""".stripMargin

  // ---------------------------------------------------------------- q132
  /** Survivorship (golden records): q120's entity-resolution pairs
    * closed into clusters ([[graft.operators.ConnectedComponents]]) and
    * merged into ONE canonical record per entity by deterministic field
    * rules — golden id = min member id, golden name = the longest
    * normalized name with a lexicographic-min tie-break (picks the
    * clean spelling over the corrupted clone), balance carried in exact
    * integer cents from the blocking key. This is the step that makes
    * ER actionable: pair lists don't deduplicate a table, golden
    * records do. */
  def q132Survivorship(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ConnectedComponents
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
    val keep = u.groupBy(col("blk")).agg(count(lit(1)).as("f"))
      .filter(col("f") <= 100).select(col("blk"))
    val b = u.join(keep, "blk").localCheckpoint()
    val pairs = b.as("x").join(b.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .filter(levenshtein(col("x.nm"), col("y.nm")) <= 2)
      .select(col("x.id").as("src"), col("y.id").as("dst"))
    val comp = ConnectedComponents.components(pairs,
      driverMaxEdges = 1L << 20) // bounded planted-pair input: fast path
    val members = b.join(comp.select(col("id"), col("component")), "id")
    import org.apache.spark.sql.expressions.Window
    val ranked = members.withColumn("rk", row_number().over(
      Window.partitionBy(col("component"))
        .orderBy(length(col("nm")).desc, col("nm").asc)))
    ranked.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("golden_id"),
        max(when(col("rk") === 1, col("nm"))).as("golden_name"),
        min(split(col("blk"), "\\|").getItem(0).cast("long"))
          .as("balance_cents"))
      .select(col("component"), col("n_members"), col("golden_id"),
        col("golden_name"), col("balance_cents"))
  }
  val q132Sql: String =
    """WITH RECURSIVE c AS (SELECT c_custkey, c_name,
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
      |bl AS (SELECT u.* FROM u JOIN keep USING (blk)),
      |pr AS (SELECT a.id AS s, b.id AS d
      |       FROM bl a JOIN bl b ON a.blk = b.blk AND a.id < b.id
      |       WHERE levenshtein(a.nm, b.nm) <= 2),
      |ed AS (SELECT s, d FROM pr UNION SELECT d, s FROM pr),
      |reach(id, comp) AS (
      |  SELECT s, s FROM ed
      |  UNION
      |  SELECT ed.d, r.comp FROM reach r JOIN ed ON ed.s = r.id),
      |cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
      |mem AS (SELECT bl.*, cc.component FROM bl JOIN cc ON bl.id = cc.id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY component
      |         ORDER BY length(nm) DESC, nm ASC) AS rk FROM mem)
      |SELECT component, count(*)::BIGINT AS n_members,
      |       min(id) AS golden_id,
      |       max(CASE WHEN rk = 1 THEN nm END) AS golden_name,
      |       min(string_split(blk, '|')[1]::BIGINT) AS balance_cents
      |FROM rk GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q133
  /** Shuffle-key skew advisory ([[graft.operators.Skew.keyProfile]]):
    * for each candidate key, the exact group-size distribution — rows,
    * keys, heaviest key's share, exact p99 group size vs mean — and a
    * salt recommendation. This is the PLANNING table behind
    * `dedup_strategy=auto`: all statistics aggregate over the
    * #keys-row group table (one pruned two-column scan + two hash
    * aggregates per key), never the data. */
  def q133SkewAdvisory(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Skew
    Skew.keyProfile(Tables.events(s, dir), Seq("user_id", "event_type"),
        hotShare = 0.01)
      .unionByName(Skew.keyProfile(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_partkey"), hotShare = 0.01))
  }
  val q133Sql: String = {
    def one(table: String, k: String): String =
      s"""SELECT '$k' AS key_col, sum(c)::BIGINT AS n_rows,
         |       count(*)::BIGINT AS n_keys, max(c)::BIGINT AS max_group,
         |       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS max_share,
         |       round(quantile_cont(c::DOUBLE, 0.99), 2) AS p99_group,
         |       round(sum(c)::DOUBLE / count(*)::DOUBLE, 2) AS mean_group,
         |       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) > 0.01
         |         AS advise_salt
         |FROM (SELECT $k, count(*)::BIGINT AS c FROM $table GROUP BY 1)"""
        .stripMargin
    Seq(one("events", "user_id"), one("events", "event_type"),
      one("lineitem", "l_orderkey"), one("lineitem", "l_partkey"))
      .mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- q134
  /** Label-propagation communities over the co-purchase graph
    * ([[Graphs.labelPropagation]], 2 synchronous min-tie rounds —
    * deterministic where async LPA is order-dependent): the top-20
    * communities by size. Per round one adjacency⋈labels equi-join +
    * one count aggregate + one max_by argmax, label vector
    * localCheckpointed (the PageRank iteration discipline); the oracle
    * unrolls BOTH rounds value-for-value. */
  def q134Communities(s: SparkSession, dir: String): DataFrame =
    Graphs.labelPropagation(coPurchase(s, dir), rounds = 2)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label").asc)
      .limit(20)
  val q134Sql: String =
    s"""WITH $coPurchaseSqlCte,
       |adj AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT DISTINCT v, v AS label FROM adj),
       |c1 AS (SELECT adj.v, l.label, count(*) AS cnt
       |       FROM adj JOIN l0 l ON adj.nbr = l.v GROUP BY 1, 2),
       |l1 AS (SELECT v, label FROM (SELECT v, label,
       |         row_number() OVER (PARTITION BY v
       |           ORDER BY cnt DESC, label ASC) AS rk FROM c1)
       |       WHERE rk = 1),
       |c2 AS (SELECT adj.v, l.label, count(*) AS cnt
       |       FROM adj JOIN l1 l ON adj.nbr = l.v GROUP BY 1, 2),
       |l2 AS (SELECT v, label FROM (SELECT v, label,
       |         row_number() OVER (PARTITION BY v
       |           ORDER BY cnt DESC, label ASC) AS rk FROM c2)
       |       WHERE rk = 1)
       |SELECT label, count(*)::BIGINT AS n_members FROM l2
       |GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Half-life-decayed activity counters per event type (half-life 7
    * days against the corpus's last day): recency-weighted volume and
    * value — the freshness-aware ranking signal plain totals can't
    * give. Events first collapse to per-(type, age-day) INTEGER
    * partials (counts + micro-unit value sums — order-independent at
    * any partition count; the q122 rollup grain, so the counter table
    * is also incrementally maintainable); the decay weights then apply
    * in ONE age-ordered fold over the ≤31-row bucket frame per type
    * (the q57 positional-fold discipline — never a float sum over the
    * data). */
  def q135DecayedCounters(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("ts_ms div 86400000").as("day"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val buckets = ev.crossJoin(broadcast(mx))
      .select(col("event_type"), (col("mxd") - col("day")).cast("int").as("age"),
        col("vm"))
      .groupBy(col("event_type"), col("age"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("vms"))
    buckets.groupBy(col("event_type"))
      .agg(aggregate(array_sort(collect_list(struct(col("age"), col("n"),
          col("vms")))), lit(0.0d),
          (acc, x) => acc + x.getField("n").cast("double") *
            pow(lit(0.5d), x.getField("age").cast("double") / 7.0d))
          .as("de"),
        aggregate(array_sort(collect_list(struct(col("age"), col("n"),
          col("vms")))), lit(0.0d),
          (acc, x) => acc + (x.getField("vms").cast("double") / 1000000.0d) *
            pow(lit(0.5d), x.getField("age").cast("double") / 7.0d))
          .as("dv"))
      .select(col("event_type"), round(col("de"), 4).as("decayed_events"),
        round(col("dv"), 4).as("decayed_value"))
  }
  val q135Sql: String =
    """WITH ev AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |        round("value" * 1000000.0)::BIGINT AS vm FROM events),
      |mx AS (SELECT max(day) AS mxd FROM ev),
      |bk AS (SELECT event_type, (mxd - day)::INT AS age,
      |         count(*)::BIGINT AS n, sum(vm)::BIGINT AS vms
      |       FROM ev, mx GROUP BY 1, 2),
      |ag AS (SELECT event_type,
      |         list(struct_pack(age := age, n := n, vms := vms)
      |              ORDER BY age) AS items
      |       FROM bk GROUP BY 1)
      |SELECT event_type,
      |  round(list_sum(list_transform(items,
      |    x -> x.n::DOUBLE * pow(0.5, x.age::DOUBLE / 7.0))), 4)
      |    AS decayed_events,
      |  round(list_sum(list_transform(items,
      |    x -> (x.vms::DOUBLE / 1000000.0) * pow(0.5, x.age::DOUBLE / 7.0))), 4)
      |    AS decayed_value
      |FROM ag""".stripMargin

  // ---------------------------------------------------------------- q136
  /** Anchor-text aggregation per link-target host
    * ([[graft.functions.Html.anchors]] → [[graft.functions.Url.host]]):
    * the web's human label for each TARGET page, the retrieval/quality
    * signal next to q81's link-graph authority. Per target host: inlink
    * count and the sorted distinct anchor vocabulary. Extraction is one
    * narrow regex projection (two aligned single-pass extractions zip
    * positionally — href i always pairs with its own anchor); the
    * aggregate exchanges (host, anchor) rows, never pages. */
  def q136AnchorText(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Html, Url}
    Tables.documents(s, dir)
      .select(col("doc_id"), QueriesExt.syntheticPage.as("html"))
      .select(explode(Html.anchors(col("html"))).as("a"))
      .select(Url.host(col("a.href")).as("host"), col("a.anchor"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("anchor")).as("n_anchors"),
        array_join(array_sort(collect_set(col("anchor"))), ",")
          .as("anchors"))
  }
  val q136Sql: String = {
    val pat = """(?is)<a[^>]*href="([^"]*)"[^>]*>(.*?)</a>"""
    s"""WITH p AS (
       |  ${QueriesExt.syntheticPageSql}),
       |nh AS (SELECT doc_id,
       |         regexp_replace(html, '(?i)href=''([^'']*)''', 'href="\\1"', 'g')
       |           AS h
       |       FROM p),
       |la AS (SELECT doc_id,
       |         regexp_extract_all(h, '$pat', 1) AS hs,
       |         regexp_extract_all(h, '$pat', 2) AS ts
       |       FROM nh),
       |x AS (SELECT hs[i] AS href,
       |        trim(regexp_replace(regexp_replace(ts[i], '<[^>]*>', ' ', 'g'),
       |          '[ \\t\\n\\r]+', ' ', 'g')) AS anchor
       |      FROM la, unnest(range(1, len(hs) + 1)) AS r(i)),
       |hh AS (SELECT regexp_replace(lower(regexp_extract(href,
       |         '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)), '^www\\.', '')
       |         AS host, anchor
       |       FROM x)
       |SELECT host, count(*)::BIGINT AS n_links,
       |       count(DISTINCT anchor)::BIGINT AS n_anchors,
       |       array_to_string(list_sort(list(DISTINCT anchor)), ',')
       |         AS anchors
       |FROM hh GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q137
  /** IVF index cell-balance report ([[Similarity.ivfCell]] over the
    * q41 centroid model): per-cell occupancy and share, plus the
    * imbalance factor (max/mean) every cell carries — the ops check
    * that decides whether an IVF index needs re-training before it
    * serves (one overfull cell = one straggler probe list at query
    * time, the ANN twin of the q133 shuffle-skew advisory). Assignment
    * is the literal-centroid argmax in the scan projection (zero
    * shuffle); statistics aggregate over the ≤|cells| count frame. */
  def q137IvfBalance(s: SparkSession, dir: String): DataFrame = {
    val centroids = Tables.embeddings(s, dir).filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val counts = Tables.embeddings(s, dir)
      .select(Similarity.ivfCell(col("embedding").cast("array<double>"),
        centroids).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val tot = counts.agg(sum(col("n_vecs")).as("n_total"),
      count(lit(1)).as("n_cells"), max(col("n_vecs")).as("mx"))
    counts.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n_total").cast("double"), 6)
          .as("share"),
        round(col("mx").cast("double") * col("n_cells").cast("double") /
          col("n_total").cast("double"), 4).as("imbalance"))
  }
  val q137Sql: String = {
    val cos = QueriesExt.cosSql("e.v", "c.cv")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
       |a0 AS (SELECT e.vec_id, c.cid, $cos AS sim FROM e, cent c),
       |assign AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id
       |             ORDER BY sim DESC, cid) AS rn
       |    FROM a0) WHERE rn = 1),
       |cc AS (SELECT cell, count(*)::BIGINT AS n_vecs FROM assign GROUP BY 1),
       |tot AS (SELECT sum(n_vecs)::BIGINT AS n_total,
       |          count(*)::BIGINT AS n_cells, max(n_vecs)::BIGINT AS mx
       |        FROM cc)
       |SELECT cell, n_vecs,
       |       round(n_vecs::DOUBLE / n_total::DOUBLE, 6) AS share,
       |       round(mx::DOUBLE * n_cells::DOUBLE / n_total::DOUBLE, 4)
       |         AS imbalance
       |FROM cc, tot""".stripMargin
  }

  // ---------------------------------------------------------------- q138
  /** Top principal direction of the embedding cloud by power iteration
    * ([[Similarity.topPrincipalComponent]], 2 iterations) — the
    * anisotropy diagnostic run before trusting cosine retrieval: v₀ is
    * the exact literal 1/√64, each iteration is one corpus pass with
    * exact micro-unit per-dim sums (order-independent partials, the
    * q70 k-means discipline), the 64-row model crosses the driver like
    * a centroid row. The oracle unrolls BOTH iterations — dots,
    * integer sums, the dim-ordered norm fold, IEEE sqrt/÷ —
    * value-for-value. */
  def q138TopComponent(s: SparkSession, dir: String): DataFrame =
    Similarity.topPrincipalComponent(Tables.embeddings(s, dir), iters = 2)
  val q138Sql: String =
    """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      |ds AS (SELECT unnest(range(1, 65))::INT AS i),
      |d1 AS (SELECT v,
      |         list_sum(list_transform(v, x -> x * 0.125)) AS dt
      |       FROM e),
      |t1 AS (SELECT ds.i AS dim,
      |         round(d1.v[ds.i] * d1.dt * 1000000)::BIGINT AS t
      |       FROM d1, ds),
      |w1 AS (SELECT dim, sum(t)::DOUBLE AS s FROM t1 GROUP BY 1),
      |lw1 AS (SELECT list(s / 1000000.0 ORDER BY dim) AS lw FROM w1),
      |n1 AS (SELECT sqrt(list_sum(list_transform(lw, x -> x * x))) AS nrm
      |       FROM lw1),
      |v1 AS (SELECT list_transform(lw, x -> x / nrm) AS lv FROM lw1, n1),
      |d2 AS (SELECT e.v AS v,
      |         list_sum(list_transform(list_zip(e.v, v1.lv),
      |           p -> p[1] * p[2])) AS dt
      |       FROM e, v1),
      |t2 AS (SELECT ds.i AS dim,
      |         round(d2.v[ds.i] * d2.dt * 1000000)::BIGINT AS t
      |       FROM d2, ds),
      |w2 AS (SELECT dim, sum(t)::DOUBLE AS s FROM t2 GROUP BY 1),
      |lw2 AS (SELECT list(s / 1000000.0 ORDER BY dim) AS lw FROM w2),
      |n2 AS (SELECT sqrt(list_sum(list_transform(lw, x -> x * x))) AS nrm
      |       FROM lw2)
      |SELECT dim, round((s / 1000000.0) / nrm, 6) AS component,
      |       round(nrm, 4) AS lam
      |FROM w2, n2""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Dataset content fingerprints — the reproducibility audit: per
    * table, the row count and an ORDER-INDEPENDENT 60-bit content
    * checksum (bit_xor of a canonical per-row hash). Two runs, two
    * engines, or a pre/post-migration pair produce the same pair of
    * numbers iff the data is identical — the cheapest "did anything
    * change" gate a 100 TB copy can run (XOR aggregates map-side and
    * commutes, so partitioning never matters). Doubles enter the
    * canonical string as exact integer cents/micro-units, never via
    * engine-specific float formatting. */
  def q139DatasetFingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    def fp(df: DataFrame, name: String, canon: org.apache.spark.sql.Column) =
      df.select(md5Long(canon).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("checksum"))
        .select(lit(name).as("tbl"), col("n_rows"), col("checksum"))
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val ev = Tables.events(s, dir)
    val d = Tables.documents(s, dir)
    fp(c, "customer", concat_ws("|", col("c_custkey"), col("c_name"),
        col("c_nationkey"), round(col("c_acctbal") * 100).cast("long"),
        col("c_mktsegment")))
      .unionByName(fp(o, "orders", concat_ws("|", col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"))))
      .unionByName(fp(ev, "events", concat_ws("|", col("event_id"),
        col("user_id"), col("event_type"), col("ts_ms"),
        round(col("value") * 100).cast("long"))))
      .unionByName(fp(d, "documents", concat_ws("|", col("doc_id"),
        md5(col("text")), col("source"), col("lang"))))
  }
  val q139Sql: String = {
    def h(expr: String) =
      s"('0x' || substring(md5($expr), 1, 15))::BIGINT"
    s"""SELECT 'customer' AS tbl, count(*)::BIGINT AS n_rows,
       |  bit_xor(${h("c_custkey || '|' || c_name || '|' || c_nationkey || '|' || round(c_acctbal * 100)::BIGINT || '|' || c_mktsegment")})
       |    AS checksum
       |FROM customer
       |UNION ALL
       |SELECT 'orders', count(*)::BIGINT,
       |  bit_xor(${h("o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' || round(o_totalprice * 100)::BIGINT")})
       |FROM orders
       |UNION ALL
       |SELECT 'events', count(*)::BIGINT,
       |  bit_xor(${h("event_id || '|' || user_id || '|' || event_type || '|' || epoch_ms(ts) || '|' || round(\"value\" * 100)::BIGINT")})
       |FROM events
       |UNION ALL
       |SELECT 'documents', count(*)::BIGINT,
       |  bit_xor(${h("doc_id || '|' || md5(text) || '|' || source || '|' || lang")})
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------------- q140
  /** Per-type linear trend of event value over time (exact OLS): slope,
    * intercept, and correlation from the five classic sufficient
    * statistics — each an EXACT integer sum over (day-index, micro-unit
    * value), so the partials are order-independent at any partition
    * count and the final slope/intercept/r are one defined double
    * chain. The trend detector that tells drift direction where q89/q95
    * flag drift existence. */
  def q140TrendRegression(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("ts_ms div 86400000").as("day"),
      round(col("value") * 1000000.0d, 0).cast("long").as("ym"))
    val d0 = ev.agg(min(col("day")).as("d0"))
    val xy = ev.crossJoin(broadcast(d0))
      .select(col("event_type"), (col("day") - col("d0")).as("x"),
        col("ym"))
    val ssum = xy.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("ym").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("ym")).cast("decimal(38,0)")).as("sxy"),
      sum((col("ym").cast("decimal(38,0)") * col("ym"))).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val syy = col("syy").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    ssum.select(col("event_type"), col("n"),
      round(cov / varx / lit(1000000.0d), 6).as("slope_per_day"),
      round((sy - cov / varx * sx) / n / lit(1000000.0d), 6)
        .as("intercept"),
      round(cov / sqrt(varx) / sqrt(vary), 6).as("r"))
  }
  val q140Sql: String =
    """WITH ev AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |        round("value" * 1000000.0)::BIGINT AS ym FROM events),
      |d0 AS (SELECT min(day) AS d0 FROM ev),
      |xy AS (SELECT event_type, (day - d0)::BIGINT AS x, ym FROM ev, d0),
      |s AS (SELECT event_type, count(*)::BIGINT AS n,
      |        sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx,
      |        sum(ym)::HUGEINT AS sy, sum(x * ym)::HUGEINT AS sxy,
      |        sum(ym::HUGEINT * ym)::HUGEINT AS syy
      |      FROM xy GROUP BY 1)
      |SELECT event_type, n,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |        / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |        / 1000000.0, 6) AS slope_per_day,
      |  round((sy::DOUBLE - (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |          * sx::DOUBLE) / n::DOUBLE / 1000000.0, 6) AS intercept,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |        / sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |        / sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE), 6)
      |    AS r
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Association rules over co-purchase baskets (support ≥ 3): for each
    * qualifying part pair, both directional confidences and the lift —
    * the market-basket statistic that separates "bought together above
    * chance" (lift > 1) from popularity coincidence. Pair supports come
    * from the same bounded per-order self-join as the q124/q130 edge
    * list (counts, not distinct); item supports and the basket total
    * are one aggregate each; the minSupport filter prunes BEFORE the
    * supports join, so the rule frame is the ≥3-support tail, never
    * all pairs. Top-50 by rounded lift, pair tie-break. */
  def q141AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
      .distinct()
    val keep = p.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= 1000).select(col("g"))
    val pb = p.join(keep, "g").localCheckpoint()
    val pairSupp = pb.as("x").join(pb.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= 3)
    val itemSupp = pb.groupBy(col("i")).agg(count(lit(1)).as("supp"))
    val nOrders = pb.select(col("g")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    pairSupp
      .join(itemSupp.select(col("i").as("a"), col("supp").as("supp_a")), "a")
      .join(itemSupp.select(col("i").as("b"), col("supp").as("supp_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("supp_ab"), col("supp_a"),
        col("supp_b"),
        round(col("supp_ab").cast("double") / col("supp_a").cast("double"), 6)
          .as("conf_ab"),
        round(col("supp_ab").cast("double") / col("supp_b").cast("double"), 6)
          .as("conf_ba"),
        round(col("supp_ab").cast("double") * col("n_orders").cast("double") /
          (col("supp_a").cast("double") * col("supp_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc)
      .limit(50)
  }
  val q141Sql: String =
    """WITH p AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |           FROM lineitem),
      |sz AS (SELECT g FROM (SELECT g, count(*) AS s FROM p GROUP BY 1)
      |       WHERE s <= 1000),
      |pb AS (SELECT p.* FROM p JOIN sz USING (g)),
      |ps AS (SELECT x.i AS a, y.i AS b, count(*)::BIGINT AS supp_ab
      |       FROM pb x JOIN pb y ON x.g = y.g AND x.i < y.i
      |       GROUP BY 1, 2 HAVING count(*) >= 3),
      |its AS (SELECT i, count(*)::BIGINT AS supp FROM pb GROUP BY 1),
      |no AS (SELECT count(DISTINCT g)::BIGINT AS n_orders FROM pb)
      |SELECT a, b, supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
      |       round(supp_ab::DOUBLE / sa.supp::DOUBLE, 6) AS conf_ab,
      |       round(supp_ab::DOUBLE / sb.supp::DOUBLE, 6) AS conf_ba,
      |       round(supp_ab::DOUBLE * n_orders::DOUBLE /
      |             (sa.supp::DOUBLE * sb.supp::DOUBLE), 6) AS lift
      |FROM ps JOIN its sa ON ps.a = sa.i JOIN its sb ON ps.b = sb.i, no
      |ORDER BY lift DESC, a ASC, b ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q142
  /** k-core peeling census of the co-purchase graph
    * ([[Graphs.kCorePeel]], k = 120, 3 rounds): how fast the graph
    * collapses onto its dense core when low-degree nodes peel away —
    * the density structure that tells an LPA/clustering run what it is
    * working with. Each round is one degree aggregate + an induced-edge
    * filter over a shrinking checkpointed edge set; the oracle unrolls
    * all three rounds. */
  def q142KCore(s: SparkSession, dir: String): DataFrame =
    Graphs.kCorePeel(coPurchase(s, dir), k = 120, rounds = 3)
  val q142Sql: String = {
    def round(prev: String, out: String): String =
      s"""d$out AS (SELECT v, count(*)::BIGINT AS deg FROM
         |        (SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev)
         |        GROUP BY 1),
         |k$out AS (SELECT v FROM d$out WHERE deg >= 120),
         |$out AS (SELECT e.a, e.b FROM $prev e
         |        JOIN k$out ka ON e.a = ka.v JOIN k$out kb ON e.b = kb.v)"""
        .stripMargin
    s"""WITH $coPurchaseSqlCte,
       |${round("e", "e1")},
       |${round("e1", "e2")},
       |${round("e2", "e3")}
       |SELECT 1 AS round,
       |  (SELECT count(DISTINCT v) FROM
       |     (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1))::BIGINT
       |    AS n_nodes,
       |  (SELECT count(*) FROM e1)::BIGINT AS n_edges
       |UNION ALL SELECT 2,
       |  (SELECT count(DISTINCT v) FROM
       |     (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2))::BIGINT,
       |  (SELECT count(*) FROM e2)::BIGINT
       |UNION ALL SELECT 3,
       |  (SELECT count(DISTINCT v) FROM
       |     (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3))::BIGINT,
       |  (SELECT count(*) FROM e3)::BIGINT""".stripMargin
  }

  // ---------------------------------------------------------------- q143
  /** Inter-arrival time health per event type: exact median and p95 of
    * the gap between consecutive events (ms), plus the mean — the
    * arrival-process statistics that catch a stalling or bursting feed
    * before volume alarms do. One lag window over the type exchange
    * (ordered by ts, event_id tie-break); the exact percentiles follow
    * the qa10 sort-based tier, with qa14's sketch as the documented
    * beyond-scale alternative. */
  def q143InterArrival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("ts_ms"), col("event_id"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.5)"), 2).as("gap_p50_ms"),
        round(expr("percentile(gap, 0.95)"), 2).as("gap_p95_ms"),
        round(sum(col("gap")).cast("double") / count(lit(1)).cast("double"),
          2).as("gap_mean_ms"))
  }
  val q143Sql: String =
    """WITH g AS (SELECT event_type,
      |        epoch_ms(ts) - lag(epoch_ms(ts)) OVER
      |          (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id)
      |          AS gap
      |      FROM events)
      |SELECT event_type, count(*)::BIGINT AS n_gaps,
      |       round(quantile_cont(gap::DOUBLE, 0.5), 2) AS gap_p50_ms,
      |       round(quantile_cont(gap::DOUBLE, 0.95), 2) AS gap_p95_ms,
      |       round(sum(gap)::DOUBLE / count(*)::DOUBLE, 2) AS gap_mean_ms
      |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q144
  /** LSH banding parameter sweep — the tuning table a dedup campaign
    * reads before committing to (bands, rows): ONE MinHash signature
    * build (16 portable hashes over bigram shingles, checkpointed),
    * then for each config b×r ∈ {2×8, 4×4, 8×2, 16×1} the MEASURED
    * candidate-pair count (the cost side, from this corpus) next to the
    * closed-form recall 1−(1−J^r)^b at J = 0.5 and 0.9 (the quality
    * side — computed once in Scala and embedded as the SAME rounded
    * literals in both engines, so no cross-engine pow). More bands ⇒
    * more candidates and higher recall; the table makes the trade
    * explicit. */
  def q144LshTuning(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.DedupFunctions
    // The q14 sample convention: the sweep runs on the 10% tuning sample
    // (the production use — you measure candidate cost on a sample
    // before the corpus campaign; 1-row bands on a full corpus would be
    // the exact blow-up the table is there to warn about).
    val sig = DedupFunctions.minhashSignatures(
      QueriesExt.docsSample(s, dir), "text", "doc_id",
      n = 2, numHashes = 16, portable = true).localCheckpoint()
    val configs = Seq(2, 4, 8, 16)
    configs.map { b =>
      val r = 16 / b
      val banded = sig.select(col("id"),
        posexplode(array(DedupFunctions.bandKeyColumns(col("sig"), b, r,
          portable = true): _*)).as(Seq("band", "bh")))
      val nCand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .agg(count(lit(1)).as("n_candidates"))
      def recall(j: Double): Double =
        BigDecimal(1.0 - math.pow(1.0 - math.pow(j, r), b))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      nCand.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
        col("n_candidates"), lit(recall(0.5)).as("recall_at_j05"),
        lit(recall(0.9)).as("recall_at_j09"))
    }.reduce(_ unionByName _)
  }
  val q144Sql: String = {
    import graft.functions.DedupFunctions
    val coeffs = (1 to 16).map { i =>
      val (a, b) = DedupFunctions.minhashCoeff(i)
      s"($i, $a, $b)"
    }.mkString(", ")
    def recall(j: Double, r: Int, b: Int): String =
      BigDecimal(1.0 - math.pow(1.0 - math.pow(j, r), b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble.toString
    def cfg(b: Int): String = {
      val r = 16 / b
      s"""SELECT $b AS bands, $r AS rows_per_band,
         |  (SELECT count(*) FROM (
         |     SELECT DISTINCT x.doc_id, y.doc_id
         |     FROM (SELECT doc_id, bb,
         |             array_to_string(sig[bb*$r+1 : bb*$r+$r], ',') AS bh
         |           FROM sig, (SELECT unnest(range(0, $b)) AS bb) bands) x
         |     JOIN (SELECT doc_id, bb,
         |             array_to_string(sig[bb*$r+1 : bb*$r+$r], ',') AS bh
         |           FROM sig, (SELECT unnest(range(0, $b)) AS bb) bands) y
         |       ON x.bb = y.bb AND x.bh = y.bh AND x.doc_id < y.doc_id))::BIGINT
         |    AS n_candidates,
         |  ${recall(0.5, r, b)}::DOUBLE AS recall_at_j05,
         |  ${recall(0.9, r, b)}::DOUBLE AS recall_at_j09""".stripMargin
    }
    s"""WITH ${QueriesExt.shingleCteSql},
       |tt AS (SELECT doc_id, sh FROM t WHERE len(sh) > 0),
       |tok AS (SELECT doc_id,
       |          ('0x' || substring(md5(unnest(sh)), 1, 15))::BIGINT
       |            & ${DedupFunctions.MinhashBaseMask} AS h0
       |        FROM tt),
       |mh AS (SELECT doc_id, seed,
       |         min((h0 * a + b) & ${DedupFunctions.MinhashOutMask}) AS hv
       |       FROM tok, (VALUES $coeffs) coeffs(seed, a, b)
       |       GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(hv ORDER BY seed) AS sig
       |        FROM mh GROUP BY 1)
       |${Seq(2, 4, 8, 16).map(cfg).mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  // ---------------------------------------------------------------- q145
  /** Sketch-based join-size estimation — the planner statistic behind
    * broadcast/shuffle/salting decisions, computed WITHOUT running the
    * join: for two key columns, est_rows = est_common_keys ×
    * (rows_a / est_distinct_a) × (rows_b / est_distinct_b) — the
    * uniform-multiplicity model over KMV evidence ([[graft.functions
    * .Sketches]], k = 64): distinct counts and the key overlap come
    * from the k-smallest-hash sketches alone (O(k) rows per side),
    * while row counts are one partial-aggregated scan each. The exact
    * join count is published next to the estimate (the eval-baseline
    * convention) with the honest err_pct — at 100 TB only the sketch
    * tier runs. Two FK joins: lineitem⋈orders (every key common,
    * multiplicity 4) and events⋈customer (keys contained, 10%
    * coverage). */
  def q145JoinSizeEst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    def oneJoin(name: String, dfA: DataFrame, ka: String,
                dfB: DataFrame, kb: String): DataFrame = {
      val a = dfA.select(col(ka).cast("string").as("k"))
      val b = dfB.select(col(kb).cast("string").as("k"))
      val feeds = a.select(lit("a").as("feed"), col("k"))
        .unionByName(b.select(lit("b").as("feed"), col("k")))
      val ov = Sketches.kmvPairOverlap(feeds, "feed", "k", 64)
        .select(col("est_common"))
      val dist = Sketches.kmvDistinct(feeds, "feed", "k", 64)
      val da = dist.filter(col("g") === "a")
        .select(col("kmv_est").as("est_da"))
      val db = dist.filter(col("g") === "b")
        .select(col("kmv_est").as("est_db"))
      val ra = a.agg(count(lit(1)).as("rows_a"))
      val rb = b.agg(count(lit(1)).as("rows_b"))
      val exact = a.join(b, "k").agg(count(lit(1)).as("exact_rows"))
      ra.crossJoin(rb).crossJoin(broadcast(ov)).crossJoin(broadcast(da))
        .crossJoin(broadcast(db)).crossJoin(exact)
        .select(lit(name).as("join_name"), col("exact_rows"),
          floor(col("est_common").cast("double") *
            (col("rows_a").cast("double") / col("est_da").cast("double")) *
            (col("rows_b").cast("double") / col("est_db").cast("double")))
            .cast("long").as("est_rows"))
        .withColumn("err_pct",
          round(abs(col("est_rows") - col("exact_rows")).cast("double") /
            col("exact_rows").cast("double"), 6))
    }
    oneJoin("lineitem_orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(oneJoin("events_customer", Tables.events(s, dir),
        "user_id", Tables.customer(s, dir), "c_custkey"))
  }
  val q145Sql: String = {
    def one(name: String, ta: String, ka: String, tb: String,
            kb: String): String =
      s"""SELECT '$name' AS join_name,
         |  (SELECT count(*) FROM $ta JOIN $tb
         |     ON CAST($ta.$ka AS VARCHAR) = CAST($tb.$kb AS VARCHAR))::BIGINT
         |    AS exact_rows,
         |  (WITH feeds AS (
         |     SELECT 'a' AS feed, CAST($ka AS VARCHAR) AS k FROM $ta
         |     UNION ALL SELECT 'b', CAST($kb AS VARCHAR) FROM $tb),
         |   h AS (SELECT feed,
         |           ('0x' || substring(md5(k), 1, 15))::BIGINT AS h
         |         FROM feeds),
         |   rk AS (SELECT feed, h,
         |            dense_rank() OVER (PARTITION BY feed ORDER BY h) AS rk
         |          FROM h),
         |   sk AS (SELECT DISTINCT feed, h FROM rk WHERE rk <= 64),
         |   ag AS (SELECT feed, count(*)::BIGINT AS n, max(h) AS kth
         |          FROM sk GROUP BY 1),
         |   es AS (SELECT feed,
         |            CASE WHEN n < 64 THEN n
         |                 ELSE floor(63 * 1152921504606846976.0 / kth)::BIGINT
         |            END AS est FROM ag),
         |   mg AS (SELECT h, max(CASE WHEN feed = 'a' THEN 1 ELSE 0 END)
         |            AS in_a,
         |            max(CASE WHEN feed = 'b' THEN 1 ELSE 0 END) AS in_b
         |          FROM sk GROUP BY 1),
         |   un AS (SELECT h, in_a, in_b,
         |            row_number() OVER (ORDER BY h) AS rk FROM mg),
         |   ua AS (SELECT count(*)::BIGINT AS ku, max(h) AS theta,
         |            sum(in_a * in_b)::BIGINT AS common_k
         |          FROM un WHERE rk <= 64),
         |   ue AS (SELECT common_k, ku,
         |            CASE WHEN ku < 64 THEN ku
         |                 ELSE floor(63 * 1152921504606846976.0 / theta)::BIGINT
         |            END AS est_union FROM ua),
         |   oc AS (SELECT floor(common_k::DOUBLE * est_union::DOUBLE /
         |            ku::DOUBLE)::BIGINT AS est_common FROM ue),
         |   rc AS (SELECT
         |            (SELECT count(*) FROM $ta)::BIGINT AS rows_a,
         |            (SELECT count(*) FROM $tb)::BIGINT AS rows_b)
         |   SELECT floor(est_common::DOUBLE
         |       * (rows_a::DOUBLE / (SELECT est FROM es WHERE feed = 'a'))
         |       * (rows_b::DOUBLE / (SELECT est FROM es WHERE feed = 'b'))
         |     )::BIGINT
         |   FROM oc, rc)::BIGINT AS est_rows""".stripMargin
    s"""WITH j AS (
       |${one("lineitem_orders", "lineitem", "l_orderkey", "orders",
        "o_orderkey")}
       |UNION ALL
       |${one("events_customer", "events", "user_id", "customer",
        "c_custkey")})
       |SELECT join_name, exact_rows, est_rows,
       |       round(abs(est_rows - exact_rows)::DOUBLE /
       |             exact_rows::DOUBLE, 6) AS err_pct
       |FROM j""".stripMargin
  }

  // ---------------------------------------------------------------- q146
  /** Near-dup cluster-SIZE distribution — the shape statistic a dedup
    * campaign plans storage savings from (a few giant template clusters
    * vs many pairs): q15's Jaccard pairs close into components
    * ([[graft.operators.ConnectedComponents]]), cluster sizes histogram
    * per size, singletons (never paired) counted from the sample
    * complement. Removable mass = Σ (size−1)·n_clusters is the
    * campaign's yield forecast, published as its own column. */
  def q146ClusterSizes(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.DedupFunctions
    import graft.operators.ConnectedComponents
    val sample = QueriesExt.docsSample(s, dir)
    val pairs = DedupFunctions.ngramJaccardPairs(sample, "text", "doc_id",
      n = 2, threshold = 0.05, cap = DedupFunctions.ShingleCap.Uncapped)
    val comp = ConnectedComponents.components(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      driverMaxEdges = 1L << 20)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("size"))
    val clustered = sizes.agg(sum(col("size")).as("n_clustered"))
    val total = sample.agg(count(lit(1)).as("n_docs"))
    val hist = sizes.groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"))
    val singles = total.crossJoin(broadcast(clustered))
      .select(lit(1L).as("size"),
        (col("n_docs") - coalesce(col("n_clustered"), lit(0L)))
          .as("n_clusters"))
    hist.unionByName(singles)
      .groupBy(col("size")).agg(sum(col("n_clusters")).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        ((col("size") - 1) * col("n_clusters")).as("removable_docs"))
  }
  val q146Sql: String =
    s"""WITH RECURSIVE ${QueriesExt.shingleCteSql.stripPrefix("WITH ")},
       |e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
       |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
       |             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
       |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |p AS (SELECT id_a, id_b FROM j
       |      WHERE shared::DOUBLE / (n_a + n_b - shared) >= 0.05),
       |ed AS (SELECT id_a AS s, id_b AS d FROM p
       |       UNION SELECT id_b, id_a FROM p),
       |reach(id, comp) AS (
       |  SELECT s, s FROM ed
       |  UNION
       |  SELECT ed.d, r.comp FROM reach r JOIN ed ON ed.s = r.id),
       |cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
       |sizes AS (SELECT component, count(*)::BIGINT AS size
       |          FROM cc GROUP BY 1),
       |hist AS (SELECT size, count(*)::BIGINT AS n_clusters
       |         FROM sizes GROUP BY 1),
       |tot AS (SELECT count(*)::BIGINT AS n_docs FROM documents
       |        WHERE doc_id % 10 = 0),
       |clustered AS (SELECT coalesce(sum(size), 0)::BIGINT AS n_clustered
       |              FROM sizes),
       |uni AS (SELECT size, n_clusters FROM hist
       |        UNION ALL
       |        SELECT 1, n_docs - n_clustered FROM tot, clustered)
       |SELECT size, sum(n_clusters)::BIGINT AS n_clusters,
       |       ((size - 1) * sum(n_clusters))::BIGINT AS removable_docs
       |FROM uni GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q147
  /** Day-of-week activity profile per event type: share of events and
    * mean value per weekday, plus the weekend/weekday volume ratio —
    * the seasonality baseline an anomaly monitor (q89/q95) should
    * normalize against before alerting. Pure integer sums over a
    * (type, dow) grid (≤ 7·|types| rows on the exchange). */
  def q147DowProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("event_type"),
      // 1970-01-01 was a Thursday: dow 0 = Monday.
      ((expr("ts_ms div 86400000") + 3) % 7).as("dow"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    ev.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("vms"))
      .withColumn("share", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("event_type")))
          .cast("double"), 6))
      .select(col("event_type"), col("dow"), col("n"), col("share"),
        round(col("vms").cast("double") / col("n").cast("double") /
          1000000.0d, 4).as("mean_value"))
  }
  val q147Sql: String =
    """WITH ev AS (SELECT event_type,
      |        (epoch_ms(ts) // 86400000 + 3) % 7 AS dow,
      |        round("value" * 1000000.0)::BIGINT AS vm FROM events),
      |g AS (SELECT event_type, dow, count(*)::BIGINT AS n,
      |        sum(vm)::BIGINT AS vms
      |      FROM ev GROUP BY 1, 2)
      |SELECT event_type, dow, n,
      |       round(n::DOUBLE / (sum(n) OVER (PARTITION BY event_type))::DOUBLE,
      |             6) AS share,
      |       round(vms::DOUBLE / n::DOUBLE / 1000000.0, 4) AS mean_value
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q148
  /** Degree-distribution power-law check of the co-purchase graph: the
    * log₂-binned degree histogram and the log-log OLS slope over the
    * bin midpoints — near-regular graphs (this one) show a steep
    * concentrated profile, scale-free graphs a heavy straight tail;
    * the number every graph-algorithm cost model (q124's orientation,
    * q130's valves) implicitly depends on. Composes the q125 log-bin
    * kernel with the q140 sufficient-statistic OLS, both over the
    * ≤64-row bin frame. */
  def q148DegreeDistribution(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchase(s, dir)
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val bins = deg.withColumn("b", (length(bin(col("deg"))) - 1).cast("int"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_nodes"))
    // log-log OLS over bins: x = b (log2 lower bound), y = ln(n_nodes).
    // The sufficient statistics fold left-to-right over the b-sorted
    // ≤64-row bin frame (b is unique) — the OLS covariance cancellation
    // amplifies partition-order double-sum jitter into the 4th rounded
    // digit (the q223 r14 flake class); same q135/anovaF fold idiom.
    def fold(f: Column => Column): Column =
      aggregate(array_sort(collect_list(struct(col("b"), col("n_nodes")))),
        lit(0.0d), (acc, p) => acc + f(p))
    def px(p: Column): Column = p.getField("b").cast("double")
    def py(p: Column): Column = log(p.getField("n_nodes").cast("double"))
    val ssum = bins.agg(count(lit(1)).as("n"),
      fold(p => px(p)).as("sx"),
      fold(p => px(p) * px(p)).as("sxx"),
      fold(p => py(p)).as("sy"),
      fold(p => px(p) * py(p)).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    bins.crossJoin(broadcast(ssum.select(round(slope, 4).as("loglog_slope"))))
      .select(col("b"), col("n_nodes"), col("loglog_slope"))
  }
  val q148Sql: String =
    s"""WITH $coPurchaseSqlCte,
       |d AS (SELECT v, count(*)::BIGINT AS deg FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |bins AS (SELECT (length(bin(deg)) - 1)::INT AS b,
       |           count(*)::BIGINT AS n_nodes
       |         FROM d GROUP BY 1),
       |ag AS (SELECT list_sort(list(struct_pack(b := b, nn := n_nodes)))
       |         AS a FROM bins),
       |ss AS (SELECT len(a)::BIGINT AS n,
       |         list_sum(list_transform(a, p -> p.b::DOUBLE)) AS sx,
       |         list_sum(list_transform(a,
       |           p -> p.b::DOUBLE * p.b::DOUBLE)) AS sxx,
       |         list_sum(list_transform(a, p -> ln(p.nn::DOUBLE))) AS sy,
       |         list_sum(list_transform(a,
       |           p -> p.b::DOUBLE * ln(p.nn::DOUBLE))) AS sxy
       |       FROM ag),
       |sl AS (SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
       |         AS loglog_slope FROM ss)
       |SELECT b, n_nodes, loglog_slope FROM bins, sl""".stripMargin

  // ---------------------------------------------------------------- q149
  /** Corpus-mixture budget allocation by exact integer water-filling
    * ([[graft.functions.Mixture.waterfillAllocate]]): distribute a
    * 60%-of-corpus document budget across sources with equal target
    * shares, capped by availability — level t = the largest integer
    * with Σ min(avail, t) ≤ budget, leftovers one each in source-name
    * order among unsaturated sources. The fair-mixture step between
    * measuring availability (q64) and sampling (q116/q47); every rule
    * is integer and named, the window chain runs over the SOURCE frame
    * only. */
  def q149Waterfill(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val budget = (d.count() * 6L) / 10L
    graft.functions.Mixture.waterfillAllocate(
      d.groupBy(col("source")).agg(count(lit(1)).as("avail")),
      "source", "avail", budget)
      .select(col("g").as("source"), col("avail"), col("alloc"))
  }
  val q149Sql: String =
    """WITH av AS (SELECT source AS g, count(*)::BIGINT AS av
      |            FROM documents GROUP BY 1),
      |b AS (SELECT (count(*) * 6) // 10 AS budget FROM documents),
      |idx AS (SELECT g, av,
      |          row_number() OVER (ORDER BY av ASC, g ASC) AS i,
      |          coalesce(sum(av) OVER (ORDER BY av ASC, g ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |            AS cumprev,
      |          count(*) OVER () AS n_total
      |        FROM av),
      |cand AS (SELECT *,
      |           ((SELECT budget FROM b) - cumprev) // (n_total - i + 1)
      |             AS t
      |         FROM idx),
      |lv AS (SELECT coalesce(min_by(t, i), 9223372036854775807) AS t
      |       FROM cand WHERE t < av AND t >= 0),
      |ld AS (SELECT cand.g, cand.av, least(cand.av, lv.t) AS base_alloc,
      |              cand.av > lv.t AS unsat
      |       FROM cand, lv),
      |us AS (SELECT sum(base_alloc)::BIGINT AS used FROM ld),
      |fin AS (SELECT ld.*,
      |          (SELECT budget FROM b) - us.used AS rem,
      |          row_number() OVER (PARTITION BY unsat ORDER BY g ASC)
      |            AS extra_rank
      |        FROM ld, us)
      |SELECT g AS source, av AS avail,
      |       (base_alloc + CASE WHEN unsat AND extra_rank <= rem
      |                          THEN 1 ELSE 0 END)::BIGINT AS alloc
      |FROM fin""".stripMargin

  // ---------------------------------------------------------------- q150
  /** Quantization reconstruction-error report — the accuracy side of
    * the compression tiers' storage story (SQ8 = 4× smaller, PQ = 64×):
    * per tier, the mean and max squared-L2 error between each vector
    * and its DEQUANTIZED self, the number that says which index tier is
    * safe for which recall target (q63/q94 measure retrieval effects;
    * this measures the cause). Both reconstructions are narrow scan
    * projections over plan-literal models; per-row errors integerize to
    * micro-units (the q64 discipline) so means are exact at any
    * partition count. */
  def q150QuantizationError(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExpressions
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (mins, maxs) = Similarity.sqMinMax(
      Tables.embeddings(s, dir), 64)
    val mnLit = array(mins.map(lit): _*)
    val mxLit = array(maxs.map(lit): _*)
    val sqErrCol = aggregate(
      transform(col("v"), (x, i) => {
        val mn = element_at(mnLit, i + 1)
        val mx = element_at(mxLit, i + 1)
        val code = when(mx === mn, lit(0)).otherwise(
          least(greatest(round(((x - mn) / (mx - mn)) * lit(255.0), 0),
            lit(0.0)), lit(255.0)).cast("int"))
        val dq = mn + ((code.cast("double") * (mx - mn)) / lit(255.0))
        (x - dq) * (x - dq)
      }), lit(0.0d), (a, x) => a + x)
    val cb = QueriesExt.pqCodebook(s, dir)
    val cbLits = cb.map(m =>
      array(m.map(cv => array(cv.map(lit): _*)): _*))
    val codes = Similarity.pqCodes(col("v"), cb)
    val pqErrCol = (0 until 4).map { m =>
      VectorExpressions.vecL2Sq(slice(col("v"), m * 16 + 1, 16),
        element_at(cbLits(m), element_at(codes, m + 1) + 1))
    }.reduceLeft(_ + _)
    val errs = e.select(
      round(sqErrCol * lit(1000000.0d), 0).cast("long").as("sq_vm"),
      round(pqErrCol * lit(1000000.0d), 0).cast("long").as("pq_vm"))
    val agged = errs.agg(count(lit(1)).as("n"),
      sum(col("sq_vm")).as("sq_sum"), max(col("sq_vm")).as("sq_max"),
      sum(col("pq_vm")).as("pq_sum"), max(col("pq_vm")).as("pq_max"))
    agged.select(lit("sq8").as("tier"),
        round(col("sq_sum").cast("double") / col("n").cast("double") /
          1000000.0d, 6).as("mean_l2sq_err"),
        round(col("sq_max").cast("double") / 1000000.0d, 6)
          .as("max_l2sq_err"))
      .unionByName(agged.select(lit("pq4x16").as("tier"),
        round(col("pq_sum").cast("double") / col("n").cast("double") /
          1000000.0d, 6).as("mean_l2sq_err"),
        round(col("pq_max").cast("double") / 1000000.0d, 6)
          .as("max_l2sq_err")))
  }
  val q150Sql: String = {
    val l2 = QueriesExt.l2SqlOf("sub.s", "cb.cv")
    s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |ds AS (SELECT unnest(range(1, 65)) AS i),
       |mm AS (SELECT i, min(v[i])::DOUBLE AS mn, max(v[i])::DOUBLE AS mx
       |       FROM e, ds GROUP BY 1),
       |sqt AS (SELECT e.vec_id, mm.i,
       |          (v[mm.i]::DOUBLE -
       |           (mm.mn + ((CASE WHEN mm.mx = mm.mn THEN 0
       |              ELSE least(greatest(round(((v[mm.i]::DOUBLE - mm.mn)
       |                / (mm.mx - mm.mn)) * 255.0), 0), 255)::INT END)
       |             * (mm.mx - mm.mn)) / 255.0)) AS t
       |        FROM e, mm),
       |sqe AS (SELECT vec_id,
       |          round(list_sum(list(t * t ORDER BY i)) * 1000000)::BIGINT
       |            AS sq_vm
       |        FROM sqt GROUP BY 1),
       |ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
       |sub AS (SELECT vec_id, m, v[m*16+1 : m*16+16] AS s FROM ed, ms),
       |cb AS (SELECT m, vec_id::INT AS k, s AS cv FROM sub
       |       WHERE vec_id < 16),
       |dd AS (SELECT sub.vec_id, sub.m, cb.k, round($l2, 6) AS d,
       |              $l2 AS raw
       |       FROM sub JOIN cb USING (m)),
       |enc AS (SELECT vec_id, m, raw FROM (
       |    SELECT vec_id, m, raw,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |             ORDER BY d, k) AS rn
       |    FROM dd) WHERE rn = 1),
       |pqe AS (SELECT vec_id,
       |          round(list_sum(list(raw ORDER BY m)) * 1000000)::BIGINT
       |            AS pq_vm
       |        FROM enc GROUP BY 1),
       |ag AS (SELECT count(*)::BIGINT AS n,
       |         sum(sq_vm)::HUGEINT AS sq_sum, max(sq_vm)::BIGINT AS sq_max,
       |         sum(pq_vm)::HUGEINT AS pq_sum, max(pq_vm)::BIGINT AS pq_max
       |       FROM sqe JOIN pqe USING (vec_id))
       |SELECT 'sq8' AS tier,
       |  round(sq_sum::DOUBLE / n::DOUBLE / 1000000.0, 6) AS mean_l2sq_err,
       |  round(sq_max::DOUBLE / 1000000.0, 6) AS max_l2sq_err
       |FROM ag
       |UNION ALL SELECT 'pq4x16',
       |  round(pq_sum::DOUBLE / n::DOUBLE / 1000000.0, 6),
       |  round(pq_max::DOUBLE / 1000000.0, 6)
       |FROM ag""".stripMargin
  }

  // ---------------------------------------------------------------- q151
  /** Point-in-time fact enrichment against an SCD2 dimension — the
    * fact-to-history temporal join every warehouse runs ("which
    * browsing context was this purchase made in"): the non-purchase
    * event stream builds the per-user context history
    * ([[graft.operators.Scd2.fromChangelog]]); each purchase joins the
    * version whose [valid_from, valid_to) interval contains its
    * timestamp; revenue rolls up per context. The JOIN-shaped
    * complement of q115's window attribution — the shape you need when
    * facts and dimension history are SEPARATE tables.
    *
    * Scale shape: equi-join on the user key with the interval predicate
    * as a post-filter — versions per key are bounded, so this never
    * degrades to a global range join; purchases before any context
    * survive the left join as 'none'. */
  def q151PitEnrichment(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scd2
    val ev = Tables.events(s, dir)
    val hist = Scd2.fromChangelog(
      ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type")),
      keys = Seq("user_id"), tsCol = "ts_ms", tracked = Seq("event_type"),
      tieBreak = Seq(col("event_id")))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    // Explicit side aliases (the q37 discipline): facts and hist share
    // the events lineage, and dataframe-apply refs across shared
    // lineage trip Spark's "trivially true equals predicate" warning.
    facts.alias("f").join(hist.select(col("user_id"),
        col("event_type").as("context"), col("valid_from"),
        col("valid_to")).alias("h"),
        col("f.user_id") === col("h.user_id") &&
          col("f.ts_ms") >= col("h.valid_from") &&
          (col("h.valid_to").isNull || col("f.ts_ms") < col("h.valid_to")),
        "left")
      .groupBy(coalesce(col("context"), lit("none")).as("context"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("vm")).cast("double") / 1000000.0d, 2)
          .as("revenue"))
  }
  val q151Sql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |        event_type, "value" FROM events),
      |nf AS (SELECT * FROM e WHERE event_type <> 'purchase'),
      |c AS (SELECT user_id, ts_ms, event_id, event_type,
      |        lag(event_type) OVER
      |          (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev,
      |        row_number() OVER
      |          (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
      |      FROM nf),
      |v AS (SELECT user_id, event_type, ts_ms, event_id FROM c
      |      WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      |h AS (SELECT user_id, event_type AS context, ts_ms AS valid_from,
      |        lead(ts_ms) OVER (PARTITION BY user_id
      |          ORDER BY ts_ms, event_id) AS valid_to
      |      FROM v),
      |f AS (SELECT user_id, ts_ms,
      |        round("value" * 1000000.0)::BIGINT AS vm
      |      FROM e WHERE event_type = 'purchase')
      |SELECT coalesce(h.context, 'none') AS context,
      |       count(*)::BIGINT AS n_purchases,
      |       round(sum(vm)::DOUBLE / 1000000.0, 2) AS revenue
      |FROM f LEFT JOIN h ON f.user_id = h.user_id
      |  AND f.ts_ms >= h.valid_from
      |  AND (h.valid_to IS NULL OR f.ts_ms < h.valid_to)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q152
  /** Funnel step-transition latency: for view→click and click→purchase,
    * the exact median/p95 of the time between a user's FIRST occurrence
    * of each step (ordered pairs only — a user who clicked before ever
    * viewing doesn't count as a view→click transition). The timing
    * companion of the q107 ordered-step funnel: conversion RATE says
    * how many fall through, these latencies say where they stall. One
    * grouped conditional-min pass per user, then percentiles over the
    * per-user latency rows. */
  def q152FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_ms"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts_ms"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts_ms")))
          .as("t_purchase"))
    val vc = firsts
      .filter(col("t_view").isNotNull && col("t_click").isNotNull &&
        col("t_click") >= col("t_view"))
      .select(lit("view_to_click").as("step"),
        (col("t_click") - col("t_view")).as("lat"))
    val cp = firsts
      .filter(col("t_click").isNotNull && col("t_purchase").isNotNull &&
        col("t_purchase") >= col("t_click"))
      .select(lit("click_to_purchase").as("step"),
        (col("t_purchase") - col("t_click")).as("lat"))
    vc.unionByName(cp).groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"),
        round(expr("percentile(lat, 0.5)"), 2).as("lat_p50_ms"),
        round(expr("percentile(lat, 0.95)"), 2).as("lat_p95_ms"))
  }
  val q152Sql: String =
    """WITH f AS (SELECT user_id,
      |        min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
      |          AS t_view,
      |        min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)
      |          AS t_click,
      |        min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
      |          AS t_purchase
      |      FROM events GROUP BY 1),
      |l AS (SELECT 'view_to_click' AS step, t_click - t_view AS lat
      |      FROM f WHERE t_view IS NOT NULL AND t_click IS NOT NULL
      |        AND t_click >= t_view
      |      UNION ALL
      |      SELECT 'click_to_purchase', t_purchase - t_click
      |      FROM f WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL
      |        AND t_purchase >= t_click)
      |SELECT step, count(*)::BIGINT AS n_users,
      |       round(quantile_cont(lat::DOUBLE, 0.5), 2) AS lat_p50_ms,
      |       round(quantile_cont(lat::DOUBLE, 0.95), 2) AS lat_p95_ms
      |FROM l GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q153
  /** Weekly-cohort cumulative-revenue (LTV) curve: users cohort by
    * first-activity week; per (cohort, week offset) the purchase
    * revenue accumulates along the offset axis — the curve a payback
    * model reads. Exact integer chain: cohort via one per-user min,
    * revenue in micro-units, the cumulative window over the
    * (cohorts × offsets) grid, never over events (the q108 retention
    * grain carrying money instead of presence). */
  def q153CohortLtv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val firstWeek = ev.groupBy(col("user_id"))
      .agg(min(expr("ts_ms div 604800000")).as("cohort_week"))
    val rev = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ms div 604800000").as("week"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week"))
        .as("week_offset"))
      .agg(sum(col("vm")).as("vms"))
    rev.withColumn("cum_vms", sum(col("vms")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))))
      .select(col("cohort_week"), col("week_offset"),
        round(col("vms").cast("double") / 1000000.0d, 2).as("revenue"),
        round(col("cum_vms").cast("double") / 1000000.0d, 2)
          .as("cum_revenue"))
  }
  val q153Sql: String =
    """WITH fw AS (SELECT user_id,
      |        min(epoch_ms(ts) // 604800000) AS cohort_week
      |      FROM events GROUP BY 1),
      |rv AS (SELECT e.user_id, epoch_ms(ts) // 604800000 AS week,
      |         round("value" * 1000000.0)::BIGINT AS vm
      |       FROM events e WHERE event_type = 'purchase'),
      |g AS (SELECT cohort_week, week - cohort_week AS week_offset,
      |        sum(vm)::BIGINT AS vms
      |      FROM rv JOIN fw USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_week, week_offset,
      |       round(vms::DOUBLE / 1000000.0, 2) AS revenue,
      |       round((sum(vms) OVER (PARTITION BY cohort_week
      |          ORDER BY week_offset))::DOUBLE / 1000000.0, 2)
      |         AS cum_revenue
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Watermark-lateness audit — the statistic that SIZES a streaming
    * watermark instead of guessing it: with event_id as the arrival
    * sequence, an event's lateness is how far the event-time high-water
    * mark had already advanced past it on arrival (running max of ts −
    * own ts). The p99/max of that distribution IS the watermark a
    * `withWatermark` needs to not drop data ([[graft.streaming
    * .StreamAggs]]' windows, [[graft.streaming.CdcPipeline]]'s dedup).
    * The running max over arrival order runs through
    * [[graft.functions.PrefixScan]] (range-bucketed local running max
    * + broadcast bucket-prefix max) — the unpartitioned-window form
    * would put ALL events in one task; everything after aggregates to
    * ONE row. */
  def q154LatenessAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PrefixScan
    PrefixScan.scan(
        Tables.events(s, dir).select(col("event_id"), col("ts_ms")),
        col("event_id"), Seq(col("event_id")),
        Seq(PrefixScan.RunMax(col("ts_ms"), "runmax")))
      .withColumn("late_ms", col("runmax") - col("ts_ms"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_ms") > 0, 1L).otherwise(0L)).as("n_late"),
        round(expr("percentile(late_ms, 0.5)"), 2).as("late_p50_ms"),
        round(expr("percentile(late_ms, 0.99)"), 2).as("late_p99_ms"),
        max(col("late_ms")).as("late_max_ms"))
  }
  val q154Sql: String =
    """WITH l AS (SELECT event_id,
      |        max(epoch_ms(ts)) OVER (ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          - epoch_ms(ts) AS late_ms
      |      FROM events)
      |SELECT count(*)::BIGINT AS n_events,
      |       sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
      |       round(quantile_cont(late_ms::DOUBLE, 0.5), 2) AS late_p50_ms,
      |       round(quantile_cont(late_ms::DOUBLE, 0.99), 2) AS late_p99_ms,
      |       max(late_ms)::BIGINT AS late_max_ms
      |FROM l""".stripMargin

  // ---------------------------------------------------------------- q155
  /** Duplicate-delivery lag profile — the statistic that sizes the
    * dedup-state TTL ([[graft.streaming.StreamAggs]]'
    * dropDuplicatesWithinWatermark / the LWW dedup state): for
    * payload-identical events (the q101 identity: user, type, value),
    * the gap between successive deliveries. State must be held at least
    * p-max of this distribution to catch every re-delivery; holding
    * longer buys nothing. One lag window per payload-key exchange,
    * percentiles over the gap rows. */
  def q155RedeliveryLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"),
        col("vm"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
        col("ts_ms"), col("event_id"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .filter(col("gap").isNotNull)
      .agg(count(lit(1)).as("n_redeliveries"),
        round(expr("percentile(gap, 0.5)"), 2).as("gap_p50_ms"),
        round(expr("percentile(gap, 0.99)"), 2).as("gap_p99_ms"),
        max(col("gap")).as("gap_max_ms"))
  }
  val q155Sql: String =
    """WITH g AS (SELECT epoch_ms(ts) -
      |        lag(epoch_ms(ts)) OVER (
      |          PARTITION BY user_id, event_type,
      |            round("value" * 1000000.0)::BIGINT
      |          ORDER BY epoch_ms(ts), event_id) AS gap
      |      FROM events)
      |SELECT count(*)::BIGINT AS n_redeliveries,
      |       round(quantile_cont(gap::DOUBLE, 0.5), 2) AS gap_p50_ms,
      |       round(quantile_cont(gap::DOUBLE, 0.99), 2) AS gap_p99_ms,
      |       max(gap)::BIGINT AS gap_max_ms
      |FROM g WHERE gap IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- q156
  /** Weekly-seasonality strength per event type: the Pearson
    * autocorrelation of the daily-count series at lag 7 — near 1 means
    * the weekly cycle dominates (and monitors must deseasonalize, q147
    * gives the profile to divide by); near 0 means day-of-week is
    * noise. Exact sufficient statistics over the (type, day) count
    * frame self-joined at day+7 — the q140 OLS correlation chain on a
    * ≤|types|·|days| grid, never over events. */
  def q156SeasonalityStrength(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("n"))
    val paired = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.day") === col("a.day") + 7)
      .select(col("a.event_type").as("event_type"),
        col("a.n").as("x"), col("b.n").as("y"))
    val ssum = paired.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    ssum.select(col("event_type"), col("n").as("n_pairs"),
      round(cov / sqrt(vx) / sqrt(vy), 6).as("acf_lag7"))
  }
  val q156Sql: String =
    """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |        count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type, a.n AS x, b.n AS y
      |      FROM d a JOIN d b ON a.event_type = b.event_type
      |        AND b.day = a.day + 7),
      |s AS (SELECT event_type, count(*)::BIGINT AS n,
      |        sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |        sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
      |        sum(x * y)::BIGINT AS sxy
      |      FROM p GROUP BY 1)
      |SELECT event_type, n AS n_pairs,
      |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |             / sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |             / sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
      |             6) AS acf_lag7
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q157
  /** Conversion rate per acquisition channel with the Wilson 95%
    * interval — the uncertainty-honest way to compare channels (a raw
    * 3/7 beats 290/1000 until the interval says otherwise): channel =
    * the user's FIRST event type, converted = the user ever purchased;
    * per channel p̂ and the Wilson bounds (z = 1.96 literal, one defined
    * double chain both engines replay). One per-user min_by pass + one
    * ≤|channels|-row aggregate. */
  def q157ConversionWilson(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"), struct(col("ts_ms"), col("event_id")))
          .as("channel"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    val g = perUser.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val n = col("n_users").cast("double")
    val p = col("n_conv").cast("double") / n
    val z2 = lit(1.96d * 1.96d)
    val center = (p + z2 / (lit(2.0d) * n)) / (lit(1.0d) + z2 / n)
    val half = (lit(1.96d) *
      sqrt(p * (lit(1.0d) - p) / n + z2 / (lit(4.0d) * n * n))) /
      (lit(1.0d) + z2 / n)
    g.select(col("channel"), col("n_users"), col("n_conv"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }
  val q157Sql: String =
    """WITH r AS (SELECT user_id, event_type,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY epoch_ms(ts), event_id) AS rn
      |      FROM events),
      |ch AS (SELECT user_id, event_type AS channel FROM r WHERE rn = 1),
      |cv AS (SELECT user_id,
      |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |          AS converted
      |      FROM events GROUP BY 1),
      |u AS (SELECT ch.user_id, ch.channel, cv.converted
      |      FROM ch JOIN cv ON ch.user_id = cv.user_id),
      |g AS (SELECT channel, count(*)::BIGINT AS n_users,
      |        sum(converted)::BIGINT AS n_conv
      |      FROM u GROUP BY 1)
      |SELECT channel, n_users, n_conv,
      |  round(n_conv::DOUBLE / n_users::DOUBLE, 6) AS rate,
      |  round(((n_conv::DOUBLE / n_users::DOUBLE)
      |      + (1.96 * 1.96) / (2.0 * n_users::DOUBLE))
      |     / (1.0 + (1.96 * 1.96) / n_users::DOUBLE)
      |   - (1.96 * sqrt((n_conv::DOUBLE / n_users::DOUBLE)
      |        * (1.0 - n_conv::DOUBLE / n_users::DOUBLE) / n_users::DOUBLE
      |        + (1.96 * 1.96) / (4.0 * n_users::DOUBLE * n_users::DOUBLE)))
      |     / (1.0 + (1.96 * 1.96) / n_users::DOUBLE), 6) AS wilson_lo,
      |  round(((n_conv::DOUBLE / n_users::DOUBLE)
      |      + (1.96 * 1.96) / (2.0 * n_users::DOUBLE))
      |     / (1.0 + (1.96 * 1.96) / n_users::DOUBLE)
      |   + (1.96 * sqrt((n_conv::DOUBLE / n_users::DOUBLE)
      |        * (1.0 - n_conv::DOUBLE / n_users::DOUBLE) / n_users::DOUBLE
      |        + (1.96 * 1.96) / (4.0 * n_users::DOUBLE * n_users::DOUBLE)))
      |     / (1.0 + (1.96 * 1.96) / n_users::DOUBLE), 6) AS wilson_hi
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Benford first-digit audit of the value column — the
    * fabricated-data sniff test: observed first-significant-digit
    * shares against Benford's log₁₀(1 + 1/d) expectation, with the
    * chi-square statistic (8 df; > 20.09 rejects at 1%). Digit
    * extraction is integer/string algebra on micro-units (no float
    * formatting); expectations are Scala-computed literals embedded
    * identically in both engines; the chi-square folds over the 9-row
    * digit frame. Synthetic uniform-ish values fail Benford loudly —
    * the point is the MACHINERY, and the verdict column says what the
    * data is. */
  def q158BenfordAudit(s: SparkSession, dir: String): DataFrame = {
    val expected: Seq[(Int, Double)] = (1 to 9).map(d =>
      d -> BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val expLit = map(expected.flatMap { case (d, e) =>
      Seq(lit(d), lit(e)) }: _*)
    val digits = Tables.events(s, dir)
      .select(round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
      .filter(col("vm") > 0)
      .select(substring(col("vm").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("n_total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("n_total").cast("double"), 6)
          .as("observed"),
        element_at(expLit, col("digit")).as("benford"),
        col("n_total"))
      .withColumn("chi2_term",
        (col("n").cast("double") - col("n_total") * col("benford")) *
          (col("n").cast("double") - col("n_total") * col("benford")) /
          (col("n_total") * col("benford")))
      .groupBy().agg(
        sum(col("n")).as("n_values"),
        round(sum(col("chi2_term")), 2).as("chi2"))
      .select(col("n_values"), col("chi2"),
        (col("chi2") > 20.09d).as("rejects_benford"))
  }
  val q158Sql: String = {
    val expCase = (1 to 9).map { d =>
      val e = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      s"WHEN $d THEN $e"
    }.mkString(" ")
    s"""WITH v AS (SELECT round("value" * 1000000.0)::BIGINT AS vm
       |           FROM events),
       |d AS (SELECT substring(vm::VARCHAR, 1, 1)::INT AS digit,
       |        count(*)::BIGINT AS n
       |      FROM v WHERE vm > 0 GROUP BY 1),
       |t AS (SELECT sum(n)::BIGINT AS n_total FROM d),
       |x AS (SELECT digit, n, n_total,
       |        (CASE digit $expCase END)::DOUBLE AS benford
       |      FROM d, t)
       |SELECT sum(n)::BIGINT AS n_values,
       |       round(sum((n::DOUBLE - n_total * benford)
       |                 * (n::DOUBLE - n_total * benford)
       |                 / (n_total * benford)), 2) AS chi2,
       |       round(sum((n::DOUBLE - n_total * benford)
       |                 * (n::DOUBLE - n_total * benford)
       |                 / (n_total * benford)), 2) > 20.09
       |         AS rejects_benford
       |FROM x""".stripMargin
  }

  // ---------------------------------------------------------------- q159
  /** Language×source independence audit: the chi-square statistic over
    * the lang×source contingency grid — "do my feeds differ in language
    * mix, or is language independent of source?" (if independent, one
    * global language filter is fine; if not, per-source thresholds —
    * the q103/q123 per-feed philosophy, decided by a test instead of
    * eyeballing). Expected counts from the marginals; the chi-square
    * folds over the ≤|langs|·|sources| grid, never documents. */
  def q159ContingencyChi2(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val cell = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    val langM = d.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val srcM = d.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val tot = d.agg(count(lit(1)).as("nt"))
    // Every (lang, source) pair, including empty cells — chi-square
    // needs the zeros.
    val grid = langM.crossJoin(srcM).crossJoin(broadcast(tot))
      .join(cell, Seq("lang", "source"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("e", col("nl").cast("double") * col("ns").cast("double") /
        col("nt").cast("double"))
      .withColumn("term", (col("n").cast("double") - col("e")) *
        (col("n").cast("double") - col("e")) / col("e"))
    grid.agg(count(lit(1)).as("n_cells"),
        round(sum(col("term")), 2).as("chi2"),
        max(col("nt")).as("n_docs"))
      .select(col("n_cells"), col("n_docs"), col("chi2"),
        // df = (L-1)(S-1); at 4x19=76 df the 1% critical value ≈ 107.6.
        (col("chi2") > 107.6d).as("dependent"))
  }
  val q159Sql: String =
    """WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
      |           FROM documents GROUP BY 1, 2),
      |lm AS (SELECT lang, count(*)::BIGINT AS nl FROM documents GROUP BY 1),
      |sm AS (SELECT source, count(*)::BIGINT AS ns FROM documents GROUP BY 1),
      |t AS (SELECT count(*)::BIGINT AS nt FROM documents),
      |g AS (SELECT lm.lang, sm.source, coalesce(c.n, 0) AS n,
      |        lm.nl::DOUBLE * sm.ns::DOUBLE / t.nt::DOUBLE AS e, t.nt
      |      FROM lm CROSS JOIN sm CROSS JOIN t
      |      LEFT JOIN c ON c.lang = lm.lang AND c.source = sm.source)
      |SELECT count(*)::BIGINT AS n_cells, max(nt)::BIGINT AS n_docs,
      |       round(sum((n::DOUBLE - e) * (n::DOUBLE - e) / e), 2) AS chi2,
      |       round(sum((n::DOUBLE - e) * (n::DOUBLE - e) / e), 2) > 107.6
      |         AS dependent
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q160
  /** Theil–Sen robust trend per event type — the median of all pairwise
    * slopes of the DAILY value means: one wild day drags an OLS slope
    * (q140) but cannot move the median of 435 pairwise slopes. The
    * pair expansion runs over the ≤|days| daily frame per type (C(30,2)
    * pairs), never events; daily means are exact micro-unit integer
    * divisions first, so the slope set replays bit-for-bit. */
  def q160TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000.0d, 0).cast("long")).as("vms"))
      .withColumn("mean_v", col("vms").cast("double") / col("n"))
    val slopes = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.mean_v") - col("a.mean_v")) /
          (col("b.day") - col("a.day")).cast("double")).as("slope"))
    slopes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)") / 1000000.0d, 6)
          .as("theil_sen_slope_per_day"))
  }
  val q160Sql: String =
    """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |        count(*)::BIGINT AS n,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS vms
      |      FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, day, vms::DOUBLE / n AS mean_v FROM d),
      |p AS (SELECT a.event_type,
      |        (b.mean_v - a.mean_v) / (b.day - a.day)::DOUBLE AS slope
      |      FROM m a JOIN m b ON a.event_type = b.event_type
      |        AND a.day < b.day)
      |SELECT event_type, count(*)::BIGINT AS n_pairs,
      |       round(quantile_cont(slope, 0.5) / 1000000.0, 6)
      |         AS theil_sen_slope_per_day
      |FROM p GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q161
  /** Kaplan–Meier time-to-first-purchase survival curve — the
    * censoring-correct time-to-event statistic (a plain "converted
    * within k days" fraction UNDERCOUNTS late cohorts, whose window
    * ends before k): users enter at their first event day, convert at
    * their first purchase day, and are right-censored at the corpus's
    * last day. Per day offset t: at-risk n_t (entered, not yet
    * converted, not yet censored), conversions d_t, and S(t) =
    * Π(1 − d_k/n_k) via exp∘Σln over the ORDERED ≤|days| offset frame
    * (the q57 fold discipline; round-6 absorbs ln's sub-ulp). Events
    * are touched once for the per-user triple; everything else runs on
    * the offset grid. */
  def q161SurvivalKm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(expr("ts_ms div 86400000")).as("entry"),
        min(when(col("event_type") === "purchase",
          expr("ts_ms div 86400000"))).as("conv"))
    val maxDay = ev.agg(max(expr("ts_ms div 86400000")).as("mxd"))
    val u = perUser.crossJoin(broadcast(maxDay))
      .select((col("conv") - col("entry")).as("conv_off"),
        (col("mxd") - col("entry")).as("cens_off"))
    val offsets = u.select(explode(sequence(lit(0),
        greatest(coalesce(col("conv_off"), col("cens_off")),
          lit(0L)))).as("t"),
        col("conv_off"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_risk"),
        sum(when(col("conv_off") === col("t"), 1L).otherwise(0L))
          .as("d"))
    val w = graft.functions.BoundedWindow.orderBy(col("t"), col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // A total-death offset (d = n_risk) sends the product to exactly 0
    // forever; splitting that case out keeps ln() off zero (an error in
    // some engines) and the zero exact instead of exp(-inf).
    offsets
      .withColumn("lnterm",
        when(col("d") === col("n_risk"), lit(0.0d))
          .otherwise(log(lit(1.0d) - col("d").cast("double") /
            col("n_risk").cast("double"))))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(w))
      .withColumn("surv",
        when(col("dead") === 1L, lit(0.0d))
          .otherwise(exp(sum(col("lnterm")).over(w))))
      .select(col("t").as("day_offset"), col("n_risk"), col("d"),
        round(col("surv"), 6).as("survival"))
  }
  val q161Sql: String =
    """WITH pu AS (SELECT user_id,
      |        min(epoch_ms(ts) // 86400000) AS entry,
      |        min(CASE WHEN event_type = 'purchase'
      |            THEN epoch_ms(ts) // 86400000 END) AS conv
      |      FROM events GROUP BY 1),
      |mx AS (SELECT max(epoch_ms(ts) // 86400000) AS mxd FROM events),
      |u AS (SELECT conv - entry AS conv_off, mxd - entry AS cens_off
      |      FROM pu, mx),
      |o AS (SELECT r.t, u.conv_off
      |      FROM u, unnest(range(0,
      |        greatest(coalesce(conv_off, cens_off), 0) + 1)) AS r(t)),
      |g AS (SELECT t, count(*)::BIGINT AS n_risk,
      |        sum(CASE WHEN conv_off = t THEN 1 ELSE 0 END)::BIGINT AS d
      |      FROM o GROUP BY 1)
      |SELECT t AS day_offset, n_risk, d,
      |       round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      |               OVER w = 1 THEN 0.0
      |             ELSE exp(sum(CASE WHEN d = n_risk THEN 0.0
      |               ELSE ln(1.0 - d::DOUBLE / n_risk::DOUBLE) END)
      |               OVER w) END, 6) AS survival
      |FROM g
      |WINDOW w AS (ORDER BY t
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------- q162
  /** Degree assortativity of the co-purchase graph: the Pearson
    * correlation of endpoint degrees over edges (each undirected edge
    * contributes BOTH orientations, the standard convention) — positive
    * = hubs link hubs (social-like), negative = hubs link leaves
    * (technological); with q148's power-law slope, the two numbers that
    * summarize a graph's shape before running algorithms on it. Exact
    * integer sufficient statistics over the 2|E| orientation rows. */
  def q162Assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchase(s, dir)
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val both = e.select(col("a"), col("b"))
      .unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val ssum = both.agg(count(lit(1)).as("n"),
      sum(col("da")).as("sx"), sum(col("db")).as("sy"),
      sum(col("da") * col("da")).as("sxx"),
      sum(col("db") * col("db")).as("syy"),
      sum(col("da") * col("db")).as("sxy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    ssum.select((col("n") / 2).cast("long").as("n_edges"),
      round(cov / sqrt(vx) / sqrt(vy), 6).as("assortativity"))
  }
  val q162Sql: String =
    s"""WITH $coPurchaseSqlCte,
       |d AS (SELECT v, count(*)::BIGINT AS deg FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |bo AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
       |j AS (SELECT da.deg AS x, db.deg AS y
       |      FROM bo JOIN d da ON bo.a = da.v JOIN d db ON bo.b = db.v),
       |s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
       |        sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
       |        sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
       |      FROM j)
       |SELECT (n / 2)::BIGINT AS n_edges,
       |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
       |             / sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
       |             / sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
       |             6) AS assortativity
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- q163
  /** Session-gap threshold sweep — the q144 tuning-table idea applied
    * to sessionization (q29 picks ONE threshold; this table shows what
    * the choice does): for gap thresholds 5 min / 30 min / 2 h, the
    * session count, sessions per user, and mean events per session —
    * ALL from ONE lag pass (each threshold is a conditional sum over
    * the same gap column, not a re-scan). The knee of this table is
    * where a session definition stops being arbitrary. */
  def q163SessionSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
    val thresholds = Seq(("5min", 300000L), ("30min", 1800000L),
      ("2h", 7200000L))
    val aggs = thresholds.flatMap { case (name, ms) =>
      Seq(sum(when(col("gap").isNull || col("gap") > ms, 1L)
        .otherwise(0L)).as(s"s_$name"))
    }
    val base = gaps.agg(count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))
    val sessions = gaps.agg(aggs.head, aggs.tail: _*)
    val one = base.crossJoin(sessions)
    thresholds.map { case (name, ms) =>
      one.select(lit(name).as("threshold"),
        col(s"s_$name").as("n_sessions"),
        round(col(s"s_$name").cast("double") /
          col("n_users").cast("double"), 4).as("sessions_per_user"),
        round(col("n_events").cast("double") /
          col(s"s_$name").cast("double"), 4).as("events_per_session"))
    }.reduce(_ unionByName _)
  }
  val q163Sql: String = {
    def one(name: String, ms: Long): String =
      s"""SELECT '$name' AS threshold,
         |  sum(CASE WHEN gap IS NULL OR gap > $ms THEN 1 ELSE 0 END)::BIGINT
         |    AS n_sessions,
         |  round(sum(CASE WHEN gap IS NULL OR gap > $ms
         |            THEN 1 ELSE 0 END)::DOUBLE
         |        / count(DISTINCT user_id)::DOUBLE, 4) AS sessions_per_user,
         |  round(count(*)::DOUBLE
         |        / sum(CASE WHEN gap IS NULL OR gap > $ms
         |              THEN 1 ELSE 0 END)::DOUBLE, 4) AS events_per_session
         |FROM g""".stripMargin
    s"""WITH g AS (SELECT user_id,
       |        epoch_ms(ts) - lag(epoch_ms(ts)) OVER
       |          (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
       |          AS gap
       |      FROM events)
       |${Seq(("5min", 300000L), ("30min", 1800000L), ("2h", 7200000L))
        .map { case (n, m) => one(n, m) }.mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  // ---------------------------------------------------------------- q164
  /** Duplicate topology per source — WHERE a feed's duplication lives
    * (the q93 matrix told you WHICH pairs overlap; this says, per
    * source, how much of it duplicates within itself vs mirrors other
    * sources — self-duplication means a crawler bug, cross-duplication
    * means a mirrored feed): with q93's deterministic `mirror`
    * injection (doc_id % 13 copied verbatim), each doc's canonical
    * fingerprint joins the corpus-wide (fp → sources, count) profile —
    * text never shuffles, fingerprints do. */
  def q164DupTopology(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = Tables.documents(s, dir)
    val withMirror = d.select(col("doc_id"), col("source"), col("text"))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit("mirror").as("source"), col("text")))
    val fps = withMirror.select(col("doc_id"), col("source"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val prof = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("source")).as("n_sources"))
    fps.join(prof, "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1 && col("n_sources") === 1, 1L)
          .otherwise(0L)).as("n_intra_dup"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L))
          .as("n_inter_dup"))
      .select(col("source"), col("n_docs"),
        round(col("n_intra_dup").cast("double") /
          col("n_docs").cast("double"), 6).as("intra_dup_frac"),
        round(col("n_inter_dup").cast("double") /
          col("n_docs").cast("double"), 6).as("inter_dup_frac"))
  }
  val q164Sql: String =
    """WITH wm AS (SELECT doc_id, source, text FROM documents
      |            UNION ALL
      |            SELECT doc_id + 1000000, 'mirror', text
      |            FROM documents WHERE doc_id % 13 = 0),
      |fps AS (SELECT doc_id, source,
      |          md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
      |        FROM wm),
      |prof AS (SELECT fp, count(*)::BIGINT AS n_copies,
      |           count(DISTINCT source)::BIGINT AS n_sources
      |         FROM fps GROUP BY 1)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |       round(sum(CASE WHEN n_copies > 1 AND n_sources = 1
      |                 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
      |         AS intra_dup_frac,
      |       round(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)::DOUBLE
      |             / count(*)::DOUBLE, 6) AS inter_dup_frac
      |FROM fps JOIN prof USING (fp)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q165
  /** Daily new-vs-returning active users — the growth dashboard's first
    * row (DAU alone hides whether growth is acquisition or retention):
    * per day, active users, first-seen-today users, returning users,
    * and the returning share. One per-user min joins back to the
    * per-(day, user) activity grain — both partial-agg hash
    * aggregates; the daily frame carries ≤|days| rows out. */
  def q165NewVsReturning(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    ev.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("d0"), 1L).otherwise(0L)).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        round((col("n_active") - col("n_new")).cast("double") /
          col("n_active").cast("double"), 6).as("returning_share"))
  }
  val q165Sql: String =
    """WITH a AS (SELECT DISTINCT user_id,
      |        epoch_ms(ts) // 86400000 AS day FROM events),
      |f AS (SELECT user_id, min(day) AS d0 FROM a GROUP BY 1)
      |SELECT day, count(*)::BIGINT AS n_active,
      |       sum(CASE WHEN day = d0 THEN 1 ELSE 0 END)::BIGINT AS n_new,
      |       (count(*) - sum(CASE WHEN day = d0 THEN 1 ELSE 0 END))::BIGINT
      |         AS n_returning,
      |       round((count(*) - sum(CASE WHEN day = d0 THEN 1 ELSE 0 END))
      |             ::DOUBLE / count(*)::DOUBLE, 6) AS returning_share
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q166
  /** A/B-test minimum-detectable-effect planner per channel — "can this
    * channel even measure a change before we run the experiment": with
    * the channel's current conversion rate p and user count n (q157's
    * grain), the absolute MDE at 80% power / 5% two-sided α under an
    * even split is (z_{α/2} + z_β)·√(2·p(1−p)/(n/2)) — z values are
    * Scala literals embedded identically in both engines, the rest is
    * one defined double chain over the ≤|channels| frame. A channel
    * whose MDE exceeds its own rate cannot detect anything short of
    * doubling — the verdict column says so. */
  def q166MdePlanner(s: SparkSession, dir: String): DataFrame = {
    val z = 1.959964d + 0.841621d // z_{0.025} + z_{0.20}
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"), struct(col("ts_ms"), col("event_id")))
          .as("channel"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    val g = perUser.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val n = col("n_users").cast("double")
    val p = col("n_conv").cast("double") / n
    val mde = lit(z) * sqrt(lit(2.0d) * p * (lit(1.0d) - p) /
      (n / lit(2.0d)))
    g.select(col("channel"), col("n_users"),
      round(p, 6).as("rate"),
      round(mde, 6).as("mde_abs"),
      (round(mde, 6) > round(p, 6)).as("underpowered"))
  }
  val q166Sql: String = {
    val z = 1.959964 + 0.841621
    s"""WITH r AS (SELECT user_id, event_type,
       |        row_number() OVER (PARTITION BY user_id
       |          ORDER BY epoch_ms(ts), event_id) AS rn
       |      FROM events),
       |ch AS (SELECT user_id, event_type AS channel FROM r WHERE rn = 1),
       |cv AS (SELECT user_id,
       |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |          AS converted
       |      FROM events GROUP BY 1),
       |g AS (SELECT ch.channel, count(*)::BIGINT AS n_users,
       |        sum(cv.converted)::BIGINT AS n_conv
       |      FROM ch JOIN cv ON ch.user_id = cv.user_id GROUP BY 1)
       |SELECT channel, n_users,
       |  round(n_conv::DOUBLE / n_users::DOUBLE, 6) AS rate,
       |  round($z * sqrt(2.0 * (n_conv::DOUBLE / n_users::DOUBLE)
       |        * (1.0 - n_conv::DOUBLE / n_users::DOUBLE)
       |        / (n_users::DOUBLE / 2.0)), 6) AS mde_abs,
       |  round($z * sqrt(2.0 * (n_conv::DOUBLE / n_users::DOUBLE)
       |        * (1.0 - n_conv::DOUBLE / n_users::DOUBLE)
       |        / (n_users::DOUBLE / 2.0)), 6)
       |    > round(n_conv::DOUBLE / n_users::DOUBLE, 6) AS underpowered
       |FROM g""".stripMargin
  }

  // ---------------------------------------------------------------- q167
  /** Two-sample Kolmogorov–Smirnov statistic between the first and
    * second half of the period's value distributions — the
    * binning-free complement of PSI (q95 commits to reference bins; KS
    * asks "did the distribution move AT ALL" with no bins to choose):
    * D = max |ECDF₁ − ECDF₂| over the pooled sorted values, evaluated
    * at distinct values with ties fully counted — the shared
    * [[graft.functions.Ks]] kernel (PrefixScan running counts, no
    * single-partition window; q199/q260 run the same kernel); the
    * critical value c(α)·√((n₁+n₂)/(n₁n₂)) at α = 0.01 uses the 1.628
    * literal embedded in both engines. */
  def q167KsTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val mid = ev.agg(((min(col("ts_ms")) + max(col("ts_ms"))) / 2)
      .cast("long").as("mid"))
    val perValue = ev.crossJoin(broadcast(mid))
      .select(round(col("value") * 1000000.0d, 0).cast("long").as("vm"),
        when(col("ts_ms") < col("mid"), 1L).otherwise(0L).as("s1"),
        when(col("ts_ms") >= col("mid"), 1L).otherwise(0L).as("s2"))
      .groupBy(col("vm"))
      .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
    val crit = round(lit(1.628d) *
      sqrt((col("n1") + col("n2")).cast("double") /
        (col("n1") * col("n2")).cast("double")), 6)
    val ksd = round(col("d_stat"), 6)
    graft.functions.Ks.twoSampleD(perValue, col("vm"))
      .select(col("n1"), col("n2"), ksd.as("ks_d"), crit.as("crit_01"),
        (ksd > crit).as("shifted"))
  }
  val q167Sql: String =
    """WITH mid AS (SELECT ((min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2)
      |          AS mid FROM events),
      |s AS (SELECT round("value" * 1000000.0)::BIGINT AS vm,
      |        CASE WHEN epoch_ms(ts) < mid THEN 1 ELSE 0 END AS s1,
      |        CASE WHEN epoch_ms(ts) >= mid THEN 1 ELSE 0 END AS s2
      |      FROM events, mid),
      |pv AS (SELECT vm, sum(s1)::BIGINT AS c1, sum(s2)::BIGINT AS c2
      |       FROM s GROUP BY 1),
      |cdf AS (SELECT vm,
      |          (sum(c1) OVER (ORDER BY vm
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
      |            / (sum(c1) OVER ())::DOUBLE AS f1,
      |          (sum(c2) OVER (ORDER BY vm
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
      |            / (sum(c2) OVER ())::DOUBLE AS f2,
      |          sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
      |        FROM pv)
      |SELECT max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
      |       round(max(abs(f1 - f2)), 6) AS ks_d,
      |       round(1.628 * sqrt((max(n1) + max(n2))::DOUBLE
      |             / (max(n1) * max(n2))::DOUBLE), 6) AS crit_01,
      |       round(max(abs(f1 - f2)), 6)
      |         > round(1.628 * sqrt((max(n1) + max(n2))::DOUBLE
      |               / (max(n1) * max(n2))::DOUBLE), 6) AS shifted
      |FROM cdf""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Spend-concentration (Gini) per event type — the whale-detection
    * number: how unequally a type's value mass distributes over users
    * (0 = everyone equal, →1 = a few users carry everything; revenue
    * concentration above ~0.6 means per-user rate limits / sampling
    * caps change aggregate behavior). Exact: per-user micro-unit sums,
    * ranked per type with user-id tie-break, Gini =
    * (2·Σ rank·x)/(n·Σx) − (n+1)/n over integer sums. The per-type rank
    * runs through [[graft.functions.PrefixScan.scanGrouped]]: a plain
    * `partitionBy(event_type)` window is five single-task sorts of the
    * ENTIRE user base at 100 TB (group count bounds the partition
    * COUNT, not the partition SIZE) — the grouped two-pass form splits
    * each type into quantile buckets so no task ever holds a type's
    * whole user frame. */
  def q168SpendGini(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PrefixScan
    val perUser = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("x"))
    val ranked = PrefixScan.scanGrouped(perUser, "event_type", col("x"),
      Seq(col("x").asc, col("user_id").asc),
      Seq(PrefixScan.RowNumber("rk")), cache = true)
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("rk") * col("x")).cast("decimal(38,0)")).as("srx"))
      .select(col("event_type"), col("n_users"),
        round(lit(2.0d) * col("srx").cast("double") /
          (col("n_users").cast("double") * col("sx").cast("double")) -
          (col("n_users") + 1).cast("double") /
            col("n_users").cast("double"), 6).as("gini"))
  }
  val q168Sql: String =
    """WITH pu AS (SELECT event_type, user_id,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS x
      |      FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, x,
      |        row_number() OVER (PARTITION BY event_type
      |          ORDER BY x ASC, user_id ASC) AS rk
      |      FROM pu),
      |g AS (SELECT event_type, count(*)::BIGINT AS n_users,
      |        sum(x)::HUGEINT AS sx, sum(rk * x)::HUGEINT AS srx
      |      FROM r GROUP BY 1)
      |SELECT event_type, n_users,
      |       round(2.0 * srx::DOUBLE / (n_users::DOUBLE * sx::DOUBLE)
      |             - (n_users + 1)::DOUBLE / n_users::DOUBLE, 6) AS gini
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q169
  /** Peak-load profile per event type: the busiest hour-of-day, its
    * share, and the peak-to-average ratio — the number capacity
    * planning multiplies provisioned throughput by (a PAR of 3 means
    * mean-rate sizing drops a third of peak traffic). Integer counts
    * over the ≤24·|types| grid; peak picked by max_by with
    * hour tie-break. */
  def q169PeakLoad(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        (expr("ts_ms div 3600000") % 24).as("hod"))
      .agg(count(lit(1)).as("n"))
    hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_total"),
        max_by(col("hod"), struct(col("n"), (-col("hod")).as("nh")))
          .as("peak_hour"),
        max(col("n")).as("peak_n"),
        count(lit(1)).as("n_hours"))
      .select(col("event_type"), col("n_total"), col("peak_hour"),
        round(col("peak_n").cast("double") / col("n_total").cast("double"),
          6).as("peak_share"),
        round(col("peak_n").cast("double") * col("n_hours").cast("double") /
          col("n_total").cast("double"), 4).as("peak_to_avg"))
  }
  val q169Sql: String =
    """WITH h AS (SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hod,
      |        count(*)::BIGINT AS n
      |      FROM events GROUP BY 1, 2),
      |p AS (SELECT event_type, hod, n,
      |        row_number() OVER (PARTITION BY event_type
      |          ORDER BY n DESC, hod ASC) AS rk
      |      FROM h),
      |g AS (SELECT event_type, sum(n)::BIGINT AS n_total,
      |        count(*)::BIGINT AS n_hours, max(n)::BIGINT AS peak_n
      |      FROM h GROUP BY 1)
      |SELECT g.event_type, n_total,
      |       (SELECT hod FROM p WHERE p.event_type = g.event_type
      |        AND rk = 1) AS peak_hour,
      |       round(peak_n::DOUBLE / n_total::DOUBLE, 6) AS peak_share,
      |       round(peak_n::DOUBLE * n_hours::DOUBLE / n_total::DOUBLE, 4)
      |         AS peak_to_avg
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q170
  /** Feed-coverage gaps per event type: of the period's hour slots, how
    * many carry at least one event, the longest silent streak in
    * hours, and the coverage fraction — the "did the feed stall and
    * when" dashboard a delivery SLA reads (q143 gives gap percentiles;
    * this names the WORST outage). The streak computes with the q29
    * gap-and-island trick over the ≤|types|·|hours| OBSERVED-hour
    * frame: silent streak = gap between consecutive present hours − 1.
    */
  def q170CoverageGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val span = ev.agg(min(expr("ts_ms div 3600000")).as("h0"),
      max(expr("ts_ms div 3600000")).as("h1"))
    val present = ev.select(col("event_type"),
        expr("ts_ms div 3600000").as("h")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val gaps = present
      .withColumn("prev", lag(col("h"), 1).over(w))
      .withColumn("gap", col("h") - col("prev") - 1)
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("hours_present"),
        max(coalesce(col("gap"), lit(0L))).as("max_silent_hours"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("hours_present"),
        (col("h1") - col("h0") + 1).as("hours_total"),
        round(col("hours_present").cast("double") /
          (col("h1") - col("h0") + 1).cast("double"), 6).as("coverage"),
        col("max_silent_hours"))
  }
  val q170Sql: String =
    """WITH sp AS (SELECT min(epoch_ms(ts) // 3600000) AS h0,
      |        max(epoch_ms(ts) // 3600000) AS h1 FROM events),
      |p AS (SELECT DISTINCT event_type, epoch_ms(ts) // 3600000 AS h
      |      FROM events),
      |g AS (SELECT event_type, h,
      |        h - lag(h) OVER (PARTITION BY event_type ORDER BY h) - 1
      |          AS gap
      |      FROM p)
      |SELECT event_type, count(*)::BIGINT AS hours_present,
      |       (SELECT h1 - h0 + 1 FROM sp)::BIGINT AS hours_total,
      |       round(count(*)::DOUBLE /
      |             (SELECT h1 - h0 + 1 FROM sp)::DOUBLE, 6) AS coverage,
      |       max(coalesce(gap, 0))::BIGINT AS max_silent_hours
      |FROM g GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Jaccard-threshold sweep — the q144 tuning-table idea for the
    * VERIFY side of dedup: from ONE shared-shingle pair computation
    * (the q15 chain over the tuning sample), the surviving pair count
    * at thresholds 0.1/0.3/0.5/0.7 as conditional sums over the same
    * jaccard column. Where q144 prices candidate GENERATION, this
    * prices the verification threshold — together they parameterize
    * the whole campaign from two sample-sized tables. */
  def q171JaccardSweep(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.DedupFunctions
    val pairs = DedupFunctions.ngramJaccardPairs(
      QueriesExt.docsSample(s, dir), "text", "doc_id",
      n = 2, threshold = 0.0, cap = DedupFunctions.ShingleCap.Uncapped)
    val thresholds = Seq(0.1d, 0.3d, 0.5d, 0.7d)
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"c$i")
    }
    val one = pairs.agg(aggs.head, aggs.tail: _*)
    thresholds.zipWithIndex.map { case (t, i) =>
      one.select(lit(t).as("threshold"), col(s"c$i").as("n_pairs"))
    }.reduce(_ unionByName _)
  }
  val q171Sql: String = {
    def one(t: Double): String =
      s"""SELECT $t::DOUBLE AS threshold,
         |  sum(CASE WHEN jaccard >= $t THEN 1 ELSE 0 END)::BIGINT
         |    AS n_pairs
         |FROM jp""".stripMargin
    s"""WITH ${QueriesExt.shingleCteSql},
       |e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
       |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
       |             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
       |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |jp AS (SELECT round(shared::DOUBLE / (n_a + n_b - shared), 6)
       |         AS jaccard FROM j)
       |${Seq(0.1, 0.3, 0.5, 0.7).map(one).mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  // ---------------------------------------------------------------- q172
  /** Basket-size revenue curve: per items-per-order bucket, order count
    * and net revenue (price × (1 − discount), exact micro-cent
    * integers) — the merchandising curve that says whether big baskets
    * carry the business. Two hash aggregates: per-order roll-up, then
    * the ≤|max-basket| bucket frame. */
  def q172BasketCurve(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))
          * 100.0d, 0).cast("long")).as("cents"))
    perOrder.groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("cents")).cast("double") / 100.0d, 2).as("revenue"))
      .withColumn("revenue_per_order",
        round(col("revenue") / col("n_orders").cast("double"), 2))
  }
  val q172Sql: String =
    """WITH po AS (SELECT l_orderkey, count(*)::BIGINT AS n_items,
      |        sum(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |            ::BIGINT)::BIGINT AS cents
      |      FROM lineitem GROUP BY 1)
      |SELECT n_items, count(*)::BIGINT AS n_orders,
      |       round(sum(cents)::DOUBLE / 100.0, 2) AS revenue,
      |       round(round(sum(cents)::DOUBLE / 100.0, 2)
      |             / count(*)::DOUBLE, 2) AS revenue_per_order
      |FROM po GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q173
  /** Return rate by discount band: are discounted items returned more?
    * Per 2%-discount band, the line count, return share
    * (l_returnflag = 'R'), and mean net price — the
    * margin-vs-returns diagnostic. Band arithmetic is exact integer
    * (discount in exact basis points via micro-rounding before
    * division); one pruned-scan hash aggregate over the ≤6-band
    * frame. */
  def q173ReturnsByDiscount(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(expr("cast(round(l_discount * 10000.0, 0) as long) div 200")
          .as("band"),
        col("l_returnflag"),
        round(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))
          * 100.0d, 0).cast("long").as("cents"))
    li.groupBy(col("band"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"),
        sum(col("cents")).as("cents"))
      .select((col("band") * 2).as("discount_pct_lo"), col("n_lines"),
        round(col("n_returned").cast("double") /
          col("n_lines").cast("double"), 6).as("return_rate"),
        round(col("cents").cast("double") / col("n_lines").cast("double") /
          100.0d, 2).as("mean_net_price"))
  }
  val q173Sql: String =
    """WITH li AS (SELECT
      |        round(l_discount * 10000.0)::BIGINT // 200 AS band,
      |        l_returnflag,
      |        round(l_extendedprice * (1.0 - l_discount) * 100.0)::BIGINT
      |          AS cents
      |      FROM lineitem)
      |SELECT (band * 2)::BIGINT AS discount_pct_lo,
      |       count(*)::BIGINT AS n_lines,
      |       round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |             ::DOUBLE / count(*)::DOUBLE, 6) AS return_rate,
      |       round(sum(cents)::DOUBLE / count(*)::DOUBLE / 100.0, 2)
      |         AS mean_net_price
      |FROM li GROUP BY band""".stripMargin

  // ---------------------------------------------------------------- q174
  /** Supplier-concentration HHI per nation — the market-concentration
    * index (Σ share², HHI > 0.25 ≈ concentrated) over supplier revenue
    * within each nation: the supply-risk view of the star schema.
    * Exact micro-cent revenue per supplier (map-side partials), the
    * nation dimension broadcasts; HHI = Σc²/(Σc)² over exact integer
    * sums so the only double step is one defined division. */
  def q174SupplierHhi(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))
        * 100.0d, 0).cast("long")).as("cents"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"))
    val j = rev.join(sup, rev("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    // HHI = Σ cents² / (Σ cents)² — both sums exact integers (decimal
    // partials, order-independent at any partition count), then ONE
    // defined double division: no partition-order double sum to flip
    // round(·, 6) on a boundary (the q223 r14 flake class).
    j.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("tot"),
        sum(col("cents").cast("decimal(38,0)") *
          col("cents").cast("decimal(38,0)")).as("sq"))
      .select(col("n_name"), col("n_suppliers"),
        round(col("tot").cast("double") / 100.0d, 2).as("revenue"),
        round(col("sq").cast("double") /
          (col("tot").cast("double") * col("tot").cast("double")), 6)
          .as("hhi"))
      .withColumn("concentrated", col("hhi") > 0.25d)
  }
  val q174Sql: String =
    """WITH rev AS (SELECT l_suppkey,
      |        sum(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |            ::BIGINT)::BIGINT AS cents
      |      FROM lineitem GROUP BY 1),
      |j AS (SELECT n.n_name, rev.cents
      |      FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
      |      JOIN nation n ON s.s_nationkey = n.n_nationkey),
      |g AS (SELECT n_name, count(*)::BIGINT AS n_suppliers,
      |        sum(cents)::BIGINT AS tot,
      |        sum(cents::HUGEINT * cents::HUGEINT)::HUGEINT AS sq
      |      FROM j GROUP BY 1)
      |SELECT n_name, n_suppliers,
      |       round(tot::DOUBLE / 100.0, 2) AS revenue,
      |       round(sq::DOUBLE / (tot::DOUBLE * tot::DOUBLE), 6) AS hhi,
      |       round(sq::DOUBLE / (tot::DOUBLE * tot::DOUBLE), 6) > 0.25
      |         AS concentrated
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q175
  /** Order-to-ship aging by priority: per order priority, the exact
    * median/p95 of days from order date to the order's LAST ship date —
    * does the priority field actually buy faster fulfilment? Date
    * arithmetic in exact epoch days; one per-order max join to the
    * order dimension, percentiles over the per-order aging rows.
    *
    * Scale model of the exact `percentile` aggregate here: its buffer
    * is a (value → count) map and aging_days is a DOMAIN-BOUNDED small
    * integer (order-to-ship spans ~0–150 days), so per-priority state
    * is a few hundred entries regardless of order count — partial
    * aggregation keeps the map-side combine, and no task ever holds
    * the per-order rows. This is why the exact tier is safe here while
    * a continuous measure would need the histogram sketch tier
    * ([[graft.functions.HistSketch]], q125). */
  def q175ShipAging(s: SparkSession, dir: String): DataFrame = {
    val lastShip = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
        .as("ship_day"))
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("order_day"))
    orders.join(lastShip, orders("o_orderkey") === lastShip("l_orderkey"))
      .select(col("o_orderpriority"),
        (col("ship_day") - col("order_day")).as("aging_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(aging_days, 0.5)"), 2).as("aging_p50"),
        round(expr("percentile(aging_days, 0.95)"), 2).as("aging_p95"))
  }
  val q175Sql: String =
    """WITH ls AS (SELECT l_orderkey,
      |        max(epoch_ms(l_shipdate) // 86400000) AS ship_day
      |      FROM lineitem GROUP BY 1),
      |o AS (SELECT o_orderkey, o_orderpriority,
      |        epoch_ms(o_orderdate) // 86400000 AS order_day
      |      FROM orders)
      |SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
      |       round(quantile_cont((ship_day - order_day)::DOUBLE, 0.5), 2)
      |         AS aging_p50,
      |       round(quantile_cont((ship_day - order_day)::DOUBLE, 0.95), 2)
      |         AS aging_p95
      |FROM o JOIN ls ON o.o_orderkey = ls.l_orderkey
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q176
  /** Linear multi-touch attribution next to last-touch (q115): each
    * purchase's value splits EQUALLY across all of the user's preceding
    * non-purchase touches — the credit model that stops over-paying the
    * last click. Exact integer discipline: per (conversion, touch) the
    * credit is vm div n_touches micro-units (floor; the ≤n_touches−1
    * micro remainder is deliberately dropped and the rule is named —
    * FP splits would be order-dependent); untouched conversions land
    * in 'none' whole. One running-count window + one join back to
    * touches per user exchange. */
  def q176LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts_ms"),
      col("event_id"), col("event_type"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // The running touch count runs over ALL events (the window frame
    // ends 1 row before current); a first-row purchase sees an empty
    // frame → null → coalesce to 0 so it lands in 'none'.
    val touchCount = ev.withColumn("n_touch",
      coalesce(sum(when(col("event_type") =!= "purchase", 1L)
        .otherwise(0L)).over(w), lit(0L)))
    val convs = touchCount.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms").as("cts"),
        col("event_id").as("cid"), col("vm"), col("n_touch"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_ms").as("tts"),
        col("event_id").as("tid"), col("event_type").as("channel"))
    val credited = convs.filter(col("n_touch") > 0)
      .join(touches, Seq("user_id"))
      .filter(col("tts") < col("cts") ||
        (col("tts") === col("cts") && col("tid") < col("cid")))
      .select(col("channel"),
        expr("vm div n_touch").as("credit_micro"))
    val none = convs.filter(col("n_touch") === 0)
      .select(lit("none").as("channel"), col("vm").as("credit_micro"))
    credited.unionByName(none)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("credit_micro")).cast("double") / 1000000.0d, 2)
          .as("linear_value"))
  }
  val q176Sql: String =
    """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |        event_type, round("value" * 1000000.0)::BIGINT AS vm
      |      FROM events),
      |tc AS (SELECT *,
      |        sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |          AS n_touch
      |      FROM ev),
      |cv AS (SELECT user_id, ts_ms AS cts, event_id AS cid, vm,
      |         coalesce(n_touch, 0) AS n_touch
      |       FROM tc WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts_ms AS tts, event_id AS tid,
      |        event_type AS channel
      |      FROM ev WHERE event_type <> 'purchase'),
      |cr AS (SELECT t.channel, cv.vm // cv.n_touch AS credit_micro
      |       FROM cv JOIN t ON cv.user_id = t.user_id
      |       WHERE cv.n_touch > 0
      |         AND (t.tts < cv.cts OR (t.tts = cv.cts AND t.tid < cv.cid))
      |       UNION ALL
      |       SELECT 'none', vm FROM cv WHERE n_touch = 0)
      |SELECT channel, count(*)::BIGINT AS n_credits,
      |       round(sum(credit_micro)::DOUBLE / 1000000.0, 2)
      |         AS linear_value
      |FROM cr GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Rich-club coefficient of the co-purchase graph: among nodes with
    * degree > k (k = 150, 180), the realized edge density φ(k) =
    * 2·E_club/(N_club(N_club−1)) — do the hubs preferentially trade
    * with each other? With assortativity (q162) and the power-law
    * slope (q148), the third structural number. Degree table + one
    * semi-join-shaped edge filter per k over the shrinking club. */
  def q177RichClub(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchase(s, dir).localCheckpoint()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    Seq(150, 180).map { k =>
      val club = deg.filter(col("deg") > k).select(col("v"))
      val nClub = club.agg(count(lit(1)).as("n_club"))
      val eClub = e.join(club.select(col("v").as("a")), "a")
        .join(club.select(col("v").as("b")), "b")
        .agg(count(lit(1)).as("e_club"))
      nClub.crossJoin(eClub)
        .select(lit(k).as("k"), col("n_club"), col("e_club"),
          // φ undefined for a club of < 2 nodes (possible-edge count 0
          // — happens at tiny scale): NULL, not an ANSI ÷0 error.
          when(col("n_club") >= 2,
            round(lit(2.0d) * col("e_club").cast("double") /
              (col("n_club") * (col("n_club") - 1)).cast("double"), 6))
            .as("phi"))
    }.reduce(_ unionByName _)
  }
  val q177Sql: String = {
    def one(k: Int): String =
      s"""SELECT $k AS k,
         |  (SELECT count(*) FROM club$k)::BIGINT AS n_club,
         |  (SELECT count(*) FROM e
         |   WHERE a IN (SELECT v FROM club$k)
         |     AND b IN (SELECT v FROM club$k))::BIGINT AS e_club,
         |  CASE WHEN (SELECT count(*) FROM club$k) >= 2 THEN
         |    round(2.0 * (SELECT count(*) FROM e
         |        WHERE a IN (SELECT v FROM club$k)
         |          AND b IN (SELECT v FROM club$k))::DOUBLE
         |      / ((SELECT count(*) FROM club$k)
         |         * ((SELECT count(*) FROM club$k) - 1))::DOUBLE, 6)
         |  END AS phi"""
        .stripMargin
    s"""WITH $coPurchaseSqlCte,
       |d AS (SELECT v, count(*)::BIGINT AS deg FROM
       |        (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |club150 AS (SELECT v FROM d WHERE deg > 150),
       |club180 AS (SELECT v FROM d WHERE deg > 180)
       |${Seq(150, 180).map(one).mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ---------------------------------------------------------------- q178
  /** Pareto revenue shares: the fraction of total purchase value
    * carried by the top 1% / 10% / 20% of users — the quoted "80/20"
    * number next to q168's Gini. Exact: per-user micro sums ranked
    * descending (user-id tie-break) via
    * [[graft.functions.PrefixScan]]'s two-pass rank (the per-user
    * frame is data-scaled — no unpartitioned window), top-N by
    * ceil-count, conditional integer sums; n and the value total are
    * one broadcast scalar aggregate. */
  def q178ParetoShares(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PrefixScan
    val perUser = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("x"))
    val nt = perUser.agg(count(lit(1)).as("n"), sum(col("x")).as("tot"))
    val ranked = PrefixScan.scan(perUser, -col("x"),
        Seq(col("x").desc, col("user_id").asc),
        Seq(PrefixScan.RowNumber("rk")), cache = true)
      .crossJoin(broadcast(nt))
    Seq((1, 100), (10, 100), (20, 100)).map { case (num, den) =>
      // Integer `div` keeps the ceil-count exact past 2^53 user counts
      // (double `/` would round the rank boundary there).
      ranked.filter(col("rk") <=
          expr(s"(n * $num + ${den - 1}) div $den"))
        .agg(max(col("n")).as("n_users"), max(col("tot")).as("tot"),
          count(lit(1)).as("top_users"), sum(col("x")).as("top_x"))
        .select(lit(num).as("top_pct"), col("top_users"),
          round(col("top_x").cast("double") / col("tot").cast("double"), 6)
            .as("value_share"))
    }.reduce(_ unionByName _)
  }
  val q178Sql: String = {
    def one(num: Int): String =
      s"""SELECT $num AS top_pct, count(*)::BIGINT AS top_users,
         |  round(sum(x)::DOUBLE / max(tot)::DOUBLE, 6) AS value_share
         |FROM r WHERE rk <= (n * $num + 99) // 100""".stripMargin
    s"""WITH pu AS (SELECT user_id,
       |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS x
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |r AS (SELECT user_id, x,
       |        row_number() OVER (ORDER BY x DESC, user_id ASC) AS rk,
       |        count(*) OVER () AS n, sum(x) OVER () AS tot
       |      FROM pu)
       |${Seq(1, 10, 20).map(one).mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ---------------------------------------------------------------- q179
  /** Position-based (U-shaped) attribution — the third credit model
    * next to last-touch (q115) and linear (q176): 40% to the FIRST
    * touch, 40% to the LAST, 20% split across the middle ones (all of
    * it to first/last when ≤2 touches: 1 touch → 100%, 2 → 50/50).
    * Exact integer discipline: per-conversion credits in micro-units
    * with floor division and every boundary rule named; first/last
    * touch per conversion come from min/max over the preceding-touch
    * join (tie-break on event id). */
  def q179UshapedAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts_ms"),
      col("event_id"), col("event_type"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val convs = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms").as("cts"),
        col("event_id").as("cid"), col("vm"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_ms").as("tts"),
        col("event_id").as("tid"), col("event_type").as("channel"))
    val joined = convs.join(touches, Seq("user_id"))
      .filter(col("tts") < col("cts") ||
        (col("tts") === col("cts") && col("tid") < col("cid")))
    val wAsc = Window.partitionBy(col("user_id"), col("cid"))
      .orderBy(col("tts").asc, col("tid").asc)
    val wDesc = Window.partitionBy(col("user_id"), col("cid"))
      .orderBy(col("tts").desc, col("tid").desc)
    val marked = joined
      .withColumn("rk_first", row_number().over(wAsc))
      .withColumn("rk_last", row_number().over(wDesc))
      .withColumn("n_touch",
        count(lit(1)).over(Window.partitionBy(col("user_id"), col("cid"))))
    val credited = marked.select(col("channel"),
      when(col("n_touch") === 1, col("vm"))
        .when(col("n_touch") === 2,
          expr("vm div 2"))
        .otherwise(
          when(col("rk_first") === 1 || col("rk_last") === 1,
            expr("(vm * 4) div 10"))
            .otherwise(expr("(vm * 2) div (10 * (n_touch - 2))")))
        .as("credit_micro"))
    // 'none' = conversions with NO preceding touch (a user-level anti
    // join would wrongly drop conversions whose touches all come later).
    val nonePreceding = convs.join(
        joined.select(col("user_id").as("juid"), col("cid").as("jcid"))
          .distinct(),
        convs("user_id") === col("juid") && col("cid") === col("jcid"),
        "left_anti")
      .select(lit("none").as("channel"), col("vm").as("credit_micro"))
    credited.unionByName(nonePreceding)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("credit_micro")).cast("double") / 1000000.0d, 2)
          .as("ushaped_value"))
  }
  val q179Sql: String =
    """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |        event_type, round("value" * 1000000.0)::BIGINT AS vm
      |      FROM events),
      |cv AS (SELECT user_id, ts_ms AS cts, event_id AS cid, vm
      |       FROM ev WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts_ms AS tts, event_id AS tid,
      |        event_type AS channel
      |      FROM ev WHERE event_type <> 'purchase'),
      |j AS (SELECT cv.user_id, cv.cid, cv.vm, t.channel, t.tts, t.tid
      |      FROM cv JOIN t ON cv.user_id = t.user_id
      |      WHERE t.tts < cv.cts OR (t.tts = cv.cts AND t.tid < cv.cid)),
      |m AS (SELECT *,
      |        row_number() OVER (PARTITION BY user_id, cid
      |          ORDER BY tts ASC, tid ASC) AS rk_first,
      |        row_number() OVER (PARTITION BY user_id, cid
      |          ORDER BY tts DESC, tid DESC) AS rk_last,
      |        count(*) OVER (PARTITION BY user_id, cid) AS n_touch
      |      FROM j),
      |cr AS (SELECT channel,
      |         CASE WHEN n_touch = 1 THEN vm
      |              WHEN n_touch = 2 THEN vm // 2
      |              WHEN rk_first = 1 OR rk_last = 1 THEN (vm * 4) // 10
      |              ELSE (vm * 2) // (10 * (n_touch - 2)) END
      |           AS credit_micro
      |       FROM m
      |       UNION ALL
      |       SELECT 'none', cv.vm FROM cv
      |       WHERE NOT EXISTS (SELECT 1 FROM j
      |         WHERE j.user_id = cv.user_id AND j.cid = cv.cid))
      |SELECT channel, count(*)::BIGINT AS n_credits,
      |       round(sum(credit_micro)::DOUBLE / 1000000.0, 2)
      |         AS ushaped_value
      |FROM cr GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q180
  /** Basket-size dispersion index (variance/mean) — is items-per-order
    * Poisson-like (≈1), underdispersed (capped processes) or
    * overdispersed (bursty mixtures)? The distributional sanity check
    * behind any Poisson-assuming capacity model (q169). Exact integer
    * sums over the per-order frame; one defined double chain. */
  def q180DispersionIndex(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k"))
    perOrder.agg(count(lit(1)).as("n_orders"),
        sum(col("k")).as("sk"), sum(col("k") * col("k")).as("skk"))
      .select(col("n_orders"),
        round(col("sk").cast("double") / col("n_orders").cast("double"), 4)
          .as("mean_items"),
        round((col("skk").cast("double") / col("n_orders").cast("double") -
          (col("sk").cast("double") / col("n_orders").cast("double")) *
            (col("sk").cast("double") / col("n_orders").cast("double"))) /
          (col("sk").cast("double") / col("n_orders").cast("double")), 4)
          .as("dispersion_index"))
  }
  val q180Sql: String =
    """WITH po AS (SELECT l_orderkey, count(*)::BIGINT AS k
      |            FROM lineitem GROUP BY 1),
      |s AS (SELECT count(*)::BIGINT AS n_orders, sum(k)::BIGINT AS sk,
      |        sum(k * k)::BIGINT AS skk FROM po)
      |SELECT n_orders,
      |       round(sk::DOUBLE / n_orders::DOUBLE, 4) AS mean_items,
      |       round((skk::DOUBLE / n_orders::DOUBLE
      |              - (sk::DOUBLE / n_orders::DOUBLE)
      |                * (sk::DOUBLE / n_orders::DOUBLE))
      |             / (sk::DOUBLE / n_orders::DOUBLE), 4)
      |         AS dispersion_index
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q181
  /** Repeat-purchase interval: per-user gaps between consecutive
    * purchases, summarized as repeat-buyer count and exact p50/p95 of
    * the interval in hours — the replenishment-cycle statistic that
    * times win-back campaigns. One lag window over the purchase-only
    * user exchange. */
  def q181RepeatInterval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"), col("event_id"))
      .withColumn("gap_h", (col("ts_ms") -
        lag(col("ts_ms"), 1).over(w)).cast("double") / 3600000.0d)
      .filter(col("gap_h").isNotNull)
      .agg(countDistinct(col("user_id")).as("repeat_buyers"),
        count(lit(1)).as("n_intervals"),
        round(expr("percentile(gap_h, 0.5)"), 2).as("interval_p50_h"),
        round(expr("percentile(gap_h, 0.95)"), 2).as("interval_p95_h"))
  }
  val q181Sql: String =
    """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
      |           FROM events WHERE event_type = 'purchase'),
      |g AS (SELECT user_id,
      |        (ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
      |           ORDER BY ts_ms, event_id))::DOUBLE / 3600000.0 AS gap_h
      |      FROM p)
      |SELECT count(DISTINCT user_id)::BIGINT AS repeat_buyers,
      |       count(*)::BIGINT AS n_intervals,
      |       round(quantile_cont(gap_h, 0.5), 2) AS interval_p50_h,
      |       round(quantile_cont(gap_h, 0.95), 2) AS interval_p95_h
      |FROM g WHERE gap_h IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- q182
  /** Deadstock report: parts with NO shipment in the trailing 90 days
    * of the data window (and never-sold parts), as counts and share of
    * the catalog — the inventory the working-capital review asks about
    * first. One max-shipdate aggregate per part (pruned two-column
    * scan), an anti-join-shaped left join against the part dimension,
    * one summary row. */
  def q182Deadstock(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey"),
      expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
        .as("ship_day"))
    val cutoff = li.agg((max(col("ship_day")) - 90).as("cut"))
    val lastShip = li.groupBy(col("l_partkey"))
      .agg(max(col("ship_day")).as("last_day"))
    val parts = Tables.part(s, dir).select(col("p_partkey"))
    parts.join(lastShip, parts("p_partkey") === lastShip("l_partkey"),
        "left")
      .crossJoin(broadcast(cutoff))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("last_day").isNull, 1L).otherwise(0L))
          .as("never_sold"),
        sum(when(col("last_day").isNotNull && col("last_day") < col("cut"),
          1L).otherwise(0L)).as("stale_90d"))
      .select(col("n_parts"), col("never_sold"), col("stale_90d"),
        round((col("never_sold") + col("stale_90d")).cast("double") /
          col("n_parts").cast("double"), 6).as("dead_share"))
  }
  val q182Sql: String =
    """WITH li AS (SELECT l_partkey,
      |        epoch_ms(l_shipdate) // 86400000 AS ship_day FROM lineitem),
      |c AS (SELECT max(ship_day) - 90 AS cut FROM li),
      |ls AS (SELECT l_partkey, max(ship_day) AS last_day
      |       FROM li GROUP BY 1)
      |SELECT count(*)::BIGINT AS n_parts,
      |       sum(CASE WHEN last_day IS NULL THEN 1 ELSE 0 END)::BIGINT
      |         AS never_sold,
      |       sum(CASE WHEN last_day IS NOT NULL AND last_day < cut
      |           THEN 1 ELSE 0 END)::BIGINT AS stale_90d,
      |       round((sum(CASE WHEN last_day IS NULL THEN 1 ELSE 0 END)
      |              + sum(CASE WHEN last_day IS NOT NULL AND last_day < cut
      |                    THEN 1 ELSE 0 END))::DOUBLE
      |             / count(*)::DOUBLE, 6) AS dead_share
      |FROM part LEFT JOIN ls ON part.p_partkey = ls.l_partkey, c"""
      .stripMargin

  // ---------------------------------------------------------------- q183
  /** Daily GMV with the 7-day trailing mean and week-over-week growth —
    * the first chart of every revenue dashboard, in exact micro-cents:
    * both the moving mean and the lag-7 comparison are windows over the
    * ≤|days| daily frame (integer sums come off the event grain once).
    * Edge rows publish NULL growth/short-window means honestly instead
    * of silently averaging fewer days (frame size is published). */
  def q183GmvTrend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("vm"))
    val w7 = graft.functions.BoundedWindow.orderBy(col("day"), col("day"))
      .rowsBetween(-6, 0)
    val wl = graft.functions.BoundedWindow.orderBy(col("day"), col("day"))
    daily
      .withColumn("win_n", count(lit(1)).over(w7))
      .withColumn("ma7",
        when(col("win_n") === 7,
          round(sum(col("vm")).over(w7).cast("double") / 7.0d /
            1000000.0d, 2)))
      .withColumn("wow",
        round((col("vm") - lag(col("vm"), 7).over(wl)).cast("double") /
          lag(col("vm"), 7).over(wl).cast("double"), 6))
      .select(col("day"),
        round(col("vm").cast("double") / 1000000.0d, 2).as("gmv"),
        col("win_n"), col("ma7"), col("wow"))
  }
  val q183Sql: String =
    """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS vm
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT day, round(vm::DOUBLE / 1000000.0, 2) AS gmv,
      |       count(*) OVER w7 AS win_n,
      |       CASE WHEN count(*) OVER w7 = 7 THEN
      |         round((sum(vm) OVER w7)::DOUBLE / 7.0 / 1000000.0, 2)
      |       END AS ma7,
      |       round((vm - lag(vm, 7) OVER (ORDER BY day))::DOUBLE
      |             / (lag(vm, 7) OVER (ORDER BY day))::DOUBLE, 6) AS wow
      |FROM d
      |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
      .stripMargin

  // ---------------------------------------------------------------- q184
  /** Revenue mix by customer segment: net order revenue and share per
    * market segment — the portfolio view of the star schema in exact
    * micro-cents. Customer dimension broadcasts into the order fact;
    * the share window runs over the ≤|segments| frame. */
  def q184SegmentMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      round(col("o_totalprice") * 100.0d, 0).cast("long").as("cents"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .withColumn("share", round(col("cents").cast("double") /
        sum(col("cents")).over(graft.functions.BoundedWindow.all(col("cents")))
          .cast("double"), 6))
      .select(col("c_mktsegment"), col("n_orders"),
        round(col("cents").cast("double") / 100.0d, 2).as("revenue"),
        col("share"))
  }
  val q184Sql: String =
    """WITH j AS (SELECT c.c_mktsegment,
      |        round(o.o_totalprice * 100.0)::BIGINT AS cents
      |      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |g AS (SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
      |        sum(cents)::BIGINT AS cents
      |      FROM j GROUP BY 1)
      |SELECT c_mktsegment, n_orders,
      |       round(cents::DOUBLE / 100.0, 2) AS revenue,
      |       round(cents::DOUBLE / (sum(cents) OVER ())::DOUBLE, 6)
      |         AS share
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q185
  /** User-activity distribution as a mergeable log₂ histogram
    * ([[HistSketch]] over events-per-user) — how heavy the heavy users
    * are, in the same additive-sketch currency as q125 (per-day
    * activity histograms would re-merge by plain summation): per bin
    * the user count and event mass, with shares over the ≤32-bin
    * frame. */
  def q185ActivityHistogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    HistSketch.logHistogram(
        perUser.select(lit("all").as("g"), col("n")), "g", col("n"))
      .withColumn("n_users", col("n"))
      .select(col("b").as("bucket"), col("n_users"),
        round(col("n").cast("double") /
          sum(col("n")).over(graft.functions.BoundedWindow.all(col("n")))
            .cast("double"), 6)
          .as("user_share"))
  }
  val q185Sql: String =
    """WITH pu AS (SELECT user_id, count(*)::BIGINT AS n
      |            FROM events GROUP BY 1),
      |h AS (SELECT (length(bin(n)) - 1)::INT AS bucket,
      |        count(*)::BIGINT AS n_users
      |      FROM pu WHERE n > 0 GROUP BY 1)
      |SELECT bucket, n_users,
      |       round(n_users::DOUBLE / (sum(n_users) OVER ())::DOUBLE, 6)
      |         AS user_share
      |FROM h""".stripMargin

  // ---------------------------------------------------------------- q186
  /** Conversion by activity quartile: users bucketed by NON-purchase
    * event volume (the [[graft.functions.RobustStats.withQuantileBin]]
    * kernel — exact corpus quartile boundaries broadcast back), then
    * the purchase-conversion rate per bucket — does engagement actually
    * convert, the behavioral-segmentation read. Two per-user
    * aggregates, one boundary row, one ≤4-row report. */
  def q186ConversionByActivity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.RobustStats
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("touches"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    RobustStats.withQuantileBin(perUser, "touches",
        Seq(0.25, 0.5, 0.75))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .select(col("bin").as("activity_quartile"), col("n_users"),
        round(col("n_converted").cast("double") /
          col("n_users").cast("double"), 6).as("conversion_rate"))
  }
  val q186Sql: String =
    """WITH pu AS (SELECT user_id,
      |        sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      |          AS touches,
      |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |          AS converted
      |      FROM events GROUP BY 1),
      |b AS (SELECT quantile_cont(touches::DOUBLE, 0.25) AS q1,
      |        quantile_cont(touches::DOUBLE, 0.5) AS q2,
      |        quantile_cont(touches::DOUBLE, 0.75) AS q3
      |      FROM pu),
      |x AS (SELECT converted,
      |        (CASE WHEN touches::DOUBLE > q1 THEN 1 ELSE 0 END
      |         + CASE WHEN touches::DOUBLE > q2 THEN 1 ELSE 0 END
      |         + CASE WHEN touches::DOUBLE > q3 THEN 1 ELSE 0 END)
      |          AS bin
      |      FROM pu, b)
      |SELECT bin AS activity_quartile, count(*)::BIGINT AS n_users,
      |       round(sum(converted)::DOUBLE / count(*)::DOUBLE, 6)
      |         AS conversion_rate
      |FROM x GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q187
  /** Part-price consistency audit: per part, the relative spread of its
    * extended unit price across order lines ((max−min)/mean in exact
    * cents) and a flag above 50% — the pricing-integrity check that
    * catches fat-finger discounts and currency bugs. Unit price =
    * extendedprice/quantity in exact cents; one per-part aggregate;
    * the report keeps only flagged parts plus a summary-friendly
    * count. */
  def q187PriceDispersion(s: SparkSession, dir: String): DataFrame = {
    val unit = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        round(col("l_extendedprice") / col("l_quantity") * 100.0d, 0)
          .cast("long").as("unit_cents"))
    val g = unit.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), min(col("unit_cents")).as("mn"),
        max(col("unit_cents")).as("mx"), sum(col("unit_cents")).as("sc"))
      .withColumn("spread", round((col("mx") - col("mn")).cast("double") /
        (col("sc").cast("double") / col("n_lines").cast("double")), 6))
    g.agg(count(lit(1)).as("n_parts"),
        sum(when(col("spread") > 0.5d, 1L).otherwise(0L))
          .as("n_flagged"),
        round(expr("percentile(spread, 0.5)"), 6).as("spread_p50"),
        round(max(col("spread")), 6).as("spread_max"))
  }
  val q187Sql: String =
    """WITH u AS (SELECT l_partkey,
      |        round(l_extendedprice / l_quantity * 100.0)::BIGINT
      |          AS unit_cents
      |      FROM lineitem),
      |g AS (SELECT l_partkey, count(*)::BIGINT AS n_lines,
      |        min(unit_cents) AS mn, max(unit_cents) AS mx,
      |        sum(unit_cents)::BIGINT AS sc
      |      FROM u GROUP BY 1),
      |sp AS (SELECT round((mx - mn)::DOUBLE
      |         / (sc::DOUBLE / n_lines::DOUBLE), 6) AS spread FROM g)
      |SELECT count(*)::BIGINT AS n_parts,
      |       sum(CASE WHEN spread > 0.5 THEN 1 ELSE 0 END)::BIGINT
      |         AS n_flagged,
      |       round(quantile_cont(spread, 0.5), 6) AS spread_p50,
      |       round(max(spread), 6) AS spread_max
      |FROM sp""".stripMargin

  // ---------------------------------------------------------------- q188
  /** Churn rate by signup cohort: users whose last activity ended more
    * than 7 days before the corpus's end are churned; the rate per
    * weekly signup cohort says whether retention is improving across
    * cohorts (q108's retention matrix collapsed to the one number a
    * weekly review tracks). One per-user (first, last) aggregate, a
    * broadcast end-of-window scalar, a ≤|cohorts| report. */
  def q188ChurnByCohort(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(expr("ts_ms div 86400000")).as("first_day"),
        max(expr("ts_ms div 86400000")).as("last_day"))
    val end = Tables.events(s, dir)
      .agg(max(expr("ts_ms div 86400000")).as("end_day"))
    perUser.crossJoin(broadcast(end))
      .select(expr("first_day div 7").as("cohort_week"),
        when(col("last_day") < col("end_day") - 7, 1L).otherwise(0L)
          .as("churned"))
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"), sum(col("churned")).as("n_churned"))
      .withColumn("churn_rate", round(col("n_churned").cast("double") /
        col("n_users").cast("double"), 6))
  }
  val q188Sql: String =
    """WITH pu AS (SELECT user_id,
      |        min(epoch_ms(ts) // 86400000) AS first_day,
      |        max(epoch_ms(ts) // 86400000) AS last_day
      |      FROM events GROUP BY 1),
      |e AS (SELECT max(epoch_ms(ts) // 86400000) AS end_day FROM events)
      |SELECT first_day // 7 AS cohort_week, count(*)::BIGINT AS n_users,
      |       sum(CASE WHEN last_day < end_day - 7 THEN 1 ELSE 0 END)::BIGINT
      |         AS n_churned,
      |       round(sum(CASE WHEN last_day < end_day - 7 THEN 1 ELSE 0 END)
      |             ::DOUBLE / count(*)::DOUBLE, 6) AS churn_rate
      |FROM pu, e GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q189
  /** ARPU by nation: order revenue per customer across the
    * customer→nation geography — the geographic unit-economics view
    * completing the q184 segment mix. Exact micro-cents; both
    * dimensions broadcast; ≤|nations| report rows. */
  def q189NationArpu(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      round(col("o_totalprice") * 100.0d, 0).cast("long").as("cents"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .select(col("n_name"), col("n_customers"), col("n_orders"),
        round(col("cents").cast("double") / 100.0d /
          col("n_customers").cast("double"), 2).as("arpu"))
  }
  val q189Sql: String =
    """WITH j AS (SELECT n.n_name, o.o_custkey,
      |        round(o.o_totalprice * 100.0)::BIGINT AS cents
      |      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |      JOIN nation n ON c.c_nationkey = n.n_nationkey)
      |SELECT n_name, count(DISTINCT o_custkey)::BIGINT AS n_customers,
      |       count(*)::BIGINT AS n_orders,
      |       round(sum(cents)::DOUBLE / 100.0
      |             / count(DISTINCT o_custkey)::DOUBLE, 2) AS arpu
      |FROM j GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q190
  /** Tukey-fence outlier census per event type: values outside
    * [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the box-plot rule next to q85's
    * median/MAD flags (IQR fences are what BI tools draw; MAD is what
    * robust monitors use — publishing both closes the gap): exact
    * quartiles per type broadcast back, one conditional count, ≤|types|
    * rows.
    *
    * Scale caveat (named, not hidden): exact `percentile` over a
    * CONTINUOUS double buffers a per-type (value → count) map whose
    * size tracks the distinct-value count — the inherent cost of the
    * exact tier, fine through sf-scale and single-digit-TB distincts,
    * not at a 100 TB continuous stream. The 100 TB form of this census
    * is the mergeable histogram tier ([[graft.functions.HistSketch]],
    * q125: fences land on bin bounds, state is ≤64 rows per type);
    * this query deliberately publishes the exact BI-tool number and
    * keeps the sketch twin as its scale path. */
  def q190TukeyFences(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      col("value").cast("double").as("v"))
    val q = ev.groupBy(col("event_type"))
      .agg(expr("percentile(v, 0.25)").as("q1"),
        expr("percentile(v, 0.75)").as("q3"),
        count(lit(1)).as("n"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5d)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5d)
    ev.join(broadcast(q), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        sum(when(col("v") < col("lo") || col("v") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("lo")), 4).as("fence_lo"),
        round(max(col("hi")), 4).as("fence_hi"))
      .withColumn("outlier_rate", round(col("n_outliers").cast("double") /
        col("n_events").cast("double"), 6))
  }
  val q190Sql: String =
    """WITH q AS (SELECT event_type,
      |        quantile_cont("value", 0.25) AS q1,
      |        quantile_cont("value", 0.75) AS q3,
      |        count(*)::BIGINT AS n
      |      FROM events GROUP BY 1),
      |f AS (SELECT event_type, n,
      |        q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
      |      FROM q)
      |SELECT e.event_type, max(f.n)::BIGINT AS n_events,
      |       sum(CASE WHEN e."value" < f.lo OR e."value" > f.hi
      |           THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
      |       round(max(f.lo), 4) AS fence_lo,
      |       round(max(f.hi), 4) AS fence_hi,
      |       round(sum(CASE WHEN e."value" < f.lo OR e."value" > f.hi
      |             THEN 1 ELSE 0 END)::DOUBLE / max(f.n)::DOUBLE, 6)
      |         AS outlier_rate
      |FROM events e JOIN f ON e.event_type = f.event_type
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q191
  /** Event-type co-occurrence lift at the SESSION grain — which
    * behaviors happen in the same sitting above chance (the q141
    * market-basket statistic where the basket is a 30-minute session
    * built with the q29 lag+cumsum machinery): per type pair,
    * P(both in session)/(P(a)·P(b)) with session counts exact. The
    * pair expansion runs over per-session distinct-type sets (≤|types|
    * each), never events. */
  def q191SessionLift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val sessions = Tables.events(s, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("event_type"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val present = sessions
      .select(col("user_id"), col("sid"), col("event_type")).distinct()
    val nSessions = present.select(col("user_id"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCounts = present.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = present.as("x").join(present.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.sid") === col("y.sid") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(typeCounts.select(col("event_type").as("ta"),
        col("n_t").as("n_a")), "ta")
      .join(typeCounts.select(col("event_type").as("tb"),
        col("n_t").as("n_b")), "tb")
      .crossJoin(broadcast(nSessions))
      .select(col("ta"), col("tb"), col("n_ab"),
        round(col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
  }
  val q191Sql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |        event_type FROM events),
      |g AS (SELECT *,
      |        CASE WHEN ts_ms - lag(ts_ms) OVER
      |            (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |          IS NULL OR ts_ms - lag(ts_ms) OVER
      |            (PARTITION BY user_id ORDER BY ts_ms, event_id) > 1800000
      |          THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |si AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |          ORDER BY ts_ms, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |       FROM g),
      |p AS (SELECT DISTINCT user_id, sid, event_type FROM si),
      |ns AS (SELECT count(*)::BIGINT AS n_sessions FROM
      |        (SELECT DISTINCT user_id, sid FROM p)),
      |tc AS (SELECT event_type, count(*)::BIGINT AS n_t FROM p GROUP BY 1),
      |pr AS (SELECT x.event_type AS ta, y.event_type AS tb,
      |         count(*)::BIGINT AS n_ab
      |       FROM p x JOIN p y ON x.user_id = y.user_id AND x.sid = y.sid
      |         AND x.event_type < y.event_type
      |       GROUP BY 1, 2)
      |SELECT ta, tb, n_ab,
      |       round(n_ab::DOUBLE * ns.n_sessions::DOUBLE
      |             / (a.n_t::DOUBLE * b.n_t::DOUBLE), 6) AS lift
      |FROM pr JOIN tc a ON pr.ta = a.event_type
      |        JOIN tc b ON pr.tb = b.event_type, ns""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Weekend-vs-weekday value difference with the Welch t-statistic —
    * completes the inferential set (χ² q159, KS q167, Wilson q157, MDE
    * q166) with the two-sample mean test: per event value, is the
    * weekend mean actually different? Exact micro-unit sufficient
    * statistics per side (order-independent partials), the
    * t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂) chain in one defined double
    * expression, |t| > 2.576 ≈ 1% two-sided verdict. */
  def q192WeekendTtest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      (((expr("ts_ms div 86400000") + 3) % 7) >= 5).as("weekend"),
      round(col("value") * 1000000.0d, 0).cast("long").as("vm"))
    val g = ev.groupBy(col("weekend"))
      .agg(count(lit(1)).as("n"),
        sum(col("vm").cast("decimal(38,0)")).as("sv"),
        sum((col("vm").cast("decimal(38,0)") * col("vm"))).as("svv"))
    val wkd = g.filter(!col("weekend"))
      .select(col("n").as("n1"), col("sv").as("s1"), col("svv").as("ss1"))
    val wke = g.filter(col("weekend"))
      .select(col("n").as("n2"), col("sv").as("s2"), col("svv").as("ss2"))
    val j = wkd.crossJoin(wke)
    val m1 = col("s1").cast("double") / col("n1").cast("double")
    val m2 = col("s2").cast("double") / col("n2").cast("double")
    val v1 = (col("ss1").cast("double") / col("n1").cast("double") -
      m1 * m1) / (col("n1").cast("double") - 1.0d) *
      col("n1").cast("double")
    val v2 = (col("ss2").cast("double") / col("n2").cast("double") -
      m2 * m2) / (col("n2").cast("double") - 1.0d) *
      col("n2").cast("double")
    val t = (m1 - m2) / sqrt(v1 / col("n1").cast("double") +
      v2 / col("n2").cast("double"))
    j.select(col("n1").as("n_weekday"), col("n2").as("n_weekend"),
      round(m1 / 1000000.0d, 4).as("mean_weekday"),
      round(m2 / 1000000.0d, 4).as("mean_weekend"),
      round(t, 4).as("t_stat"),
      (abs(round(t, 4)) > 2.576d).as("significant_01"))
  }
  val q192Sql: String =
    """WITH ev AS (SELECT ((epoch_ms(ts) // 86400000 + 3) % 7) >= 5
      |          AS weekend,
      |        round("value" * 1000000.0)::BIGINT AS vm FROM events),
      |g AS (SELECT weekend, count(*)::BIGINT AS n,
      |        sum(vm)::HUGEINT AS sv, sum(vm::HUGEINT * vm)::HUGEINT AS svv
      |      FROM ev GROUP BY 1),
      |j AS (SELECT a.n AS n1, a.sv AS s1, a.svv AS ss1,
      |             b.n AS n2, b.sv AS s2, b.svv AS ss2
      |      FROM g a, g b WHERE NOT a.weekend AND b.weekend)
      |SELECT n1 AS n_weekday, n2 AS n_weekend,
      |  round((s1::DOUBLE / n1::DOUBLE) / 1000000.0, 4) AS mean_weekday,
      |  round((s2::DOUBLE / n2::DOUBLE) / 1000000.0, 4) AS mean_weekend,
      |  round(((s1::DOUBLE / n1::DOUBLE) - (s2::DOUBLE / n2::DOUBLE))
      |    / sqrt(((ss1::DOUBLE / n1::DOUBLE
      |             - (s1::DOUBLE / n1::DOUBLE) * (s1::DOUBLE / n1::DOUBLE))
      |            / (n1::DOUBLE - 1.0) * n1::DOUBLE) / n1::DOUBLE
      |         + ((ss2::DOUBLE / n2::DOUBLE
      |             - (s2::DOUBLE / n2::DOUBLE) * (s2::DOUBLE / n2::DOUBLE))
      |            / (n2::DOUBLE - 1.0) * n2::DOUBLE) / n2::DOUBLE), 4)
      |    AS t_stat,
      |  abs(round(((s1::DOUBLE / n1::DOUBLE) - (s2::DOUBLE / n2::DOUBLE))
      |    / sqrt(((ss1::DOUBLE / n1::DOUBLE
      |             - (s1::DOUBLE / n1::DOUBLE) * (s1::DOUBLE / n1::DOUBLE))
      |            / (n1::DOUBLE - 1.0) * n1::DOUBLE) / n1::DOUBLE
      |         + ((ss2::DOUBLE / n2::DOUBLE
      |             - (s2::DOUBLE / n2::DOUBLE) * (s2::DOUBLE / n2::DOUBLE))
      |            / (n2::DOUBLE - 1.0) * n2::DOUBLE) / n2::DOUBLE), 4))
      |    > 2.576 AS significant_01
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- q193
  /** Discount–quantity correlation: does a deeper discount actually
    * move more units? Exact Pearson r over order lines from integer
    * sufficient statistics (discount in basis points, quantity in
    * units) — the q140 correlation chain on the pricing question. */
  def q193DiscountElasticity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      round(col("l_discount") * 10000.0d, 0).cast("long").as("x"),
      round(col("l_quantity"), 0).cast("long").as("y"))
    val ssum = li.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    ssum.select(col("n").as("n_lines"),
      round(cov / sqrt(vx) / sqrt(vy), 6).as("discount_qty_corr"))
  }
  val q193Sql: String =
    """WITH li AS (SELECT round(l_discount * 10000.0)::BIGINT AS x,
      |        round(l_quantity)::BIGINT AS y FROM lineitem),
      |s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |        sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
      |        sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
      |      FROM li)
      |SELECT n AS n_lines,
      |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |             / sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |             / sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
      |             6) AS discount_qty_corr
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q194
  /** ABC inventory classification: parts ranked by net revenue, class A
    * = the head covering 80% of cumulative revenue, B to 95%, C the
    * tail — the stocking-policy partition every inventory system
    * starts from. Exact micro-cents; the PART frame scales with the
    * catalog, so the descending revenue cumsum runs through
    * [[graft.functions.PrefixScan]] (two-pass partition-prefix sum —
    * never an unpartitioned window) and the total is one broadcast
    * scalar; the final share window runs over the 3-row class frame
    * ([[graft.functions.BoundedWindow]]). Report: per class, part
    * count, revenue share. */
  def q194AbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BoundedWindow, PrefixScan}
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))
        * 100.0d, 0).cast("long")).as("cents"))
    val tot = rev.agg(sum(col("cents")).as("tot"))
    val classified = PrefixScan.scan(rev, -col("cents"),
        Seq(col("cents").desc, col("l_partkey").asc),
        Seq(PrefixScan.RunSum(col("cents"), "cum")), cache = true)
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum") * 100L <= col("tot") * 80L, "A")
          .when(col("cum") * 100L <= col("tot") * 95L, "B")
          .otherwise("C"))
    classified.groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
      .withColumn("revenue_share", round(col("cents").cast("double") /
        sum(col("cents")).over(BoundedWindow.all(col("cents")))
          .cast("double"), 6))
      .select(col("cls"), col("n_parts"),
        round(col("cents").cast("double") / 100.0d, 2).as("revenue"),
        col("revenue_share"))
  }
  val q194Sql: String =
    """WITH rev AS (SELECT l_partkey,
      |        sum(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |            ::BIGINT)::BIGINT AS cents
      |      FROM lineitem GROUP BY 1),
      |c AS (SELECT l_partkey, cents,
      |        sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        sum(cents) OVER () AS tot
      |      FROM rev),
      |k AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
      |             WHEN cum * 100 <= tot * 95 THEN 'B'
      |             ELSE 'C' END AS cls, cents
      |      FROM c)
      |SELECT cls, count(*)::BIGINT AS n_parts,
      |       round(sum(cents)::DOUBLE / 100.0, 2) AS revenue,
      |       round(sum(cents)::DOUBLE / (sum(sum(cents)) OVER ())::DOUBLE, 6)
      |         AS revenue_share
      |FROM k GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q195
  /** Doc-mean vs token-weighted mean quality per source — the Simpson/
    * weighting check an honest corpus report runs: a feed of many short
    * high-quality docs and a few long bad ones looks fine by doc mean
    * and bad by token mass (which is what training actually consumes).
    * Both means from exact micro-unit integer sums in ONE pass;
    * `weighting_gap` names the divergence. */
  def q195WeightingParadox(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = Tables.documents(s, dir).select(col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
      round(TextFunctions.qualityScore(col("text")) * 1000000.0d, 0)
        .cast("long").as("qm"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"),
        sum(col("qm").cast("decimal(38,0)")).as("sq"),
        sum((col("nt") * col("qm")).cast("decimal(38,0)")).as("swq"))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("sq").cast("double") / col("n_docs").cast("double") /
          1000000.0d, 6).as("doc_mean_quality"),
        round(col("swq").cast("double") / col("tokens").cast("double") /
          1000000.0d, 6).as("token_mean_quality"))
      .withColumn("weighting_gap",
        round(col("token_mean_quality") - col("doc_mean_quality"), 6))
  }
  val q195Sql: String = {
    val anyStop = graft.functions.TextFunctions.stopwords.values.flatten
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
       |g AS (SELECT source, count(*)::BIGINT AS n_docs,
       |        sum(nt)::BIGINT AS tokens, sum(qm)::HUGEINT AS sq,
       |        sum(nt::HUGEINT * qm)::HUGEINT AS swq
       |      FROM d GROUP BY 1)
       |SELECT source, n_docs, tokens,
       |       round(sq::DOUBLE / n_docs::DOUBLE / 1000000.0, 6)
       |         AS doc_mean_quality,
       |       round(swq::DOUBLE / tokens::DOUBLE / 1000000.0, 6)
       |         AS token_mean_quality,
       |       round(round(swq::DOUBLE / tokens::DOUBLE / 1000000.0, 6)
       |             - round(sq::DOUBLE / n_docs::DOUBLE / 1000000.0, 6), 6)
       |         AS weighting_gap
       |FROM g""".stripMargin
  }

  // ---------------------------------------------------------------- q196
  /** Naive-seasonal forecast backtest: forecast(day) = GMV(day − 7),
    * scored as MAPE/bias over the backtest window — the baseline any
    * real forecaster must beat, and q156's autocorrelation says how
    * beatable it is. Exact micro-cent daily sums; one lag over the
    * ≤|days| frame; the error aggregate publishes n, MAPE, and mean
    * bias. */
  def q196ForecastBacktest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts_ms div 86400000").as("day"))
      .agg(sum(round(col("value") * 1000000.0d, 0).cast("long")).as("vm"))
    val w = graft.functions.BoundedWindow.orderBy(col("day"), col("day"))
    daily.withColumn("fc", lag(col("vm"), 7).over(w))
      .filter(col("fc").isNotNull)
      .agg(count(lit(1)).as("n_days"),
        round(avg(abs(col("vm") - col("fc")).cast("double") /
          col("vm").cast("double")), 6).as("mape"),
        round(avg((col("fc") - col("vm")).cast("double") /
          col("vm").cast("double")), 6).as("mean_bias"))
  }
  val q196Sql: String =
    """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day,
      |        sum(round("value" * 1000000.0)::BIGINT)::BIGINT AS vm
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |f AS (SELECT day, vm, lag(vm, 7) OVER (ORDER BY day) AS fc FROM d)
      |SELECT count(*)::BIGINT AS n_days,
      |       round(avg(abs(vm - fc)::DOUBLE / vm::DOUBLE), 6) AS mape,
      |       round(avg((fc - vm)::DOUBLE / vm::DOUBLE), 6) AS mean_bias
      |FROM f WHERE fc IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- q197
  /** Daily behavior-mix entropy: the Shannon entropy of the event-type
    * mix per day (maximum ln 5 ≈ 1.609 when all five types are even) —
    * a collapsing entropy means one behavior is taking over before any
    * single-type monitor fires. Counts per (day, type) partial-agg;
    * the share/ln fold runs over the ≤5-row type frame per day;
    * round-6 absorbs ln's sub-ulp. */
  def q197MixEntropy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .groupBy(expr("ts_ms div 86400000").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // Entropy folds left-to-right over the type-sorted ≤5-row frame per
    // day (integer total, then one defined share/ln chain per type) —
    // a partition-order double sum can flip round(·, 6) on a boundary
    // (the q223 r14 flake class); same q135/anovaF fold idiom.
    c.groupBy(col("day"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_types"),
        array_sort(collect_list(struct(col("event_type"), col("n"))))
          .as("a"))
      .select(col("day"), col("n_events"), col("n_types"),
        round(aggregate(col("a"), lit(0.0d), (acc, p) => {
          val share = p.getField("n").cast("double") /
            col("n_events").cast("double")
          acc - share * log(share)
        }), 6).as("mix_entropy"))
  }
  val q197Sql: String =
    """WITH c AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type,
      |        count(*)::BIGINT AS n
      |      FROM events GROUP BY 1, 2),
      |g AS (SELECT day, sum(n)::BIGINT AS n_events,
      |        count(*)::BIGINT AS n_types,
      |        list_sort(list(struct_pack(et := event_type, n := n))) AS a
      |      FROM c GROUP BY 1)
      |SELECT day, n_events, n_types,
      |       round(list_sum(list_transform(a,
      |         p -> -(p.n::DOUBLE / n_events::DOUBLE)
      |              * ln(p.n::DOUBLE / n_events::DOUBLE))), 6)
      |         AS mix_entropy
      |FROM g""".stripMargin

  // ------------------------------------------------------------ registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_forecast_backtest" -> (q196ForecastBacktest _),
    "q197_mix_entropy" -> (q197MixEntropy _),
    "q194_abc_analysis" -> (q194AbcAnalysis _),
    "q195_weighting_paradox" -> (q195WeightingParadox _),
    "q192_weekend_ttest" -> (q192WeekendTtest _),
    "q193_discount_elasticity" -> (q193DiscountElasticity _),
    "q191_session_lift" -> (q191SessionLift _),
    "q189_nation_arpu" -> (q189NationArpu _),
    "q190_tukey_fences" -> (q190TukeyFences _),
    "q186_conversion_by_activity" -> (q186ConversionByActivity _),
    "q187_price_dispersion" -> (q187PriceDispersion _),
    "q188_churn_by_cohort" -> (q188ChurnByCohort _),
    "q184_segment_mix" -> (q184SegmentMix _),
    "q185_activity_histogram" -> (q185ActivityHistogram _),
    "q182_deadstock" -> (q182Deadstock _),
    "q183_gmv_trend" -> (q183GmvTrend _),
    "q179_ushaped_attribution" -> (q179UshapedAttribution _),
    "q180_dispersion_index" -> (q180DispersionIndex _),
    "q181_repeat_interval" -> (q181RepeatInterval _),
    "q176_linear_attribution" -> (q176LinearAttribution _),
    "q177_rich_club" -> (q177RichClub _),
    "q178_pareto_shares" -> (q178ParetoShares _),
    "q174_supplier_hhi" -> (q174SupplierHhi _),
    "q175_ship_aging" -> (q175ShipAging _),
    "q172_basket_curve" -> (q172BasketCurve _),
    "q173_returns_by_discount" -> (q173ReturnsByDiscount _),
    "q170_coverage_gaps" -> (q170CoverageGaps _),
    "q171_jaccard_sweep" -> (q171JaccardSweep _),
    "q168_spend_gini" -> (q168SpendGini _),
    "q169_peak_load" -> (q169PeakLoad _),
    "q167_ks_test" -> (q167KsTest _),
    "q165_new_vs_returning" -> (q165NewVsReturning _),
    "q166_mde_planner" -> (q166MdePlanner _),
    "q163_session_sweep" -> (q163SessionSweep _),
    "q164_dup_topology" -> (q164DupTopology _),
    "q161_survival_km" -> (q161SurvivalKm _),
    "q162_assortativity" -> (q162Assortativity _),
    "q159_contingency_chi2" -> (q159ContingencyChi2 _),
    "q160_theil_sen" -> (q160TheilSen _),
    "q156_seasonality" -> (q156SeasonalityStrength _),
    "q157_conversion_wilson" -> (q157ConversionWilson _),
    "q158_benford_audit" -> (q158BenfordAudit _),
    "q154_lateness_audit" -> (q154LatenessAudit _),
    "q155_redelivery_lag" -> (q155RedeliveryLag _),
    "q152_funnel_latency" -> (q152FunnelLatency _),
    "q153_cohort_ltv" -> (q153CohortLtv _),
    "q151_pit_enrichment" -> (q151PitEnrichment _),
    "q150_quantization_error" -> (q150QuantizationError _),
    "q149_waterfill" -> (q149Waterfill _),
    "q146_cluster_sizes" -> (q146ClusterSizes _),
    "q147_dow_profile" -> (q147DowProfile _),
    "q148_degree_distribution" -> (q148DegreeDistribution _),
    "q145_join_size_est" -> (q145JoinSizeEst _),
    "q144_lsh_tuning" -> (q144LshTuning _),
    "q141_association_rules" -> (q141AssociationRules _),
    "q142_kcore" -> (q142KCore _),
    "q143_interarrival" -> (q143InterArrival _),
    "q138_top_component" -> (q138TopComponent _),
    "q139_dataset_fingerprint" -> (q139DatasetFingerprint _),
    "q140_trend_regression" -> (q140TrendRegression _),
    "q136_anchor_text" -> (q136AnchorText _),
    "q137_ivf_balance" -> (q137IvfBalance _),
    "q131_trigram_search" -> (q131TrigramSearch _),
    "q132_survivorship" -> (q132Survivorship _),
    "q133_skew_advisory" -> (q133SkewAdvisory _),
    "q134_communities" -> (q134Communities _),
    "q135_decayed_counters" -> (q135DecayedCounters _),
    "q124_triangles" -> (q124Triangles _),
    "q125_hist_percentiles" -> (q125HistPercentiles _),
    "q126_fd_audit" -> (q126FdAudit _),
    "q127_pmi_collocations" -> (q127PmiCollocations _),
    "q128_compaction_plan" -> (q128CompactionPlan _),
    "q129_embedding_drift" -> (q129EmbeddingDrift _),
    "q130_neighbor_lsh" -> (q130NeighborLsh _)
  )

  val oracles: Map[String, String] = Map(
    "q196_forecast_backtest" -> q196Sql,
    "q197_mix_entropy" -> q197Sql,
    "q194_abc_analysis" -> q194Sql,
    "q195_weighting_paradox" -> q195Sql,
    "q192_weekend_ttest" -> q192Sql,
    "q193_discount_elasticity" -> q193Sql,
    "q191_session_lift" -> q191Sql,
    "q189_nation_arpu" -> q189Sql,
    "q190_tukey_fences" -> q190Sql,
    "q186_conversion_by_activity" -> q186Sql,
    "q187_price_dispersion" -> q187Sql,
    "q188_churn_by_cohort" -> q188Sql,
    "q184_segment_mix" -> q184Sql,
    "q185_activity_histogram" -> q185Sql,
    "q182_deadstock" -> q182Sql,
    "q183_gmv_trend" -> q183Sql,
    "q179_ushaped_attribution" -> q179Sql,
    "q180_dispersion_index" -> q180Sql,
    "q181_repeat_interval" -> q181Sql,
    "q176_linear_attribution" -> q176Sql,
    "q177_rich_club" -> q177Sql,
    "q178_pareto_shares" -> q178Sql,
    "q174_supplier_hhi" -> q174Sql,
    "q175_ship_aging" -> q175Sql,
    "q172_basket_curve" -> q172Sql,
    "q173_returns_by_discount" -> q173Sql,
    "q170_coverage_gaps" -> q170Sql,
    "q171_jaccard_sweep" -> q171Sql,
    "q168_spend_gini" -> q168Sql,
    "q169_peak_load" -> q169Sql,
    "q167_ks_test" -> q167Sql,
    "q165_new_vs_returning" -> q165Sql,
    "q166_mde_planner" -> q166Sql,
    "q163_session_sweep" -> q163Sql,
    "q164_dup_topology" -> q164Sql,
    "q161_survival_km" -> q161Sql,
    "q162_assortativity" -> q162Sql,
    "q159_contingency_chi2" -> q159Sql,
    "q160_theil_sen" -> q160Sql,
    "q156_seasonality" -> q156Sql,
    "q157_conversion_wilson" -> q157Sql,
    "q158_benford_audit" -> q158Sql,
    "q154_lateness_audit" -> q154Sql,
    "q155_redelivery_lag" -> q155Sql,
    "q152_funnel_latency" -> q152Sql,
    "q153_cohort_ltv" -> q153Sql,
    "q151_pit_enrichment" -> q151Sql,
    "q150_quantization_error" -> q150Sql,
    "q149_waterfill" -> q149Sql,
    "q146_cluster_sizes" -> q146Sql,
    "q147_dow_profile" -> q147Sql,
    "q148_degree_distribution" -> q148Sql,
    "q145_join_size_est" -> q145Sql,
    "q144_lsh_tuning" -> q144Sql,
    "q141_association_rules" -> q141Sql,
    "q142_kcore" -> q142Sql,
    "q143_interarrival" -> q143Sql,
    "q138_top_component" -> q138Sql,
    "q139_dataset_fingerprint" -> q139Sql,
    "q140_trend_regression" -> q140Sql,
    "q136_anchor_text" -> q136Sql,
    "q137_ivf_balance" -> q137Sql,
    "q131_trigram_search" -> q131Sql,
    "q132_survivorship" -> q132Sql,
    "q133_skew_advisory" -> q133Sql,
    "q134_communities" -> q134Sql,
    "q135_decayed_counters" -> q135Sql,
    "q124_triangles" -> q124Sql,
    "q125_hist_percentiles" -> q125Sql,
    "q126_fd_audit" -> q126Sql,
    "q127_pmi_collocations" -> q127Sql,
    "q128_compaction_plan" -> q128Sql,
    "q129_embedding_drift" -> q129Sql,
    "q130_neighbor_lsh" -> q130Sql
  )
}
