package graft

import graft.functions.{ExactSubstrings, RobustStats, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 training-data-pipeline operators (q82–q101): cluster-scoped
  * semantic dedup (SemDeDup), Johnson–Lindenstrauss sketch ANN, quantile
  * feature binning, median/MAD robust outliers, character-grain exact
  * duplicated-substring spans, cluster-balanced sampling, containment
  * pairs, trailing-median spike detection, vocabulary coverage,
  * embedding moments, cross-source duplicate mass, ANN MRR, PSI snapshot
  * drift, hard-negative mining, incremental snapshot diff, distinct-n
  * diversity, TF-IDF sparse cosine, leakage-safe group split, and the
  * hourly ingest dedup-rate. Same contract as [[QueriesExt]]: every
  * query has a DuckDB oracle that replays the full operator chain
  * value-for-value (integer/string arithmetic, deterministic double
  * folds, rounded ranking keys). */
object QueriesExt2 {
  import QueriesExt.{cosSql, docs, docsSample, embs, l2SqlOf, withInjectedNearDups}

  // ---------------------------------------------------------------- q82
  /** SemDeDup (Abbas et al. 2023) — [[Similarity.semDedup]]: embeddings
    * (plus q32/q52's injected near-dup copies, so duplicate groups
    * exist) assign to their nearest of 8 seed centroids by the rounded
    * L2 argmin kernel; near-dup pairs form WITHIN cells only (one
    * equi-join on the cell id — the cluster bound is what separates this
    * from q52's global banded-LSH sweep); components collapse chains;
    * each group keeps its LEAST-prototypical member (lowest cosine to
    * the centroid — the paper's keep rule), ties to the lower id. */
  def q82SemDedup(s: SparkSession, dir: String): DataFrame = {
    val centroids = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).map(_._2).toSeq
    Similarity.semDedup(withInjectedNearDups(s, dir), centroids, threshold = 0.9,
      driverMaxEdges = 1L << 20) // bounded sample input: fast path opt-in
  }
  val q82Sql: String =
    s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT vec_id + 1000000 AS vec_id, [v[1] + 0.25] || v[2:64] AS v
       |      FROM e WHERE vec_id % 17 = 0),
       |u AS (SELECT * FROM e UNION ALL SELECT * FROM d),
       |c AS (SELECT vec_id::INT AS cid, v AS cv FROM e WHERE vec_id < 8),
       |a AS (SELECT vec_id, v, cell FROM (
       |    SELECT u.vec_id, u.v, c.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY u.vec_id
       |             ORDER BY round(${l2SqlOf("u.v", "c.cv")}, 6), c.cid) AS rn
       |    FROM u, c) WHERE rn = 1),
       |cs AS (SELECT a.vec_id, a.cell, a.v,
       |         round(${cosSql("a.v", "c.cv")}, 6) AS cent_sim
       |       FROM a JOIN c ON c.cid = a.cell),
       |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |      FROM cs x JOIN cs y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |      WHERE ${cosSql("x.v", "y.v")} >= 0.9),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM p
       |       UNION SELECT id_b, id_a FROM p),
       |reach(id, comp) AS (
       |  SELECT src, src FROM ed
       |  UNION
       |  SELECT ed.dst, r.comp FROM reach r JOIN ed ON ed.src = r.id),
       |cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
       |f AS (SELECT cs.vec_id, cs.cell, cs.cent_sim,
       |        coalesce(cc.component, cs.vec_id) AS component
       |      FROM cs LEFT JOIN cc ON cc.id = cs.vec_id)
       |SELECT vec_id, cell, cent_sim, component,
       |       (ROW_NUMBER() OVER (PARTITION BY component
       |          ORDER BY cent_sim NULLS LAST, vec_id)) = 1 AS keep
       |FROM f""".stripMargin

  // ---------------------------------------------------------------- q83
  /** Johnson–Lindenstrauss sketch ANN ([[Similarity.jlTopK]]): 64-dim
    * float vectors reduce to 16 deterministic ±1-plane projections in
    * the scan; the Q×N candidate pass ranks by squared L2 in the reduced
    * space (4× fewer bytes per row than raw), keeps a 30-deep shortlist
    * per query, and only those rejoin their raw vectors for the exact
    * cosine top-10 — the dimensionality-reduction tier next to the
    * quantization tiers (PQ q59, SQ8 q68). */
  private val jlPlanes: Seq[Seq[Int]] = Similarity.deterministicPlanes(16, 64)
  private def jlPlaneSql(j: Int): String =
    jlPlanes(j).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
  private def jlProjSql(v: String, j: Int): String =
    s"list_sum(list_transform(list_zip($v, ${jlPlaneSql(j)}), x -> x[1] * x[2]))"
  def q83JlAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.jlTopK(e.filter(col("vec_id") < 8), e, k = 10,
      planes = jlPlanes, shortlist = 30)
  }
  val q83Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |rp AS (SELECT vec_id,
       |         [${(0 until 16).map(j => jlProjSql("v", j)).mkString(",\n       |          ")}] AS rv
       |       FROM e),
       |sh AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |           ORDER BY round(${l2SqlOf("q.rv", "c.rv")}, 6), c.vec_id) AS srank
       |       FROM rp q JOIN rp c ON q.vec_id <> c.vec_id
       |       WHERE q.vec_id < 8),
       |cand AS (SELECT query_id, neighbor_id FROM sh WHERE srank <= 30),
       |s AS (SELECT query_id, neighbor_id,
       |        round(${cosSql("qe.v", "ne.v")}, 6) AS sim
       |      FROM cand
       |      JOIN e qe ON qe.vec_id = cand.query_id
       |      JOIN e ne ON ne.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, rank, sim FROM (
       |  SELECT query_id, neighbor_id, sim,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM s) WHERE rank <= 10""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Equal-frequency length binning ([[RobustStats.withQuantileBin]]):
    * quartile boundaries of `n_chars` (ONE exact-percentile row,
    * broadcast back) bin every document 0–3 — the distribution-tracking
    * complement of q50's fixed-constant gates. Exact `percentile`
    * interpolates `(n-1)p` between sorted integers, the same convention
    * as DuckDB `quantile_cont`, so boundaries replay bit-for-bit. */
  def q84QuantileBins(s: SparkSession, dir: String): DataFrame =
    RobustStats.withQuantileBin(
      docs(s, dir).select(col("doc_id"), col("n_chars")),
      "n_chars", Seq(0.25, 0.5, 0.75))
  val q84Sql: String =
    s"""WITH b AS (SELECT quantile_cont(n_chars, 0.25) AS b1,
       |                  quantile_cont(n_chars, 0.5)  AS b2,
       |                  quantile_cont(n_chars, 0.75) AS b3 FROM documents)
       |SELECT doc_id, n_chars,
       |       (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END) +
       |       (CASE WHEN n_chars > b2 THEN 1 ELSE 0 END) +
       |       (CASE WHEN n_chars > b3 THEN 1 ELSE 0 END) AS bin
       |FROM documents CROSS JOIN b""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Per-source median/MAD outlier flags ([[RobustStats.madOutliers]]):
    * a document is a length outlier within its source when its absolute
    * deviation from the source median exceeds 3 robust sigmas
    * (MAD × 1.4826) — the robust z-score whose cut-point the outliers
    * themselves cannot drag, unlike mean/stddev (qa11's winsorize
    * complement). Two grouped exact medians, each a broadcast back. */
  def q85MadOutliers(s: SparkSession, dir: String): DataFrame =
    RobustStats.madOutliers(
      docs(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
      "n_chars", Seq("source"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med"), col("mad"), col("dev"), col("is_outlier"))
  val q85Sql: String =
    s"""WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
       |           FROM documents GROUP BY 1),
       |dv AS (SELECT doc_id, d0.source, n_chars, med,
       |         abs(n_chars - med) AS dev
       |       FROM documents d0 JOIN m USING (source)),
       |md AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY 1)
       |SELECT doc_id, dv.source, n_chars, med, mad, dev,
       |       dev > 3 * 1.4826 * mad AS is_outlier
       |FROM dv JOIN md USING (source)""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Exact duplicated-substring spans ([[ExactSubstrings
    * .duplicateSpans]], the Lee et al. 2021 ExactSubstr shape at L=20
    * char grain): every 20-char window occurring more than once in the
    * 10% sample marks its post-first occurrences, and contiguous marked
    * positions merge into maximal cut spans per document. Only (hash,
    * doc, pos) longs ever shuffle — the text stays in its scan. */
  def q86SubstringSpans(s: SparkSession, dir: String): DataFrame =
    ExactSubstrings.duplicateSpans(docsSample(s, dir), "text", "doc_id", L = 20)
      .withColumnRenamed("id", "doc_id")
  val q86Sql: String = {
    def mid(c: String) = s"('0x' || substring(md5($c), 1, 15))::BIGINT"
    s"""WITH dd AS (SELECT doc_id, text FROM documents
       |            WHERE doc_id % 10 = 0 AND length(text) >= 20),
       |ps AS (SELECT doc_id, text,
       |         unnest(range(1, length(text) - 18)) AS pos FROM dd),
       |g AS (SELECT doc_id, pos,
       |        ${mid("substring(text, pos, 20)")} AS h FROM ps),
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
       |SELECT doc_id, span, min(pos) AS span_start, max(e) AS span_end,
       |       max(e) - min(pos) + 1 AS span_len
       |FROM sp GROUP BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  /** Cluster-balanced diversity sampling: assign embeddings to their
    * nearest seed centroid (the q82/q70 argmin kernel, in the scan) and
    * keep at most 15 per cell in deterministic md5 order
    * ([[graft.functions.Mixture.capPerGroup]] — the q47 domain cap
    * applied to SEMANTIC cells). The downsampling step that preserves
    * coverage of the embedding space where a uniform sample keeps the
    * head clusters' redundancy; WindowGroupLimit bounds every cell
    * before any exchange. */
  def q87ClusterSample(s: SparkSession, dir: String): DataFrame = {
    val centroids = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).map(_._2).toSeq
    val assigned = embs(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell",
        element_at(Similarity.pqCodes(col("v"), Seq(centroids)), 1))
      .select(col("vec_id"), col("cell"))
    graft.functions.Mixture.capPerGroup(assigned, "cell", "vec_id", k = 15)
  }
  val q87Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id::INT AS cid, v AS cv FROM e WHERE vec_id < 8),
       |a AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY round(${l2SqlOf("e.v", "c.cv")}, 6), c.cid) AS rn
       |    FROM e, c) WHERE rn = 1)
       |SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell
       |    ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
       |             vec_id) AS rk
       |  FROM a) WHERE rk <= 15""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Containment near-dup pairs ([[graft.functions.DedupFunctions
    * .containmentPairs]], Broder '97): the asymmetric overlap
    * c_a = |A∩B|/|A| that catches subset duplication — a doc quoted or
    * embedded inside a larger one scores ≈1 while its Jaccard stays
    * under any sane threshold. Same shingle-equi-join candidates as q15
    * (uncapped here so the oracle replays; production keeps the q35
    * frequency valve). */
  def q88ContainmentPairs(s: SparkSession, dir: String): DataFrame =
    graft.functions.DedupFunctions.containmentPairs(
      docsSample(s, dir), "text", "doc_id",
      n = 2, threshold = 0.1,
      cap = graft.functions.DedupFunctions.ShingleCap.Uncapped)
  val q88Sql: String =
    s"""WITH ${QueriesExt.shingleCteSql},
       |e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t),
       |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared,
       |             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
       |      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       round(shared::DOUBLE / n_a, 6) AS c_a,
       |       round(shared::DOUBLE / n_b, 6) AS c_b
       |FROM j
       |WHERE greatest(shared::DOUBLE / n_a, shared::DOUBLE / n_b) >= 0.1""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Trailing-median spike detection ([[RobustStats
    * .trailingMedianSpikes]]): per user, each event's baseline is the
    * exact median of its previous 12 values (current row excluded) and
    * it flags when value > 2× baseline — the robust streaming-monitor
    * rule a mean-based detector fails (a spike drags the mean, not the
    * median). ONE window over one user exchange; the frame is bounded
    * at 12 rows regardless of history length. */
  def q89MedianSpikes(s: SparkSession, dir: String): DataFrame =
    RobustStats.trailingMedianSpikes(
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("ts_ms"), col("value")),
      "value", Seq("user_id"), Seq(col("ts_ms"), col("event_id")),
      lookback = 12, factor = 2.0)
  val q89Sql: String =
    s"""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
       |       quantile_cont(value, 0.5) OVER (PARTITION BY user_id
       |         ORDER BY epoch_ms(ts), event_id
       |         ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS baseline,
       |       coalesce(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
       |         ORDER BY epoch_ms(ts), event_id
       |         ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) IS NOT NULL
       |         AND value > 2.0 * quantile_cont(value, 0.5) OVER (
       |           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
       |           ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING), false) AS is_spike
       |FROM events""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Vocabulary coverage curve ([[graft.functions.Relevance
    * .vocabCoverage]]): the fraction of all token occurrences the top-k
    * types cover, for k ∈ {10, 100, 1000} — the statistic a
    * tokenizer/vocab-size decision starts from. Counts partially
    * aggregate map-side; the rank window and per-k sums run over the
    * vocabulary-sized count table, never the corpus. */
  def q90VocabCoverage(s: SparkSession, dir: String): DataFrame =
    graft.functions.Relevance.vocabCoverage(docs(s, dir), "text",
      ks = Seq(10, 100, 1000))
  val q90Sql: String =
    s"""WITH tok AS (SELECT unnest(${QueriesExt.toksSql}) AS term FROM documents),
       |c AS (SELECT term, count(*)::BIGINT AS cnt FROM tok
       |      WHERE length(term) > 0 GROUP BY 1),
       |r AS (SELECT term, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
       |      FROM c),
       |t AS (SELECT sum(cnt)::BIGINT AS total FROM r),
       |kk AS (SELECT unnest([10, 100, 1000])::INT AS k)
       |SELECT kk.k, sum(r.cnt)::BIGINT AS covered, any_value(t.total) AS total,
       |       round(sum(r.cnt)::DOUBLE / any_value(t.total), 6) AS coverage
       |FROM r JOIN kk ON r.rk <= kk.k CROSS JOIN t
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Per-dimension embedding moments ([[Similarity.embeddingMoments]]):
    * (n, Σx, Σx²) per dimension in exact micro-unit longs (one corpus
    * pass, 64-row aggregate, order-independent partials), with mean and
    * variance derived through one defined division chain — the
    * dead-dimension / bad-normalization health check run before
    * trusting the space for ANN or semantic dedup. */
  def q91EmbeddingMoments(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingMoments(embs(s, dir))
  val q91Sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ds AS (SELECT unnest(range(1, 65))::INT AS i),
       |x AS (SELECT ds.i AS dim, round(e.v[ds.i] * 1000000)::BIGINT AS xi
       |      FROM e, ds),
       |g AS (SELECT dim, count(*)::BIGINT AS n, sum(xi)::DOUBLE AS s1,
       |             sum(xi * xi)::DOUBLE AS s2
       |      FROM x GROUP BY 1)
       |SELECT dim, n, s1, s2,
       |       round((s1::DOUBLE / n) / 1000000.0, 6) AS mean,
       |       round(((s2::DOUBLE / n) - (s1::DOUBLE / n) * (s1::DOUBLE / n))
       |             / 1000000000000.0, 6) AS variance
       |FROM g""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Cross-source duplicate-mass matrix ([[graft.functions
    * .DedupFunctions.sourceOverlapMatrix]]): per source pair, the count
    * of shared canonical fingerprints — which source mirrors which, the
    * planning table a corpus dedup campaign starts from. The corpus has
    * no natural exact dups, so the query injects a deterministic
    * `mirror` source (every doc_id % 13 = 0 copied verbatim) that the
    * operator must attribute exactly. */
  def q93SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"), col("source"))
    val mirrored = Tables.documents(s, dir).filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        lit("mirror").as("source"))
    graft.functions.DedupFunctions.sourceOverlapMatrix(
      base.unionByName(mirrored), "text", "source")
  }
  val q93Sql: String =
    s"""WITH u AS (SELECT doc_id, text, source FROM documents
       |           UNION ALL
       |           SELECT doc_id + 1000000, text, 'mirror' FROM documents
       |           WHERE doc_id % 13 = 0),
       |f AS (SELECT DISTINCT
       |        md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
       |        source
       |      FROM u)
       |SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS shared_docs
       |FROM f a JOIN f b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q94
  /** ANN MRR eval: mean reciprocal rank of the TRUE nearest neighbor
    * (q17's exact top-1) inside each approximate tier's top-10 — the
    * serving metric next to q63's recall. Reciprocal ranks integerize
    * to exact micro-units (1000000 div rank) so the mean is an
    * order-independent integer sum (the q64 pattern); a tier that
    * drops the true NN contributes 0. Tiers: SQ8 (q68) and the JL
    * sketch (q83). */
  def q94AnnMrr(s: SparkSession, dir: String): DataFrame = {
    val nn = QueriesExt.q17AnnCosine(s, dir).filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("nn"))
    def mrrOf(tier: DataFrame, name: String): DataFrame =
      nn.join(
          tier.select(col("query_id").as("tq"), col("neighbor_id").as("tn"),
            col("rank")),
          col("query_id") === col("tq") && col("nn") === col("tn"), "left")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(expr("1000000 div rank"), lit(0L))).as("rrsum"))
        .select(lit(name).as("tier"), col("n"),
          round((col("rrsum").cast("double") / col("n")) / lit(1000000.0), 6)
            .as("mrr"))
    mrrOf(QueriesExt.q68SqAnn(s, dir), "sq8")
      .unionByName(mrrOf(q83JlAnn(s, dir), "jl"))
  }
  val q94Sql: String = {
    def tierCte(name: String, sql: String): String =
      s"""$name AS (SELECT ex.query_id,
         |    max(CASE WHEN t.neighbor_id = ex.nn THEN 1000000 // t.rank END) AS rr0
         |  FROM ex LEFT JOIN (SELECT query_id, neighbor_id, rank FROM ($sql)) t
         |    ON t.query_id = ex.query_id AND t.neighbor_id = ex.nn
         |  GROUP BY 1)""".stripMargin
    s"""WITH ex AS (SELECT query_id, neighbor_id AS nn
       |            FROM (${QueriesExt.q17Sql}) WHERE rank = 1),
       |${tierCte("m_sq", QueriesExt.q68Sql)},
       |${tierCte("m_jl", q83Sql)}
       |SELECT 'sq8' AS tier, count(*)::BIGINT AS n,
       |       round((sum(coalesce(rr0, 0))::DOUBLE / count(*)) / 1000000.0, 6) AS mrr
       |FROM m_sq
       |UNION ALL
       |SELECT 'jl', count(*)::BIGINT,
       |       round((sum(coalesce(rr0, 0))::DOUBLE / count(*)) / 1000000.0, 6)
       |FROM m_jl""".stripMargin
  }

  // ---------------------------------------------------------------- q95
  /** PSI drift between corpus snapshots ([[RobustStats.psiDrift]]): the
    * even-doc_id half is the reference feed; the odd half, with a
    * deterministic +20% length drift (`n_chars + n_chars div 5` — the
    * simulated re-crawl that started returning longer pages), is the
    * current one. Both bin by the REFERENCE's quartile boundaries; per
    * bin PSI = (cur% − ref%)·ln(cur%/ref%). Σ > 0.25 is the
    * conventional retrain/investigate trigger for a corpus feed. */
  def q95PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    val ref = d.filter(col("doc_id") % 2 === 0)
    val cur = d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        (col("n_chars") + expr("n_chars div 5")).as("n_chars"))
    RobustStats.psiDrift(ref, cur, "n_chars")
  }
  val q95Sql: String =
    s"""WITH b AS (SELECT quantile_cont(n_chars, 0.25) AS b1,
       |                  quantile_cont(n_chars, 0.5)  AS b2,
       |                  quantile_cont(n_chars, 0.75) AS b3
       |           FROM documents WHERE doc_id % 2 = 0),
       |r AS (SELECT (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END) +
       |             (CASE WHEN n_chars > b2 THEN 1 ELSE 0 END) +
       |             (CASE WHEN n_chars > b3 THEN 1 ELSE 0 END) AS bin
       |      FROM documents CROSS JOIN b WHERE doc_id % 2 = 0),
       |cu AS (SELECT (CASE WHEN v > b1 THEN 1 ELSE 0 END) +
       |              (CASE WHEN v > b2 THEN 1 ELSE 0 END) +
       |              (CASE WHEN v > b3 THEN 1 ELSE 0 END) AS bin
       |       FROM (SELECT n_chars + n_chars // 5 AS v FROM documents
       |             WHERE doc_id % 2 = 1) CROSS JOIN b),
       |rc AS (SELECT bin, count(*)::BIGINT AS ref_n FROM r GROUP BY 1),
       |cc AS (SELECT bin, count(*)::BIGINT AS cur_n FROM cu GROUP BY 1),
       |j AS (SELECT coalesce(rc.bin, cc.bin) AS bin,
       |             coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
       |      FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
       |t AS (SELECT bin, ref_n, cur_n,
       |             ref_n::DOUBLE / sum(ref_n) OVER () AS rf,
       |             cur_n::DOUBLE / sum(cur_n) OVER () AS cf
       |      FROM j)
       |SELECT bin, ref_n, cur_n, round(rf, 6) AS ref_frac,
       |       round(cf, 6) AS cur_frac,
       |       round(CASE WHEN ref_n > 0 AND cur_n > 0
       |                  THEN (cf - rf) * ln(cf / rf) END, 6) AS psi
       |FROM t""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Hard-negative mining ([[Similarity.hardNegativesTopK]]): for each
    * query vector, the 5 most-cosine-similar corpus vectors with a
    * DIFFERENT label — the near-miss negatives a contrastive retriever
    * trains against (random negatives carry no gradient). q17's exact
    * broadcast-scan plan with the label-mismatch predicate applied
    * before the per-query top-k window. */
  def q96HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.hardNegativesTopK(e.filter(col("vec_id") < 8), e, k = 5)
  }
  val q96Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS nid, label AS cl, embedding::DOUBLE[] AS cv
       |      FROM embeddings),
       |s AS (SELECT qid, nid,
       |        ${cosSql("qv", "cv")} AS sim
       |      FROM q, c WHERE qid <> nid AND cl <> ql)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT qid AS query_id, nid AS neighbor_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY sim DESC, nid) AS INTEGER) AS rank
       |  FROM s) WHERE rank <= 5""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Incremental-ingest snapshot diff ([[graft.operators.SnapshotDiff]]):
    * yesterday's crawl (doc_id % 10 ≠ 9) vs today's (doc_id % 10 ≠ 0,
    * with every doc_id % 7 = 0 page deterministically re-edited) →
    * per-key added / removed / changed / unchanged. The O(delta)
    * planning row an incremental re-embed/re-dedup pipeline starts
    * from; fingerprints compare in the scan, text never joins. */
  def q97SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val old = d.filter(col("doc_id") % 10 =!= 9)
    val cur = d.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [edited v2]")))
          .otherwise(col("text")).as("text"))
    graft.operators.SnapshotDiff.diff(old, cur, "doc_id", "text")
  }
  val q97Sql: String =
    s"""WITH o AS (SELECT doc_id,
       |             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
       |           FROM documents WHERE doc_id % 10 <> 9),
       |c AS (SELECT doc_id,
       |        md5(regexp_replace(trim(lower(
       |          CASE WHEN doc_id % 7 = 0 THEN text || ' [edited v2]'
       |               ELSE text END)), '\\s+', ' ', 'g')) AS fp
       |      FROM documents WHERE doc_id % 10 <> 0)
       |SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
       |       CASE WHEN o.doc_id IS NULL THEN 'added'
       |            WHEN c.doc_id IS NULL THEN 'removed'
       |            WHEN o.fp <> c.fp THEN 'changed'
       |            ELSE 'unchanged' END AS change
       |FROM o FULL OUTER JOIN c ON o.doc_id = c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Distinct-n corpus diversity ([[graft.functions.Relevance
    * .distinctNgramRatio]]): per source, distinct word trigrams over
    * total trigram occurrences — the corpus-grain template/boilerplate
    * detector (a content farm's ratio collapses while every individual
    * page passes q27's within-doc repetition gate). */
  def q98DistinctNgrams(s: SparkSession, dir: String): DataFrame =
    graft.functions.Relevance.distinctNgramRatio(
      docs(s, dir).select(col("source"), col("text")), "text", "source", n = 3)
  val q98Sql: String =
    s"""WITH g AS (SELECT source,
       |             unnest([x[i] || ' ' || x[i+1] || ' ' || x[i+2]
       |                     for i in range(1, len(x) - 1)]) AS gram
       |           FROM (SELECT source, ${QueriesExt.toksSql} AS x
       |                 FROM documents)),
       |o AS (SELECT source, gram, count(*) AS occ FROM g GROUP BY 1, 2)
       |SELECT source, count(*)::BIGINT AS distinct_ngrams,
       |       sum(occ)::BIGINT AS total_ngrams,
       |       round(count(*)::DOUBLE / sum(occ), 6) AS distinct_ratio
       |FROM o GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Sparse TF-IDF cosine pairs ([[graft.functions.Relevance
    * .tfidfCosinePairs]]): the model-free text-vector near-dup tier
    * between shingle Jaccard (q15) and embedding cosine (q32) — tf·idf
    * weights, pairs meeting through a shared-term equi-join, dot
    * products and norms as order-independent micro-unit integer sums
    * (the q64 pattern). */
  def q99TfidfCosine(s: SparkSession, dir: String): DataFrame =
    graft.functions.Relevance.tfidfCosinePairs(
      docsSample(s, dir), "text", "doc_id", threshold = 0.75)
  val q99Sql: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |tok AS (SELECT doc_id AS id, unnest(${QueriesExt.toksSql}) AS term FROM d),
       |tf AS (SELECT id, term, count(*)::BIGINT AS tf FROM tok
       |       WHERE len(term) > 0 GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM d),
       |w AS (SELECT id, term,
       |        tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE) AS w
       |      FROM tf JOIN dfq USING (term) CROSS JOIN nn),
       |nrm AS (SELECT id,
       |          sqrt(sum(CAST(round(w * w * 1000000) AS BIGINT))::DOUBLE
       |               / 1000000) AS nrm
       |        FROM w GROUP BY 1),
       |dots AS (SELECT a.id AS id_a, b.id AS id_b,
       |           sum(CAST(round(a.w * b.w * 1000000) AS BIGINT)) AS dot_micro
       |         FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
       |         GROUP BY 1, 2)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT id_a, id_b,
       |         round((dot_micro::DOUBLE / 1000000) / (na.nrm * nb.nrm), 6)
       |           AS cosine
       |  FROM dots JOIN nrm na ON na.id = dots.id_a
       |            JOIN nrm nb ON nb.id = dots.id_b)
       |WHERE cosine >= 0.75""".stripMargin

  // ---------------------------------------------------------------- q100
  /** Leakage-safe group split ([[graft.functions.Splits
    * .withGroupSplit]]): split assignment is a function of the SOURCE,
    * so a domain's near-identical pages can never straddle train/eval —
    * the structural guard that doc-level hash splits (q25) lack and
    * decontamination sweeps (q26) then have to hunt. Output is the
    * balance dashboard the group split obligates: per split, how many
    * sources and documents landed there. */
  def q100GroupSplit(s: SparkSession, dir: String): DataFrame =
    graft.functions.Splits.withGroupSplit(
        docs(s, dir).select(col("doc_id"), col("source")), "source")
      .groupBy("split")
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"))
  val q100Sql: String =
    s"""SELECT CASE WHEN substring(md5(source), 1, 1) < 'c' THEN 'train'
       |            WHEN substring(md5(source), 1, 1) < 'e' THEN 'val'
       |            ELSE 'test' END AS split,
       |       count(DISTINCT source)::BIGINT AS n_sources,
       |       count(*)::BIGINT AS n_docs
       |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q101
  /** Hourly ingest dedup-rate dashboard: per hour, how many events are
    * payload-identical re-deliveries (same user/type/value — the
    * at-least-once delivery health metric an ingest SLO watches; a
    * rate step-change means a producer started retrying). One hash
    * aggregate per hour bucket; the distinct count partial-aggregates
    * on (hour, payload) before the hour rollup. */
  def q101DedupRate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id"), col("event_type"), col("value"))
          .as("n_distinct"))
      .select(col("hour"), col("n_events"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_events"), 6)
          .as("dup_rate"))
  val q101Sql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
      |       count(*) AS n_events,
      |       count(DISTINCT (user_id, event_type, "value")) AS n_distinct,
      |       round(1.0 - count(DISTINCT (user_id, event_type, "value"))::DOUBLE
      |             / count(*), 6) AS dup_rate
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q102
  /** MinHash-LSH dedup recall ([[graft.functions.DedupFunctions
    * .minhashLshPairs]] under evaluation): plant one high-Jaccard
    * near-dup per sampled document (a 5-word suffix edit), run the q14
    * tier over base ∪ planted, and measure the fraction of planted
    * pairs it recovers — the dedup-campaign acceptance metric next to
    * the ANN tiers' recall (q63) and MRR (q94). The banding theory says
    * a ≈0.95-Jaccard pair escapes a 16-band/2-row scheme with
    * probability (1−J²)¹⁶ ≈ 10⁻¹⁶ — recall prints 1.0, and a
    * regression in shingling/banding/verify breaks it loudly. */
  def q102LshRecall(s: SparkSession, dir: String): DataFrame = {
    val base = docsSample(s, dir).select(col("doc_id"), col("text"))
    val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" graft planted near dup suffix")).as("text"))
    val found = graft.functions.DedupFunctions.minhashLshPairs(
      base.unionByName(planted), "text", "doc_id",
      n = 2, numHashes = 32, bands = 16, threshold = 0.05, portable = true)
    base.select(col("doc_id").as("pid"), (col("doc_id") + 1000000L).as("did"))
      .join(found, col("id_a") === col("pid") && col("id_b") === col("did"),
        "left")
      .agg(count(lit(1)).as("n_planted"), count(col("id_a")).as("n_found"))
      .select(col("n_planted"), col("n_found"),
        round(col("n_found").cast("double") / col("n_planted"), 6).as("recall"))
  }
  val q102Sql: String = {
    val tCte =
      s"""u AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
         |      UNION ALL
         |      SELECT doc_id + 1000000, text || ' graft planted near dup suffix'
         |      FROM documents WHERE doc_id % 10 = 0),
         |t AS (SELECT doc_id,
         |        list_distinct([x[i] || ' ' || x[i+1] for i in range(1, len(x))]) AS sh
         |      FROM (SELECT doc_id, ${QueriesExt.toksSql} AS x FROM u))""".stripMargin
    s"""SELECT count(*)::BIGINT AS n_planted,
       |       count(f.id_a)::BIGINT AS n_found,
       |       round(count(f.id_a)::DOUBLE / count(*), 6) AS recall
       |FROM (SELECT doc_id AS pid, doc_id + 1000000 AS did
       |      FROM documents WHERE doc_id % 10 = 0) p
       |LEFT JOIN (${QueriesExt.minhashChainSql(tCte)}) f
       |  ON f.id_a = p.pid AND f.id_b = p.did""".stripMargin
  }

  // ---------------------------------------------------------------- q103
  /** Per-source PSI drift ([[RobustStats.psiDriftByGroup]]): q95's
    * drifted-snapshot setup, but each source binned by ITS OWN
    * reference quartiles — the dashboard that NAMES the drifting feed
    * a global PSI averages away. Only sources whose id ends in 3 get
    * the planted +20% length drift; at this SF each feed's half is
    * ~12 docs, so undrifted feeds carry visible small-sample PSI noise
    * (the dashboard's real caveat: PSI needs feed-sized samples — the
    * unit test pins exact 0 on identical populations, and the planted
    * feed still ranks top). Snapshot split alternates `doc_id div 20`
    * BLOCKS because source is a pure function of doc_id % 20 — a
    * parity split would put whole feeds on one side only. */
  def q103PsiBySource(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    // source is a pure function of doc_id % 20, so the snapshot split key
    // must be independent of it: alternate by doc_id div 20 blocks
    val ref = d.filter(expr("(doc_id div 20) % 2") === 0)
    val cur = d.filter(expr("(doc_id div 20) % 2") === 1)
      .select(col("source"),
        when(substring(col("source"), -1, 1) === "3",
            col("n_chars") + expr("n_chars div 5"))
          .otherwise(col("n_chars")).as("n_chars"))
    RobustStats.psiDriftByGroup(ref, cur, "n_chars", "source")
  }
  val q103Sql: String =
    s"""WITH b AS (SELECT source,
       |             quantile_cont(n_chars, 0.25) AS b1,
       |             quantile_cont(n_chars, 0.5)  AS b2,
       |             quantile_cont(n_chars, 0.75) AS b3
       |           FROM documents WHERE (doc_id // 20) % 2 = 0 GROUP BY 1),
       |r AS (SELECT d.source,
       |        (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END) +
       |        (CASE WHEN n_chars > b2 THEN 1 ELSE 0 END) +
       |        (CASE WHEN n_chars > b3 THEN 1 ELSE 0 END) AS bin
       |      FROM documents d JOIN b USING (source) WHERE (doc_id // 20) % 2 = 0),
       |cu AS (SELECT d.source,
       |         (CASE WHEN v > b1 THEN 1 ELSE 0 END) +
       |         (CASE WHEN v > b2 THEN 1 ELSE 0 END) +
       |         (CASE WHEN v > b3 THEN 1 ELSE 0 END) AS bin
       |       FROM (SELECT source,
       |               CASE WHEN substring(source, -1, 1) = '3'
       |                    THEN n_chars + n_chars // 5
       |                    ELSE n_chars END AS v
       |             FROM documents WHERE (doc_id // 20) % 2 = 1) d
       |       JOIN b USING (source)),
       |rc AS (SELECT source, bin, count(*)::BIGINT AS ref_n FROM r GROUP BY 1, 2),
       |cc AS (SELECT source, bin, count(*)::BIGINT AS cur_n FROM cu GROUP BY 1, 2),
       |j AS (SELECT coalesce(rc.source, cc.source) AS source,
       |             coalesce(rc.bin, cc.bin) AS bin,
       |             coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
       |      FROM rc FULL OUTER JOIN cc
       |        ON rc.source = cc.source AND rc.bin = cc.bin),
       |t AS (SELECT source, bin, ref_n, cur_n,
       |             ref_n::DOUBLE / sum(ref_n) OVER (PARTITION BY source) AS rf,
       |             cur_n::DOUBLE / sum(cur_n) OVER (PARTITION BY source) AS cf
       |      FROM j)
       |SELECT source, bin, ref_n, cur_n, round(rf, 6) AS ref_frac,
       |       round(cf, 6) AS cur_frac,
       |       round(CASE WHEN ref_n > 0 AND cur_n > 0
       |                  THEN (cf - rf) * ln(cf / rf) END, 6) AS psi
       |FROM t""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Token-length histogram on power-of-two buckets: per bucket
    * ⌊log₂(n_tok)⌋, document count, token mass, and share of total
    * tokens — the distribution that sizes sequence-packing bins (q40/
    * q48: pick max_len where the cumulative mass knee sits; a fat tail
    * above the context length is pure truncation loss). One narrow map
    * (token count + an integer log₂ via bit length) and one ≤64-bucket
    * hash aggregate; the share divides exact integer sums. */
  def q104LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val nTok = graft.functions.TextFunctions.tokenCount(col("text"))
    // ⌊log₂ n⌋ = length(bin(n)) − 1: pure integer/string arithmetic —
    // floor(log2(n)) through doubles is off by one whenever ln(n)/ln(2)
    // lands a hair under an integer (n = 8 is the classic)
    val b = docs(s, dir)
      .select(nTok.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .select(col("n_tok"), (length(bin(col("n_tok"))) - 1).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    // ≤~40 log₂ buckets — bounded frame, explicit constant partition
    // (see graft.functions.BoundedWindow on why not an empty spec).
    val w = graft.functions.BoundedWindow.all(col("bucket"))
    b.withColumn("total", sum(col("n_tokens")).over(w))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total"), 6).as("token_share"))
  }
  val q104Sql: String =
    s"""WITH n AS (SELECT len(${QueriesExt.toksSql})::BIGINT AS n_tok
       |           FROM documents),
       |b AS (SELECT (length(bin(n_tok)) - 1)::INT AS bucket,
       |             count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
       |      FROM n WHERE n_tok > 0 GROUP BY 1)
       |SELECT bucket, n_docs, n_tokens,
       |       round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) AS token_share
       |FROM b""".stripMargin

  // ---------------------------------------------------------------- q105
  /** REAL image decode round-trip ([[graft.functions.Multimodal]], JDK
    * `javax.imageio` — no external codec): every document synthesizes a
    * PNG whose dimensions derive from `doc_id` (real PNG bytes through
    * the real JDK encoder), every 50th payload is truncated to 10 bytes
    * (corrupt), and the pipeline decodes → aspect-fits into a 16×16 box
    * (nearest-neighbor) → re-decodes the resized PNG. The oracle predicts
    * every output arithmetically: decoded dims must equal the synthesized
    * dims (proving a genuine encode→decode round trip, not a stub),
    * corrupt rows land in the NULL quarantine lane, and resized dims
    * follow the integer fit formula. Narrow per-row maps throughout —
    * blobs never shuffle; the only exchange is the final sort-free
    * projection. */
  def q105ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Multimodal
    val d = docs(s, dir).select(col("doc_id"),
      (pmod(col("doc_id"), lit(16)) + 8).cast("int").as("gw"),
      (pmod(col("doc_id"), lit(12)) + 8).cast("int").as("gh"))
    val png = d.withColumn("png",
      Multimodal.synthPng(col("gw"), col("gh"), col("doc_id")))
    val payload = png.withColumn("payload",
      when(pmod(col("doc_id"), lit(50)) === 0,
        expr("substring(png, 1, 10)")).otherwise(col("png")))
    payload
      .withColumn("img", Multimodal.decodeImage(col("payload")))
      .withColumn("rs", Multimodal.resizeImage(col("payload"), 16, 16))
      .withColumn("rimg", Multimodal.decodeImage(col("rs")))
      .select(col("doc_id"),
        col("img").isNotNull.as("decodable"),
        coalesce(col("img.width"), lit(-1)).as("width"),
        coalesce(col("img.height"), lit(-1)).as("height"),
        coalesce(col("img.channels"), lit(-1)).as("channels"),
        coalesce(col("img.format"), lit("")).as("format"),
        coalesce(col("rimg.width"), lit(-1)).as("rw"),
        coalesce(col("rimg.height"), lit(-1)).as("rh"))
  }
  val q105Sql: String =
    """WITH d AS (SELECT doc_id,
      |             (doc_id % 16 + 8)::INT AS w, (doc_id % 12 + 8)::INT AS h,
      |             doc_id % 50 <> 0 AS ok
      |           FROM documents),
      |r AS (SELECT doc_id, w, h, ok,
      |        least(16 * h, 16 * w) AS sc
      |      FROM d)
      |SELECT doc_id, ok AS decodable,
      |       CASE WHEN ok THEN w ELSE -1 END AS width,
      |       CASE WHEN ok THEN h ELSE -1 END AS height,
      |       CASE WHEN ok THEN 3 ELSE -1 END AS channels,
      |       CASE WHEN ok THEN 'png' ELSE '' END AS format,
      |       CASE WHEN ok THEN greatest(1, (w * sc) // (w * h))::INT ELSE -1 END AS rw,
      |       CASE WHEN ok THEN greatest(1, (h * sc) // (w * h))::INT ELSE -1 END AS rh
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q106
  /** REAL audio decode round-trip ([[graft.functions.Multimodal]], JDK
    * `javax.sound.sampled` — no external codec): every document
    * synthesizes a 16-bit PCM mono WAV whose sample count derives from
    * `doc_id` (real RIFF bytes through the real JDK parser), every 50th
    * payload is truncated to 10 bytes (corrupt header). The oracle
    * predicts every output arithmetically: decoded header fields must
    * equal the synthesized ones (a genuine encode→decode round trip —
    * the q105 pattern for audio), duration_ms is exact integer
    * frames·1000/rate, and corrupt rows land in the NULL quarantine
    * lane. Narrow per-row maps; blobs never shuffle. */
  def q106AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Multimodal
    val d = docs(s, dir).select(col("doc_id"),
      (pmod(col("doc_id"), lit(4000)) + lit(4000)).cast("int").as("n_samples"))
    val wav = d.withColumn("wav",
      Multimodal.synthWav(col("doc_id"), lit(8000), col("n_samples")))
    val payload = wav.withColumn("payload",
      when(pmod(col("doc_id"), lit(50)) === 0,
        expr("substring(wav, 1, 10)")).otherwise(col("wav")))
    payload
      .withColumn("a", Multimodal.decodeAudio(col("payload")))
      .select(col("doc_id"),
        col("a").isNotNull.as("decodable"),
        coalesce(col("a.encoding"), lit("")).as("encoding"),
        coalesce(col("a.sample_rate"), lit(-1)).as("sample_rate"),
        coalesce(col("a.channels"), lit(-1)).as("channels"),
        coalesce(col("a.bits"), lit(-1)).as("bits"),
        coalesce(col("a.frames"), lit(-1L)).as("frames"),
        coalesce(col("a.duration_ms"), lit(-1L)).as("duration_ms"))
  }
  val q106Sql: String =
    """WITH d AS (SELECT doc_id, (doc_id % 4000 + 4000)::BIGINT AS n,
      |             doc_id % 50 <> 0 AS ok
      |           FROM documents)
      |SELECT doc_id, ok AS decodable,
      |       CASE WHEN ok THEN 'pcm_signed' ELSE '' END AS encoding,
      |       CASE WHEN ok THEN 8000 ELSE -1 END AS sample_rate,
      |       CASE WHEN ok THEN 1 ELSE -1 END AS channels,
      |       CASE WHEN ok THEN 16 ELSE -1 END AS bits,
      |       CASE WHEN ok THEN n ELSE -1 END AS frames,
      |       CASE WHEN ok THEN (n * 1000) // 8000 ELSE -1 END AS duration_ms
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- q107
  /** Ordered funnel (view → click → purchase): a user reaches step k at
    * the first event of step k's type that occurs at-or-after their
    * step-(k-1) reach. Implemented as three STACKED running-max window
    * flags over ONE (user_id) exchange — the windows share the same
    * partition sort (ts, event_id tie-break), so the 100 TB cost is a
    * single shuffle of (user, type, ts) triples and no self-join per
    * step (the naive per-step min-join reshuffles the events table once
    * per funnel stage). The output is the per-step user count and
    * conversion — integers and exact ratios, hash-stable. */
  def q107Funnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = e
      .withColumn("r1", max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      .withColumn("r2", max(when(col("event_type") === "click" && col("r1") === 1, 1)
        .otherwise(0)).over(w))
      .withColumn("r3", max(when(col("event_type") === "purchase" && col("r2") === 1, 1)
        .otherwise(0)).over(w))
    val perUser = flagged.groupBy(col("user_id"))
      .agg(max(col("r1")).as("s1"), max(col("r2")).as("s2"), max(col("r3")).as("s3"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(col("s1")).cast("long").as("step_view"),
        sum(col("s2")).cast("long").as("step_click"),
        sum(col("s3")).cast("long").as("step_purchase"))
      .select(col("n_users"), col("step_view"), col("step_click"), col("step_purchase"),
        round(col("step_click").cast("double") / col("step_view"), 6).as("conv_click"),
        round(col("step_purchase").cast("double") / col("step_click"), 6).as("conv_purchase"))
  }
  val q107Sql: String =
    """WITH f AS (SELECT user_id,
      |             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |               OVER w AS r1,
      |             event_type, ts, event_id
      |           FROM events
      |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING)),
      |g AS (SELECT user_id, r1, event_type, ts, event_id,
      |        max(CASE WHEN event_type = 'click' AND r1 = 1 THEN 1 ELSE 0 END)
      |          OVER w AS r2
      |      FROM f
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING)),
      |h AS (SELECT user_id, r1, r2,
      |        max(CASE WHEN event_type = 'purchase' AND r2 = 1 THEN 1 ELSE 0 END)
      |          OVER w AS r3
      |      FROM g
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING)),
      |u AS (SELECT user_id, max(r1) AS s1, max(r2) AS s2, max(r3) AS s3
      |      FROM h GROUP BY 1)
      |SELECT count(*)::BIGINT AS n_users,
      |       sum(s1)::BIGINT AS step_view,
      |       sum(s2)::BIGINT AS step_click,
      |       sum(s3)::BIGINT AS step_purchase,
      |       round(sum(s2)::DOUBLE / sum(s1), 6) AS conv_click,
      |       round(sum(s3)::DOUBLE / sum(s2), 6) AS conv_purchase
      |FROM u""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Weekly cohort retention: users cohort by their first-activity week
    * (epoch-day div 7 — calendar-free integer weeks, engine-portable),
    * and each (cohort, week-offset) cell counts the distinct users
    * active that week. Shape: the first-week assignment is a min-over-
    * window stacked ON the same (user) exchange the activity rows
    * already need — no self-join back — and the cell counts aggregate
    * (cohort, offset, user) triples that are already distinct-per-week,
    * so the second exchange carries at most users×weeks rows. The naive
    * build (min-aggregate then join back to events) shuffles the event
    * table twice. */
  def q108Retention(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weeks = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_ms div 604800000").as("week"))
      .distinct() // one row per (user, active week) — the retention grain
    val w = Window.partitionBy(col("user_id"))
    val cohorted = weeks
      .withColumn("cohort_week", min(col("week")).over(w))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
    cohorted.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(
          Window.partitionBy(col("cohort_week"))))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("cohort_size"), 6).as("retention"))
  }
  val q108Sql: String =
    """WITH a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
      |           FROM events),
      |c AS (SELECT user_id, week,
      |        min(week) OVER (PARTITION BY user_id) AS cohort_week
      |      FROM a),
      |g AS (SELECT cohort_week, week - cohort_week AS week_offset,
      |             count(*)::BIGINT AS n_users
      |      FROM c GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_users,
      |       round(n_users::DOUBLE /
      |             max(CASE WHEN week_offset = 0 THEN n_users END)
      |               OVER (PARTITION BY cohort_week), 6) AS retention
      |FROM g""".stripMargin

  // ------------------------------------------------------------ registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_image_decode" -> (q105ImageDecode _),
    "q106_audio_decode" -> (q106AudioDecode _),
    "q107_funnel" -> (q107Funnel _),
    "q108_retention" -> (q108Retention _),
    "q82_semdedup" -> (q82SemDedup _),
    "q83_jl_ann" -> (q83JlAnn _),
    "q84_quantile_bins" -> (q84QuantileBins _),
    "q85_mad_outliers" -> (q85MadOutliers _),
    "q86_substring_spans" -> (q86SubstringSpans _),
    "q87_cluster_sample" -> (q87ClusterSample _),
    "q88_containment" -> (q88ContainmentPairs _),
    "q89_median_spikes" -> (q89MedianSpikes _),
    "q90_vocab_coverage" -> (q90VocabCoverage _),
    "q91_embedding_moments" -> (q91EmbeddingMoments _),
    // q92 intentionally absent: the number was never assigned (a
    // planning renumber skipped it — see COVERAGE.md). Do NOT "fix" the
    // hole by renumbering; downstream rounds diff registries by name.
    "q93_source_overlap" -> (q93SourceOverlap _),
    "q94_ann_mrr" -> (q94AnnMrr _),
    "q95_psi_drift" -> (q95PsiDrift _),
    "q96_hard_negatives" -> (q96HardNegatives _),
    "q97_snapshot_diff" -> (q97SnapshotDiff _),
    "q98_distinct_ngrams" -> (q98DistinctNgrams _),
    "q99_tfidf_cosine" -> (q99TfidfCosine _),
    "q100_group_split" -> (q100GroupSplit _),
    "q101_dedup_rate" -> (q101DedupRate _),
    "q102_lsh_recall" -> (q102LshRecall _),
    "q103_psi_by_source" -> (q103PsiBySource _),
    "q104_length_histogram" -> (q104LengthHistogram _)
  )

  val oracles: Map[String, String] = Map(
    "q82_semdedup" -> q82Sql,
    "q83_jl_ann" -> q83Sql,
    "q84_quantile_bins" -> q84Sql,
    "q85_mad_outliers" -> q85Sql,
    "q86_substring_spans" -> q86Sql,
    "q87_cluster_sample" -> q87Sql,
    "q88_containment" -> q88Sql,
    "q89_median_spikes" -> q89Sql,
    "q90_vocab_coverage" -> q90Sql,
    "q91_embedding_moments" -> q91Sql,
    "q93_source_overlap" -> q93Sql,
    "q94_ann_mrr" -> q94Sql,
    "q95_psi_drift" -> q95Sql,
    "q96_hard_negatives" -> q96Sql,
    "q97_snapshot_diff" -> q97Sql,
    "q98_distinct_ngrams" -> q98Sql,
    "q99_tfidf_cosine" -> q99Sql,
    "q100_group_split" -> q100Sql,
    "q101_dedup_rate" -> q101Sql,
    "q102_lsh_recall" -> q102Sql,
    "q103_psi_by_source" -> q103Sql,
    "q104_length_histogram" -> q104Sql,
    "q105_image_decode" -> q105Sql,
    "q106_audio_decode" -> q106Sql,
    "q107_funnel" -> q107Sql,
    "q108_retention" -> q108Sql
  )
}
