package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), two tiers:
  *
  *  - `bruteForceTopK` — exact cosine top-k. The query side is broadcast
  *    (queries ≪ corpus), so the corpus is scanned once, never shuffled;
  *    the only shuffle is the final per-query top-k (window over
  *    #queries × k rows). This is the correctness baseline and is already
  *    the right plan for "score 1e9 docs against 100 queries".
  *
  *  - `lshTopK` — the scale path: sign-random-projection (SRP) bucketing.
  *    Each vector hashes to a `bits`-bit bucket by the signs of dot
  *    products with deterministic pseudo-random hyperplanes (derived from
  *    xxhash64 — no stored model, reproducible across engines/runs).
  *    Queries probe their own bucket plus all buckets within Hamming
  *    distance `probeHamming`; candidates are re-ranked exactly. Corpus
  *    cost per query drops by ~2^bits / (#probed buckets).
  *
  * All dot products fold in DOUBLE, left-to-right — deterministic
  * bit-for-bit, which the DuckDB oracle can reproduce. The fold runs in
  * the native codegen'd kernels ([[graft.functions.VectorExpressions]]):
  * a fused Java loop instead of `aggregate`-over-`zip_with` higher-order
  * functions, same IEEE result (see the bit-compatibility contract
  * there, pinned by VectorExprSpec's property test).
  */
object Similarity {

  /** Element-wise dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = VectorExpressions.cosineSim(a, b)

  /** The declarative higher-order-function forms the native kernels
    * replaced — kept as the independent reference implementation that
    * VectorExprSpec checks the kernels against, bit for bit. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)

  def foldCosine(a: Column, b: Column): Column =
    try_divide(foldDot(a, b), sqrt(foldDot(a, a)) * sqrt(foldDot(b, b)))

  def foldL2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (s, x) => s + x)

  /** Shared exact re-rank tail of every ANN tier: drop self-matches,
    * score (query_id, qv) × (neighbor_id, cv) candidates with exact
    * cosine, keep each query's top k (ties → lower neighbor id).
    * Candidates carry per-vector norms (`qn`, `cn`) computed once at the
    * scan — per pair only the dot remains; `dot/(qn*cn)` is the same
    * double as `cosine(qv, cv)` (same folds, same order). */
  private def rerankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", try_divide(dot(col("qv"), col("cv")), col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank) — rank 1 = most similar;
    * deterministic tie-break on neighbor id. Self-matches excluded when
    * ids collide. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    rerankTopK(c.crossJoin(q), k)
  }

  /** Hard-negative mining for contrastive training: each query's top-k
    * most-similar corpus vectors whose label DIFFERS from the query's —
    * the near-miss negatives that teach a retriever its decision
    * boundary (random negatives are too easy to carry gradient).
    * Same plan as [[bruteForceTopK]] — queries (with their labels)
    * broadcast, corpus scanned once — with the label-mismatch predicate
    * applied before ranking so the window ranks only true negatives.
    * Output: (query_id, neighbor_id, rank), ties → lower neighbor id. */
  def hardNegativesTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("c_label"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    rerankTopK(c.crossJoin(q).filter(col("c_label") =!= col("q_label")), k)
  }

  /** Exact top-k nearest neighbors by squared L2 distance — the ground
    * truth the PQ tier is measured against (PQ approximates L2, so its
    * recall must be evaluated against the same metric, not cosine).
    * Ties → lower neighbor id; self-pairs excluded. Same plan shape as
    * [[bruteForceTopK]]: queries broadcast, corpus scanned once, per-query
    * top-k rank-limited before the final sort. */
  def bruteForceL2TopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("neighbor_id").asc)
    c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", l2Sq(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** kNN label classification / embedding-quality evaluation: each query
    * vector takes the majority label of its k exact-cosine nearest
    * neighbors (leave-one-out when queries ⊆ corpus — self-matches are
    * excluded by [[bruteForceTopK]]), and the agreement with its own
    * label is the standard intrinsic check that an embedding space
    * actually clusters by meaning — run it before trusting the space for
    * semantic dedup (q52) or ANN serving. Vote ties break to the lower
    * label, like every ranking rule here.
    *
    * Scale: evaluate on a SAMPLE of queries (the caller picks it) — the
    * probe set broadcasts, the corpus is scanned once and never
    * shuffled; per query only k neighbor rows reach the vote aggregate.
    * Output: (vec_id, label, pred_label, votes, correct). */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val knn = bruteForceTopK(queries, corpus, k, idCol, vecCol)
    val nbrLabels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"))
    val votes = knn.join(nbrLabels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("n_label").asc)
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id").as(idCol), col("n_label").as("pred_label"),
        col("votes"))
    queries.select(col(idCol), col(labelCol).as("label")).join(pred, Seq(idCol))
      .select(col(idCol), col("label"), col("pred_label"), col("votes"),
        (col("label") === col("pred_label")).as("correct"))
  }

  /** Reciprocal-rank fusion of two retrieval tiers over the same id
    * space — `rrf = Σ 1/(c + rank)` (Cormack et al.'s c=60), the
    * standard way a serving stack ensembles a lexical and a vector
    * retriever, or (here) two ANN tiers whose error modes differ.
    * A full-outer join on (query, neighbor) keeps the two reciprocal
    * terms in a FIXED textual order, so the fused double is
    * engine-reproducible (a groupBy-sum over N tiers would be
    * FP-order-dependent); ranking uses the rounded score with the
    * neighbor id as tie-break. Inputs are per-query top-k sets — Q×k
    * rows each — so fusion cost is independent of corpus size. */
  def rrfFuse2(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val ra = a.select(col("query_id"), col("neighbor_id"), col("rank").as("rank_a"))
    val rb = b.select(col("query_id"), col("neighbor_id"), col("rank").as("rank_b"))
    val rrf = round(
      coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_b")), lit(0.0)), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    ra.join(rb, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("rrf"))
  }

  /** Distributed Lloyd k-means over the embedding column — the trainer
    * behind every IVF-style index (q41/q65 use fixed seed centroids; this
    * is how production centroids are actually fit). Deterministic
    * end-to-end, which is rare for k-means and is what makes it
    * ORACLE-replayable in SQL:
    *
    *  - init = the k lowest-id vectors (the same explicit model rule as
    *    the PQ codebook);
    *  - assignment = rounded-L2 argmin, ties → lower cell (the
    *    [[pqCodes]] kernel with the centroid set as one subspace);
    *  - update = the exact micro-unit mean (q64's trick): each
    *    coordinate integerizes to `round(x·1e6)` longs that sum EXACTLY
    *    in any partial-aggregation order, with ONE double division at
    *    the end — so the new centroids are bit-identical regardless of
    *    partition count. A naive `avg(double)` is FP-order-dependent and
    *    could never be replayed.
    *
    * Per iteration: one corpus scan, one k-row partial aggregate
    * (count + dim sums), one ≤k-row collect — the driver holds k·dim
    * doubles, never data. Empty cells keep their previous centroid. */
  def kmeansTrain(corpus: DataFrame, k: Int, iters: Int, dim: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding")
  : Seq[Seq[Double]] = {
    var cents: IndexedSeq[Seq[Double]] = corpus.filter(col(idCol) < k)
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).map(_._2).toIndexedSeq
    require(cents.length == k, s"need ids 0..${k - 1} as seed vectors")
    for (_ <- 0 until iters) {
      val cell = element_at(pqCodes(col(vecCol), Seq(cents.toSeq)), 1)
      val aggs = count(lit(1)).as("n") +: (0 until dim).map(i =>
        sum(round(element_at(col(vecCol), i + 1).cast("double") * lit(1000000.0), 0)
          .cast("long")).as(s"s$i"))
      val upd = corpus.withColumn("cell", cell).groupBy("cell")
        .agg(aggs.head, aggs.tail: _*).collect().map { r =>
          val n = r.getAs[Long]("n")
          r.getAs[Int]("cell") ->
            (0 until dim).map(i => (r.getAs[Long](s"s$i").toDouble / n) / 1000000.0)
        }.toMap
      cents = (0 until k).map(c => upd.getOrElse(c, cents(c)).toSeq).toIndexedSeq
    }
    cents.toSeq
  }

  /** Deterministic ±1 hyperplanes (`bits` × `dim`), computed in plain
    * Scala with splitmix64-style mixing — engine-independent constants
    * that can be embedded as literals in both the Spark expression and an
    * external SQL oracle's replay of the same bucketing. */
  def deterministicPlanes(bits: Int, dim: Int): Seq[Seq[Int]] =
    Seq.tabulate(bits, dim) { (j, i) =>
      var z = j.toLong * 0x9E3779B97F4A7C15L +
        i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 1L) 1 else -1
    }

  /** SRP bucket id from explicit literal hyperplanes (see
    * [[deterministicPlanes]]): bucket bit j = sign of the dot product
    * with plane j. Double folds left-to-right → engine-reproducible. */
  def srpBucketPlanes(vec: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (signs, j) =>
      val proj = dot(vec, array(signs.map(s => lit(s.toDouble)): _*))
      when(proj > 0, shiftleft(lit(1), j)).otherwise(0)
    }.reduce(_ bitwiseOR _)

  /** SRP bucket id: for hyperplane j, component i has deterministic
    * pseudo-random sign from xxhash64(i, j); bucket bit j = sign of the
    * dot product with that ±1 hyperplane. Integer decisions on top of
    * double folds — engine-reproducible. */
  def srpBucket(vec: Column, bits: Int): Column = {
    val planes = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          when(xxhash64(i, lit(j)).bitwiseAND(1) === 1, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (s, x) => s + x)
      when(proj > 0, shiftleft(lit(1), j)).otherwise(0)
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via SRP-LSH: candidates from the query's bucket ∪ buckets
    * within Hamming `probeHamming` (multi-probe), exact re-rank. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 8, probeHamming: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Seq[Seq[Int]] = Nil): DataFrame = {
    def bucketOf(v: Column): Column =
      if (planes.nonEmpty) srpBucketPlanes(v, planes) else srpBucket(v, bits)
    // The bucket space width follows the planes when given — probing masks
    // built from a mismatched `bits` would silently miss (or invent)
    // Hamming neighbors.
    val effBits = if (planes.nonEmpty) planes.length else bits
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"), bucketOf(col(vecCol)).as("bucket"))
    // Probe set: all buckets within Hamming distance of the query's bucket
    // (sum of bits-choose-h masks for h ≤ probeHamming — tiny for the
    // practical bits/probeHamming ranges, built as a literal array).
    val masks: Seq[Int] = (0 to probeHamming).flatMap(h =>
      (0 until effBits).combinations(h).map(_.foldLeft(0)((m, b) => m | (1 << b))))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          l2Norm(col(vecCol)).as("qn"), bucketOf(col(vecCol)).as("qb"))
        .withColumn("bucket", explode(array(masks.map(m => col("qb").bitwiseXOR(lit(m))): _*)))
        .drop("qb"))
    rerankTopK(c.join(q, Seq("bucket")), k)
  }

  /** Cosine against a literal centroid vector (plan-time constants — the
    * model travels in the plan, like [[srpBucketPlanes]]' planes). */
  private def cosineLit(vec: Column, centroid: Seq[Double]): Column =
    cosine(vec, array(centroid.map(lit): _*))

  /** Scored centroid array for IVF: (sim, -id) structs, so lexicographic
    * max/sort = highest similarity, ties to the lower centroid id. */
  private def ivfScored(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array(centroids.map { case (id, cv) =>
      struct(cosineLit(vec, cv).as("sim"), lit(-id).as("nid"))
    }: _*)

  /** IVF cell assignment: id of the nearest centroid (by cosine; ties →
    * lower id). Computed inside the scan projection — the corpus is never
    * shuffled or joined to assign cells. */
  def ivfCell(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    (-array_max(ivfScored(vec, centroids)).getField("nid")).cast("int")

  /** The `nprobe` nearest centroid ids for a query vector, best first. */
  def ivfProbeCells(vec: Column, centroids: Seq[(Int, Seq[Double])],
                    nprobe: Int): Column =
    transform(slice(reverse(array_sort(ivfScored(vec, centroids))), 1, nprobe),
      s => (-s.getField("nid")).cast("int"))

  /** Spherical-k-means (Lloyd) refinement of an IVF centroid set,
    * distributed: each iteration assigns every corpus vector to its
    * nearest centroid with the same zero-shuffle literal expression
    * [[ivfCell]] uses, then recomputes each cell's mean direction via
    * `posexplode → groupBy(cell, pos) → avg` — the shuffle carries
    * k×dim partial sums per mapper (map-side combine), never the
    * vectors themselves. Only the centroid model (k×dim doubles) passes
    * through the driver between iterations, exactly like loading planes;
    * cells that lose all members keep their previous centroid. Assignment
    * is by cosine, so the update is the TRUE spherical k-means step: the
    * mean of the members' *unit* vectors. Averaging raw vectors would let
    * one large-norm member drag the centroid and break Lloyd's
    * monotone-objective guarantee; zero-norm vectors are excluded (they
    * have no direction to contribute). */
  def kmeansRefine(corpus: DataFrame, init: Seq[(Int, Seq[Double])], iters: Int,
                   vecCol: String = "embedding"): Seq[(Int, Seq[Double])] = {
    require(iters >= 0, "iters must be >= 0")
    var cents = init
    for (_ <- 1 to iters) {
      // Two selects: a generator (posexplode) resolved in the same
      // projection as ivfCell's named structs loses the field names.
      val means = corpus
        .select(ivfCell(col(vecCol), cents).as("cell"), col(vecCol).as("v_aws"),
          l2Norm(col(vecCol)).as("nrm_aws"))
        .filter(col("nrm_aws") > 0)
        .select(col("cell"), col("nrm_aws"), posexplode(col("v_aws")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double") / col("nrm_aws")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }
    cents
  }

  /** ANN top-k via IVF(-flat): the third tier next to [[bruteForceTopK]]
    * (exact) and [[lshTopK]] (SRP buckets). Each corpus vector lands in
    * exactly one inverted list (nearest centroid); a query scans only its
    * `nprobe` nearest lists and re-ranks those candidates exactly. Corpus
    * cost per query drops by ~nlist/nprobe, and unlike SRP the partition
    * adapts to the data's actual geometry via the centroid set.
    *
    * `centroids` is an explicit (id, vector) model: a deterministic corpus
    * sample (the classic random-sample coarse quantizer — what the q41
    * oracle replays) or centroids refined offline (e.g. k-means). Cell
    * assignment is a literal expression in the scan projection, so the
    * plan shape is: one corpus scan → equi-join on cell id with the
    * broadcast probe-expanded queries → per-query top-k window. No
    * all-pairs, no corpus shuffle. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int,
              centroids: Seq[(Int, Seq[Double])],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1, "need centroids and nprobe >= 1")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"), ivfCell(col(vecCol), centroids).as("cell"))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        l2Norm(col(vecCol)).as("qn"),
        explode(ivfProbeCells(col(vecCol), centroids, nprobe)).as("cell")))
    rerankTopK(c.join(q, Seq("cell")), k)
  }

  /** [[ivfTopK]] for SEVERAL nprobe tiers at once — the tuning-sweep
    * form: the corpus cell assignment materializes ONCE
    * (localCheckpoint; each tier would otherwise rescan and re-score
    * the corpus against every centroid), the query side ranks its
    * probed cells once via `posexplode` of the ordered probe list, and
    * each tier is just a rank filter over that shared ranking before
    * the equi-join and per-(tier, query) top-k.
    * Output: (nprobe, query_id, neighbor_id, rank). */
  def ivfSweepTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   nprobes: Seq[Int], centroids: Seq[(Int, Seq[Double])],
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && nprobes.nonEmpty && nprobes.forall(_ >= 1),
      "need centroids and nprobe tiers >= 1")
    val maxProbe = nprobes.max
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        l2Norm(col(vecCol)).as("cn"), ivfCell(col(vecCol), centroids).as("cell"))
      .localCheckpoint(true)
    val probeRanked = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), l2Norm(col(vecCol)).as("qn"),
      posexplode(ivfProbeCells(col(vecCol), centroids, maxProbe))
        .as(Seq("probe_rank", "cell")))
    // Score ONCE at the widest tier, carrying probe_rank; each narrower
    // tier is a rank filter over the already-scored candidates (a
    // candidate with probe_rank r belongs to every tier np > r), so the
    // O(N·D) dot-product work never repeats per tier.
    val scored = c.join(broadcast(probeRanked), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", try_divide(dot(col("qv"), col("cv")),
        col("qn") * col("cn")))
    val tiered = scored.withColumn("nprobe",
      explode(filter(array(nprobes.map(lit): _*),
        np => np > col("probe_rank"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    tiered.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Squared Euclidean distance (double, left-to-right fold) — the
    * product-quantization kernel. */
  def l2Sq(a: Column, b: Column): Column = VectorExpressions.vecL2Sq(a, b)

  /** Subvector `m` (0-based) of a `vec` split into equal `subDim`-wide
    * subspaces — 1-based inclusive slice, mirroring SQL list slicing. */
  private def subvec(vec: Column, m: Int, subDim: Int): Column =
    slice(vec, m * subDim + 1, subDim)

  /** Product-quantization codes for one vector. `codebook(m)(k)` is
    * centroid `k` of subspace `m`; the vector's code for subspace m is
    * the argmin centroid by squared L2 over that subspace (distance
    * rounded to 6 decimals before the argmin, ties → lower code — the
    * same engine-reproducible ranking rule as the ANN tiers). The
    * codebook travels as plan literals like [[srpBucketPlanes]]' planes.
    * Output: `array<int>` of length M — a 64-dim float vector (256 B)
    * compresses to M small ints, which is the entire 100 TB story: the
    * corpus index is ~64× smaller than the raw embeddings, and encode is
    * a narrow per-row projection in the scan (no shuffle, no join). */
  def pqCodes(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column = {
    require(codebook.nonEmpty && codebook.head.nonEmpty, "empty codebook")
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      VectorExpressions.PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        codebook.map(_.map(_.toArray).toArray).toArray))
  }

  /** The declarative M × K argmin the [[pqCodes]] kernel replaced — kept
    * as the independent reference implementation the spec checks the
    * kernel against, value for value (same rounded-distance argmin, same
    * tie rule). */
  def pqCodesDeclarative(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column = {
    require(codebook.nonEmpty && codebook.head.nonEmpty, "empty codebook")
    val subDim = codebook.head.head.length
    array(codebook.zipWithIndex.map { case (cents, m) =>
      val s = subvec(vec, m, subDim)
      val scored = array(cents.zipWithIndex.map { case (cv, k) =>
        struct(round(foldL2Sq(s, array(cv.map(lit): _*)), 6).as("d"),
          lit(k).as("k"))
      }: _*)
      array_min(scored).getField("k")
    }: _*)
  }

  /** ANN top-k via product quantization with asymmetric distance
    * computation (ADC) — the memory-bound tier next to [[bruteForceTopK]]
    * / [[lshTopK]] / [[ivfTopK]]. The corpus is one-pass encoded to
    * M-int code arrays ([[pqCodes]]) and the full vectors are DROPPED
    * from the dataflow; each query precomputes an M×K lookup table of
    * exact subspace distances to every centroid (in its own broadcast
    * projection), and a candidate's approximate distance is just M table
    * lookups summed left-to-right — no per-pair vector arithmetic at
    * all. Ranking uses the rounded ADC with neighbor-id tie-break, so
    * the result set is engine-reproducible. Self-pairs are excluded.
    *
    * Output: (query_id, neighbor_id, rank, adc). */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                codebook: Seq[Seq[Seq[Double]]],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(codebook.nonEmpty && codebook.head.nonEmpty, "empty codebook")
    val m = codebook.length
    val subDim = codebook.head.head.length
    // Corpus side: codes ONLY — the vector does not survive the encode
    // projection, so everything downstream moves M ints per row.
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      pqCodes(col(vecCol), codebook).as("codes"))
    // Query side: per-subspace distance LUTs (exact, unrounded — the
    // rounding happens once, on the final sum).
    val luts = codebook.zipWithIndex.map { case (cents, mm) =>
      array(cents.map(cv =>
        l2Sq(subvec(col(vecCol), mm, subDim), array(cv.map(lit): _*))): _*)
        .as(s"lut$mm")
    }
    val q = broadcast(queries.select(col(idCol).as("query_id") +: luts: _*))
    val adc = (0 until m).map(mm =>
        element_at(col(s"lut$mm"), element_at(col("codes"), mm + 1) + 1))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    enc.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", round(adc, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc"))
  }

  /** Two-stage PQ retrieval — the production shape (FAISS
    * IndexPQ + refine): ADC ranks a `shortlist`-sized candidate set per
    * query from codes alone, then ONLY those Q×shortlist rows rejoin
    * their raw vectors for an exact squared-L2 re-rank. The second
    * corpus scan is filtered by the broadcast shortlist ids, so the
    * exact arithmetic touches shortlist/N of the corpus — recall climbs
    * toward exact while the full-vector work stays bounded.
    * Output: (query_id, neighbor_id, rank) by exact distance. */
  def pqRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   shortlist: Int, codebook: Seq[Seq[Seq[Double]]],
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    pqRefineFromShortlist(
      pqAdcTopK(queries, corpus, shortlist, codebook, idCol, vecCol),
      queries, corpus, k, idCol, vecCol)
  }

  /** The exact re-rank tail of [[pqRefineTopK]], over an ALREADY-computed
    * (query_id, neighbor_id) shortlist — callers that also consume the
    * raw ADC ranking (e.g. a recall report) pass the one shortlist to
    * both instead of paying the ADC scan twice. */
  def pqRefineFromShortlist(shortlist: DataFrame,
                            queries: DataFrame, corpus: DataFrame, k: Int,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("neighbor_id").asc)
    shortlist.select(col("query_id"), col("neighbor_id"))
      .join(cv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("d", l2Sq(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** IVF-PQ: the composed index the large-scale systems actually run
    * (FAISS IndexIVFPQ) — IVF prunes WHICH vectors a query touches
    * (equi-join on cell id, nprobe/nlist of the corpus), PQ compresses
    * WHAT is stored per vector (M code bytes of the RESIDUAL v −
    * centroid[cell], which quantizes far better than raw vectors because
    * residuals concentrate near the origin). The corpus index row is
    * (id, cell, codes) — nothing else survives the encode scan.
    *
    * Everything is L2 and engine-reproducible: cell assignment is the
    * same rounded-distance argmin as PQ encoding (via the [[pqCodes]]
    * kernel with the centroid set as a single subspace), residuals are
    * exact element-wise subtractions against plan-literal centroids, and
    * each (query, probed cell) pair gets its own residual LUT. Ranking:
    * rounded ADC, neighbor-id tie-break.
    *
    * `centroids(i)` is the cell-i centroid; `codebook` quantizes
    * residual subspaces and is shared across cells. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int,
                centroids: Seq[Seq[Double]], codebook: Seq[Seq[Seq[Double]]],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
    val m = codebook.length
    val subDim = codebook.head.head.length
    val centsLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    // cell = argmin rounded-L2 over the centroid set — the PqEncode
    // kernel with ONE subspace is exactly that argmin.
    def cellOf(v: Column): Column = element_at(pqCodes(v, Seq(centroids)), 1)
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(centsLit, cell + 1), (x, y) => x.cast("double") - y)
    val enc = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", cellOf(col("cv")))
      .select(col("neighbor_id"), col("cell"),
        pqCodes(residual(col("cv"), col("cell")), codebook).as("codes"))
    // Query side: the nprobe nearest cells (same rounded-argmin rule,
    // then rank order), one residual LUT set per probed cell.
    val scoredCells = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(round(l2Sq(col("qv"), array(c.map(lit): _*)), 6).as("d"), lit(i).as("cid"))
    }: _*)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(transform(slice(array_sort(scoredCells), 1, nprobe),
          s => s.getField("cid"))))
    val luts = codebook.zipWithIndex.map { case (cents, mm) =>
      array(cents.map(cv =>
        l2Sq(slice(col("qres"), mm * subDim + 1, subDim), array(cv.map(lit): _*))): _*)
        .as(s"lut$mm")
    }
    val q = broadcast(probes
      .withColumn("qres", residual(col("qv"), col("cell")))
      .select(col("query_id") +: col("cell") +: luts: _*))
    val adc = (0 until m).map(mm =>
        element_at(col(s"lut$mm"), element_at(col("codes"), mm + 1) + 1))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    enc.join(q, Seq("cell")) // equi-join on cell: nprobe/nlist of the corpus per query
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", round(adc, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc"))
  }

  /** Per-dimension (min, max) scalar-quantization model — the train step
    * of the SQ8 tier. One partial-aggregated pass (2·dim min/max
    * aggregates combine map-side; a single 2·dim-double row reaches the
    * driver), so training costs one corpus scan at any scale. */
  def sqMinMax(corpus: DataFrame, dim: Int, vecCol: String = "embedding")
  : (Seq[Double], Seq[Double]) = {
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col(vecCol), i + 1)).as(s"mn$i"),
      max(element_at(col(vecCol), i + 1)).as(s"mx$i")))
    val r = corpus.agg(aggs.head, aggs.tail: _*).collect()(0)
    ((0 until dim).map(i => r.getAs[Float](s"mn$i").toDouble),
      (0 until dim).map(i => r.getAs[Float](s"mx$i").toDouble))
  }

  /** SQ8 encode: `code_i = clamp(round((x_i − mn_i)/(mx_i − mn_i)·255), 0, 255)`
    * (constant dimensions encode as 0). A narrow per-row projection — a
    * 64-dim float vector (256 B) compresses to 64 byte-range ints, and
    * like [[pqCodes]] the raw vector does not survive the encode
    * projection. The model travels as two plan-literal arrays. */
  def sqEncode(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mnLit = array(mins.map(lit): _*)
    val mxLit = array(maxs.map(lit): _*)
    transform(vec, (x, i) => {
      val mn = element_at(mnLit, i + 1)
      val mx = element_at(mxLit, i + 1)
      when(mx === mn, lit(0)).otherwise(
        least(greatest(round(((x.cast("double") - mn) / (mx - mn)) * lit(255.0), 0),
          lit(0.0)), lit(255.0)).cast("int"))
    })
  }

  /** Scalar-quantization ANN (FAISS `IndexScalarQuantizer` QT_8bit
    * shape) — the third compression tier next to PQ (q59) and IVF-PQ
    * (q65): no codebook training, just the per-dimension affine map, so
    * it is the index you build when PQ's k-means is not worth running.
    * Corpus moves as code arrays only; queries broadcast with their raw
    * vectors and score candidates by asymmetric distance against the
    * DEQUANTIZED corpus point `mn_i + code_i·(mx_i − mn_i)/255` — a
    * left-to-right fold in dimension order (DuckDB `list_sum ORDER BY`
    * replayable). Rounded-distance ranking, neighbor-id tie-break; the
    * per-query top-k collapses to a WindowGroupLimit before the only
    * shuffle. */
  def sqAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                mins: Seq[Double], maxs: Seq[Double],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty, "empty SQ model")
    val mnLit = array(mins.map(lit): _*)
    val mxLit = array(maxs.map(lit): _*)
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      sqEncode(col(vecCol), mins, maxs).as("codes"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val term = transform(col("codes"), (c, i) => {
      val mn = element_at(mnLit, i + 1)
      val mx = element_at(mxLit, i + 1)
      val dq = mn + ((c.cast("double") * (mx - mn)) / lit(255.0))
      val t = element_at(col("qv"), i + 1).cast("double") - dq
      t * t
    })
    val adc = aggregate(term, lit(0.0), (s, x) => s + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    enc.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", round(adc, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc"))
  }

  /** Embedding-cosine near-duplicate pairs within the corpus: banded
    * SRP-LSH. The `bits` hyperplane signs are split into `bands`
    * independent hash tables of `bits/bands` bits each; two vectors are
    * candidates when they share ANY band's bucket (the MinHash-banding
    * OR-construction — a single wide bucket misses a near-dup whenever
    * one plane disagrees, so its recall decays with `bits`; with bands
    * the pair must disagree in EVERY band to be missed). Candidates are
    * scored exactly and deduped across bands. Still one equi-join per
    * band on a bounded key, never all-pairs. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, bits: Int = 8,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         planes: Seq[Seq[Int]] = Nil, bands: Int = 2): DataFrame = {
    val effBits = if (planes.nonEmpty) planes.length else bits
    require(bands >= 1 && effBits % bands == 0,
      s"bands ($bands) must divide the bucket width ($effBits)")
    val w = effBits / bands
    val bucketOf: Column => Column =
      if (planes.nonEmpty) srpBucketPlanes(_, planes) else srpBucket(_, bits)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nrm"), bucketOf(col(vecCol)).as("bucket"))
    val banded = c.select(col("id"), col("v"), col("nrm"),
      posexplode(array((0 until bands).map(k =>
        shiftright(col("bucket"), k * w).bitwiseAND(lit((1 << w) - 1))): _*))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", try_divide(dot(col("v_a"), col("v_b")), col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .distinct() // a pair co-bucketed in several bands scores identically
  }

  /** Incremental embedding near-dup PROBE — [[cosineNearDupPairs]]' index-
    * maintenance twin and the embedding-grain member of the q291/q293/
    * q294 family: NEW vectors' SRP band keys probe the EXISTING corpus's
    * banded bucket index instead of re-running the corpus×corpus
    * self-join. Per ingest the candidate join is |delta| × bands rows
    * against a (band, bkey)-bucketed base table appended per batch;
    * verification is the exact cosine, so precision is exact and recall
    * is the SRP OR-construction's curve — identical algebra to the batch
    * operator (same planes, same band split, same verify). Caller keeps
    * base/delta disjoint. Output: (id_new, id_base, sim). */
  def cosineNearDupProbe(base: DataFrame, delta: DataFrame, threshold: Double,
                         bits: Int = 8, idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         planes: Seq[Seq[Int]] = Nil, bands: Int = 2): DataFrame = {
    val effBits = if (planes.nonEmpty) planes.length else bits
    require(bands >= 1 && effBits % bands == 0,
      s"bands ($bands) must divide the bucket width ($effBits)")
    val w = effBits / bands
    val bucketOf: Column => Column =
      if (planes.nonEmpty) srpBucketPlanes(_, planes) else srpBucket(_, bits)
    def banded(df: DataFrame) = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nrm"), bucketOf(col(vecCol)).as("bucket"))
      .select(col("id"), col("v"), col("nrm"),
        posexplode(array((0 until bands).map(k =>
          shiftright(col("bucket"), k * w).bitwiseAND(lit((1 << w) - 1))): _*))
          .as(Seq("band", "bkey")))
    val b = banded(base).select(col("band"), col("bkey"),
      col("id").as("id_base"), col("v").as("v_b"), col("nrm").as("nrm_b"))
    val d = banded(delta).select(col("band"), col("bkey"),
      col("id").as("id_new"), col("v").as("v_d"), col("nrm").as("nrm_d"))
    d.join(b, Seq("band", "bkey"))
      .withColumn("sim", try_divide(dot(col("v_d"), col("v_b")),
        col("nrm_d") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_new"), col("id_base"), round(col("sim"), 6).as("sim"))
      .distinct() // a pair co-bucketed in several bands scores identically
  }

  /** Per-dimension embedding moments — the health check a space should
    * pass before ANN/semantic-dedup decisions trust it (a dead dimension
    * has ~zero variance; a bad normalization shows in the means). One
    * corpus pass: values integerize to exact micro-unit longs in the
    * scan (the q64/q70 determinism pattern — order-independent integer
    * sums, safe to partial-aggregate at any parallelism), the aggregate
    * is `dim` rows, and mean/variance derive from (n, Σx, Σx²) with one
    * defined division chain.
    *
    * Overflow (r6 advice): per-row xi² ≈ 1e12 for unit-range components,
    * so a BIGINT Σxi² overflows past ~9M rows per dimension. Both sums
    * therefore accumulate as DECIMAL(38,0) — Spark's decimal sum is
    * still a partial-aggregated exact integer, headroom 1e38 ≈ 1e26
    * rows — and the published s1/s2 columns cast to DOUBLE (exact below
    * 2^53; past that both engines take the same nearest-even double of
    * the same exact integer, so the replay still matches bit-for-bit).
    * Output: (dim, n, s1, s2, mean, variance). */
  def embeddingMoments(corpus: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val x = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .select((col("i") + 1).as("dim"),
        round(col("x") * lit(1000000.0), 0).cast("long").as("xi"))
    val mean = col("s1d").cast("double") / col("n")
    x.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast("decimal(38,0)")).as("s1d"),
        sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("s2d"))
      .select(col("dim"), col("n"),
        col("s1d").cast("double").as("s1"),
        col("s2d").cast("double").as("s2"),
        round(mean / lit(1000000.0), 6).as("mean"),
        round((col("s2d").cast("double") / col("n") - mean * mean)
          / lit(1000000000000.0), 6).as("variance"))
  }

  /** Top principal direction of the (uncentered) embedding cloud by
    * power iteration — the anisotropy diagnostic: embedding spaces with
    * one dominant direction (a large common component) hurt cosine
    * retrieval, and the top component + its eigenvalue quantify that
    * before any index is built. Uncentered by design (the dominant
    * direction INCLUDING the mean offset is the quantity cosine
    * similarity actually suffers from); [[embeddingMeanDrift]] /
    * [[embeddingMoments]] cover the mean itself.
    *
    * Determinism (the k-means q70 discipline): v₀ is the exact literal
    * 1/√d; each iteration is ONE corpus pass — per row the dot x·v via
    * the fused [[VectorExpressions.vecDot]] fold, per dim the exact
    * micro-unit integer sum Σ round(x_d·(x·v)·10⁶) — so partials are
    * order-independent; the ≤d-row model crosses the driver like a
    * centroid row, normalization is a defined dim-ordered fold + IEEE
    * sqrt/÷. An external engine replays every step bit-for-bit.
    *
    * Output: (dim, component, lam) — component the unit top direction
    * rounded to 6, lam the final Rayleigh-style magnitude ‖Av‖ (the
    * top eigenvalue of Σ_x x xᵀ up to normalization) rounded to 4.
    */
  def topPrincipalComponent(corpus: DataFrame, iters: Int = 2,
                            vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val spark = corpus.sparkSession
    // headOption, not head: an empty corpus returns an empty model
    // frame instead of throwing NoSuchElementException.
    val dimsOpt = corpus.select(size(col(vecCol)).as("d")).take(1)
      .headOption.map(_.getInt(0))
    if (dimsOpt.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Int, Double, Double)].toDF("dim", "component", "lam")
    }
    val dims = dimsOpt.get
    var v: Seq[Double] = Seq.fill(dims)(1.0d / math.sqrt(dims.toDouble))
    var lam = 0.0d
    (1 to iters).foreach { _ =>
      val vLit = array(v.map(lit): _*)
      val terms = corpus
        .select(col(vecCol).cast("array<double>").as("x"))
        .select(VectorExpressions.vecDot(col("x"), vLit).as("d"),
          posexplode(col("x")).as(Seq("i", "xi")))
        .select((col("i") + 1).as("dim"),
          round(col("xi") * col("d") * lit(1000000.0d), 0).cast("long")
            .as("t"))
      val w = terms.groupBy(col("dim"))
        .agg(sum(col("t").cast("decimal(38,0)")).as("s"))
        .orderBy(col("dim"))
        .collect()
        .map(r => r.getDecimal(1).doubleValue() / 1000000.0d)
      // Dim-ordered left-to-right norm fold — the oracle replays it as a
      // list_sum over the dim-ordered list.
      val nrm = math.sqrt(w.foldLeft(0.0d)((a, x) => a + x * x))
      lam = nrm
      // An all-zero corpus (or a direction annihilated to zero) has no
      // dominant component; keep the previous unit vector instead of
      // dividing by zero and emitting NaN components.
      if (nrm != 0.0d) v = w.map(_ / nrm).toSeq
    }
    import spark.implicits._
    v.zipWithIndex
      .map { case (c, i) => (i + 1,
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(lam).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("dim", "component", "lam")
  }

  /** Per-dimension embedding mean drift between a reference and a
    * current population — the embedding-space complement of the scalar
    * PSI monitor (q95): when the upstream encoder changes (silent model
    * swap, preprocessing bug), per-dim means shift long before any
    * downstream metric notices, and naming WHICH dims moved localizes
    * the cause.
    *
    * One corpus pass: posexplode + conditional micro-unit sums per dim
    * (the q91 exact-moments pattern — integer partials, so the result
    * is identical at any partition count), means via one defined
    * division chain, |drift| flagged against `threshold` (in the
    * embedding's own units). Output: (dim, n_ref, n_cur, mean_ref,
    * mean_cur, drift, drifted) — ≤ dims rows.
    */
  def embeddingMeanDrift(corpus: DataFrame, curFlag: Column,
                         vecCol: String = "embedding",
                         threshold: Double = 0.05): DataFrame = {
    val x = corpus
      .select(curFlag.as("cur"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .select(col("cur"), (col("i") + 1).as("dim"),
        round(col("x") * lit(1000000.0), 0).cast("long").as("xi"))
    val g = x.groupBy("dim").agg(
      sum(when(!col("cur"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("cur"), 1L).otherwise(0L)).as("n_cur"),
      sum(when(!col("cur"), col("xi")).otherwise(0L)
        .cast("decimal(38,0)")).as("sr"),
      sum(when(col("cur"), col("xi")).otherwise(0L)
        .cast("decimal(38,0)")).as("sc"))
    val mr = col("sr").cast("double") / col("n_ref")
    val mc = col("sc").cast("double") / col("n_cur")
    g.select(col("dim"), col("n_ref"), col("n_cur"),
      round(mr / lit(1000000.0), 6).as("mean_ref"),
      round(mc / lit(1000000.0), 6).as("mean_cur"),
      round((mc - mr) / lit(1000000.0), 6).as("drift"))
      .withColumn("drifted", abs(col("drift")) > threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup with
    * cluster-bounded candidate generation. Every vector is assigned to
    * its nearest centroid (the same rounded-argmin [[pqCodes]] kernel the
    * IVF tiers use, so the assignment replays exactly); near-duplicate
    * candidates are pairs WITHIN a cell — one equi-join on the cell id,
    * never all-pairs — scored by exact cosine against `threshold`;
    * connected components collapse chains; and each duplicate group keeps
    * the member with the LOWEST cosine similarity to its cluster centroid
    * (the paper's keep-rule: the least prototypical example carries the
    * most information), ties to the lower id.
    *
    * Scale: the paper's own recipe — k grows with the corpus (50k cells
    * for LAION) so |cell| stays bounded and the within-cell join never
    * quadratic-blows; the centroid model is a broadcast literal, the
    * corpus shuffles once on the cell id.
    * Output: (vec_id, cell, cent_sim, component, keep). */
  def semDedup(corpus: DataFrame, centroids: Seq[Seq[Double]], threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding",
               driverMaxEdges: Long = 0L): DataFrame = {
    val centsLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    val assigned = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("cell", element_at(pqCodes(col("v"), Seq(centroids)), 1))
      .withColumn("cent_sim",
        round(cosine(col("v"), element_at(centsLit, col("cell") + 1)), 6))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"), col("v").as("v_b"))
    val pairs = a.join(b, "cell").filter(col("id_a") < col("id_b"))
      .filter(cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val comp = graft.operators.ConnectedComponents.components(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      driverMaxEdges = driverMaxEdges)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("cent_sim").asc_nulls_last, col("vec_id").asc)
    assigned.drop("v")
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("component", coalesce(col("component"), col("vec_id")))
      .withColumn("keep", row_number().over(w) === 1)
  }

  /** Johnson–Lindenstrauss random projection: reduce a `dim`-vector to
    * `planes.length` components, the j-th being the dot with a
    * deterministic ±1 hyperplane ([[deterministicPlanes]] — the dense
    * Achlioptas'01 variant, engine-independent constants). The usual
    * 1/sqrt(m) scale is omitted: it is a constant factor, so every
    * distance RANKING is unchanged and the replay stays
    * literal-arithmetic only. A narrow per-row map — no model to train,
    * no shuffle; the projection is the bytes-reduction step before a
    * distance-heavy stage (16 doubles instead of 64 floats per row). */
  def jlProject(vec: Column, planes: Seq[Seq[Int]]): Column =
    array(planes.map(p =>
      dot(vec, array(p.map(s => lit(s.toDouble)): _*))): _*)

  /** Two-stage ANN through the JL sketch: rank by squared L2 in the
    * reduced space (the JL-preserved metric — reduced vectors are
    * computed in each side's scan projection, so the Q×N candidate pass
    * streams 4× fewer bytes than raw), keep a `shortlist` per query,
    * re-rank ONLY those by exact cosine on the raw vectors (rejoined by
    * id — the [[pqRefineTopK]] two-stage shape). Rounded reduced
    * distances + id tie-break keep the shortlist engine-reproducible.
    * Output: (query_id, neighbor_id, rank, sim). */
  def jlTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Seq[Seq[Int]], shortlist: Int = 30,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      jlProject(col(vecCol), planes).as("rq")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      jlProject(col(vecCol), planes).as("rc"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rd").asc, col("neighbor_id").asc)
    val short = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rd", round(l2Sq(col("rq"), col("rc")), 6))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val raw = corpus.select(col(idCol).as("rid"), col(vecCol).as("rv"),
      l2Norm(col(vecCol)).as("rn"))
    // Q × shortlist candidate ids are tiny — broadcast them against the
    // raw-vector scan rather than shuffling the corpus.
    val scored = raw.join(broadcast(short), col("neighbor_id") === col("rid"))
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        l2Norm(col(vecCol)).as("qn"))), col("query_id") === col("qid"))
      .withColumn("sim", round(try_divide(dot(col("qv"), col("rv")),
        col("qn") * col("rn")), 6))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }
}
