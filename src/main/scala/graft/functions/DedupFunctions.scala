package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash. Designed for corpus scale:
  *
  *  - exact dedup is one hash-aggregate (map-side combine, single shuffle
  *    on a 16-byte key — never shuffles document text);
  *  - near-dup never does an all-pairs comparison: candidates come from an
  *    equi-join on shingles (n-gram path) or LSH band buckets (MinHash
  *    path), so the shuffle key is a token/band hash and skew is bounded
  *    by dropping ultra-frequent shingles (stopword shingles are the skew
  *    risk at 100 TB — `maxShingleFreq` caps them);
  *  - everything is column algebra (higher-order functions + joins); no
  *    UDFs, no driver-side loops.
  */
object DedupFunctions {

  /** Shingle-frequency cap policy for the candidate joins. A shingle
    * shared by f documents contributes f² candidate pairs, so uncapped
    * stopword-like shingles dominate the shuffle at corpus scale. Default
    * is [[ShingleCap.Auto]]: cap = max(64, ⌈√N⌉) for an N-document corpus
    * — ultra-frequent shingles carry no near-dup signal (they match
    * everything), while anything rarer than √N stays. [[ShingleCap.Uncapped]]
    * is the explicit opt-out (exact textbook Jaccard, e.g. the q15 oracle). */
  sealed trait ShingleCap
  object ShingleCap {
    case object Auto extends ShingleCap
    case object Uncapped extends ShingleCap
    final case class Fixed(cap: Int) extends ShingleCap

    /** The Auto policy's cap for an `nDocs`-document corpus. */
    def derive(nDocs: Long): Int =
      math.max(64L, math.ceil(math.sqrt(nDocs.toDouble)).toLong).toInt

    private[functions] def resolve(cap: ShingleCap, df: DataFrame): Option[Int] =
      cap match {
        case Uncapped => None
        case Fixed(c) => Some(c)
        case Auto => Some(derive(df.count())) // one cheap count on the corpus
      }
  }

  /** Distinct word n-gram shingles of a document; empty array for docs
    * shorter than n tokens (sequence() would otherwise step backwards and
    * produce an invalid slice start). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val count = size(toks) - (n - 1)
    array_distinct(
      when(count > 0, transform(sequence(lit(1), count), i =>
        concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Exact dedup: one representative (min id) per identical canonical
    * text, with the duplicate count. Shuffles only (fingerprint, id). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("text_hash"), col(idCol))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact n-gram Jaccard near-dup pairs above `threshold`.
    *
    * Plan shape: explode shingles → self-equi-join on shingle (only docs
    * sharing ≥1 shingle ever meet) → count shared per pair → Jaccard from
    * per-doc distinct-shingle counts. The join is the scale knob: shingle
    * frequency is capped by default ([[ShingleCap]]) because a shingle
    * shared by f docs contributes f² candidate pairs.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int, threshold: Double,
                        cap: ShingleCap = ShingleCap.Auto): DataFrame =
    sharedShingleCounts(df, textCol, idCol, n, cap)
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Containment near-dup pairs (Broder '97's asymmetric companion to
    * resemblance): c_a = |A∩B| / |A| — the fraction of A's shingles that
    * appear in B — and symmetrically c_b. A quote, mirror, or
    * concatenation that CONTAINS another document scores c_small ≈ 1
    * while its Jaccard stays low (the union is dominated by the larger
    * doc), so a Jaccard-only dedup sweep misses exactly the
    * subset-duplication case this catches. Same candidate machinery and
    * scale valves as [[ngramJaccardPairs]]; pairs emit when EITHER
    * direction clears `threshold`. */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int, threshold: Double,
                       cap: ShingleCap = ShingleCap.Auto): DataFrame =
    sharedShingleCounts(df, textCol, idCol, n, cap)
      .withColumn("c_a", col("shared").cast("double") / col("n_a").cast("double"))
      .withColumn("c_b", col("shared").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("c_a"), col("c_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("c_a"), 6).as("c_a"), round(col("c_b"), 6).as("c_b"))

  /** Cross-source duplicate-mass matrix: for every source pair, how many
    * canonical-fingerprint duplicates they share — the planning artifact
    * a corpus-level dedup starts from (which feeds mirror which; which
    * pair's overlap justifies a full near-dup sweep). One hash aggregate
    * to (fingerprint, source) — text never shuffles — then a
    * content-hash equi-join whose groups are bounded by duplication
    * multiplicity, never corpus size. Output: (src_a, src_b,
    * shared_docs), src_a < src_b. */
  def sourceOverlapMatrix(df: DataFrame, textCol: String,
                          sourceCol: String): DataFrame = {
    val f = df.select(TextFunctions.fingerprint(col(textCol)).as("h"),
      col(sourceCol).as("source")).distinct()
    f.as("a").join(f.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_docs"))
  }

  /** Shared candidate stage of the shingle-overlap family: per-pair
    * (id_a, id_b, n_a, n_b, shared) for documents meeting through at
    * least one common shingle. */
  private def sharedShingleCounts(df: DataFrame, textCol: String, idCol: String,
                                  n: Int, cap: ShingleCap): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val cand = ShingleCap.resolve(cap, df) match {
      case Some(c) =>
        // Capped path, in two constant-memory phases:
        //  1. count per shingle (partial-agg counters — NOT a collect; a
        //     hyper-frequent stopword shingle must never be materialized
        //     as one in-memory group) and keep only shingles ≤ c;
        //  2. join the keep-set back, THEN collect each surviving
        //     shingle's doc group — now genuinely bounded by the cap —
        //     and expand its ≤ c·(c−1)/2 pairs with a higher-order
        //     function. The collect agg reuses the join's shingle
        //     partitioning (no extra exchange), and the pair expansion
        //     replaces the self-join's two exchanges with none.
        val keep = exploded.groupBy(col("s")).agg(count(lit(1)).as("f"))
          .filter(col("f") <= c).select(col("s"))
        val grouped = exploded.join(keep, Seq("s"))
          .groupBy(col("s"))
          .agg(collect_list(struct(col("id"), col("n_sh"))).as("ds"))
        grouped.select(explode(flatten(transform(col("ds"), a =>
            transform(filter(col("ds"), b => b("id") > a("id")), b =>
              struct(a("id").as("id_a"), b("id").as("id_b"),
                a("n_sh").as("n_a"), b("n_sh").as("n_b")))))).as("p"))
          .select(col("p.id_a"), col("p.id_b"), col("p.n_a"), col("p.n_b"))
      case None =>
        // Uncapped (textbook) path: shingle self-equi-join. Group sizes are
        // unbounded here, so the join form is the safe one.
        val a = exploded.select(col("s"), col("id").as("id_a"), col("n_sh").as("n_a"))
        val b = exploded.select(col("s"), col("id").as("id_b"), col("n_sh").as("n_b"))
        a.join(b, Seq("s"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
    }
    cand
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the document's shingles. Column-level
    * (nested higher-order functions); for whole-table signatures prefer
    * [[minhashSignatures]] — codegen'd and partially aggregated. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)), seed =>
      array_min(transform(sh, s => xxhash64(s, seed))))

  /** Affine MinHash family for the portable path: ONE base hash per
    * shingle (35 low bits of [[TextFunctions.md5Long]]), then per seed i
    * `h_i = (a_i * h0 + b_i) & (2^40 - 1)` — the classic a·x+b universal
    * family, with widths chosen so the product never exceeds 2^55 (the
    * oracle engine's BIGINT errors on overflow instead of wrapping).
    * Constants come from the same splitmix mixing as
    * [[Similarity.deterministicPlanes]] — plain Scala, embeddable as
    * literals in an external SQL replay. */
  final val MinhashBaseMask: Long = (1L << 35) - 1
  final val MinhashOutMask: Long = (1L << 40) - 1
  def minhashCoeff(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 * 0x9E3779B97F4A7C15L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = (mix(i.toLong) & ((1L << 20) - 1)) | 1L // odd, < 2^20
    val b = mix(i.toLong + 1000) & MinhashOutMask   // < 2^40
    (a, b)
  }

  /** The pre-shingled `(id, sh)` projection every LSH stage consumes.
    * Callers that run MORE THAN ONE stage over the same corpus (signature
    * build + exact verify, or several tiers of a composed report) should
    * materialize this ONCE (`localCheckpoint`) and use the `…Shingled`
    * operator variants — shingling (tokenize + n-gram + distinct) is the
    * dominant per-byte cost of the whole MinHash chain, and at 100 TB
    * recomputing it per stage triples the corpus scan work. */
  def shingledDocs(df: DataFrame, textCol: String, idCol: String,
                   n: Int): DataFrame =
    df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))

  /** MinHash signatures for a whole table: explode shingles → `numHashes`
    * min-aggregates (map-side combine: one row per doc leaves each
    * mapper) → signature array. Returns (id, n_sh, sig). Default hashes
    * with seeded xxhash64 (fused codegen, the production choice);
    * `portable` switches to the md5-based affine family above so results
    * are value-checkable against any md5-capable SQL engine. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        n: Int, numHashes: Int,
                        portable: Boolean = false): DataFrame =
    minhashSignaturesFromShingles(
      shingledDocs(df, textCol, idCol, n), numHashes, portable)

  /** [[minhashSignatures]] over an already-shingled `(id, sh)` frame —
    * the single-pass entry point: hand it a localCheckpointed
    * [[shingledDocs]] projection and the corpus text is never re-read.
    * Same explode → seeded-min aggregate plan (codegen'd hashing,
    * map-side combine) as the text form; the two can never drift because
    * the text form delegates here. */
  def minhashSignaturesFromShingles(pre: DataFrame, numHashes: Int,
                                    portable: Boolean = false): DataFrame = {
    val sh = pre.select(col("id"), col("sh")).filter(size(col("sh")) > 0)
    val tok0 = sh.select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    // Portable: materialize the single base hash as a column so the 32
    // affine mins share it instead of re-hashing per seed.
    val tok = if (portable)
      tok0.withColumn("h0", TextFunctions.md5Long(col("s")).bitwiseAND(MinhashBaseMask))
    else tok0
    def seeded(i: Int): Column =
      if (portable) {
        val (a, b) = minhashCoeff(i)
        (col("h0") * a + b).bitwiseAND(MinhashOutMask)
      } else xxhash64(col("s"), lit(i))
    val mins = (1 to numHashes).map(i => min(seeded(i)).as(s"h$i"))
    tok.groupBy(col("id"), col("n_sh"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), col("n_sh"),
        array((1 to numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Band keys of a MinHash signature: band b's key is the (hashed, or in
    * portable mode raw joined-string) b-th row-slice of the signature.
    * ONE definition shared by the batch ([[minhashLshPairs]]) and
    * streaming ([[graft.streaming.StreamAggs.streamingNearDupCandidates]])
    * banding stages, so their buckets can never silently drift apart. */
  def bandKeyColumns(sig: Column, bands: Int, rowsPerBand: Int,
                     portable: Boolean = false): Seq[Column] =
    (0 until bands).map { b =>
      val s = concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))
      if (portable) s else xxhash64(s, lit(b))
    }

  /** MinHash + LSH banding near-dup candidates, exact-verified.
    *
    * sig → `bands` bands of `numHashes/bands` rows each; docs colliding on
    * any full band are candidates; candidates are then verified with the
    * exact Jaccard over shingles (so precision is exact; recall is the
    * standard LSH probability curve). Shuffle keys are (band, bandHash) —
    * uniformly distributed by construction.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      n: Int, numHashes: Int, bands: Int,
                      threshold: Double,
                      portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(df, textCol, idCol, n, numHashes, portable)
    // Band bucket key: the row-slice of the signature, compressed through
    // xxhash64 by default (8-byte shuffle key); left as the joined string
    // in portable mode so the oracle engine can form the same key.
    val banded = sig.select(col("id"), col("n_sh"),
      posexplode(array(bandKeyColumns(col("sig"), bands, rowsPerBand, portable): _*))
        .as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("n_sh").as("n_b"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .dropDuplicates("id_a", "id_b")
    // Exact verification: join the (small) candidate set back to the
    // shingle arrays — precision stays exact, only recall is probabilistic.
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cluster-safe MinHash+LSH near-dup in STAR form — the operator that
    * survives giant duplicate clusters. [[minhashLshPairs]] materializes
    * the full CLIQUE of every band bucket: a passage shared by k
    * documents yields Θ(k²) candidate pairs, which the r12 q292 scale
    * fit measured blowing up (51 s → 324 s over a 3× corpus, segment
    * exponent 1.67) once 20% of the corpus shared one planted passage.
    * For dedup-CUT purposes the clique is waste: each doc only needs
    * one earlier partner. This emits, per band bucket, pairs against
    * the bucket's EARLIEST doc only (exactly the semantics of the
    * streaming twin [[graft.streaming.StreamAggs
    * .streamingNearDupCandidates]], whose state holds one owner per
    * bucket) — candidates are ≤ |docs| × bands rows, LINEAR in the
    * corpus regardless of cluster structure. Trade-off: a doc whose
    * bucket owners all fail the exact verify is not flagged even if
    * some non-owner co-occupant would have verified — the same bounded
    * recall the streaming operator documents. Output
    * (id_a = bucket owner, id_b, jaccard), verified exactly. */
  def minhashLshStarPairs(df: DataFrame, textCol: String, idCol: String,
                          n: Int, numHashes: Int, bands: Int,
                          threshold: Double,
                          portable: Boolean = false): DataFrame =
    minhashLshStarPairsShingled(shingledDocs(df, textCol, idCol, n),
      numHashes, bands, threshold, portable)

  /** [[minhashLshStarPairs]] over a pre-shingled `(id, sh)` frame (see
    * [[shingledDocs]]): both the signature build AND the exact-Jaccard
    * verify read the SAME arrays, so with a localCheckpointed input the
    * corpus is shingled exactly once per sweep instead of twice. */
  def minhashLshStarPairsShingled(pre: DataFrame, numHashes: Int, bands: Int,
                                  threshold: Double,
                                  portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignaturesFromShingles(pre, numHashes, portable)
    val banded = sig.select(col("id"), col("n_sh"),
      posexplode(array(bandKeyColumns(col("sig"), bands, rowsPerBand, portable): _*))
        .as(Seq("band", "bh")))
    // One owner per occupied bucket (map-side combined min), then each
    // later co-occupant pairs with the owner only.
    val owners = banded.groupBy(col("band"), col("bh"))
      .agg(min(col("id")).as("id_a"), min_by(col("n_sh"), col("id")).as("n_a"))
    val cand = banded
      .join(owners, Seq("band", "bh"))
      .filter(col("id") > col("id_a"))
      .select(col("id_a"), col("id").as("id_b"), col("n_a"), col("n_sh").as("n_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(pre.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(pre.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental MinHash+LSH near-dup PROBE — delta documents against an
    * existing corpus, the index-maintenance twin of [[minhashLshPairs]]:
    * instead of the corpus×corpus self-join, only the NEW documents'
    * band keys probe the base corpus's band rows, so per ingest batch
    * the candidate join touches |delta| × bands rows against the
    * bucketed base index — never re-pairing base×base. This is the
    * batch form of [[graft.streaming.StreamAggs
    * .streamingNearDupCandidates]]'s band-key state: at 100 TB the base
    * band rows live as a table bucketed by (band, bh), appended per
    * batch, and each new batch's probe is one co-located equi-join.
    * Same signatures, band keys ([[bandKeyColumns]] — ONE definition),
    * and exact-Jaccard verify as the batch operator. Caller keeps
    * base/delta disjoint. Output: (id_new, id_base, jaccard). */
  def minhashLshProbe(base: DataFrame, delta: DataFrame,
                      textCol: String, idCol: String,
                      n: Int, numHashes: Int, bands: Int,
                      threshold: Double,
                      portable: Boolean = false): DataFrame =
    minhashLshProbeShingled(
      shingledDocs(base, textCol, idCol, n),
      shingledDocs(delta, textCol, idCol, n),
      numHashes, bands, threshold, portable)

  /** [[minhashLshProbe]] over pre-shingled `(id, sh)` frames (see
    * [[shingledDocs]]). A caller holding one corpus split into
    * base/delta should shingle the WHOLE corpus once, localCheckpoint,
    * and filter the cached frame into the two sides — each side's
    * signature build and exact verify then read the same arrays, so
    * per ingest batch the text is shingled exactly once instead of
    * three times (the r12-measured cost of q291's text-form draft). */
  def minhashLshProbeShingled(baseSh: DataFrame, deltaSh: DataFrame,
                              numHashes: Int, bands: Int,
                              threshold: Double,
                              portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    def banded(pre: DataFrame) = {
      val sig = minhashSignaturesFromShingles(pre, numHashes, portable)
      sig.select(col("id"), col("n_sh"),
        posexplode(array(bandKeyColumns(col("sig"), bands, rowsPerBand, portable): _*))
          .as(Seq("band", "bh")))
    }
    val b = banded(baseSh).select(col("band"), col("bh"),
      col("id").as("id_base"), col("n_sh").as("n_b"))
    val d = banded(deltaSh).select(col("band"), col("bh"),
      col("id").as("id_new"), col("n_sh").as("n_a"))
    val cand = d.join(b, Seq("band", "bh"))
      .select(col("id_new"), col("id_base"), col("n_a"), col("n_b"))
      .dropDuplicates("id_new", "id_base")
    val shB = baseSh.select(col("id").as("id_base"), col("sh").as("sh_b"))
    val shD = deltaSh.select(col("id").as("id_new"), col("sh").as("sh_a"))
    cand
      .join(shD, Seq("id_new"))
      .join(shB, Seq("id_base"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_base"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: documents whose 64-bit signatures are within
    * `maxHamming`. Candidates come from equality on `maxHamming + 1`
    * signature chunks (a pair within Hamming ≤ h differing in every one of
    * h+1 chunks would need h+1 differing bits — pigeonhole guarantees a
    * matching chunk), so again an equi-join, never all-pairs. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int): DataFrame = {
    val sig = TextFunctions.simhashSignatures(df, textCol, idCol)
      .withColumnRenamed(idCol, "id")
    simhashPairsFromSignatures(sig, maxHamming)
  }

  /** Pair-finding over precomputed (id, sig) signatures. The 64 bits are
    * partitioned into exactly `maxHamming + 1` disjoint chunks of width
    * ⌊64/n⌋ or ⌈64/n⌉ (ceil-width uniform chunks would exceed 64 bits for
    * many n and alias back to chunk 0 through Java's shift-mod-64). */
  def simhashPairsFromSignatures(sig: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming out of range")
    val numChunks = maxHamming + 1
    // Disjoint cover of bits [0,64): first (64 % n) chunks get the extra bit.
    val base = 64 / numChunks
    val extra = 64 % numChunks
    val widths = Seq.tabulate(numChunks)(i => if (i < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkExprs = offsets.zip(widths).map { case (off, w) =>
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftright(col("sig"), off).bitwiseAND(mask)
    }
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array(chunkExprs: _*)).as(Seq("chunk", "cv")))
    val a = chunked.select(col("chunk"), col("cv"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("cv"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", TextFunctions.hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** MinHash+LSH similarity over arbitrary SETS given as (id, member)
    * rows — the set-shaped twin of [[minhashLshPairs]] (which shingles
    * text first). Use it when the sets already exist as relations:
    * graph neighborhoods (q130), tag/label sets, basket contents.
    *
    * Same portable affine family ([[minhashCoeff]]) and the same band
    * slicing ([[bandKeyColumns]], portable mode), so an external SQL
    * engine replays every hash. Signature build is ONE pass over the
    * membership rows (map-side-combined min aggregates — a hub's set
    * never materializes as a single row); exact verification counts
    * |A∩B| through a member equi-join restricted to candidates, so
    * precision is exact and arrays never form. Output: (id_a, id_b,
    * common, n_a, n_b, jaccard ≥ threshold), jaccard rounded to 6.
    */
  def setMinhashPairs(sets: DataFrame, idCol: String, memberCol: String,
                      numHashes: Int, bands: Int,
                      threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // localCheckpoint: the distinct membership feeds FOUR consumers
    // (sizes, signature build, both sides of the exact verify) — without
    // it the caller's set derivation (often a self-join + union chain)
    // re-executes per consumer.
    val m = sets.select(col(idCol).as("id"),
      col(memberCol).cast("string").as("mb")).distinct().localCheckpoint()
    val sizes = m.groupBy(col("id")).agg(count(lit(1)).as("n_m"))
    val tok = m.withColumn("h0",
      TextFunctions.md5Long(col("mb")).bitwiseAND(MinhashBaseMask))
    val mins = (1 to numHashes).map { i =>
      val (a, b) = minhashCoeff(i)
      min((col("h0") * a + b).bitwiseAND(MinhashOutMask)).as(s"h$i")
    }
    val sig = tok.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((1 to numHashes).map(i => col(s"h$i")): _*).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(array(bandKeyColumns(col("sig"), bands, rowsPerBand,
        portable = true): _*)).as(Seq("band", "bh")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val common = cand
      .join(m.select(col("id").as("id_a"), col("mb")), Seq("id_a"))
      .join(m.select(col("id").as("id_b"), col("mb")), Seq("id_b", "mb"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n_m").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_m").as("n_b")), "id_b")
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("n_a"),
        col("n_b"), col("jaccard"))
  }
}
