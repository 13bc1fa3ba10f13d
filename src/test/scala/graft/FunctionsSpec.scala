package graft

import graft.functions.{DedupFunctions, Multimodal, RobustStats, Similarity, TextFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data-pipeline operators: text analysis, near-dup families,
  * ANN, multimodal stubs — the properties the DuckDB oracle can't check
  * (xxhash64-based paths) are asserted here. */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenization + counts") {
    val df = Seq("The  quick Brown fox", "", "one").toDF("text")
    val got = df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect()
    assert(got(0) == 4 && got(2) == 1)
    val bpe = Seq("ab 12 c.").toDF("text")
      .select(TextFunctions.bpeishTokenCount(col("text"))).as[Int].head()
    assert(bpe == 5) // ab, 1, 2, c, .
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("t1", "t2")
    val eq = df.select((TextFunctions.fingerprint(col("t1")) ===
      TextFunctions.fingerprint(col("t2"))).as("e")).as[Boolean].collect()
    assert(eq(0) && !eq(1))
  }

  test("langId picks the language with most distinct stopword hits") {
    val df = Seq("the cat of the house and a dog", "el perro de la casa y un gato").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(got(0) == "en" && got(1) == "es")
  }

  test("simhash: identical text → identical sig; near-identical → small hamming") {
    val base = "spark window merge join filter scan table batch stream row column"
    val near = base.replace("column", "columns")
    val far = "completely different words entirely unrelated content here now"
    val df = Seq(base, base, near, far).toDF("text")
    val sigs = df.select(TextFunctions.simhash64(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(2)) < ham(sigs(0), sigs(3)))
  }

  test("shingles: distinct word n-grams") {
    val got = Seq("a b c b c").toDF("t")
      .select(DedupFunctions.shingles(col("t"), 2)).as[Seq[String]].head()
    assert(got.toSet == Set("a b", "b c", "c b"))
  }

  test("shingles: docs shorter than n yield an empty array, not a crash") {
    val got = Seq("hello", "", "a b").toDF("t")
      .select(DedupFunctions.shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)
    // and the pair finders survive a corpus containing short docs
    val corpus = Seq((1L, "x"), (2L, "a b c d"), (3L, "a b c d")).toDF("doc_id", "text")
    val pairs = DedupFunctions.ngramJaccardPairs(corpus, "text", "doc_id", 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("ShingleCap: Auto derives max(64, ceil(sqrt(N))); cap actually drops frequent shingles") {
    import DedupFunctions.ShingleCap
    assert(ShingleCap.derive(0) == 64 && ShingleCap.derive(100) == 64)
    assert(ShingleCap.derive(4096) == 64 && ShingleCap.derive(10000) == 100)
    assert(ShingleCap.derive(1000000) == 1000)
    // corpus where one shingle ("a b") is in every doc, rare shingles pair up
    val corpus = (1L to 6L).map(i => (i, s"a b c$i d${i % 2}")).toDF("doc_id", "text")
    val uncapped = DedupFunctions.ngramJaccardPairs(corpus, "text", "doc_id", 2, 0.1,
      ShingleCap.Uncapped).count()
    val capped = DedupFunctions.ngramJaccardPairs(corpus, "text", "doc_id", 2, 0.1,
      ShingleCap.Fixed(2)).count()
    assert(uncapped == 15 && capped < uncapped) // cap provably filters
    // Auto on a tiny corpus: cap=64 never fires → identical to uncapped
    val auto = DedupFunctions.ngramJaccardPairs(corpus, "text", "doc_id", 2, 0.1).count()
    assert(auto == uncapped)
  }

  test("simhashPairs pigeonhole boundary: h bits spread one-per-chunk still pair") {
    // For each maxHamming, craft the adversarial signature: exactly
    // maxHamming differing bits, one in each of the first maxHamming
    // chunks — the pair must still collide on the last chunk.
    for (h <- Seq(3, 7, 8, 16, 23, 31)) {
      val numChunks = h + 1
      val base = 64 / numChunks
      val extra = 64 % numChunks
      val widths = Seq.tabulate(numChunks)(i => if (i < extra) base + 1 else base)
      val offsets = widths.scanLeft(0)(_ + _).init
      val flipped = offsets.take(h).foldLeft(0L)((sig, off) => sig | (1L << off))
      val sigs = Seq((1L, 0L), (2L, flipped)).toDF("id", "sig")
      val pairs = DedupFunctions.simhashPairsFromSignatures(sigs, h)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      assert(pairs == Set((1L, 2L, h)), s"maxHamming=$h")
      // one more bit than allowed → excluded by the hamming filter
      val over = flipped | (1L << offsets(h))
      val none = DedupFunctions.simhashPairsFromSignatures(
        Seq((1L, 0L), (2L, over)).toDF("id", "sig"), h).count()
      assert(none == 0, s"maxHamming=$h over-distance pair leaked")
    }
  }

  test("exactDedup groups identical canonical texts") {
    val df = Seq((1L, "Hello  world"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val got = DedupFunctions.exactDedup(df, "text", "doc_id")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("MinhashSigExpression kernel is bit-identical to the HOF minhashSignature") {
    // The streaming near-dup operator signs documents with the native
    // kernel; the batch family's definition is the HOF column form. This
    // pins them equal over a real corpus slice (varied lengths, unicode,
    // sub-n-token docs excluded by the shared size>0 filter) plus edge
    // shapes, so the streaming and batch band buckets can never drift.
    import graft.functions.MinhashSigExpression
    val docs = Tables.documents(spark, sf("sf0.001")).limit(200)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "one"), (900002L, "exactly two tokens"),
        (900003L, "naïve café résumé — unicode token bytes"))
        .toDF("doc_id", "text"))
    val sh = docs.select(col("doc_id"),
        DedupFunctions.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      // NULL elements too (r13 review): the HOF path skips a null
      // shingle inside xxhash64 (running hash stays 42L before the seed
      // mix); the kernel must produce the identical signature, not NPE.
      .unionByName(Seq(910001L, 910002L).toDF("doc_id")
        .select(col("doc_id"), array(lit("alpha beta"),
          lit(null).cast("string"), lit("gamma delta")).as("sh")))
    val mismatches = sh.select(col("doc_id"),
        DedupFunctions.minhashSignature(col("sh"), 32).as("hof"),
        MinhashSigExpression.minhashSig(col("sh"), 32).as("native"))
      .filter(not(col("hof") === col("native")))
      .count()
    assert(mismatches == 0L)
  }

  test("minhash LSH finds injected near-duplicates with exact jaccard") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(60)
    // inject: copy of doc 0's text with one word appended → jaccard ≈ 0.95+
    val dup = docs.filter(col("doc_id") === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(dup)
    val pairs = DedupFunctions.minhashLshPairs(corpus, "text", "doc_id",
      n = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100000L)))
    // precision: every reported pair really has jaccard ≥ 0.5 (exact verify path)
    val exact = DedupFunctions.ngramJaccardPairs(corpus, "text", "doc_id", 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact))
  }

  test("minhashLshProbe: delta-vs-base probe equals the straddling slice of the full self-join") {
    // The incremental-maintenance contract: probing a new batch against
    // the existing corpus's band index finds exactly the full pair
    // sweep's base↔delta pairs (base×base pairs are the already-known
    // slice a maintained index never recomputes; delta×delta pairs are
    // the next sweep's intra-batch slice, handled separately).
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    val probed = DedupFunctions.minhashLshProbe(base, delta, "text", "doc_id",
        n = 2, numHashes = 32, bands = 16, threshold = 0.05)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(probed.nonEmpty)
    val full = DedupFunctions.minhashLshPairs(docs, "text", "doc_id",
        n = 2, numHashes = 32, bands = 16, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val straddling = full.collect {
      case (a, b) if a % 7 == 0 && b % 7 != 0 => (a, b)
      case (a, b) if b % 7 == 0 && a % 7 != 0 => (b, a)
    }
    assert(probed == straddling,
      s"extra=${probed -- straddling} missing=${straddling -- probed}")
  }

  test("minhashLshStarPairs: star pairs are clique pairs, every owner is the earliest, cluster stays linear") {
    // Plant a 6-doc duplicate cluster: the clique form emits C(6,2)=15
    // pairs for it; the star form must emit exactly 5 (every later doc
    // against the earliest), and every star pair must also be a
    // verified clique pair (same buckets, same verify).
    val passage = "the quick brown fox jumps over the lazy dog again and again today"
    val cluster = (10L to 15L).map(i => (i, passage))
    val noise = Seq((1L, "completely unrelated text about warehouse compaction"),
      (2L, "another standalone document with its own words entirely"))
    val docs = (cluster ++ noise).toDF("doc_id", "text")
    val star = DedupFunctions.minhashLshStarPairs(docs, "text", "doc_id",
        n = 2, numHashes = 32, bands = 16, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clique = DedupFunctions.minhashLshPairs(docs, "text", "doc_id",
        n = 2, numHashes = 32, bands = 16, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clique.size === 15, s"clique of 6 identical docs: $clique")
    assert(star === (11L to 15L).map(i => (10L, i)).toSet,
      s"star = 5 pairs against the earliest doc: $star")
    assert(star.subsetOf(clique))
  }

  test("simhashPairs finds exact duplicates via chunk pigeonhole") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "unrelated totally different text body")).toDF("doc_id", "text")
    val pairs = DedupFunctions.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("brute-force ANN: identical vector is rank-1 neighbor") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val clone = e.filter(col("vec_id") === 3)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(clone)
    val top = Similarity.bruteForceTopK(corpus.filter(col("vec_id") === 100003), corpus, 5)
    val first = top.filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(first == 3L)
  }

  test("SRP-LSH ANN: identical vectors share a bucket; results ⊆ brute-force order") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val clone = e.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(clone)
    val q = corpus.filter(col("vec_id") === 100007)
    val got = Similarity.lshTopK(q, corpus, k = 5, bits = 8, probeHamming = 1)
    val first = got.filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(first == 7L) // exact twin guaranteed same bucket
  }

  test("IVF ANN: centroids self-assign; identical twin found at rank 1") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val centroids = e.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    // a centroid vector's nearest centroid is itself (cosine 1)
    val cells = e.filter(col("vec_id") < 16)
      .select(col("vec_id"), Similarity.ivfCell(col("embedding"), centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(cells.forall { case (id, cell) => cell == id.toInt })
    // an exact twin lands in the same cell, which the query probes first
    val clone = e.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(clone)
    val got = Similarity.ivfTopK(corpus.filter(col("vec_id") === 100007), corpus,
      k = 5, nprobe = 4, centroids)
    val first = got.filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(first == 7L)
  }

  test("kmeansRefine improves the mean cosine to the assigned centroid") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    def model(c: Seq[(Int, Seq[Double])]): Double = {
      val cellSims = c.map { case (id, cv) =>
        struct(Similarity.cosine(col("embedding"),
          array(cv.map(lit): _*)).as("sim"), lit(-id).as("nid"))
      }
      e.select(array_max(array(cellSims: _*)).getField("sim").as("best"))
        .agg(avg("best")).as[Double].head()
    }
    val init = e.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val refined = Similarity.kmeansRefine(e, init, iters = 2)
    assert(refined.map(_._1) == init.map(_._1)) // ids preserved
    assert(refined.forall(_._2.length == 64))
    // Lloyd steps cannot worsen the spherical objective (tolerance for FP)
    assert(model(refined) >= model(init) - 1e-9)
    // and on this data the sampled init is genuinely improvable
    assert(model(refined) > model(init))
  }

  test("cosineNearDupPairs finds the injected twin") {
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(100)
    val clone = e.filter(col("vec_id") === 9)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val pairs = Similarity.cosineNearDupPairs(e.unionByName(clone), threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((9L, 100009L)))
  }

  test("cosineNearDupProbe: delta-vs-base probe equals the straddling slice of the full self-join") {
    // The embedding-grain incremental-maintenance contract (the
    // minhashLshProbe property at vector grain): probing new vectors
    // against the base corpus's SRP band index finds exactly the full
    // pair sweep's base↔delta pairs.
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // Perturbed copies as the delta so verified near-dups exist.
    val delta = e.filter(col("vec_id") % 17 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.25)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val probed = Similarity.cosineNearDupProbe(e, delta, threshold = 0.9)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(probed.nonEmpty)
    val full = Similarity.cosineNearDupPairs(e.unionByName(delta), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val straddling = full.collect {
      case (a, b) if a >= 1000000L && b < 1000000L => (a, b)
      case (a, b) if b >= 1000000L && a < 1000000L => (b, a)
    }
    assert(probed == straddling,
      s"extra=${probed -- straddling} missing=${straddling -- probed}")
  }

  test("portable md5 hash: known value, and portable minhash pairs match default recall") {
    // md5("abc") = 900150983cd24fb0... -> first 15 hex chars as a 60-bit int.
    val v = Seq("abc").toDF("s")
      .select(TextFunctions.md5Long(col("s"))).as[Long].head()
    assert(v == 648541476951500027L)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val pairs = DedupFunctions.minhashLshPairs(docs, "text", "doc_id",
      n = 2, numHashes = 32, bands = 16, threshold = 0.3, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhashSignaturesHex: 16-char hex, identical text identical, disjoint text differs") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "xx yy zz ww"))
      .toDF("doc_id", "text")
    val sigs = TextFunctions.simhashSignaturesHex(docs, "text", "doc_id")
      .orderBy("doc_id").select("sig").as[String].collect()
    assert(sigs.forall(s => s.length == 16 && s.matches("[0-9a-f]{16}")))
    assert(sigs(0) == sigs(1) && sigs(0) != sigs(2))
  }

  test("deterministic SRP planes: stable values, scaled copies share a bucket") {
    val p1 = Similarity.deterministicPlanes(8, 64)
    val p2 = Similarity.deterministicPlanes(8, 64)
    assert(p1 == p2 && p1.length == 8 && p1.head.length == 64)
    assert(p1.flatten.forall(s => s == 1 || s == -1))
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 2.0f, 0.25f)),
      (2L, Array(1.0f, -2.0f, 4.0f, 0.5f)), // 2x scaling: same direction
      (3L, Array(-0.5f, 1.0f, -2.0f, -0.25f))
    ).toDF("vec_id", "embedding")
    val planes = Similarity.deterministicPlanes(8, 4)
    val b = vecs.select(col("vec_id"),
      Similarity.srpBucketPlanes(col("embedding"), planes).as("b"))
      .orderBy("vec_id").select("b").as[Int].collect()
    assert(b(0) == b(1))
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.99,
      planes = planes)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("q32 finds the injected perturbed embedding copies (not just oracle-equal)") {
    // The oracle gate proves Spark == DuckDB; this pins that the answer is
    // also non-degenerate: injected near-dup pairs are actually found and
    // every reported pair is an injected one (the corpus has no natural
    // near-dups above the threshold).
    val got = QueriesExt.q32CosineNearDup(spark, sf("sf0.001"))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.nonEmpty, "no injected near-dup pairs found")
    assert(got.forall { case (a, b) => b == a + 1000000L },
      s"unexpected non-injected pair among ${got.take(5).toSeq}")
  }

  test("lshTopK with literal planes agrees with brute force on shared buckets") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat))).toDF("vec_id", "embedding")
    val planes = Similarity.deterministicPlanes(6, 8)
    val lsh = Similarity.lshTopK(vecs.filter(col("vec_id") < 2), vecs, k = 5,
      bits = 6, probeHamming = 1, planes = planes)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(lsh.nonEmpty, "LSH returned no candidates — bucket join broken")
    val brute = Similarity.bruteForceTopK(vecs.filter(col("vec_id") < 2), vecs, k = 40)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // LSH candidates are a subset; their relative order must match brute force.
    for ((q, grp) <- lsh.groupBy(_._1)) {
      val got = grp.sortBy(_._3).map(_._2).toSeq
      val expectOrder = brute(q).filter(got.contains)
      assert(got == expectOrder.take(got.length))
    }
  }

  test("multimodal: REAL png encode→decode round-trip, resize, corrupt quarantine") {
    val rows = Seq((1L, 20, 10), (2L, 9, 17), (3L, 33, 33))
      .toDF("id", "w", "h")
    // round-trip: synthesized dims come back from a genuine ImageIO decode
    val dec = rows.select(col("id"),
        Multimodal.decodeImage(Multimodal.synthPng(col("w"), col("h"), col("id"))).as("d"))
      .select(col("id"), col("d.width"), col("d.height"), col("d.channels"),
        col("d.format"), col("d.pixel_sha256"))
      .as[(Long, Int, Int, Int, String, String)].collect().sortBy(_._1)
    assert(dec.map(t => (t._2, t._3)).toSeq == Seq((20, 10), (9, 17), (33, 33)))
    assert(dec.forall(t => t._4 == 3 && t._5 == "png" && t._6.length == 64))
    // pixel hash is content-derived: different seeds → different hashes
    assert(dec.map(_._6).distinct.length == 3)
    // decode is deterministic across invocations
    val again = rows.select(Multimodal.decodeImage(
        Multimodal.synthPng(col("w"), col("h"), col("id"))).getField("pixel_sha256"))
      .as[String].collect().sorted
    assert(again.toSeq == dec.map(_._6).sorted.toSeq)
    // resize: aspect-preserving integer fit into a 16x16 box, re-decodable
    val rz = rows.select(col("id"), Multimodal.decodeImage(Multimodal.resizeImage(
        Multimodal.synthPng(col("w"), col("h"), col("id")), 16, 16)).as("d"))
      .select(col("id"), col("d.width"), col("d.height"))
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // 20x10 → scale=min(160,320)=160 → (20*160/200, 10*160/200) = (16, 8)
    // 9x17  → scale=min(272,144)=144 → (9*144/153, 17*144/153) = (8, 16)
    // 33x33 → (16, 16)
    assert(rz.map(t => (t._2, t._3)).toSeq == Seq((16, 8), (8, 16), (16, 16)))
    // corrupt payloads: truncated PNG and non-image bytes → NULL lane
    val bad = Seq(Array[Byte](1, 2, 3), "not an image".getBytes("UTF-8"))
      .toDF("b").select(Multimodal.decodeImage(col("b")).as("d"),
        Multimodal.resizeImage(col("b"), 16, 16).as("r"))
    assert(bad.filter(col("d").isNotNull || col("r").isNotNull).count() == 0)
    // truncated REAL png header (first 10 bytes) also quarantines
    val trunc = rows
      .select(Multimodal.synthPng(col("w"), col("h"), col("id")).as("png"))
      .select(Multimodal.decodeImage(expr("substring(png, 1, 10)")).as("d"))
    assert(trunc.filter(col("d").isNotNull).count() == 0)
  }

  test("multimodal: REAL wav encode→decode round-trip, windowed energy, corrupt quarantine") {
    val rows = Seq((1L, 8000, 4000), (2L, 16000, 16000), (3L, 8000, 12345))
      .toDF("id", "sr", "n")
    // round-trip: header fields come back from a genuine javax.sound parse
    val dec = rows.select(col("id"), col("sr"), col("n"),
        Multimodal.decodeAudio(Multimodal.synthWav(col("id"), col("sr"), col("n"))).as("d"))
      .select(col("id"), col("sr"), col("n"), col("d.encoding"), col("d.sample_rate"),
        col("d.channels"), col("d.bits"), col("d.frames"), col("d.duration_ms"),
        col("d.pcm_sha256"))
      .as[(Long, Int, Int, String, Int, Int, Int, Long, Long, String)]
      .collect().sortBy(_._1)
    dec.foreach { t =>
      assert(t._4 == "pcm_signed" && t._5 == t._2 && t._6 == 1 && t._7 == 16)
      assert(t._8 == t._3.toLong, s"frames ${t._8} != samples ${t._3}")
      assert(t._9 == t._3.toLong * 1000 / t._2)
      assert(t._10.length == 64)
    }
    // content hash distinguishes seeds, and decode is deterministic
    assert(dec.map(_._10).distinct.length == 3)
    // windowed RMS energy: ceil(frames/windowFrames) windows, all
    // positive for LCG noise, deterministic
    val en = rows.select(col("id"), col("sr"), col("n"), Multimodal.audioEnergy(
        Multimodal.synthWav(col("id"), col("sr"), col("n")), 100).as("e"))
      .as[(Long, Int, Int, Seq[Long])].collect().sortBy(_._1)
    en.foreach { case (_, sr, n, e) =>
      val wf = sr * 100 / 1000
      assert(e.length == (n + wf - 1) / wf, s"windows ${e.length} for n=$n wf=$wf")
      // 16-bit uniform noise RMS ≈ 32768/sqrt(3) ≈ 18918 — wide tolerance
      assert(e.forall(v => v > 10000 && v < 30000), e.take(5))
    }
    // corrupt payloads (truncated header, non-audio bytes) → NULL lane
    val bad = Seq(Array[Byte](82, 73, 70, 70, 1, 2, 3), "not audio".getBytes("UTF-8"))
      .toDF("b").select(Multimodal.decodeAudio(col("b")).as("d"),
        Multimodal.audioEnergy(col("b"), 100).as("e"))
    assert(bad.filter(col("d").isNotNull || col("e").isNotNull).count() == 0)
  }

  test("multimodal: payload schema, deterministic stubs, metadata grouping") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(20)
    val mm = Multimodal.multimodalize(docs, "text", "doc_id")
    assert(mm.schema("payload").dataType == BinaryType)
    val metaFields = mm.schema("meta").dataType.asInstanceOf[StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.metaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val img = mm.select(col("image.width"), col("image.height"), col("image.channels"))
      .as[(Int, Int, Int)].collect()
    assert(img.forall { case (w, h, c) => w >= 32 && h >= 32 && c >= 1 && c <= 3 })
    // determinism: same content → same stub decode
    val again = Multimodal.multimodalize(docs, "text", "doc_id")
      .select(col("image.width")).as[Int].collect()
    assert(again.toSeq == mm.select(col("image.width")).as[Int].collect().toSeq)
    // feature stub: right dim, bounded values
    val feats = docs.select(Multimodal.extractFeaturesStub(
      Multimodal.toPayload(col("text")), 16).as("f")).as[Seq[Double]].head()
    assert(feats.length == 16 && feats.forall(v => v >= -0.5 && v < 0.5))
    // frame sampling stub: monotonically increasing timestamps
    val frames = docs.limit(1).select(Multimodal.frameSampleStub(
      Multimodal.toPayload(col("text")), 5000).as("fr"))
      .select(col("fr.frame_ts_ms")).as[Seq[Long]].head()
    assert(frames == frames.sorted && frames.nonEmpty)
    // resize stub: dims fit the requested box, aspect preserved-ish,
    // payload re-keyed (new bytes, as a real re-encode would produce)
    val rz = mm.select(col("payload"),
        Multimodal.resizeStub(col("payload"), 640, 480).as("r"))
      .select(col("r.image.width"), col("r.image.height"),
        (col("r.payload") =!= col("payload")).as("rekeyed"))
      .as[(Int, Int, Boolean)].collect()
    assert(rz.forall { case (w, h, rk) => w <= 640 && h <= 480 && rk })
    // large target box: width*scale crosses Int range — stays positive
    val big = mm.select(Multimodal.resizeStub(col("payload"), 1920, 1080).as("r"))
      .select(col("r.image.width"), col("r.image.height")).as[(Int, Int)].collect()
    assert(big.forall { case (w, h) => w > 0 && w <= 1920 && h > 0 && h <= 1080 })
  }

  test("splits are deterministic, complete, and roughly proportioned") {
    import graft.functions.Splits
    val docs = Tables.documents(spark, sf("sf0.001"))
    val s1 = Splits.withSplit(docs, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Splits.withSplit(docs, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2 && s1.size == 500)
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 500.0).toMap
    assert(frac("train") > 0.6 && frac("val") > 0.05 && frac("test") > 0.05)
  }

  test("packDocs: concat-and-chunk assignment, straddle flag, zero-token docs") {
    import graft.functions.Packing
    // budget 10, one shard: tokens 4,4,4 start at 0,4,8 — the third doc
    // crosses the first cut; a zero-token doc occupies no space.
    val df = Seq((1L, 4L, 0), (2L, 4L, 0), (3L, 4L, 0), (4L, 0L, 0), (5L, 12L, 0),
      (6L, 3L, 1)) // second shard packs independently from offset 0
      .toDF("doc_id", "n_tok", "shard")
    val got = Packing.packDocs(df, col("n_tok"), 10L, col("shard"), Seq(col("doc_id")))
      .select("doc_id", "pack_id", "pack_offset", "straddles")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, false), (2L, 0L, 4L, false), (3L, 0L, 8L, true),
      (4L, 1L, 2L, false), // zero tokens: inherits position 12, no straddle
      (5L, 1L, 2L, true),  // spans 12..24: crosses two cuts
      (6L, 0L, 0L, false)))
  }

  test("repetition score: repeated text scores high, varied text zero") {
    import graft.functions.Splits
    val df = Seq("spam spam spam spam spam spam", "one two three four five", "x").toDF("text")
    val got = df.select(Splits.repetitionScore(col("text"), 2)).as[Double].collect()
    assert(got(0) > 0.7 && got(1) == 0.0 && got(2) == 0.0)
  }

  test("PII redaction replaces emails, phones, IPs; leaves prose intact") {
    val df = Seq(
      "reach me at jane.doe+spam@corp.example.org today",
      "call (555) 123-4567 or +1 555.987.6543",
      "server 10.0.254.3 responded",
      "no pii here at all").toDF("text")
    val got = df.select(TextFunctions.redactPii(col("text"))).as[String].collect()
    assert(got(0) == "reach me at [EMAIL] today")
    assert(got(1).contains("[PHONE]") && !got(1).exists(_.isDigit))
    assert(got(2) == "server [IP] responded")
    assert(got(3) == "no pii here at all")
  }

  test("quality score is in [0,1] and favors stopword-bearing prose") {
    val df = Seq("the cat and the dog in the house with a ball",
      "zxqv wvut ppo").toDF("text")
    val got = df.select(TextFunctions.qualityScore(col("text"))).as[Double].collect()
    assert(got.forall(v => v >= 0.0 && v <= 1.0))
    assert(got(0) > got(1))
  }

  test("bm25TopTerms: rare discriminating term outranks ubiquitous filler") {
    import graft.functions.Relevance
    // "rust" appears only in doc 1; "the" is in every doc and repeats —
    // classic BM25: the rare term must score above the stopword.
    val docs = Seq(
      (1L, "the the rust compiler the the"),
      (2L, "the the spark engine the the"),
      (3L, "the the query planner the the")).toDF("doc_id", "text")
    val top = Relevance.bm25TopTerms(docs, "text", "doc_id", topK = 4)
      .select("doc_id", "term", "bm25")
      .as[(Long, String, Double)].collect()
    val d1 = top.filter(_._1 == 1L).sortBy(-_._3)
    assert(d1.head._2 == "rust" || d1.head._2 == "compiler")
    val rust = d1.find(_._2 == "rust").get._3
    val the = d1.find(_._2 == "the").map(_._3).getOrElse(0.0)
    assert(rust > the, s"rust=$rust should outrank the=$the")
    // top-k bound respected per doc
    assert(top.groupBy(_._1).forall(_._2.length <= 4))
  }

  test("heavyHitters: exact counts, deterministic tie-break, limit k") {
    import graft.functions.Relevance
    val docs = Seq((1L, "b a a c"), (2L, "a b c"), (3L, "b z")).toDF("doc_id", "text")
    val hh = Relevance.heavyHitters(docs, "text", "doc_id", k = 3)
      .as[(String, Long, Long)].collect()
    // a: 3 occurrences / 2 docs; b: 3 / 3 docs; c: 2 / 2; z: 1 / 1.
    // Count ties (a, b) break alphabetically.
    assert(hh.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(hh(0) == ("a", 3L, 2L) && hh(1) == ("b", 3L, 3L) && hh(2) == ("c", 2L, 2L))
  }

  test("stripBoilerplate drops only corpus-frequent blocks, preserves order") {
    import graft.functions.Boilerplate
    // Block "copyright acme" opens every doc (boilerplate); the rest is
    // unique per doc. blockWords=2, threshold 50% of 4 docs.
    val docs = Seq(
      (1L, "copyright acme alpha beta gamma delta"),
      (2L, "copyright acme epsilon zeta eta theta"),
      (3L, "copyright acme iota kappa lambda mu"),
      (4L, "copyright acme nu xi omicron pi")).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(docs, "text", "doc_id",
        blockWords = 2, maxDocShare = 0.5)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.length == 4)
    assert(out(0) == ((1L, 2L, "alpha beta gamma delta")))
    assert(out(3) == ((4L, 2L, "nu xi omicron pi")))
  }

  test("dedupSpans keeps first occurrence only, in and across documents") {
    import graft.functions.Boilerplate
    val docs = Seq(
      (1L, "alpha beta gamma delta"),  // first occurrences of both blocks
      (2L, "alpha beta epsilon zeta"), // "alpha beta" is a re-occurrence
      (3L, "gamma delta alpha beta"),  // every block already seen
      (4L, "rho rho rho rho")          // within-doc repeat: second copy drops
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupSpans(docs, "text", "doc_id", blockWords = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 2L, "alpha beta gamma delta")))
    assert(out(1) == ((2L, 2L, 1L, "epsilon zeta")))
    // fully-duplicated doc stays present with empty text, not dropped
    assert(out(2) == ((3L, 2L, 0L, "")))
    assert(out(3) == ((4L, 2L, 1L, "rho rho")))
  }

  test("temperatureMixture: sqrt flattening, budget clamp, determinism") {
    import graft.functions.Mixture
    // srcA has 4x the token mass of srcB -> sqrt temperature gives it
    // only 2x the sampling weight (2/3 vs 1/3).
    val docs = ((1 to 16).map(i => (i.toLong, "srcA", "w x y z")) ++
      (17 to 20).map(i => (i.toLong, "srcB", "w x y z")))
      .toDF("doc_id", "source", "text")
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    val out = Mixture.temperatureMixture(docs, "source", "doc_id", toks, 40)
      .as[(String, Long, Long, Double, Long, Long)].collect().sortBy(_._1).toList
    val Seq(a, b) = out.map(_._4)
    assert(math.abs(a - 2.0 / 3) < 1e-6 && math.abs(b - 1.0 / 3) < 1e-6)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5, "weights sum to 1")
    // a budget beyond the corpus clamps every rate at 1: keep everything
    val full = Mixture.temperatureMixture(docs, "source", "doc_id", toks, 1000000)
      .as[(String, Long, Long, Double, Long, Long)].collect()
    assert(full.forall(r => r._5 == r._2 && r._6 == r._3))
    // md5 coin, not an RNG: identical selection on re-run
    val again = Mixture.temperatureMixture(docs, "source", "doc_id", toks, 40)
      .as[(String, Long, Long, Double, Long, Long)].collect().sortBy(_._1).toList
    assert(again == out)
    // a zero-mass / all-NULL source gets weight 0 and keeps NOTHING (not
    // NaN -> keep-all), and must not poison the other sources' weights
    val withDead = docs.unionByName(
      Seq((21L, "srcC", null.asInstanceOf[String])).toDF("doc_id", "source", "text"))
    val w3 = Mixture.temperatureMixture(withDead, "source", "doc_id",
        when(col("text").isNotNull, toks), 40)
      .as[(String, Long, Long, Double, Long, Long)].collect().sortBy(_._1).toList
    val dead = w3.find(_._1 == "srcC").get
    assert(dead._4 == 0.0 && dead._5 == 0L && dead._6 == 0L, dead.toString)
    assert(math.abs(w3.find(_._1 == "srcA").get._4 - 2.0 / 3) < 1e-6,
      "healthy sources keep their weights")
  }

  test("adjacentPairCounts: exact bigram counts, doc frequency, no pairs from single tokens") {
    import graft.functions.Relevance
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = Relevance.adjacentPairCounts(docs, "text", "doc_id", k = 10)
      .as[(String, Long, Long)].collect().toList
    assert(out.head == (("a b", 3L, 2L))) // twice in doc 1, once in doc 2
    assert(out.contains(("b a", 1L, 1L)))
    assert(out.length == 2) // "solo" emits no pairs
  }

  test("BPE training: classic merges on a toy corpus, leftmost non-overlap, determinism") {
    import graft.functions.Bpe
    // corpus: "aa" x2, "aab" x1 -> pair (a,a) freq 3 beats (a,b) freq 1;
    // after merge 1, (aa,b) freq 1 < 2 -> training stops early
    val docs = Seq("aa aa aab").toDF("text")
    val vocab = Bpe.wordFrequencies(docs, "text")
    assert(vocab.as[(String, Long)].collect().toMap == Map("aa" -> 2L, "aab" -> 1L))
    val (merges, dict) = Bpe.trainMerges(vocab, numMerges = 5)
    assert(merges == Seq(("a", "a")), "stops when no pair repeats")
    val seg = dict.select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(seg("aa") == Seq("aa") && seg("aab") == Seq("aa", "b"))
    // leftmost non-overlapping: "aaa" under (a,a) -> [aa, a], never [a, aa]
    val tri = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a")).as[Seq[String]].head()
    assert(tri == Seq("aa", "a"))
    // a richer corpus learns a second-order merge (merged symbol on the left)
    val docs2 = Seq("ab ab ab abc abc").toDF("text")
    val (m2, d2) = Bpe.trainMerges(Bpe.wordFrequencies(docs2, "text"), 5)
    assert(m2 == Seq(("a", "b"), ("ab", "c")), m2.toString)
    assert(d2.select("word", "syms").as[(String, Seq[String])].collect().toMap
      .apply("abc") == Seq("abc"))
    // deterministic: same corpus, same merges
    val (m3, _) = Bpe.trainMerges(Bpe.wordFrequencies(docs2, "text"), 5)
    assert(m3 == m2)
    // corpus smoke: 4 merges over the real documents table, repeatably
    val corpusVocab = Bpe.wordFrequencies(Tables.documents(spark, sf("sf0.001")), "text")
    val (cm, _) = Bpe.trainMerges(corpusVocab, 4)
    val (cm2, _) = Bpe.trainMerges(corpusVocab, 4)
    assert(cm.length == 4 && cm == cm2, cm.toString)
    // tokenize with the trained dict: in-vocab words use their learned
    // segmentation in word order; OOV words fall back to characters
    val toTok = Seq((1L, "abc ab zz"), (2L, "ab")).toDF("doc_id", "text")
    val tok = Bpe.tokenize(toTok, "text", "doc_id", d2)
      .as[(Long, Long, Seq[String])].collect().sortBy(_._1).toList
    assert(tok(0) == ((1L, 4L, Seq("abc", "ab", "z", "z"))), tok(0).toString)
    assert(tok(1) == ((2L, 1L, Seq("ab"))))
  }

  test("unigramLogProb: common-token docs outscore rare-token docs; exact tiny-corpus value") {
    import graft.functions.Relevance
    // corpus: "the" x 6, "zyx" x 1, "qqq" x 1 -> total 8
    val docs = Seq(
      (1L, "the the the"), (2L, "the the the"),
      (3L, "zyx qqq"), (4L, "")).toDF("doc_id", "text")
    val out = Relevance.unigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    assert(out.map(_._1) == List(1L, 2L, 3L), "empty doc dropped")
    // doc1: mean ln(6/8); doc3: mean ln(1/8)
    assert(math.abs(out.head._3 - math.log(6.0 / 8)) < 1e-6)
    assert(math.abs(out(2)._3 - math.log(1.0 / 8)) < 1e-6)
    assert(out.head._3 > out(2)._3, "prose-like beats rare-token soup")
  }

  test("chunkDocs: full coverage, overlap, no degenerate tails") {
    import graft.functions.Packing
    // 10 tokens, window 4, stride 2 → starts 0,2,4,6 (ceil((10-4)/2)=3
    // extra chunks); last chunk covers tokens 7..10, nothing degenerate.
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "a b")).toDF("doc_id", "text")
    val got = Packing.chunkDocs(docs, "text", "doc_id", window = 4, stride = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.head._4 == "t1 t2 t3 t4" && d1.last._4 == "t7 t8 t9 t10")
    assert(d1.forall(_._3 == 4L))
    // overlap: chunk 1 starts at token 3
    assert(d1(1)._4 == "t3 t4 t5 t6")
    // short doc → single chunk, actual token count
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == 2L && d2.head._4 == "a b")
    intercept[IllegalArgumentException] {
      Packing.chunkDocs(docs, "text", "doc_id", window = 4, stride = 5)
    }
  }

  test("capPerGroup keeps exactly k per group, deterministically") {
    import graft.functions.Mixture
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 4}")).toDF("doc_id", "source")
    val capped = Mixture.capPerGroup(df, "source", "doc_id", k = 7)
    val counts = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 7L) && counts.size == 4)
    val again = Mixture.capPerGroup(df, "source", "doc_id", k = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
    // k larger than the group keeps everything
    assert(Mixture.capPerGroup(df, "source", "doc_id", 1000).count() == 100)
  }

  test("tokenBudgetPerGroup: running total never exceeds budget, prefix property") {
    import graft.functions.Mixture
    val df = (1 to 60).map(i => (i.toLong, s"s${i % 3}", 10 + i % 5)).toDF("doc_id", "source", "n_tok")
    val sel = Mixture.tokenBudgetPerGroup(df, "source", "doc_id", col("n_tok"), budget = 55L)
      .select("doc_id", "source", "cum_tokens").as[(Long, String, Long)].collect()
    assert(sel.forall(_._3 <= 55L))
    assert(sel.nonEmpty && sel.groupBy(_._2).size == 3)
    // prefix property: the selected set per group is closed under the
    // hash order — re-running with a bigger budget only ADDS rows.
    val bigger = Mixture.tokenBudgetPerGroup(df, "source", "doc_id", col("n_tok"), budget = 90L)
      .select("doc_id").as[Long].collect().toSet
    assert(sel.map(_._1).toSet.subsetOf(bigger))
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    import graft.functions.Splits
    val n = 2000
    val df = (1 to n).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val pick = Splits.stratifiedSample(df, "lang", "doc_id",
      rates = Seq("en" -> 0.5), defaultRate = 0.1)
    val a = pick.select("doc_id").as[Long].collect().toSet
    val b = pick.select("doc_id").as[Long].collect().toSet
    assert(a == b, "re-run must select exactly the same rows")
    val byLang = pick.groupBy("lang").count().as[(String, Long)].collect().toMap
    // md5 buckets are uniform: 1000 en rows at 50% and 1000 fr at 10%.
    assert(math.abs(byLang("en") - 500L) < 75, s"en=${byLang("en")}")
    assert(math.abs(byLang("fr") - 100L) < 40, s"fr=${byLang("fr")}")
    // rates outside [0,1] rejected
    intercept[IllegalArgumentException] {
      Splits.stratifiedSample(df, "lang", "doc_id", Seq("en" -> 1.5), 0.1)
    }
  }

  test("contaminationScore: full overlap 1.0, disjoint 0.0, partial in between") {
    import graft.functions.Splits
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // every bigram in eval
      (2L, "totally unrelated words appear here now"), // none
      (3L, "alpha beta gamma unseen tail words")       // 2 of 5 bigrams hit
    ).toDF("doc_id", "text")
    val got = Splits.contaminationScore(train, eval, "text", "doc_id", n = 2)
      .select("doc_id", "n_sh", "n_hit", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4, 4L, 1.0)))
    assert(got(1) == ((2L, 5, 0L, 0.0)))
    assert(got(2) == ((3L, 5, 2L, 0.4)))
  }

  test("bloomContamination: never under-counts the exact tier; exact hits when bits are ample") {
    import graft.functions.Splits
    val train = Seq(
      (1L, "alpha beta gamma delta"), (2L, "omega psi chi phi"),
      (3L, "alpha beta unrelated words")).toDF("doc_id", "text")
    val eval = Seq((10L, "alpha beta gamma something")).toDF("doc_id", "text")
    val exact = Splits.contaminationScore(train, eval, "text", "doc_id", 2)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    val bloom = Splits.bloomContamination(train, eval, "text", "doc_id", 2)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(exact.keySet == bloom.keySet)
    exact.foreach { case (id, h) =>
      assert(bloom(id) >= h, s"bloom under-counted doc $id: ${bloom(id)} < $h")
    }
    // 1008 bits vs 3 eval shingles: false-positive odds are negligible,
    // so the two tiers agree exactly on this corpus
    assert(bloom == exact, s"ample-bits bloom should equal exact: $bloom vs $exact")
  }

  test("gopherRules: each rule fires on a crafted document and names itself") {
    val good = (("the quick brown fox jumps over lazy dogs near riverbank " * 4)
      + "with many different other words appearing here once only today").trim
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "the tiny one"),                        // too_short
      (3L, ("word " * 200).trim),                  // too_long + repetition + no_stopwords + word_len(4.0 excl? len=4)
      (4L, ("it " + "ab " * 40).trim),             // word_len (mean ~2)
      (5L, ("the different sample " * 20).trim)    // repetition (3 distinct / 60)
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
      graft.functions.TextFunctions.gopherRules(col("text")).as("r"))
      .select(col("doc_id"), col("r.passed"), col("r.reasons"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(r(0)._2, s"good doc rejected: ${r(0)._3}")
    assert(r(0)._3 == "")
    assert(!r(1)._2 && r(1)._3.contains("too_short"))
    assert(!r(2)._2 && r(2)._3.contains("too_long") && r(2)._3.contains("repetition")
      && r(2)._3.contains("no_stopwords"))
    assert(!r(3)._2 && r(3)._3.contains("word_len"))
    assert(!r(4)._2 && r(4)._3.contains("repetition"))
    // non-degenerate on the corpus: both outcomes occur
    val onCorpus = QueriesExt.q50QualityRules(spark, sf("sf0.001"))
      .groupBy("passed").count().as[(Boolean, Long)].collect().toMap
    assert(onCorpus.keySet == Set(true, false), s"degenerate: $onCorpus")
  }

  test("morton interleave: known values and zorder bounding-box locality") {
    import graft.functions.Layout
    // x=3 (011), y=5 (101) -> bits x0,y0,x1,y1,x2,y2 = 1,1,1,0,0,1 -> 100111
    val z = Seq((3, 5)).toDF("x", "y")
      .select(Layout.morton(col("x"), col("y"), 3)).as[Int].head()
    assert(z == 39)
    // every zfile is the zval's top quad-tree bits, and each file's
    // bounding box is one 128x128 square of the 1024x1024 bucket grid
    val o = Tables.orders(spark, sf("sf0.001"))
    val assigned = Layout.zorderAssign(o, col("o_custkey"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")), 10, 64)
    assert(assigned.filter(col("zfile") =!= shiftright(col("zval"), 14)).isEmpty)
    val stats = QueriesExt.q51Zorder(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Int, Int)].collect()
    assert(stats.nonEmpty && stats.length <= 64)
    stats.foreach { case (f, cnt, minX, maxX, minY, maxY) =>
      assert(f >= 0 && f < 64 && cnt > 0)
      assert(maxX - minX <= 127, s"file $f x-box too wide: $minX..$maxX")
      assert(maxY - minY <= 127, s"file $f y-box too wide: $minY..$maxY")
    }
    // nFiles not a power of 4 rejected
    intercept[IllegalArgumentException] {
      Layout.zorderAssign(o, col("o_custkey"), col("o_custkey"), 10, 32)
    }
  }

  test("q52 semantic dedup: injected twin clustered with its original, originals kept") {
    val out = QueriesExt.q52SemanticDedup(spark, sf("sf0.001"))
      .as[(Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    val dups = out.filter(_._1 >= 1000000L)
    assert(dups.nonEmpty, "no injected duplicates surfaced")
    // SRP-LSH recall is not 1.0: a perturbed copy can cross a hyperplane
    // and land in a different bucket. Most must cluster; the ones that do
    // must cluster with their original and lose the keep flag.
    val clustered = dups.filter(d => d._2 == d._1 - 1000000L)
    assert(clustered.length * 2 >= dups.length,
      s"LSH recall collapsed: ${clustered.length}/${dups.length}")
    clustered.foreach { case (id, _, keep) =>
      assert(!keep, s"dup $id kept")
      assert(byId(id - 1000000L)._3, s"original ${id - 1000000L} dropped")
    }
    // a missed dup is its own singleton cluster (kept) — honest recall
    dups.diff(clustered).foreach { case (id, comp, keep) =>
      assert(comp == id && keep)
    }
    // untouched vectors are their own singleton component and kept
    val singles = out.filter(r => r._1 < 1000000L && r._1 % 17 != 0)
    assert(singles.forall(r => r._2 == r._1 && r._3))
  }

  test("text_normalize / text_fold_accents: NFC, accents, controls, whitespace, ASCII fast path") {
    import graft.functions.TextNormalizeExpression._
    val cafeNfd = "Cafe\u0301"  // e + combining acute (NFD)
    val cafeNfc = "Caf\u00e9"   // precomposed e-acute (NFC)
    val df = Seq(
      (1L, cafeNfd),                 // NFC must compose to the precomposed form
      (2L, cafeNfc),
      (3L, "a\u0001b\u0007c"),      // bare controls stripped
      (4L, "  a\t\nb   c \r\n"),     // whitespace runs collapse, edges trim
      (5L, "plain ascii text"),      // fast path: returned as-is
      (6L, "")).toDF("id", "s")
    val got = df.select(col("id"), textNormalize(col("s")).as("n"),
        textFoldAccents(col("s")).as("f"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got(0)._2 == cafeNfc && got(1)._2 == cafeNfc, "NFC composition")
    assert(got(0)._3 == "Cafe" && got(1)._3 == "Cafe", "accent folding")
    assert(got(2)._2 == "abc", "control characters stripped")
    assert(got(3)._2 == "a b c", "whitespace collapsed and trimmed")
    assert(got(4)._2 == "plain ascii text" && got(5)._2 == "")
    // null passthrough
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(textNormalize(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    // SQL names resolve via the extensions registration
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT text_fold_accents('Café  du Monde')")
      .as[String].head()
    assert(viaSql == "Cafe du Monde")
  }

  test("char_stats: entropy / top fraction / distinct count, non-ASCII and surrogate paths") {
    import graft.functions.CharStatsExpression
    val df = Seq(
      (1L, "aabb"),             // uniform 2 symbols → 1 bit
      (2L, "abcd"),             // uniform 4 symbols → 2 bits
      (3L, "aaaa"),             // degenerate → 0 bits (never -0.0)
      (4L, ""),                 // empty → all zeros
      (5L, "ααββ"),      // ααββ — heap-map path
      (6L, "𝒜𝒜ℬℬ") // 𝒜𝒜ℬℬ — surrogate pairs count once
    ).toDF("id", "s")
    val got = df.select(col("id"), CharStatsExpression.charStats(col("s")).as("st"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(got(0)._2 == Seq(1.0, 0.5, 2.0))
    assert(got(1)._2 == Seq(2.0, 0.25, 4.0))
    assert(got(2)._2 == Seq(0.0, 1.0, 1.0))
    assert(!got(2)._2.head.toString.startsWith("-"), "entropy must not be -0.0")
    assert(got(3)._2 == Seq(0.0, 0.0, 0.0))
    assert(got(4)._2 == Seq(1.0, 0.5, 2.0), "non-ASCII frequencies")
    assert(got(5)._2 == Seq(1.0, 0.5, 2.0), "surrogate pairs are single code points")
    // null passthrough
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(CharStatsExpression.charStats(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    // SQL name resolves via the extensions registration
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT char_stats('aabb')[0]").as[Double].head()
    assert(viaSql == 1.0)
  }

  test("dsirLogWeights: target-vocabulary docs outscore off-vocabulary docs") {
    import graft.functions.Relevance
    // target domain speaks {alpha beta}; raw pool has one doc in the
    // target vocabulary and one in a disjoint vocabulary.
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta alpha", true),
      (3L, "alpha beta alpha", false),
      (4L, "zork quux grue", false),
      (5L, "", false)).toDF("doc_id", "text", "is_t")
    val out = Relevance.dsirLogWeights(docs, "text", "doc_id",
        targetPred = col("is_t"), buckets = 64)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    assert(out.map(_._1) == List(3L, 4L), "only raw docs scored, empty dropped")
    val Seq(inVocab, offVocab) = out.map(_._3)
    assert(inVocab > offVocab,
      s"target-like doc must outscore off-domain doc: $inVocab <= $offVocab")
    assert(inVocab > 0 && offVocab < 0,
      "log-ratio sign: target-vocab positive, raw-only vocab negative")
  }

  test("trainHashedLr separates a separable corpus; scoring ranks target-like docs first") {
    import graft.functions.Relevance
    // target vocabulary {alpha beta gamma}, raw vocabulary {zork quux grue},
    // plus held-out docs from each vocabulary scored after training.
    val train = (
      (1L to 10L).map(i => (i, "alpha beta gamma alpha", true)) ++
      (11L to 20L).map(i => (i, "zork quux grue zork", false))
    ).toDF("doc_id", "text", "is_t")
    val w = Relevance.trainHashedLr(train, "text", "doc_id",
      targetPred = col("is_t"), buckets = 64, iters = 30)
    assert(w.forall(x => !x.isNaN && !x.isInfinite), "weights must stay finite")
    val holdout = Seq(
      (100L, "alpha gamma beta"), (101L, "beta beta alpha"),
      (200L, "grue zork quux"), (201L, "quux grue grue")).toDF("doc_id", "text")
    val scores = Relevance.scoreHashedLr(holdout, "text", "doc_id", w)
      .select("doc_id", "p_target").as[(Long, Double)].collect().toMap
    assert(scores.values.forall(p => p >= 0 && p <= 1))
    assert(scores(100L) > 0.5 && scores(101L) > 0.5,
      s"target-vocab docs must score as target: $scores")
    assert(scores(200L) < 0.5 && scores(201L) < 0.5,
      s"raw-vocab docs must score as raw: $scores")
    assert(scores(100L) > scores(200L) + 0.3, s"separation collapsed: $scores")
  }

  test("bigramLogProb: corpus-frequent bigrams outscore shuffled ones; n_tok<2 dropped") {
    import graft.functions.Relevance
    // "a b" appears 4x; doc 3 uses the same unigrams in unseen order.
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b a b"),
      (3L, "b b a a"), (4L, "solo")).toDF("doc_id", "text")
    val out = Relevance.bigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    assert(out.map(_._1) == List(1L, 2L, 3L), "single-token doc dropped")
    assert(out.head._3 > out(2)._3, "seen bigrams must outscore unseen order")
    assert(out.head._3 == out(1)._3, "identical docs score identically")
  }

  test("pqCodes/pqAdcTopK: centroid self-encode, exact-duplicate retrieval") {
    import graft.functions.Similarity
    // 2 subspaces x 2 dims, 2 centroids per subspace.
    val codebook: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
      Seq(Seq(0.0, 0.0), Seq(-10.0, -10.0)))
    val vecs = Seq(
      (0L, Array(0.1f, -0.1f, 0.2f, 0.1f)),      // codes (0, 0)
      (1L, Array(9.8f, 10.1f, -9.9f, -10.2f)),   // codes (1, 1)
      (2L, Array(0.1f, -0.1f, 0.2f, 0.1f)),      // duplicate of 0
      (3L, Array(10.0f, 10.0f, 0.0f, 0.0f))      // codes (1, 0)
    ).toDF("vec_id", "embedding")
    val codes = vecs.select(col("vec_id"),
        Similarity.pqCodes(col("embedding"), codebook).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1) &&
      codes(3L) == Seq(1, 0))
    val top = Similarity.pqAdcTopK(
      vecs.filter(col("vec_id") === 0L), vecs, k = 3, codebook)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    // same-code duplicate ranks first with the identical ADC a self-scan
    // would get; code-distance ordering after that; no self-pair.
    assert(top.map(_._2).toList == List(2L, 3L, 1L))
    assert(top.forall(_._2 != 0L || top.head._1 != top.head._2))
    // two-stage refine: exact re-rank of the shortlist reproduces the
    // exact-L2 ordering (here shortlist = whole corpus, so recall = 1)
    val refined = Similarity.pqRefineTopK(
      vecs.filter(col("vec_id") === 0L), vecs, k = 3, shortlist = 3, codebook)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    val exact = Similarity.bruteForceL2TopK(
      vecs.filter(col("vec_id") === 0L), vecs, k = 3)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(refined.map(_._2).toList == exact.map(_._2).toList,
      "full-shortlist refine must equal the exact ranking")
  }

  test("invertedIndex: df/cf over full postings, page capped at pageSize, hapax dropped") {
    import graft.functions.Relevance
    val docs = Seq(
      (10L, "alpha beta alpha"),
      (11L, "alpha gamma"),
      (12L, "alpha beta"),
      (13L, "alpha delta")).toDF("doc_id", "text")
    val out = Relevance.invertedIndex(docs, "text", "doc_id", minDf = 2, pageSize = 2)
      .as[(String, Long, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    // alpha: df=4 docs, cf=5 occurrences, page = 2 lowest doc ids only
    assert(out("alpha") == ("alpha", 4L, 5L, Seq(10L, 11L)))
    assert(out("beta") == ("beta", 2L, 2L, Seq(10L, 12L)))
    assert(!out.contains("gamma") && !out.contains("delta"), "hapax tokens must drop")
  }

  test("rrfFuse2: reciprocal-rank ensemble, single-tier fallback, exact-tie id break") {
    import graft.functions.Similarity
    def tier(rows: (Long, Long, Int)*): org.apache.spark.sql.DataFrame =
      rows.toDF("query_id", "neighbor_id", "rank")
    val fused = Similarity.rrfFuse2(
      tier((1L, 101L, 1), (1L, 102L, 2)),
      tier((1L, 102L, 1), (1L, 103L, 2)), k = 10)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    // 102 in both tiers (1/62 + 1/61) beats 101 (1/61) beats 103 (1/62)
    assert(fused.map(_._2).toList == List(102L, 101L, 103L))
    assert(fused.head._4 == BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // equal single-tier scores tie-break on the neighbor id
    val tied = Similarity.rrfFuse2(
      tier((2L, 205L, 1)), tier((2L, 203L, 1)), k = 10)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(tied.map(_._2).toList == List(203L, 205L))
  }

  test("kmeansTrain: Lloyd iterations with exact micro-unit means; convergence; determinism") {
    import graft.functions.Similarity
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(9.0f, 9.0f)),
      (4L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val c1 = Similarity.kmeansTrain(vecs, k = 2, iters = 1, dim = 2)
    // cell0 = {0,2,4} → (0+1+0.5)/3 = exactly 0.5 in micro-units; cell1 = {1,3}
    assert(c1 == Seq(Seq(0.5, 0.5), Seq(9.5, 9.5)))
    val c2 = Similarity.kmeansTrain(vecs, k = 2, iters = 2, dim = 2)
    assert(c2 == c1, "already converged after one iteration")
    // deterministic: retraining yields bit-identical centroids
    assert(Similarity.kmeansTrain(vecs.repartition(7), k = 2, iters = 2, dim = 2) == c1,
      "partitioning must not change the exact integer means")
    // assignment under the trained model: rounded-argmin via the PQ kernel
    val cells = vecs.select(col("vec_id"),
        element_at(Similarity.pqCodes(col("embedding"), Seq(c1)), 1).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(cells == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("knnClassify: majority label of cosine neighbors; mislabeled point detected; vote tie → lower label") {
    import graft.functions.Similarity
    val vecs = Seq(
      (0L, Array(1.0f, 0.00f), 0), (1L, Array(1.0f, 0.05f), 0), (2L, Array(1.0f, -0.05f), 0),
      (10L, Array(0.00f, 1.0f), 1), (11L, Array(0.05f, 1.0f), 1), (12L, Array(-0.05f, 1.0f), 1),
      (20L, Array(1.0f, 0.02f), 1)   // labeled 1 but sits in cluster 0
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(vecs, vecs, k = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._3 == 0 && out(0L)._5, "cluster-0 member agrees")
    assert(out(10L)._3 == 1 && out(10L)._5, "cluster-1 member agrees")
    assert(out(20L)._3 == 0 && !out(20L)._5, "mislabeled point voted into cluster 0")
    assert(out(20L)._4 == 3L, "all three neighbors of the impostor are cluster 0")
    // 2-2 vote tie breaks to the lower label
    val tied = Seq(
      (0L, Array(1.0f, 0.0f), 5), (1L, Array(0.9f, 0.1f), 5),
      (2L, Array(0.8f, 0.2f), 3), (3L, Array(0.7f, 0.3f), 3),
      (4L, Array(0.95f, 0.05f), 9)
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.knnClassify(tied.filter(col("vec_id") === 4L), tied, k = 4)
      .as[(Long, Int, Int, Long, Boolean)].head()
    assert(t._3 == 3 && t._4 == 2L && !t._5, "2-2 tie must resolve to the lower label")
  }

  test("sqMinMax/sqEncode/sqAdcTopK: affine codes, clamp, constant dim, duplicate retrieval") {
    import graft.functions.Similarity
    val vecs = Seq(
      (0L, Array(0.0f, 10.0f, 7.0f)),
      (1L, Array(5.0f, 0.0f, 7.0f)),   // dim2 constant across corpus
      (2L, Array(10.0f, 5.0f, 7.0f)),
      (3L, Array(0.0f, 10.0f, 7.0f))   // duplicate of 0
    ).toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.sqMinMax(vecs, dim = 3)
    assert(mins == Seq(0.0, 0.0, 7.0) && maxs == Seq(10.0, 10.0, 7.0))
    val codes = vecs.select(col("vec_id"),
        Similarity.sqEncode(col("embedding"), mins, maxs).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    // 0→0, 5→round(127.5)=128 (HALF_UP), 10→255; constant dim → 0
    assert(codes(0L) == Seq(0, 255, 0) && codes(1L) == Seq(128, 0, 0) &&
      codes(2L) == Seq(255, 128, 0))
    // out-of-range values clamp to the byte range
    val clamped = Seq((9L, Array(-5.0f, 20.0f, 7.0f))).toDF("vec_id", "embedding")
      .select(Similarity.sqEncode(col("embedding"), mins, maxs))
      .as[Seq[Int]].head()
    assert(clamped == Seq(0, 255, 0))
    // exact duplicate dequantizes identically → rank 1 with adc 0
    val top = Similarity.sqAdcTopK(
      vecs.filter(col("vec_id") === 0L), vecs, k = 3, mins, maxs)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(top.head._2 == 3L && top.head._4 == 0.0)
    assert(top.map(_._2).toList == List(3L, 1L, 2L) || top.map(_._2).toList == List(3L, 2L, 1L))
    assert(top.forall(_._2 != 0L), "no self-pair")
  }

  test("ivfPqTopK: identical vector shares cell+codes and ranks first; candidates stay cell-pruned") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val clone = e.filter(col("vec_id") === 40)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(clone)
    val raw = e.filter(col("vec_id") < 32)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).map(_._2)
    val cents: Seq[Seq[Double]] = raw.take(16).map(_.toSeq).toSeq
    def round6(d: Double): Double =
      java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cellOf(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < v.length) { val x = v(j) - c(j); d += x * x; j += 1 }
        (round6(d), i)
      }.min._2
    val codebook: Seq[Seq[Seq[Double]]] = (0 until 4).map { m =>
      (16 until 32).map { id =>
        val v = raw(id); val c = cents(cellOf(v))
        (m * 16 until m * 16 + 16).map(j => v(j) - c(j))
      }
    }
    // the clone's own-cell probe must surface it at rank 1 (identical
    // residual codes → ADC equal to the original's self-distance class)
    val top = Similarity.ivfPqTopK(
      corpus.filter(col("vec_id") === 100040L), corpus, k = 5, nprobe = 4,
      cents, codebook)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(top.head._2 == 40L, s"identical vector must rank first: ${top.toList}")
  }

  test("countMinEstimates: est >= exact always; exact when width is collision-free") {
    import graft.functions.ApproxHeavyHitters
    val docs = Seq(
      (1L, "x x x y y z"), (2L, "x y w v u t"), (3L, "x z z q r s")
    ).toDF("doc_id", "text")
    // narrow sketch: collisions likely -> only the >= guarantee holds
    val narrow = ApproxHeavyHitters.countMinEstimates(docs, "text",
        rows = 2, width = 4, k = 10)
      .as[(String, Long, Long)].collect()
    assert(narrow.nonEmpty)
    narrow.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS under-counted $t: $est < $exact")
    }
    // wide sketch: 10 distinct terms across 4x1024 cells -> no collisions
    // (md5 buckets of these literals verified disjoint by the assertion)
    val wide = ApproxHeavyHitters.countMinEstimates(docs, "text",
        rows = 4, width = 1024, k = 10)
      .as[(String, Long, Long)].collect()
    assert(wide.length == 10)
    wide.foreach { case (t, exact, est) =>
      assert(est == exact, s"collision-free sketch must be exact for $t")
    }
  }

  test("semDedup: within-cell pair grouped, least-prototypical kept, cross-cell singleton") {
    val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val emb = Seq(
      (0L, Seq(1.0, 0.01, 0.0, 0.0)),   // cell 0
      (1L, Seq(0.99, 0.012, 0.0, 0.0)), // cell 0, near-dup of 0
      (2L, Seq(0.0, 1.0, 0.1, 0.0))     // cell 1, singleton
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, centroids, threshold = 0.95)
      .select("vec_id", "cell", "cent_sim", "component", "keep")
      .as[(Long, Int, Double, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0, 0, 1), "cell assignment")
    // 0 and 1 collapse into one group keyed by the min id
    assert(out(0)._4 == 0L && out(1)._4 == 0L && out(2)._4 == 2L)
    // the paper's keep rule: LOWEST centroid similarity survives
    val group = out.filter(_._4 == 0L)
    val kept = group.filter(_._5)
    assert(kept.length == 1, s"exactly one kept per group: $group")
    assert(kept.head._3 == group.map(_._3).min, "kept must be least prototypical")
    assert(out(2)._5, "singleton kept")
  }

  test("jlTopK with a full shortlist reproduces exact brute-force ranking") {
    val planes = Similarity.deterministicPlanes(8, 4)
    // well-separated vectors (pairwise cosines differ >> the 1e-6 rounding)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.4f, 0.1f, 0.0f)),
      (2L, Seq(0.1f, 1.0f, 0.0f, 0.2f)),
      (3L, Seq(0.0f, 0.1f, 1.0f, 0.0f)),
      (4L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (5L, Seq(0.95f, 0.1f, 0.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 2)
    val jl = Similarity.jlTopK(q, emb, k = 3, planes, shortlist = 6)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(q, emb, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(jl == exact, s"jl=$jl exact=$exact")
    // and the sketch really is 8-dim
    val red = emb.select(Similarity.jlProject(col("embedding"), planes).as("r"))
      .select(size(col("r"))).as[Int].collect()
    assert(red.forall(_ == 8))
  }

  test("withQuantileBin: quartile bins over a known distribution") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "x")
    val out = RobustStats.withQuantileBin(df, "x", Seq(0.25, 0.5, 0.75))
      .select("x", "bin").as[(Long, Int)].collect().toMap
    // boundaries: 25.75 / 50.5 / 75.25 — (n-1)p interpolation
    assert(out(25) == 0 && out(26) == 1)
    assert(out(50) == 1 && out(51) == 2)
    assert(out(75) == 2 && out(76) == 3 && out(100) == 3)
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.values.forall(c => c == 25), s"equal-frequency bins: $counts")
  }

  test("madOutliers: robust flag immune to the outlier it hunts") {
    val a = Seq.tabulate(11)(i => ("a", 100L + i)) :+ (("a", 100000L))
    val b = Seq.tabulate(12)(i => ("b", 500L + 10 * i))
    val df = (a ++ b).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "x")
    val out = RobustStats.madOutliers(df, "x", Seq("g"))
      .select("g", "x", "is_outlier").as[(String, Long, Boolean)].collect()
    val (ga, gb) = (out.filter(_._1 == "a"), out.filter(_._1 == "b"))
    assert(ga.filter(_._3).map(_._2).toSeq == Seq(100000L),
      "only the planted outlier flags in group a")
    assert(gb.forall(!_._3), "uniform group b has no outliers")
  }

  test("vocabCoverage: exact coverage fractions on a known distribution") {
    // counts: the=4, cat=2, dog=1, bird=1 → total 8
    val docs = Seq("the cat the dog", "the cat the bird").toDF("text")
    val out = graft.functions.Relevance.vocabCoverage(docs, "text", Seq(1, 2, 4))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, 4L, 8L), (2, 6L, 8L), (4, 8L, 8L)))
    assert(out.map(_._4).toSeq == Seq(0.5, 0.75, 1.0))
  }

  test("embeddingMoments: exact micro-unit sums; dead dimension has zero variance") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.5f, 0.25f)),
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(1.0f, 0.0f, 0.25f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingMoments(emb)
      .as[(Int, Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    assert(out.forall(_._2 == 3L))
    // dim 1: constant 1.0 → dead dimension
    assert(out(0)._3 == 3000000.0 && out(0)._5 == 1.0 && out(0)._6 == 0.0)
    // dim 2: mean 0, variance = (0.25+0.25+0)/3
    assert(out(1)._3 == 0.0 && out(1)._5 == 0.0 && out(1)._6 == 0.166667)
    // dim 3: constant 0.25
    assert(out(2)._5 == 0.25 && out(2)._6 == 0.0)
  }

  test("containmentPairs catches subset duplication that Jaccard misses") {
    val small = "alpha beta gamma delta epsilon"
    val big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"
    val docs = Seq((1L, small), (2L, big), (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val cont = DedupFunctions.containmentPairs(docs, "text", "doc_id",
        n = 2, threshold = 0.9, cap = DedupFunctions.ShingleCap.Uncapped)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(cont.head._3 == 1.0, "small doc fully contained in big")
    // the same pair under Jaccard at the same bar: missed (union-dominated)
    val jac = DedupFunctions.ngramJaccardPairs(docs, "text", "doc_id",
        n = 2, threshold = 0.9, cap = DedupFunctions.ShingleCap.Uncapped)
      .collect()
    assert(jac.isEmpty, "Jaccard 0.9 must miss the containment pair")
  }

  test("sourceOverlapMatrix: canonical dupes pair sources once, within-source dups don't inflate") {
    val docs = Seq(
      (1L, "same text", "a"), (2L, "Same  TEXT", "b"), // canonical dup across a/b
      (3L, "same text", "a"),                          // within-source dup: no self-pair
      (4L, "unique doc", "a"), (5L, "same text", "c")  // c shares with a and b
    ).toDF("doc_id", "text", "source")
    val got = DedupFunctions.sourceOverlapMatrix(docs, "text", "source")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("trailingMedianSpikes: spike flags, never votes on its own baseline") {
    val rows = Seq(
      (1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 11.0),
      (1L, 4L, 100.0), // spike: baseline = median(10,12,11) = 11
      (1L, 5L, 12.0),  // NOT a spike: the 100 is in the frame but the
                       // median resists it (median(10,12,11,100) = 11.5)
      (2L, 1L, 5.0)    // first row of a key: no history, no flag
    ).map { case (u, t, v) => (u, t, v) }.toDF("user_id", "ts_ms", "value")
    val out = RobustStats.trailingMedianSpikes(rows, "value",
        Seq("user_id"), Seq(col("ts_ms")), lookback = 12, factor = 2.0)
      .select("user_id", "ts_ms", "baseline", "is_spike")
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((1L, 4L)) == (Some(11.0), true))
    assert(out((1L, 5L)) == (Some(11.5), false))
    assert(out((2L, 1L)) == (None, false))
    assert(out((1L, 1L)) == (None, false))
  }

  test("duplicateSpans: cross-doc and in-doc repeats merge to maximal spans; first kept") {
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val seg = alpha.substring(0, 20)
    val docs = Seq(
      (1L, alpha),                                  // canonical: no spans
      (2L, "XX" + seg + "YY"),                      // one 20-char copied run
      (3L, "PP" + seg + "##########" + seg + "&&")  // two separated runs
    ).toDF("doc_id", "text")
    val out = graft.functions.ExactSubstrings
      .duplicateSpans(docs, "text", "doc_id", L = 10)
      .select("id", "span_start", "span_end", "span_len")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(!out.exists(_._1 == 1L), "first occurrence never marked")
    // doc 2: windows at pos 3..13 all duplicated, merge to [3, 22]
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 3, 22, 20)))
    // doc 3: two copies of seg separated by a unique gap → two spans
    val d3 = out.filter(_._1 == 3L).toSeq
    assert(d3 == Seq((3L, 3, 22, 20), (3L, 33, 52, 20)), s"got $d3")
  }

  test("duplicateTokenSpans: planted cross-doc passage recovered exactly; " +
    "first occurrence kept; in-doc gap splits spans") {
    // Controlled corpus: token positions are fully known, so the plant
    // recovery is asserted EXACTLY (the q267 oracle replays the same
    // construction over the real corpus, where natural sentence reuse
    // can legitimately merge adjacent spans).
    def words(prefix: String, n: Int) =
      (1 to n).map(i => f"$prefix$i%02d").mkString(" ")
    val passage = words("dup", 12) // 12 shared tokens, W = 8
    val docs = Seq(
      (1L, words("aa", 5) + " " + passage),          // canonical copy
      (2L, words("bb", 7) + " " + passage),          // span at tokens 8..19
      (3L, passage + " " + words("cc", 9) + " " + passage) // two spans
    ).toDF("doc_id", "text")
    val out = graft.functions.ExactSubstrings
      .duplicateTokenSpans(docs, "text", "doc_id", W = 8)
      .select("id", "tok_start", "tok_end", "tok_len")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    // Doc 1 holds the global first occurrence of every passage window
    // (id-ascending tie-break): nothing removable.
    assert(!out.exists(_._1 == 1L), s"first occurrence marked: ${out.toSeq}")
    // Doc 2: passage occupies tokens 8..19 — recovered exactly.
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 8, 19, 12)))
    // Doc 3: passage at 1..12 and again at 22..33, unique gap between —
    // two separate exact spans, not one merged blur.
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1, 12, 12), (3L, 22, 33, 12)))
  }

  test("q267 plant recovered on the real corpus: every planted doc except " +
    "the first emits a span covering the passage") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val spans = QueriesExt9.q267TokenSpans(spark, dir)
    val nTok = QueriesExt.docs(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
    val firstPlanted = nTok.agg(min("doc_id")).as[Long].head()
    // The plant appends 30 tokens at positions n+1..n+30; a natural
    // trailing dup span may legitimately merge with it, so assert
    // COVERAGE (span_start ≤ n+1 and span_end ≥ n+30), not equality.
    val uncovered = nTok.filter(col("doc_id") =!= firstPlanted)
      .join(spans, Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("n"))
      .agg(max(col("tok_start") <= col("n") + 1 &&
        col("tok_end") >= col("n") + 30).as("covered"))
      .filter(!coalesce(col("covered"), lit(false)))
    assert(uncovered.isEmpty,
      s"plant not recovered for: ${uncovered.collect().mkString(", ")}")
  }

  test("localClustering: clique nodes score 1, star center and leaves " +
    "score 0/NULL, path interior 0") {
    // K4 (ids 1-4): every node deg 3, tri 3, LCC = 2*3/(3*2) = 1.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // Star (10 center; 11-13 leaves): center deg 3 tri 0 -> 0; leaves
    // deg 1 -> NULL. Path 20-21-22: interior deg 2 tri 0 -> 0.
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    val path = Seq((20L, 21L), (21L, 22L))
    val out = graft.functions.Graphs
      .localClustering((k4 ++ star ++ path).toDF("a", "b"))
      .select("id", "deg", "n_tri", "lcc")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1L to 4L).foreach(v => assert(out(v) === ((3L, 3L, Some(1.0))), s"K4 $v"))
    assert(out(10L) === ((3L, 0L, Some(0.0))))
    assert(out(11L) === ((1L, 0L, None)))
    assert(out(21L) === ((2L, 0L, Some(0.0))))
  }

  test("psiDrift: identical populations score 0; one-sided bins null out") {
    val ref = (1 to 100).map(i => i.toLong).toDF("v")
    val same = RobustStats.psiDrift(ref, ref, "v")
      .select("bin", "ref_n", "cur_n", "psi")
      .as[(Int, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(same.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(same.forall(r => r._2 == r._3 && r._4.contains(0.0)), s"got ${same.toSeq}")
    // current population entirely above the reference's top quartile:
    // bins 0-2 have cur_n=0 (psi null, not ±inf), bin 3 holds everything
    val high = (1 to 50).map(_ => 1000L).toDF("v")
    val drift = RobustStats.psiDrift(ref, high, "v")
      .select("bin", "ref_n", "cur_n", "psi")
      .as[(Int, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(drift.filter(_._1 < 3).forall(r => r._3 == 0L && r._4.isEmpty))
    val top = drift.find(_._1 == 3).get
    assert(top._3 == 50L && top._4.exists(p => p > 0.5), s"got $top")
  }

  test("snapshotDiff: added/removed/changed/unchanged partition the key space") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val cur = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = graft.operators.SnapshotDiff.diff(old, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // whitespace/case canonicalization: a reflowed doc is NOT a change
    val reflow = Seq((2L, "  BETA  ")).toDF("doc_id", "text")
    val g2 = graft.operators.SnapshotDiff.diff(
        old.filter($"doc_id" === 2L), reflow, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(g2 == Map(2L -> "unchanged"))
  }

  test("distinctNgramRatio: template group collapses, diverse group stays near 1") {
    val docs = Seq(
      ("farm", "buy cheap pills now"), ("farm", "buy cheap pills now"),
      ("farm", "buy cheap pills now"),          // 3 docs × 2 identical trigrams
      ("blog", "the quick brown fox jumps")     // 3 distinct trigrams
    ).toDF("source", "text")
    val got = graft.functions.Relevance
      .distinctNgramRatio(docs, "text", "source", n = 3)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("farm") == ((2L, 6L, 0.333333)), s"got ${got("farm")}")
    assert(got("blog") == ((3L, 3L, 1.0)), s"got ${got("blog")}")
    // docs shorter than n contribute nothing (no group row if none qualify)
    val short = Seq(("tiny", "hi there")).toDF("source", "text")
    assert(graft.functions.Relevance
      .distinctNgramRatio(short, "text", "source", n = 3).isEmpty)
  }

  test("tfidfCosinePairs: identical docs hit 1.0; disjoint vocab never pairs") {
    val docs = Seq(
      (1L, "spark streaming pipeline design"),
      (2L, "spark streaming pipeline design"),   // exact twin of 1
      (3L, "entirely unrelated gardening prose") // shares no terms
    ).toDF("doc_id", "text")
    val got = graft.functions.Relevance
      .tfidfCosinePairs(docs, "text", "doc_id", threshold = 0.0)
      .as[(Long, Long, Double)].collect().toSeq
    // doc 3's terms are unique (df=1) but meet nobody; docs 1-2 share
    // every term. Terms with df=N carry idf=0, so the twin pair's
    // weights come only from df=2 terms — cosine must still be exactly 1
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $got")
    assert(got.head._3 == 1.0, s"twin cosine was ${got.head._3}")
  }

  test("withGroupSplit: no group ever straddles a split; assignment matches splitAssign") {
    val docs = (1 to 200).map(i => (i.toLong, s"dom${i % 23}")).toDF("doc_id", "source")
    val out = graft.functions.Splits.withGroupSplit(docs, "source")
      .select("source", "split").as[(String, String)].collect()
    val bySource = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(bySource.values.forall(_.length == 1),
      s"a group straddled splits: ${bySource.filter(_._2.length > 1)}")
    // all three splits are reachable across 23 domains
    assert(out.map(_._2).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("psiDriftByGroup: the drifted feed flags alone; stable feeds score 0") {
    val ref = (1 to 100).flatMap(i =>
      Seq(("a", i.toLong), ("b", i.toLong))).toDF("src", "v")
    val cur = (1 to 100).flatMap(i =>
      Seq(("a", i.toLong), ("b", i.toLong + 200L))).toDF("src", "v") // b shifts
    val got = RobustStats.psiDriftByGroup(ref, cur, "v", "src")
      .select("src", "bin", "psi").as[(String, Int, Option[Double])].collect()
    val aPsi = got.filter(_._1 == "a").flatMap(_._3)
    assert(aPsi.nonEmpty && aPsi.forall(_ == 0.0),
      s"stable feed must score exactly 0 per bin: ${aPsi.toSeq}")
    // feed b: everything lands above its own reference top quartile —
    // bins 0-2 are one-sided (null psi), bin 3 carries the full drift
    val b = got.filter(_._1 == "b").map(r => r._2 -> r._3).toMap
    assert(b(0).isEmpty && b(1).isEmpty && b(2).isEmpty)
    assert(b(3).exists(_ > 0.5), s"drifted feed must flag: ${b(3)}")
  }

  test("hardNegativesTopK: same-label vectors never rank; nearest negative first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),   // query, label 0
      (2L, Array(0.99f, 0.1f), 0),  // nearest overall but SAME label
      (3L, Array(0.9f, 0.4f), 1),   // nearest negative
      (4L, Array(0.0f, 1.0f), 1),   // orthogonal negative
      (5L, Array(-1.0f, 0.0f), 2)   // opposite negative
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativesTopK(
        vecs.filter(col("vec_id") === 1L), vecs, k = 3)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(!out.exists(_._2 == 2L), "same-label vector must never appear")
    assert(out.map(_._2).toSeq == Seq(3L, 4L, 5L), s"got ${out.toSeq}")
  }

  test("dhash64: rescale-invariant for same seed, discriminative across " +
    "seeds, corrupt and too-small payloads quarantine as null") {
    import graft.functions.Multimodal
    val df = Seq(
      (1L, 2, 7L), (2L, 4, 7L),   // same pattern, 18x16 vs 36x32
      (3L, 3, 8L),                // different seed
      (4L, 2, 9L)
    ).toDF("id", "cell", "seed")
      .select(col("id"),
        Multimodal.dhash64(Multimodal.synthBlockPng(col("cell"), col("cell"),
          col("seed"))).as("dh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L), "block-aligned rescale must hash identically")
    assert(m(1L) != m(3L) && m(1L) != m(4L) && m(3L) != m(4L))
    val bad = Seq(
      Array[Byte](1, 2, 3),                       // not an image
      Array.emptyByteArray                        // empty
    ).toDF("b").select(Multimodal.dhash64(col("b")).as("dh")).collect()
    assert(bad.forall(_.isNullAt(0)), "undecodable bytes must be null")
  }

  test("banded dhash near-dup: 1-2-bit perturbed twins are recovered " +
    "with their true hamming while the exact-equality join misses them") {
    import graft.functions.{DedupFunctions, Multimodal}
    // 6 twin pairs (2k, 2k+1) sharing seed k; odd twin's stored hash is
    // perturbed by k % 3 distinct bit flips — the EXACT q250 plant
    // (shared helper, so this test pins the production construction).
    val hashed = spark.range(12)
      .select(col("id").as("doc_id"),
        Multimodal.dhash64(Multimodal.synthBlockPng(lit(2), lit(2),
          expr("id div 2"))).as("dh"))
    val sig = QueriesExt8.perturbedDhashSigs(hashed)
    val banded = DedupFunctions.simhashPairsFromSignatures(sig, maxHamming = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(banded.map(p => (p._1, p._2)).toSeq ==
      (0 until 6).map(k => (2L * k, 2L * k + 1)),
      s"all 6 planted twin pairs must be recovered, got ${banded.toSeq}")
    assert(banded.forall(p => p._3 == (p._1 / 2 % 3).toInt),
      "reported hamming must equal the planted flip count")
    // The exact-equality join (q119's shape) provably misses the 4
    // perturbed pairs: only the b = 0 twins share a hash.
    val exact = sig.as("a").join(sig.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect()
    assert(exact.toSet == Set((0L, 1L), (6L, 7L)),
      s"exact equality must only find the unperturbed twins, got ${exact.toSeq}")
  }

  test("weightedSamplePerGroup: exact k per group, deterministic across " +
    "repartitioning, dominant weight always selected, zero-weight never") {
    import graft.functions.Mixture
    val df = (1 to 200).map(i =>
        (s"g${i % 2}", i.toLong,
          if (i == 7) 1.0e9 else if (i == 9) 0.0 else 1.0))
      .toDF("src", "id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Mixture.weightedSamplePerGroup(d, "src", "id", col("w"), 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, col("id")))
    assert(a === b, "sample must be partitioning-invariant")
    assert(a.count(_._1 == "g0") === 5 && a.count(_._1 == "g1") === 5)
    assert(a.contains(("g1", 7L)), "weight-1e9 row must be sampled")
    assert(!a.contains(("g1", 9L)), "zero-weight row must be excluded")
  }

  test("pmiCollocations: a fixed phrase outranks frequent-but-independent " +
    "pairs; hapax pairs pruned by minCount") {
    import graft.functions.Relevance
    // "new york" co-occurs between two ordinary-frequency words; "of the"
    // co-occurs as often but "the" is 3× more frequent, so its PMI sits
    // exactly ln(3) lower; "rare gem" appears once (pruned).
    val docs = ((1 to 30).map(i => s"the g$i of the new york the end") :+
      "rare gem").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Relevance.pmiCollocations(docs, "text",
      minCount = 5, topK = 10).collect()
    val top = out.head
    assert((top.getString(0), top.getString(1)) === (("new", "york")))
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("rare", "gem")), "minCount must prune hapax")
    // Association order: equal pair count, but "the" is 3× as frequent a
    // unigram, so the stopword collocation scores exactly ln(3) lower.
    val pmiOf = out.map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi")).toMap
    assert(pmiOf(("new", "york")) > pmiOf(("of", "the")))
    assert(math.abs(pmiOf(("new", "york")) - pmiOf(("of", "the")) -
      math.log(3.0)) < 1e-5)
  }

  test("waterfillAllocate: saturation, leveling, leftover order, and " +
    "over-budget edge cases are all exact") {
    import graft.functions.Mixture
    val avail = Seq(("a", 2L), ("b", 10L), ("c", 10L), ("d", 50L))
      .toDF("src", "n")
    def run(b: Long) = Mixture.waterfillAllocate(avail, "src", "n", b)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // budget 20: a saturates at 2; remaining 18 over {b,c,d} → t=6;
    // used = 2+6+6+6 = 20, no leftover.
    assert(run(20L) === Map("a" -> 2L, "b" -> 6L, "c" -> 6L, "d" -> 6L))
    // budget 22: t=6 uses 20, leftover 2 → first two unsaturated by
    // name (b, c) get one extra each.
    assert(run(22L) === Map("a" -> 2L, "b" -> 7L, "c" -> 7L, "d" -> 6L))
    // budget 100 ≥ total 72: everyone gets their availability.
    assert(run(100L) === Map("a" -> 2L, "b" -> 10L, "c" -> 10L, "d" -> 50L))
    // budget 3 < #groups: three units, one each to the first three names.
    assert(run(3L) === Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
    // Σ alloc always equals min(budget, Σ avail).
    assert(run(22L).values.sum === 22L)
    assert(run(100L).values.sum === 72L)
  }

  test("topPrincipalComponent: a rank-1 cloud recovers its direction; " +
    "result is partitioning-invariant") {
    import graft.functions.Similarity
    // All vectors are multiples of u = (0.6, 0.8, 0, 0): the top
    // component must be ±u exactly (up to micro-rounding).
    val rows = (1 to 50).map { i =>
      val c = (i % 7 + 1).toFloat
      (i.toLong, Seq(0.6f * c, 0.8f * c, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    def comps(d: org.apache.spark.sql.DataFrame) =
      Similarity.topPrincipalComponent(d, iters = 2)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val a = comps(rows.repartition(1))
    val b = comps(rows.repartition(9))
    assert(a === b, "model must not depend on partitioning")
    val sign = math.signum(a(1))
    assert(math.abs(a(1) - sign * 0.6) < 1e-4)
    assert(math.abs(a(2) - sign * 0.8) < 1e-4)
    assert(math.abs(a(3)) < 1e-4 && math.abs(a(4)) < 1e-4)
  }

  test("topPrincipalComponent: empty corpus returns an empty model; " +
    "all-zero corpus stays finite (no NaN)") {
    import graft.functions.Similarity
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.topPrincipalComponent(empty).isEmpty)
    val zeros = (1 to 5)
      .map(i => (i.toLong, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.topPrincipalComponent(zeros, iters = 2).collect()
    assert(m.length === 3)
    m.foreach(r => assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN,
      s"zero corpus must not produce NaN: $r"))
  }

  test("embeddingMeanDrift: planted shift flagged with exact magnitude, " +
    "unshifted dims quiet") {
    import graft.functions.Similarity
    // ref rows all [1.0, 2.0], cur rows [1.0, 2.5] — drift only on dim 2.
    val rows = (1 to 40).map { i =>
      val cur = i % 2 == 1
      (i.toLong, cur, if (cur) Seq(1.0f, 2.5f) else Seq(1.0f, 2.0f))
    }.toDF("vec_id", "cur", "embedding")
    val out = Similarity.embeddingMeanDrift(rows, col("cur"),
        threshold = 0.1).collect()
      .map(r => r.getAs[Int]("dim") -> r).toMap
    assert(out(1).getAs[Double]("drift") === 0.0d)
    assert(!out(1).getAs[Boolean]("drifted"))
    assert(out(2).getAs[Double]("drift") === 0.5d)
    assert(out(2).getAs[Boolean]("drifted"))
    assert(out(2).getAs[Long]("n_ref") === 20L)
    assert(out(2).getAs[Long]("n_cur") === 20L)
  }
}
