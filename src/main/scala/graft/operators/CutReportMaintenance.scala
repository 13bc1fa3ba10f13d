package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{DedupFunctions, ExactSubstrings, Similarity, TextFunctions}

/** MAINTAINED composed cut report — the persistent-state form of the
  * dedup arc (batch q292 → incremental probes q291/q293/q294/q297 →
  * one-query incremental q295): a pipeline that owns parquet-backed
  * indexes and, per ingest batch, does work proportional to the BATCH
  * and the state it touches — never to the corpus — while its stored
  * report stays equal to the full batch replay
  * ([[graft.QueriesExt11.q292CutReport]]'s algebra; the convergence
  * spec pins exactly that, three interleaved backfill ingests → one
  * batch report). This is what "dedup as a maintained capability"
  * executes in production: the q295 query demonstrates one delta in one
  * plan; this operator RETAINS the indexes between deltas.
  *
  * Every state table is a family of per-version parquet SEGMENTS under
  * `stateDir` (r14: the r13 design still rewrote `nd_pairs` and
  * `report` whole per ingest — an O(corpus) write that defeated the
  * delta shape everywhere else; both are now segment-maintained too):
  *
  *  - `docs`       (doc_id, text, n_tokens, fp) — the corpus itself;
  *                 text is retained because exact-Jaccard verification
  *                 of a later bucket collision needs the OLD member's
  *                 shingles (bounded: only affected buckets' members
  *                 are ever re-read). Append-only.
  *  - `fp_index`   (fp, keep_id) — exact tier, per-ingest partial
  *                 minima; min is associative, so the read-side
  *                 re-aggregation IS the global index.
  *  - `band_index` (band, bh, id, n_sh) — near-dup tier: every doc's
  *                 LSH band keys, the q291 probe target. Append-only.
  *  - `nd_pairs`   (band, bh, id_a, id_b, v) — VERIFIED star pairs with
  *                 bucket provenance and the writing version;
  *  - `nd_tombs`   (band, bh, v) — bucket-keyed TOMBSTONES: a bucket
  *                 whose owner changes retracts exactly its own pairs
  *                 (every pair row older than the newest tombstone for
  *                 its bucket is dead) without touching any other
  *                 bucket — the per-ingest write is O(new pairs +
  *                 changed buckets), never O(stored pairs).
  *  - `hash_index` (h, id, pos) — substring tier, per-ingest
  *                 first-occurrence partials (min-mergeable like fp).
  *  - `marks`      (id, pos) — accumulated duplicate-window marks
  *                 (monotone: marks only ever grow). Append-only.
  *  - `vecs`       (doc_id, emb, nrm) — the embedding tier's vectors
  *                 (optional: batches without an `emb` column skip the
  *                 tier). Append-only.
  *  - `vec_index`  (band, bkey, id) — SRP band keys (the q297 probe
  *                 target). Append-only.
  *  - `vec_pairs` / `vec_tombs` — the embedding tier's verified star
  *                 pairs + bucket tombstones, maintained exactly like
  *                 nd_pairs/nd_tombs.
  *  - `report`     (doc_id, tier, dup_of, cut_tokens, v) — the served
  *                 artifact as touched-row OVERLAY segments: each
  *                 ingest lands only the rows it touched, stamped with
  *                 its version; [[report]] folds latest-version-wins
  *                 (one `max_by` per doc — skipped entirely when
  *                 compaction has left a single live segment).
  *
  * Per-ingest delta shape: the batch's fingerprints/band keys/window
  * hashes/SRP keys probe the indexes (equi-joins on bounded keys, the
  * q291/q293/q294/q297 algebra); only AFFECTED buckets re-star and
  * re-verify; only hashes the batch undercuts repair old marks; and the
  * report overlay holds ONLY touched doc_ids. Nothing O(corpus) is
  * materialized or written per ingest — the index probes above scan
  * committed segments but aggregate only the keys the batch touches
  * (at 100 TB each index is a key-bucketed table and every probe is a
  * co-located equi-join; the CutMaintScale `steady` arm measures the
  * fixed-batch ingest wall staying flat as the corpus accumulates).
  *
  * Concurrency: a state dir is SINGLE-WRITER. [[ingest]] and
  * [[compact]] take an exclusive OS file lock (`_lock`) for their
  * duration — a second concurrent writer fails fast instead of racing
  * the version pointer and silently interleaving half-applied state
  * (r13 review). The lock is advisory between processes and re-entrant
  * nowhere; readers never take it (they see the last committed version).
  *
  * Assumes append/backfill ingest: doc_ids are unique across all
  * ingests (a re-crawled id is a different pipeline — SnapshotDiff —
  * not this one). */
object CutReportMaintenance {

  /** `n`/`numHashes`/`bands`/`threshold` — the text near-dup tier;
    * `W` — the substring tier's window; `vecBits`/`vecBands`/`vecDim`/
    * `vecThreshold` — the embedding tier's SRP family. All of them are
    * STATE-SHAPING: the first ingest persists them into `_params` and
    * every later writer must present the same values (mixing families
    * across ingests would silently corrupt every index). */
  final case class Params(n: Int = 2, numHashes: Int = 32, bands: Int = 16,
                          threshold: Double = 0.05, W: Int = 20,
                          portable: Boolean = true,
                          vecBits: Int = 8, vecBands: Int = 2,
                          vecDim: Int = 64, vecThreshold: Double = 0.9)

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  // ---- persisted params: written once by the first ingest, immutable
  // after (r13 review: compact() guessed `portable` for empty-table
  // schemas; now every reader that lacks a Params argument reads the
  // stored truth, and a writer presenting different params fails fast).

  private def paramsPath(stateDir: String) =
    java.nio.file.Paths.get(s"$stateDir/_params")

  private def writeParams(stateDir: String, p: Params): Unit = {
    val body = Seq(
      s"n=${p.n}", s"numHashes=${p.numHashes}", s"bands=${p.bands}",
      s"threshold=${p.threshold}", s"W=${p.W}", s"portable=${p.portable}",
      s"vecBits=${p.vecBits}", s"vecBands=${p.vecBands}",
      s"vecDim=${p.vecDim}", s"vecThreshold=${p.vecThreshold}"
    ).mkString("", "\n", "\n")
    java.nio.file.Files.write(paramsPath(stateDir), body.getBytes("UTF-8"))
  }

  private[operators] def storedParams(stateDir: String): Option[Params] = {
    val f = paramsPath(stateDir)
    if (!java.nio.file.Files.exists(f)) None
    else {
      val kv = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        .linesIterator.filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); (k.trim, v.trim)
        }.toMap
      Some(Params(kv("n").toInt, kv("numHashes").toInt, kv("bands").toInt,
        kv("threshold").toDouble, kv("W").toInt, kv("portable").toBoolean,
        kv("vecBits").toInt, kv("vecBands").toInt, kv("vecDim").toInt,
        kv("vecThreshold").toDouble))
    }
  }

  private def requireOrPersistParams(stateDir: String, p: Params): Unit =
    storedParams(stateDir) match {
      case Some(stored) => require(stored == p,
        s"state at $stateDir was built with $stored; refusing to ingest " +
          s"with mismatched $p — mixed hash families would corrupt every index")
      case None => writeParams(stateDir, p)
    }

  // ---- single-writer guard (r13 review): an exclusive OS file lock for
  // the duration of each ingest/compact. tryLock (never a blocking wait)
  // so a second writer FAILS FAST; the OS releases the lock on process
  // death, so a crash never wedges the state dir (unlike an
  // O_EXCL-created lock file, which would survive the crash and block
  // the redelivered batch that crash-safety depends on).

  private def withWriterLock[T](stateDir: String)(body: => T): T = {
    new java.io.File(stateDir).mkdirs()
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(s"$stateDir/_lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
      require(lock != null,
        s"another writer holds $stateDir/_lock — CutReportMaintenance " +
          "state dirs are single-writer (one ingest/compact at a time)")
      try body finally lock.release()
    } finally ch.close()
  }

  // ---- versioned state with an atomic commit pointer (r13 review):
  // every ingest writes ALL its segments under version n+1 and then
  // atomically renames the `_version` pointer onto it. A crash anywhere
  // mid-ingest leaves the pointer on v<n> — every table still mutually
  // consistent, orphaned v<n+1> segments invisible to readers — and the
  // redelivered batch simply overwrites them.

  private def currentVersion(stateDir: String): Long = {
    val f = new java.io.File(s"$stateDir/_version")
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    else -1L
  }

  private def commitVersion(stateDir: String, v: Long): Unit = {
    val dir = new java.io.File(stateDir)
    dir.mkdirs()
    val tmp = java.nio.file.Paths.get(s"$stateDir/_version.tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$stateDir/_version"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // Best-effort GC of superseded version dirs, DEFERRED one version
    // (r13 review): a lazy DataFrame handed out under v-1 stays
    // readable across the commit; v-2 and older go.
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        f.getName.drop(1).forall(_.isDigit) && f.getName.drop(1).toLong < v - 1)
      .foreach(deleteTree)
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(); ()
  }

  // ---- per-version SEGMENTS (r13 CutMaintScale measurement): each
  // ingest lands only ITS rows under seg_<name>/v<n>; readers union
  // every segment in [floor, committed version]. Index tables
  // re-aggregate on read (min is associative, so per-batch partial
  // minima ARE the global index); pair tables apply tombstones; the
  // report folds latest-version-wins. Crash safety is unchanged — an
  // orphaned v<n+1> segment is above the pointer, so readers ignore it
  // and the replay overwrites it.

  /** Segment floor: [[compact]] folds every live segment into one and
    * raises the floor (committed inside the versioned dir, so it flips
    * atomically WITH the pointer) — readers then ignore the superseded
    * segment dirs, which are GC'd one compaction later. */
  private def segFloor(stateDir: String): Long = {
    val v = currentVersion(stateDir)
    val f = new java.io.File(s"$stateDir/v$v/_seg_floor")
    if (v >= 0 && f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    else 0L
  }

  private def segmentDirs(stateDir: String, name: String): Seq[(Long, String)] = {
    val d = new java.io.File(s"$stateDir/seg_$name")
    Option(d.listFiles()).toSeq.flatten
      .filter { f =>
        val n = f.getName
        f.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit)
      }
      .map(f => (f.getName.drop(1).toLong, f.getPath))
  }

  private def liveSegmentDirs(stateDir: String, name: String): Seq[String] = {
    val cur = currentVersion(stateDir)
    val floor = segFloor(stateDir)
    segmentDirs(stateDir, name)
      .collect { case (v, p) if v >= floor && v <= cur => p }
  }

  private def readSegments(spark: SparkSession, stateDir: String, name: String,
                           schema: StructType): DataFrame = {
    val dirs = liveSegmentDirs(stateDir, name)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  private def writeSegment(df: DataFrame, stateDir: String, version: Long,
                           name: String): Unit =
    df.write.mode("overwrite").parquet(s"$stateDir/seg_$name/v$version")

  /** Tombstone semantics for the pair tables: a pair row written at
    * version `v` is live iff no tombstone for its bucket carries a
    * LATER version (an ingest that re-stars a bucket tombstones it at
    * version n and writes the re-verified pairs at the same n — they
    * survive their own tombstone, everything older dies). When there
    * are no tombstones at all the fold is skipped — post-compaction
    * reads are a plain segment union. */
  private def livePairs(pairSegs: DataFrame, tombs: DataFrame,
                        k1: String, k2: String,
                        tombsKnownEmpty: Boolean): DataFrame =
    if (tombsKnownEmpty) pairSegs
    else {
      val mt = tombs.groupBy(k1, k2).agg(max("v").as("_tv"))
      pairSegs.join(mt, Seq(k1, k2), "left")
        .filter(col("_tv").isNull || col("v") >= col("_tv"))
        .drop("_tv")
    }

  private val appendOnlyTables = Seq("docs", "fp_index", "band_index",
    "hash_index", "marks", "vecs", "vec_index")

  /** Fold every live segment of each table into ONE segment at a fresh
    * version and raise the segment floor — the maintenance window's
    * compaction step. Append-only tables union-fold; the pair tables
    * fold to their LIVE rows (tombstones applied, then dropped); the
    * report folds latest-version-wins to one row per doc. Read-side
    * cost per ingest is O(live segments); periodic compaction keeps
    * that amortized O(1) per ingest the way any LSM-ish store does
    * (the CutMaintScale `compactArm` measures the wall and the
    * before/after ingest cost). Crash-safe like ingest: everything
    * lands under v<next> (merged segments + the raised `_seg_floor` +
    * carried markers) before the pointer flips; a crash mid-compaction
    * leaves the old floor and segments intact. Superseded segment dirs
    * are GC'd ONE COMPACTION LATER (r13 review: a lazy [[report]]
    * DataFrame handed out before the compaction stays readable). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    withWriterLock(stateDir) {
      val curV = currentVersion(stateDir)
      require(curV >= 0, s"nothing to compact at $stateDir")
      val p = storedParams(stateDir).getOrElse(Params())
      val nextV = curV + 1
      val floorBefore = segFloor(stateDir)
      appendOnlyTables.foreach { name =>
        // No checkpoint needed: the merge reads the OLD segment dirs and
        // writes a NEW one — no read-own-overwrite hazard.
        writeSegment(readSegments(spark, stateDir, name, tableSchema(name, p)),
          stateDir, nextV, name)
      }
      Seq(("nd_pairs", "nd_tombs", "bh"), ("vec_pairs", "vec_tombs", "bkey"))
        .foreach { case (pairsName, tombsName, k2) =>
          val live = livePairs(
            readSegments(spark, stateDir, pairsName, tableSchema(pairsName, p)),
            readSegments(spark, stateDir, tombsName, tableSchema(tombsName, p)),
            "band", k2,
            tombsKnownEmpty = liveSegmentDirs(stateDir, tombsName).isEmpty)
          writeSegment(live.withColumn("v", lit(nextV)), stateDir, nextV, pairsName)
          // Tombstones fold away entirely: the raised floor hides every
          // old tombstone segment and the folded pairs are all live.
        }
      writeSegment(foldReport(spark, stateDir).withColumn("v", lit(nextV)),
        stateDir, nextV, "report")
      writeMarkers(stateDir, curV, nextV, None)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stateDir/v$nextV/_seg_floor"),
        nextV.toString.getBytes("UTF-8"))
      commitVersion(stateDir, nextV)
      // Deferred GC: drop only segments superseded by the PREVIOUS
      // compaction (below the old floor); the ones this compaction just
      // folded stay one more generation for in-flight lazy readers.
      (appendOnlyTables ++ Seq("nd_pairs", "nd_tombs", "vec_pairs",
        "vec_tombs", "report")).foreach { name =>
        segmentDirs(stateDir, name)
          .collect { case (v, path) if v < floorBefore => new java.io.File(path) }
          .foreach(deleteTree)
      }
    }

  /** Per-stream applied-batch markers, committed WITH the version (a
    * marker outside the atomic commit could disagree with the state
    * after a crash). Carried forward version to version. */
  private def appliedBatch(stateDir: String, streamId: String): Long = {
    val v = currentVersion(stateDir)
    val f = new java.io.File(s"$stateDir/v$v/_applied_$streamId")
    if (v >= 0 && f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    else -1L
  }

  private def writeMarkers(stateDir: String, from: Long, to: Long,
                           update: Option[(String, Long)]): Unit = {
    val toDir = new java.io.File(s"$stateDir/v$to")
    toDir.mkdirs()
    if (from >= 0) {
      val fromDir = new java.io.File(s"$stateDir/v$from")
      Option(fromDir.listFiles()).toSeq.flatten
        // _applied_* replay markers AND the compaction floor both ride
        // the versioned dir so they flip atomically with the pointer.
        .filter(f => f.getName.startsWith("_applied_") ||
          f.getName == "_seg_floor")
        .foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$stateDir/v$to/${f.getName}"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    }
    update.foreach { case (sid, bid) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stateDir/v$to/_applied_$sid"),
        bid.toString.getBytes("UTF-8"))
    }
  }

  private val bhType = LongType // xxhash64 band key; portable uses string
  private def bandSchema(portable: Boolean) = StructType(Seq(
    StructField("band", IntegerType), StructField("bh",
      if (portable) StringType else bhType),
    StructField("id", LongType), StructField("n_sh", IntegerType)))
  private def pairSchemaV(portable: Boolean) = StructType(Seq(
    StructField("band", IntegerType), StructField("bh",
      if (portable) StringType else bhType),
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("v", LongType)))
  private def ndTombSchema(portable: Boolean) = StructType(Seq(
    StructField("band", IntegerType), StructField("bh",
      if (portable) StringType else bhType),
    StructField("v", LongType)))
  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("n_tokens", LongType), StructField("fp", StringType)))
  private val fpSchema = StructType(Seq(
    StructField("fp", StringType), StructField("keep_id", LongType)))
  private val hashSchema = StructType(Seq(
    StructField("h", LongType), StructField("id", LongType),
    StructField("pos", LongType)))
  private val marksSchema = StructType(Seq(
    StructField("id", LongType), StructField("pos", LongType)))
  private val vecsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("emb", ArrayType(DoubleType)), StructField("nrm", DoubleType)))
  private val vecIndexSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bkey", LongType),
    StructField("id", LongType)))
  private val vecPairSchemaV = StructType(Seq(
    StructField("band", IntegerType), StructField("bkey", LongType),
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("v", LongType)))
  private val vecTombSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bkey", LongType),
    StructField("v", LongType)))
  private val reportSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("tier", StringType),
    StructField("dup_of", LongType), StructField("cut_tokens", LongType)))
  private val reportSchemaV = reportSchema.add(StructField("v", LongType))

  private def tableSchema(name: String, p: Params): StructType = name match {
    case "docs" => docsSchema
    case "fp_index" => fpSchema
    case "band_index" => bandSchema(p.portable)
    case "hash_index" => hashSchema
    case "marks" => marksSchema
    case "vecs" => vecsSchema
    case "vec_index" => vecIndexSchema
    case "nd_pairs" => pairSchemaV(p.portable)
    case "nd_tombs" => ndTombSchema(p.portable)
    case "vec_pairs" => vecPairSchemaV
    case "vec_tombs" => vecTombSchema
    case "report" => reportSchemaV
  }

  private def bandedOf(pre: DataFrame, p: Params): DataFrame = {
    val sig = DedupFunctions.minhashSignaturesFromShingles(
      pre, p.numHashes, p.portable)
    sig.select(col("id"), col("n_sh"),
      posexplode(array(DedupFunctions.bandKeyColumns(col("sig"),
        p.bands, p.numHashes / p.bands, p.portable): _*))
        .as(Seq("band", "bh")))
      .select(col("band").cast("int").as("band"), col("bh"),
        col("id").cast("long").as("id"), col("n_sh").cast("int").as("n_sh"))
  }

  /** SRP band keys of `(doc_id, emb, nrm)` vectors — the q297 probe
    * grain: one bucket per vector, `vecBands` keys sliced out of it. */
  private def vecBandedOf(vecs: DataFrame, p: Params,
                          planes: Seq[Seq[Int]]): DataFrame = {
    val w = p.vecBits / p.vecBands
    vecs.select(col("doc_id").as("id"),
        Similarity.srpBucketPlanes(col("emb"), planes).as("bucket"))
      .select(col("id"),
        posexplode(array((0 until p.vecBands).map(k =>
          shiftright(col("bucket"), k * w).bitwiseAND(lit((1 << w) - 1))): _*))
          .as(Seq("band", "bkey")))
      .select(col("band").cast("int").as("band"),
        col("bkey").cast("long").as("bkey"), col("id"))
  }

  /** One tier's bucket maintenance, shared by the text-LSH and SRP
    * tiers: split the batch's affected buckets by OWNERSHIP (r13
    * CutMaintScale measurement — re-starring every affected bucket's
    * full membership made per-ingest cost grow with hot-bucket size):
    *
    *  - OWNER-STABLE bucket (every batch id > the stored owner — the
    *    only case an append-only ingest ever sees): the old members'
    *    star pairs are untouched by construction, so ONLY the batch's
    *    (owner, new-member) pairs are candidates — per-ingest work is
    *    |batch| × bands rows no matter how hot the bucket is.
    *  - OWNER-CHANGED bucket (a backfill id undercuts the owner): the
    *    star root moves, so the bucket's pairs retract (a tombstone
    *    row) and the full membership re-stars — bounded by the
    *    backfill's reach, and impossible under monotone ingest ids.
    *
    * Returns (candidates with bucket provenance [+ any `payload`
    * columns carried off the index/batch rows], retract-bucket keys —
    * changed buckets that HAD a prior owner, i.e. the only ones whose
    * stored pairs must die; a brand-new bucket never gets a tombstone,
    * or the append path would accumulate O(corpus × bands) tombstone
    * rows for buckets with nothing to retract). */
  private def bucketCandidates(indexOld: DataFrame, bandB: DataFrame,
                               k2: String, payload: Seq[String])
      : (DataFrame, DataFrame) = {
    val keys = Seq("band", k2)
    val affected = bandB.select("band", k2).distinct()
    val ownersOld = indexOld.join(affected, keys)
      .groupBy("band", k2)
      .agg(min("id").as("old_owner"),
        payload.map(c => min_by(col(c), col("id")).as(s"o_$c")): _*)
      .localCheckpoint(true)
    val batchMin = bandB.groupBy("band", k2).agg(min("id").as("bmin"))
    val stableB = ownersOld.join(batchMin, keys)
      .filter(col("bmin") > col("old_owner"))
      .select(col("band") +: col(k2) +: col("old_owner") +:
        payload.map(c => col(s"o_$c")): _*)
    val changedB = affected.join(stableB.select("band", k2), keys, "left_anti")
    // Retraction is owed only where an old owner existed and moved.
    val retractB = ownersOld.select("band", k2)
      .join(stableB.select("band", k2), keys, "left_anti")
      .localCheckpoint(true)
    // Stable buckets: batch members pair with the stored owner only.
    val candStable = bandB.join(stableB, keys)
      .select(col("band") +: col(k2) +: col("old_owner").as("id_a") +:
        col("id").as("id_b") +:
        (payload.map(c => col(s"o_$c").as(s"${c}_a")) ++
          payload.map(c => col(c).as(s"${c}_b"))): _*)
    // Changed (or brand-new) buckets: full membership re-star.
    val membersChanged = indexOld.join(changedB, keys)
      .unionByName(bandB.join(changedB, keys))
      .localCheckpoint(true)
    val ownersChanged = membersChanged.groupBy("band", k2)
      .agg(min("id").as("id_a"),
        payload.map(c => min_by(col(c), col("id")).as(s"${c}_a")): _*)
    val candChanged = membersChanged.join(ownersChanged, keys)
      .filter(col("id") > col("id_a"))
      .select(col("band") +: col(k2) +: col("id_a") +: col("id").as("id_b") +:
        (payload.map(c => col(s"${c}_a")) ++
          payload.map(c => col(c).as(s"${c}_b"))): _*)
    (candStable.unionByName(candChanged).localCheckpoint(true), retractB)
  }

  /** Ingest one batch `(doc_id, text[, emb])`: probe + repair + write
    * back all state tables as one atomically-committed version; returns
    * the TOUCHED report rows (batch docs and every existing doc whose
    * disposition inputs changed) with an `upd` column — `new` /
    * `changed` / `same`. `appliedMarker` (streamId → batchId) commits a
    * replay marker with the version — see [[streamWriter]]. */
  def ingest(spark: SparkSession, stateDir: String, batch: DataFrame,
             p: Params = Params(),
             appliedMarker: Option[(String, Long)] = None): DataFrame =
    withWriterLock(stateDir) {
      requireOrPersistParams(stateDir, p)
      ingestLocked(spark, stateDir, batch, p, appliedMarker)
    }

  private def ingestLocked(spark: SparkSession, stateDir: String,
                           batch: DataFrame, p: Params,
                           appliedMarker: Option[(String, Long)]): DataFrame = {
    val curV = currentVersion(stateDir)
    val nextV = curV + 1
    val bDocs = batch.select(col("doc_id").cast("long").as("doc_id"),
        col("text"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .localCheckpoint(true)
    val docsOld = readSegments(spark, stateDir, "docs", docsSchema)

    // ---- exact tier: merge the batch's per-fp minimum into the index.
    // The stored index is per-ingest (fp, keep_id) partial minima; min
    // is associative, so the read-side aggregate IS the global index —
    // and only the BATCH's fps are ever aggregated here (r14: the old
    // full-keyspace merge materialized O(corpus) rows per ingest).
    val fpSegs = readSegments(spark, stateDir, "fp_index", fpSchema)
    val bFpMin = bDocs.groupBy("fp").agg(min("doc_id").as("bmin"))
      .localCheckpoint(true)
    val fpOldB = fpSegs.join(bFpMin.select("fp"), Seq("fp"))
      .groupBy("fp").agg(min("keep_id").as("old_keep"))
    // Old docs whose keeper the batch undercut — their ex_dup_of moves.
    val undercutFps = bFpMin.join(fpOldB, Seq("fp"))
      .filter(col("bmin") < col("old_keep")).select("fp")
    val exTouched = docsOld.join(undercutFps, Seq("fp")).select(col("doc_id"))

    // ---- near-dup tier: affected buckets re-star; their old pairs
    // retract via a tombstone row, everything else stays untouched on
    // disk (r14: the old path re-read and re-wrote the WHOLE pair set).
    val bandOld = readSegments(spark, stateDir, "band_index", bandSchema(p.portable))
    val pairSegsOld = readSegments(spark, stateDir, "nd_pairs", pairSchemaV(p.portable))
    val ndTombsOld = readSegments(spark, stateDir, "nd_tombs", ndTombSchema(p.portable))
    val ndTombsEmpty = liveSegmentDirs(stateDir, "nd_tombs").isEmpty
    val pairsOldLive = livePairs(pairSegsOld, ndTombsOld, "band", "bh", ndTombsEmpty)
    val bSh = DedupFunctions.shingledDocs(bDocs, "text", "doc_id", p.n)
      .localCheckpoint(true)
    val bandB = bandedOf(bSh, p).localCheckpoint(true)
    val (cand, ndRetractB) = bucketCandidates(bandOld, bandB, "bh", Seq("n_sh"))
    // Shingles for verification — only the docs the candidates actually
    // touch (stable-bucket owners + changed-bucket members + batch),
    // re-shingled from the stored corpus.
    val memberIds = cand.select(col("id_a").as("doc_id"))
      .unionByName(cand.select(col("id_b").as("doc_id"))).distinct()
    val oldMemberSh = DedupFunctions.shingledDocs(
      docsOld.join(memberIds, Seq("doc_id")), "text", "doc_id", p.n)
    val allSh = bSh.unionByName(oldMemberSh).localCheckpoint(true)
    // Verify each DISTINCT pair once (a pair can surface from several
    // buckets), then fan the verdict back onto the bucket-provenance
    // rows the stored pair set keeps.
    val verifiedPairs = cand
      .select(col("id_a"), col("id_b"), col("n_sh_a"), col("n_sh_b"))
      .dropDuplicates("id_a", "id_b")
      .join(allSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(col("shared").cast("double") /
        (col("n_sh_a") + col("n_sh_b") - col("shared")).cast("double") >= p.threshold)
      .select(col("id_a"), col("id_b"))
    val pairsNewSeg = cand.join(verifiedPairs, Seq("id_a", "id_b"))
      .select(col("band"), col("bh"), col("id_a"), col("id_b"))
      .withColumn("v", lit(nextV)).localCheckpoint(true)
    // Only owner-changed buckets retract — one tombstone row each.
    val ndTombsNewSeg = ndRetractB.withColumn("v", lit(nextV))
    val pairsNextLive = livePairs(pairSegsOld.unionByName(pairsNewSeg),
      ndTombsOld.unionByName(ndTombsNewSeg), "band", "bh",
      tombsKnownEmpty = false)
    // Docs whose pair set may have moved: id_b of anything retracted or
    // newly verified in an affected bucket.
    val ndTouched = pairsOldLive.join(ndRetractB, Seq("band", "bh"))
      .select(col("id_b").as("doc_id"))
      .unionByName(pairsNewSeg.select(col("id_b").as("doc_id")))

    // ---- embedding tier (optional `emb` column): the q297 probe
    // algebra maintained — SRP band keys index the stored vectors; the
    // same owner-stable/owner-changed split; exact-cosine verification.
    val hasEmb = batch.columns.contains("emb")
    val planes = Similarity.deterministicPlanes(p.vecBits, p.vecDim)
    val bVecs =
      if (hasEmb) batch.filter(col("emb").isNotNull)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("emb").cast("array<double>").as("emb"))
        .select(col("doc_id"), col("emb"), Similarity.l2Norm(col("emb")).as("nrm"))
        .localCheckpoint(true)
      else emptyDf(spark, vecsSchema)
    val vecSegs = readSegments(spark, stateDir, "vecs", vecsSchema)
    val vecIdxOld = readSegments(spark, stateDir, "vec_index", vecIndexSchema)
    val vecPairSegsOld = readSegments(spark, stateDir, "vec_pairs", vecPairSchemaV)
    val vecTombsOld = readSegments(spark, stateDir, "vec_tombs", vecTombSchema)
    val vecTombsEmpty = liveSegmentDirs(stateDir, "vec_tombs").isEmpty
    val vecPairsOldLive = livePairs(vecPairSegsOld, vecTombsOld, "band", "bkey",
      vecTombsEmpty)
    val bandVB = vecBandedOf(bVecs, p, planes).localCheckpoint(true)
    val (vCand, vRetractB) = bucketCandidates(vecIdxOld, bandVB, "bkey", Nil)
    val vIds = vCand.select(col("id_a").as("doc_id"))
      .unionByName(vCand.select(col("id_b").as("doc_id"))).distinct()
    val vecsForVerify = vecSegs.join(vIds, Seq("doc_id"))
      .unionByName(bVecs.join(vIds, Seq("doc_id"))).localCheckpoint(true)
    val vVerified = vCand.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      .join(vecsForVerify.select(col("doc_id").as("id_a"),
        col("emb").as("e_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(vecsForVerify.select(col("doc_id").as("id_b"),
        col("emb").as("e_b"), col("nrm").as("n_b")), Seq("id_b"))
      .filter(try_divide(Similarity.dot(col("e_a"), col("e_b")),
        col("n_a") * col("n_b")) >= p.vecThreshold)
      .select(col("id_a"), col("id_b"))
    val vPairsNewSeg = vCand.join(vVerified, Seq("id_a", "id_b"))
      .select(col("band"), col("bkey"), col("id_a"), col("id_b"))
      .withColumn("v", lit(nextV)).localCheckpoint(true)
    val vTombsNewSeg = vRetractB.withColumn("v", lit(nextV))
    val vecPairsNextLive = livePairs(vecPairSegsOld.unionByName(vPairsNewSeg),
      vecTombsOld.unionByName(vTombsNewSeg), "band", "bkey",
      tombsKnownEmpty = false)
    val vecTouched = vecPairsOldLive.join(vRetractB, Seq("band", "bkey"))
      .select(col("id_b").as("doc_id"))
      .unionByName(vPairsNewSeg.select(col("id_b").as("doc_id")))

    // ---- substring tier: first-occurrence index merge; marks only
    // grow. Stored as per-ingest (h → first (id, pos)) partials; min
    // over the segments is the global first occurrence — merged here
    // for the BATCH's hashes only (the only ones marks can move on).
    val hashSegs = readSegments(spark, stateDir, "hash_index", hashSchema)
    val marksSegs = readSegments(spark, stateDir, "marks", marksSchema)
    val bH = ExactSubstrings.tokenWindowHashes(bDocs, "text", "doc_id", p.W)
      .select(col("id").cast("long").as("id"), col("pos").cast("long").as("pos"),
        col("h"))
      .localCheckpoint(true)
    val occ = struct(col("id"), col("pos"))
    val bFirst = bH.groupBy("h").agg(min(occ).as("bf")).localCheckpoint(true)
    val oldFirstB = hashSegs.select(col("h"), occ.as("o"))
      .join(bFirst.select("h"), Seq("h"))
      .groupBy("h").agg(min(col("o")).as("of"))
    val firstMerged = bFirst.join(oldFirstB, Seq("h"), "left")
      .select(col("h"), col("of"), col("bf"), least(col("of"), col("bf")).as("cf"))
      .localCheckpoint(true)
    val newMarks = bH.join(firstMerged, Seq("h"))
      .filter(occ =!= col("cf")).select(col("id"), col("pos"))
      .dropDuplicates("id", "pos")
    val repairMarks = firstMerged
      .filter(col("of").isNotNull && col("bf").isNotNull && col("bf") < col("of"))
      .select(col("of.id").as("id"), col("of.pos").as("pos"))
      .dropDuplicates("id", "pos")
    val marksAdded = newMarks.unionByName(repairMarks).localCheckpoint(true)
    val ssTouched = marksAdded.select(col("id").as("doc_id"))

    // ---- touched set + report re-assembly for touched ids only.
    val touched = bDocs.select("doc_id")
      .unionByName(exTouched).unionByName(ndTouched)
      .unionByName(vecTouched).unionByName(ssTouched)
      .distinct().localCheckpoint(true)
    val tDocs = docsOld.select("doc_id", "fp", "n_tokens")
      .unionByName(bDocs.select("doc_id", "fp", "n_tokens"))
      .join(touched, Seq("doc_id"))
      .localCheckpoint(true)
    // Exact keeper for the touched docs' fps: stored partial minima of
    // exactly those fps, merged with the batch minima.
    val tFps = tDocs.select("fp").distinct()
    val fpOldT = fpSegs.join(tFps, Seq("fp"))
      .groupBy("fp").agg(min("keep_id").as("okeep"))
    val keepT = tFps.join(fpOldT, Seq("fp"), "left")
      .join(bFpMin, Seq("fp"), "left")
      .select(col("fp"), least(col("okeep"), col("bmin")).as("keep_id"))
    val exCut = tDocs.select("doc_id", "fp").join(keepT, Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("keep_id").as("ex_dup_of"))
    val ndCut = pairsNextLive
      .join(touched.select(col("doc_id").as("id_b")), Seq("id_b"))
      .groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("nd_dup_of"))
    val embCut = vecPairsNextLive
      .join(touched.select(col("doc_id").as("id_b")), Seq("id_b"))
      .groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("emb_dup_of"))
    val touchedIds = touched.select(col("doc_id").as("id"))
    val marksT = marksSegs.join(touchedIds, Seq("id"))
      .unionByName(marksAdded.join(touchedIds, Seq("id")))
    val ssTrim = ExactSubstrings.mergeMarks(
        marksT.select(col("id"), col("pos"), (col("pos") + (p.W - 1)).as("e")))
      .groupBy(col("id").as("doc_id"))
      .agg(sum("span_len").as("substr_tokens"))
    val touchedRows = tDocs.select("doc_id", "n_tokens")
      .join(exCut, Seq("doc_id"), "left")
      .join(ndCut, Seq("doc_id"), "left")
      .join(embCut, Seq("doc_id"), "left")
      .join(ssTrim, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_dup_of").isNotNull, "exact")
          .when(col("nd_dup_of").isNotNull, "neardup")
          .when(col("emb_dup_of").isNotNull, "embdup")
          .when(col("substr_tokens").isNotNull, "partial")
          .otherwise("keep").as("tier"),
        when(col("ex_dup_of").isNotNull, col("ex_dup_of"))
          .when(col("nd_dup_of").isNotNull, col("nd_dup_of"))
          .when(col("emb_dup_of").isNotNull, col("emb_dup_of")).as("dup_of"),
        when(col("ex_dup_of").isNotNull || col("nd_dup_of").isNotNull ||
            col("emb_dup_of").isNotNull, col("n_tokens"))
          .when(col("substr_tokens").isNotNull, col("substr_tokens"))
          .otherwise(lit(0L)).cast("long").as("cut_tokens"))
      .localCheckpoint(true)
    // The report is an OVERLAY: this ingest's segment holds ONLY the
    // touched rows (stamped with the version); [[report]] folds
    // latest-version-wins across segments. The prior dispositions for
    // the `upd` column come from the same fold restricted to the
    // touched ids — never the whole report.
    val reportSegsOld = readSegments(spark, stateDir, "report", reportSchemaV)
    val reportOldT = reportSegsOld.join(touched, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("tier"), col("dup_of"), col("cut_tokens")),
        col("v")).as("r"))
      .select(col("doc_id"), col("r.tier").as("o_tier"),
        col("r.dup_of").as("o_dup"), col("r.cut_tokens").as("o_cut"))
    val out = touchedRows
      .join(reportOldT, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tier"), col("dup_of"), col("cut_tokens"),
        when(col("o_tier").isNull, "new")
          .when(col("tier") <=> col("o_tier") &&
            col("dup_of") <=> col("o_dup") &&
            col("cut_tokens") <=> col("o_cut"), "same")
          .otherwise("changed").as("upd"))
      .localCheckpoint(true)

    // ---- land the batch's segments, then flip the pointer: every
    // write below is O(batch + touched state), never O(corpus). A crash
    // anywhere before commitVersion leaves v<cur> intact and the
    // redelivered batch overwrites the orphans.
    writeSegment(bDocs, stateDir, nextV, "docs")
    writeSegment(bFpMin.select(col("fp"), col("bmin").as("keep_id")),
      stateDir, nextV, "fp_index")
    writeSegment(bandB, stateDir, nextV, "band_index")
    writeSegment(pairsNewSeg, stateDir, nextV, "nd_pairs")
    writeSegment(ndTombsNewSeg, stateDir, nextV, "nd_tombs")
    writeSegment(bVecs, stateDir, nextV, "vecs")
    writeSegment(bandVB, stateDir, nextV, "vec_index")
    writeSegment(vPairsNewSeg, stateDir, nextV, "vec_pairs")
    writeSegment(vTombsNewSeg, stateDir, nextV, "vec_tombs")
    writeSegment(bFirst.select(col("h"), col("bf.id").as("id"),
      col("bf.pos").as("pos")), stateDir, nextV, "hash_index")
    writeSegment(marksAdded, stateDir, nextV, "marks")
    writeSegment(out.select(col("doc_id"), col("tier"), col("dup_of"),
      col("cut_tokens")).withColumn("v", lit(nextV)), stateDir, nextV, "report")
    writeMarkers(stateDir, curV, nextV, appliedMarker)
    commitVersion(stateDir, nextV)
    out
  }

  private def foldReport(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = liveSegmentDirs(stateDir, "report")
    if (dirs.isEmpty) emptyDf(spark, reportSchema)
    else if (dirs.size == 1)
      // One live segment (fresh state or just-compacted): its doc_ids
      // are unique by construction — skip the fold entirely.
      spark.read.schema(reportSchemaV).parquet(dirs.head).drop("v")
    else spark.read.schema(reportSchemaV).parquet(dirs: _*)
      .groupBy("doc_id")
      .agg(max_by(struct(col("tier"), col("dup_of"), col("cut_tokens")),
        col("v")).as("r"))
      .select(col("doc_id"), col("r.tier").as("tier"),
        col("r.dup_of").as("dup_of"), col("r.cut_tokens").as("cut_tokens"))
  }

  /** The served artifact: the stored report, as of the last ingest
    * (latest-version-wins across the overlay segments). The returned
    * frame reads committed segments lazily — consume it before the
    * SECOND subsequent [[compact]] (ingests never delete segments;
    * compaction defers its GC one generation). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    foldReport(spark, stateDir)

  /** The curated corpus the maintained state SERVES — the q296
    * span-complement reconstruction executed over the stored marks:
    * drops every doc the tier ladder cuts outright (`exact`/`neardup`/
    * `embdup`), removes each marked token span from the rest, and
    * returns the canonical trimmed text with kept/cut token counts.
    * This is the artifact a training run reads. Spans per doc are a
    * bounded list (collect_list at the per-doc grain) joined back to
    * the stored corpus scan; the reconstruction is a narrow
    * higher-order projection — TEXT never shuffles. */
  def curatedCorpus(spark: SparkSession, stateDir: String): DataFrame = {
    val p = storedParams(stateDir).getOrElse(Params())
    val kept = report(spark, stateDir)
      .filter(!col("tier").isin("exact", "neardup", "embdup"))
      .select("doc_id", "tier")
    val marksAll = readSegments(spark, stateDir, "marks", marksSchema)
    val spans = ExactSubstrings.mergeMarks(
        marksAll.select(col("id"), col("pos"), (col("pos") + (p.W - 1)).as("e")))
      .groupBy(col("id").as("doc_id"))
      .agg(collect_list(struct(col("span_start").cast("long").as("tok_start"),
        col("span_end").cast("long").as("tok_end"))).as("spans"))
    val toks = TextFunctions.tokens(col("text"))
    val sp = coalesce(col("spans"),
      array().cast("array<struct<tok_start:long,tok_end:long>>"))
    val keptToks = filter(
      transform(sequence(lit(1L), size(toks).cast("long")), i =>
        struct(i.as("i"), element_at(toks, i.cast("int")).as("tok"))),
      x => !exists(sp, sg =>
        x.getField("i") >= sg.getField("tok_start") &&
          x.getField("i") <= sg.getField("tok_end")))
    readSegments(spark, stateDir, "docs", docsSchema)
      .join(kept, Seq("doc_id"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tier"),
        size(keptToks).cast("long").as("n_tokens_kept"),
        (size(toks) - size(keptToks)).cast("long").as("n_tokens_cut"),
        array_join(transform(keptToks, x => x.getField("tok")), " ").as("text_kept"))
  }

  /** Consistency self-check — the production safety valve the
    * convergence spec institutionalizes: recompute the report FROM
    * SCRATCH over the stored corpus (the same one-shot batch algebra the
    * incremental path must equal — fp min-groups, star-form LSH over a
    * single-pass shingle frame, SRP star pairs over the stored vectors,
    * token-window spans) and return every row where the stored report
    * disagrees. Empty result = the maintained state is exactly what a
    * full replay would produce; any row is a bug or corruption, with
    * both versions side by side. O(corpus) — run it as an audit, not
    * per ingest. */
  def verifyAgainstReplay(spark: SparkSession, stateDir: String,
                          p: Params = Params()): DataFrame = {
    val corpus = readSegments(spark, stateDir, "docs", docsSchema)
      .select(col("doc_id"), col("text"), col("n_tokens"), col("fp"))
      .localCheckpoint(true)
    val exCut = corpus.select(col("doc_id"), col("fp"))
      .join(corpus.groupBy("fp").agg(min("doc_id").as("keep_id")), Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("keep_id").as("ex_dup_of"))
    val sh = DedupFunctions.shingledDocs(corpus, "text", "doc_id", p.n)
      .localCheckpoint(true)
    val ndCut = DedupFunctions.minhashLshStarPairsShingled(sh,
        p.numHashes, p.bands, p.threshold, p.portable)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min(col("id_a")).as("nd_dup_of"))
    // Embedding tier replay: SRP star pairs over the stored vectors.
    val planes = Similarity.deterministicPlanes(p.vecBits, p.vecDim)
    val vecs = readSegments(spark, stateDir, "vecs", vecsSchema)
      .localCheckpoint(true)
    val bandedV = vecBandedOf(vecs, p, planes)
    val vOwners = bandedV.groupBy("band", "bkey").agg(min("id").as("id_a"))
    val vPairs = bandedV.join(vOwners, Seq("band", "bkey"))
      .filter(col("id") > col("id_a"))
      .select(col("id_a"), col("id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("doc_id").as("id_a"),
        col("emb").as("e_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(vecs.select(col("doc_id").as("id_b"),
        col("emb").as("e_b"), col("nrm").as("n_b")), Seq("id_b"))
      .filter(try_divide(Similarity.dot(col("e_a"), col("e_b")),
        col("n_a") * col("n_b")) >= p.vecThreshold)
    val embCut = vPairs.groupBy(col("id_b").as("doc_id"))
      .agg(min(col("id_a")).as("emb_dup_of"))
    val ssTrim = ExactSubstrings
      .duplicateTokenSpans(corpus, "text", "doc_id", p.W)
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("tok_len")).as("substr_tokens"))
    val replay = corpus.select("doc_id", "n_tokens")
      .join(exCut, Seq("doc_id"), "left")
      .join(ndCut, Seq("doc_id"), "left")
      .join(embCut, Seq("doc_id"), "left")
      .join(ssTrim, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_dup_of").isNotNull, "exact")
          .when(col("nd_dup_of").isNotNull, "neardup")
          .when(col("emb_dup_of").isNotNull, "embdup")
          .when(col("substr_tokens").isNotNull, "partial")
          .otherwise("keep").as("r_tier"),
        when(col("ex_dup_of").isNotNull, col("ex_dup_of"))
          .when(col("nd_dup_of").isNotNull, col("nd_dup_of"))
          .when(col("emb_dup_of").isNotNull, col("emb_dup_of")).as("r_dup_of"),
        when(col("ex_dup_of").isNotNull || col("nd_dup_of").isNotNull ||
            col("emb_dup_of").isNotNull, col("n_tokens"))
          .when(col("substr_tokens").isNotNull, col("substr_tokens"))
          .otherwise(lit(0L)).cast("long").as("r_cut_tokens"))
    report(spark, stateDir).join(replay, Seq("doc_id"), "full_outer")
      .filter(!(col("tier") <=> col("r_tier")) ||
        !(col("dup_of") <=> col("r_dup_of")) ||
        !(col("cut_tokens") <=> col("r_cut_tokens")))
  }

  /** Attach the maintenance pipeline to a STREAM: every micro-batch is
    * one [[ingest]], so the stored report tracks the live corpus — the
    * streaming form of the whole arc. `foreachBatch` re-delivers a
    * batch after a failure/restart, and [[ingest]] is NOT idempotent
    * (replayed doc_ids would double-enter the indexes), so the last
    * applied batchId is committed ATOMICALLY with each state version
    * (see [[ingest]]) and already-applied batches are skipped — the
    * standard foreachBatch exactly-once-ish discipline (the engine's T3
    * theme), pinned by the replay spec.
    *
    * `streamId` names the source LINEAGE, not the query run: batchIds
    * restart at 0 under a fresh checkpoint, so a marker that compared
    * raw batchIds across lineages would silently drop the new stream's
    * first batches (r13 review). Markers are kept per streamId — reuse
    * the id exactly when a restart may redeliver the same data (same
    * checkpoint, or a rebuilt checkpoint over the same source), and
    * pick a new id when attaching a genuinely new source to existing
    * state. Multiple lineages may feed one state dir, but never
    * CONCURRENTLY — each ingest takes the state dir's exclusive writer
    * lock and a second simultaneous writer fails fast.
    *
    * `embCol` names an optional embedding column (array of float/
    * double) to maintain the vector tier from.
    *
    * Caller starts the returned writer (choosing trigger/checkpoint):
    * {{{ CutReportMaintenance.streamWriter(docs, dir, "doc_id", "text",
    *       streamId = "crawl-feed")
    *       .option("checkpointLocation", ckpt).start() }}} */
  def streamWriter(docs: DataFrame, stateDir: String,
                   idCol: String, textCol: String, p: Params = Params(),
                   streamId: String = "default",
                   embCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(streamId.nonEmpty && streamId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"streamId '$streamId' must be a filesystem-safe token")
    val cols = col(idCol).as("doc_id") +: col(textCol).as("text") +:
      embCol.map(e => col(e).as("emb")).toSeq
    docs.select(cols: _*)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (batchId > appliedBatch(stateDir, streamId)) {
          ingest(batch.sparkSession, stateDir, batch.toDF(), p,
            appliedMarker = Some((streamId, batchId)))
          ()
        }
      }
  }
}
