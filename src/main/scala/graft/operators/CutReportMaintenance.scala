package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{DedupFunctions, ExactSubstrings, TextFunctions}

/** MAINTAINED composed cut report — the persistent-state form of the
  * dedup arc (batch q292 → incremental probes q291/q293/q294 →
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
  * State tables under `stateDir` (each a plain parquet dir, swapped
  * atomically per ingest — production would use a transactional table
  * format; the swap discipline is the same):
  *
  *  - `docs`       (doc_id, text, n_tokens, fp) — the corpus itself;
  *                 text is retained because exact-Jaccard verification
  *                 of a later bucket collision needs the OLD member's
  *                 shingles (bounded: only affected buckets' members
  *                 are ever re-read).
  *  - `fp_index`   (fp, keep_id) — exact tier: earliest doc per
  *                 fingerprint.
  *  - `band_index` (band, bh, id, n_sh) — near-dup tier: every doc's
  *                 LSH band keys, the q291 probe target.
  *  - `nd_pairs`   (band, bh, id_a, id_b) — VERIFIED star pairs with
  *                 bucket provenance, so a bucket whose owner changes
  *                 can retract exactly its own pairs (the q295
  *                 rescission case) without touching any other bucket.
  *  - `hash_index` (h, id, pos) — substring tier: each window hash's
  *                 earliest (id, pos) occurrence.
  *  - `marks`      (id, pos) — accumulated duplicate-window marks
  *                 (monotone: marks only ever grow).
  *  - `report`     (doc_id, tier, dup_of, cut_tokens) — the served
  *                 artifact.
  *
  * Per-ingest delta shape: the batch's fingerprints/band keys/window
  * hashes probe the indexes (equi-joins on bounded keys, the q291/q293/
  * q294 algebra); only AFFECTED buckets re-star and re-verify; only
  * hashes the batch undercuts repair old marks; and the report is
  * re-assembled ONLY for touched doc_ids, everything else carried over
  * by an anti-join. At 100 TB each index is a key-bucketed table and
  * every probe above is a co-located equi-join.
  *
  * Assumes append/backfill ingest: doc_ids are unique across all
  * ingests (a re-crawled id is a different pipeline — SnapshotDiff —
  * not this one). */
object CutReportMaintenance {

  final case class Params(n: Int = 2, numHashes: Int = 32, bands: Int = 16,
                          threshold: Double = 0.05, W: Int = 20,
                          portable: Boolean = true)

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  // ---- versioned state with an atomic commit pointer (r13 review):
  // every ingest writes ALL its tables under a fresh v<n+1>/ directory
  // and then atomically renames the `_version` pointer onto it. A crash
  // anywhere mid-ingest leaves the pointer on v<n> — every table still
  // mutually consistent — and the redelivered batch simply overwrites
  // the orphaned v<n+1> files. Without this, seven sequential parquet
  // overwrites could die half-applied AND the replay would double-enter
  // the already-overwritten indexes.

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
    // Best-effort GC of superseded version dirs (a crash here is
    // harmless — stale dirs are never read once the pointer moved on).
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v") &&
        f.getName.drop(1).forall(_.isDigit) && f.getName.drop(1).toLong < v)
      .foreach(deleteTree)
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(); ()
  }

  private def readState(spark: SparkSession, stateDir: String, name: String,
                        schema: StructType): DataFrame = {
    val v = currentVersion(stateDir)
    val p = s"$stateDir/v$v/$name"
    if (v >= 0 && new java.io.File(p).exists()) spark.read.parquet(p)
    else emptyDf(spark, schema)
  }

  /** Materialize `df` (localCheckpoint — the state tables are bounded at
    * this harness's scale; production swaps in a transactional table
    * format), then land it in the NEXT version's directory. */
  private def writeState(df: DataFrame, stateDir: String, version: Long,
                         name: String): Unit =
    df.localCheckpoint(true).write.mode("overwrite")
      .parquet(s"$stateDir/v$version/$name")

  // ---- append-only tables as per-version SEGMENTS (r13 CutMaintScale
  // measurement): docs (the corpus text!), the band index, the marks,
  // and the fp/hash-first partials only ever GROW, so rewriting them
  // whole per ingest made the state-persistence leg O(corpus) per batch
  // — the dominant per-ingest cost once the probe algebra went
  // delta-shaped. Each ingest now lands only ITS rows under
  // seg_<name>/v<n>; readers union every segment ≤ the committed
  // version (index tables re-aggregate on read: min is associative, so
  // per-batch partial minima ARE the global index). Crash safety is
  // unchanged — an orphaned v<n+1> segment is above the pointer, so
  // readers ignore it and the replay overwrites it.

  /** Segment floor: [[compact]] folds every live segment into one and
    * raises the floor (committed inside the versioned dir, so it flips
    * atomically WITH the pointer) — readers then ignore the superseded
    * segment dirs, which are GC'd best-effort after the commit. */
  private def segFloor(stateDir: String): Long = {
    val v = currentVersion(stateDir)
    val f = new java.io.File(s"$stateDir/v$v/_seg_floor")
    if (v >= 0 && f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    else 0L
  }

  private def readSegments(spark: SparkSession, stateDir: String, name: String,
                           schema: StructType): DataFrame = {
    val cur = currentVersion(stateDir)
    val floor = segFloor(stateDir)
    val d = new java.io.File(s"$stateDir/seg_$name")
    val dirs = Option(d.listFiles()).toSeq.flatten
      .filter { f =>
        val n = f.getName
        f.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit) && {
          val v = n.drop(1).toLong
          v >= floor && v <= cur
        }
      }
      .map(_.getPath)
    if (dirs.isEmpty) emptyDf(spark, schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  private def writeSegment(df: DataFrame, stateDir: String, version: Long,
                           name: String): Unit =
    df.write.mode("overwrite").parquet(s"$stateDir/seg_$name/v$version")

  private val segmentedTables = Seq("docs", "fp_index", "band_index",
    "hash_index", "marks")

  /** Fold every live segment of each append-only table into ONE segment
    * at a fresh version and raise the segment floor — the maintenance
    * window's compaction step. Read-side cost per ingest is
    * O(live segments); periodic compaction keeps that amortized O(1)
    * per ingest the way any LSM-ish store does. Crash-safe like ingest:
    * everything lands under v<next> (merged segments + the raised
    * `_seg_floor` + carried markers) before the pointer flips; a crash
    * mid-compaction leaves the old floor and segments intact. */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    val curV = currentVersion(stateDir)
    require(curV >= 0, s"nothing to compact at $stateDir")
    val nextV = curV + 1
    val schemas = Map(
      "docs" -> docsSchema, "fp_index" -> fpSchema,
      "band_index" -> bandSchema(portable = true),
      "hash_index" -> hashSchema, "marks" -> marksSchema)
    segmentedTables.foreach { name =>
      // Schema note: band_index's bh column type follows Params.portable;
      // read with the on-disk schema (merge of one table's segments —
      // they are all written by the same Params) rather than a guess.
      val d = new java.io.File(s"$stateDir/seg_$name")
      val floor = segFloor(stateDir)
      val dirs = Option(d.listFiles()).toSeq.flatten
        .filter { f =>
          val n = f.getName
          f.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit) && {
            val v = n.drop(1).toLong
            v >= floor && v <= curV
          }
        }.map(_.getPath)
      // No checkpoint needed: the merge reads the OLD segment dirs and
      // writes a NEW one — no read-own-overwrite hazard.
      val merged =
        if (dirs.isEmpty) emptyDf(spark, schemas(name))
        else spark.read.parquet(dirs: _*)
      writeSegment(merged, stateDir, nextV, name)
    }
    // Mutating tables carry over unchanged into the new version.
    Seq("nd_pairs", "report").foreach { name =>
      val src = new java.io.File(s"$stateDir/v$curV/$name")
      if (src.exists())
        writeState(spark.read.parquet(src.getPath), stateDir, nextV, name)
    }
    writeMarkers(stateDir, curV, nextV, None)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$stateDir/v$nextV/_seg_floor"),
      nextV.toString.getBytes("UTF-8"))
    commitVersion(stateDir, nextV)
    // Best-effort GC of the superseded segment dirs.
    segmentedTables.foreach { name =>
      val d = new java.io.File(s"$stateDir/seg_$name")
      Option(d.listFiles()).toSeq.flatten
        .filter { f =>
          val n = f.getName
          f.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
            n.drop(1).toLong < nextV
        }.foreach(deleteTree)
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
  private def pairSchema(portable: Boolean) = StructType(Seq(
    StructField("band", IntegerType), StructField("bh",
      if (portable) StringType else bhType),
    StructField("id_a", LongType), StructField("id_b", LongType)))
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
  private val reportSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("tier", StringType),
    StructField("dup_of", LongType), StructField("cut_tokens", LongType)))

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

  /** Ingest one batch `(doc_id, text)`: probe + repair + write back all
    * state tables as one atomically-committed version; returns the
    * TOUCHED report rows (batch docs and every existing doc whose
    * disposition inputs changed) with an `upd` column — `new` /
    * `changed` / `same`. `appliedMarker` (streamId → batchId) commits a
    * replay marker with the version — see [[streamWriter]]. */
  def ingest(spark: SparkSession, stateDir: String, batch: DataFrame,
             p: Params = Params(),
             appliedMarker: Option[(String, Long)] = None): DataFrame = {
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
    // is associative, so the read-side aggregate IS the global index.
    val fpOld = readSegments(spark, stateDir, "fp_index", fpSchema)
      .groupBy("fp").agg(min("keep_id").as("keep_id"))
    val bFpMin = bDocs.groupBy("fp").agg(min("doc_id").as("bmin"))
    val fpMerged = fpOld.join(bFpMin, Seq("fp"), "full_outer")
      .select(col("fp"), least(col("keep_id"), col("bmin")).as("keep_id"),
        col("keep_id").as("old_keep"), col("bmin"))
      .localCheckpoint(true)
    // Old docs whose keeper the batch undercut — their ex_dup_of moves.
    val exTouched = docsOld
      .join(fpMerged.filter(col("bmin").isNotNull &&
          col("old_keep").isNotNull && col("bmin") < col("old_keep"))
          .select("fp"),
        Seq("fp"))
      .select(col("doc_id"))

    // ---- near-dup tier: affected buckets re-star; their old pairs
    // retract, everything else carries over untouched.
    val bandOld = readSegments(spark, stateDir, "band_index", bandSchema(p.portable))
    val pairsOld = readState(spark, stateDir, "nd_pairs", pairSchema(p.portable))
    val bSh = DedupFunctions.shingledDocs(bDocs, "text", "doc_id", p.n)
      .localCheckpoint(true)
    val bandB = bandedOf(bSh, p).localCheckpoint(true)
    val affected = bandB.select("band", "bh").distinct().localCheckpoint(true)
    // Split the affected buckets by OWNERSHIP (r13 CutMaintScale
    // measurement: re-starring every affected bucket's full membership
    // made per-ingest cost grow with the size of hot buckets — a
    // corpus-wide boilerplate passage concentrates O(corpus) members
    // into one bucket and the 5th sf1 ingest cost 2.7× the 1st):
    //
    //  - OWNER-STABLE bucket (every batch id > the stored owner — the
    //    only case an append-only ingest ever sees): the old members'
    //    star pairs are untouched by construction, so ONLY the batch's
    //    (owner, new-member) pairs are candidates — per-ingest work is
    //    |batch| × bands rows no matter how hot the bucket is.
    //  - OWNER-CHANGED bucket (a backfill id undercuts the owner): the
    //    star root moves, so the bucket's pairs retract and the full
    //    membership re-stars — bounded by the backfill's reach, and
    //    impossible under monotone ingest ids.
    val ownersOld = bandOld.join(affected, Seq("band", "bh"))
      .groupBy("band", "bh")
      .agg(min("id").as("old_owner"), min_by(col("n_sh"), col("id")).as("old_n"))
      .localCheckpoint(true)
    val batchMin = bandB.groupBy("band", "bh").agg(min("id").as("bmin"))
    val stableB = ownersOld.join(batchMin, Seq("band", "bh"))
      .filter(col("bmin") > col("old_owner"))
      .select(col("band"), col("bh"), col("old_owner"), col("old_n"))
    val changedB = affected.join(
      stableB.select("band", "bh"), Seq("band", "bh"), "left_anti")
    // Stable buckets: batch members pair with the stored owner only.
    val candStable = bandB.join(stableB, Seq("band", "bh"))
      .select(col("band"), col("bh"), col("old_owner").as("id_a"),
        col("id").as("id_b"), col("old_n").as("n_a"), col("n_sh").as("n_b"))
    // Changed (or brand-new) buckets: full membership re-star.
    val membersChanged = bandOld.join(changedB, Seq("band", "bh"))
      .unionByName(bandB.join(changedB, Seq("band", "bh")))
      .localCheckpoint(true)
    val ownersChanged = membersChanged.groupBy("band", "bh")
      .agg(min("id").as("id_a"), min_by(col("n_sh"), col("id")).as("n_a"))
    val candChanged = membersChanged.join(ownersChanged, Seq("band", "bh"))
      .filter(col("id") > col("id_a"))
      .select(col("band"), col("bh"), col("id_a"), col("id").as("id_b"),
        col("n_a"), col("n_sh").as("n_b"))
    val cand = candStable.unionByName(candChanged).localCheckpoint(true)
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
      .select("id_a", "id_b", "n_a", "n_b").dropDuplicates("id_a", "id_b")
      .join(allSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double") >= p.threshold)
      .select(col("id_a"), col("id_b"))
    val pairsAffNew = cand.join(verifiedPairs, Seq("id_a", "id_b"))
      .select(col("band"), col("bh"), col("id_a"), col("id_b"))
    // Only owner-changed buckets retract; stable buckets keep their rows.
    val pairsRetracted = pairsOld.join(changedB, Seq("band", "bh"))
    val pairsNext = pairsOld.join(changedB, Seq("band", "bh"), "left_anti")
      .unionByName(pairsAffNew)
      .localCheckpoint(true)
    // Docs whose pair set may have moved: id_b of anything retracted or
    // newly verified in an affected bucket.
    val ndTouched = pairsRetracted.select(col("id_b").as("doc_id"))
      .unionByName(pairsAffNew.select(col("id_b").as("doc_id")))

    // ---- substring tier: first-occurrence index merge; marks only grow.
    // Stored as per-ingest (h → first (id, pos)) partials; min over the
    // segments is the global first occurrence.
    val marksOld = readSegments(spark, stateDir, "marks", marksSchema)
    val bH = ExactSubstrings.tokenWindowHashes(bDocs, "text", "doc_id", p.W)
      .select(col("id").cast("long").as("id"), col("pos").cast("long").as("pos"),
        col("h"))
      .localCheckpoint(true)
    val occ = struct(col("id"), col("pos"))
    val bFirst = bH.groupBy("h").agg(min(occ).as("bf"))
    val firstMerged = readSegments(spark, stateDir, "hash_index", hashSchema)
      .groupBy("h").agg(min(occ).as("of"))
      .join(bFirst, Seq("h"), "full_outer")
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
    // Lazy unions over committed segments + the checkpointed delta —
    // materializing these whole per ingest would re-introduce the
    // O(corpus) persistence cost the segment layout removes.
    val marksNext = marksOld.unionByName(marksAdded)
    val ssTouched = marksAdded.select(col("id").as("doc_id"))

    // ---- touched set + report re-assembly for touched ids only.
    val docsNext = docsOld.unionByName(bDocs)
    val touched = bDocs.select("doc_id")
      .unionByName(exTouched).unionByName(ndTouched).unionByName(ssTouched)
      .distinct().localCheckpoint(true)
    val tDocs = docsNext.join(touched, Seq("doc_id"))
    val exCut = tDocs.select(col("doc_id"), col("fp"))
      .join(fpMerged.select("fp", "keep_id"), Seq("fp"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("keep_id").as("ex_dup_of"))
    val ndCut = pairsNext.join(touched.select(col("doc_id").as("id_b")), Seq("id_b"))
      .groupBy(col("id_b").as("doc_id")).agg(min("id_a").as("nd_dup_of"))
    val ssTrim = ExactSubstrings.mergeMarks(
        marksNext.join(touched.select(col("doc_id").as("id")), Seq("id"))
          .select(col("id"), col("pos"), (col("pos") + (p.W - 1)).as("e")))
      .groupBy(col("id").as("doc_id"))
      .agg(sum("span_len").as("substr_tokens"))
    val touchedRows = tDocs.select("doc_id", "n_tokens")
      .join(exCut, Seq("doc_id"), "left")
      .join(ndCut, Seq("doc_id"), "left")
      .join(ssTrim, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_dup_of").isNotNull, "exact")
          .when(col("nd_dup_of").isNotNull, "neardup")
          .when(col("substr_tokens").isNotNull, "partial")
          .otherwise("keep").as("tier"),
        when(col("ex_dup_of").isNotNull, col("ex_dup_of"))
          .when(col("nd_dup_of").isNotNull, col("nd_dup_of")).as("dup_of"),
        when(col("ex_dup_of").isNotNull || col("nd_dup_of").isNotNull,
            col("n_tokens"))
          .when(col("substr_tokens").isNotNull, col("substr_tokens"))
          .otherwise(lit(0L)).cast("long").as("cut_tokens"))
      .localCheckpoint(true)
    val reportOld = readState(spark, stateDir, "report", reportSchema)
    val reportNext = reportOld.join(touched, Seq("doc_id"), "left_anti")
      .unionByName(touchedRows).localCheckpoint(true)
    val out = touchedRows
      .join(reportOld.select(col("doc_id"), col("tier").as("o_tier"),
        col("dup_of").as("o_dup"), col("cut_tokens").as("o_cut")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("tier"), col("dup_of"), col("cut_tokens"),
        when(col("o_tier").isNull, "new")
          .when(col("tier") <=> col("o_tier") &&
            col("dup_of") <=> col("o_dup") &&
            col("cut_tokens") <=> col("o_cut"), "same")
          .otherwise("changed").as("upd"))
      .localCheckpoint(true)

    // ---- land the batch's state, then flip the pointer: append-only
    // tables write ONLY their new segment (O(batch), not O(corpus));
    // the two mutating tables (nd_pairs, report) land whole under
    // v<next>. A crash anywhere before commitVersion leaves v<cur>
    // intact and the redelivered batch overwrites the orphans.
    writeSegment(bDocs, stateDir, nextV, "docs")
    writeSegment(bFpMin.select(col("fp"), col("bmin").as("keep_id")),
      stateDir, nextV, "fp_index")
    writeSegment(bandB, stateDir, nextV, "band_index")
    writeState(pairsNext, stateDir, nextV, "nd_pairs")
    writeSegment(bFirst.select(col("h"), col("bf.id").as("id"),
      col("bf.pos").as("pos")), stateDir, nextV, "hash_index")
    writeSegment(marksAdded, stateDir, nextV, "marks")
    writeState(reportNext, stateDir, nextV, "report")
    writeMarkers(stateDir, curV, nextV, appliedMarker)
    commitVersion(stateDir, nextV)
    out
  }

  /** The served artifact: the stored report, as of the last ingest. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    readState(spark, stateDir, "report", reportSchema)

  /** Consistency self-check — the production safety valve the
    * convergence spec institutionalizes: recompute the report FROM
    * SCRATCH over the stored corpus (the same one-shot batch algebra the
    * incremental path must equal — fp min-groups, star-form LSH over a
    * single-pass shingle frame, token-window spans) and return every row
    * where the stored report disagrees. Empty result = the maintained
    * state is exactly what a full replay would produce; any row is a
    * bug or corruption, with both versions side by side. O(corpus) —
    * run it as an audit, not per ingest. */
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
    val ssTrim = ExactSubstrings
      .duplicateTokenSpans(corpus, "text", "doc_id", p.W)
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("tok_len")).as("substr_tokens"))
    val replay = corpus.select("doc_id", "n_tokens")
      .join(exCut, Seq("doc_id"), "left")
      .join(ndCut, Seq("doc_id"), "left")
      .join(ssTrim, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_dup_of").isNotNull, "exact")
          .when(col("nd_dup_of").isNotNull, "neardup")
          .when(col("substr_tokens").isNotNull, "partial")
          .otherwise("keep").as("r_tier"),
        when(col("ex_dup_of").isNotNull, col("ex_dup_of"))
          .when(col("nd_dup_of").isNotNull, col("nd_dup_of")).as("r_dup_of"),
        when(col("ex_dup_of").isNotNull || col("nd_dup_of").isNotNull,
            col("n_tokens"))
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
    * state.
    *
    * Caller starts the returned writer (choosing trigger/checkpoint):
    * {{{ CutReportMaintenance.streamWriter(docs, dir, "doc_id", "text",
    *       streamId = "crawl-feed")
    *       .option("checkpointLocation", ckpt).start() }}} */
  def streamWriter(docs: DataFrame, stateDir: String,
                   idCol: String, textCol: String, p: Params = Params(),
                   streamId: String = "default")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(streamId.nonEmpty && streamId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"streamId '$streamId' must be a filesystem-safe token")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
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
