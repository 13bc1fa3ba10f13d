package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoded-image metadata — the output row of [[Multimodal.decodeImage]].
  * `pixel_sha256` hashes the row-major ARGB pixel ints, so it is a
  * representation-independent content fingerprint: the same picture
  * stored as PNG and BMP hashes identically (byte-level sha256 of the
  * payload would not). Top-level case class so Spark derives the UDF
  * result Encoder without an outer pointer. */
case class DecodedImage(width: Int, height: Int, channels: Int,
                        format: String, pixel_sha256: String)

/** Decoded-audio metadata — the output row of [[Multimodal.decodeAudio]].
  * `pcm_sha256` hashes the decoded PCM stream, so it is a
  * container-independent content fingerprint; `duration_ms` is exact
  * integer `frames * 1000 / sample_rate`. */
case class DecodedAudio(encoding: String, sample_rate: Int, channels: Int,
                        bits: Int, frames: Long, duration_ms: Long,
                        pcm_sha256: String)

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * plumbing (schemas, hashing, batch shape, partitioning) is real and
  * tested.
  *
  * Decode capability (see [[capabilities]]): IMAGE decode/resize is REAL —
  * JDK `javax.imageio` ships PNG/JPEG/BMP/GIF/WBMP codecs, no external
  * library needed. AUDIO decode is REAL too — JDK `javax.sound.sampled`
  * parses WAV/AIFF/AU containers with PCM payloads (header fields, frame
  * counts, and the raw PCM stream), which also powers a real windowed
  * RMS-energy feature extractor. Video decoding remains a deterministic
  * stub (`STUB:` marked): the JDK has no video codec and this container
  * has none to bind to; swapping a real decoder in keeps the schema and
  * the plan shape.
  *
  * Why UDFs here and (almost) nowhere else: a codec is per-row imperative
  * byte work with no Catalyst equivalent — the "functions, not UDFs" rule
  * is about not re-implementing expressible algebra, not about codecs.
  * The decode UDF sits in the scan stage as a narrow map (no shuffle
  * before or because of it), which is the same batch shape a
  * `mapInPandas`-style vectorized decoder would have.
  *
  * Scale note: binaries never enter a shuffle key; anything that groups or
  * joins uses the content hash (32 bytes) instead of the payload. Columnar
  * parquet keeps unprojected binaries on disk — a metadata-only query never
  * reads the blobs.
  */
object Multimodal {

  /** Per-modality decode capability: real codec vs deterministic stub. */
  val capabilities: Map[String, String] = Map(
    "image" -> "real (javax.imageio: png/jpeg/bmp/gif/wbmp)",
    "audio" -> "real (javax.sound.sampled: wav/aiff/au, pcm)",
    "video" -> "stub (no JDK codec)")

  /** Metadata schema carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha256", StringType),
    StructField("mime", StringType)
  ))

  /** Wrap a string column as a binary payload (UTF-8) — stand-in for real
    * media bytes in the testdata, which has no blob column. */
  def toPayload(text: Column): Column = encode(text, "UTF-8")

  /** Content-addressed metadata for a binary payload. */
  def payloadMeta(bin: Column, mime: String): Column = struct(
    length(bin).cast(LongType).as("byte_len"),
    lower(sha2(bin, 256)).as("sha256"),
    lit(mime).as("mime"))

  // ------------------------------------------------------------------
  // REAL image codec (JDK javax.imageio)
  // ------------------------------------------------------------------

  private def decodeOne(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None // unknown magic → quarantine
        val r = readers.next()
        try {
          r.setInput(in)
          val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = r.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          // Row-major ARGB ints → SHA-256, one row at a time (bounded
          // buffer even for panorama-wide images).
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val buf = java.nio.ByteBuffer.allocate(4 * w)
          var y = 0
          while (y < h) {
            buf.clear()
            var x = 0
            while (x < w) { buf.putInt(img.getRGB(x, y)); x += 1 }
            md.update(buf.array(), 0, 4 * w)
            y += 1
          }
          val hex = md.digest().map("%02x".format(_)).mkString
          Some(DecodedImage(w, h, img.getColorModel.getNumComponents, fmt, hex))
        } finally r.dispose()
      } finally if (in != null) in.close()
    } catch {
      // Truncated/corrupt payloads surface as null rows, not task
      // failures — one bad blob in a 100 TB scan must not kill the job.
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** REAL image decode via JDK `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP).
    * Returns a `DecodedImage` struct, or NULL for undecodable bytes
    * (unknown magic, truncation, codec error) — filter `isNull` for the
    * quarantine lane. Narrow per-row map; the blob never shuffles. */
  def decodeImage(bin: Column): Column =
    udf(decodeOne _).apply(bin)

  /** Deterministic synthetic PNG: `width × height` RGB pixels generated
    * from `seed` by an LCG, encoded by the JDK PNG writer. This is how
    * the testdata (which has no blob column) gets REAL image bytes whose
    * decoded properties an external oracle can predict arithmetically. */
  private def synthPngOne(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed * 6364136223846793005L +
          (y.toLong * width + x) * 1442695040888963407L
        img.setRGB(x, y, ((v >>> 40) & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def synthPng(width: Column, height: Column, seed: Column): Column =
    udf(synthPngOne _).apply(width, height, seed)

  /** REAL aspect-preserving resize into a `maxW × maxH` box: decode,
    * nearest-neighbor remap (deterministic integer pixel math — no
    * platform-dependent filtering), re-encode as PNG. NULL for
    * undecodable input. Target dims use the same long arithmetic as
    * [[resizeStub]]: `scale = min(maxW·h, maxH·w)`, `w' = w·scale/(w·h)`,
    * floored, clamped to ≥1. */
  def resizeImage(bin: Column, maxW: Int, maxH: Int): Column = {
    val f = (bytes: Array[Byte]) => decodeOneRaw(bytes).map { img =>
      val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
      val scale = math.min(maxW * h, maxH * w)
      val rw = math.max(1L, w * scale / (w * h)).toInt
      val rh = math.max(1L, h * scale / (w * h)).toInt
      val dst = new java.awt.image.BufferedImage(
        rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < rh) {
        val sy = (y.toLong * h / rh).toInt
        var x = 0
        while (x < rw) {
          dst.setRGB(x, y, img.getRGB((x.toLong * w / rw).toInt, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
    udf(f).apply(bin)
  }

  /** Decode to the raw BufferedImage (internal: resize path). */
  private def decodeOneRaw(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  // ------------------------------------------------------------------
  // REAL audio codec (JDK javax.sound.sampled: WAV/AIFF/AU, PCM)
  // ------------------------------------------------------------------

  /** Deterministic 16-bit PCM mono WAV: `nSamples` samples at
    * `sampleRate` Hz generated from `seed` by an LCG, wrapped in a
    * hand-written RIFF header (byte-identical across platforms — the
    * testdata has no blob column, so queries synthesize REAL WAV bytes
    * whose decoded header fields an external oracle predicts
    * arithmetically, the q105 pattern for audio). */
  private def synthWavOne(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2 // 16-bit mono
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    var v = seed
    while (i < nSamples) {
      v = v * 6364136223846793005L + 1442695040888963407L
      bb.putShort((v >>> 40).toShort)
      i += 1
    }
    bb.array()
  }

  def synthWav(seed: Column, sampleRate: Column, nSamples: Column): Column =
    udf(synthWavOne _).apply(seed, sampleRate, nSamples)

  private def decodeAudioOne(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        if (frames < 0 || f.getSampleRate <= 0) return None
        // Hash the raw PCM stream in bounded chunks: a
        // representation-independent content fingerprint (the same PCM in
        // WAV and AIFF hashes identically once normalized to the stream).
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
        val hex = md.digest().map("%02x".format(_)).mkString
        val sr = f.getSampleRate.toInt
        Some(DecodedAudio(f.getEncoding.toString.toLowerCase(java.util.Locale.ROOT),
          sr, f.getChannels, f.getSampleSizeInBits, frames,
          frames * 1000L / sr, hex))
      } finally in.close()
    } catch {
      // Unknown container / truncated header (including
      // UnsupportedAudioFileException) → NULL quarantine lane, exactly
      // like the image path.
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** REAL audio decode via JDK `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM payloads). Returns a `DecodedAudio` struct —
    * encoding, sample rate, channels, bits, frame count, integer
    * duration_ms, and a PCM content hash — or NULL for undecodable
    * bytes. Narrow per-row map; the blob never shuffles. */
  def decodeAudio(bin: Column): Column =
    udf(decodeAudioOne _).apply(bin)

  /** REAL windowed feature extraction: RMS energy per `windowMs` window
    * over the decoded 16-bit PCM stream, in exact integer micro-units
    * (sqrt of the mean of squares, floored) so results are
    * engine-reproducible. NULL for undecodable input; the array length
    * is ceil(frames / windowFrames). */
  def audioEnergy(bin: Column, windowMs: Int): Column = {
    val f = (bytes: Array[Byte]) => {
      if (bytes == null || bytes.isEmpty) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val windowFrames = math.max(1, fmt.getSampleRate.toInt * windowMs / 1000)
            val out = scala.collection.mutable.ArrayBuffer.empty[Long]
            val buf = new Array[Byte](windowFrames * 2)
            val be = fmt.isBigEndian // WAV is LE, AIFF/AU are BE
            var read = in.readNBytes(buf, 0, buf.length)
            while (read > 0) {
              var i = 0
              var sumSq = 0L
              val n = read / 2
              while (i < n) {
                val s =
                  if (be) ((buf(2 * i) << 8) | (buf(2 * i + 1) & 0xff)).toShort
                  else (((buf(2 * i + 1) & 0xff) << 8) | (buf(2 * i) & 0xff)).toShort
                sumSq += s.toLong * s.toLong
                i += 1
              }
              if (n > 0) out += math.sqrt(sumSq.toDouble / n).toLong
              read = in.readNBytes(buf, 0, buf.length)
            }
            Some(out.toSeq)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    udf(f).apply(bin)
  }

  /** Perceptual dHash (difference hash) over REAL decoded pixels — the
    * image near-dup key: decode, partition into a 9×8 luminance grid,
    * emit one bit per horizontally adjacent cell pair (right brighter
    * than left). Re-encodes, resolution changes that preserve the grid,
    * and metadata edits keep the hash; the downstream dedup is then a
    * HASH EQUI-JOIN (or banded Hamming join, the SimHash q16 shape) —
    * never an all-pairs image comparison.
    *
    * Exactness: cell luminance is an integer sum of (r+g+b) over the
    * cell's pixels (cell of pixel x = x·9/W, floor); cells compare by
    * cross-multiplied integer sums, so there is NO floating point and
    * NO dependence on a library resampler — two images whose pixel
    * grids average to the same 9×8 cells (e.g. block-aligned rescales)
    * hash IDENTICALLY, provable arithmetically. Undecodable payloads
    * return NULL (same quarantine lane as [[decodeImage]]). */
  private def dhashOne(bytes: Array[Byte]): Option[Long] = {
    val img = decodeOneRaw(bytes)
    img.flatMap { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      if (w < 9 || h < 8) None
      else {
        val sums = Array.ofDim[Long](8, 9)
        val counts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val cx = x * 9 / w
            val rgb = im.getRGB(x, y)
            sums(cy)(cx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)
            counts(cy)(cx) += 1
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            // right cell brighter than left, in exact integers:
            // sumR/nR > sumL/nL  ⇔  sumR·nL > sumL·nR
            if (sums(cy)(cx + 1) * counts(cy)(cx) >
                sums(cy)(cx) * counts(cy)(cx + 1))
              bits |= 1L << (cy * 8 + cx)
            cx += 1
          }
          cy += 1
        }
        Some(bits)
      }
    }
  }

  def dhash64(bin: Column): Column = udf(dhashOne _).apply(bin)

  /** Deterministic block PNG for dHash verification: a 9×8 grid of
    * constant-gray cells, each cell `cellW × cellH` pixels. Cell
    * brightness = 2·LCG7bit + (cx mod 2): the parity term makes
    * horizontally adjacent cells NEVER tie, so every dHash bit is a
    * strict comparison and any block-aligned rescale of the same seed
    * (different cellW/cellH) provably hashes identically. */
  private def synthBlockPngOne(cellW: Int, cellH: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9 * cellW, 8 * cellH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        // murmur3-style finalizer: an UNMIXED affine seed*A + idx*B is
        // constant-offset across seeds, so adjacent-cell comparisons —
        // and hence the dHash — would collide en masse between seeds.
        var v = seed * 6364136223846793005L +
          (cy * 9L + cx) * 1442695040888963407L
        v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
        v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
        v ^= v >>> 33
        val g = (((v >>> 45) & 0x7f) * 2 + (cx % 2)).toInt // [0, 255], no h-ties
        val rgb = (g << 16) | (g << 8) | g
        var y = cy * cellH
        while (y < (cy + 1) * cellH) {
          var x = cx * cellW
          while (x < (cx + 1) * cellW) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def synthBlockPng(cellW: Column, cellH: Column, seed: Column): Column =
    udf(synthBlockPngOne _).apply(cellW, cellH, seed)

  /** STUB: image decode. A real implementation would decode the codec
    * header; this derives (width, height, channels) deterministically from
    * the content hash so downstream plumbing (schema, filters, grouping)
    * is exercised for real. Kept alongside [[decodeImage]] for blob-less
    * plumbing tests. */
  def decodeImageStub(bin: Column): Column = {
    val h = xxhash64(bin)
    struct(
      (pmod(h, lit(1920)) + 32).cast(IntegerType).as("width"),
      (pmod(shiftright(h, 16), lit(1080)) + 32).cast(IntegerType).as("height"),
      (pmod(shiftright(h, 32), lit(3)) + 1).cast(IntegerType).as("channels"),
      lit("fakeimg").as("format"))
  }

  /** STUB: fixed-dim feature extraction (the CLIP-embedding shape):
    * dim floats in [-0.5, 0.5), deterministic from content. */
  def extractFeaturesStub(bin: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(bin, i), lit(1000L)).cast("double") / 1000.0) - 0.5)

  /** STUB: image resize. A real implementation re-encodes pixels; this
    * keeps the plumbing honest — output is a (payload, image) pair whose
    * decoded dims are the requested box (aspect-preserving fit) and whose
    * payload is a content-derived stand-in (the sha256 re-keys, exactly
    * as a real resize would produce new bytes). */
  def resizeStub(bin: Column, maxW: Int, maxH: Int): Column = {
    val img = decodeImageStub(bin)
    // Long arithmetic: width * scaleNum peaks around 4e9 for large target
    // boxes — Int would silently wrap.
    val w = img.getField("width").cast(LongType)
    val h = img.getField("height").cast(LongType)
    val scaleNum = least(lit(maxW.toLong) * h, lit(maxH.toLong) * w)
    val den = w * h
    struct(
      // fake resized bytes: payload re-keyed by the target box
      encode(concat(lower(sha2(bin, 256)), lit(s":${maxW}x$maxH")), "UTF-8")
        .as("payload"),
      struct(
        (w * scaleNum / den).cast(IntegerType).as("width"),
        (h * scaleNum / den).cast(IntegerType).as("height"),
        img.getField("channels").as("channels"),
        lit("fakeimg").as("format")).as("image"))
  }

  /** STUB: video frame sampling — every `everyMs` up to `durationMsOf`
    * fake duration; emits (frame_ts_ms, frame_hash) structs. */
  def frameSampleStub(bin: Column, everyMs: Int): Column = {
    val durationMs = pmod(xxhash64(bin), lit(60000L)) // fake ≤60s duration
    transform(sequence(lit(0L), durationMs, lit(everyMs.toLong)), ts =>
      struct(ts.as("frame_ts_ms"), xxhash64(bin, ts).as("frame_hash")))
  }

  /** Assemble a multimodal table from a text corpus: payload + metadata +
    * stub-decoded fields. The deliverable plan shape: one narrow map over
    * the corpus, metadata struct next to the blob. */
  def multimodalize(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      toPayload(col(textCol)).as("payload"),
      payloadMeta(toPayload(col(textCol)), "text/plain").as("meta"),
      decodeImageStub(toPayload(col(textCol))).as("image"))
}
