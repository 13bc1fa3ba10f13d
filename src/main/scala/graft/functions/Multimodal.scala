package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * plumbing (schemas, hashing, batch shape, partitioning) is real and
  * tested; the actual media decoding is STUBBED with deterministic fakes —
  * this container has no image/audio codecs. Every stub is marked
  * `STUB:` in its doc; swapping in a real decoder keeps the schema and
  * the plan shape.
  *
  * Scale note: binaries never enter a shuffle key; anything that groups or
  * joins uses the content hash (32 bytes) instead of the payload. Columnar
  * parquet keeps unprojected binaries on disk — a metadata-only query never
  * reads the blobs.
  */
object Multimodal {

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

  /** STUB: image decode. A real implementation would decode the codec
    * header; this derives (width, height, channels) deterministically from
    * the content hash so downstream plumbing (schema, filters, grouping)
    * is exercised for real. */
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
