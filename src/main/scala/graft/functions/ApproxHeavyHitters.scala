package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a custom Catalyst aggregate.
  *
  * q44 finds exact top-k tokens with a full hash aggregate — one counter
  * per DISTINCT token, so its state grows with the vocabulary. At 100 TB
  * the vocabulary (URLs, n-grams, user ids) can itself be billions of
  * keys; the Misra-Gries summary keeps AT MOST `capacity` counters per
  * partial aggregate and still guarantees, after a single pass:
  *
  *   - any item with true frequency > n/(capacity+1) IS in the summary
  *     (no false dismissals of true heavy hitters), and
  *   - each reported estimate is an UNDER-count by at most n/(capacity+1)
  *     (est ≤ true ≤ est + n/(capacity+1)).
  *
  * Partials merge by counter addition followed by subtracting the
  * (capacity+1)-th largest count (Agarwal et al., "Mergeable Summaries",
  * PODS'12) — the error bounds add, so the distributed two-stage
  * aggregate keeps the same guarantee with n = total row count. The
  * output is NOT a deterministic function of the input multiset alone
  * (it depends on partitioning), which is why this operator is
  * property-tested against its guarantees rather than value-checked
  * against a SQL oracle — the exact q44 stays the oracle-checked twin.
  *
  * Buffer is a plain Scala map serialized as length-prefixed UTF-8 —
  * an ObjectHashAggregate buffer, spill-safe.
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic MG update: count if tracked or room left, else decrement
    * every counter by one (dropping zeros) — the step that "charges" the
    * untracked item against capacity+1 distinct items at once. */
  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < capacity =>
        // clone: eval rows are reused backing buffers
        buf.update(item.clone(), 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries merge: add counters, then if over capacity
    * subtract the (capacity+1)-th largest count and drop non-positives —
    * keeps ≤ capacity counters and adds the two halves' error bounds. */
  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Summary as array<struct<item,est>>, highest estimate first, ties by
    * item — deterministic GIVEN the final summary. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(k, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "approx_heavy_hitters"
}

object ApproxHeavyHitters {

  /** Aggregate column: Misra-Gries summary of a string column with at
    * most `capacity` counters per partial. */
  def misraGries(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), capacity).toAggregateExpression())

  /** Approximate top-k tokens over a text corpus: one pass, bounded
    * state. `capacity` trades memory for error (bound n/(capacity+1));
    * keep capacity ≫ k so ranks near k are trustworthy. Returns
    * (token, est) rows, highest estimate first. */
  def approxTopTokens(df: DataFrame, textCol: String, k: Int,
                      capacity: Int = 256): DataFrame = {
    val toks = df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    toks.agg(misraGries(col("token"), capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("token"), col("h.est").as("est"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
  }

  /** Count-min sketch point estimates for the corpus's top-`k` exact
    * tokens — the OVER-counting sketch next to Misra-Gries'
    * under-counting summary: `rows` hash rows × `width` counters; a
    * token's estimate is the MIN over rows of its counter, guaranteeing
    * est ≥ true with overshoot ≤ 2·n/width at ≥ 1 − (1/2)^rows
    * probability. Where Misra-Gries answers "what are the heavy items",
    * the CMS answers point queries for ANY item after one pass.
    *
    * Fully declarative, and deterministic given the portable md5 hash
    * family (row r hashes token t to bucket md5Long("r:t") mod width):
    * the counter table is a (row, bucket) hash aggregate of FIXED size
    * rows×width — partials are sketch-sized regardless of vocabulary,
    * the same bounded-state story as the Misra-Gries buffer, and unlike
    * it the result is a pure function of the input multiset, so a SQL
    * engine replays it value-for-value (q61's oracle does).
    *
    * Output: (term, exact_cnt, cms_est) for the top-k exact tokens
    * (count desc, term tie-break), est ≥ exact always. */
  def countMinEstimates(df: DataFrame, textCol: String,
                        rows: Int = 4, width: Int = 64,
                        k: Int = 20): DataFrame = {
    val terms = df.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    def bucketOf(r: Int, t: Column): Column =
      pmod(TextFunctions.md5Long(concat(lit(s"$r:"), t)), lit(width))
    val counters = terms
      .select(posexplode(array((0 until rows).map(r => bucketOf(r, col("term"))): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    val top = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
    val probes = top.select(col("term"), col("cnt"),
      posexplode(array((0 until rows).map(r => bucketOf(r, col("term"))): _*))
        .as(Seq("r", "b")))
    probes.join(counters, Seq("r", "b"))
      .groupBy("term", "cnt")
      .agg(min(col("c")).as("cms_est"))
      .select(col("term"), col("cnt").as("exact_cnt"), col("cms_est"))
  }
}
