package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature kernel — the per-ROW form of the xxhash64
  * MinHash family, for call sites that cannot stage an explode →
  * min-aggregate plan (the streaming near-dup operator: a groupBy ahead
  * of `flatMapGroupsWithState` would be a second stateful operator).
  *
  * `minhash_sig(sh, numHashes)` maps `array<string>` shingles to the
  * `array<long>` signature `[min_s xxhash64(s, 1), …, min_s
  * xxhash64(s, numHashes)]` — bit-identical to the column-level
  * [[DedupFunctions.minhashSignature]] higher-order form, replicating
  * Spark's exact `xxhash64(s, seed)` chain
  * `XXH64.hashInt(seed, XXH64.hashUTF8String(s, 42L))`, pinned by a
  * FunctionsSpec equality property so the two can never drift.
  *
  * Why it exists (r12 verdict #4): the HOF form is CodegenFallback —
  * every element evaluates an interpreted expression tree AND re-hashes
  * the shingle's bytes once per seed (32× redundant byte hashing). This
  * kernel hashes each shingle's bytes ONCE and derives the 32 seeded
  * values with `hashInt` mixes in a tight primitive loop — measured ~5×
  * on the streaming near-dup probe's signature stage. Empty shingle
  * arrays yield null (callers filter `size(sh) > 0`, matching the HOF
  * path's upstream filter).
  *
  * Scale: a narrow map over the document scan — no shuffle, no UDF, no
  * state; the signature stage of a 100 TB near-dup sweep runs at scan
  * speed. */
object MinhashSigExpression {

  /** Tight-loop kernel: one byte-hash per shingle, `numHashes` int
    * mixes per shingle. Returns null on an empty array (no shingles →
    * no signature). A NULL element matches the HOF path's semantics
    * exactly: Spark's hash expressions SKIP null children, so
    * `xxhash64(null, seed)` leaves the running hash at the initial 42L
    * before the seed mix — here, `base = 42L` (r13 review: the kernel
    * previously dereferenced the element and NPE'd). */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val base =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i + 1, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    ArrayData.toArrayData(mins)
  }

  case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {
    require(numHashes > 0, "numHashes must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // Empty shingle arrays map to null even when the child is non-null.
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got ${t.catalogString}")
    }
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any =
      minhashSig(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val code = nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.MinhashSigExpression.minhashSig($c, $numHashes);
        ${ev.isNull} = ${ev.value} == null;""")
      code
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column API ----

  def minhashSig(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(sh), numHashes))

  // ---- SQL registration (graft.GraftExtensions) ----

  val minhashSigDescriptor
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(getClass.getCanonicalName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"minhash_sig expects 2 arguments (shingles, numHashes), got ${exprs.length}")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig's numHashes must be an integer literal, got $other")
        }
        MinhashSig(exprs.head, n)
      })
}
