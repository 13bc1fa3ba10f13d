package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character statistics — the gibberish / low-diversity
  * quality signal (Shannon character entropy, dominant-character fraction,
  * distinct-character count). Repetitive spam ("aaaa…", "💯💯💯…") scores
  * near-zero entropy with a dominant-character fraction near 1; natural
  * prose sits around 4–4.5 bits with no character above ~0.2. Classic
  * corpus-curation filter alongside the Gopher rules (q50) and the
  * unigram-LM perplexity score (q57).
  *
  * `char_stats(s)` returns `array<double>` of
  * `[entropy_bits, top_char_frac, distinct_chars]` — one expression
  * evaluation yields all three (whole-stage codegen CSEs the repeated
  * projection), so the per-row cost is a single code-point pass plus a
  * 128-slot frequency table (heap map only for non-ASCII text).
  *
  * Scale: a narrow map over the document scan — no shuffle, no UDF, no
  * state; 100 TB of documents stream through at scan speed. The entropy
  * and fraction are rounded to 6 dp (Spark `round` HALF_UP semantics) so
  * downstream gates compare reproducible values regardless of partition
  * count or visit order.
  */
object CharStatsExpression {

  private val Ln2 = java.lang.Math.log(2.0)

  /** Spark `round(d, 6)` semantics: BigDecimal HALF_UP. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Single-pass kernel: code-point frequencies (ASCII array fast path,
    * heap map only when non-ASCII appears) → entropy in bits, max
    * frequency fraction, distinct count. Empty string → [0, 0, 0]. */
  def charStats(input: UTF8String): ArrayData = {
    val s = input.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        val prev = other.get(cp)
        other.put(cp, if (prev == null) 1 else prev.intValue() + 1)
      }
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return ArrayData.toArrayData(Array(0.0, 0.0, 0.0))
    val nD = n.toDouble
    var h = 0.0
    var mx = 0
    var k = 0L
    var c = 0
    while (c < 128) {
      val cc = ascii(c)
      if (cc > 0) {
        val p = cc / nD
        h -= p * (java.lang.Math.log(p) / Ln2)
        if (cc > mx) mx = cc
        k += 1
      }
      c += 1
    }
    if (other != null) {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val cc = it.next().getValue.intValue()
        val p = cc / nD
        h -= p * (java.lang.Math.log(p) / Ln2)
        if (cc > mx) mx = cc
        k += 1
      }
    }
    // a single repeated character gives h = -1·log2(1) = -0.0; normalize
    if (h == 0.0) h = 0.0
    ArrayData.toArrayData(Array(round6(h), round6(mx / nD), k.toDouble))
  }

  case class CharStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    override def prettyName: String = "char_stats"

    override def nullSafeEval(input: Any): Any =
      charStats(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.CharStatsExpression.charStats($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column API ----

  def charStats(c: Column): Column =
    ColumnBridge.column(CharStats(ColumnBridge.expression(c)))

  // ---- SQL registration (graft.GraftExtensions) ----

  val charStatsDescriptor
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("char_stats"),
      new ExpressionInfo(getClass.getCanonicalName, "char_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"char_stats expects 1 argument, got ${exprs.length}")
        CharStats(exprs.head)
      })
}
