package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text normalization — the canonical first step of every
  * text-dedup pipeline (fingerprints, shingles, and MinHash signatures
  * all disagree across trivially-different encodings of the same string
  * unless the text is normalized first).
  *
  * `text_normalize(s)`:   NFC-compose, drop non-whitespace control
  *                        characters, collapse whitespace runs to one
  *                        space, trim.
  * `text_fold_accents(s)`: the same, plus accent folding — NFD-decompose
  *                        and drop combining marks before recomposing
  *                        ("Café" → "Cafe").
  *
  * A Catalyst `UnaryExpression` with `doGenCode` (not a Scala UDF): the
  * generated code is a direct static call — no closure dispatch, no
  * Row boxing — and stays inside whole-stage codegen like the
  * `regexp_replace` chain it replaces. Per-row work is a single pass
  * over the string (the JDK normalizer runs only when the fast ASCII
  * scan detects non-ASCII content, so the common crawl-corpus row costs
  * one branchy copy loop). Deterministic and locale-independent: JDK
  * `java.text.Normalizer` (Unicode UAX #15) + `Character` class checks
  * only.
  */
object TextNormalizeExpression {

  /** Single-pass normalize core. `fold` = strip combining marks after
    * NFD (accent folding); otherwise NFC. Null-safe at the call sites. */
  def normalize(input: UTF8String, fold: Boolean): UTF8String = {
    val raw = input.toString
    // Fast path: ASCII with no controls and no double spaces is already
    // normal under both modes except for edge whitespace — check cheaply.
    var ascii = true
    var i = 0
    while (ascii && i < raw.length) {
      val c = raw.charAt(i)
      if (c >= 0x80 || Character.isISOControl(c) ||
        (c == ' ' && i + 1 < raw.length && raw.charAt(i + 1) == ' ')) ascii = false
      else i += 1
    }
    if (ascii) {
      val t = raw.trim
      return if (t.length == raw.length) input else UTF8String.fromString(t)
    }
    val form = if (fold) java.text.Normalizer.Form.NFD else java.text.Normalizer.Form.NFC
    val norm = java.text.Normalizer.normalize(raw, form)
    val sb = new java.lang.StringBuilder(norm.length)
    var prevSpace = true // leading whitespace collapses to nothing
    var j = 0
    while (j < norm.length) {
      val cp = norm.codePointAt(j)
      val isMark = fold && {
        val t = Character.getType(cp)
        t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK
      }
      if (!isMark) {
        if (Character.isWhitespace(cp)) {
          if (!prevSpace) { sb.append(' '); prevSpace = true }
        } else if (!Character.isISOControl(cp)) {
          sb.appendCodePoint(cp); prevSpace = false
        }
      }
      j += Character.charCount(cp)
    }
    // drop one trailing collapsed space, if any
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    val recomposed =
      if (fold) java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
      else sb.toString
    UTF8String.fromString(recomposed)
  }

  case class TextNormalize(child: Expression, fold: Boolean) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    override def prettyName: String =
      if (fold) "text_fold_accents" else "text_normalize"

    override def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String], fold)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextNormalizeExpression.normalize($c, $fold)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column API ----

  def textNormalize(c: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(c), fold = false))

  def textFoldAccents(c: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(c), fold = true))

  // ---- SQL registration (graft.GraftExtensions) ----

  private def oneArg(name: String, fold: Boolean)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getCanonicalName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$name expects 1 argument, got ${exprs.length}")
        TextNormalize(exprs.head, fold)
      })

  val textNormalizeDescriptor = oneArg("text_normalize", fold = false)
  val textFoldAccentsDescriptor = oneArg("text_fold_accents", fold = true)
}
