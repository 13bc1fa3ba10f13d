package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the embedding hot path.
  *
  * The ANN tiers score every (query, candidate) pair with a cosine; the
  * declarative form (`aggregate` over `zip_with`) is correct but allocates
  * an intermediate array per pair and evaluates a lambda per element —
  * higher-order functions don't participate in whole-stage codegen's tight
  * loop. These expressions generate a plain fused Java loop instead
  * (`doGenCode`), with an interpreted `nullSafeEval` twin for the
  * non-codegen paths.
  *
  * Bit-compatibility contract (what lets these swap in under the DuckDB
  * oracles without changing a single hash): every accumulator folds in
  * DOUBLE, left-to-right, exactly like the
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` form they replace — interleaving the three cosine
  * accumulators in one pass does not change any individual accumulator's
  * operation order, so the result is the same IEEE double. Null semantics
  * mirror the fold form: unequal lengths or a null element → null
  * (zip_with pads with null, which poisons the fold). The one deliberate
  * divergence: cosine's zero denominator returns null (`try_divide`
  * semantics) instead of raising ANSI DIVIDE_BY_ZERO — a zero-norm vector
  * in a trillion-row corpus should score as "no similarity defined", not
  * kill the job. No oracle is affected (similarity oracles only ever see
  * non-degenerate vectors; a null sim also fails every `>= threshold`
  * gate).
  */
object VectorExpressions {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  private[functions] def checkVec(name: String, left: Expression,
                                  right: Expression): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Java source for element i of `arr` as a double, by element type. */
  private def getElem(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  private def readElem(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  /** `vec_dot(a, b)` — dot product in double, left-to-right. */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // length mismatch / null element
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVec("vec_dot", left, right)
    override def prettyName: String = "vec_dot"

    // hoisted: one type dispatch per expression instance, not per element
    @transient private lazy val lt = elemType(left.dataType).get
    @transient private lazy val rt = elemType(right.dataType).get

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += readElem(x, i, lt) * readElem(y, i, rt)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val bad = ctx.freshName("bad")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |else {
           |  double $s = 0.0; boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    $s += (${getElem(a, i, lt)}) * (${getElem(b, i, rt)});
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `vec_l2sq(a, b)` — squared Euclidean distance in double: the fold
    * `s += (x - y) * (x - y)`, left-to-right. The product-quantization
    * hot path (encode = argmin over centroids, ADC = lookup-table sums)
    * is entirely this kernel; the same bit-compatibility contract as
    * [[VecDot]] holds against the `aggregate(zip_with(a, b,
    * (x, y) => (x - y) * (x - y)), 0.0, _ + _)` declarative form. */
  case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVec("vec_l2sq", left, right)
    override def prettyName: String = "vec_l2sq"

    @transient private lazy val lt = elemType(left.dataType).get
    @transient private lazy val rt = elemType(right.dataType).get

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = readElem(x, i, lt) - readElem(y, i, rt)
        s += d * d
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val bad = ctx.freshName("bad")
        val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |else {
           |  double $s = 0.0; boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    double $d = (${getElem(a, i, lt)}) - (${getElem(b, i, rt)});
           |    $s += $d * $d;
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `cosine_sim(a, b)` — one fused pass accumulating a·b, a·a, b·b;
    * returns a·b / (sqrt(a·a) * sqrt(b·b)), null if the denominator is 0. */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVec("cosine_sim", left, right)
    override def prettyName: String = "cosine_sim"

    @transient private lazy val lt = elemType(left.dataType).get
    @transient private lazy val rt = elemType(right.dataType).get

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = readElem(x, i, lt); val yi = readElem(y, i, rt)
        ab += xi * yi; aa += xi * xi; bb += yi * yi
        i += 1
      }
      val denom = math.sqrt(aa) * math.sqrt(bb)
      if (denom == 0.0) null else ab / denom
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
        val bb = ctx.freshName("bb"); val bad = ctx.freshName("bad")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        val den = ctx.freshName("den")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |else {
           |  double $ab = 0.0, $aa = 0.0, $bb = 0.0; boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    double $xi = ${getElem(a, i, lt)}; double $yi = ${getElem(b, i, rt)};
           |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
           |  }
           |  double $den = Math.sqrt($aa) * Math.sqrt($bb);
           |  if ($bad || $den == 0.0) { ${ev.isNull} = true; }
           |  else { ${ev.value} = $ab / $den; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Full product-quantization encode in ONE fused kernel:
    * `pq_encode(vec)` returns the `array<int>` of per-subspace nearest
    * centroid codes. The declarative form (M × K `struct(round(l2sq(
    * slice...)), k)` + `array_min`) builds a 64-way expression tree that
    * re-slices the vector per centroid and overflows codegen budgets;
    * this expression runs the whole M×K×subDim argmin as one Java loop
    * over the codebook reference object.
    *
    * Semantics are IDENTICAL to the declarative form the oracle replays:
    * per-centroid distance folds left-to-right in double over the
    * subspace, is rounded to 6 decimals exactly like Spark's `round`
    * (BigDecimal HALF_UP), and ties break to the lower code. */
  case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float|double>, got ${dt.catalogString}")
    }
    override def prettyName: String = "pq_encode"

    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(input: Any): Any =
      VectorExpressions.pqEncodeKernel(input.asInstanceOf[ArrayData], codebook, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VectorExpressions.pqEncodeKernel($c, $cbRef, $isFloat)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Spark `round(d, 6)` semantics: BigDecimal HALF_UP — the exact rule
    * the declarative encode used, so plans swap without a hash change. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The fused encode loop ([[PqEncode]]); null on null elements or a
    * vector shorter than the codebook's flattened dimension. */
  def pqEncodeKernel(vec: ArrayData, cb: Array[Array[Array[Double]]],
                     isFloat: Boolean): ArrayData = {
    val m = cb.length
    val codes = new Array[Int](m)
    var off = 0
    var mm = 0
    while (mm < m) {
      val cents = cb(mm)
      val subDim = cents(0).length
      if (off + subDim > vec.numElements()) return null
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cents.length) {
        val cv = cents(k)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          if (vec.isNullAt(off + i)) return null
          val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
          val diff = x - cv(i)
          d += diff * diff
          i += 1
        }
        val rd = round6(d)
        if (rd < bestD) { bestD = rd; best = k }
        k += 1
      }
      codes(mm) = best
      off += subDim
      mm += 1
    }
    new GenericArrayData(codes)
  }

  // ---- Column API (no registry needed — used by the Similarity tiers) ----

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecL2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  // ---- SQL registration (spark.sql.extensions = graft.GraftExtensions) ----

  private def twoArg(name: String, f: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getCanonicalName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
        f(exprs(0), exprs(1))
      })

  val vecDotDescriptor = twoArg("vec_dot", VecDot.apply)
  val cosineSimDescriptor = twoArg("cosine_sim", CosineSim.apply)
  val vecL2SqDescriptor = twoArg("vec_l2sq", VecL2Sq.apply)
}
