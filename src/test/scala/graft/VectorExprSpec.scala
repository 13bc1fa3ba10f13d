package graft

import graft.functions.{Similarity, VectorExpressions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native codegen kernels (vec_dot / cosine_sim) vs the declarative
  * higher-order-function folds they replaced: the swap is only legal if it
  * is BIT-identical — the DuckDB oracles hash raw doubles. */
class VectorExprSpec extends SparkSuite {
  import spark.implicits._

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null else java.lang.Double.doubleToRawLongBits(d)

  /** Deterministic Gen sampling (same pattern as PropertiesSpec — the
    * scalatest bridge artifact is not in the offline dep set). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  test("vec_dot and cosine_sim are bit-identical to the fold forms (property)") {
    val genF = Gen.chooseNum(-1e6f, 1e6f)
    val genVec = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, genF))
    val pairs = samples(genVec.flatMap(a => genVec.map(b => (a, b))), 300)
    assert(pairs.size >= 250)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
      .toDF("id", "a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("nd"),
      Similarity.foldDot(col("a"), col("b")).as("fd"),
      Similarity.cosine(col("a"), col("b")).as("nc"),
      Similarity.foldCosine(col("a"), col("b")).as("fc"))
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    // the generator produces both matched and mismatched lengths — make
    // sure both branches (value and null) are actually exercised
    assert(rows.exists(_._1.isDefined) && rows.exists(_._1.isEmpty))
    rows.foreach { case (nd, fd, nc, fc) =>
      assert(nd.map(java.lang.Double.doubleToRawLongBits)
        == fd.map(java.lang.Double.doubleToRawLongBits))
      assert(nc.map(java.lang.Double.doubleToRawLongBits)
        == fc.map(java.lang.Double.doubleToRawLongBits))
    }
  }

  test("vec_l2sq is bit-identical to its fold form (property)") {
    val genF = Gen.chooseNum(-1e6f, 1e6f)
    val genVec = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, genF))
    val pairs = samples(genVec.flatMap(a => genVec.map(b => (a, b))), 300)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
      .toDF("id", "a", "b")
    val rows = df.select(
      Similarity.l2Sq(col("a"), col("b")).as("n"),
      Similarity.foldL2Sq(col("a"), col("b")).as("f"))
      .as[(Option[Double], Option[Double])]
      .collect()
    assert(rows.exists(_._1.isDefined) && rows.exists(_._1.isEmpty))
    rows.foreach { case (n, f) =>
      assert(n.map(java.lang.Double.doubleToRawLongBits)
        == f.map(java.lang.Double.doubleToRawLongBits))
    }
  }

  test("pq_encode kernel matches the declarative argmin form (property)") {
    val genF = Gen.chooseNum(-10f, 10f)
    val genVec = Gen.listOfN(8, genF) // 2 subspaces x 4 dims
    val vecs = samples(genVec, 200).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }.toDF("id", "v")
    val cbVals = samples(Gen.chooseNum(-10.0, 10.0), 2 * 5 * 4)
    assert(cbVals.length == 40)
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until 2).map(m => (0 until 5).map(k =>
        cbVals.slice((m * 5 + k) * 4, (m * 5 + k) * 4 + 4).toSeq))
    val rows = vecs.select(
      Similarity.pqCodes(col("v"), codebook).as("n"),
      Similarity.pqCodesDeclarative(col("v"), codebook).as("d"))
      .as[(Seq[Int], Seq[Int])].collect()
    assert(rows.length == 200)
    rows.foreach { case (n, d) => assert(n == d) }
    // identical-distance tie breaks to the lower code in both forms
    val tieCb: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0)))
    val tie = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "v")
      .select(Similarity.pqCodes(col("v"), tieCb).as("n"),
        Similarity.pqCodesDeclarative(col("v"), tieCb).as("d"))
      .as[(Seq[Int], Seq[Int])].head()
    assert(tie._1 == Seq(0) && tie._2 == Seq(0))
  }

  test("null semantics mirror the folds: length mismatch, null element, zero norm") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch
      (2L, Array(1.0f, 2.0f), Array(3.0f, 4.0f))        // clean
    ).toDF("id", "a", "b")
    val withNull = df.withColumn("an",
      when(col("id") === 2, array(lit(1.0f), lit(null).cast("float")))
        .otherwise(col("a")))
    val got = withNull.orderBy("id").select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("b")).as("c"),
      Similarity.dot(col("an"), col("b")).as("dn"))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1)) // mismatch → null
    assert(!got(1).isNullAt(0) && !got(1).isNullAt(1))
    assert(got(1).isNullAt(2)) // null element → null
    assert(got(1).getDouble(0) == 11.0)
    // zero vector → zero denominator → null cosine (Divide-on-zero parity)
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val zr = z.select(Similarity.cosine(col("a"), col("b")).as("c"),
      Similarity.foldCosine(col("a"), col("b")).as("f")).collect()(0)
    assert(zr.isNullAt(0) && zr.isNullAt(1))
  }

  test("mixed element types: float corpus vs double literal centroid") {
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v")
    val c = df.select(
      Similarity.cosine(col("v"), array(lit(3.0), lit(4.0))).as("c"),
      Similarity.dot(col("v"), array(lit(0.5), lit(0.25))).as("d"))
      .as[(Double, Double)].head()
    assert(math.abs(c._1 - 1.0) < 1e-12)
    assert(c._2 == 3.0 * 0.5 + 4.0 * 0.25)
  }

  test("SQL names resolve after GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS c,
        |       vec_dot(array(1.0F, 2.0F), array(3.0F, 5.0F)) AS d
        |""".stripMargin).as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && r._2 == 13.0)
    // arity errors are surfaced, not swallowed
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0F))").collect())
    // the minhash kernel resolves too, equal to the Column API form
    val sqlSig = spark.sql(
      "SELECT minhash_sig(array('a b', 'b c'), 4) AS s").as[Seq[Long]].head()
    val colSig = Seq(Seq("a b", "b c")).toDF("sh")
      .select(graft.functions.MinhashSigExpression.minhashSig(col("sh"), 4))
      .as[Seq[Long]].head()
    assert(sqlSig == colSig && sqlSig.length == 4)
    // the numHashes argument must be a literal
    intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), length('xx'))").collect())
  }

  test("interpreted eval agrees with codegen (constant folding path)") {
    // Literal-only input is constant-folded through eval(); compare with
    // the same computation over a column (codegen path).
    GraftExtensions.register(spark)
    val lit = spark.sql(
      "SELECT vec_dot(array(1.5D, -2.0D), array(4.0D, 0.5D)) AS d")
      .as[Double].head()
    val codegen = Seq((Array(1.5, -2.0), Array(4.0, 0.5))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).as[Double].head()
    assert(bits(lit) == bits(codegen))
  }

  test("ANN rerank scores carry no higher-order functions in the plan") {
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(200)
    val q = e.limit(4)
    val plan = Similarity.bruteForceTopK(q, e, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("aggregate(") && !plan.contains("zip_with("),
      s"fold-form HOFs still in the hot path:\n$plan")
    assert(plan.contains("vec_dot"), s"native kernel missing:\n$plan")
  }
}
