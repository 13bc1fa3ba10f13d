package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: derives an sf1-equivalent dataset (10× sf0.1)
  * for EMPIRICAL scaling measurement (VERDICT r9 #1) — the testdata
  * tree is read-only, so the derived tables land under the repo
  * (`scaledata/`, gitignored).
  *
  * Each fact table is replicated `copies` times with every entity key
  * offset by `copy · 10,000,000`, so join relationships, per-key
  * cardinalities, and residue-class structure (doc_id parity/mod-10
  * samples) are preserved within each copy while copies stay disjoint —
  * the same shape a 10×-bigger day of the same workload would have.
  * Dimension tables (region, nation) are NOT scaled, exactly like
  * TPC-H. Two deliberate per-copy perturbations keep derived WORK
  * distributions honest instead of degenerate:
  *
  *  - `documents.text` is rotated through copy-specific vowel (5
  *    rotations) and consonant (×2) translate maps — without this,
  *    every doc would have 9 verbatim clones and the near-dup tier
  *    would measure an artificial 45-pairs-per-doc clique explosion,
  *    not 10× the real workload. Lengths, whitespace, and token
  *    boundaries are preserved, so text-statistics queries see the
  *    same distributions. (Copies c and c+5 share a vowel rotation
  *    and differ in the consonant map, so all 10 mutations are
  *    pairwise distinct.)
  *  - `customer.c_acctbal` gains `copy` cents so integer-cents
  *    blocking keys (entity resolution) stay copy-local instead of
  *    forming 10×-deep identical-record blocks.
  *  - `embeddings.embedding` is circularly rotated by 7·copy
  *    dimensions per copy — verbatim vector clones would pile into
  *    the same SRP/IVF buckets at cosine ≈ 1 (the same clique
  *    artifact); a rotation preserves norms and per-dimension value
  *    distributions exactly while decorrelating copies.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [copies]
  */
object ScaleUp {

  private val Off = 10000000L // > every key range; even; multiple of 10

  private def vowelMap(c: Int): (String, String) = {
    val v = "aeiou"
    val rot = v.drop(c % 5) + v.take(c % 5)
    (v + v.toUpperCase, rot + rot.toUpperCase)
  }
  private def consMap(c: Int): (String, String) =
    if (c < 5) ("", "") else ("bcdfgBCDFG", "cdfgbCDFGB")

  /** text mutated per copy: identity for copy 0, a distinct
    * length-preserving character permutation for each other copy. */
  private def mutateText(text: org.apache.spark.sql.Column,
                         copy: org.apache.spark.sql.Column) = {
    val arms = (1 until 10).map { c =>
      val (vf, vt) = vowelMap(c)
      val (cf, ct) = consMap(c)
      (c, translate(translate(text, vf, vt), cf, ct))
    }
    arms.foldLeft(when(copy === 0, text)) { case (acc, (c, e)) =>
      acc.when(copy === c, e)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/scaledata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // The text-mutation when-chain has exactly 10 arms and has no
    // .otherwise, so copies > 10 would silently write NULL text; fail
    // loudly instead of corrupting a scaling measurement.
    require(copies >= 1 && copies <= 10,
      s"copies must be in [1, 10] (got $copies): only 10 distinct " +
        "text/embedding mutations are defined")
    val spark = SparkSession.builder()
      .master(s"local[${Launch.cpus}]")
      .config("spark.sql.shuffle.partitions", Launch.cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cp = broadcast(spark.range(copies).select(col("id").as("__c")))
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
    def off(c: String) = (col(c) + col("__c") * Off).as(c)

    // Dimensions: copied through unscaled.
    write(load("region"), "region", 1)
    write(load("nation"), "nation", 1)

    write(load("customer").crossJoin(cp).select(
      off("c_custkey"), col("c_name"), col("c_nationkey"),
      (col("c_acctbal") + col("__c") * 0.01d).as("c_acctbal"),
      col("c_mktsegment")), "customer", 8)

    write(load("supplier").crossJoin(cp).select(
      off("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier", 2)

    write(load("part").crossJoin(cp).select(
      off("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), "part", 8)

    write(load("orders").crossJoin(cp).select(
      off("o_orderkey"), off("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders", 16)

    write(load("lineitem").crossJoin(cp).select(
      off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem", 32)

    write(load("events").crossJoin(cp).select(
      off("event_id"), col("ts"), off("user_id"), col("event_type"),
      col("value"), col("props")), "events", 32)

    write(load("documents").crossJoin(cp).select(
      off("doc_id"), mutateText(col("text"), col("__c")).as("text"),
      col("lang"), col("source"), col("n_chars")), "documents", 16)

    // Per-copy circular dimension rotation (by 7·copy positions):
    // verbatim vector copies would collide into the same SRP/IVF
    // buckets and register cosine ≈ 1 to their 9 clones — the same
    // 45-pairs-per-original clique artifact the text mutation exists
    // to prevent, now for the embedding tier. A rotation preserves
    // norms and the per-dimension value distribution exactly while
    // decorrelating copies (random-ish vectors rotate to near-
    // orthogonal positions); copy 0 stays verbatim.
    val rotArms = (1 until copies).map { c =>
      val sh = (7 * c) % 64
      (c, concat(slice(col("embedding"), sh + 1, 64 - sh),
        slice(col("embedding"), 1, sh)))
    }
    val rotated = rotArms.foldLeft(when(col("__c") === 0, col("embedding"))) {
      case (acc, (c, e)) => acc.when(col("__c") === c, e)
    }
    write(load("embeddings").crossJoin(cp).select(
      off("vec_id"), rotated.as("embedding"), col("label")), "embeddings", 8)

    println(s"[scaleup] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
