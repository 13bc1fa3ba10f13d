package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("kmv: below-k groups are exact; occupancy equals distinct count") {
    val df = (1 to 10).map(i => ("small", s"k$i")) ++
      (1 to 10).map(i => ("small", s"k$i")) // duplicate rows must not inflate
    val out = Sketches.kmvDistinct(df.toDF("g", "k"), "g", "k", 64)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("kmv_n") === 10L)
    assert(out.head.getAs[Long]("kmv_est") === 10L)
  }

  test("kmv: above-k estimate lands within 4 relative standard errors") {
    val n = 5000
    val k = 128
    val df = (1 to n).map(i => ("g", s"key_$i")).toDF("g", "k")
    val est = Sketches.kmvDistinct(df, "g", "k", k)
      .collect().head.getAs[Long]("kmv_est")
    // KMV RSE ≈ 1/sqrt(k-2) ≈ 8.9% at k=128; 4 RSE ≈ 36%.
    assert(math.abs(est - n).toDouble / n < 0.36,
      s"estimate $est too far from $n")
  }

  test("kmv: estimate is invariant under repartitioning") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"key_$i")).toDF("g", "k")
    val a = Sketches.kmvDistinct(df.repartition(1), "g", "k", 32)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val b = Sketches.kmvDistinct(df.repartition(7, col("k")), "g", "k", 32)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("kmv pair overlap: identical feeds estimate full containment, " +
    "disjoint feeds estimate zero") {
    val base = (1 to 400).map(i => ("a", s"key_$i")) ++
      (1 to 400).map(i => ("b", s"key_$i")) ++ // b == a exactly
      (1 to 400).map(i => ("c", s"other_$i")) // c disjoint from both
    val out = Sketches.kmvPairOverlap(base.toDF("g", "k"), "g", "k", 64)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("common_k"), r.getAs[Long]("est_common")))).toMap
    // a==b: every union-sketch hash is in both → common_k = 64 (full).
    assert(out(("a", "b"))._1 === 64L)
    // est_common ≈ 400 within KMV noise at k=64 (RSE ~12.7%, 4σ ~51%).
    val estAb = out(("a", "b"))._2
    assert(math.abs(estAb - 400L) <= 200L, s"a∩b estimate $estAb")
    assert(out(("a", "c"))._1 === 0L && out(("a", "c"))._2 === 0L)
    assert(out(("b", "c"))._1 === 0L && out(("b", "c"))._2 === 0L)
  }

  test("kmv merge: per-part sketches re-cut to EXACTLY the whole-data " +
    "sketch (semilattice identity, not an approximation)") {
    val df = (1 to 4000).map(i => (s"g${i % 2}", s"key_$i", s"day${i % 7}"))
      .toDF("g", "k", "day")
    val direct = Sketches.kmvDistinct(df, "g", "k", 48)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // build 7 per-day sketches, drop the day, re-cut
    val daily = Sketches.kmvSketchRows(
      df.select(concat_ws("|", col("g"), col("day")).as("gd"), col("k")),
      "gd", "k", 48)
    val merged = Sketches.kmvEstimateFromSketch(
        daily.select(substring_index(col("g"), "|", 1).as("g"), col("h")), 48)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged === direct)
  }

  test("kmv property sweep: for seeded random multisets and random part " +
    "counts, merge ≡ direct and below-k groups are exact") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      n <- Gen.chooseNum(1, 800)
      dupFactor <- Gen.chooseNum(1, 4)
      parts <- Gen.chooseNum(2, 9)
      k <- Gen.oneOf(8, 32, 100)
    } yield (n, dupFactor, parts, k)
    (1 to 12).foreach { i =>
      val (n, dup, parts, k) =
        genCase.apply(Gen.Parameters.default, Seed(4242L + i)).get
      val rows = (1 to n).flatMap(v =>
        (1 to dup).map(_ => ("g", s"key_${i}_$v", s"p${v % parts}")))
      val df = rows.toDF("g", "key", "part")
      val direct = Sketches.kmvDistinct(df, "g", "key", k)
        .collect().map(r => (r.getLong(1), r.getLong(2))).head
      val partial = Sketches.kmvSketchRows(
        df.select(concat_ws("|", col("g"), col("part")).as("gp"), col("key")),
        "gp", "key", k)
      val merged = Sketches.kmvEstimateFromSketch(
          partial.select(substring_index(col("g"), "|", 1).as("g"), col("h")), k)
        .collect().map(r => (r.getLong(1), r.getLong(2))).head
      assert(merged === direct, s"case $i (n=$n dup=$dup parts=$parts k=$k)")
      if (n < k)
        assert(direct === ((n.toLong, n.toLong)),
          s"below-k must be exact: case $i (n=$n k=$k) got $direct")
    }
  }

  test("kmv pair overlap: sub-k feeds are exact end to end") {
    val rows = (1 to 20).map(i => ("x", s"k$i")) ++
      (11 to 30).map(i => ("y", s"k$i")) // overlap = k11..k20 = 10
    val out = Sketches.kmvPairOverlap(rows.toDF("g", "k"), "g", "k", 64)
      .collect()
    assert(out.length === 1)
    val r = out.head
    // union = 30 < k ⇒ the union sketch is the union itself.
    assert(r.getAs[Long]("est_union") === 30L)
    assert(r.getAs[Long]("common_k") === 10L)
    assert(r.getAs[Long]("est_common") === 10L)
  }
}
