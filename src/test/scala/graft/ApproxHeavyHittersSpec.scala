package graft

import graft.functions.{ApproxHeavyHitters, Relevance, TextFunctions}
import org.apache.spark.sql.functions._

/** Misra-Gries guarantees, not values: the summary depends on the
  * partitioning, so the tests assert exactly what the sketch promises —
  * no false dismissal of true heavy hitters, bounded under-counts,
  * exactness when capacity covers the vocabulary, and a partial-merge
  * plan shape. */
class ApproxHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def skewed(parts: Int) = {
    // n = 10_000: "hot" x3000, "warm" x1500, 5500 distinct tail tokens
    val rows = Seq.fill(3000)("hot") ++ Seq.fill(1500)("warm") ++
      (1 to 5500).map(i => s"tail_$i")
    rows.toDF("token").repartition(parts, col("token"))
  }

  test("true heavy hitters survive with bounded under-count, any partitioning") {
    val n = 10000L
    for (parts <- Seq(1, 7, 32)) {
      val out = skewed(parts)
        .agg(ApproxHeavyHitters.misraGries(col("token"), 16).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.est")).as[(String, Long)]
        .collect().toMap
      val bound = n / 17 + 1 // n/(capacity+1), both halves' errors add below it
      // hot (3000 > bound) and warm (1500 > bound) MUST be present
      for ((item, truth) <- Seq("hot" -> 3000L, "warm" -> 1500L)) {
        assert(out.contains(item), s"$item dismissed at parts=$parts: $out")
        assert(out(item) <= truth, s"$item over-counted: ${out(item)}")
        assert(out(item) >= truth - bound,
          s"$item under-counted past the bound at parts=$parts: ${out(item)}")
      }
      assert(out.size <= 16, s"capacity exceeded: ${out.size}")
      // every estimate is a valid under-count of SOME true frequency
      out.foreach { case (item, est) =>
        val truth = item match {
          case "hot" => 3000L; case "warm" => 1500L; case _ => 1L
        }
        assert(est <= truth, s"$item est=$est > truth=$truth")
      }
    }
  }

  test("capacity >= vocabulary makes the sketch exact (== q44's exact counts)") {
    val d = Tables.documents(spark, sf("sf0.001"))
    val approx = ApproxHeavyHitters.approxTopTokens(d, "text", k = 15, capacity = 4096)
      .as[(String, Long)].collect().toSeq
    val exact = Relevance.heavyHitters(d, "text", "doc_id", k = 15)
      .select(col("term"), col("cnt")).as[(String, Long)].collect().toSeq
    assert(approx == exact,
      s"exact-regime mismatch:\napprox=$approx\nexact=$exact")
  }

  test("plan shape: ObjectHashAggregate with a partial stage before the exchange") {
    val d = Tables.documents(spark, sf("sf0.001"))
    val plan = d.select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .agg(ApproxHeavyHitters.misraGries(col("t"), 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"not object-hash:\n$plan")
    assert(plan.contains("partial_approx_heavy_hitters"),
      s"no partial (map-side) aggregation stage:\n$plan")
  }

  test("serialize/deserialize round-trips the buffer") {
    val mg = graft.functions.MisraGries(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("x")), 8)
    val buf = mg.createAggregationBuffer()
    Seq("a", "a", "b", "c").foreach { s =>
      buf.update(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        buf.getOrElse(org.apache.spark.unsafe.types.UTF8String.fromString(s), 0L) + 1)
    }
    val back = mg.deserialize(mg.serialize(buf))
    assert(back == buf)
  }
}
