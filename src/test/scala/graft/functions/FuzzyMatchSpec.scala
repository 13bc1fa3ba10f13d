package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FuzzyMatchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "The quick brown fox jumped over the lazy dog"),  // 2 edits from 1
    (3L, "A completely different sentence about databases"),
    (4L, "the QUICK brown fox jumps over the lazy dog!!!"), // normalizes == 1
    (5L, "xy")).toDF("doc_id", "text")                      // shorter than q → no grams

  test("near-identical pairs found, unrelated pairs absent, case/punct normalized") {
    val got = FuzzyMatch.qgramPairs(docs, "text", "doc_id")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val dist = got.map(p => (p._1, p._2) -> p._3).toMap
    assert(dist((1L, 4L)) == 0) // identical after lowercase + punct strip
    assert(dist((1L, 2L)) > 0 && dist((1L, 2L)) <= 8)
  }

  test("strings shorter than q generate no candidates (documented contract)") {
    val got = FuzzyMatch.qgramPairs(docs, "text", "doc_id")
      .filter(col("id_a") === 5 || col("id_b") === 5).count()
    assert(got == 0)
  }

  test("gram frequency cap drops saturated grams (the skew valve)") {
    // 60 strings all sharing the prefix "aaaa...", pairwise dist 0 on the
    // prefix; with the cap below the corpus size every gram is saturated
    // → zero candidates; uncapped → all pairs.
    val many = (1L to 60L).map(i => (i, "aaaaaaaaaa")).toDF("doc_id", "text")
    val capped = FuzzyMatch.qgramPairs(many, "text", "doc_id",
      maxGramFreq = Some(50L)).count()
    val uncapped = FuzzyMatch.qgramPairs(many, "text", "doc_id",
      maxGramFreq = None).count()
    assert(capped == 0)
    assert(uncapped == 60L * 59 / 2)
  }

  test("maxDist bound is respected") {
    val far = Seq((1L, "abcdefghijklmnop"), (2L, "abc is a shared gram but rest differs wildly"))
      .toDF("doc_id", "text")
    val got = FuzzyMatch.qgramPairs(far, "text", "doc_id", maxDist = 3)
    assert(got.count() == 0)
  }
}
