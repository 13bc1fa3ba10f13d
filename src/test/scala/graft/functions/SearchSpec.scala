package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick silver is not brown"),
    (3L, "a fox ran quickly home"),
    (4L, "nothing relevant here")).toDF("doc_id", "text")

  test("trigram search: candidates bound matches exactly; verification " +
    "removes index false positives") {
    val out = Search.trigramSearch(spark, corpus, "text", "doc_id",
        Seq("quick brown", "fox"), selectK = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_matches")))).toMap
    // "quick brown" appears only in doc 1; docs 2/3 share some of its
    // trigrams but cannot pass the all-rarest-trigrams filter AND the
    // contains check together.
    val (c1, m1) = out("quick brown")
    assert(m1 === 1L)
    assert(c1 >= m1, "candidates must be a superset of matches")
    // "fox" (one trigram) matches docs 1 and 3.
    assert(out("fox") === ((2L, 2L)))
  }

  test("trigram search: a pattern with an unindexed trigram matches " +
    "nothing and produces zero candidates") {
    val out = Search.trigramSearch(spark, corpus, "text", "doc_id",
        Seq("zzzyyy"), selectK = 3)
      .collect().head
    assert(out.getAs[Long]("n_candidates") === 0L)
    assert(out.getAs[Long]("n_matches") === 0L)
  }

  test("trigram search: index probe can admit a false positive that " +
    "verification rejects (scrambled trigrams)") {
    // Pattern "abcXabc" has trigram set {abc, bcx, cxa, xab}; the string
    // "xabcxa" carries all four without containing the pattern.
    val df = Seq((1L, "abcXabc here"), (2L, "see xabcxa here"))
      .toDF("doc_id", "text")
    val out = Search.trigramSearch(spark, df, "text", "doc_id",
        Seq("abcXabc"), selectK = 5)
      .collect().head
    assert(out.getAs[Long]("n_matches") === 1L, "only doc 1 truly matches")
    assert(out.getAs[Long]("n_candidates") >= 2L,
      "doc 2 carries every selected trigram and must appear as a candidate")
  }

  test("charTrigrams: short and null texts produce empty arrays") {
    val df = Seq((1L, "ab"), (2L, "abc")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        Search.charTrigrams(col("text")).as("tg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L) === Seq("abc"))
  }
}
