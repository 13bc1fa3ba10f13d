package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trigram-index substring search — the pg_trgm-shape acceleration for
  * `LIKE '%pattern%'` over a corpus: a LIKE scan reads every document
  * for every query; the trigram inverted index answers "which documents
  * COULD contain this pattern" from posting rows alone, and the exact
  * `contains` check runs only on that candidate set.
  *
  * Exactness: a document containing the pattern necessarily contains
  * every pattern trigram, so candidates ⊇ matches for ANY trigram
  * subset — selecting only the RAREST trigrams (by indexed document
  * frequency) keeps the guarantee while shrinking the posting traffic;
  * stopword-like trigrams ('e t', 'th ') would otherwise drag in most
  * of the corpus (the q15/q35 frequency-valve principle applied to
  * retrieval). The verify step restores precision exactly.
  *
  * Scale shape: the index is (trigram, doc) posting rows — built in one
  * explode + distinct pass, partially aggregated; a query touches only
  * the posting lists of its selected trigrams (equi-join), groups by
  * (pattern, doc) with a count-≥-required filter, and joins back to the
  * candidate documents alone for the contains check. Document text
  * never shuffles for the index probe.
  */
object Search {

  /** Character trigrams of an ALREADY-LOWERED column reference. The
    * generator references the string O(len) times (one substr per
    * position) — lowering inside the lambda would re-run lower() per
    * position, O(len²) per row (the q127 tokenize lesson), so hot
    * paths pre-project the lowered text into an attribute first. */
  private def rawTrigrams(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_distinct(when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>")))

  /** Lower-cased character trigrams (positions overlap; duplicates
    * removed — postings are set-membership). Column-level convenience;
    * [[trigramPostings]] is the table-scale builder. */
  def charTrigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    rawTrigrams(lower(text))

  /** Posting rows (tri, doc_id), distinct. Lowers each text ONCE into
    * an attribute before the per-position generator runs over it; the
    * per-row array_distinct already makes (doc, tri) unique, so no
    * shuffle-wide distinct is needed. */
  def trigramPostings(df: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))
      .select(col("doc_id"), explode(rawTrigrams(col("t"))).as("tri"))

  /** Search `patterns` (literal substrings) against the corpus through
    * the trigram index: per pattern, the `selectK`-rarest-trigram
    * candidate set and the exact match count.
    *
    * Output: (pattern, n_candidates, n_matches) — n_candidates counts
    * docs passing the index probe (superset of matches), n_matches the
    * exact contains verification. Patterns shorter than 3 chars are
    * rejected (no trigram can bound them). */
  def trigramSearch(spark: SparkSession, df: DataFrame, textCol: String,
                    idCol: String, patterns: Seq[String],
                    selectK: Int = 3): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.length >= 3),
      "each pattern needs >= 3 chars")
    import spark.implicits._
    // Materialize postings once: both the df table and the candidate
    // join consume them, and re-running the per-position generator is
    // the expensive part (the triangle-census checkpoint discipline).
    val postings = trigramPostings(df, textCol, idCol).localCheckpoint()
    val dfreq = postings.groupBy(col("tri")).agg(count(lit(1)).as("df"))
    val patTri = patterns.flatMap { p =>
      p.toLowerCase.sliding(3).toSeq.distinct.map(t => (p, t))
    }.toDF("pattern", "tri")
    // Rarest-k selection: trigrams absent from the index have df 0 —
    // they bound the candidate set to EMPTY, which is correct (a
    // pattern with an unindexed trigram matches nothing).
    val ranked = patTri
      .join(dfreq, Seq("tri"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(Window.partitionBy(col("pattern"))
        .orderBy(col("df").asc, col("tri").asc)))
      .filter(col("rk") <= selectK)
    val required = ranked.groupBy(col("pattern"))
      .agg(count(lit(1)).as("req"),
        min(col("df")).as("min_df")) // min_df = 0 ⇒ no candidates possible
    val cand = ranked.join(postings, "tri")
      .groupBy(col("pattern"), col("doc_id"))
      .agg(count(lit(1)).as("hit"))
      .join(required, "pattern")
      .filter(col("hit") === col("req"))
      .select(col("pattern"), col("doc_id"))
    val verified = cand
      .join(df.select(col(idCol).as("doc_id"), col(textCol).as("t")),
        "doc_id")
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(contains(lower(col("t")),
          lower(col("pattern"))), 1L).otherwise(0L)).as("n_matches"))
    // Left join back so zero-candidate patterns still report a row.
    patterns.toDF("pattern")
      .join(verified, Seq("pattern"), "left")
      .select(col("pattern"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }
}
