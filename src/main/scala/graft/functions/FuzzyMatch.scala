package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching at corpus scale — record-linkage /
  * near-identical-title dedup (Gravano et al., "Approximate String Joins
  * in a Database", VLDB'01: q-gram filtering). The all-pairs Levenshtein
  * join is O(n²·m²); the standard scale shape is:
  *
  *   1. normalize to a bounded key (lowercased alnum prefix);
  *   2. explode positional-free character q-grams — two strings within
  *      edit distance k share at least one q-gram once they are longer
  *      than q·(k+1), and near-identical strings share most of them;
  *   3. drop stopword-like grams above a frequency cap (the same skew
  *      valve as [[DedupFunctions]]' shingle cap — a gram in half the
  *      corpus generates O(n²) candidates and selects nothing);
  *   4. same-gram equi-join → distinct candidate pairs → exact
  *      `levenshtein` verify on the bounded prefixes only.
  *
  * Every shuffle key is a q-gram or an id pair; the unbounded document
  * text never moves — only the ≤ `prefixLen`-char normalized key rides
  * along with the candidates. Levenshtein cost is capped at
  * prefixLen² per surviving candidate.
  */
object FuzzyMatch {

  /** Distinct `(id_a, id_b, dist)` pairs with
    * `levenshtein(prefix_a, prefix_b) <= maxDist`, candidates generated
    * by shared character q-grams of the normalized prefix.
    *
    * Strings whose normalized prefix is shorter than `q` generate no
    * grams and therefore no candidates (documented contract: fuzzy
    * matching needs at least one q-gram of signal).
    */
  def qgramPairs(df: DataFrame, textCol: String, idCol: String,
                 q: Int = 3, prefixLen: Int = 40, maxDist: Int = 8,
                 maxGramFreq: Option[Long] = Some(50L)): DataFrame = {
    val pref = df.select(
        col(idCol).cast("long").as("id"),
        substring(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), 1, prefixLen)
          .as("pref"))
      .filter(length(col("pref")) >= q)
    val grams = pref.select(col("id"), col("pref"),
      explode(transform(
        sequence(lit(1), length(col("pref")) - (q - 1)),
        i => col("pref").substr(i, lit(q)))).as("g"))
      .distinct() // a gram repeated inside one string is one unit of signal
    val capped = maxGramFreq match {
      case Some(cap) =>
        // Frequency valve: grams above the cap join n_g² candidate pairs
        // but discriminate nothing — drop them before the join.
        val keep = grams.groupBy("g").agg(count(lit(1)).as("f"))
          .filter(col("f") <= cap).select("g")
        grams.join(keep, "g")
      case None => grams
    }
    val a = capped.select(col("g"), col("id").as("id_a"), col("pref").as("pref_a"))
    val b = capped.select(col("g"), col("id").as("id_b"), col("pref").as("pref_b"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pref_a", "pref_b").distinct()
      .withColumn("dist", levenshtein(col("pref_a"), col("pref_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
