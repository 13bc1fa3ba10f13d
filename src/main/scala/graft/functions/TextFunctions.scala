package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All are pure column expressions (codegen-friendly or JVM higher-order
  * functions — never Python/Scala UDFs), so they distribute trivially and
  * stay inside Catalyst: at 100 TB these run as a single narrow map stage
  * over the corpus with full predicate/column pushdown intact.
  */
object TextFunctions {

  /** Whitespace tokenization after lower-casing. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword count: letter runs, single digits, and single
    * punctuation marks each count as one token — a cheap, deterministic
    * stand-in for a real BPE vocab that tracks its token-count shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Small fixed stopword lists per language — enough signal for a
    * deterministic n-gram/stopword language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "ist"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men")
  )

  /** Ratio of tokens found in `words` (as a fraction of all tokens). */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(array_intersect(toks, array(words.map(lit): _*)))
    hits.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic language ID: argmax of distinct-stopword hits per language,
    * deterministic tie-break by language code order. */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang) is lexicographic: highest score wins,
    // then highest lang code — fixed, engine-reproducible tie-break.
    array_max(array(scored: _*)).getField("lang")
  }

  /** Punctuation character ratio (per character). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs, low
    * punctuation, presence of any known stopwords. Deterministic per-row
    * double arithmetic (no aggregation → no FP order sensitivity). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthScore = least(n / lit(64.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val anyStop = stopwords.values.flatten.toSeq.distinct
    val stopScore = least(stopwordRatio(text, anyStop) * lit(4.0), lit(1.0))
    round(lengthScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3), 6)
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1 shape):
    * hard per-document rules instead of q19's soft score, each failure
    * named so downstream can audit WHY a document was dropped. All
    * signals are per-row integer counts or single divisions of exact
    * integers — no aggregation, so the doubles are engine-reproducible
    * bit-for-bit and every rule decision replays identically in an
    * external SQL oracle. One narrow map over the corpus at any scale.
    *
    * Returns a struct: n_words, mean_wl, distinct_ratio, stop_hits,
    * passed, reasons (comma-joined failed-rule names, '' when passed). */
  def gopherRules(text: Column,
                  minWords: Int = 30, maxWords: Int = 90,
                  minWordLen: Double = 4.0, maxWordLen: Double = 5.1,
                  minDistinctRatio: Double = 0.35,
                  minStopHits: Int = 1): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val meanWl = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / greatest(n, lit(1)).cast("double")
    val distinctRatio =
      size(array_distinct(toks)).cast("double") / greatest(n, lit(1)).cast("double")
    val stopHits = size(array_intersect(array_distinct(toks),
      array(stopwords("en").map(lit): _*)))
    val fails: Seq[(Column, String)] = Seq(
      (n < minWords)                                   -> "too_short",
      (n > maxWords)                                   -> "too_long",
      ((meanWl < minWordLen) || (meanWl > maxWordLen)) -> "word_len",
      (distinctRatio < minDistinctRatio)               -> "repetition",
      (stopHits < minStopHits)                         -> "no_stopwords")
    struct(
      n.as("n_words"),
      round(meanWl, 6).as("mean_wl"),
      round(distinctRatio, 6).as("distinct_ratio"),
      stopHits.as("stop_hits"),
      (!fails.map(_._1).reduce(_ || _)).as("passed"),
      concat_ws(",", fails.map { case (c, name) => when(c, lit(name)) }: _*)
        .as("reasons"))
  }

  /** PII redaction: emails, North-American-style phone numbers, and IPv4
    * addresses replaced with type tags — the pre-training scrub pass.
    * Plain regexp_replace chain (codegen'd, reproducible in SQL engines;
    * patterns deliberately RE2-compatible: no backrefs or lookaround). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val phone = regexp_replace(email,
      "\\+?[0-9]{0,2}[-. (]*[0-9]{3}[-. )]*[0-9]{3}[-. ]*[0-9]{4}", "[PHONE]")
    regexp_replace(phone,
      "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "[IP]")
  }

  /** Canonical-form fingerprint: md5 of lower-cased, whitespace-collapsed
    * text — the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** 60-bit integer from the first 15 hex chars of md5 — the *portable*
    * hash: any SQL engine with md5 + hex parsing reproduces it exactly,
    * so operators built on it can be value-checked against an external
    * oracle. The production default elsewhere stays xxhash64 (one fused
    * codegen'd op, no hex round-trip) — use this variant when
    * cross-engine reproducibility matters more than raw hash throughput. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Second independent 60-bit value from the same md5 (hex chars 16-30). */
  def md5LongHi(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")

  /** 64-bit SimHash signatures for a whole table: explode tokens → hash →
    * 64 per-bit ±1 vote sums as a hash aggregate → combine sign bits.
    *
    * Preferred over the Column-level [[simhash64]]: the 64 small `sum`
    * aggregates whole-stage-codegen and partially aggregate map-side
    * (explode is narrow, so each doc's tokens collapse to one 64-long row
    * before the shuffle — the shuffle carries #docs rows, not #tokens).
    * The fold-expression variant builds a ~1000-node interpreted tree that
    * costs seconds of planning per query. */
  def simhashSignatures(df: org.apache.spark.sql.DataFrame, textCol: String,
                        idCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(idCol), explode_outer(tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"b$i"))
    tok.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** 64-bit SimHash over whitespace tokens: each token's xxhash64 votes
    * ±1 per bit position; the sign of each bit's vote total forms the
    * signature. Pure higher-order-function fold — distributes as a map,
    * but plans as a large interpreted tree: prefer [[simhashSignatures]]
    * for whole-table scoring. */
  def simhash64(text: Column): Column = {
    val toks = tokens(text)
    val votes = aggregate(
      toks,
      array((0 until 64).map(_ => lit(0L)): _*),
      (acc, t) => {
        val h = xxhash64(t)
        array((0 until 64).map(i =>
          acc.getItem(i) +
            when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*)
      })
    (0 until 64).map(i =>
      when(votes.getItem(i) > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two simhash64 signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Portable 64-bit SimHash signatures as a 16-char hex string.
    *
    * Same explode → vote → sign shape as [[simhashSignatures]], but the
    * per-token bits come from md5 (bits 0-59 from hex chars 1-15, bits
    * 60-63 from chars 16-30) instead of xxhash64, and the signature is
    * emitted as four 16-bit chunks formatted `%04x` — both choices so an
    * external SQL oracle can rebuild the value exactly (a BIGINT signature
    * would need a `1<<63` the oracle engine rejects as overflow).
    *
    * NULL-text documents are dropped (plain explode), matching SQL
    * `unnest` semantics — `explode_outer` would emit an all-minus-one-vote
    * signature row the oracle engine cannot produce. */
  def simhashSignaturesHex(df: org.apache.spark.sql.DataFrame, textCol: String,
                           idCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h1", md5Long(col("tok")))
      .withColumn("h2", md5LongHi(col("tok")))
    def bit(i: Int): Column =
      if (i < 60) shiftright(col("h1"), i).bitwiseAND(1)
      else shiftright(col("h2"), i - 60).bitwiseAND(1)
    val votes = (0 until 64).map(i =>
      sum(when(bit(i) === 1, 1L).otherwise(-1L)).as(s"b$i"))
    def chunk(c: Int): Column =
      (0 until 16).map(i =>
        when(col(s"b${c * 16 + i}") > 0, lit(1L << i)).otherwise(0L))
        .reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        format_string("%04x%04x%04x%04x",
          chunk(3), chunk(2), chunk(1), chunk(0)).as("sig"))
  }

  /** Code-vs-prose detection signals — the "is this document source code"
    * routing decision a mixed web corpus needs before language ID,
    * quality rules, or tokenizer choice (code tokenizes ~2× worse under a
    * prose BPE and fails prose quality gates for the wrong reasons).
    *
    * Pure column algebra, one narrow projection per doc:
    *  - symbol_frac: density of code punctuation {}();=<>[] — ONE
    *    `translate` strip, no per-char regex;
    *  - indent_frac: fraction of lines opening with two spaces or a tab
    *    (layout is the strongest single code signal);
    *  - kw_hits: how many of eight language-agnostic keyword/operator
    *    markers appear at least once.
    *
    * The composite score uses dyadic weights (4, 2, 0.25) so the double
    * arithmetic replays bit-identically in an external engine; fractions
    * round(…, 6) first. Returns a struct
    * (symbol_frac, indent_frac, kw_hits, code_score, is_code). */
  def codeStats(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    val symbolFrac =
      round((length(text) - length(translate(text, "{}();=<>[]", "")))
        .cast("double") / n, 6)
    val lines = split(text, "\n", -1)
    val indented = filter(lines, l =>
      substring(l, 1, 2) === "  " || substring(l, 1, 1) === "\t")
    val indentFrac =
      round(size(indented).cast("double") /
        greatest(size(lines), lit(1)).cast("double"), 6)
    val markers = Seq("def ", "return", "import ", "#include", "function",
      "void ", "==", "&&")
    val kwHits = markers.map(m =>
      when(text.contains(m), 1).otherwise(0)).reduce(_ + _)
    val score = round(symbolFrac * 4.0d + indentFrac * 2.0d +
      least(kwHits, lit(4)).cast("double") * 0.25d, 6)
    struct(symbolFrac.as("symbol_frac"), indentFrac.as("indent_frac"),
      kwHits.cast("int").as("kw_hits"), score.as("code_score"),
      (score >= 0.8d).as("is_code"))
  }
}
