package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text / link extraction — the first step of every web-corpus
  * pipeline (crawl WARC → visible text + outlink graph; the outlinks feed
  * [[graft.operators.PageRank]], the text feeds the quality/dedup chain).
  *
  * Pure column algebra over codegen'd string/regex expressions: a narrow
  * map with no shuffle, no UDF — 100 TB of crawl HTML streams through at
  * scan speed. Regexes are deliberately RE2-safe (non-greedy, no
  * backreferences, no lookaround) so an external SQL oracle replays them
  * exactly; `\s` is avoided in favor of an explicit class because Java and
  * RE2 disagree on vertical tab.
  *
  * This is the tag-level extractor; corpus-frequency boilerplate (nav
  * bars, cookie banners shared across pages) is the downstream
  * [[Boilerplate]] pass.
  */
object Html {

  private val ws = "[ \\t\\n\\r]"

  /** Visible text of an HTML fragment: script/style/comment blocks drop
    * wholesale, block-level closers become newlines (so words from
    * adjacent paragraphs don't fuse), remaining tags strip, the five
    * core entities decode (`&amp;` last, by entity-encoding algebra),
    * and whitespace collapses to single spaces. */
  def visibleText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // Block-level boundaries → newline BEFORE generic tag strip, so
    // "<p>a</p><p>b</p>" yields "a b", never "ab".
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, s"$ws+", " "))
  }

  /** All href targets of `<a>` tags, in document order (the outlink list;
    * `explode` it against the doc id for the crawl edge list). Matches
    * double- AND single-quoted hrefs: single-quoted forms are first
    * normalized to double-quoted (RE2-safe — one extraction pass keeps
    * document order, which two per-quote-style extractions would lose).
    * A single-quoted href whose target itself contains `"` mis-nests
    * after normalization and is dropped — malformed by HTML rules anyway.
    * Unquoted hrefs are vanishingly rare in real crawls and
    * regex-ambiguous, so they are documented as out of scope. */
  def hrefs(html: Column): Column = {
    val normalized =
      regexp_replace(html, "(?i)href='([^']*)'", "href=\"$1\"")
    val one = "(?i)<a[^>]*href=\"([^\"]*)\"[^>]*>"
    // regexp_extract_all with group 1 → array of targets
    regexp_extract_all(normalized, lit(one), lit(1))
  }

  /** (href, anchor-text) pairs of `<a>…</a>` tags in document order —
    * the link-context signal (anchor text is the web's human label for
    * the TARGET page; aggregated per target it feeds retrieval and
    * quality models the way [[hrefs]] feeds the link graph). Same
    * quote normalization as [[hrefs]]; anchor text is tag-stripped and
    * whitespace-collapsed. Two aligned single-pass extractions of the
    * SAME pattern zip positionally, so href i always pairs with its own
    * anchor. */
  def anchors(html: Column): Column = {
    val normalized =
      regexp_replace(html, "(?i)href='([^']*)'", "href=\"$1\"")
    val pat = "(?is)<a[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    zip_with(
      regexp_extract_all(normalized, lit(pat), lit(1)),
      regexp_extract_all(normalized, lit(pat), lit(2)),
      (h, t) => struct(h.as("href"),
        trim(regexp_replace(regexp_replace(t, "<[^>]*>", " "),
          s"$ws+", " ")).as("anchor")))
  }

  /** Title tag content (empty string when absent). */
  def title(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1), s"$ws+", " "))
}
