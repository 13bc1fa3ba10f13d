package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the web-corpus
  * identity keys. Crawls see the same page under scheme/case/port/
  * tracking-param/fragment variants; canonical-URL equality is the
  * cheapest dedup tier (before any content hash), and the registered
  * domain is the unit of quality scoring, quota capping
  * ([[Mixture.capPerGroup]]) and the PageRank node id.
  *
  * Pure column algebra (codegen'd regex/string/array expressions): a
  * narrow map, no UDF, no shuffle — and RE2-safe regexes so an external
  * SQL oracle replays every step exactly.
  */
object Url {

  /** Canonical form:
    *  - scheme and host lowercase; a leading `www.` drops;
    *  - explicit default ports (`:80` http, `:443` https) drop;
    *  - the `#fragment` drops (client-side only);
    *  - tracking params (`utm_*`, `fbclid`, `gclid`, `ref`, `mc_cid`,
    *    `mc_eid`) drop — surviving params keep their original ORDER
    *    (param order can be semantic; sorting would over-merge);
    *  - an emptied query drops its `?`; a bare trailing `/` path drops.
    * Non-http(s) input passes through with lowercased scheme only;
    * scheme-LESS input (relative paths, bare hosts) passes through RAW
    * (conservative: never merge what we can't parse — mapping every
    * unparseable URL to one sentinel would do the opposite, collapsing
    * them all into a single dedup key). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val isHttp = scheme === "http" || scheme === "https"
    // authority = host[:port]; userinfo is not emitted by crawlers we
    // model and is left to pass through the non-http branch.
    val host0 = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") && !(scheme === "https" && port === "443")
    val path0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "/", "").otherwise(path0)
    val query = regexp_extract(url, "^[^?#]*\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref|mc_cid|mc_eid)=") && p =!= "")
    val q = array_join(kept, "&")
    val rebuilt = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
    when(isHttp, rebuilt)
      .when(scheme === "", url) // schemeless: keep raw, never merge
      .otherwise(
        concat(scheme, regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*(:.*)$", 1)))
  }

  /** Host of an (http(s)) URL, lowercased, `www.`-stripped. */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)),
      "^www\\.", "")

  /** Public-suffix second-level TLDs where the registrable unit is three
    * labels (kept to the common crawl-relevant set; the full PSL is a
    * config concern, not an algorithm change). */
  private val secondLevelTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.sg", "com.tr")

  /** Registered (pay-level) domain of a host: the last two labels, or
    * three when the last two form a second-level public suffix.
    * A bare or dotless host returns itself. */
  def registeredDomain(hostCol: Column): Column = {
    val two = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val suffix2 = secondLevelTlds.foldLeft(lit(false))(
      (acc, s) => acc || two === s)
    when(suffix2 && three =!= "", three)
      .when(two =!= "", two)
      .otherwise(hostCol)
  }
}
