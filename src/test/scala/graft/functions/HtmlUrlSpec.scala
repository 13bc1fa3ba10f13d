package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HtmlUrlSpec extends SparkSuite {
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("s").select(expr.as("r")).as[String].head()

  test("visibleText: scripts/styles/comments drop, blocks separate, entities decode") {
    val html = "<html><style>a{}</style><script>if(1<2){x()}</script>" +
      "<!-- hidden --><p>alpha</p><p>beta &amp; &lt;gamma&gt;</p></html>"
    assert(one(Html.visibleText(col("s")), html) == "alpha beta & <gamma>")
  }

  test("visibleText: adjacent paragraphs never fuse; inline tags do not split") {
    assert(one(Html.visibleText(col("s")), "<p>a</p><p>b</p>") == "a b")
    assert(one(Html.visibleText(col("s")), "w<b>x</b>y") == "w x y")
  }

  test("visibleText: &amp; decodes LAST (no double-decode of &amp;lt;)") {
    assert(one(Html.visibleText(col("s")), "&amp;lt;") == "&lt;")
  }

  test("hrefs: both quote STYLES and cases, document order, missing → empty") {
    val html = """<a href="http://a/1">x</a><div/><A Href='http://a/2'>y</A>""" +
      """<a href='http://a/3?q=1'>z</a>"""
    val got = Seq(html).toDF("s").select(Html.hrefs(col("s")).as("r"))
      .as[Seq[String]].head()
    assert(got == Seq("http://a/1", "http://a/2", "http://a/3?q=1"))
    assert(Seq("<p>no links</p>").toDF("s")
      .select(size(Html.hrefs(col("s")))).as[Int].head() == 0)
  }

  test("title: extracted and whitespace-collapsed; absent → empty") {
    assert(one(Html.title(col("s")), "<title>  A \n B </title>") == "A B")
    assert(one(Html.title(col("s")), "<p>x</p>") == "")
  }

  test("canonicalize: case, www, default port, tracking, fragment, trailing bare slash") {
    assert(one(Url.canonicalize(col("s")),
      "HTTP://WWW.Ex.COM:80/?utm_source=a&fbclid=b#f") == "http://ex.com")
    assert(one(Url.canonicalize(col("s")),
      "https://ex.com:443/p?a=1&utm_x=2&b=3") == "https://ex.com/p?a=1&b=3")
  }

  test("canonicalize: non-default port and param order are preserved") {
    assert(one(Url.canonicalize(col("s")),
      "http://ex.com:8080/x?b=2&a=1") == "http://ex.com:8080/x?b=2&a=1")
    // https on port 80 is NOT a default — kept
    assert(one(Url.canonicalize(col("s")),
      "https://ex.com:80/x") == "https://ex.com:80/x")
  }

  test("canonicalize: non-http schemes pass through with lowercased scheme only") {
    assert(one(Url.canonicalize(col("s")),
      "FTP://Files.Ex.net/Pub") == "ftp://Files.Ex.net/Pub")
    assert(one(Url.canonicalize(col("s")),
      "mailto:A@B.com") == "mailto:A@B.com")
  }

  test("canonicalize: schemeless/relative input passes through raw (never merges)") {
    // r6 advice: these used to all collapse to '' — one shared dedup key.
    assert(one(Url.canonicalize(col("s")), "/relative/path?x=1") == "/relative/path?x=1")
    assert(one(Url.canonicalize(col("s")), "example.com/page") == "example.com/page")
    assert(one(Url.canonicalize(col("s")), "//proto-relative.com/x") == "//proto-relative.com/x")
    assert(one(Url.canonicalize(col("s")), "") == "")
  }

  test("registeredDomain: plain, second-level public suffix, bare host") {
    def rd(h: String): String = one(Url.registeredDomain(col("s")), h)
    assert(rd("news.site.example.com") == "example.com")
    assert(rd("news.example.co.uk") == "example.co.uk")
    assert(rd("example.co.uk") == "example.co.uk")
    assert(rd("ex.com") == "ex.com")
    assert(rd("localhost") == "localhost")
  }

  test("anchors: href pairs with ITS OWN text, nested tags stripped, " +
    "whitespace collapsed, both quote styles") {
    import spark.implicits._
    val html = """<a href="http://a/">first  link</a> filler
      |<A HREF='http://b/'><b>second</b>
      |bold</A> <a name="x">no href</a>""".stripMargin
    val got = Seq(html).toDF("s")
      .select(explode(Html.anchors(col("s"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("http://a/", "first link"),
      ("http://b/", "second bold")))
  }
}
