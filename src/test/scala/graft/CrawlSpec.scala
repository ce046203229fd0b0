package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Crawl

/** Pins the URL canonicalizer's rule set (q326) on the edge cases the
  * synthesized-corpus oracle can't isolate one by one.
  */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Crawl.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercase; default ports stripped per scheme") {
    assert(canon("HTTP://A.Example.com:80/a") == Seq("http://a.example.com/a"))
    assert(canon("https://A.example.COM:443/a") == Seq("https://a.example.com/a"))
    // a default port under the WRONG scheme survives
    assert(canon("http://a.example.com:443/a") ==
      Seq("http://a.example.com:443/a"))
    assert(canon("https://a.example.com:80/a") ==
      Seq("https://a.example.com:80/a"))
    // non-default ports survive
    assert(canon("http://a.example.com:8080/a") ==
      Seq("http://a.example.com:8080/a"))
  }

  test("fragment dropped; empty path becomes /") {
    assert(canon("http://h.example.com#top") == Seq("http://h.example.com/"))
    assert(canon("http://h.example.com/p#sec2") == Seq("http://h.example.com/p"))
    assert(canon("http://h.example.com") == Seq("http://h.example.com/"))
  }

  test("tracking params dropped; survivors sorted; empty query loses ?") {
    assert(canon("http://h.example.com/p?z=1&utm_source=x&a=2") ==
      Seq("http://h.example.com/p?a=2&z=1"))
    assert(canon("http://h.example.com/p?utm_campaign=c&fbclid=f&gclid=g") ==
      Seq("http://h.example.com/p"))
    // bare utm key without '=' is also tracking
    assert(canon("http://h.example.com/p?utm_x&b=1") == Seq("http://h.example.com/p?b=1"))
    // a NON-tracking param that merely contains 'utm_' mid-key stays
    assert(canon("http://h.example.com/p?xutm_a=1") == Seq("http://h.example.com/p?xutm_a=1"))
    // path and case of params untouched
    assert(canon("http://h.example.com/P?B=2&A=1") == Seq("http://h.example.com/P?A=1&B=2"))
  }

  test("robotsDecision: longest match wins; allow beats disallow on ties") {
    val rules = Seq(
      ("h", "/a", false), ("h", "/a/b", true), ("h", "/a/b/c", false),
      ("h", "/t", false), ("h", "/t", true) // exact tie → allow wins
    ).toDF("host", "prefix", "allow")
    val urls = Seq(
      (1L, "h", "/a/x"), // matches /a only → disallowed
      (2L, "h", "/a/b/x"), // /a/b (len 4) beats /a → allowed
      (3L, "h", "/a/b/c/x"), // /a/b/c (len 6) beats /a/b → disallowed
      (4L, "h", "/t/x"), // tie at /t → allow wins
      (5L, "h", "/zzz"), // no match → default allow
      (6L, "other", "/a/x") // rules are per-host → default allow
    ).toDF("id", "host", "path")
    val out = graft.ops.Crawl
      .robotsDecision(urls, col("id"), col("host"), col("path"), rules)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getString(4)))).toMap
    assert(out(1L) == ((false, "/a")))
    assert(out(2L) == ((true, "/a/b")))
    assert(out(3L) == ((false, "/a/b/c")))
    assert(out(4L) == ((true, "/t")))
    assert(out(5L) == ((true, "(default)")))
    assert(out(6L) == ((true, "(default)")))
  }

  test("htmlExtract: script/style subtrees drop BEFORE the tag strip, " +
    "comments vanish, links harvest both quote forms in order") {
    val html = "<html><head><title>T1</title>" +
      "<script>if (a < b) { call(\"x\"); }</script>" +
      "<style>.c { color: red; }</style></head>" +
      "<body><p>Hello   world</p><!-- secret -->" +
      "<a href=\"https://h.example.com/a\">A</a>" +
      "<a href='/rel/b'>B</a></body></html>"
    val r = Crawl.htmlExtract(Seq((1L, html)).toDF("id", "html"),
      col("html")).collect().head
    assert(r.getAs[String]("title") == "T1")
    val text = r.getAs[String]("text")
    assert(text == "T1 Hello world A B", s"got '$text'")
    // the script body's bare '<' and call text must NOT leak
    assert(!text.contains("call") && !text.contains("color")
      && !text.contains("secret"))
    assert(r.getAs[Long]("n_links") == 2L)
    assert(r.getAs[String]("links") == "https://h.example.com/a|/rel/b")
    assert(r.getAs[Long]("text_ratio6") ==
      text.length.toLong * 1000000L / html.length)
  }

  test("htmlExtract: UPPERCASE and mixed-case tags are handled — script " +
    "bodies still never leak") {
    val html = "<HTML><HEAD><TITLE>Up</TITLE>" +
      "<SCRIPT type=\"x\">if (a < b) leak();</SCRIPT>" +
      "<Style>.c { leakier: red; }</Style></HEAD>" +
      "<BODY><P>ok</P><A HREF=\"/Mixed\">m</A></BODY></HTML>"
    val r = Crawl.htmlExtract(Seq((1L, html)).toDF("id", "html"),
      col("html")).collect().head
    assert(r.getAs[String]("title") == "Up")
    assert(r.getAs[String]("text") == "Up ok m")
    assert(r.getAs[Long]("n_links") == 1L &&
      r.getAs[String]("links") == "/Mixed")
  }

  test("htmlExtract: no links, no title, markup-only page → empty text, " +
    "ratio 0") {
    val r = Crawl.htmlExtract(
      Seq((1L, "<html><body><br/><hr></body></html>")).toDF("id", "html"),
      col("html")).collect().head
    assert(r.getAs[String]("title") == "")
    assert(r.getAs[String]("text") == "")
    assert(r.getAs[Long]("n_links") == 0L && r.getAs[String]("links") == "")
    assert(r.getAs[Long]("text_ratio6") == 0L)
  }

  test("urlGroups collapses canonical duplicates and keeps min id") {
    val df = Seq(
      (10L, "HTTP://X.example.com:80/p?b=1&a=1&utm_source=s"),
      (3L, "http://x.example.COM/p?utm_medium=m&a=1&b=1"),
      (7L, "http://x.example.com/q")
    ).toDF("id", "u")
    val g = Crawl.urlGroups(df, col("u"), col("id"))
      .orderBy(col("url")).collect()
    assert(g.length == 2)
    assert(g(0).getString(0) == "http://x.example.com/p?a=1&b=1" &&
      g(0).getLong(1) == 2L && g(0).getLong(2) == 3L)
    assert(g(1).getString(0) == "http://x.example.com/q" && g(1).getLong(1) == 1L)
  }
}
