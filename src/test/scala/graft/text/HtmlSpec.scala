package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def clean(html: String): String =
    Seq(Option(html)).toDF("h")
      .select(Html.htmlToText(col("h")).as("c"))
      .collect()(0).getString(0)

  test("extraction: scripts with bare '<', case-insensitive elements, comments, entities") {
    assert(clean("<p>hello <b>bold</b> world</p>") == "hello bold world")
    // the script body contains a bare '<' that a naive tag strip would
    // desynchronize on — element removal must run first
    assert(clean("<script>if (a < b) { x = '</p>'; }</script>after") == "after")
    assert(clean("<SCRIPT>var x;</SCRIPT>ok<STYLE>p { a: 1 < 2 }</STYLE>") == "ok")
    assert(clean("a<!-- multi\nline\ncomment -->b") == "a b")
    // amp-last decode: &amp;lt; is the LITERAL string "&lt;", not "<"
    assert(clean("x &amp;lt; y") == "x &lt; y")
    assert(clean("&lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;co") ==
      "<tag> \"q\" 's' &co")
    // whitespace squeeze + trim across tag boundaries
    assert(clean("  <div>\n\t<p>a</p>\r\n<p>b</p>\n</div>  ") == "a b")
    // multiline style element
    assert(clean("<style type=\"text/css\">\nbody {\n margin: 0;\n}\n</style>text") == "text")
  }

  test("extraction: empty, null, and tag-free inputs pass through sanely") {
    assert(clean("") == "")
    assert(clean("plain text stays put") == "plain text stays put")
    val n = Seq((1L, null: String)).toDF("id", "h")
      .select(Html.htmlToText(col("h")).as("c")).collect()(0)
    assert(n.isNullAt(0), "NULL html stays NULL (callers coalesce)")
  }

  private def meta4(html: String): (String, String, String, String) =
    Seq(html).toDF("h")
      .select(Html.title(col("h")), Html.metaDescription(col("h")),
        Html.canonicalLink(col("h")), Html.htmlLang(col("h")))
      .collect()(0) match {
        case r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      }

  test("metadata: title entities/whitespace; absent fields are ''") {
    val (t, d, c, l) = meta4(
      "<html lang=\"en\"><head><title> A &amp;\n B </title></head><body/></html>")
    assert(t == "A & B" && d == "" && c == "" && l == "en")
    assert(meta4("<html><head></head></html>") == ("", "", "", ""))
  }

  test("metadata: every order x quote shape extracts; traps never match") {
    val traps = "<meta property=\"og:description\" content=\"OG\">" +
      "<meta name=\"descriptions\" content=\"TRAP\">" +
      "<meta name=\"keywords\" content=\"k\">" +
      "<link rel=\"stylesheet\" href=\"/s.css\">"
    val shapes = Seq(
      "<meta name=\"description\" content=\"real one\">",
      "<meta name='description' content='real one'>",
      "<META content=\"real one\" name=\"description\">",
      "<meta content='real one' name=description>")
    for (s <- shapes) {
      val (_, d, _, _) = meta4(s"<html><head>$traps$s$traps</head></html>")
      assert(d == "real one", s"shape failed: $s")
    }
    // traps alone yield nothing
    assert(meta4(s"<html><head>$traps</head></html>")._2 == "")
    // canonical: both orders, quote styles, entity in href
    val (_, _, c1, _) = meta4(
      "<html><head><link rel=\"canonical\" href=\"http://x.com/a?b=1&amp;c=2\"></head></html>")
    assert(c1 == "http://x.com/a?b=1&c=2")
    val (_, _, c2, _) = meta4(
      "<html><head><link href='http://x.com/a' rel='canonical'></head></html>")
    assert(c2 == "http://x.com/a")
  }

  test("extraction: '>' inside a quoted attribute never closes the tag early") {
    val out = Seq(
      "<p class=\"main\" title=\"a > b\">visible text</p>" +
        "<div data-x='1 > 0'>more</div>")
      .toDF("h").select(Html.htmlToText(col("h")).as("t"))
      .collect().head.getString(0)
    assert(out == "visible text more", s"'$out'")
    // unterminated tag at EOF stays literal (no swallow-to-end)
    val cut = Seq("text <a href=\"x").toDF("h")
      .select(Html.htmlToText(col("h")).as("t")).collect().head.getString(0)
    assert(cut == "text <a href=\"x", s"'$cut'")
    // an UNBALANCED quote (unquoted attr value with an apostrophe)
    // must never swallow the visible text after the tag: the quoted
    // branch can't cross '<', so pass 1 refuses and pass 2 strips the
    // tag to its first '>' — the legacy conservative rule
    val apos = Seq("<p alt=don't>it's fine</p> <b>tail</b>").toDF("h")
      .select(Html.htmlToText(col("h")).as("t")).collect().head.getString(0)
    assert(apos == "it's fine tail", s"'$apos'")
    // quote-flood after an unclosed '<' stays linear and non-swallowing
    val flood = "text < " + ("\"" * 2000) + " more"
    val fl = Seq(flood).toDF("h")
      .select(Html.htmlToText(col("h")).as("t")).collect().head.getString(0)
    assert(fl.endsWith("more"), s"'${fl.takeRight(20)}'")
  }

  test("metadata: commented-out / scripted metadata is content, not markup") {
    // a canonical inside a comment or a JS string literal must never
    // be honored — via warcDocs the canonical becomes the document's
    // IDENTITY, so hidden-region matches are an injection vector
    val (t, d, c, l) = meta4(
      "<html><head>" +
        "<!-- <title>ghost</title>" +
        " <link rel=\"canonical\" href=\"http://victim.example/x\"> -->" +
        "<script>var s = '<meta name=\"description\" content=\"js\">';" +
        "var c = '<link rel=\"canonical\" href=\"http://victim.example/y\">';" +
        "</script>" +
        "<style>/* <html lang=\"xx\"> */</style>" +
        "<title>real</title>" +
        "</head></html>")
    assert(t == "real", s"title: '$t'")
    assert(d == "" && c == "" && l == "")
    // the visible ones still extract with hidden regions present
    val (_, d2, c2, _) = meta4(
      "<html><head><!-- <link rel=\"canonical\" href=\"http://no.example\"> -->" +
        "<meta name=\"description\" content=\"vis\">" +
        "<link rel=\"canonical\" href=\"http://yes.example/p\"></head></html>")
    assert(d2 == "vis" && c2 == "http://yes.example/p")
  }

  test("metadata: lang forms — quoted, CAPS tag/attr, unquoted, absent") {
    assert(meta4("<html lang=\"en-US\"><head></head></html>")._4 == "en-US")
    assert(meta4("<HTML LANG='de-DE'><head></head></HTML>")._4 == "de-DE")
    assert(meta4("<html data-x=\"1\" lang=fr><head></head></html>")._4 == "fr")
    assert(meta4("<html><head></head></html>")._4 == "")
  }

  private def mainOf(h: String, minChars: Int = 25,
      maxLinkPct: Int = 33): String =
    Seq(h).toDF("h")
      .select(Html.mainContent(col("h"), minChars, maxLinkPct).as("t"))
      .collect().head.getString(0)

  test("mainContent: chrome drops, content survives, head never leaks") {
    val page = "<html><head><title>A long headline for the head block</title>" +
      "</head><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> " +
      "<a href='/c'>Contact us</a> <a href='/s'>Sign in now</a></nav>" +
      "<p>The article body has plenty of visible prose to keep.</p>" +
      "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a> " +
      "<a href='/i'>Imprint</a> (c)</footer></body></html>"
    assert(mainOf(page) ==
      "The article body has plenty of visible prose to keep.")
    // the nav text ("Home About Contact us Sign in now", 33 chars)
    // clears the length floor — it drops by DENSITY, the footer too
  }

  test("mainContent: length floor, inline-link density, quoted '>' in a block tag") {
    // a short paragraph drops on the floor; lowering the floor keeps it
    val shorty = "<body><p>Tiny note.</p>" +
      "<p>A properly long paragraph of real content here.</p></body>"
    assert(mainOf(shorty) ==
      "A properly long paragraph of real content here.")
    assert(mainOf(shorty, minChars = 5) ==
      "Tiny note. A properly long paragraph of real content here.")
    // an inline citation link is kept, text and all (density ~13%)
    val cited = "<div class=\"post\" title=\"a > b\"><p>Primary finding one " +
      "about the topic with <a href=\"/r?x=1\">source nine</a> " +
      "and more context here</p></div>"
    assert(mainOf(cited) == "Primary finding one about the topic with " +
      "source nine and more context here")
    // density knob: at 0% the same block drops (it contains ANY link)
    assert(mainOf(cited, maxLinkPct = 0) == "")
  }

  test("mainContent: unbalanced quote in a block tag degrades to a merge, never deletes") {
    // <nav title='It's here'> cannot match the quote-aware boundary:
    // the nav OPEN tag fails to split (blocks merge) but </nav> does,
    // so the merged block is still all-links and still drops — and the
    // article text after it is untouched
    val page = "<body><nav title='It's here'><a href='/'>Home</a> " +
      "<a href='/a'>About</a> <a href='/c'>Contact us here</a></nav>" +
      "<p>The real article content is long enough to keep.</p></body>"
    assert(mainOf(page) ==
      "The real article content is long enough to keep.")
  }
}
