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
}
