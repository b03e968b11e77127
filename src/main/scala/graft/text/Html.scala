package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step that turns crawled pages into
  * trainable text (every web-scale pretraining corpus starts here).
  * Built ENTIRELY from codegen'd column expressions (regexp_replace
  * with RE2-compatible patterns, plain replaces), so it runs unchanged
  * in batch, Structured Streaming, and the DuckDB oracle — no UDF, no
  * driver-side parsing, one narrow projection with zero shuffles.
  *
  * Order is load-bearing and spec-pinned:
  *  1. `<script>`/`<style>` ELEMENTS go first, wholesale (dotall,
  *     non-greedy) — their bodies legally contain bare `<` (e.g.
  *     `var x = 1 < 2;`) that would desynchronize a naive tag strip;
  *  2. comments (`<!-- … -->`, dotall);
  *  3. remaining tags → a space, in TWO passes: a quoted-attribute-
  *     aware pass (`>` inside a quoted value never closes the tag;
  *     quoted spans never cross `<`, so an unclosed quote cannot
  *     swallow following text), then the conservative `<[^>]*>`
  *     cleanup for tags the first pass refused (unbalanced quotes
  *     degrade to the legacy strip instead of deleting content);
  *  4. the five standard entities, `&amp;` LAST (decoding it first
  *     would double-decode `&amp;lt;` into `<`);
  *  5. whitespace squeeze + trim.
  * All patterns use RE2-safe syntax (inline `(?is)` flags, no
  * lookaround), identical semantics under Java regex and RE2. */
object Html {

  /** The shared tail: five standard entities (`&amp;` LAST) +
    * whitespace squeeze + trim. */
  private def cleanText(c: Column): Column = {
    val ent = replace(
      replace(
        replace(
          replace(
            replace(c, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "[ \\t\\n\\r]+", " "))
  }

  /** Passes 1-3 shared by [[htmlToText]] and the metadata extractors:
    * script/style elements wholesale, then comments. The metadata
    * extractors MUST see this too — a `<link rel=canonical>` inside a
    * comment or a JS string literal is not part of the document, and
    * via [[graft.multimodal.Containers.warcDocs]] the canonical is the
    * document's IDENTITY (honoring a commented-out canonical is an
    * identity-injection vector). */
  private def stripHidden(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  def htmlToText(html: Column): Column = {
    // Two-pass tag strip. Pass 1 is quoted-attribute-aware — a '>'
    // inside a quoted value (title="a > b") must not close the tag —
    // with two containment rules that keep it SAFE on sloppy markup:
    // quoted spans may not cross '<' (an unclosed quote would
    // otherwise swallow following tags AND the visible text between
    // them), and every branch starts with a distinct char (no
    // overlap), so Java-regex backtracking stays linear — the same
    // guarantees RE2 gives structurally. A tag pass 1 cannot match
    // (an UNBALANCED quote, e.g. an unquoted attr value with an
    // apostrophe: <p alt=don't>) is left in place and pass 2 strips
    // it to the first '>' — exactly the old conservative rule, so
    // malformed tags degrade to the legacy behavior instead of
    // deleting document text.
    val pass1 = regexp_replace(stripHidden(html),
      "<(?:[^<>\"']|\"[^\"<]*\"|'[^'<]*')*>", " ")
    val noTags = regexp_replace(pass1, "<[^>]*>", " ")
    cleanText(noTags)
  }

  // ---- structural metadata ---------------------------------------------
  // The crawl-pipeline keys htmlToText throws away: title / meta
  // description (curation features), the canonical link (THE dedup key
  // — feed it Urls.normalizeUrl), the html lang attribute (routing
  // before model-based language ID). Same discipline as the text
  // extractor: RE2-safe expression-only patterns (no lookaround, no
  // backreferences — quote styles and attribute orders are explicit
  // alternatives), '' when absent, identical under Java regex and RE2.

  /** `<title>` body — entities decoded, whitespace squeezed; '' when
    * the element is absent. */
  def title(html: Column): Column =
    cleanText(regexp_extract(stripHidden(html),
      "(?is)<title[^>]*>(.*?)</title>", 1))

  /** First non-empty extraction of `valAttr`'s value from a `tag`
    * element carrying `keyAttr`=`keyVal`, across the four
    * (attribute order) × (quote style) shapes. The key value matches
    * exactly — quoted forms verbatim, the unquoted form delimited —
    * so "description" never swallows "descriptions". `[^>]*` cannot
    * cross a tag boundary, so both attributes provably sit in ONE
    * element. */
  private def attrValue(rawHtml: Column, tag: String, keyAttr: String,
      keyVal: String, valAttr: String): Column = {
    // both attribute NAMES require a leading delimiter ([\s"'/]) so a
    // suffix of a different attribute never matches (itemcontent= must
    // not satisfy content=, data-rel= must not satisfy rel=); the
    // unquoted key VALUE's trailing delimiter may include '>' ONLY when
    // the key is the pattern's final element — consumed mid-pattern it
    // would let the remainder continue matching into the NEXT tag
    def key(delim: String) =
      s"""["'\\s/]$keyAttr\\s*=\\s*(?:"$keyVal"|'$keyVal'|$keyVal[$delim])"""
    val valA = s"""["'\\s/]$valAttr\\s*=\\s*"""
    def pat(q: String, cap: String, keyFirst: Boolean): String =
      if (keyFirst)
        s"""(?is)<$tag[^>]*${key("\\s/")}[^>]*$valA$q($cap)$q"""
      else
        s"""(?is)<$tag[^>]*$valA$q($cap)$q[^>]*${key("\\s/>")}"""
    // metadata is extracted from the VISIBLE document only — a match
    // inside <!-- --> / <script> / <style> is content, not markup. The
    // strip runs ONCE per row: `transform` over a 1-element array is
    // the expression layer's let-binding (the lambda variable), so the
    // three strip passes and the source html appear once in the tree
    // instead of once per candidate — without it the 4 candidates ×
    // strip × caller-side generation nest past Janino's method limits
    // and the whole stage falls out of codegen.
    def extract(h: Column): Column = {
      val cands = Seq(
        regexp_extract(h, pat("\"", "[^\"]*", keyFirst = true), 1),
        regexp_extract(h, pat("'", "[^']*", keyFirst = true), 1),
        regexp_extract(h, pat("\"", "[^\"]*", keyFirst = false), 1),
        regexp_extract(h, pat("'", "[^']*", keyFirst = false), 1))
      // first non-empty candidate, each appearing ONCE in the tree
      // (try_: under ANSI semantics element_at throws on the
      // no-candidate-matched empty array; null is the wanted value)
      try_element_at(filter(array(cands: _*), c => length(c) > 0), lit(1))
    }
    coalesce(
      element_at(transform(array(stripHidden(rawHtml)), extract _), 1),
      lit(""))
  }

  /** `<meta name="description" content="…">` — entities decoded,
    * whitespace squeezed; '' when absent. Order/quoting/tag-case
    * robust; og:description and other property= tags never match. */
  def metaDescription(html: Column): Column =
    cleanText(attrValue(html, "meta", "name", "description", "content"))

  /** `<link rel="canonical" href="…">` — the canonical URL (entities
    * decoded; feed the result to [[Urls.normalizeUrl]] for the dedup
    * key); '' when absent. */
  def canonicalLink(html: Column): Column =
    cleanText(attrValue(html, "link", "rel", "canonical", "href"))

  /** The `<html lang=…>` attribute (BCP-47 tag chars); '' when
    * absent. */
  def htmlLang(html: Column): Column =
    regexp_extract(stripHidden(html),
      "(?is)<html[^>]*?[\\s]lang\\s*=\\s*[\"']?([A-Za-z0-9-]+)", 1)

  // ---- main-content extraction -----------------------------------------

  /** Block-level element boundaries, quote-attribute-aware (the q128
    * two-pass discipline's pass-1 body after the tag name: a '>'
    * inside a quoted attribute value never ends the tag, quoted spans
    * never cross '<'). A block tag with an UNBALANCED quote is left
    * unmatched — the adjacent blocks merge, which only makes the
    * keep/drop decision more conservative (boilerplate text may
    * survive; content is never deleted). */
  private val blockTagPattern: String =
    "(?i)</?(?:div|p|section|article|main|header|footer|nav|aside|" +
      "ul|ol|li|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|h[1-6]|" +
      "blockquote|pre|form|fieldset|figure|figcaption|address|hr|br)" +
      "\\b(?:[^<>\"']|\"[^\"<]*\"|'[^'<]*')*>"

  /** Inline-tag strip within one block (the htmlToText two-pass rule,
    * minus the hidden-region strip the caller already ran). */
  private def stripInline(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "<(?:[^<>\"']|\"[^\"<]*\"|'[^'<]*')*>", " "),
      "<[^>]*>", " ")

  /** MAIN-content extraction — boilerplate block removal, the step
    * between [[htmlToText]] and curation that real pretraining
    * pipelines need: nav bars, sidebar link farms, and footers are
    * short and link-dense, and taken verbatim they poison dedup
    * signatures (every page on a site shares its chrome) and quality
    * stats (stopword/repetition rules see the nav soup, not the
    * article). The jusText-family per-block rule, expression-only:
    *  1. strip hidden regions, then the whole `<head>` (its text —
    *     title, metadata — is not body content);
    *  2. split into blocks at block-level tag boundaries
    *     ([[blockTagPattern]], quote-aware);
    *  3. per block: visible text (inline strip + entities + squeeze)
    *     and LINK text (the bodies of `<a>` elements, same cleaning);
    *  4. keep blocks with at least `minChars` visible chars AND link
    *     density at most `maxLinkPct`% (chars of link text per 100
    *     chars of block text);
    *  5. join survivors in document order.
    * Zero shuffles, one narrow projection; batch == streaming. The
    * thresholds are the classic boilerplate operating point — tune
    * per corpus, the defaults are deliberately conservative. */
  def mainContent(html: Column, minChars: Int = 25,
      maxLinkPct: Int = 33): Column = {
    require(minChars >= 1 && maxLinkPct >= 0 && maxLinkPct <= 100,
      s"mainContent: need minChars >= 1, 0 <= maxLinkPct <= 100, " +
        s"got $minChars/$maxLinkPct")
    val noHead = regexp_replace(stripHidden(html),
      "(?is)<head\\b[^>]*>.*?</head>", " ")
    val blocks = split(regexp_replace(noHead, blockTagPattern, "\u0001"),
      "\u0001")
    // per-block (text, link-text) — computed once per block via the
    // transform let-binding (the expression layer's only way to bind)
    val scored = transform(blocks, b => {
      val links = array_join(regexp_extract_all(b,
        lit("(?is)<a\\b(?:[^<>\"']|\"[^\"<]*\"|'[^'<]*')*>(.*?)</a>"),
        lit(1)), " ")
      val txt = cleanText(stripInline(b))
      val ltxt = cleanText(stripInline(links))
      struct(txt.as("txt"), length(txt).as("n"), length(ltxt).as("ln"))
    })
    val kept = filter(scored, s =>
      s.getField("n") >= minChars &&
        s.getField("ln") * 100 <= s.getField("n") * maxLinkPct)
    trim(regexp_replace(
      array_join(transform(kept, _.getField("txt")), " "),
      "[ \\t\\n\\r]+", " "))
  }
}
