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
  *  3. remaining tags → a space (`<[^>]*>` — attribute values with
  *     `>` inside quotes are out of scope, as in every
  *     regex-extraction pipeline; a DOM parse is the escalation path);
  *  4. the five standard entities, `&amp;` LAST (decoding it first
  *     would double-decode `&amp;lt;` into `<`);
  *  5. whitespace squeeze + trim.
  * All patterns use RE2-safe syntax (inline `(?is)` flags, no
  * lookaround), identical semantics under Java regex and RE2. */
object Html {

  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = replace(
      replace(
        replace(
          replace(
            replace(noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "[ \\t\\n\\r]+", " "))
  }
}
