package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two canonical rule-based curation recipes of the LLM-pretraining
  * literature, frozen as integer-exact column expressions (no UDFs, no
  * shuffle — the [[TextFunctions]] discipline, so batch == streaming ==
  * the DuckDB oracles):
  *
  *  - Gopher document rules (Rae et al. 2021 §A1.1): per-document
  *    structural gates — word count, mean word length, symbol-to-word
  *    ratio, bullet/ellipsis line fractions, alphabetic-word fraction,
  *    stop-word evidence — each surfaced as its own measure plus the
  *    conjunctive keep flag, so a curation audit can see WHICH rule
  *    fired (a bare boolean hides the distribution shift a rule tweak
  *    would cause).
  *  - C4 line cleaning (Raffel et al. 2020 §2.2): LINE-level retention
  *    (terminal punctuation, >= 3 words, no "javascript", no '{')
  *    rebuilt into the cleaned page, with the page-level drops (any
  *    "lorem ipsum", any '{' — the code-page heuristic, and pages
  *    whose cleaning keeps nothing).
  *
  * Ratios are floored basis points / milli units: exact integers on
  * both engines, no float-accumulation caveats. */
object QualityRules {

  /** Gopher's example stop-word evidence list (the rule asks for >= 2
    * distinct hits). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def wordsOf(text: Column): Column = TextFunctions.tokens(text)

  private def linesOf(text: Column): Column =
    filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => l =!= "")

  /** Per-document Gopher rule measures + keep. Appends to `df`:
    * n_words, mean_word_len_milli, symbol_bp, bullet_bp, ellipsis_bp,
    * alpha_bp, n_stop_hits, keep (1 iff every rule passes:
    * 50 <= n_words <= 100000, 3000 <= mean len <= 10000 milli,
    * symbol_bp <= 1000, bullet_bp <= 9000, ellipsis_bp <= 3000,
    * alpha_bp >= 8000, n_stop_hits >= 2). Empty/NULL text fails the
    * word-count rule with zeroed measures. */
  def gopherRules(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val ws = wordsOf(col(textCol))
    val ls = linesOf(col(textCol))
    val nW = size(ws).cast("long")
    val nL = size(ls).cast("long")
    def bpOfWords(pred: Column => Column): Column =
      when(nW > 0, floor(lit(10000L) * size(filter(ws, pred)).cast("long") / nW))
        .otherwise(0L).cast("long")
    def bpOfLines(pred: Column => Column): Column =
      when(nL > 0, floor(lit(10000L) * size(filter(ls, pred)).cast("long") / nL))
        .otherwise(0L).cast("long")
    val meanLenMilli = when(nW > 0,
        floor(lit(1000L) *
          aggregate(ws, lit(0L), (a, w) => a + length(w).cast("long")) / nW))
      .otherwise(0L).cast("long")
    val out = df
      .withColumn("n_words", nW)
      .withColumn("mean_word_len_milli", meanLenMilli)
      .withColumn("symbol_bp",
        bpOfWords(w => w.contains("#") || w.contains("...")))
      .withColumn("bullet_bp", bpOfLines(l =>
        l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .withColumn("ellipsis_bp", bpOfLines(l => l.endsWith("...")))
      .withColumn("alpha_bp", bpOfWords(w => w.rlike("[a-z]")))
      .withColumn("n_stop_hits",
        size(filter(array_distinct(ws), w => w.isin(GopherStopwords: _*)))
          .cast("long"))
    out.withColumn("keep",
      (col("n_words") >= 50L && col("n_words") <= 100000L &&
        col("mean_word_len_milli") >= 3000L && col("mean_word_len_milli") <= 10000L &&
        col("symbol_bp") <= 1000L && col("bullet_bp") <= 9000L &&
        col("ellipsis_bp") <= 3000L && col("alpha_bp") >= 8000L &&
        col("n_stop_hits") >= 2L).cast("long"))
  }

  /** One C4-retained line: nonempty, ends in terminal punctuation
    * ('.', '!', '?' or a closing double quote), >= 3 whitespace words,
    * no "javascript" (case-insensitive via the lower() convention), no
    * '{'. */
  private def c4LineKeep(l: Column): Column =
    (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
      size(filter(split(lower(l), " "), w => w =!= "")) >= 3 &&
      !lower(l).contains("javascript") && !l.contains("{")

  /** C4 line cleaning over `df`. Appends: n_lines (nonempty input
    * lines), n_kept, clean_text (kept lines joined by '\n'; '' when
    * the page drops), keep (0 iff the raw page contains "lorem ipsum"
    * or '{' anywhere, or no line survives). */
  def c4Clean(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val ls = linesOf(col(textCol))
    val kept = filter(ls, c4LineKeep(_))
    val pageDrop = lower(coalesce(col(textCol), lit("")))
      .contains("lorem ipsum") ||
      coalesce(col(textCol), lit("")).contains("{")
    df.withColumn("n_lines", size(ls).cast("long"))
      .withColumn("n_kept",
        when(pageDrop, 0L).otherwise(size(kept).cast("long")))
      .withColumn("keep",
        when(pageDrop || size(kept) === 0, 0L).otherwise(1L))
      .withColumn("clean_text",
        when(col("keep") === 1L, array_join(kept, "\n")).otherwise(lit("")))
  }
}
