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

  private def parasOf(text: Column): Column =
    filter(transform(split(coalesce(text, lit("")), "\n\n"), p => trim(p)),
      p => p =!= "")

  /** Gopher's REPETITION rules — the other half of the document-rule
    * family ([[gopherRules]] covers the structural signals): scraped
    * pages that loop navigation strings, boilerplate paragraphs, or
    * n-gram stutter. Appends per-doc floored-bp measures + `keep`:
    *
    *  - dup_line_bp / dup_para_bp: duplicated line / paragraph
    *    OCCURRENCES over total (lines = '\n'-split trimmed nonempty,
    *    paragraphs = '\n\n'-split; exact string match; an occurrence
    *    is "duplicated" iff its value appears >= 2 times);
    *  - dup_line_char_bp / dup_para_char_bp: characters carried by
    *    duplicated occurrences over total characters (sum of element
    *    lengths — the frozen convention excludes the separators);
    *  - top{2,3,4}_gram_bp: the modal word n-gram's occurrences x its
    *    character length (sum of word lengths, no separators) over
    *    total word characters; count ties break to the LONGEST gram
    *    (deterministic); a gram seen once is not repetition (0);
    *  - dup{5..10}_gram_bp: characters of token POSITIONS covered by
    *    at least one occurrence of an n-gram appearing >= 2 times,
    *    over total word characters (position coverage, so overlapping
    *    occurrences never double-count — the Gopher paper's measure);
    *  - keep: 1 iff every measure passes the paper's thresholds
    *    (dup line/para <= 3000 bp, their char forms <= 2000,
    *    top 2/3/4-gram <= 2000/1800/1600, dup 5..10-gram <=
    *    1500/1400/1300/1200/1100/1000).
    *
    * Scale shape: line/paragraph duplication is expression-only over
    * sorted arrays (O(L log L) per doc, no shuffle); the n-gram
    * measures explode one (doc, n, position) row stream for all nine
    * n values and aggregate by (doc, n, gram) — linear in tokens,
    * hash-partitioned, never quadratic in document length. */
  def gopherRepetition(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val nsTop = Seq(2, 3, 4)
    val nsDup = Seq(5, 6, 7, 8, 9, 10)
    val ws = wordsOf(col(textCol))
    val totalChars =
      aggregate(ws, lit(0L), (a, w) => a + length(w).cast("long"))

    // sorted-neighbor duplicate detection: element i of the sorted
    // array is a duplicated occurrence iff it equals a neighbor
    def dupStats(arr: Column): (Column, Column) = { // (dup_bp, dup_char_bp)
      val sorted = array_sort(arr)
      val n = size(sorted)
      val dupIdx = when(n > 0,
        filter(sequence(lit(1), n), i =>
          (i > 1 && element_at(sorted, i) === element_at(sorted, i - 1)) ||
            (i < n && element_at(sorted, i) === element_at(sorted, i + 1))))
        .otherwise(array().cast("array<int>"))
      val dupN = size(dupIdx).cast("long")
      val dupChars = aggregate(dupIdx, lit(0L),
        (a, i) => a + length(element_at(sorted, i)).cast("long"))
      val chars = aggregate(arr, lit(0L),
        (a, x) => a + length(x).cast("long"))
      (when(n > 0, floor(lit(10000L) * dupN / n)).otherwise(0L).cast("long"),
        when(chars > 0, floor(lit(10000L) * dupChars / chars))
          .otherwise(0L).cast("long"))
    }
    val (dupLineBp, dupLineCharBp) = dupStats(linesOf(col(textCol)))
    val (dupParaBp, dupParaCharBp) = dupStats(parasOf(col(textCol)))

    val base = df.select(col(idCol).cast("long").as("__id"), ws.as("__ws"))
    // one (doc, n, j, gram, charlen) row stream for all nine n values
    val gramStructs = flatten(transform(
      array((nsTop ++ nsDup).map(n => lit(n)): _*), n =>
        when(size(col("__ws")) >= n,
          transform(sequence(lit(0), size(col("__ws")) - n), j =>
            struct(n.cast("int").as("n"), j.cast("int").as("j"),
              array_join(slice(col("__ws"), j + 1, n), " ").as("g"),
              length(array_join(slice(col("__ws"), j + 1, n), ""))
                .cast("long").as("len"))))
          .otherwise(array().cast(
            "array<struct<n:int,j:int,g:string,len:bigint>>"))))
    val counts = base
      .select(col("__id"), explode(gramStructs).as("t"))
      .groupBy(col("__id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cnt"), first(col("t.len")).as("len"),
        collect_list(col("t.j")).as("js"))
    // top n-grams (n=2..4): max count, ties to the longest gram —
    // exactly max(struct(cnt, len)) ordering
    val tops = counts.where(col("n").isin(nsTop.map(Integer.valueOf): _*))
      .groupBy("__id", "n")
      .agg(max(struct(col("cnt"), col("len"))).as("m"))
      .groupBy("__id")
      .agg(max(when(col("n") === nsTop.head,
          when(col("m.cnt") >= 2, col("m.cnt") * col("m.len")).otherwise(0L)))
          .as(s"__topnum${nsTop.head}"),
        nsTop.tail.map(n => max(when(col("n") === n,
          when(col("m.cnt") >= 2, col("m.cnt") * col("m.len")).otherwise(0L)))
          .as(s"__topnum$n")): _*)
    // duplicated n-grams (n=5..10): position coverage
    val covPos = counts
      .where(col("cnt") >= 2 && col("n").isin(nsDup.map(Integer.valueOf): _*))
      .select(col("__id"), col("n"), explode(col("js")).as("j"))
      .select(col("__id"), col("n"),
        explode(sequence(col("j"), col("j") + col("n") - 1)).as("pos"))
      .distinct()
    val tokLens = base.select(col("__id"),
      posexplode(col("__ws")).as(Seq("pos", "w")))
      .select(col("__id"), col("pos"), length(col("w")).cast("long").as("wlen"))
    val dupCov = covPos.join(tokLens, Seq("__id", "pos"))
      .groupBy("__id")
      .agg(coalesce(sum(when(col("n") === nsDup.head, col("wlen"))), lit(0L))
          .as(s"__dupchars${nsDup.head}"),
        nsDup.tail.map(n => coalesce(sum(when(col("n") === n, col("wlen"))),
          lit(0L)).as(s"__dupchars$n")): _*)

    val withExpr = df
      .withColumn("__id", col(idCol).cast("long"))
      .withColumn("__totchars", totalChars)
      .withColumn("dup_line_bp", dupLineBp)
      .withColumn("dup_line_char_bp", dupLineCharBp)
      .withColumn("dup_para_bp", dupParaBp)
      .withColumn("dup_para_char_bp", dupParaCharBp)
    def bpOf(num: Column): Column =
      when(col("__totchars") > 0,
        floor(lit(10000L) * coalesce(num, lit(0L)) / col("__totchars")))
        .otherwise(0L).cast("long")
    val joined = withExpr
      .join(tops, Seq("__id"), "left")
      .join(dupCov, Seq("__id"), "left")
    val withTops = nsTop.foldLeft(joined) { (d, n) =>
      d.withColumn(s"top${n}_gram_bp", bpOf(col(s"__topnum$n")))
    }
    val withDups = nsDup.foldLeft(withTops) { (d, n) =>
      d.withColumn(s"dup${n}_gram_bp", bpOf(col(s"__dupchars$n")))
    }
    withDups
      .withColumn("keep",
        (col("dup_line_bp") <= 3000L && col("dup_para_bp") <= 3000L &&
          col("dup_line_char_bp") <= 2000L && col("dup_para_char_bp") <= 2000L &&
          col("top2_gram_bp") <= 2000L && col("top3_gram_bp") <= 1800L &&
          col("top4_gram_bp") <= 1600L &&
          col("dup5_gram_bp") <= 1500L && col("dup6_gram_bp") <= 1400L &&
          col("dup7_gram_bp") <= 1300L && col("dup8_gram_bp") <= 1200L &&
          col("dup9_gram_bp") <= 1100L && col("dup10_gram_bp") <= 1000L)
          .cast("long"))
      .drop("__id", "__totchars")
      .drop(nsTop.map(n => s"__topnum$n"): _*)
      .drop(nsDup.map(n => s"__dupchars$n"): _*)
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
