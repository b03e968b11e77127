package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def gopher(text: String) =
    QualityRules.gopherRules(Seq((1L, text)).toDF("id", "text"), "text")
      .collect()(0)

  test("gopher rules: each measure and each failure mode") {
    // a healthy document: 50+ short words with stop-word evidence
    val good = (("the quick fox and that dog have fun with logs of wood " * 5)
      + "end word pad " * 3).trim
    val g = gopher(good)
    assert(g.getAs[Long]("n_words") >= 50 && g.getAs[Long]("keep") == 1, g.toString)
    // too few words
    assert(gopher("the and that have tiny doc").getAs[Long]("keep") == 0)
    // symbol ratio: half the words carry '#'
    val symb = ("tag# " + "the and that have with of be to plain word " * 5).trim +
      (" x# y# z# w# v# u# t# s# r# q#" * 3)
    val gs = gopher(symb)
    assert(gs.getAs[Long]("symbol_bp") > 1000 && gs.getAs[Long]("keep") == 0)
    // bullet lines: every line a bullet -> bullet_bp = 10000
    val bullets = (1 to 60).map(i => s"- the item $i and that").mkString("\n")
    val gb = gopher(bullets)
    assert(gb.getAs[Long]("bullet_bp") == 10000 && gb.getAs[Long]("keep") == 0)
    // ellipsis lines past 30%
    val ell = (1 to 10).map(i => s"the line $i trails off...").mkString("\n") +
      "\nthe one and only plain line with that have of be to" + (" word" * 45)
    val ge = gopher(ell)
    assert(ge.getAs[Long]("ellipsis_bp") > 3000 && ge.getAs[Long]("keep") == 0)
    // numeric soup fails the alphabetic-word rule
    val nums = ("the and that have with of be to " + ("1234 " * 60)).trim
    val gn = gopher(nums)
    assert(gn.getAs[Long]("alpha_bp") < 8000 && gn.getAs[Long]("keep") == 0)
    // no stop-word evidence
    val alien = ("zork plugh xyzzy quux " * 15).trim
    val ga = gopher(alien)
    assert(ga.getAs[Long]("n_stop_hits") < 2 && ga.getAs[Long]("keep") == 0)
    // empty / NULL text: zeroed measures, keep 0
    assert(gopher("").getAs[Long]("keep") == 0)
    val nul = QualityRules.gopherRules(
      Seq((1L, null.asInstanceOf[String])).toDF("id", "text"), "text").collect()(0)
    assert(nul.getAs[Long]("n_words") == 0 && nul.getAs[Long]("keep") == 0)
  }

  private def c4(text: String) =
    QualityRules.c4Clean(Seq((1L, text)).toDF("id", "text"), "text")
      .collect()(0)

  test("c4 cleaning: line retention, page drops, rebuild") {
    val page = Seq(
      "this first line ends properly.",
      "no terminal punctuation so dropped",
      "drop the javascript included line.",
      "two words.",
      "a quoted line can end like this\"",
      "and an exclamation works too!").mkString("\n")
    val r = c4(page)
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("n_kept") == 3 && r.getAs[Long]("keep") == 1)
    assert(r.getAs[String]("clean_text") == Seq(
      "this first line ends properly.",
      "a quoted line can end like this\"",
      "and an exclamation works too!").mkString("\n"))
    // page drops: lorem ipsum anywhere, '{' anywhere, or nothing kept
    assert(c4("a fine line stays here.\nsome Lorem Ipsum filler.")
      .getAs[Long]("keep") == 0)
    assert(c4("a fine line stays here.\nvar f = function() { return; }")
      .getAs[Long]("keep") == 0)
    val none = c4("nothing here ends with punctuation\nnor here")
    assert(none.getAs[Long]("keep") == 0 && none.getAs[String]("clean_text") == "")
    // whitespace-only lines never count
    assert(c4("   \none real kept line here.\n   ").getAs[Long]("n_lines") == 1)
  }

  test("readability heuristics: syllable groups, sentence runs, FK goldens") {
    def syl(w: String): Long = Seq(w).toDF("w")
      .select(TextFunctions.syllableCount(col("w"))).collect()(0).getLong(0)
    assert(syl("beautiful") == 3)  // eau, i, u
    assert(syl("rhythm") == 1)     // y
    assert(syl("crwth") == 1)      // no vowel groups -> floor 1
    assert(syl("aeiou") == 1)      // one maximal group
    assert(syl("banana") == 3)
    def sen(t: String): Long = Seq(t).toDF("t")
      .select(TextFunctions.sentenceCount(col("t"))).collect()(0).getLong(0)
    assert(sen("one. two! three?") == 3)
    assert(sen("ellipsis... still one run. and two") == 2)
    assert(sen("no terminal punctuation") == 1) // floored denominator
    // FK formula golden: 12 words, 2 sentences, 16 syllables ->
    // floor(390*12/2) + floor(11800*16/12) - 15590 = 2340+15733-15590
    val t = "the cat sat on the mat today. the happy dog ran around."
    val r = Seq((1L, t)).toDF("doc_id", "text")
    val ts = TextFunctions.tokens(col("text"))
    val row = r.select(
        size(ts).cast("long").as("w"),
        TextFunctions.sentenceCount(col("text")).as("s"),
        aggregate(transform(ts, w => TextFunctions.syllableCount(w)),
          lit(0L), (a, x) => a + x).as("sy"))
      .collect()(0)
    assert(row.getLong(0) == 12 && row.getLong(1) == 2)
    info(s"syllables=${row.getLong(2)}")
    val fk = 390L * row.getLong(0) / row.getLong(1) +
      11800L * row.getLong(2) / row.getLong(0) - 15590L
    assert(fk == 390 * 12 / 2 + 11800 * row.getLong(2) / 12 - 15590)
  }

  test("gopher repetition: each measure pinned by hand goldens") {
    def rep(text: String): Map[String, Long] = {
      val d = QualityRules.gopherRepetition(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      val r = d.collect()(0)
      d.columns.filter(c => c.endsWith("_bp") || c == "keep")
        .map(c => c -> r.getAs[Long](c)).toMap
    }
    // duplicated lines: "aa" twice + "b" once -> 2/3 occurrences dup,
    // chars 4/5 dup; the space-split tokenizer sees ONE token (the
    // text has no spaces), so no 2-grams exist -> 0
    val r1 = rep("aa\naa\nb")
    assert(r1("dup_line_bp") == 6666L && r1("dup_line_char_bp") == 8000L)
    assert(r1("dup_para_bp") == 0L, "one paragraph (no \\n\\n) cannot dup")
    assert(r1("top2_gram_bp") == 0L)
    assert(r1("keep") == 0L) // dup_line over 3000
    // duplicated paragraphs: same value twice across a blank line
    val r2 = rep("pq rs\n\npq rs")
    assert(r2("dup_para_bp") == 10000L && r2("dup_para_char_bp") == 10000L)
    // the two lines "pq rs" also dup
    assert(r2("dup_line_bp") == 10000L)
    // top 2-gram: "x y" occurs 3 times in "x y x y x y" (overlapping
    // "y x" occurs 2); chars: top = 3 occ x 2 chars = 6 of 6 total
    val r3 = rep("x y x y x y")
    assert(r3("top2_gram_bp") == 10000L)
    // 5-gram coverage: "a b c d e a b c d e" — the 5-gram "a b c d e"
    // occurs twice, covering ALL 10 positions exactly once each
    // (position coverage cannot double count); 4-gram top = "a b c d"
    // (or peers) count 2 x 4 chars = 8/10 chars
    val r4 = rep("a b c d e a b c d e")
    assert(r4("dup5_gram_bp") == 10000L)
    // the five 6-grams spanning the seam are all DISTINCT (each a
    // different rotation) — two copies repeat only up to the 5-gram
    assert(r4("dup6_gram_bp") == 0L)
    assert(r4("top4_gram_bp") == 8000L)
    assert(r4("keep") == 0L)
    // the full 10-gram occurs once: a unique gram is not repetition
    assert(r4("dup10_gram_bp") == 0L)
    // char weighting: "aaa v" twice = 2 occ x 4 chars over 8 chars
    val r5 = rep("aaa v aaa v")
    assert(r5("top2_gram_bp") == 10000L)
    // a calm page keeps
    val calm = rep("the quick brown fox jumps over a lazy dog near town\n" +
      "every word here appears once so nothing repeats at all today")
    assert(calm.filterNot(_._1 == "keep").values.forall(_ == 0L))
    assert(calm("keep") == 1L)
    // empty/NULL-ish text: all zeros, keep 1 (repetition of nothing)
    val empty = rep("")
    assert(empty.values.filterNot(_ == 1L).forall(_ == 0L) && empty("keep") == 1L)
  }

  test("rules are pure column expressions over the corpus (no driver logic)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = QualityRules.gopherRules(docs, "text")
    assert(g.count() == docs.count(), "every document surfaces with its measures")
    assert(g.where($"keep" === 1 || $"keep" === 0).count() == docs.count())
    val c = QualityRules.c4Clean(docs, "text")
    assert(c.count() == docs.count())
    // cleaning is idempotent on its own output for kept pages: kept
    // lines still satisfy the line rules
    val again = QualityRules.c4Clean(
      c.where($"keep" === 1).select($"doc_id", $"clean_text".as("text")), "text")
    assert(again.where($"n_kept" =!= $"n_lines").count() == 0,
      "every kept line must survive a second cleaning pass")
  }
}
