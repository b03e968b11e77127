package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val dd = Bpe.D + Bpe.D

  private def segMap(segs: org.apache.spark.sql.DataFrame): Map[String, String] =
    segs.collect().map(r => r.getString(0) -> r.getString(2)).toMap

  test("viterbi: hand-computed DP with score, count, and lexicographic tie-breaks") {
    val words = Seq(("abab", 1L), ("abc", 1L), ("aa", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", -1000L), ("b", -1500L), ("c", -3000L),
      ("ab", -1200L), ("abab", -2000L)).toDF("piece", "s")
    val out = UnigramLm.viterbiSegments(words, vocab, maxPieceLen = 5)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // aa: a·a = -2000 (no 'aa' piece); abab: the whole-word piece -2000
    // beats ab·ab -2400; abc: ab·c -4200 beats a·b·c -5500
    assert(out.toSeq == Seq(
      ("aa", s"a${dd}a", 2L, -2000L),
      ("abab", "abab", 1L, -2000L),
      ("abc", s"ab${dd}c", 2L, -4200L)))
    // score tie resolved by FEWER pieces: xy as one piece vs x·y, equal
    // totals -> the single piece wins
    val tie = UnigramLm.viterbiSegments(
      Seq(("xy", 1L)).toDF("word", "freq"),
      Seq(("x", -500L), ("y", -500L), ("xy", -1000L)).toDF("piece", "s"), 5)
    assert(segMap(tie)("xy") == "xy")
    // score+count tie resolved by LEXICOGRAPHIC segmentation: ab·cd vs
    // abc·d, both 2 pieces at equal total -> "ab<dd>cd" < "abc<dd>d"
    // because chr(31) sorts below 'c'
    val lex = UnigramLm.viterbiSegments(
      Seq(("abcd", 1L)).toDF("word", "freq"),
      Seq(("ab", -1000L), ("cd", -1000L), ("abc", -1000L), ("d", -1000L))
        .toDF("piece", "s"), 5)
    assert(segMap(lex)("abcd") == s"ab${dd}cd")
    // a word with a character outside the vocabulary surfaces with a
    // NULL seg (kept), never a crash or a silent drop
    val miss = UnigramLm.viterbiSegments(
      Seq(("azb", 1L)).toDF("word", "freq"),
      Seq(("a", -1000L), ("b", -1000L)).toDF("piece", "s"), 5)
    val row = miss.collect()(0)
    assert(row.isNullAt(2) && row.getLong(3) == 0L)
  }

  test("learn: end-to-end golden on a tiny corpus") {
    // corpus: "ab ab ab cd" -> types ab(3) cd(1); chars a,b,c,d + multi
    // pieces ab(3), cd(1) in the seed
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val (vocab, segs) = UnigramLm.learn(docs, "text")
    val v = vocab.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // seed counts: a=3 b=3 c=1 d=1 ab=3 cd=1, total 12
    // seed scores: ab = floor(1000*ln(3/12)) = -1387; a = -1387; the
    // whole-word piece always wins Viterbi (fewer pieces at >= score:
    // s(ab) >= s(a)+s(b) since probabilities < 1), so usage: ab=3 cd=1,
    // chars 0
    assert(v.keySet == Set("a", "b", "c", "d", "ab", "cd"))
    assert(v("ab")._1 == 3L && v("cd")._1 == 1L)
    assert(v("a")._1 == 0L && v("d")._1 == 0L)
    // final scores: add-1 over kept (U=4, V=6): ab -> floor(1000*ln(4/10)),
    // cd -> floor(1000*ln(2/10)), chars -> floor(1000*ln(1/10))
    assert(v("ab")._2 == math.floor(1000.0 * math.log(4.0 / 10.0)).toLong)
    assert(v("cd")._2 == math.floor(1000.0 * math.log(2.0 / 10.0)).toLong)
    assert(v("a")._2 == math.floor(1000.0 * math.log(1.0 / 10.0)).toLong)
    val sm = segMap(segs)
    assert(sm("ab") == "ab" && sm("cd") == "cd")
  }

  test("learn: segmentations always concatenate back to the word; encode round-trips") {
    val docs = Seq(
      (1L, "internationalization is not localization"),
      (2L, "international nation nationalization zone"),
      (3L, "the nation of internationalization"),
      (4L, "")).toDF("doc_id", "text")
    val (vocab, segs) = UnigramLm.learn(docs, "text")
    segs.collect().foreach { r =>
      assert(r.getString(2) != null, s"training word must be coverable: ${r.getString(0)}")
      assert(r.getString(2).replace(dd, "") == r.getString(0),
        s"seg must concatenate to the word: ${r.getString(0)}")
    }
    // chars always kept; every piece no longer than maxPieceLen
    val pieces = vocab.collect().map(_.getString(0))
    assert(pieces.forall(_.length <= 5))
    val enc = Bpe.encode(docs, "doc_id", "text", segs)
    assert(enc.count() == 4L, "every doc surfaces, including the empty one")
    val e = enc.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(e(4L) == "")
    assert(e(3L).replace(" ", "") == "thenationofinternationalization")
  }

  test("learnFromCounts: merged daily increments == one-shot union (the Bpe discipline)") {
    val a = Seq((1L, "alpha beta alpha"), (2L, "gamma beta")).toDF("doc_id", "text")
    val b = Seq((3L, "alpha delta delta"), (4L, "beta gamma alpha")).toDF("doc_id", "text")
    val union = a.unionByName(b)
    val oneShot = UnigramLm.learnFromCounts(Bpe.wordCounts(union, "text"))
    val folded = UnigramLm.learnFromCounts(
      Bpe.mergeWordCounts(Bpe.wordCounts(a, "text"), Bpe.wordCounts(b, "text")))
    assert(oneShot._1.collect().map(_.toString).sorted.toSeq ==
      folded._1.collect().map(_.toString).sorted.toSeq)
    assert(oneShot._2.collect().map(_.toString).sorted.toSeq ==
      folded._2.collect().map(_.toString).sorted.toSeq)
  }

  test("learn: empty and all-NULL corpora yield empty frames, not crashes") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (v0, s0) = UnigramLm.learn(empty, "text")
    assert(v0.isEmpty && s0.isEmpty)
    val nulls = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val (v1, s1) = UnigramLm.learn(nulls, "text")
    assert(v1.isEmpty && s1.isEmpty)
    // encode over an empty segmentation table still surfaces every doc
    val enc = Bpe.encode(nulls, "doc_id", "text", s1)
    assert(enc.count() == 2 && enc.where(col("sub_str") =!= "").isEmpty)
  }

  test("encode of NEW text: unseen words segment by maximum likelihood, not chars") {
    // train where "inter", "national" become strong pieces, then encode
    // a corpus containing the UNSEEN word "internationalize"
    val train = Seq(
      (1L, "inter inter inter inter national national national national"),
      (2L, "inter national inter national")).toDF("doc_id", "text")
    val cfg = UnigramLm.Config(maxPieceLen = 8, seedMulti = 50, vocabMulti = 20)
    val (vocab, trainSegs) = UnigramLm.learn(train, "text", cfg)
    val fresh = Seq((9L, "international inter")).toDF("doc_id", "text")
    val enc = UnigramLm.encode(fresh, "doc_id", "text", vocab, cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "international" never occurred as a word type, but its ML
    // segmentation under the vocabulary is inter + national — the char
    // fallback would emit 13 single letters
    assert(enc(9L) == "inter national inter", s"got: ${enc(9L)}")
    // on the TRAINING corpus, encode-under-vocab == encode-with-the-
    // learned-segmentation-frame (same Viterbi, same scores)
    val a = UnigramLm.encode(train, "doc_id", "text", vocab, cfg)
      .collect().map(_.toString).sorted.toSeq
    val b = Bpe.encode(train, "doc_id", "text", trainSegs)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // out-of-vocabulary CHARS still fall back to chars, docs all surface
    val alien = Seq((5L, "inter zzz99"), (6L, "")).toDF("doc_id", "text")
    val e2 = UnigramLm.encode(alien, "doc_id", "text", vocab, cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(e2(5L).startsWith("inter z z z"), s"got: ${e2(5L)}")
    assert(e2(6L) == "")
  }

  test("learn at a real vocabulary scale stays two Viterbi passes (bounded time)") {
    // a synthetic corpus with thousands of word types: learning cost
    // must stay corpus-INDEPENDENT in pass count (seed agg + 2 Viterbi
    // passes + prune — no per-piece driver loop, the contrast with
    // BPE's per-merge rounds)
    val docs = (0 until 4000).map { i =>
      (i.toLong, s"prefix${i % 97}mid${i % 53}suffix${i % 31} " +
        s"common shared tokens ride along w${i % 701}x")
    }.toDF("doc_id", "text")
    val cfg = UnigramLm.Config(maxPieceLen = 8, seedMulti = 2000, vocabMulti = 1000)
    val t0 = System.nanoTime()
    val (vocab, segs) = UnigramLm.learn(docs, "text", cfg)
    val nVocab = vocab.count()
    val nTypes = segs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(nTypes > 1500, s"fixture degenerate: only $nTypes word types")
    assert(nVocab > 100)
    // generous local bound — the point is no per-piece iteration blowup
    assert(secs < 120.0, s"2k-seed/1k-vocab learn took $secs s")
    segs.collect().foreach(r =>
      assert(r.getString(2).replace(dd, "") == r.getString(0)))
  }

  test("learn: prune cut is deterministic under usage ties and respects vocabMulti") {
    // many equal-usage bigrams: the cut must break ties on piece asc
    val docs = Seq((1L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val cfg = UnigramLm.Config(maxPieceLen = 3, seedMulti = 50, vocabMulti = 3)
    val (vocab, _) = UnigramLm.learn(docs, "text", cfg)
    val multi = vocab.collect().map(_.getString(0)).filter(_.length > 1).sorted.toSeq
    assert(multi == Seq("aa", "bb", "cc"),
      s"equal-usage prune must keep the lexicographically first 3, got $multi")
  }
}
