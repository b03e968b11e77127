package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("unigram surprisal: rare tokens score high, boilerplate low, golden values") {
    // corpus: "common" appears 8 times, "rare" once, "mid" twice.
    // total tokens = 11.
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common common"),
      (3L, "rare mid"),
      (4L, "mid")).toDF("doc_id", "text")
    val out = CorpusStats.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def s(totalOverC: Double): Long = math.floor(1000.0 * math.log(totalOverC)).toLong
    val sCommon = s(11.0 / 8)  // 318
    val sRare = s(11.0 / 1)    // 2397
    val sMid = s(11.0 / 2)     // 1704
    assert(out(1L) == ((4L, sCommon)))
    assert(out(2L) == ((4L, sCommon)))
    assert(out(3L) == ((2L, (sRare + sMid) / 2)))
    assert(out(4L) == ((1L, sMid)))
    // ordering property: the boilerplate doc scores strictly lower than
    // the rare-token doc
    assert(out(1L)._2 < out(3L)._2)
  }

  test("bigram surprisal: predictable transitions score low, golden values, short docs absent") {
    // corpus bigrams: (a,b)×3 from doc 1, (a,b) (b,c) from doc 2,
    // (x,y) from doc 3 → prefix a: cb(a,b)=4/cp=4 (certain transition),
    // prefix b: (b,a)×2 (b,c)×1 → cp=3, prefix x: cp=1
    val docs = Seq(
      (1L, "a b a b a b"),  // bigrams: ab ba ab ba ab
      (2L, "a b c"),        // ab bc
      (3L, "x y"),          // xy
      (4L, "solo"))         // no bigrams → absent
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(4L), "single-token doc must have no bigram score")
    def s(cpOverCb: Double): Long = math.floor(1000.0 * math.log(cpOverCb)).toLong
    // corpus: cb(a,b)=4 cp(a)=4; cb(b,a)=2 cb(b,c)=1 cp(b)=3; cb(x,y)=1 cp(x)=1
    val sAB = s(4.0 / 4); val sBA = s(3.0 / 2); val sBC = s(3.0 / 1); val sXY = s(1.0 / 1)
    assert(out(1L) == ((5L, (3 * sAB + 2 * sBA) / 5)))
    assert(out(2L) == ((2L, (sAB + sBC) / 2)))
    assert(out(3L) == ((1L, sXY)))
    // the repetitive doc's transitions are more predictable than doc 2's
    assert(out(1L)._2 < out(2L)._2)
  }

  test("bigram surprisal is partitioning-invariant on the real corpus") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val a = CorpusStats.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = CorpusStats.bigramSurprisal(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("surprisal is reproducible and total-token count matches tokenization") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val a = CorpusStats.unigramSurprisal(docs, "doc_id", "text")
    val b = CorpusStats.unigramSurprisal(docs.repartition(7), "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "surprisal must not depend on input partitioning")
    val nTok = a.agg(sum($"n_tokens")).head().getLong(0)
    val direct = docs.select(TextFunctions.tokenCount($"text").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(nTok == direct)
  }

  test("bigram NLL: hand golden, OOV at ln(V), smoothing, short docs at zero") {
    import org.apache.spark.sql.functions._
    // reference (even ids): "a b a b" and "a c" -> V = 3 {a, b, c};
    // c1: a=3, b=2, c=1; c2: (a,b)=2, (b,a)=1, (a,c)=1
    val docs = Seq(
      (0L, "a b a b"), (2L, "a c"),
      (1L, "a b x"), // scored: (a,b) known, (b,x) OOV w2
      (3L, "z q"), // OOV w1: floor(1000 ln((0+3)/(0+1))) = 1098
      (5L, "solo")) // 1 token -> 0 pairs
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramNll(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: (a,b): floor(1000 ln((3+3)/(2+1))) = floor(1000 ln 2) = 693
    //        (b,x): floor(1000 ln((2+3)/(0+1))) = floor(1000 ln 5) = 1609
    assert(out(1L) == ((2L, 693L + 1609L, (693L + 1609L) / 2)), s"${out(1L)}")
    assert(out(3L) == ((1L, 1098L, 1098L)), s"${out(3L)}")
    assert(out(5L) == ((0L, 0L, 0L)))
    // the reference's own docs score too (self-scoring is in-domain-low):
    // doc 2 "a c": (a,c) = floor(1000 ln((3+3)/(1+1))) = floor(1000 ln 3) = 1098
    assert(out(2L) == ((1L, 1098L, 1098L)))
    // partitioning-invariant (the count shuffles + single-row broadcast)
    val again = CorpusStats.bigramNll(docs.repartition(5), "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(_.toString).sorted.toSeq
    val base = CorpusStats.bigramNll(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(_.toString).sorted.toSeq
    assert(again == base)
  }
}
