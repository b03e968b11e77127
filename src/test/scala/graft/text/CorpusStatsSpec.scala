package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tf-idf top terms: hand-computed golden on a tiny corpus") {
    // N=3 groups; df: apple 1, banana 2, cherry 2, date 1
    // idf_milli: floor(1000*ln(3))=1098, floor(1000*ln(1.5))=405
    val docs = Seq(
      ("g1", "apple apple banana"),
      ("g2", "banana cherry"),
      ("g3", "cherry cherry date date")
    ).toDF("source", "text")
    val got = CorpusStats.tfIdfTopTerms(docs, "text", "source", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("g1", 1, "apple", 2L, 2196L),  // 2 * 1098
      ("g1", 2, "banana", 1L, 405L),
      ("g2", 1, "banana", 1L, 405L),  // banana < cherry on the tf/score tie
      ("g2", 2, "cherry", 1L, 405L),
      ("g3", 1, "date", 2L, 2196L),
      ("g3", 2, "cherry", 2L, 810L)))
  }

  test("boilerplate coverage: hand-computed golden on a tiny corpus") {
    // "a b c d" appears in 3 docs (every 2-shingle of it has df >= 3);
    // doc 4 shares no shingle with anything; doc 5 is half boilerplate
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"),
      (4L, "x y z w"),
      (5L, "a b q r")     // shingles: "a b"(df4), "b q"(1), "q r"(1)
    ).toDF("doc_id", "text")
    val byId = CorpusStats.boilerplateCoverage(docs, "doc_id", "text",
        shingleSize = 2, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == (3L, 10000L)) // fully boilerplate
    assert(byId(4L) == (3L, 0L))     // fully unique
    assert(byId(5L) == (3L, 3333L))  // floor(1*10000/3)
  }

  test("boilerplate coverage: empty and sub-shingle docs score zero") {
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "solo"), (4L, "solo"))
      .toDF("doc_id", "text")
    val byId = CorpusStats.boilerplateCoverage(docs, "doc_id", "text", 3, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == (0L, 0L))       // no shingles at all
    // "solo" < 3 tokens → one whole-doc fingerprint, df = 3 → boilerplate
    assert(byId(2L) == (1L, 10000L))
  }
}
