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
}
