package graft.text

import graft.SparkSpec

class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("report goldens on a constructed corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1", "en"),
      (2L, "alpha  beta gamma ", "s1", "en"), // whitespace-variant dup of 1
      (3L, "delta epsilon", "s2", "de"),
      (4L, "zeta", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val r = DatasetCard.report(docs, "doc_id", "text", "source", "lang").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_tokens") == 3 + 3 + 2 + 1)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_langs") == 2L)
    // normalized identity collapses the whitespace variant
    assert(r.getAs[Long]("n_distinct_texts") == 3L)
    assert(r.getAs[Long]("dup_bp") == 2500L) // 1 of 4 docs is a dup
    assert(r.getAs[Long]("mean_quality_milli") > 0L)
  }

  test("report plans as one scan with no joins") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val plan = DatasetCard.report(docs, "doc_id", "text", "source", "lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("NULL text is a real document with its own identity, not dup mass") {
    val docs = Seq(
      (1L, "alpha", "s1", "en"),
      (2L, null: String, "s1", "en"),
      (3L, null: String, "s1", "en"), // second NULL text IS a dup of the first
      (4L, "beta", "s1", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val r = DatasetCard.report(docs, "doc_id", "text", "source", "lang").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    // identities: alpha, beta, NULL-sentinel → 3 distinct, 1 dup (2500 bp)
    assert(r.getAs[Long]("n_distinct_texts") == 3L)
    assert(r.getAs[Long]("dup_bp") == 2500L)
  }
}
