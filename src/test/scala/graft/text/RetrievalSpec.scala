package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  test("bm25: hand-computed integer golden on a tiny corpus") {
    // D=3, T=9, A=floor(100*9/3)=300
    // idf_mn: apple df=1 -> floor(1000*ln(8/3))=980; cherry df=2 ->
    //   floor(1000*ln(8/5))=470
    // tfnorm_mn = floor(22000*tf*A / (10*tf*A + 3*A + 900*dl)):
    //   d1 apple  tf=2 dl=3 -> 13200000/9600  = 1375 (exact)
    //   d2 cherry tf=1 dl=2 -> 6600000/5700   = 1157 (floor)
    //   d3 cherry tf=3 dl=4 -> 19800000/13500 = 1466 (floor)
    val probes = Seq((10L, "apple cherry"), (20L, "durian"))
      .toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        probes, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (10L, 1, 1L, 980L * 1375L),   // 1347500
      (10L, 2, 3L, 470L * 1466L),   // 689020
      (10L, 3, 2L, 470L * 1157L)))  // 543790 — durian matches nothing
  }

  test("bm25: duplicate query terms count once (set semantics)") {
    val probes = Seq((10L, "cherry cherry cherry")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        probes, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((3L, 470L * 1466L), (2L, 470L * 1157L)))
  }

  test("bm25: empty corpus and NULL-text documents are harmless") {
    val probes = Seq((10L, "apple")).toDF("query_id", "qtext")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // exercises the ANSI div-by-zero guard on the broadcast totals row
    assert(Retrieval.bm25TopK(empty, "doc_id", "text",
      probes, "query_id", "qtext", k = 5).count() == 0L)
    val withNull = corpus.union(Seq((4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val got = Retrieval.bm25TopK(withNull, "doc_id", "text",
        probes, "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(2), r.getInt(1)))
    // the null doc produces no postings — only d1 contains apple
    assert(got.toSeq == Seq((1L, 1)))
  }

  test("bm25 on the real corpus: probes rediscover their source, ranks clean") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ts = TextFunctions.tokens(col("text"))
    val probes = docs.where(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id").as("query_id"), ts.as("ts"))
      .where(size(col("ts")) >= 9)
      .select(col("query_id"), array_join(slice(col("ts"), 2, 8), " ").as("qtext"))
    val nProbes = probes.count()
    assert(nProbes > 0, "fixture must yield at least one probe")
    val res = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qtext", k = 1000000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet.size == nProbes, "every probe matches something " +
      "(its own source document at minimum)")
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).toSeq,
        s"query $q: ranks must be contiguous from 1")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      }, s"query $q: (score desc, doc_id asc) order")
      assert(rows.exists(_._3 == q),
        s"query $q: the probe's own source document must be retrieved")
      assert(rows.forall(_._4 > 0L), s"query $q: scores are strictly positive")
    }
  }

  test("bm25 index: disjoint daily increments merge to the full-corpus result") {
    val probes = Seq((10L, "apple cherry")).toDF("query_id", "qtext")
    val merged = Retrieval.mergeBm25Index(
      Retrieval.bm25Index(corpus.where(col("doc_id") <= 2), "doc_id", "text"),
      Retrieval.bm25Index(corpus.where(col("doc_id") > 2), "doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val full = rows(Retrieval.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10))
    val inc = rows(Retrieval.bm25TopKFromIndex(merged._1, merged._2,
      probes, "query_id", "qtext", k = 10))
    assert(full.nonEmpty && inc == full,
      "delta-indexed + merged must equal the one-shot index")
  }

  test("rrf: hand-computed integer golden, absent-from-one-list docs fuse") {
    val a = Seq((1L, 100L, 1), (1L, 200L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 200L, 1), (1L, 300L, 2)).toDF("query_id", "doc_id", "rank")
    // pts: 100 -> 1000000//61 = 16393; 200 -> 1000000//62 + 1000000//61
    //   = 16129 + 16393 = 32522; 300 -> 16129
    val got = Retrieval.rrfFuse(a, b, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._2)
    assert(got == Seq(
      (1L, 1, 200L, 32522L),
      (1L, 2, 100L, 16393L),
      (1L, 3, 300L, 16129L)))
    // k cuts the fused list, not the inputs
    assert(Retrieval.rrfFuse(a, b, k = 1).count() == 1L)
  }

  test("rrf: fused-points ties break on ascending doc id") {
    val a = Seq((1L, 7L, 1), (1L, 3L, 1000000)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 9L, 1)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq.sortBy(_._1)
    // docs 7 and 9 tie at 16393 -> 7 first; doc 3's deep rank scores 0 pts
    assert(got == Seq((1, 7L), (2, 9L), (3, 3L)))
  }

  test("hard negatives: anchor excluded before ranking, ranks dense") {
    // same golden as the bm25 test, probe id = doc 1 (the anchor):
    // doc 1 would rank 1st at 1347500 but is excluded; the negatives
    // re-rank densely from 1
    val probes = Seq((1L, "apple cherry")).toDF("query_id", "qtext")
    val got = Retrieval.bm25HardNegatives(corpus, "doc_id", "text",
        probes, "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._2)
    assert(got == Seq(
      (1L, 1, 3L, 470L * 1466L),
      (1L, 2, 2L, 470L * 1157L)))
  }

  test("hard negatives on the real corpus: never the anchor, subset of unranked topK") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ts = TextFunctions.tokens(col("text"))
    val probes = docs.where(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id").as("query_id"), ts.as("ts"))
      .where(size(col("ts")) >= 9)
      .select(col("query_id"), array_join(slice(col("ts"), 2, 8), " ").as("qtext"))
    val neg = Retrieval.bm25HardNegatives(docs, "doc_id", "text",
      probes, "query_id", "qtext", k = 5)
    assert(neg.where(col("doc_id") === col("query_id")).count() == 0L,
      "the anchor document must never appear among its own negatives")
    // exclusion-then-rank == full ranking with the anchor dropped:
    // every negative appears in the k+1 unfiltered list at the same score
    val full = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qtext", k = 6)
      .select(col("query_id"), col("doc_id"), col("bm25_scaled"))
    assert(neg.join(full, Seq("query_id", "doc_id", "bm25_scaled"), "left_anti")
      .count() == 0L)
  }

  test("positive span pairs: deterministic half-split golden, short docs yield nothing") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),   // 9 tokens: anchor 4, positive 5
      (2L, "a b c d e f g h"),     // 8 tokens: anchor 4, positive 4
      (3L, "a b c d e f g"),       // 7 tokens: below minTokens, dropped
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Retrieval.positiveSpanPairs(docs, "doc_id", "text", minTokens = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a b c d", "e f g h i", 4L, 5L),
      (2L, "a b c d", "e f g h", 4L, 4L)))
    intercept[IllegalArgumentException] {
      Retrieval.positiveSpanPairs(docs, "doc_id", "text", minTokens = 1)
    }
  }

  test("positive span pairs: anchor + positive reassemble the tokenized document") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Retrieval.positiveSpanPairs(real, "doc_id", "text", minTokens = 8)
    val full = real.select(col("doc_id").as("id"),
      graft.text.TextFunctions.tokens(col("text")).as("fts"))
    val bad = pairs.join(full, Seq("id"))
      .where(concat(col("anchor_text"), lit(" "), col("positive_text")) =!=
          array_join(col("fts"), " ") ||
        col("n_anchor") + col("n_positive") =!= size(col("fts")).cast("long"))
    assert(bad.count() == 0, "halves must reassemble losslessly")
    assert(pairs.count() > 0)
  }

  test("hybrid IVF arm: same contract as the brute arm, recall floor holds") {
    val dir = "/root/testdata/sf0.001"
    val brute = graft.queries.Queries.q91HybridRrf(spark, dir)
      .select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.Queries.q111HybridIvf(spark, dir)
    // identical output contract (the "swaps in without touching the
    // fusion" promise): same columns, same per-query row count
    assert(ivf.columns.toSeq == Seq("query_id", "rank", "doc_id", "rrf_pts"))
    val ivfSet = ivf.select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && ivfSet.nonEmpty)
    // nProbe=4 over TRAINED centroids (stride-16 seed + 2 Lloyd
    // rounds): the IVF arm sees a cell subset, so fused top-10s drift —
    // but must stay mostly the brute result (the lexical arm is
    // identical; only semantic candidates differ). Measured 0.68 on
    // this fixed corpus with trained centroids (0.66 with the raw
    // stride seed — the fusion dampens the pure-ANN uplift AnnSpec
    // measures, since half the points come from the unchanged BM25
    // arm); the floor guards against a probe or fusion regression,
    // not the exact value
    val recall = ivfSet.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.65, f"hybrid-IVF recall vs brute fusion: $recall%.3f < 0.65")
  }

  test("guards: invalid k / k0 fail fast") {
    val probes = Seq((10L, "apple")).toDF("query_id", "qtext")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", probes, "query_id", "qtext", 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25HardNegatives(corpus, "doc_id", "text", probes, "query_id", "qtext", 0)
    }
    val l = Seq((1L, 2L, 1)).toDF("query_id", "doc_id", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(l, l, k = 0) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(l, l, k = 1, k0 = 0) }
  }
}
