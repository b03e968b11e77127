package graft

import org.apache.spark.sql.functions._

/** Empty-corpus sweep over the round-4 operator batch: every operator
  * must return an empty (correctly-typed) frame on empty input, never
  * throw — the degenerate case every incremental/streaming caller hits
  * on a quiet micro-batch or a fresh corpus. (Per-operator NULL and
  * guard behavior lives in the operators' own specs; this is the one
  * sweep asserting the shared zero-rows contract.)
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("round-4 operators are empty-corpus safe") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val srcDocs = Seq.empty[(String, String)].toDF("source", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val assign = Seq.empty[(Long, String)].toDF("doc_id", "split")
    val clusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val probes = Seq.empty[(Long, String)].toDF("query_id", "qtext")
    val scored = Seq.empty[(Long, Long)].toDF("id", "score")

    assert(graft.dedup.Dedup.editVerifiedPairs(docs, "doc_id", "text", pairs, 9000L).count() == 0)
    assert(graft.dedup.Dedup.canonicalByQuality(docs, "doc_id", "text", clusters).count() == 0)
    assert(graft.dedup.Dedup.crossSplitPairs(pairs, assign).count() == 0)
    assert(graft.dedup.Dedup.winnowedFingerprints(docs, "doc_id", "text", 5, 4).count() == 0)
    assert(graft.dedup.Dedup.winnowedOverlapPairs(docs, docs, "doc_id", "text", 5, 4, 1L).count() == 0)
    assert(graft.text.Retrieval.bm25HardNegatives(docs, "doc_id", "text",
      probes, "query_id", "qtext", 5).count() == 0)
    assert(graft.text.Retrieval.positiveSpanPairs(docs, "doc_id", "text", 8).count() == 0)
    assert(graft.text.CorpusStats.temperatureWeights(srcDocs, "source", "text", 700L).count() == 0)
    assert(graft.text.CorpusStats.lengthProfile(srcDocs, "source", "text").count() == 0)
    assert(graft.text.CorpusStats.bigramPmiTop(docs, "text", 5, 1L).count() == 0)
    assert(graft.text.CorpusStats.encodeTopV(docs, "doc_id", "text", 4).count() == 0)
    assert(graft.ops.ScaleOps.curriculumStages(scored, "score", 4).count() == 0)
    val embs = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    assert(embs.select(graft.ann.Ann.randomProject(col("v"), 8, 4).as("p")).count() == 0)
    assert(docs.select(graft.text.TextFunctions.blocklistHitsFrom(
      graft.text.TextFunctions.tokens(col("text")), Seq("x")).as("h")).count() == 0)
    // the FULLY empty corpus short-circuits to an empty frame before the
    // one-class guard can evaluate (empty-relation propagation prunes
    // the prior subtree) — consistent with this sweep's contract; the
    // guard fires on NONEMPTY one-class corpora (ClassifierSpec).
    val labeled = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "y")
    assert(graft.text.CorpusStats.naiveBayesQuality(labeled, "doc_id", "text", "y")
      .count() == 0)
  }

  test("round-5 surfaces: empty/no-match inputs stay empty, not crashed") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val real = Seq((1L, "alpha bravo charlie delta"),
      (2L, "echo foxtrot golf hotel")).toDF("doc_id", "text")

    // BPE: empty corpus learns nothing, encodes nothing; a nonempty
    // corpus encoded against an EMPTY segmentation table falls back to
    // character segmentation for every word
    val (m0, s0) = graft.text.Bpe.learn(docs, "text", numMerges = 5)
    assert(m0.isEmpty && s0.count() == 0)
    assert(graft.text.Bpe.mergeTable(docs, "text", 5).count() == 0)
    val fb = graft.text.Bpe.encode(real, "doc_id", "text", s0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fb(1L) == "a l p h a b r a v o c h a r l i e d e l t a")

    // selectTokenBudgetBy: empty data frame with nonempty budgets
    val noRows = Seq.empty[(String, Long, Long, Long)].toDF("src", "id", "score", "n_tok")
    val buds = Seq(("a", 5L)).toDF("src", "token_budget")
    assert(graft.ops.ScaleOps.selectTokenBudgetBy(
      noRows, "id", "score", "n_tok", "src", buds).count() == 0)

    // disk indexes: probes that match nothing return empty frames
    val dir = java.nio.file.Files.createTempDirectory("edge").toString
    try {
      graft.text.Bm25DiskIndex.write(real, "doc_id", "text", s"$dir/bm", numBuckets = 8)
      val missProbe = Seq((9L, "zulu yankee")).toDF("query_id", "qtext")
      assert(graft.text.Bm25DiskIndex.probeTopK(spark, s"$dir/bm",
        missProbe, "query_id", "qtext", 5).count() == 0)
      graft.dedup.LshDiskIndex.write(real, "doc_id", "text", s"$dir/lsh", numBuckets = 8)
      val farDelta = Seq((30L, "unrelated words entirely different content here"))
        .toDF("doc_id", "text")
      assert(graft.dedup.LshDiskIndex.probe(spark, s"$dir/lsh",
        farDelta, "doc_id", "text", 0.8).count() == 0)
    } finally { graft.io.Lake.delete(spark, dir) }
  }

  test("one-document corpora do not degenerate (pairs empty, per-doc ops emit)") {
    val one = Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel india")).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.winnowedFingerprints(one, "doc_id", "text", 5, 4).count() > 0)
    assert(graft.text.Retrieval.positiveSpanPairs(one, "doc_id", "text", 8).count() == 1)
    assert(graft.text.CorpusStats.encodeTopV(one, "doc_id", "text", 4).count() == 1)
    // a single doc is its own BM25 match — and its own only hard-negative exclusion
    val probe = Seq((1L, "bravo charlie")).toDF("query_id", "qtext")
    assert(graft.text.Retrieval.bm25HardNegatives(one, "doc_id", "text",
      probe, "query_id", "qtext", 5).count() == 0)
    // curriculum over one row: single stage
    val s1 = Seq((1L, 42L)).toDF("id", "score")
    val st = graft.ops.ScaleOps.curriculumStages(s1, "score", 4).collect()
    assert(st.length == 1 && st.head.getLong(2) == 1L)
  }
  test("round-7 surfaces: empty/degenerate inputs stay sane") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val noMedia = Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload")
    val junk = Seq((1L, Array.emptyByteArray), (2L, Array[Byte](1, 2, 3)),
      (3L, null: Array[Byte])).toDF("media_id", "payload")

    // container walks: empty frames stay empty; junk payloads are
    // container-level ok=0 rows, never crashes
    assert(graft.multimodal.Containers.decodeWarc(noMedia).count() == 0)
    assert(graft.multimodal.Containers.decodeTar(noMedia).count() == 0)
    assert(graft.multimodal.Containers.decodeWarc(junk).toDF()
      .where($"ok" =!= 0).isEmpty)
    assert(graft.multimodal.Containers.decodeTar(junk).toDF()
      .where($"ok" =!= 0).isEmpty)
    assert(graft.multimodal.Containers.warcCorpusFromDocuments(
      empty.select($"doc_id", $"text")).count() == 0)

    // perceptual hashes: junk -> ok=0; empty hash frames pair to nothing
    assert(graft.multimodal.Multimodal.decodePngPHash(junk).toDF()
      .where($"ok" =!= 0).isEmpty)
    assert(graft.multimodal.Multimodal.decodeWavFingerprint(junk).toDF()
      .where($"ok" =!= 0).isEmpty)
    val noHashes = Seq.empty[(Long, Long)].toDF("media_id", "phash")
    assert(graft.dedup.Dedup.hammingNearDupPairs(
      noHashes, "media_id", "phash", 64, 5, bands = 8).count() == 0)

    // rule recipes: empty corpus stays empty; every-doc contract holds
    assert(graft.text.QualityRules.gopherRules(empty, "text").count() == 0)
    assert(graft.text.QualityRules.c4Clean(empty, "text").count() == 0)

    // tokenizer store: an empty count state learns an empty artifact
    // and serves the every-document-surfaces encode contract
    val dir = java.nio.file.Files.createTempDirectory("edge7").toString
    try {
      graft.text.TokenizerStore.appendCounts(
        Seq.empty[(String, Long)].toDF("word", "freq"), dir)
      assert(graft.text.TokenizerStore.refresh(spark, dir, "v0", 4) == 0)
      graft.text.TokenizerStore.setCurrentVersion(spark, dir, "v0")
      val enc = graft.text.TokenizerStore.encode(
        Seq((1L, "unseen words here")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
      // empty vocabulary -> pure char fallback, doc still surfaces
      assert(enc.count() == 1)
      assert(enc.collect()(0).getAs[Long]("n_sub") > 0)
    } finally { graft.io.Lake.delete(spark, dir) }
  }

  test("round-6 surfaces: empty/degenerate inputs stay sane") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val real = Seq((1L, "alpha bravo charlie delta"),
      (2L, "echo foxtrot golf hotel")).toDF("doc_id", "text")

    // modality decodes: empty media frames decode to empty frames;
    // zero-byte and garbage payloads surface as format="unknown"
    val noMedia = Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload")
    assert(graft.multimodal.Multimodal.decodePngPixelStats(noMedia).count() == 0)
    assert(graft.multimodal.Multimodal.decodeWavSampleStats(noMedia).count() == 0)
    val junk = Seq((1L, Array.emptyByteArray), (2L, Array[Byte](1, 2, 3)),
      (3L, null: Array[Byte])).toDF("media_id", "payload")
    assert(graft.multimodal.Multimodal.decodePngPixelStats(junk).toDF()
      .where($"format" =!= "unknown").isEmpty)
    assert(graft.multimodal.Multimodal.decodeWavSampleStats(junk).toDF()
      .where($"format" =!= "unknown").isEmpty)

    // empty generators from an empty documents table
    assert(graft.multimodal.Multimodal.pngPixelCorpusFromDocuments(empty).count() == 0)
    assert(graft.multimodal.Multimodal.wavPcmCorpusFromDocuments(empty).count() == 0)

    val dir = java.nio.file.Files.createTempDirectory("edge6").toString
    try {
      // retire + same-seq re-append of an indexed doc's EXACT text:
      // stats return to the starting point, probes identical (the
      // retire contract — unindexed/stale-text retires subtract blind
      // and are a documented caller violation)
      graft.text.Bm25DiskIndex.write(real, "doc_id", "text", s"$dir/bm", numBuckets = 4)
      val probe = Seq((9L, "alpha bravo")).toDF("query_id", "qtext")
      val before = graft.text.Bm25DiskIndex.probeTopK(spark, s"$dir/bm",
        probe, "query_id", "qtext", 5).collect().map(_.toString).sorted.toSeq
      val doc1 = real.where($"doc_id" === 1L)
      graft.text.Bm25DiskIndex.retire(doc1, "doc_id", "text", s"$dir/bm", seq = 2L)
      graft.text.Bm25DiskIndex.append(doc1, "doc_id", "text", s"$dir/bm", seq = 2L)
      val after = graft.text.Bm25DiskIndex.probeTopK(spark, s"$dir/bm",
        probe, "query_id", "qtext", 5).collect().map(_.toString).sorted.toSeq
      assert(after == before, "retire + identical re-append must be probe-neutral")
      // compact to the same live set folds the tombstone away
      graft.text.Bm25DiskIndex.compact(spark, s"$dir/bm", real, "doc_id", "text", 3L)
      assert(graft.text.Bm25DiskIndex.tombstoneCount(spark, s"$dir/bm") == 0L)
      assert(graft.text.Bm25DiskIndex.probeTopK(spark, s"$dir/bm",
        probe, "query_id", "qtext", 5).collect().map(_.toString).sorted.toSeq == before)

      // IVF append of an EMPTY delta is a no-op on probes
      val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
      val cents = emb.where(pmod($"vec_id", lit(16)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      graft.ann.IvfIndex.write(emb, "vec_id", "embedding", cents, s"$dir/ivf")
      val q = emb.where($"vec_id" < 2)
      val b4 = graft.ann.IvfIndex.probeTopK(spark, s"$dir/ivf", q,
        "vec_id", "embedding", 5, 2).collect().map(_.toString).sorted.toSeq
      graft.ann.IvfIndex.append(emb.where(lit(false)), "vec_id", "embedding", s"$dir/ivf")
      assert(graft.ann.IvfIndex.probeTopK(spark, s"$dir/ivf", q,
        "vec_id", "embedding", 5, 2).collect().map(_.toString).sorted.toSeq == b4)
    } finally { graft.io.Lake.delete(spark, dir) }

    // unigram-LM: encoding NEW text against a learned vocab falls back
    // to character segmentation for unseen words (the Bpe.encode
    // contract shared by both tokenizers)
    val (_, segs) = graft.text.UnigramLm.learn(real, "text")
    val novel = Seq((7L, "zulu alpha")).toDF("doc_id", "text")
    val enc = graft.text.Bpe.encode(novel, "doc_id", "text", segs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc(7L).startsWith("z u l u "), s"unseen word must char-fall-back: ${enc(7L)}")
  }

}
