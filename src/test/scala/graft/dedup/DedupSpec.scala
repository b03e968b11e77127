package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "b0", "the quick brown fox jumps over the lazy dog"),
    (1L, "b0", "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "b0", "completely different words entirely unrelated text here"),
    (3L, "b1", "the quick brown fox jumps over the lazy dog"), // exact dup of 0 (other block)
    (4L, "b1", "spark catalyst optimizer rewrites logical plans fast")
  ).toDF("doc_id", "source", "text")

  test("exact dedup: canonical min id per text group") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    val dup = out.where($"n_copies" > 1).head()
    assert(dup.getAs[Long]("canonical_id") == 0L)
    assert(dup.getAs[Long]("n_copies") == 2L)
    assert(out.count() == 4)
  }

  test("jaccard pairs: word-set similarity within block") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source", 1, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // docs 0/1: 8 distinct words each, 7 shared (dog vs cat): J = 7/9
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(math.abs(pairs.head._3 - 0.7778) < 1e-9) // round(7/9, 4)
  }

  test("inverted-index jaccard matches the blocked formulation exactly") {
    import org.apache.spark.sql.functions.lit
    val blocked = Dedup.jaccardPairs(docs.withColumn("source", lit("all")),
      "doc_id", "text", "source", 1, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inverted = Dedup.jaccardPairsInverted(docs, "doc_id", "text", 1, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked == inverted)
    assert(blocked.nonEmpty)
  }

  test("minhash LSH finds the exact-jaccard pairs (recall on J>=0.8)") {
    val exact = Dedup.jaccardPairs(docs.withColumn("source", lit("all")),
      "doc_id", "text", "source", 1, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // 0-1 (J=0.8) and 0-3 (J=1.0)
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  test("minhash similarity estimate tracks exact jaccard on real near-dups") {
    val cfg = Dedup.MinHashConfig(numHashes = 64, shingleSize = 1, bands = 16)
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text", cfg).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / cfg.numHashes
    assert(est(0L, 3L) == 1.0) // identical texts -> identical signatures
    assert(est(0L, 1L) > 0.5) // J=0.8 near-dup
    assert(est(0L, 2L) < 0.4) // unrelated
  }

  test("simhash: identical word sets collide, near-dups are close, unrelated far") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(hd(0L, 1L) < hd(0L, 2L), s"hd(0,1)=${hd(0L, 1L)} hd(0,2)=${hd(0L, 2L)}")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("hammingNearDupPairs rejects bands=1 — the one-band mask would wrap and degenerate to all-pairs") {
    val sigs = Seq((1L, 5L), (2L, 5L)).toDF("id", "hh")
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(sigs, "id", "hh",
        totalBits = 64, maxDist = 0, bands = 1)
    }
    assert(e.getMessage.contains("all-pairs"))
    // the minimum legal banding still works
    assert(Dedup.hammingNearDupPairs(sigs, "id", "hh",
      totalBits = 64, maxDist = 1, bands = 2).count() == 1L)
  }

  test("incremental merge: batch dedup, first writer wins, corpus untouched") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta"),   // collides with corpus doc 1 -> dropped
      (11L, "epsilon zeta"), // new
      (12L, "epsilon zeta"), // within-batch dup of 11 -> dropped
      (13L, "eta theta")     // new
    ).toDF("doc_id", "text")
    val merged = Dedup.incrementalMerge(existing, incoming, "doc_id", "text")
      .select("doc_id", "origin").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "existing", 2L -> "existing",
      11L -> "new", 13L -> "new"))
  }

  test("incremental merge: a bare 40-bit fingerprint collision does not drop a distinct doc") {
    // "a" and "\u0002#" share polyHash 97 (31·2 + 35 = 97 = 'a'), but
    // their normalized lengths differ — identity is (fp40, length), so
    // the colliding incoming doc must survive as 'new'. Under bare-fp
    // identity it would be silently dropped as a duplicate.
    val existing = Seq((1L, "a")).toDF("doc_id", "text")
    val incoming = Seq((2L, "\u0002#")).toDF("doc_id", "text")
    val merged = Dedup.incrementalMerge(existing, incoming, "doc_id", "text")
      .select("doc_id", "fp40", "origin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(merged(1L)._1 == 97L && merged(2L)._1 == 97L, s"fixture lost its collision: $merged")
    assert(merged(2L)._2 == "new", "distinct doc dropped on a fingerprint collision")
  }

  test("connectedComponentsWithin fails fast when an edge set spans blocks") {
    // id 2 appears under two different blocks — the block-local contract
    // is violated and the output would carry conflicting components.
    val pairs = Seq((1L, 2L, "A"), (2L, 3L, "B")).toDF("id_a", "id_b", "blk")
    val e = intercept[Exception] {
      Dedup.connectedComponentsWithin(pairs, "id_a", "id_b", "blk").collect()
    }
    assert(messages(e).exists(_.contains("multiple blocks")), e.toString)
  }

  test("connected components: chains merge, disjoint stay apart, singletons keep own label") {
    // 1-2-3-4 is a path (diameter 3: label must propagate multiple hops),
    // 10-11 a separate component, 20-21-22 a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
        (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // clustering the real q21 pairs: every member maps into its own pair
    // set's minimum, and cluster ids are always cluster members
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val realPairs = Dedup.jaccardPairs(real, "doc_id", "text", "source",
      shingleSize = 1, threshold = 0.8, hashShingles = true)
    val cc = Dedup.connectedComponents(realPairs, "id_a", "id_b")
    val byComp = cc.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byComp.nonEmpty)
    val members = byComp.map(_._1).toSet
    assert(byComp.forall { case (id, comp) => comp <= id && members.contains(comp) })
    // the per-block union-find formulation produces the identical map
    // (q21 pairs never span blocks)
    val src = real.select($"doc_id".as("id_a"), $"source")
    val blocked = Dedup.connectedComponentsWithin(
        realPairs.join(src, "id_a"), "id_a", "id_b", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(blocked == byComp.toMap)
  }

  test("duplicated spans: planted cross-doc extents — gap split, adjacency merge, short-doc exclusion") {
    val spanDocs = Seq(
      // 10/11 share an 8-token prefix: k=4 windows at pos 1..5 are all
      // duplicated, pos 6 straddles the divergence -> one extent [1,8]
      (10L, "alpha beta gamma delta epsilon zeta eta theta u10a u10b"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta v11a v11b"),
      // 12/13 share two 4-token phrases separated by unique filler on
      // both sides -> two extents per doc, at different positions
      (12L, "red orange yellow green u12a u12b u12c u12d u12e one two three four"),
      (13L, "one two three four x13a x13b x13c x13d red orange yellow green"),
      // 3 tokens < spanTokens: cannot contain a 4-token span; its
      // whole-doc fingerprint must NOT be compared against real windows
      (14L, "red orange yellow"),
      // fully unique: absent from output
      (15L, "w15a w15b w15c w15d w15e w15f"),
      // 16 = phrase A ++ phrase B contiguous; A dups with 17, B with 18.
      // Duplicated window starts 1 and 5 are exactly spanTokens apart
      // (spans touch end-to-start) -> ONE merged extent [1,8]
      (16L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (17L, "lorem ipsum dolor sit p17a p17b p17c p17d"),
      (18L, "q18a q18b q18c q18d amet consectetur adipiscing elit")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", spanTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      (10L, 1L, 8L, 8L, 5L), (11L, 1L, 8L, 8L, 5L),
      (12L, 1L, 4L, 4L, 1L), (12L, 10L, 13L, 4L, 1L),
      (13L, 1L, 4L, 4L, 1L), (13L, 9L, 12L, 4L, 1L),
      (16L, 1L, 8L, 8L, 2L),
      (17L, 1L, 4L, 4L, 1L), (18L, 5L, 8L, 4L, 1L)))
  }

  test("span index: two increments merge to the full-corpus duplicatedSpans") {
    // the cross-increment case is the one that matters: 20/21 land in
    // DIFFERENT increments and share a phrase that is unique WITHIN
    // each — only the merged df crosses minDf
    val inc1 = Seq(
      (20L, "november oscar papa quebec a20a a20b"),
      (22L, "golf hotel india juliet kilo lima"),
      (24L, "golf hotel india juliet z24a z24b")).toDF("doc_id", "text")
    val inc2 = Seq(
      (21L, "november oscar papa quebec b21a b21b"),
      (23L, "mike unique filler words here only")).toDF("doc_id", "text")
    val k = 4
    val merged = Dedup.mergeSpanIndex(
      Dedup.spanIndex(inc1, "doc_id", "text", k),
      Dedup.spanIndex(inc2, "doc_id", "text", k))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val got = asSet(Dedup.duplicatedSpansFromIndex(merged._1, merged._2, k))
    val full = asSet(Dedup.duplicatedSpans(inc1.unionByName(inc2),
      "doc_id", "text", k))
    assert(got == full, "incremental index must equal the one-shot pass")
    // and the cross-increment phrase was actually found (20/21), plus
    // the within-increment one (22/24) — the fixture isn't vacuous
    assert(got.map(_._1) == Set(20L, 21L, 22L, 24L))

    // associativity on the real corpus: three parity slices
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val slices = (0 to 2).map(i =>
      Dedup.spanIndex(real.where(pmod(col("doc_id"), lit(3)) === i),
        "doc_id", "text", 5))
    val folded = slices.reduce(Dedup.mergeSpanIndex)
    assert(asSet(Dedup.duplicatedSpansFromIndex(folded._1, folded._2, 5)) ==
      asSet(Dedup.duplicatedSpans(real, "doc_id", "text", 5)))
  }

  test("excise spans: planted extents removed token-for-token, pass-through docs intact") {
    val docs = Seq(
      (1L, "keep1 keep2 CUT1 CUT2 CUT3 keep3"),
      (2L, "solo tokens only nothing cut"),
      (3L, "GONE1 GONE2 GONE3")
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 3L, 5L), // covers CUT1..CUT3
      (3L, 1L, 3L) // covers the whole doc
    ).toDF("id", "span_start", "span_end")
    val out = Dedup.exciseSpans(docs, "doc_id", "text", spans)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (1L, "keep1 keep2 keep3", 3L, 3L),
      (2L, "solo tokens only nothing cut", 5L, 0L),
      (3L, "", 0L, 3L)))

    // composition with duplicatedSpans on the planted fixture: excised
    // docs no longer contain the duplicated phrase, unique tails survive
    val planted = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta u10a u10b"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta v11a v11b")
    ).toDF("doc_id", "text")
    val ext = Dedup.duplicatedSpans(planted, "doc_id", "text", spanTokens = 4)
    val cleaned = Dedup.exciseSpans(planted, "doc_id", "text", ext)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(10L) == "u10a u10b")
    assert(cleaned(11L) == "v11a v11b")
  }

  test("passage search: alignment voting finds every occurrence, periodic runs included") {
    val corpus = Seq(
      (1L, "p1 p2 alpha beta gamma delta echo fox p3 p4"), // passage at pos 3
      (2L, "alpha beta gamma delta echo fox x y z w"), // passage at pos 1
      (3L, "nothing related here at all whatsoever friend"),
      (4L, "r s r s r s r s"), // periodic: 'r s r s' occurs at 1, 3, 5
      (5L, "alpha beta gamma WRONG echo fox filler filler2") // partial only
    ).toDF("doc_id", "text")
    val passages = Seq(
      (100L, "alpha beta gamma delta echo fox"),
      (200L, "r s r s")
    ).toDF("query_id", "qtext")
    val hits = Dedup.passageSearch(corpus, "doc_id", "text",
        passages, "query_id", "qtext", shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits.filter(_._1 == 100L) == Set((100L, 1L, 3L), (100L, 2L, 1L)))
    assert(hits.filter(_._1 == 200L) == Set((200L, 4L, 1L), (200L, 4L, 3L), (200L, 4L, 5L)))

    // a passage shorter than the window fails loudly, not silently empty
    val tiny = Seq((300L, "solo")).toDF("query_id", "qtext")
    val e = intercept[Exception] {
      Dedup.passageSearch(corpus, "doc_id", "text", tiny, "query_id", "qtext", 2).collect()
    }
    assert(messages(e).exists(_.contains("shorter than shingleSize")), e.toString)
  }

  test("dedup weights: cluster mass sums to ~10000 bp, singletons weigh full") {
    // components: {1,2,3} one cluster, {10,11} another; 20 unclustered
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val got = Dedup.dedupWeights(corpus, "doc_id", comps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 3333L) && got(2L) == (3L, 3333L) && got(3L) == (3L, 3333L))
    assert(got(10L) == (2L, 5000L) && got(11L) == (2L, 5000L))
    assert(got(20L) == (1L, 10000L))
    // each cluster's total weight is within one floor step of 10000 bp
    val byCluster = Map(1L -> Seq(1L, 2L, 3L), 10L -> Seq(10L, 11L))
    for ((_, members) <- byCluster) {
      val total = members.map(got(_)._2).sum
      assert(total <= 10000 && total > 10000 - members.length)
    }
  }

  test("excise spans: NULL-text documents pass through as empty, not null-propagated") {
    val docs = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val spans = Seq((1L, 1L, 1L)).toDF("id", "span_start", "span_end")
    val out = Dedup.exciseSpans(docs, "doc_id", "text", spans)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, "beta", 1L, 1L), (2L, "", 0L, 0L)))
  }

  test("dedup weights: duplicate ids in the components frame raise, not fan out") {
    val comps = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("id", "component")
    val corpus = Seq(1L, 2L).toDF("doc_id")
    val e = intercept[Exception] {
      Dedup.dedupWeights(corpus, "doc_id", comps).collect()
    }
    assert(messages(e).exists(_.contains("duplicate id")), e.toString)
  }

  test("focused minhash: NULL focus values raise, not silently skip detection") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", java.lang.Boolean.TRUE),
      (2L, "alpha beta gamma delta epsilon zeta", null.asInstanceOf[java.lang.Boolean])
    ).toDF("doc_id", "text", "is_new")
    val e = intercept[Exception] {
      Dedup.minhashNearDupPairsFocused(df, "doc_id", "text", "is_new", 0.5).collect()
    }
    assert(messages(e).exists(_.contains("NULL in focus column")), e.toString)
  }

  test("span operators plan without nested loops or cartesian products") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val passages = Seq((1L, "some passage tokens to look for")).toDF("query_id", "qtext")
    val plans = Seq(
      Dedup.duplicatedSpans(real, "doc_id", "text", 5),
      Dedup.passageSearch(real, "doc_id", "text", passages, "query_id", "qtext", 5),
      Dedup.spanContamination(real, "doc_id", "text",
        real.where($"source" === "src0"), "text", 8))
      .map(_.queryExecution.executedPlan.toString)
    for (plan <- plans) {
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    }
  }

  test("duplicated spans: randomized partitioning/order invariance") {
    val rnd = new scala.util.Random(7)
    // random corpus with planted shared phrases at random positions
    val phrase = "common shared phrase tokens here"
    val docs = (0 until 60).map { i =>
      val words = Seq.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(40)}")
      val text =
        if (i % 3 == 0) {
          val cut = rnd.nextInt(words.length + 1)
          (words.take(cut) ++ Seq(phrase) ++ words.drop(cut)).mkString(" ")
        } else words.mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    def spans(df: org.apache.spark.sql.DataFrame) =
      Dedup.duplicatedSpans(df, "doc_id", "text", spanTokens = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val base = spans(docs)
    assert(base.nonEmpty, "planted phrases must produce extents")
    assert(spans(docs.repartition(7)) == base)
    assert(spans(docs.orderBy($"doc_id".desc)) == base)
  }

  test("passage search: every real document rediscovers itself at position 1") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val k = 6
    val passages = real.select($"doc_id".as("query_id"), $"text".as("qtext"))
      .where(size(graft.text.TextFunctions.tokens($"qtext")) >= k)
    val hits = Dedup.passageSearch(real, "doc_id", "text",
        passages, "query_id", "qtext", shingleSize = k)
      .where($"query_id" === $"doc_id" && $"match_pos" === 1L)
    assert(hits.count() == passages.count(),
      "self-containment: each passage-as-full-document must match itself at pos 1")
  }

  test("duplicated spans: extents stay in-bounds and >= spanTokens on the real corpus") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val k = 5
    val spans = Dedup.duplicatedSpans(real, "doc_id", "text", spanTokens = k)
      .withColumnRenamed("id", "doc_id")
    val nToks = real.select($"doc_id",
      size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n"))
    val bad = spans.join(nToks, "doc_id")
      .where($"span_start" < 1 || $"span_end" > $"n" ||
        $"span_tokens" =!= ($"span_end" - $"span_start" + 1L) ||
        $"span_tokens" < k)
    assert(bad.count() == 0)
    assert(spans.count() > 0) // sf0.001 documents do share spans
  }

  test("edit-verified pairs: integer similarity golden, empty/NULL texts identical") {
    val d = Seq(
      (1L, "abcd"), (2L, "abce"),               // lev 1, mx 4 -> 7500
      (3L, ""), (4L, null.asInstanceOf[String]), // both empty -> lev 0, 10000
      (5L, "xyz")                                // vs "abcd": lev 4, mx 4 -> 0
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val all = Dedup.editVerifiedPairs(d, "doc_id", "text", pairs, minSimBp = 0L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(all((1L, 2L)) == ((1L, 7500L)))
    assert(all((3L, 4L)) == ((0L, 10000L)))
    assert(all((1L, 5L)) == ((4L, 0L)))
    val kept = Dedup.editVerifiedPairs(d, "doc_id", "text", pairs, minSimBp = 7000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 2L), (3L, 4L)), "threshold must reject the dissimilar pair")
  }

  test("edit-verified pairs: banded formulation equals the naive full-DP filter on the real corpus") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.jaccardPairs(real, "doc_id", "text", "source", 1, 0.8,
      hashShingles = true).select($"id_a", $"id_b")
    for (t <- Seq(0L, 3500L, 9000L, 10000L)) {
      val banded = Dedup.editVerifiedPairs(real, "doc_id", "text", pairs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // naive reference: unbounded levenshtein + post-filter
      val naive = pairs
        .join(real.select($"doc_id".as("id_a"), coalesce($"text", lit("")).as("ta")), "id_a")
        .join(real.select($"doc_id".as("id_b"), coalesce($"text", lit("")).as("tb")), "id_b")
        .select($"id_a", $"id_b", levenshtein($"ta", $"tb").cast("long").as("lev"),
          greatest(length($"ta"), length($"tb")).cast("long").as("mx"))
        .select($"id_a", $"id_b", $"lev",
          when($"mx" === 0L, 10000L)
            .otherwise(lit(10000L) - expr("(10000 * lev) div mx")).as("sim"))
        .where($"sim" >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(banded == naive, s"banded != naive at threshold $t")
      assert(t == 10000L || banded.nonEmpty, s"fixture must keep pairs at $t")
    }
  }

  test("group-aware split: zero cross-split near-dup leakage by construction") {
    val dir = "/root/testdata/sf0.001"
    val assignment = graft.queries.Queries.q142GroupSplit(spark, dir)
      .select($"doc_id", $"split")
    val pairs = graft.queries.Queries.q21JaccardNearDup(spark, dir)
      .select($"id_a", $"id_b")
    // the doc-id hash split (q100's setup) leaks on this corpus; the
    // cluster-keyed split cannot — same pairs, zero crossings
    assert(graft.dedup.Dedup.crossSplitPairs(pairs, assignment).count() == 0,
      "a near-dup pair crossing splits breaks the construction")
    val leakyAssign = graft.ops.ScaleOps.deterministicSplit(
      graft.queries.Queries.tbl(spark, dir, "documents").select($"doc_id"),
      "doc_id", Seq("train" -> 9000, "val" -> 500, "test" -> 500))
      .select($"doc_id", $"split")
    assert(graft.dedup.Dedup.crossSplitPairs(pairs, leakyAssign).count() > 0,
      "fixture must actually leak under the naive split (else the test is vacuous)")
    // every document is assigned exactly once
    assert(assignment.count() ==
      graft.queries.Queries.tbl(spark, dir, "documents").count())
    assert(assignment.select($"doc_id").distinct().count() == assignment.count())
  }

  test("cross-split pairs: only crossing pairs survive, missing endpoint raises") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "train"),
      (5L, "val"), (6L, "train")).toDF("doc_id", "split")
    val got = Dedup.crossSplitPairs(pairs, assign)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set((1L, 2L, "train", "test"), (5L, 6L, "val", "train")))
    // an endpoint absent from the assignment is an input-sync bug, not a pass
    val partial = Seq((1L, "train")).toDF("doc_id", "split")
    val e = intercept[Exception] {
      Dedup.crossSplitPairs(Seq((1L, 2L)).toDF("id_a", "id_b"), partial).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("missing from assignment"))
    intercept[IllegalArgumentException] {
      Dedup.crossSplitPairs(Seq((1L, 2L)).toDF("x", "y"), assign)
    }
    intercept[IllegalArgumentException] {
      Dedup.crossSplitPairs(pairs, assign.withColumnRenamed("split", "s"))
    }
  }

  test("winnowing: matches a driver-side replica on the real corpus") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val k = 5; val w = 4
    val got = Dedup.winnowedFingerprints(real, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // replica: per-doc fps array via the same public ShingleFps column,
    // then literal winnowing (min per window, rightmost tie) in Scala
    val fps = real
      .select($"doc_id", graft.functions.ShingleFps.shingleFps(
        graft.text.TextFunctions.tokens($"text"), k).as("fps"))
      .where(size(graft.text.TextFunctions.tokens($"text")) >= k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
    val expected = fps.flatMap { case (id, f) =>
      val wl = math.min(w, f.length)
      (0 to f.length - wl).map { i0 =>
        val win = f.slice(i0, i0 + wl)
        val mn = win.min
        val j = win.lastIndexOf(mn)
        (id, (i0 + 1 + j).toLong, mn)
      }.distinct
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("winnowing: shared run of >= window+k-1 tokens shares a selected fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens = 4+5-1
    val d = Seq(
      (1L, s"one two three four five six $shared"),
      (2L, s"$shared nine ten eleven twelve thirteen fourteen")
    ).toDF("doc_id", "text")
    val sel = Dedup.winnowedFingerprints(d, "doc_id", "text", 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val common = sel.filter(_._1 == 1L).map(_._2).toSet
      .intersect(sel.filter(_._1 == 2L).map(_._2).toSet)
    assert(common.nonEmpty, "the MOSS guarantee: a shared 8-token run must be detected")
    intercept[IllegalArgumentException] {
      Dedup.winnowedFingerprints(d, "doc_id", "text", 1, 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowedFingerprints(d, "doc_id", "text", 5, 1)
    }
  }

  test("winnowed overlap: planted shared run detected, df-cap drops ubiquitous fps") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // >= w+k-1 = 8
    val boiler = "common header line repeated on every single page here"
    val a = Seq(
      (1L, s"$boiler intro text $shared"),
      (2L, s"$boiler unrelated body entirely different words")
    ).toDF("doc_id", "text")
    val b = Seq(
      (10L, s"$shared closing remarks $boiler"),
      (11L, s"$boiler another unrelated document text")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowedOverlapPairs(a, b, "doc_id", "text",
        shingleTokens = 5, window = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the true shared run pairs (1,10); boilerplate alone also pairs at
    // high df — with the cap at 1 per side, boilerplate fps (in 2 docs
    // per side) are dropped and ONLY the planted pair survives
    assert(got.contains((1L, 10L)))
    val capped = Dedup.winnowedOverlapPairs(a, b, "doc_id", "text",
        shingleTokens = 5, window = 4, minShared = 1L, maxDf = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 10L)),
      "df-cap must remove corpus-wide boilerplate evidence, keep the real overlap")
    intercept[IllegalArgumentException] {
      Dedup.winnowedOverlapPairs(a, b, "doc_id", "text", 5, 4, minShared = 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowedOverlapPairs(a, b, "doc_id", "text", 5, 4, 1L, maxDf = 0L)
    }
  }

  test("edit-verified pairs: the banded DP evaluates once (fence holds against pushdown)") {
    val pairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val plan = Dedup.editVerifiedPairs(docs, "doc_id", "text", pairs, 9000L)
      .queryExecution.optimizedPlan.toString
    assert(plan.split("levenshtein", -1).length - 1 == 1,
      "the >= 0 filter must reference the fenced alias, not a second DP copy")
  }

  test("edit-verified pairs: guards fail fast") {
    val pairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.editVerifiedPairs(docs, "doc_id", "text", pairs, minSimBp = 10001L)
    }
    intercept[IllegalArgumentException] {
      Dedup.editVerifiedPairs(docs, "doc_id", "text",
        Seq((0L, 1L)).toDF("left", "right"), minSimBp = 0L)
    }
  }

  test("canonical by quality: best member kept per cluster, ties on id, singleton fallback") {
    val d = Seq(
      (0L, "a a"),                                  // quality 203
      (1L, "alpha beta gamma delta epsilon zeta"),  // quality 529 — cluster winner
      (2L, "solo document unrelated"),              // unclustered singleton
      (5L, "same text twin"), (6L, "same text twin") // equal quality -> min id 5
    ).toDF("doc_id", "text")
    val clusters = Seq((0L, 0L), (1L, 0L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.canonicalByQuality(d, "doc_id", "text", clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (2L, 2L), (5L, 5L)))
  }

  test("canonical by quality: quality values ride through, clusters-shape guard") {
    val d = Seq((7L, "a a")).toDF("doc_id", "text")
    val out = Dedup.canonicalByQuality(d, "doc_id", "text",
        Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // n=2 d=1 sumLen=2: min(16,400) + floor(300/2) + min(floor(2*75/4),300) = 203
    assert(out == Seq((7L, 7L, 203L)))
    intercept[IllegalArgumentException] {
      Dedup.canonicalByQuality(d, "doc_id", "text",
        Seq((0L, 1L)).toDF("id", "cluster"))
    }
  }
}
