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

  test("vocab coverage: hand-computed golden incl. boundary tie-break") {
    val docs = Seq(("g1", "a a b"), ("g2", "b c")).toDF("source", "text")
    // counts: a=2, b=2, c=1; V=2 -> vocab {a, b}
    def run(v: Int) = CorpusStats.vocabCoverage(docs, "source", "text", v)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(run(2) == Map(
      "g1" -> (3L, 10000L, 0L),
      "g2" -> (2L, 5000L, 1L)))   // b covered, c OOV
    // V=1 cuts inside the a/b count tie -> 'a' wins on the token order
    assert(run(1) == Map(
      "g1" -> (3L, 6666L, 1L),    // floor(2*10000/3)
      "g2" -> (2L, 0L, 2L)))
    // V >= |vocab|: full coverage everywhere
    assert(run(100).values.forall { case (_, bp, oov) => bp == 10000L && oov == 0L })
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

  test("token KL divergence: matches an independent driver-side replica and orders sanely") {
    val a = Seq((1L, "x x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val b = Seq((3L, "x y y y"), (4L, "y z w")).toDF("doc_id", "text")
    def replica(ac: Map[String, Long], bc: Map[String, Long]): (Long, Long, Long, Long) = {
      val na = ac.values.sum; val nb = bc.values.sum
      val v = (ac.keySet ++ bc.keySet).size.toLong
      val ssum = ac.map { case (tok, c) =>
        val d = bc.getOrElse(tok, 0L)
        c * math.floor(1000.0 * math.log(
          (c * (nb + v)).toDouble / (na * (d + 1)).toDouble)).toLong
      }.sum
      (na, nb, v, Math.floorDiv(ssum, na))
    }
    val got = CorpusStats.tokenKlDivergence(a, b, "text").head()
    val exp = replica(Map("x" -> 4L, "y" -> 2L, "z" -> 1L),
      Map("x" -> 1L, "y" -> 4L, "z" -> 1L, "w" -> 1L))
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) == exp)

    // a corpus against itself diverges (near-)zero; disjoint-vocabulary
    // corpora diverge far more
    val self = CorpusStats.tokenKlDivergence(a, a, "text").head().getLong(3)
    val disjoint = CorpusStats.tokenKlDivergence(a,
      Seq((9L, "p q r s t u")).toDF("doc_id", "text"), "text").head().getLong(3)
    assert(math.abs(self) < 400, s"self-KL should be near zero, got $self")
    assert(disjoint > self + 500, s"disjoint-vocab KL ($disjoint) must dominate self ($self)")
  }

  test("token KL divergence: empty A still yields exactly one row (null kl)") {
    val a = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = CorpusStats.tokenKlDivergence(a.where($"doc_id" < 0), a, "text")
      .collect()
    assert(out.length == 1, "the audit row must exist even with nothing to score")
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("kl_milli")))
    assert(r.getLong(r.fieldIndex("n_tokens_a")) == 0L)
    assert(r.getLong(r.fieldIndex("n_tokens_b")) == 2L)
  }

  test("top diverging tokens: the planted A-only token ranks first, ranking is total") {
    // 'aaa' appears 10x in A and never in B — the dominant contributor
    val a = Seq((1L, ("aaa " * 10).trim + " shared shared shared")).toDF("doc_id", "text")
    val b = Seq((2L, "shared shared shared other other")).toDF("doc_id", "text")
    val top = CorpusStats.topDivergingTokens(a, b, "text", k = 10).collect()
    assert(top.head.getAs[String]("token") == "aaa")
    assert(top.head.getAs[Long]("rank") == 1L)
    assert(top.head.getAs[Long]("c_a") == 10L && top.head.getAs[Long]("c_b") == 0L)
    // only A-side tokens appear, ranks are 1..n without gaps
    assert(top.map(_.getAs[Long]("rank")).toSeq == (1L to top.length).toSeq)
    assert(top.forall(_.getAs[Long]("c_a") > 0))
  }

  test("dsir weights: hand-computed golden, target-like docs score positive") {
    // target: physics 2, quantum 1 (Nt=3); raw: physics 1, quantum 1,
    // spam 3 (Nr=5); joint vocab V=3, so Nr+V=8, Nt+V=6.
    //   s(physics) = floor(1000·ln(3·8 / 2·6))  = floor(1000·ln 2)    =  693
    //   s(quantum) = floor(1000·ln(2·8 / 2·6))  = floor(1000·ln 4/3)  =  287
    //   s(spam)    = floor(1000·ln(1·8 / 4·6))  = floor(1000·ln 1/3)  = -1099
    val target = Seq((100L, "physics physics quantum")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "physics quantum"),
      (2L, "spam spam spam"),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = CorpusStats.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (2L, 980L),   // 693 + 287: target-like, positive
      2L -> (3L, -3297L), // 3 · -1099: off-target, negative
      3L -> (0L, 0L),     // token-less docs pass through at weight 0
      4L -> (0L, 0L)))    // NULL text = the empty document

    // reproducibility: partitioning-invariant, and the salted Zipf-head
    // path is result-identical to the plain join
    val basePairs = got.toSeq.sortBy(_._1)
    val repart = CorpusStats.dsirWeights(raw.repartition(7), target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    val salted = CorpusStats.dsirWeights(raw, target, "doc_id", "text", saltFactor = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(repart == basePairs)
    assert(salted == basePairs)
  }

  test("hashed-bigram dsir: matches an independent driver-side replica") {
    val B = 512
    val targetDocs = Seq((100L, "physics is fun physics is hard"))
    val rawDocs = Seq(
      (1L, "physics is fun today"),
      (2L, "spam offer spam offer spam"),
      (3L, "solo"),                      // < 2 tokens: no bigram features
      (4L, null.asInstanceOf[String]))
    val target = targetDocs.toDF("doc_id", "text")
    val raw = rawDocs.toDF("doc_id", "text")

    // plain-Scala replica of the whole computation (40-bit polyhash of
    // "prev tok" mod B, fixed-space add-1 smoothing, floored millinats)
    def toks(s: String): Seq[String] =
      if (s == null) Seq.empty
      else s.trim.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    def bucketsOf(s: String): Seq[Long] = {
      val t = toks(s)
      if (t.length < 2) Seq.empty
      else t.sliding(2).map { bg =>
        val str = bg.mkString(" ")
        str.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % (1L << 40)) % B
      }.toSeq
    }
    val rawInst = rawDocs.flatMap { case (id, s) => bucketsOf(s).map(id -> _) }
    val rCnt = rawInst.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tCnt = targetDocs.flatMap(d => bucketsOf(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nr = rCnt.values.sum; val nt = tCnt.values.sum
    def s(b: Long): Long = math.floor(1000.0 * math.log(
      ((tCnt.getOrElse(b, 0L) + 1) * (nr + B)).toDouble /
        ((rCnt.getOrElse(b, 0L) + 1) * (nt + B)))).toLong
    val expected = rawDocs.map { case (id, text) =>
      val bs = bucketsOf(text)
      id -> (bs.size.toLong, bs.map(s).sum)
    }.toMap

    val got = CorpusStats.dsirWeightsHashed(raw, target, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // the planted separation survives hashing: target-like > off-target
    assert(got(1L)._2 > got(2L)._2)
    assert(got(3L) == (0L, 0L) && got(4L) == (0L, 0L))
  }

  test("temperature weights: golden vs driver-side replica, alpha endpoints, zero-token source") {
    import spark.implicits._
    // srcA 16 tokens, srcB 1 token, srcC all-NULL text (0 tokens)
    val docs = Seq(
      ("a", Seq.fill(16)("w").mkString(" ")),
      ("b", "solo"),
      ("c", null.asInstanceOf[String])
    ).toDF("source", "text")
    def replica(counts: Map[String, Long], alphaMilli: Long): Map[String, Long] = {
      val em = counts.view.mapValues(n =>
        if (n > 0) math.floor(1000.0 *
          math.exp(alphaMilli / 1000.0 * math.log(n.toDouble))).toLong
        else 0L).toMap
      val tot = em.values.sum
      counts.map { case (s, _) =>
        s -> (if (tot > 0) 10000L * em(s) / tot else 0L) }
    }
    val counts = Map("a" -> 16L, "b" -> 1L, "c" -> 0L)
    for (alpha <- Seq(0L, 500L, 700L, 1000L)) {
      val got = CorpusStats.temperatureWeights(docs, "source", "text", alpha)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(t => t._1 -> t._2).toMap == counts, s"alpha=$alpha token counts")
      assert(got.map(t => t._1 -> t._3).toMap == replica(counts, alpha), s"alpha=$alpha weights")
    }
    // alpha=1000 is proportional, alpha=0 flattens the live sources to equal
    val w1000 = CorpusStats.temperatureWeights(docs, "source", "text", 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w1000("a") > 9L * w1000("b"), "alpha=1 keeps the raw 16:1 gap")
    val w0 = CorpusStats.temperatureWeights(docs, "source", "text", 0L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w0("a") == w0("b") && w0("c") == 0L, "alpha=0 is uniform over live sources")
    intercept[IllegalArgumentException] {
      CorpusStats.temperatureWeights(docs, "source", "text", 1001L)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.temperatureWeights(docs, "text", "text", 500L)
    }
  }

  test("bigram PMI: matches a driver-side replica, cutoff before ranking, total order") {
    import spark.implicits._
    val texts = Seq(
      "new york new york new york new york new york",
      "the cat the dog the cat the dog the end",
      "new deal the cat new york stories")
    val docs = texts.toDF("text")
    // driver-side replica over the same whitespace tokens
    val toksPerDoc = texts.map(_.split(" ").toSeq.filter(_.nonEmpty))
    val uni = toksPerDoc.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = toksPerDoc.flatMap(ts => ts.zip(ts.drop(1)))
    val bc = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tu = uni.values.sum.toDouble
    val tb = bis.size.toDouble
    val minCount = 2L
    val expected = bc.filter(_._2 >= minCount).map { case ((a, b), cb) =>
      (a, b, cb, math.floor(1000.0 *
        math.log(cb.toDouble * tu * tu / (tb * uni(a) * uni(b)))).toLong)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2))
    val got = CorpusStats.bigramPmiTop(docs, "text", k = 100, minCount = minCount)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "replica mismatch")
    assert(got.nonEmpty && !got.exists(t => bc((t._1, t._2)) < minCount))
    // k cuts the ranked head
    val top1 = CorpusStats.bigramPmiTop(docs, "text", k = 1, minCount = minCount)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top1 == expected.take(1).map(t => (t._1, t._2)))
    intercept[IllegalArgumentException] {
      CorpusStats.bigramPmiTop(docs, "text", k = 0, minCount = 2L)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.bigramPmiTop(docs, "text", k = 5, minCount = 0L)
    }
  }

  test("encode top-V: rank ids in token order, OOV bucket, empty docs surface") {
    import spark.implicits._
    // counts: w=5, x=3, y=2, z=1 -> vocab(V=2): w->0, x->1; y/z OOV->2
    val docs = Seq(
      (1L, "w x w y z"),
      (2L, "x y w w x w"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = CorpusStats.encodeTopV(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((Seq(0L, 1L, 0L, 2L, 2L), 5L, 2L)))
    assert(got(2L) == ((Seq(1L, 2L, 0L, 0L, 1L, 0L), 6L, 1L)))
    assert(got(3L) == ((Seq.empty[Long], 0L, 0L)), "token-less docs carry an empty array")
    // frequency tie on count breaks by token asc: with V=3, y (c=2) is in, z is OOV
    val got3 = CorpusStats.encodeTopV(docs, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got3(1L) == Seq(0L, 1L, 0L, 2L, 3L))
    intercept[IllegalArgumentException] {
      CorpusStats.encodeTopV(docs, "doc_id", "text", vocabSize = 0)
    }
  }

  test("length profile: interpolated percentile golden, NULL text counts as zero") {
    import spark.implicits._
    // src a: counts 1,2,3,4 -> p25=1.75 p50=2.5 p75=3.25 p90=3.7
    // src b: one NULL text -> count 0 -> all percentiles 0
    val docs = Seq(
      ("a", "w"), ("a", "w w"), ("a", "w w w"), ("a", "w w w w"),
      ("b", null.asInstanceOf[String])
    ).toDF("source", "text")
    val got = CorpusStats.lengthProfile(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("a") == ((4L, 1.75, 2.5, 3.25, 3.7)))
    assert(got("b") == ((1L, 0.0, 0.0, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      CorpusStats.lengthProfile(docs, "text", "text")
    }
  }
}
