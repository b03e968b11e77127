package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private val dim = 4
  private val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)), // close to 0
    (2L, vec(0, 1, 0, 0)),
    (3L, vec(0, 0.95, 0.05, 0)), // close to 2
    (4L, vec(0, 0, 0, 1))
  ).toDF("vec_id", "embedding")

  test("dot/cosine golden values") {
    val d = emb.where($"vec_id" === 0).crossJoin(
        emb.where($"vec_id" === 1).select($"embedding".as("e2")))
      .select(Ann.dot($"embedding", $"e2").as("d")).as[Double].head()
    assert(math.abs(d - 0.9) < 1e-6)
  }

  test("codegen'd FloatVectorDot is bit-identical to the HOF dot on real embeddings") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val a = real.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = real.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).where($"ia" < $"ib")
      .select(Ann.dot($"va", $"vb").as("fast"), Ann.dotHof($"va", $"vb").as("ref"))
    assert(pairs.where($"fast" =!= $"ref" ||
      ($"fast".isNull =!= $"ref".isNull)).isEmpty)
    // null semantics: length mismatch and null element -> null
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("x", "y")
      .select(Ann.dot($"x", $"y").as("d"))
    assert(bad.head().isNullAt(0))
  }

  test("fused ivfAssign == relational reference, incl. null/mismatch/tie semantics") {
    // real corpus, stride-16 centroids — every cell assignment must agree
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = real.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
    val fused = Ann.ivfAssign(real, "vec_id", "embedding", cents)
      .select($"id", $"cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = Ann.ivfAssignReference(real, "vec_id", "embedding", cents)
      .select($"id", $"cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == ref, "fused kernel must assign every vector to the reference cell")

    // adversarial: null vector, null element, length mismatch, exact tie
    val cents2 = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 1, 0, 0)),
      (3L, vec(1, 0, 0, 0))).toDF("cid", "cvec")
    val weird = Seq(
      (10L, vec(1, 0, 0, 0)),          // ties cids 1 and 3 -> smaller wins
      (11L, vec(0, 1, 0, 0)),
      (13L, vec(0.5, 0.5, 0, 0))       // ties 1/2/3 at 0.5 -> cid 1
    ).toDF("id", "v")
      .unionByName(Seq((12L, Array(1.0f, 2.0f))).toDF("id", "v")) // len mismatch -> all null
      .unionByName(spark.sql(
        "SELECT 14L AS id, CAST(NULL AS ARRAY<FLOAT>) AS v")) // null vec
      .unionByName(spark.sql(
        "SELECT 15L AS id, ARRAY(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), " +
          "CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)) AS v")) // null element
    val f2 = Ann.ivfAssign(weird, "id", "v", cents2)
      .select($"id", $"cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r2 = Ann.ivfAssignReference(weird, "id", "v", cents2)
      .select($"id", $"cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(f2 == r2, s"adversarial parity: fused=$f2 ref=$r2")
    assert(f2(10L) == 1L && f2(13L) == 1L, "ties must keep the smallest cid")
    assert(f2(12L) == 1L && f2(14L) == 1L && f2(15L) == 1L,
      "all-null dots fall back to the smallest cid (struct-ordering contract)")

    // fused ivfProbes == relational window reference on both corpora
    def probeSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qs = real.where($"vec_id" < 7)
    assert(probeSet(Ann.ivfProbes(qs, cents, "vec_id", "embedding", 3)) ==
      probeSet(Ann.ivfProbesReference(qs, cents, "vec_id", "embedding", 3)),
      "fused probes must pick the reference probe cells")
    assert(probeSet(Ann.ivfProbes(weird, cents2, "id", "v", 2)) ==
      probeSet(Ann.ivfProbesReference(weird, cents2, "id", "v", 2)),
      "fused probes must match the reference on null/mismatch/tie inputs")
  }

  test("brute-force top-k ranks the nearest vector first") {
    val top = Ann.bruteForceTopK(emb.where($"vec_id" === 0), emb, "vec_id", "embedding", 2)
      .orderBy($"rank").collect()
    assert(top.length == 2)
    assert(top(0).getAs[Long]("neighbor_id") == 1L)
    assert(top(0).getAs[Int]("rank") == 1)
  }

  test("LSH buckets: deterministic, and recall vs brute force on testdata") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Ann.nearDupPairs(real, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshNearDupPairs(real, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      info(s"LSH recall at cos>=0.35: $recall (${lsh.size}/${exact.size})")
      // cos 0.35 is a weak signal for hyperplane LSH (θ≈70°); 16 tables
      // of 4 bits give ~0.9 theoretical hit rate. Real near-dups
      // (cos≥0.9) recall ≈ 1; this guards against collapse, not tuning.
      assert(recall >= 0.5, s"LSH recall collapsed: $recall")
    }
    // determinism: same buckets on re-evaluation
    val b1 = real.select(Ann.lshBucket($"embedding", 8, 64).as("b")).as[Long].collect()
    val b2 = real.select(Ann.lshBucket($"embedding", 8, 64).as("b")).as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
  }

  test("random projection: coordinate golden, neighbor preservation, guards") {
    // coordinate parity against a driver-side replica of the same
    // planes on a hand-held vector (unit basis vector e_2 picks out
    // each plane's second sign exactly)
    val basis = Seq((0L, vec(0, 1, 0, 0))).toDF("vec_id", "embedding")
    val got = basis.select(Ann.randomProject($"embedding", 3, dim).as("p"))
      .as[Seq[Double]].head()
    val expected = Ann.planeWeights(3, dim).map(_(1))
    assert(got == expected)
    // neighbor preservation on real 64-dim testdata: projected top-10
    // overlaps exact top-10 well above the ~0.02 random baseline.
    // Collapse guard, not tuning (measured 0.185 at 64→16).
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("v"))
    val proj = real.select($"id", Ann.randomProject($"v", 16, 64, planeOffset = 64).as("p"))
    def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    import org.apache.spark.sql.expressions.Window
    def topk(scored: org.apache.spark.sql.DataFrame) = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy(desc("s"), $"id")))
      .where($"rn" <= 10).select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = real.where($"id" % 25 === 0).select($"id".as("qid"), $"v".as("qv"))
    val qp = proj.where($"id" % 25 === 0).select($"id".as("qid"), $"p".as("qp"))
    val exact = topk(q.crossJoin(real).where($"qid" =!= $"id")
      .withColumn("s", Ann.dot($"qv", $"v")))
    val approx = topk(qp.crossJoin(proj).where($"qid" =!= $"id")
      .withColumn("s", dotD($"qp", $"p")))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"projection recall@10 at 64->16: $recall")
    assert(recall >= 0.08, s"projected neighbors collapsed: $recall")
    // disjoint offsets draw an independent projection
    val p0 = real.select(Ann.randomProject($"v", 4, 64).as("p")).as[Seq[Double]].head()
    val p1 = real.select(Ann.randomProject($"v", 4, 64, planeOffset = 4).as("p"))
      .as[Seq[Double]].head()
    assert(p0 != p1)
    intercept[IllegalArgumentException] { Ann.randomProject($"v", 0, 64) }
  }

  test("projected-rescore top-k: exact precision, recall vs brute force, full-rerank equality") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val q = real.where($"vec_id" % 25 === 0)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = asSet(Ann.bruteForceTopK(q, real, "vec_id", "embedding", 10))
    val proj = asSet(Ann.projectedRescoreTopK(q, real, "vec_id", "embedding",
      k = 10, rerank = 40, outDim = 16, dim = 64, planeOffset = 64))
    val recall = brute.intersect(proj).size.toDouble / brute.size
    info(s"projected-rescore recall@10 (rerank=40, 64->16): $recall")
    assert(recall >= 0.15, s"projected-rescore recall collapsed: $recall")
    // rerank = |corpus| makes the coarse stage a no-op filter: the
    // exact rescore must then reproduce brute force EXACTLY
    val n = real.count().toInt
    val full = asSet(Ann.projectedRescoreTopK(q, real, "vec_id", "embedding",
      k = 10, rerank = n, outDim = 16, dim = 64, planeOffset = 64))
    assert(full == brute, "full-rerank projected path must equal brute force")
    intercept[IllegalArgumentException] {
      Ann.projectedRescoreTopK(q, real, "vec_id", "embedding", 10, 5, 16, 64)
    }
  }

  test("trained IVF centroids: monotone spherical-kmeans objective, recall vs stride init") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val stride = real.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val t1 = Ann.ivfTrainCentroids(real, "vec_id", "embedding", stride = 16, iters = 1)
    val t3 = Ann.ivfTrainCentroids(real, "vec_id", "embedding", stride = 16, iters = 3)
    // spherical k-means objective (mean best-centroid cosine) is monotone
    // non-decreasing per Lloyd round — this is the training guarantee
    val o0 = Ann.ivfObjective(real, "vec_id", "embedding", stride)
    val o1 = Ann.ivfObjective(real, "vec_id", "embedding", t1)
    val o3 = Ann.ivfObjective(real, "vec_id", "embedding", t3)
    info(f"objective stride=$o0%.4f iter1=$o1%.4f iter3=$o3%.4f")
    assert(o1 >= o0 - 1e-9, s"first round regressed the objective: $o0 -> $o1")
    assert(o3 >= o1 - 1e-9, s"later rounds regressed the objective: $o1 -> $o3")
    // determinism: same input -> bit-identical centroids
    val t3b = Ann.ivfTrainCentroids(real, "vec_id", "embedding", stride = 16, iters = 3)
    assert(t3.orderBy("cid").collect().toSeq == t3b.orderBy("cid").collect().toSeq)

    // recall at equal nProbe, trained vs stride init, brute-force truth
    val queries = real.where($"vec_id" < 10)
    val k = 10
    val brute = Ann.bruteForceTopK(queries, real, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(cents: org.apache.spark.sql.DataFrame): Double = {
      val cells = Ann.ivfAssign(real, "vec_id", "embedding", cents)
      val got = Ann.ivfProbeTopK(queries, cells, cents, "vec_id", "embedding",
          k = k, nProbe = 4)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val rStride = recallOf(stride)
    val rTrained = recallOf(t3)
    info(f"recall@$k nProbe=4: stride=$rStride%.3f trained=$rTrained%.3f")
    // Training is deterministic on fixed data, so the measured uplift
    // (0.35 -> 0.44 at equal nProbe on this corpus) is stable — assert
    // it strictly, plus a collapse floor well above the ~0.125
    // random-probe baseline.
    assert(rTrained > rStride,
      s"trained centroids lost their recall uplift: $rStride -> $rTrained")
    assert(rTrained >= 0.25, s"trained IVF recall collapsed: $rTrained")
  }

  test("IVF top-k: every cell non-empty queries probe, recall vs brute force") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = real.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val cells = Ann.ivfAssign(real, "vec_id", "embedding", centroids)
    // assignment is total and deterministic: one cell per vector
    assert(cells.count() == real.count())
    assert(cells.select("id").distinct().count() == real.count())
    val queries = real.where($"vec_id" < 10)
    val k = 10
    val ivf = Ann.ivfProbeTopK(queries, cells, centroids, "vec_id", "embedding",
        k = k, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteForceTopK(queries, real, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    val nCells = centroids.count()
    info(s"IVF recall@$k with 4/$nCells cells probed: $recall")
    // Probing 4 cells of ~32 scores ~1/8 of the corpus; these synthetic
    // embeddings are unclustered, so this guards against collapse (all
    // vectors in one cell ⇒ recall would be high but cells degenerate;
    // random cells ⇒ ~0.125), not tuning.
    assert(recall >= 0.25, s"IVF recall collapsed: $recall")
    // exactness property: probing EVERY cell must reproduce brute force
    // exactly — IVF loses candidates only by skipping cells, never by
    // scoring (true dot products, same tie-breaks).
    val full = Ann.ivfProbeTopK(queries, cells, centroids, "vec_id", "embedding",
        k = k, nProbe = nCells.toInt)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }

  test("cell near-dup pairs: precision exact, recall vs brute force measured") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = real.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
    val cells = Ann.ivfAssign(real, "vec_id", "embedding", centroids)
    val threshold = 0.35
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cell = keyset(Ann.cellNearDupPairs(cells, threshold))
    val brute = keyset(Ann.nearDupPairs(real, "vec_id", "embedding", threshold))
    // precision is exact: every cell pair is a true pair (dot verified)
    assert(cell.subsetOf(brute))
    assert(cell.nonEmpty)
    val recall = cell.size.toDouble / brute.size
    info(f"cell near-dup recall vs brute force at cos>=$threshold: $recall%.3f (${cell.size}/${brute.size})")
    // these synthetic embeddings are UNCLUSTERED, so pair-recall at 32
    // cells is structurally low (~0.18 — both members must land in one
    // of 32 cells); the assert guards collapse-to-zero, not tuning.
    // Real near-dup corpora cluster, which is the operator's premise.
    assert(recall >= 0.1, s"cell recall collapsed: $recall")
  }

  test("diversity sample: per-cell cap, subset, small cells intact, deterministic") {
    val real = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = real.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
    val cells = Ann.ivfAssign(real, "vec_id", "embedding", centroids)
    val cap = 5
    val kept = Ann.diversitySample(cells, cap)
    val perCell = kept.groupBy($"cell").count().collect()
    assert(perCell.nonEmpty && perCell.forall(_.getLong(1) <= cap))
    // kept ids are a subset of the input, with cell assignment unchanged
    val inputPairs = cells.select($"id", $"cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val keptPairs = kept.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptPairs.subsetOf(inputPairs))
    // cells at or under the cap keep every member
    val cellSizes = cells.groupBy($"cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptSizes = kept.groupBy($"cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cellSizes.filter(_._2 <= cap).foreach { case (c, n) =>
      assert(keptSizes.getOrElse(c, 0L) == n, s"small cell $c lost members")
    }
    assert(Ann.diversitySample(cells, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == keptPairs)
  }
}
