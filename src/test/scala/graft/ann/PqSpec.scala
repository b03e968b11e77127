package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codebooks are partitioning-invariant and cover every subspace") {
    val cb1 = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64,
        stride = 16, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    val cb2 = Pq.trainCodebooks(emb.repartition(7), "vec_id", "embedding",
        8, 64, stride = 16, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(cb1 == cb2, "fixed-point means must kill accumulation-order drift")
    val perS = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 2)
      .groupBy($"s").count().collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(perS.length == 8 && perS.forall(_._2 >= 1))
  }

  test("every vector encodes to exactly m codes from its own subspace") {
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val n = emb.count()
    assert(codes.count() == n * 8)
    assert(codes.groupBy($"vec_id").count().where($"count" =!= 8).isEmpty)
    // codes reference existing codebook entries
    assert(codes.join(cb, Seq("s", "code"), "left_anti").isEmpty)
  }

  test("rerank = |corpus| degenerates to brute force exactly") {
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val queries = emb.where($"vec_id" < 5)
    val n = emb.count().toInt
    val full = Pq.adcRerankTopK(queries, codes, cb, emb,
        "vec_id", "embedding", 8, 64, k = 10, rerank = n)
      .collect().map(_.toString).sorted.toSeq
    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(_.toString).sorted.toSeq
    assert(full == brute,
      "with every candidate rescored, PQ must return the exact ranking")
  }

  test("recall grows with rerank depth (the q182 ladder, directionally)") {
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val queries = emb.where($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id")
    def recall(r: Int): Double = {
      val served = Pq.adcRerankTopK(queries, codes, cb, emb,
          "vec_id", "embedding", 8, 64, 10, r)
        .select($"query_id", $"neighbor_id", lit(1).as("hit"))
      val m = brute.join(served, Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce($"hit", lit(0))).cast("double") / count(lit(1)))
        .head().getDouble(0)
      m
    }
    val r10 = recall(10)
    val r50 = recall(50)
    assert(r50 >= r10, s"rerank 50 ($r50) must not lose to 10 ($r10)")
    assert(r50 > 0.5, s"rerank 50 should recover most of the list: $r50")
  }

  test("probed candidate pools NEST in nProbe — the q206 monotonicity, structurally") {
    // recall monotonicity in nProbe follows from the candidate sets
    // nesting (more probed cells only ever ADD candidates) and the
    // rerank cut keeping a prefix of an identically-ordered list —
    // pin the set containment itself, which is exact
    val cents = emb.where(pmod($"vec_id", lit(16)) === 0)
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
    val cb = IvfPq.trainCodebooks(emb, "vec_id", "embedding", cents, 8, 64)
    val codes = graft.ops.CacheScope.persist(
      IvfPq.encode(emb, "vec_id", "embedding", cents, cb, 8, 64))
    val queries = emb.where($"vec_id" < 5)
    def cands(np: Int): Set[(Long, Long)] =
      IvfPq.adcProbeScores(queries, codes, cents, cb,
          "vec_id", "embedding", 8, 64, nProbe = np)
        .select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().toSet
    val c1 = cands(1); val c2 = cands(2); val c4 = cands(4)
    assert(c1.subsetOf(c2) && c2.subsetOf(c4),
      s"probed pools must nest: ${c1.size} ⊆ ${c2.size} ⊆ ${c4.size}")
    assert(c4.size > c1.size, "more cells must actually widen the pool here")
    // and within one pool, scores are cut-stable: the top-30 ADC list
    // is a prefix of the top-300 list (same ordering, longer cut)
    val scores = IvfPq.adcProbeScores(queries, codes, cents, cb,
      "vec_id", "embedding", 8, 64, nProbe = 4)
    def topIds(rr: Int): Map[Long, Seq[Long]] =
      IvfPq.rankTopK(scores, rr).select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Int, Long)].collect().toSeq
        .groupBy(_._1).map { case (q, xs) =>
          q -> xs.sortBy(_._2).map(_._3) }
    val t5 = topIds(5); val t20 = topIds(20)
    assert(t5.forall { case (q, ids) => t20(q).take(ids.length) == ids },
      "the shorter cut must be a prefix of the longer one")
  }

  test("fused assign kernel == relational window reference (r15 opt)") {
    val subs = Pq.subVectors(emb, "vec_id", "embedding", 8, 64)
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 2)
    val kern = Pq.assignKernel(subs, cb).collect().map(_.toString).sorted.toSeq
    val ref = Pq.assignReference(subs, cb).collect().map(_.toString).sorted.toSeq
    assert(kern.nonEmpty && kern == ref,
      "the broadcast-argmin kernel must replay the join+window form exactly")
  }

  test("assign kernel null semantics match the reference (null element / null vec)") {
    // a null ELEMENT nulls every distance (the DoubleVectorL2 contract),
    // and asc NULLS FIRST + code asc then keeps the smallest code — the
    // window form's exact behavior; a NULL vector behaves the same way
    val rows = Seq(
      org.apache.spark.sql.Row(900L,
        (0 until 64).map(i => if (i == 3) null
          else java.lang.Float.valueOf(0.5f + i * 0.01f))),
      org.apache.spark.sql.Row(901L,
        (0 until 64).map(i => java.lang.Float.valueOf(0.25f - i * 0.002f))),
      org.apache.spark.sql.Row(902L, null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val weird = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val subs = Pq.subVectors(weird.unionByName(
        emb.select($"vec_id".cast("long").as("vec_id"), $"embedding")),
      "vec_id", "embedding", 8, 64)
    val cb = Pq.trainCodebooks(emb, "vec_id", "embedding", 8, 64, 16, 1)
    val kern = Pq.assignKernel(subs, cb).collect().map(_.toString).sorted.toSeq
    val ref = Pq.assignReference(subs, cb).collect().map(_.toString).sorted.toSeq
    assert(kern == ref,
      "null-element and null-vector rows must fall back identically")
  }

  test("the subspace split guards ragged dims loudly") {
    intercept[IllegalArgumentException] {
      Pq.subVectors(emb, "vec_id", "embedding", 7, 64)
    }
  }
}
