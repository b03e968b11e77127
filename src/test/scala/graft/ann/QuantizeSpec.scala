package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: range, reconstruction bound, cosine drift on real embeddings") {
    val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val staged = emb.select($"vec_id", $"embedding".as("v"),
        Quantize.maxAbs($"embedding").as("mx"))
      .select($"vec_id", $"v", $"mx", Quantize.quantize($"v", $"mx").as("q"))
      .select($"vec_id", $"v", $"mx", $"q", Quantize.dequantize($"q", $"mx").as("d"))
    val rows = staged.select($"v", $"mx", $"q", $"d").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val mx = r.getDouble(1)
      val q = r.getSeq[Long](2)
      val d = r.getSeq[Double](3)
      assert(q.forall(x => x >= -127 && x <= 127), "quantized value out of int8 range")
      // floor-quantization error: x̂ ∈ (x − mx/127, x] per component
      v.zip(d).foreach { case (x, xd) =>
        assert(xd <= x + 1e-9 && xd > x - mx / 127.0 - 1e-9,
          s"reconstruction out of bound: x=$x xd=$xd mx=$mx")
      }
      // cosine(v, dequant) stays near 1 — quantization must not bend vectors
      def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (p, s) => p * s }.sum
      val vd = v.map(_.toDouble)
      val cos = dot(vd, d) / math.sqrt(dot(vd, vd) * dot(d, d))
      assert(cos > 0.995, s"cosine drift too large: $cos")
    }
  }

  test("quantizedTopK with rerank = |corpus| degenerates to brute force exactly") {
    val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count().toInt
    val queries = emb.where($"vec_id" < 3)
    val exact = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .orderBy("query_id", "rank").collect().toSeq
    val quant = Quantize.quantizedTopK(queries, emb, "vec_id", "embedding", 10, n)
      .orderBy("query_id", "rank").collect().toSeq
    assert(quant == exact)
  }

  test("quantizedTopK edges: rerank=k returns exactly k rows per query; rerank<k rejected") {
    val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where($"vec_id" < 3)
    val out = Quantize.quantizedTopK(queries, emb, "vec_id", "embedding", 5, 5)
    val perQuery = out.groupBy($"query_id").count().collect().map(_.getLong(1))
    assert(perQuery.length == 3 && perQuery.forall(_ == 5L))
    intercept[IllegalArgumentException] {
      Quantize.quantizedTopK(queries, emb, "vec_id", "embedding", 10, 5)
    }
  }

  test("quantizedTopK recall@10 vs brute force at rerank=4k") {
    val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.where($"vec_id" < 10)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = keyset(Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 10))
    val quant = keyset(Quantize.quantizedTopK(queries, emb, "vec_id", "embedding", 10, 40))
    val recall = (exact intersect quant).size.toDouble / exact.size
    // int8 coarse ordering is a tight proxy for fp32 cosine; with a 4×
    // rerank margin the true top-10 should essentially always survive
    assert(recall >= 0.95, s"quantized recall@10 too low: $recall")
  }

  test("zero vector quantizes to zeros; summary is deterministic") {
    val z = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Quantize.quantizeSummary(z, "vec_id", "embedding").head()
    assert(out.getAs[Long]("qsum") == 0L)
    assert(out.getAs[Double]("maxabs_r") == 0.0)
    val emb = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Quantize.quantizeSummary(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    val b = Quantize.quantizeSummary(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
