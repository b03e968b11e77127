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
