package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth step of a
  * 100 TB-class vector pipeline (4 bytes/dim fp32 → 1 byte/dim, a 4×
  * cut in scan and shuffle volume for ANN candidate generation; scoring
  * dequantizes on the fly or reranks in fp32).
  *
  * Symmetric per-vector scheme: q_i = ⌊127·x_i / max|x|⌋ ∈ [−127, 127]
  * (floor, not round: round-half ties diverge between engines, floor of
  * an IEEE-exact double expression is bit-reproducible — the q26
  * knife-edge lesson). The zero vector quantizes to zeros. Per-row,
  * shuffle-free column expressions; reconstruction x̂_i = q_i·max|x|/127.
  *
  * Quantization error is bounded by maxAbs/127 per component; QuantizeSpec
  * checks the bound and the cosine drift on real embeddings.
  */
object Quantize {

  /** max(|x_i|) as double (float inputs widen exactly). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization of a float vector given its maxAbs
    * (stage maxAbs through a select — it is referenced once per element). */
  def quantize(vec: Column, mx: Column): Column =
    when(mx === 0.0, transform(vec, _ => lit(0L)))
      .otherwise(transform(vec,
        x => floor(lit(127.0) * x.cast("double") / mx).cast("long")))

  /** Dequantized vector (doubles). */
  def dequantize(q: Column, mx: Column): Column =
    transform(q, v => v.cast("double") * mx / 127.0)

  /** Gate-friendly per-vector summary: the quantized vector verified by
    * value-sum and an order-sensitive 40-bit polynomial fold (array
    * outputs don't survive engine-neutral cell comparison; the fold
    * pins every element and its position). */
  def quantizeSummary(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val staged = emb.select(col(idCol).as("vec_id"),
        col(vecCol).as("v"), maxAbs(col(vecCol)).as("maxabs"))
      .select(col("vec_id"), col("maxabs"), quantize(col("v"), col("maxabs")).as("q"))
    staged.select(
      col("vec_id"),
      size(col("q")).as("n_dims"),
      round(col("maxabs"), 6).as("maxabs_r"),
      aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("qsum"),
      aggregate(col("q"), lit(0L),
        (acc, v) => (acc * 1000003L + (v + 128L)) % (1L << 40)).as("qfp"))
  }
}
