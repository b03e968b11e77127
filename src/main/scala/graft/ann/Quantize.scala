package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Quantized-rescore top-k: the int8 index does the coarse scan, full
    * fp32 vectors score only the survivors — the memory-bandwidth ANN
    * path at 100 TB (the full-corpus pass reads 1 byte/dim instead of 4;
    * fp32 vectors are fetched for |Q|·`rerank` candidates, a point-lookup
    * joinload, never a scan).
    *
    * Coarse score = (Σ qc_i·qq_i) · maxAbs(c): the integer code dot is
    * order-independent exact Long arithmetic, and the single double
    * multiply by the corpus scale factor is one IEEE operation — both
    * engine-reproducible (the query's scale factor is constant within a
    * query's ranking and is dropped). Candidates rank by (coarse desc,
    * id); exact rescoring then restores fp32 order among them, so
    * precision of the final list is exact given the candidate set and
    * only recall depends on `rerank` (QuantizeSpec measures it, and
    * proves rerank = |corpus| degenerates to brute force exactly).
    *
    * SHUFFLE DISCIPLINE: the coarse window exchange carries bare
    * (query_id, neighbor_id, coarse) rows — neither the int8 codes nor
    * the fp32 vectors ride it; vectors re-join only the candidate set.
    * Same pattern as Ann.lshNearDupPairs. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int): DataFrame = {
    require(k > 0 && rerank >= k, s"need rerank >= k > 0, got k=$k rerank=$rerank")
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    // the int8 index — at scale this is the persisted artifact (4× smaller
    // scan than the fp32 corpus); built inline here
    val cIdx = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .withColumn("mx", maxAbs(col("v")))
      .select(col("neighbor_id"), col("mx"), quantize(col("v"), col("mx")).as("cq"))
      .repartition(parts)
    val qIdx = queries.select(col(idCol).as("query_id"), col(vecCol).as("v"))
      .withColumn("mx", maxAbs(col("v")))
      .select(col("query_id"), quantize(col("v"), col("mx")).as("qq"))
    val idot = aggregate(zip_with(col("cq"), col("qq"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val coarse = cIdx.crossJoin(broadcast(qIdx))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (idot.cast("double") * col("mx")).as("coarse"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id").asc)
    // two-level selection (TopK): the per-partition bounded heap caps
    // the window's input at numPartitions × |Q| × rerank rows — no
    // single task ever sorts the full corpus's candidates
    val cands = TopK.prunePerPartition(coarse,
        "query_id", "coarse", "neighbor_id", rerank)
      .withColumn("crn", row_number().over(cw))
      .where(col("crn") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", round(Ann.dot(col("q_vec"), col("c_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
