package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level top-k prune: per-partition survivors must reproduce
  * the global window's ranking bit-exactly (including SQL null / NaN /
  * -0.0 ordering), and the window's input must be bounded by
  * partitions × |Q| × k. */
class TopKSpec extends SparkSpec {

  private def rankedVia(pruned: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("key").desc, col("neighbor_id").asc)
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("long keys: pruned ranking == unpruned window ranking, ties on id") {
    val rows = for (q <- 0L until 7L; n <- 0L until 400L)
      yield (q, n, (n * 37L + q * 11L) % 50L) // heavy key ties
    val df = spark.createDataFrame(rows).toDF("query_id", "neighbor_id", "key")
      .repartition(8)
    for (k <- Seq(1, 5, 23)) {
      val pruned = TopK.prunePerPartition(df, "query_id", "key", "neighbor_id", k)
      assert(rankedVia(pruned, k) == rankedVia(df, k), s"k=$k diverged")
      // bound: never more than partitions × queries × k rows survive
      assert(pruned.count() <= 8L * 7L * k)
    }
  }

  test("double keys: SQL ordering (nulls last, NaN greatest, -0.0 == 0.0)") {
    val special = Seq(
      (0L, 1L, Some(Double.NaN)), (0L, 2L, Some(3.5)), (0L, 3L, None),
      (0L, 4L, Some(-0.0)), (0L, 5L, Some(0.0)), (0L, 6L, Some(3.5)),
      (1L, 1L, None), (1L, 2L, None), (1L, 3L, Some(-1.0)))
    val df = spark.createDataFrame(
        special.map { case (q, n, v) => (q, n, v.map(Double.box).orNull) })
      .toDF("query_id", "neighbor_id", "key")
      .selectExpr("query_id", "neighbor_id", "cast(key as double) as key")
      .repartition(3)
    for (k <- Seq(2, 4, 9)) {
      val pruned = TopK.prunePerPartition(df, "query_id", "key", "neighbor_id", k)
      assert(rankedVia(pruned, k) == rankedVia(df, k), s"k=$k diverged")
    }
  }

  test("k larger than any query's candidates keeps everything") {
    val df = spark.createDataFrame(
        Seq((0L, 1L, 5L), (0L, 2L, 9L), (1L, 7L, 1L)))
      .toDF("query_id", "neighbor_id", "key").repartition(4)
    val pruned = TopK.prunePerPartition(df, "query_id", "key", "neighbor_id", 50)
    assert(pruned.count() == 3)
  }

  test("serving paths with and without the prune agree end-to-end") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    // quantizedTopK and projectedRescoreTopK now prune internally; this
    // pins them against the plain-window formulation inline
    val viaQuant = Quantize.quantizedTopK(queries, emb, "vec_id", "embedding",
      k = 10, rerank = 40).collect().map(_.toSeq).toSet
    val idot = aggregate(zip_with(col("cq"), col("qq"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val cIdx = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
      .withColumn("mx", Quantize.maxAbs(col("v")))
      .select(col("neighbor_id"), col("mx"),
        Quantize.quantize(col("v"), col("mx")).as("cq"))
    val qIdx = queries.select(col("vec_id").as("query_id"), col("embedding").as("v"))
      .withColumn("mx", Quantize.maxAbs(col("v")))
      .select(col("query_id"), Quantize.quantize(col("v"), col("mx")).as("qq"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id").asc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val cands = cIdx.crossJoin(broadcast(qIdx))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (idot.cast("double") * col("mx")).as("coarse"))
      .withColumn("crn", row_number().over(cw)).where(col("crn") <= 40)
      .select("query_id", "neighbor_id")
    val plain = cands
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_vec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_vec"))), Seq("query_id"))
      .withColumn("cos", round(Ann.dot(col("q_vec"), col("c_vec")), 6))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .select("query_id", "rank", "neighbor_id", "cos")
      .collect().map(_.toSeq).toSet
    assert(viaQuant == plain)
  }
}
