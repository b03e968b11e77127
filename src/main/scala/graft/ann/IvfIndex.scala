package graft.ann

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the 100 TB deployment shape the probe path is
  * designed for: centroids land as a tiny parquet, cell assignments
  * land partitioned BY CELL, so a probe reads only the `nProbe` cell
  * directories its queries select and the rest of the corpus is never
  * opened (partition pruning, asserted functionally in IvfIndexSpec via
  * inputFiles). Building the index costs one assignment pass; every
  * subsequent probe batch reuses it — the amortization that makes IVF
  * worthwhile over brute force at scale. */
object IvfIndex {

  def write(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dir: String): Unit = {
    Lake.writeParquet(centroids, s"$dir/centroids")
    Ann.ivfAssign(corpus, idCol, vecCol, centroids)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy("cell")
      .parquet(s"$dir/cells")
  }

  def centroids(spark: SparkSession, dir: String): DataFrame =
    Lake.readParquet(spark, s"$dir/centroids")

  /** The full cell frame (partition column restored to long). */
  def cells(spark: SparkSession, dir: String): DataFrame =
    Lake.readParquet(spark, s"$dir/cells")
      .withColumn("cell", col("cell").cast("long"))

  /** Cell read restricted to `cellIds` — the filter runs on the RAW
    * inferred partition column (casting the column first would wrap it
    * in an expression and silently disable partition pruning; the spec
    * asserts via inputFiles that pruning actually engages), with the
    * long restore applied after. */
  def prunedCells(spark: SparkSession, dir: String, cellIds: Seq[Long]): DataFrame = {
    val raw = Lake.readParquet(spark, s"$dir/cells")
    val lits: Seq[Any] = raw.schema("cell").dataType match {
      case org.apache.spark.sql.types.IntegerType => cellIds.map(_.toInt)
      case _ => cellIds
    }
    raw.where(col("cell").isin(lits: _*))
      .withColumn("cell", col("cell").cast("long"))
  }

  /** Probe the persisted index: compute the queries' probe-cell set
    * (bounded by the centroid count — a bounded driver collect), read
    * ONLY those cell partitions, and run the standard probe join.
    * Results are identical to probing a freshly-assigned frame
    * (spec-pinned); the difference is the read: cells outside the probe
    * set are pruned at the file listing, never scanned. */
  def probeTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = centroids(spark, dir)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = q.crossJoin(broadcast(cents.select(col("cid"), col("cvec"))))
      .select(col("query_id"), col("cid"),
        Ann.dot(col("q_vec"), col("cvec")).as("d"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d").desc, col("cid").asc)
    val probeCells = scored
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= nProbe)
      .select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ |centroids| values
    Ann.ivfProbeTopK(queries, prunedCells(spark, dir, probeCells), cents,
      idCol, vecCol, k, nProbe)
  }
}
