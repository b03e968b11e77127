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
    // normalize cid to long on the way in: probeTopK collects cids as
    // longs, and an int-typed caller frame would persist fine but crash
    // every later probe
    val cents = centroids.select(col("cid").cast("long").as("cid"), col("cvec"))
    Lake.writeParquet(cents, s"$dir/centroids")
    Ann.ivfAssign(corpus, idCol, vecCol, cents)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy("cell")
      .parquet(s"$dir/cells")
  }

  /** Fail loudly on a wrong/unwritten dir — Lake's missing-path
    * contract would otherwise surface as an opaque unresolved-column
    * error on the empty schemaless frame. */
  private def requireIndex(spark: SparkSession, dir: String): Unit =
    require(Lake.exists(spark, s"$dir/centroids") && Lake.exists(spark, s"$dir/cells"),
      s"no IVF index at '$dir' (missing centroids/ or cells/)")

  def centroids(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/centroids")
  }

  /** The full cell frame (partition column restored to long). */
  def cells(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/cells")
      .withColumn("cell", col("cell").cast("long"))
  }

  /** Cell read restricted to `cellIds` — the filter runs on the RAW
    * inferred partition column (casting the column first would wrap it
    * in an expression and silently disable partition pruning; the spec
    * asserts via inputFiles that pruning actually engages), with the
    * long restore applied after. */
  def prunedCells(spark: SparkSession, dir: String, cellIds: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    val raw = Lake.readParquet(spark, s"$dir/cells")
    val lits: Seq[Any] = raw.schema("cell").dataType match {
      case org.apache.spark.sql.types.IntegerType => cellIds.map(_.toInt)
      case _ => cellIds
    }
    raw.where(col("cell").isin(lits: _*))
      .withColumn("cell", col("cell").cast("long"))
  }

  /** Refresh a persisted index against corpus drift: warm-start the
    * Lloyd rounds from the STANDING centroids (Ann.ivfRefineCentroids —
    * few rounds recover the spherical-kmeans objective after drift,
    * and the objective is monotonically non-decreasing from the warm
    * start, so a refresh can only improve cell quality), reassign, and
    * land the refreshed index at `outDir` under the same layout —
    * every reader/probe contract (`centroids`/`cells`/`prunedCells`/
    * `probeTopK`) holds on the result. The corpus is the index's own
    * persisted vectors: refresh needs no re-supplied corpus frame.
    *
    * `outDir` must differ from `dir`: the refreshed index is written
    * while the standing one is still being lazily read (the
    * CurationRunner date-versioning discipline — a run never
    * overwrites an input; callers swap a "current" pointer after the
    * write, keeping the old version probe-able throughout). */
  def refresh(spark: SparkSession, dir: String, outDir: String,
      iters: Int): Unit = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // trailing slashes would defeat a plain URI compare ("/x/" vs "/x"
    // are the same directory) — normalize both before comparing
    def canon(p: String) =
      new java.net.URI(p).normalize().toString.replaceAll("/+$", "")
    require(canon(outDir) != canon(dir),
      s"refresh must write a NEW versioned index dir, not overwrite '$dir' in place")
    val corpus = cells(spark, dir).select(col("id"), col("v"))
    val refined = Ann.ivfRefineCentroids(corpus, "id", "v",
      centroids(spark, dir), iters)
    write(corpus, "id", "v", refined, outDir)
  }

  /** Probe the persisted index: compute the queries' probe-cell set
    * (bounded by the centroid count — a bounded driver collect), read
    * ONLY those cell partitions, and run the standard probe join.
    * Results are identical to probing a freshly-assigned frame
    * (spec-pinned); the difference is the read: cells outside the probe
    * set are pruned at the file listing, never scanned. */
  def probeTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    // ONE probes frame serves both the cell-list collect and the
    // candidate join (persisted: recomputing it would run the scoring
    // crossJoin + per-query window twice; CacheScope convention —
    // callers release after materializing)
    val probes = graft.ops.CacheScope.persist(
      Ann.ivfProbes(queries, centroids(spark, dir), idCol, vecCol, nProbe))
    val probeCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ |centroids| values
    Ann.ivfProbeTopKFromProbes(probes, prunedCells(spark, dir, probeCells), k)
  }
}
