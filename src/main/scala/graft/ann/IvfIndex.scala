package graft.ann

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the 100 TB deployment shape the probe path is
  * designed for: centroids land as a tiny parquet, cell assignments
  * land partitioned by CELL BUCKET (centroid RANK mod n_buckets — the
  * same bounded-directory discipline as Bm25DiskIndex's token buckets
  * and LshDiskIndex's band buckets: with ~√n cells, one directory per
  * cell would be a million directories at web scale and the write cost
  * is directory-count-bound), so a probe reads only the bucket
  * directories its probed cells hash into and filters to the exact
  * cells inside them — the rest of the corpus is never opened
  * (partition pruning, asserted functionally in IvfIndexSpec via
  * inputFiles). Building the index costs one assignment pass; every
  * subsequent probe batch reuses it — the amortization that makes IVF
  * worthwhile over brute force at scale. */
object IvfIndex {

  /** Bucket assignment for cell ids: RANK of the cid in ascending cid
    * order, mod `numBuckets` — NOT `cid mod n`, because centroid ids
    * are caller-chosen and may share arithmetic structure with the
    * modulus (a stride-16 cid family mod 64 collapses onto 4 residues,
    * so 4 directories carry the whole index and bucket pruning prunes
    * nothing). Rank is id-structure-independent and perfectly balanced
    * by construction. The window runs over the centroid frame only —
    * bounded (~√n rows), the codebase's benign-bounded-window case. */
  private[ann] def cellBuckets(cents: DataFrame, numBuckets: Int): DataFrame =
    cents.select(col("cid"),
      pmod(
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("cid"))).cast("long") - 1L,
        lit(numBuckets.toLong)).as("cbucket"))

  def write(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dir: String, numBuckets: Int = 64,
      seq: Long = 0L): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    // normalize cid to long on the way in: probeTopK collects cids as
    // longs, and an int-typed caller frame would persist fine but crash
    // every later probe
    val cents = centroids.select(col("cid").cast("long").as("cid"), col("cvec"))
    Lake.writeParquet(cents, s"$dir/centroids")
    // cluster by bucket before the partitionBy write (the LshDiskIndex
    // small-files discipline: without it every task writes every dir)
    Ann.ivfAssign(corpus, idCol, vecCol, cents)
      .join(broadcast(cellBuckets(cents, numBuckets)),
        col("cell") === col("cid"))
      .drop("cid")
      .withColumn("seq", lit(seq))
      .repartition(col("cbucket"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy("cbucket")
      .parquet(s"$dir/cells")
    Lake.writeParquet(
      corpus.sparkSession.range(1)
        .select(lit(numBuckets.toLong).as("n_buckets")),
      s"$dir/meta")
    // a fresh write IS compaction (IndexLifecycle's contract)
    graft.ops.IndexLifecycle.clearTombstones(corpus.sparkSession, dir)
  }

  /** Append a disjoint vector delta under the STANDING centroids — the
    * daily-ingest path (vectors: this; ranked lexical:
    * Bm25DiskIndex.append; near-dup: LshDiskIndex.append): the delta
    * assigns against the persisted centroids and its cell rows land as
    * NEW files in the existing bucket layout; standing cells are never
    * read or rewritten. Cell identity is stable on append — centroids
    * do not move (drift is [[refresh]]'s job, which rewrites a new
    * version from ALL of the index's vectors, the delta included), so
    * probing the appended index equals probing a fresh index over the
    * union (spec-pinned). Disjointness of ids across increments is the
    * caller's contract, as on the text indexes. */
  def append(delta: DataFrame, idCol: String, vecCol: String,
      dir: String, seq: Long = 0L): Unit = {
    val spark = delta.sparkSession
    requireIndex(spark, dir)
    val cents = centroids(spark, dir)
    val n = numBuckets(spark, dir)
    Ann.ivfAssign(delta, idCol, vecCol, cents)
      .join(broadcast(cellBuckets(cents, n)), col("cell") === col("cid"))
      .drop("cid")
      .withColumn("seq", lit(seq))
      .repartition(col("cbucket"))
      .write.mode(SaveMode.Append)
      .option("compression", "snappy")
      .partitionBy("cbucket")
      .parquet(s"$dir/cells")
  }

  /** Retire vectors (the text indexes' tombstone discipline for the
    * vector family — a removed or re-embedded document's OLD vector
    * must leave the probe set): appends (id, seq) markers killing
    * every cell row of those ids with ingest seq STRICTLY below `seq`;
    * rows (re-)appended at `seq` or later stay live, so a re-embedded
    * id retires and re-appends under one seq. Standing files are never
    * touched. */
  def retire(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String, seq: Long): Unit = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.writeTombstones(ids, idCol, dir, seq)
  }

  /** Distinct retired ids — the compaction trigger's numerator. */
  def tombstoneCount(spark: SparkSession, dir: String): Long =
    graft.ops.IndexLifecycle.tombstoneCount(spark, dir)

  private def deadSeqs(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.ops.IndexLifecycle.deadSeqs(spark, dir)

  private def liveOnly(rows: DataFrame, dead: Option[DataFrame]): DataFrame =
    graft.ops.IndexLifecycle.liveOnly(rows, dead)

  /** Fold tombstones away by rewriting the LIVE rows as a NEW
    * versioned index dir. Unlike the text indexes' in-place [[
    * graft.text.Bm25DiskIndex.compact]] (whose input is the EXTERNAL
    * curated corpus), this rewrite lazily READS the index being
    * compacted — landing in place would truncate its own input, so it
    * follows [[refresh]]'s land-beside + pointer-swap discipline (and
    * shares its aliased-path guard). Centroids carry over unchanged;
    * assignment is deterministic, so cells are identical. */
  def compact(spark: SparkSession, dir: String, outDir: String,
      seq: Long = 0L): Unit = {
    require(canon(spark, outDir) != canon(spark, dir),
      s"compact must write a NEW versioned index dir, not overwrite '$dir' in place")
    write(cells(spark, dir).select(col("id"), col("v")), "id", "v",
      centroids(spark, dir), outDir, numBuckets(spark, dir), seq)
  }

  /** Fail loudly on a wrong/unwritten dir — Lake's missing-path
    * contract would otherwise surface as an opaque unresolved-column
    * error on the empty schemaless frame. */
  private def requireIndex(spark: SparkSession, dir: String): Unit =
    graft.ops.IndexLifecycle.requireParts(spark, dir,
      Seq("centroids", "cells"), "IVF index")

  def centroids(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/centroids")
  }

  /** The bucket count the index was written with. */
  def numBuckets(spark: SparkSession, dir: String): Int = {
    requireIndex(spark, dir)
    require(Lake.exists(spark, s"$dir/meta"),
      s"no IVF index meta at '$dir/meta' — rebuild with IvfIndex.write")
    Lake.readParquet(spark, s"$dir/meta")
      .select(col("n_buckets")).collect()(0).getLong(0).toInt
  }

  /** The full LIVE cell frame (id, v, cell) — tombstoned rows
    * filtered (so [[refresh]] retrains on live vectors only, and its
    * rewrite doubles as compaction). */
  def cells(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    liveOnly(Lake.readParquet(spark, s"$dir/cells"), deadSeqs(spark, dir))
      .select(col("id"), col("v"), col("cell"))
  }

  /** Cell read restricted to `cellIds`: the probed cells' BUCKET set
    * prunes directories at the file listing (the filter runs on the
    * RAW inferred partition column — casting first would wrap it in an
    * expression and silently disable pruning; the spec asserts via
    * inputFiles that it engages), and the exact-cell filter cuts the
    * surviving buckets' rows. */
  def prunedCells(spark: SparkSession, dir: String, cellIds: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    val n = numBuckets(spark, dir)
    // probed cells -> their rank buckets, via the same bounded
    // centroid-rank mapping the write used (one bounded collect,
    // ≤ |probed cells| rows)
    val buckets = cellBuckets(centroids(spark, dir), n)
      .where(col("cid").isin(cellIds: _*))
      .select(col("cbucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val raw = Lake.readParquet(spark, s"$dir/cells")
    liveOnly(
        raw.where(col("cbucket").isin(
            graft.ops.IndexLifecycle.partitionLits(raw, "cbucket", buckets): _*) &&
          col("cell").isin(cellIds: _*)),
        deadSeqs(spark, dir))
      .select(col("id"), col("v"), col("cell"))
  }

  /** Qualify a path through the Hadoop FileSystem before comparing: a
    * plain string/URI compare misses aliases of the same directory
    * ("file:/x" vs "/x", relative vs absolute, trailing slashes), and
    * an aliased outDir would pass a no-self-overwrite guard while the
    * Overwrite write truncates the very cells being lazily read. */
  private[ann] def canon(spark: SparkSession, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(hp).toUri.normalize().toString.replaceAll("/+$", "")
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
    require(canon(spark, outDir) != canon(spark, dir),
      s"refresh must write a NEW versioned index dir, not overwrite '$dir' in place")
    val corpus = cells(spark, dir).select(col("id"), col("v"))
    val refined = Ann.ivfRefineCentroids(corpus, "id", "v",
      centroids(spark, dir), iters)
    write(corpus, "id", "v", refined, outDir, numBuckets(spark, dir))
  }

  /** Version-pointer discipline for a refreshing index family: versions
    * land as sibling dirs under `root` (the [[refresh]] contract — a
    * refresh never overwrites the dir it reads), and a one-row parquet
    * at `root/ptr` names the current one. Readers resolve the pointer,
    * then probe `root/<version>`; a refresh lands the new version fully
    * before the pointer swaps, so the old version stays probe-able
    * throughout (the CurationRunner date-versioning discipline). */
  def currentVersion(spark: SparkSession, root: String): Option[String] =
    if (!Lake.exists(spark, s"$root/ptr")) None
    else Some(Lake.readParquet(spark, s"$root/ptr")
      .select(col("version")).collect()(0).getString(0))

  def setCurrentVersion(spark: SparkSession, root: String, version: String): Unit = {
    require(Lake.exists(spark, s"$root/$version/centroids"),
      s"no IVF index version at '$root/$version' — land the version before pointing at it")
    Lake.writeParquet(
      spark.range(1).select(lit(version).as("version")), s"$root/ptr")
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
