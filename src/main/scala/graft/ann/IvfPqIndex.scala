package graft.ann

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the compressed tier's disk lifecycle,
  * completing the versioned-index family (Bm25DiskIndex / LshDiskIndex
  * / PhashDiskIndex / IvfIndex, shared discipline in
  * [[graft.ops.IndexLifecycle]]): centroids and the residual codebooks
  * land as tiny parquets, the corpus lands as PACKED code rows
  * (id, cell, codes: array<long> by subspace, seq) partitioned by cell
  * BUCKET (centroid rank mod n_buckets — IvfIndex's bounded-directory
  * discipline), so a probe reads only the buckets its probed cells
  * hash into. The fp32 plane is NOT stored — that is the point of the
  * tier (m longs per vector instead of dim floats); rerank callers
  * supply the vector source.
  *
  * Lifecycle: standing files are immutable; [[append]] encodes a delta
  * under the STANDING centroids + codebooks and lands new files in the
  * bucket layout; [[retire]] writes (id, seq) tombstones; [[compact]]
  * rewrites the live code rows as a new versioned dir (no re-encode —
  * codes are the stored facts); [[refresh]] retrains centroids
  * (warm-start Lloyd) AND residual codebooks from a supplied vector
  * corpus — the drift response, which necessarily re-encodes. */
object IvfPqIndex {

  /** The rotated view of a vector frame — the exact ±1/√d Hadamard
    * rotation ([[Rotation.hadamard]], OPQ-lite) applied per row,
    * landing back in array<float> (the fused kernels' type; the float
    * round-trip is IEEE-exact so the oracle replays it). This is the
    * frame centroids and codebooks must be TRAINED on when an index
    * is written with `rotated = true`. */
  def rotatedView(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.withColumn(vecCol,
      Rotation.hadamard(col(vecCol), dim).cast("array<float>"))

  /** Write a fresh index. With `rotated = true` the index serves in
    * the ROTATED space end-to-end: `corpus` arrives in the original
    * embedding space and is rotated here at encode, the flag lands in
    * meta, and every later lifecycle step (append / probe / refresh)
    * rotates its own inputs — callers never pre-rotate. The supplied
    * `centroids` + `cb` are trained artifacts and MUST come from the
    * [[rotatedView]] of the training corpus when the flag is set
    * (rotation before training is what spreads per-dimension variance
    * across the m subspaces — the point of OPQ-lite). */
  def write(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cb: DataFrame, m: Int, dim: Int, dir: String,
      numBuckets: Int = 64, seq: Long = 0L,
      rotated: Boolean = false): Unit = {
    val cents = centroids.select(col("cid").cast("long").as("cid"), col("cvec"))
    val src = if (rotated) rotatedView(corpus, vecCol, dim) else corpus
    writeCodes(
      IvfPq.encodePacked(src, idCol, vecCol, cents, cb, m, dim),
      cents, cb, m, dim, dir, numBuckets, seq, rotated = rotated)
    // a fresh write IS compaction (IndexLifecycle's contract)
    graft.ops.IndexLifecycle.clearTombstones(corpus.sparkSession, dir)
  }

  /** (vec_id, cell, s, code) → (id, cell, codes array<long> by s) —
    * the relational pack the one-pass [[IvfPq.encodePacked]] kernel
    * replaced on the write path; kept as the executable specification
    * it is parity-pinned against (IvfPqSpec). */
  private[ann] def packCodes(enc: DataFrame): DataFrame =
    enc.groupBy(col("vec_id").as("id"), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        e => e.getField("code")).as("codes"))

  /** Land packed code rows under the bucket layout (shared by write /
    * append / compact). */
  private def writeCodes(packed: DataFrame, cents: DataFrame,
      cb: DataFrame, m: Int, dim: Int, dir: String, numBuckets: Int,
      seq: Long, mode: SaveMode = SaveMode.Overwrite,
      rotated: Boolean = false): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    val spark = packed.sparkSession
    if (mode == SaveMode.Overwrite) {
      Lake.writeParquet(cents, s"$dir/centroids")
      Lake.writeParquet(cb, s"$dir/codebooks")
      Lake.writeParquet(
        spark.range(1).select(lit(numBuckets.toLong).as("n_buckets"),
          lit(m.toLong).as("m"), lit(dim.toLong).as("dim"),
          lit(if (rotated) 1L else 0L).as("rotated")),
        s"$dir/meta")
    }
    packed
      .join(broadcast(IvfIndex.cellBuckets(cents, numBuckets)),
        col("cell") === col("cid"))
      .drop("cid")
      .withColumn("seq", lit(seq))
      .repartition(col("cbucket"))
      .write.mode(mode)
      .option("compression", "snappy")
      .partitionBy("cbucket")
      .parquet(s"$dir/codes")
  }

  /** Append a disjoint vector delta: encode under the STANDING
    * centroids + codebooks (cell and code identity are stable on
    * append — retrain is [[refresh]]'s job), land as NEW files in the
    * existing bucket layout. Disjointness of ids across increments is
    * the caller's contract (the family convention). */
  def append(delta: DataFrame, idCol: String, vecCol: String,
      dir: String, seq: Long = 0L): Unit = {
    val spark = delta.sparkSession
    requireIndex(spark, dir)
    val cents = centroids(spark, dir)
    val cb = codebooks(spark, dir)
    // one meta read serves all four fields (n_buckets/m/dim/rotated
    // were four separate tiny parquet jobs — pure fixed cost per
    // lifecycle step, and a real listing cost on an object store)
    val (n, m, dim, rot) = metaAll(spark, dir)
    val src = if (rot) rotatedView(delta, vecCol, dim) else delta
    writeCodes(
      IvfPq.encodePacked(src, idCol, vecCol, cents, cb, m, dim),
      cents, cb, m, dim, dir, n, seq, mode = SaveMode.Append)
  }

  /** Retire vectors — (id, seq) tombstones killing code rows with
    * ingest seq strictly below `seq` (the family discipline). */
  def retire(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String, seq: Long): Unit = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.writeTombstones(ids, idCol, dir, seq)
  }

  def tombstoneCount(spark: SparkSession, dir: String): Long =
    graft.ops.IndexLifecycle.tombstoneCount(spark, dir)

  /** Fold tombstones away by rewriting the LIVE code rows as a NEW
    * versioned dir — no re-encode (codes are the stored facts);
    * centroids and codebooks carry over unchanged. Land-beside +
    * pointer-swap (the IvfIndex.compact discipline and its
    * aliased-path guard). */
  def compact(spark: SparkSession, dir: String, outDir: String,
      seq: Long = 0L): Unit = {
    require(IvfIndex.canon(spark, outDir) != IvfIndex.canon(spark, dir),
      s"compact must write a NEW versioned index dir, not overwrite '$dir' in place")
    val (n, m, dim, rot) = metaAll(spark, dir)
    val cents = centroids(spark, dir)
    writeCodes(codes(spark, dir), cents, codebooks(spark, dir),
      m, dim, outDir, n, seq, rotated = rot)
    graft.ops.IndexLifecycle.clearTombstones(spark, outDir)
  }

  /** Retrain against corpus drift: warm-start the coarse centroids
    * from the standing ones ([[Ann.ivfRefineCentroids]]), retrain the
    * residual codebooks against the refined cells, re-encode, and land
    * at `outDir` (land-beside; callers swap the pointer). The vector
    * corpus is supplied — the compressed index does not store fp32. */
  def refresh(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, outDir: String, iters: Int,
      seq: Long = 0L): Unit = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(IvfIndex.canon(spark, outDir) != IvfIndex.canon(spark, dir),
      s"refresh must write a NEW versioned index dir, not overwrite '$dir' in place")
    val (n, m, dim, rot) = metaAll(spark, dir)
    // the standing centroids live in the index's serving space — with
    // rotation on, warm-start and retrain against the ROTATED corpus
    // view (write() re-applies the rotation at encode; the flag rides
    // to the new version)
    val src = if (rot) rotatedView(corpus, vecCol, dim) else corpus
    val refined = Ann.ivfRefineCentroids(src, idCol, vecCol,
      centroids(spark, dir), iters)
    val cb = IvfPq.trainCodebooks(src, idCol, vecCol, refined, m, dim)
    write(corpus, idCol, vecCol, refined, cb, m, dim, outDir, n, seq,
      rotated = rot)
  }

  private def requireIndex(spark: SparkSession, dir: String): Unit =
    graft.ops.IndexLifecycle.requireParts(spark, dir,
      Seq("centroids", "codebooks", "codes"), "IVF-PQ index")

  def centroids(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/centroids")
  }

  def codebooks(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/codebooks")
  }

  /** (n_buckets, m, dim) the index was written with. */
  def meta(spark: SparkSession, dir: String): (Int, Int, Int) = {
    val (n, m, dim, _) = metaAll(spark, dir)
    (n, m, dim)
  }

  /** Whether the index serves in the rotated (OPQ-lite) space —
    * stored in meta at write time so every lifecycle step agrees.
    * Indexes written before the flag existed read as not rotated. */
  def rotated(spark: SparkSession, dir: String): Boolean =
    metaAll(spark, dir)._4

  /** All meta fields in ONE read — (n_buckets, m, dim, rotated).
    * Every lifecycle step needs several of them; reading the tiny meta
    * parquet once per step instead of once per field removes pure
    * fixed cost locally and a per-field listing round-trip on an
    * object store. */
  def metaAll(spark: SparkSession, dir: String): (Int, Int, Int, Boolean) = {
    requireIndex(spark, dir)
    require(Lake.exists(spark, s"$dir/meta"),
      s"no IVF-PQ index meta at '$dir/meta' — rebuild with IvfPqIndex.write")
    val df = Lake.readParquet(spark, s"$dir/meta")
    val rotCol = if (df.columns.contains("rotated")) col("rotated")
      else lit(0L).as("rotated")
    val rows = df.select(col("n_buckets"), col("m"), col("dim"), rotCol)
      .distinct().collect()
    require(rows.length == 1,
      s"IVF-PQ index at '$dir' mixes ${rows.length} distinct configs — rebuild required")
    val r = rows(0)
    (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt,
      r.getLong(3) == 1L)
  }

  /** The full LIVE packed code frame (id, cell, codes). */
  def codes(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.liveOnly(
        Lake.readParquet(spark, s"$dir/codes"),
        graft.ops.IndexLifecycle.deadSeqs(spark, dir))
      .select(col("id"), col("cell"), col("codes"), col("seq"))
  }

  /** Code read restricted to `cellIds` — bucket pruning at the file
    * listing (the IvfIndex.prunedCells shape: raw partition-column
    * filter first, exact cell filter second). */
  def prunedCodes(spark: SparkSession, dir: String,
      cellIds: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    val (n, _, _) = meta(spark, dir)
    prunedCodesWith(spark, dir, centroids(spark, dir), n, cellIds)
  }

  /** [[prunedCodes]] over already-read centroids + meta — the probe
    * path reads both anyway; re-reading them here was one more meta
    * read and one more centroid read per probe (pure fixed cost, a
    * listing round-trip each on an object store). */
  private def prunedCodesWith(spark: SparkSession, dir: String,
      cents: DataFrame, nBuckets: Int, cellIds: Seq[Long]): DataFrame = {
    val buckets = IvfIndex.cellBuckets(cents, nBuckets)
      .where(col("cid").isin(cellIds: _*))
      .select(col("cbucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val raw = Lake.readParquet(spark, s"$dir/codes")
    graft.ops.IndexLifecycle.liveOnly(
        raw.where(col("cbucket").isin(
            graft.ops.IndexLifecycle.partitionLits(raw, "cbucket", buckets): _*) &&
          col("cell").isin(cellIds: _*)),
        graft.ops.IndexLifecycle.deadSeqs(spark, dir))
      .select(col("id"), col("cell"), col("codes"))
  }

  /** Probed-cell ADC scores against the persisted codes: probe cells
    * (fused kernel), read ONLY their buckets, unpack, score. Queries
    * arrive in the ORIGINAL embedding space; a rotated index rotates
    * them here — the rotation is a per-query expression, zero cost on
    * the corpus side of the plan. */
  def probeScores(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val cents = centroids(spark, dir)
    val cb = codebooks(spark, dir)
    val (n, m, dim, rot) = metaAll(spark, dir)
    val q = if (rot) rotatedView(queries, vecCol, dim) else queries
    val probes = graft.ops.CacheScope.persist(
      Ann.ivfProbes(q, cents, idCol, vecCol, nProbe))
    val probeCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ |centroids| values
    val unpacked = prunedCodesWith(spark, dir, cents, n, probeCells)
      .select(col("id").as("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("s", "code")))
    IvfPq.adcScoresFromProbes(probes, q, unpacked, cents, cb,
      idCol, vecCol, m, dim)
  }

  /** ADC top-k over the persisted compressed tier. Identical to the
    * in-memory [[IvfPq.probeTopK]] against the same artifacts
    * (spec-pinned); the difference is the read — buckets outside the
    * probe set are pruned at the file listing. */
  def probeTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    IvfPq.rankTopK(
      probeScores(spark, dir, queries, idCol, vecCol, nProbe), k)

  /** The serving ladder against the persisted index: ADC proposes,
    * the caller-supplied fp32 `corpus` reranks. On a rotated index
    * the PROPOSALS come from the rotated space (probeScores rotates
    * the queries) while the rerank scores exact dots in the ORIGINAL
    * space — rotation is orthogonal, so the original-space dot is the
    * true objective and callers never pre-rotate anything. */
  def probeRerankTopK(spark: SparkSession, dir: String, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, rerank: Int): DataFrame =
    IvfPq.rerankTopK(
      probeScores(spark, dir, queries, idCol, vecCol, nProbe),
      queries, corpus, idCol, vecCol, k, rerank)
}
