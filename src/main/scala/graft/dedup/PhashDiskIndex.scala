package graft.dedup

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded-Hamming fingerprint index — the fourth pillar of
  * the index-lifecycle family (LshDiskIndex for text MinHash,
  * Bm25DiskIndex for ranked lexical, ann.IvfIndex for vectors): a
  * standing MEDIA corpus's perceptual hashes (image pHash, audio
  * fingerprints, any ≤64-bit [[Dedup.hammingNearDupPairs]] input)
  * band ONCE; a daily media delta probes "which standing items are
  * perceptual near-dups of these new ones" reading only the
  * (band, bucket) partitions its own hashes select. This is what
  * makes image/audio dedup INCREMENTAL: without it every crawl day
  * re-bands the whole standing corpus.
  *
  * Layout (the LshDiskIndex discipline):
  *   dir/bands/band=B/bucket=K/… (id, bval, hh, seq) — band value =
  *     the B-th bandBits-bit slice of the hash; bucket = bval mod
  *     n_buckets. The full hash RIDES ON the band rows (it is one
  *     long, unlike LSH shingle sets), so candidate verification
  *     costs no second read.
  *   dir/meta/  (total_bits, bands, n_buckets), validated consistent
  *     on every read.
  *   dir/tombstones/ (id, seq) — removals are markers (standing files
  *     immutable); a row is live iff its seq >= every tombstone seq
  *     for its id; [[compact]] folds them away.
  *
  * Probe exactness: pigeonhole — maxDist <= bands-1 guarantees two
  * hashes within the radius share at least one full band, so the
  * banded equi-join has EXACT recall (never all-pairs). The append/
  * retire/compact semantics and the probe==in-memory parity are
  * spec-pinned in PhashDiskIndexSpec; the q160 gate restates the
  * probe's pair set against the q133 oracle's closed-form pHash
  * replay.
  *
  * Scale: band rows are 4 longs; a 100 TB media corpus's index is
  * hashes×bands rows partitioned into bands×n_buckets dirs (use
  * O(hundreds+) buckets there; the gate uses 2 — directory count is
  * the write-cost driver at small scale, the q117/q118 lesson). A
  * probe reads min(|delta|·bands, bands·n_buckets) partitions. */
object PhashDiskIndex {

  private def bandRows(hashes: DataFrame, totalBits: Int, bands: Int,
      numBuckets: Int): DataFrame = {
    val bandBits = totalBits / bands
    val mask = (1L << bandBits) - 1
    hashes.select(col("id"), col("hh"),
        posexplode(array((0 until bands).map(i =>
          shiftrightunsigned(col("hh"), i * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bval")))
      .withColumn("band", col("band").cast("long"))
      .withColumn("bucket", pmod(col("bval"), lit(numBuckets.toLong)))
  }

  private def stagedIds(df: DataFrame, idCol: String, hashCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("hh"))

  private def writeIncrement(hashes: DataFrame, dir: String, totalBits: Int,
      bands: Int, numBuckets: Int, mode: SaveMode, seq: Long,
      writeMeta: Boolean): Unit = {
    // cluster rows by target partition dir before partitionBy (the
    // small-files discipline measured in LshDiskIndex)
    bandRows(hashes, totalBits, bands, numBuckets)
      .withColumn("seq", lit(seq))
      .repartition(col("band"), col("bucket"))
      .write.mode(mode).option("compression", "snappy")
      .partitionBy("band", "bucket")
      .parquet(s"$dir/bands")
    if (writeMeta)
      hashes.sparkSession.range(1).select(
          lit(totalBits.toLong).as("total_bits"),
          lit(bands.toLong).as("bands"),
          lit(numBuckets.toLong).as("n_buckets"))
        .write.mode(mode).option("compression", "snappy")
        .parquet(s"$dir/meta")
  }

  /** Build from scratch (Overwrite). bands >= 2 and totalBits a
    * multiple of bands in [bands, 64] — the hammingNearDupPairs
    * constraints, checked here so a bad shape can never be landed. */
  def write(df: DataFrame, idCol: String, hashCol: String, dir: String,
      totalBits: Int = 64, bands: Int = 8, numBuckets: Int = 16,
      seq: Long = 0L): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    require(bands >= 2 && totalBits % bands == 0 &&
        totalBits >= bands && totalBits <= 64,
      s"totalBits must be a multiple of $bands in [$bands, 64], got $totalBits")
    writeIncrement(stagedIds(df, idCol, hashCol), dir, totalBits, bands,
      numBuckets, SaveMode.Overwrite, seq, writeMeta = true)
    graft.ops.IndexLifecycle.clearTombstones(df.sparkSession, dir)
  }

  /** Append a disjoint delta under the standing shape. */
  def append(df: DataFrame, idCol: String, hashCol: String, dir: String,
      seq: Long = 0L): Unit = {
    val (totalBits, bands, numBuckets) = meta(df.sparkSession, dir)
    writeIncrement(stagedIds(df, idCol, hashCol), dir, totalBits, bands,
      numBuckets, SaveMode.Append, seq, writeMeta = false)
  }

  /** Retire ids — [[graft.ops.IndexLifecycle]]'s seq-tombstone rule:
    * markers kill rows with ingest seq STRICTLY below `seq`
    * (re-appends at the same seq stay live). */
  def retire(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String, seq: Long): Unit = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.writeTombstones(ids, idCol, dir, seq)
  }

  private def deadSeqs(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.ops.IndexLifecycle.deadSeqs(spark, dir)

  private def liveOnly(rows: DataFrame, dead: Option[DataFrame]): DataFrame =
    graft.ops.IndexLifecycle.liveOnly(rows, dead)

  def tombstoneCount(spark: SparkSession, dir: String): Long =
    graft.ops.IndexLifecycle.tombstoneCount(spark, dir)

  /** Fresh [[write]] of the live set under the standing shape —
    * identical probes, tombstones folded away. */
  def compact(spark: SparkSession, dir: String, df: DataFrame,
      idCol: String, hashCol: String, seq: Long): Unit = {
    val (totalBits, bands, numBuckets) = meta(spark, dir)
    write(df, idCol, hashCol, dir, totalBits, bands, numBuckets, seq)
  }

  private def requireIndex(spark: SparkSession, dir: String): Unit =
    graft.ops.IndexLifecycle.requireParts(spark, dir,
      Seq("bands", "meta"), "pHash index")

  /** (total_bits, bands, n_buckets), validated consistent. */
  def meta(spark: SparkSession, dir: String): (Int, Int, Int) = {
    requireIndex(spark, dir)
    val r = graft.ops.IndexLifecycle.singleMetaRow(spark, dir,
      Seq("total_bits", "bands", "n_buckets"), "pHash index")
    (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
  }

  /** The full band frame (partition columns restored to long). */
  def bands(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/bands")
      .withColumn("band", col("band").cast("long"))
      .withColumn("bucket", col("bucket").cast("long"))
  }

  /** Band rows restricted to the probe's (band, bucket) footprint —
    * filters the RAW inferred partition columns so pruning engages at
    * the file listing (the conjunctive isin pair is a superset of the
    * exact pair set; exactness is the equi-join's job). */
  def prunedBands(spark: SparkSession, dir: String, bandIds: Seq[Long],
      buckets: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.prunedBandBucket(spark, s"$dir/bands",
      bandIds, buckets)
  }

  /** Perceptual near-dups of a delta against standing ∪ delta — the
    * pair set [[Dedup.hammingNearDupPairs]] would return over the
    * union, restricted to pairs touching the delta (spec-pinned
    * parity), with the standing corpus read pruned to the delta's own
    * (band, bucket) footprint. Pigeonhole-exact for maxDist <=
    * bands-1 (enforced). Output (id_a, id_b, hamming_dist). */
  def probe(spark: SparkSession, dir: String, delta: DataFrame,
      idCol: String, hashCol: String, maxDist: Int): DataFrame = {
    val (totalBits, bands, numBuckets) = meta(spark, dir)
    require(maxDist <= bands - 1,
      s"$bands-band pigeonhole is exact only for maxDist <= ${bands - 1}, got $maxDist")
    val dead = deadSeqs(spark, dir)
    val dHash = stagedIds(delta, idCol, hashCol)
    val dBands = graft.ops.CacheScope.persist(
      bandRows(dHash, totalBits, bands, numBuckets))
    val foot = dBands.select(col("band"), col("bucket")).distinct().collect()
    val corpus = liveOnly(prunedBands(spark, dir,
      foot.map(_.getLong(0)).distinct.toSeq,
      foot.map(_.getLong(1)).distinct.toSeq), dead)
    val side = corpus.select(col("id"), col("band"), col("bval"), col("hh"))
      .unionByName(dBands.select(col("id"), col("band"), col("bval"), col("hh")))
    dBands.as("x").join(side.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"),
        Dedup.hamming(col("x.hh"), col("y.hh")).cast("long").as("hamming_dist"))
      .where(col("hamming_dist") <= maxDist)
      .distinct()
  }
}
