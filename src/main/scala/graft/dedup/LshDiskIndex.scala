package graft.dedup

import graft.io.Lake
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH signature index — the third pillar of the
  * index-lifecycle family (ann.IvfIndex for vectors, text.Bm25DiskIndex
  * for ranked lexical): the standing corpus shingles, signs, and bands
  * ONCE; a daily delta probes "which standing documents near-duplicate
  * these new ones" reading only the band-bucket partitions its own
  * signatures select. Without it, every delta re-pays the corpus
  * shingle+signature pass that dominates the in-memory
  * [[Dedup.minhashNearDupPairsFocused]] at standing-corpus scale.
  *
  * Layout:
  *   dir/bands/band=B/bucket=K/…  (id, bhash) — the LSH join side,
  *     partitioned by (band, bucket = bhash mod n_buckets); a probe
  *     filters both partition columns to its own (band, bucket) sets,
  *     so the file listing opens only matching directories
  *     (numFiles-asserted in LshDiskIndexSpec).
  *   dir/sigs/                    (id, shingles) — the exact-Jaccard
  *     verification side, read once per probe and column-pruned;
  *     candidates are already bounded by the band join when they meet
  *     it.
  *   dir/meta/                    one row per increment: the
  *     MinHashConfig shape + n_buckets, validated consistent on every
  *     read (mixed shapes would silently miss candidates — loud
  *     instead).
  *
  * Daily ingest is APPEND-ONLY ([[append]]): a delta's band rows and
  * shingle sets land as new files; nothing standing is rewritten.
  * Disjointness of LIVE document ids across increments is the caller's
  * contract (as in Bm25DiskIndex). Signatures are a pure per-document
  * function of fixed hash params, so increment-built signatures equal
  * what a one-shot build would produce — the parity LshDiskIndexSpec
  * pins against the in-memory focused pipeline.
  *
  * Removals ride TOMBSTONES (the Lucene delete-bitmap discipline —
  * standing files are immutable, so "delete" is a marker, not a
  * rewrite): every indexed row carries the `seq` of the increment that
  * wrote it, [[retire]] appends (id, seq) markers, and a row is LIVE
  * iff its seq is >= every tombstone seq for its id. A changed
  * document therefore retires at seq s and re-appends at the same s —
  * the old rows die, the new ones live, and probes see exactly the
  * current corpus (spec-pinned against a fresh index over the live
  * set). Tombstones are read whole per probe — bounded by the retired
  * doc count; when that grows past a fraction of the index, compaction
  * (a fresh [[write]] of the live set) folds them away. */
object LshDiskIndex {

  import Dedup.MinHashConfig

  /** Per-document staged frame: (id, shingles, sig). */
  private def staged(docs: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toks = docs.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(parts)
    val shingled = toks.select(col("id"),
      array_distinct(TextFunctions.wordShinglesFrom(col("toks"), cfg.shingleSize))
        .as("shingles"))
    shingled.select(col("id"), col("shingles"),
      graft.functions.MinHashSig.minhashSig(
        Dedup.shingleHashes(col("shingles")), cfg.numHashes).as("sig"))
  }

  /** (id, band, bhash, bucket) band rows of a staged frame. */
  private def bandRows(st: DataFrame, cfg: MinHashConfig, numBuckets: Int) =
    st.select(col("id"),
        posexplode(Dedup.bandHashesFrom(col("sig"), cfg)).as(Seq("band", "bhash")))
      .withColumn("band", col("band").cast("long"))
      .withColumn("bucket", pmod(col("bhash"), lit(numBuckets.toLong)))

  private def writeIncrement(docs: DataFrame, idCol: String, textCol: String,
      dir: String, cfg: MinHashConfig, numBuckets: Int, mode: SaveMode,
      seq: Long, writeMeta: Boolean = true): Unit = {
    val st = graft.ops.CacheScope.persist(staged(docs, idCol, textCol, cfg))
    // cluster rows by their target partition dir before the partitionBy
    // write: without this every task writes to every (band, bucket) dir
    // (tasks × bands × buckets tiny files — measured 97 s at sf0.1 vs
    // ~1 file per dir after; the same small-files discipline a real
    // lake job applies)
    bandRows(st, cfg, numBuckets)
      .withColumn("seq", lit(seq))
      .repartition(col("band"), col("bucket"))
      .write.mode(mode).option("compression", "snappy")
      .partitionBy("band", "bucket")
      .parquet(s"$dir/bands")
    st.select(col("id"), col("shingles"), lit(seq).as("seq"))
      .write.mode(mode).option("compression", "snappy")
      .parquet(s"$dir/sigs")
    if (writeMeta)
      docs.sparkSession.range(1).select(
          lit(cfg.numHashes.toLong).as("num_hashes"),
          lit(cfg.shingleSize.toLong).as("shingle_size"),
          lit(cfg.bands.toLong).as("bands"),
          lit(numBuckets.toLong).as("n_buckets"))
        .write.mode(mode).option("compression", "snappy")
        .parquet(s"$dir/meta")
  }

  /** Build the index from scratch (Overwrite). `numBuckets` bounds the
    * per-band fan-out of the probe-side file listing; at test scale 16
    * keeps directory counts sane, at 100 TB use O(thousands) so each
    * (band, bucket) partition stays executor-sized. */
  def write(docs: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: MinHashConfig = MinHashConfig(), numBuckets: Int = 16,
      seq: Long = 0L): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    writeIncrement(docs, idCol, textCol, dir, cfg, numBuckets,
      SaveMode.Overwrite, seq)
    // a fresh write IS compaction (IndexLifecycle's contract)
    graft.ops.IndexLifecycle.clearTombstones(docs.sparkSession, dir)
  }

  /** Append a disjoint delta under the standing config — new files
    * only; the standing index is never read or rewritten. `seq` stamps
    * the increment for tombstone ordering: pass a value >= every
    * earlier increment's (the CurationRunner uses the run date). */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String, seq: Long = 0L): Unit = {
    val (cfg, numBuckets) = meta(docs.sparkSession, dir)
    // the config just read IS the config this increment writes under —
    // re-appending an identical meta row would only cost a write job
    // (meta() folds duplicates via distinct, so it was never load-bearing)
    writeIncrement(docs, idCol, textCol, dir, cfg, numBuckets,
      SaveMode.Append, seq, writeMeta = false)
  }

  /** Retire documents — [[graft.ops.IndexLifecycle]]'s seq-tombstone
    * rule: markers kill rows with ingest seq STRICTLY below `seq`, so
    * a changed document retires and re-appends under the same seq.
    * Standing files are never touched. `ids` is one column of doc ids. */
  def retire(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String, seq: Long): Unit = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.writeTombstones(ids, idCol, dir, seq)
  }

  private def deadSeqs(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.ops.IndexLifecycle.deadSeqs(spark, dir)

  private def liveOnly(rows: DataFrame, dead: Option[DataFrame]): DataFrame =
    graft.ops.IndexLifecycle.liveOnly(rows, dead)

  /** Distinct retired ids — the compaction trigger's numerator. */
  def tombstoneCount(spark: SparkSession, dir: String): Long =
    graft.ops.IndexLifecycle.tombstoneCount(spark, dir)

  /** Fold tombstones away: a fresh [[write]] of `docs` — the LIVE set,
    * i.e. the caller's current curated corpus — under the STANDING
    * config (a config change would silently shift every band hash;
    * rebuild under a new config via an explicit [[write]] instead).
    * Probes before and after are identical (write==live parity is the
    * retire contract); what changes is the read footprint — dead rows
    * stop occupying band files and the tombstone anti-set disappears
    * from every probe. */
  def compact(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, seq: Long): Unit = {
    val (cfg, numBuckets) = meta(spark, dir)
    write(docs, idCol, textCol, dir, cfg, numBuckets, seq)
  }

  private def requireIndex(spark: SparkSession, dir: String): Unit =
    graft.ops.IndexLifecycle.requireParts(spark, dir,
      Seq("bands", "sigs", "meta"), "LSH index")

  /** The index's MinHash shape + bucket count, validated consistent
    * across increments (one bounded collect). */
  def meta(spark: SparkSession, dir: String): (MinHashConfig, Int) = {
    requireIndex(spark, dir)
    val r = graft.ops.IndexLifecycle.singleMetaRow(spark, dir,
      Seq("num_hashes", "shingle_size", "bands", "n_buckets"), "LSH index")
    (MinHashConfig(r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt),
      r.getLong(3).toInt)
  }

  /** The full band frame (partition columns restored to long). */
  def bands(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/bands")
      .withColumn("band", col("band").cast("long"))
      .withColumn("bucket", col("bucket").cast("long"))
  }

  /** Band rows restricted to the probe's (band, bucket) footprint —
    * filters on the RAW inferred partition columns so pruning engages
    * at the file listing. The conjunctive isin pair is a superset of
    * the exact (band, bucket) pair set; exactness is the equi-join's
    * job, pruning only needs to bound the read. */
  def prunedBands(spark: SparkSession, dir: String, bandIds: Seq[Long],
      buckets: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    graft.ops.IndexLifecycle.prunedBandBucket(spark, s"$dir/bands",
      bandIds, buckets)
  }

  /** Near-duplicates of a delta against standing ∪ delta — the result
    * [[Dedup.minhashNearDupPairsFocused]] would return over the union
    * with the delta focused (spec-pinned parity), but the standing
    * corpus pays nothing: its band rows are read pruned to the delta's
    * own (band, bucket) footprint and its shingle sets are read only
    * to verify the already-bounded candidates. Output:
    * (id_a, id_b, jaccard ≥ threshold), endpoints normalized. */
  def probe(spark: SparkSession, dir: String, delta: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    val (cfg, numBuckets) = meta(spark, dir)
    val dead = deadSeqs(spark, dir)
    val st = graft.ops.CacheScope.persist(staged(delta, idCol, textCol, cfg))
    val dBands = graft.ops.CacheScope.persist(bandRows(st, cfg, numBuckets))
    // the probe footprint: bounded by min(|delta|·bands, bands·buckets)
    val foot = dBands.select(col("band"), col("bucket")).distinct().collect()
    val corpus = liveOnly(prunedBands(spark, dir,
      foot.map(_.getLong(0)).distinct.toSeq, foot.map(_.getLong(1)).distinct.toSeq),
      dead)
    // delta × (standing ∪ delta): near-dups among the new documents
    // count too (the focused-pipeline contract)
    val side = corpus.select(col("id"), col("band"), col("bhash"))
      .unionByName(dBands.select(col("id"), col("band"), col("bhash")))
    val cand = dBands.as("x").join(side.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
      .distinct()
    val sets = liveOnly(Lake.readParquet(spark, s"$dir/sigs"), dead)
      .select(col("id"), col("shingles"))
      .unionByName(st.select(col("id"), col("shingles")))
    cand
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double").as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        graft.functions.Fence.fence(
          col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
