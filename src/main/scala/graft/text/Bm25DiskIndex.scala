package graft.text

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 index — the standing-corpus lifecycle behind
  * [[Retrieval.bm25TopKFromIndex]], mirroring [[graft.ann.IvfIndex]]'s
  * deployment shape: the corpus tokenizes ONCE at index time, postings
  * land partitioned by a token-hash bucket, and every later probe batch
  * reads only the bucket directories its query terms hash into —
  * partition pruning at the file listing, never a scan of the standing
  * postings (Bm25DiskIndexSpec asserts this via inputFiles, the
  * IvfIndexSpec discipline). Without this, every probe batch re-pays
  * the corpus tokenize + postings aggregation (the q90/q91/q96 cost
  * profile at sf0.1 — ~3.5 s each of pure rebuild).
  *
  * Daily ingest is APPEND-ONLY, composing [[Retrieval.mergeBm25Index]]'s
  * additivity with the on-disk layout: a delta's postings append into
  * the same bucket partitioning (new files in existing bucket dirs —
  * standing files are never rewritten) and its single stats row appends
  * as an increment; readers aggregate the increments. Disjointness of
  * document ids across appends is the caller's contract, as in
  * [[Retrieval.bm25Index]].
  *
  * Layout: `dir/postings/bucket=B/…` (id, dl, tok, tf) and `dir/stats`
  * (one row per increment: d_docs, t_toks, n_buckets). `n_buckets` is
  * fixed at [[write]] time and validated on append — probes compute
  * each term's bucket with the same [[TextFunctions.polyHash]] the
  * build used, so a mismatched bucket count would silently miss
  * postings; the guard makes it loud instead. */
object Bm25DiskIndex {

  /** Bucket of a token — shared by build and probe. polyHash (not a
    * JVM-internal hash) so the bucket assignment is a documented pure
    * function of the token bytes, reproducible across engines. */
  private def bucketOf(tok: org.apache.spark.sql.Column, n: Int) =
    TextFunctions.polyHash(tok, n.toLong)

  /** Build the index from scratch (Overwrite). `numBuckets` bounds the
    * probe-side file listing: a probe batch with T distinct terms opens
    * at most min(T, numBuckets) bucket directories. 64 keeps per-bucket
    * partition counts sane at sf-test scale; a 100 TB corpus would use
    * O(thousands) so each bucket stays executor-sized. */
  def write(docs: DataFrame, idCol: String, textCol: String, dir: String,
      numBuckets: Int = 64, seq: Long = 0L): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    val (postings, stats) = Retrieval.bm25Index(docs, idCol, textCol)
    // cluster by target bucket dir before the partitionBy write — every
    // task writing to every bucket dir is tasks × buckets tiny files
    // (the LshDiskIndex small-files discipline)
    postings.withColumn("bucket", bucketOf(col("tok"), numBuckets))
      .withColumn("seq", lit(seq))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy("bucket")
      .parquet(s"$dir/postings")
    stats.withColumn("n_buckets", lit(numBuckets.toLong))
      .withColumn("sseq", lit(null).cast("long"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(s"$dir/stats")
    // a fresh write IS compaction (IndexLifecycle's contract)
    graft.ops.IndexLifecycle.clearTombstones(docs.sparkSession, dir)
  }

  /** Append a disjoint delta (a daily ingest) — new postings files in
    * the existing bucket layout plus one stats increment row; the
    * standing index is never read or rewritten. Equivalent to
    * [[Retrieval.mergeBm25Index]] of the standing and delta indexes
    * (spec-pinned). `seq` stamps the increment for tombstone ordering
    * (pass a value >= every earlier increment's — the CurationRunner
    * uses the run date). */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String, seq: Long = 0L): Unit = {
    val n = numBuckets(docs.sparkSession, dir)
    val (postings, stats) = Retrieval.bm25Index(docs, idCol, textCol)
    postings.withColumn("bucket", bucketOf(col("tok"), n))
      .withColumn("seq", lit(seq))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Append)
      .option("compression", "snappy")
      .partitionBy("bucket")
      .parquet(s"$dir/postings")
    stats.withColumn("n_buckets", lit(n.toLong))
      .withColumn("sseq", lit(null).cast("long"))
      .write.mode(SaveMode.Append)
      .option("compression", "snappy")
      .parquet(s"$dir/stats")
  }

  /** Retire documents (the Lucene delete-bitmap discipline — standing
    * postings files are immutable, so "delete" is a marker plus a
    * NEGATIVE stats increment, never a rewrite): appends (id, seq)
    * tombstones killing every posting of those ids with ingest seq
    * STRICTLY below `seq` (rows re-appended at `seq` or later stay
    * live — a changed document retires and re-appends under the same
    * seq), and one stats row subtracting the retired docs' counts so
    * the aggregated (d_docs, t_toks) — and therefore idf and avgdl —
    * equal a fresh index over the live set exactly (spec-pinned).
    * `docs` must be the retired documents WITH their indexed text
    * (the previous curated snapshot has it); df needs no correction
    * because probes recount it from live postings.
    *
    * CONTRACT: every passed doc must actually be live in the index
    * with exactly this text — the stats decrement subtracts blind
    * (validating would mean scanning the corpus-sized postings ids,
    * the cost retire exists to avoid), so retiring a phantom id or
    * stale text skews idf/avgdl for every later probe. The daily
    * runner guarantees it by semi-joining the previous curated
    * corpus; do the same.
    *
    * Retire is IDEMPOTENT per (dir, seq): the stats decrement is
    * stamped with `seq` and [[stats]] folds duplicate-seq decrements
    * to one, so a crashed daily run re-executed from the top (the
    * normal ops reflex — retire runs before the `_applied` marker
    * lands) cannot double-subtract d_docs/t_toks. The flip side of
    * the contract: AT MOST ONE logical retire batch per seq — two
    * DIFFERENT batches at one seq collapse to one decrement (the
    * daily runner retires once per date-derived seq by construction;
    * distinct ad-hoc batches must use distinct seqs). Tombstones were
    * always idempotent (duplicate (id, seq) markers fold in the
    * per-id max). */
  def retire(docs: DataFrame, idCol: String, textCol: String,
      dir: String, seq: Long): Unit = {
    val spark = docs.sparkSession
    val n = numBuckets(spark, dir)
    graft.ops.IndexLifecycle.writeTombstones(docs, idCol, dir, seq)
    docs.select(size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
      .agg((-count(lit(1))).as("d_docs"),
        (-coalesce(sum(col("dl")), lit(0L))).as("t_toks"))
      .withColumn("n_buckets", lit(n.toLong))
      .withColumn("sseq", lit(seq))
      .write.mode(SaveMode.Append).option("compression", "snappy")
      .parquet(s"$dir/stats")
  }

  /** Distinct retired ids — the compaction trigger's numerator. */
  def tombstoneCount(spark: SparkSession, dir: String): Long =
    graft.ops.IndexLifecycle.tombstoneCount(spark, dir)

  /** Fold tombstones away: a fresh [[write]] of `docs` — the LIVE set,
    * i.e. the caller's current curated corpus — under the STANDING
    * bucket count (a changed count would scatter tokens across a
    * different layout; rebuild under a new one via an explicit
    * [[write]]). Probes before and after are identical; what changes
    * is the read footprint — dead postings stop occupying bucket
    * files, the stats fold to one clean row, and the tombstone
    * anti-set disappears from every probe. */
  def compact(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, seq: Long): Unit =
    write(docs, idCol, textCol, dir, numBuckets(spark, dir), seq)

  private def deadSeqs(spark: SparkSession, dir: String): Option[DataFrame] =
    graft.ops.IndexLifecycle.deadSeqs(spark, dir)

  private def liveOnly(rows: DataFrame, dead: Option[DataFrame]): DataFrame =
    graft.ops.IndexLifecycle.liveOnly(rows, dead)

  /** Fail loudly on a wrong/unwritten dir — Lake's missing-path
    * contract would otherwise surface as an opaque unresolved-column
    * error on the empty schemaless frame. */
  private def requireIndex(spark: SparkSession, dir: String): Unit =
    graft.ops.IndexLifecycle.requireParts(spark, dir,
      Seq("postings", "stats"), "BM25 index")

  /** The bucket count the index was built with (validated consistent
    * across increments — one bounded two-long collect). */
  def numBuckets(spark: SparkSession, dir: String): Int = {
    requireIndex(spark, dir)
    val r = Lake.readParquet(spark, s"$dir/stats")
      .agg(min(col("n_buckets")).as("lo"), max(col("n_buckets")).as("hi"))
      .collect()(0)
    require(!r.isNullAt(0), s"BM25 index at '$dir' has no stats increments")
    require(r.getLong(0) == r.getLong(1),
      s"BM25 index at '$dir' mixes bucket counts ${r.getLong(0)} and ${r.getLong(1)}")
    r.getLong(0).toInt
  }

  /** Aggregated single-row stats over all appended increments — the
    * exact frame [[Retrieval.bm25TopKFromIndex]] expects. Write/append
    * increments (sseq NULL) sum as-is; retire decrements (sseq = the
    * retire's seq) first fold to ONE row per seq, so a replayed retire
    * ([[retire]]'s idempotence contract) subtracts once. `min` picks
    * deterministically among replay rows (identical batches replay
    * identical values, so it is the identity there). */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    // mergeSchema: a mixed-vintage stats dir (pre-sseq files + stamped
    // files) must not let footer-inference pick an OLD footer and drop
    // sseq — that would nondeterministically lose the retire-dedup fold
    foldStats(spark.read.option("mergeSchema", "true").parquet(s"$dir/stats"))
  }

  /** The retire-idempotent stats fold over an already-read raw stats
    * frame — shared by [[stats]] and the read-once probe path. */
  private def foldStats(raw: DataFrame): DataFrame = {
    val rows = if (raw.columns.contains("sseq")) raw
      else raw.withColumn("sseq", lit(null).cast("long"))
    rows.select(col("d_docs"), col("t_toks"), col("sseq"))
      .groupBy(col("sseq")).agg(
        min(col("d_docs")).as("dd"), min(col("t_toks")).as("tt"),
        sum(col("d_docs")).as("sdd"), sum(col("t_toks")).as("stt"))
      .select(
        when(col("sseq").isNull, col("sdd")).otherwise(col("dd")).as("d_docs"),
        when(col("sseq").isNull, col("stt")).otherwise(col("tt")).as("t_toks"))
      .agg(
        coalesce(sum(col("d_docs")), lit(0L)).as("d_docs"),
        coalesce(sum(col("t_toks")), lit(0L)).as("t_toks"))
  }

  /** The full postings frame (partition column restored to long). */
  def postings(spark: SparkSession, dir: String): DataFrame = {
    requireIndex(spark, dir)
    Lake.readParquet(spark, s"$dir/postings")
      .withColumn("bucket", col("bucket").cast("long"))
  }

  /** Postings restricted to `buckets` — the filter runs on the RAW
    * inferred partition column (casting first would wrap it in an
    * expression and silently disable partition pruning; the spec
    * asserts via inputFiles that pruning actually engages). */
  def prunedPostings(spark: SparkSession, dir: String,
      buckets: Seq[Long]): DataFrame = {
    requireIndex(spark, dir)
    val raw = Lake.readParquet(spark, s"$dir/postings")
    raw.where(col("bucket").isin(
      graft.ops.IndexLifecycle.partitionLits(raw, "bucket", buckets): _*))
  }

  /** Probe the persisted index: compute the probe batch's distinct
    * terms, hash them to their bucket set (a bounded driver collect —
    * ≤ min(distinct query terms, numBuckets) longs, the IvfIndex
    * probe-cell discipline), read ONLY those bucket directories, and
    * run the standard integer-exact scoring. Results are identical to
    * [[Retrieval.bm25TopK]] over the raw corpus (spec-pinned); the
    * difference is the read — and that the corpus text is never
    * touched at all. */
  def probeTopK(spark: SparkSession, dir: String, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int): DataFrame = {
    // one requireIndex + one stats read serve the bucket-count collect,
    // the folded-stats frame, and the postings read below (numBuckets /
    // stats / prunedPostings each re-validated and re-listed the same
    // dirs — pure fixed cost per probe, a listing round-trip each on an
    // object store)
    requireIndex(spark, dir)
    val statsRaw = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/stats")
    val nRow = statsRaw
      .agg(min(col("n_buckets")).as("lo"), max(col("n_buckets")).as("hi"))
      .collect()(0)
    require(!nRow.isNullAt(0), s"BM25 index at '$dir' has no stats increments")
    require(nRow.getLong(0) == nRow.getLong(1),
      s"BM25 index at '$dir' mixes bucket counts ${nRow.getLong(0)} and ${nRow.getLong(1)}")
    val n = nRow.getLong(0).toInt
    val probeBuckets = queries
      .select(explode(array_distinct(TextFunctions.tokens(col(qtextCol)))).as("tok"))
      .select(bucketOf(col("tok"), n).as("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val raw = Lake.readParquet(spark, s"$dir/postings")
    val pruned = raw.where(col("bucket").isin(
      graft.ops.IndexLifecycle.partitionLits(raw, "bucket", probeBuckets): _*))
    // tombstone filter AFTER pruning: df and scores then come from live
    // postings only, and the negative stats increments have already
    // corrected d_docs/t_toks — probe == fresh index over the live set
    Retrieval.bm25TopKFromIndex(
      liveOnly(pruned.drop("bucket"), deadSeqs(spark, dir)).drop("seq"),
      foldStats(statsRaw), queries, qidCol, qtextCol, k)
  }
}
