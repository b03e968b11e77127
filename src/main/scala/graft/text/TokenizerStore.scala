package graft.text

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer lifecycle — the deployment story for the BPE
  * family, mirroring the disk indexes' discipline: the learned
  * artifact (merge table + word→segmentation frame) lands versioned
  * with a current-version pointer, and the ADDITIVE learning state
  * (word-type counts) accumulates as append-only increments so a
  * daily delta folds in O(|delta|) and a re-learn starts from the
  * exact counts a from-scratch tokenize of the full corpus would
  * produce ([[Bpe.mergeWordCounts]] associativity, BpeSpec-pinned).
  *
  * Layout under `root`:
  *   counts/      (word, freq) increments, append-only; fold on read.
  *                Increments may be NEGATIVE (a changed/removed
  *                document retires its old counts), so the folded
  *                frame equals wordCounts(current corpus) exactly;
  *                words folding to freq <= 0 drop out.
  *   v<tag>/merges    (merge_rank, l_sym, r_sym, pair_count)
  *   v<tag>/segments  (word, freq, seg) — [[Bpe.encode]]'s table
  *   ptr          one-row (version) — the serving artifact
  *
  * Refresh ([[refresh]]) re-learns from the folded counts and lands a
  * NEW version before the pointer swaps — the old version stays
  * encode-able throughout (the IvfIndex.refresh discipline). The
  * learn's outputs are localCheckpoint-materialized before any write,
  * so nothing the write touches is still being lazily read. */
object TokenizerStore {

  def countsPath(root: String) = s"$root/counts"

  /** Append a (word, freq) increment — positive for arriving text,
    * negative (pre-negated by the caller) for departing text.
    *
    * `seq` stamps the batch for replay idempotence (the
    * Bm25DiskIndex.stats discipline): a stamped batch is pre-folded to
    * ONE net row per word and [[foldedCounts]] keeps one copy per
    * (cseq, word), so a crashed run that re-appends the same delta
    * (the CurationRunner crash window between appendCounts and its
    * `_applied` marker) folds exactly once. Every stamped row also
    * carries the batch's word count (`bn`) and an order-independent
    * (word, freq) fingerprint (`bfp`), so [[foldedCounts]] can detect
    * a seq replayed with a DIFFERENT word set (words added, removed,
    * or swapped — cases where per-word freq comparison alone is
    * blind, each group having one row). Unstamped appends (seq = None)
    * keep the plain additive semantics. */
  def appendCounts(increment: DataFrame, root: String,
      seq: Option[Long] = None): Unit = {
    val batch = seq match {
      case Some(s) =>
        val net = increment.select(col("word"), col("freq"))
          .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
          .where(col("freq") =!= 0L)
        // batch stats ride on every row (broadcast of a 1-row agg):
        // fp terms are mod-bounded so their sum never overflows a long
        // at any realistic batch size (ANSI-safe)
        val stats = net.agg(count(lit(1)).as("bn"),
          sum(pmod(xxhash64(col("word"), col("freq")), lit(1000000007L)))
            .as("bfp"))
        net.crossJoin(broadcast(stats))
          .select(col("word"), col("freq"), lit(s).as("cseq"),
            col("bn"), col("bfp"))
      case None => increment
        .select(col("word"), col("freq"), lit(null).cast("long").as("cseq"),
          lit(null).cast("long").as("bn"), lit(null).cast("long").as("bfp"))
    }
    batch.write.mode(SaveMode.Append).option("compression", "snappy")
      .parquet(countsPath(root))
  }

  /** The folded learning state: one row per word with net freq > 0.
    * Stamped increments (cseq non-null) first collapse to one row per
    * (cseq, word) — replay rows are bit-identical, so min == max and
    * either is the one true value. A seq replayed with a NON-identical
    * batch (a day re-run after a config or upstream change without
    * clearing counts) would silently merge wrong state, so the fold
    * ASSERTS identity at two levels, raising in-plan rather than
    * collapsing to an arbitrary pick:
    *  - per (cseq, word): min(freq) != max(freq) — conflicting freqs
    *    for a shared word;
    *  - per cseq, against the batch stats stamped at append time: the
    *    actual distinct word count must equal the stamped `bn` and the
    *    refolded (word, freq) fingerprint the stamped `bfp` — this is
    *    what catches words ADDED, REMOVED, or SWAPPED in a replay
    *    (each (cseq, word) group then has one row, so the freq check
    *    alone is blind). Stamps written before the bn/bfp columns
    *    existed are null and skip the batch-level check (the freq-
    *    conflict check still applies); unstamped rows sum as-is. */
  def foldedCounts(spark: SparkSession, root: String): DataFrame = {
    val path = countsPath(root)
    // mergeSchema: a mixed-vintage counts dir (pre-cseq files + stamped
    // files) must not let footer-inference drop the cseq column
    val raw = if (!Lake.exists(spark, path)) Lake.readParquet(spark, path)
      else spark.read.option("mergeSchema", "true").parquet(path)
    val withCseq = if (raw.columns.contains("cseq")) raw
      else raw.withColumn("cseq", lit(null).cast("long"))
    val rows = Seq("bn", "bfp").foldLeft(withCseq) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast("long"))
    }
    val perWord = rows.groupBy(col("cseq"), col("word"))
      .agg(min(col("freq")).as("one"), max(col("freq")).as("mx"),
        sum(col("freq")).as("all"),
        min(col("bn")).as("gbn1"), max(col("bn")).as("gbn2"),
        min(col("bfp")).as("gfp1"), max(col("bfp")).as("gfp2"))
    // Batch-level replay check. Within-group stamp conflicts (a shared
    // word carrying both vintages' bn/bfp) surface here too: the group
    // min/max spread makes bn1 != bn2 / fp1 != fp2 across the cseq.
    // Disjoint-word replays surface as n_act or fp_act mismatching the
    // (consistent) stamp. The violation set is tiny (one row per bad
    // cseq) — broadcast back onto the fold.
    val viol = perWord.where(col("cseq").isNotNull)
      .groupBy(col("cseq"))
      .agg(count(lit(1)).as("n_act"),
        sum(pmod(xxhash64(col("word"), col("one")), lit(1000000007L)))
          .as("fp_act"),
        min(col("gbn1")).as("bn1"), max(col("gbn2")).as("bn2"),
        min(col("gfp1")).as("fp1"), max(col("gfp2")).as("fp2"))
      .where(col("bn1").isNotNull &&
        (col("bn1") =!= col("bn2") || col("n_act") =!= col("bn2") ||
         col("fp1") =!= col("fp2") || col("fp_act") =!= col("fp2")))
      .select(col("cseq"), lit(true).as("batch_conflict"))
    perWord.join(broadcast(viol), Seq("cseq"), "left")
      .select(col("word"),
        when(col("cseq").isNull, col("all"))
          .when(col("one") =!= col("mx"), raise_error(concat(
            lit("TokenizerStore: seq "), col("cseq").cast("string"),
            lit(" was replayed with a non-identical batch (word '"),
            col("word"), lit("' has conflicting freqs) — clear or "),
            lit("re-stamp the day's counts before re-running"))).cast("long"))
          .when(col("batch_conflict"), raise_error(concat(
            lit("TokenizerStore: seq "), col("cseq").cast("string"),
            lit(" was replayed with a non-identical batch (word set "),
            lit("differs from the stamped batch stats) — clear or "),
            lit("re-stamp the day's counts before re-running"))).cast("long"))
          .otherwise(col("one")).as("freq"))
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
      .where(col("freq") > 0)
  }

  /** Learn from the folded counts and land version `tag` (no pointer
    * swap — [[setCurrentVersion]] after, so a crashed refresh leaves
    * the old version serving). Returns the learned merge count. */
  def refresh(spark: SparkSession, root: String, tag: String,
      numMerges: Int): Int = {
    val (merges, seg) = Bpe.learnFromCounts(foldedCounts(spark, root), numMerges)
    import spark.implicits._
    Lake.writeParquet(
      merges.map(m => (m.rank, m.l, m.r, m.count))
        .toDF("merge_rank", "l_sym", "r_sym", "pair_count"),
      s"$root/$tag/merges")
    Lake.writeParquet(seg.select(col("word"), col("freq"), col("seg")),
      s"$root/$tag/segments")
    merges.size
  }

  def currentVersion(spark: SparkSession, root: String): Option[String] =
    if (!Lake.exists(spark, s"$root/ptr")) None
    else Some(Lake.readParquet(spark, s"$root/ptr")
      .select(col("version")).collect()(0).getString(0))

  def setCurrentVersion(spark: SparkSession, root: String, version: String): Unit = {
    require(Lake.exists(spark, s"$root/$version/segments"),
      s"no tokenizer version at '$root/$version' — land it before pointing at it")
    Lake.writeParquet(
      spark.range(1).select(lit(version).as("version")), s"$root/ptr")
  }

  def segments(spark: SparkSession, root: String, version: String): DataFrame =
    Lake.readParquet(spark, s"$root/$version/segments")

  def merges(spark: SparkSession, root: String, version: String): DataFrame =
    Lake.readParquet(spark, s"$root/$version/merges")

  /** Encode a corpus with the CURRENT artifact — the serving path
    * (broadcast word→seg join; unseen words char-fall-back, the
    * [[Bpe.encode]] contract). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      root: String): DataFrame = {
    val spark = docs.sparkSession
    val ver = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no current tokenizer version under '$root' — refresh + point first"))
    Bpe.encode(docs, idCol, textCol, segments(spark, root, ver))
  }
}
