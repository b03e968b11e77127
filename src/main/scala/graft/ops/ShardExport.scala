package graft.ops

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the last mile of the pretraining path: turn a
  * packed corpus (ScaleOps.packGreedyContiguous / packTokenStream bin
  * assignments) into size-bounded shard files a data loader can consume,
  * plus a manifest row per shard (doc count, token total, member-id
  * fingerprint) so the loader can plan epochs and an auditor can prove
  * shard↔manifest consistency without re-reading payloads (reference
  * analog: the partitioned processed write + summary,
  * drug_transformer.py:290-308).
  *
  * Scale shape: the shard key (pack_bucket, pack_bin) is already the
  * packing's hash-bucket structure, so `partitionBy` lands one directory
  * per shard with no extra shuffle beyond the pack itself; the manifest
  * is one map-side-combined aggregation over the same frame. The
  * member-id fingerprint is a bit_xor of avalanche-mixed 48-bit id
  * hashes — order-independent, overflow-free, and reproducible in any
  * BIGINT engine (the q78 gate replays it in DuckDB), so two exports of
  * the same corpus prove membership equality by comparing manifests
  * alone. */
object ShardExport {

  /** One manifest row per shard of a packed frame:
    * (pack_bucket, pack_bin, n_docs, n_tokens, ids_fp). */
  def manifest(packed: DataFrame, keyCol: String, nTokensCol: String): DataFrame = {
    require(packed.columns.contains("pack_bucket") && packed.columns.contains("pack_bin"),
      "manifest expects a packed frame (pack_bucket/pack_bin from packGreedyContiguous)")
    packed
      .select(col("pack_bucket"), col("pack_bin"),
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as("__n"),
        graft.functions.Mix48.mix48(
          graft.text.TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 48))
          .as("__idh"))
      .groupBy(col("pack_bucket"), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        expr("bit_xor(__idh)").as("ids_fp"))
  }

  /** Per-document SPANS of each greedy-packed shard — the
    * attention-mask metadata a loader needs when it concatenates a
    * shard's documents into context windows: documents in the shard's
    * PACK ORDER (avalanche-mixed id hash, then id — the
    * packGreedyContiguous fold order, recomputed here since it is a
    * pure function of the key) with `bin_start` = the exclusive token
    * cumsum within the bin and `span_tokens` the document's width.
    * Spans tile each bin exactly (ShardExportSpec pins the invariant),
    * so block-diagonal masks read straight off the rows. The window
    * partitions by (pack_bucket, pack_bin) — bins hold at most
    * binTokens of documents, so no partition ever approaches global
    * size. */
  def spanIndex(packed: DataFrame, keyCol: String, nTokensCol: String): DataFrame = {
    require(packed.columns.contains("pack_bucket") && packed.columns.contains("pack_bin"),
      "spanIndex expects a packed frame (pack_bucket/pack_bin from packGreedyContiguous)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_bucket"), col("pack_bin"))
      .orderBy(col("__h").asc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    packed
      .withColumn("__n", coalesce(col(nTokensCol).cast("long"), lit(0L)))
      .withColumn("__h", graft.functions.Mix48.mix48(
        graft.text.TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 48)))
      .withColumn("bin_start", sum(col("__n")).over(w) - col("__n"))
      .select(col("pack_bucket"), col("pack_bin"), col(keyCol),
        col("bin_start"), col("__n").as("span_tokens"))
  }

  /** Pack `df` into `binTokens`-bounded bins across `numBuckets` hash
    * buckets (greedy no-split — document integrity preserved), write one
    * shard directory per bin under `outDir/shards/`, the manifest under
    * `outDir/manifest/`, and the per-document span index ([[spanIndex]])
    * under `outDir/spans/`. Returns the manifest frame. */
  def writeShards(df: DataFrame, keyCol: String, nTokensCol: String,
      binTokens: Long, numBuckets: Int, outDir: String): DataFrame = {
    // persist: the pack (scan + token cumsum + sort + fold) feeds the
    // shard write, the manifest aggregation, and the span index —
    // without it the most expensive stage runs three times. Local
    // lifecycle (write is the terminal action here), so unpersist
    // directly rather than via CacheScope.
    val packed = ScaleOps.packGreedyContiguous(df, keyCol, nTokensCol, binTokens, numBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      packed.write.mode(SaveMode.Overwrite)
        .option("compression", "snappy")
        .partitionBy("pack_bucket", "pack_bin")
        .parquet(s"$outDir/shards")
      Lake.writeParquet(manifest(packed, keyCol, nTokensCol), s"$outDir/manifest")
      // one parquet dir, not per-shard files: the span table is tiny
      // relative to payloads and a loader filters it by (bucket, bin)
      Lake.writeParquet(spanIndex(packed, keyCol, nTokensCol), s"$outDir/spans")
      // return the landed manifest, not the in-memory plan: its lineage
      // would otherwise re-run the pack after the unpersist below
      Lake.readParquet(df.sparkSession, s"$outDir/manifest")
    } finally {
      packed.unpersist()
    }
  }

  /** [[writeShards]] landing JSONL shards — the loader-facing text
    * format most training stacks ingest directly: one JSON object per
    * line (to_json escapes embedded newlines, so one line IS one
    * document), one directory per (pack_bucket, pack_bin), same
    * parquet manifest. The JSON object carries every non-pack column
    * of `df` in column order. */
  /** `compression`: "" = plain text files; "zstd" = every shard file
    * lands as a REAL single-frame `.zst` (graft.io.ZstdFrameCodec —
    * standard tools and [[graft.multimodal.Containers.decodeJsonl]]
    * both read it back; the codec is registered with the session so
    * [[verifyJsonlShards]]' text read resolves the extension). */
  def writeJsonlShards(df: DataFrame, keyCol: String, nTokensCol: String,
      binTokens: Long, numBuckets: Int, outDir: String,
      compression: String = ""): DataFrame = {
    val packed = ScaleOps.packGreedyContiguous(df, keyCol, nTokensCol, binTokens, numBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val payloadCols = df.columns.toSeq
      val writer = packed
        .withColumn("value", to_json(struct(payloadCols.map(col): _*)))
        .select(col("pack_bucket"), col("pack_bin"), col("value"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("pack_bucket", "pack_bin")
      val configured = compression match {
        case "" => writer
        case "zstd" =>
          graft.io.ZstdFrameCodec.register(df.sparkSession)
          writer.option("compression", graft.io.ZstdFrameCodec.Name)
        case other =>
          throw new IllegalArgumentException(
            s"writeJsonlShards: unknown compression '$other' (use \"\" or \"zstd\")")
      }
      configured.text(s"$outDir/shards")
      Lake.writeParquet(manifest(packed, keyCol, nTokensCol), s"$outDir/manifest")
      Lake.readParquet(df.sparkSession, s"$outDir/manifest")
    } finally {
      packed.unpersist()
    }
  }

  /** [[verifyShards]] for a JSONL export: the audit fields parse back
    * out of each line (get_json_object), so the manifest check needs
    * no caller-supplied schema. */
  def verifyJsonlShards(spark: SparkSession, outDir: String,
      keyCol: String, nTokensCol: String): DataFrame = {
    require(Lake.exists(spark, s"$outDir/shards") && Lake.exists(spark, s"$outDir/manifest"),
      s"verifyJsonlShards: '$outDir' is not a shard export (missing shards/ or manifest/)")
    // a zstd-compressed export reads back through the same codec
    graft.io.ZstdFrameCodec.register(spark)
    val shards = spark.read.format("text").load(s"$outDir/shards")
      .withColumn("pack_bucket", col("pack_bucket").cast("long"))
      .withColumn("pack_bin", col("pack_bin").cast("long"))
      .withColumn(keyCol, get_json_object(col("value"), s"$$.$keyCol"))
      .withColumn(nTokensCol,
        get_json_object(col("value"), s"$$.$nTokensCol").cast("long"))
    val recomputed = manifest(shards, keyCol, nTokensCol)
      .withColumnRenamed("n_docs", "got_docs")
      .withColumnRenamed("n_tokens", "got_tokens")
      .withColumnRenamed("ids_fp", "got_fp")
    Lake.readParquet(spark, s"$outDir/manifest")
      .join(recomputed, Seq("pack_bucket", "pack_bin"), "full_outer")
      .where(!(col("n_docs") <=> col("got_docs")) ||
        !(col("n_tokens") <=> col("got_tokens")) ||
        !(col("ids_fp") <=> col("got_fp")))
  }

  /** Audit an exported directory: recompute every shard's aggregates
    * from the shard files and full-outer-join against the stored
    * manifest. Returns the mismatch frame — empty iff shards and
    * manifest agree exactly (missing shard dirs and orphan manifest
    * rows both surface as rows here). */
  def verifyShards(spark: SparkSession, outDir: String,
      keyCol: String, nTokensCol: String): DataFrame = {
    // fail fast with a real message on a wrong/unwritten export dir —
    // an empty schemaless frame would surface as an opaque resolution
    // error on pack_bucket below
    require(Lake.exists(spark, s"$outDir/shards") && Lake.exists(spark, s"$outDir/manifest"),
      s"verifyShards: '$outDir' is not a shard export (missing shards/ or manifest/)")
    val shards = Lake.readParquet(spark, s"$outDir/shards")
      .withColumn("pack_bucket", col("pack_bucket").cast("long"))
      .withColumn("pack_bin", col("pack_bin").cast("long"))
    val recomputed = manifest(shards, keyCol, nTokensCol)
      .withColumnRenamed("n_docs", "got_docs")
      .withColumnRenamed("n_tokens", "got_tokens")
      .withColumnRenamed("ids_fp", "got_fp")
    Lake.readParquet(spark, s"$outDir/manifest")
      .join(recomputed, Seq("pack_bucket", "pack_bin"), "full_outer")
      .where(!(col("n_docs") <=> col("got_docs")) ||
        !(col("n_tokens") <=> col("got_tokens")) ||
        !(col("ids_fp") <=> col("got_fp")))
  }
}
