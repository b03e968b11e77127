package graft.ops

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.queries.Queries
    .tbl(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id",
      graft.text.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))

  test("shard export round-trip: manifest matches shard files exactly") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val m = ShardExport.writeShards(corpus, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 8, outDir = dir)
      // manifest landed and covers every shard directory
      assert(Lake.exists(spark, s"$dir/manifest"))
      val stored = Lake.readParquet(spark, s"$dir/manifest")
      assert(stored.count() == m.count() && stored.count() > 0)
      // every document landed in exactly one shard
      val shards = Lake.readParquet(spark, s"$dir/shards")
      assert(shards.count() == corpus.count())
      assert(shards.select($"doc_id").distinct().count() == corpus.count())
      // the audit recomputes per-shard aggregates from the files and
      // finds no disagreement
      assert(ShardExport.verifyShards(spark, dir, "doc_id", "n_tokens").isEmpty)
      // size bound: a shard exceeds binTokens only as a single oversized
      // document (the documented no-split exception)
      val oversized = stored.where($"n_tokens" > 256 && $"n_docs" > 1)
      assert(oversized.isEmpty)
      // manifest token totals reconcile with the corpus total
      assert(stored.agg(sum($"n_tokens")).head().getLong(0) ==
        corpus.agg(sum($"n_tokens")).head().getLong(0))
      // span index landed: per (bucket, bin) the spans TILE the bin —
      // sorted bin_starts are exactly the prefix sums of span_tokens,
      // totals match the manifest, membership matches the shard files
      assert(Lake.exists(spark, s"$dir/spans"))
      val spans = Lake.readParquet(spark, s"$dir/spans")
      assert(spans.count() == corpus.count())
      val spanRows = spans.select($"pack_bucket", $"pack_bin",
          $"doc_id", $"bin_start", $"span_tokens")
        .collect()
        .groupBy(r => (r.getLong(0), r.getLong(1)))
      val manifestTok = stored.select($"pack_bucket", $"pack_bin", $"n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      spanRows.foreach { case (bin, rows) =>
        val sorted = rows.sortBy(_.getLong(3))
        var expectStart = 0L
        sorted.foreach { r =>
          assert(r.getLong(3) == expectStart,
            s"bin $bin: span at ${r.getLong(3)} but tiling expects $expectStart")
          expectStart += r.getLong(4)
        }
        assert(expectStart == manifestTok(bin),
          s"bin $bin: spans cover $expectStart tokens vs manifest ${manifestTok(bin)}")
      }
      // span membership == shard membership per bin (partition-dir
      // columns infer as INT on read — cast back to the written long)
      val shardIds = shards.select($"pack_bucket".cast("long"),
          $"pack_bin".cast("long"), $"doc_id")
        .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
      assert(spanRows.map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet } == shardIds)
    } finally {
      Lake.delete(spark, dir)
    }
  }

  test("JSONL shard export: one line per doc, escaping-safe, manifest parity with parquet") {
    val dir = java.nio.file.Files.createTempDirectory("jshards").toString
    val pdir = java.nio.file.Files.createTempDirectory("pshards").toString
    try {
      // carry the text too — with an embedded newline + quote to prove
      // the one-line-per-document contract survives hostile content
      val docs = graft.queries.Queries
        .tbl(spark, "/root/testdata/sf0.001", "documents")
        .select($"doc_id",
          when($"doc_id" === 7L, lit("line one\nline \"two\"")).otherwise($"text")
            .as("text"),
          graft.text.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      val m = ShardExport.writeJsonlShards(docs, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 8, outDir = dir)
      assert(m.count() > 0)
      val lines = spark.read.format("text").load(s"$dir/shards")
      assert(lines.count() == docs.count(), "exactly one JSONL line per document")
      // parse-back: every line yields its doc_id; id 7's newline survived
      val parsed = lines.select(
        get_json_object($"value", "$.doc_id").cast("long").as("doc_id"),
        get_json_object($"value", "$.text").as("text"))
      assert(parsed.select($"doc_id").distinct().count() == docs.count())
      assert(parsed.where($"doc_id" === 7L).head().getString(1) ==
        "line one\nline \"two\"")
      // the schema-free audit agrees with the manifest
      assert(ShardExport.verifyJsonlShards(spark, dir, "doc_id", "n_tokens").isEmpty)
      // and the manifest is FORMAT-INDEPENDENT: byte-identical rows to
      // a parquet export of the same corpus (same pack, same fp)
      val mp = ShardExport.writeShards(docs, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 8, outDir = pdir)
      assert(m.collect().map(_.toString).sorted.toSeq ==
        mp.collect().map(_.toString).sorted.toSeq)
    } finally {
      Lake.delete(spark, dir); Lake.delete(spark, pdir)
    }
  }

  test("zstd-compressed JSONL export: real .zst frames, round-trip, manifest parity") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val pdir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select($"doc_id", $"text",
          graft.text.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      val m = ShardExport.writeJsonlShards(docs, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 8, outDir = dir, compression = "zstd")
      assert(m.count() > 0)
      // every shard file is a REAL standalone zstd frame: .zst
      // extension, magic bytes, and graft's own decoder inflates the
      // raw file bytes to one-JSON-object-per-line text
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "shards"))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .toArray.map(_.toString)
      assert(files.nonEmpty && files.forall(_.endsWith(".zst")),
        s"shard files must land as .zst: ${files.take(3).mkString(",")}")
      val someBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(files.head))
      assert(graft.multimodal.Zstd.isZstd(someBytes))
      val inflated = graft.multimodal.Zstd.decompress(someBytes)
      assert(inflated.isDefined, "shard file must be a valid zstd frame")
      assert(new String(inflated.get, "UTF-8").linesIterator
        .forall(_.startsWith("{")), "inflated shard must be JSONL")
      // spark reads the compressed export back through the registered
      // codec: one line per document, audit empty
      val lines = spark.read.format("text").load(s"$dir/shards")
      assert(lines.count() == docs.count(), "one JSONL line per document")
      assert(ShardExport.verifyJsonlShards(spark, dir, "doc_id", "n_tokens").isEmpty)
      // manifest is compression-independent: byte-identical rows to
      // the plain export of the same corpus
      val mu = ShardExport.writeJsonlShards(docs, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 8, outDir = pdir)
      assert(m.collect().map(_.toString).sorted.toSeq ==
        mu.collect().map(_.toString).sorted.toSeq)
    } finally {
      Lake.delete(spark, dir); Lake.delete(spark, pdir)
    }
  }

  test("shard audit catches a lost shard and a corrupted manifest") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      ShardExport.writeShards(corpus, "doc_id", "n_tokens",
        binTokens = 256L, numBuckets = 4, outDir = dir)
      // delete one shard directory -> its manifest row has no match
      val firstShard = Lake.list(spark, s"$dir/shards")
        .filter(_.contains("pack_bucket=")).head
      val firstBin = Lake.list(spark, firstShard)
        .filter(_.contains("pack_bin=")).head
      assert(Lake.delete(spark, firstBin))
      val bad = ShardExport.verifyShards(spark, dir, "doc_id", "n_tokens")
      assert(bad.count() >= 1)
    } finally {
      Lake.delete(spark, dir)
    }
  }
}
