package graft.streaming

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The fused signature expressions are stateless per-row transforms, so
  * the whole text-processing layer must run unchanged inside Structured
  * Streaming micro-batches — the "stream the daily crawl through the
  * same operators" path. */
class StreamingFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fused expressions stream: simhash/fingerprint/chunks equal the batch results") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans fast"),
      (3L, "one two three four five six seven eight nine ten"))
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val streamed = input.toDF().toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.SimHash48.simhash48(TextFunctions.distinctTokens($"text")).as("sh"),
        TextFunctions.fingerprint($"text").as("fp"),
        size(TextFunctions.tokenChunksFrom(TextFunctions.tokens($"text"), 4, 2)).as("n_chunks"))
      .writeStream.format("memory").queryName("fused_stream").outputMode("append").start()
    input.addData(texts: _*)
    streamed.processAllAvailable()
    streamed.stop()
    val got = spark.table("fused_stream")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val batch = texts.toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.SimHash48.simhash48(TextFunctions.distinctTokens($"text")).as("sh"),
        TextFunctions.fingerprint($"text").as("fp"),
        size(TextFunctions.tokenChunksFrom(TextFunctions.tokens($"text"), 4, 2)).as("n_chunks"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got == batch)
    assert(got.size == 3)
  }

  test("winnowing streams: per-row selection equals batch on an append stream") {
    // winnowedFingerprints is one per-row HOF projection, so it must run
    // unchanged over a stream (the incremental half of the q103 overlap
    // audit: winnow each micro-batch, join against a static winnowed index)
    val texts = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      (2L, "one two three four five six seven"),
      (3L, "short under k"))
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val streamed = graft.dedup.Dedup.winnowedFingerprints(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        shingleTokens = 5, window = 4)
      .writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    input.addData(texts: _*)
    streamed.processAllAvailable()
    streamed.stop()
    val got = spark.table("winnow_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.dedup.Dedup.winnowedFingerprints(
        texts.toDF("doc_id", "text"), "doc_id", "text", 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch && got.nonEmpty)
    assert(!got.exists(_._1 == 3L), "sub-k docs have no shingles, streamed or not")
  }
}
