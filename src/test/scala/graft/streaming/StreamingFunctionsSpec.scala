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
}
