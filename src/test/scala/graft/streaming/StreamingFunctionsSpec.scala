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

  test("rule recipes stream: gopher/c4/readability equal batch on micro-batches") {
    // QualityRules + the readability heuristics are expression-only, so
    // the same frame transforms run on an unbounded stream — the
    // batch == streaming == oracle triangle for the round-7 recipes
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today.\nshort.\n"),
      (2L, "a kept line with plenty of words right here.\nvar x = 1\n"),
      (3L, "no punctuation only words all the way"))
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    def shape(df: org.apache.spark.sql.DataFrame) = {
      val g = graft.text.QualityRules.gopherRules(
          df.toDF("doc_id", "text"), "text")
        .withColumnRenamed("keep", "gk")
      graft.text.QualityRules.c4Clean(g, "text")
        .withColumnRenamed("keep", "ck")
        .select($"doc_id", $"gk", $"ck", $"n_words", $"n_kept",
          graft.text.TextFunctions.sentenceCount($"text").as("ns"))
    }
    val q = shape(input.toDF()).writeStream.format("memory")
      .queryName("rules_stream").outputMode("append").start()
    input.addData(texts: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rules_stream")
      .collect().map(_.toString).sorted.toSeq
    val batch = shape(texts.toDF("a", "b"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == batch && got.size == 3)
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
  test("modality decodes stream: PNG pixel / WAV sample stats equal batch on micro-batches") {
    import graft.multimodal.Multimodal
    // really-encoded payloads (all five PNG filters; stereo LE PCM)
    val png = (1L to 4L).map(id => id -> Multimodal.pngBytes(5, 7,
      (x, y, c) => ((11 * id + 3 * x + 5 * y + 7 * c) % 256).toInt))
    val wav = (5L to 8L).map { id =>
      val n = 16; val ch = 2
      val body = new Array[Byte](n * ch * 2)
      for (i <- 0 until n; c <- 0 until ch) {
        val v = ((13 * id + 7 * i + 29 * c) % 4096 - 2048).toInt
        val k = (i * ch + c) * 2
        body(k) = (v & 0xff).toByte; body(k + 1) = ((v >> 8) & 0xff).toByte
      }
      id -> (Multimodal.wavHeaderBytes(16000, ch, 16, body.length) ++ body)
    }
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val streamed = Multimodal.decodePngPixelStats(
        input.toDF().toDF("media_id", "payload")).toDF()
      .writeStream.format("memory").queryName("png_stream").outputMode("append").start()
    input.addData(png: _*)
    streamed.processAllAvailable(); streamed.stop()
    val gotPng = spark.table("png_stream").collect().map(_.toString).sorted.toSeq
    val batchPng = Multimodal.decodePngPixelStats(
        png.toDF("media_id", "payload")).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(gotPng == batchPng && gotPng.size == 4)

    val input2 = MemoryStream[(Long, Array[Byte])]
    val streamed2 = Multimodal.decodeWavSampleStats(
        input2.toDF().toDF("media_id", "payload")).toDF()
      .writeStream.format("memory").queryName("wav_stream").outputMode("append").start()
    input2.addData(wav: _*)
    streamed2.processAllAvailable(); streamed2.stop()
    val gotWav = spark.table("wav_stream").collect().map(_.toString).sorted.toSeq
    val batchWav = Multimodal.decodeWavSampleStats(
        wav.toDF("media_id", "payload")).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(gotWav == batchWav && gotWav.size == 4)
  }

}
