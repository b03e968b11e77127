package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FLAC stream classification (the public FLAC format spec) — the
  * lossless arm of the compressed-audio audit family ([[Mp3]] covers
  * the lossy MPEG family; [[Multimodal]] decodes WAV/PCM fully).
  * Walks the metadata-block chain only: "fLaC" magic, then blocks of
  * [1-byte header: last-flag<<7 | type, 3-byte BE length, payload];
  * the FIRST block must be STREAMINFO (type 0, 34 bytes) per spec,
  * carrying sample rate (20 bits), channels-1 (3), bits-per-sample-1
  * (5), and total samples (36) — enough for an exact duration without
  * touching a single audio frame. Bytes after the last metadata block
  * are the frame payload, counted, never parsed.
  *
  * Error families (the [[Mp3]] discipline — refusals quantified per
  * mode, parsed prefix kept): "not_flac" (magic), "no_streaminfo"
  * (first block of another type, or STREAMINFO with a wrong length),
  * "truncated" (a declared block length runs past the payload). */
object Flac {

  final case class FlacInfo(
      media_id: Long, ok: Int, sample_rate: Int, channels: Int,
      bits_per_sample: Int, total_samples: Long, duration_ms: Long,
      n_meta_blocks: Int, audio_bytes: Long, err: String)

  def parseFlac(id: Long, b: Array[Byte]): FlacInfo = {
    def fail(err: String): FlacInfo =
      FlacInfo(id, 0, 0, 0, 0, 0L, 0L, 0, 0L, err)
    if (b == null || b.length < 8 || b(0) != 'f' || b(1) != 'L' ||
        b(2) != 'a' || b(3) != 'C') return fail("not_flac")
    var p = 4
    var nBlocks = 0
    var rate = 0
    var channels = 0
    var bits = 0
    var totalSamples = 0L
    var last = false
    while (!last) {
      if (p + 4 > b.length) return fail("truncated")
      val hdr = b(p) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
        (b(p + 3) & 0xff)
      if (p + 4 + len > b.length) return fail("truncated")
      if (nBlocks == 0) {
        // spec: STREAMINFO first, exactly 34 bytes
        if (typ != 0 || len != 34) return fail("no_streaminfo")
        val o = p + 4
        // [0,10): block/frame size bounds (not classified here)
        rate = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
          ((b(o + 12) & 0xff) >> 4)
        channels = ((b(o + 12) >> 1) & 0x07) + 1
        bits = (((b(o + 12) & 0x01) << 4) | ((b(o + 13) & 0xff) >> 4)) + 1
        totalSamples = ((b(o + 13) & 0x0fL) << 32) |
          ((b(o + 14) & 0xffL) << 24) | ((b(o + 15) & 0xffL) << 16) |
          ((b(o + 16) & 0xffL) << 8) | (b(o + 17) & 0xffL)
        if (rate == 0) return fail("no_streaminfo") // 0 is invalid per spec
      }
      nBlocks += 1
      p += 4 + len
    }
    val durMs = totalSamples * 1000L / rate
    FlacInfo(id, 1, rate, channels, bits, totalSamples, durMs,
      nBlocks, (b.length - p).toLong, "")
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeFlacInfo(media: DataFrame, partitions: Int = 0): Dataset[FlacInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseFlac(id, p) })(
        org.apache.spark.sql.Encoders.product[FlacInfo])
  }

  /** One STREAMINFO block's 34 payload bytes. */
  private[multimodal] def streaminfoBytes(rate: Int, channels: Int,
      bits: Int, totalSamples: Long): Array[Byte] = {
    val o = new Array[Byte](34)
    // min/max block size: a plausible constant 4096
    o(0) = 0x10; o(1) = 0x00; o(2) = 0x10; o(3) = 0x00
    // frame-size bounds left 0 (unknown — legal)
    o(10) = ((rate >> 12) & 0xff).toByte
    o(11) = ((rate >> 4) & 0xff).toByte
    o(12) = (((rate & 0x0f) << 4) | (((channels - 1) & 0x07) << 1) |
      (((bits - 1) >> 4) & 0x01)).toByte
    o(13) = ((((bits - 1) & 0x0f) << 4) | ((totalSamples >> 32) & 0x0f).toInt).toByte
    o(14) = ((totalSamples >> 24) & 0xff).toByte
    o(15) = ((totalSamples >> 16) & 0xff).toByte
    o(16) = ((totalSamples >> 8) & 0xff).toByte
    o(17) = (totalSamples & 0xff).toByte
    // [18,34): MD5 of the audio — zeros (unknown — legal)
    o
  }

  /** Deterministic FLAC corpus from the documents table — fields and
    * error families fanned over id arithmetic (oracle restates it):
    *   rate           [8000,16000,22050,32000,44100,48000][id%6]
    *   channels       1 + id%2;  bits 16
    *   total samples  1000 + id%9000
    *   padding block  id%3==1 (second metadata block, 4 + id%20 bytes)
    *   audio payload  id%50 opaque bytes after the chain
    *   not_flac       id%7==2 (broken magic)
    *   truncated      else id%7==4 (STREAMINFO declares 34, carries 10)
    *   no_streaminfo  else id%11==5 (a PADDING block arrives first) */
  def flacCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val rate = Array(8000, 16000, 22050, 32000, 44100, 48000)(m(6))
      val channels = 1 + m(2)
      val total = 1000L + m(9000)
      val notFlac = m(7) == 2
      val truncated = !notFlac && m(7) == 4
      val noInfo = !notFlac && !truncated && m(11) == 5
      val pad = m(3) == 1
      val out = new java.io.ByteArrayOutputStream()
      out.write('f'); out.write(if (notFlac) 'X' else 'L')
      out.write('a'); out.write('C')
      val si = streaminfoBytes(rate, channels, 16, total)
      def block(lastF: Boolean, typ: Int, body: Array[Byte],
          declared: Int = -1): Unit = {
        val len = if (declared >= 0) declared else body.length
        out.write((if (lastF) 0x80 else 0) | typ)
        out.write((len >> 16) & 0xff); out.write((len >> 8) & 0xff)
        out.write(len & 0xff)
        out.write(body, 0, body.length)
      }
      if (noInfo) {
        block(lastF = true, typ = 1, new Array[Byte](6)) // padding first
      } else if (truncated) {
        block(lastF = true, typ = 0, si.take(10), declared = 34)
      } else {
        block(lastF = !pad, typ = 0, si)
        if (pad) block(lastF = true, typ = 1, new Array[Byte](4 + m(20)))
      }
      var i = 0
      // the truncated arm must actually END early: audio bytes after a
      // short block would satisfy the declared length instead
      val nAudio = if (truncated) 0 else m(50)
      while (i < nAudio) { out.write((i * 37 + 11) & 0xff); i += 1 }
      (id, out.toByteArray)
    }.toDF("media_id", "payload")
  }
}
