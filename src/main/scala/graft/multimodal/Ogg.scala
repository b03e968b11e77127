package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Ogg container classification (the public Ogg framing + Vorbis I +
  * Opus-in-Ogg specs) — completes the crawl-audio audit family:
  * [[Multimodal]] decodes WAV fully, [[Mp3]]/[[Flac]] classify the
  * bare lossy/lossless streams, this walks the container the other
  * two usually arrive in.
  *
  * Walks every page: "OggS" capture, version 0, flag byte (0x02 BOS /
  * 0x04 EOS), LE64 granule position, serial, sequence, LE32 CRC
  * (VALIDATED — the Ogg flavor: forward CRC-32 poly 0x04c11db7, init
  * 0, no reflection/xorout, computed with the CRC field zeroed), then
  * the lacing table and body. The BOS page's first packet carries the
  * codec id header: \\x01"vorbis" (channels at +11, LE32 rate at +12)
  * or "OpusHead" (channels at +9, LE16 pre-skip at +10). Duration
  * comes from the LAST page's granule position — Vorbis granules are
  * PCM samples at the stream rate; Opus granules run at 48 kHz minus
  * pre-skip. Audio frames themselves are counted, never parsed.
  *
  * Error families (the [[Mp3]]/[[Flac]]/[[Webp]] discipline), in the
  * order a page parse hits them: "not_ogg" (capture on the first
  * page), "truncated" (header / lacing table / body past the payload,
  * or a later page with broken capture), "bad_version",
  * "bad_crc", "no_bos" (first page without the BOS flag),
  * "unknown_codec" (a BOS packet that is neither codec). */
object Ogg {

  final case class OggInfo(
      media_id: Long, ok: Int, codec: String, sample_rate: Int,
      channels: Int, pre_skip: Int, n_pages: Int, granule_end: Long,
      duration_ms: Long, audio_bytes: Long, err: String)

  // Ogg CRC-32: forward (non-reflected), poly 0x04c11db7, init 0, no xorout
  private val crcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  private[multimodal] def pageCrc(b: Array[Byte], from: Int, until: Int,
      crcFieldAt: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      // the CRC is computed with its own 4 field bytes as zero
      val v = if (i >= crcFieldAt && i < crcFieldAt + 4) 0 else b(i) & 0xff
      c = (c << 8) ^ crcTable(((c >>> 24) ^ v) & 0xff)
      i += 1
    }
    c
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  def parseOgg(id: Long, b: Array[Byte]): OggInfo = {
    def fail(err: String): OggInfo =
      OggInfo(id, 0, "", 0, 0, 0, 0, 0L, 0L, 0L, err)
    if (b == null || b.length < 27 || b(0) != 'O' || b(1) != 'g' ||
        b(2) != 'g' || b(3) != 'S') return fail("not_ogg")
    var p = 0
    var nPages = 0
    var codec = ""
    var rate = 0
    var channels = 0
    var preSkip = 0
    var granuleEnd = 0L
    var audioBytes = 0L
    while (p < b.length) {
      if (p + 27 > b.length) return fail("truncated")
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S') return fail("truncated")
      if ((b(p + 4) & 0xff) != 0) return fail("bad_version")
      val flags = b(p + 5) & 0xff
      val granule = le64(b, p + 6)
      val nSegs = b(p + 26) & 0xff
      if (p + 27 + nSegs > b.length) return fail("truncated")
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += b(p + 27 + s) & 0xff; s += 1 }
      val bodyAt = p + 27 + nSegs
      if (bodyAt + bodyLen > b.length) return fail("truncated")
      if (pageCrc(b, p, bodyAt + bodyLen, p + 22) != le32(b, p + 22))
        return fail("bad_crc")
      if (nPages == 0) {
        if ((flags & 0x02) == 0) return fail("no_bos")
        // the id header packet opens the first page's body
        val o = bodyAt
        if (bodyLen >= 16 && (b(o) & 0xff) == 0x01 && b(o + 1) == 'v' &&
            b(o + 2) == 'o' && b(o + 3) == 'r' && b(o + 4) == 'b' &&
            b(o + 5) == 'i' && b(o + 6) == 's') {
          codec = "vorbis"
          channels = b(o + 11) & 0xff
          rate = le32(b, o + 12)
          if (rate <= 0 || channels == 0) return fail("unknown_codec")
        } else if (bodyLen >= 19 && b(o) == 'O' && b(o + 1) == 'p' &&
            b(o + 2) == 'u' && b(o + 3) == 's' && b(o + 4) == 'H' &&
            b(o + 5) == 'e' && b(o + 6) == 'a' && b(o + 7) == 'd') {
          codec = "opus"
          channels = b(o + 9) & 0xff
          preSkip = le16(b, o + 10)
          rate = le32(b, o + 12) // informational input rate
          if (channels == 0) return fail("unknown_codec")
        } else return fail("unknown_codec")
      } else {
        audioBytes += bodyLen
        // granule -1 marks a page where no packet ends — not a position
        if (granule != -1L) granuleEnd = granule
      }
      nPages += 1
      p = bodyAt + bodyLen
    }
    val durMs =
      if (codec == "opus") math.max(0L, granuleEnd - preSkip) * 1000L / 48000L
      else granuleEnd * 1000L / rate
    OggInfo(id, 1, codec, rate, channels, preSkip, nPages, granuleEnd,
      durMs, audioBytes, "")
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeOggInfo(media: DataFrame, partitions: Int = 0): Dataset[OggInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    media.select("media_id", "payload")
      .repartition(parts, col("media_id"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.map { case (id, p) => parseOgg(id, p) })(
        org.apache.spark.sql.Encoders.product[OggInfo])
  }

  // ---- fixture synthesis (REAL pages, valid CRCs, oracle-restatable) --

  /** One Ogg page with a correct (or deliberately broken) CRC. */
  private[multimodal] def pageBytes(flags: Int, granule: Long, serial: Int,
      seq: Int, body: Array[Byte], breakCapture: Boolean = false,
      breakVersion: Boolean = false, breakCrc: Boolean = false): Array[Byte] = {
    require(body.length < 255 * 255, "fixture pages keep lacing simple")
    val nSegs = body.length / 255 + 1
    val page = new Array[Byte](27 + nSegs + body.length)
    page(0) = 'O'; page(1) = 'g'; page(2) = if (breakCapture) 'X' else 'g'
    page(3) = 'S'
    page(4) = if (breakVersion) 1 else 0
    page(5) = flags.toByte
    var k = 0
    while (k < 8) { page(6 + k) = ((granule >> (8 * k)) & 0xff).toByte; k += 1 }
    k = 0
    while (k < 4) {
      page(14 + k) = ((serial >> (8 * k)) & 0xff).toByte
      page(18 + k) = ((seq >> (8 * k)) & 0xff).toByte
      k += 1
    }
    page(26) = nSegs.toByte
    var rem = body.length
    var s = 0
    while (s < nSegs) {
      page(27 + s) = math.min(rem, if (s == nSegs - 1) 254 else 255).toByte
      rem -= 255; s += 1
    }
    System.arraycopy(body, 0, page, 27 + nSegs, body.length)
    val crc = pageCrc(page, 0, page.length, 22) ^ (if (breakCrc) 0x5a else 0)
    k = 0
    while (k < 4) { page(22 + k) = ((crc >> (8 * k)) & 0xff).toByte; k += 1 }
    page
  }

  private[multimodal] def vorbisIdPacket(channels: Int, rate: Int): Array[Byte] = {
    val o = new Array[Byte](30)
    o(0) = 0x01
    "vorbis".getBytes("ISO-8859-1").copyToArray(o, 1)
    // [7,11): vorbis_version = 0
    o(11) = channels.toByte
    var k = 0
    while (k < 4) { o(12 + k) = ((rate >> (8 * k)) & 0xff).toByte; k += 1 }
    // bitrates [16,28) zero; blocksizes byte + framing bit
    o(28) = ((8 << 4) | 8).toByte
    o(29) = 0x01
    o
  }

  private[multimodal] def opusIdPacket(channels: Int, preSkip: Int,
      inputRate: Int): Array[Byte] = {
    val o = new Array[Byte](19)
    "OpusHead".getBytes("ISO-8859-1").copyToArray(o, 0)
    o(8) = 0x01 // version
    o(9) = channels.toByte
    o(10) = (preSkip & 0xff).toByte; o(11) = ((preSkip >> 8) & 0xff).toByte
    var k = 0
    while (k < 4) { o(12 + k) = ((inputRate >> (8 * k)) & 0xff).toByte; k += 1 }
    // [16,18) output gain = 0; [18] mapping family = 0
    o
  }

  /** Deterministic Ogg corpus from the documents table — fields and
    * error families fanned over id arithmetic (oracle restates it):
    *   codec          vorbis (id%2==0) / opus (id%2==1)
    *   rate           vorbis [8000,16000,44100,48000][id%4]; opus 48000
    *   channels       1 + id%2;  opus pre-skip 312
    *   audio pages    1 + id%3, each 20 + id%50 opaque bytes
    *   final granule  48000 + id%100000 (EOS page)
    *   not_ogg        id%7==2 (broken capture, first page)
    *   truncated      else id%7==4 (last page body cut 10 bytes short —
    *                  the payload actually ENDS there)
    *   bad_version    else id%17==7 (version byte 1, first page)
    *   bad_crc        else id%11==5 (last page CRC xor 0x5A)
    *   unknown_codec  else id%13==3 (id packet magic broken) */
  def oggCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val opus = m(2) == 1
      val rate = if (opus) 48000 else Array(8000, 16000, 44100, 48000)(m(4))
      val channels = 1 + m(2)
      val granule = 48000L + m(100000)
      val nAudio = 1 + m(3)
      val notOgg = m(7) == 2
      val trunc = !notOgg && m(7) == 4
      val badVer = !notOgg && !trunc && m(17) == 7
      val badCrc = !notOgg && !trunc && !badVer && m(11) == 5
      val unk = !notOgg && !trunc && !badVer && !badCrc && m(13) == 3
      val serial = (id * 2654435761L).toInt
      val idPkt0 =
        if (opus) opusIdPacket(channels, 312, 48000)
        else vorbisIdPacket(channels, rate)
      if (unk) idPkt0(0) = 'X'
      val out = new java.io.ByteArrayOutputStream()
      out.write(pageBytes(0x02, 0L, serial, 0, idPkt0,
        breakCapture = notOgg, breakVersion = badVer))
      var k = 0
      while (k < nAudio) {
        val body = Array.tabulate(20 + m(50))(i => ((i * 31 + k * 7 + 5) & 0xff).toByte)
        val lastPage = k == nAudio - 1
        val g = if (lastPage) granule else granule * (k + 1) / nAudio
        val page = pageBytes(if (lastPage) 0x04 else 0x00, g, serial, k + 1,
          body, breakCrc = badCrc && lastPage)
        if (trunc && lastPage) out.write(page, 0, page.length - 10)
        else out.write(page, 0, page.length)
        k += 1
      }
      (id, out.toByteArray)
    }.toDF("media_id", "payload")
  }
}
