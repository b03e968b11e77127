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
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseOgg(id, p) })(
        org.apache.spark.sql.Encoders.product[OggInfo])
  }

  // ---- comment headers (VorbisComment / OpusTags) ----------------------

  /** Reassemble the logical stream's first `need` PACKETS across pages
    * (the lacing rule: a segment value < 255 terminates a packet; a
    * page ending on 255 continues into the next). Validates the same
    * page-level structure as [[parseOgg]] over the pages it WALKS —
    * the walk stops once `need` packets close, so later pages (audio)
    * are q166's business, not this one's. Left = container tag. */
  private[multimodal] def headerPackets(b: Array[Byte],
      need: Int): Either[String, Seq[Array[Byte]]] = {
    if (b == null || b.length < 27 || b(0) != 'O' || b(1) != 'g' ||
        b(2) != 'g' || b(3) != 'S') return Left("not_ogg")
    var p = 0
    var nPages = 0
    val done = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    while (p < b.length && done.length < need) {
      if (p + 27 > b.length) return Left("truncated")
      if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S') return Left("truncated")
      if ((b(p + 4) & 0xff) != 0) return Left("bad_version")
      val flags = b(p + 5) & 0xff
      val nSegs = b(p + 26) & 0xff
      if (p + 27 + nSegs > b.length) return Left("truncated")
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += b(p + 27 + s) & 0xff; s += 1 }
      val bodyAt = p + 27 + nSegs
      if (bodyAt + bodyLen > b.length) return Left("truncated")
      if (pageCrc(b, p, bodyAt + bodyLen, p + 22) != le32(b, p + 22))
        return Left("bad_crc")
      if (nPages == 0 && (flags & 0x02) == 0) return Left("no_bos")
      var off = bodyAt
      s = 0
      while (s < nSegs && done.length < need) {
        val l = b(p + 27 + s) & 0xff
        cur.write(b, off, l)
        off += l
        if (l < 255) {
          done += cur.toByteArray
          cur = new java.io.ByteArrayOutputStream()
        }
        s += 1
      }
      nPages += 1
      p = bodyAt + bodyLen
    }
    Right(done.toSeq)
  }

  /** Extracted comment-header fields — [[Mp3.decodeId3Tags]]'s shape
    * for the Ogg family: the VorbisComment block (Vorbis packet-2
    * 0x03"vorbis" form, Opus "OpusTags" form), field names matched
    * case-insensitively per the spec, first occurrence wins,
    * `n_comments` counts ALL user comments (unknown keys included). */
  final case class OggTags(media_id: Long, ok: Int, codec: String,
      vendor: String, title: String, artist: String, album: String,
      n_comments: Int, err: String)

  def parseTags(id: Long, b: Array[Byte]): OggTags = {
    def fail(err: String): OggTags =
      OggTags(id, 0, "", "", "", "", "", 0, err)
    headerPackets(b, 2) match {
      case Left(e) => fail(e)
      case Right(pkts) =>
        if (pkts.isEmpty) return fail("unknown_codec")
        val p0 = pkts.head
        val codec =
          if (p0.length >= 16 && (p0(0) & 0xff) == 0x01 && p0(1) == 'v' &&
            p0(2) == 'o' && p0(3) == 'r' && p0(4) == 'b' && p0(5) == 'i' &&
            p0(6) == 's') "vorbis"
          else if (p0.length >= 19 && p0(0) == 'O' && p0(1) == 'p' &&
            p0(2) == 'u' && p0(3) == 's' && p0(4) == 'H' && p0(5) == 'e' &&
            p0(6) == 'a' && p0(7) == 'd') "opus"
          else return fail("unknown_codec")
        if (pkts.length < 2) return fail("no_tags")
        val c = pkts(1)
        val start =
          if (codec == "vorbis") {
            if (c.length < 7 || (c(0) & 0xff) != 0x03 || c(1) != 'v' ||
              c(2) != 'o' || c(3) != 'r' || c(4) != 'b' || c(5) != 'i' ||
              c(6) != 's') return fail("no_tags")
            7
          } else {
            if (c.length < 8 || c(0) != 'O' || c(1) != 'p' || c(2) != 'u' ||
              c(3) != 's' || c(4) != 'T' || c(5) != 'a' || c(6) != 'g' ||
              c(7) != 's') return fail("no_tags")
            8
          }
        var q = start
        def rd32(): Int = {
          if (q + 4 > c.length) return -1
          val v = le32(c, q)
          q += 4
          v
        }
        val vlen = rd32()
        if (vlen < 0 || q + vlen > c.length) return fail("bad_tags")
        val vendor = new String(c, q, vlen,
          java.nio.charset.StandardCharsets.UTF_8)
        q += vlen
        val n = rd32()
        if (n < 0 || n > 4096) return fail("bad_tags") // bomb guard
        var title = ""
        var artist = ""
        var album = ""
        var i = 0
        while (i < n) {
          val len = rd32()
          if (len < 0 || q + len > c.length) return fail("bad_tags")
          val s = new String(c, q, len, java.nio.charset.StandardCharsets.UTF_8)
          q += len
          val eq = s.indexOf('=')
          if (eq <= 0) return fail("bad_tags")
          val key = s.substring(0, eq).toLowerCase(java.util.Locale.ROOT)
          val value = s.substring(eq + 1)
          key match {
            case "title" => if (title.isEmpty) title = value
            case "artist" => if (artist.isEmpty) artist = value
            case "album" => if (album.isEmpty) album = value
            case _ => ()
          }
          i += 1
        }
        // Vorbis comment headers close with a framing bit
        if (codec == "vorbis" && (q >= c.length || (c(q) & 0x01) == 0))
          return fail("bad_tags")
        OggTags(id, 1, codec, vendor, title, artist, album, n, "")
    }
  }

  /** Batched tag extraction — the decodeStage plan shape. */
  def decodeOggTags(media: DataFrame, partitions: Int = 0): Dataset[OggTags] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseTags(id, p) })(
        org.apache.spark.sql.Encoders.product[OggTags])
  }

  // ---- fixture synthesis (REAL pages, valid CRCs, oracle-restatable) --

  /** One Ogg page with a correct (or deliberately broken) CRC. When
    * `continues` the body's packet does NOT terminate on this page:
    * the lacing table is all-255 (body length must be a multiple of
    * 255), so the next page's segments extend it. */
  private[multimodal] def pageBytes(flags: Int, granule: Long, serial: Int,
      seq: Int, body: Array[Byte], breakCapture: Boolean = false,
      breakVersion: Boolean = false, breakCrc: Boolean = false,
      continues: Boolean = false): Array[Byte] = {
    require(body.length < 255 * 255, "fixture pages keep lacing simple")
    require(!continues || (body.length > 0 && body.length % 255 == 0),
      "a continuing page's lacing is all-255")
    val nSegs = if (continues) body.length / 255 else body.length / 255 + 1
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
      page(27 + s) =
        (if (continues) 255
         else math.min(rem, if (s == nSegs - 1) 254 else 255)).toByte
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

  /** A VorbisComment / OpusTags packet. `inflateLast` corrupts the
    * final comment's declared length past the packet end. */
  private[multimodal] def commentPacket(codec: String, vendor: String,
      comments: Seq[String], breakMagic: Boolean = false,
      inflateLast: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    if (codec == "vorbis") {
      o.write(0x03); o.write("vorbis".getBytes("ISO-8859-1"))
    } else o.write("OpusTags".getBytes("ISO-8859-1"))
    val vb = vendor.getBytes("UTF-8")
    w32(vb.length); o.write(vb, 0, vb.length)
    w32(comments.length)
    comments.zipWithIndex.foreach { case (cmt, i) =>
      val cb = cmt.getBytes("UTF-8")
      w32(cb.length +
        (if (inflateLast && i == comments.length - 1) 100000 else 0))
      o.write(cb, 0, cb.length)
    }
    if (codec == "vorbis") o.write(0x01) // framing bit
    val out = o.toByteArray
    if (breakMagic) out(0) = 'X'
    out
  }

  /** Deterministic tagged-Ogg corpus — [[oggCorpusFromDocuments]]'s
    * field fan with a REAL comment header as the second packet:
    *   codec       vorbis (id%2==0) / opus (id%2==1)
    *   vendor      "graft-" + id%10
    *   comments    TITLE=Title id; ARTIST=Artist id%100;
    *               ALBUM=Album id%7 at id%3==0; an unknown
    *               COMMENT key at id%4==1 (counted, not extracted)
    *   spanning    id%5==3 splits the comment packet across TWO pages
    *               (a continuing all-255 lacing page, granule -1) —
    *               field-invisible
    *   not_ogg     id%7==2;  truncated  else id%7==4 (the comment
    *               page itself cut 10 bytes short)
    *   no_tags     else id%13==3 (comment magic broken)
    *   bad_tags    else id%11==5 (last comment length inflated) */
  def oggTagsCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val opus = m(2) == 1
      val codec = if (opus) "opus" else "vorbis"
      val notOgg = m(7) == 2
      val trunc = !notOgg && m(7) == 4
      val noTags = !notOgg && !trunc && m(13) == 3
      val badTags = !notOgg && !trunc && !noTags && m(11) == 5
      val serial = (id * 2654435761L).toInt
      val idPkt =
        if (opus) opusIdPacket(1 + m(2), 312, 48000)
        else vorbisIdPacket(1 + m(2), 48000)
      val comments = Seq(s"TITLE=Title $id", s"ARTIST=Artist ${m(100)}") ++
        (if (m(3) == 0) Seq(s"ALBUM=Album ${m(7)}") else Nil) ++
        (if (m(4) == 1) Seq(s"COMMENT=extra ${m(9)}") else Nil)
      val pkt = commentPacket(codec, s"graft-${m(10)}", comments,
        breakMagic = noTags, inflateLast = badTags)
      val out = new java.io.ByteArrayOutputStream()
      out.write(pageBytes(0x02, 0L, serial, 0, idPkt, breakCapture = notOgg))
      if (m(5) == 3) {
        // span: pad past 255 (trailing bytes after the framing bit are
        // outside every declared field — ignored by the parser)
        val padded = java.util.Arrays.copyOf(pkt, math.max(256, pkt.length + 1))
        out.write(pageBytes(0x00, -1L, serial, 1, padded.take(255),
          continues = true))
        out.write(pageBytes(0x01, 0L, serial, 2, padded.drop(255)))
      } else {
        out.write(pageBytes(0x00, 0L, serial, 1, pkt))
      }
      val commentEnd = out.size()
      out.write(pageBytes(0x04, 48000L + m(1000), serial, 3,
        Array.tabulate(25)(i => ((i * 37 + 11) & 0xff).toByte)))
      val full = out.toByteArray
      (id, if (trunc) full.take(commentEnd - 10) else full)
    }.toDF("media_id", "payload")
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
    Multimodal.spreadIds(documents).map { id =>
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
