package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MP3 frame-header classification (ISO/IEC 11172-3 / 13818-3 header
  * layout) — the audit that makes compressed audio VISIBLE to the
  * corpus gates: WAV/PCM decodes fully ([[Multimodal]]), while the
  * MP3 population in a real crawl was previously an undifferentiated
  * refusal. This walks the frame headers only (sync, version, layer,
  * bitrate/sample-rate indices, padding), never the audio payload —
  * version/layer/rate/bitrate classification, frame count, a duration
  * estimate, VBR detection, and TAGGED error families, so a refusal
  * rate is quantified per failure mode (the progressive-JPEG
  * treatment from r7, applied to audio).
  *
  * Handled structure: optional ID3v2 prefix (syncsafe size, skipped
  * and counted), consecutive frames (Layer I/II/III under MPEG1 /
  * MPEG2 / MPEG2.5, padding bit, CRC flag — the CRC bytes live inside
  * the frame length and are not verified), an optional trailing
  * 128-byte ID3v1 "TAG" block. Error families: "bad_sync" (expected a
  * frame, found other bytes), "bad_header" (reserved version/layer,
  * free/bad bitrate index, reserved sample-rate index, or mid-stream
  * parameter change), "truncated" (header claims more bytes than
  * remain). The parsed prefix's classification is KEPT on error rows
  * (ok=0) — an audit wants "847 truncated after n frames", not a
  * silent drop.
  *
  * Scale shape: one clip per row, header walk inside mapPartitions —
  * the decodeStage plan shape; bytes never touch the driver. */
object Mp3 {

  /** Per-clip classification row. */
  final case class Mp3Info(
      media_id: Long, ok: Int, version: String, layer: Int,
      sample_rate: Int, first_bitrate_kbps: Int, vbr: Int,
      n_frames: Int, duration_ms: Long, id3v2_bytes: Int, id3v1: Int,
      err: String)

  // bitrate tables in kbps, index 1..14 (0 = "free" and 15 = bad are
  // both classification errors here)
  private val BrMpeg1L1 = Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrMpeg1L2 = Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrMpeg1L3 = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrMpeg2L1 = Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrMpeg2L23 = Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val RateMpeg1 = Array(44100, 48000, 32000)
  private val RateMpeg2 = Array(22050, 24000, 16000)
  private val RateMpeg25 = Array(11025, 12000, 8000)

  /** version: 0=MPEG1, 1=MPEG2, 2=MPEG2.5; layer: 1/2/3. */
  private def bitrateKbps(version: Int, layer: Int, idx: Int): Int =
    (version, layer) match {
      case (0, 1) => BrMpeg1L1(idx - 1)
      case (0, 2) => BrMpeg1L2(idx - 1)
      case (0, 3) => BrMpeg1L3(idx - 1)
      case (_, 1) => BrMpeg2L1(idx - 1)
      case _ => BrMpeg2L23(idx - 1)
    }

  private def sampleRate(version: Int, srIdx: Int): Int = version match {
    case 0 => RateMpeg1(srIdx)
    case 1 => RateMpeg2(srIdx)
    case _ => RateMpeg25(srIdx)
  }

  /** Samples per frame — the duration unit. */
  private def samplesPerFrame(version: Int, layer: Int): Int = layer match {
    case 1 => 384
    case 2 => 1152
    case _ => if (version == 0) 1152 else 576
  }

  /** Frame length in bytes (header + CRC + payload), floor division
    * per the spec's slot arithmetic. */
  private[multimodal] def frameLength(version: Int, layer: Int,
      brKbps: Int, rate: Int, padding: Int): Int =
    if (layer == 1) ((12 * brKbps * 1000 / rate) + padding) * 4
    else (samplesPerFrame(version, layer) / 8) * brKbps * 1000 / rate + padding

  private def syncsafe(b: Array[Byte], p: Int): Int =
    ((b(p) & 0x7f) << 21) | ((b(p + 1) & 0x7f) << 14) |
      ((b(p + 2) & 0x7f) << 7) | (b(p + 3) & 0x7f)

  /** Walk one MP3 payload's frame headers. Total work is O(frames) —
    * the walk jumps frame lengths, it never scans payload bytes. */
  def parseMp3(id: Long, b: Array[Byte]): Mp3Info = {
    def fail(err: String, id3v2: Int): Mp3Info =
      Mp3Info(id, 0, "", 0, 0, 0, 0, 0, 0L, id3v2, 0, err)
    if (b == null || b.length < 4) return fail("bad_sync", 0)
    var p = 0
    var id3v2 = 0
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return fail("truncated", 0)
      id3v2 = 10 + syncsafe(b, 6)
      if (id3v2 > b.length) return fail("truncated", 0)
      p = id3v2
    }
    var version = -1
    var layer = 0
    var rate = 0
    var firstBr = 0
    var vbr = 0
    var nFrames = 0
    var id3v1 = 0
    var err = ""
    var done = false
    while (!done) {
      if (p == b.length) done = true
      else if (b.length - p == 128 && b(p) == 'T' && b(p + 1) == 'A' &&
          b(p + 2) == 'G') {
        id3v1 = 1; p += 128
      } else if (b.length - p < 4) { err = "bad_sync"; done = true }
      else if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xe0) != 0xe0) {
        err = "bad_sync"; done = true
      } else {
        val vBits = (b(p + 1) >> 3) & 3
        val lBits = (b(p + 1) >> 1) & 3
        val brIdx = (b(p + 2) >> 4) & 0x0f
        val srIdx = (b(p + 2) >> 2) & 3
        val pad = (b(p + 2) >> 1) & 1
        val v = vBits match {
          case 3 => 0; case 2 => 1; case 0 => 2; case _ => -2 // reserved
        }
        val l = lBits match { case 3 => 1; case 2 => 2; case 1 => 3; case _ => 0 }
        if (v == -2 || l == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) {
          err = "bad_header"; done = true
        } else {
          val br = bitrateKbps(v, l, brIdx)
          val sr = sampleRate(v, srIdx)
          if (nFrames == 0) {
            version = v; layer = l; rate = sr; firstBr = br
          } else if (v != version || l != layer || sr != rate) {
            // a mid-stream parameter change is a mis-splice, not VBR
            err = "bad_header"; done = true
          } else if (br != firstBr) vbr = 1
          if (err.isEmpty) {
            val len = frameLength(v, l, br, sr, pad)
            if (len <= 4) { err = "bad_header"; done = true }
            else if (b.length - p < len) { err = "truncated"; done = true }
            else { nFrames += 1; p += len }
          }
        }
      }
    }
    val verStr = version match {
      case 0 => "1"; case 1 => "2"; case 2 => "2.5"; case _ => ""
    }
    if (nFrames == 0)
      Mp3Info(id, 0, "", 0, 0, 0, 0, 0, 0L, id3v2, id3v1,
        if (err.isEmpty) "bad_sync" else err)
    else {
      val durMs = nFrames.toLong * samplesPerFrame(version, layer) * 1000L / rate
      Mp3Info(id, if (err.isEmpty) 1 else 0, verStr, layer, rate, firstBr,
        vbr, nFrames, durMs, id3v2, id3v1, err)
    }
  }

  /** Batched classification over a binary media frame — the
    * decodeStage plan shape. */
  def decodeMp3Info(media: DataFrame, partitions: Int = 0): Dataset[Mp3Info] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseMp3(id, p) })(
        org.apache.spark.sql.Encoders.product[Mp3Info])
  }

  /** One frame's bytes: real header + deterministic fill (the walk
    * never reads payload, but the LENGTH must be exact). */
  private[multimodal] def frameBytes(version: Int, layer: Int, brIdx: Int,
      srIdx: Int, pad: Int, crc: Boolean): Array[Byte] = {
    val vBits = version match { case 0 => 3; case 1 => 2; case _ => 0 }
    val lBits = layer match { case 1 => 3; case 2 => 2; case _ => 1 }
    val br = bitrateKbps(version, layer, brIdx)
    val sr = sampleRate(version, srIdx)
    val len = frameLength(version, layer, br, sr, pad)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    out(1) = (0xe0 | (vBits << 3) | (lBits << 1) | (if (crc) 0 else 1)).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    out(3) = 0x40.toByte // joint stereo, no flags
    var i = 4
    while (i < len) { out(i) = ((i * 73 + 5) & 0x7e).toByte; i += 1 }
    out
  }

  /** Deterministic MP3 corpus from the documents table — every header
    * field, tag wrapper, and error family fanned over id arithmetic
    * (the gate's closed-form oracle restates the same arithmetic):
    *
    *   version       id%3 (MPEG1 / MPEG2 / MPEG2.5)
    *   layer         id%4 -> III, III, II, I
    *   bitrate index 1 + id%14; VBR clips (id%5==2) use 1+((id+f)%14)
    *   rate index    (id/3)%3;  padding bit when id%11==6
    *   CRC flag      id%9==2 (bytes live inside the frame length)
    *   frames        3 + id%5
    *   ID3v2 prefix  id%4==1 (content 17 + id%50 bytes, syncsafe size)
    *   ID3v1 "TAG"   id%6==4 on clean clips
    *   bad_header    id%13==7 (frame 0 claims bitrate index 15)
    *   bad_sync      else id%7==3 (frame 1's sync byte zeroed)
    *   truncated     else id%7==5 (last frame cut at half length)
    */
  def mp3CorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val version = m(3)
      val layer = m(4) match { case 2 => 2; case 3 => 1; case _ => 3 }
      val srIdx = java.lang.Math.floorMod(id / 3, 3L).toInt
      val pad = if (m(11) == 6) 1 else 0
      val crc = m(9) == 2
      val nFrames = 3 + m(5)
      val vbr = m(5) == 2
      val badHeader = m(13) == 7
      val badSync = !badHeader && m(7) == 3
      val truncated = !badHeader && !badSync && m(7) == 5
      val out = new java.io.ByteArrayOutputStream()
      if (m(4) == 1) { // ID3v2 prefix
        val content = 17 + m(50)
        out.write('I'); out.write('D'); out.write('3')
        out.write(4); out.write(0); out.write(0) // v2.4, no flags
        out.write((content >> 21) & 0x7f); out.write((content >> 14) & 0x7f)
        out.write((content >> 7) & 0x7f); out.write(content & 0x7f)
        var i = 0
        while (i < content) { out.write((i * 31 + 7) & 0x7f); i += 1 }
      }
      if (badHeader) {
        val f = frameBytes(version, layer, 1, srIdx, pad, crc)
        f(2) = ((15 << 4) | (srIdx << 2) | (pad << 1)).toByte // bitrate 15
        out.write(f, 0, 4)
        out.write(new Array[Byte](32), 0, 32) // never walked past
      } else {
        var f = 0
        while (f < nFrames) {
          val brIdx = if (vbr) 1 + java.lang.Math.floorMod(id + f, 14L).toInt
            else 1 + m(14)
          val frame = frameBytes(version, layer, brIdx, srIdx, pad, crc)
          if (badSync && f == 1) {
            frame(0) = 0 // frame 1 loses sync: walk stops after frame 0
            out.write(frame, 0, frame.length)
            f = nFrames // nothing after matters; stop writing
          } else if (truncated && f == nFrames - 1) {
            out.write(frame, 0, frame.length / 2)
          } else out.write(frame, 0, frame.length)
          f += 1
        }
        if (m(6) == 4 && !badSync && !truncated) { // ID3v1 trailer
          out.write('T'); out.write('A'); out.write('G')
          var i = 3
          while (i < 128) { out.write((i * 11 + 3) & 0x7f); i += 1 }
        }
      }
      (id, out.toByteArray)
    }.toDF("media_id", "payload")
  }

  // ---- ID3v2 text frames (the EXIF analog for audio metadata) --------

  final case class Id3Tags(media_id: Long, ok: Int, version: Int,
      title: String, artist: String, album: String, year: String,
      n_frames: Int, err: String)

  /** Parse the leading ID3v2 tag's TEXT frames (the public id3.org
    * spec, v2.2 / v2.3 / v2.4): title/artist/album plus the year
    * under its version's name (TYE in v2.2, TYER in v2.3, TDRC in
    * v2.4). Frame headers are 6 bytes with 3-char ids and 3-byte BE
    * sizes in v2.2, 10 bytes with 4-char ids in v2.3/v2.4 — and the
    * size field is plain big-endian in v2.3 but SYNCSAFE in v2.4, the
    * classic cross-version corruption source, handled per version.
    * Text encodings: 0 (latin-1), 1 (UTF-16 with BOM, both
    * endiannesses), and the v2.4-only 2 (UTF-16BE, no BOM) and 3
    * (utf-8) all DECODE; an encoding-1 frame without a BOM or an
    * encoding byte outside its version's set refuses as
    * "bad_encoding" (loud, never mojibake). Header flags: a v2.3/v2.4
    * extended header (0x40) is skipped under its version's size
    * convention (v2.3 size EXCLUDES the 4 size bytes, v2.4 syncsafe
    * size INCLUDES itself); unsynchronisation / experimental / footer
    * bits (and any v2.2 flag) refuse as "unsupported_flags" — this
    * walk does not reverse byte stuffing. Error families: "no_id3",
    * "bad_version", "unsupported_flags", "bad_encoding", "truncated"
    * (tag, extended header, or a frame past the payload).
    * [[parseMp3]] keeps skipping the tag opaquely — audio structure
    * and metadata stay separate audits (q156 vs q173). */
  def parseId3(id: Long, b: Array[Byte]): Id3Tags = {
    def fail(err: String): Id3Tags =
      Id3Tags(id, 0, 0, "", "", "", "", 0, err)
    if (b == null || b.length < 10 || b(0) != 'I' || b(1) != 'D' ||
        b(2) != '3') return fail("no_id3")
    val ver = b(3) & 0xff
    if (ver != 2 && ver != 3 && ver != 4) return fail("bad_version")
    val flags = b(5) & 0xff
    if ((flags & 0xbf) != 0 || (ver == 2 && flags != 0))
      return fail("unsupported_flags")
    val tagEnd = 10 + syncsafe(b, 6)
    if (tagEnd > b.length) return fail("truncated")
    var p = 10
    if ((flags & 0x40) != 0) { // extended header, per-version size rule
      if (p + 4 > tagEnd) return fail("truncated")
      val skip =
        if (ver == 4) syncsafe(b, p)
        else 4 + (((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
          ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff))
      if (skip < 4 || p + skip > tagEnd) return fail("truncated")
      p += skip
    }
    val hdr = if (ver == 2) 6 else 10
    var title = ""; var artist = ""; var album = ""; var year = ""
    var n = 0
    var bad = false
    while (p + hdr <= tagEnd && b(p) != 0) {
      val fid = new String(b, p, if (ver == 2) 3 else 4, "ISO-8859-1")
      val fsize =
        if (ver == 2) ((b(p + 3) & 0xff) << 16) | ((b(p + 4) & 0xff) << 8) |
          (b(p + 5) & 0xff)
        else if (ver == 4) syncsafe(b, p + 4)
        else ((b(p + 4) & 0xff) << 24) | ((b(p + 5) & 0xff) << 16) |
          ((b(p + 6) & 0xff) << 8) | (b(p + 7) & 0xff)
      if (fsize < 0 || p + hdr + fsize > tagEnd) return fail("truncated")
      if (fid.startsWith("T") && fsize >= 1) {
        val enc = b(p + hdr) & 0xff
        val off = p + hdr + 1
        val len = fsize - 1
        val text: String = enc match {
          case 0 => new String(b, off, len, "ISO-8859-1")
          case 1 =>
            if (len >= 2 && (b(off) & 0xff) == 0xff &&
                (b(off + 1) & 0xff) == 0xfe)
              new String(b, off + 2, len - 2, "UTF-16LE")
            else if (len >= 2 && (b(off) & 0xff) == 0xfe &&
                (b(off + 1) & 0xff) == 0xff)
              new String(b, off + 2, len - 2, "UTF-16BE")
            else { bad = true; "" } // encoding 1 REQUIRES a BOM
          case 2 if ver == 4 => new String(b, off, len, "UTF-16BE")
          case 3 if ver == 4 => new String(b, off, len, "UTF-8")
          case _ => bad = true; ""
        }
        if (bad) return fail("bad_encoding")
        val t = text.takeWhile(_ != '\u0000')
        fid match {
          case "TIT2" | "TT2" => title = t
          case "TPE1" | "TP1" => artist = t
          case "TALB" | "TAL" => album = t
          case "TYER" if ver == 3 => year = t
          case "TDRC" if ver == 4 => year = t
          case "TYE" if ver == 2 => year = t
          case _ => ()
        }
      }
      n += 1
      p += hdr + fsize
    }
    Id3Tags(id, 1, ver, title, artist, album, year, n, "")
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeId3Tags(media: DataFrame, partitions: Int = 0): Dataset[Id3Tags] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseId3(id, p) })(
        org.apache.spark.sql.Encoders.product[Id3Tags])
  }

  /** Encoding selectors for [[id3Bytes]] — fixture-side names for the
    * spec's text-encoding bytes plus the BOM flavors and the planted
    * BOM-less refusal arm. */
  private[multimodal] val EncLatin1 = 0 // encoding byte 0
  private[multimodal] val EncUtf8 = 1 // encoding byte 3 (v2.4)
  private[multimodal] val EncUtf16LeBom = 2 // encoding byte 1, FF FE
  private[multimodal] val EncUtf16BeBom = 3 // encoding byte 1, FE FF
  private[multimodal] val EncUtf16Be = 4 // encoding byte 2 (v2.4, no BOM)
  private[multimodal] val EncUtf16NoBom = 5 // encoding byte 1, BOM missing

  /** One ID3v2 tag (v2.2 / v2.3 / v2.4) carrying the four text
    * frames. v2.2 uses 3-char frame ids with 3-byte BE sizes and
    * always latin-1; `flags` lands in the header flag byte;
    * `extHeader` prepends a version-correct extended header. */
  private[multimodal] def id3Bytes(ver: Int, title: String, artist: String,
      album: String, year: String, enc: Int,
      oversizeLastFrame: Int = 0, flags: Int = 0,
      extHeader: Boolean = false): Array[Byte] = {
    val frames = new java.io.ByteArrayOutputStream()
    if (extHeader && ver == 3) {
      // v2.3: 4-byte BE size EXCLUDING itself, 2 flag bytes, pad size
      frames.write(0); frames.write(0); frames.write(0); frames.write(6)
      frames.write(0); frames.write(0)
      frames.write(0); frames.write(0); frames.write(0); frames.write(0)
    } else if (extHeader && ver == 4) {
      // v2.4: syncsafe size INCLUDING itself, numflagbytes=1, flags=0
      frames.write(0); frames.write(0); frames.write(0); frames.write(6)
      frames.write(1); frames.write(0)
    }
    val names =
      if (ver == 2) Seq("TT2" -> title, "TP1" -> artist, "TAL" -> album,
        "TYE" -> year)
      else Seq("TIT2" -> title, "TPE1" -> artist, "TALB" -> album,
        (if (ver == 4) "TDRC" else "TYER") -> year)
    for (((fid, text), k) <- names.zipWithIndex) {
      val encV = if (ver == 2) EncLatin1 else enc
      val encByte = encV match {
        case EncLatin1 => 0
        case EncUtf8 => 3
        case EncUtf16Be => 2
        case _ => 1
      }
      val body = encV match {
        case EncLatin1 => text.getBytes("ISO-8859-1")
        case EncUtf8 => text.getBytes("UTF-8")
        case EncUtf16LeBom =>
          Array(0xff.toByte, 0xfe.toByte) ++ text.getBytes("UTF-16LE")
        case EncUtf16BeBom =>
          Array(0xfe.toByte, 0xff.toByte) ++ text.getBytes("UTF-16BE")
        case EncUtf16Be => text.getBytes("UTF-16BE")
        case _ => text.getBytes("UTF-16LE") // EncUtf16NoBom: enc 1, no BOM
      }
      fid.foreach(c => frames.write(c.toInt))
      val fsize = 1 + body.length +
        (if (k == names.length - 1) oversizeLastFrame else 0)
      if (ver == 2) {
        frames.write((fsize >> 16) & 0xff); frames.write((fsize >> 8) & 0xff)
        frames.write(fsize & 0xff)
      } else if (ver == 4) {
        frames.write((fsize >> 21) & 0x7f); frames.write((fsize >> 14) & 0x7f)
        frames.write((fsize >> 7) & 0x7f); frames.write(fsize & 0x7f)
      } else {
        frames.write((fsize >> 24) & 0xff); frames.write((fsize >> 16) & 0xff)
        frames.write((fsize >> 8) & 0xff); frames.write(fsize & 0xff)
      }
      if (ver != 2) { frames.write(0); frames.write(0) } // frame flags
      frames.write(encByte)
      frames.write(body, 0, body.length)
    }
    val fb = frames.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(ver); out.write(0)
    out.write(flags | (if (extHeader) 0x40 else 0))
    val size = fb.length
    out.write((size >> 21) & 0x7f); out.write((size >> 14) & 0x7f)
    out.write((size >> 7) & 0x7f); out.write(size & 0x7f)
    out.write(fb, 0, fb.length)
    out.toByteArray
  }

  /** Deterministic ID3 corpus — an id3v2 tag ahead of one real MPEG
    * frame header, fields and errors fanned over id arithmetic:
    *   version   3 + id%2 (except the v2.2 arm)
    *   encoding  (id/2)%4: latin-1 / UTF-16LE+BOM / UTF-16BE+BOM /
    *             (utf-8 when the version is 2.4, else UTF-16LE+BOM) —
    *             every encoding decodes to the SAME closed-form text
    *   title "Track <id>", artist "Artist <id%50>",
    *   album "Album <id%20>", year 1990 + id%35;  4 frames
    *   no_id3       id%7==2 (bare MPEG frame, no tag)
    *   bad_version  else id%11==5 (version byte 5)
    *   truncated    else id%13==3 (last frame declares 30 extra bytes
    *                the tag does not carry)
    *   v2.2         else id%17==6 (3-char frames, TYE year, latin-1)
    *   unsupported_flags  else id%19==7 (unsynchronisation bit set)
    *   ext header   else id%23==9 (version-correct ext header, parses ok)
    *   bad_encoding else id%29==11 (encoding byte 1 without a BOM) */
  def id3CorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val noTag = m(7) == 2
      val badVer = !noTag && m(11) == 5
      val trunc = !noTag && !badVer && m(13) == 3
      val v22 = !noTag && !badVer && !trunc && m(17) == 6
      val badFlags = !noTag && !badVer && !trunc && !v22 && m(19) == 7
      val ext = !noTag && !badVer && !trunc && !v22 && !badFlags && m(23) == 9
      val noBom = !noTag && !badVer && !trunc && !v22 && !badFlags && !ext &&
        m(29) == 11
      // one valid MPEG1 Layer3 frame header + slots after the tag
      val audio = new Array[Byte](104)
      audio(0) = 0xff.toByte; audio(1) = 0xfb.toByte
      audio(2) = 0x90.toByte; audio(3) = 0x00 // 128kbps, 44100, no pad
      val payload =
        if (noTag) audio
        else {
          val ver = if (badVer) 5 else if (v22) 2 else 3 + m(2)
          val enc =
            if (noBom) EncUtf16NoBom
            else java.lang.Math.floorMod(id / 2, 4L).toInt match {
              case 0 => EncLatin1
              case 1 => EncUtf16LeBom
              case 2 => EncUtf16BeBom
              case _ => if (ver == 4) EncUtf8 else EncUtf16LeBom
            }
          val tag = id3Bytes(ver,
            s"Track $id", s"Artist ${m(50)}", s"Album ${m(20)}",
            (1990 + m(35)).toString, enc,
            oversizeLastFrame = if (trunc) 30 else 0,
            flags = if (badFlags) 0x80 else 0,
            extHeader = ext)
          tag ++ audio
        }
      (id, payload)
    }.toDF("media_id", "payload")
  }
}
