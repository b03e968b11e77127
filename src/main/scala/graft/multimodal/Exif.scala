package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXIF metadata classification (the public EXIF/TIFF 6.0 spec) and
  * orientation-NORMALIZED perceptual hashing — the curation step the
  * plain pHash family cannot do alone: two crawls of the same photo,
  * one stored upright and one stored rotated with an Orientation tag,
  * hash apart under q133's pipeline but together once each image is
  * normalized to its display orientation first.
  *
  * The walk: JPEG marker scan to the APP1 "Exif\0\0" segment, then
  * the TIFF header (II/MM byte order, magic 42, IFD0 offset) and
  * IFD0's 12-byte entries — Orientation (tag 0x0112, SHORT, inline)
  * and DateTime (tag 0x0132, ASCII, usually via the value-offset
  * indirection). Everything else is counted, not parsed. Error
  * families (the house discipline): "not_jpeg", "no_exif" (a legal
  * JPEG without APP1 — the audit counts them), "bad_tiff" (byte
  * order / magic), "truncated" (IFD or a value offset past the
  * segment).
  *
  * Orientation semantics: tag o says how to rotate/flip STORED pixels
  * for display (1 upright, 2 flip-H, 3 rot180, 4 flip-V, 5 transpose,
  * 6 rot90-CW-to-display, 7 transverse, 8 rot270-CW-to-display). The
  * fixture generator and [[normalizeOrientation]] are exact inverses
  * BY SHARED COORDINATE MAP, and the q172 oracle pins the normalized
  * hash against the upright base's closed-form replay — so a tag-o
  * producer/consumer pair round-trips exactly; see q172's Scaladoc. */
object Exif {

  final case class ExifInfo(media_id: Long, ok: Int, byte_order: String,
      orientation: Int, datetime: String, datetime_original: String,
      n_entries: Int, err: String)

  /** Locate the APP1 Exif payload: (TIFF-header offset, length). */
  private def findExif(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val mk = b(i + 1) & 0xff
      if (mk == 0xd8 || mk == 0x01 || (mk >= 0xd0 && mk <= 0xd7)) i += 2
      else if (mk == 0xda || mk == 0xd9) return None // scan starts / end
      else {
        val segLen = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (segLen < 2 || i + 2 + segLen > b.length) return None
        if (mk == 0xe1 && segLen >= 8 && b(i + 4) == 'E' && b(i + 5) == 'x' &&
            b(i + 6) == 'i' && b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
          return Some((i + 10, segLen - 8))
        i += 2 + segLen
      }
    }
    None
  }

  def parseExif(id: Long, b: Array[Byte]): ExifInfo = {
    def fail(err: String): ExifInfo = ExifInfo(id, 0, "", 0, "", "", 0, err)
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff ||
        (b(1) & 0xff) != 0xd8) return fail("not_jpeg")
    val (o, len) = findExif(b) match {
      case Some(x) => x
      case None => return fail("no_exif")
    }
    if (len < 8) return fail("truncated")
    val big =
      if (b(o) == 'M' && b(o + 1) == 'M') true
      else if (b(o) == 'I' && b(o + 1) == 'I') false
      else return fail("bad_tiff")
    def u16(p: Int): Int = {
      if (p + 2 > o + len) return -1
      if (big) ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
      else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Long = {
      if (p + 4 > o + len) return -1L
      if (big) ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    }
    /** ASCII entry value: inline when count <= 4, else via the value
      * offset. The address math stays in LONG so a hostile offset near
      * 2^32 cannot wrap back inside [o, o+len) and pass the bounds
      * check — null means "truncated". */
    def readAscii(p: Int, cnt: Long): String = {
      val at: Long = if (cnt <= 4) (p + 8).toLong else o.toLong + u32(p + 8)
      if (at < o || at + cnt > o + len) return null
      val a = at.toInt
      var m = cnt.toInt
      while (m > 0 && b(a + m - 1) == 0) m -= 1
      new String(b, a, m, "ISO-8859-1")
    }
    if (u16(o + 2) != 42) return fail("bad_tiff")
    val ifdOff = u32(o + 4)
    if (ifdOff < 0 || o + ifdOff + 2 > o + len) return fail("truncated")
    val ifd = (o + ifdOff).toInt
    val n = u16(ifd)
    if (n < 0 || ifd + 2 + 12 * n + 4 > o + len) return fail("truncated")
    var orientation = 0
    var datetime = ""
    var dtOriginal = ""
    var exifIfdOff = -1L
    var e = 0
    while (e < n) {
      val p = ifd + 2 + 12 * e
      val tag = u16(p)
      val typ = u16(p + 2)
      val cnt = u32(p + 4)
      if (tag == 0x0112 && typ == 3) orientation = u16(p + 8)
      else if (tag == 0x0132 && typ == 2 && cnt > 0) {
        val s = readAscii(p, cnt)
        if (s == null) return fail("truncated")
        datetime = s
      } else if (tag == 0x8769 && typ == 4) exifIfdOff = u32(p + 8)
      e += 1
    }
    // the ExifIFD pointer (0x8769) indirection — the IFD real photo
    // pipelines key on: DateTimeOriginal (0x9003) lives there, not
    // in IFD0
    if (exifIfdOff >= 0) {
      if (exifIfdOff + 2 > len) return fail("truncated")
      val sub = (o + exifIfdOff).toInt
      val sn = u16(sub)
      if (sn < 0 || sub + 2 + 12 * sn + 4 > o + len) return fail("truncated")
      var se = 0
      while (se < sn) {
        val p = sub + 2 + 12 * se
        val tag = u16(p)
        val typ = u16(p + 2)
        val cnt = u32(p + 4)
        if (tag == 0x9003 && typ == 2 && cnt > 0) {
          val s = readAscii(p, cnt)
          if (s == null) return fail("truncated")
          dtOriginal = s
        }
        se += 1
      }
    }
    ExifInfo(id, 1, if (big) "MM" else "II", orientation, datetime,
      dtOriginal, n, "")
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeExifInfo(media: DataFrame, partitions: Int = 0): Dataset[ExifInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseExif(id, p) })(
        org.apache.spark.sql.Encoders.product[ExifInfo])
  }

  // ---- orientation geometry (shared by normalizer and fixtures) ------

  /** Displayed (x, y) -> stored coordinates for orientation o, given
    * DISPLAYED dims. One map for both directions of the fixture/
    * normalizer pair, so they cannot drift. */
  private[multimodal] def storedCoord(o: Int, x: Int, y: Int,
      wd: Int, hd: Int): (Int, Int) = o match {
    case 2 => (wd - 1 - x, y)
    case 3 => (wd - 1 - x, hd - 1 - y)
    case 4 => (x, hd - 1 - y)
    case 5 => (y, x)
    case 6 => (y, wd - 1 - x)
    case 7 => (hd - 1 - y, wd - 1 - x)
    case 8 => (hd - 1 - y, x)
    case _ => (x, y) // 1, 0, or out-of-spec: upright
  }

  /** Rotate/flip a stored gray plane to display orientation. Returns
    * (displayed w, displayed h, displayed plane). */
  def normalizeOrientation(gray: Array[Int], ws: Int, hs: Int,
      o: Int): (Int, Int, Array[Int]) = {
    val swap = o >= 5 && o <= 8
    val wd = if (swap) hs else ws
    val hd = if (swap) ws else hs
    val out = new Array[Int](wd * hd)
    var y = 0
    while (y < hd) {
      var x = 0
      while (x < wd) {
        val (sx, sy) = storedCoord(o, x, y, wd, hd)
        out(y * wd + x) = gray(sy * ws + sx)
        x += 1
      }
      y += 1
    }
    (wd, hd, out)
  }

  final case class OrientedPHash(media_id: Long, ok: Int, orientation: Int,
      phash: Long)

  /** Decode (JPEG) + EXIF-orientation-normalize + pHash — the dedup
    * fingerprint that sees THROUGH storage rotation. A payload without
    * EXIF (or without the tag) hashes upright; an undecodable one
    * surfaces ok=0. */
  def decodeOrientedPHash(media: DataFrame, partitions: Int = 0): Dataset[OrientedPHash] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, payload) =>
        val info = parseExif(id, payload)
        val o = if (info.ok == 1 && info.orientation >= 1 &&
          info.orientation <= 8) info.orientation else 1
        Jpeg.decodeJpegPixels(payload) match {
          case Some((w, h, _, px)) if w >= 8 && h >= 8 =>
            val gray = new Array[Int](w * h)
            var i = 0
            while (i < gray.length) { gray(i) = px(3 * i) & 0xff; i += 1 }
            val (wd, hd, disp) = normalizeOrientation(gray, w, h, o)
            OrientedPHash(id, 1, o, Multimodal.pHash64(disp, wd, hd))
          case _ => OrientedPHash(id, 0, o, 0L)
        }
      })(org.apache.spark.sql.Encoders.product[OrientedPHash])
  }

  // ---- fixture synthesis ------------------------------------------------

  /** One APP1 Exif segment (marker + length + payload): IFD0 carries
    * Orientation, DateTime (ASCII via the value-offset indirection)
    * and the ExifIFD pointer (0x8769); the sub-IFD carries
    * DateTimeOriginal (0x9003, also via offset). `badSubIfd` points
    * 0x8769 past the segment (the indirection refusal arm). */
  private[multimodal] def app1Bytes(orientation: Int, datetime: String,
      big: Boolean, dtOriginal: String = "2023:01:01 00:30:00",
      breakTiffMagic: Boolean = false,
      truncateIfd: Boolean = false, badSubIfd: Boolean = false): Array[Byte] = {
    val t = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (big) { t.write((v >> 8) & 0xff); t.write(v & 0xff) }
      else { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (big) { t.write(((v >> 24) & 0xff).toInt); t.write(((v >> 16) & 0xff).toInt)
        t.write(((v >> 8) & 0xff).toInt); t.write((v & 0xff).toInt) }
      else { t.write((v & 0xff).toInt); t.write(((v >> 8) & 0xff).toInt)
        t.write(((v >> 16) & 0xff).toInt); t.write(((v >> 24) & 0xff).toInt) }
    t.write(if (big) 'M' else 'I'); t.write(if (big) 'M' else 'I')
    w16(if (breakTiffMagic) 43 else 42)
    w32(8L) // IFD0 right after the header
    val dt = (datetime + "\u0000").getBytes("ISO-8859-1")
    val dto = (dtOriginal + "\u0000").getBytes("ISO-8859-1")
    val nEntries = if (truncateIfd) 4 else 3
    // layout: IFD0 [8, 50) | dt value | ExifIFD (18 bytes) | dto value
    val dtOff = 8 + 2 + 12 * 3 + 4
    val subOff = dtOff + dt.length
    val dtoOff = subOff + 2 + 12 + 4
    w16(nEntries) // a truncated fixture DECLARES more than it carries
    // entry: Orientation (SHORT, count 1, inline — padded to 4 bytes)
    w16(0x0112); w16(3); w32(1L)
    w16(orientation); w16(0)
    // entry: DateTime (ASCII, via offset)
    w16(0x0132); w16(2); w32(dt.length.toLong); w32(dtOff.toLong)
    // entry: ExifIFD pointer (LONG, count 1)
    w16(0x8769); w16(4); w32(1L)
    w32(if (badSubIfd) dtoOff + dto.length + 4096L else subOff.toLong)
    w32(0L) // next IFD
    t.write(dt, 0, dt.length)
    // the ExifIFD: one entry, DateTimeOriginal via offset
    w16(1)
    w16(0x9003); w16(2); w32(dto.length.toLong); w32(dtoOff.toLong)
    w32(0L) // next IFD
    t.write(dto, 0, dto.length)
    val tiff = t.toByteArray
    val cut = if (truncateIfd) 8 + 2 + 12 else tiff.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xe1)
    val segLen = 2 + 6 + cut
    out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
    out.write('E'); out.write('x'); out.write('i'); out.write('f')
    out.write(0); out.write(0)
    out.write(tiff, 0, cut)
    out.toByteArray
  }

  /** Splice an APP1 segment right after a JPEG's SOI. */
  private[multimodal] def withApp1(jpeg: Array[Byte],
      app1: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)

  /** Deterministic EXIF corpus — fields and error families fanned over
    * id arithmetic (oracle restates it):
    *   orientation 1 + id%8;  byte order MM when id%2==1 else II
    *   datetime "2024:MM:DD hh:00:00" from id arithmetic; 3 IFD0
    *   entries (Orientation, DateTime, the ExifIFD pointer);
    *   datetime_original "2023:MM:DD hh:30:00" via the 0x8769
    *   indirection (same id arithmetic, year 2023, minute 30)
    *   no_exif   id%7==2 (plain JPEG, no APP1)
    *   bad_tiff  else id%11==5 (TIFF magic 43)
    *   truncated else id%13==3 (IFD declares 4 entries, carries 1)
    *   truncated else id%29==11 (ExifIFD pointer past the segment) */
  def exifCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val base = Jpeg.dcOnlyBytes(16, 16, 1, (bx, by, _) =>
        ((m(10) * 73 + bx * 37 + by * 91) % 17) * 15)
      val noExif = m(7) == 2
      val badTiff = !noExif && m(11) == 5
      val trunc = !noExif && !badTiff && m(13) == 3
      val badSub = !noExif && !badTiff && !trunc && m(29) == 11
      val dt = f"2024:${1 + m(12)}%02d:${1 + m(28)}%02d ${m(24)}%02d:00:00"
      val dto = f"2023:${1 + m(12)}%02d:${1 + m(28)}%02d ${m(24)}%02d:30:00"
      val payload =
        if (noExif) base
        else withApp1(base, app1Bytes(1 + m(8), dt, big = m(2) == 1,
          dtOriginal = dto, breakTiffMagic = badTiff, truncateIfd = trunc,
          badSubIfd = badSub))
      (id, payload)
    }.toDF("media_id", "payload")
  }

  /** Orientation-dedup corpus: groups of 8 consecutive ids share one
    * 48x32 upright base image (block-constant on the 8x8 JPEG grid,
    * seeded by the group); each member STORES the base under its own
    * orientation o = 1 + id%8 with the matching EXIF tag. After
    * normalization all 8 hash identically — the oracle replays the
    * BASE's closed-form hash once per group. */
  def orientedCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val g = id / 8
      val o = 1 + java.lang.Math.floorMod(id, 8L).toInt
      def baseBlock(bx: Int, by: Int): Int =
        (((java.lang.Math.floorMod(g, 10L) * 73L + bx * 37L + by * 91L)
          % 17L) * 15L).toInt
      // displayed grid 6x4 blocks (48x32 px); stored grid swaps for 5-8
      val swap = o >= 5
      val (sbw, sbh) = if (swap) (4, 6) else (6, 4)
      val grid = Array.ofDim[Int](sbh, sbw)
      for (y <- 0 until 4; x <- 0 until 6) {
        val (sx, sy) = storedCoord(o, x, y, 6, 4)
        grid(sy)(sx) = baseBlock(x, y)
      }
      val jpeg = Jpeg.dcOnlyBytes(sbw * 8, sbh * 8, 1,
        (bx, by, _) => grid(by)(bx))
      (id, withApp1(jpeg, app1Bytes(o, "2024:01:01 00:00:00",
        big = java.lang.Math.floorMod(id, 2L) == 1L)))
    }.toDF("media_id", "payload")
  }
}
