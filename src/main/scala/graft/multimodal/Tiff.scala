package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bare TIFF classification (the public TIFF 6.0 specification) — the
  * scanned-document/archival format of crawl corpora, and the
  * container EXIF rides inside JPEG ([[Exif]] walks that embedded
  * case; this walks the standalone file): header byte order
  * (II little / MM big), the IFD chain (multi-PAGE TIFFs link IFDs
  * through the next-IFD pointer), and IFD0's image tags — width (256),
  * length (257), bits-per-sample (258, first value through the
  * value-offset indirection when the count spills past 4 bytes),
  * compression (259), photometric interpretation (262), samples per
  * pixel (277). Strip payloads are counted opaque — pixel decode for
  * TIFF's many compression families is out of scope, loudly.
  *
  * Error families: "not_tiff" (magic), "truncated" (any IFD, entry, or
  * indirect value past the payload), "bad_ifd" (a zero-entry first
  * IFD, or an IFD chain past 64 pages — a cycle guard). */
object Tiff {

  final case class TiffInfo(media_id: Long, ok: Int, byte_order: String,
      width: Long, height: Long, bits: Int, compression: Int,
      photometric: Int, samples: Int, n_pages: Int, err: String)

  def parseTiff(id: Long, b: Array[Byte]): TiffInfo = {
    def fail(err: String): TiffInfo =
      TiffInfo(id, 0, "", 0L, 0L, 0, 0, 0, 0, 0, err)
    if (b == null || b.length < 8) return fail("not_tiff")
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return fail("not_tiff")
    def u16(p: Int): Int = {
      if (p + 2 > b.length) throw new ArrayIndexOutOfBoundsException()
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(p: Int): Long = {
      if (p + 4 > b.length) throw new ArrayIndexOutOfBoundsException()
      if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    }
    try {
      if (u16(2) != 42) return fail("not_tiff")
      var width = 0L
      var height = 0L
      var bits = 0
      var compression = 0
      var photometric = 0
      var samples = 0
      var nPages = 0
      var ifd = u32(4)
      while (ifd != 0) {
        nPages += 1
        if (nPages > 64) return fail("bad_ifd") // cycle guard
        if (ifd < 8 || ifd + 2 > b.length) return fail("truncated")
        val n = u16(ifd.toInt)
        if (n == 0 && nPages == 1) return fail("bad_ifd")
        val base = ifd.toInt + 2
        if (base + 12 * n + 4 > b.length) return fail("truncated")
        if (nPages == 1) {
          var k = 0
          while (k < n) {
            val e = base + 12 * k
            val tag = u16(e)
            val typ = u16(e + 2)
            val cnt = u32(e + 4)
            // SHORT(3) or LONG(4) scalar reads; SHORT arrays past 4
            // bytes go through the value-offset indirection
            def scalar(): Long =
              if (typ == 3) u16(e + 8).toLong
              else if (typ == 4) u32(e + 8)
              else -1L
            def firstShort(): Int =
              if (cnt <= 2) u16(e + 8)
              else {
                val at = u32(e + 8)
                if (at + 2 > b.length) throw new ArrayIndexOutOfBoundsException()
                u16(at.toInt)
              }
            tag match {
              case 256 => width = scalar()
              case 257 => height = scalar()
              case 258 => if (typ == 3) bits = firstShort()
              case 259 => compression = scalar().toInt
              case 262 => photometric = scalar().toInt
              case 277 => samples = scalar().toInt
              case _ => ()
            }
            k += 1
          }
        }
        ifd = u32(base + 12 * n)
      }
      if (width <= 0 || height <= 0) return fail("bad_ifd")
      TiffInfo(id, 1, if (le) "II" else "MM", width, height, bits,
        compression, photometric, samples, nPages, "")
    } catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated")
    }
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeTiffInfo(media: DataFrame, partitions: Int = 0): Dataset[TiffInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseTiff(id, p) })(
        org.apache.spark.sql.Encoders.product[TiffInfo])
  }

  // ---- fixture synthesis (REAL IFDs, both byte orders) -----------------

  /** One page's IFD entries + a tiny opaque strip. `pages` chains IFDs
    * through the next-IFD pointer. 3-sample pages store BitsPerSample
    * as a SHORT[3] through the value-offset indirection. */
  private[multimodal] def tiffBytes(width: Int, height: Int, bits: Int,
      compression: Int, photometric: Int, samples: Int, pages: Int,
      bigEndian: Boolean = false, breakMagic: Boolean = false,
      breakIfd: Boolean = false, truncate: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
      else { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) {
        o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
      } else {
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
      }
    o.write(if (breakMagic) 'X' else (if (bigEndian) 'M' else 'I'))
    o.write(if (bigEndian) 'M' else 'I')
    w16(42)
    w32(8) // first IFD right after the header
    val multiSample = samples > 1
    // per page: IFD (2 + 12n + 4 bytes), then [bits array], then strip
    val nEntries = 7
    val ifdSize = 2 + 12 * nEntries + 4
    val bitsArr = if (multiSample) 2 * samples else 0
    val strip = 16
    val pageSize = ifdSize + bitsArr + strip
    for (p <- 0 until pages) {
      val at = 8 + p * pageSize
      w16(nEntries)
      def entry(tag: Int, typ: Int, cnt: Long, inline: Long): Unit = {
        w16(tag); w16(typ); w32(cnt)
        if (typ == 3 && cnt <= 2) { w16(inline.toInt); w16(0) }
        else w32(inline)
      }
      entry(256, 4, 1, width)
      entry(257, 4, 1, height)
      if (multiSample) entry(258, 3, samples, at + ifdSize) // indirection
      else entry(258, 3, 1, bits)
      entry(259, 3, 1, compression)
      entry(262, 3, 1, photometric)
      entry(277, 3, 1, samples)
      entry(273, 4, 1, at + ifdSize + bitsArr) // StripOffsets (opaque)
      val next = if (p == pages - 1) 0L else (at + pageSize).toLong
      // breakIfd: page 0's next-IFD pointer loops back to itself — the
      // chain never ends and the cycle guard must refuse
      w32(if (breakIfd && p == 0) 8L else next)
      if (multiSample) for (_ <- 0 until samples) w16(bits)
      var k = 0
      while (k < strip) { o.write((k * 29 + 7) & 0xff); k += 1 }
    }
    val full = o.toByteArray
    if (truncate) full.take(full.length - ifdSize / 2) else full
  }

  /** Deterministic TIFF corpus — fields and error families fanned over
    * id arithmetic (the oracle restates it):
    *   byte order   MM at id%2==1, II otherwise
    *   width        16 + id%100;  height  16 + id%50;  bits  8
    *   compression  [1 none, 5 LZW, 7 JPEG][id%3]
    *   photometric  2 (RGB) when samples 3, else 1
    *   samples      3 at id%4==0 (BitsPerSample via the value-offset
    *                indirection), else 1
    *   n_pages      1 + id%3 (the next-IFD chain)
    *   not_tiff     id%7==2;  truncated  else id%11==6 (the LAST
    *                page's IFD cut mid-table)
    *   bad_ifd      else id%13==8 (page 0's next-IFD pointer loops
    *                back to itself -> the cycle guard refuses) */
  def tiffCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val notTiff = m(7) == 2
      val trunc = !notTiff && m(11) == 6
      val badIfd = !notTiff && !trunc && m(13) == 8
      val samples = if (m(4) == 0) 3 else 1
      (id, tiffBytes(
        width = 16 + m(100), height = 16 + m(50), bits = 8,
        compression = Array(1, 5, 7)(m(3)),
        photometric = if (samples == 3) 2 else 1,
        samples = samples, pages = 1 + m(3),
        bigEndian = m(2) == 1,
        breakMagic = notTiff, breakIfd = badIfd, truncate = trunc))
    }.toDF("media_id", "payload")
  }
}
