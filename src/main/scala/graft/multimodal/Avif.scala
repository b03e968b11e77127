package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** AVIF/HEIF image classification (ISO-BMFF, ISO/IEC 23008-12 + the
  * public AV1-in-HEIF binding) — the fast-growing crawl image format
  * the MP4 walk's container family also covers: ftyp brand dispatch
  * (avif/avis; heic/heix/mif1), the `meta` FULL-box walk down
  * iprp→ipco, image dimensions from the FIRST `ispe` property, the
  * property count of `ispe` boxes (an auxiliary alpha image adds a
  * second), and the codec config box actually present (`av1C` /
  * `hvcC`). Payload tiles stay opaque — AV1/HEVC entropy decode is
  * out of scope, loudly (the VP8 interframe discipline).
  *
  * Error families: "not_bmff" (no leading ftyp), "not_heif" (a brand
  * outside the still-image family), "truncated" (a box size past the
  * payload), "no_ispe" (properties without dimensions). */
object Avif {

  final case class AvifInfo(media_id: Long, ok: Int, brand: String,
      width: Long, height: Long, n_ispe: Int, codec: String, err: String)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private val AvifBrands = Set("avif", "avis")
  private val HeifBrands = Set("heic", "heix", "mif1", "msf1")

  def parseAvif(id: Long, b: Array[Byte]): AvifInfo = {
    def fail(err: String): AvifInfo = AvifInfo(id, 0, "", 0L, 0L, 0, "", err)
    if (b == null || b.length < 16) return fail("not_bmff")
    // bounded child iteration; a size past the bound is a refusal, not
    // a clamp (the fixture's truncation plant must surface)
    final case class Box(typ: String, body: Int, end: Int)
    def children(lo: Int, hi: Int): Either[String, Seq[Box]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Box]
      var i = lo
      while (i + 8 <= hi) {
        val size = be32(b, i)
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        // BMFF size forms: 0 = box extends to the end of the FILE —
        // per ISO 14496-12 §4.2 valid ONLY for the final top-level box
        // (real captures: mdat at EOF); 1 = 64-bit largesize follows
        // the type. A size-0 box anywhere else would silently absorb
        // every following sibling (an early size-0 box hiding a later
        // ispe must be a loud structural refusal, not 'no_ispe')
        if (size == 0L) {
          if (hi != b.length || typ != "mdat") return Left("truncated")
          out += Box(typ, i + 8, hi)
          i = hi
        } else if (size == 1L) {
          if (i + 16 > hi) return Left("truncated")
          val ls = be64(b, i + 8)
          if (ls < 16L || ls > (hi - i).toLong) return Left("truncated")
          out += Box(typ, i + 16, i + ls.toInt)
          i += ls.toInt
        } else {
          if (size < 8 || i + size > hi) return Left("truncated")
          out += Box(typ, i + 8, (i + size).toInt)
          i = (i + size).toInt
        }
      }
      if (i != hi) Left("truncated") else Right(out.toSeq)
    }
    children(0, b.length) match {
      case Left(e) => fail(e)
      case Right(top) =>
        val ftyp = top.headOption.filter(_.typ == "ftyp")
          .getOrElse(return fail("not_bmff"))
        if (ftyp.end - ftyp.body < 8) return fail("not_bmff")
        val brand = new String(b, ftyp.body, 4, "ISO-8859-1")
        if (!AvifBrands.contains(brand) && !HeifBrands.contains(brand))
          return fail("not_heif")
        val meta = top.find(_.typ == "meta").getOrElse(return fail("no_ispe"))
        // meta is a FULL box: 4 bytes of version/flags before children
        val inner = for {
          m <- children(meta.body + 4, meta.end)
          iprp <- m.find(_.typ == "iprp").map(x =>
            children(x.body, x.end)).getOrElse(Right(Seq.empty[Box]))
          ipco <- iprp.find(_.typ == "ipco").map(x =>
            children(x.body, x.end)).getOrElse(Right(Seq.empty[Box]))
        } yield ipco
        inner match {
          case Left(e) => fail(e)
          case Right(props) =>
            val ispes = props.filter(p =>
              p.typ == "ispe" && p.end - p.body >= 12)
            if (ispes.isEmpty) return fail("no_ispe")
            // ispe is a FULL box: version/flags, then w/h u32
            val w = be32(b, ispes.head.body + 4)
            val h = be32(b, ispes.head.body + 8)
            val codec =
              if (props.exists(_.typ == "av1C")) "av01"
              else if (props.exists(_.typ == "hvcC")) "hevc"
              else ""
            AvifInfo(id, 1, brand, w, h, ispes.length, codec, "")
        }
    }
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeAvifInfo(media: DataFrame, partitions: Int = 0): Dataset[AvifInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseAvif(id, p) })(
        org.apache.spark.sql.Encoders.product[AvifInfo])
  }

  // ---- fixture synthesis (REAL box trees) ------------------------------

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val size = 8 + body.length
    o.write((size >> 24) & 0xff); o.write((size >> 16) & 0xff)
    o.write((size >> 8) & 0xff); o.write(size & 0xff)
    o.write(typ.getBytes("ISO-8859-1"))
    o.write(body, 0, body.length)
    o.toByteArray
  }

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** `mdatForm`: 0 = normal 32-bit size, 1 = size==1 + 64-bit
    * largesize (the form real HEIF captures use for mdat), 2 =
    * size==0 (extends to end of file; only valid as the LAST box). */
  private[multimodal] def avifBytes(brand: String, w: Int, h: Int,
      withAlpha: Boolean, codec: String, breakMagic: Boolean = false,
      dropIspe: Boolean = false, truncate: Boolean = false,
      mdatForm: Int = 0): Array[Byte] = {
    def ispe(iw: Int, ih: Int): Array[Byte] =
      box("ispe", u32(0) ++ u32(iw) ++ u32(ih))
    val codecBox =
      if (codec == "av01") box("av1C", Array[Byte](0x81.toByte, 0x04, 0x0c, 0x00))
      else box("hvcC", Array.tabulate[Byte](23)(i => ((i * 13 + 1) & 0xff).toByte))
    val props =
      (if (dropIspe) Array.emptyByteArray else ispe(w, h)) ++ codecBox ++
        (if (withAlpha && !dropIspe) ispe(w, h) else Array.emptyByteArray)
    val meta = box("meta", u32(0) ++
      box("hdlr", u32(0) ++ u32(0) ++ "pict".getBytes("ISO-8859-1") ++
        new Array[Byte](13)) ++
      box("iprp", box("ipco", props)))
    val ftyp = box("ftyp",
      (if (breakMagic) "xxxx" else brand).getBytes("ISO-8859-1") ++
        u32(0) ++ brand.getBytes("ISO-8859-1") ++ "mif1".getBytes("ISO-8859-1"))
    val mdatBody = Array.tabulate[Byte](24)(i => ((i * 31 + 5) & 0xff).toByte)
    val mdat = mdatForm match {
      case 1 => // size==1: 64-bit largesize after the type
        val total = 16L + mdatBody.length
        u32(1) ++ "mdat".getBytes("ISO-8859-1") ++
          u32(total >>> 32) ++ u32(total & 0xffffffffL) ++ mdatBody
      case 2 => // size==0: box runs to end of file
        u32(0) ++ "mdat".getBytes("ISO-8859-1") ++ mdatBody
      case _ => box("mdat", mdatBody)
    }
    val full =
      if (breakMagic)
        // not_bmff: the FIRST box is not ftyp at all
        box("free", Array[Byte](0)) ++ meta ++ mdat
      else ftyp ++ meta ++ mdat
    if (truncate) full.take(full.length - 12) else full
  }

  /** Deterministic AVIF/HEIF corpus — fields and error families fanned
    * over id arithmetic (the oracle restates it):
    *   brand     avif (id%2==0, codec av01) / heic (id%2==1, hvcC)
    *   w, h      16 + id%200, 16 + id%120
    *   n_ispe    2 at id%3==0 (the auxiliary alpha image), else 1
    *   not_bmff  id%7==2;  not_heif  else id%11==4 (brand mp41)
    *   truncated else id%13==6 (the tail box cut mid-body)
    *   no_ispe   else id%5==3
    * Wire-shape fan (content-invisible — the oracle never mentions
    * it): mdat rides the 64-bit largesize form at id%4==1 and the
    * size==0 to-end-of-file form at id%4==2 (suppressed on the
    * truncation plant, whose tail cut a size-0 box would absorb). */
  def avifCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val notBmff = m(7) == 2
      val notHeif = !notBmff && m(11) == 4
      val trunc = !notBmff && !notHeif && m(13) == 6
      val noIspe = !notBmff && !notHeif && !trunc && m(5) == 3
      val avif = m(2) == 0
      (id, avifBytes(
        brand = if (notHeif) "mp41" else if (avif) "avif" else "heic",
        w = 16 + m(200), h = 16 + m(120),
        withAlpha = m(3) == 0,
        codec = if (avif) "av01" else "hevc",
        breakMagic = notBmff, dropIspe = noIspe, truncate = trunc,
        mdatForm = if (m(4) == 1) 1 else if (m(4) == 2 && !trunc) 2 else 0))
    }.toDF("media_id", "payload")
  }
}
