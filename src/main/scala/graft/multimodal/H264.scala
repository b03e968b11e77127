package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** H.264/AVC codec-configuration classification for MP4 video tracks —
  * the codec level UNDER the container metadata the engine already
  * reads (q81 tkhd dims, q137 sample tables): the stsd sample entry
  * names the codec, and for AVC the avcC box
  * (AVCDecoderConfigurationRecord, ISO 14496-15 §5.3.3) carries the
  * profile/level pair plus the raw SPS NAL — whose exp-Golomb payload
  * (Rec. ITU-T H.264 §7.3.2.1.1) is the bitstream's OWN statement of
  * coded dimensions (macroblock grid minus the frame cropping), the
  * value a curation job trusts over the editable tkhd floats.
  * Reference anchor: the reference pipeline treats media as opaque
  * blobs (raw collector, `/root/reference/src/collectors`); this is
  * engine-added crawl-scale surface. Tiles/slices stay opaque —
  * classification and configuration only, no pixel decode.
  *
  * Refusal families: `not_mp4` (container), `no_stsd` (no video
  * sample description), `bad_avcc` (truncated/malformed configuration
  * record or SPS), `unsupported_sps` (a scaling-matrix-bearing SPS —
  * parseable dims would require walking the scaling lists; loud
  * refusal instead of a misaligned bit walk). Non-AVC codecs (hvc1,
  * vp09, av01, …) classify by sample-entry type with zeroed AVC
  * fields. */
object H264 {

  final case class Mp4CodecInfo(
      media_id: Long, ok: Int, codec: String,
      profile_idc: Int, level_idc: Int,
      width: Int, height: Int, err: String)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Bounded ISO-BMFF child iterator (the Multimodal.mp4Children
    * shape: 64-bit and to-end sizes, malformed sizes clamp). */
  private[multimodal] def children(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val size32 = be32(b, i) & 0xffffffffL
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val (body, size) =
          if (size32 == 1L && i + 16 <= hi)
            (i + 16, (be32(b, i + 8).toLong << 32) | (be32(b, i + 12) & 0xffffffffL))
          else if (size32 == 0L) (i + 8, (hi - i).toLong)
          else (i + 8, size32)
        // A size smaller than its own header (8, or 16 for largesize) is
        // malformed — clamp to hi rather than yielding end < body, which
        // would hand copyOfRange an inverted (cLo > cHi) avcC range.
        val end = if (size < (body - i).toLong || i + size > hi) hi else (i + size).toInt
        val r = (typ, body, end)
        i = end
        r
      }
    }

  // ---- exp-Golomb bit reader over an emulation-stripped RBSP ----------

  /** Strip emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1). */
  private[multimodal] def stripEmulation(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      if (i + 2 < b.length && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 3) {
        out.write(0); out.write(0); i += 3
      } else { out.write(b(i) & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        if (pos >= b.length * 8) throw new IndexOutOfBoundsException("rbsp")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; k += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // every ue(v) field this parser reads (ids, mb dims, crops,
        // ref counts) is < 2^16 in any spec-conformant SPS; a longer
        // prefix is a malformed bitstream, and letting it through
        // would overflow Int (zeros=31 -> 1<<31 negative) and wrap
        // 16*pw into plausible-looking garbage dimensions
        if (zeros > 15) throw new IndexOutOfBoundsException("ue")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  final case class Sps(profileIdc: Int, levelIdc: Int, width: Int, height: Int)

  /** Parse one SPS NAL unit (header byte + emulation-prevented RBSP).
    * Left = refusal tag. Dimensions per §7.4.2.1.1: 16×mb grid minus
    * frame cropping scaled by the chroma subsampling crop units. */
  private[multimodal] def parseSps(nal: Array[Byte]): Either[String, Sps] = {
    if (nal == null || nal.length < 4) return Left("bad_avcc")
    if ((nal(0) & 0x1f) != 7) return Left("bad_avcc")
    val r = new BitReader(stripEmulation(java.util.Arrays.copyOfRange(nal, 1, nal.length)))
    try {
      val profile = r.u(8)
      r.u(8) // constraint flags + reserved
      val level = r.u(8)
      r.ue() // seq_parameter_set_id
      var chroma = 1 // implicit 4:2:0 for non-high profiles
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profile)) {
        chroma = r.ue()
        if (chroma == 3) r.u(1) // separate_colour_plane_flag
        r.ue(); r.ue() // bit depths
        r.u(1) // qpprime_y_zero_transform_bypass
        if (r.u(1) == 1) return Left("unsupported_sps") // scaling matrices
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue()
        case 1 =>
          r.u(1); r.se(); r.se()
          val n = r.ue()
          var i = 0
          while (i < n) { r.se(); i += 1 }
        case _ => ()
      }
      r.ue() // max_num_ref_frames
      r.u(1) // gaps_in_frame_num_value_allowed
      val pw = r.ue() + 1
      val ph = r.ue() + 1
      val frameMbsOnly = r.u(1)
      if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field
      r.u(1) // direct_8x8_inference
      val (cl, cr, ct, cb) =
        if (r.u(1) == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
      val (subW, subH) = chroma match {
        case 0 => (1, 1) // monochrome: crop units are luma samples
        case 2 => (2, 1)
        case 3 => (1, 1)
        case _ => (2, 2)
      }
      val cropX = subW
      val cropY = subH * (2 - frameMbsOnly)
      val w = 16 * pw - cropX * (cl + cr)
      val h = 16 * (2 - frameMbsOnly) * ph - cropY * (ct + cb)
      if (w <= 0 || h <= 0) Left("bad_avcc") else Right(Sps(profile, level, w, h))
    } catch { case _: IndexOutOfBoundsException => Left("bad_avcc") }
  }

  /** Parse an AVCDecoderConfigurationRecord: version, profile/level,
    * then the FIRST SPS NAL's coded dimensions. */
  private[multimodal] def parseAvcC(b: Array[Byte]): Either[String, Sps] = {
    // 8 = the first SPS's 2-byte length field fully present (a 7-byte
    // truncation would read past the buffer in be16)
    if (b == null || b.length < 8 || (b(0) & 0xff) != 1) return Left("bad_avcc")
    val numSps = b(5) & 0x1f
    if (numSps < 1) return Left("bad_avcc")
    val len = be16(b, 6)
    if (8 + len > b.length) return Left("bad_avcc")
    parseSps(java.util.Arrays.copyOfRange(b, 8, 8 + len)).map { sps =>
      // the record's own profile/level bytes are authoritative for
      // signaling; the SPS must agree in any spec-valid file, and the
      // fixture plants them equal — report the record's
      sps.copy(profileIdc = b(1) & 0xff, levelIdc = b(3) & 0xff)
    }
  }

  /** Classify one MP4's first video sample entry. */
  def parseMp4Codec(id: Long, b: Array[Byte]): Mp4CodecInfo = {
    def fail(tag: String, codec: String = ""): Mp4CodecInfo =
      Mp4CodecInfo(id, 0, codec, 0, 0, 0, 0, tag)
    if (b == null || b.length < 16) return fail("not_mp4")
    if (!children(b, 0, b.length).take(1).exists(_._1 == "ftyp"))
      return fail("not_mp4")
    val stsd = for {
      (_, mLo, mHi) <- children(b, 0, b.length).find(_._1 == "moov")
      (_, tLo, tHi) <- children(b, mLo, mHi).find(_._1 == "trak")
      (_, dLo, dHi) <- children(b, tLo, tHi).find(_._1 == "mdia")
      (_, nLo, nHi) <- children(b, dLo, dHi).find(_._1 == "minf")
      (_, sLo, sHi) <- children(b, nLo, nHi).find(_._1 == "stbl")
      (_, eLo, eHi) <- children(b, sLo, sHi).find(_._1 == "stsd")
    } yield (eLo, eHi)
    stsd match {
      case None => fail("no_stsd")
      case Some((lo, hi)) =>
        if (hi - lo < 16) return fail("no_stsd")
        // stsd: u32 version/flags, u32 entry_count, then entry boxes
        children(b, lo + 8, hi).nextOption() match {
          case None => fail("no_stsd")
          case Some((codec, eLo, eHi)) if codec == "avc1" || codec == "avc3" =>
            // VisualSampleEntry: 78 fixed bytes before the child boxes
            if (eHi - eLo < 78) return fail("bad_avcc", codec)
            children(b, eLo + 78, eHi).find(_._1 == "avcC") match {
              case None => fail("bad_avcc", codec)
              case Some((_, cLo, cHi)) =>
                parseAvcC(java.util.Arrays.copyOfRange(b, cLo, cHi)) match {
                  case Right(s) => Mp4CodecInfo(id, 1, codec,
                    s.profileIdc, s.levelIdc, s.width, s.height, "")
                  case Left(tag) => fail(tag, codec)
                }
            }
          case Some((codec, _, _)) =>
            // non-AVC codecs classify by sample-entry type; their
            // configuration records stay opaque (documented scope)
            Mp4CodecInfo(id, 1, codec, 0, 0, 0, 0, "")
        }
    }
  }

  /** Batched classification over a binary media frame. */
  def decodeMp4Codec(media: DataFrame, partitions: Int = 0): Dataset[Mp4CodecInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .map { case (id, p) => parseMp4Codec(id, p) }(
        org.apache.spark.sql.Encoders.product[Mp4CodecInfo])
  }

  // ---- fixture synthesis (REAL spec-shaped records) ----------------------

  private[multimodal] final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def ue(v: Long): Unit = {
      val code = v + 1
      val n = 63 - java.lang.Long.numberOfLeadingZeros(code)
      bits(0, n); bits(code, n + 1)
    }
    def se(v: Long): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def rbspTrailing(): Unit = { bit(1); while (nbits != 0) bit(0) }
    def toRbsp: Array[Byte] = out.toArray
  }

  /** Insert emulation-prevention bytes (the encoder side of
    * [[stripEmulation]]). */
  private[multimodal] def addEmulation(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length)
    var zeros = 0
    for (x <- rbsp) {
      if (zeros >= 2 && (x & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(x & 0xff)
      zeros = if (x == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** One REAL SPS NAL for the given geometry. `scalingPresent` plants
    * the unsupported_sps refusal (High profile only). */
  private[multimodal] def spsBytes(profileIdc: Int, levelIdc: Int,
      widthMbs: Int, heightMapUnits: Int,
      cropRight: Int = 0, cropBottom: Int = 0,
      scalingPresent: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.bits(profileIdc.toLong, 8)
    w.bits(0L, 8) // constraint flags
    w.bits(levelIdc.toLong, 8)
    w.ue(0) // seq_parameter_set_id
    if (profileIdc == 100) {
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0) // bit depths
      w.bit(0) // qpprime
      w.bit(if (scalingPresent) 1 else 0)
      // nothing after the plant needs to parse — the reader refuses
    }
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type 0
    w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.bit(0) // gaps_in_frame_num
    w.ue(widthMbs.toLong - 1)
    w.ue(heightMapUnits.toLong - 1)
    w.bit(1) // frame_mbs_only
    w.bit(1) // direct_8x8_inference
    if (cropRight > 0 || cropBottom > 0) {
      w.bit(1); w.ue(0); w.ue(cropRight.toLong); w.ue(0); w.ue(cropBottom.toLong)
    } else w.bit(0)
    w.bit(0) // vui_parameters_present
    w.rbspTrailing()
    Array[Byte](0x67) ++ addEmulation(w.toRbsp) // NAL header: SPS, nri=3
  }

  private[multimodal] def avcCBytes(sps: Array[Byte],
      truncate: Boolean = false, pps: Array[Byte] = null): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // configurationVersion
    out.write(sps(1) & 0xff) // AVCProfileIndication (SPS byte 1)
    out.write(0) // profile_compatibility
    out.write(sps(3) & 0xff) // AVCLevelIndication (SPS byte 3)
    out.write(0xfc | 3) // lengthSizeMinusOne = 3
    out.write(0xe0 | 1) // numOfSequenceParameterSets = 1
    out.write((sps.length >> 8) & 0xff); out.write(sps.length & 0xff)
    out.write(sps, 0, sps.length)
    if (pps == null) out.write(0) // numOfPictureParameterSets = 0
    else {
      out.write(1)
      out.write((pps.length >> 8) & 0xff); out.write(pps.length & 0xff)
      out.write(pps, 0, pps.length)
    }
    val b = out.toByteArray
    if (truncate) b.take(10) else b
  }

  /** Assemble ftyp + moov(trak(mdia(minf(stbl(stsd(entry)))))) with
    * one sample entry of `codec` carrying `cfg` as its `cfgTyp` child
    * box (avcC / hvcC / vpcC); cfg = null emits a bare entry. */
  private[multimodal] def mp4WithCodec(codec: String, cfgTyp: String,
      cfg: Array[Byte], breakFtyp: Boolean = false): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + body.length)
      val size = 8 + body.length
      out.write((size >>> 24) & 0xff); out.write((size >>> 16) & 0xff)
      out.write((size >>> 8) & 0xff); out.write(size & 0xff)
      typ.foreach(c => out.write(c.toInt))
      out.write(body, 0, body.length)
      out.toByteArray
    }
    val entryFixed = new Array[Byte](78) // VisualSampleEntry fixed fields
    entryFixed(7) = 1 // data_reference_index
    val entry = box(codec,
      entryFixed ++ (if (cfg == null) Array.emptyByteArray else box(cfgTyp, cfg)))
    val stsd = box("stsd",
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 1) ++ entry)
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsd)))))
    val ftyp = box(if (breakFtyp) "fxyp" else "ftyp",
      "isom".getBytes("ISO-8859-1") ++ new Array[Byte](4) ++
        "isom".getBytes("ISO-8859-1"))
    ftyp ++ moov
  }

  /** Deterministic MP4-codec corpus from the documents table. Arms
    * (id%6, after the id%17==3 not_mp4 plant): 0 = avc1 Baseline
    * (profile 66), mb-aligned dims; 1 = avc1 Baseline 1920×1080 (the
    * crop form: 68 mb rows − 4 crop-bottom units); 2 = avc1 High
    * (profile 100, explicit 4:2:0 chroma branch); 3 = hvc1
    * (classification only); 4 = vp09 (classification only); 5 =
    * refusal split by id%12: 5 → truncated avcC (bad_avcc), 11 → High
    * SPS with scaling matrices (unsupported_sps). Level
    * 30 + 10·(id%2). All fields closed-form from id arithmetic. */
  def mp4AvcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def fm(m: Long): Long = java.lang.Math.floorMod(id, m)
      val level = (30 + 10 * fm(2)).toInt
      val wMbs = (40 + 10 * fm(5)).toInt
      val hMus = (23 + 11 * fm(4)).toInt
      val payload: Array[Byte] =
        if (fm(17) == 3) mp4WithCodec("avc1", "avcC",
          avcCBytes(spsBytes(66, level, wMbs, hMus)), breakFtyp = true)
        else fm(6) match {
          case 0 => mp4WithCodec("avc1", "avcC",
            avcCBytes(spsBytes(66, level, wMbs, hMus)))
          case 1 => mp4WithCodec("avc1", "avcC",
            avcCBytes(spsBytes(66, level, 120, 68, cropBottom = 4)))
          case 2 => mp4WithCodec("avc1", "avcC",
            avcCBytes(spsBytes(100, level, wMbs, hMus)))
          case 3 => mp4WithCodec("hvc1", "hvcC", new Array[Byte](23))
          case 4 => mp4WithCodec("vp09", "vpcC", new Array[Byte](12))
          case _ =>
            if (fm(12) == 5) mp4WithCodec("avc1", "avcC",
              avcCBytes(spsBytes(66, level, wMbs, hMus), truncate = true))
            else mp4WithCodec("avc1", "avcC",
              avcCBytes(spsBytes(100, level, wMbs, hMus,
                scalingPresent = true)))
        }
      (id, payload)
    }.toDF("media_id", "payload")
  }
}
