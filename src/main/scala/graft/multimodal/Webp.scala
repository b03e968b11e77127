package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WebP image classification (the public WebP container + VP8/VP8L
  * bitstream specs, RFC 6386 for the lossy frame header) — the most
  * common modern crawl image format, previously invisible to the image
  * audit ([[Multimodal.parseImageHeader]] sniffed PNG/JPEG only).
  *
  * Walks the RIFF layer and the first bytes of the image bitstream,
  * never a coefficient: "RIFF" + LE32 size + "WEBP", then chunks of
  * [fourCC, LE32 size, payload, pad-to-even]. The first chunk decides
  * the flavor:
  *  - "VP8 " (lossy): 3-byte frame tag (must be a keyframe), the
  *    9D 01 2A start code, then 14-bit LE width/height
  *  - "VP8L" (lossless): 0x2F signature, then a LE32 carrying
  *    width-1 (14 bits), height-1 (14), alpha-used (1), version (3,
  *    must be 0)
  *  - "VP8X" (extended): 10-byte payload — flag byte (0x10 alpha,
  *    0x02 animation), 24-bit LE canvas width-1 / height-1; an image
  *    chunk (VP8 /VP8L/ANIM/ANMF) must follow somewhere in the file
  *
  * Error families (the [[Mp3]]/[[Flac]] discipline — refusals
  * quantified per mode): "not_webp" (magic), "truncated" (RIFF size
  * or a chunk running past the payload — the whole chunk chain is
  * walked BEFORE flavor classification, so truncation anywhere wins),
  * "bad_bitstream" (start code / signature / version / VP8X length),
  * "no_image" (first chunk not an image flavor, or VP8X with no image
  * chunk after it). */
object Webp {

  final case class WebpInfo(
      media_id: Long, ok: Int, format: String, width: Int, height: Int,
      has_alpha: Int, animated: Int, n_chunks: Int, err: String)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def cc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "ISO-8859-1")

  def parseWebp(id: Long, b: Array[Byte]): WebpInfo = {
    def fail(err: String): WebpInfo =
      WebpInfo(id, 0, "", 0, 0, 0, 0, 0, err)
    if (b == null || b.length < 12 || cc(b, 0) != "RIFF" ||
        cc(b, 8) != "WEBP") return fail("not_webp")
    val riffEnd = 8L + le32(b, 4)
    if (riffEnd > b.length) return fail("truncated")
    val end = riffEnd.toInt
    // chunk walk first: truncation anywhere beats flavor classification
    var p = 12
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    while (p < end) {
      if (p + 8 > end) return fail("truncated")
      val four = cc(b, p)
      val size = le32(b, p + 4)
      if (p + 8 + size > end) return fail("truncated")
      chunks += ((four, p + 8, size.toInt))
      p += 8 + size.toInt + (size.toInt & 1)
    }
    if (chunks.isEmpty) return fail("no_image")
    val n = chunks.length
    val (four0, o0, s0) = chunks.head
    four0 match {
      case "VP8 " =>
        if (s0 < 10) return fail("bad_bitstream")
        val frameTag = le24(b, o0)
        val keyframe = (frameTag & 1) == 0
        if (!keyframe || (b(o0 + 3) & 0xff) != 0x9d ||
            (b(o0 + 4) & 0xff) != 0x01 || (b(o0 + 5) & 0xff) != 0x2a)
          return fail("bad_bitstream")
        val w = le16(b, o0 + 6) & 0x3fff
        val h = le16(b, o0 + 8) & 0x3fff
        WebpInfo(id, 1, "lossy", w, h, 0, 0, n, "")
      case "VP8L" =>
        if (s0 < 5 || (b(o0) & 0xff) != 0x2f) return fail("bad_bitstream")
        val bits = le32(b, o0 + 1)
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        val alpha = ((bits >> 28) & 1L).toInt
        if (((bits >> 29) & 7L) != 0L) return fail("bad_bitstream")
        WebpInfo(id, 1, "lossless", w, h, alpha, 0, n, "")
      case "VP8X" =>
        if (s0 != 10) return fail("bad_bitstream")
        val flags = b(o0) & 0xff
        val alpha = if ((flags & 0x10) != 0) 1 else 0
        val anim = if ((flags & 0x02) != 0) 1 else 0
        val w = le24(b, o0 + 4) + 1
        val h = le24(b, o0 + 7) + 1
        val hasImage = chunks.tail.exists { case (f, _, _) =>
          f == "VP8 " || f == "VP8L" || f == "ANIM" || f == "ANMF" }
        if (!hasImage) return fail("no_image")
        WebpInfo(id, 1, "extended", w, h, alpha, anim, n, "")
      case _ => fail("no_image")
    }
  }

  /** Batched classification — the decodeStage plan shape. */
  def decodeWebpInfo(media: DataFrame, partitions: Int = 0): Dataset[WebpInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) => parseWebp(id, p) })(
        org.apache.spark.sql.Encoders.product[WebpInfo])
  }

  /** Locate the VP8L chunk's (offset, length) in a RIFF/WEBP payload —
    * the first-chunk lossless layout or the image chunk after VP8X.
    * None when the container is damaged or carries no lossless data. */
  def vp8lChunk(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 12 || cc(b, 0) != "RIFF" ||
        cc(b, 8) != "WEBP") return None
    val riffEnd = 8L + le32(b, 4)
    if (riffEnd > b.length) return None
    val end = riffEnd.toInt
    var p = 12
    while (p + 8 <= end) {
      val four = cc(b, p)
      val size = le32(b, p + 4)
      if (p + 8 + size > end) return None
      if (four == "VP8L") return Some((p + 8, size.toInt))
      p += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Deterministic lossless-WebP corpus carrying the EXACT pixel
    * functions of [[Multimodal.mixedCodecImageCorpusFromDocuments]]
    * (the q133 family: 32x32 macro-block grays for even id-decades,
    * 64x64 block-constant grays for odd), VP8L-encoded with the
    * encoding path fanned over id%10 ([[Vp8l.VariantPlain]] through
    * [[Vp8l.VariantCacheMeta]] — literals, SUBTRACT_GREEN, predictor,
    * linear LZ77, color cache, meta prefix groups, cross-COLOR,
    * COLOR_INDEXING palette, 2D distance codes, and the cache x meta
    * INTERACTION arm (shared cache state across entropy groups); the
    * corpus grays stay under 256 distinct colors so the palette arm
    * is lossless too).
    * Lossless means the decoded pixels are
    * encoding-variant-independent — so the q168 gate replays q133's
    * closed-form pHash oracle VERBATIM over this corpus, proving the
    * whole VP8L layer (entropy coding, LZ77, cache, transforms)
    * invisible to content semantics, the q155 discipline. */
  def webpPhashCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val seed =
        if (java.lang.Math.floorMod(id, 9L) == 0L)
          10L + java.lang.Math.floorMod(id, 7L)
        else java.lang.Math.floorMod(id, 10L)
      val jpegStyle = java.lang.Math.floorMod(id / 10L, 2L) == 1L
      val (w, h) = if (jpegStyle) (64, 64) else (32, 32)
      val px = Array.tabulate(w * h) { i =>
        val x = i % w
        val y = i / w
        val g =
          if (!jpegStyle) {
            val base = ((seed * 73L + (x / 4) * 37L + (y / 4) * 91L) % 17L) * 15L
            val e = (id * 31L + x * 7L + y * 13L) % 3L - 1L
            math.max(0L, math.min(255L, base + e)).toInt
          } else {
            val bx = x / 8
            val by = y / 8
            val base = ((seed * 73L + bx * 37L + by * 91L) % 17L) * 15L
            val e = (id * 31L + bx * 7L + by * 13L) % 3L - 1L
            math.max(0L, math.min(255L, base + e)).toInt
          }
        0xff000000 | (g << 16) | (g << 8) | g
      }
      val variant = java.lang.Math.floorMod(id, 10L).toInt
      (id, webpBytes(Seq(("VP8L", Vp8l.encode(w, h, px, variant)))))
    }.toDF("media_id", "payload")
  }

  /** Locate the VP8 (lossy) chunk's (offset, length) — [[vp8lChunk]]'s
    * sibling for the keyframe pixel decoder. */
  def vp8Chunk(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 12 || cc(b, 0) != "RIFF" ||
        cc(b, 8) != "WEBP") return None
    val riffEnd = 8L + le32(b, 4)
    if (riffEnd > b.length) return None
    val end = riffEnd.toInt
    var p = 12
    while (p + 8 <= end) {
      val four = cc(b, p)
      val size = le32(b, p + 4)
      if (p + 8 + size > end) return None
      if (four == "VP8 ") return Some((p + 8, size.toInt))
      p += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Deterministic lossy-WebP corpus: 64x64 grays from
    * [[Vp8.q174Gray]] (one closed-form pixel function for EVERY
    * document), VP8-keyframe-encoded with the coding path fanned
    * over id%4 ([[Vp8.VariantBpred]] B_PRED/B_DC, [[Vp8.Variant16x16]]
    * 16x16 DC with the Y2 WHT, [[Vp8.VariantMixed]] cross-mode rows,
    * [[Vp8.VariantParts]] two token partitions + skip flags). The
    * encode is exact-by-construction (the encoder REQUIREs recon ==
    * target as it builds), so the q174 gate replays the pixel
    * formula's pHash closed-form — the whole lossy coefficient/
    * prediction/WHT layer proven invisible to content semantics, the
    * q168 discipline on the fourth image codec. */
  def vp8PhashCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val px = Array.tabulate(64 * 64)(i => Vp8.q174Gray(id, i % 64, i / 64))
      val variant = java.lang.Math.floorMod(id, 4L).toInt
      (id, webpBytes(Seq(("VP8 ", Vp8.encode(64, 64, px, variant)))))
    }.toDF("media_id", "payload")
  }

  // ---- alpha plane (ALPH) ---------------------------------------------

  /** Per-image alpha stats: the transparency signal a curation gate
    * keys on (a fully-opaque "alpha" image is wasted bytes; a mostly-
    * transparent one is usually an icon/overlay, not a photo). */
  final case class AlphaStats(media_id: Long, ok: Int, w: Int, h: Int,
      alpha_sum: Long, n_opaque: Long, err: String)

  /** Decode a VP8X file's ALPH chunk to the w x h alpha plane: header
    * byte (2 bits each, MSB-first: reserved, pre-processing, filter,
    * compression), method 0 = raw bytes, method 1 = the HEADERLESS
    * VP8L green-channel bitstream ([[Vp8l.decodeAlphaGreen]]), then
    * the per-pixel prediction filter undone (none / horizontal /
    * vertical / gradient, with the shared border rules: (0,0) from 0,
    * row 0 from the left, column 0 from above). Left = refusal tag. */
  def decodeAlpha(b: Array[Byte]): Either[String, (Int, Int, Array[Byte])] = {
    val vp8x = {
      if (b == null || b.length < 12 || cc(b, 0) != "RIFF" ||
          cc(b, 8) != "WEBP") return Left("not_webp")
      val riffEnd = 8L + le32(b, 4)
      if (riffEnd > b.length) return Left("truncated")
      var p = 12
      var alph = Option.empty[(Int, Int)]
      var dims = Option.empty[(Int, Int)]
      while (p + 8 <= riffEnd.toInt) {
        val four = cc(b, p)
        val size = le32(b, p + 4)
        if (p + 8 + size > riffEnd) return Left("truncated")
        if (four == "VP8X" && size >= 10)
          dims = Some((le24(b, p + 12) + 1, le24(b, p + 15) + 1))
        if (four == "ALPH") alph = Some((p + 8, size.toInt))
        p += 8 + size.toInt + (size.toInt & 1)
      }
      (dims, alph)
    }
    val (w, h) = vp8x._1.getOrElse(return Left("no_vp8x"))
    val (off, len) = vp8x._2.getOrElse(return Left("no_alpha"))
    if (len < 1) return Left("truncated")
    val hdr = b(off) & 0xff
    if ((hdr >> 6) != 0) return Left("bad_alpha")
    val filter = (hdr >> 2) & 3
    val method = hdr & 3
    if (method > 1) return Left("bad_alpha")
    if (w.toLong * h > (1L << 24)) return Left("bad_alpha")
    val plane: Array[Byte] =
      if (method == 0) {
        if (len - 1 < w * h) return Left("truncated")
        java.util.Arrays.copyOfRange(b, off + 1, off + 1 + w * h)
      } else Vp8l.decodeAlphaGreen(b, off + 1, len - 1, w, h)
        .getOrElse(return Left("bad_alpha"))
    // undo the prediction filter in place (scan order: predictors are
    // already-reconstructed neighbors)
    if (filter != 0) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val l = if (x > 0) plane(i - 1) & 0xff else 0
          val t = if (y > 0) plane(i - w) & 0xff else 0
          val tl = if (x > 0 && y > 0) plane(i - w - 1) & 0xff else 0
          val pred =
            if (x == 0 && y == 0) 0
            else if (y == 0) l
            else if (x == 0) t
            else filter match {
              case 1 => l
              case 2 => t
              case _ => math.max(0, math.min(255, l + t - tl)) // gradient
            }
          plane(i) = (((plane(i) & 0xff) + pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
    }
    Right((w, h, plane))
  }

  /** Batched alpha stats — the decodeStage plan shape. */
  def decodeAlphaStats(media: DataFrame, partitions: Int = 0): Dataset[AlphaStats] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) =>
        decodeAlpha(p) match {
          case Left(err) => AlphaStats(id, 0, 0, 0, 0L, 0L, err)
          case Right((w, h, plane)) =>
            var s = 0L
            var opq = 0L
            var i = 0
            while (i < plane.length) {
              val v = plane(i) & 0xff
              s += v
              if (v == 255) opq += 1
              i += 1
            }
            AlphaStats(id, 1, w, h, s, opq, "")
        }
      })(org.apache.spark.sql.Encoders.product[AlphaStats])
  }

  /** Assemble an ALPH payload from a raw alpha plane: apply the
    * forward filter, then store raw or as the headerless VP8L
    * green-channel stream (graft's encoder output minus the 5 header
    * bytes — 1 signature + 32 bits of dims/alpha/version). */
  private[multimodal] def alphPayload(w: Int, h: Int, alpha: Array[Byte],
      filter: Int, vp8l: Boolean): Array[Byte] = {
    require(alpha.length == w * h, "alpha plane size")
    val filtered = new Array[Byte](alpha.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val l = if (x > 0) alpha(i - 1) & 0xff else 0
        val t = if (y > 0) alpha(i - w) & 0xff else 0
        val tl = if (x > 0 && y > 0) alpha(i - w - 1) & 0xff else 0
        val pred =
          if (filter == 0) 0
          else if (x == 0 && y == 0) 0
          else if (y == 0) l
          else if (x == 0) t
          else filter match {
            case 1 => l
            case 2 => t
            case _ => math.max(0, math.min(255, l + t - tl))
          }
        filtered(i) = (((alpha(i) & 0xff) - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val o = new java.io.ByteArrayOutputStream()
    o.write((filter << 2) | (if (vp8l) 1 else 0))
    if (!vp8l) o.write(filtered, 0, filtered.length)
    else {
      val argb = Array.tabulate(w * h)(i =>
        0xff000000 | ((filtered(i) & 0xff) << 8))
      val full = Vp8l.encode(w, h, argb, Vp8l.VariantPlain)
      o.write(full, 5, full.length - 5) // strip signature + 32 header bits
    }
    o.toByteArray
  }

  /** Deterministic lossy-with-alpha corpus: VP8X(alpha) + ALPH + VP8,
    * luma from [[Vp8.q174Gray]], alpha from the closed form
    * a(id,x,y) = ((id%7)*31 + 3x + 5y) % 256, the wire shape fanned
    * alpha-invisibly (raw vs headerless-VP8L storage by id%2, filter
    * method id%4). Error plants:
    *   id%11==3  ALPH chunk dropped            -> "no_alpha"
    *   else id%13==5  a reserved header bit set -> "bad_alpha" */
  def webpAlphaCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val w = 64
      val h = 64
      val alpha = Array.tabulate[Byte](w * h) { i =>
        ((m(7) * 31 + (i % w) * 3 + (i / w) * 5) % 256).toByte
      }
      val luma = Array.tabulate(w * h)(i => Vp8.q174Gray(id, i % w, i / w))
      val noAlpha = m(11) == 3
      val badAlpha = !noAlpha && m(13) == 5
      val alph = alphPayload(w, h, alpha, filter = m(4), vp8l = m(2) == 1)
      if (badAlpha) alph(0) = (alph(0) | 0x80).toByte // reserved bit
      val chunks =
        Seq(("VP8X", vp8xPayload(alpha = true, anim = false, w, h))) ++
          (if (noAlpha) Seq.empty else Seq(("ALPH", alph))) ++
          Seq(("VP8 ", Vp8.encode(w, h, luma, m(4))))
      (id, webpBytes(chunks))
    }.toDF("media_id", "payload")
  }

  // ---- animated WebP (ANIM/ANMF) -------------------------------------

  /** One decoded animation frame's fingerprint row ([[Multimodal]]'s
    * q140 shape for the GIF-successor format): duration is parsed from
    * the ANMF header and KEPT on frame-decode-error rows (the
    * parsed-prefix discipline); container-level refusals are one
    * ok=0 row with frame_idx 0. */
  final case class AnimFramePHash(media_id: Long, frame_idx: Int, ok: Int,
      duration_ms: Int, phash: Long, err: String)

  /** Walk an animated WebP: VP8X (animation flag required) + ANMF
    * frames, each frame's inner chunk list searched for its VP8L
    * payload. Left = container-level refusal ("not_webp" /
    * "truncated" / "not_animated" / "no_frames"); Right = per-frame
    * (duration_ms, Option[(vp8l offset, length)]) — None when a frame
    * carries no lossless payload (lossy VP8 frames are out of the
    * pixel-decode scope, like stills). */
  def animFrames(b: Array[Byte]): Either[String, Seq[(Int, Option[(Int, Int)])]] = {
    if (b == null || b.length < 12 || cc(b, 0) != "RIFF" ||
        cc(b, 8) != "WEBP") return Left("not_webp")
    val riffEnd = 8L + le32(b, 4)
    if (riffEnd > b.length) return Left("truncated")
    val end = riffEnd.toInt
    var p = 12
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    while (p < end) {
      if (p + 8 > end) return Left("truncated")
      val four = cc(b, p)
      val size = le32(b, p + 4)
      if (p + 8 + size > end) return Left("truncated")
      chunks += ((four, p + 8, size.toInt))
      p += 8 + size.toInt + (size.toInt & 1)
    }
    val animated = chunks.headOption.exists { case (f, o, s) =>
      f == "VP8X" && s == 10 && (b(o) & 0x02) != 0 }
    if (!animated) return Left("not_animated")
    val frames = chunks.collect { case ("ANMF", o, s) if s >= 16 =>
      val duration = le24(b, o + 12)
      // inner chunk walk: the frame's image data follows the 16-byte
      // ANMF header as regular chunks (VP8/VP8L + optional ALPH)
      var q = o + 16
      var vp8l = Option.empty[(Int, Int)]
      while (q + 8 <= o + s && vp8l.isEmpty) {
        val ifour = cc(b, q)
        val isize = le32(b, q + 4)
        if (q + 8 + isize > o + s) return Left("truncated")
        if (ifour == "VP8L") vp8l = Some((q + 8, isize.toInt))
        q += 8 + isize.toInt + (isize.toInt & 1)
      }
      (duration, vp8l)
    }.toSeq
    if (frames.isEmpty) Left("no_frames") else Right(frames)
  }

  /** Batched animation-frame pHash — [[Multimodal.decodeMp4FramePHash]]'s
    * shape for animated WebP: every frame's VP8L pixels REALLY decode
    * ([[Vp8l]]) and fingerprint, so the q141 clip-dedup machinery runs
    * unchanged on this container. */
  def decodeAnimPHash(media: DataFrame, partitions: Int = 0): Dataset[AnimFramePHash] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, payload) =>
        animFrames(payload) match {
          case Left(err) => Seq(AnimFramePHash(id, 0, 0, 0, 0L, err))
          case Right(frames) => frames.zipWithIndex.map {
            case ((dur, vp8l), idx) =>
              vp8l.flatMap { case (o, l) => Vp8l.decodeRgb(payload, o, l) } match {
                case Some((w, h, rgb)) if w >= 8 && h >= 8 =>
                  val gray = new Array[Int](w * h)
                  var i = 0
                  while (i < gray.length) { gray(i) = rgb(3 * i) & 0xff; i += 1 }
                  AnimFramePHash(id, idx, 1, dur,
                    Multimodal.pHash64(gray, w, h), "")
                case _ => AnimFramePHash(id, idx, 0, dur, 0L, "frame_decode")
              }
          }
        }
      }(org.apache.spark.sql.Encoders.product[AnimFramePHash])
  }

  /** Assemble an animated WebP from (vp8l payload, duration) frames. */
  private[multimodal] def animWebpBytes(w: Int, h: Int,
      frames: Seq[(Array[Byte], Int)], animFlag: Boolean = true): Array[Byte] = {
    def anmf(vp8l: Array[Byte], duration: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      // x/2, y/2 (origin), w-1, h-1, duration — all 24-bit LE
      for (v <- Seq(0, 0, w - 1, h - 1, duration)) {
        o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff)
      }
      o.write(0x00) // flags: no blend, keep
      o.write('V'); o.write('P'); o.write('8'); o.write('L')
      val s = vp8l.length
      o.write(s & 0xff); o.write((s >> 8) & 0xff)
      o.write((s >> 16) & 0xff); o.write((s >> 24) & 0xff)
      o.write(vp8l, 0, vp8l.length)
      if (s % 2 == 1) o.write(0)
      o.toByteArray
    }
    val anim = {
      val a = new Array[Byte](6) // background ARGB + 16-bit loop count
      a(4) = 0; a(5) = 0
      a
    }
    webpBytes(
      Seq(("VP8X", vp8xPayload(alpha = false, anim = animFlag, w, h)),
        ("ANIM", anim)) ++
        frames.map { case (v, d) => ("ANMF", anmf(v, d)) })
  }

  /** Deterministic animated-WebP corpus — q140's video fixture family
    * on the GIF-successor container: 3 + id%4 frames of 64x64
    * block-constant grays (the EXACT q140 pixel formula, so the
    * oracle's pHash replay is q140's), durations 40 + 10*f ms, the
    * VP8L encoding path fanned over (id + f) % 5. Error plants:
    *   id%11==5  VP8X animation flag off -> container "not_animated"
    *   else id%6==4  frame 1's VP8L signature broken -> that frame
    *                 surfaces ok=0 'frame_decode', duration kept */
  def animWebpCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)
      val nf = (3L + fm(id, 4L)).toInt
      val frames = (0 until nf).map { f =>
        val px = Array.tabulate(64 * 64) { i =>
          val bx = (i % 64) / 8
          val by = (i / 64) / 8
          val g = (((fm(id, 10L) * 73L + f * 29L +
            bx * 37L + by * 91L) % 17L) * 15L).toInt
          0xff000000 | (g << 16) | (g << 8) | g
        }
        val v = Vp8l.encode(64, 64, px, fm(id + f, 5L).toInt)
        if (fm(id, 11L) != 5L && fm(id, 6L) == 4L && f == 1)
          v(0) = 0x00 // break the VP8L signature — the walk continues
        (v, 40 + 10 * f)
      }
      (id, animWebpBytes(64, 64, frames, animFlag = fm(id, 11L) != 5L))
    }.toDF("media_id", "payload")
  }

  // ---- fixture synthesis (REAL header bytes, oracle-restatable) -----

  private[multimodal] def vp8Payload(w: Int, h: Int, badStart: Boolean,
      filler: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    // keyframe tag: type=0, version=0, show=1, first_part_size=filler+7
    val tag = (1 << 4) | ((filler + 7) << 5)
    o.write(tag & 0xff); o.write((tag >> 8) & 0xff); o.write((tag >> 16) & 0xff)
    o.write(0x9d); o.write(if (badStart) 0x00 else 0x01); o.write(0x2a)
    o.write(w & 0xff); o.write((w >> 8) & 0x3f)
    o.write(h & 0xff); o.write((h >> 8) & 0x3f)
    var i = 0
    while (i < filler) { o.write((i * 41 + 3) & 0xff); i += 1 }
    o.toByteArray
  }

  private[multimodal] def vp8lPayload(w: Int, h: Int, alpha: Boolean,
      badVersion: Boolean, filler: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(0x2f)
    var bits = (w - 1).toLong & 0x3fff
    bits |= ((h - 1).toLong & 0x3fff) << 14
    if (alpha) bits |= 1L << 28
    if (badVersion) bits |= 3L << 29
    o.write((bits & 0xff).toInt); o.write(((bits >> 8) & 0xff).toInt)
    o.write(((bits >> 16) & 0xff).toInt); o.write(((bits >> 24) & 0xff).toInt)
    var i = 0
    while (i < filler) { o.write((i * 17 + 9) & 0xff); i += 1 }
    o.toByteArray
  }

  private[multimodal] def vp8xPayload(alpha: Boolean, anim: Boolean,
      w: Int, h: Int): Array[Byte] = {
    val o = new Array[Byte](10)
    o(0) = (((if (alpha) 0x10 else 0) | (if (anim) 0x02 else 0))).toByte
    val cw = w - 1; val ch = h - 1
    o(4) = (cw & 0xff).toByte; o(5) = ((cw >> 8) & 0xff).toByte
    o(6) = ((cw >> 16) & 0xff).toByte
    o(7) = (ch & 0xff).toByte; o(8) = ((ch >> 8) & 0xff).toByte
    o(9) = ((ch >> 16) & 0xff).toByte
    o
  }

  /** Assemble a RIFF/WEBP file from chunks; `riffOversize` inflates the
    * declared RIFF size past the real bytes (riff-level truncation),
    * `chunkOversize` inflates the LAST chunk's declared size (chunk-
    * level truncation) — in both arms the payload actually ENDS where
    * the parser must refuse. */
  private[multimodal] def webpBytes(chunks: Seq[(String, Array[Byte])],
      breakMagic: Boolean = false, riffOversize: Int = 0,
      chunkOversize: Int = 0): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    for (((four, payload), k) <- chunks.zipWithIndex) {
      four.foreach(c => body.write(c.toInt))
      val declared = payload.length +
        (if (k == chunks.length - 1) chunkOversize else 0)
      body.write(declared & 0xff); body.write((declared >> 8) & 0xff)
      body.write((declared >> 16) & 0xff); body.write((declared >> 24) & 0xff)
      body.write(payload, 0, payload.length)
      if (payload.length % 2 == 1 && k < chunks.length - 1) body.write(0)
    }
    val bodyBytes = body.toByteArray
    o.write('R'); o.write('I'); o.write('F'); o.write(if (breakMagic) 'X' else 'F')
    // chunkOversize deliberately NOT added here: the RIFF size must
    // match the real bytes so the refusal happens at the CHUNK walk
    val riffSize = 4 + bodyBytes.length + riffOversize
    o.write(riffSize & 0xff); o.write((riffSize >> 8) & 0xff)
    o.write((riffSize >> 16) & 0xff); o.write((riffSize >> 24) & 0xff)
    o.write('W'); o.write('E'); o.write('B'); o.write('P')
    o.write(bodyBytes, 0, bodyBytes.length)
    o.toByteArray
  }

  /** Deterministic WebP corpus from the documents table — flavors and
    * error families fanned over id arithmetic (oracle restates it):
    *   width 16 + id%200, height 16 + id%150
    *   not_webp       id%7==2 (broken RIFF magic)
    *   truncated      else id%7==4 (id%2==0: RIFF size overruns the
    *                  payload; id%2==1: last chunk's size does)
    *   bad_bitstream  else id%11==5 (id%2==0: VP8 start code broken;
    *                  id%2==1: VP8L version=3)
    *   no_image       else id%13==3 (VP8X with nothing after it)
    *   else flavor id%3: 0 lossy (VP8 , 1 chunk) / 1 lossless (VP8L,
    *   alpha id%2, odd/even sizes via filler id%9, 1 chunk) / 2
    *   extended (VP8X alpha id%2 anim id%5==0 + inner VP8 , 2 chunks) */
  def webpCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def m(k: Long): Int = java.lang.Math.floorMod(id, k).toInt
      val w = 16 + m(200); val h = 16 + m(150)
      val notWebp = m(7) == 2
      val trunc = !notWebp && m(7) == 4
      val badBs = !notWebp && !trunc && m(11) == 5
      val noImg = !notWebp && !trunc && !badBs && m(13) == 3
      val filler = m(9)
      val payload: Array[Byte] =
        if (notWebp)
          webpBytes(Seq(("VP8 ", vp8Payload(w, h, badStart = false, filler))),
            breakMagic = true)
        else if (trunc && m(2) == 0)
          webpBytes(Seq(("VP8 ", vp8Payload(w, h, badStart = false, filler))),
            riffOversize = 40)
        else if (trunc)
          webpBytes(Seq(("VP8 ", vp8Payload(w, h, badStart = false, filler))),
            chunkOversize = 60)
        else if (badBs && m(2) == 0)
          webpBytes(Seq(("VP8 ", vp8Payload(w, h, badStart = true, filler))))
        else if (badBs)
          webpBytes(Seq(("VP8L", vp8lPayload(w, h, alpha = m(2) == 1,
            badVersion = true, filler))))
        else if (noImg)
          webpBytes(Seq(("VP8X", vp8xPayload(alpha = m(2) == 1,
            anim = false, w, h))))
        else m(3) match {
          case 0 => webpBytes(Seq(("VP8 ", vp8Payload(w, h, badStart = false, filler))))
          case 1 => webpBytes(Seq(("VP8L", vp8lPayload(w, h, alpha = m(2) == 1,
            badVersion = false, filler))))
          case _ => webpBytes(Seq(
            ("VP8X", vp8xPayload(alpha = m(2) == 1, anim = m(5) == 0, w, h)),
            ("VP8 ", vp8Payload(w, h, badStart = false, filler))))
        }
      (id, payload)
    }.toDF("media_id", "payload")
  }
}
