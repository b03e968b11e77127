package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GIF87a/89a ingestion (the public GIF89a specification + RFC 2046's
  * image/gif): LZW frame decode, palette lookup, interlace, GCE
  * delay/transparency/disposal compositing — the third wrapper of the
  * crawl image-animation set beside MP4 (q140) and animated WebP
  * (q169), so clip-level dedup sees through ALL the containers a
  * re-encoded video hides behind.
  *
  * Implemented in full: the logical-screen walk (global + local color
  * tables at every size), variable-width LSB-first LZW with the
  * deferred-clear convention (dictionary pinned at 4096 until a clear
  * code), the KwKwK case, interlaced row ordering (8/8/4/2 passes),
  * GCE delay + transparent-index + disposal methods 0-3 (restore-to-
  * background paints transparent black; restore-to-previous snapshots
  * the prior canvas), and 87a's GCE-less frames (duration 0).
  * Canvas initializes to opaque black — fixtures and the gate always
  * paint the full canvas, and GifSpec pins the compositing rules on
  * partial frames by hand.
  *
  * Error families (the q140 tagged-refusal discipline): container
  * level "not_gif" / "truncated" / "too_large" / "bad_block" /
  * "no_frames"; per-frame "bad_lzw" / "bad_frame" / "no_palette" /
  * "bad_index" (an LZW-decoded pixel index past the palette that is
  * not the transparent index) keep their parsed duration and the walk
  * continues (the sub-block chain is length-delimited, so a broken
  * frame's data skips structurally).
  *
  * Reference behavior documented from the reference repo's opaque
  * media round-trips (s3_loader.py:33-62) — the reference never
  * decodes; the decode layer is engine-added surface. */
object Gif {

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  // ---- LZW (GIF variant: LSB-first, variable width, deferred clear) ---

  /** Decode exactly `expected` indices. None on any malformation:
    * out-of-range code, EOI/underrun before the output fills, or
    * output overrun. Trailing bits after the fill are tolerated (many
    * encoders pad the final sub-block). */
  private[multimodal] def lzwDecode(data: Array[Byte], minCode: Int,
      expected: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    java.util.Arrays.fill(prefix, -1)
    var c0 = 0
    while (c0 < clear) { suffix(c0) = c0; c0 += 1 }
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    val out = new Array[Int](expected)
    var n = 0
    val totalBits = data.length * 8
    var bitPos = 0
    def read(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0
      var k = 0
      while (k < codeSize) {
        v |= (((data((bitPos + k) >> 3) & 0xff) >> ((bitPos + k) & 7)) & 1) << k
        k += 1
      }
      bitPos += codeSize
      v
    }
    val stack = new Array[Int](4097)
    while (n < expected) {
      val code = read()
      if (code < 0) return None
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return None // EOI before the frame filled
      } else {
        // KwKwK: the one code the decoder hasn't built yet
        if (code > dictSize || code == eoi || code == clear ||
            (code == dictSize && prev < 0)) return None
        val base = if (code == dictSize) prev else code
        var sp = 0
        var c = base
        while (c >= clear) { // composite codes chain down to a root
          if (sp >= stack.length) return None
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        val firstChar = c // the root literal
        // emit: root, then the chain reversed, then KwKwK's extra char
        val entryLen = sp + 1 + (if (code == dictSize) 1 else 0)
        if (n + entryLen > expected) return None
        out(n) = firstChar; n += 1
        while (sp > 0) { sp -= 1; out(n) = stack(sp); n += 1 }
        if (code == dictSize) { out(n) = firstChar; n += 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstChar
          dictSize += 1
        }
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    Some(out)
  }

  /** Greedy LZW encode (the textbook dictionary build, clear-on-full),
    * serialized with the DECODER's width schedule so the two stay in
    * lockstep by construction. */
  private[multimodal] def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8, "GIF min code size 2..8")
    require(indices.nonEmpty, "empty frame")
    val clear = 1 << minCode
    val eoi = clear + 1
    val codes = scala.collection.mutable.ArrayBuffer[Int](clear)
    val dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    var cur = indices(0)
    require(cur < clear, s"index $cur exceeds the $minCode-bit alphabet")
    var i = 1
    while (i < indices.length) {
      val c = indices(i)
      require(c < clear, s"index $c exceeds the $minCode-bit alphabet")
      val key = (cur.toLong << 12) | c
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        codes += cur
        if (nextCode < 4096) { dict.put(key, nextCode); nextCode += 1 }
        else { codes += clear; dict.clear(); nextCode = eoi + 1 }
        cur = c
      }
      i += 1
    }
    codes += cur
    codes += eoi
    // serialize, replaying the decoder's dictSize/codeSize transitions
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L
    var cnt = 0
    var codeSize = minCode + 1
    var dictSize = eoi + 1
    var prevSeen = false
    codes.foreach { code =>
      buf |= code.toLong << cnt
      cnt += codeSize
      while (cnt >= 8) { out.write((buf & 0xff).toInt); buf >>>= 8; cnt -= 8 }
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prevSeen = false
      } else if (code != eoi) {
        if (prevSeen && dictSize < 4096) dictSize += 1
        prevSeen = true
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    if (cnt > 0) out.write((buf & 0xff).toInt)
    out.toByteArray
  }

  // ---- interlace (the 8/8/4/2 four-pass row order) --------------------

  /** Sequential-output-row -> canvas-row mapping for a height. */
  private[multimodal] def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { rows(k) = r; k += 1; r += step }
    }
    rows
  }

  // ---- decode ----------------------------------------------------------

  /** One frame's result: the parsed GCE duration (0 when absent — the
    * 87a shape), decode status, and the full-canvas snapshot AFTER
    * this frame composited (None on a frame-level error). */
  final case class GifFrame(durationMs: Int, ok: Boolean,
      canvas: Option[Array[Int]], err: String)

  final case class GifImage(version: String, w: Int, h: Int,
      frames: Seq[GifFrame])

  /** Walk a GIF: Left = container-level refusal, Right = per-frame
    * results over a shared canvas. */
  def decode(b: Array[Byte], maxPixels: Int = 1 << 24): Either[String, GifImage] = {
    if (b == null || b.length < 13) return Left("not_gif")
    val version = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (version != "GIF87a" && version != "GIF89a") return Left("not_gif")
    val w = u16(b, 6)
    val h = u16(b, 8)
    if (w == 0 || h == 0) return Left("bad_block")
    if (w.toLong * h > maxPixels) return Left("too_large")
    val packed = b(10) & 0xff
    var p = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val size = 1 << ((packed & 7) + 1)
      if (p + 3 * size > b.length) return Left("truncated")
      gct = readPalette(b, p, size)
      p += 3 * size
    }
    val canvas = Array.fill(w * h)(0xff000000)
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    var pendingDelay = 0
    var pendingTransparent = -1
    var pendingDisposal = 0
    var done = false
    while (!done) {
      if (p >= b.length) return Left("truncated")
      (b(p) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          if (p + 2 > b.length) return Left("truncated")
          val label = b(p + 1) & 0xff
          p += 2
          if (label == 0xf9) {
            // GCE: one 4-byte sub-block (the chain's terminator is
            // consumed by the generic skip below)
            if (p + 5 > b.length) return Left("truncated")
            if ((b(p) & 0xff) != 4) return Left("bad_block")
            val gpk = b(p + 1) & 0xff
            pendingDisposal = (gpk >> 2) & 7
            pendingDelay = u16(b, p + 2) * 10
            pendingTransparent = if ((gpk & 1) != 0) b(p + 4) & 0xff else -1
            p += 5
            p = skipSubBlocks(b, p)
            if (p < 0) return Left("truncated")
          } else {
            p = skipSubBlocks(b, p)
            if (p < 0) return Left("truncated")
          }
        case 0x2c =>
          if (p + 10 > b.length) return Left("truncated")
          val fx = u16(b, p + 1)
          val fy = u16(b, p + 3)
          val fw = u16(b, p + 5)
          val fh = u16(b, p + 7)
          val fpk = b(p + 9) & 0xff
          p += 10
          var lct: Array[Int] = null
          if ((fpk & 0x80) != 0) {
            val size = 1 << ((fpk & 7) + 1)
            if (p + 3 * size > b.length) return Left("truncated")
            lct = readPalette(b, p, size)
            p += 3 * size
          }
          val interlaced = (fpk & 0x40) != 0
          if (p + 1 > b.length) return Left("truncated")
          val minCode = b(p) & 0xff
          p += 1
          // collect the length-delimited data sub-blocks (structural
          // truncation is a container refusal; LZW garbage is not)
          val dataStart = p
          val dataEnd = {
            var q = p
            var stop = false
            while (!stop) {
              if (q >= b.length) return Left("truncated")
              val sz = b(q) & 0xff
              q += 1
              if (sz == 0) stop = true
              else { if (q + sz > b.length) return Left("truncated"); q += sz }
            }
            q
          }
          p = dataEnd
          val palette = if (lct != null) lct else gct
          val badGeom = fw == 0 || fh == 0 || fx + fw > w || fy + fh > h
          val frameErr =
            if (badGeom) "bad_frame"
            else if (palette == null) "no_palette"
            else ""
          if (frameErr.nonEmpty) {
            frames += GifFrame(pendingDelay, ok = false, None, frameErr)
          } else {
            val data = concatSubBlocks(b, dataStart, dataEnd)
            lzwDecode(data, minCode, fw * fh) match {
              case None =>
                frames += GifFrame(pendingDelay, ok = false, None, "bad_lzw")
              case Some(idx) =>
                var bad = false
                var k = 0
                while (k < idx.length && !bad) {
                  if (idx(k) >= palette.length &&
                      idx(k) != pendingTransparent) bad = true
                  k += 1
                }
                if (bad) {
                  frames += GifFrame(pendingDelay, ok = false, None, "bad_index")
                } else {
                  val before =
                    if (pendingDisposal == 3) canvas.clone() else null
                  val rowMap =
                    if (interlaced) interlaceRows(fh) else null
                  var r = 0
                  while (r < fh) {
                    val cy = fy + (if (rowMap != null) rowMap(r) else r)
                    var cx = 0
                    while (cx < fw) {
                      val v = idx(r * fw + cx)
                      if (v != pendingTransparent)
                        canvas((cy * w) + fx + cx) = palette(v)
                      cx += 1
                    }
                    r += 1
                  }
                  frames += GifFrame(pendingDelay, ok = true,
                    Some(canvas.clone()), "")
                  // dispose AFTER the snapshot (it prepares the NEXT frame)
                  pendingDisposal match {
                    case 2 => // restore to background: transparent black
                      var r2 = 0
                      while (r2 < fh) {
                        var cx = 0
                        while (cx < fw) {
                          canvas(((fy + r2) * w) + fx + cx) = 0
                          cx += 1
                        }
                        r2 += 1
                      }
                    case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
                    case _ => ()
                  }
                }
            }
          }
          // a GCE applies to exactly one following image
          pendingDelay = 0; pendingTransparent = -1; pendingDisposal = 0
        case _ => return Left("bad_block")
      }
    }
    if (frames.isEmpty) Left("no_frames")
    else Right(GifImage(version, w, h, frames.toSeq))
  }

  private def readPalette(b: Array[Byte], p: Int, size: Int): Array[Int] =
    Array.tabulate(size) { k =>
      0xff000000 | ((b(p + 3 * k) & 0xff) << 16) |
        ((b(p + 3 * k + 1) & 0xff) << 8) | (b(p + 3 * k + 2) & 0xff)
    }

  /** Skip a length-delimited sub-block chain; -1 on truncation. */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var p = start
    while (true) {
      if (p >= b.length) return -1
      val sz = b(p) & 0xff
      p += 1
      if (sz == 0) return p
      if (p + sz > b.length) return -1
      p += sz
    }
    -1
  }

  private def concatSubBlocks(b: Array[Byte], start: Int, end: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = start
    while (p < end) {
      val sz = b(p) & 0xff
      p += 1
      if (sz == 0) return out.toByteArray
      out.write(b, p, sz)
      p += sz
    }
    out.toByteArray
  }

  /** Cheap header parse for [[Multimodal.parseImageHeader]]'s sniff
    * chain: magic + logical screen descriptor only (no pixel work). */
  def parseScreen(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null || b.length < 13) return None
    val v = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (v != "GIF87a" && v != "GIF89a") return None
    val w = u16(b, 6)
    val h = u16(b, 8)
    if (w == 0 || h == 0) None else Some((v.toLowerCase, w, h))
  }

  /** Decode a GIF as a STILL image — the first frame's canvas as the
    * 3-byte-interleaved RGB plane the shared image-pHash path
    * consumes (the [[Vp8l.decodeRgb]] shape for the fifth real-pixel
    * codec). None on container refusal or a dead first frame. */
  def decodeStillRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decode(b).toOption.flatMap { img =>
      img.frames.headOption.flatMap(_.canvas).map { px =>
        val out = new Array[Byte](px.length * 3)
        var i = 0
        while (i < px.length) {
          out(3 * i) = ((px(i) >>> 16) & 0xff).toByte
          out(3 * i + 1) = ((px(i) >>> 8) & 0xff).toByte
          out(3 * i + 2) = (px(i) & 0xff).toByte
          i += 1
        }
        (img.w, img.h, out)
      }
    }

  /** Deterministic still-GIF corpus carrying the EXACT pixel functions
    * of [[Multimodal.mixedCodecImageCorpusFromDocuments]] (the q133
    * family: 32x32 macro-block grays for even id-decades, 64x64
    * block-constant for odd), single-frame GIF-encoded with the wire
    * shape fanned pixel-invisibly (87a at id%3==0, LCT at id%5==2,
    * interlace at id%2==1) — so the q176 gate replays q133's
    * closed-form pHash oracle VERBATIM over this corpus, proving the
    * whole LZW/palette/interlace layer invisible to content semantics
    * (the q168 discipline on the fifth image codec). */
  def gifPhashCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)
      val seed =
        if (fm(id, 9L) == 0L) 10L + fm(id, 7L)
        else fm(id, 10L)
      val jpegStyle = fm(id / 10L, 2L) == 1L
      val (w, h) = if (jpegStyle) (64, 64) else (32, 32)
      val px = Array.tabulate(w * h) { i =>
        val x = i % w
        val y = i / w
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
      }
      (id, gifBytes(w, h, Seq((px, 0)),
        version = if (fm(id, 3L) == 0L) "GIF87a" else "GIF89a",
        useLct = fm(id, 5L) == 2L,
        interlace = _ => fm(id, 2L) == 1L))
    }.toDF("media_id", "payload")
  }

  // ---- batched frame fingerprints (the q140/q169 shape) ----------------

  /** One decoded GIF frame's fingerprint row: duration is parsed from
    * the frame's GCE and KEPT on frame-decode-error rows; container-
    * level refusals are one ok=0 row with frame_idx 0. */
  final case class GifFramePHash(media_id: Long, frame_idx: Int, ok: Int,
      duration_ms: Int, phash: Long, err: String)

  /** Batched GIF-frame pHash — [[Webp.decodeAnimPHash]]'s shape for the
    * GIF container: every frame's LZW pixels REALLY decode and
    * fingerprint, so the q141 clip-dedup machinery runs unchanged on
    * this wrapper too. */
  def decodeGifPHash(media: DataFrame, partitions: Int = 0): Dataset[GifFramePHash] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, payload) =>
        decode(payload) match {
          case Left(err) => Seq(GifFramePHash(id, 0, 0, 0, 0L, err))
          case Right(img) => img.frames.zipWithIndex.map { case (fr, idx) =>
            fr.canvas match {
              case Some(px) if img.w >= 8 && img.h >= 8 =>
                val gray = new Array[Int](px.length)
                var i = 0
                while (i < gray.length) { gray(i) = (px(i) >>> 16) & 0xff; i += 1 }
                GifFramePHash(id, idx, 1, fr.durationMs,
                  Multimodal.pHash64(gray, img.w, img.h), "")
              case _ =>
                GifFramePHash(id, idx, 0, fr.durationMs, 0L,
                  if (fr.err.nonEmpty) fr.err else "frame_decode")
            }
          }
        }
      }(org.apache.spark.sql.Encoders.product[GifFramePHash])
  }

  // ---- fixture synthesis (REAL spec-shaped files) -----------------------

  private def grayPalette(n: Int): Array[Byte] = {
    val p = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
      i += 1
    }
    p
  }

  /** Assemble a GIF from gray frames (pixel value = palette index —
    * a 256-entry grayscale table). 89a writes a GCE per frame with the
    * given duration; 87a writes none (durations parse as 0). Frame f
    * interlaces when `interlace(f)`; `useLct` moves the color table
    * per-frame; `corruptLzwFrame` replaces that frame's LZW data with
    * an out-of-range first code (a structurally intact sub-block chain
    * whose DECODE must refuse). */
  private[multimodal] def gifBytes(w: Int, h: Int,
      frames: Seq[(Array[Int], Int)], version: String = "GIF89a",
      useLct: Boolean = false, interlace: Int => Boolean = _ => false,
      breakMagic: Boolean = false, corruptLzwFrame: Int = -1,
      dropTrailer: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write((if (breakMagic) "XIF89a" else version)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    o.write(w & 0xff); o.write((w >> 8) & 0xff)
    o.write(h & 0xff); o.write((h >> 8) & 0xff)
    // packed: GCT flag + 8-bit color resolution + size 256
    o.write(if (useLct) 0x70 else 0xf7)
    o.write(0) // background color index
    o.write(0) // aspect
    if (!useLct) o.write(grayPalette(256), 0, 768)
    frames.zipWithIndex.foreach { case ((px, durationMs), f) =>
      if (version == "GIF89a") {
        o.write(0x21); o.write(0xf9); o.write(4)
        o.write(0x04) // disposal 1 (keep), no transparency
        val delay = durationMs / 10
        o.write(delay & 0xff); o.write((delay >> 8) & 0xff)
        o.write(0) // transparent index (unused)
        o.write(0) // terminator
      }
      o.write(0x2c)
      for (v <- Seq(0, 0, w, h)) { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      o.write((if (useLct) 0x87 else 0x00) | (if (interlace(f)) 0x40 else 0x00))
      if (useLct) o.write(grayPalette(256), 0, 768)
      o.write(8) // LZW min code size
      val ordered =
        if (!interlace(f)) px
        else {
          val rows = interlaceRows(h)
          Array.tabulate(px.length)(i => px(rows(i / w) * w + i % w))
        }
      val lzw =
        if (f == corruptLzwFrame) Array.fill[Byte](4)(0xff.toByte)
        else lzwEncode(ordered, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        o.write(n)
        o.write(lzw, off, n)
        off += n
      }
      o.write(0) // sub-block terminator
    }
    if (!dropTrailer) o.write(0x3b)
    o.toByteArray
  }

  /** Deterministic GIF corpus — q140's video fixture family on the GIF
    * wrapper, sampled to the doc_id%3==1 third (q169 takes %3==0, the
    * shared sampling discipline): 3 + id%4 frames of 64x64
    * block-constant grays (the EXACT q140 pixel formula, so the
    * oracle's pHash replay is q140's), durations 40 + 10*f ms, the
    * wire shape fanned per id (LCT at id%5==2, per-frame interlace at
    * (id+f)%2==1 — both pixel-invisible). Error plants:
    *   id%11==5   broken signature -> container "not_gif"
    *   else id%13==6  GIF87a, no GCEs -> every duration 0
    *   else id%6==4   frame 1's LZW replaced -> ok=0 'bad_lzw',
    *                  duration kept, later frames decode */
  def gifCorpusFromDocuments(documents: DataFrame,
      sampleMod: Int = 3, sampleRem: Int = 1): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .where(pmod(col("doc_id"), lit(sampleMod)) === sampleRem)
      .as[Long].map { id =>
        def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)
        val nf = (3L + fm(id, 4L)).toInt
        val frames = (0 until nf).map { f =>
          val px = Array.tabulate(64 * 64) { i =>
            val bx = (i % 64) / 8
            val by = (i / 64) / 8
            (((fm(id, 10L) * 73L + f * 29L + bx * 37L + by * 91L) % 17L)
              * 15L).toInt
          }
          (px, 40 + 10 * f)
        }
        val badMagic = fm(id, 11L) == 5L
        val v87 = !badMagic && fm(id, 13L) == 6L
        val corrupt = if (!badMagic && !v87 && fm(id, 6L) == 4L) 1 else -1
        (id, gifBytes(64, 64, frames,
          version = if (v87) "GIF87a" else "GIF89a",
          useLct = fm(id, 5L) == 2L,
          interlace = f => fm(id + f, 2L) == 1L,
          breakMagic = badMagic,
          corruptLzwFrame = corrupt))
      }.toDF("media_id", "payload")
  }
}
