package graft.multimodal

/** VP8L lossless pixel decode (the public WebP lossless bitstream
  * spec, RFC 9649 §3) — extends the REAL-pixel family (PNG inflate,
  * JPEG IDCT) to the WebP container, so [[Multimodal.decodeImagePHash]]
  * covers all three crawl image codecs. [[Webp]] owns the RIFF layer;
  * this file owns the bitstream after the 0x2F signature.
  *
  * Implemented in full: the LSB-first bit reader; simple AND
  * code-length-coded canonical prefix codes (DEFLATE-convention —
  * code bits read most-significant-first — including the 16/17/18
  * repeat symbols, the max_symbol read budget, and the 0-bit
  * single-symbol convention); meta prefix codes (the entropy image:
  * per-block prefix-code groups selected by the (red<<8|green) index
  * of a sub-sampled sub-image); LZ77 literals, backward references
  * (length/distance prefix + extra bits) with BOTH the linear
  * (dist_value > 120) and 2D neighborhood (the 120-entry offset
  * table) distance codes, and the color cache (hash 0x1e35a7bd,
  * insert-on-every-pixel); and all FOUR transforms — PREDICTOR (all
  * 14 modes + border rules), COLOR (the cross-color int8 multiplier
  * inverse), SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette
  * incl. the <=16-color pixel-bundling widths), each with its
  * entropy-coded sub-image and the xsize reduction COLOR_INDEXING
  * imposes on everything read after it.
  *
  * No external WebP implementation exists in this environment to
  * golden-test against (unlike zstd); the bit conventions are
  * therefore pinned by hand-constructed vectors in Vp8lSpec (canonical
  * code packing, the distance-table invariants) on top of the q168
  * gate, which replays the q133 closed-form pHash oracle over
  * nine encoder variants fanning every decode path — the compression
  * layer proven invisible to content semantics.
  *
  * Reference behavior documented from the reference repo's opaque
  * media round-trips (s3_loader.py:33-62) — the reference never
  * decodes; the decode layer is engine-added surface. */
object Vp8l {

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ---- bit IO (LSB-first, the VP8L convention) -----------------------

  private[multimodal] final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var buf = 0L
    private var cnt = 0
    def readBits(n: Int): Int = {
      while (cnt < n) {
        if (pos >= end) corrupt()
        buf |= (b(pos) & 0xffL) << cnt
        pos += 1; cnt += 8
      }
      val v = (buf & ((1L << n) - 1)).toInt
      buf >>>= n; cnt -= n
      v
    }
    def readBit(): Int = readBits(1)
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0L
    private var cnt = 0
    def writeBits(v: Int, n: Int): Unit = {
      buf |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) { out.write((buf & 0xff).toInt); buf >>>= 8; cnt -= 8 }
    }
    def toBytes: Array[Byte] = {
      if (cnt > 0) { out.write((buf & 0xff).toInt); buf = 0; cnt = 0 }
      out.toByteArray
    }
  }

  // ---- canonical prefix codes -----------------------------------------

  /** Canonical code built from lengths (RFC 1951 rule: codes assigned
    * in (length, symbol) order). Code bits travel most-significant-
    * first through the LSB-first stream — the DEFLATE packing. A code
    * with exactly one symbol consumes zero bits. */
  private[multimodal] final class PCode(lengths: Array[Int]) {
    private val used = lengths.indices.filter(lengths(_) > 0)
    if (used.isEmpty) corrupt()
    val single: Int = if (used.size == 1) used.head else -1
    private val maxLen = if (single >= 0) 0 else used.map(lengths(_)).max
    private val counts = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val offsets = new Array[Int](maxLen + 1)
    private val sorted: Array[Int] =
      if (single >= 0) Array.emptyIntArray
      else {
        if (maxLen > 15) corrupt()
        used.foreach(s => counts(lengths(s)) += 1)
        // Kraft completeness — an over- or under-subscribed code is
        // corrupt, not "best effort"
        var kraft = 0L
        for (l <- 1 to maxLen) kraft += counts(l).toLong << (15 - l)
        if (kraft != (1L << 15)) corrupt()
        var code = 0
        var off = 0
        for (l <- 1 to maxLen) {
          firstCode(l) = code
          offsets(l) = off
          code = (code + counts(l)) << 1
          off += counts(l)
        }
        used.sortBy(s => (lengths(s), s)).toArray
      }
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (true) {
        code = (code << 1) | br.readBit()
        len += 1
        if (len > maxLen) corrupt()
        if (counts(len) > 0) {
          val d = code - firstCode(len)
          if (d >= 0 && d < counts(len)) return sorted(offsets(len) + d)
        }
      }
      0 // unreachable
    }
    // (code << 8 | len) per symbol, built once — a per-symbol linear
    // scan here multiplied into the fixture encoder's hot loop
    // (4096 px x 4 channels x O(used) was q169's 16 s warm floor)
    private lazy val codeTable: Array[Long] = {
      val t = Array.fill(lengths.length)(-1L)
      if (single < 0) {
        var l = 1
        while (l <= maxLen) {
          var k = offsets(l)
          var c = firstCode(l)
          val end = offsets(l) + counts(l)
          while (k < end) { t(sorted(k)) = (c.toLong << 8) | l; k += 1; c += 1 }
          l += 1
        }
      }
      t
    }
    /** (code, len) per symbol — the encoder's view of the same rule. */
    def codeOf(sym: Int): (Int, Int) = {
      if (single >= 0) return (0, 0)
      val v = codeTable(sym)
      require(v >= 0, s"symbol $sym has no code")
      ((v >> 8).toInt, (v & 0xff).toInt)
    }
  }

  private def writeCanonical(bw: BitWriter, code: PCode, sym: Int): Unit = {
    val (c, l) = code.codeOf(sym)
    var i = l - 1
    while (i >= 0) { bw.writeBits((c >> i) & 1, 1); i -= 1 }
  }

  // order in which code-length-code lengths are transmitted
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: simple form (1-2 symbols, each < 256) or the
    * code-length-coded complex form. */
  private def readPrefixCode(br: BitReader, alphabet: Int): PCode = {
    val lens = new Array[Int](alphabet)
    if (br.readBit() == 1) { // simple
      val numSym = br.readBit() + 1
      val s0 = if (br.readBit() == 1) br.readBits(8) else br.readBits(1)
      if (s0 >= alphabet) corrupt()
      lens(s0) = 1
      if (numSym == 2) {
        val s1 = br.readBits(8)
        if (s1 >= alphabet || s1 == s0) corrupt()
        lens(s1) = 1
      }
    } else {
      val numCl = 4 + br.readBits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
      val clc = new PCode(clLens)
      // read budget: with use_length set, at most max_symbol code
      // reads; everything not covered stays length 0
      var reads =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabet
      var sym = 0
      var prev = 8
      while (sym < alphabet && reads > 0) {
        reads -= 1
        val cl = clc.decode(br)
        if (cl < 16) {
          lens(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, v) = cl match {
            case 16 => (3 + br.readBits(2), prev)
            case 17 => (3 + br.readBits(3), 0)
            case _ => (11 + br.readBits(7), 0)
          }
          if (sym + rep > alphabet) corrupt()
          java.util.Arrays.fill(lens, sym, sym + rep, v)
          sym += rep
        }
      }
    }
    new PCode(lens)
  }

  // green alphabet: 256 literals + 24 length prefixes + cache codes
  private def greenAlphabet(cacheBits: Int): Int =
    280 + (if (cacheBits > 0) 1 << cacheBits else 0)

  private def subSample(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** The 2D distance-code neighborhood (RFC 9649 §4.2.2): dist codes
    * 1..120 name (dx, dy) offsets ordered by increasing Euclidean
    * distance; dist = dy*xsize + dx, clamped up to 1. Flattened
    * (dx, dy) pairs; Vp8lSpec pins the table invariants (120 distinct
    * entries, monotone squared distance, the y==0 => dx>=1 rule) and
    * the code-1=above / code-2=left hand vectors. */
  private[multimodal] val Dist2dOffsets: Array[Int] = Array(
    0, 1, 1, 0, 1, 1, -1, 1, 0, 2, 2, 0, 1, 2, -1, 2,
    2, 1, -2, 1, 2, 2, -2, 2, 0, 3, 3, 0, 1, 3, -1, 3,
    3, 1, -3, 1, 2, 3, -2, 3, 3, 2, -3, 2, 0, 4, 4, 0,
    1, 4, -1, 4, 4, 1, -4, 1, 3, 3, -3, 3, 2, 4, -2, 4,
    4, 2, -4, 2, 0, 5, 3, 4, -3, 4, 4, 3, -4, 3, 5, 0,
    1, 5, -1, 5, 5, 1, -5, 1, 2, 5, -2, 5, 5, 2, -5, 2,
    4, 4, -4, 4, 3, 5, -3, 5, 5, 3, -5, 3, 0, 6, 6, 0,
    1, 6, -1, 6, 6, 1, -6, 1, 2, 6, -2, 6, 6, 2, -6, 2,
    4, 5, -4, 5, 5, 4, -5, 4, 3, 6, -3, 6, 6, 3, -6, 3,
    0, 7, 7, 0, 1, 7, -1, 7, 5, 5, -5, 5, 7, 1, -7, 1,
    4, 6, -4, 6, 6, 4, -6, 4, 2, 7, -2, 7, 7, 2, -7, 2,
    3, 7, -3, 7, 7, 3, -7, 3, 5, 6, -5, 6, 6, 5, -6, 5,
    8, 0, 4, 7, -4, 7, 7, 4, -7, 4, 8, 1, 8, 2, 6, 6,
    -6, 6, 8, 3, 5, 7, -5, 7, 7, 5, -7, 5, 8, 4, 6, 7,
    -6, 7, 7, 6, -7, 6, 8, 5, 7, 7, -7, 7, 8, 6, 8, 7)

  /** dist_value -> pixel distance at width w (2D table below 121,
    * linear above). */
  private def planeCodeToDistance(dv: Int, w: Int): Int =
    if (dv > 120) dv - 120
    else {
      val dd = Dist2dOffsets(2 * (dv - 1)) + Dist2dOffsets(2 * dv - 1) * w
      if (dd < 1) 1 else dd
    }

  private def lz77Value(br: BitReader, p: Int): Int =
    if (p < 4) p + 1
    else {
      val e = (p - 2) >> 1
      ((2 + (p & 1)) << e) + br.readBits(e) + 1
    }

  private def cacheHash(argb: Int, bits: Int): Int =
    ((0x1e35a7bd * argb) >>> (32 - bits))

  /** One prefix-code group: the five codes one entropy class carries. */
  private final class Group(br: BitReader, cacheBits: Int) {
    val green: PCode = readPrefixCode(br, greenAlphabet(cacheBits))
    val red: PCode = readPrefixCode(br, 256)
    val blue: PCode = readPrefixCode(br, 256)
    val alpha: PCode = readPrefixCode(br, 256)
    val dist: PCode = readPrefixCode(br, 40)
  }

  /** One entropy-coded image (the main ARGB plane or a transform's
    * sub-image). `allowMeta` is true only at level 0 — sub-images do
    * not carry the meta-prefix bit at all. With meta prefix codes the
    * (red<<8|green) index of the sub-sampled entropy image selects the
    * prefix-code group per token; the color cache is shared across
    * groups (it belongs to the spatially-coded image). */
  private def decodeImageData(br: BitReader, w: Int, h: Int,
      allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) {
      val cb = br.readBits(4)
      if (cb < 1 || cb > 11) corrupt()
      cb
    } else 0
    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaW = subSample(w, metaBits)
      metaImg = decodeImageData(br, metaW, subSample(h, metaBits),
        allowMeta = false)
      var k = 0
      var maxIdx = 0
      while (k < metaImg.length) {
        val v = (metaImg(k) >>> 8) & 0xffff
        if (v > maxIdx) maxIdx = v
        k += 1
      }
      numGroups = maxIdx + 1
      // bomb guard: groups are alphabet-sized table allocations
      if (numGroups.toLong * greenAlphabet(cacheBits) > (1L << 22)) corrupt()
    }
    val groups = Array.fill(numGroups)(new Group(br, cacheBits))
    val total = w * h
    val out = new Array[Int](total)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    var i = 0
    while (i < total) {
      val grp =
        if (metaImg == null) groups(0)
        else groups((metaImg(((i / w) >> metaBits) * metaW +
          ((i % w) >> metaBits)) >>> 8) & 0xffff)
      val g = grp.green.decode(br)
      if (g < 256) {
        val r = grp.red.decode(br)
        val b = grp.blue.decode(br)
        val a = grp.alpha.decode(br)
        val px = (a << 24) | (r << 16) | (g << 8) | b
        out(i) = px; insert(px); i += 1
      } else if (g < 280) {
        val len = lz77Value(br, g - 256)
        val dv = lz77Value(br, grp.dist.decode(br))
        val d = planeCodeToDistance(dv, w)
        if (d > i || i + len > total) corrupt()
        var k = 0
        while (k < len) { out(i) = out(i - d); insert(out(i)); i += 1; k += 1 }
      } else {
        if (cache == null) corrupt()
        val idx = g - 280
        if (idx >= cache.length) corrupt()
        out(i) = cache(idx); i += 1 // re-inserting cache(idx) is identity
      }
    }
    out
  }

  // ---- predictor transform --------------------------------------------

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, no cross-channel carry
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }
  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val av = (a >>> sh) & 0xff
      val bv = (b >>> sh) & 0xff
      val v = clamp255(av + (av - bv) / 2)
      out |= v << sh
      sh += 8
    }
    out
  }
  private def manhattan(a: Int, b: Int): Int = {
    var s = 0
    var sh = 0
    while (sh < 32) {
      s += math.abs(((a >>> sh) & 0xff) - ((b >>> sh) & 0xff))
      sh += 8
    }
    s
  }

  /** Predictor value for mode m given neighbors (already-reconstructed
    * pixels). The (0,0)/top-row/left-column overrides live in the
    * caller. Modes 11-13 are transcribed from the spec (Select /
    * ClampAddSubtract); the q168 fixtures pin modes 0-2 end-to-end and
    * Vp8lSpec roundtrips the rest — see the object scope note. */
  private def predict(m: Int, l: Int, t: Int, tl: Int, tr: Int): Int = m match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => // Select: whichever of L/T is Manhattan-closer to L+T-TL
      val p = clampAddSubtractFull(l, t, tl)
      if (manhattan(p, l) <= manhattan(p, t)) l else t
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(avg2(l, t), tl)
    case _ => corrupt()
  }

  private def addPixels(residual: Int, pred: Int): Int = {
    // per-channel modular add
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= ((((residual >>> sh) & 0xff) + ((pred >>> sh) & 0xff)) & 0xff) << sh
      sh += 8
    }
    out
  }
  private def subPixels(px: Int, pred: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= ((((px >>> sh) & 0xff) - ((pred >>> sh) & 0xff)) & 0xff) << sh
      sh += 8
    }
    out
  }

  /** Effective predictor mode at (x, y): border rules override the
    * block mode (the libwebp top/left discipline). */
  private def effMode(x: Int, y: Int, blockMode: Int): Int =
    if (x == 0 && y == 0) 0 else if (y == 0) 1 else if (x == 0) 2 else blockMode

  private def applyInversePredictor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, modes: Array[Int], blockW: Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val m = effMode(x, y,
          (modes(((y >> sizeBits) * blockW) + (x >> sizeBits)) >> 8) & 0xff)
        val l = if (x > 0) px(i - 1) else 0
        val t = if (y > 0) px(i - w) else 0
        val tl = if (x > 0 && y > 0) px(i - w - 1) else 0
        // flat-memory TR (the libwebp layout): at x = w-1 this reads the
        // CURRENT row's first pixel — already reconstructed in scan order
        val tr = if (y > 0) px(i - w + 1) else 0
        px(i) = addPixels(px(i), predict(m, l, t, tl, tr))
        x += 1
      }
      y += 1
    }
  }

  /** Cross-color multiplier: both the element byte and the channel
    * value act as SIGNED int8; the product's arithmetic >>5 is the
    * delta (RFC 9649 §3.3). */
  private def cdelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** Inverse COLOR transform: per-block elements pack green_to_red in
    * the blue channel, green_to_blue in green, red_to_blue in red; red
    * is recovered first and its RECOVERED value (masked, int8-cast)
    * feeds the blue correction — the order the forward encode must
    * mirror for exact inversion. */
  private def applyInverseColor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, elems: Array[Int], blockW: Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val e = elems(((y >> sizeBits) * blockW) + (x >> sizeBits))
        val p = px(i)
        val green = (p >>> 8) & 0xff
        val red = (((p >>> 16) & 0xff) + cdelta(e & 0xff, green)) & 0xff
        val blue = ((p & 0xff) + cdelta((e >>> 8) & 0xff, green) +
          cdelta((e >>> 16) & 0xff, red)) & 0xff
        px(i) = (p & 0xff00ff00) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
  }

  /** Palette bits-per-index bundling width: <=2 colors pack 8 indices
    * per green byte (widthBits 3), <=4 pack 4, <=16 pack 2, else one
    * full byte per pixel (widthBits 0). */
  private def paletteWidthBits(size: Int): Int =
    if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0

  /** Inverse COLOR_INDEXING: unbundle the green-channel index stream
    * (decoded at the reduced width) and look up the delta-decoded
    * palette. An index beyond the declared table is corrupt — loud
    * refusal, never a default pixel. */
  private def applyInverseColorIndex(buf: Array[Int], fullW: Int, h: Int,
      widthBits: Int, palette: Array[Int]): Array[Int] = {
    val reducedW = subSample(fullW, widthBits)
    val bpp = 8 >> widthBits
    val mask = (1 << widthBits) - 1
    val out = new Array[Int](fullW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < fullW) {
        val packed = (buf(y * reducedW + (x >> widthBits)) >>> 8) & 0xff
        val idx = (packed >>> (bpp * (x & mask))) & ((1 << bpp) - 1)
        if (idx >= palette.length) corrupt()
        out(y * fullW + x) = palette(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  private def applyInverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  // ---- public decode ---------------------------------------------------

  /** Decode a VP8L chunk payload (starting at the 0x2F signature) to
    * (w, h, ARGB). None on corruption OR a documented scope refusal. */
  def decodeArgb(b: Array[Byte], off: Int, len: Int,
      maxPixels: Int = 1 << 24): Option[(Int, Int, Array[Int])] =
    try {
      if (b == null || len < 5 || (b(off) & 0xff) != 0x2f) return None
      val br = new BitReader(b, off + 1, off + len)
      val w = br.readBits(14) + 1
      val h = br.readBits(14) + 1
      br.readBit() // alpha-used hint (informational)
      if (br.readBits(3) != 0) return None // version
      if (w.toLong * h > maxPixels) return None // bomb guard before alloc
      Some((w, h, decodeBody(br, w, h)))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** The image stream AFTER the header fields — also the entry point
    * for the container's HEADERLESS alpha bitstream (the ALPH chunk's
    * VP8L method carries no signature/dims; the caller knows w/h). */
  private def decodeBody(br: BitReader, w: Int, h: Int): Array[Int] = {
    // transforms, in read order; inverses apply in reverse. Each
    // records the xsize current when it was read: COLOR_INDEXING
    // reduces the width for everything read after it (bundling), so
    // later transforms' sub-images AND the main image decode at the
    // reduced width, and their inverses (which run BEFORE the
    // palette inverse) operate there too.
    // (type, bits, data, blockW, wAtRead)
    var transforms = List.empty[(Int, Int, Array[Int], Int, Int)]
    var seen = 0
    var curW = w
    while (br.readBit() == 1) {
      val t = br.readBits(2)
      if ((seen & (1 << t)) != 0) corrupt() // each transform at most once
      seen |= 1 << t
      t match {
        case 2 => transforms ::= ((2, 0, null, 0, curW)) // SUBTRACT_GREEN
        case 0 | 1 => // PREDICTOR / COLOR: per-block sub-image
          val sizeBits = br.readBits(3) + 2
          val bw = subSample(curW, sizeBits)
          val bh = subSample(h, sizeBits)
          val data = decodeImageData(br, bw, bh, allowMeta = false)
          transforms ::= ((t, sizeBits, data, bw, curW))
        case _ => // COLOR_INDEXING: delta-coded palette
          val size = br.readBits(8) + 1
          val pal = decodeImageData(br, size, 1, allowMeta = false)
          var k = 1
          while (k < size) { pal(k) = addPixels(pal(k), pal(k - 1)); k += 1 }
          val widthBits = paletteWidthBits(size)
          transforms ::= ((3, widthBits, pal, 0, curW))
          curW = subSample(curW, widthBits)
      }
    }
    var px = decodeImageData(br, curW, h, allowMeta = true)
    // transforms list is already reversed (::= prepends)
    transforms.foreach {
      case (2, _, _, _, _) => applyInverseSubtractGreen(px)
      case (0, sizeBits, modes, bw, wAt) =>
        applyInversePredictor(px, wAt, h, sizeBits, modes, bw)
      case (1, sizeBits, elems, bw, wAt) =>
        applyInverseColor(px, wAt, h, sizeBits, elems, bw)
      case (3, widthBits, pal, _, wAt) =>
        px = applyInverseColorIndex(px, wAt, h, widthBits, pal)
      case _ => corrupt()
    }
    if (px.length != w * h) corrupt()
    px
  }

  /** Decode a HEADERLESS alpha bitstream (the ALPH chunk's VP8L
    * method): the green channel of a w x h lossless image whose
    * header fields the container already supplied. */
  def decodeAlphaGreen(b: Array[Byte], off: Int, len: Int,
      w: Int, h: Int, maxPixels: Int = 1 << 24): Option[Array[Byte]] =
    try {
      if (b == null || len <= 0 || w.toLong * h > maxPixels) return None
      val px = decodeBody(new BitReader(b, off, off + len), w, h)
      val out = new Array[Byte](px.length)
      var i = 0
      while (i < px.length) { out(i) = ((px(i) >>> 8) & 0xff).toByte; i += 1 }
      Some(out)
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** ARGB → the 3-byte-interleaved RGB plane [[Multimodal]]'s pHash
    * path consumes. */
  def decodeRgb(b: Array[Byte], off: Int, len: Int): Option[(Int, Int, Array[Byte])] =
    decodeArgb(b, off, len).map { case (w, h, argb) =>
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < argb.length) {
        out(3 * i) = ((argb(i) >>> 16) & 0xff).toByte
        out(3 * i + 1) = ((argb(i) >>> 8) & 0xff).toByte
        out(3 * i + 2) = (argb(i) & 0xff).toByte
        i += 1
      }
      (w, h, out)
    }

  // ---- fixture encoder (REAL spec-shaped streams) -----------------------

  val VariantPlain = 0 // literals only, no transform
  val VariantSubGreen = 1 // SUBTRACT_GREEN + literals
  val VariantPredictor = 2 // all-mode-2 predictor (1-symbol sub-image trees)
  val VariantLz77 = 3 // greedy vertical/horizontal matches, linear distances
  val VariantCache = 4 // 4-bit color cache, hit symbols when current
  val VariantMeta = 5 // meta prefix codes: 2 entropy groups on an 8px grid
  val VariantColor = 6 // cross-color transform, per-block int8 multipliers
  val VariantPalette = 7 // COLOR_INDEXING (bundles automatically <=16 colors)
  val VariantDist2d = 8 // LZ77 through the 2D neighborhood distance table
  val VariantCacheMeta = 9 // color cache x meta prefix codes TOGETHER: the
  // cache state is SHARED across entropy groups (one insertion order,
  // two green alphabets carrying cache symbols) — the interaction path

  private def balancedLengths(used: Seq[Int], alphabet: Int): Array[Int] = {
    val lens = new Array[Int](alphabet)
    val n = used.size
    if (n == 1) { lens(used.head) = 1; return lens } // 0-bit convention
    val big = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil(log2 n)
    val excess = (1 << big) - n
    val srt = used.sorted
    srt.zipWithIndex.foreach { case (s, i) =>
      lens(s) = if (i < excess) big - 1 else big
    }
    lens
  }

  private def writePrefixCode(bw: BitWriter, lens: Array[Int]): PCode = {
    val used = lens.indices.filter(lens(_) > 0)
    require(used.nonEmpty, "a prefix code needs at least one symbol")
    if (used.size <= 2 && used.forall(_ < 256)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.size - 1, 1)
      val s0 = used.head
      if (used.size == 1 && s0 <= 1) { bw.writeBits(0, 1); bw.writeBits(s0, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
      if (used.size == 2) bw.writeBits(used(1), 8)
    } else {
      bw.writeBits(0, 1) // complex
      val maxSym = used.max
      // code-length code over the distinct lengths (plus 0 for gaps)
      val clUsed = (0 to maxSym).map(lens(_)).distinct.sorted
      val clLens = balancedLengths(clUsed, 19)
      val numCl = (ClOrder.lastIndexWhere(s => clLens(s) > 0) + 1).max(4)
      bw.writeBits(numCl - 4, 4)
      var i = 0
      while (i < numCl) { bw.writeBits(clLens(ClOrder(i)), 3); i += 1 }
      val clc = new PCode(clLens)
      // use_length: budget exactly maxSym+1 literal code reads, so the
      // decoder leaves every later symbol at length 0
      bw.writeBits(1, 1)
      val budget = maxSym + 1
      require(budget >= 2, "complex form implies >= 2 code reads " +
        "(single sub-256 symbols take the simple form)")
      var nbIdx = 0
      while ((1 << (2 + 2 * nbIdx)) <= budget - 2) nbIdx += 1
      bw.writeBits(nbIdx, 3)
      bw.writeBits(budget - 2, 2 + 2 * nbIdx)
      var s = 0
      while (s <= maxSym) { writeCanonical(bw, clc, lens(s)); s += 1 }
    }
    new PCode(lens)
  }

  private def lz77Split(v: Int): (Int, Int, Int) = {
    val u = v - 1
    if (u < 4) (u, 0, 0)
    else {
      val k = 31 - Integer.numberOfLeadingZeros(u)
      val e = k - 1
      if (u < (3 << e)) (2 * k, e, u - (2 << e))
      else (2 * k + 1, e, u - (3 << e))
    }
  }

  /** Encode ARGB pixels as one VP8L chunk payload. Each variant
    * exercises a distinct decode path; all are lossless, so the
    * decoded pixels are variant-independent (the q168 gate leans on
    * exactly that). */
  def encode(w: Int, h: Int, argb: Array[Int], variant: Int): Array[Byte] = {
    require(argb.length == w * h, "pixel count mismatch")
    require(w <= 16384 && h <= 16384, "14-bit dims")
    val bw = new BitWriter()
    val head = new java.io.ByteArrayOutputStream()
    head.write(0x2f)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    // transform headers + the plane the literals describe; palette
    // bundling reduces the coded width
    var plane = argb.clone()
    var pw = w
    variant match {
      case VariantSubGreen =>
        bw.writeBits(1, 1); bw.writeBits(2, 2) // SUBTRACT_GREEN
        bw.writeBits(0, 1) // end of transforms
        var i = 0
        while (i < plane.length) {
          val p = plane(i)
          val g = (p >>> 8) & 0xff
          val r = (((p >>> 16) & 0xff) - g) & 0xff
          val b = ((p & 0xff) - g) & 0xff
          plane(i) = (p & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case VariantPredictor =>
        bw.writeBits(1, 1); bw.writeBits(0, 2) // PREDICTOR
        val sizeBits = 4
        bw.writeBits(sizeBits - 2, 3)
        // mode sub-image: every block mode 2 (T) — 1-symbol trees, so
        // the blockW*blockH sub-pixels cost zero bits
        bw.writeBits(0, 1) // sub-image: no color cache
        // (sub-images carry no meta bit)
        writePrefixCode(bw, { val l = new Array[Int](280); l(2) = 1; l }) // green=mode
        writePrefixCode(bw, { val l = new Array[Int](256); l(0) = 1; l })
        writePrefixCode(bw, { val l = new Array[Int](256); l(0) = 1; l })
        writePrefixCode(bw, { val l = new Array[Int](256); l(255) = 1; l })
        writePrefixCode(bw, { val l = new Array[Int](40); l(0) = 1; l })
        bw.writeBits(0, 1) // end of transforms (sub-image is the data)
        // residuals vs the effective mode (border rules included)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y * w + x
            val m = effMode(x, y, 2)
            val l = if (x > 0) argb(i - 1) else 0
            val t = if (y > 0) argb(i - w) else 0
            val tl = if (x > 0 && y > 0) argb(i - w - 1) else 0
            val tr = if (y > 0) argb(i - w + 1) else 0 // flat TR, as decode
            plane(i) = subPixels(argb(i), predict(m, l, t, tl, tr))
            x += 1
          }
          y += 1
        }
      case VariantColor =>
        bw.writeBits(1, 1); bw.writeBits(1, 2) // COLOR
        val sizeBits = 4
        bw.writeBits(sizeBits - 2, 3)
        val bwid = subSample(w, sizeBits)
        val bhgt = subSample(h, sizeBits)
        // deterministic per-block multipliers; lossless for ANY input
        // because the inverse recovers red before blue uses it
        val elems = Array.tabulate(bwid * bhgt) { k =>
          0xff000000 | (((k * 29 + 17) & 0xff) << 16) |
            (((k * 13 + 5) & 0xff) << 8) | ((k * 37 + 11) & 0xff)
        }
        encodeImageData(bw, bwid, bhgt, elems, VariantPlain, level0 = false)
        bw.writeBits(0, 1) // end of transforms
        var i = 0
        while (i < plane.length) {
          val x = i % w
          val y = i / w
          val e = elems(((y >> sizeBits) * bwid) + (x >> sizeBits))
          val p = plane(i)
          val green = (p >>> 8) & 0xff
          val red0 = (p >>> 16) & 0xff
          val red = (red0 - cdelta(e & 0xff, green)) & 0xff
          val blue = ((p & 0xff) - cdelta((e >>> 8) & 0xff, green) -
            cdelta((e >>> 16) & 0xff, red0)) & 0xff
          plane(i) = (p & 0xff00ff00) | (red << 16) | blue
          i += 1
        }
      case VariantPalette =>
        val colors = argb.distinct.sorted
        require(colors.length <= 256, "palette variant needs <= 256 colors")
        val size = colors.length
        bw.writeBits(1, 1); bw.writeBits(3, 2) // COLOR_INDEXING
        bw.writeBits(size - 1, 8)
        val deltas = Array.tabulate(size)(k =>
          if (k == 0) colors(0) else subPixels(colors(k), colors(k - 1)))
        encodeImageData(bw, size, 1, deltas, VariantPlain, level0 = false)
        bw.writeBits(0, 1) // end of transforms
        val widthBits = paletteWidthBits(size)
        val bpp = 8 >> widthBits
        val mask = (1 << widthBits) - 1
        val idxOf = colors.zipWithIndex.toMap
        pw = subSample(w, widthBits)
        val packed = Array.fill(pw * h)(0xff000000)
        var i = 0
        while (i < argb.length) {
          val x = i % w
          val y = i / w
          val j = y * pw + (x >> widthBits)
          packed(j) |= idxOf(argb(i)) << (8 + bpp * (x & mask))
          i += 1
        }
        plane = packed
      case _ =>
        bw.writeBits(0, 1) // no transforms
    }
    // NOTE on ordering: the transform loop reads [bit, type, data]* then
    // a terminating 0 bit — the predictor's sub-image is part of its
    // transform DATA, so the terminator above follows it. For the
    // simple variants the single 0 bit terminates immediately.
    encodeImageData(bw, pw, h, plane, variant)
    val body = bw.toBytes
    head.write(body, 0, body.length)
    head.toByteArray
  }

  /** The main spatially-coded image: cache-info, meta bit (level 0
    * only), the prefix-code group(s), then the LZ77/literal stream.
    * Sub-images reuse this with level0=false (no meta bit on the
    * wire). [[VariantMeta]] splits literals into two entropy groups on
    * an 8px block grid; [[VariantDist2d]] routes matched distances
    * through the 2D neighborhood table when an offset entry lands on
    * them. */
  private def encodeImageData(bw: BitWriter, w: Int, h: Int,
      plane: Array[Int], variant: Int, level0: Boolean = true): Unit = {
    val cacheBits =
      if (variant == VariantCache || variant == VariantCacheMeta) 4 else 0
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    val meta =
      (variant == VariantMeta || variant == VariantCacheMeta) && level0
    val metaBits = 3 // 8x8 blocks
    val metaW = subSample(w, metaBits)
    if (level0) {
      if (meta) {
        bw.writeBits(1, 1)
        bw.writeBits(metaBits - 2, 3)
        val mh = subSample(h, metaBits)
        // checkerboard of group indices in the (red<<8|green) channel
        val entropy = Array.tabulate(metaW * mh)(k =>
          0xff000000 | (((k % metaW + k / metaW) % 2) << 8))
        encodeImageData(bw, metaW, mh, entropy, VariantPlain, level0 = false)
      } else bw.writeBits(0, 1) // no meta prefix codes
    }
    def groupAt(i: Int): Int =
      if (!meta) 0 else (((i % w) >> metaBits) + ((i / w) >> metaBits)) & 1
    // a single-block image's entropy sub-image only names group 0, and
    // the decoder sizes the group list from the entropy content
    val numGroups = if (meta && metaW * subSample(h, metaBits) >= 2) 2 else 1
    // distance -> smallest 2D plane code at this width (first-wins,
    // mirroring the decoder's fixed code->distance map)
    val planeOf: Map[Int, Int] =
      if (variant != VariantDist2d) Map.empty
      else (0 until 120).flatMap { k =>
        val dd = Dist2dOffsets(2 * k) + Dist2dOffsets(2 * k + 1) * w
        if (dd >= 1) Some(dd -> (k + 1)) else None
      }.groupBy(_._1).map { case (dd, ks) => dd -> ks.map(_._2).min }
    val total = w * h
    // token stream: (kind, a, b) kind 0=literal(px) 1=backref(len, dist_value) 2=cache(idx)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val tokenGrp = scala.collection.mutable.ArrayBuffer.empty[Int]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val cacheSeen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    var i = 0
    while (i < total) {
      val grp = groupAt(i)
      var matched = false
      if (variant == VariantLz77 || variant == VariantDist2d) {
        // greedy over a small candidate set (horizontal runs + 1-3 rows
        // up — the corpus family's noise pattern repeats at period 3 in
        // y, so distance 3w catches full-row matches)
        var bestLen = 0
        var bestD = 0
        for (d <- Seq(1, 2, 3, w, 2 * w, 3 * w) if d <= i) {
          var len = 0
          while (i + len < total && len < 4096 && plane(i + len) == plane(i + len - d))
            len += 1
          if (len > bestLen) { bestLen = len; bestD = d }
        }
        if (bestLen >= 4) {
          val dv = planeOf.getOrElse(bestD, bestD + 120)
          tokens += ((1, bestLen, dv)); tokenGrp += grp
          i += bestLen; matched = true
        }
      }
      if (!matched && cacheBits > 0) {
        val px = plane(i)
        val hsh = cacheHash(px, cacheBits)
        if (cacheSeen(hsh) && cache(hsh) == px) {
          tokens += ((2, hsh, 0)); tokenGrp += grp; i += 1; matched = true
        } else {
          cache(hsh) = px; cacheSeen(hsh) = true
        }
      }
      if (!matched) { tokens += ((0, plane(i), 0)); tokenGrp += grp; i += 1 }
    }
    // per-group histograms -> balanced codes, groups written in order
    final case class Used() {
      val g = scala.collection.mutable.SortedSet.empty[Int]
      val r = scala.collection.mutable.SortedSet.empty[Int]
      val b = scala.collection.mutable.SortedSet.empty[Int]
      val a = scala.collection.mutable.SortedSet.empty[Int]
      val d = scala.collection.mutable.SortedSet.empty[Int]
    }
    val used = Array.fill(numGroups)(Used())
    tokens.indices.foreach { k =>
      val u = used(tokenGrp(k))
      tokens(k) match {
        case (0, px, _) =>
          u.g += (px >>> 8) & 0xff
          u.r += (px >>> 16) & 0xff
          u.b += px & 0xff
          u.a += (px >>> 24) & 0xff
        case (1, len, dv) =>
          u.g += 256 + lz77Split(len)._1
          u.d += lz77Split(dv)._1
        case (_, idx, _) =>
          u.g += 280 + idx
      }
    }
    val gAlpha = greenAlphabet(cacheBits)
    val codes = used.map { u =>
      if (u.g.isEmpty) u.g += 0
      if (u.r.isEmpty) u.r += 0
      if (u.b.isEmpty) u.b += 0
      if (u.a.isEmpty) u.a += 0
      if (u.d.isEmpty) u.d += 0
      (writePrefixCode(bw, balancedLengths(u.g.toSeq, gAlpha)),
        writePrefixCode(bw, balancedLengths(u.r.toSeq, 256)),
        writePrefixCode(bw, balancedLengths(u.b.toSeq, 256)),
        writePrefixCode(bw, balancedLengths(u.a.toSeq, 256)),
        writePrefixCode(bw, balancedLengths(u.d.toSeq, 40)))
    }
    tokens.indices.foreach { k =>
      val (gCode, rCode, bCode, aCode, dCode) = codes(tokenGrp(k))
      tokens(k) match {
        case (0, px, _) =>
          writeCanonical(bw, gCode, (px >>> 8) & 0xff)
          writeCanonical(bw, rCode, (px >>> 16) & 0xff)
          writeCanonical(bw, bCode, px & 0xff)
          writeCanonical(bw, aCode, (px >>> 24) & 0xff)
        case (1, len, dv) =>
          val (lp, le, lv) = lz77Split(len)
          writeCanonical(bw, gCode, 256 + lp)
          if (le > 0) bw.writeBits(lv, le)
          val (dp, de, dvv) = lz77Split(dv)
          writeCanonical(bw, dCode, dp)
          if (de > 0) bw.writeBits(dvv, de)
        case (_, idx, _) =>
          writeCanonical(bw, gCode, 280 + idx)
      }
    }
  }
}
