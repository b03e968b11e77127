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
  * single-symbol convention); the five-code prefix group; LZ77
  * literals, backward references (length/distance prefix + extra
  * bits) and the color cache (hash 0x1e35a7bd, insert-on-every-pixel);
  * the SUBTRACT_GREEN transform; the PREDICTOR transform with all 14
  * modes and the border rules, including its entropy-coded mode
  * sub-image.
  *
  * SCOPE boundary (the Zstd-dictionary-frames discipline — loud
  * refusal, never garbage): meta prefix codes (the entropy image),
  * the COLOR and COLOR_INDEXING transforms, and 2D distance codes
  * (dist_value <= 120 — the 120-entry neighborhood table; graft's
  * encoder emits linear codes only) return None. Real-world encoders
  * use meta prefix codes on anything non-trivial, so those payloads
  * refuse at that first gate; the fixture encoder below emits
  * spec-shaped streams that exercise every implemented path, and the
  * q168 gate pins the decoded pixels against the q133 closed-form
  * oracle — the compression layer proven invisible. No external WebP
  * implementation exists in this environment to golden-test against
  * (unlike zstd); the bit conventions are therefore additionally
  * pinned by hand-constructed vectors in Vp8lSpec.
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

  private def lz77Value(br: BitReader, p: Int): Int =
    if (p < 4) p + 1
    else {
      val e = (p - 2) >> 1
      ((2 + (p & 1)) << e) + br.readBits(e) + 1
    }

  private def cacheHash(argb: Int, bits: Int): Int =
    ((0x1e35a7bd * argb) >>> (32 - bits))

  /** One entropy-coded image (the main ARGB plane or a transform's
    * sub-image). `allowMeta` is true only at level 0 — sub-images do
    * not carry the meta-prefix bit at all. */
  private def decodeImageData(br: BitReader, w: Int, h: Int,
      allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) {
      val cb = br.readBits(4)
      if (cb < 1 || cb > 11) corrupt()
      cb
    } else 0
    if (allowMeta && br.readBit() == 1)
      corrupt() // SCOPE: meta prefix codes (see object note)
    val green = readPrefixCode(br, greenAlphabet(cacheBits))
    val red = readPrefixCode(br, 256)
    val blue = readPrefixCode(br, 256)
    val alpha = readPrefixCode(br, 256)
    val dist = readPrefixCode(br, 40)
    val total = w * h
    val out = new Array[Int](total)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    var i = 0
    while (i < total) {
      val g = green.decode(br)
      if (g < 256) {
        val r = red.decode(br)
        val b = blue.decode(br)
        val a = alpha.decode(br)
        val px = (a << 24) | (r << 16) | (g << 8) | b
        out(i) = px; insert(px); i += 1
      } else if (g < 280) {
        val len = lz77Value(br, g - 256)
        val dv = lz77Value(br, dist.decode(br))
        // SCOPE: dist_value <= 120 selects the 2D neighborhood table
        if (dv <= 120) corrupt()
        val d = dv - 120
        if (d < 1 || d > i || i + len > total) corrupt()
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
      // transforms, in read order; inverses apply in reverse
      var transforms = List.empty[(Int, Int, Array[Int], Int)] // (type, sizeBits, modes, blockW)
      var seen = 0
      while (br.readBit() == 1) {
        val t = br.readBits(2)
        if ((seen & (1 << t)) != 0) corrupt() // each transform at most once
        seen |= 1 << t
        t match {
          case 2 => transforms ::= ((2, 0, null, 0)) // SUBTRACT_GREEN
          case 0 => // PREDICTOR
            val sizeBits = br.readBits(3) + 2
            val bw = (w + (1 << sizeBits) - 1) >> sizeBits
            val bh = (h + (1 << sizeBits) - 1) >> sizeBits
            val modes = decodeImageData(br, bw, bh, allowMeta = false)
            transforms ::= ((0, sizeBits, modes, bw))
          case _ => corrupt() // SCOPE: COLOR / COLOR_INDEXING transforms
        }
      }
      val px = decodeImageData(br, w, h, allowMeta = true)
      // transforms list is already reversed (::= prepends)
      transforms.foreach {
        case (2, _, _, _) => applyInverseSubtractGreen(px)
        case (0, sizeBits, modes, bw) =>
          applyInversePredictor(px, w, h, sizeBits, modes, bw)
        case _ => corrupt()
      }
      Some((w, h, px))
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
    // transform headers + the plane the literals describe
    val plane = argb.clone()
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
      case _ =>
        bw.writeBits(0, 1) // no transforms
    }
    // NOTE on ordering: the transform loop reads [bit, type, data]* then
    // a terminating 0 bit — the predictor's sub-image is part of its
    // transform DATA, so the terminator above follows it. For the
    // simple variants the single 0 bit terminates immediately.
    encodeImageData(bw, w, h, plane, variant)
    val body = bw.toBytes
    head.write(body, 0, body.length)
    head.toByteArray
  }

  /** The main spatially-coded image: cache-info, meta bit (0), the
    * five prefix codes, then the LZ77/literal stream. */
  private def encodeImageData(bw: BitWriter, w: Int, h: Int,
      plane: Array[Int], variant: Int): Unit = {
    val cacheBits = if (variant == VariantCache) 4 else 0
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    bw.writeBits(0, 1) // no meta prefix codes
    val total = w * h
    // token stream: (kind, a, b) kind 0=literal(px) 1=backref(len,dist) 2=cache(idx)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val cacheSeen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    var i = 0
    while (i < total) {
      var matched = false
      if (variant == VariantLz77) {
        // greedy over a small candidate set (horizontal runs + 1-3 rows
        // up — the corpus family's noise pattern repeats at period 3 in
        // y, so distance 3w catches full-row matches); linear codes only
        var bestLen = 0
        var bestD = 0
        for (d <- Seq(1, 2, 3, w, 2 * w, 3 * w) if d <= i) {
          var len = 0
          while (i + len < total && len < 4096 && plane(i + len) == plane(i + len - d))
            len += 1
          if (len > bestLen) { bestLen = len; bestD = d }
        }
        if (bestLen >= 4) {
          tokens += ((1, bestLen, bestD)); i += bestLen; matched = true
        }
      }
      if (!matched && cacheBits > 0) {
        val px = plane(i)
        val hsh = cacheHash(px, cacheBits)
        if (cacheSeen(hsh) && cache(hsh) == px) {
          tokens += ((2, hsh, 0)); i += 1; matched = true
        } else {
          cache(hsh) = px; cacheSeen(hsh) = true
        }
      }
      if (!matched) { tokens += ((0, plane(i), 0)); i += 1 }
    }
    // histograms -> balanced codes
    val gUsed = scala.collection.mutable.SortedSet.empty[Int]
    val rUsed = scala.collection.mutable.SortedSet.empty[Int]
    val bUsed = scala.collection.mutable.SortedSet.empty[Int]
    val aUsed = scala.collection.mutable.SortedSet.empty[Int]
    val dUsed = scala.collection.mutable.SortedSet.empty[Int]
    tokens.foreach {
      case (0, px, _) =>
        gUsed += (px >>> 8) & 0xff
        rUsed += (px >>> 16) & 0xff
        bUsed += px & 0xff
        aUsed += (px >>> 24) & 0xff
      case (1, len, d) =>
        gUsed += 256 + lz77Split(len)._1
        dUsed += lz77Split(d + 120)._1
      case (_, idx, _) =>
        gUsed += 280 + idx
    }
    if (gUsed.isEmpty) gUsed += 0
    if (rUsed.isEmpty) rUsed += 0
    if (bUsed.isEmpty) bUsed += 0
    if (aUsed.isEmpty) aUsed += 0
    if (dUsed.isEmpty) dUsed += 0
    val gAlpha = greenAlphabet(cacheBits)
    val gCode = writePrefixCode(bw, balancedLengths(gUsed.toSeq, gAlpha))
    val rCode = writePrefixCode(bw, balancedLengths(rUsed.toSeq, 256))
    val bCode = writePrefixCode(bw, balancedLengths(bUsed.toSeq, 256))
    val aCode = writePrefixCode(bw, balancedLengths(aUsed.toSeq, 256))
    val dCode = writePrefixCode(bw, balancedLengths(dUsed.toSeq, 40))
    tokens.foreach {
      case (0, px, _) =>
        writeCanonical(bw, gCode, (px >>> 8) & 0xff)
        writeCanonical(bw, rCode, (px >>> 16) & 0xff)
        writeCanonical(bw, bCode, px & 0xff)
        writeCanonical(bw, aCode, (px >>> 24) & 0xff)
      case (1, len, d) =>
        val (lp, le, lv) = lz77Split(len)
        writeCanonical(bw, gCode, 256 + lp)
        if (le > 0) bw.writeBits(lv, le)
        val (dp, de, dvv) = lz77Split(d + 120)
        writeCanonical(bw, dCode, dp)
        if (de > 0) bw.writeBits(dvv, de)
      case (_, idx, _) =>
        writeCanonical(bw, gCode, 280 + idx)
    }
  }
}
