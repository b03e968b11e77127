package graft.multimodal

/** REAL JPEG pixel decode — the third real image/audio codec
  * path (PNG pixels: inflate + unfilter; WAV: PCM samples; this:
  * entropy decode + dequant + IDCT), built from the public T.81 spec.
  *
  * Scope (documented, loudly rejected otherwise): baseline sequential
  * DCT (SOF0) AND progressive DCT (SOF2 — spectral selection +
  * successive approximation, the most common real-world JPEG family),
  * 8-bit precision, grayscale / 4:4:4 / 4:2:0 (luma 2×2,
  * chroma 1×1 — the dominant real-world layout; chroma planes decode
  * at half resolution and upsample by index scaling at the color
  * conversion), WITH restart-interval support
  * (DRI + RSTm markers: bit-reader realignment, DC predictor reset,
  * modulo-8 marker sequence checking — q127's fixtures exercise it).
  * Progressive streams run the multi-scan path ([[
  * decodeProgressivePixels]]): DC first/refinement scans (interleaved
  * or single-component), per-component AC first/refinement scans with
  * EOB-run decoding (T.81 G.1.2), coefficients accumulated across
  * scans and IDCT'd once at EOI. Arithmetic coding, hierarchical mode,
  * 12-bit precision, and other sampling layouts surface as None
  * (format="unknown" in the stats frame), never as garbage pixels —
  * and a corpus can QUANTIFY the refusal rate without decoding:
  * [[Multimodal.decodeImageHeaders]] classifies the SOF family per
  * payload (the q77 coding column).
  *
  * The fixture encoder ([[dcOnlyBytes]]) emits REAL JPEGs — custom
  * canonical Huffman tables in DHT, FF-stuffed entropy data — whose
  * blocks are DC-only with an all-ones quantization table: the IDCT of
  * a lone DC coefficient 8·(p−128) is exactly the constant block p, so
  * decoded pixels are closed-form integers and the q124 oracle can
  * replay them without replicating the decoder (the q77/q119
  * generate-parse-replay pattern; full AC decoding is exercised by
  * JpegSpec against a reference IDCT instead). */
object Jpeg {

  /** Zig-zag index -> natural (row-major) index, T.81 Figure 5. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private final class MarkerHit(val marker: Int) extends RuntimeException

  /** Entropy-segment bit reader with 0xFF00 stuffing (T.81 B.1.1.5):
    * a 0xFF data byte is followed by a stuffed 0x00; any other value
    * after 0xFF is a marker — surfaced as MarkerHit so the caller can
    * consume an expected restart marker or reject cleanly. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw new MarkerHit(-1)
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new MarkerHit(-1)
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1
          else throw new MarkerHit(m)
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Consume an expected RSTm marker at a restart boundary: discard
      * the partial byte (encoders pad with 1s), then the 0xFF D0+m
      * pair must follow in MODULO-8 sequence (T.81 E.1.4). */
    def expectRestart(m: Int): Unit = {
      n = 0 // byte-align: padding bits discard
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
          (b(pos + 1) & 0xff) != (0xd0 + m)) throw new MarkerHit(-3)
      pos += 2
    }
  }

  /** Canonical Huffman decoder from a DHT (counts-per-length +
    * symbols), T.81 Annex F.2.2.3. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.readBit(); var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | r.readBit(); l += 1
      }
      if (maxCode(l) < 0 || code > maxCode(l)) throw new MarkerHit(-2)
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed
    * value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def clamp8(d: Double): Int = {
    val r = Math.round(d).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  /** Direct 2D IDCT of one dequantized block (natural order), plus the
    * +128 level shift and clamp — double precision, exact for the
    * DC-only fixtures (v/8 is an integer there) and reference-checked
    * on AC patterns in JpegSpec. */
  private def idctBlock(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              s += cu * cv * c *
                Math.cos((2 * x + 1) * u * Math.PI / 16.0) *
                Math.cos((2 * y + 1) * v * Math.PI / 16.0)
            }
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = clamp8(s / 4.0 + 128.0)
        x += 1
      }
      y += 1
    }
    out
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Per-component sample planes → interleaved RGB (grayscale expands
    * to R=G=B): index-scaling upsample of subsampled chroma + the
    * JFIF/CCIR 601 full-range conversion, shared by the baseline and
    * progressive paths. `comps` rows are (id, tq, hSamp, vSamp). */
  private def planesToRgb(w: Int, h: Int, comps: Array[(Int, Int, Int, Int)],
      planes: Array[Array[Int]], planeW: Seq[Int],
      maxH: Int, maxV: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val o = (yy * w + xx) * 3
        def smp(ci: Int): Int = planes(ci)(
          (yy * comps(ci)._4 / maxV) * planeW(ci) + xx * comps(ci)._3 / maxH)
        val p0 = smp(0)
        if (comps.length == 1) {
          out(o) = p0.toByte; out(o + 1) = p0.toByte; out(o + 2) = p0.toByte
        } else {
          val cb = smp(1) - 128
          val cr = smp(2) - 128
          out(o) = clamp8(p0 + 1.402 * cr).toByte
          out(o + 1) = clamp8(p0 - 0.344136 * cb - 0.714136 * cr).toByte
          out(o + 2) = clamp8(p0 + 1.772 * cb).toByte
        }
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Decode a baseline JPEG to interleaved 8-bit RGB (grayscale
    * expands to R=G=B). Returns (w, h, components-in-source, rgb);
    * None outside the documented scope or on any malformed structure.
    * Color conversion is the JFIF/CCIR 601 full-range formula in
    * double with round-half-up and clamp — on the neutral-chroma
    * fixtures the chroma terms are exactly zero, so the path is
    * integer-exact there. */
  def decodeJpegPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      if (b == null || b.length < 4) return None
      if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      val qt = new java.util.HashMap[Int, Array[Int]]() // id -> natural-order table
      val dcT = new java.util.HashMap[Int, Huff]()
      val acT = new java.util.HashMap[Int, Huff]()
      // (w, h, comps as (id, tq, hSamp, vSamp))
      var sof: Option[(Int, Int, Array[(Int, Int, Int, Int)])] = None
      var dri = 0 // restart interval in MCUs (0 = none)
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i = j + 1 }
        else if (marker == 0xd9) return None // EOI before SOS
        else {
          if (j + 2 >= b.length) return None
          val segLen = be16(b, j + 1)
          if (segLen < 2 || j + 1 + segLen > b.length) return None
          val body = j + 3
          marker match {
            case 0xc4 => // DHT: one or more tables
              var p = body
              while (p < j + 1 + segLen) {
                val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
                val counts = (1 to 16).map(k => b(p + k) & 0xff).toArray
                val n = counts.sum
                if (p + 17 + n > j + 1 + segLen) return None
                val syms = (0 until n).map(k => b(p + 17 + k) & 0xff).toArray
                val h = new Huff(counts, syms)
                if (tc == 0) dcT.put(th, h) else acT.put(th, h)
                p += 17 + n
              }
            case 0xdb => // DQT
              var p = body
              while (p < j + 1 + segLen) {
                val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
                if (pq != 0) return None // 16-bit tables out of scope
                if (p + 65 > j + 1 + segLen) return None
                val tab = new Array[Int](64)
                var k = 0
                while (k < 64) { tab(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
                qt.put(tq, tab)
                p += 65
              }
            case 0xc0 => // SOF0 baseline
              val precision = b(body) & 0xff
              val h = be16(b, body + 1); val w = be16(b, body + 3)
              val nc = b(body + 5) & 0xff
              if (precision != 8 || (nc != 1 && nc != 3)) return None
              // (id, tq, hSamp, vSamp); supported layouts: all-(1,1)
              // (4:4:4 / grayscale), Y=(2,2) chroma (1,1) (4:2:0), or
              // Y=(2,1) chroma (1,1) (4:2:2 — half-width chroma). The
              // MCU loop and plane indexing are h×v-generic; this
              // check just names the audited scope.
              val comps = (0 until nc).map { c =>
                val o = body + 6 + 3 * c
                val hv = b(o + 1) & 0xff
                (b(o) & 0xff, b(o + 2) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f)
              }.toArray
              val ok = comps.forall(c => c._3 == 1 && c._4 == 1) ||
                (nc == 3 && comps(0)._3 == 2 &&
                  (comps(0)._4 == 2 || comps(0)._4 == 1) &&
                  comps.tail.forall(c => c._3 == 1 && c._4 == 1))
              if (!ok) return None
              if (w <= 0 || h <= 0) return None
              sof = Some((w, h, comps))
            case 0xc2 => // progressive DCT: the multi-scan path
              return decodeProgressivePixels(b)
            case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // extended/lossless/arithmetic/hierarchical SOF
            case 0xdd => // DRI: restart interval in MCUs (0 = none)
              dri = be16(b, body)
            case 0xda => // SOS — decode the scan and return
              val (w, h, comps) = sof.getOrElse(return None)
              val ns = b(body) & 0xff
              if (ns != comps.length) return None
              val scan = (0 until ns).map { c =>
                val cid = b(body + 1 + 2 * c) & 0xff
                val tt = b(body + 2 + 2 * c) & 0xff
                val ci = comps.indexWhere(_._1 == cid)
                if (ci < 0) return None
                (ci, (tt >> 4) & 0x0f, tt & 0x0f)
              }
              val r = new BitReader(b, j + 1 + segLen)
              val maxH = comps.map(_._3).max; val maxV = comps.map(_._4).max
              val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
              val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
              // per-component plane at ITS resolution (chroma planes of
              // a 4:2:0 image are half-size; upsampling happens at the
              // color conversion by index scaling)
              val planeW = comps.map(c => mcusX * c._3 * 8)
              val planes = comps.indices.map(ci =>
                new Array[Int](planeW(ci) * mcusY * comps(ci)._4 * 8)).toArray
              val pred = new Array[Int](comps.length)
              var mcuIdx = 0
              var rstSeq = 0
              var my = 0
              while (my < mcusY) {
                var mx = 0
                while (mx < mcusX) {
                  // restart boundary: byte-align, consume RSTm in
                  // modulo-8 sequence, reset every DC predictor
                  if (dri > 0 && mcuIdx > 0 && mcuIdx % dri == 0) {
                    r.expectRestart(rstSeq)
                    rstSeq = (rstSeq + 1) % 8
                    java.util.Arrays.fill(pred, 0)
                  }
                  mcuIdx += 1
                  for ((ci, td, ta) <- scan) {
                    val q = qt.get(comps(ci)._2); if (q == null) return None
                    val dc = dcT.get(td); val ac = acT.get(ta)
                    if (dc == null || ac == null) return None
                    val (hS, vS) = (comps(ci)._3, comps(ci)._4)
                    var byy = 0
                    while (byy < vS) {
                      var bxx = 0
                      while (bxx < hS) {
                        val coef = new Array[Int](64)
                        val t = dc.decode(r)
                        pred(ci) += extend(r.readBits(t), t)
                        coef(0) = pred(ci) * q(0)
                        var k = 1
                        var eob = false
                        while (k < 64 && !eob) {
                          val rs = ac.decode(r)
                          val run = rs >> 4; val size = rs & 0x0f
                          if (size == 0) {
                            if (run == 15) k += 16 else eob = true
                          } else {
                            k += run
                            if (k > 63) return None
                            coef(Zigzag(k)) = extend(r.readBits(size), size) * q(Zigzag(k))
                            k += 1
                          }
                        }
                        val px = idctBlock(coef)
                        val px0 = (mx * hS + bxx) * 8
                        val py0 = (my * vS + byy) * 8
                        var yy = 0
                        while (yy < 8) {
                          var xx = 0
                          while (xx < 8) {
                            planes(ci)((py0 + yy) * planeW(ci) + px0 + xx) = px(yy * 8 + xx)
                            xx += 1
                          }
                          yy += 1
                        }
                        bxx += 1
                      }
                      byy += 1
                    }
                  }
                  mx += 1
                }
                my += 1
              }
              return Some((w, h, comps.length,
                planesToRgb(w, h, comps, planes, planeW, maxH, maxV)))
            case _ => () // APPn/COM/other: skip
          }
          i = j + 1 + segLen
        }
      }
      None
    } catch { case _: MarkerHit | _: ArrayIndexOutOfBoundsException => None }

  // ---- progressive DCT (SOF2) ---------------------------------------

  /** Decode a progressive JPEG (T.81 Annex G: spectral selection +
    * successive approximation) to interleaved 8-bit RGB — same output
    * contract and sampling scope as the baseline path. Coefficients
    * accumulate across scans in per-component stores (natural order
    * per block) and dequant + IDCT run once at EOI:
    *
    *  - DC first scans (Ss=Se=0, Ah=0): Huffman DIFF decoding of the
    *    2^Al-scaled values, interleaved MCU order when the scan carries
    *    several components, component raster order otherwise.
    *  - DC refinement (Ah>0): one raw bit per block, OR-ed at Al —
    *    correct for negative values because the first scan's
    *    arithmetic-shift floor leaves exactly the low bits to fill.
    *  - AC first scans (Ss≥1, single component per T.81): run/size
    *    coding with EOB-RUN (G.1.2.2) — an EOBn code ends 2^r+extra
    *    blocks at once.
    *  - AC refinement (G.1.2.3): correction bits for history-nonzero
    *    coefficients (magnitude grows toward the sign, never flips),
    *    new ±2^Al coefficients placed after their zero-history run,
    *    EOB-RUN blocks still paying correction bits.
    *
    * Restart markers reset DC predictors AND the EOB run; intervals
    * count MCUs in interleaved scans and blocks otherwise. Any
    * malformed structure → None (never garbage pixels). */
  def decodeProgressivePixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      if (b == null || b.length < 4) return None
      if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      val qt = new java.util.HashMap[Int, Array[Int]]()
      val dcT = new java.util.HashMap[Int, Huff]()
      val acT = new java.util.HashMap[Int, Huff]()
      var sof: Option[(Int, Int, Array[(Int, Int, Int, Int)])] = None
      var dri = 0
      var coefs: Array[Array[Int]] = null // per comp, padded grid, 64/block
      var wBlk: Array[Int] = null // padded block-grid width (MCU multiples)
      var nbW: Array[Int] = null // non-interleaved block dims (unpadded)
      var nbH: Array[Int] = null
      // successive-approximation history (G.1.1.1.1): per-component DC
      // point transform after the last DC scan (-1 = no DC scan yet)
      // and per-coefficient AC state — a scan whose Ss/Se/Ah/Al
      // contradicts the history (AC before the component's DC first
      // scan, a repeated first scan overwriting prior coefficients, a
      // refinement whose Ah is not the Al the prior scan left) decodes
      // to deterministic-but-meaningless pixels, so it is structure-
      // invalid here: None, never garbage.
      var dcAl: Array[Int] = null
      var acAl: Array[Array[Int]] = null
      var mcusX = 0; var mcusY = 0; var maxH = 1; var maxV = 1
      var sawScan = false
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i = j + 1 }
        else if (marker == 0xd9) { // EOI: finalize
          val (w, h, comps) = sof.getOrElse(return None)
          if (coefs == null || !sawScan) return None
          val planeW = comps.indices.map(ci => wBlk(ci) * 8)
          val planes = comps.indices.map(ci =>
            new Array[Int](planeW(ci) * mcusY * comps(ci)._4 * 8)).toArray
          var ci = 0
          while (ci < comps.length) {
            val q = qt.get(comps(ci)._2); if (q == null) return None
            // only the unpadded grid reaches pixels; padded MCU blocks
            // exist for interleaved-DC addressing and are cropped here
            var by = 0
            while (by < nbH(ci)) {
              var bx = 0
              while (bx < nbW(ci)) {
                val base = (by * wBlk(ci) + bx) * 64
                val coef = new Array[Int](64)
                var k = 0
                while (k < 64) { coef(k) = coefs(ci)(base + k) * q(k); k += 1 }
                val px = idctBlock(coef)
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    planes(ci)((by * 8 + yy) * planeW(ci) + bx * 8 + xx) =
                      px(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          return Some((w, h, comps.length,
            planesToRgb(w, h, comps, planes, planeW, maxH, maxV)))
        }
        else {
          if (j + 2 >= b.length) return None
          val segLen = be16(b, j + 1)
          if (segLen < 2 || j + 1 + segLen > b.length) return None
          val body = j + 3
          var nextI = j + 1 + segLen
          marker match {
            case 0xc4 =>
              var p = body
              while (p < j + 1 + segLen) {
                val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
                val counts = (1 to 16).map(k => b(p + k) & 0xff).toArray
                val n = counts.sum
                if (p + 17 + n > j + 1 + segLen) return None
                val syms = (0 until n).map(k => b(p + 17 + k) & 0xff).toArray
                val hf = new Huff(counts, syms)
                if (tc == 0) dcT.put(th, hf) else acT.put(th, hf)
                p += 17 + n
              }
            case 0xdb =>
              var p = body
              while (p < j + 1 + segLen) {
                val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
                if (pq != 0) return None
                if (p + 65 > j + 1 + segLen) return None
                val tab = new Array[Int](64)
                var k = 0
                while (k < 64) { tab(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
                qt.put(tq, tab)
                p += 65
              }
            case 0xc2 =>
              if (sof.isDefined) return None // one frame header only
              val precision = b(body) & 0xff
              val h = be16(b, body + 1); val w = be16(b, body + 3)
              val nc = b(body + 5) & 0xff
              if (precision != 8 || (nc != 1 && nc != 3)) return None
              val comps = (0 until nc).map { c =>
                val o = body + 6 + 3 * c
                val hv = b(o + 1) & 0xff
                (b(o) & 0xff, b(o + 2) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f)
              }.toArray
              val ok = comps.forall(c => c._3 == 1 && c._4 == 1) ||
                (nc == 3 && comps(0)._3 == 2 && comps(0)._4 == 2 &&
                  comps.tail.forall(c => c._3 == 1 && c._4 == 1))
              if (!ok) return None
              if (w <= 0 || h <= 0) return None
              sof = Some((w, h, comps))
              maxH = comps.map(_._3).max; maxV = comps.map(_._4).max
              mcusX = (w + 8 * maxH - 1) / (8 * maxH)
              mcusY = (h + 8 * maxV - 1) / (8 * maxV)
              wBlk = comps.map(c => mcusX * c._3)
              nbW = comps.map { c =>
                val compW = (w * c._3 + maxH - 1) / maxH
                (compW + 7) / 8
              }
              nbH = comps.map { c =>
                val compH = (h * c._4 + maxV - 1) / maxV
                (compH + 7) / 8
              }
              coefs = comps.indices.map(ci =>
                new Array[Int](wBlk(ci) * mcusY * comps(ci)._4 * 64)).toArray
              dcAl = Array.fill(comps.length)(-1)
              acAl = Array.fill(comps.length)(Array.fill(64)(-1))
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // a second, non-progressive frame header
            case 0xdd => dri = be16(b, body)
            case 0xda =>
              val (_, _, comps) = sof.getOrElse(return None)
              sawScan = true
              val ns = b(body) & 0xff
              if (ns < 1 || ns > comps.length) return None
              val scomps = (0 until ns).map { c =>
                val cid = b(body + 1 + 2 * c) & 0xff
                val tt = b(body + 2 + 2 * c) & 0xff
                val ci = comps.indexWhere(_._1 == cid)
                if (ci < 0) return None
                (ci, (tt >> 4) & 0x0f, tt & 0x0f)
              }.toArray
              val ss = b(body + 1 + 2 * ns) & 0xff
              val se = b(body + 2 + 2 * ns) & 0xff
              val a = b(body + 3 + 2 * ns) & 0xff
              val ah = (a >> 4) & 0x0f; val al = a & 0x0f
              if (ss == 0 && se != 0) return None // DC scan is exactly [0,0]
              if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
              if (al > 13 || (ah != 0 && ah != al + 1)) return None
              // cross-scan history checks (see dcAl/acAl above)
              if (ss == 0) {
                var si = 0
                while (si < scomps.length) {
                  val ci = scomps(si)._1
                  if (ah == 0) { if (dcAl(ci) != -1) return None }
                  else if (dcAl(ci) != ah) return None
                  dcAl(ci) = al
                  si += 1
                }
              } else {
                val ci = scomps(0)._1
                if (dcAl(ci) == -1) return None // AC before DC first scan
                var k = ss
                while (k <= se) {
                  if (ah == 0) { if (acAl(ci)(k) != -1) return None }
                  else if (acAl(ci)(k) != ah) return None
                  acAl(ci)(k) = al
                  k += 1
                }
              }
              val r = new BitReader(b, j + 1 + segLen)
              if (ss == 0)
                decodeDcScan(r, scomps, comps, coefs, wBlk, nbW, nbH,
                  mcusX, mcusY, dcT, ah, al, dri)
              else
                decodeAcScan(r, scomps(0)._1, scomps(0)._3, coefs, wBlk,
                  nbW, nbH, acT, ss, se, ah, al, dri)
              // scan entropy data ends at a byte boundary (the reader
              // consumes stuffing 0x00s with their FF at load time), so
              // the next bytes must be FF fill bytes then a true marker.
              // A non-FF byte, a stuffed FF00, or a stray RST here means
              // the scan UNDER-CONSUMED its entropy segment (trailing
              // garbage) — an FF D9 inside that leftover data would
              // finalize the image early with partial coefficients, so
              // reject instead of resyncing past it.
              var p = r.pos
              var found = -1
              while (found < 0 && p + 1 < b.length) {
                if ((b(p) & 0xff) != 0xff) return None
                else {
                  val m2 = b(p + 1) & 0xff
                  if (m2 == 0xff) p += 1 // fill byte
                  else if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7))
                    return None // leftover entropy / unconsumed RST
                  else found = p
                }
              }
              if (found < 0) return None
              nextI = found
            case _ => ()
          }
          i = nextI
        }
      }
      None
    } catch {
      case _: MarkerHit | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** One DC scan (first or refinement) into the coefficient stores. */
  private def decodeDcScan(r: BitReader,
      scomps: Array[(Int, Int, Int)], comps: Array[(Int, Int, Int, Int)],
      coefs: Array[Array[Int]], wBlk: Array[Int],
      nbW: Array[Int], nbH: Array[Int], mcusX: Int, mcusY: Int,
      dcT: java.util.HashMap[Int, Huff], ah: Int, al: Int, dri: Int): Unit = {
    val pred = new Array[Int](scomps.length)
    var unit = 0 // MCU (interleaved) or block (single-component) counter
    var rstSeq = 0
    def restartIfDue(): Unit =
      if (dri > 0 && unit > 0 && unit % dri == 0) {
        r.expectRestart(rstSeq)
        rstSeq = (rstSeq + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
    def block(si: Int, ci: Int, blockIdx: Int): Unit = {
      val base = blockIdx * 64
      if (ah == 0) {
        val dc = dcT.get(scomps(si)._2)
        if (dc == null) throw new MarkerHit(-7)
        val t = dc.decode(r)
        if (t > 15) throw new MarkerHit(-7)
        pred(si) += extend(r.readBits(t), t)
        coefs(ci)(base) = pred(si) << al
      } else if (r.readBit() == 1) coefs(ci)(base) |= 1 << al
    }
    if (scomps.length > 1) {
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          restartIfDue(); unit += 1
          var si = 0
          while (si < scomps.length) {
            val ci = scomps(si)._1
            val (hS, vS) = (comps(ci)._3, comps(ci)._4)
            var byy = 0
            while (byy < vS) {
              var bxx = 0
              while (bxx < hS) {
                block(si, ci, (my * vS + byy) * wBlk(ci) + mx * hS + bxx)
                bxx += 1
              }
              byy += 1
            }
            si += 1
          }
          mx += 1
        }
        my += 1
      }
    } else {
      val ci = scomps(0)._1
      var by = 0
      while (by < nbH(ci)) {
        var bx = 0
        while (bx < nbW(ci)) {
          restartIfDue(); unit += 1
          block(0, ci, by * wBlk(ci) + bx)
          bx += 1
        }
        by += 1
      }
    }
  }

  /** One AC scan (first or refinement) over a single component's
    * non-interleaved block raster. */
  private def decodeAcScan(r: BitReader, ci: Int, ta: Int,
      coefs: Array[Array[Int]], wBlk: Array[Int],
      nbW: Array[Int], nbH: Array[Int],
      acT: java.util.HashMap[Int, Huff],
      ss: Int, se: Int, ah: Int, al: Int, dri: Int): Unit = {
    val ac = acT.get(ta)
    if (ac == null) throw new MarkerHit(-8)
    val coef = coefs(ci)
    var eobrun = 0
    var unit = 0
    var rstSeq = 0
    val p1 = 1 << al
    var by = 0
    while (by < nbH(ci)) {
      var bx = 0
      while (bx < nbW(ci)) {
        if (dri > 0 && unit > 0 && unit % dri == 0) {
          r.expectRestart(rstSeq)
          rstSeq = (rstSeq + 1) % 8
          eobrun = 0
        }
        unit += 1
        val base = (by * wBlk(ci) + bx) * 64
        if (ah == 0) { // AC first scan (G.1.2.2)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = ac.decode(r)
              val run = rs >> 4; val s = rs & 0x0f
              if (s != 0) {
                k += run
                if (k > se) throw new MarkerHit(-9)
                coef(base + Zigzag(k)) = extend(r.readBits(s), s) << al
                k += 1
              } else if (run == 15) k += 16
              else {
                eobrun = (1 << run) - 1
                if (run > 0) eobrun += r.readBits(run)
                k = se + 1
              }
            }
          }
        } else { // AC refinement scan (G.1.2.3)
          def refine(c: Int): Unit =
            if (r.readBit() == 1 && (coef(c) & p1) == 0)
              coef(c) += (if (coef(c) >= 0) p1 else -p1)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = ac.decode(r)
              var run = rs >> 4
              val s = rs & 0x0f
              var newval = 0
              if (s == 0) {
                if (run != 15) {
                  // unlike the first scan, the EOB run INCLUDES the
                  // current block — its remaining positions still pay
                  // correction bits in the sweep below, then the run
                  // decrements there
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.readBits(run)
                  brk = true
                }
                // run == 15 (ZRL): skip 16 zero-history coefficients
              } else {
                if (s != 1) throw new MarkerHit(-10)
                newval = if (r.readBit() == 1) p1 else -p1
              }
              if (!brk) {
                var placed = false
                while (k <= se && !placed) {
                  val c = base + Zigzag(k)
                  if (coef(c) != 0) refine(c)
                  else if (run == 0) {
                    if (s != 0) coef(c) = newval
                    placed = true
                  } else run -= 1
                  k += 1
                }
                if (!placed && s != 0) throw new MarkerHit(-11)
              }
            }
          }
          if (eobrun > 0) { // EOB-run blocks still pay correction bits
            while (k <= se) {
              val c = base + Zigzag(k)
              if (coef(c) != 0) refine(c)
              k += 1
            }
            eobrun -= 1
          }
        }
        bx += 1
      }
      by += 1
    }
  }

  // ---- fixture encoder: REAL DC-only baseline JPEG ------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def write(bits: Int, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1); n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = if (n > 0) write(0xff, 8 - n)
  }

  private def dcCategory(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode `w`×`h` (multiples of 8) with per-block constant values:
    * component c's block (bx, by) is the constant `blockVal(bx, by, c)`
    * ∈ [0, 255]. comps = 1 (grayscale) or 3 (YCbCr; pass neutral
    * chroma 128 for an exactly-integer RGB round-trip). The stream is
    * a REAL baseline JPEG: all-ones DQT, custom canonical DHTs
    * (12 four-bit DC categories; AC EOB/ZRL pair), FF-stuffed entropy
    * data — [[decodeJpegPixels]] exercises its full table-parse +
    * entropy-decode + IDCT path on it, and the decoded block is
    * exactly the constant (DC 8·(p−128) dequantized by 1 IDCTs to p). */
  def dcOnlyBytes(w: Int, h: Int, comps: Int,
      blockVal: (Int, Int, Int) => Int, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dcOnlyBytes: dims must be positive multiples of 8, got ${w}x$h")
    require(comps == 1 || comps == 3, s"comps must be 1 or 3: $comps")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    // APP0/JFIF
    m(0xe0); w16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0), 0, 14)
    // DQT: table 0, all ones
    m(0xdb); w16(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    if (restartInterval > 0) { m(0xdd); w16(4); w16(restartInterval) }
    // SOF0
    m(0xc0); w16(8 + 3 * comps); out.write(8); w16(h); w16(w); out.write(comps)
    (1 to comps).foreach { id => out.write(id); out.write(0x11); out.write(0) }
    // DHT DC table 0: 12 categories, all 4-bit codes
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    val dcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(out.write)
    (0 until 12).foreach(out.write)
    // DHT AC table 0: EOB (0x00) and ZRL (0xF0), both 2-bit codes
    m(0xc4); w16(2 + 17 + 2); out.write(0x10)
    val acCounts = Array(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acCounts.foreach(out.write)
    out.write(0x00); out.write(0xf0)
    // SOS
    m(0xda); w16(6 + 2 * comps); out.write(comps)
    (1 to comps).foreach { id => out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    // entropy data: canonical codes — DC category t -> code t (4 bits);
    // AC EOB -> "00" (first 2-bit code)
    val bw = new BitWriter(out)
    val pred = new Array[Int](comps)
    val (nbx, nby) = (w / 8, h / 8)
    var mcuIdx = 0
    var rstSeq = 0
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        // restart boundary: pad to a byte, emit RSTm, reset predictors
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flushOnes()
          out.write(0xff); out.write(0xd0 + rstSeq)
          rstSeq = (rstSeq + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        mcuIdx += 1
        var c = 0
        while (c < comps) {
          val p = blockVal(bx, by, c)
          require(p >= 0 && p <= 255, s"blockVal out of range: $p")
          val v = 8 * (p - 128)
          val diff = v - pred(c); pred(c) = v
          val t = dcCategory(diff)
          bw.write(t, 4) // DC code for category t IS t (canonical, 12×4-bit)
          if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          bw.write(0, 2) // AC EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flushOnes()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Encode `w`×`h` (multiples of 8) as a REAL progressive JPEG
    * (SOF2) over caller-supplied QUANTIZED coefficients:
    * `coefVal(bx, by, c, k)` is block (bx, by) of component c's
    * coefficient at NATURAL index k (0 = DC; quantization is q(0)=8,
    * q(k>0)=1, so a DC-only pattern `p - 128` dequantizes to
    * 8·(p−128) and IDCTs to the exact constant block p — the q124
    * closed-form, now reached through four-plus scans). Scan
    * progression, mirroring the decode dual exactly:
    *
    *   1. DC first, ALL components interleaved, Al=1 (diffs of the
    *      arithmetic-shifted values)
    *   2. DC refinement, Ah=1→Al=0 (one raw low bit per block)
    *   3. per component: AC first, Ss=1..63, Al=1 — run/size coding
    *      of the shifted coefficients with EOB runs MERGED across
    *      all-zero blocks (a multi-block EOBn exercises the run
    *      decoder, not just plain EOB)
    *   4. per component: AC refinement, Al=0 — correction bits for
    *      history-nonzero coefficients, new ±1 coefficients placed
    *      after their zero-history runs (ZRL-split when > 16), EOB
    *      runs carrying the covered blocks' correction bits.
    *
    * Sampling is 1×1 (grayscale / 4:4:4); comps = 1 or 3. New-in-
    * refinement coefficients must have |value| == 1 and history
    * values |value| ≥ 2 carry their low bit as the correction —
    * both are properties of ANY integer pattern, so every coefficient
    * assignment is encodable. */
  def progressiveBytes(w: Int, h: Int, comps: Int,
      coefVal: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"progressiveBytes: dims must be positive multiples of 8, got ${w}x$h")
    require(comps == 1 || comps == 3, s"comps must be 1 or 3: $comps")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xe0); w16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0), 0, 14)
    // DQT: zigzag position 0 (the DC) quantizes by 8, the rest by 1
    m(0xdb); w16(2 + 65); out.write(0x00)
    out.write(8); (1 until 64).foreach(_ => out.write(1))
    // SOF2
    m(0xc2); w16(8 + 3 * comps); out.write(8); w16(h); w16(w); out.write(comps)
    (1 to comps).foreach { id => out.write(id); out.write(0x11); out.write(0) }
    // DHT DC 0: 12 categories at 4 bits (code of category t IS t)
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 until 12).foreach(out.write)
    // DHT AC 0: the UNIVERSAL table — symbols 0x00..0xFE at 8 bits
    // (canonical code = symbol value), 0xFF at 9 bits (code 510); every
    // (run, size) pair is encodable, so the encoder never needs a
    // per-image table build
    m(0xc4); w16(2 + 17 + 256); out.write(0x10)
    Array(0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 until 256).foreach(out.write)
    def huffAc(bw: BitWriter, sym: Int): Unit =
      if (sym < 255) bw.write(sym, 8) else bw.write(510, 9)
    def sos(scomps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xda); w16(6 + 2 * scomps.length); out.write(scomps.length)
      scomps.foreach { id => out.write(id); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    val (nbx, nby) = (w / 8, h / 8)
    def eachBlock(f: (Int, Int) => Unit): Unit = {
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) { f(bx, by); bx += 1 }
        by += 1
      }
    }
    // --- scan 1: DC first, interleaved, Al=1 ---
    sos(1 to comps, 0, 0, 0, 1)
    val bw1 = new BitWriter(out)
    val pred = new Array[Int](comps)
    eachBlock { (bx, by) =>
      var c = 0
      while (c < comps) {
        val va = coefVal(bx, by, c, 0) >> 1 // arithmetic shift = T.81 point transform
        val diff = va - pred(c); pred(c) = va
        val t = dcCategory(diff)
        require(t <= 11, s"DC diff $diff out of the 12-category table")
        bw1.write(t, 4)
        if (t > 0) bw1.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        c += 1
      }
    }
    bw1.flushOnes()
    // --- scan 2: DC refinement, Al=0 ---
    sos(1 to comps, 0, 0, 1, 0)
    val bw2 = new BitWriter(out)
    eachBlock { (bx, by) =>
      var c = 0
      while (c < comps) { bw2.write(coefVal(bx, by, c, 0) & 1, 1); c += 1 }
    }
    bw2.flushOnes()
    // EOB-run flush shared by both AC scans: n covered blocks, each
    // carrying its (possibly empty) correction-bit list
    def flushEob(bw: BitWriter, blocks: scala.collection.mutable.ArrayBuffer[Seq[Int]]): Unit = {
      var idx = 0
      while (idx < blocks.length) {
        val n = math.min(blocks.length - idx, 32767)
        var r = 0
        while ((1 << (r + 1)) <= n) r += 1
        huffAc(bw, r << 4)
        if (r > 0) bw.write(n - (1 << r), r)
        var k = 0
        while (k < n) { blocks(idx + k).foreach(bit => bw.write(bit, 1)); k += 1 }
        idx += n
      }
      blocks.clear()
    }
    var c = 0
    while (c < comps) {
      // --- AC first, Ss=1..63, Al=1 ---
      sos(Seq(c + 1), 1, 63, 0, 1)
      val bw3 = new BitWriter(out)
      val eob3 = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      eachBlock { (bx, by) =>
        val t = Array.tabulate(64)(k => coefVal(bx, by, c, k) / 2) // trunc toward 0
        val lastNz = (63 to 1 by -1).find(k => t(Zigzag(k)) != 0).getOrElse(0)
        if (lastNz == 0) eob3 += Nil // all-zero block joins the EOB run
        else {
          flushEob(bw3, eob3)
          var run = 0
          var k = 1
          while (k <= lastNz) {
            val v = t(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run >= 16) { huffAc(bw3, 0xf0); run -= 16 }
              val s = dcCategory(v)
              huffAc(bw3, (run << 4) | s)
              bw3.write(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (lastNz < 63) eob3 += Nil // trailing zeros: this block opens a run
        }
      }
      flushEob(bw3, eob3)
      bw3.flushOnes()
      // --- AC refinement, Al=0 — the decoder walk's exact dual ---
      sos(Seq(c + 1), 1, 63, 1, 0)
      val bw4 = new BitWriter(out)
      val eob4 = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      eachBlock { (bx, by) =>
        val cur = Array.tabulate(64)(k => coefVal(bx, by, c, k))
        val hist = cur.map(_ / 2)
        def corrBit(k: Int): Int = math.abs(cur(Zigzag(k))) & 1
        val news = (1 to 63).filter(k =>
          hist(Zigzag(k)) == 0 && cur(Zigzag(k)) != 0)
        news.foreach(k => require(math.abs(cur(Zigzag(k))) == 1,
          s"new-in-refinement coefficient must be ±1 at zigzag $k"))
        if (news.isEmpty)
          eob4 += (1 to 63).filter(k => hist(Zigzag(k)) != 0).map(corrBit)
        else {
          flushEob(bw4, eob4)
          var k = 1
          news.foreach { p =>
            // zero-history run length up to the placement position
            var z = (k until p).count(q => hist(Zigzag(q)) == 0)
            while (z >= 16) {
              // ZRL: consumes 16 zero-history positions, paying the
              // correction bits of history-nonzero ones passed
              huffAc(bw4, 0xf0)
              var consumed = 0
              while (consumed < 16) {
                if (hist(Zigzag(k)) != 0) bw4.write(corrBit(k), 1)
                else consumed += 1
                k += 1
              }
              z -= 16
            }
            huffAc(bw4, (z << 4) | 1)
            bw4.write(if (cur(Zigzag(p)) > 0) 1 else 0, 1)
            while (k < p) {
              if (hist(Zigzag(k)) != 0) bw4.write(corrBit(k), 1)
              k += 1
            }
            k = p + 1 // the placement position itself pays no bit
          }
          if (k <= 63) // trailing positions ride an EOB run
            eob4 += (k to 63).filter(q => hist(Zigzag(q)) != 0).map(corrBit)
        }
      }
      flushEob(bw4, eob4)
      bw4.flushOnes()
      c += 1
    }
    m(0xd9) // EOI
    out.toByteArray
  }

  /** [[dcOnlyBytes]] for 4:2:0 — Y sampled 2×2, chroma 1×1, the
    * dominant real-world layout: dims multiples of 16; luma is an 8×8
    * constant per block `lumaVal(bx, by)` over the (w/8)×(h/8) grid,
    * chroma is constant per MCU `chromaVal(mx, my, c∈{0=Cb,1=Cr})`.
    * The MCU entropy order is the T.81 interleave — 4 raster luma
    * blocks, then Cb, then Cr — with per-component DC predictors, so
    * the decoder's full subsampled MCU loop and half-resolution chroma
    * plane indexing are really exercised. */
  def dcOnly420Bytes(w: Int, h: Int, lumaVal: (Int, Int) => Int,
      chromaVal: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"dcOnly420Bytes: dims must be positive multiples of 16, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xe0); w16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0), 0, 14)
    m(0xdb); w16(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    m(0xc0); w16(8 + 9); out.write(8); w16(h); w16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y: 2x2
    out.write(2); out.write(0x11); out.write(0) // Cb
    out.write(3); out.write(0x11); out.write(0) // Cr
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 until 12).foreach(out.write)
    m(0xc4); w16(2 + 17 + 2); out.write(0x10)
    Array(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(0x00); out.write(0xf0)
    m(0xda); w16(6 + 6); out.write(3)
    (1 to 3).foreach { id => out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val pred = new Array[Int](3)
    def block(c: Int, p: Int): Unit = {
      require(p >= 0 && p <= 255, s"block value out of range: $p")
      val v = 8 * (p - 128)
      val diff = v - pred(c); pred(c) = v
      val t = dcCategory(diff)
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.write(0, 2) // AC EOB
    }
    val (nmx, nmy) = (w / 16, h / 16)
    var my = 0
    while (my < nmy) {
      var mx = 0
      while (mx < nmx) {
        var byy = 0
        while (byy < 2) {
          var bxx = 0
          while (bxx < 2) {
            block(0, lumaVal(mx * 2 + bxx, my * 2 + byy))
            bxx += 1
          }
          byy += 1
        }
        block(1, chromaVal(mx, my, 0))
        block(2, chromaVal(mx, my, 1))
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    m(0xd9)
    out.toByteArray
  }

  /** [[dcOnly420Bytes]] for 4:2:2 — Y sampled 2×1, chroma 1×1
    * (half-WIDTH chroma, the remaining common broadcast/camera
    * layout): width multiple of 16, height multiple of 8; MCUs are
    * 16×8. Luma is constant per 8×8 block `lumaVal(bx, by)` over the
    * (w/8)×(h/8) grid; chroma constant per MCU `chromaVal(mx, my, c)`.
    * Entropy order per MCU: 2 raster luma blocks, Cb, Cr. */
  def dcOnly422Bytes(w: Int, h: Int, lumaVal: (Int, Int) => Int,
      chromaVal: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 8 == 0,
      s"dcOnly422Bytes: width %16, height %8, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xe0); w16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0), 0, 14)
    m(0xdb); w16(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    m(0xc0); w16(8 + 9); out.write(8); w16(h); w16(w); out.write(3)
    out.write(1); out.write(0x21); out.write(0) // Y: 2x1
    out.write(2); out.write(0x11); out.write(0) // Cb
    out.write(3); out.write(0x11); out.write(0) // Cr
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 until 12).foreach(out.write)
    m(0xc4); w16(2 + 17 + 2); out.write(0x10)
    Array(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(0x00); out.write(0xf0)
    m(0xda); w16(6 + 6); out.write(3)
    (1 to 3).foreach { id => out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val pred = new Array[Int](3)
    def block(c: Int, p: Int): Unit = {
      require(p >= 0 && p <= 255, s"block value out of range: $p")
      val v = 8 * (p - 128)
      val diff = v - pred(c); pred(c) = v
      val t = dcCategory(diff)
      bw.write(t, 4)
      if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.write(0, 2) // AC EOB
    }
    val (nmx, nmy) = (w / 16, h / 8)
    var my = 0
    while (my < nmy) {
      var mx = 0
      while (mx < nmx) {
        var bxx = 0
        while (bxx < 2) {
          block(0, lumaVal(mx * 2 + bxx, my))
          bxx += 1
        }
        block(1, chromaVal(mx, my, 0))
        block(2, chromaVal(mx, my, 1))
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    m(0xd9)
    out.toByteArray
  }
}
