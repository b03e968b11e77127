package graft.multimodal

/** REAL baseline JPEG pixel decode — the third real image/audio codec
  * path (PNG pixels: inflate + unfilter; WAV: PCM samples; this:
  * entropy decode + dequant + IDCT), built from the public T.81 spec.
  *
  * Scope (documented, loudly rejected otherwise): baseline sequential
  * DCT (SOF0), 8-bit precision, grayscale / 4:4:4 / 4:2:0 (luma 2×2,
  * chroma 1×1 — the dominant real-world layout; chroma planes decode
  * at half resolution and upsample by index scaling at the color
  * conversion), single interleaved scan, WITH restart-interval support
  * (DRI + RSTm markers: bit-reader realignment, DC predictor reset,
  * modulo-8 marker sequence checking — q127's fixtures exercise it).
  * Progressive and other sampling layouts surface as None
  * (format="unknown" in the stats frame), never as garbage pixels —
  * and a corpus can QUANTIFY the progressive refusal rate without
  * decoding: [[Multimodal.decodeImageHeaders]] classifies the SOF
  * family per payload (the q77 coding column).
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
              // (4:4:4 / grayscale) or Y=(2,2) with (1,1) chroma (4:2:0)
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
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // non-baseline SOF
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
              return Some((w, h, comps.length, out))
            case _ => () // APPn/COM/other: skip
          }
          i = j + 1 + segLen
        }
      }
      None
    } catch { case _: MarkerHit | _: ArrayIndexOutOfBoundsException => None }

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
}
