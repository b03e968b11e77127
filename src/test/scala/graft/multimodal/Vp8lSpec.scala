package graft.multimodal

import graft.SparkSpec

class Vp8lSpec extends SparkSpec {

  // deterministic ARGB images: gray 4x4-block structure (the corpus
  // family), a full-color pattern, and a flat one (cache-friendly)
  private def grayImg(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val base = ((seed * 73L + (x / 4) * 37L + (y / 4) * 91L) % 17L) * 15L
      val e = (seed * 31L + x * 7L + y * 13L) % 3L - 1L
      val g = math.max(0L, math.min(255L, base + e)).toInt
      0xff000000 | (g << 16) | (g << 8) | g
    }
  private def colorImg(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      0xff000000 | (((x * 11) % 256) << 16) | (((y * 29) % 256) << 8) |
        ((x * 3 + y * 5) % 256)
    }

  private val variants = Seq(Vp8l.VariantPlain, Vp8l.VariantSubGreen,
    Vp8l.VariantPredictor, Vp8l.VariantLz77, Vp8l.VariantCache,
    Vp8l.VariantMeta, Vp8l.VariantColor, Vp8l.VariantPalette,
    Vp8l.VariantDist2d, Vp8l.VariantCacheMeta)

  test("bit conventions pinned by hand vectors (RFC 1951 canonical, LSB-first packing)") {
    // lengths [2,1,3,3]: canonical codes sym1=0, sym0=10, sym2=110,
    // sym3=111. Decoding [sym2, sym0, sym1] = code bits 110 10 0,
    // packed LSB-first: bit sequence 1,1,0,1,0,0 -> byte 0b00001011
    val code = new Vp8l.PCode(Array(2, 1, 3, 3))
    val br = new Vp8l.BitReader(Array(0x0b.toByte), 0, 1)
    assert(code.decode(br) == 2)
    assert(code.decode(br) == 0)
    assert(code.decode(br) == 1)
    // the encoder's view of the same rule
    assert(code.codeOf(1) == (0, 1))
    assert(code.codeOf(0) == (2, 2)) // "10"
    assert(code.codeOf(2) == (6, 3)) // "110"
    assert(code.codeOf(3) == (7, 3)) // "111"
    // an incomplete code is corrupt, not best-effort
    intercept[RuntimeException] { new Vp8l.PCode(Array(1, 0, 0, 0, 2)) }
  }

  test("every encoder variant roundtrips to identical pixels (lossless invariant)") {
    val imgs = Seq(
      (32, 32, grayImg(32, 32, 4L)),
      (64, 64, grayImg(64, 64, 11L)),
      (33, 17, colorImg(33, 17)), // odd dims: partial predictor blocks
      (8, 8, grayImg(8, 8, 0L)),
      (16, 1, colorImg(16, 1)), // single row: border rules everywhere
      (1, 16, colorImg(1, 16))) // single column
    for ((w, h, img) <- imgs; v <- variants
        if v != Vp8l.VariantPalette || img.distinct.length <= 256) {
      val payload = Vp8l.encode(w, h, img, v)
      val out = Vp8l.decodeArgb(payload, 0, payload.length)
      assert(out.isDefined, s"decode failed (variant $v, ${w}x$h)")
      val (dw, dh, px) = out.get
      assert(dw == w && dh == h, s"dims (variant $v)")
      assert(java.util.Arrays.equals(px, img),
        s"pixel mismatch (variant $v, ${w}x$h)")
    }
  }

  test("bundled palettes roundtrip at every width (1/2/4-bit indices, partial bundles)") {
    // distinct-color counts straddling the bundling thresholds; odd
    // widths force a partial final bundle per row
    val cases = Seq(
      (2, 21, 9), // widthBits 3: 8 indices per green byte
      (4, 19, 7), // widthBits 2
      (16, 13, 5), // widthBits 1
      (17, 13, 5), // widthBits 0: just over the bundling edge
      (1, 9, 4)) // single color, maximal bundling
    for ((colors, w, h) <- cases) {
      val img = Array.tabulate(w * h) { i =>
        val c = (i * 7 + i / w) % colors
        0xff000000 | (c * 15 << 16) | (c * 9 << 8) | (c * 5)
      }
      assert(img.distinct.length <= colors)
      val payload = Vp8l.encode(w, h, img, Vp8l.VariantPalette)
      val out = Vp8l.decodeArgb(payload, 0, payload.length)
      assert(out.isDefined, s"palette decode failed ($colors colors)")
      assert(java.util.Arrays.equals(out.get._3, img),
        s"palette pixels ($colors colors, ${w}x$h)")
    }
  }

  test("2D distance table invariants + hand vectors (RFC 9649 §4.2.2)") {
    val t = Vp8l.Dist2dOffsets
    assert(t.length == 240) // 120 (dx, dy) pairs
    val pairs = (0 until 120).map(k => (t(2 * k), t(2 * k + 1)))
    assert(pairs.distinct.size == 120, "offsets must be distinct")
    // ordered by non-decreasing Euclidean distance
    val d2 = pairs.map { case (dx, dy) => dx * dx + dy * dy }
    assert(d2.zip(d2.tail).forall { case (a, b) => a <= b }, "distance order")
    // the neighborhood is above/left-of the current pixel: dy >= 0,
    // and a same-row offset must point left (dx >= 1)
    assert(pairs.forall { case (dx, dy) =>
      dy >= 0 && dy <= 7 && dx >= -7 && dx <= 8 && (dy > 0 || dx >= 1) })
    // code 1 = pixel above, code 2 = pixel to the left
    assert(pairs(0) == (0, 1) && pairs(1) == (1, 0))
    // the two largest: (8,6) then (8,7)
    assert(pairs(118) == (8, 6) && pairs(119) == (8, 7))
  }

  test("variants are bitstream-distinct but pixel-identical") {
    val img = grayImg(32, 32, 7L)
    val streams = variants.map(v => Vp8l.encode(32, 32, img, v))
    def sha(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map(x => f"$x%02x").mkString
    // the five paths genuinely differ on the wire...
    assert(streams.map(sha).distinct.size == variants.size,
      s"variant streams collided: sizes ${streams.map(_.length)}")
    // ...and all decode to the same pixels
    val pixels = streams.map(s =>
      Vp8l.decodeArgb(s, 0, s.length).get._3.toSeq.hashCode())
    assert(pixels.distinct.size == 1)
  }

  test("all 14 predictor modes roundtrip through addPixels/subPixels symmetry") {
    // encoder-side residual + decoder-side reconstruction share the
    // predict() implementation, so any mode roundtrips by construction —
    // this pins that the mode DISPATCH and border overrides stay stable
    // for the full mode range (semantics of modes 0-2 are gate-pinned
    // end-to-end by q168; 3-13 are spec-transcribed, see the scope note)
    val img = colorImg(16, 16)
    val payload = Vp8l.encode(16, 16, img, Vp8l.VariantPredictor)
    assert(Vp8l.decodeArgb(payload, 0, payload.length).get._3.toSeq == img.toSeq)
  }

  test("scope refusals return None, never garbage") {
    val img = grayImg(8, 8, 1L)
    val good = Vp8l.encode(8, 8, img, Vp8l.VariantPlain)
    // version != 0: flip the version field (bits 29-31 after signature)
    val badVer = good.clone()
    badVer(4) = (badVer(4) | 0x40).toByte // bit 29 of the LE bit stream
    assert(Vp8l.decodeArgb(badVer, 0, badVer.length).isEmpty)
    // truncation anywhere
    for (cut <- Seq(2, 5, good.length / 2, good.length - 1))
      assert(Vp8l.decodeArgb(good.take(cut), 0, cut).isEmpty)
    // bomb guard: a 16384x16384 header refuses before allocation
    val bomb = Vp8l.encode(8, 8, img, Vp8l.VariantPlain)
    assert(Vp8l.decodeArgb(bomb, 0, bomb.length, maxPixels = 63).isEmpty)
  }

  test("cache x meta interaction: hits land in BOTH entropy groups off ONE shared cache") {
    // repeated colors STRADDLE the 8px meta-block checkerboard, so a
    // pixel inserted into the cache under group 0 must hit under
    // group 1 (and vice versa) — the shared-state path a per-group
    // cache would corrupt. 32x32 with period-3 colors guarantees
    // cross-group repeats in both directions.
    val img = Array.tabulate(32 * 32) { i =>
      val c = (i % 3) * 40 + 20
      0xff000000 | (c << 16) | (c << 8) | c
    }
    val payload = Vp8l.encode(32, 32, img, Vp8l.VariantCacheMeta)
    val (w, h, px) = Vp8l.decodeArgb(payload, 0, payload.length).get
    assert(w == 32 && h == 32 && px.toSeq == img.toSeq)
    // and the interaction stream is genuinely smaller than plain
    // literals (cache symbols carry the repeats)
    val plain = Vp8l.encode(32, 32, img, Vp8l.VariantPlain)
    assert(payload.length < plain.length)
  }

  test("decodeRgb feeds the pHash plane (3-byte interleave, R channel)") {
    val img = grayImg(32, 32, 3L)
    val payload = Vp8l.encode(32, 32, img, Vp8l.VariantCache)
    val (w, h, rgb) = Vp8l.decodeRgb(payload, 0, payload.length).get
    assert(w == 32 && h == 32 && rgb.length == 32 * 32 * 3)
    var i = 0
    while (i < w * h) {
      assert((rgb(3 * i) & 0xff) == ((img(i) >>> 16) & 0xff))
      i += 1
    }
  }
}
