package graft.multimodal

/** VP8 lossy KEYFRAME pixel decode (the public RFC 6386 bitstream
  * spec) — the dominant real-world WebP flavor, previously visible
  * only as headers ([[Webp.parseWebp]]). This makes lossy-WebP
  * CONTENT visible to pHash/dedup the way [[Vp8l]] did for lossless:
  * boolean arithmetic decoder, full keyframe header (segmentation,
  * loop-filter params, token partitions, quantizers, probability
  * updates), intra prediction (16x16 DC/V/H/TM, all ten 4x4 B_PRED
  * sub-modes, 8x8 chroma), coefficient token decode with the
  * band/context discipline, inverse WHT + DCT, reconstruction, and
  * the in-loop deblocking filter (both normal and simple profiles).
  *
  * SCOPE boundary (loud refusal, never garbage): interframes (the
  * frame-tag keyframe bit), upscaling hints are ignored, and streams
  * larger than the pixel bomb guard return None.
  *
  * VERIFICATION boundary, stated plainly (the [[Vp8l]] precedent —
  * no VP8/libwebp reference codec exists in this offline
  * environment): every ALGORITHMIC layer (bool coder, transforms,
  * predictors, contexts, dequant, filter) is transcribed from the
  * RFC's normative pseudocode and pinned by hand vectors plus a
  * self-consistent fixture encoder whose output the q174 gate checks
  * against a decoder-independent closed-form pixel oracle. The
  * constant PROBABILITY tables are transcribed from the RFC text
  * from memory: [[DefaultCoeffProbs]] is a full-confidence
  * transcription; [[CoeffUpdateProbs]] and the non-[0][0] rows of
  * [[KfBmodeProb]] are best-effort and cannot be golden-tested here
  * — they affect WHICH real-world bitstreams parse bit-identically
  * to libvpx, not the gate's oracle (the gate exercises the
  * verified rows only). Replace those two tables from RFC 6386
  * §13.4/§11.4 verbatim when a verified copy is available.
  *
  * Reference behavior documented from the reference repo's opaque
  * media round-trips (s3_loader.py:33-62) — the reference never
  * decodes; the decode layer is engine-added surface. */
object Vp8 {

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ---- boolean coder (RFC 6386 §7) -------------------------------------

  /** The RFC's 8-bit-refill boolean decoder. Reads past the partition
    * end zero-fill for the encoder's trailing flush bits, but more
    * than 4 bytes of overread means the partition was truncated —
    * corrupt, not garbage. */
  private[multimodal] final class BoolDecoder(b: Array[Byte], start: Int, end: Int) {
    if (start > end) corrupt()
    private var pos = start + 2
    private var value =
      ((if (start < end) b(start) & 0xff else 0) << 8) |
        (if (start + 1 < end) b(start + 1) & 0xff else 0)
    private var range = 255
    private var bitCount = 0
    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          if (pos < end) value |= b(pos) & 0xff
          else if (pos > end + 4) corrupt() // truncated partition
          pos += 1
        }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** flag ? (sign ? -mag : mag) : 0 — the header's delta shape. */
    def signedLiteralFlagged(n: Int): Int =
      if (bool(128) == 0) 0
      else {
        val mag = literal(n)
        if (bool(128) == 1) -mag else mag
      }
    /** Token-tree read; `startIdx` 2 skips the EOB branch (the
      * no-EOB-after-zero rule). */
    def tree(t: Array[Int], probs: Array[Int], startIdx: Int = 0): Int = {
      var i = t(startIdx + bool(probs(startIdx >> 1)))
      while (i > 0) i = t(i + bool(probs(i >> 1)))
      -i
    }
  }

  /** The RFC's carry-propagating boolean encoder. */
  private[multimodal] final class BoolEncoder {
    private val out = new java.io.ByteArrayOutputStream()
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24
    private def addCarry(): Unit = {
      // propagate a carry back through emitted 0xff bytes
      val bytes = out.toByteArray
      var i = bytes.length - 1
      while (i >= 0 && (bytes(i) & 0xff) == 0xff) { bytes(i) = 0; i -= 1 }
      require(i >= 0, "carry out of the first byte")
      bytes(i) = ((bytes(i) & 0xff) + 1).toByte
      out.reset()
      out.write(bytes, 0, bytes.length)
    }
    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) addCarry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out.write(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }
    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }
    def tree(t: Array[Int], probs: Array[Int], sym: Int, startIdx: Int = 0): Unit = {
      // walk the tree to the leaf, emitting the branch bits
      val path = new scala.collection.mutable.ArrayBuffer[(Int, Int)]
      def walk(i: Int): Boolean = {
        var bit = 0
        while (bit < 2) {
          val c = t(i + bit)
          if (c <= 0) {
            if (-c == sym) { path += ((i >> 1, bit)); return true }
          } else {
            path += ((i >> 1, bit))
            if (walk(c)) return true
            path.remove(path.length - 1)
          }
          bit += 1
        }
        false
      }
      require(walk(startIdx), s"symbol $sym not in tree")
      path.foreach { case (pi, bit) => bool(probs(pi), bit) }
    }
    def flush(): Array[Byte] = {
      var i = 0
      while (i < 32) {
        if ((bottom & (1L << 31)) != 0) addCarry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out.write(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
        i += 1
      }
      out.toByteArray
    }
  }

  // ---- constant tables (RFC 6386) --------------------------------------

  // quantizer lookups (§14.1)
  private val DcQLookup = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)
  private val AcQLookup = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  // coefficient-to-band map and zigzag scan (§13.3)
  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private[multimodal] val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // token tree (§13.2): tokens 0..10 are DCT_0..cat6, 11 is EOB
  private val TokEob = 11
  private val CoeffTree = Array(
    -TokEob, 2,
    0 /* -DCT_0 */, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6, // cat1, cat2
    18, 20,
    -7, -8, // cat3, cat4
    -9, -10) // cat5, cat6
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  // keyframe mode trees + probs (§11.2/§11.3)
  private val YModeB = 0 // B_PRED
  private val YModeDc = 1
  private val YModeV = 2
  private val YModeH = 3
  private val YModeTm = 4
  private val KfYmodeTree = Array(-YModeB, 2, 4, 6, -YModeDc, -YModeV, -YModeH, -YModeTm)
  private val KfYmodeProb = Array(145, 156, 163, 128)
  private val UvDc = 0
  private val UvV = 1
  private val UvH = 2
  private val UvTm = 3
  private val UvModeTree = Array(-UvDc, 2, -UvV, 4, -UvH, -UvTm)
  private val KfUvProb = Array(142, 114, 183)

  // 4x4 sub-modes (§11.4): B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR,
  // B_VL, B_HD, B_HU
  private val BDc = 0
  private val BTm = 1
  private val BVe = 2
  private val BHe = 3
  private val BLd = 4
  private val BRd = 5
  private val BVr = 6
  private val BVl = 7
  private val BHd = 8
  private val BHu = 9
  private val BmodeTree = Array(
    -BDc, 2,
    -BTm, 4,
    -BVe, 6,
    8, 12,
    -BHe, 10,
    -BRd, -BVr,
    -BLd, 14,
    -BVl, 16,
    -BHd, -BHu)

  /** kf_bmode_prob[above][left][9]. VERIFIED recall: the [0][0] row
    * (all the fixture corpus codes — every gated sub-mode is B_DC
    * with B_DC neighbors). The other 99 context rows CANNOT be
    * golden-tested offline and default to the [0][0] row — a real
    * stream coding non-B_DC contexts may misparse until this table
    * is replaced verbatim from RFC 6386 §11.4 (see the object
    * scope note). */
  private val KfBmodeProb: Array[Array[Array[Int]]] = {
    val dcdc = Array(231, 120, 48, 89, 115, 113, 120, 152, 112)
    Array.fill(10, 10)(dcdc)
  }

  /** default_coeff_probs[4][8][3][11] (§13.5), transcribed from the
    * RFC table. Indexing: [block type][band][context][token]. */
  private val DefaultCoeffProbs: Array[Array[Array[Array[Int]]]] = Array(
    // block type 0: luma after Y2 (first coefficient is index 1)
    Array(
      Array(Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(Array(253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
        Array(189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
        Array(106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128)),
      Array(Array(1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
        Array(181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
        Array(78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128)),
      Array(Array(1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
        Array(184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
        Array(77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128)),
      Array(Array(1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
        Array(170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
        Array(37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128)),
      Array(Array(1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
        Array(207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
        Array(102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128)),
      Array(Array(1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
        Array(177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
        Array(80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128)),
      Array(Array(1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128),
        Array(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128))),
    // block type 1: Y2
    Array(
      Array(Array(198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
        Array(131, 45, 198, 221, 172, 217, 229, 255, 240, 128, 128),
        Array(68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128)),
      Array(Array(1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
        Array(184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
        Array(81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128)),
      Array(Array(1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
        Array(99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
        Array(23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128)),
      Array(Array(1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
        Array(109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
        Array(44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128)),
      Array(Array(1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
        Array(94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
        Array(22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128)),
      Array(Array(1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
        Array(124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
        Array(35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128)),
      Array(Array(1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
        Array(121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
        Array(45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128)),
      Array(Array(1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
        Array(203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        Array(137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128))),
    // block type 2: chroma
    Array(
      Array(Array(253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
        Array(175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
        Array(73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128)),
      Array(Array(1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
        Array(239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
        Array(155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128)),
      Array(Array(1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
        Array(201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
        Array(69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128)),
      Array(Array(1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
        Array(223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
        Array(141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128)),
      Array(Array(1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        Array(190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
        Array(149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(Array(1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(Array(1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
        Array(213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
        Array(55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128))),
    // block type 3: luma with DC (B_PRED macroblocks)
    Array(
      Array(Array(202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
        Array(126, 38, 166, 203, 127, 159, 179, 149, 231, 226, 255),
        Array(61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128)),
      Array(Array(1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
        Array(166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128),
        Array(39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128)),
      Array(Array(1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
        Array(124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
        Array(24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128)),
      Array(Array(1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
        Array(149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
        Array(28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128)),
      Array(Array(1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
        Array(123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
        Array(20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128)),
      Array(Array(1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
        Array(168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
        Array(47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128)),
      Array(Array(1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
        Array(141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
        Array(42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128)),
      Array(Array(1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        Array(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128))))

  /** coeff_update_probs[4][8][3][11] (§13.4). The table is
    * overwhelmingly 255 in the RFC; the handful of sub-255 entries
    * (concentrated in the first bands) cannot be verified offline,
    * so this transcription pins ALL entries at 255 and documents the
    * divergence loudly — a real stream that updates coefficient
    * probabilities still parses (flag bits decode with a different
    * probability but identical layout) ONLY if the encoder used the
    * same table; see the object scope note. The fixture encoder
    * sends every flag as 0, which round-trips under any shared
    * table. */
  private val CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.fill(4, 8, 3, 11)(255)

  // ---- inverse transforms (§14.3, §14.4) --------------------------------

  private val CosPi8Sqrt2Minus1 = 20091
  private val SinPi8Sqrt2 = 35468

  /** 4x4 inverse DCT, in-place on a 16-int raster block. */
  private[multimodal] def idct4x4(ip: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = ip(i) + ip(i + 8)
      val b1 = ip(i) - ip(i + 8)
      var t1 = (ip(i + 4) * SinPi8Sqrt2) >> 16
      var t2 = ip(i + 12) + ((ip(i + 12) * CosPi8Sqrt2Minus1) >> 16)
      val c1 = t1 - t2
      t1 = ip(i + 4) + ((ip(i + 4) * CosPi8Sqrt2Minus1) >> 16)
      t2 = (ip(i + 12) * SinPi8Sqrt2) >> 16
      val d1 = t1 + t2
      tmp(i) = a1 + d1
      tmp(i + 12) = a1 - d1
      tmp(i + 4) = b1 + c1
      tmp(i + 8) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows, with the final (x + 4) >> 3
      val o = 4 * i
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      var t1 = (tmp(o + 1) * SinPi8Sqrt2) >> 16
      var t2 = tmp(o + 3) + ((tmp(o + 3) * CosPi8Sqrt2Minus1) >> 16)
      val c1 = t1 - t2
      t1 = tmp(o + 1) + ((tmp(o + 1) * CosPi8Sqrt2Minus1) >> 16)
      t2 = (tmp(o + 3) * SinPi8Sqrt2) >> 16
      val d1 = t1 + t2
      ip(o) = (a1 + d1 + 4) >> 3
      ip(o + 3) = (a1 - d1 + 4) >> 3
      ip(o + 1) = (b1 + c1 + 4) >> 3
      ip(o + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  /** 4x4 inverse Walsh-Hadamard (the Y2 block), in-place. */
  private[multimodal] def iwht4x4(ip: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = ip(i) + ip(i + 12)
      val b1 = ip(i + 4) + ip(i + 8)
      val c1 = ip(i + 4) - ip(i + 8)
      val d1 = ip(i) - ip(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows, with the final (x + 3) >> 3
      val o = 4 * i
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      ip(o) = (a1 + b1 + 3) >> 3
      ip(o + 1) = (c1 + d1 + 3) >> 3
      ip(o + 2) = (a1 - b1 + 3) >> 3
      ip(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** Forward Walsh for the fixture encoder's Y2 preimage: W such that
    * iwht(W(o) / 2 coefficients...) — see [[encode]]. Plain ±1 Walsh,
    * W·W = 16·I. */
  private[multimodal] def fwht4x4(o: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns (the iwht's butterfly, unscaled)
      val a = o(i) + o(i + 12)
      val b = o(i + 4) + o(i + 8)
      val c = o(i + 4) - o(i + 8)
      val d = o(i) - o(i + 12)
      t(i) = a + b; t(i + 4) = c + d; t(i + 8) = a - b; t(i + 12) = d - c
      i += 1
    }
    val x = new Array[Int](16)
    i = 0
    while (i < 4) {
      val p = 4 * i
      val a = t(p) + t(p + 3)
      val b = t(p + 1) + t(p + 2)
      val c = t(p + 1) - t(p + 2)
      val d = t(p) - t(p + 3)
      x(p) = a + b; x(p + 1) = c + d; x(p + 2) = a - b; x(p + 3) = d - c
      i += 1
    }
    x
  }

  // ---- planes with prediction borders -----------------------------------

  /** Reconstruction plane: one fake row above (127), one fake column
    * left (129), 4 extra columns right (above-right reads; refreshed
    * to edge-replicas as rows reconstruct, the libvpx border rule). */
  private[multimodal] final class Plane(val w: Int, val h: Int) {
    val bw = w + 5
    val buf = new Array[Int](bw * (h + 1))
    java.util.Arrays.fill(buf, 127)
    locally {
      var i = 0
      while (i < h) { buf((i + 1) * bw) = 129; i += 1 }
    }
    def apply(x: Int, y: Int): Int = buf((y + 1) * bw + (x + 1))
    def update(x: Int, y: Int, v: Int): Unit = buf((y + 1) * bw + (x + 1)) = v
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- intra prediction (RFC 6386 SS12) ---------------------------------

  /** Whole-block DC/V/H/TM for 16x16 luma and 8x8 chroma. DC applies
    * the availability rules; V/H/TM read the fake borders directly. */
  private def predictFull(mode: Int, p: Plane, x0: Int, y0: Int,
      size: Int, out: Array[Int]): Unit = {
    val haveA = y0 > 0
    val haveL = x0 > 0
    mode match {
      case YModeDc =>
        var dc = 0
        if (haveA || haveL) {
          // shift = log2(#samples): 16x16 one side (sum+8)>>4, both
          // (sum+16)>>5; 8x8 one side (sum+4)>>3, both (sum+8)>>4
          var shift = if (size == 16) 4 else 3
          var sum = 0
          if (haveA) { var i = 0; while (i < size) { sum += p(x0 + i, y0 - 1); i += 1 } }
          if (haveL) { var i = 0; while (i < size) { sum += p(x0 - 1, y0 + i); i += 1 } }
          if (haveA && haveL) shift += 1
          dc = (sum + (1 << (shift - 1))) >> shift
        } else dc = 128
        java.util.Arrays.fill(out, dc)
      case YModeV =>
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) { out(y * size + x) = p(x0 + x, y0 - 1); x += 1 }
          y += 1
        }
      case YModeH =>
        var y = 0
        while (y < size) {
          val v = p(x0 - 1, y0 + y)
          var x = 0
          while (x < size) { out(y * size + x) = v; x += 1 }
          y += 1
        }
      case _ => // TM
        val c = p(x0 - 1, y0 - 1)
        var y = 0
        while (y < size) {
          val lv = p(x0 - 1, y0 + y)
          var x = 0
          while (x < size) {
            out(y * size + x) = clamp255(lv + p(x0 + x, y0 - 1) - c)
            x += 1
          }
          y += 1
        }
    }
  }

  /** 4x4 sub-mode prediction. `ar` carries the 4 above-right pixels
    * (the caller owns the MB-edge rules). B_DC/B_TM/B_VE/B_HE/B_LD/
    * B_RD follow the RFC taps; B_VR/B_VL/B_HD/B_HU are the shared
    * H.264-family taps (best-effort transcription — not exercised by
    * the gated fixtures; see the object scope note). */
  private def predict4x4(mode: Int, p: Plane, x0: Int, y0: Int,
      ar: Array[Int], out: Array[Int]): Unit = {
    val a = new Array[Int](8)
    var i = 0
    while (i < 4) { a(i) = p(x0 + i, y0 - 1); a(4 + i) = ar(i); i += 1 }
    val lft = Array(p(x0 - 1, y0), p(x0 - 1, y0 + 1), p(x0 - 1, y0 + 2), p(x0 - 1, y0 + 3))
    val c = p(x0 - 1, y0 - 1)
    def set(r: Int, cc: Int, v: Int): Unit = out(4 * r + cc) = v
    mode match {
      case BDc =>
        val dc = (a(0) + a(1) + a(2) + a(3) + lft(0) + lft(1) + lft(2) + lft(3) + 4) >> 3
        java.util.Arrays.fill(out, dc)
      case BTm =>
        var r = 0
        while (r < 4) {
          var cc = 0
          while (cc < 4) { set(r, cc, clamp255(lft(r) + a(cc) - c)); cc += 1 }
          r += 1
        }
      case BVe =>
        val row = Array(
          (c + 2 * a(0) + a(1) + 2) >> 2,
          (a(0) + 2 * a(1) + a(2) + 2) >> 2,
          (a(1) + 2 * a(2) + a(3) + 2) >> 2,
          (a(2) + 2 * a(3) + a(4) + 2) >> 2)
        var r = 0
        while (r < 4) { System.arraycopy(row, 0, out, 4 * r, 4); r += 1 }
      case BHe =>
        val col = Array(
          (c + 2 * lft(0) + lft(1) + 2) >> 2,
          (lft(0) + 2 * lft(1) + lft(2) + 2) >> 2,
          (lft(1) + 2 * lft(2) + lft(3) + 2) >> 2,
          (lft(2) + 2 * lft(3) + lft(3) + 2) >> 2)
        var r = 0
        while (r < 4) { var cc = 0; while (cc < 4) { set(r, cc, col(r)); cc += 1 }; r += 1 }
      case BLd =>
        def f(i2: Int): Int =
          if (i2 < 6) (a(i2) + 2 * a(i2 + 1) + a(i2 + 2) + 2) >> 2
          else (a(6) + 3 * a(7) + 2) >> 2
        var r = 0
        while (r < 4) { var cc = 0; while (cc < 4) { set(r, cc, f(r + cc)); cc += 1 }; r += 1 }
      case BRd =>
        val e = Array(lft(3), lft(2), lft(1), lft(0), c, a(0), a(1), a(2), a(3))
        def g(i2: Int): Int = (e(i2 - 1) + 2 * e(i2) + e(i2 + 1) + 2) >> 2
        var r = 0
        while (r < 4) { var cc = 0; while (cc < 4) { set(r, cc, g(4 + cc - r)); cc += 1 }; r += 1 }
      case BVr =>
        set(0, 0, (c + a(0) + 1) >> 1); set(0, 1, (a(0) + a(1) + 1) >> 1)
        set(0, 2, (a(1) + a(2) + 1) >> 1); set(0, 3, (a(2) + a(3) + 1) >> 1)
        set(1, 0, (lft(0) + 2 * c + a(0) + 2) >> 2)
        set(1, 1, (c + 2 * a(0) + a(1) + 2) >> 2)
        set(1, 2, (a(0) + 2 * a(1) + a(2) + 2) >> 2)
        set(1, 3, (a(1) + 2 * a(2) + a(3) + 2) >> 2)
        set(2, 0, (c + 2 * lft(0) + lft(1) + 2) >> 2)
        set(2, 1, out(0)); set(2, 2, out(1)); set(2, 3, out(2))
        set(3, 0, (lft(0) + 2 * lft(1) + lft(2) + 2) >> 2)
        set(3, 1, out(4)); set(3, 2, out(5)); set(3, 3, out(6))
      case BVl =>
        set(0, 0, (a(0) + a(1) + 1) >> 1); set(0, 1, (a(1) + a(2) + 1) >> 1)
        set(0, 2, (a(2) + a(3) + 1) >> 1); set(0, 3, (a(3) + a(4) + 1) >> 1)
        set(1, 0, (a(0) + 2 * a(1) + a(2) + 2) >> 2)
        set(1, 1, (a(1) + 2 * a(2) + a(3) + 2) >> 2)
        set(1, 2, (a(2) + 2 * a(3) + a(4) + 2) >> 2)
        set(1, 3, (a(3) + 2 * a(4) + a(5) + 2) >> 2)
        set(2, 0, out(1)); set(2, 1, out(2)); set(2, 2, out(3))
        set(2, 3, (a(4) + 2 * a(5) + a(6) + 2) >> 2)
        set(3, 0, out(5)); set(3, 1, out(6)); set(3, 2, out(7))
        set(3, 3, (a(5) + 2 * a(6) + a(7) + 2) >> 2)
      case BHd =>
        set(0, 0, (c + lft(0) + 1) >> 1)
        set(0, 1, (lft(0) + 2 * c + a(0) + 2) >> 2)
        set(0, 2, (c + 2 * a(0) + a(1) + 2) >> 2)
        set(0, 3, (a(0) + 2 * a(1) + a(2) + 2) >> 2)
        set(1, 0, (lft(0) + lft(1) + 1) >> 1)
        set(1, 1, (c + 2 * lft(0) + lft(1) + 2) >> 2)
        set(1, 2, out(0)); set(1, 3, out(1))
        set(2, 0, (lft(1) + lft(2) + 1) >> 1)
        set(2, 1, (lft(0) + 2 * lft(1) + lft(2) + 2) >> 2)
        set(2, 2, out(4)); set(2, 3, out(5))
        set(3, 0, (lft(2) + lft(3) + 1) >> 1)
        set(3, 1, (lft(1) + 2 * lft(2) + lft(3) + 2) >> 2)
        set(3, 2, out(8)); set(3, 3, out(9))
      case BHu =>
        set(0, 0, (lft(0) + lft(1) + 1) >> 1)
        set(0, 1, (lft(0) + 2 * lft(1) + lft(2) + 2) >> 2)
        set(0, 2, (lft(1) + lft(2) + 1) >> 1)
        set(0, 3, (lft(1) + 2 * lft(2) + lft(3) + 2) >> 2)
        set(1, 0, out(2)); set(1, 1, out(3))
        set(1, 2, (lft(2) + lft(3) + 1) >> 1)
        set(1, 3, (lft(2) + 3 * lft(3) + 2) >> 2)
        set(2, 0, out(6)); set(2, 1, out(7))
        set(2, 2, lft(3)); set(2, 3, lft(3))
        set(3, 0, lft(3)); set(3, 1, lft(3)); set(3, 2, lft(3)); set(3, 3, lft(3))
      case _ => corrupt()
    }
  }

  // ---- coefficient token decode (RFC 6386 SS13) --------------------------

  /** Decode one block's tokens into `out` (raster order, dequantized).
    * Returns the final scan position (nz context = pos > firstCoeff). */
  private def decodeBlockCoeffs(bd: BoolDecoder,
      probs: Array[Array[Array[Array[Int]]]], typ: Int, firstCoeff: Int,
      ctx0: Int, dqDc: Int, dqAc: Int, out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0)
    var cpos = firstCoeff
    var ctx = ctx0
    var prevZero = false
    var done = false
    while (cpos < 16 && !done) {
      val pr = probs(typ)(CoeffBands(cpos))(ctx)
      val tok = bd.tree(CoeffTree, pr, if (prevZero) 2 else 0)
      if (tok == TokEob) done = true
      else if (tok == 0) { ctx = 0; prevZero = true; cpos += 1 }
      else {
        var v = 0
        if (tok <= 4) v = tok
        else {
          val cat = tok - 5
          v = CatBase(cat)
          val cp = CatProbs(cat)
          var i = 0
          var extra = 0
          while (i < cp.length) { extra = (extra << 1) | bd.bool(cp(i)); i += 1 }
          v += extra
        }
        ctx = if (v == 1) 1 else 2
        prevZero = false
        if (bd.bool(128) == 1) v = -v
        out(Zigzag(cpos)) = v * (if (cpos == 0) dqDc else dqAc)
        cpos += 1
      }
    }
    cpos
  }

  // ---- loop filter (RFC 6386 SS15) ---------------------------------------

  private def s8(v: Int): Int = v - 128
  private def cl(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** p/q are signed (u-128) pixel values across one edge position;
    * returns the filtered (p1,p0,q0,q1) plus the outer-adjust value. */
  private def commonAdjust(useOuter: Boolean, px: Array[Int]): Int = {
    // px = (p1, p0, q0, q1), signed
    val a0 = cl((if (useOuter) cl(px(0) - px(3)) else 0) + 3 * (px(2) - px(1)))
    val f = cl(a0 + 4) >> 3
    val e = cl(a0 + 3) >> 3
    px(2) = cl(px(2) - f)
    px(1) = cl(px(1) + e)
    f
  }

  private def hevOk(thresh: Int, p1: Int, p0: Int, q0: Int, q1: Int): Boolean =
    math.abs(p1 - p0) > thresh || math.abs(q1 - q0) > thresh

  private def filterMask(interior: Int, edge: Int, v: Array[Int]): Boolean = {
    // v = p3 p2 p1 p0 q0 q1 q2 q3 (signed)
    math.abs(v(3) - v(4)) * 2 + math.abs(v(2) - v(5)) / 2 <= edge &&
      math.abs(v(0) - v(1)) <= interior && math.abs(v(1) - v(2)) <= interior &&
      math.abs(v(2) - v(3)) <= interior && math.abs(v(5) - v(4)) <= interior &&
      math.abs(v(6) - v(5)) <= interior && math.abs(v(7) - v(6)) <= interior
  }

  /** Normal-profile subblock filter on one 8-pixel edge cut. */
  private[multimodal] def subblockFilter(hevT: Int, interior: Int, edge: Int,
      v: Array[Int]): Unit = {
    if (filterMask(interior, edge, v)) {
      val hev = hevOk(hevT, v(2), v(3), v(4), v(5))
      val px = Array(v(2), v(3), v(4), v(5))
      var a0 = commonAdjust(hev, px)
      v(3) = px(1); v(4) = px(2)
      if (!hev) {
        a0 = (a0 + 1) >> 1
        v(5) = cl(v(5) - a0)
        v(2) = cl(v(2) + a0)
      }
    }
  }

  /** Normal-profile macroblock-edge filter on one 8-pixel edge cut. */
  private[multimodal] def mbFilter(hevT: Int, interior: Int, edge: Int,
      v: Array[Int]): Unit = {
    if (filterMask(interior, edge, v)) {
      if (hevOk(hevT, v(2), v(3), v(4), v(5))) {
        val px = Array(v(2), v(3), v(4), v(5))
        commonAdjust(true, px)
        v(3) = px(1); v(4) = px(2)
      } else {
        val w = cl(cl(v(2) - v(5)) + 3 * (v(4) - v(3)))
        var a0 = cl((27 * w + 63) >> 7)
        v(4) = cl(v(4) - a0); v(3) = cl(v(3) + a0)
        a0 = cl((18 * w + 63) >> 7)
        v(5) = cl(v(5) - a0); v(2) = cl(v(2) + a0)
        a0 = cl((9 * w + 63) >> 7)
        v(6) = cl(v(6) - a0); v(1) = cl(v(1) + a0)
      }
    }
  }

  /** Simple-profile filter (luma only): p0/q0 adjust when the 2-tap
    * edge measure passes. */
  private[multimodal] def simpleFilter(edge: Int, v: Array[Int]): Unit = {
    if (math.abs(v(3) - v(4)) * 2 + math.abs(v(2) - v(5)) / 2 <= edge) {
      val px = Array(v(2), v(3), v(4), v(5))
      commonAdjust(true, px)
      v(3) = px(1); v(4) = px(2)
    }
  }

  private def lfInteriorLimit(level: Int, sharpness: Int): Int = {
    var interior = level
    if (sharpness > 0) {
      interior >>= (if (sharpness > 4) 2 else 1)
      if (interior > 9 - sharpness) interior = 9 - sharpness
    }
    if (interior < 1) interior = 1
    interior
  }

  private def lfHevThreshold(level: Int): Int =
    if (level >= 40) 2 else if (level >= 15) 1 else 0

  /** Apply one filter op across an edge of `count` positions.
    * vertical=true filters a vertical edge (pixels vary in x). */
  private def filterEdge(p: Plane, ex: Int, ey: Int, count: Int,
      vertical: Boolean, op: Array[Int] => Unit): Unit = {
    val v = new Array[Int](8)
    var k = 0
    while (k < count) {
      var i = 0
      while (i < 8) {
        v(i) =
          if (vertical) s8(p(ex - 4 + i, ey + k))
          else s8(p(ex + k, ey - 4 + i))
        i += 1
      }
      op(v)
      i = 0
      while (i < 8) {
        val u = v(i) + 128
        if (vertical) p(ex - 4 + i, ey + k) = u
        else p(ex + k, ey - 4 + i) = u
        i += 1
      }
      k += 1
    }
  }

  // ---- keyframe decode (RFC 6386 SS9-SS14) -------------------------------

  /** Per-frame parse state handed from the header to the MB loops. */
  private final class FrameHeader(
      val w: Int, val h: Int, val mbW: Int, val mbH: Int,
      val filterType: Int, val filterLevel: Int, val sharpness: Int,
      val lfDeltaEnabled: Boolean, val refDeltas: Array[Int],
      val modeDeltas: Array[Int],
      val segEnabled: Boolean, val segAbs: Boolean,
      val segQuant: Array[Int], val segLf: Array[Int],
      val qIndex: Int, val yDcDelta: Int, val y2DcDelta: Int,
      val y2AcDelta: Int, val uvDcDelta: Int, val uvAcDelta: Int,
      val probs: Array[Array[Array[Array[Int]]]],
      val mbNoSkip: Boolean, val skipProb: Int)

  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  /** The six dequant factors for a segment. */
  private def dequantFactors(fh: FrameHeader, segment: Int): Array[Int] = {
    val base =
      if (!fh.segEnabled) fh.qIndex
      else if (fh.segAbs) fh.segQuant(segment)
      else fh.qIndex + fh.segQuant(segment)
    val q = clampQ(base)
    val y1dc = DcQLookup(clampQ(q + fh.yDcDelta))
    val y1ac = AcQLookup(q)
    val y2dc = DcQLookup(clampQ(q + fh.y2DcDelta)) * 2
    var y2ac = AcQLookup(clampQ(q + fh.y2AcDelta)) * 155 / 100
    if (y2ac < 8) y2ac = 8
    var uvdc = DcQLookup(clampQ(q + fh.uvDcDelta))
    if (uvdc > 132) uvdc = 132
    val uvac = AcQLookup(clampQ(q + fh.uvAcDelta))
    Array(y1dc, y1ac, y2dc, y2ac, uvdc, uvac)
  }

  private val SegTree = Array(2, 4, 0 /* -0 */, -1, -2, -3)
  private val Implied16Bmode = Array(BDc, BDc, BVe, BHe, BTm) // by ymode

  /** Decode a keyframe to (w, h, Y, U, V) planes (cropped, row-major;
    * chroma dims are the 4:2:0 halves). None on corruption or a
    * documented scope refusal (interframes, bomb guard). */
  def decodeKeyframe(b: Array[Byte], off: Int, len: Int,
      maxPixels: Int = 1 << 24): Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    try {
      if (b == null || len < 10 || off < 0 || off.toLong + len > b.length)
        return None
      val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16)
      if ((tag & 1) != 0) return None // SCOPE: interframes refuse loudly
      val firstPartSize = tag >>> 5
      if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
          (b(off + 5) & 0xff) != 0x2a) return None
      val w = ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
      val h = ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
      if (w == 0 || h == 0) return None
      val mbW = (w + 15) >> 4
      val mbH = (h + 15) >> 4
      if (mbW.toLong * mbH * 256L > maxPixels) return None // bomb guard
      if (10L + firstPartSize > len) return None
      val bd = new BoolDecoder(b, off + 10, off + 10 + firstPartSize)

      bd.bool(128) // color space (0 = YCbCr per spec)
      bd.bool(128) // clamping type
      val segEnabled = bd.bool(128) == 1
      var segAbs = false
      var updateMap = false
      val segQuant = new Array[Int](4)
      val segLf = new Array[Int](4)
      val segTreeProbs = Array(255, 255, 255)
      if (segEnabled) {
        updateMap = bd.bool(128) == 1
        val updateData = bd.bool(128) == 1
        if (updateData) {
          segAbs = bd.bool(128) == 1
          var i = 0
          while (i < 4) { segQuant(i) = bd.signedLiteralFlagged(7); i += 1 }
          i = 0
          while (i < 4) { segLf(i) = bd.signedLiteralFlagged(6); i += 1 }
        }
        if (updateMap) {
          var i = 0
          while (i < 3) {
            if (bd.bool(128) == 1) segTreeProbs(i) = bd.literal(8)
            i += 1
          }
        }
      }
      val filterType = bd.bool(128)
      val filterLevel = bd.literal(6)
      val sharpness = bd.literal(3)
      val lfDeltaEnabled = bd.bool(128) == 1
      val refDeltas = new Array[Int](4)
      val modeDeltas = new Array[Int](4)
      if (lfDeltaEnabled && bd.bool(128) == 1) {
        var i = 0
        while (i < 4) { refDeltas(i) = bd.signedLiteralFlagged(6); i += 1 }
        i = 0
        while (i < 4) { modeDeltas(i) = bd.signedLiteralFlagged(6); i += 1 }
      }
      val nParts = 1 << bd.literal(2)
      val qIndex = bd.literal(7)
      val yDcDelta = bd.signedLiteralFlagged(4)
      val y2DcDelta = bd.signedLiteralFlagged(4)
      val y2AcDelta = bd.signedLiteralFlagged(4)
      val uvDcDelta = bd.signedLiteralFlagged(4)
      val uvAcDelta = bd.signedLiteralFlagged(4)
      bd.bool(128) // refresh_entropy_probs
      val probs = Array.tabulate(4, 8, 3, 11)((i, j, k, l) =>
        DefaultCoeffProbs(i)(j)(k)(l))
      var i4 = 0
      while (i4 < 4) {
        var j = 0
        while (j < 8) {
          var k = 0
          while (k < 3) {
            var l = 0
            while (l < 11) {
              if (bd.bool(CoeffUpdateProbs(i4)(j)(k)(l)) == 1)
                probs(i4)(j)(k)(l) = bd.literal(8)
              l += 1
            }
            k += 1
          }
          j += 1
        }
        i4 += 1
      }
      val mbNoSkip = bd.bool(128) == 1
      val skipProb = if (mbNoSkip) bd.literal(8) else 0
      val fh = new FrameHeader(w, h, mbW, mbH, filterType, filterLevel,
        sharpness, lfDeltaEnabled, refDeltas, modeDeltas, segEnabled,
        segAbs, segQuant, segLf, qIndex, yDcDelta, y2DcDelta, y2AcDelta,
        uvDcDelta, uvAcDelta, probs, mbNoSkip, skipProb)

      // token partitions: size table after the first partition
      val sizesOff = off + 10 + firstPartSize
      if (sizesOff + 3L * (nParts - 1) > off + len) return None
      val partStart = new Array[Int](nParts)
      val partEnd = new Array[Int](nParts)
      var pp = sizesOff + 3 * (nParts - 1)
      var pi = 0
      while (pi < nParts) {
        val sz =
          if (pi == nParts - 1) off + len - pp
          else (b(sizesOff + 3 * pi) & 0xff) |
            ((b(sizesOff + 3 * pi + 1) & 0xff) << 8) |
            ((b(sizesOff + 3 * pi + 2) & 0xff) << 16)
        if (sz < 0 || pp + sz > off + len) return None
        partStart(pi) = pp
        partEnd(pi) = pp + sz
        pp += sz
        pi += 1
      }
      val tokenBd = Array.tabulate(nParts)(i =>
        new BoolDecoder(b, partStart(i), partEnd(i)))

      // ---- mode pass (first partition, raster order) --------------------
      val nMb = mbW * mbH
      val ymodes = new Array[Int](nMb)
      val uvmodes = new Array[Int](nMb)
      val bmodes = new Array[Int](nMb * 16)
      val skips = new Array[Boolean](nMb)
      val segments = new Array[Int](nMb)
      val aboveBm = Array.fill(4 * mbW)(BDc)
      var mby = 0
      while (mby < mbH) {
        val leftBm = Array.fill(4)(BDc)
        var mbx = 0
        while (mbx < mbW) {
          val mi = mby * mbW + mbx
          if (segEnabled && updateMap)
            segments(mi) = bd.tree(SegTree, segTreeProbs)
          if (mbNoSkip) skips(mi) = bd.bool(skipProb) == 1
          val ym = bd.tree(KfYmodeTree, KfYmodeProb)
          ymodes(mi) = ym
          if (ym == YModeB) {
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val am = if (r == 0) aboveBm(4 * mbx + c) else bmodes(mi * 16 + 4 * (r - 1) + c)
                val lm = if (c == 0) leftBm(r) else bmodes(mi * 16 + 4 * r + c - 1)
                bmodes(mi * 16 + 4 * r + c) = bd.tree(BmodeTree, KfBmodeProb(am)(lm))
                c += 1
              }
              r += 1
            }
          } else {
            val imp = Implied16Bmode(ym)
            java.util.Arrays.fill(bmodes, mi * 16, mi * 16 + 16, imp)
          }
          uvmodes(mi) = bd.tree(UvModeTree, KfUvProb)
          var c = 0
          while (c < 4) {
            aboveBm(4 * mbx + c) = bmodes(mi * 16 + 12 + c)
            leftBm(c) = bmodes(mi * 16 + 4 * c + 3)
            c += 1
          }
          mbx += 1
        }
        mby += 1
      }

      // ---- residual + reconstruction pass --------------------------------
      val py = new Plane(mbW * 16, mbH * 16)
      val pu = new Plane(mbW * 8, mbH * 8)
      val pv = new Plane(mbW * 8, mbH * 8)
      val aboveYnz = new Array[Boolean](4 * mbW)
      val aboveUnz = new Array[Boolean](2 * mbW)
      val aboveVnz = new Array[Boolean](2 * mbW)
      val aboveY2nz = new Array[Boolean](mbW)
      val mbHasCoeffs = new Array[Boolean](nMb)
      val yCoeffs = Array.ofDim[Int](16, 16)
      val uCoeffs = Array.ofDim[Int](4, 16)
      val vCoeffs = Array.ofDim[Int](4, 16)
      val y2Coeffs = new Array[Int](16)
      val pred = new Array[Int](256)
      val pred4 = new Array[Int](16)
      val ar = new Array[Int](4)
      mby = 0
      while (mby < mbH) {
        val leftYnz = new Array[Boolean](4)
        val leftUnz = new Array[Boolean](2)
        val leftVnz = new Array[Boolean](2)
        var leftY2nz = false
        val tbd = tokenBd(mby % nParts)
        var mbx = 0
        while (mbx < mbW) {
          val mi = mby * mbW + mbx
          val ym = ymodes(mi)
          val hasY2 = ym != YModeB
          val dq = dequantFactors(fh, segments(mi))
          var hasCoeffs = false
          if (skips(mi)) {
            var i = 0
            while (i < 16) { java.util.Arrays.fill(yCoeffs(i), 0); i += 1 }
            i = 0
            while (i < 4) {
              java.util.Arrays.fill(uCoeffs(i), 0)
              java.util.Arrays.fill(vCoeffs(i), 0)
              i += 1
            }
            java.util.Arrays.fill(y2Coeffs, 0)
            i = 0
            while (i < 4) {
              leftYnz(i) = false
              aboveYnz(4 * mbx + i) = false
              i += 1
            }
            i = 0
            while (i < 2) {
              leftUnz(i) = false; aboveUnz(2 * mbx + i) = false
              leftVnz(i) = false; aboveVnz(2 * mbx + i) = false
              i += 1
            }
            if (hasY2) { leftY2nz = false; aboveY2nz(mbx) = false }
          } else {
            if (hasY2) {
              val ctx = (if (leftY2nz) 1 else 0) + (if (aboveY2nz(mbx)) 1 else 0)
              val pos = decodeBlockCoeffs(tbd, probs, 1, 0, ctx, dq(2), dq(3), y2Coeffs)
              val nz = pos > 0
              leftY2nz = nz
              aboveY2nz(mbx) = nz
              if (nz) hasCoeffs = true
              iwht4x4(y2Coeffs)
            }
            val typ = if (hasY2) 0 else 3
            val first = if (hasY2) 1 else 0
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val ctx = (if (leftYnz(r)) 1 else 0) + (if (aboveYnz(4 * mbx + c)) 1 else 0)
                val out = yCoeffs(4 * r + c)
                val pos = decodeBlockCoeffs(tbd, probs, typ, first, ctx, dq(0), dq(1), out)
                if (hasY2) out(0) = y2Coeffs(4 * r + c)
                val nz = pos > first
                leftYnz(r) = nz
                aboveYnz(4 * mbx + c) = nz
                if (nz) hasCoeffs = true
                c += 1
              }
              r += 1
            }
            r = 0
            while (r < 2) {
              var c = 0
              while (c < 2) {
                var ctx = (if (leftUnz(r)) 1 else 0) + (if (aboveUnz(2 * mbx + c)) 1 else 0)
                var pos = decodeBlockCoeffs(tbd, probs, 2, 0, ctx, dq(4), dq(5), uCoeffs(2 * r + c))
                var nz = pos > 0
                leftUnz(r) = nz; aboveUnz(2 * mbx + c) = nz
                if (nz) hasCoeffs = true
                ctx = (if (leftVnz(r)) 1 else 0) + (if (aboveVnz(2 * mbx + c)) 1 else 0)
                pos = decodeBlockCoeffs(tbd, probs, 2, 0, ctx, dq(4), dq(5), vCoeffs(2 * r + c))
                nz = pos > 0
                leftVnz(r) = nz; aboveVnz(2 * mbx + c) = nz
                if (nz) hasCoeffs = true
                c += 1
              }
              r += 1
            }
            // in 16x16 modes the Y2 DC rides into every luma block, so
            // an all-EOB luma set still reconstructs from Y2 (handled
            // above by out(0) = wht output)
          }
          mbHasCoeffs(mi) = hasCoeffs
          // ---- reconstruct ------------------------------------------------
          val x0 = mbx * 16
          val y0 = mby * 16
          if (ym == YModeB) {
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val bx = x0 + 4 * c
                val by = y0 + 4 * r
                // above-right: row-0 subblocks read the row above the MB;
                // right-edge subblocks in rows 1-3 reuse the MB's own
                // top-right above-right (the spec rule)
                var i = 0
                while (i < 4) {
                  ar(i) =
                    if (r == 0 || c < 3) py(bx + 4 + i, by - 1)
                    else py(x0 + 16 + i, y0 - 1)
                  i += 1
                }
                predict4x4(bmodes(mi * 16 + 4 * r + c), py, bx, by, ar, pred4)
                val res = yCoeffs(4 * r + c)
                var allZero = true
                i = 0
                while (i < 16 && allZero) { if (res(i) != 0) allZero = false; i += 1 }
                if (!allZero) idct4x4(res)
                var yy = 0
                while (yy < 4) {
                  var xx = 0
                  while (xx < 4) {
                    val v0 = pred4(4 * yy + xx) + (if (allZero) 0 else res(4 * yy + xx))
                    py(bx + xx, by + yy) = clamp255(v0)
                    xx += 1
                  }
                  yy += 1
                }
                c += 1
              }
              r += 1
            }
          } else {
            predictFull(ym, py, x0, y0, 16, pred)
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val res = yCoeffs(4 * r + c)
                var allZero = true
                var i = 0
                while (i < 16 && allZero) { if (res(i) != 0) allZero = false; i += 1 }
                if (!allZero) idct4x4(res)
                var yy = 0
                while (yy < 4) {
                  var xx = 0
                  while (xx < 4) {
                    val v0 = pred(16 * (4 * r + yy) + 4 * c + xx) +
                      (if (allZero) 0 else res(4 * yy + xx))
                    py(x0 + 4 * c + xx, y0 + 4 * r + yy) = clamp255(v0)
                    xx += 1
                  }
                  yy += 1
                }
                c += 1
              }
              r += 1
            }
          }
          // chroma (modes DC/V/H/TM, decoded 0..3 -> reuse predictFull
          // via the YMode constants 1..4)
          val cx0 = mbx * 8
          val cy0 = mby * 8
          val uvm = uvmodes(mi) + 1 // UvDc..UvTm -> YModeDc..YModeTm
          var pl = 0
          while (pl < 2) {
            val plane = if (pl == 0) pu else pv
            val coeffs = if (pl == 0) uCoeffs else vCoeffs
            predictFull(uvm, plane, cx0, cy0, 8, pred)
            var r = 0
            while (r < 2) {
              var c = 0
              while (c < 2) {
                val res = coeffs(2 * r + c)
                var allZero = true
                var i = 0
                while (i < 16 && allZero) { if (res(i) != 0) allZero = false; i += 1 }
                if (!allZero) idct4x4(res)
                var yy = 0
                while (yy < 4) {
                  var xx = 0
                  while (xx < 4) {
                    val v0 = pred(8 * (4 * r + yy) + 4 * c + xx) +
                      (if (allZero) 0 else res(4 * yy + xx))
                    plane(cx0 + 4 * c + xx, cy0 + 4 * r + yy) = clamp255(v0)
                    xx += 1
                  }
                  yy += 1
                }
                c += 1
              }
              r += 1
            }
            pl += 1
          }
          // right-border replication for above-right reads of the next row
          if (mbx == mbW - 1) {
            var yy = 0
            while (yy < 16) {
              val edge = py(mbW * 16 - 1, y0 + yy)
              var i = 0
              while (i < 4) { py(mbW * 16 + i, y0 + yy) = edge; i += 1 }
              yy += 1
            }
          }
          mbx += 1
        }
        mby += 1
      }

      // ---- loop filter ---------------------------------------------------
      if (fh.filterLevel > 0) {
        mby = 0
        while (mby < mbH) {
          var mbx = 0
          while (mbx < mbW) {
            val mi = mby * mbW + mbx
            var level =
              if (!fh.segEnabled) fh.filterLevel
              else if (fh.segAbs) fh.segLf(segments(mi))
              else fh.filterLevel + fh.segLf(segments(mi))
            if (fh.lfDeltaEnabled) {
              level += fh.refDeltas(0) // keyframes reference intra (0)
              if (ymodes(mi) == YModeB) level += fh.modeDeltas(0)
            }
            if (level < 0) level = 0
            if (level > 63) level = 63
            if (level > 0) {
              val interior = lfInteriorLimit(level, fh.sharpness)
              val hevT = lfHevThreshold(level)
              val mbEdge = (level + 2) * 2 + interior
              val subEdge = level * 2 + interior
              val inner = mbHasCoeffs(mi) || ymodes(mi) == YModeB
              val x0 = mbx * 16
              val y0 = mby * 16
              val cx0 = mbx * 8
              val cy0 = mby * 8
              if (fh.filterType == 1) { // simple profile: luma only
                if (mbx > 0) filterEdge(py, x0, y0, 16, true, simpleFilter(mbEdge, _))
                if (inner) {
                  var e = 4
                  while (e < 16) { filterEdge(py, x0 + e, y0, 16, true, simpleFilter(subEdge, _)); e += 4 }
                }
                if (mby > 0) filterEdge(py, x0, y0, 16, false, simpleFilter(mbEdge, _))
                if (inner) {
                  var e = 4
                  while (e < 16) { filterEdge(py, x0, y0 + e, 16, false, simpleFilter(subEdge, _)); e += 4 }
                }
              } else {
                if (mbx > 0) {
                  filterEdge(py, x0, y0, 16, true, mbFilter(hevT, interior, mbEdge, _))
                  filterEdge(pu, cx0, cy0, 8, true, mbFilter(hevT, interior, mbEdge, _))
                  filterEdge(pv, cx0, cy0, 8, true, mbFilter(hevT, interior, mbEdge, _))
                }
                if (inner) {
                  var e = 4
                  while (e < 16) { filterEdge(py, x0 + e, y0, 16, true, subblockFilter(hevT, interior, subEdge, _)); e += 4 }
                  filterEdge(pu, cx0 + 4, cy0, 8, true, subblockFilter(hevT, interior, subEdge, _))
                  filterEdge(pv, cx0 + 4, cy0, 8, true, subblockFilter(hevT, interior, subEdge, _))
                }
                if (mby > 0) {
                  filterEdge(py, x0, y0, 16, false, mbFilter(hevT, interior, mbEdge, _))
                  filterEdge(pu, cx0, cy0, 8, false, mbFilter(hevT, interior, mbEdge, _))
                  filterEdge(pv, cx0, cy0, 8, false, mbFilter(hevT, interior, mbEdge, _))
                }
                if (inner) {
                  var e = 4
                  while (e < 16) { filterEdge(py, x0, y0 + e, 16, false, subblockFilter(hevT, interior, subEdge, _)); e += 4 }
                  filterEdge(pu, cx0, cy0 + 4, 8, false, subblockFilter(hevT, interior, subEdge, _))
                  filterEdge(pv, cx0, cy0 + 4, 8, false, subblockFilter(hevT, interior, subEdge, _))
                }
              }
            }
            mbx += 1
          }
          mby += 1
        }
      }

      // ---- crop ------------------------------------------------------------
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      val yOut = new Array[Int](w * h)
      val uOut = new Array[Int](cw * ch)
      val vOut = new Array[Int](cw * ch)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) { yOut(yy * w + xx) = py(xx, yy); xx += 1 }
        yy += 1
      }
      yy = 0
      while (yy < ch) {
        var xx = 0
        while (xx < cw) {
          uOut(yy * cw + xx) = pu(xx, yy)
          vOut(yy * cw + xx) = pv(xx, yy)
          xx += 1
        }
        yy += 1
      }
      Some((w, h, yOut, uOut, vOut))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: IllegalArgumentException => None
    }

  /** YUV 4:2:0 -> the 3-byte-interleaved RGB plane [[Multimodal]]'s
    * pHash path consumes. Integer BT.601 full-range with nearest
    * chroma upsampling; U=V=128 maps to R=G=B=Y EXACTLY (the fixture
    * corpora keep chroma neutral so the gray plane equals luma
    * closed-form). */
  def decodeRgb(b: Array[Byte], off: Int, len: Int): Option[(Int, Int, Array[Byte])] =
    decodeKeyframe(b, off, len).map { case (w, h, y, u, v) =>
      val cw = (w + 1) / 2
      val out = new Array[Byte](w * h * 3)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val yv = y(yy * w + xx)
          val cd = u((yy / 2) * cw + xx / 2) - 128
          val ce = v((yy / 2) * cw + xx / 2) - 128
          val i = 3 * (yy * w + xx)
          out(i) = clamp255(yv + ((91881 * ce + 32768) >> 16)).toByte
          out(i + 1) = clamp255(yv - ((22554 * cd + 46802 * ce + 32768) >> 16)).toByte
          out(i + 2) = clamp255(yv + ((116130 * cd + 32768) >> 16)).toByte
          xx += 1
        }
        yy += 1
      }
      (w, h, out)
    }

  // ---- fixture encoder (REAL spec-shaped keyframes) ----------------------

  val VariantBpred = 0 // all B_PRED/B_DC, one partition, no skip flags
  val Variant16x16 = 1 // all 16x16 DC_PRED (Y2/WHT + cat tokens), skip on
  val VariantMixed = 2 // MB row 0 16x16 DC, rows 1+ B_PRED
  val VariantParts = 3 // B_PRED over TWO token partitions, skip on

  /** Encode a gray image (chroma held neutral at 128) as one VP8
    * keyframe chunk payload that RECONSTRUCTS EXACTLY: at quantizer
    * index 0 every dequant factor is 4 (Y2: 8), and residuals are
    * restricted to the DCT's additions-only {0,2}x{0,2} basis — a
    * per-4x4 constant plus an X-patterned term k*s(y)*s(x) with
    * s = +1 on rows/cols {0,3} — which inverse-transforms with no
    * >>16 rounding, so level choice is a closed form (L00 = 2c,
    * L22 = 2k; 16x16 sub-DCs ride the Y2 WHT whose preimage
    * fwht(c)/2 is integral when all 16 sub-DC residuals share
    * parity). The encoder mirrors the decoder's prediction and
    * reconstruction EXACTLY (same private functions) and requires
    * pixel equality as it goes — a drifted fixture refuses to build
    * rather than gate green on garbage. Requires MB-aligned dims and
    * targets whose 4x4 tiles have the (constant + k*sgn) shape with
    * odd tile values (the q174 corpus's closed form). */
  def encode(w: Int, h: Int, gray: Array[Int], variant: Int): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "fixture dims must be MB-aligned")
    require(gray.length == w * h, "pixel count mismatch")
    val mbW = w / 16
    val mbH = h / 16
    val nParts = if (variant == VariantParts) 2 else 1
    val mbNoSkip = variant == Variant16x16 || variant == VariantParts
    val skipProb = 200
    def ymodeOf(mbx: Int, mby: Int): Int = variant match {
      case Variant16x16 => YModeDc
      case VariantMixed => if (mby == 0) YModeDc else YModeB
      case _ => YModeB
    }

    // ---- header + modes (first partition) --------------------------------
    val hbe = new BoolEncoder
    hbe.bool(128, 0) // color space
    hbe.bool(128, 0) // clamping
    hbe.bool(128, 0) // segmentation disabled
    hbe.bool(128, 0) // filter type: normal
    hbe.literal(6, 0) // loop filter level 0 (encoder choice: no deblock)
    hbe.literal(3, 0) // sharpness
    hbe.bool(128, 0) // no lf deltas
    hbe.literal(2, if (nParts == 2) 1 else 0)
    hbe.literal(7, 0) // y_ac_qi = 0: every dequant factor 4 (Y2: 8)
    var d = 0
    while (d < 5) { hbe.bool(128, 0); d += 1 } // no quantizer deltas
    hbe.bool(128, 1) // refresh entropy probs
    var i4 = 0
    while (i4 < 4) {
      var j = 0
      while (j < 8) {
        var k = 0
        while (k < 3) {
          var l = 0
          while (l < 11) { hbe.bool(CoeffUpdateProbs(i4)(j)(k)(l), 0); l += 1 }
          k += 1
        }
        j += 1
      }
      i4 += 1
    }
    hbe.bool(128, if (mbNoSkip) 1 else 0)
    if (mbNoSkip) hbe.literal(8, skipProb)

    // ---- plan coefficients + reconstruct (mirrors the decoder) -----------
    val py = new Plane(w, h)
    val nMb = mbW * mbH
    val yLv = Array.ofDim[Int](nMb, 16, 16) // [mb][subblock][raster levels]
    val y2Lv = Array.ofDim[Int](nMb, 16)
    val skips = new Array[Boolean](nMb)
    val pred = new Array[Int](256)
    val pred4 = new Array[Int](16)
    val ar = new Array[Int](4)
    /** target residual for a 4x4 at (bx, by) given a constant
      * prediction is (c + k*sgn); extract (c, k) and require the
      * shape holds. */
    def extractCk(bx: Int, by: Int, predConst: Int): (Int, Int) = {
      val r00 = gray(by * w + bx) - predConst
      val r01 = gray(by * w + bx + 1) - predConst
      val c = (r00 + r01) / 2
      val k = (r00 - r01) / 2
      require(c + k == r00 && c - k == r01, s"tile at ($bx,$by) not c+k*sgn")
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val s = (if (yy == 0 || yy == 3) 1 else -1) * (if (xx == 0 || xx == 3) 1 else -1)
          require(gray((by + yy) * w + bx + xx) - predConst == c + k * s,
            s"tile at ($bx,$by) not c+k*sgn at ($xx,$yy)")
          xx += 1
        }
        yy += 1
      }
      (c, k)
    }
    def reconBlock(bx: Int, by: Int, pr: Array[Int], prOff: Int, prStride: Int,
        lv: Array[Int]): Unit = {
      val res = lv.clone()
      var i = 0
      var allZero = true
      while (i < 16) {
        // luma dequant at qindex 0: dc 4, ac 4 (position 0 may already
        // carry the WHT output, marked by the caller via res(0) set
        // post-hoc)
        res(i) = res(i) * 4
        if (res(i) != 0) allZero = false
        i += 1
      }
      if (!allZero) idct4x4(res)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val v0 = pr(prOff + prStride * yy + xx) + (if (allZero) 0 else res(4 * yy + xx))
          py(bx + xx, by + yy) = clamp255(v0)
          require(py(bx + xx, by + yy) == gray((by + yy) * w + bx + xx),
            s"recon mismatch at (${bx + xx},${by + yy})")
          xx += 1
        }
        yy += 1
      }
    }
    def reconBlockWithDc(bx: Int, by: Int, pr: Array[Int], prOff: Int,
        prStride: Int, lv: Array[Int], dcValue: Int): Unit = {
      val res = new Array[Int](16)
      var i = 1
      var allZero = dcValue == 0
      while (i < 16) {
        res(i) = lv(i) * 4
        if (res(i) != 0) allZero = false
        i += 1
      }
      res(0) = dcValue
      if (!allZero) idct4x4(res)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val v0 = pr(prOff + prStride * yy + xx) + (if (allZero) 0 else res(4 * yy + xx))
          py(bx + xx, by + yy) = clamp255(v0)
          require(py(bx + xx, by + yy) == gray((by + yy) * w + bx + xx),
            s"recon mismatch at (${bx + xx},${by + yy})")
          xx += 1
        }
        yy += 1
      }
    }
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        val ym = ymodeOf(mbx, mby)
        val x0 = mbx * 16
        val y0 = mby * 16
        if (ym == YModeB) {
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val bx = x0 + 4 * c
              val by = y0 + 4 * r
              var i = 0
              while (i < 4) {
                ar(i) =
                  if (r == 0 || c < 3) py(bx + 4 + i, by - 1)
                  else py(x0 + 16 + i, y0 - 1)
                i += 1
              }
              predict4x4(BDc, py, bx, by, ar, pred4)
              val (cc, kk) = extractCk(bx, by, pred4(0))
              val lv = yLv(mi)(4 * r + c)
              lv(0) = 2 * cc
              lv(10) = 2 * kk
              reconBlock(bx, by, pred4, 0, 4, lv)
              c += 1
            }
            r += 1
          }
        } else {
          predictFull(YModeDc, py, x0, y0, 16, pred)
          val pConst = pred(0)
          val cks = new Array[Int](16)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val (cc, kk) = extractCk(x0 + 4 * c, y0 + 4 * r, pConst)
              cks(4 * r + c) = cc
              yLv(mi)(4 * r + c)(10) = 2 * kk
              c += 1
            }
            r += 1
          }
          // Y2 preimage: levels = fwht(c')/2 (integral when every
          // sub-DC residual shares parity — the corpus guarantees it)
          val f = fwht4x4(cks)
          var i = 0
          while (i < 16) {
            require((f(i) & 1) == 0,
              "sub-DC residual parity broke the Y2 preimage")
            y2Lv(mi)(i) = f(i) / 2
            i += 1
          }
          // reconstruct: wht output value for each sub-DC is 8*c'
          r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              reconBlockWithDc(x0 + 4 * c, y0 + 4 * r, pred,
                16 * (4 * r) + 4 * c, 16, yLv(mi)(4 * r + c), 8 * cks(4 * r + c))
              c += 1
            }
            r += 1
          }
        }
        skips(mi) = {
          var all0 = true
          var i = 0
          while (i < 16 && all0) {
            var j = 0
            while (j < 16 && all0) { if (yLv(mi)(i)(j) != 0) all0 = false; j += 1 }
            i += 1
          }
          if (ym != YModeB) {
            var j = 0
            while (j < 16 && all0) { if (y2Lv(mi)(j) != 0) all0 = false; j += 1 }
          }
          all0 // chroma is always all-zero (neutral 128)
        }
        if (mbx == mbW - 1) {
          var yy = 0
          while (yy < 16) {
            val edge = py(w - 1, y0 + yy)
            var i = 0
            while (i < 4) { py(w + i, y0 + yy) = edge; i += 1 }
            yy += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }

    // ---- mode bits (first partition, after the header) --------------------
    mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        val ym = ymodeOf(mbx, mby)
        if (mbNoSkip) hbe.bool(skipProb, if (skips(mi)) 1 else 0)
        hbe.tree(KfYmodeTree, KfYmodeProb, ym)
        if (ym == YModeB) {
          // every sub-mode is B_DC with B_DC neighbors: context [0][0]
          var i = 0
          while (i < 16) { hbe.tree(BmodeTree, KfBmodeProb(0)(0), BDc); i += 1 }
        }
        hbe.tree(UvModeTree, KfUvProb, UvDc)
        mbx += 1
      }
      mby += 1
    }

    // ---- token partitions ---------------------------------------------------
    val tbe = Array.fill(nParts)(new BoolEncoder)
    def encodeBlockTokens(be: BoolEncoder, typ: Int, first: Int, ctx0: Int,
        lv: Array[Int]): Int = {
      var last = first - 1
      var c = first
      while (c < 16) { if (lv(Zigzag(c)) != 0) last = c; c += 1 }
      var ctx = ctx0
      var prevZero = false
      c = first
      while (c <= last) {
        val v = lv(Zigzag(c))
        val a = math.abs(v)
        require(a <= 2114, s"level $a exceeds the cat6 token range")
        val pr = DefaultCoeffProbs(typ)(CoeffBands(c))(ctx)
        val start = if (prevZero) 2 else 0
        if (a == 0) {
          be.tree(CoeffTree, pr, 0, start)
          ctx = 0
          prevZero = true
        } else {
          val tok =
            if (a <= 4) a
            else {
              var cat = 5
              while (cat < 10 && a >= CatBase(cat - 4)) cat += 1
              cat
            }
          be.tree(CoeffTree, pr, tok, start)
          if (tok >= 5) {
            val cat = tok - 5
            val cp = CatProbs(cat)
            val extra = a - CatBase(cat)
            var i = cp.length - 1
            var bit = 0
            while (i >= 0) {
              bit = (extra >> i) & 1
              be.bool(cp(cp.length - 1 - i), bit)
              i -= 1
            }
          }
          be.bool(128, if (v < 0) 1 else 0)
          ctx = if (a == 1) 1 else 2
          prevZero = false
        }
        c += 1
      }
      if (last + 1 < 16) {
        val pr = DefaultCoeffProbs(typ)(CoeffBands(last + 1))(ctx)
        be.tree(CoeffTree, pr, TokEob, if (prevZero) 2 else 0)
      }
      last + 1
    }
    val aboveYnz = new Array[Boolean](4 * mbW)
    val aboveUnz = new Array[Boolean](2 * mbW)
    val aboveVnz = new Array[Boolean](2 * mbW)
    val aboveY2nz = new Array[Boolean](mbW)
    val zero16 = new Array[Int](16)
    mby = 0
    while (mby < mbH) {
      val leftYnz = new Array[Boolean](4)
      val leftUnz = new Array[Boolean](2)
      val leftVnz = new Array[Boolean](2)
      var leftY2nz = false
      val be = tbe(mby % nParts)
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        val ym = ymodeOf(mbx, mby)
        val hasY2 = ym != YModeB
        if (mbNoSkip && skips(mi)) {
          var i = 0
          while (i < 4) { leftYnz(i) = false; aboveYnz(4 * mbx + i) = false; i += 1 }
          i = 0
          while (i < 2) {
            leftUnz(i) = false; aboveUnz(2 * mbx + i) = false
            leftVnz(i) = false; aboveVnz(2 * mbx + i) = false
            i += 1
          }
          if (hasY2) { leftY2nz = false; aboveY2nz(mbx) = false }
        } else {
          if (hasY2) {
            val ctx = (if (leftY2nz) 1 else 0) + (if (aboveY2nz(mbx)) 1 else 0)
            val pos = encodeBlockTokens(be, 1, 0, ctx, y2Lv(mi))
            val nz = pos > 0
            leftY2nz = nz
            aboveY2nz(mbx) = nz
          }
          val typ = if (hasY2) 0 else 3
          val first = if (hasY2) 1 else 0
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val ctx = (if (leftYnz(r)) 1 else 0) + (if (aboveYnz(4 * mbx + c)) 1 else 0)
              val pos = encodeBlockTokens(be, typ, first, ctx, yLv(mi)(4 * r + c))
              val nz = pos > first
              leftYnz(r) = nz
              aboveYnz(4 * mbx + c) = nz
              c += 1
            }
            r += 1
          }
          r = 0
          while (r < 2) {
            var c = 0
            while (c < 2) {
              var ctx = (if (leftUnz(r)) 1 else 0) + (if (aboveUnz(2 * mbx + c)) 1 else 0)
              var pos = encodeBlockTokens(be, 2, 0, ctx, zero16)
              leftUnz(r) = pos > 0; aboveUnz(2 * mbx + c) = pos > 0
              ctx = (if (leftVnz(r)) 1 else 0) + (if (aboveVnz(2 * mbx + c)) 1 else 0)
              pos = encodeBlockTokens(be, 2, 0, ctx, zero16)
              leftVnz(r) = pos > 0; aboveVnz(2 * mbx + c) = pos > 0
              c += 1
            }
            r += 1
          }
        }
        mbx += 1
      }
      mby += 1
    }

    // ---- assemble the chunk -------------------------------------------------
    val firstPart = hbe.flush()
    val parts = tbe.map(_.flush())
    val out = new java.io.ByteArrayOutputStream()
    val tag = (firstPart.length << 5) | (1 << 4) // keyframe, version 0, show
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(firstPart, 0, firstPart.length)
    var pi = 0
    while (pi < nParts - 1) {
      val sz = parts(pi).length
      out.write(sz & 0xff); out.write((sz >> 8) & 0xff); out.write((sz >> 16) & 0xff)
      pi += 1
    }
    parts.foreach(pb => out.write(pb, 0, pb.length))
    out.toByteArray
  }

  /** The q174 corpus's closed-form gray plane (the q133 family shape,
    * parity-tuned for exact VP8 encode): 4x4 tiles of EVEN base
    * ((seed*73 + bx*37 + by*91) % 17) * 14 shifted by +7 (odd tiles,
    * so 16x16 sub-DC residuals share parity and the Y2 preimage is
    * integral), plus the per-tile noise kk = (id*31 + bx*7 + by*13)
    * % 3 - 1 riding the DCT's X basis sgn = s(y)*s(x), s = +1 on
    * rows/cols {0,3}. The sgn term sums to ZERO over every tile, so
    * the pHash oracle needs only the tile bases; same-seed images
    * hash identically. Seeds follow q133: outliers (id%9==0) draw
    * from the disjoint 10..16 space. */
  def q174Gray(id: Long, x: Int, y: Int): Int = {
    val seed =
      if (java.lang.Math.floorMod(id, 9L) == 0L) 10L + java.lang.Math.floorMod(id, 7L)
      else java.lang.Math.floorMod(id, 10L)
    val bx = x / 4
    val by = y / 4
    val base = ((seed * 73L + bx * 37L + by * 91L) % 17L) * 14L
    val kk = java.lang.Math.floorMod(id * 31L + bx * 7L + by * 13L, 3L) - 1L
    val sgn = (if (y % 4 == 0 || y % 4 == 3) 1 else -1) *
      (if (x % 4 == 0 || x % 4 == 3) 1 else -1)
    (7L + base + kk * sgn).toInt
  }
}
