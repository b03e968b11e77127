package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** H.264/AVC Baseline INTRA-frame pixel decoding (Rec. ITU-T H.264) —
  * the codec layer under [[H264]]'s classification (q196), closing the
  * clip-dedup gap: H.264-in-MP4 is the dominant real-world video
  * wrapper+codec, and until its IDR frames decode to pixels, a clip
  * re-encoded from MJPEG/VP8L/GIF to H.264 is invisible to the banded
  * frame-hash dedup (q141/q170). Decodes the subset that intra-only
  * Baseline tooling emits, REFUSES everything else loudly (the
  * [[Multimodal]] codec discipline — never garbage pixels):
  *
  *  - I_NxN (I_4x4) macroblocks: all nine 4×4 luma prediction modes
  *    (§8.3.1), all four chroma modes (§8.3.4), full CAVLC residual
  *    decoding (§9.2), dequantization (§8.5.9) and the exact integer
  *    inverse 4×4 transform (§8.5.12) at any QP, 4:2:0.
  *  - Refusals: `unsupported_pps` (CABAC / slice groups),
  *    `not_intra` (P/B slice), `unsupported_mb` (I_16x16 / I_PCM —
  *    bounded scope, tagged), `unsupported_deblock` (the in-loop
  *    filter is not implemented, so a stream that requires it refuses
  *    rather than render wrong pixels), `unsupported_sps` (non-4:2:0,
  *    interlace), `bad_stream` (syntax/bounds violations).
  *
  * Entropy tables (coeff_token Table 9-5, total_zeros 9-7/9-9,
  * run_before 9-10, the intra CBP mapping 9-4) are transcribed from
  * the Rec.; H264DecodeSpec validates their structure (prefix-free
  * codes, the CBP map a permutation of 0..47) and pins encoder ↔
  * decoder round-trips across the full level/zeros/run ranges. The
  * fixture encoder ([[encodeIdrGray]]) performs a REAL encode —
  * predict from reconstructed neighbors, transform, quantize at the
  * exact-reconstruction operating point QP 16 — and `require`s
  * recon == target per frame, the Vp8 fixture discipline. */
object H264Decode {

  // ---- bit I/O over emulation-stripped RBSP ---------------------------

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def bitsLeft: Int = b.length * 8 - pos
    def u(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) {
        if (pos >= b.length * 8) throw new IndexOutOfBoundsException("rbsp")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; k += 1
      }
      v
    }
    def peek(n: Int): Int = {
      val p0 = pos
      var v = 0; var k = 0
      while (k < n) {
        val bit =
          if (p0 + k >= b.length * 8) 0
          else (b((p0 + k) >> 3) >> (7 - ((p0 + k) & 7))) & 1
        v = (v << 1) | bit
        k += 1
      }
      v
    }
    def skip(n: Int): Unit = { pos += n }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 30) throw new IndexOutOfBoundsException("ue")
      }
      if (zeros == 0) 0 else (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  // ---- parameter sets -------------------------------------------------

  private[multimodal] final case class SpsDec(
      profileIdc: Int, levelIdc: Int, widthMbs: Int, heightMbs: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      cropL: Int, cropR: Int, cropT: Int, cropB: Int) {
    def width: Int = 16 * widthMbs - 2 * (cropL + cropR)
    def height: Int = 16 * heightMbs - 2 * (cropT + cropB)
  }

  private[multimodal] def parseSpsDec(nal: Array[Byte]): Either[String, SpsDec] = {
    if (nal == null || nal.length < 4 || (nal(0) & 0x1f) != 7)
      return Left("bad_stream")
    val r = new Reader(H264.stripEmulation(
      java.util.Arrays.copyOfRange(nal, 1, nal.length)))
    try {
      val profile = r.u(8); r.u(8); val level = r.u(8)
      r.ue() // sps id
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profile)) {
        val chroma = r.ue()
        if (chroma != 1) return Left("unsupported_sps")
        r.ue(); r.ue(); r.u(1)
        if (r.u(1) == 1) return Left("unsupported_sps")
      }
      val log2Fn = r.ue() + 4
      val poc = r.ue()
      var log2Poc = 0
      poc match {
        case 0 => log2Poc = r.ue() + 4
        case 1 =>
          r.u(1); r.se(); r.se()
          val n = r.ue(); var i = 0
          while (i < n) { r.se(); i += 1 }
        case _ => ()
      }
      r.ue(); r.u(1)
      val pw = r.ue() + 1
      val ph = r.ue() + 1
      if (r.u(1) == 0) return Left("unsupported_sps") // interlace
      r.u(1)
      val (cl, cr, ct, cb) =
        if (r.u(1) == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
      if (pw <= 0 || ph <= 0 || pw > 1024 || ph > 1024 ||
          16 * pw <= 2 * (cl + cr) || 16 * ph <= 2 * (ct + cb))
        Left("bad_stream")
      else Right(SpsDec(profile, level, pw, ph, log2Fn, poc, log2Poc,
        cl, cr, ct, cb))
    } catch { case _: IndexOutOfBoundsException => Left("bad_stream") }
  }

  private[multimodal] final case class PpsDec(
      picInitQp: Int, chromaQpOffset: Int, deblockControl: Boolean,
      constrainedIntra: Boolean, redundantPicCnt: Boolean,
      bottomFieldPocInFrame: Boolean)

  private[multimodal] def parsePps(nal: Array[Byte]): Either[String, PpsDec] = {
    if (nal == null || nal.length < 2 || (nal(0) & 0x1f) != 8)
      return Left("bad_stream")
    val r = new Reader(H264.stripEmulation(
      java.util.Arrays.copyOfRange(nal, 1, nal.length)))
    try {
      r.ue(); r.ue() // pps id, sps id
      if (r.u(1) == 1) return Left("unsupported_pps") // CABAC
      val bfPoc = r.u(1) == 1
      if (r.ue() != 0) return Left("unsupported_pps") // slice groups
      r.ue(); r.ue() // num_ref_idx defaults
      r.u(1); r.u(2) // weighted pred/bipred
      val qp = r.se() + 26
      r.se() // pic_init_qs
      val cqp = r.se()
      val dbc = r.u(1) == 1
      val cip = r.u(1) == 1
      val rpc = r.u(1) == 1
      Right(PpsDec(qp, cqp, dbc, cip, rpc, bfPoc))
    } catch { case _: IndexOutOfBoundsException => Left("bad_stream") }
  }

  // ---- entropy tables (transcribed; structure spec-validated) ---------

  /** Table 9-5 coeff_token, classes nC∈[0,2), [2,4), [4,8); cells are
    * (lenBits, code) indexed [class][totalCoeff][trailingOnes]. A cell
    * of (0,0) marks an illegal (t1 > tc) combination. */
  private[multimodal] val CoeffTokenVlc: Array[Array[Array[(Int, Int)]]] = {
    def t(cells: (Int, String)*): Array[(Int, Int)] =
      cells.map { case (l, s) =>
        (l, if (s.isEmpty) 0 else Integer.parseInt(s, 2)) }.toArray
    // class 0: 0 <= nC < 2
    val c0 = Array(
      t((1, "1")),
      t((6, "000101"), (2, "01")),
      t((8, "00000111"), (6, "000100"), (3, "001")),
      t((9, "000000111"), (8, "00000110"), (7, "0000101"), (5, "00011")),
      t((10, "0000000111"), (9, "000000110"), (8, "00000101"), (6, "000011")),
      t((11, "00000000111"), (10, "0000000110"), (9, "000000101"), (7, "0000100")),
      t((13, "0000000001111"), (11, "00000000110"), (10, "0000000101"), (8, "00000100")),
      t((13, "0000000001011"), (13, "0000000001110"), (11, "00000000101"), (9, "000000100")),
      t((13, "0000000001000"), (13, "0000000001010"), (13, "0000000001101"), (10, "0000000100")),
      t((14, "00000000001111"), (14, "00000000001110"), (13, "0000000001001"), (11, "00000000100")),
      t((14, "00000000001011"), (14, "00000000001010"), (14, "00000000001101"), (13, "0000000001100")),
      t((15, "000000000001111"), (15, "000000000001110"), (14, "00000000001001"), (14, "00000000001100")),
      t((15, "000000000001011"), (15, "000000000001010"), (15, "000000000001101"), (14, "00000000001000")),
      t((16, "0000000000001111"), (15, "000000000000001"), (15, "000000000001001"), (15, "000000000001100")),
      t((16, "0000000000001011"), (16, "0000000000001110"), (16, "0000000000001101"), (15, "000000000001000")),
      t((16, "0000000000000111"), (16, "0000000000001010"), (16, "0000000000001001"), (16, "0000000000001100")),
      t((16, "0000000000000100"), (16, "0000000000000110"), (16, "0000000000000101"), (16, "0000000000001000")))
    // class 1: 2 <= nC < 4
    val c1 = Array(
      t((2, "11")),
      t((6, "001011"), (2, "10")),
      t((6, "000111"), (5, "00111"), (3, "011")),
      t((7, "0000111"), (6, "001010"), (6, "001001"), (4, "0101")),
      t((8, "00000111"), (6, "000110"), (6, "000101"), (4, "0100")),
      t((8, "00000100"), (7, "0000110"), (7, "0000101"), (5, "00110")),
      t((9, "000000111"), (8, "00000110"), (8, "00000101"), (6, "001000")),
      t((11, "00000001111"), (9, "000000110"), (9, "000000101"), (6, "000100")),
      t((11, "00000001011"), (11, "00000001110"), (11, "00000001101"), (7, "0000100")),
      t((12, "000000001111"), (11, "00000001010"), (11, "00000001001"), (9, "000000100")),
      t((12, "000000001011"), (12, "000000001110"), (12, "000000001101"), (11, "00000001100")),
      t((12, "000000001000"), (12, "000000001010"), (12, "000000001001"), (11, "00000001000")),
      t((13, "0000000001111"), (13, "0000000001110"), (13, "0000000001101"), (12, "000000001100")),
      t((13, "0000000001011"), (13, "0000000001010"), (13, "0000000001001"), (13, "0000000001100")),
      t((13, "0000000000111"), (14, "00000000001011"), (13, "0000000001000"), (13, "0000000000110")),
      t((14, "00000000001001"), (14, "00000000001000"), (14, "00000000001010"), (13, "0000000000001")),
      t((14, "00000000000111"), (14, "00000000000110"), (14, "00000000000101"), (14, "00000000000100")))
    // class 2: 4 <= nC < 8
    val c2 = Array(
      t((4, "1111")),
      t((6, "001111"), (4, "1110")),
      t((6, "001011"), (5, "01111"), (4, "1101")),
      t((6, "001000"), (5, "01100"), (5, "01110"), (4, "1100")),
      t((7, "0001111"), (5, "01010"), (5, "01011"), (4, "1011")),
      t((7, "0001011"), (5, "01000"), (5, "01001"), (4, "1010")),
      t((7, "0001001"), (6, "001110"), (6, "001101"), (4, "1001")),
      t((7, "0001000"), (6, "001010"), (6, "001001"), (4, "1000")),
      t((8, "00001111"), (7, "0001110"), (7, "0001101"), (5, "01101")),
      t((8, "00001011"), (8, "00001110"), (7, "0001010"), (6, "001100")),
      t((9, "000001111"), (8, "00001010"), (8, "00001101"), (7, "0001100")),
      t((9, "000001011"), (9, "000001110"), (8, "00001001"), (8, "00001100")),
      t((9, "000001000"), (9, "000001010"), (9, "000001101"), (8, "00001000")),
      t((10, "0000001101"), (9, "000000111"), (9, "000001001"), (9, "000001100")),
      t((10, "0000001001"), (10, "0000001100"), (10, "0000001011"), (10, "0000001010")),
      t((10, "0000000101"), (10, "0000001000"), (10, "0000000111"), (10, "0000000110")),
      t((10, "0000000001"), (10, "0000000100"), (10, "0000000011"), (10, "0000000010")))
    Array(c0, c1, c2)
  }

  /** Table 9-5, nC == -1 (chroma DC, 4:2:0): totalCoeff 0..4. */
  private[multimodal] val CoeffTokenChromaDc: Array[Array[(Int, Int)]] = {
    def t(cells: (Int, String)*): Array[(Int, Int)] =
      cells.map { case (l, s) => (l, Integer.parseInt(s, 2)) }.toArray
    Array(
      t((2, "01")),
      t((6, "000111"), (1, "1")),
      t((6, "000100"), (6, "000110"), (3, "001")),
      t((6, "000011"), (7, "0000011"), (7, "0000010"), (6, "000101")),
      t((6, "000010"), (8, "00000011"), (8, "00000010"), (7, "0000000")))
  }

  /** Table 9-7 total_zeros for 4x4 blocks, [totalCoeff-1][totalZeros]. */
  private[multimodal] val TotalZerosVlc: Array[Array[(Int, Int)]] = {
    def t(ss: String*): Array[(Int, Int)] =
      ss.map(s => (s.length, Integer.parseInt(s, 2))).toArray
    Array(
      t("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
        "000000010", "000000001"),
      t("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"),
      t("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"),
      t("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"),
      t("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"),
      t("000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"),
      t("000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"),
      t("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
      t("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
      t("00001", "00000", "001", "11", "10", "01", "0001"),
      t("0000", "0001", "001", "010", "1", "011"),
      t("0000", "0001", "01", "1", "001"),
      t("000", "001", "1", "01"),
      t("00", "01", "1"),
      t("0", "1"))
  }

  /** Table 9-9(a) total_zeros for chroma DC (4:2:0), [tc-1][tz]. */
  private[multimodal] val TotalZerosChromaDcVlc: Array[Array[(Int, Int)]] =
    Array(
      Array((1, 1), (2, 1), (3, 1), (3, 0)),
      Array((1, 1), (2, 1), (2, 0)),
      Array((1, 1), (1, 0)))

  /** Table 9-10 run_before, [min(zerosLeft,7)-1][run]; zerosLeft > 6
    * extends run >= 7 as (run - 3) zeros then a 1. */
  private[multimodal] val RunBeforeVlc: Array[Array[(Int, Int)]] = {
    def t(ss: String*): Array[(Int, Int)] =
      ss.map(s => (s.length, Integer.parseInt(s, 2))).toArray
    Array(
      t("1", "0"),
      t("1", "01", "00"),
      t("11", "10", "01", "00"),
      t("11", "10", "01", "001", "000"),
      t("11", "10", "011", "010", "001", "000"),
      t("11", "000", "001", "011", "010", "101", "100"),
      t("111", "110", "101", "100", "011", "010", "001"))
  }

  /** Table 9-4 codeNum -> coded_block_pattern for Intra_4x4. */
  private[multimodal] val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Table 8-15 chroma QP for qPi in [30, 51] (identity below 30). */
  private val ChromaQpHigh: Array[Int] = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
    38, 38, 39, 39, 39, 39)
  private[multimodal] def chromaQp(qpi0: Int): Int = {
    val qpi = math.max(0, math.min(51, qpi0))
    if (qpi < 30) qpi else ChromaQpHigh(qpi - 30)
  }

  /** 4x4 zigzag scan: coeff index -> raster position. */
  private[multimodal] val Zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Dequant LevelScale (§8.5.9): per qp%6 per position class
    * (0 = corners (0,0)(0,2)(2,0)(2,2); 1 = (1,1)(1,3)(3,1)(3,3);
    * 2 = the rest). */
  private val LevelScale: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private def posClass(p: Int): Int = {
    val i = p >> 2; val j = p & 3
    if ((i & 1) == 0 && (j & 1) == 0) 0
    else if ((i & 1) == 1 && (j & 1) == 1) 1
    else 2
  }
  private[multimodal] def dequant(level: Int, qp: Int, pos: Int): Int =
    (level * LevelScale(qp % 6)(posClass(pos))) << (qp / 6)

  /** Exact integer inverse 4x4 transform (§8.5.12): input dequantized
    * coefficients in raster order, output residual with the final
    * (x + 32) >> 6 rounding. */
  private[multimodal] def idct4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val o = 4 * i
      val e0 = d(o) + d(o + 2)
      val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3)
      val e3 = d(o + 1) + (d(o + 3) >> 1)
      e(o) = e0 + e3; e(o + 1) = e1 + e2
      e(o + 2) = e1 - e2; e(o + 3) = e0 - e3
      i += 1
    }
    val out = new Array[Int](16)
    var j = 0
    while (j < 4) { // columns
      val g0 = e(j) + e(8 + j)
      val g1 = e(j) - e(8 + j)
      val g2 = (e(4 + j) >> 1) - e(12 + j)
      val g3 = e(4 + j) + (e(12 + j) >> 1)
      out(j) = (g0 + g3 + 32) >> 6
      out(4 + j) = (g1 + g2 + 32) >> 6
      out(8 + j) = (g1 - g2 + 32) >> 6
      out(12 + j) = (g0 - g3 + 32) >> 6
      j += 1
    }
    out
  }

  // ---- CAVLC ----------------------------------------------------------

  private def matchVlc(r: Reader, table: Array[Array[(Int, Int)]]):
      Option[(Int, Int)] = {
    // longest codes are 16 bits; match incrementally
    var best: Option[(Int, Int, Int)] = None // (tc, t1idx, len)
    var len = 1
    while (len <= 16 && best.isEmpty) {
      val v = r.peek(len)
      var tc = 0
      while (tc < table.length && best.isEmpty) {
        val row = table(tc)
        var t1 = 0
        while (t1 < row.length && best.isEmpty) {
          if (row(t1)._1 == len && row(t1)._2 == v) best = Some((tc, t1, len))
          t1 += 1
        }
        tc += 1
      }
      len += 1
    }
    best.map { case (tc, t1, l) => r.skip(l); (tc, t1) }
  }

  /** Decode one CAVLC residual block (§9.2). `nC` selects the
    * coeff_token class (-1 = chroma DC). Returns the `maxCoeff`
    * levels in coefficient-scan order plus totalCoeff, or None on a
    * syntax violation. */
  private[multimodal] def residualBlock(r: Reader, nC: Int,
      maxCoeff: Int): Option[(Array[Int], Int)] = {
    val (tc, t1) =
      if (nC == -1) matchVlc(r, CoeffTokenChromaDc) match {
        case Some(x) => x; case None => return None
      }
      else if (nC >= 8) {
        val v = r.u(6)
        if (v == 3) (0, 0) else ((v >> 2) + 1, v & 3)
      } else {
        val cls = if (nC < 2) 0 else if (nC < 4) 1 else 2
        matchVlc(r, CoeffTokenVlc(cls)) match {
          case Some(x) => x; case None => return None
        }
      }
    if (tc > maxCoeff || t1 > tc || t1 > 3) return None
    val out = new Array[Int](maxCoeff)
    if (tc == 0) return Some((out, 0))
    val levels = new Array[Int](tc)
    var i = 0
    while (i < t1) { // trailing ones: sign bits only
      levels(i) = if (r.u(1) == 1) -1 else 1
      i += 1
    }
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      var prefix = 0
      while (r.u(1) == 0) {
        prefix += 1
        if (prefix > 32) return None
      }
      // §9.2.2.1: suffix size is suffixLength, except 4 at the
      // (prefix 14, suffixLength 0) escape and prefix-3 past 15
      val size =
        if (prefix >= 15) prefix - 3
        else if (prefix == 14 && suffixLength == 0) 4
        else suffixLength
      if (size > 28) return None
      var levelCode = (math.min(15, prefix) << suffixLength) +
        (if (size > 0) r.u(size) else 0)
      if (prefix >= 15 && suffixLength == 0) levelCode += 15
      if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
      if (i == t1 && t1 < 3) levelCode += 2
      levels(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    var totalZeros = 0
    if (tc < maxCoeff) {
      val tzTable =
        if (nC == -1) TotalZerosChromaDcVlc(tc - 1) else TotalZerosVlc(tc - 1)
      var got = false
      var len = 1
      while (len <= 9 && !got) {
        val v = r.peek(len)
        var tz = 0
        while (tz < tzTable.length && !got) {
          if (tzTable(tz)._1 == len && tzTable(tz)._2 == v) {
            totalZeros = tz; r.skip(len); got = true
          }
          tz += 1
        }
        len += 1
      }
      if (!got) return None
    }
    // place levels: highest-frequency coefficient first in the stream
    var zerosLeft = totalZeros
    var pos = tc - 1 + totalZeros // scan index of the first (highest) coeff
    if (pos >= maxCoeff) return None
    i = 0
    while (i < tc) {
      out(pos) = levels(i)
      if (i < tc - 1) {
        var run = 0
        if (zerosLeft > 0) {
          val zl = math.min(zerosLeft, 7)
          val row = RunBeforeVlc(zl - 1)
          if (zl < 7) {
            var got = false
            var len = 1
            while (len <= 3 && !got) {
              val v = r.peek(len)
              var rr = 0
              while (rr < row.length && !got) {
                if (row(rr)._1 == len && row(rr)._2 == v) {
                  run = rr; r.skip(len); got = true
                }
                rr += 1
              }
              len += 1
            }
            if (!got) return None
          } else {
            // zerosLeft > 6: 3-bit codes for run 0..6, then unary
            val v3 = r.peek(3)
            if (v3 > 0) { run = 7 - v3; r.skip(3) }
            else {
              r.skip(3)
              run = 7
              while (r.u(1) == 0) {
                run += 1
                if (run > 15) return None
              }
            }
          }
        }
        if (run > zerosLeft) return None
        zerosLeft -= run
        pos -= (run + 1)
        if (pos < 0) return None
      }
      i += 1
    }
    Some((out, tc))
  }

  // ---- intra prediction + reconstruction ------------------------------

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Predict one 4x4 luma block into `pred` (raster 16). Neighbor
    * pixels come from the reconstructed plane. Returns false when the
    * mode needs an unavailable neighbor (illegal stream). */
  private def predict4x4(mode: Int, plane: Array[Int], stride: Int,
      x0: Int, y0: Int, leftAvail: Boolean, topAvail: Boolean,
      topLeftAvail: Boolean, topRightAvail: Boolean,
      pred: Array[Int]): Boolean = {
    val top = new Array[Int](8)
    val left = new Array[Int](4)
    var tl = 0
    if (topAvail) {
      var i = 0
      while (i < 4) { top(i) = plane((y0 - 1) * stride + x0 + i); i += 1 }
      if (topRightAvail) {
        while (i < 8) { top(i) = plane((y0 - 1) * stride + x0 + i); i += 1 }
      } else {
        while (i < 8) { top(i) = top(3); i += 1 }
      }
    }
    if (leftAvail) {
      var i = 0
      while (i < 4) { left(i) = plane((y0 + i) * stride + x0 - 1); i += 1 }
    }
    if (topLeftAvail) tl = plane((y0 - 1) * stride + x0 - 1)
    def set(f: (Int, Int) => Int): Unit = {
      var y = 0
      while (y < 4) {
        var x = 0
        while (x < 4) { pred(4 * y + x) = f(x, y); x += 1 }
        y += 1
      }
    }
    mode match {
      case 0 => // Vertical
        if (!topAvail) return false
        set((x, _) => top(x))
      case 1 => // Horizontal
        if (!leftAvail) return false
        set((_, y) => left(y))
      case 2 => // DC
        val dc =
          if (leftAvail && topAvail)
            (top(0) + top(1) + top(2) + top(3) +
              left(0) + left(1) + left(2) + left(3) + 4) >> 3
          else if (leftAvail) (left(0) + left(1) + left(2) + left(3) + 2) >> 2
          else if (topAvail) (top(0) + top(1) + top(2) + top(3) + 2) >> 2
          else 128
        set((_, _) => dc)
      case 3 => // Diagonal-Down-Left
        if (!topAvail) return false
        set((x, y) =>
          if (x == 3 && y == 3) (top(6) + 3 * top(7) + 2) >> 2
          else (top(x + y) + 2 * top(x + y + 1) + top(x + y + 2) + 2) >> 2)
      case 4 => // Diagonal-Down-Right (§8.3.1.2.5)
        if (!topAvail || !leftAvail || !topLeftAvail) return false
        def at4(i: Int) = if (i < 0) tl else top(i)
        def al4(i: Int) = if (i < 0) tl else left(i)
        set((x, y) =>
          if (x > y) (at4(x - y - 2) + 2 * at4(x - y - 1) + at4(x - y) + 2) >> 2
          else if (x < y) (al4(y - x - 2) + 2 * al4(y - x - 1) + al4(y - x) + 2) >> 2
          else (top(0) + 2 * tl + left(0) + 2) >> 2)
      case 5 => // Vertical-Right (§8.3.1.2.6)
        if (!topAvail || !leftAvail || !topLeftAvail) return false
        def at5(i: Int) = if (i < 0) tl else top(i)
        def al5(i: Int) = if (i < 0) tl else left(i)
        set { (x, y) =>
          val z = 2 * x - y
          if (z >= 0 && z % 2 == 0)
            (at5(x - (y >> 1) - 1) + at5(x - (y >> 1)) + 1) >> 1
          else if (z >= 0)
            (at5(x - (y >> 1) - 2) + 2 * at5(x - (y >> 1) - 1) +
              at5(x - (y >> 1)) + 2) >> 2
          else if (z == -1) (left(0) + 2 * tl + top(0) + 2) >> 2
          else (al5(y - 2 * x - 1) + 2 * al5(y - 2 * x - 2) +
            al5(y - 2 * x - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down (§8.3.1.2.7)
        if (!topAvail || !leftAvail || !topLeftAvail) return false
        def at6(i: Int) = if (i < 0) tl else top(i)
        def al6(i: Int) = if (i < 0) tl else left(i)
        set { (x, y) =>
          val z = 2 * y - x
          if (z >= 0 && z % 2 == 0)
            (al6(y - (x >> 1) - 1) + al6(y - (x >> 1)) + 1) >> 1
          else if (z >= 0)
            (al6(y - (x >> 1) - 2) + 2 * al6(y - (x >> 1) - 1) +
              al6(y - (x >> 1)) + 2) >> 2
          else if (z == -1) (top(0) + 2 * tl + left(0) + 2) >> 2
          else (at6(x - 2 * y - 1) + 2 * at6(x - 2 * y - 2) +
            at6(x - 2 * y - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left
        if (!topAvail) return false
        set { (x, y) =>
          if (y % 2 == 0) (top(x + (y >> 1)) + top(x + (y >> 1) + 1) + 1) >> 1
          else (top(x + (y >> 1)) + 2 * top(x + (y >> 1) + 1) +
            top(x + (y >> 1) + 2) + 2) >> 2
        }
      case 8 => // Horizontal-Up
        if (!leftAvail) return false
        set { (x, y) =>
          val z = x + 2 * y
          if (z > 5) left(3)
          else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
          else if (z % 2 == 0) (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
          else (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) +
            left(y + (x >> 1) + 2) + 2) >> 2
        }
      case _ => return false
    }
    true
  }

  /** Predict a full 8x8 chroma block (§8.3.4) into `pred`. */
  private def predictChroma(mode: Int, plane: Array[Int], stride: Int,
      x0: Int, y0: Int, leftAvail: Boolean, topAvail: Boolean): Option[Array[Int]] = {
    val pred = new Array[Int](64)
    def top(i: Int) = plane((y0 - 1) * stride + x0 + i)
    def left(i: Int) = plane((y0 + i) * stride + x0 - 1)
    mode match {
      case 0 => // DC per 4x4 quadrant (§8.3.4.1): the corner quadrants
        // prefer their OWN edge — top-right uses its top run (falling
        // back to left), bottom-left its left run (falling back to
        // top); the diagonal quadrants average both when available
        var qy = 0
        while (qy < 2) {
          var qx = 0
          while (qx < 2) {
            var sum = 0; var n = 0
            val (uT, uL) = (qx, qy) match {
              case (0, 0) => (topAvail, leftAvail)
              case (1, 0) =>
                if (topAvail) (true, false)
                else (false, leftAvail)
              case (0, 1) =>
                if (leftAvail) (false, true)
                else (topAvail, false)
              case _ => (topAvail, leftAvail)
            }
            if (uT) { var i = 0; while (i < 4) { sum += top(4 * qx + i); i += 1 }; n += 4 }
            if (uL) { var i = 0; while (i < 4) { sum += left(4 * qy + i); i += 1 }; n += 4 }
            val dc = if (n == 8) (sum + 4) >> 3 else if (n == 4) (sum + 2) >> 2 else 128
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) { pred(8 * (4 * qy + y) + 4 * qx + x) = dc; x += 1 }
              y += 1
            }
            qx += 1
          }
          qy += 1
        }
      case 1 => // Horizontal
        if (!leftAvail) return None
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { pred(8 * y + x) = left(y); x += 1 }
          y += 1
        }
      case 2 => // Vertical
        if (!topAvail) return None
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { pred(8 * y + x) = top(x); x += 1 }
          y += 1
        }
      case 3 => // Plane (§8.3.4.4)
        if (!topAvail || !leftAvail) return None
        def tl = plane((y0 - 1) * stride + x0 - 1)
        var hAcc = 0; var vAcc = 0
        var i = 1
        while (i <= 4) {
          hAcc += i * (top(3 + i) - (if (3 - i >= 0) top(3 - i) else tl))
          vAcc += i * (left(3 + i) - (if (3 - i >= 0) left(3 - i) else tl))
          i += 1
        }
        val a = 16 * (left(7) + top(7))
        val bb = (17 * hAcc + 16) >> 5
        val c = (17 * vAcc + 16) >> 5
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            pred(8 * y + x) = clip255((a + bb * (x - 3) + c * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case _ => return None
    }
    Some(pred)
  }

  // ---- frame decode ---------------------------------------------------

  private[multimodal] final case class Frame(
      width: Int, height: Int, luma: Array[Int], cb: Array[Int], cr: Array[Int])

  /** I_4x4 luma block coding order: quadrant raster, then 4x4 raster
    * within the quadrant; returns (x, y) offsets in the MB. */
  private def blk4x4Offset(idx: Int): (Int, Int) = {
    val q = idx >> 2; val s = idx & 3
    ((q % 2) * 8 + (s % 2) * 4, (q / 2) * 8 + (s / 2) * 4)
  }

  /** Decode one IDR slice NAL to a frame (both chroma planes too).
    * Left = refusal tag. */
  private[multimodal] def decodeIdr(sps: SpsDec, pps: PpsDec,
      sliceNal: Array[Byte]): Either[String, Frame] = {
    if (sliceNal == null || sliceNal.length < 2) return Left("bad_stream")
    if ((sliceNal(0) & 0x1f) != 5) return Left("bad_stream")
    val r = new Reader(H264.stripEmulation(
      java.util.Arrays.copyOfRange(sliceNal, 1, sliceNal.length)))
    try {
      if (r.ue() != 0) return Left("unsupported_slice") // first_mb != 0
      val sliceType = r.ue()
      if (sliceType % 5 != 2) return Left("not_intra") // I slices only
      r.ue() // pps id
      r.u(sps.log2MaxFrameNum) // frame_num
      r.ue() // idr_pic_id
      if (sps.pocType == 0) {
        r.u(sps.log2MaxPocLsb)
        if (pps.bottomFieldPocInFrame) r.se()
      } else if (sps.pocType == 1) return Left("unsupported_slice")
      if (pps.redundantPicCnt) r.ue()
      // dec_ref_pic_marking for IDR
      r.u(1); r.u(1)
      var qp = pps.picInitQp + r.se()
      if (qp < 0 || qp > 51) return Left("bad_stream")
      if (pps.deblockControl) {
        val disable = r.ue()
        if (disable != 1) return Left("unsupported_deblock")
      } else return Left("unsupported_deblock")

      val wMbs = sps.widthMbs; val hMbs = sps.heightMbs
      val stride = 16 * wMbs; val cStride = 8 * wMbs
      val luma = new Array[Int](stride * 16 * hMbs)
      val cbP = new Array[Int](cStride * 8 * hMbs)
      val crP = new Array[Int](cStride * 8 * hMbs)
      // per-4x4 bookkeeping across the frame
      val lumaNz = Array.fill(4 * wMbs * 4 * hMbs)(-1) // -1 = not coded yet
      val cbNz = Array.fill(2 * wMbs * 2 * hMbs)(-1)
      val crNz = Array.fill(2 * wMbs * 2 * hMbs)(-1)
      val predModes = Array.fill(4 * wMbs * 4 * hMbs)(-1)

      def lumaN(bx: Int, by: Int): Int =
        if (bx < 0 || by < 0 || bx >= 4 * wMbs || by >= 4 * hMbs) -1
        else lumaNz(by * 4 * wMbs + bx)
      def nCOf(nA: Int, nB: Int): Int =
        if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
        else if (nA >= 0) nA
        else if (nB >= 0) nB
        else 0

      var mb = 0
      val nMbs = wMbs * hMbs
      while (mb < nMbs) {
        val mbX = mb % wMbs; val mbY = mb / wMbs
        val mbType = r.ue()
        if (mbType != 0) {
          // I_16x16 (1..24) and I_PCM (25) are out of the implemented
          // subset; loud refusal, never garbage pixels
          return Left(if (mbType <= 25) "unsupported_mb" else "bad_stream")
        }
        // intra4x4 pred modes, in coding order
        val modes = new Array[Int](16)
        var b = 0
        while (b < 16) {
          val (ox, oy) = blk4x4Offset(b)
          val bx = 4 * mbX + (ox >> 2); val by = 4 * mbY + (oy >> 2)
          val mA = if (bx == 0) -1
            else predModes(by * 4 * wMbs + bx - 1)
          val mB = if (by == 0) -1
            else predModes((by - 1) * 4 * wMbs + bx)
          val predMode =
            if (mA < 0 || mB < 0) 2
            else math.min(mA, mB)
          val mode =
            if (r.u(1) == 1) predMode
            else {
              val rem = r.u(3)
              if (rem < predMode) rem else rem + 1
            }
          modes(b) = mode
          predModes(by * 4 * wMbs + bx) = mode
          b += 1
        }
        val chromaMode = r.ue()
        if (chromaMode > 3) return Left("bad_stream")
        val cbpCode = r.ue()
        if (cbpCode >= 48) return Left("bad_stream")
        val cbp = CbpIntra(cbpCode)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4
        if (cbp != 0) {
          val dq = r.se()
          qp = qp + dq
          if (qp < 0 || qp > 51) return Left("bad_stream")
        }
        // luma blocks: predict, decode residual, reconstruct
        b = 0
        while (b < 16) {
          val (ox, oy) = blk4x4Offset(b)
          val x0 = 16 * mbX + ox; val y0 = 16 * mbY + oy
          val bx = 4 * mbX + (ox >> 2); val by = 4 * mbY + (oy >> 2)
          val leftAvail = bx > 0
          val topAvail = by > 0
          val topLeftAvail = bx > 0 && by > 0
          // top-right availability: the decoded-order rule — the block
          // above-right must already be reconstructed
          val trWithinFrame = by > 0 && bx + 1 < 4 * wMbs
          val topRightAvail = trWithinFrame && {
            // within the current MB row of blocks, above-right is
            // decoded iff it is in a previous MB or an earlier block
            val trMbX = (bx + 1) / 4; val trMbY = (by - 1) / 4
            val trMb = trMbY * wMbs + trMbX
            if (trMb < mb) true
            else if (trMb > mb) false
            else {
              // same MB: above-right block index must precede b
              val lx = (bx + 1) % 4; val ly = (by - 1) % 4
              val q = (ly / 2) * 2 + (lx / 2)
              val s = (ly % 2) * 2 + (lx % 2)
              (q * 4 + s) < b
            }
          }
          val pred = new Array[Int](16)
          if (!predict4x4(modes(b), luma, stride, x0, y0,
              leftAvail, topAvail, topLeftAvail, topRightAvail, pred))
            return Left("bad_stream")
          var levels = new Array[Int](16)
          var nz = 0
          if ((cbpLuma & (1 << (b >> 2))) != 0) {
            val nA = lumaN(bx - 1, by)
            val nB = lumaN(bx, by - 1)
            residualBlock(r, nCOf(nA, nB), 16) match {
              case Some((ls, n)) => levels = ls; nz = n
              case None => return Left("bad_stream")
            }
          }
          lumaNz(by * 4 * wMbs + bx) = nz
          // dequant + inverse transform (zigzag -> raster)
          val d = new Array[Int](16)
          var k = 0
          while (k < 16) {
            if (levels(k) != 0)
              d(Zigzag4x4(k)) = dequant(levels(k), qp, Zigzag4x4(k))
            k += 1
          }
          val res = if (nz == 0) null else idct4x4(d)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val p = pred(4 * y + x) + (if (res == null) 0 else res(4 * y + x))
              luma((y0 + y) * stride + x0 + x) = clip255(p)
              x += 1
            }
            y += 1
          }
          b += 1
        }
        // chroma: predict both planes, then DC/AC residuals
        val qpc = chromaQp(qp + pps.chromaQpOffset)
        val cx0 = 8 * mbX; val cy0 = 8 * mbY
        val cLeft = mbX > 0; val cTop = mbY > 0
        val predCb = predictChroma(chromaMode, cbP, cStride, cx0, cy0, cLeft, cTop)
          .getOrElse(return Left("bad_stream"))
        val predCr = predictChroma(chromaMode, crP, cStride, cx0, cy0, cLeft, cTop)
          .getOrElse(return Left("bad_stream"))
        // chroma DC (2x2) per plane when cbpChroma > 0
        val dcCb = new Array[Int](4); val dcCr = new Array[Int](4)
        if (cbpChroma > 0) {
          var pi = 0
          while (pi < 2) {
            val dst = if (pi == 0) dcCb else dcCr
            residualBlock(r, -1, 4) match {
              case Some((ls, _)) =>
                // 2x2 inverse Hadamard + DC dequant (§8.5.10):
                // dc = ((f * LevelScale(qPc%6, 0)) << (qPc/6)) >> 5
                val c0 = ls(0); val c1 = ls(1); val c2 = ls(2); val c3 = ls(3)
                val f0 = c0 + c1 + c2 + c3
                val f1 = c0 - c1 + c2 - c3
                val f2 = c0 + c1 - c2 - c3
                val f3 = c0 - c1 - c2 + c3
                val scale = LevelScale(qpc % 6)(0)
                def dq2(v: Int): Int = ((v * scale) << (qpc / 6)) >> 5
                dst(0) = dq2(f0); dst(1) = dq2(f1)
                dst(2) = dq2(f2); dst(3) = dq2(f3)
              case None => return Left("bad_stream")
            }
            pi += 1
          }
        }
        // chroma AC (15 coeffs) per 4x4 when cbpChroma == 2
        var ci = 0
        while (ci < 2) {
          val plane = if (ci == 0) cbP else crP
          val predP = if (ci == 0) predCb else predCr
          val dc = if (ci == 0) dcCb else dcCr
          val nzArr = if (ci == 0) cbNz else crNz
          var sb = 0
          while (sb < 4) {
            val sx = (sb % 2) * 4; val sy = (sb / 2) * 4
            val cbx = 2 * mbX + (sb % 2); val cby = 2 * mbY + (sb / 2)
            var levels = new Array[Int](16)
            var nz = 0
            if (cbpChroma == 2) {
              def cN(x: Int, y: Int): Int =
                if (x < 0 || y < 0 || x >= 2 * wMbs || y >= 2 * hMbs) -1
                else nzArr(y * 2 * wMbs + x)
              residualBlock(r, nCOf(cN(cbx - 1, cby), cN(cbx, cby - 1)), 15) match {
                case Some((ls, n)) =>
                  // AC levels occupy scan positions 1..15
                  var k = 14
                  while (k >= 0) { levels(k + 1) = ls(k); k -= 1 }
                  nz = n
                case None => return Left("bad_stream")
              }
            }
            nzArr(cby * 2 * wMbs + cbx) = nz
            val d = new Array[Int](16)
            d(0) = dc(sb)
            var k = 1
            while (k < 16) {
              if (levels(k) != 0)
                d(Zigzag4x4(k)) = dequant(levels(k), qpc, Zigzag4x4(k))
              k += 1
            }
            val res =
              if (nz == 0 && dc(sb) == 0) null else idct4x4(d)
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) {
                val p = predP(8 * (sy + y) + sx + x) +
                  (if (res == null) 0 else res(4 * y + x))
                plane((cy0 + sy + y) * cStride + cx0 + sx + x) = clip255(p)
                x += 1
              }
              y += 1
            }
            sb += 1
          }
          ci += 1
        }
        mb += 1
      }
      // crop to the SPS-stated dimensions
      val w = sps.width; val h = sps.height
      val outY = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          outY(y * w + x) = luma((y + 2 * sps.cropT) * stride + x + 2 * sps.cropL)
          x += 1
        }
        y += 1
      }
      val cw = w / 2; val ch = h / 2
      val outCb = new Array[Int](cw * ch); val outCr = new Array[Int](cw * ch)
      y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          outCb(y * cw + x) = cbP((y + sps.cropT) * cStride + x + sps.cropL)
          outCr(y * cw + x) = crP((y + sps.cropT) * cStride + x + sps.cropL)
          x += 1
        }
        y += 1
      }
      Right(Frame(w, h, outY, outCb, outCr))
    } catch { case _: IndexOutOfBoundsException => Left("bad_stream") }
  }

  // ---- avcC extraction + batched MP4 decode ---------------------------

  /** Walk an MP4 to its first AVC sample entry's decoder configuration:
    * (SPS, first PPS, NAL length-prefix size). */
  private[multimodal] def avcConfig(b: Array[Byte]):
      Either[String, (SpsDec, PpsDec, Int)] = {
    if (b == null || b.length < 16) return Left("not_mp4")
    if (!H264.children(b, 0, b.length).take(1).exists(_._1 == "ftyp"))
      return Left("not_mp4")
    val stsd = for {
      (_, mLo, mHi) <- H264.children(b, 0, b.length).find(_._1 == "moov")
      (_, tLo, tHi) <- H264.children(b, mLo, mHi).find(_._1 == "trak")
      (_, dLo, dHi) <- H264.children(b, tLo, tHi).find(_._1 == "mdia")
      (_, nLo, nHi) <- H264.children(b, dLo, dHi).find(_._1 == "minf")
      (_, sLo, sHi) <- H264.children(b, nLo, nHi).find(_._1 == "stbl")
      (_, eLo, eHi) <- H264.children(b, sLo, sHi).find(_._1 == "stsd")
    } yield (eLo, eHi)
    stsd match {
      case None => Left("no_stsd")
      case Some((lo, hi)) =>
        if (hi - lo < 16) return Left("no_stsd")
        H264.children(b, lo + 8, hi).nextOption() match {
          case Some((codec, eLo, eHi)) if codec == "avc1" || codec == "avc3" =>
            if (eHi - eLo < 78) return Left("bad_avcc")
            H264.children(b, eLo + 78, eHi).find(_._1 == "avcC") match {
              case None => Left("bad_avcc")
              case Some((_, cLo, cHi)) =>
                val cfg = java.util.Arrays.copyOfRange(b, cLo, cHi)
                if (cfg.length < 8 || (cfg(0) & 0xff) != 1)
                  return Left("bad_avcc")
                val lenSize = (cfg(4) & 3) + 1
                if ((cfg(5) & 0x1f) < 1) return Left("bad_avcc")
                val spsLen = ((cfg(6) & 0xff) << 8) | (cfg(7) & 0xff)
                if (8 + spsLen + 1 > cfg.length) return Left("bad_avcc")
                val spsNal = java.util.Arrays.copyOfRange(cfg, 8, 8 + spsLen)
                val nPps = cfg(8 + spsLen) & 0xff
                if (nPps < 1) return Left("bad_avcc")
                val pLenOff = 8 + spsLen + 1
                if (pLenOff + 2 > cfg.length) return Left("bad_avcc")
                val ppsLen = ((cfg(pLenOff) & 0xff) << 8) | (cfg(pLenOff + 1) & 0xff)
                if (pLenOff + 2 + ppsLen > cfg.length) return Left("bad_avcc")
                val ppsNal = java.util.Arrays.copyOfRange(cfg,
                  pLenOff + 2, pLenOff + 2 + ppsLen)
                for {
                  sps <- parseSpsDec(spsNal)
                  pps <- parsePps(ppsNal)
                } yield (sps, pps, lenSize)
            }
          case _ => Left("bad_avcc")
        }
    }
  }

  /** Decode one SAMPLE (length-prefixed NALs per the avcC size) by
    * finding its IDR slice NAL and decoding it. */
  private[multimodal] def decodeSample(sps: SpsDec, pps: PpsDec,
      sample: Array[Byte], lenSize: Int): Either[String, Frame] = {
    var i = 0
    while (i + lenSize <= sample.length) {
      var len = 0L
      var k = 0
      while (k < lenSize) { len = (len << 8) | (sample(i + k) & 0xff); k += 1 }
      val s = i + lenSize
      if (len <= 0 || s + len > sample.length) return Left("bad_stream")
      val e = s + len.toInt
      if ((sample(s) & 0x1f) == 5)
        return decodeIdr(sps, pps,
          java.util.Arrays.copyOfRange(sample, s, e))
      i = e
    }
    Left("bad_stream") // no IDR NAL in the sample
  }

  /** Batched H.264-in-MP4 keyframe pHash — [[Multimodal
    * .decodeMp4FramePHash]]'s shape for the AVC codec: avcC config,
    * sample-table frame extraction, REAL intra pixel decode, the SAME
    * gray-plane hash — so a clip re-encoded between MJPEG and H.264
    * collides in the banded frame dedup. Per-frame decode errors
    * surface as (frame_idx, ok=0, err="frame_decode"); config- and
    * container-level failures as one tagged ok=0 row. */
  def decodeAvcFramePHash(media: DataFrame,
      partitions: Int = 0): Dataset[Multimodal.VideoFramePHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        avcConfig(p) match {
          case Left(tag) => Seq(Multimodal.VideoFramePHash(id, 0, 0, 0L, tag))
          case Right((sps, pps, lenSize)) =>
            Multimodal.extractMp4FramesTagged(p) match {
              case Left(fam) =>
                Seq(Multimodal.VideoFramePHash(id, 0, 0, 0L, fam))
              case Right(frames) => frames.map { case (fi, bytes) =>
                decodeSample(sps, pps, bytes, lenSize) match {
                  case Right(fr) => Multimodal.VideoFramePHash(id, fi, 1,
                    Multimodal.pHash64(fr.luma, fr.width, fr.height), "")
                  case Left(_) =>
                    Multimodal.VideoFramePHash(id, fi, 0, 0L, "frame_decode")
                }
              }
            }
        }
      }
  }

  // ---- fixture encoder (REAL encode; recon == target REQUIREd) --------

  private[multimodal] def ppsBytes(picInitQp: Int = 16): Array[Byte] = {
    val w = new H264.BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.bit(0) // entropy_coding_mode: CAVLC
    w.bit(0) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.bit(0); w.bits(0L, 2) // weighted_pred, weighted_bipred_idc
    w.se(picInitQp.toLong - 26)
    w.se(0) // pic_init_qs
    w.se(0) // chroma_qp_index_offset
    w.bit(1) // deblocking_filter_control_present
    w.bit(0) // constrained_intra_pred
    w.bit(0) // redundant_pic_cnt_present
    w.rbspTrailing()
    Array[Byte](0x68) ++ H264.addEmulation(w.toRbsp)
  }

  /** Encode the coeff_token / sign / total_zeros bits for a DC-only
    * (or empty) 4x4 luma block — the encoder side of the CAVLC subset
    * the fixture law produces. Shares the decoder's tables. */
  private def writeDcOnlyBlock(w: H264.BitWriter, nC: Int, level: Int): Unit = {
    val cls = if (nC < 2) 0 else if (nC < 4) 1 else 2
    def token(tc: Int, t1: Int): Unit =
      if (nC >= 8) w.bits(if (tc == 0) 3L else (((tc - 1) << 2) | t1).toLong, 6)
      else {
        val (len, bits) = CoeffTokenVlc(cls)(tc)(t1)
        w.bits(bits.toLong, len)
      }
    if (level == 0) { token(0, 0); return }
    if (math.abs(level) == 1) {
      token(1, 1)
      w.bit(if (level < 0) 1 else 0)
    } else {
      token(1, 0)
      // first non-T1 coefficient with t1 < 3: levelCode -= 2 (§9.2.2.1)
      val levelCode = 2 * (math.abs(level) - 1) + (if (level < 0) 1 else 0) - 2
      if (levelCode < 14) { w.bits(0L, levelCode); w.bit(1) }
      else if (levelCode < 30) {
        w.bits(0L, 14); w.bit(1); w.bits((levelCode - 14).toLong, 4)
      } else {
        require(levelCode < 30 + 4096, s"level out of fixture range: $level")
        w.bits(0L, 15); w.bit(1); w.bits((levelCode - 30).toLong, 12)
      }
    }
    // total_zeros(totalCoeff = 1, totalZeros = 0)
    val (tzLen, tzBits) = TotalZerosVlc(0)(0)
    w.bits(tzBits.toLong, tzLen)
  }

  /** Spec hook: encode one DC-only block and decode it back — pins
    * the CAVLC encoder and decoder to each other across the full
    * level range including both escape regimes. Returns the decoded
    * (levels, totalCoeff). */
  private[multimodal] def roundTripDcOnly(nC: Int,
      level: Int): Option[(Array[Int], Int)] = {
    val w = new H264.BitWriter
    writeDcOnlyBlock(w, nC, level)
    w.rbspTrailing()
    residualBlock(new Reader(w.toRbsp), nC, 16)
  }

  /** REAL I_4x4 IDR encode of a gray frame: DC prediction per 4x4
    * block from the reconstructed plane, DC-only residual at the
    * exact-reconstruction operating point QP 16 (dequant scale
    * 16 << 2 = 64, so the inverse transform adds exactly `level` to
    * every sample), flat-128 chroma (zero residual, cbp chroma 0).
    * `target(x, y)` gives the luma plane; recon == target is REQUIREd
    * per block — the Vp8 fixture-encoder discipline. Returns the IDR
    * slice NAL. */
  private[multimodal] def encodeIdrGray(wMbs: Int, hMbs: Int,
      target: (Int, Int) => Int): Array[Byte] = {
    val qp = 16
    val stride = 16 * wMbs
    val recon = new Array[Int](stride * 16 * hMbs)
    val lumaNz = Array.fill(4 * wMbs * 4 * hMbs)(-1)
    val w = new H264.BitWriter
    // slice header
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices)
    w.ue(0) // pps id
    w.bits(0L, 4) // frame_num (log2 4)
    w.ue(0) // idr_pic_id
    w.bits(0L, 4) // pic_order_cnt_lsb (poc type 0, log2 4)
    w.bit(0); w.bit(0) // dec_ref_pic_marking: no_output, long_term
    w.se(0) // slice_qp_delta (qp = pic_init_qp = 16)
    w.ue(1) // disable_deblocking_filter_idc = 1
    var mb = 0
    while (mb < wMbs * hMbs) {
      val mbX = mb % wMbs; val mbY = mb / wMbs
      w.ue(0) // mb_type I_NxN
      var b = 0
      while (b < 16) { w.bit(1); b += 1 } // prev_intra4x4_pred_mode (DC)
      w.ue(0) // intra_chroma_pred_mode DC
      w.ue(2) // coded_block_pattern 15 (luma all, chroma none): codeNum 2
      w.se(0) // mb_qp_delta
      b = 0
      while (b < 16) {
        val (ox, oy) = blk4x4Offset(b)
        val x0 = 16 * mbX + ox; val y0 = 16 * mbY + oy
        val bx = 4 * mbX + (ox >> 2); val by = 4 * mbY + (oy >> 2)
        val leftAvail = bx > 0; val topAvail = by > 0
        val dc =
          if (leftAvail && topAvail) {
            var s = 0; var i = 0
            while (i < 4) {
              s += recon((y0 - 1) * stride + x0 + i)
              s += recon((y0 + i) * stride + x0 - 1)
              i += 1
            }
            (s + 4) >> 3
          } else if (leftAvail) {
            var s = 0; var i = 0
            while (i < 4) { s += recon((y0 + i) * stride + x0 - 1); i += 1 }
            (s + 2) >> 2
          } else if (topAvail) {
            var s = 0; var i = 0
            while (i < 4) { s += recon((y0 - 1) * stride + x0 + i); i += 1 }
            (s + 2) >> 2
          } else 128
        val t = target(x0, y0)
        // the fixture law is constant per 4x4 block — REQUIRE it
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            require(target(x0 + xx, y0 + yy) == t,
              s"fixture law must be constant per 4x4 block at ($x0,$y0)")
            xx += 1
          }
          yy += 1
        }
        val level = t - dc
        val nA = if (bx == 0) -1 else lumaNz(by * 4 * wMbs + bx - 1)
        val nB = if (by == 0) -1 else lumaNz((by - 1) * 4 * wMbs + bx)
        val nC =
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        writeDcOnlyBlock(w, nC, level)
        lumaNz(by * 4 * wMbs + bx) = if (level == 0) 0 else 1
        // reconstruct exactly as the decoder will: dequant 64·level,
        // idct adds level to every sample
        val v = clip255(dc + level)
        require(v == t, s"QP16 exact-recon violated at ($x0,$y0): $v != $t")
        yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) { recon((y0 + yy) * stride + x0 + xx) = v; xx += 1 }
          yy += 1
        }
        b += 1
      }
      // cbp chroma 0: no chroma residual syntax
      mb += 1
    }
    w.rbspTrailing()
    Array[Byte](0x65) ++ H264.addEmulation(w.toRbsp) // IDR, nri 3
  }

  /** Assemble a playable intra-only AVC MP4: ftyp + mdat (length-
    * prefixed IDR NAL samples) + moov with stsd(avc1+avcC(SPS,PPS))
    * and the stts/stsz/stco tables. */
  private[multimodal] def avcMp4(wMbs: Int, hMbs: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    import Multimodal.{mp4Box, u32s}
    val sps = H264.spsBytes(66, 30, wMbs, hMbs)
    val pps = ppsBytes()
    val samples = frames.map { nal =>
      u32s(nal.length.toLong) ++ nal
    }
    val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32s(0L) ++
      "isom".getBytes("ISO-8859-1"))
    val mdat = mp4Box("mdat", samples.foldLeft(Array.emptyByteArray)(_ ++ _))
    val off0 = ftyp.length + 8
    val entryFixed = new Array[Byte](78)
    entryFixed(7) = 1 // data_reference_index
    val avcCBox = mp4Box("avcC", H264.avcCBytes(sps, pps = pps))
    val entry = mp4Box("avc1", entryFixed ++ avcCBox)
    val stsd = mp4Box("stsd", u32s(0L, 1L), entry)
    val stts = mp4Box("stts", u32s(0L, 1L, frames.length.toLong, 100L))
    val stsz = mp4Box("stsz", u32s(0L, 0L, frames.length.toLong),
      u32s(samples.map(_.length.toLong): _*))
    val stco = mp4Box("stco", u32s(0L, 1L), u32s(off0.toLong))
    val moov = mp4Box("moov", mp4Box("trak", mp4Box("mdia",
      mp4Box("minf", mp4Box("stbl", stsd, stts, stsz, stco)))))
    ftyp ++ mdat ++ moov
  }

  /** Deterministic H.264-clip corpus — the q140 pixel family carried
    * by the REAL codec: each doc is an intra-only AVC MP4 of
    * 3 + id%4 IDR frames, 64×64 luma, per-8×8-block constants
    * ((pseed·73 + f·29 + bx·37 + by·91) mod 17) · 15 with
    * pseed = id%10 — the SAME law the MJPEG fixture muxes, so an
    * H.264 re-encode of an MJPEG clip is a cross-codec dup BY
    * CONSTRUCTION. Every id%6==4 clip's frame 1 NAL is corrupted in
    * mdat (sizes stay true): extraction succeeds, the DECODE error
    * path surfaces per-frame as err="frame_decode". */
  def avcClipCorpusFromDocuments(documents: DataFrame,
      sampleMod: Int = 1, sampleRem: Int = 0): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents)
      .filter(id => java.lang.Math.floorMod(id, sampleMod.toLong) == sampleRem.toLong)
      .map { id =>
        val fm = (x: Long, m: Long) => java.lang.Math.floorMod(x, m)
        val nf = (3L + fm(id, 4L)).toInt
        val frames = (0 until nf).map { f =>
          encodeIdrGray(4, 4, (x, y) =>
            (((fm(id, 10L) * 73L + f * 29L +
              (x / 8) * 37L + (y / 8) * 91L) % 17L) * 15L).toInt)
        }
        val out = avcMp4(4, 4, frames)
        if (fm(id, 6L) == 4L && nf > 1) {
          // frame 1's NAL header byte inside mdat: after ftyp header,
          // mdat header, sample 0, and frame 1's 4-byte length
          val ftypLen = 24 // 8 + "isom" + minor + "isom"
          val p1 = ftypLen + 8 + (4 + frames(0).length) + 4
          out(p1) = 0 // NAL type 0: no IDR in the sample -> bad_stream
        }
        (id, out)
      }.toDF("media_id", "payload")
  }
}
