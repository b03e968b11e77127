package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JpegSpec extends SparkSpec {
  import spark.implicits._

  test("DC-only round trip: decoded pixels are exactly the block constants (gray + color)") {
    // 3x2 block grid, values crossing every DC category sign/size:
    // predictor deltas positive, negative, zero, and extreme
    val vals = Array(Array(0, 255, 128), Array(1, 254, 128))
    def bv(bx: Int, by: Int, c: Int): Int = if (c == 0) vals(by)(bx) else 128
    for (comps <- Seq(1, 3)) {
      val bytes = Jpeg.dcOnlyBytes(24, 16, comps, bv)
      // the stream parses as a JPEG header too (shared SOF walk)
      assert(Multimodal.parseJpegHeader(bytes)
        .contains(("jpeg", 24, 16, 8, comps, "baseline")))
      val Some((w, h, nc, rgb)) = Jpeg.decodeJpegPixels(bytes)
      assert(w == 24 && h == 16 && nc == comps)
      for (y <- 0 until 16; x <- 0 until 24; ch <- 0 until 3) {
        val expect = vals(y / 8)(x / 8)
        assert((rgb((y * 24 + x) * 3 + ch) & 0xff) == expect,
          s"comps=$comps pixel ($x,$y,$ch)")
      }
    }
  }

  test("AC path: a hand-assembled stream with one AC coefficient decodes via the full entropy chain") {
    // build a single-block grayscale stream by hand: DC table = the
    // fixture's 12x4-bit canonical table; AC table with EOB (len 1),
    // plus (0,1) and (1,1) at len 2 — exercises run/size decode and
    // zigzag placement, not just EOB
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def w16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); w16(2 + 65); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xc0); w16(8 + 3); out.write(8); w16(8); w16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 until 12).foreach(out.write)
    m(0xc4); w16(2 + 17 + 3); out.write(0x10)
    Array(1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(0x00); out.write(0x01); out.write(0x11) // EOB="0", (0,1)="10", (1,1)="11"
    m(0xda); w16(6 + 2); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy bits: DC cat2 "0010" + bits "10" (=+2) ; AC (0,1) "10" +
    // bit "1" (=+1 at zigzag 1) ; AC (1,1) "11" + bit "0" (=-1 after
    // extend, at zigzag 3 = natural (3,0)->row0 col3? zigzag(3)=16) ;
    // EOB "0"  -> pad with 1s
    val bits = "0010" + "10" + "10" + "1" + "11" + "0" + "0"
    val padded = bits + "1" * ((8 - bits.length % 8) % 8)
    padded.grouped(8).foreach(g => out.write(Integer.parseInt(g, 2)))
    m(0xd9)
    val Some((w, h, nc, rgb)) = Jpeg.decodeJpegPixels(out.toByteArray)
    assert(w == 8 && h == 8 && nc == 1)
    // reference: coefficients DC=2, zigzag(1)->natural 1 = +1,
    // zigzag(3)->natural 16 = -1 (all dequantized by 1)
    val coef = new Array[Int](64)
    coef(0) = 2; coef(1) = 1; coef(16) = -1
    def ref(x: Int, y: Int): Int = {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8; if coef(v * 8 + u) != 0) {
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        s += cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      val r = Math.round(s / 4.0 + 128.0).toInt
      math.max(0, math.min(255, r))
    }
    for (y <- 0 until 8; x <- 0 until 8)
      assert((rgb((y * 8 + x) * 3) & 0xff) == ref(x, y), s"pixel ($x,$y)")
  }

  test("4:2:0 round trip: subsampled MCU order and half-res chroma indexing") {
    // 32x16 = 2 MCUs: distinct luma per 8-block, distinct chroma per
    // MCU — a swapped MCU block order or wrong chroma index is visible
    val luma = Array(Array(10, 60, 110, 160), Array(35, 85, 135, 185))
    def lv(bx: Int, by: Int) = luma(by)(bx)
    def cv(mx: Int, my: Int, c: Int) = 88 + 20 * ((mx + 2 * c) % 5)
    val bytes = Jpeg.dcOnly420Bytes(32, 16, lv, cv)
    val Some((w, h, nc, rgb)) = Jpeg.decodeJpegPixels(bytes)
    assert(w == 32 && h == 16 && nc == 3)
    def cl(d: Double) = math.max(0, math.min(255, Math.round(d).toInt))
    for (y <- 0 until 16; x <- 0 until 32) {
      val p = lv(x / 8, y / 8)
      val c1 = cv(x / 16, 0, 0) - 128
      val c2 = cv(x / 16, 0, 1) - 128
      val o = (y * 32 + x) * 3
      assert((rgb(o) & 0xff) == cl(p + 1.402 * c2), s"R($x,$y)")
      assert((rgb(o + 1) & 0xff) == cl(p - 0.344136 * c1 - 0.714136 * c2), s"G($x,$y)")
      assert((rgb(o + 2) & 0xff) == cl(p + 1.772 * c1), s"B($x,$y)")
    }
    // the generated 4:2:0 corpus decodes clean, negative ids included
    val stats = Multimodal.decodeJpegPixelStats(
      Multimodal.jpeg420CorpusFromDocuments(Seq(0L, 1L, -5L).toDF("doc_id"))).toDF()
    assert(stats.where(col("format") === "unknown").isEmpty)
    // 4:2:2 (luma 2x1) stays out of scope -> rejected
    val b422 = bytes.clone()
    val sofAt = (0 until b422.length - 1).find(i =>
      (b422(i) & 0xff) == 0xff && (b422(i + 1) & 0xff) == 0xc0).get
    b422(sofAt + 11) = 0x21.toByte
    assert(Jpeg.decodeJpegPixels(b422).isEmpty)
  }

  test("restart intervals: RSTm sequence + predictor resets round-trip; bad sequence rejected") {
    // 4x3 = 12 blocks, restart every 2 MCUs: 5 RST markers, predictors
    // reset at each — values chosen so a missed reset shifts every
    // block after the first boundary
    def pix(bx: Int, by: Int, c: Int) = (40 * bx + 70 * by + 10 * c) % 256
    val bytes = Jpeg.dcOnlyBytes(32, 24, 3, pix, restartInterval = 2)
    // the stream really contains RST markers
    val nRst = (0 until bytes.length - 1).count(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0 &&
        (bytes(i + 1) & 0xff) <= 0xd7)
    assert(nRst == 5, s"expected 5 restart markers, found $nRst")
    val Some((w, h, nc, rgb)) = Jpeg.decodeJpegPixels(bytes)
    assert(w == 32 && h == 24 && nc == 3)
    def cl(d: Double) = math.max(0, math.min(255, Math.round(d).toInt))
    for (y <- 0 until 24; x <- 0 until 32) {
      val p = pix(x / 8, y / 8, 0)
      val c1 = pix(x / 8, y / 8, 1) - 128; val c2 = pix(x / 8, y / 8, 2) - 128
      assert((rgb((y * 32 + x) * 3) & 0xff) == cl(p + 1.402 * c2), s"R($x,$y)")
    }
    // breaking the modulo-8 restart sequence must reject, not shift
    val bad = bytes.clone()
    val firstRst = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd0).get
    bad(firstRst + 1) = 0xd5.toByte
    assert(Jpeg.decodeJpegPixels(bad).isEmpty)
  }

  test("out-of-scope and malformed streams are rejected, never misdecoded") {
    val good = Jpeg.dcOnlyBytes(8, 8, 1, (_, _, _) => 100)
    assert(Jpeg.decodeJpegPixels(good).isDefined)
    assert(Jpeg.decodeJpegPixels(null).isEmpty)
    assert(Jpeg.decodeJpegPixels(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decodeJpegPixels(good.take(30)).isEmpty) // truncated tables
    assert(Jpeg.decodeJpegPixels(good.dropRight(8)).isEmpty) // truncated entropy+EOI
    // a BASELINE stream whose SOF marker is flipped to SOF2 routes to
    // the progressive path and rejects there: a baseline scan header
    // (Ss=0, Se=63) is not a legal progressive scan
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeJpegPixels(prog).isEmpty)
    // subsampled (2x1 luma) -> rejected: find SOF0 comp-1 hv byte
    val sub = good.clone()
    sub(sofAt + 11) = 0x21.toByte // comp 1 h=2 v=1
    assert(Jpeg.decodeJpegPixels(sub).isEmpty)
    // header-only prefix from the header synthesizer (no scan) -> None
    assert(Jpeg.decodeJpegPixels(Multimodal.jpegHeaderBytes(16, 16)).isEmpty)
  }

  test("generated corpus decodes to the closed-form block constants distributively") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
    val stats = Multimodal.decodeJpegPixelStats(
      Multimodal.jpegDcCorpusFromDocuments(docs)).toDF()
    assert(stats.where(col("format") === "unknown").isEmpty,
      "every generated payload must decode")
    val r = stats.where(col("media_id") === 2L).collect()(0)
    // id=2: 3x1 blocks, color (channels 3) with ACTIVE chroma
    // cb=108 (c1=-20), cr=128 (c2=0): R stays the luma, G/B shift
    assert(r.getInt(2) == 24 && r.getInt(3) == 8 && r.getInt(4) == 3)
    def cl(d: Double) = math.max(0L, math.min(255L, Math.round(d)))
    val ps = (0 until 3).map(bx => (29L * 2 + 17 * bx) % 256)
    assert(r.getLong(5) == ps.map(p => 64L * cl(p + 1.402 * 0)).sum)
    assert(r.getLong(6) == ps.map(p => 64L * cl(p - 0.344136 * -20 - 0.714136 * 0)).sum)
    assert(r.getLong(7) == ps.map(p => 64L * cl(p + 1.772 * -20)).sum)
    assert(stats.count() == 40)
    // negative ids produce valid streams too (floorMod geometry)
    val neg = Seq(-7L).toDF("doc_id")
    val negStats = Multimodal.decodeJpegPixelStats(
      Multimodal.jpegDcCorpusFromDocuments(neg)).toDF().collect()
    assert(negStats.length == 1 && negStats(0).getString(1) == "jpeg")
  }

  test("progressive DC-only parity: multi-scan decode equals the baseline decode bit-for-bit") {
    // same constants through two codings: one baseline scan vs DC
    // first (Al=1) + DC refinement + per-component AC first/refine
    // whose EOB runs span the all-zero blocks — any successive-
    // approximation or EOB-run slip breaks the byte-array equality
    for (id <- 0L until 24L) {
      val nbx = (id % 3 + 1).toInt; val nby = (id % 2 + 1).toInt
      val comps = if (id % 2 == 0) 3 else 1
      def pv(bx: Int, by: Int, c: Int): Int =
        if (c == 0) ((29 * id + 17 * bx + 23 * by) % 256).toInt
        else if (c == 1) 108 else 148
      val base = Jpeg.dcOnlyBytes(nbx * 8, nby * 8, comps, pv)
      val prog = Jpeg.progressiveBytes(nbx * 8, nby * 8, comps,
        (bx, by, c, k) => if (k == 0) pv(bx, by, c) - 128 else 0)
      // the stream classifies as progressive at header level (q77)
      assert(Multimodal.parseJpegHeader(prog)
        .contains(("jpeg", nbx * 8, nby * 8, 8, comps, "progressive")))
      val Some((w1, h1, c1, p1)) = Jpeg.decodeJpegPixels(base)
      val Some((w2, h2, c2, p2)) = Jpeg.decodeJpegPixels(prog)
      assert(w1 == w2 && h1 == h2 && c1 == c2, s"id=$id dims")
      assert(java.util.Arrays.equals(p1, p2), s"id=$id pixels")
    }
  }

  test("progressive AC coefficients decode exactly against a reference IDCT") {
    // random sparse AC patterns: magnitudes >= 2 exercise first-scan
    // placement + refinement correction bits, magnitudes == 1 the
    // new-in-refinement path, runs >= 16 the ZRL split, all-zero
    // stretches the EOB-run machinery; decoded grayscale must match
    // an independent float IDCT of the dequantized coefficients
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 25) {
      val coefs = Array.fill(64)(0)
      coefs(0) = rnd.nextInt(200) - 100
      for (_ <- 0 until (3 + rnd.nextInt(6)))
        coefs(1 + rnd.nextInt(63)) = rnd.nextInt(13) - 6
      val prog = Jpeg.progressiveBytes(8, 8, 1, (_, _, _, k) => coefs(k))
      val Some((8, 8, 1, rgb)) = Jpeg.decodeJpegPixels(prog)
      val deq = coefs.clone(); deq(0) = coefs(0) * 8 // the q(0)=8 table
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8; if deq(v * 8 + u) != 0) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * deq(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        val expect = math.max(0, math.min(255, Math.round(s / 4 + 128).toInt))
        assert((rgb((y * 8 + x) * 3) & 0xff) == expect,
          s"trial $trial pixel ($x,$y)")
      }
    }
  }

  test("progressive malformed scans are rejected, never misdecoded") {
    val good = Jpeg.progressiveBytes(16, 8, 1,
      (bx, by, _, k) => if (k == 0) (40 + 50 * bx + 90 * by) - 128 else 0)
    assert(Jpeg.decodeJpegPixels(good).isDefined)
    assert(Jpeg.decodeProgressivePixels(good.take(40)).isEmpty)
    assert(Jpeg.decodeProgressivePixels(good.dropRight(6)).isEmpty) // truncated scans
    // an AC scan claiming two components is illegal (T.81: Ss>0 => ns=1):
    // find the first SOS with Ss=1 and bump its component count byte
    def findSos(b: Array[Byte], pred: Int => Boolean): Int =
      (0 until b.length - 9).find { i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda && pred(i)
      }.get
    val twoComp = good.clone()
    val sosAt = findSos(twoComp, i => (twoComp(i + 4) & 0xff) == 1 &&
      (twoComp(i + 7) & 0xff) == 1) // ns=1 scan whose Ss byte == 1
    // rewriting ns to 2 misaligns the header fields -> must reject
    twoComp(sosAt + 4) = 2.toByte
    assert(Jpeg.decodeProgressivePixels(twoComp).isEmpty)
    // successive approximation must step by one bit: Ah=3 with Al=0
    val badAh = good.clone()
    val sos2 = findSos(badAh, i => ((badAh(i + 9) & 0xff) >> 4) == 1)
    badAh(sos2 + 9) = 0x30.toByte // Ah=3, Al=0
    assert(Jpeg.decodeProgressivePixels(badAh).isEmpty)
  }

  test("4:2:2: exact pixels, half-width chroma indexing, scope boundary") {
    // 2×2 MCUs of 16×8: chroma varies per MCU in BOTH axes
    val b = Jpeg.dcOnly422Bytes(32, 16,
      (bx, by) => 16 * bx + 64 * by + 8,
      (mx, my, c) => 128 + (if (c == 0) 20 * mx else -20 * my))
    val Some((w, h, nc, rgb)) = Jpeg.decodeJpegPixels(b)
    assert((w, h, nc) == (32, 16, 3))
    // spot-check pixels against the closed-form color conversion
    def expect(x: Int, y: Int): (Int, Int, Int) = {
      val p = 16 * (x / 8) + 64 * (y / 8) + 8
      val cb = 20 * (x / 16)
      val cr = -20 * (y / 8)
      def c8(v: Double) = math.max(0, math.min(255, Math.round(v).toInt))
      (c8(p + 1.402 * cr), c8(p - 0.344136 * cb - 0.714136 * cr), c8(p + 1.772 * cb))
    }
    for (x <- Seq(0, 7, 8, 15, 16, 31); y <- Seq(0, 7, 8, 15)) {
      val o = (y * 32 + x) * 3
      val got = ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
      assert(got == expect(x, y), s"pixel ($x,$y)")
    }
    // 4:1:1 (Y=4x1) stays out of the audited scope
    val b411 = b.clone()
    val sof = (0 until b411.length - 1).find(i =>
      (b411(i) & 0xff) == 0xff && (b411(i + 1) & 0xff) == 0xc0).get
    // FF C0 len(2) prec h(2) w(2) nc id -> hv at sof+11
    assert((b411(sof + 11) & 0xff) == 0x21, "fixture layout byte moved")
    b411(sof + 11) = 0x41.toByte // Y sampling 4x1
    assert(Jpeg.decodeJpegPixels(b411).isEmpty)
  }

  test("progressive scan-history violations reject: order, repeats, under-consumed scans") {
    // a fixture with real AC content so all four scans carry data
    val good = Jpeg.progressiveBytes(16, 8, 1,
      (bx, by, _, k) =>
        if (k == 0) (40 + 50 * bx + 90 * by) - 128
        else if (k == 9) 5 else 0)
    assert(Jpeg.decodeProgressivePixels(good).isDefined)
    // SOS offsets are unambiguous: inside entropy data FF is always
    // stuffed (FF 00), so a literal FF DA pair only starts a scan
    def sosOffsets(b: Array[Byte]): IndexedSeq[Int] =
      (0 until b.length - 1).filter(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda)
    val sos = sosOffsets(good)
    assert(sos.length == 4, "DC first, DC refine, AC first, AC refine")
    // a REPEATED DC first scan decodes to the same coefficients — only
    // the scan history makes it rejectable (T.81 forbids two first
    // scans over the same band)
    val dup = good.take(sos(1)) ++ good.slice(sos(0), sos(1)) ++ good.drop(sos(1))
    assert(Jpeg.decodeProgressivePixels(dup).isEmpty)
    // AC scans with the component's DC first scan DELETED: entropy
    // decodes fine (DC stays 0) — history must reject
    val noDc = good.take(sos(0)) ++ good.drop(sos(2))
    assert(Jpeg.decodeProgressivePixels(noDc).isEmpty)
    // a DC refinement whose Ah chains to no prior scan
    val refineOnly = good.take(sos(0)) ++ good.drop(sos(1))
    assert(Jpeg.decodeProgressivePixels(refineOnly).isEmpty)
    // an AC refinement whose first scan was deleted
    val acRefOnly = good.take(sos(2)) ++ good.drop(sos(3))
    assert(Jpeg.decodeProgressivePixels(acRefOnly).isEmpty)
    // trailing garbage between a scan's entropy data and the next
    // marker = an under-consumed scan; resyncing past it could even
    // hit a fake EOI and finalize early with partial coefficients
    val trail = good.take(sos(1)) ++ Array(0x37.toByte) ++ good.drop(sos(1))
    assert(Jpeg.decodeProgressivePixels(trail).isEmpty)
    val fakeEoi = good.take(sos(1)) ++
      Array(0x12.toByte, 0xff.toByte, 0xd9.toByte) ++ good.drop(sos(1))
    assert(Jpeg.decodeProgressivePixels(fakeEoi).isEmpty)
  }
}
