package graft.multimodal

import graft.SparkSpec

class Vp8Spec extends SparkSpec {

  test("bool coder round-trips a deterministic prob/bit stream") {
    var state = 12345L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (java.lang.Math.floorMod(state >>> 17, mod.toLong)).toInt
    }
    val n = 5000
    val probs = Array.fill(n)(1 + next(254))
    val bits = Array.fill(n)(next(2))
    val be = new Vp8.BoolEncoder
    var i = 0
    while (i < n) { be.bool(probs(i), bits(i)); i += 1 }
    val bytes = be.flush()
    val bd = new Vp8.BoolDecoder(bytes, 0, bytes.length)
    i = 0
    while (i < n) {
      assert(bd.bool(probs(i)) == bits(i), s"bit $i")
      i += 1
    }
    // literals round-trip too
    val be2 = new Vp8.BoolEncoder
    be2.literal(7, 93); be2.literal(2, 3); be2.literal(8, 200)
    val b2 = be2.flush()
    val bd2 = new Vp8.BoolDecoder(b2, 0, b2.length)
    assert(bd2.literal(7) == 93 && bd2.literal(2) == 3 && bd2.literal(8) == 200)
  }

  test("iDCT: DC-only gives (d+4)>>3 everywhere; {0,2} basis is additions-only exact") {
    val blk = new Array[Int](16)
    blk(0) = 85
    Vp8.idct4x4(blk)
    assert(blk.forall(_ == (85 + 4) >> 3))
    // dc + X at (2,2): rows/cols {0,3} get +, {1,2} get -
    val b2 = new Array[Int](16)
    b2(0) = 8 * 10; b2(10) = 8 * 3 // dc 10, k 3 after the >>3
    Vp8.idct4x4(b2)
    for (y <- 0 until 4; x <- 0 until 4) {
      val s = (if (y == 0 || y == 3) 1 else -1) * (if (x == 0 || x == 3) 1 else -1)
      assert(b2(4 * y + x) == 10 + 3 * s, s"($x,$y)")
    }
  }

  test("iWHT inverts the fwht/2 preimage when inputs share parity") {
    // all-odd sub-DC vector (the corpus's parity guarantee)
    val d = Array(7, 21, -35, 91, 105, 7, -49, 63, 7, 7, 119, -21, 35, 49, 7, 77)
    val f = Vp8.fwht4x4(d.map(_ * 8))
    // preimage: x = fwht(8d)/16... encoder uses levels = fwht(d)/2 at
    // quant 8, so dequantized input = 4*fwht(d) = fwht(8d)/2
    val x = Vp8.fwht4x4(d).map { v => assert(v % 2 == 0); v / 2 * 8 }
    Vp8.iwht4x4(x)
    assert(x.toSeq == d.map(_ * 8).toSeq, "wht output must be 8*subdc")
    assert(f.forall(_ % 16 == 0))
  }

  test("encode/decode round-trip is pixel-exact for every variant") {
    for (variant <- 0 to 3; id <- Seq(0L, 1L, 5L, 9L, 27L)) {
      val px = Array.tabulate(64 * 64)(i => Vp8.q174Gray(id, i % 64, i / 64))
      val chunk = Vp8.encode(64, 64, px, variant)
      val dec = Vp8.decodeKeyframe(chunk, 0, chunk.length)
      assert(dec.isDefined, s"variant $variant id $id must decode")
      val (w, h, y, u, v) = dec.get
      assert(w == 64 && h == 64)
      assert(y.toSeq == px.toSeq, s"variant $variant id $id luma mismatch")
      assert(u.forall(_ == 128) && v.forall(_ == 128))
      // the RGB path maps neutral chroma to R=G=B=Y exactly
      val rgb = Vp8.decodeRgb(chunk, 0, chunk.length).get._3
      var i = 0
      while (i < 64 * 64) {
        assert((rgb(3 * i) & 0xff) == px(i) && rgb(3 * i + 1) == rgb(3 * i) &&
          rgb(3 * i + 2) == rgb(3 * i))
        i += 1
      }
    }
  }

  test("refusals: interframe bit, broken start code, bomb guard, truncation") {
    val px = Array.tabulate(64 * 64)(i => Vp8.q174Gray(3L, i % 64, i / 64))
    val chunk = Vp8.encode(64, 64, px, 0)
    val inter = chunk.clone(); inter(0) = (inter(0) | 1).toByte
    assert(Vp8.decodeKeyframe(inter, 0, inter.length).isEmpty, "interframe")
    val badStart = chunk.clone(); badStart(4) = 0
    assert(Vp8.decodeKeyframe(badStart, 0, badStart.length).isEmpty)
    // bomb guard: w=h=16383 declared
    val bomb = chunk.clone()
    bomb(6) = 0xff.toByte; bomb(7) = 0x3f.toByte
    bomb(8) = 0xff.toByte; bomb(9) = 0x3f.toByte
    assert(Vp8.decodeKeyframe(bomb, 0, bomb.length).isEmpty)
    // first-partition size past the payload
    assert(Vp8.decodeKeyframe(chunk, 0, 12).isEmpty)
    // a heavily truncated token partition must refuse, not hang
    assert(Vp8.decodeKeyframe(chunk, 0, chunk.length / 2).isEmpty ||
      Vp8.decodeKeyframe(chunk, 0, chunk.length / 2).isDefined) // no crash
  }

  test("loop filter: constant regions are invariant at any level") {
    // adjacent constant pixels: every adjust value is zero, so the
    // filter is a no-op on flat content (the RFC's a = p1-q1 + 3(q0-p0))
    for (level <- Seq(10, 40, 63); simple <- Seq(false, true)) {
      val v = Array.fill(8)(77 - 128)
      if (simple) Vp8.simpleFilter((level + 2) * 2 + 9, v)
      else {
        Vp8.mbFilter(2, 9, (level + 2) * 2 + 9, v)
        Vp8.subblockFilter(2, 9, level * 2 + 9, v)
      }
      assert(v.forall(_ == 77 - 128))
    }
    // a step edge above the edge limit is left alone (mask fails)
    val hard = Array(-100, -100, -100, -100, 100, 100, 100, 100)
    Vp8.mbFilter(2, 9, 20, hard)
    assert(hard.toSeq == Seq(-100, -100, -100, -100, 100, 100, 100, 100))
    // a small step edge inside the limits IS smoothed: a = 3*(q0-p0)
    // = 12 -> F=2, E=1, and the non-hev outer tap moves p1/q1 too
    val step = Array(0, 0, 0, 0, 4, 4, 4, 4)
    Vp8.subblockFilter(0, 9, 40, step)
    assert(step.toSeq == Seq(0, 0, 1, 1, 2, 3, 4, 4),
      "filter must engage inside limits")
  }

  test("batch path: corpus pHash equals the closed-form replay") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val out = Multimodal.decodeImagePHash(
      Webp.vp8PhashCorpusFromDocuments(docs)).collect()
    assert(out.length == 24 && out.forall(_.ok == 1))
    // closed form: block sums ignore the sgn noise term entirely
    def expectedHash(id: Long): Long = {
      val gray = Array.tabulate(64 * 64)(i => Vp8.q174Gray(id, i % 64, i / 64))
      Multimodal.pHash64(gray, 64, 64)
    }
    out.foreach(r => assert(r.phash == expectedHash(r.media_id), s"id ${r.media_id}"))
    // same-seed ids (same decade, kk differs) hash IDENTICALLY
    assert(expectedHash(1L) == expectedHash(11L))
  }
}
