package graft.multimodal

import graft.SparkSpec

class WebpSpec extends SparkSpec {

  test("lossy: keyframe dims parse; non-keyframe and broken start code refuse") {
    val good = Webp.webpBytes(Seq(("VP8 ", Webp.vp8Payload(320, 180,
      badStart = false, filler = 5))))
    val r = Webp.parseWebp(1L, good)
    assert(r.ok == 1 && r.format == "lossy" && r.width == 320 &&
      r.height == 180 && r.has_alpha == 0 && r.animated == 0 && r.n_chunks == 1)
    val badStart = Webp.webpBytes(Seq(("VP8 ", Webp.vp8Payload(320, 180,
      badStart = true, filler = 5))))
    assert(Webp.parseWebp(1L, badStart).err == "bad_bitstream")
    // interframe first (frame-tag type bit set) cannot start a file
    val inter = good.clone()
    inter(20) = (inter(20) | 1).toByte // payload starts at 12+8
    assert(Webp.parseWebp(1L, inter).err == "bad_bitstream")
  }

  test("lossless: LE-packed dims/alpha parse; nonzero version refuses") {
    for (alpha <- Seq(false, true)) {
      val g = Webp.webpBytes(Seq(("VP8L", Webp.vp8lPayload(16384, 1,
        alpha, badVersion = false, filler = 2))))
      val r = Webp.parseWebp(2L, g)
      assert(r.ok == 1 && r.format == "lossless" && r.width == 16384 &&
        r.height == 1 && r.has_alpha == (if (alpha) 1 else 0))
    }
    val bad = Webp.webpBytes(Seq(("VP8L", Webp.vp8lPayload(64, 64,
      alpha = false, badVersion = true, filler = 2))))
    assert(Webp.parseWebp(2L, bad).err == "bad_bitstream")
  }

  test("extended: flags + canvas parse; missing image chunk refuses") {
    val g = Webp.webpBytes(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = true, anim = true, 4096, 2160)),
      ("VP8 ", Webp.vp8Payload(4096, 2160, badStart = false, filler = 0))))
    val r = Webp.parseWebp(3L, g)
    assert(r.ok == 1 && r.format == "extended" && r.width == 4096 &&
      r.height == 2160 && r.has_alpha == 1 && r.animated == 1 && r.n_chunks == 2)
    val lone = Webp.webpBytes(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = false, anim = false, 64, 64))))
    assert(Webp.parseWebp(3L, lone).err == "no_image")
    // wrong VP8X payload length is a bitstream violation, not truncation
    val short = Webp.webpBytes(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = false, anim = false, 64, 64).take(8)),
      ("VP8 ", Webp.vp8Payload(64, 64, badStart = false, filler = 0))))
    assert(Webp.parseWebp(3L, short).err == "bad_bitstream")
  }

  test("truncation refuses at BOTH the RIFF and chunk levels, magic first") {
    val chunks = Seq(("VP8 ", Webp.vp8Payload(64, 64, badStart = false, filler = 3)))
    assert(Webp.parseWebp(4L, Webp.webpBytes(chunks, breakMagic = true))
      .err == "not_webp")
    assert(Webp.parseWebp(4L, Webp.webpBytes(chunks, riffOversize = 40))
      .err == "truncated")
    assert(Webp.parseWebp(4L, Webp.webpBytes(chunks, chunkOversize = 60))
      .err == "truncated")
    // the truncated payloads actually END where the parser refuses: no
    // trailing bytes satisfy the declared sizes (the fixture discipline)
    val t = Webp.webpBytes(chunks, chunkOversize = 60)
    assert(t.length == Webp.webpBytes(chunks).length)
  }

  test("odd-sized chunks carry a pad byte between chunks and parse clean") {
    val odd = Webp.vp8lPayload(10, 10, alpha = false, badVersion = false,
      filler = 0) // 5 bytes -> odd
    val g = Webp.webpBytes(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = false, anim = false, 10, 10)),
      ("VP8L", odd)))
    // VP8X first: even, no pad; the walk still lands chunk 2 correctly
    val r = Webp.parseWebp(5L, g)
    assert(r.ok == 1 && r.format == "extended" && r.n_chunks == 2)
    val g2 = Webp.webpBytes(Seq(("VP8L", odd),
      ("VP8X", Webp.vp8xPayload(alpha = false, anim = false, 10, 10))))
    // odd FIRST chunk followed by another: the pad byte must be walked
    val r2 = Webp.parseWebp(5L, g2)
    assert(r2.ok == 1 && r2.format == "lossless" && r2.n_chunks == 2)
  }

  test("corpus: every arm lands its closed-form row through the batch path") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val out = Webp.decodeWebpInfo(Webp.webpCorpusFromDocuments(ids))
      .collect().map(r => r.media_id -> r).toMap
    assert(out.size == 200)
    for (id <- 0L until 200L) {
      val r = out(id)
      def m(k: Long): Long = java.lang.Math.floorMod(id, k)
      if (m(7) == 2) assert(r.err == "not_webp", s"id=$id")
      else if (m(7) == 4) assert(r.err == "truncated", s"id=$id")
      else if (m(11) == 5) assert(r.err == "bad_bitstream", s"id=$id")
      else if (m(13) == 3) assert(r.err == "no_image", s"id=$id")
      else {
        assert(r.ok == 1 && r.width == 16 + m(200) && r.height == 16 + m(150),
          s"id=$id -> $r")
        assert(r.format == Seq("lossy", "lossless", "extended")(m(3).toInt))
        if (m(3) == 2) assert(r.animated == (if (m(5) == 0) 1 else 0))
      }
    }
  }

  test("animated WebP: ANMF walk, per-frame decode, refusal arms") {
    val px = Array.tabulate(64 * 64)(i => 0xff000000 | ((i % 7) * 30 << 8))
    def vp8l = Vp8l.encode(64, 64, px, Vp8l.VariantPlain)
    // three frames, middle one corrupted
    val broken = vp8l; broken(0) = 0x00
    val anim = Webp.animWebpBytes(64, 64,
      Seq((vp8l, 40), (broken, 50), (vp8l, 60)))
    val frames = Webp.animFrames(anim)
    assert(frames.isRight && frames.toOption.get.length == 3)
    assert(frames.toOption.get.map(_._1) == Seq(40, 50, 60))
    // the animation flag is required
    val still = Webp.animWebpBytes(64, 64, Seq((vp8l, 40)), animFlag = false)
    assert(Webp.animFrames(still) == Left("not_animated"))
    // a plain lossless still is not an animation either
    val plain = Webp.webpBytes(Seq(("VP8L", vp8l)))
    assert(Webp.animFrames(plain) == Left("not_animated"))
    // batch path: the broken middle frame keeps its duration
    import spark.implicits._
    val rows = Webp.decodeAnimPHash(
      Seq((7L, anim)).toDF("media_id", "payload")).collect().sortBy(_.frame_idx)
    assert(rows.length == 3)
    assert(rows(0).ok == 1 && rows(2).ok == 1 && rows(0).phash == rows(2).phash)
    assert(rows(1).ok == 0 && rows(1).err == "frame_decode" &&
      rows(1).duration_ms == 50)
  }

  test("parseImageHeader sniffs webp after png/jpeg") {
    val g = Webp.webpBytes(Seq(("VP8L", Webp.vp8lPayload(33, 44,
      alpha = true, badVersion = false, filler = 1))))
    assert(Multimodal.parseImageHeader(g) ===
      Some(("webp", 33, 44, 8, 4, "lossless")))
    assert(Multimodal.parseImageHeader("RIFFxxxxNOPE".getBytes("ISO-8859-1")).isEmpty)
  }

  test("ALPH: every (storage, filter) shape recovers the exact alpha plane") {
    val w = 33; val h = 17 // odd dims: border rules on partial rows
    val alpha = Array.tabulate[Byte](w * h)(i =>
      ((i * 7 + i / w * 3) % 256).toByte)
    for (vp8l <- Seq(false, true); f <- 0 to 3) {
      val file = Webp.webpBytes(Seq(
        ("VP8X", Webp.vp8xPayload(alpha = true, anim = false, w, h)),
        ("ALPH", Webp.alphPayload(w, h, alpha, filter = f, vp8l = vp8l)),
        ("VP8 ", Webp.vp8Payload(w, h, badStart = false, filler = 8))))
      val r = Webp.decodeAlpha(file)
      assert(r.isRight, s"vp8l=$vp8l f=$f: $r")
      val (dw, dh, plane) = r.toOption.get
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(plane, alpha),
        s"alpha plane mismatch (vp8l=$vp8l filter=$f)")
    }
  }

  test("ALPH refusals: missing chunk, reserved bits, bad container") {
    val w = 16; val h = 16
    val alpha = Array.fill[Byte](w * h)(200.toByte)
    val alph = Webp.alphPayload(w, h, alpha, filter = 1, vp8l = true)
    def file(chunks: Seq[(String, Array[Byte])]) = Webp.webpBytes(chunks)
    assert(Webp.decodeAlpha(file(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = true, anim = false, w, h)),
      ("VP8 ", Webp.vp8Payload(w, h, badStart = false, filler = 4)))))
      == Left("no_alpha"))
    val bad = alph.clone(); bad(0) = (bad(0) | 0x40).toByte
    assert(Webp.decodeAlpha(file(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = true, anim = false, w, h)),
      ("ALPH", bad)))) == Left("bad_alpha"))
    assert(Webp.decodeAlpha(file(Seq(("ALPH", alph)))) == Left("no_vp8x"))
    assert(Webp.decodeAlpha(Array[Byte](1, 2, 3)) == Left("not_webp"))
    // raw storage shorter than the plane
    val shortRaw = Array[Byte](0x00, 1, 2, 3)
    assert(Webp.decodeAlpha(file(Seq(
      ("VP8X", Webp.vp8xPayload(alpha = true, anim = false, w, h)),
      ("ALPH", shortRaw)))) == Left("truncated"))
  }
}
