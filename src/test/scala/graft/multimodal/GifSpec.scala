package graft.multimodal

import graft.SparkSpec

class GifSpec extends SparkSpec {

  private def gray(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      (((seed * 73 + (i % w) / 8 * 37 + (i / w) / 8 * 91) % 17) * 15)
    }

  test("LZW hand vector: the classic KwKwK case decodes") {
    // alphabet {0,1} (minCode 2), encode [1,1,1,1]: clear, 1, KwKwK
    // code 6 (= "11"), 1, eoi — the decoder must synthesize code 6
    // before it exists in its dictionary
    val data = Gif.lzwEncode(Array(1, 1, 1, 1), 2)
    assert(Gif.lzwDecode(data, 2, 4).get.toSeq == Seq(1, 1, 1, 1))
    // and by-hand bit check: clear=4, eoi=5, width 3;
    // codes [4, 1, 6, 1, 5] LSB-first = 100 | 001<<3 | 110<<6 | 001<<9 | 101<<12
    val expect = 4L | (1L << 3) | (6L << 6) | (1L << 9) | (5L << 12)
    val got = data.take(2).zipWithIndex
      .map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
    assert((got & 0x7fffL) == expect, f"bits $got%x vs $expect%x")
  }

  test("LZW roundtrips: long runs, width growth to 12 bits, deferred clear") {
    // 70k pseudo-random indices force the dictionary to 4096 and a
    // mid-stream clear/reset; also a pathological all-same run (KwKwK
    // chains) and an alternating pattern
    val cases = Seq(
      Array.tabulate(70000)(i => (i * 31 + i / 7) % 256),
      Array.fill(5000)(42),
      Array.tabulate(300)(i => i % 2))
    for (idx <- cases) {
      val enc = Gif.lzwEncode(idx, 8)
      val dec = Gif.lzwDecode(enc, 8, idx.length)
      assert(dec.isDefined && dec.get.toSeq == idx.toSeq,
        s"roundtrip failed (${idx.length} indices)")
    }
    // small alphabet too (minCode 2)
    val small = Array.tabulate(4000)(i => (i * 7 + i / 3) % 4)
    assert(Gif.lzwDecode(Gif.lzwEncode(small, 2), 2, 4000).get.toSeq
      == small.toSeq)
  }

  test("LZW refusals: out-of-range code, short data, early EOI, overrun") {
    // first 9-bit code 0x1ff is far beyond dictSize 258
    assert(Gif.lzwDecode(Array.fill[Byte](4)(0xff.toByte), 8, 10).isEmpty)
    // truncated mid-stream
    val good = Gif.lzwEncode(Array.tabulate(100)(_ % 256), 8)
    assert(Gif.lzwDecode(good.take(good.length / 2), 8, 100).isEmpty)
    // more output expected than the stream carries (EOI hits first)
    assert(Gif.lzwDecode(good, 8, 101).isEmpty)
    // less expected than the stream carries: the run's final multi-
    // pixel entry straddles the boundary (overrun)
    val run = Gif.lzwEncode(Array.fill(100)(7), 8)
    assert(Gif.lzwDecode(run, 8, 99).isEmpty)
  }

  test("full roundtrip: every wire-shape variant decodes to the same pixels") {
    val frames = (0 until 3).map(f => (gray(64, 64, f + 2), 40 + 10 * f))
    val variants = Seq(
      Gif.gifBytes(64, 64, frames), // GCT, no interlace
      Gif.gifBytes(64, 64, frames, useLct = true),
      Gif.gifBytes(64, 64, frames, interlace = _ % 2 == 0),
      Gif.gifBytes(64, 64, frames, version = "GIF87a"))
    val decoded = variants.map(b => Gif.decode(b))
    decoded.foreach(d => assert(d.isRight, s"decode refused: $d"))
    val pixelSets = decoded.map(_.toOption.get.frames.map(_.canvas.get.toSeq))
    assert(pixelSets.distinct.size == 1, "wire shape changed the pixels")
    // gray palette: canvas red channel IS the index
    val f0 = decoded.head.toOption.get.frames.head.canvas.get
    assert(f0.zip(gray(64, 64, 2)).forall { case (p, g) =>
      ((p >>> 16) & 0xff) == g })
    // durations: 89a parses the GCE, 87a has none
    assert(decoded.head.toOption.get.frames.map(_.durationMs) == Seq(40, 50, 60))
    assert(decoded(3).toOption.get.frames.map(_.durationMs) == Seq(0, 0, 0))
  }

  test("partial frames composite onto the canvas; disposal 2/3 and transparency") {
    // hand-assembled 4x2 canvas, 2-entry palettes (minCode 2)
    def img(fx: Int, fy: Int, fw: Int, fh: Int, idx: Array[Int],
        gce: Option[(Int, Int)]): Array[Byte] = {
      // gce = (disposal, transparentIdx or -1)
      val o = new java.io.ByteArrayOutputStream()
      gce.foreach { case (disp, trans) =>
        o.write(0x21); o.write(0xf9); o.write(4)
        o.write((disp << 2) | (if (trans >= 0) 1 else 0))
        o.write(0); o.write(0) // delay
        o.write(math.max(trans, 0)); o.write(0)
      }
      o.write(0x2c)
      for (v <- Seq(fx, fy, fw, fh)) { o.write(v & 0xff); o.write(v >> 8) }
      o.write(0x00) // no LCT, no interlace
      o.write(2) // min code size
      val lzw = Gif.lzwEncode(idx, 2)
      o.write(lzw.length); o.write(lzw, 0, lzw.length)
      o.write(0)
      o.toByteArray
    }
    def file(imgs: Array[Byte]*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("GIF89a".getBytes)
      o.write(4); o.write(0); o.write(2); o.write(0) // 4x2
      o.write(0x80) // GCT, size 2
      o.write(0); o.write(0) // background index + aspect
      // palette: 0 = (10,10,10), 1 = (200,200,200)
      o.write(10); o.write(10); o.write(10)
      o.write(200); o.write(200); o.write(200)
      imgs.foreach(b => o.write(b, 0, b.length))
      o.write(0x3b)
      o.toByteArray
    }
    def reds(px: Array[Int]): Seq[Int] = px.map(p => (p >>> 16) & 0xff).toSeq
    // frame 1 fills the canvas with 0s; frame 2 paints a 2x1 patch of
    // 1s at (1,1); untouched pixels persist (disposal 0/1 default)
    val g1 = Gif.decode(file(
      img(0, 0, 4, 2, Array.fill(8)(0), None),
      img(1, 1, 2, 1, Array(1, 1), None))).toOption.get
    assert(reds(g1.frames(1).canvas.get) ==
      Seq(10, 10, 10, 10, 10, 200, 200, 10))
    // transparency: index 1 transparent in frame 2 -> frame 1 shows through
    val g2 = Gif.decode(file(
      img(0, 0, 4, 2, Array.fill(8)(1), None),
      img(0, 0, 4, 2, Array(0, 1, 0, 1, 1, 0, 1, 1), Some((1, 1))))).toOption.get
    assert(reds(g2.frames(1).canvas.get) ==
      Seq(10, 200, 10, 200, 200, 10, 200, 200))
    // disposal 2 (restore to background) clears the FRAME RECT after
    // the snapshot: frame 3 paints one pixel over transparent black
    val g3 = Gif.decode(file(
      img(0, 0, 4, 2, Array.fill(8)(1), Some((2, -1))),
      img(0, 0, 1, 1, Array(0), None))).toOption.get
    assert(reds(g3.frames(0).canvas.get) == Seq.fill(8)(200)) // snapshot first
    assert(reds(g3.frames(1).canvas.get) == Seq(10, 0, 0, 0, 0, 0, 0, 0))
    // disposal 3 (restore to previous): frame 2's paint is undone for
    // frame 3's canvas
    val g4 = Gif.decode(file(
      img(0, 0, 4, 2, Array.fill(8)(0), None),
      img(0, 0, 4, 2, Array.fill(8)(1), Some((3, -1))),
      img(3, 1, 1, 1, Array(1), None))).toOption.get
    assert(reds(g4.frames(1).canvas.get) == Seq.fill(8)(200))
    assert(reds(g4.frames(2).canvas.get) ==
      Seq(10, 10, 10, 10, 10, 10, 10, 200))
  }

  test("interlace row order pins the 8/8/4/2 pass structure") {
    assert(Gif.interlaceRows(10).toSeq == Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    assert(Gif.interlaceRows(1).toSeq == Seq(0))
    // a 16-row interlaced frame roundtrips pixel-exact (covered in the
    // full-roundtrip test at 64x64; this pins an h not divisible by 8)
    val px = gray(8, 11, 5)
    val b = Gif.gifBytes(8, 11, Seq((px, 0)), interlace = _ => true)
    assert(Gif.decode(b).toOption.get.frames.head.canvas.get
      .map(p => (p >>> 16) & 0xff).toSeq == px.toSeq)
  }

  test("refusal families are tagged and the frame walk survives a bad frame") {
    val frames = Seq((gray(64, 64, 1), 40), (gray(64, 64, 2), 50))
    assert(Gif.decode(Gif.gifBytes(64, 64, frames, breakMagic = true))
      == Left("not_gif"))
    assert(Gif.decode(Array[Byte](1, 2, 3)) == Left("not_gif"))
    val good = Gif.gifBytes(64, 64, frames)
    assert(Gif.decode(good.take(good.length - 40)) == Left("truncated"))
    assert(Gif.decode(good.take(good.length - 1)) == Left("truncated")) // no trailer
    assert(Gif.decode(good, maxPixels = 63) == Left("too_large"))
    // bad LZW in frame 0: duration kept, frame 1 still decodes
    val corrupt = Gif.decode(Gif.gifBytes(64, 64, frames, corruptLzwFrame = 0))
      .toOption.get
    assert(!corrupt.frames(0).ok && corrupt.frames(0).err == "bad_lzw" &&
      corrupt.frames(0).durationMs == 40)
    assert(corrupt.frames(1).ok && corrupt.frames(1).canvas.get
      .map(p => (p >>> 16) & 0xff).toSeq == gray(64, 64, 2).toSeq)
  }

  test("a decoded index past the palette refuses 'bad_index' per-frame") {
    // hand-built: 4x1 canvas, 4-entry GCT, min-code 3 (indices to 7) —
    // index 7 LZW-decodes fine but has no palette entry
    val o = new java.io.ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    o.write(4); o.write(0); o.write(1); o.write(0)
    o.write(0xf1) // GCT flag, size bits 001 -> 4 entries
    o.write(0); o.write(0)
    for (i <- 0 until 4; _ <- 0 until 3) o.write(i * 80)
    o.write(0x2c)
    for (v <- Seq(0, 0, 4, 1)) { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    o.write(0) // no LCT, no interlace
    o.write(3) // LZW min code size
    val lzw = Gif.lzwEncode(Array(0, 1, 2, 7), 3)
    o.write(lzw.length); o.write(lzw, 0, lzw.length); o.write(0)
    o.write(0x3b)
    val img = Gif.decode(o.toByteArray).toOption.get
    assert(img.frames.length == 1)
    assert(!img.frames(0).ok && img.frames(0).err == "bad_index")
  }

  test("still path: header sniff + shared-dispatch pHash equal the PNG twin's") {
    // the same pixels through PNG and through GIF must land the SAME
    // hash via the codec-sniffing dispatch (both decodes are lossless)
    val px = gray(32, 32, 6)
    val gif = Gif.gifBytes(32, 32, Seq((px, 0)), interlace = _ => true)
    val png = Multimodal.pngBytes(32, 32, (x, y, _) => px(y * 32 + x))
    assert(Gif.parseScreen(gif) == Some(("gif89a", 32, 32)))
    assert(Multimodal.parseImageHeader(gif) == Some(("gif", 32, 32, 8, 3, "gif89a")))
    val (w, h, rgb) = Gif.decodeStillRgb(gif).get
    assert(w == 32 && h == 32 && rgb.length == 32 * 32 * 3)
    assert((0 until 32 * 32).forall(i => (rgb(3 * i) & 0xff) == px(i)))
    val s = spark
    import s.implicits._
    val media = Seq((1L, gif), (2L, png)).toDF("media_id", "payload")
    val hashes = Multimodal.decodeImagePHash(media).collect()
      .map(r => r.media_id -> ((r.ok, r.phash))).toMap
    assert(hashes(1L)._1 == 1 && hashes(2L)._1 == 1)
    assert(hashes(1L)._2 == hashes(2L)._2,
      "GIF and PNG encodings of the same pixels must hash identically")
    // an 87a single-frame still decodes too
    val v87 = Gif.gifBytes(32, 32, Seq((px, 0)), version = "GIF87a")
    assert(Gif.decodeStillRgb(v87).isDefined)
    // refusals stay None through the still path
    assert(Gif.decodeStillRgb(gif.take(20)).isEmpty)
    assert(Gif.parseScreen(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("batched decode matches single-payload decode (partitioning-invariant)") {
    val s = spark
    import s.implicits._
    val docs = spark.range(0, 60).select(org.apache.spark.sql.functions.col("id")
      .as("doc_id"))
    val media = Gif.gifCorpusFromDocuments(docs)
    val rows = Gif.decodeGifPHash(media, partitions = 5).collect()
      .map(r => (r.media_id, r.frame_idx) -> ((r.ok, r.duration_ms, r.phash, r.err)))
      .toMap
    val local = media.as[(Long, Array[Byte])].collect()
    assert(local.nonEmpty)
    local.foreach { case (id, payload) =>
      Gif.decode(payload) match {
        case Left(err) => assert(rows((id, 0)) == ((0, 0, 0L, err)))
        case Right(img) => img.frames.zipWithIndex.foreach { case (fr, idx) =>
          val (ok, dur, ph, err) = rows((id, idx))
          assert(dur == fr.durationMs && (ok == 1) == fr.ok)
          if (fr.ok) {
            val g = fr.canvas.get.map(p => (p >>> 16) & 0xff)
            assert(ph == Multimodal.pHash64(g, img.w, img.h) && err == "")
          } else assert(ph == 0L && err == fr.err)
        }
      }
    }
  }
}
