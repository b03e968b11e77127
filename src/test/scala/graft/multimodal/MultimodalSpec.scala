package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fakeMediaFromDocuments(spark,
    graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents"))

  test("media frame conforms to the binary+metadata schema contract") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(Seq("media_id", "kind", "width", "height", "sample_rate", "n_frames")
      .forall(s.fieldNames.contains))
    assert(media.count() > 0)
  }

  test("feature extraction: batched decode produces fixed-dim deterministic features") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    val rows = f1.collect()
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(r => r.n_bytes > 0))
    // determinism across runs (stub decoder is pure)
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) == r.feature.toSeq))
  }

  test("frame sampling stub: stride-spaced indexes bounded by n_frames") {
    import org.apache.spark.sql.functions._
    val sampled = Multimodal.sampleFrameIndexes(media, stride = 7)
    val bad = sampled.join(media, "media_id")
      .where(exists(col("frame_indexes"), i => i >= col("n_frames") || i % 7 =!= 0))
    assert(bad.isEmpty)
  }

  test("resize stub rewrites metadata, preserves payload") {
    val r = Multimodal.resizeStub(media, 224, 224)
    import org.apache.spark.sql.functions._
    assert(r.where(col("width") =!= 224 || col("height") =!= 224).isEmpty)
    assert(r.select(sum(length(col("payload")))).head().getLong(0) ==
      media.select(sum(length(col("payload")))).head().getLong(0))
  }

  test("PNG header parse: hand-written IHDR fixture (RGBA 640x360)") {
    // independent of pngHeaderBytes — literal spec bytes so a shared
    // endianness/offset bug in generator+parser can't self-validate
    val png = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, // IHDR chunk length 13
      0x49, 0x48, 0x44, 0x52, // "IHDR"
      0x00, 0x00, 0x02, 0x80, // width 640 (big-endian)
      0x00, 0x00, 0x01, 0x68, // height 360
      0x08, 0x06, // bit depth 8, color type 6 = RGBA -> 4 channels
      0x00, 0x00, 0x00, // compression, filter, interlace
      0xDE, 0xAD, 0xBE, 0xEF // CRC (not validated by the parser)
    ).map(_.toByte)
    assert(Multimodal.parsePngHeader(png).contains(("png", 640, 360, 8, 4, "")))
    assert(Multimodal.parseImageHeader(png).contains(("png", 640, 360, 8, 4, "")))
  }

  test("JPEG header parse: hand-written fixture walks APP0+COM to a progressive SOF2") {
    val jpeg = Array(
      0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x01, 0x02, // APP0, length 4 (2 payload bytes)
      0xFF, 0xFE, 0x00, 0x05, 0x61, 0x62, 0x63, // COM "abc", length 5
      0xFF, 0xC2, 0x00, 0x0B, // SOF2 (progressive), length 11 = 8 + 3*1
      0x08, // precision 8
      0x00, 0x07, // height 7
      0x04, 0x00, // width 1024
      0x01, // 1 component (grayscale)
      0x01, 0x11, 0x00 // component spec
    ).map(_.toByte)
    assert(Multimodal.parseJpegHeader(jpeg).contains(("jpeg", 1024, 7, 8, 1, "progressive")))
    assert(Multimodal.parseImageHeader(jpeg).contains(("jpeg", 1024, 7, 8, 1, "progressive")))
  }

  test("header parse rejects malformed payloads") {
    // signature only, no IHDR
    assert(Multimodal.parsePngHeader(
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)).isEmpty)
    // SOS before any SOF: no frame header to decode
    val sosFirst = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02, 0x00).map(_.toByte)
    assert(Multimodal.parseJpegHeader(sosFirst).isEmpty)
    // plain text
    assert(Multimodal.parseImageHeader("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageHeader(null).isEmpty)
    assert(Multimodal.parseImageHeader(Array.emptyByteArray).isEmpty)
  }

  test("synthesized headers round-trip through the parser, including >16-bit PNG dims") {
    for ((w, h) <- Seq((1, 1), (320, 180), (65535, 3), (70000, 123456))) {
      assert(Multimodal.parsePngHeader(Multimodal.pngHeaderBytes(w, h, 8, 2))
        .contains(("png", w, h, 8, 3, "")))
    }
    for ((w, h) <- Seq((1, 1), (800, 450), (65535, 65535))) {
      assert(Multimodal.parseJpegHeader(Multimodal.jpegHeaderBytes(w, h))
        .contains(("jpeg", w, h, 8, 3, "baseline")))
      assert(Multimodal.parseJpegHeader(
          Multimodal.jpegHeaderBytes(w, h, sofMarker = 0xC2))
        .contains(("jpeg", w, h, 8, 3, "progressive")))
      assert(Multimodal.parseJpegHeader(
          Multimodal.jpegHeaderBytes(w, h, sofMarker = 0xC1))
        .contains(("jpeg", w, h, 8, 3, "extended")))
    }
    // PNG color types map to channel counts
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      assert(Multimodal.parsePngHeader(Multimodal.pngHeaderBytes(64, 64, 8, ct))
        .contains(("png", 64, 64, 8, ch, "")))
    }
  }

  test("WAV header parse: hand-written fixture with an extra chunk before fmt") {
    // "RIFF" + size + "WAVE", a LIST chunk of odd size 3 (pads to 4),
    // then fmt (stereo 16-bit 8000 Hz, block align 4) and a 10-byte
    // data chunk -> 2 frames
    val wav = Array[Int](
      'R', 'I', 'F', 'F', 0x39, 0, 0, 0, 'W', 'A', 'V', 'E',
      'L', 'I', 'S', 'T', 0x03, 0, 0, 0, 1, 2, 3, 0, // odd size pads
      'f', 'm', 't', ' ', 0x10, 0, 0, 0,
      0x01, 0x00, // PCM
      0x02, 0x00, // 2 channels
      0x40, 0x1F, 0x00, 0x00, // 8000 Hz (little-endian)
      0x00, 0x7D, 0x00, 0x00, // byte rate 32000
      0x04, 0x00, // block align 4
      0x10, 0x00, // 16 bits
      'd', 'a', 't', 'a', 0x0A, 0, 0, 0,
      9, 9, 9, 9, 9, 9, 9, 9, 9, 9).map(_.toByte)
    assert(Multimodal.parseWavHeader(wav).contains((8000, 2, 16, 2L)))
    // truncated data chunk: declared 10 bytes, 6 present -> clamp, 1 frame
    assert(Multimodal.parseWavHeader(wav.dropRight(4)).contains((8000, 2, 16, 1L)))
    // not RIFF at all
    assert(Multimodal.parseWavHeader("RIFFnope".getBytes("UTF-8") ++ wav).isEmpty)
    assert(Multimodal.parseWavHeader(null).isEmpty)
    // hostile chunk size near Int.MaxValue must walk off the end
    // cleanly (None), not overflow into a negative array index
    val hostile = "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("ISO-8859-1") ++ "LIST".getBytes("ISO-8859-1") ++
      Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) ++ // 0x7FFFFFF0 LE
      Array.fill(32)(0.toByte)
    assert(Multimodal.parseWavHeader(hostile).isEmpty)
  }

  test("synthesized WAV headers round-trip through the parser") {
    for ((rate, ch, bits, n) <- Seq((16000, 1, 16, 100), (44100, 2, 16, 7),
        (22050, 1, 8, 0), (8000, 4, 24, 33))) {
      val payload = Multimodal.wavHeaderBytes(rate, ch, bits, n) ++ Array.fill(n)(1.toByte)
      val block = ch * ((bits + 7) / 8)
      assert(Multimodal.parseWavHeader(payload)
        .contains((rate, ch, bits, (n / block).toLong)))
    }
  }

  test("MP4 header parse: hand-written fixture with audio-before-video tracks, v0/v1 boxes") {
    def u32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
    // mvhd VERSION 1: creation/modification 8 bytes each, timescale at
    // body offset 20, duration 8 bytes at 24
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill(16)(0.toByte) ++ u32(1000L) ++ u32(0L) ++ u32(90000L) ++
      Array.fill(80)(0.toByte))
    // first trak: AUDIO (tkhd v0, zero dims) — must be skipped
    val audioTkhd = box("tkhd", new Array[Byte](84))
    // second trak: VIDEO 1920x1080 (tkhd v0)
    val videoBody = new Array[Byte](84)
    System.arraycopy(u32(1920L << 16), 0, videoBody, 76, 4)
    System.arraycopy(u32(1080L << 16), 0, videoBody, 80, 4)
    val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L)) ++
      box("moov", mvhdV1 ++ box("trak", audioTkhd) ++
        box("trak", box("tkhd", videoBody)))
    // duration 90000 at timescale 1000 -> 90000 ms
    assert(Multimodal.parseMp4Header(mp4).contains((1920, 1080, 1000L, 90000L)))
    // no ftyp first -> not an mp4
    assert(Multimodal.parseMp4Header(mp4.drop(20)).isEmpty)
    assert(Multimodal.parseMp4Header(null).isEmpty)
    assert(Multimodal.parseMp4Header("RIFF....WAVE".getBytes("ISO-8859-1")).isEmpty)
    // capture truncated right after a tkhd box header: empty body must
    // parse as no-video (None), not crash on the version-byte read
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L))
    val truncated = ftyp ++ box("moov", mvhdV1 ++ box("trak", u32(8L) ++
      "tkhd".getBytes("ISO-8859-1")))
    assert(Multimodal.parseMp4Header(truncated).isEmpty)
  }

  test("corrupt headers are rejected, not misparsed: truncated v1 mvhd, short SOF segment") {
    def u32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
    // mvhd v1 whose body is only 24 bytes (capture truncated mid-box):
    // reading v0 offsets would yield a garbage timescale from the middle
    // of modification_time — must be None, not a bogus "mp4"
    val truncV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill(20)(7.toByte))
    val videoBody = new Array[Byte](84)
    System.arraycopy(u32(640L << 16), 0, videoBody, 76, 4)
    System.arraycopy(u32(360L << 16), 0, videoBody, 80, 4)
    val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L)) ++
      box("moov", truncV1 ++ box("trak", box("tkhd", videoBody)))
    assert(Multimodal.parseMp4Header(mp4).isEmpty)
    // JPEG whose SOF0 declares segLen 5 (< the 8 bytes its fields need)
    // but whose buffer continues: the reads would land in the next
    // segment's bytes — must be None, not garbage dimensions
    val shortSof = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x05,
      0x08, 0x01, 0x40, 0x00, 0xF0, 0x03, 0x01, 0x02, 0x03).map(_.toByte)
    assert(Multimodal.parseJpegHeader(shortSof).isEmpty)
  }

  test("corpus generators tolerate negative ids: floorMod indexing, valid headers") {
    import spark.implicits._
    val docs = Seq((-1L, "neg one"), (-7L, "neg seven"), (2L, "two"))
      .toDF("doc_id", "text")
    val img = Multimodal.imageCorpusFromDocuments(docs).collect()
    assert(img.length == 3)
    img.foreach { r =>
      val p = Multimodal.parseImageHeader(r.getAs[Array[Byte]]("payload"))
      assert(p.isDefined && p.get._2 > 0 && p.get._3 > 0)
    }
    // audio: rates((-1 % 4)) would have thrown ArrayIndexOutOfBounds
    val aud = Multimodal.audioCorpusFromDocuments(docs).collect()
    aud.foreach { r =>
      assert(Multimodal.parseWavHeader(r.getAs[Array[Byte]]("payload")).isDefined)
    }
    val vid = Multimodal.videoCorpusFromDocuments(docs).collect()
    vid.foreach { r =>
      val p = Multimodal.parseMp4Header(r.getAs[Array[Byte]]("payload"))
      assert(p.isDefined && p.get._1 > 0 && p.get._2 > 0)
    }
  }

  test("synthesized MP4 headers round-trip through the parser") {
    for ((w, h, scale, dur) <- Seq((640, 360, 600L, 600L), (1280, 720, 90000L, 123456L))) {
      assert(Multimodal.parseMp4Header(Multimodal.mp4HeaderBytes(w, h, scale, dur))
        .contains((w, h, scale, dur * 1000L / scale)))
    }
  }

  test("frame extraction walks stsc chunk maps; error families tag layout vs corruption") {
    def u32(v: Long) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L))
    // five 4-byte samples laid out over THREE chunks with junk between:
    // chunk1 = s0,s1 | chunk2 = s2 | chunk3 = s3,s4 (stsc entry 2's
    // run covers chunks 2 only; entry 3 takes over at chunk 3)
    val samples = (0 until 5).map(i => Array.fill[Byte](4)((0x10 * (i + 1)).toByte))
    val junk = Array.fill[Byte](7)(0x77)
    val mdatBody = samples(0) ++ samples(1) ++ junk ++ samples(2) ++ junk ++
      samples(3) ++ samples(4)
    val mdat = box("mdat", mdatBody)
    val off1 = ftyp.length + 8
    val off2 = off1 + 8 + 7
    val off3 = off2 + 4 + 7
    def stbl(stsc: Array[Byte], stco: Array[Byte]) =
      box("moov", box("trak", box("mdia", box("minf", box("stbl",
        box("stsz", u32(0L) ++ u32(0L) ++ u32(5L) ++
          samples.flatMap(s => u32(s.length.toLong)).toArray) ++
        stsc ++ stco)))))
    val stsc3 = box("stsc", u32(0L) ++ u32(3L) ++
      u32(1L) ++ u32(2L) ++ u32(1L) ++   // chunks 1.. : 2 samples each
      u32(2L) ++ u32(1L) ++ u32(1L) ++   // chunks 2.. : 1 sample
      u32(3L) ++ u32(2L) ++ u32(1L))     // chunks 3.. : 2 samples
    val stco3 = box("stco", u32(0L) ++ u32(3L) ++
      u32(off1.toLong) ++ u32(off2.toLong) ++ u32(off3.toLong))
    val good = ftyp ++ mdat ++ stbl(stsc3, stco3)
    val got = Multimodal.extractMp4FramesTagged(good)
    assert(got.isRight)
    assert(got.toOption.get.map { case (i, b) => (i, b.toSeq) } ==
      samples.zipWithIndex.map { case (s, i) => (i, s.toSeq) },
      "chunk-mapped extraction must recover exactly the sample runs, skipping junk")
    // multi-chunk with NO stsc: the walk cannot map -> unsupported_layout
    val noMap = ftyp ++ mdat ++ stbl(Array.emptyByteArray, stco3)
    assert(Multimodal.extractMp4FramesTagged(noMap) == Left("unsupported_layout"))
    // uniform stsz: no per-sample boundaries -> unsupported_layout
    val uni = ftyp ++ mdat ++ box("moov", box("trak", box("mdia", box("minf",
      box("stbl", box("stsz", u32(0L) ++ u32(4L) ++ u32(5L)) ++ stsc3 ++ stco3)))))
    assert(Multimodal.extractMp4FramesTagged(uni) == Left("unsupported_layout"))
    // stsc covering too few samples (chunks run out) -> corrupt
    val short = box("stsc", u32(0L) ++ u32(1L) ++ u32(1L) ++ u32(1L) ++ u32(1L))
    assert(Multimodal.extractMp4FramesTagged(
      ftyp ++ mdat ++ stbl(short, stco3)) == Left("corrupt"))
    // an offset past the payload -> corrupt
    val badCo = box("stco", u32(0L) ++ u32(3L) ++
      u32(off1.toLong) ++ u32(off2.toLong) ++ u32(good.length.toLong + 50L))
    assert(Multimodal.extractMp4FramesTagged(
      ftyp ++ mdat ++ stbl(stsc3, badCo)) == Left("corrupt"))
    // a non-increasing stsc chain -> corrupt
    val nonInc = box("stsc", u32(0L) ++ u32(2L) ++
      u32(1L) ++ u32(2L) ++ u32(1L) ++ u32(1L) ++ u32(3L) ++ u32(1L))
    assert(Multimodal.extractMp4FramesTagged(
      ftyp ++ mdat ++ stbl(nonInc, stco3)) == Left("corrupt"))
    // not this container at all
    assert(Multimodal.extractMp4FramesTagged("plainly text".getBytes("UTF-8"))
      == Left("not_mp4"))
  }

  test("PNG pixel decode: encode/decode round-trip recovers every pixel under all filters") {
    // deterministic pixel pattern; h=7 cycles filter types 0..4 + 2 repeats
    val (w, h) = (5, 7)
    def pix(x: Int, y: Int, c: Int): Int = (x * 17 + y * 29 + c * 7 + 3) % 256
    val bytes = Multimodal.pngBytes(w, h, pix)
    // the encoded stream parses as a PNG header too (shared IHDR path)
    assert(Multimodal.parsePngHeader(bytes).contains(("png", w, h, 8, 3, "")))
    val Some((dw, dh, px)) = Multimodal.decodePngPixels(bytes)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert((px(y * w * 3 + x * 3 + c) & 0xff) == pix(x, y, c),
        s"pixel mismatch at ($x,$y,$c)")
    // gradient + constant images exercise Sub/Up/Average/Paeth edge math
    for ((name, f) <- Seq[(String, (Int, Int, Int) => Int)](
        ("constant", (_, _, _) => 200),
        ("xgrad", (x, _, _) => (x * 50) % 256),
        ("ygrad", (_, y, _) => (y * 50) % 256),
        ("checker", (x, y, c) => if ((x + y + c) % 2 == 0) 255 else 0))) {
      val b2 = Multimodal.pngBytes(8, 6, f)
      val Some((_, _, p2)) = Multimodal.decodePngPixels(b2)
      for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
        assert((p2(y * 24 + x * 3 + c) & 0xff) == f(x, y, c), s"$name ($x,$y,$c)")
    }
    // malformed payloads are rejected, never misdecoded
    assert(Multimodal.decodePngPixels(null).isEmpty)
    assert(Multimodal.decodePngPixels(bytes.take(40)).isEmpty) // truncated IDAT walk
    assert(Multimodal.decodePngPixels(
      Multimodal.pngHeaderBytes(4, 4, 8, 2)).isEmpty) // header only, no IDAT
    // an IDAT whose declared length overruns the payload must be
    // rejected by the bounds-checked chunk walk, never read past-end
    val overrun = Multimodal.pngBytes(3, 3, (_, _, _) => 1)
      .updated(33, 0x7f.toByte) // IDAT length field -> huge
    assert(Multimodal.decodePngPixels(overrun).isEmpty)
    // grayscale (colorType 0) is out of decode scope -> None, not garbage
    assert(Multimodal.decodePngPixels(Multimodal.pngHeaderBytes(4, 4, 8, 0)).isEmpty)
  }

  test("PNG pixel stats over the generated corpus match the closed-form generator") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val stats = Multimodal.decodePngPixelStats(
      Multimodal.pngPixelCorpusFromDocuments(docs)).toDF()
    assert(stats.where(col("format") === "unknown").isEmpty,
      "every generated payload must decode")
    // spot-verify one image's sums against the generator directly
    val r = stats.where(col("media_id") === 1L).collect()(0)
    val (w, h) = (r.getInt(2), r.getInt(3))
    val expect = (for (x <- 0 until w; y <- 0 until h) yield (31L * 1 + 7 * x + 13 * y) % 256).sum
    assert(r.getLong(4) == expect, s"sum_r mismatch: ${r.getLong(4)} vs $expect")
    assert(stats.count() == 50)
  }

  test("WAV sample decode: LE signed 16-bit round-trip, clamps, and rejections") {
    // hand-built stereo clip: 3 frames of known samples incl. negatives
    // and both int16 extremes — byte order / signedness golden
    val samples = Array[Short](0, -1, 32767, -32768, 1000, -1000)
    val body = new Array[Byte](samples.length * 2)
    for (k <- samples.indices) {
      body(2 * k) = (samples(k) & 0xff).toByte
      body(2 * k + 1) = ((samples(k) >> 8) & 0xff).toByte
    }
    val clip = Multimodal.wavHeaderBytes(16000, 2, 16, body.length) ++ body
    val Some((rate, ch, s)) = Multimodal.decodeWavSamples(clip)
    assert(rate == 16000 && ch == 2 && s.toSeq == samples.toSeq)
    // truncated capture: data declares 12 bytes but only 7 present ->
    // 1 whole stereo frame survives (partial frame dropped)
    val trunc = Multimodal.wavHeaderBytes(8000, 2, 16, body.length) ++ body.take(7)
    val Some((_, _, st)) = Multimodal.decodeWavSamples(trunc)
    assert(st.toSeq == samples.take(2).toSeq)
    // rejections: non-PCM fmt code, 8-bit depth, truncated header
    val nonPcm = clip.clone(); nonPcm(20) = 3 // fmt code -> IEEE float
    assert(Multimodal.decodeWavSamples(nonPcm).isEmpty)
    val bits8 = Multimodal.wavHeaderBytes(8000, 1, 8, 4) ++ Array[Byte](1, 2, 3, 4)
    assert(Multimodal.decodeWavSamples(bits8).isEmpty)
    assert(Multimodal.decodeWavSamples(null).isEmpty)
    assert(Multimodal.decodeWavSamples(clip.take(30)).isEmpty)
  }

  test("WAV sample stats over the generated corpus match the closed-form generator") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val stats = Multimodal.decodeWavSampleStats(
      Multimodal.wavPcmCorpusFromDocuments(docs)).toDF()
    assert(stats.where(col("format") === "unknown").isEmpty,
      "every generated payload must decode")
    // spot-verify a stereo clip (odd id) against the generator directly
    val r = stats.where(col("media_id") === 3L).collect()(0)
    assert(r.getInt(3) == 2, "odd ids are stereo")
    val n = r.getLong(4)
    def smp(i: Long, c: Long) = (37L * 3 + 11L * i + 23L * c) % 4096L - 2048L
    val el = (0L until n).map(smp(_, 0))
    val er = (0L until n).map(smp(_, 1))
    assert(r.getLong(5) == el.sum && r.getLong(6) == er.sum)
    assert(r.getLong(7) == el.map(v => v * v).sum &&
      r.getLong(8) == er.map(v => v * v).sum)
    assert(r.getLong(9) == (el ++ er).map(math.abs).max)
    assert(stats.count() == 50)
  }

  test("decodeImageHeaders parses the generated corpus distributively") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val decoded = Multimodal.decodeImageHeaders(
      Multimodal.imageCorpusFromDocuments(docs)).toDF()
    assert(decoded.where(col("format") === "unknown").isEmpty)
    val bad = decoded.where(
      col("format") =!= when(pmod(col("media_id"), lit(2)) === 0, "png").otherwise("jpeg") ||
        col("width") =!= (pmod(col("media_id"), lit(4)) * 160 + 320).cast("int") ||
        col("height") =!= (pmod(col("media_id"), lit(4)) * 90 + 180).cast("int") ||
        col("bit_depth") =!= 8 || col("channels") =!= 3 ||
        col("coding") =!= when(pmod(col("media_id"), lit(2)) === 0, "")
          .when(pmod(col("media_id"), lit(5)) === 2, "progressive")
          .otherwise("baseline"))
    assert(bad.isEmpty)
    assert(decoded.count() == docs.count())
    // the audit the classification exists for: progressive refusal rate
    // counts straight off the header frame, no pixel decode
    assert(decoded.where(col("coding") === "progressive").count() > 0)
  }
  test("MP4 sample tables: both stsz forms, per-track walk, truncation rejections") {
    import spark.implicits._
    val docs = Seq(2L, 3L).toDF("doc_id")
    val media = Multimodal.mp4SampleCorpusFromDocuments(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // id=2 (even): 1 track, per-sample stsz; n = ((2+0)%4+1)*3 = 9
    val Some(t2) = Multimodal.parseMp4SampleTables(media(2L))
    assert(t2.length == 1)
    assert(t2(0).n_samples == 9)
    assert(t2(0).total_sample_bytes ==
      (0 until 9).map(i => (7 * 2 + 3 * i) % 100 + 10).sum)
    assert(t2(0).duration_ticks == 9 * ((2 % 5) + 1) * 100)
    assert(t2(0).n_chunks == 1)
    // id=3 (odd): 2 tracks, uniform stsz of (3%50)+20 = 23 bytes
    val Some(t3) = Multimodal.parseMp4SampleTables(media(3L))
    assert(t3.length == 2 && t3.map(_.track_idx) == Seq(0, 1))
    assert(t3(0).n_samples == 12 && t3(0).total_sample_bytes == 23L * 12)
    assert(t3(1).n_samples == 3 && t3(1).total_sample_bytes == 23L * 3)
    // rejections: no ftyp, no complete table, truncated stsz entry list
    assert(Multimodal.parseMp4SampleTables(null).isEmpty)
    assert(Multimodal.parseMp4SampleTables(media(2L).take(40)).isEmpty)
    assert(Multimodal.parseMp4SampleTables(
      Multimodal.mp4HeaderBytes(640, 360, 600, 600)).isEmpty,
      "a header-only clip has no sample tables")
    // flip the per-sample stsz count to overrun its box -> that track
    // must drop out (None here: it is the only track)
    val bad = media(2L).clone()
    val stszAt = (0 until bad.length - 4).find(i =>
      new String(bad, i, 4, "ISO-8859-1") == "stsz").get
    bad(stszAt + 12) = 0x7f.toByte // sample_count -> huge
    assert(Multimodal.parseMp4SampleTables(bad).isEmpty)
  }

  test("MP4 sample stats: per-track rows distributively, unknown rows kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(30)
    val stats = Multimodal.decodeMp4SampleStats(
      Multimodal.mp4SampleCorpusFromDocuments(docs)).toDF()
    assert(stats.where(col("format") === "unknown").isEmpty)
    // row count = sum of track counts = sum(id%2 + 1)
    val expect = docs.select(sum(pmod(col("doc_id"), lit(2)) + 1)).collect()(0).getLong(0)
    assert(stats.count() == expect)
    // junk payloads surface as unknown
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "payload")
    val u = Multimodal.decodeMp4SampleStats(junk).collect()
    assert(u.length == 1 && u(0).format == "unknown")
  }

  test("gzip text decode: round trip, zip-bomb guard, corruption and junk rejection") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val text = "the quick brown fox \u00e9\u00e8\u00ea unicode tail " * 20
    val gz = Multimodal.gzipBytes(text)
    assert(Multimodal.gunzipText(gz).contains(text), "round trip with CRC verify")
    assert(Multimodal.gunzipText(gz).get.getBytes("UTF-8").length > gz.length,
      "fixture really compresses")
    // zip-bomb guard: the same stream rejected when it inflates past the cap
    assert(Multimodal.gunzipText(gz, maxBytes = 64).isEmpty,
      "over-limit inflation must reject, not truncate")
    // corrupted deflate body fails the CRC
    val bad = gz.clone(); bad(10) = (bad(10) ^ 0x55).toByte
    assert(Multimodal.gunzipText(bad).isEmpty)
    // junk / truncated / null
    assert(Multimodal.gunzipText(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.gunzipText(gz.take(gz.length - 4)).isEmpty,
      "a missing trailer must reject")
    assert(Multimodal.gunzipText(null).isEmpty)
    // distributed: corpus ok/corrupt split matches the generator rule
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .limit(30)
    val out = Multimodal.decodeGzipText(
      Multimodal.gzipCorpusFromDocuments(docs)).toDF()
    assert(out.where($"ok" === 0 && pmod($"media_id", lit(3)) =!= 0).isEmpty)
    assert(out.where($"ok" === 1 && pmod($"media_id", lit(3)) === 0).isEmpty)
    assert(out.where($"ok" === 1 && $"compressed_bytes" <= 0).isEmpty)
  }

}
