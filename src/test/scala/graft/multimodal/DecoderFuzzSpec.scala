package graft.multimodal

import graft.SparkSpec

/** Deterministic corruption sweep over every byte-level decoder: a
  * decoder fed a damaged payload may return Some (the damage landed in
  * slack it legitimately tolerates — e.g. unvalidated CRCs) or None,
  * but must NEVER throw, hang, or read out of bounds. Seeds are fixed,
  * so a failure reproduces exactly. */
class DecoderFuzzSpec extends SparkSpec {

  private def fuzz(name: String, base: Array[Byte],
      decode: Array[Byte] => Any): Unit = {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 300) {
      val b = base.clone()
      val mode = rnd.nextInt(4)
      mode match {
        case 0 => // flip 1-4 random bytes
          (0 to rnd.nextInt(4)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          decode(b)
        case 1 => // truncate anywhere
          decode(b.take(rnd.nextInt(b.length)))
        case 2 => // truncate AND flip
          val t = b.take(1 + rnd.nextInt(b.length - 1))
          if (t.nonEmpty) t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
          decode(t)
        case _ => // splice random garbage into the middle
          val at = rnd.nextInt(b.length)
          val junk = Array.fill(1 + rnd.nextInt(16))(rnd.nextInt(256).toByte)
          decode(b.take(at) ++ junk ++ b.drop(at))
      }
      i += 1
    }
  }

  test("PNG pixel decoder survives 300 deterministic corruptions") {
    val base = Multimodal.pngBytes(6, 9, (x, y, c) => (x * 31 + y * 7 + c) % 256)
    fuzz("png", base, Multimodal.decodePngPixels)
  }

  test("JPEG decoder survives 300 deterministic corruptions") {
    val base = Jpeg.dcOnlyBytes(16, 16, 3,
      (bx, by, c) => if (c == 0) (bx * 50 + by * 90) % 256 else 128)
    fuzz("jpeg", base, Jpeg.decodeJpegPixels)
  }

  test("4:2:2 JPEG decoder survives 300 deterministic corruptions") {
    val base = Jpeg.dcOnly422Bytes(32, 16,
      (bx, by) => (bx * 50 + by * 90) % 256,
      (mx, my, c) => 88 + 20 * ((mx + 3 * my + 2 * c) % 5))
    fuzz("jpeg-422", base, Jpeg.decodeJpegPixels)
  }

  test("progressive JPEG decoder survives 300 deterministic corruptions") {
    // AC coefficients present, so the fuzz reaches the spectral-
    // selection / refinement / EOB-run paths, not just the DC scans
    val base = Jpeg.progressiveBytes(16, 16, 3, (bx, by, c, k) =>
      if (k == 0) (bx * 50 + by * 90) % 256 - 128
      else if (k == 9 && c == 0) 5
      else if (k == 17 && c == 1) -3
      else if (k == 2 && c == 2) 1
      else 0)
    fuzz("jpeg-progressive", base, Jpeg.decodeJpegPixels)
  }

  test("WAV sample decoder survives 300 deterministic corruptions") {
    val body = Array.tabulate(64)(i => ((i * 37) % 256 - 128).toByte)
    val base = Multimodal.wavHeaderBytes(16000, 2, 16, body.length) ++ body
    fuzz("wav", base, Multimodal.decodeWavSamples)
  }

  test("WARC record walker survives 300 deterministic corruptions") {
    val body = "HTTP/1.1 200 OK\r\n\r\nhello warc body".getBytes("ISO-8859-1")
    val base = Containers.warcRecordBytes(Seq(
        "WARC-Type" -> "warcinfo",
        "Content-Type" -> "application/warc-fields"),
      "software: graft\r\n".getBytes("UTF-8")) ++
      Containers.warcRecordBytes(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://h.example/x",
        "Content-Type" -> "application/http; msgtype=response"), body)
    fuzz("warc", base, b => Containers.parseWarc(1L, b))
  }

  test("WARC walker with encoded HTTP payloads survives 300 corruptions each") {
    def gzip(p: Array[Byte]) = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(p); g.close()
      bo.toByteArray
    }
    val t = "hello encoded warc body".getBytes("UTF-8")
    def resp(hdr: String, payload: Array[Byte]) = Containers.warcRecordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://h.example/x",
      "Content-Type" -> "application/http; msgtype=response"),
      (s"HTTP/1.1 200 OK\r\n$hdr\r\n").getBytes("ISO-8859-1") ++ payload)
    val chunked = ("5\r\nhello\r\n12\r\n encoded warc body\r\n0\r\n\r\n")
      .getBytes("ISO-8859-1")
    fuzz("warc-chunked", resp("Transfer-Encoding: chunked\r\n", chunked),
      b => Containers.parseWarc(1L, b))
    fuzz("warc-gzip", resp("Content-Encoding: gzip\r\n", gzip(t)),
      b => Containers.parseWarc(1L, b))
    val gz = gzip(t)
    val chGz = (java.lang.Integer.toHexString(gz.length) + "\r\n")
      .getBytes("ISO-8859-1") ++ gz ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    fuzz("warc-chunked-gzip",
      resp("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n", chGz),
      b => Containers.parseWarc(1L, b))
    // charset-declared bodies: corrupted Shift-JIS / UTF-16 bytes must
    // REPLACE (browser rule), never throw; corrupted labels refuse
    fuzz("warc-sjis",
      resp("Content-Type: text/html; charset=shift_jis\r\n",
        "<p>日本語テスト</p>".getBytes("Shift_JIS")),
      b => Containers.parseWarc(1L, b))
    fuzz("warc-utf16-bom",
      resp("Content-Type: text/html\r\n",
        Array[Byte](0xff.toByte, 0xfe.toByte) ++
          "<p>utf16 page</p>".getBytes("UTF-16LE")),
      b => Containers.parseWarc(1L, b))
  }

  test("tar entry walker survives 300 deterministic corruptions") {
    val base = Containers.tarEntryBytes("docs/1.txt",
        "hello tar body".getBytes("UTF-8")) ++
      Containers.tarEntryBytes("meta/1.txt", "id=1".getBytes("UTF-8")) ++
      new Array[Byte](1024)
    fuzz("tar", base, b => Containers.parseTar(1L, b))
  }

  test("MP4 sample-table walker survives 300 deterministic corruptions") {
    import spark.implicits._
    val base = Multimodal.mp4SampleCorpusFromDocuments(Seq(6L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    fuzz("mp4", base, Multimodal.parseMp4SampleTables)
    // the frame extractor walks the same boxes plus the mdat byte runs
    val vid = Multimodal.mjpegVideoCorpusFromDocuments(Seq(6L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    fuzz("mp4-frames", vid, b => Multimodal.extractMp4Frames(b))
    // the multi-chunk layout adds the stsc map to the walked surface
    // (7%3==1 -> two chunks + filler; 7%4==3 -> 6 frames)
    val vidMc = Multimodal.mjpegVideoCorpusFromDocuments(Seq(7L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    fuzz("mp4-frames-multichunk", vidMc, b => Multimodal.extractMp4Frames(b))
    // the header walker shares the box iterator — sweep it too
    fuzz("mp4-header", Multimodal.mp4HeaderBytes(640, 360, 600, 1200),
      Multimodal.parseMp4Header)
  }

  test("MP3 header walker survives 300 deterministic corruptions") {
    import spark.implicits._
    val base = Mp3.mp3CorpusFromDocuments(Seq(4L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1) // id3v2-prefixed multi-frame clip
    fuzz("mp3", base, b => Mp3.parseMp3(4L, b))
    val vbr = Mp3.mp3CorpusFromDocuments(Seq(22L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1) // vbr arm
    fuzz("mp3-vbr", vbr, b => Mp3.parseMp3(22L, b))
  }

  test("FLAC metadata walker survives 300 deterministic corruptions") {
    import spark.implicits._
    val base = Flac.flacCorpusFromDocuments(Seq(7L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1) // padding-block clip (7%3==1)
    fuzz("flac", base, b => Flac.parseFlac(7L, b))
  }

  test("ID3v2 walker survives 300 deterministic corruptions per version") {
    import spark.implicits._
    for (id <- Seq(0L, 1L)) { // v2.3 latin-1 / v2.4 utf-8
      val base = Mp3.id3CorpusFromDocuments(Seq(id).toDF("doc_id"))
        .collect()(0).getAs[Array[Byte]](1)
      fuzz(s"id3-$id", base, b => Mp3.parseId3(id, b))
    }
  }

  test("EXIF walker survives 300 deterministic corruptions per byte order") {
    import spark.implicits._
    // 1 -> MM order; 0 -> II; 16 -> truncated-IFD arm as a base
    for (id <- Seq(0L, 1L, 16L)) {
      val base = Exif.exifCorpusFromDocuments(Seq(id).toDF("doc_id"))
        .collect()(0).getAs[Array[Byte]](1)
      fuzz(s"exif-$id", base, b => Exif.parseExif(id, b))
    }
  }

  test("VP8 keyframe decoder survives 300 deterministic corruptions per variant") {
    val px = Array.tabulate(64 * 64)(i => Vp8.q174Gray(7L, i % 64, i / 64))
    for (v <- Seq(Vp8.VariantBpred, Vp8.Variant16x16, Vp8.VariantMixed,
        Vp8.VariantParts)) {
      val base = Vp8.encode(64, 64, px, v)
      fuzz(s"vp8-$v", base, b => Vp8.decodeKeyframe(b, 0, b.length))
    }
  }

  test("AVIF/HEIF walker survives 300 deterministic corruptions per brand") {
    for (brand <- Seq("avif", "heic")) {
      val base = Avif.avifBytes(brand, 640, 480, withAlpha = true,
        codec = if (brand == "avif") "av01" else "hevc")
      fuzz(s"avif-$brand", base, b => Avif.parseAvif(0L, b))
    }
  }

  test("ALPH alpha decoder survives 300 deterministic corruptions per method") {
    val alpha = Array.tabulate[Byte](64 * 64)(i => ((i * 11 + 3) % 256).toByte)
    for (vp8l <- Seq(false, true)) {
      val base = Webp.webpBytes(Seq(
        ("VP8X", Webp.vp8xPayload(alpha = true, anim = false, 64, 64)),
        ("ALPH", Webp.alphPayload(64, 64, alpha, filter = 3, vp8l = vp8l))))
      fuzz(s"alph-$vp8l", base, b => Webp.decodeAlpha(b))
    }
  }

  test("TIFF walker survives 300 deterministic corruptions per byte order") {
    for (be <- Seq(false, true)) {
      val base = Tiff.tiffBytes(640, 480, 8, 5, 2, 3, pages = 2, bigEndian = be)
      fuzz(s"tiff-$be", base, b => Tiff.parseTiff(0L, b))
    }
  }

  test("Ogg tag walker survives 300 deterministic corruptions per codec") {
    for (codec <- Seq("vorbis", "opus")) {
      val idPkt = if (codec == "opus") Ogg.opusIdPacket(2, 312, 48000)
        else Ogg.vorbisIdPacket(2, 48000)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Ogg.pageBytes(0x02, 0L, 7, 0, idPkt))
      out.write(Ogg.pageBytes(0x00, 0L, 7, 1, Ogg.commentPacket(codec, "v",
        Seq("TITLE=fuzz title", "ARTIST=fuzz artist"))))
      out.write(Ogg.pageBytes(0x04, 48000L, 7, 2, Array[Byte](1, 2, 3)))
      fuzz(s"oggtags-$codec", out.toByteArray, b => Ogg.parseTags(0L, b))
    }
  }

  test("PDF walker survives 300 deterministic corruptions per wire shape") {
    val lines = Seq("fuzz page one with some text", "fuzz page two")
    for ((name, o) <- Seq(
        ("classic", Pdf.PdfOpts(flate = true)),
        ("xref-stream-objstm", Pdf.PdfOpts(flate = true, xrefStream = true,
          objStm = true, predictor = true)),
        // font wire shapes: a corrupted /Encoding dict, /Differences
        // array, or /ToUnicode CMap must refuse, never throw
        ("winansi", Pdf.PdfOpts(fontMode = 1)),
        ("differences", Pdf.PdfOpts(fontMode = 3, flate = true)),
        ("tounicode", Pdf.PdfOpts(fontMode = 4)),
        ("type0-cmap", Pdf.PdfOpts(fontMode = 5, flate = true)),
        // a corrupted /Encrypt dict, /O//U value, or ciphertext must
        // land in a tagged refusal, never throw or emit garbage
        ("rc4", Pdf.PdfOpts(realEnc = 1, flate = true)),
        ("aesv2-objstm", Pdf.PdfOpts(realEnc = 3, flate = true,
          xrefStream = true, objStm = true)))) {
      val base = Pdf.pdfBytes(lines, o)
      fuzz(s"pdf-$name", base,
        b => (Pdf.parseInfo(0L, b), Pdf.pageTexts(0L, b)))
    }
  }

  test("H.264 avcC/SPS classifier survives 300 deterministic corruptions") {
    val base = H264.mp4WithCodec("avc1", "avcC",
      H264.avcCBytes(H264.spsBytes(66, 30, 120, 68, cropBottom = 4)))
    fuzz("h264-avcc", base, b => H264.parseMp4Codec(1L, b))
  }

  test("GIF decoder survives 300 deterministic corruptions per wire shape") {
    val frames = (0 until 3).map { f =>
      (Array.tabulate(64 * 64) { i =>
        (((f * 29 + (i % 64) / 8 * 37 + (i / 64) / 8 * 91) % 17) * 15)
      }, 40 + 10 * f)
    }
    for ((name, b) <- Seq(
        ("gct", Gif.gifBytes(64, 64, frames)),
        ("lct-interlace", Gif.gifBytes(64, 64, frames, useLct = true,
          interlace = _ => true)))) {
      fuzz(s"gif-$name", b, x => Gif.decode(x).toOption)
    }
  }

  test("VP8L pixel decoder survives 300 deterministic corruptions per variant") {
    val img = Array.tabulate(32 * 32) { i =>
      val x = i % 32; val y = i / 32
      val g = (((x / 4) * 37 + (y / 4) * 91) % 17) * 15
      0xff000000 | (g << 16) | (g << 8) | g
    }
    for (v <- Seq(Vp8l.VariantPlain, Vp8l.VariantSubGreen,
        Vp8l.VariantPredictor, Vp8l.VariantLz77, Vp8l.VariantCache,
        Vp8l.VariantMeta, Vp8l.VariantColor, Vp8l.VariantPalette,
        Vp8l.VariantDist2d, Vp8l.VariantCacheMeta)) {
      val base = Vp8l.encode(32, 32, img, v)
      fuzz(s"vp8l-$v", base, b => Vp8l.decodeArgb(b, 0, b.length))
    }
  }

  test("ZIP walker survives 300 deterministic corruptions per method mix") {
    val base = Containers.zipBytes(Seq(
      ("docs/a.txt", ("zip fuzz member body " * 8).getBytes("UTF-8"), true),
      ("meta/b.json", """{"id":42}""".getBytes("UTF-8"), false)))
    fuzz("zip", base, b => Containers.parseZip(42L, b))
  }

  test("Ogg page walker survives 300 deterministic corruptions per codec") {
    import spark.implicits._
    // 0 -> vorbis (1 audio page), 1 -> opus, 12 -> vorbis 1+12%3 pages
    for (id <- Seq(0L, 1L, 12L)) {
      val base = Ogg.oggCorpusFromDocuments(Seq(id).toDF("doc_id"))
        .collect()(0).getAs[Array[Byte]](1)
      fuzz(s"ogg-$id", base, b => Ogg.parseOgg(id, b))
    }
  }

  test("WebP chunk walker survives 300 deterministic corruptions per flavor") {
    import spark.implicits._
    // 0 -> lossy, 1 -> lossless (even size), 13 -> lossless (odd size,
    // exercises the pad byte), 8 -> extended (VP8X + inner VP8)
    for (id <- Seq(0L, 1L, 13L, 8L)) {
      val base = Webp.webpCorpusFromDocuments(Seq(id).toDF("doc_id"))
        .collect()(0).getAs[Array[Byte]](1)
      fuzz(s"webp-$id", base, b => Webp.parseWebp(id, b))
    }
    // the animation walk + per-frame VP8L decode
    val anim = Webp.animWebpCorpusFromDocuments(Seq(3L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    fuzz("webp-anim", anim, b => Webp.animFrames(b).map(_.map {
      case (_, Some((o, l))) => Vp8l.decodeRgb(b, o, l); case _ => None }))
  }

  test("zstd decoder survives 300 deterministic corruptions per variant") {
    val text = ("the quick brown fox jumps over the lazy dog; " * 60 +
      "abcdefg" * 40).getBytes("UTF-8")
    for (variant <- Seq(Zstd.VariantAuto, Zstd.VariantRawBlocks,
        Zstd.VariantPredefined, Zstd.VariantFseWeights)) {
      val base = Zstd.compress(text, variant)
      fuzz(s"zstd-v$variant", base, b => Zstd.decompress(b))
    }
    // multi-block frame: Repeat-mode tables + treeless literals on the
    // fuzzed surface
    val big = ("lorem ipsum dolor sit amet " * 3000).getBytes("UTF-8")
    fuzz("zstd-multiblock", Zstd.compress(big, Zstd.VariantAuto, 1 << 14),
      b => Zstd.decompress(b))
  }

  test("H.264 intra decoder survives 300 corruptions of a real AVC MP4") {
    def law(x: Int, y: Int): Int =
      ((((x / 8) * 37 + (y / 8) * 91) % 17) * 15)
    val nal = H264Decode.encodeIdrGray(4, 4, law)
    val base = H264Decode.avcMp4(4, 4, Seq(nal, nal))
    fuzz("avc-mp4", base, { b =>
      H264Decode.avcConfig(b) match {
        case Left(_) => ()
        case Right((sps, pps, ls)) =>
          Multimodal.extractMp4FramesTagged(b) match {
            case Left(_) => ()
            case Right(frames) =>
              frames.foreach { case (_, bytes) =>
                H264Decode.decodeSample(sps, pps, bytes, ls)
              }
          }
      }
    })
    // and the raw slice NAL surface itself (post-container corruption)
    fuzz("avc-idr-nal", nal, { b =>
      val sps = H264Decode.parseSpsDec(H264.spsBytes(66, 30, 4, 4)).toOption.get
      val pps = H264Decode.parsePps(H264Decode.ppsBytes()).toOption.get
      H264Decode.decodeIdr(sps, pps, b)
    })
  }
}
