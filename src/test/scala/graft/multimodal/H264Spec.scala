package graft.multimodal

import graft.SparkSpec

class H264Spec extends SparkSpec {
  import spark.implicits._

  test("emulation prevention round-trips, including the boundary patterns") {
    for (payload <- Seq(
        Array[Byte](0, 0, 0, 0, 1, 2, 3),
        Array[Byte](0, 0, 1),
        Array[Byte](0, 0, 3), // the escaped-escape case
        Array[Byte](0, 0, 0),
        Array[Byte](1, 2, 3, 4),
        Array.fill[Byte](64)(0))) {
      val wire = H264.addEmulation(payload)
      // no illegal 00 00 0x sequence (x <= 3) survives on the wire
      val bad = (0 until wire.length - 2).exists(i =>
        wire(i) == 0 && wire(i + 1) == 0 && (wire(i + 2) & 0xff) <= 2)
      assert(!bad, wire.mkString(","))
      assert(H264.stripEmulation(wire).toSeq == payload.toSeq)
    }
  }

  test("SPS geometry: mb-aligned, cropped (1080 = 1088 coded - 8), High chroma branch") {
    val flat = H264.parseSps(H264.spsBytes(66, 30, 80, 45))
    assert(flat == Right(H264.Sps(66, 30, 1280, 720)), s"$flat")
    val cropped = H264.parseSps(H264.spsBytes(66, 41, 120, 68, cropBottom = 4))
    assert(cropped == Right(H264.Sps(66, 41, 1920, 1080)), s"$cropped")
    val high = H264.parseSps(H264.spsBytes(100, 40, 40, 23))
    assert(high == Right(H264.Sps(100, 40, 640, 368)), s"$high")
    // refusals: wrong NAL type, scaling matrices, truncation
    val sps = H264.spsBytes(66, 30, 80, 45)
    val wrongNal = sps.clone(); wrongNal(0) = 0x61
    assert(H264.parseSps(wrongNal) == Left("bad_avcc"))
    assert(H264.parseSps(H264.spsBytes(100, 30, 80, 45,
      scalingPresent = true)) == Left("unsupported_sps"))
    assert(H264.parseSps(sps.take(3)) == Left("bad_avcc"))
  }

  test("MP4 codec classification: avc1 parses, others classify, refusals tag") {
    val ok = H264.parseMp4Codec(1L, H264.mp4WithCodec("avc1", "avcC",
      H264.avcCBytes(H264.spsBytes(66, 30, 80, 45))))
    assert(ok == H264.Mp4CodecInfo(1L, 1, "avc1", 66, 30, 1280, 720, ""), s"$ok")
    val hevc = H264.parseMp4Codec(2L,
      H264.mp4WithCodec("hvc1", "hvcC", new Array[Byte](23)))
    assert(hevc == H264.Mp4CodecInfo(2L, 1, "hvc1", 0, 0, 0, 0, ""), s"$hevc")
    val trunc = H264.parseMp4Codec(3L, H264.mp4WithCodec("avc1", "avcC",
      H264.avcCBytes(H264.spsBytes(66, 30, 80, 45), truncate = true)))
    assert(trunc.ok == 0 && trunc.codec == "avc1" && trunc.err == "bad_avcc")
    val notMp4 = H264.parseMp4Codec(4L, H264.mp4WithCodec("avc1", "avcC",
      H264.avcCBytes(H264.spsBytes(66, 30, 80, 45)), breakFtyp = true))
    assert(notMp4.ok == 0 && notMp4.err == "not_mp4")
    // a sample entry with NO config child box
    val bare = H264.parseMp4Codec(5L, H264.mp4WithCodec("avc1", "avcC", null))
    assert(bare.ok == 0 && bare.err == "bad_avcc")
    // an exactly-7-byte record (cut inside the SPS length field) must
    // refuse, never read past the buffer
    val seven = H264.parseMp4Codec(6L, H264.mp4WithCodec("avc1", "avcC",
      H264.avcCBytes(H264.spsBytes(66, 30, 80, 45)).take(7)))
    assert(seven.ok == 0 && seven.err == "bad_avcc", s"$seven")
    // a malformed exp-Golomb prefix (dozens of leading zero bits where
    // pic_width would be) must refuse — Int wraparound would otherwise
    // mint plausible-looking garbage dimensions under ok=1
    val zeros = Array[Byte](0x67, 66, 0, 30,
      0xE8.toByte, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01)
    assert(H264.parseSps(zeros) == Left("bad_avcc"))
  }

  test("a 64-bit largesize smaller than its 16-byte header clamps, never inverts the avcC range") {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val size = 8 + body.length
      Array[Byte](((size >>> 24) & 0xff).toByte, ((size >>> 16) & 0xff).toByte,
        ((size >>> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        typ.getBytes("ISO-8859-1") ++ body
    }
    // avcC with size32 = 1 (largesize form) but largesize = 12, i.e.
    // smaller than its own 16-byte header: body would start at i+16
    // while end = i+12 — pre-guard, copyOfRange(cLo > cHi) threw and
    // killed the task; now it clamps to hi and refuses bad_avcc
    val badAvcc = Array[Byte](0, 0, 0, 1) ++ "avcC".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 12) ++ new Array[Byte](4)
    val entryFixed = new Array[Byte](78); entryFixed(7) = 1
    val entry = box("avc1", entryFixed ++ badAvcc)
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0, 0, 0, 0, 1) ++ entry)
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsd)))))
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++
      new Array[Byte](4) ++ "isom".getBytes("ISO-8859-1"))
    val r = H264.parseMp4Codec(7L, ftyp ++ moov)
    assert(r.ok == 0 && r.err == "bad_avcc", s"$r")
  }

  test("batched decode matches single-payload decode") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L, 20L, 11L).toDF("doc_id")
    val media = H264.mp4AvcCorpusFromDocuments(docs)
    val batched = H264.decodeMp4Codec(media).collect()
      .map(r => r.media_id -> r).toMap
    media.collect().foreach { row =>
      val id = row.getLong(0)
      val p = row.getAs[Array[Byte]](1)
      assert(batched(id) == H264.parseMp4Codec(id, p))
    }
  }
}
