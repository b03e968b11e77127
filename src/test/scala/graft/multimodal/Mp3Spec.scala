package graft.multimodal

import graft.SparkSpec

class Mp3Spec extends SparkSpec {

  private def frame(version: Int = 0, layer: Int = 3, brIdx: Int = 5,
      srIdx: Int = 0, pad: Int = 0, crc: Boolean = false): Array[Byte] =
    Mp3.frameBytes(version, layer, brIdx, srIdx, pad, crc)

  test("clean walk: frame count, duration, classification") {
    // 4 × MPEG1 Layer III 64kbps @ 44100: spf 1152
    val b = frame() ++ frame() ++ frame() ++ frame()
    val i = Mp3.parseMp3(7L, b)
    assert(i.ok == 1 && i.err == "")
    assert(i.version == "1" && i.layer == 3 && i.sample_rate == 44100)
    assert(i.first_bitrate_kbps == 64 && i.vbr == 0)
    assert(i.n_frames == 4)
    assert(i.duration_ms == 4L * 1152 * 1000 / 44100)
  }

  test("frame length arithmetic: padding and layer I slot-of-4 rule") {
    // Layer I: ((12*br*1000/rate) + pad) * 4
    assert(Mp3.frameLength(0, 1, 32, 44100, 0) == (12 * 32000 / 44100) * 4)
    assert(Mp3.frameLength(0, 1, 32, 44100, 1) == (12 * 32000 / 44100 + 1) * 4)
    // Layer III MPEG1 vs MPEG2: 1152 vs 576 samples per frame
    assert(Mp3.frameLength(0, 3, 64, 44100, 0) == 144 * 64000 / 44100)
    assert(Mp3.frameLength(1, 3, 64, 22050, 0) == 72 * 64000 / 22050)
    // padding adds ONE byte for layers II/III
    assert(Mp3.frameLength(0, 3, 64, 44100, 1) == 144 * 64000 / 44100 + 1)
  }

  test("vbr: differing bitrate indices flag, same-parameter stream does not") {
    val b = frame(brIdx = 5) ++ frame(brIdx = 9) ++ frame(brIdx = 5)
    val i = Mp3.parseMp3(1L, b)
    assert(i.ok == 1 && i.vbr == 1 && i.n_frames == 3)
    assert(i.first_bitrate_kbps == 64) // frame 0's
  }

  test("mid-stream parameter change is bad_header, not vbr") {
    val b = frame(srIdx = 0) ++ frame(srIdx = 1)
    val i = Mp3.parseMp3(1L, b)
    assert(i.ok == 0 && i.err == "bad_header" && i.n_frames == 1)
    // the parsed prefix's classification is kept
    assert(i.sample_rate == 44100 && i.version == "1")
  }

  test("error families: free bitrate, reserved rate, lost sync, truncation") {
    val free = frame().clone()
    free(2) = (free(2) & 0x0f).toByte // bitrate index 0 = "free"
    assert(Mp3.parseMp3(1L, free).err == "bad_header")
    val badSr = frame().clone()
    badSr(2) = (badSr(2) | 0x0c).toByte // rate index 3 = reserved
    assert(Mp3.parseMp3(1L, badSr).err == "bad_header")
    val noSync = frame() ++ Array[Byte](1, 2, 3, 4, 5)
    val ns = Mp3.parseMp3(1L, noSync)
    assert(ns.err == "bad_sync" && ns.n_frames == 1 && ns.ok == 0)
    val cut = (frame() ++ frame()).dropRight(10)
    val tr = Mp3.parseMp3(1L, cut)
    assert(tr.err == "truncated" && tr.n_frames == 1)
    assert(Mp3.parseMp3(1L, Array[Byte](0x12, 0x34)).err == "bad_sync")
    assert(Mp3.parseMp3(1L, null).err == "bad_sync")
  }

  test("tags: ID3v2 skipped and counted, oversized tag is truncated, ID3v1 trailer") {
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 5) ++
      Array.fill(5)(0x33.toByte)
    val i = Mp3.parseMp3(1L, tag ++ frame())
    assert(i.ok == 1 && i.id3v2_bytes == 15 && i.n_frames == 1)
    val over = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 0) ++
      Array.fill(3)(0x33.toByte) // claims 128 content bytes, has 3
    assert(Mp3.parseMp3(1L, over).err == "truncated")
    val v1 = Array[Byte]('T', 'A', 'G') ++ Array.fill(125)(0x20.toByte)
    val j = Mp3.parseMp3(1L, frame() ++ v1)
    assert(j.ok == 1 && j.id3v1 == 1 && j.n_frames == 1)
    // a 127-byte tail starting TAG is NOT an ID3v1 block
    assert(Mp3.parseMp3(1L, frame() ++ v1.dropRight(1)).err == "bad_sync")
  }

  test("crc flag: the 2 CRC bytes live inside the frame length") {
    val b = frame(crc = true) ++ frame(crc = true)
    val i = Mp3.parseMp3(1L, b)
    assert(i.ok == 1 && i.n_frames == 2)
  }

  test("corpus walk at spark level matches the per-id arithmetic") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val out = Mp3.decodeMp3Info(Mp3.mp3CorpusFromDocuments(docs)).toDF()
    val rows = out.select("media_id", "ok", "n_frames", "err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expectErr =
        if (id % 13 == 7) "bad_header"
        else if (id % 7 == 3) "bad_sync"
        else if (id % 7 == 5) "truncated" else ""
      assert(r.getString(3) == expectErr, s"id $id err")
      assert((r.getInt(1) == 1) == expectErr.isEmpty, s"id $id ok")
    }
  }

  test("ID3v2: both versions' size conventions, year frame per version, NUL strip") {
    // v2.3 plain-BE frame sizes, TYER year
    val v3 = Mp3.id3Bytes(3, "Tést", "A", "B", "1999", enc = Mp3.EncLatin1)
    val r3 = Mp3.parseId3(1L, v3)
    assert(r3.ok == 1 && r3.version == 3 && r3.title == "Tést" &&
      r3.year == "1999" && r3.n_frames == 4)
    // v2.4 SYNCSAFE frame sizes, TDRC year, utf-8 text
    val v4 = Mp3.id3Bytes(4, "Títle", "Ärtist", "Albüm", "2020",
      enc = Mp3.EncUtf8)
    val r4 = Mp3.parseId3(2L, v4)
    assert(r4.ok == 1 && r4.version == 4 && r4.title == "Títle" &&
      r4.artist == "Ärtist" && r4.year == "2020")
    // a v2.3-sized frame read under v2.4 rules would explode on any
    // frame >= 128 bytes — pin the syncsafe path with one such frame
    val big = Mp3.id3Bytes(4, "x" * 200, "a", "b", "2021",
      enc = Mp3.EncLatin1)
    assert(Mp3.parseId3(3L, big).title == "x" * 200)
    // truncation: the last frame declares more than the tag carries
    val t = Mp3.id3Bytes(3, "t", "a", "b", "1990", enc = Mp3.EncLatin1,
      oversizeLastFrame = 30)
    assert(Mp3.parseId3(4L, t).err == "truncated")
  }

  test("ID3v2 UTF-16: both BOMs, v2.4 BE-without-BOM, BOM-less refusal") {
    // non-latin text proves real UTF-16 decode, not byte passthrough
    val title = "Tiтle 中"
    val le = Mp3.parseId3(1L, Mp3.id3Bytes(3, title, "A", "B", "1999",
      enc = Mp3.EncUtf16LeBom))
    assert(le.ok == 1 && le.title == title && le.artist == "A")
    val be = Mp3.parseId3(2L, Mp3.id3Bytes(3, title, "A", "B", "1999",
      enc = Mp3.EncUtf16BeBom))
    assert(be.ok == 1 && be.title == title && be.year == "1999")
    // v2.4 encoding byte 2: UTF-16BE with NO BOM
    val be24 = Mp3.parseId3(3L, Mp3.id3Bytes(4, title, "A", "B", "2001",
      enc = Mp3.EncUtf16Be))
    assert(be24.ok == 1 && be24.title == title && be24.year == "2001")
    // encoding byte 1 without a BOM: loud refusal, never mojibake
    val nb = Mp3.parseId3(4L, Mp3.id3Bytes(3, title, "A", "B", "1999",
      enc = Mp3.EncUtf16NoBom))
    assert(nb.ok == 0 && nb.err == "bad_encoding")
    // encoding byte 3 under v2.3 (not in its set): refusal too
    val v3utf8 = Mp3.id3Bytes(3, "t", "a", "b", "1990", enc = Mp3.EncUtf8)
    assert(Mp3.parseId3(5L, v3utf8).err == "bad_encoding")
  }

  test("ID3v2.2: 3-char frames, 3-byte BE sizes, TYE year") {
    val v2 = Mp3.id3Bytes(2, "Old Title", "Old Artist", "Old Album", "1988",
      enc = Mp3.EncLatin1)
    val r = Mp3.parseId3(1L, v2)
    assert(r.ok == 1 && r.version == 2 && r.title == "Old Title" &&
      r.artist == "Old Artist" && r.album == "Old Album" &&
      r.year == "1988" && r.n_frames == 4)
  }

  test("ID3v2 header flags: ext header skipped per version, unsync refused") {
    for (ver <- Seq(3, 4)) {
      val e = Mp3.id3Bytes(ver, "T", "A", "B", "1999", enc = Mp3.EncLatin1,
        extHeader = true)
      val r = Mp3.parseId3(ver.toLong, e)
      assert(r.ok == 1 && r.title == "T" && r.n_frames == 4,
        s"v2.$ver ext header")
    }
    val unsync = Mp3.id3Bytes(3, "T", "A", "B", "1999", enc = Mp3.EncLatin1,
      flags = 0x80)
    assert(Mp3.parseId3(9L, unsync).err == "unsupported_flags")
    val footer = Mp3.id3Bytes(4, "T", "A", "B", "1999", enc = Mp3.EncLatin1,
      flags = 0x10)
    assert(Mp3.parseId3(10L, footer).err == "unsupported_flags")
  }
}
