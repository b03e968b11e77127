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
    val v3 = Mp3.id3Bytes(3, "Tést", "A", "B", "1999", utf8 = false)
    val r3 = Mp3.parseId3(1L, v3)
    assert(r3.ok == 1 && r3.version == 3 && r3.title == "Tést" &&
      r3.year == "1999" && r3.n_frames == 4)
    // v2.4 SYNCSAFE frame sizes, TDRC year, utf-8 text
    val v4 = Mp3.id3Bytes(4, "Títle", "Ärtist", "Albüm", "2020", utf8 = true)
    val r4 = Mp3.parseId3(2L, v4)
    assert(r4.ok == 1 && r4.version == 4 && r4.title == "Títle" &&
      r4.artist == "Ärtist" && r4.year == "2020")
    // a v2.3-sized frame read under v2.4 rules would explode on any
    // frame >= 128 bytes — pin the syncsafe path with one such frame
    val big = Mp3.id3Bytes(4, "x" * 200, "a", "b", "2021", utf8 = false)
    assert(Mp3.parseId3(3L, big).title == "x" * 200)
    // truncation: the last frame declares more than the tag carries
    val t = Mp3.id3Bytes(3, "t", "a", "b", "1990", utf8 = false,
      oversizeLastFrame = 30)
    assert(Mp3.parseId3(4L, t).err == "truncated")
    // UTF-16 encodings are counted, not decoded (scope note)
    val u16 = v3.clone()
    // first frame's encoding byte: header(10) + frame header(10)
    u16(20) = 1
    val ru = Mp3.parseId3(5L, u16)
    assert(ru.ok == 1 && ru.title == "" && ru.n_frames == 4)
  }
}
