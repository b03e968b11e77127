package graft.multimodal

import graft.SparkSpec

class OggSpec extends SparkSpec {

  test("page CRC is the Ogg forward CRC-32 (check value for '123456789')") {
    // poly 0x04c11db7, init 0, no reflection, no xorout: the catalogued
    // CRC-32/POSIX check 0x765E7680 without its final complement
    val b = "123456789".getBytes("ISO-8859-1")
    assert(Ogg.pageCrc(b, 0, b.length, crcFieldAt = -100) == 0x89a1897f)
  }

  test("vorbis: id header fields + granule duration") {
    import spark.implicits._
    // id 0: vorbis, rate 8000, 1 channel, granule 48000, 1 audio page
    val out = Ogg.decodeOggInfo(Ogg.oggCorpusFromDocuments(
      Seq(0L).toDF("doc_id"))).collect()(0)
    assert(out.ok == 1 && out.codec == "vorbis" && out.sample_rate == 8000 &&
      out.channels == 1 && out.pre_skip == 0 && out.n_pages == 2 &&
      out.granule_end == 48000L && out.duration_ms == 6000L &&
      out.audio_bytes == 20L && out.err == "")
  }

  test("opus: pre-skip subtracts from the 48kHz granule clock") {
    import spark.implicits._
    // id 1: opus, 2 channels, granule 48001, pre-skip 312
    val out = Ogg.decodeOggInfo(Ogg.oggCorpusFromDocuments(
      Seq(1L).toDF("doc_id"))).collect()(0)
    assert(out.ok == 1 && out.codec == "opus" && out.sample_rate == 48000 &&
      out.channels == 2 && out.pre_skip == 312)
    assert(out.duration_ms == (48001L - 312L) * 1000L / 48000L)
  }

  test("every refusal family fires exactly where planted") {
    import spark.implicits._
    val ids = (0L until 400L).toDF("doc_id")
    val out = Ogg.decodeOggInfo(Ogg.oggCorpusFromDocuments(ids))
      .collect().map(r => r.media_id -> r).toMap
    for (id <- 0L until 400L) {
      def m(k: Long): Long = java.lang.Math.floorMod(id, k)
      val r = out(id)
      if (m(7) == 2) assert(r.err == "not_ogg", s"id=$id")
      else if (m(7) == 4) assert(r.err == "truncated", s"id=$id")
      else if (m(17) == 7) assert(r.err == "bad_version", s"id=$id")
      else if (m(11) == 5) assert(r.err == "bad_crc", s"id=$id")
      else if (m(13) == 3) assert(r.err == "unknown_codec", s"id=$id")
      else assert(r.ok == 1 && r.n_pages == 2 + m(3) &&
        r.audio_bytes == (1 + m(3)) * (20 + m(50)), s"id=$id -> $r")
    }
  }

  test("a flipped body byte anywhere in a page fails the CRC") {
    import spark.implicits._
    val base = Ogg.oggCorpusFromDocuments(Seq(0L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]](1)
    // flip one byte inside the FIRST page's body (the vorbis id packet
    // rate field): CRC must catch it before field extraction trusts it
    val bad = base.clone()
    bad(27 + 1 + 12) = (bad(27 + 1 + 12) ^ 0x01).toByte
    assert(Ogg.parseOgg(0L, bad).err == "bad_crc")
  }

  test("no_bos: a first page without the BOS flag refuses") {
    val body = Ogg.vorbisIdPacket(2, 44100)
    val page = Ogg.pageBytes(0x00, 0L, 7, 0, body)
    assert(Ogg.parseOgg(9L, page).err == "no_bos")
  }

  test("granule -1 pages (no packet ends) do not move the end position") {
    val bos = Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.vorbisIdPacket(1, 8000))
    val mid = Ogg.pageBytes(0x00, -1L, 7, 1, Array.fill[Byte](30)(3))
    val eos = Ogg.pageBytes(0x04, 16000L, 7, 2, Array.fill[Byte](30)(4))
    val r = Ogg.parseOgg(10L, bos ++ mid ++ eos)
    assert(r.ok == 1 && r.granule_end == 16000L && r.duration_ms == 2000L &&
      r.n_pages == 3)
  }

  test("multi-segment lacing: a 300-byte body walks as one page") {
    val bos = Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.vorbisIdPacket(1, 8000))
    val big = Ogg.pageBytes(0x04, 8000L, 7, 1,
      Array.tabulate[Byte](300)(i => (i % 127).toByte))
    val r = Ogg.parseOgg(11L, bos ++ big)
    assert(r.ok == 1 && r.n_pages == 2 && r.audio_bytes == 300L)
  }

  private def tagged(codec: String, comments: Seq[String],
      span: Boolean = false, breakMagic: Boolean = false,
      vendor: String = "v1"): Array[Byte] = {
    val idPkt = if (codec == "opus") Ogg.opusIdPacket(2, 312, 48000)
      else Ogg.vorbisIdPacket(2, 48000)
    val pkt = Ogg.commentPacket(codec, vendor, comments, breakMagic = breakMagic)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Ogg.pageBytes(0x02, 0L, 7, 0, idPkt))
    if (span) {
      val padded = java.util.Arrays.copyOf(pkt, math.max(256, pkt.length + 1))
      out.write(Ogg.pageBytes(0x00, -1L, 7, 1, padded.take(255), continues = true))
      out.write(Ogg.pageBytes(0x01, 0L, 7, 2, padded.drop(255)))
    } else out.write(Ogg.pageBytes(0x00, 0L, 7, 1, pkt))
    out.write(Ogg.pageBytes(0x04, 48000L, 7, 3, Array[Byte](1, 2, 3)))
    out.toByteArray
  }

  test("comment tags: both codec forms, case-insensitive keys, first-wins, UTF-8") {
    for (codec <- Seq("vorbis", "opus")) {
      val t = Ogg.parseTags(1L, tagged(codec, Seq(
        "Title=Première", "ARTIST=a1", "artist=a2 (ignored: first wins)",
        "UNKNOWN=counted not extracted", "Album=LP")))
      assert(t.ok == 1 && t.codec == codec, s"$t")
      assert(t.title == "Première" && t.artist == "a1" && t.album == "LP")
      assert(t.n_comments == 5 && t.vendor == "v1")
    }
  }

  test("comment tags: a packet spanning a continuing all-255 page reassembles") {
    for (codec <- Seq("vorbis", "opus")) {
      val t = Ogg.parseTags(2L, tagged(codec, Seq("TITLE=spanning"), span = true))
      assert(t.ok == 1 && t.title == "spanning", s"$t")
    }
  }

  test("comment tags: refusal families") {
    // broken comment magic
    assert(Ogg.parseTags(3L, tagged("opus", Seq("TITLE=x"),
      breakMagic = true)).err == "no_tags")
    // only the BOS page: stream ends before a second packet
    val bosOnly = Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.opusIdPacket(2, 312, 48000))
    assert(Ogg.parseTags(4L, bosOnly).err == "no_tags")
    // a comment length past the packet end
    val inflated = {
      val pkt = Ogg.commentPacket("opus", "v1", Seq("TITLE=x"), inflateLast = true)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.opusIdPacket(2, 312, 48000)))
      out.write(Ogg.pageBytes(0x04, 1L, 7, 1, pkt))
      out.toByteArray
    }
    assert(Ogg.parseTags(5L, inflated).err == "bad_tags")
    // a vorbis comment header without the framing bit
    val noFraming = {
      val pkt = Ogg.commentPacket("vorbis", "v1", Seq("TITLE=x"))
      pkt(pkt.length - 1) = 0 // zero the framing byte
      val out = new java.io.ByteArrayOutputStream()
      out.write(Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.vorbisIdPacket(2, 48000)))
      out.write(Ogg.pageBytes(0x04, 1L, 7, 1, pkt))
      out.toByteArray
    }
    assert(Ogg.parseTags(6L, noFraming).err == "bad_tags")
    // a comment with no '=' separator
    val noEq = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Ogg.pageBytes(0x02, 0L, 7, 0, Ogg.opusIdPacket(2, 312, 48000)))
      out.write(Ogg.pageBytes(0x04, 1L, 7, 1,
        Ogg.commentPacket("opus", "v1", Seq("noequals"))))
      out.toByteArray
    }
    assert(Ogg.parseTags(7L, noEq).err == "bad_tags")
    // container families surface unchanged
    assert(Ogg.parseTags(8L, Array[Byte](1, 2, 3)).err == "not_ogg")
  }
}
