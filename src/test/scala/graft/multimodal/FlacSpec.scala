package graft.multimodal

import graft.SparkSpec

class FlacSpec extends SparkSpec {

  private def clip(rate: Int, channels: Int, bits: Int, total: Long,
      blocks: Seq[(Boolean, Int, Array[Byte])] = Nil,
      audio: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = Flac.streaminfoBytes(rate, channels, bits, total)
    val all = ((blocks.isEmpty, 0, si) +: blocks.map(b => (b._1, b._2, b._3)))
      .map { case (l, t, b) => (l, t, b) }
    all.zipWithIndex.foreach { case ((_, t, b), i) =>
      val lastF = i == all.length - 1
      out.write((if (lastF) 0x80 else 0) | t)
      out.write((b.length >> 16) & 0xff); out.write((b.length >> 8) & 0xff)
      out.write(b.length & 0xff)
      out.write(b, 0, b.length)
    }
    (0 until audio).foreach(i => out.write(i & 0xff))
    out.toByteArray
  }

  test("STREAMINFO field widths: 20-bit rates, 3-bit channels, 5-bit depth, 36-bit samples") {
    // boundary-ish values exercise the cross-byte bit packing
    val i = Flac.parseFlac(1L, clip(192000, 8, 24, 0xABCDEF012L))
    assert(i.ok == 1)
    assert(i.sample_rate == 192000 && i.channels == 8 && i.bits_per_sample == 24)
    assert(i.total_samples == 0xABCDEF012L)
    assert(i.duration_ms == 0xABCDEF012L * 1000L / 192000L)
    val j = Flac.parseFlac(2L, clip(8000, 1, 4, 1L))
    assert(j.sample_rate == 8000 && j.channels == 1 && j.bits_per_sample == 4)
  }

  test("block chain: padding blocks counted, audio payload counted opaque") {
    val b = clip(44100, 2, 16, 44100L,
      blocks = Seq((false, 1, new Array[Byte](9)), (true, 4, new Array[Byte](5))),
      audio = 123)
    val i = Flac.parseFlac(1L, b)
    assert(i.ok == 1 && i.n_meta_blocks == 3 && i.audio_bytes == 123L)
    assert(i.duration_ms == 1000L)
  }

  test("error families: magic, first-block rule, zero rate, truncation") {
    assert(Flac.parseFlac(1L, null).err == "not_flac")
    assert(Flac.parseFlac(1L, "OggS234567".getBytes("UTF-8")).err == "not_flac")
    val good = clip(44100, 2, 16, 100L)
    // first block must be STREAMINFO: flip its type to padding
    val wrongType = good.clone(); wrongType(4) = (wrongType(4) | 0x01).toByte
    assert(Flac.parseFlac(1L, wrongType).err == "no_streaminfo")
    // STREAMINFO must be exactly 34 bytes: declare 35 (trailing audio
    // bytes keep the declared length in-bounds, so the LENGTH RULE is
    // what rejects, not the bounds check)
    val withTail = clip(44100, 2, 16, 100L, audio = 10)
    val wrongLen = withTail.clone(); wrongLen(7) = 35.toByte
    assert(Flac.parseFlac(1L, wrongLen).err == "no_streaminfo")
    // a 0 sample rate is invalid per spec
    val zeroRate = clip(0, 2, 16, 100L)
    assert(Flac.parseFlac(1L, zeroRate).err == "no_streaminfo")
    // declared length past the payload
    assert(Flac.parseFlac(1L, good.dropRight(5)).err == "truncated")
    // a non-last chain that ends without its next block header
    val chain = clip(44100, 2, 16, 100L,
      blocks = Seq((true, 1, new Array[Byte](6))))
    assert(Flac.parseFlac(1L, chain.dropRight(7)).err == "truncated")
  }
}
