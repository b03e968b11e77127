package graft.multimodal

import graft.SparkSpec

class TiffSpec extends SparkSpec {

  test("both byte orders parse every tag; the indirection carries 3-sample bits") {
    for (be <- Seq(false, true)) {
      val b = Tiff.tiffBytes(640, 480, 8, 5, 2, 3, pages = 2, bigEndian = be)
      val r = Tiff.parseTiff(1L, b)
      assert(r.ok == 1 && r.byte_order == (if (be) "MM" else "II"), s"$r")
      assert(r.width == 640L && r.height == 480L && r.bits == 8)
      assert(r.compression == 5 && r.photometric == 2 && r.samples == 3)
      assert(r.n_pages == 2)
    }
    // single-sample inline SHORT path
    val mono = Tiff.parseTiff(2L, Tiff.tiffBytes(33, 17, 8, 1, 1, 1, 1))
    assert(mono.ok == 1 && mono.bits == 8 && mono.samples == 1 &&
      mono.n_pages == 1)
  }

  test("refusal families: magic, mid-table truncation, self-looping IFD chain") {
    assert(Tiff.parseTiff(1L, Tiff.tiffBytes(8, 8, 8, 1, 1, 1, 1,
      breakMagic = true)).err == "not_tiff")
    assert(Tiff.parseTiff(1L, Array[Byte]('I', 'I', 9, 9)).err == "not_tiff")
    assert(Tiff.parseTiff(1L, Tiff.tiffBytes(8, 8, 8, 1, 1, 1, 2,
      truncate = true)).err == "truncated")
    assert(Tiff.parseTiff(1L, Tiff.tiffBytes(8, 8, 8, 1, 1, 1, 1,
      breakIfd = true)).err == "bad_ifd",
      "a next-IFD pointer looping back must trip the cycle guard")
  }

  test("parseImageHeader sniffs TIFF after the other codecs") {
    val b = Tiff.tiffBytes(100, 60, 8, 1, 2, 3, 1, bigEndian = true)
    assert(Multimodal.parseImageHeader(b) ==
      Some(("tiff", 100, 60, 8, 3, "MM")))
  }
}
