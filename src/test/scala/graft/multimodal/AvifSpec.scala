package graft.multimodal

import graft.SparkSpec

class AvifSpec extends SparkSpec {

  test("both brands parse dims, codec box, and the aux-alpha ispe count") {
    val a = Avif.parseAvif(1L, Avif.avifBytes("avif", 640, 480,
      withAlpha = true, codec = "av01"))
    assert(a == Avif.AvifInfo(1L, 1, "avif", 640L, 480L, 2, "av01", ""), s"$a")
    val h = Avif.parseAvif(2L, Avif.avifBytes("heic", 100, 60,
      withAlpha = false, codec = "hevc"))
    assert(h == Avif.AvifInfo(2L, 1, "heic", 100L, 60L, 1, "hevc", ""), s"$h")
    // the mif1 structural brand is still the HEIF family
    assert(Avif.parseAvif(3L, Avif.avifBytes("mif1", 8, 8,
      withAlpha = false, codec = "av01")).ok == 1)
  }

  test("refusal families in precedence order") {
    assert(Avif.parseAvif(1L, Avif.avifBytes("avif", 8, 8, false, "av01",
      breakMagic = true)).err == "not_bmff")
    assert(Avif.parseAvif(1L, Array[Byte](1, 2, 3)).err == "not_bmff")
    assert(Avif.parseAvif(1L, Avif.avifBytes("mp41", 8, 8, false, "av01"))
      .err == "not_heif")
    assert(Avif.parseAvif(1L, Avif.avifBytes("avif", 8, 8, false, "av01",
      truncate = true)).err == "truncated")
    assert(Avif.parseAvif(1L, Avif.avifBytes("avif", 8, 8, false, "av01",
      dropIspe = true)).err == "no_ispe")
  }
}
