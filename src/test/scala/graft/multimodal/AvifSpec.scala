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

  test("spec-valid BMFF size forms: size==1 largesize and size==0 to-EOF") {
    val ls = Avif.parseAvif(4L, Avif.avifBytes("avif", 32, 24,
      withAlpha = false, codec = "av01", mdatForm = 1))
    assert(ls == Avif.AvifInfo(4L, 1, "avif", 32L, 24L, 1, "av01", ""), s"$ls")
    val z = Avif.parseAvif(5L, Avif.avifBytes("heic", 32, 24,
      withAlpha = true, codec = "hevc", mdatForm = 2))
    assert(z == Avif.AvifInfo(5L, 1, "heic", 32L, 24L, 2, "hevc", ""), s"$z")
    // a largesize box cut mid-body still surfaces as truncation
    assert(Avif.parseAvif(6L, Avif.avifBytes("avif", 8, 8, false, "av01",
      truncate = true, mdatForm = 1)).err == "truncated")
    // a largesize header cut before its 8 size bytes refuses too
    val cutHdr = Avif.avifBytes("avif", 8, 8, false, "av01", mdatForm = 1)
    assert(Avif.parseAvif(7L, cutHdr.take(cutHdr.length - 28)).err == "truncated")
  }
}
