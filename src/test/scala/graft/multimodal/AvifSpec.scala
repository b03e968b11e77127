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

  test("an EARLY size-0 box is a loud refusal, never a silent sibling-absorber") {
    // per ISO 14496-12 size==0 is valid only for the final top-level
    // box (mdat at EOF); a crafted early size-0 box would otherwise
    // swallow every following sibling — e.g. hide the meta/ispe chain
    // and downgrade the error to 'no_ispe'
    val good = Avif.avifBytes("avif", 8, 8, false, "av01")
    // splice a size-0 'free' box right after ftyp (bytes 0..ftypEnd)
    val ftypEnd = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    val zeroFree = Array[Byte](0, 0, 0, 0) ++ "free".getBytes("ISO-8859-1")
    val crafted = good.take(ftypEnd) ++ zeroFree ++ good.drop(ftypEnd)
    val r = Avif.parseAvif(8L, crafted)
    assert(r.err == "truncated", s"early size-0 must refuse loudly: $r")
    // and a size-0 box of a non-mdat type at EOF refuses too (real
    // captures use the form only for mdat)
    val tailFree = good ++ zeroFree
    assert(Avif.parseAvif(9L, tailFree).err == "truncated")
  }
}
