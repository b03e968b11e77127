package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(k => f(k % w, k / w) & 0xff)

  private def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("pHash64: deterministic, noise-robust, content-sensitive") {
    val base = gray(32, 32)((x, y) => ((x / 4) * 37 + (y / 4) * 91) % 17 * 15)
    val noisy = gray(32, 32)((x, y) =>
      math.max(0, math.min(255, ((x / 4) * 37 + (y / 4) * 91) % 17 * 15 +
        (x * 7 + y * 13) % 3 - 1)))
    val other = gray(32, 32)((x, y) => ((x / 4) * 91 + (y / 4) * 37 + 5) % 17 * 15)
    val hBase = Multimodal.pHash64(base, 32, 32)
    assert(hBase == Multimodal.pHash64(base.clone(), 32, 32), "deterministic")
    assert(hd(hBase, Multimodal.pHash64(noisy, 32, 32)) <= 3,
      "small pixel noise must stay within the near-dup bound")
    assert(hd(hBase, Multimodal.pHash64(other, 32, 32)) > 10,
      "a different macro pattern must land far")
    // scale invariance of the downscale: the same pattern at 2x
    // resolution block-sums to 4x the values — same bits
    val big = gray(64, 64)((x, y) => ((x / 8) * 37 + (y / 8) * 91) % 17 * 15)
    assert(Multimodal.pHash64(big, 64, 64) == hBase,
      "resolution must not change the hash of the same pattern")
    intercept[IllegalArgumentException] { Multimodal.pHash64(gray(4, 4)((_, _) => 0), 4, 4) }
  }

  // the fixture's perceptual-equivalence classes: calm ids seed by
  // group, outliers (id%9==0) by a disjoint seed space
  private def seedOf(id: Long): Long =
    if (id % 9 == 0) 10 + id % 7 else id % 10

  test("decode->hash->banded pairs: planted dups found, disjoint-seed outliers never cross") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.phashImageCorpusFromDocuments(docs)
    val hashes = graft.ops.CacheScope.persist(
      Multimodal.decodePngPHash(media).toDF().where($"ok" === 1))
    assert(hashes.count() == docs.count(), "every fixture PNG must decode")
    val pairs = graft.dedup.Dedup.hammingNearDupPairs(
      hashes, "media_id", "phash", totalBits = 64, maxDist = 5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = docs.select($"doc_id").as[Long].collect()
    // EXACT pair set: same seed <=> perceptual dup (measured gap:
    // same-seed distances 0-4, different seeds 10+ — threshold 5
    // separates with margin both ways)
    val expected = (for {
      a <- ids; b <- ids
      if a < b && seedOf(a) == seedOf(b)
    } yield (a, b)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(got == expected,
      s"missing: ${(expected -- got).take(5)}; spurious: ${(got -- expected).take(5)}")
    // in particular: an outlier never pairs with a calm id (disjoint
    // seed spaces), and no calm pair crosses groups
    assert(!pairs.exists(p => (p._1 % 9 == 0) != (p._2 % 9 == 0)),
      "outliers must not near-dup against calm groups")
    assert(pairs.forall(_._3 <= 5))
  }

  test("cross-codec dup: the same picture as PNG and as JPEG hashes identically") {
    // an 8x8-blocky image both codecs reproduce pixel-exactly (PNG is
    // lossless; a DC-only JPEG block IS its constant value)
    def p(bx: Int, by: Int): Int = (bx * 37 + by * 91) % 17 * 15
    val png = Multimodal.pngBytes(32, 32, (x, y, _) => p(x / 8, y / 8))
    val jpg = Jpeg.dcOnlyBytes(32, 32, 1, (bx, by, _) => p(bx, by))
    val media = Seq((1L, png), (2L, jpg))
    val hPng = Multimodal.decodePngPHash(
      Seq(media(0)).toDF("media_id", "payload")).collect()(0)
    val hJpg = Multimodal.decodeJpegPHash(
      Seq(media(1)).toDF("media_id", "payload")).collect()(0)
    assert(hPng.ok == 1 && hJpg.ok == 1)
    assert(hPng.phash == hJpg.phash,
      "identical pixels through different codecs must hash identically")
    // and the pair machinery finds the cross-codec dup from the union
    val both = Seq((1L, hPng.phash), (2L, hJpg.phash)).toDF("media_id", "phash")
    val pairs = graft.dedup.Dedup.hammingNearDupPairs(both, "media_id", "phash",
      64, 5, bands = 8).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
  }

  test("audio fingerprint: volume-invariant, envelope-sensitive; gate semantics hold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // volume invariance: scaling every sample scales every DCT
    // coefficient, so the median bits cannot move
    def clip(scale: Int): Array[Short] = Array.tabulate(256) { i =>
      val cell = i / 4
      val a = ((cell / 8) * 37 + (cell % 8) * 91) % 17 * 120
      ((a * scale / 4) * (if (i % 2 == 0) 1 else -1)).toShort
    }
    val f1 = Multimodal.audioFingerprint64(clip(4), 1)
    assert(f1 == Multimodal.audioFingerprint64(clip(2), 1),
      "half volume must not change the fingerprint")
    intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint64(new Array[Short](32), 1)
    }
    // end-to-end: decode -> fingerprint -> banded pairs, exact pair set
    val fps = graft.ops.CacheScope.persist(
      Multimodal.decodeWavFingerprint(
        Multimodal.audioFpCorpusFromDocuments(docs)).toDF().where($"ok" === 1))
    assert(fps.count() == docs.count(), "every fixture WAV must decode")
    val pairs = graft.dedup.Dedup.hammingNearDupPairs(
      fps, "media_id", "afp", totalBits = 64, maxDist = 5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = docs.select($"doc_id").as[Long].collect()
    val expected = (for {
      a <- ids; b <- ids
      if a < b && seedOf(a) == seedOf(b)
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      "audio pair set must be exactly the same-seed classes")
  }

  test("mixed-codec corpus: cross-codec same-seed dups pair, distinct seeds stay apart") {
    // decade keys the codec: 3/23 are PNG, 13 is JPEG — all seed 3.
    // 5 (PNG) / 15 (JPEG) are seed 5. 9/99 are id%9==0 outliers with
    // DISTINCT disjoint-space seeds (12 and 11) — no pair anywhere.
    val docs = Seq(3L, 13L, 23L, 5L, 15L, 9L, 99L).toDF("doc_id")
    val media = Multimodal.mixedCodecImageCorpusFromDocuments(docs)
    val byId = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert((byId(3L)(0) & 0xff) == 0x89 && (byId(13L)(0) & 0xff) == 0xff,
      "decade 0 must be PNG bytes, decade 1 JPEG bytes")
    assert(!java.util.Arrays.equals(byId(3L), byId(23L)),
      "same-seed same-codec payloads stay byte-distinct (noise)")
    val hs = Multimodal.decodeImagePHash(media).collect()
    assert(hs.forall(_.ok == 1), "both codecs must really decode")
    val h = hs.map(r => r.media_id -> r.phash).toMap
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(hd(3L, 13L) <= 5, s"PNG-JPEG same seed must pair: hd=${hd(3L, 13L)}")
    assert(hd(13L, 23L) <= 5, s"JPEG-PNG same seed must pair: hd=${hd(13L, 23L)}")
    assert(hd(5L, 15L) <= 5, s"seed-5 cross-codec must pair: hd=${hd(5L, 15L)}")
    assert(hd(3L, 5L) > 5 && hd(13L, 15L) > 5,
      "distinct seeds stay apart within AND across codecs")
    assert(hd(3L, 15L) > 5 && hd(9L, 99L) > 5 && hd(9L, 3L) > 5,
      "outliers with distinct seeds never pair")
  }

  test("video frames: extraction round trip, per-frame decode errors, clip-level dups") {
    // 11/21 share id%10; 18: clean control. Frame counts are 3+id%4:
    // 11 -> 6, 21 -> 4, 16 -> 3, 18 -> 5. 16 (16%6==4) is the
    // corrupt-frame plant AND multi-chunk (16%3==1); 11/18 single-chunk.
    val docs = Seq(11L, 21L, 16L, 18L).toDF("doc_id")
    val media = Multimodal.mjpegVideoCorpusFromDocuments(docs)
    // extraction returns exactly the muxed JPEG bytes
    val p11 = media.where($"media_id" === 11L).collect()(0).getAs[Array[Byte]]("payload")
    val frames = Multimodal.extractMp4Frames(p11).get
    assert(frames.map(_._1) == (0 until 6))
    assert(frames.forall { case (_, b) =>
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 }, "frames must be real JPEGs")
    // multi-chunk clip (19%3==1, clean): the stsc walk must skip the
    // inter-chunk filler — every frame is still a real JPEG
    val m19 = Multimodal.mjpegVideoCorpusFromDocuments(Seq(19L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("payload")
    val f19 = Multimodal.extractMp4Frames(m19).get
    assert(f19.map(_._1) == (0 until 6)) // 19%4==3 -> 6 frames
    assert(f19.forall { case (_, b) =>
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 },
      "multi-chunk frames must be the real JPEG runs, not filler-shifted bytes")
    val hashes = Multimodal.decodeMp4FramePHash(media).collect()
      .map(r => (r.media_id, r.frame_idx) -> ((r.ok, r.phash, r.err))).toMap
    assert(hashes.size == 6 + 4 + 3 + 5)
    // id 16 (16%6==4) carries the zeroed-SOI frame 1; the error family
    // is the DECODE's, not the container walk's
    assert(hashes((16L, 1))._1 == 0 && hashes((16L, 1))._2 == 0L)
    assert(hashes((16L, 1))._3 == "frame_decode")
    assert(hashes.filter(_._1 != ((16L, 1))).forall(h =>
      h._2._1 == 1 && h._2._3 == ""))
    // clips sharing id%10 share every common frame hash (the clip-dup
    // signal); different patterns differ
    (0 until 4).foreach { f => // 21 has 4 frames
      assert(hashes((11L, f))._2 == hashes((21L, f))._2, s"frame $f must match")
      assert(hashes((11L, f))._2 != hashes((18L, f))._2)
    }
    // container-level failure: junk payload -> one ok=0 row, tagged
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val jr = Multimodal.decodeMp4FramePHash(junk).collect()
    assert(jr.length == 1 && jr(0).ok == 0 && jr(0).err == "not_mp4")
  }

  test("banded pairs == brute force within the pigeonhole-exact radius") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hashes = graft.ops.CacheScope.persist(
      Multimodal.decodePngPHash(
        Multimodal.phashImageCorpusFromDocuments(docs)).toDF().where($"ok" === 1))
    val banded = graft.dedup.Dedup.hammingNearDupPairs(
        hashes, "media_id", "phash", 64, 5, bands = 8)
      .collect().map(_.toString).sorted.toSeq
    val brute = hashes.as("a").join(hashes.as("b"), $"a.media_id" < $"b.media_id")
      .select($"a.media_id".as("id_a"), $"b.media_id".as("id_b"),
        bit_count($"a.phash".bitwiseXOR($"b.phash")).cast("long").as("hamming_dist"))
      .where($"hamming_dist" <= 5)
      .collect().map(_.toString).sorted.toSeq
    assert(banded == brute)
    // a maxDist past the band count's exact radius fails fast
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash", 64, 4)
    }
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash", 64, 8, bands = 8)
    }
  }
}
