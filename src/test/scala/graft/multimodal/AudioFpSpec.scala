package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private def wav(samples: Array[Short], ch: Int = 1): Array[Byte] = {
    val body = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      body(i * 2) = (samples(i) & 0xff).toByte
      body(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    Multimodal.wavHeaderBytes(16000, ch, 16, body.length) ++ body
  }

  test("fingerprint is level-shift tolerant and content-sensitive") {
    val n = AudioFp.FrameLen * AudioFp.NFrames
    def sig(key: Long, dc: Int): Array[Short] = Array.tabulate[Short](n)(i =>
      (((i + 3L + key * 131L) * (i + 11L + key * 17L) * 2654435761L) % 65000L
        - 32500L + dc).toShort)
    val a = AudioFp.fingerprint(sig(5, 0)).get
    val b = AudioFp.fingerprint(sig(5, 2)).get
    val c = AudioFp.fingerprint(sig(9, 0)).get
    assert(java.lang.Long.bitCount(a ^ b) <= 3,
      s"a DC level shift must stay inside the hamming ball: ${a ^ b}")
    assert(java.lang.Long.bitCount(a ^ c) > 3,
      "different signals must not collide")
    // deterministic
    assert(AudioFp.fingerprint(sig(5, 0)).get == a)
    // too short refuses
    assert(AudioFp.fingerprint(sig(5, 0).take(n - 1)).isEmpty)
  }

  test("batched decode: channel-0 of stereo, refusals, corpus law") {
    val n = AudioFp.FrameLen * AudioFp.NFrames
    val mono = Array.tabulate[Short](n)(i => ((i * 37) % 2000 - 1000).toShort)
    // stereo with the same channel 0 and junk channel 1 -> same fp
    val stereo = Array.tabulate[Short](n * 2)(k =>
      if (k % 2 == 0) mono(k / 2) else ((k * 13) % 500).toShort)
    val rows = AudioFp.decodeAudioFp(Seq(
        (1L, wav(mono)), (2L, wav(stereo, ch = 2)),
        (3L, wav(mono.take(100))), (4L, Array[Byte](1, 2, 3)))
        .toDF("media_id", "payload"))
        .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).ok == 1 && rows(2L).ok == 1)
    assert(rows(1L).fp == rows(2L).fp, "channel 0 must drive the fingerprint")
    assert(rows(3L).ok == 0 && rows(4L).ok == 0)
  }

  test("banded pairs == brute pairs; dup groups fold, decoys don't") {
    val docs = (0L until 300L).toDF("doc_id")
    val fps = AudioFp.decodeAudioFp(AudioFp.wavFpCorpusFromDocuments(docs))
      .toDF().where($"ok" === 1)
    val banded = graft.dedup.Dedup.hammingNearDupPairs(fps, "media_id", "fp",
      totalBits = 64, maxDist = 3, bands = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val one = fps.select($"media_id", $"fp").as[(Long, Long)].collect()
    val brute = (for {
      (ia, fa) <- one; (ib, fb) <- one
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "the corpus must actually carry dup groups")
    // every brute pair shares the id%97 dup-group key
    assert(brute.forall { case (a, b) => a % 97 == b % 97 })
  }
}
