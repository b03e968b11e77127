package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio near-duplicate fingerprinting — the AUDIO member of the
  * perceptual-dedup family (pHash for images, frame-hash clips for
  * video): a chromaprint-shaped 64-bit fingerprint from the decoded
  * PCM plane, then the exact banded hamming join the image path uses
  * ([[graft.dedup.Dedup.hammingNearDupPairs]]). A re-encoded or
  * slightly-level-shifted copy of a clip fingerprints into the same
  * hamming ball; the banded join keeps the pair search at equi-join
  * scale — never all-pairs.
  *
  * The fingerprint: 17 non-overlapping 64-sample frames of channel
  * data, per frame the power at 4 DFT bins (k = 1/2/4/8) via FROZEN
  * integer trig tables (scale 2^7 — the PhashDct discipline: the same
  * literals are interpolated verbatim into the DuckDB oracle, so both
  * engines compute identical longs; |re| ≤ 64·2^15·2^7 = 2^28, so
  * re²+im² < 2^57 stays exact in a long), then the chromaprint bit
  * rule: bit(f,b) = P(f,b) > P(f−1,b), 16 frame-diffs × 4 bins = 64
  * bits. Payloads too short for 17 frames refuse (ok=0) rather than
  * fingerprinting silence-padding.
  *
  * Reference anchor: the reference treats media as opaque blobs
  * (raw collectors only); this is engine-added crawl-scale surface. */
object AudioFp {

  val Bins: Array[Int] = Array(1, 2, 4, 8)
  val FrameLen = 64
  val NFrames = 17 // 16 frame-to-frame diffs x 4 bins = 64 bits

  /** Frozen integer trig tables (scale 2^7). `math.round` at table
    * BUILD time only — the values are compile-deterministic literals
    * shared with the oracle, never recomputed per row. */
  val CosTab: Array[Array[Long]] = Bins.map(k => Array.tabulate(FrameLen)(i =>
    math.round(math.cos(2.0 * math.Pi * k * i / FrameLen) * 128.0)))
  val SinTab: Array[Array[Long]] = Bins.map(k => Array.tabulate(FrameLen)(i =>
    math.round(-math.sin(2.0 * math.Pi * k * i / FrameLen) * 128.0)))

  /** The 64-bit fingerprint of a mono sample plane; None when fewer
    * than 17 full frames are present. */
  def fingerprint(samples: Array[Short]): Option[Long] = {
    if (samples == null || samples.length < FrameLen * NFrames) return None
    val p = Array.ofDim[Long](NFrames, Bins.length)
    var f = 0
    while (f < NFrames) {
      var b = 0
      while (b < Bins.length) {
        var re = 0L
        var im = 0L
        var i = 0
        while (i < FrameLen) {
          val s = samples(f * FrameLen + i).toLong
          re += s * CosTab(b)(i)
          im += s * SinTab(b)(i)
          i += 1
        }
        p(f)(b) = re * re + im * im
        b += 1
      }
      f += 1
    }
    var fp = 0L
    f = 1
    while (f < NFrames) {
      var b = 0
      while (b < Bins.length) {
        if (p(f)(b) > p(f - 1)(b)) fp |= 1L << ((f - 1) * 4 + b)
        b += 1
      }
      f += 1
    }
    Some(fp)
  }

  final case class AudioFpRow(media_id: Long, ok: Int, fp: Long)

  /** Batched fingerprint decode over a binary media frame (WAV PCM16
    * payloads; multi-channel uses channel 0). */
  def decodeAudioFp(media: DataFrame, partitions: Int = 0): Dataset[AudioFpRow] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .map { case (id, p) =>
        Multimodal.decodeWavSamples(p) match {
          case Some((_, ch, s)) =>
            val mono = if (ch <= 1) s
              else Array.tabulate[Short](s.length / ch)(i => s(i * ch))
            fingerprint(mono) match {
              case Some(fp) => AudioFpRow(id, 1, fp)
              case None => AudioFpRow(id, 0, 0L)
            }
          case None => AudioFpRow(id, 0, 0L)
        }
      }(org.apache.spark.sql.Encoders.product[AudioFpRow])
  }

  /** Deterministic WAV near-dup corpus: content derives from the
    * doc's DUP-GROUP KEY (id%97) so group members share one audio
    * signal, with a tiny per-doc DC level shift (id%3) — the
    * "re-mastered copy" a fingerprint must fold and an exact byte
    * hash cannot; id%41==6 plants a 100-sample payload (too short for
    * 17 frames -> the ok=0 refusal). Sample law (replayed closed-form
    * by the oracle — QUADRATIC in i so the signal is broadband noise,
    * not a constant-step sawtooth whose simple spectrum would collide
    * across keys): s_i = ((i+3+key·131)·(i+11+key·17)·2654435761 mod
    * 65000) − 32500 + (id mod 3). */
  def wavFpCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def fm(m: Long): Long = java.lang.Math.floorMod(id, m)
      val key = fm(97L)
      val n = if (fm(41L) == 6L) 100 else FrameLen * NFrames
      val body = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (((i + 3L + key * 131L) * (i + 11L + key * 17L) *
          2654435761L) % 65000L - 32500L + fm(3L)).toInt
        body(i * 2) = (v & 0xff).toByte
        body(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      (id, Multimodal.wavHeaderBytes(16000, 1, 16, body.length) ++ body)
    }.toDF("media_id", "payload")
  }
}
