package graft.multimodal

import graft.SparkSpec

class ZstdSpec extends SparkSpec {

  private def rt(data: Array[Byte], variant: Int,
      blockSize: Int = 1 << 16): Unit = {
    val z = Zstd.compress(data, variant, blockSize)
    assert(Zstd.isZstd(z))
    val back = Zstd.decompress(z)
    assert(back.isDefined, s"decode failed (variant $variant, n=${data.length})")
    assert(java.util.Arrays.equals(back.get, data),
      s"roundtrip mismatch (variant $variant, n=${data.length})")
  }

  private def textBytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  // deterministic pseudo-text without java.util.Random coupling
  private def synth(n: Int, seed: Long): Array[Byte] = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "the", "of", "and", "data", "zstd")
    val sb = new StringBuilder
    var h = seed
    while (sb.length < n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      sb.append(words(math.floorMod(h >>> 33, words.length.toLong).toInt))
      sb.append(if ((h & 7) == 0L) ". " else " ")
    }
    sb.substring(0, n).getBytes("ISO-8859-1")
  }

  test("xxh64 matches the published test vectors") {
    assert(Zstd.xxh64(Array.emptyByteArray, 0, 0) == 0xEF46DB3751D8E999L)
    val abc = "abc".getBytes("UTF-8")
    assert(Zstd.xxh64(abc, 0, 3) == 0x44BC2CF5AD770999L)
    // >32 bytes exercises the 4-lane path
    val long = ("0123456789abcdefghijklmnopqrstuvwxyz" * 3).getBytes("UTF-8")
    assert(Zstd.xxh64(long, 0, long.length) ==
      Zstd.xxh64(long.clone(), 0, long.length)) // pure
  }

  test("roundtrip: every variant over text shapes and sizes") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      textBytes("a"),
      textBytes("hello zstd world"),
      textBytes("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // RLE literals
      textBytes("abcabcabcabcabcabcabcabcabcabcabcabc"), // one long match
      synth(300, 1L),
      synth(5000, 2L),
      synth(70000, 3L), // > one block
      textBytes("naïve — ünïcode ≠ ascii, emoji: éüß" * 40), // bytes >= 128
      (0 until 1000).map(i => (i % 251).toByte).toArray // high-entropy bytes
    )
    for (variant <- Seq(Zstd.VariantAuto, Zstd.VariantRawBlocks,
        Zstd.VariantPredefined, Zstd.VariantFseWeights); data <- cases)
      rt(data, variant)
  }

  test("multi-block frames: repeat mode, treeless reuse, block boundaries") {
    // same alphabet across blocks -> block 2+ reuses tables (Repeat)
    // and the huffman tree (treeless)
    rt(synth(200000, 4L), Zstd.VariantAuto, blockSize = 1 << 14)
    rt(synth(200000, 5L), Zstd.VariantFseWeights, blockSize = 1 << 14)
    rt(synth(200000, 6L), Zstd.VariantPredefined, blockSize = 1 << 14)
    // exact block-boundary sizes
    rt(synth(1 << 16, 7L), Zstd.VariantAuto)
    rt(synth((1 << 16) + 1, 8L), Zstd.VariantAuto)
    rt(synth((1 << 14) * 3, 9L), Zstd.VariantAuto, blockSize = 1 << 14)
  }

  test("repcodes: revisited offsets roundtrip (incl. the litLen==0 twist)") {
    // period-7 tiling forces the same offset repeatedly; interleaved
    // runs revisit two offsets so the history rotates
    val a = ("abcdefg" * 400).getBytes("ISO-8859-1")
    rt(a, Zstd.VariantAuto)
    val b = (("abcdefg" * 40) + ("0123456789ab" * 40) + ("abcdefg" * 40) +
      ("0123456789ab" * 40)).getBytes("ISO-8859-1")
    rt(b, Zstd.VariantAuto)
    rt(b, Zstd.VariantPredefined)
  }

  test("multi-frame concatenation and skippable frames decode; trailing garbage rejects") {
    val a = synth(500, 10L)
    val b = synth(700, 11L)
    val za = Zstd.compress(a, Zstd.VariantAuto)
    val zb = Zstd.compress(b, Zstd.VariantPredefined)
    assert(java.util.Arrays.equals(Zstd.decompress(za ++ zb).get, a ++ b))
    // skippable frame: magic 0x184D2A5x LE + LE32 size + payload
    val skip = Array[Byte](0x5a, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 9, 9, 9)
    assert(java.util.Arrays.equals(Zstd.decompress(skip ++ za).get, a))
    assert(java.util.Arrays.equals(Zstd.decompress(za ++ skip).get, a))
    assert(Zstd.decompress(za ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(Zstd.decompress(za.dropRight(1)).isEmpty) // truncated checksum
  }

  test("corruption anywhere in the frame rejects, never garbage bytes") {
    val data = synth(4000, 12L)
    for (variant <- Seq(Zstd.VariantAuto, Zstd.VariantFseWeights)) {
      val z = Zstd.compress(data, variant)
      // every single-byte flip must fail or (never) decode to the
      // original — the checksum covers all content-bearing bytes
      var i = 0
      while (i < z.length) {
        val c = z.clone()
        c(i) = (c(i) ^ 0x2d).toByte
        Zstd.decompress(c) match {
          case Some(out) =>
            assert(!java.util.Arrays.equals(out, data) ||
              java.util.Arrays.equals(c, z),
              s"flip at $i decoded to the original silently")
          // a flip may legally decode to DIFFERENT bytes only if it
          // also fixed up the checksum — with one flipped byte that
          // cannot happen, so any Some must differ from the original
          case None => ()
        }
        i += 37 // sampled positions keep the sweep fast
      }
      // truncations at every sampled prefix reject
      i = 4
      while (i < z.length - 1) {
        assert(Zstd.decompress(z.take(i)).isEmpty, s"truncation at $i decoded")
        i += 41
      }
    }
  }

  test("zip-bomb guard: output past maxBytes rejects, never truncates") {
    val data = ("x" * 100000).getBytes("ISO-8859-1")
    val z = Zstd.compress(data, Zstd.VariantAuto)
    assert(z.length < data.length / 10) // it really compresses
    assert(Zstd.decompress(z, maxBytes = 50000).isEmpty)
    assert(Zstd.decompress(z, maxBytes = 100000).isDefined)
  }

  test("non-zstd payloads and dictionary frames reject cleanly") {
    assert(Zstd.decompress(null).isEmpty)
    assert(Zstd.decompress(Array.emptyByteArray).isEmpty)
    assert(Zstd.decompress("not zstd at all".getBytes("UTF-8")).isEmpty)
    assert(Zstd.decompress(Multimodal.gzipBytes("gzip, not zstd")).isEmpty)
    // a frame claiming a dictionary: descriptor dict-flag=1, dict id 7
    val z = Zstd.compress(textBytes("plain"), Zstd.VariantRawBlocks)
    val withDict = z.clone()
    withDict(4) = (withDict(4) | 0x01).toByte // dict flag
    assert(Zstd.decompress(withDict).isEmpty)
  }

  test("spark corpus: variants decode through the gate shape, corrupt ids reject") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val media = Zstd.zstdCorpusFromDocuments(docs)
    val rows = Zstd.decodeZstdText(media).toDF()
      .join(docs.select(col("doc_id"), col("text").as("expect")),
        col("media_id") === col("doc_id"))
      .select("media_id", "ok", "text", "expect").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0)
        assert(r.getInt(1) == 0, s"corrupted id $id decoded")
      else {
        assert(r.getInt(1) == 1, s"id $id failed to decode")
        assert(r.getString(2) == Option(r.getString(3)).getOrElse(""),
          s"id $id text mismatch")
      }
    }
  }
}
