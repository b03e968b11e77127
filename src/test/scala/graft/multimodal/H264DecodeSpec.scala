package graft.multimodal

import graft.SparkSpec

class H264DecodeSpec extends SparkSpec {
  import spark.implicits._

  test("entropy tables are structurally sound: prefix-free codes, CBP map a permutation") {
    // prefix-freeness within each coeff_token class (and chroma DC):
    // a code that is a prefix of another would make decode ambiguous
    def codes(t: Array[Array[(Int, Int)]]): Seq[(Int, Int)] =
      t.toSeq.flatMap(_.toSeq)
    def assertPrefixFree(name: String, cs: Seq[(Int, Int)]): Unit =
      for {
        (l1, b1) <- cs
        (l2, b2) <- cs
        if l1 < l2
      } assert((b2 >> (l2 - l1)) != b1,
        s"$name: ${b1.toBinaryString}/$l1 is a prefix of ${b2.toBinaryString}/$l2")
    H264Decode.CoeffTokenVlc.zipWithIndex.foreach { case (cls, i) =>
      assertPrefixFree(s"coeff_token class $i", codes(cls))
    }
    assertPrefixFree("coeff_token chromaDC", codes(H264Decode.CoeffTokenChromaDc))
    H264Decode.TotalZerosVlc.zipWithIndex.foreach { case (row, tc) =>
      assertPrefixFree(s"total_zeros tc=${tc + 1}", row.toSeq)
    }
    H264Decode.TotalZerosChromaDcVlc.zipWithIndex.foreach { case (row, tc) =>
      assertPrefixFree(s"total_zeros chromaDC tc=${tc + 1}", row.toSeq)
    }
    H264Decode.RunBeforeVlc.zipWithIndex.foreach { case (row, zl) =>
      assertPrefixFree(s"run_before zl=${zl + 1}", row.toSeq)
    }
    assert(H264Decode.CbpIntra.sorted.toSeq == (0 until 48),
      "the intra CBP mapping must be a permutation of 0..47")
  }

  test("CAVLC level coding round-trips across both escape regimes, all nC classes") {
    for (nC <- Seq(0, 1, 2, 3, 4, 7, 8, 12);
         level <- (-300 to 300).filter(l =>
           math.abs(l) <= 2 || math.abs(l) % 7 == 0)) {
      H264Decode.roundTripDcOnly(nC, level) match {
        case Some((ls, tc)) =>
          if (level == 0) assert(tc == 0, s"nC=$nC level=0 -> tc=$tc")
          else {
            assert(tc == 1 && ls(0) == level,
              s"nC=$nC level=$level decoded ${ls(0)} (tc=$tc)")
            assert(ls.drop(1).forall(_ == 0))
          }
        case None => fail(s"nC=$nC level=$level failed to decode")
      }
    }
  }

  test("encode -> decode round-trips the q140 pixel law exactly; chroma stays flat") {
    for (id <- Seq(0L, 3L, 7L, 10L, 23L)) {
      def law(f: Int)(x: Int, y: Int): Int =
        ((((id % 10) * 73 + f * 29 + (x / 8) * 37 + (y / 8) * 91) % 17) * 15).toInt
      val nal = H264Decode.encodeIdrGray(4, 4, law(0))
      val sps = H264Decode.parseSpsDec(H264.spsBytes(66, 30, 4, 4))
        .toOption.get
      val pps = H264Decode.parsePps(H264Decode.ppsBytes()).toOption.get
      val fr = H264Decode.decodeIdr(sps, pps, nal) match {
        case Right(f) => f
        case Left(t) => fail(s"id $id: decode refused: $t")
      }
      assert(fr.width == 64 && fr.height == 64)
      for (y <- 0 until 64; x <- 0 until 64)
        assert(fr.luma(y * 64 + x) == law(0)(x, y),
          s"id $id pixel ($x,$y): ${fr.luma(y * 64 + x)} != ${law(0)(x, y)}")
      assert(fr.cb.forall(_ == 128) && fr.cr.forall(_ == 128),
        "gray content must decode to flat 128 chroma")
    }
  }

  test("cross-codec: H.264 frames hash IDENTICALLY to the MJPEG frames of the same law") {
    val docs = Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("doc_id")
    val avc = H264Decode.decodeAvcFramePHash(
        H264Decode.avcClipCorpusFromDocuments(docs)).collect()
      .filter(_.ok == 1).map(r => (r.media_id, r.frame_idx) -> r.phash).toMap
    val mjpeg = Multimodal.decodeMp4FramePHash(
        Multimodal.mjpegVideoCorpusFromDocuments(docs)).collect()
      .filter(_.ok == 1).map(r => (r.media_id, r.frame_idx) -> r.phash).toMap
    assert(avc.nonEmpty)
    // every H.264 frame that decodes has an MJPEG twin with the SAME
    // hash (the pixel planes are identical by construction)
    avc.foreach { case (k, h) =>
      assert(mjpeg.get(k).contains(h),
        s"frame $k: avc hash $h vs mjpeg ${mjpeg.get(k)}")
    }
    // the id%6==4 corruption plant surfaces as frame_decode on frame 1
    val bad = H264Decode.decodeAvcFramePHash(
        H264Decode.avcClipCorpusFromDocuments(Seq(4L).toDF("doc_id")))
      .collect().sortBy(_.frame_idx)
    assert(bad(1).ok == 0 && bad(1).err == "frame_decode", bad.mkString(","))
    assert(bad.count(_.ok == 1) == bad.length - 1)
  }

  test("refusals: CABAC, P-slice, I_16x16, deblocking-on, non-IDR all tag loudly") {
    val sps = H264Decode.parseSpsDec(H264.spsBytes(66, 30, 4, 4)).toOption.get
    val goodPps = H264Decode.parsePps(H264Decode.ppsBytes()).toOption.get
    // CABAC pps refuses at parse
    val cabac = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(0); w.bit(1) // entropy_coding_mode = CABAC
      w.bit(0); w.ue(0); w.ue(0); w.ue(0); w.bit(0); w.bits(0L, 2)
      w.se(-10); w.se(0); w.se(0); w.bit(1); w.bit(0); w.bit(0)
      w.rbspTrailing()
      Array[Byte](0x68) ++ H264.addEmulation(w.toRbsp)
    }
    assert(H264Decode.parsePps(cabac) == Left("unsupported_pps"))
    // P slice refuses not_intra
    def slice(sliceType: Int, mbType: Int = 0,
        disableDeblock: Int = 1): Array[Byte] = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(sliceType.toLong); w.ue(0)
      w.bits(0L, 4); w.ue(0); w.bits(0L, 4)
      w.bit(0); w.bit(0)
      w.se(0); w.ue(disableDeblock.toLong)
      w.ue(mbType.toLong)
      w.rbspTrailing()
      Array[Byte](0x65) ++ H264.addEmulation(w.toRbsp)
    }
    assert(H264Decode.decodeIdr(sps, goodPps, slice(5)) == Left("not_intra"))
    // I_16x16 mb_type refuses unsupported_mb (bounded scope, tagged)
    assert(H264Decode.decodeIdr(sps, goodPps, slice(7, mbType = 1)) ==
      Left("unsupported_mb"))
    // a stream that needs the in-loop filter refuses rather than
    // render unfiltered pixels
    assert(H264Decode.decodeIdr(sps, goodPps, slice(7, disableDeblock = 0)) ==
      Left("unsupported_deblock"))
    // a non-IDR NAL is not this decoder's job
    val nonIdr = slice(7); nonIdr(0) = 0x61 // nal type 1
    assert(H264Decode.decodeIdr(sps, goodPps, nonIdr) == Left("bad_stream"))
  }

  test("batched decode matches single-payload decode") {
    val docs = Seq(0L, 4L, 7L, 11L).toDF("doc_id")
    val media = H264Decode.avcClipCorpusFromDocuments(docs)
    val batched = H264Decode.decodeAvcFramePHash(media).collect()
      .map(r => (r.media_id, r.frame_idx) -> r).toMap
    media.collect().foreach { row =>
      val id = row.getLong(0)
      val p = row.getAs[Array[Byte]](1)
      val cfg = H264Decode.avcConfig(p).toOption.get
      Multimodal.extractMp4FramesTagged(p).toOption.get.foreach {
        case (fi, bytes) =>
          val one = H264Decode.decodeSample(cfg._1, cfg._2, bytes, cfg._3)
          val b = batched((id, fi))
          one match {
            case Right(fr) =>
              assert(b.ok == 1 &&
                b.phash == Multimodal.pHash64(fr.luma, fr.width, fr.height))
            case Left(_) => assert(b.ok == 0 && b.err == "frame_decode")
          }
      }
    }
  }
}
