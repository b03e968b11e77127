package graft.multimodal

import graft.SparkSpec

class ExifSpec extends SparkSpec {

  private def jpegWith(o: Int, dt: String, big: Boolean): Array[Byte] =
    Exif.withApp1(Jpeg.dcOnlyBytes(16, 16, 1, (bx, by, _) => (bx + by) * 10),
      Exif.app1Bytes(o, dt, big))

  test("both byte orders parse orientation + datetime + ExifIFD indirection") {
    for (big <- Seq(false, true)) {
      val r = Exif.parseExif(1L, jpegWith(6, "2024:03:05 12:30:00", big))
      assert(r.ok == 1 && r.byte_order == (if (big) "MM" else "II"))
      assert(r.orientation == 6 && r.datetime == "2024:03:05 12:30:00")
      // DateTimeOriginal rides the 0x8769 pointer, not IFD0
      assert(r.datetime_original == "2023:01:01 00:30:00")
      assert(r.n_entries == 3)
    }
    val custom = Exif.withApp1(
      Jpeg.dcOnlyBytes(16, 16, 1, (_, _, _) => 7),
      Exif.app1Bytes(1, "2024:01:02 03:00:00", big = true,
        dtOriginal = "2019:12:31 23:59:58"))
    assert(Exif.parseExif(2L, custom).datetime_original ==
      "2019:12:31 23:59:58")
  }

  test("refusal families: not_jpeg, no_exif, bad_tiff, truncated, bad sub-IFD") {
    assert(Exif.parseExif(1L, "nope".getBytes).err == "not_jpeg")
    assert(Exif.parseExif(1L,
      Jpeg.dcOnlyBytes(16, 16, 1, (_, _, _) => 7)).err == "no_exif")
    val base = Jpeg.dcOnlyBytes(16, 16, 1, (_, _, _) => 7)
    assert(Exif.parseExif(1L, Exif.withApp1(base,
      Exif.app1Bytes(1, "x", big = false, breakTiffMagic = true)))
      .err == "bad_tiff")
    assert(Exif.parseExif(1L, Exif.withApp1(base,
      Exif.app1Bytes(1, "x", big = false, truncateIfd = true)))
      .err == "truncated")
    // an ExifIFD pointer past the segment refuses, never reads wild
    assert(Exif.parseExif(1L, Exif.withApp1(base,
      Exif.app1Bytes(1, "x", big = false, badSubIfd = true)))
      .err == "truncated")
  }

  test("orientation geometry pinned by hand vectors from the EXIF definitions") {
    // display = [[1,2,3],[4,5,6]] (3 wide, 2 tall)
    val disp = Array(1, 2, 3, 4, 5, 6)
    // o=2 (flip-H): stored = [[3,2,1],[6,5,4]]
    val (w2, h2, p2) = Exif.normalizeOrientation(Array(3, 2, 1, 6, 5, 4), 3, 2, 2)
    assert(w2 == 3 && h2 == 2 && (p2 === disp))
    // o=3 (rot180): stored = [[6,5,4],[3,2,1]]
    assert(Exif.normalizeOrientation(Array(6, 5, 4, 3, 2, 1), 3, 2, 3)._3
      === disp)
    // o=6 (rotate 90 CW to display): stored = display rotated 90 CCW
    // = [[3,6],[2,5],[1,4]] (2 wide, 3 tall)
    val (w6, h6, p6) = Exif.normalizeOrientation(
      Array(3, 6, 2, 5, 1, 4), 2, 3, 6)
    assert(w6 == 3 && h6 == 2 && (p6 === disp))
    // o=8 (rotate 270 CW to display): stored = display rotated 90 CW
    // = [[4,1],[5,2],[6,3]]
    val (w8, h8, p8) = Exif.normalizeOrientation(
      Array(4, 1, 5, 2, 6, 3), 2, 3, 8)
    assert(w8 == 3 && h8 == 2 && (p8 === disp))
    // o=5 (transpose): stored = [[1,4],[2,5],[3,6]]
    assert(Exif.normalizeOrientation(Array(1, 4, 2, 5, 3, 6), 2, 3, 5)._3
      === disp)
    // unknown orientation values pass through upright
    assert(Exif.normalizeOrientation(disp, 3, 2, 0)._3 === disp)
    assert(Exif.normalizeOrientation(disp, 3, 2, 9)._3 === disp)
  }

  test("all 8 orientations of one base hash identically through the batch path") {
    import spark.implicits._
    val ids = (0L until 32L).toDF("doc_id") // 4 groups x 8 orientations
    val out = Exif.decodeOrientedPHash(
      Exif.orientedCorpusFromDocuments(ids)).collect()
    assert(out.forall(_.ok == 1))
    val byGroup = out.groupBy(_.media_id / 8)
    for ((g, rows) <- byGroup) {
      assert(rows.length == 8)
      assert(rows.map(_.phash).distinct.length == 1,
        s"group $g: orientations must normalize to one hash")
    }
    // distinct groups land distinct hashes (different base content)
    assert(byGroup.values.map(_.head.phash).toSeq.distinct.size == 4)
  }
}
