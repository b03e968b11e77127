package graft.multimodal

import graft.SparkSpec

class ZipSpec extends SparkSpec {

  test("parseZip reads archives produced by the JDK's ZipOutputStream (interop)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    val members = Seq(
      ("a/first.txt", "hello zip world", true),
      ("b/second.json", """{"k": 1, "v": "two"}""", true),
      ("stored.bin", "uncompressed bytes here", false))
    for ((name, text, deflate) <- members) {
      val e = new java.util.zip.ZipEntry(name)
      val data = text.getBytes("UTF-8")
      if (!deflate) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length.toLong)
        val c = new java.util.zip.CRC32; c.update(data)
        e.setCrc(c.getValue)
      }
      zo.putNextEntry(e); zo.write(data); zo.closeEntry()
    }
    zo.close()
    val rows = Containers.parseZip(1L, bos.toByteArray)
    assert(rows.length == 3)
    for (((name, text, deflate), r) <- members.zip(rows)) {
      assert(r.ok == 1 && r.crc_ok == 1, s"$name -> $r")
      assert(r.name == name && r.text == text)
      assert(r.method == (if (deflate) 8 else 0))
      assert(r.n_bytes == text.getBytes("UTF-8").length.toLong)
    }
  }

  test("the JDK's ZipInputStream reads archives produced by zipBytes (interop)") {
    val z = Containers.zipBytes(Seq(
      ("x.txt", "deflated payload text".getBytes("UTF-8"), true),
      ("y.txt", "stored payload".getBytes("UTF-8"), false)))
    val zi = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(z))
    val got = Iterator.continually(zi.getNextEntry).takeWhile(_ != null).map { e =>
      (e.getName, new String(zi.readAllBytes(), "UTF-8"))
    }.toSeq
    assert(got == Seq(("x.txt", "deflated payload text"),
      ("y.txt", "stored payload")))
  }

  test("flipped directory CRC: ok=0, crc_ok=0, name and method kept") {
    val z = Containers.zipBytes(Seq(
      ("keep.txt", "fine".getBytes("UTF-8"), false),
      ("broken.txt", "corrupted in flight".getBytes("UTF-8"), true)))
    // flip entry 1's directory CRC (entry 1 directory record follows
    // entry 0's: 46 + nlen each, no extra/comment in zipBytes output)
    var p = z.length - 22
    val cdOff = ((z(p + 16) & 0xff) | ((z(p + 17) & 0xff) << 8) |
      ((z(p + 18) & 0xff) << 16) | ((z(p + 19) & 0xff) << 24))
    val e1 = cdOff + 46 + "keep.txt".length
    z(e1 + 16) = (z(e1 + 16) ^ 0x11).toByte
    val rows = Containers.parseZip(2L, z)
    assert(rows(0).ok == 1 && rows(0).text == "fine")
    assert(rows(1).ok == 0 && rows(1).crc_ok == 0 &&
      rows(1).name == "broken.txt" && rows(1).method == 8 && rows(1).text == "")
  }

  test("structural refusals: no EOCD, bad local sig, unsupported method, bomb") {
    val z = Containers.zipBytes(Seq(("a.txt", "x".getBytes, false)))
    // no EOCD
    val noEocd = z.take(z.length - 22)
    assert(Containers.parseZip(3L, noEocd) ==
      Seq(Containers.ZipMember(3L, 0, 0, "", 0, 0L, 0, "")))
    // bad local header signature: refusal keeps name, crc_ok=1 (no
    // extraction happened — corruption vs structure stays separable)
    val badLocal = z.clone(); badLocal(0) = 0x51
    val r = Containers.parseZip(3L, badLocal)
    assert(r.length == 1 && r(0).ok == 0 && r(0).name == "a.txt" &&
      r(0).crc_ok == 1)
    // unsupported method: flip the directory's method field to 99
    val badMethod = z.clone()
    val cdOff = ((z(z.length - 22 + 16) & 0xff) |
      ((z(z.length - 22 + 17) & 0xff) << 8) |
      ((z(z.length - 22 + 18) & 0xff) << 16) |
      ((z(z.length - 22 + 19) & 0xff) << 24))
    badMethod(cdOff + 10) = 99
    val rm = Containers.parseZip(3L, badMethod)
    assert(rm.length == 1 && rm(0).ok == 0 && rm(0).method == 99)
    // bomb guard: declared uncompressed size past maxBytes refuses
    // BEFORE allocation
    val big = Containers.zipBytes(Seq(
      ("big.txt", Array.fill[Byte](4096)(7), true)))
    val rb = Containers.parseZip(3L, big, maxBytes = 100)
    assert(rb.length == 1 && rb(0).ok == 0)
  }

  test("maxEntries cap surfaces the __truncated__ marker with uncovered count") {
    val z = Containers.zipBytes((0 until 5).map(i =>
      (s"m$i.txt", s"body $i".getBytes("UTF-8"), i % 2 == 0)))
    val rows = Containers.parseZip(4L, z, maxEntries = 3)
    assert(rows.length == 4)
    assert(rows.take(3).forall(_.ok == 1))
    assert(rows(3).name == "__truncated__" && rows(3).n_bytes == 2L)
  }

  test("empty member bodies extract on both methods") {
    val z = Containers.zipBytes(Seq(
      ("empty.deflated", Array.emptyByteArray, true),
      ("empty.stored", Array.emptyByteArray, false)))
    val rows = Containers.parseZip(5L, z)
    assert(rows.forall(r => r.ok == 1 && r.n_bytes == 0L && r.text == ""))
  }

  test("batch path: every corpus arm lands its closed-form rows") {
    import spark.implicits._
    val ids = (0L until 100L).toDF("doc_id")
      .withColumn("text", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("document body "),
        org.apache.spark.sql.functions.col("doc_id")))
    val out = Containers.decodeZip(Containers.zipCorpusFromDocuments(ids))
      .collect().groupBy(_.media_id)
    for (id <- 0L until 100L) {
      val rows = out(id).sortBy(_.ent_index)
      if (id % 7 == 2) {
        assert(rows.length == 1 && rows(0).ok == 0 && rows(0).name == "")
      } else {
        assert(rows.length == 2)
        assert(rows(0).ok == 1 && rows(0).text == s"document body $id" &&
          rows(0).method == (if (id % 2 == 0) 8 else 0))
        if (id % 5 == 3)
          assert(rows(1).ok == 0 && rows(1).crc_ok == 0 &&
            rows(1).name == s"meta/$id.json")
        else
          assert(rows(1).ok == 1 && rows(1).text == s"""{"id":$id}""")
      }
    }
  }
}
