package graft.multimodal

import graft.SparkSpec

class PdfSpec extends SparkSpec {

  private val lines = Seq("hello (paren) \\ world", "second page here")
  private val wireVariants = Seq(
    ("plain", Pdf.PdfOpts()),
    ("flate", Pdf.PdfOpts(flate = true)),
    ("xref-stream", Pdf.PdfOpts(flate = true, xrefStream = true)),
    ("objstm", Pdf.PdfOpts(flate = true, xrefStream = true, objStm = true)),
    ("predictor", Pdf.PdfOpts(flate = true, xrefStream = true, predictor = true)),
    ("tj-split", Pdf.PdfOpts(tjSplit = true)),
    ("hex", Pdf.PdfOpts(hexStrings = true)))

  test("every wire shape extracts the identical text (storage proven invisible)") {
    for ((name, o) <- wireVariants) {
      val b = Pdf.pdfBytes(lines, o)
      val info = Pdf.parseInfo(1L, b)
      assert(info.ok == 1 && info.n_pages == 2 && info.encrypted == 0,
        s"$name: $info")
      assert(info.version == (if (o.xrefStream) "1.5" else "1.4"))
      val texts = Pdf.pageTexts(1L, b)
      assert(texts.map(_.text) == lines.map(_ + "\n"), s"$name text mismatch")
      assert(texts.forall(_.ok == 1))
    }
    // /Size follows the object layout
    assert(Pdf.parseInfo(1L, Pdf.pdfBytes(lines, Pdf.PdfOpts())).n_objects == 8)
    assert(Pdf.parseInfo(1L, Pdf.pdfBytes(lines,
      Pdf.PdfOpts(xrefStream = true))).n_objects == 9)
    assert(Pdf.parseInfo(1L, Pdf.pdfBytes(lines,
      Pdf.PdfOpts(xrefStream = true, objStm = true))).n_objects == 10)
  }

  test("TJ-split round-trips multi-byte UTF-8 (split lands on a codepoint boundary)") {
    // an odd-length line whose midpoint falls INSIDE the 3-byte € —
    // a raw byte split would round-trip each half as U+FFFD
    val tricky = Seq("a€b", "naïve café — über €42")
    val texts = Pdf.pageTexts(1L, Pdf.pdfBytes(tricky, Pdf.PdfOpts(tjSplit = true)))
    assert(texts.map(_.text) == tricky.map(_ + "\n"))
    assert(texts.forall(_.ok == 1))
  }

  test("adversarial nesting depth refuses 'bad_object' instead of overflowing") {
    // a content page whose object graph is fine, but one object is a
    // 5000-deep array: the lexer must refuse, not StackOverflow
    val deep = ("[" * 5000) + ("]" * 5000)
    val body = s"1 0 obj\n$deep\nendobj\n".getBytes("US-ASCII")
    val lex = new Pdf.Lexer(body, "1 0 obj\n".length, body.length)
    val err = intercept[RuntimeException] { lex.value(allowRef = true) }
    assert(err.getClass.getSimpleName == "Bad")
    val deepDict = "<< /A " * 5000
    val b2 = deepDict.getBytes("US-ASCII")
    val err2 = intercept[RuntimeException] {
      new Pdf.Lexer(b2, 0, b2.length).value(allowRef = true) }
    assert(err2.getClass.getSimpleName == "Bad")
  }

  test("font encodings decode real non-UTF8 show bytes back to the text") {
    // é/—/ï force multi-byte divergence between UTF-8 and every
    // single-byte scheme; mode 5 shows UTF-16BE
    val fLines = Seq("a café — naïve line", "second é page")
    for (mode <- 1 to 5;
         o <- Seq(Pdf.PdfOpts(fontMode = mode),
           Pdf.PdfOpts(fontMode = mode, hexStrings = true),
           Pdf.PdfOpts(fontMode = mode, tjSplit = true),
           Pdf.PdfOpts(fontMode = mode, flate = true, xrefStream = true),
           Pdf.PdfOpts(fontMode = mode, flate = true, xrefStream = true,
             objStm = true))) {
      val texts = Pdf.pageTexts(1L, Pdf.pdfBytes(fLines, o))
      assert(texts.map(_.text) == fLines.map(_ + "\n"), s"mode=$mode $o")
      assert(texts.forall(_.ok == 1), s"mode=$mode $o")
    }
    // raw decode (mode 0) of cp1252 bytes WOULD be mojibake — the
    // encoding is load-bearing, not decorative
    assert("café".getBytes("windows-1252").toSeq !=
      "café".getBytes("UTF-8").toSeq)
  }

  test("CID font without ToUnicode refuses 'unsupported_font', classification intact") {
    val b = Pdf.pdfBytes(Seq("alpha page", "beta page"),
      Pdf.PdfOpts(fontMode = 6))
    val texts = Pdf.pageTexts(1L, b)
    assert(texts.length == 2)
    assert(texts.forall(t => t.ok == 0 && t.err == "unsupported_font" &&
      t.text == ""))
    assert(Pdf.parseInfo(1L, b).ok == 1, "headers still classify")
  }

  test("/Differences: uniXXXX names resolve; unknown glyph names refuse") {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = Pdf.pdfBytes(Seq("one café line"), Pdf.PdfOpts(fontMode = 3))
    assert(Pdf.pageTexts(1L, base).map(_.text) == Seq("one café line\n"))
    // same-length in-place swaps keep every xref offset valid
    val viaUni = new String(base, iso).replace("/eacute", "/uni00E9")
    assert(Pdf.pageTexts(1L, viaUni.getBytes(iso)).map(_.text) ==
      Seq("one café line\n"))
    val unknown = new String(base, iso).replace("/eacute", "/zzcute")
    val t = Pdf.pageTexts(1L, unknown.getBytes(iso))
    assert(t.head.ok == 0 && t.head.err == "unsupported_font")
  }

  test("an unmapped CMap code refuses the page instead of guessing") {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val b = Pdf.pdfBytes(Seq("AB|"), Pdf.PdfOpts(fontMode = 4))
    // shrink the ASCII identity bfrange in place: '|' (0x7C) unmapped
    val cut = new String(b, iso).replace("<20> <7E> <0020>", "<20> <43> <0020>")
    assert(cut != new String(b, iso), "surgery must hit the CMap")
    val t = Pdf.pageTexts(1L, cut.getBytes(iso))
    assert(t.head.ok == 0 && t.head.err == "unsupported_font")
  }

  test("string escapes pinned by hand vectors (octal, continuation, nesting, hex)") {
    def pdfWith(content: String): Array[Byte] = {
      // splice hand-written show bytes over a fixed-width placeholder
      // inside a real one-page document (same /Length, same offsets)
      val b = Pdf.pdfBytes(Seq("XXXXXXXX"), Pdf.PdfOpts())
      val marker = "(XXXXXXXX) Tj"
      val raw = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val at = raw.indexOf(marker)
      val padded = content + " " * (marker.length - content.length)
      assert(at > 0 && padded.length == marker.length,
        s"hand content must fit ${marker.length} bytes: '$content'")
      val out = b.clone()
      padded.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        .zipWithIndex.foreach { case (c, i) => out(at + i) = c }
      out
    }
    // octal escape \101 = 'A'
    assert(Pdf.pageTexts(1L, pdfWith("(\\101) Tj")).head.text == "A\n")
    // nested balanced parens survive unescaped
    assert(Pdf.pageTexts(1L, pdfWith("((n)) Tj")).head.text == "(n)\n")
    // hex pair + odd trailing digit implies a zero nibble: <41 5> = A P
    assert(Pdf.pageTexts(1L, pdfWith("<415> Tj")).head.text == "AP\n")
    // backslash-newline is a line continuation (contributes nothing)
    assert(Pdf.pageTexts(1L, pdfWith("(a\\\nb) Tj")).head.text == "ab\n")
  }

  test("incremental update: the newest xref's entry wins across the /Prev chain") {
    val base = Pdf.pdfBytes(lines, Pdf.PdfOpts())
    // locate the original startxref offset
    val raw = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = raw.lastIndexOf("startxref")
    val oldXref = raw.substring(sx + 9).trim.takeWhile(_.isDigit)
    // append a REPLACEMENT for object 6 (page 1's content stream) and a
    // new xref table that covers only it, chaining /Prev to the old one
    val newContent = "BT (revised page) Tj ET\n"
    val upd = new java.io.ByteArrayOutputStream()
    upd.write(base, 0, base.length)
    val obj6At = upd.size()
    upd.write((s"6 0 obj\n<< /Length ${newContent.length} >>\nstream\n" +
      newContent + "\nendstream\nendobj\n").getBytes("UTF-8"))
    val xrefAt = upd.size()
    upd.write((f"xref%n0 1%n0000000000 65535 f %n6 1%n$obj6At%010d 00000 n %n" +
      s"trailer\n<< /Size 8 /Root 1 0 R /Prev $oldXref >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n").getBytes("UTF-8"))
    val texts = Pdf.pageTexts(1L, upd.toByteArray)
    assert(texts.map(_.text) == Seq(lines.head + "\n", "revised page\n"),
      s"got ${texts.map(_.text)}")
  }

  test("refusal families are tagged; page errors keep siblings alive") {
    assert(Pdf.parseInfo(1L, Pdf.pdfBytes(lines,
      Pdf.PdfOpts(breakMagic = true))).err == "not_pdf")
    assert(Pdf.parseInfo(1L, Array[Byte](1, 2, 3)).err == "not_pdf")
    assert(Pdf.parseInfo(1L, Pdf.pdfBytes(lines,
      Pdf.PdfOpts(truncateTail = true))).err == "truncated")
    // a garbage startxref offset is a bad xref, not a crash
    val b = Pdf.pdfBytes(lines, Pdf.PdfOpts())
    val raw = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = raw.lastIndexOf("startxref")
    val broken = b.clone()
    broken(sx + 10) = '9'; broken(sx + 11) = '9'
    val r = Pdf.parseInfo(1L, broken)
    assert(r.ok == 0 && (r.err == "bad_xref" || r.err == "truncated"), s"$r")
    // /Encrypt: classified (encrypted=1) but text refuses whole
    val enc = Pdf.pdfBytes(lines, Pdf.PdfOpts(encrypted = true))
    assert(Pdf.parseInfo(1L, enc).encrypted == 1)
    assert(Pdf.pageTexts(1L, enc) ==
      Seq(Pdf.PdfPageText(1L, 0, 0, "", "encrypted")))
    // LZW page refuses alone; its sibling extracts
    val lzw = Pdf.pageTexts(1L, Pdf.pdfBytes(lines, Pdf.PdfOpts(lzwPage = 1)))
    assert(lzw(0).ok == 1 && lzw(0).text == lines.head + "\n")
    assert(lzw(1).ok == 0 && lzw(1).err == "unsupported_filter")
    // corrupt flate data inside a content stream: bad_stream
    val fb = Pdf.pdfBytes(lines, Pdf.PdfOpts(flate = true))
    val fraw = new String(fb, java.nio.charset.StandardCharsets.ISO_8859_1)
    val streamAt = fraw.indexOf("stream\n") + 7
    val fbad = fb.clone()
    fbad(streamAt) = (fbad(streamAt) ^ 0x55).toByte
    val pt = Pdf.pageTexts(1L, fbad)
    assert(pt.exists(p => p.err == "bad_stream"), s"got $pt")
  }

  test("batched decode matches single-payload decode") {
    val s = spark
    import s.implicits._
    val docs = spark.range(0, 80)
      .select(org.apache.spark.sql.functions.col("id").as("doc_id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("text of document "),
          org.apache.spark.sql.functions.col("id")).as("text"))
    val media = Pdf.pdfCorpusFromDocuments(docs)
    val infos = Pdf.decodePdfInfo(media, partitions = 5).collect()
      .map(r => r.media_id -> r).toMap
    val texts = Pdf.decodePdfText(media, partitions = 5).collect()
      .groupBy(_.media_id)
    media.as[(Long, Array[Byte])].collect().foreach { case (id, payload) =>
      assert(infos(id) == Pdf.parseInfo(id, payload))
      assert(texts(id).sortBy(_.page_idx).toSeq == Pdf.pageTexts(id, payload))
    }
  }

  test("crypto primitives match published known-answer vectors") {
    // RC4: key "Key" / plaintext "Plaintext" -> BBF316E8D940AF0AD3
    // (the classic public test vector) — pins the cipher itself, so
    // the handler tests below aren't merely fixture/reader-symmetric
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    assert(hx(Pdf.PdfCrypt.rc4("Key".getBytes("US-ASCII"),
      "Plaintext".getBytes("US-ASCII"))) == "BBF316E8D940AF0AD3")
    assert(hx(Pdf.PdfCrypt.rc4("Wiki".getBytes("US-ASCII"),
      "pedia".getBytes("US-ASCII"))) == "1021BF0420")
    // MD5 RFC 1321 appendix vectors
    assert(hx(Pdf.PdfCrypt.md5(Array.empty)).toLowerCase ==
      "d41d8cd98f00b204e9800998ecf8427e")
    assert(hx(Pdf.PdfCrypt.md5("abc".getBytes("US-ASCII"))).toLowerCase ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("standard security handler: empty-user-password docs extract transparently") {
    val lines = Seq("secret page one", "page two tail")
    for (opts <- Seq(
        Pdf.PdfOpts(realEnc = 1),
        Pdf.PdfOpts(realEnc = 1, flate = true),
        Pdf.PdfOpts(realEnc = 1, xrefStream = true, objStm = true, flate = true),
        Pdf.PdfOpts(realEnc = 1, fontMode = 4), // encrypted ToUnicode CMap
        Pdf.PdfOpts(realEnc = 3),               // AESV2
        Pdf.PdfOpts(realEnc = 3, flate = true, xrefStream = true, objStm = true))) {
      val b = Pdf.pdfBytes(lines, opts)
      val info = Pdf.parseInfo(1L, b)
      assert(info.ok == 1 && info.encrypted == 1 && info.n_pages == 2, s"$opts: $info")
      val t = Pdf.pageTexts(1L, b)
      assert(t.map(_.ok) == Seq(1, 1), s"$opts: $t")
      assert(t(0).text == lines(0) + "\n" && t(1).text == lines(1) + "\n",
        s"$opts: $t")
    }
    // the ciphertext is REAL: the encrypted wire never contains the
    // plaintext show string
    val wire = new String(Pdf.pdfBytes(lines, Pdf.PdfOpts(realEnc = 1)),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!wire.contains("secret page one"))
  }

  test("standard security handler: a real user password refuses loudly") {
    val lines = Seq("locked page")
    val b = Pdf.pdfBytes(lines, Pdf.PdfOpts(realEnc = 2))
    // classification still works (catalog/pages are plain objects)
    val info = Pdf.parseInfo(1L, b)
    assert(info.ok == 1 && info.encrypted == 1, s"$info")
    assert(Pdf.pageTexts(1L, b) ==
      Seq(Pdf.PdfPageText(1L, 0, 0, "", "encrypted")))
    // with the ObjStm form even the catalog is ciphertext: the
    // classification itself refuses rather than walking garbage
    val stm = Pdf.pdfBytes(lines,
      Pdf.PdfOpts(realEnc = 2, xrefStream = true, objStm = true, flate = true))
    val i2 = Pdf.parseInfo(1L, stm)
    assert(i2.ok == 0 && i2.err == "encrypted", s"$i2")
    // a tampered /U (simulates any wrong-key state) refuses too
    val ok1 = Pdf.pdfBytes(lines, Pdf.PdfOpts(realEnc = 1))
    val raw = new String(ok1, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uAt = raw.indexOf("/U <") + 4
    val bad = ok1.clone()
    bad(uAt) = (if (bad(uAt) == 'A') 'B' else 'A').toByte
    assert(Pdf.pageTexts(1L, bad) ==
      Seq(Pdf.PdfPageText(1L, 0, 0, "", "encrypted")))
  }
}
