package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainersSpec extends SparkSpec {
  import spark.implicits._

  private def warcPair(text: String, badLen: Boolean = false): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n")
      .getBytes("ISO-8859-1") ++ text.getBytes("UTF-8")
    Containers.warcRecordBytes(Seq(
        "WARC-Type" -> "warcinfo",
        "Content-Type" -> "application/warc-fields"),
      "software: graft\r\n".getBytes("UTF-8")) ++
      Containers.warcRecordBytes(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://h.example/x",
        "Content-Type" -> "application/http; msgtype=response"),
        http, declaredLength = if (badLen) Some(http.length + 9L) else None)
  }

  test("warc: generate-parse round trip, http split, multi-record walk") {
    val recs = Containers.parseWarc(7L, warcPair("the body text"))
    assert(recs.map(r => (r.rec_index, r.ok, r.warc_type)) ==
      Seq((0, 1, "warcinfo"), (1, 1, "response")))
    assert(recs(0).body == "software: graft\r\n" && recs(0).http_status == 0)
    assert(recs(1).url == "http://h.example/x")
    assert(recs(1).http_status == 200)
    assert(recs(1).body == "the body text", "http headers must split off the body")
    // non-http payloads keep the whole payload as body
    val plain = Containers.parseWarc(1L, Containers.warcRecordBytes(
      Seq("WARC-Type" -> "resource", "Content-Type" -> "text/plain"),
      "raw".getBytes("UTF-8")))
    assert(plain.head.body == "raw" && plain.head.http_status == 0)
  }

  test("warc: strict error path — parsed prefix survives, ok=0 tail at the bad record") {
    val recs = Containers.parseWarc(2L, warcPair("x", badLen = true))
    assert(recs.map(r => (r.rec_index, r.ok)) == Seq((0, 1), (1, 0)))
    assert(Containers.parseWarc(3L, Array.empty[Byte]).map(_.ok) == Seq(0))
    assert(Containers.parseWarc(4L, null).map(_.ok) == Seq(0))
    assert(Containers.parseWarc(5L, "not a warc at all\r\n\r\n".getBytes("UTF-8"))
      .map(_.ok) == Seq(0))
    // negative / non-numeric / overlong Content-Length all reject
    val man = ("WARC/1.0\r\nContent-Length: 999999\r\n\r\nxx\r\n\r\n").getBytes("ISO-8859-1")
    assert(Containers.parseWarc(6L, man).map(_.ok) == Seq(0))
  }

  test("warc: gzipped container path equals the plain one; bad gzip is container-level ok=0") {
    val plain = Seq((1L, warcPair("zipped body"))).toDF("media_id", "payload")
    val gz = Seq((1L, {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(warcPair("zipped body")); g.close(); out.toByteArray
    })).toDF("media_id", "payload")
    val a = Containers.decodeWarc(plain).collect().toSeq.sortBy(_.rec_index)
    val b = Containers.decodeWarc(gz, gzipped = true).collect().toSeq.sortBy(_.rec_index)
    assert(a == b)
    val bad = Seq((2L, "nope".getBytes("UTF-8"))).toDF("media_id", "payload")
    assert(Containers.decodeWarc(bad, gzipped = true).collect().map(_.ok).toSeq == Seq(0))
  }

  test("warc: zstd and auto codec paths equal the plain walk; bad member is ok=0") {
    val raw = warcPair("zst body")
    val plain = Seq((1L, raw)).toDF("media_id", "payload")
    val zst = Seq((1L, Zstd.compress(raw))).toDF("media_id", "payload")
    val a = Containers.decodeWarc(plain).collect().toSeq.sortBy(_.rec_index)
    val b = Containers.decodeWarc(zst, codec = "zstd").collect().toSeq
      .sortBy(_.rec_index)
    assert(a == b)
    // auto: one gzip member, one zstd member, one plain — one frame each
    val gz = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(raw); g.close(); out.toByteArray
    }
    val mixed = Seq((1L, gz), (2L, Zstd.compress(raw)), (3L, raw))
      .toDF("media_id", "payload")
    val m = Containers.decodeWarc(mixed, codec = "auto").collect()
    assert(m.count(_.ok == 1) == 6) // 2 records × 3 containers
    assert(m.groupBy(_.media_id).view.mapValues(_.length).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    // a zstd member whose checksum is broken is a container-level ok=0
    val broken = Zstd.compress(raw).clone()
    broken(broken.length - 2) = (broken(broken.length - 2) ^ 0x11).toByte
    val badZ = Seq((4L, broken)).toDF("media_id", "payload")
    assert(Containers.decodeWarc(badZ, codec = "zstd").collect()
      .map(_.ok).toSeq == Seq(0))
    // tar shares the codec plumbing (.tar.zst)
    val tar = Containers.tarEntryBytes("docs/z.txt",
      "tar in zstd".getBytes("UTF-8")) ++ new Array[Byte](1024)
    val tz = Seq((5L, Zstd.compress(tar))).toDF("media_id", "payload")
    val te = Containers.decodeTar(tz, codec = "zstd").collect()
    assert(te.map(e => (e.ok, e.name, e.text)).toSeq ==
      Seq((1, "docs/z.txt", "tar in zstd")))
  }

  test("tar: generate-parse round trip, checksum validation, end marker") {
    val bytes = Containers.tarEntryBytes("docs/9.txt", "nine".getBytes("UTF-8")) ++
      Containers.tarEntryBytes("meta/9.txt", "id=9".getBytes("UTF-8")) ++
      new Array[Byte](1024)
    val ents = Containers.parseTar(9L, bytes)
    assert(ents.map(e => (e.ent_index, e.ok, e.name, e.n_bytes, e.text)) == Seq(
      (0, 1, "docs/9.txt", 4L, "nine"), (1, 1, "meta/9.txt", 4L, "id=9")))
    // corrupt the second entry's checksum: entry 0 survives, tail ok=0
    val bad = bytes.clone()
    bad(512 + ((4 + 511) / 512) * 512 + 512 * 0 + 148) =
      (bad(512 + 512 + 148) ^ 0x07).toByte
    val e2 = Containers.parseTar(9L, bad)
    assert(e2.map(e => (e.ent_index, e.ok)) == Seq((0, 1), (1, 0)),
      "a failed checksum must stop the walk, not walk garbage offsets")
    // data running past the buffer rejects
    val trunc = bytes.take(512 + 2)
    assert(Containers.parseTar(1L, trunc).last.ok == 0)
    // an all-zero archive is the bare end marker: empty AND valid
    assert(Containers.parseTar(1L, new Array[Byte](1024)).isEmpty)
  }

  test("record-cap truncation surfaces a __truncated__ marker, never a fully-ingested look") {
    // warc: 2 records, cap 1 -> parsed prefix + ok=0 marker carrying
    // the unconsumed byte count; cap == record count -> clean walk
    val two = warcPair("abc")
    val recs = Containers.parseWarc(9L, two, maxRecords = 1)
    assert(recs.map(r => (r.rec_index, r.ok, r.warc_type)) ==
      Seq((0, 1, "warcinfo"), (1, 0, "__truncated__")))
    assert(recs.last.payload_bytes > 0L,
      "the marker must carry the unconsumed remainder size")
    assert(Containers.parseWarc(9L, two, maxRecords = 2)
      .map(r => (r.ok, r.warc_type)) == Seq((1, "warcinfo"), (1, "response")))
    // tar: same contract; a cap landing exactly on the zero end-marker
    // block is a COMPLETE walk (the remainder is framing, not data)
    val bytes = Containers.tarEntryBytes("docs/1.txt", "one".getBytes("UTF-8")) ++
      Containers.tarEntryBytes("docs/2.txt", "two".getBytes("UTF-8")) ++
      new Array[Byte](1024)
    val ents = Containers.parseTar(3L, bytes, maxEntries = 1)
    assert(ents.map(e => (e.ent_index, e.ok, e.name)) ==
      Seq((0, 1, "docs/1.txt"), (1, 0, "__truncated__")))
    assert(ents.last.n_bytes == 512L + 512L + 1024L)
    assert(Containers.parseTar(3L, bytes, maxEntries = 2).map(_.ok) == Seq(1, 1),
      "cap at the end marker is complete, not truncated")
  }

  test("warcDocs composition: responses -> canonical url + extracted text, curation-ready") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (2L, "ignored — corrupt container"),
      (5L, "delta epsilon")).toDF("doc_id", "text")
    val media = Containers.warcCorpusFromDocuments(docs)
    val out = Containers.warcDocs(media).collect()
    // id 2 is the corrupted container (2 % 4 == 2): its response never
    // parses, so only ids 0 and 5 surface
    assert(out.length == 2)
    val byUrl = out.map(r => r.getAs[String]("url_norm") -> r).toMap
    assert(byUrl.keySet == Set(
      "http://site0.example/doc0.html", "http://site5.example/doc5.html"))
    assert(byUrl("http://site0.example/doc0.html").getAs[String]("text")
      == "alpha beta gamma")
    assert(byUrl("http://site0.example/doc0.html").getAs[String]("source")
      == "site0.example")
    // doc_id is the canonical-url hash: stable and distinct
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 2)
  }

  test("warcDocs: a page's <link rel=canonical> beats the request URL as identity") {
    // two crawls of ONE page under tracking variants, both declaring
    // the same canonical; a third page declares none
    def resp(reqUrl: String, body: String) = Containers.warcRecordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> reqUrl,
      "Content-Type" -> "application/http; msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
        .getBytes("ISO-8859-1"))
    val canonBody =
      "<html><head><link rel=\"canonical\" href=\"HTTP://SITE.example:80/page\">" +
        "</head><body><p>same page</p></body></html>"
    val media = Seq(
      (1L, resp("http://site.example/page?utm_source=a", canonBody)),
      (2L, resp("http://site.example/page?ref=x", canonBody)),
      (3L, resp("http://other.example/solo",
        "<html><body>solo page</body></html>")))
      .toDF("media_id", "payload")
    val out = Containers.warcDocs(media).collect()
    assert(out.length == 3)
    val byUrl = out.groupBy(_.getAs[String]("url_norm"))
    // both canonical-declaring crawls share the normalized canonical
    // (and therefore the doc_id — latest-row-wins folds them upstream)
    assert(byUrl("http://site.example/page").length == 2)
    assert(byUrl("http://site.example/page")
      .map(_.getAs[Long]("doc_id")).distinct.length == 1)
    // the canonical-less page keeps its normalized request URL
    assert(byUrl.contains("http://other.example/solo"))
  }

  test("HTTP payload decoding: chunked / gzip / deflate / zstd decode; br refuses") {
    def resp(hdr: String, payload: Array[Byte]) = Containers.warcRecordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://s.example/p",
      "Content-Type" -> "application/http; msgtype=response"),
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$hdr\r\n")
        .getBytes("ISO-8859-1") ++ payload)
    def gzip(p: Array[Byte]) = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(p); g.close()
      bo.toByteArray
    }
    def zlib(p: Array[Byte], raw: Boolean) = {
      val d = new java.util.zip.Deflater(6, raw)
      d.setInput(p); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    val text = "the quick brown fox jumps over the lazy dog"
    val t = text.getBytes("UTF-8")
    def one(hdr: String, payload: Array[Byte]) =
      Containers.parseWarc(1L, resp(hdr, payload)).head
    // identity: untouched
    assert(one("", t).body == text)
    // chunked: sizes in hex, extension ignored, trailer ignored
    val chunked = ("5;ext=1\r\n" + text.take(5) +
      s"\r\n${java.lang.Integer.toHexString(t.length - 5)}\r\n" +
      text.drop(5) + "\r\n0\r\nX-Trailer: v\r\n\r\n").getBytes("ISO-8859-1")
    val ch = one("Transfer-Encoding: chunked\r\n", chunked)
    assert(ch.body == text && ch.payload_enc == "chunked" && ch.payload_err == "")
    // gzip, zlib deflate, RAW deflate (nonconformant servers), zstd
    for ((hdr, p, enc) <- Seq(
        ("Content-Encoding: gzip\r\n", gzip(t), "gzip"),
        ("Content-Encoding: x-gzip\r\n", gzip(t), "x-gzip"),
        ("Content-Encoding: deflate\r\n", zlib(t, raw = false), "deflate"),
        ("Content-Encoding: deflate\r\n", zlib(t, raw = true), "deflate"),
        ("Content-Encoding: zstd\r\n",
          graft.multimodal.Zstd.compress(t), "zstd"))) {
      val r = one(hdr, p)
      assert(r.body == text && r.payload_enc == enc && r.payload_err == "",
        s"$enc: $r")
    }
    // both layers: chunked transfer over gzip content
    val gz = gzip(t)
    val chGz = (java.lang.Integer.toHexString(gz.length) + "\r\n")
      .getBytes("ISO-8859-1") ++ gz ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    val both = one("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n", chGz)
    assert(both.body == text && both.payload_enc == "chunked+gzip" &&
      both.payload_err == "")
    // br: LOUD refusal, never mojibake; declared coding kept for audit
    val br = one("Content-Encoding: br\r\n", Array[Byte](0x1b, 0x2a, 0x03))
    assert(br.ok == 1 && br.body == "" && br.payload_enc == "br" &&
      br.payload_err == "unsupported_encoding")
    // framing violation: malformed hex size line
    val badCh = one("Transfer-Encoding: chunked\r\n",
      "ZZ\r\nwhatever".getBytes("ISO-8859-1"))
    assert(badCh.payload_err == "bad_chunked" && badCh.body == "")
    // truncated chunk stream (no 0-size last chunk)
    val cut = one("Transfer-Encoding: chunked\r\n",
      ("5\r\n" + text.take(5) + "\r\n").getBytes("ISO-8859-1"))
    assert(cut.payload_err == "bad_chunked")
    // corrupted gzip: bad_payload, empty body
    val broken = gzip(t); broken(broken.length / 2) =
      (broken(broken.length / 2) ^ 0x5a).toByte
    val bp = one("Content-Encoding: gzip\r\n", broken)
    assert(bp.payload_err == "bad_payload" && bp.body == "")
    // REPEATED field lines combine as a list (RFC 9110 §5.3): a
    // double-gzipped body under two Content-Encoding lines must
    // decode twice — last-wins header folding would ingest the
    // still-gzipped middle layer as mojibake
    val dbl = one("Content-Encoding: gzip\r\nContent-Encoding: gzip\r\n",
      gzip(gzip(t)))
    assert(dbl.body == text && dbl.payload_enc == "gzip+gzip" &&
      dbl.payload_err == "", s"$dbl")
    // obs-fold (RFC 9112 §5.2): a continuation line with leading
    // SP/HTAB belongs to the previous field line — dropping it would
    // truncate the coding chain and decode still-gzipped bytes as text
    val fold = one("Content-Encoding: gzip,\r\n\tgzip\r\n", gzip(gzip(t)))
    assert(fold.body == text && fold.payload_enc == "gzip+gzip" &&
      fold.payload_err == "", s"$fold")
    // charset flows end-to-end: a cp1252 body under a declared header
    // charset decodes to the exact codepoints (and gzip composes)
    val cp = one("Content-Type: text/html; charset=windows-1252\r\n" +
      "Content-Encoding: gzip\r\n",
      gzip("a “b” – €".getBytes("windows-1252")))
    assert(cp.body == "a “b” – €" &&
      cp.charset == "windows-1252" && cp.payload_err == "", s"$cp")
    // warcDocs drops payload-refused rows: no empty/garbage documents
    val media = Seq(
      (1L, resp("Content-Encoding: br\r\n", Array[Byte](1, 2, 3))),
      (2L, resp("", "<html><body>ok page</body></html>".getBytes("UTF-8"))))
      .toDF("media_id", "payload")
    val docs = Containers.warcDocs(media).collect()
    assert(docs.length == 1 && docs.head.getAs[String]("text") == "ok page")
  }

  test("warcDocs: an absolute CROSS-SITE canonical is never identity by default") {
    // any crawled response can declare href="http://victim.com/x" —
    // honoring it would collide doc_id (hash of the canonical) with
    // the victim's real document and, under latest-row-wins folding,
    // replace its content at ingest. Same-host canonicals (tracking
    // variants) still fold; mirror folds are an explicit opt-in.
    def resp(reqUrl: String, body: String) = Containers.warcRecordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> reqUrl,
      "Content-Type" -> "application/http; msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
        .getBytes("ISO-8859-1"))
    val poison =
      "<html><head><link rel=\"canonical\" href=\"http://victim.example/x\">" +
        "</head><body><p>attacker content</p></body></html>"
    val victim = "<html><body><p>real content</p></body></html>"
    val media = Seq(
      (1L, resp("http://attacker.example/p", poison)),
      (2L, resp("http://victim.example/x", victim)),
      // same-host canonical still folds (port+case variants normalize)
      (3L, resp("http://victim.example/x?utm=1",
        "<html><head><link rel=\"canonical\" " +
          "href=\"HTTP://VICTIM.example:80/x\"></head><body>v</body></html>")))
      .toDF("media_id", "payload")
    val out = Containers.warcDocs(media).collect()
    val byReq = out.map(r => r.getAs[String]("source") ->
      r.getAs[String]("url_norm"))
    // the attacker's row keeps ITS OWN request identity
    assert(byReq.contains("attacker.example" -> "http://attacker.example/p"),
      s"cross-site canonical must not become identity: ${byReq.toSeq}")
    // victim rows fold among themselves (2 rows, one url_norm)
    assert(out.map(_.getAs[String]("url_norm"))
      .count(_ == "http://victim.example/x") == 2)
    // the explicit opt-in restores mirror folding
    val trusted = Containers.warcDocs(media, trustCrossSiteCanonicals = true)
      .collect()
    assert(trusted.map(_.getAs[String]("url_norm"))
      .count(_ == "http://victim.example/x") == 3)
  }

  test("warcDocs: relative canonicals resolve per-site, never collapse cross-site") {
    // href="/" is the most common relative canonical; it resolves
    // against EACH request's own scheme://host — two different sites
    // declaring it must NOT fold onto one doc_id
    def resp(reqUrl: String, canon: String) = Containers.warcRecordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> reqUrl,
      "Content-Type" -> "application/http; msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"""<html><head><link rel="canonical" href="$canon"></head>""" +
        "<body><p>front page</p></body></html>").getBytes("ISO-8859-1"))
    val media = Seq(
      (1L, resp("http://alpha.example/?utm=1", "/")),
      (2L, resp("http://beta.example/", "/")),
      // root-relative with a path: two crawl paths of ONE site fold
      (3L, resp("http://alpha.example/a?ref=x", "/home")),
      (4L, resp("http://alpha.example/b", "/home")),
      // protocol-relative is NOT root-relative: falls back to request
      (5L, resp("http://gamma.example/page", "//cdn.example/asset")))
      .toDF("media_id", "payload")
    val out = Containers.warcDocs(media).collect()
    assert(out.length == 5)
    val norms = out.map(_.getAs[String]("url_norm"))
    assert(norms.count(_ == "http://alpha.example/home") == 2,
      s"same-site root-relative canonicals must fold: ${norms.toSeq}")
    assert(norms.contains("http://alpha.example") &&
      norms.contains("http://beta.example"),
      s"per-site resolution, no cross-site collapse: ${norms.toSeq}")
    assert(norms.contains("http://gamma.example/page"),
      s"protocol-relative falls back to the request URL: ${norms.toSeq}")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 4)
  }

  test("readBinaryMedia: a directory of container files loads as (media_id, payload)") {
    val dir = java.nio.file.Files.createTempDirectory("warcdir")
    try {
      java.nio.file.Files.write(dir.resolve("a.warc"), warcPair("file a"))
      java.nio.file.Files.write(dir.resolve("b.warc"), warcPair("file b"))
      val media = Containers.readBinaryMedia(spark, dir.toString)
      assert(media.count() == 2)
      val recs = Containers.decodeWarc(media).toDF()
      assert(recs.where(col("ok") === 1 && col("warc_type") === "response")
        .select(col("body")).as[String].collect().toSet == Set("file a", "file b"))
      // media_id is stable per path and distinct across files
      assert(media.select(col("media_id")).distinct().count() == 2)
    } finally {
      graft.io.Lake.delete(spark, dir.toString)
    }
  }

  test("charset resolution: BOM > header > meta > utf-8, WHATWG folds, loud refusal") {
    def res(body: Array[Byte], ct: String) = Containers.resolveCharset(body, ct)
    // BOM wins over a contradicting header claim, and its bytes strip
    assert(res(Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 0),
      "text/html; charset=utf-8") == Right(("utf-16le", "UTF-16LE", 2)))
    assert(res(Array[Byte](0xfe.toByte, 0xff.toByte, 0, 'a'),
      "text/html") == Right(("utf-16be", "UTF-16BE", 2)))
    assert(res(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'x'),
      "") == Right(("utf-8", "UTF-8", 3)))
    // header param beats meta; quoted and bare forms both parse
    assert(res("<meta charset=shift_jis>x".getBytes("UTF-8"),
      "text/html; charset=\"euc-kr\"") == Right(("euc-kr", "EUC-KR", 0)))
    // meta sniff: only without a header param, only text/html-ish
    assert(res("<meta charset=shift_jis>x".getBytes("UTF-8"),
      "text/html") == Right(("shift_jis", "Shift_JIS", 0)))
    assert(res("<META HTTP-EQUIV=\"Content-Type\" CONTENT=\"text/html; charset=EUC-KR\">"
      .getBytes("UTF-8"), "text/html") == Right(("euc-kr", "EUC-KR", 0)))
    // a meta-shaped byte string in a plain-text body is content, not
    // a declaration
    assert(res("<meta charset=shift_jis>x".getBytes("UTF-8"),
      "text/plain") == Right(("utf-8", "UTF-8", 0)))
    // ...and only within the first 1024 bytes
    val late = (" " * 1024 + "<meta charset=shift_jis>").getBytes("UTF-8")
    assert(res(late, "text/html") == Right(("utf-8", "UTF-8", 0)))
    // WHATWG folds: latin1/ascii -> windows-1252; BOM-less utf-16 -> LE
    for (l <- Seq("iso-8859-1", "latin1", "US-ASCII", "cp1252"))
      assert(res(Array.emptyByteArray, s"text/html; charset=$l") ==
        Right(("windows-1252", "windows-1252", 0)), l)
    assert(res(Array.emptyByteArray, "text/html; charset=UTF-16") ==
      Right(("utf-16le", "UTF-16LE", 0)))
    // unknown label: loud refusal carrying the raw folded label
    assert(res(Array.emptyByteArray, "text/html; charset=x-mystery-8") ==
      Left("x-mystery-8"))
  }

  test("charset corpus replays closed-form: every arm's text exact, BOMs stripped") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L, 11L).toDF("doc_id")
    val media = Containers.charsetWarcCorpusFromDocuments(docs)
    val rows = Containers.decodeWarc(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(0L).body == "<p>Doc 0 café</p>" && rows(0L).charset == "utf-8")
    assert(rows(1L).body == "<p>Doc 1 “q”–€</p>" &&
      rows(1L).charset == "windows-1252" && rows(1L).payload_enc == "gzip")
    assert(rows(2L).body == "<meta charset=shift_jis><p>Doc 2 日本語</p>" &&
      rows(2L).charset == "shift_jis")
    assert(rows(3L).body == "<p>Doc 3 Ω</p>" && rows(3L).charset == "utf-16le")
    assert(rows(4L).body == "<p>Doc 4 …€</p>" &&
      rows(4L).charset == "windows-1252")
    assert(rows(5L).charset == "euc-kr" && rows(5L).body.endsWith("<p>Doc 5 한국</p>"))
    assert(rows(6L).body == "" && rows(6L).payload_err == "unsupported_charset" &&
      rows(6L).charset == "x-mystery-8" && rows(6L).ok == 1)
    assert(rows(7L).body == "<p>Doc 7 plain</p>" && !rows(7L).body.startsWith("﻿"))
    // arm stability across ids in the same class
    assert(rows(9L).body == "<p>Doc 9 “q”–€</p>" && rows(11L).charset == "utf-16le")
  }
}
