package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw web-crawl container ingestion — the record walk that turns an
  * archived crawl segment into per-record rows, completing the
  * Common-Crawl path in front of the existing stages (gzip member
  * decode -> THIS -> [[graft.text.Urls]] canonicalization ->
  * [[graft.text.Html]] extraction -> curation). Reference analog: the
  * extractors' raw-zone landing intent (medical_etl_dag.py:88-96) —
  * land opaque payloads, then parse structure out of them downstream.
  *
  * Two container formats, both from their public specs:
  *  - WARC (ISO 28500): records = "WARC/x.y" header block (CRLF lines,
  *    "Name: value"), blank line, Content-Length payload bytes, CRLF
  *    CRLF terminator. Response records carrying an HTTP message
  *    (Content-Type: application/http) additionally split the status
  *    line + headers off the body.
  *  - POSIX ustar tar: 512-byte headers (NUL-terminated name, octal
  *    size/checksum fields), data rounded up to 512-byte blocks,
  *    two-zero-block end marker. The checksum (header bytes summed
  *    with the checksum field as spaces) is VALIDATED — a corrupted
  *    header must not walk garbage offsets.
  *
  * Error contract (the codec discipline of [[Multimodal]]): a
  * malformed container surfaces its parsed prefix as ok=1 rows plus
  * ONE ok=0 row at the failing record index — kept, not dropped, so a
  * crawl-archive audit can count bad segments; never garbage rows
  * past a corrupt header. Hitting `maxRecords`/`maxEntries` with bytes
  * left surfaces the same way: an ok=0 "__truncated__" marker row (the
  * type/name field carries the family, the byte-count field the
  * unconsumed remainder), so a capped walk never reads as fully
  * ingested.
  *
  * Scale shape: one row per container in, mapPartitions batch walk
  * (no driver bytes), one row per record out — the decodeStage plan
  * shape. Containers are bounded by the binary-column row limit; at
  * 100 TB the archives arrive as bounded segments (the Common-Crawl
  * layout: ~1 GB per .warc.gz) and each segment is one row, so the
  * walk parallelizes across segments, records explode executor-side,
  * and `maxRecords` caps adversarial many-empty-record payloads. */
object Containers {

  // ---- WARC ---------------------------------------------------------

  /** `payload_bytes` is the WIRE size (the WARC Content-Length);
    * `body` is the decoded text. `payload_enc` is the DECLARED
    * transfer/content coding chain ("", "chunked", "gzip",
    * "chunked+gzip", …) — kept on refusals so the audit sees why.
    * `payload_err` tags payload-level refusals ("" = decoded):
    * `bad_chunked` (chunk framing violation), `bad_payload` (a
    * declared coding failed to decode / blew the bomb bound),
    * `unsupported_encoding` (br and anything else without a decoder —
    * a LOUD refusal; passing compressed bytes through as UTF-8 would
    * feed mojibake into dedup signatures and tokenizer counts), and
    * `unsupported_charset` (a declared charset label with no decoder
    * here — same discipline one layer up). `charset` is the canonical
    * label the body text was decoded under (BOM > Content-Type header
    * > meta sniff > utf-8; "" for non-HTTP records and pre-charset
    * refusals; the raw unrecognized label on unsupported_charset so
    * the audit sees WHICH charsets the crawl is losing).
    * Payload errors keep ok=1: the WARC record itself parsed. */
  final case class WarcRecord(
      media_id: Long, rec_index: Int, ok: Int, warc_type: String,
      url: String, http_status: Int, body: String, payload_bytes: Long,
      payload_enc: String, payload_err: String, charset: String)

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val end = math.min(until, b.length) - 3
    while (i < end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** HTTP/1.1 chunked transfer-decoding (RFC 9112 §7.1): hex size
    * line (chunk extensions after ';' ignored), chunk bytes, CRLF,
    * repeated to the 0-size last chunk (the trailer section is
    * ignored). Any framing violation is Left("bad_chunked") —
    * resynchronizing inside a broken chunk stream would fabricate
    * body bytes. Raw captures very often carry chunked framing; taken
    * verbatim the hex size lines and CRLFs become document text. */
  private def dechunk(b: Array[Byte], from: Int,
      until: Int): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, until - from))
    var i = from
    while (i < until) {
      var j = i
      while (j < until && b(j) != '\r') j += 1
      if (j + 1 >= until || b(j + 1) != '\n') return Left("bad_chunked")
      val line = new String(b, i, j - i, "ISO-8859-1")
      val hexStr = line.takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(hexStr, 16)
        catch { case _: NumberFormatException => return Left("bad_chunked") }
      if (size < 0L || size > (until - j - 2).toLong) return Left("bad_chunked")
      if (size == 0L) return Right(out.toByteArray)
      out.write(b, j + 2, size.toInt)
      i = j + 2 + size.toInt
      if (i + 1 >= until || b(i) != '\r' || b(i + 1) != '\n')
        return Left("bad_chunked")
      i += 2
    }
    Left("bad_chunked") // ran out of bytes before the 0-size last chunk
  }

  /** HTTP `deflate` content-coding: zlib-wrapped per RFC 9110 §8.4.1,
    * with raw DEFLATE as the fallback (the classic nonconformant-
    * server reality). Output bounded by `maxBytes` (bomb guard). */
  private def inflateDeflate(p: Array[Byte],
      maxBytes: Int): Option[Array[Byte]] = {
    def run(nowrap: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        inf.setInput(p)
        val out = new java.io.ByteArrayOutputStream(
          math.min(math.max(64, p.length * 4), 1 << 16))
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None // truncated stream or preset-dictionary ask
          out.write(buf, 0, n)
          if (out.size > maxBytes) return None
        }
        Some(out.toByteArray)
      } catch { case _: java.util.zip.DataFormatException => None }
      finally inf.end()
    }
    run(false).orElse(run(true))
  }

  /** WHATWG-style charset label folding: the labels real crawls
    * declare, mapped to (canonical audit label, JVM charset name).
    * Notably `iso-8859-1` / `latin1` / `ascii` fold to windows-1252 —
    * the WHATWG encoding standard's rule, because real pages declaring
    * latin-1 use the 0x80–0x9F range as cp1252 punctuation (€ “ ” –),
    * and decoding them as true latin-1 mints C1 control characters
    * into dedup signatures. `utf-16` without a BOM is LE (WHATWG),
    * not the JVM's BE default. Anything not listed has no decoder
    * here and refuses loudly with `unsupported_charset`. */
  private val charsetLabels: Map[String, (String, String)] = {
    def grp(canon: String, jvm: String, labels: String*) =
      labels.map(_ -> (canon, jvm))
    (grp("utf-8", "UTF-8", "utf-8", "utf8", "unicode-1-1-utf-8") ++
      grp("windows-1252", "windows-1252", "windows-1252", "cp1252",
        "x-cp1252", "iso-8859-1", "iso8859-1", "latin1", "l1",
        "ascii", "us-ascii", "iso-ir-100", "iso_8859-1") ++
      grp("iso-8859-2", "ISO-8859-2", "iso-8859-2", "latin2") ++
      grp("iso-8859-15", "ISO-8859-15", "iso-8859-15", "latin9") ++
      grp("windows-1250", "windows-1250", "windows-1250", "cp1250") ++
      grp("windows-1251", "windows-1251", "windows-1251", "cp1251") ++
      grp("windows-1254", "windows-1254", "windows-1254", "cp1254",
        "iso-8859-9", "latin5") ++
      grp("koi8-r", "KOI8-R", "koi8-r", "koi8") ++
      grp("koi8-u", "KOI8-U", "koi8-u") ++
      grp("shift_jis", "Shift_JIS", "shift_jis", "shift-jis", "sjis",
        "x-sjis", "ms_kanji", "windows-31j") ++
      grp("euc-jp", "EUC-JP", "euc-jp", "x-euc-jp") ++
      grp("euc-kr", "EUC-KR", "euc-kr", "korean", "ks_c_5601-1987",
        "cseuckr") ++
      grp("gbk", "GBK", "gbk", "gb2312", "gb_2312", "x-gbk", "gb_2312-80",
        "csgb2312") ++
      grp("big5", "Big5", "big5", "big5-hkscs", "cn-big5", "x-x-big5") ++
      grp("utf-16le", "UTF-16LE", "utf-16", "utf-16le") ++
      grp("utf-16be", "UTF-16BE", "utf-16be")).toMap
  }

  /** Extract a `charset=` parameter value from a Content-Type-shaped
    * string ("" when absent). Quoted and bare forms. */
  private def charsetParam(contentType: String): String = {
    val m = "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9._:+-]+)".r
      .findFirstMatchIn(contentType)
    m.map(_.group(1)).getOrElse("")
  }

  /** Resolve the charset for a decoded (post-content-coding) HTTP
    * body. Precedence (the WHATWG order): byte-order mark > the
    * Content-Type header's charset parameter > a `<meta charset>` /
    * http-equiv declaration within the first 1024 bytes (text/html
    * only — a meta-shaped byte string inside a plain-text or JSON
    * body is content, not a declaration) > UTF-8. Returns
    * Right((canonicalLabel, jvmName, bomLen)) or Left(rawLabel) when
    * the declared label has no decoder here. */
  private[multimodal] def resolveCharset(body: Array[Byte],
      contentType: String): Either[String, (String, String, Int)] = {
    if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
        (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
      return Right(("utf-8", "UTF-8", 3))
    if (body.length >= 2 && (body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
      return Right(("utf-16be", "UTF-16BE", 2))
    if (body.length >= 2 && (body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
      return Right(("utf-16le", "UTF-16LE", 2))
    def fold(label: String): Either[String, (String, String, Int)] = {
      val l = label.trim.toLowerCase
      charsetLabels.get(l) match {
        case Some((canon, jvm)) => Right((canon, jvm, 0))
        case None => Left(l)
      }
    }
    val hdr = charsetParam(contentType)
    if (hdr.nonEmpty) return fold(hdr)
    val mediaType = contentType.split(";")(0).trim.toLowerCase
    val htmlish = mediaType.isEmpty || mediaType == "text/html" ||
      mediaType == "application/xhtml+xml"
    if (htmlish) {
      val prefix = new String(body, 0, math.min(1024, body.length),
        "ISO-8859-1")
      val meta = "(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._:+-]+)".r
        .findFirstMatchIn(prefix)
      meta.foreach(m => return fold(m.group(1)))
    }
    Right(("utf-8", "UTF-8", 0))
  }

  /** Decode one HTTP message payload per its Transfer-Encoding /
    * Content-Encoding headers: dechunk first (transfer coding is the
    * outermost layer), then undo content codings in reverse of their
    * declared order. gzip/x-gzip, deflate, and zstd decode for real
    * (all bomb-bounded); `br` and unknown codings refuse loudly with
    * `unsupported_encoding` — never mojibake. The inflated bytes then
    * decode to text under [[resolveCharset]]'s BOM > header > meta
    * precedence (an unknown declared label refuses with
    * `unsupported_charset`, keeping the raw label for the audit);
    * malformed sequences in a KNOWN charset replace (the browser
    * rule — a handful of bad bytes must not discard a page). Returns
    * (bodyText, declaredChain, errTag, charsetLabel). */
  private def decodeHttpPayload(b: Array[Byte], bs: Int, be: Int,
      httpHdrs: Map[String, String], maxBytes: Int): (String, String, String, String) = {
    def tokens(h: String): Seq[String] = httpHdrs.getOrElse(h, "")
      .toLowerCase.split(",").iterator.map(_.trim)
      .filter(t => t.nonEmpty && t != "identity").toSeq
    val te = tokens("transfer-encoding")
    val ce = tokens("content-encoding")
    val declared = (te ++ ce).mkString("+")
    if (te.exists(_ != "chunked"))
      return ("", declared, "unsupported_encoding", "")
    val afterTe: Either[String, Array[Byte]] =
      if (te.nonEmpty) dechunk(b, bs, be)
      else Right(java.util.Arrays.copyOfRange(b, bs, be))
    afterTe match {
      case Left(tag) => ("", declared, tag, "")
      case Right(raw0) =>
        var cur = raw0
        var err = ""
        ce.reverseIterator.foreach { tok =>
          if (err.isEmpty) tok match {
            case "gzip" | "x-gzip" =>
              Multimodal.gunzipBytes(cur, maxBytes) match {
                case Some(d) => cur = d
                case None => err = "bad_payload"
              }
            case "deflate" =>
              inflateDeflate(cur, maxBytes) match {
                case Some(d) => cur = d
                case None => err = "bad_payload"
              }
            case "zstd" =>
              Zstd.decompress(cur, maxBytes) match {
                case Some(d) => cur = d
                case None => err = "bad_payload"
              }
            case _ => err = "unsupported_encoding"
          }
        }
        if (err.nonEmpty) ("", declared, err, "")
        else resolveCharset(cur, httpHdrs.getOrElse("content-type", "")) match {
          case Left(label) => ("", declared, "unsupported_charset", label)
          case Right((canon, jvm, bom)) =>
            (new String(cur, bom, cur.length - bom,
              java.nio.charset.Charset.forName(jvm)), declared, "", canon)
        }
    }
  }

  /** Walk one WARC container. Strict: a record whose version line,
    * Content-Length, or CRLFCRLF terminator is wrong ends the walk
    * with an ok=0 row at that index (bytes after a bad length are
    * unaddressable — resynchronizing would fabricate records).
    * application/http payloads are transfer/content-DECODED (see
    * [[decodeHttpPayload]]); `maxBytes` bounds each decoded payload. */
  def parseWarc(id: Long, b: Array[Byte],
      maxRecords: Int = 100000, maxBytes: Int = 1 << 26): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    if (b == null || b.length == 0) {
      out += WarcRecord(id, 0, 0, "", "", 0, "", 0L, "", "", "")
      return out.result()
    }
    var i = 0
    var idx = 0
    var failed = false
    while (!failed && i < b.length && idx < maxRecords) {
      val he = indexOfCrlfCrlf(b, i, b.length)
      if (he < 0) failed = true
      else {
        // header bytes are ASCII per spec; latin-1 decode is lossless
        val lines = new String(b, i, he - i, "ISO-8859-1").split("\r\n")
        if (!lines(0).startsWith("WARC/")) failed = true
        else {
          val hdrs = lines.iterator.drop(1).flatMap { l =>
            val c = l.indexOf(':')
            if (c <= 0) None
            else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
          }.toMap
          val lenOpt = hdrs.get("content-length")
            .flatMap(s => scala.util.Try(s.toLong).toOption)
            .filter(n => n >= 0 && n <= b.length.toLong - he - 8)
          lenOpt match {
            case Some(len) =>
              val ps = he + 4
              val pe = ps + len.toInt
              if (!(b(pe) == '\r' && b(pe + 1) == '\n' &&
                    b(pe + 2) == '\r' && b(pe + 3) == '\n')) failed = true
              else {
                val ctype = hdrs.getOrElse("content-type", "")
                val (status, body, penc, perr, pcs) =
                  if (ctype.startsWith("application/http")) {
                    val hhe = indexOfCrlfCrlf(b, ps, pe)
                    if (hhe < 0)
                      (0, new String(b, ps, pe - ps, "UTF-8"), "", "", "")
                    else {
                      val headText = new String(b, ps, hhe - ps, "ISO-8859-1")
                      // RFC 9112 §5.2 obs-fold: a field line continued on the
                      // next line with leading SP/HTAB is one logical line —
                      // dropping it would truncate a folded Content-Encoding
                      // chain and decode still-compressed bytes as text.
                      val hlines = headText
                        .replaceAll("\r\n[ \t]+", " ")
                        .split("\r\n")
                      val m = "^HTTP/\\d\\.\\d (\\d{3})".r
                        .findFirstMatchIn(hlines(0))
                      // repeated field lines combine as a comma list
                      // (RFC 9110 §5.3) — last-wins toMap would drop
                      // one of two Content-Encoding: gzip lines and
                      // ingest the still-gzipped bytes as mojibake
                      val httpHdrs = hlines.iterator.drop(1).flatMap { l =>
                        val c = l.indexOf(':')
                        if (c <= 0) None
                        else Some(l.substring(0, c).trim.toLowerCase ->
                          l.substring(c + 1).trim)
                      }.toSeq.groupBy(_._1)
                        .map { case (k, vs) => k -> vs.map(_._2).mkString(",") }
                      val (bstr, e0, x0, c0) =
                        decodeHttpPayload(b, hhe + 4, pe, httpHdrs, maxBytes)
                      (m.map(_.group(1).toInt).getOrElse(0), bstr, e0, x0, c0)
                    }
                  } else (0, new String(b, ps, pe - ps, "UTF-8"), "", "", "")
                out += WarcRecord(id, idx, 1,
                  hdrs.getOrElse("warc-type", ""),
                  hdrs.getOrElse("warc-target-uri", ""),
                  status, body, len, penc, perr, pcs)
                i = pe + 4
                idx += 1
              }
            case None => failed = true
          }
        }
      }
    }
    if (failed) out += WarcRecord(id, idx, 0, "", "", 0, "", 0L, "", "", "")
    // audit contract: hitting the record cap with bytes left must not
    // look fully ingested — surface ONE marker row, distinguishable
    // from a parse failure by its warc_type ("__truncated__" is not a
    // legal WARC-Type value), carrying the unconsumed byte count
    else if (idx >= maxRecords && i < b.length)
      out += WarcRecord(id, idx, 0, "__truncated__", "", 0, "",
        (b.length - i).toLong, "", "", "")
    out.result()
  }

  /** Container-level inflate: "none" passes bytes through, "gzip" /
    * "zstd" decode the named codec ([[Multimodal.gunzipBytes]] /
    * [[Zstd.decompress]], both with the zip-bomb bound), "auto"
    * sniffs the magic (1F 8B gzip, 28 B5 2F FD zstd, else plain) —
    * the mixed-compression crawl-segment directory case. */
  def inflate(p: Array[Byte], codec: String,
      maxBytes: Int = 1 << 26): Option[Array[Byte]] = codec match {
    case "none" | "" => Option(p)
    case "gzip" => Multimodal.gunzipBytes(p, maxBytes)
    case "zstd" => Zstd.decompress(p, maxBytes)
    case "auto" =>
      if (p == null) None
      else if (p.length >= 2 && (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
        Multimodal.gunzipBytes(p, maxBytes)
      else if (Zstd.isZstd(p)) Zstd.decompress(p, maxBytes)
      else Option(p)
    case other =>
      throw new IllegalArgumentException(s"unknown container codec '$other'")
  }

  /** Batched WARC record walk over a binary media frame (media_id,
    * payload). `gzipped = true` gunzips each container first (the
    * .warc.gz layout); `codec` names the compression explicitly
    * ("gzip" / "zstd" — the .warc.zst layout — / "auto" magic sniff)
    * and takes precedence over the legacy flag. An unopenable member
    * is a container-level ok=0 row. */
  def decodeWarc(media: DataFrame, partitions: Int = 0,
      gzipped: Boolean = false, maxBytes: Int = 1 << 26,
      codec: String = ""): Dataset[WarcRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val eff = if (codec.nonEmpty) codec else if (gzipped) "gzip" else "none"
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        inflate(p, eff, maxBytes) match {
          case Some(bytes) => parseWarc(id, bytes, maxBytes = maxBytes)
          case None => Seq(WarcRecord(id, 0, 0, "", "", 0, "", 0L, "", "", ""))
        }
      }
  }

  /** One serialized WARC record (fixture-synthesis counterpart —
    * Content-Length computed, CRLFCRLF framing per spec). */
  def warcRecordBytes(headers: Seq[(String, String)],
      payload: Array[Byte], declaredLength: Option[Long] = None): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ")
      .append(declaredLength.getOrElse(payload.length.toLong))
      .append("\r\n\r\n")
    val head = sb.toString.getBytes("ISO-8859-1")
    val outB = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, outB, 0, head.length)
    System.arraycopy(payload, 0, outB, head.length, payload.length)
    outB(outB.length - 4) = '\r'; outB(outB.length - 3) = '\n'
    outB(outB.length - 2) = '\r'; outB(outB.length - 1) = '\n'
    outB
  }

  /** Deterministic WARC corpus from the documents table — the q131
    * generate-parse-replay fixture: each doc becomes a 2-record
    * container (warcinfo + an HTTP response whose URI derives from the
    * id and whose body is the doc text); every id%4==2 container
    * declares a WRONG Content-Length on the response record, so the
    * gate covers the error path (warcinfo parses, response surfaces
    * as the ok=0 tail row). */
  def warcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val info = warcRecordBytes(Seq(
          "WARC-Type" -> "warcinfo",
          "Content-Type" -> "application/warc-fields"),
          "software: graft\r\n".getBytes("UTF-8"))
        val body = (if (text == null) "" else text).getBytes("UTF-8")
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n")
          .getBytes("ISO-8859-1") ++ body
        val bad = java.lang.Math.floorMod(id, 4L) == 2L
        val resp = warcRecordBytes(Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" ->
            s"http://site${java.lang.Math.floorMod(id, 7L)}.example/doc$id.html",
          "Content-Type" -> "application/http; msgtype=response"),
          http,
          declaredLength = if (bad) Some(http.length.toLong + 9L) else None)
        (id, info ++ resp)
    }.toDF("media_id", "payload")
  }

  /** Deterministic HTTP-payload-encoding WARC corpus — the q194
    * generate-parse-replay fixture. Each doc becomes a 2-record
    * container (warcinfo + response) whose response body is the doc
    * text under an id-derived wire encoding; every encoded arm is
    * CONTENT-INVISIBLE (the decoded body is always the doc text), so
    * the oracle states bodies closed-form. Arms (id%8):
    *  0 identity; 1 chunked (id%16==9: malformed hex size line →
    *  bad_chunked); 2 gzip; 3 deflate (zlib-wrapped); 4 chunked+gzip
    *  (both layers); 5 deflate RAW (the nonconformant-server form,
    *  same declared coding); 6 br (no decoder → unsupported_encoding);
    *  7 gzip with a flipped mid-stream byte (→ bad_payload). */
  def httpWarcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val t = (if (text == null) "" else text).getBytes("UTF-8")
        def gzip(p: Array[Byte]): Array[Byte] = {
          val bo = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bo)
          g.write(p); g.close(); bo.toByteArray
        }
        def zlib(p: Array[Byte], raw: Boolean): Array[Byte] = {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
          d.setInput(p); d.finish()
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
          d.end(); bo.toByteArray
        }
        def chunked(p: Array[Byte], badSize: Boolean): Array[Byte] = {
          val bo = new java.io.ByteArrayOutputStream()
          def crlf(): Unit = { bo.write('\r'); bo.write('\n') }
          def chunk(lo: Int, hi: Int, ext: String): Unit = {
            bo.write((java.lang.Integer.toHexString(hi - lo) + ext)
              .getBytes("ISO-8859-1"))
            crlf(); bo.write(p, lo, hi - lo); crlf()
          }
          if (badSize) { bo.write("ZZ".getBytes("ISO-8859-1")); crlf() }
          else if (p.length > 0) {
            val cut = math.min(5, p.length)
            chunk(0, cut, ";x=1") // chunk extension: parsed past, never text
            if (cut < p.length) chunk(cut, p.length, "")
          }
          if (!badSize) { bo.write('0'); crlf(); crlf() }
          bo.toByteArray
        }
        val m8 = java.lang.Math.floorMod(id, 8L)
        val (hdr, payload) = m8 match {
          case 0L => ("", t)
          case 1L =>
            val bad = java.lang.Math.floorMod(id, 16L) == 9L
            ("Transfer-Encoding: chunked\r\n", chunked(t, bad))
          case 2L => ("Content-Encoding: gzip\r\n", gzip(t))
          case 3L => ("Content-Encoding: deflate\r\n", zlib(t, raw = false))
          case 4L => ("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
            chunked(gzip(t), badSize = false))
          case 5L => ("Content-Encoding: deflate\r\n", zlib(t, raw = true))
          case 6L => ("Content-Encoding: br\r\n",
            Array[Byte](0x1b, 0x2a, 0x03)) // opaque: never decoded
          case _ =>
            val g = gzip(t)
            g(g.length / 2) = (g(g.length / 2) ^ 0x5a).toByte
            ("Content-Encoding: gzip\r\n", g)
        }
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$hdr\r\n")
          .getBytes("ISO-8859-1") ++ payload
        val info = warcRecordBytes(Seq(
          "WARC-Type" -> "warcinfo",
          "Content-Type" -> "application/warc-fields"),
          "software: graft\r\n".getBytes("UTF-8"))
        val resp = warcRecordBytes(Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" ->
            s"http://site${java.lang.Math.floorMod(id, 7L)}.example/p$id",
          "Content-Type" -> "application/http; msgtype=response"),
          http)
        (id, info ++ resp)
    }.toDF("media_id", "payload")
  }

  /** Deterministic CHARSET-DECLARATION WARC corpus — the q203
    * generate-parse-replay fixture for byte→text decoding. Each doc
    * becomes a 1-record container (an HTML response) whose body BYTES
    * are a closed-form marker string under an id-derived charset and
    * declaration channel; the decoded TEXT is closed-form in every
    * arm, so the oracle restates bodies, charset labels, and refusal
    * tags from id arithmetic. Arms (id%8):
    *  0 utf-8 default (no declaration anywhere), non-ASCII content;
    *  1 header-declared windows-1252 UNDER gzip content-coding
    *    (charset resolution must run on the inflated bytes — smart
    *    quotes / en-dash / euro in the 0x80–0x9F range);
    *  2 `<meta charset=shift_jis>` sniff (header has no charset);
    *  3 UTF-16LE BOM with a header claiming utf-8 — the BOM wins;
    *  4 header `iso-8859-1` label over cp1252 bytes (0x85 0x80) —
    *    the WHATWG latin1→windows-1252 fold;
    *  5 `<meta http-equiv=Content-Type content="...; charset=euc-kr">`;
    *  6 header-declared `x-mystery-8` → unsupported_charset refusal
    *    (the raw label kept for the audit);
    *  7 UTF-8 BOM — decoded text must NOT start with U+FEFF. */
  def charsetWarcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      def gzip(p: Array[Byte]): Array[Byte] = {
        val bo = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bo)
        g.write(p); g.close(); bo.toByteArray
      }
      val m8 = java.lang.Math.floorMod(id, 8L)
      val (ctype, extraHdr, payload) = m8 match {
        case 0L => ("text/html", "",
          s"<p>Doc $id café</p>".getBytes("UTF-8"))
        case 1L => ("text/html; charset=windows-1252",
          "Content-Encoding: gzip\r\n",
          gzip(s"<p>Doc $id “q”–€</p>"
            .getBytes("windows-1252")))
        case 2L => ("text/html", "",
          (s"<meta charset=shift_jis><p>Doc $id " +
            "日本語</p>").getBytes("Shift_JIS"))
        case 3L => ("text/html; charset=utf-8", "",
          Array[Byte](0xff.toByte, 0xfe.toByte) ++
            s"<p>Doc $id Ω</p>".getBytes("UTF-16LE"))
        case 4L => ("text/html; charset=iso-8859-1", "",
          s"<p>Doc $id …€</p>".getBytes("windows-1252"))
        case 5L => ("text/html", "",
          ("<meta http-equiv=\"Content-Type\" " +
            "content=\"text/html; charset=euc-kr\">" +
            s"<p>Doc $id 한국</p>").getBytes("EUC-KR"))
        case 6L => ("text/html; charset=x-mystery-8", "",
          s"<p>Doc $id opaque</p>".getBytes("UTF-8"))
        case _ => ("text/html", "",
          Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
            s"<p>Doc $id plain</p>".getBytes("UTF-8"))
      }
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n$extraHdr\r\n")
        .getBytes("ISO-8859-1") ++ payload
      val resp = warcRecordBytes(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" ->
          s"http://site${java.lang.Math.floorMod(id, 7L)}.example/c$id",
        "Content-Type" -> "application/http; msgtype=response"),
        http)
      (id, resp)
    }.toDF("media_id", "payload")
  }

  /** Deterministic CRAWL-INGEST composition corpus — the q199 fixture
    * exercising this round's whole ingest chain in one pass: HTML
    * responses (title + body + a canonical-link arm) under HTTP wire
    * encodings (id%3: identity / chunked / gzip), flowing through
    * [[warcDocs]] to curation-ready rows. Canonical arms (id%5):
    * 0 = same-host absolute (case/port variant — folds to the
    * normalized canonical), 1 = CROSS-SITE absolute (ignored — the
    * poison guard), 2 = root-relative /home (resolves per-site),
    * 3 = none, 4 = canonical inside an HTML comment (ignored — the
    * hidden-region guard). All arms text-invisible: extracted text is
    * always "Doc <id> <text>". */
  def crawlWarcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        def fm(m: Long): Long = java.lang.Math.floorMod(id, m)
        val k = fm(7L)
        val canon = fm(5L) match {
          case 0L => s"""<link rel="canonical" href="HTTP://SITE$k.EXAMPLE:80/c${fm(25L)}">"""
          case 1L => """<link rel="canonical" href="http://victim.example/x">"""
          case 2L => """<link rel="canonical" href="/home">"""
          case 3L => ""
          case _ => """<!-- <link rel="canonical" href="http://victim.example/y"> -->"""
        }
        val html = (s"<html><head><title>Doc $id</title>$canon</head>" +
          s"<body><p>${if (text == null) "" else text}</p></body></html>")
          .getBytes("UTF-8")
        def gzip(p: Array[Byte]): Array[Byte] = {
          val bo = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bo)
          g.write(p); g.close(); bo.toByteArray
        }
        val (hdr, payload) = fm(3L) match {
          case 0L => ("", html)
          case 1L =>
            val bo = new java.io.ByteArrayOutputStream()
            def crlf(): Unit = { bo.write('\r'); bo.write('\n') }
            val cut = math.min(7, html.length)
            bo.write(java.lang.Integer.toHexString(cut).getBytes("ISO-8859-1"))
            crlf(); bo.write(html, 0, cut); crlf()
            if (cut < html.length) {
              bo.write(java.lang.Integer.toHexString(html.length - cut)
                .getBytes("ISO-8859-1"))
              crlf(); bo.write(html, cut, html.length - cut); crlf()
            }
            bo.write('0'); crlf(); crlf()
            ("Transfer-Encoding: chunked\r\n", bo.toByteArray)
          case _ => ("Content-Encoding: gzip\r\n", gzip(html))
        }
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$hdr\r\n")
          .getBytes("ISO-8859-1") ++ payload
        val resp = warcRecordBytes(Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://site$k.example/p$id?utm=1",
          "Content-Type" -> "application/http; msgtype=response"),
          http)
        (id, resp)
    }.toDF("media_id", "payload")
  }

  // ---- tar ----------------------------------------------------------

  final case class TarEntry(
      media_id: Long, ent_index: Int, ok: Int, name: String,
      n_bytes: Long, text: String)

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); any = true; i += 1
    }
    if (any) v else -1L
  }

  private def cString(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, "UTF-8")
  }

  private def allZero(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    while (i < off + len) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Walk one ustar tar. The header checksum is validated (all header
    * bytes summed unsigned with the checksum field as 8 spaces) — a
    * failed checksum, bad octal size, or data running past the buffer
    * ends the walk with an ok=0 row at that entry index. A zero block
    * ends the archive (the two-zero-block marker; one suffices — the
    * second is framing, and a truncated-after-one archive is still
    * unambiguous). */
  def parseTar(id: Long, b: Array[Byte],
      maxEntries: Int = 100000): Seq[TarEntry] = {
    val out = Seq.newBuilder[TarEntry]
    if (b == null || b.length < 512) {
      out += TarEntry(id, 0, 0, "", 0L, "")
      return out.result()
    }
    var i = 0
    var idx = 0
    var failed = false
    var done = false
    while (!done && !failed && i + 512 <= b.length && idx < maxEntries) {
      if (allZero(b, i, 512)) done = true
      else {
        val stored = parseOctal(b, i + 148, 8)
        var sum = 0L
        var j = 0
        while (j < 512) {
          sum += (if (j >= 148 && j < 156) ' '.toLong else (b(i + j) & 0xff).toLong)
          j += 1
        }
        val size = parseOctal(b, i + 124, 12)
        if (stored < 0 || stored != sum || size < 0) failed = true
        else {
          val dataStart = i + 512
          val padded = ((size + 511L) / 512L) * 512L
          if (dataStart.toLong + padded > b.length.toLong) failed = true
          else {
            out += TarEntry(id, idx, 1, cString(b, i, 100), size,
              new String(b, dataStart, size.toInt, "UTF-8"))
            i = dataStart + padded.toInt
            idx += 1
          }
        }
      }
    }
    if (failed) out += TarEntry(id, idx, 0, "", 0L, "")
    // same truncation contract as parseWarc: entry cap with non-end
    // bytes left -> one marker row ("__truncated__" cannot collide
    // with a real member name), n_bytes = unconsumed bytes. A cap that
    // lands exactly on the zero end-marker block is a COMPLETE walk,
    // not a truncation — the remaining bytes are framing.
    else if (idx >= maxEntries && !done && i < b.length &&
        !allZero(b, i, math.min(512, b.length - i)))
      out += TarEntry(id, idx, 0, "__truncated__", (b.length - i).toLong, "")
    out.result()
  }

  /** Batched tar entry walk — same plan shape and codec handling as
    * [[decodeWarc]] (.tar.gz / .tar.zst). */
  def decodeTar(media: DataFrame, partitions: Int = 0,
      gzipped: Boolean = false, maxBytes: Int = 1 << 26,
      codec: String = ""): Dataset[TarEntry] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val eff = if (codec.nonEmpty) codec else if (gzipped) "gzip" else "none"
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        inflate(p, eff, maxBytes) match {
          case Some(bytes) => parseTar(id, bytes)
          case None => Seq(TarEntry(id, 0, 0, "", 0L, ""))
        }
      }
  }

  /** One serialized ustar entry (header + padded data) — fixture
    * synthesis with a REAL computed checksum. */
  def tarEntryBytes(name: String, data: Array[Byte]): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val sb = s.getBytes("ISO-8859-1")
      System.arraycopy(sb, 0, h, off, math.min(sb.length, 100))
    }
    def putOctal(off: Int, width: Int, v: Long): Unit =
      // width-1 octal digits + NUL terminator, zero-padded (ustar style)
      put(off, ("%0" + (width - 1) + "o").format(v))
    put(0, name)
    putOctal(100, 8, 420L /* 0644 */)
    putOctal(108, 8, 0L)
    putOctal(116, 8, 0L)
    putOctal(124, 12, data.length.toLong)
    putOctal(136, 12, 0L)
    h(156) = '0' // regular file
    put(257, "ustar")
    h(263) = '0'; h(264) = '0' // version "00"
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += (h(i) & 0xff).toLong; i += 1 }
    val cs = ("%06o".format(sum)).getBytes("ISO-8859-1")
    System.arraycopy(cs, 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    val padded = ((data.length + 511) / 512) * 512
    val outB = new Array[Byte](512 + padded)
    System.arraycopy(h, 0, outB, 0, 512)
    System.arraycopy(data, 0, outB, 512, data.length)
    outB
  }

  /** Deterministic tar corpus from the documents table — the q132
    * fixture: each doc becomes a 2-entry archive (its text under
    * docs/, a tiny id-derived metadata file under meta/) closed by the
    * two-zero-block end marker; every id%5==3 archive carries a
    * corrupted checksum on the SECOND entry (entry 0 parses, entry 1
    * surfaces as the ok=0 tail row). */
  def tarCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val e0 = tarEntryBytes(s"docs/$id.txt",
          (if (text == null) "" else text).getBytes("UTF-8"))
        val e1 = tarEntryBytes(s"meta/$id.txt", s"id=$id".getBytes("UTF-8"))
        if (java.lang.Math.floorMod(id, 5L) == 3L)
          e1(148) = (e1(148) ^ 0x07).toByte // break the stored checksum
        (id, e0 ++ e1 ++ new Array[Byte](1024))
    }.toDF("media_id", "payload")
  }

  // ---- ZIP -----------------------------------------------------------

  final case class ZipMember(
      media_id: Long, ent_index: Int, ok: Int, name: String,
      method: Int, n_bytes: Long, crc_ok: Int, text: String)

  private def zle16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def zle32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Inflate one raw-deflate member (ZIP method 8 — no zlib wrapper). */
  private def inflateRaw(b: Array[Byte], off: Int, len: Int,
      expected: Long, maxBytes: Int): Option[Array[Byte]] =
    try {
      if (expected > maxBytes) return None // bomb: declared size alone
      val infl = new java.util.zip.Inflater(true)
      infl.setInput(b, off, len)
      val out = new Array[Byte](expected.toInt)
      var at = 0
      while (at < out.length && !infl.finished()) {
        val n = infl.inflate(out, at, out.length - at)
        if (n == 0 && infl.needsInput()) { infl.end(); return None } // short
        at += n
      }
      val full = at == out.length && { infl.inflate(new Array[Byte](1)) == 0 }
      infl.end()
      if (full) Some(out) else None // longer OR shorter than declared
    } catch { case _: java.util.zip.DataFormatException => None }

  /** Walk one ZIP archive via its CENTRAL DIRECTORY (the authoritative
    * index — local headers are per-member hints; a streaming walk over
    * them misses data descriptors and trusts sizes the directory may
    * contradict). The EOCD record (sig 06054b50) is scanned from the
    * tail through the max 64 KiB comment; each directory entry
    * (02014b50) points at its local header (04034b50), whose OWN
    * name/extra lengths locate the data. Stored (0) and deflate (8)
    * members are extracted and their CRC-32 validated against the
    * directory's; a member that fails (bad local sig, unsupported
    * method, inflate error, size overrun) surfaces ok=0 WITH the
    * directory's name/method kept (the parsed-prefix discipline), and
    * crc_ok=0 distinguishes corruption from structural refusal.
    * Container-level failures (no EOCD, directory overrun) are one
    * ok=0 row. The entry cap emits the `__truncated__` marker row with
    * the uncovered entry count (the parseTar contract). */
  def parseZip(id: Long, b: Array[Byte], maxBytes: Int = 1 << 26,
      maxEntries: Int = 100000): Seq[ZipMember] = {
    def containerFail = Seq(ZipMember(id, 0, 0, "", 0, 0L, 0, ""))
    if (b == null || b.length < 22) return containerFail
    // EOCD scan: last 22..22+65535 bytes
    var e = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (e >= stop && !(b(e) == 0x50 && b(e + 1) == 0x4b &&
        b(e + 2) == 0x05 && b(e + 3) == 0x06)) e -= 1
    if (e < stop) return containerFail
    val nEntries = zle16(b, e + 10)
    val cdSize = zle32(b, e + 12)
    val cdOff = zle32(b, e + 16)
    if (cdOff + cdSize > e) return containerFail
    val out = Seq.newBuilder[ZipMember]
    var p = cdOff.toInt
    var idx = 0
    while (idx < nEntries && idx < maxEntries) {
      if (p + 46 > e || zle32(b, p) != 0x02014b50L) {
        out += ZipMember(id, idx, 0, "", 0, 0L, 0, "")
        return out.result()
      }
      val method = zle16(b, p + 10)
      val crc = zle32(b, p + 16)
      val csize = zle32(b, p + 20)
      val usize = zle32(b, p + 24)
      val nlen = zle16(b, p + 28)
      val xlen = zle16(b, p + 30)
      val clen = zle16(b, p + 32)
      val lho = zle32(b, p + 42)
      if (p + 46 + nlen > e) {
        out += ZipMember(id, idx, 0, "", 0, 0L, 0, "")
        return out.result()
      }
      val name = new String(b, p + 46, nlen, "UTF-8")
      def memberFail(crcOk: Int): ZipMember =
        ZipMember(id, idx, 0, name, method, 0L, crcOk, "")
      // local header: its own nlen/xlen locate the data
      val data: Option[Array[Byte]] =
        if (lho + 30 > b.length || zle32(b, lho.toInt) != 0x04034b50L) None
        else {
          val lp = lho.toInt
          val dataAt = lp + 30 + zle16(b, lp + 26) + zle16(b, lp + 28)
          if (dataAt + csize > b.length) None
          else method match {
            case 0 =>
              if (csize != usize || usize > maxBytes) None
              else Some(java.util.Arrays.copyOfRange(b, dataAt,
                dataAt + usize.toInt))
            case 8 => inflateRaw(b, dataAt, csize.toInt, usize, maxBytes)
            case _ => None
          }
        }
      out += (data match {
        case Some(d) =>
          val c = new java.util.zip.CRC32
          c.update(d)
          if (c.getValue == crc)
            ZipMember(id, idx, 1, name, method, usize, 1, new String(d, "UTF-8"))
          else memberFail(0)
        case None => memberFail(1)
      })
      p += 46 + nlen + xlen + clen
      idx += 1
    }
    if (idx >= maxEntries && idx < nEntries)
      out += ZipMember(id, idx, 0, "__truncated__", 0,
        (nEntries - idx).toLong, 0, "")
    out.result()
  }

  /** Batched ZIP member walk — the decodeTar plan shape (ZIP carries
    * its own per-member compression, so no outer codec layer). */
  def decodeZip(media: DataFrame, partitions: Int = 0,
      maxBytes: Int = 1 << 26, maxEntries: Int = 100000): Dataset[ZipMember] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) => parseZip(id, p, maxBytes, maxEntries) }
  }

  /** Serialize a ZIP archive from (name, bytes, deflate?) members —
    * fixture synthesis with REAL local headers, central directory, and
    * EOCD; CRCs computed, deflate via the raw JDK Deflater. */
  def zipBytes(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val dir = members.map { case (name, data, deflate) =>
      val off = out.size()
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val comp =
        if (!deflate) data
        else {
          val defl = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          defl.setInput(data); defl.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
          defl.end()
          buf.toByteArray
        }
      val nb = name.getBytes("UTF-8")
      w32(0x04034b50L); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // time, date
      w32(crc); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      out.write(nb); out.write(comp)
      (name, nb, crc, comp.length, data.length, deflate, off)
    }
    val cdOff = out.size()
    for ((_, nb, crc, clen, ulen, deflate, off) <- dir) {
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0)
      w32(crc); w32(clen.toLong); w32(ulen.toLong)
      w16(nb.length); w16(0); w16(0)
      w16(0); w16(0) // disk, internal attrs
      w32(0L) // external attrs
      w32(off.toLong)
      out.write(nb)
    }
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0)
    w16(dir.length); w16(dir.length)
    w32(cdSize.toLong); w32(cdOff.toLong)
    w16(0)
    out.toByteArray
  }

  /** Deterministic ZIP corpus from the documents table — the q132
    * fixture shape: each doc becomes a 2-member archive (its text
    * under docs/, DEFLATED when id%2==0 and STORED otherwise — both
    * extraction paths exercised; an id-derived metadata member under
    * meta/, always stored). Error plants over id arithmetic:
    *   id%5==3  the SECOND member's directory CRC is flipped (member 0
    *            extracts, member 1 surfaces ok=0 crc_ok=0 with name +
    *            method kept)
    *   id%7==2  the EOCD signature is broken (container-level ok=0) */
  def zipCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val body = (if (text == null) "" else text).getBytes("UTF-8")
        val z = zipBytes(Seq(
          (s"docs/$id.txt", body, java.lang.Math.floorMod(id, 2L) == 0L),
          (s"meta/$id.json", s"""{"id":$id}""".getBytes("UTF-8"), false)))
        if (java.lang.Math.floorMod(id, 5L) == 3L) {
          // central directory: entry 1's CRC field; the directory sits at
          // the tail, entry 0 first — find the second 02014b50 from cdOff
          var p = z.length - 22
          while (!(z(p) == 0x50 && z(p + 1) == 0x4b && z(p + 2) == 0x05 &&
            z(p + 3) == 0x06)) p -= 1
          var cd = ((z(p + 16) & 0xffL) | ((z(p + 17) & 0xffL) << 8) |
            ((z(p + 18) & 0xffL) << 16) | ((z(p + 19) & 0xffL) << 24)).toInt
          // skip entry 0: 46 + nlen + xlen + clen
          cd += 46 + ((z(cd + 28) & 0xff) | ((z(cd + 29) & 0xff) << 8)) +
            ((z(cd + 30) & 0xff) | ((z(cd + 31) & 0xff) << 8)) +
            ((z(cd + 32) & 0xff) | ((z(cd + 33) & 0xff) << 8))
          z(cd + 16) = (z(cd + 16) ^ 0x2a).toByte
        }
        if (java.lang.Math.floorMod(id, 7L) == 2L) {
          var p = z.length - 22
          while (!(z(p) == 0x50 && z(p + 1) == 0x4b && z(p + 2) == 0x05 &&
            z(p + 3) == 0x06)) p -= 1
          z(p + 3) = 0x07
        }
        (id, z)
    }.toDF("media_id", "payload")
  }

  // ---- NDJSON (jsonl) ------------------------------------------------

  final case class JsonlLine(media_id: Long, line_no: Int, ok: Int, line: String)

  /** Batched NDJSON line walk over a binary media frame — the
    * `.jsonl.zst` / `.jsonl.gz` corpus-distribution layout (one JSON
    * object per line). The walk splits lines only; parsing is the
    * caller's `from_json` so schema stays declarative and Catalyst-
    * optimizable. An uninflatable member is a container-level ok=0
    * row (kept). Trailing newline tolerated; interior empty lines
    * preserved as empty-string rows (an audit counts them). */
  def decodeJsonl(media: DataFrame, partitions: Int = 0,
      codec: String = "", maxBytes: Int = 1 << 26): Dataset[JsonlLine] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        inflate(p, codec, maxBytes) match {
          case Some(bytes) =>
            val text = new String(bytes, "UTF-8")
            val body = if (text.endsWith("\n")) text.dropRight(1) else text
            if (body.isEmpty) Seq.empty
            else body.split("\n", -1).toSeq.zipWithIndex.map {
              case (l, i) => JsonlLine(id, i, 1, l)
            }
          case None => Seq(JsonlLine(id, 0, 0, ""))
        }
      }
  }

  /** Deterministic `.jsonl.zst` corpus from the documents table — the
    * q130/q154 pattern for the NDJSON container: each doc becomes a
    * 2-line NDJSON member (its text + an id-derived metadata record,
    * hand-escaped JSON so the decode side's REAL from_json parse is
    * cross-derived, not a to_json replay) zstd-compressed; every
    * id%3==0 member carries the checksum-guaranteed corrupt flips. */
  def jsonlZstCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        def esc(s: String): String = {
          val sb = new StringBuilder("\"")
          s.foreach {
            case '"' => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case '\t' => sb.append("\\t")
            case c if c < 0x20 => sb.append("\\u%04x".format(c.toInt))
            case c => sb.append(c)
          }
          sb.append('"').toString
        }
        val t = if (text == null) "" else text
        val ndjson = Seq(
          s"""{"rec_id": $id, "part": 0, "body": ${esc(t)}}""",
          s"""{"rec_id": $id, "part": 1, "body": ${esc(s"meta-$id")}}""")
          .mkString("", "\n", "\n")
        val b = Zstd.compress(ndjson.getBytes("UTF-8"))
        if (java.lang.Math.floorMod(id, 3L) == 0L) {
          b(b.length / 2) = (b(b.length / 2) ^ 0x55).toByte
          b(b.length - 2) = (b(b.length - 2) ^ 0x55).toByte
        }
        (id, b)
    }.toDF("media_id", "payload")
  }

  // ---- on-disk loader ----------------------------------------------

  /** Load a directory of container files as a binary media frame — the
    * Spark `binaryFile` source with the (media_id, payload) shape the
    * decoders expect; media_id is the path hash (stable, join-able
    * back through `path`). The source parallelizes across files, so a
    * directory of bounded crawl segments IS the 100 TB ingest layout. */
  def readBinaryMedia(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(xxhash64(col("path")).as("media_id"), col("path"),
        col("content").as("payload"))

  /** The crawl-ingest composition in one call: WARC responses ->
    * canonical URL + HTML-extracted text — rows ready for the curation
    * pipeline's (doc_id, source, text) contract (doc_id = hash of the
    * canonical URL; source = registrable domain). `codec` as in
    * [[decodeWarc]] ("zstd" for .warc.zst, "auto" for mixed segment
    * directories; takes precedence over the legacy flag). */
  def warcDocs(media: DataFrame, gzipped: Boolean = false,
      codec: String = "",
      trustCrossSiteCanonicals: Boolean = false): DataFrame =
    warcDocsFromRecords(
      decodeWarc(media, gzipped = gzipped, codec = codec).toDF(),
      trustCrossSiteCanonicals)

  /** [[warcDocs]] from an already-decoded [[WarcRecord]] frame — the
    * one-pass hook for callers that need BOTH the documents and a
    * record-level rollup (the daily loop's encoding audit): decode
    * once, persist the records, derive both. */
  def warcDocsFromRecords(records: DataFrame,
      trustCrossSiteCanonicals: Boolean = false): DataFrame =
    records
      // payload_err rows (chunk-framing violations, undecodable or
      // unsupported content codings / charsets) are refusals:
      // ingesting them would mint empty/garbage documents under real
      // identities
      .where(col("ok") === 1 && col("warc_type") === "response" &&
        col("payload_err") === "")
      // crawl identity: the page's OWN <link rel=canonical> (normalized)
      // beats the request URL — tracking-parameter variants of one page
      // fold to one document (q192's rule applied at ingest). An
      // absolute canonical qualifies ONLY when its host matches the
      // request URL's host: any crawled response can declare
      // href="http://victim.com/x", and with doc_id = hash(canonical)
      // plus latest-row-wins folding downstream, an unverified
      // cross-site canonical is a dedup-hijack / content-poisoning
      // vector at ingest. Legitimate mirror folds are the explicit
      // `trustCrossSiteCanonicals` opt-in (curated mirror lists, not
      // raw crawl). The very common ROOT-RELATIVE form ("/", "/index")
      // resolves against the request's scheme://host — passed raw to
      // normalizeUrl it would collapse unrelated pages ACROSS SITES
      // onto one identity. Anything else (path-relative, empty) keeps
      // the normalized request URL.
      .select(col("url"), col("body"), {
        val canon = graft.text.Html.canonicalLink(col("body"))
        val reqAuth = regexp_extract(col("url"),
          "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
        val sameHost =
          if (trustCrossSiteCanonicals) lit(true)
          else graft.text.Urls.urlHost(canon) ===
            graft.text.Urls.urlHost(col("url")) &&
            length(graft.text.Urls.urlHost(col("url"))) > 0
        coalesce(
          when(canon.rlike("^[A-Za-z][A-Za-z0-9+.-]*://") && sameHost,
            graft.text.Urls.normalizeUrl(canon)),
          when(canon.rlike("^/([^/]|$)") && length(reqAuth) > 0,
            graft.text.Urls.normalizeUrl(concat(reqAuth, canon))),
          graft.text.Urls.normalizeUrl(col("url"))).as("url_norm")
      })
      .select(
        xxhash64(col("url_norm")).as("doc_id"),
        graft.text.Urls.urlDomain(col("url")).as("source"),
        graft.text.Html.htmlToText(col("body")).as("text"),
        col("url_norm"))

  /** The standing ENCODING AUDIT over a decoded record frame — the
    * q202 (coding) and q204 (charset) rollups as one reusable
    * aggregation: records and decoded text volume per (declared
    * coding chain, charset, refusal tag). One hash-aggregated groupBy
    * with map-side combine; at 100 TB this rides the same pass that
    * extracts the documents (see [[warcDocsFromRecords]]), so the
    * drift signal costs no second read of the payload bytes. */
  def encodingAudit(records: DataFrame): DataFrame =
    records.where(col("warc_type") === "response")
      .groupBy(col("payload_enc"), col("charset"), col("payload_err"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("body")).cast("long")).as("decoded_chars"))

  /** ZIP archives -> document rows ([[warcDocs]]'s shape for the
    * dataset-dump distribution layout: one archive of text members per
    * landed file). Extracted, CRC-valid members with non-empty bodies
    * become documents: doc_id = hash of the member name (a member
    * re-landing under the same name on a later day is a CHANGED
    * document under the snapshot's latest-row-wins rule), source = the
    * member's top-level directory ("" when flat). Failed members and
    * container-level refusals are dropped here — the audit that counts
    * them is [[decodeZip]] itself (the q167 gate). */
  def zipDocs(media: DataFrame, maxBytes: Int = 1 << 26,
      maxEntries: Int = 100000): DataFrame =
    decodeZip(media, maxBytes = maxBytes, maxEntries = maxEntries).toDF()
      .where(col("ok") === 1 && col("crc_ok") === 1 && length(col("text")) > 0)
      .select(
        xxhash64(col("name")).as("doc_id"),
        when(col("name").contains("/"),
          substring_index(col("name"), "/", 1)).otherwise(lit("")).as("source"),
        col("text"),
        col("name").as("member_name"))
}
