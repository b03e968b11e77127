package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF ingestion (ISO 32000-1, the public PDF 1.x specification) — the
  * dominant DOCUMENT format of any web crawl, previously opaque bytes.
  * Covers the real storage layer end-to-end: the object lexer/parser
  * (dicts, arrays, names with #-escapes, literal strings with the full
  * escape set, hex strings, indirect references, streams with indirect
  * /Length), classic cross-reference TABLES with /Prev chains, PDF
  * 1.5+ cross-reference STREAMS (/W field widths, /Index subsections,
  * newest-entry-wins across the chain), compressed-object streams
  * (/Type /ObjStm type-2 entries), FlateDecode (zlib) with the PNG
  * row predictors (/Predictor >= 10, Sub/Up/Average/Paeth), the page
  * tree walk (/Pages /Kids recursion), and content-stream text
  * extraction.
  *
  * Text-assembly convention (frozen): Tj / ' / " / TJ append their
  * show strings in stream order (TJ's kern numbers contribute
  * nothing; ' and " prepend a newline — they mean next-line-show);
  * every ET appends one newline; extracted bytes decode as UTF-8.
  *
  * Error families (the q140 tagged-refusal discipline): container
  * level "not_pdf" / "truncated" / "bad_xref" / "bad_object" /
  * "encrypted" (an /Encrypt trailer classifies fine but text refuses
  * — decrypting is out of scope, loudly); per-page
  * "unsupported_filter" (any filter beyond none/FlateDecode, e.g.
  * LZW/DCT) / "bad_stream" / "inline_image" / "unsupported_font" (a
  * Type0/CID font without /ToUnicode, an unknown /Differences glyph
  * name, or an unmapped CMap code — never mojibake) keep the walk
  * alive for the other pages.
  *
  * Reference behavior documented from the reference repo's opaque
  * media round-trips (s3_loader.py:33-62) — the reference never
  * decodes; the decode layer is engine-added surface. */
object Pdf {

  private final class Bad(val tag: String)
    extends RuntimeException(null, null, false, false)
  private def bad(tag: String): Nothing = throw new Bad(tag)

  // ---- object model ----------------------------------------------------

  private[multimodal] sealed trait PObj
  private[multimodal] final case class PNum(v: Double) extends PObj {
    def toInt: Int = { val i = v.toInt; if (i.toDouble != v) bad("bad_object"); i }
    def toLong: Long = { val l = v.toLong; if (l.toDouble != v) bad("bad_object"); l }
  }
  private[multimodal] final case class PName(s: String) extends PObj
  private[multimodal] final case class PStr(bytes: Array[Byte]) extends PObj
  private[multimodal] final case class PArr(items: Vector[PObj]) extends PObj
  private[multimodal] final case class PDict(m: Map[String, PObj]) extends PObj
  private[multimodal] final case class PRef(num: Int) extends PObj
  private[multimodal] final case class PKeyword(s: String) extends PObj
  private[multimodal] case object PNull extends PObj
  private[multimodal] final case class PBool(v: Boolean) extends PObj
  /** `num`/`gen` carry the stream's OWN object id — the standard
    * security handler's per-object key needs them at decode time. */
  private[multimodal] final case class PStream(dict: PDict,
    raw: Array[Byte], num: Int = 0, gen: Int = 0) extends PObj

  // ---- lexer / object parser -------------------------------------------

  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  private[multimodal] final class Lexer(val b: Array[Byte], var pos: Int,
      val end: Int) {
    def skipWs(): Unit = {
      var going = true
      while (going && pos < end) {
        val c = b(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (pos < end && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else going = false
      }
    }
    def peek: Int = if (pos < end) b(pos) & 0xff else -1
    private def bareToken(): String = {
      val s = pos
      while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff))
        pos += 1
      if (pos == s) bad("bad_object")
      new String(b, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII)
    }
    private def name(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff)) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < end) {
          val h = Character.digit(b(pos + 1), 16) * 16 +
            Character.digit(b(pos + 2), 16)
          if (h < 0) bad("bad_object")
          sb.append(h.toChar); pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }
    private def literalString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= end) bad("truncated")
        val c = b(pos) & 0xff
        pos += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            if (pos >= end) bad("truncated")
            val e = b(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (pos < end && b(pos) == '\n') pos += 1 // continuation
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < end && b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: drop the backslash
            }
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }
    private def hexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (pos >= end) bad("truncated")
        val c = b(pos) & 0xff
        pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi * 16) // odd final digit: trailing 0
          done = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) bad("bad_object")
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
      }
      PStr(out.toByteArray)
    }
    // nesting depth across dict/array recursion: an adversarial file
    // of thousands of '<<' or '[' would otherwise StackOverflow past
    // the Bad/AIOOBE catches and crash the task instead of refusing
    // (the pages-walk has the same depth-64 guard)
    private var nest = 0
    /** One object value. `allowRef` enables the "N G R" indirect-
      * reference lookahead (off inside content streams, where bare
      * numbers precede operators). */
    def value(allowRef: Boolean): PObj = {
      skipWs()
      if (pos >= end) bad("truncated")
      (b(pos) & 0xff) match {
        case '<' =>
          if (pos + 1 < end && b(pos + 1) == '<') {
            pos += 2
            nest += 1
            if (nest > 64) bad("bad_object")
            var m = Map.empty[String, PObj]
            var done = false
            while (!done) {
              skipWs()
              if (pos + 1 < end && b(pos) == '>' && b(pos + 1) == '>') {
                pos += 2; done = true
              } else {
                if (peek != '/') bad("bad_object")
                val k = name().s
                m += (k -> value(allowRef))
              }
            }
            nest -= 1
            PDict(m)
          } else hexString()
        case '(' => literalString()
        case '[' =>
          pos += 1
          nest += 1
          if (nest > 64) bad("bad_object")
          var items = Vector.empty[PObj]
          var done = false
          while (!done) {
            skipWs()
            if (peek == ']') { pos += 1; done = true }
            else items :+= value(allowRef)
          }
          nest -= 1
          PArr(items)
        case '/' => name()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val s = pos
          pos += 1
          while (pos < end && { val d = b(pos) & 0xff
            (d >= '0' && d <= '9') || d == '.' || d == '+' || d == '-' }) pos += 1
          val numStr = new String(b, s, pos - s,
            java.nio.charset.StandardCharsets.US_ASCII)
          val num = try numStr.toDouble catch {
            case _: NumberFormatException => bad("bad_object") }
          if (allowRef && num >= 0 && num == num.floor && c != '+' &&
              c != '-' && c != '.') {
            // lookahead for "GEN R"
            val save = pos
            skipWs()
            val s2 = pos
            while (pos < end && b(pos) >= '0' && b(pos) <= '9') pos += 1
            if (pos > s2) {
              skipWs()
              if (pos < end && b(pos) == 'R' &&
                  (pos + 1 >= end || isWs(b(pos + 1) & 0xff) ||
                    isDelim(b(pos + 1) & 0xff))) {
                pos += 1
                return PRef(num.toInt)
              }
            }
            pos = save
          }
          PNum(num)
        case _ =>
          bareToken() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case kw => PKeyword(kw)
          }
      }
    }
  }

  // ---- filters ----------------------------------------------------------

  /** zlib inflate (FlateDecode). None on malformation/overrun. */
  private def flate(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] =
    try {
      val infl = new java.util.zip.Inflater()
      infl.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(data.length * 4, 64), 1 << 16))
      val tmp = new Array[Byte](8192)
      while (!infl.finished()) {
        val n = infl.inflate(tmp)
        if (n == 0 && (infl.needsInput() || infl.needsDictionary())) return None
        out.write(tmp, 0, n)
        if (out.size() > maxBytes) return None
      }
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }

  /** PNG row predictors over 1-byte samples (the /Predictor >= 10
    * convention xref streams actually use). */
  private def pngUnpredict(data: Array[Byte], columns: Int): Option[Array[Byte]] = {
    if (columns <= 0 || data.length % (columns + 1) != 0) return None
    val rows = data.length / (columns + 1)
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * (columns + 1)) & 0xff
      var x = 0
      while (x < columns) {
        val raw = data(r * (columns + 1) + 1 + x) & 0xff
        val left = if (x > 0) out(r * columns + x - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * columns + x) & 0xff else 0
        val ul = if (x > 0 && r > 0) out((r - 1) * columns + x - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(r * columns + x) = (v & 0xff).toByte
        x += 1
      }
      r += 1
    }
    Some(out)
  }

  // ---- document --------------------------------------------------------

  private sealed trait XEntry
  private final case class Direct(offset: Long) extends XEntry
  private final case class InStm(objStm: Int, idx: Int) extends XEntry
  private case object Free extends XEntry

  /** A parsed document: xref map + trailer + lazy object resolution. */
  private[multimodal] final class Doc(val b: Array[Byte], val version: String,
      val trailer: PDict, entries: Map[Int, XEntry], maxBytes: Int) {
    private val cache = scala.collection.mutable.HashMap.empty[Int, PObj]
    private val inProgress = scala.collection.mutable.HashSet.empty[Int]

    def nObjects: Long = trailer.m.get("Size") match {
      case Some(n: PNum) => n.toLong
      case _ => bad("bad_xref")
    }
    def encrypted: Boolean = trailer.m.contains("Encrypt")

    /** The standard-security-handler decryptor: None = no /Encrypt;
      * Bad("encrypted") when /Encrypt exists but the configuration is
      * unsupported or the EMPTY user password fails /U — either way
      * ciphertext must never flow as text. */
    lazy val crypt: Option[PdfCrypt.Std] = trailer.m.get("Encrypt").map { e =>
      val d = resolve(e) match {
        case d: PDict => d
        case _ => bad("encrypted")
      }
      val id0 = resolve(trailer.m.getOrElse("ID", PNull)) match {
        case PArr(items) if items.nonEmpty => resolve(items.head) match {
          case PStr(bs) => bs
          case _ => Array.empty[Byte]
        }
        case _ => Array.empty[Byte]
      }
      PdfCrypt.fromDict(d.m, id0, resolve).getOrElse(bad("encrypted"))
    }

    def get(num: Int): PObj = cache.getOrElseUpdate(num, {
      if (!inProgress.add(num)) bad("bad_object") // reference cycle
      try entries.get(num) match {
        case Some(Direct(off)) => parseAt(off)
        case Some(InStm(stm, idx)) => fromObjStm(stm, idx)
        case _ => PNull
      } finally inProgress.remove(num)
    })

    def resolve(o: PObj): PObj = o match {
      case PRef(n) => resolve(get(n))
      case other => other
    }

    private def parseAt(off: Long): PObj = {
      if (off < 0 || off >= b.length) bad("bad_xref")
      val lex = new Lexer(b, off.toInt, b.length)
      val n1 = lex.value(allowRef = false)
      val n2 = lex.value(allowRef = false)
      val kw = lex.value(allowRef = false)
      (n1, n2, kw) match {
        case (_: PNum, _: PNum, PKeyword("obj")) => ()
        case _ => bad("bad_xref")
      }
      val v = lex.value(allowRef = true)
      lex.skipWs()
      // stream? the keyword follows the dict
      val save = lex.pos
      v match {
        case d: PDict if lex.peek == 's' =>
          val kw2 = try lex.value(allowRef = false) catch { case _: Bad => PNull }
          kw2 match {
            case PKeyword("stream") =>
              // data begins after CRLF or LF
              if (lex.pos < b.length && b(lex.pos) == '\r') lex.pos += 1
              if (lex.pos >= b.length || b(lex.pos) != '\n') bad("bad_object")
              lex.pos += 1
              val len = resolve(d.m.getOrElse("Length", bad("bad_object"))) match {
                case n: PNum => n.toInt
                case _ => bad("bad_object")
              }
              if (len < 0 || lex.pos + len > b.length) bad("truncated")
              val raw = java.util.Arrays.copyOfRange(b, lex.pos, lex.pos + len)
              val (num, gen) = (n1, n2) match {
                case (a: PNum, g: PNum) => (a.toInt, g.toInt)
                case _ => (0, 0)
              }
              PStream(d, raw, num, gen)
            case _ => lex.pos = save; v
          }
        case _ => v
      }
    }

    /** Decode a stream's data through its filter chain. Left = the
      * per-page error tag ("unsupported_filter" / "bad_stream"). */
    def decodeStream(s: PStream): Either[String, Array[Byte]] = {
      val filters = resolve(s.dict.m.getOrElse("Filter", PNull)) match {
        case PNull => Seq.empty
        case PName(n) => Seq(n)
        case PArr(items) => items.map {
          case PName(n) => n
          case _ => return Left("bad_stream")
        }
        case _ => return Left("bad_stream")
      }
      if (filters.exists(_ != "FlateDecode")) return Left("unsupported_filter")
      var data = s.raw
      // decryption is the OUTERMOST layer: ciphertext off first, then
      // filters. XRef streams are never encrypted (§7.5.8.2). When
      // /Encrypt exists but no key is derivable (passworded /
      // unsupported handler), the stream refuses — raw ciphertext
      // through flate would be garbage-or-crash, never data
      if (resolve(s.dict.m.getOrElse("Type", PNull)) != PName("XRef")) {
        val cr = try crypt catch { case _: Bad => return Left("encrypted") }
        cr.foreach { c =>
          data = c.decrypt(data, s.num, s.gen)
            .getOrElse(return Left("bad_stream"))
        }
      }
      for (_ <- filters) {
        data = flate(data, maxBytes).getOrElse(return Left("bad_stream"))
      }
      resolve(s.dict.m.getOrElse("DecodeParms", PNull)) match {
        case PDict(pm) =>
          (pm.get("Predictor"), pm.get("Columns")) match {
            case (Some(p: PNum), _) if p.v < 2 => ()
            case (Some(p: PNum), Some(c: PNum)) if p.v >= 10 =>
              data = pngUnpredict(data, c.toInt)
                .getOrElse(return Left("bad_stream"))
            case (Some(_), _) => return Left("unsupported_filter")
            case (None, _) => ()
          }
        case PNull => ()
        case _ => return Left("bad_stream")
      }
      Right(data)
    }

    private def fromObjStm(stmNum: Int, idx: Int): PObj = {
      get(stmNum) match {
        case s: PStream
          if resolve(s.dict.m.getOrElse("Type", PNull)) == PName("ObjStm") =>
          val data = decodeStream(s) match {
            case Right(d) => d
            case Left(t) => bad(t)
          }
          val n = resolve(s.dict.m.getOrElse("N", PNull)) match {
            case x: PNum => x.toInt; case _ => bad("bad_object") }
          val first = resolve(s.dict.m.getOrElse("First", PNull)) match {
            case x: PNum => x.toInt; case _ => bad("bad_object") }
          if (idx < 0 || idx >= n) bad("bad_xref")
          val hdr = new Lexer(data, 0, data.length)
          var off = -1
          var k = 0
          while (k <= idx) {
            hdr.value(allowRef = false) // object number (unused here)
            val o = hdr.value(allowRef = false) match {
              case x: PNum => x.toInt; case _ => bad("bad_object") }
            if (k == idx) off = o
            k += 1
          }
          if (first + off >= data.length) bad("truncated")
          new Lexer(data, first + off, data.length).value(allowRef = true)
        case _ => bad("bad_xref")
      }
    }
  }

  // ---- standard security handler (ISO 32000-1 §7.6) ---------------------

  /** RC4/MD5 primitives + the standard security handler's key
    * derivation — shared by the reader (transparent empty-user-
    * password decryption) and the fixture writer (/O and /U
    * generation). Supports V 1/2 (RC4 40-128 bit) and V 4 with a V2
    * (RC4) or AESV2 (AES-128-CBC) crypt filter, R 2/3/4. Anything
    * else — or a real user password — refuses "encrypted". */
  private[multimodal] object PdfCrypt {
    /** The 32-byte password pad (ISO 32000-1 §7.6.3.3, a spec
      * constant). */
    val Pad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
      0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
      0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

    def md5(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(b)

    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val s = Array.tabulate(256)(_.toByte)
      var j = 0
      var i = 0
      while (i < 256) {
        j = (j + s(i) + key(i % key.length)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        i += 1
      }
      val out = new Array[Byte](data.length)
      i = 0; j = 0
      var n = 0
      while (n < data.length) {
        i = (i + 1) & 0xff
        j = (j + s(i)) & 0xff
        val t = s(i); s(i) = s(j); s(j) = t
        out(n) = (data(n) ^ s((s(i) + s(j)) & 0xff)).toByte
        n += 1
      }
      out
    }

    def padPw(pw: Array[Byte]): Array[Byte] = (pw.take(32) ++ Pad).take(32)

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

    /** Algorithm 2: the file encryption key from a user password. */
    def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int,
        id0: Array[Byte], r: Int, keyLen: Int,
        encryptMetadata: Boolean = true): Array[Byte] = {
      val noMeta = if (r >= 4 && !encryptMetadata)
        Array.fill[Byte](4)(0xff.toByte) else Array.empty[Byte]
      var h = md5(padPw(userPw) ++ o.take(32) ++ le32(p) ++ id0 ++ noMeta)
      if (r >= 3) { var i = 0; while (i < 50) { h = md5(h.take(keyLen)); i += 1 } }
      h.take(keyLen)
    }

    /** Algorithm 3: the /O value from the owner + user passwords. */
    def oValue(ownerPw: Array[Byte], userPw: Array[Byte], r: Int,
        keyLen: Int): Array[Byte] = {
      var h = md5(padPw(ownerPw))
      if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
      val k = h.take(keyLen)
      var v = rc4(k, padPw(userPw))
      if (r >= 3) for (i <- 1 to 19)
        v = rc4(k.map(b => (b ^ i).toByte), v)
      v
    }

    /** Algorithm 4 (R2) / 5 (R≥3): the /U value from the file key. */
    def uValue(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
      if (r == 2) rc4(key, Pad)
      else {
        var v = rc4(key, md5(Pad ++ id0))
        for (i <- 1 to 19) v = rc4(key.map(b => (b ^ i).toByte), v)
        v ++ new Array[Byte](16) // 16 bytes of arbitrary padding
      }

    /** Algorithm 1: the per-object key. */
    def objKey(fileKey: Array[Byte], num: Int, gen: Int,
        aes: Boolean): Array[Byte] = {
      val ext = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte) ++
        (if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte])
      md5(fileKey ++ ext).take(math.min(fileKey.length + 5, 16))
    }

    /** AES-128-CBC with the 16-byte IV prefix and PKCS#5 padding (the
      * AESV2 stream layout). None on any structural violation. */
    def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] = {
      if (data.length < 32 || data.length % 16 != 0) return None
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data, 16, data.length - 16)
        val padN = plain.last & 0xff
        if (padN < 1 || padN > 16 || padN > plain.length) None
        else Some(java.util.Arrays.copyOfRange(plain, 0, plain.length - padN))
      } catch { case _: java.security.GeneralSecurityException => None }
    }

    /** Fixture-side AES encrypt (IV prefix + PKCS#5). */
    def aesEncrypt(key: Array[Byte], iv: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }

    /** A verified decryptor (file key + cipher family). */
    final case class Std(key: Array[Byte], aes: Boolean) {
      def decrypt(data: Array[Byte], num: Int, gen: Int): Option[Array[Byte]] = {
        val k = objKey(key, num, gen, aes)
        if (aes) aesDecrypt(k, data) else Some(rc4(k, data))
      }
    }

    /** Build a decryptor from the /Encrypt dictionary IF the handler
      * is the standard one, the configuration is supported, and the
      * EMPTY user password verifies against /U. None = refuse
      * "encrypted" (passworded or unsupported — either way the bytes
      * must not flow). */
    def fromDict(m: Map[String, PObj], id0: Array[Byte],
        resolve: PObj => PObj): Option[Std] = {
      def int(k: String): Option[Int] = resolve(m.getOrElse(k, PNull)) match {
        // P is sometimes serialized as the unsigned form of the
        // negative permissions int — fold both to the signed 32-bit
        case n: PNum if n.v.isWhole => Some((n.v.toLong & 0xffffffffL).toInt)
        case _ => None
      }
      def str(k: String): Option[Array[Byte]] =
        resolve(m.getOrElse(k, PNull)) match {
          case PStr(bs) => Some(bs)
          case _ => None
        }
      if (resolve(m.getOrElse("Filter", PNull)) != PName("Standard")) return None
      val r = int("R").getOrElse(return None)
      if (r < 2 || r > 4) return None
      val o = str("O").getOrElse(return None)
      val u = str("U").getOrElse(return None)
      val p = int("P").getOrElse(return None)
      val encMeta = resolve(m.getOrElse("EncryptMetadata", PBool(true))) match {
        case PBool(x) => x
        case _ => true
      }
      val (aes, keyLen) = int("V").getOrElse(0) match {
        case 1 => (false, 5)
        case 2 =>
          val bits = int("Length").getOrElse(40)
          if (bits < 40 || bits > 128 || bits % 8 != 0) return None
          (false, bits / 8)
        case 4 =>
          val cf = resolve(m.getOrElse("CF", PNull)) match {
            case d: PDict => d.m
            case _ => return None
          }
          val stmf = resolve(m.getOrElse("StmF", PName("Identity"))) match {
            case PName(s) => s
            case _ => return None
          }
          val cfe = cf.get(stmf).map(resolve) match {
            case Some(d: PDict) => d.m
            case _ => return None
          }
          cfe.get("CFM").map(resolve) match {
            case Some(PName("AESV2")) => (true, 16)
            case Some(PName("V2")) =>
              // CF /Length is bytes per spec; tolerate the common
              // bits-valued writer bug
              val n = (cfe.get("Length").map(resolve) match {
                case Some(x: PNum) => x.toInt
                case _ => 16
              }) match { case b if b >= 40 => b / 8; case b => b }
              if (n < 5 || n > 16) return None
              (false, n)
            case _ => return None
          }
        case _ => return None
      }
      val key = fileKey(Array.empty, o, p, id0, r, keyLen, encMeta)
      val exp = uValue(key, id0, r)
      val cmp = if (r == 2) 32 else 16
      if (u.length < cmp ||
          !java.util.Arrays.equals(exp.take(cmp), u.take(cmp))) None
      else Some(Std(key, aes))
    }
  }

  /** Parse header + the xref chain. Left = container refusal tag. */
  private[multimodal] def open(b: Array[Byte],
      maxBytes: Int = 1 << 26): Either[String, Doc] =
    try {
      if (b == null || b.length < 16) return Left("not_pdf")
      val head = new String(b, 0, 8, java.nio.charset.StandardCharsets.US_ASCII)
      if (!head.startsWith("%PDF-")) return Left("not_pdf")
      val version = head.stripPrefix("%PDF-").takeWhile(c =>
        c.isDigit || c == '.')
      if (version.isEmpty) return Left("not_pdf")
      // locate the LAST "startxref" in the tail
      val tailStart = math.max(0, b.length - 2048)
      val tail = new String(b, tailStart, b.length - tailStart,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) return Left("truncated")
      val lex0 = new Lexer(b, tailStart + sx + "startxref".length, b.length)
      val off0 = lex0.value(allowRef = false) match {
        case n: PNum => n.toLong
        case _ => return Left("truncated")
      }
      // walk the /Prev chain, newest entries win
      var entries = Map.empty[Int, XEntry]
      var trailer: PDict = null
      var off = off0
      var hops = 0
      // a first pass records stream-xref objects so Doc.get can reach
      // them before the Doc exists: collect (dict, raw) per hop
      while (off >= 0) {
        hops += 1
        if (hops > 64) bad("bad_xref")
        if (off >= b.length) bad("bad_xref")
        val lex = new Lexer(b, off.toInt, b.length)
        lex.skipWs()
        if (lex.peek == 'x') {
          // classic table
          lex.value(allowRef = false) match {
            case PKeyword("xref") => ()
            case _ => bad("bad_xref")
          }
          var t: PDict = null
          while (t == null) {
            lex.skipWs()
            if (lex.peek == 't') {
              lex.value(allowRef = false) match {
                case PKeyword("trailer") => ()
                case _ => bad("bad_xref")
              }
              lex.value(allowRef = true) match {
                case d: PDict => t = d
                case _ => bad("bad_xref")
              }
            } else {
              val start = lex.value(allowRef = false) match {
                case n: PNum => n.toInt; case _ => bad("bad_xref") }
              val count = lex.value(allowRef = false) match {
                case n: PNum => n.toInt; case _ => bad("bad_xref") }
              if (count < 0 || count > (1 << 22)) bad("bad_xref")
              lex.skipWs()
              var k = 0
              while (k < count) {
                if (lex.pos + 18 > b.length) bad("truncated")
                val entry = new String(b, lex.pos, 18,
                  java.nio.charset.StandardCharsets.US_ASCII)
                val ten = entry.substring(0, 10)
                val tpe = entry.charAt(17)
                if (!ten.forall(_.isDigit)) bad("bad_xref")
                val num = start + k
                if (!entries.contains(num)) {
                  entries += num -> (if (tpe == 'n') Direct(ten.toLong)
                    else if (tpe == 'f') Free else bad("bad_xref"))
                }
                lex.pos += 18
                // entry terminator: exactly 2 bytes of SP/CR/LF
                lex.pos += 2
                k += 1
              }
            }
          }
          if (trailer == null) trailer = t
          off = t.m.get("Prev") match {
            case Some(n: PNum) => n.toLong
            case _ => -1
          }
        } else {
          // xref STREAM: "N G obj << /Type /XRef ... >> stream"
          val probe = new Doc(b, version, PDict(Map.empty),
            Map(Int.MaxValue -> Direct(off)), maxBytes)
          val s = probe.get(Int.MaxValue) match {
            case st: PStream
              if st.dict.m.get("Type").contains(PName("XRef")) => st
            case _ => bad("bad_xref")
          }
          val data = probe.decodeStream(s) match {
            case Right(d) => d
            case Left(t) => bad(t)
          }
          val w = s.dict.m.get("W") match {
            case Some(PArr(items)) if items.length == 3 => items.map {
              case n: PNum => n.toInt
              case _ => bad("bad_xref")
            }
            case _ => bad("bad_xref")
          }
          if (w.exists(x => x < 0 || x > 8)) bad("bad_xref")
          val rowLen = w.sum
          if (rowLen <= 0) bad("bad_xref")
          val size = s.dict.m.get("Size") match {
            case Some(n: PNum) => n.toInt
            case _ => bad("bad_xref")
          }
          val index: Seq[(Int, Int)] = s.dict.m.get("Index") match {
            case Some(PArr(items)) if items.length % 2 == 0 =>
              items.grouped(2).map {
                case Vector(a: PNum, c: PNum) => (a.toInt, c.toInt)
                case _ => bad("bad_xref")
              }.toSeq
            case None => Seq((0, size))
            case _ => bad("bad_xref")
          }
          var p = 0
          def field(width: Int): Long = {
            var v = 0L
            var k = 0
            while (k < width) { v = (v << 8) | (data(p) & 0xffL); p += 1; k += 1 }
            v
          }
          for ((start, count) <- index) {
            var k = 0
            while (k < count) {
              if (p + rowLen > data.length) bad("bad_xref")
              val t = if (w(0) == 0) 1L else field(w(0))
              val f2 = field(w(1))
              val f3 = field(w(2))
              val num = start + k
              if (!entries.contains(num)) {
                entries += num -> (t match {
                  case 0 => Free
                  case 1 => Direct(f2)
                  case 2 => InStm(f2.toInt, f3.toInt)
                  case _ => bad("bad_xref")
                })
              }
              k += 1
            }
          }
          if (trailer == null) trailer = s.dict
          off = s.dict.m.get("Prev") match {
            case Some(n: PNum) => n.toLong
            case _ => -1
          }
        }
      }
      Right(new Doc(b, version, trailer, entries, maxBytes))
    } catch {
      case e: Bad => Left(e.tag)
      case _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => Left("truncated")
    }

  // ---- fonts -------------------------------------------------------------

  /** A font's show-string decoding (ISO 32000-1 §9.6-9.10). Real-world
    * PDFs overwhelmingly show text through /Encoding differences or
    * CID fonts with /ToUnicode CMaps — freezing show bytes as UTF-8
    * (the [[FRaw]] legacy, kept for fonts that declare neither) turns
    * those into mojibake. Covered: /WinAnsiEncoding and
    * /MacRomanEncoding byte maps (the cp1252 / x-MacRoman supersets —
    * JDK charsets, byte-exact for every defined code), /Encoding dicts
    * with /Differences arrays (glyph names resolved through uniXXXX +
    * a Latin-1-ish AGL subset), and /ToUnicode CMaps (bfchar + bfrange,
    * 1-byte simple fonts and 2-byte Type0/CID). A Type0 font WITHOUT
    * /ToUnicode, an unknown glyph name, or an unmapped code refuses
    * the page loudly ("unsupported_font") instead of emitting
    * mojibake into the corpus. */
  private sealed trait FontDec
  private case object FRaw extends FontDec
  private final case class FByteMap(t: Array[String]) extends FontDec
  private final case class FCMap(width: Int, m: Map[Int, String]) extends FontDec
  private case object FUnsupported extends FontDec

  private def charsetTable(cs: String): Array[String] =
    Array.tabulate(256)(i =>
      new String(Array(i.toByte), java.nio.charset.Charset.forName(cs)))
  private lazy val winAnsiTable: Array[String] = {
    val t = charsetTable("windows-1252")
    // cp1252 leaves these five positions UNDEFINED; the JDK decoder is
    // lenient about them, but the font contract is never-mojibake — an
    // undefined code refuses the page (null sentinel, see FByteMap)
    for (c <- Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D)) t(c) = null
    t
  }
  private lazy val macRomanTable = charsetTable("x-MacRoman")

  /** Adobe-Glyph-List subset + the uniXXXX convention; None = unknown
    * (the font refuses rather than guessing). */
  private val glyphNames: Map[String, String] = Map(
    "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
    "ccedilla" -> "ç", "adieresis" -> "ä", "odieresis" -> "ö",
    "udieresis" -> "ü", "ntilde" -> "ñ", "Euro" -> "€",
    "bullet" -> "•", "emdash" -> "—", "endash" -> "–",
    "quotesingle" -> "'", "quotedblleft" -> "“",
    "quotedblright" -> "”", "ellipsis" -> "…", "degree" -> "°")
  private def glyphToText(name: String): Option[String] =
    if (name.length == 7 && name.startsWith("uni"))
      try Some(new String(Character.toChars(
        Integer.parseInt(name.substring(3), 16))))
      catch { case _: IllegalArgumentException => None }
    else glyphNames.get(name)

  /** Parse a /ToUnicode CMap stream: codespace width, bfchar pairs,
    * bfrange triples (incrementing-destination and array forms). None
    * on any malformation. CMap boilerplate (cid dicts, usecmap) skips
    * structurally. */
  private def parseCMap(data: Array[Byte]): Option[FCMap] =
    try {
      val lex = new Lexer(data, 0, data.length)
      var width = 1
      val m = scala.collection.mutable.HashMap.empty[Int, String]
      def codeOf(b: Array[Byte]): Int =
        b.foldLeft(0)((a, x) => (a << 8) | (x & 0xff))
      def utf16(b: Array[Byte]): String =
        new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
      def utf16inc(base: Array[Byte], delta: Int): String = {
        val s = utf16(base).toCharArray
        if (s.isEmpty) return ""
        s(s.length - 1) = (s(s.length - 1) + delta).toChar
        new String(s)
      }
      var going = true
      while (going) {
        lex.skipWs()
        if (lex.pos >= lex.end) going = false
        else lex.value(allowRef = false) match {
          case PKeyword("begincodespacerange") =>
            var done = false
            while (!done) lex.value(allowRef = false) match {
              case PKeyword("endcodespacerange") => done = true
              case lo: PStr =>
                width = lo.bytes.length
                lex.value(allowRef = false) match {
                  case _: PStr => ()
                  case _ => return None
                }
              case _ => return None
            }
          case PKeyword("beginbfchar") =>
            var done = false
            while (!done) lex.value(allowRef = false) match {
              case PKeyword("endbfchar") => done = true
              case src: PStr => lex.value(allowRef = false) match {
                case dst: PStr => m(codeOf(src.bytes)) = utf16(dst.bytes)
                case _ => return None
              }
              case _ => return None
            }
          case PKeyword("beginbfrange") =>
            var done = false
            while (!done) lex.value(allowRef = false) match {
              case PKeyword("endbfrange") => done = true
              case lo0: PStr =>
                val lo = codeOf(lo0.bytes)
                val hi = lex.value(allowRef = false) match {
                  case h: PStr => codeOf(h.bytes)
                  case _ => return None
                }
                if (hi < lo || hi - lo > 65535) return None
                lex.value(allowRef = false) match {
                  case d: PStr =>
                    var c = lo
                    while (c <= hi) { m(c) = utf16inc(d.bytes, c - lo); c += 1 }
                  case PArr(items) =>
                    if (items.length != hi - lo + 1) return None
                    items.zipWithIndex.foreach {
                      case (d: PStr, i) => m(lo + i) = utf16(d.bytes)
                      case _ => return None
                    }
                  case _ => return None
                }
              case _ => return None
            }
          case _ => () // boilerplate tokens / dicts between sections
        }
      }
      if (width < 1 || width > 2) None else Some(FCMap(width, m.toMap))
    } catch {
      case _: Bad | _: ArrayIndexOutOfBoundsException => None
    }

  /** Resolve one page font dict to its decoder. */
  private def parseFont(doc: Doc, d: PDict): FontDec = {
    val subtype = doc.resolve(d.m.getOrElse("Subtype", PNull))
    doc.resolve(d.m.getOrElse("ToUnicode", PNull)) match {
      case s: PStream =>
        doc.decodeStream(s) match {
          case Right(data) => parseCMap(data).getOrElse(FUnsupported)
          case Left(_) => FUnsupported
        }
      case _ if subtype == PName("Type0") =>
        FUnsupported // CID font without ToUnicode: loud, never mojibake
      case _ =>
        doc.resolve(d.m.getOrElse("Encoding", PNull)) match {
          case PNull => FRaw // no declared encoding: the frozen legacy
          case PName("WinAnsiEncoding") => FByteMap(winAnsiTable)
          case PName("MacRomanEncoding") => FByteMap(macRomanTable)
          case PDict(em) =>
            val base = doc.resolve(em.getOrElse("BaseEncoding", PNull)) match {
              case PName("MacRomanEncoding") => macRomanTable
              // absent BaseEncoding defaults to WinAnsi (frozen engine
              // convention — the builtin-encoding lookup is out of scope)
              case PName("WinAnsiEncoding") | PNull => winAnsiTable
              case _ => return FUnsupported
            }
            doc.resolve(em.getOrElse("Differences", PNull)) match {
              case PNull => FByteMap(base)
              case PArr(items) =>
                val t = base.clone()
                var code = -1
                items.foreach {
                  case n: PNum if n.v == n.v.floor =>
                    code = n.v.toInt
                    if (code < 0 || code > 255) return FUnsupported
                  case PName(g) =>
                    if (code < 0 || code > 255) return FUnsupported
                    glyphToText(g) match {
                      case Some(s) => t(code) = s; code += 1
                      case None => return FUnsupported
                    }
                  case _ => return FUnsupported
                }
                FByteMap(t)
              case _ => FUnsupported
            }
          case _ => FUnsupported
        }
    }
  }

  // ---- pages + text ------------------------------------------------------

  /** Page dicts in tree order. */
  private def pages(doc: Doc): Seq[PDict] = {
    val root = doc.resolve(doc.trailer.m.getOrElse("Root", bad("bad_xref"))) match {
      case d: PDict => d
      case _ => bad("bad_object")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[PDict]
    def walk(node: PObj, depth: Int): Unit = {
      if (depth > 64) bad("bad_object")
      doc.resolve(node) match {
        case d: PDict =>
          doc.resolve(d.m.getOrElse("Type", PNull)) match {
            case PName("Pages") =>
              doc.resolve(d.m.getOrElse("Kids", PNull)) match {
                case PArr(kids) => kids.foreach(walk(_, depth + 1))
                case _ => bad("bad_object")
              }
            case PName("Page") => out += d
            case _ => bad("bad_object")
          }
        case _ => bad("bad_object")
      }
    }
    walk(root.m.getOrElse("Pages", bad("bad_object")), 0)
    out.toSeq
  }

  /** The frozen text-assembly convention over one page's content.
    * `fontCache` memoizes parsed font decoders per raw font object
    * (PRef number / inline dict) across a document's pages — pages
    * overwhelmingly share one /Resources /Font dict, and re-parsing
    * a /ToUnicode CMap per page would multiply per-doc CPU by the
    * page count. */
  private def extractText(doc: Doc, page: PDict,
      fontCache: scala.collection.mutable.HashMap[PObj, FontDec]): Either[String, String] = {
    val streams: Seq[PStream] =
      doc.resolve(page.m.getOrElse("Contents", PNull)) match {
        case PNull => Seq.empty
        case s: PStream => Seq(s)
        case PArr(items) => items.map(doc.resolve).map {
          case s: PStream => s
          case _ => return Left("bad_stream")
        }
        case _ => return Left("bad_stream")
      }
    val content = new java.io.ByteArrayOutputStream()
    for (s <- streams) doc.decodeStream(s) match {
      case Right(d) => content.write(d, 0, d.length); content.write('\n')
      case Left(t) => return Left(t)
    }
    val data = content.toByteArray
    val lex = new Lexer(data, 0, data.length)
    val out = new java.io.ByteArrayOutputStream()
    val operands = scala.collection.mutable.ArrayBuffer.empty[PObj]
    var cur: FontDec = FRaw
    def showStr(o: PObj): Unit = o match {
      case PStr(bs) => cur match {
        case FRaw => out.write(bs, 0, bs.length)
        case FByteMap(t) =>
          val sb = new StringBuilder(bs.length)
          bs.foreach { b =>
            val s = t(b & 0xff)
            if (s == null) bad("unsupported_font") // undefined code point
            sb.append(s)
          }
          val ub = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.write(ub, 0, ub.length)
        case FCMap(w, m) =>
          if (bs.length % w != 0) bad("bad_stream") // misaligned code bytes
          val sb = new StringBuilder(bs.length / w)
          var i = 0
          while (i < bs.length) {
            var c = 0; var j = 0
            while (j < w) { c = (c << 8) | (bs(i + j) & 0xff); j += 1 }
            sb.append(m.getOrElse(c, bad("unsupported_font")): String)
            i += w
          }
          val ub = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.write(ub, 0, ub.length)
        case FUnsupported => bad("unsupported_font")
      }
      case _ => ()
    }
    try {
      // font name -> decoder from the page's /Resources /Font dict
      // (inside the try: a broken font ref resolves through doc.get)
      val fonts: Map[String, FontDec] =
        doc.resolve(page.m.getOrElse("Resources", PNull)) match {
          case PDict(rm) => doc.resolve(rm.getOrElse("Font", PNull)) match {
            case PDict(fm) => fm.map { case (k, v) =>
              k -> fontCache.getOrElseUpdate(v, doc.resolve(v) match {
                case fd: PDict => parseFont(doc, fd)
                case _ => FUnsupported
              })
            }
            case _ => Map.empty
          }
          case _ => Map.empty
        }
      var going = true
      while (going) {
        lex.skipWs()
        if (lex.pos >= lex.end) going = false
        else lex.value(allowRef = false) match {
          case PKeyword(kw) =>
            kw match {
              case "Tf" =>
                // "/F1 12 Tf": the name operand selects the decoder;
                // an undeclared name keeps the legacy raw convention
                operands.reverseIterator.collectFirst { case PName(f) => f }
                  .foreach(f => cur = fonts.getOrElse(f, FRaw))
              case "Tj" => operands.lastOption.foreach(showStr)
              case "'" =>
                out.write('\n'); operands.lastOption.foreach(showStr)
              case "\"" =>
                out.write('\n'); operands.lastOption.foreach(showStr)
              case "TJ" => operands.lastOption match {
                case Some(PArr(items)) => items.foreach(showStr)
                case _ => ()
              }
              case "ET" => out.write('\n')
              case "BI" => return Left("inline_image")
              case _ => ()
            }
            operands.clear()
          case v => operands += v
        }
      }
      Right(new String(out.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      // unsupported_font surfaces as its own per-page tag; any other
      // malformation inside content stays the bad_stream family
      case e: Bad if e.tag == "unsupported_font" => Left(e.tag)
      case _: Bad => Left("bad_stream")
    }
  }

  // ---- public rows -------------------------------------------------------

  final case class PdfInfo(media_id: Long, ok: Int, version: String,
      n_objects: Long, n_pages: Long, encrypted: Int, err: String)

  final case class PdfPageText(media_id: Long, page_idx: Int, ok: Int,
      text: String, err: String)

  def parseInfo(id: Long, b: Array[Byte]): PdfInfo =
    open(b) match {
      case Left(tag) => PdfInfo(id, 0, "", 0L, 0L, 0, tag)
      case Right(doc) =>
        try PdfInfo(id, 1, doc.version, doc.nObjects, pages(doc).length.toLong,
          if (doc.encrypted) 1 else 0, "")
        catch { case e: Bad => PdfInfo(id, 0, doc.version, 0L, 0L, 0, e.tag) }
    }

  /** Per-page extracted text; container-level refusals are one ok=0
    * row. An /Encrypt document extracts TRANSPARENTLY when the
    * standard handler's empty user password verifies (RC4 V1/V2,
    * AESV2 — the overwhelmingly common "encrypted but openable" crawl
    * case); a real password or an unsupported handler refuses
    * "encrypted". */
  def pageTexts(id: Long, b: Array[Byte]): Seq[PdfPageText] =
    open(b) match {
      case Left(tag) => Seq(PdfPageText(id, 0, 0, "", tag))
      case Right(doc) =>
        val cryptOk = try { doc.crypt; true } catch { case _: Bad => false }
        if (!cryptOk) Seq(PdfPageText(id, 0, 0, "", "encrypted"))
        else try {
          val fontCache = scala.collection.mutable.HashMap.empty[PObj, FontDec]
          pages(doc).zipWithIndex.map { case (p, i) =>
            extractText(doc, p, fontCache) match {
              case Right(t) => PdfPageText(id, i, 1, t, "")
              case Left(tag) => PdfPageText(id, i, 0, "", tag)
            }
          }
        } catch { case e: Bad => Seq(PdfPageText(id, 0, 0, "", e.tag)) }
    }

  // ---- fixture synthesis (REAL spec-shaped files) -------------------------

  /** Wire-shape options, all text-invisible: zlib content streams, the
    * PDF-1.5 xref-stream form (with optional PNG Up predictor), the
    * compressed-object-stream form (catalog + pages ride an ObjStm),
    * TJ-split / hex-string show operators. Error plants: a broken
    * header, a tail truncation, an /Encrypt trailer, one page declared
    * /LZWDecode. */
  /** `fontMode` wires /F1 through a REAL font object: 0 = none (the
    * legacy raw-UTF-8 convention), 1 = /WinAnsiEncoding (show bytes
    * cp1252), 2 = /MacRomanEncoding, 3 = /Encoding dict with a
    * /Differences arm (é rides remapped code 0xA9), 4 = simple font +
    * /ToUnicode CMap (ASCII bfrange + bfchar for the rest), 5 = Type0
    * /Identity-H + 2-byte /ToUnicode (show bytes UTF-16BE), 6 = Type0
    * WITHOUT /ToUnicode — the planted "unsupported_font" refusal. */
  /** `encrypted` plants the legacy marker-only /Encrypt (classifies,
    * text refuses). `realEnc` plants a REAL standard-security-handler
    * document: 1 = RC4 V2/R3, empty user password (extracts
    * transparently); 2 = RC4 V2/R3 with a real user password
    * (refuses "encrypted"); 3 = AESV2 V4/R4, empty user password
    * (extracts). */
  final case class PdfOpts(flate: Boolean = false, xrefStream: Boolean = false,
      objStm: Boolean = false, predictor: Boolean = false,
      tjSplit: Boolean = false, hexStrings: Boolean = false,
      encrypted: Boolean = false, lzwPage: Int = -1,
      breakMagic: Boolean = false, truncateTail: Boolean = false,
      fontMode: Int = 0, realEnc: Int = 0)

  private def escLit(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s.foreach { c =>
      if (c == '(' || c == ')' || c == '\\') out.write('\\')
      out.write(c & 0xff)
    }
    out.toByteArray
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(data); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    out.toByteArray
  }

  /** A line's show bytes under the fixture font mode (lines must be
    * encodable in the target scheme — the corpus guarantees it). */
  private def encodeLine(line: String, mode: Int): Array[Byte] = mode match {
    case 1 | 4 => line.getBytes("windows-1252")
    case 2 => line.getBytes("x-MacRoman")
    case 3 =>
      // é rides the /Differences slot 0xA9 instead of its cp1252 0xE9
      line.getBytes("windows-1252")
        .map(b => if ((b & 0xff) == 0xE9) 0xA9.toByte else b)
    case 5 => line.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    case _ => line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** A /ToUnicode CMap covering every code the lines use: one ASCII
    * identity bfrange + bfchar entries for the rest (both section
    * forms exercised on every fixture). */
  private def cmapBytes(lines: Seq[String], mode: Int): Array[Byte] = {
    val w = if (mode == 5) 2 else 1
    val pairs = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    for (line <- lines) {
      if (mode == 5) line.foreach { c =>
        if (c < 0x20 || c > 0x7e) pairs.getOrElseUpdate(c.toInt, c.toString)
      } else encodeLine(line, mode).foreach { b =>
        val code = b & 0xff
        if (code < 0x20 || code > 0x7e)
          pairs.getOrElseUpdate(code,
            new String(Array(b), if (mode == 2) "x-MacRoman" else "windows-1252"))
      }
    }
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\nbegincmap\n")
    val lo = "0" * (2 * w); val hi = "F" * (2 * w)
    sb.append(s"1 begincodespacerange <$lo> <$hi> endcodespacerange\n")
    val aLo = if (w == 2) "0020" else "20"
    val aHi = if (w == 2) "007E" else "7E"
    sb.append(s"1 beginbfrange <$aLo> <$aHi> <0020> endbfrange\n")
    for (group <- pairs.toSeq.grouped(100)) {
      sb.append(s"${group.length} beginbfchar\n")
      for ((code, str) <- group) {
        val src = if (w == 2) f"$code%04X" else f"$code%02X"
        val dst = str.map(c => f"${c.toInt}%04X").mkString
        sb.append(s"<$src> <$dst>\n")
      }
      sb.append("endbfchar\n")
    }
    sb.append("endcmap\nend\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Assemble a REAL PDF: one page per line, "BT ... Tj/TJ ET" content
    * streams, classic or stream xref, objects laid out with correct
    * byte offsets. Page 0's /Length is INDIRECT (a separate number
    * object), exercising the resolve-while-parsing path. */
  def pdfBytes(lines: Seq[String],
      opts: PdfOpts = PdfOpts()): Array[Byte] = {
    require(lines.nonEmpty, "a PDF fixture needs at least one page")
    require(opts.fontMode >= 0 && opts.fontMode <= 6,
      s"fontMode must be 0..6: ${opts.fontMode}")
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val nPages = lines.length
    // byte-level assembly: encoded show bytes (cp1252 / MacRoman /
    // UTF-16BE) are not valid UTF-8, so the content stream can never
    // round-trip through a String
    def contentBytes(line: String): Array[Byte] = {
      val enc = encodeLine(line, opts.fontMode)
      val o = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = o.write(s.getBytes(utf8))
      w("BT /F1 12 Tf 72 720 Td ")
      if (opts.hexStrings)
        w("<" + enc.map(b => f"${b & 0xff}%02X").mkString + "> Tj")
      else if (opts.tjSplit) {
        // split only at a code boundary: UTF-8 continuation bytes back
        // up to the codepoint start; UTF-16BE splits at even offsets
        var half = enc.length / 2
        if (opts.fontMode == 5) half -= half % 2
        else if (opts.fontMode == 0)
          while (half > 0 && (enc(half) & 0xC0) == 0x80) half -= 1
        w("[(")
        o.write(escLit(enc.take(half)))
        w(") -120 (")
        o.write(escLit(enc.drop(half)))
        w(")] TJ")
      } else {
        w("(")
        o.write(escLit(enc))
        w(") Tj")
      }
      w(" ET\n")
      o.toByteArray
    }
    // object numbering: 1 catalog, 2 pages, 3+2i page i, 4+2i content i,
    // L = 3+2n: page-0 content's indirect length; [F = L+1: font,
    // C = L+2: ToUnicode CMap — only when fontMode demands them];
    // [S: ObjStm]; [X = last: xref stream]
    val lenObj = 3 + 2 * nPages
    val nFontObjs = opts.fontMode match {
      case 0 => 0
      case 4 | 5 => 2
      case _ => 1
    }
    val fontObj = lenObj + 1
    val cmapObj = lenObj + 2
    val objStmNum = lenObj + nFontObjs + 1
    val xrefNum = if (opts.objStm) objStmNum + 1 else objStmNum
    val size = (if (opts.xrefStream) xrefNum + 1
      else if (opts.objStm) objStmNum + 1 else lenObj + nFontObjs + 1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(utf8))
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    // real standard-security-handler materials: deterministic /ID,
    // spec-computed /O and /U, the file key that encrypts every
    // non-xref stream below
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    val encMaterials: Option[(Array[Byte], Boolean, String)] =
      if (opts.realEnc == 0) None
      else {
        val aes = opts.realEnc == 3
        val r = if (aes) 4 else 3
        val pVal = -44
        val userPw = (if (opts.realEnc == 2) "secret" else "")
          .getBytes("ISO-8859-1")
        val ownerPw = "owner".getBytes("ISO-8859-1")
        val id0 = PdfCrypt.md5(lines.mkString(" ").getBytes(utf8))
        val o = PdfCrypt.oValue(ownerPw, userPw, r, 16)
        val key = PdfCrypt.fileKey(userPw, o, pVal, id0, r, 16)
        val u = PdfCrypt.uValue(key, id0, r)
        val cf = if (aes)
          " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>" +
            " /StmF /StdCF /StrF /StdCF" else ""
        val frag = s" /Encrypt << /Filter /Standard /V ${if (aes) 4 else 2}" +
          s" /R $r /Length 128$cf /P $pVal /O <${hex(o)}> /U <${hex(u)}> >>" +
          s" /ID [ <${hex(id0)}> <${hex(id0)}> ]"
        Some((key, aes, frag))
      }
    def encStream(num: Int, data: Array[Byte]): Array[Byte] =
      encMaterials match {
        case Some((key, aes, _)) =>
          val k = PdfCrypt.objKey(key, num, 0, aes)
          if (aes) PdfCrypt.aesEncrypt(k,
            PdfCrypt.md5(Array(num.toByte) ++ key).take(16), data)
          else PdfCrypt.rc4(k, data)
        case None => data
      }
    w(if (opts.breakMagic) "%XDF-1.4\n" else
      s"%PDF-${if (opts.xrefStream) "1.5" else "1.4"}\n")
    out.write(Array[Byte]('%', 0xe2.toByte, 0xe3.toByte, 0xcf.toByte,
      0xd3.toByte, '\n'))
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val catalogBody = "<< /Type /Catalog /Pages 2 0 R >>"
    val pagesBody = s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>"
    if (!opts.objStm) {
      offsets(1) = out.size()
      w(s"1 0 obj\n$catalogBody\nendobj\n")
      offsets(2) = out.size()
      w(s"2 0 obj\n$pagesBody\nendobj\n")
    }
    val res = if (opts.fontMode > 0)
      s" /Resources << /Font << /F1 $fontObj 0 R >> >>" else ""
    for (i <- 0 until nPages) {
      offsets(3 + 2 * i) = out.size()
      w(s"${3 + 2 * i} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox " +
        s"[ 0 0 612 792 ]$res /Contents ${4 + 2 * i} 0 R >>\nendobj\n")
      val raw = contentBytes(lines(i))
      val lzw = opts.lzwPage == i
      val data = encStream(4 + 2 * i,
        if (lzw || !opts.flate) raw else zlibDeflate(raw))
      val filter =
        if (lzw) " /Filter /LZWDecode"
        else if (opts.flate) " /Filter /FlateDecode"
        else ""
      val lenField = if (i == 0) s"$lenObj 0 R" else data.length.toString
      offsets(4 + 2 * i) = out.size()
      w(s"${4 + 2 * i} 0 obj\n<< /Length $lenField$filter >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
      if (i == 0) {
        offsets(lenObj) = out.size()
        w(s"$lenObj 0 obj\n${data.length}\nendobj\n")
      }
    }
    if (opts.fontMode > 0) {
      offsets(fontObj) = out.size()
      val body = opts.fontMode match {
        case 1 => "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding /WinAnsiEncoding >>"
        case 2 => "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding /MacRomanEncoding >>"
        case 3 => "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
          "/Differences [ 169 /eacute ] >> >>"
        case 4 => s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/ToUnicode $cmapObj 0 R >>"
        case 5 => s"<< /Type /Font /Subtype /Type0 /BaseFont /Graft " +
          s"/Encoding /Identity-H /ToUnicode $cmapObj 0 R >>"
        case _ => "<< /Type /Font /Subtype /Type0 /BaseFont /Graft " +
          "/Encoding /Identity-H >>" // 6: CID without ToUnicode (refuses)
      }
      w(s"$fontObj 0 obj\n$body\nendobj\n")
      if (nFontObjs == 2) {
        val cmap = encStream(cmapObj, cmapBytes(lines, opts.fontMode))
        offsets(cmapObj) = out.size()
        w(s"$cmapObj 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
        out.write(cmap, 0, cmap.length)
        w("\nendstream\nendobj\n")
      }
    }
    if (opts.objStm) {
      // catalog + pages ride the object stream
      val b1 = catalogBody.getBytes(utf8)
      val hdr = s"1 0 2 ${b1.length + 1} "
      val body = hdr + catalogBody + "\n" + pagesBody
      val raw = body.getBytes(utf8)
      val first = hdr.getBytes(utf8).length
      val data = encStream(objStmNum,
        if (opts.flate) zlibDeflate(raw) else raw)
      val f = if (opts.flate) " /Filter /FlateDecode" else ""
      offsets(objStmNum) = out.size()
      w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N 2 /First $first " +
        s"/Length ${data.length}$f >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    val enc = encMaterials.map(_._3).getOrElse(
      if (opts.encrypted) " /Encrypt << /Filter /Standard >>" else "")
    val startxref: Long =
      if (!opts.xrefStream) {
        val xo = out.size()
        w(s"xref\n0 $size\n")
        w("0000000000 65535 f \n")
        for (n <- 1 until size) {
          w(f"${offsets(n)}%010d 00000 n \n")
        }
        w(s"trailer\n<< /Size $size /Root 1 0 R$enc >>\n")
        xo
      } else {
        // xref stream rows: 1-byte type, 4-byte offset/stm, 2-byte gen/idx
        val rows = new java.io.ByteArrayOutputStream()
        def row(t: Int, f2: Long, f3: Int): Unit = {
          rows.write(t)
          rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
          rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
          rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
        }
        val xo = out.size()
        offsets(xrefNum) = xo
        row(0, 0, 0xffff)
        for (n <- 1 until size) {
          if (opts.objStm && (n == 1 || n == 2)) row(2, objStmNum, n - 1)
          else row(1, offsets(n), 0)
        }
        var data = rows.toByteArray
        var parms = ""
        if (opts.predictor) {
          // PNG Up filter per 7-byte row
          val cols = 7
          val nRows = data.length / cols
          val filtered = new java.io.ByteArrayOutputStream()
          for (r <- 0 until nRows) {
            filtered.write(2)
            for (x <- 0 until cols) {
              val cur = data(r * cols + x) & 0xff
              val up = if (r > 0) data((r - 1) * cols + x) & 0xff else 0
              filtered.write((cur - up) & 0xff)
            }
          }
          data = filtered.toByteArray
          parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
        }
        data = zlibDeflate(data)
        w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R$enc " +
          s"/W [ 1 4 2 ] /Filter /FlateDecode$parms " +
          s"/Length ${data.length} >>\nstream\n")
        out.write(data, 0, data.length)
        w("\nendstream\nendobj\n")
        xo
      }
    w(s"startxref\n$startxref\n%%EOF\n")
    val full = out.toByteArray
    if (opts.truncateTail) full.dropRight(40) else full
  }

  /** Deterministic PDF corpus: two pages per doc — the doc's own text,
    * then a closed-form second line — with the wire shape fanned
    * text-invisibly and the error families planted:
    *   id%11==7        broken header           -> "not_pdf"
    *   else id%19==13  tail cut by 40 bytes    -> "truncated"
    *   else id%13==9   REAL /Encrypt (split by id%39: 9 RC4-empty-pw
    *                   and 22 AESV2-empty-pw both EXTRACT
    *                   transparently, encrypted=1; 35 RC4 with a real
    *                   user password refuses "encrypted" — and with
    *                   the ObjStm form even classification stops at
    *                   the encrypted catalog)
    *   else id%17==11  page 1 declared LZW     -> that page
    *                   "unsupported_filter", page 0 extracts
    *   id%7==6         /F1 is Type0 WITHOUT /ToUnicode -> every
    *                   otherwise-extracting page "unsupported_font"
    * Shape fan: flate id%2==0; xref stream id%5 in {1,3} (version
    * 1.5), ObjStm at id%5==3, Up-predictor at id%7==2; TJ-split
    * id%3==1, hex strings id%3==2. Font fan (id%7): 1 WinAnsi,
    * 2 MacRoman, 3 /Differences, 4 simple-font /ToUnicode, 5 Type0
    * /Identity-H 2-byte /ToUnicode — those five append ' café' to
    * BOTH pages (closed-form in the oracle), so the show bytes REALLY
    * differ from UTF-8 and the decode path is the only way back. */
  def pdfCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, coalesce(col("text"), lit(""))).map { case (id, text) =>
        def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)
        val badHdr = fm(id, 11L) == 7L
        val trunc = !badHdr && fm(id, 19L) == 13L
        val enc = !badHdr && !trunc && fm(id, 13L) == 9L
        // the encrypted class splits three ways by id%39 (13×3): 9 =
        // RC4/R3 empty user password (extracts transparently), 22 =
        // AESV2/R4 empty user password (extracts), 35 = RC4/R3 with a
        // REAL user password (refuses "encrypted")
        val realEnc = if (!enc) 0
          else if (fm(id, 39L) == 9L) 1
          else if (fm(id, 39L) == 22L) 3
          else 2
        val lzw = !badHdr && !trunc && !enc && fm(id, 17L) == 11L
        val xs = fm(id, 5L) == 1L || fm(id, 5L) == 3L
        val fontMode = fm(id, 7L).toInt
        // the driver's corpus is ASCII (every encoding scheme covers
        // it); a non-ASCII future corpus must surface loudly, not as
        // a silent '?' substitution the oracle would hash-fail anyway
        require(text.forall(_ < 128),
          s"pdfCorpusFromDocuments: non-ASCII text in doc $id — " +
            "the font-mode fan assumes cp1252/MacRoman-encodable text")
        val suffix = if (fontMode >= 1 && fontMode <= 5) " café" else ""
        val opts = PdfOpts(
          flate = fm(id, 2L) == 0L,
          xrefStream = xs,
          objStm = fm(id, 5L) == 3L,
          predictor = xs && fm(id, 7L) == 2L,
          tjSplit = fm(id, 3L) == 1L,
          hexStrings = fm(id, 3L) == 2L,
          lzwPage = if (lzw) 1 else -1,
          breakMagic = badHdr,
          truncateTail = trunc,
          fontMode = fontMode,
          realEnc = realEnc)
        (id, pdfBytes(Seq(text + suffix,
          s"second page of document $id$suffix"), opts))
      }.toDF("media_id", "payload")
  }

  /** Batched classification (the q77/q156 shape). */
  def decodePdfInfo(media: DataFrame, partitions: Int = 0): Dataset[PdfInfo] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .map { case (id, p) => parseInfo(id, p) }(
        org.apache.spark.sql.Encoders.product[PdfInfo])
  }

  /** PDFs as corpus DOCUMENTS (the [[Containers.zipDocs]] shape for
    * the daily loop's raw zone): one document per payload, text = the
    * ok pages' extracted texts joined in page order (each already
    * carries its ET newline). Refused containers and zero-ok-page
    * payloads yield no document — a curation gate counts them off the
    * page-level rows, not here. Assembled per payload (one doc's
    * pages never cross rows), so the drain's streaming plan stays
    * aggregation-free. */
  def pdfDocs(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val text = pageTexts(id, p).filter(_.ok == 1)
          .sortBy(_.page_idx).map(_.text).mkString
        if (text.isEmpty) None else Some((id, "pdf", text))
      }
      .toDF("doc_id", "source", "text")
  }

  /** Batched per-page text extraction. */
  def decodePdfText(media: DataFrame, partitions: Int = 0): Dataset[PdfPageText] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) => pageTexts(id, p) }(
        org.apache.spark.sql.Encoders.product[PdfPageText])
  }
}
