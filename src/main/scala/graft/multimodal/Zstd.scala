package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pure-JVM Zstandard codec (RFC 8878) — the container-compression
  * step modern corpus distributions actually use (`.jsonl.zst` /
  * `.warc.zst`), implemented from the public spec with no native
  * deps, completing the inflate family next to
  * [[Multimodal.gunzipBytes]]. Reference analog: the extractors'
  * land-opaque-payloads intent (medical_etl_dag.py:88-96) — this is
  * the byte layer in front of the [[Containers]] record walks.
  *
  * Decoder surface:
  *  - frames: header descriptor, window descriptor, single-segment,
  *    frame content size, content checksum (XXH64 low 32, verified),
  *    skippable frames, multi-frame concatenation;
  *  - blocks: Raw, RLE, Compressed;
  *  - literals: Raw, RLE, Huffman-compressed (1 and 4 streams) with
  *    direct OR FSE-compressed weights, and Treeless (previous table);
  *  - sequences: Predefined / RLE / FSE_Compressed / Repeat modes for
  *    each of LL/OF/ML, exact baseline+extra-bits tables, the full
  *    repeat-offset history incl. the litLen==0 index twist;
  *  - dictionaries (RFC 8878 §5): [[parseDictionary]] reads the
  *    0xEC30A437 format (entropy tables in Huffman/OF/ML/LL order,
  *    the three seeded repcodes, the content-as-history prefix);
  *    [[decompress]] takes a caller-registered id->dictionary map and
  *    seeds the frame state from the header's Dictionary_ID. A frame
  *    naming an UNREGISTERED id refuses loudly (None) — decoding it
  *    dictionary-less would yield garbage, never silently attempted.
  *
  * Error contract (the [[Multimodal]] codec discipline): any
  * structural violation — bad magic, reserved bits, offset past
  * window, FSE/Huffman table inconsistencies, under/over-consumed
  * bitstreams, checksum mismatch, output past `maxBytes` (zstd bombs
  * compress 2^17:1) — returns None, never garbage bytes.
  *
  * The fixture ENCODER emits real compressed frames (greedy LZ parse
  * over a 4-byte hash chain, canonical-Huffman literals via direct
  * weights or a dual-state FSE weight stream, sequences FSE-coded
  * with the predefined distributions — serialized explicitly in
  * FSE_Compressed blocks so the table-description parser is on the
  * fixture path, Repeat mode on follow-on blocks, repcodes whenever
  * the parse revisits an offset), so the gate decodes through the
  * same machinery a production `.zst` exercises.
  *
  * Scale shape: one payload per row, decode inside mapPartitions
  * (decodeStage) — segments parallelize across the corpus, bytes
  * never touch the driver. */
object Zstd {

  /** Control-flow corruption signal — no stack trace (hot path). */
  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ---- xxhash64 (the frame checksum; XXH64 spec) ---------------------

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }
  private def le32(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 4) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  /** XXH64 over b[off until off+len) — public so specs can pin the
    * checksum independent of the frame walk. */
  def xxh64(b: Array[Byte], off: Int, len: Int, seed: Long = 0L): Long = {
    def round(acc: Long, x: Long): Long =
      java.lang.Long.rotateLeft(acc + x * P2, 31) * P1
    var i = off
    val end = off + len
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= end) {
          v1 = round(v1, le64(b, i)); v2 = round(v2, le64(b, i + 8))
          v3 = round(v3, le64(b, i + 16)); v4 = round(v4, le64(b, i + 24))
          i += 32
        }
        var acc = java.lang.Long.rotateLeft(v1, 1) +
          java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) +
          java.lang.Long.rotateLeft(v4, 18)
        for (v <- Seq(v1, v2, v3, v4)) {
          acc ^= round(0L, v); acc = acc * P1 + P4
        }
        acc
      } else seed + P5
    h += len.toLong
    while (i + 8 <= end) {
      h ^= round(0L, le64(b, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= le32(b, i) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (b(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ---- backward bitstream (FSE/Huffman payloads) ---------------------
  // Bits are numbered little-endian across the buffer (bit i = byte
  // i/8, position i%8). The LAST byte carries a sentinel 1 above the
  // payload; reading consumes downward from just below it. A read of
  // n bits returns the integer whose MSB is the highest-numbered bit.

  private final class BackReader(b: Array[Byte], from: Int, until: Int) {
    if (until <= from || until > b.length) corrupt()
    private var pos: Long = {
      val last = b(until - 1) & 0xff
      if (last == 0) corrupt() // missing sentinel
      (until - 1 - from).toLong * 8 +
        (31 - Integer.numberOfLeadingZeros(last))
    }
    def remaining: Long = pos
    private def bitsAt(p: Long, n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        val bit = p + k
        if (bit >= 0) {
          val by = from + (bit >> 3).toInt
          v |= (((b(by) >> (bit & 7).toInt) & 1).toLong) << k
        }
        k += 1
      }
      v
    }
    /** Strict read — under-run is corruption. */
    def read(n: Int): Long = {
      if (n == 0) return 0L
      if (pos < n) corrupt()
      pos -= n
      bitsAt(pos, n)
    }
    /** Zero-filled peek (Huffman lookahead near the stream start). */
    def peek(n: Int): Int = bitsAt(pos - n, n).toInt
    def skip(n: Int): Unit = { if (pos < n) corrupt(); pos -= n }
    /** Weight-stream update: false = would under-run (normal end). */
    def tryRead(n: Int): Option[Long] =
      if (pos < n) None else Some(read(n))
  }

  private final class BackWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(v: Long, k: Int): Unit = {
      require(k >= 0 && k <= 32 && n + k <= 63)
      acc |= (v & ((1L << k) - 1)) << n
      n += k
      while (n >= 8) {
        bytes.write((acc & 0xff).toInt); acc >>>= 8; n -= 8
      }
    }
    def finish(): Array[Byte] = {
      acc |= 1L << n; n += 1 // sentinel
      while (n > 0) { bytes.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
      bytes.toByteArray
    }
  }

  // ---- forward bitstream (FSE table descriptions) --------------------

  private final class FwdReader(b: Array[Byte], val from: Int, until: Int) {
    private var bit = 0L
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val p = bit + k
        val by = from + (p >> 3).toInt
        if (by >= until) corrupt()
        v |= ((b(by) >> (p & 7).toInt) & 1) << k
        k += 1
      }
      bit += n
      v
    }
    def bytesConsumed: Int = ((bit + 7) / 8).toInt
  }

  private final class FwdWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(v: Int, k: Int): Unit = {
      acc |= (v.toLong & ((1L << k) - 1)) << n
      n += k
      while (n >= 8) { bytes.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
    }
    def finish(): Array[Byte] = {
      if (n > 0) { bytes.write((acc & 0xff).toInt); acc = 0; n = 0 }
      bytes.toByteArray
    }
  }

  // ---- FSE (tANS) -----------------------------------------------------

  /** Decode table: cell -> (symbol, nbBits, baseline). */
  private final class FseTable(val al: Int, val size: Int,
      val sym: Array[Int], val nb: Array[Int], val base: Array[Int])

  /** Build the decode table from normalized counts (RFC 8878 §4.1.1):
    * -1 counts get one top cell each at AL bits; positive counts are
    * spread with the (size/2 + size/8 + 3) step; per-cell nbBits and
    * baselines follow the symbol's occurrence counter. */
  private def buildFseTable(norm: Array[Int], al: Int): FseTable = {
    if (al < 1 || al > 9) corrupt()
    val size = 1 << al
    val sym = new Array[Int](size)
    val nb = new Array[Int](size)
    val base = new Array[Int](size)
    var highThreshold = size - 1
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) {
        sym(highThreshold) = s
        nb(highThreshold) = al
        base(highThreshold) = 0
        highThreshold -= 1
      } else if (norm(s) < -1) corrupt()
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < norm.length) {
      var c = 0
      while (c < norm(s)) {
        sym(pos) = s
        pos = (pos + step) & mask
        while (pos > highThreshold) pos = (pos + step) & mask
        c += 1
      }
      s += 1
    }
    if (pos != 0) corrupt() // counts must exactly fill the table
    val next = norm.map(c => if (c > 0) c else 0)
    var i = 0
    while (i < size) {
      if (i <= highThreshold) {
        val sy = sym(i)
        val x = next(sy); next(sy) = x + 1
        val nbB = al - (31 - Integer.numberOfLeadingZeros(x))
        nb(i) = nbB
        base(i) = (x << nbB) - size
      }
      i += 1
    }
    new FseTable(al, size, sym, nb, base)
  }

  /** Read an FSE table description (forward bits; FSE_readNCount).
    * Returns (normalized counts, accuracy log); `maxAl`/`maxSymbol`
    * bound the table family. */
  private def readNCount(fr: FwdReader, maxSymbol: Int,
      maxAl: Int): (Array[Int], Int) = {
    val al = fr.read(4) + 5
    if (al > maxAl) corrupt()
    val tableSize = 1 << al
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = al + 1
    val counts = new Array[Int](maxSymbol + 1)
    var i = 0
    var prev0 = false
    while (remaining > 1) {
      if (i > maxSymbol) corrupt()
      if (prev0) {
        var flag = fr.read(2)
        while (flag == 3) {
          i += 3
          if (i > maxSymbol) corrupt()
          flag = fr.read(2)
        }
        i += flag
        if (i > maxSymbol) corrupt()
        prev0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val small = fr.read(nbBits - 1)
        val value =
          if (small < max) small
          else {
            val extra = fr.read(1)
            val full = small | (extra << (nbBits - 1))
            if (full >= threshold) full - max else full
          }
        val count = value - 1
        remaining -= math.abs(count)
        if (remaining < 1) corrupt()
        counts(i) = count
        prev0 = count == 0
        i += 1
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1; threshold >>= 1
        }
      }
    }
    (counts, al)
  }

  /** Serialize normalized counts (FSE_writeNCount dual). */
  private def writeNCount(fw: FwdWriter, norm: Array[Int], al: Int): Unit = {
    fw.write(al - 5, 4)
    val tableSize = 1 << al
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = al + 1
    var i = 0
    while (remaining > 1) {
      require(i < norm.length, "normalized counts do not fill the table")
      val c = norm(i)
      val value = c + 1
      val max = (2 * threshold - 1) - remaining
      if (value < max) fw.write(value, nbBits - 1)
      else if (value < threshold) fw.write(value, nbBits)
      else fw.write(value + max, nbBits)
      remaining -= math.abs(c)
      i += 1
      while (remaining > 1 && remaining < threshold) {
        nbBits -= 1; threshold >>= 1
      }
      if (c == 0 && remaining > 1) {
        // repeat flags for the zero run that FOLLOWS a zero count
        var z = 0
        while (i + z < norm.length && norm(i + z) == 0) z += 1
        var rem = z
        while (rem >= 3) { fw.write(3, 2); rem -= 3 }
        fw.write(rem, 2)
        i += z
      }
    }
  }

  /** Encoder view of a decode table: for each symbol, its cells in
    * table order; cell ranges tile [0, size) so the covering cell for
    * any successor state is unique. */
  private final class FseEncoder(val t: FseTable) {
    private val cells: Array[Array[Int]] = {
      val by = Array.fill(t.sym.max + 1)(List.empty[Int])
      var i = t.size - 1
      while (i >= 0) { by(t.sym(i)) = i :: by(t.sym(i)); i -= 1 }
      by.map(_.toArray)
    }
    def anyCell(s: Int): Int = {
      if (s >= cells.length || cells(s).isEmpty)
        throw new IllegalArgumentException(s"symbol $s not in FSE table")
      cells(s)(0)
    }
    /** A cell of `s` with nbBits > 0 (the overflow-terminator pick). */
    def positiveBitsCell(s: Int): Int =
      cells(s).find(c => t.nb(c) > 0).getOrElse(
        throw new IllegalArgumentException(s"symbol $s has only 0-bit cells"))
    /** The unique cell of `s` whose range covers successor state `to`;
      * returns (cell, bits, nbBits). */
    def cellFor(s: Int, to: Int): (Int, Int, Int) = {
      val cs = cells(s)
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        if (to >= t.base(c) && to < t.base(c) + (1 << t.nb(c)))
          return (c, to - t.base(c), t.nb(c))
        i += 1
      }
      throw new IllegalStateException("FSE cell ranges must tile the state space")
    }
  }

  // ---- sequence code tables (RFC 8878 §3.1.1.3.2.1.1) ----------------

  private val LlBase: Array[Int] =
    (0 until 16).toArray ++ Array(16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
      128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits: Array[Int] =
    Array.fill(16)(0) ++ Array(1, 1, 1, 1, 2, 2, 3, 3, 4, 6,
      7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase: Array[Int] =
    (3 to 34).toArray ++ Array(35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
      99, 131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits: Array[Int] =
    Array.fill(32)(0) ++ Array(1, 1, 1, 1, 2, 2, 3, 3, 4, 4,
      5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LlDefault: Array[Int] = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  private val MlDefault: Array[Int] = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1)
  private val OfDefault: Array[Int] = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private val LlDefaultAl = 6
  private val MlDefaultAl = 6
  private val OfDefaultAl = 5
  private val LlMaxSymbol = 35
  private val MlMaxSymbol = 52
  private val OfMaxSymbol = 31 // codes up to 31; our window caps well below
  private val LlMaxAl = 9
  private val MlMaxAl = 9
  private val OfMaxAl = 8

  private lazy val llDefaultTable = buildFseTable(LlDefault, LlDefaultAl)
  private lazy val mlDefaultTable = buildFseTable(MlDefault, MlDefaultAl)
  private lazy val ofDefaultTable = buildFseTable(OfDefault, OfDefaultAl)

  /** An "RLE table": one cell, zero bits — every decode yields the
    * same symbol and never touches the stream. */
  private def rleTable(symbol: Int): FseTable =
    new FseTable(0, 1, Array(symbol), Array(0), Array(0))

  // ---- Huffman (literals) ---------------------------------------------

  private val HufMaxBits = 11

  /** Canonical table from weights: lowest weight first (natural order
    * within a weight), each weight-w symbol spanning 2^(w-1) cells;
    * code(s) = span start >> (w-1), length maxBits+1-w. Returns
    * (maxBits, cellSym, cellNb, codeOf, lenOf). */
  private def buildHuffTable(weights: Array[Int])
      : (Int, Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val n = weights.length
    var sum = 0L
    var i = 0
    while (i < n) {
      val w = weights(i)
      if (w < 0 || w > HufMaxBits + 1) corrupt()
      if (w > 0) sum += 1L << (w - 1)
      i += 1
    }
    if (sum == 0) corrupt()
    val maxBits = 63 - java.lang.Long.numberOfLeadingZeros(sum)
    if (maxBits > HufMaxBits || (1L << maxBits) != sum) corrupt()
    val size = 1 << maxBits
    val cellSym = new Array[Int](size)
    val cellNb = new Array[Int](size)
    val codeOf = new Array[Int](n)
    val lenOf = new Array[Int](n)
    var start = 0
    var w = 1
    while (w <= maxBits) {
      var s = 0
      while (s < n) {
        if (weights(s) == w) {
          val span = 1 << (w - 1)
          val nbB = maxBits + 1 - w
          codeOf(s) = start >> (w - 1)
          lenOf(s) = nbB
          var k = 0
          while (k < span) {
            cellSym(start + k) = s; cellNb(start + k) = nbB; k += 1
          }
          start += span
        }
        s += 1
      }
      w += 1
    }
    if (start != size) corrupt()
    (maxBits, cellSym, cellNb, codeOf, lenOf)
  }

  /** Decode one Huffman stream of exactly `count` symbols; the stream
    * must be consumed exactly (under/over-run is corruption). */
  private def decodeHuffStream(b: Array[Byte], from: Int, until: Int,
      maxBits: Int, cellSym: Array[Int], cellNb: Array[Int],
      count: Int, out: Array[Byte], outOff: Int): Unit = {
    val r = new BackReader(b, from, until)
    var i = 0
    while (i < count) {
      val st = r.peek(maxBits)
      val nb = cellNb(st)
      if (nb == 0) corrupt()
      r.skip(nb)
      out(outOff + i) = cellSym(st).toByte
      i += 1
    }
    if (r.remaining != 0) corrupt()
  }

  /** Parse a Huffman tree description at b[p): direct 4-bit weights
    * (header >= 128) or FSE-compressed weights (header < 128, dual
    * alternating states, end-by-exhaustion). Returns (weights
    * INCLUDING the deduced last symbol, bytes consumed). */
  private def readHuffWeights(b: Array[Byte], p: Int, end: Int): (Array[Int], Int) = {
    if (p >= end) corrupt()
    val h = b(p) & 0xff
    val (listed, consumed) =
      if (h >= 128) {
        val n = h - 127
        val nBytes = (n + 1) / 2
        if (p + 1 + nBytes > end) corrupt()
        val ws = new Array[Int](n)
        var i = 0
        while (i < n) {
          val by = b(p + 1 + i / 2) & 0xff
          ws(i) = if (i % 2 == 0) by >> 4 else by & 0x0f
          i += 1
        }
        (ws, 1 + nBytes)
      } else {
        val compSize = h
        if (p + 1 + compSize > end) corrupt()
        val fr = new FwdReader(b, p + 1, p + 1 + compSize)
        val (counts, al) = readNCount(fr, 15, 6) // weights are 4-bit values
        val table = buildFseTable(counts, al)
        val descBytes = fr.bytesConsumed
        if (descBytes >= compSize) corrupt()
        val r = new BackReader(b, p + 1 + descBytes, p + 1 + compSize)
        var st1 = r.read(al).toInt
        var st2 = r.read(al).toInt
        val ws = scala.collection.mutable.ArrayBuffer.empty[Int]
        var done = false
        while (!done) {
          if (ws.length > 254) corrupt()
          ws += table.sym(st1)
          r.tryRead(table.nb(st1)) match {
            case Some(bits) => st1 = table.base(st1) + bits.toInt
            case None => ws += table.sym(st2); done = true
          }
          if (!done) {
            if (ws.length > 254) corrupt()
            ws += table.sym(st2)
            r.tryRead(table.nb(st2)) match {
              case Some(bits) => st2 = table.base(st2) + bits.toInt
              case None => ws += table.sym(st1); done = true
            }
          }
        }
        (ws.toArray, 1 + compSize)
      }
    // deduce the last symbol's weight: it completes the sum to a power
    // of two (and must itself be representable)
    var sum = 0L
    listed.foreach { w =>
      if (w < 0 || w > 15) corrupt()
      if (w > 0) sum += 1L << (w - 1)
    }
    if (sum == 0) corrupt()
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(sum)
    val rest = (1L << maxBits) - sum
    if (rest <= 0 || (rest & (rest - 1)) != 0) corrupt()
    val lastW = 64 - java.lang.Long.numberOfLeadingZeros(rest)
    (listed :+ lastW, consumed)
  }

  // ---- decoder ---------------------------------------------------------

  private val Magic = 0xFD2FB528
  private val SkippableMagicLow = 0x184D2A50
  /** Leading bytes of a zstd frame — container ingest sniffs this. */
  def isZstd(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      (le32(b, 0) == (Magic & 0xFFFFFFFFL))

  /** Per-frame entropy state (tables persist across blocks). */
  private final class FrameState {
    var huff: Option[(Int, Array[Int], Array[Int])] = None // maxBits, sym, nb
    var llT: FseTable = null
    var mlT: FseTable = null
    var ofT: FseTable = null
    val rep: Array[Long] = Array(1L, 4L, 8L)
  }

  // ---- dictionaries (RFC 8878 §5) --------------------------------------

  private val DictMagic = 0xEC30A437

  /** A parsed zstd dictionary: seeded entropy tables (usable by the
    * first block's Repeat/Treeless modes), seeded repcodes, and the
    * content bytes that prefix the match-copy history. Opaque —
    * construct via [[parseDictionary]]. */
  final class ZstdDict private[Zstd] (
      val id: Long,
      private[Zstd] val huff: Option[(Int, Array[Int], Array[Int])],
      private[Zstd] val llT: FseTable,
      private[Zstd] val mlT: FseTable,
      private[Zstd] val ofT: FseTable,
      private[Zstd] val rep: Array[Long],
      private[Zstd] val content: Array[Byte])

  /** Parse a dictionary file (magic 0xEC30A437): entropy tables in
    * Huffman / OF / ML / LL order, three seeded repcodes (each
    * nonzero and within the content), then the content. None on any
    * malformation — a half-read dictionary would silently garble
    * every frame decoded under it. */
  def parseDictionary(b: Array[Byte]): Option[ZstdDict] =
    try {
      if (b == null || b.length < 8 ||
          le32(b, 0) != (DictMagic & 0xFFFFFFFFL)) return None
      val id = le32(b, 4)
      if (id == 0) corrupt() // 0 is "no dictionary" in frame headers
      var p = 8
      val (weights, consumed) = readHuffWeights(b, p, b.length)
      val (mb, cs, cn, _, _) = buildHuffTable(weights)
      p += consumed
      def fse(maxSym: Int, maxAl: Int): FseTable = {
        val fr = new FwdReader(b, p, b.length)
        val (counts, al) = readNCount(fr, maxSym, maxAl)
        p += fr.bytesConsumed
        buildFseTable(counts, al)
      }
      val ofT = fse(OfMaxSymbol, OfMaxAl)
      val mlT = fse(MlMaxSymbol, MlMaxAl)
      val llT = fse(LlMaxSymbol, LlMaxAl)
      if (p + 12 > b.length) corrupt()
      val rep = Array(le32(b, p), le32(b, p + 4), le32(b, p + 8))
      p += 12
      val content = java.util.Arrays.copyOfRange(b, p, b.length)
      if (rep.exists(r => r <= 0 || r > content.length)) corrupt()
      Some(new ZstdDict(id, Some((mb, cs, cn)), llT, mlT, ofT, rep, content))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** Shared repeat-offset resolution — the encoder simulates history
    * with the SAME function, so the two sides cannot diverge. Mutates
    * `rep`; returns the actual offset. */
  private def repResolve(rep: Array[Long], value: Long, ll: Long): Long = {
    if (value > 3) {
      val off = value - 3
      rep(2) = rep(1); rep(1) = rep(0); rep(0) = off
      off
    } else {
      val off =
        if (ll != 0) {
          value match {
            case 1 => rep(0)
            case 2 => val o = rep(1); rep(1) = rep(0); rep(0) = o; o
            case _ => val o = rep(2); rep(2) = rep(1); rep(1) = rep(0); rep(0) = o; o
          }
        } else {
          value match {
            case 1 => val o = rep(1); rep(1) = rep(0); rep(0) = o; o
            case 2 => val o = rep(2); rep(2) = rep(1); rep(1) = rep(0); rep(0) = o; o
            case _ =>
              val o = rep(0) - 1
              rep(2) = rep(1); rep(1) = rep(0); rep(0) = o
              o
          }
        }
      if (off <= 0) corrupt()
      off
    }
  }

  /** Decode the literals section of a compressed block. Returns
    * (literals, bytes consumed). */
  private def decodeLiterals(b: Array[Byte], p0: Int, end: Int,
      st: FrameState): (Array[Byte], Int) = {
    if (p0 >= end) corrupt()
    val b0 = b(p0) & 0xff
    val typ = b0 & 3
    val sf = (b0 >> 2) & 3
    typ match {
      case 0 | 1 => // Raw | RLE
        val (regen, hdr) =
          if ((sf & 1) == 0) (b0 >> 3, 1)
          else if (sf == 1) {
            if (p0 + 2 > end) corrupt()
            (((b0 >> 4) | ((b(p0 + 1) & 0xff) << 4)), 2)
          } else {
            if (p0 + 3 > end) corrupt()
            (((b0 >> 4) | ((b(p0 + 1) & 0xff) << 4) |
              ((b(p0 + 2) & 0xff) << 12)), 3)
          }
        if (regen < 0 || regen > (1 << 17)) corrupt()
        if (typ == 0) {
          if (p0 + hdr + regen > end) corrupt()
          (java.util.Arrays.copyOfRange(b, p0 + hdr, p0 + hdr + regen),
            hdr + regen)
        } else {
          if (p0 + hdr + 1 > end) corrupt()
          val out = new Array[Byte](regen)
          java.util.Arrays.fill(out, b(p0 + hdr))
          (out, hdr + 1)
        }
      case _ => // Compressed | Treeless
        val (regen, comp, hdr, fourStreams) = sf match {
          case 0 | 1 =>
            if (p0 + 3 > end) corrupt()
            val v = (b0 | ((b(p0 + 1) & 0xff) << 8) |
              ((b(p0 + 2) & 0xff) << 16)) >>> 4
            (v & 0x3ff, (v >> 10) & 0x3ff, 3, sf == 1)
          case 2 =>
            if (p0 + 4 > end) corrupt()
            val v = (b0.toLong | ((b(p0 + 1) & 0xffL) << 8) |
              ((b(p0 + 2) & 0xffL) << 16) | ((b(p0 + 3) & 0xffL) << 24)) >>> 4
            ((v & 0x3fff).toInt, ((v >> 14) & 0x3fff).toInt, 4, true)
          case _ =>
            if (p0 + 5 > end) corrupt()
            val v = (b0.toLong | ((b(p0 + 1) & 0xffL) << 8) |
              ((b(p0 + 2) & 0xffL) << 16) | ((b(p0 + 3) & 0xffL) << 24) |
              ((b(p0 + 4) & 0xffL) << 32)) >>> 4
            ((v & 0x3ffff).toInt, ((v >> 18) & 0x3ffff).toInt, 5, true)
        }
        if (regen < 0 || regen > (1 << 17) || comp <= 0) corrupt()
        var p = p0 + hdr
        val sectionEnd = p + comp
        if (sectionEnd > end) corrupt()
        val (maxBits, cellSym, cellNb) =
          if (typ == 2) {
            val (weights, consumed) = readHuffWeights(b, p, sectionEnd)
            p += consumed
            val (mb, cs, cn, _, _) = buildHuffTable(weights)
            st.huff = Some((mb, cs, cn))
            (mb, cs, cn)
          } else st.huff.getOrElse(corrupt()) // treeless without a tree
        val out = new Array[Byte](regen)
        if (!fourStreams) {
          decodeHuffStream(b, p, sectionEnd, maxBits, cellSym, cellNb,
            regen, out, 0)
        } else {
          if (p + 6 > sectionEnd) corrupt()
          val s1 = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
          val s2 = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
          val s3 = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)
          p += 6
          val s4 = sectionEnd - p - s1 - s2 - s3
          if (s4 <= 0) corrupt()
          val r13 = (regen + 3) / 4
          val r4 = regen - 3 * r13
          if (r4 < 0) corrupt()
          var off = 0
          var from = p
          for ((sz, rg) <- Seq((s1, r13), (s2, r13), (s3, r13), (s4, r4))) {
            decodeHuffStream(b, from, from + sz, maxBits, cellSym, cellNb,
              rg, out, off)
            from += sz; off += rg
          }
        }
        (out, hdr + comp)
    }
  }

  /** Decode the sequences section and execute it against `literals`,
    * appending to `out`. */
  private def decodeSequences(b: Array[Byte], p0: Int, end: Int,
      st: FrameState, literals: Array[Byte], outBuf: GrowBuf,
      maxBytes: Int): Unit = {
    var p = p0
    if (p >= end) corrupt()
    val b0 = b(p) & 0xff
    var nbSeq = 0
    if (b0 == 0) { p += 1 }
    else if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > end) corrupt()
      nbSeq = ((b0 - 128) << 8) | (b(p + 1) & 0xff); p += 2
    } else {
      if (p + 3 > end) corrupt()
      nbSeq = ((b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8)) + 0x7f00
      p += 3
    }
    if (nbSeq == 0) {
      if (p != end) corrupt() // nothing may follow an empty section
      outBuf.append(literals, 0, literals.length, maxBytes)
      return
    }
    if (p >= end) corrupt()
    val modes = b(p) & 0xff
    if ((modes & 3) != 0) corrupt() // reserved bits
    p += 1
    def table(mode: Int, prev: FseTable, default: FseTable,
        maxSym: Int, maxAl: Int): FseTable = mode match {
      case 0 => default
      case 1 =>
        if (p >= end) corrupt()
        val s = b(p) & 0xff; p += 1
        if (s > maxSym) corrupt()
        rleTable(s)
      case 2 =>
        val fr = new FwdReader(b, p, end)
        val (counts, al) = readNCount(fr, maxSym, maxAl)
        p += fr.bytesConsumed
        buildFseTable(counts, al)
      case _ =>
        if (prev == null) corrupt() // repeat with no previous table
        prev
    }
    // description order: LL, OF, ML
    st.llT = table((modes >> 6) & 3, st.llT, llDefaultTable, LlMaxSymbol, LlMaxAl)
    st.ofT = table((modes >> 4) & 3, st.ofT, ofDefaultTable, OfMaxSymbol, OfMaxAl)
    st.mlT = table((modes >> 2) & 3, st.mlT, mlDefaultTable, MlMaxSymbol, MlMaxAl)
    val r = new BackReader(b, p, end)
    // init order: LL, OF, ML
    var llSt = r.read(st.llT.al).toInt
    var ofSt = r.read(st.ofT.al).toInt
    var mlSt = r.read(st.mlT.al).toInt
    if (llSt >= st.llT.size || ofSt >= st.ofT.size || mlSt >= st.mlT.size)
      corrupt()
    var litPos = 0
    var i = 0
    while (i < nbSeq) {
      val ofCode = st.ofT.sym(ofSt)
      val mlCode = st.mlT.sym(mlSt)
      val llCode = st.llT.sym(llSt)
      if (ofCode > 31 || mlCode > MlMaxSymbol || llCode > LlMaxSymbol) corrupt()
      // extra bits read order: OF, ML, LL
      val ofValue = (1L << ofCode) + r.read(ofCode)
      val ml = MlBase(mlCode).toLong + r.read(MlBits(mlCode))
      val ll = LlBase(llCode).toLong + r.read(LlBits(llCode))
      if (i < nbSeq - 1) {
        // state update order: LL, ML, OF
        llSt = st.llT.base(llSt) + r.read(st.llT.nb(llSt)).toInt
        mlSt = st.mlT.base(mlSt) + r.read(st.mlT.nb(mlSt)).toInt
        ofSt = st.ofT.base(ofSt) + r.read(st.ofT.nb(ofSt)).toInt
      }
      val offset = repResolve(st.rep, ofValue, ll)
      if (litPos + ll > literals.length) corrupt()
      outBuf.append(literals, litPos, ll.toInt, maxBytes)
      litPos += ll.toInt
      outBuf.copyMatch(offset, ml, maxBytes)
      i += 1
    }
    if (r.remaining != 0) corrupt() // under/over-consumed bitstream
    outBuf.append(literals, litPos, literals.length - litPos, maxBytes)
  }

  /** Frame-local growable output supporting overlapping match copies
    * (offsets reference THIS frame's decoded bytes only — no dict). */
  private final class GrowBuf {
    var buf = new Array[Byte](8192)
    var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        // doubling must not overflow past 2^30 (cap would wrap negative
        // -> 0 and the old `while (cap < len+n) cap <<= 1` spun forever
        // for maxBytes > 1<<30): grow by max(double, exact need) and
        // clamp at the array-size ceiling — the exact need fits by the
        // caller's maxBytes gate, so the clamp never truncates
        val need = len + n
        val cap = math.min(math.max(buf.length.toLong * 2, need.toLong),
          (Integer.MAX_VALUE - 8).toLong).toInt
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def append(src: Array[Byte], off: Int, n: Int, maxBytes: Int): Unit = {
      if (n < 0 || len.toLong + n > maxBytes) corrupt()
      ensure(n)
      System.arraycopy(src, off, buf, len, n)
      len += n
    }
    def appendByte(v: Byte, n: Int, maxBytes: Int): Unit = {
      if (n < 0 || len.toLong + n > maxBytes) corrupt()
      ensure(n)
      java.util.Arrays.fill(buf, len, len + n, v)
      len += n
    }
    def copyMatch(offset: Long, n: Long, maxBytes: Int): Unit = {
      if (offset <= 0 || offset > len || n < 0 || len + n > maxBytes) corrupt()
      ensure(n.toInt)
      var k = 0
      val o = offset.toInt
      while (k < n) { buf(len) = buf(len - o); len += 1; k += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Decompress a (possibly multi-frame) zstd payload. None on any
    * structural violation; `maxBytes` bounds TOTAL output (bomb
    * guard — rejected, not truncated). */
  def decompress(b: Array[Byte], maxBytes: Int = 1 << 26,
      dicts: Map[Long, ZstdDict] = Map.empty): Option[Array[Byte]] =
    try {
      if (b == null || b.length < 4) return None
      val total = new java.io.ByteArrayOutputStream(
        math.min(math.max(b.length * 4, 64), 1 << 16))
      var p = 0
      while (p < b.length) {
        if (p + 4 > b.length) corrupt()
        val magic = le32(b, p)
        if ((magic & 0xFFFFFFF0L) == (SkippableMagicLow & 0xFFFFFFFFL)) {
          if (p + 8 > b.length) corrupt()
          val sz = le32(b, p + 4)
          if (p + 8 + sz > b.length) corrupt()
          p += 8 + sz.toInt
        } else if (magic == (Magic & 0xFFFFFFFFL)) {
          p = decodeFrame(b, p + 4, total, maxBytes, dicts)
        } else corrupt()
      }
      Some(total.toByteArray)
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /** One frame starting AFTER its magic; returns the position after
    * the frame. */
  private def decodeFrame(b: Array[Byte], start: Int,
      total: java.io.ByteArrayOutputStream, maxBytes: Int,
      dicts: Map[Long, ZstdDict]): Int = {
    var p = start
    if (p >= b.length) corrupt()
    val desc = b(p) & 0xff; p += 1
    if ((desc & 0x08) != 0) corrupt() // reserved bit
    val fcsFlag = desc >>> 6
    val singleSegment = (desc & 0x20) != 0
    val checksum = (desc & 0x04) != 0
    val dictFlag = desc & 3
    var windowSize = 0L
    if (!singleSegment) {
      if (p >= b.length) corrupt()
      val wd = b(p) & 0xff; p += 1
      val base = 1L << (10 + (wd >>> 3))
      windowSize = base + (base / 8) * (wd & 7)
    }
    val dictBytes = dictFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    var dictId = 0L
    var k = 0
    while (k < dictBytes) {
      dictId |= (b(p) & 0xffL) << (8 * k); p += 1; k += 1
    }
    // an unregistered dictionary id refuses here — decoding without
    // the dictionary's tables/history would be silent garbage
    val dict = if (dictId == 0) None
      else Some(dicts.getOrElse(dictId, corrupt()))
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2; case 2 => 4; case _ => 8
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      if (p + fcsBytes > b.length) corrupt()
      fcs = 0L
      k = 0
      while (k < fcsBytes) { fcs |= (b(p + k) & 0xffL) << (8 * k); k += 1 }
      if (fcsBytes == 2) fcs += 256
      p += fcsBytes
    }
    if (singleSegment) windowSize = fcs
    if (windowSize < 0 || windowSize > maxBytes.toLong) corrupt()
    if (fcs >= 0 && total.size().toLong + fcs > maxBytes) corrupt()
    val blockMax = math.min(windowSize, 1L << 17).toInt.max(1)
    val st = new FrameState
    val frame = new GrowBuf
    // dictionary seeding: entropy tables feed the first block's
    // Repeat/Treeless modes, repcodes replace {1,4,8}, and the content
    // prefixes the match-copy history (sliced off before output)
    val base = dict.map { d =>
      st.huff = d.huff
      st.llT = d.llT; st.mlT = d.mlT; st.ofT = d.ofT
      d.rep.copyToArray(st.rep)
      if (d.content.length > 0)
        frame.append(d.content, 0, d.content.length, Int.MaxValue - 8)
      d.content.length
    }.getOrElse(0)
    // block appends may legally fill maxBytes of OUTPUT beyond the
    // history prefix
    val cap = math.min(maxBytes.toLong + base, (Int.MaxValue - 8).toLong).toInt
    var last = false
    while (!last) {
      if (p + 3 > b.length) corrupt()
      val hdr = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16)
      p += 3
      last = (hdr & 1) == 1
      val typ = (hdr >> 1) & 3
      val size = hdr >>> 3
      typ match {
        case 0 => // raw
          if (size > blockMax || p + size > b.length) corrupt()
          frame.append(b, p, size, cap)
          p += size
        case 1 => // RLE: size = regenerated count, content = 1 byte
          if (size > blockMax || p >= b.length) corrupt()
          frame.appendByte(b(p), size, cap)
          p += 1
        case 2 =>
          if (p + size > b.length || size == 0) corrupt()
          val before = frame.len
          val (lits, consumed) = decodeLiterals(b, p, p + size, st)
          decodeSequences(b, p + consumed, p + size, st, lits,
            frame, cap)
          if (frame.len - before > blockMax) corrupt()
          p += size
        case _ => corrupt() // reserved
      }
    }
    // all output accounting excludes the dictionary-history prefix
    if (fcs >= 0 && (frame.len - base).toLong != fcs) corrupt()
    if (checksum) {
      if (p + 4 > b.length) corrupt()
      val want = le32(b, p)
      p += 4
      if ((xxh64(frame.buf, base, frame.len - base) & 0xFFFFFFFFL) != want)
        corrupt()
    }
    if (total.size().toLong + (frame.len - base) > maxBytes) corrupt()
    total.write(frame.buf, base, frame.len - base)
    p
  }

  // ---- encoder (fixture synthesis: REAL compressed frames) ------------

  /** Fixture-path steering: which spec surfaces the frame exercises. */
  val VariantAuto = 0        // FSE-described first block, Repeat after
  val VariantRawBlocks = 1   // store-only (Raw blocks)
  val VariantPredefined = 2  // predefined sequence tables, 1-stream bias
  val VariantFseWeights = 3  // FSE-compressed Huffman weights + 4-stream

  private final class EncState {
    // per-machine: a previous block left the DEFAULT table live for
    // this machine (Repeat mode then repeats exactly that table; an
    // RLE block overwrites it decoder-side, so RLE clears the flag)
    var llLive = false
    var ofLive = false
    var mlLive = false
    var huffCodes: Option[(Array[Int], Array[Int])] = None // codeOf, lenOf
    val rep: Array[Long] = Array(1L, 4L, 8L)
  }

  private final case class Seqn(ll: Int, ml: Int, value: Long)

  /** Greedy LZ parse over a 4-byte hash table (min match 4, block-
    * local window). Returns sequences (with repcode-resolved offset
    * VALUES, the simulated history shared with the decoder via
    * [[repResolve]]) and the literals buffer. */
  private def lzParse(block: Array[Byte], rep: Array[Long])
      : (Array[Seqn], Array[Byte]) = {
    val n = block.length
    val seqs = scala.collection.mutable.ArrayBuffer.empty[Seqn]
    val lits = new java.io.ByteArrayOutputStream(math.min(n, 1 << 14))
    val hashBits = 15
    val table = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(table, -1)
    def hash4(i: Int): Int = {
      val v = (block(i) & 0xff) | ((block(i + 1) & 0xff) << 8) |
        ((block(i + 2) & 0xff) << 16) | ((block(i + 3) & 0xff) << 24)
      (v * 0x9E3779B1L.toInt) >>> (32 - hashBits)
    }
    var i = 0
    var litStart = 0
    while (i + 4 <= n) {
      val h = hash4(i)
      val cand = table(h)
      table(h) = i
      var mlen = 0
      if (cand >= 0 && cand < i) {
        while (i + mlen < n && mlen < 131074 &&
          block(cand + mlen) == block(i + mlen)) mlen += 1
      }
      if (mlen >= 4) {
        val ll = i - litStart
        lits.write(block, litStart, ll)
        val off = (i - cand).toLong
        // prefer a repcode when the history already holds this offset
        val value =
          if (ll != 0) {
            if (off == rep(0)) 1L
            else if (off == rep(1)) 2L
            else if (off == rep(2)) 3L
            else off + 3L
          } else {
            if (off == rep(1)) 1L
            else if (off == rep(2)) 2L
            else if (off == rep(0) - 1) 3L
            else off + 3L
          }
        val resolved = repResolve(rep, value, ll.toLong)
        require(resolved == off, "encoder repcode simulation diverged")
        seqs += Seqn(ll, mlen, value)
        // index a few interior positions so later matches can anchor
        var k = i + 1
        val step = math.max(1, mlen / 4)
        while (k + 4 <= math.min(i + mlen, n)) {
          table(hash4(k)) = k; k += step
        }
        i += mlen
        litStart = i
      } else i += 1
    }
    lits.write(block, litStart, n - litStart)
    (seqs.toArray, lits.toByteArray)
  }

  /** Split 2^maxBits into exactly n powers of two (repeatedly halve
    * the largest) — a valid canonical-Huffman contribution multiset
    * for ANY n <= 2^maxBits. Returns contributions sorted DESC. */
  private def powerSplit(maxBits: Int, n: Int): Array[Long] = {
    val pq = scala.collection.mutable.PriorityQueue.empty[Long] // max-heap
    pq.enqueue(1L << maxBits)
    while (pq.size < n) {
      val top = pq.dequeue()
      require(top > 1, "cannot split further: n exceeds table size")
      pq.enqueue(top / 2); pq.enqueue(top / 2)
    }
    pq.dequeueAll.toArray // descending
  }

  /** FSE-compress Huffman weight list (dual alternating states,
    * end-by-exhaustion) — None when the shape can't be encoded
    * (fallback: direct weights). */
  private def fseWeightBytes(listed: Array[Int]): Option[Array[Byte]] = {
    val m = listed.length
    if (m < 2 || m > 254) return None
    val maxW = listed.max
    val freq = new Array[Int](maxW + 1)
    listed.foreach(w => freq(w) += 1)
    if (freq.count(_ > 0) < 2) return None // degenerate one-symbol table
    val al = 5
    val size = 1 << al
    // largest-remainder-ish normalization: every present value >= 1
    val norm = new Array[Int](maxW + 1)
    var s = 0
    while (s <= maxW) {
      if (freq(s) > 0) norm(s) = math.max(1, (freq(s) * size) / m)
      s += 1
    }
    var diff = size - norm.sum
    while (diff != 0) {
      // adjust the largest adjustable count
      var best = -1
      s = 0
      while (s <= maxW) {
        if (norm(s) > 0 && (best < 0 || norm(s) > norm(best)) &&
          (diff > 0 || norm(s) > 1)) best = s
        s += 1
      }
      if (best < 0) return None
      if (diff > 0) { norm(best) += 1; diff -= 1 }
      else { norm(best) -= 1; diff += 1 }
    }
    val table = buildFseTable(norm, al)
    val enc = new FseEncoder(table)
    try {
      val cells = new Array[Int](m)
      val updBits = new Array[Int](m)
      val updNb = new Array[Int](m)
      cells(m - 1) = enc.anyCell(listed(m - 1))
      cells(m - 2) = enc.positiveBitsCell(listed(m - 2))
      var j = m - 3
      while (j >= 0) {
        val (c, bits, nb) = enc.cellFor(listed(j), cells(j + 2))
        cells(j) = c; updBits(j) = bits; updNb(j) = nb
        j -= 1
      }
      val bw = new BackWriter
      j = m - 3
      while (j >= 0) { bw.write(updBits(j).toLong, updNb(j)); j -= 1 }
      bw.write(cells(1).toLong, al)
      bw.write(cells(0).toLong, al)
      val fw = new FwdWriter
      writeNCount(fw, norm, al)
      val out = fw.finish() ++ bw.finish()
      if (out.length >= 128) None else Some(out)
    } catch { case _: IllegalArgumentException => None }
  }

  /** Literals section for one block. Returns the section bytes (None
    * = caller should emit a raw BLOCK instead). */
  private def encodeLiterals(lits: Array[Byte], st: EncState,
      variant: Int): Array[Byte] = {
    val n = lits.length
    def rawSection(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(n + 3)
      if (n <= 31) out.write((n << 3) | 0x00)
      else if (n <= 4095) {
        val v = (n << 4) | 0x04 // sf=01
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      } else {
        val v = (n.toLong << 4) | 0x0c // sf=11
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
      }
      out.write(lits, 0, n)
      out.toByteArray
    }
    if (n == 0) return rawSection()
    val freq = new Array[Int](256)
    lits.foreach(x => freq(x & 0xff) += 1)
    val used = (0 until 256).filter(freq(_) > 0)
    if (used.length == 1 && n >= 2) { // RLE literals
      val out = new java.io.ByteArrayOutputStream(4)
      if (n <= 31) out.write((n << 3) | 0x01)
      else if (n <= 4095) {
        val v = (n << 4) | 0x05
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      } else {
        val v = (n.toLong << 4) | 0x0d
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
      }
      out.write(used.head)
      return out.toByteArray
    }
    val maxSym = used.last
    if (maxSym > 127 || used.length < 2 || n < 24) return rawSection()
    // treeless: the previous tree covers this block's bytes
    val treeless = st.huffCodes match {
      case Some((_, lens)) if used.forall(s => s < lens.length && lens(s) > 0) => true
      case _ => false
    }
    val (codeOf, lenOf, treeDesc) =
      if (treeless) {
        val (c, l) = st.huffCodes.get
        (c, l, Array.emptyByteArray)
      } else {
        // contributions: split 2^maxBits into (#used) powers; the
        // LAST used symbol takes the smallest (keeps the deduced
        // weight consistent), others by frequency desc
        val nsyms = used.length
        var maxBits = 1
        while ((1 << maxBits) < nsyms) maxBits += 1
        maxBits = math.min(HufMaxBits, maxBits + 2)
        val contrib = powerSplit(maxBits, nsyms)
        val weights = new Array[Int](maxSym + 1)
        val byFreq = used.filter(_ != maxSym).sortBy(s => (-freq(s), s))
        weights(maxSym) = 64 - java.lang.Long.numberOfLeadingZeros(contrib.last)
        var i = 0
        while (i < byFreq.length) {
          weights(byFreq(i)) =
            64 - java.lang.Long.numberOfLeadingZeros(contrib(i))
          i += 1
        }
        val (_, _, _, c, l) = buildHuffTable(weights)
        val listed = weights.take(maxSym) // implied: symbol maxSym
        val desc =
          if (variant == VariantFseWeights)
            fseWeightBytes(listed) match {
              case Some(body) => Array(body.length.toByte) ++ body
              case None => directWeights(listed)
            }
          else directWeights(listed)
        (c, l, desc)
      }
    def encodeStream(from: Int, until: Int): Array[Byte] = {
      val bw = new BackWriter
      var i = until - 1
      while (i >= from) {
        val s = lits(i) & 0xff
        bw.write(codeOf(s).toLong, lenOf(s))
        i -= 1
      }
      bw.finish()
    }
    val fourStreams = n >= 256 || variant == VariantFseWeights
    val streams =
      if (!fourStreams) Array(encodeStream(0, n))
      else {
        val r13 = (n + 3) / 4
        Array(encodeStream(0, r13), encodeStream(r13, 2 * r13),
          encodeStream(2 * r13, 3 * r13), encodeStream(3 * r13, n))
      }
    val jump =
      if (!fourStreams) Array.emptyByteArray
      else {
        val out = new Array[Byte](6)
        var i = 0
        while (i < 3) {
          out(2 * i) = (streams(i).length & 0xff).toByte
          out(2 * i + 1) = ((streams(i).length >> 8) & 0xff).toByte
          if (streams(i).length > 0xffff) return rawSection()
          i += 1
        }
        out
      }
    val comp = treeDesc.length + jump.length + streams.map(_.length).sum
    if (comp + 5 >= n) return rawSection() // no win: store
    // the tree is only LIVE decoder-side once a huffman section is
    // actually emitted — committing earlier made a later treeless
    // block reference a tree the decoder never saw (raw fallback)
    if (!treeless) st.huffCodes = Some((codeOf, lenOf))
    val typ = if (treeless) 3 else 2
    val hdr = new java.io.ByteArrayOutputStream(5)
    if (!fourStreams && n <= 1023 && comp <= 1023) {
      val v = (comp.toLong << 14) | (n.toLong << 4) | (0 << 2) | typ
      hdr.write((v & 0xff).toInt); hdr.write(((v >> 8) & 0xff).toInt)
      hdr.write(((v >> 16) & 0xff).toInt)
    } else if (fourStreams && n <= 1023 && comp <= 1023) {
      val v = (comp.toLong << 14) | (n.toLong << 4) | (1 << 2) | typ
      hdr.write((v & 0xff).toInt); hdr.write(((v >> 8) & 0xff).toInt)
      hdr.write(((v >> 16) & 0xff).toInt)
    } else if (fourStreams && n <= 16383 && comp <= 16383) {
      val v = (comp.toLong << 18) | (n.toLong << 4) | (2 << 2) | typ
      hdr.write((v & 0xff).toInt); hdr.write(((v >> 8) & 0xff).toInt)
      hdr.write(((v >> 16) & 0xff).toInt); hdr.write(((v >> 24) & 0xff).toInt)
    } else if (fourStreams && n <= 262143 && comp <= 262143) {
      val v = (comp.toLong << 22) | (n.toLong << 4) | (3 << 2) | typ
      var k = 0
      while (k < 5) { hdr.write(((v >> (8 * k)) & 0xff).toInt); k += 1 }
    } else return rawSection()
    val out = new java.io.ByteArrayOutputStream(hdr.size() + comp)
    out.write(hdr.toByteArray)
    out.write(treeDesc)
    out.write(jump)
    streams.foreach(s => out.write(s, 0, s.length))
    out.toByteArray
  }

  private def directWeights(listed: Array[Int]): Array[Byte] = {
    require(listed.length >= 1 && listed.length <= 128)
    val out = new Array[Byte](1 + (listed.length + 1) / 2)
    out(0) = (127 + listed.length).toByte
    var i = 0
    while (i < listed.length) {
      val nib = listed(i) & 0x0f
      if (i % 2 == 0) out(1 + i / 2) = (nib << 4).toByte
      else out(1 + i / 2) = (out(1 + i / 2) | nib).toByte
      i += 1
    }
    out
  }

  private def codeForValue(v: Long, base: Array[Int], bits: Array[Int]): Int = {
    var c = base.length - 1
    while (c >= 0 && base(c) > v) c -= 1
    require(c >= 0 && v < base(c).toLong + (1L << bits(c)), s"value $v out of code range")
    c
  }

  /** Sequences section: nbSeq + modes + (descriptions) + backward FSE
    * bitstream. Mode choice: all-same-code machines use RLE; block 0
    * serializes the predefined distributions as FSE_Compressed (the
    * table-description parser lands on the fixture path); later
    * blocks Repeat; VariantPredefined uses mode 0 throughout. */
  private def encodeSequences(seqs: Array[Seqn], st: EncState,
      variant: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    val n = seqs.length
    if (n == 0) { out.write(0); return out.toByteArray }
    if (n < 128) out.write(n)
    else if (n < 0x7f00) { out.write((n >> 8) + 128); out.write(n & 0xff) }
    else { out.write(255); out.write((n - 0x7f00) & 0xff); out.write(((n - 0x7f00) >> 8) & 0xff) }
    val llCode = seqs.map(q => codeForValue(q.ll.toLong, LlBase, LlBits))
    val mlCode = seqs.map(q => codeForValue(q.ml.toLong, MlBase, MlBits))
    val ofCode = seqs.map { q =>
      val c = 63 - java.lang.Long.numberOfLeadingZeros(q.value)
      require(c <= 30, s"offset value ${q.value} too large")
      c
    }
    def pick(codes: Array[Int], default: Array[Int], defaultAl: Int,
        live: Boolean): (Int, FseTable, Array[Byte], Boolean) = {
      if (codes.forall(_ == codes(0)))
        (1, rleTable(codes(0)), Array(codes(0).toByte), false)
      else if (variant == VariantPredefined)
        (0, buildFseTable(default, defaultAl), Array.emptyByteArray, true)
      else if (live) // previous block left exactly this default table
        (3, buildFseTable(default, defaultAl), Array.emptyByteArray, true)
      else {
        val fw = new FwdWriter
        writeNCount(fw, default, defaultAl)
        (2, buildFseTable(default, defaultAl), fw.finish(), true)
      }
    }
    val (llMode, llT, llDesc, llLive2) = pick(llCode, LlDefault, LlDefaultAl, st.llLive)
    val (ofMode, ofT, ofDesc, ofLive2) = pick(ofCode, OfDefault, OfDefaultAl, st.ofLive)
    val (mlMode, mlT, mlDesc, mlLive2) = pick(mlCode, MlDefault, MlDefaultAl, st.mlLive)
    st.llLive = llLive2; st.ofLive = ofLive2; st.mlLive = mlLive2
    out.write((llMode << 6) | (ofMode << 4) | (mlMode << 2))
    out.write(llDesc, 0, llDesc.length)
    out.write(ofDesc, 0, ofDesc.length)
    out.write(mlDesc, 0, mlDesc.length)
    val llE = new FseEncoder(llT)
    val mlE = new FseEncoder(mlT)
    val ofE = new FseEncoder(ofT)
    def chain(enc: FseEncoder, codes: Array[Int])
        : (Array[Int], Array[Int], Array[Int]) = {
      val cells = new Array[Int](n)
      val bits = new Array[Int](n)
      val nb = new Array[Int](n)
      cells(n - 1) = enc.anyCell(codes(n - 1))
      var i = n - 2
      while (i >= 0) {
        val (c, bs, k) = enc.cellFor(codes(i), cells(i + 1))
        cells(i) = c; bits(i) = bs; nb(i) = k
        i -= 1
      }
      (cells, bits, nb)
    }
    val (llCells, llUB, llUN) = chain(llE, llCode)
    val (mlCells, mlUB, mlUN) = chain(mlE, mlCode)
    val (ofCells, ofUB, ofUN) = chain(ofE, ofCode)
    val bw = new BackWriter
    // fields in REVERSE read order (read: llInit, ofInit, mlInit, then
    // per seq: ofExtra, mlExtra, llExtra, then (not last) llUpd,
    // mlUpd, ofUpd)
    var i = n - 1
    while (i >= 0) {
      bw.write(seqs(i).ll.toLong - LlBase(llCode(i)), LlBits(llCode(i)))
      bw.write(seqs(i).ml.toLong - MlBase(mlCode(i)), MlBits(mlCode(i)))
      bw.write(seqs(i).value - (1L << ofCode(i)), ofCode(i))
      if (i > 0) {
        bw.write(ofUB(i - 1).toLong, ofUN(i - 1))
        bw.write(mlUB(i - 1).toLong, mlUN(i - 1))
        bw.write(llUB(i - 1).toLong, llUN(i - 1))
      }
      i -= 1
    }
    bw.write(mlCells(0).toLong, mlT.al)
    bw.write(ofCells(0).toLong, ofT.al)
    bw.write(llCells(0).toLong, llT.al)
    val stream = bw.finish()
    out.write(stream, 0, stream.length)
    out.toByteArray
  }

  /** Compress to a REAL single-frame zstd stream (single-segment,
    * frame content size, XXH64 checksum). `variant` steers which
    * decoder surfaces the frame exercises — every variant round-trips
    * through [[decompress]]. */
  def compress(data: Array[Byte], variant: Int = VariantAuto,
      blockSize: Int = 1 << 16): Array[Byte] = {
    require(blockSize > 0 && blockSize <= (1 << 17))
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    // magic
    out.write(0x28); out.write(0xb5); out.write(0x2f); out.write(0xfd)
    val fcsFlag = if (data.length <= 255) 0
      else if (data.length <= 65535 + 256) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04) // single-segment + checksum
    fcsFlag match {
      case 0 => out.write(data.length)
      case 1 =>
        val v = data.length - 256
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      case _ =>
        var k = 0
        while (k < 4) { out.write((data.length >> (8 * k)) & 0xff); k += 1 }
    }
    val st = new EncState
    var off = 0
    var emitted = false
    while (off < data.length || !emitted) {
      val len = math.min(blockSize, data.length - off)
      val last = off + len >= data.length
      val block = java.util.Arrays.copyOfRange(data, off, off + len)
      val body: Option[Array[Byte]] =
        if (variant == VariantRawBlocks || len < 16) None
        else {
          // snapshot ALL frame-entropy state: a raw-block fallback is
          // invisible to the decoder, so the speculative attempt's
          // mutations (rep history, huffman tree, repeat-mode flags)
          // must roll back or the two sides diverge on later blocks
          val repSnap = st.rep.clone()
          val huffSnap = st.huffCodes
          val liveSnap = (st.llLive, st.ofLive, st.mlLive)
          val (seqs, lits) = lzParse(block, st.rep)
          val sec = new java.io.ByteArrayOutputStream(len)
          val litBytes = encodeLiterals(lits, st, variant)
          val seqBytes = encodeSequences(seqs, st, variant)
          sec.write(litBytes, 0, litBytes.length)
          sec.write(seqBytes, 0, seqBytes.length)
          if (sec.size() < len && sec.size() < (1 << 21)) Some(sec.toByteArray)
          else {
            System.arraycopy(repSnap, 0, st.rep, 0, 3)
            st.huffCodes = huffSnap
            st.llLive = liveSnap._1; st.ofLive = liveSnap._2
            st.mlLive = liveSnap._3
            None
          }
        }
      body match {
        case Some(sec) =>
          val hdr = (sec.length << 3) | (2 << 1) | (if (last) 1 else 0)
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(sec, 0, sec.length)
        case None =>
          val hdr = (len << 3) | (0 << 1) | (if (last) 1 else 0)
          out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
          out.write((hdr >> 16) & 0xff)
          out.write(block, 0, len)
      }
      off += len
      emitted = true
    }
    val cs = xxh64(data, 0, data.length) & 0xFFFFFFFFL
    var k = 0
    while (k < 4) { out.write(((cs >> (8 * k)) & 0xff).toInt); k += 1 }
    out.toByteArray
  }

  // ---- Spark plumbing ---------------------------------------------------

  /** Decoded zstd text payload — [[Multimodal.GzipText]]'s shape for
    * the zstd family. */
  final case class ZstdText(
      media_id: Long, ok: Int, text: String,
      compressed_bytes: Long, text_bytes: Long)

  /** Batched zstd text decode over a binary media frame — the
    * decodeStage plan shape (repartition by id, per-partition narrow
    * map; bytes never touch the driver). */
  def decodeZstdText(media: DataFrame, partitions: Int = 0,
      maxBytes: Int = 1 << 26): Dataset[ZstdText] = {
    val spark = media.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .mapPartitions(_.map { case (id, p) =>
        val nIn = if (p == null) 0L else p.length.toLong
        decompress(p, maxBytes) match {
          case Some(raw) =>
            val t = new String(raw, "UTF-8")
            ZstdText(id, 1, t, nIn, raw.length.toLong)
          case None => ZstdText(id, 0, "", nIn, 0L)
        }
      })(org.apache.spark.sql.Encoders.product[ZstdText])
  }

  /** Deterministic zstd corpus from the documents table — the q130
    * gzip pattern for the zstd family, with the VARIANT fanned over
    * ids so one gate crosses every encoder surface: id%4==1 raw
    * blocks, id%4==3 predefined tables + 1-stream, id%4==0|2 FSE-
    * described tables (id%8>=4 additionally FSE-compressed weights +
    * forced 4-stream). Every id%3==0 payload gets a mid-frame byte
    * flip the checksum (or structure) must reject. */
  def zstdCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val data = (if (text == null) "" else text).getBytes("UTF-8")
        val variant = java.lang.Math.floorMod(id, 4L) match {
          case 1L => VariantRawBlocks
          case 3L => VariantPredefined
          case _ => if (java.lang.Math.floorMod(id, 8L) >= 4L)
            VariantFseWeights else VariantAuto
        }
        val b = compress(data, variant)
        if (java.lang.Math.floorMod(id, 3L) == 0L) {
          // mid-frame flip exercises the structural checks; the
          // trailer flip GUARANTEES rejection for every payload size
          // (the checksum is pure verification — a flipped trailer can
          // never re-validate), so the corrupt arm is deterministic
          // even for near-empty frames the mid flip might miss
          b(b.length / 2) = (b(b.length / 2) ^ 0x55).toByte
          b(b.length - 2) = (b(b.length - 2) ^ 0x55).toByte
        }
        (id, b)
    }.toDF("media_id", "payload")
  }
}
