package graft.multimodal

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media payloads are opaque `BinaryType` columns with typed metadata —
  * the Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; only the codec step is STUBBED (deterministic fake
  * features) because no imaging/audio libraries ship in this container.
  * Swapping `decodeFeaturesStub` for a real JNI/ffmpeg/ImageIO decoder
  * changes no plan shape: decode stays a per-partition narrow map over
  * pre-partitioned binary rows.
  *
  * Scale notes: media rows are wide (MBs) — `media` repartitions by id
  * before decode so one straggler file can't serialize a whole
  * partition's pipeline; decode happens inside `mapPartitions` so codec
  * setup cost amortizes per-partition, mirroring the batch shape of a
  * Pandas-UDF/`mapInPandas` implementation.
  */
object Multimodal {

  /** Typed media row: binary payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      feature: Array[Float],
      n_bytes: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB — stands in for a real image/audio decoder (not available in
    * this container). Deterministic: features derive from a 48-bit
    * modular rolling hash of the payload bytes + the shared avalanche
    * finalizer (Dedup.mix48Jvm), so tests and resumed jobs reproduce
    * bit-identical output AND the q31 gate query gets a full DuckDB
    * oracle — every intermediate stays overflow-free BIGINT, and each
    * feature value k/2^16 − 1/2 is exactly representable in both float
    * and double, so the comparison needs no rounding at all. Replace
    * with an ImageIO/ffmpeg call at integration time. */
  val StubSeed: Long = 25214903917L
  private val Mod48 = 1L << 48

  def decodeFeaturesStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = StubSeed
    var i = 0
    while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) % Mod48; i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      h = graft.dedup.Dedup.mix48Jvm(h)
      out(j) = ((h & 0xffffL) / 65536.0f) - 0.5f
      j += 1
    }
    out
  }

  /** Decode/feature-extract over a media frame: repartition by id (wide
    * binary rows), then batched per-partition decode. */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else media.sparkSession.sessionState.conf.numShufflePartitions
    media.select("media_id", "kind", "payload")
      .repartition(parts, col("media_id"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec setup" would happen here
        it.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          MediaFeatures(id, kind, decodeFeaturesStub(bytes, dim), bytes.length.toLong)
        }
      }
  }

  /** STUB frame sampler: every `stride`-th frame index up to n_frames —
    * metadata-level (real impl would slice the container stream). */
  def sampleFrameIndexes(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))
        .as("frame_indexes"))

  /** STUB resize: rewrites metadata, passes payload through (real impl
    * decodes + scales pixels). Keeps the schema contract stable. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  // ---- real image header decode (public formats: PNG, JPEG) ---------

  /** Parsed image header. `bit_depth` is PNG bit depth / JPEG sample
    * precision; `channels` is PNG color-type channel count / JPEG
    * component count. `coding` classifies the JPEG frame family from
    * its SOF marker ("baseline" SOF0 / "extended" SOF1 /
    * "progressive" SOF2 — the family [[Jpeg.decodeJpegPixels]]
    * documents as out of scope, so a corpus audit can COUNT the
    * refusal rate without decoding); "" for PNG and unknown. */
  final case class ImageHeader(
      media_id: Long,
      format: String, // "png" | "jpeg" | "unknown"
      width: Int,
      height: Int,
      bit_depth: Int,
      channels: Int,
      coding: String, // "baseline" | "extended" | "progressive" | ""
      n_bytes: Long)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** REAL decode of a PNG header (public spec, RFC 2083 §4.1.1): 8-byte
    * signature, then the IHDR chunk (length 13, type "IHDR") carrying
    * big-endian width/height, bit depth, and color type. Channel count
    * derives from color type (0 gray=1, 2 rgb=3, 3 palette=1, 4
    * gray+alpha=2, 6 rgba=4). CRC is not validated — dimension metadata
    * extraction, not integrity checking. */
  def parsePngHeader(b: Array[Byte]): Option[(String, Int, Int, Int, Int, String)] = {
    if (b == null || b.length < 33) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
    if (be32(b, 8) != 13) return None // IHDR is always first, always 13 bytes
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    val depth = b(24) & 0xff
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    Some(("png", w, h, depth, channels, ""))
  }

  /** REAL decode of a JPEG header (public spec, ITU T.81 §B): SOI, then
    * marker segments walked by their big-endian lengths until a start-of-
    * frame marker (SOF0 baseline / SOF1 extended / SOF2 progressive)
    * yields sample precision, height, width, component count, and the
    * CODING family named by the marker — progressive being the common
    * real-world family the pixel decoder declines, so audits can
    * quantify the refusal from headers alone. Standalone markers (TEM,
    * RSTn) have no length and are skipped; hitting SOS or EOI without
    * a SOF means no decodable frame header. */
  def parseJpegHeader(b: Array[Byte]): Option[(String, Int, Int, Int, Int, String)] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF) return None // marker misalignment
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xFF) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        i = j + 1 // standalone marker: no length field
      } else if (marker == 0xD9 || marker == 0xDA) {
        return None // EOI / SOS before any SOF
      } else {
        if (j + 2 >= b.length) return None
        val segLen = be16(b, j + 1)
        if (segLen < 2) return None
        if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
          // the declared segment must cover length+precision+height+width+Nf
          // (8 bytes) — otherwise the reads below belong to the next segment
          if (segLen < 8) return None
          if (j + 8 >= b.length) return None
          val precision = b(j + 3) & 0xff
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          val comps = b(j + 8) & 0xff
          if (w <= 0 || h <= 0 || comps <= 0) return None
          val coding = marker match {
            case 0xC0 => "baseline"
            case 0xC1 => "extended"
            case _ => "progressive"
          }
          return Some(("jpeg", w, h, precision, comps, coding))
        }
        i = j + 1 + segLen
      }
    }
    None
  }

  /** Parse an image payload's header: PNG, then JPEG, then WebP
    * (RIFF/VP8/VP8L/VP8X via [[Webp.parseWebp]] — depth is always 8,
    * channels 4 when alpha is carried, coding = the container flavor),
    * then GIF (logical screen only — indexed color reads as 8-bit
    * 3-channel, coding = the version string), else unknown. */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int, Int, Int, String)] = {
    val p = parsePngHeader(b)
    if (p.isDefined) return p
    val j = parseJpegHeader(b)
    if (j.isDefined) return j
    val w = Webp.parseWebp(0L, b)
    if (w.ok == 1)
      return Some(("webp", w.width, w.height, 8,
        if (w.has_alpha == 1) 4 else 3, w.format))
    val g = Gif.parseScreen(b)
    if (g.isDefined)
      return g.map { case (ver, gw, gh) => ("gif", gw, gh, 8, 3, ver) }
    val t = Tiff.parseTiff(0L, b)
    if (t.ok == 1)
      Some(("tiff", t.width.toInt, t.height.toInt, t.bits,
        math.max(t.samples, 1), t.byte_order))
    else None
  }

  /** The documents frame's ids, hash-spread over the session's
    * shuffle-partition count BEFORE a per-id fixture encoder maps over
    * them. The testdata documents table is ONE parquet file → one scan
    * split, so a `.map` directly on the scan ran every corpus
    * generator's payload ENCODING inside a single task while the other
    * 31 cores idled (measured: the generation half of every media
    * query was serial; the decode half already spreads via
    * [[decodeStage]]). The exchange moves 8-byte ids, not payloads;
    * hash partitioning by doc_id is deterministic under retries (guide
    * §2.5 — no round-robin, no rand). At 100 TB the input arrives as
    * many splits and the repartition coalesces/spreads to the
    * configured parallelism either way. */
  private[graft] def spreadIds(documents: DataFrame): Dataset[Long] = {
    val spark = documents.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    documents.select(col("doc_id")).repartition(parts, col("doc_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
  }

  /** [[spreadIds]] carrying a text column — for the generators whose
    * payloads embed the document's own text. */
  private[graft] def spreadIdText(documents: DataFrame,
      text: org.apache.spark.sql.Column): Dataset[(Long, String)] = {
    val spark = documents.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    documents.select(col("doc_id"), text.as("text"))
      .repartition(parts, col("doc_id"))
      .as[(Long, String)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING))
  }

  /** Shared decode-stage shape for every modality: repartition the wide
    * binary rows by id, then a per-partition narrow map over
    * (id, payload) — one place to fix partitioning/null behavior for
    * image, audio, and video alike. Corpora generated over
    * [[spreadIds]] arrive already spread at the target partition
    * count; re-exchanging them would shuffle the PAYLOAD bytes a
    * second time for no balance gain, so the repartition applies only
    * when the input's partitioning is actually narrower than the
    * target (the raw single-file-scan case). */
  /** The (id, payload) rows of a media frame at decode parallelism —
    * shared by EVERY modality's decode stage. Skips the exchange when
    * the input is already at least `parts` wide (the [[spreadIds]]
    * corpora), so payload bytes never ride a second shuffle; a narrow
    * input (single-file scan) still spreads by id. */
  private[graft] def mediaRows(media: DataFrame,
      parts: Int): Dataset[(Long, Array[Byte])] = {
    val src = media.select("media_id", "payload")
    // IMPORTANT: the spread check walks the ANALYZED plan — asking the
    // RDD for its partition count (`src.rdd.getNumPartitions`) looks
    // equivalent but materializes every upstream shuffle stage under
    // AQE, silently running the whole generation subtree TWICE
    // (measured: q141 warm 6→18 s before this walk replaced it).
    val spread = if (alreadySpread(media.queryExecution.analyzed, parts)) src
      else src.repartition(parts, col("media_id"))
    spread.as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY))
  }

  /** Whether a frame is already hash-spread at >= `parts` partitions:
    * true iff, descending only through narrow per-row operators
    * (project/filter/typed map — nothing that changes partitioning),
    * the plan reaches an explicit >= `parts` repartition (the
    * [[spreadIds]]/[[spreadIdText]] exchange). Conservative: any
    * unrecognized node means "not spread" and the decode stage
    * repartitions as it always did. */
  private def alreadySpread(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      parts: Int): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case r: RepartitionByExpression =>
        r.optNumPartitions.exists(_ >= parts)
      case r: Repartition => r.shuffle && r.numPartitions >= parts
      case p: Project => alreadySpread(p.child, parts)
      case f: Filter => alreadySpread(f.child, parts)
      case a: SubqueryAlias => alreadySpread(a.child, parts)
      case s: SerializeFromObject => alreadySpread(s.child, parts)
      case d: DeserializeToObject => alreadySpread(d.child, parts)
      case m: MapElements => alreadySpread(m.child, parts)
      case m: MapPartitions => alreadySpread(m.child, parts)
      case t: TypedFilter => alreadySpread(t.child, parts)
      case _ => false
    }
  }

  private def decodeStage[T](media: DataFrame, partitions: Int,
      enc: org.apache.spark.sql.Encoder[T])(f: (Long, Array[Byte]) => T): Dataset[T] = {
    val parts = if (partitions > 0) partitions
      else media.sparkSession.sessionState.conf.numShufflePartitions
    mediaRows(media, parts)
      .mapPartitions(it => it.map { case (id, p) => f(id, p) })(enc)
  }

  /** Batched header decode over a binary media frame — the REAL
    * replacement for the dimension half of [[decodeFeaturesStub]]: same
    * plan shape (repartition by id, per-partition narrow map), but the
    * width/height/depth/channels come from actually parsing the payload
    * bytes. Unparseable payloads yield format="unknown" with zeroed
    * dimensions (kept, not dropped — a curation gate wants to count
    * them). */
  def decodeImageHeaders(media: DataFrame, partitions: Int = 0): Dataset[ImageHeader] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[ImageHeader]) { (id, payload) =>
      val n = if (payload == null) 0L else payload.length.toLong
      parseImageHeader(payload) match {
        case Some((fmt, w, h, depth, ch, coding)) =>
          ImageHeader(id, fmt, w, h, depth, ch, coding, n)
        case None => ImageHeader(id, "unknown", 0, 0, 0, 0, "", n)
      }
    }

  /** Parsed audio header (WAV/RIFF). `n_samples` = data-chunk bytes
    * over block align (frames, i.e. samples per channel). */
  final case class AudioHeader(
      media_id: Long,
      format: String, // "wav" | "unknown"
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      n_bytes: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k).toInt)

  /** REAL decode of a WAV header (public spec, RIFF/WAVE): "RIFF" +
    * size + "WAVE", then chunks walked by their little-endian sizes
    * (odd sizes pad to even per the RIFF rule) until "fmt " yields
    * channels/rate/bits and "data" yields the payload size; frames =
    * data bytes / block align. Non-PCM fmt codes are fine — only the
    * frame geometry is read. */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // Long cursor: a hostile chunk declaring a near-Int.MaxValue size
    // must walk off the end cleanly (loop exit), never overflow into a
    // negative Int index
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var dataLen: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val j = i.toInt
      val size = le32(b, j + 4)
      val body = j + 8
      if (tag(b, j, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        val channels = le16(b, body + 2)
        val rate = le32(b, body + 4)
        val bits = le16(b, body + 14)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0) return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (tag(b, j, "data")) {
        // the data chunk's declared size may exceed the bytes present
        // (truncated capture) — clamp to what is actually there
        dataLen = Some(math.min(size, (b.length - body).toLong))
      }
      i = body.toLong + size + (size & 1L) // RIFF chunks pad to even
    }
    for ((rate, ch, bits) <- fmt; d <- dataLen) yield {
      val blockAlign = ch * ((bits + 7) / 8)
      (rate, ch, bits, d / blockAlign)
    }
  }

  /** Batched audio header decode — [[decodeImageHeaders]]'s shape for
    * the WAV path. */
  def decodeAudioHeaders(media: DataFrame, partitions: Int = 0): Dataset[AudioHeader] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[AudioHeader]) { (id, payload) =>
      val n = if (payload == null) 0L else payload.length.toLong
      parseWavHeader(payload) match {
        case Some((rate, ch, bits, frames)) =>
          AudioHeader(id, "wav", rate, ch, bits, frames, n)
        case None => AudioHeader(id, "unknown", 0, 0, 0, 0L, n)
      }
    }

  /** Minimal VALID 44-byte WAV header for a `dataLen`-byte payload —
    * fixture-synthesis counterpart of [[parseWavHeader]]. */
  def wavHeaderBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >>> 8).toInt); w8((v >>> 16).toInt); w8((v >>> 24).toInt) }
    def tagW(s: String): Unit = s.foreach(c => w8(c.toInt))
    val blockAlign = channels * ((bitsPerSample + 7) / 8)
    tagW("RIFF"); w32(36L + dataLen); tagW("WAVE")
    tagW("fmt "); w32(16L)
    w16(1) // PCM
    w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * blockAlign) // byte rate
    w16(blockAlign); w16(bitsPerSample)
    tagW("data"); w32(dataLen.toLong)
    out.toByteArray
  }

  /** Deterministic audio corpus with REAL WAV headers from the documents
    * table — [[imageCorpusFromDocuments]]'s pattern for the audio path:
    * rate/channels derive from the id, the UTF-8 text plays the role of
    * the sample data. */
  def audioCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map { case (id, text) =>
      val rates = Array(8000, 16000, 22050, 44100)
      val body = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
      // floorMod: Scala % is negative for negative ids, which would index
      // rates(-1) / emit invalid negative dimensions in the siblings below
      val header = wavHeaderBytes(rates(java.lang.Math.floorMod(id, 4L).toInt),
        java.lang.Math.floorMod(id, 2L).toInt + 1, 16, body.length)
      (id, header ++ body)
    }.toDF("media_id", "payload")
  }

  // ---- real JPEG pixel decode (baseline, via Jpeg) ------------------

  /** Per-image pixel statistics from the REAL baseline JPEG decode
    * ([[Jpeg.decodeJpegPixels]]): integer RGB channel sums /
    * sums-of-squares (grayscale expands to R=G=B; `channels` records
    * the source component count). Out-of-scope / malformed payloads
    * surface as format="unknown" with zeroed stats. */
  final case class JpegPixelStats(
      media_id: Long, format: String, width: Int, height: Int, channels: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      ssq_r: Long, ssq_g: Long, ssq_b: Long)

  /** Batched JPEG pixel-stats decode — the [[decodePngPixelStats]]
    * plan shape for the second image codec. */
  def decodeJpegPixelStats(media: DataFrame, partitions: Int = 0): Dataset[JpegPixelStats] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[JpegPixelStats]) { (id, payload) =>
      Jpeg.decodeJpegPixels(payload) match {
        case Some((w, h, nc, rgb)) =>
          val sums = new Array[Long](3)
          val ssqs = new Array[Long](3)
          var i = 0
          while (i < rgb.length) {
            val v = (rgb(i) & 0xff).toLong
            sums(i % 3) += v
            ssqs(i % 3) += v * v
            i += 1
          }
          JpegPixelStats(id, "jpeg", w, h, nc, sums(0), sums(1), sums(2),
            ssqs(0), ssqs(1), ssqs(2))
        case None =>
          JpegPixelStats(id, "unknown", 0, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L)
      }
    }

  /** Deterministic DC-only JPEG corpus from the documents table:
    * id-derived block grid (1-3 × 1-2 blocks of 8×8), block luma
    * p(bx, by) = (29·id + 17·bx + 23·by) mod 256; even ids encode
    * 3-component YCbCr with ACTIVE per-image chroma drawn from
    * {88, 108, 128, 148, 168} (so the color-conversion math is really
    * exercised — every member of that set × every luma sits ≥ 1e-6
    * from a .5 rounding boundary as an exact rational, verified
    * exhaustively, so round-then-clamp is integer-identical in the
    * engine and the oracle), odd ids grayscale — both REAL baseline
    * streams through the full DHT/DQT/SOF/SOS + entropy path. The
    * oracle replays the closed-form converted block constants (the
    * q119 pattern; see [[Jpeg]] for why DC-only is integer-exact). */
  def jpegDcCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val nbx = (java.lang.Math.floorMod(id, 3L) + 1).toInt
      val nby = (java.lang.Math.floorMod(id, 2L) + 1).toInt
      val comps = if (java.lang.Math.floorMod(id, 2L) == 0L) 3 else 1
      val cb = (88L + 20L * java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 2L), 5L)).toInt
      val cr = (88L + 20L * java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 2L) + 1L, 5L)).toInt
      (id, Jpeg.dcOnlyBytes(nbx * 8, nby * 8, comps, (bx, by, c) =>
        if (c == 0) java.lang.Math.floorMod(29L * id + 17L * bx + 23L * by, 256L).toInt
        else if (c == 1) cb else cr))
    }.toDF("media_id", "payload")
  }

  /** Deterministic PROGRESSIVE JPEG corpus — [[
    * jpegDcCorpusFromDocuments]]'s closed-form discipline through the
    * SOF2 multi-scan path ([[Jpeg.progressiveBytes]]): id-derived
    * block grid, DC-only coefficients delivered across four-plus
    * scans (interleaved DC first at Al=1, DC refinement bits, per-
    * component AC first + refinement whose EOB RUNS span the all-zero
    * blocks), decoding to the same exact constant blocks — so the
    * oracle replays pixels without replicating the decoder while the
    * engine really runs spectral selection + successive approximation.
    * Chroma for even ids comes from the verified rounding-safe set
    * {88..168 step 20} (see jpegDcCorpusFromDocuments). */
  def jpegProgressiveCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val nbx = (java.lang.Math.floorMod(id, 3L) + 1).toInt
      val nby = (java.lang.Math.floorMod(id, 2L) + 1).toInt
      val comps = if (java.lang.Math.floorMod(id, 2L) == 0L) 3 else 1
      val cb = (88L + 20L * java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 3L), 5L)).toInt
      val cr = (88L + 20L * java.lang.Math.floorMod(java.lang.Math.floorDiv(id, 3L) + 2L, 5L)).toInt
      (id, Jpeg.progressiveBytes(nbx * 8, nby * 8, comps, (bx, by, c, k) =>
        if (k != 0) 0
        else (if (c == 0)
          java.lang.Math.floorMod(37L * id + 19L * bx + 29L * by, 256L).toInt
        else if (c == 1) cb else cr) - 128))
    }.toDF("media_id", "payload")
  }

  /** Deterministic 4:2:0 DC-only JPEG corpus — [[
    * jpegDcCorpusFromDocuments]]'s pattern for the subsampled layout:
    * id-derived MCU grid (1-2 × 1 MCUs of 16×16), luma per 8-block
    * p(bx, by) = (31·id + 13·bx + 19·by) mod 256, per-MCU chroma from
    * the rounding-safe {88..168 step 20} set varying with mx (so the
    * half-resolution chroma plane indexing is load-bearing). */
  def jpeg420CorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val nmx = (java.lang.Math.floorMod(id, 2L) + 1).toInt
      (id, Jpeg.dcOnly420Bytes(nmx * 16, 16,
        (bx, by) => java.lang.Math.floorMod(31L * id + 13L * bx + 19L * by, 256L).toInt,
        (mx, my, c) =>
          (88L + 20L * java.lang.Math.floorMod(id + mx + my + 2L * c, 5L)).toInt))
    }.toDF("media_id", "payload")
  }

  /** [[jpeg420CorpusFromDocuments]] for 4:2:2 — half-WIDTH chroma:
    * id-derived MCU grid (1-2 × 1-2 MCUs of 16×8), luma per 8-block
    * p(bx, by) = (31·id + 13·bx + 19·by) mod 256, per-MCU chroma from
    * the rounding-safe set varying with BOTH mx and my (16×8 MCUs
    * stack vertically, so the chroma row indexing is load-bearing
    * too). */
  def jpeg422CorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val nmx = (java.lang.Math.floorMod(id, 2L) + 1).toInt
      val nmy = (java.lang.Math.floorMod(id / 2, 2L) + 1).toInt
      (id, Jpeg.dcOnly422Bytes(nmx * 16, nmy * 8,
        (bx, by) => java.lang.Math.floorMod(31L * id + 13L * bx + 19L * by, 256L).toInt,
        (mx, my, c) =>
          (88L + 20L * java.lang.Math.floorMod(id + mx + 3L * my + 2L * c, 5L)).toInt))
    }.toDF("media_id", "payload")
  }

  // ---- gzip text payload decode -------------------------------------

  /** Decoded gzip text payload: UTF-8 text + the sizes a lake ingest
    * job budgets by. Malformed/non-gzip payloads surface as ok=0 with
    * empty text (kept — a crawl archive audit counts them). */
  final case class GzipText(
      media_id: Long, ok: Int, text: String,
      compressed_bytes: Long, text_bytes: Long)

  /** Gzip-decompress a byte payload to UTF-8 text (java.util.zip.
    * GZIPInputStream — no new deps; crawl archives and WARC-adjacent
    * lakes store text this way). `maxBytes` bounds decompression (a
    * tiny hostile payload can inflate without limit — the zip-bomb
    * guard every ingest needs); over-limit payloads are REJECTED, not
    * truncated (truncation would silently corrupt the corpus). */
  def gunzipText(b: Array[Byte], maxBytes: Int = 1 << 26): Option[String] =
    gunzipBytes(b, maxBytes).map(new String(_, "UTF-8"))

  /** [[gunzipText]]'s byte-level core — the shape container decoders
    * need (.warc.gz / .tar.gz members are binary, not text). Same
    * zip-bomb bound, same reject-don't-truncate contract. */
  def gunzipBytes(b: Array[Byte], maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    try {
      if (b == null || b.length < 3) return None
      if ((b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return None
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > maxBytes) return None // zip bomb
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Gzip-compress text — fixture-synthesis counterpart (a REAL gzip
    * stream: CRC32 + ISIZE trailer, deflate body). */
  def gzipBytes(text: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(text.getBytes("UTF-8"))
    gz.close()
    out.toByteArray
  }

  /** Batched gzip text decode over a binary media frame — the same
    * decodeStage plan shape as the codec decoders. */
  def decodeGzipText(media: DataFrame, partitions: Int = 0,
      maxBytes: Int = 1 << 26): Dataset[GzipText] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[GzipText]) { (id, payload) =>
      val nIn = if (payload == null) 0L else payload.length.toLong
      gunzipText(payload, maxBytes) match {
        case Some(t) => GzipText(id, 1, t, nIn, t.getBytes("UTF-8").length.toLong)
        case None => GzipText(id, 0, "", nIn, 0L)
      }
    }

  /** Deterministic gzip corpus from the documents table: each doc's
    * text really deflates (CRC + trailer); every third id is a
    * corrupted stream (flipped deflate byte) the decoder must reject,
    * so the gate covers the error path too. */
  def gzipCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map {
      case (id, text) =>
        val b = gzipBytes(if (text == null) "" else text)
        if (java.lang.Math.floorMod(id, 3L) == 0L && b.length > 12)
          b(10) = (b(10) ^ 0x55).toByte // corrupt the deflate body
        (id, b)
    }.toDF("media_id", "payload")
  }

  // ---- real WAV sample decode (16-bit PCM) --------------------------

  /** Per-clip sample statistics from a REAL 16-bit PCM decode — exact
    * integer per-channel sums / sums-of-squares (channel 0 = left,
    * channel 1 = right; mono leaves the right slots zero, channels
    * past the second contribute only to the peak), the global peak
    * magnitude, and the frame count. Unparseable / non-PCM / non-16-bit
    * payloads surface as format="unknown" with zeroed stats (kept, not
    * dropped). */
  final case class WavSampleStats(
      media_id: Long, format: String, sample_rate: Int, channels: Int,
      n_frames: Long, sum_l: Long, sum_r: Long, ssq_l: Long, ssq_r: Long,
      peak_abs: Long)

  /** REAL sample decode of a 16-bit PCM WAV (the modality-completing
    * counterpart of [[parseWavHeader]]'s metadata walk, as
    * [[decodePngPixels]] is to [[parsePngHeader]]): RIFF chunk walk to
    * fmt + data, then the data chunk read as interleaved little-endian
    * SIGNED 16-bit samples — whole frames only, a trailing partial
    * frame is ignored, and a data size declared past the buffer clamps
    * to the bytes present (truncated capture). Returns (rate,
    * channels, interleaved samples); None unless fmt is PCM (code 1)
    * at 16 bits with sane geometry. */
  def decodeWavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b == null || b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // (code, channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, byte length present)
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val j = i.toInt
      val size = le32(b, j + 4)
      val body = j + 8
      if (tag(b, j, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        val rate = le32(b, body + 4)
        if (rate <= 0 || rate > Int.MaxValue) return None
        fmt = Some((le16(b, body), le16(b, body + 2), rate.toInt, le16(b, body + 14)))
      } else if (tag(b, j, "data")) {
        data = Some((body, math.min(size, (b.length - body).toLong).toInt))
      }
      i = body.toLong + size + (size & 1L) // RIFF chunks pad to even
    }
    for {
      (code, ch, rate, bits) <- fmt
      (off, len) <- data
      if code == 1 && bits == 16 && ch > 0
    } yield {
      val frames = len / (ch * 2)
      val out = new Array[Short](frames * ch)
      var k = 0
      // le16 yields 0..65535; toShort reinterprets the low 16 bits as
      // the signed sample — exactly LE signed PCM
      while (k < out.length) { out(k) = le16(b, off + 2 * k).toShort; k += 1 }
      (rate, ch, out)
    }
  }

  /** Batched sample-stats decode over a binary media frame — the REAL
    * replacement for the audio half of [[decodeFeaturesStub]], same
    * decodeStage plan shape as the header walks and
    * [[decodePngPixelStats]]. */
  def decodeWavSampleStats(media: DataFrame, partitions: Int = 0): Dataset[WavSampleStats] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[WavSampleStats]) { (id, payload) =>
      decodeWavSamples(payload) match {
        case Some((rate, ch, s)) =>
          var sumL = 0L; var sumR = 0L; var ssqL = 0L; var ssqR = 0L
          var peak = 0L
          var k = 0
          while (k < s.length) {
            val v = s(k).toLong
            val c = k % ch
            if (c == 0) { sumL += v; ssqL += v * v }
            else if (c == 1) { sumR += v; ssqR += v * v }
            val a = math.abs(v)
            if (a > peak) peak = a
            k += 1
          }
          WavSampleStats(id, "wav", rate, ch, s.length / ch,
            sumL, sumR, ssqL, ssqR, peak)
        case None =>
          WavSampleStats(id, "unknown", 0, 0, 0L, 0L, 0L, 0L, 0L, 0L)
      }
    }

  /** Deterministic FULL-SAMPLE 16-bit PCM corpus from the documents
    * table: id-derived geometry (mono/stereo, four rates, 32..96
    * frames), sample(i, c) = ((37·id + 11·i + 23·c) mod 4096) − 2048,
    * really encoded little-endian behind a real RIFF header — the
    * [[pngPixelCorpusFromDocuments]] pattern for audio: the oracle
    * replays the closed-form channel sums, so the engine only matches
    * if the byte-level PCM decode reproduces every sample. */
  def wavPcmCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val rates = Array(8000, 16000, 22050, 44100)
      val ch = java.lang.Math.floorMod(id, 2L).toInt + 1
      val n = (java.lang.Math.floorMod(id, 5L) * 16 + 32).toInt
      val body = new Array[Byte](n * ch * 2)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          val v = (java.lang.Math.floorMod(37L * id + 11L * i + 23L * c, 4096L) - 2048L).toInt
          val k = (i * ch + c) * 2
          body(k) = (v & 0xff).toByte
          body(k + 1) = ((v >> 8) & 0xff).toByte
          c += 1
        }
        i += 1
      }
      val header = wavHeaderBytes(
        rates(java.lang.Math.floorMod(id, 4L).toInt), ch, 16, body.length)
      (id, header ++ body)
    }.toDF("media_id", "payload")
  }

  /** Parsed video header (MP4/ISO BMFF). Dimensions come from the first
    * video track's tkhd (16.16 fixed point, integer part); duration_ms
    * from mvhd's duration/timescale. */
  final case class VideoHeader(
      media_id: Long,
      format: String, // "mp4" | "unknown"
      width: Int,
      height: Int,
      timescale: Long,
      duration_ms: Long,
      n_bytes: Long)

  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) & 0xffffffffL) << 32 |
    (be32(b, i + 4) & 0xffffffffL)

  /** REAL decode of an MP4 (ISO BMFF) header: top-level box walk to
    * `moov`, then its children — `mvhd` (v0/v1) for timescale+duration,
    * each `trak`'s `tkhd` (v0/v1) for 16.16 fixed-point width/height;
    * the first track with a nonzero width is the video track (audio
    * tracks carry zero dimensions). Box sizes are big-endian; size 1
    * means a 64-bit largesize follows; size 0 (to end of file) is only
    * legal for the last top-level box. */
  def parseMp4Header(b: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (b == null || b.length < 16) return None
    // bounded box iteration: (offset, end) pairs of each child of [lo, hi)
    def children(lo: Int, hi: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val size32 = be32(b, i) & 0xffffffffL
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val (body, size) =
          if (size32 == 1L && i + 16 <= hi) (i + 16, be64(b, i + 8))
          else if (size32 == 0L) (i + 8, (hi - i).toLong) // to end
          else (i + 8, size32)
        val end = if (size < 8 || i + size > hi) hi else (i + size).toInt
        val r = (typ, body, end)
        i = end
        r
      }
    }
    if (!children(0, b.length).take(1).exists(_._1 == "ftyp")) return None
    children(0, b.length).find(_._1 == "moov").flatMap { case (_, mLo, mHi) =>
      var ts = Option.empty[(Long, Long)] // (timescale, duration)
      var dims = Option.empty[(Int, Int)]
      for ((typ, lo, hi) <- children(mLo, mHi)) typ match {
        case "mvhd" if ts.isEmpty && hi - lo >= 20 =>
          val v = b(lo) & 0xff
          // a truncated v1 body must NOT fall back to v0 offsets — those
          // bytes are the middle of modification_time, not timescale
          ts = if (v == 1) {
            if (hi - lo >= 32)
              Some(((be32(b, lo + 20) & 0xffffffffL), be64(b, lo + 24)))
            else None
          } else Some(((be32(b, lo + 12) & 0xffffffffL), be32(b, lo + 16) & 0xffffffffL))
        case "trak" if dims.isEmpty =>
          // hi2 is clamped to the buffer, but a capture truncated right
          // after the box header leaves an empty body (lo2 == hi2) —
          // guard before the version-byte read
          for ((t2, lo2, hi2) <- children(lo, hi) if t2 == "tkhd" && hi2 - lo2 >= 1) {
            val v = b(lo2) & 0xff
            val wOff = if (v == 1) 88 else 76 // v1 widens creation/mod/duration
            if (hi2 - lo2 >= wOff + 8) {
              val w = be16(b, lo2 + wOff) // integer part of 16.16
              val h = be16(b, lo2 + wOff + 4)
              if (w > 0 && h > 0 && dims.isEmpty) dims = Some((w, h))
            }
          }
        case _ => ()
      }
      for ((scale, dur) <- ts; (w, h) <- dims if scale > 0)
        yield (w, h, scale, dur * 1000L / scale)
    }
  }

  /** Bounded ISO-BMFF child-box iterator over [lo, hi) — shared by the
    * sample-table walk; mirrors [[parseMp4Header]]'s inline iterator
    * (64-bit and to-end sizes, malformed sizes clamp to the parent). */
  private def mp4Children(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val size32 = be32(b, i) & 0xffffffffL
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val (body, size) =
          if (size32 == 1L && i + 16 <= hi) (i + 16, be64(b, i + 8))
          else if (size32 == 0L) (i + 8, (hi - i).toLong)
          else (i + 8, size32)
        val end = if (size < 8 || i + size > hi) hi else (i + size).toInt
        val r = (typ, body, end)
        i = end
        r
      }
    }

  /** One track's sample-table summary (the stbl walk): sample count
    * and byte total from stsz (uniform or per-sample), chunk count
    * from stco, media duration in timescale ticks from stts. */
  final case class TrackSamples(
      track_idx: Int, n_samples: Long, total_sample_bytes: Long,
      n_chunks: Long, duration_ticks: Long)

  /** REAL sample-table decode (ISO 14496-12 stbl): walk moov → trak →
    * mdia → minf → stbl and read stts (decoding-time deltas), stsz
    * (sample sizes — both the uniform and the per-sample-table form),
    * and stco (chunk offsets) per track. This is the metadata level a
    * lake job actually uses for video (frame counts, byte budgets,
    * durations — the payload itself stays codec-opaque). Tracks
    * missing any of the three boxes are skipped; None when no track
    * carries a complete table or the container is malformed. */
  def parseMp4SampleTables(b: Array[Byte]): Option[Seq[TrackSamples]] = {
    if (b == null || b.length < 16) return None
    if (!mp4Children(b, 0, b.length).take(1).exists(_._1 == "ftyp")) return None
    mp4Children(b, 0, b.length).find(_._1 == "moov").flatMap { case (_, mLo, mHi) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[TrackSamples]
      var idx = 0
      for ((typ, lo, hi) <- mp4Children(b, mLo, mHi) if typ == "trak") {
        val stbl = for {
          (t1, l1, h1) <- mp4Children(b, lo, hi).find(_._1 == "mdia")
          (t2, l2, h2) <- mp4Children(b, l1, h1).find(_._1 == "minf")
          (t3, l3, h3) <- mp4Children(b, l2, h2).find(_._1 == "stbl")
        } yield (l3, h3)
        stbl.foreach { case (sLo, sHi) =>
          var dur = Option.empty[Long]
          var sz = Option.empty[(Long, Long)] // (count, bytes)
          var chunks = Option.empty[Long]
          for ((t, lo2, hi2) <- mp4Children(b, sLo, sHi)) t match {
            case "stts" if hi2 - lo2 >= 8 =>
              val n = be32(b, lo2 + 4)
              if (n >= 0 && lo2 + 8 + 8L * n <= hi2) {
                var s = 0L; var k = 0
                while (k < n) {
                  s += (be32(b, lo2 + 8 + 8 * k) & 0xffffffffL) *
                    (be32(b, lo2 + 12 + 8 * k) & 0xffffffffL)
                  k += 1
                }
                dur = Some(s)
              }
            case "stsz" if hi2 - lo2 >= 12 =>
              val uniform = be32(b, lo2 + 4) & 0xffffffffL
              val n = be32(b, lo2 + 8)
              if (n >= 0) {
                if (uniform != 0L) sz = Some((n.toLong, uniform * n))
                else if (lo2 + 12 + 4L * n <= hi2) {
                  var s = 0L; var k = 0
                  while (k < n) { s += be32(b, lo2 + 12 + 4 * k) & 0xffffffffL; k += 1 }
                  sz = Some((n.toLong, s))
                }
              }
            case "stco" if hi2 - lo2 >= 8 =>
              val n = be32(b, lo2 + 4)
              if (n >= 0 && lo2 + 8 + 4L * n <= hi2) chunks = Some(n.toLong)
            case _ => ()
          }
          for (d <- dur; (n, tot) <- sz; c <- chunks)
            out += TrackSamples(idx, n, tot, c, d)
        }
        idx += 1
      }
      if (out.isEmpty) None else Some(out.toSeq)
    }
  }

  /** Extract the SAMPLE BYTES of the first per-sample-sized track —
    * the step from q125's table walk to actual frame payloads — with a
    * TAGGED error family, so an audit can tell a layout the walk
    * declines from bytes the walk cannot trust:
    *
    *  - `"not_mp4"`: no leading ftyp, no moov, or no track carrying a
    *    sample table at all — the payload isn't this container.
    *  - `"unsupported_layout"`: a well-formed table the walk declines
    *    (uniform-size stsz — no per-sample boundaries; >1 chunk with
    *    no stsc map; sample count over `maxFrames`). The bytes are
    *    fine; the layout is out of scope.
    *  - `"corrupt"`: tables that contradict each other or the buffer
    *    (malformed entry lists, an stsc map that doesn't cover the
    *    samples, offsets running past the payload). Resynchronizing
    *    would fabricate frames, so the track rejects whole.
    *
    * Multi-chunk layouts (the normal output of real muxers, which
    * interleave audio/video chunks) walk ISO 14496-12 stsc: entry
    * (first_chunk, samples_per_chunk) runs apply from their
    * first_chunk until the next entry's, samples assign to chunks in
    * order, and each chunk's samples pack consecutively from its stco
    * offset. A missing stsc with ONE chunk keeps the everything-in-
    * chunk-1 default. Returns (sample_idx, bytes) pairs. */
  def extractMp4FramesTagged(b: Array[Byte],
      maxFrames: Int = 10000): Either[String, Seq[(Int, Array[Byte])]] = {
    if (b == null || b.length < 16) return Left("not_mp4")
    if (!mp4Children(b, 0, b.length).take(1).exists(_._1 == "ftyp"))
      return Left("not_mp4")
    mp4Children(b, 0, b.length).find(_._1 == "moov") match {
      case None => Left("not_mp4")
      case Some((_, mLo, mHi)) =>
        // first track that extracts wins; else the first REAL error
        // (a track with no table at all is a skip, not an error)
        var firstErr = Option.empty[String]
        for ((_, lo, hi) <- mp4Children(b, mLo, mHi).filter(_._1 == "trak")) {
          val stbl = for {
            (_, l1, h1) <- mp4Children(b, lo, hi).find(_._1 == "mdia")
            (_, l2, h2) <- mp4Children(b, l1, h1).find(_._1 == "minf")
            (_, l3, h3) <- mp4Children(b, l2, h2).find(_._1 == "stbl")
          } yield (l3, h3)
          stbl.foreach { case (sLo, sHi) =>
            extractTrackFrames(b, sLo, sHi, maxFrames) match {
              case Right(frames) => return Right(frames)
              case Left("no_table") => ()
              case Left(e) => if (firstErr.isEmpty) firstErr = Some(e)
            }
          }
        }
        Left(firstErr.getOrElse("not_mp4"))
    }
  }

  /** Untagged compatibility form of [[extractMp4FramesTagged]]. */
  def extractMp4Frames(b: Array[Byte],
      maxFrames: Int = 10000): Option[Seq[(Int, Array[Byte])]] =
    extractMp4FramesTagged(b, maxFrames).toOption

  /** One track's frame extraction from its stbl span — see
    * [[extractMp4FramesTagged]] for the error families; the private
    * `"no_table"` marks a track with no stsz+stco at all (skipped by
    * the caller, never surfaced). */
  private def extractTrackFrames(b: Array[Byte], sLo: Int, sHi: Int,
      maxFrames: Int): Either[String, Seq[(Int, Array[Byte])]] = {
    var sizes = Option.empty[Array[Long]]
    var uniform = false
    var offsets = Option.empty[Array[Long]]
    var stscMap = Option.empty[Array[(Long, Long)]]
    var badTable = false
    var oversize = false
    for ((t, lo2, hi2) <- mp4Children(b, sLo, sHi)) t match {
      case "stsz" if hi2 - lo2 >= 12 =>
        val u = be32(b, lo2 + 4) & 0xffffffffL
        val n = be32(b, lo2 + 8)
        if (u != 0L) uniform = true
        else if (n < 0) badTable = true
        else if (n > maxFrames) oversize = true
        else if (lo2 + 12 + 4L * n <= hi2)
          sizes = Some(Array.tabulate(n)(k =>
            be32(b, lo2 + 12 + 4 * k) & 0xffffffffL))
        else badTable = true
      case "stco" if hi2 - lo2 >= 8 =>
        val n = be32(b, lo2 + 4)
        if (n >= 0 && lo2 + 8 + 4L * n <= hi2)
          offsets = Some(Array.tabulate(n)(k =>
            be32(b, lo2 + 8 + 4 * k) & 0xffffffffL))
        else badTable = true
      case "stsc" if hi2 - lo2 >= 8 =>
        val n = be32(b, lo2 + 4)
        if (n >= 0 && lo2 + 8 + 12L * n <= hi2)
          stscMap = Some(Array.tabulate(n)(k => (
            be32(b, lo2 + 8 + 12 * k) & 0xffffffffL,
            be32(b, lo2 + 12 + 12 * k) & 0xffffffffL)))
        else badTable = true
      case _ => ()
    }
    if (badTable) Left("corrupt")
    else if (uniform) Left("unsupported_layout")
    else if (oversize) Left("unsupported_layout")
    else (sizes, offsets) match {
      case (None, None) => Left("no_table")
      case (Some(sz), Some(off)) =>
        // An empty-but-valid track (stsz n=0 with an offset table) has
        // nothing to extract and nothing to distrust: Right(Nil), not
        // "corrupt" — the default one-chunk map below would otherwise
        // trip walkChunkedSamples' samples_per_chunk<=0 guard.
        if (sz.isEmpty) return Right(Nil)
        stscMap match {
          case Some(map) => walkChunkedSamples(b, sz, off, map)
          case None if off.length == 1 =>
            walkChunkedSamples(b, sz, off, Array((1L, sz.length.toLong)))
          case None => Left("unsupported_layout")
        }
      case _ => Left("corrupt") // one table present without its partner
    }
  }

  /** Assign per-sample sizes to chunks through the stsc run map and
    * copy each frame's byte run. Strict: a map that doesn't start at
    * chunk 1, doesn't increase, carries a zero samples-per-chunk, or
    * leaves samples unassigned after the last chunk is "corrupt", as
    * is any frame extent outside the buffer. */
  private def walkChunkedSamples(b: Array[Byte], sz: Array[Long],
      off: Array[Long], map: Array[(Long, Long)])
      : Either[String, Seq[(Int, Array[Byte])]] = {
    if (map.isEmpty || map(0)._1 != 1L || map.exists(_._2 <= 0L))
      return Left("corrupt")
    var k = 0
    while (k + 1 < map.length) {
      if (map(k + 1)._1 <= map(k)._1) return Left("corrupt")
      k += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])](sz.length)
    var s = 0   // next sample index
    var e = 0   // current stsc entry
    var c = 1L  // current chunk number (1-based, stco order)
    while (s < sz.length && c <= off.length) {
      while (e + 1 < map.length && map(e + 1)._1 <= c) e += 1
      var p = off((c - 1).toInt)
      var j = 0L
      while (j < map(e)._2 && s < sz.length) {
        val len = sz(s)
        if (p < 0 || len > Int.MaxValue || p + len > b.length.toLong)
          return Left("corrupt")
        out += ((s, java.util.Arrays.copyOfRange(b, p.toInt, (p + len).toInt)))
        p += len; s += 1; j += 1
      }
      c += 1
    }
    if (s < sz.length) Left("corrupt") // chunks exhausted, samples left
    else Right(out.toSeq)
  }

  final case class VideoFramePHash(
      media_id: Long, frame_idx: Int, ok: Int, phash: Long, err: String)

  /** Video keyframe fingerprints: extract each MP4 sample
    * ([[extractMp4FramesTagged]]), decode it as a baseline JPEG
    * ([[Jpeg.decodeJpegPixels]] — the MJPEG-style layout the fixtures
    * mux), pHash the plane — one row per frame, so the banded pair
    * machinery finds near-dup CLIPS by shared frame hashes. Error rows
    * carry their FAMILY so audits don't conflate them: a frame that
    * fails to decode surfaces (frame_idx, ok=0, err="frame_decode"); a
    * container whose walk fails surfaces one ok=0 row with the walk's
    * tag ("not_mp4" / "unsupported_layout" / "corrupt"); ok=1 rows
    * carry err="". */
  def decodeMp4FramePHash(media: DataFrame,
      partitions: Int = 0): Dataset[VideoFramePHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        extractMp4FramesTagged(p) match {
          case Right(frames) => frames.map { case (fi, bytes) =>
            // same gray-plane hash as the image stages (grayPHash) so a
            // video keyframe and a still of the same content collide
            val h = grayPHash(id,
              Jpeg.decodeJpegPixels(bytes).map { case (w, hh, _, px) => (w, hh, px) })
            VideoFramePHash(id, fi, h.ok, h.phash,
              if (h.ok == 1) "" else "frame_decode")
          }
          case Left(family) => Seq(VideoFramePHash(id, 0, 0, 0L, family))
        }
      }
  }

  /** Deterministic MJPEG-in-MP4 corpus — the q140 fixture: each doc is
    * a REAL MP4 (ftyp + mdat + moov — data first, so the stco offsets
    * are known at build time) whose one video track's samples are
    * 3 + id%4 (3..6) DC-only 64x64 grayscale JPEGs — a full 8x8
    * macro-block pattern per frame (the q133 pattern family: enough
    * structure that distinct id/frame patterns hash apart; a 16x16
    * draft with only 4 blocks collided). Layout varies with the id so
    * the gate covers both chunk walks: id%3==1 clips mux TWO chunks
    * (frame 0 alone, then 17 filler bytes a single-chunk walk would
    * misread as frame 1's head, then the rest) mapped by a 2-entry
    * stsc; the others are single-chunk with no stsc (the default-map
    * path). Every id%6==4 clip's frame 1 SOI is zeroed inside mdat
    * (sizes stay true, so extraction succeeds and the DECODE error
    * path surfaces per-frame as err="frame_decode").
    * ([[videoCorpusFromDocuments]] is the header-level fixture; this
    * one carries real frame data.) */
  def mjpegVideoCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val fm = (x: Long, m: Long) => java.lang.Math.floorMod(x, m)
      val nf = (3L + fm(id, 4L)).toInt
      val frames = (0 until nf).map { f =>
        Jpeg.dcOnlyBytes(64, 64, 1, (bx, by, _) =>
          (((fm(id, 10L) * 73L + f * 29L +
            bx * 37L + by * 91L) % 17L) * 15L).toInt)
      }
      val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32s(0L) ++
        "isom".getBytes("ISO-8859-1"))
      val multi = fm(id, 3L) == 1L
      val filler = if (multi) Array.fill[Byte](17)(0x55) else Array.emptyByteArray
      val mdatBody = frames.head ++ filler ++
        frames.tail.foldLeft(Array.emptyByteArray)(_ ++ _)
      val mdat = mp4Box("mdat", mdatBody)
      val off0 = ftyp.length + 8 // first frame: right after the mdat header
      val stts = mp4Box("stts", u32s(0L, 1L, nf.toLong, 100L))
      val stsz = mp4Box("stsz", u32s(0L, 0L, nf.toLong),
        u32s(frames.map(_.length.toLong): _*))
      val tableBoxes =
        if (multi) {
          val off1 = off0 + frames.head.length + filler.length
          // stsc entries: (first_chunk, samples_per_chunk, sdesc_idx)
          val stsc = mp4Box("stsc", u32s(0L, 2L),
            u32s(1L, 1L, 1L), u32s(2L, (nf - 1).toLong, 1L))
          Seq(stts, stsc, stsz,
            mp4Box("stco", u32s(0L, 2L), u32s(off0.toLong, off1.toLong)))
        } else
          Seq(stts, stsz, mp4Box("stco", u32s(0L, 1L), u32s(off0.toLong)))
      val moov = mp4Box("moov", mp4Box("trak", mp4Box("mdia",
        mp4Box("minf", mp4Box("stbl", tableBoxes: _*)))))
      val out = ftyp ++ mdat ++ moov
      if (fm(id, 6L) == 4L) {
        // frame 1's first bytes inside mdat (after the filler when the
        // clip is multi-chunk — id%6==4 implies id%3==1, so it always is)
        val p1 = off0 + frames.head.length + filler.length
        out(p1) = 0; out(p1 + 1) = 0
      }
      (id, out)
    }.toDF("media_id", "payload")
  }

  /** Per-(clip, track) sample-table stats over a binary media frame —
    * one output row per complete track table; unparseable payloads
    * surface as a single format="unknown" row (kept, not dropped). */
  final case class Mp4TrackStats(
      media_id: Long, format: String, track_idx: Int, n_samples: Long,
      total_sample_bytes: Long, n_chunks: Long, duration_ticks: Long)

  def decodeMp4SampleStats(media: DataFrame, partitions: Int = 0): Dataset[Mp4TrackStats] = {
    val parts = if (partitions > 0) partitions
      else media.sparkSession.sessionState.conf.numShufflePartitions
    Multimodal.mediaRows(media, parts)
      .flatMap { case (id, p) =>
        parseMp4SampleTables(p) match {
          case Some(ts) => ts.map(t => Mp4TrackStats(id, "mp4", t.track_idx,
            t.n_samples, t.total_sample_bytes, t.n_chunks, t.duration_ticks))
          case None => Seq(Mp4TrackStats(id, "unknown", 0, 0L, 0L, 0L, 0L))
        }
      }(org.apache.spark.sql.Encoders.product[Mp4TrackStats])
  }

  /** Batched video header decode — [[decodeImageHeaders]]'s shape for
    * the MP4 path. */
  def decodeVideoHeaders(media: DataFrame, partitions: Int = 0): Dataset[VideoHeader] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[VideoHeader]) { (id, payload) =>
      val n = if (payload == null) 0L else payload.length.toLong
      parseMp4Header(payload) match {
        case Some((w, h, scale, ms)) => VideoHeader(id, "mp4", w, h, scale, ms, n)
        case None => VideoHeader(id, "unknown", 0, 0, 0L, 0L, n)
      }
    }

  private[multimodal] def mp4Box(typ: String, bodies: Array[Byte]*): Array[Byte] = {
    val body = bodies.foldLeft(Array.emptyByteArray)(_ ++ _)
    val out = new java.io.ByteArrayOutputStream(8 + body.length)
    val size = 8 + body.length
    out.write((size >>> 24) & 0xff); out.write((size >>> 16) & 0xff)
    out.write((size >>> 8) & 0xff); out.write(size & 0xff)
    typ.foreach(c => out.write(c.toInt))
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private[multimodal] def u32s(vs: Long*): Array[Byte] =
    vs.flatMap(v => Seq(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray

  /** Deterministic sample-table MP4 corpus from the documents table:
    * id-derived track count (1-2), per-track stts/stsz/stco with both
    * stsz forms exercised (even ids carry a per-sample size table,
    * odd ids the uniform-size shortcut) behind the real ftyp + moov →
    * trak → mdia → minf → stbl nesting. The oracle replays the
    * closed-form sums ([[parseMp4SampleTables]]'s
    * generate-parse-replay gate). */
  def mp4SampleCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val fm = (x: Long, m: Long) => java.lang.Math.floorMod(x, m)
      val ntr = (fm(id, 2L) + 1).toInt
      val traks = (0 until ntr).map { t =>
        val n = ((fm(id + t, 4L) + 1) * 3).toInt
        val delta = (fm(id, 5L) + 1) * 100L
        val stts = mp4Box("stts", u32s(0L, 1L, n.toLong, delta))
        val stsz =
          if (fm(id, 2L) == 0L)
            mp4Box("stsz", u32s(0L, 0L, n.toLong),
              u32s((0 until n).map(i => fm(7L * id + 3L * i + 11L * t, 100L) + 10L): _*))
          else mp4Box("stsz", u32s(0L, fm(id, 50L) + 20L, n.toLong))
        val nc = fm(id + t, 2L) + 1
        val stco = mp4Box("stco", u32s(0L, nc), u32s((0L until nc).map(1000L + _): _*))
        mp4Box("trak", mp4Box("mdia", mp4Box("minf",
          mp4Box("stbl", stts, stsz, stco))))
      }
      val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32s(0L) ++
        "isom".getBytes("ISO-8859-1"))
      (id, ftyp ++ mp4Box("moov", traks: _*))
    }.toDF("media_id", "payload")
  }

  /** Minimal VALID MP4 prefix (ftyp + moov[mvhd v0, trak[tkhd v0]]) —
    * fixture-synthesis counterpart of [[parseMp4Header]]. */
  def mp4HeaderBytes(w: Int, h: Int, timescale: Long, duration: Long): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + body.length)
      val size = 8 + body.length
      out.write((size >>> 24) & 0xff); out.write((size >>> 16) & 0xff)
      out.write((size >>> 8) & 0xff); out.write(size & 0xff)
      typ.foreach(c => out.write(c.toInt))
      out.write(body, 0, body.length)
      out.toByteArray
    }
    def u32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L) ++
      "isom".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd", u32(0L) ++ u32(0L) ++ u32(0L) ++
      u32(timescale) ++ u32(duration) ++ Array.fill(80)(0.toByte))
    val tkhdBody = new Array[Byte](84)
    System.arraycopy(u32((w.toLong << 16)), 0, tkhdBody, 76, 4)
    System.arraycopy(u32((h.toLong << 16)), 0, tkhdBody, 80, 4)
    val trak = box("trak", box("tkhd", tkhdBody))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  /** Deterministic video corpus with REAL MP4 headers from the documents
    * table — completes the image/audio/video triple: dimensions,
    * timescale, and duration derive from the id; the UTF-8 text plays
    * the role of the mdat payload. */
  def videoCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map { case (id, text) =>
      val w = (java.lang.Math.floorMod(id, 3L) * 320 + 640).toInt
      val h = (java.lang.Math.floorMod(id, 3L) * 180 + 360).toInt
      val dur = java.lang.Math.floorMod(id, 100L) * 600 + 600 // in timescale-600 units
      val body = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
      (id, mp4HeaderBytes(w, h, 600L, dur) ++ body)
    }.toDF("media_id", "payload")
  }

  /** Minimal VALID PNG prefix: signature + IHDR chunk (with real CRC32)
    * for the given dimensions — 33 bytes. Fixture-synthesis counterpart
    * of [[parsePngHeader]]. */
  def pngHeaderBytes(w: Int, h: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33)
    PngSig.foreach(out.write)
    def w32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32(13)
    val chunk = new java.io.ByteArrayOutputStream(17)
    "IHDR".foreach(c => chunk.write(c.toInt))
    def c32(v: Int): Unit = {
      chunk.write((v >>> 24) & 0xff); chunk.write((v >>> 16) & 0xff)
      chunk.write((v >>> 8) & 0xff); chunk.write(v & 0xff)
    }
    c32(w); c32(h)
    chunk.write(bitDepth); chunk.write(colorType)
    chunk.write(0); chunk.write(0); chunk.write(0) // compression/filter/interlace
    val cb = chunk.toByteArray
    out.write(cb, 0, cb.length)
    val crc = new java.util.zip.CRC32
    crc.update(cb)
    w32(crc.getValue.toInt)
    out.toByteArray
  }

  // ---- real PNG pixel decode (IDAT inflate + scanline unfilter) -----

  /** Per-image pixel statistics from a REAL decode — integer sums and
    * sums-of-squares per channel (exact, hash-comparable) plus floored
    * milli means. Unparseable / non-8-bit-RGB payloads surface as
    * format="unknown" with zeroed stats (kept, not dropped). */
  final case class PngPixelStats(
      media_id: Long, format: String, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      ssq_r: Long, ssq_g: Long, ssq_b: Long,
      mean_r_milli: Long, mean_g_milli: Long, mean_b_milli: Long)

  /** The Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def w32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32(data.length)
    val body = typ.getBytes("US-ASCII") ++ data
    out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32
    crc.update(body)
    w32(crc.getValue.toInt)
  }

  /** FULL PNG encoder for 8-bit RGB (colorType 2): signature + IHDR
    * (via [[pngHeaderBytes]]), one zlib-deflated IDAT of filtered
    * scanlines — filter type cycles `y mod 5`, so every PNG filter
    * (None/Sub/Up/Average/Paeth) appears in every image taller than 4
    * rows — and IEND. Fixture-synthesis counterpart of
    * [[decodePngPixels]]: the decoder must invert the filters and the
    * deflate stream exactly to reproduce `pixel(x, y, c)`. */
  def pngBytes(w: Int, h: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"pngBytes: need positive dims, got ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    val raw = Array.ofDim[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < bpp) {
          raw(y * stride + x * bpp + c) = (pixel(x, y, c) & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val filtered = new java.io.ByteArrayOutputStream(h * (stride + 1))
    y = 0
    while (y < h) {
      val ft = y % 5
      filtered.write(ft)
      var i = 0
      while (i < stride) {
        val v = raw(y * stride + i) & 0xff
        val left = if (i >= bpp) raw(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case _ => v - paeth(left, up, ul)
        }
        filtered.write(f & 0xff)
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater // default = zlib wrapper
    defl.setInput(filtered.toByteArray)
    defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    val head = pngHeaderBytes(w, h, 8, 2)
    out.write(head, 0, head.length)
    pngChunk(out, "IDAT", z.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL pixel decode of an 8-bit RGB PNG (the modality-completing
    * counterpart of [[parsePngHeader]]'s metadata walk): IHDR parsed,
    * IDAT chunks concatenated in stream order, zlib-inflated
    * (java.util.zip.Inflater — no new deps), and every scanline
    * unfiltered per its leading filter-type byte. Returns (w, h, raw
    * interleaved RGB bytes); None for any other color type / bit
    * depth, truncated streams, or malformed chunk walks. */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      parsePngHeader(b) match {
        case Some(("png", w, h, 8, 3, _)) =>
          // collect IDAT payloads with a bounds-checked chunk walk
          val idat = new java.io.ByteArrayOutputStream()
          var i = 8 + 4 + 4 + 13 + 4 // after IHDR
          var done = false
          while (!done) {
            if (i + 8 > b.length) return None
            val len = be32(b, i)
            if (len < 0 || i + 12 + len > b.length) return None
            val typ = new String(b, i + 4, 4, "US-ASCII")
            if (typ == "IDAT") idat.write(b, i + 8, len)
            if (typ == "IEND") done = true
            i += 12 + len
          }
          val infl = new java.util.zip.Inflater
          infl.setInput(idat.toByteArray)
          val stride = w * 3
          val expect = h * (stride + 1)
          val flt = new Array[Byte](expect)
          var off = 0
          while (off < expect && !infl.finished()) {
            val n = infl.inflate(flt, off, expect - off)
            if (n == 0 && infl.needsInput()) return None // truncated
            off += n
          }
          infl.end()
          if (off != expect) return None
          val px = new Array[Byte](h * stride)
          var y = 0
          while (y < h) {
            val ft = flt(y * (stride + 1)) & 0xff
            if (ft > 4) return None
            var i2 = 0
            while (i2 < stride) {
              val f = flt(y * (stride + 1) + 1 + i2) & 0xff
              val left = if (i2 >= 3) px(y * stride + i2 - 3) & 0xff else 0
              val up = if (y > 0) px((y - 1) * stride + i2) & 0xff else 0
              val ul = if (y > 0 && i2 >= 3) px((y - 1) * stride + i2 - 3) & 0xff else 0
              val v = ft match {
                case 0 => f
                case 1 => f + left
                case 2 => f + up
                case 3 => f + (left + up) / 2
                case _ => f + paeth(left, up, ul)
              }
              px(y * stride + i2) = (v & 0xff).toByte
              i2 += 1
            }
            y += 1
          }
          Some((w, h, px))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Batched pixel-stats decode over a binary media frame — the REAL
    * replacement for the image half of [[decodeFeaturesStub]]: channel
    * sums / sums-of-squares / milli means from actually inflating and
    * unfiltering the payload. Same decodeStage plan shape as the
    * header walks. */
  def decodePngPixelStats(media: DataFrame, partitions: Int = 0): Dataset[PngPixelStats] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[PngPixelStats]) { (id, payload) =>
      decodePngPixels(payload) match {
        case Some((w, h, px)) =>
          val sums = new Array[Long](3)
          val ssqs = new Array[Long](3)
          var i = 0
          while (i < px.length) {
            val v = (px(i) & 0xff).toLong
            sums(i % 3) += v
            ssqs(i % 3) += v * v
            i += 1
          }
          val n = w.toLong * h
          PngPixelStats(id, "png", w, h, sums(0), sums(1), sums(2),
            ssqs(0), ssqs(1), ssqs(2),
            1000L * sums(0) / n, 1000L * sums(1) / n, 1000L * sums(2) / n)
        case None =>
          PngPixelStats(id, "unknown", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      }
    }

  /** Deterministic FULL-PIXEL PNG corpus from the documents table:
    * small id-derived dimensions, pixel(x, y, c) = (31·id + 7x + 13y +
    * 5c) mod 256, really encoded (all five filters + zlib). The q77
    * generate-parse-replay pattern one level deeper: the oracle
    * replays the closed-form channel sums, so the engine only matches
    * if inflate + unfilter reproduce every pixel. */
  def pngPixelCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val w = (java.lang.Math.floorMod(id, 4L) * 4 + 4).toInt // 4..16
      val h = (java.lang.Math.floorMod(id, 3L) * 4 + 8).toInt // 8..16: all filters hit
      (id, pngBytes(w, h,
        (x, y, c) => ((31L * id + 7L * x + 13L * y + 5L * c) % 256L).toInt))
    }.toDF("media_id", "payload")
  }

  // ---- perceptual hash (8x8-DCT pHash) ------------------------------

  /** 2^10 fixed-point 8-point DCT-II cosine table, T(u)(k) =
    * round(cos(pi*(2k+1)*u/16) * 1024) — FROZEN literal constants (the
    * q133 oracle embeds the same integers), so every pHash arithmetic
    * step is integer-exact and engine-independent. 2^10 keeps the worst
    * coefficient |sum| < 2^40 for 8-bit pixels at any image size whose
    * 8x8 block sums stay under 2^18 (a 4096x4096 image). */
  private[multimodal] val PhashDct: Array[Array[Long]] = Array(
    Array(1024L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L),
    Array(1004L, 851L, 569L, 200L, -200L, -569L, -851L, -1004L),
    Array(946L, 392L, -392L, -946L, -946L, -392L, 392L, 946L),
    Array(851L, -200L, -1004L, -569L, 569L, 1004L, 200L, -851L),
    Array(724L, -724L, -724L, 724L, 724L, -724L, -724L, 724L),
    Array(569L, -1004L, 200L, 851L, -851L, -200L, 1004L, -569L),
    Array(392L, -946L, 946L, -392L, -392L, 946L, -946L, 392L),
    Array(200L, -569L, 851L, -1004L, 1004L, -851L, 569L, -200L))

  /** 63-bit perceptual hash of a grayscale plane — the image
    * counterpart of the text MinHash/SimHash signatures, feeding the
    * same banded-pair machinery (Dedup.hammingNearDupPairs): downscale
    * to 8x8 integer BLOCK SUMS (floor-mapped blocks — sums, not means:
    * the DCT is linear and the median threshold is scale-invariant, so
    * dividing would only lose exactness), 2D DCT with the fixed-point
    * [[PhashDct]] table, then bit p-1 = (coefficient at p = 8u+v) >
    * median of the 63 AC coefficients (sorted index 31 — the lower
    * middle, a frozen convention). All-integer, so cross-engine
    * bit-identical; near-identical images differ in few bits,
    * re-encoded/noise-perturbed copies stay close, distinct content
    * lands far — exactly what byte-level dedup (q20) cannot see. */
  def pHash64(gray: Array[Int], w: Int, h: Int): Long = {
    require(w >= 8 && h >= 8, s"pHash64: need >= 8x8, got ${w}x$h")
    require(gray.length == w * h, s"pHash64: plane size ${gray.length} != ${w}x$h")
    val s = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) { s(by)(x * 8 / w) += gray(y * w + x); x += 1 }
      y += 1
    }
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 8) { acc += s(i)(j) * PhashDct(u)(i) * PhashDct(v)(j); j += 1 }
          i += 1
        }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var hash = 0L
    var p = 1
    while (p < 64) {
      if (f(p) > med) hash |= 1L << (p - 1)
      p += 1
    }
    hash
  }

  final case class ImagePHash(media_id: Long, ok: Int, phash: Long)

  /** Shared decode-result -> hash step of every image pHash stage: the
    * red channel of the 3-byte-interleaved decode (the fixtures encode
    * gray as R=G=B; a production luma mix is one weighted sum away and
    * changes nothing structural) through [[pHash64]]. ONE copy so the
    * cross-codec hash-equality claim cannot drift between the per-codec
    * stages and the sniffing one. Failed/tiny decodes -> ok=0. */
  private def grayPHash(id: Long,
      dec: Option[(Int, Int, Array[Byte])]): ImagePHash = dec match {
    case Some((w, h, px)) if w >= 8 && h >= 8 =>
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < gray.length) { gray(i) = px(3 * i) & 0xff; i += 1 }
      ImagePHash(id, 1, pHash64(gray, w, h))
    case _ => ImagePHash(id, 0, 0L)
  }

  /** Batched PNG-decode -> pHash over a binary media frame: the real
    * pixel decode ([[decodePngPixels]]) feeding [[grayPHash]].
    * Unparseable payloads surface ok=0, phash=0. */
  def decodePngPHash(media: DataFrame, partitions: Int = 0): Dataset[ImagePHash] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[ImagePHash]) { (id, payload) =>
      grayPHash(id, decodePngPixels(payload))
    }

  /** Codec-SNIFFING image pHash over a mixed binary media frame: each
    * payload dispatches on its magic bytes (\x89PNG / FFD8) to the
    * real decoder for its codec, then the SAME hash — the form a lake
    * of heterogenous crawled images actually needs, and what makes
    * the q133/q137 cross-codec dedup claim gate-checkable: a picture
    * stored once as PNG and once as JPEG lands at the same (or
    * adjacent) hash whatever bytes carried it. Unknown magic or a
    * failed decode surfaces ok=0. */
  def decodeImagePHash(media: DataFrame, partitions: Int = 0): Dataset[ImagePHash] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[ImagePHash]) { (id, payload) =>
      val dec: Option[(Int, Int, Array[Byte])] =
        if (payload == null || payload.length < 2) None
        else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P')
          decodePngPixels(payload)
        else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
          Jpeg.decodeJpegPixels(payload).map { case (w, h, _, px) => (w, h, px) }
        else if (payload(0) == 'R' && payload(1) == 'I')
          // WebP: lossless ([[Vp8l]]) or lossy keyframe ([[Vp8]]) —
          // the third and fourth real-pixel codecs
          Webp.vp8lChunk(payload).flatMap { case (o, l) =>
              Vp8l.decodeRgb(payload, o, l) }
            .orElse(Webp.vp8Chunk(payload).flatMap { case (o, l) =>
              Vp8.decodeRgb(payload, o, l) })
        else if (payload(0) == 'G' && payload(1) == 'I')
          // GIF still (first frame's canvas) — the fifth codec
          Gif.decodeStillRgb(payload)
        else None
      grayPHash(id, dec)
    }

  /** [[decodePngPHash]] for baseline JPEG payloads — the SAME hash
    * over the other codec's decoded plane, so a picture saved as PNG
    * and as JPEG lands at the same (or adjacent) hash and the banded
    * pairs find CROSS-CODEC dups — the thing byte-level dedup is
    * blind to by construction (PhashSpec pins PNG==JPEG hash equality
    * on a blocky fixture where both decodes are pixel-exact). */
  def decodeJpegPHash(media: DataFrame, partitions: Int = 0): Dataset[ImagePHash] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[ImagePHash]) { (id, payload) =>
      // the decoder's buffer is ALWAYS 3-byte interleaved (grayscale
      // replicates into R=G=B), whatever the source component count
      grayPHash(id,
        Jpeg.decodeJpegPixels(payload).map { case (w, h, _, px) => (w, h, px) })
    }

  /** Deterministic perceptual-dup PNG corpus — the q133 fixture: a
    * macro-pixel base pattern per SEED (the 4x4-pixel macro cells
    * align with the pHash blocks, so pattern energy dominates every
    * DCT coefficient), overlaid with small per-id +/-1 pixel noise —
    * images are byte-DISTINCT but perceptual dups of every same-seed
    * image. Calm ids seed by group (id mod 10 -> seeds 0-9); every
    * id%9==0 is an OUTLIER seeded from a DISJOINT seed space (10 +
    * id mod 7), so outliers never perceptually match a calm group —
    * they pair only with outliers sharing their seed. (An earlier
    * draft used high-amplitude pixel noise as the outlier family;
    * zero-mean noise AVERAGES OUT in the 16-pixel block sums, so
    * those "outliers" hashed onto their group — correct pHash
    * behavior, wrong fixture. Perceptual difference must be macro
    * structure, not texture.) 32x32, gray as R=G=B, really
    * PNG-encoded. */
  def phashImageCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val seed =
        if (java.lang.Math.floorMod(id, 9L) == 0L)
          10L + java.lang.Math.floorMod(id, 7L)
        else java.lang.Math.floorMod(id, 10L)
      (id, pngBytes(32, 32, (x, y, _) => {
        val base = ((seed * 73L + (x / 4) * 37L + (y / 4) * 91L) % 17L) * 15L
        val e = (id * 31L + x * 7L + y * 13L) % 3L - 1L
        math.max(0L, math.min(255L, base + e)).toInt
      }))
    }.toDF("media_id", "payload")
  }

  /** MIXED-codec perceptual-dup corpus — the q133/q137 fixture:
    * [[phashImageCorpusFromDocuments]]'s seed families (calm id%10
    * groups; id%9==0 outliers from a disjoint seed space) re-encoded
    * through BOTH real encoders, so the cross-codec dup claim —
    * byte-level dedup is blind to a picture saved under two codecs —
    * sits behind the oracle rather than only a spec. Codec keys by
    * DECADE ((id/10)%2 — id parity would make calm seed classes
    * codec-pure, since id%10 fixes the parity): even decades are the
    * 32x32 PNGs above (4x4 macro cells + per-pixel noise); odd
    * decades are 64x64 DC-ONLY JPEGs whose 8x8 blocks carry the SAME
    * seed pattern (one block per hash cell) + per-id block jitter.
    * Hash-cell sums land 16·pattern + noise vs 64·pattern + jitter —
    * the DCT scales, the median threshold scales with it, so the bit
    * pattern matches across codecs (same-seed pairs stay inside the
    * q133 hamming<=5 radius; PhashSpec measures the margins), while
    * every payload stays byte-distinct. */
  def mixedCodecImageCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val seed =
        if (java.lang.Math.floorMod(id, 9L) == 0L)
          10L + java.lang.Math.floorMod(id, 7L)
        else java.lang.Math.floorMod(id, 10L)
      val jpeg = java.lang.Math.floorMod(id / 10L, 2L) == 1L
      val payload =
        if (!jpeg)
          pngBytes(32, 32, (x, y, _) => {
            val base = ((seed * 73L + (x / 4) * 37L + (y / 4) * 91L) % 17L) * 15L
            val e = (id * 31L + x * 7L + y * 13L) % 3L - 1L
            math.max(0L, math.min(255L, base + e)).toInt
          })
        else
          Jpeg.dcOnlyBytes(64, 64, 1, (bx, by, _) => {
            val base = ((seed * 73L + bx * 37L + by * 91L) % 17L) * 15L
            val e = (id * 31L + bx * 7L + by * 13L) % 3L - 1L
            math.max(0L, math.min(255L, base + e)).toInt
          })
      (id, payload)
    }.toDF("media_id", "payload")
  }

  /** 63-bit audio envelope fingerprint — [[pHash64]]'s treatment of a
    * clip: the mono stream (channel 0) folds into an 8x8 grid of
    * per-cell MEAN absolute amplitudes (floor-mapped time cells; the
    * mean bounds values at 2^15 whatever the clip length), and the
    * grid goes through the identical fixed-point-DCT + median-bits
    * pipeline. The median threshold makes the fingerprint VOLUME-
    * invariant (scaling every cell scales every coefficient — the
    * bits cannot move), and envelope structure survives sample-level
    * noise the way macro pixels survive pixel noise. Requires >= 64
    * mono samples. */
  def audioFingerprint64(samples: Array[Short], channels: Int): Long = {
    require(channels >= 1, s"audioFingerprint64: channels must be >= 1: $channels")
    val n = samples.length / channels
    require(n >= 64, s"audioFingerprint64: need >= 64 mono samples, got $n")
    val sums = new Array[Long](64)
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val c = (j.toLong * 64 / n).toInt
      sums(c) += math.abs(samples(j * channels).toInt)
      cnt(c) += 1
      j += 1
    }
    val g = Array.tabulate(64)(k => (sums(k) / math.max(1, cnt(k))).toInt)
    pHash64(g, 8, 8)
  }

  final case class AudioFp(media_id: Long, ok: Int, afp: Long)

  /** Batched WAV-decode -> envelope fingerprint — [[decodePngPHash]]'s
    * shape for the audio modality. Unparseable / too-short clips
    * surface ok=0, afp=0. */
  def decodeWavFingerprint(media: DataFrame, partitions: Int = 0): Dataset[AudioFp] =
    decodeStage(media, partitions,
        org.apache.spark.sql.Encoders.product[AudioFp]) { (id, payload) =>
      decodeWavSamples(payload) match {
        case Some((_, ch, samples)) if ch >= 1 && samples.length / ch >= 64 =>
          AudioFp(id, 1, audioFingerprint64(samples, ch))
        case _ => AudioFp(id, 0, 0L)
      }
    }

  /** Deterministic perceptual-dup WAV corpus — the q134 fixture,
    * [[phashImageCorpusFromDocuments]]'s construction in time: 256
    * mono 16-bit samples per clip, amplitude envelope from the same
    * seed-keyed macro pattern over the 64 fingerprint cells (4
    * samples per cell), sign-alternating so the waveform is a real
    * oscillation, plus per-id small noise. Calm ids seed by group
    * (id mod 10), id%9==0 outliers from the disjoint seed space
    * (10 + id mod 7). Byte-distinct clips, perceptually equal within
    * a seed. */
  def audioFpCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIds(documents).map { id =>
      val seed =
        if (java.lang.Math.floorMod(id, 9L) == 0L)
          10L + java.lang.Math.floorMod(id, 7L)
        else java.lang.Math.floorMod(id, 10L)
      val n = 256
      val body = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val cell = i / 4
        val t = cell / 8
        val s = cell % 8
        val a = ((seed * 73L + t * 37L + s * 91L) % 17L) * 120L
        val e = (id * 31L + i * 7L) % 3L - 1L
        val v = ((a + e) * (if (i % 2 == 0) 1L else -1L)).toInt
        body(2 * i) = (v & 0xff).toByte
        body(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      (id, wavHeaderBytes(16000, 1, 16, body.length) ++ body)
    }.toDF("media_id", "payload")
  }

  /** Minimal VALID JPEG prefix: SOI + APP0/JFIF + SOF for the given
    * dimensions — 39 bytes. The APP0 segment before the SOF exercises
    * the parser's segment walk. `sofMarker` picks the frame family
    * (0xC0 baseline default; 0xC2 synthesizes the progressive headers
    * the q77 audit classifies). */
  def jpegHeaderBytes(w: Int, h: Int, precision: Int = 8, comps: Int = 3,
      sofMarker: Int = 0xC0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(39)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >>> 8); w8(v) }
    w8(0xFF); w8(0xD8) // SOI
    w8(0xFF); w8(0xE0) // APP0
    w16(16)
    "JFIF".foreach(c => w8(c.toInt)); w8(0)
    w8(1); w8(1) // version 1.1
    w8(0); w16(1); w16(1) // aspect-ratio units, density 1x1
    w8(0); w8(0) // no thumbnail
    w8(0xFF); w8(sofMarker) // SOF0/SOF1/SOF2
    w16(8 + 3 * comps)
    w8(precision); w16(h); w16(w); w8(comps)
    var c = 0
    while (c < comps) {
      w8(c + 1); w8(0x11); w8(0) // component id, 1x1 sampling, quant table 0
      c += 1
    }
    out.toByteArray
  }

  /** Deterministic image corpus with REAL headers, derived from the
    * documents table: even ids get a valid PNG prefix, odd ids a valid
    * JPEG prefix (dimensions derived from the id; every odd id%5==2 is
    * PROGRESSIVE — SOF2 — so the q77 audit classifies the family the
    * pixel decoder declines), followed by the UTF-8 text as opaque
    * body bytes. Lets [[decodeImageHeaders]] be gated against driver
    * testdata: the engine must parse the bytes it generated; the
    * oracle replays the id-derived dimensions. */
  def imageCorpusFromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Multimodal.spreadIdText(documents, col("text")).map { case (id, text) =>
      val w = (java.lang.Math.floorMod(id, 4L) * 160 + 320).toInt
      val h = (java.lang.Math.floorMod(id, 4L) * 90 + 180).toInt
      val body = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
      val header = if (java.lang.Math.floorMod(id, 2L) == 0L) pngHeaderBytes(w, h, 8, 2)
        else jpegHeaderBytes(w, h, sofMarker =
          if (java.lang.Math.floorMod(id, 5L) == 2L) 0xC2 else 0xC0)
      (id, header ++ body)
    }.toDF("media_id", "payload")
  }

  /** Deterministic fake media corpus derived from the documents table —
    * lets the plumbing be exercised against driver testdata without real
    * codecs: payload bytes are the UTF-8 text, metadata derived from id. */
  def fakeMediaFromDocuments(spark: SparkSession, documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(col("doc_id"), lit(100)) + 1).cast("int").as("n_frames"))
}
