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
