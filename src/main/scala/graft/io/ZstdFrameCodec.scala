package graft.io

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** Hadoop CompressionCodec over [[graft.multimodal.Zstd]] frames — the
  * EXPORT side of `.jsonl.zst`: plugged into Spark's text writer
  * (`.option("compression", ZstdFrameCodec.Name)`) it lands shard
  * files as REAL single-frame zstd (standard `zstd -d` reads them,
  * [[graft.multimodal.Containers.decodeJsonl]] re-ingests them), and
  * registered with a session's Hadoop conf it resolves `.zst` on the
  * read side so `spark.read.text` round-trips the export.
  *
  * Shape: one frame per FILE, buffered — correct for shard exports
  * whose files are bin-sized by construction (binTokens bounds
  * them); this is not a general streaming codec (a multi-GB file
  * through it would buffer in memory — use bounded shards, which is
  * the export contract anyway). The Compressor/Decompressor types
  * exist only to satisfy CodecPool's plumbing (LineRecordReader
  * borrows one before calling createInputStream); the streams here
  * never use them. */
final class ZstdFrameCodec extends CompressionCodec {
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdFrameCodec.FrameOut(out)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdFrameCodec.NullCompressor]
  override def createCompressor(): Compressor = new ZstdFrameCodec.NullCompressor
  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdFrameCodec.FrameIn(in)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdFrameCodec.NullDecompressor]
  override def createDecompressor(): Decompressor = new ZstdFrameCodec.NullDecompressor
  override def getDefaultExtension: String = ".zst"
}

object ZstdFrameCodec {
  val Name = "graft.io.ZstdFrameCodec"

  // Hadoop's stock list: setting io.compression.codecs REPLACES the
  // defaults, so they ride along or .gz/.bz2 reads would silently
  // lose their codecs
  private val HadoopDefaults = Seq(
    "org.apache.hadoop.io.compress.DefaultCodec",
    "org.apache.hadoop.io.compress.GzipCodec",
    "org.apache.hadoop.io.compress.BZip2Codec")

  /** Idempotently register with the session's Hadoop conf so the READ
    * side's extension sniffing (CompressionCodecFactory) resolves
    * `.zst` files to this codec. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = Option(conf.get("io.compression.codecs")).getOrElse("")
    if (!cur.contains(Name)) {
      val base = if (cur.isEmpty) HadoopDefaults.mkString(",") else cur
      conf.set("io.compression.codecs", base + "," + Name)
    }
  }

  /** Buffer-then-frame output: the whole file becomes one zstd frame
    * on finish/close (files are shard-bounded by the export). */
  private final class FrameOut(out: OutputStream)
      extends CompressionOutputStream(out) {
    private val buf = new java.io.ByteArrayOutputStream(1 << 16)
    private var done = false
    override def write(b: Int): Unit = buf.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      buf.write(b, off, len)
    override def finish(): Unit = if (!done) {
      done = true
      out.write(graft.multimodal.Zstd.compress(buf.toByteArray))
    }
    override def resetState(): Unit = { buf.reset(); done = false }
    override def close(): Unit = { finish(); super.close() }
  }

  private final class FrameIn(in: InputStream)
      extends CompressionInputStream(in) {
    private var data: Array[Byte] = _
    private var pos = 0
    private def ensure(): Unit = if (data == null) {
      val raw = in.readAllBytes()
      data = graft.multimodal.Zstd.decompress(raw, maxBytes = 1 << 28)
        .getOrElse(throw new java.io.IOException(
          "corrupt or unsupported zstd frame"))
    }
    override def read(): Int = {
      ensure()
      if (pos >= data.length) -1
      else { val v = data(pos) & 0xff; pos += 1; v }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      ensure()
      if (len == 0) 0
      else if (pos >= data.length) -1
      else {
        val n = math.min(len, data.length - pos)
        System.arraycopy(data, pos, b, off, n)
        pos += n
        n
      }
    }
    override def resetState(): Unit = { data = null; pos = 0 }
  }

  /** CodecPool placeholders — borrowed/returned around the stream but
    * never fed data (the streams above bypass them). */
  private final class NullCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "ZstdFrameCodec compresses at the stream layer")
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }

  private final class NullDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = true
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "ZstdFrameCodec decompresses at the stream layer")
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
