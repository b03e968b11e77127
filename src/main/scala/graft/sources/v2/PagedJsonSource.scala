package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 machinery for the reference's paginated HTTP APIs
  * (SURVEY S1-S3) — the one substantial custom component the Spark port
  * needs (SURVEY §7.4).
  *
  * Architecture:
  *   - a [[PageTransport]] abstracts the HTTP layer. The bundled
  *     [[FixtureTransport]] serves local JSON fixture files (this build
  *     environment has no egress); a production transport would issue the
  *     real paginated GETs with the reference's rate-limit/backoff
  *     envelope. [[RetryingTransport]] wraps any transport with the
  *     reference's 3-attempt linear-backoff retry (fda_extractor.py:102-123).
  *   - pagination happens at PLANNING time on the driver (page manifest →
  *     one InputPartition per page), mirroring the reference's driver-side
  *     fetch loop while letting executors parse pages in parallel. A
  *     page-token API (CT.gov) forces sequential page *discovery* but
  *     parsing still fans out.
  *   - [[SupportsPushDownFilters]] captures date-range predicates on the
  *     designated filter column and forwards them to the transport as the
  *     API's server-side date filter (the reference builds them into query
  *     strings). All filters are also returned as residual so Spark
  *     re-applies them — the connector treats pushdown as a fetch *hint*,
  *     never a correctness dependency.
  *
  * Rows are emitted as a single `record_json` string column (one element
  * of the payload's record array per row). Parsing/flattening stays in
  * Catalyst (`from_json` + graft.etl.Flatten), which keeps nested-schema
  * pruning, codegen, and the single source of truth for field semantics.
  */
/** One fetchable page: its ordinal plus an optional opaque fetch token
  * (CT.gov-style APIs address pages by server-issued token, not index). */
final case class PageSpec(pageIndex: Int, token: Option[String] = None)

trait PageTransport extends Serializable {
  /** Fetch one page; None when past the last page. */
  def fetchPage(pageIndex: Int, dateRange: Option[(String, String)]): Option[String]
  /** Total page count for planning (fixture/manifest-driven). */
  def pageCount(dateRange: Option[(String, String)]): Int
  /** Planning-time page manifest. Index-addressable APIs (skip/limit)
    * derive it from pageCount; token APIs override it to walk the token
    * chain sequentially on the driver, so executors can then fetch their
    * page directly (and in parallel) by token. */
  def discoverPages(dateRange: Option[(String, String)]): Seq[PageSpec] =
    (0 until pageCount(dateRange)).map(i => PageSpec(i))
  /** Executor-side fetch of a discovered page. */
  def fetchSpec(spec: PageSpec, dateRange: Option[(String, String)]): Option[String] =
    fetchPage(spec.pageIndex, dateRange)
}

/** Serves `page-<i>.json` files from a directory — the test/offline
  * stand-in for the HTTP APIs. */
final case class FixtureTransport(dir: String) extends PageTransport {
  override def fetchPage(pageIndex: Int, dateRange: Option[(String, String)]): Option[String] = {
    val f = new java.io.File(dir, s"page-$pageIndex.json")
    if (f.exists()) Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    else None
  }
  override def pageCount(dateRange: Option[(String, String)]): Int =
    Iterator.from(0).takeWhile(i => new java.io.File(dir, s"page-$i.json").exists()).size
}

/** Reference retry envelope: `attempts` tries, linear backoff
  * `backoffMs * attempt` (fda_extractor.py:102-123). */
final case class RetryingTransport(inner: PageTransport, attempts: Int = 3,
    backoffMs: Long = 0L) extends PageTransport {
  // NOTE: a `while`, not a `for` — `return` inside a for-comprehension
  // throws NonLocalReturnControl through the closure, which a
  // catch-everything retry loop would swallow and "retry": every
  // SUCCESSFUL call then burns all attempts (and their backoff sleeps)
  // before the control exception finally delivers the value. Caught by
  // wiring a real 5 s backoff: the whole suite slowed 4×. NonFatal also
  // keeps control-flow/fatal throwables out of the retry path.
  private def withRetry[A](body: => A): A = {
    var lastErr: Throwable = null
    var attempt = 1
    while (attempt <= attempts) {
      try return body
      catch {
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempt < attempts && backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
      attempt += 1
    }
    throw lastErr
  }
  override def fetchPage(pageIndex: Int, dateRange: Option[(String, String)]): Option[String] =
    withRetry(inner.fetchPage(pageIndex, dateRange))
  override def fetchSpec(spec: PageSpec, dateRange: Option[(String, String)]): Option[String] =
    withRetry(inner.fetchSpec(spec, dateRange))
  override def pageCount(dateRange: Option[(String, String)]): Int =
    withRetry(inner.pageCount(dateRange))
  override def discoverPages(dateRange: Option[(String, String)]): Seq[PageSpec] =
    withRetry(inner.discoverPages(dateRange))
}

abstract class PagedJsonTableProvider extends TableProvider {
  /** JSON-path-ish pointer to the record array inside a page payload
    * ("results" for Drugs@FDA, "studies" for CT.gov v2). */
  def recordArrayField: String
  /** Column a date-range filter may be pushed on (API server-side filter). */
  def filterColumn: String

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedJsonTable(recordArrayField, filterColumn,
      new CaseInsensitiveStringMap(properties))
}

object PagedJsonTable {
  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("record_json",
      org.apache.spark.sql.types.StringType)))
}

final class PagedJsonTable(recordArrayField: String, filterColumn: String,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"paged_json(${options.get("path")})"
  override def schema(): StructType = PagedJsonTable.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(recordArrayField, filterColumn,
      options.asScala.toMap ++ opts.asScala.toMap)
}

final class PagedJsonScanBuilder(recordArrayField: String, filterColumn: String,
    options: Map[String, String]) extends ScanBuilder with SupportsPushDownFilters {

  private var dateRange: Option[(String, String)] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    var lo: Option[String] = None
    var hi: Option[String] = None
    filters.foreach {
      case GreaterThanOrEqual(c, v) if c == filterColumn => lo = Some(v.toString)
      case LessThanOrEqual(c, v) if c == filterColumn => hi = Some(v.toString)
      case _ => ()
    }
    if (lo.isDefined || hi.isDefined) {
      dateRange = Some((lo.getOrElse("0000-01-01"), hi.getOrElse("9999-12-31")))
      pushed = filters.filter {
        case GreaterThanOrEqual(c, _) => c == filterColumn
        case LessThanOrEqual(c, _) => c == filterColumn
        case _ => false
      }
    }
    // Everything is residual: pushdown is a fetch hint, Spark re-applies.
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PagedJsonScan(recordArrayField,
    options, dateRange)
}

final case class PageInputPartition(spec: PageSpec,
    dateRange: Option[(String, String)]) extends InputPartition

/** Builds the configured transport from reader options — the same
  * construction path on the driver (planning) and executors (fetch).
  *   transport=fixture (default): page-<i>.json files under `path`
  *   transport=fda-http:   skip/limit pagination against `baseurl`
  *   transport=ctgov-http: token pagination against `baseurl`
  * All are wrapped in the reference retry envelope (retries/backoffms). */
object Transports {
  def fromOptions(options: Map[String, String]): PageTransport = {
    def opt(k: String): String = options.getOrElse(k,
      throw new IllegalArgumentException(s"option '$k' is required"))
    val base = options.getOrElse("transport", "fixture") match {
      case "fixture" => FixtureTransport(opt("path"))
      case "fda-http" => FdaHttpTransport(
        baseUrl = opt("baseurl"),
        pageSize = options.getOrElse("pagesize", "99").toInt,
        sleepMs = options.getOrElse("sleepms", "500").toLong,
        timeoutMs = options.getOrElse("timeoutms", "30000").toInt,
        apiKey = options.get("apikey"))
      case "ctgov-http" => CtGovHttpTransport(
        baseUrl = opt("baseurl"),
        pageSize = options.getOrElse("pagesize", "100").toInt,
        sleepMs = options.getOrElse("sleepms", "500").toLong,
        timeoutMs = options.getOrElse("timeoutms", "30000").toInt,
        discoveryFields = options.get("discoveryfields"))
      case other => throw new IllegalArgumentException(s"unknown transport '$other'")
    }
    RetryingTransport(base,
      attempts = options.getOrElse("retries", "3").toInt,
      backoffMs = options.getOrElse("backoffms", "0").toLong)
  }
}

final class PagedJsonScan(recordArrayField: String, options: Map[String, String],
    dateRange: Option[(String, String)]) extends Scan with Batch {

  override def readSchema(): StructType = PagedJsonTable.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Transports.fromOptions(options).discoverPages(dateRange)
      .map(s => PageInputPartition(s, dateRange): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(recordArrayField, options)
}

final class PageReaderFactory(recordArrayField: String,
    options: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[PageInputPartition]
    new PageReader(recordArrayField, options, p)
  }
}

final class PageReader(recordArrayField: String, options: Map[String, String],
    partition: PageInputPartition)
    extends PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private val records: Iterator[String] = {
    val transport = Transports.fromOptions(options)
    transport.fetchSpec(partition.spec, partition.dateRange) match {
      case None => Iterator.empty
      case Some(payload) =>
        // Minimal JSON record-array splitter via json4s (bundled with
        // Spark): extract the record array, re-serialize each element.
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(payload) \ recordArrayField match {
          case JArray(items) =>
            items.iterator.map(v => JsonMethods.compact(JsonMethods.render(v)))
          case _ => Iterator.empty
        }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (records.hasNext) {
      current = InternalRow(UTF8String.fromString(records.next())); true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Drugs@FDA connector: `spark.read.format("graft.sources.v2.FdaSource")
  * .option("path", fixtureDir).load()` → record_json rows; compose with
  * `from_json(Schemas.fdaRecord)` + `Flatten.fdaRecords`. */
final class FdaSource extends PagedJsonTableProvider {
  override def recordArrayField: String = "results"
  override def filterColumn: String = "latest_submission_date"
}

/** ClinicalTrials.gov v2 connector (token pagination modeled as page
  * index at planning time). */
final class CtGovSource extends PagedJsonTableProvider {
  override def recordArrayField: String = "studies"
  override def filterColumn: String = "last_update_post_date"
}

/** High-level loaders: connector → Catalyst parse → flatten. The options
  * overloads take the full DSv2 reader option map (transport selection,
  * base URL, retry envelope — see [[Transports.fromOptions]]); the
  * string overloads keep the fixture-directory shorthand. */
object ApiSources {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def loadFda(spark: SparkSession, fixtureDir: String): DataFrame =
    loadFda(spark, Map("path" -> fixtureDir))

  def loadFda(spark: SparkSession, options: Map[String, String]): DataFrame = {
    val raw = spark.read.format(classOf[FdaSource].getName)
      .options(options).load()
    graft.etl.Flatten.fdaRecords(
      raw.select(from_json(col("record_json"),
        graft.model.Schemas.fdaRecord).as("r")).select("r.*"))
  }

  def loadCt(spark: SparkSession, fixtureDir: String): DataFrame =
    loadCt(spark, Map("path" -> fixtureDir))

  def loadCt(spark: SparkSession, options: Map[String, String]): DataFrame = {
    val raw = spark.read.format(classOf[CtGovSource].getName)
      .options(options).load()
    graft.etl.Flatten.ctStudies(
      raw.select(from_json(col("record_json"),
        graft.model.Schemas.ctStudy).as("s")).select("s.protocolSection"))
  }
}
