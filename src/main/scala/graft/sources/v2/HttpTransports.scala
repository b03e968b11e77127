package graft.sources.v2

import java.net.{HttpURLConnection, URL, URLEncoder}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Real HTTP transports for the two paginated medical APIs, modeling the
  * reference extractors' request envelope exactly:
  *
  *   - Drugs@FDA (fda_extractor.py:32-123): skip/limit pagination in
  *     99-record pages, `search=submissions.submission_status_date:
  *     [YYYYMMDD TO YYYYMMDD]`, 30 s timeout, 0.5 s inter-request sleep,
  *     3 attempts with linear backoff (the backoff lives in
  *     [[RetryingTransport]] so every transport shares it).
  *   - ClinicalTrials.gov v2 (clinicaltrials_extractor.py:24-110):
  *     `filter.advanced=AREA[LastUpdatePostDate]RANGE[date,MAX]`, opaque
  *     `nextPageToken` chaining, same timeout/sleep envelope.
  *
  * Spark-first split of the reference's sequential fetch loop:
  * *discovery* (how many pages, which tokens) happens once on the driver
  * at planning time; *fetch* happens on executors, one page per
  * InputPartition, in parallel. For skip/limit APIs discovery is a single
  * metadata request; for token APIs the driver must walk the token chain
  * sequentially (that is the API contract), but executors still fan out
  * the full-payload fetches and all parsing.
  *
  * This build environment has no egress, so these transports are
  * exercised against a loopback stub server in HttpTransportsSpec; the
  * request formats above are asserted there.
  */
final case class HttpStatusException(code: Int, url: String, body: String)
  extends RuntimeException(s"HTTP $code from $url: ${body.take(200)}")

trait HttpClient extends Serializable {
  /** GET the URL, return the body; throw HttpStatusException on non-2xx. */
  def get(url: String, timeoutMs: Int): String
}

/** JDK-builtin client (HttpURLConnection) — no extra dependencies, works
  * on executors. Connect and read timeouts both set to `timeoutMs`. */
object JdkHttpClient extends HttpClient {
  override def get(url: String, timeoutMs: Int): String = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("GET")
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code = conn.getResponseCode
      val stream = if (code >= 200 && code < 300) conn.getInputStream else conn.getErrorStream
      val body =
        if (stream == null) ""
        else try scala.io.Source.fromInputStream(stream, "UTF-8").mkString
        finally stream.close()
      if (code >= 200 && code < 300) body
      else throw HttpStatusException(code, url, body)
    } finally conn.disconnect()
  }
}

private[v2] object HttpUtil {
  def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  def withParams(baseUrl: String, params: Seq[(String, String)]): String = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    baseUrl + sep + params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
  }
}

/** Drugs@FDA-shaped skip/limit transport. Pages are index-addressable
  * (`skip = pageIndex * pageSize`), so planning needs only the record
  * total, which the API returns in `meta.results.total`; one metadata
  * request (limit=1) sizes the whole scan. A 404 means "no results for
  * this query" in openFDA — mapped to an empty scan, not an error. */
final case class FdaHttpTransport(baseUrl: String, pageSize: Int = 99,
    sleepMs: Long = 500, timeoutMs: Int = 30000, apiKey: Option[String] = None,
    client: HttpClient = JdkHttpClient) extends PageTransport {
  require(pageSize > 0 && pageSize <= 99, "openFDA caps limit at 99")

  private def searchParam(dateRange: Option[(String, String)]): Seq[(String, String)] =
    dateRange.toSeq.map { case (lo, hi) =>
      // reference formats dates as YYYYMMDD inside the range query
      val (l, h) = (lo.replace("-", ""), hi.replace("-", ""))
      "search" -> s"submissions.submission_status_date:[$l TO $h]"
    }

  private def keyParam: Seq[(String, String)] = apiKey.toSeq.map("api_key" -> _)

  private def get(params: Seq[(String, String)]): Option[String] =
    try Some(client.get(HttpUtil.withParams(baseUrl, params), timeoutMs))
    catch { case HttpStatusException(404, _, _) => None }

  override def fetchPage(pageIndex: Int, dateRange: Option[(String, String)]): Option[String] = {
    // Paces each TASK at the reference's 0.5 s/request — with N parallel
    // page partitions the aggregate rate is N× that. A deployment that
    // must honor a strict global budget caps the scan's parallelism
    // (fewer cores on the ingest job, or coalesce the source to one
    // partition); a per-JVM token bucket cannot span executors from here.
    if (sleepMs > 0) Thread.sleep(sleepMs)
    get(keyParam ++ searchParam(dateRange) ++ Seq(
      "skip" -> (pageIndex.toLong * pageSize).toString,
      "limit" -> pageSize.toString))
  }

  override def pageCount(dateRange: Option[(String, String)]): Int =
    get(keyParam ++ searchParam(dateRange) ++ Seq("skip" -> "0", "limit" -> "1")) match {
      case None => 0
      case Some(body) =>
        JsonMethods.parse(body) \ "meta" \ "results" \ "total" match {
          case JInt(total) => ((total.toLong + pageSize - 1) / pageSize).toInt
          case _ => 0
        }
    }
}

/** ClinicalTrials.gov v2-shaped token transport. Pages are NOT
  * index-addressable: each response carries an opaque `nextPageToken`,
  * so the driver walks the chain sequentially at planning time
  * (`discoverPages`) and ships each page's token in its InputPartition;
  * executors then fetch their page directly by token, in parallel.
  *
  * Discovery re-downloads payload it then throws away; `discoveryFields`
  * (CT.gov's `fields` parameter, e.g. "NCTId") shrinks the discovery
  * responses to a single field while still yielding the token chain —
  * the full fetch on executors omits `fields` and gets complete records.
  * Tokens encode the cursor position, which is determined by the filter
  * + pageSize (held identical between the two phases). */
final case class CtGovHttpTransport(baseUrl: String, pageSize: Int = 100,
    sleepMs: Long = 500, timeoutMs: Int = 30000,
    discoveryFields: Option[String] = None,
    client: HttpClient = JdkHttpClient) extends PageTransport {
  require(pageSize > 0 && pageSize <= 1000, "CT.gov caps pageSize at 1000")

  private def baseParams(dateRange: Option[(String, String)]): Seq[(String, String)] =
    dateRange.toSeq.map { case (lo, _) =>
      "filter.advanced" -> s"AREA[LastUpdatePostDate]RANGE[$lo,MAX]"
    } ++ Seq("pageSize" -> pageSize.toString, "format" -> "json")

  private def getPage(token: Option[String], fields: Option[String],
      dateRange: Option[(String, String)]): String = {
    if (sleepMs > 0) Thread.sleep(sleepMs)
    val params = baseParams(dateRange) ++
      fields.map("fields" -> _) ++ token.map("pageToken" -> _)
    client.get(HttpUtil.withParams(baseUrl, params), timeoutMs)
  }

  private def nextToken(body: String): Option[String] =
    JsonMethods.parse(body) \ "nextPageToken" match {
      case JString(t) if t.nonEmpty => Some(t)
      case _ => None
    }

  override def discoverPages(dateRange: Option[(String, String)]): Seq[PageSpec] = {
    val specs = Seq.newBuilder[PageSpec]
    var token: Option[String] = None
    var i = 0
    var done = false
    while (!done) {
      val body = getPage(token, discoveryFields, dateRange)
      val hasRecords = JsonMethods.parse(body) \ "studies" match {
        case JArray(items) => items.nonEmpty
        case _ => false
      }
      if (hasRecords || i == 0) specs += PageSpec(i, token)
      nextToken(body) match {
        case Some(t) => token = Some(t); i += 1
        case None => done = true
      }
    }
    specs.result()
  }

  override def fetchSpec(spec: PageSpec, dateRange: Option[(String, String)]): Option[String] =
    Some(getPage(spec.token, None, dateRange))

  /** Index-addressed fetch walks the chain from the start — correct but
    * sequential; the planner uses discoverPages + fetchSpec instead. */
  override def fetchPage(pageIndex: Int, dateRange: Option[(String, String)]): Option[String] = {
    var token: Option[String] = None
    for (_ <- 0 until pageIndex) {
      val body = getPage(token, discoveryFields, dateRange)
      nextToken(body) match {
        case Some(t) => token = Some(t)
        case None => return None
      }
    }
    Some(getPage(token, None, dateRange))
  }

  override def pageCount(dateRange: Option[(String, String)]): Int =
    discoverPages(dateRange).size
}
