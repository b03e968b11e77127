package graft.sources.v2

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec

import java.net.{InetSocketAddress, URLDecoder}
import java.util.concurrent.atomic.AtomicInteger

/** Exercises the HTTP transports against a loopback stub server (this
  * environment has no egress): request formats, skip/limit paging,
  * token-chain discovery, retry-after-failure, and the end-to-end DSv2
  * read path over HTTP. */
class HttpTransportsSpec extends SparkSpec {

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def withServer(path: String)(handler: HttpExchange => Unit)(
      run: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try handler(ex)
        catch { case e: Throwable => respond(ex, 500, e.toString) }
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}$path")
    finally server.stop(0)
  }

  // 250 records -> 3 pages of 99/99/52
  private val FdaTotal = 250

  private def fdaHandler(failFirst: AtomicInteger = new AtomicInteger(0))(
      ex: HttpExchange): Unit = {
    if (failFirst.getAndDecrement() > 0) { respond(ex, 503, "busy"); return }
    val p = params(ex)
    val skip = p.getOrElse("skip", "0").toInt
    val limit = p.getOrElse("limit", "99").toInt
    assert(limit <= 99, s"limit must respect the 99 cap, got $limit")
    if (skip >= FdaTotal) { respond(ex, 404, """{"error":{"code":"NOT_FOUND"}}"""); return }
    val n = math.min(limit, FdaTotal - skip)
    val results = (skip until skip + n)
      .map(i => s"""{"application_number":"NDA$i","sponsor_name":"S$i"}""")
      .mkString("[", ",", "]")
    respond(ex, 200,
      s"""{"meta":{"results":{"skip":$skip,"limit":$limit,"total":$FdaTotal}},"results":$results}""")
  }

  test("FDA transport: metadata request sizes the scan, pages fetch by skip/limit") {
    withServer("/drugsfda.json")(fdaHandler()) { url =>
      val t = FdaHttpTransport(url, sleepMs = 0)
      assert(t.pageCount(None) == 3) // ceil(250/99)
      assert(t.discoverPages(None).map(_.pageIndex) == Seq(0, 1, 2))
      val page2 = t.fetchSpec(PageSpec(2), None).get
      assert(page2.contains("NDA198") && page2.contains("NDA249"))
      assert(t.fetchSpec(PageSpec(9), None).isEmpty) // past the end: 404 -> None
    }
  }

  test("FDA transport: date range formats as YYYYMMDD search; retry survives a 503") {
    var seenSearch: Option[String] = None
    val failures = new AtomicInteger(1)
    withServer("/drugsfda.json") { ex =>
      seenSearch = seenSearch.orElse(params(ex).get("search"))
      fdaHandler(failures)(ex)
    } { url =>
      val t = RetryingTransport(FdaHttpTransport(url, sleepMs = 0), attempts = 3, backoffMs = 1)
      assert(t.fetchSpec(PageSpec(0), Some(("2024-01-01", "2024-02-15"))).isDefined)
      assert(seenSearch.contains("submissions.submission_status_date:[20240101 TO 20240215]"))
      // the 503 was consumed by the retry envelope
      assert(failures.get() <= 0)
    }
  }

  test("FDA transport: retries exhausted surfaces the HTTP error") {
    withServer("/drugsfda.json")(ex => respond(ex, 503, "down")) { url =>
      val t = RetryingTransport(FdaHttpTransport(url, sleepMs = 0), attempts = 2, backoffMs = 1)
      val e = intercept[HttpStatusException](t.fetchSpec(PageSpec(0), None))
      assert(e.code == 503)
    }
  }

  // token chain: "" -> t1 -> t2 (3 pages of 2/2/1 studies)
  private def ctHandler(requests: AtomicInteger)(ex: HttpExchange): Unit = {
    requests.incrementAndGet()
    val p = params(ex)
    assert(p.get("format").contains("json"))
    val fields = p.get("fields")
    def study(i: Int): String =
      if (fields.contains("NCTId")) s"""{"protocolSection":{"identificationModule":{"nctId":"NCT$i"}}}"""
      else s"""{"protocolSection":{"identificationModule":{"nctId":"NCT$i","briefTitle":"T$i"},"statusModule":{"overallStatus":"RECRUITING"}}}"""
    val (studies, next) = p.get("pageToken") match {
      case None => (Seq(study(1), study(2)), Some("t1"))
      case Some("t1") => (Seq(study(3), study(4)), Some("t2"))
      case Some("t2") => (Seq(study(5)), None)
      case Some(other) => respond(ex, 400, s"bad token $other"); return
    }
    val tok = next.map(t => s""","nextPageToken":"$t"""").getOrElse("")
    respond(ex, 200, s"""{"studies":${studies.mkString("[", ",", "]")}$tok}""")
  }

  test("CT.gov transport: driver walks the token chain once, executors fetch by token") {
    val requests = new AtomicInteger(0)
    withServer("/v2/studies")(ctHandler(requests)) { url =>
      val t = CtGovHttpTransport(url, sleepMs = 0, discoveryFields = Some("NCTId"))
      val specs = t.discoverPages(None)
      assert(specs == Seq(PageSpec(0, None), PageSpec(1, Some("t1")), PageSpec(2, Some("t2"))))
      assert(requests.get() == 3) // discovery = one walk of the chain
      // direct fetch by token: exactly one request, full payload
      val p1 = t.fetchSpec(specs(1), None).get
      assert(requests.get() == 4)
      assert(p1.contains("NCT3") && p1.contains("briefTitle"))
    }
  }

  test("CT.gov transport: date filter formats as AREA[LastUpdatePostDate]RANGE") {
    var seenFilter: Option[String] = None
    val requests = new AtomicInteger(0)
    withServer("/v2/studies") { ex =>
      seenFilter = seenFilter.orElse(params(ex).get("filter.advanced"))
      ctHandler(requests)(ex)
    } { url =>
      CtGovHttpTransport(url, sleepMs = 0).discoverPages(Some(("2024-03-01", "9999-12-31")))
      assert(seenFilter.contains("AREA[LastUpdatePostDate]RANGE[2024-03-01,MAX]"))
    }
  }

  test("end-to-end DSv2 read over HTTP: token pages become partitions, rows flatten") {
    val requests = new AtomicInteger(0)
    withServer("/v2/studies")(ctHandler(requests)) { url =>
      val raw = spark.read.format(classOf[CtGovSource].getName)
        .option("transport", "ctgov-http")
        .option("baseurl", url)
        .option("sleepms", "0")
        .option("discoveryfields", "NCTId")
        .load()
      assert(raw.rdd.getNumPartitions == 3)
      assert(raw.count() == 5)
      val ids = raw.selectExpr("get_json_object(record_json, '$.protocolSection.identificationModule.nctId') AS id")
        .collect().map(_.getString(0)).toSet
      assert(ids == Set("NCT1", "NCT2", "NCT3", "NCT4", "NCT5"))
    }
  }

  test("end-to-end DSv2 read over HTTP: FDA skip/limit pages fan out") {
    withServer("/drugsfda.json")(fdaHandler()) { url =>
      val raw = spark.read.format(classOf[FdaSource].getName)
        .option("transport", "fda-http")
        .option("baseurl", url)
        .option("sleepms", "0")
        .load()
      assert(raw.rdd.getNumPartitions == 3)
      assert(raw.count() == FdaTotal)
    }
  }
}
