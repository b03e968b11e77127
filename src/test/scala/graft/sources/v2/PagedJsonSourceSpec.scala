package graft.sources.v2

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class PagedJsonSourceSpec extends SparkSpec {

  private def writeFixtures(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    def page(i: Int, body: String): Unit =
      Files.write(Paths.get(dir, s"page-$i.json"), body.getBytes)
    page(0,
      """{"results": [
        | {"application_number": "NDA1", "sponsor_name": "S1",
        |  "products": [{"brand_name": "B1", "dosage_form": "TABLET"}],
        |  "submissions": [{"submission_status_date": "20240110", "submission_type": "ORIG"}]},
        | {"application_number": "NDA2", "sponsor_name": "S2"}
        |]}""".stripMargin)
    page(1,
      """{"results": [
        | {"application_number": "NDA3", "sponsor_name": "S3",
        |  "submissions": [{"submission_status_date": "20230601", "submission_type": "SUPPL"}]}
        |]}""".stripMargin)
  }

  test("FDA DSv2 connector: pages become partitions, records become flat rows") {
    val dir = Files.createTempDirectory("graft-fda-fixture").toString
    writeFixtures(dir)
    val df = ApiSources.loadFda(spark, dir)
    assert(df.count() == 3)
    val r1 = df.where(df("application_number") === "NDA1").head()
    assert(r1.getAs[String]("brand_name") == "B1")
    assert(r1.getAs[java.sql.Date]("latest_submission_date").toString == "2024-01-10")
    // one partition per page
    val raw = spark.read.format(classOf[FdaSource].getName).option("path", dir).load()
    assert(raw.rdd.getNumPartitions == 2)
  }

  test("date-range filter is pushed (visible in plan) AND re-applied by Spark") {
    val dir = Files.createTempDirectory("graft-fda-fixture2").toString
    writeFixtures(dir)
    val df = ApiSources.loadFda(spark, dir)
      .where(org.apache.spark.sql.functions.col("latest_submission_date") >= "2024-01-01")
    assert(df.count() == 1) // residual filter applied regardless of transport behavior
    assert(df.head().getAs[String]("application_number") == "NDA1")
  }

  test("retrying transport survives transient failures with linear backoff") {
    var calls = 0
    val flaky = new PageTransport {
      override def fetchPage(i: Int, r: Option[(String, String)]): Option[String] = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        Some("""{"results": []}""")
      }
      override def pageCount(r: Option[(String, String)]): Int = 1
    }
    val t = RetryingTransport(flaky, attempts = 3, backoffMs = 0)
    assert(t.fetchPage(0, None).contains("""{"results": []}"""))
    assert(calls == 3)
    val exhausted = RetryingTransport(new PageTransport {
      override def fetchPage(i: Int, r: Option[(String, String)]): Option[String] =
        throw new RuntimeException("down")
      override def pageCount(r: Option[(String, String)]): Int = 1
    }, attempts = 2, backoffMs = 0)
    intercept[RuntimeException](exhausted.fetchPage(0, None))
    // a SUCCESSFUL call must invoke the body exactly once — the retry
    // loop must not swallow the non-local-return control throwable and
    // "retry" successes (regression: every success burned all attempts
    // plus their backoff sleeps)
    var okCalls = 0
    val healthy = RetryingTransport(new PageTransport {
      override def fetchPage(i: Int, r: Option[(String, String)]): Option[String] = {
        okCalls += 1; Some("ok")
      }
      override def pageCount(r: Option[(String, String)]): Int = 1
    }, attempts = 3, backoffMs = 1000)
    val t0 = System.nanoTime()
    assert(healthy.fetchPage(0, None).contains("ok"))
    assert(okCalls == 1, s"success invoked body $okCalls times")
    assert((System.nanoTime() - t0) / 1e6 < 500, "success must not sleep")
  }

  test("CT connector: studies flatten through the same Catalyst path") {
    val dir = Files.createTempDirectory("graft-ct-fixture").toString
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "page-0.json"),
      """{"studies": [{"protocolSection": {
        |  "identificationModule": {"nctId": "NCT1", "briefTitle": "T"},
        |  "statusModule": {"overallStatus": "RECRUITING"},
        |  "designModule": {"phases": ["PHASE 2"], "enrollmentInfo": {"count": 42}}
        |}}], "nextPageToken": null}""".stripMargin.getBytes)
    val df = ApiSources.loadCt(spark, dir)
    val r = df.head()
    assert(r.getAs[String]("nct_id") == "NCT1")
    assert(r.getAs[String]("phase") == "PHASE 2")
    assert(r.getAs[Double]("enrollment_count") == 42.0)
  }
}
