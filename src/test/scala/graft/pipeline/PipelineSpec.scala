package graft.pipeline

import graft.SparkSpec
import graft.io.Lake
import java.nio.file.Files

/** End-to-end slice (SURVEY §7.2): fixture JSON in a file:// lake →
  * transform → enrich → parquet+CSV → quality gate. */
class PipelineSpec extends SparkSpec {

  test("daily run end-to-end on a local lake") {
    val root = Files.createTempDirectory("graft-lake").toString
    val date = "2024-01-01"

    val fdaRecords = (1 to 12).map { i =>
      val ind = if (i % 2 == 0) "Headache" else "Type 2 Diabetes"
      s"""{"safetyreportid": "R$i", "receivedate": "2024-01-01T00:00:00Z",
         | "serious": 1, "seriousnessdeath": 0, "seriousnesshospitalization": 1,
         | "drug_name": "drug$i ", "drug_indication": "$ind",
         | "reaction": "r", "patient_age": ${20 + i}, "patient_sex": "1"}""".stripMargin.replace("\n", "")
    }
    val ctRecords = (1 to 8).map { i =>
      val cond = if (i % 2 == 0) "HEADACHE" else "TYPE 2 DIABETES"
      s"""{"nct_id": "NCT$i", "brief_title": "S$i", "overall_status": "COMPLETED",
         | "phase": "PHASE 2", "enrollment_count": ${i * 100},
         | "conditions": "$cond", "start_date": "2023-01-01T00:00:00Z",
         | "completion_date": "2024-01-01T00:00:00Z"}""".stripMargin.replace("\n", "")
    }
    def land(rel: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      // Reference raw-zone layout: ONE JSON array document per partition.
      Files.write(p, lines.mkString("[\n", ",\n", "\n]").getBytes)
    }
    land(s"raw/fda/year=2024/month=01/day=01/data.json", fdaRecords)
    land(s"raw/clinical_trials/year=2024/month=01/day=01/data.json", ctRecords)

    val res = Pipeline.run(spark, root, date)
    assert(res.fdaCount == 12)
    assert(res.ctCount == 8)
    assert(res.enrichedCount == 12) // 12 distinct drugs
    assert(res.quality.passed, res.quality.failures.mkString("; "))

    val enriched = Lake.readParquet(spark, res.processedPath)
    val row = enriched.where(enriched("drug_name") === "DRUG2").head()
    // drug2's indication "Headache" matches only the HEADACHE condition
    // row: 4 trials, enrollment 200+400+600+800
    assert(row.getAs[Long]("trial_count") == 4L)
    assert(row.getAs[Double]("total_enrollment") == 2000.0)
    assert(row.getAs[Long]("completed_trials") == 4L)
    assert(row.getAs[Long]("adverse_event_count") == 1L)
    assert(Lake.exists(spark, Lake.processedPath(root, date, "summary.csv")))
  }

  test("missing raw zone -> empty-frame contract, quality gate fails gracefully") {
    val root = Files.createTempDirectory("graft-empty").toString
    val res = Pipeline.run(spark, root, "2024-01-02")
    assert(res.fdaCount == 0 && res.ctCount == 0)
    assert(!res.quality.passed)
    assert(res.quality.failures == Seq("No data to validate"))
  }

  private def writeFdaPages(dir: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    def page(i: Int, records: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(dir, s"page-$i.json"),
        records.mkString("""{"results": [""", ",", "]}").getBytes)
    def rec(i: Int) =
      s"""{"application_number": "NDA$i", "sponsor_name": "S$i",
         | "products": [{"brand_name": "drug$i ", "dosage_form": "TABLET"}],
         | "submissions": [{"submission_status_date": "20240110", "submission_type": "ORIG"}]}"""
        .stripMargin.replace("\n", "")
    page(0, (1 to 6).map(rec))
    page(1, (7 to 12).map(rec))
  }

  private def writeCtPages(dir: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    def study(i: Int) =
      s"""{"protocolSection": {
         |  "identificationModule": {"nctId": "NCT$i", "briefTitle": "T$i"},
         |  "statusModule": {"overallStatus": "COMPLETED"},
         |  "conditionsModule": {"conditions": ["HEADACHE"]},
         |  "designModule": {"phases": ["PHASE 2"], "enrollmentInfo": {"count": ${i * 100}}}
         |}}""".stripMargin.replace("\n", "")
    Files.write(java.nio.file.Paths.get(dir, "page-0.json"),
      s"""{"studies": [${(1 to 5).map(study).mkString(",")}], "nextPageToken": null}""".getBytes)
  }

  test("DAG-topology run: connectors land raw, counts validate, SLA notification forms") {
    val root = Files.createTempDirectory("graft-api-lake").toString
    val fdaDir = Files.createTempDirectory("graft-fda-pages").toString
    val ctDir = Files.createTempDirectory("graft-ct-pages").toString
    writeFdaPages(fdaDir)
    writeCtPages(ctDir)

    val (res, note) = Pipeline.runFromApis(spark, root, "2024-01-10",
      Map("path" -> fdaDir), Map("path" -> ctDir))

    // raw zone landed by the run itself (the DAG's extraction tasks)
    assert(Lake.exists(spark, Lake.rawPath(root, "fda", "2024-01-10")))
    assert(Lake.exists(spark, Lake.rawPath(root, "clinical_trials", "2024-01-10")))
    assert(res.fdaCount == 12)
    assert(res.ctCount == 5)
    // application-shaped FDA data has no drug_indication -> per-drug
    // summary branch; 12 distinct brands
    assert(res.enrichedCount == 12)
    assert(res.quality.passed, res.quality.failures.mkString("; "))

    // notification payload carries the DAG's fields + SLA verdict
    assert(note.sla.passed, note.sla.breaches.mkString("; "))
    assert(note.subject.contains("Completed Successfully"))
    assert(note.message.contains("FDA Records: 12"))
    assert(note.message.contains("Clinical Trials: 5"))
    assert(note.message.contains(res.processedPath))
    assert(note.sla.qualityScore == 1.0)

    // landed FDA records expose brand_name as drug_name (the adapter)
    val landed = Lake.readJson(spark, Lake.rawPath(root, "fda", "2024-01-10"), None)
    assert(landed.columns.contains("drug_name"))
    val enriched = Lake.readParquet(spark, res.processedPath)
    assert(enriched.where(enriched("drug_name") === "DRUG3").count() == 1)
  }

  test("run metadata persists stage timings and landing counts ride the write (no raw re-read)") {
    val root = Files.createTempDirectory("graft-api-meta").toString
    val fdaDir = Files.createTempDirectory("graft-fda-pages-m").toString
    val ctDir = Files.createTempDirectory("graft-ct-pages-m").toString
    writeFdaPages(fdaDir)
    writeCtPages(ctDir)

    // Capture every successfully executed action (name + physical plan):
    // the landed-count validation must come from write-side Observations,
    // so no `count` action may scan the raw zone.
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        seen.add((funcName, qe.executedPlan.toString))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (res, _) = Pipeline.runFromApis(spark, root, "2024-01-14",
        Map("path" -> fdaDir), Map("path" -> ctDir))
      assert(res.fdaCount == 12 && res.ctCount == 5)
      assert(res.transformedCount > 0)

      // stage rows landed in the metadata zone, one per pipeline stage
      val meta = RunMetadata.read(spark, root, "2024-01-14")
      val stages = meta.select("stage").collect().map(_.getString(0)).toSet
      assert(stages == Set("extract_fda", "extract_ct", "transform_enrich_gate"))
      val fdaRow = meta.where(meta("stage") === "extract_fda").head()
      assert(fdaRow.getAs[Long]("records") == 12L)
      assert(fdaRow.getAs[Long]("durationMs") >= 0L)
      assert(meta.where(meta("stage") === "transform_enrich_gate")
        .head().getAs[Long]("records") == res.enrichedCount)

      // listener events are async — wait until the action log quiesces
      var size = -1
      var spins = 0
      while (seen.size() != size && spins < 50) {
        size = seen.size(); Thread.sleep(100); spins += 1
      }
      val rawCounts = seen.toArray(Array.empty[(String, String)]).filter {
        case (fn, plan) => fn == "count" && plan.contains("/raw/")
      }
      assert(rawCounts.isEmpty,
        s"count actions re-read the raw zone:\n${rawCounts.map(_._2).mkString}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("zero-record extraction fails the run like validate_extraction") {
    val root = Files.createTempDirectory("graft-api-empty").toString
    val emptyDir = Files.createTempDirectory("graft-no-pages").toString
    val ctDir = Files.createTempDirectory("graft-ct-pages2").toString
    writeCtPages(ctDir)
    val e = intercept[IllegalStateException] {
      Pipeline.runFromApis(spark, root, "2024-01-11",
        Map("path" -> emptyDir), Map("path" -> ctDir))
    }
    assert(e.getMessage.contains("No FDA records extracted"))
  }

  test("incomplete records drive the error-rate SLA (measured at transform stage)") {
    val root = Files.createTempDirectory("graft-api-err").toString
    val fdaDir = Files.createTempDirectory("graft-fda-pages-err").toString
    val ctDir = Files.createTempDirectory("graft-ct-pages-err").toString
    writeFdaPages(fdaDir)
    // a record with no brand_name -> drug_name null -> is_complete false
    Files.write(java.nio.file.Paths.get(fdaDir, "page-2.json"),
      """{"results": [{"application_number": "NDA99", "sponsor_name": "S99",
        | "products": [{"dosage_form": "TABLET"}],
        | "submissions": [{"submission_status_date": "20240110", "submission_type": "ORIG"}]}]}"""
        .stripMargin.replace("\n", "").getBytes)
    writeCtPages(ctDir)
    val strict = PipelineConfig.default.copy(
      alerts = AlertThresholds(maxErrorRate = 0.01))
    val (res, note) = Pipeline.runFromApis(spark, root, "2024-01-13",
      Map("path" -> fdaDir), Map("path" -> ctDir), strict)
    assert(res.incompleteCount >= 1, s"incompleteCount=${res.incompleteCount}")
    assert(note.sla.errorRate > 0.0)
    assert(!note.sla.passed)
    assert(note.sla.breaches.exists(_.contains("error rate")),
      note.sla.breaches.mkString("; "))
  }

  test("SLA breaches surface in the notification when thresholds tighten") {
    val root = Files.createTempDirectory("graft-api-sla").toString
    val fdaDir = Files.createTempDirectory("graft-fda-pages3").toString
    val ctDir = Files.createTempDirectory("graft-ct-pages3").toString
    writeFdaPages(fdaDir)
    writeCtPages(ctDir)
    val strict = PipelineConfig.default.copy(
      alerts = AlertThresholds(minRecordCount = 1000))
    val (_, note) = Pipeline.runFromApis(spark, root, "2024-01-12",
      Map("path" -> fdaDir), Map("path" -> ctDir), strict)
    assert(!note.sla.passed)
    assert(note.subject.contains("Completed With Alerts"))
    assert(note.sla.breaches.exists(_.contains("record count")))
  }
}
