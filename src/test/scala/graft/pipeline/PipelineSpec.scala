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
}
