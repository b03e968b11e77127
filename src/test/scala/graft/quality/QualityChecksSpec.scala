package graft.quality

import graft.SparkSpec
import java.sql.Timestamp

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private def goodDf = {
    val fda = (1 to 10).map(i => (s"R$i", "FDA_OpenFDA", Timestamp.valueOf("2024-01-01 00:00:00"),
      s"DRUG$i", 5.0, 40.0))
      .toDF("safetyreportid", "data_source", "receivedate", "drug_name", "severity_score", "patient_age")
    fda
  }

  test("clean frame passes all checks") {
    val rep = QualityChecks.validate(goodDf, "2024-01-01")
    assert(rep.passed, rep.failures.mkString("; "))
    assert(rep.recordCount == 10)
    assert(rep.totalChecks == 6)
  }

  test("empty frame fails with 'No data to validate' (data_quality.py:42-47)") {
    val rep = QualityChecks.validate(goodDf.limit(0), "2024-01-01")
    assert(!rep.passed)
    assert(rep.failures == Seq("No data to validate"))
  }

  test("severity out of range + dup keys + below-threshold count flagged") {
    val df = Seq(
      ("R1", "FDA_OpenFDA", Timestamp.valueOf("2024-01-01 00:00:00"), "D1", 150.0, 40.0),
      ("R1", "FDA_OpenFDA", Timestamp.valueOf("2024-01-01 00:00:00"), "D1", 5.0, 200.0),
      ("R2", "FDA_OpenFDA", Timestamp.valueOf("2024-01-01 00:00:00"), "D2", -1.0, 30.0))
      .toDF("safetyreportid", "data_source", "receivedate", "drug_name", "severity_score", "patient_age")
    val rep = QualityChecks.validate(df, "2024-01-01")
    assert(!rep.passed)
    val f = rep.failures.mkString("\n")
    assert(f.contains("2 records with invalid severity_score"), f)
    assert(f.contains("1 records with invalid patient_age"), f)
    assert(f.contains("2 duplicate FDA safety reports"), f) // keep=False counts both
    assert(f.contains("below minimum threshold"), f)
    assert(f.contains("has only 3 records"), f)
  }

  test("null pct >10% and future dates flagged") {
    val rows = (1 to 20).map { i =>
      val id = if (i <= 3) null else s"R$i" // 15% nulls
      val ts = if (i == 1) Timestamp.valueOf("2099-01-01 00:00:00")
        else Timestamp.valueOf("2024-01-01 00:00:00")
      (id, "FDA_OpenFDA", ts, s"D$i")
    }
    val df = rows.toDF("safetyreportid", "data_source", "receivedate", "drug_name")
    val rep = QualityChecks.validate(df, "2024-01-01")
    val f = rep.failures.mkString("\n")
    assert(f.contains("safetyreportid has 15.0% missing values"), f)
    assert(f.contains("1 records with future receivedate"), f)
  }

  test("start_date > completion_date flagged (data_quality.py:269-278)") {
    val df = (1 to 10).map(i => (s"NCT$i", "ClinicalTrials_gov", "T", "RECRUITING",
      Timestamp.valueOf("2024-06-01 00:00:00"), Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("nct_id", "data_source", "brief_title", "overall_status", "start_date", "completion_date")
    val rep = QualityChecks.validate(df, "2024-01-01")
    assert(rep.failures.exists(_.contains("10 records where start_date > completion_date")))
  }
}
