package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def fdaFixture = Seq(
    ("123", "2024-01-01", 1L, 0L, 1L, " aspirin ", "PAIN", " headache ", 45.0, "1"),
    ("456", "2024-01-02", 0L, 0L, 0L, "ibuprofen", "Fever", null, 17.0, "2"),
    ("123", "2024-01-03", 1L, 1L, 1L, " aspirin ", "PAIN", "nausea", 70.0, "1"))
    .toDF("safetyreportid", "receivedate", "serious", "seriousnessdeath",
      "seriousnesshospitalization", "drug_name", "drug_indication", "reaction",
      "patient_age", "patient_sex")

  test("FDA transform: derived columns, cleaning, dedup keep-first (tests/test_transformers.py:66-92)") {
    val out = FdaTransform(fdaFixture)
    val cols = out.columns.toSet
    for (c <- Seq("processed_date", "data_source", "drug_name_clean", "severity_score",
        "age_group", "is_complete"))
      assert(cols(c), s"missing $c")
    assert(out.count() == 2) // dedup on safetyreportid
    val r = out.where($"safetyreportid" === "123").head()
    assert(r.getAs[String]("drug_name_clean") == "ASPIRIN")
    assert(r.getAs[Long]("severity_score") == 7L) // keep FIRST row (1,0,1), not (1,1,1)
    assert(r.getAs[String]("age_group") == "Adult")
    assert(r.getAs[String]("reaction") == "headache") // trimmed
    assert(r.getAs[Boolean]("is_complete"))
    assert(r.getAs[String]("data_source") == "FDA_OpenFDA")
    val r2 = out.where($"safetyreportid" === "456").head()
    assert(r2.getAs[Long]("severity_score") == 0L)
    assert(r2.getAs[String]("age_group") == "Pediatric")
    assert(r2.getAs[String]("reaction") == "") // null -> '' -> trim
  }

  test("FDA transform: empty input passthrough (tests/test_transformers.py:85-92)") {
    val empty = fdaFixture.limit(0)
    assert(FdaTransform(empty).isEmpty)
  }

  test("FDA transform: missing optional columns tolerated (defensive probing)") {
    val df = Seq(("1", "d")).toDF("safetyreportid", "drug_name")
    val out = FdaTransform(df)
    assert(out.head().getAs[Long]("severity_score") == 0L)
    assert(!out.columns.contains("age_group"))
  }

  private def ctFixture = Seq(
    ("NCT1", "Test Study", "RECRUITING", "PHASE 3", 150.0, "DIABETES",
      Timestamp.valueOf("2023-01-01 00:00:00"), Timestamp.valueOf("2024-12-31 00:00:00")),
    ("NCT2", "Done Study", "COMPLETED", "EARLY PHASE 1", 1500.0, "cancer",
      Timestamp.valueOf("2020-01-01 00:00:00"), Timestamp.valueOf("2021-01-01 00:00:00")),
    ("NCT1", "Dup Study", "COMPLETED", "PHASE 1", 10.0, "DIABETES",
      Timestamp.valueOf("2023-01-01 00:00:00"), Timestamp.valueOf("2024-12-31 00:00:00")))
    .toDF("nct_id", "brief_title", "overall_status", "phase", "enrollment_count",
      "conditions", "start_date", "completion_date")

  test("CT transform: derived columns + dedup (tests/test_transformers.py:121-139)") {
    val out = CtTransform(ctFixture)
    assert(out.count() == 2)
    val r = out.where($"nct_id" === "NCT1").head()
    assert(r.getAs[String]("brief_title") == "Test Study") // keep first
    assert(r.getAs[Int]("study_duration_days") == 730)
    assert(r.getAs[Double]("phase_numeric") == 3.0)
    assert(r.getAs[String]("study_size_category") == "Medium")
    assert(r.getAs[Boolean]("is_active"))
    assert(!r.getAs[Boolean]("is_completed"))
    assert(r.getAs[String]("conditions_clean") == "DIABETES")
    val r2 = out.where($"nct_id" === "NCT2").head()
    assert(r2.getAs[Double]("phase_numeric") == 0.5)
    assert(r2.getAs[String]("study_size_category") == "Very Large")
    assert(r2.getAs[Boolean]("is_completed"))
    assert(r2.getAs[String]("conditions_clean") == "CANCER")
  }
}
