package graft.etl

import graft.SparkSpec

/** The 4 behavioral scenarios from the reference's
  * tests/test_enrichment.py:16-123, plus the double-count guard
  * (SURVEY §7.5 #1). */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def fdaT(rows: (String, String, String, Double, Long, Long)*) =
    rows.toSeq.toDF("drug_name_clean", "drug_indication", "safetyreportid",
      "severity_score", "seriousnessdeath", "seriousnesshospitalization")

  private def ctT(rows: (String, String, Double, Boolean)*) =
    rows.toSeq.toDF("conditions_clean", "nct_id", "enrollment_count", "is_completed")

  private def enrichedRow(fda: org.apache.spark.sql.DataFrame,
      ct: org.apache.spark.sql.DataFrame, drug: String) =
    Enrichment.enrich(fda, ct).where($"drug_name" === drug).head()

  test("exact match: HEADACHE (test_enrichment.py:16-42)") {
    val r = enrichedRow(
      fdaT(("ASPIRIN", "Headache", "1", 2.0, 0L, 0L)),
      ctT(("HEADACHE", "NCT1", 100.0, true)), "ASPIRIN")
    assert(r.getAs[Long]("trial_count") == 1L)
    assert(r.getAs[Double]("total_enrollment") == 100.0)
    assert(r.getAs[Long]("completed_trials") == 1L)
  }

  test("case-insensitive match: Type 2 Diabetes (test_enrichment.py:44-69)") {
    val r = enrichedRow(
      fdaT(("METFORMIN", "Type 2 Diabetes", "1", 2.0, 0L, 0L)),
      ctT(("TYPE 2 DIABETES", "NCT1", 50.0, false)), "METFORMIN")
    assert(r.getAs[Long]("trial_count") == 1L)
  }

  test("partial substring: Lung Cancer ⊆ NON-SMALL CELL LUNG CANCER (test_enrichment.py:71-96)") {
    val r = enrichedRow(
      fdaT(("KEYTRUDA", "Lung Cancer", "1", 2.0, 0L, 0L)),
      ctT(("NON-SMALL CELL LUNG CANCER", "NCT1", 500.0, false)), "KEYTRUDA")
    assert(r.getAs[Long]("trial_count") == 1L)
    assert(r.getAs[Double]("total_enrollment") == 500.0)
  }

  test("no match: zero-filled row still present (test_enrichment.py:98-123)") {
    val r = enrichedRow(
      fdaT(("TAMIFLU", "Flu", "1", 2.0, 0L, 0L)),
      ctT(("BROKEN LEG", "NCT1", 30.0, false)), "TAMIFLU")
    assert(r.getAs[Long]("trial_count") == 0L)
    assert(r.getAs[Double]("total_enrollment") == 0.0)
    assert(r.getAs[Long]("completed_trials") == 0L)
  }

  test("EXISTS semantics: two indications matching one condition row count it once") {
    val fda = fdaT(
      ("DRUGX", "Lung Cancer", "1", 2.0, 0L, 0L),
      ("DRUGX", "Cancer", "2", 4.0, 0L, 0L))
    val ct = ctT(("NON-SMALL CELL LUNG CANCER", "NCT1", 500.0, true))
    val r = enrichedRow(fda, ct, "DRUGX")
    assert(r.getAs[Long]("trial_count") == 1L, "condition row must not double-count")
    assert(r.getAs[Double]("total_enrollment") == 500.0)
    assert(r.getAs[Long]("adverse_event_count") == 2L)
    assert(r.getAs[Double]("avg_severity_score") == 3.0)
  }

  test("FDA-only: output is the FDA summary without trial columns (drug_transformer.py:284-285)") {
    val out = Enrichment.enrich(
      fdaT(("ASPIRIN", "Headache", "1", 2.0, 1L, 0L)), ctT().limit(0))
    assert(out.columns.toSeq == Seq("drug_name", "adverse_event_count",
      "avg_severity_score", "death_count", "hospitalization_count"))
    assert(out.head().getAs[Long]("death_count") == 1L)
  }

  test("CT-only: output is the condition summary") {
    val out = Enrichment.enrich(
      fdaT().limit(0), ctT(("HEADACHE", "NCT1", 100.0, true), ("HEADACHE", "NCT2", 50.0, false)))
    val r = out.head()
    assert(out.columns.toSeq == Seq("condition", "trial_count", "total_enrollment", "completed_trials"))
    assert(r.getAs[Long]("trial_count") == 2L)
    assert(r.getAs[Double]("total_enrollment") == 150.0)
    assert(r.getAs[Long]("completed_trials") == 1L)
  }

  test("empty indications are skipped (reference `if ind` guard)") {
    val r = enrichedRow(
      fdaT(("DRUGY", "", "1", 2.0, 0L, 0L)),
      ctT(("ANYTHING", "NCT1", 10.0, false)), "DRUGY")
    // '' would substring-match everything; reference skips it -> no match
    assert(r.getAs[Long]("trial_count") == 0L)
  }
}
