package graft.model

import graft.SparkSpec
import java.sql.Timestamp

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset round-trip through the transform + enrichment layers") {
    val fda = Seq(
      FdaEvent("R1", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1L), Some(0L),
        Some(1L), "aspirin ", Some("Headache"), Some(" ache "), Some(45.0), Some("1")),
      FdaEvent("R2", Timestamp.valueOf("2024-01-02 00:00:00"), Some(0L), Some(0L),
        Some(0L), "tylenol", Some("Fever"), None, Some(17.0), Some("2")))
      .toDS()
    val ct = Seq(
      ClinicalTrial("NCT1", Some("S"), Some("COMPLETED"), Some("PHASE 2"),
        Some(100.0), Some("HEADACHE"), Some(Timestamp.valueOf("2023-01-01 00:00:00")),
        Some(Timestamp.valueOf("2024-01-01 00:00:00"))))
      .toDS()
    val enriched = graft.etl.Enrichment.enrich(
      graft.etl.FdaTransform(fda.toDF()), graft.etl.CtTransform(ct.toDF()))
      .as[EnrichedDrug]
    val byDrug = enriched.collect().map(e => e.drug_name -> e).toMap
    assert(byDrug("ASPIRIN").trial_count == 1L)
    assert(byDrug("ASPIRIN").total_enrollment == 100.0)
    assert(byDrug("ASPIRIN").avg_severity_score == 7.0)
    assert(byDrug("TYLENOL").trial_count == 0L)
  }

  test("explicit payload schemas accept the canonical fixtures without inference") {
    val fdaDf = spark.read.schema(Schemas.fdaPayload)
      .json(Seq("""{"results": [{"application_number": "N1"}]}""").toDS())
    assert(fdaDf.schema == Schemas.fdaPayload)
    val ctDf = spark.read.schema(Schemas.ctPayload)
      .json(Seq("""{"studies": [], "nextPageToken": "x"}""").toDS())
    assert(ctDf.schema == Schemas.ctPayload)
  }
}
