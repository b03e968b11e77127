package graft.etl

import graft.SparkSpec
import graft.model.Schemas

/** Canned nested payloads from the reference's extractor mocks
  * (tests/test_extractors.py:32-52, :114-130) driven through the
  * column-expression flatteners. */
class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private val fdaJson =
    """{"results": [{
      |  "application_number": "NDA123456",
      |  "sponsor_name": "TEST PHARMA",
      |  "openfda": {"brand_name": ["BRAND A", "BRAND B"], "generic_name": ["GEN X"],
      |              "manufacturer_name": ["MFG CO"]},
      |  "products": [{"brand_name": "TEST DRUG",
      |                "active_ingredients": [{"name": "ING 1"}, {"name": "ING 2"}],
      |                "dosage_form": "TABLET", "marketing_status": "Prescription"},
      |               {"brand_name": "IGNORED SECOND"}],
      |  "submissions": [{"submission_status_date": "20230110", "submission_type": "SUPPL"},
      |                  {"submission_status_date": "20250115", "submission_type": "ORIGINAL"}]
      |}]}""".stripMargin

  test("FDA flatten: openfda joins, first product, latest submission (fda_extractor.py:132-176)") {
    val payload = spark.read.schema(Schemas.fdaPayload)
      .json(Seq(fdaJson).toDS())
    val r = Flatten.fda(payload).head()
    assert(r.getAs[String]("application_number") == "NDA123456")
    assert(r.getAs[String]("openfda_brand_name") == "BRAND A, BRAND B")
    assert(r.getAs[String]("openfda_generic_name") == "GEN X")
    assert(r.getAs[String]("brand_name") == "TEST DRUG")
    assert(r.getAs[String]("active_ingredients") == "ING 1, ING 2")
    assert(r.getAs[String]("dosage_form") == "TABLET")
    // desc sort -> 20250115 wins
    assert(r.getAs[java.sql.Date]("latest_submission_date").toString == "2025-01-15")
    assert(r.getAs[String]("submission_type") == "ORIGINAL")
  }

  test("FDA flatten: minimal record -> nulls, no crash (tests/test_extractors.py:87-99)") {
    val payload = spark.read.schema(Schemas.fdaPayload)
      .json(Seq("""{"results": [{"application_number": "NDA1"}]}""").toDS())
    val r = Flatten.fda(payload).head()
    assert(r.getAs[String]("application_number") == "NDA1")
    assert(r.getAs[String]("openfda_brand_name") == null)
    assert(r.getAs[String]("brand_name") == null)
    assert(r.getAs[java.sql.Date]("latest_submission_date") == null)
  }

  private val ctJson =
    """{"studies": [{"protocolSection": {
      |  "identificationModule": {"nctId": "NCT12345678", "briefTitle": "Test Study"},
      |  "statusModule": {"overallStatus": "RECRUITING",
      |                   "startDateStruct": {"date": "2023-01-01"},
      |                   "completionDateStruct": {"date": "2024-12-31"}},
      |  "conditionsModule": {"conditions": ["Diabetes", "Obesity"], "keywords": ["metabolic"]},
      |  "designModule": {"studyType": "INTERVENTIONAL", "phases": ["PHASE 3"],
      |                   "enrollmentInfo": {"count": 150}},
      |  "armsInterventionsModule": {"interventions": [{"type": "Drug"}, {"type": "Drug"},
      |                                                 {"type": "Device"}, {"type": ""}]},
      |  "outcomesModule": {"primaryOutcomes": [{"measure": "M1"}, {"measure": "M2"},
      |                                          {"measure": "M3"}, {"measure": "M4"}]},
      |  "eligibilityModule": {"sex": "ALL", "minimumAge": "18 Years"},
      |  "contactsLocationsModule": {"locations": [{"country": "US"}, {"country": "UK"}]},
      |  "sponsorCollaboratorsModule": {"leadSponsor": {"name": "Sponsor Inc"}}
      |}}], "nextPageToken": null}""".stripMargin

  test("CT flatten: 24 columns, distinct interventions, top-3 outcomes (clinicaltrials_extractor.py:147-237)") {
    val payload = spark.read.schema(Schemas.ctPayload)
      .json(Seq(ctJson).toDS())
    val out = Flatten.ct(payload)
    assert(out.columns.length == 28) // the reference's full parse dict
    val r = out.head()
    assert(r.getAs[String]("nct_id") == "NCT12345678")
    assert(r.getAs[String]("conditions") == "Diabetes, Obesity")
    assert(r.getAs[String]("phase") == "PHASE 3")
    assert(r.getAs[Double]("enrollment_count") == 150.0)
    assert(r.getAs[String]("intervention_types") == "Drug, Device") // P6 distinct, empty filtered
    assert(r.getAs[String]("primary_outcome_measures") == "M1 | M2 | M3") // P7 top-3
    assert(r.getAs[String]("location_countries") == "US, UK")
    assert(r.getAs[String]("lead_sponsor") == "Sponsor Inc")
    assert(r.getAs[java.sql.Timestamp]("start_date").toString.startsWith("2023-01-01"))
  }

  test("CT flatten: empty studies page (tests/test_extractors.py:144-162)") {
    val payload = spark.read.schema(Schemas.ctPayload)
      .json(Seq("""{"studies": [], "nextPageToken": null}""").toDS())
    assert(Flatten.ct(payload).isEmpty)
  }
}
