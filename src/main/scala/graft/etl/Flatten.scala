package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested-payload flattening — the extractors' Python parse loops
  * (`/root/reference/src/extractors/fda_extractor.py:125-176`,
  * `clinicaltrials_extractor.py:112-237`) re-expressed as pure column
  * expressions over the raw nested JSON: struct field access, higher-order
  * array functions, comparator `array_sort`. Everything stays inside
  * whole-stage codegen; nested-schema pruning means a query touching 3 of
  * the 24 CT columns only parses those 3 paths.
  */
object Flatten {

  /** FDA payload ({"results": [...]}) → 11-column flat frame. */
  def fda(payload: DataFrame): DataFrame =
    fdaRecords(payload.select(explode(col("results")).as("r")).select("r.*"))

  /** One row per Drugs@FDA application record → flat columns.
    * fda_extractor.py:132-176 semantics:
    *   - openfda absent → nulls; present → ", "-joined arrays (missing
    *     sub-array → ""; the reference's `openfda.get(k, [])`);
    *   - products: first element only ("could explode" per the reference
    *     comment), ingredients name-joined;
    *   - submissions: sort desc by status date (missing date → ""), first;
    *   - latest_submission_date parsed yyyyMMdd, null on failure. */
  def fdaRecords(records: DataFrame): DataFrame = {
    def joined(c: String) =
      when(col("openfda").isNotNull,
        coalesce(concat_ws(", ", col(s"openfda.$c")), lit("")))
    val firstProduct = element_at(col("products"), 1)
    // Comparator array_sort: desc by submission_status_date, nulls/missing
    // treated as "" (sort last), matching the Python `x.get(..., '')` key.
    val latestSubmission = element_at(
      expr("""array_sort(submissions, (l, r) -> CASE
              |  WHEN coalesce(l.submission_status_date, '') > coalesce(r.submission_status_date, '') THEN -1
              |  WHEN coalesce(l.submission_status_date, '') < coalesce(r.submission_status_date, '') THEN 1
              |  ELSE 0 END)""".stripMargin), 1)
    records.select(
      col("application_number"),
      col("sponsor_name"),
      joined("brand_name").as("openfda_brand_name"),
      joined("generic_name").as("openfda_generic_name"),
      joined("manufacturer_name").as("openfda_manufacturer_name"),
      firstProduct.getField("brand_name").as("brand_name"),
      when(col("products").isNotNull && size(col("products")) > 0,
        concat_ws(", ",
          transform(firstProduct.getField("active_ingredients"),
            i => coalesce(i.getField("name"), lit("")))))
        .as("active_ingredients"),
      firstProduct.getField("dosage_form").as("dosage_form"),
      firstProduct.getField("marketing_status").as("marketing_status"),
      // try_to_date: the reference coerces parse failures to null
      // (pd.to_datetime errors='coerce'); plain to_date THROWS under
      // Spark 4's default ANSI mode and one malformed API value would
      // kill the daily run.
      try_to_date(latestSubmission.getField("submission_status_date"), "yyyyMMdd")
        .as("latest_submission_date"),
      latestSubmission.getField("submission_type").as("submission_type"))
  }

  /** CT payload ({"studies": [...]}) → 24-column flat frame. */
  def ct(payload: DataFrame): DataFrame =
    ctStudies(payload.select(explode(col("studies")).as("s")).select("s.protocolSection"))

  /** One row per study (protocolSection struct) → flat columns.
    * clinicaltrials_extractor.py:147-237 semantics, incl.:
    *   - P6 distinct intervention types (empty strings filtered);
    *   - P7 top-3 outcome measures " | "-joined;
    *   - generic date parse w/ coerce; enrollment numeric w/ coerce. */
  def ctStudies(records: DataFrame): DataFrame = {
    val p = col("protocolSection")
    def arrJoin(c: org.apache.spark.sql.Column) = coalesce(concat_ws(", ", c), lit(""))
    records.select(
      p.getField("identificationModule").getField("nctId").as("nct_id"),
      p.getField("identificationModule").getField("orgStudyIdInfo").getField("id").as("org_study_id"),
      p.getField("identificationModule").getField("briefTitle").as("brief_title"),
      p.getField("identificationModule").getField("officialTitle").as("official_title"),
      p.getField("statusModule").getField("overallStatus").as("overall_status"),
      try_to_timestamp(p.getField("statusModule").getField("studyFirstPostDateStruct").getField("date")).as("study_first_post_date"),
      try_to_timestamp(p.getField("statusModule").getField("lastUpdatePostDateStruct").getField("date")).as("last_update_post_date"),
      try_to_timestamp(p.getField("statusModule").getField("startDateStruct").getField("date")).as("start_date"),
      try_to_timestamp(p.getField("statusModule").getField("completionDateStruct").getField("date")).as("completion_date"),
      p.getField("descriptionModule").getField("briefSummary").as("brief_summary"),
      p.getField("descriptionModule").getField("detailedDescription").as("detailed_description"),
      arrJoin(p.getField("conditionsModule").getField("conditions")).as("conditions"),
      arrJoin(p.getField("conditionsModule").getField("keywords")).as("keywords"),
      p.getField("designModule").getField("studyType").as("study_type"),
      arrJoin(p.getField("designModule").getField("phases")).as("phase"),
      p.getField("designModule").getField("enrollmentInfo").getField("count")
        .cast("double").as("enrollment_count"),
      p.getField("designModule").getField("designInfo").getField("allocation").as("allocation"),
      p.getField("designModule").getField("designInfo").getField("interventionModel").as("intervention_model"),
      p.getField("designModule").getField("designInfo").getField("primaryPurpose").as("primary_purpose"),
      p.getField("designModule").getField("designInfo").getField("masking").getField("masking").as("masking"),
      // P6: distinct non-empty intervention types (first-occurrence order —
      // deterministic, unlike the reference's Python set iteration).
      concat_ws(", ", array_distinct(filter(
        transform(p.getField("armsInterventionsModule").getField("interventions"),
          i => coalesce(i.getField("type"), lit(""))),
        x => x =!= ""))).as("intervention_types"),
      // P7: top-3 outcome measures.
      concat_ws(" | ", filter(
        transform(slice(p.getField("outcomesModule").getField("primaryOutcomes"), 1, 3),
          o => coalesce(o.getField("measure"), lit(""))),
        x => x =!= "")).as("primary_outcome_measures"),
      p.getField("eligibilityModule").getField("sex").as("gender"),
      p.getField("eligibilityModule").getField("minimumAge").as("min_age"),
      p.getField("eligibilityModule").getField("maximumAge").as("max_age"),
      p.getField("eligibilityModule").getField("healthyVolunteers").as("accepts_healthy"),
      concat_ws(", ", transform(
        p.getField("contactsLocationsModule").getField("locations"),
        l => coalesce(l.getField("country"), lit("")))).as("location_countries"),
      p.getField("sponsorCollaboratorsModule").getField("leadSponsor").getField("name").as("lead_sponsor"))
  }
}
