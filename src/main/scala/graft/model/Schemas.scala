package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the two upstream payload shapes and their
  * flattened record forms — the reference's implicit dict schemas
  * (`/root/reference/src/extractors/fda_extractor.py:132-162`,
  * `clinicaltrials_extractor.py:147-200`) made first-class, so
  * `spark.read.schema(...).json` gets nested-schema pruning and never
  * pays inference.
  */
/** Typed row for the flat FDA adverse-event shape (SURVEY §1 engine
  * decision: optional `Dataset[T]` views over the DataFrame layer). */
final case class FdaEvent(
    safetyreportid: String,
    receivedate: java.sql.Timestamp,
    serious: Option[Long],
    seriousnessdeath: Option[Long],
    seriousnesshospitalization: Option[Long],
    drug_name: String,
    drug_indication: Option[String],
    reaction: Option[String],
    patient_age: Option[Double],
    patient_sex: Option[String])

/** Typed row for the minimal flat clinical-trial shape. */
final case class ClinicalTrial(
    nct_id: String,
    brief_title: Option[String],
    overall_status: Option[String],
    phase: Option[String],
    enrollment_count: Option[Double],
    conditions: Option[String],
    start_date: Option[java.sql.Timestamp],
    completion_date: Option[java.sql.Timestamp])

/** Typed row for the enriched output (drug_transformer.py:205-228). */
final case class EnrichedDrug(
    drug_name: String,
    adverse_event_count: Long,
    avg_severity_score: Double,
    death_count: Long,
    hospitalization_count: Long,
    trial_count: Long,
    total_enrollment: Double,
    completed_trials: Long)

object Schemas {

  // ---- FDA Drugs@FDA raw payload -----------------------------------
  val fdaActiveIngredient: StructType = StructType(Seq(
    StructField("name", StringType)))

  val fdaProduct: StructType = StructType(Seq(
    StructField("brand_name", StringType),
    StructField("active_ingredients", ArrayType(fdaActiveIngredient)),
    StructField("dosage_form", StringType),
    StructField("marketing_status", StringType)))

  val fdaSubmission: StructType = StructType(Seq(
    StructField("submission_status_date", StringType),
    StructField("submission_type", StringType)))

  val fdaOpenFda: StructType = StructType(Seq(
    StructField("brand_name", ArrayType(StringType)),
    StructField("generic_name", ArrayType(StringType)),
    StructField("manufacturer_name", ArrayType(StringType))))

  val fdaRecord: StructType = StructType(Seq(
    StructField("application_number", StringType),
    StructField("sponsor_name", StringType),
    StructField("openfda", fdaOpenFda),
    StructField("products", ArrayType(fdaProduct)),
    StructField("submissions", ArrayType(fdaSubmission))))

  val fdaPayload: StructType = StructType(Seq(
    StructField("results", ArrayType(fdaRecord))))

  // ---- ClinicalTrials.gov v2 raw payload ---------------------------
  private def s(pairs: (String, DataType)*): StructType =
    StructType(pairs.map { case (n, t) => StructField(n, t) })

  val ctProtocolSection: StructType = s(
    "identificationModule" -> s(
      "nctId" -> StringType,
      "orgStudyIdInfo" -> s("id" -> StringType),
      "briefTitle" -> StringType,
      "officialTitle" -> StringType),
    "statusModule" -> s(
      "overallStatus" -> StringType,
      "studyFirstPostDateStruct" -> s("date" -> StringType),
      "lastUpdatePostDateStruct" -> s("date" -> StringType),
      "startDateStruct" -> s("date" -> StringType),
      "completionDateStruct" -> s("date" -> StringType)),
    "descriptionModule" -> s(
      "briefSummary" -> StringType,
      "detailedDescription" -> StringType),
    "conditionsModule" -> s(
      "conditions" -> ArrayType(StringType),
      "keywords" -> ArrayType(StringType)),
    "designModule" -> s(
      "studyType" -> StringType,
      "phases" -> ArrayType(StringType),
      "enrollmentInfo" -> s("count" -> StringType),
      "designInfo" -> s(
        "allocation" -> StringType,
        "interventionModel" -> StringType,
        "primaryPurpose" -> StringType,
        "masking" -> s("masking" -> StringType))),
    "armsInterventionsModule" -> s(
      "interventions" -> ArrayType(s("type" -> StringType))),
    "outcomesModule" -> s(
      "primaryOutcomes" -> ArrayType(s("measure" -> StringType))),
    "eligibilityModule" -> s(
      "sex" -> StringType,
      "minimumAge" -> StringType,
      "maximumAge" -> StringType,
      "healthyVolunteers" -> BooleanType),
    "contactsLocationsModule" -> s(
      "locations" -> ArrayType(s("country" -> StringType))),
    "sponsorCollaboratorsModule" -> s(
      "leadSponsor" -> s("name" -> StringType)))

  val ctStudy: StructType = s("protocolSection" -> ctProtocolSection)

  val ctPayload: StructType = s(
    "studies" -> ArrayType(ctStudy),
    "nextPageToken" -> StringType)

  // ---- Flat (post-extraction) event shape used by the transform layer
  val fdaEvent: StructType = StructType(Seq(
    StructField("safetyreportid", StringType),
    StructField("receivedate", TimestampType),
    StructField("serious", LongType),
    StructField("seriousnessdeath", LongType),
    StructField("seriousnesshospitalization", LongType),
    StructField("drug_name", StringType),
    StructField("drug_indication", StringType),
    StructField("reaction", StringType),
    StructField("patient_age", DoubleType),
    StructField("patient_sex", StringType)))

  val ctFlat: StructType = StructType(Seq(
    StructField("nct_id", StringType),
    StructField("brief_title", StringType),
    StructField("overall_status", StringType),
    StructField("phase", StringType),
    StructField("enrollment_count", DoubleType),
    StructField("conditions", StringType),
    StructField("start_date", TimestampType),
    StructField("completion_date", TimestampType)))
}
