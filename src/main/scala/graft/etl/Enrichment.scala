package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The enrichment centerpiece — parity with
  * `/root/reference/src/transformers/drug_transformer.py:189-288`.
  *
  * Reference shape: per-drug FDA summary ⟕ fuzzy bidirectional-containment
  * match against a per-condition trial summary, implemented there as an
  * O(drugs × conditions) single-threaded `iterrows` loop. Here it is a
  * declarative non-equi theta join: Catalyst plans a
  * BroadcastNestedLoopJoin with the (post-aggregation, small) trial-summary
  * side broadcast, so the quadratic work is distributed across executors
  * and never leaves the JVM.
  *
  * Double-count hazard (SURVEY §7.5 #1): the reference's `any(...)` makes
  * the match an EXISTS per (drug, condition-summary-row) — a drug whose
  * several indications match the same condition row must count that row
  * once. The `dropDuplicates(drug, condition)` between join and rollup
  * encodes exactly that.
  */
object Enrichment {

  /** A1: per-drug adverse-event summary (drug_transformer.py:196-213).
    * Column-defensive like the transforms: the reference's own extractor
    * emits application-shaped records without the event columns, so each
    * aggregate contributes only when its input exists (count falls back
    * to row count, sums to 0, avg severity to 0.0). */
  def fdaSummary(fda: DataFrame): DataFrame = {
    val cols = fda.columns.toSet
    def sumIf(c: String) = if (cols(c)) coalesce(sum(col(c)), lit(0L)) else lit(0L)
    fda.groupBy(col("drug_name_clean").as("drug_name"))
      .agg(
        (if (cols("safetyreportid")) count(col("safetyreportid"))
         else count(lit(1))).as("adverse_event_count"),
        (if (cols("severity_score")) avg(col("severity_score"))
         else lit(0.0)).as("avg_severity_score"),
        sumIf("seriousnessdeath").as("death_count"),
        sumIf("seriousnesshospitalization").as("hospitalization_count"))
  }

  /** A2: per-condition trial summary (drug_transformer.py:215-228).
    * Booleans sum as ints in pandas → explicit cast to long. */
  def ctSummary(ct: DataFrame): DataFrame = {
    val cols = ct.columns.toSet
    ct.groupBy(col("conditions_clean").as("condition"))
      .agg(
        (if (cols("nct_id")) count(col("nct_id"))
         else count(lit(1))).as("trial_count"),
        (if (cols("enrollment_count")) coalesce(sum(col("enrollment_count")), lit(0.0))
         else lit(0.0)).as("total_enrollment"),
        (if (cols("is_completed")) coalesce(sum(col("is_completed").cast("long")), lit(0L))
         else lit(0L)).as("completed_trials"))
  }

  /** J1 + A3 + J2 branch logic. Inputs are the *transformed* FDA / CT
    * frames; either may be empty. */
  def enrich(fda: DataFrame, ct: DataFrame): DataFrame = {
    // A frame without the per-drug key can't be summarized — treat it as
    // absent (the reference would KeyError here; the J2 fallback is the
    // intended behavior).
    val fdaEmpty = fda.isEmpty || !fda.columns.contains("drug_name_clean")
    val ctEmpty = ct.isEmpty || !ct.columns.contains("conditions_clean")

    if (fdaEmpty && ctEmpty) fda // empty passthrough, reference returns empty
    else if (ctEmpty) fdaSummary(fda)
    else if (fdaEmpty) ctSummary(ct)
    else if (!fda.columns.contains("drug_indication")) fdaSummary(fda)
    else {
      val drugs = fdaSummary(fda)
      val trials = ctSummary(ct)
        .withColumn("condition_norm", EtlFunctions.normalizeForMatching(col("condition")))

      // D3 + P22: distinct (drug, indication) pairs, normalized; the
      // reference's `if ind` guard skips empty indications.
      val indications = fda
        .select(col("drug_name_clean").as("drug_name"), col("drug_indication"))
        .distinct()
        .withColumn("indication_norm", EtlFunctions.normalizeForMatching(col("drug_indication")))
        .where(col("indication_norm") =!= "")
        .select("drug_name", "indication_norm")

      // Bidirectional containment theta join. The trial-summary side is
      // small by construction (one row per distinct condition) → broadcast.
      val matched = indications
        .join(broadcast(trials),
          col("condition_norm").contains(col("indication_norm")) ||
            col("indication_norm").contains(col("condition_norm")),
          "inner")
        // EXISTS semantics: one hit per (drug, condition-summary-row).
        .select("drug_name", "condition", "trial_count", "total_enrollment", "completed_trials")
        .dropDuplicates("drug_name", "condition")
        .groupBy("drug_name")
        .agg(
          sum(col("trial_count")).as("trial_count"),
          sum(col("total_enrollment")).as("total_enrollment"),
          sum(col("completed_trials")).as("completed_trials"))

      // Left-outer + zero-fill: drugs with no matching trials keep their
      // FDA stats with 0 trial columns (drug_transformer.py:270-276).
      drugs.join(broadcast(matched), Seq("drug_name"), "left_outer")
        .na.fill(0, Seq("trial_count", "total_enrollment", "completed_trials"))
    }
  }
}
