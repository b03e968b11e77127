package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClinicalTrials.gov transform — parity with
  * `/root/reference/src/transformers/drug_transformer.py:138-187`. */
object CtTransform {

  val ActiveStatuses: Seq[String] =
    Seq("RECRUITING", "ACTIVE_NOT_RECRUITING", "ENROLLING_BY_INVITATION")

  def apply(df: DataFrame): DataFrame = apply(df, graft.pipeline.PipelineConfig.default)

  def apply(df: DataFrame, cfg: graft.pipeline.PipelineConfig): DataFrame = {
    if (df.isEmpty) return df
    val cols = df.columns.toSet

    var out = df
      .withColumn("processed_date", current_timestamp())
      .withColumn("data_source", lit("ClinicalTrials_gov"))

    if (cols("start_date") && cols("completion_date"))
      out = out.withColumn("study_duration_days",
        datediff(col("completion_date"), col("start_date")))

    if (cols("phase"))
      out = out.withColumn("phase_numeric", EtlFunctions.phaseNumeric(col("phase")))

    if (cols("enrollment_count"))
      out = out.withColumn("study_size_category",
        EtlFunctions.cut(col("enrollment_count"),
          cfg.binning.studySizeBins, cfg.binning.studySizeLabels))

    if (cols("overall_status")) {
      out = out
        .withColumn("is_active", col("overall_status").isin(cfg.activeStatuses: _*))
        .withColumn("is_completed", col("overall_status") === "COMPLETED")
    }

    if (cols("conditions"))
      out = out.withColumn("conditions_clean", upper(col("conditions")))

    if (cols("nct_id")) out = FdaTransform.keepFirst(out, "nct_id")
    out
  }
}
