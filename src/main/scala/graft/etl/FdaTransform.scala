package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FDA adverse-event transform — parity with
  * `/root/reference/src/transformers/drug_transformer.py:92-136`.
  *
  * Column-presence probing mirrors the reference's defensive
  * `if col in df.columns` checks: upstream extraction may legitimately
  * produce a frame missing optional columns.
  */
object FdaTransform {

  val RequiredFields: Seq[String] = Seq("safetyreportid", "drug_name", "receivedate")

  def apply(df: DataFrame): DataFrame = apply(df, graft.pipeline.PipelineConfig.default)

  def apply(df: DataFrame, cfg: graft.pipeline.PipelineConfig): DataFrame = {
    if (df.isEmpty) return df
    val cols = df.columns.toSet

    var out = df
      .withColumn("processed_date", current_timestamp())
      .withColumn("data_source", lit("FDA_OpenFDA"))

    if (cols("drug_name"))
      out = out.withColumn("drug_name_clean", upper(trim(col("drug_name"))))

    // Severity: each weight contributes only when its column exists.
    val w = cfg.severity
    val sev =
      (if (cols("serious")) coalesce(col("serious"), lit(0)) * w.serious else lit(0)) +
        (if (cols("seriousnessdeath")) coalesce(col("seriousnessdeath"), lit(0)) * w.death else lit(0)) +
        (if (cols("seriousnesshospitalization")) coalesce(col("seriousnesshospitalization"), lit(0)) * w.hospitalization else lit(0))
    out = out.withColumn("severity_score", sev.cast("long"))

    if (cols("patient_age"))
      out = out.withColumn("age_group",
        EtlFunctions.cut(col("patient_age"), cfg.binning.ageBins, cfg.binning.ageLabels))

    for (f <- Seq("drug_indication", "reaction") if cols(f))
      out = out.withColumn(f, trim(coalesce(col(f), lit(""))))

    // is_complete: AND of not-null over the required fields that exist.
    val complete = RequiredFields.filter(cols).map(col(_).isNotNull)
      .foldLeft(lit(true))(_ && _)
    out = out.withColumn("is_complete", complete)

    if (cols("safetyreportid")) out = keepFirst(out, "safetyreportid")
    out
  }

  /** Deterministic keep='first' dedup: pandas keeps the first occurrence in
    * frame order, Spark's `dropDuplicates` keeps an arbitrary row. A
    * `monotonically_increasing_id` snapshot of read order + a window makes
    * the choice stable ((partition-id, in-partition offset) is monotone in
    * file order for an ordered scan).
    */
  private[etl] def keepFirst(df: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__ingest_ord"))
    df.withColumn("__ingest_ord", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__ingest_ord", "__rn")
  }
}
