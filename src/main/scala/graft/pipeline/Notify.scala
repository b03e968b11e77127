package graft.pipeline

import graft.quality.QualityReport

/** SLA evaluation of one run against the yaml alert thresholds
  * (pipeline_config.yaml:128-132): wall-clock, record count, error rate,
  * quality score. `breaches` is empty when every SLA held. */
final case class SlaEvaluation(
    processingMinutes: Double,
    errorRate: Double,
    qualityScore: Double,
    breaches: Seq[String]) {
  def passed: Boolean = breaches.isEmpty
}

/** The completion notification the reference's DAG formats and would
  * send via SNS/email (medical_etl_dag.py:136-158) — here a value the
  * caller routes to whatever alerting exists. */
final case class Notification(subject: String, message: String, sla: SlaEvaluation)

object Notify {

  /** Fraction of quality checks that passed, in [0,1] — the pipeline's
    * data_quality_score metric (pipeline_config.yaml:122). */
  def qualityScore(r: QualityReport): Double =
    if (r.totalChecks == 0) 1.0
    else (r.totalChecks - r.failedChecks).toDouble / r.totalChecks

  def evaluateSla(result: RunResult, processingMinutes: Double,
      errorRate: Double, cfg: PipelineConfig): SlaEvaluation = {
    val a = cfg.alerts
    val qs = qualityScore(result.quality)
    val breaches = Seq.newBuilder[String]
    if (processingMinutes > a.maxProcessingTimeMinutes)
      breaches += f"processing time $processingMinutes%.1f min exceeds ${a.maxProcessingTimeMinutes} min"
    if (result.enrichedCount < a.minRecordCount)
      breaches += s"record count ${result.enrichedCount} below minimum ${a.minRecordCount}"
    if (errorRate > a.maxErrorRate)
      breaches += f"error rate $errorRate%.4f exceeds ${a.maxErrorRate}%.2f"
    if (qs < a.minQualityScore)
      breaches += f"quality score $qs%.4f below ${a.minQualityScore}%.2f"
    SlaEvaluation(processingMinutes, errorRate, qs, breaches.result())
  }

  /** Completion message with the DAG's fields (date, per-source counts,
    * output location) plus the SLA verdicts. */
  def completion(result: RunResult, sla: SlaEvaluation): Notification = {
    val status =
      if (sla.passed && result.quality.passed) "Completed Successfully"
      else "Completed With Alerts"
    val breachLines =
      if (sla.breaches.isEmpty) "none"
      else sla.breaches.mkString("\n  - ", "\n  - ", "")
    val qualityLines =
      if (result.quality.failures.isEmpty) "all checks passed"
      else result.quality.failures.mkString("\n  - ", "\n  - ", "")
    val message =
      s"""Medical ETL Pipeline $status
         |
         |Date: ${result.date}
         |FDA Records: ${result.fdaCount}
         |Clinical Trials: ${result.ctCount}
         |Enriched Records: ${result.enrichedCount}
         |Quality Score: ${f"${sla.qualityScore * 100}%.1f"}% ($qualityLines)
         |SLA Breaches: $breachLines
         |
         |Data available at:
         |${result.processedPath}
         |""".stripMargin
    Notification(s"Medical ETL $status: ${result.date}", message, sla)
  }
}
