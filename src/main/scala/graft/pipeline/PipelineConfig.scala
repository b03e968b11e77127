package graft.pipeline

/** Typed equivalent of the reference's `pipeline_config.yaml` — the
  * single tunable surface (severity weights yaml:20-24, bins yaml:26-39,
  * quality thresholds yaml:43-48, extraction envelope yaml:11-16,
  * storage layout yaml:66-84, alert thresholds yaml:128-132). Defaults
  * reproduce the reference exactly; every transform/gate accepts an
  * instance so a deployment can re-tune without code change, and
  * [[PipelineConfigLoader]] reads the YAML file itself so the config
  * file stays the single source of truth. */
final case class SeverityWeights(serious: Int = 2, death: Int = 10, hospitalization: Int = 5)

final case class QualityThresholds(
    maxNullPct: Double = 10.0,
    minRecords: Int = 10,
    minPerSource: Int = 5)

final case class BinningConfig(
    ageBins: Seq[Double] = Seq(0, 18, 30, 50, 65, 100),
    ageLabels: Seq[String] = Seq("Pediatric", "Young Adult", "Adult", "Senior", "Elderly"),
    studySizeBins: Seq[Double] = Seq(0, 50, 200, 1000, Double.PositiveInfinity),
    studySizeLabels: Seq[String] = Seq("Small", "Medium", "Large", "Very Large"))

/** Extraction envelope (yaml `extraction:`): per-day record caps and the
  * retry/timeout parameters the HTTP transports consume. */
final case class ExtractionConfig(
    fdaLimit: Int = 1000,
    clinicalTrialsLimit: Int = 100,
    retryAttempts: Int = 3,
    retryDelaySeconds: Int = 5,
    timeoutSeconds: Int = 30)

/** Lake layout (yaml `storage:`): zone prefixes, formats, partitioning. */
final case class StorageConfig(
    rawPrefix: String = "raw",
    processedPrefix: String = "processed",
    logsPrefix: String = "logs",
    rawFormat: String = "json",
    processedFormat: String = "parquet",
    summaryFormat: String = "csv",
    compression: String = "snappy",
    partitionBy: Seq[String] = Seq("year", "month", "day"))

/** Run-level SLAs (yaml `monitoring.alerts:`), evaluated against each
  * RunResult to drive the notification payload. */
final case class AlertThresholds(
    maxProcessingTimeMinutes: Int = 60,
    minRecordCount: Int = 10,
    maxErrorRate: Double = 0.05,
    minQualityScore: Double = 0.95)

final case class PipelineConfig(
    severity: SeverityWeights = SeverityWeights(),
    quality: QualityThresholds = QualityThresholds(),
    binning: BinningConfig = BinningConfig(),
    extraction: ExtractionConfig = ExtractionConfig(),
    storage: StorageConfig = StorageConfig(),
    alerts: AlertThresholds = AlertThresholds(),
    activeStatuses: Seq[String] =
      Seq("RECRUITING", "ACTIVE_NOT_RECRUITING", "ENROLLING_BY_INVITATION"),
    requiredFdaColumns: Seq[String] = Seq("safetyreportid", "receivedate", "drug_name"),
    requiredCtColumns: Seq[String] = Seq("nct_id", "brief_title", "overall_status"))

object PipelineConfig {
  val default: PipelineConfig = PipelineConfig()
}
