package graft.pipeline

/** Typed equivalent of the reference's `pipeline_config.yaml` — the
  * single tunable surface (severity weights yaml:20-24, bins yaml:26-39,
  * quality thresholds yaml:43-48, active statuses). Defaults reproduce
  * the reference exactly; every transform/gate accepts an instance so a
  * deployment can re-tune without code change. */
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

final case class PipelineConfig(
    severity: SeverityWeights = SeverityWeights(),
    quality: QualityThresholds = QualityThresholds(),
    binning: BinningConfig = BinningConfig(),
    activeStatuses: Seq[String] =
      Seq("RECRUITING", "ACTIVE_NOT_RECRUITING", "ENROLLING_BY_INVITATION"),
    requiredFdaColumns: Seq[String] = Seq("safetyreportid", "receivedate", "drug_name"),
    requiredCtColumns: Seq[String] = Seq("nct_id", "brief_title", "overall_status"))

object PipelineConfig {
  val default: PipelineConfig = PipelineConfig()
}
