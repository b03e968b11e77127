package graft.pipeline

import org.yaml.snakeyaml.Yaml

import scala.jdk.CollectionConverters._

/** Loads [[PipelineConfig]] from the reference's YAML layout
  * (`dags/config/pipeline_config.yaml`) so the config file remains the
  * single source of truth: re-tuning a weight, bin, threshold, or storage
  * format is a file edit, not a recompile.
  *
  * Parsing uses SnakeYAML, which ships in Spark's own jar directory — no
  * added dependency. Missing sections or keys fall back to the matching
  * [[PipelineConfig.default]] values, so a partial override file is
  * valid; unknown keys are ignored.
  *
  * Bin translation: the yaml encodes `age_groups` / `study_size_categories`
  * as `[lo, hi, label]` triples with contiguous edges
  * (pipeline_config.yaml:26-39); they map onto `cut`-style edge lists.
  * The reference's `999999` sentinel on the last study-size bin means
  * "unbounded" and is read as `Double.PositiveInfinity`. */
object PipelineConfigLoader {

  def fromFile(path: String): PipelineConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def fromYaml(text: String): PipelineConfig = {
    val root = asMap(new Yaml().load[Any](text))
    val d = PipelineConfig.default

    val transform = section(root, "transformation")
    val weights = section(transform, "severity_weights")
    val quality = section(root, "quality")
    val required = section(quality, "required_fields")
    val extraction = section(root, "extraction")
    val storage = section(root, "storage")
    val alerts = section(section(root, "monitoring"), "alerts")

    val (ageBins, ageLabels) =
      bins(transform.get("age_groups"), d.binning.ageBins -> d.binning.ageLabels)
    val (sizeBins, sizeLabels) =
      bins(transform.get("study_size_categories"),
        d.binning.studySizeBins -> d.binning.studySizeLabels)

    PipelineConfig(
      severity = SeverityWeights(
        serious = int(weights, "serious", d.severity.serious),
        death = int(weights, "death", d.severity.death),
        hospitalization = int(weights, "hospitalization", d.severity.hospitalization)),
      quality = QualityThresholds(
        maxNullPct = dbl(quality, "max_missing_percentage", d.quality.maxNullPct),
        minRecords = int(quality, "min_total_records", d.quality.minRecords),
        minPerSource = int(quality, "min_records_per_source", d.quality.minPerSource)),
      binning = BinningConfig(ageBins, ageLabels, sizeBins, sizeLabels),
      extraction = ExtractionConfig(
        fdaLimit = int(extraction, "fda_limit", d.extraction.fdaLimit),
        clinicalTrialsLimit =
          int(extraction, "clinical_trials_limit", d.extraction.clinicalTrialsLimit),
        retryAttempts = int(extraction, "retry_attempts", d.extraction.retryAttempts),
        retryDelaySeconds =
          int(extraction, "retry_delay_seconds", d.extraction.retryDelaySeconds),
        timeoutSeconds = int(extraction, "timeout_seconds", d.extraction.timeoutSeconds)),
      storage = StorageConfig(
        rawPrefix = str(storage, "raw_prefix", d.storage.rawPrefix),
        processedPrefix = str(storage, "processed_prefix", d.storage.processedPrefix),
        logsPrefix = str(storage, "logs_prefix", d.storage.logsPrefix),
        rawFormat = str(storage, "raw_format", d.storage.rawFormat),
        processedFormat = str(storage, "processed_format", d.storage.processedFormat),
        summaryFormat = str(storage, "summary_format", d.storage.summaryFormat),
        compression = str(storage, "compression", d.storage.compression),
        partitionBy = strSeq(storage, "partition_by", d.storage.partitionBy)),
      alerts = AlertThresholds(
        maxProcessingTimeMinutes =
          int(alerts, "max_processing_time_minutes", d.alerts.maxProcessingTimeMinutes),
        minRecordCount = int(alerts, "min_record_count", d.alerts.minRecordCount),
        maxErrorRate = dbl(alerts, "max_error_rate", d.alerts.maxErrorRate),
        minQualityScore = dbl(alerts, "min_quality_score", d.alerts.minQualityScore)),
      activeStatuses = d.activeStatuses,
      requiredFdaColumns = strSeq(required, "fda", d.requiredFdaColumns),
      requiredCtColumns = strSeq(required, "clinical_trials", d.requiredCtColumns))
  }

  // ---- yaml plumbing (SnakeYAML yields java.util maps/lists) ----------

  private val UnboundedSentinel = 999999.0

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case _ => Map.empty
  }

  private def section(m: Map[String, Any], key: String): Map[String, Any] =
    m.get(key).map(asMap).getOrElse(Map.empty)

  private def int(m: Map[String, Any], key: String, dflt: Int): Int =
    m.get(key) match {
      case Some(n: Number) => n.intValue()
      case _ => dflt
    }

  private def dbl(m: Map[String, Any], key: String, dflt: Double): Double =
    m.get(key) match {
      case Some(n: Number) => n.doubleValue()
      case _ => dflt
    }

  private def str(m: Map[String, Any], key: String, dflt: String): String =
    m.get(key) match {
      case Some(s: String) => s
      case _ => dflt
    }

  private def strSeq(m: Map[String, Any], key: String, dflt: Seq[String]): Seq[String] =
    m.get(key) match {
      case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      case _ => dflt
    }

  /** `[[lo, hi, label], ...]` triples → (edge list, labels). Edges are
    * taken as first-lo then every hi (the yaml's rows are contiguous);
    * the 999999 sentinel on a final edge reads as unbounded. */
  private def bins(v: Option[Any],
      dflt: (Seq[Double], Seq[String])): (Seq[Double], Seq[String]) = v match {
    case Some(l: java.util.List[_]) if !l.isEmpty =>
      val rows = l.asScala.toSeq.map {
        case row: java.util.List[_] =>
          val cells = row.asScala.toSeq
          require(cells.length == 3, s"bin row must be [lo, hi, label], got $cells")
          (cells(0).asInstanceOf[Number].doubleValue(),
            cells(1).asInstanceOf[Number].doubleValue(),
            cells(2).toString)
        case other => throw new IllegalArgumentException(s"bin row must be a list, got $other")
      }
      // Edges come from first-lo + every hi, which is only a valid cut
      // list if the rows tile the range: each row's lo must equal the
      // previous row's hi and every hi must be strictly above its lo —
      // overlapping or gapped rows would silently mis-bin.
      rows.sliding(2).foreach {
        case Seq((_, hi, l1), (lo, _, l2)) =>
          require(lo == hi,
            s"bin rows must be contiguous: '$l1' ends at $hi but '$l2' starts at $lo")
        case _ => ()
      }
      rows.foreach { case (lo, hi, label) =>
        require(hi > lo, s"bin '$label' is empty or inverted: [$lo, $hi]")
      }
      val edges = (rows.head._1 +: rows.map(_._2)).map(e =>
        if (e >= UnboundedSentinel) Double.PositiveInfinity else e)
      (edges, rows.map(_._3))
    case _ => dflt
  }
}
