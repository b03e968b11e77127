package graft.pipeline

import graft.etl.{CtTransform, Enrichment, FdaTransform}
import graft.io.Lake
import graft.quality.{QualityChecks, QualityReport}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Outcome of one daily run — replaces the reference's XCom counters and
  * notification payload (`/root/reference/dags/medical_etl_dag.py:98-158`). */
case class RunResult(
    date: String,
    fdaCount: Long,
    ctCount: Long,
    enrichedCount: Long,
    quality: QualityReport,
    processedPath: String,
    /** Transformed records flagged `is_complete = false`, measured at the
      * transform stage — enrichment aggregates the flag away, so the
      * error-rate SLA must be taken before the summaries. */
    incompleteCount: Long = 0L,
    /** Row counts of the transformed frames (post-dedup/filter) — the
      * denominator matching where incompleteCount is measured, so the
      * error-rate SLA is a true fraction of transformed records. */
    transformedCount: Long = 0L)

/** The whole Airflow DAG collapsed into one Spark driver program
  * (`/root/reference/dags/medical_etl_dag.py:162-231` — extract →
  * validate → transform → quality-gate → notify). Stage boundaries become
  * lazy DataFrame transformations; the only materializations are the
  * final write and the count/quality actions. Implements the *intended*
  * semantics, not the reference's dead FDA-write branch (SURVEY §3.1).
  *
  * Scale note: the raw zone is Hive-partitioned `year=/month=/day=`; a
  * daily run reads exactly one partition (partition pruning — no full
  * scan), transforms are narrow until the two summary aggregations, and
  * the enrichment join broadcasts the small summaries. At 100 TB/day the
  * only shuffles are the two groupBys.
  */
object Pipeline {

  def run(spark: SparkSession, lakeRoot: String, date: String): RunResult =
    run(spark, lakeRoot, date, PipelineConfig.default)

  def run(spark: SparkSession, lakeRoot: String, date: String,
      cfg: PipelineConfig, inferRawSchema: Boolean = false,
      /** Raw-zone row counts already known to the caller (runFromApis
        * observes them on the landing write) — passing them skips the
        * two count jobs that would otherwise re-read the raw zone. */
      landedCounts: Option[(Long, Long)] = None): RunResult = {
    // Extraction stage equivalent: raw JSON already landed (by the
    // connectors via runFromApis, or externally). The fixed schemas serve
    // pre-landed event-shaped data; connector-landed data reads back with
    // its own (inferred) shape — FdaTransform/CtTransform probe columns
    // defensively either way, like the reference's `if col in df.columns`.
    val (fdaSchema, ctSchema) =
      if (inferRawSchema) (None, None)
      else (Some(graft.model.Schemas.fdaEvent), Some(graft.model.Schemas.ctFlat))
    val st = cfg.storage
    val fdaRaw = Lake.readJson(spark,
      Lake.rawPath(lakeRoot, "fda", date, st.rawPrefix), fdaSchema)
    val ctRaw = Lake.readJson(spark,
      Lake.rawPath(lakeRoot, "clinical_trials", date, st.rawPrefix), ctSchema)

    val fdaT = FdaTransform(fdaRaw, cfg)
    val ctT = CtTransform(ctRaw, cfg)
    val enriched = Enrichment.enrich(fdaT, ctT)

    val outPath = Lake.processedPath(lakeRoot, date,
      s"enriched_data.${st.processedFormat}", st.processedPrefix)
    if (!enriched.isEmpty) {
      Lake.writeAs(enriched, outPath, st.processedFormat)
      // Summary of the first 1000 rows (drug_transformer.py:306).
      Lake.writeAs(enriched.limit(1000),
        Lake.processedPath(lakeRoot, date, s"summary.${st.summaryFormat}",
          st.processedPrefix),
        st.summaryFormat)
    } else {
      // An empty transform must not leave a PREVIOUS run's output for
      // this date in place — the reload below would validate and report
      // stale rows as this run's result.
      Lake.delete(spark, outPath)
      Lake.delete(spark, Lake.processedPath(lakeRoot, date,
        s"summary.${st.summaryFormat}", st.processedPrefix))
    }

    // Quality gate re-reads the processed zone, like the reference's
    // separate quality_checks task (medical_etl_dag.py:216-219).
    val reloaded: DataFrame = Lake.readAs(spark, outPath, st.processedFormat)
    val report = QualityChecks.validate(reloaded, date, cfg)

    // error_rate input: incompleteness is a per-record transform-stage
    // property (FdaTransform's completeness flag); the enrichment
    // summaries drop it, so count it here — fused with the transformed
    // row count in ONE aggregation job per source (the matching SLA
    // denominator; a filter-count plus a separate total would scan the
    // transform output twice).
    def stats(df: DataFrame): (Long, Long) =
      if (df.columns.isEmpty) (0L, 0L)
      else {
        import org.apache.spark.sql.functions.{col, count, lit, sum, when}
        val inc =
          if (df.columns.contains("is_complete"))
            sum(when(col("is_complete") === false, 1L).otherwise(0L))
          else sum(lit(0L))
        val r = df.agg(count(lit(1)).as("n"), inc.as("inc")).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
    val (fdaN, fdaInc) = stats(fdaT)
    val (ctN, ctInc) = stats(ctT)
    val (fdaLanded, ctLanded) =
      landedCounts.getOrElse((fdaRaw.count(), ctRaw.count()))

    RunResult(date, fdaLanded, ctLanded, reloaded.count(), report, outPath,
      incompleteCount = fdaInc + ctInc,
      transformedCount = fdaN + ctN)
  }

  /** The full DAG topology in one call (medical_etl_dag.py:231:
    * extract ∥ extract → validate → transform → quality gate → notify):
    * connectors pull the paginated APIs and land raw JSON in the lake's
    * raw zone, a zero-record extraction fails the run like the DAG's
    * validate_extraction task (:104-116), then the landed data flows
    * through the standard transform/enrich/gate path, and the result is
    * evaluated against the configured SLAs into a notification payload
    * (:136-158).
    *
    * `fdaOptions` / `ctOptions` are DSv2 reader option maps — fixture
    * dirs in tests, `transport=fda-http` / `ctgov-http` + baseurl in a
    * deployment. */
  def runFromApis(spark: SparkSession, lakeRoot: String, date: String,
      fdaOptions: Map[String, String], ctOptions: Map[String, String],
      cfg: PipelineConfig = PipelineConfig.default): (RunResult, Notification) = {
    val t0 = System.nanoTime()

    // extract + land raw (the DAG's two extraction tasks, :60-96).
    // Adapter: the reference's FDA extractor emits application records
    // keyed by brand_name while its transformer probes for drug_name —
    // the extractor output would never reach the enrichment join. Expose
    // brand_name as drug_name at the landing boundary (the intended
    // semantics; SURVEY §3.1).
    // yaml extraction: drives the transport envelope (explicit reader
    // options win over the config defaults) and the per-day record caps.
    val ex = cfg.extraction
    def withEnvelope(options: Map[String, String]): Map[String, String] =
      Map("retries" -> ex.retryAttempts.toString,
        "backoffms" -> (ex.retryDelaySeconds * 1000L).toString,
        "timeoutms" -> (ex.timeoutSeconds * 1000).toString) ++ options
    val rawPrefix = cfg.storage.rawPrefix
    val meta = new RunMetadata.Collector(date)

    // Landing writes carry an Observation each: the landed row count
    // rides the write job itself instead of a count that re-reads the
    // zone just written (the write is unconditional, so the metric
    // always fires — unlike the transform frames, whose isEmpty probe
    // would truncate an attached observation).
    import org.apache.spark.sql.functions.{count, lit}
    val fdaLanded = meta.time("extract_fda") {
      val fdaExtract = {
        val df = graft.sources.v2.ApiSources.loadFda(spark, withEnvelope(fdaOptions))
        val adapted =
          if (!df.columns.contains("drug_name") && df.columns.contains("brand_name"))
            df.withColumn("drug_name", org.apache.spark.sql.functions.col("brand_name"))
          else df
        adapted.limit(ex.fdaLimit)
      }
      val obs = new org.apache.spark.sql.Observation()
      Lake.writeJson(fdaExtract.observe(obs, count(lit(1)).as("n")),
        Lake.rawPath(lakeRoot, "fda", date, rawPrefix))
      val n = obs.get("n").asInstanceOf[Long]
      (n, n)
    }
    val ctLanded = meta.time("extract_ct") {
      val obs = new org.apache.spark.sql.Observation()
      Lake.writeJson(
        graft.sources.v2.ApiSources.loadCt(spark, withEnvelope(ctOptions))
          .limit(ex.clinicalTrialsLimit)
          .observe(obs, count(lit(1)).as("n")),
        Lake.rawPath(lakeRoot, "clinical_trials", date, rawPrefix))
      val n = obs.get("n").asInstanceOf[Long]
      (n, n)
    }

    // validate_extraction (:104-116): zero records from either source
    // fails the run before any transform work starts.
    if (fdaLanded == 0) throw new IllegalStateException("No FDA records extracted!")
    if (ctLanded == 0) throw new IllegalStateException("No Clinical Trials records extracted!")

    val result = meta.time("transform_enrich_gate") {
      val r = run(spark, lakeRoot, date, cfg, inferRawSchema = true,
        landedCounts = Some((fdaLanded, ctLanded)))
      (r, r.enrichedCount)
    }

    // error rate: fraction of transformed records flagged incomplete —
    // numerator AND denominator measured at the transform stage
    // (incompleteness is a post-transform property; dividing by the raw
    // landed count would understate the rate whenever a transform
    // filters rows).
    val errorRate =
      if (result.transformedCount > 0)
        result.incompleteCount.toDouble / result.transformedCount
      else 0.0

    val minutes = (System.nanoTime() - t0) / 6e10
    val sla = Notify.evaluateSla(result, minutes, errorRate, cfg)

    // Persist the stage log (the reference logger's context-manager rows
    // + XCom counts) to the metadata zone — queryable run history.
    RunMetadata.write(spark, lakeRoot, date, meta.snapshot)
    (result, Notify.completion(result, sla))
  }
}

/** CLI parity with `python -m src.transformers.drug_transformer --date D
  * --bucket B` (drug_transformer.py:355-366). */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val date = opts.getOrElse("--date", sys.error("--date required"))
    val root = opts.getOrElse("--bucket", sys.error("--bucket required"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-medical-etl")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val res = Pipeline.run(spark, root, date)
      println(s"[pipeline] date=${res.date} fda=${res.fdaCount} ct=${res.ctCount} " +
        s"enriched=${res.enrichedCount} qualityPassed=${res.quality.passed}")
      res.quality.failures.foreach(f => println(s"[quality] $f"))
      if (!res.quality.passed) sys.exit(1)
    } finally spark.stop()
  }
}
