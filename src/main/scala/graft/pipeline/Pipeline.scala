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
    processedPath: String)

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

  def run(spark: SparkSession, lakeRoot: String, date: String): RunResult = {
    // Extraction stage equivalent: raw JSON already landed by connectors.
    val fdaRaw = Lake.readJson(spark, Lake.rawPath(lakeRoot, "fda", date),
      Some(graft.model.Schemas.fdaEvent))
    val ctRaw = Lake.readJson(spark, Lake.rawPath(lakeRoot, "clinical_trials", date),
      Some(graft.model.Schemas.ctFlat))

    val fdaT = FdaTransform(fdaRaw)
    val ctT = CtTransform(ctRaw)
    val enriched = Enrichment.enrich(fdaT, ctT)

    val outPath = Lake.processedPath(lakeRoot, date, "enriched_data.parquet")
    if (!enriched.isEmpty) {
      Lake.writeParquet(enriched, outPath)
      // Summary CSV of the first 1000 rows (drug_transformer.py:306).
      Lake.writeCsv(enriched.limit(1000),
        Lake.processedPath(lakeRoot, date, "summary.csv"))
    }

    // Quality gate re-reads the processed zone, like the reference's
    // separate quality_checks task (medical_etl_dag.py:216-219).
    val reloaded: DataFrame = Lake.readParquet(spark, outPath)
    val report = QualityChecks.validate(reloaded, date)

    RunResult(date, fdaRaw.count(), ctRaw.count(), reloaded.count(), report, outPath)
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
