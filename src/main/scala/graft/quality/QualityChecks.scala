package graft.quality

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed result mirroring the reference's dict
  * (`/root/reference/src/transformers/data_quality.py:68-75`). */
case class QualityReport(
    date: String,
    passed: Boolean,
    totalChecks: Int,
    failedChecks: Int,
    failures: Seq[String],
    recordCount: Long)

/** The 6-check quality gate — parity with
  * `/root/reference/src/transformers/data_quality.py:27-296`, re-expressed
  * as ONE fused aggregation pass over the frame (every scalar check is a
  * conditional-sum expression evaluated together) plus one tiny groupBy per
  * duplicate key. The reference runs 6 sequential full-frame passes; at
  * 100 TB a single scan with partial aggregation is the difference between
  * one shuffle-free job and six.
  */
object QualityChecks {

  def validate(df: DataFrame, date: String): QualityReport =
    validate(df, date, graft.pipeline.PipelineConfig.default)

  def validate(df: DataFrame, date: String,
      cfg: graft.pipeline.PipelineConfig): QualityReport = {
    val RequiredFda = cfg.requiredFdaColumns
    val RequiredCt = cfg.requiredCtColumns
    val NullPctThreshold = cfg.quality.maxNullPct
    val MinRecords = cfg.quality.minRecords
    val MinPerSource = cfg.quality.minPerSource
    if (df.isEmpty)
      return QualityReport(date, passed = false, 6, 1, Seq("No data to validate"), 0L)

    val cols = df.columns.toSet
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    // failedChecks counts failed check CATEGORIES (of the 6), not
    // failure messages — a frame failing many messages in one category
    // must not push failedChecks past totalChecks (Notify.qualityScore
    // is (total-failed)/total and must stay in [0,1]).
    val failedCats = scala.collection.mutable.Set[Int]()
    def fail(cat: Int, msg: String): Unit = { failures += msg; failedCats += cat }

    // ---- fused scalar pass -------------------------------------------
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    var aggs = Vector[Column](count(lit(1)).as("__n"))
    def add(name: String, c: Column): Unit = { aggs :+= c.as(name) }

    val hasSource = cols("data_source")
    val isFda = if (hasSource) col("data_source") === "FDA_OpenFDA" else lit(false)
    val isCt = if (hasSource) col("data_source") === "ClinicalTrials_gov" else lit(false)

    if (hasSource) {
      add("n_fda", cnt(isFda))
      add("n_ct", cnt(isCt))
      for (c <- RequiredFda if cols(c)) add(s"fda_null_$c", cnt(isFda && col(c).isNull))
      for (c <- RequiredCt if cols(c)) add(s"ct_null_$c", cnt(isCt && col(c).isNull))
    }
    if (cols("severity_score"))
      add("bad_severity", cnt(col("severity_score") < 0 || col("severity_score") > 100))
    if (cols("patient_age"))
      add("bad_age", cnt(col("patient_age") < 0 || col("patient_age") > 120))
    if (cols("enrollment_count"))
      add("bad_enroll", cnt(col("enrollment_count") < 0))
    if (cols("start_date") && cols("completion_date"))
      add("bad_date_order", cnt(col("start_date").isNotNull &&
        col("completion_date").isNotNull && col("start_date") > col("completion_date")))
    for (c <- Seq("receivedate", "start_date", "completion_date") if cols(c))
      add(s"future_$c", cnt(col(c) > current_timestamp()))

    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def n(name: String): Long =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        row.getLong(row.fieldIndex(name))
      else 0L
    val total = n("__n")

    // 1. completeness (data_quality.py:100-140)
    if (hasSource) {
      if (n("n_fda") > 0) for (c <- RequiredFda) {
        if (!cols(c)) fail(1, s"Missing required FDA column: $c")
        else {
          val pct = n(s"fda_null_$c").toDouble / n("n_fda") * 100
          if (n(s"fda_null_$c") > 0 && pct > NullPctThreshold)
            fail(1, f"FDA column $c has $pct%.1f%% missing values")
        }
      }
      if (n("n_ct") > 0) for (c <- RequiredCt) {
        if (!cols(c)) fail(1, s"Missing required CT column: $c")
        else {
          val pct = n(s"ct_null_$c").toDouble / n("n_ct") * 100
          if (n(s"ct_null_$c") > 0 && pct > NullPctThreshold)
            fail(1, f"CT column $c has $pct%.1f%% missing values")
        }
      }
    }

    // 2. data types (schema-level, no scan; data_quality.py:142-166)
    val schema = df.schema
    for (c <- Seq("severity_score", "adverse_event_count", "enrollment_count") if cols(c))
      if (!schema(c).dataType.isInstanceOf[NumericType])
        fail(2, s"Column $c should be numeric")
    for (c <- Seq("receivedate", "processed_date", "start_date", "completion_date") if cols(c))
      schema(c).dataType match {
        case _: TimestampType | _: DateType | _: TimestampNTZType => ()
        case _ => fail(2, s"Column $c should be datetime")
      }

    // 3. value ranges (data_quality.py:168-202)
    if (cols("severity_score") && n("bad_severity") > 0)
      fail(3, s"Found ${n("bad_severity")} records with invalid severity_score")
    if (cols("patient_age") && n("bad_age") > 0)
      fail(3, s"Found ${n("bad_age")} records with invalid patient_age")
    if (cols("enrollment_count") && n("bad_enroll") > 0)
      fail(3, s"Found ${n("bad_enroll")} records with negative enrollment_count")

    // 4. duplicates, keep=False semantics: count EVERY member of a
    //    duplicated group (data_quality.py:204-231)
    def dupCount(filter: Column, key: String): Long =
      df.where(filter && col(key).isNotNull)
        .groupBy(col(key)).count().where(col("count") > 1)
        .agg(coalesce(sum(col("count")), lit(0L))).collect()(0).getLong(0)
    if (cols("safetyreportid")) {
      val d = dupCount(if (hasSource) isFda else lit(true), "safetyreportid")
      if (d > 0) fail(4, s"Found $d duplicate FDA safety reports")
    }
    if (cols("nct_id")) {
      val d = dupCount(if (hasSource) isCt else lit(true), "nct_id")
      if (d > 0) fail(4, s"Found $d duplicate clinical trial records")
    }

    // 5. record count (data_quality.py:233-260)
    if (total < MinRecords)
      fail(5, s"Record count ($total) is below minimum threshold ($MinRecords)")
    if (hasSource) {
      if (n("n_fda") > 0 && n("n_fda") < MinPerSource)
        fail(5, s"Data source FDA_OpenFDA has only ${n("n_fda")} records")
      if (n("n_ct") > 0 && n("n_ct") < MinPerSource)
        fail(5, s"Data source ClinicalTrials_gov has only ${n("n_ct")} records")
    }

    // 6. date consistency (data_quality.py:262-296)
    if (cols("start_date") && cols("completion_date") && n("bad_date_order") > 0)
      fail(6, s"Found ${n("bad_date_order")} records where start_date > completion_date")
    for (c <- Seq("receivedate", "start_date", "completion_date") if cols(c))
      if (n(s"future_$c") > 0)
        fail(6, s"Found ${n(s"future_$c")} records with future $c")

    QualityReport(date, failures.isEmpty, 6, failedCats.size, failures.toSeq, total)
  }
}
