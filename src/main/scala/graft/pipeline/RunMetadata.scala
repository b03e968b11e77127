package graft.pipeline

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-stage run metadata persisted to the lake — the queryable analog of
  * the reference's pipeline-logger context manager
  * (`/root/reference/src/utils/logger.py`: stamps stage start/end/duration
  * around every task) plus its XCom record counts. One row per stage per
  * run, written as JSON under `<root>/metadata/run_date=<date>/`, so a
  * user can ask "which stage slowed down this week" with a plain query
  * over the metadata zone. */
object RunMetadata {

  /** One pipeline stage's outcome. `records` is -1 when the stage has no
    * natural row count (e.g. SLA evaluation). */
  final case class StageMetric(
      date: String, stage: String, startMs: Long, durationMs: Long, records: Long)

  /** Mutable collector threaded through a run; `time` wraps a stage and
    * records wall-clock + the stage's record count. */
  final class Collector(date: String) {
    private val metrics = scala.collection.mutable.ArrayBuffer.empty[StageMetric]
    def time[A](stage: String)(body: => (A, Long)): A = {
      val t0 = System.currentTimeMillis()
      val (a, records) = body
      metrics += StageMetric(date, stage, t0, System.currentTimeMillis() - t0, records)
      a
    }
    def snapshot: Seq[StageMetric] = metrics.toSeq
  }

  def path(lakeRoot: String, date: String): String =
    s"$lakeRoot/metadata/run_date=$date/run_metadata.json"

  /** Write the collected stage rows for one run (overwrites reruns of the
    * same date — the metadata mirrors the latest attempt, like the
    * reference's log overwrite). */
  def write(spark: SparkSession, lakeRoot: String, date: String,
      stages: Seq[StageMetric]): String = {
    import spark.implicits._
    val out = path(lakeRoot, date)
    Lake.writeJson(stages.toDF(), out)
    out
  }

  def read(spark: SparkSession, lakeRoot: String, date: String): DataFrame =
    Lake.readJson(spark, path(lakeRoot, date), None)
}
