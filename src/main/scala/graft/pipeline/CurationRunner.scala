package graft.pipeline

import graft.io.Lake
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The daily production loop, composed end-to-end: the AvailableNow
  * streaming drain (which files are new is the CHECKPOINT's knowledge,
  * not a convention), snapshot maintenance, incremental recuration
  * (only added/changed documents pay curation cost), and run metadata —
  * one `runDaily(lake, date)` call per day (reference analog: the
  * @daily Airflow DAG, medical_etl_dag.py:162-231, re-expressed over
  * the engine's curation operators).
  *
  * Lake layout:
  *   raw/documents/<file>.json       — landed files (append-only zone)
  *   staged/documents/               — drained rows + ingest_date
  *   _checkpoints/documents/         — the stream's file ledger
  *   snapshot/date=D/                — full raw snapshot as of run D
  *   curated/date=D/                 — curated corpus as of run D
  *   metadata/run_date=D/            — per-stage RunMetadata rows
  *
  * Snapshot semantics: latest landed row per doc_id wins (ingest_date
  * desc; a doc_id re-landing with new text is a "changed" document in
  * the diff). Ties within one day break on text ascending —
  * deterministic, but land one row per doc_id per day.
  *
  * Scale shape: the drain appends only new files (no re-read of the raw
  * zone); the snapshot window is one shuffle on doc_id (exchange-free
  * when staged is bucketed by doc_id); curation cost is |delta| via
  * Curation.curateIncrement; snapshots/curated corpora are
  * date-versioned so a run never overwrites an input it is lazily
  * reading (the self-overwrite hazard), and history stays queryable for
  * Snapshot.diff audits. */
object CurationRunner {

  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** Optional last-mile export: pack the day's curated corpus and land
    * loader-ready shards + manifest under shards/date=D. */
  final case class ShardConfig(binTokens: Long = 2048L, numBuckets: Int = 64)

  final case class DailyResult(
      date: String, snapshotDocs: Long, curatedDocs: Long, incremental: Boolean,
      shardCount: Long = -1L)

  private def snapshotPath(root: String, date: String) = s"$root/snapshot/date=$date"
  private def curatedPath(root: String, date: String) = s"$root/curated/date=$date"

  /** All run dates present in the date-versioned snapshot zone, sorted
    * ascending (ISO dates sort lexically). */
  private[pipeline] def runDates(spark: SparkSession, root: String): Seq[String] =
    Lake.list(spark, s"$root/snapshot")
      .flatMap(_.split('/').lastOption)
      .collect { case d if d.startsWith("date=") => d.stripPrefix("date=") }
      .sorted

  /** Latest run date strictly before `date`. */
  private[pipeline] def prevRunDate(spark: SparkSession, root: String,
      date: String): Option[String] =
    runDates(spark, root).filter(_ < date).lastOption

  def runDaily(spark: SparkSession, lakeRoot: String, date: String,
      evalDocs: Option[DataFrame] = None,
      cfg: Curation.CurationConfig = Curation.CurationConfig(),
      shards: Option[ShardConfig] = None): DailyResult = {
    require(date.matches("""\d{4}-\d{2}-\d{2}"""),
      s"runDaily: date must be ISO yyyy-MM-dd (lexical ordering drives " +
        s"snapshot versioning), got '$date'")
    // runs must move forward: a run dated before an existing snapshot
    // would fold later-dated staged rows into its "snapshot of $date"
    // and diff against the wrong previous state
    runDates(spark, lakeRoot).lastOption.foreach(n => require(date >= n,
      s"runDaily: date '$date' precedes the newest snapshot '$n' — daily runs are forward-only"))
    val meta = new RunMetadata.Collector(date)
    val staged = s"$lakeRoot/staged/documents"

    // 1. drain: every raw file the checkpoint hasn't seen, stamped with
    // this run's date — the Airflow daily batch as an AvailableNow stream
    meta.time("drain") {
      Streaming.runDailyAvailableNow(spark, s"$lakeRoot/raw/documents",
        rawSchema, _.withColumn("ingest_date", lit(date)),
        staged, s"$lakeRoot/_checkpoints/documents")
      ((), -1L)
    }

    // 2. snapshot: latest landed row per doc_id
    val stagedDf = Lake.readParquet(spark, staged,
      Some(rawSchema.add("ingest_date", StringType)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("ingest_date").desc, col("text").asc)
    val newRaw = stagedDf
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    val nSnapshot = meta.time("snapshot") {
      Lake.writeParquet(newRaw, snapshotPath(lakeRoot, date))
      val n = Lake.readParquet(spark, snapshotPath(lakeRoot, date)).count()
      (n, n)
    }

    // Read the version just written (not the lazy pre-write plan) so
    // curation never recomputes the drain+window chain per stage.
    val snapshot = Lake.readParquet(spark, snapshotPath(lakeRoot, date))

    // 3. curate: incremental against the previous run when one exists
    val prev = prevRunDate(spark, lakeRoot, date)
    val curated = meta.time("curate") {
      val out = prev match {
        case Some(p) =>
          Curation.curateIncrement(
            Lake.readParquet(spark, snapshotPath(lakeRoot, p)),
            Lake.readParquet(spark, curatedPath(lakeRoot, p)),
            snapshot, evalDocs, cfg)
        case None =>
          Curation.curate(snapshot, evalDocs, cfg, countStages = false)._1
      }
      // force the curation compute HERE (persist + count): without an
      // action this stage would time only lazy plan construction and
      // misattribute the diff/LSH/decontamination cost to "publish".
      // The persist is released by releaseAll at the end of the run.
      val persisted = graft.ops.CacheScope.persist(out)
      val n = persisted.count()
      (persisted, n)
    }

    // 4. publish + metadata
    val nCurated = meta.time("publish") {
      Lake.writeParquet(curated, curatedPath(lakeRoot, date))
      val n = Lake.readParquet(spark, curatedPath(lakeRoot, date)).count()
      (n, n)
    }
    // 5. optional training-shard export of the day's corpus: the full
    // curate -> pack -> shard+manifest path in one daily entry point
    val nShards = shards.fold(-1L) { sc =>
      meta.time("shards") {
        val withTokens = Lake.readParquet(spark, curatedPath(lakeRoot, date))
          .select(col("doc_id"), col("text"),
            graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        val m = graft.ops.ShardExport.writeShards(withTokens, "doc_id", "n_tokens",
          sc.binTokens, sc.numBuckets, s"$lakeRoot/shards/date=$date")
        val n = m.count()
        (n, n)
      }
    }
    graft.ops.CacheScope.releaseAll(spark) // curation persists its core frames
    RunMetadata.write(spark, lakeRoot, date, meta.snapshot)
    DailyResult(date, nSnapshot, nCurated, incremental = prev.isDefined,
      shardCount = nShards)
  }
}
