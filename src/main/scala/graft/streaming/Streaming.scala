package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface.
  *
  * The reference has no streaming engine — its "streaming-ness" is daily
  * incremental batch (Airflow `@daily` + date-partitioned storage,
  * SURVEY §2.10). `runDailyAvailableNow` subsumes that exactly:
  * `Trigger.AvailableNow` drains whatever landed since the last
  * checkpoint and stops — the daily batch as a special case of a stream.
  * The windowed/sessionized operators are the engine-side extensions a
  * training-data pipeline needs for event feeds.
  *
  * Scale notes: watermarks bound state (late events beyond the watermark
  * are dropped, state for closed windows is evicted); sessionization
  * state is per-user and times out via the same watermark, so state-store
  * size tracks active users, not history. Shuffle partitioning of the
  * stateful operators follows `spark.sql.shuffle.partitions` — size it to
  * the cluster, and the state store (RocksDB in production) spills per
  * partition.
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Internal session accumulator (public: the state-store encoder's
    * generated code must access its fields from another package). */
  final case class SessionState(start: Long, last: Long, n: Long, acc: Double)

  /** Tumbling/sliding windowed aggregation with late-data handling. */
  def windowedCounts(events: DataFrame, windowDur: String, slideDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"),
        col("total_value"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapSeconds` of inactivity (event-time, enforced by the
    * watermark timeout). Emits closed sessions (Append mode). */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.acc))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                // Late-but-within-watermark events can precede the stored
                // session: a gap-separated EARLIER event forms its own
                // already-closed session (the batch formulation would have
                // sessionized it before the current one); an in-gap earlier
                // event merges and LOWERS session_start (keeping s.start
                // would emit an interval later than its earliest member).
                case Some(s) if t < s.start - gapSeconds * 1000 =>
                  closed ::= UserSession(userId, new java.sql.Timestamp(t),
                    new java.sql.Timestamp(t), 1, e.value)
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.acc + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.acc)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming dedup: first event per key wins — the streaming analog of
    * the batch keep-first window (SURVEY D1). Uses
    * dropDuplicatesWithinWatermark so dedup is on the KEYS alone (a later
    * event for the same key is dropped even when its timestamp differs)
    * while state for a key is still evicted once the watermark passes it:
    * "first wins" is guaranteed among events that arrive within the
    * watermark delay of each other, which is exactly the horizon the
    * stream can promise without unbounded state. */
  def dedupStream(events: DataFrame, watermarkDelay: String, keys: String*): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** The reference's daily incremental batch as a stream:
    * `Trigger.AvailableNow` over the raw zone — drains all unprocessed
    * files (tracked by the checkpoint), applies `transform`, appends
    * parquet, stops. Re-running tomorrow picks up only new files: exactly
    * the Airflow daily semantics, minus the scheduler. */
  def runDailyAvailableNow(spark: SparkSession, rawGlob: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame,
      outPath: String, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).json(rawGlob)
    val q = transform(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runDailyAvailableNow]] over BINARY landed files (crawl-archive
    * segments — .warc / .tar — rather than NDJSON rows): the
    * `binaryFile` streaming source feeds (path, content) batches to
    * `transform`, and the checkpoint is still the only ledger of which
    * segments were ingested. One file = one row = one container walk
    * executor-side; the bounded-segment layout keeps rows row-size
    * safe (the Containers contract). */
  def runDailyAvailableNowBinary(spark: SparkSession, rawGlob: String,
      transform: DataFrame => DataFrame,
      outPath: String, checkpoint: String): Unit = {
    // the binaryFile source's schema is FIXED by the format, but the
    // streaming reader requires it stated (no inference on streams)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val stream = spark.readStream.format("binaryFile")
      .schema(binarySchema).load(rawGlob)
    val q = transform(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runDailyAvailableNowBinary]] with a SECOND derived output per
    * micro-batch — the one-pass audit hook: `decode` maps the raw
    * binary batch to an intermediate record frame (persisted here for
    * the batch's duration), `docs` and `audit` both derive from it,
    * and both land under the SAME checkpoint via foreachBatch — each
    * raw file is decoded once and counted once, exactly-once across
    * runs. */
  def runDailyAvailableNowBinaryAudited(spark: SparkSession, rawGlob: String,
      decode: DataFrame => DataFrame,
      docs: DataFrame => DataFrame, audit: DataFrame => DataFrame,
      outPath: String, auditPath: String, checkpoint: String): Unit = {
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val stream = spark.readStream.format("binaryFile")
      .schema(binarySchema).load(rawGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val records = decode(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          docs(records).write.mode("append").parquet(outPath)
          audit(records).write.mode("append").parquet(auditPath)
        } finally records.unpersist()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
