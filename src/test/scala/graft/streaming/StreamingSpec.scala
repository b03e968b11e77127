package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import Streaming._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("windowed aggregation with watermark over a memory stream") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF(), "5 minutes", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "click", 2.0),
        Event(3, ts(6), 1, "view", 3.0),
        Event(4, ts(40), 1, "click", 4.0)) // advances watermark, closes earlier windows
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(5), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming sessionization equals batch sessionization on real testdata") {
    // the streaming==batch parity proof: every session the streaming
    // sessionizer emits over the real events table must match the batch
    // window formulation (q29's lag→flag→cumsum shape) exactly.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gapSec = 1800L
    // ms granularity on both sides (the streaming state keys on
    // Timestamp.getTime); one event per (user, ms) keeps ordering total
    val raw = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", expr("ts div 1000000").as("tms"), $"value")
      .groupBy($"user_id", $"tms").agg(sum($"value").as("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // batch sessions
    val w = Window.partitionBy($"user_id").orderBy($"tms")
    val batch = raw.toSeq.toDF("user_id", "tms", "value")
      .withColumn("new_sess", when(lag($"tms", 1).over(w).isNull ||
        $"tms" - lag($"tms", 1).over(w) > gapSec * 1000, 1L).otherwise(0L))
      .withColumn("sess", sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess")
      .agg(min($"tms").as("start"), max($"tms").as("end"),
        count(lit(1)).as("n"), round(sum($"value"), 6).as("v"))
      .select($"user_id", $"start", $"end", $"n", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

    // streaming sessions: feed everything, then a far-future sentinel to
    // push the watermark past every real session's timeout
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = gapSec)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      input.addData(raw.zipWithIndex.map { case ((u, tms, v), i) =>
        Event(i.toLong, new Timestamp(tms), u, "e", v)
      }.toSeq)
      q.processAllAvailable()
      val maxT = raw.map(_._2).max
      input.addData(Event(-1L, new Timestamp(maxT + gapSec * 1000 * 10), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      // one more empty-ish nudge so the timed-out state flushes
      input.addData(Event(-2L, new Timestamp(maxT + gapSec * 1000 * 20), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .where($"user_id" >= 0)
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          round($"total_value", 6).as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batch,
        s"streaming ${streamed.size} sessions vs batch ${batch.size}; " +
          s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("streaming sketch maintenance: HLL and CMS registers equal batch (bounded state)") {
    // the sketches are plain relational aggregations (groupBy max / count),
    // so Structured Streaming maintains them incrementally with state
    // bounded by construction (≤1024 register rows each) — no watermark
    // needed. The streaming result after feeding the corpus in two
    // batches must equal the batch registers exactly.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val docsDf = docs.toDF("doc_id", "text")
    def hllSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"bucket".cast("long"), $"m_rho".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cmsSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"depth_row".cast("long"), $"bucket".cast("long"), $"cnt".cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchHll = hllSet(graft.functions.Hll.registers(docsDf, "text"))
    val batchCms = cmsSet(graft.functions.Cms.tokenRegisters(docsDf, "text"))

    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val qh = graft.functions.Hll.registers(sdf, "text")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    val qc = graft.functions.Cms.tokenRegisters(sdf, "text")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      input.addData(docs.take(250))
      qh.processAllAvailable(); qc.processAllAvailable()
      input.addData(docs.drop(250))
      qh.processAllAvailable(); qc.processAllAvailable()
      assert(hllSet(spark.table("hll_stream")) == batchHll)
      assert(cmsSet(spark.table("cms_stream")) == batchCms)
    } finally { qh.stop(); qc.stop() }
  }

  test("streaming span contamination equals batch (static eval fp set, bounded state)") {
    // the n-gram decontamination check runs unchanged over a document
    // stream: the eval window-fp set is a static broadcast build side
    // and the per-doc leak count is a stateful agg whose state is
    // bounded by the number of CONTAMINATED documents, not the corpus.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val docsDf = docs.toDF("doc_id", "source", "text")
    val eval = docsDf.where($"source" === "src0").select($"text")
    def leakSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = leakSet(graft.dedup.Dedup.spanContamination(
      docsDf, "doc_id", "text", eval, "text", spanTokens = 8))
    assert(batch.nonEmpty)

    val input = MemoryStream[(Long, String, String)]
    val sdf = input.toDF().toDF("doc_id", "source", "text")
    val q = graft.dedup.Dedup.spanContamination(sdf, "doc_id", "text", eval, "text", 8)
      .writeStream.format("memory").queryName("leak_stream")
      .outputMode("complete").start()
    try {
      input.addData(docs.take(200))
      q.processAllAvailable()
      input.addData(docs.drop(200))
      q.processAllAvailable()
      assert(leakSet(spark.table("leak_stream")) == batch)
    } finally q.stop()
  }

  test("streaming NB scoring against a frozen model equals batch scoring") {
    // the classifier deployment path: the trained model frame is a
    // static broadcast build side; each micro-batch scores only ITS
    // documents (naiveBayesScore is batch-local — no standing state),
    // so a daily delta or a foreachBatch stream scores without
    // retraining. Parity: streamed-in-two-batches == batch scoring of
    // the same corpus with the same frozen model.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val base = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", when($"source".isin("src0", "src1", "src2", "src3"), 1L)
        .otherwise(0L))
    val model = graft.text.CorpusStats
      .naiveBayesTrain(base, "doc_id", "text", "y").localCheckpoint(true)
    val docs = base.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def scoreSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"n_tokens", $"nb_milli", $"keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = scoreSet(graft.text.CorpusStats.naiveBayesScore(
      docs.toDF("doc_id", "text"), "doc_id", "text", model))
    assert(batch.nonEmpty)

    // foreachBatch is the documented deployment shape (the score plan
    // ends in a per-doc join back to the input — fine batch-locally,
    // not as a continuous stream-stream join): each micro-batch scores
    // in isolation against the frozen broadcast model
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    val q = sdf.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.text.CorpusStats.naiveBayesScore(b.toDF(), "doc_id", "text", model)
          .select($"id", $"n_tokens", $"nb_milli", $"keep")
          .collect().foreach(r =>
            acc.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      }
      .start()
    try {
      input.addData(docs.take(200))
      q.processAllAvailable()
      input.addData(docs.drop(200))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(acc.asScala.toSet == batch)
    } finally q.stop()
  }

  test("streamed BM25 index maintenance equals the one-shot batch index") {
    // the additive-index property as a stream: each micro-batch indexes
    // only ITS documents (zero standing state — bm25Index is batch-local)
    // and appends postings/stats deltas to the lake; the serving path
    // reads the concatenation. Parity: streamed-in-two-batches ==
    // one-shot batch index, same top-k.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val docsDf = docs.toDF("doc_id", "text")
    val probeText = docs.map(_._2).find(t => t != null && t.split(" ").length >= 6)
      .map(_.split(" ").take(6).mkString(" ")).get
    val probes = Seq((1L, probeText)).toDF("query_id", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batch = rows(graft.text.Retrieval.bm25TopK(
      docsDf, "doc_id", "text", probes, "query_id", "qtext", k = 10))
    assert(batch.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (p, s) = graft.text.Retrieval.bm25Index(b.toDF(), "doc_id", "text")
        p.write.mode("append").parquet(s"$dir/postings")
        s.write.mode("append").parquet(s"$dir/stats")
        ()
      }
      .start()
    try {
      input.addData(docs.take(200)); q.processAllAvailable()
      input.addData(docs.drop(200)); q.processAllAvailable()
    } finally q.stop()
    val postings = spark.read.parquet(s"$dir/postings")
    val stats = spark.read.parquet(s"$dir/stats").agg(
      coalesce(sum($"d_docs"), lit(0L)).as("d_docs"),
      coalesce(sum($"t_toks"), lit(0L)).as("t_toks"))
    val streamed = rows(graft.text.Retrieval.bm25TopKFromIndex(
      postings, stats, probes, "query_id", "qtext", k = 10))
    assert(streamed == batch,
      "delta-appended postings/stats must serve the same top-k as the batch index")
  }

  test("sessionization: gap closes a session, emits aggregate") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 30s apart (one session), then a 10-min gap event
      input.addData(
        Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 30), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(10), 1, "click", 5.0))
      q.processAllAvailable()
      // push watermark far ahead so the open session times out too
      input.addData(Event(4, ts(50), 2, "click", 0.5))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[UserSession].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(sessions.length >= 1)
      val first = sessions.head
      assert(first.session_start == ts(0, 0))
      assert(first.session_end == ts(0, 30))
      assert(first.n_events == 2)
      assert(first.total_value == 3.0)
    } finally q.stop()
  }

  test("dedup stream: first event per key wins even at different timestamps") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDF(), "10 minutes", "user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0), // same (user, type), later ts -> dropped
        Event(3, ts(2), 1, "view", 3.0),
        Event(4, ts(3), 2, "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[Event].collect()
      assert(out.length == 3)
      assert(out.map(_.event_id).toSet == Set(1L, 3L, 4L))
    } finally q.stop()
  }

  test("AvailableNow daily batch: drains once, checkpoint makes re-runs incremental") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val raw = s"$dir/raw"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(raw))
    def land(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(raw, name),
        rows.mkString("\n").getBytes)
    land("day1.json", (1 to 5).map(i =>
      s"""{"event_id": $i, "ts": "2024-01-01T00:0$i:00Z", "user_id": $i, "event_type": "click", "value": 1.5}"""))

    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    def run(): Unit = Streaming.runDailyAvailableNow(spark, raw, schema,
      df => df.withColumn("doubled", org.apache.spark.sql.functions.col("value") * 2),
      s"$dir/out", s"$dir/ckpt")

    run()
    assert(spark.read.parquet(s"$dir/out").count() == 5)
    // second run with one new file: only the new rows are appended
    land("day2.json", Seq(
      """{"event_id": 6, "ts": "2024-01-02T00:00:00Z", "user_id": 6, "event_type": "view", "value": 2.0}"""))
    run()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 6)
    assert(out.where(org.apache.spark.sql.functions.col("doubled") === 4.0).count() == 1)
  }
}
