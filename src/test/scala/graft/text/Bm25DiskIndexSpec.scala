package graft.text

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class Bm25DiskIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  private def probes = {
    val ts = TextFunctions.tokens(col("text"))
    docs.where(pmod($"doc_id", lit(25)) === 0)
      .select($"doc_id".as("query_id"), ts.as("ts"))
      .where(size($"ts") >= 9)
      .select($"query_id", array_join(slice($"ts", 2, 8), " ").as("qtext"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("persisted probe == fresh bm25TopK, and only probe buckets are read") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val fresh = asSet(Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qtext", k = 10))
      assert(fresh.nonEmpty)

      Bm25DiskIndex.write(docs, "doc_id", "text", dir, numBuckets = 64)
      val persisted = asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10))
      assert(persisted == fresh, "persisted-index probe must equal fresh scoring")

      // partition pruning is real: count files ACTUALLY opened via the
      // executed scan's numFiles metric (the IvfIndexSpec discipline)
      def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
        df.queryExecution.toRdd.count()
        import org.apache.spark.sql.execution._
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
        scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
      }
      // one narrow probe (few distinct terms -> few buckets) so the
      // pruned listing is a strict subset of the 64 bucket dirs
      val narrow = probes.limit(1)
      val nBuckets = Bm25DiskIndex.numBuckets(spark, dir)
      val bucketSet = narrow
        .select(explode(array_distinct(TextFunctions.tokens($"qtext"))).as("tok"))
        .select(TextFunctions.polyHash($"tok", nBuckets.toLong).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(bucketSet.nonEmpty && bucketSet.length < nBuckets)
      val allFiles = filesScanned(Bm25DiskIndex.postings(spark, dir))
      val prunedFiles = filesScanned(
        Bm25DiskIndex.prunedPostings(spark, dir, bucketSet))
      assert(prunedFiles < allFiles,
        s"pruned read ($prunedFiles files) must open fewer than the full index ($allFiles)")
      assert(prunedFiles > 0)
    } finally { Lake.delete(spark, dir) }
  }

  test("append-only delta: write(half1) + append(half2) == one-shot index") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val half1 = docs.where(pmod($"doc_id", lit(2)) === 0)
      val half2 = docs.where(pmod($"doc_id", lit(2)) === 1)
      Bm25DiskIndex.write(half1, "doc_id", "text", dir, numBuckets = 32)
      Bm25DiskIndex.append(half2, "doc_id", "text", dir)
      // stats increments aggregate to the one-shot totals
      val st = Bm25DiskIndex.stats(spark, dir).collect()(0)
      val (pFresh, sFresh) = Retrieval.bm25Index(docs, "doc_id", "text")
      val sf = sFresh.collect()(0)
      assert(st.getLong(0) == sf.getLong(0) && st.getLong(1) == sf.getLong(1))
      // and the probe over the merged on-disk index == fresh scoring of
      // the full corpus (df/idf see both halves)
      val got = asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10))
      val fresh = asSet(Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qtext", k = 10))
      assert(got == fresh, "appended index must score identically to one-shot")
      assert(pFresh.count() == Bm25DiskIndex.postings(spark, dir).count())
    } finally { Lake.delete(spark, dir) }
  }

  test("retire: tombstoned docs drop out of scoring; stats stay exact; re-append revives an id") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val retired = docs.where(pmod($"doc_id", lit(7)) === 3)
      val live = docs.where(pmod($"doc_id", lit(7)) =!= 3)
      assert(retired.count() > 0)
      Bm25DiskIndex.write(docs, "doc_id", "text", dir, numBuckets = 32, seq = 1L)
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      // aggregated stats == a fresh index over the live set (the
      // negative increment corrected d_docs/t_toks, so idf/avgdl agree)
      val st = Bm25DiskIndex.stats(spark, dir).collect()(0)
      val sLive = Retrieval.bm25Index(live, "doc_id", "text")._2.collect()(0)
      assert(st.getLong(0) == sLive.getLong(0) && st.getLong(1) == sLive.getLong(1),
        "retire must subtract exactly the retired docs' stats")
      // probe == fresh scoring over the live set only
      val got = asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10))
      val fresh = asSet(Retrieval.bm25TopK(live, "doc_id", "text",
        probes, "query_id", "qtext", k = 10))
      assert(got == fresh, "probe after retire must equal fresh index over live docs")
      assert(got != asSet(Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qtext", k = 10)),
        "fixture must actually change the ranking (retired docs ranked before)")
      // a changed document (the runner flow): retire its OLD indexed
      // text and re-append the NEW text at the SAME seq -> the new
      // rows live (seq >= tombstone seq), the old rows stay dead
      val changedIds = live.limit(2).select($"doc_id")
      val changedOld = live.join(changedIds, Seq("doc_id"), "left_semi")
      val changedNew = changedOld
        .select($"doc_id", concat($"text", lit(" freshtail")).as("text"))
      Bm25DiskIndex.retire(changedOld, "doc_id", "text", dir, seq = 3L)
      Bm25DiskIndex.append(changedNew, "doc_id", "text", dir, seq = 3L)
      val live2 = live.join(changedIds, Seq("doc_id"), "left_anti")
        .unionByName(changedNew)
      val got2 = asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10))
      val fresh2 = asSet(Retrieval.bm25TopK(live2, "doc_id", "text",
        probes, "query_id", "qtext", k = 10))
      assert(got2 == fresh2,
        "retire+re-append at one seq must serve the NEW text only")
    } finally { Lake.delete(spark, dir) }
  }

  test("retire is idempotent per seq: a crash-rerun replay cannot double-subtract stats") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val retired = docs.where(pmod($"doc_id", lit(7)) === 3)
      val live = docs.where(pmod($"doc_id", lit(7)) =!= 3)
      Bm25DiskIndex.write(docs, "doc_id", "text", dir, numBuckets = 32, seq = 1L)
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      // the ops reflex after a crash between retire and the _applied
      // marker: run the same maintenance again — same batch, same seq
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      val st = Bm25DiskIndex.stats(spark, dir).collect()(0)
      val sLive = Retrieval.bm25Index(live, "doc_id", "text")._2.collect()(0)
      assert(st.getLong(0) == sLive.getLong(0) && st.getLong(1) == sLive.getLong(1),
        "replayed retire must subtract ONCE — stats equal a fresh live-set index")
      // distinct batches at DISTINCT seqs still both subtract
      val more = live.where(pmod($"doc_id", lit(7)) === 4)
      Bm25DiskIndex.retire(more, "doc_id", "text", dir, seq = 3L)
      val live2 = live.where(pmod($"doc_id", lit(7)) =!= 4)
      val st2 = Bm25DiskIndex.stats(spark, dir).collect()(0)
      val sLive2 = Retrieval.bm25Index(live2, "doc_id", "text")._2.collect()(0)
      assert(st2.getLong(0) == sLive2.getLong(0) && st2.getLong(1) == sLive2.getLong(1))
      // probes agree with the fresh live set after the replays
      assert(asSet(Bm25DiskIndex.probeTopK(spark, dir,
          probes, "query_id", "qtext", k = 10)) ==
        asSet(Retrieval.bm25TopK(live2, "doc_id", "text",
          probes, "query_id", "qtext", k = 10)))
    } finally { Lake.delete(spark, dir) }
  }

  test("stats survives mixed-vintage files: an old pre-sseq footer cannot drop the retire fold") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val retired = docs.where(pmod($"doc_id", lit(7)) === 3)
      val live = docs.where(pmod($"doc_id", lit(7)) =!= 3)
      Bm25DiskIndex.write(docs, "doc_id", "text", dir, numBuckets = 32, seq = 1L)
      // plant an OLD-vintage stats file (no sseq column) alongside —
      // plain footer inference could pick ITS schema and silently drop
      // sseq from every row; mergeSchema must keep it
      Seq((5L, 50L, 32L)).toDF("d_docs", "t_toks", "n_buckets")
        .coalesce(1).write.mode("append").parquet(s"$dir/stats")
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L) // replay
      val st = Bm25DiskIndex.stats(spark, dir).collect()(0)
      val sLive = Retrieval.bm25Index(live, "doc_id", "text")._2.collect()(0)
      assert(st.getLong(0) == sLive.getLong(0) + 5L &&
        st.getLong(1) == sLive.getLong(1) + 50L,
        "old-vintage rows sum additively AND the sseq-stamped replay folds once")
    } finally { Lake.delete(spark, dir) }
  }

  test("missing dir and mixed bucket counts fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      intercept[IllegalArgumentException] {
        Bm25DiskIndex.probeTopK(spark, s"$dir/nope", probes, "query_id", "qtext", 5)
      }
      Bm25DiskIndex.write(docs.limit(10), "doc_id", "text", dir, numBuckets = 8)
      // forge a mismatched increment to prove the guard trips
      Seq((1L, 1L, 16L)).toDF("d_docs", "t_toks", "n_buckets")
        .write.mode("append").parquet(s"$dir/stats")
      intercept[IllegalArgumentException] {
        Bm25DiskIndex.numBuckets(spark, dir)
      }
    } finally { Lake.delete(spark, dir) }
  }
  test("compact: fresh write of the live set — identical probes, tombstones folded away") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    try {
      val retired = docs.where(pmod($"doc_id", lit(3)) === 0)
      val live = docs.where(pmod($"doc_id", lit(3)) =!= 0)
      Bm25DiskIndex.write(docs, "doc_id", "text", dir, numBuckets = 32, seq = 1L)
      Bm25DiskIndex.retire(retired, "doc_id", "text", dir, seq = 2L)
      assert(Bm25DiskIndex.tombstoneCount(spark, dir) == retired.count())
      val before = asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10))
      Bm25DiskIndex.compact(spark, dir, live, "doc_id", "text", seq = 3L)
      assert(Bm25DiskIndex.tombstoneCount(spark, dir) == 0L,
        "compaction must fold the tombstone set away")
      assert(asSet(Bm25DiskIndex.probeTopK(spark, dir,
        probes, "query_id", "qtext", k = 10)) == before,
        "compaction must not change any probe result")
      // the standing bucket count survives compaction
      assert(Bm25DiskIndex.numBuckets(spark, dir) == 32)
    } finally { Lake.delete(spark, dir) }
  }

}
