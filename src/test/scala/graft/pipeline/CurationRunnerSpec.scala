package graft.pipeline

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class CurationRunnerSpec extends SparkSpec {
  import spark.implicits._

  /** Land one NDJSON file in the raw zone. */
  private def land(root: String, name: String, rows: Seq[(Long, String, String)]): Unit = {
    val dir = java.nio.file.Paths.get(root, "raw", "documents")
    java.nio.file.Files.createDirectories(dir)
    val json = rows.map { case (id, src, text) =>
      s"""{"doc_id":$id,"source":"$src","text":"$text"}"""
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(dir.resolve(name), json.getBytes("UTF-8"))
  }

  // long enough to clear the default quality gate; unique filler keeps
  // them from near-dup-matching each other
  private def doc(i: Int, tail: String = ""): String =
    s"the quick brown fox document number $i carries enough distinct words " +
      s"to pass the quality gate easily $tail d${i}a d${i}b d${i}c d${i}d"

  test("two daily increments == one full curate over the final snapshot; metadata lands") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      // day 1: ten docs; 8/9 are near-dups of each other
      land(root, "day1.json",
        (0 until 8).map(i => (i.toLong, "s0", doc(i))) :+
          (8L, "s1", doc(100)) :+ (9L, "s1", doc(100) + " x"))
      val r1 = CurationRunner.runDaily(spark, root, "2024-01-01", None, cfg)
      assert(!r1.incremental && r1.snapshotDocs == 10)
      assert(Lake.exists(spark, s"$root/curated/date=2024-01-01"))
      // near-dup pair collapsed to its canonical member
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-01-01")
      assert(c1.where($"doc_id" === 9L).isEmpty)
      assert(c1.where($"doc_id" === 8L).count() == 1)

      // day 2: two new docs, one changed doc (doc_id 3 re-lands with new
      // text), one new near-dup of a carried doc (must drop: carried wins)
      land(root, "day2.json", Seq(
        (20L, "s0", doc(20)), (21L, "s0", doc(21)),
        (3L, "s0", doc(300)),
        (22L, "s1", doc(100) + " y")))
      val r2 = CurationRunner.runDaily(spark, root, "2024-01-02", None, cfg,
        shards = Some(CurationRunner.ShardConfig(binTokens = 64L, numBuckets = 4)))
      assert(r2.incremental && r2.snapshotDocs == 13)
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-01-02")
      assert(c2.where($"doc_id" === 22L).isEmpty, "carried doc must beat its new near-dup")
      assert(c2.where($"doc_id" === 20L).count() == 1)
      // changed doc carries its NEW text
      assert(c2.where($"doc_id" === 3L).select($"text").head().getString(0)
        .contains("number 300"))

      // the composition law: two daily increments == one full curate over
      // the day-2 snapshot (same membership AND same texts)
      val snap2 = Lake.readParquet(spark, s"$root/snapshot/date=2024-01-02")
      val (full, _) = Curation.curate(snap2, None, cfg, countStages = false)
      assert(c2.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
        full.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq)

      // day 2 also exported loader-ready shards: manifest consistent
      // with the files, every curated doc in exactly one shard
      assert(r2.shardCount > 0)
      assert(graft.ops.ShardExport.verifyShards(
        spark, s"$root/shards/date=2024-01-02", "doc_id", "n_tokens").isEmpty)
      assert(Lake.readParquet(spark, s"$root/shards/date=2024-01-02/shards")
        .select($"doc_id").distinct().count() == c2.count())

      // run metadata landed one row per stage for both runs
      val m1 = RunMetadata.read(spark, root, "2024-01-01")
      assert(m1.select($"stage").as[String].collect().toSet ==
        Set("drain", "snapshot", "curate", "publish"))
      val m2 = RunMetadata.read(spark, root, "2024-01-02")
      assert(m2.select($"stage").as[String].collect().toSet ==
        Set("drain", "snapshot", "curate", "publish", "shards"))
    } finally {
      Lake.delete(spark, root)
    }
  }

  test("forward-only: a run dated before an existing snapshot is rejected") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      land(root, "day1.json", (0 until 6).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-01-05", None,
        Curation.CurationConfig(minQualityMilli = 200))
      val e = intercept[IllegalArgumentException] {
        CurationRunner.runDaily(spark, root, "2024-01-04", None,
          Curation.CurationConfig(minQualityMilli = 200))
      }
      assert(e.getMessage.contains("forward-only"))
      intercept[IllegalArgumentException] {
        CurationRunner.runDaily(spark, root, "Jan 5 2024", None,
          Curation.CurationConfig(minQualityMilli = 200))
      }
    } finally {
      Lake.delete(spark, root)
    }
  }

  test("re-running a date drains nothing new and reproduces the same curated corpus") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      land(root, "day1.json", (0 until 6).map(i => (i.toLong, "s0", doc(i))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-01-01", None, cfg)
      val before = Lake.readParquet(spark, s"$root/curated/date=2024-01-01")
        .collect().map(_.toString).sorted.toSeq
      val r2 = CurationRunner.runDaily(spark, root, "2024-01-01", None, cfg)
      assert(!r2.incremental, "rerun of the first date must not see itself as previous")
      assert(r2.snapshotDocs == r1.snapshotDocs)
      val after = Lake.readParquet(spark, s"$root/curated/date=2024-01-01")
        .collect().map(_.toString).sorted.toSeq
      assert(after == before)
    } finally {
      Lake.delete(spark, root)
    }
  }
}
