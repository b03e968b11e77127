package graft.dedup

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class LshDiskIndexSpec extends SparkSpec {
  import spark.implicits._

  private def real = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  // standing corpus + a delta that PLANTS near-copies of standing docs
  // (append one token), so cross-increment near-dups provably exist
  private def standing = real.where(pmod($"doc_id", lit(10)) =!= 0)
  private def delta = {
    val planted = real.where($"doc_id".isin(1L, 11L, 21L))
      .select(($"doc_id" + 100000L).as("doc_id"),
        concat($"text", lit(" plantedtail")).as("text"))
    real.where(pmod($"doc_id", lit(10)) === 0).unionByName(planted)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe == in-memory focused pipeline; append == one-shot; pruning real") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    val dir2 = java.nio.file.Files.createTempDirectory("lshidx").toString
    try {
      val th = 0.7
      val expected = asSet(Dedup.minhashNearDupPairsFocused(
        standing.unionByName(delta)
          .withColumn("is_new", $"doc_id" >= 100000L || pmod($"doc_id", lit(10)) === 0),
        "doc_id", "text", "is_new", th))
      assert(expected.nonEmpty, "fixture must contain focused near-dups")
      assert(expected.exists { case (a, b, _) => b >= 100000L && a < 100000L },
        "fixture must contain a cross-increment (standing x delta) pair")

      LshDiskIndex.write(standing, "doc_id", "text", dir, numBuckets = 64)
      val got = asSet(LshDiskIndex.probe(spark, dir, delta, "doc_id", "text", th))
      assert(got == expected, "persisted probe must equal the focused in-memory pipeline")

      // append == one-shot: split the standing corpus in half
      LshDiskIndex.write(standing.where(pmod($"doc_id", lit(2)) === 0),
        "doc_id", "text", dir2, numBuckets = 64)
      LshDiskIndex.append(standing.where(pmod($"doc_id", lit(2)) === 1),
        "doc_id", "text", dir2)
      val gotAppended = asSet(LshDiskIndex.probe(spark, dir2, delta, "doc_id", "text", th))
      assert(gotAppended == expected, "appended index must probe identically")

      // partition pruning engages: a tiny probe's footprint opens fewer
      // band files than the full index (numFiles, the IvfIndex
      // discipline)
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
      val (cfg, nb) = LshDiskIndex.meta(spark, dir)
      assert(nb == 64 && cfg.bands == 16)
      val allFiles = filesScanned(LshDiskIndex.bands(spark, dir))
      val bandIds = (0L until cfg.bands.toLong).toSeq
      val buckets = (0L until 8L).toSeq // a strict bucket subset proves listing-level pruning
      val prunedFiles = filesScanned(LshDiskIndex.prunedBands(spark, dir, bandIds, buckets))
      assert(prunedFiles < allFiles && prunedFiles > 0,
        s"pruned read ($prunedFiles files) must open fewer than the full index ($allFiles)")
    } finally { Lake.delete(spark, dir); Lake.delete(spark, dir2) }
  }

  test("retire: tombstoned docs stop matching; re-append at the same seq revives the id") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    try {
      val th = 0.7
      // retire the planted-copy ORIGINALS (1, 11, 21) — the delta's
      // planted near-copies must then only match what remains live
      val retiredIds = Seq(1L, 11L, 21L)
      val live = standing.where(!$"doc_id".isin(retiredIds: _*))
      LshDiskIndex.write(standing, "doc_id", "text", dir, numBuckets = 64, seq = 1L)
      LshDiskIndex.retire(spark, dir,
        standing.where($"doc_id".isin(retiredIds: _*)).select($"doc_id"),
        "doc_id", seq = 2L)
      val got = asSet(LshDiskIndex.probe(spark, dir, delta, "doc_id", "text", th))
      val expected = asSet(Dedup.minhashNearDupPairsFocused(
        live.unionByName(delta)
          .withColumn("is_new", $"doc_id" >= 100000L || pmod($"doc_id", lit(10)) === 0),
        "doc_id", "text", "is_new", th))
      assert(got == expected, "probe after retire must equal the focused pass over live docs")
      assert(!got.exists { case (a, b, _) => retiredIds.contains(a) || retiredIds.contains(b) },
        "no pair may touch a retired id")
      // changed doc: retire + re-append id 2 with new text at one seq
      val newText = standing.where($"doc_id" === 2L)
        .select($"doc_id", concat($"text", lit(" altered")).as("text"))
      LshDiskIndex.retire(spark, dir, Seq(2L).toDF("doc_id"), "doc_id", seq = 3L)
      LshDiskIndex.append(newText, "doc_id", "text", dir, seq = 3L)
      // a probe near-identical to the NEW text must match id 2 again
      val probeNew = newText.select(($"doc_id" + 500000L).as("doc_id"),
        concat($"text", lit(" tail")).as("text"))
      val revived = asSet(LshDiskIndex.probe(spark, dir, probeNew, "doc_id", "text", th))
      assert(revived.exists { case (a, _, _) => a == 2L },
        "re-appended id must be probe-able under its new text")
    } finally { Lake.delete(spark, dir) }
  }

  test("guards: missing dir and mixed configs fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    try {
      intercept[IllegalArgumentException] {
        LshDiskIndex.probe(spark, s"$dir/nope", delta, "doc_id", "text", 0.8)
      }
      LshDiskIndex.write(standing.limit(20), "doc_id", "text", dir, numBuckets = 8)
      Seq((32L, 3L, 8L, 8L)).toDF("num_hashes", "shingle_size", "bands", "n_buckets")
        .write.mode("append").parquet(s"$dir/meta")
      intercept[IllegalArgumentException] { LshDiskIndex.meta(spark, dir) }
    } finally { Lake.delete(spark, dir) }
  }
  test("compact: fresh write of the live set — identical probes, tombstones folded away") {
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    try {
      val base = real.where(pmod($"doc_id", lit(5)) =!= 0)
      val probeDocs = real.where(pmod($"doc_id", lit(5)) === 0)
      val retired = base.where(pmod($"doc_id", lit(3)) === 1)
      val live = base.where(pmod($"doc_id", lit(3)) =!= 1)
      LshDiskIndex.write(base, "doc_id", "text", dir, numBuckets = 8, seq = 1L)
      LshDiskIndex.retire(spark, dir, retired.select($"doc_id"), "doc_id", seq = 2L)
      assert(LshDiskIndex.tombstoneCount(spark, dir) == retired.count())
      def probeSet() = LshDiskIndex.probe(spark, dir, probeDocs, "doc_id", "text", 0.5)
        .collect().map(_.toString).sorted.toSeq
      val before = probeSet()
      LshDiskIndex.compact(spark, dir, live, "doc_id", "text", seq = 3L)
      assert(LshDiskIndex.tombstoneCount(spark, dir) == 0L,
        "compaction must fold the tombstone set away")
      assert(probeSet() == before, "compaction must not change any probe result")
    } finally { Lake.delete(spark, dir) }
  }

}
