package graft.dedup

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class PhashDiskIndexSpec extends SparkSpec {
  import spark.implicits._

  // REAL perceptual hashes: the q133 mixed-codec image corpus decoded
  // end-to-end (seed-grouped near-dups exist by construction)
  private lazy val hashes = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.multimodal.Multimodal.decodeImagePHash(
        graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(docs))
      .toDF().where(col("ok") === 1)
      .select(col("media_id").as("id"), col("phash"))
      .localCheckpoint()
  }
  private def standing = hashes.where(pmod($"id", lit(5)) =!= 0)
  private def delta = hashes.where(pmod($"id", lit(5)) === 0)

  private def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** In-memory reference: the full union pair set cut to pairs
    * touching the delta. */
  private def expectedOver(live: org.apache.spark.sql.DataFrame) = asSet(
    Dedup.hammingNearDupPairs(live.unionByName(delta), "id", "phash",
        totalBits = 64, maxDist = 5, bands = 8)
      .where(pmod($"id_a", lit(5)) === 0 || pmod($"id_b", lit(5)) === 0))

  test("probe == in-memory pairs touching the delta; append == one-shot; pruning real") {
    val dir = java.nio.file.Files.createTempDirectory("phidx").toString
    val dir2 = java.nio.file.Files.createTempDirectory("phidx").toString
    try {
      val expected = expectedOver(standing)
      assert(expected.nonEmpty, "fixture must contain delta-touching pairs")
      assert(expected.exists { case (a, b, _) => a % 5 != 0 || b % 5 != 0 },
        "fixture must contain a cross-increment (standing x delta) pair")

      PhashDiskIndex.write(standing, "id", "phash", dir, numBuckets = 64)
      val got = asSet(PhashDiskIndex.probe(spark, dir, delta, "id", "phash", 5))
      assert(got == expected, "persisted probe must equal the in-memory pair set")

      PhashDiskIndex.write(standing.where(pmod($"id", lit(2)) === 0),
        "id", "phash", dir2, numBuckets = 64)
      PhashDiskIndex.append(standing.where(pmod($"id", lit(2)) === 1),
        "id", "phash", dir2)
      assert(asSet(PhashDiskIndex.probe(spark, dir2, delta, "id", "phash", 5))
        == expected, "appended index must probe identically")

      // partition pruning engages at the file listing (numFiles)
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
      val (tb, bands, nb) = PhashDiskIndex.meta(spark, dir)
      assert((tb, bands, nb) == (64, 8, 64))
      val allFiles = filesScanned(PhashDiskIndex.bands(spark, dir))
      val pruned = filesScanned(PhashDiskIndex.prunedBands(spark, dir,
        (0L until 8L).toSeq, (0L until 8L).toSeq))
      assert(pruned < allFiles && pruned > 0,
        s"pruned read ($pruned files) must open fewer than the full index ($allFiles)")
    } finally { Lake.delete(spark, dir); Lake.delete(spark, dir2) }
  }

  test("retire kills matches; re-append at the same seq revives with the NEW hash") {
    val dir = java.nio.file.Files.createTempDirectory("phidx").toString
    try {
      PhashDiskIndex.write(standing, "id", "phash", dir, numBuckets = 16, seq = 1L)
      val full = expectedOver(standing)
      // retire every standing endpoint of the first cross pair
      val (ra, rb, _) = full.find { case (a, b, _) => a % 5 != 0 || b % 5 != 0 }.get
      val retired = Seq(ra, rb).filter(_ % 5 != 0)
      PhashDiskIndex.retire(spark, dir, retired.toDF("id"), "id", seq = 2L)
      val live = standing.where(!$"id".isin(retired: _*))
      val got = asSet(PhashDiskIndex.probe(spark, dir, delta, "id", "phash", 5))
      assert(got == expectedOver(live),
        "probe after retire must equal the in-memory pass over live rows")
      assert(!got.exists { case (a, b, _) =>
        retired.contains(a) || retired.contains(b) })
      // changed media: retire + re-append one id with a DIFFERENT hash
      // at one seq; a probe at that exact hash must match it again
      val changedId = retired.head
      val newHash = 0x0123456789ABCDEFL
      PhashDiskIndex.retire(spark, dir, Seq(changedId).toDF("id"), "id", seq = 3L)
      PhashDiskIndex.append(Seq((changedId, newHash)).toDF("id", "phash"),
        "id", "phash", dir, seq = 3L)
      val revived = asSet(PhashDiskIndex.probe(spark, dir,
        Seq((999999L, newHash ^ 1L)).toDF("id", "phash"), "id", "phash", 5))
      assert(revived.contains((changedId, 999999L, 1L)),
        "re-appended id must match under its new hash")
    } finally { Lake.delete(spark, dir) }
  }

  test("guards: missing dir, mixed shapes, maxDist past the pigeonhole bound") {
    val dir = java.nio.file.Files.createTempDirectory("phidx").toString
    try {
      intercept[IllegalArgumentException] {
        PhashDiskIndex.probe(spark, s"$dir/nope", delta, "id", "phash", 5)
      }
      PhashDiskIndex.write(standing.limit(10), "id", "phash", dir,
        bands = 8, numBuckets = 4)
      intercept[IllegalArgumentException] {
        PhashDiskIndex.probe(spark, dir, delta, "id", "phash", 8) // > bands-1
      }
      Seq((64L, 4L, 4L)).toDF("total_bits", "bands", "n_buckets")
        .write.mode("append").parquet(s"$dir/meta")
      intercept[IllegalArgumentException] { PhashDiskIndex.meta(spark, dir) }
    } finally { Lake.delete(spark, dir) }
  }

  test("compact: identical probes, tombstones folded away") {
    val dir = java.nio.file.Files.createTempDirectory("phidx").toString
    try {
      val retired = standing.where(pmod($"id", lit(3)) === 1)
      val live = standing.where(pmod($"id", lit(3)) =!= 1)
      PhashDiskIndex.write(standing, "id", "phash", dir, numBuckets = 8, seq = 1L)
      PhashDiskIndex.retire(spark, dir, retired.select($"id"), "id", seq = 2L)
      assert(PhashDiskIndex.tombstoneCount(spark, dir) == retired.count())
      def probeSet() = asSet(PhashDiskIndex.probe(spark, dir, delta, "id", "phash", 5))
      val before = probeSet()
      PhashDiskIndex.compact(spark, dir, live, "id", "phash", seq = 3L)
      assert(PhashDiskIndex.tombstoneCount(spark, dir) == 0L)
      assert(probeSet() == before, "compaction must not change any probe result")
    } finally { Lake.delete(spark, dir) }
  }
}
