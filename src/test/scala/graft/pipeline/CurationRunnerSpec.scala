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

      // run metadata landed one row per stage for both runs (index
      // maintenance is on by default and records its append stage)
      val m1 = RunMetadata.read(spark, root, "2024-01-01")
      assert(m1.select($"stage").as[String].collect().toSet ==
        Set("drain", "snapshot", "curate", "publish", "index_append"))
      val m2 = RunMetadata.read(spark, root, "2024-01-02")
      assert(m2.select($"stage").as[String].collect().toSet ==
        Set("drain", "snapshot", "curate", "publish", "index_append", "shards"))

      // the standing indexes' live set == the day-2 curated corpus:
      // the LSH index probes near-dups of a planted copy, and the BM25
      // index serves the same ranking a fresh index over c2 would
      val planted = Seq((900L, doc(20) + " z")).toDF("doc_id", "text")
      val hits = graft.dedup.LshDiskIndex.probe(
        spark, s"$root/index/lsh", planted, "doc_id", "text", 0.7)
      assert(hits.where($"id_a" === 20L && $"id_b" === 900L).count() == 1,
        "day-2 index must hold the day-2 survivors")
      // a retired (changed) doc's OLD text must no longer match: doc 3
      // re-landed with doc(300); its day-1 doc(3) text is tombstoned
      val probeOld = Seq((901L, doc(3) + " q")).toDF("doc_id", "text")
      assert(graft.dedup.LshDiskIndex.probe(
        spark, s"$root/index/lsh", probeOld, "doc_id", "text", 0.7)
        .where($"id_a" === 3L).isEmpty,
        "tombstoned day-1 text of a changed doc must not match")
      val qs = Seq((0L, "quick brown fox document number 21")).toDF("query_id", "qtext")
      val fromIdx = graft.text.Bm25DiskIndex.probeTopK(
        spark, s"$root/index/bm25", qs, "query_id", "qtext", 5)
      val fresh = graft.text.Retrieval.bm25TopK(
        c2, "doc_id", "text", qs, "query_id", "qtext", 5)
      assert(fromIdx.collect().map(_.toString).sorted.toSeq ==
        fresh.collect().map(_.toString).sorted.toSeq,
        "BM25 disk index must rank exactly like a fresh index over the curated corpus")
    } finally {
      Lake.delete(spark, root)
    }
  }

  test("index-backed increments == the in-memory path, and probes read only the index") {
    val rootA = java.nio.file.Files.createTempDirectory("lakeA").toString
    val rootB = java.nio.file.Files.createTempDirectory("lakeB").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val days = Seq(
        ("2024-02-01", (0 until 8).map(i => (i.toLong, "s0", doc(i))) :+
          (8L, "s1", doc(100)) :+ (9L, "s1", doc(100) + " x")),
        ("2024-02-02", Seq((20L, "s0", doc(20)), (3L, "s0", doc(300)),
          (22L, "s1", doc(100) + " y"))),
        ("2024-02-03", Seq((30L, "s0", doc(30)), (31L, "s1", doc(20) + " w"),
          (3L, "s0", doc(301)))))
      for ((date, rows) <- days) {
        land(rootA, s"$date.json", rows); land(rootB, s"$date.json", rows)
        CurationRunner.runDaily(spark, rootA, date, None, cfg) // indexes on
        CurationRunner.runDaily(spark, rootB, date, None, cfg, indexes = None)
        val a = graft.io.Lake.readParquet(spark, s"$rootA/curated/date=$date")
          .collect().map(_.toString).sorted.toSeq
        val b = graft.io.Lake.readParquet(spark, s"$rootB/curated/date=$date")
          .collect().map(_.toString).sorted.toSeq
        assert(a == b, s"index-backed corpus must equal in-memory corpus on $date")
      }
      // the probe's read footprint is the index alone: the standing
      // corpus (snapshot/curated parquet) is never re-read for near-dups
      val planted = Seq((950L, doc(30) + " t")).toDF("doc_id", "text")
      val probe = graft.dedup.LshDiskIndex.probe(
        spark, s"$rootA/index/lsh", planted, "doc_id", "text", 0.7)
      val files = probe.inputFiles
      assert(files.nonEmpty && files.forall(_.contains("/index/lsh/")),
        s"probe must read only index files, got: ${files.filterNot(_.contains("/index/lsh/")).take(3).mkString(",")}")
      // re-running an already-applied date must not double-apply index
      // maintenance (negative stats / duplicate postings) — stats stay
      // consistent with a fresh index over the final corpus
      CurationRunner.runDaily(spark, rootA, "2024-02-03", None, cfg)
      val c3 = graft.io.Lake.readParquet(spark, s"$rootA/curated/date=2024-02-03")
      val qs = Seq((0L, "quick brown fox document number 30")).toDF("query_id", "qtext")
      val fromIdx = graft.text.Bm25DiskIndex.probeTopK(
        spark, s"$rootA/index/bm25", qs, "query_id", "qtext", 5)
      val fresh = graft.text.Retrieval.bm25TopK(
        c3, "doc_id", "text", qs, "query_id", "qtext", 5)
      assert(fromIdx.collect().map(_.toString).sorted.toSeq ==
        fresh.collect().map(_.toString).sorted.toSeq,
        "re-run must leave the BM25 index equal to a fresh one over the corpus")
    } finally { Lake.delete(spark, rootA); Lake.delete(spark, rootB) }
  }

  test("IVF drift trigger: a drifty day refreshes the registered index version") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-03-01", None, cfg)
      // register an IVF index family in the lake (vectors from testdata)
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val cents = emb.where($"vec_id" % 16 === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      graft.ann.IvfIndex.write(emb, "vec_id", "embedding", cents,
        s"$root/index/ivf/v0")
      graft.ann.IvfIndex.setCurrentVersion(spark, s"$root/index/ivf", "v0")
      // calm day: same vocabulary, below the KL threshold -> no refresh
      land(root, "day2.json", Seq((20L, "s0", doc(20)), (21L, "s0", doc(21))))
      val calm = CurationRunner.runDaily(spark, root, "2024-03-02", None, cfg,
        indexes = Some(CurationRunner.IndexConfig(ivfRefreshKlMilli = 1500L)))
      assert(calm.klMilli >= 0 && !calm.ivfRefreshed,
        s"calm day must not refresh (kl=${calm.klMilli})")
      assert(graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf")
        .contains("v0"))
      // drifty day: an alien vocabulary -> KL spikes -> refresh + swap
      land(root, "day3.json", (40 until 44).map(i => (i.toLong, "s9",
        s"zq$i xv$i wk$i vj$i uh$i tg$i rf$i ed$i plasma quark boson lepton " +
          s"hadron gluon neutrino meson baryon photon tachyon axion zq${i}b")))
      val drift = CurationRunner.runDaily(spark, root, "2024-03-03", None, cfg,
        indexes = Some(CurationRunner.IndexConfig(ivfRefreshKlMilli = 1500L)))
      assert(drift.klMilli > 1500L && drift.ivfRefreshed,
        s"drifty day must refresh (kl=${drift.klMilli})")
      assert(graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf")
        .contains("v2024-03-03"))
      // the refreshed version serves the full probe contract; the old
      // version remains intact (never overwritten in place)
      val probe = graft.ann.IvfIndex.probeTopK(spark,
        s"$root/index/ivf/v2024-03-03",
        emb.where($"vec_id" < 3), "vec_id", "embedding", k = 5, nProbe = 2)
      assert(probe.count() > 0)
      assert(graft.ann.IvfIndex.cells(spark, s"$root/index/ivf/v0").count() ==
        emb.count())
    } finally { Lake.delete(spark, root) }
  }

  // deterministic text-derived embedding — the spec's stand-in for a
  // real encoder: same text -> bit-identical vector on every call, so
  // maintained-index vectors and freshly-embedded vectors compare exact
  private def embedDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select($"doc_id", transform(sequence(lit(0), lit(7)),
      i => (pmod(xxhash64($"text", i), lit(1000L)).cast("double") / 500.0 - 1.0)
        .cast("float")).as("embedding"))

  test("embed-maintained IVF family: backfill, retire+append track the curated corpus, compaction versions") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      // refresh quiet (huge KL threshold): this test isolates the
      // backfill/retire/append/compact path; drift-refresh has its own
      val ixCfg = CurationRunner.IndexConfig(embed = Some(embedDocs),
        ivfBuckets = 4, ivfTrainStride = 4, ivfRefreshKlMilli = 1000000L)
      def liveVecs(ver: String) = graft.ann.IvfIndex
        .cells(spark, s"$root/index/ivf/$ver")
        .select($"id", $"v").collect().map(_.toString).sorted.toSeq
      def curatedVecs(date: String) = embedDocs(
          Lake.readParquet(spark, s"$root/curated/date=$date"))
        .select($"doc_id".as("id"), $"embedding".as("v"))
        .collect().map(_.toString).sorted.toSeq

      // day 1 runs WITHOUT embed — the lake predates vector maintenance
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-05-01", None, cfg)
      assert(graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf").isEmpty)

      // day 2 supplies embed: backfill from the day-1 curated corpus,
      // then retire the changed doc's old vector and append the delta
      land(root, "day2.json", Seq(
        (20L, "s0", doc(20)), (3L, "s0", doc(300))))
      CurationRunner.runDaily(spark, root, "2024-05-02", None, cfg,
        indexes = Some(ixCfg))
      val ver2 = graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf").get
      assert(ver2 == "v2024-05-01", s"backfill must land at the previous date, got $ver2")
      assert(liveVecs(ver2) == curatedVecs("2024-05-02"),
        "IVF live set must equal the day-2 curated corpus (changed doc re-embedded)")

      // day 3 churns 5 of ~9 docs (> 20% tombstones) -> compaction to a
      // NEW version + pointer swap; old version dir stays intact
      land(root, "day3.json", (0 until 5).map(i => (i.toLong, "s0", doc(i + 70))))
      CurationRunner.runDaily(spark, root, "2024-05-03", None, cfg,
        indexes = Some(ixCfg))
      val ver3 = graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf").get
      assert(ver3 == "v2024-05-03c", s"churn past the threshold must compact, got $ver3")
      assert(graft.ann.IvfIndex.tombstoneCount(spark, s"$root/index/ivf/$ver3") == 0L)
      assert(liveVecs(ver3) == curatedVecs("2024-05-03"),
        "compacted IVF live set must equal the day-3 curated corpus")
      assert(Lake.exists(spark, s"$root/index/ivf/$ver2/cells"),
        "compaction lands beside — the old version is never truncated")

      // probe == fresh parity: the maintained index answers exactly like
      // a fresh index written over the curated corpus + same centroids
      val c3 = Lake.readParquet(spark, s"$root/curated/date=2024-05-03")
      val freshDir = java.nio.file.Files.createTempDirectory("ivf-fresh").toString
      graft.ann.IvfIndex.write(embedDocs(c3), "doc_id", "embedding",
        graft.ann.IvfIndex.centroids(spark, s"$root/index/ivf/$ver3"),
        freshDir, numBuckets = 4)
      val qs = embedDocs(c3.where($"doc_id" < 2))
      val got = graft.ann.IvfIndex.probeTopK(spark, s"$root/index/ivf/$ver3",
        qs, "doc_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toString).sorted.toSeq
      val want = graft.ann.IvfIndex.probeTopK(spark, freshDir,
        qs, "doc_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "maintained-index probes must equal fresh-index probes")
      Lake.delete(spark, freshDir)
    } finally { Lake.delete(spark, root) }
  }

  test("pq-maintained compressed family: backfill, retire+append, compaction track the curated corpus") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val ixCfg = CurationRunner.IndexConfig(embed = Some(embedDocs),
        ivfBuckets = 4, ivfTrainStride = 4, ivfRefreshKlMilli = 1000000L,
        pq = Some(CurationRunner.PqConfig(m = 4, dim = 8, buckets = 2,
          stride = 4)))
      val pqRoot = s"$root/index/ivfpq"
      def liveIds(ver: String) = graft.ann.IvfPqIndex
        .codes(spark, s"$pqRoot/$ver")
        .select($"id").as[Long].collect().sorted.toSeq
      def curatedIds(date: String) =
        Lake.readParquet(spark, s"$root/curated/date=$date")
          .select($"doc_id").as[Long].collect().sorted.toSeq

      // pq without embed is a loud misconfiguration
      intercept[IllegalArgumentException] {
        CurationRunner.runDaily(spark, root, "2024-05-01", None, cfg,
          indexes = Some(CurationRunner.IndexConfig(
            pq = Some(CurationRunner.PqConfig()))))
      }

      // day 1 runs WITHOUT the family — the lake predates it
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-05-01", None, cfg)
      assert(graft.ann.IvfIndex.currentVersion(spark, pqRoot).isEmpty)

      // day 2 registers it: backfill from day-1 curated, then retire
      // the changed doc's old codes and append the delta
      land(root, "day2.json", Seq(
        (20L, "s0", doc(20)), (3L, "s0", doc(300))))
      CurationRunner.runDaily(spark, root, "2024-05-02", None, cfg,
        indexes = Some(ixCfg))
      val ver2 = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
      assert(ver2 == "v2024-05-01", s"backfill must land at the previous date, got $ver2")
      assert(liveIds(ver2) == curatedIds("2024-05-02"),
        "live code set must equal the day-2 curated corpus (changed doc re-encoded)")

      // day 3 churns > 20% -> compaction to a NEW version + ptr swap
      land(root, "day3.json", (0 until 5).map(i => (i.toLong, "s0", doc(i + 70))))
      CurationRunner.runDaily(spark, root, "2024-05-03", None, cfg,
        indexes = Some(ixCfg))
      val ver3 = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
      assert(ver3 == "v2024-05-03c", s"churn past the threshold must compact, got $ver3")
      assert(graft.ann.IvfPqIndex.tombstoneCount(spark, s"$pqRoot/$ver3") == 0L)
      assert(liveIds(ver3) == curatedIds("2024-05-03"))
      assert(Lake.exists(spark, s"$pqRoot/$ver2/codes"),
        "compaction lands beside — the old version is never truncated")

      // probe parity: the maintained index answers exactly like a fresh
      // one written over the curated corpus + the SAME artifacts
      val c3 = Lake.readParquet(spark, s"$root/curated/date=2024-05-03")
      val freshDir = java.nio.file.Files.createTempDirectory("ivfpq-fresh").toString
      graft.ann.IvfPqIndex.write(embedDocs(c3), "doc_id", "embedding",
        graft.ann.IvfPqIndex.centroids(spark, s"$pqRoot/$ver3"),
        graft.ann.IvfPqIndex.codebooks(spark, s"$pqRoot/$ver3"),
        m = 4, dim = 8, dir = freshDir, numBuckets = 2)
      val qs = embedDocs(c3.where($"doc_id" < 2))
      def probed(dir: String) = graft.ann.IvfPqIndex.probeTopK(spark, dir,
        qs, "doc_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toString).sorted.toSeq
      assert(probed(s"$pqRoot/$ver3") == probed(freshDir))
      assert(probed(freshDir).nonEmpty)
      Lake.delete(spark, freshDir)
    } finally { Lake.delete(spark, root) }
  }

  // 16-dim variant (Rotation.hadamard needs a power of two with an
  // integer square root — 8 is not one)
  private def embedDocs16(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select($"doc_id", transform(sequence(lit(0), lit(15)),
      i => (pmod(xxhash64($"text", i), lit(1000L)).cast("double") / 500.0 - 1.0)
        .cast("float")).as("embedding"))

  test("rotated pq family: the daily loop serves the OPQ-lite space end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val ixCfg = CurationRunner.IndexConfig(embed = Some(embedDocs16),
        ivfBuckets = 4, ivfTrainStride = 4, ivfRefreshKlMilli = 1000000L,
        pq = Some(CurationRunner.PqConfig(m = 4, dim = 16, buckets = 2,
          stride = 4, rotated = true)))
      val pqRoot = s"$root/index/ivfpq"
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-05-01", None, cfg,
        indexes = Some(ixCfg))
      val ver1 = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
      assert(graft.ann.IvfPqIndex.rotated(spark, s"$pqRoot/$ver1"),
        "the flag must land in the index meta on the first write")

      // day 2 appends a delta — the flag makes append rotate it too
      land(root, "day2.json", Seq((20L, "s0", doc(20))))
      CurationRunner.runDaily(spark, root, "2024-05-02", None, cfg,
        indexes = Some(ixCfg))
      val ver2 = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
      assert(graft.ann.IvfPqIndex.rotated(spark, s"$pqRoot/$ver2"))

      // probe parity with a fresh rotated write over the curated
      // corpus + the standing artifacts (original-space inputs both
      // sides — the index rotates internally)
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-05-02")
      val freshDir = java.nio.file.Files.createTempDirectory("ivfpq-rot").toString
      graft.ann.IvfPqIndex.write(embedDocs16(c2), "doc_id", "embedding",
        graft.ann.IvfPqIndex.centroids(spark, s"$pqRoot/$ver2"),
        graft.ann.IvfPqIndex.codebooks(spark, s"$pqRoot/$ver2"),
        m = 4, dim = 16, dir = freshDir, numBuckets = 2, rotated = true)
      val qs = embedDocs16(c2.where($"doc_id" < 2))
      def probed(dir: String) = graft.ann.IvfPqIndex.probeTopK(spark, dir,
        qs, "doc_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toString).sorted.toSeq
      assert(probed(s"$pqRoot/$ver2") == probed(freshDir))
      assert(probed(freshDir).nonEmpty)
      Lake.delete(spark, freshDir)
    } finally { Lake.delete(spark, root) }
  }

  // deterministic text-derived perceptual hash — the spec's stand-in
  // for a real media decode+pHash (same text -> same hash, changed
  // text -> changed hash), so maintained-index state compares exact
  private def phashDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select($"doc_id", xxhash64($"text").as("phash"))

  test("phash-maintained media family: backfill, retire+append track the curated corpus, compaction") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val ixCfg = CurationRunner.IndexConfig(phash = Some(phashDocs),
        phashBuckets = 4)
      val phDir = s"$root/index/phash"
      // probe parity pins the live set exactly: a near-hash delta must
      // match the SAME partners against the maintained index as
      // against a fresh index over the day's curated hashes
      def parity(date: String): Unit = {
        val cur = Lake.readParquet(spark, s"$root/curated/date=$date")
        val probe = phashDocs(cur).select(($"doc_id" + 1000L).as("doc_id"),
          $"phash".bitwiseXOR(1L).as("phash"))
        val freshDir = java.nio.file.Files.createTempDirectory("ph-fresh").toString
        graft.dedup.PhashDiskIndex.write(phashDocs(cur), "doc_id", "phash",
          freshDir, numBuckets = 4)
        val got = graft.dedup.PhashDiskIndex.probe(spark, phDir, probe,
          "doc_id", "phash", 5).collect().map(_.toString).sorted.toSeq
        val want = graft.dedup.PhashDiskIndex.probe(spark, freshDir, probe,
          "doc_id", "phash", 5).collect().map(_.toString).sorted.toSeq
        Lake.delete(spark, freshDir)
        assert(got.nonEmpty, "parity probe must produce matches")
        assert(got == want,
          s"$date: maintained-index probes must equal fresh-index probes")
      }

      // day 1 runs WITHOUT the hook — the lake predates media indexing
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-06-01", None, cfg)
      assert(!Lake.exists(spark, s"$phDir/meta"))

      // day 2 supplies the hook: backfill from day-1's curated corpus,
      // retire the changed doc's old hash, append the delta's hashes
      land(root, "day2.json", Seq(
        (20L, "s0", doc(20)), (3L, "s0", doc(300))))
      CurationRunner.runDaily(spark, root, "2024-06-02", None, cfg,
        indexes = Some(ixCfg))
      assert(Lake.exists(spark, s"$phDir/meta"))
      parity("2024-06-02")

      // day 3 churns most docs -> compaction folds the tombstones away
      land(root, "day3.json", (0 until 5).map(i => (i.toLong, "s0", doc(i + 70))))
      CurationRunner.runDaily(spark, root, "2024-06-03", None, cfg,
        indexes = Some(ixCfg))
      assert(graft.dedup.PhashDiskIndex.tombstoneCount(spark, phDir) == 0L,
        "churn past the threshold must compact the media family")
      parity("2024-06-03")
    } finally { Lake.delete(spark, root) }
  }

  test("embed on a fresh lake: the first run writes the IVF family from the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      land(root, "day1.json", (0 until 6).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-06-01", None, cfg,
        indexes = Some(CurationRunner.IndexConfig(embed = Some(embedDocs),
          ivfBuckets = 4, ivfTrainStride = 4)))
      assert(graft.ann.IvfIndex.currentVersion(spark, s"$root/index/ivf")
        .contains("v2024-06-01"))
      val live = graft.ann.IvfIndex
        .cells(spark, s"$root/index/ivf/v2024-06-01")
        .select($"id", $"v").collect().map(_.toString).sorted.toSeq
      val want = embedDocs(Lake.readParquet(spark, s"$root/curated/date=2024-06-01"))
        .select($"doc_id".as("id"), $"embedding".as("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(live == want, "first-run IVF live set must equal the curated corpus")
    } finally { Lake.delete(spark, root) }
  }

  /** One WARC segment of HTTP-response records with HTML bodies. */
  private def warcSeg(urls: Seq[(String, String)]): Array[Byte] =
    urls.flatMap { case (url, text) =>
      graft.multimodal.Containers.warcRecordBytes(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> url,
        "Content-Type" -> "application/http; msgtype=response"),
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          s"<html><body><p>$text</p></body></html>").getBytes("UTF-8")).toSeq
    }.toArray

  private def landBin(root: String, name: String, bytes: Array[Byte]): Unit = {
    val dir = java.nio.file.Paths.get(root, "raw", "documents")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve(name), bytes)
  }

  test("RawWarc daily loop: crawl segments drain through the container walk into curation") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      def url(i: Int) = s"http://site$i.example/page$i.html"
      // day 1: two segments, four pages
      landBin(root, "seg1.warc", warcSeg(Seq(
        (url(1), doc(1)), (url(2), doc(2)))))
      landBin(root, "seg2.warc", warcSeg(Seq(
        (url(3), doc(3)), (url(4), doc(4)))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-07-01", None, cfg,
        rawFormat = CurationRunner.RawWarc())
      assert(r1.snapshotDocs == 4)
      // htmlToText squeezes whitespace runs — expected text is the
      // squeezed form (doc() has a double space at its empty tail slot)
      def sq(s: String) = s.replaceAll(" +", " ")
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-07-01")
      val byText = c1.select($"source", $"text").collect()
        .map(r => r.getString(1) -> r.getString(0)).toMap
      assert(byText.keySet == (1 to 4).map(i => sq(doc(i))).toSet,
        "HTML-extracted page text must reach the curated corpus")
      assert(byText(sq(doc(1))) == "site1.example",
        "source must be the registrable domain of the crawled URL")
      assert(c1.select($"doc_id").distinct().count() == 4)

      // day 2: RE-CRAWL url(2) with new content + one new page; the
      // re-crawled URL hashes to the SAME doc_id -> a changed document
      landBin(root, "seg3.warc", warcSeg(Seq(
        (url(2), doc(200)), (url(5), doc(5)))))
      val r2 = CurationRunner.runDaily(spark, root, "2024-07-02", None, cfg,
        rawFormat = CurationRunner.RawWarc())
      assert(r2.incremental && r2.snapshotDocs == 5,
        "re-crawled URL must collapse onto its standing doc_id")
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-07-02")
      val texts = c2.select($"text").as[String].collect().toSet
      assert(texts == Set(doc(1), doc(200), doc(3), doc(4), doc(5)).map(sq),
        "latest crawl wins for the re-crawled URL; carried pages intact")
    } finally { Lake.delete(spark, root) }
  }

  test("RawWarc encoding audit: mixed-charset day lands transcoded docs + stage metrics") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      def page(url: String, ctype: String, payload: Array[Byte]) =
        graft.multimodal.Containers.warcRecordBytes(Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> url,
          "Content-Type" -> "application/http; msgtype=response"),
          (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
            .getBytes("ISO-8859-1") ++ payload)
      val seg =
        page("http://a.example/p1", "text/html",
          s"<html><body><p>${doc(1)}</p></body></html>".getBytes("UTF-8")) ++
        page("http://b.example/p2", "text/html; charset=windows-1252",
          ("<html><body><p>" + doc(2) + " “quoted” –</p></body></html>")
            .getBytes("windows-1252")) ++
        page("http://c.example/p3", "text/html",
          ("<html><head><meta charset=shift_jis></head><body><p>" +
            doc(3) + " 日本語</p></body></html>").getBytes("Shift_JIS")) ++
        page("http://d.example/p4", "text/html; charset=x-alien",
          "<p>opaque bytes</p>".getBytes("UTF-8"))
      landBin(root, "mixed.warc", seg)
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val r = CurationRunner.runDaily(spark, root, "2024-07-01", None, cfg,
        rawFormat = CurationRunner.RawWarc())
      // the refused page never becomes a document
      assert(r.snapshotDocs == 3, s"unsupported_charset must not land: $r")
      val snap = Lake.readParquet(spark, s"$root/snapshot/date=2024-07-01")
        .select($"text").as[String].collect().toSet
      assert(snap.exists(_.contains("“quoted” –")),
        s"cp1252 punctuation must transcode, not mojibake: $snap")
      assert(snap.exists(_.contains("日本語")),
        "meta-declared Shift-JIS must transcode")
      // the encoding mix is a stage metric the operator reads
      val stages = RunMetadata.read(spark, root, "2024-07-01")
        .select($"stage", $"records").as[(String, Long)].collect().toMap
      assert(stages.get("encoding:utf-8:ok").contains(1L), s"$stages")
      assert(stages.get("encoding:windows-1252:ok").contains(1L))
      assert(stages.get("encoding:shift_jis:ok").contains(1L))
      assert(stages.get("encoding:x-alien:unsupported_charset").contains(1L))
      // audit rows accumulate under metadata_encoding with the date
      val audit = Lake.readParquet(spark, s"$root/metadata_encoding")
      assert(audit.where($"ingest_date" === "2024-07-01").count() == 4)
      // a second day adds its own rows without rewriting day 1's
      landBin(root, "seg2.warc", warcSeg(Seq(
        ("http://e.example/p5", doc(5)))))
      CurationRunner.runDaily(spark, root, "2024-07-02", None, cfg,
        rawFormat = CurationRunner.RawWarc())
      val audit2 = Lake.readParquet(spark, s"$root/metadata_encoding")
      assert(audit2.where($"ingest_date" === "2024-07-01").count() == 4 &&
        audit2.where($"ingest_date" === "2024-07-02").count() == 1)
      val s2 = RunMetadata.read(spark, root, "2024-07-02")
        .select($"stage", $"records").as[(String, Long)].collect().toMap
      assert(s2.get("encoding:utf-8:ok").contains(1L) &&
        !s2.contains("encoding:x-alien:unsupported_charset"),
        s"day 2's metrics must cover only day 2's drain: $s2")
    } finally { Lake.delete(spark, root) }
  }

  test("RawZip daily loop: archive members drain through the central-directory walk") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      // day 1: one archive, three members (deflate + stored mixed),
      // one of them CRC-corrupted (must not become a document)
      val z1 = graft.multimodal.Containers.zipBytes(Seq(
        ("corpusA/m1.txt", doc(1).getBytes("UTF-8"), true),
        ("corpusA/m2.txt", doc(2).getBytes("UTF-8"), false),
        ("corpusB/m3.txt", doc(3).getBytes("UTF-8"), true)))
      // flip m1's directory CRC (entry 0 — its record opens the
      // central directory; the CRC field sits at +16)
      locally {
        val p = z1.length - 22
        val cd = ((z1(p + 16) & 0xff) | ((z1(p + 17) & 0xff) << 8) |
          ((z1(p + 18) & 0xff) << 16) | ((z1(p + 19) & 0xff) << 24))
        z1(cd + 16) = (z1(cd + 16) ^ 0x3c).toByte
      }
      landBin(root, "dump1.zip", z1)
      val r1 = CurationRunner.runDaily(spark, root, "2024-08-01", None, cfg,
        rawFormat = CurationRunner.RawZip)
      assert(r1.snapshotDocs == 2, "the CRC-failed member must not land")
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-08-01")
      val bySrc = c1.select($"source", $"text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(bySrc == Map("corpusA" -> doc(2), "corpusB" -> doc(3)),
        "source must be the member's top-level directory")

      // day 2: m2 re-lands with NEW text (same member name -> same
      // doc_id -> changed document), plus one new member
      landBin(root, "dump2.zip", graft.multimodal.Containers.zipBytes(Seq(
        ("corpusA/m2.txt", doc(200).getBytes("UTF-8"), true),
        ("corpusB/m4.txt", doc(4).getBytes("UTF-8"), false))))
      val r2 = CurationRunner.runDaily(spark, root, "2024-08-02", None, cfg,
        rawFormat = CurationRunner.RawZip)
      assert(r2.incremental && r2.snapshotDocs == 3,
        "a re-landed member name must collapse onto its standing doc_id")
      val texts = Lake.readParquet(spark, s"$root/curated/date=2024-08-02")
        .select($"text").as[String].collect().toSet
      assert(texts == Set(doc(200), doc(3), doc(4)),
        "latest member wins; carried members intact")
    } finally { Lake.delete(spark, root) }
  }

  test("RawPdf daily loop: crawl PDFs drain through the xref/page/text walk") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      // day 1: two PDFs under different wire shapes + one broken one
      // (must not become a document); a page's ET newline joins pages
      landBin(root, "a.pdf", graft.multimodal.Pdf.pdfBytes(
        Seq(doc(1), doc(10)), graft.multimodal.Pdf.PdfOpts(flate = true)))
      landBin(root, "b.pdf", graft.multimodal.Pdf.pdfBytes(
        Seq(doc(2)), graft.multimodal.Pdf.PdfOpts(flate = true,
          xrefStream = true, objStm = true)))
      landBin(root, "junk.pdf", graft.multimodal.Pdf.pdfBytes(
        Seq(doc(3)), graft.multimodal.Pdf.PdfOpts(breakMagic = true)))
      val r1 = CurationRunner.runDaily(spark, root, "2024-09-01", None, cfg,
        rawFormat = CurationRunner.RawPdf)
      assert(r1.snapshotDocs == 2, "the refused PDF must not land")
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-09-01")
      val texts1 = c1.select($"text").as[String].collect().toSet
      assert(texts1 == Set(doc(1) + "\n" + doc(10) + "\n", doc(2) + "\n"),
        s"pages join in order: $texts1")
      assert(c1.select($"source").as[String].collect().toSet == Set("pdf"))

      // day 2: a new file arrives (PDF doc ids are path hashes, so the
      // unit of change is the file; the drain checkpoint reads only
      // unseen paths)
      landBin(root, "c.pdf", graft.multimodal.Pdf.pdfBytes(
        Seq(doc(4)), graft.multimodal.Pdf.PdfOpts(tjSplit = true)))
      val r2 = CurationRunner.runDaily(spark, root, "2024-09-02", None, cfg,
        rawFormat = CurationRunner.RawPdf)
      assert(r2.incremental && r2.snapshotDocs == 3)
      val texts2 = Lake.readParquet(spark, s"$root/curated/date=2024-09-02")
        .select($"text").as[String].collect().toSet
      assert(texts2 == Set(doc(1) + "\n" + doc(10) + "\n", doc(2) + "\n",
        doc(4) + "\n"), "carried docs intact beside the delta")
    } finally { Lake.delete(spark, root) }
  }

  test("RawWarc .warc.zst segments drain through the daily loop; auto sniffs mixed dirs") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      def url(i: Int) = s"http://site$i.example/page$i.html"
      def sq(s: String) = s.replaceAll(" +", " ")
      // day 1: zstd-compressed crawl segments (the modern corpus norm)
      landBin(root, "seg1.warc.zst", graft.multimodal.Zstd.compress(
        warcSeg(Seq((url(1), doc(1)), (url(2), doc(2))))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-07-01", None, cfg,
        rawFormat = CurationRunner.RawWarc(codec = "zstd"))
      assert(r1.snapshotDocs == 2)
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-07-01")
      assert(c1.select($"text").as[String].collect().toSet ==
        Set(sq(doc(1)), sq(doc(2))))
      // day 2: a MIXED directory increment — one plain segment, one
      // zstd — drains under codec="auto" (per-file magic sniff)
      landBin(root, "seg2.warc", warcSeg(Seq((url(3), doc(3)))))
      landBin(root, "seg3.warc.zst", graft.multimodal.Zstd.compress(
        warcSeg(Seq((url(4), doc(4))))))
      val r2 = CurationRunner.runDaily(spark, root, "2024-07-02", None, cfg,
        rawFormat = CurationRunner.RawWarc(codec = "auto"))
      assert(r2.snapshotDocs == 4)
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-07-02")
      assert(c2.select($"text").as[String].collect().toSet ==
        (1 to 4).map(i => sq(doc(i))).toSet,
        "plain and zstd segments must land identically under auto")
    } finally { Lake.delete(spark, root) }
  }

  test("tokenizer maintenance: increments fold exactly; drift refreshes a versioned artifact") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val tok = CurationRunner.TokenizerConfig(numMerges = 6, refreshKlMilli = 0L)
      def counts(df: org.apache.spark.sql.DataFrame) =
        graft.text.Bpe.wordCounts(df, "text")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet

      // day 1: first run learns v<day1> from the full curated corpus
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-08-01", None, cfg,
        tokenizer = Some(tok))
      assert(r1.tokenizerRefreshed)
      assert(graft.text.TokenizerStore.currentVersion(spark, s"$root/tokenizer")
        .contains("v2024-08-01"))
      val c1 = Lake.readParquet(spark, s"$root/curated/date=2024-08-01")
      assert(graft.text.TokenizerStore.foldedCounts(spark, s"$root/tokenizer")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet == counts(c1))

      // day 2: a changed doc (old counts must retire) + new docs; KL
      // threshold 0 -> refresh fires and the artifact equals a
      // from-scratch learn over today's corpus
      land(root, "day2.json", Seq(
        (3L, "s0", doc(300)), (20L, "s0", doc(20)), (21L, "s0", doc(21))))
      val r2 = CurationRunner.runDaily(spark, root, "2024-08-02", None, cfg,
        tokenizer = Some(tok))
      assert(r2.tokenizerRefreshed)
      assert(graft.text.TokenizerStore.currentVersion(spark, s"$root/tokenizer")
        .contains("v2024-08-02"))
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-08-02")
      val c2Counts = counts(c2) // materialize: the re-run below rewrites the dir
      assert(graft.text.TokenizerStore.foldedCounts(spark, s"$root/tokenizer")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet == c2Counts,
        "negative increments must retire the changed doc's old counts exactly")
      val (fresh, _) = graft.text.Bpe.learnFromCounts(
        graft.text.Bpe.wordCounts(c2, "text"), numMerges = 6)
      val stored = graft.text.TokenizerStore.merges(
          spark, s"$root/tokenizer", "v2024-08-02")
        .orderBy($"merge_rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(stored.toSeq == fresh.map(m => (m.rank, m.l, m.r, m.count)),
        "incrementally-maintained artifact == from-scratch learn on today's corpus")
      // the old version remains encode-able (pointer-swap discipline)
      assert(Lake.exists(spark, s"$root/tokenizer/v2024-08-01/segments"))
      // serving path: encode from the current artifact
      assert(graft.text.TokenizerStore.encode(
        c2.limit(3), "doc_id", "text", s"$root/tokenizer").count() == 3)

      // re-run of an applied date: counts must not double-fold
      CurationRunner.runDaily(spark, root, "2024-08-02", None, cfg,
        tokenizer = Some(tok))
      assert(graft.text.TokenizerStore.foldedCounts(spark, s"$root/tokenizer")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet == c2Counts,
        "re-run must be a no-op on the count state")
    } finally { Lake.delete(spark, root) }
  }

  test("export day under a maintained tokenizer: shard token accounting == the served artifact's encoding") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val tok = CurationRunner.TokenizerConfig(numMerges = 6, refreshKlMilli = 0L)
      val sc = CurationRunner.ShardConfig(binTokens = 64L, numBuckets = 4)
      land(root, "day1.json", (0 until 10).map(i => (i.toLong, "s0", doc(i))))
      val r = CurationRunner.runDaily(spark, root, "2024-08-01", None, cfg,
        shards = Some(sc), tokenizer = Some(tok))
      assert(r.shardCount > 0 && r.tokenizerRefreshed)
      val outDir = s"$root/shards/date=2024-08-01"
      // the shards' n_tokens must be the MAINTAINED tokenizer's subword
      // counts (what a training run consumes), not the whitespace proxy
      val curated = Lake.readParquet(spark, s"$root/curated/date=2024-08-01")
      val served = graft.text.TokenizerStore.encode(
          curated, "doc_id", "text", s"$root/tokenizer")
        .collect().map(rr => rr.getLong(0) -> rr.getLong(2)).toMap
      val shardRows = spark.read.parquet(s"$outDir/shards")
        .select($"doc_id", $"n_tokens").collect()
        .map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
      assert(shardRows == served,
        "shard token counts must equal the served artifact's encoding")
      val ws = curated.select($"doc_id",
          graft.text.TextFunctions.tokenCount($"text").cast("long")).collect()
        .map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
      assert(shardRows != ws,
        "fixture must discriminate: subword counts differ from whitespace counts")
      // manifest verifies against what actually landed
      assert(graft.ops.ShardExport.verifyShards(
        spark, outDir, "doc_id", "n_tokens").isEmpty)
    } finally { Lake.delete(spark, root) }
  }

  test("tokenizer count increments are idempotent per seq: crash-window replays fold once") {
    val root = java.nio.file.Files.createTempDirectory("tokstore").toString
    def folded = graft.text.TokenizerStore.foldedCounts(spark, root)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    try {
      val day1 = Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "freq")
      graft.text.TokenizerStore.appendCounts(day1, root, seq = Some(10L))
      // the ops reflex after a crash between appendCounts and the
      // _applied marker: run the same day again — same batch, same seq
      graft.text.TokenizerStore.appendCounts(day1, root, seq = Some(10L))
      graft.text.TokenizerStore.appendCounts(day1, root, seq = Some(10L))
      assert(folded == Set(("alpha", 3L), ("beta", 2L)),
        "a replayed stamped batch must fold ONCE")
      // a later day at a DISTINCT seq still folds: plus/minus rows of
      // one word net within the batch, zero-net words drop out
      val day2 = Seq(("alpha", -3L), ("beta", 5L), ("beta", -1L))
        .toDF("word", "freq")
      graft.text.TokenizerStore.appendCounts(day2, root, seq = Some(11L))
      graft.text.TokenizerStore.appendCounts(day2, root, seq = Some(11L))
      assert(folded == Set(("beta", 6L)))
      // mixed vintage: a pre-cseq file (plain additive rows) sums as-is
      // next to stamped files — mergeSchema keeps the cseq column alive
      Seq(("gamma", 7L), ("gamma", 1L)).toDF("word", "freq")
        .coalesce(1).write.mode("append")
        .parquet(graft.text.TokenizerStore.countsPath(root))
      assert(folded == Set(("beta", 6L), ("gamma", 8L)))
      // a seq replayed with a NON-identical batch is corrupted state,
      // not a crash replay: the fold fails loudly instead of silently
      // min-merging the conflicting rows
      graft.text.TokenizerStore.appendCounts(
        Seq(("beta", 9L)).toDF("word", "freq"), root, seq = Some(11L))
      val e = intercept[Exception] { folded }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("non-identical")), msgs(e).mkString(" | "))
    } finally { Lake.delete(spark, root) }
  }

  test("tokenizer replay guard catches word-set drift, not just freq conflicts") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def withStore(f: String => Unit): Unit = {
      val root = java.nio.file.Files.createTempDirectory("tokstore").toString
      try f(root) finally { Lake.delete(spark, root) }
    }
    def folded(root: String) = graft.text.TokenizerStore
      .foldedCounts(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // word ADDED in the replay: every (cseq, word) group still has
    // internally-consistent freqs (min == max), so the freq check alone
    // is blind — the stamped batch stats (bn/bfp) must catch it
    withStore { root =>
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L)).toDF("word", "freq"), root, seq = Some(7L))
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "freq"),
        root, seq = Some(7L))
      val e = intercept[Exception] { folded(root) }
      assert(msgs(e).exists(_.contains("non-identical")), msgs(e).mkString(" | "))
    }
    // word REMOVED (the surviving word keeps its freq)
    withStore { root =>
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "freq"),
        root, seq = Some(7L))
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L)).toDF("word", "freq"), root, seq = Some(7L))
      val e = intercept[Exception] { folded(root) }
      assert(msgs(e).exists(_.contains("non-identical")), msgs(e).mkString(" | "))
    }
    // word SWAPPED at the same count and freq (disjoint change, batch
    // sizes equal) — only the fingerprint distinguishes the batches
    withStore { root =>
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "freq"),
        root, seq = Some(7L))
      graft.text.TokenizerStore.appendCounts(
        Seq(("alpha", 3L), ("gamma", 2L)).toDF("word", "freq"),
        root, seq = Some(7L))
      val e = intercept[Exception] { folded(root) }
      assert(msgs(e).exists(_.contains("non-identical")), msgs(e).mkString(" | "))
    }
    // identical replays and distinct seqs still fold cleanly alongside
    // the new stamps (no false positives from the batch stats)
    withStore { root =>
      val day = Seq(("alpha", 3L), ("beta", 2L)).toDF("word", "freq")
      graft.text.TokenizerStore.appendCounts(day, root, seq = Some(7L))
      graft.text.TokenizerStore.appendCounts(day, root, seq = Some(7L))
      graft.text.TokenizerStore.appendCounts(
        Seq(("beta", 1L)).toDF("word", "freq"), root, seq = Some(8L))
      assert(folded(root) == Set(("alpha", 3L), ("beta", 3L)))
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
  test("tombstone-fraction compaction: a churn-heavy day folds the index tombstones away") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      land(root, "day1.json", (0 until 10).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-04-01", None, cfg)
      // day 2 re-lands 6 of 10 with NEW text: 6 tombstones vs ~10
      // curated (60% > the 20% default threshold) -> compaction fires
      land(root, "day2.json", (0 until 6).map(i => (i.toLong, "s0", doc(i + 50))))
      CurationRunner.runDaily(spark, root, "2024-04-02", None, cfg)
      assert(graft.dedup.LshDiskIndex.tombstoneCount(spark, s"$root/index/lsh") == 0L,
        "churn beyond the threshold must compact the LSH index")
      assert(graft.text.Bm25DiskIndex.tombstoneCount(spark, s"$root/index/bm25") == 0L,
        "churn beyond the threshold must compact the BM25 index")
      // the compacted indexes still serve exactly the curated corpus
      val c2 = graft.io.Lake.readParquet(spark, s"$root/curated/date=2024-04-02")
      val qs = Seq((0L, "quick brown fox document number 52")).toDF("query_id", "qtext")
      assert(graft.text.Bm25DiskIndex.probeTopK(
          spark, s"$root/index/bm25", qs, "query_id", "qtext", 5)
        .collect().map(_.toString).sorted.toSeq ==
        graft.text.Retrieval.bm25TopK(c2, "doc_id", "text", qs, "query_id", "qtext", 5)
        .collect().map(_.toString).sorted.toSeq,
        "compacted BM25 index must rank like a fresh index over the curated corpus")
      val planted = Seq((990L, doc(53) + " z")).toDF("doc_id", "text")
      assert(graft.dedup.LshDiskIndex.probe(
          spark, s"$root/index/lsh", planted, "doc_id", "text", 0.7)
        .where($"id_a" === 3L && $"id_b" === 990L).count() == 1,
        "compacted LSH index must hold the current live set")
    } finally { Lake.delete(spark, root) }
  }

  // the paired stage's media extractor: a doc carries media unless its
  // text says NOMEDIA; the image is undecodable when it says BADIMG;
  // the perceptual hash is the hash of the imgN marker, so same marker
  // -> identical hash (distance 0 — every dup cluster is a star, which
  // keeps first-wins == full-pass canonicalization exactly)
  private def mediaDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.where(!$"text".contains("NOMEDIA"))
      .select($"doc_id",
        when($"text".contains("BADIMG"), lit(0)).otherwise(lit(1)).as("img_ok"),
        xxhash64(regexp_extract($"text", "img([0-9]+)", 1)).as("phash"))

  test("paired curation: two paired days == one full paired pass over the union") {
    val cfg = Curation.CurationConfig(minQualityMilli = 200)
    val pcfg = CurationRunner.PairedConfig(media = mediaDocs)
    val ixCfg = CurationRunner.IndexConfig(phashBuckets = 4)
    // day-2 ids exceed day-1 ids — the crawl-day invariant first-wins
    // composition relies on (ids grow with time)
    val day1 = Seq(
      (0L, "s0", doc(0, "img7000")),
      (1L, "s0", doc(1, "img7001")),
      (2L, "s0", doc(2, "img7001")), // image dup of 1 (same day, larger id)
      (3L, "s0", doc(3, "BADIMG")), // undecodable
      (4L, "s0", doc(4, "img7004")),
      (5L, "s0", doc(5, "NOMEDIA"))) // caption-only: passes untouched
    val day2 = Seq(
      (20L, "s0", doc(20, "img7001")), // image dup of STANDING 1
      (21L, "s0", doc(21, "img7021")),
      (22L, "s0", doc(22, "img7021")), // image dup of smaller DELTA 21
      (23L, "s0", doc(23, "BADIMG")), // undecodable
      (24L, "s0", doc(24, "img7024")),
      (4L, "s0", doc(400, "img7044")), // changed: old hash retires, new appends
      (25L, "s0", doc(25, "NOMEDIA")))

    val rootA = java.nio.file.Files.createTempDirectory("lakeA").toString
    val rootB = java.nio.file.Files.createTempDirectory("lakeB").toString
    try {
      // lake A: two paired days
      land(rootA, "day1.json", day1)
      val r1 = CurationRunner.runDaily(spark, rootA, "2024-07-01", None, cfg,
        indexes = Some(ixCfg), paired = Some(pcfg))
      assert(r1.pairedDropped == 2, s"day1 drops 2 and 3: $r1")
      val c1 = Lake.readParquet(spark, s"$rootA/curated/date=2024-07-01")
      assert(c1.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(0L, 1L, 4L, 5L))
      // the media family was DERIVED from the paired extractor
      assert(Lake.exists(spark, s"$rootA/index/phash/meta"),
        "paired with no phash family must derive one from media")

      land(rootA, "day2.json", day2)
      val r2 = CurationRunner.runDaily(spark, rootA, "2024-07-02", None, cfg,
        indexes = Some(ixCfg), paired = Some(pcfg))
      assert(r2.pairedDropped == 3, s"day2 drops 20, 22, 23: $r2")
      val c2 = Lake.readParquet(spark, s"$rootA/curated/date=2024-07-02")
      assert(c2.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(0L, 1L, 4L, 5L, 21L, 24L, 25L))
      assert(c2.where($"doc_id" === 4L).select($"text").head().getString(0)
        .contains("number 400"), "changed doc carries its new text+image")

      // drop reasons land in RunMetadata as their own stage rows
      val m2 = RunMetadata.read(spark, rootA, "2024-07-02")
      def stageRecords(stage: String): Long =
        m2.where($"stage" === stage).select($"records").as[Long].head()
      assert(stageRecords("paired") == 3L)
      assert(stageRecords("paired_drop:image_undecodable") == 1L) // 23
      assert(stageRecords("paired_drop:image_dup") == 2L) // 20, 22

      // composition law: lake B lands the UNION (final text per doc_id)
      // in ONE paired day — membership and texts must match lake A's
      // day 2 exactly
      land(rootB, "all.json", day1.filterNot(_._1 == 4L) ++ day2)
      CurationRunner.runDaily(spark, rootB, "2024-07-01", None, cfg,
        indexes = Some(ixCfg), paired = Some(pcfg))
      val full = Lake.readParquet(spark, s"$rootB/curated/date=2024-07-01")
      assert(c2.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
        full.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq,
        "two paired days must equal one paired pass over the union")

      // the maintained media family's live set == the published corpus's
      // media: a planted copy of a kept image must probe-match it, a
      // dropped image's hash must be gone
      val probe = Seq((9000L, 1L), (9001L, 1L)).toDF("doc_id", "x")
        .select($"doc_id",
          xxhash64(when($"doc_id" === 9000L, lit("7021")).otherwise(lit("7001")))
            .as("phash"))
      val hits = graft.dedup.PhashDiskIndex.probe(spark, s"$rootA/index/phash",
        probe, "doc_id", "phash", 0)
      assert(hits.where($"id_a" === 21L && $"id_b" === 9000L).count() == 1)
      assert(hits.where($"id_a" === 20L || $"id_a" === 22L).isEmpty,
        "dropped images must not be standing")

      // an already-applied re-run takes the fallback (re-band) path and
      // must land the identical corpus (materialize the baseline rows
      // BEFORE the re-run overwrites the files c2's lazy plan reads)
      val c2Rows = c2.select($"doc_id", $"text").collect()
        .map(_.toString).sorted.toSeq
      CurationRunner.runDaily(spark, rootA, "2024-07-02", None, cfg,
        indexes = Some(ixCfg), paired = Some(pcfg))
      val c2b = Lake.readParquet(spark, s"$rootA/curated/date=2024-07-02")
      assert(c2b.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
        c2Rows,
        "re-running an applied date must be idempotent through the fallback path")
    } finally { Lake.delete(spark, rootA); Lake.delete(spark, rootB) }
  }

  // the clip stage's frames extractor: a doc carries video when its
  // text names the content (vidN) and the wrapper (AWEBP / GIFW /
  // default MJPEG-MP4 — the q170 container set); the payload REALLY
  // encodes under that container and REALLY decodes back — same vid ->
  // same frame pixels -> identical hashes across all three wrappers
  // (the q170 property, exercised end-to-end).
  // vid 49 rides the animated-WebP corpus's %11==5 plant (animation
  // flag off), so its doc carries video with ZERO decodable frames.
  private def clipFrames(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tagged = docs.where($"text".rlike("vid[0-9]+"))
      .select($"doc_id",
        regexp_extract($"text", "vid([0-9]+)", 1).cast("long").as("vid"),
        when($"text".contains("AWEBP"), "awebp")
          .when($"text".contains("GIFW"), "gif")
          .when($"text".contains("AVCW"), "avc")
          .otherwise("mp4").as("wrap"))
    val mp4 = graft.multimodal.Multimodal.decodeMp4FramePHash(
        graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(
          tagged.where($"wrap" === "mp4").select($"vid".as("doc_id")).distinct())).toDF()
      .select($"media_id".as("vid"), lit("mp4").as("wrap"),
        $"ok".as("clip_ok"), $"frame_idx", $"phash")
    val webp = graft.multimodal.Webp.decodeAnimPHash(
        graft.multimodal.Webp.animWebpCorpusFromDocuments(
          tagged.where($"wrap" === "awebp").select($"vid".as("doc_id")).distinct())).toDF()
      .select($"media_id".as("vid"), lit("awebp").as("wrap"),
        $"ok".as("clip_ok"), $"frame_idx", $"phash")
    val gif = graft.multimodal.Gif.decodeGifPHash(
        graft.multimodal.Gif.gifCorpusFromDocuments(
          tagged.where($"wrap" === "gif").select($"vid".as("doc_id")).distinct(),
          sampleMod = 1, sampleRem = 0)).toDF()
      .select($"media_id".as("vid"), lit("gif").as("wrap"),
        $"ok".as("clip_ok"), $"frame_idx", $"phash")
    val avc = graft.multimodal.H264Decode.decodeAvcFramePHash(
        graft.multimodal.H264Decode.avcClipCorpusFromDocuments(
          tagged.where($"wrap" === "avc").select($"vid".as("doc_id")).distinct())).toDF()
      .select($"media_id".as("vid"), lit("avc").as("wrap"),
        $"ok".as("clip_ok"), $"frame_idx", $"phash")
    tagged.join(mp4.unionByName(webp).unionByName(gif).unionByName(avc),
        Seq("vid", "wrap"))
      .select($"doc_id", $"clip_ok", $"frame_idx", $"phash")
  }

  test("clip dedup: a re-encoded clip drops across days AND wrappers (two days == one pass)") {
    val cfg = Curation.CurationConfig(minQualityMilli = 200)
    val ccfg = CurationRunner.ClipConfig(frames = clipFrames)
    val ixCfg = CurationRunner.IndexConfig(clipBuckets = 4)
    // the corpus pixel formula's content key is (5*pseed + 12*f) mod
    // 17 (pseed = vid%10), so DIFFERENT pseeds can alias frame
    // content; vids 360/444/408 (pseeds 0/4/8, all 3-frame) have
    // provably disjoint key sets {0,12,7}/{3,15,10}/{6,1,13} — zero
    // cross-class frame collisions. Plant mods stay clean (%6 != 4
    // frame plant; awebp %11 != 5 except vid 49, the undecodable arm)
    val day1 = Seq(
      (1L, "s0", doc(1, "vid360")),
      (2L, "s0", doc(2, "vid360")), // same-day clip dup of 1 (same wrapper)
      (3L, "s0", doc(3, "vid49 AWEBP")), // zero decodable frames
      (4L, "s0", doc(4, "vid444 AWEBP")),
      (5L, "s0", doc(5, "NOVID"))) // caption-only: passes untouched
    val day2 = Seq(
      (20L, "s0", doc(20, "vid360 AWEBP")), // STANDING 1's clip, RE-ENCODED
      (21L, "s0", doc(21, "vid408")),
      (22L, "s0", doc(22, "vid408 AWEBP")), // smaller DELTA 21, re-encoded
      (23L, "s0", doc(23, "vid49 AWEBP")), // undecodable
      (4L, "s0", doc(400, "vid444")), // changed: same content, wrapper switch —
        // its OLD fids must retire BEFORE the probe or it dups itself
      (24L, "s0", doc(24, "NOVID")))

    val rootA = java.nio.file.Files.createTempDirectory("lakeA").toString
    val rootB = java.nio.file.Files.createTempDirectory("lakeB").toString
    try {
      land(rootA, "day1.json", day1)
      val r1 = CurationRunner.runDaily(spark, rootA, "2024-08-01", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r1.clipDropped == 2, s"day1 drops 2 and 3: $r1")
      val c1 = Lake.readParquet(spark, s"$rootA/curated/date=2024-08-01")
      assert(c1.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 4L, 5L))
      // the clip family was DERIVED from the stage's extractor
      assert(Lake.exists(spark, s"$rootA/index/clip/meta"),
        "clips with no clip family must derive one from frames")

      land(rootA, "day2.json", day2)
      val r2 = CurationRunner.runDaily(spark, rootA, "2024-08-02", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r2.clipDropped == 3, s"day2 drops 20, 22, 23: $r2")
      val c2 = Lake.readParquet(spark, s"$rootA/curated/date=2024-08-02")
      assert(c2.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 4L, 5L, 21L, 24L))

      val m2 = RunMetadata.read(spark, rootA, "2024-08-02")
      def stageRecords(stage: String): Long =
        m2.where($"stage" === stage).select($"records").as[Long].head()
      assert(stageRecords("clips") == 3L)
      assert(stageRecords("clip_drop:video_undecodable") == 1L) // 23
      assert(stageRecords("clip_drop:video_dup") == 2L) // 20, 22

      // composition law: the union in ONE day must land the same corpus
      land(rootB, "all.json", day1.filterNot(_._1 == 4L) ++ day2)
      CurationRunner.runDaily(spark, rootB, "2024-08-01", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      val full = Lake.readParquet(spark, s"$rootB/curated/date=2024-08-01")
      assert(c2.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
        full.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq,
        "two clip days must equal one clip pass over the union")

      // the maintained family's live set == the published corpus's
      // frames: a planted copy of kept clip 21's frame 0 probe-matches
      // its fid; dropped clips 20/22 must be gone
      val f408 = graft.multimodal.Multimodal.decodeMp4FramePHash(
          graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(
            Seq(408L).toDF("doc_id"))).toDF()
        .where($"frame_idx" === 0).select($"phash").as[Long].head()
      val probe = Seq((9000L << 12, f408)).toDF("id", "phash")
      val hits = graft.dedup.PhashDiskIndex.probe(spark,
        s"$rootA/index/clip", probe, "id", "phash", 0)
      assert(hits.where($"id_a" === (21L << 12) &&
        $"id_b" === (9000L << 12)).count() == 1,
        "kept clip 21's frame 0 must be standing")
      assert(hits.where(org.apache.spark.sql.functions
          .shiftright($"id_a", 12).isin(20L, 22L)).isEmpty,
        "dropped clips' frames must not be standing")

      // an already-applied re-run takes the fallback (re-band) path
      val c2Rows = c2.select($"doc_id", $"text").collect()
        .map(_.toString).sorted.toSeq
      CurationRunner.runDaily(spark, rootA, "2024-08-02", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      val c2b = Lake.readParquet(spark, s"$rootA/curated/date=2024-08-02")
      assert(c2b.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
        c2Rows,
        "re-running an applied date must be idempotent through the fallback path")
    } finally { Lake.delete(spark, rootA); Lake.delete(spark, rootB) }
  }

  test("gif clips: GIF day 1, re-encodes day 2 dedup across all three wrappers") {
    // the q170 third wrapper through the DAILY loop: a clip standing as
    // a GIF drops its later MP4 re-encode, and a standing MP4 drops its
    // later GIF re-encode — the frame hashes are container-independent.
    // vids 360/444/408 (pseeds 0/4/8, 3-frame): disjoint content keys
    // {0,12,7}/{3,15,10}/{6,1,13}, clean of every wrapper's plant mods
    // (GIF: %11!=5, %13!=6, %6!=4; MP4/AWEBP verified by the test above)
    val cfg = Curation.CurationConfig(minQualityMilli = 200)
    val ccfg = CurationRunner.ClipConfig(frames = clipFrames)
    val ixCfg = CurationRunner.IndexConfig(clipBuckets = 4)
    val root = java.nio.file.Files.createTempDirectory("lakeG").toString
    try {
      land(root, "day1.json", Seq(
        (1L, "s0", doc(1, "vid360 GIFW")), // standing GIF clip
        (2L, "s0", doc(2, "vid444")), // standing MP4 clip
        (3L, "s0", doc(3, "NOVID"))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-10-01", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r1.clipDropped == 0, s"day1 keeps everything: $r1")

      land(root, "day2.json", Seq(
        (20L, "s0", doc(20, "vid360")), // MP4 re-encode of the GIF -> dup
        (21L, "s0", doc(21, "vid444 GIFW")), // GIF re-encode of the MP4 -> dup
        (22L, "s0", doc(22, "vid408 GIFW")))) // new content -> keep
      val r2 = CurationRunner.runDaily(spark, root, "2024-10-02", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r2.clipDropped == 2, s"day2 drops 20 and 21: $r2")
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-10-02")
      assert(c2.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 22L))

      // the kept GIF clip's frames joined the standing family
      val f408 = graft.multimodal.Gif.decodeGifPHash(
          graft.multimodal.Gif.gifCorpusFromDocuments(
            Seq(408L).toDF("doc_id"), sampleMod = 1, sampleRem = 0)).toDF()
        .where($"frame_idx" === 0).select($"phash").as[Long].head()
      val hits = graft.dedup.PhashDiskIndex.probe(spark,
        s"$root/index/clip", Seq((9000L << 12, f408)).toDF("id", "phash"),
        "id", "phash", 0)
      assert(hits.where($"id_a" === (22L << 12)).count() == 1,
        "kept GIF clip 22's frame 0 must be standing")
    } finally { Lake.delete(spark, root) }
  }

  test("avc clips: H.264 is the FOURTH wrapper — re-encodes dedup against standing MJPEG and back") {
    // the q209 cross-CODEC claim through the DAILY loop: a clip
    // standing as MJPEG drops its later H.264 re-encode (a REAL
    // intra decode, not a container walk), and a standing H.264 clip
    // drops its MJPEG re-encode. vids 360/444/408 as in the wrapper
    // tests (disjoint content keys; %6 != 4, so no corrupted-frame
    // plants fire)
    val cfg = Curation.CurationConfig(minQualityMilli = 200)
    val ccfg = CurationRunner.ClipConfig(frames = clipFrames)
    val ixCfg = CurationRunner.IndexConfig(clipBuckets = 4)
    val root = java.nio.file.Files.createTempDirectory("lakeH").toString
    try {
      land(root, "day1.json", Seq(
        (1L, "s0", doc(1, "vid360")), // standing MJPEG clip
        (2L, "s0", doc(2, "vid444 AVCW")), // standing H.264 clip
        (3L, "s0", doc(3, "NOVID"))))
      val r1 = CurationRunner.runDaily(spark, root, "2024-11-01", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r1.clipDropped == 0, s"day1 keeps everything: $r1")

      land(root, "day2.json", Seq(
        (20L, "s0", doc(20, "vid360 AVCW")), // H.264 re-encode -> dup
        (21L, "s0", doc(21, "vid444")), // MJPEG re-encode of the AVC -> dup
        (22L, "s0", doc(22, "vid408 AVCW")))) // new content -> keep
      val r2 = CurationRunner.runDaily(spark, root, "2024-11-02", None, cfg,
        indexes = Some(ixCfg), clips = Some(ccfg))
      assert(r2.clipDropped == 2, s"day2 drops 20 and 21: $r2")
      val c2 = Lake.readParquet(spark, s"$root/curated/date=2024-11-02")
      assert(c2.select($"doc_id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 22L))

      // the kept H.264 clip's frames joined the standing family
      val f408 = graft.multimodal.H264Decode.decodeAvcFramePHash(
          graft.multimodal.H264Decode.avcClipCorpusFromDocuments(
            Seq(408L).toDF("doc_id"))).toDF()
        .where($"frame_idx" === 0).select($"phash").as[Long].head()
      val hits = graft.dedup.PhashDiskIndex.probe(spark,
        s"$root/index/clip", Seq((9000L << 12, f408)).toDF("id", "phash"),
        "id", "phash", 0)
      assert(hits.where($"id_a" === (22L << 12)).count() == 1,
        "kept H.264 clip 22's frame 0 must be standing")
    } finally { Lake.delete(spark, root) }
  }

  test("audio-maintained family: backfill, retire+append track the curated corpus, compaction") {
    // the phash-family discipline over AudioFp fingerprints (the q200
    // hash-generic proof running INSIDE the daily loop); fingerprints
    // derive deterministically from each doc's text so retire/append
    // track content changes
    def audioDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs.select($"doc_id", xxhash64($"text", lit("afp")).as("fp"))
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      val ixCfg = CurationRunner.IndexConfig(audio = Some(audioDocs),
        audioBuckets = 4)
      val auDir = s"$root/index/audio"
      def parity(date: String): Unit = {
        val cur = Lake.readParquet(spark, s"$root/curated/date=$date")
        val probe = audioDocs(cur).select(($"doc_id" + 1000L).as("doc_id"),
          $"fp".bitwiseXOR(1L).as("fp"))
        val freshDir = java.nio.file.Files.createTempDirectory("au-fresh").toString
        graft.dedup.PhashDiskIndex.write(audioDocs(cur), "doc_id", "fp",
          freshDir, numBuckets = 4)
        val got = graft.dedup.PhashDiskIndex.probe(spark, auDir, probe,
          "doc_id", "fp", 3).collect().map(_.toString).sorted.toSeq
        val want = graft.dedup.PhashDiskIndex.probe(spark, freshDir, probe,
          "doc_id", "fp", 3).collect().map(_.toString).sorted.toSeq
        Lake.delete(spark, freshDir)
        assert(got.nonEmpty, "parity probe must produce matches")
        assert(got == want,
          s"$date: maintained-index probes must equal fresh-index probes")
      }
      land(root, "day1.json", (0 until 8).map(i => (i.toLong, "s0", doc(i))))
      CurationRunner.runDaily(spark, root, "2024-06-01", None, cfg)
      assert(!Lake.exists(spark, s"$auDir/meta"))
      land(root, "day2.json", Seq(
        (20L, "s0", doc(20)), (3L, "s0", doc(300))))
      CurationRunner.runDaily(spark, root, "2024-06-02", None, cfg,
        indexes = Some(ixCfg))
      assert(Lake.exists(spark, s"$auDir/meta"))
      parity("2024-06-02")
      land(root, "day3.json", (0 until 5).map(i => (i.toLong, "s0", doc(i + 70))))
      CurationRunner.runDaily(spark, root, "2024-06-03", None, cfg,
        indexes = Some(ixCfg))
      assert(graft.dedup.PhashDiskIndex.tombstoneCount(spark, auDir) == 0L,
        "churn past the threshold must compact the audio family")
      parity("2024-06-03")
    } finally { Lake.delete(spark, root) }
  }

  test("robots gate: the day's rules drop disallowed docs — retroactively too") {
    val root = java.nio.file.Files.createTempDirectory("lake").toString
    try {
      val cfg = Curation.CurationConfig(minQualityMilli = 200)
      land(root, "day1.json", Seq(
        (1L, "open.example", doc(1)),
        (2L, "closed.example", doc(2)),
        (3L, "mixed.example", doc(3)),
        (4L, "mixed.example", doc(4))))
      // day 1: no robots config — everything lands (compat default)
      val r1 = CurationRunner.runDaily(spark, root, "2024-08-01", None, cfg)
      assert(r1.snapshotDocs == 4 && r1.robotsDropped == -1L)

      // day 2: robots arrive. closed.example disallows everything;
      // mixed.example disallows only /private/*; open.example has no
      // robots row (allowed, the RFC default). Doc 3 sits under
      // /private, doc 4 under /public — path rules via the urls frame.
      val robots = Seq(
        ("closed.example", "User-agent: *\nDisallow: /"),
        ("mixed.example", "User-agent: *\nDisallow: /private/"))
        .toDF("source", "robots_txt")
      val urls = Seq(
        (3L, "http://mixed.example/private/a?x=1"),
        (4L, "http://mixed.example/public/b"))
        .toDF("doc_id", "url")
      land(root, "day2.json", Seq((5L, "open.example", doc(5))))
      val r2 = CurationRunner.runDaily(spark, root, "2024-08-02", None, cfg,
        robots = Some(CurationRunner.RobotsConfig(robots, urls = Some(urls))))
      // doc 2 (domain kill) and doc 3 (path rule) drop — RETROACTIVELY:
      // both landed yesterday; today's rules re-gate the folded corpus
      assert(r2.robotsDropped == 2L, s"$r2")
      assert(r2.snapshotDocs == 3, s"$r2")
      val snap = Lake.readParquet(spark, s"$root/snapshot/date=2024-08-02")
      assert(snap.select($"doc_id").as[Long].collect().toSet == Set(1L, 4L, 5L))
      val cur = Lake.readParquet(spark, s"$root/curated/date=2024-08-02")
      assert(cur.where($"doc_id" === 2L).isEmpty &&
        cur.where($"doc_id" === 3L).isEmpty)
      assert(cur.where($"doc_id" === 4L).count() == 1,
        "an allowed path on a partially-closed domain must survive")
      // the drop count lands as a RunMetadata stage metric
      val md = RunMetadata.read(spark, root, "2024-08-02")
      assert(md.where($"stage" === "robots_gate")
        .select($"records").as[Long].head() == 2L)
    } finally { Lake.delete(spark, root) }
  }

}
