package graft.ann

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

/** IVF-PQ: the residual decomposition, the probed-cell ADC bound, the
  * persisted index's parity with the fresh path, the lifecycle
  * (append / retire / compact / refresh), and bucket pruning. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.queries.Queries
    .tbl(spark, "/root/testdata/sf0.001", "embeddings")

  private def cents = corpus.where(pmod($"vec_id", lit(16)) === 0)
    .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))

  private def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("residuals decompose exactly: centroid + residual == vector") {
    // reconstruct per element and take the max abs error: float → double
    // widening and one IEEE subtraction are exact, so r + c == x exactly
    val err = IvfPq.residuals(corpus, "vec_id", "embedding", cents)
      .join(broadcast(cents), col("cell") === col("cid"))
      .join(corpus.select($"vec_id", $"embedding"), Seq("vec_id"))
      .select(aggregate(
        zip_with(zip_with($"rvec", $"cvec", (r, c) => r + c.cast("double")),
          $"embedding", (s, e) => abs(s - e.cast("double"))),
        lit(0.0), (a, v) => greatest(a, v)).as("maxerr"))
      .agg(max($"maxerr")).head().getDouble(0)
    assert(err == 0.0, s"residual + centroid must equal the vector exactly: $err")
  }

  test("one-pass packed encode == relational encode+pack (r15 opt)") {
    val cb = IvfPq.trainCodebooks(corpus, "vec_id", "embedding", cents,
      m = 8, dim = 64)
    // weird rows ride along: a null element, a whole-null vector, a
    // short vector, and a null id (which the relational cell re-join
    // drops) — the kernel must fall back identically on every one
    val rows = Seq(
      org.apache.spark.sql.Row(9000L,
        (0 until 64).map(i => if (i == 17) null
          else java.lang.Float.valueOf(0.3f + i * 0.01f))),
      org.apache.spark.sql.Row(9001L, null),
      org.apache.spark.sql.Row(9002L,
        (0 until 20).map(i => java.lang.Float.valueOf(0.1f * i))),
      org.apache.spark.sql.Row(null,
        (0 until 64).map(i => java.lang.Float.valueOf(0.2f))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val weird = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val src = corpus.select($"vec_id".cast("long").as("vec_id"), $"embedding")
      .unionByName(weird)
    val packed = IvfPq.encodePacked(src, "vec_id", "embedding", cents, cb,
        8, 64)
      .collect().map(_.toString).sorted.toSeq
    val ref = IvfPqIndex.packCodes(
        IvfPq.encode(src, "vec_id", "embedding", cents, cb, 8, 64))
      .collect().map(_.toString).sorted.toSeq
    assert(packed.nonEmpty && packed == ref,
      "the fused packed-encode kernel must replay the relational chain exactly")
  }

  test("candidates are bounded by the probed cells (never the corpus)") {
    val cb = IvfPq.trainCodebooks(corpus, "vec_id", "embedding", cents,
      m = 8, dim = 64)
    val codes = IvfPq.encode(corpus, "vec_id", "embedding", cents, cb, 8, 64)
    val queries = corpus.where($"vec_id" < 3)
    val scores = IvfPq.adcProbeScores(queries, codes, cents, cb,
      "vec_id", "embedding", 8, 64, nProbe = 2)
    // every scored candidate's cell is one of the query's 2 probed cells
    val probes = Ann.ivfProbes(queries, cents, "vec_id", "embedding", 2)
      .select($"query_id", $"cell").as[(Long, Long)].collect().toSet
    val cellOf = codes.select($"vec_id", $"cell").distinct()
      .as[(Long, Long)].collect().toMap
    val offenders = scores.select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
      .filterNot { case (q, n) => probes.contains((q, cellOf(n))) }
    assert(offenders.isEmpty, s"candidates outside probed cells: ${offenders.take(5).toSeq}")
    // and the candidate count is well under |Q| x |corpus|
    assert(scores.count() < 3L * corpus.count())
  }

  test("persisted probe == fresh probe; rerank ladder too; only probed buckets read") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    try {
      val cb = IvfPq.trainCodebooks(corpus, "vec_id", "embedding", cents,
        m = 8, dim = 64)
      val codes = IvfPq.encode(corpus, "vec_id", "embedding", cents, cb, 8, 64)
      val queries = corpus.where($"vec_id" < 3)

      val fresh = asSet(IvfPq.probeTopK(queries, codes, cents, cb,
        "vec_id", "embedding", 8, 64, k = 10, nProbe = 2))
      assert(fresh.nonEmpty)

      IvfPqIndex.write(corpus, "vec_id", "embedding", cents, cb,
        m = 8, dim = 64, dir = dir, numBuckets = 8)
      val persisted = asSet(IvfPqIndex.probeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      assert(persisted == fresh, "persisted ADC probe must equal fresh probe")

      val freshLadder = asSet(IvfPq.probeRerankTopK(queries, codes, cents,
        cb, corpus, "vec_id", "embedding", 8, 64, k = 5, nProbe = 2, rerank = 20))
      val persistedLadder = asSet(IvfPqIndex.probeRerankTopK(spark, dir,
        queries, corpus, "vec_id", "embedding", k = 5, nProbe = 2, rerank = 20))
      assert(persistedLadder == freshLadder && freshLadder.nonEmpty)

      // bucket pruning engages: the pruned read opens fewer files
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
      val probeCells = Ann.ivfProbes(queries, cents, "vec_id", "embedding", 2)
        .select($"cell").distinct().collect().map(_.getLong(0)).toSeq
      val allFiles = filesScanned(IvfPqIndex.codes(spark, dir))
      val prunedFiles = filesScanned(IvfPqIndex.prunedCodes(spark, dir, probeCells))
      assert(prunedFiles > 0 && prunedFiles < allFiles,
        s"bucket pruning must cut the file read: $prunedFiles vs $allFiles")
    } finally Lake.delete(spark, dir)
  }

  test("lifecycle: append == one-shot; retire hides; compact folds; refresh retrains") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val dir3 = java.nio.file.Files.createTempDirectory("ivfpq").toString
    try {
      val standing = corpus.where(pmod($"vec_id", lit(3)) =!= 0)
      val delta = corpus.where(pmod($"vec_id", lit(3)) === 0)
      val cb = IvfPq.trainCodebooks(standing, "vec_id", "embedding", cents,
        m = 8, dim = 64)
      val queries = corpus.where($"vec_id" < 3)

      // append parity: standing + delta == one-shot over the union
      IvfPqIndex.write(standing, "vec_id", "embedding", cents, cb,
        8, 64, dir, numBuckets = 8)
      IvfPqIndex.append(delta, "vec_id", "embedding", dir, seq = 1L)
      IvfPqIndex.write(corpus, "vec_id", "embedding", cents, cb,
        8, 64, dir2, numBuckets = 8)
      val appended = asSet(IvfPqIndex.probeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      val oneShot = asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      assert(appended == oneShot && oneShot.nonEmpty)

      // retire: delta ids vanish from the probe set
      IvfPqIndex.retire(spark, dir, delta.select($"vec_id"), "vec_id", seq = 2L)
      assert(IvfPqIndex.tombstoneCount(spark, dir) == delta.count())
      val retired = asSet(IvfPqIndex.probeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      val deltaIds = delta.select($"vec_id").as[Long].collect().toSet
      assert(retired.forall { case (_, _, n, _) => !deltaIds.contains(n) })
      val standingOnly = asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      // dir2 still has delta rows; rebuild the comparison index fresh
      Lake.delete(spark, dir2)
      IvfPqIndex.write(standing, "vec_id", "embedding", cents, cb,
        8, 64, dir2, numBuckets = 8)
      assert(retired == asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2)))
      assert(standingOnly != null) // silence unused warning

      // compact: live rows fold into a new dir, probe unchanged
      intercept[IllegalArgumentException] {
        IvfPqIndex.compact(spark, dir, dir, seq = 3L)
      }
      IvfPqIndex.compact(spark, dir, dir3, seq = 3L)
      assert(IvfPqIndex.tombstoneCount(spark, dir3) == 0L)
      assert(asSet(IvfPqIndex.probeTopK(spark, dir3, queries,
        "vec_id", "embedding", k = 10, nProbe = 2)) == retired)

      // refresh: retrain from a supplied corpus, full contract at outDir
      Lake.delete(spark, dir2)
      IvfPqIndex.refresh(spark, dir3, corpus, "vec_id", "embedding",
        dir2, iters = 1)
      val refreshed = asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      assert(refreshed.nonEmpty)
      val refined = Ann.ivfRefineCentroids(corpus, "vec_id", "embedding",
        cents, 1)
      val cb2 = IvfPq.trainCodebooks(corpus, "vec_id", "embedding", refined,
        m = 8, dim = 64)
      val codes2 = IvfPq.encode(corpus, "vec_id", "embedding", refined,
        cb2, 8, 64)
      assert(refreshed == asSet(IvfPq.probeTopK(queries, codes2, refined,
        cb2, "vec_id", "embedding", 8, 64, k = 10, nProbe = 2)))
    } finally {
      Lake.delete(spark, dir); Lake.delete(spark, dir2); Lake.delete(spark, dir3)
    }
  }

  test("rotated index: persisted == fresh over the rotated view; flag rides the lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqrot").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpqrot").toString
    try {
      // artifacts trained in the ROTATED space (the write contract);
      // corpus/queries below stay in the ORIGINAL space throughout —
      // the index rotates internally at encode, append, and probe
      val rotCorpus = IvfPqIndex.rotatedView(corpus, "embedding", 64)
      val rotCents = rotCorpus.where(pmod($"vec_id", lit(16)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      val cb = IvfPq.trainCodebooks(rotCorpus, "vec_id", "embedding",
        rotCents, m = 8, dim = 64)
      val queries = corpus.where($"vec_id" < 3)

      IvfPqIndex.write(corpus.where(pmod($"vec_id", lit(2)) === 0),
        "vec_id", "embedding", rotCents, cb, 8, 64, dir,
        numBuckets = 8, seq = 1L, rotated = true)
      assert(IvfPqIndex.rotated(spark, dir))
      IvfPqIndex.append(corpus.where(pmod($"vec_id", lit(2)) === 1),
        "vec_id", "embedding", dir, seq = 2L)

      val persisted = asSet(IvfPqIndex.probeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      val rotQueries = IvfPqIndex.rotatedView(queries, "embedding", 64)
      val fresh = asSet(IvfPq.probeTopK(rotQueries,
        IvfPq.encode(rotCorpus, "vec_id", "embedding", rotCents, cb, 8, 64),
        rotCents, cb, "vec_id", "embedding", 8, 64, k = 10, nProbe = 2))
      assert(persisted == fresh && fresh.nonEmpty,
        "rotated persisted probe must equal the fresh rotated-space probe")

      // compact carries the flag and the probe set
      IvfPqIndex.compact(spark, dir, dir2, seq = 3L)
      assert(IvfPqIndex.rotated(spark, dir2))
      assert(asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2)) == persisted)

      // the rerank ladder: rotated proposals, ORIGINAL-space exact
      // rescore — the neighbor ids it serves must all come from the
      // original corpus and the ranks from original-space dots
      val ladder = IvfPqIndex.probeRerankTopK(spark, dir, queries,
        corpus, "vec_id", "embedding", k = 5, nProbe = 2, rerank = 20)
      assert(ladder.count() > 0)

      // refresh retrains in the rotated space and carries the flag
      Lake.delete(spark, dir2)
      IvfPqIndex.refresh(spark, dir, corpus, "vec_id", "embedding",
        dir2, iters = 1)
      assert(IvfPqIndex.rotated(spark, dir2))
      assert(asSet(IvfPqIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2)).nonEmpty)
    } finally {
      Lake.delete(spark, dir); Lake.delete(spark, dir2)
    }
  }
}
