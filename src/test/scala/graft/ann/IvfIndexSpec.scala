package graft.ann

import graft.SparkSpec
import graft.io.Lake
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.queries.Queries
    .tbl(spark, "/root/testdata/sf0.001", "embeddings")

  test("persisted-index probe == fresh probe, and only probe cells are read") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    try {
      val cents = corpus.where(pmod($"vec_id", lit(10)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      val queries = corpus.where($"vec_id" < 3)
      val k = 10; val nProbe = 2

      val fresh = Ann.ivfProbeTopK(queries,
          Ann.ivfAssign(corpus, "vec_id", "embedding", cents), cents,
          "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(fresh.nonEmpty)

      IvfIndex.write(corpus, "vec_id", "embedding", cents, dir)
      val persisted = IvfIndex.probeTopK(spark, dir, queries, "vec_id", "embedding", k, nProbe)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(persisted == fresh, "persisted-index probe must equal fresh probe")

      // partition pruning is real: count files ACTUALLY opened via the
      // executed scan's numFiles metric (inputFiles lists the base
      // relation and ignores filters)
      def filesScanned(df: org.apache.spark.sql.DataFrame): Long = {
        // execute THIS frame's own plan (df.count() would build and run
        // a separate aggregate plan, leaving these metrics untouched)
        df.queryExecution.toRdd.count()
        import org.apache.spark.sql.execution._
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
        scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
      }
      val nCells = IvfIndex.cells(spark, dir).select($"cell").distinct().count()
      val probedCells = queries.count() * nProbe // upper bound on distinct probe cells
      assert(nCells > probedCells,
        s"fixture degenerate: $nCells cells vs $probedCells probed — grow the corpus")
      val allFiles = filesScanned(IvfIndex.cells(spark, dir))
      val probeUnion = {
        // reconstruct the pruned frame the probe used
        val scored = queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec"))
          .crossJoin(broadcast(cents))
          .select($"query_id", $"cid", Ann.dot($"q_vec", $"cvec").as("d"))
        val pw = org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"d".desc, $"cid".asc)
        scored.withColumn("prn", row_number().over(pw)).where($"prn" <= nProbe)
          .select($"cid").distinct().collect().map(_.getLong(0))
      }
      assert(probeUnion.nonEmpty && probeUnion.length <= probedCells)
      val prunedFiles = filesScanned(IvfIndex.prunedCells(spark, dir, probeUnion.toSeq))
      assert(prunedFiles < allFiles,
        s"pruned read ($prunedFiles files) must open fewer than the full index ($allFiles)")
      assert(prunedFiles > 0)
    } finally {
      Lake.delete(spark, dir)
    }
  }

  test("refresh: warm-start retrain lands a contract-intact index, objective non-decreasing") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivf").toString
    try {
      val cents = corpus.where(pmod($"vec_id", lit(16)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      IvfIndex.write(corpus, "vec_id", "embedding", cents, dir)
      val objBefore = Ann.ivfObjective(corpus, "vec_id", "embedding",
        IvfIndex.centroids(spark, dir))

      intercept[IllegalArgumentException] {
        IvfIndex.refresh(spark, dir, dir, iters = 2) // in-place forbidden
      }
      intercept[IllegalArgumentException] {
        IvfIndex.refresh(spark, dir, dir + "/", iters = 2) // slash alias too
      }
      IvfIndex.refresh(spark, dir, dir2, iters = 2)

      val refined = IvfIndex.centroids(spark, dir2)
      val objAfter = Ann.ivfObjective(corpus, "vec_id", "embedding", refined)
      assert(objAfter >= objBefore - 1e-9,
        s"refresh must not degrade the objective: $objBefore -> $objAfter")

      // the refreshed index honors the full probe contract: persisted
      // probe == fresh probe against the refined centroids
      val queries = corpus.where($"vec_id" < 3)
      def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val fresh = asSet(Ann.ivfProbeTopK(queries,
        Ann.ivfAssign(corpus, "vec_id", "embedding", refined), refined,
        "vec_id", "embedding", k = 10, nProbe = 2))
      val persisted = asSet(IvfIndex.probeTopK(spark, dir2, queries,
        "vec_id", "embedding", k = 10, nProbe = 2))
      assert(persisted == fresh && fresh.nonEmpty)
      // and the standing index is untouched (versioned, not replaced)
      assert(asSet(IvfIndex.probeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 2)).nonEmpty)
    } finally {
      Lake.delete(spark, dir); Lake.delete(spark, dir2)
    }
  }
  test("append: vector delta under standing centroids == one-shot index; standing files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    try {
      val cents = corpus.where(pmod($"vec_id", lit(10)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      val standing = corpus.where(pmod($"vec_id", lit(3)) =!= 0)
      val delta = corpus.where(pmod($"vec_id", lit(3)) === 0)
      IvfIndex.write(standing, "vec_id", "embedding", cents, dir)
      val before = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getPath).toSet
      IvfIndex.append(delta, "vec_id", "embedding", dir)
      val after = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getPath).toSet
      assert(before.subsetOf(after) && after.size > before.size,
        "append must only ADD files to the standing layout")

      val oneShot = java.nio.file.Files.createTempDirectory("ivfone").toString
      try {
        IvfIndex.write(corpus, "vec_id", "embedding", cents, oneShot)
        val queries = corpus.where($"vec_id" < 4)
        def probe(d: String) =
          IvfIndex.probeTopK(spark, d, queries, "vec_id", "embedding", 10, 2)
            .collect().map(_.toString).sorted.toSeq
        assert(probe(dir) == probe(oneShot),
          "appended index must probe exactly like a one-shot build over the union")
      } finally { Lake.delete(spark, oneShot) }
    } finally { Lake.delete(spark, dir) }
  }

  test("retire/compact: tombstoned vectors leave probes; versioned compaction folds them") {
    val dir = java.nio.file.Files.createTempDirectory("ivfret").toString
    try {
      val cents = corpus.where(pmod($"vec_id", lit(10)) === 0)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cvec"))
      IvfIndex.write(corpus, "vec_id", "embedding", cents, dir, seq = 1L)
      val queries = corpus.where($"vec_id" < 3)
      def probe(d: String) =
        IvfIndex.probeTopK(spark, d, queries, "vec_id", "embedding", 10, 2)
          .collect().map(_.toString).sorted.toSeq
      val full = probe(dir)
      // retire a slice that currently appears among the neighbors
      val dead = corpus.where(pmod($"vec_id", lit(7)) === 2)
      IvfIndex.retire(spark, dir, dead.select($"vec_id"), "vec_id", seq = 2L)
      val afterRetire = probe(dir)
      assert(afterRetire != full, "fixture must actually change the neighbor set")
      // parity: probes == a fresh index over the live vectors
      val live = corpus.where(pmod($"vec_id", lit(7)) =!= 2)
      val fresh = java.nio.file.Files.createTempDirectory("ivffresh").toString
      try {
        IvfIndex.write(live, "vec_id", "embedding", cents, fresh)
        assert(afterRetire == probe(fresh),
          "retired index must probe exactly like a fresh index over the live set")
      } finally { Lake.delete(spark, fresh) }
      // a re-embedded id: retire + re-append at one seq -> new vector live
      val reemb = corpus.where($"vec_id" === 5L)
      IvfIndex.retire(spark, dir, reemb.select($"vec_id"), "vec_id", seq = 3L)
      IvfIndex.append(reemb, "vec_id", "embedding", dir, seq = 3L)
      assert(IvfIndex.cells(spark, dir).where($"id" === 5L).count() == 1,
        "re-append at the tombstone seq must leave exactly one live row")
      // versioned compaction: in-place rejected, landed-beside identical
      intercept[IllegalArgumentException] {
        IvfIndex.compact(spark, dir, dir + "/", seq = 4L)
      }
      val out = java.nio.file.Files.createTempDirectory("ivfcomp").toString + "/v2"
      val before = probe(dir)
      IvfIndex.compact(spark, dir, out, seq = 4L)
      assert(IvfIndex.tombstoneCount(spark, out) == 0L)
      assert(probe(out) == before, "compaction must not change any probe result")
      assert(IvfIndex.cells(spark, out).count() == IvfIndex.cells(spark, dir).count())
    } finally { Lake.delete(spark, dir) }
  }

}
