package graft.ann

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  * Two paths:
  *   - brute force: exact top-k via cross join + per-query window — the
  *     correctness baseline, O(|Q|·|C|·d). Fine when |Q| is small (query
  *     batches) because the corpus side streams through executors.
  *   - LSH-bucketed: deterministic random-hyperplane signs compress each
  *     vector to a b-bit bucket id; candidate generation becomes an
  *     equi-join on bucket (hash shuffle, no cross product). The scale
  *     path for corpus×corpus near-dup at 100 TB.
  *
  * Dot products accumulate left-to-right in double precision so external
  * engines (and the DuckDB oracle) can reproduce them bit-exactly.
  */
object Ann {

  /** Sequential-accumulation dot product of two float arrays — a custom
    * codegen'd Catalyst expression (see FloatVectorDot); bit-identical to
    * the interpreted higher-order form but fused into whole-stage
    * codegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatVectorDot.vecDot(a, b)

  /** The higher-order-function formulation, kept as the reference
    * implementation for the parity spec (and for engines without the
    * custom expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2NormSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(l2NormSq(a)) * sqrt(l2NormSq(b)))

  /** Exact cosine-similarity near-duplicate pairs above `threshold`
    * (embeddings assumed L2-normalized → dot = cosine), all pairs. Use
    * only block-bounded or at small |corpus|; the LSH path below is the
    * scale variant. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val parts = emb.sparkSession.sessionState.conf.numShufflePartitions
    // A small parquet file arrives as ONE partition; without an explicit
    // repartition the nested-loop join would run the whole O(n²) scan on
    // a single core. Repartition the streamed side, broadcast the other.
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
      .repartition(parts)
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(broadcast(b)).where(col("id_a") < col("id_b"))
      .withColumn("cos",
        // fenced: keeps the threshold filter referencing the computed
        // attribute instead of a second inlined dot product (functions.Fence)
        graft.functions.Fence.fence(round(dot(col("v_a"), col("v_b")), 3)))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Exact brute-force top-k neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    // Stream the (repartitioned) corpus, broadcast the small query batch:
    // every core scores a corpus slice against all queries.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .repartition(parts)
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random ±1 hyperplane weights (no RNG state —
    * reproducible across engines and resumes; private[graft] so the q30
    * DuckDB oracle is generated from the same constants). */
  private[graft] def planeWeights(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { j =>
      (0 until dim).map { i =>
        // splitmix-style bit mix of (i, j)
        var z = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
        z ^= z >>> 31; z *= 0x94D049BB133111EBL; z ^= z >>> 27
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** b-bit random-hyperplane bucket id for each vector; `planeOffset`
    * selects a disjoint plane set per hash table. */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val planes = planeWeights(planeOffset + numPlanes, dim).drop(planeOffset)
    val bits = planes.map { w =>
      val wLit = array(w.map(x => lit(x.toFloat)): _*) // ±1: exact as float
      when(dot(vec, wLit) >= 0, 1L).otherwise(0L)
    }
    bits.foldLeft(lit(0L))((acc, bit) => acc * 2 + bit)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` coordinates:
    * p_j = v · s_j over fixed ±1 sign vectors from the same
    * deterministic generator as the LSH tables ([[planeWeights]] —
    * a dense Achlioptas/JL projection). Pairwise inner products and
    * distances are preserved in expectation with O(ln n / ε²) output
    * dims; callers wanting the variance-normalized form divide by
    * √outDim (omitted here so every coordinate stays a plain
    * sequential-accumulation dot both engines reproduce bit-exactly —
    * the q30 plane discipline).
    *
    * This is the 100 TB pre-shrink for the ANN family: project once,
    * write the narrow column, and run the IVF/LSH/brute paths on
    * dim/outDim× less vector payload per scan, shuffle, and index.
    * Entirely expression-level — no shuffle, no UDF, codegen'd dots
    * ([[graft.functions.FloatVectorDot]]).
    *
    * `planeOffset` selects a disjoint sign-vector set (e.g. to draw an
    * independent projection for a second index or a distortion A/B). */
  def randomProject(vec: Column, outDim: Int, dim: Int,
      planeOffset: Int = 0): Column = {
    require(outDim >= 1, s"randomProject: outDim must be >= 1: $outDim")
    val planes = planeWeights(planeOffset + outDim, dim).drop(planeOffset)
    array(planes.map { w =>
      dot(vec, array(w.map(x => lit(x.toFloat)): _*))
    }: _*)
  }

  /** Projected-rescore top-k — the JL pre-shrink ANN path: the coarse
    * scan runs over [[randomProject]]ed vectors (dim/outDim× less
    * payload than the fp32 corpus; at scale the projected column is
    * the persisted index artifact and this stage reads ONLY it), then
    * exact fp32 rescoring of the `rerank` survivors restores the final
    * top-k. Output precision is exact — only recall is approximate
    * (AnnSpec measures it against brute force). Same two-stage shape
    * as Quantize.quantizedTopK; the coarse scores are
    * sequential-accumulation doubles over bit-exact projected
    * coordinates, so the candidate cut is engine-reproducible and the
    * whole pipeline carries a full SQL oracle (q110).
    *
    * SHUFFLE DISCIPLINE: the (small) query batch broadcasts at both
    * stages; candidates travel as bare (query_id, neighbor_id); the
    * fp32 rescore is a shuffle equi-join of the candidates against the
    * corpus vector column (one pass over it) whose OUTPUT is bounded to
    * |Q|·rerank rows — only the bare candidate ids and the surviving
    * vectors ever ride an exchange. */
  def projectedRescoreTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, rerank: Int, outDim: Int,
      dim: Int, planeOffset: Int = 0): DataFrame = {
    require(k > 0 && rerank >= k, s"need rerank >= k > 0, got k=$k rerank=$rerank")
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    def projected(df: DataFrame, outId: String, outVec: String) =
      df.select(col(idCol).as(outId),
        randomProject(col(vecCol), outDim, dim, planeOffset).as(outVec))
    val cIdx = projected(corpus, "neighbor_id", "cp").repartition(parts)
    val qIdx = projected(queries, "query_id", "qp")
    // double-list dot (the projected coords are doubles): same
    // sequential left fold as FloatVectorDot / the DuckDB list_reduce,
    // fused into whole-stage codegen
    val pdot = graft.functions.DoubleVectorOps.dot(col("cp"), col("qp"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id").asc)
    // two-level selection (TopK): per-partition bounded heap before the
    // window, so its input is numPartitions × |Q| × rerank, not n
    val cands = TopK.prunePerPartition(
        cIdx.crossJoin(broadcast(qIdx))
          .where(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"), pdot.as("coarse")),
        "query_id", "coarse", "neighbor_id", rerank)
      .withColumn("crn", row_number().over(cw))
      .where(col("crn") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", round(dot(col("q_vec"), col("c_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ---- IVF (inverted-file) ANN --------------------------------------

  /** Nearest-centroid cell assignment — the IVF index build. The
    * centroid matrix is collected and BROADCAST as plain arrays (the
    * coarse quantizer is memory-resident by design — ~√n centroids,
    * the faiss discipline) and each corpus vector computes its argmax
    * dot in ONE fused per-row loop inside mapPartitions. The obvious
    * relational form — crossJoin(broadcast(centroids)) + groupBy
    * argmax ([[ivfAssignReference]], parity-pinned in AnnSpec) —
    * amplifies the scan |centroids|-fold before the partial aggregate
    * collapses it (every intermediate row re-carrying the full vector
    * through the hash agg); the kernel does the same flops with zero
    * row amplification and no agg state, so assignment cost is exactly
    * one corpus pass. Semantics are bit-identical: left-to-right
    * double accumulation (the [[graft.functions.FloatVectorDot]]
    * contract: null array, length mismatch, or null element → null
    * dot), argmax by (d desc, cid asc) under Spark's SQL ordering
    * (null smallest, NaN greatest, -0.0 == 0.0). */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val src = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parts)
    // deterministic cid-ascending order: ties keep the FIRST (smallest
    // cid) candidate, replicating max(struct(d, -cid))
    val cents: Array[(Long, Array[Float], Boolean)] = centroids
      .select(col("cid").cast("long"), col("cvec")).collect()
      .map { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        if (raw == null) (r.getLong(0), null: Array[Float], true)
        else (r.getLong(0), raw.map(x => if (x == null) 0f else x.toFloat).toArray,
          raw.exists(_ == null))
      }.sortBy(_._1)
    require(cents.nonEmpty, "ivfAssign: empty centroid frame")
    val bc = spark.sparkContext.broadcast(cents)
    val outSchema = src.schema.add("cell", org.apache.spark.sql.types.LongType)
    src.mapPartitions { it =>
      val cs = bc.value
      // SQL double ordering: null < everything, NaN greatest, -0.0 == 0.0
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      it.map { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        val vNull = raw == null
        val v: Array[Float] =
          if (vNull) null else raw.map(x => if (x == null) 0f else x.toFloat).toArray
        val vHasNull = !vNull && raw.exists(_ == null)
        var bestSet = false
        var bestNull = true
        var bestD = 0.0
        var bestC = 0L
        var j = 0
        while (j < cs.length) {
          val (cid, cv, cHasNull) = cs(j)
          // dot = null iff either array null, lengths differ, or any
          // element null (FloatVectorDot's contract — a null element
          // nulls the dot wherever it sits, so a flag suffices)
          val isNull = vNull || cv == null || v.length != cv.length ||
            vHasNull || cHasNull
          var d = 0.0
          if (!isNull) {
            var i = 0
            val n = v.length
            while (i < n) { d += v(i).toDouble * cv(i).toDouble; i += 1 }
          }
          // strict improvement only: equal keys keep the earlier
          // (smaller-cid) winner
          val better =
            if (!bestSet) true
            else if (isNull) false
            else if (bestNull) true
            else java.lang.Double.compare(norm(d), norm(bestD)) > 0
          if (better) { bestSet = true; bestNull = isNull; bestD = d; bestC = cid }
          j += 1
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), bestC)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** The relational formulation of [[ivfAssign]] — kept as the
    * executable specification the fused kernel is parity-pinned
    * against (AnnSpec): crossJoin against broadcast centroids, argmax
    * as a map-side partial max(struct(dot, -cid)). */
  private[graft] def ivfAssignReference(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame): DataFrame = {
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .repartition(parts)
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .select(col("id"), col("v"), col("cid"), dot(col("v"), col("cvec")).as("d"))
    scored.groupBy(col("id"))
      .agg(max(struct(col("d"), (-col("cid")).as("ncid"))).as("m"),
        first(col("v")).as("v"))
      .select(col("id"), col("v"), (-col("m.ncid")).as("cell"))
  }

  /** Deterministic spherical k-means training for IVF centroids.
    *
    * Init is the same stride sample the untrained q38 index uses (every
    * `stride`-th vector by id — fixed, seedless); each of the `iters`
    * Lloyd rounds is one broadcast argmax assignment (ivfAssign) plus
    * one map-side-combined per-dimension sum, and the new centroid is
    * the L2-normalized cluster sum (≡ normalized mean — for unit-norm
    * embeddings and dot-product assignment this is spherical k-means,
    * whose objective, the mean cosine to the assigned centroid, is
    * monotonically non-decreasing per round; AnnSpec asserts it).
    * Empty cells drop out, so k can only shrink. Everything is a fixed
    * function of the input — reruns reproduce the same centroids:
    * per-dimension sums accumulate floor-scaled 2^24 integers (a double
    * sum would depend on shuffle-fetch merge order; integer addition is
    * order-independent — the same rule unigramSurprisal applies), and
    * the ≤2^-24 quantization is far below float components' own noise.
    *
    * Scale shape: the corpus is touched `iters + 1` times, shuffles
    * carry k·dim partial sums per partition (never vectors), and the
    * tiny centroid frame is localCheckpoint'ed per round to keep the
    * plan from deepening with iteration count. */
  def ivfTrainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int, iters: Int): DataFrame =
    ivfRefineCentroids(corpus, idCol, vecCol,
      corpus.where(pmod(col(idCol), lit(stride)) === 0)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")),
      iters)

  /** The Lloyd loop of [[ivfTrainCentroids]] warm-started from an
    * EXISTING centroid set — the index-refresh path: a corpus that has
    * drifted since the index was built (the thing the q84/q85 KL audits
    * detect) re-trains from the standing centroids instead of a fresh
    * stride sample, so few rounds recover the objective and stable
    * regions keep their cell identity (cids survive as long as their
    * cells stay inhabited). Same determinism and scale shape as
    * training from scratch. */
  def ivfRefineCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      initCentroids: DataFrame, iters: Int): DataFrame = {
    var cents = initCentroids.select(col("cid").cast("long").as("cid"), col("cvec"))
    var it = 0
    while (it < iters) {
      val assigned = ivfAssign(corpus, idCol, vecCol, cents)
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("i"))
        .agg((sum(floor(col("x").cast("double") * (1L << 24)).cast("long"))
          .cast("double") / (1L << 24)).as("s"))
      cents = sums.groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
          e => e.getField("s")).as("sv"))
        .withColumn("nrm",
          sqrt(aggregate(col("sv"), lit(0.0), (a, x) => a + x * x)))
        .select(col("cell").as("cid"),
          when(col("nrm") > 0,
            transform(col("sv"), x => (x / col("nrm")).cast("float")))
            .otherwise(transform(col("sv"), x => x.cast("float"))).as("cvec"))
        .localCheckpoint()
      it += 1
    }
    cents
  }

  /** Mean best-centroid cosine over the corpus — the spherical k-means
    * objective ivfTrainCentroids improves; exposed so tests (and index
    * monitoring) can compare centroid sets. */
  def ivfObjective(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): Double = {
    val row = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids.select(col("cvec"))))
      .select(col("id"), dot(col("v"), col("cvec")).as("d"))
      .groupBy(col("id")).agg(max(col("d")).as("best"))
      .agg(avg(col("best"))).head()
    require(!row.isNullAt(0),
      "ivfObjective: empty corpus or centroid set (avg over zero vectors)")
    row.getDouble(0)
  }

  /** IVF-flat top-k: each query probes its `nProbe` nearest cells and
    * scores only those cells' vectors. Candidate generation is a
    * broadcast equi-join of the (small) probe list against the cell
    * index — the corpus never cross-joins the query batch, and cells
    * outside the probe set are never read (with the index bucketed by
    * cell, partition pruning skips them entirely). Recall vs brute force
    * depends on nProbe/|cells|; AnnSpec measures it. */
  def ivfProbeTopK(queries: DataFrame, cells: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    ivfProbeTopKFromProbes(
      ivfProbes(queries, centroids, idCol, vecCol, nProbe), cells, k)

  /** The probe-selection half of [[ivfProbeTopK]]: each query's
    * `nProbe` best cells as (query_id, q_vec, cell). Exposed so a
    * persisted-index caller can derive the probe-cell set AND run the
    * candidate join from ONE probes frame (IvfIndex.probeTopK —
    * recomputing it would double the scoring cost).
    *
    * Same fused-kernel shape as [[ivfAssign]] (the relational
    * crossJoin + per-query window — [[ivfProbesReference]], parity-
    * pinned in AnnSpec — amplifies the query batch |centroids|-fold
    * and windows the product): one pass per query vector over the
    * broadcast centroid matrix, keeping the nProbe best under the
    * identical ordering (d desc with SQL semantics — null smallest,
    * NaN greatest, -0.0 == 0.0 — ties on cid asc). */
  def ivfProbes(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val spark = queries.sparkSession
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cents: Array[(Long, Array[Float], Boolean)] = centroids
      .select(col("cid").cast("long"), col("cvec")).collect()
      .map { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        if (raw == null) (r.getLong(0), null: Array[Float], true)
        else (r.getLong(0), raw.map(x => if (x == null) 0f else x.toFloat).toArray,
          raw.exists(_ == null))
      }.sortBy(_._1)
    require(cents.nonEmpty, "ivfProbes: empty centroid frame")
    val bc = spark.sparkContext.broadcast(cents)
    val outSchema = q.schema
      .add("cell", org.apache.spark.sql.types.LongType, nullable = false)
    q.mapPartitions { it =>
      val cs = bc.value
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      // ordering of (isNull, d, cid): non-null before null, d desc
      // (NaN greatest via Double.compare), ties cid asc — exactly the
      // window's (d desc, cid asc) with default nulls-last
      def beats(aNull: Boolean, aD: Double, aC: Long,
          bNull: Boolean, bD: Double, bC: Long): Boolean =
        if (aNull != bNull) bNull
        else if (!aNull && java.lang.Double.compare(norm(aD), norm(bD)) != 0)
          java.lang.Double.compare(norm(aD), norm(bD)) > 0
        else aC < bC
      it.flatMap { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        val vNull = raw == null
        val v: Array[Float] =
          if (vNull) null else raw.map(x => if (x == null) 0f else x.toFloat).toArray
        val vHasNull = !vNull && raw.exists(_ == null)
        val m = math.min(nProbe, cs.length)
        // insertion top-m (m is tiny — nProbe cells per query)
        val tN = new Array[Boolean](m); val tD = new Array[Double](m)
        val tC = new Array[Long](m); var filled = 0
        var j = 0
        while (j < cs.length) {
          val (cid, cv, cHasNull) = cs(j)
          val isNull = vNull || cv == null || v.length != cv.length ||
            vHasNull || cHasNull
          var d = 0.0
          if (!isNull) {
            var i = 0; val n = v.length
            while (i < n) { d += v(i).toDouble * cv(i).toDouble; i += 1 }
          }
          if (filled < m) {
            // insert into the kept list, keeping it ordered best-first
            var p = filled
            while (p > 0 && beats(isNull, d, cid, tN(p - 1), tD(p - 1), tC(p - 1))) {
              tN(p) = tN(p - 1); tD(p) = tD(p - 1); tC(p) = tC(p - 1); p -= 1
            }
            tN(p) = isNull; tD(p) = d; tC(p) = cid; filled += 1
          } else if (beats(isNull, d, cid, tN(m - 1), tD(m - 1), tC(m - 1))) {
            var p = m - 1
            while (p > 0 && beats(isNull, d, cid, tN(p - 1), tD(p - 1), tC(p - 1))) {
              tN(p) = tN(p - 1); tD(p) = tD(p - 1); tC(p) = tC(p - 1); p -= 1
            }
            tN(p) = isNull; tD(p) = d; tC(p) = cid
          }
          j += 1
        }
        (0 until filled).map(p => org.apache.spark.sql.Row(r.get(0), r.get(1), tC(p)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** The relational formulation of [[ivfProbes]] — the executable
    * specification the fused kernel is parity-pinned against
    * (AnnSpec). */
  private[graft] def ivfProbesReference(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val probeScored = q.crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .select(col("query_id"), col("q_vec"), col("cid"),
        dot(col("q_vec"), col("cvec")).as("d"))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("d").desc, col("cid").asc)
    probeScored.withColumn("prn", row_number().over(pw))
      .where(col("prn") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("cid").as("cell"))
  }

  /** The candidate-join half of [[ivfProbeTopK]] over a precomputed
    * probes frame. Two-level selection: the probed cells' row count
    * still grows with the corpus (n·nProbe/|cells|), so the
    * per-partition bounded heap ([[TopK.prunePerPartition]]) caps the
    * final window's input before any single task sorts a query's full
    * candidate set. */
  def ivfProbeTopKFromProbes(probes: DataFrame, cells: DataFrame,
      k: Int): DataFrame = {
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("q_vec"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    TopK.prunePerPartition(cand, "query_id", "cos", "neighbor_id", k)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Cluster-balanced (semantic-diversity) sampling: keep at most
    * `maxPerCell` vectors per IVF cell — the embedding-space analog of
    * per-source mixing caps. A web-scale corpus is wildly unbalanced in
    * semantic space (boilerplate-adjacent regions dominate); capping per
    * cell flattens the distribution without touching rare regions, the
    * standard pre-training diversity pass once near-dups are gone.
    *
    * Within a cell the kept set is chosen by the avalanche-mixed key
    * hash (Mix48 — the deterministic-shuffle ordering), so the pick is
    * unbiased w.r.t. insertion/id order yet a pure function of the
    * data: reruns, resumes, and engine swaps keep identical vectors.
    *
    * Scale shape: `cells` is ivfAssign output (one exchange to build, or
    * zero read bucketed); the cap is ONE window over a `cell` hash
    * shuffle carrying (id, cell, hash) — vectors don't ride it. Cell
    * population skew is bounded: a hot cell costs one partition's sort,
    * and row_number short-circuits nothing downstream of the cap. */
  def diversitySample(cells: DataFrame, maxPerCell: Int): DataFrame = {
    require(maxPerCell > 0, s"maxPerCell must be positive: $maxPerCell")
    // no reserved-name guard needed: the first select narrows the frame
    // to (id, cell, __h-alias) before '__h'/'drn' exist, so input
    // columns by those names are dropped, never shadowed
    val ord = graft.functions.Mix48.mix48(
      graft.text.TextFunctions.polyHash(col("id").cast("string"), 1L << 48))
    val w = Window.partitionBy(col("cell")).orderBy(col("__h").asc, col("id").asc)
    cells.select(col("id"), col("cell"), ord.as("__h"))
      .withColumn("drn", row_number().over(w))
      .where(col("drn") <= maxPerCell)
      .select(col("id"), col("cell"))
  }

  /** Within-cell near-duplicate pairs — SemDeDup-shaped candidate
    * generation: two vectors are candidates iff they share an IVF cell,
    * then the exact dot verifies the threshold. Complements the LSH
    * path: where LSH amplifies recall with independent hash tables,
    * the cell form reuses the ALREADY-BUILT IVF index (at 100 TB the
    * cells are the persisted, bucketed artifact — candidate generation
    * is then a zero-exchange self-join within each bucket). Recall is
    * bounded by cell granularity: near-dups straddling a cell boundary
    * are missed (AnnSpec measures recall vs brute force; raise recall
    * by coarser cells or the LSH path).
    *
    * SHUFFLE DISCIPLINE: the self-join carries (id, cell) plus the
    * vector ONCE per side within its cell — no bucket-pair explosion,
    * no distinct over payloads (a pair shares exactly one cell, so no
    * dedup is needed, unlike multi-table LSH). */
  def cellNearDupPairs(cells: DataFrame, threshold: Double): DataFrame = {
    val a = cells.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = cells.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.Fence.fence(round(dot(col("v_a"), col("v_b")), 3)))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Multi-table (OR-amplified) LSH near-dup pairs: `tables` independent
    * hash tables of `planesPerTable` bits; a pair becomes a candidate if
    * it collides in ANY table, then is verified with the exact dot
    * product (precision is exact; only recall is approximate — measured
    * against brute force in AnnSpec). Candidate generation is a
    * (table, bucket) equi-join: hash shuffle, never a cross product.
    *
    * SHUFFLE DISCIPLINE: candidates are generated and deduplicated on
    * bare (id_a, id_b) pairs — the d-float payload vectors never ride the
    * bucket join or the distinct exchange; they are re-joined only for
    * the final exact verification of the (much smaller) candidate set.
    * Same pattern as Dedup.minhashNearDupPairs. */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planesPerTable: Int = 4, tables: Int = 16,
      dim: Int = 64): DataFrame = {
    val parts = emb.sparkSession.sessionState.conf.numShufflePartitions
    // Fail fast if the configured dim doesn't match the data: a silent
    // mismatch nulls every hyperplane dot and collapses all rows into
    // bucket 0, degenerating the join to all-pairs. The filter on
    // assert_true(..).isNull forces evaluation (it can't be pruned) and
    // passes every surviving row through.
    val checked = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(assert_true(size(col("v")) === dim,
        lit(s"lshNearDupPairs: embedding length != dim=$dim")).isNull)
      // A single parquet file scans as ONE partition; spread the
      // signature computation (tables × planes dot products per row)
      // across cores before it runs.
      .repartition(parts, col("id"))
    val buckets = array((0 until tables).map(t =>
      lshBucket(col("v"), planesPerTable, dim, t * planesPerTable)): _*)
    val sigs = checked.select(col("id"), posexplode(buckets).as(Seq("table", "bucket")))
    val a = sigs.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = sigs.select(col("table"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("table", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(checked.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(checked.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos",
        // fenced: keeps the threshold filter referencing the computed
        // attribute instead of a second inlined dot product (functions.Fence)
        graft.functions.Fence.fence(round(dot(col("v_a"), col("v_b")), 3)))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
