package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — product-quantized RESIDUALS inside the IVF cell structure,
  * the composition of [[Ann.ivfAssign]]'s coarse quantizer with
  * [[Pq]]'s codebooks (Jégou et al. 2011 §IV; the FAISS
  * `IndexIVFPQ` serving shape a 100 TB embedding corpus actually
  * deploys): each vector stores its cell id plus the m code bytes of
  * its residual (vec − cell centroid), and a query scores ONLY the
  * codes inside its nProbe probed cells —
  *
  *   score(q, x) ≈ q·c(cell) + Σ_s q_s · cvec_s[code_s]
  *
  * — the per-cell term shared by every candidate in the cell, the
  * residual term an m-entry ADC table lookup. Candidates are bounded
  * by construction (nProbe/|cells| of the corpus), which is what makes
  * the compressed tier servable: the coarse scan never touches the
  * whole corpus, and the fp32 plane is read only for the rerank
  * survivors.
  *
  * Determinism discipline (the q38/q181 conventions, composed):
  * residuals are per-element double subtraction of the float centroid
  * from the float vector (both widenings exact, one IEEE op — engine
  * reproducible); codebook training/encoding is [[Pq]]'s fixed-point
  * Lloyd verbatim over the residual frame; both ADC terms floor to
  * 2^24 fixed-point longs, so a candidate's fx is an exact integer
  * sum. Ranking ties break on neighbor_id asc; reported scores round
  * only at the edge.
  *
  * Scale shape: encode is linear (two corpus passes: assignment +
  * sub-vector training joins); the probe path joins codes against the
  * BROADCAST probe list (tiny: |Q| × nProbe rows) and the BROADCAST
  * ADC table (|Q| × m × k rows), aggregates partial (map-side
  * combine), and selects top-k two-level ([[TopK.prunePerPartition]])
  * — no per-query window ever consumes an unbounded frame. With the
  * codes persisted cell-bucketed ([[IvfPqIndex]]), cells outside the
  * probe set are pruned at the file listing. */
object IvfPq {

  private val Fx = 16777216.0 // 2^24

  /** (vec_id, cell, rvec): each vector's cell and double residual
    * against its cell centroid. */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    Ann.ivfAssign(corpus, idCol, vecCol, centroids)
      .join(broadcast(centroids.select(col("cid"), col("cvec"))),
        col("cell") === col("cid"))
      .select(col("id").cast("long").as("vec_id"), col("cell"),
        zip_with(col("v"), col("cvec"),
          (x, y) => x.cast("double") - y.cast("double")).as("rvec"))

  /** Train the residual codebooks: [[Pq.trainCodebooks]] verbatim over
    * the residual frame (stride-seeded, fixed-point Lloyd, constant k).
    * Returns (s, code, cvec: array<double>). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, m: Int, dim: Int, stride: Int = 16,
      iters: Int = 2, k: Int = 32): DataFrame =
    Pq.trainCodebooks(residuals(corpus, idCol, vecCol, centroids),
      "vec_id", "rvec", m, dim, stride, iters, k)

  /** Encode the corpus to (vec_id, cell, s, code) rows — the cell id
    * plus m residual codes per vector. The residual frame feeds BOTH
    * plan branches (the code assignment and the cell join), so it is
    * persisted through CacheScope (the IvfIndex.probeTopK convention —
    * callers release after materializing): the cell-assignment pass
    * runs once per encode, not once per branch. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cb: DataFrame, m: Int, dim: Int): DataFrame = {
    val res = graft.ops.CacheScope.persist(
      residuals(corpus, idCol, vecCol, centroids))
    Pq.encode(res, "vec_id", "rvec", m, dim, cb)
      .join(res.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("s"), col("code"))
  }

  /** One-pass PACKED encode — the index-write shape: each corpus row
    * computes its cell (the [[Ann.ivfAssign]] argmax), its residual,
    * and all m residual codes inside ONE mapPartitions pass over
    * broadcast centroids + codebooks, emitting (id, cell,
    * codes: array<long> by subspace) directly. The relational chain —
    * ivfAssign → centroid join → zip_with residual → subVectors →
    * assign → join cell back → groupBy/collect_list/array_sort pack
    * ([[IvfPqIndex]]'s old write path, parity-pinned in IvfPqSpec) —
    * pays two extra shuffles (the cell re-join and the pack groupBy)
    * plus per-subspace row materialization for the same arithmetic.
    *
    * Semantics replicate the chain exactly: cell = max dot (ties cid
    * asc, FloatVectorDot null contract — all-null dots keep the
    * smallest cid); residual = per-element double subtraction with
    * zip_with's null/length padding; per-subspace argmin under the
    * [[Pq.assign]] ordering (L2 asc NULLS FIRST, ties code asc, a
    * subspace with no codebook entries drops the row — inner-join
    * semantics); null ids drop (the cell re-join's null-key behavior).
    * Contract shared with the kernels it fuses: ids are PK-unique. */
  def encodePacked(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cb: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val d = dim / m
    val spark = corpus.sparkSession
    // bounded collects: ~√n centroids, m·k codebook rows — both
    // memory-resident by design (the faiss discipline)
    val cents: Array[(Long, Array[Float], Boolean)] = centroids
      .select(col("cid").cast("long"), col("cvec")).collect()
      .map { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        if (raw == null) (r.getLong(0), null: Array[Float], true)
        else (r.getLong(0), raw.map(x => if (x == null) 0f else x.toFloat).toArray,
          raw.exists(_ == null))
      }.sortBy(_._1)
    require(cents.nonEmpty, "encodePacked: empty centroid frame")
    // per-centroid element null masks for the residual (zip_with
    // semantics: a null element on EITHER side nulls that position)
    val centNullMask: Array[Array[Boolean]] = centroids
      .select(col("cid").cast("long"), col("cvec")).collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
        if (raw == null) null else raw.map(_ == null).toArray
      }
    val cbRows = cb.select(col("s").cast("int"), col("code").cast("long"),
      col("cvec")).collect()
    val bySpace: Map[Int, Array[(Long, Array[Double], Boolean)]] = cbRows
      .map { r =>
        val raw = if (r.isNullAt(2)) null
          else r.getAs[scala.collection.Seq[java.lang.Double]](2)
        val bad = raw == null || raw.exists(_ == null)
        val arr: Array[Double] =
          if (raw == null) null
          else raw.map(x => if (x == null) 0.0 else x.toDouble).toArray
        (r.getInt(0), (r.getLong(1), arr, bad))
      }
      .groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).sortBy(_._1) }
    // a trained codebook covers every subspace by construction (seeds
    // span all s; Lloyd only merges); a ragged one would silently pack
    // short code arrays in the relational chain — refuse loudly instead
    require((0 until m).forall(bySpace.contains),
      s"encodePacked: codebook must cover every subspace 0..${m - 1}")
    val bcC = spark.sparkContext.broadcast((cents, centNullMask))
    val bcB = spark.sparkContext.broadcast(bySpace)
    val src = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false),
        nullable = false)))
    src.mapPartitions { it =>
      val (cs, masks) = bcC.value
      val spaces = bcB.value
      def norm(x: Double): Double = if (x == 0.0) 0.0 else x
      it.flatMap { r =>
        if (r.isNullAt(0)) Iterator.empty // the cell re-join drops null ids
        else {
          val raw = r.getAs[scala.collection.Seq[java.lang.Float]](1)
          val vNull = raw == null
          val v: Array[Float] =
            if (vNull) null
            else raw.map(x => if (x == null) 0f else x.toFloat).toArray
          val vMask: Array[Boolean] =
            if (vNull) null else raw.map(_ == null).toArray
          val vHasNull = !vNull && vMask.exists(identity)
          // ---- coarse cell: ivfAssign verbatim ----
          var bestSet = false; var bestNull = true
          var bestD = 0.0; var bestC = 0L; var bestJ = 0
          var j = 0
          while (j < cs.length) {
            val (cid, cv, cHasNull) = cs(j)
            val isNull = vNull || cv == null || v.length != cv.length ||
              vHasNull || cHasNull
            var dd = 0.0
            if (!isNull) {
              var i = 0; val n = v.length
              while (i < n) { dd += v(i).toDouble * cv(i).toDouble; i += 1 }
            }
            val better =
              if (!bestSet) true
              else if (isNull) false
              else if (bestNull) true
              else java.lang.Double.compare(norm(dd), norm(bestD)) > 0
            if (better) {
              bestSet = true; bestNull = isNull; bestD = dd; bestC = cid
              bestJ = j
            }
            j += 1
          }
          // ---- residual: zip_with(v, cvec, x.double - y.double) ----
          // (null vec → null residual; per-position null if either
          // element null; length = max of the two, padded with nulls)
          val cv = cs(bestJ)._2
          val cMask = masks(bestJ)
          val rLen =
            if (vNull || cv == null) -1 // null residual array
            else math.max(v.length, cv.length)
          val res: Array[Double] = if (rLen < 0) null else new Array[Double](rLen)
          val rMask: Array[Boolean] = if (rLen < 0) null else new Array[Boolean](rLen)
          if (rLen >= 0) {
            var i = 0
            while (i < rLen) {
              val xNull = i >= v.length || vMask(i)
              val yNull = i >= cv.length || cMask(i)
              if (xNull || yNull) rMask(i) = true
              else res(i) = v(i).toDouble - cv(i).toDouble
              i += 1
            }
          }
          // ---- per-subspace argmin: Pq.assign verbatim over the
          // sliced residual (slice truncates past the array end) ----
          val codes = new Array[Long](m)
          var s = 0
          while (s < m) {
            val es = spaces(s)
            val base = s * d
            // sv = slice(res, base+1, d): svLen elements, null-element
            // flag from the mask; null res → null sv
            val svLen = if (rLen < 0) -1
              else math.max(0, math.min(rLen - base, d))
            var svBad = rLen < 0
            if (!svBad) {
              var i = 0
              while (i < svLen && !svBad) {
                if (rMask(base + i)) svBad = true
                i += 1
              }
            }
            var bSet = false; var bNull = false
            var bD = 0.0; var bCode = 0L
            var jj = 0
            while (jj < es.length) {
              val (code, cvec, cBad) = es(jj)
              val isNull = svBad || cBad || svLen != cvec.length
              var dd = 0.0
              if (!isNull) {
                var i = 0
                while (i < svLen) {
                  val t = res(base + i) - cvec(i); dd += t * t; i += 1
                }
              }
              val better =
                if (!bSet) true
                else if (isNull != bNull) isNull // asc NULLS FIRST
                else if (isNull) false
                else java.lang.Double.compare(norm(dd), norm(bD)) < 0
              if (better) { bSet = true; bNull = isNull; bD = dd; bCode = code }
              jj += 1
            }
            codes(s) = bCode
            s += 1
          }
          Iterator.single(org.apache.spark.sql.Row(
            r.getLong(0), bestC, codes.toSeq))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** Probed-cell ADC scores from a precomputed probes frame
    * ((query_id, q_vec, cell) — [[Ann.ivfProbes]] output): candidates
    * are the codes of probed cells only; fx = the per-(query, cell)
    * centroid term + the summed residual-table entries, all exact
    * fixed-point longs. Output (query_id, neighbor_id, fx). */
  def adcScoresFromProbes(probes: DataFrame, queries: DataFrame,
      codes: DataFrame, centroids: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, dim: Int): DataFrame = {
    // q·c term per probed (query, cell) — |Q| × nProbe rows
    val cterm = probes
      .join(broadcast(centroids.select(col("cid"), col("cvec"))),
        col("cell") === col("cid"))
      .select(col("query_id"), col("cell"),
        floor(Ann.dot(col("q_vec"), col("cvec")) * Fx).cast("long").as("cfx"))
    // residual ADC table: raw query sub-vectors × residual codebooks
    val table = Pq.subVectors(queries, idCol, vecCol, m, dim)
      .select(col("vec_id").as("query_id"), col("s"), col("sv"))
      .join(cb, Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        floor(Pq.dotD(col("sv"), col("cvec")) * Fx).cast("long").as("pfx"))
    codes.join(broadcast(cterm), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .join(broadcast(table), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(min(col("cfx")).as("cfx"), sum(col("pfx")).as("rfx"))
      .select(col("query_id"), col("neighbor_id"),
        (col("cfx") + col("rfx")).as("fx"))
  }

  /** The full in-memory probe path: probe cells, ADC over them. */
  def adcProbeScores(queries: DataFrame, codes: DataFrame,
      centroids: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, nProbe: Int): DataFrame =
    adcScoresFromProbes(
      Ann.ivfProbes(queries, centroids, idCol, vecCol, nProbe),
      queries, codes, centroids, cb, idCol, vecCol, m, dim)

  /** Rank an fx-score frame to (query_id, rank, neighbor_id, adc) —
    * two-level selection, rounding only the report. Shared by the
    * in-memory path and [[IvfPqIndex.probeTopK]]. */
  def rankTopK(scores: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    TopK.prunePerPartition(scores, "query_id", "fx", "neighbor_id", k)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("fx").cast("double") / Fx, 6).as("adc"))
  }

  /** Exact-rescore ladder over an fx-score frame: top `rerank` ADC
    * proposals per query, fp32 cosine restores the final top-k.
    * Shared by [[probeRerankTopK]] and [[IvfPqIndex.probeRerankTopK]]. */
  def rerankTopK(scores: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, rerank: Int): DataFrame = {
    require(k > 0 && rerank >= k, s"need rerank >= k > 0: k=$k rerank=$rerank")
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    val cands = TopK.prunePerPartition(scores,
        "query_id", "fx", "neighbor_id", rerank)
      .withColumn("crn", row_number().over(cw))
      .where(col("crn") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", round(Ann.dot(col("q_vec"), col("c_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF-PQ top-k over the compressed tier alone — rank on the raw
    * fixed-point sum, two-level selection, round only the report. */
  def probeTopK(queries: DataFrame, codes: DataFrame, centroids: DataFrame,
      cb: DataFrame, idCol: String, vecCol: String, m: Int, dim: Int,
      k: Int, nProbe: Int): DataFrame =
    rankTopK(
      adcProbeScores(queries, codes, centroids, cb, idCol, vecCol,
        m, dim, nProbe), k)

  /** The deployment serving ladder: IVF-PQ proposes `rerank`
    * candidates from the probed cells' code tier, exact fp32 cosine
    * restores the final order — only |Q| × rerank full vectors are
    * ever fetched (the [[Pq.adcRerankTopK]] discipline with the
    * candidate set bounded by construction). */
  def probeRerankTopK(queries: DataFrame, codes: DataFrame,
      centroids: DataFrame, cb: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int, dim: Int, k: Int,
      nProbe: Int, rerank: Int): DataFrame =
    rerankTopK(
      adcProbeScores(queries, codes, centroids, cb, idCol, vecCol,
        m, dim, nProbe),
      queries, corpus, idCol, vecCol, k, rerank)
}
