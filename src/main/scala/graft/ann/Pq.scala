package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression tier ABOVE [[Quantize]]'s
  * int8: the vector splits into `m` subspaces, each subspace gets its
  * own k-entry codebook (L2 k-means over the sub-vectors), and a vector
  * stores only its m code bytes. A 64-dim fp32 vector at m=4 becomes
  * 4 bytes — 64x — and search runs over CODES via ADC (asymmetric
  * distance computation): per query, an m x k lookup table of partial
  * dots against the codebooks; a candidate's approximate score is the
  * sum of its codes' table entries. This is the FAISS IVF-PQ serving
  * shape a 100 TB embedding corpus actually deploys (SemDeDup-scale
  * dedup, retrieval mixing): the corpus scan touches m bytes/vector,
  * never the fp32 plane.
  *
  * Determinism discipline (the q26/q38 lesson — every number must be
  * replayable cell-exact by a different engine): sub-vector math casts
  * to double up front; dot/L2 accumulate LEFT-TO-RIGHT over the array
  * (aggregate/zip_with, matching DuckDB's list_reduce order); k-means
  * MEANS accumulate floor(x * 2^24) longs (order-free integer sums,
  * one double division each — the ivfTrainCentroids trick); the ADC
  * sum over subspaces rides the same fixed-point longs. Assignments
  * tie-break (distance asc, code asc); empty clusters drop from the
  * codebook (the Lloyd-round convention).
  *
  * Scale shape: training/encoding explode (vec, subspace) rows —
  * linear, hash-partitioned; the ADC table is |Q| x m x k rows
  * (broadcast); scoring joins the code rows once and window-ranks.
  * At 100 TB the table join becomes a codegen LUT, the plan shape is
  * already the right one. */
object Pq {

  private val Fx = 16777216.0 // 2^24

  /** (vec_id, s, sv) — the m double-cast sub-vectors of each vector.
    * `dim` must split evenly (loud — a ragged split would silently
    * misalign every codebook). */
  def subVectors(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into $m subspaces")
    val d = dim / m
    emb.select(col(idCol).cast("long").as("vec_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)), s =>
          transform(slice(col(vecCol), s * d + 1, lit(d)), x => x.cast("double"))))
          .as(Seq("s", "sv")))
      .select(col("vec_id"), col("s"), col("sv"))
  }

  /** Left-to-right squared L2 over double arrays — the codegen'd
    * fused loop ([[graft.functions.DoubleVectorL2]]): bit-identical
    * to the HOF form (same accumulation order, so duckL2sq still
    * reproduces it) without the per-candidate lambda dispatch and
    * zipped-array allocation that dominated the assign join at the
    * q195 codebook widths. */
  def l2sq(a: Column, b: Column): Column =
    graft.functions.DoubleVectorOps.l2sq(a, b)

  private[ann] def dotD(a: Column, b: Column): Column =
    graft.functions.DoubleVectorOps.dot(a, b)

  /** Nearest codebook entry per sub-vector row: L2 asc (nulls FIRST —
    * the window's asc default), ties code asc.
    *
    * The codebook is m·k rows BY CONSTRUCTION (k constant — the FAISS
    * shape), so it collects and broadcasts as plain arrays and the
    * argmin fuses into ONE pass over the sub-vector rows inside
    * mapPartitions — the [[Ann.ivfAssign]] discipline. The relational
    * form ([[assignReference]], parity-pinned in PqSpec) amplifies the
    * sub-vector frame k-fold through the join and then exchanges+sorts
    * the product for the per-(vec, s) window — measured as the dominant
    * stage of every Lloyd round and every encode at the q195/q206
    * codebook widths (n·m·k rows through an Exchange at k=256). The
    * kernel does the same flops with zero row amplification and no
    * shuffle at all.
    *
    * Semantics are bit-identical to the window form: distances follow
    * the [[graft.functions.DoubleVectorL2]] contract (length mismatch
    * or any null element → null distance; null sub-vector → every
    * distance null), left-to-right double accumulation, SQL double
    * ordering (-0.0 == 0.0, NaN greatest), asc NULLS FIRST, ties on
    * code asc (entries iterate code-ascending; strict improvement
    * keeps the earlier code). Sub-vector rows whose `s` has no
    * codebook entries drop (the inner join's semantics). Contract
    * shared with [[Ann.ivfAssign]]: one output row per input row —
    * callers pass PK-unique vector ids everywhere in the ANN family. */
  private def assign(subs: DataFrame, cb: DataFrame): DataFrame = {
    val spark = subs.sparkSession
    // bounded collect: m·k rows by construction (k is a constant)
    val entries = cb.select(col("s").cast("int"), col("code").cast("long"),
      col("cvec")).collect()
    val bySpace: Map[Int, Array[(Long, Array[Double], Boolean)]] = entries
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
    val bc = spark.sparkContext.broadcast(bySpace)
    val schema = subs.schema // (vec_id, s, sv)
    val si = schema.fieldIndex("s")
    val svi = schema.fieldIndex("sv")
    val outSchema = schema.add("code", org.apache.spark.sql.types.LongType,
      nullable = false)
    subs.mapPartitions { it =>
      val spaces = bc.value
      def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      it.flatMap { r =>
        val es = if (r.isNullAt(si)) null else spaces.getOrElse(r.getInt(si), null)
        if (es == null) Iterator.empty // no codebook rows for this s
        else {
          val raw = if (r.isNullAt(svi)) null
            else r.getAs[scala.collection.Seq[java.lang.Double]](svi)
          val v: Array[Double] =
            if (raw == null) null
            else raw.map(x => if (x == null) 0.0 else x.toDouble).toArray
          val vBad = raw == null || raw.exists(_ == null)
          var bestSet = false; var bestNull = false
          var bestD = 0.0; var bestC = 0L
          var j = 0
          while (j < es.length) {
            val (code, cv, cBad) = es(j)
            val isNull = vBad || cBad || v.length != cv.length
            var d = 0.0
            if (!isNull) {
              var i = 0; val n = v.length
              while (i < n) {
                val t = v(i) - cv(i); d += t * t; i += 1
              }
            }
            // asc NULLS FIRST: a null distance BEATS any non-null one
            // (the window's default); strict improvement keeps the
            // earlier (smaller) code on every tie
            val better =
              if (!bestSet) true
              else if (isNull != bestNull) isNull
              else if (isNull) false
              else java.lang.Double.compare(norm(d), norm(bestD)) < 0
            if (better) { bestSet = true; bestNull = isNull; bestD = d; bestC = code }
            j += 1
          }
          Iterator.single(org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bestC))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** The relational formulation of [[assign]] — kept as the executable
    * specification the fused kernel is parity-pinned against (PqSpec):
    * join against the codebook, per-(vec, s) window argmin. */
  private[ann] def assignReference(subs: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("__d").asc, col("code").asc)
    subs.join(cb, Seq("s"))
      .withColumn("__d", l2sq(col("sv"), col("cvec")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("vec_id"), col("s"), col("sv"), col("code"))
  }

  /** [[assign]] over a precomputed sub-vector frame — exposed for the
    * PqSpec parity pin (kernel == reference on identical inputs). */
  private[ann] def assignKernel(subs: DataFrame, cb: DataFrame): DataFrame =
    assign(subs, cb)

  /** Train per-subspace codebooks: seeds = the sub-vectors of the
    * first `k` `stride`-th vec_ids (code = vec_id, the IVF seeding
    * convention), then `iters` Lloyd rounds (L2 assignment,
    * fixed-point means). k is a CONSTANT independent of corpus size —
    * the FAISS shape (k=256 at deployment): letting the codebook grow
    * with n turns the assignment join quadratic. Returns
    * (s, code, cvec: array<double>). */
  def trainCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, stride: Int = 32, iters: Int = 2,
      k: Int = 32): DataFrame = {
    // every Lloyd round's assign (and the seed collect) re-executes the
    // sub-vector frame's lineage — for the IVF-PQ residual case that is
    // a full coarse-assignment pass over the corpus PER ROUND. Persist
    // it once (CacheScope — released by the caller's scope like every
    // library persist), so training touches the corpus once, not
    // iters + 1 times.
    val subs = graft.ops.CacheScope.persist(
      subVectors(emb, idCol, vecCol, m, dim))
    var cb = subs.where(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("vec_id") < stride.toLong * k)
      .select(col("s"), col("vec_id").as("code"), col("sv").as("cvec"))
    var i = 0
    while (i < iters) {
      val asg = assign(subs, cb)
      cb = asg
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(sum(floor(col("x") * Fx).cast("long")).as("fx"),
          count(lit(1)).as("cnt"))
        .groupBy(col("s"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("i"),
            ((col("fx").cast("double") / Fx) / col("cnt")).as("v")))),
          e => e.getField("v")).as("cvec"))
        // the ivfRefineCentroids convention: the tiny (≤ m·k rows)
        // codebook materializes per round, so the plan doesn't deepen
        // with iteration count and every downstream consumer (encode's
        // assign join, the ADC table, a persisted write) reuses the
        // computed codebook instead of replaying the Lloyd chain
        .localCheckpoint()
      i += 1
    }
    cb
  }

  /** Encode the corpus to (vec_id, s, code) rows under a codebook. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, cb: DataFrame): DataFrame =
    assign(subVectors(emb, idCol, vecCol, m, dim), cb)
      .select(col("vec_id"), col("s"), col("code"))

  /** Every candidate's ADC score for a query batch: per query, the
    * m x k partial-dot table joins the code rows once; a candidate's
    * score is the fixed-point sum of its m entries (an integer —
    * exact across engines). Output (query_id, neighbor_id, fx). */
  def adcScores(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, dim: Int): DataFrame = {
    val qsubs = subVectors(queries, idCol, vecCol, m, dim)
      .select(col("vec_id").as("query_id"), col("s"), col("sv"))
    val table = qsubs.join(cb, Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        floor(dotD(col("sv"), col("cvec")) * Fx).cast("long").as("pfx"))
    codes.join(broadcast(table), Seq("s", "code"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("pfx")).as("fx"))
  }

  /** ADC top-k over the compressed tier alone — rank on the raw
    * fixed-point sum, round only the reported score. Two-level
    * selection: [[TopK.prunePerPartition]] bounds the final window's
    * input to numPartitions × |Q| × k rows (identical results — the
    * prune replays the window's exact ordering), so no single task
    * ever sorts the whole corpus's candidates. */
  def adcTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    TopK.prunePerPartition(
        adcScores(queries, codes, cb, idCol, vecCol, m, dim),
        "query_id", "fx", "neighbor_id", k)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("fx").cast("double") / Fx, 6).as("adc"))
  }

  /** The deployment serving path: ADC proposes `rerank` candidates
    * from the code tier, exact fp32 cosine restores the final order —
    * only |Q| x rerank full vectors are ever fetched (the
    * Quantize.quantizedTopK discipline at 64x compression). */
  def adcRerankTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, m: Int, dim: Int,
      k: Int, rerank: Int): DataFrame = {
    require(k > 0 && rerank >= k, s"need rerank >= k > 0: k=$k rerank=$rerank")
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    val cands = TopK.prunePerPartition(
        adcScores(queries, codes, cb, idCol, vecCol, m, dim),
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
}
