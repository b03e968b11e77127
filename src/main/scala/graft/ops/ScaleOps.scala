package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-scale join toolkit: bucketing (shuffle-free co-located joins
  * for repeatedly-joined big tables) and salting (skew mitigation when
  * one key dominates). Both preserve exact join semantics — they only
  * change the physical shuffle plan.
  */
object ScaleOps {

  /** Persist a bucketed+sorted table: joins between two tables bucketed
    * on the same key with the same bucket count plan as SortMergeJoin
    * with NO exchange on either side — the shuffle is paid once at write
    * time instead of on every join. The 100 TB pattern for fact-fact
    * joins (lineitem ⋈ orders) that recur across a workload. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Deterministic hash sampling: keep a row iff the 31-bit polynomial
    * hash of its key, taken mod 10000, falls below `rateBp` (basis
    * points: 2500 ⇒ 25%). Unlike `df.sample`, the decision is a pure
    * function of the key — reproducible across engines, retries, resumes
    * and cluster sizes, stable under re-partitioning, and consistent for
    * the same key across tables (sampling two tables at the same rate on
    * a shared key keeps them joinable). One scan, no shuffle, no RNG
    * state. */
  def deterministicSampleBp(df: DataFrame, keyCol: String, rateBp: Int): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp must be in [0,10000]: $rateBp")
    df.where(sampleBucket(col(keyCol)) < rateBp)
  }

  /** Basis-point bucket in [0, 10000) for a key: polynomial hash spread
    * by one affine step (a·h + b) mod 2^31 before the bucket mod. The
    * raw poly fold of a SHORT key (e.g. a decimal id) occupies a narrow
    * value band and samples wildly off-rate; the multiplier spreads
    * consecutive and banded keys equidistributedly (gcd(a mod 10^4,
    * 10^4) = 1), and a·h ≤ 2^24·2^31 = 2^55 needs no split arithmetic.
    * Observed on 500 decimal ids: raw fold → 60% kept at a 25% rate;
    * spread → 24.4%. */
  private def sampleBucket(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    spreadHash(key) % 10000

  /** Deterministic pseudorandom permutation position for every row — the
    * training-example global shuffle: data loaders read in `shuffle_pos`
    * order, and every rerun, resume, or engine swap reads the identical
    * order (no RNG state, no seed file). Ordering = (affine-spread key
    * hash, key): total whenever keys are unique — the caller's contract.
    *
    * Scale shape (a global row_number would move everything into ONE
    * window partition): the hash range is cut into `numShufflePartitions`
    * fixed-width buckets (no sampled boundaries — fully deterministic),
    * one bounded count job yields per-bucket offsets on the driver (one
    * long per bucket, the AQE-stats pattern), and positions are the
    * per-bucket row_number plus the bucket offset. One exchange for the
    * counts, one for the final per-bucket sort; hash uniformity keeps
    * buckets balanced. At 100 TB write the output bucketed by
    * `shuffle_pos div rowsPerShard` and loaders stream shards
    * sequentially.
    *
    * Ordering hash = avalanche-mixed 48-bit polynomial (functions.Mix48):
    * the raw fold (and its affine spread) is order-preserving over
    * consecutive keys — a "shuffle" ordered by it leaves runs of input
    * order intact (measured: 9 inversions across 500 sequential ids);
    * the mix decorrelates (ScaleOpsSpec asserts the permutation actually
    * scrambles). */
  def deterministicShufflePos(df: DataFrame, keyCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(col("__b")).orderBy(col("__h").asc, col(keyCol).asc)
    withBucketOffsets(df, keyCol, parts, count(lit(1)))
      .withColumn("shuffle_pos",
        row_number().over(w).cast("long") - 1L + col("__off"))
      .drop("__h", "__b", "__off")
  }

  /** Per-EPOCH deterministic shuffle — the multi-epoch loader order: a
    * training run visits the corpus once per epoch in a DIFFERENT
    * deterministic permutation (identical epoch orders replay the same
    * gradient curriculum; a seeded-random order isn't resumable). The
    * ordering hash salts the key with the epoch number
    * (mix48(polyHash(key || ':' || epoch))), so every epoch is an
    * independent permutation of the same rows, any (epoch, position)
    * is resumable from the keys alone, and engines replay it exactly
    * ([[deterministicShufflePos]]'s contract, one dimension up).
    *
    * Output: one row per (key, epoch) with the epoch-local position
    * (0-based, dense per epoch). Same two-level machinery as the
    * single-epoch form ([[withBucketOffsets]] with the epoch as the
    * salt/group column) — positions are the per-(epoch, bucket)
    * row_number plus a broadcast exclusive offset; the offsets
    * aggregation collects epochs x numShufflePartitions longs (bounded:
    * epochs is a small parameter, buckets the session constant). */
  def epochShufflePos(df: DataFrame, keyCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochShufflePos: epochs must be >= 1, got $epochs")
    require(!df.columns.contains("epoch"),
      "epochShufflePos: input already carries an 'epoch' column")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val staged = df.withColumn("epoch",
      explode(array((0 until epochs).map(e => lit(e.toLong)): _*)))
    val w = Window.partitionBy(col("epoch"), col("__b"))
      .orderBy(col("__h").asc, col(keyCol).asc)
    withBucketOffsets(staged, keyCol, parts, count(lit(1)),
        saltCol = Some("epoch"))
      .withColumn("epoch_pos",
        row_number().over(w).cast("long") - 1L + col("__off"))
      .drop("__h", "__b", "__off")
  }

  /** Shared two-level global-order machinery (shuffle positions, stream
    * packing, epoch shuffles): mixed-hash fixed-width bucketing of
    * `keyCol` plus the per-bucket EXCLUSIVE prefix total of `measure`
    * (row count for positions, token sum for packing) broadcast-joined
    * back as `__off`. One bounded aggregation collects `numBuckets`
    * longs to the driver (times the salt cardinality when `saltCol` is
    * set — the AQE-stats pattern); offsets ride a broadcast-joined
    * frame, not a per-row when-chain — at thousands of buckets a nested
    * CaseWhen is O(buckets) comparisons per row and a codegen hazard,
    * while the inner join is O(1) per row and fails loudly (drops
    * nothing silently — every row's bucket is in the collected set by
    * construction, so the join is total). Callers add their own
    * within-bucket window over (`__h`, key) and drop the `__h`/`__b`/
    * `__off` scaffolding.
    *
    * `saltCol` (a non-null LONG column, e.g. the epoch number) both
    * salts the ordering hash (key || ':' || salt — independent
    * permutations per salt value) and scopes the offsets: positions
    * restart dense at 0 within each salt group. */
  private def withBucketOffsets(df: DataFrame, keyCol: String,
      numBuckets: Int, measure: Column,
      saltCol: Option[String] = None): DataFrame = {
    val width = ((1L << 48) + numBuckets - 1) / numBuckets
    val hashSrc = saltCol.fold(col(keyCol).cast("string"))(s =>
      concat(col(keyCol).cast("string"), lit(":"), col(s).cast("string")))
    val withBucket = df
      .withColumn("__h", graft.functions.Mix48.mix48(
        graft.text.TextFunctions.polyHash(hashSrc, 1L << 48)))
      .withColumn("__b", (col("__h") / width).cast("int"))
      .withColumn("__g",
        saltCol.fold(lit(0L))(s => col(s).cast("long")))
    val totals = withBucket.groupBy(col("__g"), col("__b"))
      .agg(measure.as("__m"))
      .collect().map { r =>
        // a NULL key hashes to a NULL bucket and has no defined position
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"bucketed global order: NULL values in key column '$keyCol'" +
            saltCol.fold("")(s => s" or salt column '$s'"))
        (r.getLong(0), r.getInt(1)) -> (if (r.isNullAt(2)) 0L else r.getLong(2))
      }.sortBy(_._1)
    val offsets = totals.groupBy(_._1._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1._2)
      sorted.map(_._1).zip(
        sorted.scanLeft(0L) { case (acc, (_, n)) => acc + n }.dropRight(1))
    }.map { case ((g, b), off) => (g, b, off) }
    val spark0 = df.sparkSession
    import spark0.implicits._
    withBucket.join(broadcast(offsets.toDF("__g", "__b", "__off")),
        Seq("__g", "__b"))
      .drop("__g")
  }

  /** Token-stream packing — the GPT-pretraining "concatenate the shuffled
    * corpus and split every `binTokens` tokens" step, assigned without
    * materializing the stream: each document gets the context-window
    * `bin_id` its FIRST token lands in and its `bin_pos` offset within
    * that bin (documents may straddle bin boundaries, exactly like the
    * real token stream). The stream order is the deterministic shuffle
    * order of [[deterministicShufflePos]] (mixed-hash, then key), so
    * reruns, resumes, and engine swaps pack identically.
    *
    * Scale shape: the global exclusive token cumsum is the same
    * two-level form as the shuffle positions — per-bucket token totals
    * (one bounded driver collect) plus a within-bucket running sum — so
    * nothing ever sees a single global window partition. Null token
    * counts pack as zero-width. */
  def packTokenStream(df: DataFrame, keyCol: String, nTokensCol: String,
      binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive: $binTokens")
    tokenStreamOffsets(df, keyCol, nTokensCol)
      .withColumn("bin_id", expr(s"__excl div ${binTokens}L"))
      .withColumn("bin_pos", col("__excl") % binTokens)
      .drop("__excl", "__n")
  }

  /** The token stream's global EXCLUSIVE cumsum — each document's
    * first-token offset `__excl` (plus its width `__n`) in the
    * deterministic-shuffle concatenation order; the shared core of
    * [[packTokenStream]] and [[packTokenSpans]]. Two-level: per-bucket
    * totals (one bounded collect) + a within-bucket running sum. */
  private def tokenStreamOffsets(df: DataFrame, keyCol: String,
      nTokensCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val staged = df.withColumn("__n", coalesce(col(nTokensCol).cast("long"), lit(0L)))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucketOffsets(staged, keyCol, parts, sum(col("__n")))
      .withColumn("__excl", sum(col("__n")).over(w) - col("__n") + col("__off"))
      .drop("__h", "__b", "__off")
  }

  /** Per-context-window DOCUMENT SPANS of the packed token stream — the
    * metadata a loader needs to build attention masks over
    * [[packTokenStream]]'s windows: one row per (window, document)
    * intersection with
    *
    *   `bin_id`      the context window,
    *   `bin_start`   where the document's slice begins WITHIN the window,
    *   `doc_off`     where the slice begins within the document (0 unless
    *                 the document straddled in from the previous window),
    *   `span_tokens` the slice width.
    *
    * Within each window the spans tile it exactly: bin_start values are
    * the prefix sums of span_tokens (ShardExportSpec pins the tiling
    * invariant), so block-diagonal masks read straight off the rows.
    * Zero-width documents carry no tokens into any window and emit no
    * span. The explode is bounded per document by n/binTokens + 1 —
    * linear in corpus tokens over the window size, the same output
    * cardinality as the windows themselves. */
  def packTokenSpans(df: DataFrame, keyCol: String, nTokensCol: String,
      binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive: $binTokens")
    tokenStreamOffsets(df, keyCol, nTokensCol)
      .where(col("__n") > 0)
      .withColumn("bin_id", explode(sequence(
        expr(s"__excl div ${binTokens}L"),
        expr(s"(__excl + __n - 1) div ${binTokens}L"))))
      .withColumn("bin_start",
        greatest(col("__excl") - col("bin_id") * binTokens, lit(0L)))
      .withColumn("doc_off",
        greatest(col("bin_id") * binTokens - col("__excl"), lit(0L)))
      .withColumn("span_tokens",
        least(col("__excl") + col("__n"), (col("bin_id") + lit(1L)) * binTokens) -
          greatest(col("__excl"), col("bin_id") * binTokens))
      .drop("__excl", "__n")
  }

  /** Greedy first-fit-contiguous packing — the no-split variant (SFT /
    * document-integrity packing): documents in deterministic-shuffle
    * order accumulate into the current bin until adding the next would
    * exceed `binTokens`, which starts a fresh bin; an oversized document
    * (n > binTokens) gets a bin of its own. No document is ever split.
    *
    * The fold is inherently sequential, so parallelism comes from the
    * bucket: bins are LOCAL to a mixed-hash bucket (`pack_bucket`,
    * `pack_bin` together form the global bin key), `numBuckets` is the
    * packing parallelism knob, and each bucket's fold is one linear pass
    * over its sorted rows (mapPartitions — the genuine per-partition
    * imperative case; no relational form expresses a data-dependent
    * running reset). Bucket-local bins cost at most one underfull bin
    * per bucket versus a single sequential pass — at 100 TB that is
    * noise, and it is the SAME trade sample-packing makes per worker
    * shard in real loaders. */
  def packGreedyContiguous(df: DataFrame, keyCol: String, nTokensCol: String,
      binTokens: Long, numBuckets: Int): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive: $binTokens")
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val width = ((1L << 48) + numBuckets - 1) / numBuckets
    val withBucket = df
      .withColumn("__n", coalesce(col(nTokensCol).cast("long"), lit(0L)))
      .withColumn("__h", graft.functions.Mix48.mix48(
        graft.text.TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 48)))
      // fail loudly on NULL keys (no defined pack order) — the lazy
      // distributed-invariant guard, not a silent drop
      .withColumn("__b", when(col("__h").isNull,
          raise_error(lit(s"packGreedyContiguous: NULL values in key column '$keyCol'")))
        .otherwise((col("__h") / width).cast("int")))
    val sorted = withBucket.repartition(col("__b"))
      .sortWithinPartitions(col("__b"), col("__h"), col(keyCol))
    val schema = sorted.schema
      .add("pack_bucket", org.apache.spark.sql.types.LongType, nullable = false)
      .add("pack_bin", org.apache.spark.sql.types.LongType, nullable = false)
    val bIdx = sorted.schema.fieldIndex("__b")
    val nIdx = sorted.schema.fieldIndex("__n")
    val binT = binTokens
    val packed = sorted.mapPartitions { rows =>
      // hash-partitioned by __b and sorted (__b, __h, key): buckets are
      // contiguous runs; the fold resets at each bucket boundary
      var curB = -1L; var bin = 0L; var fill = 0L
      rows.map { r =>
        val b = r.getInt(bIdx).toLong
        val n = r.getLong(nIdx)
        if (b != curB) { curB = b; bin = 0L; fill = n }
        else if (fill + n <= binT) fill += n
        else { bin += 1L; fill = n }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ b :+ bin)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    packed.drop("__h", "__b", "__n")
  }

  /** Budgeted prefix selection in a VALUE order — "keep the
    * highest-scoring documents until the token budget fills", the step
    * that follows any importance/quality scoring (DSIR weights, quality
    * scores): rows are taken in (`orderCol` desc, `keyCol` asc) global
    * order while the inclusive running sum of `nTokensCol` stays within
    * `tokenBudget`. Output = the selected rows with their inclusive
    * `cum_tokens`; the kept set is a true prefix of the order (the
    * running sum is monotone), so the rule is exactly "stop at the
    * first overflow".
    *
    * Scale shape: the global cumsum is two-level like
    * [[packTokenStream]]'s, but bucketed by VALUE RANGE instead of
    * hash so buckets align with the score order: approximate quantile
    * boundaries of `orderCol` (one bounded driver list; boundary
    * precision affects only partition balance, never the result) give
    * ≤ numBuckets range buckets, per-bucket token totals collect as
    * numBuckets longs, and the within-bucket window runs over
    * (`orderCol` desc, key) — no single global window partition
    * anywhere. Equal scores always share a bucket (assignment is by
    * value), so ties resolve purely by the within-bucket key order.
    * numBuckets is capped because assignment is an O(numBuckets)
    * comparison chain per row. NULL scores raise (no defined rank);
    * NULL token counts select as zero-width. */
  def selectTokenBudget(df: DataFrame, keyCol: String, orderCol: String,
      nTokensCol: String, tokenBudget: Long, numBuckets: Int = 0): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be >= 0: $tokenBudget")
    requireNoReservedBudgetCols(df)
    val spark0 = df.sparkSession
    val k = if (numBuckets > 0) numBuckets
      else spark0.sessionState.conf.numShufflePartitions
    require(k <= 256,
      s"selectTokenBudget: numBuckets $k > 256 puts an O(numBuckets) comparison chain on every row")
    // Three actions run over this frame (the quantile probe, the
    // per-bucket totals collect, the final selection) — persist it so an
    // expensive input pipeline (q89 feeds the full DSIR scorer here) is
    // computed once, not three times. Same pattern as
    // ShardExport.writeShards; callers release via CacheScope.
    val staged = graft.ops.CacheScope.persist(df
      .withColumn("__n", coalesce(col(nTokensCol).cast("long"), lit(0L)))
      .withColumn("__o", when(col(orderCol).isNull, raise_error(
          lit(s"selectTokenBudget: NULL values in order column '$orderCol'")))
        .otherwise(col(orderCol).cast("double"))))
    val probs = (1 until k).map(_.toDouble / k).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else staged.stat.approxQuantile("__o", probs, 0.001).distinct.sorted
    // bucket 0 = highest scores; descending boundary chain, ties land
    // together because assignment depends only on the value
    val bucketCol = bounds.reverse.zipWithIndex
      .foldRight(lit(bounds.length).cast("int"): Column) {
        case ((b, i), acc) => when(col("__o") > lit(b), lit(i)).otherwise(acc)
      }
    val withB = staged.withColumn("__b", bucketCol)
    val totals = withB.groupBy(col("__b")).agg(sum(col("__n")).as("__m"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, off), (b, _)) => b -> off }.toSeq
    import spark0.implicits._
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__o").desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offDf =
      if (offsets.isEmpty) Seq((0, 0L)).toDF("__b", "__off") // empty input
      else offsets.toDF("__b", "__off")
    withB.join(broadcast(offDf), Seq("__b"))
      .withColumn("cum_tokens", sum(col("__n")).over(w) + col("__off"))
      .where(col("cum_tokens") <= tokenBudget)
      .drop("__b", "__n", "__o", "__off")
  }

  /** Per-group [[selectTokenBudget]]: each group independently keeps
    * its best-scored rows until ITS token budget fills — the final
    * training-mix assembly ("each domain gets its temperature share,
    * filled with its highest-quality documents"). `budgets` carries
    * one (groupCol, token_budget) row per group; a duplicate group or
    * a row whose group has no budget raises (a silent inner join would
    * quietly drop a whole source from the mix).
    *
    * Scale shape: the score-range buckets are GLOBAL (one bounded
    * quantile probe — per-group quantiles would need a per-group pass),
    * so equal scores share a bucket in every group and the per-group
    * cumsum order is exactly (`orderCol` desc, `keyCol`). Per-(group,
    * bucket) totals stay a FRAME (groups×numBuckets rows — the offsets
    * window runs on it, nothing collects to the driver), broadcast back
    * with the budgets; the data-sized window partitions by (group,
    * bucket) — never a whole group, never global. */
  def selectTokenBudgetBy(df: DataFrame, keyCol: String, orderCol: String,
      nTokensCol: String, groupCol: String, budgets: DataFrame,
      numBuckets: Int = 0): DataFrame = {
    require(budgets.columns.contains(groupCol) &&
        budgets.columns.contains("token_budget"),
      s"budgets must carry ($groupCol, token_budget), got ${budgets.columns.mkString(",")}")
    requireNoReservedBudgetCols(df)
    val spark0 = df.sparkSession
    val k = if (numBuckets > 0) numBuckets
      else spark0.sessionState.conf.numShufflePartitions
    require(k <= 256,
      s"selectTokenBudgetBy: numBuckets $k > 256 puts an O(numBuckets) comparison chain on every row")
    val staged = graft.ops.CacheScope.persist(df
      .withColumn("__n", coalesce(col(nTokensCol).cast("long"), lit(0L)))
      .withColumn("__o", when(col(orderCol).isNull, raise_error(
          lit(s"selectTokenBudgetBy: NULL values in order column '$orderCol'")))
        .otherwise(col(orderCol).cast("double"))))
    val probs = (1 until k).map(_.toDouble / k).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else staged.stat.approxQuantile("__o", probs, 0.001).distinct.sorted
    val bucketCol = bounds.reverse.zipWithIndex
      .foldRight(lit(bounds.length).cast("int"): Column) {
        case ((b, i), acc) => when(col("__o") > lit(b), lit(i)).otherwise(acc)
      }
    val withB = staged.withColumn("__b", bucketCol)
    // per-(group, bucket) token totals and their within-group exclusive
    // prefix sums — a window over the TINY totals frame, nothing
    // driver-side
    val totals = withB.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__n")).as("__m"))
    val ow = Window.partitionBy(col(groupCol)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = totals
      .withColumn("__off", coalesce(sum(col("__m")).over(ow), lit(0L)))
      .select(col(groupCol), col("__b"), col("__off"))
    // one budget per group, loudly: duplicates fan out the data join and
    // double-select; missing budgets silently drop a source
    val bud = budgets.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__c"),
        max(col("token_budget")).cast("long").as("__bud"))
      .select(col(groupCol),
        when(col("__c") > 1, raise_error(concat(
            lit("selectTokenBudgetBy: duplicate budget rows for group "),
            col(groupCol).cast("string"))))
          .otherwise(col("__bud")).as("__bud"))
    val w = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__o").desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offDf), Seq(groupCol, "__b"))
      .join(broadcast(bud), Seq(groupCol), "left")
      .withColumn("__bud", when(col("__bud").isNull, raise_error(concat(
          lit("selectTokenBudgetBy: no budget row for group "),
          col(groupCol).cast("string"))))
        .otherwise(col("__bud")))
      .withColumn("cum_tokens", sum(col("__n")).over(w) + col("__off"))
      .where(col("cum_tokens") <= col("__bud"))
      .drop("__b", "__n", "__o", "__off", "__bud")
  }

  /** The budget operators' staging columns — an input column with one
    * of these names would be silently overwritten (and `cum_tokens`
    * shadowed in the output); fail loudly instead, the exactKSample
    * reserved-name discipline. */
  private def requireNoReservedBudgetCols(df: DataFrame): Unit = {
    val reserved = Seq("__n", "__o", "__b", "__off", "__bud", "__m", "cum_tokens")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input must not use the reserved column names ${clash.mkString(", ")}")
  }

  /** Full-range affine-spread hash in [0, 2^31) — shared by sampling
    * (bucketed mod 10^4) and shuffling (raw). */
  private def spreadHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(10368889L) * graft.text.TextFunctions.polyHash(key.cast("string"), 1L << 31) +
      lit(8342140L)) % (1L << 31)

  /** Exact-k deterministic sample: the k rows whose affine-spread key
    * hashes sort FIRST (ties on the key) — the "exactly 10k eval
    * documents" ask that a rate can only approximate on. Same hash
    * family as [[deterministicSampleBp]]: a pure function of the key,
    * reproducible across engines/retries and invariant under
    * re-partitioning. Unlike rate sampling, membership is NOT stable
    * under corpus growth (a new low-hash row displaces the current
    * k-th) — inherent to any exact-k semantics; callers who need
    * growth-stability use the rate form. Keys must be unique (the
    * contract everywhere keys order rows); duplicate keys make the cut
    * among their copies arbitrary.
    *
    * Scale shape: orderBy+limit plans as TakeOrderedAndProject —
    * per-partition top-k then one k-bounded driver merge, never a
    * single-partition global sort. */
  def exactKSample(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(keyCol != "__sh", "keyCol must not use the reserved name '__sh'")
    df.withColumn("__sh", spreadHash(col(keyCol)))
      .orderBy(col("__sh").asc, col(keyCol).asc)
      .limit(k)
      .drop("__sh")
  }

  /** Per-stratum [[exactKSample]]: exactly k rows from every stratum
    * (all of them where the stratum is smaller) — balanced eval panels
    * over unbalanced sources. Window top-k partitioned by the stratum:
    * one shuffle on the stratum key, no global ordering anywhere. */
  def exactKSampleBy(df: DataFrame, keyCol: String, strataCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(keyCol != strataCol, s"keyCol and strataCol must differ: '$keyCol'")
    require(keyCol != "__rn" && strataCol != "__rn",
      "column names must not use the reserved name '__rn'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(spreadHash(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Stratified variant: per-stratum rates (basis points) with a default
    * for unlisted strata — the "downsample common crawl, keep all of
    * wikipedia" shape of training-data mixing. */
  def stratifiedSampleBp(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultBp: Int): DataFrame = {
    (rates.values.toSeq :+ defaultBp).foreach(r =>
      require(r >= 0 && r <= 10000, s"rate must be in [0,10000]: $r"))
    val rate = rates.foldLeft(lit(defaultBp)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.where(sampleBucket(col(keyCol)) < rate)
  }

  /** Deterministic train/val/test split: each row gets a split label
    * from its key-hash bucket against cumulative basis-point
    * boundaries — the eval-split generation step of a training
    * pipeline. Pure function of the key: reproducible across
    * engines/retries/resumes, stable as the corpus grows (a document's
    * split never changes when others are added — the property that
    * prevents silent train/test contamination across dataset
    * versions), and consistent for the same key across tables. One
    * scan, no shuffle. `splits` maps label → basis points, must sum to
    * exactly 10000 so every row gets exactly one label. */
  def deterministicSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive shares")
    // Long sum: an Int sum can WRAP to exactly 10000 on adversarial
    // shares and silently pass the guard with garbage bounds
    require(splits.map(_._2.toLong).sum == 10000L,
      s"split shares must sum to 10000 bp, got ${splits.map(_._2.toLong).sum}")
    require(splits.map(_._1).distinct.length == splits.length,
      "split labels must be unique")
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val bucket = sampleBucket(col(keyCol))
    // a NULL key nulls every comparison and would silently leave the
    // row in NO split — fail loudly instead (packGreedyContiguous's
    // lazy distributed-invariant guard)
    val label = splits.zip(bounds).reverse.foldLeft(
      when(bucket.isNull, raise_error(
        lit(s"deterministicSplit: NULL values in key column '$keyCol'")))
        .otherwise(lit(null).cast("string"))) {
      case (acc, ((name, _), hi)) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Score-weighted deterministic sampling: each row's keep rate (basis
    * points) is a per-row COLUMN — the "keep high-quality documents at
    * a higher rate" curation pass, generalizing [[stratifiedSampleBp]]
    * from per-stratum constants to any computed score. Same key-hash
    * decision as [[deterministicSampleBp]]: reproducible across
    * engines/retries/resumes, one scan, no shuffle, no RNG. Rates are
    * clamped to [0, 10000]; a NULL rate keeps nothing (the row has no
    * defined keep probability). */
  def weightedSampleBp(df: DataFrame, keyCol: String, rateBpCol: Column): DataFrame =
    df.where(sampleBucket(col(keyCol)) <
      least(greatest(coalesce(rateBpCol.cast("long"), lit(0L)), lit(0L)), lit(10000L)))

  /** Token-budget data mixing — the training-mix allocator: given target
    * corpus shares per source (basis points) and a total token budget,
    * derive each source's deterministic sampling rate from its measured
    * token count and apply the stratified sample. All integer arithmetic
    * (rate_bp = min(10000, budget·share_bp div source_tokens)), so the
    * allocation is engine-reproducible; unlisted sources get rate 0
    * (excluded from the mix). The per-source token counts are one
    * map-side-combined aggregation collected to the driver — bounded by
    * the number of NAMED sources, the same driver-scalar pattern as the
    * contamination audit's source list. Returns (sampled frame, rates). */
  def mixByTokenBudget(df: DataFrame, strataCol: String, textCol: String,
      keyCol: String, shareBp: Map[String, Int],
      totalTokenBudget: Long): (DataFrame, Map[String, Int]) = {
    require(shareBp.values.forall(s => s >= 0 && s <= 10000),
      "shares must be basis points in [0, 10000]")
    require(shareBp.values.sum <= 10000, "shares must sum to <= 10000 bp")
    require(totalTokenBudget > 0, "token budget must be positive")
    val counts = df
      .groupBy(col(strataCol).cast("string").as("s"))
      .agg(sum(graft.text.TextFunctions.tokenCount(col(textCol))).as("n"))
      .collect()
      // a stratum whose every text is NULL sums to null — treat as zero
      // tokens (excluded by the n > 0 rate guard) instead of NPE-ing on
      // the driver unboxing
      .map(r => Option(r.getString(0)).getOrElse("") ->
        (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val rates = shareBp.flatMap { case (s, share) =>
      counts.get(s).filter(_ > 0).map { n =>
        s -> math.min(10000L, totalTokenBudget * share / n).toInt
      }
    }
    (stratifiedSampleBp(df, keyCol, strataCol, rates, defaultBp = 0), rates)
  }

  /** Salted equi-join for skewed keys: the big side's rows get a
    * deterministic salt in [0, saltFactor); the small side is replicated
    * saltFactor times; joining on (key, salt) spreads a hot key over
    * saltFactor reducers. Result is exactly the plain equi-join.
    *
    * The salt derives from xxhash64 of the big side's non-key columns
    * (deterministic across retries/resumes — no rand()); rows identical
    * in every column hash to the same salt, which is harmless: skewed
    * KEYS are spread regardless. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Replicating the small side breaks right/full-outer semantics: an
    // unmatched small-side row would surface saltFactor times. Restrict
    // to the join types where replicated-but-unmatched rows vanish.
    val supported = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(supported.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedEquiJoin supports $supported, not '$joinType' " +
        "(small-side replication would duplicate unmatched outer rows)")
    val nonKey = big.columns.filter(_ != key).map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(nonKey.toIndexedSeq: _*)), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Point-in-interval equi-bucket join: all (point, interval) pairs
    * with `lo ≤ point ≤ hi` — the range join Spark has no native
    * strategy for (a raw `p BETWEEN lo AND hi` theta-join plans as a
    * BroadcastNestedLoop: every point × every interval). Buckets of
    * width `bucketWidth` turn it into an equi-join: each interval
    * explodes to the buckets it covers, each point maps to its single
    * bucket, the join runs on the bucket key (hash shuffle), and the
    * exact predicate refines. A point meets an interval in EXACTLY one
    * bucket (its own), so no pair-dedup is needed.
    *
    * Scale: shuffle volume = |points| + Σ⌈interval span / width⌉ rows;
    * pick `bucketWidth` near the typical interval span so most
    * intervals explode to 1-2 buckets. Extreme spans fan out linearly
    * (span/width rows) — cap or split pathological intervals upstream.
    * NULL bounds/points never match and are dropped (equi-join on a
    * NULL bucket matches nothing, same as the theta-join semantics). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, overlap: $overlap")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "'__b' is reserved by intervalJoin")
    // bkt() interpolates these names into expr() under backtick quoting;
    // a backtick in the name would break out of the quoting
    for (c <- Seq(pointCol, loCol, hiCol))
      require(!c.contains("`"), s"intervalJoin: column name must not contain a backtick: '$c'")
    // INTEGER floor division ((c − pmod) is an exact multiple, so `div`'s
    // truncation IS floor, negatives included). A double `/` here loses
    // bits above 2^53 — epoch nanos would round buckets off-by-one and
    // silently drop matching pairs for widths that don't divide 2^k.
    def bkt(c: String): Column =
      expr(s"(`$c` - pmod(`$c`, ${bucketWidth}L)) div ${bucketWidth}L")
    val p = points.withColumn("__b", bkt(pointCol))
    val iv = intervals
      .where(col(loCol) <= col(hiCol)) // empty/invalid intervals match nothing
      .withColumn("__b", explode(sequence(bkt(loCol), bkt(hiCol))))
    p.join(iv, Seq("__b"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTime` ≤ `leftTime` within the same key (the
    * time-series "latest known value" join Spark lacks natively).
    * Left-outer semantics: unmatched left rows keep null right columns.
    *
    * Plan shape — union-sort + last-value window (the merge-join form):
    * tag both sides, union them, and run ONE running `last(right-struct,
    * ignoreNulls)` window per key ordered by (time, side) with right rows
    * sorting before left rows at equal timestamps (≤ is inclusive). Every
    * left row then carries the latest right row at or before it.
    *
    * Scale: the intermediate is |left| + |right| rows — never the
    * |left|×|right| blowup of the naive equi-join + range filter, which
    * materializes every (trade, earlier-quote) pair before pruning and
    * detonates on a hot key. A hot key here still sorts within one
    * partition (O(n log n), linear state); if a single key exceeds a
    * partition, pre-bucket by coarse time range and stitch.
    * Column names must be disjoint between the two sides. Ties on equal
    * `rightTime` within a key are broken arbitrarily — pre-dedup the
    * right side per (key, time) if tie determinism matters. */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, overlap: $overlap")
    // NULL semantics must match the equi-join formulation this replaces:
    // a NULL key or time never matches (Window.partitionBy would happily
    // group NULL keys together), and a NULL-keyed LEFT row still appears
    // in the output, unmatched.
    val lNull = left.where(col(leftKey).isNull || col(leftTime).isNull)
    val lGood = left.where(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val rGood = right.where(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val unmatchedNulls = lNull.select(
      left.columns.map(col).toIndexedSeq ++
        right.schema.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val lTagged = lGood.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(right.schema).as("__r"))
    val rTagged = rGood.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(left.schema).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c)) ++
        right.columns.map(c => col("__last_r").getField(c).as(c)): _*)
      .unionByName(unmatchedNulls)
  }

  /** Pack assembly — the step after [[packGreedyContiguous]]: per
    * (pack_bucket, pack_bin), the member documents' id arrays
    * concatenated in the PACK FOLD ORDER (mix48 hash, then key — the
    * same order the greedy fold consumed, recomputed from the key
    * rather than trusted from collect order) plus the token-offset
    * boundary of each document — what an attention-masking dataloader
    * needs to keep packed documents from attending to each other.
    *
    * Output: (pack_bucket, pack_bin, ids_csv, boundaries_csv, n_docs,
    * n_tokens) — the sequences render as CSV strings (the id arrays
    * are BIGINT lists; CSV keeps the row a flat scalar record any
    * sink/gate can hash). boundaries_csv holds each member's START
    * offset (n_docs entries, first always 0); zero-token members
    * contribute a repeated offset and no ids.
    *
    * Scale shape: one hash aggregation keyed by the pack — state per
    * group is the pack's own members (≤ binTokens tokens by
    * construction), and the prefix-sum/concat run as per-row
    * higher-order expressions after an array_sort of that bounded
    * member list. Nothing global, nothing driver-side. */
  def assemblePackedSequences(packed: DataFrame, keyCol: String,
      idsCol: String, nTokensCol: String): DataFrame = {
    require(Seq("pack_bucket", "pack_bin").forall(packed.columns.contains),
      s"packed must carry (pack_bucket, pack_bin) — packGreedyContiguous output, " +
        s"got ${packed.columns.mkString(",")}")
    val h = graft.functions.Mix48.mix48(
      graft.text.TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 48))
    val asm = expr(
      s"""aggregate(__m,
         |  named_struct('offs', cast(array() AS ARRAY<BIGINT>),
         |               'ids',  cast(array() AS ARRAY<BIGINT>), 'cum', 0L),
         |  (acc, x) -> named_struct(
         |    'offs', concat(acc.offs, array(acc.cum)),
         |    'ids',  concat(acc.ids, x.ids),
         |    'cum',  acc.cum + x.n))""".stripMargin)
    packed
      .select(col("pack_bucket"), col("pack_bin"),
        // tie-break on the key in its NATIVE type (a string cast would
        // order 10 before 9); ties on the 48-bit mix are near-impossible
        // but the fold's order is (hash, key) and assembly must match it
        struct(h.as("h"), col(keyCol).as("k"),
          col(idsCol).as("ids"), col(nTokensCol).cast("long").as("n")).as("__s"))
      .groupBy(col("pack_bucket"), col("pack_bin"))
      .agg(collect_list(col("__s")).as("__raw"))
      .withColumn("__m", array_sort(col("__raw")))
      .withColumn("__a", asm)
      .select(col("pack_bucket"), col("pack_bin"),
        array_join(col("__a.ids"), ",").as("ids_csv"),
        array_join(col("__a.offs"), ",").as("boundaries_csv"),
        size(col("__m")).cast("long").as("n_docs"),
        col("__a.cum").as("n_tokens"))
  }

  /** Curriculum staging: partition a scored corpus into `nStages`
    * difficulty bands by exact score percentiles — stage 1 holds the
    * lowest scores (easiest, when the score is a difficulty signal
    * like surprisal), stage `nStages` the highest. A training loader
    * then feeds stages in order (optionally with q53's deterministic
    * within-stage shuffle — composable, not baked in).
    *
    * Banding is by VALUE against the (nStages−1) interior percentile
    * boundaries, not by rank: ties land in the same stage (a global
    * ntile would split equal scores arbitrarily across stages AND
    * need a single-partition window — the non-starter at corpus
    * scale). Stage sizes are therefore approximately equal, exactly
    * equal only when scores are distinct at the boundaries.
    * Boundaries are interpolated percentiles rounded to 4 decimals on
    * both engines (the q34-proven parity discipline); scores are
    * integers, so a boundary only ever ties a score when it IS one.
    *
    * Scale shape: one exact-percentile aggregation (single row, all
    * boundaries in one array) broadcast back over the corpus; the
    * stage expression is per-row arithmetic — no shuffle beyond the
    * aggregation, no window anywhere. Output: every input column plus
    * `stage` (1-based long). */
  def curriculumStages(scored: DataFrame, scoreCol: String,
      nStages: Int): DataFrame = {
    require(nStages >= 2 && nStages <= 1000,
      s"nStages must be in [2, 1000]: $nStages")
    require(!scored.columns.contains("stage"),
      "input already carries a 'stage' column")
    val qs = (1 until nStages).map(i => i.toDouble / nStages)
    val bounds = scored.agg(
      expr(s"percentile($scoreCol, array(${qs.mkString(",")}))").as("__bs"))
      .select(transform(col("__bs"), b => round(b, 4)).as("__bs"))
    scored.crossJoin(broadcast(bounds))
      // a NULL score nulls the filter lambda and would silently land the
      // row in stage 1 — fail loudly (deterministicSplit's guard idiom)
      .withColumn("stage",
        when(col(scoreCol).isNull, raise_error(
          lit(s"curriculumStages: NULL values in score column '$scoreCol'"))
          .cast("long"))
          .otherwise(lit(1L) + size(filter(col("__bs"),
            b => col(scoreCol).cast("double") > b)).cast("long")))
      .drop("__bs")
  }
}
