package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash. All four share the same scale
  * shape: per-row signature computation (no explode, no shuffle for the
  * signatures themselves), then a bucket-equality self-join so candidate
  * generation is an equi-join (hash shuffle on bucket id), never an
  * all-pairs product. Only verified candidates pay the exact-similarity
  * cost.
  *
  * PERF: signature pipelines are *staged* through separate selects —
  * tokens → shingle hashes → signature — so each layer is a materialized
  * array attribute. Nesting them into one expression re-evaluates the
  * inner layer once per outer lambda element (O(n²)–O(64·n²) per row;
  * observed 100× slowdowns). The multi-referenced non-cheap aliases also
  * stop Catalyst's CollapseProject from re-inlining them.
  *
  * Arithmetic stays within positive 62-bit range throughout, so the same
  * expressions run under ANSI mode and reproduce bit-exactly in any
  * BIGINT engine.
  */
object Dedup {

  // ---- exact --------------------------------------------------------

  /** Exact dedup: canonical row = min id per identical text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Incremental corpus merge — the daily production loop: union an
    * incoming batch into the existing corpus, exact-deduping within the
    * batch (keep min id per identity) and dropping anything whose
    * identity the corpus already holds (first writer wins). One window
    * over the (small) incoming batch + one anti-join; at 100 TB the
    * corpus side persists bucketed by fingerprint so the daily anti-join
    * is exchange-free on the big side. Output adds `fp40` and `origin`
    * ('existing' | 'new').
    *
    * Document IDENTITY is (fp40, normalized length), not the 40-bit
    * fingerprint alone: at 2^40 the birthday bound makes bare-fp
    * collisions — silently dropping distinct documents as "duplicates" —
    * expected from ~1M docs (~1 collision) and routine at corpus scale.
    * Requiring equal normalized length too confines collisions to
    * same-length pairs (expected collisions ÷ ≈ the number of distinct
    * length classes — several orders of magnitude at production scale; a
    * deployment needing cryptographic certainty should compare text on
    * identity match, at the cost of carrying text through the join). */
  def incrementalMerge(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def withFp(df: DataFrame) = df
      .withColumn("fp40", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__nlen", TextFunctions.normalizedLength(col(textCol)))
    val exF = withFp(existing)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp40"), col("__nlen")).orderBy(col(idCol))
    val inDeduped = withFp(incoming)
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn")
    val newDocs = inDeduped.join(exF.select(col("fp40"), col("__nlen")),
      Seq("fp40", "__nlen"), "left_anti")
    exF.withColumn("origin", lit("existing"))
      .unionByName(newDocs.withColumn("origin", lit("new")))
      .drop("__nlen")
  }

  // ---- n-gram Jaccard (exact, block-bounded) ------------------------

  /** Exact Jaccard over distinct k-word shingle sets for all pairs
    * within a blocking key. The block bounds the quadratic term: with B
    * blocks of n/B docs the pair count drops by ×B, and each block's
    * self-join is an equi-join on the block key (both sides arrive
    * pre-partitioned by block, so the join reuses the exchange). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleSize: Int, threshold: Double,
      hashShingles: Boolean = false): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol).as("id"), col(blockCol).as("block"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(parts, col("block"))
    // hashShingles: intersect 64-bit hashes instead of strings — ~8-byte
    // elements instead of variable-width UTF8 cuts both the pair-join
    // shuffle and the per-pair set-op cost. Jaccard values are identical
    // absent xxhash64 collisions (P ≈ |shingles|²/2^64 per pair — for the
    // oracle-checked gate this has held over every tested corpus).
    val shingleSet = {
      val raw = array_distinct(TextFunctions.wordShinglesFrom(col("toks"), shingleSize))
      if (hashShingles) transform(raw, s => xxhash64(s)) else raw
    }
    // Blank documents have EMPTY shingle sets; two of them in one block
    // would reach the pair join and evaluate 0/0 (a DIVIDE_BY_ZERO crash
    // under Spark 4's default ANSI mode, not a suppressed pair). Drop
    // them here — "no shingles → no pairs" is the documented contract.
    val base = toks.select(col("id"), col("block"), shingleSet.as("shingles"))
      .where(size(col("shingles")) > 0)
    val a = base.select(col("block"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = base.select(col("block"), col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("block")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double").as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        // fenced: an unfenced filter on this alias would re-substitute the
        // set-intersection into a pushed filter copy (functions.Fence)
        graft.functions.Fence.fence(
          col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Inverted-index formulation of exact Jaccard — the 100 TB path for
    * sparse corpora: explode shingles into postings, count co-occurrences
    * per pair (only pairs sharing ≥1 shingle ever materialize), then join
    * set sizes. Beats the block-quadratic form whenever most pairs share
    * nothing; on corpora with ultra-common shingles the hot posting's d²
    * contribution dominates. `maxDf` is the guard: shingles held by more
    * than `maxDf` documents are dropped from the shingle universe before
    * the pair join (both intersection AND sizes — the result is the exact
    * Jaccard over the capped shingle sets, so values stay engine-
    * reproducible; SkewSpec proves equivalence with pre-filtered text).
    * An ultra-common shingle carries ~no similarity signal but d²/2 pair
    * contributions, so the cap trades a vanishing score perturbation for
    * the hot key's quadratic term. None = exact, uncapped (AQE skew-join
    * splits a hot posting partition, but cannot remove its d² pairs). */
  def jaccardPairsInverted(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, threshold: Double,
      maxDf: Option[Long] = None): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(parts)
    val shingled = toks.select(col("id"),
      array_distinct(TextFunctions.wordShinglesFrom(col("toks"), shingleSize)).as("shingles"))
    val allPostings = shingled.select(col("id"), explode(col("shingles")).as("s"))
    val postings = maxDf match {
      case Some(cap) =>
        // document frequency per shingle; keep the sparse tail. The df
        // aggregation is a map-side-combined count — the hot shingle
        // never shuffles more than one row per partition.
        val keep = allPostings.groupBy(col("s"))
          .agg(count(lit(1)).as("df")).where(col("df") <= cap)
          .select(col("s"))
        allPostings.join(keep, Seq("s"))
      case None => allPostings
    }
    val sizes = maxDf match {
      case Some(_) => postings.groupBy(col("id")).agg(count(lit(1)).as("n"))
      case None => shingled.select(col("id"), size(col("shingles")).as("n"))
    }
    val co = postings.as("x").join(postings.as("y"), Seq("s"))
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        // fenced: an unfenced filter on this alias would re-substitute the
        // set-intersection into a pushed filter copy (functions.Fence)
        graft.functions.Fence.fence(
          col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Combine a k-window of 31-bit token hashes into one 40-bit shingle
    * fingerprint: fold with (acc·A + h) mod 2^40, A = 1000003 (every
    * intermediate < 2^61 — BIGINT-reproducible). Shingle IDENTITY is what
    * the audit needs, not the shingle string: deriving it arithmetically
    * from a materialized token-hash array skips building every k-word
    * string and re-folding its characters (measured ~2× on the whole
    * query). Fewer than k tokens → one whole-doc fingerprint; none →
    * empty (mirrors wordShinglesFrom).
    *
    * This is the interpreted HOF *reference* form — the hot path runs the
    * fused codegen [[graft.functions.ShingleFps]] expression instead
    * (ShingleFpsSpec asserts bit parity between the two). */
  private[graft] def shingleFpsHof(toks: Column, k: Int): Column = {
    val th = transform(toks, t => TextFunctions.polyHash(t, 1L << 31))
    def fold(win: Column): Column =
      aggregate(win, lit(0L), (acc, h) => (acc * 1000003L + h) % HashMod)
    when(size(th) >= k,
      transform(sequence(lit(1), size(th) - lit(k - 1)),
        i => fold(slice(th, i, lit(k)))))
      .when(size(th) > 0, array(fold(th)))
      .otherwise(array().cast("array<long>"))
  }

  /** Cross-source n-gram contamination — the train/eval-overlap audit:
    * for every source pair, the number of distinct k-word shingle
    * fingerprints both contain and the exact set Jaccard. The exact
    * counterpart of the MinHash sketch estimate (MinHashSketchAgg /
    * q37): run the sketch corpus-wide, this audit on flagged pairs. See
    * the bitmask notes inside for the ≤ 64-source aggregation shape. */
  def sourceShingleOverlap(df: DataFrame, textCol: String, srcCol: String,
      shingleSize: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(srcCol).as("source"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(parts)
    // Fused codegen shingle fingerprints (graft.functions.ShingleFps):
    // one loop per row — tokenize → hash → window-fold — inside
    // whole-stage codegen, replacing the interpreted HOF staging that
    // dominated this query's cost (see shingleFpsHof for the parity
    // reference).
    val hashed = toks.select(col("source"),
      array_distinct(graft.functions.ShingleFps.shingleFps(col("toks"), shingleSize)).as("hs"))
    val postings = hashed.select(col("source"), explode(col("hs")).as("h"))

    // Source-bitmask aggregation: with ≤ 64 sources (an audit runs over
    // NAMED sources — crawls, dumps, benchmark sets), each shingle hash
    // reduces to one long: bit_or of the owning sources' bits. bit_or is
    // idempotent, so duplicate (source, shingle) postings need no
    // distinct; the partial aggregate is a codegen'd long OR, so the one
    // exchange carries |distinct shingles| longs. Everything after —
    // count per distinct mask, then resolving masks against the ≤
    // n·(n−1)/2 broadcast pair list — is tiny. (More than 64 sources:
    // run per 64-source block, or widen to an array of mask words.)
    val spark = df.sparkSession
    val srcs = df.select(col(srcCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(srcs.length <= 64,
      s"sourceShingleOverlap bitmask path supports ≤ 64 sources, got ${srcs.length}")
    val bitCol = srcs.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, i)) =>
      when(col("source") === s, lit(1L << i)).otherwise(acc)
    }
    val maskCnt = postings.groupBy(col("h")).agg(bit_or(bitCol).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))

    import spark.implicits._
    val pairsDf = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield (srcs(i), srcs(j), 1L << i, 1L << j)).toDF("src_a", "src_b", "ba", "bb")
    val srcDf = srcs.zipWithIndex.toSeq
      .map { case (s, i) => (s, 1L << i) }.toDF("src", "b")

    val co = maskCnt.crossJoin(broadcast(pairsDf))
      .where((col("m").bitwiseAND(col("ba")) =!= 0) &&
        (col("m").bitwiseAND(col("bb")) =!= 0))
      .groupBy(col("src_a"), col("src_b")).agg(sum(col("cnt")).as("n_shared"))
    val sizes = maskCnt.crossJoin(broadcast(srcDf))
      .where(col("m").bitwiseAND(col("b")) =!= 0)
      .groupBy(col("src")).agg(sum(col("cnt")).as("n"))

    co.join(sizes.select(col("src").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 4).as("jaccard"))
  }

  /** Connected components over an undirected near-dup pair list —
    * the clustering step that turns pairwise similarity output into
    * dedup groups (canonical id = min id per component). Iterative
    * min-label propagation: each round, every node takes the minimum of
    * its own and its neighbors' labels; converged when a round changes
    * nothing. Rounds needed = graph diameter — near-dup components are
    * shallow (dups of dups of one original), so the loop is short; each
    * round is one equi-join + groupBy min, label frames are
    * `localCheckpoint`ed to cut the otherwise-unbounded lineage growth
    * (the one place truncation is the point; a production run on a
    * lossy cluster would use reliable `checkpoint` instead), and the
    * driver only ever
    * sees a change COUNT, never data. At extreme diameters the
    * alternating large-star/small-star formulation (O(log n) rounds)
    * would replace the per-hop loop; not needed for dedup graphs.
    *
    * Returns (id, component) for every id appearing in `pairs`. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    val und = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    var labels = und.select(col("u")).distinct()
      .withColumn("label", col("u")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbr = und.join(labels.select(col("u").as("v"), col("label")), "v")
        .groupBy(col("u")).agg(min(col("label")).as("nl"))
      val hop = labels.join(nbr, Seq("u"), "left")
        .select(col("u"), col("label").as("old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("l1"))
      // Pointer jumping: also take the label OF the label (every label is
      // itself a node with an entry), so label information travels 2^k
      // hops after k rounds — convergence in O(log diameter) rounds
      // instead of O(diameter), which is what bounds the driver loop.
      val jumped = hop.join(
          hop.select(col("u").as("l1"), col("l1").as("ll")), Seq("l1"), "left")
        .select(col("u"), col("old"),
          least(col("l1"), coalesce(col("ll"), col("l1"))).as("label"))
        .localCheckpoint()
      val changes = jumped.where(col("label") =!= col("old")).count()
      labels = jumped.select(col("u"), col("label"))
      converged = changes == 0
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "(diameter exceeds the bound — raise maxIter or use star-contraction)")
    labels.select(col("u").as("id"), col("label").as("component"))
  }

  /** Connected components when every edge lives inside a blocking key
    * (near-dup pairs from a blocked generator never span blocks): one
    * shuffle on the block, then an in-memory union-find per block —
    * no driver-side iteration at all. Correct whenever a block's edge
    * list fits an executor (blocks are bounded by construction in
    * blocked dedup); DedupSpec asserts equality with the iterative
    * formulation. Output (id, component), component = min member id. */
  def connectedComponentsWithin(pairs: DataFrame, aCol: String, bCol: String,
      blockCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(blockCol).cast("string").as("blk"),
        col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (_, u, v) =>
          parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) parent(if (ru < rv) rv else ru) = math.min(ru, rv)
        }
        // roots carry the min id already (union always points to the min)
        parent.keysIterator.map(id => (id, find(id)))
      }
      .toDF("id", "component")
      // The block-local contract (no edge spans blocks) was previously
      // only documented; an id appearing in two blocks would emit
      // conflicting (id, component) rows and corrupt downstream
      // canonical-id selection. Enforce it: one component per id, or
      // the job fails at execution.
      .groupBy(col("id"))
      .agg(min(col("component")).as("component"), count(lit(1)).as("__n"))
      .select(col("id"),
        when(col("__n") === 1, col("component"))
          .otherwise(raise_error(concat(lit("connectedComponentsWithin: id "),
            col("id"), lit(" appears in multiple blocks — edges must be block-local"))))
          .as("component"))
  }

  // ---- MinHash + LSH ------------------------------------------------

  final case class MinHashConfig(numHashes: Int = 64, shingleSize: Int = 3,
      bands: Int = 16) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand: Int = numHashes / bands
  }

  private val HashMod = 1L << 40

  /** Deterministic (a,b) params for the universal hash family
    * h_i(x) = (a_i * x + b_i) mod 2^40, generated by a fixed xorshift.
    * 31-bit positive a,b × 31-bit positive x stays < 2^62: no overflow. */
  /** Shared with MinHashSketchAgg so sketches stay comparable. */
  def hashParamsPublic(n: Int): Seq[(Long, Long)] = hashParams(n)

  private[dedup] def hashParams(n: Int): Seq[(Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      (state & 0x7FFFFFFFL) | 1L
    }
    Seq.fill(n)((next(), next()))
  }

  /** 31-bit positive shingle hashes from a materialized shingles column.
    * Polynomial char-fold instead of xxhash64 so the full LSH pipeline —
    * signatures, band buckets, verified pairs — is reproducible by the
    * DuckDB oracle (see TextFunctions.polyHash). */
  private[dedup] def shingleHashes(shingles: Column): Column =
    transform(shingles, s => TextFunctions.polyHash(s, 1L << 31))

  /** Signature from a *materialized* shingle-hash column — the
    * interpreted HOF *reference* form: `numHashes` independent array_min
    * expressions, each one interpreted pass over the long array. The hot
    * path runs the fused codegen [[graft.functions.MinHashSig]] instead
    * (one loop for all minima; MinHashSigSpec pins bit parity). */
  private[graft] def signatureFromHof(shs: Column, cfg: MinHashConfig): Column =
    array(hashParams(cfg.numHashes).map { case (a, b) =>
      array_min(transform(shs, h => (lit(a) * h + lit(b)) % HashMod))
    }: _*)

  /** Single-expression signature for tests/small inputs (quadratic
    * re-evaluation inside — see the object-level PERF note). */
  def minhashSignature(text: Column, cfg: MinHashConfig): Column = {
    val shs = shingleHashes(
      array_distinct(TextFunctions.wordShingles(text, cfg.shingleSize)))
    array(hashParams(cfg.numHashes).map { case (a, b) =>
      array_min(transform(shs, h => (lit(a) * h + lit(b)) % HashMod))
    }: _*)
  }

  /** LSH band hashes from a materialized signature column: polynomial
    * fold of each band's signature slice (40-bit values × 1000003 stays
    * < 2^61 — overflow-free, BIGINT-reproducible). Collisions only add
    * candidates, which exact verification then rejects on both engines
    * identically. */
  private[dedup] def bandHashesFrom(sig: Column, cfg: MinHashConfig): Column =
    array((0 until cfg.bands).map(i =>
      aggregate(slice(sig, i * cfg.rowsPerBand + 1, cfg.rowsPerBand), lit(0L),
        (acc, v) => (acc * 1000003L + v) % HashMod)): _*)

  /** Full MinHash-LSH near-dup pipeline: staged signatures → band-bucket
    * equi-join candidates → exact-Jaccard verification at `threshold`.
    * LSH recall at the default shape (16 bands × 4 rows) is ≳99% for
    * J ≥ 0.8. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, cfg: MinHashConfig = MinHashConfig()): DataFrame =
    minhashNearDupPairsImpl(df, idCol, textCol, threshold, cfg, focusCol = None)

  /** Focused variant: only pairs with at least one TRUE `focusCol`
    * endpoint — the incremental-curation form, where the focus rows are
    * a daily delta and the rest an already-deduped corpus. The band
    * join's probe side ranges over focus rows only, so corpus×corpus
    * candidates (provably irrelevant to a delta-only drop rule) are
    * never generated and the LSH cost scales with |delta|, not
    * |corpus|. With every row focused this is exactly
    * [[minhashNearDupPairs]]. `focusCol` must be BOOLEAN. */
  def minhashNearDupPairsFocused(df: DataFrame, idCol: String, textCol: String,
      focusCol: String, threshold: Double,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    // fail fast on the documented contract — a non-boolean column would
    // otherwise surface as a confusing cast error deep in the band-join plan
    val dt = df.schema(focusCol).dataType
    require(dt == org.apache.spark.sql.types.BooleanType,
      s"minhashNearDupPairsFocused: focusCol '$focusCol' must be BOOLEAN, got $dt")
    minhashNearDupPairsImpl(df, idCol, textCol, threshold, cfg, Some(focusCol))
  }

  private def minhashNearDupPairsImpl(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, cfg: MinHashConfig, focusCol: Option[String]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // NULL focus would silently drop the row from the probe side (its
    // near-dups kept undetected) — raise instead, like deterministicSplit
    val focus = focusCol.map(c =>
      when(col(c).isNull, raise_error(
        lit(s"minhashNearDupPairsFocused: NULL in focus column '$c'")))
        .otherwise(col(c))).getOrElse(lit(true))
    val toks = df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"), focus.as("__focus"))
      .repartition(parts) // small-file scans arrive as 1 partition
    val shingled = toks.select(col("id"), col("__focus"),
      array_distinct(TextFunctions.wordShinglesFrom(col("toks"), cfg.shingleSize)).as("shingles"))
    val hashed = shingled.select(col("id"), col("__focus"), col("shingles"),
      shingleHashes(col("shingles")).as("shs"))
    // Consumed twice (band explode + verification re-join): persist so
    // the shingle→hash→signature stage computes and codegen-compiles
    // once, not per branch. persist (not localCheckpoint) keeps lineage,
    // so a lost executor block recomputes instead of failing the job.
    // One row per doc: signature (numHashes longs) + shingle set;
    // MEMORY_AND_DISK spills at scale. Registered with CacheScope —
    // callers release via CacheScope.releaseAll after materializing.
    val sigs = graft.ops.CacheScope.persist(
      hashed.select(col("id"), col("__focus"), col("shingles"),
        graft.functions.MinHashSig.minhashSig(col("shs"), cfg.numHashes).as("sig")))
    val banded = sigs.select(col("id"), col("__focus"),
      posexplode(bandHashesFrom(col("sig"), cfg)).as(Seq("band", "bhash")))

    val cand = focusCol match {
      case None =>
        banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
      case Some(_) =>
        // probe side = focus rows only; normalize to (min, max) so a
        // pair found from either endpoint dedups to one row
        banded.where(col("__focus")).as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
              col("x.id") =!= col("y.id"))
          .select(least(col("x.id"), col("y.id")).as("id_a"),
            greatest(col("x.id"), col("y.id")).as("id_b"))
          .distinct()
    }

    val sets = sigs.select(col("id"), col("shingles"))
    cand
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double").as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        // fenced: an unfenced filter on this alias would re-substitute the
        // set-intersection into a pushed filter copy (functions.Fence)
        graft.functions.Fence.fence(
          col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ------------------------------------------------------

  val SimHashBits = 48 // keeps every partial sum < 2^49: ANSI-safe

  /** 48-bit SimHash from a *materialized* positive-hash column: bit b of
    * the result is the majority vote of token-hash bit b. Shift-by-column
    * doesn't exist in Spark, so the bit test is modular arithmetic
    * (`h mod 2p ≥ p` ⟺ bit at power p set). */
  private def simhashFromHashes(th: Column): Column = {
    val powers = array((0 until SimHashBits).map(b => lit(1L << b)): _*)
    val majorityBits = transform(powers, p =>
      when(size(filter(th, h => h % (p * 2) >= p)) * 2 > size(th), p).otherwise(lit(0L)))
    aggregate(majorityBits, lit(0L), (acc, v) => acc + v)
  }

  /** Avalanche finalizer over the 48-bit space for the polynomial token
    * hash, murmur-style: xor-shift / multiply rounds. Two problems with
    * the raw poly fold that this fixes: (1) a short token's fold never
    * reaches the top bits (bounded by 31^len), leaving high SimHash bit
    * positions degenerate; (2) the fold is affine in the last characters,
    * so prefix-sharing tokens get correlated bit patterns and majority
    * votes lose independence. Multiplication is done on split 24-bit
    * halves — ((a·hi) mod 2^24)·2^24 + a·lo ≡ a·h (mod 2^48) with every
    * intermediate < 2^49 — so the whole mix is BIGINT-reproducible in
    * the DuckDB oracle (constants in [[Mix48Rounds]] drive both sides). */
  val Mix48Muls: Seq[Long] = Seq(10368889L, 8776651L) // odd 24-bit
  val Mix48Shift: Int = 21

  /** JVM twin of the column-level avalanche below — same constants, same
    * arithmetic — for non-Catalyst callers that still need oracle parity
    * (Multimodal's deterministic stub decoder). */
  def mix48Jvm(h0: Long): Long = {
    val m48 = 1L << 48
    def xs(h: Long): Long = h ^ (h >>> Mix48Shift)
    def mul(h: Long, a: Long): Long =
      (((a * (h >>> 24)) % (1L << 24)) * (1L << 24) + a * (h & 0xFFFFFFL)) % m48
    Mix48Muls.foldLeft(xs(h0))((h, a) => xs(mul(h, a)))
  }

  private[graft] def splitMul48(h: Column, a: Long): Column = {
    val m24 = 1L << 24
    (((lit(a) * shiftrightunsigned(h, 24)) % m24) * m24 +
      lit(a) * h.bitwiseAND(lit(m24 - 1))) % (1L << SimHashBits)
  }

  private[graft] def xorShift48(h: Column): Column =
    h.bitwiseXOR(shiftrightunsigned(h, Mix48Shift))

  /** 48-bit positive token hashes — polynomial char-fold + avalanche so
    * the SimHash gate query is DuckDB-oracle-reproducible. Each round is
    * staged through its own nested transform: a lambda variable is a
    * cheap leaf, so the multi-referenced intermediate values (xor + shift
    * + hi/lo splits) never re-evaluate the char fold. */
  private[dedup] def tokenHashes48(dts: Column): Column = {
    val poly = transform(dts, t => TextFunctions.polyHash(t, 1L << SimHashBits))
    Mix48Muls.foldLeft(transform(poly, h => xorShift48(h))) { (arr, a) =>
      transform(transform(arr, h => splitMul48(h, a)), h => xorShift48(h))
    }
  }

  /** Single-expression form for tests/small inputs. */
  def simhash(text: Column): Column =
    simhashFromHashes(tokenHashes48(TextFunctions.distinctTokens(text)))

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxDist, via 4-band exact-match
    * bucketing (pigeonhole: hd ≤ 3 ⇒ at least one of 4 bands equal, so
    * recall is exact for maxDist ≤ 3).
    *
    * `blockCol`: optional extra blocking key. The pure 4-segment scheme
    * assumes dispersed hashes (true for real corpora); on a corpus whose
    * documents share most of their vocabulary the segment buckets cluster
    * and candidate generation degenerates toward all-pairs — a blocking
    * key restores the bound. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, blockCol: Option[String] = None): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val bandBits = SimHashBits / 4
    val mask = (1L << bandBits) - 1
    val blockKey = blockCol.map(col).getOrElse(lit(""))
    val toks = df.select(col(idCol).as("id"), blockKey.as("blk"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .repartition(parts)
    // Fused codegen SimHash (graft.functions.SimHash48): hash+mix each
    // distinct token once and take the 48 majority votes in one loop,
    // replacing the 7-layer interpreted mix + 48 interpreted filter
    // passes of the staged HOF form (kept below as the parity
    // reference — SimHash48Spec pins them bit-equal).
    //
    // base is consumed by FOUR downstream branches (the distinct-signature
    // frame and both sides of each pair expansion). Persist it once: it is
    // three scalar columns per document, and without the reuse every
    // branch re-runs tokenize+simhash AND re-compiles its own copy of the
    // generated scan fragment (measured compile-bound at sf0.1). persist
    // keeps lineage — lost blocks recompute rather than failing the job
    // the way a truncated localCheckpoint would. Registered with
    // CacheScope — callers release via CacheScope.releaseAll.
    val base = graft.ops.CacheScope.persist(
      toks.select(col("id"), col("blk"),
        graft.functions.SimHash48.simhash48(array_distinct(col("toks"))).as("sh")))
    // Collapse to distinct (blk, signature) rows BEFORE the band join: on
    // a shared-vocabulary corpus many documents hash to the same SimHash,
    // so pairing raw rows makes the hot band buckets quadratic in
    // *documents*; pairing distinct signatures is quadratic only in
    // signatures, and the expansion back to documents afterwards is
    // proportional to the true output size. A plain distinct (codegen'd
    // HashAggregate) replaces the earlier collect_list members rollup —
    // the object-hash aggregate and its array machinery were the largest
    // one-time codegen-compile cost in the whole query.
    val sigs = base.select(col("blk"), col("sh")).distinct()
    val banded = sigs.select(col("blk"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh"), i * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bval")))
    val sigPairs = banded.as("x").join(banded.as("y"),
        col("x.blk") === col("y.blk") &&
          col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.sh") < col("y.sh"))
      .select(col("x.blk").as("blk"), col("x.sh").as("sh_a"), col("y.sh").as("sh_b"),
        hamming(col("x.sh"), col("y.sh")).as("hamming_dist"))
      // filter BEFORE dedup: candidates that fail the hamming bound never
      // enter the distinct's shuffle (bands make most candidates fail).
      .where(col("hamming_dist") <= maxDist)
      .distinct()
    // Cross-signature pairs: every document of signature A × every
    // document of signature B, via two equi-joins back to the per-doc
    // frame (no member arrays to explode).
    val inter = sigPairs
      .join(base.select(col("blk"), col("sh").as("sh_a"), col("id").as("id_x")),
        Seq("blk", "sh_a"))
      .join(base.select(col("blk"), col("sh").as("sh_b"), col("id").as("id_y")),
        Seq("blk", "sh_b"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"), col("hamming_dist"))
    // Within-signature pairs: identical signatures, hamming 0 — a self
    // equi-join on (blk, sh), quadratic only in each cluster's true size.
    val intra = base.as("p").join(base.as("q"),
        col("p.blk") === col("q.blk") && col("p.sh") === col("q.sh") &&
          col("p.id") < col("q.id"))
      .select(col("p.id").as("id_a"), col("q.id").as("id_b"),
        lit(0).as("hamming_dist"))
    inter.select(col("id_a"), col("id_b"), col("hamming_dist"))
      .unionByName(intra)
  }

  /** Near-dup pairs among PRECOMPUTED fixed-width hash signatures —
    * the signature-agnostic core of [[simhashNearDupPairs]], for
    * hashes that arrive as a column rather than from text: image
    * perceptual hashes (Multimodal.pHash64 — the q133 path), audio
    * fingerprints, any 64-bit sketch. Same exact-match band pigeonhole
    * (hd <= bands-1 ==> some band equal, so recall is EXACT for
    * maxDist <= bands-1; more bands buy a larger exact radius at the
    * cost of shorter — hotter — band values), same scale shape: banded
    * equi-join on (band, band-value) — never all-pairs — then the
    * exact popcount filter. Signatures here are expected near-unique
    * per item (unlike shared-vocabulary text SimHash), so pairs join
    * directly on items; feed the distinct-signature collapse of
    * [[simhashNearDupPairs]] first if a corpus clusters onto few
    * hashes. */
  def hammingNearDupPairs(df: DataFrame, idCol: String, hashCol: String,
      totalBits: Int = 64, maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(bands >= 2 && maxDist <= bands - 1,
      s"hammingNearDupPairs: $bands-band pigeonhole is exact only for maxDist <= ${bands - 1}, got $maxDist" +
        (if (bands == 1) " (bands=1 would also degenerate the banded equi-join to all-pairs: one 64-bit band's 1L<<64 mask wraps to 0)" else ""))
    require(totalBits % bands == 0 && totalBits >= bands && totalBits <= 64,
      s"hammingNearDupPairs: totalBits must be a multiple of $bands in [$bands, 64], got $totalBits")
    val bandBits = totalBits / bands
    // bands >= 2 keeps bandBits <= 32, so the shift never wraps
    val mask = (1L << bandBits) - 1
    val sigs = df.select(col(idCol).cast("long").as("id"),
      col(hashCol).cast("long").as("hh"))
    val banded = sigs.select(col("id"), col("hh"),
      posexplode(array((0 until bands).map(i =>
        shiftrightunsigned(col("hh"), i * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bval")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.hh"), col("b.hh")).cast("long").as("hamming_dist"))
      .where(col("hamming_dist") <= maxDist)
      // a pair can match in several bands — one row per pair
      .distinct()
  }

  // ---- span-level (substring) dedup ---------------------------------

  /** Duplicated-span extents — the Lee-et-al-style substring dedup pass
    * (Deduplicating Training Data Makes Language Models Better, 2022):
    * for each document, the maximal token ranges covered by
    * `spanTokens`-token windows whose fingerprint occurs in at least
    * `minDf` distinct documents. Where the document-level family
    * (exact / Jaccard / MinHash / SimHash) drops whole documents, this
    * finds the REGIONS that are corpus-repeated — licenses, navigation
    * chrome, boilerplate headers — so a curation pass can excise the
    * span and keep the unique remainder.
    *
    * Mechanics: every `spanTokens`-token window gets the 40-bit
    * [[graft.functions.ShingleFps]] fingerprint (one fused codegen loop
    * per row); a window is *duplicated* when its fingerprint appears in
    * ≥ `minDf` distinct documents; per document, duplicated window
    * starts closer than `spanTokens` (overlapping or exactly adjacent
    * spans) merge into one extent via gaps-and-islands. Documents
    * shorter than `spanTokens` tokens cannot contain a qualifying span
    * and are absent from the output.
    *
    * Output: (id, span_start, span_end, span_tokens, n_dup_shingles),
    * token positions 1-based inclusive; one row per maximal extent.
    *
    * Scale shape: postings are (id, pos, fp) longs — text never rides
    * an exchange. One document-frequency hash agg (map-side combined;
    * the 40-bit fp key is near-unique so the agg has no hot key), a
    * LEFT SEMI join of postings against the duplicated-fp set (hot
    * corpus-wide fps are build-side rows probed with bounded per-row
    * work, the boilerplateCoverage discipline), then one per-document
    * window — state bounded by the document's own hit count. At 100 TB
    * the df agg and semi join shuffle |postings| ≈ |tokens| rows of
    * three longs each; nothing is quadratic and nothing is collected. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDf: Long = 2L): DataFrame = {
    val (postings, dfs) = spanIndex(df, idCol, textCol, spanTokens)
    duplicatedSpansFromIndex(postings, dfs, spanTokens, minDf)
  }

  /** The carried state behind [[duplicatedSpans]] — the daily-loop
    * form of the substring-dedup pass: a postings frame (id, pos, fp)
    * and a per-fingerprint document-frequency frame (fp, ndocs). Both
    * are ADDITIVE over disjoint document sets (df counts DISTINCT docs,
    * and disjoint increments contribute disjoint doc sets — the
    * incrementalMerge / bm25Index delta discipline): a daily ingest
    * shingles only its delta and merges with [[mergeSpanIndex]], never
    * re-tokenizing the standing corpus. Disjointness of document ids
    * across merged increments is the caller's contract. */
  def spanIndex(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): (DataFrame, DataFrame) = {
    require(spanTokens >= 2, s"spanTokens must be >= 2: $spanTokens")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // partition by id, not round-robin: splits single-partition
    // small-file scans like the usual repartition(parts), AND the
    // downstream per-document window reuses the hash distribution —
    // the postings shuffle once, not twice (the df-agg branch
    // re-shuffles on fp regardless)
    val inst = shinglePostings(df, idCol, textCol, spanTokens)
      .repartition(parts, col("id"))
    val dfs = inst.groupBy(col("fp"))
      .agg(countDistinct(col("id")).as("ndocs"))
    (inst, dfs)
  }

  /** Merge two [[spanIndex]] increments over disjoint document sets:
    * postings concatenate, per-fp document frequencies add.
    * Associative — fold any number of daily deltas; a span that only
    * becomes corpus-duplicated once the delta lands (df crossing
    * `minDf` at the merged count) is found exactly as the full-corpus
    * pass would find it. */
  def mergeSpanIndex(a: (DataFrame, DataFrame), b: (DataFrame, DataFrame))
      : (DataFrame, DataFrame) =
    (a._1.unionByName(b._1),
      a._2.unionByName(b._2).groupBy(col("fp"))
        .agg(sum(col("ndocs")).as("ndocs")))

  /** [[duplicatedSpans]] over a prebuilt (or incrementally merged)
    * index — re-threshold the carried document frequencies and run the
    * per-document extent merge. Input-side work (tokenize, shingle,
    * df agg) is what the index carries; this is the output-side
    * recompute only. */
  def duplicatedSpansFromIndex(postings: DataFrame, dfs: DataFrame,
      spanTokens: Int, minDf: Long = 2L): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2: $spanTokens")
    require(minDf >= 2, s"minDf must be >= 2 (a span is duplicated across documents): $minDf")
    val dupFps = dfs.where(col("ndocs") >= minDf).select(col("fp"))
    val hits = postings.join(dupFps, Seq("fp"), "left_semi")
      .select(col("id"), col("pos"))
    // gaps-and-islands: a new extent starts when this duplicated window
    // begins more than spanTokens after the previous one (strictly —
    // start distance == spanTokens means the spans touch end-to-start)
    // (extent merge below; excision of the extents is exciseSpans)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > spanTokens, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (spanTokens - 1).toLong).as("span_end"),
        count(lit(1)).as("n_dup_shingles"))
      .select(col("id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"),
        col("n_dup_shingles"))
  }

  /** Soft dedup — the keep-but-downweight alternative to dropping
    * near-duplicates: every document gets a training weight
    * ⌊10000 / cluster size⌋ basis points from its near-dup component
    * (docs outside any component weigh 10000), so a cluster contributes
    * ~one document's worth of gradient regardless of its size, without
    * discarding intra-cluster variation. `components` is any
    * (id, component) frame — connectedComponents output — so the same
    * weights compose with Jaccard, MinHash, SimHash, or embedding
    * clusters. Output: (id, cluster_size, weight_bp).
    *
    * Scale shape: one bounded groupBy over the component frame, one
    * id-keyed left join back to the corpus — nothing beyond the
    * clustering the caller already paid for. */
  def dedupWeights(df: DataFrame, idCol: String, components: DataFrame): DataFrame = {
    require(Seq("id", "component").forall(components.columns.contains),
      s"components must carry (id, component), got ${components.columns.mkString(",")}")
    val sizes = components.groupBy(col("component")).agg(count(lit(1)).as("n"))
    // collapse to one row per id, raising on duplicates — a doubled id
    // would otherwise fan out the corpus join and double-count the
    // document's training contribution instead of down-weighting it
    val withN = components.join(sizes, "component")
      .groupBy(col("id")).agg(count(lit(1)).as("__c"), max(col("n")).as("n"))
      .select(col("id"),
        when(col("__c") > 1, raise_error(concat(
            lit("dedupWeights: duplicate id in components frame: "),
            col("id").cast("string"))))
          .otherwise(col("n")).as("n"))
    df.select(col(idCol).as("id"))
      .join(withN, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n"), lit(1L)).as("cluster_size"),
        expr("10000 div coalesce(n, 1)").as("weight_bp"))
  }

  /** Shingle-fingerprint postings of a corpus: (id, pos, fp) with pos
    * the 1-based token position of each k-window. Docs shorter than k
    * are absent (their whole-doc short-form fingerprint is a
    * different-degree fold and must not meet true k-window fps). */
  private def shinglePostings(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("id"),
        graft.functions.ShingleFps.shingleFps(col("toks"), k).as("fps"))
      .select(col("id"), posexplode(col("fps")).as(Seq("p0", "fp")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"), col("fp"))

  /** Passage containment search — "which documents contain this exact
    * token run, and where": the lookup dual of [[duplicatedSpans]], via
    * alignment voting. Both corpus and passages shingle to k-window
    * fingerprint postings; joining on the fingerprint gives (query,
    * doc, alignment = doc_pos − query_pos) votes, and a true
    * containment of an m-token passage yields exactly m−k+1 votes at
    * one alignment. Output: (query_id, doc_id, match_pos) — 1-based
    * token position of the passage's first token, one row per
    * occurrence start. Exact (no false positives up to 40-bit fp
    * collision ∧ full-window agreement); passages shorter than k are
    * rejected.
    *
    * Scale shape: the join ships (id, pos, fp) longs keyed by fp —
    * candidates are bounded by per-fp document frequency times passage
    * length, and the alignment groupBy collapses them before anything
    * else sees them. A passage made ENTIRELY of corpus-hot phrases
    * inherits the hot-key caveat (its windows' posting lists are what
    * the join ships); rare windows keep the join selective. */
  def passageSearch(docs: DataFrame, docIdCol: String, docTextCol: String,
      passages: DataFrame, queryIdCol: String, queryTextCol: String,
      shingleSize: Int): DataFrame = {
    require(shingleSize >= 2, s"shingleSize must be >= 2: $shingleSize")
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val corpus = shinglePostings(docs, docIdCol, docTextCol, shingleSize)
      .repartition(parts, col("fp"))
    // a passage shorter than the window cannot be searched — fail
    // loudly (the lazy distributed-invariant guard), not silently
    // return zero matches
    val qtoks = passages
      .select(col(queryIdCol).as("qid"),
        TextFunctions.tokens(col(queryTextCol)).as("toks"))
      .select(col("qid"),
        when(size(col("toks")) >= shingleSize, col("toks"))
          .otherwise(raise_error(concat(
            lit("passageSearch: passage "), col("qid").cast("string"),
            lit(s" shorter than shingleSize=$shingleSize")))).as("toks"))
    val q = qtoks
      .select(col("qid"),
        graft.functions.ShingleFps.shingleFps(col("toks"), shingleSize).as("fps"))
      // windows per passage carried alongside the explode — the
      // all-windows-matched test needs it, no window function required
      .select(col("qid"), size(col("fps")).cast("long").as("qwins"),
        posexplode(col("fps")).as(Seq("p0", "fp")))
      .select(col("qid"), (col("p0") + 1).cast("long").as("qpos"), col("fp"),
        col("qwins"))
    corpus.join(q, Seq("fp"))
      .groupBy(col("qid"), col("id"), (col("pos") - col("qpos")).as("offset"),
        col("qwins"))
      .agg(count(lit(1)).as("votes"))
      .where(col("votes") === col("qwins"))
      .select(col("qid").as("query_id"), col("id").as("doc_id"),
        (col("offset") + 1L).as("match_pos"))
  }

  /** Span-level eval contamination — the n-gram decontamination pass of
    * GPT-3-style training hygiene: a corpus document is contaminated if
    * it shares ANY `spanTokens`-token window with the held-out set
    * (whole-doc fingerprint identity misses a benchmark question pasted
    * into a larger page; this catches it). Output: (id,
    * n_leaked_windows) — one row per contaminated document with its
    * leaked-window count (the triage signal: 1 window is a quote, 100
    * is a dump).
    *
    * Scale shape: the eval side collapses to DISTINCT window
    * fingerprints (benchmark-sized — small by construction, broadcast
    * build side); the corpus postings probe it in one semi-join-shaped
    * inner join + per-doc count. Corpus text never rides an exchange. */
  def spanContamination(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, spanTokens: Int): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2: $spanTokens")
    val evalFps = shinglePostings(
        evalDocs.select(lit(0L).as("__eid"), col(evalTextCol).as("__etext")),
        "__eid", "__etext", spanTokens)
      .select(col("fp")).distinct()
    shinglePostings(docs, idCol, textCol, spanTokens)
      .join(broadcast(evalFps), Seq("fp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_leaked_windows"))
  }

  /** Excise token extents — the rewrite half of substring dedup: given
    * span extents (id, span_start, span_end — 1-based inclusive token
    * positions, [[duplicatedSpans]]'s output shape), rebuild each
    * document's normalized text without the covered tokens. Every input
    * document appears in the output (docs without extents pass through
    * with n_removed = 0; a fully-covered doc yields an empty string).
    * Output: (id, clean_text, n_tokens_kept, n_tokens_removed), where
    * clean_text is the kept tokens space-joined (the tokens() normal
    * form — lowercased, whitespace-split).
    *
    * Excision removes EVERY occurrence of a duplicated span. To keep
    * one canonical copy per span cluster (the Lee-et-al variant),
    * filter the span frame before calling — e.g. drop each fingerprint
    * cluster's min-id document's extents — the rewrite is agnostic to
    * how the extents were chosen.
    *
    * Scale shape: extents aggregate per document (bounded by the doc's
    * own span count) and join on the id — one shuffle each side; the
    * token filter is a per-row expression; text rides the exchange once
    * (it must: this is a rewrite). */
  def exciseSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    require(Seq("id", "span_start", "span_end").forall(spans.columns.contains),
      s"spans must carry (id, span_start, span_end), got ${spans.columns.mkString(",")}")
    val ext = spans.groupBy(col("id"))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("exts"))
    val staged = df
      // NULL text would null-propagate through tokens/filter/array_join
      // and break the every-document-passes-through contract; treat it
      // as the empty document (clean_text = "", 0 kept, 0 removed)
      .select(col(idCol).as("id"),
        TextFunctions.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .join(ext, Seq("id"), "left")
      // index tokens once (1-based), then keep those no extent covers;
      // staged through selects so each layer evaluates once per row
      .withColumn("indexed",
        transform(col("toks"), (t, i) => struct(t.as("t"), (i + 1L).as("p"))))
      .withColumn("kept",
        when(col("exts").isNull, col("indexed"))
          .otherwise(filter(col("indexed"), x =>
            !exists(col("exts"), e =>
              x.getField("p") >= e.getField("s") && x.getField("p") <= e.getField("e")))))
    staged.select(col("id"),
      array_join(transform(col("kept"), x => x.getField("t")), " ").as("clean_text"),
      size(col("kept")).cast("long").as("n_tokens_kept"),
      (size(col("toks")) - size(col("kept"))).cast("long").as("n_tokens_removed"))
  }

  // ---- candidate-pair verification & cluster canonicalization -------

  /** Edit-distance verification of candidate near-dup pairs — the
    * secondary verify stage a production dedup runs after candidate
    * generation: signature methods (MinHash Jaccard, SimHash hamming)
    * measure SET similarity and can pass pairs whose token
    * multisets/orders differ badly; exact character-level Levenshtein
    * similarity is the stricter referee. Similarity in basis points:
    * sim_bp = 10000 − ⌊10000·lev / max(|a|,|b|)⌋ (two empty texts are
    * identical → 10000); pairs at sim_bp ≥ `minSimBp` survive. NULL
    * text reads as the empty document (candidate generators never emit
    * null-text endpoints — their shingle stages drop them — so this
    * only matters for hand-built pair frames).
    *
    * `pairs` must carry (id_a, id_b) in `docs`' id domain — the output
    * shape of every candidate generator in this object. Output:
    * (id_a, id_b, lev_dist, sim_bp), verified pairs only.
    *
    * Scale shape: texts join the BOUNDED pair frame by id (bare-id
    * discipline — the pair shuffle never carries text until this final
    * verify), and the distance runs once per candidate, never
    * all-pairs. The per-pair cost is NOT the naive O(|a|·|b|) DP: the
    * threshold is algebraically equivalent to a max allowed distance
    * kmax = ⌊(mx·(10001−minSimBp)−1)/10000⌋ (the largest lev with
    * sim_bp ≥ minSimBp under floor division), and Spark's banded
    * three-arg levenshtein computes in O(kmax·min(|a|,|b|)) — exact
    * when ≤ kmax, −1 when the band is exceeded, which IS the reject
    * verdict. At a strict threshold (the production setting — verify
    * means "near-identical") the band is a thin diagonal and the
    * verify pass costs a small fraction of the full DP; the kept
    * pairs' reported lev_dist is exact either way. */
  def editVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, minSimBp: Long): DataFrame = {
    require(minSimBp >= 0L && minSimBp <= 10000L,
      s"minSimBp must be in [0, 10000]: $minSimBp")
    require(Seq("id_a", "id_b").forall(pairs.columns.contains),
      s"pairs must carry (id_a, id_b), got ${pairs.columns.mkString(",")}")
    val t = docs.select(col(idCol).as("__pid"),
      coalesce(col(textCol), lit("")).as("__ptext"))
    pairs.select(col("id_a"), col("id_b"))
      .join(t.select(col("__pid").as("id_a"), col("__ptext").as("__ta")), Seq("id_a"))
      .join(t.select(col("__pid").as("id_b"), col("__ptext").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        greatest(length(col("__ta")), length(col("__tb"))).cast("long").as("__mx"),
        col("__ta"), col("__tb"))
      // banded distance: exact iff lev <= kmax, else -1 (= rejected).
      // kmax derivation: sim_bp >= T  <=>  (10000*lev) div mx <= 10000-T
      //   <=>  10000*lev <= mx*(10000-T) + (mx-1)
      //   <=>  lev <= (mx*(10001-T) - 1) div 10000          (mx >= 1)
      // mx = 0 (two empty texts) passes any threshold with lev 0.
      // fenced: the >= 0 filter on this alias would otherwise re-substitute
      // the banded DP into a pushed filter copy and run it twice per kept
      // pair (functions.Fence — the jaccardPairs pathology)
      .select(col("id_a"), col("id_b"), col("__mx"),
        graft.functions.Fence.fence(
          expr(s"levenshtein(__ta, __tb, " +
            s"greatest((__mx * ${10001L - minSimBp}L - 1) div 10000, 0))")
            .cast("long")).as("lev_dist"))
      .where(col("lev_dist") >= 0L)
      .select(col("id_a"), col("id_b"), col("lev_dist"),
        when(col("__mx") === 0L, lit(10000L))
          .otherwise(lit(10000L) - expr("(10000 * lev_dist) div __mx"))
          .as("sim_bp"))
  }

  /** Quality-ranked canonical selection — which member of each near-dup
    * cluster to KEEP. Keep-first (D1/D2) and min-id canonicalization
    * pick arbitrarily; production corpus curation keeps the
    * highest-quality member (longest/cleanest copy of the page, not the
    * truncated mirror). One representative per cluster: the max
    * `quality_milli` (ties: lowest id); documents in no cluster are
    * singleton clusters of themselves and always survive.
    *
    * `clusters` carries (doc_id, cluster_id) — [[connectedComponentsWithin]]
    * output via q43's shape; ids absent from it are unclustered. Output:
    * (cluster_id, doc_id, quality_milli) — the kept rows, one per
    * cluster, cluster_id = the member-min id for real clusters and the
    * doc's own id for singletons.
    *
    * Scale shape: quality is a per-row expression; the cluster join is
    * an equi-join on the id; the argmax is one window over cluster_id —
    * state bounded per cluster, one shuffle on the cluster key. */
  def canonicalByQuality(docs: DataFrame, idCol: String, textCol: String,
      clusters: DataFrame): DataFrame = {
    require(Seq("doc_id", "cluster_id").forall(clusters.columns.contains),
      s"clusters must carry (doc_id, cluster_id), got ${clusters.columns.mkString(",")}")
    val scored = docs.select(col(idCol).as("doc_id"),
      TextFunctions.qualityMilliFrom(TextFunctions.tokens(col(textCol)))
        .as("quality_milli"))
    // the argmax window keys on (is-singleton, cluster_id), not cluster_id
    // alone: under the documented q43 convention (cluster_id = min MEMBER
    // id) an unclustered doc's id can never equal a real cluster's id, but
    // a foreign labeling could collide them — and a bare cluster_id key
    // would then silently drop one of the two documents. Disambiguating
    // the key keeps both (rather than raising: the collision is only
    // observable after a shuffle, and both rows are individually valid).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__singleton"), col("cluster_id"))
      .orderBy(col("quality_milli").desc, col("doc_id").asc)
    scored
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("__singleton", col("cluster_id").isNull)
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("cluster_id"), col("doc_id"), col("quality_milli"))
  }

  /** Split-leakage audit: near-dup pairs whose endpoints landed in
    * DIFFERENT train/val/test splits — the "dedup before you split"
    * violation detector. A near-dup of a test document sitting in
    * train quietly inflates eval scores; this surfaces every such
    * pair with both labels so the caller can re-assign or drop.
    * Empty result = the split is leak-free w.r.t. the given pair set
    * (only as good as the candidate generator that produced it).
    *
    * `pairs` carries (id_a, id_b) — any candidate/verified pair frame
    * from this object; `assignment` carries (doc_id, split) —
    * ScaleOps.deterministicSplit's shape. A pair endpoint missing
    * from `assignment` fails loudly (an unsplit document in the pair
    * set means the audit inputs are out of sync, not that there is no
    * leak). Output: (id_a, id_b, split_a, split_b).
    *
    * Scale shape: two equi-joins of the BOUNDED pair frame against
    * the bare (id, split) projection — the corpus-sized assignment
    * never widens, the pair frame never carries text. */
  def crossSplitPairs(pairs: DataFrame, assignment: DataFrame): DataFrame = {
    require(Seq("id_a", "id_b").forall(pairs.columns.contains),
      s"pairs must carry (id_a, id_b), got ${pairs.columns.mkString(",")}")
    require(Seq("doc_id", "split").forall(assignment.columns.contains),
      s"assignment must carry (doc_id, split), got ${assignment.columns.mkString(",")}")
    val s = assignment.select(col("doc_id"),
      when(col("split").isNull, raise_error(
        lit("crossSplitPairs: NULL split label in assignment"))
        .cast("string")).otherwise(col("split")).as("split"))
    pairs.select(col("id_a"), col("id_b"))
      .join(s.select(col("doc_id").as("id_a"), col("split").as("split_a")),
        Seq("id_a"), "left")
      .join(s.select(col("doc_id").as("id_b"), col("split").as("split_b")),
        Seq("id_b"), "left")
      .select(Seq(col("id_a"), col("id_b")) ++ Seq("a", "b").map { side =>
        val c = col(s"split_$side")
        when(c.isNull, raise_error(
          lit(s"crossSplitPairs: pair endpoint id_$side missing from assignment"))
          .cast("string")).otherwise(c).as(s"split_$side")
      }: _*)
      .where(col("split_a") =!= col("split_b"))
  }

  /** Winnowed document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    * selection): from the k-token shingle fingerprint sequence, each
    * sliding window of `window` consecutive fingerprints contributes
    * its MINIMUM (rightmost position on ties — the "robust winnowing"
    * rule, so a run of equal minima re-selects one position, not one
    * per window), deduplicated by (position, fp). The guarantee: any
    * shared token run of length ≥ window + k − 1 yields at least one
    * IDENTICAL selected fingerprint in both documents, at ~1/window
    * the density of the full posting list — the sub-linear index for
    * plagiarism/overlap detection that [[duplicatedSpans]]' full
    * postings would oversize at corpus scale. Documents with fewer
    * than `window` shingles winnow their whole (single, short) window;
    * documents under k tokens have no shingles and are absent.
    *
    * Output: (id, pos, fp) — 1-based token position of the selected
    * shingle, its 40-bit fingerprint.
    *
    * Scale shape: selection is one per-row higher-order expression
    * over the fps array (O(m·window) per doc, no shuffle, no UDF);
    * the output explodes to ~m/window rows per document. Downstream
    * joins on fp meet a frame `window`× smaller than full postings. */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleTokens: Int, window: Int): DataFrame = {
    require(shingleTokens >= 2, s"shingleTokens must be >= 2: $shingleTokens")
    require(window >= 2, s"window must be >= 2: $window")
    // ONE aggregate pass per window carrying (min so far, its rightmost
    // offset) — O(window) per window, O(m·window) per doc. A naive
    // array_min(slice(...)) inside the tie-break lambda would re-scan the
    // window per element (O(m·window²)) — measured as the dominant cost.
    val sel = expr(
      s"""transform(sequence(1, size(__fps) - __wl + 1), i ->
         |  aggregate(sequence(0, __wl - 1),
         |    named_struct('mn', 9223372036854775807L, 'j', -1L),
         |    (acc, j) -> IF(element_at(__fps, cast(i + j AS INT)) <= acc.mn,
         |      named_struct('mn', element_at(__fps, cast(i + j AS INT)),
         |                   'j', cast(j AS BIGINT)),
         |      acc),
         |    acc -> named_struct('pos', cast(i AS BIGINT) + acc.j, 'fp', acc.mn)))""".stripMargin)
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= shingleTokens)
      .select(col("id"),
        graft.functions.ShingleFps.shingleFps(col("__toks"), shingleTokens).as("__fps"))
      .withColumn("__wl", least(lit(window), size(col("__fps"))))
      .select(col("id"), explode(array_distinct(sel)).as("__s"))
      .select(col("id"), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** Cross-corpus overlap detection over winnowed fingerprints — the
    * scale path for "which documents of corpus A share text runs with
    * corpus B" (benchmark contamination against a huge pretraining
    * corpus, licensing audits, mirror detection): both sides winnow
    * ([[winnowedFingerprints]]), candidates meet on selected-fp
    * equality, and a pair survives at ≥ `minShared` distinct shared
    * fp VALUES. Winnowing's guarantee transfers: any shared run of
    * ≥ window + shingleTokens − 1 tokens selects at least one common
    * fingerprint, at ~1/window the posting density the full-postings
    * auditor (duplicatedSpans / spanContamination) would ship.
    *
    * `maxDf` drops fingerprints selected by more than that many
    * documents PER SIDE before the join — the hot-key guard: a
    * boilerplate shingle selected corpus-wide would otherwise fan the
    * fp join quadratically (the jaccardPairsInverted df-cap
    * rationale; evidence from ubiquitous text is not evidence of
    * pairwise overlap anyway). Output: (id_a, id_b, n_shared_fps),
    * id_a from `a`, id_b from `b`.
    *
    * Scale shape: two per-row winnowing projections, one equi-join on
    * the fp (both sides ~1/window density, df-capped), one count
    * aggregation keyed by the pair — no all-pairs stage anywhere. */
  def winnowedOverlapPairs(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, shingleTokens: Int, window: Int,
      minShared: Long, maxDf: Long = 1000L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1: $minShared")
    require(maxDf >= 1L, s"maxDf must be >= 1: $maxDf")
    def side(df: DataFrame, out: String) = {
      val w = winnowedFingerprints(df, idCol, textCol, shingleTokens, window)
        .select(col("id").as(out), col("fp")).distinct()
      val rare = w.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
        .where(col("__df") <= maxDf).select(col("fp"))
      w.join(rare, Seq("fp"), "left_semi")
    }
    side(a, "id_a").join(side(b, "id_b"), Seq("fp"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .where(col("n_shared_fps") >= minShared)
  }
}
