package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: TF-IDF-ranked distinctive terms per
  * group (source/domain/shard) — the "what is this slice of the corpus
  * about" audit for training-data mixing decisions.
  *
  * Scale shape: one explode → two hash aggregations (term frequency per
  * (group, token), document frequency per token over the tf table — both
  * partial+final with map-side combine) → a token-keyed join → one
  * window per group for top-k. The df side carries one row per distinct
  * token; a corpus-wide token makes the tok join key hot at extreme
  * group counts. AQE skew-join does NOT engage here — the df side is
  * derived from the tf side, and (measured on Spark 4.1, SkewSpec) the
  * resulting stage reuse blocks OptimizeSkewedJoin even with forced
  * thresholds — so the mitigations are explicit: `dfCap` drops tokens
  * whose document frequency exceeds the cap before the join (a token in
  * more than ~half the groups has idf ≤ ln 2 and is never
  * "distinctive", so a cap around N/2 changes no meaningful ranking
  * while removing the hot key entirely), and `saltFactor` runs the join
  * salted (ScaleOps.saltedEquiJoin) for hot tokens that must remain in
  * the result — result-identical, SkewSpec-pinned.
  *
  * Determinism: the score is `tf · floor(1000·ln(N/df))` — integer once
  * floored, so ranking (score desc, token asc) is total and
  * reproducible. The floor is safe cross-engine: df and N are integers,
  * so 1000·ln(N/df) takes finitely many values whose distance from
  * integer boundaries (≥ 0.03 for N ≤ 20) dwarfs any libm ulp
  * divergence.
  */
object CorpusStats {

  /** Top-k distinctive terms per group by the floor-scaled TF-IDF score.
    * Output: (group, rank, term, tf, score). `dfCap`: drop tokens held by
    * more than `dfCap` groups before the join — the hot-key guard (see
    * the class note; capped tokens score at most tf·⌊1000·ln(N/cap)⌋, so
    * a cap near N only removes never-distinctive stopwords).
    * `saltFactor`: > 1 runs the tf⋈df join as ScaleOps.saltedEquiJoin —
    * the hot token's tf rows spread over saltFactor reducers while the
    * df side replicates (one row per salt). Results are EXACTLY the
    * plain join's (SkewSpec pins equality); use it when hot tokens must
    * stay scoreable (a dfCap would drop them) and AQE can't help (stage
    * reuse blocks OptimizeSkewedJoin on this shape — class note). */
  def tfIdfTopTerms(df: DataFrame, textCol: String, groupCol: String,
      k: Int, dfCap: Option[Long] = None, saltFactor: Int = 1): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val tf = toks.groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreqAll = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dfreq = dfCap.map(c => dfreqAll.where(col("df") <= c)).getOrElse(dfreqAll)
    val n = df.select(countDistinct(col(groupCol)).as("n"))
    val joined =
      if (saltFactor > 1) graft.ops.ScaleOps.saltedEquiJoin(tf, dfreq, "tok", saltFactor)
      else tf.join(dfreq, "tok")
    val scored = joined.crossJoin(broadcast(n))
      .select(col("grp"), col("tok"), col("tf"),
        (col("tf") * floor(lit(1000.0) * log(col("n").cast("double") / col("df")))
          .cast("long")).as("score"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("grp").as(groupCol), col("rank"), col("tok").as("term"),
        col("tf"), col("score"))
  }

  /** Mean token surprisal under the corpus's own unigram LM — the
    * perplexity-proxy quality score of C4/Gopher-style filtering when no
    * trained LM is on the cluster: documents of improbable tokens score
    * high, boilerplate scores low.
    *
    * Per-token surprisal is floored to integer millinats BEFORE the
    * per-document mean: s(tok) = ⌊1000·ln(total/count(tok))⌋. Integer
    * summation is order-independent, so the score is reproducible across
    * partitionings and engines (a double sum of lns would depend on
    * aggregation order); the per-token floor is q44's cross-engine-safe
    * pattern (finitely many ln values of integer ratios, boundary
    * distances dwarf libm ulps). Output: (id, n_tokens, surprisal_milli
    * = ⌊Σs/n⌋).
    *
    * Scale shape: one explode, one map-side-combined count agg, a
    * token-keyed join back to the postings, one final agg. The join key
    * inherits CorpusStats' hot-token caveat — and because the counts
    * derive from the postings, AQE skew-join is structurally blocked
    * here too (see the class note); ultra-common tokens can't be capped
    * away (their low surprisal IS signal), so `saltFactor > 1` spreads
    * the Zipf head over saltFactor reducers via the salted join
    * (result-identical; SkewSpec pins equality). */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      saltFactor: Int = 1): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    val joined =
      if (saltFactor > 1) graft.ops.ScaleOps.saltedEquiJoin(toks, counts, "tok", saltFactor)
      else toks.join(counts, "tok")
    joined.crossJoin(broadcast(total))
      .select(col("id"),
        floor(lit(1000.0) * log(col("total").cast("double") / col("c")))
          .cast("long").as("si"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("si")).cast("long").as("ssum"))
      // integer division (si ≥ 0 so div == floor); a double mean could
      // round up across an integer boundary and break engine parity
      .select(col("id"), col("n_tokens"),
        expr("ssum div n_tokens").as("surprisal_milli"))
  }

  /** Boilerplate coverage — the RefinedWeb/CCNet-style "how much of this
    * document is corpus-repeated text" signal: the fraction (basis
    * points) of a document's k-word shingle INSTANCES whose fingerprint
    * appears in at least `minDf` distinct documents. High coverage marks
    * templated/boilerplate documents for down-weighting or removal;
    * unlike the per-document repetition filter (TextFunctions
    * .repetitionBpFrom) this is a CORPUS-level signal — a unique
    * document assembled from corpus-common phrases still scores high.
    *
    * Output: (id, n_shingles, boilerplate_bp), one row per input row.
    *
    * Scale shape: shingle fingerprints are the codegen'd 40-bit
    * [[graft.functions.ShingleFps]] (longs ride every exchange, never
    * shingle strings). One explode → document-frequency hash agg
    * (map-side combined) → a left-semi join of the postings against the
    * frequent-fp set → per-doc count. The frequent set is the join's
    * build side and shrinks as `minDf` grows; a corpus-wide hot
    * fingerprint is EXCLUDED from skew concerns here — it is frequent by
    * definition, and the semi join probes it with bounded per-row work.
    * The df agg's fp key is near-unique by construction (40-bit space),
    * so no hot-key guard is needed on the aggregation either. */
  def boilerplateCoverage(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, minDf: Long): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val staged = df.select(col(idCol).as("id"),
        graft.functions.ShingleFps.shingleFps(
          TextFunctions.tokens(col(textCol)), shingleSize).as("fps"))
    val inst = staged.select(col("id"), explode(col("fps")).as("fp"))
      .repartition(parts)
    val frequent = inst.groupBy(col("fp"))
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDf).select(col("fp"))
    val hits = inst.join(frequent, Seq("fp"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
    staged.select(col("id"),
        coalesce(size(col("fps")), lit(0)).cast("long").as("n_shingles"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        when(col("n_shingles") > 0,
          floor(coalesce(col("hits"), lit(0L)) * lit(10000.0) / col("n_shingles")))
          .otherwise(0L).cast("long").as("boilerplate_bp"))
  }
  /** Token-distribution KL divergence KL(A‖B) between two corpora, in
    * floor-scaled integer millinats — the "did the new crawl drift from
    * the reference corpus" / "how far is this source from the mix"
    * audit. Add-1 smoothing on the B side keeps tokens unseen in B
    * finite (q(tok) = (d+1)/(N_b+V) over the joint vocabulary), so the
    * divergence is defined for any pair of corpora.
    *
    * Reproducibility: per-token contribution
    * s = ⌊1000·ln( c·(N_b+V) / (N_a·(d+1)) )⌋ is the floor of the log
    * of a ratio of exact integers (q44's cross-engine discipline);
    * kl_milli = ⌊Σ c·s / N_a⌋ in pure integer arithmetic. Integer
    * products stay double-exact below 2^53 — beyond that (trillions of
    * tokens) split the log into ln(c)+ln(N_b+V)−ln(N_a)−ln(d+1).
    * Output (one row): (n_tokens_a, n_tokens_b, vocab, kl_milli).
    *
    * Scale shape: two token-count hash aggs (map-side combined), one
    * full outer join on the token (vocabulary-sized frames, not
    * postings), one single-row totals agg broadcast back, one final
    * agg. Nothing postings-sized rides more than its own count agg. */
  /** Shared by [[tokenKlDivergence]] and [[topDivergingTokens]]: the
    * (token, c, d) full-outer vocabulary join and its single-row
    * totals. `joined` feeds two branches — persisted via CacheScope
    * (callers release after materializing, the library convention). */
  private def klJoined(a: DataFrame, b: DataFrame,
      textCol: String): (DataFrame, DataFrame) = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as(out))
    val joined = graft.ops.CacheScope.persist(
      counts(a, "c").join(counts(b, "d"), Seq("tok"), "full_outer")
        .select(col("tok"), coalesce(col("c"), lit(0L)).as("c"),
          coalesce(col("d"), lit(0L)).as("d")))
    val totals = joined.agg(count(lit(1)).as("v"),
      sum(col("c")).as("na"), sum(col("d")).as("nb"))
    (joined, totals)
  }

  /** Per-token smoothed floored log-ratio contribution c·s. */
  private def klContribution: Column =
    col("c") * floor(lit(1000.0) * log(
      (col("c") * (col("nb") + col("v"))).cast("double") /
        (col("na") * (col("d") + lit(1L))).cast("double"))).cast("long")

  def tokenKlDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val (joined, totals) = klJoined(a, b, textCol)
    // aggregate contributions to ONE row regardless of input (an empty
    // A yields ssum NULL, never zero rows — matching the oracle's
    // always-one-row shape), then combine with the totals row
    val ssum = joined.where(col("c") > 0).crossJoin(broadcast(totals))
      .agg(sum(klContribution).as("ssum"))
    totals.crossJoin(ssum).select(
      col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
      col("v").as("vocab"),
      // floor division on a possibly-negative sum: pmod-adjusted to
      // match DuckDB's flooring `//`; guarded so na=0 yields NULL
      // instead of an ANSI divide-by-zero
      when(col("na") > 0 && col("ssum").isNotNull,
        expr("(ssum - pmod(ssum, na)) div na"))
        .otherwise(lit(null).cast("long")).as("kl_milli"))
  }

  /** The tokens driving KL(A‖B) — [[tokenKlDivergence]]'s companion
    * triage view: top-k tokens by absolute smoothed log-ratio
    * contribution c·s (positive = over-represented in A, negative =
    * under-represented). Output: (rank, token, c_a, c_b,
    * contribution_milli·N_a — i.e. the un-normalized integer c·s).
    * Ranking (|c·s| desc, token asc) is total and reproducible. */
  def topDivergingTokens(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val (joined, totals) = klJoined(a, b, textCol)
    val contrib = joined.where(col("c") > 0).crossJoin(broadcast(totals))
      .select(col("tok"), col("c"), col("d"), klContribution.as("cs"))
    // distributed top-k first (TakeOrdered — no global sort partition),
    // THEN the rank window over the k survivors only
    val top = contrib.orderBy(abs(col("cs")).desc, col("tok").asc).limit(k)
    val w = Window.orderBy(abs(col("cs")).desc, col("tok").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank").cast("long").as("rank"), col("tok").as("token"),
        col("c").as("c_a"), col("d").as("c_b"), col("cs").as("contribution"))
  }

  /** Bigram conditional surprisal — the next-token upgrade of
    * [[unigramSurprisal]]: per document, the mean of
    * −ln P(tok | prev) = ln(c(prev,·) / c(prev,tok)) over its bigram
    * instances, in floor-scaled millinats. A repetitive document whose
    * transitions are locally predictable (even with rare unigrams)
    * scores LOW, catching templated text the unigram model misses.
    *
    * All the unigram form's reproducibility rules apply (integer
    * counts, per-instance floor of ln of an integer ratio, integer
    * mean). Prefix totals DERIVE from the bigram counts (sum by prev) —
    * no second corpus scan. Documents with < 2 tokens have no bigrams
    * and are absent from the output (documented: no transition, no
    * conditional score).
    *
    * Scale shape: one explode of per-row zipped (prev, tok) pairs (no
    * window — adjacency is intra-document), one map-side-combined
    * count agg, the prefix rollup over the (small) bigram vocabulary,
    * one join back to the postings. Same Zipf-head caveat as the
    * unigram form. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ts = TextFunctions.tokens(col(textCol))
    val pairs = df
      .select(col(idCol).as("id"), ts.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("id"), col("bg.0").as("prev"), col("bg.1").as("tok"))
      .repartition(parts)
    val bi = pairs.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
    val prefix = bi.groupBy(col("prev")).agg(sum(col("cb")).as("cp"))
    // join the two VOCABULARY-sized frames first, then ONE postings
    // join on (prev, tok): joining postings to each separately would
    // shuffle the posting-sized frame twice, the second time keyed by
    // the Zipf-skewed prev alone (a stopword prefix = one hot task)
    val si = bi.join(prefix, Seq("prev"))
      .select(col("prev"), col("tok"),
        floor(lit(1000.0) * log(col("cp").cast("double") / col("cb")))
          .cast("long").as("si"))
    pairs.join(si, Seq("prev", "tok"))
      .select(col("id"), col("si"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("si")).cast("long").as("ssum"))
      .select(col("id"), col("n_bigrams"),
        expr("ssum div n_bigrams").as("bigram_surprisal_milli"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): per raw-corpus document, the
    * log-likelihood ratio of the document under a TARGET-corpus unigram
    * LM versus the RAW corpus's own unigram LM — the published recipe
    * for selecting pretraining data that "looks like" a trusted target
    * sample. Positive weight = more target-like; callers keep the
    * top-k by weight or sample proportionally to exp(weight).
    *
    * Both LMs are add-1 smoothed over the JOINT vocabulary V, so every
    * token has a finite ratio on both sides. Per-token contribution in
    * floored integer millinats (q44's cross-engine discipline — the
    * floor of the log of a ratio of exact integers):
    * s(tok) = ⌊1000·ln( (t+1)·(N_r+V) / ((r+1)·(N_t+V)) )⌋,
    * and the document weight is the plain integer sum of s over its
    * token INSTANCES (the log of DSIR's probability-ratio product) —
    * order-independent, reproducible across partitionings and engines.
    * Integer products stay double-exact below 2^53; beyond that
    * (trillions of tokens) split the log into a sum of four lns.
    * Output: (id, n_tokens, dsir_milli), EVERY raw document present —
    * token-less documents weigh 0 over 0 tokens.
    *
    * Scale shape: two token-count hash aggs (map-side combined), a
    * full-outer vocabulary join (vocab-sized, not postings-sized) with
    * the single totals row broadcast back, then ONE postings-sized
    * token join of the raw instances against the scored vocabulary and
    * a per-doc sum. The token join inherits the Zipf-head caveat of
    * [[unigramSurprisal]] — common tokens can't be capped away (their
    * negative weight IS the boilerplate-repelling signal), so
    * `saltFactor > 1` spreads the head over saltFactor reducers via
    * the salted join (result-identical; SkewSpec pins the pattern). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, saltFactor: Int = 1): DataFrame = {
    val parts = raw.sparkSession.sessionState.conf.numShufflePartitions
    val inst = raw.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val rawCounts = inst.groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val tgtCounts = target
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("t"))
    // consumed by the totals agg AND the instance join: persist the
    // vocabulary frame once (CacheScope — callers release after
    // materializing, the library convention)
    val vocab = graft.ops.CacheScope.persist(
      rawCounts.join(tgtCounts, Seq("tok"), "full_outer")
        .select(col("tok"), coalesce(col("r"), lit(0L)).as("r"),
          coalesce(col("t"), lit(0L)).as("t")))
    // Materialize the vocabulary BEFORE the downstream plans compile:
    // a populated InMemoryRelation carries accurate size stats, so the
    // postings-sized token join below plans broadcast-hash statically
    // when the vocabulary is small — the choice AQE would make, but
    // made in a way that survives a caller CACHING this frame (cached
    // plans compile without AQE: a caller persist()ing the result —
    // selectTokenBudget does — otherwise pays a sort-merge join of the
    // full instance stream; measured 5.7 s vs 0.5 s at sf0.1). At a
    // vocabulary too big to broadcast the stats say so and sort-merge
    // is the right plan anyway.
    vocab.count()
    val totals = vocab.agg(count(lit(1)).as("v"),
      sum(col("r")).as("nr"), sum(col("t")).as("nt"))
    val scored = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        floor(lit(1000.0) * log(
          ((col("t") + lit(1L)) * (col("nr") + col("v"))).cast("double") /
            ((col("r") + lit(1L)) * (col("nt") + col("v"))).cast("double")))
          .cast("long").as("s"))
    val joined =
      if (saltFactor > 1) graft.ops.ScaleOps.saltedEquiJoin(inst, scored, "tok", saltFactor)
      else inst.join(scored, "tok")
    val sums = joined.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).cast("long").as("ssum"))
    raw.select(col(idCol).as("id")).join(sums, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("ssum"), lit(0L)).as("dsir_milli"))
  }

  /** [[dsirWeights]] with the paper's HASHED-BIGRAM feature space:
    * features are word bigrams hashed into a FIXED number of buckets
    * (pmod(polyHash("prev tok"), buckets), the cross-engine-replayable
    * 40-bit chain), so every feature frame is bounded by `buckets`
    * regardless of corpus vocabulary — the shape that still holds when
    * the joint n-gram vocabulary is itself too large to treat as a
    * small frame (web-scale corpora). Add-1 smoothing runs over the
    * fixed bucket space (denominators N+buckets), so unobserved
    * buckets need no rows. Documents with fewer than 2 tokens have no
    * bigram features and weigh 0 — still present, per the
    * every-document contract. Same floored-millinat integer discipline
    * and salted-join option as [[dsirWeights]]; the bucket join key is
    * near-uniform by construction (hashing spreads the Zipf head), so
    * salting is rarely needed on this variant.
    * Output: (id, n_bigrams, dsir_milli). */
  def dsirWeightsHashed(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1 << 14, saltFactor: Int = 1): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val parts = raw.sparkSession.sessionState.conf.numShufflePartitions
    val ts = TextFunctions.tokens(col(textCol))
    def bucketed(df: DataFrame, idc: Column): DataFrame =
      df.select(idc.as("id"), ts.as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("id"), explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
        .select(col("id"), pmod(TextFunctions.polyHash(
            concat_ws(" ", col("bg.0"), col("bg.1")), 1L << 40),
          lit(buckets.toLong)).as("b"))
    val rawInst = bucketed(raw, col(idCol)).repartition(parts)
    val rawCounts = rawInst.groupBy(col("b")).agg(count(lit(1)).as("r"))
    val tgtCounts = bucketed(target, lit(0L))
      .groupBy(col("b")).agg(count(lit(1)).as("t"))
    // observed buckets only (≤ buckets rows by construction); consumed
    // by the totals agg and the instance join — persist once
    val obs = graft.ops.CacheScope.persist(
      rawCounts.join(tgtCounts, Seq("b"), "full_outer")
        .select(col("b"), coalesce(col("r"), lit(0L)).as("r"),
          coalesce(col("t"), lit(0L)).as("t")))
    val totals = obs.agg(sum(col("r")).as("nr"), sum(col("t")).as("nt"))
    val scored = obs.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(lit(1000.0) * log(
          ((col("t") + lit(1L)) * (col("nr") + lit(buckets.toLong))).cast("double") /
            ((col("r") + lit(1L)) * (col("nt") + lit(buckets.toLong))).cast("double")))
          .cast("long").as("s"))
    val joined =
      if (saltFactor > 1) graft.ops.ScaleOps.saltedEquiJoin(rawInst, scored, "b", saltFactor)
      else rawInst.join(scored, "b")
    val sums = joined.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).cast("long").as("ssum"))
    raw.select(col(idCol).as("id")).join(sums, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ssum"), lit(0L)).as("dsir_milli"))
  }

  /** Trained quality classifier — multinomial Naive Bayes over unigram
    * features with add-1 smoothing, the GPT-3/CCNet-style filter that
    * LEARNS what "good" looks like from weak labels (label 1 = docs
    * from trusted/curated sources, label 0 = the rest) instead of
    * hand-tuned heuristics. Where [[dsirWeights]] contrasts a target
    * CORPUS against the raw corpus, this trains from a LABEL COLUMN on
    * the corpus itself and adds the class prior — the supervised
    * complement.
    *
    * Per-token evidence in floored integer millinats (the q44/q51
    * cross-engine discipline — one floor of one log of a ratio of exact
    * integers): s(tok) = ⌊1000·ln( (c1+1)·(T0+V) / ((c0+1)·(T1+V)) )⌋
    * over the joint vocabulary V; the document's log-odds is
    * prior + Σ s over its token instances with
    * prior = ⌊1000·ln(N1/N0)⌋ — all integer sums, order-independent,
    * reproducible across partitionings and engines. Integer products
    * stay double-exact below 2^53; beyond that (trillions of tokens)
    * split the log into a sum of four lns. Output: (id, label,
    * n_tokens, nb_milli, keep = 1 iff nb_milli > 0), EVERY document
    * present — a token-less document carries the bare prior.
    *
    * Fails loudly on a NULL or non-binary label and on a nonempty
    * one-class corpus (ln(N1/N0) undefined — a classifier with nothing
    * to contrast is a caller bug, not a degenerate frame). A fully
    * EMPTY corpus returns an empty frame: empty-relation propagation
    * prunes the plan before the guard can evaluate, which is the
    * empty-input contract every operator here shares (EdgeCasesSpec).
    *
    * Scale shape: one explode → one per-token two-class hash agg
    * (map-side combined, vocab-sized result) → broadcast totals → ONE
    * postings-sized token join of the instances against the scored
    * vocabulary → per-doc sum. The token join inherits the Zipf-head
    * caveat of [[unigramSurprisal]] — common tokens carry class
    * evidence and can't be capped away — so `saltFactor > 1` spreads
    * the head via the salted join (result-identical, SkewSpec-pinned
    * pattern). This convenience form = [[naiveBayesTrain]] +
    * [[naiveBayesScore]] on the same corpus; deployment persists the
    * trained model frame and scores new corpora / streaming
    * micro-batches with [[naiveBayesScore]] alone. */
  def naiveBayesQuality(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, saltFactor: Int = 1): DataFrame = {
    val base = nbLabeled(df, idCol, textCol, labelCol)
    // NOTE: unlike dsirWeights, the model is deliberately NOT
    // eagerly materialized here — measured at sf0.1 the extra
    // serialized train job costs more (q116 +1 s warm) than the
    // cached-plan join-strategy risk it would remove, because the
    // fused train+score DAG shares the instance scan. Deployment
    // callers score via naiveBayesScore against their own persisted
    // model artifact, which carries accurate stats anyway.
    naiveBayesScore(base.select(col("id"), col("y").as("label"), col("text")),
      "id", "text", naiveBayesTrain(df, idCol, textCol, labelCol), saltFactor)
  }

  /** The labeled projection with the fail-fast label guard — shared by
    * train and the train+score convenience form. */
  private def nbLabeled(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("text"),
        col(labelCol).cast("long").as("y"))
      // assert_true(..).isNull is the codebase's fail-fast filter idiom:
      // null for surviving rows, throws on a bad label before any join.
      .filter(assert_true(col("y").isin(0L, 1L),
        lit(s"naiveBayesQuality: label column '$labelCol' must be 0 or 1")).isNull)

  /** Train the [[naiveBayesQuality]] model: one vocab-sized frame
    * (tok, s, prior_milli — the prior rides every row as a constant so
    * the model is ONE self-contained persistable artifact). Merging two
    * shards' models is NOT count-additive once floored — retrain from
    * merged counts instead (the counts themselves are additive). */
  def naiveBayesTrain(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = nbLabeled(df, idCol, textCol, labelCol)
    val inst = base
      .select(col("id"), col("y"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .repartition(parts)
    val vocab = inst.groupBy(col("tok")).agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"),
      sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"))
    val totals = vocab.agg(count(lit(1)).as("v"),
      sum(col("c1")).as("t1"), sum(col("c0")).as("t0"))
    // class prior from DOCUMENT counts; the one-class guard rides the
    // single-row frame (assert_true, evaluated before any per-doc math)
    val prior = base.agg(
        // coalesce: an EMPTY corpus sums to NULL, which must hit the
        // one-class guard below as 0, not ride through as NULL
        coalesce(sum(when(col("y") === 1L, 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("y") === 0L, 1L).otherwise(0L)), lit(0L)).as("n0"))
      // one-class input throws; a GENUINELY empty runtime input (e.g. an
      // empty parquet partition, which Catalyst can't fold away like a
      // LocalRelation) passes through — the result frame is empty anyway
      // (empty vocab), so the prior value is never observed and 0 stands
      // in to keep the log/cast off the (0,0) row.
      .filter(assert_true((col("n1") > 0 && col("n0") > 0) ||
          (col("n1") === 0 && col("n0") === 0),
        lit("naiveBayesQuality: both classes must be inhabited")).isNull)
      .select(when(col("n1") > 0 && col("n0") > 0,
          floor(lit(1000.0) *
            log(col("n1").cast("double") / col("n0").cast("double")))
            .cast("long"))
        .otherwise(lit(0L)).as("prior_milli"))
    vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        floor(lit(1000.0) * log(
          ((col("c1") + lit(1L)) * (col("t0") + col("v"))).cast("double") /
            ((col("c0") + lit(1L)) * (col("t1") + col("v"))).cast("double")))
          .cast("long").as("s"))
      .crossJoin(broadcast(prior))
  }

  /** Score a corpus against a trained [[naiveBayesTrain]] model — the
    * deployment path: the model frame is the persisted artifact; new
    * documents (a later snapshot, a daily delta, a streaming
    * micro-batch via foreachBatch) score with ONE token join + per-doc
    * sum and never re-train. Tokens outside the model vocabulary
    * contribute 0 (they carry no class evidence under the training
    * corpus — exactly the add-1 limit as counts→0 cancels in the
    * ratio's floor only approximately, so the model documents the
    * convention rather than faking a pseudo-count). Every extra input
    * column (e.g. a label carried for evaluation) passes through. */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, saltFactor: Int = 1): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val bare = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val scored = model.select(col("tok"), col("s"))
    val joined =
      if (saltFactor > 1) graft.ops.ScaleOps.saltedEquiJoin(bare, scored, "tok", saltFactor)
      else bare.join(scored, "tok")
    val sums = joined.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).cast("long").as("ssum"))
    val prior = model.agg(max(col("prior_milli")).as("prior_milli"))
    docs.drop(textCol).withColumnRenamed(idCol, "id")
      .join(sums, Seq("id"), "left")
      .crossJoin(broadcast(prior))
      .select((Seq(col("id")) ++
        docs.columns.filter(c => c != textCol && c != idCol).map(col).toSeq ++
        Seq(
          // n_tokens counts IN-VOCABULARY instances: on a new corpus,
          // tokens the model never saw contribute neither evidence nor
          // length (they drop out of the model join)
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          (coalesce(col("ssum"), lit(0L)) + col("prior_milli")).as("nb_milli"))): _*)
      .withColumn("keep", when(col("nb_milli") > 0L, 1L).otherwise(0L))
  }

  /** Vocabulary coverage report — the "will a size-V tokenizer vocab
    * cover this corpus" question asked before training a tokenizer (or
    * after, per ingest source, to catch a source whose token
    * distribution the vocab was never fit on). The vocabulary is the
    * top `vocabSize` corpus tokens by frequency (ties on ascending
    * token — deterministic both engines); per group the report carries
    * the token-instance coverage rate (basis points, floored) and the
    * count of distinct out-of-vocab token types.
    *
    * Scale shape: one shuffle builds token counts; the top-V cut is
    * sort+limit (TakeOrderedAndProject — per-partition top-V then a
    * V-bounded driver merge, never a single-partition global window);
    * the ≤V vocab broadcasts back onto the instance frame, so the
    * corpus-sized side shuffles exactly once (the count aggregation).
    * Output: (group, n_tokens, covered_bp, n_oov_types). */
  def vocabCoverage(df: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(groupCol != textCol, s"groupCol and textCol must differ: '$groupCol'")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val inst = df.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .repartition(parts)
    val vocab = inst.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_v"))
    inst.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNotNull, 1L).otherwise(0L)).as("n_covered"),
        countDistinct(when(col("in_v").isNull, col("tok"))).as("n_oov_types"))
      .select(col("grp").as(groupCol), col("n_tokens"),
        expr("(10000 * n_covered) div n_tokens").as("covered_bp"),
        col("n_oov_types"))
  }

  /** Temperature-scaled source sampling weights — the multilingual /
    * multi-source rebalancing rule (p_s ∝ c_s^α at α < 1): raw token
    * counts would let a dominant source swamp training; α compresses
    * the gap (α=1 proportional, α=0 uniform). Published as the
    * "exponentially smoothed" sampling of multilingual-LM training;
    * the weights feed directly into mixByTokenBudget-style targets.
    *
    * Integer discipline: em_s = ⌊1000·exp((α_milli/1000)·ln c_s)⌋ —
    * ONE float composition (exp∘ln = the power), floored once, then
    * weight_bp = ⌊10000·em_s / Σ em⌋ in pure BIGINT arithmetic. Both
    * engines evaluate the identical double expression over integer
    * token counts; the floor-boundary ulp argument of tfIdfTopTerms
    * applies. An empty source list returns an empty frame; c_s ≥ 1
    * whenever the source has any token, so ln is never undefined
    * (sources with ZERO tokens — all-null/empty texts — still appear,
    * with em pinned to 0: they deserve weight 0, not a NaN).
    *
    * Scale shape: one token-count aggregation per source (map-side
    * combined), then arithmetic over the tiny per-source frame and one
    * single-row total broadcast — nothing corpus-sized past the first
    * agg. Output: (groupCol, n_tokens, weight_bp). */
  def temperatureWeights(df: DataFrame, groupCol: String, textCol: String,
      alphaMilli: Long): DataFrame = {
    require(alphaMilli >= 0L && alphaMilli <= 1000L,
      s"alphaMilli must be in [0, 1000]: $alphaMilli")
    require(groupCol != textCol, s"groupCol and textCol must differ: '$groupCol'")
    val counts = df
      .select(col(groupCol).as("grp"),
        // NULL text = zero tokens: an all-NULL source must surface with
        // n_tokens 0 / weight 0, not a NULL count (mixByTokenBudget's rule)
        coalesce(size(TextFunctions.tokens(col(textCol))).cast("long"), lit(0L))
          .as("n"))
      .groupBy(col("grp")).agg(sum(col("n")).as("n_tokens"))
      .withColumn("em",
        when(col("n_tokens") > 0L,
          floor(lit(1000.0) *
            exp(lit(alphaMilli / 1000.0) * log(col("n_tokens")))).cast("long"))
          .otherwise(0L))
    val total = counts.agg(
      coalesce(sum(col("em")), lit(0L)).as("em_total"))
    counts.crossJoin(broadcast(total))
      // the 10000·em intermediate is widened to DECIMAL(38,0) (HUGEINT on
      // the oracle side): at proportional mixing over a trillion-token
      // source, 10000·(1000·c_s) clears BIGINT — the quotient (≤ 10000)
      // never does, so widening only the intermediate keeps the result
      // BIGINT and the arithmetic exact on both engines
      .select(col("grp").as(groupCol), col("n_tokens"),
        when(col("em_total") > 0L,
          expr("CAST((CAST(10000 AS DECIMAL(38,0)) * em) div em_total AS BIGINT)"))
          .otherwise(0L).as("weight_bp"))
  }

  /** Per-group document-length percentile profile — the dataset-card
    * companion (q67 carries means; distribution SHAPE is what length
    * filters and packing policies are tuned against): exact
    * interpolated percentiles of the per-document token count, per
    * group, rounded to 4 decimals (q34's cross-engine percentile
    * discipline). NULL text counts as a zero-length document — a
    * source padded with empty docs should look short, not shrink.
    *
    * Scale shape: one narrow (group, count) projection, one per-group
    * percentile aggregation — exact percentile state is per-group and
    * distributed; nothing global, nothing driver-side. Output:
    * (groupCol, n_docs, p25_tokens, p50_tokens, p75_tokens,
    * p90_tokens). */
  def lengthProfile(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    require(groupCol != textCol, s"groupCol and textCol must differ: '$groupCol'")
    df.select(col(groupCol).as("grp"),
        coalesce(size(TextFunctions.tokens(col(textCol))).cast("long"), lit(0L))
          .as("n"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n, 0.25D)"), 4).as("p25_tokens"),
        round(expr("percentile(n, 0.5D)"), 4).as("p50_tokens"),
        round(expr("percentile(n, 0.75D)"), 4).as("p75_tokens"),
        round(expr("percentile(n, 0.9D)"), 4).as("p90_tokens"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Vocabulary encoding — the tokenize-for-training last mile: every
    * document's token stream mapped to integer ids under the top-V
    * corpus-frequency vocabulary (id = frequency rank, 0-based, ties
    * on token asc — the q92 vocabulary cut made assignable), OOV
    * tokens collapsing to the single bucket id = V. What a trainer
    * loads is ids, not strings; this is the step that turns the
    * curated corpus into that tensor precursor, with the OOV count
    * riding along as the coverage diagnostic.
    *
    * Output: (id, ids array<bigint> in token order, n_tokens, n_oov),
    * EVERY input document present — token-less docs carry an empty
    * array. Deterministic: the id order is recovered by sorting the
    * collected (pos, vid) pairs, never by collect order.
    *
    * Scale shape: one instance-frame explode + hash count for the
    * vocabulary; the top-V cut is sort+limit (V-bounded) and the rank
    * window runs over that ≤V frame only — never the corpus. The
    * encode join is instances ⋈ broadcast(vocab); re-assembly is one
    * per-doc aggregation. The corpus shuffles twice (count, encode
    * groupBy) — the minimum for a corpus-derived vocabulary. */
  def encodeTopV(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val inst = df
      .select(col(idCol).as("id"), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .repartition(parts)
    val vocab = inst.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .withColumn("vid",
        row_number().over(Window.orderBy(col("c").desc, col("tok").asc))
          .cast("long") - 1L)
      .select(col("tok"), col("vid"))
    val encoded = inst
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col("id"), col("pos"),
        coalesce(col("vid"), lit(vocabSize.toLong)).as("vid"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("vid"))).as("pv"))
      .select(col("id"),
        transform(array_sort(col("pv")), p => p.getField("vid")).as("ids"))
      .select(col("id"), col("ids"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), v => v === vocabSize.toLong)).cast("long")
          .as("n_oov"))
    df.select(col(idCol).as("id")).distinct()
      .join(encoded, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Top-k adjacent-bigram PMI — the collocation detector ("new york",
    * "machine learning") used to audit tokenizer merge candidates and
    * to spot templated word pairs: PMI(x,y) = ln(p(x,y)/(p(x)p(y)))
    * with p over bigram/unigram instance counts, in floored integer
    * millinats: ⌊1000·ln(cb·Tu²/(Tb·cx·cy))⌋ — the ratio of exact
    * integers evaluated in IEEE doubles (exactly-rounded mult/div,
    * one libm ln — the established cross-engine floor discipline).
    * Hapax pairs trivially maximize PMI, so pairs below `minCount`
    * are dropped BEFORE ranking (the standard PMI-cutoff practice).
    * Ranking is total: (pmi_milli desc, tok_a asc, tok_b asc).
    *
    * Scale shape: one bigram hash agg + one unigram hash agg (both
    * map-side combined); the minCount cut shrinks the bigram frame
    * before its two vocabulary-sized joins; totals ride one broadcast
    * row; top-k is sort+limit (TakeOrderedAndProject), never a global
    * window. Output: (tok_a, tok_b, n_pair, pmi_milli). */
  def bigramPmiTop(df: DataFrame, textCol: String, k: Int,
      minCount: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ts = TextFunctions.tokens(col(textCol))
    val toks = df.select(ts.as("toks"))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .repartition(parts)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val biAll = toks.where(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("bg.0").as("tok_a"), col("bg.1").as("tok_b"))
      .repartition(parts)
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("cb"))
    val bi = biAll.where(col("cb") >= minCount)
    // Tb is the FULL bigram instance count — probabilities are over the
    // corpus, the minCount cut only prunes what gets ranked
    val totals = uni.agg(coalesce(sum(col("c")), lit(0L)).as("tu"))
      .crossJoin(biAll.agg(coalesce(sum(col("cb")), lit(0L)).as("tb")))
    bi
      .join(uni.select(col("tok").as("tok_a"), col("c").as("ca")), Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("c").as("cb_uni")), Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("cb").as("n_pair"),
        floor(lit(1000.0) * log(
          col("cb").cast("double") * col("tu") * col("tu") /
            (col("tb").cast("double") * col("ca") * col("cb_uni"))))
          .cast("long").as("pmi_milli"))
      .orderBy(col("pmi_milli").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
  }


  /** Bigram-LM out-of-domain scoring — the CCNet/Wikipedia-LM quality
    * filter shape (Wenzek et al. 2020): a REFERENCE half of the corpus
    * trains an add-one-smoothed bigram model, and every document
    * scores its adjacent token pairs' negative log-likelihood under
    * it — high NLL = unlike the reference domain, the number CCNet
    * buckets documents by (head/middle/tail). Frozen integer
    * conventions (the q51 discipline): per-pair
    * s = ⌊1000·ln((c1(w1) + V) / (c2(w1,w2) + 1))⌋ milli-nats, where
    * c1/c2 are reference unigram/bigram counts and V the reference
    * vocabulary size; an out-of-vocabulary w1 naturally scores
    * ⌊1000·ln(V)⌋. Output per doc: n_pairs, nll_milli (sum), and
    * avg_nll_milli (integer div; 0 for docs under 2 tokens).
    *
    * Scale shape: counts shuffle by token/pair (linear); each doc’s
    * pairs join the count tables by key; V rides a single-row
    * broadcast (the q51 crossJoin pattern, PlanHygiene-documented). */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
      refPred: Column): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol).as("id"), refPred.as("is_ref"),
      TextFunctions.tokens(col(textCol)).as("ws"))
    val pairsOf = zip_with(
      slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
      slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val pairs = toks.select(col("id"), col("is_ref"),
        explode(pairsOf).as("p"))
      .select(col("id"), col("is_ref"), col("p.w1").as("w1"),
        col("p.w2").as("w2"))
      .repartition(parts)
    val refUni = toks.where(col("is_ref"))
      .select(explode(col("ws")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val refBi = pairs.where(col("is_ref"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val vocab = refUni.agg(count(lit(1)).as("v"))
    val allDocs = df.select(col(idCol).as("id"))
    pairs
      .join(refUni, Seq("w1"), "left")
      .join(refBi, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        floor(lit(1000.0) * log(
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double") /
            (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double")))
          .cast("long").as("si"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("si")).cast("long").as("ssum"))
      // short docs (0 pairs) surface with zeros, not silently vanish
      .join(allDocs, Seq("id"), "right")
      .select(col("id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("ssum"), lit(0L)).as("nll_milli"),
        coalesce(expr("ssum div n_pairs"), lit(0L)).as("avg_nll_milli"))
  }
}
