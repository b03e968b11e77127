package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked lexical retrieval (BM25) and rank fusion — the query-serving
  * side of a training-data pipeline: "which documents best match this
  * probe" powers targeted data selection, eval-set neighborhood audits
  * ("what does the corpus contain near this benchmark question"), and
  * the lexical half of hybrid (lexical + embedding) search. The
  * containment searcher (Dedup.passageSearch) answers "which documents
  * CONTAIN this passage"; BM25 answers the softer "which documents are
  * ABOUT these terms", with the standard tf-saturation and
  * length-normalization behavior.
  *
  * Integer discipline (the engine's cross-engine contract, cf.
  * CorpusStats): every score is a BIGINT both engines compute
  * identically.
  *   - idf_mn(t)    = ⌊1000·ln((2N+2)/(2·df+1))⌋ — Lucene's
  *                    ln(1 + (N−df+½)/(df+½)) rewritten over the
  *                    integer rational (2N+2)/(2df+1); always > 0.
  *   - tfnorm_mn    = ⌊22000·tf·A / (10·tf·A + 3·A + 900·dl)⌋ — BM25's
  *                    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) at the
  *                    standard k1=1.2, b=0.75, cleared of floats by
  *                    A = ⌊100·T/D⌋ (avgdl in centitokens, itself an
  *                    integer both engines share). Integer-exact: no
  *                    float division anywhere, so no cross-engine ulp.
  *   - score(q,d)   = Σ_{t ∈ distinct(q)} idf_mn(t) · tfnorm_mn(t,d).
  * Overflow headroom: A ≤ 100·avgdl, so the tfnorm denominator is
  * ≈ 10·tf·A ≤ 10³·10⁷ — far inside BIGINT even at web-scale corpora
  * (the formulation deliberately avoids the naive 22000·tf·T form,
  * whose T factor overflows past ~10¹⁵ corpus tokens).
  *
  * Scale shape: the corpus-sized frames are the postings build (one
  * explode + one hash aggregation, shuffled on (id, tok)) and the
  * postings⋈query-terms probe — an equi-join on `tok` against a
  * BROADCAST query-term frame, so the corpus never reshuffles for the
  * probe and only matching postings survive into the per-(query, doc)
  * aggregation. df and corpus totals ride the same broadcast pattern
  * (df is bounded by the distinct query-term count; totals is one row).
  * Nothing driver-side, nothing all-pairs.
  */
object Retrieval {

  /** The maintainable index behind [[bm25TopK]]: a postings frame
    * (id, dl, tok, tf) and a single-row stats frame (d_docs, t_toks).
    * Both are ADDITIVE over disjoint document sets — a daily ingest
    * indexes only its delta and merges with [[mergeBm25Index]], never
    * re-tokenizing the standing corpus (the same delta-only discipline
    * as Dedup.incrementalMerge / Curation.curateIncrement).
    * Disjointness of document ids across merged increments is the
    * caller's contract (duplicate ids double-post). */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val toks = docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("ts"))
      .select(col("id"), col("ts"), size(col("ts")).cast("long").as("dl"))
    // One row per (doc, term): tf + the doc length riding the groupBy
    // (functionally dependent on id — no extra shuffle width).
    val postings = toks
      .select(col("id"), col("dl"), explode(col("ts")).as("tok"))
      .repartition(parts)
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val stats = toks.agg(
      count(lit(1)).as("d_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("t_toks"))
    (postings, stats)
  }

  /** Merge two [[bm25Index]] increments over disjoint document sets:
    * postings concatenate, stats add. Associative — fold any number of
    * daily deltas. */
  def mergeBm25Index(a: (DataFrame, DataFrame), b: (DataFrame, DataFrame))
      : (DataFrame, DataFrame) =
    (a._1.unionByName(b._1),
      a._2.unionByName(b._2).agg(
        coalesce(sum(col("d_docs")), lit(0L)).as("d_docs"),
        coalesce(sum(col("t_toks")), lit(0L)).as("t_toks")))

  /** BM25 top-k per query. `queries` is a small frame (broadcast —
    * thousands of probes, not millions); `docs` is the corpus.
    * Query terms are the DISTINCT tokens of `qtextCol` (set semantics,
    * the common BM25 convention). Documents score over every query
    * term they contain; ties break on ascending doc id. Rows with
    * rank ≤ k and score > 0 only — a query whose terms miss the whole
    * corpus returns no rows.
    * Output: (query_id, rank, doc_id, bm25_scaled). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    val (postings, stats) = bm25Index(docs, idCol, textCol)
    bm25TopKFromIndex(postings, stats, queries, qidCol, qtextCol, k)
  }

  /** [[bm25TopK]] over a prebuilt (or incrementally merged) index —
    * the serving path of a standing corpus: probes touch postings and
    * the single stats row, never the raw text. */
  def bm25TopKFromIndex(postings: DataFrame, stats: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    rankTopK(bm25Scored(postings, stats, queries, qidCol, qtextCol), k)
  }

  /** Hard-negative mining for retrieval/embedding training: each
    * probe's top-k BM25 matches EXCLUDING the probe's own source
    * document — the probes' id domain IS the doc id domain here
    * (queries cut from corpus documents, the standard mining setup).
    * The anchor doc would otherwise take rank 1 for almost every probe;
    * excluding it BEFORE ranking keeps ranks dense 1..k over the
    * negatives themselves, which is what a contrastive-training
    * loader consumes ((anchor, negative, rank) triples). Same
    * integer-exact scoring and scale shape as [[bm25TopK]]; the
    * exclusion is one bare-column predicate on the already
    * queries×corpus-bounded scored frame, before the per-query
    * window. Output: (query_id, rank, doc_id, bm25_scaled). */
  def bm25HardNegatives(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val (postings, stats) = bm25Index(docs, idCol, textCol)
    rankTopK(
      bm25Scored(postings, stats, queries, qidCol, qtextCol)
        .where(col("id") =!= col("query_id")), k)
  }

  /** Per-query dense rank + cut over a (query_id, id, bm25_scaled)
    * frame; ties break on ascending doc id. Two-level selection (the
    * [[graft.ann.TopK]] discipline, r15): a query matching much of the
    * corpus would otherwise sort ALL its candidates inside one window
    * task — the per-partition bounded prune caps the window's input at
    * numPartitions × |Q| × k rows under the identical ordering, so the
    * final ranking (and every oracle) is bit-identical. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_scaled").desc, col("id").asc)
    graft.ann.TopK.prunePerPartition(scored, "query_id", "bm25_scaled", "id", k)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("doc_id"),
        col("bm25_scaled"))
  }

  /** The shared scoring core: integer-exact BM25 of every corpus doc
    * against every query's distinct terms, positive scores only.
    * Output: (query_id, id, bm25_scaled). */
  private def bm25Scored(postings: DataFrame, stats: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame = {
    // Single-row totals: doc count D and the shared integer avgdl
    // quantization A = floor(100*T/D).
    val totals = stats
      // d_docs = 0 only when the corpus is empty — no posting survives to
      // consume a_cdl, but ANSI mode would still fault the broadcast-side
      // division, so pin a harmless 1
      .selectExpr("d_docs",
        "CASE WHEN d_docs = 0 THEN 1 ELSE (100 * t_toks) div d_docs END AS a_cdl")
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(TextFunctions.tokens(col(qtextCol)))).as("tok"))
    // df over the FULL corpus for exactly the probed terms: the
    // postings⋈distinct-term semi shape keeps the df frame bounded by
    // the query vocabulary, never the corpus vocabulary.
    val dfFrame = postings
      .join(broadcast(qterms.select(col("tok")).distinct()), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // idf·tfnorm in one integer expression (div = BIGINT floor-division;
    // the double only ever holds the small rational inside ln)
    val contrib = expr(
      "floor(1000.0 * ln(cast(2 * d_docs + 2 AS DOUBLE) " +
        "/ cast(2 * df + 1 AS DOUBLE))) " +
        "* ((22000 * tf * a_cdl) div " +
        "(10 * tf * a_cdl + 3 * a_cdl + 900 * dl))")
    postings
      .join(broadcast(qterms), Seq("tok"))
      .join(broadcast(dfFrame), Seq("tok"))
      .crossJoin(broadcast(totals))
      .select(col("query_id"), col("id"), contrib.as("contrib"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib")).as("bm25_scaled"))
      .where(col("bm25_scaled") > 0L)
  }

  /** Contrastive POSITIVE pair generation (the counterpart of
    * [[bm25HardNegatives]]): each sufficiently long document splits
    * into two disjoint half-spans — (anchor, positive) — the
    * inverse-cloze/ICT recipe for training retrieval embeddings
    * without labels: text from the same document is the positive,
    * everything else (plus mined hard negatives) is the negative.
    * The split is DETERMINISTIC (first ⌊n/2⌋ tokens vs the rest), so
    * regenerating the corpus regenerates identical pairs — no RNG to
    * disagree across runs or engines. Documents under `minTokens`
    * yield nothing (a 3-token "positive" teaches nothing; the
    * threshold also guarantees both halves are non-empty).
    *
    * Scale shape: one narrow projection per row — tokenize, two
    * slices re-joined into strings — no join, no shuffle at all; the
    * output partitions exactly as the input. Output: (id, anchor_text,
    * positive_text, n_anchor, n_positive). */
  def positiveSpanPairs(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2: $minTokens")
    val ts = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("id"), ts.as("__ts"))
      .where(size(col("__ts")) >= minTokens)
      .select(col("id"), col("__ts"),
        (size(col("__ts")) / 2).cast("int").as("__m"),
        size(col("__ts")).as("__n"))
      .select(col("id"),
        array_join(slice(col("__ts"), lit(1), col("__m")), " ").as("anchor_text"),
        array_join(slice(col("__ts"), col("__m") + 1, col("__n") - col("__m")), " ")
          .as("positive_text"),
        col("__m").cast("long").as("n_anchor"),
        (col("__n") - col("__m")).cast("long").as("n_positive"))
  }

  /** Reciprocal-rank fusion of two ranked lists (Cormack et al.):
    * each list contributes ⌊1000000/(k0 + rank)⌋ points per (query,
    * doc); absent-from-one-list docs simply score the other list's
    * points. Integer points — no float rank arithmetic to disagree
    * over. Both inputs must carry (query_id, doc_id, rank); ties in
    * fused points break on ascending doc id. Scale shape: one
    * full-outer equi-join on (query_id, doc_id) between two frames
    * already bounded by queries×k — tiny relative to any corpus.
    * Output: (query_id, rank, doc_id, rrf_pts). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    def pts(df: DataFrame, name: String) = df.select(
      col("query_id"), col("doc_id"),
      expr(s"1000000 div (${k0}L + rank)").as(name))
    val fused = pts(a, "pa")
      .join(pts(b, "pb"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("pa"), lit(0L)) + coalesce(col("pb"), lit(0L)))
          .as("rrf_pts"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_pts").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_pts"))
  }
}
