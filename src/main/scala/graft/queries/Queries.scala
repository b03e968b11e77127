package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Testdata-mapped query catalog: one entry per operator family from
  * SURVEY.md §2 (and the training-data extensions), expressed over the
  * driver's TPC-H-ish tables at `/root/testdata/sf*` plus
  * `documents`/`embeddings`.
  *
  * Conventions (driver oracle-compat):
  *   - every double-typed aggregate is `round(_, N)` in BOTH Spark and the
  *     DuckDB oracle SQL so accumulation-order float noise can't flip the
  *     hash compare;
  *   - every computed column is aliased identically on both sides (the
  *     driver sorts columns by name before hashing);
  *   - row sets are deterministic (no bare `dropDuplicates`/`limit`
  *     without a total order).
  *
  * Scale notes are inline per query; the common principles: aggregations
  * are partial+final hash aggs (map-side combine shrinks the shuffle to
  * #groups), dimension joins are broadcast (no shuffle of the fact
  * table), scans project/filter at the parquet reader (check
  * PushedFilters/ReadSchema in explain), and window functions partition
  * on high-cardinality keys so all 32 (or 1000×) cores fill.
  */
object Queries {

  /** Construct independent sweep arms CONCURRENTLY (guide §2.6 —
    * overlap independent jobs): each arm of a codebook/recall sweep
    * runs its own eager Lloyd training (a chain of small
    * driver-sequential jobs — codebook collects, localCheckpoints)
    * that leaves most of local[32] idle; submitting the arms from a
    * bounded pool lets the scheduler back-fill the idle cores. Purely
    * a scheduling change: every arm is a pure deterministic function
    * of its inputs, the result list keeps the caller's arm order, and
    * failures rethrow the original cause. */
  private def buildArms[A](thunks: Seq[() => A]): Seq[A] =
    if (thunks.size <= 1) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
          }
        }
      } finally pool.shutdown()
    }

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events.parquet lands `ts` as a parquet timestamp
    // (µs precision, read as TIMESTAMP_NTZ). The engine standardizes on
    // nanos-as-long for `ts` — integer arithmetic is exact, order-stable,
    // and engine-portable (the DuckDB oracles work from epoch_us(ts)) —
    // so restore that contract at the read boundary. The conversion is
    // wall-clock→instant and therefore needs the UTC session pin every
    // entry point applies (Bench/Verify/specs); fail loudly otherwise.
    // Older generator versions wrote TIMESTAMP(NANOS), which Spark reads
    // as long only under the legacy nanosAsLong flag — the LongType
    // branch keeps that shape working unchanged.
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        !df.schema("ts").dataType.isInstanceOf[org.apache.spark.sql.types.LongType]) {
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events.ts is a wall-clock timestamp; converting it to epoch nanos " +
          s"requires spark.sql.session.timeZone=UTC (got '$tz') — set it in " +
          "the SparkSession builder")
      df.withColumn("ts",
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
    } else df
  }

  /** The events table with real timestamp semantics: `ts_t` is the nano
    * instant truncated to microseconds as a TIMESTAMP_NTZ (timezone-less)
    * column carrying the UTC wall-clock — date_trunc / date_format /
    * interval arithmetic all work on it, and because NTZ has no zone
    * rules there is no DST cliff anywhere downstream (TimestampSemanticsSpec
    * proves hour buckets agree with pure integer bucketing across a DST
    * boundary). The raw nanos long stays available as `ts` for
    * order-exact arithmetic. Session timezone is pinned UTC so the
    * instant→wall-clock cast is deterministic regardless of cluster
    * locale (reference analog: datetime columns,
    * clinicaltrials_extractor.py:211-215). */
  def eventsTyped(spark: SparkSession, dir: String): DataFrame = {
    // Assert, don't set: a reader function must not mutate session state
    // as a side effect. Entry points (Bench/Verify/specs) pin UTC in the
    // builder; anything else is a caller bug surfaced here.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"eventsTyped requires spark.sql.session.timeZone=UTC (got '$tz'); " +
        "set it in the SparkSession builder — instant->wall-clock casts are " +
        "nondeterministic across cluster locales otherwise")
    tbl(spark, dir, "events").withColumn("ts_t",
      timestamp_micros(expr("ts div 1000"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
  }

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  // =================================================================
  // §2.6 A1 — hash aggregation with map-side combine
  // =================================================================

  /** Pricing summary (cf. reference per-drug rollup
    * drug_transformer.py:196-213). Low-cardinality string keys → the
    * shuffle moves #groups rows per partition, not data. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  // =================================================================
  // §2.4 F2-F4 + §2.6 A4/A6 — fused range-violation gate
  // =================================================================

  /** The reference runs each range check as its own full-frame pass
    * (data_quality.py:168-202); fusing them into ONE aggregation means
    * one scan and one reduce at any scale. */
  def q02RangeViolations(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      cnt(col("l_quantity") > 45).as("n_qty_gt_45"),
      cnt(col("l_discount") > lit(0.08)).as("n_disc_gt_008"),
      cnt(col("l_tax") > lit(0.06)).as("n_tax_gt_006"),
      cnt(col("l_extendedprice") < 0).as("n_neg_price"))

  /** F7/A6 null-profile: null count + percentage per column, one pass. */
  def q03NullProfile(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events").agg(
      count(lit(1)).as("n_rows"),
      cnt(col("value").isNull).as("null_value"),
      cnt(col("props").isNull).as("null_props"),
      round(avg(col("value").isNull.cast("int")) * 100, 4).as("null_value_pct"))

  // =================================================================
  // §2.5 D1-D4 — deduplication
  // =================================================================

  /** D1: deterministic keep='first' dedup (pandas semantics) — window
    * row_number over the business order instead of Spark's arbitrary-row
    * `dropDuplicates` (SURVEY §7.5 #2). One shuffle on the dedup key. */
  def q04DedupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    tbl(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
  }

  /** D4: duplicate detection with pandas keep=False semantics — count
    * EVERY member of a duplicated group (data_quality.py:211-225). */
  def q05DupDetect(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("dup_members"),
        count(lit(1)).as("dup_groups"))

  /** D3: distinct projection (drug_transformer.py:234). */
  def q06DistinctProjection(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()

  // =================================================================
  // §2.8 O1-O3 — sort / top-k
  // =================================================================

  /** O2: top-10 with a total order (tie-break on the key) so the result
    * set is deterministic. Spark plans TakeOrderedAndProject — a per-
    * partition top-k then a single-reducer merge of 10-row heaps, NOT a
    * global sort. */
  def q07TopK(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total_price"),
        col("o_orderstatus"))

  // =================================================================
  // §2.7 J1/J2 — joins
  // =================================================================

  /** J1-shaped bidirectional containment theta join (the enrichment
    * centerpiece, drug_transformer.py:248-282) mapped onto
    * nation×region. Catalyst plans BroadcastNestedLoopJoin with the
    * 5-row region side broadcast — the same shape Enrichment.enrich
    * uses, where the broadcast side is small by construction. */
  def q08ContainmentJoin(spark: SparkSession, dir: String): DataFrame = {
    val nation = tbl(spark, dir, "nation")
    val region = tbl(spark, dir, "region")
    nation.join(broadcast(region),
        col("n_name").contains(substring(col("r_name"), 1, 1)) ||
          col("r_name").contains(substring(col("n_name"), 1, 1)),
        "inner")
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("match_count"),
        min(col("n_name")).as("first_nation"))
  }

  /** Star-schema revenue rollup: fact table joined to three broadcast
    * dimensions — zero fact-table shuffles before the final aggregation.
    * At 100 TB the lineitem scan is the only big IO; AQE handles any
    * post-agg skew. */
  def q09StarRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    val orders = tbl(spark, dir, "orders")
    val cust = tbl(spark, dir, "customer")
    val nation = tbl(spark, dir, "nation")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Left-semi + left-anti (EXISTS / NOT EXISTS) — the dedup guard
    * pattern inside J1. Broadcast the distinct key set. */
  def q18SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = tbl(spark, dir, "customer")
    val orders = tbl(spark, dir, "orders").select(col("o_custkey"))
    val withOrders = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
    val withoutOrders = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
    withOrders.agg(count(lit(1)).as("n_with_orders"))
      .crossJoin(withoutOrders.agg(count(lit(1)).as("n_without_orders")))
  }

  // =================================================================
  // §2.9 — window functions
  // =================================================================

  /** Per-user top-3 events by time with a running value sum — the
    * row_number pattern that also backs deterministic dedup (D1). */
  def q10WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    tbl(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("running_value",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("running_value"))
  }

  // =================================================================
  // §2.3 P8/P9/P18 — date ops
  // =================================================================

  /** Ship latency: datediff + year extraction over an equi-join. */
  def q11ShipLatency(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    val orders = tbl(spark, dir, "orders")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_ship_days"),
        count(lit(1)).as("n"))
  }

  // =================================================================
  // §2.3 P16/P17 — pd.cut binning
  // =================================================================

  /** Right-closed binning (pd.cut semantics) over account balances;
    * out-of-range (incl. the left edge) → "Out of Range". */
  def q12AcctbalBinning(spark: SparkSession, dir: String): DataFrame = {
    val band = graft.etl.EtlFunctions.cut(col("c_acctbal"),
      Seq(0, 1000, 5000, Double.PositiveInfinity), Seq("Low", "Mid", "High"))
    tbl(spark, dir, "customer")
      .groupBy(coalesce(band, lit("Out of Range")).as("acctbal_band"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 2).as("avg_bal"))
  }

  // =================================================================
  // §2.3 P15/P19 — ordered when-chain scoring
  // =================================================================

  /** Severity-style weighted scoring via an ordered CASE chain
    * (cf. _parse_phase / _calculate_severity). Pure codegen'd column
    * arithmetic — no UDF. */
  def q13EventSeverity(spark: SparkSession, dir: String): DataFrame = {
    val weight = when(col("event_type") === "error", 10L)
      .when(col("event_type") === "purchase", 5L)
      .when(col("event_type") === "signup", 3L)
      .when(col("event_type") === "click", 2L)
      .otherwise(0L)
    tbl(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(weight).as("severity_score"), count(lit(1)).as("n_events"))
  }

  // =================================================================
  // §2.3 P11-P13/P22 — string cleaning / normalization
  // =================================================================

  /** Normalize-for-matching over documents (P22) + upper/trim (P11). */
  def q14TextNormalize(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents").select(
      col("doc_id"),
      length(graft.etl.EtlFunctions.normalizeForMatching(col("text"))).as("norm_len"),
      upper(substring(trim(col("text")), 1, 20)).as("head_upper"),
      col("n_chars"))

  // =================================================================
  // §2.3 P2-P7 — array / higher-order ops (on embeddings)
  // =================================================================

  /** Array ops with sequential double accumulation, so DuckDB's
    * list_reduce reproduces the float math exactly. */
  def q15EmbeddingStats(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
      expr("round(aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double)), 3)")
        .as("vec_sum"),
      expr("round(aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double)), 3)")
        .as("vec_norm_sq"),
      col("label"))

  // =================================================================
  // §2.4/§2.6 — fused quality gate (A4-A6, F5, F6)
  // =================================================================

  /** The 6-check quality gate shape over orders, one scan. The future-
    * date probe uses a fixed literal (not now()) for determinism. */
  def q16OrdersQuality(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders").agg(
      count(lit(1)).as("n_orders"),
      cnt(col("o_totalprice") < 0).as("n_neg_total"),
      cnt(col("o_orderdate") > lit("2001-01-01").cast("timestamp")).as("n_after_2001"),
      cnt(col("o_orderstatus") === "P").as("n_status_p"),
      cnt(col("o_orderstatus") === "O").as("n_status_o"),
      cnt(col("o_orderstatus") === "F").as("n_status_f"),
      countDistinct(col("o_custkey")).as("n_customers"))

  /** A5/F1: per-source counts with a minimum-count filter. */
  def q17TypeCounts(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 3).as("avg_value"))
      .where(col("n") >= 5)

  /** Distinct-aggregation (shuffle-heavy; Spark expands to two-phase
    * distinct agg). */
  def q19DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  // =================================================================
  // Training-data pipeline operators (SURVEY extensions):
  // dedup family, similarity search, text analysis
  // =================================================================

  /** Exact dedup stats per source (hash-groupBy; at scale the text key
    * would be pre-hashed — xxhash64 — to shrink shuffle width). */
  def q20ExactDedup(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"))

  /** Exact word-set Jaccard near-dup pairs, blocked by source (quadratic
    * term bounded per block; equi-join on the block key, no cross
    * product). */
  def q21JaccardNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.jaccardPairs(tbl(spark, dir, "documents"),
      "doc_id", "text", "source", shingleSize = 1, threshold = 0.8,
      hashShingles = true)

  /** MinHash(64)+LSH(16×4) near-dup pairs verified at J ≥ 0.7 over
    * 3-word shingles — the scale path for corpus-wide dedup: signatures
    * are per-row expressions, candidates come from a band-bucket
    * equi-join. 3-gram shingles (not word sets) keep the candidate set
    * proportional to true near-dups: with a small shared vocabulary,
    * word-set signatures would collide corpus-wide and the band join
    * would degenerate toward all-pairs. Polynomial signature hashes make
    * the whole pipeline DuckDB-reproducible → full oracle (q22Oracle);
    * DedupSpec additionally verifies recall vs exact Jaccard. */
  def q22MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minhashNearDupPairs(tbl(spark, dir, "documents"),
      "doc_id", "text", threshold = 0.7,
      graft.dedup.Dedup.MinHashConfig(numHashes = 64, shingleSize = 3, bands = 16))

  /** SimHash(48-bit) near-dup pairs at hamming ≤ 3 via 4-band bucketing
    * (exact recall by pigeonhole), blocked by source — this synthetic
    * corpus shares one small vocabulary, which clusters SimHash values
    * and would degenerate unblocked banding toward all-pairs. Polynomial
    * token hashes make the signatures DuckDB-reproducible → full oracle
    * (q23Oracle). */
  def q23SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.simhashNearDupPairs(tbl(spark, dir, "documents"),
      "doc_id", "text", maxDist = 3, blockCol = Some("source"))

  /** Embedding-cosine near-dup pairs (exact all-pairs baseline; the LSH
    * bucket variant is q29/AnnSpec). */
  def q24EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Ann.nearDupPairs(tbl(spark, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.4)

  /** Brute-force cosine top-10 for the first 5 query vectors. */
  def q25AnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    graft.ann.Ann.bruteForceTopK(emb.where(col("vec_id") < 5), emb,
      "vec_id", "embedding", k = 10)
  }

  /** Text-analysis feature set: token counts, stopword/punct ratios,
    * quality score — one shuffle-free scan.
    *
    * The gate exposes the quality score as an INTEGER millis score
    * (0..1000) computed with floor over small rationals: the double
    * formula's 0.4/0.3 weights produce terminating decimals that can
    * land exactly on a .xxxx5 rounding boundary, where Spark and the
    * oracle engine legitimately disagree in the last ulp (observed at
    * sf0.001). floor(p/q) with q ≤ 2n is ≥ 1/(2n) from any integer it
    * doesn't equal — no knife edge exists. */
  def q26TextStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions._
    // tokens staged through a select: the unstaged form re-evaluated the
    // interpreted tokenization inside ~8 output expressions per row (the
    // project's own HOF staging discipline; cf. q27's measured 5×)
    val staged = tbl(spark, dir, "documents")
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val ts = col("toks")
    val n = size(ts)
    val sumLen = aggregate(ts, lit(0L), (acc, t) => acc + length(t))
    // Ratios as floor-scaled integers (basis points / centi-chars): a
    // rational p/q with q ≤ n sits ≥ 1/q from any integer it doesn't
    // equal, so floor never splits across engines the way round(double)
    // can on near-half values.
    val stopHits = size(filter(ts, t => t.isin(EnglishStopwords: _*)))
    val punctChars = length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))
    staged.select(
      col("doc_id"),
      n.as("n_tokens"),
      size(array_distinct(ts)).as("n_distinct_tokens"),
      when(n > 0, floor(stopHits * lit(10000.0) / n)).otherwise(0L)
        .cast("long").as("stopword_bp"),
      when(length(col("text")) > 0,
        floor(punctChars * lit(10000.0) / length(col("text")))).otherwise(0L)
        .cast("long").as("punct_bp"),
      when(n > 0, floor(sumLen * lit(100.0) / n)).otherwise(0L)
        .cast("long").as("avg_token_len_centi"),
      // ONE shared quality formula with the curation gate
      qualityMilliFrom(ts).as("quality_milli"),
      subwordCount(col("text")).as("n_subword_tokens"))
  }

  /** Language-ID heuristic vs the labeled lang column. */
  def q27LangId(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions._
    // Staged: materialize tokens once, then the five marker-hit scores,
    // so the argmax when-chain compares cheap int attributes instead of
    // re-running split/lower/trim ~11× per row (a measured 5× win).
    val toks = tbl(spark, dir, "documents")
      .select(col("lang"), tokens(col("text")).as("toks"))
    val scored = toks.select(col("lang") +: LangMarkers.map { case (lang, m) =>
      langScoreFrom(col("toks"), m).as(s"s_$lang")
    }: _*)
    scored
      .groupBy(col("lang"),
        langIdFromScores(LangMarkers.map { case (lang, _) =>
          lang -> col(s"s_$lang")
        }).as("predicted_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** 40-bit rolling-hash document fingerprints (overflow-free modular
    * arithmetic — reproducible in any BIGINT engine). */
  def q28Fingerprint(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "documents").select(
      col("doc_id"),
      graft.text.TextFunctions.fingerprint(col("text")).as("fp40"))

  /** Batch gap-sessionization (the batch analog of the streaming
    * flatMapGroupsWithState sessionizer): lag → new-session flag →
    * running session id → per-session rollup. Two window passes over one
    * shuffle on user_id. Runs on the typed TIMESTAMP_NTZ column with a
    * real INTERVAL gap — timestamp subtraction yields a day-time
    * interval, compared against 30 minutes; the oracle does the
    * equivalent µs-integer arithmetic (both sides truncate ns → µs, so
    * the comparison is bit-identical). */
  def q29Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_t"), col("event_id"))
    eventsTyped(spark, dir)
      .withColumn("new_sess",
        when(lag(col("ts_t"), 1).over(w).isNull ||
          col("ts_t") - lag(col("ts_t"), 1).over(w) > expr("INTERVAL 30 MINUTES"),
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
  }

  /** LSH-bucketed embedding near-dup (the 100 TB path; q24 is the exact
    * baseline). 8 tables × 8 bits: 256-way buckets bound the candidate
    * join (16×4 would degenerate to all-pairs at this corpus size).
    * Hyperplane LSH recall falls with the threshold — ~20% at cos 0.4
    * (θ≈66°), ≳95% at real near-dup levels (cos ≥ 0.9); AnnSpec measures
    * recall explicitly. The pipeline itself is deterministic (fixed ±1
    * planes, bit-exact sequential dots), so the oracle reproduces the
    * exact candidate set and verified pairs (q30Oracle). */
  def q30LshEmbedding(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Ann.lshNearDupPairs(tbl(spark, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.4, planesPerTable = 8, tables = 8)

  /** Multimodal plumbing through the gate: binary payload column +
    * metadata → batched (stubbed) decode → fixed-dim features. The stub
    * decoder runs on 48-bit overflow-free arithmetic and emits
    * k/2^16 − 1/2 features (exact in float AND double), so the whole
    * path — byte fold, avalanche, feature value — is DuckDB-checked with
    * no rounding (q31Oracle). */
  def q31MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.fakeMediaFromDocuments(
      spark, tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.extractFeatures(media, dim = 8).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("feature"), 1).cast("double").as("f0"))
  }

  /** REAL image-header decode through the gate: a corpus whose payloads
    * carry valid PNG/JPEG prefixes (dimensions derived from the id) is
    * parsed byte-for-byte by the engine (PNG IHDR / JPEG SOF segment
    * walk); the oracle replays the id-derived dimensions, so any parser
    * misread (endianness, offset, segment skip) hash-fails. Format
    * goldens with hand-written byte fixtures live in MultimodalSpec. */
  def q77ImageHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.imageCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeImageHeaders(media).toDF()
  }

  /** Training-shard manifest through the gate: q56's greedy pack rolled
    * up to one row per shard — doc count, token total, and the
    * order-independent bit_xor fingerprint of member-id hashes that
    * proves shard membership without re-reading payloads. The writer
    * (ShardExport.writeShards) lands exactly this frame beside the
    * partitioned shard files; the round-trip is spec-verified. */
  def q78ShardManifest(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ShardExport.manifest(
      graft.ops.ScaleOps.packGreedyContiguous(
        tbl(spark, dir, "documents").select(col("doc_id"),
          graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", 256L, numBuckets = 8),
      "doc_id", "n_tokens")

  /** REAL WAV-header decode through the gate — q77's contract for the
    * audio path: RIFF chunk walk to fmt/data, frame count from data
    * bytes over block align; oracle replays the id-derived geometry. */
  def q79AudioHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.audioCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeAudioHeaders(media).toDF()
  }

  /** REAL MP4-header decode through the gate — completes the
    * image/audio/video triple: ISO-BMFF box walk to moov/mvhd/tkhd for
    * dimensions, timescale, and duration; oracle replays the id-derived
    * geometry. */
  def q81VideoHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.videoCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeVideoHeaders(media).toDF()
  }

  /** ROLLUP grouping sets (engine-added; the reference has none).
    * Subtotal rows surface as 'ALL' — unambiguous because the grouping
    * columns are non-null in this data. */
  def q32Rollup(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))

  /** Tumbling-window aggregation, batch analog of the streaming
    * windowedCounts — hour buckets on the typed TIMESTAMP_NTZ column.
    * The bucket key is the hour-truncated wall-clock rendered as a
    * string (date_format pins the sub-hour fields to :00:00), which both
    * exercises real date formatting on the typed column and keeps the
    * gate compare dtype-exact across engines (timestamp-typed output
    * would compare datetime64[us] against DuckDB's datetime64[ns]). */
  def q33HourBuckets(spark: SparkSession, dir: String): DataFrame =
    eventsTyped(spark, dir)
      .groupBy(date_format(col("ts_t"), "yyyy-MM-dd HH:00:00").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Exact interpolated percentiles per group (Catalyst `percentile`,
    * ≡ SQL percentile_cont). */
  def q34Percentiles(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))

  /** Semi-structured extraction: JSON path over the events.props string
    * column (P1-analog for JSON-in-string payloads). */
  def q35JsonExtract(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        cnt(col("k").isNull).as("null_k"))

  /** Approximate distinct counting (HyperLogLog++) beside the exact
    * count — the sketch path for 100 TB cardinality estimation (constant
    * memory per group vs the exact two-phase expansion). Sketch values
    * aren't oracle-reproducible → rows-only; QueriesSpec bounds the
    * relative error against the exact column. */
  def q36ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"))

  /** Group-level MinHash sketches (custom Aggregator with exact map-side
    * combine) + pairwise source-vocabulary similarity: one 64-long sketch
    * per source regardless of corpus size, then signature-agreement
    * fraction estimates each source pair's token-set Jaccard — the
    * "which crawl sources overlap" question at 100 TB without holding any
    * token set. Token hashes are the BIGINT-reproducible polynomial fold,
    * so the sketch itself is DuckDB-oracle-checked (64 generated min()
    * aggregates); ScaleOpsSpec additionally bounds the estimate against
    * exact Jaccard. */
  def q37SourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val hashed = tbl(spark, dir, "documents")
      .repartition(parts)
      .select(col("source"),
        transform(array_distinct(graft.text.TextFunctions.tokens(col("text"))),
          t => graft.text.TextFunctions.polyHash(t, 1L << 31)).as("th"))
    val sketches = hashed.groupBy(col("source"))
      .agg(graft.functions.MinHashSketchAgg.minhashSketch(col("th")).as("sig"))
      // empty-vocabulary groups sketch to null (see MinHashSketchAgg.finish)
      .where(col("sig").isNotNull)
    val a = sketches.select(col("source").as("src_a"), col("sig").as("sig_a"))
    val b = sketches.select(col("source").as("src_b"), col("sig").as("sig_b"))
    a.crossJoin(broadcast(b)).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / size(col("sig_a")), 4).as("est_jaccard"))
  }

  /** IVF-flat ANN top-10 (the q25 brute-force workload on the scale
    * path): centroids are TRAINED — stride-16 corpus-vector seed
    * + 2 fixed-point Lloyd rounds (Ann.ivfTrainCentroids) — cells come
    * from nearest-centroid assignment, and each query probes its 4
    * nearest cells. Scoring touches ~nProbe/|cells| of the corpus
    * instead of all of it; AnnSpec measures the trained-centroid
    * recall uplift vs brute force. */
  /** Trained IVF centroids — ONE definition for q38/q60/q72 and the
    * standing q111 index (the index those gates test must not
    * desynchronize). Training is oracle-replayable: assignment dots
    * accumulate sequentially, the per-coordinate sums floor to 2^-24
    * fixed point (exact integers, order-independent), and the L2 norm
    * folds left-to-right — DuckDB replays both Lloyd rounds
    * bit-identically (duckIvfCellsCtes).
    *
    * Trained ONCE per corpus dir per JVM and landed as a standing
    * parquet artifact (the [[standingIdx]] amortization, one level
    * down): training is deterministic and float parquet round-trips
    * bit-exactly, so every caller reads the identical centroid set a
    * fresh training would produce — a deployment trains at index-build
    * time, never per query. Disk-backed so cache eviction between gate
    * queries cannot force a retrain. */
  private val standingCent =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def trainedCentroids(spark: SparkSession, dir: String): DataFrame = {
    // The train+write Spark job runs OUTSIDE the map's bin lock
    // (computeIfAbsent would hold it for the job's duration,
    // serializing unrelated dirs that hash to the same bin and
    // deadlocking on re-entry); racing trainings are identical and
    // putIfAbsent keeps exactly one — the loser's temp dir is merely
    // an orphan the JVM exit reaps.
    val p = Option(standingCent.get(dir)).getOrElse {
      val emb = tbl(spark, dir, "embeddings")
      val out = java.nio.file.Files.createTempDirectory("graft-cent-standing").toString
      // one file: centroid count is corpus/stride — bounded small
      graft.ann.Ann.ivfTrainCentroids(emb, "vec_id", "embedding",
          stride = 16, iters = 2)
        .coalesce(1).write.mode("overwrite").parquet(out)
      Option(standingCent.putIfAbsent(dir, out)) match {
        case Some(winner) => tmpLifecycleDirs.add(out); winner
        case None => out
      }
    }
    spark.read.parquet(p)
  }

  def q38IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val centroids = trainedCentroids(spark, dir)
    val cells = graft.ann.Ann.ivfAssign(emb, "vec_id", "embedding", centroids)
    graft.ann.Ann.ivfProbeTopK(emb.where(col("vec_id") < 5), cells, centroids,
      "vec_id", "embedding", k = 10, nProbe = 4)
  }

  /** Cross-source 3-gram contamination audit: exact shared-shingle
    * counts and Jaccard per source pair (the precise counterpart of
    * q37's sketch estimate — sketch corpus-wide, audit flagged pairs). */
  def q39Contamination(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.sourceShingleOverlap(tbl(spark, dir, "documents"),
      "text", "source", shingleSize = 3)

  /** Within-document repetition stats (Gopher-style repeated-bigram
    * filter): duplicate-2-gram fraction in floor-scaled basis points. */
  def q40Repetition(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions._
    val staged = tbl(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), wordShinglesFrom(col("toks"), 2).as("sh"))
    staged.select(col("doc_id"),
      size(col("sh")).as("n_2grams"),
      size(array_distinct(col("sh"))).as("n_distinct_2grams"),
      repetitionBpFrom(col("sh")).as("rep_bp"))
  }

  /** PII detect + redact. This corpus carries no PII, so the query
    * deterministically injects a synthetic email/phone/IP per document
    * first — the detector and redactor then run on real expressions over
    * real data, and the redacted text is fingerprinted so the oracle
    * verifies the rewrite, not just the counts. */
  def q41PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Redact, TextFunctions}
    val injected = tbl(spark, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.org or 555-0199-2233 from 10.0.81.7")).as("t"))
    injected.select(col("doc_id"),
      Redact.emailCount(col("t")).as("n_emails"),
      Redact.phoneCount(col("t")).as("n_phones"),
      Redact.ipv4Count(col("t")).as("n_ips"),
      TextFunctions.fingerprint(Redact.redact(col("t"))).as("redacted_fp"))
  }

  /** Deterministic hash sampling at 25%: membership is a pure function
    * of the key, reproducible across engines/retries/cluster sizes —
    * the training-subset selection that never drifts between runs. */
  def q42DeterministicSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.deterministicSampleBp(
      tbl(spark, dir, "documents").select(col("doc_id"), col("source")),
      "doc_id", rateBp = 2500)

  /** Dedup clustering: connected components over the q21 near-dup pairs
    * (Jaccard ≥ 0.8 within source blocks) — every clustered doc mapped to
    * its canonical (minimum) doc id. The step that turns pairwise
    * similarity into "keep one per group" at corpus scale. Pairs are
    * block-local by construction, so the per-block union-find runs in
    * one shuffle with no driver iteration (the generic iterative
    * formulation exists for unblocked graphs; DedupSpec proves them
    * equal). */
  def q43DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q21JaccardNearDup(spark, dir)
    val src = tbl(spark, dir, "documents")
      .select(col("doc_id").as("id_a"), col("source"))
    graft.dedup.Dedup.connectedComponentsWithin(
        pairs.join(broadcast(src), "id_a"), "id_a", "id_b", "source")
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** TF-IDF top-5 distinctive terms per source (floor-scaled integer
    * score → total deterministic ranking; see CorpusStats). */
  def q44TfidfTerms(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.tfIdfTopTerms(
      tbl(spark, dir, "documents"), "text", "source", k = 5)

  /** Curation core end-to-end (quality gate → repetition filter → PII
    * redaction → exact dedup), fingerprinting the surviving text so the
    * oracle verifies the full rewrite chain, not just membership. The
    * near-dup/contamination/sampling stages compose on top (CurationSpec
    * exercises the full pipeline; their operators are oracle-checked
    * individually in q22/q39/q42/q43). */
  def q45CurationCore(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.curateCore(tbl(spark, dir, "documents"),
        // 560 sits near this corpus's 10th quality percentile, so the
        // gate provably rejects rows (an all-pass threshold would let a
        // broken filter hide behind a green oracle)
        graft.pipeline.Curation.CurationConfig(minQualityMilli = 560))
      .select(col("doc_id"), col("source"),
        graft.text.TextFunctions.fingerprint(col("text")).as("fp40"))

  /** Reproducible-HLL registers over l_orderkey: the sketch itself as a
    * relational result, hash-checked register by register (q36 keeps the
    * engine-native approx_count_distinct as the rows-only option; the
    * estimate-vs-exact bound lives in HllSpec). */
  def q46HllRegisters(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Hll.registers(
      tbl(spark, dir, "lineitem").select(col("l_orderkey")), "l_orderkey")

  /** As-of join through the gate: each purchase matched to the user's
    * most recent click at or before it (attribution), via the union-sort
    * last-value formulation — linear in |events|, no per-key range
    * product, hot-key safe (ScaleOps.asofJoinBackward). Clicks are
    * pre-aggregated to one row per (user, ts) so the at-time tie-break
    * is total and deterministic. The whole pipeline runs on the typed
    * TIMESTAMP_NTZ column — filter, group, union-sort window — proving
    * the as-of operator is time-type-generic; outputs render as
    * µs-precision wall-clock strings (dtype-exact across engines, with
    * the oracle truncating its nanos to µs identically). */
  def q47AsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsTyped(spark, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_t").as("p_ts"))
    val clicks = e.where(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts_t").as("c_ts"))
      .agg(max(col("event_id")).as("c_event"))
    graft.ops.ScaleOps.asofJoinBackward(purchases, clicks,
        "p_user", "c_user", "p_ts", "c_ts")
      .select(col("p_id"), col("p_user"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_time"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("c_time"),
        col("c_event"))
  }

  /** The FULL curation pipeline through the gate (q45 covers the core):
    * quality gate → PII redaction → exact dedup → MinHash-LSH near-dup
    * clustering (keep canonical) → eval-set decontamination → 25%
    * deterministic sample. The eval fixture is deterministic — every
    * 7th document plays the held-out benchmark corpus. Every stage is
    * reproducible arithmetic, so the oracle replays the entire
    * composition: candidate generation bit-equal (same hash params),
    * connected components as a recursive closure, the same sampling
    * filter — and the surviving text is fingerprinted so the rewrite
    * chain is verified, not just membership. */
  def q49CurationFull(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val (out, _) = graft.pipeline.Curation.curate(docs, Some(evalSet),
      graft.pipeline.Curation.CurationConfig(minQualityMilli = 560, sampleBp = 2500),
      countStages = false)
    out.select(col("doc_id"), col("source"),
      graft.text.TextFunctions.fingerprint(col("text")).as("fp40"))
  }

  /** Incremental merge through the gate: documents split deterministically
    * into an "existing corpus" and an "incoming day" (doc_id mod 3), then
    * merged with within-batch dedup and first-writer-wins fingerprint
    * collision drops. */
  def q48IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val existing = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val incoming = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    graft.dedup.Dedup.incrementalMerge(existing, incoming, "doc_id", "text")
      .select(col("doc_id"), col("source"), col("fp40"), col("origin"))
  }

  /** Int8 embedding quantization through the gate: per-vector symmetric
    * scale, floor-quantized components verified by count, value-sum and
    * an order-sensitive polynomial fold (arrays don't survive
    * engine-neutral cell compare; the fold pins every element+position).
    * The 4×-compression step of a 100 TB vector pipeline. */
  def q50QuantizeInt8(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Quantize.quantizeSummary(
      tbl(spark, dir, "embeddings"), "vec_id", "embedding")

  /** Unigram-LM surprisal (perplexity proxy) per document — corpus-level
    * language-model quality scoring with integer millinat arithmetic
    * (order-independent sums → engine-reproducible). */
  def q51Surprisal(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.unigramSurprisal(
        tbl(spark, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")

  /** Context-window chunking through the gate: documents split into
    * 32-token windows with stride 16 (50% overlap), each chunk pinned by
    * its token count and 40-bit fingerprint — the document→training-
    * example step of an LLM data pipeline. Per-row expansion, zero
    * shuffles before the gate's own ordering. */
  def q52Chunking(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.text.TextFunctions
    tbl(spark, dir, "documents")
      .select(col("doc_id"), tf.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(tf.tokenChunksFrom(col("toks"), 32, 16)).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        tf.tokenCount(col("chunk")).cast("long").as("n_chunk_tokens"),
        tf.fingerprint(col("chunk")).as("chunk_fp"))
  }

  /** Deterministic global example shuffle through the gate: every
    * document gets its reproducible permutation position (the
    * training-data loader order), verified position-by-position. */
  def q53ShufflePos(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.deterministicShufflePos(
      tbl(spark, dir, "documents").select(col("doc_id"), col("source")), "doc_id")

  /** Token-budget data mixing through the gate: four sources get target
    * corpus shares (40/20/10/5% of a 2000-token budget), rates derive
    * from measured token counts in pure integer arithmetic, and the
    * resulting deterministic sample is verified row-by-row. The
    * "downsample the crawl, keep the curated sources" allocation step of
    * training-mix construction. */
  def q54TokenMix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.mixByTokenBudget(
      tbl(spark, dir, "documents"), "source", "text", "doc_id",
      shareBp = Map("src0" -> 4000, "src1" -> 2000, "src2" -> 1000, "src3" -> 500),
      totalTokenBudget = 2000L)._1
      .select(col("doc_id"), col("source"))

  /** Token-stream packing through the gate: the deterministically
    * shuffled corpus concatenated and split into 256-token context
    * windows (GPT-pretraining packing — documents may straddle bin
    * boundaries). Every document is pinned to the bin its first token
    * lands in and its offset within that bin, verified row-by-row. */
  def q55PackStream(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.packTokenStream(
      tbl(spark, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 256L)

  /** Greedy first-fit packing through the gate: the no-split variant
    * (SFT / document-integrity packing) — bins fill in shuffle order
    * until the next document would overflow 256 tokens; bins are local
    * to 8 hash buckets (the packing parallelism unit). The whole
    * sequential fold is oracle-verified via a recursive-CTE replay. */
  def q56PackGreedy(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.packGreedyContiguous(
      tbl(spark, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 256L, numBuckets = 8)

  /** Boilerplate shingle coverage through the gate: per-document basis
    * points of 3-word shingle instances whose 40-bit fingerprint appears
    * in ≥ 3 distinct documents — the RefinedWeb-style corpus-repetition
    * signal (distinct from q40's WITHIN-document repetition). */
  def q57Boilerplate(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.boilerplateCoverage(
        tbl(spark, dir, "documents"), "doc_id", "text",
        shingleSize = 3, minDf = 3L)
      .withColumnRenamed("id", "doc_id")

  /** Quantized-rescore ANN through the gate: the int8 coarse scan (the
    * 4×-bandwidth index of a 100 TB vector store) picks 40 rerank
    * candidates per query; exact fp32 rescoring restores the final
    * top-10 — verified rank-by-rank against a full SQL replay of both
    * stages. */
  def q58QuantizedTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    graft.ann.Quantize.quantizedTopK(
      emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 10, rerank = 40)
  }

  /** Corpus snapshot diff through the gate: two deterministic snapshot
    * views of `documents` (v_old drops ids ≡ 0 mod 5; v_new drops ids
    * ≡ 1 mod 5 and revises the text of ids ≡ 0 mod 3), every document
    * classified added / removed / changed / unchanged — all four states
    * exercised and verified row-by-row. */
  def q59SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val oldSnap = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val newSnap = docs.where(pmod(col("doc_id"), lit(5)) =!= 1)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    graft.ops.Snapshot.diff(oldSnap, newSnap, "doc_id", "text")
  }

  /** Semantic diversity sample through the gate: at most 5 vectors kept
    * per IVF cell (the stride-16 index q38 probes), chosen by the
    * avalanche-mixed key hash — the embedding-space balancing pass of
    * corpus curation, verified id-by-id. */
  def q60DiversitySample(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cells = graft.ann.Ann.ivfAssign(emb, "vec_id", "embedding",
      trainedCentroids(spark, dir))
    graft.ann.Ann.diversitySample(cells, maxPerCell = 5)
      .withColumnRenamed("id", "vec_id")
  }

  /** Count-min sketch registers through the gate: the frequency sketch
    * over every token instance of the corpus, verified register by
    * register (q46's HLL treatment applied to the counting sketch —
    * completes the distinct/similarity/frequency sketch family). */
  def q61CmsRegisters(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Cms.tokenRegisters(tbl(spark, dir, "documents"), "text")

  /** Histogram-sketch registers through the gate: per-event-type
    * fixed-width value histogram (the scale path for q34's exact
    * percentiles — no per-group sort, ≤ range/width register rows),
    * verified bucket by bucket. */
  def q62ValueHistogram(spark: SparkSession, dir: String): DataFrame =
    graft.functions.HistSketch.registers(
      tbl(spark, dir, "events"), "event_type", "value", width = 5.0)

  /** Z-order layout values through the gate: the Morton interleave of
    * (user_id, ⌊value⌋) verified event by event — the multi-dimensional
    * lake-clustering key that lets parquet min/max pruning serve
    * predicates on EITHER column (ZOrderSpec measures the locality). */
  def q63ZValues(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"),
        graft.ops.ZOrder.zValue2(col("user_id"),
          floor(col("value")).cast("long"), 16).as("zval"))

  /** Bloom-filter set bits through the gate: the membership sketch of
    * every document text, verified bit by bit — at scale the ≤4096-row
    * frame broadcasts in place of the key set itself (eval-corpus
    * decontamination without shipping the corpus). */
  def q65BloomBits(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Bloom.bits(tbl(spark, dir, "documents"), "text")

  /** Ordered-funnel conversion through the gate: users who clicked,
    * then viewed strictly after their first click, then purchased
    * strictly after that first view — the sequence-matching analytics
    * staple, as three conditional-min aggregations (never a per-user
    * event sort). */
  def q66Funnel(spark: SparkSession, dir: String): DataFrame = {
    // µs domain on both sides (ts div 1000 here, epoch_us in the oracle):
    // DuckDB truncates the nano timestamps to µs, so nano-domain "strictly
    // after" would disagree with the oracle whenever two funnel events of
    // a user share a microsecond — same discipline as q64/q68/q74.
    val ev = tbl(spark, dir, "events").select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("ts"))
    val c = ev.where(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val v = ev.where(col("event_type") === "view")
      .join(c, Seq("user_id")).where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.where(col("event_type") === "purchase")
      .join(v, Seq("user_id")).where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    c.agg(count(lit(1)).as("n_click"))
      .crossJoin(v.agg(count(lit(1)).as("n_click_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Dataset-card corpus report through the gate: the one-row release
    * summary (docs, tokens, sources, langs, distinct texts, exact-dup
    * basis points, mean quality) in a single aggregation pass. */
  def q67DatasetCard(spark: SparkSession, dir: String): DataFrame =
    graft.text.DatasetCard.report(
      tbl(spark, dir, "documents"), "doc_id", "text", "source", "lang")

  /** Bucketed interval join through the gate: every click inside a
    * purchase's 30-minute attribution window, as an equi-join on time
    * buckets (never the BroadcastNestedLoop a raw BETWEEN theta-join
    * plans to), verified pair-by-pair against a plain SQL range join. */
  def q68IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    // µs domain on both sides: DuckDB truncates the nano timestamps to
    // µs, so nano-domain window edges would only probabilistically
    // agree (same reasoning as q74)
    val halfHourUs = 1800000000L
    val ev = tbl(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), expr("ts div 1000").as("click_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        (expr("ts div 1000") - halfHourUs).as("lo"), expr("ts div 1000").as("hi"))
    graft.ops.ScaleOps.intervalJoin(clicks, purchases,
        "click_us", "lo", "hi", bucketWidth = halfHourUs)
      .select(col("purchase_id"), col("click_id"))
  }

  /** Score-weighted deterministic sampling through the gate: each
    * document's keep rate derives from its own quality score
    * (rate_bp = quality_milli × 8, clamped) — high-quality documents
    * survive at a higher rate, decided by the same reproducible key
    * hash as q42. */
  def q69WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val tf = graft.text.TextFunctions
    val staged = tbl(spark, dir, "documents")
      .select(col("doc_id"), col("source"), tf.tokens(col("text")).as("toks"))
      .withColumn("rate_bp", tf.qualityMilliFrom(col("toks")) * 8)
    graft.ops.ScaleOps.weightedSampleBp(staged, "doc_id", col("rate_bp"))
      .select(col("doc_id"), col("source"), col("rate_bp").cast("long").as("rate_bp"))
  }

  /** Group-wise HLL registers through the gate: one distinct-user
    * sketch per event type, verified register by register — the
    * per-group analog of q46, with the exchange bounded by
    * |groups|x1024 rows. */
  def q70HllByGroup(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Hll.registersBy(
      tbl(spark, dir, "events"), "event_type", "user_id")

  /** Deterministic train/val/test split through the gate: 90/5/5 by
    * the reproducible key hash, verified row by row — a document's
    * split never changes as the corpus grows, the property that
    * prevents silent train/test contamination across versions. */
  def q71TrainSplit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.deterministicSplit(
      tbl(spark, dir, "documents").select(col("doc_id"), col("source")),
      "doc_id", Seq("train" -> 9000, "val" -> 500, "test" -> 500))

  /** Within-cell (SemDeDup-shaped) embedding near-dup pairs through
    * the gate: candidates share an IVF cell (the persisted index at
    * scale — no LSH tables, no bucket-pair dedup), exact cosine
    * verifies at 0.35 (where these synthetic unclustered embeddings
    * actually have pairs — a 0.9 gate would pass on zero rows). */
  def q72CellNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cells = graft.ann.Ann.ivfAssign(emb, "vec_id", "embedding",
      trainedCentroids(spark, dir))
    graft.ann.Ann.cellNearDupPairs(cells, threshold = 0.35)
  }

  /** INCREMENTAL embedding near-dup through the gate — the third
    * modality's delta-vs-standing form (text: q118, image: q160):
    * a vector delta (every 25th id — the q111 query-batch convention)
    * probes the STANDING IVF index's nProbe=4 nearest cells and keeps
    * exact-cosine partners at the q24 threshold (0.4), reading only
    * the probed cells' rank-bucket partitions. This is SemDeDup's
    * serving path: the standing corpus is never re-scored; recall is
    * the IVF probe's (q149 audits it) — the candidate set is the
    * probed cells, exactness is the verify dot. The oracle replays
    * the trained-centroid chain, the probe ranking, and the verify
    * products bit-identically (the q149 machinery at a threshold). */
  def q162EmbedDeltaNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val idx = standingIvfIdx(spark, dir)
    val delta = emb.where(pmod(col("vec_id"), lit(25)) === 0)
    val probes = graft.ops.CacheScope.persist(graft.ann.Ann.ivfProbes(delta,
      graft.ann.IvfIndex.centroids(spark, idx), "vec_id", "embedding", nProbe = 4))
    val cellIds = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    graft.ann.IvfIndex.prunedCells(spark, idx, cellIds)
      .join(probes, Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        graft.functions.Fence.fence(
          round(graft.ann.Ann.dot(col("q_vec"), col("v")), 3)).as("cos"))
      .where(col("cos") >= 0.4)
  }

  /** MinHash-LSH recall audit through the gate — measure, don't
    * guess: the banded pipeline's recall against the EXACT Jaccard
    * pair set, bucketed by similarity (500 bp buckets), on a corpus
    * whose similarity axis is POPULATED: each document plants a
    * partial-overlap variant (its first 20-92% of tokens, the
    * fraction id-derived) so pairs sweep J from ~0.2 up and the
    * banding recall cliff — P(catch) = 1-(1-J^rows)^bands collapsing
    * at low J — is visible in the output instead of assumed from
    * theory. The exact arm is the inverted-index join (never
    * all-pairs); the banded arm is the q22 pipeline at the audit
    * threshold. This is the table a deployment tunes bands/rows
    * against (the q151 nProbe-sweep discipline for the LSH family). */
  def q163LshRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextFunctions.tokens(col("text")).as("ts"))
    val variants = toks.where(size(col("ts")) > 0).selectExpr(
      "doc_id + 1000000 AS doc_id",
      "concat_ws(' ', slice(ts, 1, greatest(3, " +
        "(size(ts) * (20 + (doc_id % 13) * 6)) div 100))) AS text")
    val corpus = docs.unionByName(variants)
    val exact = graft.dedup.Dedup.jaccardPairsInverted(corpus, "doc_id", "text",
      shingleSize = 3, threshold = 0.2)
    val banded = graft.dedup.Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        threshold = 0.2,
        graft.dedup.Dedup.MinHashConfig(numHashes = 64, shingleSize = 3, bands = 16))
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    exact
      .withColumn("jbp", round(col("jaccard") * 10000, 0).cast("long"))
      .join(banded, Seq("id_a", "id_b"), "left")
      .selectExpr("jbp div 500 AS bucket", "coalesce(hit, 0L) AS hit")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_exact"), sum(col("hit")).as("n_banded"))
      .selectExpr("bucket * 500 AS bucket_lo_bp", "n_exact", "n_banded",
        "(10000 * n_banded) div n_exact AS recall_bp")
  }

  /** Bigram conditional surprisal through the gate: per-document mean
    * -ln P(tok|prev) in millinats — the next-token LM-quality signal
    * (catches locally-predictable templated text that unigram
    * surprisal misses). Docs with < 2 tokens have no bigrams and are
    * absent. */
  def q73BigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.bigramSurprisal(
        tbl(spark, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")

  /** Rolling 30-minute window aggregates through the gate: per event,
    * the running sum/count over the user's trailing half hour — a
    * RANGE frame (not ROWS: simultaneous events share the frame) over
    * the MICROSECOND timestamp: DuckDB reads the TIMESTAMP(NANOS)
    * parquet truncated to µs, so a nano-domain frame would agree with
    * the oracle only while no event pair straddles a boundary within
    * 1 µs — µs on both sides makes parity structural. Values ride as
    * floor-scaled milli longs so the running sum is order-independent
    * integer arithmetic. */
  def q74RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-1800000000L, 0L)
    tbl(spark, dir, "events")
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tus"),
        floor(col("value") * 1000).cast("long").as("vm"))
      .select(col("event_id"), col("user_id"),
        sum(col("vm")).over(w).as("rolling_milli_30m"),
        count(lit(1)).over(w).as("n_events_30m"))
  }

  /** Group-wise CMS registers through the gate: one token-frequency
    * sketch per source, verified register by register (q70's per-group
    * treatment applied to the counting sketch). */
  def q75CmsBySource(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Cms.tokenRegistersBy(
      tbl(spark, dir, "documents"), "source", "text")

  /** Span-level (substring) dedup through the gate: maximal duplicated
    * 5-token-window extents per document — fingerprint posting lists →
    * df ≥ 2 duplicated-window set → per-document gaps-and-islands merge
    * (the Lee-et-al substring-dedup shape; candidates by fp equi-join,
    * never all-pairs). */
  def q76DupSpans(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.duplicatedSpans(
        tbl(spark, dir, "documents"), "doc_id", "text", spanTokens = 5, minDf = 2L)
      .withColumnRenamed("id", "doc_id")

  /** Passage containment search through the gate: 10-token passages cut
    * from every 50th document, searched across the whole corpus by
    * alignment voting over 5-token window fingerprints — each passage
    * must rediscover its source (match_pos 3) plus any true near-dup
    * carriers; the oracle replays the vote count in SQL. */
  def q82PassageSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val passages = docs
      .where(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("query_id"), toks.as("ts"))
      .where(size(col("ts")) >= 12)
      .select(col("query_id"), array_join(slice(col("ts"), 3, 10), " ").as("qtext"))
    graft.dedup.Dedup.passageSearch(docs, "doc_id", "text",
      passages, "query_id", "qtext", shingleSize = 5)
  }

  /** Span-level eval contamination through the gate — GPT-3-style
    * n-gram decontamination: documents sharing any 8-token window with
    * the src0 held-out slice, with leaked-window counts. The eval side
    * collapses to distinct window fingerprints (broadcast); corpus
    * postings probe it in one join. */
  def q83SpanContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.dedup.Dedup.spanContamination(docs, "doc_id", "text",
        docs.where(col("source") === "src0"), "text", spanTokens = 8)
      .withColumnRenamed("id", "doc_id")
  }

  /** Soft-dedup training weights through the gate: q43's near-dup
    * clusters inverted into per-document weights — a cluster
    * contributes ~one document's worth of gradient regardless of size;
    * unclustered documents weigh 10000 bp. */
  def q86DedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val clusters = q43DedupClusters(spark, dir)
      .select(col("doc_id").as("id"), col("cluster_id").as("component"))
    graft.dedup.Dedup.dedupWeights(tbl(spark, dir, "documents"), "doc_id", clusters)
      .withColumnRenamed("id", "doc_id")
  }

  /** Targeted data selection through the gate: DSIR importance weights
    * of every non-src0 document against the src0 target sample —
    * add-1-smoothed unigram log-likelihood ratio per document in
    * integer millinats, every candidate document present. */
  def q87DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.text.CorpusStats.dsirWeights(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
  }

  /** DSIR with the paper's bounded feature space through the gate:
    * hashed-bigram (polyHash mod 4096 buckets) importance weights of
    * every non-src0 document against the src0 target sample. */
  def q88DsirHashed(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.text.CorpusStats.dsirWeightsHashed(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"), "doc_id", "text", buckets = 4096)
      .withColumnRenamed("id", "doc_id")
  }

  /** Budgeted selection through the gate: the q87 DSIR ranking
    * truncated at a 20k-token budget — "take the most target-like
    * documents until the budget fills", the step that follows scoring.
    * Two-level value-range cumsum; no global window partition. */
  def q89DsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val weights = graft.text.CorpusStats.dsirWeights(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"), "doc_id", "text")
    graft.ops.ScaleOps.selectTokenBudget(
        weights, "id", "dsir_milli", "n_tokens", 20000L)
      .withColumnRenamed("id", "doc_id")
  }

  /** 8-token probe queries cut from every 25th document — shared by the
    * BM25 (q90) and hybrid (q91) retrieval gates, mirrored token-exactly
    * by the `probe` CTE in their oracles. */
  private def retrievalProbes(spark: SparkSession, dir: String): DataFrame = {
    val ts = graft.text.TextFunctions.tokens(col("text"))
    tbl(spark, dir, "documents")
      .where(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id").as("query_id"), ts.as("ts"))
      .where(size(col("ts")) >= 9)
      .select(col("query_id"),
        array_join(slice(col("ts"), 2, 8), " ").as("qtext"))
  }

  /** BM25 ranked retrieval through the gate: integer-exact BM25
    * (millinat idf × integer-rational tf-normalization, k1=1.2 b=0.75)
    * of the corpus against 8-token probes, top-10 per probe. The probe
    * join is postings ⋈ broadcast(query terms) — the corpus never
    * reshuffles for the probe batch; the oracle replays every integer
    * step. */
  def q90Bm25TopK(spark: SparkSession, dir: String): DataFrame =
    graft.text.Retrieval.bm25TopK(tbl(spark, dir, "documents"), "doc_id",
      "text", retrievalProbes(spark, dir), "query_id", "qtext", k = 10)

  /** Hybrid lexical+semantic retrieval through the gate: BM25 top-20
    * and brute-force-cosine top-20 for the same probe ids, fused by
    * integer reciprocal-rank points ⌊10⁶/(60+rank)⌋, final top-10.
    * Assumes the standard shared id space (documents.doc_id ↔
    * embeddings.vec_id). The exact-cosine arm is the labeled
    * small-batch baseline (q25); at corpus scale it swaps for the IVF
    * arm (q38) without touching the fusion. */
  def q91HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val emb = tbl(spark, dir, "embeddings")
    val lex = graft.text.Retrieval.bm25TopK(docs, "doc_id", "text",
        retrievalProbes(spark, dir), "query_id", "qtext", k = 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = graft.ann.Ann.bruteForceTopK(
        emb.where(pmod(col("vec_id"), lit(25)) === 0), emb,
        "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.text.Retrieval.rrfFuse(lex, sem, k = 10)
  }

  /** Tokenizer-vocabulary coverage through the gate: the top-16
    * corpus-frequency vocabulary scored per source — instance coverage
    * in basis points plus distinct OOV type counts (the "will a size-V
    * vocab cover this source" pre-tokenizer audit). The top-V cut is
    * sort+limit (TakeOrderedAndProject), never a global window. */
  def q92VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.vocabCoverage(
      tbl(spark, dir, "documents"), "source", "text", vocabSize = 16)

  /** Exact-k stratified sampling through the gate: exactly 3 documents
    * per source by affine-spread hash order — the balanced eval-panel
    * primitive (q42's rate form can only approximate a count). Window
    * top-k per stratum; the oracle replays the spread-hash order. */
  def q93ExactSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.exactKSampleBy(
        tbl(spark, dir, "documents"), "doc_id", "source", k = 3)
      .select(col("doc_id"), col("source"))

  /** Candidate-pair verification through the gate: the q21 word-set
    * Jaccard candidates re-judged by exact character-level Levenshtein
    * similarity at ≥ 9000 bp — the verify stage production dedup runs
    * after signature-based candidate generation. On this corpus the
    * threshold provably splits: set-similar pairs whose word ORDER
    * differs score ~2400–3500 bp and are rejected; true near-identical
    * rewrites score ~9800 and survive (an all-pass threshold would let
    * a broken verifier hide behind a green oracle, cf. q45). The
    * strict threshold is also what keeps the verify pass cheap: the
    * banded distance runs in a ⌊0.1·mx⌋ diagonal, not the full DP
    * (sub-threshold candidates exit with −1 — rejection IS the cheap
    * path). */
  def q94EditVerified(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.editVerifiedPairs(tbl(spark, dir, "documents"),
      "doc_id", "text", q21JaccardNearDup(spark, dir), minSimBp = 9000L)

  /** Quality-ranked canonicalization through the gate: for each q43
    * dup cluster keep the member with the highest q26 quality score
    * (ties: lowest id), unclustered docs surviving as their own
    * singletons — "keep the best copy", not "keep the first seen". */
  def q95CanonicalQuality(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.canonicalByQuality(tbl(spark, dir, "documents"),
      "doc_id", "text", q43DedupClusters(spark, dir))

  /** Hard-negative mining through the gate: each probe's top-5 BM25
    * matches excluding the probe's own source document (the anchor),
    * ranks dense over the negatives — the contrastive-training pair
    * generator on top of the q90 scoring core. */
  def q96HardNegatives(spark: SparkSession, dir: String): DataFrame =
    graft.text.Retrieval.bm25HardNegatives(tbl(spark, dir, "documents"),
      "doc_id", "text", retrievalProbes(spark, dir), "query_id", "qtext",
      k = 5)

  /** Contrastive POSITIVE pair generation through the gate: every
    * document of ≥ 8 tokens split into two disjoint half-spans
    * (anchor, positive) — the deterministic inverse-cloze recipe that
    * pairs with q96's hard negatives to form full contrastive
    * training triples. Pure per-row projection, zero shuffles. */
  def q97PositivePairs(spark: SparkSession, dir: String): DataFrame =
    graft.text.Retrieval.positiveSpanPairs(
        tbl(spark, dir, "documents"), "doc_id", "text", minTokens = 8)
      .withColumnRenamed("id", "doc_id")

  /** Temperature-scaled source mixing through the gate: per-source
    * sampling weights p_s ∝ c_s^0.7 over token counts — the
    * multilingual-LM rebalancing rule that keeps a dominant source
    * from swamping training without flattening to uniform. One
    * aggregation; weights in integer basis points. */
  def q98TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.temperatureWeights(
      tbl(spark, dir, "documents"), "source", "text", alphaMilli = 700L)

  /** Curriculum staging through the gate: documents banded into 4
    * difficulty stages by exact quartiles of q51 unigram surprisal —
    * value-banded (ties share a stage), percentile boundaries
    * broadcast, no global window. Composes with q53's deterministic
    * within-stage shuffle at load time. */
  def q99Curriculum(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.text.CorpusStats.unigramSurprisal(
        tbl(spark, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), col("surprisal_milli"))
    graft.ops.ScaleOps.curriculumStages(scored, "surprisal_milli", nStages = 4)
  }

  /** Split-leakage audit through the gate: q21 near-dup pairs whose
    * endpoints fall in different q71 train/val/test splits — the
    * "dedup before you split" violation detector, every leaking pair
    * surfaced with both labels. */
  def q100SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val split = graft.ops.ScaleOps.deterministicSplit(
      tbl(spark, dir, "documents").select(col("doc_id")), "doc_id",
      Seq("train" -> 9000, "val" -> 500, "test" -> 500))
    graft.dedup.Dedup.crossSplitPairs(q21JaccardNearDup(spark, dir),
      split.select(col("doc_id"), col("split")))
  }

  /** Collocation mining through the gate: top-25 adjacent-bigram PMI
    * at a ≥ 5 count cutoff — integer-millinat scores over exact
    * counts, total (score, tok_a, tok_b) ranking, sort+limit plan. */
  def q101BigramPmi(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.bigramPmiTop(
      tbl(spark, dir, "documents"), "text", k = 25, minCount = 5L)

  /** Winnowed fingerprints through the gate: MOSS-style minimum
    * selection over 5-token shingle fingerprints in windows of 4
    * (rightmost-min ties) — the ~1/window-density document index
    * whose selected fps still guarantee detection of any shared run
    * of ≥ 8 tokens. Pure per-row higher-order expression. */
  def q102Winnowing(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.winnowedFingerprints(
      tbl(spark, dir, "documents"), "doc_id", "text",
      shingleTokens = 5, window = 4)
      .withColumnRenamed("id", "doc_id")

  /** Winnowed cross-corpus overlap through the gate: src0 documents
    * vs the rest over q102's selected fingerprints — pairs sharing
    * ≥ 2 distinct selected fps, the ~1/window-density contamination
    * detector (q83 is the full-postings auditor; this is its scale
    * path). Per-side df-cap guards the fp join's hot keys. */
  def q103WinnowedOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.dedup.Dedup.winnowedOverlapPairs(
      docs.where(col("source") === "src0"),
      docs.where(col("source") =!= "src0"),
      "doc_id", "text", shingleTokens = 5, window = 4,
      minShared = 2L, maxDf = 1000L)
  }

  /** Per-source length profile through the gate: exact interpolated
    * token-count percentiles per source (q34's rounding discipline) —
    * the distribution-shape card that length filters and packing
    * policies are tuned against. */
  def q104SourceProfile(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.lengthProfile(
      tbl(spark, dir, "documents"), "source", "text")

  /** Vocabulary encoding through the gate: every document's token
    * stream as integer ids under the top-16 corpus vocabulary
    * (frequency-rank ids, OOV bucket = 16), order recovered by
    * position sort — the tokenize-for-training last mile. The id
    * array rides the gate as its CSV rendering (the comparator hashes
    * scalar cells); the operator itself returns the real array. */
  def q105EncodeTokens(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.encodeTopV(
        tbl(spark, dir, "documents"), "doc_id", "text", vocabSize = 16)
      .withColumnRenamed("id", "doc_id")
      .select(col("doc_id"), array_join(col("ids"), ",").as("ids_csv"),
        col("n_tokens"), col("n_oov"))

  /** Packed training sequences through the gate: the full last mile —
    * q105's encoded id streams greedily packed (q56's fold, 256-token
    * bins, 8 buckets) and assembled per pack in fold order with
    * document boundary offsets (attention-mask metadata). Composition
    * of three verified operators; the whole packed sequence and its
    * boundaries hash-compare as CSV. */
  def q106PackedSequences(spark: SparkSession, dir: String): DataFrame = {
    // `enc` feeds both the pack and the assembly join — persist so the
    // encode (tokenize + vocab join) runs once, not twice.
    val enc = graft.ops.CacheScope.persist(graft.text.CorpusStats.encodeTopV(
      tbl(spark, dir, "documents"), "doc_id", "text", vocabSize = 16))
    // pack on the BARE (id, n) projection — the id arrays must not ride
    // the pack's repartition+sort; they join back once, at assembly
    val packed = graft.ops.ScaleOps.packGreedyContiguous(
      enc.select(col("id"), col("n_tokens")),
      "id", "n_tokens", 256L, numBuckets = 8)
    graft.ops.ScaleOps.assemblePackedSequences(
      packed.join(enc.select(col("id"), col("ids")), Seq("id")),
      "id", "ids", "n_tokens")
  }

  /** Trained quality classifier through the gate: multinomial Naive
    * Bayes (add-1, integer millinat log-odds + class prior) with weak
    * labels "document comes from a curated source" (src0–src3) — the
    * GPT-3/CCNet-style learned filter, scored over every document.
    * All-integer once each per-token log floors, so the gate hashes
    * exactly (CorpusStats.naiveBayesQuality). */
  def q107NbQuality(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.naiveBayesQuality(
        tbl(spark, dir, "documents").withColumn("y",
          when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
            .otherwise(0L)),
        "doc_id", "text", "y")
      .withColumnRenamed("id", "doc_id")

  /** JL random projection through the gate: every embedding shrunk
    * 64→16 dims over fixed ±1 sign planes (offset 64 — disjoint from
    * q30's LSH tables), coordinates floored to integer millis. The
    * dots are bit-exact sequential accumulation on both engines (the
    * q30 discipline), so the floor is hash-safe with no boundary
    * argument needed. */
  def q108RandomProjection(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "embeddings").select(col("vec_id"),
      array_join(transform(
        graft.ann.Ann.randomProject(col("embedding"), outDim = 16,
          dim = 64, planeOffset = 64),
        d => floor(d * lit(1000.0)).cast("long")), ",").as("proj_csv"))

  /** Projected-rescore ANN through the gate: the q108 JL pre-shrink
    * composed into a working index path — coarse top-40 per query on
    * the 16-dim projected vectors, exact fp32 rescore to the final
    * top-10 (q58's two-stage shape with the projection as the coarse
    * index). Verified rank-by-rank against a full SQL replay of both
    * stages. */
  def q110ProjectedTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    graft.ann.Ann.projectedRescoreTopK(
      emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 10, rerank = 40, outDim = 16, dim = 64, planeOffset = 64)
  }

  /** Hybrid retrieval with the IVF semantic arm through the gate: the
    * q91 fusion (BM25 top-20 + semantic top-20, integer RRF points,
    * final top-10) with the PERSISTED IVF index serving the semantic
    * arm — the full at-scale form: the index builds once
    * (IvfIndex.write, fused one-pass assignment, cells landed
    * partitioned by cell) and the probe reads ONLY the probed cell
    * partitions (nProbe=4 of ~n/16 cells — partition pruning at the
    * file listing, IvfIndexSpec-asserted). BOTH arms serve from the
    * per-corpus STANDING indexes (see [[standingIdx]]): the first run
    * builds them, every later run is probe-only — exactly how a
    * deployed retrieval stack amortizes its index builds. Probe==fresh
    * parity keeps the oracle identical to the in-memory chain;
    * RetrievalSpec pins recall against the q91 brute baseline. */
  /** Standing disk indexes for the hybrid-retrieval gate: built ONCE
    * per corpus per JVM (memoized by sf dir) and probed by every
    * subsequent run — the deployment amortization the persisted
    * indexes exist for. Disk-backed, so CacheScope.releaseAll between
    * gate queries cannot evict them; deterministic builds, so a warm
    * run probes exactly the index a fresh build would produce
    * (probe==fresh parity is what puts these behind the oracle). The
    * first q111 run pays build + probe; warm runs measure the true
    * serving path — probe-only, reading pruned index partitions. */
  private val standingIdx = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // the standing dirs are JVM-lifetime artifacts under tmp; delete them
  // on exit so repeated local sessions don't accumulate orphans (a real
  // deployment lands its indexes at a stable lake path instead — this
  // tmp placement exists only for the self-contained gate)
  /** Per-invocation lifecycle temp dirs (q117/q118/q146 build their
    * index/tokenizer/shard artifacts fresh each call) — registered
    * here so the same exit hook reclaims them; a bench sweep otherwise
    * orphans a full shard export per q146 run. */
  private val tmpLifecycleDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def tmpLifecycleDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    tmpLifecycleDirs.add(p)
    p
  }
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    val dirs = new java.util.ArrayList[String](standingIdx.values())
    dirs.addAll(standingCent.values())
    dirs.addAll(tmpLifecycleDirs)
    dirs.forEach { p =>
      try {
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => java.nio.file.Files.deleteIfExists(q))
          finally walk.close()
        }
      } catch { case _: Throwable => () } // best-effort at JVM exit
    }
  }))
  // Both standing builds run their Spark jobs OUTSIDE the map's bin
  // lock — the trainedCentroids discipline (computeIfAbsent would hold
  // the bin for the job's duration, serializing unrelated keys that
  // hash to the same bin and deadlocking on re-entry). Racing builds
  // are deterministic-identical; putIfAbsent keeps exactly one and the
  // loser's temp dir is an orphan the JVM exit hook reaps (losers are
  // registered in tmpLifecycleDirs so they are reclaimed either way).
  private def standingIvfIdx(spark: SparkSession, dir: String): String =
    Option(standingIdx.get("ivf:" + dir)).getOrElse {
      val emb = tbl(spark, dir, "embeddings")
      val p = java.nio.file.Files.createTempDirectory("graft-ivf-standing").toString
      // gate-sized bucket counts (write cost is directory-count-bound
      // — see q117's note); 100 TB uses O(thousands)
      graft.ann.IvfIndex.write(emb, "vec_id", "embedding",
        trainedCentroids(spark, dir), p, numBuckets = 16)
      Option(standingIdx.putIfAbsent("ivf:" + dir, p)) match {
        case Some(winner) => tmpLifecycleDirs.add(p); winner
        case None => p
      }
    }
  private def standingBm25Idx(spark: SparkSession, dir: String): String =
    Option(standingIdx.get("bm25:" + dir)).getOrElse {
      val p = java.nio.file.Files.createTempDirectory("graft-bm25-standing").toString
      graft.text.Bm25DiskIndex.write(tbl(spark, dir, "documents"),
        "doc_id", "text", p, numBuckets = 16)
      Option(standingIdx.putIfAbsent("bm25:" + dir, p)) match {
        case Some(winner) => tmpLifecycleDirs.add(p); winner
        case None => p
      }
    }

  def q111HybridIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    // the two standing indexes are independent builds — construct them
    // concurrently (buildArms, guide §2.6) so the first run's build
    // cost overlaps instead of serializing; warm runs hit the memo and
    // pay nothing either way
    val built = buildArms(Seq(
      () => standingBm25Idx(spark, dir), () => standingIvfIdx(spark, dir)))
    val lex = graft.text.Bm25DiskIndex.probeTopK(spark, built(0),
        retrievalProbes(spark, dir), "query_id", "qtext", k = 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = graft.ann.IvfIndex.probeTopK(spark, built(1),
        emb.where(pmod(col("vec_id"), lit(25)) === 0),
        "vec_id", "embedding", k = 20, nProbe = 4)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.text.Retrieval.rrfFuse(lex, sem, k = 10)
  }

  /** BPE vocabulary learning through the gate: the first 8 merges
    * learned on the documents corpus (freq-weighted adjacent-pair
    * argmax, count DESC / left ASC / right ASC ties) — the oracle
    * replays all 8 iterations as unrolled SQL CTE chains with the
    * identical delimiter-string merge rewrite. */
  def q112BpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.mergeTable(tbl(spark, dir, "documents"), "text",
      numMerges = 8)

  /** BPE encoding through the gate: every document's subword stream
    * under the q112 merge table — learn once, broadcast the word→seg
    * table onto token instances, reassemble in token order. Empty/NULL
    * docs surface with an empty stream. */
  def q113BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val (_, seg) = graft.text.Bpe.learn(docs, "text", numMerges = 8)
    graft.text.Bpe.encode(docs, "doc_id", "text", seg)
      .withColumnRenamed("id", "doc_id")
  }

  /** Classifier calibration through the gate: the q107 scores bucketed
    * into clamped 2000-millinat bins with the weak-label rate per bin —
    * "do higher scores actually mean more curated-like" (a filter whose
    * rate is flat across bins is noise, and a threshold move reads
    * straight off the table). The floor-divide runs in double on both
    * engines: IEEE division of exact integers is correctly rounded, so
    * bin boundaries land exactly. Bounded output (≤ 11 bins). */
  def q115NbCalibration(spark: SparkSession, dir: String): DataFrame = {
    // Unlike q107 (fused train+score shares the instance scan — fastest
    // single-pass shape), the calibration audit materializes the
    // vocab-sized model first: naiveBayesScore's prior aggregation and
    // token join each re-execute the model subtree, and under a cached
    // plan AQE can't see the tiny model to broadcast it (the measured
    // dsirWeights discipline — count() makes InMemoryRelation stats
    // drive a static broadcast). Same model, same scores, same oracle.
    val docs = tbl(spark, dir, "documents").withColumn("y",
      when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
        .otherwise(0L))
    val model = graft.ops.CacheScope.persist(
      graft.text.CorpusStats.naiveBayesTrain(docs, "doc_id", "text", "y"))
    model.count()
    graft.text.CorpusStats.naiveBayesScore(
        docs.select(col("doc_id").as("id"), col("y").as("label"), col("text")),
        "id", "text", model)
      .select(col("label"),
        least(greatest(floor(col("nb_milli") / lit(2000.0)).cast("long"),
          lit(-5L)), lit(5L)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("label")).as("n_pos"))
      .withColumn("pos_bp", expr("(10000 * n_pos) div n_docs"))
  }

  /** Quality-filled temperature mix through the gate — the final
    * training-mix assembly composing three verified pipelines: q98's
    * temperature weights set each source's share of a 20k-token
    * budget, and each source fills its budget with its HIGHEST-q107-
    * scoring documents (ScaleOps.selectTokenBudgetBy — global score
    * buckets, per-(source, bucket) windows, broadcast budgets; no
    * whole-group window anywhere). Output: the selected mix with
    * per-source inclusive token cumsums. */
  def q116QualityMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val budgets = graft.text.CorpusStats.temperatureWeights(
        docs, "source", "text", alphaMilli = 700L)
      .select(col("source"),
        expr("(20000 * weight_bp) div 10000").as("token_budget"))
    val scored = graft.text.CorpusStats.naiveBayesQuality(
        docs.withColumn("y",
          when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
            .otherwise(0L)),
        "doc_id", "text", "y")
      .withColumnRenamed("id", "doc_id")
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("nb_milli"))
    graft.ops.ScaleOps.selectTokenBudgetBy(scored, "doc_id", "nb_milli",
      "n_tokens", "source", budgets)
  }

  /** Persisted-BM25-index retrieval through the gate: the full disk
    * lifecycle INSIDE the query — write half the corpus as the standing
    * index, append the other half as a daily delta, then retire and
    * re-append one slice at a later seq (a changed-docs day whose net
    * live set is unchanged), and serve the q90 probes from the
    * persisted postings with bucket-pruned reads. Probe==fresh parity
    * (Bm25DiskIndexSpec) means the result IS the q90 ranking, so the
    * q90 oracle replays it unchanged — a broken append, tombstone
    * filter, or negative-stats increment would hash-mismatch here.
    * Each invocation builds in a fresh temp dir (runs are
    * self-contained; at production scale the dir is a lake path and
    * the build amortizes across probe batches — the whole point). */
  def q117Bm25IndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val idx = tmpLifecycleDir("graft-q117")
    // bucket count scales with the corpus (write cost is directory-
    // count-bound — measured 5.9 s at 64 dirs vs 1.7 s at 16 for the
    // same sf0.1 data): gate-sized corpora get 16; 100 TB uses
    // O(thousands) so each bucket stays executor-sized
    graft.text.Bm25DiskIndex.write(
      docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      idx, numBuckets = 16, seq = 1L)
    graft.text.Bm25DiskIndex.append(
      docs.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
      idx, seq = 2L)
    val slice = docs.where(pmod(col("doc_id"), lit(10)) === 3)
    graft.text.Bm25DiskIndex.retire(slice, "doc_id", "text", idx, seq = 3L)
    graft.text.Bm25DiskIndex.append(slice, "doc_id", "text", idx, seq = 3L)
    graft.text.Bm25DiskIndex.probeTopK(spark, idx,
      retrievalProbes(spark, dir), "query_id", "qtext", k = 10)
  }

  /** Persisted-LSH-index near-dup probe through the gate: write 2/5 of
    * the corpus, append another 2/5 (the standing index), then probe
    * the remaining fifth as the daily delta — near-dups of the delta
    * against standing ∪ delta, exactly the q22 pair set restricted to
    * pairs touching the delta (the oracle replays q22 and filters).
    * Probe==focused parity (LshDiskIndexSpec) puts the banded disk
    * layout, the (band, bucket) partition pruning, and the append path
    * behind the driver's hash gate. */
  def q118LshIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
    val idx = tmpLifecycleDir("graft-q118")
    val standing = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    // 2 buckets × 16 bands = 32 partition dirs — gate-sized (the write
    // cost is dir-count-bound; same-JVM A/B at sf0.1 measured the
    // write+append pair at ~2.4 s with 32 dirs vs ~5.1 s with 64, and
    // earlier 4.7 s at 128 — each halving of dirs roughly halves the
    // committer cost at this data size); a 100 TB corpus uses
    // O(thousands) so each (band, bucket) partition stays executor-sized
    graft.dedup.LshDiskIndex.write(
      standing.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text",
      idx, numBuckets = 2, seq = 1L)
    graft.dedup.LshDiskIndex.append(
      standing.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
      idx, seq = 2L)
    graft.dedup.LshDiskIndex.probe(spark, idx,
      docs.where(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text", 0.7)
  }

  /** REAL PNG pixel decode through the gate — the q77 generate-parse-
    * replay pattern one level deeper: payloads are FULLY ENCODED PNGs
    * (id-derived pixels, all five scanline filters, zlib IDAT), the
    * engine inflates + unfilters them back to raw RGB, and the oracle
    * replays the closed-form per-channel sums/squares — a single
    * mis-predicted byte anywhere (filter math, Paeth ordering, inflate
    * framing) hash-fails every downstream aggregate. */
  def q119PngPixels(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.pngPixelCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodePngPixelStats(media).toDF()
  }

  /** REAL WAV sample decode through the gate — q119's contract for the
    * audio path: payloads are fully-encoded 16-bit PCM clips
    * (id-derived samples behind a real RIFF header), the engine reads
    * back every interleaved little-endian sample, and the oracle
    * replays the closed-form per-channel sums — a mis-read byte order,
    * channel interleave, or signedness hash-fails every aggregate. */
  def q120WavSamples(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.wavPcmCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeWavSampleStats(media).toDF()
  }

  /** REAL baseline JPEG decode through the gate — the second image
    * codec after q119's PNG: payloads are real DC-only baseline
    * streams (custom canonical DHTs, all-ones DQT, FF-stuffed entropy
    * data; even ids 3-component YCbCr, odd ids grayscale), the engine
    * runs the full table-parse + Huffman + dequant + IDCT + color
    * conversion path, and the oracle replays the closed-form block
    * constants — a mis-decoded bit anywhere shifts the DC predictor
    * chain and hash-fails everything after it. */
  def q124JpegPixels(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.jpegDcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeJpegPixelStats(media).toDF()
  }

  /** REAL MP4 sample-table decode through the gate — the video-side
    * depth step past q81's mvhd/tkhd walk: per-(clip, track) sample
    * counts, byte totals (both stsz forms), chunk counts, and
    * stts-summed durations from walking moov → trak → mdia → minf →
    * stbl; the oracle replays the closed-form id-derived tables. */
  def q125Mp4Samples(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mp4SampleCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeMp4SampleStats(media).toDF()
  }

  /** 4:2:0 JPEG decode through the gate — the q124 contract on the
    * dominant real-world sampling layout: the full subsampled MCU loop
    * (4 raster luma blocks + Cb + Cr per MCU, per-component DC
    * predictors) and the half-resolution chroma plane with per-MCU
    * varying chroma, so the upsampling index math is load-bearing.
    * Same closed-form DC-only + rounding-safe chroma discipline. */
  def q127Jpeg420(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.jpeg420CorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeJpegPixelStats(media).toDF()
  }

  /** 4:2:2 JPEG decode through the gate — q127's contract on the
    * half-WIDTH-chroma layout (broadcast/camera default): 16×8 MCUs
    * (2 luma blocks + Cb + Cr, per-component DC predictors), chroma
    * varying with BOTH MCU coordinates so the horizontal-only
    * upsampling index math is load-bearing in both axes. Same
    * closed-form DC-only + rounding-safe chroma discipline. */
  def q158Jpeg422(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.jpeg422CorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeJpegPixelStats(media).toDF()
  }

  /** `.jsonl.zst` ingest through the gate — the NDJSON corpus-
    * distribution layout end to end: hand-escaped 2-line NDJSON
    * members zstd-compressed per doc, inflated + line-split by
    * [[graft.multimodal.Containers.decodeJsonl]], then REALLY parsed
    * by Spark's from_json (the fixture's escaper and Spark's parser
    * are independent implementations, so escaping semantics are
    * cross-derived). Corrupt members (id%3==0, checksum-guaranteed)
    * surface as ok=0 rows with null fields. The oracle states the
    * recovered records closed-form. */
  def q159JsonlZst(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.jsonlZstCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeJsonl(media, codec = "zstd").toDF()
      .select(col("media_id"), col("line_no"), col("ok"),
        from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "rec_id BIGINT, part INT, body STRING")).as("j"))
      .select(col("media_id"), col("line_no"), col("ok"),
        col("j.rec_id").as("rec_id"), col("j.part").as("part"),
        col("j.body").as("body"))
  }

  /** Persisted perceptual-hash index lifecycle through the gate — the
    * q118 discipline on the IMAGE modality (incremental media dedup):
    * write 2/5 of the decoded pHash corpus, append another 2/5 (the
    * standing index), probe the remaining fifth as the daily media
    * delta — perceptual near-dups of the delta against standing ∪
    * delta, exactly the q133 pair set restricted to pairs touching
    * the delta (the oracle replays the closed-form pHash pipeline and
    * filters). Probe==in-memory parity, banded disk layout, and the
    * (band, bucket) partition pruning are PhashDiskIndexSpec-pinned;
    * gate numBuckets=2 (16 dirs — directory count drives write cost
    * at this scale; 100 TB uses O(hundreds+)). */
  def q160PhashIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.ops.CacheScope.persist(
      graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
        .where(col("ok") === 1)
        .select(col("media_id").as("id"), col("phash")))
    val idx = tmpLifecycleDir("graft-q160")
    val standing = hashes.where(pmod(col("id"), lit(5)) =!= 0)
    graft.dedup.PhashDiskIndex.write(
      standing.where(pmod(col("id"), lit(2)) === 0), "id", "phash", idx,
      totalBits = 64, bands = 8, numBuckets = 2, seq = 1L)
    graft.dedup.PhashDiskIndex.append(
      standing.where(pmod(col("id"), lit(2)) === 1), "id", "phash", idx,
      seq = 2L)
    graft.dedup.PhashDiskIndex.probe(spark, idx,
      hashes.where(pmod(col("id"), lit(5)) === 0), "id", "phash", maxDist = 5)
  }

  /** INCREMENTAL paired image-text curation through the gate — q157's
    * decision rule served from STANDING indexes, the form a daily
    * multimodal loop actually runs: the standing 4/5 of the corpus is
    * indexed once (pHash bands on the image side, MinHash LSH on the
    * caption side); the delta fifth probes both, paying only its own
    * (band, bucket) footprints. A delta pair is dropped when its
    * caption fails the structural Gopher gate, when either side
    * near-dups ANYTHING standing, or when it near-dups a SMALLER-id
    * delta item (the deterministic first-wins rule a daily ingest
    * applies — no transitive closure needed incrementally, unlike
    * q157's whole-corpus cluster canonicalization). Precedence as in
    * q157. Output: the delta's ids with kept + drop_reason. */
  def q161PairedDelta(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val media = graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(docs)
    val hashes = graft.ops.CacheScope.persist(
      graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
        .where(col("ok") === 1)
        .select(col("media_id").as("id"), col("phash")))
    val idxP = tmpLifecycleDir("graft-q161-ph")
    val idxL = tmpLifecycleDir("graft-q161-lsh")
    // the two standing-index builds are independent writes — overlap
    // them (§2.6); each probe then reads its own finished index
    buildArms(Seq(
      () => graft.dedup.PhashDiskIndex.write(
        hashes.where(pmod(col("id"), lit(5)) =!= 0), "id", "phash", idxP,
        totalBits = 64, bands = 8, numBuckets = 2, seq = 1L),
      () => graft.dedup.LshDiskIndex.write(
        docs.where(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "text", idxL,
        numBuckets = 2, seq = 1L)))
    val imgPairs = graft.dedup.PhashDiskIndex.probe(spark, idxP,
      hashes.where(pmod(col("id"), lit(5)) === 0), "id", "phash", maxDist = 5)
    val capPairs = graft.dedup.LshDiskIndex.probe(spark, idxL,
      docs.where(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text", 0.7)
    // a delta id d is a dup iff some partner is standing, or a delta
    // item with a smaller id (pairs are (id_a < id_b)-normalized:
    // id_b's partner is always smaller; id_a's counts only if standing)
    def dupIds(pairs: DataFrame, flag: String): DataFrame =
      pairs.where(pmod(col("id_b"), lit(5)) === 0).select(col("id_b").as("doc_id"))
        .unionByName(pairs.where(pmod(col("id_a"), lit(5)) === 0 &&
          pmod(col("id_b"), lit(5)) =!= 0).select(col("id_a").as("doc_id")))
        .distinct().withColumn(flag, lit(1))
    val quality = graft.text.QualityRules.gopherRules(
        docs.where(pmod(col("doc_id"), lit(5)) === 0), "text")
      .select(col("doc_id"),
        when(col("n_words").between(50L, 100000L) &&
             col("mean_word_len_milli").between(3000L, 10000L) &&
             col("symbol_bp") <= 1000L && col("bullet_bp") <= 9000L &&
             col("ellipsis_bp") <= 3000L && col("alpha_bp") >= 8000L,
          lit(1L)).otherwise(lit(0L)).as("keep"))
    quality
      .join(broadcast(dupIds(capPairs, "cap_dup")), Seq("doc_id"), "left")
      .join(broadcast(dupIds(imgPairs, "img_dup")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keep") === 0, lit("caption_quality"))
          .when(col("cap_dup") === 1, lit("caption_dup"))
          .when(col("img_dup") === 1, lit("image_dup"))
          .otherwise(lit("")).as("drop_reason"))
      .select(col("doc_id"),
        when(col("drop_reason") === "", lit(1L)).otherwise(lit(0L)).as("kept"),
        col("drop_reason"))
  }

  /** FLAC stream classification through the gate — the lossless arm
    * of the compressed-audio audit family (q156 covers MPEG): the
    * metadata-block walk recovers rate/channels/bits/total-samples
    * (exact duration, no frame parsing) with tagged error families
    * (not_flac / no_streaminfo / truncated) and the frame payload
    * counted opaque. Every field and every error walk id-planted and
    * restated closed-form by the oracle. */
  def q164FlacHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Flac.flacCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Flac.decodeFlacInfo(media).toDF()
  }

  /** WebP classification through the gate — the q77/q156/q164 pattern
    * for the most common modern crawl image format: RIFF walk + the
    * first bitstream bytes of VP8 (lossy keyframe dims), VP8L
    * (lossless LE-packed dims/alpha/version), and VP8X (extended
    * flags + canvas), four tagged refusal families (not_webp /
    * truncated at BOTH the RIFF and chunk levels / bad_bitstream /
    * no_image). Every field and every error walk id-planted and
    * restated closed-form by the oracle. */
  def q165WebpHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Webp.webpCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Webp.decodeWebpInfo(media).toDF()
  }

  /** Ogg container classification through the gate — the q156/q164
    * pattern for the container those streams usually arrive in: full
    * page walk with VALIDATED page CRCs (the Ogg forward CRC-32),
    * Vorbis/Opus id-header classification off the BOS page, duration
    * from the final granule position (Opus granules run at 48 kHz
    * minus pre-skip), six tagged refusal families. Every field and
    * every error walk id-planted and restated closed-form. */
  def q166OggHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Ogg.oggCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Ogg.decodeOggInfo(media).toDF()
  }

  /** ZIP member extraction through the gate — the q132 pattern for
    * the remaining common corpus container: central-directory walk,
    * stored AND raw-deflate members extracted (both paths planted via
    * id parity), per-member CRC-32 validated against the directory,
    * a flipped directory CRC surfacing ok=0 crc_ok=0 with the name
    * kept, and a broken EOCD as a container-level refusal. */
  def q167ZipMembers(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.zipCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeZip(media).toDF()
  }

  /** Lossless-WebP REAL pixel decode through the gate — q133's pair
    * query over a VP8L-encoded corpus carrying q133's EXACT pixel
    * functions, with the encoding path fanned over id%5 (plain /
    * subtract-green / predictor / LZ77 / color-cache). The oracle is
    * q133's closed-form pHash replay VERBATIM: lossless decode means
    * the hash set cannot depend on which bitstream features encoded
    * each image — the whole VP8L layer proven invisible to content
    * semantics (the q155 discipline, applied to the third image
    * codec). */
  def q168WebpPhash(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Webp.webpPhashCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** Lossy-WebP REAL pixel decode through the gate — the q168
    * discipline on the FOURTH image codec: a VP8-keyframe-encoded
    * corpus carrying ONE closed-form pixel function
    * ([[graft.multimodal.Vp8.q174Gray]]) with the coding path fanned
    * over id%4 (B_PRED / 16x16+WHT / mixed-mode rows / two token
    * partitions + skip flags). The fixture encoder is
    * exact-by-construction (qindex 0, additions-only DCT basis,
    * recon REQUIREd equal to target at build time), so the oracle
    * replays the pixel formula's pHash closed-form — the whole lossy
    * bool-coder/token/prediction/WHT layer proven invisible to
    * content semantics. */
  def q174Vp8Phash(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Webp.vp8PhashCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** GIF frame fingerprints through the gate — q169's audit on the
    * ORIGINAL animation wrapper (LZW, the q140 pixel formula, the
    * doc_id%3==1 third beside q169's %3==0): every frame's LZW
    * pixels REALLY decode through the palette and pHash, the wire
    * shape fanned pixel-invisibly (local color tables at id%5==2,
    * per-frame interlace at (id+f)%2), GIF87a's GCE-less frames
    * surface duration 0 at id%13==6, a replaced LZW stream surfaces
    * ok=0 'bad_lzw' with its parsed duration KEPT and the walk
    * continuing, and a broken signature refuses at the container
    * level. */
  def q175GifFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Gif.gifCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Gif.decodeGifPHash(media).toDF()
  }

  /** Still-GIF REAL pixel decode through the gate — the q168/q174
    * discipline on the FIFTH image codec: a single-frame-GIF corpus
    * carrying q133's EXACT pixel functions, wire shape fanned
    * pixel-invisibly (87a/89a, local color tables, interlace), routed
    * through the codec-SNIFFING [[graft.multimodal.Multimodal
    * .decodeImagePHash]] dispatch (proving the GIF branch of the
    * shared still-image path, not a GIF-only entry point). The oracle
    * is q133's closed-form pHash replay VERBATIM — the LZW/palette/
    * interlace layer cannot move the hash set. */
  def q176GifPhash(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Gif.gifPhashCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** PDF classification through the gate — the q77/q156 pattern on the
    * crawl's dominant DOCUMENT format: header version, trailer /Size,
    * page-tree count, /Encrypt flag, and the tagged container refusals
    * (not_pdf / truncated), over a corpus whose wire shape fans
    * text-invisibly across classic xref tables, PDF-1.5 xref STREAMS
    * (with the PNG Up predictor), and compressed-object streams —
    * every field and every arm restated closed-form from id
    * arithmetic. */
  def q178PdfHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Pdf.pdfCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Pdf.decodePdfInfo(media).toDF()
  }

  /** PDF text extraction through the gate: each doc's text REALLY
    * round-trips through a PDF page — escaped into a content stream
    * (literal, TJ-split, or hex show strings), optionally
    * FlateDecode-compressed, located through whichever xref form the
    * id selects, and extracted back by the content-stream walk. The
    * oracle is the ORIGINAL text (+ the frozen ET newline), so any
    * asymmetry between the escape and unescape paths, a wrong stream
    * offset, or a broken filter chain surfaces as a text mismatch.
    * An /Encrypt doc refuses whole ('encrypted' — decrypting is out
    * of scope, loudly); an LZW-declared page refuses alone while its
    * sibling extracts. */
  def q179PdfText(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Pdf.pdfCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Pdf.decodePdfText(media).toDF()
  }

  /** Product-quantized ANN through the gate (Jégou et al. 2011 — the
    * FAISS IVF-PQ serving shape): per-subspace codebooks train with
    * stride-seeded fixed-point Lloyd (8 subspaces x 8 dims over the
    * 64-dim embeddings, stride-16 seeds, 2 rounds), the corpus encodes
    * to 8 code bytes per vector (16x vs fp32, 32x vs the int8 tier),
    * and the 25-query batch ranks candidates by ADC — the per-query
    * m x k partial-dot table summed over each candidate's codes as
    * exact fixed-point longs. The oracle replays training, encoding,
    * and ADC end-to-end. */
  def q181PqTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cb = graft.ann.Pq.trainCodebooks(emb, "vec_id", "embedding",
      m = 8, dim = 64, stride = 16, iters = 2)
    val codes = graft.ann.Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    graft.ann.Pq.adcTopK(emb.where(col("vec_id") < 25), codes, cb,
      "vec_id", "embedding", m = 8, dim = 64, k = 10)
  }

  /** PQ rerank sweep — the q151 discipline for the compressed tier:
    * recall@10 against the brute fp32 baseline at serving candidates
    * rerank = 10 (pure ADC) / 30 / 100, aggregated over the query
    * batch (sf0.01: ~3480 -> ~6160 -> ~9000 bp). The table a
    * deployment picks its rerank depth from when it trades 16x code
    * storage + |Q| x rerank fp32 fetches for recall. */
  def q182PqRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 25)
    val cb = graft.ann.Pq.trainCodebooks(emb, "vec_id", "embedding",
      m = 8, dim = 64, stride = 16, iters = 2)
    val codes = graft.ann.Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val brute = graft.ann.Ann.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val scores = graft.ops.CacheScope.persist(
      graft.ann.Pq.adcScores(queries, codes, cb, "vec_id", "embedding", 8, 64))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    // two-level selection at the deepest arm (100): the per-partition
    // bounded heap caps the window's input (TopK) — ranks unchanged
    val ranked = graft.ann.TopK.prunePerPartition(scores,
        "query_id", "fx", "neighbor_id", 100)
      .withColumn("crn", row_number().over(cw))
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec"))
    val cv = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_vec"))
    val arms = Seq(10, 30, 100).map { r =>
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      ranked.where(col("crn") <= r)
        .select(col("query_id"), col("neighbor_id"))
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", round(graft.ann.Ann.dot(col("q_vec"), col("c_vec")), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select(lit(r.toLong).as("rerank"), col("query_id"), col("neighbor_id"))
    }
    val served = arms.reduce(_ unionByName _)
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(lit(10L), lit(30L), lit(100L))).as("rerank"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("rerank", "query_id", "neighbor_id"), "left")
      .groupBy(col("rerank")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** WebP ALPH alpha-plane decode through the gate — the transparency
    * signal beside q174's luma: VP8X(alpha) + ALPH + VP8 files, the
    * plane stored raw OR as the container's HEADERLESS VP8L
    * green-channel bitstream, under all four prediction filters
    * (none/horizontal/vertical/gradient) — both storage axes
    * alpha-invisible, so the oracle replays the planted closed-form
    * plane's sum and opaque count directly. A dropped ALPH chunk and
    * a set reserved header bit refuse with their own tags. */
  def q187WebpAlpha(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Webp.webpAlphaCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Webp.decodeAlphaStats(media).toDF()
  }

  /** IVF-PQ through the gate — the FAISS IndexIVFPQ serving shape
    * (Jégou et al. 2011 §IV), composing q38's trained IVF cells with
    * q181's fixed-point PQ Lloyd over the RESIDUALS (vec − cell
    * centroid): the corpus stores cell id + 8 residual code bytes;
    * the 25-query batch probes its 4 best cells and ranks ONLY those
    * cells' codes by fx = floor(q·c × 2^24) + Σ floor(q_s·cvec ×
    * 2^24) — exact integers, candidates bounded by construction. The
    * oracle replays cell training, residual codebooks, encoding, the
    * probe list, and the two-term ADC end-to-end. */
  def q188IvfPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cents = trainedCentroids(spark, dir)
    val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
      cents, m = 8, dim = 64, stride = 16, iters = 2)
    val codes = graft.ann.IvfPq.encode(emb, "vec_id", "embedding",
      cents, cb, 8, 64)
    graft.ann.IvfPq.probeTopK(emb.where(col("vec_id") < 25), codes, cents,
      cb, "vec_id", "embedding", m = 8, dim = 64, k = 10, nProbe = 4)
  }

  /** IVF-PQ rerank sweep — the q182 recall discipline on the composed
    * index: recall@10 vs the brute fp32 baseline at rerank = 10 (pure
    * probed-cell ADC) / 30 / 100. Recall here is bounded by BOTH
    * approximations (nProbe cell coverage × code quantization) — the
    * table a deployment reads before picking its probe/rerank point. */
  def q189IvfPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 25)
    val cents = trainedCentroids(spark, dir)
    val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
      cents, m = 8, dim = 64, stride = 16, iters = 2)
    val codes = graft.ann.IvfPq.encode(emb, "vec_id", "embedding",
      cents, cb, 8, 64)
    val brute = graft.ann.Ann.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val scores = graft.ops.CacheScope.persist(
      graft.ann.IvfPq.adcProbeScores(queries, codes, cents, cb,
        "vec_id", "embedding", 8, 64, nProbe = 4))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("fx").desc, col("neighbor_id").asc)
    val ranked = graft.ann.TopK.prunePerPartition(scores,
        "query_id", "fx", "neighbor_id", 100)
      .withColumn("crn", row_number().over(cw))
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec"))
    val cv = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_vec"))
    val arms = Seq(10, 30, 100).map { r =>
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      ranked.where(col("crn") <= r)
        .select(col("query_id"), col("neighbor_id"))
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", round(graft.ann.Ann.dot(col("q_vec"), col("c_vec")), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select(lit(r.toLong).as("rerank"), col("query_id"), col("neighbor_id"))
    }
    val served = arms.reduce(_ unionByName _)
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(lit(10L), lit(30L), lit(100L))).as("rerank"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("rerank", "query_id", "neighbor_id"), "left")
      .groupBy(col("rerank")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** Persisted IVF-PQ index lifecycle through the gate — the q117
    * pattern on the compressed vector tier: write the even half,
    * append the odd half under the standing centroids + codebooks,
    * retire + re-append a slice at one seq (the re-embed path), then
    * probe the every-20th query batch over the BUCKETED code files
    * (cells outside the probe set pruned at the file listing). The
    * live set is exactly the full corpus, so the oracle is the
    * closed-form IVF-PQ chain (q188's CTEs at nProbe=3) — any
    * liveness, layout, packing, or pruning defect hash-fails it. */
  def q190IvfPqIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cents = trainedCentroids(spark, dir)
    val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
      cents, m = 8, dim = 64)
    val idx = tmpLifecycleDir("graft-q190")
    graft.ann.IvfPqIndex.write(emb.where(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", cents, cb, 8, 64, idx, numBuckets = 8, seq = 1L)
    graft.ann.IvfPqIndex.append(emb.where(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding", idx, seq = 2L)
    val slice = emb.where(pmod(col("vec_id"), lit(10)) === 3)
    graft.ann.IvfPqIndex.retire(spark, idx, slice.select(col("vec_id")),
      "vec_id", seq = 3L)
    graft.ann.IvfPqIndex.append(slice, "vec_id", "embedding", idx, seq = 3L)
    graft.ann.IvfPqIndex.probeTopK(spark, idx,
      emb.where(pmod(col("vec_id"), lit(20)) === 0),
      "vec_id", "embedding", k = 8, nProbe = 3)
  }

  /** MAIN-content extraction through the gate — boilerplate block
    * removal over pages with every chrome trap planted: a nav bar
    * (link density 100% — dropped by density, its text clears the
    * length floor), a sidebar link farm, a footer that is mostly
    * links, the whole `<head>` (its title text must never leak into
    * body content), and a quoted `>` inside a block-tag attribute
    * (`title="a > b"` — the q128 trap at the SPLIT layer). Content:
    * one paragraph whose keep/drop rides the length floor (the doc's
    * own text — the oracle restates the threshold), and one long
    * paragraph with an inline citation link (low density — kept, link
    * text and all). Expected text closed-form per id. */
  def q207MainContent(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val id = col("doc_id")
    val ids = id.cast("string")
    val k50 = pmod(id, lit(50L)).cast("string")
    val k10 = pmod(id, lit(10L)).cast("string")
    val nav = lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
      " <a href=\"/contact\">Contact</a> <a href=\"/login\">Sign in</a></nav>")
    val aside = lit("<aside class=sidebar><ul>" +
      "<li><a href=\"/r1\">Related article one</a></li>" +
      "<li><a href=\"/r2\">Related article two</a></li>" +
      "<li><a href=\"/r3\">Related article three</a></li></ul></aside>")
    val p1 = concat(lit("<p>Doc "), ids, lit(" "),
      coalesce(col("text"), lit("")), lit("</p>"))
    val openDiv = when(pmod(id, lit(2L)) === 0,
        lit("<div class=\"post\" title=\"a > b\">"))
      .otherwise(lit("<DIV CLASS=\"post\" TITLE=\"a > b\">"))
    val p2 = concat(openDiv, lit("<p>Primary finding "), ids,
      lit(" about topic "), k50,
      lit(" with <a href=\"/ref?x=1\">source "), k10,
      lit("</a> and more context here</p></div>"))
    val footer = lit("<footer><a href=\"/tos\">Terms</a>" +
      " <a href=\"/privacy\">Privacy</a>" +
      " <a href=\"/imprint\">Imprint</a> © 26</footer>")
    val html = concat(
      lit("<!DOCTYPE html><html><head>" +
        "<title>A headline that is quite long indeed</title>" +
        "<style>.x{color:red}</style></head><body>"),
      nav, aside, p1, p2, footer, lit("</body></html>"))
    docs.select(id,
      graft.text.Html.mainContent(html).as("main_text"))
  }

  /** H.264 IDR frames decoded to PIXELS through the gate — the real
    * codec under q196's classification: avcC config (SPS + PPS),
    * sample-table extraction, CAVLC entropy decode, intra prediction,
    * dequant + the exact integer inverse transform, gray-plane pHash.
    * The corpus carries the q140 pixel law in REAL conformant
    * intra-only AVC (the fixture encoder REQUIREs recon == target per
    * block), so the oracle is q140's closed-form DCT replay VERBATIM —
    * the whole codec chain must land on exactly the hashes the law
    * predicts. id%6==4 clips carry a corrupted frame-1 NAL
    * (frame_decode — the per-frame error path). */
  def q208AvcFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.H264Decode.avcClipCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.H264Decode.decodeAvcFramePHash(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("ok"), col("phash"),
        col("err"))
  }

  /** CROSS-CODEC clip dedup through the gate — the claim that closes
    * r14's "H.264 cannot be fingerprinted" gap: the SAME clip muxed as
    * MJPEG-in-MP4 and re-encoded as intra-only H.264 must pair in the
    * banded frame dedup (both decode to the same pixel planes, so the
    * hashes are identical by construction — the strongest form of the
    * q170 cross-wrapper claim: not adjacent hashes, EQUAL hashes
    * through two entirely different codec paths). Same packing and
    * thresholds as q170. */
  def q209CrossCodecClipDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
      .where(pmod(col("doc_id"), lit(5)) === 0)
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0)
    if (!maxDoc.isNullAt(0))
      require(maxDoc.getLong(0) < (1L << 20),
        s"q209 clip-id offset: max doc_id ${maxDoc.getLong(0)} >= 2^20 " +
          "would alias the MJPEG/AVC id spaces")
    val mjpeg = graft.multimodal.Multimodal.decodeMp4FramePHash(
        graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(docs)).toDF()
      .where(col("ok") === 1)
      .select(col("media_id"), col("frame_idx"), col("phash"))
    val avc = graft.multimodal.H264Decode.decodeAvcFramePHash(
        graft.multimodal.H264Decode.avcClipCorpusFromDocuments(docs)).toDF()
      .where(col("ok") === 1)
      .select((col("media_id") + lit(1L << 20)).as("media_id"),
        col("frame_idx"), col("phash"))
    val frames = graft.ops.CacheScope.persist(mjpeg.unionByName(avc))
    val r = frames.agg(max(col("frame_idx")).cast("long"),
      min(col("media_id")), max(col("media_id"))).collect()(0)
    val maxIdx = if (r.isNullAt(0)) 0L else r.getLong(0)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxIdx, 1L))
    if (!r.isNullAt(1))
      require(r.getLong(1) >= 0L && r.getLong(2) < (1L << (62 - shift)),
        s"q209 fid packing: media ids [${r.getLong(1)}, ${r.getLong(2)}] " +
          s"do not fit ${62 - shift} bits next to a $shift-bit frame index")
    val packed = frames.select(
      (col("media_id") * lit(1L << shift) + col("frame_idx")).as("fid"),
      col("phash"))
    graft.dedup.Dedup.hammingNearDupPairs(packed, "fid", "phash",
        totalBits = 64, maxDist = 3, bands = 4)
      .select(shiftright(col("id_a"), shift).as("clip_a"),
        shiftright(col("id_b"), shift).as("clip_b"))
      .where(col("clip_a") < col("clip_b"))
      .groupBy(col("clip_a"), col("clip_b"))
      .agg(count(lit(1)).as("n_frames"))
      .where(col("n_frames") >= 2)
  }

  /** The nProbe × rerank DEPLOYMENT TABLE — the two serving-cost
    * knobs swept together at the widest codebook (k=256). q195 showed
    * width barely moves recall; the first cut of this table showed
    * rerank alone doesn't either (flat at nProbe 4 — the probed-cell
    * pool is already exhausted at rerank 30). The 2D grid shows WHERE
    * recall actually comes from: cell coverage (nProbe — scan cost)
    * vs exact-rescore budget (rerank — fetch cost). One codebook
    * family and one encode; per-nProbe ADC score passes are shared
    * across their rerank cuts via CacheScope. */
  def q206PqRerankSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 25)
    val cents = trainedCentroids(spark, dir)
    val brute = graft.ann.Ann.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
      cents, m = 8, dim = 64, stride = 1, k = 256)
    val codes = graft.ops.CacheScope.persist(
      graft.ann.IvfPq.encode(emb, "vec_id", "embedding", cents, cb, 8, 64))
    val arms = for {
      np <- Seq(2, 4, 8)
      scores = graft.ops.CacheScope.persist(
        graft.ann.IvfPq.adcProbeScores(queries, codes, cents, cb,
          "vec_id", "embedding", 8, 64, nProbe = np))
      rr <- Seq(30, 300)
    } yield graft.ann.IvfPq.rerankTopK(scores, queries, emb,
        "vec_id", "embedding", k = 10, rerank = rr)
      .select(lit(np.toLong).as("n_probe"), lit(rr.toLong).as("rerank"),
        col("query_id"), col("neighbor_id"))
    val served = arms.reduce(_ unionByName _)
    val grid = Seq(2, 4, 8).flatMap(np => Seq(30, 300).map(rr =>
      struct(lit(np.toLong), lit(rr.toLong))))
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(grid: _*)).as("g"))
      .select(col("query_id"), col("neighbor_id"),
        col("g.col1").as("n_probe"), col("g.col2").as("rerank"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("n_probe", "rerank", "query_id", "neighbor_id"), "left")
      .groupBy(col("n_probe"), col("rerank")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** The Hadamard rotation ON the persisted serving path — q201
    * proved the recall uplift in-memory; this is the production form:
    * an IVF-PQ index written with `rotated = true` (centroids +
    * residual codebooks trained on the rotated view, flag in meta),
    * fed and probed with ORIGINAL-space vectors through the full
    * lifecycle (write evens / append odds / probe every-20th) — the
    * index rotates internally at every step. The oracle replays the
    * q190 chain wholesale over the exactly-replayable ±1/8 rotated
    * frame: parity here proves the persisted rotated tier equals the
    * from-scratch rotated-space computation. */
  def q205RotatedIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val rot = graft.ops.CacheScope.persist(
      graft.ann.IvfPqIndex.rotatedView(emb, "embedding", 64))
    val cents = graft.ann.Ann.ivfTrainCentroids(rot, "vec_id", "embedding",
      stride = 16, iters = 2)
    val cb = graft.ann.IvfPq.trainCodebooks(rot, "vec_id", "embedding",
      cents, m = 8, dim = 64)
    val idx = tmpLifecycleDir("graft-q205")
    graft.ann.IvfPqIndex.write(emb.where(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", cents, cb, 8, 64, idx, numBuckets = 8,
      seq = 1L, rotated = true)
    graft.ann.IvfPqIndex.append(emb.where(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding", idx, seq = 2L)
    graft.ann.IvfPqIndex.probeTopK(spark, idx,
      emb.where(pmod(col("vec_id"), lit(20)) === 0),
      "vec_id", "embedding", k = 8, nProbe = 3)
  }

  /** HTML structural metadata through the gate — the crawl-pipeline
    * keys q128's text extractor throws away: <title> (entities +
    * whitespace), meta description (the four order × quote shapes
    * fanned per id, og:/keywords/near-miss-name traps planted in
    * EVERY page), the canonical link normalized through
    * Urls.normalizeUrl (uppercase scheme/host, :80, duplicate path
    * slashes, fragment — the q129 rules), and the html lang attribute
    * (quoted, CAPS, and unquoted forms). The oracle states every
    * expected value closed-form from id arithmetic — cross-derived,
    * not a regex replay. */
  def q191HtmlMetadata(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val id = col("doc_id")
    val ids = id.cast("string")
    val k7 = pmod(id, lit(7L)).cast("string")
    val langTag = when(pmod(id, lit(11L)) === 5, lit("<html>"))
      .when(pmod(id, lit(3L)) === 0, lit("<html lang=\"en\">"))
      .when(pmod(id, lit(3L)) === 1, lit("<HTML LANG='de-DE'>"))
      .otherwise(lit("<html data-x=\"1\" lang=fr>"))
    val titleTag = when(pmod(id, lit(7L)) === 3, lit(""))
      .otherwise(concat(lit("<title> Doc &amp; "), ids,
        lit("\n overview </title>")))
    val descTag = when(pmod(id, lit(5L)) === 2, lit(""))
      .when(pmod(id, lit(4L)) === 0,
        concat(lit("<meta name=\"description\" content=\"Summary &quot;"),
          ids, lit("&quot; here\">")))
      .when(pmod(id, lit(4L)) === 1,
        concat(lit("<meta name='description' content='Summary \""),
          ids, lit("\" here'>")))
      .when(pmod(id, lit(4L)) === 2,
        concat(lit("<META content=\"Summary &quot;"), ids,
          lit("&quot; here\" name=\"description\">")))
      .otherwise(
        concat(lit("<meta content='Summary \""), ids,
          lit("\" here' name=description>")))
    val canonTag = when(pmod(id, lit(6L)) === 4, lit(""))
      .when(pmod(id, lit(2L)) === 0,
        concat(lit("<link rel=\"canonical\" href=\"HTTP://EXAMPLE"), k7,
          lit(".COM:80//a//b/"), ids, lit("?x=1#frag\">")))
      .otherwise(
        concat(lit("<link href='HTTP://EXAMPLE"), k7,
          lit(".COM:80//a//b/"), ids, lit("?x=1#frag' rel='canonical'>")))
    val html = concat(lit("<!DOCTYPE html>"), langTag, lit("<head>"),
      titleTag,
      lit("<meta property=\"og:title\" content=\"NOT ME\">"),
      descTag,
      lit("<meta name=\"descriptions\" content=\"TRAP\">" +
        "<meta property=\"og:description\" content=\"OG NOT ME\">" +
        "<meta name=\"keywords\" content=\"k1,k2\">"),
      canonTag,
      lit("<link rel=\"stylesheet\" href=\"/style.css\"></head>" +
        "<body><p>body text</p></body></html>"))
    docs.select(id.as("doc_id"),
      graft.text.Html.title(html).as("title"),
      graft.text.Html.metaDescription(html).as("meta_desc"),
      graft.text.Urls.normalizeUrl(
        graft.text.Html.canonicalLink(html)).as("canonical"),
      graft.text.Html.htmlLang(html).as("lang"))
  }

  /** IVF-PQ nProbe sweep — the OTHER axis of the q189 tuning table
    * (q151's discipline on the composed index): recall@10 vs brute at
    * nProbe = 2 / 4 / 8 with the rerank depth fixed (30). Together
    * with q189 this is the 2D (probe coverage × rerank) surface a
    * deployment reads before picking its serving point; the candidate
    * set stays bounded by construction in every arm. */
  def q193IvfPqNprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 25)
    val cents = trainedCentroids(spark, dir)
    val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
      cents, m = 8, dim = 64)
    val codes = graft.ops.CacheScope.persist(
      graft.ann.IvfPq.encode(emb, "vec_id", "embedding", cents, cb, 8, 64))
    val brute = graft.ann.Ann.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val arms = Seq(2, 4, 8).map { np =>
      graft.ann.IvfPq.probeRerankTopK(queries, codes, cents, cb, emb,
          "vec_id", "embedding", 8, 64, k = 10, nProbe = np, rerank = 30)
        .select(lit(np.toLong).as("nprobe"), col("query_id"),
          col("neighbor_id"))
    }
    val served = arms.reduce(_ unionByName _)
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(lit(2L), lit(4L), lit(8L))).as("nprobe"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("nprobe", "query_id", "neighbor_id"), "left")
      .groupBy(col("nprobe")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** PQ codebook-width sweep — the THIRD axis of the IVF-PQ tuning
    * surface beside q189 (rerank) and q193 (nProbe): recall@10 vs
    * brute at k = 64 / 128 / 256 codes per subspace, nProbe and
    * rerank fixed (4 / 30). Wider codebooks shrink quantization error
    * at the cost of k×m table entries per query — the axis a
    * deployment reads when its recall is codebook-limited rather than
    * probe-limited (k=32 caps this corpus near the half-recall line).
    * Seeds stay stride-spread so every width trains on a spread of
    * the corpus, not a prefix cluster. */
  def q195PqWidthSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 25)
    val cents = trainedCentroids(spark, dir)
    val brute = graft.ann.Ann.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val arms = buildArms(Seq((64, 7), (128, 3), (256, 1)).map {
      case (kk, stride) => () => {
        val cb = graft.ann.IvfPq.trainCodebooks(emb, "vec_id", "embedding",
          cents, m = 8, dim = 64, stride = stride, k = kk)
        val codes = graft.ops.CacheScope.persist(
          graft.ann.IvfPq.encode(emb, "vec_id", "embedding", cents, cb, 8, 64))
        graft.ann.IvfPq.probeRerankTopK(queries, codes, cents, cb, emb,
            "vec_id", "embedding", 8, 64, k = 10, nProbe = 4, rerank = 30)
          .select(lit(kk.toLong).as("cb_k"), col("query_id"),
            col("neighbor_id"))
      }
    })
    val served = arms.reduce(_ unionByName _)
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(lit(64L), lit(128L), lit(256L))).as("cb_k"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("cb_k", "query_id", "neighbor_id"), "left")
      .groupBy(col("cb_k")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** H.264 codec-configuration classification through the gate — the
    * codec level UNDER the container metadata (q81 tkhd dims, q137
    * sample tables): stsd sample-entry dispatch, and for AVC the avcC
    * record's profile/level plus the SPS exp-Golomb walk to the
    * bitstream's OWN coded dimensions (mb grid minus frame cropping —
    * the 1920×1080 arm is 68 mb rows with 4 crop-bottom units).
    * Baseline and High (explicit chroma branch) parse; hvc1/vp09
    * classify by entry type; truncated avcC and scaling-matrix SPS
    * refuse tagged. All fields closed-form from id arithmetic. */
  def q196H264Sps(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.H264.mp4AvcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.H264.decodeMp4Codec(media).toDF()
  }

  /** Audio fingerprinting through the gate — the AUDIO member of the
    * perceptual-dedup family (images: q133 pHash; video: q170 clip
    * frames): decoded PCM -> 17 frames x 4 DFT-bin powers (frozen
    * integer trig, the PhashDct discipline) -> the chromaprint bit
    * rule -> one 64-bit fingerprint; payloads short of 17 frames
    * refuse ok=0. The oracle replays sample law, spectrum, bit rule,
    * and packing end-to-end with the SAME trig literals. */
  def q197AudioFp(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.AudioFp.wavFpCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.AudioFp.decodeAudioFp(media).toDF()
  }

  /** Audio near-dup pairs through the gate — the q133 rule on sound:
    * dup groups share a signal (key = id%97) under per-doc DC level
    * shifts (the "re-mastered copy" an exact hash misses), and the
    * banded hamming join folds them at equi-join scale (8 bands of 8
    * bits; recall is EXACT at maxDist 3 by pigeonhole, so the brute
    * oracle == the banded plan). */
  def q198AudioDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.AudioFp.wavFpCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val fps = graft.multimodal.AudioFp.decodeAudioFp(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(fps, "media_id", "fp",
      totalBits = 64, maxDist = 3, bands = 8)
  }

  /** Hadamard-rotated PQ vs plain PQ — the OPQ-lite preprocessing
    * measured (q151's discipline): a normalized Sylvester-Hadamard
    * rotation (entries ±1/8 — EXACT in binary floating point, so the
    * whole rotated chain replays in DuckDB) spreads per-dimension
    * variance across the m subspaces before codebook training; both
    * arms run the identical PQ pipeline (stride-16 seeds, k=32, 2
    * rounds, ADC propose 30, exact rescore, top-10) against the raw
    * brute baseline. The output is the decision table: does rotation
    * buy recall on THIS corpus at the same serving cost? */
  def q201HadamardPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    // the chain's kernels (Ann.dot, subVectors) speak array<float>;
    // the float round-trip is IEEE-exact to replay (::FLOAT in DuckDB)
    val rot = graft.ops.CacheScope.persist(
      emb.select(col("vec_id"),
        graft.ann.Rotation.hadamard(col("embedding"), 64)
          .cast("array<float>").as("embedding")))
    def arm(frame: DataFrame, name: String): DataFrame = {
      val queries = frame.where(col("vec_id") < 25)
      val cb = graft.ann.Pq.trainCodebooks(frame, "vec_id", "embedding",
        m = 8, dim = 64, stride = 16, iters = 2)
      val codes = graft.ann.Pq.encode(frame, "vec_id", "embedding", 8, 64, cb)
      graft.ann.Pq.adcRerankTopK(queries, codes, cb, frame,
          "vec_id", "embedding", 8, 64, k = 10, rerank = 30)
        .select(lit(name).as("arm"), col("query_id"), col("neighbor_id"))
    }
    val built = buildArms(Seq(
      () => arm(emb, "plain"), () => arm(rot, "hadamard")))
    val served = built(0).unionByName(built(1))
    val brute = graft.ann.Ann.bruteForceTopK(emb.where(col("vec_id") < 25),
        emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    brute.select(col("query_id"), col("neighbor_id"),
        explode(array(lit("plain"), lit("hadamard"))).as("arm"))
      .join(served.withColumn("hit", lit(1L)),
        Seq("arm", "query_id", "neighbor_id"), "left")
      .groupBy(col("arm")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** The crawl-ingest ENCODING AUDIT — the rollup a 100 TB operator
    * actually reads over q194's decode output: records and decoded
    * text volume per (declared coding chain, refusal tag), one
    * hash-aggregated groupBy over the per-record walk (map-side
    * combine; no second pass over payload bytes). "How much of this
    * crawl is chunked? how much brotli are we refusing?" reads
    * straight off the table. */
  def q202HttpAudit(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.httpWarcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeWarc(media).toDF()
      .where(col("warc_type") === "response")
      .groupBy(col("payload_enc"), col("payload_err"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("body")).cast("long")).as("decoded_chars"))
  }

  /** Charset-aware byte→text decoding through the gate — the layer a
    * real crawl needs BETWEEN content-coding inflation (q194) and text
    * extraction: BOM > Content-Type charset parameter > `<meta
    * charset>` sniff (first 1024 bytes, text/html only) > UTF-8, with
    * WHATWG label folding (latin1 → windows-1252, BOM-less utf-16 →
    * LE) and a LOUD `unsupported_charset` refusal for labels without
    * a decoder (the raw label kept for the audit). Every arm's
    * recovered TEXT is closed-form — a Shift-JIS or cp1252 page comes
    * back as the exact codepoints, not mojibake — including the
    * charset-under-gzip composition and both BOM-strip arms. */
  def q203CharsetDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.charsetWarcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeWarc(media).toDF()
      .select(col("media_id"), col("ok"), col("body"),
        col("payload_enc"), col("payload_err"), col("charset"))
  }

  /** The crawl CHARSET AUDIT — q202's rollup one layer up: records
    * and recovered text volume per (charset the body decoded under,
    * refusal tag), one hash-aggregated groupBy over the per-record
    * walk. "What share of this crawl is cp1252? which undeclared
    * charsets are we refusing?" reads straight off the table — the
    * drift signal a 100 TB ingest operator actually watches. */
  def q204CharsetAudit(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.charsetWarcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeWarc(media).toDF()
      .where(col("warc_type") === "response")
      .groupBy(col("charset"), col("payload_err"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("body")).cast("long")).as("decoded_chars"))
  }

  /** Audio fingerprints through the PERSISTED index family — proof the
    * standing near-dup machinery is hash-generic: the SAME
    * [[graft.dedup.PhashDiskIndex]] (banded layout, bucket files,
    * tombstones) that serves images (q160) and video frames (clip
    * family) serves the q197 audio fingerprints unchanged — write 2/5
    * of the corpus, append 2/5, probe the remaining fifth paying only
    * its own (band, bucket) footprint. At 100 TB the daily audio delta
    * probes a standing index instead of re-banding the corpus. */
  def q200AudioFpIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.AudioFp.wavFpCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val fps = graft.ops.CacheScope.persist(
      graft.multimodal.AudioFp.decodeAudioFp(media).toDF()
        .where(col("ok") === 1)
        .select(col("media_id").as("id"), col("fp")))
    val idx = tmpLifecycleDir("graft-q200")
    val standing = fps.where(pmod(col("id"), lit(5)) =!= 0)
    graft.dedup.PhashDiskIndex.write(
      standing.where(pmod(col("id"), lit(2)) === 0), "id", "fp", idx,
      totalBits = 64, bands = 8, numBuckets = 2, seq = 1L)
    graft.dedup.PhashDiskIndex.append(
      standing.where(pmod(col("id"), lit(2)) === 1), "id", "fp", idx,
      seq = 2L)
    graft.dedup.PhashDiskIndex.probe(spark, idx,
      fps.where(pmod(col("id"), lit(5)) === 0), "id", "fp", maxDist = 3)
  }

  /** The crawl-ingest COMPOSITION through the gate — every round-14
    * ingest piece in one end-to-end chain: WARC record walk -> HTTP
    * payload decode (identity / chunked / gzip arms) -> canonical
    * identity with the cross-site and hidden-region guards (same-host
    * case/port variants fold, a poison canonical and a commented-out
    * canonical are ignored, root-relative resolves per-site) ->
    * htmlToText. url_norm / source / text all closed-form; the hash
    * key is derived FROM url_norm so the string is the checked
    * identity (q192's convention). */
  def q199CrawlIngest(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.crawlWarcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.warcDocs(media)
      .select(col("url_norm"), col("source"), col("text"))
  }

  /** Canonical-URL dedup through the gate — the crawl-frontier rule
    * the q191 extraction feeds: the SAME page crawled under three RAW
    * href variants (uppercase scheme/host + default port + fragment /
    * duplicate path slashes / mixed-case host + a different fragment)
    * must collapse onto ONE normalized canonical key, and within a key
    * group the smallest doc_id wins (first-wins, the crawl-day rule).
    * Pages without a canonical link (id%6==4) are never dups. Group
    * membership is id mod 175 arithmetic (id%7 picks the site, id%25
    * the page), so the oracle restates keeper and dup flags
    * closed-form — the normalization IS the dedup key, cross-derived. */
  /** WARC HTTP payload decoding through the gate — the layer between
    * the record walk (q131) and text extraction (q128) that RAW
    * captures need: Transfer-Encoding dechunking and gzip / deflate
    * (zlib AND raw) / zstd content-coding inflation, with tagged
    * refusals for chunk-framing violations (bad_chunked), undecodable
    * streams (bad_payload), and codings without a decoder — br —
    * (unsupported_encoding; silently passing compressed bytes through
    * as UTF-8 would feed mojibake into canonical extraction, dedup
    * signatures, and tokenizer counts). Every arm is content-invisible
    * (decoded body == doc text), so the oracle states bodies and tags
    * closed-form from id arithmetic. */
  def q194HttpPayloads(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.httpWarcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeWarc(media).toDF()
      .select(col("media_id"), col("rec_index"), col("ok"),
        col("warc_type"), col("url"), col("http_status"), col("body"),
        col("payload_enc"), col("payload_err"))
  }

  def q192CanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val id = col("doc_id")
    val site = pmod(id, lit(7L)).cast("string")
    val page = pmod(id, lit(25L)).cast("string")
    val href = when(pmod(id, lit(3L)) === 0,
        concat(lit("HTTP://EXAMPLE"), site, lit(".COM:80/p/"), page,
          lit("?x=1#f")))
      .when(pmod(id, lit(3L)) === 1,
        concat(lit("http://example"), site, lit(".com/p//"), page,
          lit("?x=1")))
      .otherwise(
        concat(lit("http://Example"), site, lit(".Com/p/"), page,
          lit("?x=1#frag2")))
    val html = concat(lit("<html><head>"),
      when(pmod(id, lit(6L)) === 4, lit(""))
        .otherwise(concat(lit("<link rel=\"canonical\" href=\""), href,
          lit("\">"))),
      lit("<link rel=\"stylesheet\" href=\"/s.css\"></head><body/></html>"))
    val canon = graft.text.Urls.normalizeUrl(
      graft.text.Html.canonicalLink(html))
    // scale shape: hash-aggregate the per-key min (map-side combine)
    // and equi-join it back — a window over PARTITION BY canonical
    // would buffer a hot key's whole group in one task, and a viral
    // page's canonical IS a hot key at crawl scale (AQE skew-splits
    // the join; an agg can't skew)
    val keys = docs.select(id.as("doc_id"), canon.as("canonical"))
    val mins = keys.where(col("canonical") =!= "")
      .groupBy(col("canonical")).agg(min(col("doc_id")).as("grp_min"))
    keys.join(mins, Seq("canonical"), "left")
      .select(col("doc_id"), col("canonical"),
        when(col("canonical") === "", col("doc_id"))
          .otherwise(col("grp_min")).as("keeper_id"),
        when(col("canonical") =!= "" && col("doc_id") =!= col("grp_min"), 1L)
          .otherwise(0L).as("is_dup"))
  }

  /** AVIF/HEIF classification through the gate — the q77/q156 pattern
    * on the fast-growing crawl image format: ftyp brand dispatch, the
    * meta→iprp→ipco property walk, dimensions from the first ispe,
    * the auxiliary-alpha second ispe counted, the codec config box
    * (av1C/hvcC) identified, tiles opaque. Every field and refusal
    * closed-form from id arithmetic. */
  def q186AvifHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Avif.avifCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Avif.decodeAvifInfo(media).toDF()
  }

  /** Bigram-LM out-of-domain scoring through the gate — the
    * CCNet/Wikipedia-LM quality filter (Wenzek et al. 2020): the even
    * doc_ids train an add-one-smoothed bigram model, EVERY doc scores
    * its adjacent-pair NLL under it in floored milli-nats (the q51
    * log convention), out-of-vocabulary pairs naturally landing at
    * ln(V). High avg NLL = unlike the reference domain — the number
    * CCNet buckets corpora by. The oracle replays counts, smoothing,
    * and the per-pair floor end-to-end. */
  def q185BigramNll(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusStats.bigramNll(tbl(spark, dir, "documents"),
        "doc_id", "text", pmod(col("doc_id"), lit(2)) === 0)
      .withColumnRenamed("id", "doc_id")

  /** robots.txt evaluation through the gate (RFC 9309) — the
    * crawl-frontier politeness decision: two planted rule files (a
    * wildcard-group file with prefix rules, an Allow override, and a
    * `*`-wildcard `$`-anchored pattern; and a two-group file whose
    * specific `graftbot` group overrides the deny-all `*` group), two
    * crawler agents, six paths — every (file, agent, path) decision
    * restated closed-form. The RFC semantics themselves (longest
    * pattern wins, Allow wins ties, longest agent token, empty
    * Disallow no-op) are pinned by RobotsSpec hand vectors. */
  def q184Robots(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val robotsA = "# graft crawl rules\nUser-agent: *\n" +
      "Disallow: /private/\nAllow: /private/open\nDisallow: /*.pdf$\n" +
      "Crawl-delay: 2\n"
    val robotsB = "User-agent: graftbot\nDisallow: /graft/\nAllow: /\n\n" +
      "User-agent: *\nDisallow: /\n"
    val corpus = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 2, lit(robotsB))
        .otherwise(lit(robotsA)).as("robots"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("GraftBot/1.0"))
        .otherwise(lit("OtherBot/2.0")).as("agent"),
      element_at(array(lit("/"), lit("/private/x"), lit("/private/open"),
        lit("/docs/a.pdf"), lit("/graft/secret"), lit("/public/page.html")),
        (pmod(col("doc_id"), lit(6)) + 1).cast("int")).as("path"))
    graft.text.Robots.decisions(corpus, "doc_id", "robots", "agent", "path")
  }

  /** Bare-TIFF classification through the gate — the q77/q156 pattern
    * on the scanned-document format: header byte order, the multi-page
    * next-IFD chain, IFD0's image tags (width/length/bits/compression/
    * photometric/samples — bits through the SHORT-array value-offset
    * indirection on 3-sample pages), strips counted opaque, and the
    * tagged refusals (not_tiff / truncated mid-table / a self-looping
    * IFD chain caught by the cycle guard). `parseImageHeader` sniffs
    * TIFF after PNG/JPEG/WebP/GIF. */
  def q183TiffHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Tiff.tiffCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Tiff.decodeTiffInfo(media).toDF()
  }

  /** Ogg comment tags through the gate — q173's ID3 treatment for the
    * Ogg audio family: the SECOND packet of the logical stream
    * (reassembled across pages by the lacing rule, including a
    * spanning arm whose comment header crosses a continuing all-255
    * page) parses as VorbisComment (0x03"vorbis") or OpusTags,
    * case-insensitive field names, first occurrence wins, unknown
    * keys counted not extracted, the Vorbis framing bit enforced.
    * Refusals: the container families plus no_tags (broken comment
    * magic) and bad_tags (a comment length past the packet). */
  def q180OggTags(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Ogg.oggTagsCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Ogg.decodeOggTags(media).toDF()
  }

  /** Gopher REPETITION rules through the gate (Rae et al. 2021, Table
    * A1 — the other half of q135's document rules): each doc becomes
    * a synthesized page planting every repetition family — a
    * duplicated line (id%3==0), a 2-gram/n-gram stutter block
    * (id%4==1, 'spam ham' x30), a duplicated paragraph (id%5==2) —
    * beside the doc's own text, and the engine measures duplicate
    * line/paragraph occurrence + character fractions, top 2/3/4-gram
    * character fractions (modal count, ties to the longest gram), and
    * duplicate 5..10-gram POSITION-COVERAGE character fractions, all
    * floored bp, with the paper's conjunctive keep. The oracle
    * replays generation AND every measure (the q136 discipline). */
  def q177GopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val page = concat(
      coalesce(col("text"), lit("")), lit("\n"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(coalesce(col("text"), lit("")), lit("\n"))).otherwise(lit("")),
      lit("unique "), col("doc_id").cast("string"), lit(" tail words here\n"),
      when(pmod(col("doc_id"), lit(4)) === 1, lit(("spam ham " * 30).trim))
        .otherwise(lit("calm close")),
      lit("\n\n"),
      when(pmod(col("doc_id"), lit(5)) === 2,
        lit("para block one\n\npara block one"))
        .otherwise(concat(lit("para "), col("doc_id").cast("string"))))
    graft.text.QualityRules.gopherRepetition(
        docs.select(col("doc_id"), page.as("page")), "doc_id", "page")
      .select(col("doc_id"), col("dup_line_bp"), col("dup_line_char_bp"),
        col("dup_para_bp"), col("dup_para_char_bp"),
        col("top2_gram_bp"), col("top3_gram_bp"), col("top4_gram_bp"),
        col("dup5_gram_bp"), col("dup6_gram_bp"), col("dup7_gram_bp"),
        col("dup8_gram_bp"), col("dup9_gram_bp"), col("dup10_gram_bp"),
        col("keep"))
  }

  /** Cross-CONTAINER clip near-dup through the gate — the q133
    * cross-codec discipline applied to video: the same clips arrive
    * once as MP4 (MJPEG samples, q140), once as animated WebP
    * (VP8L frames, q169), and once as GIF (LZW frames, q175), and the
    * q141 machinery finds clip pairs ACROSS the container boundary —
    * a re-encoded video cannot hide from dedup behind its wrapper.
    * WebP clip ids ride at doc_id + 2^20 and GIF at doc_id + 2^21
    * (a loud require guards doc_id < 2^20 so containers cannot
    * alias, and the fid packing's require guards the width); all
    * corpora take the doc_id%7==0 seventh so the identical-frame
    * cluster blowup stays gate-sized (the pair machinery is q141's,
    * already stressed at full width there). */
  def q170CrossClipDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
      .where(pmod(col("doc_id"), lit(7)) === 0)
    // the container offsets require doc_id < 2^20, or MP4/WebP/GIF
    // clip ids alias silently (the fid-width require below only
    // guards packing, not this collision)
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0)
    if (!maxDoc.isNullAt(0))
      require(maxDoc.getLong(0) < (1L << 20),
        s"q170 clip-id offset: max doc_id ${maxDoc.getLong(0)} >= 2^20 " +
          "would alias the MP4/WebP/GIF id spaces")
    val mp4 = graft.multimodal.Multimodal.decodeMp4FramePHash(
        graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(docs)).toDF()
      .where(col("ok") === 1)
      .select(col("media_id"), col("frame_idx"), col("phash"))
    val webp = graft.multimodal.Webp.decodeAnimPHash(
        graft.multimodal.Webp.animWebpCorpusFromDocuments(docs)).toDF()
      .where(col("ok") === 1)
      .select((col("media_id") + lit(1L << 20)).as("media_id"),
        col("frame_idx"), col("phash"))
    val gif = graft.multimodal.Gif.decodeGifPHash(
        graft.multimodal.Gif.gifCorpusFromDocuments(docs,
          sampleMod = 1, sampleRem = 0)).toDF()
      .where(col("ok") === 1)
      .select((col("media_id") + lit(1L << 21)).as("media_id"),
        col("frame_idx"), col("phash"))
    val frames = graft.ops.CacheScope.persist(
      mp4.unionByName(webp).unionByName(gif))
    val r = frames.agg(max(col("frame_idx")).cast("long"),
      min(col("media_id")), max(col("media_id"))).collect()(0)
    val maxIdx = if (r.isNullAt(0)) 0L else r.getLong(0)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxIdx, 1L))
    if (!r.isNullAt(1))
      require(r.getLong(1) >= 0L && r.getLong(2) < (1L << (62 - shift)),
        s"q170 fid packing: media ids [${r.getLong(1)}, ${r.getLong(2)}] " +
          s"do not fit ${62 - shift} bits next to a $shift-bit frame index")
    val packed = frames.select(
      (col("media_id") * lit(1L << shift) + col("frame_idx")).as("fid"),
      col("phash"))
    graft.dedup.Dedup.hammingNearDupPairs(packed, "fid", "phash",
        totalBits = 64, maxDist = 3, bands = 4)
      .select(shiftright(col("id_a"), shift).as("clip_a"),
        shiftright(col("id_b"), shift).as("clip_b"))
      .where(col("clip_a") < col("clip_b"))
      .groupBy(col("clip_a"), col("clip_b"))
      .agg(count(lit(1)).as("n_frames"))
      .where(col("n_frames") >= 2)
  }

  /** EXIF classification through the gate — the q77/q156 pattern for
    * image METADATA: JPEG APP1 walk, TIFF header (both byte orders),
    * IFD0 entries (Orientation inline-SHORT, DateTime via the ASCII
    * value-offset indirection), the ExifIFD pointer (0x8769) walk to
    * DateTimeOriginal (0x9003) — the tag real photo pipelines key
    * on — and four tagged refusal families (including a sub-IFD
    * pointer past the segment). Every field and every error walk
    * id-planted and restated closed-form. */
  def q171ExifHeaders(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Exif.exifCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Exif.decodeExifInfo(media).toDF()
  }

  /** Orientation-normalized perceptual dedup through the gate — the
    * capability plain pHash lacks: groups of 8 docs share ONE base
    * image, each member storing it under a different EXIF orientation
    * (1-8, both TIFF byte orders). The engine decodes, reads the tag,
    * rotates/flips to display orientation, and hashes; the oracle
    * replays the UPRIGHT base's hash once per group closed-form — so
    * all 8 members must land the identical hash (within-group pairs
    * at distance 0) or the pair set diverges. Storage rotation proven
    * invisible to dedup, the q155/q168 discipline for geometry. */
  def q172OrientedPhash(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Exif.orientedCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.multimodal.Exif.decodeOrientedPHash(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** ID3v2 text-frame extraction through the gate — q171's EXIF
    * treatment for audio metadata: title/artist/album + the version's
    * year frame (TYE v2.2 / TYER v2.3 / TDRC v2.4), v2.2's 6-byte
    * frame headers vs plain-BE (v2.3) vs SYNCSAFE (v2.4) sizes
    * handled per version (the classic cross-version corruption
    * source), ALL the spec's text encodings decoded (latin-1, UTF-16
    * under both BOMs, v2.4's BOM-less UTF-16BE and utf-8), extended
    * headers skipped per version, five tagged refusal families
    * (incl. unsynchronisation flags and a BOM-less encoding-1
    * frame). q156 keeps skipping the tag opaquely — audio structure
    * and metadata stay separate audits. */
  def q173Id3Tags(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Mp3.id3CorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Mp3.decodeId3Tags(media).toDF()
  }

  /** Animated-WebP frame fingerprints through the gate — q140's video
    * audit on the GIF-successor container: the ANMF walk recovers each
    * frame's duration and its VP8L payload, every frame's pixels
    * REALLY decode and pHash (so the q141 clip-dedup machinery runs
    * unchanged on this container), a broken frame surfaces
    * 'frame_decode' with its parsed duration KEPT, and a VP8X without
    * the animation flag refuses at the container level. The corpus
    * carries q140's exact frame pixels (oracle: q140's pHash replay)
    * with the VP8L encoding path fanned per (id + frame) % 5. */
  def q169AnimWebpFrames(spark: SparkSession, dir: String): DataFrame = {
    // the doc_id%3==0 third (q170 takes a doc_id%7==0 seventh under
    // the same sampling discipline): the gate cost is the fixture's
    // 64x64 VP8L ENCODE x frames x docs, not the walk
    val media = graft.multimodal.Webp.animWebpCorpusFromDocuments(
      tbl(spark, dir, "documents").where(pmod(col("doc_id"), lit(3)) === 0))
    graft.multimodal.Webp.decodeAnimPHash(media).toDF()
  }

  /** HTML → text extraction through the gate: each document's text is
    * wrapped in a REAL page skeleton — head with style/script elements
    * (the script body contains a bare `<` that a naive tag strip would
    * desynchronize on), comments, nested tags, and all five standard
    * entities — and the engine's expression-only extractor must
    * recover clean text; the oracle replays generation AND extraction
    * with DuckDB's RE2 regexp_replace, pinning the cross-engine
    * pattern semantics and the script-first/amp-last ordering. */
  def q128HtmlText(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val html = concat(
      lit("<html><head><title>T</title><style>body { margin: 0; }</style>" +
        "<script type=\"text/javascript\">var x = 1 < 2;</script></head>" +
        "<body><!-- generated\n page --><h1>Doc &amp; heading</h1>" +
        "<span alt=don't>apos kept</span>" +
        "<p class=\"main\" title=\"a > b\" data-x='1 > 0'>"),
      coalesce(col("text"), lit("")),
      lit("</p><div><span>&lt;tail&gt; &quot;q&quot; &#39;s&#39;</span>" +
        "</div></body></html>"))
    docs.select(col("doc_id"),
        graft.text.Html.htmlToText(html).as("clean_text"))
      .withColumn("n_tokens",
        size(graft.text.TextFunctions.tokens(col("clean_text"))).cast("long"))
  }

  /** URL normalization + host/domain extraction through the gate — the
    * crawl-frontier step (canonical URL dedup keys, domain mixing,
    * blocklists). Six id-derived URL families cover the normalization
    * space: upper-case scheme/host with default port + duplicate path
    * slashes + fragment; https default port with duplicate PATH
    * slashes and a kept query whose bytes embed "://" and "//" (the
    * collapse must stop at the '?'); a blocklisted domain with a bare
    * trailing "?"; a bare host with a trailing slash; a non-http
    * scheme whose :80 must SURVIVE; a schemeless protocol-relative
    * url that must pass through UNCHANGED. The oracle states the
    * expected canonical strings independently in closed form — not a
    * regex replay — so the normalization semantics are cross-derived,
    * not self-validated. */
  def q129UrlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val id = col("doc_id")
    val k7 = pmod(id, lit(7L)).cast("string")
    val url = when(pmod(id, lit(6L)) === 0,
        concat(lit("HTTP://WWW.Example"), k7, lit(".COM:80//a//b/page"),
          id.cast("string"), lit(".html#frag")))
      .when(pmod(id, lit(6L)) === 1,
        concat(lit("https://Sub.Domain"), k7, lit(".org:443/path//sub?q="),
          id.cast("string"), lit("&next=https://x//y")))
      .when(pmod(id, lit(6L)) === 2,
        concat(lit("https://spam"), pmod(id, lit(3L)).cast("string"),
          lit(".bad.site/x/y?")))
      .when(pmod(id, lit(6L)) === 3,
        concat(lit("http://plain"), k7, lit(".net/")))
      .when(pmod(id, lit(6L)) === 4,
        concat(lit("ftp://Files.Host"), k7, lit(".io:80/data")))
      .otherwise(concat(lit("//cdn"), k7, lit(".net//x#f")))
    docs.select(id,
        graft.text.Urls.normalizeUrl(url).as("url_norm"),
        graft.text.Urls.urlHost(url).as("host"),
        graft.text.Urls.urlDomain(url).as("domain"))
      .withColumn("blocked",
        when(col("domain") === "bad.site", 1L).otherwise(0L))
  }

  /** Gzip text ingestion through the gate — crawl archives store text
    * deflated: payloads are REAL gzip streams (CRC32 + ISIZE trailer)
    * of each doc's text, every third id carries a corrupted deflate
    * body the CRC check must reject (ok=0, empty — the error path is
    * oracle-covered, not just spec-covered). The oracle states the
    * expected text closed-form; compressed size is deflate-dependent
    * and stays a spec-level check. */
  def q130GzipText(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.gzipCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeGzipText(media).toDF()
      .select(col("media_id"), col("ok"), col("text"), col("text_bytes"))
  }

  /** WARC record walk through the gate — the crawl-archive container
    * step in front of q128/q129/q130: each doc synthesizes a REAL
    * 2-record WARC (warcinfo + an HTTP response whose Target-URI
    * derives from the id and whose body is the doc text); every
    * id%4==2 container declares a wrong Content-Length on the
    * response, so the strict-walk error path is oracle-covered (the
    * warcinfo row parses, the response surfaces as an ok=0 tail row).
    * The oracle states record fields closed-form — the
    * generate-parse-replay pattern of q119/q130. */
  def q131WarcRecords(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.warcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeWarc(media).toDF()
      .select(col("media_id"), col("rec_index"), col("ok"),
        col("warc_type"), col("url"), col("http_status"), col("body"))
  }

  /** ustar tar entry walk through the gate — the shard-archive
    * container step (tarred text corpora, model-data drops): each doc
    * synthesizes a REAL 2-entry ustar archive (text under docs/, an
    * id-derived metadata file under meta/, computed checksums, zero-
    * block end marker); every id%5==3 archive carries a corrupted
    * checksum on the second entry (entry 0 parses, entry 1 is the
    * ok=0 tail row — a bad checksum must never walk garbage offsets).
    * Closed-form oracle, q131's pattern. */
  def q132TarEntries(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Containers.tarCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Containers.decodeTar(media).toDF()
      .select(col("media_id"), col("ent_index"), col("ok"),
        col("name"), col("n_bytes"), col("text"))
  }

  /** Image perceptual near-dup through the gate — the content-level
    * image dedup that byte-exact dedup (q20) cannot see, on a
    * MIXED-CODEC corpus: id-derived images (seed-keyed macro
    * patterns + id-unique small noise, so every payload is
    * byte-distinct; every id%9==0 is an outlier from a disjoint seed
    * space and must pair with no calm group) land as 32x32 PNGs on
    * even decades and 64x64 DC-only JPEGs on odd decades, are REALLY
    * decoded by the codec the magic bytes name (decodeImagePHash),
    * pHashed (fixed-point 8x8-DCT, integer-exact), and paired through
    * the 8-band pigeonhole machinery at hamming <= 5. Same-seed pairs
    * land inside the radius ACROSS codecs — the cross-codec dup claim
    * (a picture saved as PNG and as JPEG byte-dedups as two files) is
    * oracle-checked here, not just spec-pinned. The oracle replays
    * both encoders' planes (pixel sums for PNG, 64x block constants
    * for the DC-only JPEGs) -> DCT -> median bits -> brute-force pair
    * join: banded recall is exact at this distance, so banded == brute
    * is part of what the gate pins. */
  def q133PhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** Gopher document-rule audit through the gate (Rae et al. 2021
    * §A1.1): every structural rule measure — word count, mean word
    * length, symbol/bullet/ellipsis/alpha fractions (floored bp/milli
    * — exact integers), stop-word evidence — plus the conjunctive
    * keep, per document. Surfacing each measure (not just the boolean)
    * is the audit shape: a rule tweak's corpus impact reads straight
    * off the columns. */
  def q135GopherRules(spark: SparkSession, dir: String): DataFrame =
    graft.text.QualityRules.gopherRules(tbl(spark, dir, "documents"), "text")
      .select(col("doc_id"), col("n_words"), col("mean_word_len_milli"),
        col("symbol_bp"), col("bullet_bp"), col("ellipsis_bp"),
        col("alpha_bp"), col("n_stop_hits"), col("keep"))

  /** C4 line cleaning through the gate (Raffel et al. 2020 §2.2):
    * each doc becomes a synthesized multi-line page planting every
    * rule path — the doc text with terminal punctuation (kept), a
    * "javascript" line (dropped), a 2-word line (dropped), a kept
    * second line, an unterminated line (dropped), a "lorem ipsum"
    * marker on every 7th id (page drop), a '{' code line on every
    * 11th-mod-3 id (page drop) — and the cleaner rebuilds the page
    * from the surviving lines. Closed-form-by-construction: the
    * oracle replays generation AND cleaning. */
  def q136C4Clean(spark: SparkSession, dir: String): DataFrame = {
    val page = concat(
      coalesce(col("text"), lit("")), lit(".\n"),
      lit("this javascript line is dropped.\n"),
      lit("too short.\n"),
      lit("a second kept line stays here.\n"),
      lit("no terminal punctuation line here\n"),
      when(pmod(col("doc_id"), lit(7L)) === 0, lit("hidden lorem ipsum marker\n"))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11L)) === 3, lit("code { block }\n"))
        .otherwise(lit("")))
    graft.text.QualityRules.c4Clean(
        tbl(spark, dir, "documents").select(col("doc_id"), page.as("page")),
        "page")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("keep"),
        col("clean_text"))
  }

  /** Perceptual image DEDUP through the gate — the action over q133's
    * pairs: connected components (pointer-jumping label propagation)
    * cluster the perceptual dups, cluster id = min member, and the
    * canonical representative keeps — exactly the q43→q86 text-dedup
    * composition applied to the image modality. Every image surfaces
    * (singletons are their own cluster and keep). */
  def q137PhashClusters(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val hashes = graft.ops.CacheScope.persist(
      graft.multimodal.Multimodal.decodeImagePHash(media).toDF()
        .where(col("ok") === 1))
    val pairs = graft.dedup.Dedup.hammingNearDupPairs(hashes, "media_id",
      "phash", totalBits = 64, maxDist = 5, bands = 8)
    val cc = graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
    hashes.select(col("media_id"))
      .join(cc, col("media_id") === col("id"), "left")
      .select(col("media_id"),
        coalesce(col("component"), col("media_id")).as("cluster_id"))
      .withColumn("keep",
        when(col("media_id") === col("cluster_id"), 1L).otherwise(0L))
  }

  /** Flesch-Kincaid readability through the gate — the grade-level
    * signal several published curation stacks filter on, frozen as
    * integer milli arithmetic: syllables = max-1-floored [aeiouy]+
    * groups per word, sentences = max-1-floored [.!?]+ runs,
    * fk_milli = floor(390·W/S) + floor(11800·SY/W) − 15590 (each term
    * floored separately — the frozen convention). Word-less documents
    * carry NULL (nothing to read). */
  def q138Readability(spark: SparkSession, dir: String): DataFrame = {
    val ts = graft.text.TextFunctions.tokens(col("text"))
    tbl(spark, dir, "documents")
      .select(col("doc_id"),
        size(ts).cast("long").as("n_words"),
        graft.text.TextFunctions.sentenceCount(col("text")).as("n_sentences"),
        coalesce(aggregate(
            transform(ts, w => graft.text.TextFunctions.syllableCount(w)),
            lit(0L), (a, x) => a + x), lit(0L)).as("n_syllables"))
      .withColumn("fk_milli", when(col("n_words") > 0,
          floor(lit(390L) * col("n_words") / col("n_sentences")).cast("long") +
            floor(lit(11800L) * col("n_syllables") / col("n_words")).cast("long") -
            lit(15590L))
        .otherwise(lit(null).cast("long")))
  }

  /** Per-source corpus audit rollup through the gate — the dataset
    * report a curation run publishes: for every source, the Gopher
    * keep rate, the C4 page-keep rate, and the mean FK grade (floored
    * bp/milli — exact integers), all computed in ONE scan (the rule
    * recipes are expression-only, so they fuse into a single pass +
    * one aggregation; no joins). The audit shape of q135/q136/q138
    * rolled up to where a mixing decision actually reads it. */
  def q139SourceAudit(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.text.QualityRules.gopherRules(
        tbl(spark, dir, "documents"), "text")
      .withColumnRenamed("keep", "gopher_keep")
    val gc = graft.text.QualityRules.c4Clean(g, "text")
      .withColumnRenamed("keep", "c4_keep")
    val ts = graft.text.TextFunctions.tokens(col("text"))
    val withFk = gc
      .withColumn("n_sentences", graft.text.TextFunctions.sentenceCount(col("text")))
      .withColumn("n_syllables", coalesce(aggregate(
        transform(ts, w => graft.text.TextFunctions.syllableCount(w)),
        lit(0L), (a, x) => a + x), lit(0L)))
      .withColumn("fk_milli", when(col("n_words") > 0,
          floor(lit(390L) * col("n_words") / col("n_sentences")).cast("long") +
            floor(lit(11800L) * col("n_syllables") / col("n_words")).cast("long") -
            lit(15590L))
        .otherwise(lit(null).cast("long")))
    withFk.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      floor(lit(10000L) * sum(col("gopher_keep")) / count(lit(1)))
        .cast("long").as("gopher_keep_bp"),
      floor(lit(10000L) * sum(col("c4_keep")) / count(lit(1)))
        .cast("long").as("c4_keep_bp"),
      floor(sum(col("fk_milli")) /
          sum(when(col("fk_milli").isNotNull, 1L).otherwise(0L)))
        .cast("long").as("mean_fk_milli"))
  }

  /** Video keyframe fingerprints through the gate — the composition
    * that takes q125's sample-table walk to CONTENT: real MJPEG-style
    * MP4s (ftyp + mdat + moov, DC-only JPEG samples, 3 + id%4 frames
    * per clip), frames extracted by the stsz/stsc/stco walk — id%3==1
    * clips mux TWO chunks with filler bytes between them, so the gate
    * proves the stsc chunk map is actually walked (a single-chunk
    * assumption would hash the filler) — decoded by the real JPEG
    * decoder, pHashed per frame. Every id%6==4 clip carries a frame
    * whose SOI bytes are zeroed inside mdat: extraction succeeds
    * (sizes stay true), the DECODE rejects, and the per-frame error
    * path surfaces with its FAMILY (err="frame_decode", distinct from
    * the container-walk families). The oracle replays block pattern ->
    * cell sums -> the frozen DCT literals -> median bits per
    * (clip, frame). */
  def q140VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeMp4FramePHash(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("ok"), col("phash"),
        col("err"))
  }

  /** Clip-level video near-dup through the gate — the aggregation over
    * q140's frame fingerprints: frames pair across clips through the
    * banded Hamming machinery (a composite id = clip << shift | frame
    * rides the 64-bit pair join; decode-failed frames are already
    * excluded), and two clips are near-dups when >= 2 of their frames
    * match at hamming <= 3 — the shared-keyframe criterion. The pack
    * width derives from the ACTUAL max frame index (the q140 corpus
    * carries 3..6 frames per clip — a fixed 2-bit shift would alias
    * frame 4+ onto the next clip id), with a loud require that clip
    * ids fit the remaining bits: a corpus keyed by full-width 64-bit
    * hashes must switch to a struct-keyed pair join, never silently
    * mis-attribute frames. Oracle: the q140 hash replay + a frame-pair
    * join + the same threshold. */
  def q141ClipDups(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.mjpegVideoCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val frames = graft.ops.CacheScope.persist(
      graft.multimodal.Multimodal.decodeMp4FramePHash(media).toDF()
        .where(col("ok") === 1)
        .select(col("media_id"), col("frame_idx"), col("phash")))
    // bounded collect: one aggregate row (max frame index + id range)
    val r = frames.agg(max(col("frame_idx")).cast("long"),
      min(col("media_id")), max(col("media_id"))).collect()(0)
    val maxIdx = if (r.isNullAt(0)) 0L else r.getLong(0)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxIdx, 1L))
    if (!r.isNullAt(1))
      require(r.getLong(1) >= 0L && r.getLong(2) < (1L << (62 - shift)),
        s"q141 fid packing: media ids [${r.getLong(1)}, ${r.getLong(2)}] " +
          s"do not fit ${62 - shift} bits next to a $shift-bit frame index " +
          "— key the pair join by a (clip, frame) struct instead")
    val packed = frames.select(
      (col("media_id") * lit(1L << shift) + col("frame_idx")).as("fid"),
      col("phash"))
    graft.dedup.Dedup.hammingNearDupPairs(packed, "fid", "phash",
        totalBits = 64, maxDist = 3, bands = 4)
      .select(shiftright(col("id_a"), shift).as("clip_a"),
        shiftright(col("id_b"), shift).as("clip_b"))
      .where(col("clip_a") < col("clip_b"))
      .groupBy(col("clip_a"), col("clip_b"))
      .agg(count(lit(1)).as("n_frames"))
      .where(col("n_frames") >= 2)
  }

  /** Leakage-free train/val/test split through the gate — q100's
    * detector turned into the FIX: near-dup clusters (the q43 closure
    * over q21's pairs) define the split KEY, so a whole cluster lands
    * in one split and cross-split near-dup leakage is zero BY
    * CONSTRUCTION (the group-aware split eval hygiene prescribes —
    * hash-splitting doc_ids leaks because near-dups of a test doc
    * land in train; q100 measures exactly that). Singletons key by
    * their own id; the split hash is q71's, applied to the cluster
    * id. */
  def q142GroupSplit(spark: SparkSession, dir: String): DataFrame = {
    val withCluster = graft.ops.CacheScope.persist(
      tbl(spark, dir, "documents").select(col("doc_id"))
        .join(q43DedupClusters(spark, dir)
          .withColumnRenamed("doc_id", "cid"), col("doc_id") === col("cid"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")))
    val clusterSplit = graft.ops.ScaleOps.deterministicSplit(
      withCluster.select(col("cluster_id")).distinct(), "cluster_id",
      Seq("train" -> 9000, "val" -> 500, "test" -> 500))
    withCluster.join(clusterSplit, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("split"))
  }

  /** Dedup-savings report through the gate — the cost/benefit number a
    * dedup rollout is judged by: per source, how many documents and
    * tokens the near-dup pass would REMOVE (non-canonical cluster
    * members — canonical = min id, q43's convention) and the floored-bp
    * token savings. Pure composition of the q43 closure with token
    * counts; every source surfaces even when nothing clusters. */
  def q143DedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents").select(col("doc_id"), col("source"),
      graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val clusters = q43DedupClusters(spark, dir).withColumnRenamed("doc_id", "cid")
    docs.join(clusters, col("doc_id") === col("cid"), "left")
      .withColumn("removed",
        when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), 1L)
          .otherwise(0L))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("removed")).as("n_removed"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("removed") === 1L, col("n_tokens")).otherwise(0L))
          .as("tokens_removed"))
      .withColumn("savings_bp",
        when(col("tokens_total") > 0,
          floor(lit(10000L) * col("tokens_removed") / col("tokens_total")))
          .otherwise(0L).cast("long"))
  }

  /** Per-LANGUAGE curation audit through the gate — the q139 rollup
    * keyed by PREDICTED language (the first thing a multilingual
    * corpus owner asks of a curation report): per predicted lang, doc
    * count, Gopher/C4 keep rates, mean readability, and subword
    * fertility (BPE-ish pretokenizer units per word — the
    * expression-level proxy; the REAL learned-tokenizer fertility per
    * lang is q145). Language is the staged q27 marker argmax (scores
    * materialize once as int attributes — the measured-5x discipline).
    * Everything is a column expression over documents, so the whole
    * report plans to ONE Scan parquet node (PlanHygieneSpec pins it
    * alongside q139): a corpus-wide multilingual audit costs a single
    * aggregation at 100 TB, not a join tree. */
  def q144LangAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions._
    val g = graft.text.QualityRules.gopherRules(
        tbl(spark, dir, "documents"), "text")
      .withColumnRenamed("keep", "gopher_keep")
    val gc = graft.text.QualityRules.c4Clean(g, "text")
      .withColumnRenamed("keep", "c4_keep")
    val staged = gc.withColumn("toks", tokens(col("text")))
    val scored = staged.select(col("*") +: LangMarkers.map { case (l, m) =>
      langScoreFrom(col("toks"), m).as(s"s_$l")
    }: _*)
    val withLang = scored
      .withColumn("predicted_lang", langIdFromScores(
        LangMarkers.map { case (l, _) => l -> col(s"s_$l") }))
      .withColumn("n_sentences", sentenceCount(col("text")))
      .withColumn("n_syllables", coalesce(aggregate(
        transform(col("toks"), w => syllableCount(w)),
        lit(0L), (a, x) => a + x), lit(0L)))
      .withColumn("fk_milli", when(col("n_words") > 0,
          floor(lit(390L) * col("n_words") / col("n_sentences")).cast("long") +
            floor(lit(11800L) * col("n_syllables") / col("n_words")).cast("long") -
            lit(15590L))
        .otherwise(lit(null).cast("long")))
      .withColumn("n_subwords", subwordCount(col("text")).cast("long"))
    withLang.groupBy(col("predicted_lang")).agg(
      count(lit(1)).as("n_docs"),
      floor(lit(10000L) * sum(col("gopher_keep")) / count(lit(1)))
        .cast("long").as("gopher_keep_bp"),
      floor(lit(10000L) * sum(col("c4_keep")) / count(lit(1)))
        .cast("long").as("c4_keep_bp"),
      floor(sum(col("fk_milli")) /
          sum(when(col("fk_milli").isNotNull, 1L).otherwise(0L)))
        .cast("long").as("mean_fk_milli"),
      when(sum(col("n_words")) > 0,
          floor(lit(1000L) * sum(col("n_subwords")) / sum(col("n_words"))))
        .otherwise(lit(null)).cast("long").as("subword_fertility_milli"))
  }

  /** REAL learned-tokenizer fertility per predicted language — the
    * q114 measure (subwords per word under the 8-merge BPE learned on
    * this corpus) with the q27 language argmax as the dimension: the
    * number that tells a multilingual corpus owner which languages
    * the tokenizer underserves (high fertility = more tokens per word
    * = worse compression for that language). Same scale shape as
    * q114: vocab-bounded segment table broadcast to the exploded
    * word stream, one groupBy. */
  def q145LangFertility(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions._
    val docs = tbl(spark, dir, "documents")
    val (_, seg) = graft.text.Bpe.learn(docs, "text", numMerges = 8)
    val nsub = seg.select(col("word"),
      size(split(col("seg"), graft.text.Bpe.D + graft.text.Bpe.D))
        .cast("long").as("nsub"))
    val staged = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val scored = staged.select(col("doc_id") +: col("toks") +:
      LangMarkers.map { case (l, m) =>
        langScoreFrom(col("toks"), m).as(s"s_$l")
      }: _*)
    val withLang = scored.withColumn("predicted_lang", langIdFromScores(
      LangMarkers.map { case (l, _) => l -> col(s"s_$l") }))
    withLang.select(col("predicted_lang"), explode(col("toks")).as("word"))
      .join(broadcast(nsub), Seq("word"))
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("nsub")).as("n_subwords"))
      .withColumn("fertility_milli",
        expr("(1000 * n_subwords) div n_words"))
  }

  /** END-TO-END token delivery through the gate — the composition a
    * training run actually consumes, as ONE verified path: curated
    * corpus (the q45 core: quality gate, PII redaction, exact dedup) →
    * TokenizerStore lifecycle (seq-stamped counts fold → 8-merge BPE
    * learn → versioned artifact + pointer) → subword encode under the
    * SERVED artifact (TokenizerStore.encode — the q113 contract) →
    * token-stream context windows (packTokenStream, 256-token bins) →
    * greedy no-split shard export with manifest (writeShards), the
    * WRITTEN shards verified against the WRITTEN manifest
    * (verifyShards must return zero mismatch rows or the query fails
    * loudly) and the manifest values joined back per document from
    * DISK. One row per delivered doc: its subword count and encode
    * fingerprint, its stream window position, its shard assignment,
    * and its shard's manifest row. The oracle replays the ENTIRE
    * chain — curation CTEs, the unrolled BPE learn over the curated
    * text, per-doc encode, both packs, and the manifest fingerprints.
    * Scale shape: each stage is the already-audited operator (nothing
    * new executes); lifecycle artifacts land in per-run temp dirs (a
    * deployment uses lake paths — the q117 note). */
  def q146TokenDelivery(spark: SparkSession, dir: String): DataFrame = {
    val curated = graft.ops.CacheScope.persist(
      graft.pipeline.Curation.curateCore(tbl(spark, dir, "documents"),
          graft.pipeline.Curation.CurationConfig(minQualityMilli = 560))
        .select(col("doc_id"), col("text")))
    val tokRoot = tmpLifecycleDir("graft-q146-tok")
    graft.text.TokenizerStore.appendCounts(
      graft.text.Bpe.wordCounts(curated, "text"), tokRoot, seq = Some(1L))
    graft.text.TokenizerStore.refresh(spark, tokRoot, "v1", numMerges = 8)
    graft.text.TokenizerStore.setCurrentVersion(spark, tokRoot, "v1")
    val enc = graft.ops.CacheScope.persist(
      graft.text.TokenizerStore.encode(curated, "doc_id", "text", tokRoot)
        .select(col("id").as("doc_id"), col("sub_str"), col("n_sub")))
    val stream = graft.ops.ScaleOps.packTokenStream(
      enc.select(col("doc_id"), col("n_sub")), "doc_id", "n_sub",
      binTokens = 256L)
    val outDir = tmpLifecycleDir("graft-q146-shards")
    // shard bins are DIRECTORIES (writeShards partitions by bucket/bin):
    // gate-sized 16k-token shards keep the dir count ~dozens at sf0.1
    // (256-token bins measured 4145 dirs / 19 s write — the q117
    // directory-count lesson); a deployment sizes shards in the 100s
    // of MB. The 256-token STREAM windows above are pure arithmetic.
    graft.ops.ShardExport.writeShards(enc.select(col("doc_id"), col("n_sub")),
      "doc_id", "n_sub", binTokens = 16384L, numBuckets = 8, outDir)
    // the delivery guarantee: what landed on disk IS what the manifest
    // claims — zero mismatch rows, or no green gate row at all
    val mismatches = graft.ops.ShardExport.verifyShards(
      spark, outDir, "doc_id", "n_sub").count()
    require(mismatches == 0L,
      s"q146: shard/manifest verification found $mismatches mismatch rows")
    val shardsOnDisk = spark.read.parquet(s"$outDir/shards")
      .select(col("doc_id"), col("pack_bucket").cast("long").as("pack_bucket"),
        col("pack_bin").cast("long").as("pack_bin"))
    val manifestOnDisk = spark.read.parquet(s"$outDir/manifest")
      .select(col("pack_bucket").cast("long").as("pack_bucket"),
        col("pack_bin").cast("long").as("pack_bin"),
        col("n_docs").as("shard_docs"), col("n_tokens").as("shard_tokens"),
        col("ids_fp").as("shard_fp"))
    enc
      .join(stream.select(col("doc_id"), col("bin_id"), col("bin_pos")),
        Seq("doc_id"))
      .join(shardsOnDisk, Seq("doc_id"))
      .join(broadcast(manifestOnDisk), Seq("pack_bucket", "pack_bin"))
      .select(col("doc_id"), col("n_sub"),
        graft.text.TextFunctions.polyHash(col("sub_str"), 1L << 40).as("sub_fp"),
        col("bin_id"), col("bin_pos"),
        col("pack_bucket"), col("pack_bin"),
        col("shard_docs"), col("shard_tokens"), col("shard_fp"),
        lit(1L).as("manifest_ok"))
  }

  /** Multi-EPOCH deterministic shuffle through the gate — the loader
    * order of a real training run: each of 3 epochs is an INDEPENDENT
    * deterministic permutation of the corpus (epoch-salted mixed hash,
    * ScaleOps.epochShufflePos), so a resume at any (epoch, position)
    * replays exactly and no two epochs present the same curriculum.
    * The oracle replays the salted hash chain and the per-epoch dense
    * positions. */
  def q147EpochShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.epochShufflePos(
        tbl(spark, dir, "documents").select(col("doc_id")), "doc_id",
        epochs = 3)
      .select(col("doc_id"), col("epoch"), col("epoch_pos"))

  /** nProbe SWEEP of the recall audit — the q149 measure at serving
    * candidates 4 / 8 / 16, aggregated over the query batch: the table
    * a deployment reads to PICK its nProbe once q149 flags a drop
    * (recall climbs with the probed fraction; latency climbs with it
    * too — this query quantifies the first axis exactly so the trade
    * is made on numbers, not folklore). Cells assign once and persist;
    * each arm re-ranks its own probe set. Oracle: the probe ranking
    * CTE shared, three candidate arms cut at prn <= nProbe, all
    * intersected with the same brute baseline. */
  def q151NprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries0 = emb.where(col("vec_id") < 25)
    val brute = graft.ops.CacheScope.persist(
      graft.ann.Ann.bruteForceTopK(queries0, emb, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")))
    val centroids = trainedCentroids(spark, dir)
    val cells = graft.ops.CacheScope.persist(
      graft.ann.Ann.ivfAssign(emb, "vec_id", "embedding", centroids))
    Seq(4, 8, 16).map { np =>
      val ivf = graft.ann.Ann.ivfProbeTopK(queries0, cells, centroids,
          "vec_id", "embedding", k = 10, nProbe = np)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(lit(np.toLong).as("n_probe"), col("k"), col("n_hit"))
    }.reduce(_ unionByName _)
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** PROGRESSIVE JPEG decode through the gate — the q124 closed-form
    * contract reached through the SOF2 multi-scan path instead of one
    * baseline scan: payloads are real progressive streams
    * ([[graft.multimodal.Jpeg.progressiveBytes]] — interleaved DC
    * first scan at Al=1, DC refinement bits, per-component AC
    * first/refinement scans whose EOB runs span the all-zero blocks),
    * the engine accumulates coefficients across scans and IDCTs at
    * EOI, and the oracle replays the closed-form constant blocks —
    * a wrong successive-approximation shift, missed refinement bit,
    * or broken EOB-run count shifts every pixel and hash-fails the
    * aggregates. The most common real-world JPEG family stops being
    * a refusal row (q77 counts the population this unlocks). */
  def q152JpegProgressive(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.jpegProgressiveCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Multimodal.decodeJpegPixelStats(media).toDF()
  }

  /** Doc-boundary SPANS of the packed token stream through the gate —
    * the q55 windows annotated with the attention-mask metadata a
    * loader needs: one row per (context window, document) intersection
    * with the slice's offset inside the window, its offset inside the
    * DOCUMENT (non-zero exactly when the document straddled in from
    * the previous window), and its width. Windows tile exactly
    * (ShardExportSpec pins the invariant); the oracle replays the q55
    * cumsum and the same interval arithmetic over a generated bin
    * range — every value an integer. */
  def q153PackSpans(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.packTokenSpans(
      tbl(spark, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 256L)

  /** Zstandard text decode through the gate — the q130 gzip pattern
    * for the modern corpus-distribution codec (RFC 8878, pure-JVM
    * [[graft.multimodal.Zstd]]): each doc's text really compresses
    * (LZ parse, canonical-Huffman literals, FSE-coded sequences,
    * XXH64 checksum) with the encoder VARIANT fanned over ids so one
    * gate crosses raw blocks, predefined + 1-stream, FSE-described
    * tables + Repeat mode, and FSE-compressed weights + 4-stream;
    * every id%3==0 payload carries a mid-frame byte flip the checksum
    * or structure must reject (ok=0, kept). The oracle states the
    * recovered text closed-form. */
  def q154ZstdText(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Zstd.zstdCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Zstd.decodeZstdText(media).toDF()
      .select(col("media_id"), col("ok"), col("text"), col("text_bytes"))
  }

  /** The .warc.zst layout through the gate: the EXACT q131 container
    * corpus (2-record WARCs, every id%4==2 with a wrong inner
    * Content-Length), each container zstd-compressed, walked via
    * decodeWarc(codec="zstd") — so the q131 oracle applies verbatim
    * and any inflate defect (wrong bytes, wrong lengths) breaks the
    * record walk it feeds. The compression layer must be INVISIBLE to
    * the record semantics; that invisibility is what this gate pins. */
  def q155WarcZst(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val media = graft.multimodal.Containers.warcCorpusFromDocuments(
      tbl(spark, dir, "documents"))
      .as[(Long, Array[Byte])].map { case (id, payload) =>
        (id, graft.multimodal.Zstd.compress(payload,
          graft.multimodal.Zstd.VariantAuto))
      }.toDF("media_id", "payload")
    graft.multimodal.Containers.decodeWarc(media, codec = "zstd").toDF()
      .select(col("media_id"), col("rec_index"), col("ok"),
        col("warc_type"), col("url"), col("http_status"), col("body"))
  }

  /** MP3 frame-header classification through the gate — compressed
    * audio made audit-visible (WAV decodes fully; the MP3 population
    * was an undifferentiated refusal): version/layer/rate/bitrate,
    * frame count, duration estimate, VBR detection, ID3v2/v1 tag
    * accounting, and TAGGED error families (bad_header / bad_sync /
    * truncated), each planted by the fixture's id arithmetic and
    * restated closed-form by the oracle — every header field, both
    * tag wrappers, and all three error walks are oracle-pinned. */
  def q156Mp3Headers(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Mp3.mp3CorpusFromDocuments(
      tbl(spark, dir, "documents"))
    graft.multimodal.Mp3.decodeMp3Info(media).toDF()
  }

  /** Paired image-text curation through the gate — the first ask of a
    * multimodal-pretraining owner, composed ENTIRELY from gated
    * pieces: the q133 mixed-codec image corpus joined to its caption
    * (the document text), gated on BOTH modalities and deduped on
    * EITHER side. Per pair: the image must decode (real PNG/JPEG
    * decode), the caption must pass the STRUCTURAL Gopher rules
    * (q135's measures minus the stop-word-evidence rule — captions
    * are not prose; see the inline note), the
    * image must be its pHash cluster's canonical representative
    * (q137: min-id member at hamming<=5), and the caption its MinHash
    * cluster's representative (q22 pairs at J>=0.7 -> components).
    * Drop reasons are tagged undecodable > caption_quality >
    * caption_dup > image_dup — the order a real pipeline applies them
    * (text dedup is cheap and runs before image hashing), so a curation
    * owner reads per-side loss straight off the column — a pair can
    * be image-clean but caption-dropped and vice versa. Clusters are
    * canonical-by-min-id (the q137 semantics): the kept member of a
    * dup cluster is deterministic, never quality-re-elected. */
  def q157PairedCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    // a deterministic ~4% of the images arrive CORRUPT (truncated to the
    // 8-byte magic) — the q133 corpus is fully decodable by construction,
    // which would leave the highest-precedence drop arm dead in the gate;
    // a real crawl day always carries undecodable payloads, so this query
    // injects them the way every other media fixture carries an error arm
    val media = graft.multimodal.Multimodal.mixedCodecImageCorpusFromDocuments(docs)
      .withColumn("payload",
        when(pmod(col("media_id"), lit(23L)) === 5L,
          expr("substring(payload, 1, 8)")).otherwise(col("payload")))
    val hashes = graft.ops.CacheScope.persist(
      graft.multimodal.Multimodal.decodeImagePHash(media).toDF())
    val imgPairs = graft.dedup.Dedup.hammingNearDupPairs(
      hashes.where(col("ok") === 1), "media_id", "phash",
      totalBits = 64, maxDist = 5, bands = 8)
    val capPairs = graft.dedup.Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.7,
      graft.dedup.Dedup.MinHashConfig(numHashes = 64, shingleSize = 3, bands = 16))
    // the two dedup closures are independent eager loops (pointer-
    // jumping rounds with per-round actions) — overlap them (§2.6)
    val ccs = buildArms(Seq(
      () => graft.dedup.Dedup.connectedComponents(imgPairs, "id_a", "id_b"),
      () => graft.dedup.Dedup.connectedComponents(capPairs, "id_a", "id_b")))
    val imgCc = ccs(0)
    val capCc = ccs(1)
    // caption gate: the STRUCTURAL Gopher rules (word count, word
    // length, symbol/bullet/ellipsis/alpha fractions) — the stop-word
    // evidence rule is deliberately omitted: captions are not prose
    // (and this corpus's synthetic vocabulary carries no stopwords at
    // all, q135 measures it as 0/500 — including it would fail every
    // caption and leave the dedup arms unreachable)
    val quality = graft.text.QualityRules.gopherRules(docs, "text")
      .select(col("doc_id"),
        when(col("n_words").between(50L, 100000L) &&
             col("mean_word_len_milli").between(3000L, 10000L) &&
             col("symbol_bp") <= 1000L && col("bullet_bp") <= 9000L &&
             col("ellipsis_bp") <= 3000L && col("alpha_bp") >= 8000L,
          lit(1L)).otherwise(lit(0L)).as("keep"))
    docs.select(col("doc_id"))
      .join(hashes.select(col("media_id"), col("ok").as("img_ok")),
        col("doc_id") === col("media_id"), "left")
      .join(imgCc.select(col("id").as("i_id"), col("component").as("img_c")),
        col("doc_id") === col("i_id"), "left")
      .join(capCc.select(col("id").as("c_id"), col("component").as("cap_c")),
        col("doc_id") === col("c_id"), "left")
      .join(quality, Seq("doc_id"))
      .select(col("doc_id"),
        coalesce(col("img_ok"), lit(0)).as("img_ok"),
        coalesce(col("img_c"), col("doc_id")).as("img_cluster"),
        coalesce(col("cap_c"), col("doc_id")).as("cap_cluster"),
        col("keep"))
      .select(col("doc_id"),
        when(col("img_ok") =!= 1, lit("image_undecodable"))
          .when(col("keep") === 0, lit("caption_quality"))
          .when(col("cap_cluster") =!= col("doc_id"), lit("caption_dup"))
          .when(col("img_cluster") =!= col("doc_id"), lit("image_dup"))
          .otherwise(lit("")).as("drop_reason"),
        col("img_cluster"), col("cap_cluster"))
      .select(col("doc_id"),
        when(col("drop_reason") === "", lit(1L)).otherwise(lit(0L)).as("kept"),
        col("drop_reason"), col("img_cluster"), col("cap_cluster"))
  }

  /** Shard PROVENANCE through the gate — which sources each training
    * shard mixes, and in what doc/token proportion: the verification a
    * loader-ops team runs after an export to confirm the data mixture
    * actually landed in the shards (a skewed pack hash or a
    * source-correlated id range would concentrate one source into few
    * shards and bias every batch drawn from them). One join of the
    * q56 pack back to the source column + one rollup; the oracle
    * replays the recursive fold and the same join. */
  def q150ShardProvenance(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val packed = graft.ops.ScaleOps.packGreedyContiguous(
      docs.select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_tokens")),
      "doc_id", "n_tokens", 256L, numBuckets = 8)
    packed.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("pack_bucket"), col("pack_bin"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** ANN recall@10 through the gate — the headline quality number of
    * the IVF index (previously only spec-pinned in AnnSpec): per
    * query, how many of the exact brute-force top-10 the trained
    * 4-probe IVF index returns, in floored basis points. Both arms are
    * the already-gated operators (q25's brute ranking, q38's trained
    * probe) over a 25-query batch, so the oracle replays both chains
    * and intersects — recall is an exact integer, not a sampled
    * estimate. At 100 TB this is the recurring index-health audit: a
    * drifted corpus (q84's detector) shows up here as a recall drop
    * before users notice. Read the LEVEL with its config in mind: the
    * audit measures the SERVED setting (nProbe=4, the q38/q111 config),
    * and on these synthetic UNCLUSTERED embeddings the probed fraction
    * is ~nProbe/(n/16) — it shrinks as the corpus grows (sf0.01 mean
    * ~0.48), which is exactly the signal that tells a deployment to
    * raise nProbe or retrain with more centroids; AnnSpec pins the
    * recall floor at its own fixture scale. */
  def q149AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val queries0 = emb.where(col("vec_id") < 25)
    val brute = graft.ann.Ann.bruteForceTopK(queries0, emb,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val centroids = trainedCentroids(spark, dir)
    val cells = graft.ann.Ann.ivfAssign(emb, "vec_id", "embedding", centroids)
    val ivf = graft.ann.Ann.ivfProbeTopK(queries0, cells, centroids,
        "vec_id", "embedding", k = 10, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id")).agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div k"))
  }

  /** Packing-efficiency audit through the gate — the fill-rate report
    * a packing policy is tuned by: per pack bucket, how many bins the
    * greedy no-split fold opened, the token total, and the floored-bp
    * fill fraction (tokens / bin capacity) — the number that says how
    * much context-window budget the no-split trade wastes at this bin
    * size. Rolls up the q56 pack (256-token bins, 8 buckets), so the
    * oracle reuses the recursive fold replay. */
  def q148PackEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.ops.ScaleOps.packGreedyContiguous(
      tbl(spark, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_tokens")),
      "doc_id", "n_tokens", 256L, numBuckets = 8)
    packed.groupBy(col("pack_bucket")).agg(
      (max(col("pack_bin")) + 1L).as("n_bins"),
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      floor(lit(10000L) * sum(col("n_tokens")) /
          ((max(col("pack_bin")) + 1L) * lit(256L)))
        .cast("long").as("fill_bp"))
  }

  /** Audio perceptual near-dup through the gate — q133's contract for
    * the audio modality: id-derived 256-sample WAVs (seed-keyed
    * envelope macro patterns in time + id-unique sample noise,
    * byte-distinct clips; id%9==0 outliers from the disjoint seed
    * space) are really encoded, PCM-decoded (q120's path),
    * envelope-fingerprinted (Multimodal.audioFingerprint64 — the same
    * fixed-point-DCT pipeline over per-cell mean |amplitude|), and
    * paired through the 8-band machinery. Oracle: full closed-form
    * replay, sample values -> cell means -> DCT literals -> median
    * bits -> brute pairs. */
  def q134AudioFpPairs(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.audioFpCorpusFromDocuments(
      tbl(spark, dir, "documents"))
    val fps = graft.multimodal.Multimodal.decodeWavFingerprint(media).toDF()
      .where(col("ok") === 1)
    graft.dedup.Dedup.hammingNearDupPairs(fps, "media_id", "afp",
      totalBits = 64, maxDist = 5, bands = 8)
  }

  /** Parquet footer audit through the gate — real lake-ops tooling
    * with a genuinely independent oracle: the engine reads row-group /
    * column metadata via parquet-hadoop's footer reader, DuckDB reads
    * the SAME footer bytes via parquet_metadata(), and every count and
    * byte total must agree. Restricted to the flat tables (nested
    * schemas name leaf paths differently across readers). NOTE the
    * oracle addresses the sf0.01 files directly (parquet_metadata
    * takes paths, not views) — the driver's correctness gate runs at
    * sf0.01 by contract; local subset runs must use that dir too. */
  def q126ParquetAudit(spark: SparkSession, dir: String): DataFrame =
    graft.io.ParquetAudit.footerAudit(spark, dir)
      .where(col("file").isin("lineitem.parquet", "orders.parquet",
        "documents.parquet", "region.parquet"))

  /** Unigram-LM (SentencePiece-style) vocabulary through the gate —
    * the top-down alternative to q112's bottom-up BPE: substring seed
    * (chars + top-200 longer pieces), integer milli-log-prob scores,
    * a Viterbi segmentation of every word type, usage recount, prune
    * to chars + top-120, add-1 rescore. The oracle replays the WHOLE
    * chain — including the Viterbi DP as a recursive CTE carrying a
    * maxPieceLen-deep best-state window — so a divergence anywhere
    * (seed cut tie, score floor, DP tie-break) hash-fails. */
  def q121UnigramVocab(spark: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.learn(tbl(spark, dir, "documents"), "text")._1

  /** Unigram-LM encoding through the gate: every document's subword
    * stream under the q121 vocabulary — the final Viterbi segmentation
    * (second DP pass, final scores) feeds the same broadcast
    * word→segmentation encode as BPE (q113's chain, shared plumbing).
    * The oracle replays BOTH Viterbi passes. */
  def q122UnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val (_, segments) = graft.text.UnigramLm.learn(docs, "text")
    graft.text.Bpe.encode(docs, "doc_id", "text", segments)
      .withColumnRenamed("id", "doc_id")
  }

  /** BPE fertility audit through the gate: per source, how many
    * subwords the q112 tokenizer spends per word (fertility in floored
    * millis — the "is this vocabulary a good fit for this source"
    * pre-training audit; a drifted or out-of-domain source shows
    * inflated fertility). Word instances broadcast-join the learned
    * word→seg table; per-word subword counts ride the tiny vocab
    * frame, never the instance rows. */
  def q114BpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val (_, seg) = graft.text.Bpe.learn(docs, "text", numMerges = 8)
    val nsub = seg.select(col("word"),
      size(split(col("seg"), graft.text.Bpe.D + graft.text.Bpe.D))
        .cast("long").as("nsub"))
    docs.select(col("source"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .join(broadcast(nsub), Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("nsub")).as("n_subwords"))
      .withColumn("fertility_milli",
        expr("(1000 * n_subwords) div n_words"))
  }

  /** Unigram-LM fertility audit through the gate — q114's measure
    * under the q121 vocabulary, completing the tokenizer COMPARISON:
    * the same per-source subwords-per-word statistic from both
    * learners over one corpus answers "which vocabulary fits this
    * source better" directly. The segmentation frame carries n_pieces
    * already (the Viterbi output), so the audit is one broadcast join
    * + one aggregation. */
  def q123UnigramFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val (_, segments) = graft.text.UnigramLm.learn(docs, "text")
    docs.select(col("source"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .join(broadcast(segments.select(col("word"),
        col("n_pieces").as("nsub"))), Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"), sum(col("nsub")).as("n_subwords"))
      .withColumn("fertility_milli",
        expr("(1000 * n_subwords) div n_words"))
  }

  /** Blocklist screening through the gate: exact-token hits against a
    * small term list, density in basis points, keep verdict at ≤ 5%.
    * Expression-only (no shuffle) — TextFunctions.blocklistHitsFrom. */
  def q109Blocklist(spark: SparkSession, dir: String): DataFrame = {
    val ts = graft.text.TextFunctions.tokens(col("text"))
    tbl(spark, dir, "documents")
      .select(col("doc_id"), size(ts).cast("long").as("n_tokens"),
        graft.text.TextFunctions.blocklistHitsFrom(ts, BlockTerms)
          .cast("long").as("n_hits"))
      .withColumn("hit_bp",
        when(col("n_tokens") > 0,
          expr("(n_hits * 10000) div n_tokens"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("keep", when(col("hit_bp") <= 500L, 1L).otherwise(0L))
  }

  /** The q109 demo blocklist (stand-ins for a real obscenity/policy
    * list — the testdata vocabulary is synthetic). */
  private val BlockTerms: Seq[String] = Seq("slow", "leak", "crash")

  /** Corpus-drift audit through the gate: token-distribution KL(src0 ‖
    * rest) in integer millinats — counts, full-outer vocabulary join,
    * add-1 smoothing, per-token floored log-ratio, integer mean. */
  def q84CorpusDivergence(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.text.CorpusStats.tokenKlDivergence(
      docs.where(col("source") === "src0"),
      docs.where(col("source") =!= "src0"), "text")
  }

  /** Drift triage through the gate: the 25 tokens driving KL(src0 ‖
    * rest), ranked by absolute integer contribution (total, ties on
    * token) — distributed top-k, no global sort. */
  def q85DivergingTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.text.CorpusStats.topDivergingTokens(
      docs.where(col("source") === "src0"),
      docs.where(col("source") =!= "src0"), "text", k = 25)
  }

  /** Span excision through the gate: q76's duplicated extents excised
    * from every document — detection and rewrite verified together,
    * token-for-token (kept tokens re-joined, counts reconciled). */
  def q80ExciseSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val spans = graft.dedup.Dedup.duplicatedSpans(
      docs, "doc_id", "text", spanTokens = 5, minDf = 2L)
    graft.dedup.Dedup.exciseSpans(docs, "doc_id", "text", spans)
      .withColumnRenamed("id", "doc_id")
  }

  /** Retention cohort matrix through the gate: users grouped by their
    * first-activity week, distinct-user counts per (cohort week, week
    * offset) — the product-analytics staple over the events table. Weeks
    * are pure integer nano arithmetic (no timezone cliffs). */
  def q64RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    // µs domain (DuckDB truncates nanos to µs — q74's reasoning), and
    // FLOOR division (pmod-adjusted), not `div`'s truncation: DuckDB's
    // `//` floors, and the two disagree on pre-1970 (negative) stamps
    val usPerWeek = 604800000000L
    val weeks = tbl(spark, dir, "events")
      .select(col("user_id"),
        expr(s"((ts div 1000) - pmod(ts div 1000, ${usPerWeek}L)) div ${usPerWeek}L").as("wk"))
    val cohort = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    weeks.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // =================================================================
  // generated oracle fragments (reproducible-hash pipelines)
  // =================================================================

  /** DuckDB fragment: k-word shingles of a token-list expr `ts` —
    * TextFunctions.wordShinglesFrom's semantics (fewer than k tokens →
    * one whole-text shingle; no tokens → empty list). */
  private def duckShingles(ts: String, k: Int): String =
    s"""CASE WHEN len($ts) >= $k THEN list_transform(range(1, len($ts) - ${k - 2}), i -> array_to_string($ts[i:i+${k - 1}], ' '))
       |         WHEN len($ts) > 0 THEN [array_to_string($ts, ' ')]
       |         ELSE []::VARCHAR[] END""".stripMargin

  /** DuckDB fragment: sequential-accumulation double dot product of two
    * float-list expressions — bit-identical to FloatVectorDot. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($a, $b), " +
      "x -> x[1]::DOUBLE * x[2]::DOUBLE)), (p, q) -> p + q)"

  /** DuckDB fragment: the q133 pHash chain — closed-form gray planes
    * of the MIXED-codec fixture corpus (even decades: 32x32 PNG pixel
    * sums per 4x4 cell; odd decades: 64x64 DC-only JPEG, one constant
    * 8x8 block per hash cell, so the cell sum is 64x the block value),
    * fixed-point DCT against the SAME frozen cosine literals as
    * Multimodal.PhashDct, median bits — ending in `ph(doc_id, h)`.
    * Shared by the q133 pair gate and the q137 cluster closure. */
  private lazy val duckPhashCtes: String =
    """px AS (
      |  SELECT d.doc_id, x.x AS x, y.y AS y,
      |    least(greatest(
      |      (((CASE WHEN d.doc_id % 9 = 0 THEN 10 + d.doc_id % 7
      |              ELSE d.doc_id % 10 END) * 73
      |        + (x.x // 4) * 37 + (y.y // 4) * 91) % 17) * 15 +
      |      (d.doc_id * 31 + x.x * 7 + y.y * 13) % 3 - 1,
      |      0), 255) AS g
      |  FROM documents d, range(0, 32) AS x(x), range(0, 32) AS y(y)
      |  WHERE (d.doc_id // 10) % 2 = 0),
      |blk AS (
      |  SELECT doc_id, y // 4 AS bi, x // 4 AS bj, sum(g) AS s
      |  FROM px GROUP BY doc_id, y // 4, x // 4
      |  UNION ALL
      |  SELECT d.doc_id, bi.bi AS bi, bj.bj AS bj,
      |    64 * least(greatest(
      |      (((CASE WHEN d.doc_id % 9 = 0 THEN 10 + d.doc_id % 7
      |              ELSE d.doc_id % 10 END) * 73
      |        + bj.bj * 37 + bi.bi * 91) % 17) * 15 +
      |      (d.doc_id * 31 + bj.bj * 7 + bi.bi * 13) % 3 - 1,
      |      0), 255) AS s
      |  FROM documents d, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)
      |  WHERE (d.doc_id // 10) % 2 = 1),
      |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
      |  [1004,851,569,200,-200,-569,-851,-1004],
      |  [946,392,-392,-946,-946,-392,392,946],
      |  [851,-200,-1004,-569,569,1004,200,-851],
      |  [724,-724,-724,724,724,-724,-724,724],
      |  [569,-1004,200,851,-851,-200,1004,-569],
      |  [392,-946,946,-392,-392,946,-946,392],
      |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
      |dct AS (
      |  SELECT b.doc_id, u.u AS u, v.v AS v,
      |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS f
      |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
      |  GROUP BY b.doc_id, u.u, v.v),
      |med AS (
      |  SELECT doc_id, list_sort(list(f))[32] AS m
      |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
      |ph AS (
      |  SELECT d.doc_id,
      |    sum(CASE WHEN d.f > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
      |             ELSE 0::BIGINT END)::BIGINT AS h
      |  FROM dct d JOIN med ON d.doc_id = med.doc_id
      |  WHERE NOT (d.u = 0 AND d.v = 0)
      |  GROUP BY d.doc_id)""".stripMargin

  /** DuckDB fragment: ONE Lloyd round — assign every vector to its
    * nearest `in` centroid (argmax dot, d DESC / cid tie-break), then
    * rebuild the inhabited centroids from 2^-24 fixed-point coordinate
    * sums with a sequential-fold L2 normalization — the exact
    * arithmetic of Ann.ivfRefineCentroids, so the replay is
    * bit-identical. */
  private def duckLloydRound(in: String, out: String,
      src: String = "embeddings"): String =
    s"""${out}_a AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${duckDot("e.embedding", "c.cvec")} DESC, c.cid) AS rn
       |    FROM $src e CROSS JOIN $in c) t WHERE rn = 1),
       |${out}_g AS (
       |  SELECT cell, i,
       |    sum(floor(x::DOUBLE * 16777216.0)::BIGINT)::DOUBLE / 16777216.0 AS s
       |  FROM (SELECT cid AS cell, generate_subscripts(embedding, 1) AS i,
       |          unnest(embedding) AS x FROM ${out}_a) u
       |  GROUP BY cell, i),
       |${out}_v AS (
       |  SELECT cell, list(s ORDER BY i) AS sv FROM ${out}_g GROUP BY cell),
       |$out AS (
       |  SELECT cell AS cid,
       |    CASE WHEN nrm > 0 THEN list_transform(sv, x -> (x / nrm)::FLOAT)
       |         ELSE list_transform(sv, x -> x::FLOAT) END AS cvec
       |  FROM (SELECT cell, sv,
       |      sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |        list_transform(sv, x -> x * x)), (a, v) -> a + v)) AS nrm
       |    FROM ${out}_v) t)""".stripMargin

  /** DuckDB fragment: the TRAINED IVF cell-assignment CTE chain —
    * stride-16 seed, two unrolled Lloyd rounds (the Spark side's
    * Ann.ivfTrainCentroids(stride=16, iters=2)), then the final
    * cent/asg0/asg/cells assignment (argmax with the d DESC, cid
    * tie-break) — ONE definition shared by the q38/q60/q72/q111
    * oracles. */
  private lazy val duckIvfCellsCtes: String = duckIvfCellsCtesFor("embeddings")
  private def duckIvfCellsCtesFor(src: String): String =
    s"""cent_seed AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM $src WHERE vec_id % 16 = 0),
       |${duckLloydRound("cent_seed", "cent_r1", src)},
       |${duckLloydRound("cent_r1", "cent", src)},
       |asg0 AS (
       |  SELECT e.vec_id, e.embedding, c.cid, ${duckDot("e.embedding", "c.cvec")} AS d
       |  FROM $src e CROSS JOIN cent c),
       |asg AS (
       |  SELECT vec_id, embedding, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM asg0),
       |cells AS (SELECT vec_id, embedding, cid AS cell FROM asg WHERE rn = 1)""".stripMargin

  /** q162 oracle: the q149 probe chain (trained centroids, nProbe=4
    * cell ranking) over the every-25th delta, with the verify dot at
    * the q24 threshold instead of a top-k cut. */
  private lazy val q162Oracle: String =
    s"""WITH $duckIvfCellsCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
       |      WHERE vec_id % 25 = 0),
       |p0 AS (
       |  SELECT q.query_id, q.q_vec, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM q CROSS JOIN cent c),
       |pr AS (
       |  SELECT query_id, q_vec, cell FROM (
       |    SELECT query_id, q_vec, cid AS cell,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS prn
       |    FROM p0) t WHERE prn <= 4)
       |SELECT pr.query_id, cells.vec_id AS neighbor_id,
       |  round(${duckDot("pr.q_vec", "cells.embedding")}, 3) AS cos
       |FROM pr JOIN cells ON pr.cell = cells.cell
       |WHERE cells.vec_id != pr.query_id
       |  AND round(${duckDot("pr.q_vec", "cells.embedding")}, 3) >= 0.4""".stripMargin

  /** q149 oracle: both retrieval arms replayed and intersected — the
    * q25 brute ranking and the q38 trained-IVF probe chain over the
    * same 25-query batch, recall as exact floored basis points. */
  private lazy val q149Oracle: String =
    s"""WITH $duckIvfCellsCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 25),
       |p0 AS (
       |  SELECT q.query_id, q.q_vec, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM q CROSS JOIN cent c),
       |pr AS (
       |  SELECT query_id, q_vec, cell FROM (
       |    SELECT query_id, q_vec, cid AS cell,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS prn
       |    FROM p0) t WHERE prn <= 4),
       |icand AS (
       |  SELECT pr.query_id, cells.vec_id AS neighbor_id,
       |    round(${duckDot("pr.q_vec", "cells.embedding")}, 6) AS cos
       |  FROM pr JOIN cells ON pr.cell = cells.cell
       |  WHERE cells.vec_id != pr.query_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM icand) t WHERE rank <= 10),
       |bs AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round(${duckDot("q.q_vec", "c.embedding")}, 6) AS cos
       |  FROM q CROSS JOIN embeddings c WHERE c.vec_id != q.query_id),
       |brute AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM bs) t WHERE rank <= 10)
       |SELECT b.query_id, count(*)::BIGINT AS k,
       |  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       |  ((10000 * sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)) // count(*))::BIGINT AS recall_bp
       |FROM brute b LEFT JOIN ivf i
       |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       |GROUP BY b.query_id""".stripMargin

  /** q151 oracle: the q149 chains with the probe ranking shared and
    * three candidate arms cut at prn <= nProbe, aggregated per arm. */
  private lazy val q151Oracle: String = {
    val arms = Seq(4, 8, 16).map { np =>
      s"""ic$np AS (
         |  SELECT pr.query_id, cells.vec_id AS neighbor_id,
         |    round(${duckDot("pr.q_vec", "cells.embedding")}, 6) AS cos
         |  FROM (SELECT query_id, q_vec, cell FROM prall WHERE prn <= $np) pr
         |  JOIN cells ON pr.cell = cells.cell
         |  WHERE cells.vec_id != pr.query_id),
         |iv$np AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM ic$np) t WHERE rank <= 10)""".stripMargin
    }.mkString(",\n")
    val sel = Seq(4, 8, 16).map { np =>
      s"""SELECT $np::BIGINT AS n_probe, count(*)::BIGINT AS k,
         |  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
         |  ((10000 * sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)) // count(*))::BIGINT AS recall_bp
         |FROM brute b LEFT JOIN iv$np i
         |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $duckIvfCellsCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 25),
       |p0 AS (
       |  SELECT q.query_id, q.q_vec, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM q CROSS JOIN cent c),
       |prall AS (
       |  SELECT query_id, q_vec, cid AS cell,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS prn
       |  FROM p0),
       |bs AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round(${duckDot("q.q_vec", "c.embedding")}, 6) AS cos
       |  FROM q CROSS JOIN embeddings c WHERE c.vec_id != q.query_id),
       |brute AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM bs) t WHERE rank <= 10),
       |$arms
       |$sel""".stripMargin
  }

  /** q38 oracle: the whole IVF pipeline — centroid sampling, argmax cell
    * assignment (same deterministic tie-break), probe list, candidate
    * join, top-k — in plain SQL over the same table. */
  /** DuckDB fragment: double-list squared L2 / dot, left-to-right. */
  private def duckL2sq(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($a, $b), " +
      "p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y)"
  private def duckDotD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($a, $b), " +
      "p -> p[1] * p[2])), (x, y) -> x + y)"

  /** One PQ Lloyd round: L2 assignment (asc, code tie-break) + the
    * fixed-point per-position means — the Pq.trainCodebooks replay.
    * `subs` names the sub-vector CTE (pqsubs for the raw-embedding
    * q181 chain, rsubs for q188's residual chain). */
  private def duckPqRound(in: String, out: String,
      subs: String = "pqsubs"): String =
    s"""${out}_a AS (
       |  SELECT vec_id, s, sv, code FROM (
       |    SELECT u.vec_id, u.s, u.sv, c.code,
       |      row_number() OVER (PARTITION BY u.vec_id, u.s
       |        ORDER BY ${duckL2sq("u.sv", "c.cvec")} ASC, c.code) AS rn
       |    FROM $subs u JOIN $in c ON u.s = c.s) t WHERE rn = 1),
       |${out}_g AS (
       |  SELECT s, code, i, sum(floor(x * 16777216.0)::BIGINT) AS fx,
       |    count(*) AS cnt
       |  FROM (SELECT s, code, generate_subscripts(sv, 1) AS i,
       |      unnest(sv) AS x FROM ${out}_a) u
       |  GROUP BY s, code, i),
       |$out AS (
       |  SELECT s, code,
       |    list((fx::DOUBLE / 16777216.0) / cnt ORDER BY i) AS cvec
       |  FROM ${out}_g GROUP BY s, code)""".stripMargin

  /** DuckDB fragment: the trained PQ codebooks (8 x 8-dim subspaces,
    * stride-16 seeds, 2 rounds), the encoded corpus, and the ADC
    * fixed-point scores for the 25-query batch — parameterized over
    * the source frame and a CTE-name prefix so the q201 rotated chain
    * runs the identical replay beside the raw one. */
  private def duckPqCtesFor(src: String, p: String): String =
    s"""${p}subs AS (
       |  SELECT e.vec_id, ss.s AS s,
       |    list_transform(e.embedding[ss.s*8+1 : ss.s*8+8],
       |      x -> x::DOUBLE) AS sv
       |  FROM $src e,
       |    (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) ss(s)),
       |${p}cb0 AS (
       |  SELECT s, vec_id AS code, sv AS cvec FROM ${p}subs
       |  WHERE vec_id % 16 = 0 AND vec_id < 16 * 32),
       |${duckPqRound(s"${p}cb0", s"${p}cb1", subs = s"${p}subs")},
       |${duckPqRound(s"${p}cb1", s"${p}cb", subs = s"${p}subs")},
       |${p}enc AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT u.vec_id, u.s, c.code,
       |      row_number() OVER (PARTITION BY u.vec_id, u.s
       |        ORDER BY ${duckL2sq("u.sv", "c.cvec")} ASC, c.code) AS rn
       |    FROM ${p}subs u JOIN ${p}cb c ON u.s = c.s) t WHERE rn = 1),
       |${p}tab AS (
       |  SELECT q.vec_id AS query_id, q.s, c.code,
       |    floor(${duckDotD("q.sv", "c.cvec")} * 16777216.0)::BIGINT AS pfx
       |  FROM ${p}subs q JOIN ${p}cb c ON q.s = c.s WHERE q.vec_id < 25),
       |${p}sc AS (
       |  SELECT t.query_id, e.vec_id AS neighbor_id, sum(t.pfx) AS fx
       |  FROM ${p}enc e JOIN ${p}tab t ON t.s = e.s AND t.code = e.code
       |  WHERE t.query_id != e.vec_id
       |  GROUP BY t.query_id, e.vec_id)""".stripMargin

  private lazy val duckPqCtes: String = duckPqCtesFor("embeddings", "pq")

  /** DuckDB fragment: the q197 audio-fingerprint chain — the fixture's
    * closed-form sample law, the 4-bin spectra under the SAME frozen
    * trig literals as [[graft.multimodal.AudioFp]], the chromaprint
    * bit rule, and the 64-bit packing (HUGEINT power table, folded to
    * the signed long at the end — bit 63 must wrap exactly). */
  private lazy val duckAudioFpCtes: String = {
    val fp = graft.multimodal.AudioFp
    val trigRows = (for {
      b <- fp.Bins.indices
      i <- 0 until fp.FrameLen
    } yield s"($b,$i,${fp.CosTab(b)(i)},${fp.SinTab(b)(i)})").mkString(",")
    val powRows = (0 until 64)
      .map(p => s"($p,${BigInt(2).pow(p)})").mkString(",")
    s"""smp AS (
       |  SELECT d.doc_id, (r.i // 64) AS f, (r.i % 64) AS ii,
       |    ((r.i + 3 + (doc_id % 97) * 131) * (r.i + 11 + (doc_id % 97) * 17)
       |      * 2654435761) % 65000 - 32500 + (doc_id % 3) AS s
       |  FROM documents d, range(0, ${fp.FrameLen * fp.NFrames}) r(i)
       |  WHERE doc_id % 41 <> 6),
       |trig(b, ii, c, sn) AS (VALUES $trigRows),
       |pows(pos, pw) AS (VALUES $powRows),
       |pwr AS (
       |  SELECT doc_id, f, b,
       |    sum(s * c) * sum(s * c) + sum(s * sn) * sum(s * sn) AS p
       |  FROM smp JOIN trig USING (ii)
       |  GROUP BY doc_id, f, b),
       |afp AS (
       |  SELECT a.doc_id,
       |    coalesce(sum(CASE WHEN a.p > q.p THEN pows.pw ELSE 0 END), 0)
       |      AS fpu
       |  FROM pwr a
       |  JOIN pwr q ON q.doc_id = a.doc_id AND q.b = a.b AND q.f = a.f - 1
       |  JOIN pows ON pows.pos = (a.f - 1) * 4 + a.b
       |  GROUP BY a.doc_id),
       |sfp AS (
       |  SELECT doc_id,
       |    CASE WHEN fpu >= 9223372036854775808
       |         THEN (fpu - 18446744073709551616)::BIGINT
       |         ELSE fpu::BIGINT END AS fp
       |  FROM afp)""".stripMargin
  }

  /** DuckDB fragment: the WHOLE IVF-PQ chain — q38's trained IVF cells
    * (duckIvfCellsCtes), double residuals against the cell centroids,
    * q181's fixed-point PQ Lloyd over the RESIDUAL sub-vectors
    * (stride-16 seeds, 2 rounds, 8 x 8-dim), the residual encoding, the
    * 25-query probe list (nProbe=4) carrying the fixed-point q·centroid
    * term, the residual ADC table, and the probed-cell candidate scores
    * fx = cfx + Σ pfx (exact integer). Replays
    * IvfPq.trainCodebooks/encode/adcProbeScores end-to-end.
    * Parametrized over the query-batch predicate and nProbe so the
    * q188/q189 (default) and q190 (lifecycle probe) chains share it. */
  /** DuckDB fragment: the exact ±1/8 Hadamard rotation of the
    * embeddings table (H(i,j) = (−1)^popcount(i AND j) / 8 — every
    * entry a power of two, so the rotated frame replays
    * bit-identically), landed back in FLOAT (the kernels' IEEE
    * round-trip). Shared by the q201 A/B and the q205 rotated-index
    * lifecycle chain. */
  private lazy val duckHadamardCte: String =
    """hrot AS (
      |  SELECT vec_id,
      |    list_transform(range(0, 64), j ->
      |      (list_reduce(list_prepend(0.0::DOUBLE,
      |        list_transform(list_zip(embedding, range(0, 64)),
      |          p -> CASE WHEN bit_count(p[2] & j) % 2 = 0
      |               THEN p[1]::DOUBLE ELSE -(p[1]::DOUBLE) END)),
      |        (x, y) -> x + y) / 8.0)::FLOAT) AS embedding
      |  FROM embeddings)""".stripMargin

  private lazy val duckIvfPqCtes: String = duckIvfPqCtesFor()
  private def duckIvfPqCtesFor(queryWhere: String = "vec_id < 25",
      nProbe: Int = 4, src: String = "embeddings"): String =
    s"""${duckIvfPqBase(queryWhere, src)},
       |ippr AS (
       |  SELECT query_id, cell, cfx FROM ipprall WHERE prn <= $nProbe),
       |ipsc AS (
       |  SELECT pr.query_id, n.vec_id AS neighbor_id,
       |    min(pr.cfx) + sum(t.pfx) AS fx
       |  FROM renc n
       |  JOIN ippr pr ON pr.cell = n.cell
       |  JOIN rtab t ON t.query_id = pr.query_id
       |    AND t.s = n.s AND t.code = n.code
       |  WHERE n.vec_id != pr.query_id
       |  GROUP BY pr.query_id, n.vec_id)""".stripMargin

  /** The nProbe-independent part of the IVF-PQ chain: trained cells,
    * residual codebooks/encoding, the FULL per-query cell ranking
    * (ipprall, prn kept — the q151 shared-ranking shape), and the
    * residual ADC table. Arms cut `WHERE prn <= nProbe`. */
  private def duckIvfPqBase(queryWhere: String,
      src: String = "embeddings"): String =
    s"""${duckIvfCellsCtesFor(src)},
       |rres AS (
       |  SELECT cl.vec_id, cl.cell,
       |    list_transform(list_zip(cl.embedding, c.cvec),
       |      p -> p[1]::DOUBLE - p[2]::DOUBLE) AS rvec
       |  FROM cells cl JOIN cent c ON cl.cell = c.cid),
       |rsubs AS (
       |  SELECT r.vec_id, r.cell, ss.s AS s,
       |    r.rvec[ss.s*8+1 : ss.s*8+8] AS sv
       |  FROM rres r,
       |    (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) ss(s)),
       |rcb0 AS (
       |  SELECT s, vec_id AS code, sv AS cvec FROM rsubs
       |  WHERE vec_id % 16 = 0 AND vec_id < 16 * 32),
       |${duckPqRound("rcb0", "rcb1", subs = "rsubs")},
       |${duckPqRound("rcb1", "rcb", subs = "rsubs")},
       |renc AS (
       |  SELECT vec_id, cell, s, code FROM (
       |    SELECT u.vec_id, u.cell, u.s, c.code,
       |      row_number() OVER (PARTITION BY u.vec_id, u.s
       |        ORDER BY ${duckL2sq("u.sv", "c.cvec")} ASC, c.code) AS rn
       |    FROM rsubs u JOIN rcb c ON u.s = c.s) t WHERE rn = 1),
       |ipq AS (SELECT vec_id AS query_id, embedding AS q_vec
       |        FROM $src WHERE $queryWhere),
       |ipp0 AS (
       |  SELECT q.query_id, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM ipq q CROSS JOIN cent c),
       |ipprall AS (
       |  SELECT query_id, cid AS cell,
       |    floor(d * 16777216.0)::BIGINT AS cfx,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d DESC, cid) AS prn
       |  FROM ipp0),
       |rqsubs AS (
       |  SELECT e.vec_id AS query_id, ss.s AS s,
       |    list_transform(e.embedding[ss.s*8+1 : ss.s*8+8],
       |      x -> x::DOUBLE) AS sv
       |  FROM $src e,
       |    (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) ss(s)
       |  WHERE $queryWhere),
       |rtab AS (
       |  SELECT u.query_id, u.s, c.code,
       |    floor(${duckDotD("u.sv", "c.cvec")} * 16777216.0)::BIGINT AS pfx
       |  FROM rqsubs u JOIN rcb c ON u.s = c.s)""".stripMargin

  private lazy val q38Oracle: String =
    s"""WITH $duckIvfCellsCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
       |p0 AS (
       |  SELECT q.query_id, q.q_vec, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM q CROSS JOIN cent c),
       |pr AS (
       |  SELECT query_id, q_vec, cell FROM (
       |    SELECT query_id, q_vec, cid AS cell,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS prn
       |    FROM p0) t WHERE prn <= 4),
       |cand AS (
       |  SELECT pr.query_id, cells.vec_id AS neighbor_id,
       |    round(${duckDot("pr.q_vec", "cells.embedding")}, 6) AS cos
       |  FROM pr JOIN cells ON pr.cell = cells.cell
       |  WHERE cells.vec_id != pr.query_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM cand) t WHERE rank <= 10""".stripMargin

  /** q58 oracle: both stages of the quantized-rescore ANN — per-vector
    * int8 quantization (q50's arithmetic), integer code dot scaled by
    * the corpus maxAbs, coarse candidate ranking, then the exact fp32
    * rescore and final top-k — replayed in plain SQL. */
  private lazy val q58Oracle: String =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
       |  FROM embeddings),
       |qz AS (
       |  SELECT vec_id, embedding, mx,
       |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0::BIGINT)
       |         ELSE list_transform(embedding, x -> floor(127.0 * x::DOUBLE / mx)::BIGINT)
       |    END AS qv
       |  FROM m),
       |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 5),
       |coarse AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    (list_reduce(list_prepend(0::BIGINT,
       |       list_transform(list_zip(c.qv, q.qq), x -> x[1] * x[2])),
       |       (a, v) -> a + v))::DOUBLE * c.mx AS coarse
       |  FROM qz c CROSS JOIN q WHERE c.vec_id != q.query_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crn
       |    FROM coarse) t WHERE crn <= 40),
       |resc AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(${duckDot("qe.embedding", "ce.embedding")}, 6) AS cos
       |  FROM cand
       |  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM resc) t WHERE rank <= 10""".stripMargin

  /** q59 oracle: the snapshot diff replayed as a full outer join of the
    * two deterministic snapshot views on (fp40, normalized length)
    * identity with null-safe compares. */
  private lazy val q59Oracle: String = {
    def fpOf(t: String) = duckPolyHash(s"replace(lower(trim($t)), ' ', '')", 1L << 40)
    s"""WITH o AS (
       |  SELECT doc_id, ${fpOf("text")} AS old_fp,
       |    length(replace(lower(trim(text)), ' ', '')) AS old_nl
       |  FROM documents WHERE doc_id % 5 != 0),
       |n0 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text || ' rev2' ELSE text END AS text
       |  FROM documents WHERE doc_id % 5 != 1),
       |n AS (
       |  SELECT doc_id, ${fpOf("text")} AS new_fp,
       |    length(replace(lower(trim(text)), ' ', '')) AS new_nl
       |  FROM n0)
       |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN o.doc_id IS NULL THEN 'added'
       |       WHEN n.doc_id IS NULL THEN 'removed'
       |       WHEN o.old_fp IS NOT DISTINCT FROM n.new_fp
       |        AND o.old_nl IS NOT DISTINCT FROM n.new_nl THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  o.old_fp, n.new_fp
       |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin
  }

  /** q60 oracle: q38's cell-assignment CTEs (stride centroids, argmax
    * with the same tie-break) plus the mixed-hash per-cell cap. */
  private lazy val q60Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH $duckIvfCellsCtes,
       |h0 AS (
       |  SELECT vec_id, cell,
       |    ${duckPolyHash("CAST(vec_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM cells),
       |mx AS (SELECT vec_id, cell, h$chain FROM h0)
       |SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY cell ORDER BY $mixed, vec_id) AS drn
       |  FROM mx) t WHERE drn <= 5""".stripMargin
  }

  /** q67 oracle: the dataset card replayed — same token list, same
    * (fp40, nlen) identity, same quality formula as the q26 oracle. */
  private lazy val q67Oracle: String =
    s"""WITH t AS (
       |  SELECT source, lang, text,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks,
       |    coalesce(${duckPolyHash("replace(lower(trim(text)), ' ', '')", 1L << 40)}, -1) AS fp,
       |    coalesce(length(replace(lower(trim(text)), ' ', '')), -1) AS nl
       |  FROM documents),
       |q AS (
       |  SELECT *, ${duckQualityMilli("toks")} AS qm
       |  FROM t)
       |SELECT count(*)::BIGINT AS n_docs,
       |  coalesce(sum(len(toks)), 0)::BIGINT AS n_tokens,
       |  count(DISTINCT source)::BIGINT AS n_sources,
       |  count(DISTINCT lang)::BIGINT AS n_langs,
       |  count(DISTINCT (fp, nl))::BIGINT AS n_distinct_texts,
       |  floor((count(*) - count(DISTINCT (fp, nl))) * 10000.0 / count(*))::BIGINT AS dup_bp,
       |  floor(avg(qm))::BIGINT AS mean_quality_milli
       |FROM q""".stripMargin

  /** q69 oracle: the quality formula (q26's SQL form) feeding the q42
    * affine-spread sampling hash, rate = quality×8 clamped. */
  private lazy val q69Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source, ${duckQualityMilli("toks")} * 8 AS rate_bp
       |  FROM t)
       |SELECT doc_id, source, rate_bp
       |FROM q
       |WHERE ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
       |  % ${1L << 31}) % 10000 < least(greatest(rate_bp, 0), 10000)""".stripMargin

  /** q70 oracle: q46's register replay carried per group. */
  private lazy val q70Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH k AS (SELECT DISTINCT event_type AS grp, user_id FROM events),
       |h0 AS (SELECT grp, ${duckPolyHash("CAST(user_id AS VARCHAR)", 1L << 48)} AS h FROM k),
       |mx AS (SELECT grp, h$chain FROM h0),
       |r AS (SELECT grp, $mixed & 1023 AS bucket, $mixed >> 10 AS v FROM mx)
       |SELECT grp, bucket,
       |  max(CASE WHEN v = 0 THEN 39 ELSE 39 - length(bin(v)) END)::BIGINT AS m_rho
       |FROM r GROUP BY grp, bucket""".stripMargin
  }

  /** DuckDB fragment: the quality-milli formula over a token-list expr —
    * ONE SQL-side definition mirroring TextFunctions.qualityMilliFrom
    * (whose comment warns that drifting weight copies silently
    * desynchronize the gates; the SQL side had grown five). */
  private def duckQualityMilli(toks: String): String =
    s"CASE WHEN len($toks) > 0 THEN least(len($toks)::BIGINT * 8, 400) " +
      s"+ floor(len(list_distinct($toks)) * 300.0 / len($toks))::BIGINT " +
      s"+ least(floor(list_sum(list_transform($toks, x -> length(x))) * 75.0 " +
      s"/ (len($toks) * 2))::BIGINT, 300) ELSE 0 END"

  /** q71 oracle: the q42 sampling hash against cumulative split
    * boundaries. */
  private lazy val q71Oracle: String =
    s"""SELECT doc_id, source,
       |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, source,
       |  ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
       |    % ${1L << 31}) % 10000 AS b
       |  FROM documents) t""".stripMargin

  /** q72 oracle: q38's cell CTEs, self-join within cell, exact dot at
    * the threshold. */
  private lazy val q72Oracle: String =
    s"""WITH $duckIvfCellsCtes
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${duckDot("a.embedding", "b.embedding")}, 3) AS cos
       |FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE round(${duckDot("a.embedding", "b.embedding")}, 3) >= 0.35""".stripMargin

  /** q73 oracle: bigrams by positional indexing, conditional counts,
    * the q51 floor-ln treatment, integer mean. */
  private lazy val q73Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS tok
       |  FROM t, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |b AS (SELECT prev, tok, count(*) AS cb FROM p GROUP BY prev, tok),
       |pref AS (SELECT prev, sum(cb)::BIGINT AS cp FROM b GROUP BY prev),
       |s AS (
       |  SELECT p.doc_id, floor(1000.0 * ln(pref.cp::DOUBLE / b.cb))::BIGINT AS si
       |  FROM p JOIN b USING (prev, tok) JOIN pref USING (prev))
       |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |  (sum(si)::BIGINT // count(*)) AS bigram_surprisal_milli
       |FROM s GROUP BY doc_id""".stripMargin

  /** q74 oracle: the same RANGE frame over epoch nanos. */
  private lazy val q74Oracle: String =
    s"""SELECT event_id, user_id,
       |  (sum(vm) OVER w)::BIGINT AS rolling_milli_30m,
       |  (count(*) OVER w)::BIGINT AS n_events_30m
       |FROM (
       |  SELECT event_id, user_id, epoch_us(ts) AS tus,
       |    floor(value * 1000)::BIGINT AS vm
       |  FROM events WHERE ts IS NOT NULL) t
       |WINDOW w AS (PARTITION BY user_id ORDER BY tus
       |  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** q75 oracle: the q61 register replay carried per source. */
  private lazy val q75Oracle: String = {
    val mod40 = 1L << 40
    val div = 1L << graft.functions.Cms.BucketShift
    val rows = graft.dedup.Dedup.hashParamsPublic(graft.functions.Cms.Depth)
      .zipWithIndex.map { case ((a, b), i) =>
        s"SELECT grp, $i AS depth_row, (($a * th + $b) % $mod40) // $div AS bucket FROM h"
      }.mkString("\n  UNION ALL ")
    s"""WITH t AS (
       |  SELECT source AS grp,
       |    unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents),
       |h AS (SELECT grp, ${duckPolyHash("tok", 1L << 31)} AS th FROM t),
       |b AS (
       |  $rows)
       |SELECT grp, depth_row, bucket, count(*)::BIGINT AS cnt
       |FROM b GROUP BY grp, depth_row, bucket""".stripMargin
  }

  /** q65 oracle: the Bloom set bits — 31-bit text hash, K affine
    * transforms taking the top 12 bits, DISTINCT — replayed with one
    * UNION branch per hash. */
  private lazy val q65Oracle: String = {
    val mod40 = 1L << 40
    val div = 1L << graft.functions.Bloom.BitShift
    val rows = graft.dedup.Dedup.hashParamsPublic(
        graft.functions.Cms.Depth + graft.functions.Bloom.K)
      .drop(graft.functions.Cms.Depth)
      .map { case (a, b) =>
        s"SELECT (($a * h + $b) % $mod40) // $div AS bit FROM h"
      }.mkString("\n  UNION ALL ")
    s"""WITH h AS (SELECT ${duckPolyHash("text", 1L << 31)} AS h
       |  FROM documents WHERE text IS NOT NULL),
       |b AS (
       |  $rows)
       |SELECT DISTINCT bit FROM b""".stripMargin
  }

  /** q61 oracle: the CMS registers — token-instance explode, 31-bit poly
    * hash, Depth affine transforms taking the top Width bits, groupBy
    * count — replayed with one UNION ALL branch per sketch row. */
  private lazy val q61Oracle: String = {
    val mod40 = 1L << 40
    val div = 1L << graft.functions.Cms.BucketShift
    val rows = graft.dedup.Dedup.hashParamsPublic(graft.functions.Cms.Depth)
      .zipWithIndex.map { case ((a, b), i) =>
        s"SELECT $i AS depth_row, (($a * th + $b) % $mod40) // $div AS bucket FROM h"
      }.mkString("\n  UNION ALL ")
    s"""WITH t AS (
       |  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents),
       |h AS (SELECT ${duckPolyHash("tok", 1L << 31)} AS th FROM t),
       |b AS (
       |  $rows)
       |SELECT depth_row, bucket, count(*)::BIGINT AS cnt
       |FROM b GROUP BY depth_row, bucket""".stripMargin
  }

  /** DuckDB fragment: 31-ary polynomial char-fold of expr `s` mod `m` —
    * the exact arithmetic of TextFunctions.polyHash, so signatures built
    * from it agree bit-for-bit across engines. */
  private def duckPolyHash(s: String, m: Long): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($s, ''), " +
      s"ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $m)"

  private val Mod40 = 1L << 40

  /** DuckDB replica of the ShingleFps window fold (same 1000003 / 2^40
    * constants) — shared by every shingle-fingerprint oracle. */
  private def duckShingleFold(win: String): String =
    s"list_reduce(list_prepend(0::BIGINT, $win), (acc, h) -> (acc * 1000003 + h) % $Mod40)"

  /** DuckDB replica of Dedup's 48-bit avalanche finalizer (same constants,
    * same split-multiply arithmetic), applied elementwise to a list expr. */
  private def duckMix48(inner: String): String = {
    val sh = graft.dedup.Dedup.Mix48Shift
    def xs(e: String) = s"list_transform($e, x -> xor(x, x >> $sh))"
    def mul(e: String, a: Long) =
      s"list_transform($e, x -> ((($a * (x >> 24)) % 16777216) * 16777216 + $a * (x & 16777215)) % ${1L << 48})"
    graft.dedup.Dedup.Mix48Muls.foldLeft(xs(inner))((e, a) => xs(mul(e, a)))
  }

  /** q22 oracle: the full MinHash(64)+LSH(16×4) pipeline in SQL — same
    * hash params as the Spark side (one generator), so signatures, band
    * buckets, the candidate set, and the verified pairs all agree
    * exactly. Band-hash collisions only add candidates, which the exact
    * Jaccard verification rejects identically on both engines. */
  /** q22's CTE chain (minhash signatures -> banded candidates -> exact
    * Jaccard verify) — shared with the q157 caption-dedup replay. */
  private lazy val q22Ctes: String = {
    val sigItems = graft.dedup.Dedup.hashParamsPublic(64).map { case (a, b) =>
      s"list_min(list_transform(shs, h -> ($a * h + $b) % $Mod40))"
    }.mkString(",\n    ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM corpus0),
       |shingled AS (
       |  SELECT doc_id, list_distinct(${duckShingles("ts", 3)}) AS shingles
       |  FROM toks),
       |hashed AS (
       |  SELECT doc_id, shingles, list_transform(shingles, s -> ${duckPolyHash("s", 1L << 31)}) AS shs
       |  FROM shingled),
       |sigs AS (
       |  SELECT doc_id, shingles, [$sigItems] AS sig FROM hashed),
       |banded AS (
       |  SELECT doc_id, b.band AS band,
       |    list_reduce(list_prepend(0::BIGINT, sig[b.band * 4 + 1 : b.band * 4 + 4]),
       |      (acc, v) -> (acc * 1000003 + v) % $Mod40) AS bhash
       |  FROM sigs, (SELECT unnest(range(0, 16)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
       |j AS (
       |  SELECT c.id_a, c.id_b,
       |    len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jac
       |  FROM cand c JOIN sigs a ON a.doc_id = c.id_a JOIN sigs b ON b.doc_id = c.id_b)""".stripMargin
  }

  /** q163 oracle: the union corpus (documents + prefix variants)
    * bound into the q22 chain; the exact arm brute-joins the staged
    * shingle sets (500k pairs at gate scale — oracle-side only, the
    * engine uses the inverted join), the banded arm is `j` at the
    * audit threshold, both bucketed by the same integer arithmetic. */
  private lazy val q163Oracle: String =
    s"""WITH corpus0 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    array_to_string(ts[1:greatest(3, (len(ts) * (20 + (doc_id % 13) * 6)) // 100)], ' ')
       |  FROM (SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |        FROM documents)
       |  WHERE len(ts) > 0),
       |$q22Ctes,
       |exact AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jac0
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.shingles, b.shingles)) > 0),
       |e AS (
       |  SELECT id_a, id_b, round(round(jac0, 4) * 10000)::BIGINT AS jbp
       |  FROM exact WHERE jac0 >= 0.2),
       |bd AS (SELECT id_a, id_b FROM j WHERE jac >= 0.2),
       |g AS (
       |  SELECT e.jbp // 500 AS bucket, count(*) AS n_exact,
       |    sum(CASE WHEN bd.id_a IS NOT NULL THEN 1 ELSE 0 END) AS n_banded
       |  FROM e LEFT JOIN bd ON e.id_a = bd.id_a AND e.id_b = bd.id_b
       |  GROUP BY 1)
       |SELECT (bucket * 500)::BIGINT AS bucket_lo_bp, n_exact::BIGINT AS n_exact,
       |  n_banded::BIGINT AS n_banded,
       |  ((10000 * n_banded) // n_exact)::BIGINT AS recall_bp
       |FROM g""".stripMargin

  /** The plain-documents corpus binding for [[q22Ctes]]. */
  private val corpusDocs: String =
    "corpus0 AS (SELECT doc_id, text FROM documents)"

  private lazy val q22Oracle: String =
    s"""WITH $corpusDocs,
       |$q22Ctes
       |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.7""".stripMargin

  /** q135's CTE chain (Gopher measures + conjunctive keep) — shared
    * with the q157 caption-quality replay. */
  private lazy val gopherCtes: String =
    """w AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(trim(coalesce(text, ''))), ' '), x -> x != '') AS ws,
      |    list_filter(list_transform(string_split(coalesce(text, ''), chr(10)), x -> trim(x)), x -> x != '') AS ls
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    len(ws)::BIGINT AS n_words,
      |    (CASE WHEN len(ws) > 0 THEN (1000 * list_sum(list_transform(ws, x -> length(x)))) // len(ws) ELSE 0 END)::BIGINT AS mean_word_len_milli,
      |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...')))) // len(ws) ELSE 0 END)::BIGINT AS symbol_bp,
      |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•')))) // len(ls) ELSE 0 END)::BIGINT AS bullet_bp,
      |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> ends_with(x, '...')))) // len(ls) ELSE 0 END)::BIGINT AS ellipsis_bp,
      |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))) // len(ws) ELSE 0 END)::BIGINT AS alpha_bp,
      |    len(list_filter(list_distinct(ws), x -> list_contains(['the','be','to','of','and','that','have','with'], x)))::BIGINT AS n_stop_hits
      |  FROM w),
      |gk AS (
      |  SELECT doc_id, n_words, mean_word_len_milli, symbol_bp, bullet_bp,
      |    ellipsis_bp, alpha_bp, n_stop_hits,
      |    (CASE WHEN n_words >= 50 AND n_words <= 100000
      |          AND mean_word_len_milli >= 3000 AND mean_word_len_milli <= 10000
      |          AND symbol_bp <= 1000 AND bullet_bp <= 9000
      |          AND ellipsis_bp <= 3000 AND alpha_bp >= 8000
      |          AND n_stop_hits >= 2 THEN 1 ELSE 0 END)::BIGINT AS keep
      |  FROM m)""".stripMargin

  private lazy val q135Oracle: String =
    s"""WITH $gopherCtes
       |SELECT doc_id, n_words, mean_word_len_milli, symbol_bp, bullet_bp,
       |  ellipsis_bp, alpha_bp, n_stop_hits, keep
       |FROM gk""".stripMargin

  /** q157 oracle: the q137 pHash closure (image clusters), the q22
    * minhash chain + the same recursive closure (caption clusters),
    * and the q135 keep — composed with the query's exact drop-reason
    * precedence. All three replays are the already-gated oracles of
    * their standalone queries; only the composition is new. */
  private lazy val q157Oracle: String =
    s"""WITH RECURSIVE $duckPhashCtes,
       |$corpusDocs,
       |$q22Ctes,
       |$gopherCtes,
       |ph2 AS (
       |  -- the query truncates doc_id % 23 = 5 payloads to the 8-byte
       |  -- magic before decode: those ids have no hash and can join no
       |  -- image cluster (the engine's ok=1 filter, restated closed-form)
       |  SELECT * FROM ph WHERE doc_id % 23 <> 5),
       |ie AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ph2 a JOIN ph2 b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.h, b.h)) <= 5),
       |iund AS (SELECT id_a AS u, id_b AS v FROM ie UNION SELECT id_b, id_a FROM ie),
       |ireach AS (
       |  SELECT u, u AS label FROM (SELECT DISTINCT u FROM iund) t
       |  UNION
       |  SELECT iund.u, r.label FROM iund JOIN ireach r ON iund.v = r.u),
       |icl AS (SELECT u, min(label) AS cluster_id FROM ireach GROUP BY u),
       |ce AS (SELECT id_a, id_b FROM j WHERE jac >= 0.7),
       |cund AS (SELECT id_a AS u, id_b AS v FROM ce UNION SELECT id_b, id_a FROM ce),
       |creach AS (
       |  SELECT u, u AS label FROM (SELECT DISTINCT u FROM cund) t
       |  UNION
       |  SELECT cund.u, r.label FROM cund JOIN creach r ON cund.v = r.u),
       |ccl AS (SELECT u, min(label) AS cluster_id FROM creach GROUP BY u),
       |f AS (
       |  SELECT d.doc_id,
       |    coalesce(icl.cluster_id, d.doc_id) AS img_cluster,
       |    coalesce(ccl.cluster_id, d.doc_id) AS cap_cluster,
       |    (CASE WHEN gk.n_words >= 50 AND gk.n_words <= 100000
       |          AND gk.mean_word_len_milli >= 3000 AND gk.mean_word_len_milli <= 10000
       |          AND gk.symbol_bp <= 1000 AND gk.bullet_bp <= 9000
       |          AND gk.ellipsis_bp <= 3000 AND gk.alpha_bp >= 8000
       |          THEN 1 ELSE 0 END) AS keep
       |  FROM documents d
       |  LEFT JOIN icl ON icl.u = d.doc_id
       |  LEFT JOIN ccl ON ccl.u = d.doc_id
       |  JOIN gk ON gk.doc_id = d.doc_id)
       |SELECT doc_id,
       |  (CASE WHEN doc_id % 23 <> 5 AND keep = 1
       |        AND img_cluster = doc_id AND cap_cluster = doc_id
       |        THEN 1 ELSE 0 END)::BIGINT AS kept,
       |  CASE WHEN doc_id % 23 = 5 THEN 'image_undecodable'
       |       WHEN keep = 0 THEN 'caption_quality'
       |       WHEN cap_cluster <> doc_id THEN 'caption_dup'
       |       WHEN img_cluster <> doc_id THEN 'image_dup'
       |       ELSE '' END AS drop_reason,
       |  img_cluster::BIGINT AS img_cluster, cap_cluster::BIGINT AS cap_cluster
       |FROM f""".stripMargin

  /** q23 oracle: SimHash(48) + hamming ≤ 3 within source blocks. The
    * Spark side's 4-band bucketing is pigeonhole-exact for maxDist ≤ 3
    * (some band always matches), so the oracle needs no LSH replication —
    * a plain blocked self-join on the reproducible signatures is the same
    * output set. */
  private lazy val q23Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source AS blk,
       |    list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS dts
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, blk,
       |    ${duckMix48(s"""list_transform(dts, tok -> ${duckPolyHash("tok", 1L << 48)})""")} AS th
       |  FROM t),
       |s AS (
       |  SELECT doc_id, blk,
       |    list_sum(list_transform(range(0, 48), b ->
       |      CASE WHEN len(list_filter(th, x -> x % (1::BIGINT << (b + 1)) >= (1::BIGINT << b))) * 2 > len(th)
       |           THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS sh
       |  FROM h)
       |SELECT x.doc_id AS id_a, y.doc_id AS id_b, bit_count(xor(x.sh, y.sh))::BIGINT AS hamming_dist
       |FROM s x JOIN s y ON x.blk = y.blk AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.sh, y.sh)) <= 3""".stripMargin

  /** q30 oracle: the multi-table hyperplane-LSH pipeline in SQL. The ±1
    * plane weights are emitted as literals from the same deterministic
    * generator as the Spark side; dot products are sequential double
    * accumulation on both engines (bit-exact — the q24/q25 pattern), so
    * the sign bits, bucket ids, candidate set, and verified pairs agree
    * exactly. Candidate test is "any of the 8 tables' buckets match". */
  private lazy val q30Oracle: String = {
    val planes = graft.ann.Ann.planeWeights(64, 64) // 8 tables × 8 planes
    def planeLit(w: Seq[Double]): String =
      w.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    def dotExpr(v: String, w: Seq[Double]): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip($v, ${planeLit(w)}), " +
        "x -> x[1]::DOUBLE * x[2]::DOUBLE)), (p, q) -> p + q)"
    val buckets = (0 until 8).map { t =>
      val bits = (0 until 8).map { j =>
        s"(CASE WHEN ${dotExpr("embedding", planes(t * 8 + j))} >= 0 THEN ${1 << (7 - j)} ELSE 0 END)"
      }.mkString("\n      + ")
      s"($bits) AS bk$t"
    }.mkString(",\n    ")
    val anyMatch = (0 until 8).map(t => s"a.bk$t = b.bk$t").mkString(" OR ")
    val pairDot = "list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)), (p, q) -> p + q)"
    s"""WITH bk AS (
       |  SELECT vec_id, embedding,
       |    $buckets
       |  FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($pairDot, 3) AS cos
       |FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ($anyMatch)
       |WHERE round($pairDot, 3) >= 0.4""".stripMargin
  }

  /** q31 oracle: the stub media decoder in SQL — UTF-8 payload bytes
    * recovered from the blob's hex dump, the 48-bit modular byte fold,
    * one avalanche application (staged through lateral column aliases),
    * and the exact k/2^16 − 1/2 first feature. No rounding anywhere:
    * every value is exactly representable on both engines. */
  private lazy val q31Oracle: String = {
    val sh = graft.dedup.Dedup.Mix48Shift
    val mixCols = {
      var cur = "h0"; var i = 0
      val sb = new StringBuilder
      def xs(): Unit = {
        i += 1; sb.append(s",\n    xor($cur, $cur >> $sh) AS h$i"); cur = s"h$i"
      }
      def mul(a: Long): Unit = {
        i += 1
        sb.append(s",\n    ((($a * ($cur >> 24)) % 16777216) * 16777216 + " +
          s"$a * ($cur & 16777215)) % ${1L << 48} AS h$i")
        cur = s"h$i"
      }
      xs(); graft.dedup.Dedup.Mix48Muls.foreach { a => mul(a); xs() }
      (sb.toString, cur)
    }
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
       |    encode(text) AS payload
       |  FROM documents),
       |b AS (
       |  SELECT media_id, kind, octet_length(payload)::BIGINT AS n_bytes,
       |    list_transform(range(1, octet_length(payload) + 1), i ->
       |      strpos('123456789abcdef', substr(lower(hex(payload)), 2*i-1, 1)) * 16 +
       |      strpos('123456789abcdef', substr(lower(hex(payload)), 2*i, 1))) AS bytes
       |  FROM m),
       |f AS (
       |  SELECT media_id, kind, n_bytes,
       |    list_reduce(list_prepend(${graft.multimodal.Multimodal.StubSeed}::BIGINT, bytes),
       |      (acc, c) -> (acc * 31 + c) % ${1L << 48}) AS h0${mixCols._1}
       |  FROM b)
       |SELECT media_id, kind, n_bytes,
       |  ((${mixCols._2} & 65535) / 65536.0 - 0.5) AS f0
       |FROM f""".stripMargin
  }

  /** q39 oracle: the contamination audit — token hashes, arithmetic
    * 3-gram fingerprints, distinct (source, fp) postings, co-occurrence
    * counts, exact Jaccard. */
  private lazy val q39Oracle: String = {
    s"""WITH toks AS (
       |  SELECT source, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT source, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks),
       |sh AS (
       |  SELECT source, unnest(list_distinct(
       |    CASE WHEN len(th) >= 3 THEN list_transform(range(1, len(th) - 1), i -> ${duckShingleFold("th[i:i+2]")})
       |         WHEN len(th) > 0 THEN [${duckShingleFold("th")}]
       |         ELSE []::BIGINT[] END)) AS h
       |  FROM th),
       |p AS (
       |  SELECT DISTINCT source, h FROM sh),
       |sizes AS (SELECT source, count(*) AS n FROM p GROUP BY source),
       |co AS (
       |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_shared
       |  FROM p x JOIN p y ON x.h = y.h AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT co.src_a, co.src_b, co.n_shared::BIGINT AS n_shared,
       |  round(co.n_shared::DOUBLE / (a.n + b.n - co.n_shared), 4) AS jaccard
       |FROM co JOIN sizes a ON a.source = co.src_a JOIN sizes b ON b.source = co.src_b""".stripMargin
  }

  /** q40 oracle: repeated-bigram stats with the same shingle semantics
    * and floor-scaled basis points. */
  private lazy val q40Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |sh AS (SELECT doc_id, ${duckShingles("ts", 2)} AS s FROM toks)
       |SELECT doc_id, len(s) AS n_2grams, len(list_distinct(s)) AS n_distinct_2grams,
       |  CASE WHEN len(s) > 0
       |       THEN floor((len(s) - len(list_distinct(s))) * 10000.0 / len(s))::BIGINT
       |       ELSE 0 END AS rep_bp
       |FROM sh""".stripMargin

  /** q41 oracle: same deterministic PII injection, same RE2-compatible
    * patterns, and the polynomial fingerprint of the redacted text. */
  private lazy val q41Oracle: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    s"""WITH inj AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.org or 555-0199-2233 from 10.0.81.7' AS t
       |  FROM documents),
       |red AS (
       |  SELECT doc_id, t,
       |    regexp_replace(regexp_replace(regexp_replace(t,
       |      '$email', '[PII]', 'g'),
       |      '$phone', '[PII]', 'g'),
       |      '$ipv4', '[PII]', 'g') AS rt
       |  FROM inj)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_emails,
       |  len(regexp_extract_all(t, '$phone')) AS n_phones,
       |  len(regexp_extract_all(t, '$ipv4')) AS n_ips,
       |  ${duckPolyHash("replace(lower(trim(rt)), ' ', '')", 1L << 40)} AS redacted_fp
       |FROM red""".stripMargin
  }

  /** q42 oracle: the same affine-spread polynomial key hash drives
    * membership (see ScaleOps.sampleBucket). */
  private lazy val q42Oracle: String =
    s"""SELECT doc_id, source FROM documents
       |WHERE ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
       |  % ${1L << 31}) % 10000 < 2500""".stripMargin

  /** q43 oracle: connected components as a recursive transitive-closure
    * CTE over the q21 pair set (string shingles on the oracle side, the
    * collision-free-verified hashed sets on the Spark side — same
    * pairs), min reachable id per node. */
  /** The q21-pair transitive closure as CTE text — shared by q43
    * (clusters) and q86 (soft-dedup weights over those clusters). */
  private lazy val q43Ctes: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, source,
       |         list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS ws
       |  FROM documents),
       |e AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
       |        (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8),
       |und AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
       |reach AS (
       |  SELECT u, u AS label FROM (SELECT DISTINCT u FROM und) t
       |  UNION
       |  SELECT und.u, r.label FROM und JOIN reach r ON und.v = r.u)""".stripMargin

  private lazy val q43Oracle: String =
    s"""$q43Ctes
       |SELECT u AS doc_id, min(label)::BIGINT AS cluster_id FROM reach GROUP BY u""".stripMargin

  /** q86 oracle: cluster sizes over the q43 closure, floored inverse
    * weight, every document surfaced (unclustered docs weigh 10000). */
  private lazy val q86Oracle: String =
    s"""$q43Ctes,
       |cl AS (SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u),
       |sz AS (SELECT cluster_id, count(*) AS n FROM cl GROUP BY cluster_id),
       |j AS (SELECT cl.doc_id, sz.n FROM cl JOIN sz USING (cluster_id))
       |SELECT d0.doc_id, coalesce(j.n, 1)::BIGINT AS cluster_size,
       |  (10000 // coalesce(j.n, 1))::BIGINT AS weight_bp
       |FROM documents d0 LEFT JOIN j USING (doc_id)""".stripMargin

  /** q87 oracle: DSIR weights replayed in SQL — raw (non-src0) vs
    * target (src0) token counts, full-outer vocabulary join, add-1
    * smoothing both sides, per-token floored millinat log-ratio, plain
    * integer sum per document, every raw document surfaced. The CTE
    * chain is shared with q89 (budgeted selection over the weights). */
  private lazy val q87Ctes: String =
    s"""WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
       |inst AS (
       |  SELECT doc_id, unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM rawd),
       |cr AS (SELECT tok, count(*) AS r FROM inst GROUP BY tok),
       |ct AS (
       |  SELECT tok, count(*) AS t FROM (
       |    SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |    FROM documents WHERE source = 'src0') GROUP BY tok),
       |j AS (
       |  SELECT tok, coalesce(r, 0) AS r, coalesce(t, 0) AS t
       |  FROM cr FULL OUTER JOIN ct USING (tok)),
       |tt AS (SELECT count(*) AS v, sum(r) AS nr, sum(t) AS nt FROM j),
       |s AS (
       |  SELECT j.tok,
       |    floor(1000.0 * ln(((j.t + 1) * (tt.nr + tt.v))::DOUBLE
       |      / ((j.r + 1) * (tt.nt + tt.v))::DOUBLE))::BIGINT AS s
       |  FROM j, tt),
       |sums AS (
       |  SELECT inst.doc_id, count(*) AS n_tokens, sum(s.s)::BIGINT AS ssum
       |  FROM inst JOIN s USING (tok) GROUP BY inst.doc_id),
       |dsirw AS (
       |  SELECT r.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       |    coalesce(ssum, 0)::BIGINT AS dsir_milli
       |  FROM rawd r LEFT JOIN sums USING (doc_id))""".stripMargin

  private lazy val q87Oracle: String =
    s"""$q87Ctes
       |SELECT doc_id, n_tokens, dsir_milli FROM dsirw""".stripMargin

  /** q89 oracle: the budgeted prefix of the q87 ranking — window
    * cumsum over (dsir_milli desc, doc_id), kept while ≤ 20000. */
  private lazy val q89Oracle: String =
    s"""$q87Ctes,
       |c AS (
       |  SELECT doc_id, n_tokens, dsir_milli,
       |    sum(n_tokens) OVER (ORDER BY dsir_milli DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
       |  FROM dsirw)
       |SELECT doc_id, n_tokens, dsir_milli, cum_tokens
       |FROM c WHERE cum_tokens <= 20000""".stripMargin

  /** q90/q91 shared BM25 CTE chain: corpus postings (tf, dl), the
    * integer avgdl quantization A=⌊100·T/D⌋, the 8-token probe terms
    * (every 25th document, mirroring retrievalProbes token-exactly),
    * query-vocab df, and the integer-exact BM25 score with an
    * unfiltered rank — consumers cut at their own k. */
  private lazy val duckBm25Ctes: String =
    s"""WITH dlt AS (
       |  SELECT doc_id AS id,
       |    list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |dl AS (SELECT id, ts, len(ts)::BIGINT AS dl FROM dlt),
       |post AS (
       |  SELECT id, dl, tok, count(*)::BIGINT AS tf FROM (
       |    SELECT id, dl, unnest(ts) AS tok FROM dl) GROUP BY 1, 2, 3),
       |tot AS (
       |  SELECT count(*)::BIGINT AS d_docs,
       |    (CASE WHEN count(*) = 0 THEN 1
       |          ELSE (100 * coalesce(sum(dl), 0)) // count(*) END)::BIGINT AS a_cdl
       |  FROM dl),
       |probe AS (
       |  SELECT id AS query_id, ts[2:9] AS qt FROM dl
       |  WHERE id % 25 = 0 AND len(ts) >= 9),
       |qterm AS (SELECT DISTINCT query_id, unnest(qt) AS tok FROM probe),
       |dfq AS (
       |  SELECT p.tok, count(*)::BIGINT AS df FROM post p
       |  WHERE p.tok IN (SELECT tok FROM qterm) GROUP BY 1),
       |sc AS (
       |  SELECT q.query_id, p.id,
       |    sum(floor(1000.0 * ln((2 * t.d_docs + 2)::DOUBLE
       |          / (2 * d.df + 1)::DOUBLE))::BIGINT
       |      * ((22000 * p.tf * t.a_cdl)
       |          // (10 * p.tf * t.a_cdl + 3 * t.a_cdl + 900 * p.dl)))::BIGINT
       |      AS bm25_scaled
       |  FROM post p JOIN qterm q ON p.tok = q.tok JOIN dfq d ON p.tok = d.tok
       |  CROSS JOIN tot t
       |  GROUP BY 1, 2),
       |bmrank AS (
       |  SELECT query_id, id AS doc_id, bm25_scaled,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY bm25_scaled DESC, id) AS rank
       |  FROM sc WHERE bm25_scaled > 0)""".stripMargin

  /** q90 oracle: the BM25 chain cut at rank ≤ 10. */
  private lazy val q90Oracle: String =
    s"""$duckBm25Ctes
       |SELECT query_id, rank, doc_id, bm25_scaled
       |FROM bmrank WHERE rank <= 10""".stripMargin

  /** q96 oracle: the q90 scoring CTEs re-ranked AFTER excluding the
    * probe's own source document (bmrank ranks the full list, so the
    * exclusion must precede its window — the sc CTE is the shared
    * cut point). */
  private lazy val q96Oracle: String =
    s"""$duckBm25Ctes
       |SELECT query_id, rank, doc_id, bm25_scaled FROM (
       |  SELECT query_id, id AS doc_id, bm25_scaled,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY bm25_scaled DESC, id) AS rank
       |  FROM sc WHERE bm25_scaled > 0 AND id <> query_id) t
       |WHERE rank <= 5""".stripMargin

  /** q94 oracle: the q43 pair CTE (`e`, extended with both endpoint
    * texts) judged by DuckDB's levenshtein — identical integer
    * similarity formula, floor division, empty-vs-empty = 10000. */
  private lazy val q94Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, coalesce(text, '') AS t,
       |         list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS ws
       |  FROM documents),
       |e AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    levenshtein(a.t, b.t)::BIGINT AS lev_dist,
       |    greatest(length(a.t), length(b.t))::BIGINT AS mx
       |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
       |        (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8)
       |SELECT id_a, id_b, lev_dist, sim_bp FROM (
       |  SELECT id_a, id_b, lev_dist,
       |    CASE WHEN mx = 0 THEN 10000
       |         ELSE 10000 - ((10000 * lev_dist) // mx) END AS sim_bp
       |  FROM e) t
       |WHERE sim_bp >= 9000""".stripMargin

  /** q95 oracle: the q43 closure's clusters, the shared quality-milli
    * fragment per document, singleton fallback to the doc's own id,
    * window argmax per cluster (ties on ascending doc id). */
  private lazy val q95Oracle: String = {
    val toks = "list_filter(string_split(lower(trim(text)), ' '), x -> x != '')"
    s"""$q43Ctes,
       |cl AS (SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u),
       |q AS (
       |  SELECT doc_id, ${duckQualityMilli("toks")}::BIGINT AS quality_milli
       |  FROM (SELECT doc_id, $toks AS toks FROM documents)),
       |j AS (
       |  SELECT q.doc_id, coalesce(cl.cluster_id, q.doc_id)::BIGINT AS cluster_id,
       |         q.quality_milli
       |  FROM q LEFT JOIN cl USING (doc_id)),
       |r AS (
       |  SELECT cluster_id, doc_id, quality_milli,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_milli DESC, doc_id) AS rn
       |  FROM j)
       |SELECT cluster_id, doc_id, quality_milli FROM r WHERE rn = 1""".stripMargin
  }

  /** q97 oracle: half-split token slices, DuckDB's 1-based inclusive
    * list slicing mirroring Spark's slice(ts, 1, m) / slice(ts, m+1,
    * n−m) exactly. */
  private lazy val q97Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, ts, len(ts) AS n, len(ts) // 2 AS m
       |  FROM t WHERE len(ts) >= 8)
       |SELECT doc_id,
       |  array_to_string(ts[1:m], ' ') AS anchor_text,
       |  array_to_string(ts[m+1:n], ' ') AS positive_text,
       |  m::BIGINT AS n_anchor, (n - m)::BIGINT AS n_positive
       |FROM s""".stripMargin

  /** q98 oracle: the same single float composition
    * ⌊1000·exp(0.7·ln c)⌋ over integer token counts, then pure BIGINT
    * normalization — the tfIdfTopTerms floor-boundary argument covers
    * the one libm step. */
  private lazy val q98Oracle: String =
    s"""WITH c AS (
       |  SELECT source,
       |    sum(coalesce(len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')), 0))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source),
       |e AS (
       |  SELECT source, n_tokens,
       |    CASE WHEN n_tokens > 0
       |         THEN floor(1000.0 * exp(0.7 * ln(n_tokens)))::BIGINT
       |         ELSE 0 END AS em
       |  FROM c),
       |t AS (SELECT sum(em)::BIGINT AS em_total FROM e)
       |SELECT source, n_tokens,
       |  (CASE WHEN em_total > 0 THEN (10000::HUGEINT * em) // em_total ELSE 0 END)::BIGINT AS weight_bp
       |FROM e CROSS JOIN t""".stripMargin

  /** q99 oracle: the q51 surprisal chain, interior quartile boundaries
    * via quantile_cont rounded to 4 decimals (q34's parity
    * discipline), value-banded stage assignment. */
  private lazy val q99Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents),
       |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
       |tot AS (SELECT sum(c)::BIGINT AS total FROM c),
       |s AS (
       |  SELECT t.doc_id,
       |    floor(1000.0 * ln(tot.total::DOUBLE / c.c))::BIGINT AS si
       |  FROM t JOIN c USING (tok) CROSS JOIN tot),
       |sc AS (
       |  SELECT doc_id, (sum(si)::BIGINT // count(*)) AS surprisal_milli
       |  FROM s GROUP BY doc_id),
       |b AS (
       |  SELECT list_transform(quantile_cont(surprisal_milli, [0.25, 0.5, 0.75]),
       |    x -> round(x, 4)) AS bs
       |  FROM sc)
       |SELECT doc_id, surprisal_milli,
       |  (1 + len(list_filter(b.bs, x -> surprisal_milli > x)))::BIGINT AS stage
       |FROM sc CROSS JOIN b""".stripMargin

  /** q100 oracle: the q94 pair CTE joined twice against the q71 split
    * formula; pairs with differing labels survive. */
  private lazy val q100Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS ws
       |  FROM documents),
       |e AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
       |        (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |    ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
       |      % ${1L << 31}) % 10000 AS b
       |    FROM documents) t)
       |SELECT e.id_a, e.id_b, sa.split AS split_a, sb.split AS split_b
       |FROM e JOIN sp sa ON sa.doc_id = e.id_a JOIN sp sb ON sb.doc_id = e.id_b
       |WHERE sa.split <> sb.split""".stripMargin

  /** q101 oracle: positional bigram extraction (q73's indexing), exact
    * unigram/bigram counts, the identically-ordered double ratio under
    * one floored ln, cutoff before ranking. */
  private lazy val q101Oracle: String =
    s"""WITH t AS (
       |  SELECT list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
       |  FROM documents),
       |u AS (SELECT unnest(ts) AS tok FROM t),
       |uc AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
       |p AS (
       |  SELECT ts[i] AS tok_a, ts[i + 1] AS tok_b
       |  FROM t, unnest(range(1, len(ts))) AS r(i)
       |  WHERE len(ts) >= 2),
       |bc AS (SELECT tok_a, tok_b, count(*) AS cb FROM p GROUP BY 1, 2),
       |tt AS (
       |  SELECT (SELECT sum(c) FROM uc)::BIGINT AS tu,
       |         (SELECT sum(cb) FROM bc)::BIGINT AS tb),
       |s AS (
       |  SELECT b.tok_a, b.tok_b, b.cb AS n_pair,
       |    floor(1000.0 * ln(b.cb::DOUBLE * tt.tu * tt.tu
       |      / (tt.tb::DOUBLE * ua.c * ub.c)))::BIGINT AS pmi_milli
       |  FROM bc b JOIN uc ua ON ua.tok = b.tok_a
       |            JOIN uc ub ON ub.tok = b.tok_b
       |  CROSS JOIN tt
       |  WHERE b.cb >= 5)
       |SELECT tok_a, tok_b, n_pair::BIGINT AS n_pair, pmi_milli FROM s
       |ORDER BY pmi_milli DESC, tok_a, tok_b LIMIT 25""".stripMargin

  /** q102 oracle: q76's shingle-fp replay at width 5, then the
    * winnowing selection — per window of 4, the minimum fp at its
    * rightmost position, deduplicated. */
  private lazy val q102Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 5),
       |f AS (
       |  SELECT doc_id, list_transform(range(1, len(th) - 3), i -> ${duckShingleFold("th[i:i+4]")}) AS fps
       |  FROM th),
       |wl AS (SELECT doc_id, fps, least(4, len(fps)) AS wl FROM f),
       |sel AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(fps) - wl + 2), i ->
       |    {'pos': i + list_max(list_filter(range(0, wl),
       |       j -> fps[i + j] = list_min(fps[i:i + wl - 1]))),
       |     'fp': list_min(fps[i:i + wl - 1])})) AS u
       |  FROM wl)
       |SELECT DISTINCT doc_id, u.pos::BIGINT AS pos, u.fp AS fp FROM sel""".stripMargin

  /** q103 oracle: one winnowing chain (q102's) carrying the source,
    * split per side, per-side df-cap, fp join, shared-count cut. */
  private lazy val q103Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, source, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 5),
       |f AS (
       |  SELECT doc_id, source, list_transform(range(1, len(th) - 3), i -> ${duckShingleFold("th[i:i+4]")}) AS fps
       |  FROM th),
       |wl AS (SELECT doc_id, source, fps, least(4, len(fps)) AS wl FROM f),
       |sel AS (
       |  SELECT doc_id, source, unnest(list_transform(range(1, len(fps) - wl + 2), i ->
       |    list_min(fps[i:i + wl - 1]))) AS fp
       |  FROM wl),
       |wa AS (SELECT DISTINCT doc_id AS id_a, fp FROM sel WHERE source = 'src0'),
       |wb AS (SELECT DISTINCT doc_id AS id_b, fp FROM sel WHERE source <> 'src0'),
       |ra AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM wa GROUP BY fp) t WHERE c <= 1000),
       |rb AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM wb GROUP BY fp) t WHERE c <= 1000),
       |ja AS (SELECT id_a, fp FROM wa JOIN ra USING (fp)),
       |jb AS (SELECT id_b, fp FROM wb JOIN rb USING (fp))
       |SELECT id_a, id_b, count(*)::BIGINT AS n_shared_fps
       |FROM ja JOIN jb USING (fp)
       |GROUP BY id_a, id_b HAVING count(*) >= 2""".stripMargin

  /** q104 oracle: per-source interpolated percentiles of token
    * counts, q34's round-to-4 parity discipline, NULL text = 0. */
  private lazy val q104Oracle: String =
    s"""SELECT source, count(*)::BIGINT AS n_docs,
       |  round(quantile_cont(n, 0.25), 4) AS p25_tokens,
       |  round(quantile_cont(n, 0.5), 4) AS p50_tokens,
       |  round(quantile_cont(n, 0.75), 4) AS p75_tokens,
       |  round(quantile_cont(n, 0.9), 4) AS p90_tokens
       |FROM (SELECT source,
       |  coalesce(len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')), 0) AS n
       |  FROM documents) t
       |GROUP BY source""".stripMargin

  /** The q105 encode replay as shared CTE text (t→i→vc→v→e→g2:
    * positional tokens, frequency-rank top-16 vocabulary, OOV
    * fallback to id 16, per-doc id list in position order) — ONE copy
    * consumed by q105 (per-doc encode) and q106 (per-pack assembly);
    * same single-source rule as duckPackChain. */
  private lazy val duckEncodeChain: String =
    s"""t AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
       |  FROM documents),
       |i AS (
       |  SELECT doc_id, p.i AS pos, ts[p.i] AS tok
       |  FROM t, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) p),
       |vc AS (SELECT tok, count(*) AS c FROM i GROUP BY tok),
       |v AS (
       |  SELECT tok, (row_number() OVER (ORDER BY c DESC, tok) - 1)::BIGINT AS vid
       |  FROM vc QUALIFY vid < 16),
       |e AS (
       |  SELECT i.doc_id, i.pos, coalesce(v.vid, 16) AS vid
       |  FROM i LEFT JOIN v USING (tok)),
       |g2 AS (
       |  SELECT doc_id, list(vid ORDER BY pos) AS ids, count(*)::BIGINT AS n_tokens,
       |    sum(CASE WHEN vid = 16 THEN 1 ELSE 0 END)::BIGINT AS n_oov
       |  FROM e GROUP BY doc_id)""".stripMargin

  /** q105 oracle: the shared encode chain, ids as CSV, every document
    * surfaced. */
  private lazy val q105Oracle: String =
    s"""WITH $duckEncodeChain
       |SELECT d.doc_id,
       |  array_to_string(coalesce(g2.ids, []::BIGINT[]), ',') AS ids_csv,
       |  coalesce(g2.n_tokens, 0)::BIGINT AS n_tokens,
       |  coalesce(g2.n_oov, 0)::BIGINT AS n_oov
       |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN g2 USING (doc_id)""".stripMargin

  /** q106 oracle: the q56 recursive pack replay (bucket/bin/rn per
    * doc) joined with the q105 encode chain, members re-listed in
    * fold order (rn), ids flattened and boundary offsets prefix-
    * summed per pack. */
  private lazy val q106Oracle: String = {
    s"""WITH RECURSIVE $duckPackChain,
       |$duckEncodeChain,
       |binm AS (
       |  SELECT r.bucket, r.bin, r.rn, r.n,
       |    coalesce(g2.ids, []::BIGINT[]) AS ids
       |  FROM r LEFT JOIN g2 USING (doc_id)),
       |packs AS (
       |  SELECT bucket, bin,
       |    list(ids ORDER BY rn) AS idss, list(n ORDER BY rn) AS ns,
       |    count(*) AS n_docs, sum(n) AS n_tokens
       |  FROM binm GROUP BY bucket, bin)
       |SELECT bucket::BIGINT AS pack_bucket, bin::BIGINT AS pack_bin,
       |  array_to_string(flatten(idss), ',') AS ids_csv,
       |  array_to_string(list_transform(range(1, len(ns) + 1),
       |    i -> coalesce(list_sum(ns[1:i-1]), 0)::BIGINT), ',') AS boundaries_csv,
       |  n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens
       |FROM packs""".stripMargin
  }

  /** q107 oracle: the Naive Bayes chain replayed in SQL — weak labels
    * from the source column, per-token two-class counts, add-1 over
    * the joint vocabulary, floored millinat log-odds per token, class
    * prior from document counts, plain integer sum per document, every
    * document surfaced (token-less docs carry the bare prior). */
  /** Shared q107/q115 CTE chain: weak labels, NB training counts,
    * prior, scored vocabulary, per-doc sums — ONE copy consumed by the
    * score gate (q107) and the calibration audit (q115). */
  private lazy val duckNbCtes: String =
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    CASE WHEN source IN ('src0','src1','src2','src3')
       |         THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |inst AS (
       |  SELECT doc_id, y,
       |    unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM base),
       |voc AS (
       |  SELECT tok,
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS c0
       |  FROM inst GROUP BY tok),
       |tt AS (SELECT count(*)::BIGINT AS v, sum(c1)::BIGINT AS t1,
       |  sum(c0)::BIGINT AS t0 FROM voc),
       |pr AS (
       |  SELECT floor(1000.0 * ln(
       |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::DOUBLE /
       |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::DOUBLE))::BIGINT AS prior_milli
       |  FROM base),
       |s AS (
       |  SELECT voc.tok,
       |    floor(1000.0 * ln(((voc.c1 + 1) * (tt.t0 + tt.v))::DOUBLE
       |      / ((voc.c0 + 1) * (tt.t1 + tt.v))::DOUBLE))::BIGINT AS s
       |  FROM voc, tt),
       |sums AS (
       |  SELECT inst.doc_id, count(*)::BIGINT AS n_tokens,
       |    sum(s.s)::BIGINT AS ssum
       |  FROM inst JOIN s USING (tok) GROUP BY inst.doc_id)""".stripMargin

  private lazy val q107Oracle: String =
    s"""$duckNbCtes
       |SELECT b.doc_id, b.y::BIGINT AS label,
       |  coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       |  (coalesce(ssum, 0) + pr.prior_milli)::BIGINT AS nb_milli,
       |  (CASE WHEN coalesce(ssum, 0) + pr.prior_milli > 0
       |        THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM base b LEFT JOIN sums USING (doc_id), pr""".stripMargin

  /** q116 oracle: q98's temperature-weight chain → per-source budgets
    * of a 20k-token total, the shared NB scoring chain → per-doc
    * scores, then the per-source budget prefix as one window cumsum
    * (the oracle's single window IS the semantics the bucketed
    * engine-side cumsum reproduces). */
  private lazy val q116Oracle: String =
    s"""$duckNbCtes,
       |tc AS (
       |  SELECT source,
       |    sum(coalesce(len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')), 0))::BIGINT AS src_toks
       |  FROM documents GROUP BY source),
       |te AS (
       |  SELECT source,
       |    CASE WHEN src_toks > 0
       |         THEN floor(1000.0 * exp(0.7 * ln(src_toks)))::BIGINT
       |         ELSE 0 END AS em
       |  FROM tc),
       |tt2 AS (SELECT sum(em)::BIGINT AS em_total FROM te),
       |bud AS (
       |  SELECT source,
       |    ((20000 * (CASE WHEN em_total > 0
       |        THEN (10000::HUGEINT * em) // em_total ELSE 0 END)::BIGINT)
       |      // 10000)::BIGINT AS token_budget
       |  FROM te CROSS JOIN tt2),
       |scd AS (
       |  SELECT b.doc_id, d.source,
       |    coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       |    (coalesce(ssum, 0) + pr.prior_milli)::BIGINT AS nb_milli
       |  FROM base b LEFT JOIN sums USING (doc_id)
       |  CROSS JOIN pr
       |  JOIN documents d ON d.doc_id = b.doc_id),
       |cm AS (
       |  SELECT doc_id, source, n_tokens, nb_milli,
       |    sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY nb_milli DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
       |  FROM scd)
       |SELECT cm.doc_id, cm.source, cm.n_tokens, cm.nb_milli, cm.cum_tokens
       |FROM cm JOIN bud USING (source)
       |WHERE cum_tokens <= token_budget""".stripMargin

  /** q115 oracle: the q107 scoring chain bucketed into clamped
    * 2000-millinat calibration bins (the floor division runs in double
    * on both engines — IEEE division of exact integers is correctly
    * rounded, so boundary multiples land exactly) with per-bin label
    * rates. */
  private lazy val q115Oracle: String =
    s"""$duckNbCtes,
       |sc AS (
       |  SELECT b.y::BIGINT AS label,
       |    (coalesce(ssum, 0) + pr.prior_milli)::BIGINT AS nb_milli
       |  FROM base b LEFT JOIN sums USING (doc_id), pr),
       |bk AS (
       |  SELECT label,
       |    least(greatest(floor(nb_milli / 2000.0), -5), 5)::BIGINT AS bucket
       |  FROM sc)
       |SELECT bucket, count(*)::BIGINT AS n_docs, sum(label)::BIGINT AS n_pos,
       |  ((10000 * sum(label)) // count(*))::BIGINT AS pos_bp
       |FROM bk GROUP BY 1""".stripMargin

  /** Shared q108/q110 CTE: every embedding's 16 JL projection
    * coordinates as one double list — plane literals emitted from the
    * same generator as the Spark side (the q30 pattern, offset 64).
    * ONE copy consumed by q108 (floored-milli rendering) and q110
    * (coarse ANN scan) — the single-source rule. */
  private lazy val duckProjChain: String = {
    val planes = graft.ann.Ann.planeWeights(64 + 16, 64).drop(64)
    def planeLit(w: Seq[Double]): String =
      w.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val coords = planes.map { w =>
      duckDot("embedding", planeLit(w))
    }.mkString(",\n    ")
    s"""proj AS (
       |  SELECT vec_id,
       |    [$coords] AS p
       |  FROM embeddings)""".stripMargin
  }

  /** q108 oracle: the shared projection chain, coordinates floored to
    * integer millis and rendered as CSV. */
  private lazy val q108Oracle: String =
    s"""WITH $duckProjChain
       |SELECT vec_id,
       |  array_to_string(list_transform(p, x -> floor(1000.0 * x)::BIGINT), ',') AS proj_csv
       |FROM proj""".stripMargin

  /** q110 oracle: both stages of the projected-rescore ANN — the
    * shared projection chain, the coarse double-dot candidate ranking
    * (bit-exact sequential folds on both engines), then the exact fp32
    * rescore and final top-k (q58's two-stage replay shape). */
  private lazy val q110Oracle: String =
    s"""WITH $duckProjChain,
       |q AS (SELECT vec_id AS query_id, p AS qp FROM proj WHERE vec_id < 5),
       |coarse AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("c.p", "q.qp")} AS coarse
       |  FROM proj c CROSS JOIN q WHERE c.vec_id != q.query_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crn
       |    FROM coarse) t WHERE crn <= 40),
       |resc AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(${duckDot("qe.embedding", "ce.embedding")}, 6) AS cos
       |  FROM cand
       |  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM resc) t WHERE rank <= 10""".stripMargin

  /** q111 oracle: the q91 fusion with the IVF arm — BM25 chain (shared)
    * + q38's cell-assignment CTEs + probe/candidate/top-20 for the
    * %25 query set, fused by the same integer RRF points. */
  private lazy val q111Oracle: String =
    s"""$duckBm25Ctes,
       |lex AS (SELECT query_id, doc_id, rank FROM bmrank WHERE rank <= 20),
       |$duckIvfCellsCtes,
       |ivq AS (
       |  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
       |  WHERE vec_id % 25 = 0),
       |ivp0 AS (
       |  SELECT q.query_id, q.q_vec, c.cid, ${duckDot("q.q_vec", "c.cvec")} AS d
       |  FROM ivq q CROSS JOIN cent c),
       |ivpr AS (
       |  SELECT query_id, q_vec, cell FROM (
       |    SELECT query_id, q_vec, cid AS cell,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d DESC, cid) AS prn
       |    FROM ivp0) t WHERE prn <= 4),
       |ivcand AS (
       |  SELECT ivpr.query_id, cells.vec_id AS doc_id,
       |    round(${duckDot("ivpr.q_vec", "cells.embedding")}, 6) AS cos
       |  FROM ivpr JOIN cells ON ivpr.cell = cells.cell
       |  WHERE cells.vec_id != ivpr.query_id),
       |sem AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, doc_id) AS rank
       |    FROM ivcand) t WHERE rank <= 20),
       |pts AS (
       |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |    coalesce(l.doc_id, s.doc_id) AS doc_id,
       |    (CASE WHEN l.rank IS NULL THEN 0 ELSE 1000000 // (60 + l.rank) END
       |     + CASE WHEN s.rank IS NULL THEN 0 ELSE 1000000 // (60 + s.rank) END
       |    )::BIGINT AS rrf_pts
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
       |SELECT query_id, rank, doc_id, rrf_pts FROM (
       |  SELECT query_id, doc_id, rrf_pts,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_pts DESC, doc_id) AS rank
       |  FROM pts) t WHERE rank <= 10""".stripMargin

  /** DuckDB fragment: the unrolled BPE learning chain — wt/s0 then,
    * per iteration i, pair counts p{i} (lateral unnest over adjacent
    * symbol positions), the argmax merge m{i} (same count DESC / l ASC
    * / r ASC tie-break), and the rewrite s{i} (the identical
    * wrap/replace/strip on the chr(31)-delimited segmentation; the
    * coalesce(chr(30)) pattern makes an exhausted m{i} a no-op, as on
    * the Spark side). */
  /** Body form for composition after other CTEs (no leading WITH);
    * `srcRel` is any relation providing a `text` column — the corpus
    * the vocabulary learns from. */
  private def duckBpeCtesBody(numMerges: Int, srcRel: String): String = {
    val d = "chr(31)"
    val dd = s"$d || $d"
    val head =
      s"""wt AS (
         |  SELECT tok AS word, count(*)::BIGINT AS freq FROM (
         |    SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
         |    FROM $srcRel) GROUP BY 1),
         |s0 AS MATERIALIZED (
         |  SELECT word, freq,
         |    array_to_string(string_split(word, ''), $dd) AS seg
         |  FROM wt)""".stripMargin
    val iters = (1 to numMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT sym[j] AS l, sym[j + 1] AS r, sum(freq)::BIGINT AS c
         |  FROM (SELECT string_split(seg, $dd) AS sym, freq FROM s${i - 1}) t,
         |       unnest(range(1, len(sym))) AS u(j)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT l, r, c FROM p$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT word, freq, substr(x, 2, length(x) - 2) AS seg FROM (
         |    SELECT word, freq, replace($d || seg || $d,
         |      coalesce((SELECT $d || l || $dd || r || $d FROM m$i), chr(30)),
         |      coalesce((SELECT $d || l || r || $d FROM m$i), chr(30))) AS x
         |    FROM s${i - 1}) t2)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  private def duckBpeCtes(numMerges: Int): String =
    "WITH " + duckBpeCtesBody(numMerges, "documents")

  /** q112 oracle: the merge table — one row per unrolled m{i}. */
  private lazy val q112Oracle: String = {
    val n = 8
    val rows = (1 to n).map(i =>
      s"SELECT $i::INTEGER AS merge_rank, l AS l_sym, r AS r_sym, " +
        s"c AS pair_count, l || r AS merged FROM m$i")
    s"""${duckBpeCtes(n)}
       |${rows.mkString("", "\nUNION ALL ", "")}""".stripMargin
  }

  /** q113 oracle: encode with the learned table — token instances with
    * positions join the final segmentation s8, subword streams
    * reassemble ordered, delimiter rewritten to spaces; every document
    * surfaces via the left join. */
  private lazy val q113Oracle: String = {
    val n = 8
    s"""${duckBpeCtes(n)},
       |btr AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |binst AS (
       |  SELECT doc_id, j AS pos, toks[j] AS word
       |  FROM btr, unnest(range(1, len(toks) + 1)) AS u(j)),
       |bencj AS (
       |  SELECT i.doc_id, i.pos, replace(s.seg, chr(31) || chr(31), ' ') AS sub
       |  FROM binst i JOIN s$n s ON i.word = s.word),
       |bagg AS (
       |  SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS sub_str,
       |    sum(len(string_split(sub, ' ')))::BIGINT AS n_sub
       |  FROM bencj GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.sub_str, '') AS sub_str,
       |  coalesce(a.n_sub, 0)::BIGINT AS n_sub
       |FROM documents d LEFT JOIN bagg a ON d.doc_id = a.doc_id""".stripMargin
  }

  /** q114 oracle: the unrolled BPE chain's final segmentation, subword
    * counts per word type, instance join, per-source fertility. */
  private lazy val q114Oracle: String =
    s"""${duckBpeCtes(8)},
       |fw AS (
       |  SELECT source,
       |    unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS word
       |  FROM documents),
       |fn AS (
       |  SELECT word, len(string_split(seg, chr(31) || chr(31)))::BIGINT AS nsub
       |  FROM s8),
       |fj AS (SELECT f.source, n.nsub FROM fw f JOIN fn n ON f.word = n.word)
       |SELECT source, count(*)::BIGINT AS n_words, sum(nsub)::BIGINT AS n_subwords,
       |  ((1000 * sum(nsub)) // count(*))::BIGINT AS fertility_milli
       |FROM fj GROUP BY 1""".stripMargin

  /** q145 oracle: the q114 fertility replay re-keyed by the q27
    * language argmax — same 8-merge BPE CTE chain, the dimension
    * column swaps from source to predicted_lang. */
  private lazy val q145Oracle: String =
    s"""${duckBpeCtes(8)},
       |lt AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |ld AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
       |         WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
       |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
       |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
       |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
       |         ELSE 'zh' END AS predicted_lang
       |  FROM (SELECT doc_id, toks,
       |    len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is','in','it'], x))) AS s_en,
       |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de,
       |    len(list_filter(toks, x -> list_contains(['el','los','las','una','es','y','que','por'], x))) AS s_es,
       |    len(list_filter(toks, x -> list_contains(['le','la','les','et','des','une','est','dans'], x))) AS s_fr,
       |    len(list_filter(toks, x -> list_contains(['的','了','是','我','在','不','有','人'], x))) AS s_zh
       |  FROM lt) t),
       |fw AS (SELECT predicted_lang, unnest(toks) AS word FROM ld),
       |fn AS (
       |  SELECT word, len(string_split(seg, chr(31) || chr(31)))::BIGINT AS nsub
       |  FROM s8),
       |fj AS (SELECT f.predicted_lang, n.nsub FROM fw f JOIN fn n ON f.word = n.word)
       |SELECT predicted_lang, count(*)::BIGINT AS n_words,
       |  sum(nsub)::BIGINT AS n_subwords,
       |  ((1000 * sum(nsub)) // count(*))::BIGINT AS fertility_milli
       |FROM fj GROUP BY 1""".stripMargin

  /** DuckDB fragment: one unigram-LM Viterbi pass as a RECURSIVE CTE —
    * per word, a maxPieceLen(=5)-deep window of best (negScore, count,
    * seg) states advances one character per iteration; candidates look
    * up piece scores in the `mname` one-row map CTE, and the best is
    * `list_min` under the struct's natural (ns, k, seg) field order —
    * exactly the engine kernel's total order (equal pos+k ⇒ equal seg
    * length, so VARCHAR order is piece-sequence order). */
  private def duckViterbi(name: String, mname: String): String = {
    val dd = "chr(31) || chr(31)"
    s"""$name AS (
       |  SELECT word, length(word)::BIGINT AS len, 0::BIGINT AS pos,
       |    [NULL, NULL, NULL, NULL, {ns: 0::BIGINT, k: 0::BIGINT, seg: ''}]::STRUCT(ns BIGINT, k BIGINT, seg VARCHAR)[] AS hist
       |  FROM wt
       |  UNION ALL
       |  SELECT word, len, pos + 1,
       |    hist[2:] || [list_min(list_filter(
       |      list_transform(range(1, least(5, pos + 1) + 1), j ->
       |        CASE WHEN hist[6 - j] IS NOT NULL
       |              AND len(element_at($mname.m, word[(pos + 2 - j)::INT:(pos + 1)::INT])) > 0
       |        THEN {ns: hist[6 - j].ns - element_at($mname.m, word[(pos + 2 - j)::INT:(pos + 1)::INT])[1],
       |              k: hist[6 - j].k + 1,
       |              seg: hist[6 - j].seg ||
       |                   CASE WHEN hist[6 - j].k = 0 THEN '' ELSE $dd END ||
       |                   word[(pos + 2 - j)::INT:(pos + 1)::INT]}
       |        END),
       |      x -> x IS NOT NULL))]
       |  FROM $name, $mname WHERE pos < len)""".stripMargin
  }

  /** DuckDB fragment: the q121 unigram-LM learning chain — word types,
    * substring seed (chars + top-200 by (c DESC, piece ASC)), milli
    * log-prob scores, Viterbi pass 1, usage recount, prune (chars +
    * top-120 by (u DESC, piece ASC)), add-1 rescore. Must head the
    * statement (WITH RECURSIVE). */
  private lazy val duckUnigramCtes: String =
    s"""WITH RECURSIVE
       |wt AS MATERIALIZED (
       |  SELECT tok AS word, count(*)::BIGINT AS freq FROM (
       |    SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |    FROM documents) GROUP BY 1),
       |usub AS MATERIALIZED (
       |  SELECT w.word[i::INT:(i + j - 1)::INT] AS piece, sum(w.freq)::BIGINT AS c
       |  FROM wt w,
       |       unnest(range(1, length(w.word) + 1)) AS u(i),
       |       unnest(range(1, least(5, length(w.word) - i + 1) + 1)) AS v(j)
       |  GROUP BY 1),
       |useedv AS MATERIALIZED (
       |  SELECT piece, c FROM usub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, c FROM (
       |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rn
       |    FROM usub WHERE length(piece) > 1) t WHERE rn <= 200),
       |ust AS (SELECT sum(c)::BIGINT AS t FROM useedv),
       |us1 AS MATERIALIZED (
       |  SELECT piece, floor(1000 * ln(c::DOUBLE / t))::BIGINT AS s FROM useedv, ust),
       |um1 AS MATERIALIZED (SELECT map(list(piece), list(s)) AS m FROM us1),
       |${duckViterbi("udp1", "um1")},
       |ufin1 AS (SELECT word, hist[5] AS st FROM udp1 WHERE pos = len),
       |uuse AS MATERIALIZED (
       |  SELECT piece, sum(freq)::BIGINT AS u FROM (
       |    SELECT w.freq, unnest(string_split(f.st.seg, chr(31) || chr(31))) AS piece
       |    FROM ufin1 f JOIN wt w USING (word)) t
       |  GROUP BY 1),
       |ukept AS MATERIALIZED (
       |  SELECT s.piece, coalesce(u.u, 0)::BIGINT AS u
       |  FROM (SELECT piece FROM useedv WHERE length(piece) = 1) s
       |  LEFT JOIN uuse u USING (piece)
       |  UNION ALL
       |  SELECT piece, u FROM (
       |    SELECT piece, u, row_number() OVER (ORDER BY u DESC, piece ASC) AS rn
       |    FROM uuse WHERE length(piece) > 1) t WHERE rn <= 120),
       |ukt AS (SELECT sum(u)::BIGINT AS tu, count(*)::BIGINT AS v FROM ukept),
       |uvocab AS MATERIALIZED (
       |  SELECT piece, u AS usage,
       |    floor(1000 * ln((u + 1)::DOUBLE / (tu + v)))::BIGINT AS score_milli
       |  FROM ukept, ukt)""".stripMargin

  /** q121 oracle: the learned unigram-LM vocabulary. */
  private lazy val q121Oracle: String =
    s"""$duckUnigramCtes
       |SELECT piece, usage, score_milli FROM uvocab""".stripMargin

  /** q122 oracle: Viterbi pass 2 under the final vocabulary, then the
    * q113 instance-join assembly (shared encode semantics). */
  private lazy val q122Oracle: String =
    s"""$duckUnigramCtes,
       |um2 AS MATERIALIZED (SELECT map(list(piece), list(score_milli)) AS m FROM uvocab),
       |${duckViterbi("udp2", "um2")},
       |ufin2 AS MATERIALIZED (
       |  SELECT word, replace(hist[5].seg, chr(31) || chr(31), ' ') AS sub
       |  FROM udp2 WHERE pos = len),
       |utr AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |uinst AS (
       |  SELECT doc_id, j AS pos, toks[j] AS word
       |  FROM utr, unnest(range(1, len(toks) + 1)) AS u(j)),
       |uencj AS (
       |  SELECT i.doc_id, i.pos, s.sub
       |  FROM uinst i JOIN ufin2 s ON i.word = s.word),
       |uagg AS (
       |  SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS sub_str,
       |    sum(len(string_split(sub, ' ')))::BIGINT AS n_sub
       |  FROM uencj GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.sub_str, '') AS sub_str,
       |  coalesce(a.n_sub, 0)::BIGINT AS n_sub
       |FROM documents d LEFT JOIN uagg a ON d.doc_id = a.doc_id""".stripMargin

  /** q123 oracle: Viterbi pass 2's piece counts (hist[5].k carries
    * them), instance join, per-source fertility — q114's assembly
    * under the unigram vocabulary. */
  private lazy val q123Oracle: String =
    s"""$duckUnigramCtes,
       |um2 AS MATERIALIZED (SELECT map(list(piece), list(score_milli)) AS m FROM uvocab),
       |${duckViterbi("udp2", "um2")},
       |ufk AS MATERIALIZED (
       |  SELECT word, hist[5].k AS nsub FROM udp2 WHERE pos = len),
       |ufw AS (
       |  SELECT source,
       |    unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS word
       |  FROM documents),
       |ufj AS (SELECT f.source, n.nsub FROM ufw f JOIN ufk n ON f.word = n.word)
       |SELECT source, count(*)::BIGINT AS n_words, sum(nsub)::BIGINT AS n_subwords,
       |  ((1000 * sum(nsub)) // count(*))::BIGINT AS fertility_milli
       |FROM ufj GROUP BY 1""".stripMargin

  /** q109 oracle: exact-token blocklist hits, basis-point density
    * (floored), ≤5% keep verdict. */
  private lazy val q109Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, len(ts)::BIGINT AS n_tokens,
       |    len(list_filter(ts, x -> list_contains(['slow','leak','crash'], x)))::BIGINT AS n_hits
       |  FROM t)
       |SELECT doc_id, n_tokens, n_hits,
       |  (CASE WHEN n_tokens > 0 THEN (n_hits * 10000) // n_tokens
       |        ELSE 0 END)::BIGINT AS hit_bp,
       |  (CASE WHEN (CASE WHEN n_tokens > 0 THEN (n_hits * 10000) // n_tokens
       |        ELSE 0 END) <= 500 THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM h""".stripMargin

  /** q91 oracle: BM25 top-20 (shared chain) ∪ exact-cosine top-20
    * (q25's sequential-dot discipline), fused by integer RRF points
    * ⌊10⁶/(60+rank)⌋, final top-10 per query. */
  private lazy val q91Oracle: String =
    s"""$duckBm25Ctes,
       |lex AS (SELECT query_id, doc_id, rank FROM bmrank WHERE rank <= 20),
       |qv AS (
       |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id % 25 = 0),
       |coss AS (
       |  SELECT q.query_id, c.vec_id AS doc_id,
       |    round(${duckDot("q.qe", "c.embedding")}, 6) AS cos
       |  FROM qv q CROSS JOIN embeddings c WHERE q.query_id != c.vec_id),
       |sem AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, doc_id) AS rank
       |    FROM coss) t WHERE rank <= 20),
       |pts AS (
       |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |    coalesce(l.doc_id, s.doc_id) AS doc_id,
       |    (CASE WHEN l.rank IS NULL THEN 0 ELSE 1000000 // (60 + l.rank) END
       |     + CASE WHEN s.rank IS NULL THEN 0 ELSE 1000000 // (60 + s.rank) END
       |    )::BIGINT AS rrf_pts
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
       |SELECT query_id, rank, doc_id, rrf_pts FROM (
       |  SELECT query_id, doc_id, rrf_pts,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_pts DESC, doc_id) AS rank
       |  FROM pts) t WHERE rank <= 10""".stripMargin

  /** q88 oracle: hashed-bigram DSIR replayed in SQL — q73's bigram
    * generation + q28's 40-bit polyHash chain, bucketed mod 4096,
    * add-1 smoothing over the FIXED bucket space (denominators
    * N+4096), floored millinat log-ratio, integer sum per document,
    * every raw document surfaced (sub-2-token docs at 0). */
  private lazy val q88Oracle: String =
    s"""WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
       |tr AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM rawd),
       |pr AS (
       |  SELECT doc_id,
       |    (list_reduce(list_prepend(0::BIGINT,
       |       list_transform(string_split(toks[i] || ' ' || toks[i + 1], ''), ch -> ascii(ch)::BIGINT)),
       |     (a, c) -> (a * 31 + c) % 1099511627776)) % 4096 AS b
       |  FROM tr, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |tg AS (
       |  SELECT list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents WHERE source = 'src0'),
       |pt AS (
       |  SELECT
       |    (list_reduce(list_prepend(0::BIGINT,
       |       list_transform(string_split(toks[i] || ' ' || toks[i + 1], ''), ch -> ascii(ch)::BIGINT)),
       |     (a, c) -> (a * 31 + c) % 1099511627776)) % 4096 AS b
       |  FROM tg, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |cr AS (SELECT b, count(*) AS r FROM pr GROUP BY b),
       |ct AS (SELECT b, count(*) AS t FROM pt GROUP BY b),
       |j AS (
       |  SELECT b, coalesce(r, 0) AS r, coalesce(t, 0) AS t
       |  FROM cr FULL OUTER JOIN ct USING (b)),
       |tt AS (SELECT sum(r) AS nr, sum(t) AS nt FROM j),
       |s AS (
       |  SELECT j.b,
       |    floor(1000.0 * ln(((j.t + 1) * (tt.nr + 4096))::DOUBLE
       |      / ((j.r + 1) * (tt.nt + 4096))::DOUBLE))::BIGINT AS s
       |  FROM j, tt),
       |sums AS (
       |  SELECT pr.doc_id, count(*) AS n_bigrams, sum(s.s)::BIGINT AS ssum
       |  FROM pr JOIN s USING (b) GROUP BY pr.doc_id)
       |SELECT r.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
       |  coalesce(ssum, 0)::BIGINT AS dsir_milli
       |FROM rawd r LEFT JOIN sums USING (doc_id)""".stripMargin

  /** q44 oracle: same tf/df/N aggregation, same floor-scaled score and
    * (score desc, token asc) ranking. */
  private lazy val q44Oracle: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(list_filter(string_split(lower(trim(text)), ' '), t -> t != '')) AS tok
       |  FROM documents),
       |tf AS (SELECT source, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT source) AS n FROM documents),
       |s AS (
       |  SELECT tf.source, tf.tok, tf.tf,
       |    (tf.tf * floor(1000 * ln(n.n::DOUBLE / df.df))::BIGINT) AS score
       |  FROM tf JOIN df USING (tok) CROSS JOIN n)
       |SELECT source, rank, tok AS term, tf, score FROM (
       |  SELECT source, tok, tf, score,
       |    row_number() OVER (PARTITION BY source ORDER BY score DESC, tok) AS rank
       |  FROM s) t
       |WHERE rank <= 5""".stripMargin

  /** q45 oracle: the curation core in SQL — same quality formula,
    * repetition filter, redaction chain, keep-min exact dedup, and the
    * polynomial fingerprint of the surviving text. */
  /** The q45 core-curation chain (quality gate → redaction → exact
    * dedup) as composable CTE text ending in `d` (keep = rn = 1) —
    * ONE copy consumed by q45 and the q146 token-delivery composition;
    * CTE names t/sh/q/f/r/d are reserved by it. */
  private lazy val duckCurationCtes: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    s"""t AS (
       |  SELECT doc_id, source, text,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |sh AS (SELECT doc_id, source, text, toks, ${duckShingles("toks", 2)} AS s2 FROM t),
       |q AS (
       |  SELECT doc_id, source, text,
       |    ${duckQualityMilli("toks")} AS qm,
       |    CASE WHEN len(s2) > 0
       |         THEN floor((len(s2) - len(list_distinct(s2))) * 10000.0 / len(s2))::BIGINT
       |         ELSE 0 END AS rep_bp
       |  FROM sh),
       |f AS (SELECT doc_id, source, text FROM q WHERE qm >= 560 AND rep_bp <= 5000),
       |r AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '[PII]', 'g'),
       |      '$phone', '[PII]', 'g'),
       |      '$ipv4', '[PII]', 'g') AS text
       |  FROM f),
       |d AS (
       |  SELECT doc_id, source, text,
       |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |  FROM r)""".stripMargin
  }

  private lazy val q45Oracle: String =
    s"""WITH $duckCurationCtes
       |SELECT doc_id, source, ${duckPolyHash("replace(lower(trim(text)), ' ', '')", 1L << 40)} AS fp40
       |FROM d WHERE rn = 1""".stripMargin

  /** q146 oracle: the FULL token-delivery replay — the q45 curation
    * chain, the 8-merge BPE learn unrolled over the CURATED text, the
    * q113 per-doc encode (no char-fallback arm: the vocabulary was
    * learned from the same corpus, so every word is in s8), the q55
    * stream cumsum and the q56 recursive greedy pack on SUBWORD
    * counts, and the q78 manifest fingerprints — one row per curated
    * doc. CTE names: t/sh/q/f/r/d belong to the curation chain and
    * wt/s{i}/p{i}/m{i} to the BPE learn; the pack fold is `pk` here
    * to stay clear of the curation chain's `r`. */
  private lazy val q146Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    val width = ((1L << 48) + 7) / 8
    s"""WITH RECURSIVE $duckCurationCtes,
       |cur AS (SELECT doc_id, text FROM d WHERE rn = 1),
       |${duckBpeCtesBody(8, "cur")},
       |btr AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM cur),
       |binst AS (
       |  SELECT doc_id, j AS pos, toks[j] AS word
       |  FROM btr, unnest(range(1, len(toks) + 1)) AS u(j)),
       |bencj AS (
       |  SELECT i.doc_id, i.pos, replace(s.seg, chr(31) || chr(31), ' ') AS sub
       |  FROM binst i JOIN s8 s ON i.word = s.word),
       |bagg AS (
       |  SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS sub_str,
       |    sum(len(string_split(sub, ' ')))::BIGINT AS n_sub
       |  FROM bencj GROUP BY 1),
       |enc AS (
       |  SELECT c.doc_id, coalesce(a.sub_str, '') AS sub_str,
       |    coalesce(a.n_sub, 0)::BIGINT AS n
       |  FROM cur c LEFT JOIN bagg a ON c.doc_id = a.doc_id),
       |h0 AS (
       |  SELECT doc_id, n,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM enc),
       |mx AS (SELECT doc_id, n, h$chain FROM h0),
       |sc AS (
       |  SELECT doc_id, n,
       |    coalesce(sum(n) OVER (ORDER BY $mixed, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM mx),
       |bk AS (
       |  SELECT doc_id, n, ($mixed // $width) AS bucket,
       |    row_number() OVER (PARTITION BY ($mixed // $width)
       |      ORDER BY $mixed, doc_id) AS brn
       |  FROM mx),
       |pk AS (
       |  SELECT bucket, brn, doc_id, n, 0::BIGINT AS bin, n AS fill
       |  FROM bk WHERE brn = 1
       |  UNION ALL
       |  SELECT bk.bucket, bk.brn, bk.doc_id, bk.n,
       |    CASE WHEN pk.fill + bk.n <= 16384 THEN pk.bin ELSE pk.bin + 1 END,
       |    CASE WHEN pk.fill + bk.n <= 16384 THEN pk.fill + bk.n ELSE bk.n END
       |  FROM bk JOIN pk ON bk.bucket = pk.bucket AND bk.brn = pk.brn + 1),
       |mf AS (
       |  SELECT pk.bucket AS pack_bucket, pk.bin AS pack_bin,
       |    count(*)::BIGINT AS shard_docs, sum(pk.n)::BIGINT AS shard_tokens,
       |    bit_xor($mixed)::BIGINT AS shard_fp
       |  FROM pk JOIN mx ON pk.doc_id = mx.doc_id
       |  GROUP BY 1, 2)
       |SELECT e.doc_id, e.n AS n_sub,
       |  ${duckPolyHash("e.sub_str", 1L << 40)} AS sub_fp,
       |  (sc.excl // 256)::BIGINT AS bin_id, (sc.excl % 256)::BIGINT AS bin_pos,
       |  pk.bucket::BIGINT AS pack_bucket, pk.bin::BIGINT AS pack_bin,
       |  mf.shard_docs, mf.shard_tokens, mf.shard_fp,
       |  1::BIGINT AS manifest_ok
       |FROM enc e
       |JOIN sc ON e.doc_id = sc.doc_id
       |JOIN pk ON e.doc_id = pk.doc_id
       |JOIN mf ON pk.bucket = mf.pack_bucket AND pk.bin = mf.pack_bin""".stripMargin
  }

  /** q49 oracle: the FULL curation pipeline — the q45 core (quality gate,
    * redaction, exact dedup), then MinHash(64)+LSH(16×4) near-dup pairs
    * at 0.85 on the redacted text (same hash params as the Spark side →
    * bit-equal candidates), connected components as a recursive closure
    * keeping the minimum id per cluster, NOT EXISTS decontamination
    * against the doc_id%7 eval fixture's fingerprints, and the q42
    * deterministic 25% sample filter. */
  private lazy val q49Oracle: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val sigItems = graft.dedup.Dedup.hashParamsPublic(64).map { case (a, b) =>
      s"list_min(list_transform(shs, h -> ($a * h + $b) % $Mod40))"
    }.mkString(",\n    ")
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, source, text,
       |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
       |  FROM documents),
       |sh AS (SELECT doc_id, source, text, toks, ${duckShingles("toks", 2)} AS s2 FROM t),
       |q AS (
       |  SELECT doc_id, source, text,
       |    ${duckQualityMilli("toks")} AS qm,
       |    CASE WHEN len(s2) > 0
       |         THEN floor((len(s2) - len(list_distinct(s2))) * 10000.0 / len(s2))::BIGINT
       |         ELSE 0 END AS rep_bp
       |  FROM sh),
       |f AS (SELECT doc_id, source, text FROM q WHERE qm >= 560 AND rep_bp <= 5000),
       |r AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '[PII]', 'g'),
       |      '$phone', '[PII]', 'g'),
       |      '$ipv4', '[PII]', 'g') AS text
       |  FROM f),
       |core AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text,
       |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |    FROM r) dd WHERE rn = 1),
       |ctoks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
       |  FROM core),
       |cshing AS (
       |  SELECT doc_id, list_distinct(${duckShingles("ts", 3)}) AS shingles FROM ctoks),
       |chash AS (
       |  SELECT doc_id, shingles, list_transform(shingles, s -> ${duckPolyHash("s", 1L << 31)}) AS shs
       |  FROM cshing),
       |csigs AS (SELECT doc_id, shingles, [$sigItems] AS sig FROM chash),
       |cband AS (
       |  SELECT doc_id, b.band AS band,
       |    list_reduce(list_prepend(0::BIGINT, sig[b.band * 4 + 1 : b.band * 4 + 4]),
       |      (acc, v) -> (acc * 1000003 + v) % $Mod40) AS bhash
       |  FROM csigs, (SELECT unnest(range(0, 16)) AS band) b),
       |ccand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM cband x JOIN cband y ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
       |cpairs AS (
       |  SELECT c.id_a, c.id_b FROM ccand c
       |  JOIN csigs a ON a.doc_id = c.id_a JOIN csigs b ON b.doc_id = c.id_b
       |  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
       |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.85),
       |und AS (SELECT id_a AS u, id_b AS v FROM cpairs UNION SELECT id_b, id_a FROM cpairs),
       |reach AS (
       |  SELECT u, u AS label FROM (SELECT DISTINCT u FROM und) s0
       |  UNION
       |  SELECT und.u, rr.label FROM und JOIN reach rr ON und.v = rr.u),
       |dropids AS (
       |  SELECT u AS doc_id FROM reach GROUP BY u HAVING min(label) != u),
       |evfp AS (
       |  SELECT DISTINCT ${duckPolyHash("replace(lower(trim(text)), ' ', '')", 1L << 40)} AS fp,
       |    length(replace(lower(trim(text)), ' ', '')) AS nl
       |  FROM documents WHERE doc_id % 7 = 0),
       |clean AS (
       |  SELECT c.doc_id, c.source, c.text,
       |    ${duckPolyHash("replace(lower(trim(c.text)), ' ', '')", 1L << 40)} AS fp40
       |  FROM core c
       |  WHERE NOT EXISTS (SELECT 1 FROM dropids dr WHERE dr.doc_id = c.doc_id)
       |    AND NOT EXISTS (SELECT 1 FROM evfp e WHERE e.fp =
       |      ${duckPolyHash("replace(lower(trim(c.text)), ' ', '')", 1L << 40)}
       |      AND e.nl = length(replace(lower(trim(c.text)), ' ', ''))))
       |SELECT doc_id, source, fp40 FROM clean
       |WHERE ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
       |  % ${1L << 31}) % 10000 < 2500""".stripMargin
  }

  /** Scalar lateral-alias-chain replica of the Mix48 avalanche over an
    * input column named `h` (same constants, same split-multiply
    * arithmetic as [[duckMix48]]'s list form): returns the SELECT
    * fragment to append after `h` and the name of the final mixed
    * column. Shared by every oracle that orders or buckets by the mixed
    * hash (q46/q53/q55/q56). */
  private lazy val duckMix48Scalar: (String, String) = {
    val sh = graft.dedup.Dedup.Mix48Shift
    var cur = "h"; var i = 0
    val sb = new StringBuilder
    def xs(): Unit = { i += 1; sb.append(s",\n  xor($cur, $cur >> $sh) AS m$i"); cur = s"m$i" }
    def mul(a: Long): Unit = {
      i += 1
      sb.append(s",\n  ((($a * ($cur >> 24)) % 16777216) * 16777216 + " +
        s"$a * ($cur & 16777215)) % ${1L << 48} AS m$i")
      cur = s"m$i"
    }
    xs(); graft.dedup.Dedup.Mix48Muls.foreach { a => mul(a); xs() }
    (sb.toString, cur)
  }

  /** q147 oracle: the q53 shuffle replay per epoch — the ordering hash
    * salts the key with the epoch number, positions are dense per
    * epoch partition. */
  private lazy val q147Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH ep AS (
       |  SELECT doc_id, e.e AS epoch FROM documents, range(0, 3) AS e(e)),
       |h0 AS (
       |  SELECT doc_id, epoch,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)", 1L << 48)} AS h
       |  FROM ep),
       |mx AS (SELECT doc_id, epoch, h$chain FROM h0)
       |SELECT doc_id, epoch::BIGINT AS epoch,
       |  (row_number() OVER (PARTITION BY epoch ORDER BY $mixed, doc_id) - 1)::BIGINT AS epoch_pos
       |FROM mx""".stripMargin
  }

  /** q53 oracle: the avalanche-mixed ordering hash as a scalar lateral-
    * alias chain (q46's pattern, same Mix48 constants), then the global
    * row_number. */
  private lazy val q53Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH h0 AS (
       |  SELECT doc_id, source,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM documents),
       |mx AS (SELECT doc_id, source, h$chain FROM h0)
       |SELECT doc_id, source,
       |  row_number() OVER (ORDER BY $mixed, doc_id) - 1 AS shuffle_pos
       |FROM mx""".stripMargin
  }

  /** q55 oracle: same mixed-hash shuffle order, then the global
    * EXCLUSIVE token cumsum (the concatenated stream's first-token
    * offset per document) and its floor-div/mod split into context
    * windows — pure window arithmetic, every value an integer. */
  private lazy val q55Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH h0 AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS n,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM documents),
       |mx AS (SELECT doc_id, n, h$chain FROM h0),
       |c AS (
       |  SELECT doc_id, n,
       |    coalesce(sum(n) OVER (ORDER BY $mixed, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM mx)
       |SELECT doc_id, n::BIGINT AS n_tokens,
       |  (excl // 256)::BIGINT AS bin_id, (excl % 256)::BIGINT AS bin_pos
       |FROM c""".stripMargin
  }

  /** Shared by q131 (plain WARC walk) and q155 (.warc.zst: identical
    * corpus zstd-compressed per container — the inflate layer must be
    * invisible to record semantics, so the SAME closed-form oracle
    * applies verbatim). */
  private lazy val warcRecordsOracle: String =
    """SELECT doc_id AS media_id, 0::INTEGER AS rec_index, 1::INTEGER AS ok,
      |  'warcinfo' AS warc_type, '' AS url, 0::INTEGER AS http_status,
      |  'software: graft' || chr(13) || chr(10) AS body
      |FROM documents
      |UNION ALL
      |SELECT doc_id AS media_id, 1::INTEGER AS rec_index,
      |  (CASE WHEN doc_id % 4 = 2 THEN 0 ELSE 1 END)::INTEGER AS ok,
      |  CASE WHEN doc_id % 4 = 2 THEN '' ELSE 'response' END AS warc_type,
      |  CASE WHEN doc_id % 4 = 2 THEN ''
      |       ELSE 'http://site' || (doc_id % 7) || '.example/doc' || doc_id || '.html'
      |  END AS url,
      |  (CASE WHEN doc_id % 4 = 2 THEN 0 ELSE 200 END)::INTEGER AS http_status,
      |  CASE WHEN doc_id % 4 = 2 THEN '' ELSE coalesce(text, '') END AS body
      |FROM documents""".stripMargin

  /** q153 oracle: the q55 exclusive cumsum, then each document's
    * window-intersection rows over a generated bin range (fixed
    * uncorrelated range + BETWEEN filter — DuckDB's range() rejects
    * correlated bounds) with the same interval arithmetic. */
  private lazy val q153Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH h0 AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS n,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM documents),
       |mx AS (SELECT doc_id, n, h$chain FROM h0),
       |c AS (
       |  SELECT doc_id, n,
       |    coalesce(sum(n) OVER (ORDER BY $mixed, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
       |  FROM mx),
       |g AS (SELECT unnest(range(0,
       |  (SELECT (1 + sum(n) // 256)::BIGINT FROM h0))) AS i),
       |s AS (
       |  SELECT c.doc_id, c.n, g.i AS bin_id, c.excl FROM c JOIN g
       |    ON g.i BETWEEN c.excl // 256 AND (c.excl + c.n - 1) // 256
       |  WHERE c.n > 0)
       |SELECT doc_id, n::BIGINT AS n_tokens, bin_id::BIGINT AS bin_id,
       |  greatest(excl - bin_id * 256, 0)::BIGINT AS bin_start,
       |  greatest(bin_id * 256 - excl, 0)::BIGINT AS doc_off,
       |  (least(excl + n, (bin_id + 1) * 256)
       |    - greatest(excl, bin_id * 256))::BIGINT AS span_tokens
       |FROM s""".stripMargin
  }

  /** q56 oracle: the greedy first-fit fold replayed as a recursive CTE —
    * per mixed-hash bucket (8 buckets, the Spark side's numBuckets),
    * rows in (mixed, doc_id) order carry (bin, fill) state forward one
    * row per recursion step. Recursion depth = max rows per bucket. */
  /** The q56 greedy-pack replay as shared CTE text (h0→mx→b→r: token
    * counts, avalanche-mixed id hash, bucket + fold order, the
    * recursive bin fold at 256 tokens / 8 buckets) — ONE copy consumed
    * by q56 (per-doc assignment), q78 (per-bin manifest rollup), and
    * q106 (per-bin sequence assembly); a drifting second copy of the
    * fold would silently desynchronize those gates. Prepend
    * `WITH RECURSIVE`. */
  private lazy val duckPackChain: String = {
    val (chain, mixed) = duckMix48Scalar
    val width = ((1L << 48) + 7) / 8
    s"""h0 AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS n,
       |    ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 48)} AS h
       |  FROM documents),
       |mx AS (SELECT doc_id, n, h$chain FROM h0),
       |b AS (
       |  SELECT doc_id, n, ($mixed // $width) AS bucket,
       |    row_number() OVER (PARTITION BY ($mixed // $width)
       |      ORDER BY $mixed, doc_id) AS rn
       |  FROM mx),
       |r AS (
       |  SELECT bucket, rn, doc_id, n, 0::BIGINT AS bin, n AS fill
       |  FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.bucket, b.rn, b.doc_id, b.n,
       |    CASE WHEN r.fill + b.n <= 256 THEN r.bin ELSE r.bin + 1 END,
       |    CASE WHEN r.fill + b.n <= 256 THEN r.fill + b.n ELSE b.n END
       |  FROM b JOIN r ON b.bucket = r.bucket AND b.rn = r.rn + 1)""".stripMargin
  }

  private lazy val q56Oracle: String =
    s"""WITH RECURSIVE $duckPackChain
       |SELECT doc_id, n::BIGINT AS n_tokens,
       |  bucket::BIGINT AS pack_bucket, bin::BIGINT AS pack_bin
       |FROM r""".stripMargin

  /** q78 oracle: q56's recursive-CTE pack replay rolled up per
    * (bucket, bin) — counts, token sums, and the bit_xor of each
    * member's avalanche-mixed id hash (re-joined from the mx frame). */
  private lazy val q78Oracle: String = {
    val (_, mixed) = duckMix48Scalar
    s"""WITH RECURSIVE $duckPackChain
       |SELECT r.bucket::BIGINT AS pack_bucket, r.bin::BIGINT AS pack_bin,
       |  count(*)::BIGINT AS n_docs, sum(r.n)::BIGINT AS n_tokens,
       |  bit_xor($mixed)::BIGINT AS ids_fp
       |FROM r JOIN mx ON r.doc_id = mx.doc_id
       |GROUP BY r.bucket, r.bin""".stripMargin
  }

  /** q57 oracle: the boilerplate-coverage pipeline — token hashes,
    * 40-bit arithmetic shingle fingerprints (q39's fragments), the
    * df ≥ 3 frequent set, and per-document instance coverage in floored
    * basis points. */
  private lazy val q57Oracle: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks),
       |f AS (
       |  SELECT doc_id,
       |    CASE WHEN len(th) >= 3 THEN list_transform(range(1, len(th) - 1), i -> ${duckShingleFold("th[i:i+2]")})
       |         WHEN len(th) > 0 THEN [${duckShingleFold("th")}]
       |         ELSE []::BIGINT[] END AS fps
       |  FROM th),
       |inst AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       |freq AS (
       |  SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS df FROM inst GROUP BY fp) t
       |  WHERE df >= 3),
       |hits AS (
       |  SELECT i.doc_id, count(*) AS h FROM inst i JOIN freq USING (fp) GROUP BY i.doc_id)
       |SELECT f.doc_id, len(f.fps)::BIGINT AS n_shingles,
       |  CASE WHEN len(f.fps) > 0
       |       THEN floor(coalesce(h.h, 0) * 10000.0 / len(f.fps))::BIGINT
       |       ELSE 0 END AS boilerplate_bp
       |FROM f LEFT JOIN hits h ON f.doc_id = h.doc_id""".stripMargin
  }

  /** q76 oracle: span-level dedup — q57's shingle-fingerprint replay at
    * width 5, the df ≥ 2 duplicated-window set, then the
    * gaps-and-islands extent merge in plain window SQL. */
  private lazy val q76Oracle: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 5),
       |f AS (
       |  SELECT doc_id, list_transform(range(1, len(th) - 3), i -> ${duckShingleFold("th[i:i+4]")}) AS fps
       |  FROM th),
       |inst AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(fps) + 1),
       |    i -> {'pos': i, 'fp': fps[i]})) AS u
       |  FROM f),
       |i2 AS (SELECT doc_id, u.pos::BIGINT AS pos, u.fp AS fp FROM inst),
       |dup AS (
       |  SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS d FROM i2 GROUP BY fp) t
       |  WHERE d >= 2),
       |h AS (SELECT doc_id, pos FROM i2 JOIN dup USING (fp)),
       |b AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
       |         THEN 1 ELSE 0 END AS brk
       |  FROM h),
       |isl AS (
       |  SELECT doc_id, pos, sum(brk) OVER (
       |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM b)
       |SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 4)::BIGINT AS span_end,
       |  (max(pos) + 4 - min(pos) + 1)::BIGINT AS span_tokens,
       |  count(*)::BIGINT AS n_dup_shingles
       |FROM isl GROUP BY doc_id, island""".stripMargin
  }

  /** q80 oracle: q76's extent pipeline, then position-level excision —
    * every token position not covered by an extent of its document
    * survives; kept tokens re-join by position order. */
  private lazy val q80Oracle: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 5),
       |f AS (
       |  SELECT doc_id, list_transform(range(1, len(th) - 3), i -> ${duckShingleFold("th[i:i+4]")}) AS fps
       |  FROM th),
       |inst AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(fps) + 1),
       |    i -> {'pos': i, 'fp': fps[i]})) AS u
       |  FROM f),
       |i2 AS (SELECT doc_id, u.pos::BIGINT AS pos, u.fp AS fp FROM inst),
       |dup AS (
       |  SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS d FROM i2 GROUP BY fp) t
       |  WHERE d >= 2),
       |h AS (SELECT doc_id, pos FROM i2 JOIN dup USING (fp)),
       |b AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
       |         THEN 1 ELSE 0 END AS brk
       |  FROM h),
       |isl AS (
       |  SELECT doc_id, pos, sum(brk) OVER (
       |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM b),
       |ext AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
       |  FROM isl GROUP BY doc_id, island),
       |pos AS (
       |  SELECT doc_id, u.p::BIGINT AS p, u.t AS t FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
       |      i -> {'p': i, 't': ts[i]})) AS u
       |    FROM toks) q),
       |kept AS (
       |  SELECT pos.doc_id, pos.p, pos.t FROM pos
       |  WHERE NOT EXISTS (SELECT 1 FROM ext WHERE ext.doc_id = pos.doc_id
       |    AND pos.p >= ext.s AND pos.p <= ext.e)),
       |agg AS (
       |  SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS ct, count(*) AS nk
       |  FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(a.ct, '') AS clean_text,
       |  coalesce(a.nk, 0)::BIGINT AS n_tokens_kept,
       |  (len(t.ts) - coalesce(a.nk, 0))::BIGINT AS n_tokens_removed
       |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** q83 oracle: span contamination — 8-token window fingerprints, the
    * src0 slice's distinct fp set, per-doc leaked-window counts. */
  private lazy val q83Oracle: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, source,
       |    list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 8),
       |f AS (
       |  SELECT doc_id, source,
       |    list_transform(range(1, len(th) - 6), i -> ${duckShingleFold("th[i:i+7]")}) AS fps
       |  FROM th),
       |inst AS (SELECT doc_id, source, unnest(fps) AS fp FROM f),
       |ev AS (SELECT DISTINCT fp FROM inst WHERE source = 'src0')
       |SELECT i.doc_id, count(*)::BIGINT AS n_leaked_windows
       |FROM inst i JOIN ev USING (fp)
       |GROUP BY i.doc_id""".stripMargin
  }

  /** q84 oracle: the KL audit — token counts per side, full-outer
    * vocabulary join, the same smoothed floored log-ratio, flooring
    * integer division (DuckDB's `//` floors; the engine pmod-adjusts
    * to match on negative sums). */
  private lazy val q84Oracle: String =
    s"""WITH ta AS (
       |  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents WHERE source = 'src0'),
       |tb AS (
       |  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents WHERE source <> 'src0'),
       |ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY tok),
       |cb AS (SELECT tok, count(*) AS d FROM tb GROUP BY tok),
       |j AS (
       |  SELECT coalesce(c, 0) AS c, coalesce(d, 0) AS d
       |  FROM ca FULL OUTER JOIN cb USING (tok)),
       |t AS (SELECT count(*) AS v, sum(c) AS na, sum(d) AS nb FROM j),
       |s AS (
       |  SELECT j.c,
       |    floor(1000.0 * ln((j.c * (t.nb + t.v))::DOUBLE
       |      / (t.na * (j.d + 1))::DOUBLE))::BIGINT AS si
       |  FROM j, t WHERE j.c > 0)
       |SELECT t.na::BIGINT AS n_tokens_a, t.nb::BIGINT AS n_tokens_b,
       |  t.v::BIGINT AS vocab,
       |  ((SELECT sum(c * si) FROM s) // t.na)::BIGINT AS kl_milli
       |FROM t""".stripMargin

  /** q85 oracle: the drift-triage view — same contribution arithmetic
    * as q84, ranked by |c·s| desc then token. */
  private lazy val q85Oracle: String =
    s"""WITH ta AS (
       |  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents WHERE source = 'src0'),
       |tb AS (
       |  SELECT unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
       |  FROM documents WHERE source <> 'src0'),
       |ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY tok),
       |cb AS (SELECT tok, count(*) AS d FROM tb GROUP BY tok),
       |j AS (
       |  SELECT tok, coalesce(c, 0) AS c, coalesce(d, 0) AS d
       |  FROM ca FULL OUTER JOIN cb USING (tok)),
       |t AS (SELECT count(*) AS v, sum(c) AS na, sum(d) AS nb FROM j),
       |s AS (
       |  SELECT j.tok, j.c, j.d,
       |    j.c * floor(1000.0 * ln((j.c * (t.nb + t.v))::DOUBLE
       |      / (t.na * (j.d + 1))::DOUBLE))::BIGINT AS cs
       |  FROM j, t WHERE j.c > 0)
       |SELECT row_number() OVER (ORDER BY abs(cs) DESC, tok ASC) AS rank,
       |  tok AS token, c AS c_a, d AS c_b, cs AS contribution
       |FROM s ORDER BY abs(cs) DESC, tok ASC LIMIT 25""".stripMargin

  /** q82 oracle: passage search — corpus and passage window
    * fingerprints from the shared fold, fp join, alignment-offset vote
    * count == windows-per-passage (6 for 10-token passages at width 5). */
  private lazy val q82Oracle: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), t -> t != '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE len(ts) >= 5),
       |f AS (
       |  SELECT doc_id, list_transform(range(1, len(th) - 3), i -> ${duckShingleFold("th[i:i+4]")}) AS fps
       |  FROM th),
       |cf AS (
       |  SELECT doc_id, u.pos::BIGINT AS pos, u.fp AS fp FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(fps) + 1),
       |      i -> {'pos': i, 'fp': fps[i]})) AS u
       |    FROM f) t),
       |qth AS (
       |  SELECT doc_id AS qid,
       |    list_transform(ts[3:12], tok -> ${duckPolyHash("tok", 1L << 31)}) AS th
       |  FROM toks WHERE doc_id % 50 = 0 AND len(ts) >= 12),
       |qf AS (
       |  SELECT qid, u.qpos::BIGINT AS qpos, u.fp AS fp FROM (
       |    SELECT qid, unnest(list_transform(range(1, 7),
       |      i -> {'qpos': i, 'fp': list_transform(range(1, len(th) - 3),
       |        j -> ${duckShingleFold("th[j:j+4]")})[i]})) AS u
       |    FROM qth) t),
       |votes AS (
       |  SELECT q.qid, c.doc_id, c.pos - q.qpos AS off, count(*) AS v
       |  FROM cf c JOIN qf q USING (fp)
       |  GROUP BY q.qid, c.doc_id, c.pos - q.qpos)
       |SELECT qid AS query_id, doc_id, (off + 1)::BIGINT AS match_pos
       |FROM votes WHERE v = 6""".stripMargin
  }

  /** q46 oracle: poly hash → scalar avalanche chain (lateral aliases) →
    * bucket/rho → max per bucket. DISTINCT first is an oracle-side
    * shortcut only — duplicates collapse in the max either way. */
  private lazy val q46Oracle: String = {
    val (chain, mixed) = duckMix48Scalar
    s"""WITH k AS (SELECT DISTINCT l_orderkey FROM lineitem),
       |h0 AS (SELECT ${duckPolyHash("CAST(l_orderkey AS VARCHAR)", 1L << 48)} AS h FROM k),
       |mx AS (SELECT h$chain FROM h0),
       |r AS (SELECT $mixed & 1023 AS bucket, $mixed >> 10 AS v FROM mx)
       |SELECT bucket, max(CASE WHEN v = 0 THEN 39 ELSE 39 - length(bin(v)) END)::BIGINT AS m_rho
       |FROM r GROUP BY bucket""".stripMargin
  }

  /** q47 oracle: the same union-sort last-value formulation as a window
    * (clicks sort before purchases at equal time via the side flag, so
    * "at or before" includes same-instant clicks). */
  private lazy val q47Oracle: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS tns, event_type FROM events),
       |c AS (
       |  SELECT user_id, tns, max(event_id) AS c_event
       |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
       |u AS (
       |  SELECT user_id, tns, 1 AS side, event_id AS p_id,
       |         NULL::BIGINT AS c_tns, NULL::BIGINT AS c_event
       |  FROM e WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id, tns, 0 AS side, NULL, tns, c_event FROM c),
       |w AS (
       |  SELECT user_id, tns, side, p_id,
       |    last_value(c_tns IGNORE NULLS) OVER
       |      (PARTITION BY user_id ORDER BY tns, side
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_c_tns,
       |    last_value(c_event IGNORE NULLS) OVER
       |      (PARTITION BY user_id ORDER BY tns, side
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_c_event
       |  FROM u)
       |SELECT p_id, user_id AS p_user,
       |       strftime(make_timestamp(tns), '%Y-%m-%d %H:%M:%S.%f') AS p_time,
       |       strftime(make_timestamp(last_c_tns), '%Y-%m-%d %H:%M:%S.%f') AS c_time,
       |       last_c_event AS c_event
       |FROM w WHERE side = 1""".stripMargin

  /** q48 oracle: same split, same (fingerprint, normalized-length)
    * identity, keep-min within the batch, NOT EXISTS against the
    * corpus. */
  private lazy val q48Oracle: String =
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    ${duckPolyHash("replace(lower(trim(text)), ' ', '')", 1L << 40)} AS fp,
       |    length(replace(lower(trim(text)), ' ', '')) AS nlen
       |  FROM documents),
       |ex AS (SELECT * FROM f WHERE doc_id % 3 != 0),
       |inc AS (SELECT * FROM f WHERE doc_id % 3 = 0),
       |incd AS (
       |  SELECT doc_id, source, fp, nlen,
       |    row_number() OVER (PARTITION BY fp, nlen ORDER BY doc_id) AS rn
       |  FROM inc),
       |newdocs AS (
       |  SELECT i.doc_id, i.source, i.fp FROM incd i
       |  WHERE i.rn = 1 AND NOT EXISTS
       |    (SELECT 1 FROM ex WHERE ex.fp = i.fp AND ex.nlen = i.nlen))
       |SELECT doc_id, source, fp AS fp40, 'existing' AS origin FROM ex
       |UNION ALL
       |SELECT doc_id, source, fp AS fp40, 'new' AS origin FROM newdocs""".stripMargin

  /** q37 oracle: the group-level MinHash sketch as 64 generated min()
    * aggregates over reproducible token hashes, then pairwise signature
    * agreement — verifying the UDAF's sketches value-for-value. */
  private lazy val q37Oracle: String = {
    val minCols = graft.dedup.Dedup.hashParamsPublic(64).zipWithIndex.map {
      case ((a, b), i) => s"min(($a * th + $b) % $Mod40) AS s$i"
    }.mkString(",\n    ")
    val agree = (0 until 64).map(i =>
      s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT source, unnest(list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != ''))) AS tok
       |  FROM documents),
       |h AS (
       |  SELECT source, ${duckPolyHash("tok", 1L << 31)} AS th FROM tok),
       |sk AS (
       |  SELECT source, $minCols
       |  FROM h GROUP BY source)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  round(($agree)::DOUBLE / 64, 4) AS est_jaccard
       |FROM sk a JOIN sk b ON a.source < b.source""".stripMargin
  }

  // =================================================================
  // registry
  // =================================================================

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_range_violations" -> (q02RangeViolations _),
    "q03_null_profile" -> (q03NullProfile _),
    "q04_dedup_keepfirst" -> (q04DedupKeepFirst _),
    "q05_dup_detect" -> (q05DupDetect _),
    "q06_distinct_projection" -> (q06DistinctProjection _),
    "q07_topk" -> (q07TopK _),
    "q08_containment_join" -> (q08ContainmentJoin _),
    "q09_star_revenue" -> (q09StarRevenue _),
    "q10_window_topn" -> (q10WindowTopN _),
    "q11_ship_latency" -> (q11ShipLatency _),
    "q12_acctbal_binning" -> (q12AcctbalBinning _),
    "q13_event_severity" -> (q13EventSeverity _),
    "q14_text_normalize" -> (q14TextNormalize _),
    "q15_embedding_stats" -> (q15EmbeddingStats _),
    "q16_orders_quality" -> (q16OrdersQuality _),
    "q17_type_counts" -> (q17TypeCounts _),
    "q18_semi_anti" -> (q18SemiAnti _),
    "q19_distinct_agg" -> (q19DistinctAgg _),
    "q20_exact_dedup" -> (q20ExactDedup _),
    "q21_jaccard_neardup" -> (q21JaccardNearDup _),
    "q22_minhash_lsh" -> (q22MinhashLsh _),
    "q23_simhash_pairs" -> (q23SimhashPairs _),
    "q24_embedding_neardup" -> (q24EmbeddingNearDup _),
    "q25_ann_topk" -> (q25AnnTopK _),
    "q26_text_stats" -> (q26TextStats _),
    "q27_langid" -> (q27LangId _),
    "q28_fingerprint" -> (q28Fingerprint _),
    "q29_sessionize" -> (q29Sessionize _),
    "q30_lsh_embedding" -> (q30LshEmbedding _),
    "q31_multimodal_features" -> (q31MultimodalFeatures _),
    "q32_rollup" -> (q32Rollup _),
    "q33_hour_buckets" -> (q33HourBuckets _),
    "q34_percentiles" -> (q34Percentiles _),
    "q35_json_extract" -> (q35JsonExtract _),
    "q36_approx_distinct" -> (q36ApproxDistinct _),
    "q37_source_similarity" -> (q37SourceSimilarity _),
    "q38_ivf_topk" -> (q38IvfTopK _),
    "q39_contamination" -> (q39Contamination _),
    "q40_repetition" -> (q40Repetition _),
    "q41_pii_redact" -> (q41PiiRedact _),
    "q42_deterministic_sample" -> (q42DeterministicSample _),
    "q43_dedup_clusters" -> (q43DedupClusters _),
    "q44_tfidf_terms" -> (q44TfidfTerms _),
    "q45_curation_core" -> (q45CurationCore _),
    "q46_hll_registers" -> (q46HllRegisters _),
    "q47_asof_attribution" -> (q47AsofAttribution _),
    "q48_incremental_merge" -> (q48IncrementalMerge _),
    "q49_curation_full" -> (q49CurationFull _),
    "q50_quantize_int8" -> (q50QuantizeInt8 _),
    "q51_surprisal" -> (q51Surprisal _),
    "q52_chunking" -> (q52Chunking _),
    "q53_shuffle_pos" -> (q53ShufflePos _),
    "q54_token_mix" -> (q54TokenMix _),
    "q55_pack_stream" -> (q55PackStream _),
    "q56_pack_greedy" -> (q56PackGreedy _),
    "q57_boilerplate" -> (q57Boilerplate _),
    "q58_quantized_topk" -> (q58QuantizedTopK _),
    "q59_snapshot_diff" -> (q59SnapshotDiff _),
    "q60_diversity_sample" -> (q60DiversitySample _),
    "q61_cms_registers" -> (q61CmsRegisters _),
    "q62_value_histogram" -> (q62ValueHistogram _),
    "q63_zorder" -> (q63ZValues _),
    "q64_retention" -> (q64RetentionCohorts _),
    "q65_bloom_bits" -> (q65BloomBits _),
    "q66_funnel" -> (q66Funnel _),
    "q67_dataset_card" -> (q67DatasetCard _),
    "q68_interval_join" -> (q68IntervalJoin _),
    "q69_weighted_sample" -> (q69WeightedSample _),
    "q70_hll_by_group" -> (q70HllByGroup _),
    "q71_train_split" -> (q71TrainSplit _),
    "q72_cell_neardup" -> (q72CellNearDup _),
    "q73_bigram_surprisal" -> (q73BigramSurprisal _),
    "q74_rolling_window" -> (q74RollingWindow _),
    "q75_cms_by_source" -> (q75CmsBySource _),
    "q76_dup_spans" -> (q76DupSpans _),
    "q77_image_headers" -> (q77ImageHeaders _),
    "q78_shard_manifest" -> (q78ShardManifest _),
    "q79_audio_headers" -> (q79AudioHeaders _),
    "q80_excise_spans" -> (q80ExciseSpans _),
    "q81_video_headers" -> (q81VideoHeaders _),
    "q82_passage_search" -> (q82PassageSearch _),
    "q83_span_contamination" -> (q83SpanContamination _),
    "q84_corpus_divergence" -> (q84CorpusDivergence _),
    "q85_diverging_tokens" -> (q85DivergingTokens _),
    "q86_dedup_weights" -> (q86DedupWeights _),
    "q87_dsir_weights" -> (q87DsirWeights _),
    "q88_dsir_hashed" -> (q88DsirHashed _),
    "q89_dsir_select" -> (q89DsirSelect _),
    "q90_bm25_topk" -> (q90Bm25TopK _),
    "q91_hybrid_rrf" -> (q91HybridRrf _),
    "q92_vocab_coverage" -> (q92VocabCoverage _),
    "q93_exact_sample" -> (q93ExactSample _),
    "q94_edit_verified" -> (q94EditVerified _),
    "q95_canonical_quality" -> (q95CanonicalQuality _),
    "q96_hard_negatives" -> (q96HardNegatives _),
    "q97_positive_pairs" -> (q97PositivePairs _),
    "q98_temperature_mix" -> (q98TemperatureMix _),
    "q99_curriculum" -> (q99Curriculum _),
    "q100_split_leakage" -> (q100SplitLeakage _),
    "q101_bigram_pmi" -> (q101BigramPmi _),
    "q102_winnowing" -> (q102Winnowing _),
    "q103_winnowed_overlap" -> (q103WinnowedOverlap _),
    "q104_source_profile" -> (q104SourceProfile _),
    "q105_encode_tokens" -> (q105EncodeTokens _),
    "q106_packed_sequences" -> (q106PackedSequences _),
    "q107_nb_quality" -> (q107NbQuality _),
    "q108_random_projection" -> (q108RandomProjection _),
    "q109_blocklist" -> (q109Blocklist _),
    "q110_projected_topk" -> (q110ProjectedTopK _),
    "q111_hybrid_ivf" -> (q111HybridIvf _),
    "q112_bpe_merges" -> (q112BpeMerges _),
    "q113_bpe_encode" -> (q113BpeEncode _),
    "q114_bpe_fertility" -> (q114BpeFertility _),
    "q115_nb_calibration" -> (q115NbCalibration _),
    "q116_quality_mix" -> (q116QualityMix _),
    "q117_bm25_index_probe" -> (q117Bm25IndexProbe _),
    "q118_lsh_index_probe" -> (q118LshIndexProbe _),
    "q119_png_pixels" -> (q119PngPixels _),
    "q120_wav_samples" -> (q120WavSamples _),
    "q121_unigram_vocab" -> (q121UnigramVocab _),
    "q122_unigram_encode" -> (q122UnigramEncode _),
    "q123_unigram_fertility" -> (q123UnigramFertility _),
    "q124_jpeg_pixels" -> (q124JpegPixels _),
    "q125_mp4_samples" -> (q125Mp4Samples _),
    "q126_parquet_audit" -> (q126ParquetAudit _),
    "q127_jpeg_420" -> (q127Jpeg420 _),
    "q128_html_text" -> (q128HtmlText _),
    "q129_url_normalize" -> (q129UrlNormalize _),
    "q130_gzip_text" -> (q130GzipText _),
    "q131_warc_records" -> (q131WarcRecords _),
    "q132_tar_entries" -> (q132TarEntries _),
    "q133_phash_pairs" -> (q133PhashPairs _),
    "q134_audio_fp_pairs" -> (q134AudioFpPairs _),
    "q135_gopher_rules" -> (q135GopherRules _),
    "q136_c4_clean" -> (q136C4Clean _),
    "q137_phash_clusters" -> (q137PhashClusters _),
    "q138_readability" -> (q138Readability _),
    "q139_source_audit" -> (q139SourceAudit _),
    "q140_video_frames" -> (q140VideoFrames _),
    "q141_clip_dups" -> (q141ClipDups _),
    "q142_group_split" -> (q142GroupSplit _),
    "q143_dedup_savings" -> (q143DedupSavings _),
    "q144_lang_audit" -> (q144LangAudit _),
    "q145_lang_fertility" -> (q145LangFertility _),
    "q146_token_delivery" -> (q146TokenDelivery _),
    "q147_epoch_shuffle" -> (q147EpochShuffle _),
    "q148_pack_efficiency" -> (q148PackEfficiency _),
    "q149_ann_recall" -> (q149AnnRecall _),
    "q150_shard_provenance" -> (q150ShardProvenance _),
    "q151_nprobe_sweep" -> (q151NprobeSweep _),
    "q152_jpeg_progressive" -> (q152JpegProgressive _),
    "q153_pack_spans" -> (q153PackSpans _),
    "q154_zstd_text" -> (q154ZstdText _),
    "q155_warc_zst" -> (q155WarcZst _),
    "q156_mp3_headers" -> (q156Mp3Headers _),
    "q157_paired_curation" -> (q157PairedCuration _),
    "q158_jpeg_422" -> (q158Jpeg422 _),
    "q159_jsonl_zst" -> (q159JsonlZst _),
    "q160_phash_index_probe" -> (q160PhashIndexProbe _),
    "q161_paired_delta" -> (q161PairedDelta _),
    "q162_embed_delta_neardup" -> (q162EmbedDeltaNearDup _),
    "q163_lsh_recall_audit" -> (q163LshRecallAudit _),
    "q164_flac_headers" -> (q164FlacHeaders _),
    "q165_webp_headers" -> (q165WebpHeaders _),
    "q166_ogg_headers" -> (q166OggHeaders _),
    "q167_zip_members" -> (q167ZipMembers _),
    "q168_webp_phash" -> (q168WebpPhash _),
    "q174_vp8_phash" -> (q174Vp8Phash _),
    "q175_gif_frames" -> (q175GifFrames _),
    "q176_gif_phash" -> (q176GifPhash _),
    "q177_gopher_repetition" -> (q177GopherRepetition _),
    "q178_pdf_headers" -> (q178PdfHeaders _),
    "q179_pdf_text" -> (q179PdfText _),
    "q180_ogg_tags" -> (q180OggTags _),
    "q181_pq_topk" -> (q181PqTopk _),
    "q182_pq_recall" -> (q182PqRecall _),
    "q183_tiff_headers" -> (q183TiffHeaders _),
    "q184_robots" -> (q184Robots _),
    "q185_bigram_nll" -> (q185BigramNll _),
    "q186_avif_headers" -> (q186AvifHeaders _),
    "q187_webp_alpha" -> (q187WebpAlpha _),
    "q188_ivfpq_topk" -> (q188IvfPqTopk _),
    "q189_ivfpq_recall" -> (q189IvfPqRecall _),
    "q190_ivfpq_index_probe" -> (q190IvfPqIndexProbe _),
    "q191_html_metadata" -> (q191HtmlMetadata _),
    "q192_canonical_dedup" -> (q192CanonicalDedup _),
    "q193_ivfpq_nprobe_sweep" -> (q193IvfPqNprobeSweep _),
    "q194_http_payloads" -> (q194HttpPayloads _),
    "q195_pq_width_sweep" -> (q195PqWidthSweep _),
    "q196_h264_sps" -> (q196H264Sps _),
    "q197_audio_fp" -> (q197AudioFp _),
    "q198_audio_dup_pairs" -> (q198AudioDupPairs _),
    "q199_crawl_ingest" -> (q199CrawlIngest _),
    "q200_audio_fp_index_probe" -> (q200AudioFpIndexProbe _),
    "q201_hadamard_pq" -> (q201HadamardPq _),
    "q202_http_audit" -> (q202HttpAudit _),
    "q203_charset_decode" -> (q203CharsetDecode _),
    "q204_charset_audit" -> (q204CharsetAudit _),
    "q205_rotated_index_probe" -> (q205RotatedIndexProbe _),
    "q206_pq_rerank_sweep" -> (q206PqRerankSweep _),
    "q207_main_content" -> (q207MainContent _),
    "q208_avc_frames" -> (q208AvcFrames _),
    "q209_cross_codec_clip_dups" -> (q209CrossCodecClipDups _),
    "q169_anim_webp_frames" -> (q169AnimWebpFrames _),
    "q170_cross_clip_dups" -> (q170CrossClipDups _),
    "q171_exif_headers" -> (q171ExifHeaders _),
    "q172_oriented_phash" -> (q172OrientedPhash _),
    "q173_id3_tags" -> (q173Id3Tags _))

  /** The q140-family frame-hash replay: per-8x8-block pixel law,
    * 8x8 DCT (frozen integer table), median threshold, 63-bit pack —
    * keyed (doc_id, f), restricted by `where`. Shared by q140 (MJPEG),
    * q208 (H.264 — the SAME law carried by a real codec), and the
    * q209 cross-codec pair join. */
  private def videoPhashCtes(where: String): String =
    s"""fr AS (
      |  SELECT doc_id, f.f AS f
      |  FROM documents, range(0, 6) AS f(f)
      |  WHERE ($where) AND f.f < 3 + doc_id % 4),
      |blk AS (
      |  SELECT doc_id, f, bi.bi AS bi, bj.bj AS bj,
      |    64 * ((((doc_id % 10) * 73 + f * 29 + bj.bj * 37
      |      + bi.bi * 91) % 17) * 15) AS s
      |  FROM fr, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)),
      |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
      |  [1004,851,569,200,-200,-569,-851,-1004],
      |  [946,392,-392,-946,-946,-392,392,946],
      |  [851,-200,-1004,-569,569,1004,200,-851],
      |  [724,-724,-724,724,724,-724,-724,724],
      |  [569,-1004,200,851,-851,-200,1004,-569],
      |  [392,-946,946,-392,-392,946,-946,392],
      |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
      |dct AS (
      |  SELECT b.doc_id, b.f, u.u AS u, v.v AS v,
      |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
      |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
      |  GROUP BY b.doc_id, b.f, u.u, v.v),
      |med AS (
      |  SELECT doc_id, f, list_sort(list(fc))[32] AS m
      |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id, f),
      |ph AS (
      |  SELECT d.doc_id, d.f,
      |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
      |             ELSE 0::BIGINT END)::BIGINT AS h
      |  FROM dct d JOIN med ON d.doc_id = med.doc_id AND d.f = med.f
      |  WHERE NOT (d.u = 0 AND d.v = 0)
      |  GROUP BY d.doc_id, d.f)""".stripMargin

  private lazy val videoFramesOracle: String =
    s"""WITH ${videoPhashCtes("TRUE")}
      |SELECT doc_id AS media_id, f::INTEGER AS frame_idx,
      |  (CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 0 ELSE 1 END)::INTEGER AS ok,
      |  CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 0 ELSE h END AS phash,
      |  CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 'frame_decode' ELSE '' END AS err
      |FROM ph""".stripMargin

  // q203/q204 closed-form arm restatements (single-line so they embed
  // in stripMargin oracles): the decoded body text and the canonical
  // charset label per id%8 arm of charsetWarcCorpusFromDocuments
  private val charsetBodySql: String =
    "CASE doc_id % 8" +
      " WHEN 0 THEN '<p>Doc ' || doc_id || ' café</p>'" +
      " WHEN 1 THEN '<p>Doc ' || doc_id || ' “q”–€</p>'" +
      " WHEN 2 THEN '<meta charset=shift_jis><p>Doc ' || doc_id || ' 日本語</p>'" +
      " WHEN 3 THEN '<p>Doc ' || doc_id || ' Ω</p>'" +
      " WHEN 4 THEN '<p>Doc ' || doc_id || ' …€</p>'" +
      " WHEN 5 THEN '<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=euc-kr\"><p>Doc ' || doc_id || " +
      "' 한국</p>'" +
      " WHEN 6 THEN ''" +
      " ELSE '<p>Doc ' || doc_id || ' plain</p>' END"

  private val charsetLabelSql: String =
    "CASE doc_id % 8 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252'" +
      " WHEN 2 THEN 'shift_jis' WHEN 3 THEN 'utf-16le'" +
      " WHEN 4 THEN 'windows-1252' WHEN 5 THEN 'euc-kr'" +
      " WHEN 6 THEN 'x-mystery-8' ELSE 'utf-8' END"

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_range_violations" ->
      """SELECT count(*) AS n_rows,
        | sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT AS n_qty_gt_45,
        | sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)::BIGINT AS n_disc_gt_008,
        | sum(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END)::BIGINT AS n_tax_gt_006,
        | sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg_price
        |FROM lineitem""".stripMargin,
    "q03_null_profile" ->
      """SELECT count(*) AS n_rows,
        | sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_value,
        | sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_props,
        | round(avg(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 100, 4) AS null_value_pct
        |FROM events""".stripMargin,
    "q04_dedup_keepfirst" ->
      """SELECT event_id, user_id, event_type, round(value, 2) AS value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q05_dup_detect" ->
      """SELECT coalesce(sum(cnt), 0)::BIGINT AS dup_members, count(*) AS dup_groups FROM (
        |  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1) t""".stripMargin,
    "q06_distinct_projection" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q07_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total_price, o_orderstatus
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q08_containment_join" ->
      """SELECT r_name, count(*) AS match_count, min(n_name) AS first_nation
        |FROM nation JOIN region
        |  ON contains(n_name, substring(r_name, 1, 1)) OR contains(r_name, substring(n_name, 1, 1))
        |GROUP BY r_name""".stripMargin,
    "q09_star_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q10_window_topn" ->
      """SELECT user_id, rn, event_id, running_value FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |  FROM events) t WHERE rn <= 3""".stripMargin,
    "q11_ship_latency" ->
      """SELECT year(o_orderdate) AS order_year,
        | round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_ship_days,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY year(o_orderdate)""".stripMargin,
    "q12_acctbal_binning" ->
      """SELECT coalesce(CASE
        |   WHEN c_acctbal > 5000 THEN 'High'
        |   WHEN c_acctbal > 1000 AND c_acctbal <= 5000 THEN 'Mid'
        |   WHEN c_acctbal > 0 AND c_acctbal <= 1000 THEN 'Low'
        |   ELSE NULL END, 'Out of Range') AS acctbal_band,
        | count(*) AS n_customers,
        | round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY 1""".stripMargin,
    "q13_event_severity" ->
      """SELECT user_id,
        | sum(CASE WHEN event_type = 'error' THEN 10
        |          WHEN event_type = 'purchase' THEN 5
        |          WHEN event_type = 'signup' THEN 3
        |          WHEN event_type = 'click' THEN 2
        |          ELSE 0 END)::BIGINT AS severity_score,
        | count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "q14_text_normalize" ->
      """SELECT doc_id,
        | length(replace(lower(trim(text)), ' ', '')) AS norm_len,
        | upper(substring(trim(text), 1, 20)) AS head_upper,
        | n_chars
        |FROM documents""".stripMargin,
    "q15_embedding_stats" ->
      """SELECT vec_id, len(embedding) AS dim,
        | round(embedding[1]::DOUBLE, 4) AS first_val,
        | round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding, x -> x::DOUBLE)), (a, b) -> a + b), 3) AS vec_sum,
        | round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b), 3) AS vec_norm_sq,
        | label
        |FROM embeddings""".stripMargin,
    "q16_orders_quality" ->
      """SELECT count(*) AS n_orders,
        | sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg_total,
        | sum(CASE WHEN o_orderdate > TIMESTAMP '2001-01-01' THEN 1 ELSE 0 END)::BIGINT AS n_after_2001,
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_status_p,
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_status_o,
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_status_f,
        | count(DISTINCT o_custkey) AS n_customers
        |FROM orders""".stripMargin,
    "q17_type_counts" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 3) AS avg_value
        |FROM events GROUP BY event_type HAVING count(*) >= 5""".stripMargin,
    "q18_semi_anti" ->
      """SELECT
        | (SELECT count(*) FROM customer WHERE EXISTS
        |   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
        | (SELECT count(*) FROM customer WHERE NOT EXISTS
        |   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""".stripMargin,
    "q19_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q22_minhash_lsh" -> q22Oracle,
    "q23_simhash_pairs" -> q23Oracle,
    "q30_lsh_embedding" -> q30Oracle,
    "q31_multimodal_features" -> q31Oracle,
    "q38_ivf_topk" -> q38Oracle,
    "q39_contamination" -> q39Oracle,
    "q40_repetition" -> q40Oracle,
    "q41_pii_redact" -> q41Oracle,
    "q42_deterministic_sample" -> q42Oracle,
    "q43_dedup_clusters" -> q43Oracle,
    "q44_tfidf_terms" -> q44Oracle,
    "q45_curation_core" -> q45Oracle,
    "q46_hll_registers" -> q46Oracle,
    "q47_asof_attribution" -> q47Oracle,
    "q48_incremental_merge" -> q48Oracle,
    "q49_curation_full" -> q49Oracle,
    "q50_quantize_int8" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, mx,
        |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0::BIGINT)
        |         ELSE list_transform(embedding, x -> floor(127.0 * x::DOUBLE / mx)::BIGINT)
        |    END AS qv
        |  FROM m)
        |SELECT vec_id, len(qv)::BIGINT AS n_dims, round(mx, 6) AS maxabs_r,
        |  list_sum(qv)::BIGINT AS qsum,
        |  list_reduce(list_prepend(0::BIGINT, qv),
        |    (acc, v) -> (acc * 1000003 + (v + 128)) % 1099511627776)::BIGINT AS qfp
        |FROM q""".stripMargin,
    "q51_surprisal" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |tot AS (SELECT sum(c)::BIGINT AS total FROM c),
        |s AS (
        |  SELECT t.doc_id,
        |    floor(1000.0 * ln(tot.total::DOUBLE / c.c))::BIGINT AS si
        |  FROM t JOIN c USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  (sum(si)::BIGINT // count(*)) AS surprisal_milli
        |FROM s GROUP BY doc_id""".stripMargin,
    "q52_chunking" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ts
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, (i - 1) // 16 AS chunk_id,
        |    array_to_string(ts[i : i + 31], ' ') AS chunk
        |  FROM t, LATERAL (SELECT unnest(range(1, greatest(len(ts) - 16, 1) + 1, 16)) AS i)
        |  WHERE len(ts) > 0)
        |SELECT doc_id, chunk_id,
        |  len(string_split(chunk, ' '))::BIGINT AS n_chunk_tokens,
        |  ${duckPolyHash("replace(chunk, ' ', '')", 1L << 40)} AS chunk_fp
        |FROM c""".stripMargin,
    "q53_shuffle_pos" -> q53Oracle,
    "q55_pack_stream" -> q55Oracle,
    "q56_pack_greedy" -> q56Oracle,
    "q57_boilerplate" -> q57Oracle,
    "q58_quantized_topk" -> q58Oracle,
    "q59_snapshot_diff" -> q59Oracle,
    "q60_diversity_sample" -> q60Oracle,
    "q61_cms_registers" -> q61Oracle,
    "q65_bloom_bits" -> q65Oracle,
    "q67_dataset_card" -> q67Oracle,
    "q69_weighted_sample" -> q69Oracle,
    "q70_hll_by_group" -> q70Oracle,
    "q71_train_split" -> q71Oracle,
    "q72_cell_neardup" -> q72Oracle,
    "q162_embed_delta_neardup" -> q162Oracle,
    "q163_lsh_recall_audit" -> q163Oracle,
    // every fixture arm restated closed-form from the id arithmetic
    "q164_flac_headers" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    ([8000,16000,22050,32000,44100,48000])[(doc_id % 6) + 1] AS rate,
        |    (1 + doc_id % 2) AS channels,
        |    (1000 + doc_id % 9000)::BIGINT AS total,
        |    (doc_id % 7 = 2) AS notflac,
        |    (doc_id % 7 <> 2 AND doc_id % 7 = 4) AS trunc,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 11 = 5) AS noinfo,
        |    (doc_id % 3 = 1) AS pad
        |  FROM documents)
        |SELECT id AS media_id,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0 ELSE rate END)::INTEGER AS sample_rate,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0 ELSE channels END)::INTEGER AS channels,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0 ELSE 16 END)::INTEGER AS bits_per_sample,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0 ELSE total END)::BIGINT AS total_samples,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0
        |        ELSE (total * 1000) // rate END)::BIGINT AS duration_ms,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0
        |        WHEN pad THEN 2 ELSE 1 END)::INTEGER AS n_meta_blocks,
        |  (CASE WHEN notflac OR trunc OR noinfo THEN 0
        |        ELSE id % 50 END)::BIGINT AS audio_bytes,
        |  CASE WHEN notflac THEN 'not_flac' WHEN trunc THEN 'truncated'
        |       WHEN noinfo THEN 'no_streaminfo' ELSE '' END AS err
        |FROM m""".stripMargin,
    "q165_webp_headers" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    (16 + doc_id % 200) AS w,
        |    (16 + doc_id % 150) AS h,
        |    (doc_id % 7 = 2) AS notwebp,
        |    (doc_id % 7 <> 2 AND doc_id % 7 = 4) AS trunc,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 11 = 5) AS badbs,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 11 <> 5
        |       AND doc_id % 13 = 3) AS noimg,
        |    (doc_id % 3) AS v,
        |    (doc_id % 2) AS par,
        |    (doc_id % 5 = 0) AS anim
        |  FROM documents),
        |e AS (SELECT *, (notwebp OR trunc OR badbs OR noimg) AS bad FROM m)
        |SELECT id AS media_id,
        |  (CASE WHEN bad THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN bad THEN ''
        |       WHEN v = 0 THEN 'lossy' WHEN v = 1 THEN 'lossless'
        |       ELSE 'extended' END AS format,
        |  (CASE WHEN bad THEN 0 ELSE w END)::INTEGER AS width,
        |  (CASE WHEN bad THEN 0 ELSE h END)::INTEGER AS height,
        |  (CASE WHEN bad OR v = 0 THEN 0 ELSE par END)::INTEGER AS has_alpha,
        |  (CASE WHEN NOT bad AND v = 2 AND anim THEN 1 ELSE 0 END)::INTEGER AS animated,
        |  (CASE WHEN bad THEN 0 WHEN v = 2 THEN 2 ELSE 1 END)::INTEGER AS n_chunks,
        |  CASE WHEN notwebp THEN 'not_webp' WHEN trunc THEN 'truncated'
        |       WHEN badbs THEN 'bad_bitstream' WHEN noimg THEN 'no_image'
        |       ELSE '' END AS err
        |FROM e""".stripMargin,
    "q166_ogg_headers" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    (doc_id % 2 = 1) AS opus,
        |    CASE WHEN doc_id % 2 = 1 THEN 48000
        |         ELSE ([8000,16000,44100,48000])[(doc_id % 4) + 1] END AS rate,
        |    (1 + doc_id % 2) AS channels,
        |    (48000 + doc_id % 100000)::BIGINT AS granule,
        |    (1 + doc_id % 3) AS n_audio,
        |    (20 + doc_id % 50)::BIGINT AS page_bytes,
        |    (doc_id % 7 = 2) AS notogg,
        |    (doc_id % 7 <> 2 AND doc_id % 7 = 4) AS trunc,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 17 = 7) AS badver,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 17 <> 7
        |       AND doc_id % 11 = 5) AS badcrc,
        |    (doc_id % 7 <> 2 AND doc_id % 7 <> 4 AND doc_id % 17 <> 7
        |       AND doc_id % 11 <> 5 AND doc_id % 13 = 3) AS unk
        |  FROM documents),
        |e AS (SELECT *, (notogg OR trunc OR badver OR badcrc OR unk) AS bad FROM m)
        |SELECT id AS media_id,
        |  (CASE WHEN bad THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN bad THEN '' WHEN opus THEN 'opus' ELSE 'vorbis' END AS codec,
        |  (CASE WHEN bad THEN 0 ELSE rate END)::INTEGER AS sample_rate,
        |  (CASE WHEN bad THEN 0 ELSE channels END)::INTEGER AS channels,
        |  (CASE WHEN NOT bad AND opus THEN 312 ELSE 0 END)::INTEGER AS pre_skip,
        |  (CASE WHEN bad THEN 0 ELSE 1 + n_audio END)::INTEGER AS n_pages,
        |  (CASE WHEN bad THEN 0 ELSE granule END)::BIGINT AS granule_end,
        |  (CASE WHEN bad THEN 0
        |        WHEN opus THEN ((granule - 312) * 1000) // 48000
        |        ELSE (granule * 1000) // rate END)::BIGINT AS duration_ms,
        |  (CASE WHEN bad THEN 0 ELSE n_audio * page_bytes END)::BIGINT AS audio_bytes,
        |  CASE WHEN notogg THEN 'not_ogg' WHEN trunc THEN 'truncated'
        |       WHEN badver THEN 'bad_version' WHEN badcrc THEN 'bad_crc'
        |       WHEN unk THEN 'unknown_codec' ELSE '' END AS err
        |FROM e""".stripMargin,
    // a broken EOCD (id%7==2) is a container row and wins over the
    // member-level CRC plant (id%5==3); member 0 alternates deflate
    // (id%2==0, method 8) and stored
    "q167_zip_members" ->
      """SELECT doc_id AS media_id, 0::INTEGER AS ent_index, 0::INTEGER AS ok,
        |  '' AS name, 0::INTEGER AS method, 0::BIGINT AS n_bytes,
        |  0::INTEGER AS crc_ok, '' AS text
        |FROM documents WHERE doc_id % 7 = 2
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 1::INTEGER,
        |  'docs/' || doc_id || '.txt',
        |  (CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 0 END)::INTEGER,
        |  coalesce(octet_length(encode(text)), 0)::BIGINT,
        |  1::INTEGER, coalesce(text, '')
        |FROM documents WHERE doc_id % 7 <> 2
        |UNION ALL
        |SELECT doc_id, 1::INTEGER,
        |  (CASE WHEN doc_id % 5 = 3 THEN 0 ELSE 1 END)::INTEGER,
        |  'meta/' || doc_id || '.json', 0::INTEGER,
        |  (CASE WHEN doc_id % 5 = 3 THEN 0
        |        ELSE octet_length(encode('{"id":' || doc_id || '}')) END)::BIGINT,
        |  (CASE WHEN doc_id % 5 = 3 THEN 0 ELSE 1 END)::INTEGER,
        |  CASE WHEN doc_id % 5 = 3 THEN '' ELSE '{"id":' || doc_id || '}' END
        |FROM documents WHERE doc_id % 7 <> 2""".stripMargin,
    "q73_bigram_surprisal" -> q73Oracle,
    "q74_rolling_window" -> q74Oracle,
    "q75_cms_by_source" -> q75Oracle,
    "q76_dup_spans" -> q76Oracle,
    "q78_shard_manifest" -> q78Oracle,
    "q80_excise_spans" -> q80Oracle,
    "q82_passage_search" -> q82Oracle,
    "q83_span_contamination" -> q83Oracle,
    "q84_corpus_divergence" -> q84Oracle,
    "q85_diverging_tokens" -> q85Oracle,
    "q86_dedup_weights" -> q86Oracle,
    "q87_dsir_weights" -> q87Oracle,
    "q88_dsir_hashed" -> q88Oracle,
    "q89_dsir_select" -> q89Oracle,
    "q90_bm25_topk" -> q90Oracle,
    "q91_hybrid_rrf" -> q91Oracle,
    "q94_edit_verified" -> q94Oracle,
    "q95_canonical_quality" -> q95Oracle,
    "q96_hard_negatives" -> q96Oracle,
    "q97_positive_pairs" -> q97Oracle,
    "q98_temperature_mix" -> q98Oracle,
    "q99_curriculum" -> q99Oracle,
    "q100_split_leakage" -> q100Oracle,
    "q101_bigram_pmi" -> q101Oracle,
    "q102_winnowing" -> q102Oracle,
    "q103_winnowed_overlap" -> q103Oracle,
    "q104_source_profile" -> q104Oracle,
    "q105_encode_tokens" -> q105Oracle,
    "q106_packed_sequences" -> q106Oracle,
    "q107_nb_quality" -> q107Oracle,
    "q108_random_projection" -> q108Oracle,
    "q109_blocklist" -> q109Oracle,
    "q110_projected_topk" -> q110Oracle,
    "q111_hybrid_ivf" -> q111Oracle,
    "q112_bpe_merges" -> q112Oracle,
    "q113_bpe_encode" -> q113Oracle,
    "q114_bpe_fertility" -> q114Oracle,
    "q115_nb_calibration" -> q115Oracle,
    "q116_quality_mix" -> q116Oracle,
    // probe==fresh parity: the disk-index lifecycle queries replay the
    // corresponding in-memory oracles — q117 is exactly the q90 chain,
    // q118 is the q22 pair set cut to pairs touching the probed fifth
    "q117_bm25_index_probe" -> q90Oracle,
    "q118_lsh_index_probe" ->
      s"""SELECT id_a, id_b, jaccard FROM (
         |$q22Oracle
         |) t WHERE id_a % 5 = 0 OR id_b % 5 = 0""".stripMargin,
    // closed-form replay of the id-derived pixel generator: the engine
    // only matches after a correct inflate + unfilter of every byte
    "q119_png_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, ((doc_id % 4) * 4 + 4)::INTEGER AS w,
        |         ((doc_id % 3) * 4 + 8)::INTEGER AS h
        |  FROM documents),
        |g AS (SELECT unnest(range(0, 16)) AS i),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h, c.c AS ch,
        |    ((31 * d.doc_id + 7 * gx.i + 13 * gy.i + 5 * c.c) % 256)::BIGINT AS v
        |  FROM d
        |  JOIN g gx ON gx.i < d.w
        |  JOIN g gy ON gy.i < d.h
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c),
        |s AS (
        |  SELECT doc_id, w, h,
        |    sum(CASE WHEN ch = 0 THEN v ELSE 0 END)::BIGINT AS sum_r,
        |    sum(CASE WHEN ch = 1 THEN v ELSE 0 END)::BIGINT AS sum_g,
        |    sum(CASE WHEN ch = 2 THEN v ELSE 0 END)::BIGINT AS sum_b,
        |    sum(CASE WHEN ch = 0 THEN v * v ELSE 0 END)::BIGINT AS ssq_r,
        |    sum(CASE WHEN ch = 1 THEN v * v ELSE 0 END)::BIGINT AS ssq_g,
        |    sum(CASE WHEN ch = 2 THEN v * v ELSE 0 END)::BIGINT AS ssq_b
        |  FROM px GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, 'png' AS format, w AS width, h AS height,
        |  sum_r, sum_g, sum_b, ssq_r, ssq_g, ssq_b,
        |  ((1000 * sum_r) // (w * h))::BIGINT AS mean_r_milli,
        |  ((1000 * sum_g) // (w * h))::BIGINT AS mean_g_milli,
        |  ((1000 * sum_b) // (w * h))::BIGINT AS mean_b_milli
        |FROM s""".stripMargin,
    // closed-form replay of the id-derived PCM generator: the engine
    // only matches after a correct byte-level sample decode
    "q120_wav_samples" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 2 + 1)::INTEGER AS ch,
        |         ((doc_id % 5) * 16 + 32)::BIGINT AS n,
        |         (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |           WHEN 2 THEN 22050 ELSE 44100 END)::INTEGER AS rate
        |  FROM documents),
        |g AS (SELECT unnest(range(0, 96)) AS i),
        |sm AS (
        |  SELECT d.doc_id, c.c,
        |    ((37 * d.doc_id + 11 * g.i + 23 * c.c) % 4096 - 2048)::BIGINT AS v
        |  FROM d JOIN g ON g.i < d.n
        |  JOIN (SELECT unnest(range(0, 2)) AS c) c ON c.c < d.ch),
        |s AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN c = 0 THEN v ELSE 0 END)::BIGINT AS sum_l,
        |    sum(CASE WHEN c = 1 THEN v ELSE 0 END)::BIGINT AS sum_r,
        |    sum(CASE WHEN c = 0 THEN v * v ELSE 0 END)::BIGINT AS ssq_l,
        |    sum(CASE WHEN c = 1 THEN v * v ELSE 0 END)::BIGINT AS ssq_r,
        |    max(abs(v))::BIGINT AS peak_abs
        |  FROM sm GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, 'wav' AS format, d.rate AS sample_rate,
        |  d.ch AS channels, d.n AS n_frames,
        |  s.sum_l, s.sum_r, s.ssq_l, s.ssq_r, s.peak_abs
        |FROM d JOIN s USING (doc_id)""".stripMargin,
    "q121_unigram_vocab" -> q121Oracle,
    "q122_unigram_encode" -> q122Oracle,
    "q123_unigram_fertility" -> q123Oracle,
    // closed-form replay of the DC-only block constants, INCLUDING the
    // JFIF color conversion for the 3-component (even-id) images: every
    // (chroma, luma) combination the generator can emit sits >= 1e-6
    // from a .5 rounding boundary (exhaustively verified), so
    // round-then-clamp is integer-identical across engines
    "q124_jpeg_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, ((doc_id % 3) + 1)::INTEGER AS nbx,
        |         ((doc_id % 2) + 1)::INTEGER AS nby,
        |         (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)::INTEGER AS channels,
        |         (88 + 20 * ((doc_id // 2) % 5) - 128)::BIGINT AS c1,
        |         (88 + 20 * (((doc_id // 2) + 1) % 5) - 128)::BIGINT AS c2
        |  FROM documents),
        |g AS (SELECT unnest(range(0, 3)) AS i),
        |blk AS (
        |  SELECT d.doc_id, d.channels, d.c1, d.c2,
        |    ((29 * d.doc_id + 17 * gx.i + 23 * gy.i) % 256)::BIGINT AS p
        |  FROM d JOIN g gx ON gx.i < d.nbx JOIN g gy ON gy.i < d.nby),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p + 1.402 * c2)))::BIGINT END AS r,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p - 0.344136 * c1 - 0.714136 * c2)))::BIGINT END AS gg,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p + 1.772 * c1)))::BIGINT END AS b
        |  FROM blk),
        |s AS (
        |  SELECT doc_id, (64 * sum(r))::BIGINT AS sum_r,
        |    (64 * sum(gg))::BIGINT AS sum_g, (64 * sum(b))::BIGINT AS sum_b,
        |    (64 * sum(r * r))::BIGINT AS ssq_r, (64 * sum(gg * gg))::BIGINT AS ssq_g,
        |    (64 * sum(b * b))::BIGINT AS ssq_b
        |  FROM px GROUP BY 1)
        |SELECT d.doc_id AS media_id, 'jpeg' AS format,
        |  (8 * d.nbx)::INTEGER AS width, (8 * d.nby)::INTEGER AS height,
        |  d.channels, s.sum_r, s.sum_g, s.sum_b, s.ssq_r, s.ssq_g, s.ssq_b
        |FROM d JOIN s USING (doc_id)""".stripMargin,
    // closed-form replay of the id-derived sample tables: per-sample
    // stsz sums for even ids, the uniform shortcut for odd ids
    "q125_mp4_samples" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 2 + 1)::INTEGER AS ntr FROM documents),
        |tr AS (
        |  SELECT d.doc_id, t.t FROM d
        |  JOIN (SELECT unnest(range(0, 2)) AS t) t ON t.t < d.ntr),
        |base AS (
        |  SELECT doc_id, t,
        |    (((doc_id + t) % 4 + 1) * 3)::BIGINT AS n,
        |    ((doc_id % 5 + 1) * 100)::BIGINT AS delta
        |  FROM tr),
        |g AS (SELECT unnest(range(0, 12)) AS i),
        |persample AS (
        |  SELECT b.doc_id, b.t,
        |    sum((7 * b.doc_id + 3 * g.i + 11 * b.t) % 100 + 10)::BIGINT AS tot
        |  FROM base b JOIN g ON g.i < b.n GROUP BY 1, 2)
        |SELECT b.doc_id AS media_id, 'mp4' AS format, b.t::INTEGER AS track_idx,
        |  b.n AS n_samples,
        |  (CASE WHEN b.doc_id % 2 = 0 THEN p.tot
        |        ELSE (b.doc_id % 50 + 20) * b.n END)::BIGINT AS total_sample_bytes,
        |  ((b.doc_id + b.t) % 2 + 1)::BIGINT AS n_chunks,
        |  (b.n * b.delta)::BIGINT AS duration_ticks
        |FROM base b JOIN persample p ON b.doc_id = p.doc_id AND b.t = p.t""".stripMargin,
    // 4:2:0: luma varies per 8-block, chroma per MCU (mx = bx // 2);
    // same rounding-safe closed-form color conversion as q124
    "q127_jpeg_420" ->
      """WITH d AS (
        |  SELECT doc_id, ((doc_id % 2) + 1)::INTEGER AS nmx FROM documents),
        |g AS (SELECT unnest(range(0, 4)) AS i),
        |blk AS (
        |  SELECT d.doc_id, d.nmx,
        |    ((31 * d.doc_id + 13 * gx.i + 19 * gy.i) % 256)::BIGINT AS p,
        |    (88 + 20 * ((d.doc_id + (gx.i // 2)) % 5) - 128)::BIGINT AS c1,
        |    (88 + 20 * ((d.doc_id + (gx.i // 2) + 2) % 5) - 128)::BIGINT AS c2
        |  FROM d JOIN g gx ON gx.i < 2 * d.nmx
        |  JOIN g gy ON gy.i < 2),
        |px AS (
        |  SELECT doc_id, nmx,
        |    greatest(0, least(255, round(p + 1.402 * c2)))::BIGINT AS r,
        |    greatest(0, least(255, round(p - 0.344136 * c1 - 0.714136 * c2)))::BIGINT AS gg,
        |    greatest(0, least(255, round(p + 1.772 * c1)))::BIGINT AS b
        |  FROM blk),
        |s AS (
        |  SELECT doc_id, max(nmx) AS nmx, (64 * sum(r))::BIGINT AS sum_r,
        |    (64 * sum(gg))::BIGINT AS sum_g, (64 * sum(b))::BIGINT AS sum_b,
        |    (64 * sum(r * r))::BIGINT AS ssq_r, (64 * sum(gg * gg))::BIGINT AS ssq_g,
        |    (64 * sum(b * b))::BIGINT AS ssq_b
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id AS media_id, 'jpeg' AS format,
        |  (16 * nmx)::INTEGER AS width, 16::INTEGER AS height, 3::INTEGER AS channels,
        |  sum_r, sum_g, sum_b, ssq_r, ssq_g, ssq_b
        |FROM s""".stripMargin,
    // q127's replay on the 4:2:2 geometry: per-luma-block constants,
    // chroma by the block's (mx=gx//2, my=gy) MCU, same color math
    "q158_jpeg_422" ->
      """WITH d AS (
        |  SELECT doc_id, ((doc_id % 2) + 1)::INTEGER AS nmx,
        |    (((doc_id // 2) % 2) + 1)::INTEGER AS nmy FROM documents),
        |g AS (SELECT unnest(range(0, 4)) AS i),
        |blk AS (
        |  SELECT d.doc_id, d.nmx, d.nmy,
        |    ((31 * d.doc_id + 13 * gx.i + 19 * gy.i) % 256)::BIGINT AS p,
        |    (88 + 20 * ((d.doc_id + (gx.i // 2) + 3 * gy.i) % 5) - 128)::BIGINT AS c1,
        |    (88 + 20 * ((d.doc_id + (gx.i // 2) + 3 * gy.i + 2) % 5) - 128)::BIGINT AS c2
        |  FROM d JOIN g gx ON gx.i < 2 * d.nmx
        |  JOIN g gy ON gy.i < d.nmy),
        |px AS (
        |  SELECT doc_id, nmx, nmy,
        |    greatest(0, least(255, round(p + 1.402 * c2)))::BIGINT AS r,
        |    greatest(0, least(255, round(p - 0.344136 * c1 - 0.714136 * c2)))::BIGINT AS gg,
        |    greatest(0, least(255, round(p + 1.772 * c1)))::BIGINT AS b
        |  FROM blk),
        |s AS (
        |  SELECT doc_id, max(nmx) AS nmx, max(nmy) AS nmy,
        |    (64 * sum(r))::BIGINT AS sum_r,
        |    (64 * sum(gg))::BIGINT AS sum_g, (64 * sum(b))::BIGINT AS sum_b,
        |    (64 * sum(r * r))::BIGINT AS ssq_r, (64 * sum(gg * gg))::BIGINT AS ssq_g,
        |    (64 * sum(b * b))::BIGINT AS ssq_b
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id AS media_id, 'jpeg' AS format,
        |  (16 * nmx)::INTEGER AS width, (8 * nmy)::INTEGER AS height, 3::INTEGER AS channels,
        |  sum_r, sum_g, sum_b, ssq_r, ssq_g, ssq_b
        |FROM s""".stripMargin,
    // the expected recovered text stated closed-form; corrupted ids
    // (every third) must fail the CRC and surface ok=0
    "q130_gzip_text" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 3 = 0 THEN '' ELSE coalesce(text, '') END AS text,
        |  (CASE WHEN doc_id % 3 = 0 THEN 0
        |        ELSE coalesce(octet_length(encode(text)), 0) END)::BIGINT AS text_bytes
        |FROM documents""".stripMargin,
    // closed-form record fields per container — the oracle does not
    // replay the walk, it states what each synthesized record holds
    "q131_warc_records" -> warcRecordsOracle,
    // both arms' FULL PQ chains replayed (the rotated one over the
    // exactly-replayable ±1/8 Hadamard frame); each arm's candidates
    // rescore on its own frame, recall always against the raw brute
    "q201_hadamard_pq" -> {
      def armSql(p: String, rescoreSrc: String): String =
        s"""cand_$p AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY fx DESC, neighbor_id) AS crn
          |    FROM ${p}sc) t WHERE crn <= 30),
          |served_$p AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT c.query_id, c.neighbor_id,
          |      row_number() OVER (PARTITION BY c.query_id
          |        ORDER BY r.cos DESC, c.neighbor_id) AS rank
          |    FROM cand_$p c JOIN $rescoreSrc r
          |      ON r.query_id = c.query_id AND r.neighbor_id = c.neighbor_id) t
          |  WHERE rank <= 10)""".stripMargin
      def selSql(name: String, p: String): String =
        s"""SELECT '$name' AS arm, count(*)::BIGINT AS k,
          |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
          |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
          |    // count(*))::BIGINT AS recall_bp
          |FROM brute b LEFT JOIN served_$p s
          |  ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id""".stripMargin
      s"""WITH $duckHadamardCte,
        |${duckPqCtesFor("embeddings", "pq")},
        |${duckPqCtesFor("hrot", "h")},
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |bsh AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM hrot q CROSS JOIN hrot c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |${armSql("pq", "bs")},
        |${armSql("h", "bsh")}
        |${selSql("plain", "pq")}
        |UNION ALL
        |${selSql("hadamard", "h")}""".stripMargin
    },
    // per-(coding, tag) record counts and decoded volume, every class
    // closed-form from the q194 arm arithmetic (corpus text is ASCII,
    // so char length agrees across engines)
    "q202_http_audit" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8 WHEN 0 THEN '' WHEN 1 THEN 'chunked'
        |      WHEN 2 THEN 'gzip' WHEN 3 THEN 'deflate'
        |      WHEN 4 THEN 'chunked+gzip' WHEN 5 THEN 'deflate'
        |      WHEN 6 THEN 'br' ELSE 'gzip' END AS payload_enc,
        |    CASE WHEN doc_id % 16 = 9 THEN 'bad_chunked'
        |         WHEN doc_id % 8 = 6 THEN 'unsupported_encoding'
        |         WHEN doc_id % 8 = 7 THEN 'bad_payload' ELSE '' END
        |      AS payload_err,
        |    CASE WHEN doc_id % 16 = 9 OR doc_id % 8 IN (6, 7) THEN 0
        |         ELSE length(coalesce(text, '')) END AS chars
        |  FROM documents)
        |SELECT payload_enc, payload_err, count(*)::BIGINT AS n_records,
        |  sum(chars)::BIGINT AS decoded_chars
        |FROM r GROUP BY payload_enc, payload_err""".stripMargin,
    // chrome blocks (nav / sidebar / footer / head) drop closed-form;
    // the short-paragraph arm restates the length floor; the kept
    // citation paragraph keeps its link TEXT (density, not deletion)
    "q207_main_content" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace('Doc ' || doc_id || ' ' || coalesce(text, ''),
        |      '[ \t\n\r]+', ' ', 'g')) AS p1,
        |    'Primary finding ' || doc_id || ' about topic ' ||
        |      (doc_id % 50) || ' with source ' || (doc_id % 10) ||
        |      ' and more context here' AS p2
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN length(p1) >= 25 THEN p1 || ' ' || p2 ELSE p2 END
        |    AS main_text
        |FROM d""".stripMargin,
    // every charset arm's recovered text restated closed-form — the
    // non-ASCII literals here ARE the check: a decoder shortcut that
    // leaves cp1252/Shift-JIS bytes as mojibake hash-mismatches
    "q203_charset_decode" ->
      s"""SELECT doc_id AS media_id, 1::INTEGER AS ok,
        |  $charsetBodySql AS body,
        |  CASE WHEN doc_id % 8 = 1 THEN 'gzip' ELSE '' END AS payload_enc,
        |  CASE WHEN doc_id % 8 = 6 THEN 'unsupported_charset' ELSE '' END
        |    AS payload_err,
        |  $charsetLabelSql AS charset
        |FROM documents""".stripMargin,
    // per-(charset, tag) record counts and recovered text volume,
    // closed-form from the q203 arm arithmetic (length() is characters
    // in both engines, so non-ASCII bodies agree)
    "q204_charset_audit" ->
      s"""WITH r AS (
        |  SELECT $charsetLabelSql AS charset,
        |    CASE WHEN doc_id % 8 = 6 THEN 'unsupported_charset' ELSE '' END
        |      AS payload_err,
        |    $charsetBodySql AS body
        |  FROM documents)
        |SELECT charset, payload_err, count(*)::BIGINT AS n_records,
        |  sum(length(body))::BIGINT AS decoded_chars
        |FROM r GROUP BY charset, payload_err""".stripMargin,
    // brute pairs with a probe-side member over the replayed audio
    // fingerprints (banded probe recall exact at hd<=3 — q160's shape)
    "q200_audio_fp_index_probe" ->
      s"""WITH $duckAudioFpCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming_dist
        |FROM sfp a JOIN sfp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |  AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)""".stripMargin,
    // identity rules closed-form per canonical arm; encodings are
    // content-invisible; text = title + body, whitespace-squeezed
    "q199_crawl_ingest" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 7) AS k, coalesce(text, '') AS t
        |  FROM documents)
        |SELECT
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'http://site' || k || '.example/c' || (doc_id % 25)
        |    WHEN 2 THEN 'http://site' || k || '.example/home'
        |    ELSE 'http://site' || k || '.example/p' || doc_id || '?utm=1'
        |  END AS url_norm,
        |  'site' || k || '.example' AS source,
        |  trim(regexp_replace('Doc ' || doc_id || ' ' || t,
        |    '[ \t\n\r]+', ' ', 'g')) AS text
        |FROM d""".stripMargin,
    // the full fingerprint chain replayed (sample law -> frozen-trig
    // spectra -> bit rule -> 64-bit packing); the short-payload plant
    // is the ok=0 arm
    "q197_audio_fp" ->
      s"""WITH $duckAudioFpCtes
        |SELECT doc_id AS media_id, 1::INTEGER AS ok, fp FROM sfp
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::BIGINT FROM documents
        |WHERE doc_id % 41 = 6""".stripMargin,
    // brute pair join over the replayed fingerprints — banded recall
    // is exact at hd<=3 (8 bands of 8 bits, pigeonhole), so brute ==
    // the Spark bands
    "q198_audio_dup_pairs" ->
      s"""WITH $duckAudioFpCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming_dist
        |FROM sfp a JOIN sfp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    // every field closed-form: profile/level from the arm, dims from
    // the mb-grid arithmetic (and the crop form's 1088-8), refusal
    // tags from the id%12 split; not_mp4 takes precedence
    "q196_h264_sps" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 17 = 3 OR doc_id % 6 = 5
        |        THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 17 = 3 THEN ''
        |       WHEN doc_id % 6 IN (0, 1, 2, 5) THEN 'avc1'
        |       WHEN doc_id % 6 = 3 THEN 'hvc1' ELSE 'vp09' END AS codec,
        |  (CASE WHEN doc_id % 17 = 3 OR doc_id % 6 IN (3, 4, 5) THEN 0
        |        WHEN doc_id % 6 = 2 THEN 100 ELSE 66 END)::INTEGER
        |    AS profile_idc,
        |  (CASE WHEN doc_id % 17 = 3 OR doc_id % 6 IN (3, 4, 5) THEN 0
        |        ELSE 30 + 10 * (doc_id % 2) END)::INTEGER AS level_idc,
        |  (CASE WHEN doc_id % 17 = 3 OR doc_id % 6 IN (3, 4, 5) THEN 0
        |        WHEN doc_id % 6 = 1 THEN 1920
        |        ELSE 16 * (40 + 10 * (doc_id % 5)) END)::INTEGER AS width,
        |  (CASE WHEN doc_id % 17 = 3 OR doc_id % 6 IN (3, 4, 5) THEN 0
        |        WHEN doc_id % 6 = 1 THEN 1080
        |        ELSE 16 * (23 + 11 * (doc_id % 4)) END)::INTEGER AS height,
        |  CASE WHEN doc_id % 17 = 3 THEN 'not_mp4'
        |       WHEN doc_id % 12 = 5 THEN 'bad_avcc'
        |       WHEN doc_id % 12 = 11 THEN 'unsupported_sps'
        |       ELSE '' END AS err
        |FROM documents""".stripMargin,
    // every wire-encoding arm is content-invisible (decoded body ==
    // doc text); enc/err tags closed-form from id%8 / id%16 arithmetic
    "q194_http_payloads" ->
      """SELECT doc_id AS media_id, 0::INTEGER AS rec_index, 1::INTEGER AS ok,
        |  'warcinfo' AS warc_type, '' AS url, 0::INTEGER AS http_status,
        |  'software: graft' || chr(13) || chr(10) AS body,
        |  '' AS payload_enc, '' AS payload_err
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 1::INTEGER, 1::INTEGER, 'response',
        |  'http://site' || (doc_id % 7) || '.example/p' || doc_id,
        |  200::INTEGER,
        |  CASE WHEN doc_id % 16 = 9 OR doc_id % 8 IN (6, 7) THEN ''
        |       ELSE coalesce(text, '') END,
        |  CASE doc_id % 8 WHEN 0 THEN '' WHEN 1 THEN 'chunked'
        |    WHEN 2 THEN 'gzip' WHEN 3 THEN 'deflate'
        |    WHEN 4 THEN 'chunked+gzip' WHEN 5 THEN 'deflate'
        |    WHEN 6 THEN 'br' ELSE 'gzip' END,
        |  CASE WHEN doc_id % 16 = 9 THEN 'bad_chunked'
        |       WHEN doc_id % 8 = 6 THEN 'unsupported_encoding'
        |       WHEN doc_id % 8 = 7 THEN 'bad_payload' ELSE '' END
        |FROM documents""".stripMargin,
    "q132_tar_entries" ->
      """SELECT doc_id AS media_id, 0::INTEGER AS ent_index, 1::INTEGER AS ok,
        |  'docs/' || doc_id || '.txt' AS name,
        |  coalesce(octet_length(encode(text)), 0)::BIGINT AS n_bytes,
        |  coalesce(text, '') AS text
        |FROM documents
        |UNION ALL
        |SELECT doc_id AS media_id, 1::INTEGER AS ent_index,
        |  (CASE WHEN doc_id % 5 = 3 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 5 = 3 THEN '' ELSE 'meta/' || doc_id || '.txt' END AS name,
        |  (CASE WHEN doc_id % 5 = 3 THEN 0
        |        ELSE octet_length(encode('id=' || doc_id)) END)::BIGINT AS n_bytes,
        |  CASE WHEN doc_id % 5 = 3 THEN '' ELSE 'id=' || doc_id END AS text
        |FROM documents""".stripMargin,
    // full pHash replay: closed-form gray plane -> 8x8 block sums ->
    // fixed-point DCT (the SAME frozen cosine literals as
    // Multimodal.PhashDct) -> median bits -> brute-force pair join
    // (banded recall is exact at hd<=3, so brute == the Spark bands)
    "q133_phash_pairs" ->
      s"""WITH $duckPhashCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    "q173_id3_tags" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    (doc_id % 7 = 2) AS notag,
        |    (doc_id % 7 <> 2 AND doc_id % 11 = 5) AS badver,
        |    (doc_id % 7 <> 2 AND doc_id % 11 <> 5 AND doc_id % 13 = 3) AS trunc,
        |    (doc_id % 7 <> 2 AND doc_id % 11 <> 5 AND doc_id % 13 <> 3
        |      AND doc_id % 17 = 6) AS v22,
        |    (doc_id % 7 <> 2 AND doc_id % 11 <> 5 AND doc_id % 13 <> 3
        |      AND doc_id % 17 <> 6 AND doc_id % 19 = 7) AS badflags,
        |    (doc_id % 7 <> 2 AND doc_id % 11 <> 5 AND doc_id % 13 <> 3
        |      AND doc_id % 17 <> 6 AND doc_id % 19 <> 7 AND doc_id % 23 <> 9
        |      AND doc_id % 29 = 11) AS nobom
        |  FROM documents),
        |e AS (SELECT *,
        |  (notag OR badver OR trunc OR badflags OR nobom) AS bad FROM m)
        |SELECT id AS media_id,
        |  (CASE WHEN bad THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  (CASE WHEN bad THEN 0 WHEN v22 THEN 2
        |        ELSE 3 + id % 2 END)::INTEGER AS version,
        |  CASE WHEN bad THEN '' ELSE 'Track ' || id END AS title,
        |  CASE WHEN bad THEN '' ELSE 'Artist ' || (id % 50) END AS artist,
        |  CASE WHEN bad THEN '' ELSE 'Album ' || (id % 20) END AS album,
        |  CASE WHEN bad THEN '' ELSE (1990 + id % 35)::VARCHAR END AS year,
        |  (CASE WHEN bad THEN 0 ELSE 4 END)::INTEGER AS n_frames,
        |  CASE WHEN notag THEN 'no_id3' WHEN badver THEN 'bad_version'
        |       WHEN trunc THEN 'truncated'
        |       WHEN badflags THEN 'unsupported_flags'
        |       WHEN nobom THEN 'bad_encoding' ELSE '' END AS err
        |FROM e""".stripMargin,
    "q171_exif_headers" ->
      """WITH m AS (
        |  SELECT doc_id AS id,
        |    (doc_id % 7 = 2) AS noexif,
        |    (doc_id % 7 <> 2 AND doc_id % 11 = 5) AS badtiff,
        |    (doc_id % 7 <> 2 AND doc_id % 11 <> 5 AND
        |     (doc_id % 13 = 3 OR doc_id % 29 = 11)) AS trunc,
        |    (1 + doc_id % 8) AS orient,
        |    CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS bo,
        |    '2024:' || lpad((1 + doc_id % 12)::VARCHAR, 2, '0') || ':' ||
        |      lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || ' ' ||
        |      lpad((doc_id % 24)::VARCHAR, 2, '0') || ':00:00' AS dt,
        |    '2023:' || lpad((1 + doc_id % 12)::VARCHAR, 2, '0') || ':' ||
        |      lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || ' ' ||
        |      lpad((doc_id % 24)::VARCHAR, 2, '0') || ':30:00' AS dto
        |  FROM documents),
        |e AS (SELECT *, (noexif OR badtiff OR trunc) AS bad FROM m)
        |SELECT id AS media_id,
        |  (CASE WHEN bad THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN bad THEN '' ELSE bo END AS byte_order,
        |  (CASE WHEN bad THEN 0 ELSE orient END)::INTEGER AS orientation,
        |  CASE WHEN bad THEN '' ELSE dt END AS datetime,
        |  CASE WHEN bad THEN '' ELSE dto END AS datetime_original,
        |  (CASE WHEN bad THEN 0 ELSE 3 END)::INTEGER AS n_entries,
        |  CASE WHEN noexif THEN 'no_exif' WHEN badtiff THEN 'bad_tiff'
        |       WHEN trunc THEN 'truncated' ELSE '' END AS err
        |FROM e""".stripMargin,
    // one closed-form hash per GROUP of 8 orientations (the upright
    // base), expanded to members — identical hashes within a group is
    // the normalization claim itself
    "q172_oriented_phash" ->
      """WITH gs AS (SELECT DISTINCT doc_id // 8 AS gid FROM documents),
        |px AS (
        |  SELECT gid, x.x AS x, y.y AS y,
        |    (((gid % 10) * 73 + (x.x // 8) * 37 + (y.y // 8) * 91) % 17) * 15 AS g
        |  FROM gs, range(0, 48) AS x(x), range(0, 32) AS y(y)),
        |blk AS (
        |  SELECT gid, y // 4 AS bi, x // 6 AS bj, sum(g) AS s
        |  FROM px GROUP BY gid, y // 4, x // 6),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.gid, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.gid, u.u, v.v),
        |med AS (
        |  SELECT gid, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY gid),
        |ph AS (
        |  SELECT d.gid,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.gid = med.gid
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.gid),
        |mem AS (
        |  SELECT d.doc_id, ph.h FROM documents d
        |  JOIN ph ON ph.gid = d.doc_id // 8)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM mem a JOIN mem b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    // the q141 replay over all THREE containers' live frames (mp4
    // clips at doc_id, animated-webp at doc_id + 2^20, gif at
    // doc_id + 2^21; each container's own dead-frame/not-animated/
    // not-gif arms excluded — gif's bad_lzw plant is shielded by its
    // 87a arm), doc_id%7==0 seventh
    "q170_cross_clip_dups" ->
      """WITH fr AS (
        |  SELECT doc_id AS clip, doc_id % 10 AS pseed, f.f AS f
        |  FROM documents, range(0, 6) AS f(f)
        |  WHERE doc_id % 7 = 0 AND f.f < 3 + doc_id % 4
        |    AND NOT (doc_id % 6 = 4 AND f.f = 1)
        |  UNION ALL
        |  SELECT doc_id + 1048576, doc_id % 10, f.f
        |  FROM documents, range(0, 6) AS f(f)
        |  WHERE doc_id % 7 = 0 AND doc_id % 11 <> 5 AND f.f < 3 + doc_id % 4
        |    AND NOT (doc_id % 6 = 4 AND f.f = 1)
        |  UNION ALL
        |  SELECT doc_id + 2097152, doc_id % 10, f.f
        |  FROM documents, range(0, 6) AS f(f)
        |  WHERE doc_id % 7 = 0 AND doc_id % 11 <> 5 AND f.f < 3 + doc_id % 4
        |    AND NOT (doc_id % 13 <> 6 AND doc_id % 6 = 4 AND f.f = 1)),
        |blk AS (
        |  SELECT clip, f, bi.bi AS bi, bj.bj AS bj,
        |    64 * (((pseed * 73 + f * 29 + bj.bj * 37
        |      + bi.bi * 91) % 17) * 15) AS s
        |  FROM fr, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.clip, b.f, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.clip, b.f, u.u, v.v),
        |med AS (
        |  SELECT clip, f, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY clip, f),
        |ph AS (
        |  SELECT d.clip, d.f,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.clip = med.clip AND d.f = med.f
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.clip, d.f)
        |SELECT a.clip AS clip_a, b.clip AS clip_b,
        |  count(*)::BIGINT AS n_frames
        |FROM ph a JOIN ph b
        |  ON a.clip < b.clip AND bit_count(xor(a.h, b.h)) <= 3
        |GROUP BY a.clip, b.clip
        |HAVING count(*) >= 2""".stripMargin,
    // q140's frame-hash replay with the animated-WebP arms: a
    // not_animated container is one refusal row; a broken frame keeps
    // its parsed duration next to the frame_decode tag
    "q169_anim_webp_frames" ->
      """WITH fr AS (
        |  SELECT doc_id, f.f AS f
        |  FROM documents, range(0, 6) AS f(f)
        |  WHERE doc_id % 3 = 0 AND f.f < 3 + doc_id % 4 AND doc_id % 11 <> 5),
        |blk AS (
        |  SELECT doc_id, f, bi.bi AS bi, bj.bj AS bj,
        |    64 * ((((doc_id % 10) * 73 + f * 29 + bj.bj * 37
        |      + bi.bi * 91) % 17) * 15) AS s
        |  FROM fr, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.doc_id, b.f, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.doc_id, b.f, u.u, v.v),
        |med AS (
        |  SELECT doc_id, f, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id, f),
        |ph AS (
        |  SELECT d.doc_id, d.f,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.doc_id = med.doc_id AND d.f = med.f
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.doc_id, d.f)
        |SELECT doc_id AS media_id, f::INTEGER AS frame_idx,
        |  (CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  (40 + 10 * f)::INTEGER AS duration_ms,
        |  CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 0 ELSE h END AS phash,
        |  CASE WHEN doc_id % 6 = 4 AND f = 1 THEN 'frame_decode' ELSE '' END AS err
        |FROM ph
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, 0::INTEGER, 0::BIGINT,
        |  'not_animated'
        |FROM documents WHERE doc_id % 3 = 0 AND doc_id % 11 = 5""".stripMargin,
    // q169's frame-hash replay on the GIF wrapper (the %3==1 third):
    // 87a docs (id%13=6) decode with duration 0, the bad_lzw plant
    // (id%6=4, frame 1, shielded by the 87a arm) keeps its duration,
    // a broken signature is one container refusal row
    "q175_gif_frames" ->
      """WITH fr AS (
        |  SELECT doc_id, f.f AS f
        |  FROM documents, range(0, 6) AS f(f)
        |  WHERE doc_id % 3 = 1 AND f.f < 3 + doc_id % 4 AND doc_id % 11 <> 5),
        |blk AS (
        |  SELECT doc_id, f, bi.bi AS bi, bj.bj AS bj,
        |    64 * ((((doc_id % 10) * 73 + f * 29 + bj.bj * 37
        |      + bi.bi * 91) % 17) * 15) AS s
        |  FROM fr, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.doc_id, b.f, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.doc_id, b.f, u.u, v.v),
        |med AS (
        |  SELECT doc_id, f, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id, f),
        |ph AS (
        |  SELECT d.doc_id, d.f,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.doc_id = med.doc_id AND d.f = med.f
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.doc_id, d.f)
        |SELECT doc_id AS media_id, f::INTEGER AS frame_idx,
        |  (CASE WHEN doc_id % 13 <> 6 AND doc_id % 6 = 4 AND f = 1
        |        THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  (CASE WHEN doc_id % 13 = 6 THEN 0 ELSE 40 + 10 * f END)::INTEGER
        |    AS duration_ms,
        |  CASE WHEN doc_id % 13 <> 6 AND doc_id % 6 = 4 AND f = 1
        |       THEN 0 ELSE h END AS phash,
        |  CASE WHEN doc_id % 13 <> 6 AND doc_id % 6 = 4 AND f = 1
        |       THEN 'bad_lzw' ELSE '' END AS err
        |FROM ph
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, 0::INTEGER, 0::BIGINT,
        |  'not_gif'
        |FROM documents WHERE doc_id % 3 = 1 AND doc_id % 11 = 5""".stripMargin,
    // the q174 pixel formula's pHash replay closed-form: per-tile
    // sums (the X-basis noise term sums to ZERO over every 4x4 tile)
    // -> 8x8 block sums -> the frozen fixed-point DCT -> median bits
    // -> brute pairs (banded recall is exact at hd<=5 with 8 bands)
    "q174_vp8_phash" ->
      """WITH seeds AS (
        |  SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN 10 + doc_id % 7
        |                      ELSE doc_id % 10 END AS seed
        |  FROM documents),
        |tile AS (
        |  SELECT doc_id, seed, bx.bx AS bx, by.by AS by,
        |    16 * (7 + ((seed * 73 + bx.bx * 37 + by.by * 91) % 17) * 14) AS ts
        |  FROM seeds, range(0, 16) AS bx(bx), range(0, 16) AS by(by)),
        |blk AS (
        |  SELECT doc_id, by // 2 AS bi, bx // 2 AS bj, sum(ts) AS s
        |  FROM tile GROUP BY doc_id, by // 2, bx // 2),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.doc_id, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.doc_id, u.u, v.v),
        |med AS (
        |  SELECT doc_id, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
        |ph AS (
        |  SELECT d.doc_id,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.doc_id = med.doc_id
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    // q133's oracle VERBATIM: the corpus carries q133's exact pixels,
    // VP8L-encoded — a lossless codec layer cannot move the hash set
    "q168_webp_phash" ->
      s"""WITH $duckPhashCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    // the planted alpha plane's sum/opaque-count replayed over the
    // 64x64 grid; storage method and filter are alpha-invisible
    "q187_webp_alpha" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    ((doc_id % 7) * 31 + 3 * x.x + 5 * y.y) % 256 AS a
        |  FROM documents, range(0, 64) x(x), range(0, 64) y(y)
        |  WHERE doc_id % 11 <> 3 AND doc_id % 13 <> 5),
        |s AS (
        |  SELECT doc_id, sum(a)::BIGINT AS alpha_sum,
        |    sum(CASE WHEN a = 255 THEN 1 ELSE 0 END)::BIGINT AS n_opaque
        |  FROM g GROUP BY doc_id)
        |SELECT doc_id AS media_id, 1::INTEGER AS ok, 64::INTEGER AS w,
        |  64::INTEGER AS h, alpha_sum, n_opaque, '' AS err
        |FROM s
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, 0::INTEGER, 0::BIGINT,
        |  0::BIGINT, 'no_alpha'
        |FROM documents WHERE doc_id % 11 = 3
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, 0::INTEGER, 0::BIGINT,
        |  0::BIGINT, 'bad_alpha'
        |FROM documents WHERE doc_id % 11 <> 3 AND doc_id % 13 = 5""".stripMargin,
    // the whole IVF-PQ chain replayed: trained cells, residual
    // codebooks, probed-cell two-term ADC; rank rides the exact
    // integer fx
    "q188_ivfpq_topk" ->
      s"""WITH $duckIvfPqCtes
        |SELECT query_id, rank::INTEGER AS rank, neighbor_id,
        |  round(fx::DOUBLE / 16777216.0, 6) AS adc
        |FROM (SELECT query_id, neighbor_id, fx,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS rank
        |  FROM ipsc) t WHERE rank <= 10""".stripMargin,
    // the q182 sweep shape over the probed-cell candidate set: ADC
    // proposals exact-rescored at three rerank depths vs brute top-10
    "q189_ivfpq_recall" ->
      s"""WITH $duckIvfPqCtes,
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS crn
        |  FROM ipsc),
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |served AS (
        |  SELECT rr.r AS rerank, t.query_id, t.neighbor_id FROM (
        |    SELECT rr0.r, c.query_id, c.neighbor_id,
        |      row_number() OVER (PARTITION BY rr0.r, c.query_id
        |        ORDER BY bs.cos DESC, c.neighbor_id) AS rank
        |    FROM (VALUES (10),(30),(100)) rr0(r)
        |    JOIN ranked c ON c.crn <= rr0.r
        |    JOIN bs ON bs.query_id = c.query_id
        |      AND bs.neighbor_id = c.neighbor_id) t
        |  JOIN (VALUES (10),(30),(100)) rr(r) ON rr.r = t.r
        |  WHERE t.rank <= 10)
        |SELECT rr.r::BIGINT AS rerank, count(*)::BIGINT AS k,
        |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
        |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS recall_bp
        |FROM (VALUES (10),(30),(100)) rr(r)
        |CROSS JOIN brute b
        |LEFT JOIN served s ON s.rerank = rr.r
        |  AND s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
        |GROUP BY rr.r""".stripMargin,
    // the shared full cell ranking cut per arm (the q151 shape on the
    // composed index); each arm's proposals exact-rescore through bs
    "q193_ivfpq_nprobe_sweep" -> {
      val arms = Seq(2, 4, 8).map { np =>
        s"""ippr$np AS (
          |  SELECT query_id, cell, cfx FROM ipprall WHERE prn <= $np),
          |ipsc$np AS (
          |  SELECT pr.query_id, n.vec_id AS neighbor_id,
          |    min(pr.cfx) + sum(t.pfx) AS fx
          |  FROM renc n
          |  JOIN ippr$np pr ON pr.cell = n.cell
          |  JOIN rtab t ON t.query_id = pr.query_id
          |    AND t.s = n.s AND t.code = n.code
          |  WHERE n.vec_id != pr.query_id
          |  GROUP BY pr.query_id, n.vec_id),
          |cand$np AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY fx DESC, neighbor_id) AS crn
          |    FROM ipsc$np) t WHERE crn <= 30),
          |served$np AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT c.query_id, c.neighbor_id,
          |      row_number() OVER (PARTITION BY c.query_id
          |        ORDER BY bs.cos DESC, c.neighbor_id) AS rank
          |    FROM cand$np c JOIN bs ON bs.query_id = c.query_id
          |      AND bs.neighbor_id = c.neighbor_id) t
          |  WHERE rank <= 10)""".stripMargin
      }.mkString(",\n")
      val sel = Seq(2, 4, 8).map { np =>
        s"""SELECT $np::BIGINT AS nprobe, count(*)::BIGINT AS k,
          |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
          |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
          |    // count(*))::BIGINT AS recall_bp
          |FROM brute b LEFT JOIN served$np s
          |  ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${duckIvfPqBase("vec_id < 25")},
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |$arms
        |$sel""".stripMargin
    },
    // the codebook-width axis: per-k residual Lloyd chains share the
    // base CTEs (cells, rsubs, rqsubs, ipprall) — only seeds → rounds
    // → encode → ADC table fan per k; nProbe/rerank fixed at 4/30
    "q195_pq_width_sweep" -> {
      val widths = Seq((64, 7), (128, 3), (256, 1))
      val arms = widths.map { case (kk, stride) =>
        s"""rcb0_k$kk AS (
          |  SELECT s, vec_id AS code, sv AS cvec FROM rsubs
          |  WHERE vec_id % $stride = 0 AND vec_id < $stride * $kk),
          |${duckPqRound(s"rcb0_k$kk", s"rcb1_k$kk", subs = "rsubs")},
          |${duckPqRound(s"rcb1_k$kk", s"rcb_k$kk", subs = "rsubs")},
          |renc_k$kk AS (
          |  SELECT vec_id, cell, s, code FROM (
          |    SELECT u.vec_id, u.cell, u.s, c.code,
          |      row_number() OVER (PARTITION BY u.vec_id, u.s
          |        ORDER BY ${duckL2sq("u.sv", "c.cvec")} ASC, c.code) AS rn
          |    FROM rsubs u JOIN rcb_k$kk c ON u.s = c.s) t WHERE rn = 1),
          |rtab_k$kk AS (
          |  SELECT u.query_id, u.s, c.code,
          |    floor(${duckDotD("u.sv", "c.cvec")} * 16777216.0)::BIGINT AS pfx
          |  FROM rqsubs u JOIN rcb_k$kk c ON u.s = c.s),
          |ippr_k$kk AS (
          |  SELECT query_id, cell, cfx FROM ipprall WHERE prn <= 4),
          |ipsc_k$kk AS (
          |  SELECT pr.query_id, n.vec_id AS neighbor_id,
          |    min(pr.cfx) + sum(t.pfx) AS fx
          |  FROM renc_k$kk n
          |  JOIN ippr_k$kk pr ON pr.cell = n.cell
          |  JOIN rtab_k$kk t ON t.query_id = pr.query_id
          |    AND t.s = n.s AND t.code = n.code
          |  WHERE n.vec_id != pr.query_id
          |  GROUP BY pr.query_id, n.vec_id),
          |cand_k$kk AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY fx DESC, neighbor_id) AS crn
          |    FROM ipsc_k$kk) t WHERE crn <= 30),
          |served_k$kk AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT c.query_id, c.neighbor_id,
          |      row_number() OVER (PARTITION BY c.query_id
          |        ORDER BY bs.cos DESC, c.neighbor_id) AS rank
          |    FROM cand_k$kk c JOIN bs ON bs.query_id = c.query_id
          |      AND bs.neighbor_id = c.neighbor_id) t
          |  WHERE rank <= 10)""".stripMargin
      }.mkString(",\n")
      val sel = widths.map { case (kk, _) =>
        s"""SELECT $kk::BIGINT AS cb_k, count(*)::BIGINT AS k,
          |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
          |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
          |    // count(*))::BIGINT AS recall_bp
          |FROM brute b LEFT JOIN served_k$kk s
          |  ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${duckIvfPqBase("vec_id < 25")},
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |$arms
        |$sel""".stripMargin
    },
    // ONE k=256 codebook family; per-nProbe score passes; per-arm
    // candidate cuts — the 2D (nProbe, rerank) grid replayed
    "q206_pq_rerank_sweep" -> {
      val grid = for (np <- Seq(2, 4, 8); rr <- Seq(30, 300)) yield (np, rr)
      val perNp = Seq(2, 4, 8).map { np =>
        s"""ippr_n$np AS (
          |  SELECT query_id, cell, cfx FROM ipprall WHERE prn <= $np),
          |ipsc_n$np AS (
          |  SELECT pr.query_id, n.vec_id AS neighbor_id,
          |    min(pr.cfx) + sum(t.pfx) AS fx
          |  FROM renc_w n
          |  JOIN ippr_n$np pr ON pr.cell = n.cell
          |  JOIN rtab_w t ON t.query_id = pr.query_id
          |    AND t.s = n.s AND t.code = n.code
          |  WHERE n.vec_id != pr.query_id
          |  GROUP BY pr.query_id, n.vec_id)""".stripMargin
      }.mkString(",\n")
      val arms = grid.map { case (np, rr) =>
        s"""cand_n${np}_r$rr AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY fx DESC, neighbor_id) AS crn
          |    FROM ipsc_n$np) t WHERE crn <= $rr),
          |served_n${np}_r$rr AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT c.query_id, c.neighbor_id,
          |      row_number() OVER (PARTITION BY c.query_id
          |        ORDER BY bs.cos DESC, c.neighbor_id) AS rank
          |    FROM cand_n${np}_r$rr c JOIN bs ON bs.query_id = c.query_id
          |      AND bs.neighbor_id = c.neighbor_id) t
          |  WHERE rank <= 10)""".stripMargin
      }.mkString(",\n")
      val sel = grid.map { case (np, rr) =>
        s"""SELECT $np::BIGINT AS n_probe, $rr::BIGINT AS rerank,
          |  count(*)::BIGINT AS k,
          |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
          |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
          |    // count(*))::BIGINT AS recall_bp
          |FROM brute b LEFT JOIN served_n${np}_r$rr s
          |  ON b.query_id = s.query_id AND b.neighbor_id = s.neighbor_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${duckIvfPqBase("vec_id < 25")},
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |rcb0_w AS (
        |  SELECT s, vec_id AS code, sv AS cvec FROM rsubs
        |  WHERE vec_id < 256),
        |${duckPqRound("rcb0_w", "rcb1_w", subs = "rsubs")},
        |${duckPqRound("rcb1_w", "rcb_w", subs = "rsubs")},
        |renc_w AS (
        |  SELECT vec_id, cell, s, code FROM (
        |    SELECT u.vec_id, u.cell, u.s, c.code,
        |      row_number() OVER (PARTITION BY u.vec_id, u.s
        |        ORDER BY ${duckL2sq("u.sv", "c.cvec")} ASC, c.code) AS rn
        |    FROM rsubs u JOIN rcb_w c ON u.s = c.s) t WHERE rn = 1),
        |rtab_w AS (
        |  SELECT u.query_id, u.s, c.code,
        |    floor(${duckDotD("u.sv", "c.cvec")} * 16777216.0)::BIGINT AS pfx
        |  FROM rqsubs u JOIN rcb_w c ON u.s = c.s),
        |$perNp,
        |$arms
        |$sel""".stripMargin
    },
    // three raw href variants collapse onto one normalized key; keeper
    // and dup flags closed-form from the (id%7, id%25) group arithmetic
    "q192_canonical_dedup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 4 THEN ''
        |         ELSE 'http://example' || (doc_id % 7) || '.com/p/' ||
        |           (doc_id % 25) || '?x=1' END AS canonical
        |  FROM documents)
        |SELECT doc_id, canonical,
        |  CASE WHEN canonical = '' THEN doc_id
        |       ELSE min(doc_id) OVER (PARTITION BY canonical) END AS keeper_id,
        |  (CASE WHEN canonical <> ''
        |        AND doc_id <> min(doc_id) OVER (PARTITION BY canonical)
        |        THEN 1 ELSE 0 END)::BIGINT AS is_dup
        |FROM c""".stripMargin,
    // every expected value restated closed-form from id arithmetic
    // (the q129 cross-derivation discipline — not a regex replay)
    "q191_html_metadata" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 3 THEN ''
        |       ELSE 'Doc & ' || doc_id || ' overview' END AS title,
        |  CASE WHEN doc_id % 5 = 2 THEN ''
        |       ELSE 'Summary "' || doc_id || '" here' END AS meta_desc,
        |  CASE WHEN doc_id % 6 = 4 THEN ''
        |       ELSE 'http://example' || (doc_id % 7) || '.com/a/b/' ||
        |         doc_id || '?x=1' END AS canonical,
        |  CASE WHEN doc_id % 11 = 5 THEN ''
        |       WHEN doc_id % 3 = 0 THEN 'en'
        |       WHEN doc_id % 3 = 1 THEN 'de-DE'
        |       ELSE 'fr' END AS lang
        |FROM documents""".stripMargin,
    // the lifecycle (write/append/retire/re-append) leaves exactly the
    // full corpus live, so the oracle is the closed-form IVF-PQ probe
    // at the q190 batch/nProbe/k
    "q190_ivfpq_index_probe" ->
      s"""WITH ${duckIvfPqCtesFor(queryWhere = "vec_id % 20 = 0", nProbe = 3)}
        |SELECT query_id, rank::INTEGER AS rank, neighbor_id,
        |  round(fx::DOUBLE / 16777216.0, 6) AS adc
        |FROM (SELECT query_id, neighbor_id, fx,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS rank
        |  FROM ipsc) t WHERE rank <= 8""".stripMargin,
    // the q190 lifecycle chain replayed wholesale over the rotated
    // frame — centroids, residual codebooks, encoding, probes, and
    // ADC all in the rotated space, exactly what the persisted index
    // with rotated=true serves
    "q205_rotated_index_probe" ->
      s"""WITH $duckHadamardCte,
        |${duckIvfPqCtesFor(queryWhere = "vec_id % 20 = 0", nProbe = 3,
            src = "hrot")}
        |SELECT query_id, rank::INTEGER AS rank, neighbor_id,
        |  round(fx::DOUBLE / 16777216.0, 6) AS adc
        |FROM (SELECT query_id, neighbor_id, fx,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS rank
        |  FROM ipsc) t WHERE rank <= 8""".stripMargin,
    // every field closed-form; plant precedence not_bmff > not_heif
    // > truncated > no_ispe
    "q186_avif_headers" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |           OR doc_id % 5 = 3 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |         OR doc_id % 5 = 3 THEN ''
        |       WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS brand,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |         OR doc_id % 5 = 3 THEN 0
        |        ELSE 16 + doc_id % 200 END)::BIGINT AS width,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |         OR doc_id % 5 = 3 THEN 0
        |        ELSE 16 + doc_id % 120 END)::BIGINT AS height,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |         OR doc_id % 5 = 3 THEN 0
        |        WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::INTEGER AS n_ispe,
        |  CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 4 OR doc_id % 13 = 6
        |         OR doc_id % 5 = 3 THEN ''
        |       WHEN doc_id % 2 = 0 THEN 'av01' ELSE 'hevc' END AS codec,
        |  CASE WHEN doc_id % 7 = 2 THEN 'not_bmff'
        |       WHEN doc_id % 11 = 4 THEN 'not_heif'
        |       WHEN doc_id % 13 = 6 THEN 'truncated'
        |       WHEN doc_id % 5 = 3 THEN 'no_ispe' ELSE '' END AS err
        |FROM documents""".stripMargin,
    // reference counts + add-one smoothing + the per-pair floored
    // milli-nat replayed; right join keeps 0-pair docs at zeros
    "q185_bigram_nll" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 2 = 0 AS is_ref,
        |    list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS ws
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, is_ref, p[1] AS w1, p[2] AS w2
        |  FROM (SELECT doc_id, is_ref,
        |      unnest(list_zip(ws[1 : len(ws) - 1], ws[2 : len(ws)])) AS p
        |    FROM t WHERE len(ws) >= 2)),
        |uni2 AS (
        |  SELECT w1, count(*) AS c1 FROM (
        |    SELECT doc_id, unnest(ws) AS w1 FROM t WHERE is_ref) GROUP BY w1),
        |bi AS (
        |  SELECT w1, w2, count(*) AS c2 FROM pairs WHERE is_ref
        |  GROUP BY w1, w2),
        |voc AS (SELECT count(*)::BIGINT AS v FROM uni2),
        |scored AS (
        |  SELECT p.doc_id,
        |    floor(1000.0 * ln((coalesce(u.c1, 0) + voc.v)::DOUBLE /
        |      (coalesce(b.c2, 0) + 1)::DOUBLE))::BIGINT AS si
        |  FROM pairs p
        |  LEFT JOIN uni2 u ON u.w1 = p.w1
        |  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  CROSS JOIN voc),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_pairs,
        |    sum(si)::BIGINT AS nll_milli
        |  FROM scored GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(a.n_pairs, 0)::BIGINT AS n_pairs,
        |  coalesce(a.nll_milli, 0)::BIGINT AS nll_milli,
        |  coalesce(a.nll_milli // a.n_pairs, 0)::BIGINT AS avg_nll_milli
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,
    // the planted (file, agent, path) truth table: the deny-all '*'
    // group blocks otherbot everywhere under file B; graftbot's
    // specific group blocks only /graft/; file A blocks /private/
    // (minus the longer Allow) and the $-anchored *.pdf
    "q184_robots" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'GraftBot/1.0'
        |       ELSE 'OtherBot/2.0' END AS agent,
        |  CASE doc_id % 6 WHEN 0 THEN '/' WHEN 1 THEN '/private/x'
        |    WHEN 2 THEN '/private/open' WHEN 3 THEN '/docs/a.pdf'
        |    WHEN 4 THEN '/graft/secret' ELSE '/public/page.html' END AS path,
        |  (CASE
        |    WHEN doc_id % 5 = 2 AND doc_id % 2 = 1 THEN 0
        |    WHEN doc_id % 5 = 2 THEN
        |      CASE WHEN doc_id % 6 = 4 THEN 0 ELSE 1 END
        |    ELSE CASE WHEN doc_id % 6 IN (1, 3) THEN 0 ELSE 1 END
        |   END)::BIGINT AS allowed
        |FROM documents""".stripMargin,
    // every field closed-form from id arithmetic; plant precedence
    // not_tiff > truncated > bad_ifd (a self-looping IFD chain)
    "q183_tiff_headers" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |       THEN ''
        |       WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0 ELSE 16 + doc_id % 100 END)::BIGINT AS width,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0 ELSE 16 + doc_id % 50 END)::BIGINT AS height,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0 ELSE 8 END)::INTEGER AS bits,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0
        |        WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 5
        |        ELSE 7 END)::INTEGER AS compression,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0
        |        WHEN doc_id % 4 = 0 THEN 2 ELSE 1 END)::INTEGER AS photometric,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0
        |        WHEN doc_id % 4 = 0 THEN 3 ELSE 1 END)::INTEGER AS samples,
        |  (CASE WHEN doc_id % 7 = 2 OR doc_id % 11 = 6 OR doc_id % 13 = 8
        |        THEN 0 ELSE 1 + doc_id % 3 END)::INTEGER AS n_pages,
        |  CASE WHEN doc_id % 7 = 2 THEN 'not_tiff'
        |       WHEN doc_id % 11 = 6 THEN 'truncated'
        |       WHEN doc_id % 13 = 8 THEN 'bad_ifd' ELSE '' END AS err
        |FROM documents""".stripMargin,
    // training + encoding + ADC replayed end-to-end; the rank rides
    // the raw fixed-point sum (integer-exact across engines)
    "q181_pq_topk" ->
      s"""WITH $duckPqCtes
        |SELECT query_id, rank::INTEGER AS rank, neighbor_id,
        |  round(fx::DOUBLE / 16777216.0, 6) AS adc
        |FROM (SELECT query_id, neighbor_id, fx,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS rank
        |  FROM pqsc) t WHERE rank <= 10""".stripMargin,
    // the q151 sweep shape: ADC-proposed candidates exact-rescored at
    // three rerank depths vs the brute fp32 top-10, one row per depth
    "q182_pq_recall" ->
      s"""WITH $duckPqCtes,
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY fx DESC, neighbor_id) AS crn
        |  FROM pqsc),
        |bs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${duckDot("q.embedding", "c.embedding")}, 6) AS cos
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 25 AND c.vec_id != q.vec_id),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM bs) t WHERE rank <= 10),
        |served AS (
        |  SELECT rr.r AS rerank, t.query_id, t.neighbor_id FROM (
        |    SELECT rr0.r, c.query_id, c.neighbor_id,
        |      row_number() OVER (PARTITION BY rr0.r, c.query_id
        |        ORDER BY bs.cos DESC, c.neighbor_id) AS rank
        |    FROM (VALUES (10),(30),(100)) rr0(r)
        |    JOIN ranked c ON c.crn <= rr0.r
        |    JOIN bs ON bs.query_id = c.query_id
        |      AND bs.neighbor_id = c.neighbor_id) t
        |  JOIN (VALUES (10),(30),(100)) rr(r) ON rr.r = t.r
        |  WHERE t.rank <= 10)
        |SELECT rr.r::BIGINT AS rerank, count(*)::BIGINT AS k,
        |  sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
        |  ((10000 * sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
        |    // count(*))::BIGINT AS recall_bp
        |FROM (VALUES (10),(30),(100)) rr(r)
        |CROSS JOIN brute b
        |LEFT JOIN served s ON s.rerank = rr.r
        |  AND s.query_id = b.query_id AND s.neighbor_id = b.neighbor_id
        |GROUP BY rr.r""".stripMargin,
    // every field closed-form from id arithmetic; plant precedence
    // not_ogg > truncated > no_tags > bad_tags; the spanning arm
    // (id%5==3) is field-invisible so it never appears here
    "q180_ogg_tags" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |           OR doc_id % 11 = 5 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |         OR doc_id % 11 = 5 THEN ''
        |       WHEN doc_id % 2 = 1 THEN 'opus' ELSE 'vorbis' END AS codec,
        |  CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |         OR doc_id % 11 = 5 THEN ''
        |       ELSE 'graft-' || (doc_id % 10) END AS vendor,
        |  CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |         OR doc_id % 11 = 5 THEN ''
        |       ELSE 'Title ' || doc_id END AS title,
        |  CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |         OR doc_id % 11 = 5 THEN ''
        |       ELSE 'Artist ' || (doc_id % 100) END AS artist,
        |  CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |         OR doc_id % 11 = 5 THEN ''
        |       WHEN doc_id % 3 = 0 THEN 'Album ' || (doc_id % 7)
        |       ELSE '' END AS album,
        |  (CASE WHEN doc_id % 7 IN (2, 4) OR doc_id % 13 = 3
        |           OR doc_id % 11 = 5 THEN 0
        |        ELSE 2 + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
        |           + (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END)
        |        END)::INTEGER AS n_comments,
        |  CASE WHEN doc_id % 7 = 2 THEN 'not_ogg'
        |       WHEN doc_id % 7 = 4 THEN 'truncated'
        |       WHEN doc_id % 13 = 3 THEN 'no_tags'
        |       WHEN doc_id % 11 = 5 THEN 'bad_tags'
        |       ELSE '' END AS err
        |FROM documents""".stripMargin,
    // every field closed-form from id arithmetic: version by xref
    // form, /Size by object layout (8 classic / 9 xref-stream /
    // 10 objstm), plant precedence not_pdf > truncated > encrypted
    "q178_pdf_headers" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    (doc_id % 11 = 7 OR doc_id % 19 = 13) AS dead,
        |    (doc_id % 11 <> 7 AND doc_id % 19 <> 13 AND doc_id % 39 = 35
        |      AND doc_id % 5 = 3) AS pwstm
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  (CASE WHEN dead OR pwstm THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN dead THEN ''
        |       WHEN doc_id % 5 IN (1, 3) THEN '1.5' ELSE '1.4' END AS version,
        |  (CASE WHEN dead OR pwstm THEN 0
        |        WHEN doc_id % 5 = 3 THEN 10
        |        WHEN doc_id % 5 = 1 THEN 9 ELSE 8 END
        |   + CASE WHEN dead OR pwstm THEN 0
        |          WHEN doc_id % 7 IN (4, 5) THEN 2
        |          WHEN doc_id % 7 IN (1, 2, 3, 6) THEN 1
        |          ELSE 0 END)::BIGINT AS n_objects,
        |  (CASE WHEN dead OR pwstm THEN 0 ELSE 2 END)::BIGINT AS n_pages,
        |  (CASE WHEN NOT dead AND NOT pwstm AND doc_id % 13 = 9
        |        THEN 1 ELSE 0 END)::INTEGER AS encrypted,
        |  CASE WHEN doc_id % 11 = 7 THEN 'not_pdf'
        |       WHEN doc_id % 19 = 13 THEN 'truncated'
        |       WHEN pwstm THEN 'encrypted' ELSE '' END AS err
        |FROM f""".stripMargin,
    // the planted text replayed verbatim (+ the frozen ET newline);
    // the closed-form second page; the three whole-doc refusals and
    // the page-level LZW arm beside its extracting sibling
    "q179_pdf_text" ->
      """WITH good AS (
        |  SELECT doc_id,
        |    coalesce(text, '') ||
        |      CASE WHEN doc_id % 7 BETWEEN 1 AND 5 THEN ' café' ELSE '' END
        |      AS text,
        |    doc_id % 7 = 6 AS badfont,
        |    -- empty-user-password RC4 (39=9) / AESV2 (39=22) extract
        |    -- exactly like plaintext; the LZW plant never coincides
        |    -- (the fixture's enc class excludes it)
        |    (doc_id % 13 <> 9 AND doc_id % 17 = 11) AS lzw
        |  FROM documents
        |  WHERE doc_id % 11 <> 7 AND doc_id % 19 <> 13
        |    AND (doc_id % 13 <> 9 OR doc_id % 39 IN (9, 22)))
        |SELECT doc_id AS media_id, 0::INTEGER AS page_idx,
        |  (CASE WHEN badfont THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN badfont THEN '' ELSE text || chr(10) END AS text,
        |  CASE WHEN badfont THEN 'unsupported_font' ELSE '' END AS err
        |FROM good
        |UNION ALL
        |SELECT doc_id, 1::INTEGER,
        |  (CASE WHEN lzw OR badfont THEN 0 ELSE 1 END)::INTEGER,
        |  CASE WHEN lzw OR badfont THEN ''
        |       ELSE 'second page of document ' || doc_id ||
        |         CASE WHEN doc_id % 7 BETWEEN 1 AND 5 THEN ' café' ELSE '' END
        |         || chr(10) END,
        |  CASE WHEN lzw THEN 'unsupported_filter'
        |       WHEN badfont THEN 'unsupported_font' ELSE '' END
        |FROM good
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, '', 'not_pdf'
        |FROM documents WHERE doc_id % 11 = 7
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, '', 'truncated'
        |FROM documents WHERE doc_id % 11 <> 7 AND doc_id % 19 = 13
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, '', 'encrypted'
        |FROM documents
        |WHERE doc_id % 11 <> 7 AND doc_id % 19 <> 13 AND doc_id % 39 = 35""".stripMargin,
    // generation + every repetition measure replayed: line/paragraph
    // value counts, modal n-gram (count ties to the longest), and the
    // 5..10-gram position-coverage character fractions
    "q177_gopher_repetition" ->
      """WITH pages AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '') || chr(10)
        |          ELSE '' END) ||
        |    'unique ' || doc_id || ' tail words here' || chr(10) ||
        |    (CASE WHEN doc_id % 4 = 1 THEN trim(repeat('spam ham ', 30))
        |          ELSE 'calm close' END) ||
        |    chr(10) || chr(10) ||
        |    (CASE WHEN doc_id % 5 = 2
        |          THEN 'para block one' || chr(10) || chr(10) || 'para block one'
        |          ELSE 'para ' || doc_id END) AS page
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, page,
        |    list_filter(string_split(lower(trim(page)), ' '), x -> x != '') AS ws
        |  FROM pages),
        |tchars AS (
        |  SELECT doc_id,
        |    coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS tc
        |  FROM toks),
        |lcnt AS (
        |  SELECT doc_id, e, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_filter(list_transform(
        |      string_split(page, chr(10)), l -> trim(l)), l -> l != '')) AS e
        |    FROM pages) GROUP BY doc_id, e),
        |lagg AS (
        |  SELECT doc_id, sum(c) AS n,
        |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dn,
        |    sum(c * length(e)) AS ch,
        |    sum(CASE WHEN c >= 2 THEN c * length(e) ELSE 0 END) AS dch
        |  FROM lcnt GROUP BY doc_id),
        |pcnt AS (
        |  SELECT doc_id, e, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_filter(list_transform(
        |      string_split(page, chr(10) || chr(10)), p -> trim(p)),
        |      p -> p != '')) AS e
        |    FROM pages) GROUP BY doc_id, e),
        |pagg AS (
        |  SELECT doc_id, sum(c) AS n,
        |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dn,
        |    sum(c * length(e)) AS ch,
        |    sum(CASE WHEN c >= 2 THEN c * length(e) ELSE 0 END) AS dch
        |  FROM pcnt GROUP BY doc_id),
        |grows AS (
        |  SELECT doc_id, n, j, array_to_string(ws[j+1 : j+n], ' ') AS g,
        |    length(array_to_string(ws[j+1 : j+n], '')) AS glen
        |  FROM (
        |    SELECT t.doc_id, t.ws, nn.n AS n,
        |      unnest(range(0, greatest(len(t.ws) - nn.n + 1, 0))) AS j
        |    FROM toks t,
        |      (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) nn(n))),
        |gcnt AS (
        |  SELECT doc_id, n, g, count(*) AS c, min(glen) AS glen,
        |    list(j) AS js
        |  FROM grows GROUP BY doc_id, n, g),
        |tops AS (
        |  SELECT doc_id, n,
        |    (CASE WHEN c >= 2 THEN c * glen ELSE 0 END) AS topnum
        |  FROM (SELECT doc_id, n, c, glen, row_number() OVER (
        |      PARTITION BY doc_id, n ORDER BY c DESC, glen DESC) AS rn
        |    FROM gcnt WHERE n <= 4) WHERE rn = 1),
        |occ AS (
        |  SELECT doc_id, n, unnest(js) AS j
        |  FROM gcnt WHERE c >= 2 AND n >= 5),
        |cov AS (
        |  SELECT DISTINCT doc_id, n, pos FROM (
        |    SELECT doc_id, n, unnest(range(j, j + n)) AS pos FROM occ)),
        |tlen AS (
        |  SELECT doc_id, pos, length(ws[pos + 1]) AS wlen
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS pos FROM toks)),
        |dupch AS (
        |  SELECT c.doc_id, c.n, sum(t.wlen) AS dch
        |  FROM cov c JOIN tlen t ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  GROUP BY c.doc_id, c.n),
        |m AS (
        |  SELECT d.doc_id,
        |    floor(10000 * la.dn / la.n)::BIGINT AS dup_line_bp,
        |    (CASE WHEN la.ch > 0 THEN floor(10000 * la.dch / la.ch)
        |          ELSE 0 END)::BIGINT AS dup_line_char_bp,
        |    floor(10000 * pa.dn / pa.n)::BIGINT AS dup_para_bp,
        |    (CASE WHEN pa.ch > 0 THEN floor(10000 * pa.dch / pa.ch)
        |          ELSE 0 END)::BIGINT AS dup_para_char_bp,
        |    floor(10000 * coalesce(t2.topnum, 0) / tc.tc)::BIGINT AS top2_gram_bp,
        |    floor(10000 * coalesce(t3.topnum, 0) / tc.tc)::BIGINT AS top3_gram_bp,
        |    floor(10000 * coalesce(t4.topnum, 0) / tc.tc)::BIGINT AS top4_gram_bp,
        |    floor(10000 * coalesce(d5.dch, 0) / tc.tc)::BIGINT AS dup5_gram_bp,
        |    floor(10000 * coalesce(d6.dch, 0) / tc.tc)::BIGINT AS dup6_gram_bp,
        |    floor(10000 * coalesce(d7.dch, 0) / tc.tc)::BIGINT AS dup7_gram_bp,
        |    floor(10000 * coalesce(d8.dch, 0) / tc.tc)::BIGINT AS dup8_gram_bp,
        |    floor(10000 * coalesce(d9.dch, 0) / tc.tc)::BIGINT AS dup9_gram_bp,
        |    floor(10000 * coalesce(d10.dch, 0) / tc.tc)::BIGINT AS dup10_gram_bp
        |  FROM documents d
        |  JOIN tchars tc ON tc.doc_id = d.doc_id
        |  JOIN lagg la ON la.doc_id = d.doc_id
        |  JOIN pagg pa ON pa.doc_id = d.doc_id
        |  LEFT JOIN tops t2 ON t2.doc_id = d.doc_id AND t2.n = 2
        |  LEFT JOIN tops t3 ON t3.doc_id = d.doc_id AND t3.n = 3
        |  LEFT JOIN tops t4 ON t4.doc_id = d.doc_id AND t4.n = 4
        |  LEFT JOIN dupch d5 ON d5.doc_id = d.doc_id AND d5.n = 5
        |  LEFT JOIN dupch d6 ON d6.doc_id = d.doc_id AND d6.n = 6
        |  LEFT JOIN dupch d7 ON d7.doc_id = d.doc_id AND d7.n = 7
        |  LEFT JOIN dupch d8 ON d8.doc_id = d.doc_id AND d8.n = 8
        |  LEFT JOIN dupch d9 ON d9.doc_id = d.doc_id AND d9.n = 9
        |  LEFT JOIN dupch d10 ON d10.doc_id = d.doc_id AND d10.n = 10)
        |SELECT *, (CASE WHEN dup_line_bp <= 3000 AND dup_para_bp <= 3000
        |  AND dup_line_char_bp <= 2000 AND dup_para_char_bp <= 2000
        |  AND top2_gram_bp <= 2000 AND top3_gram_bp <= 1800
        |  AND top4_gram_bp <= 1600 AND dup5_gram_bp <= 1500
        |  AND dup6_gram_bp <= 1400 AND dup7_gram_bp <= 1300
        |  AND dup8_gram_bp <= 1200 AND dup9_gram_bp <= 1100
        |  AND dup10_gram_bp <= 1000 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM m""".stripMargin,
    // q133's oracle VERBATIM over single-frame GIFs (q168's claim on
    // the fifth codec: LZW/palette/interlace cannot move the hash set)
    "q176_gif_phash" ->
      s"""WITH $duckPhashCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    // q133's pair set restricted to pairs touching the probed fifth —
    // the q118 oracle pattern on the image modality
    "q160_phash_index_probe" ->
      s"""WITH $duckPhashCtes
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5
        |  AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)""".stripMargin,
    // the q43 recursive-closure pattern over the q133 pair edges:
    // cluster id = min member, canonical representative keeps
    "q137_phash_clusters" ->
      s"""WITH RECURSIVE $duckPhashCtes,
        |e AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 5),
        |und AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
        |reach AS (
        |  SELECT u, u AS label FROM (SELECT DISTINCT u FROM und) t
        |  UNION
        |  SELECT und.u, r.label FROM und JOIN reach r ON und.v = r.u),
        |cl AS (SELECT u AS media_id, min(label) AS cluster_id FROM reach GROUP BY u)
        |SELECT d.doc_id AS media_id,
        |  coalesce(cl.cluster_id, d.doc_id)::BIGINT AS cluster_id,
        |  (CASE WHEN coalesce(cl.cluster_id, d.doc_id) = d.doc_id
        |        THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM documents d LEFT JOIN cl ON cl.media_id = d.doc_id""".stripMargin,
    // full rule replay over the same token/line conventions; floored
    // integer ratios make every measure hash-exact
    "q135_gopher_rules" -> q135Oracle,
    // composition of the q137/q22/q135 replays with the query's
    // drop-reason precedence
    "q157_paired_curation" -> q157Oracle,
    // the incremental (delta-vs-standing) decision rule: pairwise
    // any-standing-or-smaller-delta partner, no closure — the q160/
    // q118 pair replays + the structural-gopher gate, delta ids only
    "q161_paired_delta" ->
      s"""WITH $duckPhashCtes,
        |$corpusDocs,
        |$q22Ctes,
        |$gopherCtes,
        |ie AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 5),
        |imgdup AS (
        |  SELECT DISTINCT d FROM (
        |    SELECT id_b AS d FROM ie WHERE id_b % 5 = 0
        |    UNION ALL
        |    SELECT id_a FROM ie WHERE id_a % 5 = 0 AND id_b % 5 <> 0) t),
        |ce AS (SELECT id_a, id_b FROM j WHERE jac >= 0.7),
        |capdup AS (
        |  SELECT DISTINCT d FROM (
        |    SELECT id_b AS d FROM ce WHERE id_b % 5 = 0
        |    UNION ALL
        |    SELECT id_a FROM ce WHERE id_a % 5 = 0 AND id_b % 5 <> 0) t),
        |f AS (
        |  SELECT gk.doc_id,
        |    (CASE WHEN gk.n_words >= 50 AND gk.n_words <= 100000
        |          AND gk.mean_word_len_milli >= 3000 AND gk.mean_word_len_milli <= 10000
        |          AND gk.symbol_bp <= 1000 AND gk.bullet_bp <= 9000
        |          AND gk.ellipsis_bp <= 3000 AND gk.alpha_bp >= 8000
        |          THEN 1 ELSE 0 END) AS keep,
        |    (gk.doc_id IN (SELECT d FROM capdup)) AS cdup,
        |    (gk.doc_id IN (SELECT d FROM imgdup)) AS idup
        |  FROM gk WHERE gk.doc_id % 5 = 0)
        |SELECT doc_id,
        |  (CASE WHEN keep = 1 AND NOT cdup AND NOT idup THEN 1 ELSE 0 END)::BIGINT AS kept,
        |  CASE WHEN keep = 0 THEN 'caption_quality'
        |       WHEN cdup THEN 'caption_dup'
        |       WHEN idup THEN 'image_dup'
        |       ELSE '' END AS drop_reason
        |FROM f""".stripMargin,
    // generation AND line cleaning replayed — every rule path planted
    "q136_c4_clean" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || '.' || chr(10) ||
        |    'this javascript line is dropped.' || chr(10) ||
        |    'too short.' || chr(10) ||
        |    'a second kept line stays here.' || chr(10) ||
        |    'no terminal punctuation line here' || chr(10) ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'hidden lorem ipsum marker' || chr(10) ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 3 THEN 'code { block }' || chr(10) ELSE '' END AS page
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, page,
        |    list_filter(list_transform(string_split(page, chr(10)), x -> trim(x)), x -> x != '') AS ls
        |  FROM p),
        |k AS (
        |  SELECT doc_id, ls,
        |    list_filter(ls, x ->
        |      (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?') OR ends_with(x, '"'))
        |      AND len(list_filter(string_split(lower(x), ' '), w -> w != '')) >= 3
        |      AND NOT contains(lower(x), 'javascript') AND NOT contains(x, '{')) AS kept,
        |    (contains(lower(page), 'lorem ipsum') OR contains(page, '{')) AS pdrop
        |  FROM l)
        |SELECT doc_id, len(ls)::BIGINT AS n_lines,
        |  (CASE WHEN pdrop THEN 0 ELSE len(kept) END)::BIGINT AS n_kept,
        |  (CASE WHEN pdrop OR len(kept) = 0 THEN 0 ELSE 1 END)::BIGINT AS keep,
        |  CASE WHEN pdrop OR len(kept) = 0 THEN ''
        |       ELSE array_to_string(kept, chr(10)) END AS clean_text
        |FROM k""".stripMargin,
    // syllable/sentence heuristics + floored milli terms, all integer
    "q138_readability" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(trim(coalesce(text, ''))), ' '), x -> x != '') AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(ws)::BIGINT AS n_words,
        |    greatest(1, len(regexp_extract_all(coalesce(text, ''), '[.!?]+')))::BIGINT AS n_sentences,
        |    coalesce(list_sum(list_transform(ws,
        |      x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)::BIGINT AS n_syllables
        |  FROM w)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0
        |       THEN ((390 * n_words) // n_sentences
        |             + (11800 * n_syllables) // n_words - 15590)::BIGINT
        |       ELSE NULL END AS fk_milli
        |FROM m""".stripMargin,
    // the q135/q136/q138 replays fused and rolled up per source
    "q139_source_audit" ->
      """WITH w AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split(lower(trim(coalesce(text, ''))), ' '), x -> x != '') AS ws,
        |    list_filter(list_transform(string_split(coalesce(text, ''), chr(10)), x -> trim(x)), x -> x != '') AS ls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source,
        |    len(ws)::BIGINT AS n_words,
        |    (CASE WHEN len(ws) > 0 THEN (1000 * list_sum(list_transform(ws, x -> length(x)))) // len(ws) ELSE 0 END)::BIGINT AS mw,
        |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...')))) // len(ws) ELSE 0 END)::BIGINT AS sy_bp,
        |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•')))) // len(ls) ELSE 0 END)::BIGINT AS bu_bp,
        |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> ends_with(x, '...')))) // len(ls) ELSE 0 END)::BIGINT AS el_bp,
        |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))) // len(ws) ELSE 0 END)::BIGINT AS al_bp,
        |    len(list_filter(list_distinct(ws), x -> list_contains(['the','be','to','of','and','that','have','with'], x)))::BIGINT AS st,
        |    (CASE WHEN (contains(lower(coalesce(text, '')), 'lorem ipsum') OR contains(coalesce(text, ''), '{'))
        |             OR len(list_filter(ls, x ->
        |               (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?') OR ends_with(x, '"'))
        |               AND len(list_filter(string_split(lower(x), ' '), v -> v != '')) >= 3
        |               AND NOT contains(lower(x), 'javascript') AND NOT contains(x, '{'))) = 0
        |          THEN 0 ELSE 1 END)::BIGINT AS ck,
        |    greatest(1, len(regexp_extract_all(coalesce(text, ''), '[.!?]+')))::BIGINT AS n_sentences,
        |    coalesce(list_sum(list_transform(ws,
        |      x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)::BIGINT AS n_syllables
        |  FROM w),
        |f AS (
        |  SELECT source,
        |    (CASE WHEN n_words >= 50 AND n_words <= 100000 AND mw >= 3000 AND mw <= 10000
        |          AND sy_bp <= 1000 AND bu_bp <= 9000 AND el_bp <= 3000 AND al_bp >= 8000
        |          AND st >= 2 THEN 1 ELSE 0 END)::BIGINT AS gk,
        |    ck,
        |    CASE WHEN n_words > 0
        |         THEN (390 * n_words) // n_sentences + (11800 * n_syllables) // n_words - 15590
        |         ELSE NULL END AS fk
        |  FROM m)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  ((10000 * sum(gk)) // count(*))::BIGINT AS gopher_keep_bp,
        |  ((10000 * sum(ck)) // count(*))::BIGINT AS c4_keep_bp,
        |  (CASE WHEN count(fk) = 0 THEN NULL
        |        ELSE sum(fk) // count(fk) END)::BIGINT AS mean_fk_milli
        |FROM f GROUP BY source""".stripMargin,
    // per-(clip, frame) pHash replay: the 64x64 DC-only frames are 8x8
    // constant blocks aligned with the hash cells, so each 8x8-pixel
    // cell sums to 64x one block value — no pixel explosion needed;
    // frame count is 3 + id%4 (the multi-chunk clips land extra frames)
    // the SAME replay serves q208: the H.264 corpus carries the
    // identical pixel law and plant, and the codec chain must land on
    // exactly these hashes
    "q208_avc_frames" -> videoFramesOracle,
    "q140_video_frames" -> videoFramesOracle,
    // the q140/q208 hash chain keyed once per doc, fanned to the two
    // clip-id spaces, then the q141 pair join — cross-codec pairs are
    // the (doc, doc + 2^20) rows
    "q209_cross_codec_clip_dups" ->
      s"""WITH ${videoPhashCtes("doc_id % 5 = 0")},
        |live AS (
        |  SELECT doc_id AS clip, f, h FROM ph
        |  WHERE NOT (doc_id % 6 = 4 AND f = 1)
        |  UNION ALL
        |  SELECT doc_id + 1048576, f, h FROM ph
        |  WHERE NOT (doc_id % 6 = 4 AND f = 1))
        |SELECT a.clip AS clip_a, b.clip AS clip_b,
        |  count(*)::BIGINT AS n_frames
        |FROM live a JOIN live b
        |  ON a.clip < b.clip AND bit_count(xor(a.h, b.h)) <= 3
        |GROUP BY a.clip, b.clip
        |HAVING count(*) >= 2""".stripMargin,
    // q140's hash replay + a cross-clip frame-pair join at hd<=3 +
    // the >=2-shared-frames clip criterion
    "q141_clip_dups" ->
      """WITH fr AS (
        |  SELECT doc_id, f.f AS f
        |  FROM documents, range(0, 6) AS f(f) WHERE f.f < 3 + doc_id % 4),
        |blk AS (
        |  SELECT doc_id, f, bi.bi AS bi, bj.bj AS bj,
        |    64 * ((((doc_id % 10) * 73 + f * 29 + bj.bj * 37
        |      + bi.bi * 91) % 17) * 15) AS s
        |  FROM fr, range(0, 8) AS bi(bi), range(0, 8) AS bj(bj)),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.doc_id, b.f, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS fc
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY b.doc_id, b.f, u.u, v.v),
        |med AS (
        |  SELECT doc_id, f, list_sort(list(fc))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id, f),
        |ph AS (
        |  SELECT d.doc_id, d.f,
        |    sum(CASE WHEN d.fc > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.doc_id = med.doc_id AND d.f = med.f
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.doc_id, d.f),
        |live AS (
        |  SELECT doc_id, f, h FROM ph
        |  WHERE NOT (doc_id % 6 = 4 AND f = 1))
        |SELECT a.doc_id AS clip_a, b.doc_id AS clip_b,
        |  count(*)::BIGINT AS n_frames
        |FROM live a JOIN live b
        |  ON a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 3
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 2""".stripMargin,
    // the q43 closure defines the split key; the q71 split hash
    // applies to the CLUSTER id (singletons key by their own id)
    "q142_group_split" ->
      s"""$q43Ctes,
        |cl AS (SELECT u, min(label) AS cluster_id FROM reach GROUP BY u),
        |wc AS (
        |  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cl ON cl.u = d.doc_id)
        |SELECT doc_id, cluster_id::BIGINT AS cluster_id,
        |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |  ((10368889 * ${duckPolyHash("CAST(cluster_id AS VARCHAR)", 1L << 31)} + 8342140)
        |    % ${1L << 31}) % 10000 AS b
        |  FROM wc) t""".stripMargin,
    // the q43 closure + token counts rolled up per source; canonical
    // = min cluster member, so removed = member of a cluster it does
    // not lead
    "q143_dedup_savings" ->
      s"""$q43Ctes,
        |cl AS (SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u),
        |tk AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(lower(trim(coalesce(text, ''))), ' '), x -> x != ''))::BIGINT AS n_tokens
        |  FROM documents),
        |j AS (
        |  SELECT tk.source, tk.n_tokens,
        |    CASE WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> tk.doc_id
        |         THEN 1 ELSE 0 END AS removed
        |  FROM tk LEFT JOIN cl USING (doc_id))
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(removed)::BIGINT AS n_removed,
        |  sum(n_tokens)::BIGINT AS tokens_total,
        |  sum(CASE WHEN removed = 1 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_removed,
        |  (CASE WHEN sum(n_tokens) > 0
        |        THEN (10000 * sum(CASE WHEN removed = 1 THEN n_tokens ELSE 0 END)) // sum(n_tokens)
        |        ELSE 0 END)::BIGINT AS savings_bp
        |FROM j GROUP BY source""".stripMargin,
    // the q139 fused replay re-keyed by the q27 language argmax, plus
    // the subword-proxy fertility (q26's pretokenizer regex) per lang
    "q144_lang_audit" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(trim(coalesce(text, ''))), ' '), x -> x != '') AS ws,
        |    list_filter(list_transform(string_split(coalesce(text, ''), chr(10)), x -> trim(x)), x -> x != '') AS ls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(ws)::BIGINT AS nw,
        |    (CASE WHEN len(ws) > 0 THEN (1000 * list_sum(list_transform(ws, x -> length(x)))) // len(ws) ELSE 0 END)::BIGINT AS mw,
        |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...')))) // len(ws) ELSE 0 END)::BIGINT AS sy_bp,
        |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•')))) // len(ls) ELSE 0 END)::BIGINT AS bu_bp,
        |    (CASE WHEN len(ls) > 0 THEN (10000 * len(list_filter(ls, x -> ends_with(x, '...')))) // len(ls) ELSE 0 END)::BIGINT AS el_bp,
        |    (CASE WHEN len(ws) > 0 THEN (10000 * len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))) // len(ws) ELSE 0 END)::BIGINT AS al_bp,
        |    len(list_filter(list_distinct(ws), x -> list_contains(['the','be','to','of','and','that','have','with'], x)))::BIGINT AS st,
        |    (CASE WHEN (contains(lower(coalesce(text, '')), 'lorem ipsum') OR contains(coalesce(text, ''), '{'))
        |             OR len(list_filter(ls, x ->
        |               (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?') OR ends_with(x, '"'))
        |               AND len(list_filter(string_split(lower(x), ' '), v -> v != '')) >= 3
        |               AND NOT contains(lower(x), 'javascript') AND NOT contains(x, '{'))) = 0
        |          THEN 0 ELSE 1 END)::BIGINT AS ck,
        |    greatest(1, len(regexp_extract_all(coalesce(text, ''), '[.!?]+')))::BIGINT AS n_sentences,
        |    coalesce(list_sum(list_transform(ws,
        |      x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)::BIGINT AS n_syllables,
        |    len(regexp_extract_all(lower(text),
        |      '''(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))::BIGINT AS nsub,
        |    len(list_filter(ws, x -> list_contains(['the','a','and','of','to','is','in','it'], x))) AS s_en,
        |    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de,
        |    len(list_filter(ws, x -> list_contains(['el','los','las','una','es','y','que','por'], x))) AS s_es,
        |    len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une','est','dans'], x))) AS s_fr,
        |    len(list_filter(ws, x -> list_contains(['的','了','是','我','在','不','有','人'], x))) AS s_zh
        |  FROM w),
        |f AS (
        |  SELECT
        |    CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |         ELSE 'zh' END AS predicted_lang,
        |    (CASE WHEN nw >= 50 AND nw <= 100000 AND mw >= 3000 AND mw <= 10000
        |          AND sy_bp <= 1000 AND bu_bp <= 9000 AND el_bp <= 3000 AND al_bp >= 8000
        |          AND st >= 2 THEN 1 ELSE 0 END)::BIGINT AS gk,
        |    ck, nw, nsub,
        |    CASE WHEN nw > 0
        |         THEN (390 * nw) // n_sentences + (11800 * n_syllables) // nw - 15590
        |         ELSE NULL END AS fk
        |  FROM m)
        |SELECT predicted_lang, count(*)::BIGINT AS n_docs,
        |  ((10000 * sum(gk)) // count(*))::BIGINT AS gopher_keep_bp,
        |  ((10000 * sum(ck)) // count(*))::BIGINT AS c4_keep_bp,
        |  (CASE WHEN count(fk) = 0 THEN NULL
        |        ELSE sum(fk) // count(fk) END)::BIGINT AS mean_fk_milli,
        |  (CASE WHEN sum(nw) = 0 THEN NULL
        |        ELSE (1000 * sum(nsub)) // sum(nw) END)::BIGINT AS subword_fertility_milli
        |FROM f GROUP BY predicted_lang""".stripMargin,
    "q145_lang_fertility" -> q145Oracle,
    "q146_token_delivery" -> q146Oracle,
    "q147_epoch_shuffle" -> q147Oracle,
    "q149_ann_recall" -> q149Oracle,
    "q151_nprobe_sweep" -> q151Oracle,
    // the q124 closed-form replay under the progressive corpus's own
    // block/chroma formulas — the decoder path differs (multi-scan
    // SOF2), the pixels don't
    "q153_pack_spans" -> q153Oracle,
    // q130's closed-form pattern: expected recovered text stated, every
    // id%3==0 a corrupted frame the checksum/structure must reject
    "q154_zstd_text" ->
      """SELECT doc_id AS media_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN doc_id % 3 = 0 THEN '' ELSE coalesce(text, '') END AS text,
        |  (CASE WHEN doc_id % 3 = 0 THEN 0
        |        ELSE coalesce(octet_length(encode(text)), 0) END)::BIGINT AS text_bytes
        |FROM documents""".stripMargin,
    // the q131 oracle verbatim: the zstd layer must be invisible to
    // the record walk
    "q155_warc_zst" -> warcRecordsOracle,
    // recovered NDJSON records stated closed-form; corrupt members
    // (checksum-guaranteed) are one ok=0 row with null fields
    "q159_jsonl_zst" ->
      """SELECT doc_id AS media_id, 0::INTEGER AS line_no, 1::INTEGER AS ok,
        |  doc_id::BIGINT AS rec_id, 0::INTEGER AS part,
        |  coalesce(text, '') AS body
        |FROM documents WHERE doc_id % 3 <> 0
        |UNION ALL
        |SELECT doc_id, 1::INTEGER, 1::INTEGER, doc_id::BIGINT, 1::INTEGER,
        |  'meta-' || doc_id
        |FROM documents WHERE doc_id % 3 <> 0
        |UNION ALL
        |SELECT doc_id, 0::INTEGER, 0::INTEGER, NULL::BIGINT, NULL::INTEGER, NULL
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,
    // every fixture arm restated closed-form from the id arithmetic:
    // version/layer/rate/bitrate tables as list literals, samples-per-
    // frame duration, the three error families and both tag wrappers
    "q156_mp3_headers" ->
      """WITH m AS (
        |  SELECT doc_id AS id, doc_id % 3 AS v,
        |    CASE WHEN doc_id % 4 = 2 THEN 2 WHEN doc_id % 4 = 3 THEN 1 ELSE 3 END AS l,
        |    (doc_id // 3) % 3 AS sr_idx, 3 + doc_id % 5 AS nf,
        |    (doc_id % 13 = 7) AS bad_header,
        |    (doc_id % 13 <> 7 AND doc_id % 7 = 3) AS bad_sync,
        |    (doc_id % 13 <> 7 AND doc_id % 7 = 5) AS trunc
        |  FROM documents),
        |c AS (
        |  SELECT *,
        |    CASE WHEN v = 0 THEN ([44100,48000,32000])[sr_idx + 1]
        |         WHEN v = 1 THEN ([22050,24000,16000])[sr_idx + 1]
        |         ELSE ([11025,12000,8000])[sr_idx + 1] END AS rate,
        |    CASE WHEN l = 1 THEN 384 WHEN l = 2 THEN 1152
        |         WHEN v = 0 THEN 1152 ELSE 576 END AS spf,
        |    CASE WHEN v = 0 AND l = 1 THEN ([32,64,96,128,160,192,224,256,288,320,352,384,416,448])[1 + id % 14]
        |         WHEN v = 0 AND l = 2 THEN ([32,48,56,64,80,96,112,128,160,192,224,256,320,384])[1 + id % 14]
        |         WHEN v = 0 THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[1 + id % 14]
        |         WHEN l = 1 THEN ([32,48,56,64,80,96,112,128,144,160,176,192,224,256])[1 + id % 14]
        |         ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[1 + id % 14] END AS br0,
        |    CASE WHEN bad_header THEN 0 WHEN bad_sync THEN 1
        |         WHEN trunc THEN nf - 1 ELSE nf END AS n_eff
        |  FROM m)
        |SELECT id AS media_id,
        |  (CASE WHEN bad_header OR bad_sync OR trunc THEN 0 ELSE 1 END)::INTEGER AS ok,
        |  CASE WHEN n_eff = 0 THEN '' WHEN v = 0 THEN '1'
        |       WHEN v = 1 THEN '2' ELSE '2.5' END AS version,
        |  (CASE WHEN n_eff = 0 THEN 0 ELSE l END)::INTEGER AS layer,
        |  (CASE WHEN n_eff = 0 THEN 0 ELSE rate END)::INTEGER AS sample_rate,
        |  (CASE WHEN n_eff = 0 THEN 0 ELSE br0 END)::INTEGER AS first_bitrate_kbps,
        |  (CASE WHEN id % 5 = 2 AND n_eff >= 2 THEN 1 ELSE 0 END)::INTEGER AS vbr,
        |  n_eff::INTEGER AS n_frames,
        |  (CASE WHEN n_eff = 0 THEN 0
        |        ELSE (n_eff * spf * 1000) // rate END)::BIGINT AS duration_ms,
        |  (CASE WHEN id % 4 = 1 THEN 27 + id % 50 ELSE 0 END)::INTEGER AS id3v2_bytes,
        |  (CASE WHEN id % 6 = 4 AND NOT bad_header AND NOT bad_sync AND NOT trunc
        |        THEN 1 ELSE 0 END)::INTEGER AS id3v1,
        |  CASE WHEN bad_header THEN 'bad_header' WHEN bad_sync THEN 'bad_sync'
        |       WHEN trunc THEN 'truncated' ELSE '' END AS err
        |FROM c""".stripMargin,
    "q152_jpeg_progressive" ->
      """WITH d AS (
        |  SELECT doc_id, ((doc_id % 3) + 1)::INTEGER AS nbx,
        |         ((doc_id % 2) + 1)::INTEGER AS nby,
        |         (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)::INTEGER AS channels,
        |         (88 + 20 * ((doc_id // 3) % 5) - 128)::BIGINT AS c1,
        |         (88 + 20 * (((doc_id // 3) + 2) % 5) - 128)::BIGINT AS c2
        |  FROM documents),
        |g AS (SELECT unnest(range(0, 3)) AS i),
        |blk AS (
        |  SELECT d.doc_id, d.channels, d.c1, d.c2,
        |    ((37 * d.doc_id + 19 * gx.i + 29 * gy.i) % 256)::BIGINT AS p
        |  FROM d JOIN g gx ON gx.i < d.nbx JOIN g gy ON gy.i < d.nby),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p + 1.402 * c2)))::BIGINT END AS r,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p - 0.344136 * c1 - 0.714136 * c2)))::BIGINT END AS gg,
        |    CASE WHEN channels = 1 THEN p ELSE
        |      greatest(0, least(255, round(p + 1.772 * c1)))::BIGINT END AS b
        |  FROM blk),
        |s AS (
        |  SELECT doc_id, (64 * sum(r))::BIGINT AS sum_r,
        |    (64 * sum(gg))::BIGINT AS sum_g, (64 * sum(b))::BIGINT AS sum_b,
        |    (64 * sum(r * r))::BIGINT AS ssq_r, (64 * sum(gg * gg))::BIGINT AS ssq_g,
        |    (64 * sum(b * b))::BIGINT AS ssq_b
        |  FROM px GROUP BY 1)
        |SELECT d.doc_id AS media_id, 'jpeg' AS format,
        |  (8 * d.nbx)::INTEGER AS width, (8 * d.nby)::INTEGER AS height,
        |  d.channels, s.sum_r, s.sum_g, s.sum_b, s.ssq_r, s.ssq_g, s.ssq_b
        |FROM d JOIN s USING (doc_id)""".stripMargin,
    // the q56 fold replay joined back to the source dimension
    "q150_shard_provenance" ->
      s"""WITH RECURSIVE $duckPackChain
         |SELECT r.bucket::BIGINT AS pack_bucket, r.bin::BIGINT AS pack_bin,
         |  d.source, count(*)::BIGINT AS n_docs, sum(r.n)::BIGINT AS n_tokens
         |FROM r JOIN documents d ON r.doc_id = d.doc_id
         |GROUP BY 1, 2, 3""".stripMargin,
    // the q56 recursive fold replay rolled up per bucket
    "q148_pack_efficiency" ->
      s"""WITH RECURSIVE $duckPackChain
         |SELECT bucket::BIGINT AS pack_bucket,
         |  (max(bin) + 1)::BIGINT AS n_bins,
         |  count(*)::BIGINT AS n_docs,
         |  sum(n)::BIGINT AS n_tokens,
         |  ((10000 * sum(n)) // ((max(bin) + 1) * 256))::BIGINT AS fill_bp
         |FROM r GROUP BY bucket""".stripMargin,
    // the audio twin of q133: closed-form |sample| values -> per-cell
    // means -> the same frozen DCT literals -> median bits -> brute
    // pairs (same-seed clips measured 0-2 bits apart, others 18+)
    "q134_audio_fp_pairs" ->
      """WITH sm AS (
        |  SELECT d.doc_id, (i.i // 4) // 8 AS bi, (i.i // 4) % 8 AS bj,
        |    abs((((CASE WHEN d.doc_id % 9 = 0 THEN 10 + d.doc_id % 7
        |               ELSE d.doc_id % 10 END) * 73
        |      + ((i.i // 4) // 8) * 37 + ((i.i // 4) % 8) * 91) % 17) * 120
        |      + (d.doc_id * 31 + i.i * 7) % 3 - 1) AS ax
        |  FROM documents d, range(0, 256) AS i(i)),
        |blk AS (SELECT doc_id, bi, bj, sum(ax) // 4 AS s FROM sm GROUP BY 1, 2, 3),
        |tt AS (SELECT [[1024,1024,1024,1024,1024,1024,1024,1024],
        |  [1004,851,569,200,-200,-569,-851,-1004],
        |  [946,392,-392,-946,-946,-392,392,946],
        |  [851,-200,-1004,-569,569,1004,200,-851],
        |  [724,-724,-724,724,724,-724,-724,724],
        |  [569,-1004,200,851,-851,-200,1004,-569],
        |  [392,-946,946,-392,-392,946,-946,392],
        |  [200,-569,851,-1004,1004,-851,569,-200]] AS t),
        |dct AS (
        |  SELECT b.doc_id, u.u AS u, v.v AS v,
        |    sum(b.s * t[u.u + 1][b.bi + 1] * t[v.v + 1][b.bj + 1]) AS f
        |  FROM blk b, range(0, 8) AS u(u), range(0, 8) AS v(v), tt
        |  GROUP BY 1, 2, 3),
        |med AS (
        |  SELECT doc_id, list_sort(list(f))[32] AS m
        |  FROM dct WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
        |ph AS (
        |  SELECT d.doc_id,
        |    sum(CASE WHEN d.f > med.m THEN 1::BIGINT << (d.u * 8 + d.v - 1)
        |             ELSE 0::BIGINT END)::BIGINT AS h
        |  FROM dct d JOIN med ON d.doc_id = med.doc_id
        |  WHERE NOT (d.u = 0 AND d.v = 0)
        |  GROUP BY d.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::BIGINT AS hamming_dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 5""".stripMargin,
    // INDEPENDENT closed-form expectations per URL family — the oracle
    // states the canonical strings, it does not replay the regexes
    "q129_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'http://www.example' || (doc_id % 7) || '.com/a/b/page' || doc_id || '.html'
        |      WHEN 1 THEN 'https://sub.domain' || (doc_id % 7) || '.org/path/sub?q=' || doc_id || '&next=https://x//y'
        |      WHEN 2 THEN 'https://spam' || (doc_id % 3) || '.bad.site/x/y'
        |      WHEN 3 THEN 'http://plain' || (doc_id % 7) || '.net'
        |      WHEN 4 THEN 'ftp://files.host' || (doc_id % 7) || '.io:80/data'
        |      ELSE '//cdn' || (doc_id % 7) || '.net//x#f'
        |    END AS url_norm,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'www.example' || (doc_id % 7) || '.com'
        |      WHEN 1 THEN 'sub.domain' || (doc_id % 7) || '.org'
        |      WHEN 2 THEN 'spam' || (doc_id % 3) || '.bad.site'
        |      WHEN 3 THEN 'plain' || (doc_id % 7) || '.net'
        |      WHEN 4 THEN 'files.host' || (doc_id % 7) || '.io'
        |      ELSE ''
        |    END AS host,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'example' || (doc_id % 7) || '.com'
        |      WHEN 1 THEN 'domain' || (doc_id % 7) || '.org'
        |      WHEN 2 THEN 'bad.site'
        |      WHEN 3 THEN 'plain' || (doc_id % 7) || '.net'
        |      WHEN 4 THEN 'host' || (doc_id % 7) || '.io'
        |      ELSE ''
        |    END AS domain
        |  FROM documents)
        |SELECT doc_id, url_norm, host, domain,
        |  (CASE WHEN domain = 'bad.site' THEN 1 ELSE 0 END)::BIGINT AS blocked
        |FROM u""".stripMargin,
    // generation AND extraction replayed under DuckDB's RE2 — pattern
    // semantics, strip ordering, and entity decode order all pinned
    "q128_html_text" ->
      """WITH hh AS (
        |  SELECT doc_id,
        |    '<html><head><title>T</title><style>body { margin: 0; }</style>' ||
        |    '<script type="text/javascript">var x = 1 < 2;</script></head>' ||
        |    '<body><!-- generated' || chr(10) || ' page --><h1>Doc &amp; heading</h1>' ||
        |    '<span alt=don''t>apos kept</span>' ||
        |    '<p class="main" title="a > b" data-x=''1 > 0''>' || coalesce(text, '') ||
        |    '</p><div><span>&lt;tail&gt; &quot;q&quot; &#39;s&#39;</span></div></body></html>'
        |    AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |          '<(?:[^<>"'']|"[^"<]*"|''[^''<]*'')*>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
        |    '[ \t\n\r]+', ' ', 'g')) AS clean_text
        |  FROM hh)
        |SELECT doc_id, clean_text,
        |  len(list_filter(string_split(lower(trim(clean_text)), ' '), x -> x != ''))::BIGINT AS n_tokens
        |FROM c""".stripMargin,
    // the same footer bytes through DuckDB's independent reader; the
    // gate runs at sf0.01 by contract (parquet_metadata takes paths)
    "q126_parquet_audit" ->
      """WITH m AS (
        |  SELECT * FROM parquet_metadata('/root/testdata/sf0.01/lineitem.parquet')
        |  UNION ALL SELECT * FROM parquet_metadata('/root/testdata/sf0.01/orders.parquet')
        |  UNION ALL SELECT * FROM parquet_metadata('/root/testdata/sf0.01/documents.parquet')
        |  UNION ALL SELECT * FROM parquet_metadata('/root/testdata/sf0.01/region.parquet'))
        |SELECT regexp_extract(file_name, '[^/]+$') AS file,
        |  row_group_id::BIGINT AS row_group_id,
        |  row_group_num_rows::BIGINT AS rg_rows,
        |  path_in_schema AS col_path, num_values::BIGINT AS num_values,
        |  coalesce(stats_null_count, -1)::BIGINT AS null_count,
        |  total_compressed_size::BIGINT AS compressed_bytes,
        |  total_uncompressed_size::BIGINT AS uncompressed_bytes,
        |  compression AS codec
        |FROM m""".stripMargin,
    "q93_exact_sample" ->
      s"""SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ((10368889 * ${duckPolyHash("CAST(doc_id AS VARCHAR)", 1L << 31)} + 8342140)
        |        % ${1L << 31}) ASC, doc_id ASC) AS rn
        |  FROM documents) t WHERE rn <= 3""".stripMargin,
    "q92_vocab_coverage" ->
      """WITH inst AS (
        |  SELECT source, unnest(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS tok
        |  FROM documents),
        |vc AS (SELECT tok, count(*) AS c FROM inst GROUP BY 1),
        |vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT 16),
        |j AS (
        |  SELECT i.source, i.tok, v.tok IS NOT NULL AS cov
        |  FROM inst i LEFT JOIN vocab v ON i.tok = v.tok)
        |SELECT source, count(*)::BIGINT AS n_tokens,
        |  ((10000 * sum(CASE WHEN cov THEN 1 ELSE 0 END)) // count(*))::BIGINT AS covered_bp,
        |  count(DISTINCT CASE WHEN NOT cov THEN tok END)::BIGINT AS n_oov_types
        |FROM j GROUP BY 1""".stripMargin,
    "q81_video_headers" ->
      """SELECT doc_id AS media_id, 'mp4' AS format,
        |  ((doc_id % 3) * 320 + 640)::INTEGER AS width,
        |  ((doc_id % 3) * 180 + 360)::INTEGER AS height,
        |  600::BIGINT AS timescale,
        |  ((doc_id % 100) * 1000 + 1000)::BIGINT AS duration_ms,
        |  (236 + coalesce(octet_length(encode(text)), 0))::BIGINT AS n_bytes
        |FROM documents""".stripMargin,
    "q79_audio_headers" ->
      """SELECT doc_id AS media_id, 'wav' AS format,
        |  ([8000, 16000, 22050, 44100])[(doc_id % 4) + 1]::INTEGER AS sample_rate,
        |  ((doc_id % 2) + 1)::INTEGER AS channels,
        |  16::INTEGER AS bits_per_sample,
        |  (coalesce(octet_length(encode(text)), 0)
        |    // (((doc_id % 2) + 1) * 2))::BIGINT AS n_samples,
        |  (44 + coalesce(octet_length(encode(text)), 0))::BIGINT AS n_bytes
        |FROM documents""".stripMargin,
    "q77_image_headers" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  ((doc_id % 4) * 160 + 320)::INTEGER AS width,
        |  ((doc_id % 4) * 90 + 180)::INTEGER AS height,
        |  8::INTEGER AS bit_depth,
        |  3::INTEGER AS channels,
        |  CASE WHEN doc_id % 2 = 0 THEN ''
        |       WHEN doc_id % 5 = 2 THEN 'progressive'
        |       ELSE 'baseline' END AS coding,
        |  (CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 39 END
        |    + coalesce(octet_length(encode(text)), 0))::BIGINT AS n_bytes
        |FROM documents""".stripMargin,
    "q68_interval_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, epoch_us(ts) AS cus FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) - 1800000000 AS lo,
        |    epoch_us(ts) AS hi
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, c.click_id
        |FROM p JOIN c ON c.cus >= p.lo AND c.cus <= p.hi""".stripMargin,
    "q66_funnel" ->
      """WITH c AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'click' GROUP BY user_id),
        |v AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > c.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t2
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM c)::BIGINT AS n_click,
        |  (SELECT count(*) FROM v)::BIGINT AS n_click_view,
        |  (SELECT count(*) FROM p)::BIGINT AS n_full_funnel""".stripMargin,
    "q63_zorder" ->
      """WITH e AS (
        |  SELECT event_id, (user_id & 65535) AS ua,
        |    (floor(value)::BIGINT & 65535) AS ub
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id,
        |  ((ua >> 0) & 1) * 2
        |  + ((ub >> 0) & 1) * 1
        |  + ((ua >> 1) & 1) * 8
        |  + ((ub >> 1) & 1) * 4
        |  + ((ua >> 2) & 1) * 32
        |  + ((ub >> 2) & 1) * 16
        |  + ((ua >> 3) & 1) * 128
        |  + ((ub >> 3) & 1) * 64
        |  + ((ua >> 4) & 1) * 512
        |  + ((ub >> 4) & 1) * 256
        |  + ((ua >> 5) & 1) * 2048
        |  + ((ub >> 5) & 1) * 1024
        |  + ((ua >> 6) & 1) * 8192
        |  + ((ub >> 6) & 1) * 4096
        |  + ((ua >> 7) & 1) * 32768
        |  + ((ub >> 7) & 1) * 16384
        |  + ((ua >> 8) & 1) * 131072
        |  + ((ub >> 8) & 1) * 65536
        |  + ((ua >> 9) & 1) * 524288
        |  + ((ub >> 9) & 1) * 262144
        |  + ((ua >> 10) & 1) * 2097152
        |  + ((ub >> 10) & 1) * 1048576
        |  + ((ua >> 11) & 1) * 8388608
        |  + ((ub >> 11) & 1) * 4194304
        |  + ((ua >> 12) & 1) * 33554432
        |  + ((ub >> 12) & 1) * 16777216
        |  + ((ua >> 13) & 1) * 134217728
        |  + ((ub >> 13) & 1) * 67108864
        |  + ((ua >> 14) & 1) * 536870912
        |  + ((ub >> 14) & 1) * 268435456
        |  + ((ua >> 15) & 1) * 2147483648
        |  + ((ub >> 15) & 1) * 1073741824 AS zval
        |FROM e""".stripMargin,
    "q64_retention" ->
      """WITH w AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id)
        |SELECT c.cohort_wk, (w.wk - c.cohort_wk) AS week_offset,
        |  count(DISTINCT w.user_id)::BIGINT AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q62_value_histogram" ->
      """SELECT event_type AS grp, floor(value::DOUBLE / 5.0)::BIGINT AS bucket,
        | count(*)::BIGINT AS cnt
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type, floor(value::DOUBLE / 5.0)::BIGINT""".stripMargin,
    "q54_token_mix" ->
      s"""WITH c AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')))::BIGINT AS n
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT source,
        |    least(10000, (2000 * CASE source
        |      WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2000
        |      WHEN 'src2' THEN 1000 WHEN 'src3' THEN 500 ELSE 0 END) // n) AS rate
        |  FROM c WHERE n > 0)
        |SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.source
        |WHERE ((10368889 * ${duckPolyHash("CAST(d.doc_id AS VARCHAR)", 1L << 31)} + 8342140)
        |  % ${1L << 31}) % 10000 < r.rate""".stripMargin,
    "q37_source_similarity" -> q37Oracle,
    "q20_exact_dedup" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_distinct_texts
        |FROM documents GROUP BY source""".stripMargin,
    "q21_jaccard_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         list_distinct(list_filter(string_split(lower(trim(text)), ' '), x -> x != '')) AS ws
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(len(list_intersect(a.ws, b.ws))::DOUBLE /
        |             (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 4) AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
        |      (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.8""".stripMargin,
    "q24_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)),
        |   (p, q) -> p + q), 3) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(list_zip(a.embedding, b.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)),
        |   (p, q) -> p + q), 3) >= 0.4""".stripMargin,
    "q25_ann_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_reduce(list_prepend(0.0::DOUBLE,
        |      list_transform(list_zip(q.embedding, c.embedding), x -> x[1]::DOUBLE * x[2]::DOUBLE)),
        |      (p, v) -> p + v), 6) AS cos
        |  FROM q CROSS JOIN embeddings c WHERE q.vec_id != c.vec_id)
        |SELECT query_id, rank, neighbor_id, cos FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored) t WHERE rank <= 10""".stripMargin,
    "q26_text_stats" ->
      ("""WITH t AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        | len(toks) AS n_tokens,
        | len(list_distinct(toks)) AS n_distinct_tokens,
        | CASE WHEN len(toks) > 0 THEN floor(len(list_filter(toks,
        |   x -> list_contains(['the','a','an','and','of','to','in','is','it','for','on','with'], x)))
        |   * 10000.0 / len(toks))::BIGINT ELSE 0 END AS stopword_bp,
        | CASE WHEN length(text) > 0 THEN
        |   floor((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
        |     * 10000.0 / length(text))::BIGINT ELSE 0 END AS punct_bp,
        | CASE WHEN len(toks) > 0 THEN
        |   floor(list_sum(list_transform(toks, x -> length(x))) * 100.0 / len(toks))::BIGINT
        |   ELSE 0 END AS avg_token_len_centi,
        | """ + duckQualityMilli("toks") + """ AS quality_milli,
        | len(regexp_extract_all(lower(text),
        |   '''(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_subword_tokens
        |FROM t""").stripMargin,
    "q27_langid" ->
      """WITH t AS (SELECT lang,
        |  list_filter(string_split(lower(trim(text)), ' '), x -> x != '') AS toks FROM documents),
        |s AS (SELECT lang,
        |  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is','in','it'], x))) AS s_en,
        |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de,
        |  len(list_filter(toks, x -> list_contains(['el','los','las','una','es','y','que','por'], x))) AS s_es,
        |  len(list_filter(toks, x -> list_contains(['le','la','les','et','des','une','est','dans'], x))) AS s_fr,
        |  len(list_filter(toks, x -> list_contains(['的','了','是','我','在','不','有','人'], x))) AS s_zh
        | FROM t)
        |SELECT lang,
        | CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |      WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |      ELSE 'zh' END AS predicted_lang,
        | count(*) AS n
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q28_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(0::BIGINT,
        |   list_transform(string_split(replace(lower(trim(text)), ' ', ''), ''), ch -> ascii(ch)::BIGINT)),
        |   (a, c) -> (a * 31 + c) % 1099511627776) AS fp40
        |FROM documents""".stripMargin,
    // q36 is the single rows-only entry: the engine-native HLL sketch
    // encoding is engine-specific (q46 carries the reproducible-register
    // HLL oracle; everything else is hash-gated).
    "q29_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tns, value FROM events),
        |f AS (
        |  SELECT user_id, event_id, tns, value,
        |    CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL
        |           OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |g AS (
        |  SELECT user_id, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM g GROUP BY user_id, session_id""".stripMargin,
    "q32_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q33_hour_buckets" ->
      """SELECT strftime(make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
        |   '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q34_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q35_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        | round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
        | sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_k
        |FROM events GROUP BY event_type""".stripMargin)
}
