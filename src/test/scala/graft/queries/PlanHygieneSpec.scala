package graft.queries

import graft.SparkSpec

/** Whole-catalog plan hygiene: every gate query's physical plan is free
  * of unbounded join shapes (CartesianProduct, BroadcastNestedLoopJoin)
  * unless it is on the documented allowlist of intentional uses — the
  * regression net that keeps a future refactor from silently turning a
  * bucketed candidate join back into all-pairs. Plans are compiled
  * against sf0.001 (no execution: `executedPlan` resolves the initial
  * physical plan only). */
class PlanHygieneSpec extends SparkSpec {

  /** Queries with an INTENTIONAL nested-loop/cartesian component, each
    * with the reason it is bounded. */
  private val allow: Map[String, String] = Map(
    "q08_containment_join" -> "reference J1 theta-join: both sides are post-agg summaries, broadcast NLJ is the plan",
    "q18_semi_anti" -> "EXISTS-shape theta semi-join over broadcast summary side",
    "q24_embedding_neardup" -> "labeled exact small-n baseline (all-pairs by definition)",
    "q25_ann_topk" -> "brute-force baseline: broadcast query batch x corpus",
    "q37_source_similarity" -> "<=64 sources: pairwise sketch compare over a broadcast tiny frame",
    "q39_contamination" -> "<=64 sources: bitmask pair expansion over a tiny collected list",
    "q58_quantized_topk" -> "broadcast query batch coarse scan (bounded by query count)",
    // q38/q60/q72 (IVF assignment/probe) left the allowlist when the
    // crossJoin(broadcast(centroids)) formulation became the fused
    // broadcast-kernel mapPartitions (Ann.ivfAssign/ivfProbes)
    "q44_tfidf_terms" -> "crossJoin(broadcast(n)): single-row group-count total",
    "q51_surprisal" -> "crossJoin(broadcast(total)): single-row corpus token total",
    "q66_funnel" -> "three single-row stage-count aggregates crossJoined",
    "q84_corpus_divergence" -> "crossJoin(broadcast(totals)): single-row (v, na, nb)",
    "q85_diverging_tokens" -> "crossJoin(broadcast(totals)): single-row (v, na, nb)",
    "q87_dsir_weights" -> "crossJoin(broadcast(totals)): single-row (v, nr, nt)",
    "q88_dsir_hashed" -> "crossJoin(broadcast(totals)): single-row (nr, nt)",
    "q89_dsir_select" -> "composes q87: crossJoin(broadcast(totals)) single-row",
    "q90_bm25_topk" -> "crossJoin(broadcast(totals)): single-row (d_docs, a_cdl)",
    "q91_hybrid_rrf" -> "composes q90's single-row totals + q25's broadcast query batch x corpus baseline",
    "q96_hard_negatives" -> "composes q90's scoring core: crossJoin(broadcast(totals)) single-row (d_docs, a_cdl)",
    "q98_temperature_mix" -> "crossJoin(broadcast(em_total)): single-row normalizer over the tiny per-source frame",
    "q99_curriculum" -> "crossJoin(broadcast(bounds)): single-row percentile-boundary array (plus q51's single-row token total)",
    "q101_bigram_pmi" -> "crossJoin(broadcast(totals)): single-row (tu, tb) corpus counts",
    "q107_nb_quality" -> "crossJoin(broadcast(totals)) + crossJoin(broadcast(prior)): two single-row frames (vocab/class totals, class prior)",
    "q110_projected_topk" -> "broadcast query batch x projected corpus coarse scan + fp32 rescore (bounded by query count; q25/q58 shape)",
    "q111_hybrid_ivf" -> "composes q90's single-row totals (BM25 arm via the standing disk index); the IVF arm is the fused kernel, joinless",
    "q115_nb_calibration" -> "composes q107: crossJoin(broadcast(totals)) + crossJoin(broadcast(prior)) single-row frames",
    "q117_bm25_index_probe" -> "composes q90's scoring core over the persisted postings: crossJoin(broadcast(totals)) single-row (d_docs, a_cdl)",
    // q122_unigram_encode carries no crossJoin: the vocab totals are
    // consumed by the eager score-map collect, and the returned plan is
    // the broadcast word→seg encode join alone
    "q121_unigram_vocab" -> "crossJoin(broadcast(totals)): two single-row frames (seed count total, kept usage total)",
    "q116_quality_mix" -> "composes q107's and q98's single-row broadcast totals (NB vocab/prior + temperature normalizer)",
    "q149_ann_recall" -> "recall audit's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus",
    "q151_nprobe_sweep" -> "q149's sweep: same broadcast 25-query brute baseline intersected with three probe arms",
    "q182_pq_recall" -> "the PQ rerank sweep's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (the ADC arms are plain joins)",
    "q189_ivfpq_recall" -> "the IVF-PQ rerank sweep's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (the probed-cell ADC arms are plain joins)",
    "q193_ivfpq_nprobe_sweep" -> "the IVF-PQ nProbe sweep's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (the probed-cell ADC arms are plain joins)",
    "q195_pq_width_sweep" -> "the codebook-width sweep's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (the per-k ADC arms are plain joins)",
    "q201_hadamard_pq" -> "the rotation A/B's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (both PQ arms are plain joins)",
    "q185_bigram_nll" -> "crossJoin(broadcast(vocab)): single-row reference vocabulary size (the q51 pattern)",
    "q206_pq_rerank_sweep" -> "the nProbe x rerank grid's exact arm IS q25's brute baseline: broadcast 25-query batch x corpus (the per-nProbe ADC arms are plain joins)")

  test("every gate query carries an oracle (q36 rows-only by design), no orphans") {
    assert(Queries.all.keySet -- Queries.oracle.keySet == Set("q36_approx_distinct"),
      "a query without an oracle entry gets only the weak rows-only check")
    assert((Queries.oracle.keySet -- Queries.all.keySet).isEmpty,
      "orphan oracle entries never run and rot silently")
  }

  test("no unbounded join shapes outside the allowlist (whole catalog)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val stale = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- Queries.all.toSeq.sortBy(_._1)) {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val bad = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
      if (bad && !allow.contains(name)) offenders += name
      // the inverse: an allowlisted query whose plan no longer carries
      // the shape is a stale entry that could mask a future regression
      if (!bad && allow.contains(name)) stale += name
    }
    assert(offenders.isEmpty,
      s"unbounded join shapes in: ${offenders.mkString(", ")} — either fix the plan " +
        "or document the bound in PlanHygieneSpec.allow")
    assert(stale.isEmpty,
      s"stale allowlist entries (plan no longer has the shape): ${stale.mkString(", ")}")
  }

  test("coarse-scan top-k is two-level: the prune kernel sits below the window") {
    // the q58/q110/q181/q182 scale contract: no per-query window may
    // consume the unbounded candidate frame directly — the per-partition
    // bounded heap (TopK.prunePerPartition, a MapPartitions node) must
    // appear in the plan, capping the window's input at
    // partitions × |Q| × k rows
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q58_quantized_topk", "q110_projected_topk",
        "q181_pq_topk", "q182_pq_recall")) {
      val plan = Queries.all(name)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"),
        s"$name: expected the TopK prune kernel (MapPartitions) below the ranking window")
    }
  }

  test("the corpus-audit rollups plan to ONE parquet scan (q139, q144)") {
    // the at-scale contract of the audit family: every measure is a
    // column expression, so a corpus-wide report costs a single
    // aggregation over a single scan — no joins, no re-reads
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q139_source_audit", "q144_lang_audit")) {
      val plan = Queries.all(name)(spark, dir).queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).length
      assert(scans == 1, s"$name must plan to ONE parquet scan, got $scans")
    }
  }
}
