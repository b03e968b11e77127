package graft.pipeline

import graft.dedup.Dedup
import graft.ops.ScaleOps
import graft.text.{Redact, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the engine's training-data
  * operators composed into one deterministic pipeline —
  *
  *   quality gate → PII redaction → exact dedup → near-dup dedup
  *   (MinHash-LSH pairs → connected components → keep canonical) →
  *   eval-contamination removal → deterministic sampling
  *
  * Scale shape: stages 1–2 are ONE scan (all text statistics are
  * per-row column expressions); exact dedup is one window over a text
  * shuffle; near-dup dedup reuses the LSH candidate discipline; the
  * contamination stage is a left-anti join on 40-bit fingerprints
  * (broadcast when the eval set is small — it always is); sampling is a
  * pure filter. Every stage is a deterministic function of the input,
  * so retries, resumes and engine swaps reproduce the same corpus.
  *
  * Stage counts cost one action each; pass `countStages = false` to run
  * the whole pipeline as a single lazy plan when the report isn't
  * needed.
  */
object Curation {

  final case class CurationConfig(
      minQualityMilli: Long = 400,
      maxRepetitionBp: Long = 5000,
      dropLangs: Seq[String] = Seq.empty, // predicted langs to exclude
      redactPii: Boolean = true,
      nearDupThreshold: Double = 0.85,
      sampleBp: Int = 10000,
      // GPT-3-style n-gram decontamination: ALSO drop documents sharing
      // any k-token window with the eval set (whole-doc identity misses
      // a benchmark question pasted into a larger page). None = exact
      // identity only.
      spanDecontaminationTokens: Option[Int] = None,
      // raw crawl input: the text column is HTML and every stage should
      // see the EXTRACTED text (graft.text.Html.htmlToText — a narrow
      // expression-only projection, so the whole pipeline including the
      // incremental diff path just sees cleaner text)
      htmlInput: Boolean = false,
      // the published rule-based recipes as opt-in stages, in the
      // FineWeb-style order: extract -> C4 line cleaning (rebuilds the
      // page from retained lines; page drops remove the doc) -> Gopher
      // document rules (structural gates) -> the engine's own
      // quality/repetition gates. Both are expression-only
      // (text.QualityRules), so the incremental path inherits them
      // for free.
      c4LineClean: Boolean = false,
      gopherRules: Boolean = false,
      // Gopher's repetition rules (duplicate lines/paragraphs, top and
      // duplicated n-gram character fractions) — a per-doc pure gate
      // like gopherRules, so the incremental path inherits it; its
      // n-gram measures shuffle by (doc, n, gram), linear in tokens
      gopherRepetition: Boolean = false)

  final case class CurationReport(
      input: Long, afterCore: Long, afterNearDup: Long,
      afterContamination: Long, output: Long)

  /** Stages 1–3 as a single composable frame (quality gate, redaction,
    * exact dedup) — also the SQL-expressible core that q45 oracles. */
  def curateCore(docs0: DataFrame, cfg: CurationConfig): DataFrame = {
    val parts = docs0.sparkSession.sessionState.conf.numShufflePartitions
    // crawl input: extract text from HTML FIRST so every downstream
    // stage (quality, dedup fingerprints, near-dup signatures,
    // decontamination) operates on the real content, not markup
    val extracted =
      if (cfg.htmlInput)
        docs0.withColumn("text",
          coalesce(graft.text.Html.htmlToText(col("text")), lit("")))
      else docs0
    val lineCleaned =
      if (cfg.c4LineClean)
        graft.text.QualityRules.c4Clean(extracted, "text")
          .where(col("keep") === 1L)
          .select(col("doc_id"), col("source"), col("clean_text").as("text"))
      else extracted
    val structGated =
      if (cfg.gopherRules)
        graft.text.QualityRules.gopherRules(lineCleaned, "text")
          .where(col("keep") === 1L)
          .select(col("doc_id"), col("source"), col("text"))
      else lineCleaned
    val docs =
      if (cfg.gopherRepetition)
        graft.text.QualityRules.gopherRepetition(structGated, "doc_id", "text")
          .where(col("keep") === 1L)
          .select(col("doc_id"), col("source"), col("text"))
      else structGated
    val ts = TextFunctions.tokens(col("text"))
    // a single-file scan arrives as ONE partition; without the spread the
    // whole per-row chain (shingles + three redaction regexes) runs on
    // one core before the dedup window's exchange (measured 9 s -> ~1 s)
    val staged = docs.repartition(parts)
      .select(col("doc_id"), col("source"), col("text"), ts.as("toks"))
      // staged: repetitionBpFrom references its shingle input twice —
      // materialize so the shingling runs once per row
      .withColumn("sh2", TextFunctions.wordShinglesFrom(col("toks"), 2))
    // ONE shared quality formula with q26 (TextFunctions.qualityMilliFrom)
    val qualityMilli = TextFunctions.qualityMilliFrom(col("toks"))
    // Fence the gate columns: without it, predicate pushdown substitutes
    // these aliases into a filter copy at the scan, re-inlining the
    // token/shingle pipeline ~9× per row interpreted (measured 10×
    // slower; see functions.Fence).
    val gated = staged
      .withColumn("quality_milli", graft.functions.Fence.fence(qualityMilli))
      .withColumn("rep_bp",
        graft.functions.Fence.fence(TextFunctions.repetitionBpFrom(col("sh2"))))
      .where(col("quality_milli") >= cfg.minQualityMilli &&
        col("rep_bp") <= cfg.maxRepetitionBp)
    val langFiltered =
      if (cfg.dropLangs.isEmpty) gated
      else {
        val scores = TextFunctions.LangMarkers.map { case (lang, m) =>
          lang -> TextFunctions.langScoreFrom(col("toks"), m)
        }
        gated.withColumn("predicted_lang", TextFunctions.langIdFromScores(scores))
          .where(!col("predicted_lang").isin(cfg.dropLangs: _*))
          .drop("predicted_lang")
      }
    val redacted =
      if (cfg.redactPii)
        langFiltered.withColumn("text", Redact.redact(col("text")))
      else langFiltered
    // exact dedup: canonical = min doc_id per identical (redacted) text
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    redacted
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("text"))
  }

  /** The full pipeline. `evalDocs`: a held-out set (benchmark/eval
    * corpus) whose fingerprints must not appear in the output. */
  def curate(docs: DataFrame, evalDocs: Option[DataFrame],
      cfg: CurationConfig = CurationConfig(),
      countStages: Boolean = true): (DataFrame, Option[CurationReport]) = {
    def cnt(df: DataFrame): Long = if (countStages) df.count() else -1L

    val input = cnt(docs)
    // core feeds three branches (LSH tokenization, the near-dup anti-join
    // left side, and the contamination fingerprint stage) — without the
    // persist the full gate+redact+dedup chain re-executes per branch.
    // Registered with CacheScope: callers release after materializing
    // (ops/CacheScope.scala).
    val core = graft.ops.CacheScope.persist(curateCore(docs, cfg))
    val afterCore = cnt(core)

    // near-dup dedup: LSH pairs at the threshold, clusters, keep canonical
    val pairs = Dedup.minhashNearDupPairs(core, "doc_id", "text", cfg.nearDupThreshold)
    val dropIds = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .where(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    // no broadcast hint: dropIds scales with the duplicate count (30%+ of
    // a crawl), so let AQE pick the join strategy — unlike the eval
    // fingerprint set below, which is small by construction
    val afterNear = core.join(dropIds, Seq("doc_id"), "left_anti")
    val nAfterNear = cnt(afterNear)

    val clean = decontaminateSpans(decontaminate(afterNear, evalDocs), evalDocs, cfg)
    val nClean = cnt(clean)

    val sampled = ScaleOps.deterministicSampleBp(clean, "doc_id", cfg.sampleBp)
    val out = cnt(sampled)

    val report =
      if (countStages)
        Some(CurationReport(input, afterCore, nAfterNear, nClean, out))
      else None
    (sampled, report)
  }

  /** Eval-set decontamination — ONE implementation shared by the full
    * and incremental pipelines (a drifted copy would silently
    * desynchronize their outputs). Identity is (fingerprint, normalized
    * length), not the bare 40-bit fingerprint — a bare-fp collision
    * would drop a clean document as "contaminated" (see
    * Dedup.incrementalMerge's bound). The eval fingerprint set is small
    * by construction → broadcast anti-join. */
  private def decontaminate(docs: DataFrame, evalDocs: Option[DataFrame]): DataFrame = {
    def nlen = TextFunctions.normalizedLength(col("text"))
    evalDocs match {
      case Some(ev) =>
        val evFps = ev.select(TextFunctions.fingerprint(col("text")).as("fp"),
          nlen.as("nl")).distinct()
        docs
          .withColumn("fp", TextFunctions.fingerprint(col("text")))
          .withColumn("nl", nlen)
          .join(broadcast(evFps), Seq("fp", "nl"), "left_anti")
          .drop("fp", "nl")
      case None => docs
    }
  }

  /** Span-level decontamination (cfg.spanDecontaminationTokens): drop
    * documents sharing any k-token window with the eval set — shared by
    * the full and incremental pipelines like [[decontaminate]]. */
  private def decontaminateSpans(docs: DataFrame, evalDocs: Option[DataFrame],
      cfg: CurationConfig): DataFrame =
    (cfg.spanDecontaminationTokens, evalDocs) match {
      case (Some(k), Some(ev)) =>
        docs.join(
          Dedup.spanContamination(docs, "doc_id", "text", ev, "text", k)
            .select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
      case _ => docs
    }

  /** Incremental recuration — the daily production loop at 100 TB: given
    * yesterday's raw snapshot, its curated output, and today's raw
    * snapshot, recurate ONLY the added/changed documents (the delta a
    * crawl actually produces) and carry every untouched curated document
    * forward. A 1% daily delta costs ~1% of a full recuration.
    *
    * Semantics are first-writer-wins (Dedup.incrementalMerge's rule): a
    * delta document identity- or near-dup-equal to a CARRIED document is
    * dropped regardless of id order; within the delta the usual
    * min-id-canonical rule applies. Sampling is a pure key filter, so
    * carried documents already satisfy it and delta documents face the
    * identical decision a full run would give them. With an empty
    * previous snapshot this degenerates to `curate` exactly
    * (CurationSpec proves it), and with an unchanged snapshot it returns
    * the previous output verbatim (idempotence — also spec-pinned).
    *
    * Scale shape: the diff is one id-join (exchange-free on bucketed
    * snapshots); every curation stage runs on |delta| rows; the near-dup
    * check joins delta signatures against the carried corpus via the
    * same LSH band equi-join (at 100 TB the carried side's signatures
    * persist bucketed by band — recomputed here at gate scale, or read
    * from a persisted [[graft.dedup.LshDiskIndex]] when `lshIndexDir`
    * is set).
    *
    * `lshIndexDir`: a persisted LSH index whose LIVE set equals
    * `carried` (prevCurated minus this increment's dead docs — the
    * CurationRunner retires them before calling). When set, the
    * near-dup stage probes the index instead of re-signing the carried
    * corpus: the standing signatures are read pruned to the delta's
    * own (band, bucket) footprint, so the daily near-dup cost scales
    * with |delta|, not |corpus| (probe ≡ focused pass, spec-pinned).
    *
    * `precomputedDiff`: the Snapshot.diff(prevRaw, newRaw) frame when
    * the caller already computed (and persisted) it for its own
    * bookkeeping — avoids a second full diff of the snapshots. */
  def curateIncrement(prevRaw: DataFrame, prevCurated: DataFrame,
      newRaw: DataFrame, evalDocs: Option[DataFrame],
      cfg: CurationConfig = CurationConfig(),
      lshIndexDir: Option[String] = None,
      precomputedDiff: Option[DataFrame] = None): DataFrame = {
    val d = precomputedDiff.getOrElse(
      graft.ops.Snapshot.diff(prevRaw, newRaw, "doc_id", "text"))
    val dead = d.where(col("status").isin("removed", "changed")).select(col("doc_id"))
    val deltaIds = d.where(col("status").isin("added", "changed")).select(col("doc_id"))
    val carried = prevCurated.join(dead, Seq("doc_id"), "left_anti")
    val delta = newRaw.join(deltaIds, Seq("doc_id"), "left_semi")
    // delta feeds the exact-identity join, LSH tokenization, and the
    // survivor anti-joins — persist like curate's core
    val deltaCore = graft.ops.CacheScope.persist(curateCore(delta, cfg))

    // exact identity vs carried (first-writer-wins): (fp40, nlen) anti
    def nlen = TextFunctions.normalizedLength(col("text"))
    val carriedKeys = carried.select(
      TextFunctions.fingerprint(col("text")).as("fp"), nlen.as("nl")).distinct()
    val deltaExact = deltaCore
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("nl", nlen)
      .join(carriedKeys, Seq("fp", "nl"), "left_anti")
      .drop("fp", "nl")

    // near-dup: delta vs (carried ∪ delta) via the FOCUSED band join —
    // the probe side ranges over delta rows only, so carried×carried
    // candidates (irrelevant: only delta docs can drop) are never
    // generated and LSH cost scales with |delta|. A component containing
    // ANY carried doc drops all its delta members (carried always wins);
    // pure-delta components keep their canonical (min-id) member.
    // With an LSH index the SAME pair set comes from the persisted
    // probe instead — the carried corpus is then never re-signed, only
    // its pruned (band, bucket) partitions are read.
    val tagged = carried.select(col("doc_id"), col("text"), lit(0L).as("is_delta"))
      .unionByName(deltaExact.select(col("doc_id"), col("text"), lit(1L).as("is_delta")))
      .withColumn("is_delta_b", col("is_delta") === 1L)
    val pairs = lshIndexDir match {
      case Some(dir) => graft.dedup.LshDiskIndex.probe(
        newRaw.sparkSession, dir, deltaExact, "doc_id", "text",
        cfg.nearDupThreshold)
      case None => Dedup.minhashNearDupPairsFocused(tagged, "doc_id", "text",
        "is_delta_b", cfg.nearDupThreshold)
    }
    val withTag = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .join(tagged.select(col("doc_id").as("id"), col("is_delta")), Seq("id"))
    val compMin = withTag.groupBy(col("component"))
      .agg(min(col("is_delta")).as("min_delta"))
    val dropIds = withTag.join(compMin, Seq("component"))
      .where(col("is_delta") === 1L &&
        (col("min_delta") === 0L || col("id") =!= col("component")))
      .select(col("id").as("doc_id"))
    val deltaNear = deltaExact.join(dropIds, Seq("doc_id"), "left_anti")

    // decontamination + sampling: the full run's own stages
    carried.unionByName(
      ScaleOps.deterministicSampleBp(
        decontaminateSpans(decontaminate(deltaNear, evalDocs), evalDocs, cfg),
        "doc_id", cfg.sampleBp))
  }
}
