package graft.pipeline

import graft.io.Lake
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The daily production loop, composed end-to-end: the AvailableNow
  * streaming drain (which files are new is the CHECKPOINT's knowledge,
  * not a convention), snapshot maintenance, incremental recuration
  * (only added/changed documents pay curation cost), and run metadata —
  * one `runDaily(lake, date)` call per day (reference analog: the
  * @daily Airflow DAG, medical_etl_dag.py:162-231, re-expressed over
  * the engine's curation operators).
  *
  * Lake layout:
  *   raw/documents/<file>.json       — landed files (append-only zone)
  *   staged/documents/               — drained rows + ingest_date
  *   _checkpoints/documents/         — the stream's file ledger
  *   snapshot/date=D/                — full raw snapshot as of run D
  *   curated/date=D/                 — curated corpus as of run D
  *   metadata/run_date=D/            — per-stage RunMetadata rows
  *
  * Snapshot semantics: latest landed row per doc_id wins (ingest_date
  * desc; a doc_id re-landing with new text is a "changed" document in
  * the diff). Ties within one day break on text ascending —
  * deterministic, but land one row per doc_id per day.
  *
  * Scale shape: the drain appends only new files (no re-read of the raw
  * zone); the snapshot window is one shuffle on doc_id (exchange-free
  * when staged is bucketed by doc_id); curation cost is |delta| via
  * Curation.curateIncrement; snapshots/curated corpora are
  * date-versioned so a run never overwrites an input it is lazily
  * reading (the self-overwrite hazard), and history stays queryable for
  * Snapshot.diff audits. */
object CurationRunner {

  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** How the raw zone's landed files decode into (doc_id, source,
    * text) rows. [[RawJson]] (the default): NDJSON rows of
    * [[rawSchema]]. [[RawWarc]]: binary crawl-archive segments —
    * each landed .warc (or .warc.gz / .warc.zst — `codec` names the
    * compression, "auto" sniffs per-file magic for mixed segment
    * directories) file drains through
    * [[graft.multimodal.Containers.warcDocs]] (record walk ->
    * responses only -> canonical URL -> HTML-extracted text), with
    * doc_id = hash of the canonical URL and source = registrable
    * domain, so a re-crawl of a URL on a later day is a CHANGED
    * document under the snapshot's latest-row-wins semantics — the
    * full Common-Crawl ingestion path inside the same daily loop. */
  sealed trait RawFormat
  case object RawJson extends RawFormat
  final case class RawWarc(gzipped: Boolean = false,
      codec: String = "") extends RawFormat
  /** Landed `.zip` archives of text members — the dataset-dump
    * distribution layout. Each file drains through
    * [[graft.multimodal.Containers.zipDocs]] (central-directory walk
    * -> extracted CRC-valid members), doc_id = hash of the member
    * name, source = its top-level directory — so a member re-landing
    * on a later day is a CHANGED document under the snapshot's
    * latest-row-wins semantics. */
  case object RawZip extends RawFormat
  /** Landed `.pdf` files — the crawl's dominant document format. Each
    * payload drains through [[graft.multimodal.Pdf.pdfDocs]] (xref
    * walk -> page tree -> content-stream text, ok pages joined in page
    * order), doc_id = hash of the file path, source = "pdf". */
  case object RawPdf extends RawFormat

  /** Optional last-mile export: pack the day's curated corpus and land
    * loader-ready shards + manifest under shards/date=D. */
  final case class ShardConfig(binTokens: Long = 2048L, numBuckets: Int = 64)

  /** Standing-index maintenance for the daily loop (on by default —
    * the indexes exist FOR this loop). Each run keeps the persisted
    * LSH and BM25 indexes' live set equal to the day's curated corpus:
    * retire this increment's dead docs, probe near-dups through the
    * LSH index (so the carried corpus is never re-signed — the probe
    * reads only the delta's own (band, bucket) footprint), and append
    * the day's curated survivors. An IVF index registered under
    * `index/ivf` additionally refreshes its centroids (warm-start
    * Lloyd over the index's own vectors, date-versioned landing +
    * pointer swap) whenever the day's token KL drift exceeds
    * `ivfRefreshKlMilli`. */
  /** `compactTombstoneBp`: when an index's distinct retired ids exceed
    * this fraction (basis points) of the day's curated corpus, the
    * daily run COMPACTS it — a fresh write of the live set under the
    * standing config — folding the tombstone anti-set out of every
    * future probe (the Lucene segment-merge analog; until then,
    * retire stays O(delta) and standing files stay immutable).
    *
    * `embed`: the vector-side of the daily loop. When supplied — a
    * function from a curated docs frame (doc_id, source, text) to one
    * (doc_id, embedding) row per doc — the run keeps the IVF family
    * under `index/ivf` tracking the curated corpus exactly as the text
    * indexes do: backfill once from the previous curated corpus when
    * no family exists (stride-seeded Lloyd centroids), retire the
    * increment's dead vectors, append the delta's vectors under the
    * standing centroids, compact past the tombstone threshold (as a
    * NEW version + pointer swap — vector compaction reads the index it
    * rewrites, so it lands beside, never in place). Without `embed`
    * a registered family gets drift-refresh only (the frozen-corpus
    * mode — its live set is the caller's business). An embed-maintained
    * family is doc_id-keyed by construction; don't point the ptr at a
    * foreign-keyed index and then supply `embed`.
    * `ivfBuckets`/`ivfTrainStride` size backfill/first-write: gate-
    * scale defaults; a 100 TB corpus wants O(thousands) buckets and a
    * stride putting ~√n vectors in the seed.
    *
    * `phash`: the MEDIA-side of the daily loop. When supplied — a
    * function from a curated docs frame to one (doc_id, phash) row
    * per doc with a media payload (perceptual hash of the decoded
    * bytes; docs without media simply absent) — the run keeps a
    * [[graft.dedup.PhashDiskIndex]] family under `index/phash`
    * tracking the curated corpus with the exact text-index
    * discipline: backfill once from the previous curated corpus,
    * retire the increment's dead media, append the delta's hashes,
    * compact past the tombstone threshold. Incremental image/audio
    * near-dup decisions (the q161 rule) then probe this standing
    * family instead of re-banding the corpus.
    *
    * `audio`: the AUDIO member of the same discipline. When supplied —
    * a function from a curated docs frame to one (doc_id, fp) row per
    * doc with an audio payload ([[graft.multimodal.AudioFp]]
    * fingerprints; docs without audio simply absent) — the run keeps
    * a [[graft.dedup.PhashDiskIndex]] family under `index/audio`
    * (fingerprints are 64-bit longs, so the banded index is
    * hash-generic — the q200 proof): backfill once from the previous
    * curated corpus, retire the increment's dead docs, append the
    * delta's fingerprints, compact past the tombstone threshold. */
  final case class IndexConfig(
      lshBuckets: Int = 16, bm25Buckets: Int = 64,
      ivfRefreshKlMilli: Long = 100L, ivfRefreshIters: Int = 2,
      compactTombstoneBp: Long = 2000L,
      embed: Option[DataFrame => DataFrame] = None,
      ivfBuckets: Int = 16, ivfTrainStride: Int = 16,
      phash: Option[DataFrame => DataFrame] = None,
      phashBuckets: Int = 16,
      audio: Option[DataFrame => DataFrame] = None,
      audioBuckets: Int = 16,
      clip: Option[DataFrame => DataFrame] = None,
      clipBuckets: Int = 16, clipFrameShift: Int = 12,
      pq: Option[PqConfig] = None)

  /** Compressed-tier vector family (`index/ivfpq`,
    * [[graft.ann.IvfPqIndex]]): when set — REQUIRES `embed` — the run
    * maintains the IVF-PQ residual-code index beside `index/ivf` with
    * the identical discipline (backfill once from the previous curated
    * corpus, retire dead vectors, append the delta under the standing
    * centroids + codebooks, land-beside compaction past the tombstone
    * threshold, drift-refresh retrain on the ivf KL signal — the
    * retrain re-embeds the day's curated corpus, since the compressed
    * index stores codes, not fp32). `m`/`dim` must match the embed
    * output; `stride` seeds the residual codebooks. `rotated` turns on
    * the Hadamard OPQ-lite serving space ([[graft.ann.IvfPqIndex]]'s
    * flag): centroids and codebooks train on the rotated view at write
    * time (the pq tier then trains its OWN centroids instead of
    * sharing the ivf tier's — the two tiers live in different spaces),
    * and every later append / probe / refresh picks the flag up from
    * the index meta. */
  final case class PqConfig(m: Int = 8, dim: Int = 64, buckets: Int = 16,
      stride: Int = 16, rotated: Boolean = false)

  /** Paired media+caption curation as a maintained daily stage — the
    * q157/q161 decision rule running INSIDE the loop (the reference
    * analog: the enrichment join living inside the pipeline,
    * drug_transformer.py:189-288, not beside it). `media` maps a
    * curated docs frame to one (doc_id, img_ok, phash) row per doc
    * that CARRIES a media payload (img_ok=0 for an undecodable one;
    * docs without media are caption-only and pass the stage
    * untouched). Each run applies the image-side gates to the day's
    * DELTA survivors of text curation, the precedence q157 pins:
    * caption gates first (text curation's job), then
    * image_undecodable, then image_dup — a delta doc is an image dup
    * iff its pHash pairs (hamming <= `maxDist`) with ANY standing
    * curated doc's media or with a SMALLER-id delta doc (the
    * first-wins rule a daily ingest applies; q161's semantics, which
    * two-day composition preserves when ids grow with time — the
    * crawl-day invariant). The standing side is the maintained
    * `index/phash` family, so a day pays only its own (band, bucket)
    * probe footprint — when the family is absent (first run, an
    * already-applied re-run, or maintenance off) the stage falls back
    * to re-banding carried media, the curateIncrement fallback shape.
    * Per-reason drop counts land in RunMetadata as
    * `paired_drop:<reason>` stage rows.
    *
    * When `paired` is set and the IndexConfig has no `phash` family,
    * the family is DERIVED from `media` (ok rows), so the standing
    * index and the day's decisions can never drift apart. */
  final case class PairedConfig(
      media: DataFrame => DataFrame,
      maxDist: Int = 5)

  /** Clip-level video dedup as a maintained daily stage — the q170
    * cross-container pair rule running INSIDE the loop: `frames` maps
    * a curated docs frame to one (doc_id, clip_ok, frame_idx, phash)
    * row per decoded video frame of docs that CARRY a video payload
    * (one clip_ok=0 row for a container-level refusal; docs without
    * video are absent and pass the stage untouched). A delta doc
    * drops as a video dup iff >= `minSharedFrames` of its frame
    * hashes pair (hamming <= `maxDist`) with frames of ANY standing
    * curated clip or of a SMALLER-id delta clip (the first-wins rule;
    * two-day composition preserved when ids grow with time — the
    * crawl-day invariant). Because the frame hashes are
    * container-independent (q170: MP4 / animated WebP / GIF all
    * decode to the same pHash), a clip RE-ENCODED under a different
    * wrapper on a later day still drops. The standing side is a
    * [[graft.dedup.PhashDiskIndex]] family under `index/clip` keyed
    * by composite fid = doc_id << IndexConfig.clipFrameShift |
    * frame_idx, maintained with the exact media-family discipline
    * (backfill once, retire dead clips' frames, append the delta,
    * tombstone-threshold compaction); the shift is FIXED for the
    * index lifetime and guarded per row. Per-reason drops land as
    * `clip_drop:<reason>` RunMetadata rows. When `clips` is set and
    * the IndexConfig has no `clip` family, the family is DERIVED from
    * `frames` (ok rows), so the index and the decisions cannot
    * drift. */
  final case class ClipConfig(
      frames: DataFrame => DataFrame,
      maxDist: Int = 3,
      minSharedFrames: Int = 2)

  /** Persisted-tokenizer maintenance (the BPE deployment lifecycle —
    * [[graft.text.TokenizerStore]]): each run folds the curated
    * corpus's day-over-day delta into the additive word-count state
    * (changed/removed docs retire their OLD counts as negative
    * increments, so the folded state equals a from-scratch tokenize of
    * the current corpus EXACTLY) and re-learns a new artifact version
    * + pointer swap when the arriving text's token KL vs the previous
    * corpus exceeds `refreshKlMilli` — the IVF-refresh trigger applied
    * to the tokenizer. */
  final case class TokenizerConfig(
      numMerges: Int = 64, refreshKlMilli: Long = 100L)

  /** The crawl-compliance gate (RFC 9309) running INSIDE the daily
    * loop: each run re-evaluates the day's robots corpus against the
    * WHOLE folded snapshot before it lands — so a domain that tightens
    * its rules on day N retroactively drops previously-ingested
    * documents from day N's snapshot and (through the normal
    * removed-doc machinery) from the curated corpus and every
    * maintained index. `robots` is one (source, robots_txt) row per
    * registrable domain (the day's fetched robots files — small,
    * broadcast against the snapshot); a source with no row is ALLOWED
    * (no robots.txt = crawl permitted, the RFC default). `urls` maps
    * doc_id -> the document's request URL when the drain knows it;
    * rules then apply per-path. Without it the gate evaluates the
    * domain's "/" rule — the domain-level kill switch. Drops land in
    * RunMetadata as the `robots_gate` stage metric and in
    * [[DailyResult.robotsDropped]]. */
  final case class RobotsConfig(
      robots: DataFrame,
      agent: String = "graftbot",
      urls: Option[DataFrame] = None)

  final case class DailyResult(
      date: String, snapshotDocs: Long, curatedDocs: Long, incremental: Boolean,
      shardCount: Long = -1L, klMilli: Long = -1L, ivfRefreshed: Boolean = false,
      tokenizerRefreshed: Boolean = false, pairedDropped: Long = -1L,
      clipDropped: Long = -1L, robotsDropped: Long = -1L)

  /** (doc_id, frame_idx, …) -> (fid, phash) under the clip family's
    * fixed composite packing, each row guarded against the shift's id
    * ranges (an out-of-range id would silently alias two clips). */
  private def packFid(frameShift: Int)(frames: DataFrame): DataFrame = {
    val maxDoc = 1L << (62 - frameShift)
    val maxFrame = 1L << frameShift
    frames.select(
      when(col("doc_id").between(0, maxDoc - 1) &&
          col("frame_idx").between(0, maxFrame - 1),
        shiftleft(col("doc_id"), frameShift) + col("frame_idx"))
        .otherwise(raise_error(concat(
          lit(s"clip fid packing (frameShift=$frameShift): out of range "),
          col("doc_id").cast("string"), lit("/"),
          col("frame_idx").cast("string"))))
        .as("fid"),
      col("phash"))
  }

  private def snapshotPath(root: String, date: String) = s"$root/snapshot/date=$date"
  private def curatedPath(root: String, date: String) = s"$root/curated/date=$date"

  /** All run dates present in the date-versioned snapshot zone, sorted
    * ascending (ISO dates sort lexically). */
  private[pipeline] def runDates(spark: SparkSession, root: String): Seq[String] =
    Lake.list(spark, s"$root/snapshot")
      .flatMap(_.split('/').lastOption)
      .collect { case d if d.startsWith("date=") => d.stripPrefix("date=") }
      .sorted

  /** Latest run date strictly before `date`. */
  private[pipeline] def prevRunDate(spark: SparkSession, root: String,
      date: String): Option[String] =
    runDates(spark, root).filter(_ < date).lastOption

  def runDaily(spark: SparkSession, lakeRoot: String, date: String,
      evalDocs: Option[DataFrame] = None,
      cfg: Curation.CurationConfig = Curation.CurationConfig(),
      shards: Option[ShardConfig] = None,
      indexes: Option[IndexConfig] = Some(IndexConfig()),
      rawFormat: RawFormat = RawJson,
      tokenizer: Option[TokenizerConfig] = None,
      paired: Option[PairedConfig] = None,
      clips: Option[ClipConfig] = None,
      robots: Option[RobotsConfig] = None): DailyResult = {
    require(date.matches("""\d{4}-\d{2}-\d{2}"""),
      s"runDaily: date must be ISO yyyy-MM-dd (lexical ordering drives " +
        s"snapshot versioning), got '$date'")
    indexes.foreach(ix => require(ix.pq.isEmpty || ix.embed.isDefined,
      "IndexConfig.pq requires embed: the compressed tier encodes the " +
        "same vectors the ivf family tracks"))
    // runs must move forward: a run dated before an existing snapshot
    // would fold later-dated staged rows into its "snapshot of $date"
    // and diff against the wrong previous state
    runDates(spark, lakeRoot).lastOption.foreach(n => require(date >= n,
      s"runDaily: date '$date' precedes the newest snapshot '$n' — daily runs are forward-only"))
    val meta = new RunMetadata.Collector(date)
    val staged = s"$lakeRoot/staged/documents"

    // 1. drain: every raw file the checkpoint hasn't seen, stamped with
    // this run's date — the Airflow daily batch as an AvailableNow stream
    meta.time("drain") {
      rawFormat match {
        case RawJson =>
          Streaming.runDailyAvailableNow(spark, s"$lakeRoot/raw/documents",
            rawSchema, _.withColumn("ingest_date", lit(date)),
            staged, s"$lakeRoot/_checkpoints/documents")
        case RawWarc(gz, codec) =>
          // one decode per raw file serves BOTH outputs: the staged
          // documents and the standing encoding audit (per-(coding,
          // charset, refusal) record counts — the q202/q204 rollup as
          // a daily metric; rows accumulate under metadata_encoding/
          // stamped with the ingest date, no second payload read)
          Streaming.runDailyAvailableNowBinaryAudited(spark,
            s"$lakeRoot/raw/documents",
            df => graft.multimodal.Containers.decodeWarc(
              df.select(xxhash64(col("path")).as("media_id"),
                col("content").as("payload")),
              gzipped = gz, codec = codec).toDF(),
            recs => graft.multimodal.Containers.warcDocsFromRecords(recs)
              .select(col("doc_id"), col("source"), col("text"))
              .withColumn("ingest_date", lit(date)),
            recs => graft.multimodal.Containers.encodingAudit(recs)
              .withColumn("ingest_date", lit(date)),
            staged, s"$lakeRoot/metadata_encoding",
            s"$lakeRoot/_checkpoints/documents")
        case RawZip =>
          Streaming.runDailyAvailableNowBinary(spark, s"$lakeRoot/raw/documents",
            df => graft.multimodal.Containers.zipDocs(
                df.select(xxhash64(col("path")).as("media_id"),
                  col("content").as("payload")))
              .select(col("doc_id"), col("source"), col("text"))
              .withColumn("ingest_date", lit(date)),
            staged, s"$lakeRoot/_checkpoints/documents")
        case RawPdf =>
          Streaming.runDailyAvailableNowBinary(spark, s"$lakeRoot/raw/documents",
            df => graft.multimodal.Pdf.pdfDocs(
                df.select(xxhash64(col("path")).as("media_id"),
                  col("content").as("payload")))
              .select(col("doc_id"), col("source"), col("text"))
              .withColumn("ingest_date", lit(date)),
            staged, s"$lakeRoot/_checkpoints/documents")
      }
      ((), -1L)
    }

    // 1b. the day's encoding mix as stage metrics — per-(charset,
    // refusal) record counts from the drain's one-pass audit, so
    // drift in the crawl's encoding mix (a rising unsupported_charset
    // share, a brotli-heavy source) is visible where the operator
    // already looks. Bounded cardinality: charsets × refusal tags.
    rawFormat match {
      case RawWarc(_, _) if Lake.exists(spark, s"$lakeRoot/metadata_encoding") =>
        Lake.readParquet(spark, s"$lakeRoot/metadata_encoding")
          .where(col("ingest_date") === date)
          .groupBy(col("charset"), col("payload_err"))
          .agg(sum(col("n_records")).as("n"))
          .collect()
          .sortBy(r => (r.getString(0), r.getString(1)))
          .foreach { r =>
            val cs = if (r.getString(0).isEmpty) "-" else r.getString(0)
            val err = if (r.getString(1).isEmpty) "ok" else r.getString(1)
            meta.time(s"encoding:$cs:$err") { ((), r.getLong(2)) }
          }
      case _ => ()
    }

    // 2. snapshot: latest landed row per doc_id
    val stagedDf = Lake.readParquet(spark, staged,
      Some(rawSchema.add("ingest_date", StringType)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("ingest_date").desc, col("text").asc)
    val folded = stagedDf
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    // robots gate BEFORE the snapshot lands: the snapshot is the
    // retained corpus, and compliance applies to retention, not just
    // first fetch — today's robots re-gate yesterday's staged rows too
    val (newRaw, nRobotsDropped) = robots match {
      case Some(rc) =>
        val path = rc.urls match {
          case Some(_) =>
            // path + query, fragment off; unknown url -> "/"
            coalesce(regexp_extract(col("__url"),
                "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)", 1), lit("/"))
          case None => lit("/")
        }
        val based = rc.urls match {
          case Some(u) => folded.join(
            u.select(col("doc_id"), col("url").as("__url")),
            Seq("doc_id"), "left")
          case None => folded
        }
        val withR = based
          .join(broadcast(rc.robots.select(col("source"),
            col("robots_txt").as("__robots"))), Seq("source"), "left")
          .withColumn("__robots", coalesce(col("__robots"), lit("")))
          .withColumn("__agent", lit(rc.agent))
          .withColumn("__path", when(length(path) > 0, path).otherwise(lit("/")))
        // persisted: the drop-count action and the snapshot write's
        // semi-join both consume dec — unpersisted, the second use
        // replays the full-corpus window + robots parse
        val dec = graft.ops.CacheScope.persist(graft.text.Robots.decisions(
          withR, "doc_id", "__robots", "__agent", "__path"))
        val dropped = meta.time("robots_gate") {
          val n = dec.where(col("allowed") === 0L).count()
          (n, n)
        }
        (folded.join(dec.where(col("allowed") === 1L).select(col("doc_id")),
          Seq("doc_id"), "left_semi"), dropped)
      case None => (folded, -1L)
    }
    val nSnapshot = meta.time("snapshot") {
      Lake.writeParquet(newRaw, snapshotPath(lakeRoot, date))
      val n = Lake.readParquet(spark, snapshotPath(lakeRoot, date)).count()
      (n, n)
    }

    // Read the version just written (not the lazy pre-write plan) so
    // curation never recomputes the drain+window chain per stage.
    val snapshot = Lake.readParquet(spark, snapshotPath(lakeRoot, date))

    // 3. curate: incremental against the previous run when one exists.
    // With index maintenance on (the default), the near-dup stage runs
    // through the persisted LSH index: retire this increment's dead
    // docs first (so the index's live set == carried), probe, and —
    // after publish — append the day's survivors. The `_applied/date=D`
    // marker makes a re-run of an already-maintained date a no-op on
    // the indexes (append's new files must not double-apply). A run
    // that CRASHED mid-maintenance leaves no marker; re-running it is
    // safe through publish — retire is idempotent per seq (tombstones
    // fold in the per-id max; the BM25 stats decrement dedupes on its
    // seq stamp) — but a crash inside the APPEND stage itself (after a
    // postings job committed, before the marker) still needs a rebuild
    // via write()/compact before re-running.
    val prev = prevRunDate(spark, lakeRoot, date)
    val seq = date.replace("-", "").toLong
    val lshDir = s"$lakeRoot/index/lsh"
    val bm25Dir = s"$lakeRoot/index/bm25"
    val ivfRoot = s"$lakeRoot/index/ivf"
    val pqRoot = s"$lakeRoot/index/ivfpq"
    val phDir = s"$lakeRoot/index/phash"
    val audioDir = s"$lakeRoot/index/audio"
    val clipDir = s"$lakeRoot/index/clip"
    val appliedMark = s"$lakeRoot/index/_applied/date=$date"
    // paired curation with no registered media family derives one from
    // its own extractor — the standing index and the day's decisions
    // come from the same function and cannot drift
    val effIndexes = indexes.map { ix =>
      val withMedia =
        if (paired.isDefined && ix.phash.isEmpty)
          ix.copy(phash = Some(docs => paired.get.media(docs)
            .where(col("img_ok") === 1)
            .select(col("doc_id"), col("phash"))))
        else ix
      // same derivation for the clip family: the standing frame index
      // and the day's clip decisions come from one extractor
      if (clips.isDefined && withMedia.clip.isEmpty)
        withMedia.copy(clip = Some(docs => clips.get.frames(docs)
          .where(col("clip_ok") === 1)
          .select(col("doc_id"), col("frame_idx"), col("phash"))))
      else withMedia
    }
    val maintain = effIndexes.filter(_ => !Lake.exists(spark, appliedMark))
    val (curated, deltaIdsOpt) = meta.time("curate") {
      val (out, deltaIds) = prev match {
        case Some(p) =>
          val prevSnap = Lake.readParquet(spark, snapshotPath(lakeRoot, p))
          val prevCur = Lake.readParquet(spark, curatedPath(lakeRoot, p))
          // ONE diff serves the index bookkeeping and curateIncrement
          val d = graft.ops.CacheScope.persist(
            graft.ops.Snapshot.diff(prevSnap, snapshot, "doc_id", "text"))
          val deadIds = d.where(col("status").isin("removed", "changed"))
            .select(col("doc_id"))
          maintain.foreach { ix =>
            // backfill: a lake predating index maintenance builds the
            // standing indexes ONCE from the previous curated corpus
            val prevSeq = p.replace("-", "").toLong
            if (!Lake.exists(spark, s"$lshDir/meta"))
              graft.dedup.LshDiskIndex.write(prevCur, "doc_id", "text",
                lshDir, numBuckets = ix.lshBuckets, seq = prevSeq)
            if (!Lake.exists(spark, s"$bm25Dir/stats"))
              graft.text.Bm25DiskIndex.write(prevCur, "doc_id", "text",
                bm25Dir, numBuckets = ix.bm25Buckets, seq = prevSeq)
            // retire ONLY dead docs the index actually holds (the
            // BM25 stats decrement must subtract indexed text)
            val retired = graft.ops.CacheScope.persist(
              prevCur.join(deadIds, Seq("doc_id"), "left_semi"))
            graft.dedup.LshDiskIndex.retire(spark, lshDir,
              retired.select(col("doc_id")), "doc_id", seq)
            graft.text.Bm25DiskIndex.retire(retired, "doc_id", "text",
              bm25Dir, seq)
            // vector family: backfill once, then retire dead vectors —
            // the text indexes' exact discipline over embeddings
            // media family: backfill once, then retire dead media —
            // the same discipline over perceptual hashes
            ix.phash.foreach { ph =>
              if (!Lake.exists(spark, s"$phDir/meta"))
                graft.dedup.PhashDiskIndex.write(ph(prevCur), "doc_id", "phash",
                  phDir, numBuckets = ix.phashBuckets, seq = prevSeq)
              graft.dedup.PhashDiskIndex.retire(spark, phDir, deadIds,
                "doc_id", seq)
            }
            // audio family: the identical discipline over fingerprints
            ix.audio.foreach { au =>
              if (!Lake.exists(spark, s"$audioDir/meta"))
                graft.dedup.PhashDiskIndex.write(au(prevCur), "doc_id", "fp",
                  audioDir, numBuckets = ix.audioBuckets, seq = prevSeq)
              graft.dedup.PhashDiskIndex.retire(spark, audioDir, deadIds,
                "doc_id", seq)
            }
            // clip family: fid-keyed, so dead docs retire through
            // their (deterministically re-derived) frame fids
            ix.clip.foreach { cf =>
              if (!Lake.exists(spark, s"$clipDir/meta"))
                graft.dedup.PhashDiskIndex.write(
                  packFid(ix.clipFrameShift)(cf(prevCur)), "fid", "phash",
                  clipDir, numBuckets = ix.clipBuckets, seq = prevSeq)
              graft.dedup.PhashDiskIndex.retire(spark, clipDir,
                packFid(ix.clipFrameShift)(cf(retired)).select(col("fid")),
                "fid", seq)
            }
            // backfill work shared by the two vector tiers: ONE embed
            // pass (persisted — embed is model inference on a real
            // corpus) and ONE centroid training, whichever families
            // need to backfill this run
            val needIvfBf = ix.embed.isDefined &&
              graft.ann.IvfIndex.currentVersion(spark, ivfRoot).isEmpty
            val needPqBf = ix.pq.isDefined &&
              graft.ann.IvfIndex.currentVersion(spark, pqRoot).isEmpty
            val pvBf =
              if (needIvfBf || needPqBf)
                Some(graft.ops.CacheScope.persist(ix.embed.get.apply(prevCur)))
              else None
            val centsBf = pvBf.map(pv =>
              graft.ann.Ann.ivfTrainCentroids(pv, "doc_id", "embedding",
                ix.ivfTrainStride, ix.ivfRefreshIters))
            ix.embed.foreach { _ =>
              if (needIvfBf) {
                graft.ann.IvfIndex.write(pvBf.get, "doc_id", "embedding",
                  centsBf.get, s"$ivfRoot/v$p", ix.ivfBuckets, prevSeq)
                graft.ann.IvfIndex.setCurrentVersion(spark, ivfRoot, s"v$p")
              }
              val ver = graft.ann.IvfIndex.currentVersion(spark, ivfRoot).get
              graft.ann.IvfIndex.retire(spark, s"$ivfRoot/$ver",
                deadIds, "doc_id", seq)
            }
            // compressed-tier family: the ivf discipline over residual
            // codes (pq requires embed — validated at entry)
            ix.pq.foreach { pqc =>
              if (needPqBf) {
                // rotated tier: its artifacts train on the rotated
                // view — own centroids (the ivf tier's live in the
                // original space); write() re-rotates at encode
                val src = if (pqc.rotated)
                  graft.ann.IvfPqIndex.rotatedView(pvBf.get, "embedding",
                    pqc.dim)
                else pvBf.get
                val centsPq = if (pqc.rotated)
                  graft.ann.Ann.ivfTrainCentroids(src, "doc_id",
                    "embedding", ix.ivfTrainStride, ix.ivfRefreshIters)
                else centsBf.get
                val cbk = graft.ann.IvfPq.trainCodebooks(src, "doc_id",
                  "embedding", centsPq, pqc.m, pqc.dim, pqc.stride,
                  ix.ivfRefreshIters)
                graft.ann.IvfPqIndex.write(pvBf.get, "doc_id", "embedding",
                  centsPq, cbk, pqc.m, pqc.dim, s"$pqRoot/v$p",
                  pqc.buckets, prevSeq, rotated = pqc.rotated)
                graft.ann.IvfIndex.setCurrentVersion(spark, pqRoot, s"v$p")
              }
              val ver = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
              graft.ann.IvfPqIndex.retire(spark, s"$pqRoot/$ver",
                deadIds, "doc_id", seq)
            }
          }
          (Curation.curateIncrement(prevSnap, prevCur, snapshot, evalDocs,
            cfg, lshIndexDir = maintain.map(_ => lshDir),
            precomputedDiff = Some(d)),
            Some(d.where(col("status").isin("added", "changed"))
              .select(col("doc_id"))))
        case None =>
          (Curation.curate(snapshot, evalDocs, cfg, countStages = false)._1,
            None)
      }
      // force the curation compute HERE (persist + count): without an
      // action this stage would time only lazy plan construction and
      // misattribute the diff/LSH/decontamination cost to "publish".
      // The persist is released by releaseAll at the end of the run.
      val persisted = graft.ops.CacheScope.persist(out)
      ((persisted, deltaIds), persisted.count())
    }

    // 3.5 paired media+caption curation: the image-side gates over the
    // day's delta survivors of text curation (see PairedConfig). Runs
    // BEFORE publish so the published corpus, every standing index's
    // live set, shards, and the tokenizer state all see the refined
    // membership — the stage is part of curation, not a side filter.
    val (curatedPaired, pairedDropped) = paired match {
      case Some(pc) => meta.time("paired") {
        // carried docs already passed this gate on their own day
        val deltaDocs = deltaIdsOpt match {
          case Some(ids) => curated.join(ids, Seq("doc_id"), "left_semi")
          case None => curated
        }
        val media = graft.ops.CacheScope.persist(pc.media(deltaDocs))
        val und = media.where(col("img_ok") =!= 1).select(col("doc_id"))
        val okH = media.where(col("img_ok") === 1)
          .select(col("doc_id").as("id"), col("phash"))
        val pairs =
          if (prev.isDefined && maintain.isDefined &&
              Lake.exists(spark, s"$phDir/meta"))
            // standing family live set == carried media (stage 3
            // retired this increment's dead ids): the probe reads only
            // the delta's own (band, bucket) footprint and returns
            // delta-vs-standing AND delta-vs-delta pairs
            graft.dedup.PhashDiskIndex.probe(spark, phDir, okH,
              "id", "phash", pc.maxDist)
          else {
            // no standing family (first run, already-applied re-run,
            // or maintenance off): re-band carried media beside the
            // delta — the curateIncrement fallback shape
            val carriedDocs = deltaIdsOpt match {
              case Some(ids) => curated.join(ids, Seq("doc_id"), "left_anti")
              case None => curated.limit(0)
            }
            val standingH = pc.media(carriedDocs)
              .where(col("img_ok") === 1)
              .select(col("doc_id").as("id"), col("phash"))
            graft.dedup.Dedup.hammingNearDupPairs(
              standingH.unionByName(okH), "id", "phash",
              totalBits = 64, maxDist = pc.maxDist, bands = 8)
          }
        // first-wins over (id_a < id_b)-normalized pairs: a delta id_b
        // always has a smaller partner; a delta id_a drops only against
        // a STANDING id_b (a larger delta partner never outranks it)
        val isDelta = okH.select(col("id")).withColumn("__d", lit(1))
        val pj = pairs
          .join(broadcast(isDelta.select(col("id").as("id_a"), col("__d").as("__da"))),
            Seq("id_a"), "left")
          .join(broadcast(isDelta.select(col("id").as("id_b"), col("__d").as("__db"))),
            Seq("id_b"), "left")
        val dupIds = pj.where(col("__db") === 1).select(col("id_b").as("doc_id"))
          .unionByName(pj.where(col("__da") === 1 && col("__db").isNull)
            .select(col("id_a").as("doc_id")))
          .distinct()
        val drops = graft.ops.CacheScope.persist(
          und.select(col("doc_id"), lit("image_undecodable").as("drop_reason"))
            .unionByName(dupIds.join(und, Seq("doc_id"), "left_anti")
              .select(col("doc_id"), lit("image_dup").as("drop_reason"))))
        // per-reason counts land as their own RunMetadata stage rows —
        // the curation owner reads per-side loss straight off the run
        val nUnd = drops.where(col("drop_reason") === "image_undecodable").count()
        val nDup = drops.where(col("drop_reason") === "image_dup").count()
        meta.time("paired_drop:image_undecodable") { ((), nUnd) }
        meta.time("paired_drop:image_dup") { ((), nDup) }
        val refined = graft.ops.CacheScope.persist(
          curated.join(drops, Seq("doc_id"), "left_anti"))
        ((refined, nUnd + nDup), nUnd + nDup)
      }
      case None => (curated, -1L)
    }

    // 3.6 clip-level video dedup: the q170 cross-container pair rule
    // over the day's delta survivors of everything above (see
    // ClipConfig). Same placement rationale as 3.5 — runs BEFORE
    // publish so the corpus, indexes, shards, and tokenizer all see
    // the refined membership.
    val (curatedFinal, clipDropped) = clips match {
      case Some(cc) => meta.time("clips") {
        val shift = effIndexes.map(_.clipFrameShift)
          .getOrElse(IndexConfig().clipFrameShift)
        val deltaDocs = deltaIdsOpt match {
          case Some(ids) => curatedPaired.join(ids, Seq("doc_id"), "left_semi")
          case None => curatedPaired
        }
        val fr = graft.ops.CacheScope.persist(cc.frames(deltaDocs))
        val okFr = fr.where(col("clip_ok") === 1)
        // undecodable = carries video but zero decodable frames (a
        // partially-broken clip participates with its live frames)
        val okIds = okFr.select(col("doc_id")).distinct()
        val und = fr.select(col("doc_id")).distinct()
          .join(okIds, Seq("doc_id"), "left_anti")
        val okF = graft.ops.CacheScope.persist(
          packFid(shift)(okFr).select(col("fid").as("id"), col("phash")))
        val framePairs =
          if (prev.isDefined && maintain.isDefined &&
              Lake.exists(spark, s"$clipDir/meta"))
            // standing family live set == carried clips' frames (stage
            // 3 retired the increment's dead fids): |delta| probe
            graft.dedup.PhashDiskIndex.probe(spark, clipDir, okF,
              "id", "phash", cc.maxDist)
          else {
            val carriedDocs = deltaIdsOpt match {
              case Some(ids) => curatedPaired.join(ids, Seq("doc_id"), "left_anti")
              case None => curatedPaired.limit(0)
            }
            val standingF = packFid(shift)(
              cc.frames(carriedDocs).where(col("clip_ok") === 1))
              .select(col("fid").as("id"), col("phash"))
            graft.dedup.Dedup.hammingNearDupPairs(
              standingF.unionByName(okF), "id", "phash",
              totalBits = 64, maxDist = cc.maxDist, bands = 4)
          }
        // fid pairs -> clip pairs with the shared-frame threshold;
        // fid order preserves clip order under one shift, so
        // (id_a < id_b) normalization carries over
        val clipPairs = framePairs
          .select(shiftright(col("id_a"), shift).as("clip_a"),
            shiftright(col("id_b"), shift).as("clip_b"))
          .where(col("clip_a") =!= col("clip_b"))
          .groupBy(col("clip_a"), col("clip_b"))
          .agg(count(lit(1)).as("n_frames"))
          .where(col("n_frames") >= cc.minSharedFrames)
        // first-wins over normalized pairs (the 3.5 rule): a delta
        // clip_b always has a smaller partner; a delta clip_a drops
        // only against a STANDING clip_b
        val isDelta = okIds.withColumn("__d", lit(1))
        val pj = clipPairs
          .join(broadcast(isDelta.select(col("doc_id").as("clip_a"),
            col("__d").as("__da"))), Seq("clip_a"), "left")
          .join(broadcast(isDelta.select(col("doc_id").as("clip_b"),
            col("__d").as("__db"))), Seq("clip_b"), "left")
        val dupIds = pj.where(col("__db") === 1).select(col("clip_b").as("doc_id"))
          .unionByName(pj.where(col("__da") === 1 && col("__db").isNull)
            .select(col("clip_a").as("doc_id")))
          .distinct()
        val drops = graft.ops.CacheScope.persist(
          und.select(col("doc_id"), lit("video_undecodable").as("drop_reason"))
            .unionByName(dupIds.join(und, Seq("doc_id"), "left_anti")
              .select(col("doc_id"), lit("video_dup").as("drop_reason"))))
        val nUnd = drops.where(col("drop_reason") === "video_undecodable").count()
        val nDup = drops.where(col("drop_reason") === "video_dup").count()
        meta.time("clip_drop:video_undecodable") { ((), nUnd) }
        meta.time("clip_drop:video_dup") { ((), nDup) }
        val refined = graft.ops.CacheScope.persist(
          curatedPaired.join(drops, Seq("doc_id"), "left_anti"))
        ((refined, nUnd + nDup), nUnd + nDup)
      }
      case None => (curatedPaired, -1L)
    }

    // 4. publish + metadata
    val nCurated = meta.time("publish") {
      Lake.writeParquet(curatedFinal, curatedPath(lakeRoot, date))
      val n = Lake.readParquet(spark, curatedPath(lakeRoot, date)).count()
      (n, n)
    }
    // 5. index append: fold the day's curated survivors into the
    // standing indexes, restoring the invariant live set == curated(D).
    // Reads the PUBLISHED version (the lazy pre-publish plan would
    // re-run curation); the delta-semi keeps the append |delta|-sized.
    maintain.foreach { ix =>
      meta.time("index_append") {
        val cur = Lake.readParquet(spark, curatedPath(lakeRoot, date))
        val newDocs = deltaIdsOpt match {
          case Some(ids) => cur.join(ids, Seq("doc_id"), "left_semi")
          case None => cur
        }
        prev match {
          case Some(_) =>
            graft.dedup.LshDiskIndex.append(newDocs, "doc_id", "text",
              lshDir, seq = seq)
            graft.text.Bm25DiskIndex.append(newDocs, "doc_id", "text",
              bm25Dir, seq = seq)
            ix.phash.foreach { ph =>
              graft.dedup.PhashDiskIndex.append(ph(newDocs), "doc_id", "phash",
                phDir, seq = seq)
            }
            ix.audio.foreach { au =>
              graft.dedup.PhashDiskIndex.append(au(newDocs), "doc_id", "fp",
                audioDir, seq = seq)
            }
            ix.clip.foreach { cf =>
              graft.dedup.PhashDiskIndex.append(
                packFid(ix.clipFrameShift)(cf(newDocs)), "fid", "phash",
                clipDir, seq = seq)
            }
            // one embed pass over the delta, shared by both vector tiers
            val dvApp =
              if (ix.embed.isDefined)
                Some(graft.ops.CacheScope.persist(ix.embed.get.apply(newDocs)))
              else None
            ix.embed.foreach { _ =>
              val ver = graft.ann.IvfIndex.currentVersion(spark, ivfRoot).get
              graft.ann.IvfIndex.append(dvApp.get, "doc_id", "embedding",
                s"$ivfRoot/$ver", seq)
            }
            ix.pq.foreach { _ =>
              val ver = graft.ann.IvfIndex.currentVersion(spark, pqRoot).get
              graft.ann.IvfPqIndex.append(dvApp.get, "doc_id",
                "embedding", s"$pqRoot/$ver", seq)
            }
          case None =>
            graft.dedup.LshDiskIndex.write(newDocs, "doc_id", "text",
              lshDir, numBuckets = ix.lshBuckets, seq = seq)
            graft.text.Bm25DiskIndex.write(newDocs, "doc_id", "text",
              bm25Dir, numBuckets = ix.bm25Buckets, seq = seq)
            ix.phash.foreach { ph =>
              graft.dedup.PhashDiskIndex.write(ph(newDocs), "doc_id", "phash",
                phDir, numBuckets = ix.phashBuckets, seq = seq)
            }
            ix.audio.foreach { au =>
              graft.dedup.PhashDiskIndex.write(au(newDocs), "doc_id", "fp",
                audioDir, numBuckets = ix.audioBuckets, seq = seq)
            }
            ix.clip.foreach { cf =>
              graft.dedup.PhashDiskIndex.write(
                packFid(ix.clipFrameShift)(cf(newDocs)), "fid", "phash",
                clipDir, numBuckets = ix.clipBuckets, seq = seq)
            }
            // first run: the vector family starts as a fresh write of
            // the full curated corpus (trained centroids), versioned +
            // pointer-swapped like every later rewrite
            // first run: one embed pass + one centroid training shared
            // by both vector tiers' fresh writes
            val vFw =
              if (ix.embed.isDefined)
                Some(graft.ops.CacheScope.persist(ix.embed.get.apply(newDocs)))
              else None
            val centsFw = vFw.map(v =>
              graft.ann.Ann.ivfTrainCentroids(v, "doc_id", "embedding",
                ix.ivfTrainStride, ix.ivfRefreshIters))
            ix.embed.foreach { _ =>
              graft.ann.IvfIndex.write(vFw.get, "doc_id", "embedding",
                centsFw.get, s"$ivfRoot/v$date", ix.ivfBuckets, seq)
              graft.ann.IvfIndex.setCurrentVersion(spark, ivfRoot, s"v$date")
            }
            ix.pq.foreach { pqc =>
              val src = if (pqc.rotated)
                graft.ann.IvfPqIndex.rotatedView(vFw.get, "embedding",
                  pqc.dim)
              else vFw.get
              val centsPq = if (pqc.rotated)
                graft.ann.Ann.ivfTrainCentroids(src, "doc_id", "embedding",
                  ix.ivfTrainStride, ix.ivfRefreshIters)
              else centsFw.get
              val cbk = graft.ann.IvfPq.trainCodebooks(src, "doc_id",
                "embedding", centsPq, pqc.m, pqc.dim, pqc.stride,
                ix.ivfRefreshIters)
              graft.ann.IvfPqIndex.write(vFw.get, "doc_id", "embedding",
                centsPq, cbk, pqc.m, pqc.dim, s"$pqRoot/v$date",
                pqc.buckets, seq, rotated = pqc.rotated)
              graft.ann.IvfIndex.setCurrentVersion(spark, pqRoot, s"v$date")
            }
        }
        // tombstone-fraction compaction: past the threshold, rebuild
        // the index as one fresh write of the live set (== the just-
        // published curated corpus) under its standing config — the
        // probes are unchanged, the dead rows and the tombstone
        // anti-set stop being read
        if (nCurated > 0) {
          if (graft.dedup.LshDiskIndex.tombstoneCount(spark, lshDir) * 10000L >
              ix.compactTombstoneBp * nCurated)
            graft.dedup.LshDiskIndex.compact(spark, lshDir, cur,
              "doc_id", "text", seq)
          if (graft.text.Bm25DiskIndex.tombstoneCount(spark, bm25Dir) * 10000L >
              ix.compactTombstoneBp * nCurated)
            graft.text.Bm25DiskIndex.compact(spark, bm25Dir, cur,
              "doc_id", "text", seq)
          ix.phash.foreach { ph =>
            if (graft.dedup.PhashDiskIndex.tombstoneCount(spark, phDir) * 10000L >
                ix.compactTombstoneBp * nCurated)
              graft.dedup.PhashDiskIndex.compact(spark, phDir, ph(cur),
                "doc_id", "phash", seq)
          }
          ix.audio.foreach { au =>
            if (graft.dedup.PhashDiskIndex.tombstoneCount(spark, audioDir) * 10000L >
                ix.compactTombstoneBp * nCurated)
              graft.dedup.PhashDiskIndex.compact(spark, audioDir, au(cur),
                "doc_id", "fp", seq)
          }
          ix.clip.foreach { cf =>
            if (graft.dedup.PhashDiskIndex.tombstoneCount(spark, clipDir) * 10000L >
                ix.compactTombstoneBp * nCurated)
              graft.dedup.PhashDiskIndex.compact(spark, clipDir,
                packFid(ix.clipFrameShift)(cf(cur)), "fid", "phash", seq)
          }
          // vector compaction lands beside (it reads the index it
          // rewrites) and swaps the pointer — old version stays
          // probe-able throughout
          ix.embed.foreach { _ =>
            graft.ann.IvfIndex.currentVersion(spark, ivfRoot).foreach { ver =>
              val newVer = s"v${date}c"
              if (ver != newVer &&
                  graft.ann.IvfIndex.tombstoneCount(spark, s"$ivfRoot/$ver") * 10000L >
                    ix.compactTombstoneBp * nCurated) {
                graft.ann.IvfIndex.compact(spark, s"$ivfRoot/$ver",
                  s"$ivfRoot/$newVer", seq)
                graft.ann.IvfIndex.setCurrentVersion(spark, ivfRoot, newVer)
              }
            }
          }
          // compressed-tier compaction: live code rows fold into a new
          // version beside the standing one (no re-encode), ptr swaps
          ix.pq.foreach { _ =>
            graft.ann.IvfIndex.currentVersion(spark, pqRoot).foreach { ver =>
              val newVer = s"v${date}c"
              if (ver != newVer &&
                  graft.ann.IvfPqIndex.tombstoneCount(spark, s"$pqRoot/$ver") * 10000L >
                    ix.compactTombstoneBp * nCurated) {
                graft.ann.IvfPqIndex.compact(spark, s"$pqRoot/$ver",
                  s"$pqRoot/$newVer", seq)
                graft.ann.IvfIndex.setCurrentVersion(spark, pqRoot, newVer)
              }
            }
          }
        }
        val n = newDocs.count()
        Lake.writeParquet(
          spark.range(1).select(lit(date).as("date"), lit(n).as("n_docs")),
          appliedMark)
        ((), n)
      }
    }
    // 6. IVF drift check: when a vector index family is registered
    // under index/ivf, audit the day's token drift (delta vs previous
    // snapshot — the q84 KL shape) and refresh the current version's
    // centroids past the threshold. The refresh reads only the index's
    // own persisted vectors and lands date-versioned; the pointer
    // swaps after, so the old version stays probe-able throughout.
    val (klMilli, ivfRefreshed) = (effIndexes, prev,
        graft.ann.IvfIndex.currentVersion(spark, ivfRoot)) match {
      case (Some(ix), Some(p), Some(ver)) =>
        meta.time("ivf_refresh") {
          val prevSnap = Lake.readParquet(spark, snapshotPath(lakeRoot, p))
          val deltaDocs = deltaIdsOpt
            .fold(snapshot)(ids => snapshot.join(ids, Seq("doc_id"), "left_semi"))
          val klRow = graft.text.CorpusStats
            .tokenKlDivergence(deltaDocs, prevSnap, "text")
            .select(col("kl_milli")).collect()(0)
          val kl = if (klRow.isNullAt(0)) 0L else klRow.getLong(0)
          val newVer = s"v$date"
          val doRefresh = kl > ix.ivfRefreshKlMilli && ver != newVer
          if (doRefresh) {
            graft.ann.IvfIndex.refresh(spark, s"$ivfRoot/$ver",
              s"$ivfRoot/$newVer", ix.ivfRefreshIters)
            graft.ann.IvfIndex.setCurrentVersion(spark, ivfRoot, newVer)
          }
          // the compressed tier refreshes on the same drift signal;
          // its retrain needs the fp32 vectors (codes can't retrain
          // themselves), so the day's curated corpus re-embeds
          (ix.pq, ix.embed,
              graft.ann.IvfIndex.currentVersion(spark, pqRoot)) match {
            case (Some(_), Some(embed), Some(pver))
                if kl > ix.ivfRefreshKlMilli && pver != newVer =>
              val cur = Lake.readParquet(spark, curatedPath(lakeRoot, date))
              graft.ann.IvfPqIndex.refresh(spark, s"$pqRoot/$pver",
                embed(cur), "doc_id", "embedding", s"$pqRoot/$newVer",
                ix.ivfRefreshIters, seq)
              graft.ann.IvfIndex.setCurrentVersion(spark, pqRoot, newVer)
            case _ => ()
          }
          ((kl, doRefresh), kl)
        }
      case _ => (-1L, false)
    }
    // 7. persisted-tokenizer maintenance: fold the curated delta into
    // the additive count state (changed/removed docs retire their old
    // counts — negative increments keep the folded state == a
    // from-scratch tokenize of today's corpus), and past the KL-drift
    // threshold re-learn and land a NEW artifact version before the
    // pointer swaps. The `_applied` marker makes a clean re-run a
    // no-op, and the seq stamp on the count increments closes the
    // crash window between appendCounts and the marker: a replayed
    // day's identical batch folds once, never twice.
    val tokenizerRefreshed = tokenizer.fold(false) { tc =>
      meta.time("tokenizer") {
        val tokRoot = s"$lakeRoot/tokenizer"
        val mark = s"$tokRoot/_applied/date=$date"
        var refreshed = false
        if (!Lake.exists(spark, mark)) {
          val curC = Lake.readParquet(spark, curatedPath(lakeRoot, date))
          (prev, graft.text.TokenizerStore.currentVersion(spark, tokRoot)) match {
            case (Some(p), Some(_)) =>
              val prevC = Lake.readParquet(spark, curatedPath(lakeRoot, p))
              // delta identity is (doc_id, text): a changed doc appears
              // on BOTH sides — old counts out, new counts in
              val plus = curC.join(prevC.select(col("doc_id"), col("text")),
                Seq("doc_id", "text"), "left_anti")
              val minus = prevC.join(curC.select(col("doc_id"), col("text")),
                Seq("doc_id", "text"), "left_anti")
              // seq-stamped: a crash after this append but before the
              // `_applied` marker re-runs the day, and the replayed
              // identical batch folds ONCE (TokenizerStore.foldedCounts
              // keeps one copy per (cseq, word))
              graft.text.TokenizerStore.appendCounts(
                graft.text.Bpe.wordCounts(plus, "text").unionByName(
                  graft.text.Bpe.wordCounts(minus, "text")
                    .select(col("word"), (-col("freq")).as("freq"))),
                tokRoot, seq = Some(seq))
              val klRow = graft.text.CorpusStats
                .tokenKlDivergence(plus, prevC, "text")
                .select(col("kl_milli")).collect()(0)
              val kl = if (klRow.isNullAt(0)) 0L else klRow.getLong(0)
              if (kl > tc.refreshKlMilli) {
                graft.text.TokenizerStore.refresh(spark, tokRoot, s"v$date",
                  tc.numMerges)
                graft.text.TokenizerStore.setCurrentVersion(spark, tokRoot,
                  s"v$date")
                refreshed = true
              }
            case _ =>
              // first run or unregistered store: state = today's corpus
              graft.text.TokenizerStore.appendCounts(
                graft.text.Bpe.wordCounts(curC, "text"), tokRoot,
                seq = Some(seq))
              graft.text.TokenizerStore.refresh(spark, tokRoot, s"v$date",
                tc.numMerges)
              graft.text.TokenizerStore.setCurrentVersion(spark, tokRoot,
                s"v$date")
              refreshed = true
          }
          Lake.writeParquet(
            spark.range(1).select(lit(date).as("date")), mark)
        }
        (refreshed, if (refreshed) 1L else 0L)
      }
    }

    // 8. optional training-shard export of the day's corpus: the full
    // curate -> pack -> shard+manifest path in one daily entry point
    val nShards = shards.fold(-1L) { sc =>
      meta.time("shards") {
        val curC = Lake.readParquet(spark, curatedPath(lakeRoot, date))
        // token accounting matches what a training run consumes: under
        // a maintained tokenizer (stage 7 guarantees a current version
        // by this point) the shard token counts are the SERVED
        // artifact's subword counts; without one, the whitespace proxy
        val withTokens = tokenizer match {
          case Some(_) =>
            curC.select(col("doc_id"), col("text"))
              .join(graft.text.TokenizerStore.encode(
                  curC, "doc_id", "text", s"$lakeRoot/tokenizer")
                .select(col("id").as("doc_id"), col("n_sub").as("n_tokens")),
                Seq("doc_id"))
          case None =>
            curC.select(col("doc_id"), col("text"),
              graft.text.TextFunctions.tokenCount(col("text")).cast("long")
                .as("n_tokens"))
        }
        val m = graft.ops.ShardExport.writeShards(withTokens, "doc_id", "n_tokens",
          sc.binTokens, sc.numBuckets, s"$lakeRoot/shards/date=$date")
        val n = m.count()
        (n, n)
      }
    }
    graft.ops.CacheScope.releaseAll(spark) // curation persists its core frames
    RunMetadata.write(spark, lakeRoot, date, meta.snapshot)
    DailyResult(date, nSnapshot, nCurated, incremental = prev.isDefined,
      shardCount = nShards, klMilli = klMilli, ivfRefreshed = ivfRefreshed,
      tokenizerRefreshed = tokenizerRefreshed, pairedDropped = pairedDropped,
      clipDropped = clipDropped, robotsDropped = nRobotsDropped)
  }
}
