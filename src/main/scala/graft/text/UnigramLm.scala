package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece-style alternative to
  * [[Bpe]]; Kudo 2018) in its deterministic hard-EM (Viterbi-EM)
  * variant: seed a candidate vocabulary from corpus substrings, score
  * pieces by log-likelihood, segment every word TYPE to its maximum-
  * likelihood piece sequence (Viterbi), re-count piece usage from those
  * segmentations, prune to the target vocabulary, and re-segment under
  * the final scores. Where BPE grows its vocabulary bottom-up by merge,
  * unigram-LM shrinks a rich seed top-down by usage — the two standard
  * subword learners over the same word-type frame.
  *
  * Determinism contract (the engine's cross-engine discipline): piece
  * scores are ⌊1000·ln(ratio of exact integers)⌋ (integer milli
  * log-probs — the CorpusStats floor-of-log discipline); the Viterbi
  * objective orders candidates by (total score DESC, piece count ASC,
  * segmentation string ASC), a total order, so the learned vocabulary
  * and every segmentation replay bit-identically in DuckDB SQL
  * (q121/q122's recursive-CTE oracle). Seed and prune cuts break count
  * ties on the piece string ascending.
  *
  * Scale shape: everything runs on the WORD-TYPE frame ([[Bpe]]'s
  * discipline — one corpus tokenize, then all work is |vocab|-sized).
  * Seed candidate generation is a bounded substring explode (word
  * length × maxPieceLen per type); the seed/prune cuts are TakeOrdered
  * (bounded by the requested sizes); Viterbi runs as a fused
  * mapPartitions kernel against the BROADCAST score map (the
  * [[graft.ann.Ann.ivfAssign]] justification: a tokenizer vocabulary
  * is memory-resident by design, and the per-word DP is genuinely
  * non-relational). Unlike BPE's sequential merge picks, hard-EM needs
  * a FIXED number of corpus-independent passes — two Viterbi rounds
  * total — so there is no driver-loop scaling caveat at all. */
object UnigramLm {

  /** Learning sizes: candidate pieces are 1..`maxPieceLen` chars; the
    * seed keeps all single characters plus the `seedMulti` most
    * frequent longer substrings; the final vocabulary keeps all single
    * characters plus the `vocabMulti` most used longer pieces. */
  final case class Config(maxPieceLen: Int = 5, seedMulti: Int = 200,
      vocabMulti: Int = 120) {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2: $maxPieceLen")
    require(seedMulti >= 1 && vocabMulti >= 1,
      s"seed/vocab sizes must be >= 1: $seedMulti/$vocabMulti")
  }

  /** Corpus-weighted counts of every substring of length
    * 1..maxPieceLen of every word type — the seed candidate pool.
    * Bounded: ≤ len·maxPieceLen pieces per word type. */
  def seedCounts(counts: DataFrame, maxPieceLen: Int): DataFrame =
    counts.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + 1)),
          j => col("word").substr(i, j))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("c"))

  /** The kept seed: all single-character pieces (coverage — every word
    * stays segmentable) plus the top `seedMulti` longer pieces by
    * (count DESC, piece ASC). The cut is TakeOrdered — no full sort. */
  def seedVocab(seed: DataFrame, seedMulti: Int): DataFrame =
    seed.where(length(col("piece")) === 1).unionByName(
      seed.where(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece").asc).limit(seedMulti))

  /** Integer milli log-prob scores over a (piece, c) frame:
    * s = ⌊1000·ln(c / Σc)⌋ — one floor of one log of a ratio of exact
    * integers (cross-engine safe), totals via the single-row
    * crossJoin(broadcast) discipline. */
  def scoreSeed(vocab: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(vocab.agg(sum(col("c")).as("t"))))
      .select(col("piece"),
        floor(lit(1000.0) * log(col("c").cast("double") / col("t")))
          .cast("long").as("s"))

  /** Maximum-likelihood segmentation of every word type under a piece
    * score map — the Viterbi E-step, as a fused kernel over the
    * broadcast (piece → milli score) map. DP left-to-right; at each
    * position the best reachable state under the total order
    * (accumulated NEGATIVE score ASC, piece count ASC, segmentation
    * ASC — segmentations compared as their U+001F·2-joined strings,
    * which at equal (pos, count) have equal length, so string order is
    * piece-sequence order). A word containing a character absent from
    * the vocabulary surfaces with a NULL seg (kept, not dropped) —
    * impossible when encoding the training corpus itself, possible on
    * new text against a foreign vocabulary.
    * Output: (word, freq, seg, n_pieces, score_milli). */
  /** Lexicographic compare in UTF-8 BYTE order — the collation Spark's
    * orderBy (UTF8String) and the DuckDB oracle both use. Java's
    * String.compareTo compares UTF-16 code units, which orders
    * supplementary characters (surrogate pairs, 0xD800+ units) BELOW
    * U+E000..U+FFFF — the opposite of their byte order. For THIS
    * tie-break the two collations happen to agree (tied segmentations
    * are one word with U+001F delimiters at different cuts, so the
    * first difference is always delimiter-vs-word-char and U+001F is
    * below either way), but the kernel compares the way the engines
    * collate so the invariant is structural, not an artifact of the
    * delimiter choice. Only reached on exact (score, count) ties. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  def viterbiSegments(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    val m: Map[String, Long] = vocab.select(col("piece"), col("s").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // empty vocab (an EMPTY corpus has no substrings) degrades to the
    // no-word-coverable case per word — and an empty corpus has no
    // words either, so the result is the empty frame the
    // empty-input contract requires (EdgeCasesSpec discipline)
    val bc = spark.sparkContext.broadcast(m)
    val src = words.select(col("word"), col("freq"))
    val outSchema = src.schema
      .add("seg", org.apache.spark.sql.types.StringType)
      .add("n_pieces", org.apache.spark.sql.types.LongType)
      .add("score_milli", org.apache.spark.sql.types.LongType)
    val dd = Bpe.D + Bpe.D
    src.mapPartitions { it =>
      val mm = bc.value
      it.map { r =>
        val w = r.getString(0)
        val L = w.length
        val ns = new Array[Long](L + 1)
        val np = new Array[Long](L + 1)
        val seg = new Array[String](L + 1)
        val reach = new Array[Boolean](L + 1)
        reach(0) = true; seg(0) = ""
        var pos = 1
        while (pos <= L) {
          var bNs = 0L; var bNp = 0L; var bSeg: String = null; var found = false
          val jm = math.min(maxPieceLen, pos)
          var j = 1
          while (j <= jm) {
            val start = pos - j
            if (reach(start)) {
              val piece = w.substring(start, pos)
              val sc = mm.getOrElse(piece, Long.MinValue)
              if (sc != Long.MinValue) {
                val cNs = ns(start) - sc
                val cNp = np(start) + 1
                val cSeg = if (np(start) == 0L) piece else seg(start) + dd + piece
                val better = !found || cNs < bNs || (cNs == bNs &&
                  (cNp < bNp || (cNp == bNp && utf8Compare(cSeg, bSeg) < 0)))
                if (better) { bNs = cNs; bNp = cNp; bSeg = cSeg; found = true }
              }
            }
            j += 1
          }
          reach(pos) = found
          if (found) { ns(pos) = bNs; np(pos) = bNp; seg(pos) = bSeg }
          pos += 1
        }
        if (reach(L))
          org.apache.spark.sql.Row(r.get(0), r.get(1), seg(L), np(L), -ns(L))
        else org.apache.spark.sql.Row(r.get(0), r.get(1), null, 0L, null)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema)).toDF()
  }

  /** Piece usage counts from a segmentation frame, corpus-weighted —
    * the M-step. */
  def usageCounts(segs: DataFrame): DataFrame =
    segs.where(col("seg").isNotNull)
      .select(col("freq"),
        explode(split(col("seg"), java.util.regex.Pattern.quote(Bpe.D + Bpe.D)))
          .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("u"))

  /** Learn the vocabulary from a (word, freq) counts frame (feed
    * [[Bpe.wordCounts]] / [[Bpe.mergeWordCounts]]-folded increments —
    * the same additive incremental path as BPE). Returns:
    *  - vocab:    (piece, usage, score_milli) — all single chars plus
    *              the `vocabMulti` most-used longer pieces; scores are
    *              add-1-smoothed over the kept set,
    *              ⌊1000·ln((u+1)/(Σu+V))⌋, so zero-usage characters
    *              stay scoreable;
    *  - segments: (word, freq, seg, n_pieces, score_milli) — the final
    *              Viterbi segmentation under the final scores; `seg`
    *              is U+001F·2-joined, directly consumable by
    *              [[Bpe.encode]]. */
  def learnFromCounts(counts: DataFrame, cfg: Config = Config())
      : (DataFrame, DataFrame) = {
    val cnt = graft.ops.CacheScope.persist(counts)
    val seed = graft.ops.CacheScope.persist(
      seedVocab(seedCounts(cnt, cfg.maxPieceLen), cfg.seedMulti))
    val seg1 = viterbiSegments(cnt, scoreSeed(seed), cfg.maxPieceLen)
    val usage = usageCounts(seg1)
    val kept = seed.where(length(col("piece")) === 1).select(col("piece"))
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u"), lit(0L)).as("u"))
      .unionByName(usage.where(length(col("piece")) > 1)
        .orderBy(col("u").desc, col("piece").asc).limit(cfg.vocabMulti))
    val vocab = graft.ops.CacheScope.persist(
      kept.crossJoin(broadcast(
          kept.agg(sum(col("u")).as("tu"), count(lit(1)).as("v"))))
        .select(col("piece"), col("u").as("usage"),
          floor(lit(1000.0) * log((col("u") + 1).cast("double") / (col("tu") + col("v"))))
            .cast("long").as("score_milli")))
    val segments = viterbiSegments(cnt,
      vocab.select(col("piece"), col("score_milli").as("s")), cfg.maxPieceLen)
    (vocab, segments)
  }

  /** [[learnFromCounts]] from raw documents. */
  def learn(docs: DataFrame, textCol: String, cfg: Config = Config())
      : (DataFrame, DataFrame) =
    learnFromCounts(Bpe.wordCounts(docs, textCol), cfg)

  /** Encode NEW text under a learned vocabulary — the deployment path.
    * [[Bpe.encode]] with the training segmentation frame covers
    * training words only (unseen words char-fall-back, which is exact
    * for BPE but merely safe for unigram-LM); here every word TYPE of
    * the new corpus runs its own Viterbi pass under the standing
    * scores, so unseen words segment by maximum likelihood like
    * everything else. Words containing characters outside the
    * vocabulary still char-fall-back (their seg is NULL and
    * [[Bpe.encode]]'s coalesce takes over) — the shared
    * every-document-surfaces contract holds. Cost: one word-type
    * tokenize of the new corpus + the broadcast-map kernel — no
    * relearn, no corpus reshuffle beyond its own doc grouping. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, cfg: Config = Config()): DataFrame = {
    val segs = viterbiSegments(Bpe.wordCounts(docs, textCol),
      vocab.select(col("piece"), col("score_milli").as("s")), cfg.maxPieceLen)
    Bpe.encode(docs, idCol, textCol, segs.where(col("seg").isNotNull))
  }
}
