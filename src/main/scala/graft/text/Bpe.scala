package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword vocabulary learning — the real
  * tokenize-for-training step above CorpusStats.encodeTopV's word-level
  * ids (Sennrich et al. 2016, learned on word TYPES): start from
  * per-character segmentations, repeatedly count adjacent symbol pairs
  * across the corpus (weighted by word frequency) and merge the most
  * frequent pair, greedily left-to-right and non-overlapping within
  * each word. No end-of-word marker (the within-word variant — merges
  * never cross word boundaries because segmentation is per word type).
  *
  * Determinism contract (the engine's cross-engine discipline): pair
  * counts are exact integers; the merge pick breaks ties on (count
  * DESC, left ASC, right ASC) in binary string order, so the learned
  * merge table replays bit-identically in DuckDB SQL (q112/q113).
  *
  * REPRESENTATION is what makes the merge step engine-portable: a
  * word's segmentation is its symbols joined by a double U+001F
  * delimiter ("ab","c" → "ab␟␟c"). One merge of (l, r) is then a plain
  * non-overlapping left-to-right string replace of "␟l␟␟r␟" with
  * "␟lr␟" on the "␟"-wrapped segmentation — full delimiters on both
  * sides of both symbols mean a partial-symbol match is impossible,
  * and the wrap-strip keeps runs correct ("a a a a" merges to
  * "aa aa", not "aa a a": each match consumes its trailing delimiter,
  * and the next match re-anchors on the leading one). `replace` has
  * identical scan-left semantics in Spark (UTF8String.replace) and
  * DuckDB, so both engines rewrite segmentations identically — no
  * lookbehind regex (which RE2/DuckDB lacks) needed. U+001F never
  * appears in whitespace-tokenized text.
  *
  * Scale shape: learning runs over the WORD-TYPE frame (one groupBy of
  * the corpus, then all iterations touch only |vocab| rows — the
  * standard BPE trick; a 100 TB corpus has millions of word types, not
  * trillions). Each of the `numMerges` iterations is one bounded
  * pair-count aggregation + a ONE-ROW driver collect (the argmax pair)
  * + one narrow projection; the segmentation frame re-persists per
  * iteration (CacheScope) so lineage doesn't re-run prior rewrites.
  * Encoding never re-applies merges: the final segmentation frame IS
  * the word→subwords table, broadcast-joined to token instances. */
object Bpe {

  /** Symbol delimiter — U+001F (unit separator): cannot occur in
    * whitespace-tokenized text, printable-safe in parquet/SQL. */
  val D = "\u001f"
  private val DD = D + D

  /** One learned merge: rank (1-based learning order), the pair, and
    * its corpus-weighted adjacency count at pick time. */
  final case class Merge(rank: Int, l: String, r: String, count: Long)

  /** Word-type frequencies of a corpus — the ADDITIVE carried state
    * behind incremental vocabulary refresh: learning sees nothing but
    * these counts, and counts over disjoint document sets add
    * ([[mergeWordCounts]]), so "re-learn after a daily delta" tokenizes
    * only the delta and re-runs the cheap |vocab|-sized iterations —
    * EXACTLY equal to learning on the union (BpeSpec pins it; contrast
    * the span/BM25 indexes, whose carried state feeds a re-threshold
    * rather than a re-learn). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Merge word-count increments over disjoint document sets —
    * associative; fold any number of daily deltas. */
  def mergeWordCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word"))
      .agg(sum(col("freq")).as("freq"))

  /** The word-type frame (word, freq, seg) at character-level
    * segmentation — learning's iteration state zero. */
  private def initialSegments(counts: DataFrame): DataFrame =
    counts.select(col("word"), col("freq"),
      array_join(split(col("word"), ""), DD).as("seg"))

  /** Adjacent-pair counts of a segmentation frame, corpus-weighted. */
  private def pairCounts(seg: DataFrame): DataFrame = {
    val sym = split(col("seg"), DD)
    seg.select(col("freq"), sym.as("sym"))
      .where(size(col("sym")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("l"),
          element_at(col("sym"), i + 1).as("r")))).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("freq")).as("c"))
  }

  /** One merge's replace node on an already-D-wrapped segmentation
    * column. The D-wrap/unwrap is hoisted OUT to [[applyMerges]]: each
    * replace preserves the leading/trailing delimiter, so a k-merge
    * batch chains k replace nodes LINEARLY on one wrapped expression.
    * (Wrapping per merge would reference the accumulated expression
    * twice per step — substr target + length — i.e. a 2^k node tree;
    * a 32-merge batch then stringifies to a 2 GiB plan and OOMs.) */
  private def mergeReplace(wrapped: org.apache.spark.sql.Column,
      l: String, r: String) =
    replace(wrapped, lit(D + l + DD + r + D), lit(D + l + r + D))

  /** Apply a symbol-disjoint batch of merges to a segmentation column:
    * wrap once, chain one replace per merge (they commute — accepted
    * pairs share no symbols), strip once. Expression size is O(batch),
    * pinned by BpeSpec's node-count regression test. */
  private[text] def applyMerges(seg: org.apache.spark.sql.Column,
      batch: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val wrapped = concat(lit(D), seg, lit(D))
    val replaced = batch.foldLeft(wrapped) { case (acc, (l, r)) =>
      mergeReplace(acc, l, r)
    }
    replaced.substr(lit(2), length(replaced) - 2)
  }

  /** Learn `numMerges` merges; returns the merge table in learning
    * order plus the final word→segmentation frame (word, freq, seg) —
    * the encode artifact. Stops early if the corpus runs out of
    * adjacent pairs (every word fully merged). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[Merge], DataFrame) =
    learnFromCounts(wordCounts(docs, textCol), numMerges)

  /** [[learn]] from a (word, freq) counts frame — the incremental
    * path: feed [[mergeWordCounts]]-folded daily counts and only the
    * newest delta ever tokenizes.
    *
    * Learning is BATCHED and EXACT: each round takes the longest
    * sorted prefix of the pair-count order that is provably the next
    * run of sequential argmax picks, applies it in one rewrite pass,
    * and releases the superseded segmentation frame — so a real 32k
    * vocabulary costs ~numMerges/batch driver round-trips and holds at
    * most two cached copies of the word-type frame, not numMerges of
    * each (the r05 scale caveat). Exactness argument (BpeSpec pins
    * batched ≡ one-at-a-time, including on adversarial tie corpora):
    * walking pairs in (count DESC, l ASC, r ASC) order, accept p_i iff
    *   (a) p_i shares no symbol with an earlier accepted pick — its
    *       own count is then untouched by their merges, and any pair
    *       ABOVE p_i in the order was accepted (else we stopped), so
    *       no unmerged old pair can outrank it; pairs that share a
    *       symbol with accepted picks only ever LOSE occurrences; and
    *   (b) count(p_i) STRICTLY exceeds every old count of every
    *       non-accepted pair adjacent to an accepted symbol — a pair
    *       CREATED by an accepted merge (x,l·r from x,l; l·r,y from
    *       r,y; l·r,l·r from r,l) inherits at most its parent's old
    *       count, so (b) guarantees no created pair can reach, let
    *       alone win, the tie-break against p_i.
    * The first pair always satisfies both (empty accepted set), so
    * every round advances and the worst case degrades to the
    * sequential loop, never past it. */
  def learnFromCounts(counts: DataFrame, numMerges: Int,
      maxBatch: Int = 32): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(maxBatch >= 1, s"maxBatch must be >= 1: $maxBatch")
    // Iteration state is LOCAL-CHECKPOINTED, not merely persisted:
    // chaining round n's plan over round n-1's cached frame nests an
    // AdaptiveSparkPlanExec inside every InMemoryRelation, and AQE's
    // plan string prints BOTH Current and Initial subtrees per level —
    // 2^depth bytes, so a ~30-round sequential learn OOMs the driver
    // just STRINGIFYING the plan for the SQL listener (the r06 abort).
    // localCheckpoint(eager) rebases each round on a LogicalRDD leaf:
    // plan depth stays constant however many rounds run — the standard
    // iterative-algorithm discipline (cf. GraphX/MLlib checkpointing).
    // Superseded rounds' blocks are dropped by the ContextCleaner when
    // the frame reference goes out of scope; the frames are word-TYPE
    // sized (the BPE trick), not corpus-sized. On a real cluster,
    // reliable `checkpoint()` is the fault-tolerant variant.
    var seg = initialSegments(counts).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(maxBatch, numMerges - merges.size)
      // ONE pair-count aggregation serves both bounded collects below
      val pc = graft.ops.CacheScope.persist(pairCounts(seg))
      // candidate prefix (K > want: stop-rule walks may reject some)
      val topK = pc.orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(want * 2 + 8).collect()
      if (topK.isEmpty) exhausted = true
      else {
        // per-symbol top-2 pair counts (with the top pair's identity),
        // restricted to candidate symbols — answers "best count among
        // pairs touching s, excluding a given pair" for rule (b)
        val candSyms = topK.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.toSeq
        val perSym = pc
          .select(explode(array(col("l"), col("r"))).as("s"),
            col("l"), col("r"), col("c"))
          .where(col("s").isin(candSyms: _*))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
              .orderBy(col("c").desc, col("l").asc, col("r").asc)))
          .where(col("rn") <= 3) // (l,l) pairs occupy two slots of one pair
          .collect()
          .groupBy(_.getString(0))
          .map { case (s, rows) =>
            s -> rows.sortBy(_.getAs[Int]("rn"))
              .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
          }
        def maxOther(s: String, notL: String, notR: String): Long =
          perSym.getOrElse(s, Array.empty[(String, String, Long)])
            .collectFirst { case (l, r, c) if l != notL || r != notR => c }
            .getOrElse(Long.MinValue)
        val used = scala.collection.mutable.Set.empty[String]
        var bound = Long.MinValue
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stop = false
        var i = 0
        while (!stop && i < topK.length && batch.size < want) {
          val (l, r, c) = (topK(i).getString(0), topK(i).getString(1), topK(i).getLong(2))
          if (used(l) || used(r)) stop = true          // rule (a)
          else if (batch.nonEmpty && c <= bound) stop = true // rule (b)
          else {
            batch += ((l, r, c))
            used += l; used += r
            bound = math.max(bound,
              math.max(maxOther(l, l, r), maxOther(r, l, r)))
            // a SELF-pair (l == l) collapses runs, creating pairs
            // ((ll,ll), (ll,l)) whose parent is the pick itself — rule
            // (b)'s parent bound can't see them, so the batch ends here
            if (l == r) stop = true
          }
          i += 1
        }
        pc.unpersist()
        batch.foreach { case (l, r, c) =>
          merges += Merge(merges.size + 1, l, r, c)
        }
        // one rewrite pass for the whole batch: accepted pairs are
        // symbol-disjoint, so chained replaces commute
        val newSegCol = applyMerges(col("seg"),
          batch.toSeq.map { case (l, r, _) => (l, r) })
        seg = seg.withColumn("seg", newSegCol).localCheckpoint(true)
      }
    }
    (merges.toSeq, seg)
  }

  /** [[learn]]'s merge table as a DataFrame gate surface:
    * (merge_rank, l_sym, r_sym, pair_count, merged). */
  def mergeTable(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (merges, _) = learn(docs, textCol, numMerges)
    val spark = docs.sparkSession
    import spark.implicits._
    merges.map(m => (m.rank, m.l, m.r, m.count, m.l + m.r))
      .toDF("merge_rank", "l_sym", "r_sym", "pair_count", "merged")
  }

  /** Encode a corpus with a learned segmentation frame: token
    * instances keep their positions, broadcast-join the word→seg
    * table (vocab-sized — the only join; the corpus never reshuffles
    * beyond its own doc grouping), and per-document subword streams
    * reassemble in token order. Every input document surfaces (empty
    * stream for empty/NULL text). Words absent from the segmentation
    * table cannot occur when encoding the training corpus itself; on
    * NEW text they fall back to their character segmentation — exactly
    * what BPE with zero applicable merges produces, and what a
    * fresh [[learn]] over the union would start from.
    * Output: (id, sub_str — space-joined subwords, n_sub). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      segments: DataFrame): DataFrame = {
    val inst = docs
      .select(col(idCol).as("id"),
        posexplode_outer(TextFunctions.tokens(col(textCol))))
      .withColumnRenamed("col", "word")
    val segTab = segments.select(col("word"),
      replace(col("seg"), lit(DD), lit(" ")).as("sub"))
    val enc = inst.join(broadcast(segTab), Seq("word"), "left")
      .select(col("id"), col("pos"),
        // fallback: character segmentation of an unseen word; NULL word
        // (posexplode_outer on an empty doc) stays NULL and drops out
        // of the aggregates below
        coalesce(col("sub"),
          array_join(split(col("word"), ""), " ")).as("sub"))
    enc.groupBy(col("id"))
      .agg(
        coalesce(array_join(array_sort(collect_list(
            struct(col("pos"), col("sub")))).getField("sub"), " "), lit(""))
          .as("sub_str"),
        coalesce(sum(when(col("sub").isNotNull,
            size(split(col("sub"), " ")).cast("long"))), lit(0L))
          .as("n_sub"))
  }
}
