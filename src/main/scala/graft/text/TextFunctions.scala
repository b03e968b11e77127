package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID, fingerprinting.
  *
  * Everything is built from higher-order Catalyst expressions (transform/
  * filter/aggregate) — per-row, shuffle-free, codegen-compatible — so a
  * 100 TB corpus pays exactly one scan and no exchange for the whole
  * feature set.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed, lowercased text; empty tokens from
    * repeated spaces are dropped (split-on-single-space + filter is
    * deliberately regex-free so external oracles can reproduce it). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** k-word shingles ("n-gram" units for dedup fingerprints). Fewer than
    * k tokens → single shingle of the whole text; no tokens → NO
    * shingles (not a single empty shingle: two blank documents must not
    * pair with Jaccard 1.0 — the SQL oracle's empty shingle set yields
    * NULL and never emits the pair). Runs as the fused codegen
    * [[graft.functions.WordShingles]] expression — one loop joining
    * UTF8 windows, which also evaluates its input exactly once (the HOF
    * form re-evaluated a non-materialized `ts` per window position:
    * O(n²) per row, an observed 100× slowdown before staging). The HOF
    * reference form below backs the parity spec. */
  def wordShinglesFrom(ts: Column, k: Int): Column =
    graft.functions.WordShingles.wordShingles(ts, k)

  /** The higher-order-function reference formulation (interpreted; see
    * the PERF history above — pass a materialized tokens column).
    * WordShinglesSpec asserts string parity with the fused expression. */
  def wordShinglesFromHof(ts: Column, k: Int): Column =
    when(size(ts) >= k,
      transform(sequence(lit(1), size(ts) - lit(k - 1)),
        i => concat_ws(" ", slice(ts, i, lit(k)))))
      .when(size(ts) > 0, array(concat_ws(" ", ts)))
      .otherwise(array().cast("array<string>"))

  /** Convenience form for small inputs / tests; see the PERF note above. */
  def wordShingles(text: Column, k: Int): Column =
    wordShinglesFrom(tokens(text), k)

  /** Fixed-size token windows with stride — the chunking step that turns
    * documents into training examples (context-window packing). Windows
    * start at 1, 1+stride, 2·stride+1, … while a full-or-partial tail
    * remains: every token lands in ≥1 chunk (stride ≤ size ⇒ overlapping
    * windows; stride = size ⇒ a partition), the final chunk may be short,
    * and an empty document yields no chunks. Per-row, shuffle-free;
    * consumers posexplode into (chunk_id, chunk) rows. Pass a
    * *materialized* tokens column (see the wordShinglesFrom PERF note). */
  def tokenChunksFrom(ts: Column, size0: Int, stride: Int): Column = {
    require(size0 >= 1 && stride >= 1 && stride <= size0,
      s"need 1 <= stride <= size, got size=$size0 stride=$stride")
    when(size(ts) > 0,
      transform(
        // window starts: 1, 1+stride, ... up to the last position that
        // begins a non-redundant window (start ≤ n − size + stride keeps
        // exactly the windows whose tokens aren't fully covered earlier)
        sequence(lit(1),
          greatest(size(ts) - lit(size0 - stride), lit(1)), lit(stride)),
        i => concat_ws(" ", slice(ts, i, lit(size0)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Duplicate-k-gram fraction (Gopher-style repetition filter) in
    * floor-scaled basis points, from a *materialized* shingles column —
    * 10000·(1 − distinct/total). floor over small rationals avoids the
    * cross-engine round-half knife edge (see q26). */
  def repetitionBpFrom(shingles: Column): Column =
    when(size(shingles) > 0,
      floor((size(shingles) - size(array_distinct(shingles))) * lit(10000.0) /
        size(shingles)).cast("long"))
      .otherwise(0L)

  /** A small English stopword list (quality scoring + language markers). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")

  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      size(filter(ts, t => t.isin(EnglishStopwords: _*))).cast("double") / size(ts))
      .otherwise(0.0)
  }

  /** Syllables of one word by the standard heuristic: maximal vowel
    * groups ([aeiouy]+), floored at 1 — exact on both engines (the
    * pattern is RE2-trivial). */
  def syllableCount(word: Column): Column =
    greatest(lit(1L), regexp_count(word, lit("[aeiouy]+")).cast("long"))

  /** Sentences as maximal terminal-punctuation runs ([.!?]+), floored
    * at 1 so ratio denominators stay alive on unpunctuated text. */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L),
      regexp_count(coalesce(text, lit("")), lit("[.!?]+")).cast("long"))

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
        .cast("double") / length(text))
      .otherwise(0.0)

  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
      .otherwise(0.0)
  }

  /** The floor-scaled integer quality score (millis) from a
    * *materialized* tokens column — ONE shared definition for the
    * curation gate and the q26 stats query (two drifting copies of the
    * weights would silently desynchronize the gates): capped length term
    * (8/tok to 400) + lexical diversity (300·distinct/n) + capped word
    * shape (avg len / 8 scaled to 300). Integer output avoids the
    * round-half knife edge (see qualityScore's double form below, kept
    * for tests). */
  def qualityMilliFrom(ts: Column): Column = {
    val n = size(ts)
    val d = size(array_distinct(ts))
    val sumLen = aggregate(ts, lit(0L), (acc, t) => acc + length(t))
    when(n > 0,
      least(n.cast("long") * 8, lit(400L)) +
        floor(d * lit(300.0) / n).cast("long") +
        least(floor(sumLen * lit(75.0) / (n * 2)).cast("long"), lit(300L)))
      .otherwise(0L)
  }

  /** Deterministic document quality score in [0,1]: rewards reasonable
    * length, lexical diversity, and word shape — the
    * length/stopword/punctuation heuristics of C4/Gopher-style filters
    * collapsed into one arithmetic expression. */
  def qualityScore(text: Column): Column = {
    val ts = tokens(text)
    val n = size(ts)
    val diversity = when(n > 0, size(array_distinct(ts)).cast("double") / n).otherwise(0.0)
    val lengthTerm = least(n.cast("double") / 50.0, lit(1.0))
    val shapeTerm = least(avgTokenLen(text) / 8.0, lit(1.0))
    lengthTerm * 0.4 + diversity * 0.3 + shapeTerm * 0.3
  }

  /** GPT-2-style pretokenizer approximation: contractions, space-prefixed
    * letter runs, digit runs, punctuation runs. Counts the units a BPE
    * tokenizer would start from — a fast corpus-costing proxy when the
    * real tokenizer isn't on the cluster. Pattern stays within the
    * RE2-compatible subset so external engines reproduce the counts. */
  val BpeishPattern: String =
    "'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Marker lexicons for the n-gram/stopword language-ID heuristic.
    * Order is the deterministic tie-break (first max wins). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "los", "las", "una", "es", "y", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "在", "不", "有", "人"))

  /** Marker-hit count from a *materialized* tokens column — one filter
    * pass. See the wordShinglesFrom PERF note: handing this the raw
    * tokenization expression re-runs split/lower/trim per reference. */
  def langScoreFrom(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreFrom(tokens(text), markers)

  /** Argmax over *materialized* per-language score columns with
    * deterministic tie-break; no hits at all → "und". The when-chain
    * references each score ~3× (greatest + branch), so the scores MUST be
    * cheap attributes, not filter expressions — stage them through a
    * select first (q27 does; the convenience langId below re-derives
    * everything per row and is for tests/small inputs only). */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val top = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(top === 0, "und")) { case (acc, (lang, s)) =>
      acc.when(s === top, lang)
    }.otherwise("und")
  }

  /** Convenience single-expression form (re-evaluates tokenization ~11×
    * per row — tests/small inputs only; the staged path is
    * tokens → langScoreFrom columns → langIdFromScores). */
  def langId(text: Column): Column =
    langIdFromScores(LangMarkers.map { case (lang, markers) =>
      lang -> langScoreFrom(tokens(text), markers)
    })

  /** Blocklist hit count — the C4-style term-list screening stage
    * (cf. the "List of Dirty, Naughty, Obscene..." filter every
    * web-corpus pipeline runs): how many of the document's token
    * INSTANCES match the list. Exact token equality after the standard
    * tokenization — no substring surprises ('class' never trips a
    * 4-letter entry). Entirely expression-level: the list rides the
    * plan as an array literal (no join, no shuffle, codegen'd); at
    * realistic list sizes (hundreds to a few thousand terms) the
    * per-token membership scan is cheap, and a list too large to
    * inline falls back to the same semantics via a broadcast left-semi
    * join on exploded tokens. Terms are lowercased to match the
    * tokenizer's casefold. */
  def blocklistHitsFrom(ts: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "blocklistHitsFrom: empty term list")
    val termArr = array(terms.map(_.toLowerCase).distinct.map(lit): _*)
    size(filter(ts, t => array_contains(termArr, t)))
  }

  /** 40-bit rolling polynomial fingerprint of the space-stripped text.
    * The modulus keeps `acc*31 + c` far from Long overflow, so the exact
    * arithmetic is reproducible in any BIGINT engine (overflow-free). */
  val FingerprintMod: Long = 1L << 40

  /** Rolling 31-ary polynomial hash of a string column modulo `mod` —
    * the [[fingerprint]] arithmetic over an arbitrary string input.
    * Overflow-free for mod ≤ 2^48 (acc·31 + c < 2^53) and therefore
    * bit-reproducible in any BIGINT engine: this is what lets the
    * MinHash/SimHash/sketch gate queries carry full DuckDB oracles
    * (xxhash64 has no cross-engine equivalent). DuckDB form:
    * list_reduce(list_prepend(0, list_transform(string_split(s, ''),
    * ascii)), (acc, c) -> (acc * 31 + c) % mod). Runs as the codegen'd
    * [[graft.functions.PolyHash]] expression — one fused code-point loop;
    * the interpreted HOF form below is kept as the parity reference.
    * A deployment that doesn't need cross-engine verification can swap
    * xxhash64 back in (only bucket assignment changes, not semantics). */
  def polyHash(s: Column, mod: Long): Column =
    graft.functions.PolyHash.polyHash(s, mod)

  /** The higher-order-function reference formulation (interpreted;
    * allocates one single-char string per input char). PolyHashSpec
    * asserts bit parity with the fused expression. */
  def polyHashHof(s: Column, mod: Long): Column = {
    require(mod <= (1L << 48), s"polyHash mod $mod risks Long overflow")
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % mod)
  }

  /** The fingerprint's normalization (lowercase, trim, strip spaces) —
    * shared so identity schemes built on (fingerprint, length) measure
    * the SAME string the hash folds; a drifted copy would silently
    * desynchronize the two halves of the identity. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), " ", "")

  def normalizedLength(text: Column): Column = length(normalized(text))

  def fingerprint(text: Column): Column =
    polyHash(normalized(text), FingerprintMod)
}
