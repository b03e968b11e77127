package graft.functions

import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible Bloom filter — the membership member of
  * the sketch family (HLL = distinct, MinHash = similarity, CMS =
  * frequency, histogram = quantiles, Bloom = membership). The 100 TB
  * use: broadcast the set-bit positions of a huge key set (eval-corpus
  * fingerprints, yesterday's doc ids) instead of the keys themselves —
  * M bits bound the broadcast regardless of set size, no false
  * negatives ever, false positives at the classical (1−e^{−Kn/M})^K
  * rate checked by BloomSpec.
  *
  * Registers are relational: the DISTINCT (bit) rows over K affine
  * transforms of the 31-bit key hash, taking the top log2(M) bits —
  * the same (a·h + b) mod 2^40 family as MinHash/CMS, so the whole
  * filter replays bit-for-bit in an external BIGINT engine. Filters
  * merge by UNION (DISTINCT) — set-bit rows are idempotent.
  *
  * Scale shape: explode is K rows per key, the distinct collapses to
  * ≤ M rows inside each map partition's partial aggregate, and the one
  * exchange carries ≤ M rows per partition regardless of key count.
  */
object Bloom {

  val K = 3
  val MBits = 4096 // 2^12
  private val Mod40 = 1L << 40
  /** bit = top log2(MBits) bits of the 40-bit affine hash (public so
    * the q65 oracle derives its divisor from the same constant). */
  val BitShift: Int = 40 - 12

  private lazy val params: Seq[(Long, Long)] =
    Dedup.hashParamsPublic(Cms.Depth + K).drop(Cms.Depth) // disjoint from CMS

  /** Set-bit positions for a key column: one (bit) row per set bit.
    * NULL keys carry no membership information and are skipped (the
    * HistSketch rule) — without the guard they would surface as a NULL
    * bit row that breaks driver-side Set[Long] collection. */
  def bits(df: DataFrame, keyCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val hashed = df.where(col(keyCol).isNotNull).repartition(parts)
      .select(TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 31).as("h"))
    val positions = array(params.map { case (a, b) =>
      shiftrightunsigned((lit(a) * col("h") + lit(b)) % Mod40, BitShift)
    }: _*)
    hashed.select(explode(positions).as("bit")).distinct()
  }

  /** Driver-side membership probe against collected set bits: true iff
    * every one of the key's K bits is set (no false negatives; false
    * positives at the classical rate). */
  def mightContain(setBits: Set[Long], key: String): Boolean = {
    val h = Cms.polyHashJvm(key, 1L << 31)
    params.forall { case (a, b) => setBits.contains(((a * h + b) % Mod40) >>> BitShift) }
  }
}
