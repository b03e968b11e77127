package graft.functions

import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible count-min sketch — the frequency member of
  * the sketch family (HLL = distinct count, MinHash = set similarity,
  * CMS = per-item counts). Answers "how often does this token appear in
  * the corpus" at 100 TB without materializing the vocabulary: the
  * registers are Depth×Width bounded counters, point estimates never
  * underestimate, and overestimates are bounded by εN with ε = e/Width
  * at probability 1−e^−Depth.
  *
  * The registers are a plain relational result — (row, bucket, cnt)
  * from a groupBy count over affine-transformed token hashes (the same
  * (a·h + b) mod 2^40 family the MinHash sketch uses, taking the TOP
  * log2(Width) bits so the multiply's diffusion reaches the bucket
  * index) — so the ENTIRE sketch is verifiable value-for-value by an
  * external BIGINT engine, like Hll.registers.
  *
  * Scale shape: no distinct, no UDAF — the codegen'd partial count
  * collapses duplicate (row, bucket) cells inside each map partition, so
  * the one exchange carries ≤ Depth·Width rows per partition regardless
  * of corpus size; register frames from shards/days merge by SUM (the
  * counters are linear), giving the same incremental-merge story as the
  * HLL and MinHash sketches.
  */
object Cms {

  val Depth = 4
  val Width = 256 // Depth*Width = 1024 register rows — bounded exchange
  private val Mod40 = 1L << 40
  /** bucket = top log2(Width) bits of the 40-bit affine hash. */
  val BucketShift: Int = 40 - 8

  private lazy val params: Seq[(Long, Long)] = Dedup.hashParamsPublic(Depth)

  /** CMS registers over every token INSTANCE of `textCol` (multiplicity
    * counts — no distinct). Absent (depth_row, bucket) cells are zero. */
  def tokenRegisters(df: DataFrame, textCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.repartition(parts)
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      // stage the 31-bit token hash once; each of the Depth bucket
      // expressions references it (the HOF-staging discipline)
      .select(TextFunctions.polyHash(col("tok"), 1L << 31).as("th"))
    val buckets = array(params.map { case (a, b) =>
      shiftrightunsigned((lit(a) * col("th") + lit(b)) % Mod40, BucketShift)
    }: _*)
    toks.select(posexplode(buckets).as(Seq("depth_row", "bucket")))
      .groupBy(col("depth_row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Group-wise registers: one CMS per `groupCol` value — per-group
    * token frequencies with the exchange bounded by
    * |groups|·Depth·Width rows per partition (Hll.registersBy's
    * treatment applied to the counting sketch). Same-group registers
    * merge across shards by SUM. */
  def tokenRegistersBy(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // Internal names ('grp', 'tok', 'th', ...) are aliases over
    // already-narrowed frames and cannot be shadowed by input columns —
    // the only invalid input is a groupCol/textCol collision.
    require(groupCol != textCol, s"groupCol and textCol must differ: '$groupCol'")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.repartition(parts)
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("grp"), TextFunctions.polyHash(col("tok"), 1L << 31).as("th"))
    val buckets = array(params.map { case (a, b) =>
      shiftrightunsigned((lit(a) * col("th") + lit(b)) % Mod40, BucketShift)
    }: _*)
    toks.select(col("grp"), posexplode(buckets).as(Seq("depth_row", "bucket")))
      .groupBy(col("grp"), col("depth_row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side polyHash — delegates to PolyHash's own JVM evaluator
    * so the fold walks Unicode CODE POINTS exactly like the Spark-side
    * expression (a UTF-16 char fold would diverge on supplementary-
    * plane characters and silently break the sketch guarantees). */
  private[graft] def polyHashJvm(s: String, mod: Long): Long =
    PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s), mod)

  /** Point estimate for `token` from collected registers: the min over
    * rows of that row's bucket counter. Never underestimates the true
    * instance count. */
  def estimate(regs: Map[(Int, Long), Long], token: String): Long = {
    val th = polyHashJvm(token, 1L << 31)
    params.zipWithIndex.map { case ((a, b), i) =>
      regs.getOrElse((i, ((a * th + b) % Mod40) >>> BucketShift), 0L)
    }.min
  }
}
