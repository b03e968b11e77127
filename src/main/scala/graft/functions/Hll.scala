package graft.functions

import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible HyperLogLog: the registers are a plain
  * relational result — (bucket, max rho) from a groupBy max over the
  * avalanche-mixed 48-bit polynomial key hash — so the ENTIRE sketch
  * construction is verifiable value-for-value by an external BIGINT
  * engine (unlike Spark's built-in approx_count_distinct, whose sketch
  * encoding is engine-internal; q36 keeps that as the native option).
  *
  * Scale shape: no distinct, no UDAF — duplicate keys collapse inside
  * the codegen'd partial max, so the one exchange carries ≤ 1024 rows
  * per map partition regardless of input size, and registers merge
  * across shards/days by another max (the same property that makes the
  * MinHash sketch a true sketch).
  *
  * rho uses `length(bin(v))` — integer arithmetic, no float log2 whose
  * boundary rounding could diverge across engines. The avalanche matters
  * doubly here: the raw poly fold of a short decimal key never fills the
  * top hash bits, which would inflate every register's leading-zero
  * count.
  */
object Hll {

  val BucketBits = 10
  val Buckets: Int = 1 << BucketBits // 1024
  val RegBits: Int = 48 - BucketBits // 38

  /** Staged scalar avalanche of the 48-bit poly hash (same rounds and
    * constants as Dedup's token mix). Each round lands in its own select
    * so the multi-referenced intermediates never re-evaluate the fold.
    * `carry` columns ride alongside untouched (the group key). */
  private def mixedHash(df: DataFrame, keyCol: String, carry: Seq[String]): DataFrame = {
    def keep = carry.map(col)
    val h0 = df.select(keep :+
      TextFunctions.polyHash(col(keyCol).cast("string"), 1L << 48).as("h"): _*)
    val afterFirst = h0.select(keep :+ Dedup.xorShift48(col("h")).as("h"): _*)
    Dedup.Mix48Muls.foldLeft(afterFirst) { (d, a) =>
      d.select(keep :+ Dedup.splitMul48(col("h"), a).as("h"): _*)
        .select(keep :+ Dedup.xorShift48(col("h")).as("h"): _*)
    }
  }

  /** The HLL registers for a key column: (bucket, m_rho), absent buckets
    * = empty registers. */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    mixedHash(df.repartition(parts), keyCol, Seq.empty)
      .select(col("h").bitwiseAND(lit((Buckets - 1).toLong)).as("bucket"),
        shiftrightunsigned(col("h"), BucketBits).as("v"))
      .groupBy(col("bucket"))
      .agg(max(when(col("v") === 0, RegBits + 1)
        .otherwise(lit(RegBits + 1) - length(bin(col("v"))))).as("m_rho"))
  }

  /** Group-wise registers: one HLL per `groupCol` value — approximate
    * distinct keys per group with the exchange bounded by
    * |groups|·Buckets rows per partition (the group-level analog of
    * MinHashSketchAgg's per-group signature). Registers for the same
    * group merge across shards/days by max, exactly like [[registers]]. */
  def registersBy(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    // The only real conflict: keyCol named 'grp' collides with the
    // groupCol alias in the same select (ambiguous reference). Every
    // other internal name ('h', 'bucket', 'v', 'm_rho') is introduced
    // as an alias over an already-narrowed frame and cannot be
    // shadowed by input columns.
    require(keyCol != "grp", "registersBy: keyCol must not be named 'grp' " +
      "(collides with the internal group alias)")
    require(groupCol != keyCol, s"groupCol and keyCol must differ: '$groupCol'")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    mixedHash(df.repartition(parts)
        .select(col(groupCol).as("grp"), col(keyCol)), keyCol, Seq("grp"))
      .select(col("grp"),
        col("h").bitwiseAND(lit((Buckets - 1).toLong)).as("bucket"),
        shiftrightunsigned(col("h"), BucketBits).as("v"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(when(col("v") === 0, RegBits + 1)
        .otherwise(lit(RegBits + 1) - length(bin(col("v"))))).as("m_rho"))
  }

  /** Standard HLL estimate from collected registers, with the
    * small-range linear-counting correction. */
  def estimate(regs: Seq[(Long, Long)]): Double = {
    val m = Buckets.toDouble
    val alpha = 0.7213 / (1 + 1.079 / m)
    val present = regs.toMap
    val sum = (0 until Buckets).map { b =>
      math.pow(2.0, -present.getOrElse(b.toLong, 0L).toDouble)
    }.sum
    val e = alpha * m * m / sum
    val zeros = Buckets - present.count(_._2 > 0)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }
}
