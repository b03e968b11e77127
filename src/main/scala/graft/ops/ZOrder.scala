package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional lake
  * clustering step for 100 TB scan pruning: sorting by a single key
  * gives perfect min/max file pruning on that key and NONE on any
  * other; interleaving the bits of two keys gives every file a small
  * hyper-rectangle of BOTH domains, so parquet min/max (or partition
  * range) pruning works for predicates on either column, at a modest
  * cost to each. The standard layout trick for fact tables queried
  * along two independent dimensions (user × time, id × value).
  *
  * The z-value is pure integer bit arithmetic (shift / and / or), so
  * layout decisions are engine-reproducible and oracle-checkable —
  * no library, no UDF, plain codegen'd column expressions.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: result bit 2i+1 = a's bit i, bit 2i = b's bit i. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val masked = (c: Column) => c.bitwiseAND(lit((1L << bits) - 1))
    val am = masked(a); val bm = masked(b)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** N-dimensional Morton interleave: result bit d·i + j carries
    * dimension j's bit i (dimension 0 owns the most significant bit of
    * each round). Total bits d·`bits` must stay ≤ 63. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValueN needs at least one dimension")
    require(bits >= 1 && dims.length * bits <= 63,
      s"${dims.length} dims × $bits bits exceeds a positive Long")
    val d = dims.length
    val masked = dims.map(_.bitwiseAND(lit((1L << bits) - 1)))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      masked.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(c, i).bitwiseAND(lit(1L)), d * i + (d - 1 - j)))
      }
    }
  }

  /** Lay a frame out along the z-curve of two long-valued columns:
    * range-partition by z-value (so files = curve segments = small
    * rectangles of both domains), sorted within partitions for parquet
    * min/max locality. Write the result and both columns prune.
    *
    * Each dimension is min/max-scaled to the full `bits` range first —
    * REQUIRED for the curve to alternate between dimensions: with raw
    * values whose magnitudes differ (an 8-bit user_id against a 5-bit
    * bucket), every discriminating high bit belongs to the wider
    * column and the "z" order collapses to a plain single-key sort
    * (measured on the events table before this scaling existed). The
    * min/max pass is one bounded aggregation (the AQE-stats pattern);
    * a constant column scales to 0 and drops out of the interleave. */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!mm.anyNull, s"zorderLayout: NULLs or empty input in $colA/$colB")
    val top = (1L << bits) - 1
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else floor((col(c).cast("long") - lo).cast("double") * top / (hi - lo)).cast("long")
    df.withColumn("__z", zValue2(
        scaled(colA, mm.getLong(0), mm.getLong(1)),
        scaled(colB, mm.getLong(2), mm.getLong(3)), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
