package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible histogram sketch — the order-statistics
  * member of the sketch family (HLL = distinct, MinHash = similarity,
  * CMS = frequency, histogram = quantiles). q34's exact `percentile`
  * sorts every group's values; at 100 TB the scale path is a
  * fixed-width histogram whose quantile estimates carry a ≤ `width`
  * value-error bound — the registers are (group, bucket, cnt) rows from
  * one map-side-combined count, verifiable value-for-value by an
  * external engine (the same register-as-relation treatment as
  * Hll/Cms, unlike approx_percentile's engine-internal digest).
  *
  * bucket = floor(value / width): one IEEE double divide + floor, both
  * correctly-rounded operations, so bucket assignment is bit-identical
  * across engines. NULL values are excluded (documented — they carry no
  * rank). Registers merge across shards/days by SUM.
  *
  * Scale shape: the exchange carries ≤ |groups|·⌈range/width⌉ rows per
  * partition (bounded by the value range, not the row count); no sort
  * anywhere. Estimation is a driver-side cumulative walk over the
  * collected group's registers.
  */
object HistSketch {

  /** Histogram registers of `valueCol` per `groupCol`. */
  def registers(df: DataFrame, groupCol: String, valueCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"),
        floor(col(valueCol).cast("double") / width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimate from one group's collected registers: the value
    * at rank ⌈q·N⌉ located by a cumulative walk, linearly interpolated
    * inside its bucket. The ⌈q·N⌉-th ORDER STATISTIC lies within
    * `width` of the estimate (the bucket's own extent); interpolating
    * definitions of "percentile" (mean of adjacent order statistics on
    * gapped data) can sit anywhere between neighbors and carry no such
    * bound — compare against the order statistic, as HistSketchSpec
    * does. */
  def quantile(regs: Seq[(Long, Long)], width: Double, q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1]: $q")
    require(regs.nonEmpty, "empty register set")
    val sorted = regs.sortBy(_._1)
    val n = sorted.map(_._2).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var acc = 0L
    for ((bucket, cnt) <- sorted) {
      if (acc + cnt >= target) {
        val into = (target - acc).toDouble / cnt // position inside the bucket
        return (bucket + into) * width
      }
      acc += cnt
    }
    (sorted.last._1 + 1) * width // q = 1 fallthrough: top edge
  }
}
