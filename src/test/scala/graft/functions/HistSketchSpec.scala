package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  private val width = 5.0

  private def collectRegs(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long)]] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sorted).toMap

  test("histogram quantiles are within `width` of the exact order statistics on real events") {
    val events = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
    val regs = collectRegs(HistSketch.registers(events, "event_type", "value", width))
    // truth = the ⌈qN⌉-th order statistic (the sketch's contract —
    // interpolating percentile definitions carry no width bound on
    // gapped data)
    val byGroup = events.where($"value".isNotNull)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byGroup.nonEmpty && regs.keySet == byGroup.keySet)
    byGroup.foreach { case (g, values) =>
      Seq(0.25, 0.5, 0.9).foreach { q =>
        val rank = math.max(1, math.ceil(q * values.length).toInt)
        val truth = values(rank - 1)
        val est = HistSketch.quantile(regs(g), width, q)
        assert(math.abs(est - truth) <= width,
          s"group $g q=$q: estimate $est vs order statistic $truth exceeds width $width")
      }
    }
  }

  test("registers merge by SUM across shards") {
    val events = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
    val whole = HistSketch.registers(events, "event_type", "value", width)
    val merged = HistSketch.registers(events.where(pmod($"event_id", lit(2)) === 0),
        "event_type", "value", width)
      .unionByName(HistSketch.registers(events.where(pmod($"event_id", lit(2)) === 1),
        "event_type", "value", width))
      .groupBy($"grp", $"bucket").agg(sum($"cnt").as("cnt"))
    assert(collectRegs(merged) == collectRegs(whole))
  }

  test("quantile walk edges: q=0 and q=1, negative values, single bucket") {
    // values -7, -2, 3 with width 5 → buckets -2, -1, 0
    val regs = Seq((-2L, 1L), (-1L, 1L), (0L, 1L))
    val lo = HistSketch.quantile(regs, width, 0.0)
    assert(lo > -10.0 && lo <= -5.0) // rank 1 lands in bucket -2 = [-10, -5)
    assert(HistSketch.quantile(regs, width, 1.0) == 5.0) // top edge of bucket 0
    assert(HistSketch.quantile(Seq((3L, 10L)), width, 0.5) == (3 + 0.5) * width)
  }
}
