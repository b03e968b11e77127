package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 golden bits and bijectivity on a 16x16 grid") {
    val grid = (for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val z = grid.select($"a", $"b", ZOrder.zValue2($"a", $"b", 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // interleave golden values
    assert(z((0L, 0L)) == 0L)
    assert(z((0L, 1L)) == 1L)
    assert(z((1L, 0L)) == 2L)
    assert(z((1L, 1L)) == 3L)
    assert(z((2L, 2L)) == 12L)
    assert(z((15L, 15L)) == 255L)
    // bijective over the grid
    assert(z.values.toSet.size == 256)
  }

  test("zValueN: 2-dim agrees with zValue2; 3-dim golden values and bijectivity") {
    val grid2 = (for (a <- 0 until 8; b <- 0 until 8) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val agree = grid2.select(
      (ZOrder.zValue2($"a", $"b", 3) === ZOrder.zValueN(Seq($"a", $"b"), 3)).as("eq"))
      .as[Boolean].collect()
    assert(agree.forall(identity))
    val grid3 = (for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 4)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val z3 = grid3.select($"a", $"b", $"c",
        ZOrder.zValueN(Seq($"a", $"b", $"c"), 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(z3((0L, 0L, 1L)) == 1L)
    assert(z3((0L, 1L, 0L)) == 2L)
    assert(z3((1L, 0L, 0L)) == 4L)
    assert(z3((3L, 3L, 3L)) == 63L)
    assert(z3.values.toSet.size == 64)
  }

  test("z-layout bounds BOTH dimensions per partition; single-key sort does not") {
    val events = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
      .where($"value".isNotNull)
      .select($"event_id", $"user_id", floor($"value").cast("long").as("v"))
    val nPart = 8
    val full = events.agg(
        (max($"user_id") - min($"user_id")).cast("double").as("uspan"),
        (max($"v") - min($"v")).cast("double").as("vspan"))
      .head()
    val fullArea = full.getDouble(0) * full.getDouble(1)

    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val rows = df
        .select($"user_id", $"v", spark_partition_id().as("pid"))
        .groupBy($"pid")
        .agg((max($"user_id") - min($"user_id")).cast("double").as("us"),
          (max($"v") - min($"v")).cast("double").as("vs"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      (rows.map(_._1).sum / rows.length, rows.map(_._2).sum / rows.length,
        rows.map(t => t._1 * t._2).sum / rows.length)
    }
    val (zU, zV, zArea) = meanSpans(ZOrder.zorderLayout(events, "user_id", "v", nPart))
    val (idU, idV, idArea) = meanSpans(events.repartitionByRange(nPart, $"user_id"))
    info(f"z-order: uspan $zU%.1f vspan $zV%.1f area $zArea%.0f; " +
      f"id-sort: uspan $idU%.1f vspan $idV%.1f area $idArea%.0f; " +
      f"full: ${full.getDouble(0)}%.0f × ${full.getDouble(1)}%.0f = $fullArea%.0f")
    // z-order bounds BOTH dimensions: each span well under its full
    // extent, joint rectangle well under the full area
    assert(zU < 0.7 * full.getDouble(0), s"z-layout user span not bounded: $zU")
    assert(zV < 0.7 * full.getDouble(1), s"z-layout value span not bounded: $zV")
    assert(zArea < fullArea / 2)
    // single-key range layout bounds only its own key; z-order must cut
    // the OTHER dimension's span well below what the id layout leaves
    assert(zV < 0.75 * idV, s"z-layout value span $zV not better than id layout's $idV")
  }
}
