package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The typed-timestamp layer over the nanos-as-long events column:
  * `eventsTyped.ts_t` must carry the UTC wall-clock of the nano instant
  * at µs precision, be immune to DST rules, and reproduce the pure
  * integer-arithmetic formulations the gate queries previously used. */
class TimestampSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ts_t is the UTC wall-clock of the nano instant, truncated to µs") {
    val rows = Queries.eventsTyped(spark, dir)
      .select($"ts", date_format($"ts_t", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .limit(200).collect()
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    rows.foreach { r =>
      val ns = r.getLong(0)
      val expected = fmt.format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(ns, 1000000000L),
        Math.floorMod(ns, 1000000000L) / 1000 * 1000))
      assert(r.getString(1) == expected, s"ns=$ns")
    }
  }

  test("hour bucketing on ts_t has no DST cliff: typed == integer across a US/EU DST boundary") {
    // 2024-03-10 (US spring-forward) and 2024-03-31 (EU spring-forward):
    // hours around the local jump, as nano instants. TIMESTAMP_NTZ under a
    // pinned-UTC session must bucket these identically to pure integer
    // division — a zone-aware timestamp bucketed in a DST zone would not.
    val base1 = java.time.Instant.parse("2024-03-10T05:30:00Z").getEpochSecond
    val base2 = java.time.Instant.parse("2024-03-31T00:30:00Z").getEpochSecond
    val nanos = (0 until 8).flatMap { h =>
      Seq(base1 + h * 3600L, base2 + h * 3600L).map(_ * 1000000000L + h * 1001L)
    }
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = nanos.toDF("ts").withColumn("ts_t",
      timestamp_micros(expr("ts div 1000"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
    val typed = df.groupBy(date_format($"ts_t", "yyyy-MM-dd HH:00:00").as("b"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val integer = df.groupBy(expr("ts div 3600000000000").as("b"))
      .count().collect().map { r =>
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:00:00").withZone(java.time.ZoneOffset.UTC)
      fmt.format(java.time.Instant.ofEpochSecond(r.getLong(0) * 3600L)) -> r.getLong(1)
    }.toMap
    assert(typed == integer)
    assert(typed.size == 16) // every hour its own bucket — no merged/skipped DST hour
  }

  test("typed INTERVAL sessionization equals the long-arithmetic formulation") {
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val longForm = Queries.tbl(spark, dir, "events")
      .withColumn("new_sess",
        when(lag($"ts", 1).over(w).isNull ||
          $"ts" - lag($"ts", 1).over(w) > gapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
    val typed = Queries.q29Sessionize(spark, dir)
    assert(typed.exceptAll(longForm).isEmpty && longForm.exceptAll(typed).isEmpty)
    // µs truncation cannot flip the 30-min gap compare unless two events
    // land in the same microsecond AND exactly straddle the boundary —
    // assert the precondition that makes the equality above structural.
    assert(typed.count() == longForm.count())
  }
}
