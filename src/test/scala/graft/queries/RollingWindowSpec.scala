package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RollingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("RANGE frame goldens: inclusive trailing bound, simultaneous events share frames") {
    // user 1: events at t=0, 1000, 1800, 1801 with value-milli 1,10,100,1000
    // frame = [t-1800, t] inclusive both ends
    val rows = Seq(
      (1L, 1L, 0L, 1L),
      (2L, 1L, 1000L, 10L),
      (3L, 1L, 1800L, 100L),   // includes t=0 (inclusive lower bound)
      (4L, 1L, 1801L, 1000L),  // t=0 falls out, includes 1000,1800,1801
      (5L, 2L, 1800L, 7L),     // other user: isolated partition
      (6L, 2L, 1800L, 8L))     // simultaneous: both events share one frame
      .toDF("event_id", "user_id", "ts", "vm")
    val w = Window.partitionBy($"user_id").orderBy($"ts").rangeBetween(-1800L, 0L)
    val out = rows.select($"event_id", sum($"vm").over(w).as("s"),
        count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((11L, 2L)))
    assert(out(3L) == ((111L, 3L)))
    assert(out(4L) == ((1110L, 3L)))
    // RANGE (not ROWS): simultaneous events see each other symmetrically
    assert(out(5L) == ((15L, 2L)))
    assert(out(6L) == ((15L, 2L)))
  }

  test("q74 gate query end-to-end: µs frame edges, milli scaling, nano truncation") {
    // exercises Queries.q74RollingWindow ITSELF (constants, scaling,
    // filter, column names), not a local replica of the frame
    val dir = java.nio.file.Files.createTempDirectory("q74fix").toString
    val us = 1000L // nanos per µs
    Seq(
      (1L, 1L, 0L, Some(1.0)),
      (2L, 1L, 1800000000L * us, Some(2.0)),       // exactly 30 min: includes ev1
      (3L, 1L, 1800000000L * us + 500L, Some(4.0)), // +500 ns truncates to the same µs
      (4L, 1L, 1800000001L * us, Some(8.0)),        // one µs past: ev1 falls out
      (5L, 1L, Option.empty[Long].getOrElse(-1L), Option.empty[Double]) // null value rides
    ).toDF("event_id", "user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.q74RollingWindow(spark, dir)
      .select($"event_id", $"rolling_milli_30m", $"n_events_30m")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2)))).toMap
    assert(out(1L)._1.contains(1000L))
    // ev2 and ev3 TRUNCATE to the same µs → identical frames covering
    // ev1, ev5(null vm), ev2, ev3 — the µs-domain semantics the gate
    // oracle measures
    assert(out(2L) == ((Some(7000L), 4L)))
    assert(out(3L) == ((Some(7000L), 4L)))
    assert(out(4L) == ((Some(14000L), 3L))) // ev1 and ev5 out, evs 2-4 in
  }
}
