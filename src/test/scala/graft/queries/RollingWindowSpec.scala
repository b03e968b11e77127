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
}
