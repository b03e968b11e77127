package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def regsOf(df: org.apache.spark.sql.DataFrame, keyCol: String) =
    Hll.registers(df, keyCol).collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue)).toSeq

  test("group-wise registers equal per-group global registers; estimates track exact") {
    val events = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "events")
    val byGroup = Hll.registersBy(events, "event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2).asInstanceOf[Number].longValue))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sorted).toMap
    val groups = events.select($"event_type").distinct().as[String].collect()
    assert(byGroup.keySet == groups.toSet)
    groups.foreach { g =>
      val solo = regsOf(events.where($"event_type" === g), "user_id").sorted
      assert(byGroup(g) == solo, s"group $g registers diverge from a solo run")
      val exact = events.where($"event_type" === g)
        .select($"user_id").distinct().count()
      val est = Hll.estimate(byGroup(g))
      assert(math.abs(est - exact) / exact < 0.15,
        s"group $g estimate $est vs exact $exact")
    }
  }

  test("estimate tracks exact distinct within HLL error (1024 registers -> ~3.3% sigma)") {
    // large cardinality: standard estimator path
    val big = spark.range(50000).select($"id".as("k")).toDF()
    val est = Hll.estimate(regsOf(big, "k"))
    assert(math.abs(est - 50000) / 50000 < 0.1, s"est=$est")
    // real keys
    val li = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    val est2 = Hll.estimate(regsOf(li, "l_orderkey"))
    assert(math.abs(est2 - exact) / exact < 0.1, s"est=$est2 exact=$exact")
  }

  test("small-range linear counting is near-exact; registers merge by max") {
    val small = spark.range(100).select($"id".as("k")).toDF()
    val est = Hll.estimate(regsOf(small, "k"))
    assert(math.abs(est - 100) / 100 < 0.1, s"est=$est")
    // sketch property: registers of A union B == elementwise max of
    // registers(A), registers(B)
    val a = spark.range(0, 30000).select($"id".as("k")).toDF()
    val b = spark.range(20000, 60000).select($"id".as("k")).toDF()
    val union = spark.range(0, 60000).select($"id".as("k")).toDF()
    val ra = regsOf(a, "k").toMap
    val rb = regsOf(b, "k").toMap
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
    assert(regsOf(union, "k").toMap == merged)
  }
}
