package graft.queries

import graft.SparkSpec

class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query runs and every oracle key exists in the registry") {
    val qs = graft.SparkEntry.queries
    val oracles = graft.SparkEntry.oracleSql
    assert(oracles.keySet.subsetOf(qs.keySet),
      s"orphan oracles: ${oracles.keySet -- qs.keySet}")
    for ((name, fn) <- qs) {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("approx_count_distinct stays within the configured error bound of exact") {
    val rows = Queries.q36ApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getAs[String]("l_returnflag")}: approx=$approx exact=$exact")
    }
  }
}
