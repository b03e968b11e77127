package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def collectRegs(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("CMS never underestimates; frequent tokens are near-exact on the corpus") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val regs = collectRegs(Cms.tokenRegisters(docs, "text"))
    assert(regs.keys.forall { case (d, b) =>
      d >= 0 && d < Cms.Depth && b >= 0 && b < Cms.Width
    })
    val exact = docs
      .select(explode(graft.text.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (tok, c) =>
      val est = Cms.estimate(regs, tok)
      assert(est >= c, s"CMS underestimated '$tok': $est < $c")
      // ε = e/Width bound at the whole-corpus N; generous but real
      assert(est <= c + (math.E / Cms.Width * n).ceil.toLong,
        s"CMS overestimate for '$tok' beyond the εN bound: $est vs $c (N=$n)")
    }
    // the register sum over each row equals the total instance count
    (0 until Cms.Depth).foreach { d =>
      assert(regs.collect { case ((`d`, _), c) => c }.sum == n)
    }
  }

  test("CMS registers merge by SUM: shard sketches add to the whole-corpus sketch") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val whole = Cms.tokenRegisters(docs, "text")
    val shardA = Cms.tokenRegisters(docs.where(pmod($"doc_id", lit(2)) === 0), "text")
    val shardB = Cms.tokenRegisters(docs.where(pmod($"doc_id", lit(2)) === 1), "text")
    val merged = shardA.unionByName(shardB)
      .groupBy($"depth_row", $"bucket").agg(sum($"cnt").as("cnt"))
    assert(collectRegs(merged) == collectRegs(whole))
  }

  test("group-wise registers equal per-group solo sketches") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val byGroup = Cms.tokenRegistersBy(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.map(t => ((t._2, t._3), t._4)).toMap).toMap
    val groups = docs.select($"source").distinct().as[String].collect()
    assert(byGroup.keySet == groups.toSet)
    groups.foreach { g =>
      val solo = collectRegs(Cms.tokenRegisters(docs.where($"source" === g), "text"))
      assert(byGroup(g) == solo, s"group $g registers diverge from a solo sketch")
    }
  }

  test("absent token estimates are bounded (zero when its buckets are empty)") {
    val tiny = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val regs = collectRegs(Cms.tokenRegisters(tiny, "text"))
    assert(Cms.estimate(regs, "alpha") >= 2L)
    assert(Cms.estimate(regs, "beta") >= 1L)
    // with 2 distinct tokens in 1024 cells a collision across ALL 4 rows
    // is (2/256)^4-improbable; a miss must read 0
    assert(Cms.estimate(regs, "nosuchtoken") <= 3L)
  }
}
