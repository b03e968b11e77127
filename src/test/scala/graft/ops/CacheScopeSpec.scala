package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("library persists register and releaseAll unpersists them") {
    CacheScope.releaseAll(spark) // clean slate from other suites
    assert(CacheScope.registered(spark) == 0)
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val pairs = graft.dedup.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.8)
    assert(pairs.count() >= 0)
    assert(CacheScope.registered(spark) == 1, "minhash sigs frame should be registered")
    val sim = graft.dedup.Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxDist = 3, blockCol = Some("source"))
    assert(sim.count() >= 0)
    assert(CacheScope.registered(spark) == 2, "simhash base frame should be registered")
    CacheScope.releaseAll(spark, blocking = true)
    assert(CacheScope.registered(spark) == 0)
    // a released frame recomputes from lineage — results unchanged
    assert(pairs.count() == pairs.count())
  }

  test("releaseAll leaves user-managed caches alone") {
    val user = Seq(1, 2, 3).toDF("x").persist()
    assert(user.count() == 3)
    CacheScope.releaseAll(spark)
    assert(user.storageLevel.useMemory, "user cache must survive releaseAll")
    user.unpersist(true)
  }
}
