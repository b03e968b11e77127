package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cluster-scale join toolkit: bucketing (shuffle-free co-located joins
  * for repeatedly-joined big tables) and salting (skew mitigation when
  * one key dominates). Both preserve exact join semantics — they only
  * change the physical shuffle plan.
  */
object ScaleOps {

  /** Persist a bucketed+sorted table: joins between two tables bucketed
    * on the same key with the same bucket count plan as SortMergeJoin
    * with NO exchange on either side — the shuffle is paid once at write
    * time instead of on every join. The 100 TB pattern for fact-fact
    * joins (lineitem ⋈ orders) that recur across a workload. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the big side's rows get a
    * deterministic salt in [0, saltFactor); the small side is replicated
    * saltFactor times; joining on (key, salt) spreads a hot key over
    * saltFactor reducers. Result is exactly the plain equi-join.
    *
    * The salt derives from xxhash64 of the big side's non-key columns
    * (deterministic across retries/resumes — no rand()); rows identical
    * in every column hash to the same salt, which is harmless: skewed
    * KEYS are spread regardless. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val nonKey = big.columns.filter(_ != key).map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(nonKey.toIndexedSeq: _*)), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
