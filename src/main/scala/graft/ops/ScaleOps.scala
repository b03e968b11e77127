package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
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

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTime` ≤ `leftTime` within the same key (the
    * time-series "latest known value" join Spark lacks natively).
    * Left-outer semantics: unmatched left rows keep null right columns.
    *
    * Plan shape: equi-join on the key (sort-merge/broadcast as Catalyst
    * chooses) + range post-filter, then a per-left-row window keeps the
    * latest match. Column names must be disjoint between the two sides.
    * Ties on `rightTime` are broken arbitrarily — pre-dedup the right
    * side per (key, time) if tie determinism matters.
    * Scale: shuffle on the key only; the window partitions on the unique
    * left-row id, so no skew even when one key dominates. */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, overlap: $overlap")
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val matched = l.join(right,
      col(leftKey) === col(rightKey) && col(rightTime) <= col(leftTime), "inner")
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col(rightTime).desc)
    val best = matched
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__lid") +: right.columns.map(col).toIndexedSeq: _*)
    l.join(best, Seq("__lid"), "left_outer").drop("__lid")
  }
}
