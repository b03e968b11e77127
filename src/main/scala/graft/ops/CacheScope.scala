package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for intermediate frames the library persists.
  *
  * Multi-branch pipelines (MinHash/SimHash near-dup, curation) persist
  * small mid-pipeline frames so each consumer branch reuses one
  * computation. Spark gives those cached blocks session lifetime: a
  * long-lived session running the daily curation loop would accumulate
  * them forever. Every library persist therefore goes through this
  * registry, and callers release them after materializing results:
  *
  *   val out = Curation.curate(docs, ev)._1
  *   out.write.parquet(...)           // actions consume the caches
  *   CacheScope.releaseAll(spark)     // then drop them
  *
  * releaseAll only touches frames the library registered — user caches
  * (spark.catalog.cacheTable etc.) are untouched, unlike
  * spark.catalog.clearCache(). Unpersisting before the consuming action
  * is safe (Spark recomputes from lineage); it just forfeits the reuse.
  */
object CacheScope {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK — spills instead of evicting at
    * scale) and register it for later release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every frame the library registered on this session. */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit = {
    val q = registry.remove(spark)
    if (q != null) q.forEach(df => df.unpersist(blocking))
  }

  /** Number of registered (still-held) frames — exposed for tests. */
  def registered(spark: SparkSession): Int = {
    val q = registry.get(spark)
    if (q == null) 0 else q.size()
  }
}
