package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-card summary — the bounded "what is this corpus" report a
  * training-data release ships with, computed in one aggregation
  * statement over one scan (no joins — plan-asserted). The three
  * DISTINCT aggregates make Catalyst rewrite through Expand (4 rows
  * per input row) and the identity-distinct's exchange carries up to
  * one row per distinct text — at 100 TB run the report on the
  * already-deduped corpus, or swap the distinct-text term for the HLL
  * registers (the sketch family exists for exactly this). Counts are
  * exact, so the report is engine-reproducible and oracle-checkable.
  *
  * Duplication is reported as basis points of documents whose
  * (fp40, normalized-length) identity appeared earlier — the corpus's
  * exact-dup mass, the first number a dedup pass is judged by. A NULL
  * text is a real document with its own (sentinel) identity: it counts
  * in n_docs and n_distinct_texts, not in dup mass (countDistinct
  * would otherwise silently drop the whole row and report every
  * NULL-text document as a duplicate).
  */
object DatasetCard {

  /** One-row corpus report over a documents frame. */
  def report(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String): DataFrame = {
    val staged = docs.select(
      col(idCol).as("id"),
      col(sourceCol).as("src"),
      col(langCol).as("lng"),
      TextFunctions.tokens(col(textCol)).as("toks"),
      // −1 sentinels are outside both real domains (fp ∈ [0, 2^40),
      // nl ≥ 0), so NULL text forms one distinct identity instead of
      // being dropped from the distinct count
      coalesce(TextFunctions.fingerprint(col(textCol)), lit(-1L)).as("fp"),
      coalesce(TextFunctions.normalizedLength(col(textCol)), lit(-1L)).as("nl"))
    staged.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(col("toks"))), lit(0L)).cast("long").as("n_tokens"),
      countDistinct(col("src")).as("n_sources"),
      countDistinct(col("lng")).as("n_langs"),
      countDistinct(col("fp"), col("nl")).as("n_distinct_texts"),
      // exact-dup mass in basis points: docs beyond the first per identity
      floor((count(lit(1)) - countDistinct(col("fp"), col("nl"))) * lit(10000.0) /
        count(lit(1))).cast("long").as("dup_bp"),
      floor(avg(TextFunctions.qualityMilliFrom(col("toks")))).cast("long")
        .as("mean_quality_milli"))
  }
}
