package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-card summary — the bounded "what is this corpus" report a
  * training-data release ships with, computed in ONE aggregation pass
  * (every metric is an algebraic aggregate with a map-side partial; the
  * exchange carries one partial row per partition). Counts are exact,
  * not sketch estimates, so the report is engine-reproducible and
  * oracle-checkable; the sketch family covers the
  * streaming/incremental variants of the same numbers.
  *
  * Duplication is reported as basis points of documents whose
  * (fp40, normalized-length) identity appeared earlier — the corpus's
  * exact-dup mass, the first number a dedup pass is judged by.
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
      TextFunctions.fingerprint(col(textCol)).as("fp"),
      TextFunctions.normalizedLength(col(textCol)).as("nl"))
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
