package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the versioning primitive of an incremental
  * training-data pipeline: given two snapshots of a keyed corpus,
  * classify every document as added / removed / changed / unchanged.
  * Feeds incremental recomputation (only `added`+`changed` re-enter the
  * curation pipeline), audit trails ("what moved between v3 and v4"),
  * and retention checks (an unexpected `removed` spike fails the run).
  *
  * Content identity = (40-bit fingerprint, normalized length) — the same
  * widened identity as Dedup.incrementalMerge, so a bare-fp collision
  * can't mislabel a changed document as unchanged. Presence is tracked
  * with explicit flags, not fingerprint nullness: a present document
  * with NULL text still reads as present (its identity is the null
  * fingerprint, compared null-safely).
  *
  * Scale shape: one full outer sort-merge join on the id — both sides
  * shuffle once on the key they'd already be bucketed by in a versioned
  * lake (bucketed snapshots diff with ZERO exchanges), fingerprints are
  * per-row column expressions computed before the join, and the payload
  * riding the exchange is (id, fp, nlen, flag) — never the text.
  */
object Snapshot {

  /** Per-document diff of two snapshots keyed by `idCol`. Output:
    * (doc_id, status, old_fp, new_fp) with status ∈ added | removed |
    * changed | unchanged. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // A NULL (or non-castable) id would become a null join key that never
    // matches across the full outer join, double-reporting one document as
    // added+removed — fail loudly instead (deterministicSplit's guard).
    // Id uniqueness per snapshot is the documented contract; duplicates
    // fan the join out multiplicatively.
    //
    // The guard is a FILTER, not a projection wrapper: wrapping the id in
    // CASE WHEN would make the join key a derived expression, which
    // disables bucketed scans and forces both snapshots to re-shuffle —
    // exactly the exchange the bucketed-lake path exists to avoid
    // (BucketedSpec pins the zero-exchange plan).
    def keyed(df: DataFrame, side: String) =
      // try_cast: under ANSI mode a plain cast of a malformed id throws
      // its own opaque CAST_INVALID_INPUT before the guard runs.
      // assert_true(...).isNull is the codebase's fail-fast filter idiom
      // (Ann.lshNearDupPairs): null for surviving rows, throws otherwise.
      df.where(assert_true(col(idCol).try_cast("long").isNotNull,
          lit(s"Snapshot.diff: NULL or non-numeric id in '$idCol'")).isNull)
        .select(col(idCol).try_cast("long").as("doc_id"),
        TextFunctions.fingerprint(col(textCol)).as(s"${side}_fp"),
        TextFunctions.normalizedLength(col(textCol)).as(s"${side}_nl"),
        lit(1).as(s"${side}_p"))
    keyed(oldSnap, "old").join(keyed(newSnap, "new"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_p").isNull, lit("added"))
          .when(col("new_p").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp") &&
            col("old_nl") <=> col("new_nl"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"), col("old_fp"), col("new_fp"))
  }

  /** The bounded rollup a run gate consumes: per-status document counts
    * (at most 4 rows regardless of corpus size). */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
