package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column-expression building blocks for the medical ETL parity layer.
  *
  * Everything here compiles to built-in Catalyst expressions (no UDFs), so
  * the whole transform chain stays inside whole-stage codegen and is
  * Catalyst-optimizable (constant folding, pushdown through the exprs).
  *
  * Reference semantics (cited `/root/reference/...`):
  *   - severity:  src/transformers/drug_transformer.py:310-321
  *   - binning:   drug_transformer.py:115-120, 164-169 (pandas `pd.cut`)
  *   - phase:     drug_transformer.py:334-352
  *   - normalize: drug_transformer.py:237-243
  */
object EtlFunctions {

  /** pandas `pd.cut` semantics: intervals are left-open right-closed
    * `(lo, hi]`; values outside every bin (incl. the left edge itself and
    * nulls) map to null. `Double.PositiveInfinity` as the last edge gives
    * an unbounded final bin `(lo, inf)`.
    */
  def cut(c: Column, bins: Seq[Double], labels: Seq[String]): Column = {
    require(bins.length == labels.length + 1, "need one more bin edge than labels")
    val intervals = bins.sliding(2).toSeq.zip(labels)
    intervals.foldLeft(lit(null).cast("string")) { case (acc, (Seq(lo, hi), label)) =>
      val inBin =
        if (hi.isPosInfinity) c > lit(lo)
        else c > lit(lo) && c <= lit(hi)
      when(inBin, lit(label)).otherwise(acc)
    }
  }

  val AgeBins: Seq[Double] = Seq(0, 18, 30, 50, 65, 100)
  val AgeLabels: Seq[String] = Seq("Pediatric", "Young Adult", "Adult", "Senior", "Elderly")

  val StudySizeBins: Seq[Double] = Seq(0, 50, 200, 1000, Double.PositiveInfinity)
  val StudySizeLabels: Seq[String] = Seq("Small", "Medium", "Large", "Very Large")

  def ageGroup(age: Column): Column = cut(age, AgeBins, AgeLabels)

  def studySizeCategory(enrollment: Column): Column =
    cut(enrollment, StudySizeBins, StudySizeLabels)

  /** Weighted severity score; absent inputs contribute 0 (see
    * FdaTransform for the column-presence probing). */
  def severityScore(serious: Column, death: Column, hosp: Column): Column =
    coalesce(serious, lit(0)) * lit(2) +
      coalesce(death, lit(0)) * lit(10) +
      coalesce(hosp, lit(0)) * lit(5)

  /** Phase string → numeric. The `when` chain order is load-bearing:
    * "PHASE III" contains "PHASE II" contains "PHASE I", and
    * "EARLY PHASE 1" must hit EARLY (0.5) before the PHASE 1 branch. */
  def phaseNumeric(phase: Column): Column = {
    val p = upper(phase)
    when(phase.isNull || phase === "", 0.0)
      .when(p.contains("PHASE 4") || p.contains("PHASE IV"), 4.0)
      .when(p.contains("PHASE 3") || p.contains("PHASE III"), 3.0)
      .when(p.contains("PHASE 2") || p.contains("PHASE II"), 2.0)
      .when(p.contains("EARLY"), 0.5)
      .when(p.contains("PHASE 1") || p.contains("PHASE I"), 1.0)
      .otherwise(0.0)
  }

  /** Normalization used on both sides of the enrichment containment match:
    * lowercase, trim, strip ALL interior spaces; null → "". */
  def normalizeForMatching(c: Column): Column =
    regexp_replace(lower(trim(coalesce(c, lit("")))), " ", "")
}
