package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata-mapped query catalog: one entry per operator family from
  * SURVEY.md §2, expressed over the driver's TPC-H-ish tables at
  * `/root/testdata/sf*` plus `documents`/`embeddings`.
  *
  * Conventions (driver oracle-compat):
  *   - every double-typed aggregate is `round(_, N)` in BOTH Spark and the
  *     DuckDB oracle SQL so accumulation-order float noise can't flip the
  *     hash compare;
  *   - every computed column is aliased identically on both sides (the
  *     driver sorts columns by name before hashing);
  *   - row sets are deterministic (no bare `dropDuplicates`/`limit` without
  *     a total order).
  */
object Queries {

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Q1: pricing summary — SURVEY §2.6 A1 (hash aggregation with partial
    * map-side combine; cf. reference drug_transformer.py:196-213).
    * Group keys are low-cardinality strings so the shuffle is tiny; the
    * heavy lifting happens map-side in HashAggregateExec partials. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    tbl(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _)
  )
}
