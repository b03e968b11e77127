package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class FenceSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed source: a LocalRelation would be eagerly evaluated by
  // ConvertToLocalRelation and leave no Filter to inspect
  private def gatePipeline(fenced: Boolean) = {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val rep = TextFunctions.repetitionBpFrom(col("sh"))
    docs.select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .withColumn("sh", TextFunctions.wordShinglesFrom($"toks", 2))
      .withColumn("rep_bp", if (fenced) Fence.fence(rep) else rep)
      .where($"rep_bp" <= 5000)
  }

  test("fence is a value identity") {
    val plain = gatePipeline(fenced = false).select($"doc_id", $"rep_bp").collect()
    val fenced = gatePipeline(fenced = true).select($"doc_id", $"rep_bp").collect()
    assert(plain.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      fenced.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("fence keeps the filter above the staged projection (no alias re-substitution)") {
    // unfenced: pushdown substitutes the whole pipeline into a filter at
    // the scan — the optimized Filter condition contains the raw split()
    val unfencedFilter = gatePipeline(fenced = false)
      .queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.toString
      }
    assert(unfencedFilter.exists(_.contains("split(")))
    // fenced: the filter references the computed attribute only
    val fencedFilter = gatePipeline(fenced = true)
      .queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.toString
      }
    assert(fencedFilter.nonEmpty)
    assert(!fencedFilter.exists(_.contains("split(")))
  }
}
