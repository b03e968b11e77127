package graft.pipeline

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("full curation pipeline: monotone stages, deterministic, eval-clean, dup-free") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val eval = docs.where($"source" === "src0").select($"text")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)

    val (out, Some(report)) = Curation.curate(docs, Some(eval), cfg)
    val outRows = out.select($"doc_id").as[Long].collect().toSet

    // stage counts shrink monotonically and the report matches the frame
    assert(report.input >= report.afterCore)
    assert(report.afterCore >= report.afterNearDup)
    assert(report.afterNearDup >= report.afterContamination)
    assert(report.afterContamination >= report.output)
    assert(report.output == outRows.size)
    assert(report.output > 0, "curation must keep something at these settings")

    // deterministic: identical membership on a re-run
    val (out2, _) = Curation.curate(docs, Some(eval), cfg, countStages = false)
    assert(out2.select($"doc_id").as[Long].collect().toSet == outRows)

    // no output text fingerprint appears in the eval set
    val evalFps = eval.select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect().toSet
    val outFps = out.select(TextFunctions.fingerprint($"text").as("fp"))
      .as[Long].collect()
    assert(outFps.forall(fp => !evalFps.contains(fp)))

    // exact dedup held: all surviving texts distinct
    assert(out.select($"text").distinct().count() == report.output)
  }

  test("incremental recuration: empty-prev degenerates to curate exactly") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val eval = docs.where($"source" === "src0").select($"text")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)
    val empty = docs.where(lit(false))
    val (full, _) = Curation.curate(docs, Some(eval), cfg, countStages = false)
    val incr = Curation.curateIncrement(empty, empty.select($"doc_id", $"source", $"text"),
      docs, Some(eval), cfg)
    assert(incr.select($"doc_id").as[Long].collect().toSet ==
      full.select($"doc_id").as[Long].collect().toSet)
  }

  test("incremental recuration: idempotent on an unchanged snapshot; removed/changed handled") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val cfg = Curation.CurationConfig(minQualityMilli = 300, sampleBp = 8000)
    val v1 = docs.where(pmod($"doc_id", lit(4)) =!= 0)
    val (out1, _) = Curation.curate(v1, None, cfg, countStages = false)
    val out1Ids = out1.select($"doc_id").as[Long].collect().toSet

    // unchanged snapshot → previous output verbatim
    val same = Curation.curateIncrement(v1, out1, v1, None, cfg)
    assert(same.select($"doc_id").as[Long].collect().toSet == out1Ids)

    // v2: drop ids ≡ 1 mod 16, add the held-out quarter back
    val v2 = docs.where(pmod($"doc_id", lit(16)) =!= 1)
    val incr = Curation.curateIncrement(v1, out1, v2, None, cfg)
    val incrIds = incr.select($"doc_id").as[Long].collect().toSet
    val v2Ids = v2.select($"doc_id").as[Long].collect().toSet
    // outputs only come from the new snapshot; removed docs are gone
    assert(incrIds.subsetOf(v2Ids))
    // carried docs not touched by the delta survive
    assert((out1Ids intersect incrIds).nonEmpty)
    assert(out1Ids.filter(_ % 16 == 1).forall(id => !incrIds.contains(id)))
    // no exact-duplicate texts in the merged output (first-writer-wins held)
    assert(incr.select($"text").distinct().count() == incr.count())
    // deterministic
    val incr2 = Curation.curateIncrement(v1, out1, v2, None, cfg)
    assert(incr2.select($"doc_id").as[Long].collect().toSet == incrIds)
  }
}
