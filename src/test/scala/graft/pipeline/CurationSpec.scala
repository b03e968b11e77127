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
}
