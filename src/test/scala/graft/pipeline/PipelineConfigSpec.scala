package graft.pipeline

import graft.SparkSpec

class PipelineConfigSpec extends SparkSpec {
  import spark.implicits._

  /** The reference yaml's tunable sections, verbatim values
    * (pipeline_config.yaml:11-84, 128-132). */
  private val referenceYaml =
    """extraction:
      |  fda_limit: 1000
      |  clinical_trials_limit: 100
      |  retry_attempts: 3
      |  retry_delay_seconds: 5
      |  timeout_seconds: 30
      |transformation:
      |  severity_weights:
      |    serious: 2
      |    death: 10
      |    hospitalization: 5
      |  age_groups:
      |    - [0, 18, "Pediatric"]
      |    - [18, 30, "Young Adult"]
      |    - [30, 50, "Adult"]
      |    - [50, 65, "Senior"]
      |    - [65, 100, "Elderly"]
      |  study_size_categories:
      |    - [0, 50, "Small"]
      |    - [50, 200, "Medium"]
      |    - [200, 1000, "Large"]
      |    - [1000, 999999, "Very Large"]
      |quality:
      |  max_missing_percentage: 10
      |  min_total_records: 10
      |  min_records_per_source: 5
      |  required_fields:
      |    fda: [safetyreportid, receivedate, drug_name]
      |    clinical_trials: [nct_id, brief_title, overall_status]
      |storage:
      |  raw_prefix: "raw"
      |  processed_prefix: "processed"
      |  logs_prefix: "logs"
      |  raw_format: "json"
      |  processed_format: "parquet"
      |  summary_format: "csv"
      |  compression: "snappy"
      |  partition_by: [year, month, day]
      |monitoring:
      |  alerts:
      |    max_processing_time_minutes: 60
      |    min_record_count: 10
      |    max_error_rate: 0.05
      |    min_quality_score: 0.95
      |""".stripMargin

  test("reference yaml loads to exactly the compiled defaults") {
    assert(PipelineConfigLoader.fromYaml(referenceYaml) == PipelineConfig.default)
  }

  test("999999 study-size sentinel reads as an unbounded final bin") {
    val cfg = PipelineConfigLoader.fromYaml(referenceYaml)
    assert(cfg.binning.studySizeBins.last.isPosInfinity)
  }

  test("partial yaml keeps defaults for everything absent") {
    val cfg = PipelineConfigLoader.fromYaml(
      "transformation:\n  severity_weights:\n    death: 25\n")
    assert(cfg.severity.death == 25)
    assert(cfg.severity.serious == 2)
    assert(cfg.quality == PipelineConfig.default.quality)
    assert(cfg.storage == PipelineConfig.default.storage)
  }

  test("fromFile round-trips through disk") {
    val f = java.nio.file.Files.createTempFile("graft-config", ".yaml")
    java.nio.file.Files.write(f, referenceYaml.getBytes("UTF-8"))
    assert(PipelineConfigLoader.fromFile(f.toString) == PipelineConfig.default)
  }

  test("a re-tuned weight flows through FdaTransform's severity score") {
    val cfg = PipelineConfigLoader.fromYaml(
      "transformation:\n  severity_weights:\n    serious: 7\n    death: 100\n    hospitalization: 1\n")
    val df = Seq(("r1", "DrugA", "20240101", 1, 1, 0))
      .toDF("safetyreportid", "drug_name", "receivedate",
        "serious", "seriousnessdeath", "seriousnesshospitalization")
    val out = graft.etl.FdaTransform(df, cfg)
    assert(out.head().getAs[Long]("severity_score") == 107L)
    // same row under the defaults: 2 + 10 = 12
    assert(graft.etl.FdaTransform(df).head().getAs[Long]("severity_score") == 12L)
  }

  test("re-tuned storage and extraction yaml flows through the pipeline") {
    import java.nio.file.Files
    val cfg = PipelineConfigLoader.fromYaml(
      "storage:\n  raw_prefix: landing\n  processed_prefix: gold\n" +
        "extraction:\n  fda_limit: 3\n")
    assert(cfg.storage.rawPrefix == "landing")
    assert(cfg.extraction.fdaLimit == 3)

    // land event-shaped raw under the custom prefix, run, check layout
    val root = Files.createTempDirectory("graft-lake-prefix").toString
    val raw = Seq(
      ("""{"safetyreportid": "r1", "receivedate": "20240101", "drug_name": "A",""" +
        """ "serious": 1, "seriousnessdeath": 0, "seriousnesshospitalization": 0}"""),
      ("""{"safetyreportid": "r2", "receivedate": "20240101", "drug_name": "B",""" +
        """ "serious": 0, "seriousnessdeath": 0, "seriousnesshospitalization": 0}"""))
    val fdaDir = graft.io.Lake.rawPath(root, "fda", "2024-01-01", "landing")
    Files.createDirectories(java.nio.file.Paths.get(fdaDir).getParent)
    Files.write(java.nio.file.Paths.get(fdaDir), raw.mkString("\n").getBytes)
    val res = Pipeline.run(spark, root, "2024-01-01", cfg)
    assert(res.fdaCount == 2)
    // processed zone landed under the re-tuned prefix
    assert(res.processedPath.contains("/gold/"))
    assert(graft.io.Lake.exists(spark, res.processedPath))
  }

  test("malformed bin tables fail fast: gaps, overlaps, inverted rows") {
    def binsYaml(rows: String) =
      s"transformation:\n  age_groups:\n$rows"
    // gapped: 18 -> 21 skips [18, 21)
    val gap = intercept[IllegalArgumentException] {
      PipelineConfigLoader.fromYaml(binsYaml(
        "    - [0, 18, \"A\"]\n    - [21, 65, \"B\"]\n"))
    }
    assert(gap.getMessage.contains("contiguous"), gap.getMessage)
    // overlapping: [0,30) and [18,65) double-cover [18,30)
    val overlap = intercept[IllegalArgumentException] {
      PipelineConfigLoader.fromYaml(binsYaml(
        "    - [0, 30, \"A\"]\n    - [18, 65, \"B\"]\n"))
    }
    assert(overlap.getMessage.contains("contiguous"), overlap.getMessage)
    // inverted: hi <= lo
    val inv = intercept[IllegalArgumentException] {
      PipelineConfigLoader.fromYaml(binsYaml(
        "    - [0, 18, \"A\"]\n    - [18, 18, \"B\"]\n"))
    }
    assert(inv.getMessage.contains("inverted"), inv.getMessage)
  }

  test("orc format dispatch round-trips") {
    import java.nio.file.Files
    val p = Files.createTempDirectory("graft-orc").toString + "/t.orc"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    graft.io.Lake.writeAs(df, p, "orc")
    val back = graft.io.Lake.readAs(spark, p, "orc")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }
}
