package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParquetAuditSpec extends SparkSpec {
  import spark.implicits._

  test("footer audit: counts, nulls, and sizes from metadata only; sizing rollup") {
    val dir = java.nio.file.Files.createTempDirectory("paudit").toString
    try {
      // two files with known null densities
      Seq((1L, Some("a"), 10L), (2L, None, 20L), (3L, Some("c"), 30L))
        .toDF("id", "s", "v")
        .coalesce(1).write.parquet(s"$dir/t")
      val files = new java.io.File(s"$dir/t").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1)
      val audit = ParquetAudit.footerAudit(spark, s"$dir/t")
      val rows = audit.collect().map(r => r.getString(3) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
      assert(rows.keySet == Set("id", "s", "v"))
      // num_values counts ALL slots (incl. nulls at this level);
      // null_count comes from the statistics the writer recorded
      assert(rows("id")._1 == 3L && rows("id")._2 == 0L)
      assert(rows("s")._1 == 3L && rows("s")._2 == 1L, "one NULL in s")
      assert(rows.values.forall { case (_, _, comp, uncomp) =>
        comp > 0 && uncomp > 0 })
      // rollup: one file, one row group, floored compression percent
      val rep = ParquetAudit.fileSizingReport(audit).collect()
      assert(rep.length == 1 && rep(0).getLong(1) == 1L)
      val pct = rep(0).getLong(5)
      assert(pct >= 0,
        s"tiny files can exceed 100% after codec framing, but never negative: $pct")
      // the audit never reads data pages: rg_rows equals the row count
      assert(audit.select(max($"rg_rows")).collect()(0).getLong(0) == 3L)
    } finally { Lake.delete(spark, dir) }
  }

  test("footer audit parallelizes over files and skips non-parquet entries") {
    val dir = java.nio.file.Files.createTempDirectory("paudit2").toString
    try {
      spark.range(100).toDF("a").coalesce(1).write.parquet(s"$dir/m")
      spark.range(50).toDF("a").coalesce(1).write
        .mode("append").parquet(s"$dir/m")
      val audit = ParquetAudit.footerAudit(spark, s"$dir/m")
      assert(audit.select($"file").distinct().count() == 2)
      assert(audit.agg(sum($"num_values")).collect()(0).getLong(0) == 150L)
      // _SUCCESS and friends are ignored by the listing filter
      assert(audit.where(!$"file".endsWith(".parquet")).isEmpty)
    } finally { Lake.delete(spark, dir) }
  }
}
