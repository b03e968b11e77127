package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-health audit from parquet FOOTERS only — the row-group/column
  * metadata a storage engineer actually tunes against: row-group
  * sizing (too small → per-group overhead, too big → no parallelism),
  * per-column compressed/uncompressed bytes (compression ratio,
  * encoding wins), and null density — all WITHOUT touching a single
  * data page. The audit is the precondition for every "is
  * maxPartitionBytes right / which column dominates storage / did the
  * writer produce a small-files mess" question this codebase's SCALE
  * notes reason about.
  *
  * Scale shape: the file LIST is driver-side (bounded — it is a
  * listing, not data) and parallelizes across the cluster; each task
  * opens only the footers of its files (ParquetFileReader reads the
  * tail metadata block). 100 TB of lake is typically millions of
  * files — the audit output is files × row-groups × columns rows,
  * itself a small frame that the usual aggregations (per-table sizing
  * reports) reduce further.
  *
  * Cross-engine: the numbers come from the SAME footer bytes DuckDB's
  * `parquet_metadata()` reads, so the q126 oracle replays this audit
  * byte-for-byte — a genuinely independent decoder of the same
  * artifact. */
object ParquetAudit {

  /** Footer audit of every `.parquet` file under `path` (one level —
    * lake layouts that nest use the partition-dir variant of their
    * reader). Output, one row per (file, row group, column):
    * (file, row_group_id, rg_rows, col_path, num_values, null_count,
    * compressed_bytes, uncompressed_bytes, codec); `file` is the base
    * name (scheme-independent), `null_count` is -1 when the writer
    * recorded no statistics. */
  def footerAudit(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    val parts = math.max(1, math.min(files.length,
      spark.sessionState.conf.numShufflePartitions))
    spark.createDataset(files.toSeq).repartition(parts)
      .mapPartitions { it =>
        // task-local Configuration: the driver's Hadoop conf is not
        // serializable; default conf resolves file:// and (via
        // classpath core-site) cluster filesystems identically
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val base = f.substring(f.lastIndexOf('/') + 1)
            val blocks = r.getFooter.getBlocks
            (0 until blocks.size()).flatMap { gi =>
              val bg = blocks.get(gi)
              val cols = bg.getColumns
              (0 until cols.size()).map { ci =>
                val cc = cols.get(ci)
                val nulls =
                  if (cc.getStatistics == null || !cc.getStatistics.isNumNullsSet) -1L
                  else cc.getStatistics.getNumNulls
                (base, gi.toLong, bg.getRowCount, cc.getPath.toDotString,
                  cc.getValueCount, nulls, cc.getTotalSize,
                  cc.getTotalUncompressedSize, cc.getCodec.name)
              }
            }
          } finally r.close()
        }
      }
      .toDF("file", "row_group_id", "rg_rows", "col_path", "num_values",
        "null_count", "compressed_bytes", "uncompressed_bytes", "codec")
  }

  /** Per-file rollup of [[footerAudit]] — the sizing report: row-group
    * count and row/byte totals plus the floored-percent compression
    * ratio (all integers, order-independent). */
  def fileSizingReport(audit: DataFrame): DataFrame =
    audit.groupBy(col("file"))
      .agg(
        countDistinct(col("row_group_id")).as("n_row_groups"),
        max(col("rg_rows")).as("max_rg_rows"),
        sum(col("compressed_bytes")).as("compressed_bytes"),
        sum(col("uncompressed_bytes")).as("uncompressed_bytes"))
      .withColumn("compressed_pct",
        expr("(100 * compressed_bytes) div uncompressed_bytes"))
}
