package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-lake IO — parity with `/root/reference/src/loaders/s3_loader.py`
  * re-expressed over the Hadoop FileSystem API, so the same code serves
  * `file://` in tests and `s3a://` on a cluster (S3A replaces boto3;
  * committers handle the multipart/atomic-rename concerns the reference's
  * `io.BytesIO` buffering papers over).
  *
  * Missing-path contract (s3_loader.py:90-118, 149-177): reads of absent
  * keys return an EMPTY frame (schema-stable when a schema is supplied)
  * instead of raising — pipeline branches probe emptiness downstream.
  */
object Lake {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def emptyDf(spark: SparkSession, schema: Option[StructType]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema.getOrElse(StructType(Nil)))

  /** JSON read handling both layouts: the reference's raw zone holds a
    * single JSON *array* document per partition (s3_loader.py:64-88
    * `json.dumps(records)`) → needs multiLine; Spark-written JSON is
    * NDJSON → must NOT use multiLine. Autodetect on the first byte. */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    if (!exists(spark, path)) emptyDf(spark, schema)
    else {
      val multi = isJsonArray(spark, path)
      val r0 = spark.read.option("multiLine", multi)
      schema.fold(r0.json(path))(s => r0.schema(s).json(path))
    }

  private def isJsonArray(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).find(s => s.isFile && s.getLen > 0).map(_.getPath)
      else Some(p)
    file.exists { f =>
      val in = fs.open(f)
      try {
        var c = in.read()
        while (c != -1 && Character.isWhitespace(c)) c = in.read()
        c == '['
      } finally in.close()
    }
  }

  def readParquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    if (!exists(spark, path)) emptyDf(spark, schema) else spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    if (!exists(spark, path)) emptyDf(spark, None)
    else spark.read.option("header", true).option("inferSchema", true).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Snappy parquet, matching storage.format (pipeline_config.yaml:73-78). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(path)

  /** K6 object utilities over Hadoop FileSystem (s3_loader.py:207-294). */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).toSeq.sorted
  }

  def delete(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  def size(spark: SparkSession, path: String): Option[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(fs.getFileStatus(p).getLen) else None
  }

  /** Hive-style raw-zone partition path (drug_transformer.py:72-90). */
  def rawPath(root: String, source: String, date: String,
      prefix: String = "raw"): String = {
    val Array(y, m, d) = date.split("-")
    s"$root/$prefix/$source/year=$y/month=$m/day=$d/data.json"
  }

  def processedPath(root: String, date: String, leaf: String,
      prefix: String = "processed"): String = {
    val Array(y, m, d) = date.split("-")
    s"$root/$prefix/year=$y/month=$m/day=$d/$leaf"
  }

  /** Format-dispatched IO so the yaml `storage:` section's formats are
    * honored without per-format call sites. */
  def writeAs(df: DataFrame, path: String, format: String): Unit = format match {
    case "parquet" => writeParquet(df, path)
    case "json" => writeJson(df, path)
    case "csv" => writeCsv(df, path)
    case "orc" => df.write.mode("overwrite").orc(path)
    case other => throw new IllegalArgumentException(s"unsupported format '$other'")
  }

  def readAs(spark: SparkSession, path: String, format: String): DataFrame = format match {
    case "parquet" => readParquet(spark, path)
    case "json" => readJson(spark, path)
    case "csv" => readCsv(spark, path)
    case "orc" => if (exists(spark, path)) spark.read.orc(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType())
    case other => throw new IllegalArgumentException(s"unsupported format '$other'")
  }
}
