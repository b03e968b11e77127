package graft.ops

import graft.io.Lake
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The shared seq-tombstone / liveness / partition-pruning discipline
  * of the four persisted index families ([[graft.dedup.LshDiskIndex]],
  * [[graft.dedup.PhashDiskIndex]], [[graft.text.Bm25DiskIndex]],
  * [[graft.ann.IvfIndex]]) — one implementation, thin per-family
  * adapters (each family keeps its own layout, probe semantics, and
  * meta shape; what they share is exactly this):
  *
  *  - standing files are IMMUTABLE; "delete" is an (id, seq) marker
  *    under dir/tombstones (the Lucene delete-bitmap discipline)
  *  - a row is LIVE iff its ingest seq is >= every tombstone seq for
  *    its id — so a changed document retires and re-appends under the
  *    SAME seq (old rows die, new rows live); duplicate markers fold
  *    in the per-id max, making retire idempotent per seq
  *  - a fresh write IS compaction: earlier tombstones refer to rows
  *    that no longer exist and must not kill the new increment's rows
  *  - probes prune their read to a partition footprint by filtering
  *    the RAW inferred partition columns (int after a partitioned
  *    write, long on a fresh frame), so pruning engages at the file
  *    listing — the isin set is a superset of the exact footprint;
  *    exactness is the downstream equi-join's job. */
private[graft] object IndexLifecycle {

  /** Append (id, seq) tombstone markers killing every indexed row of
    * those ids whose ingest seq is STRICTLY below `seq`. */
  def writeTombstones(ids: DataFrame, idCol: String, dir: String,
      seq: Long): Unit =
    ids.select(col(idCol).cast("long").as("id"), lit(seq).as("seq"))
      .write.mode(SaveMode.Append).option("compression", "snappy")
      .parquet(s"$dir/tombstones")

  /** A fresh write is compaction: drop the marker set entirely. */
  def clearTombstones(spark: SparkSession, dir: String): Unit =
    Lake.delete(spark, s"$dir/tombstones")

  /** Max tombstone seq per retired id, or None when nothing was ever
    * retired. Small by construction (bounded by the retired doc
    * count); AQE broadcasts the live-filter join when it is. */
  def deadSeqs(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!Lake.exists(spark, s"$dir/tombstones")) None
    else Some(Lake.readParquet(spark, s"$dir/tombstones")
      .groupBy(col("id")).agg(max(col("seq")).as("dead_seq")))

  /** Drop rows killed by tombstones: live iff no tombstone for the id,
    * or the row's ingest seq is >= the newest tombstone seq. Expects
    * `rows` to carry (id, seq). */
  def liveOnly(rows: DataFrame, dead: Option[DataFrame]): DataFrame =
    dead.fold(rows)(d => rows.join(d, Seq("id"), "left")
      .where(col("dead_seq").isNull || col("seq") >= col("dead_seq"))
      .drop("dead_seq"))

  /** Distinct retired ids — the compaction trigger's numerator. */
  def tombstoneCount(spark: SparkSession, dir: String): Long =
    if (!Lake.exists(spark, s"$dir/tombstones")) 0L
    else Lake.readParquet(spark, s"$dir/tombstones")
      .select(col("id")).distinct().count()

  /** Every listed subdir must exist or the index is not one. */
  def requireParts(spark: SparkSession, dir: String, parts: Seq[String],
      what: String): Unit =
    require(parts.forall(p => Lake.exists(spark, s"$dir/$p")),
      s"no $what at '$dir' (missing ${parts.map(_ + "/").mkString(" or ")})")

  /** The single distinct meta row of an increment chain, validated
    * consistent (mixed shapes would silently miss candidates — loud
    * instead). One bounded collect. */
  def singleMetaRow(spark: SparkSession, dir: String, cols: Seq[String],
      what: String): org.apache.spark.sql.Row = {
    val rows = Lake.readParquet(spark, s"$dir/meta")
      .select(cols.map(col): _*).distinct().collect()
    require(rows.length == 1,
      s"$what at '$dir' mixes ${rows.length} distinct configs — rebuild required")
    rows(0)
  }

  /** isin literals matched to the RAW column's inferred type: a
    * partitioned write reads back int partition columns, a fresh
    * in-memory frame carries long. */
  def partitionLits(raw: DataFrame, c: String, vs: Seq[Long]): Seq[Any] =
    raw.schema(c).dataType match {
      case org.apache.spark.sql.types.IntegerType => vs.map(_.toInt)
      case _ => vs
    }

  /** Read a (band, bucket)-partitioned frame restricted to a probe
    * footprint, partition columns restored to long. */
  def prunedBandBucket(spark: SparkSession, path: String,
      bandIds: Seq[Long], buckets: Seq[Long]): DataFrame = {
    val raw = Lake.readParquet(spark, path)
    raw.where(col("band").isin(partitionLits(raw, "band", bandIds): _*) &&
        col("bucket").isin(partitionLits(raw, "bucket", buckets): _*))
      .withColumn("band", col("band").cast("long"))
      .withColumn("bucket", col("bucket").cast("long"))
  }
}
