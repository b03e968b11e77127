package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fakeMediaFromDocuments(spark,
    graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents"))

  test("media frame conforms to the binary+metadata schema contract") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(Seq("media_id", "kind", "width", "height", "sample_rate", "n_frames")
      .forall(s.fieldNames.contains))
    assert(media.count() > 0)
  }

  test("feature extraction: batched decode produces fixed-dim deterministic features") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    val rows = f1.collect()
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(r => r.n_bytes > 0))
    // determinism across runs (stub decoder is pure)
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) == r.feature.toSeq))
  }

  test("frame sampling stub: stride-spaced indexes bounded by n_frames") {
    import org.apache.spark.sql.functions._
    val sampled = Multimodal.sampleFrameIndexes(media, stride = 7)
    val bad = sampled.join(media, "media_id")
      .where(exists(col("frame_indexes"), i => i >= col("n_frames") || i % 7 =!= 0))
    assert(bad.isEmpty)
  }

  test("resize stub rewrites metadata, preserves payload") {
    val r = Multimodal.resizeStub(media, 224, 224)
    import org.apache.spark.sql.functions._
    assert(r.where(col("width") =!= 224 || col("height") =!= 224).isEmpty)
    assert(r.select(sum(length(col("payload")))).head().getLong(0) ==
      media.select(sum(length(col("payload")))).head().getLong(0))
  }
}
