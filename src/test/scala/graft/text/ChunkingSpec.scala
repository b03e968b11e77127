package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(TextFunctions.tokens($"text").as("toks"))
      .select(TextFunctions.tokenChunksFrom($"toks", size, stride).as("c"))
      .head().getSeq[String](0)

  test("token chunking: overlap, tail, partition, and edge cases") {
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    // size 5, stride 2: starts 1,3,5,7 — overlapping windows, tail ends at 10
    assert(chunksOf(ten, 5, 2) == Seq(
      "t1 t2 t3 t4 t5", "t3 t4 t5 t6 t7", "t5 t6 t7 t8 t9", "t7 t8 t9 t10"))
    // stride == size: exact partition with a short tail
    assert(chunksOf(ten, 4, 4) == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    // doc shorter than one window: single short chunk
    assert(chunksOf("a b c", 5, 5) == Seq("a b c"))
    // empty doc: no chunks
    assert(chunksOf("   ", 5, 5) == Seq.empty)
  }

  test("every token is covered exactly ceil((pos-size)/stride)+1-consistent times on the real corpus") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val (winSize, stride) = (32, 16)
    val chunked = docs
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").as("n"),
        TextFunctions.tokenChunksFrom($"toks", winSize, stride).as("chunks"))
    val rows = chunked.select($"doc_id", $"n",
        transform($"chunks", c => size(TextFunctions.tokens(c))).as("lens"))
      .collect()
    rows.foreach { r =>
      val n = r.getInt(1)
      val lens = r.getSeq[Int](2)
      // total coverage: sum of chunk lengths == n + overlap·(chunks−1)
      // for full windows; with a short tail the invariant is that chunk
      // starts advance by stride and the last chunk ends exactly at n
      if (n > 0) {
        assert(lens.init.forall(_ == winSize) || lens.length == 1,
          s"non-final chunk must be full: $lens (n=$n)")
        val lastStart = (lens.length - 1) * stride + 1
        assert(lastStart + lens.last - 1 == n,
          s"last chunk must end at the last token: $lens (n=$n)")
      } else assert(lens.isEmpty)
    }
  }
}
