package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class ShingleFpsSpec extends SparkSpec {
  import spark.implicits._

  test("fused ShingleFps is bit-identical to the staged HOF pipeline") {
    val samples = Seq(
      "one two three four five", // n > k
      "one two three",           // n == k
      "one two",                 // 0 < n < k → single whole-doc fp
      "solo",                    // n == 1
      "   spaced    out   tokens   here ",
      "repeated repeated repeated repeated",
      "héllo wörld ünïcode tøkens",
      "")                        // no tokens → empty fp array
    val df = samples.toDF("text")
      .select(TextFunctions.tokens($"text").as("toks"))
      .select(
        ShingleFps.shingleFps($"toks", 3).as("fused"),
        graft.dedup.Dedup.shingleFpsHof($"toks", 3).as("hof"))
    df.collect().zip(samples).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for '$s'")
    }
  }

  test("parity on the real corpus at every window size") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(TextFunctions.tokens($"text").as("toks"))
    for (k <- Seq(1, 2, 3, 5)) {
      val mismatches = toks.select(
          ShingleFps.shingleFps($"toks", k).as("fused"),
          graft.dedup.Dedup.shingleFpsHof($"toks", k).as("hof"))
        .where($"fused" =!= $"hof").count()
      assert(mismatches == 0, s"k=$k")
    }
  }

  test("fp range stays within 40 bits and null input propagates") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val outOfRange = docs
      .select(TextFunctions.tokens($"text").as("toks"))
      .select(explode(ShingleFps.shingleFps($"toks", 3)).as("fp"))
      .where($"fp" < 0 || $"fp" >= (1L << 40)).count()
    assert(outOfRange == 0)
    val n = Seq[Option[Seq[String]]](None).toDF("toks")
      .select(ShingleFps.shingleFps($"toks", 3)).collect()
    assert(n.head.isNullAt(0))
  }
}
