package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("fused WordShingles is string-identical to the HOF pipeline") {
    val samples = Seq(
      "one two three four five", "one two three", "one two", "solo",
      "  padded   tokens  here ", "héllo wörld ünïcode tøkens", "")
    for (k <- Seq(1, 2, 3, 5)) {
      val df = samples.toDF("text")
        .select(TextFunctions.tokens($"text").as("toks"))
        .select(
          TextFunctions.wordShinglesFrom($"toks", k).as("fused"),
          TextFunctions.wordShinglesFromHof($"toks", k).as("hof"))
      df.collect().zip(samples).foreach { case (r, s) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k text='$s'")
      }
    }
  }

  test("parity on the real corpus and null input propagates") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(TextFunctions.tokens($"text").as("toks"))
    for (k <- Seq(2, 3)) {
      val mismatches = toks.select(
          TextFunctions.wordShinglesFrom($"toks", k).as("fused"),
          TextFunctions.wordShinglesFromHof($"toks", k).as("hof"))
        .where($"fused" =!= $"hof").count()
      assert(mismatches == 0, s"k=$k")
    }
    val n = Seq[Option[Seq[String]]](None).toDF("toks")
      .select(TextFunctions.wordShinglesFrom($"toks", 3)).collect()
    assert(n.head.isNullAt(0))
  }
}
