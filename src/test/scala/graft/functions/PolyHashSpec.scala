package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("fused PolyHash is bit-identical to the HOF fold") {
    val samples = Seq(
      "", "a", "Z", "hello world", "  padded  ", "héllo wörld", "日本語のテキスト",
      "mixed ascii y ñ and 中文", "a" * 500, "punct.,;:!?-chars",
      "0", "499", "1234567890")
    for (mod <- Seq(1L << 31, 1L << 40, 1L << 48)) {
      val df = samples.toDF("s").select(
        TextFunctions.polyHash($"s", mod).as("fused"),
        TextFunctions.polyHashHof($"s", mod).as("hof"))
      val rows = df.collect()
      rows.zip(samples).foreach { case (r, s) =>
        assert(r.getLong(0) == r.getLong(1),
          s"mismatch for '$s' mod $mod: fused=${r.getLong(0)} hof=${r.getLong(1)}")
      }
    }
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.polyHash($"s", 1L << 40)).collect()
    assert(n.head.isNullAt(0))
    // parity on the real corpus: every 3-gram shingle of every document
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val sh = docs.select(TextFunctions.tokens($"text").as("ts"))
      .select(explode(TextFunctions.wordShinglesFrom($"ts", 3)).as("s"))
    val mismatches = sh.select(
        TextFunctions.polyHash($"s", 1L << 31).as("fused"),
        TextFunctions.polyHashHof($"s", 1L << 31).as("hof"))
      .where($"fused" =!= $"hof").count()
    assert(mismatches == 0)
  }
}
