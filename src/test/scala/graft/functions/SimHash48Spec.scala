package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class SimHash48Spec extends SparkSpec {
  import spark.implicits._

  test("mix48 twin matches Dedup.mix48Jvm on boundary and random values") {
    val rng = new scala.util.Random(7)
    val vals = Seq(0L, 1L, (1L << 48) - 1, 1L << 47, 123456789L) ++
      Seq.fill(1000)(rng.nextLong().abs % (1L << 48))
    vals.foreach { v =>
      assert(SimHash48.mix48(v) == Dedup.mix48Jvm(v), s"mix48($v)")
    }
  }

  test("fused SimHash48 is bit-identical to the staged HOF pipeline") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "one two", "a a a a a", "héllo wörld ünïcode",
      "  spaced   tokens  ", "")
    val df = samples.toDF("text").select(
      SimHash48.simhash48(TextFunctions.distinctTokens($"text")).as("fused"),
      Dedup.simhash($"text").as("hof"))
    df.collect().zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '$s'")
    }
  }

  test("parity on the real corpus + empty tokens → 0") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs.select(
        SimHash48.simhash48(TextFunctions.distinctTokens($"text")).as("fused"),
        Dedup.simhash($"text").as("hof"))
      .where($"fused" =!= $"hof").count()
    assert(mismatches == 0)
    val empty = Seq(Seq.empty[String]).toDF("toks")
      .select(SimHash48.simhash48($"toks")).collect()
    assert(empty.head.getLong(0) == 0L)
  }
}
