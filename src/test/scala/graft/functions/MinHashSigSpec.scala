package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Dedup.MinHashConfig(numHashes = 64, shingleSize = 3, bands = 16)

  test("fused MinHashSig is bit-identical to the staged HOF signature on the real corpus") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val shs = docs
      .select(TextFunctions.tokens($"text").as("toks"))
      .select(array_distinct(TextFunctions.wordShinglesFrom($"toks", 3)).as("shingles"))
      .select(transform($"shingles", s => TextFunctions.polyHash(s, 1L << 31)).as("shs"))
    val mismatches = shs.select(
        MinHashSig.minhashSig($"shs", cfg.numHashes).as("fused"),
        Dedup.signatureFromHof($"shs", cfg).as("hof"))
      .where($"fused" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("signature range, empty -> null, null -> null, and prefix stability") {
    val vals = Seq(Seq(1L, 2L, 3L), Seq(0L), Seq((1L << 31) - 1)).toDF("shs")
    val sigs = vals.select(MinHashSig.minhashSig($"shs", 64).as("sig"))
      .collect().map(_.getSeq[Long](0))
    sigs.foreach { s =>
      assert(s.length == 64)
      assert(s.forall(v => v >= 0 && v < (1L << 40)))
    }
    val empty = Seq(Seq.empty[Long]).toDF("shs")
      .select(MinHashSig.minhashSig($"shs", 64)).collect()
    assert(empty.head.isNullAt(0))
    val nul = Seq[Option[Seq[Long]]](None).toDF("shs")
      .select(MinHashSig.minhashSig($"shs", 64)).collect()
    assert(nul.head.isNullAt(0))
    // hashParams(n) is a prefix of hashParams(m) for n < m, so a 32-hash
    // signature must equal the first 32 entries of the 64-hash one
    val both = Seq(Seq(5L, 99L, 1234L)).toDF("shs").select(
      MinHashSig.minhashSig($"shs", 32).as("s32"),
      MinHashSig.minhashSig($"shs", 64).as("s64")).head()
    assert(both.getSeq[Long](0) == both.getSeq[Long](1).take(32))
  }

  test("SQL-surface hardening: null elements poison, out-of-range hashes fail fast") {
    GraftExtensions.registerAll(spark)
    // null element -> null signature (matches the staged form's null min)
    val withNull = spark.sql("SELECT minhash_sig(array(5L, CAST(NULL AS BIGINT)), 8) AS s")
      .collect()
    assert(withNull.head.isNullAt(0))
    // a 40-bit input (e.g. shingle_fps output) would overflow a*h — the
    // guard rejects it instead of returning silently-wrong minima
    val e = intercept[Exception] {
      spark.sql(s"SELECT minhash_sig(array(${1L << 40}L), 8)").collect()
    }
    assert(messages(e).exists(_.contains("31-bit")), e.toString)
  }
}
