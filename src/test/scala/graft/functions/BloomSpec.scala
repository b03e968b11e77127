package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate near the classical bound") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val setBits = Bloom.bits(docs, "text").as[Long].collect().toSet
    assert(setBits.forall(b => b >= 0 && b < Bloom.MBits))
    val texts = docs.select($"text").as[String].collect()
    // every inserted key passes
    assert(texts.forall(t => Bloom.mightContain(setBits, t)))
    // false positives on keys never inserted, vs (1 - e^{-Kn/M})^K
    val n = texts.toSet.size
    val theory = math.pow(1 - math.exp(-Bloom.K.toDouble * n / Bloom.MBits), Bloom.K)
    val probes = (0 until 2000).map(i => s"absent-key-$i")
    val fp = probes.count(k => Bloom.mightContain(setBits, k)).toDouble / probes.size
    info(f"fp rate $fp%.4f vs theory $theory%.4f (n=$n, m=${Bloom.MBits}, k=${Bloom.K})")
    assert(fp <= theory * 2 + 0.02, s"false-positive rate $fp far above theory $theory")
  }

  test("filters merge by UNION DISTINCT") {
    val docs = graft.queries.Queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val whole = Bloom.bits(docs, "text").as[Long].collect().toSet
    val a = Bloom.bits(docs.where(pmod($"doc_id", lit(2)) === 0), "text")
    val b = Bloom.bits(docs.where(pmod($"doc_id", lit(2)) === 1), "text")
    val merged = a.unionByName(b).distinct().as[Long].collect().toSet
    assert(merged == whole)
  }
}
