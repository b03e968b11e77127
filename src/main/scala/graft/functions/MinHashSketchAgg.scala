package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Typed aggregator building a group-level MinHash signature: each input
  * row contributes its (31-bit positive) shingle hashes; the buffer keeps
  * the element-wise minimum under `numHashes` fixed permutations.
  *
  * MinHash's defining property — min distributes over set union — makes
  * this a true sketch: sig(A ∪ B) = elementwise-min(sig(A), sig(B)), so
  * partial aggregation (map-side combine) is exact, the merge is
  * commutative/associative, and the shuffle carries `numHashes` longs per
  * group regardless of group size. Signature agreement fraction estimates
  * the Jaccard similarity between two groups' shingle sets (e.g. "how
  * similar are two crawl sources' vocabularies") without ever holding
  * either set.
  *
  * Uses the same deterministic hash family as dedup.Dedup, so sketches
  * and per-document signatures are comparable.
  */
class MinHashSketchAgg(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val params = graft.dedup.Dedup.hashParamsPublic(numHashes)
  private val mod = 1L << 40

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHashes: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val (a, b) = params(i)
      var m = buf(i)
      val it = shingleHashes.iterator
      while (it.hasNext) {
        val h = (a * it.next() + b) % mod
        if (h < m) m = h
      }
      buf(i) = m
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  /** A group whose inputs were all EMPTY hash sets never updated the
    * buffer: its "signature" would be 64 Long.MaxValue sentinels, and two
    * such empty vocabularies would agree on every position — estimated
    * Jaccard 1.0 for sets with nothing in them. Finish such groups as
    * null so consumers drop them (the q37 oracle has no row for an
    * empty vocabulary either). */
  override def finish(buf: Array[Long]): Seq[Long] =
    if (buf.forall(_ == Long.MaxValue)) null else buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashSketchAgg {
  /** Column aggregate: input column must be array<long> of 31-bit
    * positive shingle hashes (see Dedup's shingle hashing). */
  def minhashSketch(shingleHashes: Column, numHashes: Int = 64): Column = {
    implicit val inEnc: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    org.apache.spark.sql.functions.udaf(new MinHashSketchAgg(numHashes))
      .apply(shingleHashes)
  }

  /** Estimated Jaccard similarity from two signatures. */
  def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
}
