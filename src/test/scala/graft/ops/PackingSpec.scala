package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-packing invariants: the stream form (concat-and-split) against
  * a driver-side replay of the shuffle order, and the greedy form's
  * capacity/contiguity/no-split contract. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64L

  // 60 docs with assorted token counts, including one oversized (n > B)
  // and one empty
  private lazy val docs = (
    (1 to 58).map(i => (i.toLong, (i * 7 % 50 + 1).toLong)) :+
      (59L, 0L) :+ (60L, B + 37L)
  ).toDF("doc_id", "n")

  test("stream packing: (bin_id, bin_pos) is exactly the exclusive cumsum of the shuffle order") {
    val packed = ScaleOps.packTokenStream(docs, "doc_id", "n", B)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // driver replay: shuffle order is (mix48(polyHash(id)), id)
    val order = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) =>
        (graft.functions.SimHash48.mix48(
          graft.functions.PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(id.toString), 1L << 48)), id)
      }
    var excl = 0L
    for ((id, n) <- order) {
      assert(packed(id) == (excl / B, excl % B), s"doc $id at excl=$excl")
      excl += n
    }
    assert(excl == docs.agg(sum($"n")).head().getLong(0)) // tokens conserved
  }

  test("span table: windows tile exactly, documents reconstruct, stream parity") {
    val spans = ScaleOps.packTokenSpans(docs, "doc_id", "n", B)
      .select($"doc_id", $"bin_id", $"bin_start", $"doc_off", $"span_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = docs.agg(sum($"n")).head().getLong(0)
    val lastBin = (total - 1) / B
    // every window except the last is tiled EXACTLY: bin_starts are the
    // prefix sums of span_tokens and they sum to B
    for ((bin, rows) <- spans.groupBy(_._2)) {
      val sorted = rows.sortBy(_._3)
      var at = 0L
      sorted.foreach { r =>
        assert(r._3 == at, s"bin $bin: span at ${r._3}, tiling expects $at")
        assert(r._5 > 0, s"bin $bin: zero-width span for doc ${r._1}")
        at += r._5
      }
      if (bin < lastBin) assert(at == B, s"bin $bin covers $at of $B tokens")
      else assert(at == total - lastBin * B)
    }
    // each document reconstructs: doc_offs contiguous from 0, widths sum
    // to its token count; zero-width docs emit no span
    val byDoc = spans.groupBy(_._1)
    for ((id, n) <- docs.collect().map(r => (r.getLong(0), r.getLong(1)))) {
      if (n == 0) assert(!byDoc.contains(id), s"doc $id: zero-width span emitted")
      else {
        val parts = byDoc(id).sortBy(_._4)
        assert(parts.head._4 == 0L && parts.map(_._5).sum == n, s"doc $id")
        parts.sliding(2).foreach {
          case Array(a2, b2) => assert(a2._4 + a2._5 == b2._4, s"doc $id gap")
          case _ => ()
        }
        // consecutive spans land in consecutive windows
        parts.sliding(2).foreach {
          case Array(a2, b2) => assert(a2._2 + 1 == b2._2, s"doc $id windows")
          case _ => ()
        }
      }
    }
    // parity with the stream pack: each doc's FIRST span is at the q55
    // (bin_id, bin_pos)
    val stream = ScaleOps.packTokenStream(docs, "doc_id", "n", B)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    for ((id, rows) <- byDoc) {
      val first = rows.minBy(_._2)
      assert(stream(id) == (first._2, first._3), s"doc $id stream parity")
    }
  }

  test("stream packing is deterministic across reruns and repartitionings") {
    val a = ScaleOps.packTokenStream(docs, "doc_id", "n", B).collect().toSet
    val b = ScaleOps.packTokenStream(docs.repartition(7), "doc_id", "n", B)
      .collect().toSet
    assert(a == b)
  }

  test("greedy packing: capacity, contiguity, no-split, and order preservation") {
    val out = ScaleOps.packGreedyContiguous(docs, "doc_id", "n", B, numBuckets = 4)
      .select($"doc_id", $"n", $"pack_bucket", $"pack_bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 60) // every doc packed exactly once, none split
    val byBin = out.groupBy(r => (r._3, r._4))
    for (((bkt, bin), members) <- byBin) {
      val tot = members.map(_._2).sum
      // a bin exceeds capacity only as a single oversized document
      assert(tot <= B || members.length == 1,
        s"bin ($bkt,$bin) holds $tot tokens across ${members.length} docs")
    }
    // bins are contiguous 0..max within each bucket
    for ((bkt, members) <- out.groupBy(_._3)) {
      val bins = members.map(_._4).distinct.sorted.toSeq
      assert(bins == (0L until bins.length.toLong), s"bucket $bkt bins: $bins")
    }
  }

  test("greedy packing equals a driver-side sequential first-fit replay") {
    val got = ScaleOps.packGreedyContiguous(docs, "doc_id", "n", B, numBuckets = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("pack_bucket"), r.getAs[Long]("pack_bin"))).toMap
    val width = ((1L << 48) + 3) / 4
    val byBucket = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, n) =>
        val h = graft.functions.SimHash48.mix48(
          graft.functions.PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(id.toString), 1L << 48))
        (h / width, h, id, n)
      }.groupBy(_._1)
    for ((bkt, rows) <- byBucket) {
      var bin = 0L; var fill = 0L; var first = true
      for ((_, _, id, n) <- rows.sortBy(r => (r._2, r._3))) {
        if (first) { first = false; fill = n }
        else if (fill + n <= B) fill += n
        else { bin += 1; fill = n }
        assert(got(id) == (bkt, bin), s"doc $id in bucket $bkt")
      }
    }
  }
}
