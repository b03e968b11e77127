package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RotationSpec extends SparkSpec {
  import spark.implicits._

  test("Hadamard rotation is orthogonal: involution and dot preservation") {
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => (math.sin(i * 0.7) * 3).toFloat)),
      (2L, Array.tabulate(64)(i => ((i % 9) - 4).toFloat)),
      (3L, Array.fill(64)(0f)),
      (4L, Array.tabulate(64)(i => if (i == 5) 1f else 0f)))
      .toDF("id", "v")
    val once = vecs.select($"id", $"v",
      Rotation.hadamard($"v", 64).as("r1"))
    // involution: the normalized Hadamard is its own inverse —
    // applying it twice returns the original up to float rounding
    val twice = once.select($"id", $"v",
        Rotation.hadamard($"r1", 64).as("r2"))
      .collect()
    for (row <- twice) {
      val v = row.getSeq[Float](row.fieldIndex("v"))
      val r2 = row.getSeq[Double](row.fieldIndex("r2"))
      val maxDiff = v.zip(r2).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-4, s"id ${row.getLong(0)}: involution drift $maxDiff")
    }
    // isometry: pairwise dots are preserved (the property that makes
    // rotated-PQ recall comparable against the raw brute baseline)
    val rows = once.collect().map(r =>
      r.getSeq[Float](r.fieldIndex("v")).map(_.toDouble) ->
        r.getSeq[Double](r.fieldIndex("r1")))
    for (Seq((a, ra), (b, rb)) <- rows.toSeq.combinations(2)) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val rdot = ra.zip(rb).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - rdot) < 1e-6 * (1 + math.abs(dot)),
        s"dot $dot vs rotated $rdot")
    }
    // a basis vector spreads to ALL coordinates at magnitude 1/8 —
    // the variance-spreading that motivates the preprocessing
    val spread = once.where($"id" === 4L)
      .select($"r1").collect().head.getSeq[Double](0)
    assert(spread.forall(x => math.abs(math.abs(x) - 0.125) < 1e-12),
      "a one-hot vector must spread to +-1/8 everywhere")
  }

  test("rejects non-square-power dims") {
    intercept[IllegalArgumentException] {
      Rotation.hadamard(lit(Array(1f, 2f)), 2)
    }
    intercept[IllegalArgumentException] {
      Rotation.hadamard(lit(Array.fill(32)(1f)), 32) // power of 2, root not integer
    }
  }
}
