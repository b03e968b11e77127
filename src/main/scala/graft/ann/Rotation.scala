package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structured orthogonal rotation for PQ preprocessing — the OPQ-lite
  * step FAISS applies before product quantization: a normalized
  * Sylvester-Hadamard rotation spreads per-dimension variance evenly
  * across the m subspaces, so no codebook starves on a low-energy
  * block of the embedding. H(i,j) = (−1)^popcount(i AND j) / √d; for
  * d = 64 the scale 1/8 is a power of two, so every matrix entry is
  * EXACT in binary floating point and the rotation replays
  * bit-identically in the DuckDB oracle (left-to-right sums, the
  * engine's cross-engine float discipline). Expression-only: batch ==
  * streaming == the oracle, no UDF, no shuffle. */
object Rotation {

  /** Rotate an embedding column (array of float/double, length `dim`)
    * by the normalized Hadamard matrix. `dim` must be a power of two
    * with an integer square root (… 16, 64, 256) so the 1/√d scale is
    * a power of two — exactness is the contract here, not an
    * approximation. */
  def hadamard(vec: Column, dim: Int): Column = {
    val root = math.sqrt(dim.toDouble)
    require((dim & (dim - 1)) == 0 && root == math.floor(root),
      s"hadamard: dim must be a power of two with an integer square " +
        s"root (16/64/256/...), got $dim")
    transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (v, i) =>
          when(call_function("bit_count", i.bitwiseAND(j)) % 2 === 0,
            v.cast("double")).otherwise(-v.cast("double"))),
        lit(0.0d), (acc, x) => acc + x) / lit(root))
  }
}
