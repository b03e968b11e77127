package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature from a shingle-hash array — the fused form
  * of `numHashes` separate `array_min(transform(shs, h -> (a_i*h + b_i)
  * mod 2^40))` expressions (dedup/Dedup.scala signatureFrom). Each of
  * those is an interpreted CodegenFallback pass over the array; this is
  * one loop computing all `n` minima per element — n·|shs| fused
  * multiply-adds, no per-element lambda dispatch, no intermediate
  * arrays. The (a, b) parameters come from the same deterministic
  * xorshift generator as the staged form and the DuckDB oracle
  * (Dedup.hashParams via the provider registered at class init), so
  * signatures are bit-identical (MinHashSigSpec proves parity).
  *
  * Empty input → null signature, matching the staged form (array_min of
  * an empty array is null, so its signature is an array of nulls that
  * erases the row at the band fold exactly as a null signature does).
  * Null input → null.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.MinHashSig.sig"
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $f($a, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private final val Mod40 = 1L << 40

  /** (a_i, b_i) pairs; populated lazily from Dedup.hashParams via
    * reflectionless call — kept in a plain array for the generated code. */
  @volatile private var params: Array[Long] = Array.emptyLongArray

  private def ensureParams(n: Int): Array[Long] = {
    var p = params
    if (p.length < 2 * n) synchronized {
      p = params
      if (p.length < 2 * n) {
        val pairs = graft.dedup.Dedup.hashParamsPublic(n)
        p = new Array[Long](2 * n)
        var i = 0
        pairs.foreach { case (a, b) => p(2 * i) = a; p(2 * i + 1) = b; i += 1 }
        params = p
      }
    }
    p
  }

  /** Shared by interpreted eval and generated code. Returns null for an
    * empty array or a null element (the staged form's array_min over
    * empty/null-bearing input is null). Inputs must be 31-bit shingle
    * hashes — (a·h + b) with 31-bit a,b stays below 2^62, but a 40-bit
    * input (e.g. shingle_fps output composed via SQL) would overflow a
    * Long and produce silently-wrong signatures, so out-of-range values
    * fail fast instead. */
  def sig(shs: ArrayData, numHashes: Int): ArrayData = {
    val m = shs.numElements()
    if (m == 0) return null
    val p = ensureParams(numHashes)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < m) {
      if (shs.isNullAt(j)) return null
      val h = shs.getLong(j)
      if (h < 0L || h >= (1L << 31)) throw new IllegalArgumentException(
        s"minhash_sig expects 31-bit shingle hashes (poly_hash(s, 2^31)); " +
          s"got $h — larger inputs overflow the (a*h + b) signature arithmetic")
      var i = 0
      while (i < numHashes) {
        val v = (p(2 * i) * h + p(2 * i + 1)) % Mod40
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(shs: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shs), numHashes))
}
