package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd k-word shingle fingerprints from a tokens array — the fused
  * form of the staged higher-order pipeline
  * `transform(toks, t -> polyHash(t, 2^31))` then
  * `transform(sequence(1, n-k+1), i -> aggregate(slice(th, i, k), 0L,
  * (acc, h) -> (acc*1000003 + h) % 2^40))`.
  *
  * Higher-order functions are CodegenFallback in Spark 4: the staged form
  * pays per-element lambda dispatch, a slice allocation per shingle
  * position, and an intermediate token-hash array per row — measured as
  * the dominant cost of the contamination audit (q39) at sf0.1. This
  * expression is one fused loop inside whole-stage codegen: hash each
  * token once (31-ary code-point fold mod 2^31, identical to
  * [[PolyHash]]), then fold each k-window to a 40-bit fingerprint.
  * Arithmetic is bit-identical to the HOF form (ShingleFpsSpec proves
  * parity), every intermediate < 2^62, so the DuckDB oracle reproduces it
  * unchanged.
  *
  * Window semantics mirror `wordShinglesFrom` (TextFunctions.scala:34):
  * n ≥ k → n−k+1 fingerprints; 0 < n < k → one whole-doc fingerprint;
  * n = 0 → empty array. Null input → null (the HOF chain yields an empty
  * array there; both erase the row under the explode that every consumer
  * applies). Token elements must be non-null (tokens() guarantees it).
  */
case class ShingleFps(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null-element inputs poison to null
  override def prettyName: String = "shingle_fps"

  override def nullSafeEval(input: Any): Any =
    ShingleFps.fps(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.ShingleFps.fps($a, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFps {
  private final val TokenMod = 1L << 31
  private final val FpMul = 1000003L
  private final val FpMod = 1L << 40

  /** Shared by interpreted eval and generated code. One pass to hash the
    * tokens, one k-bounded inner loop per window position; acc·1000003 +
    * h < 2^61 for 40-bit acc and 31-bit h — overflow-free. */
  def fps(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null token poisons the whole result (SQL callers can pass
      // arbitrary arrays; the library's tokens() never yields nulls)
      if (toks.isNullAt(i)) return null
      th(i) = PolyHash.hash(toks.getUTF8String(i), TokenMod)
      i += 1
    }
    val m = if (n >= k) n - k + 1 else 1
    val win = if (n >= k) k else n
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < win) {
        acc = (acc * FpMul + th(i + j)) % FpMod
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleFps(toks: Column, k: Int): Column =
    ColumnShim.column(ShingleFps(ColumnShim.expression(toks), k))
}
