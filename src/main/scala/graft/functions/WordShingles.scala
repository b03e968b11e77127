package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd k-word shingle strings from a tokens array — the fused form
  * of `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(ts, i,
  * k)))` (TextFunctions.wordShinglesFrom). The HOF form pays an
  * interpreted lambda dispatch, a slice allocation, and a concat
  * expression walk per window position; this is one loop joining
  * UTF8String windows directly. Same window semantics: n ≥ k → n−k+1
  * shingles; 0 < n < k → one whole-doc shingle; n = 0 → empty (blank
  * documents must NOT shingle — see the HOF form's Jaccard note). Null
  * input → null (the HOF form yields an empty array; every consumer
  * applies array_distinct/explode/intersect where both erase the row).
  * WordShinglesSpec pins string-level parity on the real corpus.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null-element inputs poison to null
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.WordShingles.shingles($a, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // a null token poisons the whole result (SQL callers can pass
      // arbitrary arrays; the library's tokens() never yields nulls)
      if (toks.isNullAt(i)) return null
      ts(i) = toks.getUTF8String(i)
      i += 1
    }
    val m = if (n >= k) n - k + 1 else 1
    val win = if (n >= k) k else n
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      if (win == 1) out(i) = ts(i)
      else {
        val window = new Array[UTF8String](win)
        System.arraycopy(ts, i, window, 0, win)
        out(i) = UTF8String.concatWs(Space, window: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingles(toks: Column, k: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(toks), k))
}
