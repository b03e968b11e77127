package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 31-ary polynomial string hash mod `mod` — the fused form of
  * TextFunctions' higher-order formulation
  * (`aggregate(transform(split(s, ''), ascii), 0L, (acc, c) -> (acc*31 + c) % mod)`).
  *
  * The HOF form materializes one single-character string per input char
  * (split on an empty regex) and folds with per-element lambda dispatch —
  * measured at ~4 s for 260k short strings at sf0.1, the dominant cost of
  * every signature pipeline built on the reproducible hash. This
  * expression is the same arithmetic as one fused loop over the string's
  * code points inside whole-stage codegen: no allocation beyond one
  * String, no virtual calls, bit-identical results (ascii() returns the
  * code point, so the contract is a code-point fold; DuckDB's
  * string_split(s, '') + ascii agrees).
  *
  * `mod` must stay ≤ 2^48 so `acc*31 + cp` never overflows a long —
  * the same bound that makes the hash BIGINT-reproducible in external
  * oracles.
  */
case class PolyHash(child: Expression, mod: Long) extends UnaryExpression {
  require(mod > 0 && mod <= (1L << 48), s"polyHash mod $mod risks Long overflow")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PolyHash.hash($a, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Shared by interpreted eval and generated code (public static via
    * the companion's Java forwarder; Janino resolves it as a plain
    * static call). */
  def hash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  def polyHash(s: Column, mod: Long): Column =
    ColumnShim.column(PolyHash(ColumnShim.expression(s), mod))
}
