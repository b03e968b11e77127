package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd 48-bit SimHash from a (distinct) tokens array — the fused
  * form of `simhashFromHashes(tokenHashes48(toks))`
  * (dedup/Dedup.scala:409-459): per-token 31-ary poly hash mod 2^48 +
  * two-round avalanche mix, then a majority vote per bit.
  *
  * The staged HOF form pays 7 interpreted transform layers for the mix
  * and then 48 interpreted `filter` passes over the token-hash array for
  * the majority vote — 48·|tokens| lambda dispatches per row, the
  * dominant q23 cost at sf0.1. Here the whole thing is one loop: hash
  * and mix each token once, accumulate 48 bit counters, emit the
  * majority word. Arithmetic (poly fold, xor-shift, split-24-bit
  * multiply — constants from Dedup.Mix48Muls via the mix48 twin below)
  * is bit-identical to the HOF form (SimHash48Spec proves parity), so
  * the DuckDB q23 oracle is unchanged.
  *
  * Empty array → 0L (no bit reaches a majority), matching the HOF form.
  * Null input → null. Token elements must be non-null.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash48"

  override def nullSafeEval(input: Any): Any =
    SimHash48.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long ${ev.value}_r = graft.functions.SimHash48.simhash($a);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 48-bit avalanche finalizer as a standalone scalar expression —
  * decorrelates the order of polynomial hashes (the raw fold is affine
  * in its input, so consecutive keys stay consecutive; the mix
  * scrambles). Used by the deterministic training shuffle; arithmetic is
  * [[SimHash48.mix48]], BIGINT-reproducible in the DuckDB oracle. */
case class Mix48(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "mix48"
  override def nullSafeEval(input: Any): Any =
    SimHash48.mix48(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash48.mix48($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mix48 {
  def mix48(c: Column): Column =
    ColumnShim.column(Mix48(ColumnShim.expression(c)))
}

object SimHash48 {
  private final val Bits = 48
  private final val Mod48 = 1L << Bits

  /** Shared by interpreted eval and generated code. The mix is
    * [[graft.dedup.Dedup.mix48Jvm]]'s arithmetic, restated here so the
    * functions package carries no dedup dependency; Mix48ParitySpec in
    * SimHash48Spec pins the two implementations together. */
  def mix48(h0: Long): Long = {
    var h = h0 ^ (h0 >>> 21)
    var r = 0
    while (r < 2) {
      val a = if (r == 0) 10368889L else 8776651L
      h = (((a * (h >>> 24)) % (1L << 24)) * (1L << 24) + a * (h & 0xFFFFFFL)) % Mod48
      h = h ^ (h >>> 21)
      r += 1
    }
    h
  }

  /** Boxed so a null token can poison the whole result (SQL callers can
    * pass arbitrary arrays; the library's tokens() never yields nulls). */
  def simhash(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val cnt = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val h = mix48(PolyHash.hash(toks.getUTF8String(i), Mod48))
      var b = 0
      while (b < Bits) {
        cnt(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < Bits) {
      if (cnt(b) * 2 > n) sh |= 1L << b
      b += 1
    }
    sh
  }

  def simhash48(toks: Column): Column =
    ColumnShim.column(SimHash48(ColumnShim.expression(toks)))
}
