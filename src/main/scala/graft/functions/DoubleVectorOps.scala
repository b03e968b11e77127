package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd squared L2 / dot over two `array<double>` columns — the
  * [[FloatVectorDot]] treatment applied to the PQ family's hot inner
  * loop. `Pq.assign` evaluates one distance per (sub-vector, code)
  * candidate: n·m·k per Lloyd round and per encode (k=256 at the q195
  * widths → tens of millions of 8-dim distances at sf0.1), where the
  * higher-order-function form (`aggregate(zip_with(...))`) pays an
  * interpreted lambda dispatch plus a zipped-array allocation per
  * candidate. Identical arithmetic — left-to-right double
  * accumulation — so results stay bit-identical and the DuckDB
  * oracles (`duckL2sq`/`duckDotD`) reproduce them unchanged.
  *
  * Null semantics match the HOF forms: null array, length mismatch,
  * or any null element → null. */
abstract class DoubleVectorFold extends BinaryExpression {

  /** Per-element contribution in generated-Java and interpreted form. */
  protected def javaTerm(x: String, y: String): String
  protected def term(x: Double, y: Double): Double

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += term(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${javaTerm(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ (x−y)² left-to-right — `Pq.l2sq`'s fused form. */
case class DoubleVectorL2(left: Expression, right: Expression)
    extends DoubleVectorFold {
  override def prettyName: String = "double_vector_l2sq"
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def javaTerm(x: String, y: String): String =
    s"(($x) - ($y)) * (($x) - ($y))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ x·y left-to-right — `Pq.dotD`'s fused form. */
case class DoubleVectorDot(left: Expression, right: Expression)
    extends DoubleVectorFold {
  override def prettyName: String = "double_vector_dot"
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def javaTerm(x: String, y: String): String =
    s"($x) * ($y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DoubleVectorOps {
  def l2sq(a: Column, b: Column): Column =
    ColumnShim.column(DoubleVectorL2(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DoubleVectorDot(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
