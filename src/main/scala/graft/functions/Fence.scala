package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.DataType

/** Identity expression that the optimizer treats as nondeterministic —
  * an *optimizer fence* for expensive derived columns that feed filters.
  *
  * The pathology: `PushDownPredicates` pushes a filter below the
  * projections that stage a higher-order pipeline, substituting each
  * alias with its full expression. A gate like `rep_bp <= 5000`
  * (rep_bp ← shingles ← tokens ← split) arrives at the scan with the
  * tokenization inlined ~9× inside one interpreted CodegenFallback
  * condition — measured 10× slower than evaluating the staged columns
  * once (8.5 s → 0.8 s at sf0.1 for the curation gate). Marking the
  * staged column nondeterministic stops the substitution: filters on a
  * fenced column stay above its projection and reference the computed
  * attribute.
  *
  * Evaluation is the child's, bit for bit (interpreted and codegen) —
  * only the optimizer's view changes. Use on the LAST alias before a
  * filter; everything beneath still optimizes normally. Trade-off: a
  * fenced filter is also never pushed into the data source — exactly
  * the point for derived gates, never use it on raw scan columns.
  */
case class Fence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "fence"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fence {
  def fence(c: Column): Column = ColumnShim.column(Fence(ColumnShim.expression(c)))
}
