package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself non-deterministic so the optimizer
  * will not inline it into consumers (CollapseProject / Generate).
  *
  * Why: `explode(expensiveArrayExpr)` re-evaluates the child expression once
  * per OUTPUT element (measured 44 s vs 1 s on the minhash shingle array at
  * sf0.1 — a ~#elements× blow-up that would be catastrophic at 100 TB).
  * Aliasing the array in a separate projection doesn't help because
  * CollapseProject merges single-use aliases straight back into the
  * generator. Wrapping the array in this barrier forces it to be computed
  * once per input row in its own projection. */
case class NoInlineExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "no_inline"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoInlineExpr =
    copy(child = newChild)
}

object Barrier {
  /** Evaluate `c` exactly once per input row (see NoInlineExpr). */
  def noInline(c: Column): Column =
    GraftShims.toColumn(NoInlineExpr(GraftShims.toExpression(c)))
}
