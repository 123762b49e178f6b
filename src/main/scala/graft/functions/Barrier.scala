package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

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

  // The result is MATERIALIZED: buffer-backed values (UnsafeArrayData,
  // UTF8String, …) are deep-copied so they stay valid after the producing
  // row buffer is reused — required when a Generate loop consumes the array
  // across downstream row writes.
  override def eval(input: InternalRow): Any = child.eval(input) match {
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case r: InternalRow => r.copy()
    case s: UTF8String => s.clone()
    case x => x
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    val copied = dataType match {
      case _: ArrayType | _: MapType | _: StructType => s"${c.value}.copy()"
      case StringType => s"${c.value}.clone()"
      case _ => s"${c.value}"
    }
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        $jt ${ev.value} = ${ev.isNull} ? ${CodeGenerator.defaultValue(dataType)} : $copied;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): NoInlineExpr =
    copy(child = newChild)
}

object Barrier {
  /** Evaluate `c` exactly once per input row (see NoInlineExpr). */
  def noInline(c: Column): Column =
    GraftShims.toColumn(NoInlineExpr(GraftShims.toExpression(c)))
}
