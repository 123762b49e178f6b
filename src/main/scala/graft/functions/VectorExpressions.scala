package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express this
  * declaratively but are interpreted (no whole-stage codegen) and allocate an
  * intermediate array per row — measurably slow in the ANN hot path. This
  * expression generates a tight primitive loop instead, keeping vector
  * similarity inside WholeStageCodegen. Summation order is sequential
  * left-to-right, identical to the HOF form and to DuckDB's
  * list_dot_product, so oracle results stay bit-identical.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level API for the codegen'd dot product (inputs must already be
    * array<double> — see VectorFunctions.toDouble). */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.toColumn(
      DotProductExpr(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
