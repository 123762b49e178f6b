package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression,
  TernaryExpression}
import org.apache.spark.sql.types._

/** Hilbert-curve index kernel (the classic xy2d walk — Hilbert 1891;
  * the iterative quadrant-rotation form as published in Warren's
  * Hacker's Delight and the Wikipedia reference implementation, public):
  * maps a 2-D grid point to its distance along the order-`bits` Hilbert
  * curve. Unlike the Z-order bit interleave, CONSECUTIVE Hilbert indices
  * are always GRID-ADJACENT (no diagonal jumps across the plane at
  * quadrant boundaries), which tightens per-file min/max bounds for 2-D
  * range scans — the locality argument Delta/Iceberg cite for offering
  * Hilbert clustering above Z-order. */
object SpatialKernel {
  def hilbert(bits: Int, x: Long, y: Long): Long = {
    var rx = 0L; var ry = 0L; var d = 0L
    var xx = x; var yy = y
    var s = 1L << (bits - 1)
    while (s > 0) {
      rx = if ((xx & s) > 0) 1L else 0L
      ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation matches
      if (ry == 0L) {
        if (rx == 1L) { xx = s - 1 - xx; yy = s - 1 - yy }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }
}

/** hilbert_index(bits, x, y): scalar Hilbert distance — codegen'd, used by
  * the Layout writer's clustering sort. */
case class HilbertIndexExpr(first: Expression, second: Expression,
                            third: Expression)
  extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(IntegerType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hilbert_index"
  override protected def nullSafeEval(bits: Any, x: Any, y: Any): Any =
    SpatialKernel.hilbert(bits.asInstanceOf[Int],
      x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (b, x, y) =>
      s"graft.functions.SpatialKernel$$.MODULE$$.hilbert($b, $x, $y)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertIndexExpr =
    copy(first = f, second = s, third = t)
}

object SpatialFunctions {
  def hilbertIndex(bits: Column, x: Column, y: Column): Column =
    GraftShims.toColumn(HilbertIndexExpr(GraftShims.toExpression(bits),
      GraftShims.toExpression(x), GraftShims.toExpression(y)))
}
