package graft.functions

import org.apache.spark.sql.{Column, GraftShims}

/** Column API over the exact-bitmap sketch family ([[LongBitmap]]). The agg
  * helpers wrap the TypedImperativeAggregate in an AggregateExpression the
  * same way `functions.collect_list` does, so they drop into `.agg(...)`. */
object BitmapFunctions {
  def bitmapAgg(id: Column): Column =
    GraftShims.toColumn(
      BitmapAggExpr(GraftShims.toExpression(id)).toAggregateExpression())
  def bitmapOrAgg(bm: Column): Column =
    GraftShims.toColumn(
      BitmapOrAggExpr(GraftShims.toExpression(bm)).toAggregateExpression())
  def bitmapAndAgg(bm: Column): Column =
    GraftShims.toColumn(
      BitmapAndAggExpr(GraftShims.toExpression(bm)).toAggregateExpression())
  def bitmapCount(bm: Column): Column =
    GraftShims.toColumn(BitmapCountExpr(GraftShims.toExpression(bm)))
  def bitmapContains(bm: Column, id: Column): Column =
    GraftShims.toColumn(BitmapContainsExpr(
      GraftShims.toExpression(bm), GraftShims.toExpression(id)))
  def bitmapAnd(a: Column, b: Column): Column =
    GraftShims.toColumn(BitmapAndExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
  def bitmapOr(a: Column, b: Column): Column =
    GraftShims.toColumn(BitmapOrExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
  def bitmapAndNot(a: Column, b: Column): Column =
    GraftShims.toColumn(BitmapAndNotExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
