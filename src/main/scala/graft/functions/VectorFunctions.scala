package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<double>` columns. The dot product is
  * a native Catalyst expression with codegen (see [[DotProductExpr]]);
  * summation is sequential left-to-right, matching DuckDB's
  * list_dot_product order, so oracle values are bit-identical. */
object VectorFunctions {
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  /** Interpreted higher-order-function form (kept as a cross-check for
    * DotProductExpr in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a|·|b|). Callers should precompute norms
    * per row (see Similarity) rather than recomputing per pair. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
