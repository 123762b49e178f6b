package graft

import org.apache.spark.sql.{GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, NoInlineExpr}

/** graft's native SQL functions, registrable two ways:
  *   - at session build time: `.withExtensions(new GraftExtensions)` or
  *     `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *   - on a live session: `GraftFunctions.register(spark)`
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProductExpr(children.head, children(1))),
    (new FunctionIdentifier("no_inline"),
      new ExpressionInfo(classOf[NoInlineExpr].getName, "no_inline"),
      (children: Seq[Expression]) => NoInlineExpr(children.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      GraftShims.registerFunction(spark, id, info, builder)
    }
}

/** SparkSessionExtensions entry point (plans through whole-stage codegen). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.AutoBarrierExplode)
  }
}
