package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.NoInlineExpr

/** Optimizer rule: protect `Generate` (explode/posexplode/inline) from
  * re-evaluating an expensive generator input per OUTPUT element.
  *
  * Spark evaluates the generator's child expression inside the generate
  * loop; when that child is a non-codegen higher-order-function chain
  * (transform/sequence/slice/…), the cost multiplies by the average array
  * length — measured 44 s vs 1 s on a 5 000-doc minhash shingle stage at
  * sf0.1, and unbounded at 100 TB. Aliasing the array in a Project below
  * the Generate doesn't survive optimization: CollapseProject re-inlines
  * single-use aliases.
  *
  * This rule wraps expensive generator inputs in [[NoInlineExpr]]; being
  * non-deterministic, the barrier keeps the Generate on the row-at-a-time
  * execution path where the input is evaluated exactly once per input row.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) for sessions built
  * with extensions, or `spark.experimental.extraOptimizations` on a live
  * session.
  */
object AutoBarrierExplode extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => false
    case _: NoInlineExpr => false
    case _ =>
      e.exists {
        case _: HigherOrderFunction => true
        case _: RegExpReplace | _: StringSplit => true
        case _ => false
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case g @ Generate(gen: UnaryExpression, _, _, _, _, _)
        if isExpensive(gen.child) =>
      // Wrap in place: the non-deterministic barrier keeps this Generate out
      // of whole-stage codegen, so GenerateExec's row-at-a-time path
      // evaluates the generator input exactly once per input row instead of
      // re-running the expression chain per emitted element.
      g.copy(generator =
        gen.withNewChildren(Seq(NoInlineExpr(gen.child))).asInstanceOf[Generator])
  }
}
