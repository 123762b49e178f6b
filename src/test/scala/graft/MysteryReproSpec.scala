package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import graft.functions.NoInlineExpr

/** Documents a subtle Generate-rewrite hazard (and its resolution) that
  * shaped [[graft.plans.AutoBarrierExplode]]'s design.
  *
  * A post-optimization rule that extracts a generator input into a child
  * Project (`Generate(explode(attr))` over `Project(child.* :+ alias)`)
  * MUST account for `Generate.unrequiredChildIndex`: the analyzer fixed the
  * query's schema long ago, so if the appended alias is not marked
  * unrequired, the physical Generate emits it as an extra column and every
  * downstream positional read is shifted — an array slot read as a string
  * yields offset/size-word garbage. Nothing validates the drift; results
  * are silently wrong.
  *
  * This is why AutoBarrierExplode wraps the barrier INLINE in the generator
  * (no plan-shape change at all). The extraction shape is viable too, but
  * only with the index bookkeeping below.
  */
class MysteryReproSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private def docs = Seq.tabulate(50)(i =>
    (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" "))).toDF("id", "text")

  private def run(rule: Rule[LogicalPlan]): Array[(Long, String)] = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(rule)
    try docs.select(col("id"), explode(split(col("text"), " ")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    finally spark.experimental.extraOptimizations = prev
  }

  private lazy val expected = docs
    .select(col("id"), explode(split(col("text"), " ")).as("w"))
    .collect().map(r => (r.getLong(0), r.getString(1))).sorted

  /** The hazardous shape: child output grows, unrequiredChildIndex not
    * updated for the appended alias. */
  object ExtractBroken extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case g @ Generate(gen: UnaryExpression, _, _, _, _, child)
          if !gen.child.isInstanceOf[Attribute] =>
        val alias = Alias(NoInlineExpr(gen.child), "_gen_input")()
        g.copy(
          generator = gen.withNewChildren(Seq(alias.toAttribute)).asInstanceOf[Generator],
          child = Project(child.output :+ alias, child))
    }
  }

  /** The correct shape: appending keeps prior unrequired indices valid, and
    * the new alias is itself marked unrequired so Generate's output matches
    * the analyzed schema. */
  object ExtractCorrect extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case g @ Generate(gen: UnaryExpression, _, _, _, _, child)
          if !gen.child.isInstanceOf[Attribute] =>
        val alias = Alias(NoInlineExpr(gen.child), "_gen_input")()
        g.copy(
          generator = gen.withNewChildren(Seq(alias.toAttribute)).asInstanceOf[Generator],
          unrequiredChildIndex = g.unrequiredChildIndex :+ child.output.length,
          child = Project(child.output :+ alias, child))
    }
  }

  test("naive generator-input extraction silently corrupts results (documented hazard)") {
    val got = run(ExtractBroken)
    assert(!got.sameElements(expected),
      "if this now matches, Spark validates Generate output drift — the " +
        "AutoBarrierExplode inline-wrap constraint can be revisited")
  }

  test("extraction with unrequiredChildIndex bookkeeping is exact") {
    assert(run(ExtractCorrect).sameElements(expected))
  }
}
