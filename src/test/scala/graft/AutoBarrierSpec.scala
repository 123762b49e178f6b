package graft

import org.apache.spark.sql.functions._
import graft.plans.AutoBarrierExplode

/** The AutoBarrierExplode optimizer rule must rewrite Generate-over-
  * expensive-expression into Generate-over-barriered-projection without
  * changing results. */
class AutoBarrierSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private def expensiveExplode = {
    val df = Seq("a b c d e", "f g h i j").toDF("text")
    // HOF chain as generator input — the pathological shape
    df.select(col("text"),
      explode(transform(split(col("text"), " "), w => concat(w, lit("!")))).as("tok"))
  }

  test("rule pulls the expensive generator input under a no_inline projection") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AutoBarrierExplode
    try {
      val df = expensiveExplode
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("no_inline"), s"rule did not fire:\n$optimized")
      // semantics unchanged
      val toks = df.select("tok").collect().map(_.getString(0)).sorted
      assert(toks.toSeq == Seq("a!", "b!", "c!", "d!", "e!", "f!", "g!", "h!", "i!", "j!"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AutoBarrierExplode)
    }
  }

  test("rule leaves cheap attribute explodes untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AutoBarrierExplode
    try {
      val df = Seq(Seq(1, 2), Seq(3)).toDF("arr").select(explode(col("arr")))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("no_inline"), s"rule over-fired:\n$optimized")
      assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AutoBarrierExplode)
    }
  }
}
