package graft

/** Diagnostic: measures the Bench calib spin before/after creating the
  * local[32] SparkSession, separating host noise from warm-JVM inflation
  * of the single-thread spin. 2026-08-14 on a provably idle host (fresh
  * JVM reads 43 ms): pre-session 44→54, idle-session 53-54, post-query
  * 55-56, post-stop 53-55 — the spin settles ~25% above fresh-JVM speed
  * for the JVM's lifetime regardless of Spark, which is why the calib
  * gate is derived from the warm-JVM band (see Bench.gateMs). */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    def spins(tag: String): Unit =
      for (i <- 1 to 6) System.err.println(f"[$tag] ${Bench.calibMs()}%.0f ms")
    spins("pre-session")
    val spark = GraftSession.local(32)
    spins("idle-session")
    // touch the engine: one tiny query, then re-measure
    spark.range(1000000).selectExpr("sum(id)").collect()
    spins("post-query")
    spark.stop()
    spins("post-stop")
  }
}
