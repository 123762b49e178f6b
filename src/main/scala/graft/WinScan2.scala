package graft
import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Diagnostic 2: EXECUTE every benched query at sf0.001 with a counting
  * appender on WindowExec's logger — catches unpartitioned windows in
  * INTERNAL jobs (localCheckpoint'd intermediates) that the plan-level
  * WinScan cannot see. */
object WinScan2 {
  val hits = new java.util.concurrent.atomic.AtomicInteger(0)
  def main(args: Array[String]): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val app = new AbstractAppender("wincount", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getMessage.getFormattedMessage.contains("No Partition Defined")) hits.incrementAndGet()
    }
    app.start()
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    val spark = GraftSession.local(8)
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = hits.get()
      try fn(spark, d).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      if (hits.get() > before) println(s"[winscan2] $name: ${hits.get() - before}")
    }
    // the streaming bench path too
    val b4 = hits.get()
    try Bench.streamingBench(spark, d) catch { case _: Throwable => () }
    if (hits.get() > b4) println(s"[winscan2] streamingBench: ${hits.get() - b4}")
    println(s"[winscan2] total: ${hits.get()}")
    spark.stop()
  }
}
