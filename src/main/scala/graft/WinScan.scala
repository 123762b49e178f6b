package graft
/** Diagnostic: flag every gate query whose PHYSICAL plan contains a Window
  * with an empty partition spec (the WindowExec warning source). */
object WinScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        // WindowExec prints Window [funcs], [part], [order]; with an EMPTY
        // partition spec it prints Window [funcs], [order]. Partition-only
        // windows (no orderBy) also show one separator but their second
        // group has no sort direction — require ASC/DESC in the tail group.
        val bad = plan.linesIterator.filter { l =>
          val i = l.indexOf("Window ")
          i >= 0 && {
            val segs = "\\], \\[".r.findAllIn(l).length
            val tail = l.substring(l.lastIndexOf("], [") + 4)
            segs == 1 && (tail.contains(" ASC") || tail.contains(" DESC"))
          }
        }.toList
        if (bad.nonEmpty) println(s"[winscan] $name: ${bad.size} unpartitioned window(s)")
      } catch { case e: Throwable => println(s"[winscan] $name ERR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
