package graft

/** Graft native functions must be usable from plain SQL once registered
  * (GraftFunctions.register for live sessions; GraftExtensions uses the
  * identical builders at session construction). */
class ExtensionsSpec extends SparkSuite {

  test("vec_dot and no_inline are callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |       no_inline(array(1, 2)) AS arr""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getSeq[Int](1) == Seq(1, 2))
  }
}
