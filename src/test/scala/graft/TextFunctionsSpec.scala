package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token counts: whitespace vs regex tokenizer") {
    val r = one("the quick brown-fox, 42 times!").select(
      TextFunctions.wsTokens(col("text")).as("ws"),
      TextFunctions.regexTokens(col("text")).as("re")).head()
    assert(r.getAs[Int]("ws") == 5)
    // the|quick|brown|-|fox|,|42|times|! = 9 regex tokens
    assert(r.getAs[Int]("re") == 9)
  }

  test("stopword ratio and quality score") {
    val r = one("the cat is on a mat").select(
      TextFunctions.stopwordRatio(col("text")).as("sr"),
      TextFunctions.qualityScore(col("text")).as("q")).head()
    // stopwords present: the, is, a -> 3/6
    assert(math.abs(r.getAs[Double]("sr") - 0.5) < 1e-12)
    assert(r.getAs[Double]("q") == (6.0 / 100.0) * 0.5)
  }

  test("mean word length") {
    val r = one("ab cdef").select(TextFunctions.meanWordLen(col("text"))).head()
    assert(r.getDouble(0) == 3.0)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello   World", "hello world", "different text")
      .toDF("text").select(TextFunctions.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("hitCount counts dictionary tokens") {
    val r = one("der la the der x").select(
      TextFunctions.hitCount(col("text"), Seq("der", "la")).as("h")).head()
    assert(r.getAs[Int]("h") == 3)
  }
}
