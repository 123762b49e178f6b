package graft

import graft.functions.TextHash

/** Unit contract of the native text-hash kernels. */
class TextHashSpec extends SparkSuite {
  import org.apache.spark.unsafe.types.UTF8String.{fromString => u}

  test("word hashing is case- and whitespace-normalizing") {
    val a = TextHash.wordHashes(u("Hello   World"))
    val b = TextHash.wordHashes(u("  hello world "))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 2)
    assert(TextHash.wordHashes(u("")).isEmpty)
  }

  test("shingle hashes: sliding k-windows, distinct, short-doc fallback") {
    val wh = TextHash.wordHashes(u("a b c d"))
    val sh3 = TextHash.shingleHashes(wh, 3)
    assert(sh3.length == 2) // abc, bcd
    val short = TextHash.shingleHashes(TextHash.wordHashes(u("a b")), 3)
    assert(short.length == 1) // one shorter-than-k shingle
    // repeated text -> repeated shingles deduplicated
    val rep = TextHash.shingleHashes(TextHash.wordHashes(u("x y x y x y")), 2)
    assert(rep.length < 5)
  }

  test("minhash signature estimates Jaccard: identical 1.0, disjoint ~0") {
    import org.apache.spark.sql.functions.col
    import SparkSuite.spark.implicits._
    val docs = Seq((0L, "p q r s t u v w"), (1L, "p q r s t u v w"),
      (2L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      graft.functions.TextHashExpressions.minhashSig(col("text")).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("sig").toSeq).toMap
    assert(sigs(0L) == sigs(1L))
    val agree = sigs(0L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(agree <= 2, s"disjoint docs agree on $agree/16 minhashes")
  }

  test("sig_agree counts equal positions, matches the zip_with form") {
    import org.apache.spark.sql.functions._
    import SparkSuite.spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)), // 2 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                 // all agree
      (Seq(1L), Seq(2L))                          // none
    ).toDF("a", "b")
    val out = df.select(
      graft.functions.TextHashExpressions.sigAgree(col("a"), col("b")).as("fast"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), p => p)).as("ref"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null input -> null out
    val n = Seq((Seq(1L), null.asInstanceOf[Seq[Long]])).toDF("a", "b")
      .select(graft.functions.TextHashExpressions.sigAgree(col("a"), col("b")))
      .head()
    assert(n.isNullAt(0))
  }

  test("simhash: identical texts equal, near texts close, disjoint far") {
    def sh(s: String): Long = {
      import org.apache.spark.sql.functions.col
      import SparkSuite.spark.implicits._
      Seq(s).toDF("text")
        .select(graft.functions.TextHashExpressions.simhash64(col("text")))
        .head().getLong(0)
    }
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok7", "CHANGED")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    assert(sh(base) == sh(base))
    val dNear = java.lang.Long.bitCount(sh(base) ^ sh(near))
    val dFar = java.lang.Long.bitCount(sh(base) ^ sh(far))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
    assert(dNear <= 16)
  }
}
