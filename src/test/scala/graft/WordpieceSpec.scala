package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** C110: WordPiece trainer + MaxMatch encoder. */
class WordpieceSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  test("trainer: likelihood-greedy merge sequence matches the hand computation (rarity beats frequency)") {
    // words ab×2 ac×3 bc×1. Round 1 symbol freqs: a=5, b=1, ##b=2, ##c=4.
    //   score(a,##b) = 2/(5·2) = .2, score(a,##c) = 3/(5·4) = .15,
    //   score(b,##c) = 1/(1·4) = .25 → (b,##c) wins with pair_freq 1 —
    // frequency-greedy BPE would merge (a,##c); likelihood-greedy
    // WordPiece prefers the rare-but-cohesive pair. Round 2 ties 2/10 vs
    // 3/15 and breaks lexicographic on the right (##b < ##c); round 3
    // takes the last pair; round 4 finds no pairs and stops early.
    val docs = Seq("ab ab ac ac ac bc").toDF("text")
    val got = TextOps.wordpieceTrainOf(docs, nMerges = 5, minFreq = 1)
      .collect().sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_freq")))
    assert(got.toSeq == Seq(
      (1, "b", "##c", 1L), (2, "a", "##b", 2L), (3, "a", "##c", 3L)))
  }

  test("encoder: greedy longest match with ## continuations; unmatchable and over-long words are UNK") {
    val docs = Seq((1L, "ab ac"), (2L, "abc z"), (3L, "a" * 40))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "##b", "##c", "ab", "ac", "bc").toDF("piece")
    val got = TextOps.wordpieceEncodeWith(docs, vocab, maxWordLen = 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_wp_tokens"),
          r.getAs[Long]("n_unk_words")))).toMap
    assert(got(1L) == ((2L, 2L, 0L))) // ab, ac are whole pieces
    assert(got(2L) == ((2L, 3L, 1L))) // abc = ab + ##c; z has no candidate
    assert(got(3L) == ((1L, 1L, 1L))) // 40 chars > maxWordLen guard
  }

  test("store: encode from the persisted vocabulary is bit-equal to the direct train+encode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-wps-spec")
    try {
      TextOps.writeWordpieceStore(Tables.documents(spark, sf), tmp.toString)
      val stored = TextOps.wordpieceEncodeFromStore(spark, sf, tmp.toString)
        .collect().map(_.toSeq).toSet
      val direct = TextOps.wordpieceEncode(spark, sf).collect()
        .map(_.toSeq).toSet
      assert(stored == direct && stored.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("encoder on the corpus reconciles with an independent Scala MaxMatch over the trained vocabulary") {
    val docs = Tables.documents(spark, sf)
    val merges = TextOps.wordpieceTrainOf(docs, nMerges = 8, minFreq = 2)
    val vocabDf = TextOps.wordpieceVocabOf(docs, merges)
    val got = TextOps.wordpieceEncodeWith(docs, vocabDf, maxWordLen = 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_wp_tokens"),
          r.getAs[Long]("n_unk_words")))).toMap

    // independent greedy reference (plain Scala longest-prefix walk)
    val vocab = vocabDf.collect().map(_.getString(0)).toSet
    def encode(w: String): (Long, Boolean) = {
      if (w.length > 32) return (1L, true)
      var pos = 0; var k = 0L
      while (pos < w.length) {
        var e = w.length; var hit = -1
        while (e > pos && hit < 0) {
          val p = (if (pos == 0) "" else "##") + w.substring(pos, e)
          if (vocab(p)) hit = e else e -= 1
        }
        if (hit < 0) return (1L, true)
        pos = hit; k += 1
      }
      (k, false)
    }
    val ref = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        val enc = ws.map(encode)
        r.getLong(0) -> ((ws.length.toLong, enc.map(_._1).sum,
          enc.count(_._2).toLong))
      }.filter(_._2._1 > 0).toMap
    assert(got == ref)
    // the trained vocab must actually produce multi-char pieces
    assert(vocab.exists(p => p.stripPrefix("##").length > 1))
  }
}
